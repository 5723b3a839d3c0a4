"""Scale probe for the training-data operators: tile the sf0.1 documents /
embeddings tables K times and time the distributed dedup / similarity
paths at ~sf1-equivalent volume.

Tiling modes:
- ``--perturb`` (default): each copy's tokens get a per-copy suffix, so
  copies are mutually UNRELATED — clean 10x volume scaling of the LSH
  shape (#docs, #buckets, #edges all scale ~K).
- ``--dup``: exact copies — a deliberately pathological dup-heavy corpus.
  Measured result: with K=10 every content bucket is hot (copies collide
  in ALL bands), so the LSH candidate stage degenerates toward all-pairs
  within each clique.  The correct pipeline for copy-heavy corpora is
  EXACT dedup first, minhash on the unique survivors (functions/dedup.py
  module docstring) — the probe's ``dedup_then_minhash`` entry measures
  exactly that composition and stays fast.

Usage: python scripts/scale_probe.py [K] [sf_dir] [--dup]
"""

from __future__ import annotations

import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq


def tile(src: str, out_dir: str, k: int, id_col: str,
         perturb_text: bool = False) -> str:
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(src).replace_schema_metadata(None)
    n = len(tbl)
    for i in range(k):
        path = os.path.join(out_dir, f"part-{i:03d}.parquet")
        if os.path.exists(path):
            continue
        ids = pa.compute.add(tbl[id_col], i * n)
        shifted = tbl.set_column(tbl.column_names.index(id_col), id_col,
                                 pa.compute.cast(ids, tbl[id_col].type))
        if perturb_text and i > 0 and "text" in shifted.column_names:
            # decorrelate the copy: per-copy token suffix changes every
            # shingle, so cross-copy pairs are NOT near-dups
            txt = [None if t is None else
                   " ".join(w + f"x{i}" for w in t.split())
                   for t in shifted["text"].to_pylist()]
            shifted = shifted.set_column(
                shifted.column_names.index("text"), "text",
                pa.array(txt, pa.string()))
        pq.write_table(shifted, path)
    return out_dir


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dup_mode = "--dup" in sys.argv
    k = int(args[0]) if args else 10
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    base = f"/tmp/beats_ray_scale_probe/{'dup' if dup_mode else 'perturb'}-x{k}"
    docs_dir = tile(os.path.join(sf_dir, "documents.parquet"),
                    os.path.join(base, "documents"), k, "doc_id",
                    perturb_text=not dup_mode)
    embs_dir = tile(os.path.join(sf_dir, "embeddings.parquet"),
                    os.path.join(base, "embeddings"), k, "vec_id")

    import ray
    import ray.data as rd
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from beats_ray.functions.dedup import (connected_components_auto,
                                           exact_dedup, minhash_lsh_pairs,
                                           simhash_dedup)
    from beats_ray.functions.similarity import knn_ivf

    results = {}

    def probe(name, fn):
        t0 = time.perf_counter()
        out = fn()
        n = len(out.to_pandas()) if hasattr(out, "to_pandas") else len(out)
        dt = round(time.perf_counter() - t0, 2)
        results[name] = {"sec": dt, "rows": n}
        print(f"{name:24s} {dt:>8}s rows={n}", flush=True)

    docs = lambda: rd.read_parquet(docs_dir)  # noqa: E731
    probe("exact_dedup", lambda: exact_dedup(docs()))
    if dup_mode:
        # copy-heavy corpus: exact-dedup FIRST, minhash on survivors
        from beats_ray.functions.joins import broadcast_join
        import pandas as _pd

        def dedup_then_minhash():
            survivors = exact_dedup(docs()).to_pandas()
            keep = broadcast_join(docs(), survivors, on="doc_id", how="inner")
            return minhash_lsh_pairs(keep, threshold=0.5)
        probe("dedup_then_minhash", dedup_then_minhash)
    else:
        probe("minhash_pairs", lambda: minhash_lsh_pairs(docs(), threshold=0.5))
        probe("dedup_clusters", lambda: connected_components_auto(
            minhash_lsh_pairs(docs(), threshold=0.5)))
    probe("simhash_pairs", lambda: simhash_dedup(docs()))

    import numpy as np
    q = np.asarray(pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["embedding"], filters=[("vec_id", "==", 0)])
        ["embedding"][0].as_py(), dtype=np.float64)
    probe("knn_ivf_probe2of8", lambda: knn_ivf(
        rd.read_parquet(embs_dir), q, k=10, n_centroids=8, n_probe=2))

    import json
    print(json.dumps({"k": k, "results": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
