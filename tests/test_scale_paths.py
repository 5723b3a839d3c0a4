"""Scale-path regression tests for the round-2 refactors: real IVF pruning,
distributed embedding near-dup, vectorized simhash, distributed edge dedup."""

import os

import numpy as np
import pyarrow as pa
import pytest


def _embeddings(n=256, d=16, seed=7):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, d))
    # plant a near-dup pair: vec 1 = vec 0 + tiny noise
    mat[1] = mat[0] + 0.01 * rng.standard_normal(d)
    return pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                     "embedding": pa.array(mat.tolist(), pa.list_(pa.float64()))})


def test_ivf_actually_prunes(ray_session):
    """knn_ivf with n_probe < n_centroids must score FEWER input rows than
    the dataset holds (the round-1 version rescanned everything per batch)."""
    import ray.data as rd
    from beats_ray.functions.similarity import build_ivf_index, knn_ivf
    tbl = _embeddings(512)
    ds = rd.from_arrow(tbl).repartition(8)
    index = build_ivf_index(ds, n_centroids=8, sample_rows=256)
    assigned, cent = index
    q = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float64)
    out = knn_ivf(ds, q, k=5, n_centroids=8, n_probe=2, index=index)
    assert len(out) == 5
    # the planted near-dup must be found (it shares vec 0's centroid)
    ids = out["vec_id"].to_pylist()
    assert 1 in ids
    # pruning: count rows in probed lists vs total
    counts = assigned.to_pandas()["centroid"].value_counts()
    assert counts.size == 8  # centroids populated -> probe=2 prunes > half
    probed_rows = counts.sort_values(ascending=False).iloc[:2].sum()
    assert probed_rows < len(tbl)


def test_ivf_full_probe_equals_brute(ray_session):
    import ray.data as rd
    from beats_ray.functions.similarity import knn_brute, knn_ivf
    tbl = _embeddings(200)
    ds = rd.from_arrow(tbl).repartition(4)
    q = np.asarray(tbl["embedding"][3].as_py(), dtype=np.float64)
    brute = knn_brute(ds, q, k=8).to_pandas()
    ivf = knn_ivf(ds, q, k=8, n_centroids=4, n_probe=4).to_pandas()
    assert sorted(brute["vec_id"]) == sorted(ivf["vec_id"])


def test_embedding_near_dup_distributed_matches_local(ray_session):
    """Block-nested-loop distributed pairs == single-matrix local answer."""
    import ray.data as rd
    from beats_ray.functions.dedup import embedding_near_dup
    tbl = _embeddings(300)
    ds = rd.from_arrow(tbl).repartition(5)
    got = embedding_near_dup(ds, threshold=0.5).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    cos = unit @ unit.T
    ia, ib = np.where(np.triu(cos >= 0.5, k=1))
    assert len(got) == len(ia)
    want = sorted(zip(ia.tolist(), ib.tolist()))
    assert list(zip(got["a"], got["b"])) == want
    assert (0, 1) in want  # planted pair


def test_simhash_batch_parity():
    import random
    from beats_ray.functions.dedup import simhash64, simhash64_batch
    random.seed(3)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [" ".join(random.choices(vocab, k=random.randint(0, 30)))
             for _ in range(100)] + [None, "", "one"]
    want = [0 if not t else simhash64(t.split(), {}) for t in texts]
    got = simhash64_batch(texts)
    assert [int(g) for g in got] == want


def test_minhash_edges_deduped_across_bands(ray_session, tmp_path):
    """Distributed edge dedup: each (a,b) pair appears exactly once even
    though many bands emit it."""
    import ray.data as rd
    from beats_ray.functions.dedup import minhash_lsh_pairs
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["the quick brown fox jumps over the lazy dog today",
                 "the quick brown fox jumps over the lazy dog tonight",
                 "completely different content with no shared phrases here"],
    })
    edges = minhash_lsh_pairs(rd.from_arrow(docs), threshold=0.5).to_pandas()
    pairs = list(zip(edges["a"], edges["b"]))
    assert len(pairs) == len(set(pairs)) == 1
    assert pairs[0] == (0, 1)


def test_sessionize_salted_time_identity(ray_session):
    """Time-window salting is invisible: equals the direct per-key fold."""
    import pandas as pd
    import ray.data as rd
    from beats_ray.functions.sessionize import sessionize, sessionize_salted_time
    rng = np.random.default_rng(11)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, size=n),
        "ts": pd.to_datetime(rng.integers(0, 5 * 86400, size=n), unit="s"),
    })
    ds = rd.from_pandas(df).repartition(6)
    direct = sessionize(ds, key="user_id", order="ts", ts="ts") \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    salted = sessionize_salted_time(rd.from_pandas(df).repartition(6),
                                    key="user_id", window_s=6 * 3600.0) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    assert direct["user_id"].tolist() == salted["user_id"].tolist()
    assert direct["n_sessions"].tolist() == salted["n_sessions"].tolist()


def test_cc_auto_matches_label_propagation(ray_session):
    """connected_components_auto (driver path at this size) == distributed
    min-label propagation on the same graph."""
    import pandas as pd
    import ray.data as rd
    from beats_ray.functions.dedup import (cc_label_propagation,
                                           connected_components_auto)
    edges = pd.DataFrame({"a": [1, 2, 10, 11, 20], "b": [2, 3, 11, 12, 21]})
    auto = connected_components_auto(rd.from_pandas(edges)).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    lp = cc_label_propagation(rd.from_pandas(edges), max_rounds=4,
                              n_buckets=2).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert auto["node"].tolist() == lp["node"].tolist()
    assert auto["root"].tolist() == lp["root"].tolist()


def test_ivf_incremental_append(ray_session, tmp_path):
    """sync_ivf_index appends a NEW shard to a persisted index without
    re-reading the indexed corpus: prior cell files survive byte-identical,
    the delta rows land in the argmax cell of the FROZEN centroids, the
    republished index answers a full-probe query exactly, and a repeat
    sync is a no-op cache hit."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from beats_ray.functions.similarity import (knn_brute, knn_ivf,
                                                load_ivf_index,
                                                sync_ivf_index)

    full = _embeddings(96, seed=11)
    shard_a, shard_b = full.slice(0, 64), full.slice(64)
    pa_path, pb_path = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(shard_a, pa_path)
    pq.write_table(shard_b, pb_path)
    root = str(tmp_path / "ivf")
    read_fn = lambda paths: rd.read_parquet(list(paths))

    key_a = sync_ivf_index(root, [pa_path], read_fn, n_centroids=4,
                           sample_rows=64)
    cells_a = {}
    for d in os.listdir(os.path.join(key_a, "assign")):
        for f in os.listdir(os.path.join(key_a, "assign", d)):
            p = os.path.join(key_a, "assign", d, f)
            cells_a[(d, f)] = os.stat(p).st_size

    key_ab = sync_ivf_index(root, [pa_path, pb_path], read_fn, n_centroids=4,
                            sample_rows=64)
    assert key_ab != key_a
    # prior shard's files were MOVED, not rewritten: same names + sizes
    cells_ab = {}
    for d in os.listdir(os.path.join(key_ab, "assign")):
        for f in os.listdir(os.path.join(key_ab, "assign", d)):
            p = os.path.join(key_ab, "assign", d, f)
            cells_ab[(d, f)] = os.stat(p).st_size
    for k, size in cells_a.items():
        assert cells_ab.get(k) == size, k
    new_files = set(cells_ab) - set(cells_a)
    assert new_files and all(f.startswith("a1_") for _, f in new_files)
    # delta rows sit in the argmax cell of the FROZEN quantizer
    cent = np.load(os.path.join(key_ab, "centroids.npy"))
    assigned, _ = load_ivf_index(key_ab)
    got = {r["vec_id"]: r["centroid"] for r in assigned.take_all()}
    assert len(got) == 96
    b_ids = shard_b["vec_id"].to_pylist()
    b_mat = np.asarray(shard_b["embedding"].to_pylist(), dtype=np.float64)
    b_unit = b_mat / np.linalg.norm(b_mat, axis=1)[:, None]
    want = np.argmax(b_unit @ cent.T, axis=1)
    for vid, w in zip(b_ids, want):
        assert got[vid] == w, vid
    # full-probe query through the synced index == brute force on a+b
    ds_full = rd.read_parquet([pa_path, pb_path])
    q = np.asarray(full["embedding"][0].as_py(), dtype=np.float64)
    out_ivf = knn_ivf(ds_full, q, k=5, n_centroids=4, n_probe=4,
                      cache_dir=key_ab)
    out_brute = knn_brute(ds_full, q, k=5)
    assert out_ivf.to_pylist() == out_brute.to_pylist()
    # repeat sync: exact-corpus cache hit, nothing rewritten
    before = {k: v for k, v in cells_ab.items()}
    assert sync_ivf_index(root, [pa_path, pb_path], read_fn, n_centroids=4,
                          sample_rows=64) == key_ab
    after = {}
    for d in os.listdir(os.path.join(key_ab, "assign")):
        for f in os.listdir(os.path.join(key_ab, "assign", d)):
            after[(d, f)] = os.stat(
                os.path.join(key_ab, "assign", d, f)).st_size
    assert after == before
