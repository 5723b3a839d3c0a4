"""Training-data operators: dedup / similarity / textstats / multimodal."""

import numpy as np
import pyarrow as pa
import pytest

from beats_ray.functions.dedup import (connected_components, minhash_signature,
                                       _minhash_seeds, _shingles, ngram_jaccard,
                                       simhash64)
from beats_ray.functions.textstats import hash64, rolling_fingerprint
from beats_ray.stages.base import stage_factory


def run(name, cfg, batch):
    st = stage_factory(name)(cfg)
    st.setup()
    return st.apply(batch)


# ---------------------------------------------------------------- primitives

def test_ngram_jaccard():
    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "z y x w v") == 0.0
    j = ngram_jaccard("a b c d e f", "a b c d e g")
    assert 0.3 < j < 1.0


def test_minhash_estimates_jaccard():
    a_seed, b_seed = _minhash_seeds()
    s1 = _shingles("the quick brown fox jumps over the lazy dog " * 5)
    s2 = _shingles("the quick brown fox jumps over the lazy cat " * 5)
    m1 = minhash_signature(s1, a_seed, b_seed)
    m2 = minhash_signature(s2, a_seed, b_seed)
    est = (m1 == m2).mean()
    true = len(s1 & s2) / len(s1 | s2)
    assert abs(est - true) < 0.15
    # identical input -> identical signature (determinism)
    assert (minhash_signature(s1, a_seed, b_seed) == m1).all()


def test_simhash_near_for_near_texts():
    t1 = "alpha beta gamma delta epsilon zeta eta theta".split()
    t2 = "alpha beta gamma delta epsilon zeta eta iota".split()
    t3 = "one two three four five six seven eight".split()
    d12 = bin(simhash64(t1) ^ simhash64(t2)).count("1")
    d13 = bin(simhash64(t1) ^ simhash64(t3)).count("1")
    assert d12 < d13
    assert simhash64(t1) == simhash64(list(t1))


def test_rolling_fingerprint_order_sensitive():
    assert rolling_fingerprint(["a", "b"]) != rolling_fingerprint(["b", "a"])
    assert rolling_fingerprint(["a", "b"]) == rolling_fingerprint(["a", "b"])
    assert hash64("x") == hash64("x")


def test_connected_components():
    import pandas as pd
    edges = pd.DataFrame({"a": [1, 2, 10], "b": [2, 3, 11]})
    cc = connected_components(edges)
    roots = dict(zip(cc["doc_id"], cc["root"]))
    assert roots[1] == roots[2] == roots[3] == 1
    assert roots[10] == roots[11] == 10


# ---------------------------------------------------------------- stages

def test_token_count_modes():
    batch = pa.table({"text": ["a b  c", "hello, world!"]})
    out = run("token_count", {"field": "text"}, batch)
    assert out.column("text_tokens").to_pylist() == [4, 2]
    out = run("token_count", {"field": "text", "mode": "bpe", "target": "bpe"}, batch)
    assert out.column("bpe").to_pylist() == [3, 4]  # hello , world !


def test_lang_id():
    batch = pa.table({"text": ["the cat and the dog of a house",
                               "der hund und die katze ist ein tier",
                               "xyzzy plugh"]})
    out = run("lang_id", {"field": "text"}, batch)
    assert out.column("lang_pred").to_pylist() == ["en", "de", "und"]


def test_quality_score_features():
    batch = pa.table({"text": ["the quick fox, and the dog."]})
    out = run("quality_score", {"field": "text"}, batch)
    assert out.column("q_n_tokens").to_pylist() == [6]
    assert out.column("q_n_chars").to_pylist() == [27]
    got = out.column("q_stopword_ratio").to_pylist()[0]
    assert got == pytest.approx(3 / 6)  # the, and, the ("dog." has punct)
    q = out.column("q_quality").to_pylist()[0]
    assert 0.0 <= q <= 1.0


# ---------------------------------------------------------------- pipelines (ray)

@pytest.fixture(scope="module")
def near_dup_docs():
    """Constructed corpus with known near-dup structure."""
    base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    docs = {
        0: base,
        1: base.replace("dog", "cat"),            # very near dup of 0
        2: base,                                   # exact dup of 0
        3: "completely different words entirely unrelated content here " * 5,
        4: "another unrelated document with its own vocabulary set " * 5,
    }
    return pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                     "text": pa.array(list(docs.values()), pa.string())})


def test_exact_dedup(ray_session, near_dup_docs):
    import ray.data as rd
    from beats_ray.functions.dedup import exact_dedup
    out = exact_dedup(rd.from_arrow(near_dup_docs)).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 3, 4]  # 2 deduped into 0


def test_minhash_lsh_finds_near_dups(ray_session, near_dup_docs):
    import ray.data as rd
    from beats_ray.functions.dedup import minhash_lsh_pairs
    edges = minhash_lsh_pairs(rd.from_arrow(near_dup_docs), threshold=0.5).to_pandas()
    pairs = set(zip(edges["a"], edges["b"]))
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert all(a in (0, 1, 2) and b in (0, 1, 2) for a, b in pairs)


@pytest.mark.parametrize("mode", ["broadcast", "join"])
def test_ngram_jaccard_pairs_exact(ray_session, near_dup_docs, mode):
    """Prefix-filtered AllPairs matches brute-force exact Jaccard on every
    doc pair, in BOTH verify regimes (broadcast store / co-group join)."""
    import ray.data as rd
    from beats_ray.functions.dedup import ngram_jaccard, ngram_jaccard_pairs
    docs = dict(zip(near_dup_docs["doc_id"].to_pylist(),
                    near_dup_docs["text"].to_pylist()))
    for t in (0.5, 0.8):
        want = {(a, b) for a in docs for b in docs if a < b
                and ngram_jaccard(docs[a], docs[b]) >= t}
        edges = ngram_jaccard_pairs(rd.from_arrow(near_dup_docs),
                                    threshold=t, mode=mode).to_pandas()
        assert set(zip(edges["a"], edges["b"])) == want
        for _, r in edges.iterrows():
            assert abs(r["jaccard"]
                       - ngram_jaccard(docs[r["a"]], docs[r["b"]])) < 1e-6


def test_ngram_jaccard_pairs_boundary(ray_session):
    """Pairs JUST below threshold are excluded, just-above included —
    the prefix + length filters must not prune true edges."""
    import ray.data as rd
    from beats_ray.functions.dedup import ngram_jaccard, ngram_jaccard_pairs
    words = [f"w{i}" for i in range(40)]
    # doc1 shares 30 of 40 word-3-gram positions with doc0
    d0 = " ".join(words)
    d1 = " ".join(words[:30] + [f"x{i}" for i in range(10)])
    d2 = " ".join(reversed(words))                    # same vocab, new grams
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array([d0, d1, d2], pa.string())})
    j01 = ngram_jaccard(d0, d1)
    assert 0.1 < j01 < 0.9
    eps = 1e-6
    below = ngram_jaccard_pairs(rd.from_arrow(tbl), threshold=j01 + eps,
                                mode="broadcast").to_pandas()
    at = ngram_jaccard_pairs(rd.from_arrow(tbl), threshold=j01 - eps,
                             mode="broadcast").to_pandas()
    # zero-edge results may come back column-less from the aggregate
    assert len(below) == 0 or \
        (0, 1) not in set(zip(below["a"], below["b"]))
    assert (0, 1) in set(zip(at["a"], at["b"]))


def test_simhash_dedup_pipeline(ray_session, near_dup_docs):
    import ray.data as rd
    from beats_ray.functions.dedup import simhash_dedup
    edges = simhash_dedup(rd.from_arrow(near_dup_docs), max_hamming=10).to_pandas()
    pairs = set(zip(edges["a"], edges["b"]))
    assert (0, 2) in pairs  # exact dup -> hamming 0


def test_embedding_near_dup_and_lsh_recall(ray_session):
    import ray.data as rd
    from beats_ray.functions.dedup import embedding_near_dup, embedding_near_dup_lsh
    rng = np.random.default_rng(7)
    # 3 tight clusters of 5 + 35 random vectors
    centers = rng.standard_normal((3, 64))
    vecs, ids = [], []
    for ci, c in enumerate(centers):
        for j in range(5):
            vecs.append(c + 0.05 * rng.standard_normal(64))
            ids.append(ci * 5 + j)
    for j in range(35):
        vecs.append(rng.standard_normal(64))
        ids.append(100 + j)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([list(map(float, v)) for v in vecs],
                                          pa.list_(pa.float64()))})
    exact = embedding_near_dup(rd.from_arrow(tbl), threshold=0.95).to_pandas()
    exact_pairs = set(zip(exact["a"], exact["b"]))
    assert len(exact_pairs) == 3 * 10  # 5 choose 2 per cluster
    approx = embedding_near_dup_lsh(rd.from_arrow(tbl), threshold=0.95,
                                    n_tables=8).to_pandas()
    approx_pairs = set(zip(approx["a"], approx["b"]))
    assert approx_pairs <= exact_pairs          # no false positives (verified)
    assert len(approx_pairs) >= 0.8 * len(exact_pairs)  # recall


def test_knn_ivf_recall_vs_brute(ray_session):
    import ray.data as rd
    from beats_ray.functions.similarity import knn_brute, knn_ivf
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((300, 64))
    tbl = pa.table({"vec_id": pa.array(range(300), pa.int64()),
                    "embedding": pa.array([list(map(float, v)) for v in mat],
                                          pa.list_(pa.float64()))})
    q = mat[0]
    brute = knn_brute(rd.from_arrow(tbl), q, k=10).to_pydict()
    ivf = knn_ivf(rd.from_arrow(tbl), q, k=10, n_centroids=8, n_probe=8).to_pydict()
    # n_probe == n_centroids -> exhaustive -> identical to brute force
    assert set(ivf["vec_id"]) == set(brute["vec_id"])
    assert brute["vec_id"][0] == 0  # self is nearest


def test_multimodal_stub_pipeline(ray_session):
    import ray.data as rd
    from beats_ray.functions.multimodal import synth_image_table
    from beats_ray.pipeline import Pipeline
    tbl = synth_image_table(32)
    pipe = Pipeline({"processors": [
        {"image_decode": {"fake": True}},
        {"image_resize": {"width": 8, "height": 8}},
        {"image_features": {}},
    ], "batch_size": 16})
    out = pipe.apply(rd.from_arrow(tbl)).to_pandas()
    assert len(out) == 32
    assert all(len(p) == 64 for p in out["pixels_resized"])
    assert all(len(f) == 18 for f in out["features"])
    # real-codec path must fail loudly, not silently fake
    from beats_ray.functions.multimodal import ImageDecode
    with pytest.raises(NotImplementedError):
        ImageDecode({"fake": False}).setup()


def test_multimodal_deterministic():
    from beats_ray.functions.multimodal import synth_image_table
    assert synth_image_table(8).equals(synth_image_table(8))


def test_bucketed_join_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd
    from beats_ray.functions.joins import broadcast_join, bucketed_join
    left = pd.DataFrame({"k": [1, 2, 3, 4], "lv": ["a", "b", "c", "d"]})
    right = pd.DataFrame({"k": [2, 3, 3, 5], "rv": [20, 30, 31, 50]})
    expected = left.merge(right, on="k").sort_values(["k", "rv"]).reset_index(drop=True)
    got = bucketed_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="k", n_buckets=4).to_pandas() \
        .sort_values(["k", "rv"]).reset_index(drop=True)
    assert got[["k", "lv", "rv"]].equals(expected[["k", "lv", "rv"]])
    # broadcast join agrees
    bj = broadcast_join(rd.from_pandas(left), right, on="k", how="inner") \
        .to_pandas().sort_values(["k", "rv"]).reset_index(drop=True)
    assert bj[["k", "lv", "rv"]].equals(expected[["k", "lv", "rv"]])


def test_window_assignment():
    import datetime
    import pyarrow as pa
    from beats_ray.functions.windows import (sliding_window_explode,
                                             tumbling_window_assign)
    ts = [datetime.datetime(2024, 1, 1, 10, 37, 21)]
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")), "v": [1]})
    out = tumbling_window_assign(t, "ts", 3600)
    assert out.column("window_start").to_pylist() == [datetime.datetime(2024, 1, 1, 10, 0)]
    e = sliding_window_explode(t, "ts", 3600, 900)
    ws = sorted(w.isoformat() for w in e.column("window_start").to_pylist())
    assert ws == ["2024-01-01T09:45:00", "2024-01-01T10:00:00",
                  "2024-01-01T10:15:00", "2024-01-01T10:30:00"]


def test_cc_label_propagation_matches_union_find(ray_session):
    import pandas as pd
    import ray.data as rd
    from beats_ray.functions.dedup import cc_label_propagation, connected_components
    # chain 1-2-3, triangle 10-11-12, isolated pair 20-21 (small diameter:
    # each propagation round costs two bucketed joins)
    edges = pd.DataFrame({"a": [1, 2, 10, 11, 10, 20],
                          "b": [2, 3, 11, 12, 12, 21]})
    dist = cc_label_propagation(rd.from_pandas(edges), max_rounds=4,
                                n_buckets=2).to_pandas()
    uf = connected_components(edges).rename(columns={"doc_id": "node"})
    merged = dist.merge(uf, on="node", suffixes=("_lp", "_uf"))
    assert (merged["root_lp"] == merged["root_uf"]).all()


def test_redact_stage():
    batch = pa.table({"text": ["mail me at bob@example.com from 10.0.0.1",
                               "card 1234567890123456 ok"]})
    out = run("redact", {"fields": ["text"]}, batch)
    got = out.column("text").to_pylist()
    assert got[0] == "mail me at <EMAIL> from <IP>"
    assert got[1] == "card <NUM> ok"


def test_watcher_metadata_alias():
    out = run("add_docker_metadata",
              {"table": {"abc123": {"name": "web", "image": "nginx"}},
               "match_field": "cid"},
              pa.table({"cid": ["abc123", "zzz"]}))
    assert out.column("container_name").to_pylist() == ["web", None]
    assert out.column("container_image").to_pylist() == ["nginx", None]


def test_sample_hash_deterministic_and_partition_stable():
    batch = pa.table({"k": [f"id-{i}" for i in range(1000)]})
    out1 = run("sample", {"field": "k", "method": "hash", "rate": 0.2}, batch)
    out2 = run("sample", {"field": "k", "method": "hash", "rate": 0.2}, batch)
    assert out1.column("k").to_pylist() == out2.column("k").to_pylist()
    assert 100 < len(out1) < 300  # ~20%
    # partitioning-independent: same rows survive from any batch split
    a = run("sample", {"field": "k", "method": "hash", "rate": 0.2}, batch.slice(0, 500))
    b = run("sample", {"field": "k", "method": "hash", "rate": 0.2}, batch.slice(500))
    assert a.column("k").to_pylist() + b.column("k").to_pylist() == \
        out1.column("k").to_pylist()


def test_export_shards(ray_session, tmp_path):
    import ray.data as rd
    import pyarrow.parquet as pq
    import glob as g
    from beats_ray.functions.sampling import export_shards
    tbl = pa.table({"doc_id": pa.array(range(500), pa.int64()),
                    "text": [f"doc {i}" for i in range(500)]})
    counts = export_shards(rd.from_arrow(tbl), str(tmp_path), 4, "doc_id")
    assert sum(counts.values()) == 500 and len(counts) == 4
    assert max(counts.values()) < 2.5 * min(counts.values())  # roughly even
    back = pa.concat_tables([pq.read_table(f)
                             for f in g.glob(str(tmp_path / "shard-*" / "*.parquet"))])
    assert sorted(back.column("doc_id").to_pylist()) == list(range(500))


def test_ngram_contamination(ray_session):
    """Planted-overlap check: doc 1 shares an 8-gram span with benchmark
    doc 0, doc 2 shares nothing, doc 3 shares two distinct 8-gram windows
    via a 9-word copied span (9 words -> 2 overlapping 8-grams)."""
    import ray

    from beats_ray.functions.decontam import ngram_contamination

    span = "alpha beta gamma delta epsilon zeta eta theta"          # 8 words
    span9 = span + " iota"                                          # 9 words
    bench = ray.data.from_items([
        {"doc_id": 0, "text": f"benchmark intro {span9} benchmark outro"},
    ])
    docs = ray.data.from_items([
        {"doc_id": 1, "text": f"training junk {span} more filler words"},
        {"doc_id": 2, "text": "totally unrelated text with no overlap at all "
                              "padded out to be long enough"},
        {"doc_id": 3, "text": f"another doc copying {span9} verbatim"},
    ])
    out = ngram_contamination(docs, bench, n=8).to_pandas()
    got = dict(zip(out["doc_id"], out["contaminated"]))
    assert got == {1: 1, 3: 2}, got


def test_watcher_metadata_file_reload(tmp_path):
    """table_path mode: per-actor mtime-polled reload (the Ray-first
    analogue of add_docker_metadata's watcher loop) — an updated metadata
    file is picked up on the next batch once refresh_interval elapses."""
    import json as _json
    import os as _os
    import time as _time

    import pyarrow as pa

    from beats_ray.stages.enrich import AddDockerMetadata

    path = tmp_path / "containers.json"
    path.write_text(_json.dumps({"c1": {"name": "web", "image": "nginx:1"}}))
    st = AddDockerMetadata({"table_path": str(path),
                            "refresh_interval": 0.0})
    batch = pa.table({"container_id": ["c1", "c2"]})
    out = st.process(batch).to_pylist()
    assert out[0]["container_name"] == "web"
    assert out[1]["container_name"] is None
    _time.sleep(0.02)
    path.write_text(_json.dumps({"c1": {"name": "web2", "image": "nginx:2"}}))
    _os.utime(path)
    out2 = st.process(batch).to_pylist()
    assert out2[0]["container_name"] == "web2"
    assert out2[0]["container_image"] == "nginx:2"


def test_watcher_metadata_interval_gate(tmp_path):
    """Before refresh_interval elapses the old map is served (bounded
    staleness, no stat storm)."""
    import json as _json
    import os as _os

    import pyarrow as pa

    from beats_ray.stages.enrich import AddDockerMetadata

    path = tmp_path / "containers.json"
    path.write_text(_json.dumps({"c1": {"name": "old"}}))
    st = AddDockerMetadata({"table_path": str(path),
                            "refresh_interval": 3600.0})
    batch = pa.table({"container_id": ["c1"]})
    assert st.process(batch).to_pylist()[0]["container_name"] == "old"
    path.write_text(_json.dumps({"c1": {"name": "new"}}))
    _os.utime(path)
    # interval not elapsed -> still the old map
    assert st.process(batch).to_pylist()[0]["container_name"] == "old"


def test_pack_sequences_greedy_budget(ray_session):
    """Greedy packing: bins never exceed max_tokens unless a single doc
    does; docs pack in id order; oversized docs get their own bin."""
    import pandas as pd
    import ray.data as rd
    from beats_ray.functions.packing import pack_sequences

    docs = pd.DataFrame({
        "doc_id": [0, 8, 16, 24, 32],   # all bucket 0 (mod 8)
        "text": ["a b c",               # 3 tokens
                 "d e",                 # 2 -> bin 0 (sum 5)
                 " ".join("x" * 1) * 0 + " ".join(["t"] * 7),  # 7 -> bin 1
                 " ".join(["u"] * 20),  # 20 > 8: own bin 2
                 "v w"],                # 2 -> bin 3
    })
    out = pack_sequences(rd.from_pandas(docs), max_tokens=8,
                         num_buckets=8).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["bucket"].tolist() == [0, 0, 0, 0, 0]
    assert out["bin"].tolist() == [0, 0, 1, 2, 3]
    assert out["n_tokens"].tolist() == [3, 2, 7, 20, 2]


def test_pack_sequences_property_random(ray_session):
    """Property check on random corpora: (1) every multi-doc bin stays
    within the budget, (2) bins are contiguous in doc order per bucket,
    (3) every doc is assigned exactly once, (4) greedy-tightness: the
    first doc of bin k+1 would NOT have fit in bin k."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from beats_ray.functions.packing import pack_sequences

    rng = np.random.default_rng(7)
    n = 400
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join(["w"] * int(k))
                 for k in rng.integers(1, 40, size=n)],
    })
    max_tokens = 64
    out = pack_sequences(rd.from_pandas(docs), max_tokens=max_tokens,
                         num_buckets=4).to_pandas()
    assert len(out) == n and out["doc_id"].nunique() == n
    for bucket, g in out.groupby("bucket"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        # bins nondecreasing and starting at 0 (contiguity in doc order)
        assert g["bin"].iloc[0] == 0
        assert ((g["bin"].diff().fillna(0)).isin([0, 1])).all()
        sums = g.groupby("bin")["n_tokens"].agg(["sum", "count"])
        multi = sums[sums["count"] > 1]
        assert (multi["sum"] <= max_tokens).all()
        # greedy tightness: first doc of each later bin overflows prior bin
        for b in range(1, int(g["bin"].max()) + 1):
            prev_sum = int(g[g["bin"] == b - 1]["n_tokens"].sum())
            first_next = int(g[g["bin"] == b]["n_tokens"].iloc[0])
            assert prev_sum + first_next > max_tokens
