"""Round-3 regression tests: persistent IVF index, zero-copy veclib,
chunked simhash verify, vectorized string-key join buckets, anchored
timestamp fractions, int64 minhash shuffle keys."""

import numpy as np
import pyarrow as pa
import pytest


def _embeddings(n=256, d=16, seed=7):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, d))
    mat[1] = mat[0] + 0.01 * rng.standard_normal(d)
    return pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                     "embedding": pa.array(mat.tolist(), pa.list_(pa.float64()))})


# ----------------------------------------------------------------- veclib

def test_list_to_matrix_roundtrip_and_slices():
    from beats_ray.functions.veclib import list_to_matrix, matrix_to_list
    mat = np.arange(24, dtype=np.float64).reshape(6, 4)
    col = matrix_to_list(mat)
    assert np.array_equal(list_to_matrix(col), mat)
    # sliced input (non-zero Arrow offset) must decode identically
    sliced = col.slice(2, 3)
    assert np.array_equal(list_to_matrix(sliced), mat[2:5])
    # chunked input
    chunked = pa.chunked_array([col.slice(0, 3), col.slice(3, 3)])
    assert np.array_equal(list_to_matrix(chunked), mat)


def test_list_to_matrix_rejects_ragged_and_nulls():
    from beats_ray.functions.veclib import list_to_matrix
    ragged = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        list_to_matrix(ragged)
    nulls = pa.array([[1.0, 2.0], None], pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        list_to_matrix(nulls)


# ---------------------------------------------------------- persistent IVF

def test_ivf_persisted_index_matches_fresh(ray_session, tmp_path):
    import ray.data as rd
    from beats_ray.functions.similarity import (build_ivf_index, knn_ivf,
                                                load_ivf_index)
    tbl = _embeddings(512)
    ds = rd.from_arrow(tbl).repartition(8)
    cache = str(tmp_path / "ivf")
    q = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float64)
    fresh = knn_ivf(ds, q, k=5, n_centroids=8, n_probe=8, cache_dir=cache)
    # index persisted: centroids + de-hived cell dirs
    loaded = load_ivf_index(cache)
    assert loaded is not None
    # second call loads instead of rebuilding and returns identical rows
    again = knn_ivf(ds, q, k=5, n_centroids=8, n_probe=8, cache_dir=cache)
    assert fresh.to_pydict() == again.to_pydict()
    # pruned probe reads only probed cell dirs and still finds the plant
    pruned = knn_ivf(ds, q, k=5, n_centroids=8, n_probe=2, cache_dir=cache)
    assert 1 in pruned["vec_id"].to_pylist()


def test_ivf_cache_key_changes_with_corpus(tmp_path):
    from beats_ray.functions.similarity import ivf_cache_dir
    p1 = tmp_path / "a.parquet"
    p1.write_bytes(b"x" * 10)
    k1 = ivf_cache_dir(str(tmp_path / "root"), [str(p1)], 8)
    p1.write_bytes(b"y" * 11)        # size change -> new key
    k2 = ivf_cache_dir(str(tmp_path / "root"), [str(p1)], 8)
    assert k1 != k2
    k3 = ivf_cache_dir(str(tmp_path / "root"), [str(p1)], 16)
    assert k3 != k2                  # params in the key too


# ------------------------------------------------------- simhash chunking

def test_simhash_chunked_verify_identity(ray_session):
    """The chunked popcount verify must emit exactly the same edges as a
    direct O(n^2) computation on a bucket-sized corpus."""
    import ray.data as rd
    from beats_ray.functions.dedup import simhash64_batch, simhash_dedup
    rng = np.random.default_rng(3)
    base = ["alpha beta gamma delta epsilon zeta eta theta " + str(i)
            for i in range(300)]
    # plant near-identical clusters
    texts = base + [t + " iota" for t in base[:40]]
    ids = np.arange(len(texts), dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "text": pa.array(texts)}))
    edges = simhash_dedup(ds, max_hamming=3).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    # oracle: brute-force pairwise hamming over ALL docs, keep pairs whose
    # four 16-bit bands include an exact match (the blocking guarantee)
    sigs = simhash64_batch(texts)
    got = set(zip(edges["a"], edges["b"]))
    exp = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            x = int(sigs[i] ^ sigs[j])
            if bin(x).count("1") <= 3:
                exp.add((i, j))
    assert got == exp


# --------------------------------------------------- string-bucket joins

def test_bucketed_join_string_keys(ray_session):
    import pandas as pd
    import ray.data as rd
    from beats_ray.functions.joins import bucketed_join
    left = pd.DataFrame({"k": [f"user-{i % 17}" for i in range(200)],
                         "x": range(200)})
    right = pd.DataFrame({"k": [f"user-{i}" for i in range(17)],
                          "y": [i * 10 for i in range(17)]})
    out = bucketed_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="k", n_buckets=8).to_pandas()
    exp = left.merge(right, on="k", how="inner")
    assert len(out) == len(exp)
    assert out.sort_values(["k", "x"]).reset_index(drop=True) \
        .equals(exp.sort_values(["k", "x"]).reset_index(drop=True)) or \
        set(map(tuple, out.values.tolist())) == set(map(tuple, exp.values.tolist()))


# ------------------------------------------------ timestamp %f anchoring

def test_timestamp_dotted_date_fraction():
    from beats_ray.event import field_to_column
    from beats_ray.stages.timestamp import TimestampStage
    col = field_to_column("@timestamp")
    st = TimestampStage({"field": "t", "layouts": ["%d.%m.%Y %H:%M:%S.%f"]})
    out = st.process(pa.table({"t": pa.array(
        ["17.08.2026 10:11:12.123456", "05.01.2020 01:02:03.5"])}))
    vals = out[col].to_pylist()
    assert vals[0].month == 8 and vals[0].microsecond == 123456
    assert vals[1].month == 1 and vals[1].microsecond == 500000
    # comma separator + comma fraction
    st2 = TimestampStage({"field": "t", "layouts": ["%Y-%m-%d %H:%M:%S,%f"]})
    v = st2.process(pa.table({"t": pa.array(["2026-08-17 10:11:12,250"])}))
    assert v[col].to_pylist()[0].microsecond == 250000


# ------------------------------------------- minhash int64 shuffle keys

def test_minhash_bucket_key_is_int64(ray_session):
    """The LSH shuffle key column must be int64 (uint64 keys silently fall
    back to pickled-object shuffle blocks in Ray's sort-based groupby)."""
    import ray.data as rd
    from beats_ray.functions.dedup import minhash_lsh_pairs
    texts = ["the quick brown fox jumps over the lazy dog %d" % i
             for i in range(50)]
    texts += [texts[0] + " extra"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    edges = minhash_lsh_pairs(ds, threshold=0.5)
    pairs = edges.to_pandas() if hasattr(edges, "to_pandas") else edges.to_pandas()
    assert (0, 50) in set(zip(pairs["a"], pairs["b"]))


def test_minhash_broadcast_join_identity(ray_session):
    """The size-gated broadcast regime and the fully-distributed join regime
    must emit byte-identical (a, b, jaccard) edges."""
    import pandas as pd
    import ray.data as rd
    from beats_ray.functions.dedup import minhash_lsh_pairs
    base = ["alpha beta gamma delta epsilon zeta eta theta " * 3,
            "one two three four five six seven eight nine ten " * 2]
    texts = []
    for i in range(80):
        b = base[i % 2].split()
        # append a distinct tail: docs sharing a base are near-dups, the
        # tails keep them from being identical
        texts.append(" ".join(b + ["tail%d" % (i % 7)]))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    out = {}
    for mode in ("broadcast", "join"):
        df = minhash_lsh_pairs(ds, threshold=0.4, mode=mode).to_pandas()
        out[mode] = df[["a", "b", "jaccard"]].sort_values(["a", "b"]) \
            .reset_index(drop=True)
    assert len(out["broadcast"]) > 0
    pd.testing.assert_frame_equal(out["broadcast"], out["join"])


# ------------------------------------------------- file-backed cache store

def test_cache_file_store_survives_restart(tmp_path):
    """file_store.go semantics: state written at flush, read at setup, so a
    fresh actor (new stage instance) sees a previous run's puts."""
    import pyarrow as pa
    from beats_ray.stages.enrich import CacheStage
    cfg = {"store": {"file": {"id": "sess meta"}},
           "store_root": str(tmp_path)}
    put = CacheStage({**cfg, "put": {"key_field": "k", "value_field": "v"}})
    put.process(pa.table({"k": ["a", "b"], "v": [1, 2]}))
    # interval 0 -> flushed at the batch boundary; path uses the cleaned id
    assert (tmp_path / "cache_processor" / "sess_meta").exists()
    # "restart": a brand-new instance must recover the state
    get = CacheStage({**cfg, "get": {"key_field": "k", "target_field": "c"}})
    out = get.process(pa.table({"k": ["b", "a", "missing"]}))
    assert out["c"].to_pylist() == [2, 1, None]


def test_cache_file_store_write_interval_and_ttl(tmp_path):
    import time
    import pyarrow as pa
    from beats_ray.stages.enrich import CacheStage
    cfg = {"store": {"file": {"id": "slow", "write_interval": "1h"}},
           "store_root": str(tmp_path)}
    put = CacheStage({**cfg, "put": {"key_field": "k", "value_field": "v",
                                     "ttl": "10ms"}})
    put.process(pa.table({"k": ["x"], "v": ["y"]}))
    # write_interval not yet elapsed -> nothing on disk
    assert not (tmp_path / "cache_processor" / "slow").exists()
    put.flush()                      # final write-out
    assert (tmp_path / "cache_processor" / "slow").exists()
    time.sleep(0.02)                 # ttl expiry
    get = CacheStage({**cfg, "get": {"key_field": "k", "target_field": "c"}})
    out = get.process(pa.table({"k": ["x"]}))
    assert out["c"].to_pylist() == [None]


def test_cache_delete_and_capacity():
    import pyarrow as pa
    from beats_ray.stages.enrich import CacheStage
    st = CacheStage({"put": {"key_field": "k", "value_field": "v"},
                     "store": {"memory": {"id": "m"}, "capacity": 2}})
    st.process(pa.table({"k": ["a", "b", "c"], "v": [1, 2, 3]}))
    assert len(st.store) == 2        # capacity eviction
    dele = CacheStage({"delete": {"key_field": "k"}})
    dele.store = dict(st.store)
    dele.process(pa.table({"k": list(st.store.keys())[:1]}))
    assert len(dele.store) == 1


# --------------------------------------------- aws_vpcflow reference golden

def _flatten_golden(obj, prefix=""):
    out = {}
    for k, v in obj.items():
        key = "ts" if (not prefix and k == "@timestamp") else \
            (prefix + k.replace(".", "_"))
        if isinstance(v, dict):
            out.update(_flatten_golden(v, key + "_"))
        else:
            out[key] = v
    return out


def test_aws_vpcflow_reference_goldens():
    """Run every reference golden case (x-pack/filebeat/processors/
    aws_vpcflow/testdata) through the registered stage and compare the full
    flattened event against the reference's own -golden.json output."""
    import datetime
    import json
    import os
    import yaml
    import pyarrow as pa
    from beats_ray.stages import stage_factory

    tdir = "/root/reference/x-pack/filebeat/processors/aws_vpcflow/testdata"
    with open(os.path.join(tdir, "aws-vpc-flow-logs.yml")) as f:
        cases = yaml.safe_load(f)

    def render(v):
        if isinstance(v, datetime.datetime):
            return v.strftime("%Y-%m-%dT%H:%M:%SZ")
        return v

    n_cases = 0
    for name, tc in cases.items():
        golden_path = os.path.join(tdir, f"{name}.golden.json")
        if not os.path.exists(golden_path):
            continue
        with open(golden_path) as f:
            golden = json.load(f)
        cfg = {"format": tc["format"]}
        if tc.get("mode"):
            cfg["mode"] = tc["mode"]
        st = stage_factory("parse_aws_vpc_flow_log")(cfg)
        batch = pa.table({"message": pa.array(tc["samples"], pa.string())})
        out = st.process(batch)
        assert "error_message" not in out.column_names or \
            out["error_message"].null_count == len(out), \
            f"{name}: rows failed to parse"
        rows = out.to_pylist()
        assert len(rows) == len(golden)
        for row, exp in zip(rows, golden):
            got = {k: render(v) for k, v in row.items() if v is not None}
            want = _flatten_golden(exp)
            assert got == want, f"{name}: {got} != {want}"
        n_cases += 1
    assert n_cases >= 12     # all golden-backed cases ran


# ------------------------------------------------- sessionize auto-routing

def test_sessionize_auto_identity_both_regimes(ray_session):
    """The router must return the same answer as the direct fold in both
    density regimes (it picks sorted vs salted by sample key density)."""
    import pandas as pd
    import ray.data as rd
    from beats_ray.functions.sessionize import sessionize, sessionize_auto
    rng = np.random.default_rng(11)
    # hot-key skew: 5 users, each > 10% of rows (-> salted_time path)
    n = 4000
    low = pd.DataFrame({
        "user_id": rng.integers(0, 5, n),
        "ts": pd.to_datetime(rng.integers(0, 4 * 86400, n), unit="s")})
    # high density: ~1 key per 2 rows (-> sorted path)
    high = pd.DataFrame({
        "user_id": rng.integers(0, 2000, n),
        "ts": pd.to_datetime(rng.integers(0, 4 * 86400, n), unit="s")})
    # few evenly-sized keys, no skew (-> direct fold, one shuffle)
    mid = pd.DataFrame({
        "user_id": rng.integers(0, 30, n),
        "ts": pd.to_datetime(rng.integers(0, 4 * 86400, n), unit="s")})
    for df in (low, high, mid):
        direct = sessionize(rd.from_pandas(df), key="user_id", order="ts",
                            ts="ts").to_pandas()
        routed = sessionize_auto(rd.from_pandas(df), key="user_id",
                                 order=None, ts="ts")
        routed = routed.to_pandas() if hasattr(routed, "to_pandas") else \
            routed.to_pandas()
        a = direct.sort_values("user_id").reset_index(drop=True)
        b = routed.to_pandas() if not isinstance(routed, pd.DataFrame) else routed
        b = b.sort_values("user_id").reset_index(drop=True)
        assert a["n_sessions"].tolist() == b["n_sessions"].tolist()
        assert a["user_id"].tolist() == b["user_id"].tolist()
