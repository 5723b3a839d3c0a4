"""Round-5 verdict items: vectorized rate-limit fold parity, ANN actor
restart safety (no object-store ObjectRef in actor constructors)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from beats_ray.stages.flow import _bucket_fold_keep, rate_limit_groups


def _scalar_fold(ts: np.ndarray, seg_start: np.ndarray,
                 rate: float, burst: float) -> np.ndarray:
    """The pre-round-5 per-row reference fold (flow.py history)."""
    n = len(ts)
    keep = np.zeros(n, dtype=bool)
    lengths = np.diff(np.append(seg_start, n))
    for s, ln in zip(seg_start, lengths):
        tokens, last = burst, ts[s] if ln else 0.0
        for i in range(s, s + ln):
            tokens = min(burst, tokens + (ts[i] - last) * rate)
            last = ts[i]
            if tokens >= 1.0:
                tokens -= 1.0
                keep[i] = True
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("rate,burst", [(0.1, 1.0), (1.0, 5.0), (0.01, 2.0)])
def test_bucket_fold_matches_scalar(seed, rate, burst):
    rng = np.random.default_rng(seed)
    n_seg = rng.integers(1, 40)
    lengths = rng.integers(1, 60, size=n_seg)
    ts_parts, starts, off = [], [], 0
    for ln in lengths:
        gaps = rng.exponential(scale=1.0 / max(rate, 0.01), size=ln)
        gaps[0] = 0.0
        ts_parts.append(np.cumsum(gaps) + rng.uniform(0, 1000))
        starts.append(off)
        off += ln
    ts = np.concatenate(ts_parts)
    seg_start = np.asarray(starts)
    got = _bucket_fold_keep(ts, seg_start, rate, burst)
    want = _scalar_fold(ts, seg_start, rate, burst)
    assert np.array_equal(got, want)


def test_bucket_fold_empty():
    assert _bucket_fold_keep(np.array([]), np.array([], dtype=int),
                             1.0, 1.0).tolist() == []


def test_rate_limit_groups_e2e(ray_session):
    import ray.data as rd
    # 3 keys, one bursty: 10 events in 10s at 6/m should keep ~2
    rows = []
    base = pd.Timestamp("2024-01-01")
    for k, n, step in [("a", 10, 1.0), ("b", 5, 30.0), ("c", 1, 0.0)]:
        for i in range(n):
            rows.append({"k": k, "ts": base + pd.Timedelta(seconds=i * step),
                         "i": i})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = rate_limit_groups(ds, "6/m", ["k"]).to_pandas()
    # scalar reference per key
    df = pd.DataFrame(rows)
    want = 0
    for k, g in df.groupby("k"):
        ts = g["ts"].astype("datetime64[ns]").astype("int64").to_numpy() / 1e9
        want += int(_scalar_fold(ts, np.array([0]), 0.1, 1.0).sum())
    assert len(out) == want
    assert "__rl_bucket" not in out.columns
    # key "b" (30s gaps at 6/m = exactly refill rate) keeps everything
    assert (out["k"] == "b").sum() == 5


def test_knn_actors_restart_safe(ray_session):
    """Round-4 verdict item: ANN actors must survive restart after node loss.
    The fragility was OUR ray.put ObjectRefs captured in actor __init__
    (ray#53727: restart fails once the driver-side ref is dropped).  Fixed by
    capturing the small query/centroid matrices directly in the UDF closure.
    Assert at the serialization layer: pickle the actor class exactly the way
    Ray ships it and verify the payload carries ZERO ObjectRefs — i.e. a
    restarted actor rebuilds from the GCS-backed task spec alone.  (The
    core-worker warning that remains in bench tails is Ray Data INTERNAL: the
    ActorPoolMapOperator itself ray.puts the wrapped UDF and holds a strong
    ref for the dataset's lifetime — safe, upstream ray#53727 noise.)"""
    import ray.data as rd
    from ray import cloudpickle
    from beats_ray.functions.similarity import knn_brute, make_score_cls

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(200, 16))
    q = vecs[:3]
    qu = q / np.linalg.norm(q, axis=1, keepdims=True)

    cls = make_score_cls(qu, 5, "vec_id", "embedding")
    payload = cloudpickle.dumps(cls)
    assert b"ObjectRef" not in payload and b"_raylet" not in payload
    # a "restarted" actor: rebuild from the pickled spec alone, no driver state
    rebuilt = cloudpickle.loads(payload)()
    tbl = pa.table({"vec_id": pa.array(range(200), pa.int64()),
                    "embedding": pa.array([v.tolist() for v in vecs],
                                          pa.list_(pa.float64()))})
    local = rebuilt(tbl)
    assert local.num_rows == 15  # 3 queries x k=5

    out = knn_brute(rd.from_arrow(tbl), q, k=5)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = unit @ qu.T
    for qi in range(3):
        want = set(np.argsort(-cos[:, qi])[:5].tolist())
        got = {out["vec_id"][i].as_py()
               for i in range(len(out)) if out["query_idx"][i].as_py() == qi}
        assert got == want
