"""Sessionization — including the salted-repartition path for hot keys.

The north rule requires skew from hot conversations to be handled with
salted repartitioning before the per-key shuffle.  ``sessionize`` is the
direct form: ``groupby(conv).map_groups(fold)`` — a single hot conversation
(Zipfian tail, 10-100x median turns) lands one giant group on one task.

``sessionize_salted`` decomposes it: rows are bucketed by
``salt = turn_idx // segment_turns`` so a hot conversation splits into many
(conv, salt) SEGMENTS processed in parallel; per-segment partials
``(first_ts, last_ts, n_sessions, min/max turn)`` are mergeable because
segments are contiguous turn ranges:

    sessions(A + B) = sessions(A) + sessions(B)
                      - 1 if gap(last_ts(A), first_ts(B)) <= gap_s

The final per-conv merge handles only #segments rows (tiny).  The identity
``sessionize_salted == sessionize`` is asserted in tests and both share the
DuckDB window-function oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sessionize(ds, key: str = "conv_id", order: str = "turn_idx",
               ts: str = "ts", gap_s: float = 1800.0):
    """Direct per-key session count: sort by order within key, count gaps."""
    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        gaps = g[ts].diff().dt.total_seconds()
        n = int((gaps > gap_s).sum()) + 1
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n_sessions": np.array([n], dtype=np.int64)})
    return ds.groupby(key).map_groups(fold, batch_format="pandas")


def sessionize_sorted(ds, key: str = "conv_id", order: str = "turn_idx",
                      ts: str = "ts", gap_s: float = 1800.0) -> pa.Table:
    """Sort-based session count — no per-key UDF calls at all.

    One global range sort on (key, order); each sorted block computes
    per-key partials with ONE vectorized pandas groupby (first/last ts,
    internal session breaks); the driver stitches the few per-key partials
    that span block boundaries (#partials ~ #keys + #blocks).  Identical
    semantics to ``sessionize``; Python cost is O(blocks), not O(keys) —
    the strategy for key cardinalities where per-group calls dominate.
    """
    ds = ds.sort([key, order])

    def block_partials(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: [], "min_turn": [], "first_ts": [],
                                 "last_ts": [], "n_sessions": []})
        gaps = df[ts].diff().dt.total_seconds()
        new_key = df[key] != df[key].shift()
        brk = (gaps > gap_s) & ~new_key
        grp = df.groupby(key, sort=False)
        out = pd.DataFrame({
            key: grp[key].first().to_numpy(),
            "min_turn": grp[order].min().astype(np.int64).to_numpy(),
            "first_ts": grp[ts].first().to_numpy(),
            "last_ts": grp[ts].last().to_numpy(),
            "n_sessions": (brk.groupby(df[key], sort=False).sum() + 1)
                          .astype(np.int64).to_numpy(),
        })
        return out

    partials = ds.map_batches(block_partials, batch_format="pandas").take_all()
    if not partials:
        # empty dataset: pd.DataFrame([]) has no columns and df[key] would
        # KeyError below
        return pa.table({key: pa.array([], pa.string()),
                         "n_sessions": pa.array([], pa.int64())})
    df = pd.DataFrame(partials).sort_values([key, "min_turn"], kind="mergesort")
    # stitch partials of the same key: subtract one session per fused border
    same = df[key] == df[key].shift()
    border_gap = (df["first_ts"] - df["last_ts"].shift()).dt.total_seconds()
    agg = df.groupby(key, sort=True)["n_sessions"].sum()
    fuse_per_key = (same & (border_gap <= gap_s)).groupby(df[key].to_numpy()).sum()
    agg = (agg - fuse_per_key.reindex(agg.index).fillna(0)).astype(np.int64)
    return pa.table({key: pa.array(agg.index.to_numpy()),
                     "n_sessions": pa.array(agg.to_numpy(), pa.int64())})


def sessionize_salted(ds, key: str = "conv_id", order: str = "turn_idx",
                      ts: str = "ts", gap_s: float = 1800.0,
                      segment_turns: int = 256):
    """Salted two-phase session count (skew-safe for hot keys)."""

    def add_salt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        salt = pc.cast(pc.floor(pc.divide(pc.cast(t[order], pa.float64()),
                                          float(segment_turns))), pa.int32())
        return t.append_column("salt", salt)

    salted = ds.map_batches(add_salt, batch_format="pyarrow")

    def segment_fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        gaps = g[ts].diff().dt.total_seconds()
        n = int((gaps > gap_s).sum()) + 1
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "salt": np.array([g["salt"].iloc[0]], dtype=np.int32),
            "first_ts": [g[ts].iloc[0]],
            "last_ts": [g[ts].iloc[-1]],
            "n_sessions": np.array([n], dtype=np.int64),
        })

    partials = salted.groupby([key, "salt"]).map_groups(
        segment_fold, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("salt")
        n = int(g["n_sessions"].sum())
        # stitch adjacent segments: no boundary gap -> their border sessions fuse
        gaps = (g["first_ts"].iloc[1:].reset_index(drop=True)
                - g["last_ts"].iloc[:-1].reset_index(drop=True)).dt.total_seconds()
        n -= int((gaps <= gap_s).sum())
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n_sessions": np.array([n], dtype=np.int64)})

    return partials.groupby(key).map_groups(merge, batch_format="pandas")


def sessionize_auto(ds, key: str = "conv_id", order: str | None = None,
                    ts: str = "ts", gap_s: float = 1800.0,
                    segment_turns: int = 256, window_s: float = 86400.0,
                    sample_rows: int = 65536,
                    keys_per_row_cutoff: float = 0.30,
                    hot_key_share: float = 0.10):
    """Strategy router: pick the sessionize implementation from sampled key
    statistics instead of hard-coding one shuffle shape.

    One sample batch estimates (a) distinct-keys-per-row and (b) the hottest
    key's row share.  EXTREME density (avg group below ~3 rows — e.g. a
    nearly-unique key) means per-group UDF calls dominate -> the sort-based
    strategy (Python cost O(blocks), zero per-key calls; note Ray's
    map_groups performs the same key sort internally, so the sorted path
    only wins when the per-group call count itself is the cost).  A HOT key
    (> hot_key_share of sampled rows) means one giant group would pin a
    single task -> the salted two-phase strategy (turn-range segments with
    an ordinal column, time-window segments otherwise).  Everything else ->
    the direct per-group fold: with moderate key counts it is the cheapest
    shape (ONE shuffle; measured in round 3, both alternatives were 8-10x
    slower on an unskewed 1500-key stream — salting explodes (key, window)
    group counts, the sorted path pays a second global exchange).  All
    strategies are identity-tested against the direct fold and share its
    oracle.
    """
    try:
        sample = ds.take_batch(sample_rows, batch_format="pyarrow")
    except (ValueError, StopIteration):      # empty input: any strategy works
        return sessionize(ds, key=key, order=order or ts, ts=ts, gap_s=gap_s)
    if isinstance(sample, dict):
        sample = pa.table(sample)
    import pyarrow.compute as pc
    n = len(sample)
    density = (pc.count_distinct(sample[key]).as_py() or 0) / max(n, 1)
    if density >= keys_per_row_cutoff:
        return sessionize_sorted(ds, key=key, order=order or ts, ts=ts,
                                 gap_s=gap_s)
    counts = sample[key].value_counts()
    top = max((c.as_py() for c in counts.field("counts")), default=0)
    if top / max(n, 1) >= hot_key_share:
        if order is not None:
            return sessionize_salted(ds, key=key, order=order, ts=ts,
                                     gap_s=gap_s, segment_turns=segment_turns)
        return sessionize_salted_time(ds, key=key, ts=ts, gap_s=gap_s,
                                      window_s=window_s)
    return sessionize(ds, key=key, order=order or ts, ts=ts, gap_s=gap_s)


def sessionize_salted_time(ds, key: str = "user_id", ts: str = "ts",
                           gap_s: float = 1800.0, window_s: float = 86400.0):
    """Time-window-salted session count for event streams WITHOUT an ordinal
    column (order == event time): salt = floor(epoch / window_s), so a hot
    key splits into contiguous TIME segments with the same mergeable
    partials as ``sessionize_salted`` (segments are contiguous in ts by
    construction).  Identity with ``sessionize(order=ts)`` is tested."""

    def add_salt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = t[ts]
        tt = col.type
        if pa.types.is_timestamp(tt) and tt.unit != "us":
            # ns-unit columns (pandas default) would compute ms, not s
            col = pc.cast(col, pa.timestamp("us", tz=tt.tz))
        epoch = pc.divide(pc.cast(col, pa.int64()), 1_000_000)  # us -> s
        salt = pc.cast(pc.floor(pc.divide(pc.cast(epoch, pa.float64()),
                                          float(window_s))), pa.int64())
        return t.append_column("salt", salt)

    salted = ds.map_batches(add_salt, batch_format="pyarrow")

    def segment_fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts)
        gaps = g[ts].diff().dt.total_seconds()
        n = int((gaps > gap_s).sum()) + 1
        return pd.DataFrame({
            key: np.array([g[key].iloc[0]]),
            "salt": np.array([g["salt"].iloc[0]], dtype=np.int64),
            "first_ts": [g[ts].iloc[0]],
            "last_ts": [g[ts].iloc[-1]],
            "n_sessions": np.array([n], dtype=np.int64),
        })

    partials = salted.groupby([key, "salt"]).map_groups(
        segment_fold, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("salt")
        n = int(g["n_sessions"].sum())
        gaps = (g["first_ts"].iloc[1:].reset_index(drop=True)
                - g["last_ts"].iloc[:-1].reset_index(drop=True)).dt.total_seconds()
        n -= int((gaps <= gap_s).sum())
        return pd.DataFrame({key: np.array([g[key].iloc[0]]),
                             "n_sessions": np.array([n], dtype=np.int64)})

    return partials.groupby(key).map_groups(merge, batch_format="pandas")
