"""Windowed aggregates over event time (ray_guide "Streaming-shaped
workloads"): tumbling, sliding (hopping), and session windows — expressed as
vectorized window-assignment in map_batches + the partial-aggregate pattern.

- tumbling: window_start = floor(epoch/size)*size — one window per event.
- sliding: size S, hop H (S = k*H): each event belongs to exactly S/H
  windows, window starts = floor(epoch/H)*H - j*H for j in 0..S/H-1 —
  the event EXPLODES into S/H rows inside map_batches (no shuffle growth
  beyond the factor), then groupby window/keys.
- session: per-key gap-based windows — see functions/sessionize.py (the
  salted variant is the skew-safe path).

All arithmetic is integer-seconds on epoch so the DuckDB oracle
(to_timestamp(floor(epoch(ts)/H)*H - j*H)) matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _epoch_seconds(ts_col) -> np.ndarray:
    # normalize to MICROSECOND unit first: a ns-unit column (pandas'
    # default) cast straight to int64 yields nanosecond ticks and the
    # //1e6 would produce milliseconds (1000x-off windows / overflow on
    # the way back to timestamp('us'))
    t = ts_col.type
    if pa.types.is_timestamp(t) and t.unit != "us":
        ts_col = pc.cast(ts_col, pa.timestamp("us", tz=t.tz))
    return (pc.cast(ts_col, pa.int64()).to_numpy(zero_copy_only=False)
            // 1_000_000)


def tumbling_window_assign(t: pa.Table, ts_col: str, size_s: int,
                           target: str = "window_start") -> pa.Table:
    ep = _epoch_seconds(t[ts_col])
    ws = (ep // size_s) * size_s
    return t.append_column(target,
                           pa.array(ws * 1_000_000).cast(pa.timestamp("us")))


def sliding_window_explode(t: pa.Table, ts_col: str, size_s: int, hop_s: int,
                           target: str = "window_start") -> pa.Table:
    """Each row replicated once per covering window (size_s/hop_s copies)."""
    assert size_s % hop_s == 0, "size must be a multiple of hop"
    k = size_s // hop_s
    ep = _epoch_seconds(t[ts_col])
    base = (ep // hop_s) * hop_s
    parts = []
    for j in range(k):
        ws = base - j * hop_s
        parts.append(t.append_column(
            target, pa.array(ws * 1_000_000).cast(pa.timestamp("us"))))
    return pa.concat_tables(parts)
