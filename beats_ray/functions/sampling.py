"""Sampling + training-export operators.

- ``sample`` stage: DETERMINISTIC row sampling — ``modulo`` (key % denom <
  numer; SQL-oracle-able) or ``hash`` (blake2b-64 of the key, stable across
  runs/partitionings — the reproducible web-scale default).  Never uses RNG
  state, so a resumed run samples identically.
- ``stratified_sample``: first-n-per-group by deterministic order (the
  class-balanced training subset); groupby(strata).map_groups head.
- ``export_shards``: shuffle-and-shard for training — deterministic
  hash-based shard assignment + one parquet dir per shard with a manifest;
  shard sizes are asymptotically equal, assignment is independent of input
  partitioning (resume-safe).
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..event import field_to_column
from ..stages.base import Stage, register


def _stable_hash64(data: bytes) -> int:
    """blake2b-based 64-bit hash — full avalanche (FNV-1a clusters badly on
    sequential keys, measured: 'id-0'..'id-999' all landed within 0.0001 of
    each other in [0,1))."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


@register("sample")
class Sample(Stage):
    """config: field (key column), method: "hash"|"modulo",
    rate (0..1] for hash, or numer/denom for modulo."""

    name = "sample"
    may_drop = True

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config["field"]
        self.method = self.config.get("method", "hash")
        self.rate = float(self.config.get("rate", 0.1))
        self.numer = int(self.config.get("numer", 1))
        self.denom = int(self.config.get("denom", 10))

    def process(self, batch):
        col = batch.column(field_to_column(self.field))
        if self.method == "modulo":
            import numpy as np
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            k = pc.cast(col, pa.int64()).to_pandas().fillna(0).to_numpy()
            # np.fmod keeps the DIVIDEND's sign like SQL's % (numpy's %
            # follows the divisor), so negative keys sample exactly as the
            # oracle computes: -5 % 10 = -5 < numer keeps the row.  Null
            # keys drop (SQL: NULL % d < n is NULL -> not kept).
            keep = pa.array((np.fmod(k, self.denom) < self.numer) & valid)
        else:
            thresh = int(self.rate * (1 << 32))
            keep = pa.array(
                [v is not None and
                 (_stable_hash64(str(v).encode()) & 0xFFFFFFFF) < thresh
                 for v in col.to_pylist()], pa.bool_())
        return batch.filter(keep)


def stratified_sample(ds, strata: str, order: str, n_per_group: int):
    """First n rows per stratum by deterministic order (class-balanced
    subset); shuffle key = strata."""

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order, kind="mergesort").head(n_per_group)

    return ds.groupby(strata).map_groups(head, batch_format="pandas")


def export_shards(ds, out_dir: str, n_shards: int, key: str,
                  compression: str = "snappy") -> dict:
    """Training export: rows land in shard = blake2b64(key) % n_shards; each
    shard is its own parquet directory (resume-safe: deterministic
    assignment + content-addressed part files).  Returns shard row counts."""
    import pyarrow.parquet as pq

    key_col = field_to_column(key)

    class ShardWriter:
        def __call__(self, t: pa.Table) -> pa.Table:
            shards = pa.array(
                [(_stable_hash64(str(v).encode()) % n_shards) if v is not None else 0
                 for v in t[key_col].to_pylist()], pa.int32())
            t2 = t.append_column("__shard", shards)
            out_s, out_n = [], []
            for s in pc.unique(shards).to_pylist():
                part = t2.filter(pc.equal(t2["__shard"], s)).drop_columns(["__shard"])
                d = os.path.join(out_dir, f"shard-{s:05d}")
                os.makedirs(d, exist_ok=True)
                # content-address by the FULL block bytes: (len, min, max)
                # collide for distinct blocks sharing those stats (hot
                # keys, uniform blocks), and os.replace would silently
                # drop all but the last — same class as RoutedWriter's
                # _file_id.  IPC serialization truncates sliced buffers,
                # so the hash covers exactly this part's rows.
                h = hashlib.sha1()
                buf = pa.BufferOutputStream()
                with pa.ipc.new_stream(buf, part.schema) as w:
                    w.write_table(part)
                h.update(memoryview(buf.getvalue()))
                path = os.path.join(d, f"part-{h.hexdigest()[:16]}.parquet")
                tmp = path + ".tmp"
                pq.write_table(part, tmp, compression=compression)
                os.replace(tmp, path)
                out_s.append(s)
                out_n.append(len(part))
            return pa.table({"shard": pa.array(out_s, pa.int32()),
                             "rows": pa.array(out_n, pa.int64())})

    man = ds.map_batches(ShardWriter(), batch_format="pyarrow").take_all()
    counts: dict[int, int] = {}
    for r in man:
        counts[r["shard"]] = counts.get(r["shard"], 0) + r["rows"]
    return counts
