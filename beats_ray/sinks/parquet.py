"""Routed Parquet sink — the fan-out write stage.

Beats routes *within* its single active output via selectors and writes
batches per destination (file output: per-event path format string,
fileout/file.go:37 + pathformatstring.go:33-38; ES: ``index:``/``indices:``
bulk routing, client.go:249-292; non-retryable items go to a dead-letter
index, client.go:69-70,174-203).  Ray-first mapping (SURVEY.md §2.2):

- a ``sink`` column is computed by the routing stage;
- the write is a ``map_batches`` stage that splits each Arrow block by sink
  value and writes one Parquet file per (sink, block) under
  ``out_dir/sink=<name>/`` — hive-style per-sink partition layout;
- rows whose ``error_message`` is set go to the ``_rejects`` partition
  (dead-letter analogue) when ``dead_letter=True``;
- ``meta_*`` columns are routing hints and are dropped before write
  (SURVEY.md §1.3), as are engine-internal error/flags columns;
- the stage RETURNS manifest rows ``(sink, rows, path)`` instead of data —
  consuming the small result materializes lineage, not the data.  Per-sink
  counts are then one tiny groupby over the manifest (partial-aggregate
  pattern: combine inside map_batches, shuffle only partials).

File names are content-deterministic (hash of key range + count) so a rerun
overwrites the same files — idempotent partition writes => effectively
exactly-once per partition (SURVEY.md §4 "Exactly/at-least once").
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..event import ERROR_COL, FLAGS_COL, META_PREFIX

REJECTS_SINK = "_rejects"


def _clean_columns(batch: pa.Table) -> pa.Table:
    drop = [c for c in batch.column_names
            if c.startswith(META_PREFIX) or c in (ERROR_COL, FLAGS_COL)]
    return batch.drop_columns(drop) if drop else batch


class RoutedWriter:
    """map_batches stage: write per-sink files, emit manifest rows."""

    def __init__(self, out_dir: str, sink_col: str = "sink",
                 dead_letter: bool = True, key_cols: tuple = ("conv_id", "turn_idx"),
                 partition_tag: str = ""):
        self.out_dir = out_dir
        self.sink_col = sink_col
        self.dead_letter = dead_letter
        self.key_cols = key_cols   # kept for API compat; _file_id now
        # hashes the full block, so no key subset is consulted
        self.partition_tag = partition_tag

    def _file_id(self, part: pa.Table, sink_name: str) -> str:
        """Content-addressed file id: deterministic for identical block
        content (idempotent re-runs overwrite with identical bytes) and
        collision-free across distinct blocks.  The previous min/max-of-key
        scheme collided whenever key columns were absent and two blocks of a
        partition had equal row counts — the second os.replace silently
        dropped the first block's data."""
        h = hashlib.sha1()
        h.update(self.partition_tag.encode())
        h.update(b"\x00" + sink_name.encode())
        # hash the FULL block content, not a key-column subset: two blocks
        # carrying identical key sequences but different payloads (exactly
        # the duplicated/retried events the dedup stages exist for) must
        # not collapse to one file name — the second os.replace would
        # silently drop the first block's rows while the manifest still
        # counted both.  sha1 over the IPC bytes is cheap relative to the
        # parquet encode that follows.  IPC stream serialization truncates
        # sliced buffers, so the hash covers exactly this block's rows.
        sink_buf = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink_buf, part.schema) as w:
            w.write_table(part)
        h.update(memoryview(sink_buf.getvalue()))
        h.update(str(len(part)).encode())
        return h.hexdigest()[:16]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"sink": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64()),
                             "path": pa.array([], pa.string())})
        sinks = batch.column(self.sink_col)
        if self.dead_letter and ERROR_COL in batch.column_names:
            errored = pc.is_valid(batch.column(ERROR_COL))
            sinks = pc.if_else(errored, pa.scalar(REJECTS_SINK, pa.string()), sinks)
            batch = batch.set_column(batch.column_names.index(self.sink_col),
                                     self.sink_col, sinks)
        man_sink, man_rows, man_path = [], [], []
        for sink in pc.unique(sinks).to_pylist():
            if sink is None:
                sink_mask = pc.is_null(sinks)
                sink_name = "_unrouted"
            else:
                sink_mask = pc.equal(sinks, sink)
                sink_name = sink
            part = batch.filter(sink_mask)
            keep_err = sink_name == REJECTS_SINK
            out = part if keep_err else _clean_columns(part)
            d = os.path.join(self.out_dir, f"sink={sink_name}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"part-{self._file_id(part, sink_name)}.parquet")
            # writer-unique tmp: a retried/speculative task writing the SAME
            # content-addressed path must not interleave into one tmp file —
            # each writes its own, and os.replace publishes whole bytes
            tmp = f"{path}.{os.getpid()}.tmp"
            pq.write_table(out.drop_columns([self.sink_col])
                           if self.sink_col in out.column_names else out, tmp)
            os.replace(tmp, path)  # atomic publish
            man_sink.append(sink_name)
            man_rows.append(len(part))
            man_path.append(path)
        return pa.table({"sink": pa.array(man_sink, pa.string()),
                         "rows": pa.array(man_rows, pa.int64()),
                         "path": pa.array(man_path, pa.string())})


def write_routed(ds, out_dir: str, sink_col: str = "sink",
                 dead_letter: bool = True, partition_tag: str = ""):
    """Attach the routed write; returns the (small) manifest Dataset.

    The caller consumes the manifest (e.g. ``sink_counts``) which drives the
    whole streaming pipeline — data itself never materializes on the driver.
    """
    writer = RoutedWriter(out_dir, sink_col, dead_letter, partition_tag=partition_tag)
    return ds.map_batches(writer, batch_format="pyarrow")


def sink_counts(manifest_ds) -> dict[str, int]:
    """Per-sink routed-row counts from manifest rows (pipeline counters
    analogue — libbeat/publisher/pipeline/monitoring.go:73-113)."""
    from ray.data.aggregate import Sum
    agg = manifest_ds.groupby("sink").aggregate(Sum("rows", alias_name="n"))
    return {r["sink"]: r["n"] for r in agg.take_all()}
