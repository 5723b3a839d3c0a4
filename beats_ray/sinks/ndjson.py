"""NDJSON sink — the file-output + JSON codec analogue.

Beats' file output writes one JSON object per event to a path rendered from
an event format string (fileout/file.go:37,117 + pathformatstring.go:33-38;
codec libbeat/outputs/codec/json/json.go:67).  Mapping: the path format
string is the routing selector (-> ``sink`` column); this sink writes one
``.ndjson`` part file per (sink, block), same layout/manifest contract as
the Parquet sink.  ``@timestamp`` renders RFC3339-with-millis UTC
(SURVEY.md §1.2); meta/error columns are dropped like the Parquet sink.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from ..event import TIMESTAMP_COL
from .parquet import REJECTS_SINK, _clean_columns


def _json_default(v):
    import datetime
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.") + f"{v.microsecond // 1000:03d}Z"
    if isinstance(v, (bytes, bytearray)):
        return v.decode("utf-8", "replace")
    return str(v)


class NDJSONWriter:
    """map_batches sink stage: per-sink .ndjson files, manifest rows out."""

    def __init__(self, out_dir: str, sink_col: str = "sink",
                 dead_letter: bool = True, partition_tag: str = ""):
        self.out_dir = out_dir
        self.sink_col = sink_col
        self.dead_letter = dead_letter
        self.partition_tag = partition_tag

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"sink": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64()),
                             "path": pa.array([], pa.string())})
        sinks = batch.column(self.sink_col)
        if self.dead_letter and "error_message" in batch.column_names:
            errored = pc.is_valid(batch.column("error_message"))
            sinks = pc.if_else(errored, pa.scalar(REJECTS_SINK, pa.string()), sinks)
            batch = batch.set_column(batch.column_names.index(self.sink_col),
                                     self.sink_col, sinks)
        man = {"sink": [], "rows": [], "path": []}
        for sink in pc.unique(sinks).to_pylist():
            name = sink if sink is not None else "_unrouted"
            part = batch.filter(pc.equal(sinks, sink) if sink is not None
                                else pc.is_null(sinks))
            out = part if name == REJECTS_SINK else _clean_columns(part)
            if self.sink_col in out.column_names:
                out = out.drop_columns([self.sink_col])
            # content-address by the FULL block bytes, not min/count stats:
            # distinct blocks sharing the stats collapsed to one filename
            # and os.replace silently dropped data (same class as
            # RoutedWriter._file_id, parquet.py)
            h = hashlib.sha1((self.partition_tag + name).encode())
            buf = pa.BufferOutputStream()
            with pa.ipc.new_stream(buf, part.schema) as w:
                w.write_table(part)
            h.update(memoryview(buf.getvalue()))
            h.update(str(len(part)).encode())
            d = os.path.join(self.out_dir, f"sink={name}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"part-{h.hexdigest()[:16]}.ndjson")
            # writer-unique tmp (see parquet.py): retried tasks must not
            # interleave into one tmp file
            tmp = f"{path}.{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                for row in out.to_pylist():
                    f.write(json.dumps(row, default=_json_default,
                                       separators=(",", ":")) + "\n")
            os.replace(tmp, path)
            man["sink"].append(name)
            man["rows"].append(len(part))
            man["path"].append(path)
        return pa.table({"sink": pa.array(man["sink"], pa.string()),
                         "rows": pa.array(man["rows"], pa.int64()),
                         "path": pa.array(man["path"], pa.string())})


def write_ndjson_routed(ds, out_dir: str, **kw):
    return ds.map_batches(NDJSONWriter(out_dir, **kw), batch_format="pyarrow")


def render_format(ds, fmt: str, target: str = "rendered"):
    """The `format` output codec (libbeat/outputs/codec/format/format.go:52):
    render each event through an event format string -> one string column.
    Consume with iter_batches/write or `console_sink`."""
    from ..fmtstr import FormatString
    f = FormatString(fmt)

    def stage(t: pa.Table) -> pa.Table:
        return t.append_column(target, f.render(t))

    return ds.map_batches(stage, batch_format="pyarrow")


def console_sink(ds, fmt: str | None = None, limit: int = 20) -> list[str]:
    """Console output analogue (console/console.go:46): JSON codec by
    default, format codec when ``fmt`` given; returns the printed lines."""
    import json as _json
    out = []
    if fmt:
        rendered = render_format(ds, fmt)
        for b in rendered.limit(limit).iter_batches(batch_format="pyarrow"):
            out.extend(pa.table(b)["rendered"].to_pylist())
    else:
        for row in ds.limit(limit).take_all():
            out.append(_json.dumps(row, default=_json_default,
                                   separators=(",", ":")))
    for line in out:
        print(line)
    return out


def discard_sink(ds) -> int:
    """Discard output (discard/discard.go:31): consume the stream fully
    (drives the pipeline for benchmarking), return the row count."""
    total = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        total += len(pa.table(b))
    return total
