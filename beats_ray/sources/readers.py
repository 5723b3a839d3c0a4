"""Sources — the harvester/reader-chain analogue (SURVEY.md §2.1).

The filestream input's line-assembly chain (filebeat/input/filestream/
input.go:420-492: file read -> encode/line split -> strip newline -> file
metadata -> parsers -> limit) maps onto Ray Data reads + a compiled parser
chain of batch stages:

- ``read_log_lines``  — ray.data.read_text with per-line file metadata
  (``log_file_path``, ``log_offset`` analogue = line number within block);
  encoding + newline handling come free from read_text.
- ``read_ndjson`` / ``read_csv_table`` / ``read_parquet_table`` — typed reads.
- parser configs (``parsers:`` list, libbeat/reader/parser/parser.go:87-148)
  compile to processor-chain entries: ``ndjson`` -> decode_json_fields,
  ``include_message`` -> regex allowlist filter (reader/filter/filter.go:43),
  ``syslog`` -> syslog stage, ``container`` -> docker-JSON decode,
  ``multiline`` -> the grouped join operator (flow.multiline_join).
- ``partition_by_key`` — the kafka-output hash partitioner analogue
  (outputs/kafka/partition.go:219-246: FNV-32a of configured fields mod N)
  as a repartition key column for co-locating downstream stages.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from ..event import field_to_column, set_column, set_error
from ..stages.base import Stage, register


def read_parquet_table(path, columns=None, **kw):
    import ray.data as rd
    return rd.read_parquet(path, columns=columns, **kw)


# Beats encoding names -> Python codecs (readfile/encoding/encoding.go:34-107).
# 'plain'/'nop' pass bytes through untransformed -> latin-1 (byte-preserving);
# the -bom utf-16 variants require a BOM, the plain ones consume one if
# present (Python 'utf-16' auto-detects).
_ENCODINGS = {
    "": "utf-8", "nop": "latin-1", "plain": "latin-1",
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "gbk": "gbk", "koi8r": "koi8_r", "koi8u": "koi8_u",
    "macintosh": "mac_roman", "macintosh-cyrillic": "mac_cyrillic",
    "utf-16-bom": "utf-16", "utf-16be-bom": "utf-16",
    "utf-16le-bom": "utf-16", "utf-16be": "utf-16-be", "utf-16le": "utf-16-le",
    **{f"iso8859-{i}": f"iso8859-{i}"
       for i in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 13, 14, 15, 16)},
    **{f"windows{i}": f"cp{i}"
       for i in (874, 1250, 1251, 1252, 1253, 1254, 1255, 1256, 1257, 1258)},
    **{f"cp{i}": f"cp{i}" for i in (437, 850, 852, 855, 858, 860, 862, 863,
                                    865, 866)},
}


def resolve_encoding(name: str) -> str:
    key = (name or "").lower()
    if key not in _ENCODINGS:
        raise ValueError(f"unknown encoding {name!r} "
                         "(readfile/encoding/encoding.go:34)")
    return _ENCODINGS[key]


def _decode_blob(blob: bytes, codec: str) -> str:
    # strip the BOM for explicit-endian utf-16 variants (Python keeps it)
    if codec == "utf-16-le" and blob[:2] == b"\xff\xfe":
        blob = blob[2:]
    elif codec == "utf-16-be" and blob[:2] == b"\xfe\xff":
        blob = blob[2:]
    elif codec == "utf-8" and blob[:3] == b"\xef\xbb\xbf":
        blob = blob[3:]
    return blob.decode(codec, "replace")


def read_log_lines(paths, encoding: str = "", **kw):
    """Text lines -> (text, log_file_path) rows (file-metadata annotator,
    input.go:481).  ``encoding`` takes the Beats name set
    (readfile/encoding/encoding.go); non-UTF-8 charsets read each file as
    one blob (charset decode needs byte-level framing, and a log file is
    one harvester stream anyway)."""
    import ray.data as rd
    codec = resolve_encoding(encoding)
    if codec not in ("utf-8",):
        return read_log_records(paths, encoding=encoding, **kw) \
            .drop_columns(["log_offset"])
    ds = rd.read_text(paths, include_paths=True, **kw)

    def shape(t: pa.Table) -> pa.Table:
        # Beats-canonical line column name (input.go fills "message").
        # Strip a leading UTF-8 BOM: rd.read_text leaves it on each file's
        # first line, which would break '^'-anchored patterns and exact
        # equals on that line (the reference's encoding factory consumes
        # it; _decode_blob already does on the non-UTF-8 path).
        msg = pc.replace_substring_regex(t["text"], "^\ufeff", "")
        return pa.table({"message": msg,
                         "log_file_path": t["path"]})
    return ds.map_batches(shape, batch_format="pyarrow")


def read_log_records(paths, encoding: str = "", **kw):
    """Text lines with per-file line ordering -> (text, log_file_path,
    log_offset) rows.  One input file per row group via read_binary_files
    (the harvester reads a file as one ordered stream, input.go:481) — use
    when a downstream operator is ordering-sensitive (multiline) or the
    charset is not UTF-8 (``encoding``: Beats name set, BOM handled)."""
    import ray.data as rd
    codec = resolve_encoding(encoding)
    ds = rd.read_binary_files(paths, include_paths=True, **kw)

    def split(t: pa.Table) -> pa.Table:
        texts, files, offs = [], [], []
        for path, blob in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            lines = _decode_blob(blob, codec).split("\n")
            if lines and lines[-1] == "":
                lines.pop()
            lines = [ln[:-1] if ln.endswith("\r") else ln for ln in lines]
            texts.extend(lines)
            files.extend([path] * len(lines))
            offs.extend(range(len(lines)))
        return pa.table({"message": pa.array(texts, pa.string()),
                         "log_file_path": pa.array(files, pa.string()),
                         "log_offset": pa.array(offs, pa.int64())})

    return ds.map_batches(split, batch_format="pyarrow")


def read_ndjson(paths, **kw):
    import ray.data as rd
    return rd.read_json(paths, **kw)


def read_csv_table(paths, **kw):
    import ray.data as rd
    return rd.read_csv(paths, **kw)


@register("include_message")
class IncludeMessage(Stage):
    """Regex allowlist filter at read time (reader/filter/filter.go:43-90):
    keep only rows whose message matches ANY of the patterns."""

    name = "include_message"
    may_drop = True

    def __init__(self, config=None):
        super().__init__(config)
        self.patterns = list(self.config.get("patterns", []))
        self.field = self.config.get("field", "message")

    def process(self, batch):
        col = batch.column(field_to_column(self.field))
        keep = None
        for p in self.patterns:
            m = pc.fill_null(pc.match_substring_regex(col, p), False)
            keep = m if keep is None else pc.or_(keep, m)
        if keep is None:
            return batch
        return batch.filter(keep)


@register("line_filter")
class LineFilter(Stage):
    """include_lines / exclude_lines input filter (input/log/harvester.go:
    496-511 shouldExportLine): when include patterns are set, keep only
    messages matching ANY of them; then drop messages matching any exclude
    pattern.  Runs on the multiline-JOINED message like the reference
    (harvester.go:426 filters the reader chain's output)."""

    name = "line_filter"
    may_drop = True

    def __init__(self, config=None):
        super().__init__(config)
        self.include = list(self.config.get("include_lines", []))
        self.exclude = list(self.config.get("exclude_lines", []))
        self.field = self.config.get("field", "message")

    @staticmethod
    def _match_any(col, patterns):
        m = None
        for p in patterns:
            try:
                one = pc.fill_null(pc.match_substring_regex(col, p), False)
            except pa.lib.ArrowInvalid:
                # RE2-unsupported construct (lookaround): python-re fallback
                import re
                rx = re.compile(p)
                one = pa.array([v is not None and rx.search(v) is not None
                                for v in col.to_pylist()])
            m = one if m is None else pc.or_(m, one)
        return m

    def process(self, batch):
        col = batch.column(field_to_column(self.field))
        keep = None
        if self.include:
            keep = self._match_any(col, self.include)
        if self.exclude:
            drop = self._match_any(col, self.exclude)
            inv = pc.invert(drop)
            keep = inv if keep is None else pc.and_(keep, inv)
        if keep is None:
            return batch
        return batch.filter(keep)


@register("container")
class ContainerParser(Stage):
    """Docker/CRI container-log parser (reader/readjson/docker_json.go):
    docker format = one JSON object per line {"log": ..., "stream": ...,
    "time": ...}; CRI format = "<ts> <stream> <P|F> <message>".  Partial
    (P) CRI lines are NOT joined here (that needs the multiline operator);
    they carry ``container_partial=true``."""

    name = "container"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config.get("field", "message")
        self.fmt = self.config.get("format", "auto")

    def input_columns(self):
        return [field_to_column(self.field)]

    def process(self, batch):
        rows = batch.column(field_to_column(self.field)).to_pylist()
        msgs, streams, times, partials, failed = [], [], [], [], []
        for v in rows:
            if v is None:
                msgs.append(None); streams.append(None); times.append(None)
                partials.append(None); failed.append(False)
                continue
            if v.startswith("{") and self.fmt in ("auto", "docker"):
                try:
                    obj = json.loads(v)
                    # .get default only covers a MISSING key; an explicit
                    # null log field must not crash the batch
                    lg = obj.get("log")
                    msgs.append(lg.rstrip("\n") if isinstance(lg, str)
                                else None)
                    streams.append(obj.get("stream"))
                    times.append(obj.get("time"))
                    partials.append(False)
                    failed.append(False)
                    continue
                except ValueError:
                    pass
            parts = v.split(" ", 3) if self.fmt in ("auto", "cri") else []
            if len(parts) == 4 and parts[2] in ("P", "F"):
                times.append(parts[0])
                streams.append(parts[1])
                partials.append(parts[2] == "P")
                msgs.append(parts[3])
                failed.append(False)
            else:
                msgs.append(None); streams.append(None); times.append(None)
                partials.append(None); failed.append(True)
        batch = set_column(batch, "container_log", pa.array(msgs, pa.string()))
        batch = set_column(batch, "container_stream", pa.array(streams, pa.string()))
        batch = set_column(batch, "container_time", pa.array(times, pa.string()))
        batch = set_column(batch, "container_partial", pa.array(partials, pa.bool_()))
        if any(failed):
            batch = set_error(batch, pa.array(failed), "parsing container log failed")
        return batch


def fnv32a(data: bytes) -> int:
    """FNV-32a (the kafka partitioner's hash, partition.go:65-67)."""
    h = 2166136261
    for b in data:
        h ^= b
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def fnv32a_batch(payloads_arr: pa.Array) -> "np.ndarray":
    """Vectorized FNV-32a over a string Array: one numpy pass per BYTE
    POSITION (max payload length iterations) instead of a Python loop per
    row x byte.  Bytes come zero-copy from the Arrow offsets/data buffers."""
    import numpy as np
    arr = payloads_arr.combine_chunks() if isinstance(
        payloads_arr, pa.ChunkedArray) else payloads_arr
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    offs = np.frombuffer(off_buf, dtype=np.int32)[arr.offset:arr.offset + n + 1]
    data = np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None \
        else np.empty(0, dtype=np.uint8)
    lens = np.diff(offs).astype(np.int64)
    maxlen = int(lens.max()) if n else 0
    if n > 1 and n * maxlen > 256 * 1024 * 1024:
        # the padded (n, maxlen) scatter is O(n*maxlen) bytes — fine for
        # key-sized payloads, a memory cliff if someone partitions by a
        # long text column (one 64 KB outlier x 32 Ki rows = 2 GB).  Hash
        # in row slices sized to the cap; same result, bounded memory.
        step = max(1, (256 * 1024 * 1024) // max(1, maxlen))
        out = np.empty(n, dtype=np.uint32)
        for i in range(0, n, step):
            out[i:i + step] = fnv32a_batch(arr.slice(i, min(step, n - i)))
        return out
    # scatter the variable-length byte runs into a padded (n, maxlen) matrix
    total = int(lens.sum())
    rows = np.repeat(np.arange(n), lens)
    cols_ix = np.arange(total) - np.repeat(
        (offs[:-1].astype(np.int64) - int(offs[0])), lens)
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    buf[rows, cols_ix] = data[offs[0]:offs[0] + total] if total else data[:0]
    h = np.full(n, 2166136261, dtype=np.uint64)
    prime = np.uint64(16777619)
    mask32 = np.uint64(0xFFFFFFFF)
    for j in range(maxlen):
        cand = ((h ^ buf[:, j]) * prime) & mask32
        h = np.where(lens > j, cand, h)
    return h.astype(np.uint32)


def partition_by_key(ds, fields: list[str], num_partitions: int,
                     target: str = "partition"):
    """Kafka hash-partitioner analogue: partition = FNV-32a(field values)
    % N, appended as a column; follow with groupby(target) or a partitioned
    write to co-locate.  (outputs/kafka/partition.go:219-246 semantics:
    hash of the concatenated configured field values.)"""
    import numpy as np
    cols = [field_to_column(f) for f in fields]

    def stage(t: pa.Table) -> pa.Table:
        n = len(t)
        scols = []
        for c in cols:
            if c not in t.column_names:
                scols.append(pa.array([""] * n, pa.string()))
                continue
            col = t.column(c)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type) \
                    or pa.types.is_integer(col.type):
                scols.append(pc.fill_null(pc.cast(col, pa.string()), ""))
            else:
                # non-string/int types keep Python str() rendering
                scols.append(pa.array(
                    ["" if v is None else str(v) for v in col.to_pylist()],
                    pa.string()))
        payload = scols[0] if len(scols) == 1 else \
            pc.binary_join_element_wise(*scols, "")
        h = fnv32a_batch(payload)
        parts = (h % np.uint32(num_partitions)).astype(np.int32)
        return t.append_column(target, pa.array(parts, pa.int32()))

    return ds.map_batches(stage, batch_format="pyarrow")


def parsers_to_processors(parsers: list[dict]) -> list[dict]:
    """Translate a Beats ``parsers:`` list (parser.go:87-148) into processor
    chain entries for the pipeline compiler."""
    out = []
    for p in parsers:
        if "ndjson" in p:
            c = dict(p["ndjson"] or {})
            out.append({"decode_json_fields": {
                "fields": [c.get("message_key", "message")],
                "target": c.get("target", ""),
                "overwrite_keys": c.get("overwrite_keys", False),
                "add_error_key": c.get("add_error_key", False),
                "document_id": c.get("document_id"),
            }})
        elif "include_message" in p:
            out.append({"include_message": p["include_message"] or {}})
        elif "syslog" in p:
            out.append({"syslog": p["syslog"] or {}})
        elif "container" in p:
            out.append({"container": p["container"] or {}})
        elif "auditd" in p:
            out.append({"auditd": p["auditd"] or {}})
        elif "multiline" in p:
            # grouped operator, not a row-local stage — handled by the
            # pipeline driver via flow.multiline_join
            out.append({"__multiline__": p["multiline"] or {}})
        else:
            raise ValueError(f"unknown parser {list(p)[0]!r}")
    return out
