"""Follow mode — the continuous harvester/registrar loop as a batch analogue.

Reference semantics (SURVEY.md §2.1/§4): filebeat's filestream input runs a
scanner loop every ``scan_frequency`` (filestream/fswatch.go:48-116) that
discovers new and grown files; a harvester reads newline-terminated lines
from the checkpointed byte offset (filestream/input.go:420-492), and the
registrar persists ``path -> offset`` only after the output acks the events
(registrar/registrar.go:131-212) — at-least-once, resume-exactly-where-left.

The Ray Data analogue here keeps the loop shape but replaces the per-event
machinery with per-scan batch runs:

- ``Registrar`` — JSON checkpoint ``path -> {offset, lines}`` under the
  output's ``_manifest/`` dir, committed ONLY after the scan's sink writes
  completed (ack-gated, like the registrar flush on publisher ack).
- ``plan_log_deltas`` — the fswatcher scan: stat every matched file, emit
  (path, start_offset, end_offset, first_line_no) for files that grew.  Only
  COMPLETE lines are consumed: the end offset is the position after the last
  ``\\n`` at/below the current size (the reference's line reader similarly
  holds a partial line until its newline arrives).  A file whose size shrank
  below its checkpoint was truncated -> re-read from 0 (harvester.go
  truncation check).
- ``read_log_deltas`` — a Dataset over the delta byte ranges: one Ray task
  per grown file reads ``[start, end)`` and splits lines, so a scan over a
  large fleet of files fans out across the cluster; per-line metadata
  (``log_file_path``, ``log_offset`` = cumulative line number) matches
  ``read_log_records``.
- ``follow_once`` — one scan: plan deltas, run the pipeline over them,
  routed-write under a per-scan partition tag, then commit the registrar.

Byte offsets frame lines on ``\\n`` BYTES, which is exact for UTF-8 and all
single-byte charsets (the only multi-byte Beats encodings are the utf-16
family, where the CLI's follow path rejects delta-tailing and the caller
must re-read whole files).  Multiline joins flush at scan boundaries — a
multiline event straddling two scans is emitted as two events (documented
batch-analogue divergence; the reference holds reader state across polls).
"""

from __future__ import annotations

import json
import os
import time

_TAIL_CHUNK = 1 << 16


class Registrar:
    """Ack-gated ``path -> {offset, lines}`` checkpoint (registrar.go)."""

    def __init__(self, out_dir: str):
        d = os.path.join(out_dir, "_manifest")
        os.makedirs(d, exist_ok=True)
        self.path = os.path.join(d, "registrar.json")
        self.state: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.state = json.load(f)

    def offset(self, path: str) -> int:
        return int(self.state.get(path, {}).get("offset", 0))

    def lines(self, path: str) -> int:
        return int(self.state.get(path, {}).get("lines", 0))

    def advance(self, path: str, offset: int, lines: int):
        self.state[path] = {"offset": offset, "lines": lines,
                            "updated_unix": time.time()}

    def commit(self):
        # tmp+rename: a crash mid-commit leaves the previous checkpoint
        # intact (same pattern as statestore/store.go checkpoints)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f)
        os.replace(tmp, self.path)


def _end_of_last_line(path: str, start: int, size: int) -> int:
    """Position AFTER the last ``\\n`` in ``[start, size)`` (0 if none).
    Scans backwards in chunks so only the unterminated tail is read on the
    driver — O(partial line), not O(file)."""
    with open(path, "rb") as f:
        hi = size
        while hi > start:
            lo = max(start, hi - _TAIL_CHUNK)
            f.seek(lo)
            chunk = f.read(hi - lo)
            nl = chunk.rfind(b"\n")
            if nl >= 0:
                return lo + nl + 1
            hi = lo
    return 0


def plan_log_deltas(paths: list[str], reg: Registrar):
    """The fswatcher scan: (path, start, end, first_line_no) per grown file.

    Files at/below their checkpoint are skipped; a file smaller than its
    checkpoint was truncated and restarts from offset 0 (its line counter
    also resets — the reference treats truncation as a new stream)."""
    deltas = []
    for p in sorted(set(paths)):
        try:
            size = os.stat(p).st_size
        except OSError:
            continue  # vanished between glob and stat
        start, line0 = reg.offset(p), reg.lines(p)
        if size < start:  # truncated: re-read as a fresh stream
            start, line0 = 0, 0
        if size <= start:
            continue
        end = _end_of_last_line(p, start, size)
        if end <= start:
            continue  # grew, but no complete new line yet
        deltas.append((p, start, end, line0))
    return deltas


def read_log_deltas(deltas, encoding: str = ""):
    """Dataset of (message, log_file_path, log_offset) over delta byte
    ranges — one Ray task per grown file (``read_log_records`` schema, so
    the same parser/multiline chain applies)."""
    import pyarrow as pa
    import ray.data as rd

    from ..sources.readers import resolve_encoding
    codec = resolve_encoding(encoding)
    if codec.startswith("utf-16"):
        raise ValueError(
            "follow mode tails byte ranges framed on \\n bytes; utf-16 "
            "charsets need whole-file framing (re-read without --follow)")

    items = [{"path": p, "start": s, "end": e, "line0": l}
             for p, s, e, l in deltas]

    def read_range(row: dict) -> list[dict]:
        with open(row["path"], "rb") as f:
            f.seek(row["start"])
            blob = f.read(row["end"] - row["start"])
        lines = blob.decode(codec, "replace").split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        lines = [ln[:-1] if ln.endswith("\r") else ln for ln in lines]
        return [{"message": ln, "log_file_path": row["path"],
                 "log_offset": row["line0"] + i}
                for i, ln in enumerate(lines)]

    ds = rd.from_items(items).flat_map(read_range)
    # pin the schema even for an empty scan
    return ds.map_batches(
        lambda t: t.cast(pa.schema([("message", pa.string()),
                                    ("log_file_path", pa.string()),
                                    ("log_offset", pa.int64())])),
        batch_format="pyarrow")


def follow_once(pipe, paths: list[str], out_dir: str, scan_no: int,
                encoding: str = "", pre_transforms=None,
                output_format: str = "parquet") -> dict:
    """One scan of the follow loop over raw log inputs.

    Plans deltas against the registrar, runs the pipeline over only the new
    complete lines, writes routed output under partition tag ``s<scan>``,
    and commits the registrar AFTER the writes finish (ack-gated).  Returns
    the scan report dict (one JSON line in the CLI)."""
    from ..sinks.ndjson import write_ndjson_routed
    from ..sinks.parquet import sink_counts, write_routed
    write = write_routed if output_format == "parquet" else write_ndjson_routed

    reg = Registrar(out_dir)
    deltas = plan_log_deltas(paths, reg)
    report = {"scan": scan_no, "files_grown": len(deltas),
              "lines": 0, "sink_counts": {}}
    if not deltas:
        return report
    ds = read_log_deltas(deltas, encoding=encoding)
    for tr in (pre_transforms or []):
        ds = tr(ds)
    man = write(pipe.apply(ds), out_dir, partition_tag=f"s{scan_no:05d}")
    report["sink_counts"] = sink_counts(man)  # consuming drives the writes
    # per-file consumed-line counts: distributed (a bootstrap scan over a
    # large corpus must not re-read every delta on the driver); `end` sits
    # after the range's last \n, so line count == newline count
    import ray.data as rd

    def count_range(row: dict) -> dict:
        # tolerate rotation/deletion between the sink write and this count
        # (routine logrotate): the bytes were already consumed and routed,
        # so a vanished/truncated file must not fail the scan after its
        # output is on disk — that would re-plan and DUPLICATE the whole
        # scan next round.  It counts as n=0; the registrar still advances
        # to `end`, and a recreated path restarts via the truncation check.
        try:
            with open(row["path"], "rb") as f:
                f.seek(row["start"])
                return {"path": row["path"],
                        "n": f.read(row["end"] - row["start"]).count(b"\n")}
        except OSError:
            return {"path": row["path"], "n": 0}

    items = [{"path": p, "start": s, "end": e} for p, s, e, _ in deltas]
    counts = {r["path"]: r["n"]
              for r in rd.from_items(items).map(count_range).take_all()}
    for p, start, end, line0 in deltas:
        n = counts.get(p, 0)
        reg.advance(p, end, line0 + n)
        report["lines"] += n
    reg.commit()
    return report
