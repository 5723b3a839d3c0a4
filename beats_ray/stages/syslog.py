"""syslog processor — RFC3164 / RFC5424 / auto parse of a string field.

Reference: libbeat/processors/syslog/syslog.go:79 delegating to
libbeat/reader/syslog/syslog.go:83-92 (FormatAuto detection by first byte
after priority, RFC3164 BSD format, RFC5424 structured format).  Output
columns (flattened ECS-ish paths): log_syslog_priority, _facility_code,
_severity_code, _hostname, _appname, _procid, _msgid, _version, message
(the free text), plus timestamp -> ``log_syslog_ts`` (tz-naive; RFC3164
year pinned to 2024 per the determinism rule, cf. timestamp zero-year).
Parse failure -> error_message unless ignore_failure.
"""

from __future__ import annotations

import datetime as _dt
import re

import pyarrow as pa
import pyarrow.compute as pc

from ..event import field_to_column, set_column, set_error
from .base import Stage, register

_RFC5424 = re.compile(
    r"^<(?P<pri>\d{1,3})>(?P<ver>\d) (?P<ts>\S+) (?P<host>\S+) (?P<app>\S+) "
    r"(?P<proc>\S+) (?P<msgid>\S+) (?P<sd>-|\[.*?\])(?: (?P<msg>.*))?$",
    re.S)
_RFC3164 = re.compile(
    r"^<(?P<pri>\d{1,3})>(?P<ts>[A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) "
    r"(?P<host>\S+) (?P<tag>[^\s:\[]+)(?:\[(?P<pid>\d+)\])?:? ?(?P<msg>.*)$",
    re.S)

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])}
PINNED_YEAR = 2024


def parse_syslog(line: str, fmt: str = "auto") -> dict | None:
    if not line:
        return None
    m5 = _RFC5424.match(line) if fmt in ("auto", "rfc5424") else None
    if m5:
        pri = int(m5.group("pri"))
        out = {
            "priority": pri, "facility_code": pri // 8, "severity_code": pri % 8,
            "version": int(m5.group("ver")),
            "hostname": _nil(m5.group("host")), "appname": _nil(m5.group("app")),
            "procid": _nil(m5.group("proc")), "msgid": _nil(m5.group("msgid")),
            "structured_data": None if m5.group("sd") == "-" else m5.group("sd"),
            "message": m5.group("msg") or "",
            "ts": _iso(m5.group("ts")),
        }
        return out
    m3 = _RFC3164.match(line) if fmt in ("auto", "rfc3164") else None
    if m3:
        pri = int(m3.group("pri"))
        ts = m3.group("ts")
        mon = _MONTHS.get(ts[:3])
        day = int(ts[4:6].strip())
        return {
            "priority": pri, "facility_code": pri // 8, "severity_code": pri % 8,
            "version": None, "hostname": _nil(m3.group("host")),
            "appname": m3.group("tag"), "procid": m3.group("pid"),
            "msgid": None, "structured_data": None,
            "message": m3.group("msg") or "",
            "ts": f"{PINNED_YEAR:04d}-{mon:02d}-{day:02d}T{ts[7:]}" if mon else None,
        }
    return None


def _nil(v):
    return None if v == "-" else v


def _iso(ts):
    """RFC5424 (RFC3339) timestamp -> tz-naive UTC ISO string.

    The reference (libbeat/reader/syslog) parses the full RFC3339 form
    including numeric offsets; normalize '+02:00' / '-07:00' to UTC rather
    than stripping (which would shift the instant and leave '-' offsets
    unparseable downstream).
    """
    if ts == "-" or ts is None:
        return None
    try:
        dt = _dt.datetime.fromisoformat(ts.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return dt.isoformat()[:26]


@register("syslog")
class SyslogStage(Stage):
    """config: field (default "message"), format: auto|rfc3164|rfc5424,
    target_prefix (default "log_syslog"), ignore_missing, ignore_failure."""

    name = "syslog"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config.get("field", "message")
        self.fmt = self.config.get("format", "auto")
        prefix = self.config.get("target_prefix", "log_syslog")
        self.prefix = prefix + "_" if prefix else ""
        self.ignore_failure = bool(self.config.get("ignore_failure", False))
        self.ignore_missing = bool(self.config.get("ignore_missing", False))

    def input_columns(self):
        return [field_to_column(self.field)]

    def process(self, batch):
        cname = field_to_column(self.field)
        if cname not in batch.column_names:
            # ignore_missing semantics: a schema without the source column
            # parses nothing instead of KeyError-ing the batch
            return batch
        col = batch.column(cname)
        rows = col.to_pylist()
        parsed = [parse_syslog(v, self.fmt) if v else None for v in rows]
        ok = [p is not None for p in parsed]
        keys = ["priority", "facility_code", "severity_code", "version",
                "hostname", "appname", "procid", "msgid", "structured_data",
                "message"]
        types = {"priority": pa.int32(), "facility_code": pa.int32(),
                 "severity_code": pa.int32(), "version": pa.int32()}
        for k in keys:
            vals = [p.get(k) if p else None for p in parsed]
            batch = set_column(batch, self.prefix + k,
                               pa.array(vals, types.get(k, pa.string())))
        # Beats parity (reader/syslog/message.go:242-244): the parsed free
        # text REPLACES the event's `message` on success (and only when
        # non-empty); failed/empty rows keep their existing value.  The
        # prefixed log_syslog_message copy above is this engine's column
        # convention and stays.
        msg_vals = [p.get("message") if p else None for p in parsed]
        if any(msg_vals):
            cur = batch.column("message").to_pylist() \
                if "message" in batch.column_names else [None] * len(rows)
            merged = [m if m else c for m, c in zip(msg_vals, cur)]
            batch = set_column(batch, "message",
                               pa.array(merged, pa.string()))
        # Arrow strptime lacks %f, so fractional seconds need Python parsing
        # (the rows are already materialized for the regex walk anyway).
        ts_py = []
        for p in parsed:
            v = p.get("ts") if p else None
            try:
                ts_py.append(_dt.datetime.fromisoformat(v) if v else None)
            except ValueError:
                ts_py.append(None)
        batch = set_column(batch, self.prefix + "ts",
                           pa.array(ts_py, pa.timestamp("us")))
        fail = [not o for o in ok]
        if self.ignore_missing:
            # syslog.go config IgnoreMissing: a row without the source value
            # is a skip, not a parse failure (null == absent in this model)
            fail = [f and v is not None for f, v in zip(fail, rows)]
        if not self.ignore_failure and any(fail):
            batch = set_error(batch, pa.array(fail, pa.bool_()),
                              "failed to parse syslog message")
        return batch
