"""decode_cef — full ArcSight Common Event Format processor with ECS mapping.

Reference: x-pack/filebeat/processors/decode_cef/decode_cef.go (Run,
toCEFObject, writeCEFHeaderToECS, cefSeverityToNumber),
cef/cef.rl + cef/cef_actions.rl (ragel grammar: header escapes, extension
key charset, value slicing semantics), cef/types.go (per-type conversion),
keys.ecs.go (ECS extension mapping + translate functions).  The key tables
themselves live in cef_keys.py, generated from the public ArcSight CEF spec
tables (scripts/gen_cef_keys.py).

Faithful behaviors (checked against the reference's own
testdata/samples.log.golden.json):

* Header: 7 pipe-separated fields after ``CEF:``; ``\\|`` and ``\\\\``
  escapes; version must be digits.  A missing/incomplete header is a hard
  failure (error unless ignore_failure).
* Extensions: ``key=value`` where a key is ``[A-Za-z0-9_][A-Za-z0-9_.,\\[\\]-]*``
  preceded by start-of-extensions or a single space.  The value runs from
  the char right after ``=`` (leading spaces KEPT) to one char before the
  next key (exactly ONE separator space trimmed — cef_actions.rl
  extension_key: ``data[valueStart:mark-1]``); the final value is
  right-trimmed (extension_eof uses valueEnd = last non-space char).  An
  empty final value is never pushed; empty mid-line values are.
* Escapes in values: ``\\=`` ``\\\\`` ``\\n`` ``\\r`` (cef.rl
  extension_value_escapes); unknown escapes pass through leniently.
* Known keys (case-insensitive lookup, keys.go extensionMappingLowerCase)
  are renamed to their full names and type-converted; empty-valued known
  keys are dropped (WithRemoveEmptyValues — always set by the processor);
  conversion failures drop the key and append
  ``error in field '<orig key>': <reason>`` to error.message.  Unknown keys
  keep their raw string value (even when empty mid-line).
* ECS mapping (``ecs: true``, the default): header -> observer.*,
  event.code, message (name), event.severity (Low/Medium/High/Very-High ->
  0/4/7/9, else integer); extensions -> keys.ecs.go targets, applied in
  parse order (Go iterates a map — order is unspecified there), with the
  translate functions operating on the RAW string value (mac -> upper+dash,
  deviceAddress -> [ip], deviceDirection 0/1 -> inbound/outbound,
  requestContext only if http-prefixed, transportProtocol lowered).
  deviceReceiptTime targets @timestamp (the ``ts`` column).

Divergence (documented): recoverable per-field conversion errors land in
the engine's ``error_message`` column, which poisons the row for later
stages; Beats annotates error.message but continues the chain.  Parsing is
a per-row Python loop — format-inherent (like syslog/auditd), amortized by
map_batches.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone as _timezone

import pyarrow as pa

from ..event import ERROR_COL, field_to_column, set_column
from .base import Stage, register
from .cef_keys import CEF_ECS, CEF_ECS_TRANSLATE, CEF_EXT

# Case-insensitive key lookup (keys.go:693-698).  Sorted for determinism.
_EXT_LOWER = {k.lower(): v for k, v in sorted(CEF_EXT.items())}

_EXT_KEY = re.compile(r"(?:\A|(?<= ))([A-Za-z0-9_][A-Za-z0-9_.,\[\]-]*)=")
_ESCAPE = re.compile(r"\\(.)")
_EXT_ESCAPES = {"\\": "\\", "=": "=", "n": "\n", "r": "\r"}

_EPOCH = datetime(1970, 1, 1)

# Go time layouts from types.go:timeLayouts — "MMM [d]d [yyyy] HH:mm:ss
# [.SSS] [zone]" where zone is a name, ±hhmm, ±hh:mm, or GMT±hh:mm.
_TS_RE = re.compile(
    r"^(?P<mon>Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) +"
    r"(?P<day>\d{1,2}) (?:(?P<year>\d{4}) )?"
    r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<ms>\d{3}))?"
    r"(?: (?P<zone>[A-Za-z/_]+|(?:GMT)?[+-]\d{2}:?\d{2}))?$")
_MONTHS = {m: i + 1 for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])}

_HEX = re.compile(r"^[0-9a-fA-F]+$")


def _unescape_hdr(v: str) -> str:
    return _ESCAPE.sub(lambda m: m.group(1) if m.group(1) in "\\|"
                       else m.group(0), v)


def _unescape_ext(v: str) -> str:
    return _ESCAPE.sub(lambda m: _EXT_ESCAPES.get(m.group(1), m.group(0)), v)


def _split_header(body: str):
    """Split the 7 header fields (after ``CEF:``), honouring ``\\|`` and
    ``\\\\`` escapes.  Returns (fields, extension-string) or (None, None)."""
    fields: list[str] = []
    buf: list[str] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == "\\" and i + 1 < n and body[i + 1] in "\\|":
            buf.append(body[i + 1])
            i += 2
            continue
        if c == "|":
            fields.append("".join(buf))
            buf = []
            i += 1
            if len(fields) == 7:
                return fields, body[i:]
            continue
        buf.append(c)
        i += 1
    return None, None


def parse_extensions(ext: str) -> dict[str, str]:
    """Raw key -> unescaped raw value, last key wins (Go map semantics)."""
    out: dict[str, str] = {}
    ms = list(_EXT_KEY.finditer(ext))
    for i, m in enumerate(ms):
        if i + 1 < len(ms):
            val = ext[m.end():ms[i + 1].start() - 1]
        else:
            val = ext[m.end():].rstrip(" \t\n\r\v\f")
            if not val:
                continue  # empty final value is never pushed (extension_eof)
        out[m.group(1)] = _unescape_ext(val)
    return out


# ---------------------------------------------------------------- types.go

def _to_int(v: str, bits: int):
    if v != v.strip():
        raise ValueError(f'strconv.ParseInt: parsing "{v}": invalid syntax')
    try:
        i = int(v, 0)
    except ValueError:
        raise ValueError(
            f'strconv.ParseInt: parsing "{v}": invalid syntax') from None
    if not -(1 << (bits - 1)) <= i < (1 << (bits - 1)):
        raise ValueError(
            f'strconv.ParseInt: parsing "{v}": value out of range')
    return i


def _to_float(v: str):
    try:
        return float(v)
    except ValueError:
        raise ValueError(
            f'strconv.ParseFloat: parsing "{v}": invalid syntax') from None


_BOOLS = {"1": True, "t": True, "T": True, "TRUE": True, "true": True,
          "True": True, "0": False, "f": False, "F": False, "FALSE": False,
          "false": False, "False": False}


def _to_bool(v: str):
    try:
        return _BOOLS[v]
    except KeyError:
        raise ValueError(
            f'strconv.ParseBool: parsing "{v}": invalid syntax') from None


def _to_ip(v: str):
    import ipaddress
    try:
        ipaddress.ip_address(v)
    except ValueError:
        raise ValueError("value is not a valid IP address") from None
    return v


def _to_mac(v: str):
    """net.ParseMAC subset (colon/dash pairs, dotted quads, bare hex for
    EUI-48/64) -> lowercase colon-separated (types.go:toMACAddress)."""
    s = v
    if len(s) in (12, 16) and _HEX.match(s):
        s = ":".join(s[i:i + 2] for i in range(0, len(s), 2))
    if "." in s:
        parts = s.split(".")
        if not all(len(p) == 4 and _HEX.match(p) for p in parts):
            raise ValueError(f"address {v}: invalid MAC address")
        hexstr = "".join(parts)
    else:
        sep = ":" if ":" in s else "-"
        parts = s.split(sep)
        if not all(len(p) == 2 and _HEX.match(p) for p in parts):
            raise ValueError(f"address {v}: invalid MAC address")
        hexstr = "".join(parts)
    if len(hexstr) not in (12, 16, 40):
        raise ValueError(f"address {v}: invalid MAC address")
    return ":".join(hexstr[i:i + 2] for i in range(0, len(hexstr), 2)).lower()


def _to_timestamp(v: str, tzoff: int | None):
    """types.go:toTimestamp — epoch-millis, else the MMM-dd layout family.
    Returns a naive UTC datetime.  tzoff: default zone offset (seconds) for
    zoneless values (the processor's ``timezone`` option)."""
    try:
        ms = int(v, 0)
    except ValueError:
        pass
    else:
        return _EPOCH + timedelta(milliseconds=ms)
    m = _TS_RE.match(v)
    if not m:
        raise ValueError("value is not a valid timestamp")
    ms = int(m["ms"]) if m["ms"] else 0
    year = int(m["year"]) if m["year"] else datetime.now(_timezone.utc).year
    try:
        ts = datetime(year, _MONTHS[m["mon"]], int(m["day"]),
                      int(m["h"]), int(m["mi"]), int(m["s"]), ms * 1000)
    except ValueError:
        raise ValueError("value is not a valid timestamp") from None
    zone = m["zone"]
    off = tzoff or 0
    if zone:
        z = zone[3:] if zone.startswith("GMT") else zone
        if z and z[0] in "+-":
            z = z.replace(":", "")
            off = int(z[1:3]) * 3600 + int(z[3:5]) * 60
            off = -off if z[0] == "-" else off
        else:
            # Unknown zone abbreviation: Go fabricates a zero-offset zone.
            off = 0
    return ts - timedelta(seconds=off)


def _convert(raw: str, typ: str, tzoff):
    if typ == "string":
        return raw
    if typ == "integer":
        return _to_int(raw, 32)
    if typ == "long":
        return _to_int(raw, 64)
    if typ in ("float", "double"):
        return _to_float(raw)
    if typ == "boolean":
        return _to_bool(raw)
    if typ == "ip":
        return _to_ip(raw)
    if typ == "macaddress":
        return _to_mac(raw)
    if typ == "timestamp":
        return _to_timestamp(raw, tzoff)
    return raw


# ---------------------------------------------------- ECS translate fns

def _ecs_mac(raw: str, conv):
    return raw.upper().replace(":", "-")


def _ecs_device_address(raw: str, conv):
    return [raw]


def _ecs_direction(raw: str, conv):
    if raw == "0":
        return "inbound"
    if raw == "1":
        return "outbound"
    raise ValueError("deviceDirection must be 0 or 1")


def _ecs_request_context(raw: str, conv):
    return raw if raw.startswith("http") else None


def _ecs_transport(raw: str, conv):
    return raw.lower()


_TRANSLATES = {
    "agentMacAddress": _ecs_mac,
    "destinationMacAddress": _ecs_mac,
    "deviceMacAddress": _ecs_mac,
    "sourceMacAddress": _ecs_mac,
    "deviceAddress": _ecs_device_address,
    "deviceDirection": _ecs_direction,
    "requestContext": _ecs_request_context,
    "transportProtocol": _ecs_transport,
}


def _severity_to_number(severity: str):
    """decode_cef.go:cefSeverityToNumber."""
    named = {"low": 0, "medium": 4, "high": 7, "very-high": 9}
    s = named.get(severity.lower())
    if s is not None:
        return s
    try:
        return int(severity)
    except ValueError:
        return None


def parse_cef_event(line: str, tzoff: int | None = None, ecs: bool = True,
                    target: str = "cef"):
    """Parse one CEF line -> (field-path -> value, error strings) or None
    on hard failure (no CEF header / malformed header)."""
    idx = line.find("CEF:")
    if idx < 0:
        return None
    fields, ext = _split_header(line[idx + 4:])
    if fields is None or not fields[0].isdigit():
        return None
    version = int(fields[0])
    vendor, product, dev_version, class_id, name = \
        (_unescape_hdr(f) for f in fields[1:6])
    severity = fields[6]

    errors: list[str] = []
    raw_ext = parse_extensions(ext)
    # key rename + type conversion + empty-value removal (cef.go:Unpack)
    converted: dict[str, tuple[str, object]] = {}
    for key, raw in raw_ext.items():
        mapping = _EXT_LOWER.get(key.lower())
        if mapping is None:
            converted[key] = (raw, raw)
            continue
        full, typ = mapping
        if raw == "":
            continue  # WithRemoveEmptyValues
        try:
            converted[full] = (raw, _convert(raw, typ, tzoff))
        except ValueError as e:
            errors.append(f"error in field '{key}': {e}")

    out: dict[str, object] = {f"{target}.version": str(version)}
    if vendor:
        out[f"{target}.device.vendor"] = vendor
    if product:
        out[f"{target}.device.product"] = product
    if dev_version:
        out[f"{target}.device.version"] = dev_version
    if class_id:
        out[f"{target}.device.event_class_id"] = class_id
    if name:
        out[f"{target}.name"] = name
    if severity:
        out[f"{target}.severity"] = severity
    for full, (raw, conv) in converted.items():
        out[f"{target}.extensions.{full}"] = conv

    if ecs:
        # header -> ECS (decode_cef.go:writeCEFHeaderToECS)
        if vendor:
            out["observer.vendor"] = vendor
        if product:
            out["observer.product"] = product
        if dev_version:
            out["observer.version"] = dev_version
        if class_id:
            out["event.code"] = class_id
        if name:
            out["message"] = name
        if severity:
            sev = _severity_to_number(severity)
            if sev is not None:
                out["event.severity"] = sev
        # extensions -> ECS, in parse order (Go map order is unspecified)
        for full, (raw, conv) in converted.items():
            tr = _TRANSLATES.get(full)
            if tr is not None:
                try:
                    val = tr(raw, conv)
                except ValueError as e:
                    errors.append(f"{full}: {e}")
                    continue
                if val is not None:
                    out[CEF_ECS_TRANSLATE[full]] = val
            else:
                ecs_target = CEF_ECS.get(full)
                if ecs_target is not None:
                    out[ecs_target] = conv
    return out, errors


def parse_cef(line: str) -> dict | None:
    """Back-compat shim: flat dict of header fields + raw ``ext_<key>``s."""
    if line is None:
        return None
    parsed = parse_cef_event(line, ecs=False, target="cef")
    if parsed is None:
        return None
    out, _ = parsed
    flat = {"version": int(out["cef.version"])}
    for k, v in out.items():
        if k.startswith("cef.device."):
            flat["device_" + k.rsplit(".", 1)[1]] = v
        elif k in ("cef.name", "cef.severity"):
            flat[k.split(".", 1)[1]] = v
        elif k.startswith("cef.extensions."):
            flat["ext_" + k[len("cef.extensions."):]] = v
    return flat


@register("decode_cef")
class DecodeCEF(Stage):
    """config: field (default "message"), target_field (default "cef"),
    ecs (default true), ignore_failure, ignore_missing, timezone (IANA name
    or ±hh:mm offset — default zone for zoneless timestamps)."""

    name = "decode_cef"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config.get("field", "message")
        self.target = self.config.get("target_field", "cef")
        self.ecs = bool(self.config.get("ecs", True))
        self.ignore_failure = bool(self.config.get("ignore_failure", False))
        self.ignore_missing = bool(self.config.get("ignore_missing", False))
        self.tzoff = self._tz_offset(self.config.get("timezone"))

    @staticmethod
    def _tz_offset(tz):
        if not tz:
            return None
        s = str(tz)
        if s and s[0] in "+-":
            h, _, m = s[1:].partition(":")
            off = int(h) * 3600 + int(m or 0) * 60
            return -off if s[0] == "-" else off
        from zoneinfo import ZoneInfo
        # fixed offset at epoch; per-value DST is out of scope for batch use
        return int(ZoneInfo(s).utcoffset(
            datetime.now(_timezone.utc)).total_seconds())

    def input_columns(self):
        return [field_to_column(self.field), ERROR_COL]

    def process(self, batch):
        col = field_to_column(self.field)
        if col not in batch.column_names:
            if not self.ignore_missing:
                batch = set_column(
                    batch, "error.message",
                    pa.array([f"decode_cef field [{self.field}] not found"]
                             * len(batch)))
            return batch
        rows = batch.column(col).to_pylist()
        parsed: list[dict | None] = []
        row_errors: list[str | None] = []
        for v in rows:
            if v is None:
                parsed.append(None)
                row_errors.append(None)
                continue
            p = parse_cef_event(v, self.tzoff, self.ecs, self.target)
            if p is None:
                parsed.append(None)
                row_errors.append(
                    None if self.ignore_failure else
                    f"decode_cef field [{self.field}] does not contain a "
                    "CEF header")
                continue
            out, errs = p
            parsed.append(out)
            row_errors.append("; ".join(errs) if errs else None)

        # union of output paths in first-seen order
        paths: list[str] = []
        seen: set[str] = set()
        for p in parsed:
            if p:
                for k in p:
                    if k not in seen:
                        seen.add(k)
                        paths.append(k)
        for path in paths:
            vals = [p.get(path) if p else None for p in parsed]
            batch = set_column(batch, path, self._array(vals))
        if any(row_errors):
            n = len(batch)
            cur = (batch.column(ERROR_COL) if ERROR_COL in batch.column_names
                   else pa.nulls(n, pa.string()))
            merged = [c if c is not None else e
                      for c, e in zip(cur.to_pylist(), row_errors)]
            batch = set_column(batch, ERROR_COL, pa.array(merged, pa.string()))
        return batch

    @staticmethod
    def _array(vals):
        v0 = next((v for v in vals if v is not None), None)
        if isinstance(v0, bool):
            t = pa.bool_()
        elif isinstance(v0, int):
            t = pa.int64()
        elif isinstance(v0, float):
            t = pa.float64()
        elif isinstance(v0, datetime):
            t = pa.timestamp("us")
        elif isinstance(v0, list):
            t = pa.list_(pa.string())
        else:
            t = pa.string()
        try:
            return pa.array(vals, t)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            return pa.array([None if v is None else str(v) for v in vals],
                            pa.string())
