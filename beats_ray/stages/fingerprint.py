"""fingerprint + add_id + timeseries + community_id + registered_domain +
add_network_direction — hash/derive stages.

fingerprint replicates libbeat/processors/fingerprint byte-for-byte
(SURVEY.md §7.3 "hard parts"): input string is ``|k|v`` per field then a
trailing ``|`` (fingerprint.go:93-116); fields sorted + dedup'd
(fingerprint.go:58-60); methods md5/sha1/sha256(default)/sha384/sha512/
xxhash (hash.go:35-45); encodings hex(default)/base32/base64
(config.go defaultConfig).  Scalar formatting follows Go ``%v``: strings
as-is, ints base-10, bools ``true/false``, floats shortest-repr, timestamps
``2006-01-02 15:04:05.999999999 +0000 UTC`` style in UTC.

add_id (add_id/add_id.go:32) is a UUID per event in the reference; for
deterministic reruns (idempotent partition overwrite => effectively
exactly-once, SURVEY.md §4) we derive it as sha256 of configurable key
fields — the documented surrogate in SURVEY.md §2.4.

timeseries (timeseries/timeseries.go:42-87) hashes the dimension fields
into ``timeseries_instance``.
"""

from __future__ import annotations

import base64
import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from ..event import field_to_column, set_column, set_error
from .base import Stage, register

try:
    import xxhash  # not in the sandbox; gated

    def _xxh(b):
        return format(xxhash.xxh64(b).intdigest(), "x")
except ImportError:
    _xxh = None


def _go_float_g(v: float) -> str:
    """Go strconv.FormatFloat(v, 'g', -1, 64): shortest round-trip digits,
    switching to exponent form when exp < -4 or exp >= 6 (so 123456789.0
    renders '1.23456789e+08' and 1000000.0 renders '1e+06', matching Go %v;
    Python repr keeps fixed notation up to 1e16 and would diverge)."""
    import math
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    neg = math.copysign(1.0, v) < 0
    a = abs(v)
    if a == 0:
        return "-0" if neg else "0"
    s = repr(a)  # shortest round-trip decimal, same digit set as Go
    if "e" in s:
        mant, _, exps = s.partition("e")
        e10 = int(exps)
    else:
        mant, e10 = s, 0
    ip, _, fp = mant.partition(".")
    full = ip + fp
    dp0 = len(ip) + e10            # value = 0.full * 10^dp0
    stripped = full.lstrip("0")
    dp = dp0 - (len(full) - len(stripped))
    digits = stripped.rstrip("0") or "0"
    exp = dp - 1
    if exp < -4 or exp >= 6:
        out = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
        out += "e" + ("+" if exp >= 0 else "-") + "%02d" % abs(exp)
    elif dp <= 0:
        out = "0." + "0" * (-dp) + digits
    elif dp >= len(digits):
        out = digits + "0" * (dp - len(digits))
    else:
        out = digits[:dp] + "." + digits[dp:]
    return ("-" + out) if neg else out


def _go_format_value(v) -> str:
    """Go fmt %v for the scalar types that appear in our columns."""
    if v is None:
        return "<nil>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _go_float_g(v)
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    import datetime
    if isinstance(v, datetime.datetime):
        frac = ""
        if v.microsecond:
            frac = ("%.6f" % (v.microsecond / 1e6))[1:].rstrip("0")
        return v.strftime("%Y-%m-%d %H:%M:%S") + frac + " +0000 UTC"
    return str(v)


def _go_format_array(col):
    """Vectorized Go-%v string Array for simple types; None -> fallback."""
    t = col.type
    if pa.types.is_large_string(t):
        return pc.cast(col, pa.string())
    if pa.types.is_string(t):
        return col
    if pa.types.is_integer(t):
        return pc.cast(col, pa.string())
    if pa.types.is_boolean(t):
        return pc.if_else(col, "true", "false")
    return None


def _build_payloads(batch, fields, ignore_missing) -> list[bytes] | None:
    """The exact fingerprint input strings: |k|v per field + trailing |
    (fingerprint.go:93-116).  Fully vectorized join when every field has a
    simple type; per-value Go formatting otherwise (floats, timestamps)."""
    n = len(batch)
    parts = []
    fast = True
    for f in fields:
        c = field_to_column(f)
        if c not in batch.column_names:
            if ignore_missing:
                continue
            return None
        col = batch.column(c)
        arr = _go_format_array(col)
        if arr is None:
            fast = False
            arr = pa.array([_go_format_value(v) for v in col.to_pylist()],
                           pa.string())
        parts.append((f, pc.fill_null(arr, "<nil>")))
    if not parts:
        return [b"|"] * n
    join_args = []
    for k, arr in parts:
        join_args.append(pa.scalar(f"|{k}|", pa.string()))
        join_args.append(arr)
    join_args.append(pa.scalar("|", pa.string()))
    join_args.append("")  # element-wise separator
    payload = pc.binary_join_element_wise(*join_args)
    return pc.cast(payload, pa.binary()).to_pylist()


_HASHES = {
    "md5": lambda b: hashlib.md5(b).digest(),
    "sha1": lambda b: hashlib.sha1(b).digest(),
    "sha256": lambda b: hashlib.sha256(b).digest(),
    "sha384": lambda b: hashlib.sha384(b).digest(),
    "sha512": lambda b: hashlib.sha512(b).digest(),
}


def _encode(method: str, digest: bytes) -> str:
    if method == "hex":
        return digest.hex()
    if method == "base32":
        return base64.b32encode(digest).decode()
    if method == "base64":
        return base64.b64encode(digest).decode()
    raise ValueError(f"unknown encoding {method}")


@register("fingerprint")
class Fingerprint(Stage):
    name = "fingerprint"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        self.fields = sorted(set(c.get("fields", [])))
        self.method = c.get("method", "sha256")
        self.encoding = c.get("encoding", "hex")
        self.target = c.get("target_field", "fingerprint")
        self.ignore_missing = bool(c.get("ignore_missing", False))
        if self.method == "xxhash" and _xxh is None:
            raise NotImplementedError("xxhash not available in this environment")
        if self.method != "xxhash" and self.method not in _HASHES:
            raise ValueError(f"unknown hash method {self.method}")

    def process(self, batch):
        n = len(batch)
        payloads = _build_payloads(batch, self.fields, self.ignore_missing)
        if payloads is None:
            missing = [f for f in self.fields
                       if field_to_column(f) not in batch.column_names]
            return set_error(batch, pa.array([True] * n),
                             f"failed to compute fingerprint: missing field [{missing[0]}]")
        hash_fn = _HASHES.get(self.method)
        enc = self.encoding
        if self.method == "xxhash":
            out = [_xxh(p) for p in payloads]
        elif enc == "hex":
            out = [hash_fn(p).hex() for p in payloads]
        else:
            out = [_encode(enc, hash_fn(p)) for p in payloads]
        return set_column(batch, field_to_column(self.target), pa.array(out, pa.string()))


@register("add_id")
class AddID(Stage):
    """Deterministic surrogate for add_id/add_id.go:32 (UUID per event):
    sha256-hex(prefix of 16 bytes) over ``key_fields`` (default
    [conv_id, turn_idx]) into ``@metadata._id`` (meta_id column)."""

    name = "add_id"

    def __init__(self, config=None):
        super().__init__(config)
        self.target = self.config.get("target_field", "@metadata._id")
        self.key_fields = list(self.config.get("key_fields", ["conv_id", "turn_idx"]))
        # reuse an existing digest column (e.g. the fingerprint stage's
        # output over the same key fields) instead of re-hashing
        self.from_field = self.config.get("from_field")

    def process(self, batch):
        if self.from_field:
            src = field_to_column(self.from_field)
            if src in batch.column_names:
                ids = pc.utf8_slice_codeunits(batch.column(src), 0, 32)
                return set_column(batch, field_to_column(self.target), ids)
        cols = []
        for f in self.key_fields:
            c = field_to_column(f)
            if c not in batch.column_names:
                continue
            col = batch.column(c)
            if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
                col = pc.cast(col, pa.string())
            cols.append(pc.fill_null(col, ""))
        if not cols:
            # no key column present at all: nothing to derive an id from —
            # skip rather than IndexError the whole pipeline
            return batch
        keys = pc.binary_join_element_wise(*cols, "\x1f") if len(cols) > 1 else cols[0]
        ids = [hashlib.sha256(k.encode()).hexdigest()[:32] for k in keys.to_pylist()]
        return set_column(batch, field_to_column(self.target), pa.array(ids, pa.string()))


@register("timeseries")
class Timeseries(Stage):
    """Hash of dimension fields -> ``timeseries_instance``
    (timeseries/timeseries.go:42-87)."""

    name = "timeseries"

    def __init__(self, config=None):
        super().__init__(config)
        self.fields = sorted(self.config.get("fields", []))

    def process(self, batch):
        cols = [(f, batch.column(field_to_column(f)).to_pylist())
                for f in self.fields if field_to_column(f) in batch.column_names]
        n = len(batch)
        out = []
        for i in range(n):
            payload = "|".join(f"{k}={_go_format_value(v[i])}" for k, v in cols)
            out.append(int.from_bytes(hashlib.sha256(payload.encode()).digest()[:8], "big"))
        return set_column(batch, "timeseries_instance", pa.array(out, pa.uint64()))
