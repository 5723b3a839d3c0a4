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


def _go_format_value(v) -> str:
    """Go fmt %v for the scalar types that appear in our columns."""
    if v is None:
        return "<nil>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        s = repr(v)
        return s[:-2] if s.endswith(".0") else s
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    import datetime
    if isinstance(v, datetime.datetime):
        frac = ""
        if v.microsecond:
            frac = ("%.6f" % (v.microsecond / 1e6))[1:].rstrip("0")
        return v.strftime("%Y-%m-%d %H:%M:%S") + frac + " +0000 UTC"
    return str(v)


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
        cols = []
        for f in self.fields:
            c = field_to_column(f)
            if c not in batch.column_names:
                if self.ignore_missing:
                    continue
                return set_error(batch, pa.array([True] * len(batch)),
                                 f"failed to compute fingerprint: missing field [{f}]")
            cols.append((f, batch.column(c).to_pylist()))
        n = len(batch)
        out = []
        hash_fn = _HASHES.get(self.method) or (lambda b: _xxh(b))
        for i in range(n):
            parts = []
            for k, vals in cols:
                parts.append(f"|{k}|{_go_format_value(vals[i])}")
            payload = ("".join(parts) + "|").encode("utf-8")
            if self.method == "xxhash":
                out.append(_xxh(payload))
            else:
                out.append(_encode(self.encoding, hash_fn(payload)))
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

    def process(self, batch):
        cols = [batch.column(field_to_column(f)).to_pylist()
                for f in self.key_fields if field_to_column(f) in batch.column_names]
        n = len(batch)
        ids = []
        for i in range(n):
            key = "\x1f".join("" if c[i] is None else str(c[i]) for c in cols)
            ids.append(hashlib.sha256(key.encode()).hexdigest()[:32])
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
