"""decode_cef — ArcSight Common Event Format parser.

Reference: x-pack/filebeat/processors/decode_cef/ (noted "parser =
map_batches" in SURVEY.md §2.4).  CEF line shape (public CEF spec):

    CEF:version|vendor|product|device_version|sig_id|name|severity|ext

Header fields are pipe-separated with ``\\|`` escapes; the extension part is
``key=value`` pairs where values may contain spaces (a new key starts at the
next ``token=``), with ``\\=``/``\\n``/``\\\\`` escapes.  Output columns:
``cef_version, cef_device_vendor, cef_device_product,
cef_device_version, cef_signature_id, cef_name, cef_severity`` +
``cef_ext_<key>`` per extension key.  Parse failure -> error_message
(unless ignore_failure).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..event import field_to_column, set_column, set_error
from .base import Stage, register

_HEADER_SPLIT = re.compile(r"(?<!\\)\|")
_EXT_KEY = re.compile(r"(?:^|\s)([A-Za-z0-9_.-]+)=")


def _unescape(v: str) -> str:
    return v.replace("\\|", "|").replace("\\=", "=") \
            .replace("\\n", "\n").replace("\\\\", "\\")


def parse_cef(line: str) -> dict | None:
    if line is None:
        return None
    start = line.find("CEF:")
    if start < 0:
        return None
    body = line[start + 4:]
    parts = _HEADER_SPLIT.split(body, maxsplit=7)
    if len(parts) < 8:
        return None
    header = [_unescape(p) for p in parts[:7]]
    try:
        version = int(header[0])
    except ValueError:
        return None
    out = {
        "version": version,
        "device_vendor": header[1],
        "device_product": header[2],
        "device_version": header[3],
        "signature_id": header[4],
        "name": header[5],
        "severity": header[6],
    }
    ext = parts[7]
    # extension: key=value where value runs until the next " key=" token
    matches = list(_EXT_KEY.finditer(ext))
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(ext)
        out[f"ext_{m.group(1)}"] = _unescape(ext[m.end():end].strip())
    return out


@register("decode_cef")
class DecodeCEF(Stage):
    """config: field (default "message"), target_prefix (default "cef"),
    ignore_failure."""

    name = "decode_cef"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config.get("field", "message")
        prefix = self.config.get("target_prefix", "cef")
        self.prefix = prefix + "_" if prefix else ""
        self.ignore_failure = bool(self.config.get("ignore_failure", False))

    def input_columns(self):
        return [field_to_column(self.field)]

    def process(self, batch):
        rows = batch.column(field_to_column(self.field)).to_pylist()
        parsed = [parse_cef(v) for v in rows]
        failed = [p is None and v is not None for p, v in zip(parsed, rows)]
        keys: list[str] = []
        seen = set()
        for p in parsed:
            if p:
                for k in p:
                    if k not in seen:
                        seen.add(k)
                        keys.append(k)
        for k in keys:
            vals = [p.get(k) if p else None for p in parsed]
            typ = pa.int32() if k == "version" else pa.string()
            batch = set_column(batch, self.prefix + k, pa.array(vals, typ))
        if any(failed) and not self.ignore_failure:
            batch = set_error(batch, pa.array(failed), "decode_cef: malformed event")
        return batch
