"""Decode processors: JSON / CSV / XML / base64 / gzip / MIME sniff.

References: actions/decode_json_fields.go:70 (config :50-59: fields,
max_depth, expand_keys, overwrite_keys, process_array, add_error_key,
document_id, target), decode_csv_fields/decode_csv_fields.go:59 (RFC4180,
separator, trim_leading_space), decode_xml/decode_xml.go:53,
actions/decode_base64_field.go:51, actions/decompress_gzip_field.go:47,
actions/detect_mime_type.go:37.

JSON decoding over a typed column model: parsed scalar keys flatten to
columns ``<target>_<key>`` (dot-paths joined by ``_``, depth capped by
``max_depth``); nested values beyond max_depth and arrays stay JSON-encoded
strings.  ``document_id`` extracts into ``meta_id`` (the ``@metadata._id``
analogue).
"""

from __future__ import annotations

import base64
import binascii
import csv
import gzip
import io
import json
import re

import pyarrow as pa
import pyarrow.compute as pc

from ..event import field_to_column, set_column, set_error
from .base import Stage, register


@register("decode_json_fields")
class DecodeJSONFields(Stage):
    name = "decode_json_fields"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        self.fields = list(c.get("fields", []))
        self.max_depth = int(c.get("max_depth", 1))
        self.overwrite_keys = bool(c.get("overwrite_keys", False))
        self.add_error_key = bool(c.get("add_error_key", False))
        self.process_array = bool(c.get("process_array", False))
        self.document_id = c.get("document_id")
        self.target = c.get("target")  # None -> merge under the source field name
        # keep_arrays: arrays of scalars become native list values (the
        # reference keeps arrays in the event; the JSON-string default is
        # this engine's columnar simplification) — zeek configs need real
        # lists for the script stage to iterate
        self.keep_arrays = bool(c.get("keep_arrays", False))

    def input_columns(self):
        return [field_to_column(f) for f in self.fields]

    def _flatten(self, obj, prefix, depth, out):
        if isinstance(obj, dict) and depth <= self.max_depth:
            for k, v in obj.items():
                # dots inside a single JSON key flatten like path segments
                # (matches the pyarrow.json fast path's name.replace)
                self._flatten(v, f"{prefix}{k.replace('.', '_')}_",
                              depth + 1, out)
        else:
            key = prefix[:-1]
            if isinstance(obj, list) and self.keep_arrays and \
                    not any(isinstance(x, list) for x in obj):
                # scalar lists AND list<struct> stay native (threatintel
                # malwarebazaar code_sign); pa.array unifies struct keys,
                # the assembly's ArrowInvalid fallback stringifies the rest
                out[key] = obj
            elif isinstance(obj, (dict, list)):
                out[key] = json.dumps(obj, separators=(",", ":"))
            else:
                out[key] = obj

    def _fast_ndjson(self, batch, src, prefix):
        """Vectorized fast path: parse the whole column as NDJSON via
        pyarrow.json (C++).  Applies when per-row special handling isn't
        configured; any parse error, framing mismatch (embedded newlines,
        skipped lines) or nested output (struct/list columns, which
        max_depth=1 must keep JSON-encoded) falls back to the Python path
        by returning None."""
        if self.document_id or self.process_array:
            return None
        import pyarrow.json as pj
        col = batch.column(src)
        null_mask = pc.is_null(col)
        lines = pc.fill_null(pc.cast(col, pa.large_string()), "{}").to_pylist()
        if any("\n" in ln or not ln.strip().startswith("{") for ln in lines):
            return None
        data = "\n".join(lines).encode("utf-8")
        try:
            parsed = pj.read_json(io.BytesIO(data))
        except pa.ArrowInvalid:
            return None
        if parsed.num_rows != len(batch):
            return None
        for f in parsed.schema:
            if not pa.types.is_nested(f.type):
                continue
            # keep_arrays keeps lists of SCALARS native (the Python path's
            # _flatten rule) — pyarrow.json already parsed them as
            # list<primitive>, so the fast path may keep them too.  Struct
            # columns (max_depth=1 must keep nested objects JSON-encoded)
            # and list<list>/list<struct> (key-unification semantics differ
            # from the per-row pa.array build) still fall back.
            if not (self.keep_arrays and pa.types.is_list(f.type)
                    and not pa.types.is_nested(f.type.value_type)):
                return None
        has_nulls = pc.sum(null_mask).as_py() or 0
        for name in parsed.column_names:
            out_name = prefix + name.replace(".", "_")
            if out_name in batch.column_names and not self.overwrite_keys:
                continue
            vals = parsed.column(name)
            if has_nulls:
                vals = pc.if_else(null_mask, pa.nulls(len(batch), vals.type), vals)
            batch = set_column(batch, out_name, vals)
        return batch

    def process(self, batch):
        n = len(batch)
        for f in self.fields:
            src = field_to_column(f)
            if src not in batch.column_names:
                continue
            target = self.target if self.target is not None else f
            prefix = (field_to_column(target) + "_") if target else ""
            fast = self._fast_ndjson(batch, src, prefix)
            if fast is not None:
                batch = fast
                continue
            rows = batch.column(src).to_pylist()
            parsed: list[dict | None] = []
            failed = [False] * n
            for i, v in enumerate(rows):
                if v is None:
                    parsed.append(None)
                    continue
                try:
                    obj = json.loads(v)
                except (ValueError, TypeError):
                    parsed.append(None)
                    failed[i] = True
                    continue
                out: dict = {}
                if isinstance(obj, dict):
                    self._flatten(obj, prefix if prefix else "", 1, out) \
                        if prefix else self._flatten(obj, "", 1, out)
                    parsed.append(out)
                else:
                    # non-object JSON: store under the field itself
                    parsed.append({prefix[:-1] if prefix else src: obj})
            meta_ids = None
            if self.document_id:
                # decode_json_fields.go:135-143: the id is read from the
                # DECODED object (so the key carries this field's flatten
                # prefix here), only string values count, and the key is
                # DELETED from the output
                did = field_to_column(self.document_id)
                pdid = (prefix + did) if prefix else did
                meta_ids = []
                for p in parsed:
                    v = None
                    if p:
                        if isinstance(p.get(pdid), str):
                            v = p.pop(pdid)
                        elif isinstance(p.get(did), str):
                            v = p.pop(did)
                    meta_ids.append(v)
            keys: list[str] = []
            seen = set()
            for p in parsed:
                if p:
                    for k in p:
                        if k not in seen:
                            seen.add(k)
                            keys.append(k)
            for k in keys:
                if k in batch.column_names and not self.overwrite_keys:
                    continue
                vals = [p.get(k) if p else None for p in parsed]
                # mixed-type guard: stringify when types conflict
                types = {type(v) for v in vals if v is not None}
                if len(types) > 1:
                    vals = [json.dumps(v) if not isinstance(v, str) else v
                            for v in vals]
                try:
                    arr = pa.array(vals)
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    arr = pa.array([None if v is None else str(v) for v in vals], pa.string())
                batch = set_column(batch, k, arr)
            if meta_ids is not None:
                # reference moves it OUT of fields into @metadata._id
                batch = set_column(batch, "meta_id",
                                   pa.array(meta_ids, pa.string()))
            if any(failed) and self.add_error_key:
                batch = set_error(batch, pa.array(failed),
                                  "Error decoding JSON: invalid JSON")
        return batch


@register("decode_csv_fields")
class DecodeCSVFields(Stage):
    """RFC4180 CSV per field -> list<string>
    (decode_csv_fields/decode_csv_fields.go:59)."""

    name = "decode_csv_fields"

    def __init__(self, config=None):
        super().__init__(config)
        self.pairs = dict(self.config.get("fields", {}))
        self.sep = self.config.get("separator", ",")
        self.trim = bool(self.config.get("trim_leading_space", False))
        self.overwrite_keys = bool(self.config.get("overwrite_keys", False))
        self.fail_on_error = bool(self.config.get("fail_on_error", True))

    def _parse(self, v):
        if v is None:
            return None
        try:
            row = next(csv.reader(io.StringIO(v), delimiter=self.sep,
                                  skipinitialspace=self.trim))
            return row
        except (csv.Error, StopIteration):
            return None

    def process(self, batch):
        for src, dst in self.pairs.items():
            s = field_to_column(src)
            if s not in batch.column_names:
                continue
            d = field_to_column(dst)
            if d in batch.column_names and d != s and not self.overwrite_keys:
                continue
            col = batch.column(s)
            vals = [self._parse(v) for v in col.to_pylist()]
            arr = pa.array(vals, pa.list_(pa.string()))
            failed = pc.and_(pc.is_null(arr), pc.is_valid(col))
            batch = set_column(batch, d, arr)
            if self.fail_on_error and (pc.sum(failed).as_py() or 0) > 0:
                batch = set_error(batch, failed, "error decoding CSV")
        return batch


@register("decode_xml")
class DecodeXML(Stage):
    """XML -> flattened columns (decode_xml/decode_xml.go:53; to_lower keys).
    Children flatten to ``<target>_<path>``; repeated elements JSON-encode."""

    name = "decode_xml"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config.get("field", "message")
        self.target = self.config.get("target_field", "xml")
        self.to_lower = bool(self.config.get("to_lower", True))
        self.ignore_missing = bool(self.config.get("ignore_missing", False))
        self.ignore_failure = bool(self.config.get("ignore_failure", False))

    def _xml_to_dict(self, elem):
        children = list(elem)
        d = {}
        for k, v in elem.attrib.items():
            d[k.lower() if self.to_lower else k] = v
        if not children:
            text = (elem.text or "").strip()
            return d if d else text
        for ch in children:
            tag = ch.tag.lower() if self.to_lower else ch.tag
            val = self._xml_to_dict(ch)
            if tag in d:
                if not isinstance(d[tag], list):
                    d[tag] = [d[tag]]
                d[tag].append(val)
            else:
                d[tag] = val
        return d

    def process(self, batch):
        import xml.etree.ElementTree as ET
        src = field_to_column(self.field)
        if src not in batch.column_names:
            if self.ignore_missing:
                return batch
            return set_error(batch, pa.array([True] * len(batch)),
                             f"could not fetch value for key: {self.field}")
        rows = batch.column(src).to_pylist()
        failed = [False] * len(rows)
        flats: list[dict | None] = []
        prefix = field_to_column(self.target) + "_" if self.target else ""
        for i, v in enumerate(rows):
            if v is None:
                flats.append(None)
                continue
            try:
                root = ET.fromstring(v)
            except ET.ParseError:
                flats.append(None)
                failed[i] = True
                continue
            d = self._xml_to_dict(root)
            out: dict = {}

            def flat(pfx, o):
                if isinstance(o, dict):
                    for k, vv in o.items():
                        flat(f"{pfx}{k}_", vv)
                elif isinstance(o, list):
                    out[pfx[:-1]] = json.dumps(o)
                else:
                    out[pfx[:-1]] = o
            tag = root.tag.lower() if self.to_lower else root.tag
            flat(prefix + tag + "_", d)
            flats.append(out)
        keys: list[str] = []
        seen = set()
        for p in flats:
            if p:
                for k in p:
                    if k not in seen:
                        seen.add(k)
                        keys.append(k)
        for k in keys:
            vals = [p.get(k) if p else None for p in flats]
            batch = set_column(batch, k, pa.array([None if v is None else str(v) for v in vals],
                                                  pa.string()))
        if any(failed) and not self.ignore_failure:
            batch = set_error(batch, pa.array(failed), "error decoding XML")
        return batch


@register("decode_base64_field")
class DecodeBase64Field(Stage):
    name = "decode_base64_field"

    def __init__(self, config=None):
        super().__init__(config)
        f = self.config.get("field", {})
        self.src = f.get("from") if isinstance(f, dict) else f
        self.dst = f.get("to", self.src) if isinstance(f, dict) else f
        self.ignore_missing = bool(self.config.get("ignore_missing", False))
        self.fail_on_error = bool(self.config.get("fail_on_error", True))

    def process(self, batch):
        s = field_to_column(self.src)
        if s not in batch.column_names:
            if self.ignore_missing:
                return batch
            if self.fail_on_error:
                return set_error(batch, pa.array([True] * len(batch)),
                                 f"could not fetch value for key: {self.src}")
            return batch
        rows = batch.column(s).to_pylist()
        out, failed = [], [False] * len(rows)
        for i, v in enumerate(rows):
            if v is None:
                out.append(None)
                continue
            try:
                pad = v + "=" * (-len(v) % 4)
                out.append(base64.b64decode(pad).decode("utf-8", "replace"))
            except (binascii.Error, ValueError):
                out.append(None)
                failed[i] = True
        batch = set_column(batch, field_to_column(self.dst), pa.array(out, pa.string()))
        if self.fail_on_error and any(failed):
            batch = set_error(batch, pa.array(failed), "error decoding base64")
        return batch


@register("decompress_gzip_field")
class DecompressGzipField(Stage):
    name = "decompress_gzip_field"

    def __init__(self, config=None):
        super().__init__(config)
        f = self.config.get("field", {})
        self.src = f.get("from") if isinstance(f, dict) else f
        self.dst = f.get("to", self.src) if isinstance(f, dict) else f
        self.ignore_missing = bool(self.config.get("ignore_missing", False))
        self.fail_on_error = bool(self.config.get("fail_on_error", True))

    def process(self, batch):
        s = field_to_column(self.src)
        if s not in batch.column_names:
            if self.ignore_missing or not self.fail_on_error:
                return batch
            return set_error(batch, pa.array([True] * len(batch)),
                             f"could not fetch value for key: {self.src}")
        rows = batch.column(s).to_pylist()
        out, failed = [], [False] * len(rows)
        for i, v in enumerate(rows):
            if v is None:
                out.append(None)
                continue
            try:
                raw = v if isinstance(v, (bytes, bytearray)) else v.encode("latin-1")
                out.append(gzip.decompress(raw).decode("utf-8", "replace"))
            except (OSError, ValueError):
                out.append(None)
                failed[i] = True
        batch = set_column(batch, field_to_column(self.dst), pa.array(out, pa.string()))
        if self.fail_on_error and any(failed):
            batch = set_error(batch, pa.array(failed), "error decompressing gzip")
        return batch


_MAGIC = [
    (b"\x1f\x8b", "application/gzip"),
    (b"%PDF", "application/pdf"),
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"PK\x03\x04", "application/zip"),
    (b"{", "application/json"),
    (b"[", "application/json"),
    (b"<?xml", "text/xml"),
    (b"<", "text/html"),
]


@register("detect_mime_type")
class DetectMimeType(Stage):
    """Magic-byte MIME sniff of a field -> target
    (actions/detect_mime_type.go:37; the reference uses a content sniffer,
    same contract: best-effort type or absent)."""

    name = "detect_mime_type"

    def __init__(self, config=None):
        super().__init__(config)
        self.src = self.config["field"]
        self.dst = self.config["target"]

    @staticmethod
    def sniff(v) -> str | None:
        if v is None:
            return None
        raw = v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8", "replace")
        raw = raw.lstrip()
        for magic, mime in _MAGIC:
            if raw.startswith(magic):
                return mime
        try:
            raw.decode("utf-8")
            return "text/plain; charset=utf-8"
        except UnicodeDecodeError:
            return "application/octet-stream"

    def process(self, batch):
        s = field_to_column(self.src)
        if s not in batch.column_names:
            return batch
        vals = [self.sniff(v) for v in batch.column(s).to_pylist()]
        return set_column(batch, field_to_column(self.dst), pa.array(vals, pa.string()))


@register("uri_parts")
class UriParts(Stage):
    """ECS URL decomposition (the ES ingest ``uri_parts`` processor the
    module pipelines rely on): scheme/domain/port/path/query/fragment/
    username/password/extension from a URI or relative reference.
    config: field, target_field (default "url"), keep_original (default
    True), ignore_missing/ignore_failure."""

    name = "uri_parts"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config.get("field", "url.original")
        self.target = self.config.get("target_field", "url")
        self.keep_original = bool(self.config.get("keep_original", True))
        self.ignore_failure = bool(self.config.get("ignore_failure", True))
        # ES: drop the source field after a successful parse (unless it is
        # the target's own .original)
        self.remove_if_successful = bool(
            self.config.get("remove_if_successful", False))

    def input_columns(self):
        return [field_to_column(self.field)]

    def process(self, batch):
        from urllib.parse import unquote, urlsplit
        col = field_to_column(self.field)
        if col not in batch.column_names:
            return batch
        src = batch.column(col).combine_chunks()
        # URL decomposition is a pure function of the value and URL
        # cardinality is usually well below row count in log data: parse
        # each DISTINCT value once, scatter by dictionary indices (null in
        # -> null out, same as the per-row None branch)
        if pa.types.is_string(src.type) or pa.types.is_large_string(src.type):
            enc = src.dictionary_encode()
            idx, vals = enc.indices, enc.dictionary.to_pylist()
        else:
            idx, vals = None, src.to_pylist()
        parts: dict[str, list] = {k: [] for k in
                                  ("scheme", "domain", "port", "path",
                                   "query", "fragment", "username",
                                   "password", "extension")}
        for v in vals:
            if v is None:
                for k in parts:
                    parts[k].append(None)
                continue
            try:
                u = urlsplit(v)
            except ValueError:
                for k in parts:
                    parts[k].append(None)
                continue
            parts["scheme"].append(u.scheme or None)
            parts["domain"].append(u.hostname or None)
            try:
                parts["port"].append(u.port)
            except ValueError:
                parts["port"].append(None)
            # ES uri_parts percent-decodes path and query; path is ALWAYS
            # emitted, "" for path-less URLs (threatintel/otx golden)
            parts["path"].append(unquote(u.path))
            parts["query"].append(unquote(u.query) if u.query else None)
            parts["fragment"].append(u.fragment or None)
            parts["username"].append(u.username or None)
            parts["password"].append(u.password or None)
            seg = (u.path or "").rsplit("/", 1)[-1]
            parts["extension"].append(
                seg.rsplit(".", 1)[1] if "." in seg[1:] else None)
        prefix = field_to_column(self.target) + "_"
        for k, v in parts.items():
            typ = pa.int64() if k == "port" else pa.string()
            arr = pa.array(v, typ)
            if idx is not None:
                arr = arr.take(idx)
            batch = set_column(batch, prefix + k, arr)
        if self.keep_original:
            # ES uri_parts writes <target>.original = the raw input value
            orig_col = prefix + "original"
            if orig_col != col:
                batch = set_column(batch, orig_col,
                                   pc.cast(batch.column(col), pa.string()))
        if self.remove_if_successful and col != prefix + "original":
            batch = batch.drop_columns([col])
        return batch


@register("user_agent")
class UserAgent(Stage):
    """ES ingest ``user_agent`` processor analogue (the module pipelines —
    envoyproxy, apache, nginx — call it after grok/dissect).  Parses a
    User-Agent string into ECS ``user_agent.{name,version}``,
    ``user_agent.os.{name,version,full}`` and ``user_agent.device.name``
    with an ordered uap-core-style regex subset (major browser families +
    the generic ``product/version`` tools — curl, wget, Go-http-client,
    python-requests); unknowns fall back to name/device "Other", matching
    uap-core's catch-all.  config: field, target_field (default
    "user_agent"), ignore_missing.

    Regexes compile once per stage instance (actor-pool ``__init__``), the
    per-row loop is format-inherent string parsing like cef/syslog.
    """

    name = "user_agent"

    _BROWSERS = [
        # (compiled later) pattern, family name, fixed version override;
        # version = group 1 unless the override is set
        (r"Edg(?:e|A|iOS)?/(\d+[\w.]*)", "Edge", None),
        # uap-core: Amazon Silk outranks the Chrome token it embeds
        (r"Silk/(\d+[\w.]*)", "Amazon Silk", None),
        (r"OPR/(\d+[\w.]*)", "Opera", None),
        (r"Opera[ /](\d+[\w.]*)", "Opera", None),
        # uap-core explicit crawler family (nginx access golden)
        (r"Facebot/?\s*(\d+[\w.]*)?", "Facebot", None),
        # uap-core: alpha/beta suffixed Firefox builds get their own family
        # and a dot-joined version ("15.0a2" -> "15.0.a2", apache golden)
        (r"Firefox/(\d+\.[\d.]*)(a\d+[a-z]*)", "Firefox Alpha", None),
        (r"Firefox/(\d+\.[\d.]*)(b\d+[a-z]*)", "Firefox Beta", None),
        (r"Firefox/(\d+[\w.]*)", "Firefox", None),
        (r"FxiOS/(\d+[\w.]*)", "Firefox iOS", None),
        (r"CriOS/(\d+[\w.]*)", "Chrome Mobile iOS", None),
        (r"Chrome/(\d+[\w.]*)", "Chrome", None),
        (r"Version/(\d+[\w.]*).*Mobile.*Safari/", "Mobile Safari", None),
        (r"Version/(\d+[\w.]*).*Safari/", "Safari", None),
        # uap-core: iOS device + Mobile [build] Safari without a Version
        # token -> Mobile Safari, no version
        (r"(?:iPod|iPhone|iPad).*Mobile(?:/[\w.]+)? Safari", "Mobile Safari",
         ""),
        (r"Trident/.*rv:(\d+[\w.]*)", "IE", None),
        # uap-core: Trident/7.0 IS IE 11 regardless of the masked MSIE token
        (r"Trident/(7)\.0", "IE", "11.0"),
        (r"MSIE (\d+[\w.]*)", "IE", None),
        # uap-core: any other UA naming an iOS device is an embedded
        # WKWebView ("Mobile Safari UI/WKWebView", no version)
        (r"iPod|iPhone|iPad", "Mobile Safari UI/WKWebView", ""),
        # generic product/version (curl/7.59.0, wget/1.20, Go-http-client/1.1)
        # -- uap-core never reports the Mozilla/5.0 prefix as a family
        # digit-bearing product names (S3Console/0.4) only match uap's
        # generic with a full x.y.z version — keep the 2-part form for
        # plain tool names (curl, wget, Microsoft-CryptoAPI)
        # uap-core ships EXPLICIT rules per tool — a generic product/version
        # match would wrongly claim kube-probe/1.19+ or webhook/v0.0.0
        # (gcp audit goldens: Other).  Alternation of the uap tools the
        # module fixtures exercise.
        # uap-core explicit: Debian APT (suricata eve-alerts golden)
        (r"^(Debian APT-HTTP)/(\d[\w.]*)", None, None),
        # uap-core family_replacement: 'Python Requests', major.minor only
        # (nginx ingress golden: "2.22.0" -> "2.22")
        (r"python-requests/(\d+\.\d+)", "Python Requests", None),
        (r"^(curl|[Ww]get|Microsoft-CryptoAPI|Go-http-client|"
         r"Python-urllib|okhttp|libwww-perl|Java|PHP|"
         r"Ruby|Faraday|axios|node-fetch|Apache-HttpClient|Googlebot|Twitterbot)"
         r"/(\d[\w.-]*)", None, None),
        # no hyphen in the name class: uap has no rule for hyphenated
        # product tokens like Elastic-metricbeat -> Other (nginx ingress)
        (r"^(?!Mozilla)([A-Za-z0-9._!]+)/(\d+\.\d+\.[\w.-]+)",
         None, None),
        # uap-core lists explicit mid-string products (aws-sdk-java/1.11.590
        # inside a compound UA) — a GENERIC mid-string product/x.y.z match
        # would wrongly claim "gcloud/290.0.1" (gcp audit golden: Other)
        (r"\b(aws-sdk-[a-z]+)/(\d+\.\d+\.[\w.-]+)", None, None),
        # aws-cli (optionally bracket-wrapped in cloudtrail UAs)
        (r"(?:^|\[)(aws-cli)/(\d[\w.-]*)", None, None),
    ]
    _OSES = [
        (r"Windows NT (\d+\.\d+)", "Windows",
         {"10.0": "10", "6.3": "8.1", "6.2": "8", "6.1": "7",
          "6.0": "Vista", "5.1": "XP"}),
        (r"iPhone OS (\d+[_\d]*)", "iOS", None),
        (r"iPad.*? OS (\d+[_\d]*)", "iOS", None),
        (r"\biOS/(\d+[._\d]*)", "iOS", None),
        (r"Mac OS X (\d+[_.\d]*)", "Mac OS X", None),
        (r"Android (\d+[\w.]*)", "Android", None),
        # bare "Android" token (traefik golden): family only, no version
        (r"\b(Android)\b", "Android", None),
        # uap-core: Linux/x.y.z kernel token carries a version
        (r"Linux/(\d+\.\d+(?:\.\d+)?)", "Linux", None),
        # uap-core: APT user agents carry the distro as OS, version-less
        (r"^(Debian) APT-HTTP", "Debian", None),
        # case-insensitive: Go-client UAs carry "(linux/amd64)" (gcp audit)
        (r"(?i)(linux)", "Linux", None),
        (r"\((Windows)[;)]", "Windows", None),
        # "Windows/7" product token (aws-cli UAs): name only, like uap
        (r"\b(Windows)/", "Windows", None),
    ]

    # uap device spider pattern matches [Bb]ot UNanchored — "botocore"
    # classifies aws-cli UAs as Spider (cloudtrail goldens)
    _SPIDER = re.compile(r"(?i)bot|spider|crawler|slurp")

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config.get("field", "user_agent.original")
        self.target = self.config.get("target_field", "user_agent")
        self.ignore_missing = bool(self.config.get("ignore_missing", True))
        self._browsers = [(re.compile(p), n, fv)
                          for p, n, fv in self._BROWSERS]
        self._oses = [(re.compile(p), n, m) for p, n, m in self._OSES]

    def input_columns(self):
        return [field_to_column(self.field)]

    def _parse(self, ua):
        if ua is None:
            return (None,) * 6
        name = "Other"
        version = None
        for rx, fam, fixed in self._browsers:
            m = rx.search(ua)
            if m:
                if fam is None:
                    name, version = m.group(1), m.group(2)
                else:
                    # fixed == "" means the uap rule carries no version;
                    # multi-group rules dot-join like uap's v1.v2.v3
                    # ("15.0" + "a2" -> "15.0.a2")
                    name = fam
                    if fixed is not None:
                        version = fixed or None
                    else:
                        version = ".".join(
                            g.strip(".") for g in m.groups() if g) or None
                break
        os_name = os_ver = os_full = None
        for rx, fam, vmap in self._oses:
            m = rx.search(ua)
            if m:
                os_name = fam
                raw = m.group(1).replace("_", ".")
                if not raw[:1].isdigit():
                    # version-less match (bare Linux / "(Windows; U;" —
                    # sophos cfilter golden): name only
                    os_full = fam
                    break
                os_ver = vmap.get(raw, raw) if vmap else raw
                os_full = f"{fam} {os_ver}"
                break
        if self._SPIDER.search(ua):
            device = "Spider"
        elif "iPhone" in ua:
            device = "iPhone"
        elif "iPad" in ua:
            device = "iPad"
        elif "Kindle" in ua or re.search(r"\bKF[A-Z]{2,4}\b", ua):
            device = "Kindle"   # uap-core: Kindle Fire models (KFFOWI...)
        elif "Android" in ua and ("Mobile" in ua or ua.strip() == "Android"):
            device = "Generic Smartphone"
        elif "Macintosh" in ua:
            device = "Mac"
        else:
            device = "Other"
        return name, version, os_name, os_ver, os_full, device

    def process(self, batch):
        col = field_to_column(self.field)
        if col not in batch.column_names:
            if self.ignore_missing:
                return batch
            raise KeyError(col)
        src = batch.column(col).combine_chunks()
        if pa.types.is_string(src.type) or pa.types.is_large_string(src.type):
            # UA cardinality is tiny relative to rows at scale: parse each
            # DISTINCT value once, scatter by dictionary indices (null in ->
            # null out, matching _parse(None) -> all-None)
            enc = src.dictionary_encode()
            idx = enc.indices
            parsed = [self._parse(v) for v in enc.dictionary.to_pylist()]
        else:
            idx = None
            parsed = [self._parse(v) for v in src.to_pylist()]
        cols = list(zip(*parsed)) or [[]] * 6
        prefix = field_to_column(self.target) + "_"
        for key, data in zip(("name", "version", "os_name", "os_version",
                              "os_full", "device_name"), cols):
            arr = pa.array(data, pa.string())
            if idx is not None:
                arr = arr.take(idx)
            if arr.null_count < len(arr):
                batch = set_column(batch, prefix + key, arr)
        orig = prefix + "original"
        if orig != col and field_to_column(self.field) != orig:
            batch = set_column(batch, orig,
                               pc.cast(batch.column(col), pa.string()))
        return batch


@register("kv")
class KeyValue(Stage):
    """ES ingest ``kv`` processor analogue (checkpoint/cef-style
    structured-data payloads).  config: field, field_split (regex),
    value_split (regex, first match wins), prefix, target_field,
    include_keys, exclude_keys, trim_key, trim_value, strip_brackets,
    ignore_missing, ignore_failure.

    Faithful quirk: like the ES KeyValueProcessor, pairs are written in
    order and a chunk WITHOUT the value_split aborts the row at that point
    — fields set so far survive under ignore_failure (the checkpoint
    module's R80 fixtures depend on this: a quoted list value containing
    the field_split truncates the tail of the record).

    Row loop is format-inherent (like cef/syslog); regexes compile once
    per stage instance.
    """

    name = "kv"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        self.field = c["field"]
        self.fs = re.compile(c.get("field_split", " "))
        self.vs = re.compile(c.get("value_split", "="))
        self.prefix = c.get("prefix", "")
        self.target = c.get("target_field")
        self.include = set(c.get("include_keys") or [])
        self.exclude = set(c.get("exclude_keys") or [])
        self.trim_key = c.get("trim_key")
        self.trim_value = c.get("trim_value")
        self.strip_brackets = bool(c.get("strip_brackets", False))
        self.ignore_missing = bool(c.get("ignore_missing", False))
        self.ignore_failure = bool(c.get("ignore_failure", False))

    def input_columns(self):
        return [field_to_column(self.field)]

    def _parse(self, v: str) -> tuple[dict, bool]:
        out: dict[str, object] = {}
        for part in self.fs.split(v):
            if not part:
                continue
            kv = self.vs.split(part, maxsplit=1)
            if len(kv) != 2:
                return out, True    # ES aborts here, keeping prior fields
            k, val = kv
            if self.trim_key:
                k = k.strip(self.trim_key)
            if self.trim_value:
                val = val.strip(self.trim_value)
            if self.strip_brackets:
                # ES strips at most ONE bracket/quote per side
                # ((^[\(\[<"'])|([\]\)>"']$) replaceAll in the reference
                # processor), so inner brackets survive
                if val[:1] in "([<\"'":
                    val = val[1:]
                if val[-1:] in ")]>\"'":
                    val = val[:-1]
            if self.include and k not in self.include:
                continue
            if k in self.exclude:
                continue
            key = self.prefix + k
            if key in out:                      # ES appends into an array
                prev = out[key]
                out[key] = (prev if isinstance(prev, list) else [prev]) + [val]
            else:
                out[key] = val
        return out, False

    def process(self, batch):
        col = field_to_column(self.field)
        if col not in batch.column_names:
            if self.ignore_missing:
                return batch
            return set_error(batch, pa.array([True] * len(batch)),
                             f"field [{self.field}] not present")
        rows = batch.column(col).to_pylist()
        parsed, failed = [], []
        for v in rows:
            if v is None:
                parsed.append({})
                failed.append(False)
                continue
            d, aborted = self._parse(v)
            parsed.append(d)
            failed.append(aborted)
        keys: list[str] = []
        seen = set()
        for d in parsed:
            for k in d:
                if k not in seen:
                    seen.add(k)
                    keys.append(k)
        tgt_prefix = (field_to_column(self.target) + "_") if self.target else ""
        for k in keys:
            vals = [d.get(k) for d in parsed]
            if any(isinstance(x, list) for x in vals):
                vals = [x if x is None or isinstance(x, list) else [x]
                        for x in vals]
                arr = pa.array(vals, pa.list_(pa.string()))
            else:
                arr = pa.array(vals, pa.string())
            name = tgt_prefix + field_to_column(k)
            if name in batch.column_names:
                # ES kv APPENDS into existing fields per doc (ingest
                # appendFieldValue): rows with values from BOTH kv passes
                # become arrays; rows this kv contributes nothing to keep
                # the earlier value (auditd runs two kv passes into the
                # same target)
                cur = batch.column(name).to_pylist()
                new = arr.to_pylist()
                merged, any_list = [], False
                for c, v in zip(cur, new):
                    if v is None:
                        merged.append(c)
                    elif c is None:
                        merged.append(v)
                    else:
                        c = c if isinstance(c, list) else [c]
                        v = v if isinstance(v, list) else [v]
                        merged.append(c + v)
                    if isinstance(merged[-1], list):
                        any_list = True
                if any_list:
                    # pre-existing values may be non-string scalars (ints/
                    # bools from an earlier stage) — stringify elements so
                    # the list<string> build can't raise ArrowInvalid
                    merged = [m if m is None else
                              [e if e is None or isinstance(e, str)
                               else str(e) for e in
                               (m if isinstance(m, list) else [m])]
                              for m in merged]
                    arr = pa.array(merged, pa.list_(pa.string()))
                else:
                    merged = [m if m is None or isinstance(m, str) else str(m)
                              for m in merged]
                    arr = pa.array(merged, pa.string())
            batch = set_column(batch, name, arr)
        if any(failed):
            flag = self.config.get("failure_flag")
            if flag:
                # per-processor on_failure routing (okta risk kv): mark the
                # rows this kv missed so compiled handlers can gate on it
                from ..event import add_flag
                batch = add_flag(batch, pa.array(failed), flag)
            elif not self.ignore_failure:
                batch = set_error(batch, pa.array(failed),
                                  "unable to split key-value pair")
        return batch
