"""Dissect processor — delimiter tokenizer over a string column.

Semantics replicate the reference (libbeat/processors/dissect/):

- tokenizer ``lit0%{key1}lit1%{key2}...`` — walk delimiters left-to-right with
  substring search; the first delimiter must match at offset 0
  (dissect.go:103-117); a missing delimiter is a parse failure; trailing
  content after the final delimiter is ignored; a trailing field captures the
  rest of the string (dissect.go:175-178).
- key modifiers (const.go:30-45, field.go): ``%{}``/``%{?name}`` skip,
  ``%{+key}`` append (values applied in ordinal order — ``/n`` — joined with
  the delimiter preceding each occurrence, default ``" "``; field.go:216-234),
  ``%{*key}``/``%{&key}`` pointer/indirect, ``%{key#n}`` fixed length,
  ``%{key->}`` greedy padding (skip adjacent repeats of the following
  delimiter; dissect.go:148-159), ``%{key|type}`` datatype conversion
  (integer/long/float/double/boolean/ip/string; dissect.go:277-285).
- processor config (config.go): ``tokenizer``, ``field`` (default
  ``message``), ``target_prefix`` (default ``dissect``), ``ignore_failure``,
  ``overwrite_keys``, ``trim_values`` (none/left/right/all), ``trim_chars``
  (default ``" "``).  Parse failure appends flag ``dissect_parsing_error``
  (processor.go:33) and, unless ``ignore_failure``, sets ``error_message``.

Ray-first execution: tokenizers without append/indirect/pointer/fixed-length
modifiers compile to ONE anchored RE2 regex evaluated with
``pyarrow.compute.extract_regex`` — fully vectorized, zero-copy Arrow in/out.
Other tokenizers fall back to a per-row Python walk (compiled once per stage,
still amortized across the batch).  Output keys become flat columns
``<target_prefix>_<key>``.
"""

from __future__ import annotations

import ipaddress
import re
from dataclasses import dataclass, field as dc_field

import pyarrow as pa
import pyarrow.compute as pc

from ..event import add_flag, field_to_column, set_column, set_error
from .base import Stage, register

FLAG_PARSING_ERROR = "dissect_parsing_error"

_TOKEN_RE = re.compile(r"(?s)(.*?)%\{([^}]*?)\}")
_KEY_RE = re.compile(
    r"(.*?)"                 # 1: key name (with prefix char)
    r"(?:/(\d{1,2}))?"       # 2: ordinal
    r"(?:#(\d{1,2}))?"       # 3: fixed length
    r"(->)?"                 # 4: greedy
    r"(?:\|([A-Za-z]*))?$"   # 5: datatype
)

NORMAL, SKIP, APPEND, POINTER, INDIRECT = range(5)


@dataclass
class _Key:
    kid: int
    name: str
    kind: int
    ordinal: int = 0
    length: int = 0          # 0 = variable
    greedy: bool = False
    dtype: str = ""
    prev_delim: str = ""     # delimiter immediately before this key

    @property
    def saveable(self) -> bool:
        return self.kind in (NORMAL, APPEND, INDIRECT)

    def join_string(self) -> str:
        return self.prev_delim if self.prev_delim else " "


@dataclass
class Tokenizer:
    raw: str
    delims: list = dc_field(default_factory=list)   # delims[i] precedes keys[i]
    keys: list = dc_field(default_factory=list)
    trailing: str = ""                              # delimiter after the last key

    @property
    def out_keys(self) -> list[str]:
        """Statically-known output keys (indirect keys are dynamic)."""
        return [k.name for k in self.keys if k.kind in (NORMAL, APPEND)]


def parse_tokenizer(tok: str) -> Tokenizer:
    matches = list(_TOKEN_RE.finditer(tok))
    if not matches:
        raise ValueError(f"invalid dissect tokenizer (no keys): {tok!r}")
    t = Tokenizer(raw=tok)
    end = 0
    for kid, m in enumerate(matches):
        delim, rawkey = m.group(1), m.group(2)
        end = m.end()
        if rawkey == "":
            key = _Key(kid, "", SKIP)
        else:
            km = _KEY_RE.match(rawkey)
            name, ordinal, length, greedy, dtype = km.groups()
            kind = NORMAL
            if name.startswith("?"):
                kind, name = SKIP, name[1:]
            elif name.startswith(("+&", "&+")):
                raise ValueError("mixed prefix `&+`/`+&` is invalid")
            elif name.startswith("+"):
                kind, name = APPEND, name[1:]
            elif name.startswith("&"):
                kind, name = INDIRECT, name[1:]
            elif name.startswith("*"):
                kind, name = POINTER, name[1:]
            key = _Key(kid, name, kind, int(ordinal or 0), int(length or 0),
                       bool(greedy), dtype or "", delim)
        t.delims.append(delim)
        t.keys.append(key)
    t.trailing = tok[end:]
    return t


def _convert(dtype: str, v: str):
    """dissect.go:277-285 — on conversion failure the raw string is kept."""
    try:
        if dtype in ("integer",):
            return int(v)
        if dtype in ("long",):
            return int(v)
        if dtype in ("float", "double"):
            return float(v)
        if dtype == "boolean":
            if v.lower() in ("1", "t", "true"):
                return True
            if v.lower() in ("0", "f", "false"):
                return False
            return v
        if dtype == "ip":
            ipaddress.ip_address(v)
            return v
    except (ValueError, TypeError):
        return v
    return v


class CompiledDissector:
    """One tokenizer, compiled once; `dissect(str) -> dict | None`."""

    def __init__(self, tokenizer: str, trim_mode: str = "none",
                 trim_chars: str = " ", append_separator: str | None = None):
        self.t = parse_tokenizer(tokenizer)
        self.trim_mode = trim_mode
        self.trim_chars = trim_chars
        # None -> Beats semantics (join with the key's preceding delimiter);
        # the ES ingest dissect processor joins with append_separator,
        # default "" (cisco asa 419002: '%{event.reason}from ...
        # %{+event.reason}' must not double the space)
        self.append_separator = append_separator
        # resolve order: stable sort by (ordinal, token position) so appends
        # join left-to-right (parser.go:81-84)
        self._resolve_order = sorted(self.t.keys, key=lambda k: (k.ordinal, k.kid))
        self.regex = self._try_regex()

    # -- vectorizable fast path -------------------------------------------
    def _try_regex(self) -> str | None:
        """Translate to an anchored RE2 pattern when semantics allow: only
        NORMAL / unnamed SKIP keys, no fixed length, no trim.  Non-greedy
        ``.*?`` up to the literal next delimiter == leftmost substring search;
        ``(?:delim)+`` == greedy padding skip."""
        if self.trim_mode != "none":
            return None
        names = set()
        for k in self.t.keys:
            if k.kind not in (NORMAL, SKIP) or k.length or k.dtype:
                return None
            if k.kind == NORMAL:
                if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", k.name) or k.name in names:
                    return None
                names.add(k.name)
        parts = ["(?s)^"]
        nkeys = len(self.t.keys)
        delims = list(self.t.delims)            # local copy: greedy swallows
        trailing = self.t.trailing              # the following delimiter here
        for i, k in enumerate(self.t.keys):
            parts.append(re.escape(delims[i]))
            nxt = delims[i + 1] if i + 1 < nkeys else trailing
            grp = f"(?P<{k.name}>" if k.kind == NORMAL else "(?:"
            if nxt:
                parts.append(grp + ".*?)")
                if k.greedy:
                    parts.append("(?:" + re.escape(nxt) + ")+")
                    if i + 1 < nkeys:
                        delims[i + 1] = ""
                    else:
                        trailing = ""
            else:
                parts.append(grp + ".*)")
        parts.append(re.escape(trailing))
        return "".join(parts)

    # -- faithful per-row walk --------------------------------------------
    def dissect(self, s: str) -> dict | None:
        """Extract + resolve one string; None = parse failure
        (dissect.go:56-77 / :101-180)."""
        if not s:
            return None
        t = self.t
        nkeys = len(t.keys)
        positions = [(0, 0)] * nkeys
        d0 = t.delims[0]
        if d0 and not s.startswith(d0):
            return None
        offset = len(d0)
        for i in range(nkeys):
            nxt = t.delims[i + 1] if i + 1 < nkeys else t.trailing
            is_last = i + 1 >= nkeys and not t.trailing
            key = t.keys[i]
            start = offset
            if is_last:
                if key.length:
                    if offset + key.length != len(s):
                        return None
                    positions[i] = (offset, offset + key.length)
                elif offset < len(s):
                    positions[i] = (offset, len(s))
                break
            if key.length:
                end = offset + key.length
                if end > len(s):
                    return None
            else:
                end = s.find(nxt, offset)
                if end == -1:
                    return None
            offset = end
            if key.greedy and nxt:
                # skip adjacent repeats of the next delimiter
                # (dissect.go:148-159); a repeat starts at offset+len(nxt),
                # not offset+1 — the old +1 only worked for 1-char delims
                while True:
                    look = s.find(nxt, offset + len(nxt))
                    if look != offset + len(nxt):
                        break
                    offset = look
            positions[i] = (start, end)
            offset += len(nxt)
        # trim (processor config trim_values)
        if self.trim_mode != "none":
            positions = [self._trim(s, a, b) for (a, b) in positions]
        # resolve in ordinal order
        m: dict[str, str] = {}
        for k in self._resolve_order:
            a, b = positions[k.kid]
            val = s[a:b]
            if k.kind == APPEND and k.name in m:
                sep = self.append_separator if self.append_separator \
                    is not None else k.join_string()
                m[k.name] = m[k.name] + sep + val
            elif k.kind == INDIRECT:
                if k.name in m:
                    m[m[k.name]] = val
            else:
                if k.name:
                    m[k.name] = val
        for k in t.keys:
            if not k.saveable and k.name and k.name in m:
                del m[k.name]
        # datatype conversion
        for k in t.keys:
            if k.dtype and k.kind == NORMAL and k.name in m:
                m[k.name] = _convert(k.dtype, m[k.name])
        return m

    def _trim(self, s, a, b):
        if self.trim_mode in ("left", "all"):
            while a < b and s[a] in self.trim_chars:
                a += 1
        if self.trim_mode in ("right", "all"):
            while b > a and s[b - 1] in self.trim_chars:
                b -= 1
        return a, b


@register("dissect")
class DissectStage(Stage):
    """config: tokenizer, field="message", target_prefix="dissect",
    ignore_failure=False, overwrite_keys=False, trim_values="none",
    trim_chars=" ".  Output columns: `<prefix>_<key>` (prefix "" -> bare key).
    """

    name = "dissect"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        self.dissector = CompiledDissector(c["tokenizer"],
                                           c.get("trim_values", "none"),
                                           c.get("trim_chars", " "),
                                           c.get("append_separator"))
        self.field = c.get("field", "message")
        prefix = c.get("target_prefix", "dissect")
        self.prefix = (prefix + "_") if prefix else ""
        self.ignore_failure = bool(c.get("ignore_failure", False))
        self.overwrite_keys = bool(c.get("overwrite_keys", False))
        self.out_keys = [self.prefix + k for k in self.dissector.t.out_keys]

    def input_columns(self):
        from ..event import FLAGS_COL
        return [field_to_column(self.field), FLAGS_COL]

    def process(self, batch: pa.Table) -> pa.Table:
        cname = field_to_column(self.field)
        if cname not in batch.column_names:
            if self.config.get("ignore_missing") or self.ignore_failure:
                return batch
            from ..event import set_error
            return set_error(batch, pa.array([True] * len(batch)),
                             f"field [{self.field}] not present")
        col = batch.column(cname)
        if self.dissector.regex is not None:
            return self._process_regex(batch, col)
        return self._process_py(batch, col)

    def _process_regex(self, batch, col):
        # nulls/empty fail; pc.extract_regex yields null struct on no-match
        structs = pc.extract_regex(pc.fill_null(col, ""), self.dissector.regex)
        ok = pc.is_valid(structs)
        # a capture-only tokenizer ('%{a}') regex-matches the empty string,
        # but the per-row walk and dissect.go fail empty/null input — keep
        # the two engine paths' failure flags identical
        ok = pc.and_(ok, pc.not_equal(pc.fill_null(col, ""), ""))
        names = [f.name for f in structs.type] if structs.type.num_fields else []
        for name in names:
            vals = pc.struct_field(structs, name)
            batch = self._write(batch, self.prefix + name, vals, ok)
        return self._fail(batch, pc.invert(ok))

    def _process_py(self, batch, col):
        diss = self.dissector.dissect
        rows = col.to_pylist()
        results = [diss(s) if s else None for s in rows]
        ok = [r is not None for r in results]
        # column set = union of produced keys (indirect keys are dynamic)
        keys: list[str] = []
        seen = set()
        for r in results:
            if r:
                for k in r:
                    if k not in seen:
                        seen.add(k)
                        keys.append(k)
        ok_arr = pa.array(ok, pa.bool_())
        for k in keys:
            out_name = self.prefix + k
            vals = [r.get(k) if r else None for r in results]
            try:
                arr = pa.array(vals)
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                # dtype-conversion failures keep the RAW string per row
                # (dissect.go:277-285), so a partially-failing batch can
                # hold mixed int/str values — fall back to one string
                # column preserving each row's rendered value instead of
                # crashing the whole batch
                arr = pa.array([None if v is None else
                                ("true" if v is True else
                                 "false" if v is False else str(v))
                                for v in vals], pa.string())
            batch = self._write(batch, out_name, arr, ok_arr)
        return self._fail(batch, pc.invert(ok_arr))

    def _write(self, batch, out_name, vals, ok):
        """Per-ROW key semantics (dissect operates on one event): a row
        whose parse failed keeps its existing value; an existing NON-NULL
        cell is kept unless overwrite_keys — the old column-level skip let
        one variant dissect starve another that matched different rows
        (cisco asa 713049 LAN-to-LAN vs Username variants)."""
        out_name = field_to_column(out_name)
        if out_name not in batch.column_names:
            return set_column(batch, out_name,
                              pc.if_else(ok, vals, pa.nulls(len(batch),
                                                            vals.type)))
        old = batch.column(out_name)
        write = ok if self.overwrite_keys else pc.and_(ok, pc.is_null(old))
        try:
            merged = pc.if_else(write, pc.cast(vals, old.type), old)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            merged = pc.if_else(write, vals, pc.cast(old, vals.type))
        return set_column(batch, out_name, merged)

    def _fail(self, batch, fail_mask):
        if (pc.sum(fail_mask).as_py() or 0) == 0:
            return batch
        batch = add_flag(batch, fail_mask, FLAG_PARSING_ERROR)
        if not self.ignore_failure:
            batch = set_error(batch, fail_mask, "unable to parse field with dissect")
        return batch
