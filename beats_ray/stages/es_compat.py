"""Elasticsearch-ingest-processor analogues that have no Beats-processor
counterpart: ``set``, ``append`` and ``dot_expander``.

The reference ships an ES ingest pipeline per module fileset
(x-pack/filebeat/module/*/*/ingest/pipeline.yml) and uploads it to
Elasticsearch (filebeat/fileset/pipelines.go); events are transformed
server-side.  This engine runs those pipelines itself — ``ingest.py``
compiles the yml into a Pipeline spec over these stages.

Semantics mirror the ES processors:
- set (SetProcessor): create-or-replace ``field`` with a constant ``value``
  or the value of another field (``copy_from`` — also used for single
  ``{{template}}`` values); ``override: false`` only fills missing/null.
- append (AppendProcessor): ensure ``field`` is a list and append a
  constant, another field's per-row value (``value_from``) or every element
  of another list column (``each_from`` — the ``foreach`` + append idiom);
  ``allow_duplicates: false`` skips values already present.
- dot_expander: a no-op here — the column model flattens dotted paths
  already (event.py field_to_column).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..event import field_to_column, get_column, set_column
from ..fmtstr import FormatString
from .base import Stage, register

_MUSTACHE = re.compile(
    r"\{\{\{\s*([^}\s]+?)\s*\}\}\}|\{\{\s*([^}\s]+?)\s*\}\}")


def mustache_to_fmtstr(tmpl: str) -> FormatString:
    """ES mustache ``{{a.b}}`` / ``{{{a.b}}}`` -> the engine's
    ``%{[a.b]}`` format string (missing field -> null row).  Escaping is
    PER TOKEN like mustache itself: double-brace substitutions JSON-escape
    (ES's JsonEscapeEncoder), triple-brace ones stay raw — a template
    mixing both escapes only its double-brace fields.  (Exemption is
    field-name-keyed, so the same field in both forms takes the raw
    form — not a shape any shipped pipeline uses.)"""
    raw_fields: set[str] = set()
    escaped_any = False

    def sub(m: re.Match) -> str:
        nonlocal escaped_any
        if m.group(1) is not None:     # {{{triple}}}
            raw_fields.add(m.group(1))
            return "%{[" + m.group(1) + "]}"
        escaped_any = True
        return "%{[" + m.group(2) + "]}"

    fs = FormatString(_MUSTACHE.sub(sub, tmpl))
    fs.json_escape = escaped_any
    fs.no_escape_fields = frozenset(raw_fields)
    return fs


@register("set")
class SetField(Stage):
    """config: field, value | copy_from | template, override=True,
    ignore_empty_value.  ``template`` is an ES mustache string rendered
    per row (string result); rows whose render misses a field (null) or is
    empty are SKIPPED when ignore_empty_value (the guarded module idiom),
    else set to null."""

    name = "set"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        self.field = c["field"]
        self.value = c.get("value")
        self.copy_from = c.get("copy_from")
        self.template = (FormatString(c["template"])
                         if c.get("template") is not None else None)
        if self.template is not None:
            # ES mustache JSON-escapes {{..}} values; {{{..}}} opts out
            self.template.json_escape = bool(c.get("template_escape", True))
        self.list_templates = None
        if c.get("list_templates"):
            self.list_templates = [FormatString(t)
                                   for t in c["list_templates"]]
            for t in self.list_templates:
                t.json_escape = bool(c.get("template_escape", True))
        self.override = bool(c.get("override", True))
        self.ignore_empty = bool(c.get("ignore_empty_value", False))

    def process(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        keep_cur = None  # row mask: keep the pre-existing value
        if self.copy_from is not None:
            src = get_column(batch, self.copy_from)
            if src is None:
                # container copy: ES set copy_from of a MAP clones the whole
                # subtree (okta debug_data -> ...flattened) — column-prefix
                # copy in the flat model
                from ..event import field_to_column as _f2c
                pre = _f2c(self.copy_from) + "_"
                subs = [c for c in batch.column_names if c.startswith(pre)]
                if subs:
                    dst = _f2c(self.field) + "_"
                    for c in subs:
                        batch = set_column(batch, dst + c[len(pre):],
                                           batch.column(c))
                return batch
            new = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
        elif self.list_templates is not None:
            # list value of per-row template renders (salesforce
            # user.roles: ["{{{json.USER_TYPE}}}"])
            cols = [t.render(batch).to_pylist() for t in self.list_templates]
            rows = [[c[i] for c in cols] for i in range(n)]
            if self.ignore_empty:
                keep = [all(e in (None, "") for e in r) for r in rows]
                keep_cur = pa.array(keep, pa.bool_())
                if all(keep):
                    return batch
            new = pa.array([["" if e is None else e for e in r]
                            for r in rows], pa.list_(pa.string()))
        elif self.template is not None:
            new = self.template.render(batch)
            if self.ignore_empty:
                empty = pc.or_kleene(pc.is_null(new), pc.equal(new, ""))
                keep_cur = pc.fill_null(empty, True)
                if pc.all(keep_cur).as_py():
                    # no row is actually set: leave the batch (and the
                    # existing column's type) untouched
                    return batch
        else:
            if self.ignore_empty and self.value in (None, ""):
                return batch
            new = pa.array([self.value] * n)
        cur = get_column(batch, self.field)
        if cur is not None and not self.override:
            cur = cur.combine_chunks() if isinstance(cur, pa.ChunkedArray) else cur
            try:
                new = pc.if_else(pc.is_valid(cur), cur, new)
            except pa.ArrowNotImplementedError:
                vals = [c if c is not None else v
                        for c, v in zip(cur.to_pylist(), new.to_pylist())]
                new = pa.array(vals)
        elif keep_cur is not None:
            if cur is not None:
                cur = cur.combine_chunks() if isinstance(cur, pa.ChunkedArray) else cur
                if pa.types.is_list(new.type) or \
                        pa.types.is_large_list(new.type):
                    # list-template set over a scalar column: lift the kept
                    # scalars (ES keeps per-doc shapes; the golden compare
                    # lifts 1-element lists)
                    if not (pa.types.is_list(cur.type)
                            or pa.types.is_large_list(cur.type)):
                        cur = pa.array(
                            [None if v is None else [str(v)]
                             for v in cur.to_pylist()], new.type)
                elif not (pa.types.is_string(cur.type)
                          or pa.types.is_large_string(cur.type)):
                    cur = pc.cast(cur, pa.string())
                new = pc.if_else(keep_cur, cur, new)
            else:
                new = pc.if_else(keep_cur,
                                 pa.nulls(n, new.type), new)
        return set_column(batch, self.field, new)


@register("append")
class AppendField(Stage):
    """config: field, value | value_from | each_from, allow_duplicates=True.

    Values land as list columns; a scalar already in ``field`` becomes the
    first element (ES AppendProcessor / mapstr appendString semantics).
    List building is a row loop — list<str> columns are Python-object bound
    in Arrow anyway, and this stage is enrichment-sized, not parse-sized.
    """

    name = "append"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        self.field = c["field"]
        self.value = c.get("value")
        self.value_from = c.get("value_from")
        self.each_from = c.get("each_from")
        self.templates = None
        if self.value_from is None and self.each_from is None:
            vals = self.value if isinstance(self.value, list) else [self.value]
            if any(isinstance(v, str) and "{{" in v for v in vals):
                self.templates = [mustache_to_fmtstr(v)
                                  if isinstance(v, str) else None
                                  for v in vals]
        self.allow_dup = bool(c.get("allow_duplicates", True))

    def process(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        cur = get_column(batch, self.field)
        base = cur.to_pylist() if cur is not None else [None] * n
        if self.each_from is not None:
            src = get_column(batch, self.each_from)
            if src is None:
                return batch
            adds = [v if isinstance(v, list) else ([] if v is None else [v])
                    for v in src.to_pylist()]
            # mustache renders null elements as "" (anomalithreatstream
            # tags golden)
            adds = [["" if e is None else e for e in a] for a in adds]
            key = self.config.get("each_key")
            if key:  # foreach over list<struct>: one member per element,
                # mustache semantics — missing/null renders "" (appended)
                adds = [["" if not isinstance(e, dict) or e.get(key) is None
                         else e[key] for e in a] for a in adds]
        elif self.value_from is not None:
            src = get_column(batch, self.value_from)
            if src is None:
                return batch
            adds = [[] if v is None else [v] for v in src.to_pylist()]
        elif self.templates is not None:
            # per-row template renders; ES mustache renders a missing field
            # as "" (ibmmq arithinsert goldens expect ['', '']) — except the
            # all-of-one-missing single-template case, which stays a skip
            # (appending "" for every row would fabricate empty tags)
            vals = self.value if isinstance(self.value, list) else [self.value]
            cols = [t.render(batch).to_pylist() if t is not None else [v] * n
                    for t, v in zip(self.templates, vals)]
            if isinstance(self.value, list) and len(vals) > 1:
                cols = [["" if v is None else v for v in c] for c in cols]
            adds = [[c[i] for c in cols if c[i] is not None] for i in range(n)]
        else:
            vals = self.value if isinstance(self.value, list) else [self.value]
            adds = [vals] * n
        out = []
        for b, a in zip(base, adds):
            lst = list(b) if isinstance(b, list) else ([] if b is None else [b])
            for v in a:
                if self.allow_dup or v not in lst:
                    lst.append(v)
            out.append(lst if lst or isinstance(b, list) else None)
        return set_column(batch, self.field, pa.array(out))


@register("es_split")
class SplitField(Stage):
    """ES SplitProcessor: string field -> list<string> by regex separator.
    config: field, separator (regex), target_field=field, ignore_missing,
    preserve_trailing=False."""

    name = "es_split"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        self.field = c["field"]
        self.sep = re.compile(c.get("separator", " "))
        self.target = c.get("target_field", self.field)
        self.preserve = bool(c.get("preserve_trailing", False))

    def process(self, batch: pa.Table) -> pa.Table:
        col = get_column(batch, self.field)
        if col is None:
            return batch
        out = []
        for v in col.to_pylist():
            if v is None:
                out.append(None)
                continue
            if not isinstance(v, str):
                # ES fails the doc on a non-string field; fail only this
                # row (keep it un-split) instead of TypeError-ing the batch
                out.append(None)
                continue
            # Java String.split: no match -> [original] (even for "");
            # else trailing empties removed unless preserve_trailing
            if self.sep.search(v) is None:
                out.append([v])
                continue
            parts = self.sep.split(v)
            if not self.preserve:
                while parts and parts[-1] == "":
                    parts.pop()
            out.append(parts)
        return set_column(batch, self.target,
                          pa.array(out, pa.list_(pa.string())))


@register("es_join")
class JoinField(Stage):
    """ES JoinProcessor: list field -> one string with separator.
    config: field, separator, target_field=field."""

    name = "es_join"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        self.field = c["field"]
        self.sep = c.get("separator", "")
        self.target = c.get("target_field", self.field)

    def process(self, batch: pa.Table) -> pa.Table:
        col = get_column(batch, self.field)
        if col is None:
            return batch
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            try:
                joined = pc.binary_join(pc.cast(col, pa.list_(pa.string())),
                                        self.sep)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                joined = pa.array(
                    [None if v is None else self.sep.join(map(str, v))
                     for v in col.to_pylist()], pa.string())
            return set_column(batch, self.target, joined)
        return batch


@register("es_trim")
class TrimField(Stage):
    """ES TrimProcessor: whitespace-trim a string field — or every element
    of a list<string> field.  config: field | fields, target_field=field,
    ignore_missing."""

    name = "es_trim"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        self.fields = c.get("fields") or [c["field"]]
        self.target = c.get("target_field")

    def process(self, batch: pa.Table) -> pa.Table:
        for f in self.fields:
            col = get_column(batch, f)
            if col is None:
                continue
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            t = col.type
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                out = pc.utf8_trim_whitespace(col)
            elif (pa.types.is_list(t) or pa.types.is_large_list(t)) and \
                    pa.types.is_string(t.value_type):
                flat = pc.utf8_trim_whitespace(col.values)
                out = pa.ListArray.from_arrays(col.offsets, flat)
                if col.null_count:
                    # from_arrays drops validity; reapply
                    out = pc.if_else(pc.is_valid(col), out,
                                     pa.nulls(len(col), out.type))
            else:
                continue
            batch = set_column(batch, self.target or f, out)
        return batch


@register("es_csv")
class CsvProcessor(Stage):
    """ES CsvProcessor: one CSV line -> N named target fields.
    config: field, target_fields[], separator=',', quote='"',
    trim=False, ignore_missing, empty_value (ES leaves the target UNSET for
    empty cells unless empty_value given)."""

    name = "es_csv"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        self.field = c["field"]
        self.targets = list(c.get("target_fields", []))
        self.sep = c.get("separator", ",")
        self.quote = c.get("quote", '"')
        self.trim = bool(c.get("trim", False))
        self.empty = c.get("empty_value")

    def process(self, batch: pa.Table) -> pa.Table:
        import csv as _csv
        import io as _io
        col = get_column(batch, self.field)
        if col is None:
            return batch
        rows = []
        for v in col.to_pylist():
            if v is None or not isinstance(v, str):
                rows.append([])
                continue
            try:
                rows.append(next(_csv.reader(
                    _io.StringIO(v), delimiter=self.sep,
                    quotechar=self.quote, skipinitialspace=self.trim)))
            except (_csv.Error, StopIteration):
                rows.append([])
        for i, tgt in enumerate(self.targets):
            vals = [r[i].strip() if self.trim and i < len(r) and r[i] != ""
                    else (r[i] if i < len(r) and r[i] != "" else self.empty)
                    for r in rows]
            if all(v is None for v in vals):
                continue
            batch = set_column(batch, tgt, pa.array(vals, pa.string()))
        return batch


@register("set_dynamic")
class SetDynamic(Stage):
    """ES set/rename with a TEMPLATED FIELD NAME
    (``threat.indicator.file.hash.{{misp.attribute.type}}``): the target
    column differs per row.  config: field_template, value | template |
    copy_from, rename_from (move semantics: clears the source on affected
    rows).  Renders the name per row, then scatters values into each
    distinct target column (one if_else per distinct name per batch)."""

    name = "set_dynamic"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        self.name_fs = mustache_to_fmtstr(c["field_template"])
        self.name_fs.json_escape = False
        self.value = c.get("value")
        self.value_fs = (mustache_to_fmtstr(c["template"])
                         if c.get("template") is not None else None)
        self.copy_from = c.get("copy_from") or c.get("rename_from")
        self.rename = "rename_from" in c

    def process(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        names = self.name_fs.render(batch).to_pylist()
        if self.copy_from is not None:
            src = get_column(batch, self.copy_from)
            if src is None:
                return batch
            vals = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
        elif self.value_fs is not None:
            vals = self.value_fs.render(batch)
        else:
            vals = pa.array([self.value] * n)
        for nm in sorted({x for x in names if x}):
            mask = pa.array([x == nm for x in names], pa.bool_())
            col = field_to_column(nm)
            if col in batch.column_names:
                cur = batch.column(col)
                cur = cur.combine_chunks() if isinstance(cur, pa.ChunkedArray) else cur
                try:
                    merged = pc.if_else(mask, vals, cur)
                except (pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    merged = pa.array([v if m else c for m, v, c in zip(
                        mask.to_pylist(), vals.to_pylist(), cur.to_pylist())])
                batch = set_column(batch, nm, merged)
            else:
                try:
                    merged = pc.if_else(mask, vals,
                                        pa.nulls(n, vals.type))
                except (pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    merged = pa.array([v if m else None for m, v in zip(
                        mask.to_pylist(), vals.to_pylist())])
                batch = set_column(batch, nm, merged)
        if self.rename and self.copy_from is not None:
            moved = pa.array([bool(x) for x in names], pa.bool_())
            src_col = field_to_column(self.copy_from)
            cleared = pc.if_else(moved, pa.nulls(n, vals.type), vals)
            batch = set_column(batch, self.copy_from, cleared)
            if pc.all(pc.is_null(batch.column(src_col))).as_py():
                batch = batch.drop_columns([src_col])
        return batch


@register("fail")
class FailProcessor(Stage):
    """ES FailProcessor: abort the document with a message.  The row-model
    analogue is error-poisoning (error_message set -> remaining stages skip
    the row, it routes to the _rejects partition).  ``message`` may be a
    mustache template (cyberarkpas on_failure)."""

    name = "fail"

    def __init__(self, config=None):
        super().__init__(config)
        m = str(self.config.get("message", "Fail processor executed"))
        self.template = mustache_to_fmtstr(m) if "{{" in m else None
        self.message = m

    def process(self, batch: pa.Table) -> pa.Table:
        from ..event import set_error
        n = len(batch)
        if self.template is not None:
            rendered = pc.fill_null(self.template.render(batch), self.message)
            # set_error keeps first-error-wins; per-row messages need the
            # same guard manually
            from ..event import ERROR_COL, set_column
            cur = (batch.column(ERROR_COL) if ERROR_COL in batch.column_names
                   else pa.nulls(n, pa.string()))
            return set_column(batch, ERROR_COL,
                              pc.if_else(pc.is_null(cur), rendered, cur))
        return set_error(batch, pa.array([True] * n), self.message)


@register("dot_expander")
class DotExpander(Stage):
    """ES dot_expander turns literal-dot keys into nested objects; the flat
    column model already joins nested paths and literal dots identically
    (field_to_column), so this is the identity."""

    name = "dot_expander"

    def process(self, batch: pa.Table) -> pa.Table:
        return batch
