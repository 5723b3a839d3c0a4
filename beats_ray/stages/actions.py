"""Field-shape processors — pure Arrow column ops (SURVEY.md §2.4).

Each class replicates one libbeat/processors/actions/* processor's semantics
on the flattened column model: dot-paths become underscore column names,
"field exists" means "column exists", per-row failures set ``error_message``.
Because Arrow columns are table-wide, *structural* ops (rename/copy/drop)
act on whole columns; the reference's clone-and-rollback per event
(actions/rename.go Run) degenerates to all-or-nothing per batch for
structural failures (documented deviation — a batch shares one schema).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..event import (PROTECTED_COLS, TAGS_COL, TIMESTAMP_COL, add_tags,
                     field_to_column, set_column, set_error)
from .base import Stage, register


def _is_str(t):
    return pa.types.is_string(t) or pa.types.is_large_string(t)


@register("add_fields")
class AddFields(Stage):
    """Static map under ``target`` (default ``fields``); nested values flatten
    to ``target_key`` columns (actions/add_fields.go:28)."""

    name = "add_fields"

    def __init__(self, config=None):
        super().__init__(config)
        target = self.config.get("target", "fields")
        self.values = {}
        def flatten(prefix, d):
            for k, v in d.items():
                if isinstance(v, dict):
                    flatten(f"{prefix}{k}_", v)
                else:
                    self.values[f"{prefix}{k}"] = v
        flatten((target + "_") if target else "", self.config.get("fields", {}))

    def process(self, batch):
        n = len(batch)
        for name, v in self.values.items():
            col = field_to_column(name)
            arr = pa.array([v] * n)
            batch = set_column(batch, col, arr)
        return batch


@register("add_labels")
class AddLabels(AddFields):
    """add_fields with flattened keys under ``labels.`` (actions/add_labels.go:36)."""

    name = "add_labels"

    def __init__(self, config=None):
        config = dict(config or {})
        config["target"] = "labels"
        config["fields"] = config.pop("labels", config.pop("fields", {}))
        super().__init__(config)


@register("add_tags")
class AddTags(Stage):
    """Append+dedup into the ``tags`` list column (mapstr.AddTagsWithKey;
    actions/add_tags.go:38).  config: tags[], target (default "tags")."""

    name = "add_tags"

    def __init__(self, config=None):
        super().__init__(config)
        self.tags = list(self.config.get("tags", []))
        self.target = self.config.get("target", TAGS_COL)

    def process(self, batch):
        if self.target == TAGS_COL:
            return add_tags(batch, self.tags)
        n = len(batch)
        col = field_to_column(self.target)
        cur = batch.column(col).to_pylist() if col in batch.column_names else [None] * n
        out = []
        for tags in cur:
            if isinstance(tags, str):
                # AddTagsWithKey wraps a pre-existing scalar string as a
                # one-element list — list('abc') would shred it into chars
                tags = [tags]
            else:
                tags = list(tags) if tags else []
            for t in self.tags:
                if t not in tags:
                    tags.append(t)
            out.append(tags)
        return set_column(batch, col, pa.array(out, pa.list_(pa.string())))


@register("copy_fields")
class CopyFields(Stage):
    """{from,to} list; fails when target exists (actions/copy_fields.go:45 —
    no overwrite flag).  fail_on_error=True (default) -> raise;
    ignore_missing skips absent sources."""

    name = "copy_fields"

    def __init__(self, config=None):
        super().__init__(config)
        self.pairs = [(p["from"], p["to"]) for p in self.config.get("fields", [])]
        self.fail_on_error = bool(self.config.get("fail_on_error", True))
        self.ignore_missing = bool(self.config.get("ignore_missing", False))

    def process(self, batch):
        for src, dst in self.pairs:
            s, d = field_to_column(src), field_to_column(dst)
            if s not in batch.column_names:
                if self.ignore_missing:
                    continue
                if self.fail_on_error:
                    raise KeyError(f"copy_fields: source {src!r} missing")
                continue
            if d in batch.column_names:
                if self.fail_on_error:
                    raise KeyError(f"copy_fields: target {dst!r} already exists")
                continue
            batch = batch.append_column(d, batch.column(s))
        return batch


@register("rename")
class RenameFields(Stage):
    """{from,to} list; target must not exist; rollback on fail_on_error
    (actions/rename.go:51 Run)."""

    name = "rename"

    def __init__(self, config=None):
        super().__init__(config)
        self.pairs = [(p["from"], p["to"]) for p in self.config.get("fields", [])]
        self.fail_on_error = bool(self.config.get("fail_on_error", True))
        self.ignore_missing = bool(self.config.get("ignore_missing", False))
        self.move_subtrees = bool(self.config.get("move_subtrees", False))

    def process(self, batch):
        orig = batch
        for src, dst in self.pairs:
            s, d = field_to_column(src), field_to_column(dst)
            moved_subtree = False
            # Beats rename moves whole subtrees (mapstr map values).
            # In the flat column model `a_b` is ambiguous between the
            # literal key "a_b" and the nested path a.b (zeek kerberos
            # "cert.client_subject" vs "cert.client.subject"), so the
            # prefix move is opt-in: only froms the caller KNOWS are
            # map containers (e.g. the json decode target).  The prefix
            # move runs even when an exact column also exists — mixed
            # batches carry the map rows in `s_*` columns and list/scalar
            # rows in `s` itself (threatintel misp Attribute: [] vs {...}).
            # ... but a SCALAR exact column marks the path as a leaf value
            # (anomalithreatstream json.source string vs the separate
            # literal key source_feed_id) — no subtree there.
            exact_t = batch.column(s).type if s in batch.column_names else None
            leaf_scalar = exact_t is not None and not (
                pa.types.is_list(exact_t) or pa.types.is_large_list(exact_t)
                or pa.types.is_null(exact_t))
            if self.move_subtrees and not leaf_scalar:
                pref = s + "_"
                for c in [c for c in batch.column_names
                          if c.startswith(pref)]:
                    moved_subtree = True
                    nn = d + "_" + c[len(pref):]
                    if nn in batch.column_names:
                        # flat-name collision (misp Org.id vs org_id):
                        # fill only a null scaffold, else keep existing
                        if batch.column(nn).null_count == len(batch):
                            batch = batch.set_column(
                                batch.column_names.index(nn), nn,
                                batch.column(c))
                        batch = batch.drop_columns([c])
                        continue
                    idx = batch.column_names.index(c)
                    batch = batch.set_column(idx, nn, batch.column(c))
            if s not in batch.column_names:
                if moved_subtree or self.ignore_missing:
                    continue
                if self.fail_on_error:
                    return set_error(orig, pa.array([True] * len(orig)),
                                     f"could not fetch value for key: {src}")
                continue
            if d in batch.column_names:
                dc = batch.column(d).combine_chunks()
                if self.fail_on_error and dc.null_count < len(batch):
                    return set_error(orig, pa.array([True] * len(orig)),
                                     f"target field {dst} already exists, drop or rename this field first")
                # target-exists is per EVENT in beats; columnar per-row:
                # move where the target cell is null (utm source_zone vs
                # source_zone_name both renaming to observer.ingress.zone),
                # keep existing values elsewhere
                sc = batch.column(s).combine_chunks()
                if dc.null_count == len(batch):
                    merged, s_rest = sc, None
                else:
                    try:
                        if sc.type != dc.type and (
                                pa.types.is_list(dc.type)
                                or pa.types.is_large_list(dc.type)):
                            # target rows hold arrays (categorization
                            # lists): scalars wrap to 1-element lists like
                            # ES's schemaless per-doc values
                            sc2 = pa.array(
                                [None if v is None else [str(v)]
                                 for v in sc.to_pylist()], dc.type)
                        elif sc.type != dc.type:
                            sc2 = pc.cast(sc, dc.type)
                        else:
                            sc2 = sc
                        moved = pc.and_(pc.is_null(dc), pc.is_valid(sc2))
                        merged = pc.if_else(pc.is_valid(dc), dc, sc2)
                        s_rest = pc.if_else(moved,
                                            pa.nulls(len(batch), sc.type), sc)
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                            pa.ArrowTypeError):
                        # ES moves the value per-document regardless of
                        # type (audit: string ",SSS+0200" timestamp into a
                        # column date#1 already made timestamp-typed) —
                        # merge in string space rather than dropping the
                        # move; a later date/convert re-types the column
                        try:
                            dc2 = pc.cast(dc, pa.string())
                            sc2 = pc.cast(sc, pa.string())
                            moved = pc.and_(pc.is_null(dc2),
                                            pc.is_valid(sc2))
                            merged = pc.if_else(pc.is_valid(dc2), dc2, sc2)
                            s_rest = pc.if_else(
                                moved, pa.nulls(len(batch), sc.type), sc)
                        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                                pa.ArrowTypeError):
                            continue
                batch = batch.set_column(
                    batch.column_names.index(d), d, merged)
                if s_rest is None or s_rest.null_count == len(batch):
                    batch = batch.drop_columns([s])
                else:
                    batch = batch.set_column(
                        batch.column_names.index(s), s, s_rest)
                continue
            idx = batch.column_names.index(s)
            batch = batch.set_column(idx, d, batch.column(s))
        return batch


@register("replace")
class Replace(Stage):
    """Regex pattern->replacement per field (actions/replace.go:59; config
    :39-49: fields[{field,pattern,replacement}], ignore_missing, fail_on_error)."""

    name = "replace"

    def __init__(self, config=None):
        super().__init__(config)
        # Java regex escapes RE2/python lack: \e = ESC (azure gsub)
        self.rules = [(r["field"],
                       str(r["pattern"]).replace("\\e", "\\x1b"),
                       r.get("replacement", ""))
                      for r in self.config.get("fields", [])]
        self.ignore_missing = bool(self.config.get("ignore_missing", False))
        self.fail_on_error = bool(self.config.get("fail_on_error", True))

    def process(self, batch):
        for f, pat, rep in self.rules:
            col = field_to_column(f)
            if col not in batch.column_names:
                if self.ignore_missing:
                    continue
                if self.fail_on_error:
                    return set_error(batch, pa.array([True] * len(batch)),
                                     f"could not fetch value for key: {f}")
                continue
            c = batch.column(col)
            if pa.types.is_null(c.type):
                continue
            import re as _re
            pc_rep = _re.sub(r"\$(\d+)", r"\\\1", rep)  # Java $N -> \N
            try:
                vals = pc.replace_substring_regex(c, pat, replacement=pc_rep)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                # RE2 lacks lookarounds (sophos MAC gsub '(..)(?!$)') —
                # python-re fallback
                rx = _re.compile(pat)
                vals = pa.array(
                    [None if v is None else rx.sub(pc_rep, v)
                     for v in pc.cast(c, pa.string()).to_pylist()],
                    pa.string())
            batch = set_column(batch, col, vals)
        return batch


@register("truncate_fields")
class TruncateFields(Stage):
    """Cap max_characters (or max_bytes on the UTF-8 encoding) per field
    (actions/truncate_fields.go:53; config :36-42)."""

    name = "truncate_fields"

    def __init__(self, config=None):
        super().__init__(config)
        self.fields = list(self.config.get("fields", []))
        self.max_chars = self.config.get("max_characters")
        self.max_bytes = self.config.get("max_bytes")
        self.ignore_missing = bool(self.config.get("ignore_missing", False))

    def process(self, batch):
        for f in self.fields:
            col = field_to_column(f)
            if col not in batch.column_names:
                if not self.ignore_missing:
                    raise KeyError(f"truncate_fields: {f} missing")
                continue
            v = batch.column(col)
            if self.max_chars is not None:
                v = pc.utf8_slice_codeunits(v, 0, self.max_chars)
            elif self.max_bytes is not None:
                b = pc.cast(v, pa.large_binary() if pa.types.is_large_string(v.type) else pa.binary())
                b = pc.binary_slice(b, 0, self.max_bytes)
                # note: may cut a UTF-8 sequence; reference truncates bytes too
                v = pc.cast(b, v.type)
            batch = set_column(batch, col, v)
        return batch


@register("lowercase")
class Lowercase(Stage):
    """Case-fold FIELD NAMES (and values with alter_full_field semantics kept
    simple: values when ``values: true``) — alterFieldProcessor.go:43."""

    name = "lowercase"
    _fn = staticmethod(str.lower)
    _pcfn = staticmethod(pc.utf8_lower)

    def __init__(self, config=None):
        super().__init__(config)
        self.fields = list(self.config.get("fields", []))
        self.values = list(self.config.get("values", []))
        self.ignore_missing = bool(self.config.get("ignore_missing", False))
        self.fail_on_error = bool(self.config.get("fail_on_error", True))

    def process(self, batch):
        fn = type(self)._fn
        for f in self.fields:
            col = field_to_column(f)
            if col in batch.column_names:
                folded = fn(col)
                if folded != col and folded in batch.column_names:
                    # folded name already occupied: the reference overwrites
                    # the existing key; renaming in place would leave the
                    # schema with the same name twice and break every later
                    # batch.column(name) lookup
                    src_col = batch.column(col)
                    batch = batch.drop_columns([folded])
                    idx = batch.column_names.index(col)
                    batch = batch.set_column(idx, folded, src_col)
                else:
                    idx = batch.column_names.index(col)
                    batch = batch.set_column(idx, folded, batch.column(col))
            elif not self.ignore_missing and self.fail_on_error:
                return set_error(batch, pa.array([True] * len(batch)),
                                 f"could not fetch value for key: {f}")
        for f in self.values:
            col = field_to_column(f)
            if col in batch.column_names and _is_str(batch.column(col).type):
                batch = set_column(batch, col, type(self)._pcfn(batch.column(col)))
            elif col in batch.column_names and (
                    pa.types.is_list(batch.column(col).type)
                    or pa.types.is_large_list(batch.column(col).type)):
                # schemaless per-doc arrays (auditd event.action holds a
                # categorization list on some rows): fold the elements
                c = batch.column(col).combine_chunks()
                if _is_str(c.type.value_type):
                    flat = type(self)._pcfn(c.values)
                    out = pa.ListArray.from_arrays(c.offsets, flat)
                    if c.null_count:
                        out = pc.if_else(pc.is_valid(c), out,
                                         pa.nulls(len(c), out.type))
                    batch = set_column(batch, col, out)
            elif col not in batch.column_names and not self.ignore_missing and self.fail_on_error:
                return set_error(batch, pa.array([True] * len(batch)),
                                 f"could not fetch value for key: {f}")
        return batch


@register("uppercase")
class Uppercase(Lowercase):
    name = "uppercase"
    _fn = staticmethod(str.upper)
    _pcfn = staticmethod(pc.utf8_upper)


@register("drop_fields")
class DropFields(Stage):
    """Delete field list; ``@timestamp``/``type`` protected
    (actions/drop_fields.go:50)."""

    name = "drop_fields"

    def __init__(self, config=None):
        super().__init__(config)
        self.fields = list(self.config.get("fields", []))
        self.ignore_missing = bool(self.config.get("ignore_missing", True))
        # ES `remove` of a MAP field deletes the whole subtree; flat-model
        # prefix drop is opt-in (same literal-underscore-key ambiguity as
        # rename move_subtrees) — the ingest compiler sets it, Beats-config
        # drop_fields keeps leaf-only semantics
        self.drop_subtrees = bool(self.config.get("drop_subtrees", False))

    def process(self, batch):
        names = []
        for f in self.fields:
            c = field_to_column(f)
            if c in PROTECTED_COLS:
                continue
            hit = False
            if c in batch.column_names:
                names.append(c)
                hit = True
            if self.drop_subtrees and "." not in str(f):
                # subtree drop ONLY for single-segment fields ("zoom",
                # "_temp_", "json" — container lifts): a multi-segment
                # remove like abusech.url.url is a LEAF whose flat-named
                # siblings (abusech.url.url_status) must survive
                exact_t = batch.column(c).type if hit else None
                leaf_scalar = exact_t is not None and not (
                    pa.types.is_list(exact_t)
                    or pa.types.is_large_list(exact_t)
                    or pa.types.is_null(exact_t))
                if not leaf_scalar:
                    pref = c + "_"
                    subs = [n for n in batch.column_names
                            if n.startswith(pref)
                            and n not in PROTECTED_COLS]
                    names.extend(subs)
                    hit = hit or bool(subs)
            if not hit and not self.ignore_missing:
                raise KeyError(f"drop_fields: {f} missing")
        # duplicate entries (juniper srx lists a field twice) shift arrow's
        # column indices and delete a NEIGHBOUR column — dedupe first
        names = list(dict.fromkeys(names))
        return batch.drop_columns(names) if names else batch


@register("include_fields")
class IncludeFields(Stage):
    """Keep-only list; ``@timestamp`` and ``type`` always kept
    (actions/include_fields.go:38).  Engine-internal columns (error/flags/
    meta_*) are also retained so later stages keep working."""

    name = "include_fields"

    def __init__(self, config=None):
        super().__init__(config)
        self.fields = [field_to_column(f) for f in self.config.get("fields", [])]

    def process(self, batch):
        from ..event import ERROR_COL, FLAGS_COL, META_PREFIX
        keep = set(self.fields) | PROTECTED_COLS | {ERROR_COL, FLAGS_COL, TAGS_COL}
        cols = [c for c in batch.column_names
                if c in keep or c.startswith(META_PREFIX)]
        return batch.select(cols)


@register("extract_field")
class ExtractField(Stage):
    """Split ``field`` by ``separator``, take ``index`` -> ``target``
    (actions/extract_field.go:41)."""

    name = "extract_field"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config["field"]
        self.sep = self.config["separator"]
        self.index = int(self.config["index"])
        self.target = self.config["target"]

    def process(self, batch):
        col = batch.column(field_to_column(self.field))
        parts = pc.split_pattern(col, self.sep)
        lens = pc.list_value_length(parts)
        ok = pc.greater(lens, self.index)
        # list_element raises on out-of-bounds lists; mask short lists first
        padded = [v[self.index] if v is not None and len(v) > self.index else None
                  for v in parts.to_pylist()]
        vals = pa.array(padded, pa.string())
        batch = set_column(batch, field_to_column(self.target), vals)
        bad = pc.fill_null(pc.invert(ok), True)
        if (pc.sum(bad).as_py() or 0) > 0:
            batch = set_error(batch, bad, f"index is out of range in field {self.field}")
        return batch


@register("extract_array")
class ExtractArray(Stage):
    """Map array positions to named fields (extract_array/extract_array.go:63;
    config :36-43: field, mappings{name:idx}, fail_on_error, omit_empty)."""

    name = "extract_array"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config["field"]
        self.mappings = dict(self.config.get("mappings", {}))
        self.fail_on_error = bool(self.config.get("fail_on_error", True))
        # extract_array.go omitEmpty: an empty string at the index leaves
        # the target unset (panw's sparse CSV columns depend on this)
        self.omit_empty = bool(self.config.get("omit_empty", False))

    def process(self, batch):
        col = batch.column(field_to_column(self.field))
        rows = col.to_pylist()
        err = [False] * len(rows)
        outs = {t: [] for t in self.mappings}
        for i, v in enumerate(rows):
            for tgt, idx in self.mappings.items():
                if v is not None and len(v) > idx:
                    val = v[idx]
                    if self.omit_empty and val == "":
                        val = None
                    outs[tgt].append(val)
                else:
                    outs[tgt].append(None)
                    err[i] = True
        for tgt, vals in outs.items():
            batch = set_column(batch, field_to_column(tgt), pa.array(vals))
        if self.fail_on_error and any(err):
            batch = set_error(batch, pa.array(err), f"index out of range in field {self.field}")
        return batch


@register("move_fields")
class MoveFields(Stage):
    """Re-parent keys by prefix (move_fields/move_fields.go:34): config
    from (prefix), fields[], to (new prefix)."""

    name = "move_fields"

    def __init__(self, config=None):
        super().__init__(config)
        self.frm = field_to_column(self.config.get("from", "")) if self.config.get("from") else ""
        self.fields = list(self.config.get("fields", []))
        self.to = self.config.get("to", "")

    def process(self, batch):
        to_prefix = self.to.replace(".", "_")
        renames = {}
        if self.fields:
            for f in self.fields:
                src = (self.frm + "_" if self.frm else "") + field_to_column(f)
                if src in batch.column_names:
                    renames[src] = to_prefix + field_to_column(f)
        else:
            pref = self.frm + "_"
            for c in batch.column_names:
                if c.startswith(pref):
                    renames[c] = to_prefix + c[len(pref):]
        if not renames:
            return batch
        return batch.rename_columns([renames.get(c, c) for c in batch.column_names])


@register("drop_event")
class DropEvent(Stage):
    """Unconditional drop — always used with ``when:``
    (actions/drop_event.go:31)."""

    name = "drop_event"
    may_drop = True

    def process(self, batch):
        return batch.slice(0, 0)
