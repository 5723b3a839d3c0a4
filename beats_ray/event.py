"""Column-model conventions for the Ray-Data rebuild of the Beats event.

The reference's event is a dynamic nested map with two privileged fields
(``@timestamp`` -> ``Event.Timestamp``, ``@metadata`` -> ``Event.Meta``;
libbeat/beat/event.go:52-62).  Here a *Dataset block is a pyarrow.Table*
with a fixed schema plus stage-added columns; dot-paths flatten to
underscore-joined column names (SURVEY.md §1.3):

- ``ts``            -- the privileged timestamp (``@timestamp``); never dropped.
- ``meta_*``        -- ``@metadata.*`` routing hints (``meta_id``, ``meta_sink``,
                       ``meta_raw_index``); carried to the sink stage, dropped
                       before write.
- ``tags``          -- ``list<string>`` with dedup-append semantics
                       (mapstr.AddTagsWithKey).
- ``error_message`` -- per-row processor failure (libbeat sets ``error.message``,
                       e.g. libbeat/processors/actions/rename.go Run).  A non-null
                       value "poisons" the row: remaining stages skip it, matching
                       Beats' per-event chain abort (processor.go:195-208).
- ``log_flags``     -- ``list<string>`` of failure flags (``beat.FlagField``,
                       libbeat/beat/event.go:38; dissect appends
                       ``dissect_parsing_error``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TIMESTAMP_COL = "ts"
META_PREFIX = "meta_"
TAGS_COL = "tags"
ERROR_COL = "error_message"
FLAGS_COL = "log_flags"

# Columns a drop_fields processor may never delete (actions/drop_fields.go:50
# protects "@timestamp" and "type").
PROTECTED_COLS = frozenset({TIMESTAMP_COL, "type"})


import functools


@functools.lru_cache(maxsize=65536)
def field_to_column(path: str) -> str:
    """Flatten a Beats dot-path to a flat column name.

    ``@timestamp`` -> ``ts``; ``@metadata.x`` -> ``meta_x``; ``a.b.c`` -> ``a_b_c``.

    Cached: a pure string map called per Get/Put in the script interpreter
    and per field in every stage — the same few hundred paths repeat
    millions of times per run.
    """
    if path == "@timestamp":
        return TIMESTAMP_COL
    if path == "@metadata":
        return "meta"
    if path.startswith("@metadata."):
        rest = path[len("@metadata."):].replace(".", "_")
        # canonical form: "@metadata._id" -> "meta_id" (single underscore)
        return META_PREFIX + rest.lstrip("_")
    return path.replace(".", "_")


def get_column(batch: pa.Table, path: str):
    """Column for a dot-path, or None when absent (Beats GetValue miss)."""
    name = field_to_column(path)
    if name in batch.column_names:
        return batch.column(name)
    return None


def set_column(batch: pa.Table, path: str, values) -> pa.Table:
    """Create-or-replace a column (Beats PutValue creates intermediates)."""
    name = field_to_column(path)
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, values)
    return batch.append_column(name, values)


def drop_columns(batch: pa.Table, paths, protect: bool = True) -> pa.Table:
    names = []
    for p in paths:
        n = field_to_column(p)
        if protect and n in PROTECTED_COLS:
            continue
        if n in batch.column_names:
            names.append(n)
    return batch.drop_columns(names) if names else batch


def all_null(batch_len: int, typ: pa.DataType = pa.string()) -> pa.Array:
    return pa.nulls(batch_len, typ)


def not_poisoned(batch: pa.Table):
    """Boolean mask of rows that have not failed a prior stage.

    Beats aborts the remaining chain for an errored event but keeps the
    event (with ``error.message``); the vectorized analogue is to exclude
    poisoned rows from every later stage's effective mask (SURVEY.md §7.3).
    """
    if ERROR_COL not in batch.column_names:
        return pa.array([True] * len(batch), pa.bool_())
    return pc.is_null(batch.column(ERROR_COL))


def set_error(batch: pa.Table, mask, message: str) -> pa.Table:
    """Set ``error_message`` for rows selected by mask (keeps existing errors)."""
    n = len(batch)
    if ERROR_COL in batch.column_names:
        cur = batch.column(ERROR_COL)
    else:
        cur = pa.nulls(n, pa.string())
    mask = pa.chunked_array([mask]) if isinstance(mask, pa.Array) else mask
    new = pc.if_else(pc.and_kleene(mask, pc.is_null(cur)),
                     pa.scalar(message, pa.string()), cur)
    return set_column(batch, ERROR_COL, new)


def add_flag(batch: pa.Table, mask, flag: str) -> pa.Table:
    """Append a flag into ``log_flags`` for rows selected by mask."""
    n = len(batch)
    mask_py = mask.to_pylist() if not isinstance(mask, list) else mask
    if FLAGS_COL in batch.column_names:
        cur = batch.column(FLAGS_COL).to_pylist()
    else:
        cur = [None] * n
    out = []
    for m, flags in zip(mask_py, cur):
        if m:
            flags = list(flags) if flags else []
            if flag not in flags:
                flags.append(flag)
        out.append(flags)
    return set_column(batch, FLAGS_COL, pa.array(out, pa.list_(pa.string())))


def add_tags(batch: pa.Table, tags_to_add, mask=None) -> pa.Table:
    """Dedup-append tags (mapstr.AddTagsWithKey semantics).

    Fast path (no pre-existing tags): one vectorized if_else.  Rows that
    already carry tags need per-row dedup-append (Python, rare)."""
    n = len(batch)
    typ = pa.list_(pa.string())
    existing = batch.column(TAGS_COL) if TAGS_COL in batch.column_names else None
    if mask is None:
        mask = pa.array([True] * n, pa.bool_())
    if existing is None or (pc.sum(pc.is_valid(existing)).as_py() or 0) == 0:
        new = pc.if_else(mask, pa.scalar(list(tags_to_add), typ), pa.scalar(None, typ))
        return set_column(batch, TAGS_COL, new)
    cur = existing.to_pylist()
    out = []
    for m, tags in zip(mask.to_pylist(), cur):
        if m:
            tags = list(tags) if tags else []
            for t in tags_to_add:
                if t not in tags:
                    tags.append(t)
        out.append(tags)
    return set_column(batch, TAGS_COL, pa.array(out, typ))


def _merge_type(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Recursive type union for branch concat: null slots promote to the
    other side's type at ANY nesting depth (o365 DLP PolicyDetails: one
    branch's ActionParameters is all-null -> null type, the other's is
    list<string>; the merged struct must carry list<string>).  Genuinely
    conflicting scalars keep the first-seen type."""
    if a == b:
        return a
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    if (pa.types.is_list(a) or pa.types.is_large_list(a)) and \
            (pa.types.is_list(b) or pa.types.is_large_list(b)):
        return pa.list_(_merge_type(a.value_type, b.value_type))
    if pa.types.is_struct(a) and pa.types.is_struct(b):
        names, fields = [], {}
        for f in a:
            names.append(f.name)
            fields[f.name] = f.type
        for f in b:
            if f.name in fields:
                fields[f.name] = _merge_type(fields[f.name], f.type)
            else:
                names.append(f.name)
                fields[f.name] = f.type
        return pa.struct([(nm, fields[nm]) for nm in names])
    return a


def unify_concat(parts: list[pa.Table]) -> pa.Table:
    """Concat tables whose schemas may differ by stage-added columns.

    Missing columns are filled with nulls of the other side's type.
    """
    parts = [p for p in parts if p is not None and len(p) > 0]
    if not parts:
        raise ValueError("no non-empty parts")
    if len(parts) == 1:
        return parts[0]
    # build the union schema, first-seen order, first-seen type wins
    fields: dict[str, pa.DataType] = {}
    for t in parts:
        for f in t.schema:
            if f.name not in fields:
                fields[f.name] = f.type
            elif fields[f.name] != f.type:
                if pa.types.is_null(fields[f.name]):
                    fields[f.name] = f.type
                elif (pa.types.is_list(f.type)
                      or pa.types.is_large_list(f.type)) and \
                        not pa.types.is_nested(fields[f.name]):
                    # scalar-vs-array split across branches (a masked
                    # stage appended into a list on some rows): the union
                    # type is the list, scalars wrap below
                    fields[f.name] = f.type
                else:
                    # nested null-slot promotion at any depth (_merge_type)
                    fields[f.name] = _merge_type(fields[f.name], f.type)
    aligned = []
    for t in parts:
        cols = []
        for name, typ in fields.items():
            if name in t.column_names:
                col = t.column(name)
                if col.type != typ and not pa.types.is_null(typ):
                    if (pa.types.is_list(typ)
                            or pa.types.is_large_list(typ)) and \
                            not pa.types.is_nested(col.type):
                        col = pa.array(
                            [None if v is None else [v] for v in
                             pc.cast(col, typ.value_type).to_pylist()], typ)
                    else:
                        try:
                            col = pc.cast(col, typ)
                        except (pa.ArrowInvalid,
                                pa.ArrowNotImplementedError,
                                pa.ArrowTypeError):
                            # deep-nested promotion Arrow can't cast
                            # directly (struct field-set growth): rebuild
                            # through python values — branch-split batches
                            # are small by construction
                            col = pa.array(col.to_pylist(), typ)
                cols.append(col)
            else:
                cols.append(pa.nulls(len(t), typ))
        aligned.append(pa.table(cols, names=list(fields)))
    return pa.concat_tables(aligned)
