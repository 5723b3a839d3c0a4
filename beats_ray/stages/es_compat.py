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

import pyarrow as pa
import pyarrow.compute as pc

from ..event import field_to_column, get_column, set_column
from .base import Stage, register


@register("set")
class SetField(Stage):
    """config: field, value | copy_from, override=True, ignore_empty_value."""

    name = "set"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        self.field = c["field"]
        self.value = c.get("value")
        self.copy_from = c.get("copy_from")
        self.override = bool(c.get("override", True))
        self.ignore_empty = bool(c.get("ignore_empty_value", False))

    def process(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if self.copy_from is not None:
            src = get_column(batch, self.copy_from)
            if src is None:
                return batch
            new = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
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
        elif self.value_from is not None:
            src = get_column(batch, self.value_from)
            if src is None:
                return batch
            adds = [[] if v is None else [v] for v in src.to_pylist()]
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


@register("dot_expander")
class DotExpander(Stage):
    """ES dot_expander turns literal-dot keys into nested objects; the flat
    column model already joins nested paths and literal dots identically
    (field_to_column), so this is the identity."""

    name = "dot_expander"

    def process(self, batch: pa.Table) -> pa.Table:
        return batch
