"""Event format strings — ``%{[field.path]}`` with optional ``:default``.

Replicates libbeat/common/fmtstr/formatevents.go:39-44 (EventFormatString):
a format string renders per event by splicing field values into literals;
a missing field with no default fails the render (the selector treats a
failed render as a non-match, outil/select.go).  Vectorized: one
``pc.binary_join_element_wise`` over the batch; a null field value with no
default yields a null result for that row.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from .event import field_to_column

_TOKEN = re.compile(r"%\{\[([^]}]+)](?::([^}]*))?\}")


class FormatString:
    #: when True, substituted field VALUES are JSON-escaped (backslash,
    #: quote) like ES ingest's mustache JsonEscapeEncoder — literal text
    #: is never escaped (zeek smb_files file.path golden)
    json_escape = False
    #: fields exempted from json_escape — mustache escaping is PER TOKEN:
    #: a {{{triple}}} in a template that also has {{double}} stays raw
    no_escape_fields: frozenset = frozenset()

    def __init__(self, fmt: str):
        self.raw = fmt
        self.parts: list[tuple[str, str | None, str | None]] = []  # (literal, field, default)
        pos = 0
        for m in _TOKEN.finditer(fmt):
            self.parts.append((fmt[pos:m.start()], m.group(1), m.group(2)))
            pos = m.end()
        self.tail = fmt[pos:]
        self.is_const = not self.parts

    def fields(self) -> list[str]:
        return [f for _, f, _ in self.parts if f]

    def render(self, batch: pa.Table):
        """-> StringArray; null rows = failed render (missing field, no default)."""
        n = len(batch)
        if self.is_const:
            return pa.array([self.raw] * n, pa.string())
        cols = []
        for lit, field, default in self.parts:
            cols.append(pa.array([lit] * n, pa.string()))
            col_name = field_to_column(field)
            if col_name in batch.column_names:
                col = batch.column(col_name)
                if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                    # ES mustache renders a Java List via ArrayMap.toString:
                    # "{0=a, 1=b}" (zeek dhcp event.id golden)
                    col = pa.array(
                        [None if v is None else
                         "{" + ", ".join(f"{i}={x}" for i, x in enumerate(v)) + "}"
                         for v in col.to_pylist()], pa.string())
                elif not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
                    col = pc.cast(col, pa.string())
                elif pa.types.is_large_string(col.type):
                    col = pc.cast(col, pa.string())
                if self.json_escape and field not in self.no_escape_fields:
                    col = pc.replace_substring(col, "\\", "\\\\")
                    col = pc.replace_substring(col, '"', '\\"')
                    # ES's JsonStringEncoder escapes control chars too — a
                    # value holding a newline must render as \n or the
                    # emitted JSON string breaks a downstream json decode
                    col = pc.replace_substring(col, "\n", "\\n")
                    col = pc.replace_substring(col, "\r", "\\r")
                    col = pc.replace_substring(col, "\t", "\\t")
                if default is not None:
                    col = pc.fill_null(col, default)
            else:
                col = pa.array([default] * n, pa.string())
            cols.append(col)
        cols.append(pa.array([self.tail] * n, pa.string()))
        # emit_null: any null component -> null row (failed render)
        return pc.binary_join_element_wise(*cols, "", null_handling="emit_null")
