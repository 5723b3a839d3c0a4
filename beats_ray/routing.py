"""Output routing — the Beats selector engine as a vectorized column compute.

Replicates ``outil.Selector`` (libbeat/outputs/outil/select.go:32-60, Select
:87, built from config :107-163): an ordered rule list, each either a constant
or a format string ``%{[field]}`` with optional default, optionally guarded by
a ``when:`` condition; **first non-empty match wins**; optional lowercasing;
final ``default`` fallback.  This is the whole multi-output fan-out semantics:
``route(event) -> sink string`` (SURVEY.md §2.2) — Beats runs exactly one
output type per instance and fans out *within* it via this selector
(pipeline.go:169).

Vectorized: each rule renders a candidate column + a boolean applicability
mask; a single coalesce pass fills still-unrouted rows in rule order.

Rule config shape (mirrors ``indices:`` / ``topics:`` lists,
idxmgmt/index_support.go:165-202):

    {"index": "errors", "when": {...}}            # constant, guarded
    {"index": "tool-%{[tool]}", "default": "x"}   # format string w/ fallback
    ...
    plus a selector-level {"default": "catchall", "lowercase": True}
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .conditions import compile_condition
from .event import set_column
from .fmtstr import FormatString
from .stages.base import Stage, register


class Selector:
    def __init__(self, rules: list[dict], default: str | None = None,
                 lowercase: bool = False, key: str = "index"):
        self.rules = []
        for r in rules:
            fmt = FormatString(str(r[key]))
            cond = compile_condition(r.get("when"))
            self.rules.append((fmt, cond, r.get("default")))
        self.default = default
        self.lowercase = lowercase

    def select(self, batch: pa.Table):
        """-> StringArray of sink names (null only when no default is set)."""
        n = len(batch)
        acc = pa.array([None] * n, pa.string())
        for fmt, cond, rule_default in self.rules:
            unrouted = pc.is_null(acc)
            if (pc.sum(unrouted).as_py() or 0) == 0:
                break
            cand = fmt.render(batch)
            # select.go fmtSelector.sel: a FAILED or EMPTY render both fall
            # back to the rule's own default ('otherwise'); only without a
            # rule default does an empty render mean non-match
            empty = pc.equal(pc.fill_null(cand, ""), "")
            cand = pc.if_else(
                empty,
                pa.scalar(rule_default, pa.string()) if rule_default
                else pa.scalar(None, pa.string()),
                cand)
            applicable = pc.and_(pc.fill_null(cond.mask(batch), False), unrouted)
            acc = pc.if_else(applicable, cand, acc)
        if self.default is not None:
            acc = pc.fill_null(acc, self.default)
        if self.lowercase:
            acc = pc.utf8_lower(acc)
        return acc


@register("route")
class RouteStage(Stage):
    """Stage wrapper: compute the ``sink`` column (and optional ``index``)
    from a selector config.  config: {rules: [...], default, lowercase,
    target: "sink"}."""

    name = "route"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        key = c.get("key", "index")
        self.selector = Selector(c.get("rules", []), c.get("default"),
                                 bool(c.get("lowercase", False)), key=key)
        self.target = c.get("target", "sink")

    def process(self, batch):
        return set_column(batch, self.target, self.selector.select(batch))
