"""Stage protocol + registry for the processor chain.

Reference model: ``Run(*beat.Event) (*beat.Event, error)`` chained serially,
``nil`` event = drop (libbeat/processors/processor.go:195-208); global registry
``RegisterPlugin`` (libbeat/processors/registry.go).  Here a *stage* transforms
a whole ``pyarrow.Table`` batch; drops become boolean-mask filters; per-row
errors set the ``error_message`` column instead of aborting the batch
(SURVEY.md §1.3).

Two kinds (SURVEY.md §7.2):

- **stateless** -- pure ``process(batch) -> batch``; consecutive stateless
  stages are fused into one ``map_batches`` call by the pipeline compiler.
- **stateful**  -- carries per-worker state (broadcast dict, cache, interpreter);
  the compiler runs these as an actor-pool ``map_batches(Cls, concurrency=N)``
  with state built once per actor in ``__init__``.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

from ..conditions import Condition, compile_condition
from ..event import not_poisoned, unify_concat

import pyarrow.compute as pc

_REGISTRY: dict[str, Callable] = {}


def register(name: str):
    """Register a stage factory under its Beats YAML key
    (analogue of processors.RegisterPlugin, libbeat/processors/registry.go)."""
    def deco(factory):
        _REGISTRY[name] = factory
        return factory
    return deco


def stage_factory(name: str) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(f"unknown processor {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def registered_stages() -> list[str]:
    return sorted(_REGISTRY)


def _same_data(a, b) -> bool:
    """True when two (chunked) arrays share the exact same buffers — i.e. a
    column passed through a stage untouched.  O(#chunks), no data reads."""
    ca = a.chunks if isinstance(a, pa.ChunkedArray) else [a]
    cb = b.chunks if isinstance(b, pa.ChunkedArray) else [b]
    if len(ca) != len(cb):
        return False
    for x, y in zip(ca, cb):
        bx, by = x.buffers(), y.buffers()
        if len(bx) != len(by):
            return False
        for u, v in zip(bx, by):
            if (u is None) != (v is None) or (u is not None and u.address != v.address):
                return False
    return True


class Stage:
    """Base batch transform.  Subclasses set ``stateful=True`` when they hold
    per-worker state that must be built once per actor, and ``may_drop=True``
    when ``process`` can remove rows."""

    stateful = False
    may_drop = False
    name = "stage"

    def __init__(self, config: dict | None = None):
        self.config = dict(config or {})
        when = self.config.pop("when", None)
        # Beats YAML dotted flattening: `when.equals.network.transport: icmp`
        # arrives as a flat config key (zeek connection config)
        for k in [k for k in self.config if k.startswith("when.")]:
            v = self.config.pop(k)
            when = {k[len("when."):]: v} if when is None \
                else {"and": [when, {k[len("when."):]: v}]}
        self.when: Condition = compile_condition(when)

    def setup(self):
        """Per-worker initialisation (actor ``__init__`` time for stateful
        stages; no-op for stateless)."""

    def process(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError

    def input_columns(self) -> list[str] | None:
        """Columns ``process`` reads (None = unknown/all).  Declaring them
        lets the conditional wrapper ship only those columns through the
        masked path — the rest of the batch is never copied."""
        return None

    # -- conditional application ------------------------------------------
    def apply(self, batch: pa.Table) -> pa.Table:
        """Run the stage honouring ``when:`` and poisoned-row semantics.

        Beats wraps every processor in WhenProcessor (conditionals.go:59) and
        aborts the chain per errored event; vectorized: split the batch on
        (when-mask AND not-poisoned), process the hot part, null-fill + concat.
        Row order within a batch is NOT preserved for partially-masked batches
        (ordering is re-established by the final (conv_id, turn_idx) sort).
        """
        if len(batch) == 0:
            return batch
        mask = pc.and_(pc.fill_null(self.when.mask(batch), False),
                       not_poisoned(batch))
        t = pc.sum(mask).as_py() or 0
        if t == 0:
            return batch
        if t == len(batch):
            return self.process(batch)
        if not self.may_drop:
            out = self._apply_scatter(batch, mask, t)
            if out is not None:
                return out
        hot = self.process(batch.filter(mask))
        cold = batch.filter(pc.invert(mask))
        if len(hot) == 0:
            return cold
        return unify_concat([hot, cold])

    def _apply_scatter(self, batch: pa.Table, mask, t: int):
        """Masked path without full-batch copies: run the stage on only its
        input columns for the selected rows, then scatter produced/modified
        columns back with ``replace_with_mask``.  Preserves row order and
        never copies untouched columns.  Returns None when not applicable
        (stage dropped rows, unknown inputs with wide schema, type clash)."""
        needed = self.input_columns()
        n = len(batch)
        cols = batch.column_names if needed is None else \
            [c for c in needed if c in batch.column_names]
        sub = batch.select(cols).filter(mask)
        out = self.process(sub)
        if len(out) != t:
            return None  # stage dropped/duplicated rows; fall back
        if any(c not in out.column_names for c in cols):
            return None  # stage dropped columns; per-row drop needs fallback
        mask = mask.combine_chunks() if isinstance(mask, pa.ChunkedArray) else mask
        from ..event import set_column
        result = batch
        try:
            for name in out.column_names:
                if name in cols and _same_data(out.column(name), sub.column(name)):
                    continue  # pass-through input column, untouched by stage
                new = out.column(name).combine_chunks()
                if pa.types.is_nested(new.type):
                    # replace_with_mask on list/struct arrays can abort in
                    # Arrow C++ (DCHECK), not raise — take the filter+concat
                    # fallback for nested outputs
                    return None
                if pa.types.is_null(new.type):
                    # all-null output column from the masked subset: rows
                    # OUTSIDE the mask must keep their existing values, so
                    # only shortcut when the column doesn't exist (or is
                    # itself null-typed); otherwise scatter typed nulls.
                    if name not in result.column_names or \
                            pa.types.is_null(result.column(name).type):
                        result = set_column(result, name, pa.nulls(n))
                        continue
                    orig = result.column(name).combine_chunks()
                    if pa.types.is_nested(orig.type):
                        return None  # replace_with_mask aborts on nested
                    merged = pc.replace_with_mask(
                        orig, mask, pc.cast(new, orig.type))
                    result = set_column(result, name, merged)
                    continue
                if name in result.column_names:
                    orig = result.column(name).combine_chunks()
                    if orig.type != new.type:
                        # when every row OUTSIDE the mask is null, the
                        # stage's output type is the column's real type
                        # (in-place date over a conditioned int column —
                        # cisco amp incident_end_time); otherwise keep the
                        # original type so untouched values survive
                        outside = orig.filter(pc.invert(mask))
                        if len(outside) == outside.null_count:
                            orig = pa.nulls(n, new.type)
                        elif pa.types.is_timestamp(new.type) != \
                                pa.types.is_timestamp(orig.type):
                            # timestamp<->numeric casts are value-mangling
                            # (an in-place date converting only SOME rows —
                            # crowdstrike digit-count dispatch — must not
                            # turn datetimes into µs ints): let the
                            # filter+concat fallback unify per-row
                            return None
                        else:
                            try:
                                new = pc.cast(new, orig.type)
                            except (pa.ArrowInvalid,
                                    pa.ArrowNotImplementedError,
                                    pa.ArrowTypeError):
                                orig = pc.cast(orig, new.type)
                    merged = pc.replace_with_mask(orig, mask, new)
                else:
                    merged = pc.replace_with_mask(pa.nulls(n, new.type), mask, new)
                result = set_column(result, name, merged)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                pa.ArrowTypeError):
            return None
        return result


class FnStage(Stage):
    """Adapter: plain ``fn(batch)->batch`` as a stage (user-extension surface;
    analogue of the Go plugin/script registration in SURVEY.md §2.8)."""

    def __init__(self, fn, config=None, name="udf", may_drop=False):
        super().__init__(config)
        self.fn = fn
        self.name = name
        self.may_drop = may_drop

    def process(self, batch):
        return self.fn(batch)
