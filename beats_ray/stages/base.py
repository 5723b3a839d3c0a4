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


class Stage:
    """Base batch transform.  Subclasses set ``stateful=True`` when they hold
    per-worker state that must be built once per actor, and ``may_drop=True``
    when ``process`` can remove rows."""

    stateful = False
    may_drop = False
    name = "stage"

    def __init__(self, config: dict | None = None):
        self.config = dict(config or {})
        self.when: Condition = compile_condition(self.config.pop("when", None))

    def setup(self):
        """Per-worker initialisation (actor ``__init__`` time for stateful
        stages; no-op for stateless)."""

    def process(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError

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
        hot = self.process(batch.filter(mask))
        cold = batch.filter(pc.invert(mask))
        if len(hot) == 0:
            return cold
        return unify_concat([hot, cold])


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
