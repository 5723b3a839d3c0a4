"""Pipeline spec -> compiled chain of fused Arrow batch stages -> Ray Dataset.

Mirrors the reference's config surface (SURVEY.md §2.7): a YAML/dict spec in
Beats' ``processors:`` shape — each entry exactly one action keyed by its
registered name (processors/processor.go:100-148), ``when:`` wrappers
(conditionals.go:160), ``if/then/else`` compounds (conditionals.go:189, Run
:261-268) — plus an optional ``route:`` selector (§2.2) section.

The reference interprets a flat closure list per event with no plan
optimization (processing/default.go); this engine instead **compiles** the
list and fuses consecutive stateless stages into a single ``map_batches``
callable (one pass over each Arrow block, no per-processor materialization —
SURVEY.md §7.0).  Stateful stages (``stage.stateful``) break fusion and run
as actor pools: state built once per actor in ``__init__``/``setup()``,
batches through ``__call__`` (map_batches(Cls, concurrency=N)).

``Pipeline.run_local(batch)`` executes the same compiled chain on one
pyarrow.Table without Ray — the unit-test path and the per-actor inner loop
are literally the same code.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .conditions import compile_condition
from .event import not_poisoned, unify_concat
from .stages.base import FnStage, Stage, stage_factory

_RESERVED_KEYS = {"if", "then", "else", "when"}


class IfThenElse(Stage):
    """conditionals.go:189 IfThenElseProcessor: route each row through the
    then- or else- sub-chain by condition mask; batch split + unify concat."""

    name = "if"

    def __init__(self, cond, then_stages, else_stages):
        super().__init__({})
        self.cond = compile_condition(cond)
        self.then_stages = then_stages
        self.else_stages = else_stages
        self.stateful = any(s.stateful for s in then_stages + else_stages)
        self.may_drop = any(s.may_drop for s in then_stages + else_stages)

    def setup(self):
        for s in self.then_stages + self.else_stages:
            s.setup()

    def apply(self, batch):
        if len(batch) == 0:
            return batch
        mask = pc.and_(pc.fill_null(self.cond.mask(batch), False), not_poisoned(batch))
        t = pc.sum(mask).as_py() or 0
        hot = batch.filter(mask) if 0 < t < len(batch) else (batch if t == len(batch) else None)
        cold = batch.filter(pc.invert(mask)) if 0 < t < len(batch) else (batch if t == 0 else None)
        if hot is not None:
            for s in self.then_stages:
                hot = s.apply(hot)
        if cold is not None:
            for s in self.else_stages:
                cold = s.apply(cold)
        parts = [p for p in (hot, cold) if p is not None and len(p) > 0]
        if not parts:
            return batch.slice(0, 0)
        return unify_concat(parts) if len(parts) > 1 else parts[0]

    def process(self, batch):  # pragma: no cover - apply() overridden
        return batch


def compile_processor_entry(entry: dict) -> Stage:
    """One YAML list entry -> Stage (processor.go:100-148: detect ``if:``
    compound, else exactly one registered action key).  A bare string entry
    (``- community_id``, zeek connection config) is a no-config action."""
    if isinstance(entry, str):
        return stage_factory(entry)({})
    if "if" in entry:
        # then/else: list of processors OR a single processor map
        # (conditionals.go plugin config; zeek connection's community_id)
        tl = entry.get("then", [])
        el = entry.get("else", [])
        tl = [tl] if isinstance(tl, dict) else tl
        el = [el] if isinstance(el, dict) else el
        then = [compile_processor_entry(e) for e in tl]
        els = [compile_processor_entry(e) for e in el]
        return IfThenElse(entry["if"], then, els)
    keys = [k for k in entry if k not in _RESERVED_KEYS]
    if len(keys) != 1:
        raise ValueError(f"each processor must have exactly one action, got {keys}")
    name = keys[0]
    raw = entry[name]
    if "." in name:
        # beats flattened config form: `add_locale.when.not.regexp.message:
        # "^{"` = processor `add_locale` with the dotted config key
        # (go-ucfg flattening; elasticsearch/slowlog config/slowlog.yml)
        name, sub = name.split(".", 1)
        raw = {sub: raw}
    config = dict(raw or {})
    if "when" in entry:  # when: at entry level wraps the processor
        config.setdefault("when", entry["when"])
    factory = stage_factory(name)
    return factory(config)


def compile_processors(processors: list) -> list[Stage]:
    stages = []
    for entry in processors:
        if isinstance(entry, Stage):
            stages.append(entry)
        elif callable(entry):
            stages.append(FnStage(entry))
        else:
            stages.append(compile_processor_entry(entry))
    return stages


class FusedChain:
    """Callable over one Arrow batch: run N stages in sequence, in-memory.
    Passed as an *instance* to map_batches -> stateless Ray tasks."""

    def __init__(self, stages: list[Stage]):
        self.stages = stages

    def __call__(self, batch: pa.Table) -> pa.Table:
        for s in self.stages:
            if len(batch) == 0:
                return batch
            batch = s.apply(batch)
        return batch


class ActorChain:
    """Callable CLASS for map_batches actor pools: per-actor state is built
    once in __init__ (stage.setup() resolves broadcast ObjectRefs etc.),
    batches stream through __call__."""

    def __init__(self, stages: list[Stage]):
        self.chain = FusedChain(stages)
        for s in stages:
            s.setup()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.chain(batch)


class Pipeline:
    """Compiled pipeline: alternating fused-stateless / actor segments."""

    def __init__(self, spec: dict | list):
        if isinstance(spec, list):
            spec = {"processors": spec}
        self.spec = spec
        stages = compile_processors(spec.get("processors", []))
        route = spec.get("route")
        if route:
            from .routing import RouteStage
            stages.append(RouteStage(route))
        self.stages = stages
        # segmentation: group consecutive stateless stages
        self.segments: list[tuple[str, list[Stage]]] = []
        cur: list[Stage] = []
        for s in stages:
            if s.stateful:
                if cur:
                    self.segments.append(("fused", cur))
                    cur = []
                self.segments.append(("actor", [s]))
            else:
                cur.append(s)
        if cur:
            self.segments.append(("fused", cur))
        self.batch_size = spec.get("batch_size", 32768)
        self.concurrency = spec.get("concurrency")  # None = auto-size to cluster

    # -- local (no-Ray) execution: unit tests + oracle path ---------------
    def run_local(self, batch: pa.Table) -> pa.Table:
        for kind, stages in self.segments:
            for s in stages:
                s.setup()
            batch = FusedChain(stages)(batch)
        return batch

    # -- Ray Dataset execution --------------------------------------------
    def apply(self, ds, batch_size: int | None = None, concurrency: int | None = None,
              eager_pool: bool = False):
        """Attach the compiled chain to a ray.data.Dataset (lazy; the
        streaming executor pipelines the segments with backpressure).

        ``eager_pool=True`` starts any actor pool at FULL size instead of
        autoscaling up from 2.  Ray's autoscaler ramps the pool over the
        life of the query, so on a short heavy chain most of the work
        serializes on the first few actors (measured: zeek/dns compiled
        chain at sf0.1/32 runs 7.1 s with the ramp, 5.5 s warm-started —
        the pool reaches full width only near the end otherwise).  Use it
        when the input is known to be data-scale; the default ramp stays
        right for fixture-sized inputs where 30 actor spawns cost more
        than the query."""
        bs = batch_size or self.batch_size
        pool = concurrency or self.concurrency
        # Actor-pool sizing: Ray fuses upstream stateless map_batches INTO the
        # actor operator, so the pool does most of the per-row work — size it
        # to nearly the whole cluster, but leave CPUs for read/write stages
        # (a pool that reserves every CPU deadlocks the streaming executor).
        total = 4
        try:
            import ray
            if ray.is_initialized():
                total = int(ray.cluster_resources().get("CPU", 4))
        except ImportError:
            pass
        auto = max(1, total - 2) if total > 2 else 1
        pool = max(1, min(pool, auto)) if pool else auto
        # eager minimum: a chain with several actor segments must SPLIT the
        # cluster between pools — per-segment min of full width would ask
        # for segments×pool CPUs and deadlock the streaming executor
        n_actor = sum(1 for kind, _ in self.segments if kind == "actor") or 1
        eager_min = max(1, pool // n_actor)
        for kind, stages in self.segments:
            if kind == "fused":
                ds = ds.map_batches(FusedChain(stages), batch_format="pyarrow",
                                    batch_size=bs)
            else:
                # autoscaling pool: start small (pool spin-up is ~0.4s/actor
                # of pure latency), grow under load up to the cluster cap;
                # eager_pool skips the ramp (spawns run in parallel, so a
                # full-width start costs ~1 spawn of latency, not pool×)
                ds = ds.map_batches(ActorChain, fn_constructor_args=(stages,),
                                    batch_format="pyarrow", batch_size=bs,
                                    concurrency=(eager_min if eager_pool
                                                 else min(2, pool), pool))
        return ds
