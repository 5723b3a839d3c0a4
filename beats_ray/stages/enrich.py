"""Stateful lookup / metadata-enrich stages.

The reference pattern (SURVEY.md §2.4 "Stateful lookup/enrich"): a watcher or
OS lookup keeps a small map that every event is enriched from — ``cache``
(cache/cache.go:40), ``translate_sid`` (translate_sid/translatesid.go:43),
``add_docker_metadata`` (add_docker_metadata.go:65 container map).  Ray-first
mapping: the map is a **broadcast dict** — ``ray.put`` once on the driver,
``ray.get`` once per actor in ``setup()`` (NOT per batch) — and the per-batch
join is a vectorized pandas ``Series.map`` against the dict: a broadcast hash
join, no shuffle (Beats has no shuffle join anywhere).

``lookup`` is the concrete transcript instantiation: ``{tool -> {category,
cost_class}}`` / ``{role -> role_class}`` per FIXTURES.md F5.

Constant enrich (add_host_metadata/add_host_metadata.go:52, add_locale,
add_agent_metadata, add_observer_metadata, add_data_stream) degenerates to
constant columns captured at compile time — values here are deterministic
fixtures, not live probes (determinism rule, SURVEY.md §7.0).
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..event import add_tags, field_to_column, set_column
from .base import Stage, register


def _maybe_get(ref):
    """Resolve a broadcast ObjectRef inside a worker; pass dicts through so
    the same stage works in unit tests without Ray."""
    try:
        import ray
        if isinstance(ref, ray.ObjectRef):
            return ray.get(ref)
    except ImportError:
        pass
    return ref


@register("lookup")
class LookupEnrich(Stage):
    """Broadcast-dict enrich (actor-pool stage).

    config:
      field: source column whose value keys the dict
      table: {key -> {out_key: value}} | ObjectRef to it
      target_prefix: prefix for output columns (default "<field>")
      ignore_missing: absent keys leave nulls (default True)
      tag_on_failure: tags appended for rows whose key missed (cf.
        dns/config.go:38 tag_on_failure; translate_sid behavior)
    """

    name = "lookup"

    def __init__(self, config=None):
        super().__init__(config)
        # Small tables ride inside the (once-serialized) task closure — no
        # actor pool needed, and pool spin-up is avoided.  Big state or an
        # explicit {"actor": true} opts into the actor-pool path, where
        # setup() runs once per actor.
        self.stateful = bool(self.config.get("actor", False))
        self.field = self.config["field"]
        self._table_ref = self.config["table"]
        prefix = self.config.get("target_prefix", self.field)
        self.prefix = prefix + "_" if prefix else ""
        self.tag_on_failure = list(self.config.get("tag_on_failure", []))
        self.ignore_missing = bool(self.config.get("ignore_missing", True))
        self._maps = None

    def input_columns(self):
        from ..event import TAGS_COL
        return [field_to_column(self.field), TAGS_COL]

    def setup(self):
        if self._maps is not None:
            return
        table = _maybe_get(self._table_ref)
        # columnar form for a vectorized Arrow hash-join per batch:
        # keys Array + one values Array per output column (index_in + take)
        out_keys: list[str] = []
        for v in table.values():
            for k in v:
                if k not in out_keys:
                    out_keys.append(k)
        self._key_arr = pa.array(list(table.keys()))
        self._maps = {ok: pa.array([v.get(ok) for v in table.values()])
                      for ok in out_keys}

    def process(self, batch):
        self.setup()
        col = batch.column(field_to_column(self.field))
        # broadcast hash join, all in Arrow: position of each key in the
        # small side (null = miss), then gather each output column
        if len(self._key_arr) == 0:
            # empty lookup map: every row misses (pc.index_in against the
            # null-typed empty array would raise ArrowTypeError)
            idx = pa.nulls(len(batch), pa.int32())
        else:
            idx = pc.index_in(col, value_set=self._key_arr)
        for out_key, values in self._maps.items():
            batch = set_column(batch, self.prefix + out_key, pc.take(values, idx))
        if self.tag_on_failure:
            missed = pc.and_(pc.is_null(idx), pc.is_valid(col))
            if (pc.sum(missed).as_py() or 0) > 0:
                batch = add_tags(batch, self.tag_on_failure, missed)
        return batch


@register("translate_sid")
class TranslateSID(LookupEnrich):
    """Windows SID -> account fields from a broadcast fixture mapping
    (translate_sid/translatesid.go:43; the OS lookup is replaced by the
    injected table — no OS dependency in the engine)."""

    name = "translate_sid"

    def __init__(self, config=None):
        config = dict(config or {})
        config.setdefault("field", config.pop("sid_field", "sid"))
        config.setdefault("target_prefix", "")
        super().__init__(config)


@register("translate_ldap_attribute")
class TranslateLDAP(LookupEnrich):
    name = "translate_ldap_attribute"

    def __init__(self, config=None):
        config = dict(config or {})
        config.setdefault("field", "ldap_attr")
        super().__init__(config)


_CACHE_PATH_CLEAN = str.maketrans({c: "_" for c in '/<>:"\\|?* .'})


@register("cache")
class CacheStage(Stage):
    """KV cache processor (cache/cache.go:40): ``put`` stores
    {key_field -> value_field} into actor-local state; ``get`` enriches from
    it; ``delete`` evicts.  Config mirrors the reference
    (cache/config.go:96-122): ``store.memory.id`` or ``store.file.{id,
    write_interval}`` plus ``store.capacity`` and per-put ``ttl``.

    File-backed store (file_store.go): state is an ndjson of
    ``{"key":…, "val":…, "expires":…}`` entries at
    ``<store_root>/cache_processor/<clean_id>`` — read at actor setup
    (readState, file_store.go:170), written atomically via tmp+rename
    (writeState :245).  Deviation for the batch engine: the reference's
    periodic-writer goroutine maps to a flush at batch boundaries once
    ``write_interval`` has elapsed (interval 0 = every batch), since a Ray
    actor has no guaranteed finalizer for the reference's final write.

    NOTE: actor-local state is per-worker — a ``get`` only sees ``put``s
    processed by the same actor, so pipelines that need global visibility
    must partition input by the cache key (documented partitioning
    assumption, SURVEY.md custom-operator rule)."""

    name = "cache"
    stateful = True

    def __init__(self, config=None):
        super().__init__(config)
        import math as _math
        import time as _time
        c = self.config
        self.op = "put" if "put" in c else ("delete" if "delete" in c else "get")
        opcfg = c.get(self.op) if isinstance(c.get(self.op), dict) else {}
        self.key_field = opcfg.get("key_field", c.get("key_field"))
        self.value_field = opcfg.get("value_field", c.get("value_field"))
        self.target_field = opcfg.get("target_field", c.get("target_field", "cache_value"))
        self.ttl = self._dur(opcfg.get("ttl", c.get("ttl")))
        store = c.get("store") or {}
        self.capacity = int(store.get("capacity", 0) or 0) or None
        self.path = None
        self.write_interval = 0.0
        fcfg = store.get("file")
        if fcfg:
            sid = str(fcfg.get("id", "default")).translate(_CACHE_PATH_CLEAN)
            root = c.get("store_root", "/tmp/beats_ray_data")
            import os
            self.path = os.path.join(root, "cache_processor", sid)
            self.write_interval = self._dur(fcfg.get("write_interval")) or 0.0
        # key -> (value, expires_epoch)
        inf = _math.inf
        self.store: dict = {k: (v, inf) for k, v in (c.get("seed") or {}).items()}
        self._dirty = False
        self._last_write = _time.monotonic()
        if self.path:
            self._read_state()

    @staticmethod
    def _dur(v):
        if v is None:
            return None
        if isinstance(v, (int, float)):
            return float(v)
        from .timestamp import DecodeDuration
        return DecodeDuration.parse_duration(str(v))

    def _read_state(self):
        import json
        import math
        import time
        try:
            with open(self.path) as f:
                now = time.time()
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    e = json.loads(line)
                    exp = e.get("expires")
                    exp = math.inf if exp is None else float(exp)
                    if exp > now:
                        self.store[e["key"]] = (e["val"], exp)
        except FileNotFoundError:
            pass

    def _write_state(self):
        import json
        import math
        import os
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = f"{self.path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            for k, (v, exp) in self.store.items():
                f.write(json.dumps(
                    {"key": k, "val": v,
                     "expires": None if exp == math.inf else exp},
                    default=str) + "\n")
        os.replace(tmp, self.path)      # atomic publish (writeState :280)
        self._dirty = False

    def _maybe_flush(self):
        import time
        if not (self.path and self._dirty):
            return
        now = time.monotonic()
        if now - self._last_write >= self.write_interval:
            self._write_state()
            self._last_write = now

    def flush(self):
        """Final write-out (the reference's writeState(final=True))."""
        if self.path and self._dirty:
            self._write_state()

    def __del__(self):      # best-effort final flush on actor teardown
        try:
            self.flush()
        except Exception:
            pass

    def _evict(self):
        if self.capacity and len(self.store) > self.capacity:
            # reference evicts by earliest expiry (expiryHeap); ties keep
            # insertion order stable
            for k in sorted(self.store, key=lambda k: self.store[k][1])[
                    :len(self.store) - self.capacity]:
                del self.store[k]

    def process(self, batch):
        import math
        import time
        keys = batch.column(field_to_column(self.key_field)).to_pylist()
        now = time.time()
        if self.op == "put":
            vals = batch.column(field_to_column(self.value_field)).to_pylist()
            exp = now + self.ttl if self.ttl else math.inf
            for k, v in zip(keys, vals):
                if k is not None:
                    self.store[k] = (v, exp)
                    self._dirty = True
            self._evict()
            self._maybe_flush()
            return batch
        if self.op == "delete":
            for k in keys:
                if self.store.pop(k, None) is not None:
                    self._dirty = True
            self._maybe_flush()
            return batch
        out = []
        for k in keys:
            e = self.store.get(k)
            out.append(e[0] if e is not None and e[1] > now else None)
        return set_column(batch, field_to_column(self.target_field), pa.array(out))


def _constant_stage(name: str, defaults: dict):
    """Factory for constant-column enrich stages (driver-captured dicts)."""

    @register(name)
    class ConstEnrich(Stage):
        def __init__(self, config=None):
            super().__init__(config)
            vals = dict(defaults)
            vals.update(self.config.get("fields", {}))
            self.values = {field_to_column(k): v for k, v in vals.items()}

        def process(self, batch):
            n = len(batch)
            for colname, v in self.values.items():
                batch = set_column(batch, colname, pa.array([v] * n))
            return batch

    ConstEnrich.name = name
    ConstEnrich.__name__ = "Const_" + name
    return ConstEnrich


# Deterministic fixture values (no live host/cloud probes in the engine;
# a real deployment captures these once on the driver and broadcasts them —
# add_host_metadata.go:52, add_cloud_metadata.go:46 one-time probe).
AddHostMetadata = _constant_stage("add_host_metadata", {
    "host.name": "rayworker", "host.os.family": "linux",
    "host.os.platform": "linux", "host.architecture": "x86_64",
})
AddObserverMetadata = _constant_stage("add_observer_metadata", {
    "observer.type": "beats_ray", "observer.vendor": "rebuild",
})
AddAgentMetadata = _constant_stage("add_agent_metadata", {
    "agent.type": "beats_ray", "agent.version": "0.1.0",
})
AddCloudMetadata = _constant_stage("add_cloud_metadata", {})
AddLocale = _constant_stage("add_locale", {"event.timezone": "+00:00"})
AddDataStream = _constant_stage("add_data_stream", {
    "data_stream.type": "logs", "data_stream.dataset": "generic",
    "data_stream.namespace": "default",
})
# `now` stamps a driver-provided constant (determinism; now/now.go:44)
Now = _constant_stage("now", {})


@register("add_formatted_index")
class AddFormattedIndex(Stage):
    """Render a format string into ``@metadata.raw_index``
    (add_formatted_index/add_formatted_index.go:33) — overrides sink routing."""

    name = "add_formatted_index"

    def __init__(self, config=None):
        super().__init__(config)
        from ..fmtstr import FormatString
        self.fmt = FormatString(self.config["index"])

    def process(self, batch):
        return set_column(batch, "meta_raw_index", self.fmt.render(batch))


def _watcher_alias(name: str, key_field: str, prefix: str):
    """Config-compat aliases for the watcher-based metadata processors
    (add_docker_metadata.go:65, add_process_metadata.go:96, ...).

    Two modes:
    - ``table``: broadcast dict, refreshed per run (SURVEY.md §2.4).
    - ``table_path`` (+ ``refresh_interval``, default 5 s): the Ray-first
      equivalent of the reference's watcher goroutine
      (add_docker_metadata/docker.go:99-142 event loop).  A sidecar
      watcher writes the container/pod map to a shared JSON file; every
      enrich ACTOR mtime-polls it (one ``os.stat`` at most per interval,
      amortized over batches) and reloads + re-columnarizes on change.
      Staleness is bounded by refresh_interval — same guarantee as the
      reference's event-lag window — with no coordination between actors
      and no per-batch shipping.
    """

    @register(name)
    class WatcherEnrich(LookupEnrich):
        def __init__(self, config=None):
            config = dict(config or {})
            config.setdefault("field", config.pop("match_field", key_field))
            config.setdefault("target_prefix", prefix)
            self._path = config.pop("table_path", None)
            self._interval = float(config.pop("refresh_interval", 5.0))
            config.setdefault("table", {})
            if self._path is not None:
                # file-backed state belongs on the actor-pool path
                config.setdefault("actor", True)
            super().__init__(config)
            self._mtime = None
            self._next_check = 0.0

        def _load_file(self):
            import json as _json
            with open(self._path) as f:
                return _json.load(f)

        def setup(self):
            if self._path is not None and self._maps is None:
                self._mtime = os.stat(self._path).st_mtime_ns
                self._table_ref = self._load_file()
                self._next_check = time.monotonic() + self._interval
            super().setup()

        def process(self, batch):
            if self._path is not None and self._maps is not None:
                now = time.monotonic()
                if now >= self._next_check:
                    self._next_check = now + self._interval
                    try:
                        m = os.stat(self._path).st_mtime_ns
                    except OSError:
                        m = self._mtime   # vanished mid-swap: keep last map
                    if m != self._mtime:
                        self._mtime = m
                        self._table_ref = self._load_file()
                        self._maps = None   # re-columnarize on next setup()
            return super().process(batch)

    WatcherEnrich.name = name
    WatcherEnrich.__name__ = "Watcher_" + name
    return WatcherEnrich


AddDockerMetadata = _watcher_alias("add_docker_metadata", "container_id", "container")
AddKubernetesMetadata = _watcher_alias("add_kubernetes_metadata", "pod_uid", "kubernetes")
AddProcessMetadata = _watcher_alias("add_process_metadata", "process_pid", "process")
AddNomadMetadata = _watcher_alias("add_nomad_metadata", "alloc_id", "nomad")
AddCloudfoundryMetadata = _watcher_alias("add_cloudfoundry_metadata", "app_id", "cloudfoundry")
