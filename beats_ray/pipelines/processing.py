"""The global processing-chain order (processing/default.go:289-415).

Beats applies a FIXED stage order to every published event; this builder
reproduces it so a user's ``filebeat.yml``-shaped config compiles into one
Pipeline with identical ordering semantics (SURVEY.md §2.3):

 1. generalize/normalize            -> schema is already columnar; no-op
 2. client @metadata merge          -> constant meta_* columns
 3. pipeline+client tags            -> add_tags
 4. ``fields`` merges               -> add_fields (under "fields" target)
 5. client-local processors         -> input-level ``processors:`` list
 6. builtin agent/host metadata     -> add_agent_metadata + add_host_metadata
 7. global processors               -> top-level ``processors:`` list
 8. timeseries hash                 -> timeseries (when enabled)
 9. debug print                     -> skipped (observability, not semantics)
10. drop-all-if-disabled            -> drop_event when output disabled
"""

from __future__ import annotations

from ..pipeline import Pipeline


def build_processing_pipeline(client_config: dict | None = None,
                              global_config: dict | None = None) -> Pipeline:
    """client_config: {meta: {...}, tags: [...], fields: {...},
    processors: [...]}; global_config: {tags: [...], processors: [...],
    timeseries_fields: [...], disabled: bool, route: {...}}."""
    c = dict(client_config or {})
    g = dict(global_config or {})
    chain: list = []
    # (2) client meta
    if c.get("meta"):
        chain.append({"add_fields": {"target": "meta", "fields": c["meta"]}})
    # (3) tags: pipeline-level then client-level, dedup-appended
    tags = list(g.get("tags", [])) + [t for t in c.get("tags", [])
                                      if t not in g.get("tags", [])]
    if tags:
        chain.append({"add_tags": {"tags": tags}})
    # (4) fields merges
    if c.get("fields"):
        chain.append({"add_fields": {"target": c.get("fields_under_root") and ""
                                     or "fields", "fields": c["fields"]}})
    # (5) client-local processors
    chain.extend(c.get("processors", []))
    # (6) builtin metadata
    chain.append({"add_agent_metadata": {}})
    if g.get("add_host_metadata", True):
        chain.append({"add_host_metadata": {}})
    # (7) global processors
    chain.extend(g.get("processors", []))
    # (8) timeseries
    if g.get("timeseries_fields"):
        chain.append({"timeseries": {"fields": g["timeseries_fields"]}})
    # (10) output disabled -> drop everything
    if g.get("disabled"):
        chain.append({"drop_event": {}})
    spec = {"processors": chain}
    if g.get("route"):
        spec["route"] = g["route"]
    return Pipeline(spec)
