"""Beats *module* runner — run a reference-style filebeat module fileset
(``config/<fs>.yml`` + ``ingest/*.yml``) as a distributed Ray Data pipeline.

The reference ships each module as a Go-templated input config plus one or
more Elasticsearch ingest pipelines it uploads at setup time
(filebeat/fileset/fileset.go, fileset/pipelines.go).  This module composes
the existing pieces — ``ingest.load_fileset_config`` (Go-template renderer),
``ingest.compile_ingest`` (ES pipeline -> registered stage specs) — into one
entry point, so a user of the reference can point this engine at a module
directory and run the same fileset end-to-end:

    from beats_ray.modules import compile_fileset_spec
    spec, vars = compile_fileset_spec(
        "/path/to/filebeat/module/apache", "apache", "access")
    Pipeline({"processors": spec}).apply(lines_ds)

or from the CLI (reads log files, writes routed parquet + manifest):

    python -m beats_ray module --module-dir .../module/apache \\
        --fileset access --input 'logs/*.log' --output /tmp/out

Painless ``script:`` processors have no generic compilation (by design —
the compiler fails LOUDLY at build time, see ingest.py); hand-ported
implementations for specific filesets are registered in ``FILESET_HOOKS``
(apache/access and checkpoint/firewall ship built in; the golden tests in
``tests/test_*_golden.py`` carry ports for ~30 more that can be promoted
the same way).  ``scripts=``/``overrides=`` parameters accept user ports.
"""
from __future__ import annotations

import glob
import os

from .ingest import (compile_ingest, load_fileset_config, load_pipeline_yml,
                     manifest_vars)

__all__ = ["compile_fileset_spec", "fileset_pipeline_loader",
           "FILESET_HOOKS"]


def fileset_pipeline_loader(ingest_dir: str, scripts_by_name=None,
                            overrides_by_name=None):
    """Loader for ``pipeline:`` processors: resolves the name emitted by
    ``{< IngestPipeline "x" >}`` against the fileset's ingest/ directory."""
    def load(name: str) -> list:
        base = name if name.endswith((".yml", ".json")) else name + ".yml"
        return compile_ingest(
            load_pipeline_yml(os.path.join(ingest_dir, base)),
            scripts=(scripts_by_name or {}).get(name),
            overrides=(overrides_by_name or {}).get(name),
            pipeline_loader=load)
    return load


# -- built-in painless ports (module, fileset) -> hook(doc) ----------------
# A hook receives the parsed root pipeline doc and returns
# (scripts, overrides) for compile_ingest.  Ports parse their tables out of
# the module's own yml wherever possible, so they track the reference.

def _apache_access_hook(doc):
    # filebeat/module/apache/access/ingest/pipeline.yml: script #1 splits
    # ssl_protocol 'TLSv1.2' -> tls.version/_protocol; script #2 is a
    # recursive null-sweep (a no-op in the columnar model: absent == null)
    tls = {"script": {"source": (
        "def process(event, params):\n"
        "    p = event.get('apache_access_ssl_protocol')\n"
        "    if p is None:\n"
        "        return event\n"
        "    parts = p.lower().split('v')\n"
        "    if len(parts) != 2:\n"
        "        return event\n"
        "    event['tls_version'] = parts[1] if '.' in parts[1] \\\n"
        "        else parts[1] + '.0'\n"
        "    event['tls_version_protocol'] = parts[0]\n"
        "    return event\n")}}
    return [tls, None], None


def _checkpoint_firewall_hook(doc):
    # Reuses the query catalogue's vectorized ports (iana table parsed from
    # the module's own painless; ES subtree copies as prefix column copies)
    from .pipelines.queries import _checkpoint_hook_parts
    return _checkpoint_hook_parts(doc)


FILESET_HOOKS = {
    ("apache", "access"): _apache_access_hook,
    ("checkpoint", "firewall"): _checkpoint_firewall_hook,
}


def compile_fileset_spec(module_dir: str, module: str, fileset: str, *,
                         vars: dict | None = None, scripts=None,
                         overrides=None, extra_spec=None,
                         keep_arrays: bool = True):
    """Module fileset -> (Pipeline ``processors`` spec list, rendered vars).

    Mirrors what the reference does at setup + run time: render the
    fileset's Go-templated config (input-level json/processors), then splice
    the compiled ingest pipeline(s), then stamp the event.module/dataset
    fields the fileset registers (fileset.go: ``event.module`` etc.).

    ``vars`` overrides manifest defaults (e.g. ``{"input": "file"}``).
    ``scripts``/``overrides`` are compile_ingest hooks for the ROOT
    pipeline; sub-pipelines resolve through the fileset's ingest/ dir.
    When neither is given and the fileset has a built-in port in
    ``FILESET_HOOKS``, that port is used.
    """
    fs_dir = os.path.join(module_dir, fileset)
    mvars = manifest_vars(os.path.join(fs_dir, "manifest.yml"))
    if vars:
        mvars.update(vars)
    cfg = load_fileset_config(
        os.path.join(fs_dir, "config", f"{fileset}.yml"), mvars)

    spec: list = []
    json_cfg = {**(cfg.get("json") or {}),
                **{k.split(".", 1)[1]: v for k, v in cfg.items()
                   if k.startswith("json.")}}
    if json_cfg:  # input-level ndjson parse (zeek-style config shape)
        under_root = json_cfg.get("keys_under_root", False)
        spec += [
            {"decode_json_fields": {"fields": ["message"],
                                    "target": "" if under_root else "json",
                                    "keep_arrays": keep_arrays}},
            {"drop_fields": {"fields": ["message"], "ignore_missing": True}},
        ]
    if cfg.get("fields"):
        spec.append({"add_fields": {"target": "", "fields": cfg["fields"]}})
    for p in cfg.get("processors", []):
        if isinstance(p, dict) and "decode_json_fields" in p and keep_arrays:
            p = {"decode_json_fields": {**p["decode_json_fields"],
                                        "keep_arrays": True}}
        if isinstance(p, dict) and "rename" in p:
            # dot-free froms ("json", "seen") are real map containers in
            # Beats (PutValue nests); multi-segment froms may be literal
            # dotted source keys the flat model can't tell apart (zeek
            # kerberos "cert.client_subject") -> subtree move only for the
            # former, split into order-preserving runs
            runs: list = []
            for q in p["rename"].get("fields", []):
                tree = "." not in q.get("from", ".")
                if runs and runs[-1][0] == tree:
                    runs[-1][1].append(q)
                else:
                    runs.append((tree, [q]))
            for tree, pairs in runs:
                spec.append({"rename": {**p["rename"], "fields": pairs,
                                        "move_subtrees": tree}})
            continue
        spec.append(p)

    if scripts is None and overrides is None:
        hook = FILESET_HOOKS.get((module, fileset))
        if hook is not None:
            root_doc = load_pipeline_yml(
                os.path.join(fs_dir, "ingest", "pipeline.yml"))
            scripts, overrides = hook(root_doc)

    ingest_dir = os.path.join(fs_dir, "ingest")
    roots = sorted(glob.glob(os.path.join(ingest_dir, "pipeline.yml"))) or \
        sorted(glob.glob(os.path.join(ingest_dir, "*.yml")))[:1]
    if roots:
        spec += compile_ingest(
            load_pipeline_yml(roots[0]), scripts=scripts,
            overrides=overrides,
            pipeline_loader=fileset_pipeline_loader(ingest_dir))
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": module, "event.dataset": f"{module}.{fileset}",
        "fileset.name": fileset, "input.type": "log",
        "service.type": module}}})
    if extra_spec:
        spec += extra_spec
    return spec, mvars
