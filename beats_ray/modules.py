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
(apache access+error, checkpoint/firewall and the scripted zeek filesets
ship built in, each golden-verified against the module's own fixtures;
the golden tests in ``tests/test_*_golden.py`` carry ports for ~25 more
that can be promoted the same way).  ``scripts=``/``overrides=``
parameters accept user ports.
"""
from __future__ import annotations

import glob
import re
import os

from .ingest import (compile_ingest, load_fileset_config, load_pipeline_yml,
                     manifest_doc, manifest_vars)

__all__ = ["compile_fileset_spec", "fileset_reader_opts",
           "fileset_pipeline_loader", "fileset_paths", "FILESET_HOOKS"]


def fileset_paths(module_dir: str, fileset: str,
                  vars: dict | None = None) -> tuple[str, list[str]]:
    """(config path, [ingest pipeline paths]) as the fileset's own
    manifest.yml declares them (fileset.go:128-136 ``input:`` /
    ``ingest_pipeline:``) — the reference never assumes
    ``config/<fileset>.yml``; x-pack modules mostly use ``config/input.yml``
    and list several pipelines (the FIRST is the root, the rest are
    ``{< IngestPipeline "name" >}`` targets resolved by basename).
    Relative paths resolve against the fileset dir (cisco/asa points at
    ``../shared/ingest/asa-ftd-pipeline.yml``)."""
    fs_dir = os.path.join(module_dir, fileset)
    man = manifest_doc(os.path.join(fs_dir, "manifest.yml"))
    mvars = {v["name"]: v.get("default") for v in man.get("var", [])}
    if vars:
        mvars.update(vars)

    def _render(path):  # paths are Go-templated: `input: config/{{.input}}.yml`
        return re.sub(r"\{\{\s*\.(\w+)\s*\}\}",
                      lambda m: str(mvars.get(m.group(1), "")), path)

    cfg = _render(man.get("input") or os.path.join("config",
                                                   f"{fileset}.yml"))
    if not os.path.exists(os.path.join(fs_dir, cfg)) and "input" in mvars:
        # cloud-input modules (aws/azure/gcp) template the config filename on
        # the input var; golden/file runs fall back to the file-shaped config
        for alt in ("file", "log"):
            cand = _render((man.get("input") or "")
                           .replace("{{.input}}", alt))
            if cand and os.path.exists(os.path.join(fs_dir, cand)):
                cfg = cand
                break
    pipes = man.get("ingest_pipeline") or []
    if isinstance(pipes, str):
        pipes = [pipes]
    pipes = [_render(p) for p in pipes]
    if not pipes:
        pipes = [p[len(fs_dir) + 1:] for p in
                 sorted(glob.glob(os.path.join(fs_dir, "ingest", "*.yml")))]
        pipes = [p for p in pipes if p.endswith("pipeline.yml")] or pipes[:1]
    return (os.path.normpath(os.path.join(fs_dir, cfg)),
            [os.path.normpath(os.path.join(fs_dir, p)) for p in pipes])


def _nested(cfg: dict, key: str) -> dict:
    """Merge ``key: {...}`` and flattened ``key.sub: v`` config forms."""
    return {**(cfg.get(key) or {}),
            **{k.split(".", 1)[1]: v for k, v in cfg.items()
               if k.startswith(key + ".")}}


def fileset_reader_opts(module_dir: str, fileset: str,
                        vars: dict | None = None) -> dict:
    """Reader-level settings from the fileset's rendered config — the input
    options the harvester applies BEFORE/AROUND the processor chain
    (input/log/config.go:67-68, harvester.go:426,496-511):

    - ``multiline``: reader-chain join (elasticsearch/mysql/kafka configs)
    - ``include_lines`` / ``exclude_lines``: post-multiline message filter
    - ``exclude_files``: file-path regex blacklist
    - ``encoding``: charset name
    """
    fs_dir = os.path.join(module_dir, fileset)
    mvars = manifest_vars(os.path.join(fs_dir, "manifest.yml"))
    if vars:
        mvars.update(vars)
    cfg_path, _ = fileset_paths(module_dir, fileset, vars)
    cfg = load_fileset_config(cfg_path, mvars)
    ml = _nested(cfg, "multiline")
    for p in cfg.get("parsers") or []:  # filestream-style parser chain
        if isinstance(p, dict) and "multiline" in p:
            ml = p["multiline"] or {}
    return {
        "multiline": ml or None,
        "include_lines": cfg.get("include_lines") or [],
        "exclude_lines": cfg.get("exclude_lines") or [],
        "exclude_files": cfg.get("exclude_files") or [],
        "encoding": cfg.get("encoding", ""),
    }


def fileset_pipeline_loader(ingest_dir: str, scripts_by_name=None,
                            overrides_by_name=None, by_name=None,
                            vars: dict | None = None):
    """Loader for ``pipeline:`` processors: resolves the name emitted by
    ``{< IngestPipeline "x" >}`` against the manifest's declared pipeline
    list (``by_name``: basename-without-ext -> path, mirroring
    fileset.go:327 formatPipelineID) with the fileset's ingest/ directory
    as fallback."""
    def load(name: str) -> list:
        short = os.path.splitext(os.path.basename(name))[0]
        path = (by_name or {}).get(short)
        if path is None:
            base = name if name.endswith((".yml", ".json")) else name + ".yml"
            path = os.path.join(ingest_dir, base)
        doc = load_pipeline_yml(path, vars)
        scripts = (scripts_by_name or {}).get(short)
        overrides = (overrides_by_name or {}).get(short)
        # a callable entry receives the loaded sub-doc (hooks compute
        # processor indices against the sub-pipeline they target)
        if callable(scripts):
            scripts = scripts(doc)
        if callable(overrides):
            overrides = overrides(doc)
        return compile_ingest(doc, scripts=scripts, overrides=overrides,
                              pipeline_loader=load)
    return load

from .fileset_hooks import FILESET_HOOKS  # noqa: E402  (registry of painless ports)


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
    cfg_path, pipe_paths = fileset_paths(module_dir, fileset, vars)
    cfg = load_fileset_config(cfg_path, mvars)

    spec: list = []
    json_cfg = {**(cfg.get("json") or {}),
                **{k.split(".", 1)[1]: v for k, v in cfg.items()
                   if k.startswith("json.")}}
    if json_cfg:  # input-level ndjson parse (zeek-style config shape)
        under_root = json_cfg.get("keys_under_root", False)
        # the beats ndjson parser decodes the FULL document (readjson.go has
        # no depth limit) — unlike the decode_json_fields processor default
        spec += [
            {"decode_json_fields": {"fields": ["message"],
                                    "target": "" if under_root else "json",
                                    "max_depth": 99,
                                    "keep_arrays": keep_arrays}},
            {"drop_fields": {"fields": ["message"], "ignore_missing": True}},
        ]
    for p in cfg.get("parsers") or []:
        # filestream-style `parsers:` chain (parser.go:87-148;
        # elasticsearch/querylog config) — multiline stays reader-level
        # (fileset_reader_opts), the row-local parsers join the spec front
        if not isinstance(p, dict) or "multiline" in p:
            continue
        from .sources.readers import parsers_to_processors
        q = parsers_to_processors([p])[0]
        if "decode_json_fields" in q:
            q = {"decode_json_fields": {**q["decode_json_fields"],
                                        "max_depth": 99,
                                        "keep_arrays": keep_arrays}}
            spec += [q, {"drop_fields": {"fields": ["message"],
                                         "ignore_missing": True}}]
        else:
            spec.append(q)
    if cfg.get("fields"):
        spec.append({"add_fields": {"target": "", "fields": cfg["fields"]}})
    # module-identity fields are stamped at PUBLISH time in the reference
    # (channel/runner.go newCommonConfigEditor: fileset.name, service.type,
    # input.type, event.module, event.dataset set on Processing.Fields) —
    # i.e. BEFORE the ES ingest pipeline runs server-side, so a pipeline
    # `set` of event.dataset (elasticsearch/slowlog) must win over the stamp.
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": module, "event.dataset": f"{module}.{fileset}",
        "fileset.name": fileset, "input.type": "log",
        "service.type": module}}})
    for p in cfg.get("processors", []):
        if isinstance(p, dict) and "script" in p and \
                isinstance(p["script"], dict) and p["script"].get("file"):
            # the reference resolves ${path.home}/module/... script files at
            # load time (libbeat/processors/script/javascript config.go);
            # module_dir is <path.home>/module/<module>
            f = p["script"]["file"]
            f = f.replace("${path.home}/module", os.path.dirname(module_dir))
            sc = {k: v for k, v in p["script"].items() if k != "file"}
            sc["source"] = open(f).read()
            p = {"script": sc}
        if isinstance(p, dict) and "parse_aws_vpc_flow_log" in p:
            # a beats-side processor error never aborts the event (the
            # processor runner logs and ships it on — the vpcflow header
            # line must reach the ES pipeline's drop)
            p = {"parse_aws_vpc_flow_log": {
                "ignore_failure": True, **(p["parse_aws_vpc_flow_log"] or {})}}
        if isinstance(p, dict) and "timestamp" in p and \
                isinstance(p["timestamp"], dict):
            # the beats timestamp processor takes GO reference layouts
            # (timestamp/timestamp.go; o365 config '2006-01-02T15:04:05')
            lay = p["timestamp"].get("layouts")
            if lay and not any("%" in str(l) for l in lay):
                from .stages.minijs import _go_layouts
                # YAML parses '2006-01-02T15:04:05' as a datetime — take
                # it back to the literal Go reference layout
                lay = [l.isoformat() if hasattr(l, "isoformat") else str(l)
                       for l in lay]
                p = {"timestamp": {**p["timestamp"],
                                   "layouts": _go_layouts(lay)}}
        if isinstance(p, dict) and "decode_json_fields" in p:
            # reference max_depth caps recursive decoding of nested JSON
            # *strings* (decode_json_fields.go) — a plain JSON object
            # decodes fully at the default 1.  This engine's flat-column
            # model uses the knob as flatten depth, so "full object" means
            # a high cap (zoom/webhook config decodes the whole payload).
            d = {"max_depth": 99, **p["decode_json_fields"]}
            if keep_arrays:
                d["keep_arrays"] = True
            p = {"decode_json_fields": d}
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

    sub_scripts = sub_overrides = None
    hook_pre: list = []
    hook_post: list = []
    if scripts is None and overrides is None and pipe_paths:
        hook = FILESET_HOOKS.get((module, fileset))
        if hook is not None:
            doc0 = load_pipeline_yml(pipe_paths[0], mvars)
            try:   # hooks that read manifest vars take (doc, mvars)
                parts = hook(doc0, mvars=mvars)
            except TypeError:
                parts = hook(doc0)
            if isinstance(parts, dict):  # sub-pipeline-aware hook
                scripts = parts.get("scripts")
                overrides = parts.get("overrides")
                sub_scripts = parts.get("sub_scripts")
                sub_overrides = parts.get("sub_overrides")
                hook_pre = parts.get("pre") or []
                hook_post = parts.get("post") or []
            else:
                scripts, overrides = parts
    spec += hook_pre

    if pipe_paths:
        by_name = {os.path.splitext(os.path.basename(p))[0]: p
                   for p in pipe_paths}
        spec += compile_ingest(
            load_pipeline_yml(pipe_paths[0], mvars), scripts=scripts,
            overrides=overrides,
            pipeline_loader=fileset_pipeline_loader(
                os.path.join(fs_dir, "ingest"), sub_scripts, sub_overrides,
                by_name=by_name, vars=mvars))
    spec += hook_post
    if extra_spec:
        spec += extra_spec
    return spec, mvars
