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
    return {
        "multiline": _nested(cfg, "multiline") or None,
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
        return compile_ingest(
            load_pipeline_yml(path, vars),
            scripts=(scripts_by_name or {}).get(short),
            overrides=(overrides_by_name or {}).get(short),
            pipeline_loader=load)
    return load


# -- built-in painless ports (module, fileset) -> hook(doc) ----------------
# A hook receives the parsed root pipeline doc and returns
# (scripts, overrides) for compile_ingest.  Ports parse their tables out of
# the module's own yml wherever possible, so they track the reference.
# Every hook here is golden-verified against the module's own
# test/*-expected.json fixtures (tests/test_zeek_golden.py,
# tests/test_apache_golden.py, tests/test_module_runner.py).

def _py(src: str) -> dict:
    """One-indent python UDF spec from a bare statement block."""
    return {"script": {"source": "def process(event, params):\n" + "".join(
        "    " + ln + "\n" for ln in src.splitlines()) + "    return event\n"}}


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


def _apache_error_hook(doc):
    # pipeline.yml scripts: level->event.type map + recursive null sweep
    # (no-op columnar); the two date processors (timezone==null / templated
    # {{ event.timezone }}) collapse into one tz-aware parse that defaults
    # to UTC when event.timezone is unset
    level = _py(
        "lvl = event.get('log_level')\n"
        "if lvl is not None:\n"
        "    event['event_type'] = 'error' if lvl in (\n"
        "        'emerg', 'alert', 'crit', 'error', 'warn') else 'info'")
    date_tz = {"script": {"source": (
        "def process(event, params):\n"
        "    from datetime import datetime, timedelta\n"
        "    raw = event.get('apache_error_timestamp')\n"
        "    if raw is None:\n"
        "        return event\n"
        "    base = ' '.join(str(raw).split())\n"
        "    dt = None\n"
        "    for fmt in ('%a %b %d %H:%M:%S %Y', '%a %b %d %H:%M:%S.%f %Y'):\n"
        "        try:\n"
        "            dt = datetime.strptime(base, fmt)\n"
        "            break\n"
        "        except ValueError:\n"
        "            continue\n"
        "    if dt is None:\n"
        "        return event\n"
        "    tz = event.get('event_timezone') or 'UTC'\n"
        "    if tz not in ('UTC', 'Z'):\n"
        "        sign = 1 if tz[0] == '+' else -1\n"
        "        dt -= timedelta(minutes=sign * (int(tz[1:3]) * 60\n"
        "                                        + int(tz[-2:])))\n"
        "    event['ts'] = dt\n"
        "    return event\n")}}
    dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
    return [level, None], {dates[0]: None,
                           dates[1]: {"__unconditional__": date_tz}}


def _zeek_ssl_hook(doc):
    # ingest/pipeline.yml: splitOnToken('v') -> tls.version[_protocol]
    return [_py(
        "v = event.get('zeek_ssl_version')\n"
        "parts = v.split('v') if v else []\n"
        "if len(parts) == 2:\n"
        "    if parts[0] == 'SSL':\n"
        "        event['tls_version'] = parts[1] + '.0'\n"
        "    else:\n"
        "        event['tls_version'] = parts[1][:1] + '.' + parts[1][1:]\n"
        "    event['tls_version_protocol'] = parts[0].lower()")], None


def _zeek_kerberos_hook(doc):
    # valid.days = round((until - from) / 86400)
    return [_py(
        "f, u = event.get('zeek_kerberos_valid_from'), "
        "event.get('zeek_kerberos_valid_until')\n"
        "if f is not None and u is not None:\n"
        "    event['zeek_kerberos_valid_days'] = "
        "int(round((u - f) / 86400))")], None


def _zeek_sip_hook(doc):
    # the only painless script strips null map values — a no-op in the
    # columnar model (absent == null)
    return [None], None


def _zeek_files_hook(doc):
    return [
        _py("ids = event.get('zeek_files_session_ids')\n"
            "if ids:\n"
            "    event['zeek_session_id'] = ids[0]"),
        _py("tx = event.get('zeek_files_tx_hosts')\n"
            "if tx:\n"
            "    event['zeek_files_tx_host'] = tx[0]\n"
            "event['zeek_files_tx_hosts'] = None"),
        _py("rx = event.get('zeek_files_rx_hosts')\n"
            "if rx:\n"
            "    event['zeek_files_rx_host'] = rx[0]\n"
            "event['zeek_files_rx_hosts'] = None"),
    ], None


def _zeek_connection_hook(doc):
    # all 7 painless scripts: duration scale, local_orig/resp tags,
    # packet/byte sums, direction matrix, state->message/type table READ
    # FROM THE MODULE'S OWN params
    state_params = [p["script"]["params"] for p in doc["processors"]
                    if "script" in p and p["script"].get("params")
                    and "S0" in p["script"]["params"]][0]
    return [
        _py("d = event.get('temp_duration')\n"
            "if d is not None:\n"
            "    event['event_duration'] = int(round(d * 1000000000))"),
        _py("if event.get('zeek_connection_local_orig'):\n"
            "    event['tags'] = (event.get('tags') or []) + ['local_orig']"),
        _py("if event.get('zeek_connection_local_resp'):\n"
            "    event['tags'] = (event.get('tags') or []) + ['local_resp']"),
        _py("sp, dp = event.get('source_packets'), "
            "event.get('destination_packets')\n"
            "if sp is not None and dp is not None:\n"
            "    event['network_packets'] = sp + dp"),
        _py("sb, db = event.get('source_bytes'), "
            "event.get('destination_bytes')\n"
            "if sb is not None and db is not None:\n"
            "    event['network_bytes'] = sb + db"),
        _py("lo = event.get('zeek_connection_local_orig')\n"
            "lr = event.get('zeek_connection_local_resp')\n"
            "if lo is not None and lr is not None:\n"
            "    event['network_direction'] = (\n"
            "        'internal' if lo and lr else\n"
            "        'outbound' if lo else\n"
            "        'inbound' if lr else 'external')"),
        _py("st = event.get('zeek_connection_state')\n"
            f"table = {state_params!r}\n"
            "if st is not None and st in table:\n"
            "    event['zeek_connection_state_message'] = "
            "table[st]['conn_str']\n"
            "    event['event_type'] = table[st]['types']"),
    ], None


def _zeek_x509_hook(doc):
    # pure params-table lookup; table read from the module's own yml
    params = next(p["script"]["params"] for p in doc["processors"]
                  if "script" in p)
    src = ("def process(event, params):\n"
           f"    table = {params!r}\n"
           "    algo = table.get(event.get('file_x509_signature_algorithm'))\n"
           "    if algo is not None:\n"
           "        event['file_x509_signature_algorithm'] = algo\n"
           "    return event\n")
    return [{"script": {"source": src}}], None


def _checkpoint_firewall_hook(doc):
    # Reuses the query catalogue's vectorized ports (iana table parsed from
    # the module's own painless; ES subtree copies as prefix column copies)
    from .pipelines.queries import _checkpoint_hook_parts
    return _checkpoint_hook_parts(doc)


FILESET_HOOKS = {
    ("apache", "access"): _apache_access_hook,
    ("apache", "error"): _apache_error_hook,
    ("checkpoint", "firewall"): _checkpoint_firewall_hook,
    ("zeek", "ssl"): _zeek_ssl_hook,
    ("zeek", "kerberos"): _zeek_kerberos_hook,
    ("zeek", "sip"): _zeek_sip_hook,
    ("zeek", "files"): _zeek_files_hook,
    ("zeek", "connection"): _zeek_connection_hook,
    ("zeek", "x509"): _zeek_x509_hook,
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
    cfg_path, pipe_paths = fileset_paths(module_dir, fileset, vars)
    cfg = load_fileset_config(cfg_path, mvars)

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

    sub_scripts = sub_overrides = None
    if scripts is None and overrides is None and pipe_paths:
        hook = FILESET_HOOKS.get((module, fileset))
        if hook is not None:
            parts = hook(load_pipeline_yml(pipe_paths[0], mvars))
            if isinstance(parts, dict):  # sub-pipeline-aware hook
                scripts = parts.get("scripts")
                overrides = parts.get("overrides")
                sub_scripts = parts.get("sub_scripts")
                sub_overrides = parts.get("sub_overrides")
            else:
                scripts, overrides = parts

    if pipe_paths:
        by_name = {os.path.splitext(os.path.basename(p))[0]: p
                   for p in pipe_paths}
        spec += compile_ingest(
            load_pipeline_yml(pipe_paths[0], mvars), scripts=scripts,
            overrides=overrides,
            pipeline_loader=fileset_pipeline_loader(
                os.path.join(fs_dir, "ingest"), sub_scripts, sub_overrides,
                by_name=by_name, vars=mvars))
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": module, "event.dataset": f"{module}.{fileset}",
        "fileset.name": fileset, "input.type": "log",
        "service.type": module}}})
    if extra_spec:
        spec += extra_spec
    return spec, mvars
