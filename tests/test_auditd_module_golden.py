"""auditd/log MODULE goldens — the fileset's ES ingest pipeline (grok +
double-kv + hex/quote normalization + the syscall/record-type
categorization table) compiled by beats_ray.ingest over all reference
fixtures.  The four painless scripts are hand-ported; their DATA (the
possibleHexKeys list, quote params, the types/syscalls categorization
table) is read from the module's own pipeline.yml.  The auditd PARSER
stage (stages/auditd.py) covers the auparse semantics separately
(test_auditd.py, 9/9); this exercises the module's server-side pipeline.
"""
import glob
import json
import os
import re

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline

from test_zeek_golden import _terminated_lines, check_golden

AU = "/root/reference/filebeat/module/auditd/log"

pytestmark = pytest.mark.skipif(not os.path.isdir(AU),
                                reason="reference not present")


def _py(src):
    return {"script": {"source": "def process(event, params):\n" + "".join(
        "    " + ln + "\n" for ln in src.splitlines()) + "    return event\n"}}


def _scripts_and_overrides():
    doc = load_pipeline_yml(f"{AU}/ingest/pipeline.yml")
    procs = doc["processors"]
    s8 = [p for p in procs if "script" in p][0]["script"]
    hex_keys = re.search(r"possibleHexKeys = \[([^\]]+)\]",
                         s8["source"]).group(1)
    hex_keys = [k.strip().strip('"') for k in hex_keys.split(",")]
    cat = [p["script"]["params"] for p in procs
           if "script" in p and p["script"].get("params", {}).get("types")][0]

    normalize = _py(
        f"hex_keys = {hex_keys!r}\n"
        "def unhex(v):\n"
        "    if not v or len(v) % 2 or any(c not in '0123456789abcdefABCDEF'"
        " for c in v):\n"
        "        return None\n"
        "    out, needed = [], False\n"
        "    for i in range(0, len(v) - 1, 2):\n"
        "        cp = int(v[i:i + 2], 16)\n"
        "        if cp < 33 or cp == 34 or cp == 127:\n"
        "            needed = True\n"
        "        if cp < 32 or cp == 127:\n"
        "            out.append('^')\n"
        "            cp ^= 64\n"
        "        out.append(chr(cp))\n"
        "    return ''.join(out) if needed else v\n"
        "for k in list(event):\n"
        "    if not k.startswith('auditd_log_') or k in ("
        "'auditd_log_kv', 'auditd_log_sub_kv', 'auditd_log_epoch'):\n"
        "        continue\n"
        "    v = event[k]\n"
        "    if v in ('?', '(null)', ''):\n"
        "        event[k] = None\n"
        "        continue\n"
        "    if not isinstance(v, str):\n"
        "        continue\n"
        "    short = k[len('auditd_log_'):]\n"
        "    if short.replace('_', '-') in hex_keys or short in hex_keys:\n"
        "        h = unhex(v)\n"
        "        if h is not None:\n"
        "            v = h\n"
        "    if v[:1] in ('\\'', '\"'):\n"
        "        v = v[1:]\n"
        "    if v[-1:] in ('\\'', '\"'):\n"
        "        v = v[:-1]\n"
        "    if short == 'arch' and v == 'c000003e':\n"
        "        v = 'x86_64'\n"
        "    event[k] = v")

    categorize = _py(
        f"params = {cat!r}\n"
        "rt = event.get('auditd_log_record_type')\n"
        "if rt is None:\n"
        "    return event\n"
        "def g(short):\n"
        "    v = event.get('auditd_log_' + short.replace('-', '_'))\n"
        "    if isinstance(v, list) and len(v) == 1:\n"
        "        return v[0]  # per-doc scalar; the kv merge lifted the\n"
        "        # column to list for the rows where BOTH kv passes hit\n"
        "    return v\n"
        "acts = params['types'].get(rt)\n"
        "if acts is None and g('syscall') is not None:\n"
        "    acts = params['syscalls'].get(g('syscall'))\n"
        "    if acts is None:\n"
        "        acts = params['syscalls'].get('*')\n"
        "if acts is None:\n"
        "    return event\n"
        "act = None\n"
        "for a in acts:\n"
        "    need = a.get('has_fields')\n"
        "    if not need or all(g(f) is not None for f in need):\n"
        "        act = a\n"
        "        break\n"
        "if act is None:\n"
        "    return event\n"
        "for k, v in (act.get('event') or {}).items():\n"
        "    event['event_' + k] = v\n"
        "copies = []\n"
        "for c in act.get('copy') or []:\n"
        "    value = None\n"
        "    for src in c['from']:\n"
        "        if value is None:\n"
        "            value = g(src)\n"
        "    if value is not None and isinstance(value, str):\n"
        "        import re as _re\n"
        "        suffix = '.id' if _re.fullmatch(r'[0-9]+', value) "
        "else '.name'\n"
        "        copies.append({'target': c['to'] + suffix, "
        "'value': value})\n"
        "for c in copies:\n"
        "    event[c['target'].replace('.', '_')] = c['value']")

    args_count = _py(
        "a = event.get('process_args')\n"
        "if isinstance(a, list):\n"
        "    event['process_args_count'] = len(a)")

    execve = _py(
        "import re as _re\n"
        "if event.get('auditd_log_record_type') != 'EXECVE':\n"
        "    return event\n"
        "rx = _re.compile(r'^a([0-9]+)(.*)$')\n"
        "args = []\n"
        "for k in list(event):\n"
        "    if not k.startswith('auditd_log_'):\n"
        "        continue\n"
        "    m = rx.match(k[len('auditd_log_'):])\n"
        "    if not m:\n"
        "        continue\n"
        "    v = event[k]\n"
        "    if v is None:\n"
        "        continue\n"
        "    event[k] = None\n"
        "    if m.group(2) == '_len':\n"
        "        continue\n"
        "    args.append((int(m.group(1)), v))\n"
        "if not args:\n"
        "    return event\n"
        "args.sort()\n"
        "vals = [v for _, v in args]\n"
        "first = args[0][0]\n"
        "if first == 0:\n"
        "    event['process_executable'] = vals[0]\n"
        "else:\n"
        "    vals.insert(0, '[... %d truncated arguments ...]' % first)\n"
        "event['process_args'] = vals")

    fe = [i for i, p in enumerate(procs) if "foreach" in p][0]
    # foreach #19 re-applies auditd.log.copy — categorize already set the
    # dynamic targets, so the foreach collapses into it
    return [normalize, categorize, args_count, execve], {fe: None}


@pytest.mark.parametrize("log", sorted(
    os.path.basename(p[:-len("-expected.json")])
    for p in glob.glob(f"{AU}/test/*-expected.json")))
def test_auditd_log_module_golden(log):
    scripts, overrides = _scripts_and_overrides()
    spec = compile_ingest(load_pipeline_yml(f"{AU}/ingest/pipeline.yml"),
                          scripts=scripts, overrides=overrides)
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": "auditd", "event.dataset": "auditd.log",
        "fileset.name": "log", "input.type": "log",
        "service.type": "auditd", "event.timezone": "-02:00",
        "ecs.version": "1.12.0"}}})
    logp = f"{AU}/test/{log}"
    lines = _terminated_lines(logp)
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    expected = json.load(open(logp + "-expected.json"))
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    check_golden(rows[:len(expected)], expected)
