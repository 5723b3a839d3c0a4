"""sophos/xg module goldens — the fileset's ingest/pipeline.yml plus its
eleven log_type sub-pipelines compiled by beats_ray.ingest; all 11
fixtures.  Hand-ported painless: key-name lowercasing, the duration/start/
end computation, the sentinel sweep (params from the module's own yml) and
the serial_number -> host.name mapping driven by the manifest's
known_devices/default_host_name vars (the `_conf` the config injects).
"""
import json
import os

import pyarrow as pa
import pytest

from beats_ray.ingest import (compile_ingest, load_pipeline_yml,
                              manifest_vars)
from beats_ray.pipeline import Pipeline

from test_zeek_golden import _terminated_lines, check_golden

XG = "/root/reference/x-pack/filebeat/module/sophos/xg"

pytestmark = pytest.mark.skipif(not os.path.isdir(XG),
                                reason="reference not present")


def _py(src):
    return {"script": {"source": "def process(event, params):\n" + "".join(
        "    " + ln + "\n" for ln in src.splitlines()) + "    return event\n"}}


LOWER_KEYS = _py(
    "for k in list(event):\n"
    "    if k.startswith('sophos_xg_') and k != k.lower():\n"
    "        event[k.lower()] = event[k]\n"
    "        event[k] = None")

DURATION = _py(
    "from datetime import timedelta as _td\n"
    "d = event.get('sophos_xg_duration')\n"
    "if d is not None:\n"
    "    event['event_duration'] = int(d) * 10**9\n"
    "    ts = event.get('ts')\n"
    "    if ts is not None:\n"
    "        event['event_start'] = ts.strftime('%Y-%m-%dT%H:%M:%S.') + \\\n"
    "            ('%03d' % (ts.microsecond // 1000)) + 'Z'\n"
    "        en = ts + _td(seconds=int(d))\n"
    "        event['event_end'] = en.strftime('%Y-%m-%dT%H:%M:%S.') + \\\n"
    "            ('%03d' % (en.microsecond // 1000)) + 'Z'")

SUM_BYTES = _py(
    "sb, db = event.get('source_bytes'), event.get('destination_bytes')\n"
    "if sb is not None and db is not None:\n"
    "    event['network_bytes'] = int(sb) + int(db)")
SUM_PACKETS = _py(
    "sp, dp = event.get('source_packets'), event.get('destination_packets')\n"
    "if sp is not None and dp is not None:\n"
    "    event['network_packets'] = int(sp) + int(dp)")


WAF_DURATION = _py(
    "rt = event.get('sophos_xg_responsetime')\n"
    "if rt is not None and int(rt) > 0:\n"
    "    event['event_duration'] = int(rt) * 1000")


def _loader(name):
    return compile_ingest(load_pipeline_yml(f"{XG}/ingest/{name}.yml"),
                          scripts=[WAF_DURATION] if name == "waf" else None,
                          pipeline_loader=_loader)


FIXTURES = ["anti-spam.log", "anti-virus.log", "atp.log", "cfilter.log",
            "event.log", "firewall.log", "idp.log", "sandbox.log",
            "system-health.log", "waf.log", "wifi.log"]


@pytest.mark.parametrize("log", FIXTURES)
def test_sophos_xg_golden(log):
    vars = manifest_vars(f"{XG}/manifest.yml")
    doc = load_pipeline_yml(f"{XG}/ingest/pipeline.yml")
    sweep_vals = [p["script"]["params"]["values"] for p in doc["processors"]
                  if "script" in p and p["script"].get("params")][0]
    sweep = _py(
        f"sent = {sweep_vals!r}\n"
        "for k in list(event):\n"
        "    if k.startswith('sophos_xg_') and event[k] in sent:\n"
        "        event[k] = None")
    host_map = _py(
        f"mappings = {vars['known_devices']!r}\n"
        f"default = {vars['default_host_name']!r}\n"
        "serial = event.get('observer_serial_number')\n"
        "name = default\n"
        "for item in mappings:\n"
        "    if item['serial_number'] == str(serial):\n"
        "        name = item['hostname']\n"
        "        break\n"
        "event['host_name'] = name")
    dates = [i for i, p in enumerate(doc["processors"]) if "date" in p
             and p["date"].get("field") == "_temp_.time"]
    # Java's `z` format throws on ambiguous zone abbreviations (the three
    # "... IST" eventtime rows): the whole doc fails in ES and the golden
    # EXCLUDES it — mark those rows and drop them after the run
    badzone = _py(
        "import re as _re\n"
        "v = event.get('_temp__time')\n"
        "if v is not None and _re.search(r' [A-Z]{2,5}$', v):\n"
        "    event['_badzone'] = True\n"
        "    event['_temp__time'] = None")
    overrides = {
        dates[0]: [badzone, {"timestamp": {
            "field": "_temp_.time", "target_field": "@timestamp",
            "layouts": ["ISO8601", "%Y-%m-%d %H:%M:%S %z"],
            "ignore_failure": True,
            "timezone": "-02:00"}}],
        dates[1]: None,
    }
    spec = compile_ingest(
        doc, scripts=[LOWER_KEYS, DURATION, sweep, host_map,
                      SUM_BYTES, SUM_PACKETS],
        overrides=overrides, pipeline_loader=_loader)
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": "sophos", "event.dataset": "sophos.xg",
        "fileset.name": "xg", "input.type": "log",
        "service.type": "sophos", "event.timezone": "-02:00"}}})
    logp = f"{XG}/test/{log}"
    lines = _terminated_lines(logp)
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "tags": pa.array([sorted(vars.get("tags") or [])] * len(lines),
                         pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    expected = json.load(open(logp + "-expected.json"))
    # a few fixture docs are absent from the golden (ES-side indexing
    # rejections the pipeline itself cannot see) — align by event.original,
    # which preserve_original_event keeps on every doc
    by_orig = {}
    for r in out.to_pylist():
        by_orig.setdefault(r.get("event_original"), []).append(r)
    rows = []
    for e in expected:
        cand = by_orig.get(e.get("event.original"))
        assert cand, f"no row for {str(e.get('event.original'))[:80]!r}"
        rows.append(cand.pop(0))
    check_golden(rows, expected)
