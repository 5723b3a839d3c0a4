"""juniper/srx module goldens — the fileset's ingest/pipeline.yml plus its
six conditional sub-pipelines (flow/utm/idp/ids/atp/secintel) compiled by
beats_ray.ingest with a pipeline loader; all 6 fixtures.  Hand-ported
painless: kv-key dash->underscore normalization, event duration/start/end,
sentinel-value sweep (params from the module's own yml), flow byte/packet
sums.
"""
import json
import os

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline

from test_zeek_golden import _terminated_lines, check_golden

SRX = "/root/reference/x-pack/filebeat/module/juniper/srx"

pytestmark = pytest.mark.skipif(not os.path.isdir(SRX),
                                reason="reference not present")


def _py(src):
    return {"script": {"source": "def process(event, params):\n" + "".join(
        "    " + ln + "\n" for ln in src.splitlines()) + "    return event\n"}}


DASH_KEYS = _py(
    "for k in list(event):\n"
    "    if k.startswith('juniper_srx_') and '-' in k:\n"
    "        event[k.replace('-', '_')] = event[k]\n"
    "        event[k] = None")

DURATION = _py(
    "from datetime import timedelta as _td\n"
    "d = event.get('juniper_srx_duration')\n"
    "if d is not None:\n"
    "    ns = int(d) * 10**9\n"
    "    event['event_duration'] = ns\n"
    "    ts = event.get('ts')\n"
    "    if ts is not None:\n"
    "        iso = ts.strftime('%Y-%m-%dT%H:%M:%S.') + \\\n"
    "            ('%03d' % (ts.microsecond // 1000)) + 'Z'\n"
    "        event['event_start'] = iso\n"
    "        en = ts + _td(seconds=int(d))\n"
    "        event['event_end'] = en.strftime('%Y-%m-%dT%H:%M:%S.') + \\\n"
    "            ('%03d' % (en.microsecond // 1000)) + 'Z'")

FLOW_SCRIPTS = [
    _py("sb, db = event.get('source_bytes'), event.get('destination_bytes')\n"
        "if sb is not None and db is not None:\n"
        "    event['network_bytes'] = int(sb) + int(db)"),
    _py("cp, sp = event.get('client_packets'), event.get('server_packets')\n"
        "if cp is not None and sp is not None:\n"
        "    event['network_packets'] = int(cp) + int(sp)"),
]


def _loader(name):
    return compile_ingest(load_pipeline_yml(f"{SRX}/ingest/{name}.yml"),
                          scripts=list(FLOW_SCRIPTS) if name == "flow"
                          else None, pipeline_loader=_loader)


@pytest.mark.parametrize("log", ["flow.log", "utm.log", "idp.log",
                                 "ids.log", "atp.log", "secintel.log"])
def test_juniper_srx_golden(log):
    doc = load_pipeline_yml(f"{SRX}/ingest/pipeline.yml")
    sweep_vals = [p["script"]["params"]["values"] for p in doc["processors"]
                  if "script" in p and p["script"].get("params")][0]
    sweep = _py(
        f"sent = {sweep_vals!r}\n"
        "for k in list(event):\n"
        "    if k.startswith('juniper_srx_') and event[k] in sent:\n"
        "        event[k] = None")
    dates = [i for i, p in enumerate(doc["processors"]) if "date" in p
             and p["date"].get("field") == "_temp_.raw_date"]
    overrides = {
        dates[0]: {"timestamp": {
            "field": "_temp_.raw_date", "target_field": "@timestamp",
            "layouts": ["ISO8601", "%Y-%m-%d %H:%M:%S %Z",
                        "%Y-%m-%d %H:%M:%S %z", "%Y-%m-%d %H:%M:%S"],
            "timezone": "-02:00"}},
        dates[1]: None,
    }
    spec = compile_ingest(doc, scripts=[DASH_KEYS, DURATION, sweep],
                          overrides=overrides, pipeline_loader=_loader)
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": "juniper", "event.dataset": "juniper.srx",
        "fileset.name": "srx", "input.type": "log",
        "service.type": "juniper", "event.timezone": "-02:00"}}})
    logp = f"{SRX}/test/{log}"
    lines = _terminated_lines(logp)
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "tags": pa.array([["forwarded", "juniper.srx"]] * len(lines),
                         pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    expected = json.load(open(logp + "-expected.json"))
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    check_golden(rows[:len(expected)], expected)
