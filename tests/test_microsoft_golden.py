"""microsoft module goldens (defender_atp / m365_defender) — each fileset's
ingest/pipeline.yml compiled by beats_ray.ingest over the module's own
fixtures; the httpjson input decodes each line under the `json` prefix.
Painless scripts hand-ported: the sentinel-value entry sweep (params table
read from the module's own yml), the null sweep (columnar no-op) and the
event.duration = nanos(start..end) computation.
"""
import json
import os

import pyarrow as pa
import pytest

from beats_ray.ingest import (compile_ingest, load_pipeline_yml,
                              manifest_vars)
from beats_ray.pipeline import Pipeline

from test_zeek_golden import _terminated_lines, check_golden

MS = "/root/reference/x-pack/filebeat/module/microsoft"

pytestmark = pytest.mark.skipif(not os.path.isdir(MS),
                                reason="reference not present")


def _py(src):
    return {"script": {"source": "def process(event, params):\n" + "".join(
        "    " + ln + "\n" for ln in src.splitlines()) + "    return event\n"}}


DURATION = _py(
    "from datetime import datetime as _dt\n"
    "def _ns(s):\n"
    "    s = s.replace('Z', '+00:00')\n"
    "    frac = 0\n"
    "    if '.' in s:\n"
    "        head, rest = s.split('.', 1)\n"
    "        i = rest.find('+') if '+' in rest else rest.find('-')\n"
    "        digits, tz = (rest[:i], rest[i:]) if i >= 0 else (rest, '')\n"
    "        frac = int((digits + '0' * 9)[:9])  # ES keeps 7-digit fracs\n"
    "        s = head + tz\n"
    "    base = _dt.strptime(s, '%Y-%m-%dT%H:%M:%S%z')\n"
    "    return int(base.timestamp()) * 10**9 + frac\n"
    "st, en = event.get('event_start'), event.get('event_end')\n"
    "if st is not None and en is not None:\n"
    "    event['event_duration'] = _ns(en) - _ns(st)")


def _sweep(prefix, values):
    """entrySet().removeIf(value in params.values) over flattened json_*"""
    return _py(
        f"sent = {values!r}\n"
        "for k in list(event):\n"
        f"    if k.startswith('{prefix}') and event[k] in sent:\n"
        "        event[k] = None")


def run_ms(fs, log, scripts):
    vars = manifest_vars(f"{MS}/{fs}/manifest.yml")
    spec = [
        {"add_fields": {"target": "", "fields": {
            "event.timezone": "-02:00", "ecs.version": "1.12.0"}}},
        {"decode_json_fields": {"fields": ["message"], "target": "json",
                                "keep_arrays": True, "max_depth": 99}},
    ]
    spec += compile_ingest(load_pipeline_yml(f"{MS}/{fs}/ingest/pipeline.yml"),
                           scripts=scripts)
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": "microsoft", "event.dataset": f"microsoft.{fs}",
        "fileset.name": fs, "input.type": "log",
        "service.type": "microsoft"}}})
    lines = _terminated_lines(log)
    tags = sorted(vars.get("tags") or [])
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "tags": pa.array([tags] * len(lines), pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    expected = json.load(open(log + "-expected.json"))
    # golden arrays are sorted; m365 splits one alert into per-entity docs
    # sharing event.original — disambiguate on the entity type/value
    def gk(r):
        return (str(r.get("event_original") or r.get("message")),
                str(r.get("microsoft_m365_defender_alerts_entities_entityType")),
                str(sorted((k, str(v)) for k, v in r.items()
                           if v is not None and "entities" in k)))

    def ek(e):
        return (str(e.get("event.original") or e.get("message")),
                str(e.get("microsoft.m365_defender.alerts.entities.entityType")),
                str(sorted((k.replace(".", "_"), str(v))
                           for k, v in e.items() if "entities" in k)))

    rows = sorted(out.to_pylist(), key=gk)
    expected = sorted(expected, key=ek)
    return rows[:len(expected)], expected


def test_microsoft_defender_atp_golden():
    doc = load_pipeline_yml(f"{MS}/defender_atp/ingest/pipeline.yml")
    sweeps = [p["script"]["params"]["values"] for p in doc["processors"]
              if "script" in p and p["script"].get("params")]
    scripts = [
        _sweep("json_", sweeps[0]),
        _sweep("json_evidence_", sweeps[1]),
        DURATION,
    ]
    rows, expected = run_ms(
        "defender_atp", f"{MS}/defender_atp/test/defender_atp-test.json.log",
        scripts=scripts)
    check_golden(rows, expected)


@pytest.mark.parametrize("log", ["m365_defender-test.ndjson.log",
                                 "m365_defender-test-empty.ndjson.log"])
def test_microsoft_m365_defender_golden(log):
    scripts = [None, DURATION]  # null sweep is a columnar no-op
    rows, expected = run_ms("m365_defender", f"{MS}/m365_defender/test/{log}",
                            scripts=scripts)
    check_golden(rows, expected)
