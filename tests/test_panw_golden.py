"""panw/panos module goldens — ALL 10 fixtures through the module's own
config/input.yml (Go-template rendered with input=file; the else-if/eq
dispatch) + ingest/pipeline.yml with its five per-type sub-pipelines
(traffic/threat/globalprotect/userid/hipmatch) compiled by
beats_ray.ingest.  Hand-ported painless (3 scripts, root pipeline order):
the flags-bitfield -> labels.* expansion (bit params parsed from the
module's own yml), seconds->nanos duration + event.end, and the
source.user -> user deep copy.

Reference: x-pack/filebeat/module/panw/panos/{config/input.yml,
ingest/pipeline.yml} — the earlier hand-built TRAFFIC/THREAT goldens in
test_reference_golden.py stay as independent checks of the same chains.
"""
import json
import os

import pyarrow as pa
import pytest

from beats_ray.ingest import (compile_ingest, config_processors,
                              load_pipeline_yml, manifest_vars)
from beats_ray.pipeline import Pipeline

from test_zeek_golden import _terminated_lines, check_golden

PANW = "/root/reference/x-pack/filebeat/module/panw/panos"

pytestmark = pytest.mark.skipif(not os.path.isdir(PANW),
                                reason="reference not present")


def _py(src):
    return {"script": {"source": "def process(event, params):\n" + "".join(
        "    " + ln + "\n" for ln in src.splitlines()) + "    return event\n"}}


def _flags_script(params):
    # 'Extract flags bitfield into labels' — bit values from the module yml
    lines = ["v = event.get('_temp__labels')", "if v:"]
    for name, bit in params.items():
        lines.append(f"    if v & {int(bit)}:")
        lines.append(f"        event['labels_{name}'] = True")
    return _py("\n".join(lines))


DURATION_END = _py(
    "from datetime import timedelta\n"
    "d = event.get('event_duration')\n"
    "if d is not None:\n"
    "    nanos = int(d) * 10**9\n"
    "    event['event_duration'] = nanos\n"
    "    st = event.get('event_start')\n"
    "    if st is not None:\n"
    "        event['event_end'] = st + timedelta(microseconds=nanos // 1000)")

COPY_USER = _py(
    "for k in list(event):\n"
    "    if k.startswith('source_user_') and event[k] is not None:\n"
    "        event['user_' + k[len('source_user_'):]] = event[k]")

_cache = {}


def _spec():
    if "spec" not in _cache:
        vars = manifest_vars(f"{PANW}/manifest.yml")
        vars["input"] = "file"
        cfg = []
        for p in config_processors(f"{PANW}/config/input.yml", vars):
            if "add_locale" in p:  # goldens were generated under TZ=-02:00
                p = {"add_fields": {"target": "",
                                    "fields": {"event.timezone": "-02:00"}}}
            cfg.append(p)
        doc = load_pipeline_yml(f"{PANW}/ingest/pipeline.yml")
        flags = next(p["script"]["params"] for p in doc["processors"]
                     if "script" in p and "params" in p["script"]
                     and "pcap_included" in p["script"]["params"])
        loader = (lambda name: compile_ingest(
            load_pipeline_yml(f"{PANW}/ingest/{name}.yml")))
        ingest = compile_ingest(
            doc, scripts=[_flags_script(flags), DURATION_END, COPY_USER],
            pipeline_loader=loader)
        _cache["spec"] = {"processors": cfg + ingest + [
            {"add_fields": {"target": "", "fields": {
                "event.module": "panw", "event.dataset": "panw.panos",
                "fileset.name": "panos", "input.type": "log",
                "service.type": "panw", "tags": vars["tags"]}}}]}
    return _cache["spec"]


FIXTURES = sorted(f[:-len("-expected.json")]
                  for f in os.listdir(f"{PANW}/test")
                  if f.endswith("-expected.json"))


@pytest.mark.parametrize("logname", FIXTURES)
def test_panw_panos_golden(logname):
    path = f"{PANW}/test/{logname}"
    lines = [ln for ln in _terminated_lines(path) if ln.strip()]
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
    })
    out = Pipeline(_spec()).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    check_golden(rows[:len(expected)], expected)
