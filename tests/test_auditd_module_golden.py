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


# the port lives in the shipped hook registry (promoted round 5)
from beats_ray.fileset_hooks import _auditd_log_hook


def _scripts_and_overrides():
    return _auditd_log_hook(load_pipeline_yml(f"{AU}/ingest/pipeline.yml"))


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
