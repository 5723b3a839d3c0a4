"""o365/audit module goldens — the LAST uncovered reference module (round-4
verdict item 1).  The module's REAL 1104-line config/pipeline.js (the
PipelineBuilder / processor-registry JS API, constructor functions with
`this`, register(params) protocol, NameValuePair/ModifiedProperty array
folding, RecordType numeric-key mapping, DLP rule extraction) runs through
the mini-JS interpreter, around the module's own ingest/pipeline.yml
compiled by beats_ray.ingest — all 18 fixtures
(x-pack/filebeat/module/o365/audit/test/*.log-expected.json).

Only the ingest yml's two painless scripts are hand-ported (positional,
like every other compiled-module golden): the uri_parts->url merge loop;
the stringly-OperationProperties json decode is native to the compiler.
"""
import datetime as _dt
import json
import os
import re

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline
from test_zeek_golden import _terminated_lines, check_golden

O365 = "/root/reference/x-pack/filebeat/module/o365/audit"

pytestmark = pytest.mark.skipif(not os.path.isdir(O365),
                                reason="reference not present")

# painless: merge the uri_parts output (_temp_.url) into url.* without
# clobbering fields set earlier (ingest/pipeline.yml script #1)
URL_MERGE = {"script": {"source": (
    "def process(event, params):\n"
    "    pre = '_temp__url_'\n"
    "    for k in [k for k in list(event.keys()) if k.startswith(pre)]:\n"
    "        v = event.get(k)\n"
    "        event[k] = None\n"
    "        if v is None:\n"
    "            continue\n"
    "        tgt = 'url_' + k[len(pre):]\n"
    "        cur = event.get(tgt)\n"
    "        if cur is None:\n"
    "            event[tgt] = v\n"
    "        elif isinstance(cur, list):\n"
    "            if v not in cur:\n"
    "                event[tgt] = cur + [v]\n"
    "        elif not (isinstance(cur, str) and str(v) in cur):\n"
    "            event[tgt] = [cur, v]\n"
    "    return event\n")}}

_NAIVE_ISO = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$")


def build_spec():
    js = open(f"{O365}/config/pipeline.js").read()
    ingest = compile_ingest(load_pipeline_yml(f"{O365}/ingest/pipeline.yml"),
                            scripts=[URL_MERGE])
    # config/input.yml ("file" variant): ndjson -> o365audit, CreationTime
    # timestamp, then the module script; tags/ecs from the rendered config
    return {"processors": [
        {"decode_json_fields": {"fields": ["message"], "target": "json",
                                "keep_arrays": True, "max_depth": 99}},
        {"drop_fields": {"fields": ["message"], "ignore_missing": True}},
        {"rename": {"fields": [{"from": "json.error", "to": "error"}],
                    "ignore_missing": True, "fail_on_error": False}},
        {"rename": {"fields": [{"from": "json", "to": "o365audit"}],
                    "move_subtrees": True}},
        {"timestamp": {"field": "o365audit.CreationTime",
                       "layouts": ["%Y-%m-%dT%H:%M:%S"],
                       "target_field": "@timestamp",
                       "ignore_missing": True, "ignore_failure": True}},
        {"script": {"lang": "javascript", "source": js,
                    "params": {"debug": False, "tenants": []},
                    "when": {"has_fields": ["o365audit"]}}},
        {"add_fields": {"target": "", "fields": {"ecs.version": "1.12.0"}}},
    ] + ingest + [
        {"add_fields": {"target": "", "fields": {
            "event.module": "o365", "event.dataset": "o365.audit",
            "fileset.name": "audit", "input.type": "log",
            "service.type": "o365", "tags": ["forwarded"]}}},
    ]}


def flatten_row(r):
    """Dict row-values (JS Put of an object) -> flattened dotted columns,
    matching how ES renders nested maps in the expected JSON."""
    out = {}

    def put(k, v):
        if isinstance(v, dict):
            for kk, vv in v.items():
                put(k + "_" + kk, vv)
        else:
            out[k] = v

    for k, v in r.items():
        put(k, v)
    return out


def _align_naive_ts(rows, expected):
    """Goldens keep source timestamps as NAIVE ISO strings
    (o365.audit.CreationTime '2020-02-07T16:43:53'); the JSON decoder gives
    the engine a real timestamp.  When the instants agree, substitute the
    golden's string so the generic comparator sees equality."""
    for got, exp in zip(rows, expected):
        for key, want in exp.items():
            if not (isinstance(want, str) and _NAIVE_ISO.match(want)):
                continue
            col = key.replace(".", "_")
            gv = got.get(col)
            if isinstance(gv, _dt.datetime) and gv.tzinfo is None \
                    and gv == _dt.datetime.fromisoformat(want):
                got[col] = want


_spec_cache = {}


def run_fixture(logname):
    if "spec" not in _spec_cache:
        _spec_cache["spec"] = build_spec()
    path = f"{O365}/test/{logname}"
    lines = [ln for ln in _terminated_lines(path) if ln.strip()]
    batch = pa.table({"message": lines,
                      "line_no": pa.array(range(len(lines)), pa.int64())})
    out = Pipeline(_spec_cache["spec"]).run_local(batch)
    rows = [flatten_row(r) for r in
            sorted(out.to_pylist(), key=lambda r: r["line_no"])]
    expected = json.load(open(path + "-expected.json"))
    _align_naive_ts(rows, expected)
    return rows, expected


FIXTURES = sorted(f for f in os.listdir(f"{O365}/test")
                  if f.endswith(".log")) if os.path.isdir(O365) else []


@pytest.mark.parametrize("logname", FIXTURES)
def test_o365_audit_module_golden(logname):
    rows, expected = run_fixture(logname)
    assert len(rows) == len(expected)
    check_golden(rows, expected)
