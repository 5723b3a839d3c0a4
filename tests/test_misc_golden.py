"""Assorted single-fileset module goldens via the ES-ingest compiler:
aws/cloudwatch, aws/ec2 (grok + ISO date pipelines) and
elasticsearch/querylog (filestream ndjson parser with keys-under-root;
nested-format expected file flattened for comparison).
"""
import datetime as _dt
import glob
import json
import os

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline

from test_zeek_golden import _terminated_lines, check_golden

XP = "/root/reference/x-pack/filebeat/module"
FB = "/root/reference/filebeat/module"

pytestmark = pytest.mark.skipif(not os.path.isdir(XP),
                                reason="reference not present")


def _py(src):
    return {"script": {"source": "def process(event, params):\n" + "".join(
        "    " + ln + "\n" for ln in src.splitlines()) + "    return event\n"}}


def run_simple(module, fs, log, base=XP, scripts=None, overrides=None,
               pre=None, tags=("forwarded",)):
    spec = list(pre or [])
    spec += compile_ingest(
        load_pipeline_yml(f"{base}/{module}/{fs}/ingest/pipeline.yml"),
        scripts=scripts, overrides=overrides)
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": module, "event.dataset": f"{module}.{fs}",
        "fileset.name": fs, "input.type": "log",
        "service.type": module}}})
    lines = _terminated_lines(log)
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "tags": pa.array([list(tags)] * len(lines), pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    expected = json.load(open(log + "-expected.json"))
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    return rows[:len(expected)], expected


def test_aws_cloudwatch_golden():
    log = glob.glob(f"{XP}/aws/cloudwatch/test/*.log")[0]
    rows, expected = run_simple("aws", "cloudwatch", log)
    check_golden(rows, expected)


def test_aws_ec2_golden():
    log = glob.glob(f"{XP}/aws/ec2/test/*.log")[0]
    rows, expected = run_simple("aws", "ec2", log)
    check_golden(rows, expected)


def _flatten_expected(doc, prefix=""):
    """new-style nested expected docs -> the flat dotted-key shape the
    shared check_golden compares (lists of scalars stay lists; lists of
    dicts stay values)."""
    out = {}
    for k, v in doc.items():
        key = prefix + k
        if isinstance(v, dict):
            out.update(_flatten_expected(v, key + "."))
        else:
            out[key] = v
    return out


def test_elasticsearch_querylog_golden():
    """elasticsearch/querylog — filestream ndjson parser with
    keys-under-root + expand_keys; the ingest pipeline only stamps
    event.created/ingested (harness-owned).  The expected file is the
    NESTED golden format — flattened before comparison; agent/host/
    event.created/log.* keys are harness-owned."""
    log = f"{FB}/elasticsearch/querylog/test/test.log"
    ts_fix = _py(
        "from datetime import datetime as _d\n"
        "v = event.get('@timestamp')\n"
        "if isinstance(v, str):\n"
        "    s = v.replace('Z', '+00:00')\n"
        "    dt = _d.fromisoformat(s)\n"
        "    event['ts'] = dt.replace(tzinfo=None)\n"
        "    event['@timestamp'] = None")
    pre = [
        {"decode_json_fields": {"fields": ["message"], "target": "",
                                "keep_arrays": True, "max_depth": 99}},
        ts_fix,
        {"drop_fields": {"fields": ["message"], "ignore_missing": True}},
        {"add_fields": {"target": "", "fields": {"ecs.version": "1.12.0"}}},
    ]
    spec = pre + compile_ingest(
        load_pipeline_yml(f"{FB}/elasticsearch/querylog/ingest/pipeline.yml"))
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": "elasticsearch",
        "event.dataset": "elasticsearch.querylog",
        "fileset.name": "querylog", "input.type": "filestream",
        "service.type": "elasticsearch"}}})
    lines = _terminated_lines(log)
    batch = pa.table({"message": lines,
                      "line_no": pa.array(range(len(lines)), pa.int64())})
    out = Pipeline({"processors": spec}).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = [_flatten_expected(d)
                for d in json.load(open(log + "-expected.json"))]
    check_golden(rows[:len(expected)], expected,
                 skip=("event.created", "input.type"))


CT = f"{XP}/aws/cloudtrail"

JAVA_STR = (
    # Java HashMap.toString: keys iterate in BUCKET order (String.hashCode
    # spread into capacity-16+ buckets, insertion order within a bucket) —
    # verified against the reference goldens' rendered maps
    "def _jhash(s):\n"
    "    h = 0\n"
    "    for c in s:\n"
    "        h = (31 * h + ord(c)) & 0xFFFFFFFF\n"
    "    return h ^ (h >> 16)\n"
    "def _jorder(keys):\n"
    "    cap = 16\n"
    "    while len(keys) > 0.75 * cap:\n"
    "        cap *= 2\n"
    "    return sorted(keys, key=lambda k: (_jhash(k) & (cap - 1),"
    " keys.index(k)))\n"
    "def _jv(v):\n"
    "    if v is None:\n"
    "        return 'null'\n"
    "    if isinstance(v, bool):\n"
    "        return 'true' if v else 'false'\n"
    "    if isinstance(v, dict):\n"
    "        ks = _jorder(list(v))\n"
    "        return '{' + ', '.join(k + '=' + _jv(v[k]) for k in ks) + '}'\n"
    "    if isinstance(v, list):\n"
    "        return '[' + ', '.join(_jv(x) for x in v) + ']'\n"
    "    return str(v)\n"
    "def _flat(dst, prefix, v):\n"
    "    if isinstance(v, dict):\n"
    "        for k, x in v.items():\n"
    "            _flat(dst, prefix + '_' + k.replace('.', '_'), x)\n"
    "    else:\n"
    "        dst[prefix] = v\n")


@pytest.mark.skipif(not os.path.isdir(CT), reason="reference not present")
@pytest.mark.parametrize("log", sorted(
    os.path.basename(p[:-len("-expected.json")])
    for p in glob.glob(f"{CT}/test/*-expected.json")))
def test_aws_cloudtrail_golden(log):
    """aws/cloudtrail — ALL fixtures through the compiled ingest pipeline.
    Hand-ported painless: the request/response flattening (Java
    Map.toString rendering, insertion-ordered — values re-parsed from
    event.original so ordering survives the columnar flatten), the
    ConsoleLogin additional_eventdata fold, and the ECS categorization
    driven by the action table read from the module's own yml."""
    from beats_ray.fileset_hooks import _aws_cloudtrail_hook
    doc = load_pipeline_yml(f"{CT}/ingest/pipeline.yml")
    scripts, _ = _aws_cloudtrail_hook(doc)  # the SHIPPED port
    spec = compile_ingest(doc, scripts=scripts)
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": "aws", "event.dataset": "aws.cloudtrail",
        "fileset.name": "cloudtrail", "input.type": "log",
        "service.type": "aws"}}})
    logp = f"{CT}/test/{log}"
    lines = _terminated_lines(logp)
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "tags": pa.array([["forwarded"]] * len(lines),
                         pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    expected = json.load(open(logp + "-expected.json"))
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    check_golden(rows[:len(expected)], expected)
