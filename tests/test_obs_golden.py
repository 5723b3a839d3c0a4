"""Fixture-level completion, observability modules (round 5): kibana/audit
(4 fixtures), logstash/log (3), osquery/result (4), iis/error (3) — all
through each module's own compiled ingest pipeline."""
import json
import os
import re

import pyarrow as pa
import pytest
import yaml

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline
from test_zeek_golden import _terminated_lines, check_golden

MOD = "/root/reference/filebeat/module"

pytestmark = pytest.mark.skipif(not os.path.isdir(MOD),
                                reason="reference not present")

_specs = {}


def _fixtures(mod, fs):
    d = f"{MOD}/{mod}/{fs}/test"
    return sorted(f[:-len("-expected.json")] for f in os.listdir(d)
                  if f.endswith("-expected.json")) if os.path.isdir(d) else []


def _final(mod, fs, service=None):
    return {"add_fields": {"target": "", "fields": {
        "event.module": mod, "event.dataset": f"{mod}.{fs}",
        "fileset.name": fs, "input.type": "log",
        "service.type": service or mod, "ecs.version": "1.12.0"}}}


def _run(spec, path, skip=(), pre=None, tz=None):
    lines = [ln for ln in _terminated_lines(path) if ln.strip()]
    cols = {"message": lines,
            "line_no": pa.array(range(len(lines)), pa.int64())}
    if tz:
        cols["event_timezone"] = pa.array([tz] * len(lines), pa.string())
    batch = pa.table(cols)
    if pre:
        batch = Pipeline({"processors": pre}).run_local(batch)
    out = Pipeline(spec).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    check_golden(rows[:len(expected)], expected, skip=skip)


# ----------------------------------------------------------------- kibana

# ctx.json merge-to-root: json decoded under "json" (config level), the
# script merges every json.* member into the root, json values winning
KIBANA_MERGE = {"script": {"source": (
    "def process(event, params):\n"
    "    from datetime import datetime, timezone\n"
    "    for k in [k for k in list(event.keys()) if k.startswith('json_')]:\n"
    "        v = event.pop(k)\n"
    "        if v is None:\n"
    "            continue\n"
    "        tgt = k[len('json_'):]\n"
    "        if isinstance(v, str) and v[:1] in '[{':\n"
    "            import json as _json\n"
    "            try:\n"
    "                v = _json.loads(v)\n"
    "            except ValueError:\n"
    "                pass\n"
    "        if tgt == '@timestamp':\n"
    "            dt = datetime.fromisoformat(\n"
    "                str(v).replace('Z', '+00:00'))\n"
    "            event['ts'] = dt.astimezone(timezone.utc) \\\n"
    "                .replace(tzinfo=None)\n"
    "        elif isinstance(v, dict):\n"
    "            def emit(prefix, d):\n"
    "                for kk, vv in d.items():\n"
    "                    if isinstance(vv, dict):\n"
    "                        emit(prefix + kk + '_', vv)\n"
    "                    else:\n"
    "                        event[prefix + kk] = vv\n"
    "            emit(tgt + '_', v)\n"
    "        else:\n"
    "            event[tgt] = v\n"
    "    return event\n")}}


def _kibana_loader(name):
    doc = load_pipeline_yml(f"{MOD}/kibana/audit/ingest/{name}.yml")
    return compile_ingest(doc, scripts=[KIBANA_MERGE, None],
                          pipeline_loader=_kibana_loader)


@pytest.mark.parametrize("logname", _fixtures("kibana", "audit"))
def test_kibana_audit_golden(logname):
    if "kibana" not in _specs:
        doc = load_pipeline_yml(f"{MOD}/kibana/audit/ingest/pipeline.yml")
        ingest = compile_ingest(doc, pipeline_loader=_kibana_loader)
        _specs["kibana"] = {"processors": [
            {"decode_json_fields": {"fields": ["message"], "target": "json",
                                    "keep_arrays": True, "max_depth": 99}},
        ] + ingest + [_final("kibana", "audit")]}
    _run(_specs["kibana"], f"{MOD}/kibana/audit/test/{logname}",
         tz="-02:00")


# ---------------------------------------------------------------- logstash

LOGSTASH_LEVEL = {"script": {"source": (
    "def process(event, params):\n"
    "    lvl = event.get('log_level')\n"
    "    if lvl is not None:\n"
    "        event['event_type'] = 'error' if lvl in ('ERROR', 'FATAL') \\\n"
    "            else 'info'\n"
    "    return event\n")}}

# painless v.toString() of ingest-node maps renders Java
# HashMap.toString — BUCKET-ordered keys (same helper the aws/cloudtrail
# goldens verified) — rebuilt from the raw json line
from test_misc_golden import JAVA_STR

LOGSTASH_ACTION_STR = {"script": {"source": (
    JAVA_STR
    + "def process(event, params):\n"
    "    import json as _json\n"
    "    try:\n"
    "        obj = _json.loads(event.get('_raw_json') or '')\n"
    "    except ValueError:\n"
    "        return event\n"
    "    act = (obj.get('logEvent') or {}).get('action')\n"
    "    if isinstance(act, list):\n"
    "        event['logstash_log_log_event_action'] = \\\n"
    "            [x if isinstance(x, str) else _jv(x) for x in act]\n"
    "    return event\n")}}

LOGSTASH_PLAIN_DATE_TZ = {"script": {"source": (
    "def process(event, params):\n"
    "    from datetime import datetime, timedelta\n"
    "    raw = event.get('logstash_log_timestamp')\n"
    "    if raw is None:\n"
    "        return event\n"
    "    try:\n"
    "        dt = datetime.strptime(str(raw), '%Y-%m-%dT%H:%M:%S,%f')\n"
    "    except ValueError:\n"
    "        return event\n"
    "    tz = event.get('event_timezone') or 'UTC'\n"
    "    if tz not in ('UTC', 'Z'):\n"
    "        sign = 1 if tz[0] == '+' else -1\n"
    "        dt -= timedelta(minutes=sign * (int(tz[1:3]) * 60\n"
    "                                        + int(tz[-2:])))\n"
    "    event['ts'] = dt\n"
    "    return event\n")}}


def _logstash_loader(name):
    doc = load_pipeline_yml(f"{MOD}/logstash/log/ingest/{name}.yml")
    if name == "pipeline-plaintext":
        dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
        return compile_ingest(
            doc, scripts=[LOGSTASH_LEVEL, None],
            overrides={dates[0]: None, dates[1]: LOGSTASH_PLAIN_DATE_TZ},
            pipeline_loader=_logstash_loader)
    # the action-stringify script's painless `if` (instanceof List) tests a
    # type the decode stringified — the port re-checks from the raw json
    scr = [i for i, p in enumerate(doc["processors"]) if "script" in p]
    # the override consumes scripts[0] positionally; pass a placeholder
    return compile_ingest(
        doc, scripts=[None, LOGSTASH_LEVEL, None],
        overrides={scr[0]: {"__unconditional__": LOGSTASH_ACTION_STR}},
        pipeline_loader=_logstash_loader)


@pytest.mark.parametrize("logname", _fixtures("logstash", "log"))
def test_logstash_log_golden(logname, ray_session):
    import ray.data as rd
    from beats_ray.stages.flow import multiline_join

    if "logstash" not in _specs:
        doc = load_pipeline_yml(f"{MOD}/logstash/log/ingest/pipeline.yml")
        ingest = compile_ingest(doc, pipeline_loader=_logstash_loader)
        # the json sub-pipeline drops `message` before its action script
        # runs — stash the raw line for the hand-ported stringifier
        _specs["logstash"] = {"processors": [
            {"copy_fields": {"fields": [
                {"from": "message", "to": "_raw_json"}],
                "ignore_missing": True, "fail_on_error": False}},
        ] + ingest + [
            {"drop_fields": {"fields": ["_raw_json"],
                             "ignore_missing": True}},
            _final("logstash", "log"),
        ]}
    path = f"{MOD}/logstash/log/test/{logname}"
    raw = [ln for ln in _terminated_lines(path) if ln.strip()]
    src = pa.table({"conv_id": ["f"] * len(raw),
                    "turn_idx": pa.array(range(len(raw)), pa.int32()),
                    "text": raw})
    joined = multiline_join(
        rd.from_arrow(src),
        pattern=r"^((\[[0-9]{4}-[0-9]{2}-[0-9]{2}[^\]]+\])|(\{.+\}))",
        negate=True, match="after").to_pandas().sort_values("turn_idx")
    lines = joined["text"].tolist()
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "event_timezone": pa.array(["-02:00"] * len(lines), pa.string()),
    })
    out = Pipeline(_specs["logstash"]).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    check_golden(rows[:len(expected)], expected)


# ----------------------------------------------------------------- osquery

OSQUERY_NAMESPACE = {"script": {"source": (
    "def process(event, params):\n"
    "    for k in [k for k in list(event.keys()) if k.startswith('json_')]:\n"
    "        v = event.pop(k)\n"
    "        if v is not None:\n"
    "            event['osquery_result_' + k[len('json_'):]] = v\n"
    "    return event\n")}}


@pytest.mark.parametrize("logname", _fixtures("osquery", "result"))
def test_osquery_result_golden(logname):
    if "osquery" not in _specs:
        text = open(f"{MOD}/osquery/result/ingest/pipeline.json").read()
        # render the Go-template conditional with the manifest default
        # (use_namespace: true) — keep the block, drop the markers
        text = re.sub(r"\{<\s*if \.use_namespace\s*>\}|\{<\s*end\s*>\}",
                      "", text)
        doc = yaml.safe_load(text)
        ingest = compile_ingest(doc, scripts=[OSQUERY_NAMESPACE])
        _specs["osquery"] = {"processors": [
            {"decode_json_fields": {"fields": ["message"], "target": "json",
                                    "keep_arrays": True, "max_depth": 99}},
        ] + ingest + [_final("osquery", "result")]}
    _run(_specs["osquery"], f"{MOD}/osquery/result/test/{logname}")


# --------------------------------------------------------------------- iis

@pytest.mark.parametrize("logname", _fixtures("iis", "error"))
def test_iis_error_golden(logname):
    if "iis" not in _specs:
        doc = load_pipeline_yml(f"{MOD}/iis/error/ingest/pipeline.yml")
        ingest = compile_ingest(doc, scripts=[None])
        _specs["iis"] = {"processors": ingest + [_final("iis", "error")]}
    path = f"{MOD}/iis/error/test/{logname}"
    # iis error logs start with a '#'-comment header block the input drops
    lines = [ln for ln in _terminated_lines(path)
             if ln.strip() and not ln.startswith("#")]
    batch = pa.table({"message": lines,
                      "line_no": pa.array(range(len(lines)), pa.int64())})
    out = Pipeline(_specs["iis"]).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    check_golden(rows[:len(expected)], expected,
                 skip=("source.geo", "source.as"))
