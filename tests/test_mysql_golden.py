"""mysql/slowlog (all 13 fixtures) + mysql/error (all 6) module goldens
through the modules' own ingest pipelines compiled by beats_ray.ingest.
slowlog: one mega-grok with dozens of optional metric groups (duplicate
captures across server variants), Yes/No boolean mapping script, float32
duration, UNIX timestamp; config-level multiline + post-assembly
exclude_lines.  error: multiline + multi-variant groks."""
import json
import os
import re

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline
from test_zeek_golden import check_golden

MYSQL = "/root/reference/filebeat/module/mysql"

pytestmark = pytest.mark.skipif(not os.path.isdir(MYSQL),
                                reason="reference not present")

YESNO_SCRIPT = {"script": {"source": (
    "def process(event, params):\n"
    "    for f in ('query_cache_hit', 'tmp_table', 'tmp_table_on_disk',\n"
    "              'filesort', 'filesort_on_disk', 'priority_queue',\n"
    "              'full_scan', 'full_join'):\n"
    "        v = event.get('mysql_slowlog_' + f)\n"
    "        if v is not None:\n"
    "            event['mysql_slowlog_' + f] = {'Yes': True,\n"
    "                                           'No': False}.get(v)\n"
    "    return event\n")}}

# Math.round(f32(duration) * 1000000) * 1000 — float32 painless arithmetic
DURATION_SCRIPT = {"script": {"source": (
    "def process(event, params):\n"
    "    import numpy as np\n"
    "    d = event.get('temp_duration')\n"
    "    if d is not None:\n"
    "        prod = np.float32(np.float32(d) * np.float32(1000000))\n"
    "        event['event_duration'] = int(round(float(prod))) * 1000\n"
    "    return event\n")}}


def _events(path, mline_pattern, exclude=()):
    """File lines -> multiline-assembled messages, exclude_lines applied to
    the ASSEMBLED message (filebeat applies them post-multiline)."""
    import ray.data as rd
    from beats_ray.stages.flow import multiline_join

    content = open(path, encoding="utf-8", errors="replace").read()
    raw = content.splitlines()
    if raw and not content.endswith("\n"):
        raw = raw[:-1]
    src = pa.table({"conv_id": ["f"] * len(raw),
                    "turn_idx": pa.array(range(len(raw)), pa.int32()),
                    "text": raw})
    joined = multiline_join(rd.from_arrow(src), pattern=mline_pattern,
                            negate=True, match="after").to_pandas() \
        .sort_values("turn_idx")
    lines = joined["text"].tolist()
    rxs = [re.compile(p) for p in exclude]
    return [ln for ln in lines if not any(r.search(ln) for r in rxs)]


_specs = {}


def slowlog_spec():
    doc = load_pipeline_yml(f"{MYSQL}/slowlog/ingest/pipeline.json")
    ingest = compile_ingest(doc, scripts=[YESNO_SCRIPT, DURATION_SCRIPT])
    return {"processors": ingest + [
        {"add_fields": {"target": "", "fields": {
            "event.module": "mysql", "event.dataset": "mysql.slowlog",
            "fileset.name": "slowlog", "input.type": "log",
            "service.type": "mysql", "ecs.version": "1.12.0"}}},
    ]}


SLOW_FIXTURES = sorted(f[:-len("-expected.json")]
                       for f in os.listdir(f"{MYSQL}/slowlog/test")
                       if f.endswith("-expected.json")) \
    if os.path.isdir(f"{MYSQL}/slowlog/test") else []


@pytest.mark.parametrize("logname", SLOW_FIXTURES)
def test_mysql_slowlog_module_golden(logname, ray_session):
    if "slow" not in _specs:
        _specs["slow"] = slowlog_spec()
    path = f"{MYSQL}/slowlog/test/{logname}"
    lines = _events(path, r"^(# User@Host: |# Time: )",
                    exclude=[r"^[\/\w\.]+, Version: .* started with:.*",
                             r"^# Time:.*"])
    batch = pa.table({"message": lines,
                      "line_no": pa.array(range(len(lines)), pa.int64())})
    out = Pipeline(_specs["slow"]).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    check_golden(rows[:len(expected)], expected)


# mysql/error: the templated-timezone date (harness tz -02:00), 2-digit-year
# layouts, whitespace-squeezed
ERROR_DATE_TZ = {"script": {"source": (
    "def process(event, params):\n"
    "    from datetime import datetime, timedelta\n"
    "    raw = event.get('_tmp_local_timestamp')\n"
    "    if raw is None:\n"
    "        return event\n"
    "    base = ' '.join(str(raw).split())\n"
    "    dt = None\n"
    "    for fmt in ('%y%m%d %H:%M:%S', '%Y-%m-%d %H:%M:%S'):\n"
    "        try:\n"
    "            dt = datetime.strptime(base, fmt)\n"
    "            break\n"
    "        except ValueError:\n"
    "            continue\n"
    "    if dt is None:\n"
    "        return event\n"
    "    tz = event.get('event_timezone') or 'UTC'\n"
    "    if tz not in ('UTC', 'Z'):\n"
    "        sign = 1 if tz[0] == '+' else -1\n"
    "        dt -= timedelta(minutes=sign * (int(tz[1:3]) * 60\n"
    "                                        + int(tz[-2:])))\n"
    "    event['ts'] = dt\n"
    "    return event\n")}}


def error_spec():
    doc = load_pipeline_yml(f"{MYSQL}/error/ingest/pipeline.yml")
    dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
    # date[0] requires event.timezone == null (harness always sets it) ->
    # drop; date[1] is the templated-timezone one -> hand script
    ingest = compile_ingest(doc, overrides={dates[0]: None,
                                            dates[1]: ERROR_DATE_TZ})
    return {"processors": ingest + [
        {"add_fields": {"target": "", "fields": {
            "event.module": "mysql", "event.dataset": "mysql.error",
            "fileset.name": "error", "input.type": "log",
            "service.type": "mysql", "ecs.version": "1.12.0"}}},
    ]}


ERR_FIXTURES = sorted(f[:-len("-expected.json")]
                      for f in os.listdir(f"{MYSQL}/error/test")
                      if f.endswith("-expected.json")) \
    if os.path.isdir(f"{MYSQL}/error/test") else []


@pytest.mark.parametrize("logname", ERR_FIXTURES)
def test_mysql_error_module_golden(logname, ray_session):
    if "err" not in _specs:
        _specs["err"] = error_spec()
    path = f"{MYSQL}/error/test/{logname}"
    lines = _events(path, r"^([0-9]{4}-[0-9]{2}-[0-9]{2}|[0-9]{6})")
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "event_timezone": pa.array(["-02:00"] * len(lines), pa.string()),
    })
    out = Pipeline(_specs["err"]).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    check_golden(rows[:len(expected)], expected)
