"""kafka/log module goldens — ALL 8 fixtures through the module's own
config (multiline ^\\[ negate/after) + ingest/pipeline.yml compiled by
beats_ray.ingest: Oniguruma (?m)-dotall groks with the dotted inline
trace group, per-processor on_failure (component -> "unknown", trace
removal), and the two-date timezone dispatch (the templated
``timezone: '{{ event.timezone }}'`` date is the one hand-scripted
processor, like the cisco shared pipeline's)."""
import json
import os

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline
from test_zeek_golden import _terminated_lines, check_golden

KAFKA = "/root/reference/filebeat/module/kafka/log"

pytestmark = pytest.mark.skipif(not os.path.isdir(KAFKA),
                                reason="reference not present")

# the ERROR/FATAL -> event.type painless script
LEVEL_SCRIPT = {"script": {"source": (
    "def process(event, params):\n"
    "    lvl = event.get('log_level')\n"
    "    if lvl is not None:\n"
    "        event['event_type'] = 'error' if lvl in ('ERROR', 'FATAL') \\\n"
    "            else 'info'\n"
    "    return event\n")}}

# date with templated per-row timezone: parse kafka.log.timestamp in the
# event.timezone offset (add_locale supplies it; here the harness column)
DATE_TZ_SCRIPT = {"script": {"source": (
    "def process(event, params):\n"
    "    from datetime import datetime, timedelta\n"
    "    raw = event.get('kafka_log_timestamp')\n"
    "    if raw is None:\n"
    "        return event\n"
    "    try:\n"
    "        dt = datetime.strptime(raw, '%Y-%m-%d %H:%M:%S,%f')\n"
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


def build_spec():
    doc = load_pipeline_yml(f"{KAFKA}/ingest/pipeline.yml")
    # the two date processors dispatch on event.timezone null/non-null; the
    # harness always sets it -> replace the timezone one, drop the null one
    dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
    overrides = {dates[0]: None, dates[1]: DATE_TZ_SCRIPT}
    ingest = compile_ingest(doc, scripts=[LEVEL_SCRIPT], overrides=overrides)
    return {"processors": ingest + [
        {"add_fields": {"target": "", "fields": {
            "event.module": "kafka", "event.dataset": "kafka.log",
            "fileset.name": "log", "input.type": "log",
            "service.type": "kafka", "ecs.version": "1.12.0"}}},
    ]}


_spec_cache = {}

FIXTURES = sorted(f[:-len("-expected.json")]
                  for f in os.listdir(f"{KAFKA}/test")
                  if f.endswith("-expected.json")) \
    if os.path.isdir(KAFKA) else []


@pytest.mark.parametrize("logname", FIXTURES)
def test_kafka_log_module_golden(logname, ray_session):
    import ray.data as rd
    from beats_ray.stages.flow import multiline_join

    if "spec" not in _spec_cache:
        _spec_cache["spec"] = build_spec()
    path = f"{KAFKA}/test/{logname}"
    raw = [ln for ln in _terminated_lines(path) if ln.strip()]
    src = pa.table({"conv_id": ["f"] * len(raw),
                    "turn_idx": pa.array(range(len(raw)), pa.int32()),
                    "text": raw})
    joined = multiline_join(rd.from_arrow(src), pattern=r"^\[",
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
    # the reference golden harness caps the expected file at 100 events
    check_golden(rows[:len(expected)], expected)
