"""postgresql/log module goldens — ALL 22 fixtures through the module's own
config (multiline ^date negate/after) + ingest/pipeline.yml compiled by
beats_ray.ingest, with the plain-log and CSV sub-pipelines spliced via the
compiler's pipeline loader on the separator condition.  Hand-scripted:
the two ``zz``-timezone-abbreviation date processors (python can't strptime
CEST/EST — same treatment as the cisco shared pipeline's templated-timezone
date) and the duration painless one-liner."""
import json
import os

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline
from test_zeek_golden import _terminated_lines, check_golden

PG = "/root/reference/filebeat/module/postgresql/log"

pytestmark = pytest.mark.skipif(not os.path.isdir(PG),
                                reason="reference not present")

# java.time `zz` resolves abbreviations through the underlying IANA zone
# WITH daylight rules ("EST" in July parses as America/New_York = -04:00 —
# the goldens carry exactly that), so a fixed-offset table is wrong
_ZONES = ("{'UTC': 'UTC', 'GMT': 'UTC', 'Z': 'UTC', "
          "'CET': 'Europe/Paris', 'CEST': 'Europe/Paris', "
          "'EST': 'America/New_York', 'EDT': 'America/New_York', "
          "'CST': 'America/Chicago', 'CDT': 'America/Chicago', "
          "'MST': 'America/Denver', 'MDT': 'America/Denver', "
          "'PST': 'America/Los_Angeles', 'PDT': 'America/Los_Angeles'}")


def _tz_date_script(src_col, dst_col):
    return {"script": {"source": (
        "def process(event, params):\n"
        "    from datetime import datetime, timezone\n"
        "    from zoneinfo import ZoneInfo\n"
        f"    raw = event.get('{src_col}')\n"
        "    if raw is None:\n"
        "        return event\n"
        "    parts = str(raw).rsplit(' ', 1)\n"
        f"    zname = {_ZONES}.get(parts[-1] if len(parts) == 2 else '')\n"
        "    base = parts[0] if zname else str(raw)\n"
        "    dt = None\n"
        "    for fmt in ('%Y-%m-%d %H:%M:%S.%f', '%Y-%m-%d %H:%M:%S'):\n"
        "        try:\n"
        "            dt = datetime.strptime(base, fmt)\n"
        "            break\n"
        "        except ValueError:\n"
        "            continue\n"
        "    if dt is None:\n"
        "        event['error_message'] = 'date parse failure'\n"
        "        return event\n"
        "    if zname:\n"
        "        dt = dt.replace(tzinfo=ZoneInfo(zname)) \\\n"
        "            .astimezone(timezone.utc).replace(tzinfo=None)\n"
        f"    event['{dst_col}'] = dt\n"
        "    return event\n")}}


# painless: grok :float is a Java FLOAT (32-bit) and duration * scale is
# float32 arithmetic — reproduce the precision (2474.307ms -> 2474306816ns)
DURATION_SCRIPT = {"script": {"source": (
    "def process(event, params):\n"
    "    import numpy as np\n"
    "    d = event.get('temp_duration')\n"
    "    if d is not None:\n"
    "        prod = np.float32(np.float32(d) * np.float32(1000000))\n"
    "        event['event_duration'] = int(round(float(prod)))\n"
    "    return event\n")}}


def _loader(name):
    doc = load_pipeline_yml(f"{PG}/ingest/{name}.yml")
    if name == "pipeline-csv":
        dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
        return compile_ingest(doc, overrides={
            dates[0]: _tz_date_script("tempcsv_session_start_time",
                                      "postgresql_log_session_start_time")})
    return compile_ingest(doc)


def build_spec():
    doc = load_pipeline_yml(f"{PG}/ingest/pipeline.yml")
    dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
    ingest = compile_ingest(
        doc, scripts=[DURATION_SCRIPT], pipeline_loader=_loader,
        overrides={dates[0]: _tz_date_script("postgresql_log_timestamp",
                                             "ts")})
    return {"processors": ingest + [
        {"add_fields": {"target": "", "fields": {
            "event.module": "postgresql", "event.dataset": "postgresql.log",
            "fileset.name": "log", "input.type": "log",
            "service.type": "postgresql", "ecs.version": "1.12.0"}}},
    ]}


_spec_cache = {}

FIXTURES = sorted(f[:-len("-expected.json")]
                  for f in os.listdir(f"{PG}/test")
                  if f.endswith("-expected.json")) \
    if os.path.isdir(PG) else []


@pytest.mark.parametrize("logname", FIXTURES)
def test_postgresql_log_module_golden(logname, ray_session):
    import ray.data as rd
    from beats_ray.stages.flow import multiline_join

    if "spec" not in _spec_cache:
        _spec_cache["spec"] = build_spec()
    path = f"{PG}/test/{logname}"
    # keep BLANK lines (_terminated_lines drops them): they are multiline
    # continuations — the query-steps slowlog golden's query ends with a
    # trailing \n from one
    content = open(path, encoding="utf-8", errors="replace").read()
    raw = content.splitlines()
    if raw and not content.endswith("\n"):
        raw = raw[:-1]
    src = pa.table({"conv_id": ["f"] * len(raw),
                    "turn_idx": pa.array(range(len(raw)), pa.int32()),
                    "text": raw})
    joined = multiline_join(rd.from_arrow(src),
                            pattern=r"^\d{4}-\d{2}-\d{2} ",
                            negate=True, match="after").to_pandas() \
        .sort_values("turn_idx")
    lines = joined["text"].tolist()
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
    })
    out = Pipeline(_spec_cache["spec"]).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    check_golden(rows[:len(expected)], expected)
