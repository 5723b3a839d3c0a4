"""apache access (all 5 fixtures) + error (all 4) module goldens through
the modules' own ingest pipeline.yml compiled by beats_ray.ingest —
replacing the 2-fixture hand-built coverage.  geoip/user_agent details are
cluster-side plugin output (skipped like every other module golden)."""
import json
import os

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline
from test_zeek_golden import _terminated_lines, check_golden

APACHE = "/root/reference/filebeat/module/apache"

pytestmark = pytest.mark.skipif(not os.path.isdir(APACHE),
                                reason="reference not present")

UA_SKIP = ("user_agent.name", "user_agent.os", "user_agent.device",
           "user_agent.version", "user_agent.major", "user_agent.minor")

# access pipeline scripts: tls version splitter + null sweep (no-op)
ACCESS_TLS = {"script": {"source": (
    "def process(event, params):\n"
    "    p = event.get('apache_access_ssl_protocol')\n"
    "    if p is None:\n"
    "        return event\n"
    "    parts = p.lower().split('v')\n"
    "    if len(parts) != 2:\n"
    "        return event\n"
    "    event['tls_version'] = parts[1] if '.' in parts[1] \\\n"
    "        else parts[1] + '.0'\n"
    "    event['tls_version_protocol'] = parts[0]\n"
    "    return event\n")}}

ERROR_LEVEL = {"script": {"source": (
    "def process(event, params):\n"
    "    lvl = event.get('log_level')\n"
    "    if lvl is not None:\n"
    "        event['event_type'] = 'error' if lvl in (\n"
    "            'emerg', 'alert', 'crit', 'error', 'warn') else 'info'\n"
    "    return event\n")}}

# templated-timezone date: 'EEE MMM dd H:m:s[.SSSSSS] yyyy' in the harness
# -02:00 zone (the goldens carry that offset)
ERROR_DATE_TZ = {"script": {"source": (
    "def process(event, params):\n"
    "    from datetime import datetime, timedelta\n"
    "    raw = event.get('apache_error_timestamp')\n"
    "    if raw is None:\n"
    "        return event\n"
    "    base = ' '.join(str(raw).split())\n"
    "    dt = None\n"
    "    for fmt in ('%a %b %d %H:%M:%S %Y', '%a %b %d %H:%M:%S.%f %Y'):\n"
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

_specs = {}


def _spec(fileset, scripts):
    doc = load_pipeline_yml(f"{APACHE}/{fileset}/ingest/pipeline.yml")
    if fileset == "error":
        # the harness supplies event.timezone, so date[0] (timezone==null)
        # never fires and date[1] (templated timezone) is hand-scripted
        dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
        ingest = compile_ingest(doc, scripts=scripts,
                                overrides={dates[0]: None,
                                           dates[1]: ERROR_DATE_TZ})
    else:
        ingest = compile_ingest(doc, scripts=scripts)
    return {"processors": ingest + [
        {"add_fields": {"target": "", "fields": {
            "event.module": "apache", "event.dataset": f"apache.{fileset}",
            "fileset.name": fileset, "input.type": "log",
            "service.type": "apache", "ecs.version": "1.12.0"}}},
    ]}


def _fixtures(fileset):
    d = f"{APACHE}/{fileset}/test"
    return sorted(f[:-len("-expected.json")] for f in os.listdir(d)
                  if f.endswith("-expected.json")) if os.path.isdir(d) else []


def _run(fileset, logname, scripts):
    if fileset not in _specs:
        _specs[fileset] = _spec(fileset, scripts)
    path = f"{APACHE}/{fileset}/test/{logname}"
    lines = [ln for ln in _terminated_lines(path) if ln.strip()]
    batch = pa.table({"message": lines,
                      "line_no": pa.array(range(len(lines)), pa.int64()),
                      "event_timezone": pa.array(["-02:00"] * len(lines),
                                                 pa.string())})
    out = Pipeline(_specs[fileset]).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    check_golden(rows[:len(expected)], expected, skip=UA_SKIP)


@pytest.mark.parametrize("logname", _fixtures("access"))
def test_apache_access_golden(logname):
    _run("access", logname, [ACCESS_TLS, None])


@pytest.mark.parametrize("logname", _fixtures("error"))
def test_apache_error_golden(logname):
    _run("error", logname, [ERROR_LEVEL, None])
