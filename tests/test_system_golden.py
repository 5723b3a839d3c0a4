"""system/auth + system/syslog module goldens — all FILE-input fixtures
through the modules' own entrypoint.yml -> files.yml (+ grok-auth-messages
sub-pipeline) compiled by beats_ray.ingest.  The journald fixtures
(debian-12.export/.journal) target the systemd-journald INPUT (binary
export stream) — out of scope like the other non-log inputs (SURVEY §2.1).
"""
import json
import os

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline
from test_zeek_golden import _terminated_lines, check_golden

SYS = "/root/reference/filebeat/module/system"

pytestmark = pytest.mark.skipif(not os.path.isdir(SYS),
                                reason="reference not present")

# date with ISO8601 + yearless syslog layouts in the templated event.timezone
def _date_tz(src_col):
    return {"script": {"source": (
        "def process(event, params):\n"
        "    from datetime import datetime, timedelta, timezone\n"
        f"    raw = event.get('{src_col}')\n"
        "    if raw is None:\n"
        "        return event\n"
        "    s = ' '.join(str(raw).split())\n"
        "    dt = None\n"
        "    zoned = False\n"
        "    try:\n"
        "        dt = datetime.fromisoformat(s.replace('Z', '+00:00'))\n"
        "        if dt.tzinfo is not None:\n"
        "            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)\n"
        "            zoned = True\n"
        "    except ValueError:\n"
        "        for fmt in ('%b %d %H:%M:%S',):\n"
        "            try:\n"
        "                dt = datetime.strptime(s, fmt)\n"
        "                dt = dt.replace(year=datetime.now().year)\n"
        "                break\n"
        "            except ValueError:\n"
        "                continue\n"
        "    if dt is None:\n"
        "        return event\n"
        "    tz = event.get('event_timezone') or 'UTC'\n"
        "    if not zoned and tz not in ('UTC', 'Z'):\n"
        "        sign = 1 if tz[0] == '+' else -1\n"
        "        dt -= timedelta(minutes=sign * (int(tz[1:3]) * 60\n"
        "                                        + int(tz[-2:])))\n"
        "    event['ts'] = dt\n"
        "    return event\n")}}


SSH_CATEGORIZE = {"script": {"source": (
    "def process(event, params):\n"
    "    ev = event.get('system_auth_ssh_event')\n"
    "    if ev == 'Accepted':\n"
    "        event['event_type'] = ['info']\n"
    "        event['event_category'] = ['authentication', 'session']\n"
    "        event['event_action'] = 'ssh_login'\n"
    "        event['event_outcome'] = 'success'\n"
    "    elif ev in ('Invalid', 'Failed'):\n"
    "        event['event_type'] = ['info']\n"
    "        event['event_category'] = ['authentication']\n"
    "        event['event_action'] = 'ssh_login'\n"
    "        event['event_outcome'] = 'failure'\n"
    "    return event\n")}}

_specs = {}


def _auth_loader(name):
    doc = load_pipeline_yml(f"{SYS}/auth/ingest/{name}.yml")
    if name == "files":
        # the `pipeline: grok-auth-messages` processor carries an
        # on_failure (leave unmatched content in message) — push it onto
        # the sub-pipeline's grok so the compiled failure-flag machinery
        # gates it per row
        for p in doc["processors"]:
            if "pipeline" in p and p["pipeline"].get("on_failure"):
                handlers = p["pipeline"].pop("on_failure")
                sub = load_pipeline_yml(
                    f"{SYS}/auth/ingest/grok-auth-messages.yml")
                sub["processors"][0]["grok"]["on_failure"] = handlers
                compiled_sub = compile_ingest(sub)
                name_called = "grok-auth-messages"
                loader = (lambda n, _c=compiled_sub, _l=_auth_loader:
                          _c if n == name_called else _l(n))
                dates = [i for i, q in enumerate(doc["processors"])
                         if "date" in q]
                return compile_ingest(
                    doc, scripts=[SSH_CATEGORIZE],
                    overrides={dates[0]: None,
                               dates[1]: _date_tz("system_auth_timestamp")},
                    pipeline_loader=loader)
    return compile_ingest(doc, pipeline_loader=_auth_loader)


def _syslog_loader(name):
    doc = load_pipeline_yml(f"{SYS}/syslog/ingest/{name}.yml")
    if name == "files":
        dates = [i for i, q in enumerate(doc["processors"]) if "date" in q]
        return compile_ingest(
            doc,
            overrides={dates[0]: None,
                       dates[1]: _date_tz("system_syslog_timestamp")},
            pipeline_loader=_syslog_loader)
    return compile_ingest(doc, pipeline_loader=_syslog_loader)


def _fixtures(fs):
    d = f"{SYS}/{fs}/test"
    return sorted(f[:-len("-expected.json")] for f in os.listdir(d)
                  if f.endswith("-expected.json")
                  and "journal" not in f and "export" not in f)


def _run(fs, loader, logname):
    if fs not in _specs:
        doc = load_pipeline_yml(f"{SYS}/{fs}/ingest/entrypoint.yml")
        # drop the journald dispatch branch (systemd-journald INPUT —
        # out of scope); all fixtures here are input.type == "log"
        jd = [i for i, q in enumerate(doc["processors"])
              if q.get("pipeline", {}).get("name") == "journald"]
        ingest = compile_ingest(doc, overrides={jd[0]: None},
                                pipeline_loader=loader)
        _specs[fs] = {"processors": ingest + [
            {"add_fields": {"target": "", "fields": {
                "event.module": "system", "event.dataset": f"system.{fs}",
                "fileset.name": fs, "input.type": "log",
                "service.type": "system"}}},
        ]}
    path = f"{SYS}/{fs}/test/{logname}"
    lines = [ln for ln in _terminated_lines(path) if ln.strip()]
    if fs == "syslog":
        # config/syslog.yml: multiline pattern "^\s" match after
        import ray.data as rd
        from beats_ray.stages.flow import multiline_join
        src = pa.table({"conv_id": ["f"] * len(lines),
                        "turn_idx": pa.array(range(len(lines)), pa.int32()),
                        "text": lines})
        joined = multiline_join(rd.from_arrow(src), pattern=r"^\s",
                                negate=False, match="after").to_pandas() \
            .sort_values("turn_idx")
        lines = joined["text"].tolist()
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "input_type": pa.array(["log"] * len(lines), pa.string()),
        "event_timezone": pa.array(["-02:00"] * len(lines), pa.string()),
    })
    out = Pipeline(_specs[fs]).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    check_golden(rows[:len(expected)], expected,
                 skip=("ecs.version", "event.timezone"))


@pytest.mark.parametrize("logname", _fixtures("auth"))
def test_system_auth_golden(logname):
    _run("auth", _auth_loader, logname)


@pytest.mark.parametrize("logname", _fixtures("syslog"))
def test_system_syslog_golden(logname, ray_session):
    _run("syslog", _syslog_loader, logname)
