"""Fixture-level completion for the smaller log modules (round 5): nginx
access (3), redis log (5), mongodb log (2), haproxy log (4) — all fixtures
through each module's own ingest pipeline.yml compiled by
beats_ray.ingest, sub-pipelines via the pipeline loader."""
import json
import os

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline
from test_zeek_golden import _terminated_lines, check_golden

MOD = "/root/reference/filebeat/module"

pytestmark = pytest.mark.skipif(not os.path.isdir(MOD),
                                reason="reference not present")

UA_GEO_SKIP = ("user_agent.name", "user_agent.os", "user_agent.device",
               "user_agent.version", "user_agent.major", "user_agent.minor")

_specs = {}


def _fixtures(mod, fs):
    d = f"{MOD}/{mod}/{fs}/test"
    return sorted(f[:-len("-expected.json")] for f in os.listdir(d)
                  if f.endswith("-expected.json")) if os.path.isdir(d) else []


def _final(mod, fs):
    return {"add_fields": {"target": "", "fields": {
        "event.module": mod, "event.dataset": f"{mod}.{fs}",
        "fileset.name": fs, "input.type": "log",
        "service.type": mod, "ecs.version": "1.12.0"}}}


def _run(key, spec, path, skip=(), tz=None, exclude=None):
    import re as _re
    lines = [ln for ln in _terminated_lines(path) if ln.strip()]
    if exclude:   # config exclude_lines (redis drops asciiart)
        rx = _re.compile(exclude)
        lines = [ln for ln in lines if not rx.search(ln)]
    cols = {"message": lines,
            "line_no": pa.array(range(len(lines)), pa.int64())}
    if tz:   # config add_locale (harness zone)
        cols["event_timezone"] = pa.array([tz] * len(lines), pa.string())
    batch = pa.table(cols)
    out = Pipeline(spec).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    check_golden(rows[:len(expected)], expected, skip=skip)


# ------------------------------------------------------------------ nginx

NGINX_IP_PICK = {"script": {"source": (
    "def process(event, params):\n"
    "    lst = event.get('nginx_access_remote_ip_list')\n"
    "    if not lst:\n"
    "        return event\n"
    "    def private(ip):\n"
    "        try:\n"
    "            a, b = int(ip.split('.')[0]), int(ip.split('.')[1])\n"
    "        except (ValueError, IndexError):\n"
    "            return False\n"
    "        return a == 10 or a == 127 or (a == 192 and b == 168) \\\n"
    "            or (a == 172 and 16 <= b <= 31)\n"
    "    pick = next((x for x in lst if not private(x)), lst[0])\n"
    "    event['source_address'] = pick\n"
    "    return event\n")}}


@pytest.mark.parametrize("logname", _fixtures("nginx", "access"))
def test_nginx_access_golden(logname):
    if "nginx" not in _specs:
        doc = load_pipeline_yml(f"{MOD}/nginx/access/ingest/pipeline.yml")
        ingest = compile_ingest(doc, scripts=[NGINX_IP_PICK, None])
        _specs["nginx"] = {"processors": ingest
                           + [_final("nginx", "access")]}
    _run("nginx", _specs["nginx"], f"{MOD}/nginx/access/test/{logname}",
         skip=UA_GEO_SKIP, tz="-02:00")


# ------------------------------------------------------------------ redis

REDIS_LEVEL = {"script": {"source": (
    "def process(event, params):\n"
    "    m = {'.': 'debug', '-': 'verbose', '*': 'notice', '#': 'warning'}\n"
    "    lvl = event.get('log_level')\n"
    "    if lvl in m:\n"
    "        event['log_level'] = m[lvl]\n"
    "    return event\n")}}

REDIS_ROLE = {"script": {"source": (
    "def process(event, params):\n"
    "    m = {'M': 'master', 'S': 'slave', 'C': 'child', 'X': 'sentinel'}\n"
    "    r = event.get('redis_log_role')\n"
    "    if r in m:\n"
    "        event['redis_log_role'] = m[r]\n"
    "    return event\n")}}


@pytest.mark.parametrize("logname", _fixtures("redis", "log"))
def test_redis_log_golden(logname):
    if "redis" not in _specs:
        doc = load_pipeline_yml(f"{MOD}/redis/log/ingest/pipeline.yml")
        ingest = compile_ingest(doc, scripts=[REDIS_LEVEL, REDIS_ROLE])
        _specs["redis"] = {"processors": ingest + [_final("redis", "log")]}
    _run("redis", _specs["redis"], f"{MOD}/redis/log/test/{logname}",
         exclude=r"^\s+[\-`('.|_]")


# ---------------------------------------------------------------- mongodb

def _mongo_loader(name):
    return compile_ingest(
        load_pipeline_yml(f"{MOD}/mongodb/log/ingest/{name}.yml"),
        pipeline_loader=_mongo_loader)


@pytest.mark.parametrize("logname", _fixtures("mongodb", "log"))
def test_mongodb_log_golden(logname):
    if "mongodb" not in _specs:
        doc = load_pipeline_yml(f"{MOD}/mongodb/log/ingest/pipeline.yml")
        ingest = compile_ingest(doc, pipeline_loader=_mongo_loader)
        _specs["mongodb"] = {"processors": ingest
                             + [_final("mongodb", "log")]}
    _run("mongodb", _specs["mongodb"], f"{MOD}/mongodb/log/test/{logname}")


# ---------------------------------------------------------------- haproxy

HAPROXY_DURATION = {"script": {"source": (
    "def process(event, params):\n"
    "    d = event.get('temp_duration')\n"
    "    if d is not None:\n"
    "        event['event_duration'] = int(d) * 1000000\n"
    "    return event\n")}}


@pytest.mark.parametrize("logname", _fixtures("haproxy", "log"))
def test_haproxy_log_golden(logname):
    if "haproxy" not in _specs:
        doc = load_pipeline_yml(f"{MOD}/haproxy/log/ingest/pipeline.yml")
        dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
        # goldens don't assert @timestamp; the harness supplies
        # event.timezone so only the templated date would fire -> dropped
        ingest = compile_ingest(doc, scripts=[HAPROXY_DURATION, None],
                                overrides={dates[1]: None})
        _specs["haproxy"] = {"processors": ingest
                             + [_final("haproxy", "log")]}
    _run("haproxy", _specs["haproxy"], f"{MOD}/haproxy/log/test/{logname}",
         tz="-02:00")
