"""apache access (all 5 fixtures) + error (all 4) module goldens through
the modules' own ingest pipeline.yml compiled by beats_ray.ingest —
run via beats_ray.modules.compile_fileset_spec with the built-in
FILESET_HOOKS painless ports (same path as `python -m beats_ray module`).
geoip/user_agent details are cluster-side plugin output (skipped like
every other module golden)."""
import json
import os

import pyarrow as pa
import pytest

from beats_ray.modules import compile_fileset_spec
from beats_ray.pipeline import Pipeline
from test_zeek_golden import _terminated_lines, check_golden

APACHE = "/root/reference/filebeat/module/apache"

pytestmark = pytest.mark.skipif(not os.path.isdir(APACHE),
                                reason="reference not present")

UA_SKIP = ("user_agent.name", "user_agent.os", "user_agent.device",
           "user_agent.version", "user_agent.major", "user_agent.minor")

_specs = {}


def _fixtures(fileset):
    d = f"{APACHE}/{fileset}/test"
    return sorted(f[:-len("-expected.json")] for f in os.listdir(d)
                  if f.endswith("-expected.json")) if os.path.isdir(d) else []


def _run(fileset, logname):
    if fileset not in _specs:
        spec, _ = compile_fileset_spec(APACHE, "apache", fileset)
        # the beats golden harness fakes TZ=-02:00 so the module's own
        # add_locale (config/error.yml) stamps that offset; mirror it via
        # the stage's fields override instead of a process-wide tzset
        spec = [{"add_locale": {"fields": {"event.timezone": "-02:00"}}}
                if isinstance(p, dict) and "add_locale" in p else p
                for p in spec]
        _specs[fileset] = {"processors": spec}
    path = f"{APACHE}/{fileset}/test/{logname}"
    lines = [ln for ln in _terminated_lines(path) if ln.strip()]
    batch = pa.table({"message": lines,
                      "line_no": pa.array(range(len(lines)), pa.int64())})
    out = Pipeline(_specs[fileset]).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    check_golden(rows[:len(expected)], expected, skip=UA_SKIP)


@pytest.mark.parametrize("logname", _fixtures("access"))
def test_apache_access_golden(logname):
    _run("access", logname)


@pytest.mark.parametrize("logname", _fixtures("error"))
def test_apache_error_golden(logname):
    _run("error", logname)
