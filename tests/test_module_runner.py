"""Module runner (`beats_ray.modules` + `python -m beats_ray module`) —
runs a reference filebeat module fileset end-to-end: render the fileset's
own Go-templated config, compile its ingest pipeline(s), apply the built-in
painless port hook, route to partitioned parquet.

Reference: filebeat/fileset/fileset.go (config render + pipeline upload),
filebeat/fileset/pipelines.go.
"""
import glob
import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from beats_ray.modules import FILESET_HOOKS, compile_fileset_spec
from beats_ray.pipeline import Pipeline
from test_zeek_golden import _terminated_lines, check_golden

APACHE = "/root/reference/filebeat/module/apache"

pytestmark = pytest.mark.skipif(not os.path.isdir(APACHE),
                                reason="reference not present")

UA_SKIP = ("user_agent.name", "user_agent.os", "user_agent.device",
           "user_agent.version", "user_agent.major", "user_agent.minor")


def _golden_via_runner(logname):
    """apache/access through compile_fileset_spec with NO explicit scripts:
    proves the built-in FILESET_HOOKS port is auto-applied."""
    spec, vars = compile_fileset_spec(APACHE, "apache", "access")
    logp = f"{APACHE}/access/test/{logname}"
    lines = _terminated_lines(logp)
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "tags": pa.array([vars.get("tags") or []] * len(lines),
                         pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(logp + "-expected.json"))
    check_golden(rows, expected, skip=UA_SKIP)


def test_runner_apache_access_golden():
    _golden_via_runner("test.log")


def test_runner_apache_ssl_hook_applied():
    # ssl-request.log exercises the tls-version painless port in the hook
    _golden_via_runner("ssl-request.log")


def test_fileset_paths_from_manifest():
    """Config + pipeline paths come from the fileset's own manifest.yml
    (fileset.go:128-136), not a guessed config/<fileset>.yml: x-pack modules
    use config/input.yml, cisco/asa points at the SHARED ../shared pipeline,
    aws templates the config filename on the input var, elasticsearch/server
    declares a 5-pipeline list whose first entry is the root."""
    from beats_ray.modules import fileset_paths
    XP = "/root/reference/x-pack/filebeat/module"
    FB = "/root/reference/filebeat/module"
    if not os.path.isdir(XP):
        pytest.skip("x-pack modules not present")
    cfg, pipes = fileset_paths(f"{XP}/cisco", "asa")
    assert cfg.endswith("cisco/asa/config/input.yml")
    assert pipes[0].endswith("cisco/shared/ingest/asa-ftd-pipeline.yml")
    cfg, _ = fileset_paths(f"{XP}/aws", "cloudtrail")
    assert cfg.endswith("aws/cloudtrail/config/aws-s3.yml")  # manifest default
    cfg, _ = fileset_paths(f"{XP}/aws", "cloudtrail", {"input": "file"})
    assert cfg.endswith("aws/cloudtrail/config/file.yml")
    cfg, pipes = fileset_paths(f"{FB}/elasticsearch", "server")
    assert cfg.endswith("config/log.yml")
    assert [os.path.basename(p) for p in pipes] == [
        "pipeline.yml", "pipeline-plaintext.yml", "pipeline-json.yml",
        "pipeline-json-7.yml", "pipeline-json-8.yml"]


def test_pipeline_yml_go_template_render():
    """{< >}-delimited Go templates in pipeline files render with manifest
    vars: {<if .use_namespace >} block in osquery's pipeline.json,
    {< .internal_PREFIX >} substitution in cisco's shared pipeline."""
    from beats_ray.ingest import load_pipeline_yml
    osq = "/root/reference/filebeat/module/osquery/result/ingest/pipeline.json"
    if not os.path.exists(osq):
        pytest.skip("osquery module not present")
    doc = load_pipeline_yml(osq, {"use_namespace": True})
    assert any("script" in p for p in doc["processors"])
    doc = load_pipeline_yml(osq, {"use_namespace": False})
    assert not any("script" in p for p in doc["processors"])
    asa = ("/root/reference/x-pack/filebeat/module/cisco/shared/ingest/"
           "asa-ftd-pipeline.yml")
    if os.path.exists(asa):
        doc = load_pipeline_yml(asa, {"internal_PREFIX": "ASA",
                                      "internal_prefix": "asa",
                                      "log_level": 7})
        assert doc["description"] == "Pipeline for Cisco ASA logs"


def test_hooks_registered():
    assert ("apache", "access") in FILESET_HOOKS
    assert ("checkpoint", "firewall") in FILESET_HOOKS


def test_checkpoint_hook_compiles():
    # the 904-line checkpoint pipeline compiles through the hook without
    # explicit scripts (iana table parsed from the module's own painless)
    cp = "/root/reference/x-pack/filebeat/module/checkpoint"
    if not os.path.isdir(cp):
        pytest.skip("checkpoint module not present")
    spec, _ = compile_fileset_spec(cp, "checkpoint", "firewall")
    assert len(spec) > 50  # the compiled chain is large


def test_fileset_reader_opts_mysql():
    """mysql/slowlog config carries multiline + exclude_lines; the reader
    opts extractor must surface both (input/log/config.go:67-68)."""
    from beats_ray.modules import fileset_reader_opts
    mysql = "/root/reference/filebeat/module/mysql"
    if not os.path.isdir(mysql):
        pytest.skip("mysql module not present")
    opts = fileset_reader_opts(mysql, "slowlog")
    assert opts["multiline"]["pattern"].startswith("^(# User@Host: ")
    assert opts["multiline"]["negate"] is True
    assert len(opts["exclude_lines"]) == 2
    assert opts["exclude_files"] == [".gz$"]
    # apache/access has no reader-level options
    assert fileset_reader_opts(APACHE, "access")["multiline"] is None


def test_line_filter_semantics():
    """include first (allowlist), then exclude — harvester.go:496-511."""
    from beats_ray.stages.base import stage_factory
    st = stage_factory("line_filter")({"include_lines": ["^keep"],
                                       "exclude_lines": ["secret"]})
    batch = pa.table({"message": ["keep me", "keep secret", "drop me",
                                  None]})
    out = st.process(batch)
    assert out.column("message").to_pylist() == ["keep me"]
    # exclude-only: non-matching (incl. null) rows survive
    st2 = stage_factory("line_filter")({"exclude_lines": ["^#"]})
    out2 = st2.process(pa.table({"message": ["# comment", "data", None]}))
    assert out2.column("message").to_pylist() == ["data", None]


def test_runner_mysql_error_multiline_golden(ray_session):
    """mysql/error end-to-end through the reader opts: record reader ->
    multiline join -> compiled ingest chain, vs the module's own golden."""
    mysql = "/root/reference/filebeat/module/mysql"
    if not os.path.isdir(mysql):
        pytest.skip("mysql module not present")
    from beats_ray.__main__ import multiline_pre_transform
    from beats_ray.modules import fileset_reader_opts
    from beats_ray.sources.readers import read_log_records
    opts = fileset_reader_opts(mysql, "error")
    spec, _ = compile_fileset_spec(mysql, "mysql", "error")
    # the beats golden harness fakes TZ=-02:00 (see test_apache_golden)
    spec = [{"add_locale": {"fields": {"event.timezone": "-02:00"}}}
            if isinstance(p, dict) and "add_locale" in p else p
            for p in spec]
    logp = f"{mysql}/error/test/error.log"
    ds = read_log_records([logp])
    ds = multiline_pre_transform(opts["multiline"])(ds)
    out = Pipeline({"processors": spec}).apply(ds)
    rows = sorted(out.take_all(), key=lambda r: r["log_offset"])
    expected = json.load(open(logp + "-expected.json"))
    check_golden(rows, expected)


def test_module_cli_e2e(tmp_path):
    """`python -m beats_ray module` in a fresh process: reads the module's
    own test log, writes routed parquet + manifest, prints sink counts."""
    out = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, "-m", "beats_ray", "module",
         "--module-dir", APACHE, "--fileset", "access",
         "--input", f"{APACHE}/access/test/test.log",
         "--output", str(out)],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["sink_counts"] == {"apache.access": 7}
    files = glob.glob(str(out / "sink=apache.access" / "*.parquet"))
    assert files
    t = pq.read_table(files[0])
    assert t.num_rows == 7
    got = set(t.column("http_response_status_code").to_pylist())
    exp = json.load(open(f"{APACHE}/access/test/test.log-expected.json"))
    assert got == {e["http.response.status_code"] for e in exp}
