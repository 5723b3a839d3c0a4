"""Multiline `count` and `while_pattern` modes + CLI wiring — golden cases
mirror libbeat/reader/multiline/multiline_test.go:200-285."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _lines_table(lines, conv="f1"):
    return pa.table({"conv_id": pa.array([conv] * len(lines), pa.string()),
                     "turn_idx": pa.array(range(len(lines)), pa.int32()),
                     "text": pa.array(lines, pa.string())})


def _join(ds, **kw):
    from beats_ray.stages.flow import multiline_join
    out = multiline_join(ds, **kw).to_pandas()
    return out.sort_values("turn_idx")["text"].tolist()


# ---- count mode (multiline_test.go TestMultilineCount) ----------------

def test_count_groups_of_two(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(_lines_table(["line1", " line1.1", "line2", " line2.1"]))
    got = _join(ds, mode="count", count_lines=2, max_lines=2)
    assert got == ["line1\n line1.1", "line2\n line2.1"]


def test_count_groups_of_four(ray_session):
    import ray.data as rd
    lines = ["line1", " line1.1", "line2", " line2.1",
             "line3", " line3.1", "line4", " line4.1"]
    ds = rd.from_arrow(_lines_table(lines))
    got = _join(ds, mode="count", count_lines=4, max_lines=4)
    assert got == ["line1\n line1.1\nline2\n line2.1",
                   "line3\n line3.1\nline4\n line4.1"]


def test_count_one_passthrough(ray_session):
    import ray.data as rd
    lines = ["line1", "line1.1", "line2", "line2.1"]
    ds = rd.from_arrow(_lines_table(lines))
    got = _join(ds, mode="count", count_lines=1, max_lines=1)
    assert got == lines


def test_count_skips_empty_lines(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(_lines_table(["a", "", "b", "c", "", "d"]))
    got = _join(ds, mode="count", count_lines=2, max_lines=2)
    assert got == ["a\nb", "c\nd"]


def test_count_max_lines_truncates_but_grouping_counts(ray_session):
    """LinesCount=3 with max_lines=2: groups of 3 lines, message keeps 2
    (messageBuffer truncation counts processedLines regardless)."""
    import ray.data as rd
    lines = ["line1", " line1.1", " line1.2", "line2", " line2.1", " line2.2"]
    ds = rd.from_arrow(_lines_table(lines))
    got = _join(ds, mode="count", count_lines=3, max_lines=2)
    assert got == ["line1\n line1.1", "line2\n line2.1"]


# ---- while_pattern mode (TestMultilineWhilePattern) -------------------

def test_while_pattern_runs_merge(ray_session):
    import ray.data as rd
    lines = ["{line1", "{line1.1", "not matched line", "{line2", "{line2.1"]
    ds = rd.from_arrow(_lines_table(lines))
    got = _join(ds, mode="while_pattern", pattern=r"^\{")
    assert got == ["{line1\n{line1.1", "not matched line", "{line2\n{line2.1"]


def test_while_pattern_negated(ray_session):
    import ray.data as rd
    lines = ["{line1", "panic:", "~stacktrace~", "{line2"]
    ds = rd.from_arrow(_lines_table(lines))
    got = _join(ds, mode="while_pattern", pattern=r"^\{", negate=True)
    assert got == ["{line1", "panic:\n~stacktrace~", "{line2"]


def test_while_pattern_truncated(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(_lines_table(["{line1", "{line1.1", "{line1.2"]))
    got = _join(ds, mode="while_pattern", pattern=r"^\{", max_lines=2)
    assert got == ["{line1\n{line1.1"]


def test_stage_form_matches_grouped(ray_session):
    """The batch-local stage on a whole-conversation batch == multiline_join."""
    from beats_ray.stages.base import stage_factory
    lines = ["{a", "{b", "x", "{c"]
    batch = _lines_table(lines)
    st = stage_factory("multiline")({"type": "while_pattern", "pattern": r"^\{"})
    st.setup()
    out = st.apply(batch)
    assert out.column("text").to_pylist() == ["{a\n{b", "x", "{c"]
    assert out.column("n_lines").to_pylist() == [2, 1, 1]


# ---- CLI wiring -------------------------------------------------------

@pytest.mark.parametrize("ml_cfg,lines,want_msgs", [
    ({"type": "pattern", "pattern": r"^\[", "negate": True, "match": "after"},
     ["[evt1", "cont", "[evt2"], ["[evt1\ncont", "[evt2"]),
    ({"type": "count", "count_lines": 2},
     ["a", "b", "c", "d"], ["a\nb", "c\nd"]),
    ({"type": "while_pattern", "pattern": r"^ "},
     ["head", " t1", " t2", "head2"], ["head", " t1\n t2", "head2"]),
])
def test_cli_multiline_end_to_end(ray_session, tmp_path, ml_cfg, lines, want_msgs):
    """A filebeat.yml with each multiline type runs via python -m beats_ray
    run (the round-1 CLI raised NotImplementedError at the front door)."""
    import yaml
    from beats_ray.__main__ import cmd_run

    logf = tmp_path / "app.log"
    logf.write_text("\n".join(lines) + "\n")
    out_dir = tmp_path / "out"
    cfg = {
        "input": {"type": "log", "paths": [str(logf)],
                  "parsers": [{"multiline": ml_cfg}]},
        "processors": [{"add_fields": {"fields": {"env": "test"},
                                       "target": ""}}],
        "output": {"path": str(out_dir), "default_sink": "default"},
    }
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    class A:
        config = str(cfg_path)
        resume = False

    rc = cmd_run(A())
    assert rc == 0
    import glob
    files = glob.glob(str(out_dir / "sink=default" / "*.parquet"))
    assert files
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    texts = sorted(tbl.column("message").to_pylist())
    assert texts == sorted(want_msgs)
    assert set(tbl.column("env").to_pylist()) == {"test"}


def test_cli_auditd_parser_end_to_end(ray_session, tmp_path):
    """filebeat.yml with the auditd parser runs via the CLI front door."""
    import glob
    import json as _json

    import yaml
    from beats_ray.__main__ import cmd_run

    logf = tmp_path / "audit.log"
    logf.write_text(
        "type=SYSCALL msg=audit(1492752520.441:8832): arch=c000003e "
        'syscall=43 success=yes exit=5 comm="sshd"\n'
        "type=SERVICE_START msg=audit(1594053514.709:6): pid=1 uid=0 "
        "msg='unit=auditd res=success'\n")
    out_dir = tmp_path / "out"
    cfg = {"input": {"type": "log", "paths": [str(logf)],
                     "parsers": [{"auditd": {}}]},
           "output": {"path": str(out_dir), "default_sink": "default"}}
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    class A:
        config = str(cfg_path)
        resume = False

    assert cmd_run(A()) == 0
    files = glob.glob(str(out_dir / "sink=default" / "*.parquet"))
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    types = sorted(tbl.column("auditd_record_type").to_pylist())
    assert types == ["SERVICE_START", "SYSCALL"]
    recs = {r: _json.loads(m) for r, m in
            zip(tbl.column("auditd_record_type").to_pylist(),
                tbl.column("auditd_log").to_pylist())}
    assert recs["SYSCALL"]["syscall"] == "accept"
    assert recs["SERVICE_START"]["result"] == "success"


def test_example_configs_compile_and_run(ray_session, tmp_path):
    """Every committed examples/*.yml compiles through the CLI front door
    and runs end-to-end on a tiny synthetic input."""
    import glob as _glob

    import yaml
    from beats_ray.__main__ import build_pipeline_from_config, cmd_run

    samples = {
        "syslog-to-routed-parquet.yml":
            "<34>Oct 11 22:14:15 myhost su[230]: auth failure\n",
        "java-stacktraces-multiline.yml":
            "2024-06-01T10:00:00Z ERROR com.app.Main - boom\n"
            "    at com.app.Main.run(Main.java:10)\n"
            "Caused by: java.io.IOException\n",
        "auditd-parquet.yml":
            "type=SYSCALL msg=audit(1492752520.441:8832): arch=c000003e "
            'syscall=59 success=yes exit=0 comm="bash"\n',
    }
    for name, sample in samples.items():
        cfg = yaml.safe_load(open(f"examples/{name}"))
        # compile check (the front-door failure mode round 1 had)
        build_pipeline_from_config(cfg)
        # run on a synthetic file
        logf = tmp_path / (name + ".log")
        logf.write_text(sample)
        out_dir = tmp_path / (name + ".out")
        cfg["input"]["paths"] = [str(logf)]
        cfg["output"]["path"] = str(out_dir)
        cfg_path = tmp_path / (name + ".cfg.yml")
        cfg_path.write_text(yaml.safe_dump(cfg))

        class A:
            config = str(cfg_path)
            resume = False

        assert cmd_run(A()) == 0, name
        assert _glob.glob(str(out_dir / "sink=*" / "*.parquet")), name
