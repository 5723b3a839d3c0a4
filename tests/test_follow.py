"""Follow mode (state/follow.py): the continuous harvester/registrar loop.

Reference semantics being checked (filestream fswatch scan loop + registrar
offset checkpoints, registrar.go:131-212): only complete new lines are
consumed per scan, offsets persist across process restarts, truncation
restarts the stream, and the parquet flavour picks up appended input files
via the resume manifest."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import yaml


def _pipe(default_sink="default"):
    from beats_ray.pipeline import Pipeline
    return Pipeline({"processors": [
        {"add_fields": {"fields": {"env": "t"}, "target": ""}}],
        "route": {"rules": [], "default": default_sink, "target": "sink"}})


def _read_sink(out_dir, sink="default"):
    files = glob.glob(os.path.join(str(out_dir), f"sink={sink}", "*.parquet"))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_follow_tails_appended_lines(ray_session, tmp_path):
    """Scan 1 consumes the initial lines; lines appended afterwards are
    consumed by scan 2 ONLY (no reprocessing), with log_offset continuing
    where scan 1 left off — registrar state is re-read from disk each
    scan, which is also the restart-persistence property."""
    from beats_ray.state.follow import follow_once
    logf = tmp_path / "app.log"
    logf.write_text("l0\nl1\nl2\n")
    out = tmp_path / "out"
    pipe = _pipe()

    r1 = follow_once(pipe, [str(logf)], str(out), 1)
    assert r1["lines"] == 3 and r1["files_grown"] == 1
    assert r1["sink_counts"] == {"default": 3}

    # no growth -> empty scan, nothing written, no error
    r2 = follow_once(pipe, [str(logf)], str(out), 2)
    assert r2 == {"scan": 2, "files_grown": 0, "lines": 0, "sink_counts": {}}

    with open(logf, "a") as f:
        f.write("l3\nl4\n")
    r3 = follow_once(pipe, [str(logf)], str(out), 3)
    assert r3["lines"] == 2 and r3["sink_counts"] == {"default": 2}

    tbl = _read_sink(out)
    assert sorted(tbl.column("message").to_pylist()) == \
        ["l0", "l1", "l2", "l3", "l4"]
    # offsets are the cumulative per-file line numbers across scans
    assert sorted(tbl.column("log_offset").to_pylist()) == [0, 1, 2, 3, 4]


def test_follow_holds_partial_line(ray_session, tmp_path):
    """A trailing line without its newline is NOT consumed (the reference's
    line reader waits for the terminator); once completed it is consumed
    exactly once."""
    from beats_ray.state.follow import follow_once
    logf = tmp_path / "app.log"
    logf.write_text("done\npart")  # "part" not newline-terminated
    out = tmp_path / "out"
    pipe = _pipe()

    r1 = follow_once(pipe, [str(logf)], str(out), 1)
    assert r1["lines"] == 1
    assert _read_sink(out).column("message").to_pylist() == ["done"]

    with open(logf, "a") as f:
        f.write("ial\nnext\n")
    r2 = follow_once(pipe, [str(logf)], str(out), 2)
    assert r2["lines"] == 2
    assert sorted(_read_sink(out).column("message").to_pylist()) == \
        ["done", "next", "partial"]


def test_follow_truncation_restarts_stream(ray_session, tmp_path):
    """size < checkpointed offset => file was truncated/rotated in place;
    the stream restarts from 0 with a fresh line counter."""
    from beats_ray.state.follow import Registrar, follow_once
    logf = tmp_path / "app.log"
    logf.write_text("old0\nold1\nold2\n")
    out = tmp_path / "out"
    pipe = _pipe()
    follow_once(pipe, [str(logf)], str(out), 1)

    logf.write_text("new0\n")  # shorter than the 15-byte checkpoint
    r2 = follow_once(pipe, [str(logf)], str(out), 2)
    assert r2["lines"] == 1
    reg = Registrar(str(out))
    assert reg.offset(str(logf)) == 5 and reg.lines(str(logf)) == 1
    msgs = _read_sink(out).column("message").to_pylist()
    assert "new0" in msgs and msgs.count("new0") == 1


def test_follow_multiple_files_and_new_file(ray_session, tmp_path):
    """A file appearing between scans is picked up like a grown file."""
    from beats_ray.state.follow import follow_once
    a = tmp_path / "a.log"
    a.write_text("a0\n")
    out = tmp_path / "out"
    pipe = _pipe()
    paths = lambda: sorted(glob.glob(str(tmp_path / "*.log")))  # noqa: E731

    assert follow_once(pipe, paths(), str(out), 1)["lines"] == 1
    b = tmp_path / "b.log"
    b.write_text("b0\nb1\n")
    r2 = follow_once(pipe, paths(), str(out), 2)
    assert r2["files_grown"] == 1 and r2["lines"] == 2
    tbl = _read_sink(out)
    assert sorted(tbl.column("message").to_pylist()) == ["a0", "b0", "b1"]


def test_follow_rejects_utf16(ray_session, tmp_path):
    from beats_ray.state.follow import read_log_deltas
    with pytest.raises(ValueError, match="utf-16"):
        read_log_deltas([("x", 0, 4, 0)], encoding="utf-16le")


def _cli_args(cfg_path, max_scans=1):
    class A:
        config = str(cfg_path)
        resume = False
        follow = True
        scan_frequency = 0.01
        max_scans_ = max_scans
    A.max_scans = max_scans
    return A()


def test_cli_follow_log_end_to_end(ray_session, tmp_path, capsys):
    """`python -m beats_ray run --follow` over a log input: two invocations
    (process restarts) tail the same file; the second consumes only the
    appended delta."""
    from beats_ray.__main__ import cmd_run
    logf = tmp_path / "app.log"
    logf.write_text("e1\ne2\n")
    out = tmp_path / "out"
    cfg = {"input": {"type": "log", "paths": [str(tmp_path / "*.log")]},
           "processors": [],
           "output": {"path": str(out), "default_sink": "default"}}
    cfgp = tmp_path / "cfg.yml"
    cfgp.write_text(yaml.safe_dump(cfg))

    assert cmd_run(_cli_args(cfgp)) == 0
    rep1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep1["lines"] == 2

    with open(logf, "a") as f:
        f.write("e3\n")
    assert cmd_run(_cli_args(cfgp)) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["lines"] == 1

    tbl = _read_sink(out)
    assert sorted(tbl.column("message").to_pylist()) == ["e1", "e2", "e3"]


def test_cli_follow_parquet_picks_up_new_files(ray_session, tmp_path, capsys):
    """Parquet follow: scans re-plan partitions; a file appended between
    invocations is processed as a delta partition, finished ones skipped."""
    from beats_ray.__main__ import cmd_run
    data = tmp_path / "in"
    data.mkdir()
    pq.write_table(pa.table({"x": [1, 2, 3]}), data / "part0.parquet")
    out = tmp_path / "out"
    cfg = {"input": {"type": "parquet", "paths": [str(data / "*.parquet")]},
           "processors": [],
           "output": {"path": str(out), "default_sink": "default"},
           "files_per_partition": 1}
    cfgp = tmp_path / "cfg.yml"
    cfgp.write_text(yaml.safe_dump(cfg))

    assert cmd_run(_cli_args(cfgp)) == 0
    rep1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep1["partitions_run"] == 1 and rep1["sink_counts"] == {"default": 3}

    pq.write_table(pa.table({"x": [4, 5]}), data / "part1.parquet")
    assert cmd_run(_cli_args(cfgp)) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["partitions_run"] == 1 and rep2["partitions_skipped"] == 1

    tbl = _read_sink(out)
    assert sorted(tbl.column("x").to_pylist()) == [1, 2, 3, 4, 5]


def test_cli_follow_multiline_flushes_per_scan(ray_session, tmp_path, capsys):
    """Multiline joins apply WITHIN a scan's delta (documented batch
    analogue: a group straddling scans is flushed at the boundary)."""
    from beats_ray.__main__ import cmd_run
    logf = tmp_path / "app.log"
    logf.write_text("[e1\ncont1\n[e2\n")
    out = tmp_path / "out"
    cfg = {"input": {"type": "log", "paths": [str(logf)],
                     "parsers": [{"multiline": {
                         "type": "pattern", "pattern": r"^\[",
                         "negate": True, "match": "after"}}]},
           "output": {"path": str(out), "default_sink": "default"}}
    cfgp = tmp_path / "cfg.yml"
    cfgp.write_text(yaml.safe_dump(cfg))

    assert cmd_run(_cli_args(cfgp)) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["sink_counts"] == {"default": 2}
    tbl = _read_sink(out)
    assert sorted(tbl.column("message").to_pylist()) == ["[e1\ncont1", "[e2"]
