"""End-to-end golden tests on the deterministic transcript table (FIXTURES.md
F1/F4/F6): Ray Dataset run == local single-process run under stable
(conv_id, turn_idx) ordering; routed per-sink counts match a pure-pyarrow
oracle; resume skips completed partitions."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from beats_ray.pipelines.flagship import flagship_pipeline, flagship_spec
from beats_ray.pipeline import Pipeline
from beats_ray.sources.transcripts import generate_transcripts, transcripts_path


def _sorted(t: pa.Table) -> pa.Table:
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_generator_deterministic():
    a = generate_transcripts(2000)
    b = generate_transcripts(2000)
    assert a.equals(b)


def test_flagship_ray_matches_local(ray_session, transcripts_small):
    """Per-turn text equality + full-row equality between the distributed run
    and the local oracle run, under stable (conv_id, turn_idx) sort."""
    import ray.data as rd
    pipe = flagship_pipeline(broadcast=False)
    local = _sorted(Pipeline(flagship_spec()).run_local(transcripts_small))

    ds = rd.read_parquet(transcripts_path("sf0.001"))
    out = pipe.apply(ds)
    dist = _sorted(pa.Table.from_pandas(out.to_pandas(), preserve_index=False))

    assert dist.num_rows == local.num_rows
    for col in ["conv_id", "turn_idx", "text", "sink", "fp", "tool_category"]:
        assert dist.column(col).to_pylist() == local.column(col).to_pylist(), col


def test_routed_write_and_counts(ray_session):
    import ray.data as rd
    from beats_ray.sinks.parquet import sink_counts, write_routed
    out_dir = "/tmp/beats_ray_test/routed"
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = rd.read_parquet(transcripts_path("sf0.001"))
    pipe = flagship_pipeline(broadcast=False)
    man = write_routed(pipe.apply(ds), out_dir)
    counts = sink_counts(man)

    # oracle: local run, pure pyarrow
    local = Pipeline(flagship_spec()).run_local(
        pq.read_table(transcripts_path("sf0.001")))
    vc = pc.value_counts(local.column("sink"))
    expected = {d["values"]: d["counts"] for d in vc.to_pylist()}
    assert counts == expected

    # written files: per-sink dirs, meta/error columns dropped
    for sink, n in expected.items():
        files = glob.glob(os.path.join(out_dir, f"sink={sink}", "*.parquet"))
        assert files, sink
        got = pa.concat_tables([pq.read_table(f) for f in files])
        assert got.num_rows == n
        assert not any(c.startswith("meta_") for c in got.column_names)


def test_resume_skips_completed_partitions(ray_session):
    from beats_ray.state.manifest import run_resumable
    out_dir = "/tmp/beats_ray_test/resume"
    shutil.rmtree(out_dir, ignore_errors=True)
    files = sorted(glob.glob(os.path.join(transcripts_path("sf0.001"), "*.parquet")))
    pipe = flagship_pipeline(broadcast=False)
    total1, ran1, skipped1 = run_resumable(pipe, files, out_dir, files_per_partition=2)
    assert ran1 > 1 and skipped1 == 0
    # second run: everything checkpointed -> all skipped, same totals
    total2, ran2, skipped2 = run_resumable(pipe, files, out_dir, files_per_partition=2)
    assert ran2 == 0 and skipped2 == ran1
    assert total2 == total1
    # simulate a crash: drop the last manifest line -> exactly one partition re-runs
    man_path = os.path.join(out_dir, "_manifest", "partitions.jsonl")
    lines = open(man_path).read().strip().splitlines()
    with open(man_path, "w") as f:
        f.write("\n".join(lines[:-1]) + "\n")
    total3, ran3, skipped3 = run_resumable(pipe, files, out_dir, files_per_partition=2)
    assert ran3 == 1 and skipped3 == ran1 - 1
    assert total3 == total1  # idempotent rewrite, counts unchanged


def test_entry_contract(ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e
    res = e.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 15


def test_dead_letter_rejects_partition(ray_session):
    """Rows poisoned by a processor error route to the _rejects partition
    (ES dead-letter analogue) and keep their error_message for triage."""
    import ray.data as rd
    from beats_ray.pipeline import Pipeline
    from beats_ray.sinks.parquet import sink_counts, write_routed

    out_dir = "/tmp/beats_ray_test/deadletter"
    shutil.rmtree(out_dir, ignore_errors=True)
    tbl = pa.table({"conv_id": ["c1", "c2"], "turn_idx": [0, 1],
                    "n": ["42", "not-a-number"]})
    pipe = Pipeline({"processors": [
        {"convert": {"fields": [{"from": "n", "type": "long"}]}},
    ], "route": {"rules": [], "default": "main", "target": "sink"}})
    man = write_routed(pipe.apply(rd.from_arrow(tbl)), out_dir)
    counts = sink_counts(man)
    assert counts == {"main": 1, "_rejects": 1}
    rej = pq.read_table(glob.glob(os.path.join(out_dir, "sink=_rejects", "*.parquet"))[0])
    assert rej.column("error_message").to_pylist()[0] is not None


def test_ndjson_sink(ray_session):
    import json as _json
    import ray.data as rd
    from beats_ray.sinks.ndjson import write_ndjson_routed
    out_dir = "/tmp/beats_ray_test/ndjson"
    shutil.rmtree(out_dir, ignore_errors=True)
    import datetime
    tbl = pa.table({"conv_id": ["a", "b"], "sink": ["s1", "s2"],
                    "ts": pa.array([datetime.datetime(2024, 1, 1, 0, 0, 0, 123000)] * 2,
                                   pa.timestamp("us")),
                    "meta_id": ["m1", "m2"]})
    man = write_ndjson_routed(rd.from_arrow(tbl), out_dir)
    rows = man.take_all()
    assert {r["sink"] for r in rows} == {"s1", "s2"}
    f = glob.glob(os.path.join(out_dir, "sink=s1", "*.ndjson"))[0]
    obj = _json.loads(open(f).read().strip())
    assert obj["conv_id"] == "a"
    assert obj["ts"] == "2024-01-01T00:00:00.123Z"  # RFC3339-millis (codec json)
    assert "meta_id" not in obj and "sink" not in obj


def test_format_codec_and_console_discard(ray_session, capsys):
    import ray.data as rd
    from beats_ray.sinks.ndjson import console_sink, discard_sink, render_format
    tbl = pa.table({"host": ["a", "b"], "lvl": ["info", "warn"]})
    ds = rd.from_arrow(tbl)
    lines = console_sink(ds, fmt="%{[host]} - %{[lvl]}")
    assert lines == ["a - info", "b - warn"]
    assert discard_sink(rd.from_arrow(tbl)) == 2
    out = render_format(rd.from_arrow(tbl), "%{[host]}:%{[lvl]}").to_pandas()
    assert list(out["rendered"]) == ["a:info", "b:warn"]


def test_manifest_metrics_counters(ray_session, tmp_path):
    """Per-partition lineage metrics mirror the libbeat pipeline counters
    (events.total / events.published / events.filtered,
    monitoring.go:73-113): a chain that drops rows must account for every
    input row exactly."""
    from beats_ray.pipeline import Pipeline
    from beats_ray.state.manifest import RunManifest, run_resumable
    files = sorted(glob.glob(os.path.join(transcripts_path("sf0.001"), "*.parquet")))
    pipe = Pipeline({"processors": [
        {"drop_event": {"when": {"equals": {"role": "system"}}}},
    ], "route": {"rules": [], "default": "kept", "target": "sink"}})
    out_dir = str(tmp_path / "m")
    totals, ran, _ = run_resumable(pipe, files, out_dir, files_per_partition=3)
    man = RunManifest(out_dir).completed()
    tot = sum(r["metrics"]["events_total"] for r in man.values())
    pub = sum(r["metrics"]["events_published"] for r in man.values())
    filt = sum(r["metrics"]["events_filtered"] for r in man.values())
    assert tot == 6000
    assert tot == pub + filt
    # oracle: count of role == system rows
    t = pq.read_table(transcripts_path("sf0.001"))
    expected_filtered = pc.sum(pc.equal(t["role"], "system")).as_py()
    assert filt == expected_filtered
    assert totals == {"kept": pub}
