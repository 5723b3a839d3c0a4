"""Filestream-analogue end-to-end: raw .log FILES -> read_text harvester ->
parser chain -> processor chain == the same pipeline over the parquet table.
Proves the reader chain (SURVEY.md §2.1) produces identical events from the
byte-level representation."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def test_log_files_match_parquet_path(ray_session):
    from beats_ray.pipeline import Pipeline
    from beats_ray.sources.readers import read_log_lines
    from beats_ray.sources.transcripts import transcripts_path

    # dump the sf0.001 transcript text column as raw log files (one line per
    # turn, keyed so we can re-associate), like a harvested directory
    tbl = pq.read_table(transcripts_path("sf0.001")) \
            .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]) \
            .slice(0, 2000)
    logdir = "/tmp/beats_ray_test/logs"
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir)
    # text may contain no newlines by construction (one event per line)
    texts = tbl.column("text").to_pylist()
    half = len(texts) // 2
    for name, chunk in [("a.log", texts[:half]), ("b.log", texts[half:])]:
        with open(os.path.join(logdir, name), "w") as f:
            f.write("\n".join(chunk) + "\n")

    spec = {"processors": [
        {"dissect": {"tokenizer": 'level=%{level} ts=%{ts} caller=%{caller} msg="%{msg}"',
                     "field": "message", "target_prefix": "log",
                     "ignore_failure": True,
                     "when": {"regexp": {"message": "^level="}}}},
    ]}

    # path 1: harvested files
    ds_files = read_log_lines(logdir)
    out_files = Pipeline(spec).apply(ds_files).to_pandas()
    assert set(out_files["log_file_path"].str.split("/").str[-1]) == {"a.log", "b.log"}

    # path 2: the parquet table (line column renamed to the readers'
    # Beats-canonical "message")
    tbl2 = tbl.rename_columns(
        ["message" if c == "text" else c for c in tbl.column_names])
    out_tbl = Pipeline(spec).run_local(tbl2).to_pandas()

    # identical parse results (order-insensitive)
    key = ["message", "log_level", "log_caller", "log_msg"]
    a = out_files[key].fillna("").sort_values(key).reset_index(drop=True)
    b = out_tbl[key].fillna("").sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_parser_chain_from_config(ray_session):
    """parsers: config list -> processors -> run over harvested lines."""
    import ray.data as rd
    from beats_ray.pipeline import Pipeline
    from beats_ray.sources.readers import parsers_to_processors

    lines = ['{"msg": "a", "lvl": "info"}', "keep plain", '{"msg": "b", "lvl": "err"}']
    ds = rd.from_arrow(pa.table({"message": lines}))
    procs = parsers_to_processors([
        {"ndjson": {"message_key": "message", "target": "j"}},
    ])
    out = Pipeline({"processors": procs}).apply(ds).to_pandas()
    assert sorted(x for x in out["j_msg"] if x is not None) == ["a", "b"]


def test_cli_run_and_resume(tmp_path):
    """python -m beats_ray run --config ... executes a YAML pipeline with
    routed sinks and manifest-based resume (subprocess: own Ray session)."""
    import json
    import subprocess
    import sys

    from beats_ray.sources.transcripts import transcripts_path
    cfg = tmp_path / "p.yml"
    out_dir = tmp_path / "out"
    cfg.write_text(f"""
input:
  type: parquet
  paths: ["{transcripts_path('sf0.001')}/*.parquet"]
processors:
  - add_fields: {{target: "", fields: {{env: test}}}}
output:
  path: {out_dir}
  default_sink: all
""")
    def run_once():
        p = subprocess.run([sys.executable, "-m", "beats_ray", "run",
                            "--config", str(cfg)],
                           capture_output=True, text=True, cwd="/root/repo",
                           env={**os.environ, "RAY_ADDRESS": "local"})
        assert p.returncode == 0, p.stderr[-2000:]
        return json.loads(p.stdout.strip().splitlines()[-1])
    r1 = run_once()
    assert r1["sink_counts"]["all"] == 6000 and r1["partitions_run"] >= 1
    r2 = run_once()
    assert r2["partitions_run"] == 0 and r2["sink_counts"] == r1["sink_counts"]


def test_cli_ndjson_output(tmp_path):
    import json
    import subprocess
    import sys

    from beats_ray.sources.transcripts import transcripts_path
    cfg = tmp_path / "p.yml"
    out_dir = tmp_path / "out"
    cfg.write_text(f"""
input:
  type: parquet
  paths: ["{transcripts_path('sf0.001')}/*.parquet"]
output:
  path: {out_dir}
  format: ndjson
  default_sink: all
""")
    p = subprocess.run([sys.executable, "-m", "beats_ray", "run",
                        "--config", str(cfg)],
                       capture_output=True, text=True, cwd="/root/repo",
                       env={**os.environ, "RAY_ADDRESS": "local"})
    assert p.returncode == 0, p.stderr[-1500:]
    r = json.loads(p.stdout.strip().splitlines()[-1])
    assert r["sink_counts"]["all"] == 6000
    files = glob.glob(str(out_dir / "sink=all" / "*.ndjson"))
    assert files
    first = json.loads(open(files[0]).readline())
    assert "conv_id" in first and "ts" in first
