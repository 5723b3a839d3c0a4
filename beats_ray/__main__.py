"""CLI — run a Beats-shaped YAML pipeline config on Ray Data.

    python -m beats_ray run --config pipeline.yml [--resume]

Config shape mirrors filebeat.yml (SURVEY.md §2.7):

    input:
      type: parquet | log            # parquet table or raw log lines
      paths: ["/data/*.parquet"]
      parsers:                       # reader chain (ndjson/syslog/container/
        - ndjson: {message_key: text}#  include_message/multiline)
    processors:                      # the per-record chain
      - dissect: {tokenizer: "...", field: text}
      - add_fields: {fields: {env: prod}}
    output:
      path: /tmp/out                 # routed parquet sinks + manifest
      format: parquet | ndjson
      default_sink: default
      indices:                       # Beats indices:-style selector rules
        - index: errors
          when: {equals: {log_level: ERROR}}
    queue: {}                        # accepted, ignored (Ray executor)
    files_per_partition: 8           # resume granularity

The run is resumable: re-invoking with --resume skips partitions already in
the output manifest (state/manifest.py).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def build_pipeline_from_config(cfg: dict):
    from .pipeline import Pipeline
    from .sources.readers import parsers_to_processors

    processors: list = []
    input_cfg = cfg.get("input", {})
    for p in parsers_to_processors(input_cfg.get("parsers", [])):
        if "__multiline__" in p:
            raise NotImplementedError(
                "multiline parser requires the grouped operator; use "
                "beats_ray.stages.flow.multiline_join in a script for now")
        processors.append(p)
    processors.extend(cfg.get("processors", []))
    out = cfg.get("output", {})
    spec = {"processors": processors}
    if out.get("indices") or out.get("default_sink"):
        spec["route"] = {"rules": out.get("indices", []),
                        "default": out.get("default_sink", "default"),
                        "target": "sink"}
    return Pipeline(spec)


def cmd_run(args) -> int:
    import yaml

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    pipe = build_pipeline_from_config(cfg)
    input_cfg = cfg.get("input", {})
    out_cfg = cfg.get("output", {})
    out_dir = out_cfg.get("path", "/tmp/beats_ray_out")

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    files: list[str] = []
    for pat in input_cfg.get("paths", []):
        files.extend(sorted(glob.glob(pat)))
    if not files:
        print(f"no input files matched {input_cfg.get('paths')}", file=sys.stderr)
        return 2

    if input_cfg.get("type", "parquet") == "log":
        # raw log lines: no per-file partition resume (read_text path);
        # run one pass over everything
        from .sinks.parquet import sink_counts, write_routed
        from .sources.readers import read_log_lines
        ds = read_log_lines(files)
        man = write_routed(pipe.apply(ds), out_dir)
        counts = sink_counts(man)
        print(json.dumps({"sink_counts": counts, "partitions_run": 1,
                          "partitions_skipped": 0}))
        return 0

    from .state.manifest import run_resumable
    counts, ran, skipped = run_resumable(
        pipe, files, out_dir,
        files_per_partition=int(cfg.get("files_per_partition", 8)),
        output_format=out_cfg.get("format", "parquet"))
    print(json.dumps({"sink_counts": counts, "partitions_run": ran,
                      "partitions_skipped": skipped}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="beats_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run a YAML pipeline config")
    runp.add_argument("--config", required=True)
    runp.add_argument("--resume", action="store_true",
                      help="(default behavior) skip completed partitions")
    args = ap.parse_args(argv)
    if args.cmd == "run":
        return cmd_run(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
