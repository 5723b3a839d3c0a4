"""CLI — run a Beats-shaped YAML pipeline config on Ray Data.

    python -m beats_ray run --config pipeline.yml [--resume]
    python -m beats_ray run --config pipeline.yml --follow \
        [--scan-frequency 10] [--max-scans N]

``--follow`` is the continuous harvester/scan loop (state/follow.py): log
inputs tail per-file byte offsets through an ack-gated registrar; parquet
inputs re-plan partitions each scan and the resume manifest skips finished
ones (append-only growth handled as delta partitions).

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


def multiline_pre_transform(mc: dict, is_log: bool = True):
    """Beats ``multiline:`` config -> Dataset-level grouped transform
    (an ordering-sensitive per-file fold a row-local chain can't express)."""
    mc = dict(mc)
    conv_col = mc.pop("conv_col", "log_file_path" if is_log else "conv_id")
    order_col = mc.pop("order_col", "log_offset" if is_log else "turn_idx")
    field = mc.pop("field", "message" if is_log else "text")
    mode = mc.pop("type", "pattern")
    count_lines = int(mc.pop("count_lines", 1))
    max_lines = mc.pop("max_lines", None)
    if max_lines is None:
        max_lines = count_lines if mode == "count" else 500
    kw = dict(pattern=mc.get("pattern"),
              negate=bool(mc.get("negate", False)),
              match=mc.get("match", "after"),
              flush_pattern=mc.get("flush_pattern"),
              mode=mode, count_lines=count_lines,
              max_lines=int(max_lines),
              conv_col=conv_col, order_col=order_col,
              text_col=field)
    if mode != "count" and not kw["pattern"]:
        raise ValueError("multiline.pattern is required for type="
                         f"{mode} (multiline_config.go:68-79)")

    def transform(ds):
        from .stages.flow import multiline_join
        return multiline_join(ds, **kw)

    return transform


def build_pipeline_from_config(cfg: dict):
    """Compile the YAML config -> (Pipeline, pre_transforms).

    ``pre_transforms`` are Dataset-level grouped operators (currently the
    multiline parser — an ordering-sensitive per-file fold that a row-local
    processor chain cannot express) applied before the per-record pipeline.

    Partitioning assumption (resumable parquet inputs): the multiline group
    key (``conv_col``, default conv_id / log_file_path) must not span
    ``files_per_partition`` boundaries — the grouped fold runs per resume
    partition, like the reference's per-file reader state.  Log inputs
    satisfy this by construction (one file = one stream).
    """
    from .pipeline import Pipeline
    from .sources.readers import parsers_to_processors

    processors: list = []
    pre_transforms: list = []
    input_cfg = cfg.get("input", {})
    is_log = input_cfg.get("type", "parquet") == "log"
    for p in parsers_to_processors(input_cfg.get("parsers", [])):
        if "__multiline__" in p:
            pre_transforms.append(
                multiline_pre_transform(p["__multiline__"], is_log))
        else:
            processors.append(p)
    processors.extend(cfg.get("processors", []))
    out = cfg.get("output", {})
    spec = {"processors": processors}
    if out.get("indices") or out.get("default_sink"):
        spec["route"] = {"rules": out.get("indices", []),
                        "default": out.get("default_sink", "default"),
                        "target": "sink"}
    return Pipeline(spec), pre_transforms


def cmd_run(args) -> int:
    import yaml

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    pipe, pre_transforms = build_pipeline_from_config(cfg)
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
    if not files and not getattr(args, "follow", False):
        # follow mode tolerates an initially-empty input (files appear
        # later, like a harvester watching a fresh log directory)
        print(f"no input files matched {input_cfg.get('paths')}", file=sys.stderr)
        return 2

    is_log = input_cfg.get("type", "parquet") == "log"
    out_fmt = out_cfg.get("format", "parquet")

    if getattr(args, "follow", False):
        # continuous mode: the fswatcher/scan_frequency loop (SURVEY §2.1).
        # Log inputs tail byte offsets via the registrar (state/follow.py);
        # parquet inputs re-plan partitions each scan — the manifest
        # anti-join (+ append-only delta tags) skips finished work.
        import time

        from .state.follow import follow_once
        from .state.manifest import run_resumable
        scan = 0
        while True:
            scan += 1
            files = []
            for pat in input_cfg.get("paths", []):
                files.extend(sorted(glob.glob(pat)))
            if is_log:
                report = follow_once(
                    pipe, files, out_dir, scan,
                    encoding=input_cfg.get("encoding", ""),
                    pre_transforms=pre_transforms, output_format=out_fmt)
            else:
                counts, ran, skipped = run_resumable(
                    pipe, files, out_dir,
                    files_per_partition=int(
                        cfg.get("files_per_partition", 8)),
                    output_format=out_fmt, pre_transforms=pre_transforms)
                report = {"scan": scan, "partitions_run": ran,
                          "partitions_skipped": skipped,
                          "sink_counts": counts}
            print(json.dumps(report), flush=True)
            if args.max_scans and scan >= args.max_scans:
                return 0
            time.sleep(args.scan_frequency)

    if is_log:
        # raw log lines: no per-file partition resume (read_text path);
        # run one pass over everything
        from .sinks.parquet import sink_counts, write_routed
        from .sources.readers import read_log_lines, read_log_records
        # ordering-sensitive pre-transforms (multiline) need per-file line
        # order -> the record reader; plain chains use the line reader
        enc = input_cfg.get("encoding", "")
        ds = read_log_records(files, encoding=enc) if pre_transforms \
            else read_log_lines(files, encoding=enc)
        for tr in pre_transforms:
            ds = tr(ds)
        man = write_routed(pipe.apply(ds), out_dir)
        counts = sink_counts(man)
        print(json.dumps({"sink_counts": counts, "partitions_run": 1,
                          "partitions_skipped": 0}))
        return 0

    from .state.manifest import run_resumable
    counts, ran, skipped = run_resumable(
        pipe, files, out_dir,
        files_per_partition=int(cfg.get("files_per_partition", 8)),
        output_format=out_cfg.get("format", "parquet"),
        pre_transforms=pre_transforms)
    print(json.dumps({"sink_counts": counts, "partitions_run": ran,
                      "partitions_skipped": skipped}))
    return 0


def cmd_module(args) -> int:
    """Run a reference-style filebeat module fileset over log files: render
    the module's own config, compile its ingest pipeline(s), stream the
    lines through the chain, write routed parquet + manifest."""
    import os
    import re

    from .modules import compile_fileset_spec, fileset_reader_opts
    from .pipeline import Pipeline
    from .sinks.parquet import sink_counts, write_routed
    from .sources.readers import read_log_lines, read_log_records

    module = args.module or \
        os.path.basename(os.path.normpath(args.module_dir))
    vars = {"input": "file"}
    for kv in args.var or []:
        k, _, v = kv.partition("=")
        vars[k] = v
    spec, mvars = compile_fileset_spec(args.module_dir, module,
                                       args.fileset, vars=vars)
    reader = fileset_reader_opts(args.module_dir, args.fileset, vars=vars)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    files: list[str] = []
    for pat in args.input:
        files.extend(sorted(glob.glob(pat)))
    for rx in reader["exclude_files"]:
        files = [f for f in files if not re.search(rx, f)]
    if not files:
        print(f"no input files matched {args.input}", file=sys.stderr)
        return 2
    enc = args.encoding or reader["encoding"]
    if reader["multiline"]:
        # ordering-sensitive join needs per-file line order -> record reader
        ds = read_log_records(files, encoding=enc)
        ds = multiline_pre_transform(reader["multiline"])(ds)
    else:
        ds = read_log_lines(files, encoding=enc)
    # include/exclude_lines filter the multiline-JOINED message
    # (harvester.go:426)
    if reader["include_lines"] or reader["exclude_lines"]:
        spec.insert(0, {"line_filter": {
            "include_lines": reader["include_lines"],
            "exclude_lines": reader["exclude_lines"]}})
    if mvars.get("tags"):
        spec.insert(0, {"add_tags": {"tags": mvars["tags"]}})
    pipe = Pipeline({"processors": spec,
                     "route": {"rules": [],
                               "default": f"{module}.{args.fileset}",
                               "target": "sink"}})
    man = write_routed(pipe.apply(ds), args.output)
    print(json.dumps({"sink_counts": sink_counts(man),
                      "module": module, "fileset": args.fileset}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="beats_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run a YAML pipeline config")
    runp.add_argument("--config", required=True)
    runp.add_argument("--resume", action="store_true",
                      help="(default behavior) skip completed partitions")
    runp.add_argument("--follow", action="store_true",
                      help="continuous mode: rescan inputs every "
                           "--scan-frequency seconds; log inputs tail byte "
                           "offsets (registrar), parquet inputs pick up new "
                           "files via the resume manifest")
    runp.add_argument("--scan-frequency", type=float, default=10.0,
                      metavar="SECONDS",
                      help="poll interval between follow scans "
                           "(filebeat scan_frequency, default 10)")
    runp.add_argument("--max-scans", type=int, default=0, metavar="N",
                      help="stop after N follow scans (0 = run until "
                           "interrupted)")
    modp = sub.add_parser(
        "module", help="run a filebeat module fileset (config/*.yml + "
                       "compiled ingest/*.yml) over log files")
    modp.add_argument("--module-dir", required=True,
                      help="path to the module directory "
                           "(.../filebeat/module/<name>)")
    modp.add_argument("--fileset", required=True)
    modp.add_argument("--module", default=None,
                      help="module name (default: module-dir basename)")
    modp.add_argument("--input", nargs="+", required=True,
                      help="log file globs")
    modp.add_argument("--output", default="/tmp/beats_ray_module_out")
    modp.add_argument("--encoding", default="")
    modp.add_argument("--var", action="append", metavar="K=V",
                      help="fileset var override (repeatable)")
    args = ap.parse_args(argv)
    if args.cmd == "run":
        return cmd_run(args)
    if args.cmd == "module":
        return cmd_module(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
