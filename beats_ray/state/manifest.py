"""Per-partition lineage + metrics manifest -> resume-from-checkpoint.

Reference semantics being replicated (SURVEY.md §3.1 step 6, §4): Beats acks
flow to the registrar which checkpoints file offsets
(filebeat/registrar/registrar.go:131-212; statestore/store.go:56-140) so a
restart resumes where it left off, at-least-once.  The batch analogue
(FIXTURES.md F6): the input is a set of shards (Parquet files / key ranges);
a **partition manifest row** is written only AFTER a partition's sink writes
complete (ack-gated), recording lineage (input files, row counts per stage,
per-sink counts, output files).  Resume = anti-join: process only input
partitions absent from the manifest.  Output files are content-deterministic
(sinks/parquet.py), so re-running a half-finished partition overwrites the
same files — idempotent => effectively exactly-once per partition.

Metrics recorded per partition mirror the reference's pipeline counters
(events.total/filtered/published; monitoring.go:73-113).
"""

from __future__ import annotations

import json
import os
import time


class RunManifest:
    """JSONL manifest: one row per completed partition."""

    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "partitions.jsonl")

    def completed(self) -> dict[str, dict]:
        done = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        row = json.loads(line)
                    except ValueError:
                        # torn trailing record from a crash mid-append: the
                        # partition is simply not committed — resume must
                        # reprocess it, not die here (this is exactly the
                        # crash scenario the manifest exists for)
                        continue
                    done[row["partition_id"]] = row
        return done

    def commit(self, partition_id: str, input_files: list[str],
               metrics: dict, sink_counts: dict[str, int],
               output_files: list[str]):
        row = {
            "partition_id": partition_id,
            "input_files": input_files,
            "metrics": metrics,
            "sink_counts": sink_counts,
            "output_files": output_files,
            "committed_unix": time.time(),
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        return row


def plan_partitions(input_files: list[str], files_per_partition: int = 8) -> list[tuple[str, list[str]]]:
    """Deterministic partitioning of the input file list.  At 100 TB scale a
    partition is O(100) files so the driver loop is coarse; each partition
    run saturates the cluster internally."""
    parts = []
    files = sorted(input_files)
    for i in range(0, len(files), files_per_partition):
        chunk = files[i:i + files_per_partition]
        parts.append((f"p{i // files_per_partition:05d}", chunk))
    return parts


def run_resumable(pipeline, input_files: list[str], out_dir: str,
                  files_per_partition: int = 8, sink_col: str = "sink",
                  output_format: str = "parquet", pre_transforms=None):
    """Run `pipeline` over the inputs with per-partition checkpointing.

    Returns (total_sink_counts, n_partitions_run, n_partitions_skipped).
    Partitions already in the manifest are skipped (resume); each partition's
    manifest row is committed only after its sink writes finish.
    """
    import ray.data as rd

    from ..sinks.parquet import write_routed
    from ..sinks.ndjson import write_ndjson_routed
    write = write_routed if output_format == "parquet" else write_ndjson_routed

    manifest = RunManifest(out_dir)
    done = manifest.completed()
    total: dict[str, int] = {}
    for row in done.values():
        for s, n in row["sink_counts"].items():
            total[s] = total.get(s, 0) + n
    ran = skipped = 0
    for pid, files in plan_partitions(input_files, files_per_partition):
        if pid in done:
            # a committed partition may have been PARTIAL when it ran (the
            # tail chunk) and the input has since GROWN into it — skipping
            # on pid alone would silently drop the appended files.  Process
            # only the never-consumed delta under a derived tag so the
            # prior partition's outputs stay byte-identical.
            consumed: set[str] = set()
            n_derived = 0
            for did, row in done.items():
                if did == pid or did.startswith(pid + ".d"):
                    consumed.update(row.get("input_files") or [])
                    if did != pid:
                        n_derived += 1
            new_files = [f for f in files if f not in consumed]
            if not new_files:
                skipped += 1
                continue
            if not consumed.issubset(files):
                raise ValueError(
                    f"partition {pid}: committed inputs are no longer part "
                    f"of the chunk (files removed/reordered, not appended). "
                    f"Resume supports append-only input growth; clear "
                    f"{out_dir} to reprocess.")
            pid = f"{pid}.d{n_derived + 1}"
            files = new_files
        ds = rd.read_parquet(files)
        # input row count from parquet footer metadata — the old ds.count()
        # forced a full extra pass over every partition (2x read
        # amplification on a 100 TB job)
        import pyarrow.parquet as _pq
        n_in = sum(_pq.ParquetFile(f).metadata.num_rows for f in files)
        for tr in (pre_transforms or []):
            ds = tr(ds)
        out = pipeline.apply(ds)
        man = write(out, out_dir, sink_col=sink_col, partition_tag=pid)
        man_rows = man.take_all()
        counts: dict[str, int] = {}
        paths = []
        for r in man_rows:
            counts[r["sink"]] = counts.get(r["sink"], 0) + r["rows"]
            paths.append(r["path"])
        n_out = sum(counts.values())
        metrics = {"events_total": n_in, "events_published": n_out,
                   "events_filtered": n_in - n_out}
        manifest.commit(pid, files, metrics, counts, sorted(set(paths)))
        for s, n in counts.items():
            total[s] = total.get(s, 0) + n
        ran += 1
    return total, ran, skipped
