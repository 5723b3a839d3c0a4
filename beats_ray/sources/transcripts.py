"""Deterministic multi-turn transcript table generator (FIXTURES.md F1).

The judge's input hint fixes the primary input shape:
``(conv_id:string, turn_idx:int32, role:string, text:large_string,
tool:string, ts:timestamp[us])`` — a Parquet table of multi-turn
conversation / agent transcripts.  The provided ``/root/testdata`` star
schema has no such table, so this module synthesises it deterministically
(seed=42, no wall clock, no external data) at any scale factor; tests,
the correctness oracle and the benchmark all read the same file.

Row-count rule mirrors TPC-H lineitem: ``turns = int(6_000_000 * sf)``.

Text mix (exercises the same paths the reference's golden corpus does —
filebeat module logs with parseable lines, NDJSON lines, and malformed
rows that must raise ``dissect_parsing_error`` / ``error_message``):

- ~62% dissect-able log lines ``level=<LVL> ts=<ISO8601Z> caller=<file>.go:<n> msg="<words>"``
- ~15% NDJSON tool-call records ``{"event":"tool_call","tool":...,"dur_ms":N,"ok":bool}``
- ~15% plain prose
- ~8%  malformed log lines (missing delimiters -> parse failure path)

Conversation sizes are Zipfian (a few hot conversations 10-100x the
median) so per-conv shuffles exercise the salted-repartition path.
Timestamps are monotone within a conversation with ~2% gaps > 30 min to
give sessionization something to split on.  Timestamps are tz-naive UTC
(matches the provided tables and DuckDB's TIMESTAMP for oracle hashing).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")
ROLES = np.array(["user", "assistant", "tool", "system"])
ROLE_W = np.array([0.35, 0.40, 0.15, 0.10])
TOOLS = np.array(["bash", "search", "browser", "editor", "python"])
TOOL_W = np.array([0.30, 0.25, 0.15, 0.15, 0.15])
LEVELS = np.array(["INFO", "WARN", "ERROR", "DEBUG"])
LEVEL_W = np.array([0.55, 0.20, 0.15, 0.10])
FILES = np.array(["server", "harvester", "router", "client", "worker", "registrar"])
WORDS = ("scan read parse emit flush retry ack commit open close seek batch queue "
         "drop route enrich hash merge spill block shard offset cursor lease").split()

DATA_ROOT = "/tmp/beats_ray_data"


def _zipf_conv_sizes(rng: np.random.Generator, n_turns: int) -> np.ndarray:
    """Conversation sizes, Zipfian, summing to exactly n_turns."""
    sizes = []
    total = 0
    while total < n_turns:
        chunk = np.minimum(rng.zipf(1.5, size=4096) * 3, 3000)
        sizes.append(chunk)
        total += int(chunk.sum())
    sizes = np.concatenate(sizes)
    cum = np.cumsum(sizes)
    k = int(np.searchsorted(cum, n_turns))
    sizes = sizes[: k + 1].copy()
    sizes[-1] -= int(cum[k] - n_turns)
    return sizes[sizes > 0]


def generate_transcripts(n_turns: int, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng(seed)
    sizes = _zipf_conv_sizes(rng, n_turns)
    n_conv = len(sizes)
    conv_idx = np.repeat(np.arange(n_conv), sizes)          # conv ordinal per row
    turn_idx = (np.arange(n_turns) -
                np.repeat(np.concatenate(([0], np.cumsum(sizes)[:-1])), sizes)).astype(np.int32)

    conv_id = np.char.add("conv-", np.char.zfill(conv_idx.astype("U8"), 8))

    role = rng.choice(ROLES, size=n_turns, p=ROLE_W)
    role[turn_idx == 0] = "system"                           # every conv opens with system

    tool = np.where(role == "tool",
                    rng.choice(TOOLS, size=n_turns, p=TOOL_W),
                    "")

    # timestamps: per-conv start offset + cumulative per-turn gaps (monotone
    # within conv); ~2% of gaps exceed 30 min to create session breaks
    conv_start = rng.integers(0, 90 * 86400, size=n_conv)    # seconds into 90 days
    gaps = rng.integers(5, 120, size=n_turns).astype(np.int64)
    long_gap = rng.random(n_turns) < 0.02
    gaps[long_gap] = rng.integers(1900, 7200, size=int(long_gap.sum()))
    gaps[turn_idx == 0] = 0
    # cumulative sum of gaps within each conversation
    g = np.cumsum(gaps)
    conv_first_row = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    g = g - np.repeat(g[conv_first_row], sizes)
    ts_sec = np.repeat(conv_start, sizes) + g
    ts = BASE_EPOCH + (ts_sec * 1_000_000).astype("timedelta64[us]")

    # text kinds
    kind = rng.choice(4, size=n_turns, p=[0.62, 0.15, 0.15, 0.08])
    # pre-built phrase pool (vectorized choice instead of per-row word join)
    phrases = np.array([" ".join(rng.choice(WORDS, size=int(rng.integers(3, 9))))
                        for _ in range(512)])
    level = rng.choice(LEVELS, size=n_turns, p=LEVEL_W)
    caller_file = rng.choice(FILES, size=n_turns)
    caller_line = rng.integers(10, 999, size=n_turns).astype("U4")
    msg = rng.choice(phrases, size=n_turns)
    dur = rng.integers(1, 5000, size=n_turns).astype("U5")
    ok = np.where(rng.random(n_turns) < 0.9, "true", "false")

    # vectorized ISO rendering (identical strings to strftime %Y-%m-%dT%H:%M:%SZ,
    # ~20x faster at sf1+)
    iso = np.char.add(np.datetime_as_string(ts.astype("datetime64[s]"), unit="s"), "Z")

    logline = np.array(["level=", "", " ts=", "", " caller=", "", ".go:", "", ' msg="', "", '"'],
                       dtype=object)
    text = np.empty(n_turns, dtype=object)
    m0 = kind == 0
    text[m0] = ("level=" + pd.Series(level[m0]) + " ts=" + pd.Series(iso[m0]) +
                " caller=" + pd.Series(caller_file[m0]) + ".go:" + pd.Series(caller_line[m0]) +
                ' msg="' + pd.Series(msg[m0]) + '"').to_numpy(dtype=object)
    m1 = kind == 1
    nd_tool = rng.choice(TOOLS, size=int(m1.sum()))
    text[m1] = ('{"event": "tool_call", "tool": "' + pd.Series(nd_tool) +
                '", "dur_ms": ' + pd.Series(dur[m1]) + ', "ok": ' + pd.Series(ok[m1]) +
                '}').to_numpy(dtype=object)
    m2 = kind == 2
    text[m2] = msg[m2]
    m3 = kind == 3
    text[m3] = ("level=" + pd.Series(level[m3]) + " oops truncated " +
                pd.Series(msg[m3])).to_numpy(dtype=object)
    del logline

    order = rng.permutation(n_turns)                         # shuffled on disk (F1)
    tbl = pa.table({
        "conv_id": pa.array(conv_id[order], pa.string()),
        "turn_idx": pa.array(turn_idx[order], pa.int32()),
        "role": pa.array(role[order], pa.string()),
        "text": pa.array(text[order], pa.large_string()),
        "tool": pa.array(tool[order], pa.string()),
        "ts": pa.array(ts[order], pa.timestamp("us")),
    })
    return tbl


def sf_label(sf_dir_or_sf) -> str:
    """'/root/testdata/sf0.01' -> 'sf0.01'; 0.01 -> 'sf0.01'."""
    if isinstance(sf_dir_or_sf, (int, float)):
        return f"sf{sf_dir_or_sf:g}"
    m = re.search(r"(sf[0-9.]*[0-9])", str(sf_dir_or_sf))
    if not m:
        raise ValueError(f"cannot parse scale factor from {sf_dir_or_sf!r}")
    return m.group(1)


def n_turns_for(label: str) -> int:
    sf = float(label[2:])
    return max(1000, int(6_000_000 * sf))


def transcripts_path(sf_dir_or_sf, num_files: int = 64) -> str:
    """Path of the deterministic transcript parquet for a scale, generating
    it on first use (atomic: write tmp dir, rename).  Multiple part files so
    Ray gets read parallelism at bench scale."""
    label = sf_label(sf_dir_or_sf)
    out = os.path.join(DATA_ROOT, label, "transcripts")
    if os.path.isdir(out) and os.listdir(out):
        return out
    tbl = generate_transcripts(n_turns_for(label))
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    n = len(tbl)
    files = max(1, min(num_files, n // 1000))
    step = (n + files - 1) // files
    for i in range(files):
        pq.write_table(tbl.slice(i * step, step), os.path.join(tmp, f"part-{i:04d}.parquet"),
                       row_group_size=128 * 1024)
    try:
        os.rename(tmp, out)
    except OSError:
        pass  # concurrent generator won the race; tmp left behind is harmless
    return out
