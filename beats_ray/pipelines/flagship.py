"""Flagship transcript pipeline: parse -> enrich -> route -> aggregate.

This is the north-star DAG (BASELINE.json): over the transcript table
``(conv_id, turn_idx, role, text, tool, ts)``,

1. **parse**   — dissect the log-shaped turns (vectorized RE2 fast path),
                 NDJSON-decode the JSON-shaped turns, normalize the embedded
                 timestamp (strptime cascade);
2. **enrich**  — broadcast tool/role lookup dict held in actor-pool state,
                 byte-exact fingerprint, deterministic ``meta_id``;
3. **route**   — Beats selector (first-non-empty-match-wins) -> ``sink``;
4. **aggregate** — per-sink routed-row counts via the partial-aggregate
                 pattern (manifest rows per block -> tiny groupby), matching
                 the reference's pipeline counters per sink.

The lookup fixture (FIXTURES.md F5) intentionally omits the ``editor`` tool
to exercise tag_on_failure, mirroring dns/config.go:38.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..pipeline import Pipeline
from ..sources.transcripts import transcripts_path

# F5 lookup dict: {tool -> {category, cost_class}}; 'editor' deliberately absent
TOOL_TABLE = {
    "bash": {"category": "shell", "cost_class": "low"},
    "search": {"category": "retrieval", "cost_class": "medium"},
    "browser": {"category": "retrieval", "cost_class": "high"},
    "python": {"category": "code", "cost_class": "medium"},
}
ROLE_TABLE = {
    "user": {"class": "human"},
    "assistant": {"class": "model"},
    "system": {"class": "control"},
    "tool": {"class": "machine"},
}

LOG_TOKENIZER = 'level=%{level} ts=%{ts} caller=%{caller} msg="%{msg}"'

ROUTE_RULES = {
    "rules": [
        {"index": "errors", "when": {"equals": {"log_level": "ERROR"}}},
        {"index": "tool-%{[tool]}", "when": {"equals": {"role": "tool"}}},
        {"index": "%{[j_event]}", "when": {"has_fields": ["j_event"]}},
    ],
    "default": "default",
    "target": "sink",
}


def flagship_spec(tool_table=None, role_table=None) -> dict:
    return {
        "processors": [
            {"dissect": {"tokenizer": LOG_TOKENIZER, "field": "text",
                         "target_prefix": "log", "ignore_failure": True,
                         "when": {"regexp": {"text": "^level="}}}},
            {"decode_json_fields": {"fields": ["text"], "target": "j",
                                    "when": {"regexp": {"text": "^\\{"}}}},
            {"timestamp": {"field": "log_ts", "target_field": "log_time",
                           "layouts": ["%Y-%m-%dT%H:%M:%SZ"],
                           "ignore_missing": True, "ignore_failure": True}},
            {"lookup": {"field": "tool", "table": tool_table or TOOL_TABLE,
                        "target_prefix": "tool",
                        "tag_on_failure": ["_lookup_miss"]}},
            {"fingerprint": {"fields": ["conv_id", "turn_idx"],
                             "target_field": "fp"}},
            {"add_id": {"key_fields": ["conv_id", "turn_idx"], "from_field": "fp"}},
        ],
        "route": ROUTE_RULES,
    }


def flagship_pipeline(broadcast: bool = True) -> Pipeline:
    """Compile the flagship spec.  With ``broadcast=True`` and Ray available,
    the lookup dict ships once via ray.put and is resolved per actor."""
    tool_table = TOOL_TABLE
    if broadcast:
        try:
            import ray
            if ray.is_initialized():
                tool_table = ray.put(TOOL_TABLE)
        except ImportError:
            pass
    return Pipeline(flagship_spec(tool_table=tool_table))


def read_transcripts(sf_dir: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(transcripts_path(sf_dir), columns=columns)


def run_flagship(sf_dir: str, out_dir: str | None = None):
    """Full parse->enrich->route->aggregate; returns per-sink counts as a
    small pyarrow Table (the streamed data lands in out_dir when given)."""
    from ..aggregate import counts_by

    ds = read_transcripts(sf_dir)
    pipe = flagship_pipeline()
    routed = pipe.apply(ds)
    if out_dir:
        from ..sinks.parquet import sink_counts, write_routed
        man = write_routed(routed, out_dir)
        counts = sink_counts(man)
        return pa.table({"sink": list(counts), "n": list(counts.values())})
    # per-sink counts: partial per block + driver union-reduce (the counter
    # pattern; avoids the fixed-cost all-to-all Aggregate op)
    return counts_by(routed, ["sink"])
