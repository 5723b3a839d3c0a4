"""Oracle-checked query catalogue — one entry per operator/pipeline.

Each ``q_*`` function takes ``sf_dir`` and returns a ray.data.Dataset /
pyarrow.Table; ``ORACLE_SQL`` holds the DuckDB-equivalent SQL the driver runs
side-by-side (CORRECTNESS gate).  Column names and types match the SQL
aliases exactly (driver hashes after sorting columns by name).

Numeric determinism: float SUMs are order-dependent under parallel partial
aggregation, so money-style aggregates are computed in integer cents
(``round(x*100) -> int64``) on both sides — exact regardless of reduction
order.  Cosine similarities are computed in float64 and rounded to 6 digits
on both sides.

Transcript queries read the deterministic generated table (same parquet
files referenced by the oracle SQL via read_parquet()).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..aggregate import counts_by, distributed_topk, small_groupby
from ..pipeline import Pipeline
from ..sources.transcripts import transcripts_path
from .flagship import LOG_TOKENIZER, ROUTE_RULES, TOOL_TABLE, flagship_spec


def _rd():
    import ray.data as rd
    return rd


def _read(path, split=False, **kw):
    """read_parquet with schema metadata stripped AT THE READ: the testdata
    files carry b'pandas' schema metadata, which makes pa.Schema unhashable
    and defeats Ray's schema dedup (the 'Failed to hash the schemas'
    warnings).  Passing an explicit metadata-free schema costs zero extra
    operators (an earlier strip-map doubled block traffic through the
    object store).  Directory inputs (generated transcripts) are written
    metadata-free already."""
    if "schema" not in kw and isinstance(path, str) and path.endswith(".parquet"):
        import pyarrow.parquet as pq
        sch = pq.read_schema(path)
        if sch.metadata:
            sch = sch.remove_metadata()
            cols = kw.get("columns")
            if cols:
                sch = pa.schema([sch.field(c) for c in cols])
            kw["schema"] = sch
    if split and "override_num_blocks" not in kw and \
            isinstance(path, str) and path.endswith(".parquet") and \
            os.path.isfile(path) and os.path.getsize(path) < (512 << 20):
        # A SMALL single-file input yields one block, which serializes any
        # CPU-heavy downstream map (the minhash signature pass ran on one
        # core at sf0.1).  Split it so per-doc compute parallelizes.  At
        # web scale inputs are sharded/multi-row-group and Ray's own block
        # planning is already parallel — the override would only hurt, so
        # it is gated to the small-file case.
        import multiprocessing
        kw["override_num_blocks"] = min(64, max(8, multiprocessing.cpu_count()))
    return _rd().read_parquet(path, **kw)


def _cents(col):
    """round(x*100) -> int64 with DuckDB's tie-break (half away from zero),
    so Ray and oracle agree bit-for-bit on boundary values."""
    return pc.cast(pc.round(pc.multiply(col, 100.0),
                            round_mode="half_towards_infinity"), pa.int64())



def _tpath(sf_dir: str) -> str:
    return transcripts_path(sf_dir)


def _tglob(sf_dir: str) -> str:
    return os.path.join(_tpath(sf_dir), "*.parquet")


# ---------------------------------------------------------------- transcripts

def q_transcripts_dissect(sf_dir: str):
    """Vectorized dissect of log-shaped turns + timestamp normalization;
    returns only successfully parsed rows (failed rows carry
    dissect_parsing_error flags and are exercised by q_transcripts_parse_errors)."""
    spec = {
        "processors": [
            {"dissect": {"tokenizer": LOG_TOKENIZER, "field": "text",
                         "target_prefix": "log", "ignore_failure": True,
                         "when": {"regexp": {"text": "^level="}}}},
            {"timestamp": {"field": "log_ts", "target_field": "log_time",
                           "layouts": ["%Y-%m-%dT%H:%M:%SZ"],
                           "ignore_missing": True, "ignore_failure": True}},
        ],
    }
    pipe = Pipeline(spec)
    ds = _read(_tpath(sf_dir))
    out = pipe.apply(ds)
    out = out.map_batches(
        lambda t: t.filter(pc.is_valid(t["log_time"]))
                   .select(["conv_id", "turn_idx", "log_level", "log_caller",
                            "log_msg", "log_time"])
                   .rename_columns(["conv_id", "turn_idx", "level", "caller",
                                    "msg", "log_time"])
                   .cast(pa.schema([("conv_id", pa.string()),
                                    ("turn_idx", pa.int32()),
                                    ("level", pa.string()),
                                    ("caller", pa.string()),
                                    ("msg", pa.string()),
                                    ("log_time", pa.timestamp("us"))])),
        batch_format="pyarrow")
    return out


def q_transcripts_parse_errors(sf_dir: str):
    """Rows that look log-shaped but fail dissect -> dissect_parsing_error
    flag; per-role counts of failures."""
    from ray.data.aggregate import Sum
    spec = {"processors": [
        {"dissect": {"tokenizer": LOG_TOKENIZER, "field": "text",
                     "target_prefix": "log", "ignore_failure": True,
                     "when": {"regexp": {"text": "^level="}}}},
    ]}
    pipe = Pipeline(spec)
    ds = _read(_tpath(sf_dir), columns=["conv_id", "turn_idx", "role", "text"])
    out = pipe.apply(ds)

    def partial(t: pa.Table) -> pa.Table:
        flags = t["log_flags"] if "log_flags" in t.column_names \
            else pa.nulls(len(t), pa.list_(pa.string()))
        has_err = pc.fill_null(pc.greater(pc.list_value_length(flags), 0), False)
        f = t.filter(has_err)
        return f.group_by("role").aggregate([([], "count_all")]) \
                .rename_columns(["role", "n_part"])

    return small_groupby(out, ["role"], partial, {"n_part": "sum"},
                         {"n_part": "n_failed"})


def q_transcripts_route_counts(sf_dir: str):
    """Full parse -> route -> per-sink aggregate counts (the reference's
    per-sink pipeline counter expectation)."""
    pipe = Pipeline(flagship_spec())
    ds = _read(_tpath(sf_dir))
    routed = pipe.apply(ds)
    return counts_by(routed, ["sink"])


def q_transcripts_enrich(sf_dir: str):
    """Broadcast-dict tool lookup enrich -> per-(tool,category,cost) counts."""
    from ray.data.aggregate import Sum
    spec = {"processors": [
        {"lookup": {"field": "tool", "table": TOOL_TABLE, "target_prefix": "tool"}},
    ]}
    pipe = Pipeline(spec)
    ds = _read(_tpath(sf_dir), columns=["tool"])
    out = pipe.apply(ds)

    def partial(t: pa.Table) -> pa.Table:
        t = pa.table({
            "tool": t["tool"],
            "category": pc.fill_null(t["tool_category"], ""),
            "cost_class": pc.fill_null(t["tool_cost_class"], ""),
        })
        return t.group_by(["tool", "category", "cost_class"]) \
                .aggregate([([], "count_all")]) \
                .rename_columns(["tool", "category", "cost_class", "n_part"])

    return small_groupby(out, ["tool", "category", "cost_class"], partial,
                         {"n_part": "sum"}, {"n_part": "n"})


def q_transcripts_fingerprint(sf_dir: str):
    """Byte-exact |k|v| fingerprint (sha256/hex) per turn."""
    spec = {"processors": [
        {"fingerprint": {"fields": ["conv_id", "turn_idx"], "target_field": "fp"}},
    ]}
    pipe = Pipeline(spec)
    ds = _read(_tpath(sf_dir), columns=["conv_id", "turn_idx"])
    return pipe.apply(ds)


def q_transcripts_sessionize(sf_dir: str):
    """Multiline-analogue sessionization: per conversation, count sessions
    split by >30 min gaps in turn order (groupby(conv).map_groups fold).
    Three measured strategies exist (PERFORMANCE.md): direct map_groups,
    salted turn-range segments (skew-safe, fastest at sf0.1), sort-based
    block partials; all share this oracle."""
    from ..functions.sessionize import sessionize
    ds = _read(_tpath(sf_dir), columns=["conv_id", "turn_idx", "ts"])
    # row-per-conversation output is proportional to input: return the
    # Dataset (stream to the consumer) instead of driver-materializing
    return sessionize(ds)


# ---------------------------------------------------------------- events

def q_events_route(sf_dir: str):
    """decode_json_fields on props + selector routing + per-sink counts and
    integer-cents value sums (exact under any reduction order)."""
    from ray.data.aggregate import Sum
    spec = {
        "processors": [
            {"decode_json_fields": {"fields": ["props"], "target": "p"}},
        ],
        "route": {"rules": [
            {"index": "errors", "when": {"equals": {"event_type": "error"}}},
            {"index": "billing", "when": {"or": [
                {"equals": {"event_type": "purchase"}},
                {"equals": {"event_type": "signup"}}]}},
        ], "default": "activity", "target": "sink"},
    }
    pipe = Pipeline(spec)
    ds = _read(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_type", "value", "props"])
    out = pipe.apply(ds)

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"])
        k = pc.cast(t["p_k"], pa.int64())
        t2 = pa.table({"sink": t["sink"], "cents": cents, "k": k})
        return t2.group_by("sink").aggregate([("cents", "sum"), ("k", "sum"),
                                              ([], "count_all")]) \
                 .rename_columns(["sink", "cents_part", "k_part", "n_part"])

    return small_groupby(out, ["sink"], partial,
                         {"n_part": "sum", "cents_part": "sum", "k_part": "sum"},
                         {"n_part": "n", "cents_part": "value_cents", "k_part": "sum_k"})


def q_events_hourly(sf_dir: str):
    """Tumbling 1h window counts + cents sums per event_type (streaming-shaped
    workload expressed as partial agg + small groupby; ray_guide windows)."""
    from ray.data.aggregate import Sum
    ds = _read(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        cents = _cents(t["value"])
        t2 = pa.table({"hour": hour, "event_type": t["event_type"], "cents": cents})
        return t2.group_by(["hour", "event_type"]) \
                 .aggregate([("cents", "sum"), ([], "count_all")]) \
                 .rename_columns(["hour", "event_type", "cents_part", "n_part"])

    out = small_groupby(ds, ["hour", "event_type"], partial,
                        {"n_part": "sum", "cents_part": "sum"},
                        {"n_part": "n", "cents_part": "value_cents"})
    idx = out.column_names.index("hour")
    return out.set_column(idx, "hour", pc.cast(out["hour"], pa.timestamp("us")))


def q_events_sessionize(sf_dir: str):
    """Per-user session count (30 min inactivity gap) — routed through the
    density-based strategy selector (sessionize_auto): high key density
    picks the sort-based path (no per-key Python), low density the salted
    time-window path (skew-safe).  Same oracle as the direct fold."""
    from ..functions.sessionize import sessionize_auto
    ds = _read(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return sessionize_auto(ds, key="user_id", order=None, ts="ts")


# ---------------------------------------------------------------- tpch-ish

def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped pricing summary; money in integer cents."""
    from ray.data.aggregate import Sum
    ds = _read(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=["l_returnflag", "l_linestatus", "l_quantity",
                                     "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"],
                                   pa.scalar(pd.Timestamp("1998-09-02"))))
        qty = pc.cast(pc.round(t["l_quantity"], round_mode="half_towards_infinity"), pa.int64())
        base = _cents(t["l_extendedprice"])
        disc = _cents(pc.multiply(t["l_extendedprice"],
                             pc.subtract(pa.scalar(1.0), t["l_discount"])))
        t2 = pa.table({"l_returnflag": t["l_returnflag"],
                       "l_linestatus": t["l_linestatus"],
                       "qty": qty, "base": base, "disc": disc})
        return t2.group_by(["l_returnflag", "l_linestatus"]) \
                 .aggregate([("qty", "sum"), ("base", "sum"), ("disc", "sum"),
                             ([], "count_all")]) \
                 .rename_columns(["l_returnflag", "l_linestatus",
                                  "qty_p", "base_p", "disc_p", "n_p"])

    return small_groupby(ds, ["l_returnflag", "l_linestatus"], partial,
                         {"qty_p": "sum", "base_p": "sum", "disc_p": "sum", "n_p": "sum"},
                         {"qty_p": "sum_qty", "base_p": "sum_base_cents",
                          "disc_p": "sum_disc_price_cents", "n_p": "count_order"})


def q_orders_join(sf_dir: str):
    """Broadcast hash join: small customer dim (ray.put once) joined to
    orders inside map_batches — no shuffle (ray_guide 'Joins and lookups')."""
    import ray
    from ray.data.aggregate import Sum
    cust = pd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_mktsegment"])
    # broadcast the dim as an Arrow key/value pair: lookups stay in Arrow
    # via pc.index_in + take (no object-dtype pandas map per batch)
    seg_ref = ray.put((pa.array(cust["c_custkey"], pa.int64()),
                       pa.array(cust["c_mktsegment"], pa.string())))
    ds = _read(os.path.join(sf_dir, "orders.parquet"),
                            columns=["o_custkey", "o_totalprice"])

    class SegmentJoin:
        def __init__(self):
            self.keys, self.vals = ray.get(seg_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t["o_custkey"], value_set=self.keys)
            seg = pc.take(self.vals, idx)
            cents = _cents(t["o_totalprice"])
            t2 = pa.table({"mktsegment": seg.combine_chunks()
                           if isinstance(seg, pa.ChunkedArray) else seg,
                           "cents": cents})
            return t2.group_by("mktsegment") \
                     .aggregate([("cents", "sum"), ([], "count_all")]) \
                     .rename_columns(["mktsegment", "cents_p", "n_p"])

    return small_groupby(ds, ["mktsegment"], SegmentJoin(),
                         {"cents_p": "sum", "n_p": "sum"},
                         {"n_p": "n_orders", "cents_p": "total_cents"})


def q_top_users(sf_dir: str):
    """Sort + limit: top 10 users by summed event value (cents)."""
    from ray.data.aggregate import Sum
    ds = _read(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"])
        t2 = pa.table({"user_id": t["user_id"], "cents": cents})
        return t2.group_by("user_id").aggregate([("cents", "sum")]) \
                 .rename_columns(["user_id", "cents_p"])

    # user_id is unbounded-cardinality: per-block combiner -> REAL shuffle
    # (ds.groupby) -> per-block top-k, so the driver only ever sees
    # k x #blocks rows (small_groupby would merge #users x #blocks rows).
    combined = ds.map_batches(partial, batch_format="pyarrow")
    agg = combined.groupby("user_id").aggregate(Sum("cents_p", alias_name="total_cents"))
    return distributed_topk(agg, 10, ["total_cents", "user_id"], [False, True])


# ---------------------------------------------------------------- documents

def q_docs_stats(sf_dir: str):
    """Text analysis: per-language doc counts, token counts (single-space
    split to match SQL string_split), char sums."""
    from ray.data.aggregate import Sum
    ds = _read(os.path.join(sf_dir, "documents.parquet"),
                            columns=["lang", "text", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_value_length(pc.split_pattern(t["text"], " "))
        t2 = pa.table({"lang": t["lang"],
                       "toks": pc.cast(toks, pa.int64()),
                       "chars": t["n_chars"]})
        return t2.group_by("lang") \
                 .aggregate([("toks", "sum"), ("chars", "sum"), ([], "count_all")]) \
                 .rename_columns(["lang", "toks_p", "chars_p", "n_p"])

    return small_groupby(ds, ["lang"], partial,
                         {"n_p": "sum", "toks_p": "sum", "chars_p": "sum"},
                         {"n_p": "n_docs", "toks_p": "sum_tokens", "chars_p": "sum_chars"})


def q_docs_dedup_exact(sf_dir: str):
    """Exact dedup: keep min(doc_id) per identical text (hash-partition +
    per-group first; ray_guide dedup pattern)."""
    from ray.data.aggregate import Min
    ds = _read(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])

    def hash_text(t: pa.Table) -> pa.Table:
        from ..functions.dedup import sha1_key128
        h1, h2 = sha1_key128(t["text"].to_pylist())
        return pa.table({"doc_id": t["doc_id"], "h1": h1, "h2": h2})

    hashed = ds.map_batches(hash_text, batch_format="pyarrow")
    kept = hashed.groupby(["h1", "h2"]) \
                 .aggregate(Min("doc_id", alias_name="doc_id"))
    return kept.select_columns(["doc_id"])


def q_embeddings_knn(sf_dir: str):
    """Brute-force cosine top-k against a broadcast query vector (vec_id=0),
    numpy matmul per batch; float64, rounded to 6 digits."""
    import pyarrow.parquet as pq
    # query vector: vec_id == 0 — predicate-pushdown one-row read (never
    # pull the whole embeddings file onto the driver for one vector)
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "==", 0)])
    qvec = np.asarray(tbl.column("embedding")[0].as_py(), dtype=np.float64)
    ds = _read(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])

    # one query vector (dims floats) — there is no real per-actor state to
    # build (normalizing ~1 KB once is free), so this runs as STATELESS
    # map_batches tasks: the vector ships inside the serialized function,
    # tasks are restart-safe by construction, and no actor pool means no
    # ray#53727 constructor-arg-in-object-store restart fragility.
    q_unit = qvec / np.linalg.norm(qvec)

    def cosine_score(t: pa.Table) -> pa.Table:
        mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (mat @ q_unit) / norms
        return pa.table({"vec_id": t["vec_id"],
                         "cos": pa.array(np.round(cos, 6), pa.float64())})

    scored = ds.map_batches(cosine_score, batch_format="pyarrow")
    return scored.sort(["cos", "vec_id"], descending=[True, False]).limit(10)


# ---------------------------------------------------------------- oracle SQL

def oracle_sql_map(transcripts_glob: str) -> dict[str, str]:
    T = f"read_parquet('{transcripts_glob}')"
    LOG_RE = r'^level=(.*?) ts=(.*?) caller=(.*?) msg="(.*?)"'
    return {
        "transcripts_dissect": f"""
            SELECT conv_id, turn_idx,
                   regexp_extract(text, '{LOG_RE}', 1) AS level,
                   regexp_extract(text, '{LOG_RE}', 3) AS caller,
                   regexp_extract(text, '{LOG_RE}', 4) AS msg,
                   strptime(regexp_extract(text, '{LOG_RE}', 2),
                            '%Y-%m-%dT%H:%M:%SZ') AS log_time
            FROM {T}
            WHERE regexp_matches(text, '{LOG_RE}')
        """,
        "transcripts_parse_errors": f"""
            SELECT role, count(*)::BIGINT AS n_failed
            FROM {T}
            WHERE regexp_matches(text, '^level=')
              AND NOT regexp_matches(text, '{LOG_RE}')
            GROUP BY role
        """,
        "transcripts_route_counts": f"""
            SELECT CASE
                WHEN regexp_extract(text, '{LOG_RE}', 1) = 'ERROR' THEN 'errors'
                WHEN role = 'tool' THEN 'tool-' || tool
                WHEN text LIKE '{{%' THEN coalesce(json_extract_string(text, '$.event'), 'default')
                ELSE 'default' END AS sink,
                count(*)::BIGINT AS n
            FROM {T}
            GROUP BY 1
        """,
        "transcripts_enrich": f"""
            SELECT tool,
                CASE tool WHEN 'bash' THEN 'shell' WHEN 'search' THEN 'retrieval'
                          WHEN 'browser' THEN 'retrieval' WHEN 'python' THEN 'code'
                          ELSE '' END AS category,
                CASE tool WHEN 'bash' THEN 'low' WHEN 'search' THEN 'medium'
                          WHEN 'browser' THEN 'high' WHEN 'python' THEN 'medium'
                          ELSE '' END AS cost_class,
                count(*)::BIGINT AS n
            FROM {T}
            GROUP BY 1, 2, 3
        """,
        "transcripts_fingerprint": f"""
            SELECT conv_id, turn_idx,
                   sha256('|conv_id|' || conv_id || '|turn_idx|' || turn_idx || '|') AS fp
            FROM {T}
        """,
        "transcripts_sessionize": f"""
            WITH d AS (
                SELECT conv_id,
                       ts - lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
                FROM {T})
            SELECT conv_id,
                   (1 + count(*) FILTER (WHERE gap > INTERVAL 1800 SECOND))::BIGINT AS n_sessions
            FROM d GROUP BY conv_id
        """,
        "events_route": """
            SELECT CASE WHEN event_type = 'error' THEN 'errors'
                        WHEN event_type IN ('purchase', 'signup') THEN 'billing'
                        ELSE 'activity' END AS sink,
                   count(*)::BIGINT AS n,
                   sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value_cents,
                   sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k
            FROM events GROUP BY 1
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*)::BIGINT AS n,
                   sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value_cents
            FROM events GROUP BY 1, 2
        """,
        "events_sessionize": """
            WITH d AS (
                SELECT user_id,
                       ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS gap
                FROM events)
            SELECT user_id,
                   (1 + count(*) FILTER (WHERE gap > INTERVAL 1800 SECOND))::BIGINT AS n_sessions
            FROM d GROUP BY user_id
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS sum_qty,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS sum_base_cents,
                   sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))::BIGINT AS sum_disc_price_cents,
                   count(*)::BIGINT AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2
        """,
        "orders_join": """
            SELECT c.c_mktsegment AS mktsegment,
                   count(*)::BIGINT AS n_orders,
                   sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT AS total_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "top_users": """
            SELECT user_id,
                   sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS total_cents
            FROM events GROUP BY user_id
            ORDER BY total_cents DESC, user_id LIMIT 10
        """,
        "docs_stats": """
            SELECT lang, count(*)::BIGINT AS n_docs,
                   sum(length(string_split(text, ' ')))::BIGINT AS sum_tokens,
                   sum(n_chars)::BIGINT AS sum_chars
            FROM documents GROUP BY lang
        """,
        "docs_dedup_exact": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "embeddings_knn": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)), 6) AS cos
            FROM embeddings
            ORDER BY cos DESC, vec_id LIMIT 10
        """,
        **_EXTRA_ORACLES,
        **{k: v.replace("__T__", transcripts_glob) for k, v in _EXTRA_ORACLES2.items()},
        **_EXTRA_ORACLES3,
    }


QUERIES = {
    "transcripts_dissect": q_transcripts_dissect,
    "transcripts_parse_errors": q_transcripts_parse_errors,
    "transcripts_route_counts": q_transcripts_route_counts,
    "transcripts_enrich": q_transcripts_enrich,
    "transcripts_fingerprint": q_transcripts_fingerprint,
    "transcripts_sessionize": q_transcripts_sessionize,
    "events_route": q_events_route,
    "events_hourly": q_events_hourly,
    "events_sessionize": q_events_sessionize,
    "lineitem_pricing": q_lineitem_pricing,
    "orders_join": q_orders_join,
    "top_users": q_top_users,
    "docs_stats": q_docs_stats,
    "docs_dedup_exact": q_docs_dedup_exact,
    "embeddings_knn": q_embeddings_knn,
}


# ------------------------------------------------- training-data operators

def q_docs_quality(sf_dir: str):
    """Quality features per language (avg composite, token stats) —
    vectorized quality_score stage + small_groupby."""
    spec = {"processors": [
        {"quality_score": {"field": "text", "prefix": "q"}},
    ]}
    pipe = Pipeline(spec)
    ds = _read(os.path.join(sf_dir, "documents.parquet"),
                            columns=["lang", "text"])
    out = pipe.apply(ds)

    def partial(t: pa.Table) -> pa.Table:
        # exact integer partials: token counts + stopword hits + char counts
        t2 = pa.table({"lang": t["lang"],
                       "toks": t["q_n_tokens"],
                       "stops": pc.cast(pc.round(pc.multiply(
                           t["q_stopword_ratio"],
                           pc.cast(pc.max_element_wise(t["q_n_tokens"], 1),
                                   pa.float64()))), pa.int64()),
                       "chars": t["q_n_chars"]})
        return t2.group_by("lang").aggregate(
            [("toks", "sum"), ("stops", "sum"), ("chars", "sum"), ([], "count_all")]) \
            .rename_columns(["lang", "toks_p", "stops_p", "chars_p", "n_p"])

    return small_groupby(out, ["lang"], partial,
                         {"toks_p": "sum", "stops_p": "sum", "chars_p": "sum", "n_p": "sum"},
                         {"toks_p": "sum_tokens", "stops_p": "sum_stopwords",
                          "chars_p": "sum_chars", "n_p": "n_docs"})


def q_docs_lang_id(sf_dir: str):
    """Language-ID heuristic vs labeled lang: confusion counts (rows-only
    check; the n-gram scorer is not SQL-expressible)."""
    spec = {"processors": [{"lang_id": {"field": "text", "target": "lang_pred"}}]}
    pipe = Pipeline(spec)
    ds = _read(os.path.join(sf_dir, "documents.parquet"), split=True,
                            columns=["lang", "text"])
    out = pipe.apply(ds)
    return counts_by(out, ["lang", "lang_pred"])


def q_docs_fingerprint_rolling(sf_dir: str):
    """Rolling-hash doc fingerprints + distinct count (rows-only check)."""
    spec = {"processors": [{"doc_fingerprint": {"field": "text", "target": "doc_fp"}}]}
    pipe = Pipeline(spec)
    ds = _read(os.path.join(sf_dir, "documents.parquet"), split=True,
                            columns=["doc_id", "text"])
    out = pipe.apply(ds)
    return out.select_columns(["doc_id", "doc_fp"])


def q_docs_dedup_minhash(sf_dir: str):
    """MinHash+LSH near-dup edges verified by exact n-gram Jaccard >= 0.5,
    oracle-checked against a DuckDB exact-Jaccard pair join.  The default
    32 bands x 4 rows is effectively exact here: every true edge in the
    synthetic corpus has j >= 0.8 (checked in DuckDB), so the per-pair miss
    probability is (1-0.8^4)^32 ~ 5e-8; corpora with pairs NEAR the 0.5
    threshold need n_bands=64 (r=2, miss (1-j^2)^64) at ~3x candidate
    cost."""
    from ..functions.dedup import minhash_lsh_pairs
    ds = _read(os.path.join(sf_dir, "documents.parquet"), split=True,
                            columns=["doc_id", "text"])
    edges = minhash_lsh_pairs(ds, threshold=0.5)
    # pairs only: the 32-bit-truncated shingle hashes can (rarely) perturb
    # the 6th jaccard digit vs the oracle's exact grams; membership is exact
    return edges.select_columns(["a", "b"])


def q_docs_dedup_jaccard(sf_dir: str):
    """EXACT word-3-gram Jaccard near-dup edges at >= 0.8 via
    prefix-filtered AllPairs (no LSH, no approximation) — the
    deterministic member of the dedup family; DuckDB oracle is the same
    exact pair join as minhash's at the 0.8 threshold."""
    from ..functions.dedup import ngram_jaccard_pairs
    ds = _read(os.path.join(sf_dir, "documents.parquet"), split=True,
                            columns=["doc_id", "text"])
    edges = ngram_jaccard_pairs(ds, threshold=0.8)
    # pairs only (same 32-bit-truncation note as q_docs_dedup_minhash)
    return edges.select_columns(["a", "b"])


def q_docs_dedup_simhash(sf_dir: str):
    """SimHash near-dup edges, hamming <= 3 — EXACT despite the banded
    blocking (pigeonhole: 3 bit flips across 4 bands leave >= 1 band
    identical), so it carries a full DuckDB oracle: FNV-1a token hashes
    restated as a recursive CTE, per-bit majority vote, pair join with
    bit_count on the xor."""
    from ..functions.dedup import simhash_dedup
    ds = _read(os.path.join(sf_dir, "documents.parquet"), split=True,
                            columns=["doc_id", "text"])
    return simhash_dedup(ds)


def q_embeddings_near_dup(sf_dir: str):
    """Exact cosine near-dup pairs (cos >= 0.35, a < b) — oracle-checked
    against a DuckDB cross join."""
    from ..functions.dedup import embedding_near_dup
    ds = _read(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])
    return embedding_near_dup(ds, threshold=0.35)


def q_embeddings_knn_ivf(sf_dir: str):
    """IVF-flat approximate top-10 for the vec_id=0 query (rows-only;
    recall vs brute force asserted in unit tests)."""
    import pyarrow.parquet as pq
    from ..functions.similarity import knn_ivf
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "==", 0)])
    qvec = np.asarray(tbl.column("embedding")[0].as_py(), dtype=np.float64)
    ds = _read(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])
    # full probe (n_probe == n_centroids) == exact -> shares the brute-force
    # SQL oracle; the PRUNED scale path (n_probe < n_centroids, reads only
    # probed centroid lists) is exercised in tests/test_scale_paths.py
    import pyarrow.parquet as _pq
    from ..functions.similarity import ivf_cache_dir
    n_total = _pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    cache = ivf_cache_dir("/tmp/beats_ray_data/ivf",
                          [os.path.join(sf_dir, "embeddings.parquet")], 8)
    res = knn_ivf(ds, qvec, k=10, n_centroids=8, n_probe=8, n_total=n_total,
                  cache_dir=cache)
    return res.select(["vec_id", "cos"])


def q_multimodal_pipeline(sf_dir: str):
    """Multimodal plumbing: synth binary payload table -> actor-pool decode
    (stub codec) -> resize -> features; returns a shape/integrity summary
    oracle-checked against the persisted synth parquet (n_pixels must equal
    meta_width x meta_height == octet_length(payload) - 4, resize/features
    output lengths are fixed by config)."""
    from ..functions.multimodal import synth_image_parquet
    ds = _read(synth_image_parquet())
    spec = {"processors": [
        {"image_decode": {"fake": True}},
        {"image_resize": {"width": 8, "height": 8}},
        {"image_features": {}},
    ], "batch_size": 64}  # byte-aware: payloads dominate block size
    pipe = Pipeline(spec)
    out = pipe.apply(ds)

    def summarize(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": t["id"],
            "n_pixels": pc.cast(pc.list_value_length(t["pixels"]), pa.int64()),
            "n_resized": pc.cast(pc.list_value_length(t["pixels_resized"]), pa.int64()),
            "n_features": pc.cast(pc.list_value_length(t["features"]), pa.int64()),
        })
    return out.map_batches(summarize, batch_format="pyarrow")


def q_embeddings_knn_ivf_pruned(sf_dir: str):
    """IVF with REAL pruning (n_probe=2 of 8 centroid lists scanned) —
    rows-only: an approximate result has no SQL oracle; recall vs brute and
    the pruning itself are asserted in tests/test_scale_paths.py.  This is
    the query shape a 100 TB ANN deployment runs; embeddings_knn_ivf keeps
    the full-probe variant for the exact DuckDB oracle."""
    import pyarrow.parquet as pq
    from ..functions.similarity import knn_ivf
    path = os.path.join(sf_dir, "embeddings.parquet")
    tbl = pq.read_table(path, columns=["vec_id", "embedding"],
                        filters=[("vec_id", "==", 0)])
    qvec = np.asarray(tbl.column("embedding")[0].as_py(), dtype=np.float64)
    ds = _read(path, columns=["vec_id", "embedding"])
    n_total = pq.ParquetFile(path).metadata.num_rows
    # persisted content-keyed index (shared with the full-probe query):
    # first call builds + saves, every later call loads — at 100 TB the
    # rebuild-per-query alternative is the difference between ANN and a scan
    from ..functions.similarity import ivf_cache_dir
    cache = ivf_cache_dir("/tmp/beats_ray_data/ivf", [path], 8)
    res = knn_ivf(ds, qvec, k=10, n_centroids=8, n_probe=2, n_total=n_total,
                  cache_dir=cache)
    return res.select(["vec_id", "cos"])


def q_embeddings_near_dup_lsh(sf_dir: str):
    """Random-hyperplane LSH near-dup pairs — the sub-quadratic scale path
    (rows-only: approximate recall; the exact block-pair variant is the
    oracle-checked query).  Bucketed verify + distributed table dedup.

    Recall math (collision prob per table = (1 - theta/pi)^planes): this
    synthetic set's near-dup threshold is unusually LOW (cos 0.35, because
    max pairwise cos ~ 0.51), where hyperplane LSH is inherently weak —
    4 planes x 24 tables gives ~0.975 recall here and ~1.0 for cos >= 0.6.
    Real near-dup deployments (cos >= 0.9: collision 0.71/table) reach
    recall ~1.0 with far fewer tables; at genuinely low thresholds LSH
    cannot beat the exact block-pair path (bucket sizes approach n)."""
    from ..functions.dedup import embedding_near_dup_lsh
    ds = _read(os.path.join(sf_dir, "embeddings.parquet"),
               columns=["vec_id", "embedding"])
    return embedding_near_dup_lsh(ds, threshold=0.35, n_planes=4, n_tables=24)


QUERIES.update({
    "docs_quality": q_docs_quality,
    "embeddings_knn_ivf_pruned": q_embeddings_knn_ivf_pruned,
    "embeddings_near_dup_lsh": q_embeddings_near_dup_lsh,
    "docs_lang_id": q_docs_lang_id,
    "docs_fingerprint_rolling": q_docs_fingerprint_rolling,
    "docs_dedup_minhash": q_docs_dedup_minhash,
    "docs_dedup_jaccard": q_docs_dedup_jaccard,
    "docs_dedup_simhash": q_docs_dedup_simhash,
    "embeddings_near_dup": q_embeddings_near_dup,
    "embeddings_knn_ivf": q_embeddings_knn_ivf,
    "multimodal_pipeline": q_multimodal_pipeline,
})

_EXTRA_ORACLES = {
    "docs_quality": """
        SELECT lang,
               sum(length(string_split(text, ' ')))::BIGINT AS sum_tokens,
               sum(length(list_filter(string_split(lower(text), ' '),
                   x -> x IN ('the','and','of','a','to','in','is','it','that','for'))))::BIGINT
                   AS sum_stopwords,
               sum(length(text))::BIGINT AS sum_chars,
               count(*)::BIGINT AS n_docs
        FROM documents GROUP BY lang
    """,
    "embeddings_near_dup": """
        SELECT a.vec_id AS a, b.vec_id AS b,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 6) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
    """,
}


# --------------------------------------------- flow-control / reader chain

def q_transcripts_multiline(sf_dir: str):
    """Pattern-mode multiline join (negate: lines NOT starting a log record
    attach to the previous record) — grouped per-conversation fold, oracle
    = window-function grouping + string_agg."""
    from ..stages.flow import multiline_join
    ds = _read(_tpath(sf_dir),
                            columns=["conv_id", "turn_idx", "text"])
    out = multiline_join(ds, pattern="^level=", negate=True, match="after",
                         max_lines=10**6)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"conv_id": t["conv_id"],
                         "turn_idx": t["turn_idx"],
                         "text": pc.cast(t["text"], pa.string()),
                         "n_lines": pc.cast(t["n_lines"], pa.int64())})
    # full joined output (row-proportional): stream, never driver-materialize
    return out.map_batches(shape, batch_format="pyarrow")


def q_transcripts_script(sf_dir: str):
    """Python-UDF script processor (vectorized process_batch) — the
    user-extension surface; oracle = plain SQL expressions."""
    src = """
def process_batch(table, params):
    import pyarrow.compute as pc
    table = table.append_column("text_len",
                                pc.cast(pc.utf8_length(table["text"]), pa.int64()))
    return table.append_column("role_upper", pc.utf8_upper(table["role"]))
"""
    spec = {"processors": [{"script": {"source": src}}]}
    pipe = Pipeline(spec)
    ds = _read(_tpath(sf_dir),
                            columns=["conv_id", "turn_idx", "role", "text"])
    out = pipe.apply(ds)
    return out.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "text_len", "role_upper"]),
        batch_format="pyarrow")


def q_transcripts_rate_limit(sf_dir: str):
    """Event-time token-bucket rate limit (6/m per conversation) -> surviving
    turn count per conv (rows-only: sequential fold isn't SQL-expressible)."""
    from ..stages.flow import rate_limit_groups
    ds = _read(_tpath(sf_dir),
                            columns=["conv_id", "turn_idx", "ts"])
    out = rate_limit_groups(ds, "6/m", ["conv_id"])
    return counts_by(out, ["conv_id"], "n_kept")


def q_events_partition(sf_dir: str):
    """Kafka-style FNV-32a hash partitioner -> rows per partition
    (rows-only; FNV isn't a DuckDB builtin)."""
    from ..sources.readers import partition_by_key
    ds = _read(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_type", "user_id"])
    out = partition_by_key(ds, ["user_id"], 16)
    return counts_by(out, ["partition"])


QUERIES.update({
    "transcripts_multiline": q_transcripts_multiline,
    "transcripts_script": q_transcripts_script,
    "transcripts_rate_limit": q_transcripts_rate_limit,
    "events_partition": q_events_partition,
})

_EXTRA_ORACLES2 = {
    "transcripts_multiline": """
        WITH t AS (
            SELECT conv_id, turn_idx, text,
                   CASE WHEN regexp_matches(text, '^level=') THEN 1 ELSE 0 END AS starts
            FROM read_parquet('__T__')),
        g AS (
            SELECT *, SUM(starts) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                        ROWS UNBOUNDED PRECEDING) AS grp
            FROM t)
        SELECT conv_id,
               min(turn_idx) AS turn_idx,
               string_agg(text, chr(10) ORDER BY turn_idx) AS text,
               count(*)::BIGINT AS n_lines
        FROM g GROUP BY conv_id, grp
    """,
    "transcripts_script": """
        SELECT conv_id, turn_idx, length(text)::BIGINT AS text_len,
               upper(role) AS role_upper
        FROM read_parquet('__T__')
    """,
}


def q_transcripts_sessionize_salted(sf_dir: str):
    """Salted-repartition sessionization (hot-conversation skew path):
    turn-range segments -> mergeable partials -> per-conv merge.  Same
    oracle as transcripts_sessionize — the salting must be invisible."""
    from ..functions.sessionize import sessionize_salted
    ds = _read(_tpath(sf_dir), columns=["conv_id", "turn_idx", "ts"])
    return sessionize_salted(ds, segment_turns=256)


def q_events_sessionize_salted(sf_dir: str):
    """Time-window-salted per-user session count (hot-user skew path for
    streams with no ordinal column); same oracle as events_sessionize —
    the salting must be invisible."""
    from ..functions.sessionize import sessionize_salted_time
    ds = _read(os.path.join(sf_dir, "events.parquet"),
               columns=["user_id", "ts"])
    # window sizing: segments per key = span/window; too-small windows
    # explode the (key, salt) group count and per-group Python overhead
    # dominates (measured: 6 h windows -> 180k groups -> 31 s at sf0.1)
    return sessionize_salted_time(ds, key="user_id", ts="ts",
                                  window_s=7 * 86400.0)


QUERIES["events_sessionize_salted"] = q_events_sessionize_salted
_EXTRA_ORACLES["events_sessionize_salted"] = """
    WITH d AS (
        SELECT user_id,
               ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS gap
        FROM events)
    SELECT user_id,
           (1 + count(*) FILTER (WHERE gap > INTERVAL 1800 SECOND))::BIGINT AS n_sessions
    FROM d GROUP BY user_id
"""


QUERIES["transcripts_sessionize_salted"] = q_transcripts_sessionize_salted
_EXTRA_ORACLES2["transcripts_sessionize_salted"] = """
    WITH d AS (
        SELECT conv_id,
               ts - lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
        FROM read_parquet('__T__'))
    SELECT conv_id,
           (1 + count(*) FILTER (WHERE gap > INTERVAL 1800 SECOND))::BIGINT AS n_sessions
    FROM d GROUP BY conv_id
"""


def q_transcripts_correlate(sf_dir: str):
    """Packetbeat-style request/response pairing within each conversation
    (assistant turn immediately followed by a tool turn = one transaction);
    oracle = lead() window function."""
    from ..functions.correlate import correlate_transactions
    ds = _read(_tpath(sf_dir),
                            columns=["conv_id", "turn_idx", "role", "ts"])
    # transaction list is row-proportional: return the Dataset
    return correlate_transactions(ds)


QUERIES["transcripts_correlate"] = q_transcripts_correlate
_EXTRA_ORACLES2["transcripts_correlate"] = """
    WITH w AS (
        SELECT conv_id, turn_idx, role, ts,
               lead(role) OVER win AS next_role,
               lead(turn_idx) OVER win AS next_turn,
               lead(ts) OVER win AS next_ts
        FROM read_parquet('__T__')
        WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx))
    SELECT conv_id,
           turn_idx::BIGINT AS req_turn,
           next_turn::BIGINT AS resp_turn,
           epoch(next_ts - ts)::DOUBLE AS latency_s
    FROM w WHERE role = 'assistant' AND next_role = 'tool'
"""


def q_events_sliding_window(sf_dir: str):
    """Sliding 1h window, 15min hop: per-window counts + cents sums.  Events
    explode x4 inside map_batches (vectorized), then partial agg."""
    from ..functions.windows import sliding_window_explode
    ds = _read(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        e = sliding_window_explode(t, "ts", 3600, 900)
        t2 = pa.table({"window_start": e["window_start"],
                       "cents": _cents(e["value"])})
        return t2.group_by("window_start") \
                 .aggregate([("cents", "sum"), ([], "count_all")]) \
                 .rename_columns(["window_start", "cents_p", "n_p"])

    out = small_groupby(ds, ["window_start"], partial,
                        {"n_p": "sum", "cents_p": "sum"},
                        {"n_p": "n", "cents_p": "value_cents"})
    idx = out.column_names.index("window_start")
    return out.set_column(idx, "window_start",
                          pc.cast(out["window_start"], pa.timestamp("us")))


def q_orders_lineitem_join(sf_dir: str):
    """Both-sides-large bucketed hash join (explicit partitioned join:
    hash-bucket both sides, one shuffle, vectorized merge per bucket) ->
    revenue per order priority."""
    from ..functions.joins import bucketed_join
    orders = _read(os.path.join(sf_dir, "orders.parquet"),
                                columns=["o_orderkey", "o_orderpriority"])
    items = _read(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"])))
        return pa.table({"o_orderkey": t["l_orderkey"], "rev_cents": rev})

    items = items.map_batches(prep, batch_format="pyarrow")
    joined = bucketed_join(orders, items, on="o_orderkey", n_buckets=32)

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("o_orderpriority") \
                .aggregate([("rev_cents", "sum"), ([], "count_all")]) \
                .rename_columns(["o_orderpriority", "rev_p", "n_p"])

    return small_groupby(joined, ["o_orderpriority"], partial,
                         {"rev_p": "sum", "n_p": "sum"},
                         {"rev_p": "revenue_cents", "n_p": "n_items"})


def q_orders_lineitem_join_native(sf_dir: str):
    """Same join via ray.data.Dataset.join (native hash-partitioned join)
    — same oracle; proves parity between the explicit bucketed join and
    Ray's built-in."""
    from ..functions.joins import native_join
    orders = _read(os.path.join(sf_dir, "orders.parquet"),
                                columns=["o_orderkey", "o_orderpriority"])
    items = _read(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"])))
        return pa.table({"o_orderkey": t["l_orderkey"], "rev_cents": rev})

    items = items.map_batches(prep, batch_format="pyarrow")
    joined = native_join(orders, items, on="o_orderkey", num_partitions=16)

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("o_orderpriority") \
                .aggregate([("rev_cents", "sum"), ([], "count_all")]) \
                .rename_columns(["o_orderpriority", "rev_p", "n_p"])

    return small_groupby(joined, ["o_orderpriority"], partial,
                         {"rev_p": "sum", "n_p": "sum"},
                         {"rev_p": "revenue_cents", "n_p": "n_items"})


QUERIES.update({
    "events_sliding_window": q_events_sliding_window,
    "orders_lineitem_join": q_orders_lineitem_join,
    "orders_lineitem_join_native": q_orders_lineitem_join_native,
})

_EXTRA_ORACLES3 = {
    "events_sliding_window": """
        WITH j AS (SELECT unnest([0,1,2,3]) AS j),
        e AS (SELECT to_timestamp((floor(epoch(ts)/900)*900 - j.j*900)::BIGINT)::TIMESTAMP
                     AS window_start, value
              FROM events CROSS JOIN j)
        SELECT window_start,
               count(*)::BIGINT AS n,
               sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value_cents
        FROM e GROUP BY window_start
    """,
    "orders_lineitem_join": """
        SELECT o.o_orderpriority,
               sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100)
                   AS BIGINT))::BIGINT AS revenue_cents,
               count(*)::BIGINT AS n_items
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1
    """,
}
_EXTRA_ORACLES3["orders_lineitem_join_native"] = _EXTRA_ORACLES3["orders_lineitem_join"]


def q_transcripts_dedup_exact(sf_dir: str):
    """Exact dedup of turn texts: survivor = lexicographically-first
    (conv_id, turn_idx) per distinct text -> count distinct texts per role
    (oracle-checked).  Pattern: hash -> groupby -> first."""
    from ray.data.aggregate import Count
    ds = _read(_tpath(sf_dir), columns=["role", "text"])

    def hash_stage(t: pa.Table) -> pa.Table:
        from ..functions.dedup import sha1_key128
        h1, h2 = sha1_key128(t["text"].to_pylist())
        return pa.table({"role": t["role"], "h1": h1, "h2": h2})

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow")
    per_role_text = hashed.groupby(["role", "h1", "h2"]) \
                          .aggregate(Count(alias_name="_n"))
    return counts_by(per_role_text, ["role"], "n_distinct_texts")


def q_docs_dedup_clusters(sf_dir: str):
    """End-to-end near-dup clustering: MinHash+LSH edges -> distributed
    min-label-propagation connected components -> (node, root) membership,
    oracle-checked against a DuckDB recursive-CTE transitive closure over
    the exact-Jaccard edge list (identity with driver union-find is also
    unit-tested)."""
    from ..functions.dedup import connected_components_auto, minhash_lsh_pairs
    ds = _read(os.path.join(sf_dir, "documents.parquet"), split=True,
                            columns=["doc_id", "text"])
    edges_tbl = minhash_lsh_pairs(ds, threshold=0.5)
    edges = _rd().from_arrow(edges_tbl) if isinstance(edges_tbl, pa.Table) \
        else edges_tbl
    # verified edge lists are corpus-tiny: size-adaptive CC (driver
    # union-find below the threshold, min-label propagation above)
    return connected_components_auto(edges, n_buckets=8, max_rounds=8)


QUERIES.update({
    "transcripts_dedup_exact": q_transcripts_dedup_exact,
    "docs_dedup_clusters": q_docs_dedup_clusters,
})
# event-time token bucket (6/min, burst 1) restated as a per-conversation
# recursive fold in event order -- identical step-by-step float64 ops, so
# the FP trajectory matches the pipeline's numpy fold bit-for-bit.
_EXTRA_ORACLES2["transcripts_rate_limit"] = """
    WITH RECURSIVE ord AS (
        SELECT conv_id, epoch_ns(ts) / 1000000000.0 AS tss,
               row_number() OVER (PARTITION BY conv_id ORDER BY ts) AS rn
        FROM read_parquet('__T__')),
    fold AS (
        SELECT conv_id, rn, tss AS last_ts, 0.0 AS tokens, 1::BIGINT AS kept
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.conv_id, o.rn, o.tss,
               CASE WHEN least(1.0, f.tokens + (o.tss - f.last_ts) * 0.1) >= 1.0
                    THEN least(1.0, f.tokens + (o.tss - f.last_ts) * 0.1) - 1.0
                    ELSE least(1.0, f.tokens + (o.tss - f.last_ts) * 0.1) END,
               f.kept + CASE WHEN least(1.0, f.tokens + (o.tss - f.last_ts) * 0.1)
                                  >= 1.0 THEN 1 ELSE 0 END
        FROM fold f JOIN ord o ON o.conv_id = f.conv_id AND o.rn = f.rn + 1)
    SELECT conv_id, max(kept)::BIGINT AS n_kept FROM fold GROUP BY conv_id
"""

_EXTRA_ORACLES2["transcripts_dedup_exact"] = """
    SELECT role, count(DISTINCT text)::BIGINT AS n_distinct_texts
    FROM read_parquet('__T__') GROUP BY role
"""


def q_docs_redact(sf_dir: str):
    """PII redaction (emails/IPs/long numbers) over document text; returns
    redacted text rows (oracle = chained regexp_replace 'g')."""
    spec = {"processors": [{"redact": {"fields": ["text"]}}]}
    pipe = Pipeline(spec)
    ds = _read(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    out = pipe.apply(ds)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "text": pc.cast(t["text"], pa.string())}),
        batch_format="pyarrow")


def q_docs_word_counts(sf_dir: str):
    """Corpus word counts, top 50 by (count desc, word asc) — the canonical
    n-gram/corpus-stats sweep: per-batch partial counts, tiny final merge."""
    ds = _read(os.path.join(sf_dir, "documents.parquet"), split=True,
                            columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t["text"], " "))
        vc = words.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n_part": pc.cast(vc.field("counts"), pa.int64())})

    # vocabulary is unbounded-cardinality: per-block value_counts combiner
    # -> real shuffle -> per-block top-k (driver merges <= 50 x #blocks rows)
    from ray.data.aggregate import Sum
    combined = ds.map_batches(partial, batch_format="pyarrow")
    agg = combined.groupby("word").aggregate(Sum("n_part", alias_name="n"))
    return distributed_topk(agg, 50, ["n", "word"], [False, True])


QUERIES.update({
    "docs_redact": q_docs_redact,
    "docs_word_counts": q_docs_word_counts,
})
_EXTRA_ORACLES["docs_redact"] = r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
             '\b\d{9,}\b', '<NUM>', 'g') AS text
    FROM documents
"""
_EXTRA_ORACLES["docs_word_counts"] = """
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    SELECT word, count(*)::BIGINT AS n FROM w GROUP BY word
    ORDER BY n DESC, word ASC LIMIT 50
"""


def q_events_sample(sf_dir: str):
    """Deterministic modulo sampling (event_id % 10 == 0) -> sampled rows
    (oracle-checked); the hash-method variant is the partitioning-stable
    web-scale default (unit-tested)."""
    spec = {"processors": [
        {"sample": {"field": "event_id", "method": "modulo", "numer": 1, "denom": 10}},
    ]}
    pipe = Pipeline(spec)
    ds = _read(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "event_type", "value"])
    out = pipe.apply(ds)
    return out.map_batches(
        lambda t: pa.table({"event_id": t["event_id"],
                            "event_type": t["event_type"],
                            "value_cents": _cents(t["value"])}),
        batch_format="pyarrow")


def q_docs_stratified_sample(sf_dir: str):
    """Class-balanced subset: first 5 docs per language by doc_id
    (oracle = row_number window)."""
    from ..functions.sampling import stratified_sample
    ds = _read(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "lang"])
    return stratified_sample(ds, "lang", "doc_id", 5)


QUERIES.update({
    "events_sample": q_events_sample,
    "docs_stratified_sample": q_docs_stratified_sample,
})

# FNV-32a restated as a DuckDB recursive CTE over the key string's (ASCII)
# characters -- one fold per distinct user_id, joined back to rows.
_EXTRA_ORACLES["multimodal_pipeline"] = """
    SELECT id,
           (octet_length(payload) - 4)::BIGINT AS n_pixels,
           64::BIGINT AS n_resized,
           18::BIGINT AS n_features
    FROM read_parquet('/tmp/beats_ray_data/multimodal_synth.parquet')
"""

_EXTRA_ORACLES["docs_dedup_simhash"] = r"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, t.i AS tok_idx, ws[t.i] AS tok
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\s+'),
                                 x -> x <> '') AS ws
              FROM documents),
             unnest(range(1, len(ws) + 1)) AS t(i)),
    th AS (
        SELECT doc_id, tok_idx, tok, 0 AS i,
               14695981039346656037::UBIGINT AS h
        FROM toks
        UNION ALL
        SELECT doc_id, tok_idx, tok, i + 1,
               ((xor(h, ord(substr(tok, i + 1, 1))::UBIGINT)::HUGEINT
                 * 1099511628211) % 18446744073709551616)::UBIGINT
        FROM th WHERE i < length(tok)),
    tok_hash AS (
        SELECT doc_id, tok_idx, h FROM th WHERE i = length(tok)),
    bits AS (
        SELECT doc_id, b.b AS bit,
               sum(((h >> b.b) & 1)::BIGINT) AS ones, count(*) AS n
        FROM tok_hash, unnest(range(0, 64)) AS b(b)
        GROUP BY doc_id, b.b),
    sig AS (
        SELECT doc_id,
               sum(CASE WHEN ones * 2 > n
                        THEN (1::UBIGINT << bit) ELSE 0 END)::UBIGINT AS s
        FROM bits GROUP BY doc_id)
    SELECT x.doc_id AS a, y.doc_id AS b,
           bit_count(xor(x.s, y.s))::BIGINT AS hamming
    FROM sig x JOIN sig y ON x.doc_id < y.doc_id
    WHERE bit_count(xor(x.s, y.s)) <= 3
"""

_EXTRA_ORACLES["embeddings_knn_ivf"] = """
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)), 6) AS cos
    FROM embeddings
    ORDER BY cos DESC, vec_id LIMIT 10
"""

_EXTRA_ORACLES["events_partition"] = """
    WITH RECURSIVE ids AS (
        SELECT DISTINCT user_id::VARCHAR AS s FROM events),
    f AS (
        SELECT s, 0 AS i, 2166136261::UBIGINT AS h FROM ids
        UNION ALL
        SELECT s, i + 1,
               ((xor(h, ord(substr(s, i + 1, 1))::UBIGINT) * 16777619)
                % 4294967296)::UBIGINT
        FROM f WHERE i < length(s)),
    fin AS (SELECT s, h FROM f WHERE i = length(s))
    SELECT (fin.h % 16)::INTEGER AS partition, count(*)::BIGINT AS n
    FROM events e JOIN fin ON fin.s = e.user_id::VARCHAR
    GROUP BY 1
"""

# stopword-vote language id: score per language = tokens in its function-word
# set; argmax with first-wins tie-break (en > de > fr > es, dict order).
_EXTRA_ORACLES["docs_lang_id"] = r"""
    WITH d AS (
        SELECT doc_id, lang,
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                           x -> x <> '') AS ws
        FROM documents),
    t AS (SELECT doc_id, unnest(ws) AS w FROM d),
    sc AS (
        SELECT doc_id,
          count(*) FILTER (WHERE w IN ('the','and','of','a','to','in','is','it','that','for')) AS s_en,
          count(*) FILTER (WHERE w IN ('der','die','das','und','ist','ein','eine','zu','mit','von')) AS s_de,
          count(*) FILTER (WHERE w IN ('le','la','les','et','est','un','une','de','pour','dans')) AS s_fr,
          count(*) FILTER (WHERE w IN ('el','la','los','las','y','es','un','una','de','para')) AS s_es
        FROM t GROUP BY doc_id),
    pred AS (
        SELECT d.lang,
            CASE WHEN d.ws IS NULL OR len(d.ws) = 0 THEN NULL
                 WHEN greatest(coalesce(s_en,0), coalesce(s_de,0),
                               coalesce(s_fr,0), coalesce(s_es,0)) = 0 THEN 'und'
                 WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                 WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                 WHEN s_fr >= s_es THEN 'fr'
                 ELSE 'es' END AS lang_pred
        FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id)
    SELECT lang, lang_pred, count(*)::BIGINT AS n
    FROM pred GROUP BY lang, lang_pred
"""

# exact word-3-gram jaccard pairs (the minhash+LSH result at n_bands=64
# matches the exact answer; see q_docs_dedup_minhash).
_MINHASH_EDGE_SQL = r"""
    WITH d AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '') AS w
        FROM documents),
    grams AS (
        SELECT doc_id,
          CASE WHEN len(w) = 0 THEN []::VARCHAR[]
               WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
          END AS gs
        FROM d),
    gset AS (SELECT doc_id, unnest(list_distinct(gs)) AS g FROM grams),
    sizes AS (SELECT doc_id, count(*) AS n FROM gset GROUP BY doc_id),
    inter AS (
        SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        FROM gset x JOIN gset y ON x.g = y.g AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id)
    SELECT inter.a, inter.b
    FROM inter JOIN sizes sa ON sa.doc_id = inter.a
               JOIN sizes sb ON sb.doc_id = inter.b
    WHERE inter.i * 1.0 / (sa.n + sb.n - inter.i) >= 0.5
"""
_EXTRA_ORACLES["docs_dedup_minhash"] = _MINHASH_EDGE_SQL
# same exact pair join at the 0.8 threshold for the prefix-filtered
# AllPairs operator (which is exact BY CONSTRUCTION, not just on this
# corpus — see ngram_jaccard_pairs docstring).
_EXTRA_ORACLES["docs_dedup_jaccard"] = _MINHASH_EDGE_SQL.replace(
    ">= 0.5", ">= 0.8")

# connected components over the exact edge list: recursive transitive
# closure (UNION dedup terminates it), min reachable label per node.
_EXTRA_ORACLES["docs_dedup_clusters"] = f"""
    WITH RECURSIVE edges AS ({_MINHASH_EDGE_SQL}),
    nodes AS (SELECT a AS n FROM edges UNION SELECT b FROM edges),
    sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
    reach AS (
        SELECT n, n AS r FROM nodes
        UNION
        SELECT s.b AS n, reach.r FROM reach JOIN sym s ON s.a = reach.n)
    SELECT n::BIGINT AS node, min(r)::BIGINT AS root FROM reach GROUP BY n
"""

# two-level FNV fold: token hash = FNV-1a over (ASCII) bytes, document
# fingerprint = polynomial roll h = h*prime + tok_hash (mod 2^64); HUGEINT
# intermediates keep the 64x41-bit products exact.
_EXTRA_ORACLES["docs_fingerprint_rolling"] = r"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, t.i AS tok_idx, ws[t.i] AS tok
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\s+'),
                                 x -> x <> '') AS ws
              FROM documents),
             unnest(range(1, len(ws) + 1)) AS t(i)),
    th AS (
        SELECT doc_id, tok_idx, tok, 0 AS i,
               14695981039346656037::UBIGINT AS h
        FROM toks
        UNION ALL
        SELECT doc_id, tok_idx, tok, i + 1,
               ((xor(h, ord(substr(tok, i + 1, 1))::UBIGINT)::HUGEINT
                 * 1099511628211) % 18446744073709551616)::UBIGINT
        FROM th WHERE i < length(tok)),
    tok_hash AS (
        SELECT doc_id, tok_idx, h FROM th WHERE i = length(tok)),
    ntoks AS (SELECT doc_id, max(tok_idx) AS n FROM tok_hash GROUP BY doc_id),
    roll AS (
        SELECT t.doc_id, t.tok_idx,
               ((14695981039346656037::HUGEINT * 1099511628211
                 + t.h) % 18446744073709551616)::UBIGINT AS h
        FROM tok_hash t WHERE t.tok_idx = 1
        UNION ALL
        SELECT t.doc_id, t.tok_idx,
               ((roll.h::HUGEINT * 1099511628211 + t.h)
                % 18446744073709551616)::UBIGINT
        FROM roll JOIN tok_hash t
          ON t.doc_id = roll.doc_id AND t.tok_idx = roll.tok_idx + 1)
    SELECT r.doc_id, r.h AS doc_fp
    FROM roll r JOIN ntoks ON ntoks.doc_id = r.doc_id AND r.tok_idx = ntoks.n
"""

_EXTRA_ORACLES["events_sample"] = """
    SELECT event_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS value_cents
    FROM events WHERE event_id % 10 = 0
"""
_EXTRA_ORACLES["docs_stratified_sample"] = """
    WITH r AS (SELECT doc_id, lang,
                      row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
               FROM documents)
    SELECT doc_id, lang FROM r WHERE rn <= 5
"""


def q_transcripts_routed_rows(sf_dir: str):
    """ROUTED-ROW EQUALITY (north rule): the full per-row sink assignment —
    every (conv_id, turn_idx) with its selected sink — oracle-checked
    against the CASE-expression equivalent of the selector rules."""
    pipe = Pipeline(flagship_spec())
    ds = _read(_tpath(sf_dir))
    routed = pipe.apply(ds)
    return routed.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "sink"]),
        batch_format="pyarrow")


QUERIES["transcripts_routed_rows"] = q_transcripts_routed_rows
_EXTRA_ORACLES2["transcripts_routed_rows"] = """
    SELECT conv_id, turn_idx, CASE
        WHEN regexp_extract(text, '^level=(.*?) ts=(.*?) caller=(.*?) msg="(.*?)"', 1) = 'ERROR'
            THEN 'errors'
        WHEN role = 'tool' THEN 'tool-' || tool
        WHEN text LIKE '{%' THEN coalesce(json_extract_string(text, '$.event'), 'default')
        ELSE 'default' END AS sink
    FROM read_parquet('__T__')
"""


def q_transcripts_grok(sf_dir: str):
    """Grok engine over the log-shaped turns (WORD/TIMESTAMP_ISO8601/DATA
    pattern library -> one vectorized RE2 extract); same oracle shape as the
    dissect query — two parser front-ends, one expected behavior (the
    reference's when_parity_test.go pattern)."""
    spec = {"processors": [
        {"grok": {"field": "text",
                  "pattern": ('level=%{WORD:level} ts=%{TIMESTAMP_ISO8601:tstr} '
                              'caller=%{DATA:caller} msg="%{DATA:msg}"'),
                  "ignore_failure": True}},
    ]}
    pipe = Pipeline(spec)
    ds = _read(_tpath(sf_dir), columns=["conv_id", "turn_idx", "text"])
    out = pipe.apply(ds)
    return out.map_batches(
        lambda t: t.filter(pc.is_valid(t["level"]))
                   .select(["conv_id", "turn_idx", "level", "caller", "msg"])
                   .cast(pa.schema([("conv_id", pa.string()),
                                    ("turn_idx", pa.int32()),
                                    ("level", pa.string()),
                                    ("caller", pa.string()),
                                    ("msg", pa.string())])),
        batch_format="pyarrow")


QUERIES["transcripts_grok"] = q_transcripts_grok
_EXTRA_ORACLES2["transcripts_grok"] = """
    SELECT conv_id, turn_idx,
           regexp_extract(text, '^level=(\\w+) ts=(.*?) caller=(.*?) msg="(.*?)"', 1) AS level,
           regexp_extract(text, '^level=(\\w+) ts=(.*?) caller=(.*?) msg="(.*?)"', 3) AS caller,
           regexp_extract(text, '^level=(\\w+) ts=(.*?) caller=(.*?) msg="(.*?)"', 4) AS msg
    FROM read_parquet('__T__')
    WHERE regexp_matches(text, '^level=(\\w+) ts=(.*?) caller=(.*?) msg="(.*?)"')
"""


def q_docs_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs with doc_id % 20 == 0 act as the
    held-out eval corpus; every other document is scanned for 8-word-gram
    overlap (the GPT-3-style n-gram decontamination rule).  Exact set
    membership — full DuckDB oracle restates the gram construction with
    list slicing + a distinct join."""
    from ..functions.decontam import ngram_contamination
    ds = _read(os.path.join(sf_dir, "documents.parquet"), split=True,
               columns=["doc_id", "text"])
    # pyarrow.compute has no modulo kernel; numpy over the int64 column is
    # zero-copy and stays vectorized
    bench = ds.map_batches(
        lambda b: b.filter(b.column("doc_id").to_numpy() % 20 == 0),
        batch_format="pyarrow")
    train = ds.map_batches(
        lambda b: b.filter(b.column("doc_id").to_numpy() % 20 != 0),
        batch_format="pyarrow")
    return ngram_contamination(train, bench, n=8)


QUERIES["docs_decontaminate"] = q_docs_decontaminate
_EXTRA_ORACLES3["docs_decontaminate"] = """
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\W+'),
                         x -> x <> '') AS w
      FROM documents
    ), pos AS (
      SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
      FROM tok
    ), bgrams AS (
      SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS g
      FROM pos WHERE doc_id % 20 = 0
    ), dgrams AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS g
      FROM pos WHERE doc_id % 20 <> 0
    )
    SELECT d.doc_id::BIGINT AS doc_id, count(*)::BIGINT AS contaminated
    FROM dgrams d JOIN bgrams b USING (g)
    GROUP BY d.doc_id ORDER BY doc_id
"""


# ------------------------------------------------------- compiled ES ingest

# Pipeline.apply kwargs shared by the four compiled-ingest queries.
# Task granularity: Ray bundles input blocks up to batch_size rows per actor
# task, so the default 32768 collapses a 600k-row input to ~4 tasks and
# strands the pool — 2048 keeps tasks at input-block granularity (measured
# on the zeek-js chain: 16.6 s -> 5.9 s at sf0.1/32, PERFORMANCE.md round-5
# closing notes).  eager_pool skips the actor-autoscaler ramp because these
# queries' inputs are always data-scale, never fixture-sized.
_COMPILED_APPLY_KW = {"batch_size": 2048, "eager_pool": True}

_APACHE_PIPELINE_YML = ("/root/reference/filebeat/module/apache/access/"
                        "ingest/pipeline.yml")

# hand-ported painless bodies (positional, like the module golden tests):
# 1. the tls version splitter (apache pipeline.yml script #1)
# 2. None — the recursive null-sweep (script #2): the columnar model never
#    materializes null map members, so it compiles to nothing
_APACHE_TLS_SCRIPT = {"script": {"source": (
    "def process(event, params):\n"
    "    p = event.get('apache_access_ssl_protocol')\n"
    "    if p is None:\n"
    "        return event\n"
    "    parts = p.lower().split('v')\n"
    "    if len(parts) != 2:\n"
    "        return event\n"
    "    event['tls_version'] = parts[1] if '.' in parts[1] \\\n"
    "        else parts[1] + '.0'\n"
    "    event['tls_version_protocol'] = parts[0]\n"
    "    return event\n")}}


def q_events_ingest_apache(sf_dir: str):
    """COMPILED-INGEST pipeline at sf scale (round-4 verdict item 2): the
    reference's own apache/access ingest pipeline
    (filebeat/module/apache/access/ingest/pipeline.yml) is compiled onto the
    registered stage set by ``beats_ray.ingest.compile_ingest`` and run over
    Apache combined-log lines rendered DETERMINISTICALLY from the events
    table — so the compiler's emitted chain (multi-pattern grok, uri_parts,
    Java-layout date parse, painless outcome conditions, mustache set
    templates) faces the DuckDB oracle and the bench at data scale, not just
    pytest fixture sizes.  The oracle recomputes the expected parse results
    straight from the base columns.  geoip is cluster-side (compiler skips
    it); user_agent RUNS over every row for bench realism but its output is
    not aggregated (uap parsing is not SQL-expressible)."""
    from ..ingest import compile_ingest, load_pipeline_yml
    from ..pipeline import Pipeline

    ds = _read(os.path.join(sf_dir, "events.parquet"),
               columns=["event_id", "ts", "user_id", "event_type"])

    def render(df: pd.DataFrame) -> pd.DataFrame:
        u, e = df["user_id"], df["event_id"]
        ip = ("10." + ((u // 65536) % 256).astype(str) + "."
              + ((u // 256) % 256).astype(str) + "." + (u % 256).astype(str))
        method = pd.Series(
            np.where(df["event_type"].isin(["purchase", "signup"]),
                     "POST", "GET"), index=df.index)
        status = pd.Series(
            np.where(e % 20 == 0, 500, np.where(e % 20 <= 2, 404, 200)),
            index=df.index)
        path = "/api/" + df["event_type"] + "/" + (e % 7).astype(str)
        when = df["ts"].dt.strftime("%d/%b/%Y:%H:%M:%S") + " +0000"
        msg = (ip + " - user" + u.astype(str) + " [" + when + "] \""
               + method + " " + path + " HTTP/1.1\" " + status.astype(str)
               + " " + (e % 4096).astype(str)
               + " \"-\" \"Mozilla/5.0 (X11; Linux x86_64) "
               "AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0 "
               "Safari/537.36\"")
        # ts doubles as the pre-parse @timestamp the harvester would stamp
        # (arrow table out: pandas schema metadata is unhashable and
        # defeats Ray's block-schema dedup)
        return pa.Table.from_pandas(
            pd.DataFrame({"message": msg, "ts": df["ts"]}),
            preserve_index=False).replace_schema_metadata(None)

    spec = compile_ingest(load_pipeline_yml(_APACHE_PIPELINE_YML),
                          scripts=[_APACHE_TLS_SCRIPT, None])
    parsed = Pipeline(spec).apply(
        ds.map_batches(render, batch_format="pandas"), **_COMPILED_APPLY_KW)

    keys = ["event_outcome", "http_request_method",
            "http_response_status_code", "url_path"]

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + ["http_response_body_bytes", "ts",
                              "source_ip"]).to_pandas()
        g = df.groupby(keys, as_index=False, dropna=False).agg(
            n=("source_ip", "size"),
            sum_bytes=("http_response_body_bytes", "sum"),
            max_ts=("ts", "max"),
            min_ip=("source_ip", "min"))
        g["n"] = g["n"].astype("int64")
        g["sum_bytes"] = g["sum_bytes"].astype("int64")
        # strip pandas schema metadata: its dicts defeat Ray's
        # block-schema dedup (unhashable-schema warning)
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    return small_groupby(parsed, keys, partial,
                         {"n": "sum", "sum_bytes": "sum",
                          "max_ts": "max", "min_ip": "min"})


QUERIES["events_ingest_apache"] = q_events_ingest_apache
_EXTRA_ORACLES["events_ingest_apache"] = """
    WITH e AS (
      SELECT ts,
             CASE WHEN event_id % 20 = 0 THEN 500
                  WHEN event_id % 20 <= 2 THEN 404 ELSE 200 END AS status,
             event_id % 4096 AS nbytes,
             CASE WHEN event_type IN ('purchase', 'signup') THEN 'POST'
                  ELSE 'GET' END AS method,
             '/api/' || event_type || '/' || CAST(event_id % 7 AS VARCHAR) AS path,
             '10.' || CAST((user_id // 65536) % 256 AS VARCHAR) || '.'
                   || CAST((user_id // 256) % 256 AS VARCHAR) || '.'
                   || CAST(user_id % 256 AS VARCHAR) AS ip
      FROM events)
    SELECT CASE WHEN status < 400 THEN 'success' ELSE 'failure' END AS event_outcome,
           method AS http_request_method,
           status::BIGINT AS http_response_status_code,
           path AS url_path,
           count(*)::BIGINT AS n,
           sum(nbytes)::BIGINT AS sum_bytes,
           max(date_trunc('second', ts)) AS max_ts,
           min(ip) AS min_ip
    FROM e GROUP BY 1, 2, 3, 4
"""


# ------------------------------------------- compiled ES ingest: checkpoint

_CP_PIPELINE_YML = ("/root/reference/x-pack/filebeat/module/checkpoint/"
                    "firewall/ingest/pipeline.yml")

# vectorized ports of the checkpoint pipeline's painless (positional):
# #1 iana_number -> network.transport else-if chain — the number->name
#    table is parsed from the module's own painless source at compile time
#    and applied as one pc.index_in/take; #2/#3 (source+destination
#    byte/packet sums) compile to None: the rendered input never carries
#    per-side counters, and their painless `if` guards would mask every row
_CP_IANA_BATCH = (
    "def process_batch(table, params):\n"
    "    import pyarrow as pa, pyarrow.compute as pc\n"
    "    if 'network_iana_number' not in table.column_names:\n"
    "        return table\n"
    "    keys = pa.array(list(params['table'].keys()), pa.string())\n"
    "    vals = pa.array(list(params['table'].values()), pa.string())\n"
    "    col = pc.cast(table.column('network_iana_number'), pa.string())\n"
    "    mapped = pc.take(vals, pc.index_in(col, keys))\n"
    "    if 'network_transport' in table.column_names:\n"
    "        cur = table.column('network_transport')\n"
    "        mapped = pc.if_else(pc.is_valid(mapped), mapped, cur)\n"
    "        return table.set_column(\n"
    "            table.column_names.index('network_transport'),\n"
    "            'network_transport', mapped)\n"
    "    return table.append_column('network_transport', mapped)\n")

# ES `set: field: client copy_from: source` copies the whole map; flat
# rendering = vectorized whole-prefix column copy (nulls stay null, matching
# the ES ignore_failure no-op when the source map is absent)
def _cp_subtree_copy(dst, src):
    return {"script": {"source": (
        "def process_batch(table, params):\n"
        f"    for name in list(table.column_names):\n"
        f"        if name == '{src}' or name.startswith('{src}_'):\n"
        f"            out = '{dst}' + name[len('{src}'):]\n"
        "            if out in table.column_names:\n"
        "                table = table.set_column(\n"
        "                    table.column_names.index(out), out,\n"
        "                    table.column(name))\n"
        "            else:\n"
        "                table = table.append_column(\n"
        "                    out, table.column(name))\n"
        "    return table\n")}}


def _checkpoint_hook_parts(doc):
    """(scripts, overrides) for the checkpoint/firewall pipeline — shared
    with ``beats_ray.modules.FILESET_HOOKS``."""
    import re as _re

    procs = doc["processors"]
    iana_src = next(p["script"]["source"] for p in procs if "script" in p)
    pairs = _re.findall(r"iana_number == '(\d+)'\)\s*\{\s*"
                        r"ctx\.network\.transport = '([\w-]+)'", iana_src)
    iana = {"script": {"source": _CP_IANA_BATCH,
                       "params": {"table": dict(pairs)}}}
    overrides = {}
    for i, p in enumerate(procs):
        s = p.get("set") or {}
        if s.get("field") == "client" and s.get("copy_from") == "source":
            overrides[i] = _cp_subtree_copy("client", "source")
        if s.get("field") == "server" and s.get("copy_from") == "destination":
            overrides[i] = _cp_subtree_copy("server", "destination")
    return [iana, None, None], overrides


def _checkpoint_compiled_spec():
    from ..ingest import compile_ingest, load_pipeline_yml
    doc = load_pipeline_yml(_CP_PIPELINE_YML)
    scripts, overrides = _checkpoint_hook_parts(doc)
    return compile_ingest(doc, scripts=scripts, overrides=overrides)


def q_events_ingest_checkpoint(sf_dir: str):
    """SECOND compiled-ingest pipeline at sf scale — the checkpoint/firewall
    ingest/pipeline.yml (904 lines: RFC5424-header grok, the ES kv
    processor with exclude_keys/strip_brackets, a ~96-rename + 15-convert
    ECS map, per-row ES date timezone, painless-guarded sets, iana->
    transport table) compiled by ``beats_ray.ingest.compile_ingest`` and run
    over RFC5424+kv lines rendered DETERMINISTICALLY from the events table.
    Complements ``events_ingest_apache`` (grok/uri shape) with the kv/
    syslog shape, so both major module families face the DuckDB oracle and
    the bench at data scale.  geoip is cluster-side (compiler skips it).

    Reference: x-pack/filebeat/module/checkpoint/firewall/ingest/
    pipeline.yml; golden parity for the same compiled chain on all 5
    reference fixtures in tests/test_checkpoint_golden.py."""
    from ..pipeline import Pipeline

    ds = _read(os.path.join(sf_dir, "events.parquet"),
               columns=["event_id", "ts", "user_id"])

    def render(df: pd.DataFrame) -> pd.DataFrame:
        u, e = df["user_id"], df["event_id"]
        srcip = ("10." + ((u // 65536) % 256).astype(str) + "."
                 + ((u // 256) % 256).astype(str) + "."
                 + (u % 256).astype(str))
        dstip = ("172.16." + (e % 256).astype(str) + "."
                 + ((e // 256) % 256).astype(str))
        proto = pd.Series(np.where(e % 2 == 1, "6", "17"), index=df.index)
        direction = pd.Series(
            np.where((e // 2) % 2 == 1, "inbound", "outbound"),
            index=df.index)
        ra = pd.Series(np.where(e % 5 == 0, "Drop", "Accept"),
                       index=df.index)
        sport = (1024 + e % 60000).astype(str)
        dport = pd.Series(np.select([e % 3 == 0, e % 3 == 1],
                                    ["443", "80"], "25"), index=df.index)
        when = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%SZ")
        msg = ("<134>1 " + when + " gw-" + (u % 8).astype(str)
               + " CheckPoint 1930 - [action:\"" + ra
               + "\"; ifdir:\"" + direction
               + "\"; loguid:\"{0x" + e.astype(str)
               + ",0x0,0x0,0x1}\"; origin:\"" + srcip
               + "\"; sequencenum:\"" + (e % 100).astype(str)
               + "\"; product:\"VPN-1 & FireWall-1\"; rule_action:\"" + ra
               + "\"; src:\"" + srcip + "\"; dst:\"" + dstip
               + "\"; proto:\"" + proto + "\"; s_port:\"" + sport
               + "\"; service:\"" + dport + "\"]")
        return pa.Table.from_pandas(
            pd.DataFrame({"message": msg, "ts": df["ts"]}),
            preserve_index=False).replace_schema_metadata(None)

    parsed = Pipeline(_checkpoint_compiled_spec()).apply(
        ds.map_batches(render, batch_format="pandas"), **_COMPILED_APPLY_KW)

    keys = ["event_action", "event_outcome", "network_transport",
            "network_direction"]

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + ["destination_port", "ts",
                              "source_ip"]).to_pandas()
        g = df.groupby(keys, as_index=False, dropna=False).agg(
            n=("source_ip", "size"),
            sum_dport=("destination_port", "sum"),
            max_ts=("ts", "max"),
            min_ip=("source_ip", "min"))
        g["n"] = g["n"].astype("int64")
        g["sum_dport"] = g["sum_dport"].astype("int64")
        # strip pandas schema metadata: its dicts defeat Ray's
        # block-schema dedup (unhashable-schema warning)
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    return small_groupby(parsed, keys, partial,
                         {"n": "sum", "sum_dport": "sum",
                          "max_ts": "max", "min_ip": "min"})


QUERIES["events_ingest_checkpoint"] = q_events_ingest_checkpoint
_EXTRA_ORACLES["events_ingest_checkpoint"] = """
    WITH e AS (
      SELECT ts, event_id AS e,
             '10.' || CAST((user_id // 65536) % 256 AS VARCHAR) || '.'
                   || CAST((user_id // 256) % 256 AS VARCHAR) || '.'
                   || CAST(user_id % 256 AS VARCHAR) AS srcip
      FROM events)
    SELECT CASE WHEN e % 5 = 0 THEN 'Drop' ELSE 'Accept' END AS event_action,
           'success' AS event_outcome,
           CASE WHEN e % 2 = 1 THEN 'tcp' ELSE 'udp' END AS network_transport,
           CASE WHEN (e // 2) % 2 = 1 THEN 'inbound'
                ELSE 'outbound' END AS network_direction,
           count(*)::BIGINT AS n,
           sum(CASE WHEN e % 3 = 0 THEN 443
                    WHEN e % 3 = 1 THEN 80 ELSE 25 END)::BIGINT AS sum_dport,
           max(date_trunc('second', ts)) AS max_ts,
           min(srcip) AS min_ip
    FROM e GROUP BY 1, 2, 3, 4
"""


# --------------------------------- production module-runner path at sf scale

def q_events_ingest_nginx_module(sf_dir: str):
    """THIRD compiled-ingest query — and the only one that runs the FULL
    production module-runner path: ``beats_ray.modules.compile_fileset_spec``
    resolves the nginx/access fileset's manifest.yml, renders its
    Go-templated ``config/nginx-access.yml`` (input-level add_fields
    ecs.version), compiles ``ingest/pipeline.yml`` with the built-in
    FILESET_HOOKS painless port (first-public-IP selection over
    nginx.access.remote_ip_list), and stamps the module-identity fields
    (event.module/event.dataset — channel/runner.go newCommonConfigEditor).
    The other two compiled queries call ``compile_ingest`` on a yml path
    directly; this one proves the *whole* ``python -m beats_ray module``
    surface emits vectorized stages at data scale.

    Input: nginx combined-log lines rendered DETERMINISTICALLY from the
    events table, with X-Forwarded-For-style remote_ip_lists (private-only,
    private+public, public+private by event_id % 3) so the script port's
    first-public-IP selection is oracle-checked, not just golden-checked.
    geoip is cluster-side (compiler skips it); user_agent runs per row for
    bench realism but is not aggregated (uap is not SQL-expressible).

    Reference: filebeat/module/nginx/access/{manifest.yml,config/
    nginx-access.yml,ingest/pipeline.yml}; golden parity for the same
    production path on the module's own fixtures in
    tests/test_fileset_hooks.py (nginx/access)."""
    from ..modules import compile_fileset_spec
    from ..pipeline import Pipeline

    ds = _read(os.path.join(sf_dir, "events.parquet"),
               columns=["event_id", "ts", "user_id", "event_type"])

    def render(df: pd.DataFrame) -> pa.Table:
        u, e = df["user_id"], df["event_id"]
        priv = ("10." + ((u // 65536) % 256).astype(str) + "."
                + ((u // 256) % 256).astype(str) + "." + (u % 256).astype(str))
        pub = ("203.0." + ((e // 256) % 256).astype(str) + "."
               + (e % 256).astype(str))
        iplist = pd.Series(
            np.select([e % 3 == 0, e % 3 == 1],
                      [priv + ", " + pub, priv], pub + ", " + priv),
            index=df.index)
        method = pd.Series(
            np.where(df["event_type"].isin(["purchase", "signup"]),
                     "POST", "GET"), index=df.index)
        status = pd.Series(
            np.where(e % 20 == 0, 502, np.where(e % 20 <= 2, 404, 200)),
            index=df.index)
        path = "/item/" + df["event_type"] + "/" + (e % 7).astype(str)
        user = pd.Series(np.where(e % 4 == 0, "-", "u" + u.astype(str)),
                         index=df.index)
        when = df["ts"].dt.strftime("%d/%b/%Y:%H:%M:%S") + " +0000"
        msg = (iplist + " - " + user + " [" + when + "] \"" + method + " "
               + path + " HTTP/1.1\" " + status.astype(str) + " "
               + (e % 4096).astype(str)
               + " \"-\" \"Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15) "
               "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 "
               "Safari/605.1.15\"")
        # arrow out: pandas schema metadata is unhashable and defeats
        # Ray's block-schema dedup
        return pa.Table.from_pandas(
            pd.DataFrame({"message": msg, "ts": df["ts"]}),
            preserve_index=False).replace_schema_metadata(None)

    spec, _ = compile_fileset_spec(
        "/root/reference/filebeat/module/nginx", "nginx", "access")
    parsed = Pipeline(spec).apply(
        ds.map_batches(render, batch_format="pandas"), **_COMPILED_APPLY_KW)

    keys = ["event_module", "event_dataset", "ecs_version", "event_outcome",
            "http_request_method", "http_response_status_code", "url_path"]

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + ["http_response_body_bytes", "ts",
                              "source_ip"]).to_pandas()
        g = df.groupby(keys, as_index=False, dropna=False).agg(
            n=("source_ip", "size"),
            sum_bytes=("http_response_body_bytes", "sum"),
            max_ts=("ts", "max"),
            min_ip=("source_ip", "min"))
        g["n"] = g["n"].astype("int64")
        g["sum_bytes"] = g["sum_bytes"].astype("int64")
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    return small_groupby(parsed, keys, partial,
                         {"n": "sum", "sum_bytes": "sum",
                          "max_ts": "max", "min_ip": "min"})


QUERIES["events_ingest_nginx_module"] = q_events_ingest_nginx_module
_EXTRA_ORACLES["events_ingest_nginx_module"] = """
    WITH e AS (
      SELECT ts, event_id AS e,
             CASE WHEN event_id % 20 = 0 THEN 502
                  WHEN event_id % 20 <= 2 THEN 404 ELSE 200 END AS status,
             event_id % 4096 AS nbytes,
             CASE WHEN event_type IN ('purchase', 'signup') THEN 'POST'
                  ELSE 'GET' END AS method,
             '/item/' || event_type || '/'
                || CAST(event_id % 7 AS VARCHAR) AS path,
             -- the pipeline's painless script picks the first NON-private
             -- IP in remote_ip_list, else the first entry: lists are
             -- [priv,pub] / [priv] / [pub,priv] by e%3 -> pub, priv, pub
             CASE WHEN event_id % 3 = 1 THEN
                 '10.' || CAST((user_id // 65536) % 256 AS VARCHAR) || '.'
                       || CAST((user_id // 256) % 256 AS VARCHAR) || '.'
                       || CAST(user_id % 256 AS VARCHAR)
             ELSE
                 '203.0.' || CAST((event_id // 256) % 256 AS VARCHAR) || '.'
                          || CAST(event_id % 256 AS VARCHAR)
             END AS ip
      FROM events)
    SELECT 'nginx' AS event_module,
           'nginx.access' AS event_dataset,
           '1.12.0' AS ecs_version,
           CASE WHEN status < 400 THEN 'success'
                ELSE 'failure' END AS event_outcome,
           method AS http_request_method,
           status::BIGINT AS http_response_status_code,
           path AS url_path,
           count(*)::BIGINT AS n,
           sum(nbytes)::BIGINT AS sum_bytes,
           max(date_trunc('second', ts)) AS max_ts,
           min(ip) AS min_ip
    FROM e GROUP BY 1, 2, 3, 4, 5, 6, 7
"""


# --------------------------- production path + REAL module JS at data scale

def q_events_ingest_zeek_dns_js(sf_dir: str):
    """FOURTH compiled query — the mini-JS interpreter at data scale: the
    zeek/dns fileset is entirely config-level (no ES ingest pipeline) and
    its processor chain embeds the module's REAL 170-line javascript
    processor (dns.yml ``zeek_dns_flags``: header-flag appends, qclass
    mapping, answers/TTLs zip with net.isIP resolved-ip extraction, rtt ->
    event.duration, outcome from rcode).  ``compile_fileset_spec`` builds
    the chain — decode_json_fields, registered_domain (with subdomain/etld
    targets), the JS through mini-JS, three converts, community_id — and
    runs it over zeek dns.log ndjson rendered DETERMINISTICALLY from the
    events table, so every piece of the JS's output faces the DuckDB
    oracle.  The other compiled queries cover grok/kv/uri shapes; this one
    proves the script interpreter — per-row by reference semantics (goja
    runs per event, libbeat/processors/script) — holds up in the bench,
    not just at fixture sizes.

    Reference: x-pack/filebeat/module/zeek/dns/config/dns.yml (config +
    inline JS); golden parity for the same production path in
    tests/test_fileset_hooks.py (zeek sweep) and tests/test_zeek_golden.py.
    """
    from ..modules import compile_fileset_spec
    from ..pipeline import Pipeline

    ds = _read(os.path.join(sf_dir, "events.parquet"),
               columns=["event_id", "user_id"])

    def render(df: pd.DataFrame) -> pa.Table:
        e, u = df["event_id"], df["user_id"]
        src = ("10." + ((u // 65536) % 256).astype(str) + "."
               + ((u // 256) % 256).astype(str) + "." + (u % 256).astype(str))
        proto = pd.Series(np.where(e % 7 == 0, "tcp", "udp"), index=df.index)
        q = ("host" + (e % 50).astype(str) + ".example"
             + (e % 20).astype(str) + ".com")
        qtn = pd.Series(np.select([e % 4 == 0, e % 4 == 1, e % 4 == 2],
                                  ["A", "AAAA", "PTR"], "TXT"),
                        index=df.index)
        qt = pd.Series(np.select([e % 4 == 0, e % 4 == 1, e % 4 == 2],
                                 ["1", "28", "12"], "16"), index=df.index)
        aa = pd.Series(np.where(e % 4 == 1, "true", "false"), index=df.index)
        ra = pd.Series(np.where(e % 3 == 0, "true", "false"), index=df.index)
        rcode = pd.Series(np.where(e % 5 == 0, 3, 0), index=df.index)
        rcn = pd.Series(np.where(e % 5 == 0, "NXDOMAIN", "NOERROR"),
                        index=df.index)
        # rtt in exact multiples of 0.5 s: JSON double and the SQL
        # (e%100)*0.5*1e9 stay bit-identical
        rtt = ((e % 100) * 0.5).astype(str)
        ipa = ("93.184." + ((e // 256) % 256).astype(str) + "."
               + (e % 256).astype(str))
        ans1 = (',"answers":["' + ipa + '"],"TTLs":['
                + (e % 1000).astype(str) + "]")
        ans2 = (',"answers":["' + ipa + '","cname' + e.astype(str)
                + '.example.com"],"TTLs":[' + (e % 1000).astype(str) + ",60]")
        ansp = pd.Series(np.select([e % 3 == 1, e % 3 == 2], [ans1, ans2],
                                   ""), index=df.index)
        apart = pd.Series(np.where(
            e % 2 == 1,
            ',"rtt":' + rtt + ',"rcode":' + rcode.astype(str)
            + ',"rcode_name":"' + rcn + '"' + ansp, ""), index=df.index)
        msg = ('{"ts":1700000000.0,"uid":"C' + e.astype(str)
               + '","id.orig_h":"' + src + '","id.orig_p":'
               + (1024 + e % 60000).astype(str)
               + ',"id.resp_h":"8.8.8.8","id.resp_p":53,"proto":"' + proto
               + '","trans_id":' + (e % 65536).astype(str) + ',"query":"'
               + q + '","qclass":1,"qclass_name":"C_INTERNET","qtype":' + qt
               + ',"qtype_name":"' + qtn + '","AA":' + aa
               + ',"TC":false,"RD":true,"RA":' + ra + apart
               + ',"rejected":false}')
        return pa.Table.from_pandas(
            pd.DataFrame({"message": msg}),
            preserve_index=False).replace_schema_metadata(None)

    spec, _ = compile_fileset_spec(
        "/root/reference/x-pack/filebeat/module/zeek", "zeek", "dns")
    parsed = Pipeline(spec).apply(
        ds.map_batches(render, batch_format="pandas"), **_COMPILED_APPLY_KW)

    keys = ["dns_type", "event_outcome", "network_transport",
            "dns_question_type", "dns_response_code"]

    def partial(t: pa.Table) -> pa.Table:
        resolved = pc.fill_null(
            pc.list_value_length(t.column("dns_resolved_ip")), 0)
        flags = pc.fill_null(
            pc.list_value_length(t.column("dns_header_flags")), 0)
        df = t.select(keys + ["event_duration",
                              "dns_question_registered_domain",
                              "source_ip"]).to_pandas()
        df["resolved"] = pc.cast(resolved, pa.int64()).to_pandas().values
        df["flags"] = pc.cast(flags, pa.int64()).to_pandas().values
        # '' instead of null keys: null-group/null-sort semantics differ
        # between pandas, Ray Data and DuckDB — normalize on both sides
        for k in ("event_outcome", "dns_response_code"):
            df[k] = df[k].fillna("")
        g = df.groupby(keys, as_index=False, dropna=False).agg(
            n=("source_ip", "size"),
            max_dur=("event_duration", "max"),
            sum_resolved=("resolved", "sum"),
            sum_flags=("flags", "sum"),
            min_rd=("dns_question_registered_domain", "min"),
            min_ip=("source_ip", "min"))
        g["n"] = g["n"].astype("int64")
        g["sum_resolved"] = g["sum_resolved"].astype("int64")
        g["sum_flags"] = g["sum_flags"].astype("int64")
        # all-null duration groups: 0 matches the oracle's COALESCE (real
        # maxima are >= 5e8, so the fill never wins a merge)
        g["max_dur"] = g["max_dur"].fillna(0.0)
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    return small_groupby(parsed, keys, partial,
                         {"n": "sum", "max_dur": "max",
                          "sum_resolved": "sum", "sum_flags": "sum",
                          "min_rd": "min", "min_ip": "min"})


QUERIES["events_ingest_zeek_dns_js"] = q_events_ingest_zeek_dns_js
_EXTRA_ORACLES["events_ingest_zeek_dns_js"] = """
    WITH d AS (
      SELECT CASE WHEN event_id % 2 = 1 THEN 'answer'
                  ELSE 'query' END AS dns_type,
             CASE WHEN event_id % 2 = 1 THEN
                 (CASE WHEN event_id % 5 = 0 THEN 'failure'
                       ELSE 'success' END)
             ELSE '' END AS event_outcome,
             CASE WHEN event_id % 7 = 0 THEN 'tcp'
                  ELSE 'udp' END AS network_transport,
             CASE event_id % 4 WHEN 0 THEN 'A' WHEN 1 THEN 'AAAA'
                  WHEN 2 THEN 'PTR' ELSE 'TXT' END AS dns_question_type,
             CASE WHEN event_id % 2 = 1 THEN
                 (CASE WHEN event_id % 5 = 0 THEN 'NXDOMAIN'
                       ELSE 'NOERROR' END)
             ELSE '' END AS dns_response_code,
             CASE WHEN event_id % 2 = 1 AND event_id % 100 <> 0
                  THEN (event_id % 100) * 0.5 * 1e9 END AS dur,
             CASE WHEN event_id % 2 = 1 AND event_id % 3 IN (1, 2)
                  THEN 1 ELSE 0 END AS resolved,
             1 + CASE WHEN event_id % 4 = 1 THEN 1 ELSE 0 END
               + CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS flags,
             'example' || CAST(event_id % 20 AS VARCHAR) || '.com' AS rd,
             '10.' || CAST((user_id // 65536) % 256 AS VARCHAR) || '.'
                   || CAST((user_id // 256) % 256 AS VARCHAR) || '.'
                   || CAST(user_id % 256 AS VARCHAR) AS ip
      FROM events)
    SELECT dns_type, event_outcome, network_transport, dns_question_type,
           dns_response_code,
           count(*)::BIGINT AS n,
           COALESCE(max(dur), 0)::DOUBLE AS max_dur,
           sum(resolved)::BIGINT AS sum_resolved,
           sum(flags)::BIGINT AS sum_flags,
           min(rd) AS min_rd,
           min(ip) AS min_ip
    FROM d GROUP BY 1, 2, 3, 4, 5
"""


def q_docs_pack_sequences(sf_dir: str):
    """Sequence packing for training-data assembly: greedy token-budget
    (512) bin assignment per hash bucket (doc_id % 8), documents in stable
    id order — one groupby shuffle, per-bucket sequential fold (the oracle
    restates it as a recursive CTE).  Returns every document's (bucket,
    bin, n_tokens) assignment."""
    from ..functions.packing import pack_sequences
    ds = _read(os.path.join(sf_dir, "documents.parquet"), split=True,
               columns=["doc_id", "text"])
    return pack_sequences(ds, max_tokens=512, num_buckets=8)


QUERIES["docs_pack_sequences"] = q_docs_pack_sequences
from ..functions.packing import pack_sequences_oracle_sql as _pack_sql
_EXTRA_ORACLES3["docs_pack_sequences"] = _pack_sql(512, 8)
