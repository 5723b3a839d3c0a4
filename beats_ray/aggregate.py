"""Partial-aggregation helpers.

``small_groupby`` implements the canonical scale pattern for LOW-CARDINALITY
grouped aggregates (per-sink counts, per-level counts, pricing summaries):
combine inside ``map_batches`` (one partial row per key per block), then
union-reduce the tiny partials on the driver with pandas.  This avoids Ray's
all-to-all Aggregate operator, which costs ~2s of fixed overhead per query —
the right trade as long as (#keys x #blocks) stays driver-small, which is the
documented assumption (SURVEY.md §7.1 step 7: partial aggregate -> merge;
the reference's per-sink counters are exactly this shape,
libbeat/publisher/pipeline/monitoring.go:73-113).

High-cardinality aggregates (per-conversation, per-document) must keep using
``ds.groupby(...)`` — the real shuffle.

Time-bucketed keys (events_hourly's hour x type) sit in between: total key
cardinality grows with the time span, but partial-row volume is
``sum over blocks of (keys PRESENT in block)`` — and a block covers a
narrow time slice, so partials stay ~ O(#blocks x keys-per-block), small
even at 10^12 rows.  If blocks are NOT time-clustered (shuffled input),
switch those to ``ds.groupby`` too.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

# Guard for the driver-merge path: if the per-block partials exceed this
# many rows (shuffled / non-time-clustered input breaking the
# keys-per-block assumption above), reduce them with a real distributed
# groupby over the PARTIALS dataset instead of pandas on the driver.
# Env-overridable so tests can force the shuffle path on toy data.
DRIVER_PARTIAL_ROW_LIMIT = int(
    os.environ.get("BEATS_RAY_PARTIAL_ROW_LIMIT", "2000000"))


def small_groupby(ds, keys: list[str], partial_fn, agg: dict[str, str],
                  rename: dict[str, str] | None = None) -> pa.Table:
    """partial_fn(batch: pa.Table) -> pa.Table of per-block partials with
    columns keys + the partial measures; ``agg`` maps measure column ->
    'sum'|'min'|'max'; ``rename`` maps measure -> output name.

    Partials are materialized (object-store-resident, spillable) and
    counted first: past DRIVER_PARTIAL_ROW_LIMIT rows the merge happens as
    a distributed ``groupby`` over the partials instead of driver pandas —
    the guard VERDICT r3 §wrong#3 asked for."""
    partials_md = ds.map_batches(partial_fn, batch_format="pyarrow") \
                    .materialize()
    if partials_md.count() == 0:
        return pa.table({})
    if partials_md.count() > DRIVER_PARTIAL_ROW_LIMIT:
        from ray.data.aggregate import Max, Min, Sum
        mk = {"sum": Sum, "min": Min, "max": Max}
        aggs = [mk[how](col, alias_name=col) for col, how in agg.items()]
        # Ray Data's groupby does not keep null-key groups the way pandas
        # dropna=False does: route rows with any null key through the
        # driver merge (bounded: at most #blocks x #null-key-combos rows)
        # and shuffle only the non-null remainder.
        # partial blocks may lack a key column entirely (counts_by's
        # partial_fn emits only the key columns present in its block); the
        # driver-pandas path fills those with NaN, so this path must add
        # them as typed nulls — typed from the unified schema so the
        # post-filter groupby sees one consistent schema across blocks
        sch = partials_md.schema()
        key_types = {k: (sch.types[sch.names.index(k)]
                         if k in sch.names else pa.string())
                     for k in keys}

        def _any_null_key(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc
            for k in keys:
                if k not in t.column_names:
                    t = t.append_column(k, pa.nulls(len(t), key_types[k]))
            m = pa.array([False] * len(t))
            for k in keys:
                m = _pc.or_(m, _pc.is_null(t.column(k)))
            return t.append_column("__nullkey", m)
        flagged = partials_md.map_batches(_any_null_key,
                                          batch_format="pyarrow")
        reduced = flagged.filter(expr="__nullkey == False") \
            .drop_columns(["__nullkey"]).groupby(keys).aggregate(*aggs)
        out = reduced.to_pandas()[keys + list(agg)]
        null_rows = flagged.filter(expr="__nullkey == True") \
            .drop_columns(["__nullkey"]).take_all()
        if null_rows:
            ndf = pd.DataFrame(null_rows).groupby(
                keys, dropna=False, as_index=False).agg(agg)
            out = pd.concat([out, ndf], ignore_index=True)
    else:
        df = pd.DataFrame(partials_md.take_all())
        out = df.groupby(keys, dropna=False, as_index=False).agg(agg)
    if rename:
        out = out.rename(columns=rename)
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


def distributed_topk(ds, k: int, by: list[str], ascending: list[bool]) -> pa.Table:
    """Top-k over an UNBOUNDED-cardinality Dataset without materializing it:
    each block keeps its own top-k (map_batches), so the driver merges at
    most k x #blocks rows regardless of input size.  Use after the real
    shuffle (ds.groupby(...).aggregate) for 'top users by sum'-style queries
    — per-block top-k BEFORE a sum aggregate would be wrong (a globally hot
    key can be cold in every individual block)."""

    def blk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=ascending).head(k)

    rows = ds.map_batches(blk, batch_format="pandas").take_all()
    if not rows:
        return pa.table({})
    df = pd.DataFrame(rows).sort_values(by, ascending=ascending) \
        .head(k).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def counts_by(ds, key_cols: list[str], count_name: str = "n") -> pa.Table:
    """Per-key row counts via partial aggregation + driver merge."""
    def partial(t: pa.Table) -> pa.Table:
        cols = [c for c in key_cols if c in t.column_names]
        return t.group_by(cols).aggregate([([], "count_all")]) \
                .rename_columns(cols + ["n_part"])
    return small_groupby(ds, key_cols, partial, {"n_part": "sum"},
                         {"n_part": count_name})
