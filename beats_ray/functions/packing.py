"""Sequence packing — assemble documents into fixed token-budget bins.

Training-data pipelines pack variable-length documents into fixed-length
training sequences; the assignment step is this operator: greedy packing of
documents (in stable id order) into bins whose token sum stays within
``max_tokens``.  A document longer than the budget gets its own bin (the
downstream tokenizer truncates; this operator never drops rows).

Scale shape (100 TB): documents hash into ``num_buckets`` independent
packing domains — ONE ``groupby(bucket)`` shuffle, then a per-bucket greedy
fold.  The fold is inherently sequential per bucket (each bin boundary
depends on the running sum — the DuckDB oracle restates it as a recursive
CTE), so parallelism comes from the bucket count: size ``num_buckets`` >=
cluster cores and so that rows/bucket (= n/num_buckets) fits a worker.
Packing quality is unaffected by bucketing — bins never span buckets by
design, the same property that makes the operator resumable per bucket.

Token counting matches the repo's corpus-stats convention (single-space
split, ``length(string_split(text, ' '))`` in the oracles) so the packing
decision is exactly reproducible in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pack_sequences(ds, max_tokens: int = 512, num_buckets: int = 8,
                   id_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset of (id_col, bucket, bin, n_tokens), one row per document.

    ``bin`` is the packing-bin index within (bucket), assigned greedily in
    ascending ``id_col`` order: a document joins the current bin unless
    that would push the bin's token sum over ``max_tokens``.
    """

    def prep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).combine_chunks() \
            if isinstance(t.column(id_col), pa.ChunkedArray) \
            else t.column(id_col)
        toks = pc.cast(pc.list_value_length(
            pc.split_pattern(t.column(text_col), " ")), pa.int64())
        bucket = pa.array(
            ids.to_numpy(zero_copy_only=False) % num_buckets, pa.int64())
        return pa.table({id_col: ids, "bucket": bucket, "n_tokens": toks})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = g["n_tokens"].to_numpy(dtype=np.int64)
        n = len(toks)
        # greedy fold in O(bins * log n), not O(rows) Python: each bin is
        # the longest prefix run whose cumsum stays within start + budget,
        # found by binary search on the cumulative sum — iteration count is
        # the BIN count, so a million-doc bucket with ~100-doc bins costs
        # ~10k searchsorted calls instead of 1M Python steps
        cs = np.concatenate(([0], np.cumsum(toks)))
        bin_starts = []
        i = 0
        while i < n:
            bin_starts.append(i)
            j = int(np.searchsorted(cs, cs[i] + max_tokens, side="right")) - 1
            i = max(j, i + 1)   # an over-budget doc still consumes one slot
        bins = np.zeros(n, dtype=np.int64)
        bins[bin_starts[1:]] = 1
        g["bin"] = np.cumsum(bins)
        return g[[id_col, "bucket", "bin", "n_tokens"]]

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return prepped.groupby("bucket").map_groups(fold, batch_format="pandas")


def pack_sequences_oracle_sql(max_tokens: int = 512, num_buckets: int = 8,
                              table: str = "documents") -> str:
    """DuckDB restatement: the greedy fold as a recursive CTE (same pattern
    as the rate-limit oracle) — exact per-document bin assignments."""
    return f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, doc_id % {num_buckets} AS bucket,
             length(string_split(text, ' '))::BIGINT AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY doc_id % {num_buckets}
                                ORDER BY doc_id) AS rn
      FROM {table}),
    p AS (
      SELECT bucket, rn, doc_id, n_tokens, 0::BIGINT AS bin, n_tokens AS acc
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.bucket, d.rn, d.doc_id, d.n_tokens,
             CASE WHEN p.acc + d.n_tokens > {max_tokens}
                  THEN p.bin + 1 ELSE p.bin END,
             CASE WHEN p.acc + d.n_tokens > {max_tokens}
                  THEN d.n_tokens ELSE p.acc + d.n_tokens END
      FROM d JOIN p ON d.bucket = p.bucket AND d.rn = p.rn + 1)
    SELECT doc_id, bucket, bin, n_tokens FROM p
    """
