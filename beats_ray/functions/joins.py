"""Join operators — the three scale regimes (ray_guide "Joins and lookups").

- ``broadcast_join``: small side shipped once (ray.put) and merged per batch
  inside map_batches — no shuffle.  Used when one side fits in memory
  (dimension tables, vocab, blocklists).
- ``bucketed_join``: both sides large — explicit partitioned hash join:
  ``bucket = hash(key) % B`` on each side, one groupby(bucket) co-groups
  matching buckets, a vectorized pandas merge joins inside each bucket.
  B bounds peak per-task memory (bucket ~ |L|/B + |R|/B); salt hot keys by
  raising B.  This is the portable pattern; it does NOT require per-key
  groups, so Python overhead is O(B), not O(#keys).
- ``native_join``: thin wrapper over ``ray.data.Dataset.join`` (hash
  partitioned) where this Ray version provides it — preferred when present.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def broadcast_join(ds, small_df: pd.DataFrame, on: str, how: str = "left"):
    """Small-side map-join: ray.put once, pandas merge per batch."""
    import ray
    ref = ray.put(small_df)

    class Merge:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.small, on=on, how=how)

    return ds.map_batches(Merge, batch_format="pandas", concurrency=(1, 4))


def bucketed_join(left, right, on: str, n_buckets: int = 64, how: str = "inner",
                  left_tag: str = "l", right_tag: str = "r"):
    """Partitioned hash join of two Datasets on one key column.

    Implementation: tag each side's rows, add ``__bucket`` = key hash % B,
    union, groupby(__bucket), and inside each co-grouped bucket split by tag
    and pandas-merge.  One all-to-all shuffle total; the merge per bucket is
    vectorized C, so Python cost scales with B (constant), not key count.
    Column collisions (besides the key) get _l/_r suffixes.
    """

    def tag(which):
        def fn(t: pa.Table) -> pa.Table:
            key = t[on]
            if pa.types.is_integer(key.type):
                k = key.to_pandas().fillna(0).to_numpy(dtype=np.int64)
                bucket = pa.array((np.abs(k) % n_buckets).astype(np.int32))
            else:
                # vectorized FNV-32a over the stringified key (the repo's
                # kafka-partitioner hash) — the round-2 per-row crc32 loop
                # was the one Python loop left in the join hot path
                import pyarrow.compute as pc
                from ..sources.readers import fnv32a_batch
                s = pc.fill_null(pc.cast(key, pa.string()), "")
                h = fnv32a_batch(s.combine_chunks()
                                 if isinstance(s, pa.ChunkedArray) else s)
                bucket = pa.array((h % np.uint32(n_buckets)).astype(np.int32))
            t = t.append_column("__bucket", bucket)
            return t.append_column("__side", pa.array([which] * len(t), pa.string()))
        return fn

    l_tagged = left.map_batches(tag(left_tag), batch_format="pyarrow")
    r_tagged = right.map_batches(tag(right_tag), batch_format="pyarrow")
    both = l_tagged.union(r_tagged)

    # each side's column set is DECLARED from its schema at the driver —
    # inferring it per bucket by null-scanning dropped legitimately
    # all-null columns and gave matched/unmatched buckets different
    # schemas.  `common` is exactly the overlap pandas merge suffixes.
    l_cols = list(left.schema().names)
    r_cols = list(right.schema().names)
    common = sorted((set(l_cols) & set(r_cols)) - {on})

    def merge_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if g.num_columns == 0 or len(g) == 0:   # empty co-group block
            return pa.table({})
        side = g["__side"]
        lpart = g.filter(pc.equal(side, left_tag)).select(l_cols).to_pandas()
        rpart = g.filter(pc.equal(side, right_tag)).select(r_cols).to_pandas()
        # SQL null-key semantics: null keys never match (pandas merge
        # would pair NaN with NaN); outer sides keep their null-key rows
        # with a null-filled other side
        lnull = lpart[lpart[on].isna()] if how in ("left", "outer") else None
        rnull = rpart[rpart[on].isna()] if how in ("right", "outer") else None
        lpart = lpart[lpart[on].notna()]
        rpart = rpart[rpart[on].notna()]
        # merging even when one side is empty keeps the output schema
        # (including _l/_r suffixes) identical across buckets
        merged = lpart.merge(rpart, on=on, how=how,
                             suffixes=(f"_{left_tag}", f"_{right_tag}"))
        extra = [d.rename(columns={c: f"{c}_{t}" for c in common})
                 for d, t in ((lnull, left_tag), (rnull, right_tag))
                 if d is not None and len(d)]
        if extra:
            merged = pd.concat([merged] + extra, ignore_index=True)
        return pa.Table.from_pandas(merged, preserve_index=False).replace_schema_metadata(None)

    return both.groupby("__bucket").map_groups(merge_bucket, batch_format="pyarrow")


def native_join(left, right, on: str, num_partitions: int = 32,
                join_type: str = "inner"):
    """ray.data.Dataset.join (hash-partitioned) when available."""
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=(on,))
