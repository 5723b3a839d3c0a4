"""Zero-copy conversion between Arrow ``list<float>`` columns and numpy
matrices — the hot-path plumbing for every embedding operator.

``to_pylist()`` on a list column materializes one Python list per row (the
round-2 verdict flagged it as the dominant cost of the scoring stages at
scale).  For fixed-dimension embeddings the flat value buffer IS the matrix:
``pc.list_flatten`` + ``to_numpy`` + ``reshape`` touches no Python objects.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def list_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """``list<float>`` column -> (n, dim) ndarray without per-row Python.

    Requires uniform list lengths (fixed-dim embeddings) and no null rows;
    raises ValueError otherwise so callers fail loudly rather than score a
    misaligned matrix.  ``pc.list_flatten`` honours slice offsets, so this
    is safe on sliced/chunked inputs (the fnv32a_batch offset lesson).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count:
        raise ValueError("list_to_matrix: null embedding rows")
    lens = pc.list_value_length(col)
    mn = pc.min_max(lens)
    lo, hi = mn["min"].as_py(), mn["max"].as_py()
    if lo != hi:
        raise ValueError(f"list_to_matrix: ragged lists ({lo}..{hi})")
    flat = pc.list_flatten(col)
    vals = flat.to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(vals.reshape(n, hi), dtype=dtype)


def matrix_to_list(mat: np.ndarray, value_type=pa.float64()) -> pa.ListArray:
    """(n, dim) ndarray -> ``list<float>`` ListArray, one buffer build."""
    n, d = mat.shape
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32), pa.int32())
    values = pa.array(np.ascontiguousarray(mat.ravel()), value_type)
    return pa.ListArray.from_arrays(offsets, values)


def ids_to_numpy(col) -> np.ndarray:
    """Integer id column -> int64 ndarray (zero-copy when null-free).

    Fails loudly on null ids (like list_to_matrix does for null vectors):
    to_numpy would route nulls through float NaN and astype would turn
    them into INT64_MIN phantom ids downstream."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(f"id column contains {col.null_count} null(s); "
                         "filter or fill them before vector ops")
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
