"""Property tests for the multiline kernels and the vectorized FNV batch:
random inputs, invariants that must hold for ANY data."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from beats_ray.sources.readers import fnv32a, fnv32a_batch
from beats_ray.stages.flow import _multiline_groups

lines_st = st.lists(
    st.sampled_from(["level=info start", "  continuation", "", "x",
                     "level=warn end", "  tail"]), min_size=1, max_size=40)


@settings(max_examples=200, deadline=None)
@given(lines_st, st.sampled_from(["pattern", "while_pattern"]),
       st.booleans(), st.sampled_from(["after", "before"]))
def test_multiline_groups_invariants(lines, mode, negate, match):
    txt = pd.Series(lines)
    grp, keep = _multiline_groups(txt, mode, r"^level=", negate, match,
                                  None, 1)
    assert len(grp) == len(lines) and len(keep) == len(lines)
    assert keep.all()          # pattern/while modes never drop lines
    # group ids are non-decreasing over the ordered input (contiguity):
    # a message is always a consecutive run of lines
    assert (np.diff(grp) >= 0).all()


@settings(max_examples=200, deadline=None)
@given(lines_st, st.integers(min_value=1, max_value=5))
def test_multiline_count_invariants(lines, count_lines):
    txt = pd.Series(lines)
    grp, keep = _multiline_groups(txt, "count", None, False, "after",
                                  None, count_lines)
    kept = grp[keep]
    # every group holds exactly count_lines lines except possibly the last
    if len(kept):
        sizes = pd.Series(kept).value_counts().sort_index()
        assert (sizes.iloc[:-1] == count_lines).all()
        assert sizes.iloc[-1] <= count_lines
    # empty lines are exactly the dropped ones
    assert ((txt == "").to_numpy() == ~keep).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=50),
       st.integers(min_value=0, max_value=20))
def test_fnv_batch_matches_scalar(strings, slice_from):
    arr = pa.array(strings, pa.string())
    want = [fnv32a(s.encode("utf-8")) for s in strings]
    assert list(fnv32a_batch(arr)) == want
    # slices (non-zero offsets share parent buffers) must agree too
    k = min(slice_from, len(strings))
    assert list(fnv32a_batch(arr.slice(k))) == want[k:]
