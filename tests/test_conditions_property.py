"""Property test: the vectorized condition compiler must agree with a
straightforward per-row Python evaluator on random condition ASTs over
random batches (the reference's two-implementations-one-behavior pattern,
processors/when_parity_test.go)."""

import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from beats_ray.conditions import compile_condition

FIELDS = ["s", "n", "f"]


@st.composite
def batches(draw):
    n = draw(st.integers(min_value=1, max_value=20))
    s = draw(st.lists(st.one_of(st.none(), st.sampled_from(["a", "ab", "ba", "xyz", ""])),
                      min_size=n, max_size=n))
    nums = draw(st.lists(st.one_of(st.none(), st.integers(-5, 5)), min_size=n, max_size=n))
    fs = draw(st.lists(st.one_of(st.none(), st.floats(-2, 2, allow_nan=False)),
                       min_size=n, max_size=n))
    return pa.table({"s": pa.array(s, pa.string()),
                     "n": pa.array(nums, pa.int64()),
                     "f": pa.array(fs, pa.float64())})


def leaf_conditions():
    return st.one_of(
        st.builds(lambda v: {"equals": {"s": v}}, st.sampled_from(["a", "ab", "zz"])),
        st.builds(lambda v: {"equals": {"n": v}}, st.integers(-5, 5)),
        st.builds(lambda v: {"contains": {"s": v}}, st.sampled_from(["a", "b", "y"])),
        st.builds(lambda v: {"regexp": {"s": v}}, st.sampled_from(["^a", "b$", "x.z"])),
        st.builds(lambda lo, hi: {"range": {"n": {"gte": lo, "lt": hi}}},
                  st.integers(-5, 0), st.integers(0, 5)),
        st.builds(lambda f: {"has_fields": [f]}, st.sampled_from(FIELDS + ["missing"])),
    )


conditions = st.recursive(
    leaf_conditions(),
    lambda sub: st.one_of(
        st.builds(lambda a, b: {"and": [a, b]}, sub, sub),
        st.builds(lambda a, b: {"or": [a, b]}, sub, sub),
        st.builds(lambda a: {"not": a}, sub),
    ),
    max_leaves=6)


def eval_row(cfg, row) -> bool:
    """Reference per-row evaluator (Beats per-event semantics)."""
    results = []
    for key, val in cfg.items():
        if key == "equals":
            for f, v in val.items():
                x = row.get(f)
                results.append(x is not None and
                               (str(x) == str(v) if isinstance(x, str) else x == v))
        elif key == "contains":
            for f, v in val.items():
                x = row.get(f)
                results.append(isinstance(x, str) and v in x)
        elif key == "regexp":
            for f, v in val.items():
                x = row.get(f)
                results.append(isinstance(x, str) and re.search(v, x) is not None)
        elif key == "range":
            for f, bounds in val.items():
                x = row.get(f)
                ok = x is not None
                if ok:
                    for op, b in bounds.items():
                        ok = ok and {"gt": x > b, "gte": x >= b,
                                     "lt": x < b, "lte": x <= b}[op]
                results.append(ok)
        elif key == "has_fields":
            results.append(all(row.get(f) is not None for f in val))
        elif key == "and":
            results.append(all(eval_row(c, row) for c in val))
        elif key == "or":
            results.append(any(eval_row(c, row) for c in val))
        elif key == "not":
            results.append(not eval_row(val, row))
    return all(results)


@given(conditions, batches())
@settings(max_examples=300, deadline=None)
def test_compiler_matches_row_evaluator(cfg, batch):
    mask = compile_condition(cfg).mask(batch).to_pylist()
    mask = [bool(m) for m in mask]
    expected = [eval_row(cfg, row) for row in batch.to_pylist()]
    assert mask == expected, (cfg, batch.to_pydict())
