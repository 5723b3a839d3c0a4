"""Selector routing (first-non-empty-match-wins), if/then/else, when-masks,
poisoned-row chain-abort semantics."""

import pyarrow as pa
import pyarrow.compute as pc

from beats_ray.pipeline import Pipeline
from beats_ray.routing import Selector


def test_selector_first_match_wins():
    batch = pa.table({"role": ["tool", "user", "assistant"],
                      "tool": ["bash", "", ""],
                      "level": ["ERROR", "ERROR", "INFO"]})
    sel = Selector([
        {"index": "errors", "when": {"equals": {"level": "ERROR"}}},
        {"index": "tool-%{[tool]}", "when": {"equals": {"role": "tool"}}},
    ], default="default")
    assert sel.select(batch).to_pylist() == ["errors", "errors", "default"]


def test_selector_format_default_and_empty_nonmatch():
    batch = pa.table({"x": ["a", None]})
    sel = Selector([{"index": "%{[x]}"}], default="dflt")
    assert sel.select(batch).to_pylist() == ["a", "dflt"]
    sel2 = Selector([{"index": "%{[x]:fallback}"}], default="dflt")
    assert sel2.select(batch).to_pylist() == ["a", "fallback"]


def test_selector_lowercase():
    batch = pa.table({"x": ["AbC"]})
    sel = Selector([{"index": "%{[x]}"}], lowercase=True)
    assert sel.select(batch).to_pylist() == ["abc"]


def test_if_then_else():
    p = Pipeline([
        {"if": {"equals": {"kind": "a"}},
         "then": [{"add_fields": {"target": "", "fields": {"branch": "then"}}}],
         "else": [{"add_fields": {"target": "", "fields": {"branch": "else"}}}]},
    ])
    out = p.run_local(pa.table({"kind": ["a", "b", "a"]}))
    d = dict(zip(out.column("kind").to_pylist(), out.column("branch").to_pylist()))
    assert d == {"a": "then", "b": "else"}


def test_when_partial_mask_preserves_rows():
    p = Pipeline([
        {"add_fields": {"target": "", "fields": {"seen": 1},
                        "when": {"equals": {"k": "x"}}}},
    ])
    out = p.run_local(pa.table({"k": ["x", "y"]}))
    d = dict(zip(out.column("k").to_pylist(), out.column("seen").to_pylist()))
    assert d == {"x": 1, "y": None}


def test_poisoned_rows_skip_later_stages():
    """A row with error_message set must not be touched by later stages
    (Beats aborts the chain per errored event, processor.go:195-208)."""
    p = Pipeline([
        {"rename": {"fields": [{"from": "missing", "to": "z"}]}},  # errors all rows
        {"add_fields": {"target": "", "fields": {"later": True}}},
    ])
    out = p.run_local(pa.table({"a": [1]}))
    assert out.column("error_message").to_pylist()[0] is not None
    assert "later" not in out.column_names or out.column("later").to_pylist() == [None]


def test_route_stage_in_pipeline():
    p = Pipeline({"processors": [],
                  "route": {"rules": [{"index": "t-%{[k]}"}], "default": "d"}})
    out = p.run_local(pa.table({"k": ["a", None]}))
    assert out.column("sink").to_pylist() == ["t-a", "d"]
