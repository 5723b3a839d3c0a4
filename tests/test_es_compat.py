"""ES-ingest-processor analogue stages (set / append / dot_expander),
the `length` condition, and Beats rename subtree-move semantics.

References: elasticsearch SetProcessor / AppendProcessor docs (public),
libbeat/processors/actions/rename.go (renameField moves map subtrees).
"""
import pyarrow as pa

from beats_ray.conditions import compile_condition
from beats_ray.pipeline import Pipeline


def run(spec, batch):
    return Pipeline({"processors": spec}).run_local(batch)


def test_set_constant_and_copy_from():
    t = pa.table({"a": ["x", None, "z"]})
    out = run([{"set": {"field": "b", "value": "v"}}], t)
    assert out.column("b").to_pylist() == ["v", "v", "v"]
    out = run([{"set": {"field": "c", "copy_from": "a"}}], t)
    assert out.column("c").to_pylist() == ["x", None, "z"]


def test_set_override_false_fills_only_null():
    t = pa.table({"a": ["x", None]})
    out = run([{"set": {"field": "a", "value": "fill", "override": False}}], t)
    assert out.column("a").to_pylist() == ["x", "fill"]


def test_set_ignore_empty_value():
    t = pa.table({"a": [1, 2]})
    out = run([{"set": {"field": "b", "value": "", "ignore_empty_value": True}}], t)
    assert "b" not in out.column_names


def test_append_scalar_becomes_list_head():
    t = pa.table({"f": ["head", None]})
    out = run([{"append": {"field": "f", "value": "tail"}}], t)
    assert out.column("f").to_pylist() == [["head", "tail"], ["tail"]]


def test_append_value_from_and_allow_duplicates():
    t = pa.table({"f": [["a"], ["b"]], "src": ["a", "c"]})
    out = run([{"append": {"field": "f", "value_from": "src",
                           "allow_duplicates": False}}], t)
    assert out.column("f").to_pylist() == [["a"], ["b", "c"]]


def test_append_each_from_list_column():
    t = pa.table({"src": [["x", "y"], None, ["z"]]})
    out = run([{"append": {"field": "dst", "each_from": "src"}}], t)
    assert out.column("dst").to_pylist() == [["x", "y"], None, ["z"]]


def test_dot_expander_identity():
    t = pa.table({"a_b": [1]})
    assert run([{"dot_expander": {"field": "a.b"}}], t).equals(t)


def test_length_condition_list_and_string():
    t = pa.table({"lst": [["a"], [], None], "s": ["ab", "", None]})
    m = compile_condition({"length": {"lst": {"eq": 0}}}).mask(t)
    assert m.to_pylist() == [False, True, False]
    m = compile_condition({"length": {"s": {"gt": 1}}}).mask(t)
    assert m.to_pylist() == [True, False, False]
    # missing field -> no match
    m = compile_condition({"length": {"nope": 0}}).mask(t)
    assert m.to_pylist() == [False, False, False]


def test_rename_moves_subtree():
    t = pa.table({"a_x": [1], "a_y": [2], "b": [3]})
    out = run([{"rename": {"fields": [{"from": "a", "to": "c"}],
                           "move_subtrees": True,
                           "ignore_missing": True}}], t)
    assert sorted(out.column_names) == ["b", "c_x", "c_y"]
    assert out.column("c_x").to_pylist() == [1]


def test_es_split_non_string_value_fails_row_only():
    """A non-string value (an earlier decode wrote an int) must not
    TypeError the whole batch — ES fails per document."""
    import pyarrow as pa
    from beats_ray.stages.base import stage_factory
    st = stage_factory("es_split")({"field": "f", "separator": ","})
    st.setup()
    out = st.apply(pa.table({"f": pa.array([1, 2], pa.int64())}))
    assert out["f"].to_pylist() == [None, None]


def test_es_csv_non_string_value_fails_row_only():
    import pyarrow as pa
    from beats_ray.stages.base import stage_factory
    st = stage_factory("es_csv")({"field": "f", "target_fields": ["a", "b"]})
    st.setup()
    out = st.apply(pa.table({"f": pa.array([7], pa.int64())}))
    assert "a" not in out.column_names  # all-empty targets stay unset


def test_mustache_json_escape_control_chars():
    """ES's JsonStringEncoder escapes \\n/\\r/\\t in {{..}} renders, not
    just quotes and backslashes."""
    from beats_ray.stages.es_compat import mustache_to_fmtstr
    import pyarrow as pa
    fs = mustache_to_fmtstr("{{a}}")
    out = fs.render(pa.table({"a": ["x\ny\tz"]}))
    assert out.to_pylist() == ["x\\ny\\tz"]


def test_fail_processor_poisons_rows_with_message():
    """ES fail aborts the doc; the row-model analogue is error-poisoning.
    Conditioned fail poisons only matching rows; mustache messages render
    per row."""
    import pyarrow as pa
    from beats_ray.ingest import compile_ingest
    from beats_ray.pipeline import Pipeline
    spec = compile_ingest([
        {"fail": {"if": "ctx.kind == 'bad'",
                  "message": "bad kind {{kind}}"}},
        {"set": {"field": "seen", "value": "yes"}},
    ])
    out = Pipeline({"processors": spec}).run_local(
        pa.table({"kind": ["ok", "bad"]}))
    rows = {r["kind"]: r for r in out.to_pylist()}
    assert rows["ok"].get("error_message") is None
    assert rows["ok"].get("seen") == "yes"
    assert rows["bad"].get("error_message") == "bad kind bad"
    assert rows["bad"].get("seen") is None   # poisoned: later stages skip
