"""Field-shape processors — table-driven, mirroring actions/*_test.go."""

import pyarrow as pa
import pytest

from beats_ray.pipeline import Pipeline
from beats_ray.stages.base import stage_factory


def run(name, cfg, batch):
    return stage_factory(name)(cfg).apply(batch)


@pytest.fixture
def batch():
    return pa.table({"a": ["x", "y"], "b": [1, 2], "ts": [None, None]})


def test_add_fields(batch):
    out = run("add_fields", {"fields": {"env": "prod", "nested": {"k": 1}}}, batch)
    assert out.column("fields_env").to_pylist() == ["prod", "prod"]
    assert out.column("fields_nested_k").to_pylist() == [1, 1]


def test_add_fields_custom_target(batch):
    out = run("add_fields", {"target": "", "fields": {"top": True}}, batch)
    assert out.column("top").to_pylist() == [True, True]


def test_add_labels(batch):
    out = run("add_labels", {"labels": {"team": "x"}}, batch)
    assert out.column("labels_team").to_pylist() == ["x", "x"]


def test_add_tags_dedup():
    batch = pa.table({"tags": [["a"], None]})
    out = run("add_tags", {"tags": ["a", "b"]}, batch)
    assert out.column("tags").to_pylist() == [["a", "b"], ["a", "b"]]


def test_copy_fields(batch):
    out = run("copy_fields", {"fields": [{"from": "a", "to": "a2"}]}, batch)
    assert out.column("a2").to_pylist() == ["x", "y"]


def test_copy_fields_existing_target_raises(batch):
    with pytest.raises(KeyError):
        run("copy_fields", {"fields": [{"from": "a", "to": "b"}]}, batch)


def test_rename(batch):
    out = run("rename", {"fields": [{"from": "a", "to": "z"}]}, batch)
    assert "a" not in out.column_names and out.column("z").to_pylist() == ["x", "y"]


def test_rename_existing_target_sets_error(batch):
    out = run("rename", {"fields": [{"from": "a", "to": "b"}]}, batch)
    assert out.column("error_message").to_pylist()[0] is not None
    assert "a" in out.column_names  # rollback: nothing renamed


def test_rename_missing_ignore(batch):
    out = run("rename", {"fields": [{"from": "zz", "to": "z"}], "ignore_missing": True}, batch)
    assert out.column_names == batch.column_names


def test_replace(batch):
    out = run("replace", {"fields": [{"field": "a", "pattern": "x", "replacement": "X"}]}, batch)
    assert out.column("a").to_pylist() == ["X", "y"]


def test_truncate_chars():
    batch = pa.table({"t": ["abcdef", "ab"]})
    out = run("truncate_fields", {"fields": ["t"], "max_characters": 3}, batch)
    assert out.column("t").to_pylist() == ["abc", "ab"]


def test_case_value_fold():
    batch = pa.table({"v": ["AbC", None]})
    out = run("lowercase", {"values": ["v"]}, batch)
    assert out.column("v").to_pylist() == ["abc", None]
    out = run("uppercase", {"values": ["v"]}, batch)
    assert out.column("v").to_pylist() == ["ABC", None]


def test_case_field_name_fold():
    batch = pa.table({"AbC": [1]})
    out = run("lowercase", {"fields": ["AbC"]}, batch)
    assert "abc" in out.column_names


def test_drop_fields_protects_ts(batch):
    out = run("drop_fields", {"fields": ["a", "@timestamp"]}, batch)
    assert "a" not in out.column_names and "ts" in out.column_names


def test_include_fields_keeps_ts(batch):
    out = run("include_fields", {"fields": ["b"]}, batch)
    assert set(out.column_names) == {"b", "ts"}


def test_extract_field():
    batch = pa.table({"p": ["a/b/c", "x"]})
    out = run("extract_field", {"field": "p", "separator": "/", "index": 1,
                                "target": "mid"}, batch)
    assert out.column("mid").to_pylist() == ["b", None]
    assert out.column("error_message").to_pylist()[1] is not None


def test_extract_array():
    batch = pa.table({"arr": [["a", "b"], ["c"]]})
    out = run("extract_array", {"field": "arr", "mappings": {"first": 0, "second": 1},
                                "fail_on_error": False}, batch)
    assert out.column("first").to_pylist() == ["a", "c"]
    assert out.column("second").to_pylist() == ["b", None]


def test_move_fields():
    batch = pa.table({"src_a": [1], "src_b": [2], "keep": [3]})
    out = run("move_fields", {"from": "src", "to": "dst_"}, batch)
    assert set(out.column_names) == {"dst_a", "dst_b", "keep"}


def test_drop_event_with_when():
    batch = pa.table({"lvl": ["info", "debug", "error"]})
    out = run("drop_event", {"when": {"equals": {"lvl": "debug"}}}, batch)
    assert sorted(out.column("lvl").to_pylist()) == ["error", "info"]


def test_chain_fusion_single_pass():
    p = Pipeline([
        {"add_fields": {"target": "", "fields": {"k": 1}}},
        {"rename": {"fields": [{"from": "k", "to": "k2"}]}},
        {"drop_event": {"when": {"equals": {"a": "x"}}}},
    ])
    assert len(p.segments) == 1 and p.segments[0][0] == "fused"
    out = p.run_local(pa.table({"a": ["x", "y"]}))
    assert out.column("a").to_pylist() == ["y"]
    assert out.column("k2").to_pylist() == [1]
