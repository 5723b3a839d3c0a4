"""Condition language — libbeat/conditions semantics on Arrow masks."""

import pyarrow as pa

from beats_ray.conditions import compile_condition

BATCH = pa.table({
    "role": ["user", "assistant", "tool", None],
    "n": [1, 5, 10, 3],
    "text": ["hello world", "goodbye", "hello ray", None],
    "ip": ["10.0.0.5", "8.8.8.8", "127.0.0.1", None],
})


def m(cfg):
    return compile_condition(cfg).mask(BATCH).to_pylist()


def test_equals():
    assert m({"equals": {"role": "user"}}) == [True, False, False, False]
    assert m({"equals": {"n": 5}}) == [False, True, False, False]


def test_equals_missing_field():
    assert m({"equals": {"nope": "x"}}) == [False] * 4


def test_contains():
    assert m({"contains": {"text": "hello"}}) == [True, False, True, False]


def test_regexp():
    assert m({"regexp": {"text": "^h.*d$"}}) == [True, False, False, False]


def test_range():
    assert m({"range": {"n": {"gte": 3, "lt": 10}}}) == [False, True, False, True]
    assert m({"range": {"n.gt": 4}}) == [False, True, True, False]


def test_has_fields():
    assert m({"has_fields": ["role", "text"]}) == [True, True, True, False]
    assert m({"has_fields": ["absent"]}) == [False] * 4


def test_network():
    assert m({"network": {"ip": ["10.0.0.0/8"]}}) == [True, False, False, False]
    assert m({"network": {"ip": ["private"]}}) == [True, False, False, False]
    assert m({"network": {"ip": ["loopback"]}}) == [False, False, True, False]


def test_combinators():
    assert m({"and": [{"equals": {"role": "user"}}, {"range": {"n": {"lt": 2}}}]}) == \
        [True, False, False, False]
    assert m({"or": [{"equals": {"role": "user"}}, {"equals": {"role": "tool"}}]}) == \
        [True, False, True, False]
    assert m({"not": {"equals": {"role": "user"}}}) == [False, True, True, True]


def test_implicit_and_of_multiple_keys():
    assert m({"equals": {"role": "user"}, "range": {"n": {"lte": 1}}}) == \
        [True, False, False, False]


def test_none_is_always_true():
    assert m(None) == [True] * 4
