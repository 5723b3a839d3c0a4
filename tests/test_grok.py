"""grok stage: pattern library, first-match-wins, types, custom patterns."""

import pyarrow as pa

from beats_ray.stages.base import stage_factory
from beats_ray.stages.grok import compile_grok


def run(name, cfg, batch):
    st = stage_factory(name)(cfg)
    st.setup()
    return st.apply(batch)


def test_compile_nested_patterns():
    pat, meta = compile_grok("%{IP:ip} %{NUMBER:n:int}")
    import re
    m = re.match(pat, "10.0.0.1 42")
    assert m.group("ip") == "10.0.0.1" and m.group("n") == "42"
    assert meta["types"]["n"] == "int"


def test_grok_basic_and_types():
    out = run("grok", {"pattern": "%{WORD:verb} %{NUMBER:code:int} %{GREEDYDATA:rest}"},
              pa.table({"message": ["GET 200 hello world", "nope"]}))
    assert out.column("verb").to_pylist() == ["GET", None]
    assert out.column("code").to_pylist() == [200, None]
    assert out.column("rest").to_pylist() == ["hello world", None]
    assert out.column("log_flags").to_pylist()[1] == ["_grok_parse_failure"]


def test_grok_multiple_patterns_first_match_wins():
    out = run("grok", {"patterns": [
        "%{LOGLEVEL:lvl}: %{GREEDYDATA:msg}",
        "%{GREEDYDATA:msg}",
    ], "ignore_failure": True},
        pa.table({"message": ["ERROR: boom", "just text"]}))
    assert out.column("lvl").to_pylist() == ["ERROR", None]
    assert out.column("msg").to_pylist() == ["boom", "just text"]


def test_grok_custom_pattern_definitions():
    out = run("grok", {"pattern": "%{HEXID:id}",
                       "pattern_definitions": {"HEXID": "[0-9a-f]{8}"}},
              pa.table({"message": ["deadbeef"]}))
    assert out.column("id").to_pylist() == ["deadbeef"]


def test_grok_dotted_field_names_flatten():
    out = run("grok", {"pattern": "%{IP:source.ip}:%{NUMBER:source.port:int}"},
              pa.table({"message": ["1.2.3.4:8080"]}))
    assert out.column("source_ip").to_pylist() == ["1.2.3.4"]
    assert out.column("source_port").to_pylist() == [8080]


def test_grok_timestamp_iso8601_and_httpdate():
    out = run("grok", {"pattern": "%{TIMESTAMP_ISO8601:ts} %{GREEDYDATA:m}",
                       "ignore_failure": True},
              pa.table({"message": ["2024-06-01T10:00:00Z up"]}))
    assert out.column("ts").to_pylist() == ["2024-06-01T10:00:00Z"]
    out = run("grok", {"pattern": r"\[%{HTTPDATE:ts}\]", "ignore_failure": True},
              pa.table({"message": ["[25/Oct/2016:14:49:33 +0200]"]}))
    assert out.column("ts").to_pylist() == ["25/Oct/2016:14:49:33 +0200"]
