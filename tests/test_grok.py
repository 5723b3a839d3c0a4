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


def test_re_linear_safe_screens_catastrophic_patterns():
    # the python-re participation twin must never be built for patterns a
    # backtracking engine can go exponential on (URIPROTO wedged a worker
    # for >30 min on one panw threat row; re holds the GIL mid-match)
    from beats_ray.stages.grok import _re_linear_safe as safe
    # exponential shapes -> rejected
    assert not safe(r"[A-Za-z](?:[A-Za-z0-9+.-]+)+://")   # URIPROTO (X+)+
    assert not safe(r"(?:a+)+$")
    assert not safe(r"(?:a|a)*x")                          # ambiguous branch
    assert not safe(r"(?s)(?:.+\n)+")                      # dotall kills delim
    # delimited / disjoint shapes grok actually uses -> accepted
    assert safe(r"(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}")   # IPV6 segs
    assert safe(r"(?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)*[a-zA-Z$_]")  # JAVACLASS
    assert safe(r"(?P<m>(?:.|\n)*)")                       # GREEDYDATA (?m)
    assert safe(r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}"
                r"(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b")  # HOSTNAME
    assert safe(r"(?:(?:\d\d){1,2})-(?:0?[1-9]|1[0-2])")   # YEAR-MONTHNUM


def test_mandatory_groups_participation():
    from beats_ray.stages.grok import _mandatory_groups as mg
    m = mg(r"\[(?P<a>.*?)\] (?:(?P<b>\d+) )?(?P<c>x|(?P<d>y))")
    assert "a" in m           # top level
    assert "b" not in m       # under a lo=0 repeat
    assert "c" in m           # group wrapping the branch is mandatory
    assert "d" not in m       # inside one branch alternative


def test_grok_participating_empty_capture_stays_set():
    # ES grok parity: a MANDATORY group that captures "" participates and
    # stays "" under empty_to_null; only non-participating empties unset
    # (nginx ingress_controller upstream.alternative_name golden)
    out = run("grok", {"pattern": r"\[%{DATA:name}\] (?:v=%{NUMBER:v} )?end",
                       "anchor": False, "empty_to_null": True,
                       "ignore_failure": True},
              pa.table({"message": ["[] end", "[x] v=3 end"]}))
    assert out.column("name").to_pylist() == ["", "x"]
    assert out.column("v").to_pylist() == [None, "3"]
