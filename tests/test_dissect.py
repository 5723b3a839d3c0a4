"""Dissect conformance — mirrors the reference corpus semantics
(libbeat/processors/dissect/testdata/dissect_tests.json, loaded at
dissect_test.go:140) plus stage-level flag/error behavior."""

import pyarrow as pa
import pytest

from beats_ray.stages.dissect import CompiledDissector, DissectStage

CASES = [
    # (tokenizer, message, expected-dict-or-None-for-failure)
    ('level=%{level} ts=%{timestamp} caller=%{caller} msg="%{message}"',
     'level=info ts=2018-06-27T17:19:13.036579993Z caller=main.go:222 msg="Starting OK" version="(version=2.3.1)"}',
     {"caller": "main.go:222", "level": "info", "message": "Starting OK",
      "timestamp": "2018-06-27T17:19:13.036579993Z"}),
    ("%{day}-%{month}-%{year} %{hour} %{severity} [%{thread_id}] %{origin} %{message}",
     "18-Apr-2018 06:53:20.411 INFO [http-nio-8080-exec-1] org.x.Service Error parsing\n more",
     {"day": "18", "month": "Apr", "year": "2018", "hour": "06:53:20.411",
      "severity": "INFO", "thread_id": "http-nio-8080-exec-1",
      "origin": "org.x.Service", "message": "Error parsing\n more"}),
    ("/var/log/%{key}.log", "foobar", None),
    ("/var/log/%{key}.log", "/var/log/foobar", None),
    ("%{key}", "foobar", {"key": "foobar"}),
    ("%{key1} %{key2}", "foo bar", {"key1": "foo", "key2": "bar"}),
    ("/var/%{key}/log", "/var/foobar/log", {"key": "foobar"}),
    ("/var/%{key}", "/var/foobar/log", {"key": "foobar/log"}),
    ("/var/%{key}/log/%{key1}", "/var/foobar/log/apache", {"key": "foobar", "key1": "apache"}),
    ("/var/%{key}/log/%{key1}.log", "/var/foobar/log/apache.log",
     {"key": "foobar", "key1": "apache"}),
    ("%{+key/3} %{+key/1} %{+key/2}", "1 2 3", {"key": "2 3 1"}),
    ("%{key}-%{+key}-%{+key}", "1-2-3", {"key": "1-2-3"}),
    ("%{?key} %{&key}", "hello world", {"hello": "world"}),
    ("%{} %{key}", "hello world", {"key": "world"}),
    ("%{*key} %{&key}", "hello world", {"hello": "world"}),
    ("%{name},%{addr1},%{addr2},%{addr3},%{city},%{zip}",
     "Jane Doe,4321 Fifth Avenue,,,New York,87432",
     {"name": "Jane Doe", "addr1": "4321 Fifth Avenue", "addr2": "", "addr3": "",
      "city": "New York", "zip": "87432"}),
    ("%{id} %{function->} %{server}", "00000043 ViewReceive     machine-321",
     {"id": "00000043", "function": "ViewReceive", "server": "machine-321"}),
    ("%{id} %{function} %{server->} ", "00000043 ViewReceive machine-321    ",
     {"id": "00000043", "function": "ViewReceive", "server": "machine-321"}),
    ("%{id->} %{function} %{server}", "00000043    ViewReceive machine-321",
     {"id": "00000043", "function": "ViewReceive", "server": "machine-321"}),
    ("{%{a}}{%{b}} %{rest}", "{c}{d} anything", {"a": "c", "b": "d", "rest": "anything"}),
    ("%{class#1}%{month#2}%{day#2}", "A0118", {"class": "A", "month": "01", "day": "18"}),
    ("%{+key/3#1}%{+key/1#1} %{+key/2}", "12 3", {"key": "2 3 1"}),
    ("%{+key/3#1}%{+key/1#1->} %{+key/2}", "12    3", {"key": "2 3 1"}),
    ("%{*key#5}%{&key#5}", "helloworld", {"hello": "world"}),
    ("%{class#1}%{month#2}%{day#2}", "A0118 ", None),
    ("%{key#10}", "foobar", None),
]


@pytest.mark.parametrize("tok,msg,expected", CASES)
def test_corpus(tok, msg, expected):
    assert CompiledDissector(tok).dissect(msg) == expected


@pytest.mark.parametrize("tok,msg,expected",
                         [c for c in CASES if CompiledDissector(c[0]).regex is not None])
def test_regex_fast_path_parity(tok, msg, expected):
    """The vectorized RE2 path must agree with the faithful walk."""
    import re
    d = CompiledDissector(tok)
    m = re.match(d.regex, msg)
    if expected is None:
        assert m is None
    else:
        assert m is not None
        assert m.groupdict() == expected


def test_datatype_conversion():
    d = CompiledDissector("%{n|integer} %{f|float} %{b|boolean} %{ip|ip} %{s}")
    out = d.dissect("42 1.5 true 10.0.0.1 x")
    assert out == {"n": 42, "f": 1.5, "b": True, "ip": "10.0.0.1", "s": "x"}
    # failed conversion keeps the raw string (dissect.go:277-285)
    assert d.dissect("zz 1.5 true 10.0.0.1 x")["zz" if False else "n"] == "zz"


def test_trim_values():
    d = CompiledDissector("%{a},%{b}", trim_mode="all")
    assert d.dissect("  x , y  ") == {"a": "x", "b": "y"}


def test_stage_flags_and_errors():
    batch = pa.table({"message": ["a-1", "bad", None]})
    st = DissectStage({"tokenizer": "%{x}-%{y}", "field": "message"})
    out = st.process(batch)
    assert out.column("dissect_x").to_pylist() == ["a", None, None]
    flags = out.column("log_flags").to_pylist()
    assert flags[1] == ["dissect_parsing_error"]
    errs = out.column("error_message").to_pylist()
    assert errs[0] is None and errs[1] is not None


def test_stage_ignore_failure():
    batch = pa.table({"message": ["nope"]})
    st = DissectStage({"tokenizer": "a=%{a}", "field": "message", "ignore_failure": True})
    out = st.process(batch)
    assert "error_message" not in out.column_names
    assert out.column("log_flags").to_pylist() == [["dissect_parsing_error"]]


def test_empty_string_fails():
    assert CompiledDissector("%{key}").dissect("") is None


def test_aws_vpcflow_via_dissect_config():
    """The x-pack aws_vpcflow parser is a fixed space-delimited format —
    covered by a dissect config (the SURVEY §2.4 'parser = map_batches'
    disposition), with typed conversions."""
    tok = ("%{version|integer} %{account_id} %{interface_id} %{srcaddr|ip} "
           "%{dstaddr|ip} %{srcport|integer} %{dstport|integer} %{protocol|integer} "
           "%{packets|long} %{bytes|long} %{start|long} %{end|long} "
           "%{action} %{log_status}")
    line = ("2 123456789010 eni-1235b8ca123456789 172.31.16.139 172.31.16.21 "
            "20641 22 6 20 4249 1418530010 1418530070 ACCEPT OK")
    out = CompiledDissector(tok).dissect(line)
    assert out["version"] == 2
    assert out["srcaddr"] == "172.31.16.139"
    assert out["srcport"] == 20641 and out["dstport"] == 22
    assert out["bytes"] == 4249
    assert out["action"] == "ACCEPT" and out["log_status"] == "OK"
