"""timestamp / convert / decode_* / fingerprint / enrich unit vectors
(FIXTURES.md F3)."""

import base64
import gzip
import hashlib

import pyarrow as pa
import pytest

from beats_ray.stages.base import stage_factory


def run(name, cfg, batch):
    st = stage_factory(name)(cfg)
    st.setup()
    return st.apply(batch)


# ---------------------------------------------------------------- timestamp

def test_timestamp_layout_cascade():
    batch = pa.table({"t": ["2024-06-01T10:00:00Z", "01/Jun/2024 10:00:00", "junk"]})
    out = run("timestamp", {"field": "t", "target_field": "parsed",
                            "layouts": ["%Y-%m-%dT%H:%M:%SZ", "%d/%b/%Y %H:%M:%S"],
                            "ignore_failure": False}, batch)
    vals = out.column("parsed").to_pylist()
    assert vals[0].isoformat() == "2024-06-01T10:00:00"
    assert vals[1].isoformat() == "2024-06-01T10:00:00"
    assert vals[2] is None
    assert out.column("error_message").to_pylist()[2] is not None


def test_timestamp_unix():
    batch = pa.table({"t": ["1717236000", "1717236000.5"]})
    out = run("timestamp", {"field": "t", "target_field": "p", "layouts": ["UNIX"]}, batch)
    v = out.column("p").to_pylist()
    assert v[0].isoformat() == "2024-06-01T10:00:00"
    assert v[1].isoformat() == "2024-06-01T10:00:00.500000"


def test_timestamp_unix_ms():
    batch = pa.table({"t": [1717236000123]})
    out = run("timestamp", {"field": "t", "target_field": "p", "layouts": ["UNIX_MS"]}, batch)
    assert out.column("p").to_pylist()[0].isoformat() == "2024-06-01T10:00:00.123000"


def test_timestamp_zero_year_pinned():
    batch = pa.table({"t": ["Jun  1 10:00:00"]})
    out = run("timestamp", {"field": "t", "target_field": "p",
                            "layouts": ["%b %d %H:%M:%S"]}, batch)
    # strptime %d doesn't accept the double-space day-pad; expect failure OR
    # pinned year when parseable — use single-space form to assert the rule:
    batch = pa.table({"t": ["Jun 01 10:00:00"]})
    out = run("timestamp", {"field": "t", "target_field": "p",
                            "layouts": ["%b %d %H:%M:%S"]}, batch)
    assert out.column("p").to_pylist()[0].year == 2024


# ---------------------------------------------------------------- convert

def test_convert_types():
    batch = pa.table({"s": ["42", "x", None]})
    out = run("convert", {"fields": [{"from": "s", "to": "n", "type": "long"}],
                          "fail_on_error": False}, batch)
    assert out.column("n").to_pylist() == [42, None, None]


def test_convert_rename_mode():
    batch = pa.table({"s": ["1.5"]})
    out = run("convert", {"fields": [{"from": "s", "to": "f", "type": "double"}],
                          "mode": "rename"}, batch)
    assert "s" not in out.column_names
    assert out.column("f").to_pylist() == [1.5]


def test_convert_fail_on_error_sets_error():
    batch = pa.table({"s": ["nope"]})
    out = run("convert", {"fields": [{"from": "s", "to": "n", "type": "integer"}]}, batch)
    assert out.column("error_message").to_pylist()[0] is not None


def test_convert_boolean_and_ip():
    batch = pa.table({"b": ["True", "f"], "ip": ["10.1.2.3", "999.1.1.1"]})
    out = run("convert", {"fields": [{"from": "b", "type": "boolean"}],
                          "fail_on_error": False}, batch)
    assert out.column("b").to_pylist() == [True, False]
    out = run("convert", {"fields": [{"from": "ip", "type": "ip"}],
                          "fail_on_error": False}, batch)
    # convert.go !failOnError: a failed conversion leaves the original
    # value in place (the event continues unchanged), it does NOT null it
    assert out.column("ip").to_pylist() == ["10.1.2.3", "999.1.1.1"]


# ---------------------------------------------------------------- decode

def test_decode_json_fields_flatten_and_id():
    batch = pa.table({"j": ['{"a": 1, "b": {"c": "x"}, "id": "d1"}', "notjson", None]})
    out = run("decode_json_fields", {"fields": ["j"], "target": "", "max_depth": 2,
                                     "document_id": "id", "add_error_key": True}, batch)
    assert out.column("a").to_pylist() == [1, None, None]
    assert out.column("b_c").to_pylist() == ["x", None, None]
    assert out.column("meta_id").to_pylist() == ["d1", None, None]
    assert out.column("error_message").to_pylist()[1] is not None


def test_decode_json_max_depth_keeps_nested_as_string():
    batch = pa.table({"j": ['{"a": {"b": {"c": 1}}}']})
    out = run("decode_json_fields", {"fields": ["j"], "target": "", "max_depth": 1}, batch)
    assert out.column("a").to_pylist() == ['{"b":{"c":1}}']


def test_decode_csv():
    batch = pa.table({"c": ['a,"b,c",d', None]})
    out = run("decode_csv_fields", {"fields": {"c": "parsed"}}, batch)
    assert out.column("parsed").to_pylist() == [["a", "b,c", "d"], None]


def test_decode_base64():
    val = base64.b64encode(b"hello").decode()
    batch = pa.table({"f": [val, "!!!bad"]})
    out = run("decode_base64_field", {"field": {"from": "f", "to": "out"},
                                      "fail_on_error": False}, batch)
    assert out.column("out").to_pylist()[0] == "hello"


def test_decompress_gzip():
    blob = gzip.compress(b"payload")
    batch = pa.table({"g": pa.array([blob], pa.binary())})
    out = run("decompress_gzip_field", {"field": {"from": "g", "to": "out"}}, batch)
    assert out.column("out").to_pylist() == ["payload"]


def test_detect_mime():
    batch = pa.table({"b": ['{"k":1}', "plain text", "<html>"]})
    out = run("detect_mime_type", {"field": "b", "target": "mime"}, batch)
    assert out.column("mime").to_pylist() == [
        "application/json", "text/plain; charset=utf-8", "text/html"]


def test_decode_xml():
    batch = pa.table({"x": ["<Root><A>1</A><B attr='z'>2</B></Root>", "<bad"]})
    out = run("decode_xml", {"field": "x", "target_field": "xml",
                             "ignore_failure": True}, batch)
    assert out.column("xml_root_a").to_pylist() == ["1", None]


def test_urldecode():
    batch = pa.table({"u": ["a%20b%2Fc"]})
    out = run("urldecode", {"fields": [{"from": "u", "to": "d"}]}, batch)
    assert out.column("d").to_pylist() == ["a b/c"]


def test_decode_duration():
    batch = pa.table({"d": ["1h30m", "250ms", "junk"]})
    out = run("decode_duration", {"field": "d", "format": "seconds"}, batch)
    assert out.column("d").to_pylist()[0] == pytest.approx(5400.0)
    assert out.column("d").to_pylist()[1] == pytest.approx(0.25)
    assert out.column("d").to_pylist()[2] is None


# ---------------------------------------------------------------- fingerprint

def test_fingerprint_byte_exact():
    """|k|v|k|v| + trailing | exactly (fingerprint.go:93-116)."""
    batch = pa.table({"b": ["y"], "a": ["x"]})
    out = run("fingerprint", {"fields": ["b", "a"], "target_field": "fp"}, batch)
    expected = hashlib.sha256(b"|a|x|b|y|").hexdigest()  # fields sorted
    assert out.column("fp").to_pylist() == [expected]


def test_fingerprint_methods_encodings():
    batch = pa.table({"a": ["x"]})
    out = run("fingerprint", {"fields": ["a"], "method": "md5",
                              "encoding": "base64", "target_field": "fp"}, batch)
    expected = base64.b64encode(hashlib.md5(b"|a|x|").digest()).decode()
    assert out.column("fp").to_pylist() == [expected]


def test_fingerprint_int_and_ts_formatting():
    import datetime
    ts = datetime.datetime(2024, 1, 1, 0, 9, 58, 778549)
    batch = pa.table({"n": [42], "t": pa.array([ts], pa.timestamp("us"))})
    out = run("fingerprint", {"fields": ["n", "t"], "target_field": "fp"}, batch)
    payload = b"|n|42|t|2024-01-01 00:09:58.778549 +0000 UTC|"
    assert out.column("fp").to_pylist() == [hashlib.sha256(payload).hexdigest()]


def test_fingerprint_missing_field_error():
    batch = pa.table({"a": ["x"]})
    out = run("fingerprint", {"fields": ["zz"], "target_field": "fp"}, batch)
    assert out.column("error_message").to_pylist()[0] is not None


def test_add_id_deterministic():
    batch = pa.table({"conv_id": ["c1"], "turn_idx": [3]})
    out1 = run("add_id", {}, batch)
    out2 = run("add_id", {}, batch)
    assert out1.column("meta_id").to_pylist() == out2.column("meta_id").to_pylist()


# ---------------------------------------------------------------- enrich

def test_lookup_enrich_and_tag_on_failure():
    batch = pa.table({"tool": ["bash", "editor", None]})
    out = run("lookup", {"field": "tool",
                         "table": {"bash": {"category": "shell"}},
                         "target_prefix": "tool",
                         "tag_on_failure": ["_miss"]}, batch)
    assert out.column("tool_category").to_pylist() == ["shell", None, None]
    tags = out.column("tags").to_pylist()
    assert tags[1] == ["_miss"] and tags[0] is None and tags[2] is None


def test_cache_put_get():
    from beats_ray.stages.enrich import CacheStage
    put = CacheStage({"put": {"key_field": "k", "value_field": "v"}})
    get = CacheStage({"get": {"key_field": "k", "target_field": "cached"}})
    get.store = put.store  # same actor state
    put.process(pa.table({"k": ["a"], "v": [1]}))
    out = get.process(pa.table({"k": ["a", "b"]}))
    assert out.column("cached").to_pylist() == [1, None]


def test_constant_enrich():
    out = run("add_host_metadata", {}, pa.table({"a": [1]}))
    assert out.column("host_name").to_pylist() == ["rayworker"]


def test_add_formatted_index():
    batch = pa.table({"ds": ["logs"], "ns": ["prod"]})
    out = run("add_formatted_index", {"index": "%{[ds]}-%{[ns]}"}, batch)
    assert out.column("meta_raw_index").to_pylist() == ["logs-prod"]


def test_timestamp_iso8601_layout_with_fraction():
    batch = pa.table({"t": ["2016-12-09T12:08:33.335060Z",
                            "2024-06-01T10:00:00Z",
                            "2024-06-01T12:00:00.5+02:00",
                            "junk"]})
    out = run("timestamp", {"field": "t", "target_field": "p",
                            "layouts": ["ISO8601"], "ignore_failure": True}, batch)
    v = out.column("p").to_pylist()
    assert v[0].isoformat() == "2016-12-09T12:08:33.335060"
    assert v[1].isoformat() == "2024-06-01T10:00:00"
    assert v[2].isoformat() == "2024-06-01T10:00:00.500000"  # offset -> UTC
    assert v[3] is None


# ---------------------------------------------------------------- uri_parts

def test_uri_parts_full_and_relative():
    batch = pa.table({"url_original": [
        "https://u:p@ex.com:8080/a/b.js?q=1#frag",
        "/docs/x.html?y=2", None]})
    out = run("uri_parts", {"field": "url.original"}, batch)
    assert out.column("url_scheme").to_pylist() == ["https", None, None]
    assert out.column("url_domain").to_pylist() == ["ex.com", None, None]
    assert out.column("url_port").to_pylist() == [8080, None, None]
    assert out.column("url_path").to_pylist() == ["/a/b.js", "/docs/x.html", None]
    assert out.column("url_query").to_pylist() == ["q=1", "y=2", None]
    assert out.column("url_extension").to_pylist() == ["js", "html", None]
    assert out.column("url_username").to_pylist() == ["u", None, None]
