"""syslog / network / flow-control / reader-chain stages."""

import pandas as pd
import pyarrow as pa
import pytest

from beats_ray.stages.base import stage_factory
from beats_ray.stages.network import community_id_v1, registered_domain
from beats_ray.stages.syslog import parse_syslog


def run(name, cfg, batch):
    st = stage_factory(name)(cfg)
    st.setup()
    return st.apply(batch)


# ---------------------------------------------------------------- syslog

def test_syslog_rfc3164():
    out = parse_syslog("<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed")
    assert out["facility_code"] == 4 and out["severity_code"] == 2
    assert out["hostname"] == "mymachine"
    assert out["appname"] == "su" and out["procid"] == "230"
    assert out["message"] == "'su root' failed"
    assert out["ts"] == "2024-10-11T22:14:15"  # pinned year


def test_syslog_rfc5424():
    line = ('<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog '
            '1024 ID47 [exampleSDID@32473 iut="3"] An application event')
    out = parse_syslog(line)
    assert out["version"] == 1
    assert out["appname"] == "evntslog" and out["procid"] == "1024"
    assert out["msgid"] == "ID47"
    assert out["structured_data"].startswith("[exampleSDID")
    assert out["message"] == "An application event"


def test_syslog_stage():
    batch = pa.table({"message": ["<34>Oct 11 22:14:15 host app: hi", "garbage"]})
    out = run("syslog", {"ignore_failure": True}, batch)
    assert out.column("log_syslog_severity_code").to_pylist() == [2, None]
    assert out.column("log_syslog_ts").to_pylist()[0].isoformat() == "2024-10-11T22:14:15"


# ---------------------------------------------------------------- network

def test_community_id_known_vector():
    """Public test vector from the Community ID spec (corelight/community-id-spec)."""
    got = community_id_v1("128.232.110.120", "66.35.250.204", 34855, 80, 6, seed=0)
    assert got == "1:LQU9qZlK+B5F3KDmev6m5PMibrg="
    # symmetric: swapped endpoints hash identically
    assert got == community_id_v1("66.35.250.204", "128.232.110.120", 80, 34855, 6)


def test_community_id_stage():
    batch = pa.table({"source_ip": ["128.232.110.120"], "source_port": [34855],
                      "destination_ip": ["66.35.250.204"], "destination_port": [80],
                      "network_transport": ["tcp"]})
    out = run("community_id", {}, batch)
    assert out.column("network_community_id").to_pylist() == \
        ["1:LQU9qZlK+B5F3KDmev6m5PMibrg="]


def test_registered_domain():
    assert registered_domain("www.example.com") == "example.com"
    assert registered_domain("a.b.example.co.uk") == "example.co.uk"
    assert registered_domain("user.github.io") == "user.github.io"  # suffix=github.io -> +1
    assert registered_domain("com") is None


def test_registered_domain_stage():
    batch = pa.table({"domain": ["www.example.com"]})
    out = run("registered_domain", {"field": "domain", "target_field": "rd",
                                    "subdomain_field": "sub"}, batch)
    assert out.column("rd").to_pylist() == ["example.com"]
    assert out.column("sub").to_pylist() == ["www"]


def test_network_direction():
    batch = pa.table({"source_ip": ["10.0.0.1", "8.8.8.8", "10.0.0.1", "1.1.1.1"],
                      "destination_ip": ["10.0.0.2", "10.0.0.1", "8.8.8.8", "2.2.2.2"]})
    out = run("add_network_direction", {"source": "source.ip",
                                        "destination": "destination.ip"}, batch)
    assert out.column("network_direction").to_pylist() == \
        ["internal", "inbound", "outbound", "external"]


# ---------------------------------------------------------------- flow

def _ts(secs):
    import datetime
    base = datetime.datetime(2024, 1, 1)
    return [base + datetime.timedelta(seconds=s) for s in secs]


def test_rate_limit_stage_event_time():
    batch = pa.table({"k": ["a"] * 5, "ts": pa.array(_ts([0, 0.1, 0.2, 2.0, 2.1]),
                                                     pa.timestamp("us"))})
    out = run("rate_limit", {"limit": "1/s", "fields": ["k"]}, batch)
    # bucket: burst 1 -> t=0 allowed; 0.1/0.2 rejected; refill by t=2 -> allowed; 2.1 rejected
    assert out.column("ts").to_pylist() == _ts([0, 2.0])


def test_rate_limit_groups(ray_session):
    import ray.data as rd
    from beats_ray.stages.flow import rate_limit_groups
    tbl = pa.table({"k": ["a"] * 4 + ["b"] * 4,
                    "ts": pa.array(_ts([0, 0.1, 1.5, 3.0] * 2), pa.timestamp("us"))})
    out = rate_limit_groups(rd.from_arrow(tbl), "1/s", ["k"]).to_pandas()
    assert len(out) == 6  # per key: 0, 1.5, 3.0 survive


def test_script_batch_udf():
    src = """
def process_batch(table, params):
    import pyarrow.compute as pc
    return table.append_column("doubled", pc.multiply(table["n"], params["f"]))
"""
    out = run("script", {"source": src, "params": {"f": 2}},
              pa.table({"n": [1, 2]}))
    assert out.column("doubled").to_pylist() == [2, 4]


def test_script_row_udf_with_drop():
    src = """
def process(event, params):
    if event["n"] % 2 == 0:
        return None
    event["odd"] = True
    return event
"""
    out = run("script", {"source": src}, pa.table({"n": [1, 2, 3]}))
    assert out.column("n").to_pylist() == [1, 3]


def test_dns_mock_and_cache():
    from beats_ray.stages.flow import DNSStage
    st = DNSStage({"fields": {"host": "host_ip"},
                   "table": {"a.example": "1.2.3.4"},
                   "tag_on_failure": ["_dns_fail"]})
    st.setup()
    out = st.apply(pa.table({"host": ["a.example", "b.example", "a.example"]}))
    assert out.column("host_ip").to_pylist() == ["1.2.3.4", None, "1.2.3.4"]
    assert out.column("tags").to_pylist()[1] == ["_dns_fail"]
    assert st.cache_hits == 1  # third lookup hit the cache


def test_multiline_join(ray_session):
    import ray.data as rd
    from beats_ray.stages.flow import multiline_join
    rows = [
        ("c1", 0, "Exception in thread"),
        ("c1", 1, "  at foo.java:1"),
        ("c1", 2, "  at bar.java:2"),
        ("c1", 3, "next message"),
        ("c2", 0, "hello"),
    ]
    tbl = pa.table({"conv_id": [r[0] for r in rows],
                    "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                    "text": [r[2] for r in rows]})
    out = multiline_join(rd.from_arrow(tbl), pattern=r"^\s", match="after") \
        .to_pandas().sort_values(["conv_id", "turn_idx"])
    texts = out["text"].tolist()
    assert texts == ["Exception in thread\n  at foo.java:1\n  at bar.java:2",
                     "next message", "hello"]
    assert out["n_lines"].tolist() == [3, 1, 1]


# ---------------------------------------------------------------- readers

def test_include_message():
    batch = pa.table({"message": ["keep this", "drop that", "keep too"]})
    out = run("include_message", {"patterns": ["^keep"]}, batch)
    assert out.column("message").to_pylist() == ["keep this", "keep too"]


def test_container_parser_docker_and_cri():
    batch = pa.table({"message": [
        '{"log": "hello\\n", "stream": "stdout", "time": "2024-01-01T00:00:00Z"}',
        "2024-01-01T00:00:01Z stderr F world",
        "2024-01-01T00:00:02Z stdout P partial...",
        "not a container line at all",
    ]})
    out = run("container", {}, batch)
    assert out.column("container_log").to_pylist()[:3] == ["hello", "world", "partial..."]
    assert out.column("container_stream").to_pylist()[:3] == ["stdout", "stderr", "stdout"]
    assert out.column("container_partial").to_pylist()[:3] == [False, False, True]
    assert out.column("error_message").to_pylist()[3] is not None


def test_fnv32a_and_partition(ray_session):
    import ray.data as rd
    from beats_ray.sources.readers import fnv32a, partition_by_key
    assert fnv32a(b"") == 2166136261          # FNV-32a offset basis
    assert fnv32a(b"a") == 0xe40c292c         # known FNV-1a vector
    tbl = pa.table({"k": ["x", "y", "x"], "v": [1, 2, 3]})
    out = partition_by_key(rd.from_arrow(tbl), ["k"], 8).to_pandas()
    px = out[out["k"] == "x"]["partition"].unique()
    assert len(px) == 1  # same key -> same partition


def test_parsers_to_processors():
    from beats_ray.sources.readers import parsers_to_processors
    out = parsers_to_processors([
        {"ndjson": {"message_key": "text", "target": "j"}},
        {"include_message": {"patterns": ["x"]}},
        {"syslog": {}},
    ])
    assert "decode_json_fields" in out[0]
    assert out[0]["decode_json_fields"]["fields"] == ["text"]


# ---------------------------------------------------------------- cef

def test_decode_cef():
    line = ("CEF:0|Security|threatmanager|1.0|100|worm successfully stopped|10|"
            "src=10.0.0.1 dst=2.1.2.2 spt=1232 msg=hello\\=world there")
    batch = pa.table({"message": [line, "not cef", None]})
    out = run("decode_cef", {"ignore_failure": True}, batch)
    # version is a string per decode_cef.go:153 (strconv.Itoa)
    assert out.column("cef_version").to_pylist() == ["0", None, None]
    assert out.column("cef_device_vendor").to_pylist()[0] == "Security"
    assert out.column("cef_name").to_pylist()[0] == "worm successfully stopped"
    assert out.column("cef_severity").to_pylist()[0] == "10"
    # extension keys renamed to full names (cef/keys.go) + typed + ECS mapped
    assert out.column("cef_extensions_sourceAddress").to_pylist()[0] == "10.0.0.1"
    assert out.column("cef_extensions_sourcePort").to_pylist()[0] == 1232
    assert out.column("cef_extensions_message").to_pylist()[0] == "hello=world there"
    assert out.column("source_ip").to_pylist()[0] == "10.0.0.1"
    assert out.column("source_port").to_pylist()[0] == 1232
    # message is replaced by the CEF message extension (decode_cef.go ECS)
    assert out.column("message").to_pylist()[0] == "hello=world there"


def test_decode_cef_escaped_pipe_header():
    line = "CEF:0|a\\|b|p|1|id|event name|5|k=v"
    out = run("decode_cef", {}, pa.table({"message": [line]}))
    assert out.column("cef_device_vendor").to_pylist() == ["a|b"]


def test_multiline_stage_batch_local():
    batch = pa.table({"conv_id": ["c1"] * 4 + ["c2"],
                      "turn_idx": pa.array([0, 1, 2, 3, 0], pa.int32()),
                      "text": ["Error happened", "  at a.py:1", "  at b.py:2",
                               "next", "hello"]})
    out = run("multiline", {"pattern": r"^\s", "match": "after"}, batch)
    d = {(r["conv_id"], r["turn_idx"]): r for r in out.to_pylist()}
    assert d[("c1", 0)]["text"] == "Error happened\n  at a.py:1\n  at b.py:2"
    assert d[("c1", 0)]["n_lines"] == 3
    assert d[("c1", 3)]["text"] == "next"
    assert d[("c2", 0)]["text"] == "hello"


def test_multiline_stage_respects_conv_boundary():
    # continuation line at the start of a new conv must NOT merge across convs
    batch = pa.table({"conv_id": ["a", "b"],
                      "turn_idx": pa.array([0, 0], pa.int32()),
                      "text": ["head", "  continuation-looking"]})
    out = run("multiline", {"pattern": r"^\s", "match": "after"}, batch)
    assert len(out) == 2
