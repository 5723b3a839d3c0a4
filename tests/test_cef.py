"""decode_cef parity with the reference's own golden file.

Runs every line of x-pack/filebeat/processors/decode_cef/testdata/samples.log
through the decode_cef stage (field=event.original, defaults otherwise —
exactly the harness in decode_cef_test.go:readCEFSamples) and compares the
FULL flattened key set + values against samples.log.golden.json.
"""

import json
import os

import pyarrow as pa
import pytest

from beats_ray.stages.base import stage_factory


def make_stage(name, cfg):
    st = stage_factory(name)(cfg)
    st.setup()
    return st

TESTDATA = "/root/reference/x-pack/filebeat/processors/decode_cef/testdata"
SAMPLES = os.path.join(TESTDATA, "samples.log")
GOLDEN = SAMPLES + ".golden.json"


def _flatten(d, prefix=""):
    for k, v in d.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            yield from _flatten(v, path)
        else:
            yield path, v


def _fmt_ts(dt):
    # libbeat common.Time JSON shape: UTC with millisecond precision
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond // 1000:03d}Z"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference not present")
def test_decode_cef_golden():
    lines = [ln for ln in open(SAMPLES).read().splitlines()
             if ln and not ln.startswith("#")]
    expected = json.load(open(GOLDEN))
    assert len(lines) == len(expected)

    stage = make_stage("decode_cef", {"field": "event.original"})
    out = stage.process(pa.table({"event_original": lines}))
    rows = out.to_pylist()

    import datetime
    for i, (got, exp) in enumerate(zip(rows, expected)):
        exp_flat = dict(_flatten(exp))
        # every golden key must be present with the same value
        for key, want in exp_flat.items():
            if key == "error.message":
                assert got.get("error_message") == want, (i, key)
                continue
            col = key.replace(".", "_")
            assert col in got, (i, "missing column", key)
            val = got[col]
            assert val is not None, (i, key)
            if isinstance(val, datetime.datetime):
                val = _fmt_ts(val)
            if isinstance(want, float) or isinstance(val, float):
                assert float(val) == pytest.approx(float(want)), (i, key)
            else:
                assert val == want, (i, key, val, want)
        # and we must not invent extra fields the reference didn't emit.
        # @timestamp (ts) lands on beat.Event.Timestamp in Go, which the
        # golden does not marshal — it must mirror deviceReceiptTime.
        exp_cols = {("error_message" if k == "error.message"
                     else k.replace(".", "_")) for k in exp_flat}
        got_cols = {k for k, v in got.items() if v is not None} - {"ts"}
        assert got_cols == exp_cols, (i, got_cols ^ exp_cols)
        if got.get("ts") is not None:
            assert _fmt_ts(got["ts"]) == \
                exp_flat["cef.extensions.deviceReceiptTime"], (i, "@timestamp")


def test_decode_cef_basic():
    line = ("CEF:0|Security|threatmanager|1.0|100|worm successfully stopped|"
            "10|src=10.0.0.1 dst=2.1.2.2 spt=1232 msg=hello\\=world there")
    batch = pa.table({"message": [line, "not cef", None]})
    out = make_stage("decode_cef", {"ignore_failure": True}).process(batch)
    r = out.to_pylist()
    assert r[0]["cef_version"] == "0"
    assert r[1]["cef_version"] is None and r[2]["cef_version"] is None
    assert r[0]["cef_device_vendor"] == "Security"
    assert r[0]["cef_name"] == "worm successfully stopped"
    assert r[0]["cef_severity"] == "10"
    assert r[0]["cef_extensions_sourceAddress"] == "10.0.0.1"
    assert r[0]["cef_extensions_sourcePort"] == 1232
    assert r[0]["cef_extensions_message"] == "hello=world there"
    # ECS projection
    assert r[0]["source_ip"] == "10.0.0.1"
    assert r[0]["source_port"] == 1232
    assert r[0]["destination_ip"] == "2.1.2.2"
    assert r[0]["message"] == "hello=world there"  # msg overrides name
    assert r[0]["event_severity"] == 10
    assert "error_message" not in out.column_names  # no failures recorded


def test_decode_cef_hard_failure_poisons():
    batch = pa.table({"message": ["nope"]})
    out = make_stage("decode_cef", {}).process(batch)
    assert "does not contain a CEF header" in \
        out.column("error_message").to_pylist()[0]


def test_decode_cef_escaped_pipe_header():
    line = "CEF:0|a\\|b|p|1|id|event name|5|k=v"
    out = make_stage("decode_cef", {}).process(pa.table({"message": [line]}))
    r = out.to_pylist()[0]
    assert r["cef_device_vendor"] == "a|b"
    assert r["cef_extensions_k"] == "v"


def test_decode_cef_value_slicing():
    # leading space kept, one separator space trimmed, empty final dropped,
    # empty mid-line unmapped kept, empty mid-line mapped dropped
    line = ("CEF:0|v|p|1|c|n|5|msg= lead space  next=x suser= custom= "
            "act=go last=")
    out = make_stage("decode_cef", {}).process(pa.table({"message": [line]}))
    r = out.to_pylist()[0]
    assert r["cef_extensions_message"] == " lead space "  # 2nd sep space kept
    assert r["cef_extensions_next"] == "x"
    assert "cef_extensions_sourceUserName" not in r  # mapped empty -> dropped
    assert r["cef_extensions_custom"] == ""          # unmapped empty -> kept
    assert r["cef_extensions_deviceAction"] == "go"
    assert "cef_extensions_last" not in r            # empty final not pushed


def test_decode_cef_conversion_error():
    line = "CEF:0|v|p|1|c|n|5|dvc=nothost src=1.2.3.4"
    out = make_stage("decode_cef", {}).process(pa.table({"message": [line]}))
    r = out.to_pylist()[0]
    assert r["error_message"] == \
        "error in field 'dvc': value is not a valid IP address"
    assert "cef_extensions_deviceAddress" not in r
    assert r["source_ip"] == "1.2.3.4"
