"""Regression tests for the round-1 advisor findings (ADVICE.md):
syslog RFC5424 offset normalization, routed-writer file-id collisions,
community_id ICMP equivalence, Convert rollback value preservation,
fingerprint Go %g float rendering."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from beats_ray.sinks.parquet import RoutedWriter
from beats_ray.stages.base import stage_factory
from beats_ray.stages.fingerprint import _go_float_g
from beats_ray.stages.network import community_id_v1
from beats_ray.stages.syslog import _iso, parse_syslog


def run(name, cfg, batch):
    st = stage_factory(name)(cfg)
    st.setup()
    return st.apply(batch)


# ------------------------------------------------- syslog offset handling

def test_iso_positive_offset_converts_to_utc():
    # +02:00 means the instant is 2h EARLIER in UTC
    assert _iso("2003-10-11T22:14:15.003+02:00") == "2003-10-11T20:14:15.003000"


def test_iso_negative_offset_parses():
    assert _iso("2003-10-11T22:14:15-07:00") == "2003-10-12T05:14:15"


def test_iso_zulu_and_nil():
    assert _iso("2003-10-11T22:14:15.003Z") == "2003-10-11T22:14:15.003000"
    assert _iso("-") is None


def test_syslog_stage_offset_ts_not_null():
    line = ("<165>1 2003-10-11T22:14:15.003-07:00 host app 1234 ID47 - hi")
    batch = pa.table({"message": [line]})
    out = run("syslog", {"ignore_failure": True}, batch)
    ts = out.column("log_syslog_ts").to_pylist()[0]
    assert ts is not None
    assert ts.isoformat() == "2003-10-12T05:14:15.003000"
    assert parse_syslog(line)["ts"] == "2003-10-12T05:14:15.003000"


# ------------------------------------------------- routed-writer file ids

def test_routed_writer_no_collision_same_rowcount(tmp_path):
    """Two equal-row-count blocks without key columns must land in two
    distinct files (the old min/max-of-missing-keys id collided)."""
    w = RoutedWriter(str(tmp_path), sink_col="sink", key_cols=("conv_id", "turn_idx"))
    b1 = pa.table({"sink": ["s1", "s1"], "x": [1, 2]})
    b2 = pa.table({"sink": ["s1", "s1"], "x": [3, 4]})
    w(b1)
    w(b2)
    files = glob.glob(os.path.join(str(tmp_path), "sink=s1", "*.parquet"))
    assert len(files) == 2
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == 4


def test_routed_writer_idempotent_rewrite(tmp_path):
    """Identical block content -> identical path (resume overwrites in place)."""
    w = RoutedWriter(str(tmp_path), sink_col="sink", key_cols=("conv_id", "turn_idx"))
    b = pa.table({"sink": ["s1"], "x": [1]})
    p1 = w(b).column("path").to_pylist()
    p2 = w(b).column("path").to_pylist()
    assert p1 == p2
    assert len(glob.glob(os.path.join(str(tmp_path), "sink=s1", "*.parquet"))) == 1


def test_routed_writer_sink_in_id(tmp_path):
    """Same content routed to two sinks -> distinct ids (sink is hashed)."""
    w = RoutedWriter(str(tmp_path), sink_col="sink", key_cols=())
    b = pa.table({"sink": ["a", "b"], "x": [1, 1]})
    man = w(b)
    paths = man.column("path").to_pylist()
    assert len({os.path.basename(p) for p in paths}) == 2


# ------------------------------------------------- community_id ICMP

def test_community_id_icmp_echo_pair_symmetric():
    """Echo (8) and its reply (0) map to the same flow hash; spec vector:
    1:X0snYXpgwiv9TZtqg64sgzUn6Dk= for 192.168.0.89 -> 192.168.0.1 echo."""
    req = community_id_v1("192.168.0.89", "192.168.0.1", None, None, 1,
                          icmp_type=8, icmp_code=0)
    rep = community_id_v1("192.168.0.1", "192.168.0.89", None, None, 1,
                          icmp_type=0, icmp_code=0)
    assert req == rep == "1:X0snYXpgwiv9TZtqg64sgzUn6Dk="


def test_community_id_icmp_one_way_not_reordered():
    """Unknown ICMP type (e.g. 11 time-exceeded) is one-way: endpoints keep
    their direction, so reversing them yields a DIFFERENT id."""
    a = community_id_v1("10.0.0.2", "10.0.0.1", None, None, 1,
                        icmp_type=11, icmp_code=0)
    b = community_id_v1("10.0.0.1", "10.0.0.2", None, None, 1,
                        icmp_type=11, icmp_code=0)
    assert a != b


def test_community_id_stage_reads_icmp_fields():
    batch = pa.table({
        "source_ip": ["192.168.0.89"], "destination_ip": ["192.168.0.1"],
        "network_transport": ["icmp"], "icmp_type": [8], "icmp_code": [0],
    })
    out = run("community_id", {}, batch)
    assert out.column("network_community_id").to_pylist() == \
        ["1:X0snYXpgwiv9TZtqg64sgzUn6Dk="]


# ------------------------------------------------- convert rollback

def test_convert_rollback_preserves_original_on_type_change():
    """fail_on_error + in-place string->long: failed rows keep their
    original string value (convert.go clone-and-restore), ok rows carry the
    converted value rendered in the source type; every failed row is
    error-marked."""
    batch = pa.table({"v": ["5", "abc", "7"]})
    out = run("convert", {"fields": [{"from": "v", "type": "long"}],
                          "fail_on_error": True}, batch)
    assert out.column("v").to_pylist() == ["5", "abc", "7"]
    errs = out.column("error_message").to_pylist()
    assert errs[0] is None and errs[1] is not None and errs[2] is None


def test_convert_no_failure_changes_type():
    batch = pa.table({"v": ["5", "7"]})
    out = run("convert", {"fields": [{"from": "v", "type": "long"}],
                          "fail_on_error": True}, batch)
    assert out.column("v").to_pylist() == [5, 7]
    assert pa.types.is_integer(out.column("v").type)


# ------------------------------------------------- Go %g floats

def test_go_float_g_vectors():
    # Go strconv.FormatFloat(v, 'g', -1, 64) vectors
    cases = [
        (0.0, "0"), (1.0, "1"), (1.5, "1.5"), (100.0, "100"),
        (123456.0, "123456"), (999999.0, "999999"),
        (1000000.0, "1e+06"), (1234567.0, "1.234567e+06"),
        (123456789.0, "1.23456789e+08"),
        (0.0001, "0.0001"), (0.00001, "1e-05"),
        (1e22, "1e+22"), (-2.5, "-2.5"), (-0.0, "-0"),
        (3.14159, "3.14159"), (1e-7, "1e-07"),
    ]
    for v, want in cases:
        assert _go_float_g(v) == want, (v, _go_float_g(v), want)


def test_fingerprint_large_float_uses_go_format():
    batch = pa.table({"f": pa.array([123456789.0], pa.float64())})
    out = run("fingerprint", {"fields": ["f"], "target_field": "fp"}, batch)
    import hashlib
    want = hashlib.sha256(b"|f|1.23456789e+08|").hexdigest()
    assert out.column("fp").to_pylist() == [want]


# ------------------------------------------------- round-5 advisor findings

def test_scatter_allnull_output_preserves_unmasked_rows():
    # ADVICE r4: a conditioned stage emitting an all-null column for the
    # masked subset must NOT wipe existing values on rows outside the mask
    from beats_ray.stages.base import FnStage
    from beats_ray.conditions import compile_condition

    def wipe(t: pa.Table) -> pa.Table:
        return t.set_column(t.column_names.index("x"), "x",
                            pa.nulls(len(t)))

    st = FnStage(wipe, name="wipe")
    st.when = compile_condition({"equals": {"sel": "yes"}})
    batch = pa.table({"sel": ["yes", "no", "yes", "no"],
                      "x": ["a", "b", "c", "d"]})
    out = st.apply(batch)
    rows = {r["sel"] + str(i): r["x"]
            for i, r in enumerate(out.to_pylist())}
    vals = {r["x"] for r in out.to_pylist() if r["sel"] == "no"}
    assert vals == {"b", "d"}, rows
    masked = {r["x"] for r in out.to_pylist() if r["sel"] == "yes"}
    assert masked == {None}


def test_es_set_ignore_empty_keeps_column_type():
    # ADVICE r4: template + ignore_empty_value with nothing to set must not
    # cast an existing int column to string
    st = stage_factory("set")({"field": "n", "template": "%{[missing]}",
                               "ignore_empty_value": True})
    st.setup()
    batch = pa.table({"n": pa.array([1, 2], pa.int64()),
                      "other": ["a", "b"]})
    out = st.apply(batch)
    assert out.column("n").type == pa.int64()
    assert out.column("n").to_pylist() == [1, 2]


def test_painless_startswith_field_arg_raises():
    # ADVICE r4: ctx.a.startsWith(ctx.b) must fail at compile, not emit a
    # never-matching regex
    import pytest as _pytest
    from beats_ray.ingest import PainlessUnsupported, painless_condition
    for meth in ("startsWith", "endsWith", "equalsIgnoreCase"):
        with _pytest.raises(PainlessUnsupported):
            painless_condition(f"ctx.a.{meth}(ctx.b)")


def test_kv_append_merge_stringifies_non_strings():
    # ADVICE r4: pre-existing non-string scalars in the kv target must not
    # raise ArrowInvalid during the append merge
    st = stage_factory("kv")({"field": "msg", "field_split": " ",
                                      "value_split": "=", "prefix": "kv."})
    st.setup()
    batch = pa.table({"msg": ["a=1 a=2", "a=3"],
                      "kv_a": pa.array([7, None], pa.int64())})
    out = st.apply(batch)
    got = out.column("kv_a").to_pylist()
    assert got[0] in (["7", "1", "2"], ["7", "1", "2"],), got
