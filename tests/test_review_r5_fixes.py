"""Regression tests for the round-5 self-review findings: painless ==~
full-match anchoring, on_failure handler compilation isolation, numeric
convert on_failure gating on already-numeric columns, Go-template
empty-string-vs-nil rendering, and follow-scan rotation tolerance."""

import pyarrow as pa

from beats_ray.conditions import compile_condition
from beats_ray.ingest import compile_ingest, painless_condition, \
    render_module_config
from beats_ray.pipeline import Pipeline


# ------------------------------------------------- ==~ full-match anchoring

def test_painless_regex_match_is_anchored_both_ends():
    # painless ==~ is a FULL match; the conditions engine searches
    # substrings, so patterns ending in '.*' still need the leading '^'
    cond = painless_condition("ctx.code ==~ /4[0-9].*/")
    mask = compile_condition(cond).mask(
        pa.table({"code": ["41", "X41", "4", "402x", "14"]}))
    assert mask.to_pylist() == [True, False, False, True, False]


def test_painless_regex_match_trailing_anchor():
    cond = painless_condition("ctx.code ==~ /foo$/")
    mask = compile_condition(cond).mask(
        pa.table({"code": ["foo", "barfoo", "fooz"]}))
    assert mask.to_pylist() == [True, False, False]


def test_painless_regex_plain_pattern_still_full_match():
    cond = painless_condition("ctx.s ==~ /[0-9]{2}/")
    mask = compile_condition(cond).mask(
        pa.table({"s": ["42", "142", "4", "421"]}))
    assert mask.to_pylist() == [True, False, False, False]


# --------------------------------------- on_failure handler ctx isolation

def test_on_failure_handler_does_not_consume_top_level_override():
    # overrides are keyed by position in the TOP-LEVEL processors list; a
    # grok's first on_failure handler compiles at position 0 inside the
    # recursion and must NOT pick up the override for top-level processor 0
    doc = [
        {"set": {"field": "a", "value": "A"}},
        {"grok": {"field": "message", "patterns": ["%{NUMBER:n}"],
                  "on_failure": [
                      {"set": {"field": "fallback", "value": "yes"}}]}},
    ]
    spec = compile_ingest(
        doc, overrides={0: {"set": {"field": "a", "value": "OVERRIDDEN"}}})
    pipe = Pipeline({"processors": spec})
    out = pipe.run_local(pa.table({"message": ["x42", "nope"]}))
    # the top-level override applied once, to processor 0
    assert out.column("a").to_pylist() == ["OVERRIDDEN", "OVERRIDDEN"]
    # the handler kept ITS OWN body (not the override's) and ran only on
    # the row the grok missed
    fb = {r["message"]: r.get("fallback") for r in out.to_pylist()}
    assert fb["nope"] == "yes" and fb["x42"] is None


def test_on_failure_handler_does_not_clobber_ctx_index():
    from beats_ray.ingest import _Ctx
    ctx = _Ctx(None, None, None)
    ctx.index = 7
    child = ctx.handler_ctx()
    child.index = 99
    assert ctx.index == 7
    assert child.overrides == {}


# ------------------------------- numeric convert gate on non-string columns

def test_convert_on_failure_skips_already_numeric_column():
    # a column that arrived numeric (decode_json_fields) casts trivially;
    # the failure handlers must not fire on it
    doc = [{"convert": {"field": "n", "type": "long",
                        "on_failure": [{"set": {"field": "bad",
                                                "value": "fired"}}]}}]
    pipe = Pipeline({"processors": compile_ingest(doc)})
    out = pipe.run_local(pa.table({"n": pa.array([1, 2], pa.int64())}))
    assert "bad" not in out.column_names or \
        out.column("bad").to_pylist() == [None, None]
    # string column: handlers still fire exactly on the failing rows
    out2 = pipe.run_local(pa.table({"n": ["12", "xx"]}))
    m = {r["n"] if isinstance(r.get("n"), str) else r.get("n"):
         r.get("bad") for r in out2.to_pylist()}
    assert "fired" in m.values()


# ------------------------------------- Go template empty-string vs nil vars

def test_render_empty_string_var_renders_empty_not_no_value():
    text = "a: {{ .x }}\nb: {{ .y }}\n"
    out = render_module_config(text, {"x": ""})
    # explicitly-empty var -> '' (Go parity); missing var -> '<no value>'
    assert "a: \n" in out
    assert "b: <no value>" in out


# ---------------------------------------------- follow scan rotation races

def test_follow_count_tolerates_vanished_file(tmp_path):
    # the count pass runs AFTER the sink write; a file rotated away in the
    # gap must not fail the scan (that would duplicate the whole scan's
    # output on re-run) — it counts as 0 lines and the offset still commits
    from beats_ray.pipeline import Pipeline as P
    from beats_ray.state.follow import Registrar, follow_once

    log = tmp_path / "app.log"
    log.write_bytes(b"level=INFO msg=a\nlevel=INFO msg=b\n")
    out = tmp_path / "out"
    pipe = P({"processors": [], "route": {"rules": [], "default": "d",
                                          "target": "sink"}})

    # deterministic rotation-in-the-gap: a pre_transform materializes the
    # raw read (consuming the file's bytes), then deletes the file — the
    # post-write count pass then finds it gone
    def delete_after_read(ds):
        ds = ds.materialize()   # consume the raw bytes NOW
        log.unlink()            # rotate the file away before the count pass
        return ds

    rep = follow_once(pipe, [str(log)], str(out), 0,
                      pre_transforms=[delete_after_read])
    assert rep["files_grown"] == 1
    assert rep["lines"] == 0          # vanished before the count pass
    # the registrar still committed the consumed offset
    reg = Registrar(str(out))
    st = reg.state.get(str(log))
    assert st is not None and st["offset"] == 34


# ------------------------------------------- dedup/similarity scale paths

def test_lsh_hyperplanes_follow_embedding_dims(ray_session):
    # 128-dim embeddings (any dims > 64 crashed the fixed-size allocation)
    import ray.data as rd

    from beats_ray.functions.dedup import embedding_near_dup_lsh
    rng = __import__("numpy").random.default_rng(7)
    base = rng.standard_normal(128)
    vecs = [base + rng.standard_normal(128) * 0.01 for _ in range(6)] + \
        [rng.standard_normal(128) for _ in range(6)]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(12), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64()))}))
    edges = embedding_near_dup_lsh(ds, threshold=0.95).to_pandas()
    # the 6 jittered copies of `base` are mutual near-dups
    assert len(edges) >= 5
    assert set(edges.columns) == {"a", "b", "cos"}


def test_minhash_empty_corpus_all_null_texts(ray_session):
    # every block present but 0 signature rows: concat_tables([]) regression
    import ray.data as rd

    from beats_ray.functions.dedup import minhash_lsh_pairs
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([None, None, None], pa.string())}))
    edges = minhash_lsh_pairs(ds, threshold=0.5)
    out = edges.to_pandas() if hasattr(edges, "to_pandas") else edges.to_pandas()
    assert len(out) == 0


def test_minhash_join_path_empty_returns_dataset(ray_session):
    # join-mode (mode='join') with no band collisions must return a
    # DATASET so connected_components_auto can .materialize() it
    import ray.data as rd

    from beats_ray.functions.dedup import (connected_components_auto,
                                           minhash_lsh_pairs)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta",
                          "one two three four five six seven"],
                         pa.string())}))
    edges = minhash_lsh_pairs(ds, threshold=0.9, mode="join")
    cc = connected_components_auto(edges).to_pandas()
    assert len(cc) == 0


def test_cc_label_propagation_raises_on_non_convergence(ray_session):
    import pytest
    import ray.data as rd

    from beats_ray.functions.dedup import cc_label_propagation
    # a chain 0-1-2-...-7 has diameter 7; 2 rounds cannot converge
    edges = rd.from_arrow(pa.table({
        "a": pa.array(range(7), pa.int64()),
        "b": pa.array(range(1, 8), pa.int64())}))
    with pytest.raises(RuntimeError, match="did not converge"):
        cc_label_propagation(edges, max_rounds=2)
    out = cc_label_propagation(edges, max_rounds=10).to_pandas()
    assert set(out["root"]) == {0}


def test_routed_writer_distinct_payload_same_keys_no_collision(tmp_path):
    from beats_ray.sinks.parquet import RoutedWriter
    w = RoutedWriter(str(tmp_path), sink_col="sink")
    t1 = pa.table({"conv_id": ["c1"], "turn_idx": [0], "text": ["payload A"],
                   "sink": ["s"]})
    t2 = pa.table({"conv_id": ["c1"], "turn_idx": [0], "text": ["payload B"],
                   "sink": ["s"]})
    w(t1)
    w(t2)
    import glob
    files = glob.glob(str(tmp_path / "sink=s" / "*.parquet"))
    assert len(files) == 2   # same keys, different payload -> distinct files


def test_small_groupby_partial_block_missing_key_column(ray_session, monkeypatch):
    # force the distributed merge path; one block lacks the key column
    import ray.data as rd

    import beats_ray.aggregate as ag
    monkeypatch.setattr(ag, "DRIVER_PARTIAL_ROW_LIMIT", 0)
    ds = rd.from_arrow_refs([
        __import__("ray").put(pa.table({"sink": ["a", "a", "b"]})),
        __import__("ray").put(pa.table({"other": [1, 2]})),
    ])
    out = ag.counts_by(ds, ["sink"]).to_pandas()
    got = {(r["sink"] if r["sink"] == r["sink"] else None): r["n"]
           for r in out.to_dict("records")}
    assert got.get("a") == 2 and got.get("b") == 1
    assert got.get(None) == 2   # the key-less block groups under null


# -------------------------------------------- joins / windows / sampling

def test_bucketed_join_keeps_allnull_columns_and_schema(ray_session):
    import ray.data as rd

    from beats_ray.functions.joins import bucketed_join
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "note": pa.array([None, None, None], pa.string())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 3, 4], pa.int64()),
        "v": pa.array(["x", "y", "z"], pa.string())}))
    out = bucketed_join(left, right, on="k", n_buckets=4).to_pandas()
    assert set(out.columns) == {"k", "note", "v"}
    assert sorted(out["k"]) == [2, 3]


def test_bucketed_join_null_keys_do_not_match(ray_session):
    import ray.data as rd

    from beats_ray.functions.joins import bucketed_join
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, None], pa.int64()),
        "lv": pa.array(["a", "b"], pa.string())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, None], pa.int64()),
        "rv": pa.array(["p", "q"], pa.string())}))
    inner = bucketed_join(left, right, on="k", n_buckets=2).to_pandas()
    assert len(inner) == 1 and inner.iloc[0]["lv"] == "a"
    lj = bucketed_join(left, right, on="k", n_buckets=2,
                       how="left").to_pandas()
    # left join keeps the null-key left row with a null right side
    assert len(lj) == 2
    nullrow = lj[lj["lv"] == "b"].iloc[0]
    assert nullrow["rv"] != nullrow["rv"] or nullrow["rv"] is None  # NaN/None


def test_tumbling_window_accepts_ns_timestamps():
    import pandas as pd

    from beats_ray.functions.windows import tumbling_window_assign
    ts = pd.to_datetime(["2024-01-01 00:10:00", "2024-01-01 01:10:00"])
    t = pa.table({"ts": pa.array(ts)})   # timestamp[ns]
    out = tumbling_window_assign(t, "ts", 3600)
    got = out["window_start"].to_pylist()
    assert [g.hour for g in got] == [0, 1] and all(g.minute == 0 for g in got)


def test_sample_modulo_negative_keys_match_sql():
    from beats_ray.stages.base import stage_factory
    st = stage_factory("sample")({"field": "k", "method": "modulo",
                                  "numer": 1, "denom": 10})
    st.setup()
    # SQL: k % 10 < 1 keeps 0, 10, -5?  -5 % 10 = -5 < 1 -> KEPT (DuckDB)
    out = st.apply(pa.table({"k": pa.array([0, 10, -5, 7, None],
                                           pa.int64())}))
    assert sorted(out["k"].to_pylist()) == [-5, 0, 10]


def test_export_shards_distinct_blocks_same_stats_no_collision(tmp_path, ray_session):
    import glob

    import ray
    import ray.data as rd

    from beats_ray.functions.sampling import export_shards
    # two blocks with the SAME (len, min-key, max-key) but different payloads
    b1 = pa.table({"k": pa.array([1, 9], pa.int64()),
                   "v": pa.array(["a", "b"], pa.string())})
    b2 = pa.table({"k": pa.array([1, 9], pa.int64()),
                   "v": pa.array(["c", "d"], pa.string())})
    ds = rd.from_arrow_refs([ray.put(b1), ray.put(b2)])
    counts = export_shards(ds, str(tmp_path), n_shards=1, key="k")
    files = glob.glob(str(tmp_path / "shard-00000" / "*.parquet"))
    assert sum(counts.values()) == 4
    import pyarrow.parquet as pq
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == 4   # no silent overwrite


def test_sessionize_sorted_empty_dataset(ray_session):
    import ray.data as rd

    from beats_ray.functions.sessionize import sessionize_sorted
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us"))}))
    out = sessionize_sorted(ds)
    assert len(out) == 0


def test_ids_to_numpy_null_raises():
    import pytest

    from beats_ray.functions.veclib import ids_to_numpy
    with pytest.raises(ValueError, match="null"):
        ids_to_numpy(pa.array([1, None], pa.int64()))


def test_token_count_bpe_vectorized_matches_findall():
    import re

    from beats_ray.functions.textstats import BPE_RE
    from beats_ray.stages.base import stage_factory
    st = stage_factory("token_count")({"field": "text", "mode": "bpe"})
    st.setup()
    vals = ["hello world 12345 !!", None, "", "a1b2 c,d;e"]
    out = st.apply(pa.table({"text": pa.array(vals, pa.string())}))
    want = [len(re.findall(BPE_RE, v)) if v is not None else None
            for v in vals]
    assert out["text_tokens"].to_pylist() == want


# --------------------------------------- flow / conditions / readers / state

def test_multiline_null_line_and_first_row_fields():
    import pandas as pd

    from beats_ray.stages.base import stage_factory
    # lines NOT starting with non-space (i.e. continuations, incl. the
    # null line -> "") merge into the previous message
    st = stage_factory("multiline")({"type": "pattern", "pattern": r"^\S",
                                     "negate": True,
                                     "match": "after", "field": "message"})
    st.setup()
    batch = pa.table({
        "message": pa.array(["Traceback", None, "  at foo", "next"],
                            pa.string()),
        "level": pa.array([None, "X", "DEBUG", "INFO"], pa.string()),
        "turn_idx": pa.array([0, 1, 2, 3], pa.int64())})
    out = st.apply(batch).to_pylist()
    out.sort(key=lambda r: r["turn_idx"])
    # null line merges as an empty line; merged event keeps the FIRST
    # row's fields (level None), not the first non-null (X/DEBUG)
    assert out[0]["message"] == "Traceback\n\n  at foo"
    assert out[0]["level"] is None
    assert out[1]["message"] == "next" and out[1]["level"] == "INFO"


def test_range_condition_non_numeric_string_is_false():
    from beats_ray.conditions import compile_condition
    cond = compile_condition({"range": {"code": {"gte": 400}}})
    mask = cond.mask(pa.table({"code": ["500", "abc", "100"]}))
    # painless would throw on 'abc' -> guarded processor skipped, not crash
    assert mask.to_pylist() == [False, False, False] or \
        mask.to_pylist() == [True, False, False]


def test_contains_list_of_struct_is_false_not_crash():
    from beats_ray.conditions import compile_condition
    col = pa.array([[{"a": 1}], []],
                   pa.list_(pa.struct([("a", pa.int64())])))
    cond = compile_condition({"contains": {"hosts": "x"}})
    assert cond.mask(pa.table({"hosts": col})).to_pylist() == [False, False]


def test_manifest_tolerates_torn_trailing_line(tmp_path):
    from beats_ray.state.manifest import RunManifest
    man = RunManifest(str(tmp_path))
    man.commit("p1", ["f1"], {}, {"s": 1}, ["o1"])
    with open(man.path, "a") as f:
        f.write('{"partition_id": "p2", "input_f')   # torn mid-append
    done = man.completed()
    assert "p1" in done and "p2" not in done


def test_lookup_enrich_empty_table_no_crash():
    from beats_ray.stages.base import stage_factory
    st = stage_factory("lookup")({"field": "tool", "table": {},
                                  "target_prefix": "t",
                                  "tag_on_failure": ["_miss"]})
    st.setup()
    out = st.apply(pa.table({"tool": ["bash", None]}))
    assert len(out) == 2    # enriches nothing, tags the non-null miss


def test_container_parser_null_log_field():
    from beats_ray.sources.readers import ContainerParser
    p = ContainerParser({"format": "docker"})
    p.setup()
    out = p.process(pa.table({"message": pa.array(
        ['{"log": null, "stream": "stdout", "time": "2024-01-01"}',
         '{"log": "ok\\n", "stream": "stdout", "time": "2024-01-01"}'],
        pa.string())}))
    msgs = out["container_log"].to_pylist()
    assert msgs[0] is None and msgs[1] == "ok"


def test_read_log_lines_strips_utf8_bom(tmp_path, ray_session):
    from beats_ray.sources.readers import read_log_lines
    f = tmp_path / "bom.log"
    f.write_bytes(b"\xef\xbb\xbffirst\nsecond\n")
    rows = read_log_lines([str(f)]).take_all()
    msgs = sorted(r["message"] for r in rows)
    assert msgs == ["first", "second"]


def test_dns_append_and_ttl():
    from beats_ray.stages.base import stage_factory
    st = stage_factory("dns")({"fields": {"ip": "domain"},
                               "table": {"1.1.1.1": "one.example"},
                               "action": "append"})
    st.setup()
    out = st.apply(pa.table({"ip": ["1.1.1.1", "9.9.9.9"],
                             "domain": ["pre.example", "kept.example"]}))
    doms = out["domain"].to_pylist()
    # dns.go actionAppend: old scalar + value -> [old, value]; failure
    # leaves the old value (as a 1-elem list under the typed-column model)
    assert doms[0] == ["pre.example", "one.example"]
    assert doms[1] == ["kept.example"]
    # replace still overwrites
    st2 = stage_factory("dns")({"fields": {"ip": "domain"},
                                "table": {"1.1.1.1": "one.example"},
                                "action": "replace"})
    st2.setup()
    out2 = st2.apply(pa.table({"ip": ["1.1.1.1"],
                               "domain": ["pre.example"]}))
    assert out2["domain"].to_pylist() == ["one.example"]


# ------------------------------------ parser stages (dissect/grok/ts/etc.)

def test_dissect_dtype_partial_failure_keeps_raw_string():
    from beats_ray.stages.base import stage_factory
    st = stage_factory("dissect")({"tokenizer": "%{pid|integer} %{msg}",
                                   "field": "message", "target_prefix": ""})
    st.setup()
    out = st.apply(pa.table({"message": ["123 hello", "abc oops"]}))
    pids = out["pid"].to_pylist()
    # conversion failure keeps the raw string (dissect.go:277-285); a
    # mixed batch falls back to one string column instead of crashing
    assert pids == ["123", "abc"]


def test_dissect_greedy_multichar_delimiter():
    from beats_ray.stages.dissect import CompiledDissector
    # trim modifier forces the per-row walk (not the regex fast path)
    d = CompiledDissector("%{a->}, %{b}", trim_mode="all")
    m = d.dissect("x, , y")
    assert m == {"a": "x", "b": "y"}


def test_dissect_capture_only_tokenizer_fails_empty_like_walk():
    from beats_ray.stages.base import stage_factory
    st = stage_factory("dissect")({"tokenizer": "%{a}", "field": "message",
                                   "target_prefix": "", "ignore_failure": True})
    st.setup()
    out = st.apply(pa.table({"message": pa.array(["hit", "", None],
                                                 pa.string())}))
    import beats_ray.event as ev
    flags = out[ev.FLAGS_COL].to_pylist() if ev.FLAGS_COL in out.column_names \
        else [None] * 3
    # empty and null input FAIL on both engine paths now
    assert out["a"].to_pylist()[0] == "hit"
    assert flags[1] and flags[2]


def test_timestamp_leap_day_yearless_layout():
    from beats_ray.stages.base import stage_factory
    st = stage_factory("timestamp")({"field": "t", "target_field": "ts_out",
                                     "layouts": ["%b %d %H:%M:%S"]})
    st.setup()
    out = st.apply(pa.table({"t": ["Feb 29 12:00:00"]}))
    v = out["ts_out"].to_pylist()[0]
    assert (v.month, v.day) == (2, 29)   # not normalized to Mar 1
    assert v.year == 2024


def test_add_tags_custom_target_scalar_string():
    from beats_ray.stages.base import stage_factory
    st = stage_factory("add_tags")({"tags": ["new"], "target": "custom"})
    st.setup()
    out = st.apply(pa.table({"custom": ["abc"]}))
    assert out["custom"].to_pylist() == [["abc", "new"]]


def test_lowercase_field_name_collision_overwrites():
    from beats_ray.stages.base import stage_factory
    st = stage_factory("lowercase")({"fields": ["Foo"]})
    st.setup()
    out = st.apply(pa.table({"Foo": ["X"], "foo": ["old"]}))
    assert out.column_names.count("foo") == 1
    assert out["foo"].to_pylist() == ["X"]


def test_grok_combined_flag_group_keeps_case_insensitive():
    import re

    from beats_ray.stages.grok import compile_grok
    # the combined (?im) group: m translates to dotall, i must SURVIVE,
    # and the result must stay python-re-compilable (flags at the start)
    p = compile_grok("(?im)HELLO %{WORD:w}", {})[0]
    assert p.startswith("(?si)")
    m = re.search(p, "hello world")
    assert m and m.group("w") == "world"


def test_decode_json_document_id_with_default_target():
    from beats_ray.stages.base import stage_factory
    st = stage_factory("decode_json_fields")({"fields": ["j"],
                                              "document_id": "id"})
    st.setup()
    out = st.apply(pa.table({"j": ['{"id": "d1", "a": 1}']}))
    # default target merges under the field name; the id must still lift
    # into meta_id and be deleted from the decoded output
    assert out["meta_id"].to_pylist() == ["d1"]
    assert "j_id" not in out.column_names
    assert out["j_a"].to_pylist() == [1]


# --------------------------------- sinks / routing / network / syslog / fmt

def test_ndjson_writer_distinct_blocks_no_collision(tmp_path):
    import glob

    from beats_ray.sinks.ndjson import NDJSONWriter
    w = NDJSONWriter(str(tmp_path))
    t1 = pa.table({"conv_id": ["c"], "turn_idx": [0], "text": ["A"],
                   "sink": ["s"]})
    t2 = pa.table({"conv_id": ["c"], "turn_idx": [0], "text": ["B"],
                   "sink": ["s"]})
    w(t1)
    w(t2)
    files = glob.glob(str(tmp_path / "sink=s" / "*.ndjson"))
    assert len(files) == 2


def test_add_id_no_key_columns_is_noop():
    from beats_ray.stages.base import stage_factory
    st = stage_factory("add_id")({"key_fields": ["conv_id", "turn_idx"]})
    st.setup()
    out = st.apply(pa.table({"other": [1, 2]}))
    assert len(out) == 2


def test_syslog_missing_column_and_message_replacement():
    from beats_ray.stages.base import stage_factory
    st = stage_factory("syslog")({"ignore_failure": True})
    st.setup()
    # missing source column: no-op, no KeyError
    assert len(st.apply(pa.table({"x": [1]}))) == 1
    # parsed free text replaces `message` (reader/syslog/message.go:242)
    out = st.apply(pa.table({"message": [
        "<34>Oct 11 22:14:15 host app[1]: hi there", "not syslog"]}))
    msgs = out["message"].to_pylist()
    assert msgs[0] == "hi there"
    assert msgs[1] == "not syslog"   # failed parse keeps the raw line


def test_registered_domain_missing_column_is_noop():
    from beats_ray.stages.base import stage_factory
    st = stage_factory("registered_domain")({"field": "dns.question.name"})
    st.setup()
    assert len(st.apply(pa.table({"x": [1]}))) == 1


def test_selector_empty_render_uses_rule_default():
    from beats_ray.routing import Selector
    sel = Selector([{"index": "%{[x]}", "default": "fb"}])
    out = sel.select(pa.table({"x": pa.array(["", None, "real"],
                                             pa.string())}))
    # select.go fmtSelector.sel: empty AND failed renders both fall back
    # to the rule's own default
    assert out.to_pylist() == ["fb", "fb", "real"]


def test_community_id_null_port_no_id():
    from beats_ray.stages.network import community_id_v1
    assert community_id_v1("10.0.0.1", "10.0.0.2", None, 80, 6) is None
    assert community_id_v1("10.0.0.1", "10.0.0.2", 1234, None, 6) is None
    # explicit 0 still hashes (beats tryToUint accepts it)
    assert community_id_v1("10.0.0.1", "10.0.0.2", 0, 80, 6) is not None


def test_network_direction_malformed_row_cidr_fails_row_only():
    from beats_ray.stages.base import stage_factory
    st = stage_factory("add_network_direction")({
        "source": "src", "destination": "dst", "target": "dir",
        "internal_networks_field": "nets"})
    st.setup()
    out = st.apply(pa.table({
        "src": ["10.0.0.1", "10.0.0.1"],
        "dst": ["8.8.8.8", "8.8.8.8"],
        "nets": [["10.0.0.0/8"], ["not-a-cidr/99"]]}))
    dirs = out["dir"].to_pylist()
    assert dirs[0] == "outbound" and dirs[1] is None


def test_mustache_mixed_escaping_per_token():
    from beats_ray.stages.es_compat import mustache_to_fmtstr
    fs = mustache_to_fmtstr("{{a}}-{{{b}}}")
    out = fs.render(pa.table({"a": ['x"y'], "b": ['p"q']}))
    # double-brace field escapes, triple-brace field stays raw
    assert out.to_pylist() == ['x\\"y-p"q']


def test_date_on_failure_handlers_run_on_failed_rows_only():
    """ES date.on_failure: the doc does not fail; handlers run for exactly
    the rows no format parsed (cisco asa / checkpoint retry pattern:
    remove the bad timezone, re-date without it)."""
    from beats_ray.ingest import compile_ingest
    from beats_ray.pipeline import Pipeline

    spec = compile_ingest([
        {"date": {"field": "src", "formats": ["yyyy-MM-dd HH:mm:ss"],
                  "target_field": "target",
                  "on_failure": [
                      {"set": {"field": "fallback", "value": "yes"}},
                      {"append": {"field": "error.message",
                                  "value": "{{ _ingest.on_failure_message }}"}}]}},
    ])
    out = Pipeline({"processors": spec}).run_local(pa.table({
        "src": ["2024-01-02 03:04:05", "not a date", None]}))
    rows = out.to_pylist()
    good = next(r for r in rows if r.get("src") == "2024-01-02 03:04:05")
    bad = next(r for r in rows if r.get("src") == "not a date")
    missing = next(r for r in rows if r.get("src") is None)
    assert good.get("target") is not None
    assert good.get("fallback") is None and not good.get("error_message")
    # failed parse: handlers ran (flag-gated), message substituted for
    # {{ _ingest.on_failure_message }}
    assert bad.get("target") is None
    assert bad.get("fallback") == "yes"
    assert bad.get("error_message") == ["could not parse time field src"]
    # missing source keeps skip semantics (documented divergence)
    assert missing.get("fallback") is None


def test_foreach_dynamic_set_and_member_transforms_compile():
    """Generic compilation for the remaining reference foreach shapes:
    per-element dynamic set (auditd copy / cyberarkpas CAProperties) and
    per-element member lowercase/gsub (threatintel/threatq)."""
    from beats_ray.ingest import compile_ingest
    from beats_ray.pipeline import Pipeline

    spec = compile_ingest([
        {"foreach": {"field": "json.attributes", "processor": {
            "lowercase": {"field": "_ingest._value.name"}}}},
        {"foreach": {"field": "json.attributes", "processor": {
            "gsub": {"field": "_ingest._value.name",
                     "pattern": " ", "replacement": "_"}}}},
        {"foreach": {"field": "json.attributes", "processor": {
            "set": {"field": "threat.{{_ingest._value.name}}",
                    "value": "{{_ingest._value.value}}"}}}},
    ])
    out = Pipeline({"processors": spec}).run_local(pa.table({
        "json_attributes": pa.array([[
            {"name": "Actor Name", "value": "APT99"},
            {"name": "Score", "value": "7"},
        ]])}))
    row = out.to_pylist()[0]
    assert row.get("threat_actor_name") == "APT99"
    assert row.get("threat_score") == "7"
    names = [e["name"] for e in row["json_attributes"]]
    assert names == ["actor_name", "score"]


def test_syslog_ignore_missing_null_rows_not_poisoned():
    """syslog.go IgnoreMissing: a null source value is a skip, not a parse
    failure (the config key was documented but never read)."""
    from beats_ray.stages.base import stage_factory
    st = stage_factory("syslog")({"ignore_missing": True})
    st.setup()
    out = st.apply(pa.table({"message": pa.array(
        ["<34>Oct 11 22:14:15 host app[42]: hi", None, "not syslog"])}))
    rows = sorted(out.to_pylist(), key=lambda r: str(r.get("message")))
    by_msg = {str(r.get("message")): r for r in rows}
    assert by_msg["hi"].get("error_message") is None
    assert by_msg["None"].get("error_message") is None       # skipped
    assert by_msg["not syslog"].get("error_message") is not None


def test_fnv32a_batch_long_payload_chunked_path():
    """The padded-matrix scatter is O(n*maxlen) bytes; past the 256 MB cap
    it hashes in row slices — same values, bounded memory."""
    import numpy as np
    from beats_ray.sources.readers import fnv32a, fnv32a_batch
    big = pa.array(["y" * 70000] * 8000, pa.string())   # 560 MB padded
    got = fnv32a_batch(big)
    assert len(set(got.tolist())) == 1
    assert int(got[0]) == fnv32a(b"y" * 70000)
    mixed = pa.array(["a", "y" * 70000, ""], pa.string())
    assert [int(x) for x in fnv32a_batch(mixed)] == [
        fnv32a(b"a"), fnv32a(b"y" * 70000), fnv32a(b"")]
