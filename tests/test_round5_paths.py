"""Round-5 verdict items: vectorized rate-limit fold parity, ANN actor
restart safety (no object-store ObjectRef in actor constructors)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from beats_ray.stages.flow import _bucket_fold_keep, rate_limit_groups


def _scalar_fold(ts: np.ndarray, seg_start: np.ndarray,
                 rate: float, burst: float) -> np.ndarray:
    """The pre-round-5 per-row reference fold (flow.py history)."""
    n = len(ts)
    keep = np.zeros(n, dtype=bool)
    lengths = np.diff(np.append(seg_start, n))
    for s, ln in zip(seg_start, lengths):
        tokens, last = burst, ts[s] if ln else 0.0
        for i in range(s, s + ln):
            tokens = min(burst, tokens + (ts[i] - last) * rate)
            last = ts[i]
            if tokens >= 1.0:
                tokens -= 1.0
                keep[i] = True
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("rate,burst", [(0.1, 1.0), (1.0, 5.0), (0.01, 2.0)])
def test_bucket_fold_matches_scalar(seed, rate, burst):
    rng = np.random.default_rng(seed)
    n_seg = rng.integers(1, 40)
    lengths = rng.integers(1, 60, size=n_seg)
    ts_parts, starts, off = [], [], 0
    for ln in lengths:
        gaps = rng.exponential(scale=1.0 / max(rate, 0.01), size=ln)
        gaps[0] = 0.0
        ts_parts.append(np.cumsum(gaps) + rng.uniform(0, 1000))
        starts.append(off)
        off += ln
    ts = np.concatenate(ts_parts)
    seg_start = np.asarray(starts)
    got = _bucket_fold_keep(ts, seg_start, rate, burst)
    want = _scalar_fold(ts, seg_start, rate, burst)
    assert np.array_equal(got, want)


def test_bucket_fold_empty():
    assert _bucket_fold_keep(np.array([]), np.array([], dtype=int),
                             1.0, 1.0).tolist() == []


def test_rate_limit_groups_e2e(ray_session):
    import ray.data as rd
    # 3 keys, one bursty: 10 events in 10s at 6/m should keep ~2
    rows = []
    base = pd.Timestamp("2024-01-01")
    for k, n, step in [("a", 10, 1.0), ("b", 5, 30.0), ("c", 1, 0.0)]:
        for i in range(n):
            rows.append({"k": k, "ts": base + pd.Timedelta(seconds=i * step),
                         "i": i})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = rate_limit_groups(ds, "6/m", ["k"]).to_pandas()
    # scalar reference per key
    df = pd.DataFrame(rows)
    want = 0
    for k, g in df.groupby("k"):
        ts = g["ts"].astype("datetime64[ns]").astype("int64").to_numpy() / 1e9
        want += int(_scalar_fold(ts, np.array([0]), 0.1, 1.0).sum())
    assert len(out) == want
    assert "__rl_bucket" not in out.columns
    # key "b" (30s gaps at 6/m = exactly refill rate) keeps everything
    assert (out["k"] == "b").sum() == 5


def test_knn_actors_restart_safe(ray_session):
    """Round-4 verdict item: ANN actors must survive restart after node loss.
    The fragility was OUR ray.put ObjectRefs captured in actor __init__
    (ray#53727: restart fails once the driver-side ref is dropped).  Fixed by
    capturing the small query/centroid matrices directly in the UDF closure.
    Assert at the serialization layer: pickle the actor class exactly the way
    Ray ships it and verify the payload carries ZERO ObjectRefs — i.e. a
    restarted actor rebuilds from the GCS-backed task spec alone.  (The
    core-worker warning that remains in bench tails is Ray Data INTERNAL: the
    ActorPoolMapOperator itself ray.puts the wrapped UDF and holds a strong
    ref for the dataset's lifetime — safe, upstream ray#53727 noise.)"""
    import ray.data as rd
    from ray import cloudpickle
    from beats_ray.functions.similarity import knn_brute, make_score_cls

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(200, 16))
    q = vecs[:3]
    qu = q / np.linalg.norm(q, axis=1, keepdims=True)

    cls = make_score_cls(qu, 5, "vec_id", "embedding")
    payload = cloudpickle.dumps(cls)
    assert b"ObjectRef" not in payload and b"_raylet" not in payload
    # a "restarted" actor: rebuild from the pickled spec alone, no driver state
    rebuilt = cloudpickle.loads(payload)()
    tbl = pa.table({"vec_id": pa.array(range(200), pa.int64()),
                    "embedding": pa.array([v.tolist() for v in vecs],
                                          pa.list_(pa.float64()))})
    local = rebuilt(tbl)
    assert local.num_rows == 15  # 3 queries x k=5

    out = knn_brute(rd.from_arrow(tbl), q, k=5)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = unit @ qu.T
    for qi in range(3):
        want = set(np.argsort(-cos[:, qi])[:5].tolist())
        got = {out["vec_id"][i].as_py()
               for i in range(len(out)) if out["query_idx"][i].as_py() == qi}
        assert got == want


def test_resume_grown_input_delta_only(ray_session):
    """Round-4 verdict item 8: resume over GROWN input.  A second run after
    new files appear must (a) process ONLY the appended files — including
    files that grew INTO an already-committed partial tail partition, which
    the old pid-only skip silently dropped — (b) leave every prior output
    file byte-identical, and (c) end with the same totals as a fresh full
    run over the grown input."""
    import glob
    import hashlib
    import shutil

    from beats_ray.state.manifest import run_resumable
    from beats_ray.sources.transcripts import transcripts_path
    from test_e2e import flagship_pipeline

    src = sorted(glob.glob(transcripts_path("sf0.001") + "/*.parquet"))
    assert len(src) >= 5
    in_dir = "/tmp/beats_ray_test/grow_in"
    out_dir = "/tmp/beats_ray_test/grow_out"
    ref_dir = "/tmp/beats_ray_test/grow_ref"
    for d in (in_dir, out_dir, ref_dir):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(in_dir)
    # initial input: 3 files -> partitions [f0,f1], [f2] (fpp=2, tail partial)
    for f in src[:3]:
        shutil.copy(f, in_dir)
    files = sorted(glob.glob(in_dir + "/*.parquet"))
    pipe = flagship_pipeline(broadcast=False)
    total1, ran1, skipped1 = run_resumable(pipe, files, out_dir,
                                           files_per_partition=2)
    assert ran1 == 2 and skipped1 == 0

    def output_hashes():
        return {p: hashlib.sha1(open(p, "rb").read()).hexdigest()
                for p in sorted(glob.glob(out_dir + "/sink=*/*.parquet"))}

    before = output_hashes()
    # grow: two more files; one lands in the committed partial tail
    # partition ([f2] -> [f2, f3]), one opens a new partition ([f4])
    for f in src[3:5]:
        shutil.copy(f, in_dir)
    files = sorted(glob.glob(in_dir + "/*.parquet"))
    total2, ran2, skipped2 = run_resumable(pipe, files, out_dir,
                                           files_per_partition=2)
    # delta of the grown tail + the brand-new partition; the one full
    # committed partition skips
    assert ran2 == 2 and skipped2 == 1, (ran2, skipped2)
    after = output_hashes()
    for p, h in before.items():
        assert after.get(p) == h, f"prior output mutated: {p}"
    # totals equal a fresh full run over the grown input
    total_ref, _, _ = run_resumable(pipe, files, ref_dir,
                                    files_per_partition=2)
    assert total2 == total_ref
    # third run: nothing new -> everything skipped (incl. derived rows)
    total3, ran3, skipped3 = run_resumable(pipe, files, out_dir,
                                           files_per_partition=2)
    assert ran3 == 0 and total3 == total2


def test_resume_rejects_removed_inputs(ray_session):
    import glob
    import shutil

    import pytest as _pytest

    from beats_ray.state.manifest import run_resumable
    from beats_ray.sources.transcripts import transcripts_path
    from test_e2e import flagship_pipeline

    src = sorted(glob.glob(transcripts_path("sf0.001") + "/*.parquet"))
    in_dir = "/tmp/beats_ray_test/shrink_in"
    out_dir = "/tmp/beats_ray_test/shrink_out"
    for d in (in_dir, out_dir):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(in_dir)
    for f in src[:3]:
        shutil.copy(f, in_dir)
    files = sorted(glob.glob(in_dir + "/*.parquet"))
    pipe = flagship_pipeline(broadcast=False)
    run_resumable(pipe, files, out_dir, files_per_partition=2)
    os.remove(files[0])   # mutate beyond append
    files = sorted(glob.glob(in_dir + "/*.parquet"))
    with _pytest.raises(ValueError, match="append-only"):
        run_resumable(pipe, files, out_dir, files_per_partition=2)


def test_ingest_nginx_module_query_oracle(ray_session):
    """The production module-runner compiled query (compile_fileset_spec on
    nginx/access: manifest resolution + Go-template config render + hook
    painless port + module stamps) matches its DuckDB oracle at sf0.001 —
    the same comparison the driver runs at sf0.01."""
    duckdb = pytest.importorskip("duckdb")
    from beats_ray.pipelines.queries import QUERIES, oracle_sql_map

    sf = "/root/testdata/sf0.001"
    res = QUERIES["events_ingest_nginx_module"](sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM read_parquet('{sf}/events.parquet')")
    sql = oracle_sql_map("unused")["events_ingest_nginx_module"]
    odf = con.execute(sql).fetchdf()

    def norm(d):
        cols = sorted(d.columns)
        return d[cols].sort_values(cols).reset_index(drop=True)

    a, b = norm(df), norm(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) > 0
    for c in a.columns:
        assert (a[c].astype(str).values == b[c].astype(str).values).all(), c
    # production-path stamps prove config render + identity splice ran
    assert set(a["event_module"]) == {"nginx"}
    assert set(a["event_dataset"]) == {"nginx.access"}
    assert set(a["ecs_version"]) == {"1.12.0"}


def test_first_public_ip_stage_vectorized():
    """Registered first_public_ip stage (the nginx isPrivate painless,
    vectorized): first non-private wins, all-private falls back to first,
    non-numeric tokens count as public, rows outside the when-mask keep
    their existing target value."""
    from beats_ray.pipeline import Pipeline

    lst = pa.array(
        [["10.1.2.3", "203.0.1.2"],          # private then public -> public
         ["10.1.2.3", "192.168.0.9"],        # all private -> first
         ["172.16.0.1", "172.32.0.1"],       # 172.32 is NOT private -> it
         ["gateway", "10.0.0.1"],            # WORD token parses as public
         ["127.0.0.1"],                      # single private -> itself
         None],                              # no list: when-mask excludes
        pa.list_(pa.string()))
    batch = pa.table({
        "nginx_access_remote_ip_list": lst,
        "source_address": pa.array(
            [None, None, None, None, None, "keep-me"], pa.string())})
    spec = [{"first_public_ip": {
        "field": "nginx.access.remote_ip_list",
        "target": "source.address",
        "when": {"has_fields": ["nginx_access_remote_ip_list"]}}}]
    out = Pipeline({"processors": spec}).run_local(batch)
    assert out.column("source_address").to_pylist() == [
        "203.0.1.2", "10.1.2.3", "172.32.0.1", "gateway", "127.0.0.1",
        "keep-me"]


from hypothesis import given, settings
from hypothesis import strategies as st

_TOKEN = st.one_of(
    # ASCII-only strategies: the stage's real input domain is grok IP/WORD
    # under RE2, where \d and \w are ASCII classes (a Unicode-digit
    # token like "\U00011c51" parses in Python int()/Java parseInt but
    # can never reach the stage)
    st.from_regex(r"\A[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\Z"),
    st.from_regex(r"\A[A-Za-z][A-Za-z0-9_]{0,8}\Z"),
    st.sampled_from(["10.0.0.1", "127.4.5.6", "192.168.1.1", "172.16.0.9",
                     "172.31.255.255", "172.32.0.0", "203.0.113.7",
                     "8.8.8.8", "0.0.0.0", "255.255.255.255"]))


def _scalar_pick(lst):
    """The reference painless fold (nginx pipeline.yml isPrivate script),
    per-row — the implementation the vectorized stage replaced."""
    def private(ip):
        try:
            a, b = int(ip.split(".")[0]), int(ip.split(".")[1])
        except (ValueError, IndexError):
            return False
        return a == 10 or a == 127 or (a == 192 and b == 168) \
            or (a == 172 and 16 <= b <= 31)
    return next((x for x in lst if not private(x)), lst[0])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.lists(_TOKEN, min_size=1, max_size=6),
                min_size=1, max_size=40))
def test_first_public_ip_matches_scalar_fold(rows):
    from beats_ray.stages.network import FirstPublicIP
    batch = pa.table({"remote_ip_list": pa.array(rows,
                                                 pa.list_(pa.string()))})
    out = FirstPublicIP({"field": "remote_ip_list",
                         "target": "picked"}).process(batch)
    assert out.column("picked").to_pylist() == [_scalar_pick(r) for r in rows]


def test_ingest_zeek_dns_js_query_oracle(ray_session):
    """The zeek/dns compiled query — the module's REAL javascript processor
    through mini-JS inside the production compile_fileset_spec chain —
    matches its DuckDB oracle at sf0.001 (same comparison the driver runs
    at sf0.01)."""
    duckdb = pytest.importorskip("duckdb")
    from beats_ray.pipelines.queries import QUERIES, oracle_sql_map

    sf = "/root/testdata/sf0.001"
    res = QUERIES["events_ingest_zeek_dns_js"](sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM read_parquet('{sf}/events.parquet')")
    sql = oracle_sql_map("unused")["events_ingest_zeek_dns_js"]
    odf = con.execute(sql).fetchdf()

    def norm(d):
        cols = sorted(d.columns)
        return d[cols].sort_values(cols).reset_index(drop=True)

    a, b = norm(df), norm(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) > 0
    for c in a.columns:
        assert (a[c].astype(str).values == b[c].astype(str).values).all(), c
    # the JS-computed fields all survive: flags/resolved/duration non-zero
    assert a["sum_flags"].sum() > a["n"].sum()          # RD + some AA/RA
    assert a["max_dur"].max() > 0                       # rtt -> duration
    assert a.loc[a["dns_type"] == "answer", "sum_resolved"].sum() > 0


_UA = st.one_of(
    st.none(),
    st.sampled_from([
        "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like "
        "Gecko) Chrome/120.0 Safari/537.36",
        "curl/7.59.0", "Wget/1.20", "python-requests/2.22.0",
        "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) "
        "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Mobile/15E148"
        " Safari/604.1",
        "-", "", "weird UA (no family)"]),
    st.text(min_size=0, max_size=30))


@settings(max_examples=50, deadline=None)
@given(st.lists(_UA, min_size=1, max_size=60))
def test_user_agent_dict_encode_matches_per_row(vals):
    """The distinct-value (dictionary_encode) fast path emits exactly what
    the per-row path would: parse each value independently and compare."""
    from beats_ray.stages.decode import UserAgent
    stage = UserAgent({"field": "ua", "target_field": "user_agent"})
    batch = pa.table({"ua": pa.array(vals, pa.string())})
    out = stage.process(batch)
    expect = [stage._parse(v) for v in vals]
    keys = ("name", "version", "os_name", "os_version", "os_full",
            "device_name")
    for i, key in enumerate(keys):
        col = "user_agent_" + key
        want = [t[i] for t in expect]
        if all(w is None for w in want):
            assert col not in out.column_names
        else:
            assert out.column(col).to_pylist() == want, key


_URL = st.one_of(
    st.none(),
    st.sampled_from([
        "http://example.com/a/b?x=1#f", "https://u:p@h.io:8443/p.txt",
        "/relative/path/file.tar.gz", "not a url at all", "",
        "ftp://files.example.org/dir/", "http://[::1]:80/x"]),
    st.text(min_size=0, max_size=40))


@settings(max_examples=50, deadline=None)
@given(st.lists(_URL, min_size=1, max_size=60))
def test_uri_parts_dict_encode_matches_per_row(vals):
    """uri_parts' distinct-value path vs an explicit per-row recompute."""
    from urllib.parse import unquote, urlsplit
    from beats_ray.stages.decode import UriParts
    stage = UriParts({"field": "u", "target_field": "url",
                      "keep_original": False})
    out = stage.process(pa.table({"u": pa.array(vals, pa.string())}))

    def one(v):
        if v is None:
            return {k: None for k in ("scheme", "domain", "port", "path")}
        try:
            sp = urlsplit(v)
            try:
                port = sp.port
            except ValueError:
                port = None
            return {"scheme": sp.scheme or None,
                    "domain": sp.hostname or None,
                    "port": port, "path": unquote(sp.path)}
        except ValueError:
            return {k: None for k in ("scheme", "domain", "port", "path")}

    rows = [one(v) for v in vals]
    for k in ("scheme", "domain", "port", "path"):  # stage always writes
        want = [r[k] for r in rows]
        assert out.column("url_" + k).to_pylist() == want, k


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.sampled_from(["www.example.co.uk", "example.com", "com",
                     "a.b.c.example.com.", "localhost", ""]),
    st.from_regex(r"\A[a-z]{1,8}(\.[a-z]{1,8}){0,4}\Z")),
    min_size=1, max_size=60))
def test_registered_domain_dict_encode_matches_per_row(vals):
    from beats_ray.stages.network import RegisteredDomain, registered_domain
    stage = RegisteredDomain({
        "field": "d", "target_field": "rd",
        "target_subdomain_field": "sub", "target_etld_field": "etld"})
    out = stage.process(pa.table({"d": pa.array(vals, pa.string())}))
    rd = [registered_domain(v) for v in vals]
    assert out.column("rd").to_pylist() == rd
    subs, etlds = [], []
    for full, reg in zip(vals, rd):
        if full and reg and full.lower().rstrip(".") != reg \
                and full.lower().rstrip(".").endswith("." + reg):
            subs.append(full.lower().rstrip(".")[: -(len(reg) + 1)])
        else:
            subs.append(None)
        etlds.append(reg.split(".", 1)[1] if reg and "." in reg else None)
    assert out.column("sub").to_pylist() == subs
    assert out.column("etld").to_pylist() == etlds
