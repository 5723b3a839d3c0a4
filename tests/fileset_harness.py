"""Shared golden-via-runner harness: run a reference module fixture through
the PRODUCTION module-runner path (``beats_ray.modules.compile_fileset_spec``
+ ``fileset_reader_opts``) and compare against the module's own
``test/*-expected.json`` golden.

This is the same compile path ``python -m beats_ray module`` uses, so a
passing fixture here proves the fileset's built-in FILESET_HOOKS port (and
the manifest-driven config/pipeline resolution) end-to-end — unlike the
per-module golden tests, which hand-assemble their specs.

The reference's own golden harness quirks reproduced here
(filebeat/fileset/fileset_test.go + libbeat testing conventions):
- ``add_locale`` is faked to a fixed ``-02:00`` (the goldens were generated
  in Etc/GMT+2).
- manifest-default ``tags`` become an input column (the input attaches them
  before processors run).
- expected files are capped at 100 events; rows beyond the cap are sliced.
"""
import json
import os

import pandas as pd
import pyarrow as pa

from beats_ray.modules import compile_fileset_spec, fileset_reader_opts
from beats_ray.pipeline import Pipeline
from beats_ray.stages.flow import _multiline_groups

from test_zeek_golden import check_golden

FB = "/root/reference/filebeat/module"
XP = "/root/reference/x-pack/filebeat/module"


def local_multiline(lines, ml):
    """Reader-level multiline join using the engine's own grouping kernel
    (stages/flow.py _multiline_groups) without a Ray round-trip."""
    txt = pd.Series(lines, dtype=object).fillna("")
    grp, keep = _multiline_groups(
        txt, "pattern", ml["pattern"], bool(ml.get("negate")),
        ml.get("match", "after"), ml.get("flush_pattern"), 1)
    df = pd.DataFrame({"t": list(lines), "g": grp})[keep]
    pos = df.groupby("g").cumcount()
    df = df[pos < int(ml.get("max_lines", 500))]
    return df.groupby("g", sort=True)["t"].agg("\n".join).tolist()


def flatten_expected(doc, prefix=""):
    """new-style NESTED expected docs -> the flat dotted-key shape
    check_golden compares (lists of scalars stay lists; lists of dicts
    stay values)."""
    out = {}
    for k, v in doc.items():
        key = prefix + k
        if isinstance(v, dict):
            out.update(flatten_expected(v, key + "."))
        else:
            out[key] = v
    return out


# ndjson-decoded @timestamp strings -> naive datetime under the golden
# harness's canonical 'ts' key (modules whose pipeline never re-dates)
TS_FIX = [{"script": {"source": (
    "def process(event, params):\n"
    "    from datetime import datetime as _d\n"
    "    v = event.get('@timestamp')\n"
    "    if isinstance(v, str):\n"
    "        dt = _d.fromisoformat(v.replace('Z', '+00:00'))\n"
    "        event['ts'] = dt.replace(tzinfo=None)\n"
    "        event['@timestamp'] = None\n"
    "    return event\n")}}]


def fixtures_of(base, module, fileset, suffix=".log"):
    d = f"{base}/{module}/{fileset}/test"
    return sorted(f[:-len("-expected.json")] for f in os.listdir(d)
                  if f.endswith("-expected.json")) if os.path.isdir(d) else []


def run_fileset_fixture(base, module, fileset, logname, vars=None, skip=(),
                        tz="-02:00", keep_blank=False, comment_prefix=None,
                        extra_cols=None, extra_spec=None, cap=True,
                        expected_transform=None, unordered=False,
                        align_by=None, pre_json=None, log_path_col=False,
                        dedupe_lines=False, extra_cols_by_name=None):
    """Run one fixture end-to-end through compile_fileset_spec and
    check_golden it against its ``-expected.json``."""
    mdir = f"{base}/{module}"
    v = dict(vars or {})
    if extra_spec == "ts_fix":       # string alias usable from CASES tables
        extra_spec = TS_FIX
    if expected_transform == "flatten":
        expected_transform = flatten_expected
    spec, mvars = compile_fileset_spec(mdir, module, fileset, vars=v,
                                       extra_spec=extra_spec)
    if pre_json:
        # structured inputs (httpjson/pubsub/eventhub) hand the pipeline a
        # decoded object under this prefix; the file-input golden simulates
        # that split from the ndjson fixture line
        spec = [{"decode_json_fields": {"fields": ["message"],
                                        "target": pre_json, "max_depth": 99,
                                        "keep_arrays": True}},
                {"drop_fields": {"fields": ["message"],
                                 "ignore_missing": True}}] + spec
    def _fake_locale(p):
        """add_locale -> fixed harness zone, preserving any `when` carried
        in the flattened dotted-key form (elasticsearch/slowlog config)."""
        if not isinstance(p, dict):
            return p
        key = next((k for k in p if k == "add_locale"
                    or k.startswith("add_locale.")), None)
        if key is None:
            return p
        cfg = {"fields": {"event.timezone": tz}}
        if key != "add_locale":
            cfg[key[len("add_locale."):]] = p[key]
        return {"add_locale": cfg}

    spec = [_fake_locale(p) for p in spec]
    opts = fileset_reader_opts(mdir, fileset, v)

    path = f"{mdir}/{fileset}/test/{logname}"
    content = open(path, encoding="utf-8", errors="replace").read()
    raw = content.splitlines()
    if raw and not content.endswith("\n"):
        raw = raw[:-1]
    if not keep_blank:
        raw = [ln for ln in raw if ln.strip()]
    if comment_prefix:
        raw = [ln for ln in raw if not ln.startswith(comment_prefix)]
    lines = local_multiline(raw, opts["multiline"]) if opts["multiline"] \
        else raw
    if dedupe_lines:
        # inputs that use the event id as the ES document _id collapse
        # duplicate lines at indexing time (cisco/amp)
        lines = list(dict.fromkeys(lines))
    if opts["include_lines"] or opts["exclude_lines"]:
        import re
        inc = [re.compile(p) for p in opts["include_lines"]]
        exc = [re.compile(p) for p in opts["exclude_lines"]]
        lines = [ln for ln in lines
                 if (not inc or any(r.search(ln) for r in inc))
                 and not any(r.search(ln) for r in exc)]

    cols = {"message": lines,
            "line_no": pa.array(range(len(lines)), pa.int64())}
    if mvars.get("tags"):
        cols["tags"] = pa.array([list(mvars["tags"])] * len(lines),
                                pa.list_(pa.string()))
    for name, value in (extra_cols or {}).items():
        cols[name] = pa.array([value] * len(lines))
    for sub, named in (extra_cols_by_name or {}).items():
        # fixture-name-keyed input metadata (salesforce event.provider is
        # stamped by the input based on the collection method)
        if sub in logname:
            for name, value in named.items():
                cols[name] = pa.array([value] * len(lines))
    if log_path_col:   # pipelines that branch on log.file.path (umbrella)
        cols["log_file_path"] = pa.array([path] * len(lines), pa.string())
    out = Pipeline({"processors": spec}).run_local(pa.table(cols))
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    if expected_transform:
        expected = [expected_transform(e) for e in expected]
    if unordered:
        # some pre-2019 goldens were generated before the reference harness
        # sorted by log.offset (kibana log.verbose.624): the golden's 100
        # events are an arbitrary subset/order of the input, so align each
        # expected row to a DISTINCT produced row by bipartite matching
        # (sparse expected rows can match several produced rows, so greedy
        # first-fit misassigns)
        assert len(rows) >= len(expected), (len(rows), len(expected))
        n = len(expected)
        cand = []
        for e in expected:
            js = []
            for j, r in enumerate(rows):
                try:
                    check_golden([r], [e], skip=skip)
                    js.append(j)
                except AssertionError:
                    pass
            if not js:
                check_golden([rows[0]], [e], skip=skip)  # raise with detail
            cand.append(js)
        owner = [-1] * len(rows)   # got-row j -> expected i

        def assign(i, seen):
            for j in cand[i]:
                if j in seen:
                    continue
                seen.add(j)
                if owner[j] < 0 or assign(owner[j], seen):
                    owner[j] = i
                    return True
            return False

        for i in sorted(range(n), key=lambda i: len(cand[i])):
            assert assign(i, set()), \
                f"expected row {i} has no unmatched produced row"
        return rows
    if align_by:
        # some goldens EXCLUDE docs the pipeline itself cannot see failing
        # (ES-side indexing rejections, e.g. sophos/xg ambiguous-zone
        # eventtime rows): align each expected row to a produced row by a
        # key both sides carry (event.original via
        # preserve_original_event), dropping unmatched produced rows
        got_key = align_by.replace(".", "_")
        by_key: dict = {}
        for r in rows:
            by_key.setdefault(r.get(got_key), []).append(r)
        aligned = []
        for e in expected:
            cand = by_key.get(e.get(align_by))
            assert cand, f"no row for {str(e.get(align_by))[:80]!r}"
            aligned.append(cand.pop(0))
        check_golden(aligned, expected, skip=skip)
        return aligned
    if cap:
        rows = rows[:len(expected)]
    check_golden(rows, expected, skip=skip)
    return rows
