"""threatintel module goldens — each fileset's ingest/pipeline.yml compiled
by beats_ray.ingest and run over the module's own test fixtures
(x-pack/filebeat/module/threatintel/<fs>/test/*-expected.json).

The file-input config branch does no parsing (the pipeline json-decodes
event.original itself); the harness contributes add_locale (-02:00 in the
reference golden environment), manifest tags, and module/fileset fields.
Painless scripts are hand-ported per fileset (most are the shared
null-value-removal walker, a no-op in the columnar model).
"""
import json
import os

import pyarrow as pa
import pytest

from beats_ray.ingest import (compile_ingest, load_pipeline_yml,
                              manifest_vars)
from beats_ray.pipeline import Pipeline

from test_zeek_golden import _terminated_lines, check_golden

TI = "/root/reference/x-pack/filebeat/module/threatintel"

pytestmark = pytest.mark.skipif(not os.path.isdir(TI),
                                reason="reference not present")


def run_ti(fs, log, scripts=None, overrides=None, decode_to=None):
    vars = manifest_vars(f"{TI}/{fs}/manifest.yml")
    spec = [
        {"add_fields": {"target": "", "fields": {
            "event.timezone": "-02:00", "ecs.version": "1.12.0"}}},
    ]
    if decode_to:  # httpjson-style input: NDJSON decoded under a prefix
        spec += [{"decode_json_fields": {
            "fields": ["message"], "target": decode_to,
            "keep_arrays": True, "max_depth": 99}},
            {"drop_fields": {"fields": ["message"],
                             "ignore_missing": True}}]
    spec += compile_ingest(load_pipeline_yml(f"{TI}/{fs}/ingest/pipeline.yml"),
                           scripts=scripts, overrides=overrides)
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": "threatintel",
        "event.dataset": f"threatintel.{fs}",
        "fileset.name": fs, "input.type": "log",
        "service.type": "threatintel"}}})
    lines = _terminated_lines(log)
    tags = sorted(vars.get("tags") or [])
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "tags": pa.array([tags] * len(lines), pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(log + "-expected.json"))
    return rows[:len(expected)], expected  # goldens truncate at 100 events


# the shared "remove null map values" painless walker -> columnar no-op
NULL_SWEEP = None


def test_threatintel_abuseurl_golden():
    rows, expected = run_ti(
        "abuseurl", f"{TI}/abuseurl/test/abusechurl.ndjson.log",
        scripts=[NULL_SWEEP])
    check_golden(rows, expected)


def test_threatintel_abusemalware_golden():
    rows, expected = run_ti(
        "abusemalware", f"{TI}/abusemalware/test/abusechmalware.ndjson.log",
        scripts=[NULL_SWEEP])
    check_golden(rows, expected)


def test_threatintel_otx_golden():
    rows, expected = run_ti("otx", f"{TI}/otx/test/otx_sample.ndjson.log",
                            scripts=[NULL_SWEEP])
    check_golden(rows, expected)


def test_threatintel_anomali_golden():
    rows, expected = run_ti(
        "anomali", f"{TI}/anomali/test/anomali_limo.ndjson.log",
        scripts=[NULL_SWEEP])
    check_golden(rows, expected)


def test_threatintel_malwarebazaar_golden():
    rows, expected = run_ti(
        "malwarebazaar",
        f"{TI}/malwarebazaar/test/malwarebazaar.ndjson.log",
        scripts=[NULL_SWEEP])
    check_golden(rows, expected)


def _py(src):
    return {"script": {"source": "def process(event, params):\n" + "".join(
        "    " + ln + "\n" for ln in src.splitlines()) + "    return event\n"}}


def _confidence(src_field, dst_field):
    """shared ThreatStream/ThreatQ 0-100 -> None/Low/Med/High bucketing."""
    return _py(
        f"v = event.get('{src_field}')\n"
        "if v is not None:\n"
        f"    event['{dst_field}'] = (\n"
        "        'None' if v <= 0.0 or v > 100.0 else\n"
        "        'Low' if v <= 29.0 else\n"
        "        'Med' if v <= 69.0 else 'High')")


def test_threatintel_anomalithreatstream_golden():
    """threatintel/anomalithreatstream — itype->STIX-type params table read
    from the module's own yml, confidence bucketing, trusted-circle CSV
    split (3 painless scripts hand-ported)."""
    from beats_ray.ingest import load_pipeline_yml
    doc = load_pipeline_yml(f"{TI}/anomalithreatstream/ingest/pipeline.yml")
    itype = next(p["script"]["params"] for p in doc["processors"]
                 if "script" in p and p["script"].get("params"))
    scripts = [
        _py(f"table = {itype!r}\n"
            "m = table.get(event.get('json_itype'))\n"
            "if m is not None:\n"
            "    event['threatintel_indicator_type'] = m"),
        _confidence("json_confidence", "threatintel_indicator_confidence"),
        _py("v = event.get('json_trusted_circle_ids')\n"
            "if isinstance(v, str):\n"
            "    lst = [s for s in v.split(',') if s]\n"
            "    event['json_trusted_circle_ids'] = lst or None"),
    ]
    rows, expected = run_ti(
        "anomalithreatstream",
        f"{TI}/anomalithreatstream/test/generated.log", scripts=scripts,
        decode_to="json")
    check_golden(rows, expected)


def test_threatintel_threatq_golden():
    """threatintel/threatq — score bucketing + sources provider/tlp fold +
    per-attribute dynamic columns (foreach lowercase/gsub/append over
    list<struct>, hand-ported as one script)."""
    from beats_ray.ingest import load_pipeline_yml
    doc = load_pipeline_yml(f"{TI}/threatq/ingest/pipeline.yml")
    procs = doc["processors"]
    fe = [i for i, p in enumerate(procs) if "foreach" in p]
    scripts = [
        _confidence("json_score", "threat_indicator_confidence"),
        _py("srcs = event.get('json_sources')\n"
            "if isinstance(srcs, list) and srcs:\n"
            "    providers, tlps = [], []\n"
            "    for s in srcs:\n"
            "        if s is None:\n"
            "            return event\n"
            "        if isinstance(s, dict):\n"
            "            if s.get('provider') is not None:\n"
            "                providers.append(s['provider'])\n"
            "            if s.get('tlp_name') is not None:\n"
            "                tlps.append(s['tlp_name'])\n"
            "    if tlps:\n"
            "        event['threat_indicator_marking_tlp'] = tlps\n"
            "    if providers:\n"
            "        event['threat_indicator_provider'] = providers"),
        NULL_SWEEP,
    ]
    # foreach #39-41 lowercase/gsub attribute names then append to DYNAMIC
    # threatq.attributes.<name> fields — one row-level fold
    attr = _py(
        "attrs = event.get('json_attributes')\n"
        "if isinstance(attrs, list):\n"
        "    for a in attrs:\n"
        "        if isinstance(a, dict) and a.get('name') is not None:\n"
        "            name = a['name'].lower().replace(' ', '_')\n"
        "            key = 'threatq_attributes_' + name\n"
        "            cur = event.get(key) or []\n"
        "            event[key] = cur + ['' if a.get('value') is None "
        "else a['value']]")
    overrides = {fe[0]: attr, fe[1]: None, fe[2]: None}
    rows, expected = run_ti(
        "threatq", f"{TI}/threatq/test/threatq_sample.ndjson.log",
        scripts=scripts, overrides=overrides, decode_to="json")
    check_golden(rows, expected)


def test_threatintel_misp_golden():
    """threatintel/misp (all 3 fixtures) — the tag stream/filter script
    hand-ported (tags + tlp marking).

    Known flat-model limitation, handled with a park/restore override:
    the Event carries BOTH the literal key ``attribute_count`` and the
    ``Attribute`` map; after flattening, the object-attribute promotion's
    subtree move (misp.attribute -> misp.context.attribute) cannot tell
    ``misp_attribute_count`` (literal) from ``misp_attribute_*`` (map
    children), so the literal column is parked before and restored after
    the promotion pair."""
    from beats_ray.ingest import load_pipeline_yml as _lp
    doc = _lp(f"{TI}/misp/ingest/pipeline.yml")
    promo = [i for i, p in enumerate(doc["processors"])
             if "rename" in p and p["rename"].get("field") == "misp.attribute"
             and p["rename"].get("target_field") == "misp.context.attribute"]
    park = {"rename": {"fields": [
        {"from": "misp.attribute_count", "to": "_tmp.attrcount"}],
        "ignore_missing": True, "fail_on_error": False}}
    promote = {"rename": {"fields": [
        {"from": "misp.attribute", "to": "misp.context.attribute"}],
        "ignore_missing": True, "move_subtrees": True,
        "fail_on_error": False,
        "when": {"has_fields": ["misp.object"]}}}
    restore = {"rename": {"fields": [
        {"from": "_tmp.attrcount", "to": "misp.attribute_count"}],
        "ignore_missing": True, "fail_on_error": False}}
    overrides = {promo[0]: [park, promote, restore]}
    scripts = [
        _py("tag = event.get('misp_tag')\n"
            "if tag is not None:\n"
            "    names = [t.get('name', '').replace('\\\\', '')"
            ".replace('\"', '') for t in tag if isinstance(t, dict)]\n"
            "    event['tags'] = names\n"
            "    event['threat_indicator_marking_tlp'] = ["
            "t[len('tlp:'):] for t in names if t.startswith('tlp:')]"),
        NULL_SWEEP,
    ]
    import glob
    for log in sorted(glob.glob(f"{TI}/misp/test/*.log")):
        rows, expected = run_ti("misp", log, scripts=list(scripts),
                                overrides=overrides, decode_to="json")
        check_golden(rows, expected)
