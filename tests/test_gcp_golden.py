"""gcp module goldens (audit / firewall / vpcflow) — the module's
config/pipeline.js builds a processor.Chain of Convert/AddFields/
Timestamp/CommunityID constructors plus small JS closures; the constructor
CONFIG TABLES are parsed out of the module's own pipeline.js here
(`js_configs`), the closures are hand-ported, and the ingest/pipeline.yml
runs through the generic ES-ingest compiler.  Fixtures and expectations:
x-pack/filebeat/module/gcp/<fs>/test/*-expected.json.
"""
import json
import os
import re

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline

from test_zeek_golden import _terminated_lines, check_golden

GCP = "/root/reference/x-pack/filebeat/module/gcp"

pytestmark = pytest.mark.skipif(not os.path.isdir(GCP),
                                reason="reference not present")


def js_configs(path):
    """{var-or-Add-name: (ProcessorType, config)} for every
    ``new processor.Type({...})`` in a module pipeline.js.  The JS object
    literal is made JSON (strip // comments, quote bare keys, drop
    trailing commas) — values are tables of from/to/type renames."""
    src = open(path).read()
    out = {}
    pat = re.compile(
        r'(?:var\s+(\w+)\s*=\s*|\.Add\("(\w+)",\s*|(\w+):\s*)'
        r'(?:new\s+)?processor\.(\w+)\(\{')
    for m in pat.finditer(src):
        name = m.group(1) or m.group(2) or m.group(3)
        typ = m.group(4)
        # brace-match the config object
        i, depth = m.end() - 1, 0
        while True:
            if src[i] == "{":
                depth += 1
            elif src[i] == "}":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        body = src[m.end() - 1:i + 1]
        body = re.sub(r"//[^\n]*", "", body)
        body = re.sub(r"([,{\[]\s*)([A-Za-z_][A-Za-z0-9_]*)\s*:", r'\1"\2":',
                      body)
        body = re.sub(r",(\s*[}\]])", r"\1", body)
        try:
            cfg = json.loads(body)
        except ValueError:
            continue  # config references a JS variable — hand-ported
        key = name
        n = 2
        while key in out:  # duplicate names (conditional branches)
            key = f"{name}#{n}"
            n += 1
        out[key] = (typ, cfg)
    return out


def convert_stages(cfg, when=None):
    """beats Convert config -> spec entries.  mode=rename moves values of
    ANY type — untyped fields may be maps, so those become rename stages
    with subtree moves; typed fields stay on the convert stage."""
    mode = cfg.get("mode", "copy")
    common = {"ignore_missing": cfg.get("ignore_missing", True),
              "fail_on_error": cfg.get("fail_on_error", False)}
    specs = []
    for f in cfg["fields"]:
        if mode == "rename" and "type" not in f:
            specs.append({"rename": {
                "fields": [{"from": f["from"], "to": f["to"]}],
                "move_subtrees": True, **common}})
        else:
            specs.append({"convert": {"fields": [dict(f)], "mode": mode,
                                      **common}})
    if when is not None:
        specs = [{**s, "when": when} for s in specs]
    return specs


def _py(src):
    return {"script": {"source": "def process(event, params):\n" + "".join(
        "    " + ln + "\n" for ln in src.splitlines()) + "    return event\n"}}


HAS_PREFIX = (
    "def _has(event, prefix):\n"
    "    return any(k.startswith(prefix) and event[k] is not None"
    " for k in event)\n")


def run_gcp(fs, spec, log):
    spec = list(spec)
    spec += compile_ingest(
        load_pipeline_yml(f"{GCP}/{fs}/ingest/pipeline.yml"))
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": "gcp", "event.dataset": f"gcp.{fs}",
        "fileset.name": fs, "input.type": "log", "service.type": "gcp",
        "ecs.version": "1.12.0"}}})
    lines = _terminated_lines(log)
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "tags": pa.array([["forwarded"]] * len(lines),
                         pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(log + "-expected.json"))
    return rows[:len(expected)], expected


DECODE = {"decode_json_fields": {"fields": ["message"], "target": "json",
                                 "keep_arrays": True, "max_depth": 99}}
TS = {"timestamp": {"field": "json.timestamp", "layouts": ["ISO8601"],
                    "target_field": "@timestamp"}}
DROP_MSG = {"drop_fields": {"fields": ["message", "labels"],
                            "ignore_missing": True}}


GO_RENDER = (
    "def _go(v):\n"
    "    if isinstance(v, bool):\n"
    "        return 'true' if v else 'false'\n"
    "    if isinstance(v, dict):\n"
    "        return 'map[' + ' '.join(k + ':' + _go(v[k])"
    " for k in sorted(v)) + ']'\n"
    "    if isinstance(v, list):\n"
    "        return '[' + ' '.join(_go(x) for x in v) + ']'\n"
    "    if isinstance(v, float) and v == int(v):\n"
    "        return str(int(v))\n"
    "    return str(v)\n"
    "def _tree(event, prefix):\n"
    "    out = {}\n"
    "    for k in list(event):\n"
    "        if k.startswith(prefix) and event[k] is not None:\n"
    "            out[k[len(prefix):]] = event[k]\n"
    "            event[k] = None\n"
    "    return out\n")


def _go_map_string(paths):
    """beats Convert type:string over a MAP value renders Go's
    fmt map[k:v ...] (sorted keys) — pre-fold the flattened children."""
    body = GO_RENDER
    for p in paths:
        col = p.replace(".", "_")
        body += (
            f"if event.get('{col}') is None:\n"
            f"    t = _tree(event, '{col}_')\n"
            "    if t:\n"
            f"        event['{col}'] = _go(t)\n")
    return _py(body)


def test_gcp_audit_golden():
    js = js_configs(f"{GCP}/audit/config/pipeline.js")
    spec = [DECODE, TS, DROP_MSG]
    spec += convert_stages(js["saveMetadata"][1])
    spec += convert_stages(js["setCloudMetadata"][1])
    # setOrchestratorMetadata: convert only when resource.type == k8s_cluster
    k8s = {"equals": {"json.resource.type": "k8s_cluster"}}
    spec.append({"set": {"field": "orchestrator.type", "value": "kubernetes",
                         "when": k8s}})
    spec += convert_stages(js["convert_processor"][1], when=k8s)
    spec += convert_stages({"fields": [{"from": "json.protoPayload",
                                        "to": "json"}], "mode": "rename"})
    spec.append(_go_map_string(
        [f["from"] for f in js["convertProtoPayload"][1]["fields"]
         if f.get("type") == "string"]))
    spec += convert_stages(js["convertProtoPayload"][1])
    spec += convert_stages(js["copyFields"][1])
    # dropExtraFields: evt.Delete("json") — the whole container
    spec.append(_py(
        "for k in list(event):\n"
        "    if k == 'json' or k.startswith('json_'):\n"
        "        event[k] = None"))
    # renameNestedFields: snake_case resourceAttributes inside the
    # authorization_info list<struct>
    spec.append(_py(
        "arr = event.get('gcp_audit_authorization_info')\n"
        "if isinstance(arr, list):\n"
        "    for el in arr:\n"
        "        if isinstance(el, dict) and 'resourceAttributes' in el:\n"
        "            el['resource_attributes'] = "
        "el.pop('resourceAttributes')"))
    # setECSCategorization
    spec.append(_py(
        "event['event_kind'] = 'event'\n"
        "code = event.get('gcp_audit_status_code')\n"
        "if code == 0:\n"
        "    event['event_outcome'] = 'success'\n"
        "elif code is None:\n"
        "    ai = event.get('gcp_audit_authorization_info')\n"
        "    if isinstance(ai, list) and len(ai) == 1 and "
        "isinstance(ai[0], dict) and ai[0].get('granted') is True:\n"
        "        event['event_outcome'] = 'success'\n"
        "    elif isinstance(ai, list) and len(ai) == 1 and "
        "isinstance(ai[0], dict) and ai[0].get('granted') is False:\n"
        "        event['event_outcome'] = 'failure'\n"
        "    else:\n"
        "        event['event_outcome'] = 'unknown'\n"
        "else:\n"
        "    event['event_outcome'] = 'failure'"))
    rows, expected = run_gcp("audit", spec,
                             f"{GCP}/audit/test/audit-log-entries.json.log")
    check_golden(rows, expected)


def _firewall_spec():
    js = js_configs(f"{GCP}/firewall/config/pipeline.js")
    spec = [DECODE, TS, DROP_MSG,
            {"add_fields": {"target": "event", "fields": {
                "kind": "event", "category": "network",
                "type": "connection", "action": "firewall-rule"}}}]
    spec += convert_stages(js["saveMetadata"][1])
    spec += convert_stages({"fields": [{"from": "json.jsonPayload",
                                        "to": "json"}], "mode": "rename"})
    # addType: event.type += lowercased disposition
    spec.append(_py(
        "d = event.get('json_disposition')\n"
        "if d is not None:\n"
        "    t = event.get('event_type')\n"
        "    t = list(t) if isinstance(t, list) else "
        "([t] if t is not None else [])\n"
        "    event['event_type'] = t + [d.lower()]"))
    # addDirection mapper INGRESS/EGRESS -> inbound/outbound default unknown
    spec.append(_py(
        "d = event.get('json_rule_details_direction')\n"
        "event['network_direction'] = "
        "{'INGRESS': 'inbound', 'EGRESS': 'outbound'}.get(d, 'unknown')"))
    eg = {"equals": {"json.rule_details.direction": "EGRESS"}}
    ing = {"equals": {"json.rule_details.direction": "INGRESS"}}
    spec += convert_stages(js["EGRESS"][1], when=eg)
    spec += convert_stages(js["INGRESS"][1], when=ing)
    spec += convert_stages(js["ianaNumber"][1])
    spec.append(_py(
        "n = event.get('network_iana_number')\n"
        "m = {1: 'icmp', 6: 'tcp', 17: 'udp'}\n"
        "if n in m:\n"
        "    event['network_transport'] = m[n]"))
    spec += convert_stages(js["convertJsonPayload"][1])
    spec.append({"drop_fields": {"fields": [
        "gcp.firewall.connection", "gcp.firewall.dest_location",
        "gcp.firewall.disposition", "gcp.firewall.src_location"],
        "ignore_missing": True}})
    spec.append(_py(  # container deletes need the prefix sweep too
        "for pref in ('gcp_firewall_connection_', 'gcp_firewall_dest_location_',"
        " 'gcp_firewall_src_location_'):\n"
        "    for k in list(event):\n"
        "        if k.startswith(pref):\n"
        "            event[k] = None"))
    spec += convert_stages(js["copyAddressFields"][1])
    # setCloudMetadata's makeConditional branches parse as EGRESS#2/INGRESS#2
    # (the rename conditional owns the first pair)
    spec += convert_stages(js["EGRESS#2"][1], when=eg)
    spec += convert_stages(js["INGRESS#2"][1], when=ing)
    spec.append({"community_id": {
        "fields": {"transport": "network.iana_number"}}})
    spec.append(_py(
        HAS_PREFIX +
        "if _has(event, 'gcp_source_instance_') and "
        "_has(event, 'gcp_destination_instance_'):\n"
        "    event['network_direction'] = 'internal'"))
    spec.append(_py(
        "ip = event.get('source_ip')\n"
        "if ip:\n"
        "    event['network_type'] = 'ipv4' if '.' in ip else 'ipv6'"))
    spec.append({"append": {"field": "related.ip",
                            "value_from": "source.ip"}})
    spec.append({"append": {"field": "related.ip",
                            "value_from": "destination.ip"}})
    return spec


@pytest.mark.parametrize("log", ["test.log", "rare.log"])
def test_gcp_firewall_golden(log):
    rows, expected = run_gcp("firewall", _firewall_spec(),
                             f"{GCP}/firewall/test/{log}")
    check_golden(rows, expected)


def test_gcp_vpcflow_golden():
    js = js_configs(f"{GCP}/vpcflow/config/pipeline.js")
    spec = [DECODE, TS, DROP_MSG]
    spec.append({"add_fields": {"target": "event", "fields": {
        "kind": "event", "category": "network_traffic",
        "type": "flow"}}}) if False else None
    spec += convert_stages(js["categorizeEvent"][1]) \
        if "categorizeEvent" in js and js["categorizeEvent"][0] == "Convert" \
        else [{"add_fields": {"target": js["categorizeEvent"][1]["target"],
                              "fields": js["categorizeEvent"][1]["fields"]}}]
    spec += convert_stages(js["saveMetadata"][1])
    spec += convert_stages({"fields": [{"from": "json.jsonPayload",
                                        "to": "json"}], "mode": "rename"})
    spec += convert_stages(js["convertJsonPayload"][1])
    spec.append(_py(
        "for pref in ('json_connection_', 'json_src_location_',"
        " 'json_dest_location_'):\n"
        "    for k in list(event):\n"
        "        if k.startswith(pref):\n"
        "            event[k] = None"))
    spec += convert_stages(js["copyAddressFields"][1])
    dest = {"equals": {"gcp.vpcflow.reporter": "DEST"}}
    src = {"equals": {"gcp.vpcflow.reporter": "SRC"}}
    spec += convert_stages(js["setCloudFromDestInstance"][1], when=dest)
    spec += convert_stages(js["setCloudFromSrcInstance"][1], when=src)
    spec.append({"community_id": {
        "fields": {"transport": "network.iana_number"}}})
    spec += convert_stages(js["setNetworkBytesPackets"][1])
    spec.append(_py(
        "n = event.get('network_iana_number')\n"
        "if n == '6':\n"
        "    event['network_transport'] = 'tcp'\n"
        "elif n == '17':\n"
        "    event['network_transport'] = 'udp'"))
    spec.append(_py(
        HAS_PREFIX +
        "s = _has(event, 'gcp_source_instance_')\n"
        "d = _has(event, 'gcp_destination_instance_')\n"
        "event['network_direction'] = ('internal' if s and d else"
        " 'outbound' if s else 'inbound' if d else 'unknown')"))
    spec.append(_py(
        "ip = event.get('source_ip')\n"
        "if ip:\n"
        "    event['network_type'] = 'ipv4' if '.' in ip else 'ipv6'"))
    spec.append({"append": {"field": "related.ip",
                            "value_from": "source.ip"}})
    spec.append({"append": {"field": "related.ip",
                            "value_from": "destination.ip"}})
    rows, expected = run_gcp(
        "vpcflow", spec, f"{GCP}/vpcflow/test/vpc-flow-log-entries.json.log")
    check_golden(rows, expected)
