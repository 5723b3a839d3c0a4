"""cisco umbrella + ios module goldens.

umbrella: the fileset's ingest/pipeline.yml runs through the generic
ES-ingest compiler over all 4 CSV fixtures (dns/ip/proxy/cloudfirewall —
the pipeline branches on log.file.path, which the harness provides); the
one painless script (identities -> related.user) is hand-ported.

ios: the config/pipeline.js builds a Dissect/Convert chain — the dissect
tokenizer TABLE is parsed out of the module's own pipeline.js; closures
(log level, outcome normalization, categorization) are hand-ported.
"""
import json
import os
import re

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline

from test_zeek_golden import _terminated_lines, check_golden

CISCO = "/root/reference/x-pack/filebeat/module/cisco"

pytestmark = pytest.mark.skipif(not os.path.isdir(CISCO),
                                reason="reference not present")


def _py(src):
    return {"script": {"source": "def process(event, params):\n" + "".join(
        "    " + ln + "\n" for ln in src.splitlines()) + "    return event\n"}}


RELATED_USER = _py(
    "ids = event.get('cisco_umbrella_identities')\n"
    "if isinstance(ids, list):\n"
    "    rel = list(event.get('related_user') or [])\n"
    "    for ident in ids:\n"
    "        if '@' in ident and ident not in rel:\n"
    "            rel.append(ident)\n"
    "    if rel:\n"
    "        event['related_user'] = rel")


@pytest.mark.parametrize("log", [
    "umbrella-dnslogs.log", "umbrella-iplogs.log",
    "umbrella-proxylogs.log", "umbrella-cloudfirewalllogs.log"])
def test_cisco_umbrella_golden(log):
    spec = compile_ingest(
        load_pipeline_yml(f"{CISCO}/umbrella/ingest/pipeline.yml"),
        scripts=[RELATED_USER])
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": "cisco", "event.dataset": "cisco.umbrella",
        "fileset.name": "umbrella", "input.type": "log",
        "service.type": "cisco"}}})
    logp = f"{CISCO}/umbrella/test/{log}"
    lines = _terminated_lines(logp)
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "log_file_path": pa.array([logp] * len(lines), pa.string()),
        "tags": pa.array([["cisco-umbrella", "forwarded"]] * len(lines),
                         pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    expected = json.load(open(logp + "-expected.json"))
    # golden arrays are sorted by the harness — align on the raw line
    rows = sorted(out.to_pylist(),
                  key=lambda r: str(r.get("event_original")))
    expected = sorted(expected, key=lambda e: str(e.get("event.original")))
    check_golden(rows[:len(expected)], expected)


IOS_JS = f"{CISCO}/ios/config/pipeline.js"


def _ios_dissect_table():
    """{event.code: tokenizer} from the module's own pipeline.js."""
    src = open(IOS_JS).read()
    table = {}
    for m in re.finditer(
            r'"(\w+)":\s*newDissect\(((?:"[^"]*"\s*\+?\s*)+)\)', src):
        code = m.group(1)
        pattern = "".join(re.findall(r'"([^"]*)"', m.group(2)))
        table[code] = pattern
    # the IPv6 aliases: accessListMessagePatterns.ACCESSLOGP = ...IPACCESSLOGP
    for m in re.finditer(
            r'accessListMessagePatterns\.(\w+)\s*=\s*'
            r'accessListMessagePatterns\.(\w+)', src):
        table[m.group(1)] = table[m.group(2)]
    return table


IOS_LEVELS = {0: "emergencies", 1: "alerts", 2: "critical", 3: "errors",
              4: "warnings", 5: "notifications", 6: "informational",
              7: "debugging"}


def test_cisco_ios_golden():
    table = _ios_dissect_table()
    assert len(table) >= 9
    has_code = lambda c: {"equals": {"event.code": c}}  # noqa: E731
    spec = [
        {"copy_fields": {"fields": [
            {"from": "message", "to": "event.original"}],
            "ignore_missing": True, "fail_on_error": False}},
        # parseSyslogFileHeader (input.type == log)
        {"dissect": {"tokenizer":
                     "%{_tmp.ts->} %{+_tmp.ts} %{+_tmp.ts->} "
                     "%{log.source.address} %{event.sequence}: "
                     "%{_tmp.timestamp}: %{_tmp.message}",
                     "field": "message", "target_prefix": ""}},
        {"convert": {"fields": [{"from": "_tmp.message", "to": "message"}],
                     "mode": "rename", "ignore_missing": True,
                     "fail_on_error": False}},
        {"convert": {"fields": [{"from": "event.sequence", "type": "long"}],
                     "ignore_missing": True}},
        {"timestamp": {"field": "_tmp.timestamp",
                       "layouts": ["%b %e %H:%M:%S.%f", "%b %e %H:%M:%S"],
                       "timezone": "-02:00",
                       "target_field": "@timestamp"}},
        {"drop_fields": {"fields": ["_tmp.ts", "_tmp.timestamp"],
                         "ignore_missing": True}},
        # processMessage header
        {"dissect": {"tokenizer":
                     "%{}%%{cisco.ios.facility}-%{_event_severity}-"
                     "%{event.code}: %{_message}",
                     "field": "message", "target_prefix": ""}},
        {"drop_fields": {"fields": ["message"], "ignore_missing": True}},
        {"convert": {"fields": [{"from": "_message", "to": "message"}],
                     "mode": "rename", "ignore_missing": True,
                     "fail_on_error": False}},
        {"convert": {"fields": [
            {"from": "_event_severity", "to": "event.severity",
             "type": "long"}], "mode": "rename",
            "ignore_missing": True, "fail_on_error": False}},
        _py(f"m = {IOS_LEVELS!r}\n"
            "sev = event.get('event_severity')\n"
            "if sev in m:\n"
            "    event['log_level'] = m[sev]"),
    ]
    for code, pattern in table.items():
        spec.append({"if": has_code(code), "then": [
            {"dissect": {"tokenizer": pattern, "field": "message",
                         "target_prefix": "", "ignore_failure": True}},
            {"convert": {"fields": [
                {"from": "destination.address", "to": "destination.ip",
                 "type": "ip"},
                {"from": "destination.port", "type": "long"},
                {"from": "source.address", "to": "source.ip", "type": "ip"},
                {"from": "source.port", "type": "long"},
                {"from": "source.packets", "type": "long"},
                {"from": "source.packets", "to": "network.packets",
                 "type": "long"}],
                "ignore_missing": True, "fail_on_error": False}},
            _py("o = event.get('event_outcome')\n"
                "if o == 'denied':\n"
                "    event['event_outcome'] = 'deny'\n"
                "elif o == 'permitted':\n"
                "    event['event_outcome'] = 'allow'"),
            _py("ip = event.get('source_ip')\n"
                "if ip:\n"
                "    event['network_type'] = 'ipv4' if '.' in ip "
                "else 'ipv6'"),
            {"append": {"field": "related.ip", "value_from": "source.ip"}},
            {"append": {"field": "related.ip",
                        "value_from": "destination.ip"}},
            _py("event['event_kind'] = 'event'\n"
                "event['event_category'] = ['network']\n"
                "t = event.get('event_type') or []\n"
                "event['event_type'] = list(t) + "
                "['connection', 'firewall']"),
        ]})
    spec.append({"community_id": {}})
    spec += compile_ingest(load_pipeline_yml(
        f"{CISCO}/ios/ingest/pipeline.yml"))
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": "cisco", "event.dataset": "cisco.ios",
        "fileset.name": "ios", "input.type": "log",
        "service.type": "cisco", "event.timezone": "-02:00"}}})
    logp = f"{CISCO}/ios/test/cisco-ios-syslog.log"
    lines = _terminated_lines(logp)
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "tags": pa.array([["cisco-ios", "forwarded"]] * len(lines),
                         pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    expected = json.load(open(logp + "-expected.json"))
    rows = sorted(out.to_pylist(),
                  key=lambda r: str(r.get("event_original")))
    expected = sorted(expected, key=lambda e: str(e.get("event.original")))
    check_golden(rows[:len(expected)], expected)


AMP = f"{CISCO}/amp"


@pytest.mark.skipif(not os.path.isdir(AMP), reason="reference not present")
@pytest.mark.parametrize("log", [f"cisco_amp{i}.ndjson.log"
                                 for i in range(1, 8)])
def test_cisco_amp_golden(log):
    """cisco/amp (all 7 fixtures) — httpjson NDJSON under the json prefix;
    the two network_addresses fold scripts hand-ported, the vulnerability
    CVE foreach and null sweep handled by the compiler."""
    from beats_ray.ingest import load_pipeline_yml
    folds = _py(
        "addrs = event.get('cisco_amp_computer_network_addresses')\n"
        "if isinstance(addrs, list):\n"
        "    rel_ip = list(event.get('related_ip') or [])\n"
        "    rel_mac = list(event.get('cisco_amp_related_mac') or [])\n"
        "    for a in addrs:\n"
        "        if not isinstance(a, dict):\n"
        "            continue\n"
        "        if a.get('ip') and a['ip'] not in rel_ip:\n"
        "            rel_ip.append(a['ip'])\n"
        "        if a.get('mac') and a['mac'] not in rel_mac:\n"
        "            rel_mac.append(a['mac'])\n"
        "    if rel_ip:\n"
        "        event['related_ip'] = rel_ip\n"
        "    if rel_mac:\n"
        "        event['cisco_amp_related_mac'] = rel_mac")
    scripts = [folds, None, None]  # 2nd fold folded into the 1st; sweep no-op
    spec = [
        {"add_fields": {"target": "", "fields": {
            "event.timezone": "-02:00", "ecs.version": "1.12.0"}}},
        {"decode_json_fields": {"fields": ["message"], "target": "json",
                                "keep_arrays": True, "max_depth": 99}},
    ]
    spec += compile_ingest(
        load_pipeline_yml(f"{AMP}/ingest/pipeline.yml"), scripts=scripts)
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": "cisco", "event.dataset": "cisco.amp",
        "fileset.name": "amp", "input.type": "log",
        "service.type": "cisco"}}})
    logp = f"{AMP}/test/{log}"
    # the input uses the event id as the ES document _id — duplicate lines
    # collapse on indexing, so the golden omits them
    lines = list(dict.fromkeys(_terminated_lines(logp)))
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "tags": pa.array([["cisco-amp", "forwarded"]] * len(lines),
                         pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    expected = json.load(open(logp + "-expected.json"))
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    check_golden(rows[:len(expected)], expected)
