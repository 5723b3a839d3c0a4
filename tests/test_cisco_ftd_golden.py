"""cisco/ftd module goldens — the SHARED asa-ftd-pipeline.yml (242
processors: 28 groks + 67 per-message-id dissects + kv security events)
rendered with the ftd manifest vars and compiled by beats_ray.ingest; all
fixtures.  The 7 painless scripts are hand-ported with their DATA (the
security-event field mapping generated from security-mappings.csv, the
iana table, the ECS action categorization) read from the module's own yml;
the per-row-timezone date processor is hand-scripted (templated timezone
is the one compiler-unsupported construct).
"""
import datetime as _dt
import glob
import json
import os
import re

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest
from beats_ray.pipeline import Pipeline

from test_zeek_golden import _terminated_lines, check_golden

SHARED = ("/root/reference/x-pack/filebeat/module/cisco/shared/ingest/"
          "asa-ftd-pipeline.yml")
FTD = "/root/reference/x-pack/filebeat/module/cisco/ftd"

pytestmark = pytest.mark.skipif(not os.path.exists(SHARED),
                                reason="reference not present")


def _py(src):
    return {"script": {"source": "def process(event, params):\n" + "".join(
        "    " + ln + "\n" for ln in src.splitlines()) + "    return event\n"}}


def load_shared(prefix="ftd", PREFIX="FTD", log_level=7):
    import yaml
    text = open(SHARED).read()
    vars = {"internal_prefix": prefix, "internal_PREFIX": PREFIX,
            "log_level": str(log_level)}
    text = re.sub(r"\{<\s*\.([A-Za-z_]+)\s*>\}",
                  lambda m: vars.get(m.group(1), "X"), text)
    return yaml.safe_load(text)


def _scripts(doc):
    scr = [p["script"] for p in doc["processors"] if "script" in p]
    sec_map = scr[1]["params"]
    field_map = scr[2]["params"]
    iana = scr[4]["params"]
    actions = scr[5]["params"]

    s0 = _py(
        "pri = event.get('log_syslog_priority')\n"
        "if pri is not None and str(pri).isdigit():\n"
        "    event['log_syslog_severity_code'] = int(pri) & 7\n"
        "    event['log_syslog_facility_code'] = int(pri) >> 3")

    s1 = _py(
        f"params = {sec_map!r}\n"
        "pre = '_temp__orig_security_'\n"
        "counters = {}\n"
        "for k in list(event):\n"
        "    if not k.startswith(pre) or event[k] is None:\n"
        "        continue\n"
        "    param = params.get(k[len(pre):])\n"
        "    if param is None:\n"
        "        continue\n"
        "    for i in param.get('id') or []:\n"
        "        counters[i] = counters.get(i, 0) + 1\n"
        "    val = event[k]\n"
        "    if val == '' or val == []:\n"
        "        continue\n"
        "    for field in param.get('ecs') or []:\n"
        "        col = field.replace('.', '_')\n"
        "        cur = event.get(col)\n"
        "        if cur is None:\n"
        "            event[col] = val\n"
        "        elif isinstance(cur, list):\n"
        "            event[col] = cur + [val]\n"
        "        else:\n"
        "            event[col] = [cur, val]\n"
        "    event['_temp__cisco_security_' + param['target']] = val\n"
        "if event.get('_temp__cisco_message_id') != '':\n"
        "    return event\n"
        "def _jhash(x):\n"
        "    h = 0\n"
        "    for c in x:\n"
        "        h = (31 * h + ord(c)) & 0xFFFFFFFF\n"
        "    return h ^ (h >> 16)\n"
        "cap = 16\n"
        "while len(counters) > 0.75 * cap:\n"
        "    cap *= 2\n"
        "order = sorted(counters, key=lambda k: (_jhash(k) & (cap - 1)))\n"
        "best = None\n"
        "for i in order:  # Java HashMap iteration; first max wins\n"
        "    if best is None or counters[best] < counters[i]:\n"
        "        best = i\n"
        "if best is not None:\n"
        "    event['_temp__cisco_message_id'] = best")

    s2 = _py(
        f"params = {field_map!r}\n"
        "for src_field, param in params.items():\n"
        "    col = src_field.replace('ctx.', '').replace('.', '_')\n"
        "    old = event.get(col)\n"
        "    if old is None or not isinstance(old, str):\n"
        "        continue\n"
        "    new = (param.get('map') or {}).get(old.lower())\n"
        "    if new is not None:\n"
        "        dst = param.get('target', src_field.replace('ctx.', ''))\n"
        "        event[dst.replace('.', '_')] = new")

    s3 = _py(
        "from datetime import timedelta as _td\n"
        "hms = event.get('_temp__duration_hms')\n"
        "ts = event.get('ts')\n"
        "if hms is not None and ts is not None:\n"
        "    cur = total = 0\n"
        "    for c in hms:\n"
        "        if c.isdigit():\n"
        "            cur = cur * 10 + int(c)\n"
        "        elif c == ':':\n"
        "            total = (total + cur) * 60\n"
        "            cur = 0\n"
        "    secs = total + cur\n"
        "    event['event_end'] = ts.strftime('%Y-%m-%dT%H:%M:%S.') + \\\n"
        "        ('%03d' % (ts.microsecond // 1000)) + 'Z'\n"
        "    event['event_duration'] = secs * 10**9\n"
        "    st = ts - _td(seconds=secs)\n"
        "    event['event_start'] = st.strftime('%Y-%m-%dT%H:%M:%S.') + \\\n"
        "        ('%03d' % (st.microsecond // 1000)) + 'Z'")

    s4 = _py(
        f"params = {iana!r}\n"
        "tr = event.get('network_transport')\n"
        "if tr is None:\n"
        "    return event\n"
        "iana = params.get(tr)\n"
        "if iana is not None:\n"
        "    event['network_iana_number'] = iana\n"
        "    return event\n"
        "rev = {str(v): k for k, v in params.items()}\n"
        "if str(tr) in rev:\n"
        "    event['network_iana_number'] = tr\n"
        "    event['network_transport'] = rev[str(tr)]")

    s5 = _py(
        f"params = {actions!r}\n"
        "a = event.get('event_action')\n"
        "if a is None or a not in params:\n"
        "    return event\n"
        "p = params[a]\n"
        "event['event_kind'] = p.get('kind')\n"
        "cat = list(p.get('category') or [])\n"
        "typ = list(p.get('type') or [])\n"
        "out = event.get('event_outcome')\n"
        "if out is None or ('network' not in cat and "
        "'intrusion_detection' not in cat):\n"
        "    if a == 'firewall-rule':\n"
        "        typ.append('info')\n"
        "    elif a.startswith('connection-'):\n"
        "        typ.append('connection')\n"
        "    event['event_category'] = cat\n"
        "    event['event_type'] = typ\n"
        "    return event\n"
        "if out == 'allowed':\n"
        "    event['event_outcome'] = 'success'\n"
        "    typ += ['connection', 'allowed']\n"
        "elif out in ('denied', 'block'):\n"
        "    event['event_outcome'] = 'success'\n"
        "    typ += ['connection', 'denied']\n"
        "elif out == 'dropped':\n"
        "    event['event_outcome'] = 'failure'\n"
        "    typ += ['connection', 'denied']\n"
        "elif a == 'firewall-rule':\n"
        "    typ.append('info')\n"
        "elif a.startswith('connection-'):\n"
        "    typ.append('connection')\n"
        "if event.get('event_outcome') == 'monitored':\n"
        "    cat.append('intrusion_detection')\n"
        "    event['event_outcome'] = 'success'\n"
        "event['event_category'] = cat\n"
        "event['event_type'] = typ")

    return [s0, s1, s2, s3, s4, s5, None]  # final null sweep: columnar no-op


DATE_SCRIPT = _py(
    # the shared pipeline's date uses a TEMPLATED per-row timezone — parse
    # in python with the row's event.timezone (offsets or UTC)
    "from datetime import datetime as _d, timedelta as _td\n"
    "raw = event.get('_temp__raw_date')\n"
    "if raw is None:\n"
    "    return event\n"
    "tz = event.get('event_timezone') or 'UTC'\n"
    "raw = ' '.join(raw.split())\n"
    "dt = None\n"
    "zone_off = None\n"
    "m = __import__('re').match("
    "r'^(.*?)\\s*(Z|[+-]\\d{2}:?\\d{2}|[A-Z]{3,5})?$', raw)\n"
    "base, zone = m.group(1), m.group(2)\n"
    "for fmt in ('%Y-%m-%dT%H:%M:%S', '%Y-%m-%d %H:%M:%S',\n"
    "            '%b %d %H:%M:%S %Y', '%b %d %Y %H:%M:%S',\n"
    "            '%a %b %d %H:%M:%S %Y', '%b %d %H:%M:%S'):\n"
    "    try:\n"
    "        dt = _d.strptime(base, fmt)\n"
    "        break\n"
    "    except ValueError:\n"
    "        continue\n"
    "if dt is None:\n"
    "    return event\n"
    "if dt.year == 1900:\n"
    "    # no-year syslog dates: the reference pins to the CURRENT year\n"
    "    # (the asa goldens' event.end carries the generation-time year)\n"
    "    dt = dt.replace(year=_d.now().year)\n"
    "zz = zone or tz\n"
    "abbr = {'UTC': 0, 'GMT': 0, 'Z': 0, 'EST': -300, 'EDT': -240,\n"
    "        'CST': -360, 'CDT': -300, 'MST': -420, 'MDT': -360,\n"
    "        'PST': -480, 'PDT': -420}\n"
    "if zz in abbr:\n"
    "    off = abbr[zz]\n"
    "else:\n"
    "    mm = __import__('re').fullmatch(r'([+-])(\\d{2}):?(\\d{2})', zz)\n"
    "    off = 0 if mm is None else \\\n"
    "        (1 if mm.group(1) == '+' else -1) * \\\n"
    "        (int(mm.group(2)) * 60 + int(mm.group(3)))\n"
    "event['ts'] = dt - _td(minutes=off)")


@pytest.mark.parametrize("log", sorted(
    os.path.basename(p[:-len("-expected.json")])
    for p in glob.glob(f"{FTD}/test/*-expected.json")))
def test_cisco_ftd_golden(log):
    doc = load_shared()
    dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
    overrides = {dates[0]: DATE_SCRIPT}
    spec = compile_ingest(doc, scripts=_scripts(doc), overrides=overrides)
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": "cisco", "event.dataset": "cisco.ftd",
        "fileset.name": "ftd", "input.type": "log",
        "service.type": "cisco"}}})
    logp = f"{FTD}/test/{log}"
    lines = _terminated_lines(logp)
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "event_timezone": pa.array(["-02:00"] * len(lines), pa.string()),
        "tags": pa.array([["cisco-ftd", "forwarded"]] * len(lines),
                         pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    expected = json.load(open(logp + "-expected.json"))
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    check_golden(rows[:len(expected)], expected)


ASA = "/root/reference/x-pack/filebeat/module/cisco/asa"


@pytest.mark.parametrize("log", sorted(
    os.path.basename(p[:-len("-expected.json")])
    for p in glob.glob(f"{ASA}/test/*-expected.json")))
def test_cisco_asa_golden(log):
    """cisco/asa — the same shared asa-ftd-pipeline.yml rendered with the
    asa manifest vars (internal_prefix asa/ASA, log_level 7); all fixtures
    (round 5: fixture-level completion of the fileset)."""
    doc = load_shared(prefix="asa", PREFIX="ASA")
    dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
    overrides = {dates[0]: DATE_SCRIPT}
    spec = compile_ingest(doc, scripts=_scripts(doc), overrides=overrides)
    spec.append({"add_fields": {"target": "", "fields": {
        "event.module": "cisco", "event.dataset": "cisco.asa",
        "fileset.name": "asa", "input.type": "log",
        "service.type": "cisco"}}})
    logp = f"{ASA}/test/{log}"
    lines = _terminated_lines(logp)
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "event_timezone": pa.array(["-02:00"] * len(lines), pa.string()),
        "tags": pa.array([["cisco-asa", "forwarded"]] * len(lines),
                         pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    expected = json.load(open(logp + "-expected.json"))
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    check_golden(rows[:len(expected)], expected)
