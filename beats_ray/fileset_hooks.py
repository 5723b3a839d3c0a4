"""Built-in painless-script ports for reference module filesets.

The ES ingest-pipeline compiler (beats_ray/ingest.py) fails LOUDLY on
painless ``script:`` processors — by design, there is no generic painless
execution.  This registry carries hand-ported implementations keyed
``(module, fileset)``; each hook receives the parsed ROOT pipeline doc and
returns either ``(scripts, overrides)`` for compile_ingest or a dict
``{"scripts":…, "overrides":…, "sub_scripts": {short_name: […]},
"sub_overrides": {short_name: {…}}}`` for sub-pipeline-bearing modules.

Ports parse their tables/params out of the module's OWN yml wherever
possible, so they track the reference.  Every hook is golden-verified
against the module's own test/*-expected.json fixtures (the module's
tests/test_*_golden.py imports the hook it exercises).

Reference: filebeat/fileset/pipelines.go (pipeline upload),
libbeat ES ingest-node painless scripts in each module's ingest/*.yml.
"""
from __future__ import annotations

import re

# Java HashMap.toString rendering: keys iterate in BUCKET order
# (String.hashCode spread into capacity-16+ buckets, insertion order within
# a bucket) — verified against the aws/cloudtrail goldens' rendered maps
_JAVA_STR = (
    "def _jhash(s):\n"
    "    h = 0\n"
    "    for c in s:\n"
    "        h = (31 * h + ord(c)) & 0xFFFFFFFF\n"
    "    return h ^ (h >> 16)\n"
    "def _jorder(keys):\n"
    "    cap = 16\n"
    "    while len(keys) > 0.75 * cap:\n"
    "        cap *= 2\n"
    "    return sorted(keys, key=lambda k: (_jhash(k) & (cap - 1),"
    " keys.index(k)))\n"
    "def _jv(v):\n"
    "    if v is None:\n"
    "        return 'null'\n"
    "    if isinstance(v, bool):\n"
    "        return 'true' if v else 'false'\n"
    "    if isinstance(v, dict):\n"
    "        ks = _jorder(list(v))\n"
    "        return '{' + ', '.join(k + '=' + _jv(v[k]) for k in ks) + '}'\n"
    "    if isinstance(v, list):\n"
    "        return '[' + ', '.join(_jv(x) for x in v) + ']'\n"
    "    return str(v)\n"
    "def _flat(dst, prefix, v):\n"
    "    if isinstance(v, dict):\n"
    "        for k, x in v.items():\n"
    "            _flat(dst, prefix + '_' + k.replace('.', '_'), x)\n"
    "    else:\n"
    "        dst[prefix] = v\n")


# -- built-in painless ports (module, fileset) -> hook(doc) ----------------
# A hook receives the parsed root pipeline doc and returns
# (scripts, overrides) for compile_ingest.  Ports parse their tables out of
# the module's own yml wherever possible, so they track the reference.
# Every hook here is golden-verified against the module's own
# test/*-expected.json fixtures (tests/test_zeek_golden.py,
# tests/test_apache_golden.py, tests/test_module_runner.py).

def _py(src: str) -> dict:
    """One-indent python UDF spec from a bare statement block."""
    return {"script": {"source": "def process(event, params):\n" + "".join(
        "    " + ln + "\n" for ln in src.splitlines()) + "    return event\n"}}


def _apache_access_hook(doc):
    # filebeat/module/apache/access/ingest/pipeline.yml: script #1 splits
    # ssl_protocol 'TLSv1.2' -> tls.version/_protocol; script #2 is a
    # recursive null-sweep (a no-op in the columnar model: absent == null)
    tls = {"script": {"source": (
        "def process(event, params):\n"
        "    p = event.get('apache_access_ssl_protocol')\n"
        "    if p is None:\n"
        "        return event\n"
        "    parts = p.lower().split('v')\n"
        "    if len(parts) != 2:\n"
        "        return event\n"
        "    event['tls_version'] = parts[1] if '.' in parts[1] \\\n"
        "        else parts[1] + '.0'\n"
        "    event['tls_version_protocol'] = parts[0]\n"
        "    return event\n")}}
    return [tls, None], None


def _apache_error_hook(doc):
    # pipeline.yml scripts: level->event.type map + recursive null sweep
    # (no-op columnar); the two date processors (timezone==null / templated
    # {{ event.timezone }}) collapse into one tz-aware parse that defaults
    # to UTC when event.timezone is unset
    level = _py(
        "lvl = event.get('log_level')\n"
        "if lvl is not None:\n"
        "    event['event_type'] = 'error' if lvl in (\n"
        "        'emerg', 'alert', 'crit', 'error', 'warn') else 'info'")
    date_tz = {"script": {"source": (
        "def process(event, params):\n"
        "    from datetime import datetime, timedelta\n"
        "    raw = event.get('apache_error_timestamp')\n"
        "    if raw is None:\n"
        "        return event\n"
        "    base = ' '.join(str(raw).split())\n"
        "    dt = None\n"
        "    for fmt in ('%a %b %d %H:%M:%S %Y', '%a %b %d %H:%M:%S.%f %Y'):\n"
        "        try:\n"
        "            dt = datetime.strptime(base, fmt)\n"
        "            break\n"
        "        except ValueError:\n"
        "            continue\n"
        "    if dt is None:\n"
        "        return event\n"
        "    tz = event.get('event_timezone') or 'UTC'\n"
        "    if tz not in ('UTC', 'Z'):\n"
        "        sign = 1 if tz[0] == '+' else -1\n"
        "        dt -= timedelta(minutes=sign * (int(tz[1:3]) * 60\n"
        "                                        + int(tz[-2:])))\n"
        "    event['ts'] = dt\n"
        "    return event\n")}}
    dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
    return [level, None], {dates[0]: None,
                           dates[1]: {"__unconditional__": date_tz}}


def _zeek_ssl_hook(doc):
    # ingest/pipeline.yml: splitOnToken('v') -> tls.version[_protocol]
    return [_py(
        "v = event.get('zeek_ssl_version')\n"
        "parts = v.split('v') if v else []\n"
        "if len(parts) == 2:\n"
        "    if parts[0] == 'SSL':\n"
        "        event['tls_version'] = parts[1] + '.0'\n"
        "    else:\n"
        "        event['tls_version'] = parts[1][:1] + '.' + parts[1][1:]\n"
        "    event['tls_version_protocol'] = parts[0].lower()")], None


def _zeek_kerberos_hook(doc):
    # valid.days = round((until - from) / 86400)
    return [_py(
        "f, u = event.get('zeek_kerberos_valid_from'), "
        "event.get('zeek_kerberos_valid_until')\n"
        "if f is not None and u is not None:\n"
        "    event['zeek_kerberos_valid_days'] = "
        "int(round((u - f) / 86400))")], None


def _zeek_sip_hook(doc):
    # the only painless script strips null map values — a no-op in the
    # columnar model (absent == null)
    return [None], None


def _zeek_files_hook(doc):
    return [
        _py("ids = event.get('zeek_files_session_ids')\n"
            "if ids:\n"
            "    event['zeek_session_id'] = ids[0]"),
        _py("tx = event.get('zeek_files_tx_hosts')\n"
            "if tx:\n"
            "    event['zeek_files_tx_host'] = tx[0]\n"
            "event['zeek_files_tx_hosts'] = None"),
        _py("rx = event.get('zeek_files_rx_hosts')\n"
            "if rx:\n"
            "    event['zeek_files_rx_host'] = rx[0]\n"
            "event['zeek_files_rx_hosts'] = None"),
    ], None


def _zeek_connection_hook(doc):
    # all 7 painless scripts: duration scale, local_orig/resp tags,
    # packet/byte sums, direction matrix, state->message/type table READ
    # FROM THE MODULE'S OWN params
    state_params = [p["script"]["params"] for p in doc["processors"]
                    if "script" in p and p["script"].get("params")
                    and "S0" in p["script"]["params"]][0]
    return [
        _py("d = event.get('temp_duration')\n"
            "if d is not None:\n"
            "    event['event_duration'] = int(round(d * 1000000000))"),
        _py("if event.get('zeek_connection_local_orig'):\n"
            "    event['tags'] = (event.get('tags') or []) + ['local_orig']"),
        _py("if event.get('zeek_connection_local_resp'):\n"
            "    event['tags'] = (event.get('tags') or []) + ['local_resp']"),
        _py("sp, dp = event.get('source_packets'), "
            "event.get('destination_packets')\n"
            "if sp is not None and dp is not None:\n"
            "    event['network_packets'] = sp + dp"),
        _py("sb, db = event.get('source_bytes'), "
            "event.get('destination_bytes')\n"
            "if sb is not None and db is not None:\n"
            "    event['network_bytes'] = sb + db"),
        _py("lo = event.get('zeek_connection_local_orig')\n"
            "lr = event.get('zeek_connection_local_resp')\n"
            "if lo is not None and lr is not None:\n"
            "    event['network_direction'] = (\n"
            "        'internal' if lo and lr else\n"
            "        'outbound' if lo else\n"
            "        'inbound' if lr else 'external')"),
        _py("st = event.get('zeek_connection_state')\n"
            f"table = {state_params!r}\n"
            "if st is not None and st in table:\n"
            "    event['zeek_connection_state_message'] = "
            "table[st]['conn_str']\n"
            "    event['event_type'] = table[st]['types']"),
    ], None


def _zeek_x509_hook(doc):
    # pure params-table lookup; table read from the module's own yml
    params = next(p["script"]["params"] for p in doc["processors"]
                  if "script" in p)
    src = ("def process(event, params):\n"
           f"    table = {params!r}\n"
           "    algo = table.get(event.get('file_x509_signature_algorithm'))\n"
           "    if algo is not None:\n"
           "        event['file_x509_signature_algorithm'] = algo\n"
           "    return event\n")
    return [{"script": {"source": src}}], None


def _checkpoint_firewall_hook(doc):
    # Reuses the query catalogue's vectorized ports (iana table parsed from
    # the module's own painless; ES subtree copies as prefix column copies)
    from .pipelines.queries import _checkpoint_hook_parts
    return _checkpoint_hook_parts(doc)


FILESET_HOOKS = {
    ("apache", "access"): _apache_access_hook,
    ("apache", "error"): _apache_error_hook,
    ("checkpoint", "firewall"): _checkpoint_firewall_hook,
    ("zeek", "ssl"): _zeek_ssl_hook,
    ("zeek", "kerberos"): _zeek_kerberos_hook,
    ("zeek", "sip"): _zeek_sip_hook,
    ("zeek", "files"): _zeek_files_hook,
    ("zeek", "connection"): _zeek_connection_hook,
    ("zeek", "x509"): _zeek_x509_hook,
}




# ------------------------------------------------------- small log modules

def _redis_log_hook(doc):
    # redis/log/ingest/pipeline.yml: two if/else-chain scripts mapping a
    # glyph/letter to its name via ADJACENT param pairs
    # (dot: '.', debug: debug / master_abbrev: M, master: master) —
    # tables rebuilt from the module's own yml params in declaration order
    scripts = []
    for p in doc["processors"]:
        if "script" not in p:
            continue
        vals = list((p["script"].get("params") or {}).values())
        table = {vals[i]: vals[i + 1] for i in range(0, len(vals) - 1, 2)}
        field = ("log_level" if "log.level" in p["script"]["source"]
                 else "redis_log_role")
        scripts.append(_py(
            f"m = {table!r}\n"
            f"v = event.get({field!r})\n"
            "if v in m:\n"
            f"    event[{field!r}] = m[v]"))
    return scripts, None


def _haproxy_log_hook(doc):
    # painless: ctx.event.duration = ctx.temp.duration * 1000000 (ms -> ns)
    return [_py(
        "d = event.get('temp_duration')\n"
        "if d is not None:\n"
        "    event['event_duration'] = int(d) * 1000000"), None], None


def _nginx_access_hook(doc):
    # script #1 picks the first PUBLIC ip from remote_ip_list (isPrivate
    # StringTokenizer port) — the registered vectorized stage replaces the
    # per-row port; script #2 is the recursive null sweep (no-op)
    ip_pick = {"first_public_ip": {"field": "nginx.access.remote_ip_list",
                                   "target": "source.address"}}
    return [ip_pick, None], None


def _mysql_slowlog_hook(doc):
    # Yes/No -> bool over params.fields (read from the module's own yml) +
    # float32 Math.round(duration * 1e6) * 1000 painless arithmetic
    fields = next(p["script"]["params"]["fields"] for p in doc["processors"]
                  if "script" in p and (p["script"].get("params") or {})
                  .get("fields"))
    yesno = _py(
        f"for f in {tuple(fields)!r}:\n"
        "    v = event.get('mysql_slowlog_' + f.rsplit('.', 1)[-1])\n"
        "    if v is not None:\n"
        "        event['mysql_slowlog_' + f.rsplit('.', 1)[-1]] = \\\n"
        "            {'Yes': True, 'No': False}.get(v)")
    duration = _py(
        "import numpy as np\n"
        "d = event.get('temp_duration')\n"
        "if d is not None:\n"
        "    prod = np.float32(np.float32(d) * np.float32(1000000))\n"
        "    event['event_duration'] = int(round(float(prod))) * 1000")
    return [yesno, duration], None


# java.time `zz` resolves timezone abbreviations through the underlying
# IANA zone WITH daylight rules ("EST" in July parses as America/New_York
# = -04:00 — the postgresql goldens carry exactly that), so a fixed-offset
# table would be wrong
_JAVA_ZZ_ZONES = {
    "UTC": "UTC", "GMT": "UTC", "Z": "UTC",
    "CET": "Europe/Paris", "CEST": "Europe/Paris",
    "EST": "America/New_York", "EDT": "America/New_York",
    "CST": "America/Chicago", "CDT": "America/Chicago",
    "MST": "America/Denver", "MDT": "America/Denver",
    "PST": "America/Los_Angeles", "PDT": "America/Los_Angeles",
}


def _zz_date_script(src_col, dst_col):
    """Port of an ES `date` processor whose layout ends in java `zz`
    (abbreviated zone name): strip the abbreviation, parse, shift via the
    IANA zone (DST-aware)."""
    return _py(
        "from datetime import datetime, timezone\n"
        "from zoneinfo import ZoneInfo\n"
        f"raw = event.get('{src_col}')\n"
        "if raw is None:\n"
        "    return event\n"
        "parts = str(raw).rsplit(' ', 1)\n"
        f"zname = {_JAVA_ZZ_ZONES!r}.get("
        "parts[-1] if len(parts) == 2 else '')\n"
        "base = parts[0] if zname else str(raw)\n"
        "dt = None\n"
        "for fmt in ('%Y-%m-%d %H:%M:%S.%f', '%Y-%m-%d %H:%M:%S'):\n"
        "    try:\n"
        "        dt = datetime.strptime(base, fmt)\n"
        "        break\n"
        "    except ValueError:\n"
        "        continue\n"
        "if dt is None:\n"
        "    event['error_message'] = 'date parse failure'\n"
        "    return event\n"
        "if zname:\n"
        "    dt = dt.replace(tzinfo=ZoneInfo(zname)) \\\n"
        "        .astimezone(timezone.utc).replace(tzinfo=None)\n"
        f"event['{dst_col}'] = dt")


def _postgresql_log_hook(doc):
    # Math.round(temp.duration * params.scale) under float32 grok :float,
    # plus the two `zz`-layout dates (root + CSV sub-pipeline)
    duration = _py(
        "import numpy as np\n"
        "d = event.get('temp_duration')\n"
        "if d is not None:\n"
        "    prod = np.float32(np.float32(d) * np.float32(1000000))\n"
        "    event['event_duration'] = int(round(float(prod)))")
    dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
    return {
        "scripts": [duration],
        "overrides": {dates[0]: _zz_date_script("postgresql_log_timestamp",
                                                "ts")},
        "sub_overrides": {"pipeline-csv": lambda sub: {
            [i for i, p in enumerate(sub["processors"])
             if "date" in p][0]: _zz_date_script(
                "tempcsv_session_start_time",
                "postgresql_log_session_start_time")}},
    }


def _osquery_result_hook(doc):
    # use_namespace block: lift json.* under osquery.result.*
    return [_py(
        "for k in [k for k in list(event.keys()) if k.startswith('json_')]:\n"
        "    v = event.pop(k)\n"
        "    if v is not None:\n"
        "        event['osquery_result_' + k[len('json_'):]] = v")], None


FILESET_HOOKS.update({
    ("redis", "log"): _redis_log_hook,
    ("haproxy", "log"): _haproxy_log_hook,
    ("nginx", "access"): _nginx_access_hook,
    ("mysql", "slowlog"): _mysql_slowlog_hook,
    ("postgresql", "log"): _postgresql_log_hook,
    ("osquery", "result"): _osquery_result_hook,
})


# ---------------------------------------------------- common painless idioms

def _parse_level_list(src):
    """['ERROR', 'FATAL'] out of `def errorLevels = [...]`."""
    m = re.search(r"=\s*\[([^\]]*)\]", src)
    return [t.strip().strip('"\'') for t in m.group(1).split(",")]


def _level_script(levels):
    return _py(
        "lvl = event.get('log_level')\n"
        "if lvl is not None:\n"
        f"    event['event_type'] = 'error' if lvl in {tuple(levels)!r} \\\n"
        "        else 'info'")


def _pair_table_script(field, params):
    """if/else chains comparing a field against ADJACENT param pairs
    (abbrev -> long form): nats levels/msg-types, redis levels/roles."""
    vals = list(params.values())
    table = {vals[i]: vals[i + 1] for i in range(0, len(vals) - 1, 2)}
    return _py(
        f"m = {table!r}\n"
        f"v = event.get({field!r})\n"
        "if v in m:\n"
        f"    event[{field!r}] = m[v]")


def _duration_script(src_field, dst_field="event_duration", scale=1000000,
                     f32=True):
    """`ctx.event.duration = Math.round(ctx.X * params.scale)` — java
    binary numeric promotion makes float*int a FLOAT product (32-bit) when
    the value came through grok `:float`, so the default computes in
    float32; a field the pipeline `convert`ed to double multiplies in
    double (coredns), with Java Math.round = floor(x + 0.5)."""
    if f32:
        return _py(
            "import numpy as np\n"
            f"d = event.get({src_field!r})\n"
            "if d is not None:\n"
            f"    prod = np.float32(np.float32(d) * np.float32({scale}))\n"
            f"    event[{dst_field!r}] = int(round(float(prod)))")
    return _py(
        "import math\n"
        f"d = event.get({src_field!r})\n"
        "if d is not None:\n"
        f"    event[{dst_field!r}] = int(math.floor(float(d) * {scale}"
        " + 0.5))")


def _double_fields(doc):
    """Fields the pipeline explicitly `convert`s to double before any
    script runs (flat column names)."""
    out = set()
    for p in doc.get("processors", []):
        if "convert" in p and p["convert"].get("type") == "double":
            out.add(str(p["convert"].get("field", ""))
                    .replace(".", "_"))
    return out


def _auto_script(p, dbl=frozenset()):
    """Recognize the painless idioms shared across the log modules; returns
    a ported spec, None for no-op sweeps, or NotImplemented."""
    src = p["script"].get("source", "")
    params = p["script"].get("params") or {}
    if "handleMap" in src and "removeIf" in src:
        if "isEmpty" in src:
            # mysqlenterprise variant: sweeps EMPTY-STRING map values (the
            # json carries "" members), not nulls — unset them
            return _py(
                "for k in list(event.keys()):\n"
                "    if event.get(k) == '':\n"
                "        event[k] = None")
        return None            # recursive null sweep: absent == null here
    if re.search(r"def err(?:or_?|_)?[lL]evels\s*=", src) \
            and "ctx.event.type" in src.replace(" ", "").replace(";", "") \
            .replace('"', "'").replace("'", ""):
        return _level_script(_parse_level_list(src))
    if "Math.round" in src and "params.scale" in src:
        m = re.search(r"Math\.round\(ctx\.([\w.]+)\s*\*", src)
        dst = re.search(r"ctx\.([\w.]+)\s*=\s*Math\.round", src)
        srcf = m.group(1).replace(".", "_")
        return _duration_script(srcf, dst.group(1).replace(".", "_"),
                                params.get("scale", 1000000),
                                f32=srcf not in dbl)
    m = re.search(r"Math\.round\(ctx\.([\w.]+)\s*\*\s*(\d+)L?\s*\)", src)
    if m:
        # literal scale with an L suffix (kibana responseTime * 1000000L):
        # java promotes to long math for integral inputs, double otherwise
        dst = re.search(r"ctx\.([\w.]+)\s*=\s*Math\.round", src)
        srcf = m.group(1).replace(".", "_")
        scale = int(m.group(2))
        return _py(
            "import math\n"
            f"d = event.get({srcf!r})\n"
            "if d is not None:\n"
            f"    event[{dst.group(1).replace('.', '_')!r}] = \\\n"
            f"        d * {scale} if isinstance(d, int) \\\n"
            f"        else int(math.floor(float(d) * {scale} + 0.5))")
    if params and src.count("} else if (") >= 1 \
            and re.search(r"if \(ctx\.([\w.]+) == params\.", src):
        field = re.search(r"if \(ctx\.([\w.]+) == params\.",
                          src).group(1).replace(".", "_")
        return _pair_table_script(field, params)
    return NotImplemented


def _auto_hook(*specials):
    """Hook from _auto_script + positional overrides for the stragglers:
    specials[i] replaces the i-th NotImplemented in document order."""
    def hook(doc):
        out, extra = [], list(specials)
        dbl = _double_fields(doc)
        for p in doc.get("processors", []):
            if "script" not in p:
                continue
            s = _auto_script(p, dbl)
            if s is NotImplemented:
                if not extra:
                    raise ValueError(
                        f"unrecognized painless: {p['script'].get('source')!r:.120}")
                s = extra.pop(0)
            out.append(s)
        return out, None
    return hook


def _auto_scripts(doc, *specials):
    """Positional scripts list for compile_ingest from _auto_script;
    specials fill the NotImplemented slots in document order.  Also usable
    as a sub_scripts callable (the loader calls it with the sub-doc)."""
    out, extra = [], list(specials)
    dbl = _double_fields(doc)
    for p in doc.get("processors", []):
        if "script" not in p:
            continue
        s = _auto_script(p, dbl)
        if s is NotImplemented:
            if not extra:
                raise ValueError("unrecognized painless: %.160r"
                                 % p["script"].get("source"))
            s = extra.pop(0)
        out.append(s)
    return out


def _merge_json_to_root(container="json"):
    """`ctx.json.keySet().each(key -> ctx.merge(key, ...))` (kibana
    audit/log ECS pipelines): lift every decoded member of the container
    to the root, container values winning; '@timestamp' strings parse."""
    return _py(
        "from datetime import datetime, timezone\n"
        f"pre = {container + '_'!r}\n"
        "for k in [k for k in list(event.keys()) if k.startswith(pre)]:\n"
        "    v = event.pop(k)\n"
        "    if v is None:\n"
        "        continue\n"
        "    tgt = k[len(pre):]\n"
        "    if isinstance(v, str) and v[:1] in '[{':\n"
        "        import json as _json\n"
        "        try:\n"
        "            v = _json.loads(v)\n"
        "        except ValueError:\n"
        "            pass\n"
        "    if tgt == '@timestamp':\n"
        "        dt = datetime.fromisoformat(str(v).replace('Z', '+00:00'))\n"
        "        event['ts'] = dt.astimezone(timezone.utc) \\\n"
        "            .replace(tzinfo=None)\n"
        "    elif isinstance(v, dict):\n"
        "        def emit(prefix, d):\n"
        "            for kk, vv in d.items():\n"
        "                if isinstance(vv, dict):\n"
        "                    emit(prefix + kk + '_', vv)\n"
        "                else:\n"
        "                    event[prefix + kk] = vv\n"
        "        emit(tgt + '_', v)\n"
        "    else:\n"
        "        event[tgt] = v")


# --------------------------------------------- observability / infra stack

def _logstash_log_hook(doc):
    # pipeline-json's first script stringifies logEvent.action members
    # (instanceof List painless): Java Map.toString is BUCKET-ordered, so
    # the port re-reads the raw json line stashed before decode
    action_str = {"script": {"source": (
        _JAVA_STR
        + "def process(event, params):\n"
        "    import json as _json\n"
        "    try:\n"
        "        obj = _json.loads(event.get('_raw_json') or '')\n"
        "    except ValueError:\n"
        "        return event\n"
        "    act = (obj.get('logEvent') or {}).get('action')\n"
        "    if isinstance(act, list):\n"
        "        event['logstash_log_log_event_action'] = \\\n"
        "            [x if isinstance(x, str) else _jv(x) for x in act]\n"
        "    return event\n")}}

    def json_sub(sub):
        scr = [i for i, p in enumerate(sub["processors"]) if "script" in p]
        return {scr[0]: {"__unconditional__": action_str}}

    return {
        "pre": [{"copy_fields": {"fields": [
            {"from": "message", "to": "_raw_json"}],
            "ignore_missing": True, "fail_on_error": False}}],
        "post": [{"drop_fields": {"fields": ["_raw_json"],
                                  "ignore_missing": True}}],
        "sub_scripts": {"pipeline-plaintext": _auto_scripts,
                        # script #0 (the forEach stringifier) is replaced by
                        # json_sub's override; auto-compile only the rest
                        "pipeline-json": lambda d: [None] + _auto_scripts(
                            {"processors": [p for p in d.get("processors", [])
                                            if "script" in p][1:]})},
        "sub_overrides": {"pipeline-json": json_sub},
    }


def _logstash_slowlog_hook(doc):
    return {"sub_scripts": {"pipeline-plaintext": _auto_scripts,
                            "pipeline-json": _auto_scripts}}


def _kibana_audit_hook(doc):
    return {"sub_scripts": {
        # merge json.* to root; the `fields` merge is a no-op (no `fields`
        # container in file input)
        "pipeline-json": [_merge_json_to_root(), None]}}


def _kibana_log_hook(doc):
    state = _py(
        "st = event.get('kibana_log_state')\n"
        "if st is not None:\n"
        "    event['event_type'] = 'error' if st == 'red' else 'info'")
    return {"sub_scripts": {
        "pipeline-7": lambda d: _auto_scripts(d, state),
        "pipeline-ecs": [_merge_json_to_root(), None]}}


def _es_audit_hook(doc):
    outcome = _py(
        # faithful quirk: the module's SECOND if/else runs unconditionally,
        # so a null/unlisted event.action always overrides with 'failure'
        "ok = ('authentication_success', 'access_granted',\n"
        "      'run_as_granted', 'connection_granted')\n"
        "act = event.get('event_action')\n"
        "event['event_outcome'] = 'success' \\\n"
        "    if act is not None and act in ok else 'failure'")
    sub_action = _py(
        "sub = event.get('elasticsearch_audit_sub_action')\n"
        "if sub is not None:\n"
        "    event['elasticsearch_audit_action'] = \\\n"
        "        (event.get('elasticsearch_audit_action') or '') \\\n"
        "        + '[' + sub + ']'")
    return {"scripts": [outcome],
            "sub_scripts": {"pipeline-plaintext": [sub_action]}}


def _es_server_hook(doc):
    # gc observation/collection duration unit normalization (params table
    # read from the module's own yml)
    params = next(p["script"]["params"] for p in doc["processors"]
                  if "script" in p and p["script"].get("params"))
    gc = _py(
        f"P = {params!r}\n"
        "for which in ('observation_duration', 'collection_duration'):\n"
        "    pre = 'elasticsearch_server_gc_' + which + '_'\n"
        "    t, u = event.get(pre + 'time'), event.get(pre + 'unit')\n"
        "    if t is None or u is None:\n"
        "        continue\n"
        "    if u == P['seconds_unit']:\n"
        "        event[pre + 'ms'] = t * P['ms_in_one_s']\n"
        "    elif u == P['milliseconds_unit']:\n"
        "        event[pre + 'ms'] = t\n"
        "    elif u == P['minutes_unit']:\n"
        "        event[pre + 'ms'] = t * P['ms_in_one_m']")
    return _auto_scripts(doc, gc), None


def _envoyproxy_log_hook(doc):
    access_prefix = _py(
        "msg = event.get('message') or ''\n"
        "if msg[:1] == '[':\n"
        "    event['temp_message'] = 'ACCESS ' + msg\n"
        "elif msg[:7] == 'ACCESS ':\n"
        "    event['temp_message'] = msg\n"
        "else:\n"
        "    event['error_message'] = 'Not a valid envoyproxy access log'")
    dest_split = _py(
        "d = event.get('dest')\n"
        "if d is None:\n"
        "    return event\n"
        "if d != '-':\n"
        "    p = d.index(':') if ':' in d else -1\n"
        "    if p >= 0:\n"
        "        event['destination_address'] = d[:p]\n"
        "        event['destination_port'] = d[p + 1:]\n"
        "event['dest'] = None")
    proto_version = _py(
        "pr = event.get('proto')\n"
        "if pr is not None and '/' in pr:\n"
        "    event['http_version'] = pr.split('/', 1)[1]")
    upstream_ms = _py(
        "v = event.get('upstream_service_time')\n"
        "if v is not None and v != '-':\n"
        "    event['envoyproxy_upstream_service_time'] = \\\n"
        "        int(round(float(v) * 1000000))")
    return {"sub_scripts": {
        "pipeline-plaintext": lambda d: _auto_scripts(
            d, access_prefix, dest_split),
        "pipeline-http": [proto_version, upstream_ms]}}


def _coredns_log_hook(doc):
    ts_swap = _py(
        "event['event_created'] = event.get('ts')\n"
        "t = event.get('timestamp')\n"
        "if t is not None:\n"
        "    event['ts'] = t\n"
        "event['timestamp'] = None")
    source_split = _py(
        "s = event.get('temp_source')\n"
        "if s is None:\n"
        "    return event\n"
        "if s[:1] == '[':\n"
        "    p = s.index(']')\n"
        "    event['source_address'] = s[1:p]\n"
        "    event['source_port'] = s[p + 2:]\n"
        "elif ':' in s:\n"
        "    p = s.index(':')\n"
        "    event['source_address'] = s[:p]\n"
        "    event['source_port'] = s[p + 1:]\n"
        "event['temp_source'] = None")
    dot_strip = _py(
        "q = event.get('dns_question_name')\n"
        "if q and q.endswith('.'):\n"
        "    event['dns_question_name'] = q[:-1]")
    # pipeline-entry is the ROOT (first in the manifest's ingest_pipeline
    # list) — its scripts ride the top-level scripts hook
    return {"scripts": _auto_scripts(doc, ts_swap, source_split, dot_strip)}


def _nginx_ingress_hook(doc):
    # four upstream list folds (last/sum semantics, '-' skipped, java
    # float32 accumulation) + the shared isPrivate first-public-ip pick
    pre = "L = event.get('nginx_ingress_controller_upstream_response_"
    length = _py(
        pre + "length_list')\n"
        "if L:\n"
        "    try:\n"
        "        event['nginx_ingress_controller_upstream_response_"
        "length'] = int(L[-1])\n"
        "    except ValueError:\n"
        "        pass")
    time_sum = _py(
        "import numpy as np\n"
        + pre + "time_list')\n"
        "if L:\n"
        "    t = np.float32(0)\n"
        "    try:\n"
        "        for x in L:\n"
        "            if x != '-':\n"
        "                t = np.float32(t + np.float32(float(x)))\n"
        "        event['nginx_ingress_controller_upstream_response_"
        "time'] = float(t)\n"
        "    except ValueError:\n"
        "        pass")
    status = _py(
        pre + "status_code_list')\n"
        "if L:\n"
        "    last = None\n"
        "    try:\n"
        "        for x in L:\n"
        "            if x != '-':\n"
        "                last = int(x)\n"
        "    except ValueError:\n"
        "        last = None\n"
        "    if last is not None:\n"
        "        event['nginx_ingress_controller_upstream_response_"
        "status_code'] = last")
    address = _py(
        "L = event.get('nginx_ingress_controller_upstream_address_list')\n"
        "if L:\n"
        "    event['nginx_ingress_controller_upstream_address'] = L[-1]")
    ip_pick = {"first_public_ip": {
        "field": "nginx.ingress_controller.remote_ip_list",
        "target": "source.address"}}
    return _auto_scripts(doc, length, time_sum, status, address, ip_pick), \
        None


def _mysqlenterprise_audit_hook(doc):
    strip_comma = _py(
        "msg = event.get('message')\n"
        "if isinstance(msg, str) and msg.endswith(','):\n"
        "    event['message'] = msg[:-1]")
    args_count = _py(
        "a = event.get('process_args')\n"
        "if a is not None:\n"
        "    event['process_args_count'] = len(a)\n"
        "    if len(a) > 0:\n"
        "        event['process_executable'] = a[0]")
    return _auto_scripts(doc, strip_comma, args_count), None


def _system_auth_ssh_script():
    return _py(
        "ev = event.get('system_auth_ssh_event')\n"
        "if ev == 'Accepted':\n"
        "    event['event_type'] = ['info']\n"
        "    event['event_category'] = ['authentication', 'session']\n"
        "    event['event_action'] = 'ssh_login'\n"
        "    event['event_outcome'] = 'success'\n"
        "elif ev in ('Invalid', 'Failed'):\n"
        "    event['event_type'] = ['info']\n"
        "    event['event_category'] = ['authentication']\n"
        "    event['event_action'] = 'ssh_login'\n"
        "    event['event_outcome'] = 'failure'")


def _system_auth_hook(doc):
    ssh = _system_auth_ssh_script()
    return {"sub_scripts": {"files": [ssh], "journald": [ssh]},
            "scripts": _auto_scripts(doc, ssh) or None}


FILESET_HOOKS.update({
    ("zookeeper", "log"): _auto_hook(),
    ("activemq", "log"): _auto_hook(),
    ("activemq", "audit"): _auto_hook(),
    ("icinga", "main"): _auto_hook(),
    ("icinga", "debug"): _auto_hook(),
    ("icinga", "startup"): _auto_hook(),
    ("nats", "log"): _auto_hook(),
    ("traefik", "access"): _auto_hook(),
    ("iis", "access"): _auto_hook(),
    ("iis", "error"): _auto_hook(),
    ("elasticsearch", "slowlog"): _auto_hook(),
    ("elasticsearch", "audit"): _es_audit_hook,
    ("elasticsearch", "server"): _es_server_hook,
    ("logstash", "log"): _logstash_log_hook,
    ("logstash", "slowlog"): _logstash_slowlog_hook,
    ("kibana", "audit"): _kibana_audit_hook,
    ("kibana", "log"): _kibana_log_hook,
    ("envoyproxy", "log"): _envoyproxy_log_hook,
    ("nginx", "ingress_controller"): _nginx_ingress_hook,
    ("coredns", "log"): _coredns_log_hook,
    ("mysqlenterprise", "audit"): _mysqlenterprise_audit_hook,
    ("system", "auth"): _system_auth_hook,
})
FILESET_HOOKS[("kafka", "log")] = _auto_hook()


# ------------------------------------------------------------ zoom/webhook

_ZOOM_ISO_DIFF = _py(
    # ZonedDateTime.parse(start/end), ChronoUnit.NANOS.between
    "from datetime import datetime\n"
    "def _iso(v):\n"
    "    return datetime.strptime(str(v).replace('Z', '+0000'),\n"
    "                             '%Y-%m-%dT%H:%M:%S%z')\n"
    "s, e = event.get('event_start'), event.get('event_end')\n"
    "if s and e:\n"
    "    event['event_duration'] = int(\n"
    "        (_iso(e) - _iso(s)).total_seconds() * 1e9)")


def _zoom_phone_span(src_field):
    # ctx.event.start = <src>; ctx.event.end = call_end_time; NANOS.between
    return _py(
        "from datetime import datetime\n"
        "def _iso(v):\n"
        "    return datetime.strptime(str(v).replace('Z', '+0000'),\n"
        "                             '%Y-%m-%dT%H:%M:%S%z')\n"
        f"s = event.get('zoom_phone_{src_field}')\n"
        "e = event.get('zoom_phone_call_end_time')\n"
        "event['event_start'] = s\n"
        "event['event_end'] = e\n"
        "event['event_duration'] = int(\n"
        "    (_iso(e) - _iso(s)).total_seconds() * 1e9)")


FILESET_HOOKS[("zoom", "webhook")] = lambda doc: {"sub_scripts": {
    # x-pack/filebeat/module/zoom/webhook/ingest/*.yml painless ports,
    # positional per sub-pipeline (only the duration computations)
    "meeting": [_py(   # minutes (int) -> ns
        "d = event.get('zoom_meeting_duration')\n"
        "event['event_duration'] = int(d) * 60 * 1000000000")],
    "phone": [
        _zoom_phone_span("ringing_start_time"),
        _zoom_phone_span("answer_start_time"),
        # zoom.duration is a STRING of minutes (Integer.parseInt)
        _py("d = event.get('zoom_duration')\n"
            "event['event_duration'] = int(str(d)) * 60 * 1000000000"),
    ],
    "recording": [_ZOOM_ISO_DIFF],
}}


# -------------------------------------------------------------- panw/panos

def _panw_flags_script(params):
    # 'Extract flags bitfield into labels' — bit values from the module yml
    lines = ["v = event.get('_temp__labels')", "if v:"]
    for name, bit in params.items():
        lines.append(f"    if v & {int(bit)}:")
        lines.append(f"        event['labels_{name}'] = True")
    return _py("\n".join(lines))


_PANW_DURATION_END = _py(
    # seconds -> nanos + event.end = event.start + duration
    "from datetime import timedelta\n"
    "d = event.get('event_duration')\n"
    "if d is not None:\n"
    "    nanos = int(d) * 10**9\n"
    "    event['event_duration'] = nanos\n"
    "    st = event.get('event_start')\n"
    "    if st is not None:\n"
    "        event['event_end'] = st + timedelta(microseconds=nanos // 1000)")

_PANW_COPY_USER = _py(
    # source.user -> user deep copy
    "for k in list(event):\n"
    "    if k.startswith('source_user_') and event[k] is not None:\n"
    "        event['user_' + k[len('source_user_'):]] = event[k]")


def _panw_panos_hook(doc):
    # x-pack/filebeat/module/panw/panos/ingest/pipeline.yml: 3 root scripts
    # (flags bitfield -> labels.*, duration+end, source.user -> user copy);
    # the flag bit table read from the module's own yml params
    flags = next(p["script"]["params"] for p in doc.get("processors", [])
                 if "script" in p and "params" in p.get("script", {})
                 and "pcap_included" in p["script"]["params"])
    return [_panw_flags_script(flags), _PANW_DURATION_END,
            _PANW_COPY_USER], None


FILESET_HOOKS[("panw", "panos")] = _panw_panos_hook


# ------------------------------------------------------------- juniper/srx

_JUNIPER_DASH_KEYS = _py(
    # kv writes dashed keys; painless normalizes to underscores
    "for k in list(event):\n"
    "    if k.startswith('juniper_srx_') and '-' in k:\n"
    "        event[k.replace('-', '_')] = event[k]\n"
    "        event[k] = None")

_JUNIPER_DURATION = _py(
    "from datetime import timedelta as _td\n"
    "d = event.get('juniper_srx_duration')\n"
    "if d is not None:\n"
    "    ns = int(d) * 10**9\n"
    "    event['event_duration'] = ns\n"
    "    ts = event.get('ts')\n"
    "    if ts is not None:\n"
    "        iso = ts.strftime('%Y-%m-%dT%H:%M:%S.') + \\\n"
    "            ('%03d' % (ts.microsecond // 1000)) + 'Z'\n"
    "        event['event_start'] = iso\n"
    "        en = ts + _td(seconds=int(d))\n"
    "        event['event_end'] = en.strftime('%Y-%m-%dT%H:%M:%S.') + \\\n"
    "            ('%03d' % (en.microsecond // 1000)) + 'Z'")

_JUNIPER_FLOW_SCRIPTS = [
    _py("sb, db = event.get('source_bytes'), event.get('destination_bytes')\n"
        "if sb is not None and db is not None:\n"
        "    event['network_bytes'] = int(sb) + int(db)"),
    _py("cp, sp = event.get('client_packets'), event.get('server_packets')\n"
        "if cp is not None and sp is not None:\n"
        "    event['network_packets'] = int(cp) + int(sp)"),
]


def _juniper_srx_hook(doc):
    # x-pack/filebeat/module/juniper/srx/ingest/pipeline.yml: dash-key
    # normalization, duration/start/end, sentinel sweep (params from the
    # module's own yml); flow.yml byte/packet sums
    sweep_vals = [p["script"]["params"]["values"]
                  for p in doc.get("processors", [])
                  if "script" in p and p["script"].get("params")][0]
    sweep = _py(
        f"sent = {sweep_vals!r}\n"
        "for k in list(event):\n"
        "    if k.startswith('juniper_srx_') and event[k] in sent:\n"
        "        event[k] = None")
    return {"scripts": [_JUNIPER_DASH_KEYS, _JUNIPER_DURATION, sweep],
            "sub_scripts": {"flow": list(_JUNIPER_FLOW_SCRIPTS)}}


FILESET_HOOKS[("juniper", "srx")] = _juniper_srx_hook


# --------------------------------------------------------------- sophos/xg

_SOPHOS_LOWER_KEYS = _py(
    "for k in list(event):\n"
    "    if k.startswith('sophos_xg_') and k != k.lower():\n"
    "        event[k.lower()] = event[k]\n"
    "        event[k] = None")

_SOPHOS_DURATION = _py(
    "from datetime import timedelta as _td\n"
    "d = event.get('sophos_xg_duration')\n"
    "if d is not None:\n"
    "    event['event_duration'] = int(d) * 10**9\n"
    "    ts = event.get('ts')\n"
    "    if ts is not None:\n"
    "        event['event_start'] = ts.strftime('%Y-%m-%dT%H:%M:%S.') + \\\n"
    "            ('%03d' % (ts.microsecond // 1000)) + 'Z'\n"
    "        en = ts + _td(seconds=int(d))\n"
    "        event['event_end'] = en.strftime('%Y-%m-%dT%H:%M:%S.') + \\\n"
    "            ('%03d' % (en.microsecond // 1000)) + 'Z'")

_SOPHOS_SUM_BYTES = _py(
    "sb, db = event.get('source_bytes'), event.get('destination_bytes')\n"
    "if sb is not None and db is not None:\n"
    "    event['network_bytes'] = int(sb) + int(db)")
_SOPHOS_SUM_PACKETS = _py(
    "sp, dp = event.get('source_packets'), event.get('destination_packets')\n"
    "if sp is not None and dp is not None:\n"
    "    event['network_packets'] = int(sp) + int(dp)")

_SOPHOS_WAF_DURATION = _py(
    "rt = event.get('sophos_xg_responsetime')\n"
    "if rt is not None and int(rt) > 0:\n"
    "    event['event_duration'] = int(rt) * 1000")

# Java's `z` format throws on ambiguous zone abbreviations ("... IST"
# eventtime rows): the whole doc fails in ES and the goldens EXCLUDE it —
# mark the row so the runner/test can drop it
_SOPHOS_BADZONE = _py(
    "import re as _re\n"
    "v = event.get('_temp__time')\n"
    "if v is not None and _re.search(r' [A-Z]{2,5}$', v):\n"
    "    event['_badzone'] = True\n"
    "    event['_temp__time'] = None")


def _sophos_xg_hook(doc, mvars=None):
    # x-pack/filebeat/module/sophos/xg/ingest/pipeline.yml: key lowering,
    # duration/start/end, sentinel sweep + serial->hostname map (params and
    # known_devices from the module's own yml/manifest), byte/packet sums;
    # waf.yml response-time duration.  The _temp_.time date is replaced
    # with a per-row-timezone layout chain (the module conditions the two
    # date processors on ctx.event.timezone like juniper, but its layouts
    # include the throwing `z`).
    mvars = mvars or {}
    sweep_vals = [p["script"]["params"]["values"]
                  for p in doc.get("processors", [])
                  if "script" in p and p["script"].get("params")][0]
    sweep = _py(
        f"sent = {sweep_vals!r}\n"
        "for k in list(event):\n"
        "    if k.startswith('sophos_xg_') and event[k] in sent:\n"
        "        event[k] = None")
    host_map = _py(
        f"mappings = {mvars.get('known_devices') or []!r}\n"
        f"default = {mvars.get('default_host_name', 'firewall.localgroup.local')!r}\n"
        "serial = event.get('observer_serial_number')\n"
        "name = default\n"
        "for item in mappings:\n"
        "    if item['serial_number'] == str(serial):\n"
        "        name = item['hostname']\n"
        "        break\n"
        "event['host_name'] = name")
    dates = [i for i, p in enumerate(doc.get("processors", []))
             if "date" in p and p["date"].get("field") == "_temp_.time"]
    # dates[0] handles the no-event.timezone case, unreachable in module
    # runs (add_locale always sets it); replace with the unconditional
    # badzone marker so throwing-`z` rows are nulled BEFORE dates[1], the
    # {{ event.timezone }} date, which compiles generically.
    overrides = {dates[0]: {"__unconditional__": [_SOPHOS_BADZONE]}}
    return {"scripts": [_SOPHOS_LOWER_KEYS, _SOPHOS_DURATION, sweep,
                        host_map, _SOPHOS_SUM_BYTES, _SOPHOS_SUM_PACKETS],
            "overrides": overrides,
            "sub_scripts": {"waf": [_SOPHOS_WAF_DURATION]}}


FILESET_HOOKS[("sophos", "xg")] = _sophos_xg_hook


# -------------------------------------------------------- cyberarkpas/audit

CYBERARK_SCRIPT = """
import json as _json
import re as _re
from datetime import datetime, timedelta

HDR_5424 = _re.compile(
    r"^<(?P<pri>\\d+)>\\d+ (?P<ts>\\S+) (?P<host>\\S+) (?P<payload>\\{.*\\})$")
HDR_LEGACY = _re.compile(
    r"^(?P<ts>[A-Z][a-z]{2} [ \\d]\\d \\d\\d:\\d\\d:\\d\\d) (?P<host>\\S+) "
    r"(?P<payload>\\{.*\\})$")


def to_snake(s):
    # faithful port of the module's painless to_snake_case
    if not any(c.isupper() for c in s[1:]):
        return s.lower()
    run, first, out = 0, True, []
    for c in s:
        o = c.lower()
        if c != o:
            if run == 0 and not first:
                out.append("_")
            run += 1
        else:
            if run > 1:
                prev = out[-1]
                out[-1] = "_"
                out.append(prev)
            run = 0
            first = False
        out.append(o)
    return "".join(out)


def snake_keys(d):
    return {to_snake(k): (snake_keys(v) if isinstance(v, dict) else v)
            for k, v in d.items()}


def read_field(ctx, path):
    cur = ctx
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def process(event, params):
    line = event["message"]
    event["message"] = None
    m = HDR_5424.match(line) or HDR_LEGACY.match(line)
    syslog_ts = hostname = None
    if m:
        payload = m.group("payload")
        syslog_ts, hostname = m.group("ts"), m.group("host")
        gd = m.groupdict()
        if "pri" in gd and gd["pri"] is not None:
            event["log_syslog_priority"] = gd["pri"]
    else:
        payload = line[line.index("{"):]
    j = _json.loads(payload)
    audit = j["syslog"]["audit_record"]
    audit = {k: v for k, v in audit.items() if v != ""}
    if j.get("raw") is not None:
        audit["raw"] = j["raw"]
    # @timestamp precedence
    ts = None
    if audit.get("IsoTimestamp"):
        ts = datetime.strptime(audit["IsoTimestamp"].replace("Z", "+0000"),
                               "%Y-%m-%dT%H:%M:%S%z")
        ts = ts.replace(tzinfo=None) - ts.utcoffset()
    elif audit.get("Timestamp"):
        ts = datetime.strptime(
            f"{datetime.utcnow().year} " + audit["Timestamp"],
            "%Y %b %d %H:%M:%S")
    elif syslog_ts:
        if "T" in syslog_ts:
            ts = datetime.strptime(syslog_ts.replace("Z", "+0000"),
                                   "%Y-%m-%dT%H:%M:%S%z")
            ts = ts.replace(tzinfo=None) - ts.utcoffset()
        else:
            # yearless legacy header parsed in the harness timezone
            ts = datetime.strptime(
                f"{datetime.utcnow().year} " + syslog_ts,
                "%Y %b %d %H:%M:%S") + timedelta(hours=2)
    if ts is not None:
        event["ts"] = ts
    # CAProperties -> {Name: Value}
    cap = (audit.get("CAProperties") or {}).get("CAProperty")
    if cap is not None:
        if isinstance(cap, dict):
            cap = [cap]
        audit["CAProperties"] = {p["Name"]: p.get("Value") for p in cap}
    # ExtraDetails kv on unescaped ; =
    ed = audit.get("ExtraDetails")
    if isinstance(ed, str):
        kv = {}
        for part in _re.split(r"(?<!\\\\);", ed):
            if not part:
                continue
            pieces = _re.split(r"(?<!\\\\)=", part, maxsplit=1)
            if len(pieces) == 2:
                kv[pieces[0]] = pieces[1]
        audit["ExtraDetails"] = kv
    audit = snake_keys(audit)
    audit["rfc5424"] = audit.get("rfc5424") == "yes"
    event["event_kind"] = "event"
    if audit.get("action") is not None:
        event["event_action"] = audit["action"].lower()
    sev = {"Info": 2, "Error": 7, "Critical": 10}.get(audit.get("severity"))
    if sev is not None:
        event["event_severity"] = sev
        if sev > 6:
            event["event_type"] = "error"
    if audit.get("message_id") is not None:
        event["event_code"] = str(audit.pop("message_id"))
    if audit.get("station"):
        event["source_address"] = audit["station"]
    if audit.get("gateway_station"):
        event["destination_address"] = audit["gateway_station"]
    if audit.get("file") is not None:
        event["file_path"] = audit["file"]
    for src, tgt in (("vendor", "observer_vendor"),
                     ("product", "observer_product"),
                     ("version", "observer_version"),
                     ("hostname", "observer_hostname")):
        if audit.get(src) is not None:
            event[tgt] = audit.pop(src)
    if event.get("observer_hostname") is None and hostname:
        event["observer_hostname"] = hostname
    # message-id ECS enrichment (params parsed from the module's own yml)
    ctx_view = {"cyberarkpas": {"audit": audit}}
    duration_hms = None
    for item in params["enrich"].get(event.get("event_code") or "", []):
        val = item.get("value")
        if val is None:
            val = read_field(ctx_view, item["from"])
        if val is None or val == "":
            continue
        tgt = item["set"]
        if tgt == "_tmp.duration_hms":
            duration_hms = val
        else:
            event[tgt.replace(".", "_")] = val
    oc = event.get("event_outcome")
    if oc is not None and oc not in ("success", "failure"):
        event["event_outcome"] = "unknown"
    if duration_hms is not None:
        total, cur = 0, 0
        for c in duration_hms:
            if c.isdigit():
                cur = cur * 10 + int(c)
            elif c == ":":
                total = (total + cur) * 60
                cur = 0
            else:
                total, cur = 0, 0
                break
        event["event_duration"] = (total + cur) * 1000000000
    import ipaddress
    for side in ("source", "destination"):
        addr = event.get(side + "_address")
        if addr is None:
            continue
        try:
            ipaddress.ip_address(addr)
            event[side + "_ip"] = addr
        except ValueError:
            event[side + "_domain"] = addr
    rel = []
    for v in (event.get("source_ip"), event.get("destination_ip"),
              audit.get("station"), audit.get("gateway_station")):
        if v and v not in rel:
            rel.append(v)
    if rel:
        event["related_ip"] = rel
    rel_u = []
    for f in ("user_name", "source_user_name", "destination_user_name",
              "user_target_name"):
        v = event.get(f)
        if v and v not in rel_u:
            rel_u.append(v)
    if rel_u:
        event["related_user"] = rel_u
    if event.get("network_application"):
        event["network_application"] = event["network_application"].lower()
    if event.get("host_name") is None and event.get("observer_hostname"):
        event["host_name"] = event["observer_hostname"]
    sip, dip = event.get("source_ip"), event.get("destination_ip")
    if sip and dip:
        def internal(ip):
            # beats named ranges loopback+private+unspecified — python's
            # is_private would wrongly include link-local (169.254/16)
            a = ipaddress.ip_address(ip)
            return a.is_loopback or a.is_unspecified or any(
                a in n for n in (ipaddress.ip_network("10.0.0.0/8"),
                                 ipaddress.ip_network("172.16.0.0/12"),
                                 ipaddress.ip_network("192.168.0.0/16"),
                                 ipaddress.ip_network("fd00::/8")))
        si, di = internal(sip), internal(dip)
        event["network_direction"] = \
            "internal" if si and di else "outbound" if si else \
            "inbound" if di else "external"
    # interesting-fields remap: keep-list at top, rest under .other
    for group in ("ca_properties", "extra_details"):
        base = audit.get(group)
        if not isinstance(base, dict):
            continue
        keep = params["keep"][group]
        selected = {k: base.pop(k) for k in list(base) if k in keep}
        if base:
            selected["other"] = base
        audit[group] = selected

    def emit(prefix, d):
        for k, v in d.items():
            if isinstance(v, dict):
                emit(prefix + k + "_", v)
            else:
                event[prefix + k] = v

    emit("cyberarkpas_audit_", audit)
    return event
"""


def _cyberark_audit_hook(doc):
    # x-pack/filebeat/module/cyberarkpas/audit/ingest/pipeline.yml is one
    # long painless-dominated chain (to_snake_case, CAProperty
    # normalization, ExtraDetails KV, 30-message-id ECS enrichment table,
    # hh:mm:ss durations, address->ip/domain + direction) — ported as ONE
    # mono-script; the enrichment/keep tables are parsed from the module's
    # own yml params.  Every original processor is overridden out.
    params = {"enrich": None, "keep": None}
    for proc in doc.get("processors", []):
        cfg = proc.get("script") if isinstance(proc, dict) else None
        if not cfg:
            continue
        desc = cfg.get("description", "")
        if desc.startswith("ECS enrichment"):
            params["enrich"] = cfg["params"]
        elif desc.startswith("Map interesting fields"):
            params["keep"] = cfg["params"]
    return {"pre": [{"script": {"source": CYBERARK_SCRIPT,
                                "params": params}}],
            "overrides": {i: None
                          for i in range(len(doc.get("processors", [])))}}


FILESET_HOOKS[("cyberarkpas", "audit")] = _cyberark_audit_hook


# ------------------------------------------------------------ aws/cloudtrail

def _aws_cloudtrail_hook(doc):
    # x-pack/filebeat/module/aws/cloudtrail/ingest/pipeline.yml painless:
    # request/response flattening (Java Map.toString rendering — values
    # re-parsed from event.original so insertion order survives the
    # columnar flatten), the ConsoleLogin additional_eventdata fold, and
    # ECS categorization via the action table read from the module's yml
    action_table = [p["script"]["params"] for p in doc["processors"]
                    if "script" in p and p["script"].get("params")][0]
    flatten = _py(
        "import json as _json\n" + _JAVA_STR +
        "raw = event.get('event_original')\n"
        "if raw:\n"
        "    j = _json.loads(raw)\n"
        "    for src, snake in (('requestParameters', 'request_parameters'),"
        "('responseElements', 'response_elements'),"
        "('additionalEventData', 'additional_eventdata'),"
        "('serviceEventDetails', 'service_event_details')):\n"
        "        v = j.get(src)\n"
        "        if v is None:\n"
        "            continue\n"
        "        s = _jv(v)\n"
        "        event['aws_cloudtrail_' + snake] = s\n"
        "        if len(s) < 32766:\n"
        "            _flat(event, 'aws_cloudtrail_flattened_' + snake, v)")
    console = _py(
        "if event.get('json_eventName') == 'ConsoleLogin':\n"
        "    pre = 'aws_cloudtrail_flattened_additional_eventdata_'\n"
        "    mv = event.get(pre + 'MobileVersion')\n"
        "    if mv is not None:\n"
        "        event['aws_cloudtrail_console_login_additional_eventdata"
        "_mobile_version'] = mv != 'No'\n"
        "    lt = event.get(pre + 'LoginTo')\n"
        "    if lt is not None:\n"
        "        event['aws_cloudtrail_console_login_additional_eventdata"
        "_login_to'] = lt\n"
        "    mfa = event.get(pre + 'MFAUsed')\n"
        "    if mfa is not None:\n"
        "        event['aws_cloudtrail_console_login_additional_eventdata"
        "_mfa_used'] = mfa != 'No'")
    categorize = _py(
        f"table = {action_table!r}\n"
        "event['event_kind'] = 'event'\n"
        "event['event_type'] = 'info'\n"
        "if event.get('aws_cloudtrail_error_code') is not None or "
        "event.get('aws_cloudtrail_error_message') is not None:\n"
        "    event['event_outcome'] = 'failure'\n"
        "else:\n"
        "    event['event_outcome'] = 'success'\n"
        "action = event.get('event_action')\n"
        "if action is None:\n"
        "    return event\n"
        "cl = event.get("
        "'aws_cloudtrail_flattened_response_elements_ConsoleLogin')\n"
        "if action == 'ConsoleLogin' and cl is not None:\n"
        "    event['event_outcome'] = str(cl).lower()\n"
        "m = table.get(action)\n"
        "if m:\n"
        "    for k, v in m.items():\n"
        "        event['event_' + k] = v")
    return [flatten, console, categorize], None


FILESET_HOOKS[("aws", "cloudtrail")] = _aws_cloudtrail_hook


# ------------------------------------------------------------- auditd/log

def _auditd_log_hook(doc):
    # filebeat/module/auditd/log/ingest/pipeline.yml: the four
    # painless scripts (hex/quote normalization, the types/syscalls
    # categorization table, args count, EXECVE arg assembly) —
    # their DATA (possibleHexKeys, the categorization table) is
    # parsed from the module's own yml; the copy-foreach collapses
    # into categorize
    procs = doc["processors"]
    s8 = [p for p in procs if "script" in p][0]["script"]
    hex_keys = re.search(r"possibleHexKeys = \[([^\]]+)\]",
                         s8["source"]).group(1)
    hex_keys = [k.strip().strip('"') for k in hex_keys.split(",")]
    cat = [p["script"]["params"] for p in procs
           if "script" in p and p["script"].get("params", {}).get("types")][0]

    normalize = _py(
        f"hex_keys = {hex_keys!r}\n"
        "def unhex(v):\n"
        "    if not v or len(v) % 2 or any(c not in '0123456789abcdefABCDEF'"
        " for c in v):\n"
        "        return None\n"
        "    out, needed = [], False\n"
        "    for i in range(0, len(v) - 1, 2):\n"
        "        cp = int(v[i:i + 2], 16)\n"
        "        if cp < 33 or cp == 34 or cp == 127:\n"
        "            needed = True\n"
        "        if cp < 32 or cp == 127:\n"
        "            out.append('^')\n"
        "            cp ^= 64\n"
        "        out.append(chr(cp))\n"
        "    return ''.join(out) if needed else v\n"
        "for k in list(event):\n"
        "    if not k.startswith('auditd_log_') or k in ("
        "'auditd_log_kv', 'auditd_log_sub_kv', 'auditd_log_epoch'):\n"
        "        continue\n"
        "    v = event[k]\n"
        "    if v in ('?', '(null)', ''):\n"
        "        event[k] = None\n"
        "        continue\n"
        "    if not isinstance(v, str):\n"
        "        continue\n"
        "    short = k[len('auditd_log_'):]\n"
        "    if short.replace('_', '-') in hex_keys or short in hex_keys:\n"
        "        h = unhex(v)\n"
        "        if h is not None:\n"
        "            v = h\n"
        "    if v[:1] in ('\\'', '\"'):\n"
        "        v = v[1:]\n"
        "    if v[-1:] in ('\\'', '\"'):\n"
        "        v = v[:-1]\n"
        "    if short == 'arch' and v == 'c000003e':\n"
        "        v = 'x86_64'\n"
        "    event[k] = v")

    categorize = _py(
        f"params = {cat!r}\n"
        "rt = event.get('auditd_log_record_type')\n"
        "if rt is None:\n"
        "    return event\n"
        "def g(short):\n"
        "    v = event.get('auditd_log_' + short.replace('-', '_'))\n"
        "    if isinstance(v, list) and len(v) == 1:\n"
        "        return v[0]  # per-doc scalar; the kv merge lifted the\n"
        "        # column to list for the rows where BOTH kv passes hit\n"
        "    return v\n"
        "acts = params['types'].get(rt)\n"
        "if acts is None and g('syscall') is not None:\n"
        "    acts = params['syscalls'].get(g('syscall'))\n"
        "    if acts is None:\n"
        "        acts = params['syscalls'].get('*')\n"
        "if acts is None:\n"
        "    return event\n"
        "act = None\n"
        "for a in acts:\n"
        "    need = a.get('has_fields')\n"
        "    if not need or all(g(f) is not None for f in need):\n"
        "        act = a\n"
        "        break\n"
        "if act is None:\n"
        "    return event\n"
        "for k, v in (act.get('event') or {}).items():\n"
        "    event['event_' + k] = v\n"
        "copies = []\n"
        "for c in act.get('copy') or []:\n"
        "    value = None\n"
        "    for src in c['from']:\n"
        "        if value is None:\n"
        "            value = g(src)\n"
        "    if value is not None and isinstance(value, str):\n"
        "        import re as _re\n"
        "        suffix = '.id' if _re.fullmatch(r'[0-9]+', value) "
        "else '.name'\n"
        "        copies.append({'target': c['to'] + suffix, "
        "'value': value})\n"
        "for c in copies:\n"
        "    event[c['target'].replace('.', '_')] = c['value']")

    args_count = _py(
        "a = event.get('process_args')\n"
        "if isinstance(a, list):\n"
        "    event['process_args_count'] = len(a)")

    execve = _py(
        "import re as _re\n"
        "if event.get('auditd_log_record_type') != 'EXECVE':\n"
        "    return event\n"
        "rx = _re.compile(r'^a([0-9]+)(.*)$')\n"
        "args = []\n"
        "for k in list(event):\n"
        "    if not k.startswith('auditd_log_'):\n"
        "        continue\n"
        "    m = rx.match(k[len('auditd_log_'):])\n"
        "    if not m:\n"
        "        continue\n"
        "    v = event[k]\n"
        "    if v is None:\n"
        "        continue\n"
        "    event[k] = None\n"
        "    if m.group(2) == '_len':\n"
        "        continue\n"
        "    args.append((int(m.group(1)), v))\n"
        "if not args:\n"
        "    return event\n"
        "args.sort()\n"
        "vals = [v for _, v in args]\n"
        "first = args[0][0]\n"
        "if first == 0:\n"
        "    event['process_executable'] = vals[0]\n"
        "else:\n"
        "    vals.insert(0, '[... %d truncated arguments ...]' % first)\n"
        "event['process_args'] = vals")

    fe = [i for i, p in enumerate(procs) if "foreach" in p][0]
    # foreach #19 re-applies auditd.log.copy — categorize already set the
    # dynamic targets, so the foreach collapses into it
    return [normalize, categorize, args_count, execve], {fe: None}


FILESET_HOOKS[("auditd", "log")] = _auditd_log_hook


# ------------------------------------------------------------- threatintel

def _ti_null_sweep_hook(doc):
    """abuseurl/abusemalware/otx/anomali/malwarebazaar: the single painless
    script is the shared recursive null-value-removal walker
    (x-pack/filebeat/module/threatintel/*/ingest/pipeline.yml) — a no-op in
    the columnar model, where an absent value IS null."""
    n = sum(1 for p in doc.get("processors", []) if "script" in p)
    return [None] * n, None


for _fs in ("abuseurl", "abusemalware", "otx", "anomali", "malwarebazaar"):
    FILESET_HOOKS[("threatintel", _fs)] = _ti_null_sweep_hook


def _ti_confidence(src_field, dst_field):
    """Shared ThreatStream/ThreatQ 0-100 -> None/Low/Med/High bucketing
    (the modules' own painless ranges)."""
    return _py(
        f"v = event.get('{src_field}')\n"
        "if v is not None:\n"
        f"    event['{dst_field}'] = (\n"
        "        'None' if v <= 0.0 or v > 100.0 else\n"
        "        'Low' if v <= 29.0 else\n"
        "        'Med' if v <= 69.0 else 'High')")


def _ti_anomalithreatstream_hook(doc):
    # itype->STIX-type params table read from the module's own yml;
    # confidence bucketing; trusted-circle CSV split
    itype = next(p["script"]["params"] for p in doc["processors"]
                 if "script" in p and p["script"].get("params"))
    scripts = [
        _py(f"table = {itype!r}\n"
            "m = table.get(event.get('json_itype'))\n"
            "if m is not None:\n"
            "    event['threatintel_indicator_type'] = m"),
        _ti_confidence("json_confidence",
                       "threatintel_indicator_confidence"),
        _py("v = event.get('json_trusted_circle_ids')\n"
            "if isinstance(v, str):\n"
            "    lst = [s for s in v.split(',') if s]\n"
            "    event['json_trusted_circle_ids'] = lst or None"),
    ]
    return scripts, None


FILESET_HOOKS[("threatintel", "anomalithreatstream")] = \
    _ti_anomalithreatstream_hook


def _ti_threatq_hook(doc):
    # score bucketing + sources provider/tlp fold + per-attribute dynamic
    # columns (the pipeline's foreach lowercase/gsub/append over
    # list<struct>, folded into one row-level script)
    procs = doc["processors"]
    fe = [i for i, p in enumerate(procs) if "foreach" in p]
    scripts = [
        _ti_confidence("json_score", "threat_indicator_confidence"),
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
        None,   # shared null sweep: columnar no-op
    ]
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
    return scripts, {fe[0]: attr, fe[1]: None, fe[2]: None}


FILESET_HOOKS[("threatintel", "threatq")] = _ti_threatq_hook


def _ti_misp_hook(doc):
    # tag stream/filter script (tags + tlp marking) + the documented
    # flat-model park/restore around the object-attribute promotion (the
    # Event carries BOTH literal key `attribute_count` and the `Attribute`
    # map; the subtree move cannot tell them apart after flattening)
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
    scripts = [
        _py("tag = event.get('misp_tag')\n"
            "if tag is not None:\n"
            "    names = [t.get('name', '').replace('\\\\', '')"
            ".replace('\"', '') for t in tag if isinstance(t, dict)]\n"
            "    event['tags'] = names\n"
            "    event['threat_indicator_marking_tlp'] = ["
            "t[len('tlp:'):] for t in names if t.startswith('tlp:')]"),
        None,   # shared null sweep: columnar no-op
    ]
    return scripts, {promo[0]: [park, promote, restore]}


FILESET_HOOKS[("threatintel", "misp")] = _ti_misp_hook


# ----------------------------------------------------------------- aws (logs)

def _aws_elb_hook(doc):
    """x-pack/filebeat/module/aws/elb/ingest/pipeline.yml: the single
    painless splits ssl_protocol 'TLSv1.2'/'TLSv1' on 'v' into
    tls.version (dot-inserted when bare digits) + version_protocol."""
    return [_py(
        "p = event.get('aws_elb_ssl_protocol')\n"
        "if p is None:\n"
        "    return event\n"
        "parts = p.split('v')\n"
        "if len(parts) != 2:\n"
        "    return event\n"
        "event['tls_version'] = parts[1] if '.' in parts[1] \\\n"
        "    else parts[1][:1] + '.' + parts[1][1:]\n"
        "event['tls_version_protocol'] = parts[0].lower()")], None


FILESET_HOOKS[("aws", "elb")] = _aws_elb_hook


def _aws_s3access_hook(doc):
    """aws/s3access ingest/pipeline.yml: duration ms->ns scale (params from
    the module's own yml), tls 'TLSv1.2' split, recursive null sweep
    (columnar no-op)."""
    scale = next(p["script"]["params"] for p in doc["processors"]
                 if "script" in p and p["script"].get("params"))
    return [
        _py("v = event.get('event_duration')\n"
            "if v is not None:\n"
            f"    event['event_duration'] = v * {scale['MS_TO_NS']!r}"),
        _py("p = event.get('aws_s3access_tls_version')\n"
            "if p is None:\n"
            "    return event\n"
            "parts = p.lower().split('v')\n"
            "if len(parts) == 2:\n"
            "    event['tls_version'] = parts[1]\n"
            "    event['tls_version_protocol'] = parts[0]"),
        None,   # recursive null sweep: columnar no-op
    ], None


FILESET_HOOKS[("aws", "s3access")] = _aws_s3access_hook


# -------------------------------------------------------------- microsoft

_MS_DURATION = _py(
    "from datetime import datetime as _dt\n"
    "def _ns(s):\n"
    "    s = s.replace('Z', '+00:00')\n"
    "    frac = 0\n"
    "    if '.' in s:\n"
    "        head, rest = s.split('.', 1)\n"
    "        i = rest.find('+') if '+' in rest else rest.find('-')\n"
    "        digits, tz = (rest[:i], rest[i:]) if i >= 0 else (rest, '')\n"
    "        frac = int((digits + '0' * 9)[:9])  # ES keeps 7-digit fracs\n"
    "        s = head + tz\n"
    "    base = _dt.strptime(s, '%Y-%m-%dT%H:%M:%S%z')\n"
    "    return int(base.timestamp()) * 10**9 + frac\n"
    "st, en = event.get('event_start'), event.get('event_end')\n"
    "if st is not None and en is not None:\n"
    "    event['event_duration'] = _ns(en) - _ns(st)")


def _ms_sweep(prefix, values):
    """entrySet().removeIf(value in params.values) over flattened json_*
    (x-pack/filebeat/module/microsoft/defender_atp/ingest/pipeline.yml)."""
    return _py(
        f"sent = {values!r}\n"
        "for k in list(event):\n"
        f"    if k.startswith('{prefix}') and event[k] in sent:\n"
        "        event[k] = None")


def _ms_defender_atp_hook(doc):
    # sentinel-value sweeps (params tables from the module's own yml) +
    # start..end -> event.duration nanos
    sweeps = [p["script"]["params"]["values"] for p in doc["processors"]
              if "script" in p and p["script"].get("params")]
    return [_ms_sweep("json_", sweeps[0]),
            _ms_sweep("json_evidence_", sweeps[1]),
            _MS_DURATION], None


FILESET_HOOKS[("microsoft", "defender_atp")] = _ms_defender_atp_hook


def _ms_m365_defender_hook(doc):
    # null sweep (columnar no-op) + duration nanos
    return [None, _MS_DURATION], None


FILESET_HOOKS[("microsoft", "m365_defender")] = _ms_m365_defender_hook


# ------------------------------------------------------------------- snyk

def _snyk_null_sweep_hook(doc):
    """snyk/audit + vulnerabilities: the painless is the shared recursive
    null-removal walker — a columnar no-op.  The vulnerabilities foreach
    that 'renames' {{ _ingest._value.modificationTime }} renders a VALUE as
    the field NAME, a no-op upstream too (x-pack/filebeat/module/snyk/
    vulnerabilities/ingest/pipeline.yml:156) — dropped."""
    n = sum(1 for p in doc.get("processors", []) if "script" in p)
    over = {i: None for i, p in enumerate(doc.get("processors", []))
            if "foreach" in p
            and "rename" in (p["foreach"].get("processor") or {})}
    return [None] * n, over


FILESET_HOOKS[("snyk", "audit")] = _snyk_null_sweep_hook
FILESET_HOOKS[("snyk", "vulnerabilities")] = _snyk_null_sweep_hook


# ------------------------------------------------------- cisco asa / ftd

_CISCO_DATE = _py(
    # the shared pipeline's date uses a TEMPLATED per-row timezone — parse
    # in python with the row's event.timezone (offsets, abbreviations, UTC)
    "from datetime import datetime as _d, timedelta as _td\n"
    "raw = event.get('_temp__raw_date')\n"
    "if raw is None:\n"
    "    return event\n"
    "tz = event.get('event_timezone') or 'UTC'\n"
    "raw = ' '.join(raw.split())\n"
    "dt = None\n"
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


def _cisco_asa_ftd_hook(doc):
    """cisco/asa + cisco/ftd: the SHARED asa-ftd-pipeline.yml (242
    processors).  The 7 painless scripts are ported with their DATA (the
    security-event field mapping generated from security-mappings.csv, the
    iana table, the ECS action categorization) read from the rendered doc's
    own params; the per-row-templated-timezone date is overridden
    (x-pack/filebeat/module/cisco/shared/ingest/asa-ftd-pipeline.yml)."""
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

    dates = [i for i, p in enumerate(doc["processors"]) if "date" in p]
    return [s0, s1, s2, s3, s4, s5, None], {dates[0]: _CISCO_DATE}


FILESET_HOOKS[("cisco", "asa")] = _cisco_asa_ftd_hook
FILESET_HOOKS[("cisco", "ftd")] = _cisco_asa_ftd_hook


def _cisco_umbrella_hook(doc):
    """cisco/umbrella: the one painless folds identities -> related.user
    (x-pack/filebeat/module/cisco/umbrella/ingest/pipeline.yml)."""
    return [_py(
        "ids = event.get('cisco_umbrella_identities')\n"
        "if isinstance(ids, list):\n"
        "    rel = list(event.get('related_user') or [])\n"
        "    for ident in ids:\n"
        "        if '@' in ident and ident not in rel:\n"
        "            rel.append(ident)\n"
        "    if rel:\n"
        "        event['related_user'] = rel")], None


FILESET_HOOKS[("cisco", "umbrella")] = _cisco_umbrella_hook


def _cisco_amp_hook(doc):
    """cisco/amp: network_addresses ip/mac folds (both painless loops fold
    into one row script); the CVE foreach and the null sweep compile
    generically (x-pack/filebeat/module/cisco/amp/ingest/pipeline.yml)."""
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
    return [folds, None, None], None


FILESET_HOOKS[("cisco", "amp")] = _cisco_amp_hook


# --------------------------------------------------------------- iptables

def _iptables_log_hook(doc):
    """iptables/log: mapping table + hex-field conversion, both driven by
    the params in the module's own yml
    (x-pack/filebeat/module/iptables/log/ingest/pipeline.yml)."""
    scr = [p["script"] for p in doc["processors"] if "script" in p]
    mappings = scr[0]["params"]["mappings"]
    hexf = scr[1]["params"]["hex_fields_to_convert"]
    maps = _py(
        f"mappings = {mappings!r}\n"
        "for action in mappings:\n"
        "    src_obj = action['source']['object']\n"
        "    key = event.get(src_obj + '_' + action['source']['key'])\n"
        "    m = action['map'].get(key) if key is not None else None\n"
        "    if m is not None:\n"
        "        event[action['destination']['object'] + '_'\n"
        "              + action['destination']['key']] = m")
    hexes = _py(
        f"fields = {hexf!r}\n"
        "for key in fields:\n"
        "    v = event.get('iptables_' + key)\n"
        "    if v is None:\n"
        "        continue\n"
        "    val = 0\n"
        "    for ch in str(v).lower():\n"
        "        d = -1\n"
        "        if 'a' <= ch <= 'f':\n"
        "            d = ord(ch) - ord('a') + 10\n"
        "        elif '0' <= ch <= '9':\n"
        "            d = ord(ch) - ord('0')\n"
        "        if d >= 0:\n"
        "            val = val * 16 + d\n"
        "    event['iptables_' + key] = val")
    return [maps, hexes], None


FILESET_HOOKS[("iptables", "log")] = _iptables_log_hook


# ------------------------------------------------------------- o365/audit

def _o365_audit_hook(doc):
    """o365/audit ingest/pipeline.yml: the painless merges uri_parts output
    (_temp_.url) into url.* without clobbering earlier values; the config's
    1104-line pipeline.js runs through mini-JS via the config path."""
    url_merge = {"script": {"source": (
        "def process(event, params):\n"
        "    pre = '_temp__url_'\n"
        "    for k in [k for k in list(event.keys()) if k.startswith(pre)]:\n"
        "        v = event.get(k)\n"
        "        event[k] = None\n"
        "        if v is None:\n"
        "            continue\n"
        "        tgt = 'url_' + k[len(pre):]\n"
        "        cur = event.get(tgt)\n"
        "        if cur is None:\n"
        "            event[tgt] = v\n"
        "        elif isinstance(cur, list):\n"
        "            if v not in cur:\n"
        "                event[tgt] = cur + [v]\n"
        "        elif not (isinstance(cur, str) and str(v) in cur):\n"
        "            event[tgt] = [cur, v]\n"
        "    return event\n")}}
    return [url_merge], None


FILESET_HOOKS[("o365", "audit")] = _o365_audit_hook


# ---------------------------------------------------- crowdstrike/falcon

def _cs_sweep(prefix, values):
    # entrySet().removeIf(value in params.values); painless Integer 0 in
    # the blacklist matches long-converted zeros too (Integer-vs-Long
    # parity) — python int equality already gives that
    return _py(
        f"sent = {values!r}\n"
        "for k in list(event):\n"
        f"    if k.startswith('{prefix}'):\n"
        "        v = event[k]\n"
        "        if v in sent and not isinstance(v, bool):\n"
        "            event[k] = None")


def _crowdstrike_falcon_hook(doc):
    """crowdstrike/falcon root pipeline.yml: CommandLine split into
    process.*, value-blacklist sweeps over event/metadata (params from the
    module's own yml); auth sub-pipeline camelCase->snake OperationName."""
    sweeps = [p["script"]["params"]["values"] for p in doc["processors"]
              if "script" in p and p["script"].get("params")]
    cmdline = _py(
        "cl = event.get('crowdstrike_event_CommandLine')\n"
        "if cl is not None:\n"
        "    cl = cl.strip()\n"
        "    if cl != '':\n"
        "        args = [a for a in cl.split(' ') if a != '']\n"
        "        event['process_command_line'] = cl\n"
        "        event['process_args'] = args\n"
        "        event['process_executable'] = args[0]")
    camel = _py(
        "import re as _re\n"
        "action = event.get('crowdstrike_event_OperationName')\n"
        "if action:\n"
        "    event['event_action'] = _re.sub(\n"
        "        r'([a-z0-9])([A-Z])', r'\\1_\\2', action).lower()")
    # fuse each digit-count date pair (UNIX_MS when >=12 digits, UNIX
    # below) into ONE stage with per-row magnitude dispatch — the columnar
    # model cannot hold datetime and raw number in one column between the
    # two branches
    overrides = {}
    seen = {}
    for i, p in enumerate(doc["processors"]):
        if "date" not in p:
            continue
        f = p["date"].get("field")
        fmts = p["date"].get("formats") or []
        if fmts in (["UNIX"], ["UNIX_MS"]) and \
                "Math.log10" in (p["date"].get("if") or ""):
            if f not in seen:
                seen[f] = i
                overrides[i] = {"__unconditional__": {"timestamp": {
                    "field": f, "target_field": f,
                    "ignore_missing": True, "ignore_failure": True,
                    "layouts": ["UNIX_AUTO"], "timezone": "UTC"},
                    "when": {"and": [
                        {"has_fields": [f]},
                        {"not": {"instance_string": f}},
                        {"not": {"equals": {f: 0}}}]}}}
            else:
                overrides[i] = None
    # painless params.values holds Integer 0; a field converted to LONG
    # before the sweep never equals it (Integer(0).equals(Long(0)) is
    # false) — exempt the pipeline's own long-converted fields
    longs = [p["convert"]["field"].replace(".", "_")
             for p in doc["processors"]
             if "convert" in p and p["convert"].get("type") == "long"
             and not p["convert"].get("target_field")]
    ev_sweep = _py(
        f"sent = {sweeps[0]!r}\n"
        f"longs = {longs!r}\n"
        "for k in list(event):\n"
        "    if k.startswith('crowdstrike_event_') and k not in longs:\n"
        "        v = event[k]\n"
        "        if v in sent and not isinstance(v, bool):\n"
        "            event[k] = None")
    return {"scripts": [cmdline,
                        ev_sweep,
                        _cs_sweep("crowdstrike_metadata_", sweeps[1])],
            "overrides": overrides,
            "sub_scripts": {"auth_activity_audit": [camel]}}


FILESET_HOOKS[("crowdstrike", "falcon")] = _crowdstrike_falcon_hook


# ---------------------------------------------------------------- cef/log

_CEF_EXT_COPY = (
    "def process(event, params):\n"
    "    # port of cp-pipeline.yml's extension-mapping painless +\n"
    "    # foreach-set executor (mustache renders values as strings)\n"
    "    for entry in params['extensions']:\n"
    "        v = event.get('cef_extensions_' + entry['name'])\n"
    "        if v is None:\n"
    "            continue\n"
    "        if 'convert' in entry:\n"
    "            v = entry['convert'].get(str(v).lower())\n"
    "            if v is None:\n"
    "                continue\n"
    "        if entry.get('to') is not None:\n"
    "            dest = entry['to']\n"
    "        else:\n"
    "            label = event.get('cef_extensions_' + entry['name']\n"
    "                              + 'Label')\n"
    "            if label is None:\n"
    "                continue\n"
    "            dest = entry['labels'].get(str(label).lower())\n"
    "            if dest is None:\n"
    "                continue\n"
    "        event[dest.replace('.', '_')] = \\\n"
    "            v if hasattr(v, 'isoformat') else str(v)\n"
    "    return event\n")

_CEF_DURATION = (
    "def process(event, params):\n"
    "    d = event.get('event_duration')\n"
    "    if d is None:\n"
    "        return event\n"
    "    try:\n"
    "        event['event_duration'] = \\\n"
    "            int(d) * params['second_to_nanos']\n"
    "    except ValueError:\n"
    "        event['event_duration'] = None\n"
    "    return event\n")


def _cef_sub_overrides(doc):
    """cp-/fp-pipeline.yml: the data-driven extension-mapping painless
    (ext name -> `to`, label-switched targets, value-convert dicts) with
    the mapping table read from the sub-pipeline's own params."""
    overrides = {}
    for i, p in enumerate(doc["processors"]):
        if "script" in p and "extensions" in (p["script"].get("params")
                                              or {}):
            overrides[i] = {"script": {"source": _CEF_EXT_COPY,
                                       "params": p["script"]["params"]}}
        elif "script" in p and "second_to_nanos" in (
                p["script"].get("params") or {}):
            overrides[i] = {"script": {"source": _CEF_DURATION,
                                       "params": p["script"]["params"]}}
        elif "foreach" in p and p["foreach"].get("field") == "_tmp_copy":
            overrides[i] = None  # executed inside the ext-copy port
        elif "remove" in p and p["remove"].get("field") == "_tmp_copy":
            overrides[i] = None
    return overrides


def _cef_log_hook(doc):
    return {"sub_overrides": {"cp-pipeline": _cef_sub_overrides,
                              "fp-pipeline": _cef_sub_overrides}}


FILESET_HOOKS[("cef", "log")] = _cef_log_hook


# ------------------------------------------------------ fortinet/firewall

def _ftnt_direction(doc):
    """event.yml/utm.yml: network.direction normalize via params map."""
    idx = [i for i, p in enumerate(doc["processors"]) if "script" in p]
    params = doc["processors"][idx[0]]["script"].get("params") or {}
    return [_py(
        f"params = {params!r}\n"
        "d = event.get('network_direction')\n"
        "if d is not None:\n"
        "    k = d.lower()\n"
        "    event['network_direction'] = params.get(k, k)")]


def _fortinet_firewall_hook(doc):
    """fortinet/firewall root pipeline.yml: quote-aware splitUnquoted KV
    (values may contain the separators — not the ES kv processor),
    N/A|undefined sweep, duration s->ns, iana->transport map, byte/packet
    sums, dns.resolved_ip -> related.ip fold, final null sweep."""
    kv = _py(
        "sd = event.get('syslog5424_sd')\n"
        "if sd is None:\n"
        "    return event\n"
        "def split_unquoted(s, sep):\n"
        "    toks, start, inq = [], 0, False\n"
        "    for i, ch in enumerate(s):\n"
        "        if ch == '\"':\n"
        "            inq = not inq\n"
        "        elif ch == sep and not inq:\n"
        "            t = s[start:i].strip()\n"
        "            if t:\n"
        "                toks.append(t)\n"
        "            start = i + 1\n"
        "    last = s[start:]\n"
        "    if last != sep and last != '':\n"
        "        toks.append(last.strip())\n"
        "    return toks\n"
        "for part in split_unquoted(sd, ' '):\n"
        "    kv = split_unquoted(part, '=')\n"
        "    if len(kv) != 2:\n"
        "        continue\n"
        "    v = kv[1]\n"
        "    if v.startswith('\"'):\n"
        "        v = v[1:]\n"
        "    if v.endswith('\"'):\n"
        "        v = v[:-1]\n"
        "    event['fortinet_firewall_' + kv[0]] = v")
    sweep_na = _py(
        "for k in list(event):\n"
        "    if k.startswith('fortinet_firewall_') and \\\n"
        "            event[k] in ('N/A', 'undefined'):\n"
        "        event[k] = None")
    duration = _py(
        "dur = event.get('fortinet_firewall_duration')\n"
        "if dur is not None:\n"
        "    event['event_duration'] = int(dur) * 1000000000")
    iana = _py(
        "n = event.get('network_iana_number')\n"
        "m = {'1': 'icmp', '2': 'igmp', '6': 'tcp', '17': 'udp',\n"
        "     '58': 'ipv6-icmp'}\n"
        "if n in m:\n"
        "    event['network_transport'] = m[n]")
    sums_b = _py(
        "sb, db = event.get('source_bytes'), event.get('destination_bytes')\n"
        "if sb is not None and db is not None:\n"
        "    event['network_bytes'] = sb + db")
    sums_p = _py(
        "sp, dp = event.get('source_packets'), "
        "event.get('destination_packets')\n"
        "if sp is not None and dp is not None:\n"
        "    event['network_packets'] = sp + dp")
    dns_fold = _py(
        "ips = event.get('dns_resolved_ip')\n"
        "if isinstance(ips, list):\n"
        "    rel = list(event.get('related_ip') or [])\n"
        "    for ip in ips:\n"
        "        if ip not in rel:\n"
        "            rel.append(ip)\n"
        "    event['related_ip'] = rel")
    return {"scripts": [kv, sweep_na, duration, iana, sums_b, sums_p,
                        dns_fold, None],
            "sub_scripts": {"event": _ftnt_direction,
                            "utm": _ftnt_direction}}


FILESET_HOOKS[("fortinet", "firewall")] = _fortinet_firewall_hook


# -------------------------------------------------------------- salesforce

_SF_EMPTY_SWEEP = _py(
    # dropEmptyFields: recursive null/"" removal — in the columnar model
    # only the ""->null half has an effect
    "for k in list(event):\n"
    "    if event[k] == '' and not isinstance(event[k], bool):\n"
    "        event[k] = None")


def _sf_map_lookup(field, table, wrap_list=False):
    """getOrDefault/containsKey map normalization over one column."""
    return _py(
        f"table = {table!r}\n"
        f"v = event.get('{field}')\n"
        "m = table.get(v) if v is not None else None\n"
        "if m is not None:\n"
        f"    event['{field}'] = {'[m]' if wrap_list else 'm'}")


def _painless_inline_map(src):
    """Parse an inline painless map literal [\"K\": \"V\", ...] out of a
    script source (salesforce logout sessionTypes/levels)."""
    pairs = re.findall(r'"([^"]+)"\s*:\s*"([^"]+)"', src)
    return dict(pairs)


def _sf_login_hook(doc):
    return {"scripts": [_SF_EMPTY_SWEEP],
            "sub_scripts": {"eventlogfile": lambda d: [
                _sf_map_lookup(
                    "salesforce_login_api_type",
                    [p["script"]["params"]["api_type_map"]
                     for p in d["processors"]
                     if "script" in p and "api_type_map" in
                     (p["script"].get("params") or {})][0]),
                _sf_map_lookup(
                    "salesforce_login_request_status",
                    [p["script"]["params"]["request_status_map"]
                     for p in d["processors"]
                     if "script" in p and "request_status_map" in
                     (p["script"].get("params") or {})][0]),
                # the yml guards on ctx.salesforce.login.db_time.total — a
                # NESTED map no upstream processor ever creates (the flat
                # db_time_total key is a different field in painless), so
                # the division never runs; goldens carry the raw nanos
                None,
            ]}}


FILESET_HOOKS[("salesforce", "login")] = _sf_login_hook


def _sf_logout_hook(doc):
    def _elf(d):
        scr = [p["script"] for p in d["processors"] if "script" in p]
        return [
            _sf_map_lookup("salesforce_logout_session_type",
                           _painless_inline_map(scr[0]["source"])),
            _sf_map_lookup("salesforce_logout_session_level",
                           _painless_inline_map(scr[1]["source"])),
            _sf_map_lookup("salesforce_logout_platform_type",
                           scr[2]["params"]["platforms"]),
            _sf_map_lookup("salesforce_logout_app_type",
                           scr[3]["params"]["appTypes"]),
            _sf_map_lookup("salesforce_logout_api_type",
                           scr[4]["params"]["apiTypes"]),
            _sf_map_lookup("salesforce_logout_user_roles",
                           scr[5]["params"]["userRoles"], wrap_list=True),
        ]
    return {"scripts": [_SF_EMPTY_SWEEP], "sub_scripts": {"eventlogfile": _elf}}


FILESET_HOOKS[("salesforce", "logout")] = _sf_logout_hook


def _sf_apex_hook(doc):
    scr = [p["script"] for p in doc["processors"] if "script" in p]
    # json.ENTITY is a sibling LEAF of json.ENTITY_NAME (literal underscore
    # key): the generic subtree rename would swallow ENTITY_NAME's column —
    # pin the ENTITY rename to the exact column
    over = {i: {"rename": {
        "fields": [{"from": "json.ENTITY",
                    "to": "salesforce.apex.entity"}],
        "ignore_missing": True, "move_subtrees": False,
        "fail_on_error": False}}
        for i, p in enumerate(doc["processors"])
        if "rename" in p and p["rename"].get("field") == "json.ENTITY"}
    ua = _py(
        f"table = {scr[0]['params']['user_agent_map']!r}\n"
        "v = event.get('salesforce_apex_user_agent')\n"
        "if v is not None and table.get(str(v)[:3]) is not None:\n"
        "    event['salesforce_apex_user_agent'] = table[str(v)[:3]]")
    act = _py(
        f"table = {scr[1]['params']['event_action_map']!r}\n"
        "v = event.get('salesforce_apex_event_type')\n"
        "m = table.get(v.lower()) if v is not None else None\n"
        "if m is not None:\n"
        "    event['event_action'] = m")
    return [ua, act, _SF_EMPTY_SWEEP], over


FILESET_HOOKS[("salesforce", "apex")] = _sf_apex_hook
FILESET_HOOKS[("salesforce", "setupaudittrail")] = \
    lambda doc: ([_SF_EMPTY_SWEEP], None)


# ------------------------------------------------------------------- azure

_AZ_CATEGORY_FIELDS = (
    # category -> event fields map lookup (params table from the yml)
    "table = params['table']\n"
    "pre = params['pre']\n"
    "cat = event.get(pre + '_category')\n"
    "hm = table.get(cat.lower()) if cat is not None else None\n"
    "if hm is not None:\n"
    "    for k, v in hm.items():\n"
    "        event['event_' + k.replace('.', '_')] = \\\n"
    "            list(v) if isinstance(v, list) else v")


def _az_cat_script(doc, pre):
    params = next(p["script"]["params"] for p in doc["processors"]
                  if "script" in p and (p["script"].get("params") or {})
                  and "write" in p["script"]["params"])
    return {"script": {"source": "def process(event, params):\n" + "".join(
        "    " + ln + "\n" for ln in _AZ_CATEGORY_FIELDS.splitlines())
        + "    return event\n",
        "params": {"table": params, "pre": pre}}}


def _az_duration():
    return _py(
        # painless Integer * Integer wraps at 32 bits (durationMs and
        # param_nano are both JSON Integers — supporttickets_write carries
        # the overflowed value in its golden)
        "d = event.get('event_duration')\n"
        "if d is not None:\n"
        "    v = int(d) * 1000000\n"
        "    if -2**31 <= int(d) < 2**31:\n"
        "        v = ((v + 2**31) % 2**32) - 2**31\n"
        "    event['event_duration'] = v")


def _az_event_category(pre):
    return _py(
        f"p = '{pre}'\n"
        "ec = event.get(p + '_properties_eventCategory')\n"
        "if ec is not None:\n"
        "    event[p + '_event_category'] = ec\n"
        "elif any(k.startswith(p + '_properties_policies')\n"
        "         and event[k] is not None for k in event):\n"
        "    event[p + '_event_category'] = 'Policy'\n"
        "else:\n"
        "    event[p + '_event_category'] = 'Administrative'")


def _az_strip_empty_pair(doc):
    """message.replace('\"\":\"\",', '') before the json decode."""
    params = next(p["script"]["params"] for p in doc["processors"]
                  if "script" in p and "empty_field_name" in
                  (p["script"].get("params") or {}))
    tok = params["empty_field_name"]
    return _py(
        "m = event.get('message')\n"
        "if m is not None:\n"
        f"    event['message'] = m.replace({tok!r}, '')")


def _azure_auditlogs_hook(doc):
    """azure/auditlogs: ms->ns duration + the indexed targetResources /
    modifiedProperties map build
    (x-pack/filebeat/module/azure/auditlogs/ingest/pipeline.yml)."""
    tr = _py(
        "trs = event.get('azure_auditlogs_properties_targetResources')\n"
        "if trs is None:\n"
        "    return event\n"
        "base = 'azure_auditlogs_properties_target_resources_'\n"
        "for i, t in enumerate(trs):\n"
        "    d = base + str(i) + '_'\n"
        "    if t.get('displayName') is not None:\n"
        "        event[d + 'display_name'] = t['displayName']\n"
        "    event[d + 'id'] = t.get('id')\n"
        "    event[d + 'type'] = t.get('type')\n"
        "    if t.get('ipAddress') is not None:\n"
        "        event[d + 'ip_address'] = t['ipAddress']\n"
        "    if t.get('userPrincipalName') is not None:\n"
        "        event[d + 'user_principal_name'] = t['userPrincipalName']\n"
        "    for j, mp in enumerate(t.get('modifiedProperties') or []):\n"
        "        md = d + 'modified_properties_' + str(j) + '_'\n"
        "        event[md + 'display_name'] = mp.get('displayName')\n"
        "        event[md + 'new_value'] = mp.get('newValue')\n"
        "        event[md + 'old_value'] = mp.get('oldValue')\n"
        "event['azure_auditlogs_properties_targetResources'] = None")
    return [_az_duration(), tr], None


FILESET_HOOKS[("azure", "auditlogs")] = _azure_auditlogs_hook


def _azure_platformlogs_hook(doc):
    return [_az_strip_empty_pair(doc), _az_duration(),
            _az_event_category("azure_platformlogs"),
            _az_cat_script(doc, "azure_platformlogs")], None


FILESET_HOOKS[("azure", "platformlogs")] = _azure_platformlogs_hook


def _azure_activitylogs_hook(doc):
    claims_pre = "azure_activitylogs_identity_claims_"
    def claim_rename(url_key, to):
        # the decoder flattens claim-key DOTS to underscores, matching the
        # painless key.replace('.', '_') sweep (script 47) byte-for-byte
        col = claims_pre + url_key.replace(".", "_")
        return _py(
            f"v = event.get({col!r})\n"
            "if v is not None:\n"
            "    event['azure_activitylogs_identity_"
            f"claims_initiated_by_user_{to}'] = v")
    base = "http://schemas_xmlsoap_org/ws/2005/05/identity/claims/"
    return [_az_strip_empty_pair(doc), _az_duration(),
            _az_event_category("azure_activitylogs"),
            claim_rename(base + "surname", "surname"),
            claim_rename(base + "name", "name"),
            claim_rename(base + "givenname", "givenname"),
            None,   # claims-key dot sweep: the decoder already did it
            _az_cat_script(doc, "azure_activitylogs")], None


FILESET_HOOKS[("azure", "activitylogs")] = _azure_activitylogs_hook


def _azure_signinlogs_hook(doc):
    snake = _py(
        "import re as _re\n"
        "rx = _re.compile(r'([a-z])([A-Z]+)')\n"
        "def _snake(s):\n"
        "    return rx.sub(lambda m: m.group(1) + '_' + m.group(2), s)\\\n"
        "        .lower()\n"
        "def _deep(v):\n"
        "    if isinstance(v, dict):\n"
        "        return {_snake(k): _deep(x) for k, x in v.items()}\n"
        "    if isinstance(v, list):\n"
        "        return [_deep(x) for x in v]\n"
        "    return v\n"
        "for k in list(event):\n"
        "    if k.startswith('azure_signinlogs_'):\n"
        "        nk = 'azure_signinlogs_' + _snake(k[len('azure_signinlogs_'):])\n"
        "        v = _deep(event[k])\n"
        "        if nk != k:\n"
        "            event[k] = None\n"
        "        event[nk] = v")
    apd = _py(
        "items = event.get("
        "'azure_signinlogs_properties_authentication_processing_details')\n"
        "if isinstance(items, list):\n"
        "    pre = ('azure_signinlogs_properties_"
        "authentication_processing_details_')\n"
        "    for it in items:\n"
        "        if isinstance(it, dict) and it.get('key') is not None:\n"
        "            event[pre + str(it['key']).replace('.', '_')] = \\\n"
        "                it.get('value')\n"
        "    event['azure_signinlogs_properties_"
        "authentication_processing_details'] = None")
    return [snake, _az_duration(), apd], None


FILESET_HOOKS[("azure", "signinlogs")] = _azure_signinlogs_hook


# ------------------------------------------------------------ okta/system

def _okta_system_hook(doc):
    """okta/system ingest/pipeline.yml: risk-behaviors POSITIVE fold,
    target list camel->snake member rewrites, event-type-matched
    target_user/target_group element copies, final recursive null drop
    (columnar no-op)."""
    behaviors = _py(
        "pre = 'okta_debug_context_debug_data_flattened_behaviors_'\n"
        "dst = [k[len(pre):] for k in event\n"
        "       if k.startswith(pre) and event[k] == 'POSITIVE']\n"
        "src = event.get(pre[:-1])\n"
        "if isinstance(src, dict):\n"
        "    dst += [k for k, v in src.items() if v == 'POSITIVE']\n"
        "if dst:\n"
        "    event['okta_debug_context_debug_data_risk_behaviors'] = dst")
    snake = _py(
        "arr = event.get('okta_target')\n"
        "if isinstance(arr, list):\n"
        "    for el in arr:\n"
        "        if not isinstance(el, dict):\n"
        "            continue\n"
        "        el['alternate_id'] = el.pop('alternateId', None)\n"
        "        el['display_name'] = el.pop('displayName', None)\n"
        "        el.pop('detailEntry', None)")
    def pick(kind, moves):
        # the painless stores a REFERENCE to the matched array element;
        # the later renames mutate it THROUGH that reference (display_name
        # and id leave okta.target itself) — fold pick + renames into one
        # element-mutating script
        mv = "\n".join(
            f"            if el.get({frm!r}) is not None:\n"
            f"                event[{to!r}] = el.pop({frm!r})"
            for frm, to in moves)
        return _py(
            "et = event.get('okta_event_type')\n"
            f"if et is None or '{kind}.' not in et:\n"
            "    return event\n"
            "arr = event.get('okta_target')\n"
            "if isinstance(arr, list):\n"
            "    for el in arr:\n"
            "        if isinstance(el, dict) and \\\n"
            f"                '{kind}' in str(el.get('type', '')).lower():\n"
            + mv + "\n"
            "            break")
    pick_user = pick("user", [("display_name", "user_target_full_name"),
                              ("id", "user_target_id"),
                              ("login", "user_target_email")])
    pick_group = pick("group", [("display_name", "user_target_group_name"),
                                ("id", "user_target_group_id")])
    return [behaviors, snake, pick_user, pick_group, None], None


FILESET_HOOKS[("okta", "system")] = _okta_system_hook


# ----------------------------------------------------------- suricata/eve

def _suricata_eve_hook(doc):
    """suricata/eve root pipeline.yml + per-event-type sub-pipelines: the
    event_type ECS categorize map (params from the module's own yml),
    destination.domain distinct-collapse, byte/packet sums, start..end ->
    duration nanos; dns answer v1/v2 normalization, TLD split, url merge,
    trailing-dot SNI trim."""
    cat_params = next(p["script"]["params"] for p in doc["processors"]
                      if "script" in p and p["script"].get("params"))
    categorize = {"script": {"source": (
        "def process(event, params):\n"
        "    event['event_kind'] = 'event'\n"
        "    event['event_category'] = ['network']\n"
        "    tp = params.get(event.get('suricata_eve_event_type'))\n"
        "    if tp is None:\n"
        "        return event\n"
        "    for k, v in tp.items():\n"
        "        if k == 'network_protocol':\n"
        "            event['network_protocol'] = v\n"
        "        elif isinstance(v, list):\n"
        "            event['event_' + k] = list(v)\n"
        "        else:\n"
        "            event['event_' + k] = v\n"
        "    return event\n"), "params": cat_params}}
    dom = _py(
        "d = event.get('destination_domain')\n"
        "if isinstance(d, list):\n"
        "    seen = []\n"
        "    for x in d:\n"
        "        if x not in seen:\n"
        "            seen.append(x)\n"
        "    event['destination_domain'] = seen[0] if len(seen) == 1 "
        "else seen")
    sums = _py(
        "sp = event.get('source_packets') or 0\n"
        "sb = event.get('source_bytes') or 0\n"
        "dp = event.get('destination_packets') or 0\n"
        "db = event.get('destination_bytes') or 0\n"
        "if sb + db + sp + dp > 0:\n"
        "    if sb + db > 0:\n"
        "        event['network_bytes'] = sb + db\n"
        "    if sp + dp > 0:\n"
        "        event['network_packets'] = sp + dp")
    duration = _py(
        "from datetime import datetime as _d\n"
        "def ins(v):\n"
        "    if v is None:\n"
        "        return None\n"
        "    if hasattr(v, 'isoformat'):\n"
        "        return v\n"
        "    try:\n"
        "        return _d.fromisoformat(str(v).replace('Z', '+00:00'))\n"
        "    except ValueError:\n"
        "        return None\n"
        "s, e = ins(event.get('event_start')), ins(event.get('event_end'))\n"
        "if s is not None and e is not None:\n"
        "    if s.tzinfo is None and e.tzinfo is not None:\n"
        "        e = e.replace(tzinfo=None)\n"
        "    elif s.tzinfo is not None and e.tzinfo is None:\n"
        "        s = s.replace(tzinfo=None)\n"
        "    if s <= e:\n"
        "        event['event_duration'] = \\\n"
        "            int((e - s).total_seconds() * 1e9)")
    ans_v1 = _py(
        "g = event.get\n"
        "ans = {}\n"
        "for k, f in (('name', 'suricata_eve_dns_rrname'),\n"
        "             ('data', 'suricata_eve_dns_rdata'),\n"
        "             ('type', 'suricata_eve_dns_rrtype'),\n"
        "             ('ttl', 'suricata_eve_dns_ttl')):\n"
        "    if g(f) is not None:\n"
        "        ans[k] = event[f]\n"
        "if ans:\n"
        "    event['dns_answers'] = [ans]\n"
        "if ans.get('type') in ('A', 'AAAA'):\n"
        "    event['dns_resolved_ip'] = [ans.get('data')]")
    ans_v2 = _py(
        "arr = event.get('dns_answers')\n"
        "if not isinstance(arr, list):\n"
        "    return event\n"
        "resolved = []\n"
        "for a in arr:\n"
        "    if not isinstance(a, dict):\n"
        "        continue\n"
        "    for src, k in (('rrname', 'name'), ('rrtype', 'type'),\n"
        "                   ('rdata', 'data')):\n"
        "        v = a.pop(src, None)\n"
        "        if v is not None:\n"
        "            a[k] = v\n"
        "    if a.get('type') in ('A', 'AAAA'):\n"
        "        resolved.append(a.get('data'))\n"
        "if resolved:\n"
        "    event['dns_resolved_ip'] = resolved")
    tld = _py(
        "rd = event.get('dns_question_registered_domain')\n"
        "if rd is not None and '.' in rd:\n"
        "    event['dns_question_top_level_domain'] = \\\n"
        "        rd[rd.index('.') + 1:]")
    url_merge = _py(
        "pre = '_temp__url_'\n"
        "for k in [k for k in list(event) if k.startswith(pre)]:\n"
        "    v = event.get(k)\n"
        "    if v is None:\n"
        "        continue\n"
        "    tgt = 'url_' + k[len(pre):]\n"
        "    cur = event.get(tgt)\n"
        "    if cur is None:\n"
        "        event[tgt] = v\n"
        "    elif isinstance(cur, list):\n"
        "        if v not in cur:\n"
        "            event[tgt] = cur + [v]\n"
        "    elif cur != v and str(v) not in str(cur):\n"
        "        event[tgt] = [cur, v]")
    sni = _py(
        "s = event.get('suricata_eve_tls_sni')\n"
        "if s is not None and s.endswith('.'):\n"
        "    event['suricata_eve_tls_sni'] = s[:-1]")
    return {"scripts": [categorize, dom, sums, duration],
            "sub_scripts": {"dns-answer-v1": [ans_v1],
                            "dns-answer-v2": [ans_v2],
                            "dns": [tld],
                            "http": [url_merge],
                            "tls": [sni]}}


FILESET_HOOKS[("suricata", "eve")] = _suricata_eve_hook


# ------------------------------------------------- oracle/database_audit

def _oracle_database_audit_hook(doc):
    """oracle/database_audit: key-normalization sweeps (lowercase,
    space->_, $->_) over the kv output, action_number map (pairs parsed
    from the module's own painless), empty-string sweep."""
    import re as _re
    src16 = [p["script"]["source"] for p in doc["processors"]
             if "script" in p][3]
    pairs = dict(_re.findall(
        r'if \(x == (\d+)\) \{\s*ctx\.oracle\.database_audit\.action'
        r' = "([^"]+)"', src16))
    pre = "oracle_database_audit_"
    keyfix = _py(
        f"pre = {pre!r}\n"
        "for k in list(event):\n"
        "    if not k.startswith(pre) or event[k] is None:\n"
        "        continue\n"
        "    nk = pre + k[len(pre):].lower().replace(' ', '_')"
        ".replace('$', '_')\n"
        "    if nk != k:\n"
        "        v = event[k]\n"
        "        event[k] = None\n"
        "        event[nk] = v")
    act = _py(
        # painless `x == 100` is an Integer compare: the kv output is a
        # STRING, so the map only fires for numeric values
        f"table = {pairs!r}\n"
        "x = event.get('oracle_database_audit_action_number')\n"
        "if isinstance(x, int) and str(x) in table:\n"
        "    event['oracle_database_audit_action'] = table[str(x)]")
    sweep = _py(
        "for k in list(event):\n"
        "    if event[k] == '' and not isinstance(event[k], bool):\n"
        "        event[k] = None")
    # the three normalization scripts collapse into one sweep (lowercase +
    # space + $ replacements are idempotent together)
    return [keyfix, None, None, act, sweep], None


FILESET_HOOKS[("oracle", "database_audit")] = _oracle_database_audit_hook
