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


