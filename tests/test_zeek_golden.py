"""zeek module goldens — every fileset's config/*.yml + ingest/pipeline.yml
compiled by beats_ray.ingest and run against the module's own test fixture
(x-pack/filebeat/module/zeek/<fs>/test/<fs>-json.log-expected.json).

Unlike the hand-built specs in test_reference_golden.py, these run the
reference's ACTUAL pipeline files through the generic ES-ingest compiler via
beats_ray.modules.compile_fileset_spec (the `python -m beats_ray module`
path); the painless ``script:`` ports for the scripted filesets live in
beats_ray.modules.FILESET_HOOKS and are applied automatically.
"""
import datetime as _dt
import json
import os

import pyarrow as pa
import pytest

from beats_ray.pipeline import Pipeline

ZEEK = "/root/reference/x-pack/filebeat/module/zeek"

pytestmark = pytest.mark.skipif(not os.path.isdir(ZEEK),
                                reason="reference not present")

# golden keys the engine does not own: cluster-side geoip/asn lookups,
# harness-added bookkeeping, ecs tag
SKIP_PREFIXES = (
    "log.offset", "log.flags", "log.file", "event.ingested", "event.created",
    "ecs.version", "host.", "agent.",
    "source.geo", "destination.geo", "client.geo", "server.geo",
    "source.as", "destination.as", "client.as", "server.as",
    # top-level geoip target (aws/s3access `geoip: target_field: geo`) —
    # cluster-owned processor, no db in this environment
    "geo.",
)


def _terminated_lines(path):
    content = open(path, encoding="utf-8", errors="replace").read()
    raw = content.splitlines()
    if raw and not content.endswith("\n"):
        raw = raw[:-1]
    return [ln for ln in raw if ln.strip()]


def _norm(v):
    """normalize a value tree for comparison: integral floats -> int,
    datetimes -> ES ISO-millis, lists sorted by repr."""
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.") + \
            f"{v.microsecond // 1000:03d}Z"
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and abs(v - round(v)) < 1e-9 and abs(v) < 2**53:
        return int(round(v))
    if isinstance(v, list):
        return sorted((_norm(x) for x in v), key=repr)
    if isinstance(v, dict):
        # null members are dropped (ES modules sweep null map values; the
        # columnar struct keeps the slot)
        return {k: _norm(x) for k, x in sorted(v.items()) if x is not None}
    return v


_SPACE_TS = __import__("re").compile(
    r"^(\d{4}-\d{2}-\d{2}) (\d{2}:\d{2}:\d{2})\.(\d{3})\d*$")
_ISO_TS = __import__("re").compile(
    r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(?:\.(\d+))?Z$")
_ISO_ANY = __import__("re").compile(
    r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(?:\.(\d+))?(Z|[+-]\d{2}:\d{2})$")
_NAIVE_WANT = __import__("re").compile(
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?$")


def _instant(s):
    """(utc datetime, fraction-digit count) for an ISO string, else None."""
    m = _ISO_ANY.match(s)
    if not m:
        return None
    frac = (m.group(2) or "")
    tz = "+00:00" if m.group(3) == "Z" else m.group(3)
    d = _dt.datetime.fromisoformat(
        m.group(1) + "." + (frac[:6].ljust(6, "0")) + tz)
    return d.astimezone(_dt.timezone.utc).replace(tzinfo=None), len(frac)


def _same(got, want):
    if isinstance(got, float) and isinstance(want, (int, float)) and \
            not isinstance(want, bool):
        # ES `convert type: float` is 32-bit and Java Float.toString prints
        # the shortest unique repr (salesforce db_total_time 232002551 ->
        # golden 2.3200254E8): equal when both collapse to the same float32
        import struct
        f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa
        if f32(got) == f32(float(want)):
            return True
    if isinstance(got, _dt.datetime) and isinstance(want, str) and \
            _NAIVE_WANT.match(want):
        # pyarrow.json infers timestamps from naive-ISO strings the
        # reference keeps as text (o365 CreationTime): compare instants
        return got == _dt.datetime.fromisoformat(want)
    got, want = _norm(got), _norm(want)
    if isinstance(got, list) and len(got) == 1 and not isinstance(want, list):
        got = got[0]  # columnar lift: 1-element list where ES kept a scalar
    if isinstance(got, list) and isinstance(want, list):
        # ES duplicate-capture arrays mix TYPES ([16, "16"] when one grok
        # group is :long and its twin untyped — mysql slowlog Thread_id);
        # one Arrow list has one element type, so compare element VALUES
        if len(got) != len(want):
            return False
        return all(_same(g, w) for g, w in zip(sorted(got, key=str),
                                               sorted(want, key=str)))
    if isinstance(want, str) and isinstance(got, str) and want.endswith("Z"):
        m = _SPACE_TS.match(got)  # engine's strftime form vs ES ISO-millis
        if m:
            got = f"{m.group(1)}T{m.group(2)}.{m.group(3)}Z"
    if isinstance(want, str) and isinstance(got, str) and ":" in want:
        gi, wi = _instant(got), _instant(want)
        if gi is not None and wi is not None:
            # ISO timestamps in different zone renderings: same instant,
            # fraction compared at the shorter precision
            k = min(gi[1], wi[1], 6)
            q = 10 ** (6 - k) if k < 6 else 1
            g = gi[0].replace(microsecond=(gi[0].microsecond // q) * q)
            w = wi[0].replace(microsecond=(wi[0].microsecond // q) * q)
            return g == w
    if isinstance(want, str) and isinstance(got, str) and want.endswith("Z") \
            and got.endswith("Z") and ":" in want:
        # timestamp strings: beats keeps ns, the engine µs, ES renders ms —
        # compare base + the SHORTER fraction's digits
        gm = _ISO_TS.match(got)
        wm = _ISO_TS.match(want)
        if gm and wm:
            if gm.group(1) != wm.group(1):
                return False
            gf, wf = gm.group(2) or "", wm.group(2) or ""
            k = min(len(gf), len(wf))
            return (gf[:k] or "0").ljust(k or 1, "0") == \
                (wf[:k] or "0").ljust(k or 1, "0")
        return got.rstrip("Z").rstrip("0").rstrip(".") == \
            want.rstrip("Z").rstrip("0").rstrip(".")
    if isinstance(got, float) or isinstance(want, float):
        try:
            return abs(float(got) - float(want)) <= 1e-6 * max(
                1.0, abs(float(want)))
        except (TypeError, ValueError):
            return False
    return str(got) == str(want)


def _dig(row, key):
    """Column lookup with dict-container traversal: a JS Put of a MAP keeps
    the dict as one column value (o365 ExtendedProperties), while the
    golden key addresses the flattened leaf."""
    col = key.replace(".", "_")
    v = row.get(col)
    if v is not None:
        return v
    parts = key.split(".")
    for i in range(len(parts) - 1, 0, -1):
        base = row.get("_".join(parts[:i]).replace(".", "_"))
        if isinstance(base, dict):
            cur = base
            for seg in parts[i:]:
                cur = cur.get(seg) if isinstance(cur, dict) else None
                if cur is None:
                    break
            if cur is not None:
                return cur
    return v


def check_golden(rows, expected, skip=()):
    __tracebackhide__ = True
    assert len(rows) == len(expected), (len(rows), len(expected))
    for got, exp in zip(rows, expected):
        for key, want in exp.items():
            if key.startswith(SKIP_PREFIXES) or key in skip:
                continue
            col = "ts" if key == "@timestamp" else key.replace(".", "_")
            got_v = got.get(col) if key == "@timestamp" else _dig(got, key)
            if key == "@timestamp" and isinstance(got_v, _dt.datetime):
                # golden @timestamp may render in the module timezone
                # (juniper -02:00) — compare instants, µs-truncated
                m = __import__("re").match(
                    r"^(.*?)(?:\.(\d+))?(Z|[+-]\d{2}:\d{2})$", str(want))
                if m:
                    frac = (m.group(2) or "")[:6].ljust(6, "0")
                    w = _dt.datetime.fromisoformat(
                        m.group(1) + "." + frac +
                        ("+00:00" if m.group(3) == "Z" else m.group(3)))
                    w = w.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                    g = got_v.replace(tzinfo=None)
                    assert abs((g - w).total_seconds()) < 0.001, \
                        (key, got_v, want)
                    continue
                got_v = _norm(got_v)
            assert _same(got_v, want), (key, got_v, want)


def run_fileset(module_dir, module, fs, scripts=None, overrides=None,
                log=None, extra_spec=None):
    # delegates to the library module runner so the golden suite exercises
    # the same compile path `python -m beats_ray module` runs in production
    from beats_ray.modules import compile_fileset_spec
    spec, vars = compile_fileset_spec(module_dir, module, fs,
                                      scripts=scripts, overrides=overrides,
                                      extra_spec=extra_spec)
    logp = log or f"{module_dir}/{fs}/test/{fs}-json.log"
    if not os.path.exists(logp):
        import glob as _glob
        cands = sorted(p[:-len("-expected.json")] for p in
                       _glob.glob(f"{module_dir}/{fs}/test/*-expected.json"))
        logp = cands[0]
    lines = _terminated_lines(logp)
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
        "tags": pa.array([vars.get("tags") or []] * len(lines),
                         pa.list_(pa.string())),
    })
    out = Pipeline({"processors": spec}).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(logp + "-expected.json"))
    return rows, expected


# filesets whose pipelines contain no painless script: fully generic
PLAIN_FILESETS = [
    "capture_loss", "dce_rpc", "dhcp", "dnp3", "dpd", "ftp", "http",
    "intel", "irc", "modbus", "mysql", "notice", "ntlm", "ntp", "pe",
    "radius", "rdp", "rfb", "signature", "smb_cmd", "smb_files",
    "smb_mapping", "smtp", "snmp", "socks", "ssh", "stats", "traceroute",
    "tunnel", "weird",
]


@pytest.mark.parametrize("fs", PLAIN_FILESETS)
def test_zeek_plain_fileset_golden(fs):
    rows, expected = run_fileset(ZEEK, "zeek", fs)
    check_golden(rows, expected)


def test_zeek_ssl_golden():
    """zeek/ssl (both fixtures) — the painless version-split port, applied
    automatically via its built-in FILESET_HOOKS entry (beats_ray.modules)."""
    for log in ("ssl-json.log", "ssl-with-ja3-and-custom-fields-json.log"):
        rows, expected = run_fileset(ZEEK, "zeek", "ssl",
                                     log=f"{ZEEK}/ssl/test/{log}")
        check_golden(rows, expected)


def test_zeek_kerberos_golden():
    """zeek/kerberos — valid.days = round((until-from)/86400) port via its
    built-in hook."""
    rows, expected = run_fileset(ZEEK, "zeek", "kerberos")
    check_golden(rows, expected)


def test_zeek_sip_golden():
    """zeek/sip — the only painless script strips null map values, a no-op
    in the columnar model (absent == null); built-in hook."""
    rows, expected = run_fileset(ZEEK, "zeek", "sip")
    check_golden(rows, expected)


def test_zeek_files_golden():
    """zeek/files — 3 one-line painless ports (first-element extracts +
    remove) via the built-in hook; foreach+append handled by the compiler."""
    rows, expected = run_fileset(ZEEK, "zeek", "files")
    check_golden(rows, expected)


def test_zeek_connection_golden():
    """zeek/connection — all 7 painless scripts via the built-in hook
    (duration scale, local_orig/resp tags, packet/byte sums, direction
    matrix, state->message/type table read from the module's own params)."""
    rows, expected = run_fileset(ZEEK, "zeek", "connection")
    check_golden(rows, expected)


def test_zeek_x509_golden():
    """zeek/x509 — the painless script is a pure params-table lookup; the
    built-in hook reads the table from the module's own pipeline.yml."""
    rows, expected = run_fileset(ZEEK, "zeek", "x509")
    check_golden(rows, expected)
