"""checkpoint/firewall module goldens — ALL 5 fixtures (incl. the 100-row
multi-product checkpoint.log that the hand-built chain in
test_reference_golden.py scopes out) through the module's own
ingest/pipeline.yml compiled by beats_ray.ingest.

Hand-ported painless (3 scripts, root pipeline order): the iana_number ->
network.transport else-if chain (the number->name table is PARSED OUT of the
module's own painless source at test time), and the network.bytes/packets =
source + destination sums.  The two ES subtree copies (``set: client
copy_from: source`` / ``set: server copy_from: destination``) are overrides:
vectorized whole-prefix column copies, the flat-column rendering of ES's
map copy.

Reference: x-pack/filebeat/module/checkpoint/firewall/{ingest/pipeline.yml,
config/firewall.yml, test/*.log-expected.json}.
"""
import json
import os
import re

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml, manifest_vars
from beats_ray.pipeline import Pipeline

from test_zeek_golden import _terminated_lines, check_golden

CP = "/root/reference/x-pack/filebeat/module/checkpoint/firewall"

pytestmark = pytest.mark.skipif(not os.path.isdir(CP),
                                reason="reference not present")


def _batch_script(body):
    return {"script": {"source":
                       "def process_batch(table, params):\n" + "".join(
                           "    " + ln + "\n" for ln in body.splitlines())}}


def _iana_script(painless_src):
    # number->transport table parsed from the module's own painless
    pairs = re.findall(r"iana_number == '(\d+)'\)\s*\{\s*"
                       r"ctx\.network\.transport = '([\w-]+)'", painless_src)
    assert len(pairs) >= 10, "iana table extraction failed"
    table = {n: t for n, t in pairs}
    return _batch_script(
        "import pyarrow as pa, pyarrow.compute as pc\n"
        f"TABLE = {table!r}\n"
        "col = table.column('network_iana_number') \\\n"
        "    if 'network_iana_number' in table.column_names else None\n"
        "if col is None:\n"
        "    return table\n"
        "vals = [TABLE.get(v if v is None else str(v))\n"
        "        for v in col.to_pylist()]\n"
        "cur = (table.column('network_transport').to_pylist()\n"
        "       if 'network_transport' in table.column_names\n"
        "       else [None] * len(table))\n"
        "out = [c if v is None else v for c, v in zip(cur, vals)]\n"
        "if 'network_transport' in table.column_names:\n"
        "    i = table.column_names.index('network_transport')\n"
        "    return table.set_column(i, 'network_transport',\n"
        "                            pa.array(out, pa.string()))\n"
        "return table.append_column('network_transport',\n"
        "                           pa.array(out, pa.string()))\n")


def _sum_script(out_col, a, b):
    # ctx.network.X = ctx.source.X + ctx.destination.X (guarded by the
    # compiled `if`, which the compiler wraps around this stage)
    return _batch_script(
        "import pyarrow as pa, pyarrow.compute as pc\n"
        f"cols = table.column_names\n"
        f"if '{a}' not in cols or '{b}' not in cols:\n"
        "    return table\n"
        f"s = pc.add(pc.cast(table.column('{a}'), pa.int64()),\n"
        f"           pc.cast(table.column('{b}'), pa.int64()))\n"
        f"if '{out_col}' in cols:\n"
        f"    cur = pc.cast(table.column('{out_col}'), pa.int64())\n"
        "    s = pc.if_else(pc.is_valid(cur), cur, s)\n"
        f"    return table.set_column(cols.index('{out_col}'),\n"
        f"                            '{out_col}', s)\n"
        f"return table.append_column('{out_col}', s)\n")


def _subtree_copy(dst_prefix, src_prefix):
    # ES `set: field: client copy_from: source` copies the whole map; flat
    # rendering: every source_* column lands as client_* (nulls stay null
    # = field absent, matching ES's ignore_failure no-op on missing source)
    return _batch_script(
        f"for name in list(table.column_names):\n"
        f"    if name == '{src_prefix}' or name.startswith('{src_prefix}_'):\n"
        f"        out = '{dst_prefix}' + name[len('{src_prefix}'):]\n"
        "        col = table.column(name)\n"
        "        if out in table.column_names:\n"
        "            table = table.set_column(\n"
        "                table.column_names.index(out), out, col)\n"
        "        else:\n"
        "            table = table.append_column(out, col)\n"
        "return table\n")


_cache = {}


def _spec():
    if "spec" not in _cache:
        vars = manifest_vars(f"{CP}/manifest.yml")
        doc = load_pipeline_yml(f"{CP}/ingest/pipeline.yml")
        procs = doc["processors"]
        script_srcs = [p["script"]["source"] for p in procs if "script" in p]
        assert len(script_srcs) == 3
        scripts = [_iana_script(script_srcs[0]),
                   _sum_script("network_bytes", "source_bytes",
                               "destination_bytes"),
                   _sum_script("network_packets", "source_packets",
                               "destination_packets")]
        overrides = {}
        for i, p in enumerate(procs):
            s = p.get("set") or {}
            if s.get("field") == "client" and s.get("copy_from") == "source":
                overrides[i] = _subtree_copy("client", "source")
            if s.get("field") == "server" and \
                    s.get("copy_from") == "destination":
                overrides[i] = _subtree_copy("server", "destination")
        assert len(overrides) == 2
        ingest = compile_ingest(doc, scripts=scripts, overrides=overrides)
        _cache["spec"] = {"processors": [
            # config/firewall.yml: add_locale (goldens rendered under UTC)
            {"add_fields": {"target": "",
                            "fields": {"event.timezone": "UTC"}}},
        ] + ingest + [
            {"add_fields": {"target": "", "fields": {
                "event.module": "checkpoint",
                "event.dataset": "checkpoint.firewall",
                "fileset.name": "firewall", "input.type": "log",
                "service.type": "checkpoint", "tags": vars["tags"]}}},
        ]}
    return _cache["spec"]


FIXTURES = sorted(f[:-len("-expected.json")]
                  for f in os.listdir(f"{CP}/test")
                  if f.endswith("-expected.json"))


@pytest.mark.parametrize("logname", FIXTURES)
def test_checkpoint_firewall_compiled_golden(logname):
    path = f"{CP}/test/{logname}"
    lines = [ln for ln in _terminated_lines(path) if ln.strip()]
    batch = pa.table({
        "message": lines,
        "line_no": pa.array(range(len(lines)), pa.int64()),
    })
    out = Pipeline(_spec()).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    check_golden(rows[:len(expected)], expected)
