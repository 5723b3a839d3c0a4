"""auditd parser golden parity against the reference's own testdata
(libbeat/reader/auditd/testdata/*.log vs *-expected.json)."""

import json
import os

import pyarrow as pa
import pytest

from beats_ray.stages.auditd import parse_auditd_line
from beats_ray.stages.base import stage_factory

TD = "/root/reference/libbeat/reader/auditd/testdata"

# every golden file in the reference testdata: FULL per-record parity
GOLDEN_FULL = ["audit-ubuntu1604.log", "avc.log", "execve.log",
               "useradd.log", "audit-rhel6.log", "audit-cent7-node.log",
               "sample.log", "test.log", "rare.log"]


def _ours(line: str) -> dict | None:
    rec = parse_auditd_line(line)
    if rec is None:
        return None
    rec.pop("_ts", None)
    err = rec.pop("_error", None)
    out = {"auditd": {"log": rec}}
    if err:
        out["error"] = {"message": err}
    return out


@pytest.mark.skipif(not os.path.isdir(TD), reason="reference testdata absent")
@pytest.mark.parametrize("logname", GOLDEN_FULL)
def test_auditd_golden_parity(logname):
    lines = [ln for ln in open(os.path.join(TD, logname)).read().split("\n")
             if ln.strip()]
    expected = json.load(open(os.path.join(TD, logname + "-expected.json")))
    assert len(lines) == len(expected)
    mismatches = []
    for i, (line, want) in enumerate(zip(lines, expected)):
        got = _ours(line)
        if got != want:
            mismatches.append((i, line, got, want))
    if mismatches:
        i, line, got, want = mismatches[0]
        raise AssertionError(
            f"{len(mismatches)}/{len(lines)} mismatches in {logname}; "
            f"first at line {i}:\n  raw:  {line}\n  got:  {got}\n  want: {want}")


def test_auditd_stage_shape():
    batch = pa.table({"message": [
        "type=SYSCALL msg=audit(1492752520.441:8832): arch=c000003e "
        'syscall=43 success=yes exit=5 comm="sshd"',
        "not an audit line",
        None,
    ]})
    st = stage_factory("auditd")({})
    st.setup()
    out = st.apply(batch)
    assert out.column("auditd_record_type").to_pylist() == ["SYSCALL", None, None]
    assert out.column("auditd_sequence").to_pylist() == ["8832", None, None]
    rec = json.loads(out.column("auditd_log").to_pylist()[0])
    assert rec["syscall"] == "accept" and rec["result"] == "success"
    errs = out.column("error_message").to_pylist()
    assert errs[1] is not None and errs[0] is None and errs[2] is None
