"""Fixture-coverage tracer: run the test suite with builtins.open hooked and
record every ``/root/reference/**/*-expected.json`` an assertion actually
loads.  Produces /tmp/fixture_trace.json with the opened set and the residual
(present-in-reference but never-opened) list, grouped per fileset.

Usage:  python scripts/trace_fixtures.py [extra pytest args]

This is the "execution-verified inventory" behind COVERAGE.md's fixture
counts — re-run it whenever goldens are added so the doc never goes stale.
"""
from __future__ import annotations

import builtins
import glob
import json
import os
import re
import sys

OPENED: set[str] = set()
_real_open = builtins.open


def traced_open(file, *a, **kw):
    try:
        p = os.fspath(file)
        if isinstance(p, bytes):
            p = p.decode()
        if p.startswith("/root/reference") and p.endswith("-expected.json"):
            OPENED.add(os.path.realpath(p))
    except TypeError:
        pass
    return _real_open(file, *a, **kw)


def fileset_of(path: str) -> str:
    m = re.search(r"(?:x-pack/)?filebeat/module/([^/]+)/([^/]+)/", path)
    if m:
        return f"{m.group(1)}/{m.group(2)}"
    return os.path.dirname(path.replace("/root/reference/", ""))


def main() -> int:
    # `python -m pytest` puts cwd on sys.path; running as a script puts
    # scripts/ there instead — add the repo root so beats_ray imports.
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    builtins.open = traced_open
    import pytest
    args = sys.argv[1:] or ["tests/", "-q", "-x"]
    rc = pytest.main(args)
    builtins.open = _real_open

    all_fixtures = sorted(
        os.path.realpath(p) for p in
        glob.glob("/root/reference/**/*-expected.json", recursive=True)
        if "/filebeat/" in p)
    opened = sorted(p for p in OPENED if p in set(all_fixtures))
    missing = [p for p in all_fixtures if p not in OPENED]
    per_fs: dict[str, dict[str, int]] = {}
    for p in all_fixtures:
        fs = fileset_of(p)
        d = per_fs.setdefault(fs, {"total": 0, "asserted": 0})
        d["total"] += 1
        d["asserted"] += p in OPENED
    residual = {fs: d for fs, d in sorted(per_fs.items())
                if d["asserted"] < d["total"]}
    out = {"opened": len(opened), "total": len(all_fixtures),
           "residual_filesets": residual,
           "missing_files": [p.replace("/root/reference/", "")
                             for p in missing]}
    with _real_open("/tmp/fixture_trace.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nasserted {len(opened)} / {len(all_fixtures)} filebeat "
          f"fixture files; {len(residual)} filesets with residuals "
          f"-> /tmp/fixture_trace.json")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
