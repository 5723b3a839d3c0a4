"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side at a given sf, compare row count, column
names, and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data
        if isinstance(res, ray.data.Dataset):
            res = res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import __ray_entry__ as e

    qs = e.queries()
    if "sf0.01" in sf_dir:
        oracles = e.oracle_sql()   # the driver-contract path, verbatim
    else:
        # oracle_sql() pins the driver's sf0.01 transcripts; rebuild the
        # map against the requested scale's generated transcript files
        import os as _os

        from beats_ray.functions.multimodal import synth_image_parquet
        from beats_ray.pipelines.queries import oracle_sql_map
        from beats_ray.sources.transcripts import transcripts_path
        synth_image_parquet()
        tdir = transcripts_path(_os.path.basename(sf_dir.rstrip("/")))
        oracles = oracle_sql_map(_os.path.join(tdir, "*.parquet"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append((name, f"query raised: {ex!r}"))
            print(f"FAIL {name}: query raised {ex!r}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(mine)} (no oracle, rows-only check)")
            continue
        try:
            ora = normalize(con.sql(oracles[name]).df())
        except Exception as ex:
            failures.append((name, f"oracle raised: {ex!r}"))
            print(f"FAIL {name}: oracle raised {ex!r}")
            continue
        if len(mine) != len(ora):
            failures.append((name, f"rowcount {len(mine)} != {len(ora)}"))
            print(f"FAIL {name}: rowcount {len(mine)} != {len(ora)}")
            continue
        if list(mine.columns) != list(ora.columns):
            failures.append((name, f"columns {list(mine.columns)} != {list(ora.columns)}"))
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(ora.columns)}")
            continue
        # value compare with float tolerance
        bad = None
        for c in mine.columns:
            a, b = mine[c], ora[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    if not ((a - b).abs() < 1e-9).all():
                        bad = c
                else:
                    if not (a.astype(str).values == b.astype(str).values).all():
                        bad = c
            except Exception:
                bad = c
            if bad:
                break
        if bad:
            failures.append((name, f"value mismatch in column {bad}"))
            print(f"FAIL {name}: value mismatch in {bad}")
            print("  mine:", mine.head(3).to_dict("records"))
            print("  orac:", ora.head(3).to_dict("records"))
        else:
            print(f"PASS {name}: rows={len(mine)}")
    print(f"\n{len(failures)} failures")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
