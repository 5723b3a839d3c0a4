"""Scale correctness check: flagship per-sink counts at sf1 (6M turns)
must match DuckDB running the equivalent SQL over the same parquet files.
(The per-round driver gate runs at sf0.01; this extends the same oracle
comparison to 100x that size.)

Usage: python scripts/check_scale.py [sf_label]   # default sf1
"""

import logging
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf1"
    import ray
    ray.init(address="local", include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from beats_ray.pipelines.flagship import run_flagship
    from beats_ray.sources.transcripts import transcripts_path
    p = transcripts_path(sf)

    t0 = time.time()
    res = run_flagship(sf)
    mine = {r["sink"]: r["n"] for r in res.to_pylist()}
    t_ray = time.time() - t0

    sql = f"""
    SELECT CASE
        WHEN regexp_extract(text, '^level=(.*?) ts=(.*?) caller=(.*?) msg="(.*?)"', 1) = 'ERROR' THEN 'errors'
        WHEN role = 'tool' THEN 'tool-' || tool
        WHEN text LIKE '{{%' THEN coalesce(json_extract_string(text, '$.event'), 'default')
        ELSE 'default' END AS sink, count(*)::BIGINT AS n
    FROM read_parquet('{p}/*.parquet') GROUP BY 1"""
    t0 = time.time()
    ora = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    t_duck = time.time() - t0

    ok = mine == ora
    print(f"{sf}: match={ok} sinks={len(mine)} rows={sum(mine.values())} "
          f"ray={t_ray:.1f}s duckdb={t_duck:.1f}s")
    ray.shutdown()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
