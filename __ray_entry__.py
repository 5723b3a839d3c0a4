"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module: nothing
here (or in beats_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``   — flagship transcript pipeline (parse -> enrich -> route ->
                  aggregate) on the deterministic sf0.001 transcript table.
- ``queries()`` — one callable per implemented operator/pipeline
                  (SURVEY.md §2); each takes ``sf_dir``.
- ``oracle_sql()`` — DuckDB-equivalent SQL per query.  Transcript queries run
  over the deterministic generated parquet (referenced by absolute path via
  read_parquet(), same files the Ray side reads); the remaining queries use
  the pre-registered views.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from beats_ray.pipelines.flagship import run_flagship
    return run_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from beats_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    import os

    from beats_ray.functions.multimodal import synth_image_parquet
    from beats_ray.pipelines.queries import oracle_sql_map
    from beats_ray.sources.transcripts import transcripts_path
    # correctness runs at sf0.01; generate (idempotent, pure pyarrow) so the
    # SQL's read_parquet() targets exist before DuckDB runs
    tdir = transcripts_path("sf0.01")
    synth_image_parquet()  # multimodal oracle input
    return oracle_sql_map(os.path.join(tdir, "*.parquet"))
