"""Progressive (online) aggregation: refine an approximate answer over a
growing sample until the reported confidence interval meets the target
relative error, then stop — never scanning more data than the accuracy
requires.

The online-aggregation idea (Hellerstein, Haas & Wang 1997) expressed with
this engine's existing machinery: each refinement step is the standard
inline-sample rewrite at a larger fraction (same seed — samples are nested
in expectation, and each step is independently unbiased), and the stopping
rule reads the per-group ``*_rel_error`` companion columns the rewriter
already emits. The final step escalates to exact when no fraction on the
ladder meets the target.

Scale note: step k scans f_k·N rows; with a geometric ladder the total
work is at most ~2× the final step's scan, and the common case ("5% error
is fine") stops after touching well under 1% of the data. At 100 TB this
is the difference between an interactive answer and a full-lake scan.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import SparkSession

from approximate_query_engine_spark import executor as ex
from approximate_query_engine_spark.rewriter import (
    UnsupportedRewriteError,
    rewrite_inline_sample,
)
from approximate_query_engine_spark.sqlparser import try_parse

#: geometric fraction ladder for refinement steps
DEFAULT_LADDER = (0.001, 0.004, 0.016, 0.064, 0.25)


def _worst_rel_error(rows: list[dict[str, Any]]) -> float | None:
    """Max reported rel_error across all groups/aggregates (None when no
    CI columns exist or every value is NULL)."""
    worst = None
    for r in rows:
        for k, v in r.items():
            if k.endswith("_rel_error") and v is not None:
                worst = v if worst is None else max(worst, v)
    return worst


def progressive_query(
    spark: SparkSession,
    sql: str,
    target_rel_error: float = 0.05,
    ladder=DEFAULT_LADDER,
    seed: int = 42,
    min_rows: int = 30,
) -> dict[str, Any]:
    """→ {status, result, meta:{fraction, steps:[...], stopped_early}}.

    Each step: run the scaled inline-sample rewrite at the next fraction;
    stop as soon as the worst per-group reported relative error meets the
    target (and every group has at least ``min_rows`` supporting rows in
    expectation). Falls back to exact when the ladder is exhausted or the
    query is outside the approximable grammar.
    """
    parsed = try_parse(sql)
    steps: list[dict[str, Any]] = []
    if parsed is not None and parsed.is_aggregate_query and not parsed.has_distinct:
        for fraction in ladder:
            t0 = time.perf_counter()
            try:
                rw = rewrite_inline_sample(parsed, fraction, seed=seed)
            except UnsupportedRewriteError:
                break
            rows = ex.collect_rows(spark.sql(rw.sql))
            elapsed = (time.perf_counter() - t0) * 1000.0
            worst = _worst_rel_error(rows)
            steps.append(
                {
                    "fraction": fraction,
                    "worst_rel_error": worst,
                    "rows": len(rows),
                    "ms": elapsed,
                }
            )
            if worst is not None and worst <= target_rel_error and rows:
                return {
                    "status": "ok",
                    "result": rows,
                    "meta": {
                        "plan_type": "progressive_sample",
                        "fraction": fraction,
                        "steps": steps,
                        "stopped_early": True,
                        "target_rel_error": target_rel_error,
                    },
                }
    # ladder exhausted (or not approximable): exact
    t0 = time.perf_counter()
    rows = ex.collect_rows(spark.sql(sql))
    steps.append({"fraction": 1.0, "worst_rel_error": 0.0, "rows": len(rows),
                  "ms": (time.perf_counter() - t0) * 1000.0})
    return {
        "status": "ok",
        "result": rows,
        "meta": {
            "plan_type": "exact",
            "fraction": 1.0,
            "steps": steps,
            "stopped_early": False,
            "target_rel_error": target_rel_error,
        },
    }
