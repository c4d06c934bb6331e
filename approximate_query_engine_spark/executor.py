"""Plan execution: run the (already-rewritten) Spark SQL, time it, and
optionally dual-execute the exact original for measured speedup.

The reference executor (executor.py:9-62) runs the plan's SQL and then
mutates result cells (scaling + CI attachment). Here the plan's SQL already
contains scaled aggregates and CI companion columns (rewriter.py), so
execution is a pure ``spark.sql(plan['sql'])`` — there is no post-hoc
result mutation and therefore no double-scaling path (SURVEY.md §2.7).

Dual execution reproduces reference app.py:119-138: after the approximate
run, re-run the ORIGINAL SQL exactly and report ``actual_speedup`` plus both
wall times. It stays a flag because running exact every time erases the
speedup in production (SURVEY.md §7.3 risk register).
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def run_sql(spark: SparkSession, sql: str) -> DataFrame:
    return spark.sql(sql)


def collect_rows(df: DataFrame) -> list[dict[str, Any]]:
    return [r.asDict(recursive=True) for r in df.collect()]


def execute_plan(
    spark: SparkSession, plan: dict[str, Any]
) -> tuple[list[dict[str, Any]], dict[str, Any]]:
    """Execute a plan dict; return (result rows, meta) in the reference's
    response shape (executor.py:44-49 + app.py:146-148)."""
    t0 = time.perf_counter()
    rows = collect_rows(run_sql(spark, plan["sql"]))
    elapsed_ms = (time.perf_counter() - t0) * 1000.0
    meta: dict[str, Any] = {
        "plan_type": plan["type"],
        "reason": plan.get("reason", ""),
        "rows": len(rows),
        "sql_executed": plan["sql"],
        "execution_time_ms": elapsed_ms,
    }
    if "sample_fraction" in plan:
        meta["sample_fraction"] = plan["sample_fraction"]
    if "sample_table" in plan:
        meta["sample_table"] = plan["sample_table"]
    return rows, meta


def dual_execute_exact(
    spark: SparkSession, original_sql: str
) -> tuple[list[dict[str, Any]], float]:
    """Run the exact original; return (rows, wall ms)."""
    t0 = time.perf_counter()
    rows = collect_rows(run_sql(spark, original_sql))
    elapsed_ms = (time.perf_counter() - t0) * 1000.0
    return rows, elapsed_ms


def measured_relative_error(
    approx_rows: list[dict[str, Any]], exact_rows: list[dict[str, Any]]
) -> float | None:
    """Mean relative error over numeric cells of matching columns.

    Used to close the learning loop with an *actual* error per dual-executed
    query. Group rows are matched positionally after sorting by the
    non-numeric key columns; CI companion columns are excluded.
    """
    if not approx_rows or not exact_rows or len(approx_rows) != len(exact_rows):
        return None
    exact_cols = set(exact_rows[0].keys())

    def _is_numeric_col(c: str) -> bool:
        # scan ALL rows: a NULL in the first row must not demote a numeric
        # column into the sort key (which would desync row pairing)
        saw_number = False
        for r in approx_rows:
            v = r.get(c)
            if v is None:
                continue
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                return False
            saw_number = True
        return saw_number

    num_cols = [
        c
        for c in approx_rows[0]
        if c in exact_cols
        and not c.endswith(("_ci_low", "_ci_high", "_rel_error"))
        and _is_numeric_col(c)
    ]
    if not num_cols:
        return None
    key_cols = [c for c in exact_rows[0] if c not in num_cols]

    def keyed(rows):
        return sorted(rows, key=lambda r: tuple(str(r.get(k)) for k in key_cols))

    a_sorted, e_sorted = keyed(approx_rows), keyed(exact_rows)
    errs = []
    for a, e in zip(a_sorted, e_sorted):
        for c in num_cols:
            av, ev = a.get(c), e.get(c)
            if av is None or ev is None:
                continue
            denom = abs(float(ev))
            if denom < 1e-12:
                continue
            errs.append(abs(float(av) - float(ev)) / denom)
    return (sum(errs) / len(errs)) if errs else None
