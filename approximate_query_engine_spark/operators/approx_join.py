"""One-sided sampled join aggregation — AQP at the join level.

The reference's AQP layer is single-table by design (multi-table queries
run exact pass-through; reference ml_optimizer.py:301-333 never samples a
join input), and this engine's SQL rewrite path keeps that contract. But
at 100 TB the single biggest win is sampling the FACT side of a fact-dim
join *before* the join: a 1% fact sample cuts the probe-side shuffle and
the join work by 100× while dim tables stay exact (they broadcast either
way). This module provides that as an explicit, composable opt-in:

    fact_s = weighted_sample(lineitem, fraction=0.01, seed=42)
    joined = fact_s.join(orders, fact_s.l_orderkey == orders.o_orderkey)
    out = scaled_join_agg(joined, ["o_orderpriority"],
                          {"n": "COUNT(*)", "rev": "SUM(l_extendedprice)"})

Statistics: sampling exactly ONE side of the join keeps Horvitz–Thompson
estimators unbiased for COUNT/SUM (each joined output row inherits the
fact row's inclusion probability 1/w; fan-out multiplies rows and their
weights identically). The reported CIs treat joined rows as independent —
exact under FK uniqueness (each fact row matches ≤ 1 dim row, the
TPC-H-style shape), conservative-ish but approximate under fan-out where
siblings enter/leave together. Sampling BOTH sides of a join is NOT
supported: pair-inclusion probabilities stop being per-row and the naive
estimator biases low (use operators.estimate_join_size for that shape).

Two sampling designs:
- ``fraction`` + ``seed``: Bernoulli via a scan-time ``rand() < f``
  conjunct (predicate-pushdown-safe, same as the engine's inline path).
- ``every_k`` + ``key_expr``: deterministic systematic 1-in-k on portable
  integer arithmetic — reproducible across engines, which is what lets
  the driver contract oracle this operator (q63).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEIGHT_COL = "__weight"


def weighted_sample(
    df: DataFrame,
    fraction: float | None = None,
    seed: int = 42,
    every_k: int | None = None,
    key_expr: str | None = None,
    weight_col: str = WEIGHT_COL,
) -> DataFrame:
    """Sample ``df`` and attach the Horvitz–Thompson weight column
    (1/inclusion-probability) each surviving row carries through any
    subsequent joins/filters."""
    if (fraction is None) == (every_k is None):
        raise ValueError("exactly one of fraction / every_k is required")
    if fraction is not None:
        if not 0 < fraction <= 1:
            raise ValueError("fraction must be in (0, 1]")
        kept = df.where(F.rand(seed) < fraction)
        weight = 1.0 / fraction
    else:
        if not key_expr:
            raise ValueError("every_k requires key_expr (integer-valued SQL)")
        if int(every_k) < 1:
            raise ValueError("every_k must be >= 1")
        kept = df.where(F.expr(f"(({key_expr}) % {int(every_k)}) = 0"))
        weight = float(every_k)
    return kept.withColumn(weight_col, F.lit(weight))


def scaled_join_agg(
    joined: DataFrame,
    group_by: list[str],
    aggs: dict[str, str],
    weight_col: str = WEIGHT_COL,
    with_ci: bool = True,
    decimal_exact: bool = False,
) -> DataFrame:
    """Weight-aware scaled aggregation over a (sampled-fact ⋈ exact-dims)
    DataFrame. ``aggs`` maps output name → plain aggregate SQL on the
    joined columns (``COUNT(*)``, ``SUM(expr)``, ``AVG(expr)``).

    Reuses the engine's single rewrite point: the same ``_AggScaler`` that
    scales single-table sampled queries generates these expressions with
    the per-row inclusion probability ``1/weight`` — COUNT/SUM scale by w,
    AVG is the ratio estimator, and CIs are the same HT/linearized
    formulas validated by the CI-coverage tests.

    ``decimal_exact=True`` accumulates SUM/AVG through DECIMAL(18,2)
    (order-independent exact addition) instead of DOUBLE — bit-reproducible
    across engines/partitionings for oracle comparison; CIs are skipped in
    that mode (their squared sums are inherently order-dependent doubles).
    """
    from approximate_query_engine_spark.rewriter import Z_95, _AggScaler, _bt
    from approximate_query_engine_spark.sqlparser import parse

    view = "_ajq_" + uuid.uuid4().hex[:10]
    joined.createOrReplaceTempView(view)
    f_expr = f"(1.0 / {_bt(weight_col)})"
    scaler = _AggScaler(f_expr)
    select: list[str] = [_bt(c) for c in group_by]
    for name, agg_sql in aggs.items():
        parsed = parse(f"SELECT {agg_sql} AS x FROM {view}")
        item = parsed.select_items[0]
        if item.agg is None:
            raise ValueError(f"{name}: not a recognized aggregate: {agg_sql}")
        agg = item.agg
        if decimal_exact:
            select.append(f"{_decimal_scaled(agg, weight_col)} AS {_bt(name)}")
            continue
        select.append(f"{scaler.scaled(agg)} AS {_bt(name)}")
        if with_ci:
            se = scaler.se_expr(agg)
            if se is not None:
                est = scaler.scaled(agg)
                select.append(
                    f"({est}) - {Z_95} * ({se}) AS {_bt(name + '_ci_low')}"
                )
                select.append(
                    f"({est}) + {Z_95} * ({se}) AS {_bt(name + '_ci_high')}"
                )
    sql = f"SELECT {', '.join(select)} FROM {view}"
    if group_by:
        sql += " GROUP BY " + ", ".join(_bt(c) for c in group_by)
    spark = joined.sparkSession
    out = spark.sql(sql)  # analysis is eager: the plan is resolved here
    spark.catalog.dropTempView(view)  # don't leak a view per call
    return out


def _decimal_scaled(agg, weight_col: str) -> str:
    """Order-independent (decimal-accumulated) scaled aggregate — the
    engine-portable rendering used when results must hash-match an
    external oracle. Weight values are small integers in the systematic
    design, so DECIMAL(18,2) × DECIMAL(18,2) stays exact."""
    w = f"CAST(`{weight_col}` AS DECIMAL(18,2))"
    if agg.func == "COUNT":
        base = (
            f"`{weight_col}`"
            if agg.is_star
            else f"CASE WHEN ({agg.arg}) IS NOT NULL THEN `{weight_col}` END"
        )
        return f"CAST(ROUND(COALESCE(SUM({base}), 0.0)) AS BIGINT)"
    x = f"CAST(({agg.arg}) AS DECIMAL(18,2))"
    if agg.func == "SUM":
        return f"CAST(SUM({x} * {w}) AS DOUBLE)"
    if agg.func == "AVG":
        cnt = f"SUM(CASE WHEN ({agg.arg}) IS NOT NULL THEN `{weight_col}` END)"
        return f"CAST(CAST(SUM({x} * {w}) AS DOUBLE) / ({cnt}) AS DOUBLE)"
    raise ValueError(f"{agg.func} has no decimal-exact scaled form")
