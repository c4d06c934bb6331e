"""Cohort retention analysis: of the entities whose FIRST event fell in
cohort period C, how many were active again in period C+k?

No reference counterpart (no event model there); completes the event-
operator trio (sessionize, funnel, retention) of the pipeline extension
surface.

Composition: the cohort (period of the entity's first event) comes from
a ``MIN(ts) OVER (PARTITION BY entity)`` window rather than a
groupBy+join-back — one shuffle on the entity key instead of two plus a
join. Then one distinct over (entity, period, cohort) and one small
final count: three shuffles total, nothing ever collected per entity.
Periods are date_trunc buckets, so offsets are exact integer arithmetic
(no float date math), reproducible in any engine with the same week
convention (Spark and DuckDB both truncate weeks to Monday).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PERIOD_DAYS = {"day": 1, "week": 7}


def cohort_retention(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """→ (cohort_start date, period_offset int, n_entities bigint):
    entities first seen in ``cohort_start``'s period that were active
    ``period_offset`` periods later. Offset 0 row = cohort size (every
    entity is active in its own first period by definition).

    ``period``: 'day' or 'week' (month offsets are not constant-width;
    use date_trunc externally and difference months yourself if needed).
    """
    if period not in _PERIOD_DAYS:
        raise ValueError(f"period must be one of {sorted(_PERIOD_DAYS)}")
    days = _PERIOD_DAYS[period]
    from pyspark.sql import Window

    w = Window.partitionBy(entity_col)
    per_event = events.select(
        F.col(entity_col),
        F.date_trunc(period, F.col(ts_col)).cast("date").alias("__p"),
        F.date_trunc(period, F.min(ts_col).over(w))
        .cast("date")
        .alias("cohort_start"),
    )
    # cohort_start is functionally dependent on the entity, so the
    # distinct key is effectively (entity, period)
    distinct_active = per_event.distinct()
    offset = (
        F.datediff(F.col("__p"), F.col("cohort_start")) / F.lit(days)
    ).cast("int")
    return (
        distinct_active.select(
            "cohort_start", offset.alias("period_offset"), F.col(entity_col)
        )
        .groupBy("cohort_start", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_entities"))
    )
