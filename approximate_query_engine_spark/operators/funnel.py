"""Ordered funnel analysis: how many entities completed step 1, then
step 2 strictly after it, then step 3 after that, ...

No reference counterpart (the reference has no event model); part of the
event-pipeline extension surface alongside sessionization.

Implementation is k−1 self-narrowing rounds (k = number of steps, small
and fixed): round i keeps, per entity, the EARLIEST occurrence of step i
that is strictly after the entity's step-(i−1) time. Earliest-completion
semantics make the count maximal (greedy earliest matching is optimal for
"did the ordered sequence occur?").

Scale notes (100 TB): every round is a filter on one step's events (tiny
vs the table; predicate pushes into the scan) + a groupBy(entity) + a join
on entity — all shuffles on the SAME key, so with the default partitioning
Catalyst reuses one exchange layout; candidate entities only shrink round
over round. No per-entity arrays are collected, so a hot entity costs
nothing beyond its own event count. ``max_window_sec`` optionally bounds
the whole journey (step k within w seconds of step 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_window_sec: float | None = None,
) -> DataFrame:
    """→ (step_idx, step, n_entities): entities whose events contain the
    ``steps`` sequence in strict time order up to each prefix length.

    n_entities is monotonically non-increasing in step_idx by
    construction. Strictly-after semantics: two steps sharing one exact
    timestamp do NOT chain (portable — no tiebreak ambiguity).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(entity_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    if max_window_sec is not None:
        reached = reached.withColumn("__t0", F.col("__t"))
    counts = [(1, steps[0], reached.count())]
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.where(F.col(type_col) == step).select(
            F.col(entity_col), F.col(ts_col).alias("__ts")
        )
        joined = nxt.join(reached, entity_col).where(F.col("__ts") > F.col("__t"))
        if max_window_sec is not None:
            joined = joined.where(
                F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__t0"))
                <= int(max_window_sec * 1_000_000)
            )
        carry = [F.min("__ts").alias("__t")] + (
            [F.first("__t0").alias("__t0")] if max_window_sec is not None else []
        )
        reached = joined.groupBy(entity_col).agg(*carry)
        counts.append((i, step, reached.count()))
    spark = events.sparkSession
    return spark.createDataFrame(
        counts, "step_idx int, step string, n_entities bigint"
    )


def funnel_users(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """→ (entity, completed_ts): entities that completed the FULL funnel,
    with the timestamp of their final (earliest-completion) step. The
    row-level companion to :func:`funnel` for downstream joins."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(entity_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    for step in steps[1:]:
        nxt = events.where(F.col(type_col) == step).select(
            F.col(entity_col), F.col(ts_col).alias("__ts")
        )
        reached = (
            nxt.join(reached, entity_col)
            .where(F.col("__ts") > F.col("__t"))
            .groupBy(entity_col)
            .agg(F.min("__ts").alias("__t"))
        )
    return reached.select(entity_col, F.col("__t").alias("completed_ts"))
