"""Ordered funnel analysis: how many entities completed step 1, then
step 2 strictly after it, then step 3 after that, ...

No reference counterpart (the reference has no event model); part of the
event-pipeline extension surface alongside sessionization.

Matching semantics: an entity reaches step i if ANY chain of events
s₁ < s₂ < ... < sᵢ (strict time order) exists, and — when
``max_window_sec`` is given — the whole chain fits in a window starting
at its OWN step-1 event (not merely the entity's earliest step-1). The
implementation links each step-i event to the LATEST chained step-(i−1)
event strictly before it. Chain starts are monotone in event time (the
latest-signup-before function is non-decreasing), so the latest
predecessor always carries the maximal feasible chain start — greedy
latest-predecessor matching is optimal under a journey window.

Each round is the as-of-join union-window composition (operators/asof.py
pattern): union tagged predecessor and current-step events, one window
per entity ordered by time, ``last(chain_start, ignorenulls)`` over the
strictly-preceding frame. One shuffle per step, all on the entity key;
no per-entity arrays. Rounds are ``localCheckpoint``-ed so counting
round i never re-executes rounds 1..i−1 (k rounds cost O(k) scans, not
O(k²)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _chained_steps(
    events: DataFrame,
    steps: list[str],
    entity_col: str,
    type_col: str,
    ts_col: str,
    max_window_sec: float | None,
):
    """Yield (step, chained) per step, where ``chained`` has one row per
    event completing a prefix chain: (entity, __ts, __t0 = chain start).
    Each round is lazily localCheckpoint-ed: materialized once on first
    action, reused by later rounds and by counting."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    ts_type = events.schema[ts_col].dataType
    first = (
        events.where(F.col(type_col) == steps[0])
        .select(F.col(entity_col), F.col(ts_col).alias("__ts"))
        .withColumn("__t0", F.col("__ts"))
    ).localCheckpoint(eager=False)
    yield steps[0], first
    chained = first
    win_us = (
        int(max_window_sec * 1_000_000) if max_window_sec is not None else None
    )
    for step in steps[1:]:
        prev_tagged = chained.select(
            F.col(entity_col),
            "__ts",
            F.lit(1).alias("__is_prev"),
            "__t0",
        )
        cur_tagged = (
            events.where(F.col(type_col) == step)
            .select(F.col(entity_col), F.col(ts_col).alias("__ts"))
            .withColumn("__is_prev", F.lit(0))
            .withColumn("__t0", F.lit(None).cast(ts_type))
        )
        u = prev_tagged.unionByName(cur_tagged)
        # order: time asc; at equal time current-step rows sort BEFORE
        # predecessors (strict-after: a same-ts predecessor must not be in
        # the frame); among equal-ts predecessors, the largest chain start
        # sorts last and wins the carry
        w = (
            Window.partitionBy(entity_col)
            .orderBy("__ts", "__is_prev", "__t0")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        nxt = (
            u.withColumn("__carry", F.last("__t0", ignorenulls=True).over(w))
            .where((F.col("__is_prev") == 0) & F.col("__carry").isNotNull())
        )
        if win_us is not None:
            nxt = nxt.where(
                F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__carry"))
                <= win_us
            )
        chained = nxt.select(
            F.col(entity_col), "__ts", F.col("__carry").alias("__t0")
        ).localCheckpoint(eager=False)
        yield step, chained


def funnel(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_window_sec: float | None = None,
) -> DataFrame:
    """→ (step_idx, step, n_entities): entities with an ordered event
    chain reaching each prefix of ``steps`` (see module docstring for the
    window semantics). n_entities is monotonically non-increasing.
    Strictly-after ordering: two steps sharing one exact timestamp do NOT
    chain (portable — no tiebreak ambiguity)."""
    counts = []
    for i, (step, chained) in enumerate(
        _chained_steps(
            events, steps, entity_col, type_col, ts_col, max_window_sec
        ),
        start=1,
    ):
        n = chained.select(entity_col).distinct().count()
        counts.append((i, step, n))
    return events.sparkSession.createDataFrame(
        counts, "step_idx int, step string, n_entities bigint"
    )


def funnel_users(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_window_sec: float | None = None,
) -> DataFrame:
    """→ (entity, completed_ts): entities that completed the FULL funnel,
    with the timestamp of their earliest completing final step. The
    row-level companion to :func:`funnel` for downstream joins."""
    last_chained = None
    for _, chained in _chained_steps(
        events, steps, entity_col, type_col, ts_col, max_window_sec
    ):
        last_chained = chained
    return last_chained.groupBy(entity_col).agg(
        F.min("__ts").alias("completed_ts")
    )
