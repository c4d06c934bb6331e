"""Gap-based sessionization — the canonical event-pipeline operator.

The reference has no event/session concept at all (its only tables are
sales/users/products — reference seed.py:14-76); this is part of the
large-scale-pipeline extension surface, over the driver's ``events`` table.

Composition of built-in window functions, no Python on the row path:

1. ``LAG(ts)`` per entity ordered by ``(ts, tiebreak)`` marks rows whose
   gap from the previous event exceeds ``gap_minutes`` (or that have no
   previous event) as session starts.
2. A running ``SUM`` of the start flags over the same window numbers each
   entity's sessions 1..k; ``session_id`` is ``(entity, session_idx)``.

Scale notes (100 TB): exactly ONE shuffle, on the entity column — the two
window functions share a single (partition, order) spec, so Catalyst
evaluates them in one Window operator over one sort. Per-entity data must
fit a task's spill budget (standard for sessionization — entities are
users, not the whole table); a single pathological entity serializes its
own partition only. AQE skew handling does not split windows, so for
known-hot entities pre-filter or cap their event count upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    tiebreak_col: str | None = None,
    session_col: str = "session_idx",
) -> DataFrame:
    """Append ``session_col``: 1-based session index per entity, where a
    gap >= ``gap_minutes`` between consecutive events starts a new
    session — the same end-exclusive boundary rule as Spark's native
    ``session_window`` (an event landing exactly at last_ts + gap falls
    outside the [last_ts, last_ts + gap) window), so the batch and
    streaming paths agree on every input, boundary cases included.

    ``tiebreak_col`` makes ordering total when timestamps collide (e.g. an
    event id); without it, equal-ts rows order arbitrarily within the tie
    and session boundaries stay deterministic only across distinct ts.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    # integer µs arithmetic: exact, and reproducible in any engine with
    # epoch-microseconds (the DuckDB oracle uses epoch_us) — a float epoch
    # could flip a boundary row at large magnitudes
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    threshold_us = int(round(gap_minutes * 60.0 * 1_000_000))
    is_new = F.when(
        prev_ts.isNull() | (gap_us >= F.lit(threshold_us)), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(entity_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(session_col, F.sum(is_new).over(running))


def session_stats(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per (entity, session): event count, start/end, duration.

    → columns: entity, session_idx, n_events, session_start, session_end,
    duration_sec (bigint seconds, end − start).
    """
    s = sessionize(events, entity_col, ts_col, gap_minutes, tiebreak_col)
    return s.groupBy(entity_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("duration_sec"),
    )
