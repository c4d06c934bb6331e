"""Structured Streaming operators over the events table.

The reference lists streaming as an unimplemented stretch goal
(reference README.md:315-317; SURVEY.md §2.9 confirms no code). These are
the Spark-native realizations, exercised in tests by replaying the events
Parquet through ``readStream`` + a memory sink with
``processAllAvailable()`` (synchronous completion — the documented local
smoke pattern). In production the same plans run unchanged over Kafka with
checkpointing; watermarks bound state for late data.

Operators:
- windowed aggregation with watermark + approx_count_distinct (streaming
  HLL++ — partial sketches merge in state store);
- streaming dedup (dropDuplicatesWithinWatermark on event_id);
- custom stateful op: per-user running counts via
  ``applyInPandasWithState`` (the escape hatch for operators Spark lacks).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the file-stream source requires a directory: stream the sf_dir with a
    # glob filter selecting just the events file
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # events.ts needs normalizing to plain TIMESTAMP for withWatermark
    # (see session.py): nanos-as-long → µs timestamp, TIMESTAMP_NTZ (µs
    # parquet without tz, the round-2 testdata layout) → timestamp (session
    # tz is UTC, value-preserving).
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        from approximate_query_engine_spark.session import nanos_to_micros_ts

        stream = stream.withColumn("ts", nanos_to_micros_ts("ts"))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_to_completion(
    df: DataFrame, mode: str, state_partitions: int | None = None
) -> DataFrame:
    """Start a memory-sink query, drain all available input, return the
    result as a batch DataFrame.

    ``state_partitions`` (round 14, guide §2.2/§5): the number of
    STATEFUL-operator partitions the query starts with — a state-SIZE
    knob, not a core-count one. Every state partition owns a state-store
    instance whose per-trigger snapshot/commit overhead is paid even when
    it holds a handful of keys; a job whose keyspace is hundreds of
    (window, group) pairs wants single-digit stores, a job tracking
    millions of keys wants many. Results are partitioning-independent for
    every aggregation used here (exact counts, commutative HLL merges,
    decimal sums on oracle-verified paths). Default ``None`` keeps the
    session's ``spark.sql.shuffle.partitions`` — existing callers are
    byte-for-byte unchanged."""
    spark = df.sparkSession
    prev = None
    if state_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(int(state_partitions))
        )
    name = "aqe_stream_" + uuid.uuid4().hex[:8]
    try:
        q = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return df.sparkSession.sql(f"SELECT * FROM {name}")


def run_streaming_window_agg(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    portable_sums: bool = False,
    state_partitions: int | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation: per (window, event_type)
    row count, value sum, and approximate distinct users (HLL++ merged in
    the state store). Output: window_start, event_type, n, total_value,
    approx_users.

    ``portable_sums=True`` accumulates ``total_value`` in DECIMAL(18,2)
    (exact, order-independent addition) and emits DOUBLE only at the end —
    so the sum is bit-identical to any other engine's, letting the driver
    hash-verify the streaming output against a batch SQL oracle. Default
    stays native double sums (cheapest state).
    """
    events = _events_stream(spark, sf_dir)
    value_sum = (
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
        if portable_sums
        else F.sum("value")
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            value_sum.alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
            "approx_users",
        )
    )
    return _run_to_completion(agg, "append", state_partitions=state_partitions)


def run_streaming_dedup(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "1 hour",
    state_partitions: int | None = None,
) -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming analog of :func:`functions.dedup.dedup_exact`; state is
    bounded by the watermark.

    ``state_partitions`` (round 15, guide §2.2/§5 — same knob as
    :func:`run_streaming_window_agg`): dedup state is keyed by event_id,
    so size it to the expected events-per-watermark-horizon, NOT the core
    count. Results are partitioning-independent (exact dedup + exact
    counts). Default ``None`` keeps the session conf — existing callers
    unchanged."""
    events = _events_stream(spark, sf_dir)
    deduped = (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_events"))
    )
    return _run_to_completion(
        deduped, "complete", state_partitions=state_partitions
    )


def run_stateful_user_counts(
    spark: SparkSession,
    sf_dir: str,
    min_events: int = 50,
    state_partitions: int | None = None,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    event counters kept in explicit state, emitting users whose lifetime
    count crosses ``min_events``. Demonstrates the arbitrary-stateful
    escape hatch (GroupState, timeout-free).

    ``state_partitions`` (round 15, guide §2.2/§5): user-count state is
    keyed by user_id — size to the tracked-user cardinality, not cores.
    Emission is per-user and partitioning-independent. Default ``None``
    keeps the session conf."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    events = _events_stream(spark, sf_dir).select("user_id", "event_id")

    def update(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        if total >= min_events:
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    out = events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_completion(
        out, "update", state_partitions=state_partitions
    )


def run_streaming_sessions(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "360 minutes",
    watermark: str = "24 hours",
    state_partitions: int | None = None,
) -> DataFrame:
    """Streaming sessionization with Spark's native ``session_window``:
    per-(user, session) event count, value sum, and duration. The
    watermark bounds state — a session closes once the watermark passes
    its end (last event + gap), so state size is O(open sessions), the
    correct incremental analog of ``operators.sessionize`` (batch
    equivalence pinned in tests/test_streaming.py).

    Complete output mode (session windows support append/complete only;
    update is rejected because sessions merge): every session, open or
    finalized, is in the sink after each batch, so draining a bounded
    input yields exactly the batch result. A production deployment on an
    unbounded stream would use append mode — it emits only watermark-
    finalized sessions and evicts their state.

    ``state_partitions`` (round 15, guide §2.2/§5): session state is
    keyed by (user_id, session) — size to the expected OPEN-session count
    per trigger, not cores. Session-window merge is order-independent, so
    results don't depend on the partitioning. Default ``None`` keeps the
    session conf — the declared q62 parity path is byte-for-byte
    unchanged."""
    events = _events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    return _run_to_completion(
        agg, "complete", state_partitions=state_partitions
    )


def stream_to_partitioned_layout(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    grain: str = "day",
    checkpoint: str | None = None,
) -> DataFrame:
    """Streaming ingestion INTO the time-partitioned storage layout
    (operators/partitioning.py): an append-mode parquet sink partitioned
    by the derived time bucket, drained with ``availableNow``. The batch
    engine reads the same directory (``read_partitioned``) and routes
    exact time-bounded queries to it — events stream in, dashboards prune
    at file-listing time, no separate handoff/compaction step. The
    checkpoint makes ingestion exactly-once across restarts (the parquet
    sink is idempotent per epoch); at 100 TB this is the continuous
    producer of the layout the whole exact path scans."""
    from approximate_query_engine_spark.operators.partitioning import (
        _GRAIN_FMT,
    )

    stream = _events_stream(spark, sf_dir).withColumn(
        "p_bucket", F.date_format(F.col("ts"), _GRAIN_FMT[grain])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint or path + "__chk")
        .partitionBy("p_bucket")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(path)


def stream_to_rollup(
    stream: DataFrame,
    spec,
    path: str,
    checkpoint: str | None = None,
) -> DataFrame:
    """Streaming ingestion INTO a materialized rollup — the push-based
    continuous aggregate: each micro-batch's rows are aggregated to
    partial count/sum/min/max state and MERGED into the affected date
    directories of the rollup layout (operators/rollup.merge_rollup_batch
    — mergeable state, so late data folds in exactly with no watermark
    needed for correctness; the foreachBatch batch_id arms the merge's
    idempotency guard, making the sink effectively-once under Structured
    Streaming's at-least-once replay). Batch dashboards then answer from
    the same layout via engine._route_rollup while events keep streaming
    in. ``stream`` is any streaming DataFrame carrying ``spec.time_col``,
    dims, and measures (Kafka in production; the parquet replay in
    tests)."""
    from approximate_query_engine_spark.operators.rollup import (
        merge_rollup_batch,
    )

    spark = stream.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_rollup_batch(spark, batch_df, spec, path, batch_id=batch_id)

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint or path + "__chk")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(path)
