"""Structured Streaming operator tests: replay the events Parquet through
readStream and check the results against the batch-equivalent queries."""

import pytest
from pyspark.sql import functions as F

from approximate_query_engine_spark.streaming import (
    run_stateful_user_counts,
    run_streaming_dedup,
    run_streaming_window_agg,
)

SF = "/root/testdata/sf0.001"


def test_window_agg_matches_batch(spark, engine):
    out = run_streaming_window_agg(spark, SF, window="1 day")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in out.collect()
    }
    batch = (
        spark.table("events")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .select(F.col("window.start").alias("ws"), "event_type", "n", "v")
        .collect()
    )
    want = {(r["ws"], r["event_type"]): (r["n"], r["v"]) for r in batch}
    # append mode withholds windows the watermark has not closed when the
    # stream ends — only the final window per type may be missing
    last_window = max(ws for ws, _ in want)
    missing = set(want) - set(got)
    assert missing <= {k for k in want if k[0] == last_window}, missing
    assert set(got) <= set(want)
    assert len(got) >= len(want) - len([k for k in want if k[0] == last_window])
    for k, (n, v) in got.items():
        assert want[k][0] == n
        assert want[k][1] == pytest.approx(v)


def test_window_agg_approx_users_close(spark):
    out = run_streaming_window_agg(spark, SF, window="30 days")
    total_types = out.select("event_type").distinct().count()
    assert total_types >= 2
    for r in out.collect():
        assert 0 < r["approx_users"] <= 200  # 150 distinct users in testdata


def test_streaming_dedup_counts(spark, engine):
    out = run_streaming_dedup(spark, SF)
    got = {r["event_type"]: r["n_unique_events"] for r in out.collect()}
    batch = {
        r["event_type"]: r["n"]
        for r in spark.sql(
            "SELECT event_type, COUNT(DISTINCT event_id) AS n FROM events "
            "GROUP BY event_type"
        ).collect()
    }
    assert got == batch


def test_stateful_user_counts(spark, engine):
    out = run_stateful_user_counts(spark, SF, min_events=5)
    rows = {r["user_id"]: r["n_events"] for r in out.collect()}
    batch = {
        r["user_id"]: r["n"]
        for r in spark.sql(
            "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id "
            "HAVING COUNT(*) >= 5"
        ).collect()
    }
    assert set(rows) == set(batch)
    for uid, n in batch.items():
        assert rows[uid] == n


def test_streaming_sessions_match_batch(spark, engine):
    """Streaming session_window == batch session_window when the stream is
    fully drained (availableNow): same sessions, counts, and value sums."""
    from pyspark.sql import functions as F

    from approximate_query_engine_spark.streaming.approx_stream import (
        run_streaming_sessions,
    )

    out = run_streaming_sessions(spark, "/root/testdata/sf0.001")
    batch = (
        spark.table("events")
        .groupBy("user_id", F.session_window("ts", "360 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
    s = sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in out.collect()
    )
    b = sorted(tuple(r) for r in batch.collect())
    assert s == b and len(s) > 0


def test_stream_into_partitioned_layout(spark, engine, tmp_path):
    """Streaming ingestion writes the SAME day-partitioned layout the
    batch engine prunes: row-complete vs the batch table, day directories
    on disk, and a one-day filter reads exactly one partition
    (measured)."""
    import glob

    from pyspark.sql import functions as F

    from approximate_query_engine_spark.operators.partitioning import (
        scan_metrics,
    )
    from approximate_query_engine_spark.streaming.approx_stream import (
        stream_to_partitioned_layout,
    )

    path = str(tmp_path / "events_stream_layout")
    out = stream_to_partitioned_layout(
        spark, "/root/testdata/sf0.001", path, grain="day"
    )
    assert out.count() == spark.table("events").count()
    assert len(glob.glob(f"{path}/p_bucket=2024-01-*")) >= 25
    m = scan_metrics(
        out.filter(F.col("p_bucket") == "2024-01-02")
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert m["partitions_read"] == 1, m


def test_stream_to_rollup_merges_batches(spark, tmp_path):
    """Push-based continuous aggregate: micro-batches merge partial
    count/sum/min/max state into the rollup layout; the drained result
    equals the one-shot batch rollup of the same rows, replaying a batch
    id is a no-op, and the layout then serves routed engine SQL."""
    import datetime
    import tempfile

    from pyspark.sql import functions as F

    from approximate_query_engine_spark import AQEngine
    from approximate_query_engine_spark.operators.rollup import (
        RollupSpec,
        materialize_rollup,
        merge_rollup_batch,
    )
    from approximate_query_engine_spark.streaming.approx_stream import (
        stream_to_rollup,
    )

    base = datetime.datetime(2024, 5, 1)
    rows = [
        (
            base + datetime.timedelta(days=d, hours=h, minutes=7 * (h % 3)),
            ["click", "view"][h % 2],
            float(d * 100 + h),
            f"u{(d * 24 + h) % 17}",
        )
        for d in range(3)
        for h in range(24)
    ]
    schema = "ts timestamp, event_type string, value double, uid string"
    src_dir = str(tmp_path / "src")
    # one file per day => three micro-batches with maxFilesPerTrigger=1,
    # so the MERGE path (existing dirs + new partials) is exercised
    for d in range(3):
        day = [r for r in rows if r[0].day == 1 + d]
        spark.createDataFrame(day, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )
    spec = RollupSpec(
        "stream_roll_src", "ts", "1 hour", ["event_type"], ["value"],
        distinct_cols=["uid"],
    )
    path = str(tmp_path / "rollup")
    streamed = stream_to_rollup(stream, spec, path).drop("p_date")

    spark.createDataFrame(rows, schema).createOrReplaceTempView(
        "stream_roll_src"
    )
    batch = materialize_rollup(spark, spec)  # unmaterialized reference

    def snap(df):
        return sorted(
            (
                str(r["bucket_start"]),
                r["event_type"],
                r["n_rows"],
                r["value_count"],
                round(r["value_sum"], 6),
                r["value_min"],
                r["value_max"],
            )
            for r in df.collect()
        )

    assert snap(streamed) == snap(batch)
    # sketch columns union across micro-batches: the merged distinct
    # estimate sees every batch's uids (17 true; HLL exact at this size)
    est = (
        spark.read.parquet(path)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("uid_hll")).alias("d"))
        .collect()[0]["d"]
    )
    assert est == 17, est
    # replaying an already-merged batch id is a no-op
    out = merge_rollup_batch(
        spark,
        spark.createDataFrame(rows[:5], schema),
        spec,
        path,
        batch_id=0,
    )
    assert out == {"merged": False, "reason": "batch already merged"}
    assert snap(spark.read.parquet(path).drop("p_date")) == snap(batch)
    # the streamed layout serves ROUTED engine SQL (register by hand —
    # the layout was produced by the stream, not create_rollup)
    eng = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_stream_ru_"))
    eng.catalog.upsert_table_stats("stream_roll_src", len(rows))
    files_view = spec.rollup_name + "__files"
    spark.read.parquet(path).createOrReplaceTempView(files_view)
    eng.catalog.rollups["stream_roll_src"] = [
        {
            "source_table": "stream_roll_src",
            "view": spec.rollup_name,
            "files_view": files_view,
            "path": path,
            "time_col": "ts",
            "bucket": "1 hour",
            "bucket_seconds": 3600,
            "dims": ["event_type"],
            "measures": ["value"],
            "built_row_count": len(rows),
        }
    ]
    sql = (
        "SELECT event_type, COUNT(*) AS n, MIN(value) AS mn, MAX(value) AS mx "
        "FROM stream_roll_src WHERE ts >= TIMESTAMP '2024-05-02 00:00:00' "
        "GROUP BY event_type ORDER BY event_type"
    )
    r = eng.query(sql)
    assert "answered from materialized rollup" in r["plan"]["reason"]
    raw = [x.asDict() for x in spark.sql(sql).collect()]
    assert [
        (d["event_type"], d["n"], d["mn"], d["mx"]) for d in r["result"]
    ] == [(d["event_type"], d["n"], d["mn"], d["mx"]) for d in raw]


def test_merge_rollup_batch_crash_windows(spark, tmp_path):
    """Round-7: the staged-swap merge protocol is effectively-once across
    every crash position — (a) crash after the staged merge is complete
    but before any/all renames: a replay finishes the swap instead of
    recomputing against half-swapped data; (b) crash before the staging
    manifest exists: the live layout is untouched, the replay recomputes;
    (c) replay of a fully-published batch is a no-op even with no
    separate meta file (the marker travels inside each date dir)."""
    import datetime
    import json
    import os
    import shutil

    from approximate_query_engine_spark.operators import rollup as ru

    base = datetime.datetime(2024, 9, 1)
    schema = "ts timestamp, event_type string, value double"

    def mkdf(day, n, v0=0.0):
        return spark.createDataFrame(
            [
                (
                    base + datetime.timedelta(days=day, hours=h % 24),
                    "a",
                    v0 + h,
                )
                for h in range(n)
            ],
            schema,
        )

    spec = ru.RollupSpec("crash_src", "ts", "1 hour", ["event_type"], ["value"])
    path = str(tmp_path / "roll")
    ru.merge_rollup_batch(spark, mkdf(0, 24), spec, path, batch_id=0)

    def totals():
        r = spark.read.parquet(path)
        agg = r.selectExpr(
            "SUM(n_rows) AS n", "SUM(value_sum) AS sv"
        ).collect()[0]
        return agg["n"], agg["sv"]

    n0, sv0 = totals()
    assert n0 == 24

    # (c) replay of the fully-published batch 0: no-op, no double counts
    out = ru.merge_rollup_batch(spark, mkdf(0, 24), spec, path, batch_id=0)
    assert out == {"merged": False, "reason": "batch already merged"}
    assert totals() == (n0, sv0)

    # (a) batch 1 (same day => true merge): stage completes, swap never
    # runs (simulated crash between manifest write and publish)
    real_publish = ru._publish_staging

    def boom(p):
        raise RuntimeError("crash before swap")

    ru._publish_staging = boom
    try:
        with pytest.raises(RuntimeError):
            ru.merge_rollup_batch(
                spark, mkdf(0, 12, v0=100.0), spec, path, batch_id=1
            )
    finally:
        ru._publish_staging = real_publish
    # live layout untouched so far; staging manifest is durable
    assert totals() == (n0, sv0)
    assert os.path.exists(os.path.join(path, "_staging", "_batch.json"))
    # replay of batch 1 recovers by finishing the swap — applied ONCE
    out = ru.merge_rollup_batch(
        spark, mkdf(0, 12, v0=100.0), spec, path, batch_id=1
    )
    assert out["merged"] is True and out.get("recovered") is True
    n1, sv1 = totals()
    assert n1 == 36 and sv1 == pytest.approx(
        sv0 + sum(100.0 + h for h in range(12))
    )
    assert not os.path.exists(os.path.join(path, "_staging"))
    # and replaying batch 1 AGAIN after full publish: no-op
    out = ru.merge_rollup_batch(
        spark, mkdf(0, 12, v0=100.0), spec, path, batch_id=1
    )
    assert out == {"merged": False, "reason": "batch already merged"}
    assert totals() == (n1, sv1)

    # (a') partial swap: re-stage batch 2, publish only SOME dates by
    # hand, crash, then replay — the remaining staged dirs move over and
    # already-moved ones are not re-applied
    ru._publish_staging = boom
    try:
        with pytest.raises(RuntimeError):
            ru.merge_rollup_batch(
                spark, mkdf(0, 6, v0=500.0).union(mkdf(1, 6, v0=900.0)),
                spec, path, batch_id=2,
            )
    finally:
        ru._publish_staging = real_publish
    staging = os.path.join(path, "_staging")
    staged = sorted(
        d for d in os.listdir(staging) if d.startswith("p_date=")
    )
    assert staged == ["p_date=2024-09-01", "p_date=2024-09-02"]
    # hand-publish ONE date (as the crashed process would have)
    tgt = os.path.join(path, staged[0])
    shutil.rmtree(tgt)
    os.rename(os.path.join(staging, staged[0]), tgt)
    out = ru.merge_rollup_batch(
        spark, mkdf(0, 6, v0=500.0).union(mkdf(1, 6, v0=900.0)),
        spec, path, batch_id=2,
    )
    assert out["merged"] is True and out.get("recovered") is True
    n2, sv2 = totals()
    assert n2 == 48
    assert sv2 == pytest.approx(
        sv1
        + sum(500.0 + h for h in range(6))
        + sum(900.0 + h for h in range(6))
    )

    # (b) INCOMPLETE staging (no manifest) is discarded and recomputed
    os.makedirs(os.path.join(staging, "p_date=2024-09-09"), exist_ok=True)
    out = ru.merge_rollup_batch(spark, mkdf(2, 4), spec, path, batch_id=3)
    assert out["merged"] is True and "recovered" not in out
    assert totals()[0] == 52
    assert not os.path.exists(os.path.join(path, "p_date=2024-09-09"))

    # markers live inside the date dirs and record the right batch
    m = json.load(
        open(os.path.join(path, "p_date=2024-09-01", "_merged_batch.json"))
    )
    assert m["last_batch_id"] == 2


def test_merge_recovery_publishes_newer_staged_batch(spark, tmp_path):
    """A complete staged merge is published even when the NEXT merge call
    carries a different (or no) batch_id — staged state is always safe
    to finish, and the replayed older batch then classifies as already
    merged from the in-dir markers."""
    import datetime
    import os

    from approximate_query_engine_spark.operators import rollup as ru

    base = datetime.datetime(2024, 10, 1)
    schema = "ts timestamp, event_type string, value double"

    def mkdf(n, v0=0.0):
        return spark.createDataFrame(
            [(base + datetime.timedelta(hours=h % 24), "a", v0 + h) for h in range(n)],
            schema,
        )

    spec = ru.RollupSpec("rec_src", "ts", "1 hour", ["event_type"], ["value"])
    path = str(tmp_path / "roll")
    ru.merge_rollup_batch(spark, mkdf(24), spec, path, batch_id=0)

    def total_n():
        return spark.read.parquet(path).selectExpr("SUM(n_rows) AS n").collect()[0]["n"]

    # stage batch 1 fully but crash before any swap
    real = ru._publish_staging
    ru._publish_staging = lambda p: (_ for _ in ()).throw(RuntimeError("x"))
    try:
        with pytest.raises(RuntimeError):
            ru.merge_rollup_batch(spark, mkdf(12, 100.0), spec, path, batch_id=1)
    finally:
        ru._publish_staging = real
    assert total_n() == 24
    # a batch_id=None merge call first completes batch 1's staged swap,
    # then applies its own rows
    out = ru.merge_rollup_batch(spark, mkdf(6, 500.0), spec, path)
    assert out["merged"] is True
    assert total_n() == 24 + 12 + 6
    assert not os.path.exists(os.path.join(path, "_staging"))
    # replaying batch 1 now: markers say already merged — no double apply
    out = ru.merge_rollup_batch(spark, mkdf(12, 100.0), spec, path, batch_id=1)
    assert out == {"merged": False, "reason": "batch already merged"}
    assert total_n() == 42


def test_stream_to_rollup_carries_sketch_state(spark, tmp_path):
    """Micro-batch merges must carry EVERY sketch-state kind (HLL, KLL,
    top-k, theta): a streamed three-batch build answers identically to
    the one-shot batch rollup — compared on ESTIMATES (sketch binaries
    may differ by merge order; below their budgets the answers cannot)."""
    import datetime

    from pyspark.sql import functions as F

    from approximate_query_engine_spark.operators.rollup import (
        RollupSpec,
        materialize_rollup,
    )
    from approximate_query_engine_spark.streaming.approx_stream import (
        stream_to_rollup,
    )

    base = datetime.datetime(2024, 5, 1)
    rows = [
        (
            base + datetime.timedelta(days=d, hours=h, minutes=7 * (h % 3)),
            ["click", "view"][h % 2],
            float(d * 100 + h),
            f"u{(d * 24 + h) % 17}",
        )
        for d in range(3)
        for h in range(24)
    ]
    schema = "ts timestamp, event_type string, value double, uid string"
    src_dir = str(tmp_path / "src")
    for d in range(3):
        day = [r for r in rows if r[0].day == 1 + d]
        spark.createDataFrame(day, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )
    spec = RollupSpec(
        "stream_sketch_src",
        "ts",
        "1 hour",
        ["event_type"],
        ["value"],
        distinct_cols=["uid"],
        quantile_cols=["value"],
        kll_k=800,
        topk_cols=["uid"],
        topk_budget=1024,
        theta_cols=["uid"],
    )
    path = str(tmp_path / "rollup_sketch")
    stream_to_rollup(stream, spec, path)
    spark.createDataFrame(rows, schema).createOrReplaceTempView(
        "stream_sketch_src"
    )
    batch = materialize_rollup(spark, spec)

    def answers(df):
        row = (
            df.coalesce(1)
            .agg(
                F.expr(
                    "CAST(hll_sketch_estimate(hll_union_agg(uid_hll)) "
                    "AS BIGINT)"
                ).alias("du"),
                F.expr(
                    "kll_sketch_get_quantile_double("
                    "kll_merge_agg_double(value_kll, 800), 0.5)"
                ).alias("med"),
                F.expr(
                    "CAST(ROUND(theta_sketch_estimate("
                    "theta_union_agg(uid_theta))) AS BIGINT)"
                ).alias("dt"),
                F.expr(
                    "approx_top_k_estimate("
                    "approx_top_k_combine(uid_topk, 1024), 1024)"
                ).alias("tk"),
            )
            .collect()[0]
        )
        return (
            row["du"],
            row["med"],
            row["dt"],
            sorted((e["item"], e["count"]) for e in row["tk"]),
        )

    streamed_path_df = spark.read.parquet(path)
    got = answers(streamed_path_df)
    want = answers(batch)
    assert got == want
    # and the estimates are the exact truths below every budget
    assert got[0] == 17 and got[2] == 17


def test_refresh_preserves_replay_markers(spark, tmp_path):
    """Crash-ops interleaving: merge batch → incremental refresh (which
    rewrites the same date dirs from source) → REPLAY of the merged
    batch. The refresh must carry the per-date batch markers forward, so
    the replay classifies as already-merged instead of double-counting
    rows the refresh already recomputed from source."""
    import datetime

    from pyspark.sql import functions as F

    from approximate_query_engine_spark.operators.rollup import (
        RollupSpec,
        merge_rollup_batch,
        refresh_rollup_buckets,
    )

    base = datetime.datetime(2024, 6, 1)
    rows = [
        (base + datetime.timedelta(hours=h), "a", float(h)) for h in range(48)
    ]
    schema = "ts timestamp, event_type string, value double"
    spark.createDataFrame(rows, schema).createOrReplaceTempView(
        "marker_src"
    )
    spec = RollupSpec("marker_src", "ts", "1 hour", ["event_type"], ["value"])
    path = str(tmp_path / "marker_layout")
    batch = spark.table("marker_src")
    out = merge_rollup_batch(spark, batch, spec, path, batch_id=0)
    assert out["merged"]

    def total():
        return (
            spark.read.parquet(path)
            .agg(F.sum("n_rows").alias("n"))
            .collect()[0]["n"]
        )

    assert total() == len(rows)
    # incremental refresh rewrites the tail date dirs from source
    refresh_rollup_buckets(spark, spec, path, since_bucket="2024-06-01")
    assert total() == len(rows)
    # replay of batch 0 must be a no-op, not a re-merge
    replay = merge_rollup_batch(spark, batch, spec, path, batch_id=0)
    assert replay.get("merged") is False, replay
    assert total() == len(rows)
