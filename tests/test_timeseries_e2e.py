"""Round-5 capstone: the full time-series lifecycle in one flow —
streaming ingestion into the day-partitioned layout, exact-query routing
to it, a rollup answering coarser grains from partial-agg state, and the
maintenance drift policy watching the lot. Each piece has its own tests;
this pins that they compose."""

import tempfile

from pyspark.sql import functions as F

from approximate_query_engine_spark import AQEngine

SF_SMOKE = "/root/testdata/sf0.001"


def test_timeseries_lifecycle_end_to_end(spark, tmp_path):
    from approximate_query_engine_spark.operators.partitioning import (
        read_partitioned,
        scan_metrics,
    )
    from approximate_query_engine_spark.operators.rollup import (
        RollupSpec,
        materialize_rollup,
        query_rollup,
    )
    from approximate_query_engine_spark.streaming.approx_stream import (
        stream_to_partitioned_layout,
    )

    eng = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_ts_e2e_"),
        data_dir=SF_SMOKE,
    )
    # 1) stream ingestion produces the day-partitioned layout
    path = str(tmp_path / "events_layout")
    streamed = stream_to_partitioned_layout(spark, SF_SMOKE, path, grain="day")
    n_events = spark.table("events").count()
    assert streamed.count() == n_events

    # 2) adopt the STREAMED layout as events' registered layout — batch
    # and streaming produce the same directory shape, so the exact path
    # routes to what the stream wrote
    read_partitioned(spark, path).createOrReplaceTempView("events__by_day")
    eng.catalog.partitioned_views["events"] = {
        "view": "events__by_day",
        "path": path,
        "ts_col": "ts",
        "grain": "day",
        "partition_col": "p_bucket",
        "built_row_count": n_events,
    }
    sql = (
        "SELECT COUNT(*) AS n FROM events "
        "WHERE ts <= TIMESTAMP '2024-01-05 00:00:00'"
    )
    r = eng.query(sql)
    assert r["status"] == "ok"
    assert "routed to partitioned layout" in r["plan"]["reason"]
    direct = (
        spark.table("events")
        .filter("ts <= TIMESTAMP '2024-01-05 00:00:00'")
        .count()
    )
    assert r["result"][0]["n"] == direct
    m = scan_metrics(spark.sql(r["plan"]["sql"]))
    assert 1 <= m["partitions_read"] <= 5, m

    # 3) a rollup OVER the layout view answers a daily query from hourly
    # partial-agg state, matching direct aggregation over raw events
    spec = RollupSpec(
        source_table="events__by_day",
        time_col="ts",
        bucket="1 hour",
        dims=["event_type"],
        measures=["value"],
    )
    materialize_rollup(spark, spec, path=str(tmp_path / "rollup"))
    daily = {
        (str(r["bucket_start"]), r["event_type"]): r["n_rows"]
        for r in query_rollup(spark, spec, "value", grain="1 day").collect()
    }
    want = {
        (str(r["b"]), r["event_type"]): r["n"]
        for r in (
            spark.table("events")
            .groupBy(F.window("ts", "1 day")["start"].alias("b"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert daily == want

    # 4) maintenance watches the adopted layout like any artifact:
    # fresh now, flagged for rebuild after catalog-visible drift
    rep = eng.maintain(max_drift=0.10, dry_run=True)
    assert any("partitioned" in f for f in rep["fresh"])
    eng.catalog.upsert_table_stats("events", 10 * n_events)
    rep2 = eng.maintain(
        max_drift=0.10, dry_run=True, refresh_stats=False
    )
    assert any(
        a["kind"] == "partitioned_layout" for a in rep2["refreshed"]
    )
    # and the stale layout is never served meanwhile
    r2 = eng.query(sql)
    assert "events__by_day" not in r2["plan"]["sql"]
