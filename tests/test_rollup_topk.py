"""Heavy-hitter state in rollups (round 7): approx_top_k_accumulate
columns combine across buckets so "top items in this window" answers from
pre-aggregated state (engine.rollup_top_items) — exact while the range's
distinct items fit the tracked budget (Misra–Gries no-purge condition)."""

import tempfile

import pytest

from approximate_query_engine_spark import AQEngine


@pytest.fixture(scope="module")
def teng(spark):
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_rollup_topk_"),
        data_dir="/root/testdata/sf0.001",
    )
    e.create_rollup(
        "events",
        "ts",
        # "3600 seconds" == "1 hour" on the bucket grid but gives this
        # fixture its own temp-view names: the module's other engines
        # register events__rollup_1_hour / __60_minutes over state
        # WITHOUT the HLL column, and temp views are session-global
        "3600 seconds",
        dims=["event_type"],
        measures=[],
        topk_cols=["user_id"],
        topk_budget=1024,
        # distinct state doubles as the SQL-routing gate's exactness
        # certificate (range ndv provably fits the topk budget)
        distinct_cols=["user_id"],
    )
    return e


def _exact_top(spark, lo, hi, k):
    return [
        (r["item"], r["cnt"])
        for r in spark.sql(
            f"SELECT CAST(user_id AS STRING) item, COUNT(*) cnt FROM events "
            f"WHERE ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}' "
            f"GROUP BY user_id ORDER BY cnt DESC, item ASC LIMIT {k}"
        ).collect()
    ]


def test_top_items_exact_below_budget(teng):
    lo, hi = "2024-01-02 00:00:00", "2024-01-05 00:00:00"
    got = [
        (r["item"], r["cnt"])
        for r in teng.rollup_top_items(
            "events", "user_id", k=5, lo=lo, hi=hi, candidate_k=1024
        ).collect()
    ]
    assert got == _exact_top(teng.spark, lo, hi, 5)


def test_misaligned_bound_raises(teng):
    with pytest.raises(ValueError, match="not aligned"):
        teng.rollup_top_items("events", "user_id", lo="2024-01-02 00:30:10")


def test_empty_range_raises(teng):
    with pytest.raises(ValueError, match="no rollup buckets"):
        teng.rollup_top_items(
            "events", "user_id", lo="2030-01-01 00:00:00"
        )


def test_untracked_column_raises(teng):
    with pytest.raises(ValueError, match="tracks top-k"):
        teng.rollup_top_items("events", "event_type")


def test_stale_rollup_raises(teng):
    teng.catalog.upsert_table_stats("events", 10**9)
    try:
        with pytest.raises(ValueError, match="stale"):
            teng.rollup_top_items("events", "user_id", k=3)
    finally:
        n = teng.spark.table("events").count()
        teng.catalog.upsert_table_stats("events", n)


def test_merge_batch_preserves_topk_state(spark):
    """Micro-batch merges must combine the top-k state: two half-merges
    answer identically to exact truth below the budget."""
    import os

    from approximate_query_engine_spark.operators.rollup import (
        RollupSpec,
        merge_rollup_batch,
    )
    from pyspark.sql import functions as F

    wd = tempfile.mkdtemp(prefix="aqe_topk_merge_")
    spec = RollupSpec(
        "events",
        "ts",
        "1 hour",
        ["event_type"],
        [],
        topk_cols=["user_id"],
        topk_budget=1024,
    )
    ev = spark.table("events")
    path = os.path.join(wd, "layout")
    merge_rollup_batch(
        spark, ev.where(F.col("event_id") % 2 == 0), spec, path, batch_id=0
    )
    merge_rollup_batch(
        spark, ev.where(F.col("event_id") % 2 == 1), spec, path, batch_id=1
    )
    got = (
        spark.read.parquet(path)
        .select("user_id_topk")
        .coalesce(1)
        .agg(
            F.expr(
                "approx_top_k_estimate("
                "approx_top_k_combine(user_id_topk, 1024), 1024)"
            ).alias("tk")
        )
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").cast("string").alias("item"),
            F.col("e.count").alias("cnt"),
        )
        .orderBy(F.desc("cnt"), F.asc("item"))
        .limit(5)
        .collect()
    )
    want = spark.sql(
        "SELECT CAST(user_id AS STRING) item, COUNT(*) cnt FROM events "
        "GROUP BY user_id ORDER BY cnt DESC, item ASC LIMIT 5"
    ).collect()
    assert [(r["item"], r["cnt"]) for r in got] == [
        (r["item"], r["cnt"]) for r in want
    ]


@pytest.fixture(scope="module")
def theng(spark):
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_rollup_theta_"),
        data_dir="/root/testdata/sf0.001",
    )
    e.create_rollup(
        "events",
        "ts",
        "1 hour",
        dims=[],
        measures=[],
        theta_cols=["user_id"],
        theta_lgk=12,
    )
    return e


def test_audience_diff_exact_below_budget(theng):
    got = theng.rollup_audience_diff(
        "events",
        "user_id",
        "2024-01-02 00:00:00",
        "2024-01-03 00:00:00",
        "2024-01-03 00:00:00",
        "2024-01-04 00:00:00",
    )
    ex = theng.spark.sql(
        """
        WITH a AS (SELECT DISTINCT user_id u FROM events
                   WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
                     AND ts < TIMESTAMP '2024-01-03 00:00:00'),
             b AS (SELECT DISTINCT user_id u FROM events
                   WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
                     AND ts < TIMESTAMP '2024-01-04 00:00:00')
        SELECT (SELECT COUNT(*) FROM a) da, (SELECT COUNT(*) FROM b) db,
               (SELECT COUNT(*) FROM a JOIN b ON a.u = b.u) ret,
               (SELECT COUNT(*) FROM b
                WHERE u NOT IN (SELECT u FROM a)) new_b,
               (SELECT COUNT(*) FROM a
                WHERE u NOT IN (SELECT u FROM b)) churn
        """
    ).collect()[0]
    assert got["distinct_a"] == ex["da"]
    assert got["distinct_b"] == ex["db"]
    assert got["returning"] == ex["ret"]
    assert got["new_in_b"] == ex["new_b"]
    assert got["churned"] == ex["churn"]
    assert got["union_cnt"] == ex["da"] + ex["db"] - ex["ret"]


def test_audience_diff_guards(theng):
    with pytest.raises(ValueError, match="not aligned"):
        theng.rollup_audience_diff(
            "events", "user_id",
            "2024-01-02 00:00:01", "2024-01-03 00:00:00",
            "2024-01-03 00:00:00", "2024-01-04 00:00:00",
        )
    with pytest.raises(ValueError, match="no rollup buckets"):
        theng.rollup_audience_diff(
            "events", "user_id",
            "2030-01-01 00:00:00", "2030-01-02 00:00:00",
            "2024-01-03 00:00:00", "2024-01-04 00:00:00",
        )
    with pytest.raises(ValueError, match="theta set-algebra"):
        theng.rollup_audience_diff(
            "events", "event_type",
            "2024-01-02 00:00:00", "2024-01-03 00:00:00",
            "2024-01-03 00:00:00", "2024-01-04 00:00:00",
        )


def test_count_distinct_served_from_theta_state(theng, duck):
    """A rollup tracking theta_cols (but no HLL) serves routed
    COUNT(DISTINCT) from unioned theta state — exact below 2^lgk."""
    sql = (
        "SELECT COUNT(DISTINCT user_id) AS du FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00'"
    )
    r = theng.query(sql, max_rel_error=0.05)
    assert r["status"] == "ok", r.get("error")
    assert r["plan"]["type"] == "sketch"
    assert "theta sketch state" in r["plan"]["reason"]
    want = duck.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00'"
    ).fetchone()[0]
    assert r["result"][0]["du"] == want


def test_theta_distinct_tolerance_gate(theng):
    # 2·(1/sqrt(4096)) ≈ 3.1%: a 1% tolerance must decline the state path
    sql = (
        "SELECT COUNT(DISTINCT user_id) AS du FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00'"
    )
    r = theng.query(sql, max_rel_error=0.01)
    assert r["status"] == "ok"
    assert "theta sketch state" not in r["plan"]["reason"]


def test_join_distinct_served_from_theta_state(theng, spark):
    """The star-join rewrite serves COUNT(DISTINCT fact_col) from theta
    state too (union is idempotent under dim multiplicity, like HLL)."""
    spark.createDataFrame(
        [("click", "Click!"), ("view", "View"), ("purchase", "Buy"),
         ("signup", "Join"), ("error", "Err")],
        "event_type string, label string",
    ).createOrReplaceTempView("theta_dim")
    theng.catalog.upsert_table_stats("theta_dim", 5)
    # the join key must be a rollup DIM (the module fixture's rollup has
    # none) — register a dimensioned theta rollup under its own bucket tag
    theng.create_rollup(
        "events",
        "ts",
        "60 minutes",
        dims=["event_type"],
        measures=[],
        theta_cols=["user_id"],
        theta_lgk=12,
    )
    sql = (
        "SELECT d.label AS label, COUNT(DISTINCT e.user_id) AS du "
        "FROM events e JOIN theta_dim d ON e.event_type = d.event_type "
        "WHERE e.ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND e.ts < TIMESTAMP '2024-01-05 00:00:00' "
        "GROUP BY d.label ORDER BY d.label"
    )
    r = theng.query(sql, max_rel_error=0.05)
    assert r["status"] == "ok", r.get("error")
    assert "star join answered from materialized rollup" in r["plan"]["reason"]
    assert "theta sketch state" in r["plan"]["reason"]
    want = {
        (x["label"], x["du"])
        for x in theng.spark.sql(sql).collect()
    }
    got = {(x["label"], x["du"]) for x in r["result"]}
    assert got == want  # theta exact below 2^lgk


@pytest.fixture(scope="module")
def dteng(spark):
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_rollup_dimf_"),
        data_dir="/root/testdata/sf0.001",
    )
    e.create_rollup(
        "events",
        "ts",
        "1 hour",
        dims=["event_type"],
        measures=[],
        topk_cols=["user_id"],
        topk_budget=1024,
        theta_cols=["user_id"],
    )
    return e


def test_top_items_with_dim_filter(dteng):
    """'Top users among clicks': the dim filter narrows the combined
    state to matching rollup groups; exact below budget."""
    got = [
        (r["item"], r["cnt"])
        for r in dteng.rollup_top_items(
            "events",
            "user_id",
            k=5,
            lo="2024-01-02 00:00:00",
            hi="2024-01-05 00:00:00",
            candidate_k=1024,
            dims={"event_type": "click"},
        ).collect()
    ]
    want = [
        (r["item"], r["cnt"])
        for r in dteng.spark.sql(
            "SELECT CAST(user_id AS STRING) item, COUNT(*) cnt FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
            "AND ts < TIMESTAMP '2024-01-05 00:00:00' "
            "AND event_type = 'click' GROUP BY user_id "
            "ORDER BY cnt DESC, item ASC LIMIT 5"
        ).collect()
    ]
    assert got == want


def test_dim_filter_guards(dteng):
    with pytest.raises(ValueError, match="not a dimension"):
        dteng.rollup_top_items(
            "events", "user_id", dims={"value": "1.0"}
        )
    # audience diff accepts the same filter
    d = dteng.rollup_audience_diff(
        "events",
        "user_id",
        "2024-01-02 00:00:00",
        "2024-01-03 00:00:00",
        "2024-01-03 00:00:00",
        "2024-01-04 00:00:00",
        dims={"event_type": "purchase"},
    )
    ex = dteng.spark.sql(
        """
        WITH a AS (SELECT DISTINCT user_id u FROM events
                   WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
                     AND ts < TIMESTAMP '2024-01-03 00:00:00'
                     AND event_type = 'purchase'),
             b AS (SELECT DISTINCT user_id u FROM events
                   WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
                     AND ts < TIMESTAMP '2024-01-04 00:00:00'
                     AND event_type = 'purchase')
        SELECT (SELECT COUNT(*) FROM a) da, (SELECT COUNT(*) FROM b) db,
               (SELECT COUNT(*) FROM a JOIN b ON a.u = b.u) ret
        """
    ).collect()[0]
    assert (d["distinct_a"], d["distinct_b"], d["returning"]) == (
        ex["da"], ex["db"], ex["ret"],
    )


# ---- routed top-items SQL (round 8): the canonical dashboard query ----
# SELECT col, COUNT(*) ... GROUP BY col ORDER BY count DESC LIMIT k
# answers from combined frequent-items state when col is tracked — the
# SQL twin of rollup_top_items (operators/rollup.rewrite_topk_to_rollup).

TOPK_SQL = (
    "SELECT user_id, COUNT(*) AS n FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-05 00:00:00' "
    "GROUP BY user_id ORDER BY n DESC, user_id ASC LIMIT 10"
)


def test_topk_sql_routes_and_matches_exact(teng):
    r = teng.query(TOPK_SQL)
    assert r["status"] == "ok", r.get("error")
    assert r["plan"]["type"] == "sketch"
    assert "combined frequent-items state" in r["plan"]["reason"]
    got = [(d["user_id"], d["n"]) for d in r["result"]]
    exact = [
        (x["user_id"], x["n"]) for x in teng.spark.sql(TOPK_SQL).collect()
    ]
    # below the budget the combined counts are exact — bit-identical,
    # native column type preserved (no string cast in the routed SQL)
    assert got == exact


def test_topk_sql_dim_filter_routes(teng):
    sql = TOPK_SQL.replace("WHERE ts", "WHERE event_type = 'click' AND ts")
    r = teng.query(sql)
    assert r["status"] == "ok", r.get("error")
    assert "combined frequent-items state" in r["plan"]["reason"]
    got = [(d["user_id"], d["n"]) for d in r["result"]]
    exact = [
        (x["user_id"], x["n"]) for x in teng.spark.sql(sql).collect()
    ]
    assert got == exact


def test_topk_sql_gates_decline(teng):
    # exactness requested
    r = teng.query(TOPK_SQL, prefer_exact=True)
    assert "frequent-items" not in r["plan"]["reason"]
    # misaligned bound would slice a bucket
    r = teng.query(
        TOPK_SQL.replace("2024-01-02 00:00:00", "2024-01-02 00:30:10")
    )
    assert "frequent-items" not in r["plan"]["reason"]
    # no LIMIT / no ORDER BY: not a top-k shape
    r = teng.query(
        "SELECT user_id, COUNT(*) AS n FROM events "
        "GROUP BY user_id ORDER BY n DESC"
    )
    assert "frequent-items" not in r["plan"]["reason"]
    # ORDER BY a non-count expression
    r = teng.query(
        "SELECT user_id, COUNT(*) AS n FROM events "
        "GROUP BY user_id ORDER BY user_id DESC LIMIT 10"
    )
    assert "frequent-items" not in r["plan"]["reason"]
    # HAVING is not expressible over combined sketch output
    r = teng.query(
        "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id "
        "HAVING COUNT(*) > 3 ORDER BY n DESC LIMIT 10"
    )
    assert "frequent-items" not in r["plan"]["reason"]


def test_topk_sql_uncertified_declines(spark):
    """Without ANY fitting-ndv evidence the exact (no-purge) regime
    cannot be certified, and beyond the budget the MG bound has no
    relative guarantee — routing must decline rather than serve counts
    that could be arbitrarily wrong. Round 9: the build itself records
    EXACT ndv evidence (the strongest tier), so the uncertified regime
    needs that evidence stripped (a legacy/pre-r9 catalog entry)."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_topk_uncert_"),
        data_dir="/root/testdata/sf0.001",
    )
    e.create_rollup(
        "events", "ts", "1 hour", dims=["event_type"],
        topk_cols=["user_id"], topk_budget=1024,
    )
    # the build pass recorded exact evidence: certified with no catalog
    # stats and no distinct-sketch state at all
    info = e.catalog.rollups["events"][0]
    assert info["topk_exact_ndv"]["user_id"]["exact"] is True
    r = e.query(TOPK_SQL)
    assert r["status"] == "ok", r.get("error")
    assert "exact regime certified" in r["plan"]["reason"], r["plan"]
    assert "build evidence" in r["plan"]["reason"], r["plan"]
    # strip the build evidence (legacy entry): no tier left -> decline
    info["topk_exact_ndv"] = {}
    r = e.query(TOPK_SQL)
    assert "frequent-items" not in r["plan"]["reason"], r["plan"]
    # a learned catalog ndv within budget certifies — but ONLY with a
    # fresh analyze baseline (a stale low ndv must not certify)
    e.catalog.upsert_column_ndv("events", "user_id", 40)
    r = e.query(TOPK_SQL)
    assert "frequent-items" not in r["plan"]["reason"], r["plan"]
    e.catalog.analyze_meta["events"] = {
        "row_count": e.catalog.get_row_count("events"),
        "columns": ["user_id"],
    }
    r = e.query(TOPK_SQL)
    assert "exact regime certified" in r["plan"]["reason"], r["plan"]
    assert "catalog stats" in r["plan"]["reason"]
    # analyze baseline drifts from the current row count: stale again
    e.catalog.analyze_meta["events"]["row_count"] -= 1
    r = e.query(TOPK_SQL)
    assert "frequent-items" not in r["plan"]["reason"], r["plan"]
    e.catalog.analyze_meta["events"]["row_count"] += 1
    # ndv ABOVE budget: certification honestly fails again
    e.catalog.upsert_column_ndv("events", "user_id", 5000)
    r = e.query(TOPK_SQL)
    assert "frequent-items" not in r["plan"]["reason"], r["plan"]


def test_topk_sql_empty_range_returns_no_rows(teng):
    sql = TOPK_SQL.replace("2024-01-02", "2030-01-02").replace(
        "2024-01-05", "2030-01-05"
    )
    r = teng.query(sql)
    assert r["status"] == "ok", r.get("error")
    assert "combined frequent-items state" in r["plan"]["reason"]
    assert r["result"] == []


def test_topk_sql_null_group_declines(spark):
    """approx_top_k state never sees NULLs, so routing a GROUP BY over a
    nullable column would silently drop the NULL group — the gate
    requires build-time null evidence and declines without it (round-8
    review fix)."""
    from pyspark.sql import functions as F

    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_topk_null_"),
        data_dir="/root/testdata/sf0.001",
    )
    nulled = spark.table("events").withColumn(
        "user_id",
        F.when(F.col("event_id") % 3 == 0, None).otherwise(
            F.col("user_id")
        ),
    )
    e.register_view("events_nullable", nulled)
    e.create_rollup(
        "events_nullable", "ts", "1 hour", dims=["event_type"],
        topk_cols=["user_id"], distinct_cols=["user_id"],
    )
    info = e.catalog.rollups["events_nullable"][0]
    assert info["topk_notnull"] == {"user_id": False}
    sql = TOPK_SQL.replace("FROM events", "FROM events_nullable")
    r = e.query(sql)
    assert r["status"] == "ok", r.get("error")
    assert "frequent-items" not in r["plan"]["reason"], r["plan"]
    # the exact answer (which the planner serves instead) keeps the
    # NULL group the sketch state could never represent
    assert any(d["user_id"] is None for d in r["result"]) or len(
        r["result"]
    ) == 10


def test_top_items_falls_back_to_finer_grid(teng):
    """Adding a COARSER rollup must not break off-grid API calls the
    finer one serves: hour-aligned bounds that slice a day bucket fall
    back to the fresh hour-grain state (round-8 review fix)."""
    lo, hi = "2024-01-02 06:00:00", "2024-01-03 06:00:00"
    before = [
        (r["item"], r["cnt"])
        for r in teng.rollup_top_items(
            "events", "user_id", k=5, lo=lo, hi=hi, candidate_k=1024
        ).collect()
    ]
    assert before == _exact_top(teng.spark, lo, hi, 5)
    teng.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        topk_cols=["user_id"], distinct_cols=["user_id"],
    )
    try:
        # day-aligned call serves from the day state (coarsest wins)
        day = teng.rollup_top_items(
            "events", "user_id", k=5,
            lo="2024-01-02 00:00:00", hi="2024-01-04 00:00:00",
            candidate_k=1024,
        )
        assert day.count() == 5
        # hour-aligned (day-slicing) call falls back to hour state
        after = [
            (r["item"], r["cnt"])
            for r in teng.rollup_top_items(
                "events", "user_id", k=5, lo=lo, hi=hi, candidate_k=1024
            ).collect()
        ]
        assert after == before
    finally:
        teng.catalog.rollups["events"] = [
            e for e in teng.catalog.rollups["events"]
            if e["bucket"] != "1 day"
        ]


def test_topk_sql_metamorphic_windows(teng):
    """Routed-vs-raw metamorphic sweep (same pattern as the hierarchy
    fuzz): random hour-aligned windows and k values must hash-match the
    exact GROUP BY bit-for-bit in the certified regime — window edges,
    single-bucket ranges, and dim filters included."""
    import random

    rng = random.Random(8)
    for _ in range(6):
        d0 = rng.randint(1, 25)
        h0 = rng.randint(0, 23)
        span_h = rng.choice([1, 5, 24, 72])
        k = rng.choice([1, 3, 10])
        lo = f"2024-01-{d0:02d} {h0:02d}:00:00"
        import datetime as _dt

        hi_dt = _dt.datetime(2024, 1, d0, h0) + _dt.timedelta(
            hours=span_h
        )
        hi = hi_dt.strftime("%Y-%m-%d %H:%M:%S")
        dimf = rng.choice(["", "event_type = 'click' AND "])
        sql = (
            f"SELECT user_id, COUNT(*) AS n FROM events "
            f"WHERE {dimf}ts >= TIMESTAMP '{lo}' "
            f"AND ts < TIMESTAMP '{hi}' "
            f"GROUP BY user_id ORDER BY n DESC, user_id ASC LIMIT {k}"
        )
        r = teng.query(sql)
        assert r["status"] == "ok", r.get("error")
        assert "combined frequent-items state" in r["plan"]["reason"], (
            sql,
            r["plan"]["reason"],
        )
        got = [(d["user_id"], d["n"]) for d in r["result"]]
        exact = [
            (x["user_id"], x["n"])
            for x in teng.spark.sql(sql).collect()
        ]
        assert got == exact, (sql, got, exact)
