"""Continuous-aggregate SQL routing (round 6): matching aggregates over
the raw table are answered exactly from a registered rollup's
partial-agg state; every unsound shape declines to the normal path.

Reference parity note: the reference has no materialized-view rewrite at
all (its planner only swaps sample tables, planner.py:242); this is the
hypertable/continuous-aggregate capability a 100 TB time-series engine
needs — dashboards scan the rollup, never the fact table.
"""

import tempfile

import pytest

from approximate_query_engine_spark import AQEngine


@pytest.fixture(scope="module")
def eng(spark):
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_rollup_route_"),
        data_dir="/root/testdata/sf0.001",
    )
    e.create_rollup("events", "ts", "1 hour", dims=["event_type"], measures=["value"])
    return e


def _both(eng, sql):
    r = eng.query(sql)
    assert r["status"] == "ok", r.get("error")
    raw = [x.asDict() for x in eng.spark.sql(sql).collect()]
    return r, raw


def _assert_equal(got, raw):
    assert len(got) == len(raw)
    for a, b in zip(got, raw):
        assert set(a) == set(b)
        for k in a:
            if isinstance(a[k], float):
                assert a[k] == pytest.approx(b[k], rel=1e-9, abs=1e-9), k
            else:
                assert str(a[k]) == str(b[k]), (k, a[k], b[k])


def test_grouped_rollup_answer_matches_raw(eng):
    sql = (
        "SELECT event_type, DATE_TRUNC('DAY', ts) AS day, COUNT(*) AS n, "
        "COUNT(value) AS nv, SUM(value) AS sv, MIN(value) AS mn, "
        "MAX(value) AS mx, AVG(value) AS av FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-08 00:00:00' "
        "GROUP BY event_type, DATE_TRUNC('DAY', ts) ORDER BY event_type, day"
    )
    r, raw = _both(eng, sql)
    assert "answered from materialized rollup" in r["plan"]["reason"]
    # the routed scan reads the rollup's FILES view with date pruning
    assert "events__rollup_1_hour__files" in r["plan"]["sql"]
    assert "p_date >= '2024-01-03'" in r["plan"]["sql"]
    _assert_equal(r["result"], raw)


def test_aggregate_only_and_dim_filter(eng):
    sql = (
        "SELECT COUNT(*) AS n, SUM(value) AS sv FROM events "
        "WHERE event_type = 'click'"
    )
    r, raw = _both(eng, sql)
    assert "rollup" in r["plan"]["reason"]
    _assert_equal(r["result"], raw)


def test_dim_or_group_passes_through(eng):
    # OR confined to a dim-only parenthesized predicate is sound — the
    # conjunct passes through verbatim against the rollup's dim column
    sql = (
        "SELECT COUNT(*) AS n FROM events "
        "WHERE (event_type = 'click' OR event_type = 'view') "
        "AND ts >= TIMESTAMP '2024-01-02 00:00:00'"
    )
    r, raw = _both(eng, sql)
    assert "rollup" in r["plan"]["reason"]
    _assert_equal(r["result"], raw)


def test_alias_qualified_references_route(eng):
    sql = (
        "SELECT e.event_type, COUNT(*) AS n FROM events e "
        "WHERE e.ts < TIMESTAMP '2024-01-05 00:00:00' "
        "GROUP BY e.event_type ORDER BY e.event_type"
    )
    r, raw = _both(eng, sql)
    assert "rollup" in r["plan"]["reason"]
    _assert_equal(r["result"], raw)


def test_count_star_empty_range_is_zero_not_null(eng):
    r = eng.query(
        "SELECT COUNT(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2031-01-01 00:00:00'"
    )
    assert "rollup" in r["plan"]["reason"]
    assert r["result"] == [{"n": 0}]


def test_limit_and_order_by_alias(eng):
    sql = (
        "SELECT event_type, COUNT(*) AS n FROM events "
        "GROUP BY event_type ORDER BY n DESC LIMIT 2"
    )
    r, raw = _both(eng, sql)
    assert "rollup" in r["plan"]["reason"]
    _assert_equal(r["result"], raw)


@pytest.mark.parametrize(
    "sql",
    [
        # measure referenced in WHERE
        "SELECT COUNT(*) AS n FROM events WHERE value > 10",
        # finer truncation than... equal is fine, but MINUTE < 1 hour bucket
        "SELECT DATE_TRUNC('MINUTE', ts) AS m, COUNT(*) AS n FROM events GROUP BY DATE_TRUNC('MINUTE', ts)",
        # COUNT(DISTINCT) is not derivable from count/sum/min/max state
        "SELECT COUNT(DISTINCT user_id) AS n FROM events",
        # aggregate over a non-measure column
        "SELECT SUM(user_id) AS s FROM events",
        # HAVING referencing a non-measure aggregate
        "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type HAVING SUM(user_id) > 5",
        # top-level OR mixing ts and dim scopes
        "SELECT COUNT(*) AS n FROM events WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' OR event_type = 'click'",
        # group key outside the rollup dims
        "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id",
    ],
)
def test_unsound_shapes_decline(eng, sql):
    r = eng.query(sql)
    assert r["status"] == "ok", r.get("error")
    assert "rollup" not in r["plan"]["reason"], (sql, r["plan"]["reason"])


@pytest.mark.parametrize(
    "pred",
    [
        "DATE_TRUNC('DAY', ts) = DATE '2024-01-03'",
        "CAST(ts AS DATE) = DATE '2024-01-04'",
        "DATE_TRUNC('DAY', ts) >= TIMESTAMP '2024-01-03 00:00:00'",
        "DATE_TRUNC('DAY', ts) < DATE '2024-01-05'",
        "DATE_TRUNC('MONTH', ts) = DATE '2024-01-01'",
        "DATE_TRUNC('WEEK', ts) = DATE '2024-01-08'",  # a Monday
    ],
)
def test_trunc_predicates_route_and_match(eng, pred):
    sql = (
        "SELECT event_type, COUNT(*) AS n FROM events "
        f"WHERE {pred} GROUP BY event_type ORDER BY event_type"
    )
    r, raw = _both(eng, sql)
    assert "rollup" in r["plan"]["reason"], (pred, r["plan"]["reason"])
    assert raw, f"premise: {pred} matches rows"
    _assert_equal(r["result"], raw)


def test_trunc_predicate_unaligned_literal_declines(eng):
    # DATE_TRUNC('DAY', ts) can never equal a mid-day literal; routing
    # must decline rather than guess
    r = eng.query(
        "SELECT COUNT(*) AS n FROM events "
        "WHERE DATE_TRUNC('DAY', ts) = TIMESTAMP '2024-01-03 05:00:00'"
    )
    assert "rollup" not in r["plan"]["reason"]
    # week-trunc equality on a non-Monday declines too
    r2 = eng.query(
        "SELECT COUNT(*) AS n FROM events "
        "WHERE DATE_TRUNC('WEEK', ts) = DATE '2024-01-09'"
    )
    assert "rollup" not in r2["plan"]["reason"]


def test_having_rewrites_aggregates(eng):
    sql = (
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "GROUP BY event_type HAVING COUNT(*) > 5 AND AVG(value) > 0 "
        "ORDER BY event_type"
    )
    r, raw = _both(eng, sql)
    assert "rollup" in r["plan"]["reason"], r["plan"]["reason"]
    _assert_equal(r["result"], raw)


def test_coarsest_capable_rollup_wins(eng, spark):
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_rollup_pref_"),
        data_dir="/root/testdata/sf0.001",
    )
    e.create_rollup("events", "ts", "1 hour", dims=["event_type"], measures=["value"])
    e.create_rollup("events", "ts", "1 day", dims=["event_type"], measures=["value"])
    # day-aligned query: the day rollup (24x fewer rows) must be chosen
    r = e.query(
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' GROUP BY event_type"
    )
    assert "events__rollup_1_day" in r["plan"]["reason"], r["plan"]["reason"]
    # hour-aligned (mid-day) bound: day rollup can't, hour rollup can
    r2 = e.query(
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-03 06:00:00' GROUP BY event_type"
    )
    assert "events__rollup_1_hour" in r2["plan"]["reason"], r2["plan"]["reason"]


def test_stale_rollup_declines_and_rebuild_rearms(eng, spark):
    # drift the catalog row count: freshness gate must decline routing
    true_n = eng.catalog.get_row_count("events")
    eng.catalog.upsert_table_stats("events", true_n + 1)
    r = eng.query("SELECT COUNT(*) AS n FROM events WHERE event_type='click'")
    assert "rollup" not in r["plan"]["reason"]
    eng.catalog.upsert_table_stats("events", true_n)
    r2 = eng.query("SELECT COUNT(*) AS n FROM events WHERE event_type='click'")
    assert "rollup" in r2["plan"]["reason"]


def test_rollup_survives_engine_restart(eng, spark):
    # a new engine over the same workdir re-registers the materialized
    # rollup views from the persisted catalog on first routed query
    spark.catalog.dropTempView("events__rollup_1_hour")
    spark.catalog.dropTempView("events__rollup_1_hour__files")
    e2 = AQEngine(
        spark, workdir=eng.catalog.workdir, data_dir="/root/testdata/sf0.001"
    )
    sql = (
        "SELECT event_type, COUNT(*) AS n FROM events "
        "GROUP BY event_type ORDER BY event_type"
    )
    r = e2.query(sql)
    assert "rollup" in r["plan"]["reason"], r["plan"]["reason"]
    raw = [x.asDict() for x in spark.sql(sql).collect()]
    _assert_equal(r["result"], raw)


def test_day_bucket_declines_hour_trunc(eng, spark):
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_rollup_day_"),
        data_dir="/root/testdata/sf0.001",
    )
    e.create_rollup("events", "ts", "1 day", measures=["value"])
    ok = e.query(
        "SELECT DATE_TRUNC('WEEK', ts) AS w, SUM(value) AS sv FROM events "
        "GROUP BY DATE_TRUNC('WEEK', ts) ORDER BY w"
    )
    assert "rollup" in ok["plan"]["reason"]
    raw = [
        x.asDict()
        for x in spark.sql(
            "SELECT DATE_TRUNC('WEEK', ts) AS w, SUM(value) AS sv FROM events "
            "GROUP BY DATE_TRUNC('WEEK', ts) ORDER BY w"
        ).collect()
    ]
    _assert_equal(ok["result"], raw)
    bad = e.query(
        "SELECT DATE_TRUNC('HOUR', ts) AS h, COUNT(*) AS n FROM events "
        "GROUP BY DATE_TRUNC('HOUR', ts)"
    )
    assert "rollup" not in bad["plan"]["reason"]


def test_engine_refresh_rollup_incremental_rearm(spark):
    """engine.refresh_rollup: append-tail drift disarms routing; the
    incremental refresh recomputes ONLY the tail date directories
    (mtime evidence), re-arms routing, and the routed answer reflects
    the appended rows."""
    import datetime
    import glob
    import os

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (base + datetime.timedelta(days=d, hours=h), "a", float(d * 10 + h))
        for d in range(5)
        for h in range(4)
    ]
    schema = "ts timestamp, event_type string, value double"
    spark.createDataFrame(rows, schema).createOrReplaceTempView("refresh_src")
    e = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_rollup_rf_"))
    e.catalog.upsert_table_stats("refresh_src", len(rows))
    e.create_rollup(
        "refresh_src", "ts", "1 hour", dims=["event_type"], measures=["value"]
    )
    path = e.catalog.rollups["refresh_src"][0]["path"]

    def day_files(day):
        return {
            p: os.path.getmtime(p)
            for p in glob.glob(f"{path}/p_date=2024-03-0{day}/*.parquet")
        }

    before = {d: day_files(d) for d in (1, 2, 3)}
    assert all(before.values())
    sql = "SELECT COUNT(*) AS n, SUM(value) AS sv FROM refresh_src"
    assert "rollup" in e.query(sql)["plan"]["reason"]
    # tail append: a late row in the LAST day
    late = [(datetime.datetime(2024, 3, 5, 1, 30), "a", 999.0)]
    spark.createDataFrame(rows + late, schema).createOrReplaceTempView(
        "refresh_src"
    )
    e.catalog.upsert_table_stats("refresh_src", len(rows) + 1)
    assert "rollup" not in e.query(sql)["plan"]["reason"]  # disarmed
    out = e.refresh_rollup("refresh_src")
    assert out["refreshed_since"] == "2024-03-05"
    assert out["built_row_count"] == len(rows) + 1
    # untouched history: identical paths AND mtimes for earlier days
    assert {d: day_files(d) for d in (1, 2, 3)} == before
    r = e.query(sql)
    assert "rollup" in r["plan"]["reason"], r["plan"]["reason"]
    assert r["result"][0]["n"] == len(rows) + 1
    raw = spark.sql(sql).collect()[0]
    assert r["result"][0]["sv"] == pytest.approx(raw["sv"], rel=1e-12)


def test_distinct_sketch_column_routes_within_tolerance(spark):
    """COUNT(DISTINCT) over a tracked sketch column answers from merged
    per-bucket HLL state when the tolerance covers the sketch error:
    plan labeled sketch, estimate within ~2 standard errors; exactness
    requests and tight tolerances decline."""
    import datetime

    rows = 60_000
    base = datetime.datetime(2024, 6, 1)
    spark.range(rows).selectExpr(
        f"timestamp'{base}' + make_interval(0,0,0,0,0,0, (id * 5) % 259200)"
        " AS ts",
        "CONCAT('u', CONV(SUBSTRING(md5(CAST(id AS STRING)),1,8),16,10) % 7000)"
        " AS user_id",
        "CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END AS seg",
    ).createOrReplaceTempView("hll_src")
    e = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_hll_route_"))
    e.catalog.upsert_table_stats("hll_src", rows)
    e.create_rollup(
        "hll_src", "ts", "1 hour", dims=["seg"], distinct_cols=["user_id"]
    )
    sql = (
        "SELECT seg, COUNT(*) AS n, COUNT(DISTINCT user_id) AS du "
        "FROM hll_src WHERE ts >= TIMESTAMP '2024-06-02 00:00:00' "
        "GROUP BY seg ORDER BY seg"
    )
    r = e.query(sql, max_rel_error=0.05)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert "merged HLL sketch state" in r["plan"]["reason"]
    exact = {
        x["seg"]: (x["n"], x["du"])
        for x in (y.asDict() for y in spark.sql(sql).collect())
    }
    assert len(r["result"]) == 2
    for d in r["result"]:
        n_exact, du_exact = exact[d["seg"]]
        assert d["n"] == n_exact  # COUNT(*) stays exact in the same query
        assert abs(d["du"] - du_exact) / du_exact < 0.04, (d, du_exact)
    # exactness wins over the sketch
    assert "rollup" not in e.query(sql, prefer_exact=True)["plan"]["reason"]
    assert (
        "rollup" not in e.query(sql, max_rel_error=0.005)["plan"]["reason"]
    )
    # an untracked column's COUNT(DISTINCT) never routes
    assert (
        "rollup"
        not in e.query(
            "SELECT COUNT(DISTINCT seg) AS s FROM hll_src", max_rel_error=0.1
        )["plan"]["reason"]
    )


def test_refresh_preserves_hll_sketch_columns(spark):
    """Regression (round-7): refresh_rollup_buckets must rebuild its tail
    date directories WITH the spec's distinct_cols/hll_lgk.  Before the
    fix the tmp spec dropped them, so an incremental refresh of an HLL
    rollup wrote sketch-less date directories (mixed layout schemas) and
    a routed COUNT(DISTINCT) read NULL state for the refreshed dates."""
    import datetime
    import glob

    base = datetime.datetime(2024, 7, 1)
    rows = [
        (
            base + datetime.timedelta(days=d, hours=h),
            f"u{(d * 97 + h * 13) % 400}",
            "a" if h % 2 == 0 else "b",
        )
        for d in range(3)
        for h in range(24)
    ]
    schema = "ts timestamp, user_id string, seg string"
    spark.createDataFrame(rows, schema).createOrReplaceTempView("hll_rf_src")
    e = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_hll_rf_"))
    e.catalog.upsert_table_stats("hll_rf_src", len(rows))
    e.create_rollup(
        "hll_rf_src", "ts", "1 hour", dims=["seg"], distinct_cols=["user_id"]
    )
    path = e.catalog.rollups["hll_rf_src"][0]["path"]
    # tail append: new users land in the LAST day only
    late = [
        (datetime.datetime(2024, 7, 3, 5, 30), f"new{i}", "a")
        for i in range(50)
    ]
    spark.createDataFrame(rows + late, schema).createOrReplaceTempView(
        "hll_rf_src"
    )
    e.catalog.upsert_table_stats("hll_rf_src", len(rows) + len(late))
    e.refresh_rollup("hll_rf_src")
    # EVERY date directory (refreshed tail included) still carries the
    # sketch column — no mixed schemas in the layout
    for day_dir in sorted(glob.glob(f"{path}/p_date=*")):
        cols = spark.read.parquet(day_dir).columns
        assert "user_id_hll" in cols, (day_dir, cols)
    sql = (
        "SELECT COUNT(DISTINCT user_id) AS du FROM hll_rf_src "
        "WHERE ts >= TIMESTAMP '2024-07-01 00:00:00'"
    )
    r = e.query(sql, max_rel_error=0.1)
    assert "merged HLL sketch state" in r["plan"]["reason"], r["plan"]
    exact = spark.sql(sql).collect()[0]["du"]  # 400 old + 50 new users
    got = r["result"][0]["du"]
    # 2 standard errors of the lgk=12 sketch (~1.6% rsd)
    assert abs(got - exact) / exact < 2 * (1.04 / 2 ** 6), (got, exact)


def test_aggregate_free_projection_never_routes(eng):
    """Round-7 (ADVICE r6 high): a projection with no aggregate must NOT
    be answered from the rollup — the rollup has one row per (bucket,
    dims) group, so routing it would serve the wrong row multiplicity.
    GROUP-BY-covered aggregates keep routing."""
    sql = (
        "SELECT event_type FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'"
    )
    r = eng.query(sql)
    assert r["status"] == "ok"
    assert "rollup" not in r["plan"]["reason"], r["plan"]
    # raw multiplicity: one row per matching event
    raw_n = eng.spark.sql(sql).count()
    assert len(r["result"]) == raw_n
    # DISTINCT-dims shape (no aggregate) also declines, conservatively
    r2 = eng.query("SELECT event_type FROM events GROUP BY event_type")
    assert "rollup" not in r2["plan"]["reason"], r2["plan"]
    # sanity: the aggregate version still routes
    r3 = eng.query(
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' GROUP BY event_type"
    )
    assert "rollup" in r3["plan"]["reason"], r3["plan"]


def test_unknown_base_row_count_declines_routing(eng):
    """Round-7 (VERDICT r6 #7): a missing catalog row count means
    freshness is UNKNOWN — routing must decline (like maintenance's
    'unknown' bucket), not serve a possibly-stale rollup."""
    sql = (
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' GROUP BY event_type"
    )
    assert "rollup" in eng.query(sql)["plan"]["reason"]
    saved = eng.catalog.table_stats.pop("events")
    try:
        r = eng.query(sql)
        assert r["status"] == "ok"
        assert "rollup" not in r["plan"]["reason"], r["plan"]
    finally:
        eng.catalog.table_stats["events"] = saved
    assert "rollup" in eng.query(sql)["plan"]["reason"]


def test_register_view_invalidates_rollups(spark):
    """Round-7 (ADVICE r6 medium): replacing a table's data with an
    EQUAL row count (invisible to the drift gate) must drop its rollup
    routing entries — otherwise queries are served from the stale rollup
    and labeled exact."""
    import datetime

    base = datetime.datetime(2024, 8, 1)
    schema = "ts timestamp, event_type string, value double"
    rows = [
        (base + datetime.timedelta(hours=h), "a", float(h)) for h in range(48)
    ]
    spark.createDataFrame(rows, schema).createOrReplaceTempView("rv_src")
    e = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_rv_inval_"))
    e.catalog.upsert_table_stats("rv_src", len(rows))
    e.create_rollup("rv_src", "ts", "1 hour", dims=["event_type"], measures=["value"])
    sql = "SELECT COUNT(*) AS n, SUM(value) AS sv FROM rv_src"
    assert "rollup" in e.query(sql)["plan"]["reason"]
    # same row count, different values — the drift gate can't see this
    rows2 = [
        (base + datetime.timedelta(hours=h), "a", float(h * 1000))
        for h in range(48)
    ]
    e.register_view("rv_src", spark.createDataFrame(rows2, schema))
    assert "rv_src" not in e.catalog.rollups
    r = e.query(sql)
    assert "rollup" not in r["plan"]["reason"], r["plan"]
    assert r["result"][0]["sv"] == pytest.approx(sum(h * 1000 for h in range(48)))


@pytest.mark.parametrize(
    "pred",
    [
        # raw-ts BETWEEN: µs-inclusive end == next boundary - 1µs
        "ts BETWEEN TIMESTAMP '2024-01-03 00:00:00' AND TIMESTAMP '2024-01-06 23:59:59.999999'",
        "ts <= TIMESTAMP '2024-01-06 23:59:59.999999'",
        "ts > TIMESTAMP '2024-01-02 23:59:59.999999'",
        # trunc/CAST comparisons at every operator
        "DATE_TRUNC('DAY', ts) <= DATE '2024-01-05'",
        "DATE_TRUNC('DAY', ts) > DATE '2024-01-03'",
        "CAST(ts AS DATE) BETWEEN DATE '2024-01-03' AND DATE '2024-01-06'",
        "CAST(ts AS DATE) <= DATE '2024-01-04'",
        "DATE_TRUNC('DAY', ts) BETWEEN DATE '2024-01-03' AND DATE '2024-01-05'",
        # mixed dim + BETWEEN conjunction
        "event_type = 'click' AND CAST(ts AS DATE) BETWEEN DATE '2024-01-03' AND DATE '2024-01-06'",
    ],
)
def test_between_le_gt_bounds_route_and_match(eng, pred):
    """Round-7 (VERDICT r6 #4): BETWEEN / <= / > time bounds route when
    alignment is provable — BETWEEN desugars to two comparisons, raw-ts
    <=/> shift by the 1 µs timestamp tick, trunc <=/> shift to the
    unit's next boundary — and the routed answer matches raw exactly."""
    sql = (
        "SELECT event_type, COUNT(*) AS n, SUM(value) AS sv FROM events "
        f"WHERE {pred} GROUP BY event_type ORDER BY event_type"
    )
    r, raw = _both(eng, sql)
    assert "rollup" in r["plan"]["reason"], (pred, r["plan"]["reason"])
    assert raw, f"premise: {pred} matches rows"
    _assert_equal(r["result"], raw)


@pytest.mark.parametrize(
    "pred",
    [
        # NOT BETWEEN is a disjunction
        "ts NOT BETWEEN TIMESTAMP '2024-01-03 00:00:00' AND TIMESTAMP '2024-01-07 00:00:00'",
        # misaligned trunc bound has no raw-comparison fallback
        "DATE_TRUNC('DAY', ts) <= TIMESTAMP '2024-01-05 12:00:00'",
    ],
)
def test_between_le_gt_unsound_bounds_decline(eng, pred):
    sql = f"SELECT COUNT(*) AS n FROM events WHERE {pred}"
    r = eng.query(sql)
    assert r["status"] == "ok", r.get("error")
    assert "rollup" not in r["plan"]["reason"], (pred, r["plan"]["reason"])
    # and the raw answer is still correct
    assert r["result"][0]["n"] == eng.spark.sql(sql).collect()[0]["n"]


@pytest.mark.parametrize(
    "pred",
    [
        # bound slices an hour bucket — head slice + open-ended state
        "ts >= TIMESTAMP '2024-01-03 00:30:10'",
        # upper bound ON the boundary includes one extra instant — the
        # 1 µs tail slice catches exactly it
        "ts BETWEEN TIMESTAMP '2024-01-03 00:00:00' AND TIMESTAMP '2024-01-07 00:00:00'",
        "ts <= TIMESTAMP '2024-01-07 00:00:00'",
        # aligned '>' excludes only the boundary instant
        "ts > TIMESTAMP '2024-01-03 00:00:00'",
        # DATE literals on raw ts bind midnight instants — hybrid-exact
        "ts BETWEEN DATE '2024-01-03' AND DATE '2024-01-06'",
    ],
)
def test_formerly_declined_bounds_now_hybrid_exact(eng, pred):
    """Round-7 upgrade: bucket-slicing bounds that used to decline are
    answered by the real-time hybrid (state + raw edge slices), exactly
    — the raw slices fall back to the base table here (no layout on
    this engine), which is still correct."""
    sql = (
        "SELECT event_type, COUNT(*) AS n, SUM(value) AS sv FROM events "
        f"WHERE {pred} GROUP BY event_type ORDER BY event_type"
    )
    r = eng.query(sql)
    assert r["status"] == "ok", r.get("error")
    assert "raw edge slice" in r["plan"]["reason"], (pred, r["plan"]["reason"])
    raw = [x.asDict() for x in eng.spark.sql(sql).collect()]
    assert raw
    _assert_equal(r["result"], raw)


@pytest.fixture(scope="module")
def jeng(spark):
    """Engine with a fact rollup + two dim tables for star-join routing."""
    import datetime

    base = datetime.datetime(2024, 2, 1)
    rows = [
        (
            base + datetime.timedelta(hours=h, minutes=h % 7),
            ["click", "view", "error"][h % 3],
            float(h % 97),
            f"u{h % 41}",
        )
        for h in range(24 * 12)
    ]
    spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double, uid string"
    ).createOrReplaceTempView("jfact")
    spark.createDataFrame(
        [("click", "Clicks", 1.0), ("view", "Views", 2.0), ("error", "Errors", 3.0)],
        "event_type string, label string, weight double",
    ).createOrReplaceTempView("jdim")
    # NON-unique dim: 'click' matches TWO rows (multiplicity check)
    spark.createDataFrame(
        [("click", "c1"), ("click", "c2"), ("view", "v1"), ("error", "e1")],
        "event_type string, tag string",
    ).createOrReplaceTempView("jdim_dup")
    e = AQEngine(
        spark, workdir=tempfile.mkdtemp(prefix="aqe_rollup_join_")
    )
    e.catalog.upsert_table_stats("jfact", len(rows))
    e.create_rollup(
        "jfact", "ts", "1 hour", dims=["event_type"], measures=["value"],
        distinct_cols=["uid"],
    )
    return e


@pytest.mark.parametrize(
    "sql",
    [
        # the canonical dashboard star join
        "SELECT d.label, COUNT(*) AS n, SUM(jfact.value) AS sv, "
        "MIN(jfact.value) AS mn, MAX(jfact.value) AS mx, "
        "AVG(jfact.value) AS av "
        "FROM jfact JOIN jdim d ON jfact.event_type = d.event_type "
        "WHERE jfact.ts >= TIMESTAMP '2024-02-02 00:00:00' "
        "AND jfact.ts < TIMESTAMP '2024-02-10 00:00:00' "
        "GROUP BY d.label ORDER BY d.label",
        # day grain + dim key, aliased fact, BETWEEN bound
        "SELECT d.label, DATE_TRUNC('DAY', f.ts) AS day, COUNT(*) AS n "
        "FROM jfact f JOIN jdim d ON f.event_type = d.event_type "
        "WHERE CAST(f.ts AS DATE) BETWEEN DATE '2024-02-03' AND DATE '2024-02-08' "
        "GROUP BY d.label, DATE_TRUNC('DAY', f.ts) ORDER BY d.label, day",
        # unqualified columns resolve by uniqueness; dim-side filter rides
        "SELECT label, COUNT(value) AS nv, SUM(value) AS sv "
        "FROM jfact JOIN jdim d ON jfact.event_type = d.event_type "
        "WHERE label <> 'Views' GROUP BY label ORDER BY label",
        # NON-unique dim key: multiplicity must match the raw join
        "SELECT t.tag, COUNT(*) AS n, SUM(jfact.value) AS sv "
        "FROM jfact JOIN jdim_dup t ON jfact.event_type = t.event_type "
        "GROUP BY t.tag ORDER BY t.tag",
        # group by the fact dim itself + ORDER BY an aggregate
        "SELECT jfact.event_type, COUNT(*) AS n "
        "FROM jfact JOIN jdim d ON jfact.event_type = d.event_type "
        "GROUP BY jfact.event_type ORDER BY COUNT(*) DESC, jfact.event_type",
    ],
)
def test_star_join_routes_to_rollup_and_matches(jeng, sql):
    """Round-7 flagship: star-join aggregates are answered from
    rollup ⋈ dim — the fact scan is replaced by partial-agg state and
    the result matches the raw join bit-for-bit."""
    r = jeng.query(sql)
    assert r["status"] == "ok", r.get("error")
    assert "star join answered from materialized rollup" in r["plan"]["reason"], (
        sql, r["plan"]["reason"],
    )
    raw = [x.asDict() for x in jeng.spark.sql(sql).collect()]
    assert raw, f"premise: rows for {sql}"
    _assert_equal(r["result"], raw)


def test_star_join_distinct_sketch_routes(jeng):
    sql = (
        "SELECT d.label, COUNT(DISTINCT jfact.uid) AS du, COUNT(*) AS n "
        "FROM jfact JOIN jdim d ON jfact.event_type = d.event_type "
        "WHERE jfact.ts >= TIMESTAMP '2024-02-02 00:00:00' "
        "GROUP BY d.label ORDER BY d.label"
    )
    r = jeng.query(sql, max_rel_error=0.05)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert "merged HLL sketch state" in r["plan"]["reason"]
    exact = {
        x["label"]: (x["du"], x["n"])
        for x in (y.asDict() for y in jeng.spark.sql(sql).collect())
    }
    for d in r["result"]:
        du_e, n_e = exact[d["label"]]
        assert d["n"] == n_e  # COUNT(*) stays exact
        assert abs(d["du"] - du_e) / du_e < 0.04, (d, du_e)
    # prefer_exact or a tight tolerance declines the sketch
    assert (
        "rollup" not in jeng.query(sql, prefer_exact=True)["plan"]["reason"]
    )


@pytest.mark.parametrize(
    "sql",
    [
        # aggregate over a DIM column collapses per-fact repetition
        "SELECT d.label, SUM(d.weight) AS w FROM jfact "
        "JOIN jdim d ON jfact.event_type = d.event_type GROUP BY d.label",
        # join key on the fact side is NOT a rollup dim
        "SELECT d.label, COUNT(*) AS n FROM jfact "
        "JOIN jdim d ON jfact.uid = d.event_type GROUP BY d.label",
        # mixed fact+dim conjunct
        "SELECT d.label, COUNT(*) AS n FROM jfact "
        "JOIN jdim d ON jfact.event_type = d.event_type "
        "WHERE jfact.value > d.weight GROUP BY d.label",
        # misaligned time bound
        "SELECT d.label, COUNT(*) AS n FROM jfact "
        "JOIN jdim d ON jfact.event_type = d.event_type "
        "WHERE jfact.ts >= TIMESTAMP '2024-02-02 00:30:10' GROUP BY d.label",
        # HAVING over a non-measure aggregate declines
        "SELECT d.label, COUNT(*) AS n FROM jfact "
        "JOIN jdim d ON jfact.event_type = d.event_type "
        "GROUP BY d.label HAVING SUM(d.weight) > 10",
        # fact measure referenced in WHERE
        "SELECT d.label, COUNT(*) AS n FROM jfact "
        "JOIN jdim d ON jfact.event_type = d.event_type "
        "WHERE jfact.value > 10 GROUP BY d.label",
        # aggregate-free projection (multiplicity)
        "SELECT d.label FROM jfact "
        "JOIN jdim d ON jfact.event_type = d.event_type "
        "WHERE jfact.ts >= TIMESTAMP '2024-02-02 00:00:00'",
    ],
)
def test_star_join_unsound_shapes_decline(jeng, sql):
    r = jeng.query(sql)
    assert r["status"] == "ok", r.get("error")
    assert "rollup" not in r["plan"]["reason"], (sql, r["plan"]["reason"])
    # and the un-routed answer still matches raw
    raw = jeng.spark.sql(sql).collect()
    assert len(r["result"]) == len(raw)


def test_star_join_having_and_three_tables(jeng, spark):
    """Round-7 follow-up: HAVING rewrites through the join rules, and a
    3-table star (fact ⋈ dim ⋈ dim) routes with both dims broadcast."""
    sql = (
        "SELECT d.label, COUNT(*) AS n, SUM(jfact.value) AS sv "
        "FROM jfact JOIN jdim d ON jfact.event_type = d.event_type "
        "WHERE jfact.ts >= TIMESTAMP '2024-02-02 00:00:00' "
        "GROUP BY d.label HAVING COUNT(*) > 10 AND AVG(jfact.value) > 1 "
        "ORDER BY d.label"
    )
    r = jeng.query(sql)
    assert "star join answered" in r["plan"]["reason"], r["plan"]
    raw = [x.asDict() for x in spark.sql(sql).collect()]
    assert raw
    _assert_equal(r["result"], raw)

    three = (
        "SELECT d.label, t.tag, COUNT(*) AS n, MAX(jfact.value) AS mx "
        "FROM jfact JOIN jdim d ON jfact.event_type = d.event_type "
        "JOIN jdim_dup t ON jfact.event_type = t.event_type "
        "WHERE CAST(jfact.ts AS DATE) BETWEEN DATE '2024-02-02' "
        "AND DATE '2024-02-09' "
        "GROUP BY d.label, t.tag ORDER BY d.label, t.tag"
    )
    r3 = jeng.query(three)
    assert "star join answered" in r3["plan"]["reason"], r3["plan"]
    raw3 = [x.asDict() for x in spark.sql(three).collect()]
    assert raw3
    _assert_equal(r3["result"], raw3)


def test_cast_to_date_group_key_routes(eng):
    """Round-7: GROUP BY CAST(ts AS DATE) (the DATE-typed day-grain key)
    routes like DATE_TRUNC and matches raw, including the output type."""
    sql = (
        "SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n, "
        "SUM(value) AS sv FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' "
        "GROUP BY CAST(ts AS DATE), event_type ORDER BY day, event_type"
    )
    r, raw = _both(eng, sql)
    assert "rollup" in r["plan"]["reason"], r["plan"]["reason"]
    assert raw
    _assert_equal(r["result"], raw)


@pytest.fixture(scope="module")
def heng(spark):
    """Engine with a rollup AND a day layout — the real-time hybrid
    config (separate from `eng` so layout routing can't perturb the
    other tests' plans)."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_rollup_hyb_"),
        data_dir="/root/testdata/sf0.001",
    )
    e.create_rollup("events", "ts", "1 hour", dims=["event_type"], measures=["value"])
    e.partition_table("events", "ts", grain="day")
    return e


@pytest.mark.parametrize(
    "pred",
    [
        # the "last N days until now" dashboard shape: off-grid upper
        "ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-07 18:37:22'",
        # off-grid on both ends (head + tail slices)
        "ts >= TIMESTAMP '2024-01-02 05:30:00' AND ts <= TIMESTAMP '2024-01-07 18:10:11'",
        # strict > lower (shifts by 1µs) + off-grid upper
        "ts > TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-06 11:11:11'",
        # unbounded lower, off-grid upper: all history + one slice
        "ts < TIMESTAMP '2024-01-06 11:11:11'",
        # dim filter rides along (pushed into both union branches)
        "event_type = 'click' AND ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-07 18:37:22'",
    ],
)
def test_realtime_hybrid_routes_and_matches(heng, pred):
    """Round-7 flagship #2: off-grid time bounds answer as rollup state
    for complete buckets UNION ALL per-row pseudo-state for the raw
    edge slices (routed through the day layout) — exactly."""
    sql = (
        "SELECT event_type, COUNT(*) AS n, COUNT(value) AS nv, "
        "SUM(value) AS sv, MIN(value) AS mn, MAX(value) AS mx, "
        "AVG(value) AS av FROM events "
        f"WHERE {pred} GROUP BY event_type ORDER BY event_type"
    )
    r = heng.query(sql)
    assert r["status"] == "ok", r.get("error")
    assert "raw edge slice" in r["plan"]["reason"], (pred, r["plan"]["reason"])
    assert "via layout events__by_day" in r["plan"]["reason"]
    raw = [x.asDict() for x in heng.spark.sql(sql).collect()]
    assert raw, f"premise: {pred}"
    _assert_equal(r["result"], raw)


def test_realtime_hybrid_declines_when_no_complete_bucket(heng):
    """A range inside one bucket has nothing for the rollup to add —
    the normal planner owns it (and partition routing still applies)."""
    sql = (
        "SELECT COUNT(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-03 05:10:00' "
        "AND ts < TIMESTAMP '2024-01-03 05:50:00'"
    )
    r = heng.query(sql)
    assert r["status"] == "ok"
    assert "raw edge slice" not in r["plan"]["reason"], r["plan"]
    assert r["result"][0]["n"] == heng.spark.sql(sql).collect()[0]["n"]


def test_realtime_hybrid_declines_distinct(heng):
    """COUNT(DISTINCT) has no per-row mergeable state — hybrid declines
    and the planner answers (exactly, under prefer_exact)."""
    sql = (
        "SELECT COUNT(DISTINCT user_id) AS du FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-07 18:37:22'"
    )
    r = heng.query(sql, prefer_exact=True)
    assert r["status"] == "ok"
    assert "raw edge slice" not in r["plan"]["reason"], r["plan"]
    assert (
        r["result"][0]["du"]
        == heng.spark.sql(sql).collect()[0]["du"]
    )


def test_realtime_hybrid_distinct_sketch(spark):
    """COUNT(DISTINCT) over a tracked column works through the hybrid:
    the fresh branch builds hll_sketch_agg state over the slice rows
    and the union merges both branches' sketches."""
    import datetime

    rows = 40_000
    base = datetime.datetime(2024, 11, 1)
    spark.range(rows).selectExpr(
        f"timestamp'{base}' + make_interval(0,0,0,0,0,0, (id * 7) % 432000)"
        " AS ts",
        "CONCAT('u', CONV(SUBSTRING(md5(CAST(id AS STRING)),1,8),16,10)"
        " % 5000) AS user_id",
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS seg",
    ).createOrReplaceTempView("hyb_hll_src")
    e = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_hyb_hll_"))
    e.catalog.upsert_table_stats("hyb_hll_src", rows)
    e.create_rollup(
        "hyb_hll_src", "ts", "1 hour", dims=["seg"],
        distinct_cols=["user_id"],
    )
    sql = (
        "SELECT seg, COUNT(*) AS n, COUNT(DISTINCT user_id) AS du "
        "FROM hyb_hll_src WHERE ts >= TIMESTAMP '2024-11-01 00:00:00' "
        "AND ts < TIMESTAMP '2024-11-05 13:40:27' "
        "GROUP BY seg ORDER BY seg"
    )
    r = e.query(sql, max_rel_error=0.05)
    assert r["status"] == "ok", r.get("error")
    assert "raw edge slice" in r["plan"]["reason"], r["plan"]
    assert "HLL state merged across both branches" in r["plan"]["reason"]
    assert r["plan"]["type"] == "sketch"
    exact = {
        x["seg"]: (x["n"], x["du"])
        for x in (y.asDict() for y in spark.sql(sql).collect())
    }
    assert len(r["result"]) == 2
    for d in r["result"]:
        n_e, du_e = exact[d["seg"]]
        assert d["n"] == n_e  # COUNT(*) exact through the hybrid
        assert abs(d["du"] - du_e) / du_e < 0.04, (d, du_e)
    # exactness request: hybrid must not serve the sketch
    r2 = e.query(sql, prefer_exact=True)
    assert "raw edge slice" not in r2["plan"]["reason"]
