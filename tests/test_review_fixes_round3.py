"""Regression tests for the round-6 ADVICE findings (judge round 5):

1. medium engine.py — partition routing injected the p_bucket conjunct at
   the FIRST WHERE / FROM in the raw SQL, which lands inside a scalar
   subquery's scope when one appears in the select list.
2. low partitioning.py — refresh_partition_layout defaulted grain='day'
   independently of the layout's actual grain, silently duplicating rows
   of a month-grain layout under dynamic overwrite.
3. low engine.py — replacing a table's data through the engine must
   invalidate its partitioned-layout routing entry (equal-row-count
   replacement is invisible to the row-count drift gate).
4. low planner.py — the IN-list tokenizer matched case-sensitively while
   the desugar that built the @IN@ marker was case-insensitive, so a
   lowercase `date '…'` literal priced off string stats.
"""

import datetime
import tempfile

import pytest

from approximate_query_engine_spark import AQEngine


def q(eng, sql, **kw):
    r = eng.query(sql, **kw)
    assert r["status"] == "ok", r
    return r


def test_routing_bails_on_scalar_subquery_in_select(spark):
    """A scalar subquery before the outer FROM must disable routing —
    the injected p_bucket conjunct would otherwise land in the INNER
    WHERE (AnalysisException, or a silently wrong answer if the inner
    table has a p_bucket column)."""
    eng = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_subq_route_"),
        data_dir="/root/testdata/sf0.001",
    )
    sql = (
        "SELECT (SELECT COUNT(*) FROM nation WHERE n_regionkey = 0) AS x, "
        "COUNT(*) AS n FROM events "
        "WHERE ts <= TIMESTAMP '2024-01-05 00:00:00'"
    )
    before = q(eng, sql)["result"]
    eng.partition_table("events", "ts", grain="day")
    r = q(eng, sql)
    assert "events__by_day" not in r["plan"]["sql"]
    assert r["result"] == before
    # the plain single-SELECT shape still routes (guard is not over-broad)
    plain = (
        "SELECT COUNT(*) AS n FROM events "
        "WHERE ts <= TIMESTAMP '2024-01-05 00:00:00'"
    )
    r2 = q(eng, plain)
    assert "events__by_day" in r2["plan"]["sql"]


def test_refresh_layout_infers_and_validates_grain(spark, tmp_path):
    """Refreshing a month-grain layout must not write day-grain bucket
    directories: the default infers the existing grain from the directory
    names, and an explicit mismatching grain raises."""
    from pyspark.sql import functions as F

    from approximate_query_engine_spark.operators.partitioning import (
        list_bucket_dirs,
        partition_by_time,
        read_partitioned,
        refresh_partition_layout,
    )

    base = datetime.datetime(2024, 1, 15)
    schema = "ts timestamp, v double"
    rows = [
        (base + datetime.timedelta(days=30 * m), float(m)) for m in range(3)
    ]
    path = str(tmp_path / "monthly")
    partition_by_time(
        spark.createDataFrame(rows, schema), path, "ts", grain="month"
    )
    assert list_bucket_dirs(spark, path) == ["2024-01", "2024-02", "2024-03"]
    with pytest.raises(ValueError, match="month-grain"):
        refresh_partition_layout(
            spark, spark.createDataFrame(rows, schema), path, "ts", grain="day"
        )
    # default grain: inferred month — refresh appends a new month bucket,
    # never a day-named sibling directory
    new_rows = rows + [(datetime.datetime(2024, 4, 2), 9.0)]
    refresh_partition_layout(
        spark, spark.createDataFrame(new_rows, schema), path, "ts"
    )
    buckets = list_bucket_dirs(spark, path)
    assert buckets == ["2024-01", "2024-02", "2024-03", "2024-04"]
    got = read_partitioned(spark, path)
    assert got.count() == len(new_rows)
    assert got.filter(F.col("p_bucket") == "2024-04").count() == 1


def test_register_view_invalidates_stale_layout(spark):
    """Replacing a table's data with the SAME row count must drop the
    routing entry — the drift gate compares row counts and cannot see an
    in-place mutation; serving the old layout would be a wrong 'exact'
    answer."""
    from pyspark.sql import functions as F

    eng = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_stale_route_"),
        data_dir="/root/testdata/sf0.001",
    )
    ev = spark.table("events")
    ev.createOrReplaceTempView("ev_copy")
    eng.catalog.upsert_table_stats("ev_copy", ev.count())
    eng.partition_table("ev_copy", "ts", grain="day")
    sql = (
        "SELECT COUNT(*) AS n FROM ev_copy "
        "WHERE ts <= TIMESTAMP '2024-01-05 00:00:00'"
    )
    assert "ev_copy__by_day" in q(eng, sql)["plan"]["sql"]
    # same row count, different data: shift every timestamp by 10 days
    eng.register_view(
        "ev_copy", ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 DAYS"))
    )
    r = q(eng, sql)
    assert "ev_copy__by_day" not in r["plan"]["sql"]
    truth = (
        spark.table("ev_copy")
        .filter("ts <= TIMESTAMP '2024-01-05 00:00:00'")
        .count()
    )
    assert r["result"][0]["n"] == truth


def test_in_list_date_literals_case_insensitive(spark):
    """`col in (date '…', date '…')` must tokenize its members as DATE
    literals (histogram point masses), not quoted strings — lowercase and
    uppercase spellings price identically."""
    from approximate_query_engine_spark.planner import (
        WHERE_SELECTIVITY_DEFAULT,
        estimate_selectivity,
    )
    from approximate_query_engine_spark.sqlparser import parse

    eng = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_inlist_ci_"),
        data_dir="/root/testdata/sf0.001",
    )
    eng.analyze_table("lineitem", ["l_shipdate"])
    base = "SELECT SUM(l_extendedprice) AS s FROM lineitem WHERE {w}"

    def sel(w):
        return estimate_selectivity(parse(base.format(w=w)), eng.catalog)

    upper = sel("l_shipdate IN (DATE '1995-06-17', DATE '1995-06-18')")
    lower = sel("l_shipdate in (date '1995-06-17', date '1995-06-18')")
    assert upper != WHERE_SELECTIVITY_DEFAULT
    assert lower == upper
