"""The materialization advisor (late round 7): rollup-shaped queries
that run WITHOUT a rollup record their inferred shape; recurring shapes
merge into a concrete create_rollup suggestion; following the advice
routes the original workload and converges the advice to empty."""

import tempfile

import pytest

from approximate_query_engine_spark import AQEngine
from approximate_query_engine_spark.operators.rollup import (
    infer_rollup_shape,
)
from approximate_query_engine_spark.sqlparser import try_parse

WORKLOAD = [
    "SELECT event_type, COUNT(*) AS n FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-05 00:00:00' GROUP BY event_type",
    "SELECT DATE_TRUNC('DAY', ts) AS day, SUM(value) AS sv FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-09 00:00:00' "
    "GROUP BY DATE_TRUNC('DAY', ts)",
    "SELECT event_type, COUNT(DISTINCT user_id) AS du FROM events "
    "WHERE ts BETWEEN TIMESTAMP '2024-01-02 00:00:00' "
    "AND TIMESTAMP '2024-01-05 00:00:00' GROUP BY event_type",
    "SELECT event_type, MEDIAN(value) AS med FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-05 00:00:00' GROUP BY event_type",
]


def test_advisor_end_to_end(spark):
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_"),
        data_dir="/root/testdata/sf0.001",
    )
    for q in WORKLOAD:
        r = e.query(q, max_rel_error=0.05)
        assert r["status"] == "ok", r.get("error")
    recs = e.recommend_rollups(min_count=3)
    assert len(recs) == 1
    rec = recs[0]
    assert rec["table"] == "events" and rec["time_col"] == "ts"
    assert rec["bucket"] == "1 hour"  # finest observed grain wins
    assert rec["dims"] == ["event_type"]
    assert rec["measures"] == ["value"]
    assert rec["distinct_cols"] == ["user_id"]
    assert rec["quantile_cols"] == ["value"]
    assert rec["observed_queries"] == len(WORKLOAD)
    # follow the advice: the whole workload now routes...
    e.create_rollup(
        rec["table"],
        rec["time_col"],
        rec["bucket"],
        dims=rec["dims"],
        measures=rec["measures"],
        distinct_cols=rec["distinct_cols"],
        quantile_cols=rec["quantile_cols"],
        kll_k=800,  # a DIFFERENT k than the suggestion's default
    )
    for q in WORKLOAD:
        r = e.query(q, max_rel_error=0.05)
        assert "rollup" in r["plan"]["reason"], (q, r["plan"]["reason"])
    # ...and the advice converges to empty (coverage is structural —
    # the different kll_k must not keep the suggestion alive)
    assert e.recommend_rollups(min_count=1) == []


def test_advisor_ignores_non_rollup_shapes(spark):
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_neg_"),
        data_dir="/root/testdata/sf0.001",
    )
    for q in (
        "SELECT COUNT(*) AS n FROM lineitem",  # no time dimension
        "SELECT l_returnflag, SUM(l_quantity) AS sq FROM lineitem "
        "GROUP BY l_returnflag",  # no time dimension
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE value > 10 OR user_id = 3 GROUP BY event_type",  # OR
    ):
        assert e.query(q)["status"] == "ok"
    assert e.recommend_rollups(min_count=1) == []


@pytest.mark.parametrize(
    "sql,expect",
    [
        # raw-ts grouping is not a rollup shape
        ("SELECT ts, COUNT(*) AS n FROM events GROUP BY ts", None),
        # two different time columns decline
        (
            "SELECT DATE_TRUNC('DAY', ts) AS d, COUNT(*) AS n FROM events "
            "WHERE event_id >= TIMESTAMP '2024-01-01 00:00:00' GROUP BY "
            "DATE_TRUNC('DAY', ts)",
            None,
        ),
        # minute grain maps to the finest bucket
        (
            "SELECT DATE_TRUNC('MINUTE', ts) AS m, COUNT(*) AS n "
            "FROM events GROUP BY DATE_TRUNC('MINUTE', ts)",
            "1 minute",
        ),
    ],
)
def test_infer_shape_edges(sql, expect):
    parsed = try_parse(sql)
    assert parsed is not None
    shape = infer_rollup_shape(parsed)
    if expect is None:
        assert shape is None
    else:
        assert shape is not None and shape["bucket"] == expect
