"""Regression tests for the round-1 code-review findings."""

import pytest

from approximate_query_engine_spark.rewriter import (
    UnsupportedRewriteError,
    _AggScaler,
    _scale_aggs_in_expr,
    rewrite_inline_sample,
)
from approximate_query_engine_spark.sqlparser import parse


# -- finding 1: DISTINCT aggregates must never be silently sampled --
def test_sum_distinct_routes_exact(engine, duck):
    r = engine.query(
        "SELECT SUM(DISTINCT l_quantity) AS s FROM lineitem",
        max_rel_error=0.2,
        use_ml_optimization=True,
    )
    assert r["status"] == "ok"
    assert r["plan"]["type"] == "exact"
    true = duck.execute("SELECT SUM(DISTINCT l_quantity) FROM lineitem").fetchone()[0]
    assert r["result"][0]["s"] == true


def test_scaler_rejects_distinct():
    scaler = _AggScaler("CAST(0.01 AS DOUBLE)")
    with pytest.raises(UnsupportedRewriteError):
        parsed = parse("SELECT SUM(DISTINCT x) FROM t")
        scaler.scaled(parsed.aggregates[0])


def test_count_distinct_plus_sum_distinct_still_sketchable(engine):
    # COUNT(DISTINCT) gets the sketch; SUM stays exact inside the same
    # full-table query (no sampling on the sketch path)
    r = engine.query(
        "SELECT COUNT(DISTINCT l_orderkey) AS c, SUM(l_tax) AS s FROM lineitem",
        max_rel_error=0.05,
        use_ml_optimization=True,
    )
    assert r["plan"]["type"] == "sketch"


# -- findings 2+3: HAVING scaling robustness --
def test_having_lowercase_and_having_only_aggs_scaled():
    parsed = parse(
        "SELECT l_returnflag, COUNT(*) AS c FROM lineitem "
        "GROUP BY l_returnflag HAVING count(*) > 100 AND sum(l_tax) > 5"
    )
    rw = rewrite_inline_sample(parsed, 0.01, seed=1)
    having = rw.sql.split("HAVING")[1]
    # both the lowercase count(*) and the HAVING-only sum(l_tax) are scaled
    assert "count(*) > 100" not in having
    assert having.count("/ CAST(0.01 AS DOUBLE)") >= 2


def test_having_alias_not_double_scaled():
    parsed = parse(
        "SELECT dept, SUM(x) AS x FROM emp GROUP BY dept HAVING SUM(x) > 10"
    )
    rw = rewrite_inline_sample(parsed, 0.01, seed=1)
    having = rw.sql.split("HAVING")[1]
    # exactly one scaling of the SUM call, no nested aggregates
    assert having.count("SUM(CAST((x) AS DOUBLE)") == 1


def test_scale_aggs_in_expr_passthrough_min_max():
    scaler = _AggScaler("CAST(0.5 AS DOUBLE)")
    out = _scale_aggs_in_expr("MIN(a) > 3 AND Count( * ) < 10", scaler)
    assert out.startswith("MIN(a) > 3")
    assert "SUM(1.0 / CAST(0.5 AS DOUBLE))" in out


# -- finding 4: as-of join must not mix columns across right rows --
def test_asof_union_null_column_atomicity(spark):
    from approximate_query_engine_spark.operators import asof_join

    right = spark.createDataFrame(
        [("A", 1, 5.0, 1.0), ("A", 2, None, 2.0)],
        "sym string, t long, x double, y double",
    )
    left = spark.createDataFrame([("A", 3, 9)], "sym string, t long, sz long")
    row = asof_join(left, right, on="t", by="sym", right_prefix="r_").collect()[0]
    # the as-of row is (t=2, x=NULL, y=2.0) — x must be NULL, not 5.0
    assert row["r_x"] is None and row["r_y"] == 2.0


# -- finding 5: salted_join rejects unsafe join types --
def test_salted_join_rejects_outer(spark):
    from approximate_query_engine_spark.operators import salted_join

    a = spark.createDataFrame([(1, 1)], "k long, v long")
    b = spark.createDataFrame([(1, 2)], "k long, w long")
    with pytest.raises(ValueError):
        salted_join(a, b, on="k", how="full")
    with pytest.raises(ValueError):
        salted_join(a, b, on="k", how="left_anti")


# -- finding 6: stratum stringification matches Spark cast --
def test_boolean_strata_weights(spark, engine):
    df = spark.createDataFrame(
        [(i, i % 3 == 0, float(i % 100)) for i in range(3000)],
        "id long, flag boolean, v double",
    )
    engine.register_view("boolstrat", df)
    info = engine.sampler.create_stratified_sample("boolstrat", "flag", 0.5, seed=3)
    assert {s.strata_value for s in info.strata} == {"true", "false"}
    from approximate_query_engine_spark.rewriter import rewrite_stratified

    parsed = parse("SELECT COUNT(*) AS c FROM boolstrat")
    rw = rewrite_stratified(parsed, info)
    est = spark.sql(rw.sql).collect()[0]["c"]
    assert abs(est - 3000) / 3000 < 0.15  # weights actually matched


def test_empty_strata_case_is_valid_sql():
    from approximate_query_engine_spark.rewriter import _weight_case_expr

    expr = _weight_case_expr("c", [], 0.1)
    assert expr == "(CAST(0.1 AS DOUBLE))"


# -- finding 7: measured error robust to NULL in first row --
def test_measured_relative_error_null_first_row():
    from approximate_query_engine_spark.executor import measured_relative_error

    approx = [
        {"g": "a", "s": None},
        {"g": "b", "s": 110.0},
    ]
    exact = [
        {"g": "a", "s": 50.0},
        {"g": "b", "s": 100.0},
    ]
    err = measured_relative_error(approx, exact)
    # 's' stays numeric; only the b-row contributes (a has None)
    assert err == pytest.approx(0.1)


# -- finding 10: ML path plans once (plan rides in the optimization dict) --
def test_ml_optimization_dict_has_no_private_keys(engine):
    r = engine.query(
        "SELECT COUNT(*) AS c FROM lineitem", max_rel_error=0.2,
        use_ml_optimization=True,
    )
    assert r["status"] == "ok"
    assert "_plan" not in (r["ml_optimization"] or {})
