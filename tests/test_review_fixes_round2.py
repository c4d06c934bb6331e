"""Regression tests for the second code-review pass."""

import pytest
from pyspark.sql import functions as F

from approximate_query_engine_spark.rewriter import (
    _AggScaler,
    _scale_aggs_in_expr,
    rewrite_stratified,
)
from approximate_query_engine_spark.sqlparser import parse


# -- finding 1: NULL strata must be sampled and weighted --
def test_null_stratum_sampled_and_weighted(spark, engine):
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else ("a" if i % 2 == 0 else "b"), 1.0)
         for i in range(1, 6001)],
        "id long, grp string, v double",
    )
    engine.register_view("nullstrat", df)
    info = engine.sampler.create_stratified_sample("nullstrat", "grp", 0.3, seed=2)
    null_strata = [s for s in info.strata if s.is_null]
    assert null_strata and null_strata[0].sample_size > 0  # nulls ARE sampled
    parsed = parse("SELECT COUNT(*) AS c FROM nullstrat")
    est = spark.sql(rewrite_stratified(parsed, info).sql).collect()[0]["c"]
    assert abs(est - 6000) / 6000 < 0.1  # no ~33% underestimate


# -- finding 2+6: PPS gating on co-aggregates and word boundaries --
def test_weighted_not_used_with_count_coaggregate(spark, engine):
    df = spark.range(1, 10_001).select(
        F.col("id"), (F.col("id") % 100 * 1.0).alias("rev"),
        (F.col("id") % 100 * 2.0).alias("rev_share"),
    )
    engine.register_view("pps_gate", df)
    engine.sampler.create_weighted_sample("pps_gate", "rev", 0.05, seed=1)
    plan = engine.planner.plan(
        "SELECT COUNT(*) AS c, SUM(rev) AS s FROM pps_gate", max_rel_error=0.1
    )
    assert "wsample" not in (plan.get("sample_table") or "")
    # substring column name must not match
    plan2 = engine.planner.plan(
        "SELECT SUM(rev_share) AS s FROM pps_gate", max_rel_error=0.1
    )
    assert "wsample" not in (plan2.get("sample_table") or "")
    # the genuine measure still routes to PPS
    plan3 = engine.planner.plan("SELECT SUM(rev) AS s FROM pps_gate", max_rel_error=0.1)
    assert "wsample" in (plan3.get("sample_table") or "")


# -- finding 3: direct sample-table query with HAVING DISTINCT degrades to exact --
def test_direct_sample_having_distinct_exact(engine):
    engine.create_sample("orders", 0.4, seed=13)
    r = engine.query(
        "SELECT o_orderstatus, COUNT(*) AS c FROM orders__sample_0_4 "
        "GROUP BY o_orderstatus HAVING COUNT(DISTINCT o_custkey) > 2"
    )
    assert r["status"] == "ok"
    assert r["plan"]["type"] == "exact"


# -- finding 4: string literals with parens/keywords survive HAVING scaling --
def test_scale_aggs_ignores_string_literals():
    scaler = _AggScaler("CAST(0.5 AS DOUBLE)")
    src = "SUM(CASE WHEN note = ')' THEN v ELSE 0 END) > 10 AND tag = 'COUNT(x'"
    out = _scale_aggs_in_expr(src, scaler)
    assert "tag = 'COUNT(x'" in out  # literal untouched
    assert out.count("END") == 1 and "' THEN v ELSE 0 END" in out


# -- finding 5: ORDER BY aggregates are scaled under weights --
def test_order_by_aggregate_scaled(engine, spark):
    df = spark.createDataFrame(
        [(i, "hot" if i % 10 == 0 else "cold", 1.0) for i in range(1, 20_001)],
        "id long, grp string, v double",
    )
    engine.register_view("obtest", df)
    parsed = parse(
        "SELECT grp, COUNT(*) AS c FROM obtest GROUP BY grp ORDER BY COUNT(*) DESC"
    )
    info = engine.sampler.create_stratified_sample("obtest", "grp", 0.1, seed=4)
    rw = rewrite_stratified(parsed, info)
    order_clause = rw.sql.split("ORDER BY")[1]
    # matched the select item -> sorts by its scaled output alias
    assert order_clause.strip() == "`c` DESC"
    rows = spark.sql(rw.sql).collect()
    assert rows[0]["grp"] == "cold"  # correct ranking by estimates
    # an ORDER BY aggregate NOT in the select list is scaled in place
    parsed2 = parse("SELECT grp FROM obtest GROUP BY grp ORDER BY SUM(v) DESC")
    rw2 = rewrite_stratified(parsed2, info)
    assert "SUM(CAST((v) AS DOUBLE)" in rw2.sql.split("ORDER BY")[1]


# -- finding 8: degenerate-measure fallback retires the stale weighted entry --
def test_weighted_fallback_retires_stale_entry(spark, engine):
    df = spark.range(1, 2_001).select(F.col("id"), (F.col("id") * 1.0).alias("m"))
    engine.register_view("wfall", df)
    info = engine.sampler.create_weighted_sample("wfall", "m", 0.1, seed=6)
    assert info.allocation_type == "weighted"
    # measure collapses to zero; rebuild under the same design
    df0 = spark.range(1, 2_001).select(F.col("id"), F.lit(0.0).alias("m"))
    engine.register_view("wfall", df0)
    out = engine.sampler.create_weighted_sample("wfall", "m", 0.1, seed=6)
    assert out.allocation_type != "weighted"
    assert engine.catalog.weighted_samples_for_table("wfall") == []
