"""Measure-biased (PPS) sampling: variance advantage on skewed data and
engine integration."""

import pytest
from pyspark.sql import functions as F

from approximate_query_engine_spark.rewriter import (
    rewrite_uniform_sample,
    rewrite_weighted_sample,
)
from approximate_query_engine_spark.sqlparser import parse


@pytest.fixture(scope="module")
def skewed(spark, engine):
    # heavy-tailed measure: a few rows carry most of the sum
    df = spark.range(1, 20_001).select(
        F.col("id"),
        (F.when(F.col("id") % 1000 == 0, 50_000.0).otherwise(5.0)).alias("rev"),
        (F.col("id") % 7).alias("grp"),
    )
    engine.register_view("skewed_sales", df)
    return df


def test_weighted_sample_stores_probabilities(engine, skewed):
    info = engine.sampler.create_weighted_sample("skewed_sales", "rev", 0.02, seed=1)
    assert info.allocation_type == "weighted"
    cols = engine.spark.table(info.sample_table).columns
    assert "__p" in cols
    # every heavy row (p=1) must be present: 20 rows with rev=50000
    heavy = engine.spark.sql(
        f"SELECT COUNT(*) AS c FROM {info.sample_table} WHERE rev = 50000.0"
    ).collect()[0]["c"]
    assert heavy == 20


def test_weighted_beats_uniform_on_skewed_sum(engine, skewed):
    true_sum = engine.spark.sql("SELECT SUM(rev) s FROM skewed_sales").collect()[0]["s"]
    parsed = parse("SELECT SUM(rev) AS s FROM skewed_sales")
    w_errs, u_errs = [], []
    for seed in range(6):
        w = engine.sampler.create_weighted_sample("skewed_sales", "rev", 0.02, seed=seed)
        u = engine.sampler.create_uniform_sample("skewed_sales", 0.02, seed=seed)
        w_est = engine.spark.sql(rewrite_weighted_sample(parsed, w).sql).collect()[0]["s"]
        u_est = engine.spark.sql(rewrite_uniform_sample(parsed, u).sql).collect()[0]["s"]
        w_errs.append(abs(w_est - true_sum) / true_sum)
        u_errs.append(abs(u_est - true_sum) / true_sum)
    assert sum(w_errs) / len(w_errs) < sum(u_errs) / len(u_errs)
    assert max(w_errs) < 0.05  # PPS: heavy rows certain, tail cheap


def test_planner_picks_weighted_for_measure_sum(engine, skewed):
    engine.sampler.create_weighted_sample("skewed_sales", "rev", 0.02, seed=9)
    plan = engine.planner.plan("SELECT SUM(rev) AS s FROM skewed_sales", max_rel_error=0.05)
    assert "wsample" in (plan.get("sample_table") or ""), plan["reason"]
    r = engine.query("SELECT SUM(rev) AS s FROM skewed_sales", max_rel_error=0.05)
    true_sum = engine.spark.sql("SELECT SUM(rev) s FROM skewed_sales").collect()[0]["s"]
    assert r["result"][0]["s"] == pytest.approx(true_sum, rel=0.05)
    assert r["result"][0]["s_ci_low"] <= true_sum <= r["result"][0]["s_ci_high"]


def test_planner_skips_weighted_for_other_measures(engine, skewed):
    # COUNT-only query must not use the PPS sample
    plan = engine.planner.plan("SELECT COUNT(*) AS c FROM skewed_sales", max_rel_error=0.1)
    assert "wsample" not in (plan.get("sample_table") or "")


def test_weighted_refresh(engine, skewed):
    info = engine.sampler.create_weighted_sample("skewed_sales", "rev", 0.02, seed=3)
    ref = engine.sampler.refresh_sample(info.sample_table)
    assert ref.allocation_type == "weighted" and ref.variance_column == "rev"


def test_deterministic_pps_reproducible_and_accurate(spark):
    """key_expr mode: two independent builds keep the IDENTICAL subset
    (md5-hash inclusion draw, no rand), and the HT estimate of
    SUM(measure) lands near-exact (PPS on the measure: each kept row
    contributes the same scaled mass, so error = kept-count noise)."""
    import tempfile

    from approximate_query_engine_spark import AQEngine

    key = "CONCAT(CAST(l_orderkey AS STRING), ':', CAST(l_linenumber AS STRING))"
    counts, ests = [], []
    for _ in range(2):
        eng = AQEngine(
            spark,
            workdir=tempfile.mkdtemp(prefix="aqe_detpps_"),
            data_dir="/root/testdata/sf0.001",
        )
        info = eng.sampler.create_weighted_sample(
            "lineitem", "l_extendedprice", 0.05, seed=7, key_expr=key
        )
        counts.append(info.row_count)
        ests.append(
            spark.sql(
                f"SELECT SUM(l_extendedprice / __p) AS t FROM {info.sample_table}"
            ).collect()[0]["t"]
        )
    assert counts[0] == counts[1]
    assert ests[0] == ests[1]
    exact = spark.sql(
        "SELECT SUM(l_extendedprice) AS t FROM lineitem"
    ).collect()[0]["t"]
    assert abs(ests[0] - exact) / exact < 0.15


def test_refresh_preserves_deterministic_pps_key(spark):
    """refresh_sample on a deterministic (md5-keyed) PPS sample must
    rebuild with the SAME key expression — degrading to rand(seed) would
    silently break the engine-reproducible subset contract."""
    import tempfile

    from approximate_query_engine_spark import AQEngine

    key = "CONCAT(CAST(l_orderkey AS STRING), ':', CAST(l_linenumber AS STRING))"
    eng = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_ppsrefresh_"),
        data_dir="/root/testdata/sf0.001",
    )
    info = eng.sampler.create_weighted_sample(
        "lineitem", "l_extendedprice", 0.05, seed=7, key_expr=key
    )
    assert info.pps_key_expr == key
    refreshed = eng.sampler.refresh_sample(info.sample_table)
    assert refreshed.pps_key_expr == key
    # same base data + same deterministic draw => identical subset
    assert refreshed.row_count == info.row_count
