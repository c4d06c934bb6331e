"""Statistical validation of the estimators (SURVEY §5 'approx-mode
statistical tests'): across many seeded samples, the reported 95% CI must
contain the true value at roughly the nominal rate, and stratified (Neyman)
sampling should beat uniform sampling on error for group aggregates.

Marked slow: ~40 Spark jobs. Run with ``-m slow`` or the full suite.
"""

import pytest
from pyspark.sql import functions as F

from approximate_query_engine_spark.rewriter import rewrite_inline_sample
from approximate_query_engine_spark.sqlparser import parse

pytestmark = pytest.mark.slow

N_SEEDS = 40


@pytest.fixture(scope="module")
def truth(spark, engine):
    row = spark.sql(
        "SELECT COUNT(*) AS cnt, SUM(l_extendedprice) AS total FROM lineitem"
    ).collect()[0]
    return row["cnt"], row["total"]


def test_ci_coverage_count_sum(spark, engine, truth):
    """True COUNT and SUM fall inside the reported 95% CI in ≥85% of seeded
    reruns (nominal 95%, slack for small-sample normal approximation)."""
    true_cnt, true_sum = truth
    parsed = parse("SELECT COUNT(*) AS cnt, SUM(l_extendedprice) AS total FROM lineitem")
    hits_cnt = hits_sum = 0
    for seed in range(N_SEEDS):
        rw = rewrite_inline_sample(parsed, fraction=0.1, seed=seed)
        row = spark.sql(rw.sql).collect()[0]
        if row["cnt_ci_low"] <= true_cnt <= row["cnt_ci_high"]:
            hits_cnt += 1
        if row["total_ci_low"] <= true_sum <= row["total_ci_high"]:
            hits_sum += 1
    assert hits_cnt >= 0.85 * N_SEEDS, f"count CI coverage {hits_cnt}/{N_SEEDS}"
    assert hits_sum >= 0.85 * N_SEEDS, f"sum CI coverage {hits_sum}/{N_SEEDS}"


def test_estimates_unbiased_on_average(spark, engine, truth):
    """Mean of the scaled estimates over seeds is within 2% of the truth
    (Horvitz–Thompson unbiasedness)."""
    true_cnt, true_sum = truth
    parsed = parse("SELECT COUNT(*) AS cnt, SUM(l_extendedprice) AS total FROM lineitem")
    cnts, sums = [], []
    for seed in range(N_SEEDS):
        rw = rewrite_inline_sample(parsed, fraction=0.1, seed=seed)
        row = spark.sql(rw.sql).collect()[0]
        cnts.append(row["cnt"])
        sums.append(row["total"])
    assert abs(sum(cnts) / len(cnts) - true_cnt) / true_cnt < 0.02
    assert abs(sum(sums) / len(sums) - true_sum) / true_sum < 0.02


def test_ci_coverage_avg_linearized(spark, engine):
    """AVG CIs from the Taylor-linearized ratio-estimator variance: true
    AVG inside the 95% CI in ≥85% of seeded reruns — for uniform inline
    samples AND for a stratified sample with wildly different per-stratum
    fractions (the case the old SRS-only s/√n formula ignored)."""
    from approximate_query_engine_spark.rewriter import rewrite_stratified

    true_avg = spark.sql(
        "SELECT AVG(l_extendedprice) AS a FROM lineitem"
    ).collect()[0]["a"]
    parsed = parse("SELECT AVG(l_extendedprice) AS a FROM lineitem")

    hits = 0
    for seed in range(N_SEEDS):
        rw = rewrite_inline_sample(parsed, fraction=0.1, seed=seed)
        row = spark.sql(rw.sql).collect()[0]
        if row["a_ci_low"] <= true_avg <= row["a_ci_high"]:
            hits += 1
    assert hits >= 0.85 * N_SEEDS, f"uniform AVG CI coverage {hits}/{N_SEEDS}"

    hits = 0
    n_strat_seeds = 12
    for seed in range(n_strat_seeds):
        strat = engine.sampler.create_stratified_sample(
            "lineitem", "l_returnflag", 0.1, variance_col="l_extendedprice",
            seed=seed,
        )
        row = spark.sql(rewrite_stratified(parsed, strat).sql).collect()[0]
        if row["a_ci_low"] <= true_avg <= row["a_ci_high"]:
            hits += 1
    assert hits >= 0.75 * n_strat_seeds, f"stratified AVG CI coverage {hits}/{n_strat_seeds}"


def test_stratified_beats_uniform_for_group_sums(spark, engine):
    """At equal overall fraction, per-stratum (Neyman) sampling yields a
    lower mean relative error on per-group SUMs than uniform sampling —
    the reason the stratified strategy exists. Compared over seeds."""
    from approximate_query_engine_spark.rewriter import (
        rewrite_stratified,
        rewrite_uniform_sample,
    )

    truth = {
        r["l_returnflag"]: r["s"]
        for r in spark.sql(
            "SELECT l_returnflag, SUM(l_extendedprice) AS s FROM lineitem "
            "GROUP BY l_returnflag"
        ).collect()
    }
    parsed = parse(
        "SELECT l_returnflag, SUM(l_extendedprice) AS s FROM lineitem "
        "GROUP BY l_returnflag"
    )

    def mean_rel_err(sample_info, rewrite_fn):
        rw = rewrite_fn(parsed, sample_info)
        rows = spark.sql(rw.sql).collect()
        errs = [
            abs(r["s"] - truth[r["l_returnflag"]]) / truth[r["l_returnflag"]]
            for r in rows
        ]
        return sum(errs) / len(errs)

    uni_errs, strat_errs = [], []
    for seed in range(8):
        uni = engine.sampler.create_uniform_sample("lineitem", 0.1, seed=seed)
        strat = engine.sampler.create_stratified_sample(
            "lineitem", "l_returnflag", 0.1, variance_col="l_extendedprice",
            seed=seed,
        )
        uni_errs.append(mean_rel_err(uni, rewrite_uniform_sample))
        strat_errs.append(mean_rel_err(strat, rewrite_stratified))
    # stratified wins on average (not necessarily every seed)
    assert sum(strat_errs) / len(strat_errs) <= sum(uni_errs) / len(uni_errs) * 1.05


def test_ci_coverage_quantile_rank_band(spark, engine):
    """The binomial rank-band CI for a sampled MEDIAN covers the true
    median at ≥85% of nominal across seeded reruns. Uses the continuous
    l_extendedprice column — on heavily discrete columns the band can
    collapse to a point inside a flat quantile region, which is a
    property of order-statistic CIs, not a defect."""
    true_med = spark.sql(
        "SELECT MEDIAN(CAST(l_extendedprice AS DOUBLE)) AS m FROM lineitem"
    ).collect()[0]["m"]
    parsed = parse(
        "SELECT MEDIAN(CAST(l_extendedprice AS DOUBLE)) AS m FROM lineitem"
    )
    n = spark.table("lineitem").count()
    hits = 0
    for seed in range(N_SEEDS):
        rw = rewrite_inline_sample(parsed, fraction=0.1, seed=seed, n_rows=n)
        row = spark.sql(rw.sql).collect()[0]
        if row["m_ci_low"] <= true_med <= row["m_ci_high"]:
            hits += 1
    assert hits >= 0.85 * N_SEEDS, f"median CI coverage {hits}/{N_SEEDS}"
