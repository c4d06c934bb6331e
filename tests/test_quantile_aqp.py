"""Quantile AQP (beyond-reference §2.4 extension): MEDIAN / PERCENTILE
are sampling-invariant under uniform designs — the sample quantile
estimates the population quantile unscaled, with an order-statistic
(binomial rank band) 95% CI. Weighted designs (stratified / PPS) use the
weighted-frequency PERCENTILE form (no CI — the rank band assumes equal
inclusion probabilities)."""

import pytest

from approximate_query_engine_spark.rewriter import (
    UnsupportedRewriteError,
    rewrite_inline_sample,
    rewrite_systematic_sample,
)
from approximate_query_engine_spark.sqlparser import (
    UnsupportedQueryError,
    parse,
)


def test_parser_recognizes_quantiles():
    p = parse(
        "SELECT MEDIAN(l_quantity) AS med, "
        "PERCENTILE(l_extendedprice, 0.9) AS p90 FROM lineitem"
    )
    assert p.has_quantile
    med, p90 = p.aggregates
    assert med.is_quantile and med.quantile_args() == ("l_quantity", 0.5)
    assert p90.quantile_args() == ("l_extendedprice", 0.9)


def test_parser_rejects_bad_percentile_args():
    p = parse("SELECT PERCENTILE(l_quantity, l_tax) AS x FROM lineitem")
    with pytest.raises(UnsupportedQueryError):
        p.aggregates[0].quantile_args()
    p = parse("SELECT PERCENTILE(l_quantity, 1.5) AS x FROM lineitem")
    with pytest.raises(UnsupportedQueryError):
        p.aggregates[0].quantile_args()


def test_systematic_k1_is_identity(spark, engine):
    sql = (
        "SELECT MEDIAN(l_quantity) AS med, "
        "PERCENTILE(l_quantity, 0.25) AS q1 FROM lineitem"
    )
    exact = spark.sql(sql).collect()[0]
    rw = rewrite_systematic_sample(parse(sql), k=1, key_expr="l_orderkey")
    est = spark.sql(rw.sql).collect()[0]
    assert est["med"] == exact["med"]
    assert est["q1"] == exact["q1"]


def test_uniform_sample_ci_covers_exact_median(spark, engine):
    sql = "SELECT MEDIAN(l_quantity) AS med FROM lineitem"
    exact = float(spark.sql(sql).collect()[0]["med"])
    n = spark.table("lineitem").count()
    rw = rewrite_inline_sample(parse(sql), fraction=0.2, seed=7, n_rows=n)
    assert rw.ci_columns == ["med_ci_low", "med_ci_high", "med_rel_error"]
    row = spark.sql(rw.sql).collect()[0]
    assert row["med_ci_low"] <= exact <= row["med_ci_high"]
    # l_quantity is 1..50 so the median band must be sane, not degenerate
    assert row["med_ci_high"] - row["med_ci_low"] < 10


def test_grouped_quantile_estimates_without_ci(spark, engine):
    sql = (
        "SELECT l_returnflag, MEDIAN(l_quantity) AS med FROM lineitem "
        "GROUP BY l_returnflag"
    )
    n = spark.table("lineitem").count()
    rw = rewrite_inline_sample(parse(sql), fraction=0.5, seed=7, n_rows=n)
    assert rw.ci_columns == []  # per-group n is unknown at planning time
    rows = spark.sql(rw.sql).collect()
    assert {r["l_returnflag"] for r in rows} == {"A", "N", "R"}
    for r in rows:
        assert 1 <= float(r["med"]) <= 50


def test_weighted_designs_use_frequency_percentile(spark, engine):
    """Stratified/PPS quantiles rewrite to Spark's 3-arg PERCENTILE with
    the HT weight as an integral frequency — the weighted sample
    quantile. Verified numerically: a deliberately UNEQUAL-fraction
    stratified subset of lineitem (md5-threshold, deterministic) yields
    a weighted median close to the exact median, while the UNWEIGHTED
    median of the same biased subset is far off."""
    from approximate_query_engine_spark.catalog import SampleInfo, StratumInfo
    from approximate_query_engine_spark.rewriter import rewrite_stratified

    p = parse("SELECT MEDIAN(l_quantity) AS med FROM lineitem")
    si = SampleInfo(
        table_name="lineitem", sample_table="li_strat_q", sample_fraction=0.25,
        target_fraction=0.25, path="", strata_column="l_linestatus",
        allocation_type="proportional",
        strata=[
            StratumInfo(strata_value="F", pop_size=0, sample_size=0,
                        fraction=0.5, weight=2.0),
            StratumInfo(strata_value="O", pop_size=0, sample_size=0,
                        fraction=0.05, weight=20.0),
        ],
    )
    rw = rewrite_stratified(p, si)
    assert "PERCENTILE(l_quantity, 0.5, CAST(ROUND(1000000.0 /" in rw.sql
    # deterministic unequal-fraction subset: F kept at 50%, O at 5%
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW li_strat_q AS SELECT * FROM lineitem "
        "WHERE substring(md5(concat(CAST(l_orderkey AS STRING), ':', "
        "CAST(l_linenumber AS STRING))), 1, 8) < "
        "CASE WHEN l_linestatus = 'F' THEN '80000000' ELSE '0ccccccd' END"
    )
    exact = float(
        spark.sql("SELECT MEDIAN(l_quantity) AS m FROM lineitem").collect()[0]["m"]
    )
    weighted = float(spark.sql(rw.sql).collect()[0]["med"])
    assert abs(weighted - exact) <= 2.0  # l_quantity spans 1..50


def test_planner_samples_quantile_queries(engine):
    """A quantile-only query must get a sample plan (not the MIN/MAX
    exact-only gate), and the engine must execute it end to end."""
    out = engine.query(
        "SELECT MEDIAN(l_quantity) AS med FROM lineitem",
        max_rel_error=0.2,
    )
    assert out["status"] == "ok"
    assert out["plan"]["type"] == "sample"
    row = out["result"][0]
    assert row["med_ci_low"] <= row["med"] <= row["med_ci_high"]


def test_planner_exact_when_preferred(engine):
    out = engine.query(
        "SELECT PERCENTILE(l_quantity, 0.75) AS q3 FROM lineitem",
        prefer_exact=True,
    )
    assert out["status"] == "ok"
    assert out["plan"]["type"] == "exact"
    assert float(out["result"][0]["q3"]) == pytest.approx(38.0, abs=13.0)


def test_quantile_sketch_strategy(engine):
    """With a tight error budget the sampling error is infeasible but the
    approx_percentile rank band is not: the planner must pick the sketch
    path, and its CI columns must bracket the estimate."""
    out = engine.query(
        "SELECT MEDIAN(l_quantity) AS med FROM lineitem",
        max_rel_error=0.001,
    )
    assert out["status"] == "ok"
    assert out["plan"]["type"] == "sketch"
    row = out["result"][0]
    assert row["med_ci_low"] <= row["med"] <= row["med_ci_high"]
    # accuracy=10k on 6k rows: the summary is effectively exact
    assert float(row["med"]) == pytest.approx(25.0, abs=3.0)


def test_ml_path_handles_quantiles(engine):
    """use_ml_optimization must not crash on a quantile query: the
    reference-verbatim decision tree has no quantile branch (returns
    'exact' conservatively) and the planner realizes whatever it says."""
    out = engine.query(
        "SELECT MEDIAN(l_quantity) AS med FROM lineitem",
        max_rel_error=0.2,
        use_ml_optimization=True,
    )
    assert out["status"] == "ok"
    assert float(out["result"][0]["med"]) == pytest.approx(25.0, abs=5.0)


def test_exotic_percentile_forms_fall_back_to_exact(engine):
    """3-arg PERCENTILE (frequency) and array-of-levels forms are valid
    Spark SQL outside the approximable grammar: the planner must fall
    back to exact pass-through, never surface a parse error."""
    out = engine.query(
        "SELECT PERCENTILE(l_quantity, 0.5, 1) AS med FROM lineitem",
        max_rel_error=0.2,
    )
    assert out["status"] == "ok"
    assert out["plan"]["type"] == "exact"
    assert "not approximable" in out["plan"]["reason"]
    assert float(out["result"][0]["med"]) == pytest.approx(25.0, abs=3.0)


def test_having_quantile_weighted_form_in_weighted_designs():
    """A HAVING-only MEDIAN under per-row weights must take the
    weighted-frequency form like the select-list path (a raw MEDIAN over
    the biased sample would silently skew the group filter)."""
    from approximate_query_engine_spark.catalog import SampleInfo
    from approximate_query_engine_spark.rewriter import (
        rewrite_weighted_sample,
    )

    p = parse(
        "SELECT SUM(l_extendedprice) AS s FROM lineitem "
        "GROUP BY l_returnflag HAVING MEDIAN(l_quantity) > 5"
    )
    si = SampleInfo(
        table_name="lineitem", sample_table="s", sample_fraction=0.1,
        target_fraction=0.1, path="", variance_column="l_extendedprice",
        allocation_type="weighted",
    )
    rw = rewrite_weighted_sample(p, si)
    assert "HAVING (PERCENTILE(l_quantity, 0.5, CAST(ROUND(1000000.0 / __p) AS BIGINT))) > 5" in rw.sql


def test_quantile_ci_shares_one_percentile_buffer(engine, spark):
    """The estimate and both rank-band CI bounds must ride ONE
    array-percentile aggregate (Spark canonicalizes identical calls to a
    single value-count buffer). Three scalar PERCENTILE calls cost 2.3×
    more at the 30M-row big tier (measured 1.35 s vs 0.58 s on its 300k-row
    sample) for bit-identical output."""
    out = engine.query(
        "SELECT MEDIAN(l_quantity) AS med FROM lineitem",
        max_rel_error=0.2,
        explain=True,
    )
    sql = out["plan"]["sql"]
    assert "array(" in sql
    plan = spark.sql(sql)._jdf.queryExecution().executedPlan().toString()
    # one buffer = the same aggregate in partial + final stages; three
    # buffers would show six occurrences
    assert plan.lower().count("percentile(") == 2


def test_prebuilt_sample_preferred_over_inline_full_scan(spark):
    """With a pre-built sample at the same fraction, the planner must scan
    it (f·N rows) instead of re-sampling inline — the inline rand()
    predicate still reads every base row. Pricing both as f·N left the
    choice to tie-breaking and the r04 bench caught the full-scan inline
    plan winning on a quantile query (1.7× instead of ~5×)."""
    import tempfile

    from approximate_query_engine_spark import AQEngine

    eng = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_prefer_"),
        data_dir="/root/testdata/sf0.001",
    )
    eng.create_sample("orders", 0.05, seed=11)
    for sql in (
        "SELECT MEDIAN(o_totalprice) AS med FROM orders",
        "SELECT SUM(o_totalprice) AS s FROM orders",
    ):
        out = eng.query(sql, max_rel_error=0.2)
        assert out["status"] == "ok"
        assert out["plan"]["type"] == "sample"
        assert out["plan"].get("sample_table"), out["plan"]["reason"]
        assert "rand(" not in out["plan"]["sql"]


def test_sample_table_scan_prunes_to_needed_column(spark):
    """The quantile rewrite over a pre-built sample must reach the parquet
    scan with ONLY the aggregated column (ReadSchema pruning) — reading
    all 17 lineitem columns for a one-column percentile is the kind of
    plan that silently dies at 100 TB."""
    import re
    import tempfile

    from approximate_query_engine_spark import AQEngine

    eng = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_prune_"),
        data_dir="/root/testdata/sf0.001",
    )
    eng.create_sample("lineitem", 0.25, seed=13)
    p = eng.query(
        "SELECT MEDIAN(l_extendedprice) AS med FROM lineitem",
        max_rel_error=0.2,
        explain=True,
    )
    plan = spark.sql(p["plan"]["sql"])._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas == ["struct<l_extendedprice:double>"], schemas
