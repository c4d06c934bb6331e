"""Sampler tests: allocation math (reference sampler.py:194-225 semantics),
achieved-fraction bookkeeping, and sampleBy-based stratification."""

import pytest

from approximate_query_engine_spark.sampler import Sampler, _fraction_tag


def test_fraction_tag():
    assert _fraction_tag(0.01) == "0_01"
    assert _fraction_tag(0.1) == "0_1"
    assert _fraction_tag(0.25) == "0_25"


def test_proportional_allocation():
    strata = [
        {"strata_value": "A", "pop_size": 100, "variance": 4.0},
        {"strata_value": "B", "pop_size": 300, "variance": 1.0},
    ]
    f = Sampler.proportional_allocation(strata, 0.1)
    assert f == {"A": 0.1, "B": 0.1}


def test_neyman_allocation_weights_by_sigma():
    strata = [
        {"strata_value": "A", "pop_size": 100, "variance": 100.0},  # sigma 10
        {"strata_value": "B", "pop_size": 100, "variance": 1.0},  # sigma 1
    ]
    f = Sampler.neyman_allocation(strata, 0.1)
    # target n = 20; weights 1000 vs 100 -> n_A ≈ 18.2, n_B ≈ 1.8
    assert f["A"] > f["B"]
    assert f["A"] == pytest.approx(20 * (1000 / 1100) / 100)
    assert f["B"] == pytest.approx(20 * (100 / 1100) / 100)


def test_neyman_caps_fraction_at_one():
    strata = [
        {"strata_value": "A", "pop_size": 2, "variance": 10000.0},
        {"strata_value": "B", "pop_size": 1000, "variance": 0.0001},
    ]
    f = Sampler.neyman_allocation(strata, 0.5)
    assert f["A"] == 1.0


def test_neyman_zero_variance_falls_back_to_proportional():
    strata = [
        {"strata_value": "A", "pop_size": 100, "variance": 0.0},
        {"strata_value": "B", "pop_size": 100, "variance": None},
    ]
    f = Sampler.neyman_allocation(strata, 0.2)
    assert f == {"A": 0.2, "B": 0.2}


def test_uniform_sample_registered(engine):
    info = engine.sampler.create_uniform_sample("orders", 0.2, seed=11)
    assert info.sample_table == "orders__sample_0_2"
    # achieved fraction recorded, near target
    assert 0.1 < info.sample_fraction < 0.3
    assert engine.catalog.get_sample("orders__sample_0_2") is not None
    # the view is queryable
    n = engine.spark.table("orders__sample_0_2").count()
    assert n == info.row_count


def test_stratified_sample_achieved_fractions(engine):
    info = engine.sampler.create_stratified_sample(
        "orders", "o_orderstatus", 0.25, variance_col="o_totalprice", seed=3
    )
    assert info.allocation_type == "neyman"
    assert info.strata, "strata info must be recorded"
    for s in info.strata:
        # achieved fraction consistent with sizes
        if s.pop_size:
            assert s.fraction == pytest.approx(s.sample_size / s.pop_size)
    total = sum(s.pop_size for s in info.strata)
    assert total == engine.catalog.get_row_count("orders")


def test_refresh_sample_keeps_settings(engine):
    info = engine.sampler.create_stratified_sample(
        "orders", "o_orderstatus", 0.3, variance_col="o_totalprice", seed=5
    )
    refreshed = engine.sampler.refresh_sample(info.sample_table)
    assert refreshed.sample_table == info.sample_table
    assert refreshed.strata_column == "o_orderstatus"
    assert refreshed.allocation_type == "neyman"
    assert refreshed.variance_column == "o_totalprice"
    assert refreshed.seed == 5
    import pytest as _pt

    with _pt.raises(ValueError):
        engine.sampler.refresh_sample("nope__sample")


def test_multi_column_stratified_sample(engine, spark):
    info = engine.sampler.create_stratified_sample(
        "lineitem", ["l_returnflag", "l_linestatus"], 0.2, seed=6
    )
    assert info.strata_source_cols == ["l_returnflag", "l_linestatus"]
    assert "concat_ws" in info.strata_column
    # one stratum per observed (flag, status) combination
    combos = spark.sql(
        "SELECT COUNT(DISTINCT l_returnflag, l_linestatus) c FROM lineitem"
    ).collect()[0]["c"]
    assert len(info.strata) == combos
    # HT-weighted count over the composite strata recovers the table size
    from approximate_query_engine_spark.rewriter import rewrite_stratified
    from approximate_query_engine_spark.sqlparser import parse

    rw = rewrite_stratified(parse("SELECT COUNT(*) AS c FROM lineitem"), info)
    est = spark.sql(rw.sql).collect()[0]["c"]
    true = spark.table("lineitem").count()
    assert abs(est - true) / true < 0.1
    # planner matches when BOTH columns are grouped, not when one is
    both = engine.planner.candidates(
        parse(
            "SELECT l_returnflag, l_linestatus, COUNT(*) AS c FROM lineitem "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        6000, 0.1,
    )
    assert any(
        c.strategy == "stratified"
        and (c.sample.strata_source_cols or []) == ["l_returnflag", "l_linestatus"]
        for c in both
    )
    cands = engine.planner.candidates(
        parse("SELECT l_returnflag, COUNT(*) AS c FROM lineitem GROUP BY l_returnflag"),
        6000, 0.1,
    )
    strat_cands = [c for c in cands if c.strategy == "stratified"
                   and (c.sample.strata_source_cols or []) == ["l_returnflag", "l_linestatus"]]
    assert strat_cands == []  # single-col grouping can't use the 2-col strata
    # alias-qualified grouping still matches (unqualified comparison)
    aliased = engine.planner.candidates(
        parse(
            "SELECT l.l_returnflag, l.l_linestatus, COUNT(*) AS c FROM lineitem l "
            "GROUP BY l.l_returnflag, l.l_linestatus"
        ),
        6000, 0.1,
    )
    assert any(c.strategy == "stratified" for c in aliased)


def test_non_identifier_column_name_strata(engine, spark):
    """A column named like an expression ('seg-x') must stratify as a NAME,
    not parse as arithmetic, and produce a valid sanitized view name."""
    df = spark.createDataFrame(
        [(i, str(i % 3), 1.0) for i in range(3000)], ["id", "seg", "v"]
    ).withColumnRenamed("seg", "seg-x")
    engine.register_view("weirdcol", df)
    info = engine.sampler.create_stratified_sample("weirdcol", "seg-x", 0.3, seed=2)
    assert len(info.strata) == 3
    assert info.sample_table == "weirdcol__strat_sample_seg_x_0_3"
    assert engine.spark.table(info.sample_table).count() == info.row_count


def test_strata_analysis_single_pass(engine):
    strata = engine.sampler.analyze_strata("orders", "o_orderstatus", "o_totalprice")
    assert {s["strata_value"] for s in strata} <= {"F", "O", "P"}
    for s in strata:
        assert s["pop_size"] > 0
        assert s["variance"] is None or s["variance"] >= 0


# ---- systematic (deterministic key % k) rewrite ----
def test_systematic_rewrite_estimates_and_determinism(spark, engine, duck):
    """rewrite_systematic_sample scales by exactly k over the key%k subset
    and is engine-reproducible: DuckDB computes the identical estimate."""
    from approximate_query_engine_spark.rewriter import rewrite_systematic_sample
    from approximate_query_engine_spark.sqlparser import parse

    rw = rewrite_systematic_sample(
        parse("SELECT COUNT(*) AS c FROM lineitem"),
        16,
        "l_orderkey * 31 + l_linenumber",
    )
    assert rw.plan_type == "sample" and rw.sample_fraction == 1.0 / 16
    got = spark.sql(rw.sql).collect()[0]["c"]
    want = duck.execute(
        "SELECT COUNT(*) * 16 FROM lineitem "
        "WHERE (l_orderkey * 31 + l_linenumber) % 16 = 0"
    ).fetchone()[0]
    assert got == want
    # CI companions present and sane
    row = spark.sql(rw.sql).collect()[0].asDict()
    assert row["c_ci_low"] <= got <= row["c_ci_high"]
    assert 0 < row["c_rel_error"] < 1


def test_systematic_rewrite_rejects_bad_k():
    import pytest as _pytest

    from approximate_query_engine_spark.rewriter import (
        UnsupportedRewriteError,
        rewrite_systematic_sample,
    )
    from approximate_query_engine_spark.sqlparser import parse

    with _pytest.raises(UnsupportedRewriteError):
        rewrite_systematic_sample(
            parse("SELECT COUNT(*) AS c FROM lineitem"), 0, "l_orderkey"
        )
