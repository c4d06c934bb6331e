"""Progressive (online) aggregation: early stopping, escalation, accuracy."""

import pytest

from approximate_query_engine_spark.progressive import progressive_query


def test_loose_target_stops_early(spark, engine, duck):
    r = progressive_query(
        spark, "SELECT COUNT(*) AS c FROM lineitem", target_rel_error=0.2
    )
    assert r["meta"]["stopped_early"]
    assert r["meta"]["fraction"] < 0.25
    true = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert r["result"][0]["c"] == pytest.approx(true, rel=0.5)


def test_tighter_target_uses_larger_fraction(spark, engine):
    loose = progressive_query(
        spark, "SELECT SUM(l_extendedprice) AS s FROM lineitem", target_rel_error=0.3
    )
    tight = progressive_query(
        spark, "SELECT SUM(l_extendedprice) AS s FROM lineitem", target_rel_error=0.02
    )
    assert tight["meta"]["fraction"] >= loose["meta"]["fraction"]
    assert len(tight["meta"]["steps"]) >= len(loose["meta"]["steps"])


def test_impossible_target_escalates_to_exact(spark, engine, duck):
    r = progressive_query(
        spark, "SELECT COUNT(*) AS c FROM lineitem", target_rel_error=1e-9
    )
    assert not r["meta"]["stopped_early"]
    assert r["meta"]["plan_type"] == "exact"
    true = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert r["result"][0]["c"] == true


def test_non_approximable_goes_exact(spark, engine):
    r = progressive_query(
        spark,
        "SELECT o_orderkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey LIMIT 5",
        target_rel_error=0.1,
    )
    assert r["meta"]["plan_type"] == "exact"
    assert len(r["result"]) == 5


def test_group_by_progressive_meets_target(spark, engine, duck):
    target = 0.15
    r = progressive_query(
        spark,
        "SELECT l_returnflag, SUM(l_quantity) AS sq FROM lineitem GROUP BY l_returnflag",
        target_rel_error=target,
    )
    truth = dict(
        duck.execute(
            "SELECT l_returnflag, SUM(l_quantity) FROM lineitem GROUP BY l_returnflag"
        ).fetchall()
    )
    # reported bound met -> actual error should be in the same ballpark
    for row in r["result"]:
        true = truth[row["l_returnflag"]]
        assert abs(row["sq"] - true) / true < 3 * target


def test_engine_facade(engine):
    r = engine.progressive_query("SELECT AVG(l_tax) AS t FROM lineitem", 0.2)
    assert r["status"] == "ok" and r["result"]


# ---- deterministic systematic mode (the oracle-checkable form) ----
def test_systematic_mode_is_deterministic_and_replayable(spark, engine, duck):
    """Two runs return identical results (no rand()), and every stopping
    quantity is replayable from the data: the final step's estimate equals
    k * |{rows: key % k = 0}| computed independently by DuckDB."""
    kwargs = dict(
        target_rel_error=0.1,
        mode="systematic",
        key_expr="l_orderkey * 31 + l_linenumber",
    )
    r1 = progressive_query(spark, "SELECT COUNT(*) AS c FROM lineitem", **kwargs)
    r2 = progressive_query(spark, "SELECT COUNT(*) AS c FROM lineitem", **kwargs)
    assert r1["result"] == r2["result"]

    def _no_ms(steps):
        return [{k: v for k, v in s.items() if k != "ms"} for s in steps]

    assert _no_ms(r1["meta"]["steps"]) == _no_ms(r2["meta"]["steps"])
    assert r1["meta"]["stopped_early"]
    k = round(1.0 / r1["meta"]["fraction"])
    n_k = duck.execute(
        f"SELECT COUNT(*) FROM lineitem WHERE (l_orderkey * 31 + l_linenumber) % {k} = 0"
    ).fetchone()[0]
    assert r1["result"][0]["c"] == round(n_k / r1["meta"]["fraction"])
    # support bookkeeping matches the replayed subset size
    assert r1["meta"]["steps"][-1]["min_support"] == n_k


def test_systematic_mode_requires_key(spark):
    with pytest.raises(ValueError, match="key_expr"):
        progressive_query(
            spark, "SELECT COUNT(*) AS c FROM lineitem", mode="systematic"
        )


def test_systematic_group_by_meets_target(spark, engine, duck):
    target = 0.2
    r = progressive_query(
        spark,
        "SELECT l_returnflag, SUM(l_quantity) AS sq FROM lineitem "
        "GROUP BY l_returnflag",
        target_rel_error=target,
        mode="systematic",
        key_expr="l_orderkey * 31 + l_linenumber",
    )
    truth = dict(
        duck.execute(
            "SELECT l_returnflag, SUM(l_quantity) FROM lineitem GROUP BY l_returnflag"
        ).fetchall()
    )
    for row in r["result"]:
        true = truth[row["l_returnflag"]]
        assert abs(row["sq"] - true) / true < 3 * target


def test_progressive_over_join(spark, engine):
    """Online aggregation refines inner star joins too: the ladder
    samples the fact side inside the join; deterministic systematic mode
    stops early with the target met."""
    out = engine.progressive_query(
        "SELECT o.o_orderstatus, COUNT(*) AS n FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY o.o_orderstatus",
        target_rel_error=0.2,
        mode="systematic",
        key_expr="l_orderkey * 31 + l_linenumber",
    )
    assert out["status"] == "ok"
    assert out["meta"]["plan_type"] == "progressive_sample"
    assert out["meta"]["stopped_early"]
    assert out["meta"]["fraction"] < 1.0
    exact = {
        r[0]: r["n"]
        for r in engine.spark.sql(
            "SELECT o.o_orderstatus, COUNT(*) AS n FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "GROUP BY o.o_orderstatus"
        ).collect()
    }
    for r in out["result"]:
        key = r.get("o_orderstatus") or list(r.values())[0]
        assert abs(r["n"] - exact[key]) / exact[key] < 0.3
