"""Hierarchical rollups (late round 7): a coarser rollup derives from a
finer one's STATE (counts add, min/max combine, HLL/theta union, KLL
merges, top-k combines) — create_rollup(derive=True) re-aggregates the
registered fine rollup instead of re-scanning the fact table. At 100 TB
the day-from-hour build costs a state scan (~1/compression of the fact
scan); this is how a grain hierarchy stays maintainable."""

import tempfile

import pytest

from approximate_query_engine_spark import AQEngine
from approximate_query_engine_spark.operators.rollup import (
    RollupSpec,
    can_derive_rollup,
)


@pytest.fixture(scope="module")
def heng(spark):
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_rollup_hier_"),
        data_dir="/root/testdata/sf0.001",
    )
    e.create_rollup(
        "events",
        "ts",
        "1 hour",
        dims=["event_type"],
        measures=["value"],
        distinct_cols=["user_id"],
        quantile_cols=["value"],
        kll_k=800,
        theta_cols=["user_id"],
    )
    return e


def test_daily_derives_from_hourly_and_answers_exactly(heng, duck):
    r = heng.create_rollup(
        "events",
        "ts",
        "1 day",
        dims=["event_type"],
        measures=["value"],
        distinct_cols=["user_id"],
        quantile_cols=["value"],
        kll_k=800,
    )
    assert r["derived_from"] == "events__rollup_1_hour"
    q = (
        "SELECT event_type, COUNT(*) AS n, SUM(value) AS sv, "
        "MEDIAN(value) AS med, COUNT(DISTINCT user_id) AS du "
        "FROM events WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00' "
        "GROUP BY event_type ORDER BY event_type"
    )
    res = heng.query(q, max_rel_error=0.05)
    assert res["status"] == "ok", res.get("error")
    # coarsest-capable wins: the derived DAY rollup serves the query
    assert "events__rollup_1_day" in res["plan"]["reason"]
    want = duck.execute(
        "SELECT event_type, COUNT(*), SUM(value), "
        "quantile_disc(value, 0.5), COUNT(DISTINCT user_id) FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00' "
        "GROUP BY event_type ORDER BY event_type"
    ).fetchall()
    got = [
        (d["event_type"], d["n"], d["sv"], d["med"], d["du"])
        for d in res["result"]
    ]
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        assert g[2] == pytest.approx(w[2], rel=1e-12)
        assert g[3] == w[3]  # KLL exact below compaction
        assert g[4] == w[4]  # HLL exact at this cardinality


def test_derive_declines_on_mismatched_state(heng):
    # requesting state the fine rollup lacks → raw build, not derivation
    r = heng.create_rollup(
        "events",
        "ts",
        "2 days",
        dims=["event_type"],
        measures=["value"],
        topk_cols=["user_id"],  # hourly rollup has no top-k state
    )
    assert r["derived_from"] is None


def test_can_derive_rules():
    fine = RollupSpec(
        "t", "ts", "1 hour", ["a", "b"], ["v"],
        distinct_cols=["u"], quantile_cols=["v"], kll_k=800,
    )
    ok = RollupSpec(
        "t", "ts", "1 day", ["a"], ["v"],
        distinct_cols=["u"], quantile_cols=["v"], kll_k=800,
    )
    assert can_derive_rollup(fine, ok) is None
    assert "multiple" in can_derive_rollup(
        fine, RollupSpec("t", "ts", "90 minutes", ["a"], ["v"])
    )
    assert "dims" in can_derive_rollup(
        fine, RollupSpec("t", "ts", "1 day", ["c"], ["v"])
    )
    assert "measures" in can_derive_rollup(
        fine, RollupSpec("t", "ts", "1 day", ["a"], ["w"])
    )
    assert "kll_k" in can_derive_rollup(
        fine,
        RollupSpec(
            "t", "ts", "1 day", ["a"], ["v"],
            quantile_cols=["v"], kll_k=200,
        ),
    )
