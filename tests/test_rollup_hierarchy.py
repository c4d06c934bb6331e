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


def test_routing_metamorphic_fuzz(heng):
    """Metamorphic property over the WHOLE routing stack (plain rewrite,
    hybrid, hierarchy, sketch state): for random bounds (aligned or not)
    and random aggregate shapes, the engine answer equals the raw Spark
    answer — whichever plan routing picked. Sketch-served aggregates are
    exact below their budgets at this scale, so equality is strict."""
    import random

    rng = random.Random(77)
    aggs = [
        ("COUNT(*) AS n", "COUNT(*) AS n"),
        ("SUM(value) AS sv", "SUM(value) AS sv"),
        ("MIN(value) AS mn", "MIN(value) AS mn"),
        ("MAX(value) AS mx", "MAX(value) AS mx"),
        ("COUNT(DISTINCT user_id) AS du", "COUNT(DISTINCT user_id) AS du"),
    ]
    for trial in range(18):
        lo_h = rng.randrange(0, 24 * 6)
        span_h = rng.randrange(1, 72)
        # mix of bucket-aligned and off-grid bounds
        lo_m = rng.choice([0, 0, 17])
        hi_m = rng.choice([0, 0, 43])
        lo = f"2024-01-{2 + lo_h // 24:02d} {lo_h % 24:02d}:{lo_m:02d}:00"
        hi_h = lo_h + span_h
        hi = f"2024-01-{2 + hi_h // 24:02d} {hi_h % 24:02d}:{hi_m:02d}:00"
        chosen = rng.sample(aggs, rng.randrange(1, 4))
        sel = ", ".join(c[0] for c in chosen)
        group = rng.choice(["", " GROUP BY event_type"])
        prefix = "event_type, " if group else ""
        order = " ORDER BY event_type" if group else ""
        sql = (
            f"SELECT {prefix}{sel} FROM events "
            f"WHERE ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}'"
            f"{group}{order}"
        )
        r = heng.query(sql, max_rel_error=0.05)
        assert r["status"] == "ok", (sql, r.get("error"))
        raw = [x.asDict() for x in heng.spark.sql(sql).collect()]
        got = r["result"]
        assert len(got) == len(raw), (sql, r["plan"]["reason"])
        for a, b in zip(got, raw):
            for k, v in b.items():
                g = a[k]
                if isinstance(v, float):
                    assert g == pytest.approx(v, rel=1e-9), (sql, k)
                else:
                    assert g == v, (sql, k, r["plan"]["reason"])


def test_hierarchical_refresh_uses_fine_state(spark):
    """After appending tail data: refreshing the hourly rollup (raw
    scan), then the daily one, derives the daily tail from HOURLY STATE
    (refreshed_from provenance), touches only the tail date dirs, and
    both serve the appended rows exactly."""
    import datetime
    import glob
    import os

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (base + datetime.timedelta(days=d, hours=h), "a", float(d * 10 + h))
        for d in range(5)
        for h in range(4)
    ]
    schema = "ts timestamp, event_type string, value double"
    spark.createDataFrame(rows, schema).createOrReplaceTempView("hier_src")
    e = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_hier_rf_"))
    e.catalog.upsert_table_stats("hier_src", len(rows))
    e.create_rollup(
        "hier_src", "ts", "1 hour", dims=["event_type"], measures=["value"]
    )
    r_day = e.create_rollup(
        "hier_src", "ts", "1 day", dims=["event_type"], measures=["value"]
    )
    assert r_day["derived_from"] == "hier_src__rollup_1_hour"
    day_path = next(
        i["path"]
        for i in e.catalog.rollups["hier_src"]
        if i["view"] == "hier_src__rollup_1_day"
    )

    def mtimes(day):
        return {
            p: os.path.getmtime(p)
            for p in glob.glob(f"{day_path}/p_date=2024-03-0{day}/*.parquet")
        }

    head_before = {d: mtimes(d) for d in (1, 2, 3)}
    late = [(datetime.datetime(2024, 3, 5, 1, 30), "a", 999.0)]
    spark.createDataFrame(rows + late, schema).createOrReplaceTempView(
        "hier_src"
    )
    e.catalog.upsert_table_stats("hier_src", len(rows) + 1)
    out_h = e.refresh_rollup("hier_src", view="hier_src__rollup_1_hour")
    assert out_h["refreshed_from"] is None  # hour refreshes from raw
    out_d = e.refresh_rollup("hier_src", view="hier_src__rollup_1_day")
    assert out_d["refreshed_from"] == "hier_src__rollup_1_hour"
    assert {d: mtimes(d) for d in (1, 2, 3)} == head_before
    r = e.query(
        "SELECT COUNT(*) AS n, SUM(value) AS sv FROM hier_src "
        "WHERE ts >= TIMESTAMP '2024-03-01 00:00:00' "
        "AND ts < TIMESTAMP '2024-03-06 00:00:00'"
    )
    assert "rollup" in r["plan"]["reason"]
    assert r["result"][0]["n"] == len(rows) + 1
    raw = spark.sql("SELECT SUM(value) AS sv FROM hier_src").collect()[0]
    assert r["result"][0]["sv"] == raw["sv"]


def test_join_routing_metamorphic_fuzz(heng, spark):
    """Same metamorphic property for the STAR-JOIN grammar: random
    aggregate subsets, time bounds, dim-side filters, and HAVING clauses
    over fact ⋈ dim must answer identically through the engine (whether
    the join routes to the rollup or runs raw) and through Spark SQL."""
    import random

    spark.createDataFrame(
        [("click", "c", 1), ("view", "v", 1), ("purchase", "p", 2),
         ("signup", "s", 2), ("error", "e", 3)],
        "event_type string, label string, tier int",
    ).createOrReplaceTempView("fuzz_dim")
    heng.catalog.upsert_table_stats("fuzz_dim", 5)
    rng = random.Random(41)
    aggs = [
        "COUNT(*) AS n",
        "SUM(e.value) AS sv",
        "MIN(e.value) AS mn",
        "AVG(e.value) AS av",
        "COUNT(DISTINCT e.user_id) AS du",
    ]
    for trial in range(12):
        lo_d = rng.randrange(2, 6)
        hi_d = lo_d + rng.randrange(1, 4)
        chosen = rng.sample(aggs, rng.randrange(1, 4))
        sel = ", ".join(chosen)
        dimf = rng.choice(["", " AND d.tier <= 2", " AND d.label <> 'v'"])
        having = (
            " HAVING COUNT(*) > 3"
            if rng.random() < 0.3 and "COUNT(*) AS n" in chosen
            else ""
        )
        sql = (
            f"SELECT d.label AS label, {sel} "
            f"FROM events e JOIN fuzz_dim d ON e.event_type = d.event_type "
            f"WHERE e.ts >= TIMESTAMP '2024-01-{lo_d:02d} 00:00:00' "
            f"AND e.ts < TIMESTAMP '2024-01-{hi_d:02d} 00:00:00'{dimf} "
            f"GROUP BY d.label{having} ORDER BY label"
        )
        r = heng.query(sql, max_rel_error=0.05)
        assert r["status"] == "ok", (sql, r.get("error"))
        raw = [x.asDict() for x in heng.spark.sql(sql).collect()]
        got = r["result"]
        assert len(got) == len(raw), (sql, r["plan"]["reason"])
        for a, b in zip(got, raw):
            for k, v in b.items():
                if isinstance(v, float):
                    assert a[k] == pytest.approx(v, rel=1e-9), (sql, k)
                else:
                    assert a[k] == v, (sql, k, r["plan"]["reason"])
