"""Sketch tests: pure-Python HLL/CMS algebra + Spark-native sketch
construction/read paths (the reference never reads its persisted
sketches — SURVEY.md vestigial flag #1; these prove ours round-trip)."""

import pytest

from approximate_query_engine_spark.sketches import CountMinSketch, HyperLogLog


def test_hll_estimates_within_bound():
    hll = HyperLogLog(b=12)
    n = 50_000
    for i in range(n):
        hll.add_string(f"user-{i}")
    est = hll.count()
    se = hll.standard_error()
    assert abs(est - n) / n < 4 * se  # 1.04/sqrt(4096) ≈ 1.6%


def test_hll_merge_equals_union():
    a, b = HyperLogLog(b=10), HyperLogLog(b=10)
    for i in range(10_000):
        a.add_string(f"x{i}")
    for i in range(5_000, 15_000):
        b.add_string(f"x{i}")
    a.merge(b)
    est = a.count()
    assert abs(est - 15_000) / 15_000 < 0.1


def test_hll_serialize_roundtrip():
    hll = HyperLogLog(b=8)
    for i in range(1000):
        hll.add_string(str(i))
    data = hll.serialize()
    back = HyperLogLog.deserialize(data)
    assert back.count() == hll.count()
    assert back.b == 8


def test_hll_confidence_interval_contains_estimate():
    hll = HyperLogLog(b=12)
    for i in range(20_000):
        hll.add_string(str(i))
    lo, hi = hll.confidence_interval(0.95)
    assert lo <= hll.count() <= hi


def test_hll_precision_bounds():
    with pytest.raises(ValueError):
        HyperLogLog(b=3)
    with pytest.raises(ValueError):
        HyperLogLog(b=17)


def test_cms_point_estimate_overcounts_only():
    cms = CountMinSketch(epsilon=0.001, delta=0.01)
    truth = {"a": 1000, "b": 500, "c": 1}
    for k, v in truth.items():
        cms.add(k, v)
    for k, v in truth.items():
        est = cms.estimate(k)
        assert est >= v  # CMS never undercounts
        assert est <= v + cms.error_bound()


def test_cms_merge_and_serialize():
    a = CountMinSketch(0.01, 0.05)
    b = CountMinSketch(0.01, 0.05)
    a.add("k", 10)
    b.add("k", 5)
    a.merge(b)
    assert a.estimate("k") >= 15
    back = CountMinSketch.deserialize(a.serialize())
    assert back.estimate("k") == a.estimate("k")
    assert back.total == a.total


def test_spark_hll_sketch_build_and_estimate(engine):
    engine.create_sketch("orders", "o_custkey", "hll", {"lg_config_k": 12})
    est = engine.sketches.estimate_distinct_from_sketch("orders", "o_custkey")
    true = engine.spark.sql(
        "SELECT COUNT(DISTINCT o_custkey) AS c FROM orders"
    ).collect()[0]["c"]
    assert est is not None
    assert abs(est - true) / true < 0.05


def test_spark_cms_build_persists_and_estimates(engine):
    out = engine.create_sketch("orders", "o_orderstatus", "cms", {"epsilon": 0.01})
    assert out["size_bytes"] > 0
    sketches = engine.list_sketches("orders")
    types = {s["sketch_type"] for s in sketches}
    assert "cms" in types and "hll" in types
    true = {
        r["o_orderstatus"]: r["c"]
        for r in engine.spark.sql(
            "SELECT o_orderstatus, COUNT(*) AS c FROM orders GROUP BY o_orderstatus"
        ).collect()
    }
    for k, v in true.items():
        est = engine.sketches.estimate_frequency_from_sketch("orders", "o_orderstatus", k)
        assert est is not None and est >= v  # CMS never undercounts
        assert est <= v * 1.1 + 0.01 * 1500  # eps * total slack


def test_distributed_hll_build_equals_sequential(spark):
    """mapInPandas partial sketches merged on the driver must equal a
    single sequential build over the same value set — the mergeability
    property the distributed path rests on (and the driver contract's q54
    depends on for determinism across partitionings)."""
    from pyspark.sql import functions as F

    from approximate_query_engine_spark.sketches import build_hll_distributed

    df = spark.range(0, 5000).select(
        (F.col("id") % 1200).cast("string").alias("v")
    )
    # distributed, multiple partitions
    h_dist = build_hll_distributed(df.repartition(8), "v", b=10)
    # sequential reference over the same values
    h_seq = HyperLogLog(10)
    for i in range(5000):
        h_seq.add_string(str(i % 1200))
    assert (h_dist.registers == h_seq.registers).all()
    assert h_dist.count() == h_seq.count()


def test_distributed_hll_skips_nulls(spark):
    from pyspark.sql import functions as F

    from approximate_query_engine_spark.sketches import build_hll_distributed

    df = spark.range(0, 100).select(
        F.when(F.col("id") % 2 == 0, F.col("id").cast("string")).alias("v")
    )
    h = build_hll_distributed(df, "v", b=10)
    h_ref = HyperLogLog(10)
    for i in range(0, 100, 2):
        h_ref.add_string(str(i))
    assert (h.registers == h_ref.registers).all()


def test_topk_sketch_build_and_read(engine):
    """Top-k heavy hitters: the persisted sketch's items/counts must equal
    the exact GROUP BY counts whenever ndv fits max_items_tracked (here
    o_orderstatus ndv=3), and the read path must not rescan the table."""
    engine.create_sketch(
        "orders", "o_orderstatus", "topk", {"k": 3, "max_items_tracked": 1000}
    )
    items = engine.sketches.topk_from_sketch("orders", "o_orderstatus")
    exact = {
        r["i"]: r["c"]
        for r in engine.spark.sql(
            "SELECT o_orderstatus AS i, COUNT(*) AS c FROM orders "
            "WHERE o_orderstatus IS NOT NULL GROUP BY 1"
        ).collect()
    }
    assert {d["item"]: d["count"] for d in items} == exact
    # stored sorted by descending count; k trims but cannot deepen
    counts = [d["count"] for d in items]
    assert counts == sorted(counts, reverse=True)
    assert engine.sketches.topk_from_sketch("orders", "o_orderstatus", k=1) == items[:1]


def test_topk_sketch_missing_returns_none(engine):
    assert engine.sketches.topk_from_sketch("orders", "o_totalprice") is None


def test_unknown_sketch_type_lists_topk(engine):
    import pytest as _pytest

    with _pytest.raises(Exception, match="hll|cms|theta|topk"):
        engine.sketches.create("orders", "o_custkey", "nope", {})


def test_grouped_top_k_matches_exact(spark, engine):
    """grouped_top_k equals the exact per-group (count DESC, item ASC)
    ranking when the candidate set covers the column's ndv — boundary
    ties resolve by the explicit ordering, not sketch internals."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from approximate_query_engine_spark.sketches import grouped_top_k

    docs = spark.table("documents")
    got = [
        (r["lang"], r["item"], r["cnt"], r["rank"])
        for r in grouped_top_k(
            docs, "lang", "source", k=3, candidate_k=1000
        ).collect()
    ]
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("item"))
    want = [
        (r["lang"], r["item"], r["cnt"], r["rank"])
        for r in (
            docs.where(F.col("source").isNotNull())
            .groupBy("lang", F.col("source").cast("string").alias("item"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 3)
            .orderBy("lang", "rank")
            .collect()
        )
    ]
    assert got == want and len(got) >= 9


def test_grouped_topk_bounds_over_budget(spark, engine):
    """with_bounds=True in the OVER-BUDGET regime (ndv >> tracked
    budget): every returned item's true count lies inside
    [cnt_lb, cnt_ub] (DataSketches frequent-items a-priori bound
    3.5·n/m), guaranteed_rank items are provably in the true top-k, and
    in the UNDER-budget regime cnt_err collapses to 0 with exact
    counts."""
    import collections

    from pyspark.sql import functions as F

    from approximate_query_engine_spark.sketches import grouped_top_k

    df = spark.table("lineitem").selectExpr(
        "l_returnflag AS grp",
        "CAST(FLOOR(100000 / (1 + (CONV(SUBSTRING(md5(CONCAT("
        "CAST(l_orderkey AS STRING), ':', CAST(l_linenumber AS STRING)"
        ")), 1, 8), 16, 10) % 100000))) AS BIGINT) AS itm",
    )
    rows = grouped_top_k(
        df, "grp", "itm", k=3, max_items_tracked=64, with_bounds=True
    ).collect()
    assert len(rows) == 9  # 3 groups x k=3
    exact = {
        (r["grp"], str(r["itm"])): r["cnt"]
        for r in df.groupBy("grp", "itm").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    per = collections.defaultdict(list)
    for (g, i), c in exact.items():
        per[g].append((c, i))
    true_top = {
        g: {i for c, i in sorted(v, key=lambda t: (-t[0], t[1]))[:3]}
        for g, v in per.items()
    }
    for r in rows:
        true_cnt = exact[(r["grp"], r["item"])]
        assert r["cnt_err"] > 0  # over-budget: bounds are non-trivial
        assert r["cnt_lb"] <= true_cnt <= r["cnt_ub"], r
        if r["guaranteed_rank"]:
            assert r["item"] in true_top[r["grp"]], r
    # the heavy head (~50% of mass) must be PROVABLY rank 1
    assert all(r["guaranteed_rank"] for r in rows if r["rank"] == 1)
    # under-budget regime: ndv(l_linestatus)=2 << 64 -> exact, err 0
    exact_rows = grouped_top_k(
        spark.table("lineitem"),
        "l_returnflag",
        "l_linestatus",
        k=2,
        max_items_tracked=64,
        with_bounds=True,
    ).collect()
    truth2 = {
        (r["l_returnflag"], r["l_linestatus"]): r["c"]
        for r in spark.sql(
            "SELECT l_returnflag, l_linestatus, COUNT(*) AS c "
            "FROM lineitem GROUP BY 1, 2"
        ).collect()
    }
    for r in exact_rows:
        assert r["cnt_err"] == 0
        assert r["cnt_lb"] == r["cnt"] == r["cnt_ub"]
        assert r["cnt"] == truth2[(r["l_returnflag"], r["item"])]
    # with_bounds=False keeps the original 5-column schema (q87 contract)
    plain = grouped_top_k(
        spark.table("lineitem"), "l_returnflag", "l_linestatus", k=2
    )
    assert plain.columns == ["l_returnflag", "item", "cnt", "rank"]


def test_topk_sketch_read_path_bounds(spark, engine):
    """The persisted single-column top-k sketch serves the same
    deterministic bounds as grouped_top_k WITHOUT a rescan: build-time
    n/ndv ride in the sketch parameters; exact regime collapses to
    err 0, and bounds contain the exact counts."""
    eng = engine
    eng.create_sketch("orders", "o_orderstatus", "topk", {"k": 3})
    rows = eng.sketches.topk_from_sketch(
        "orders", "o_orderstatus", with_bounds=True
    )
    truth = {
        r["o_orderstatus"]: r["c"]
        for r in spark.sql(
            "SELECT o_orderstatus, COUNT(*) AS c FROM orders GROUP BY 1"
        ).collect()
    }
    assert rows
    for d in rows:
        assert d["count_err"] == 0  # ndv=3 << tracked budget
        assert d["count_lb"] == d["count"] == d["count_ub"]
        assert d["count"] == truth[d["item"]]
    # over-budget: tiny tracked budget on a wider column
    eng.create_sketch(
        "orders", "o_custkey", "topk", {"k": 3, "max_items_tracked": 8}
    )
    bounded = eng.sketches.topk_from_sketch(
        "orders", "o_custkey", with_bounds=True
    )
    exact = {
        str(r["o_custkey"]): r["c"]
        for r in spark.sql(
            "SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY 1"
        ).collect()
    }
    for d in bounded or []:
        assert d["count_err"] > 0
        assert d["count_lb"] <= exact[d["item"]] <= d["count_ub"]
    # without the flag the legacy shape is unchanged
    legacy = eng.sketches.topk_from_sketch("orders", "o_orderstatus")
    assert legacy and set(legacy[0]) == {"item", "count"}
