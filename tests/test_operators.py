"""Relational-extension operators: as-of join, bucketed co-located join,
skew-salted join."""

import pytest
from pyspark.sql import functions as F

from approximate_query_engine_spark.operators import (
    asof_join,
    bucketize,
    cocolocated_join,
    salted_join,
)
from approximate_query_engine_spark.operators.bucketing import exchange_count


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            ("A", 1, 10.0),
            ("A", 5, 11.0),
            ("A", 9, 12.0),
            ("B", 2, 20.0),
            ("B", 8, 21.0),
        ],
        "sym string, t long, quote double",
    )
    trades = spark.createDataFrame(
        [
            ("A", 1, 100),   # exact match -> quote at t=1
            ("A", 4, 200),   # -> t=1
            ("A", 6, 300),   # -> t=5
            ("A", 12, 400),  # -> t=9
            ("B", 1, 500),   # no prior quote -> null
            ("B", 9, 600),   # -> t=8
            ("C", 3, 700),   # no quotes for C -> null
        ],
        "sym string, t long, size long",
    )
    return quotes, trades


EXPECTED = {
    ("A", 1): 10.0,
    ("A", 4): 10.0,
    ("A", 6): 11.0,
    ("A", 12): 12.0,
    ("B", 1): None,
    ("B", 9): 21.0,
    ("C", 3): None,
}


def test_asof_join_union_strategy(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="t", by="sym", right_prefix="q_")
    got = {(r["sym"], r["t"]): r["q_quote"] for r in out.collect()}
    assert got == EXPECTED
    assert out.count() == trades.count()  # every left row kept exactly once


def test_asof_join_pandas_strategy(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="t", by="sym", right_prefix="q_", strategy="pandas")
    got = {(r["sym"], r["t"]): r["q_quote"] for r in out.collect()}
    assert got == EXPECTED


def test_asof_join_tolerance_requires_pandas(quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="t", by="sym", tolerance=3)


def test_asof_join_pandas_tolerance(quotes_trades):
    """pandas merge_asof tolerance semantics: a match further back than
    `tolerance` becomes NULL instead of filling forward."""
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on="t", by="sym", right_prefix="q_",
        strategy="pandas", tolerance=3,
    )
    got = {(r["sym"], r["t"]): r["q_quote"] for r in out.collect()}
    expected = dict(EXPECTED)
    expected[("A", 12)] = 12.0   # t=12 vs quote t=9: gap 3 ≤ tolerance
    expected[("A", 6)] = 11.0    # gap 1
    expected[("A", 4)] = 10.0    # gap 3 ≤ tolerance: kept
    got_t1 = got[("A", 1)]
    assert got_t1 == 10.0        # exact match always survives
    assert got == expected
    # tighter tolerance drops the gap-3 matches
    out2 = asof_join(
        trades, quotes, on="t", by="sym", right_prefix="q_",
        strategy="pandas", tolerance=2,
    )
    got2 = {(r["sym"], r["t"]): r["q_quote"] for r in out2.collect()}
    assert got2[("A", 4)] is None and got2[("A", 12)] is None
    assert got2[("A", 6)] == 11.0


def test_bucketed_join_eliminates_exchange(spark, engine):
    li = spark.table("lineitem").select("l_orderkey", "l_extendedprice")
    od = spark.table("orders").select("o_orderkey", "o_orderpriority").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    bucketize(li, "b_lineitem", "l_orderkey", num_buckets=4)
    bucketize(od, "b_orders", "l_orderkey", num_buckets=4)
    joined = cocolocated_join(spark, "b_lineitem", "b_orders", on="l_orderkey")
    n_exchanges = exchange_count(joined)
    assert n_exchanges == 0, f"bucketed join still shuffles ({n_exchanges} exchanges)"
    # and it computes the same thing as the plain join
    plain = li.join(od, "l_orderkey").count()
    assert joined.count() == plain


def test_partition_pruning_measured(spark, engine, tmp_path):
    """partition_by_time writes month directories; a WHERE on the
    partition column then reads FEWER FILES AND PARTITIONS — measured
    from the executed plan's scan metrics, not just asserted from plan
    text (though the PartitionFilters clause is checked too)."""
    from pyspark.sql import functions as F

    from approximate_query_engine_spark.operators.partitioning import (
        partition_by_time,
        partition_filters,
        read_partitioned,
        scan_metrics,
    )

    path = str(tmp_path / "events_by_day")
    # the sf0.001 window is one month of data -> day grain (30 partitions)
    partition_by_time(spark.table("events"), path, "ts", grain="day")
    part = read_partitioned(spark, path)
    months = [r[0] for r in part.select("p_bucket").distinct().collect()]
    assert len(months) >= 3, "premise: need several day partitions"

    full = scan_metrics(part.groupBy().agg(F.count("*").alias("n")))
    one = part.filter(F.col("p_bucket") == min(months))
    pruned = scan_metrics(one.groupBy().agg(F.count("*").alias("n")))
    assert pruned["partitions_read"] >= 1
    assert pruned["partitions_read"] < full["partitions_read"]
    assert 0 < pruned["files_read"] < full["files_read"]
    # plan-text evidence: the predicate landed in PartitionFilters
    # (pruned at file listing), not in the post-scan data filters
    assert "p_bucket" in partition_filters(one)
    # and the pruned read computes the right answer
    truth = (
        spark.table("events")
        .filter(F.date_format("ts", "yyyy-MM-dd") == min(months))
        .count()
    )
    assert one.count() == truth


def test_derive_bucket_predicate_grains():
    """Pure-function contract of the routing conjunct: per-grain prefix,
    conservative superset bounds, BETWEEN desugar, and the refusal cases
    (OR could reach other partitions; NOT inverts semantics; parens may
    hold a subquery over another table)."""
    from approximate_query_engine_spark.operators.partitioning import (
        derive_bucket_predicate as d,
    )

    w = "ts >= TIMESTAMP '2024-03-15 12:30:00' AND x = 1"
    assert d(w, "ts", "day") == "p_bucket >= '2024-03-15'"
    assert d(w, "ts", "month") == "p_bucket >= '2024-03'"
    assert d(w, "ts", "year") == "p_bucket >= '2024'"
    # strict ops keep inclusive bucket bounds (superset is correct;
    # the original WHERE still filters rows)
    assert d("ts < DATE '2024-03-15'", "ts", "day") == (
        "p_bucket <= '2024-03-15'"
    )
    assert d("ts = DATE '2024-03-15'", "ts", "day") == (
        "p_bucket = '2024-03-15'"
    )
    between = "ts BETWEEN DATE '2024-01-02' AND DATE '2024-02-03'"
    assert d(between, "ts", "month") == (
        "p_bucket >= '2024-01' AND p_bucket <= '2024-02'"
    )
    assert d("ts >= DATE '2024-01-02' OR x = 1", "ts", "day") is None
    assert d("NOT ts >= DATE '2024-01-02'", "ts", "day") is None
    assert (
        d("x IN (SELECT x FROM t WHERE ts >= DATE '2024-01-02')", "ts", "day")
        is None
    )
    assert d("x = 1", "ts", "day") is None


def test_partition_layout_tail_refresh(spark, tmp_path):
    """Append-mostly refresh: new rows in a new day plus a late row in
    the last existing day rewrite ONLY those tail directories (dynamic
    partition overwrite) — earlier days keep their exact file paths and
    mtimes — and the refreshed layout reflects every new row."""
    import datetime
    import glob
    import os

    from pyspark.sql import functions as F

    from approximate_query_engine_spark.operators.partitioning import (
        partition_by_time,
        read_partitioned,
        refresh_partition_layout,
    )

    base = datetime.datetime(2024, 5, 1)
    schema = "ts timestamp, v double"
    rows = [
        (base + datetime.timedelta(days=d, hours=h), float(d))
        for d in range(4)
        for h in range(3)
    ]
    path = str(tmp_path / "tail")
    partition_by_time(
        spark.createDataFrame(rows, schema), path, "ts", grain="day"
    )

    def day_files(day):
        return {
            p: os.path.getmtime(p)
            for p in glob.glob(f"{path}/p_bucket=2024-05-0{day}/*.parquet")
        }

    before = {d: day_files(d) for d in (1, 2, 3)}
    # a late row in the last day (04) and a brand-new day (05)
    new_rows = rows + [
        (datetime.datetime(2024, 5, 4, 12), 99.0),
        (datetime.datetime(2024, 5, 5, 1), 50.0),
    ]
    refresh_partition_layout(
        spark, spark.createDataFrame(new_rows, schema), path, "ts"
    )
    assert {d: day_files(d) for d in (1, 2, 3)} == before
    got = read_partitioned(spark, path)
    assert got.count() == len(new_rows)
    assert (
        got.filter(F.col("p_bucket") == "2024-05-04").count() == 4
    )  # 3 + late row
    assert got.filter(F.col("p_bucket") == "2024-05-05").count() == 1


def test_estimate_join_size(spark, engine):
    from approximate_query_engine_spark.operators import estimate_join_size

    li, od = spark.table("lineitem"), spark.table("orders")
    true = li.join(od, li.l_orderkey == od.o_orderkey).count()
    est = estimate_join_size(
        li.withColumnRenamed("l_orderkey", "k"),
        od.withColumnRenamed("o_orderkey", "k"),
        on="k",
        fraction_left=0.3,
        fraction_right=0.3,
        seed=7,
    )
    assert est["ci_low"] <= true <= est["ci_high"]
    assert abs(est["estimate"] - true) / true < 0.5
    import pytest as _pt

    with _pt.raises(ValueError):
        estimate_join_size(li, od, on="k", fraction_left=0.0)
    # zero sampled collisions: never a certain [0, 0] CI
    a = spark.range(0, 1000).withColumnRenamed("id", "k")
    b = spark.range(100000, 101000).withColumnRenamed("id", "k")  # disjoint
    z = estimate_join_size(a, b, on="k", fraction_left=0.05, fraction_right=0.05)
    assert z["sampled_pairs"] == 0 and z["low_support"]
    assert z["ci_high"] > 0.0


def test_estimate_join_size_cms(spark):
    from approximate_query_engine_spark.operators import estimate_join_size_cms

    li, od = spark.table("lineitem"), spark.table("orders")
    true = li.join(od, li.l_orderkey == od.o_orderkey).count()
    est = estimate_join_size_cms(
        li.withColumnRenamed("l_orderkey", "k"),
        od.withColumnRenamed("o_orderkey", "k"),
        on="k",
        width=1 << 16,
    )
    # one-sided guarantee: never under; collision mass bounds the over side
    assert est["estimate"] >= true
    n_a, n_b = li.count(), od.count()
    assert est["estimate"] <= true + 3.0 * n_a * n_b / est["width"]
    # exact when width >> cardinality and keys are disjoint: estimate 0
    a = spark.range(0, 500).withColumnRenamed("id", "k")
    b = spark.range(10**6, 10**6 + 500).withColumnRenamed("id", "k")
    z = estimate_join_size_cms(a, b, on="k", width=1 << 20)
    assert z["estimate"] == 0


def test_salted_join_matches_plain(spark):
    skewed = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(5)],
        "k long, payload long",
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], "k long, name string")
    salted = salted_join(skewed, dim, on="k", salt=4)
    plain = skewed.join(dim, "k")
    assert salted.count() == plain.count() == 505
    got = {(r["k"], r["payload"]): r["name"] for r in salted.collect()}
    assert got[(1, 0)] == "hot" and got[(2, 4)] == "cold"
    # left_anti sanity through outer join equivalence
    left = salted_join(skewed, dim.filter("k = 2"), on="k", how="left")
    rows = left.filter("k = 1").select("name").distinct().collect()
    assert [r["name"] for r in rows] == [None]


def test_estimate_join_size_cms_mixed_key_types(spark):
    """int⋈bigint keys must hash into the same buckets (regression:
    xxhash64 hashes by physical type, so unnormalized mixed-width keys
    missed every match and broke the overestimate-only guarantee)."""
    from pyspark.sql import functions as F

    from approximate_query_engine_spark.operators import estimate_join_size_cms

    a = spark.range(0, 2000).select(F.col("id").cast("int").alias("k"))
    b = spark.range(0, 2000).select(F.col("id").alias("k"))  # bigint
    true = a.join(b, "k").count()
    est = estimate_join_size_cms(a, b, on="k", width=1 << 20)
    assert est["estimate"] >= true  # was 0 before the fix
    assert est["estimate"] <= true + 3.0 * 2000 * 2000 / est["width"]


# ---------------------------------------------------------------------------
# sessionization


def test_sessionize_boundaries(spark):
    """Hand-computed case: gaps >30min split; ties ordered by tiebreak."""
    import datetime as dt

    from approximate_query_engine_spark.operators import sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, t0),
        (1, 2, t0 + dt.timedelta(minutes=10)),   # same session
        (1, 3, t0 + dt.timedelta(minutes=41)),   # 31min gap -> new
        (1, 4, t0 + dt.timedelta(minutes=71)),   # exactly 30min -> NEW
        #   (end-exclusive boundary, same as Spark's session_window)
        (2, 5, t0),                               # other user independent
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    out = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(
            df, "user_id", "ts", gap_minutes=30, tiebreak_col="event_id"
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 3, 5: 1}


def test_session_stats(spark):
    import datetime as dt

    from approximate_query_engine_spark.operators import session_stats

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, t0),
        (1, 2, t0 + dt.timedelta(minutes=10)),
        (1, 3, t0 + dt.timedelta(hours=2)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    stats = {
        r["session_idx"]: r
        for r in session_stats(
            df, "user_id", "ts", gap_minutes=30, tiebreak_col="event_id"
        ).collect()
    }
    assert stats[1]["n_events"] == 2 and stats[1]["duration_sec"] == 600
    assert stats[2]["n_events"] == 1 and stats[2]["duration_sec"] == 0


def test_sessionize_single_shuffle(spark, engine):
    """Both window functions share one (partition, order) spec → exactly
    ONE Exchange in the plan. At 100 TB a second shuffle here would double
    the operator's cost for nothing."""
    from approximate_query_engine_spark.operators import sessionize

    df = spark.table("events")
    plan = (
        sessionize(df, "user_id", "ts", 30, tiebreak_col="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_knn_join_brute_vs_ivf_recall(spark, engine):
    from approximate_query_engine_spark.functions.similarity import knn_join

    emb = spark.table("embeddings")
    queries = emb.where("vec_id < 20")
    brute = knn_join(queries, emb, k=3, exclude_self=True)
    rows = brute.collect()
    assert len(rows) == 60
    # every query's neighbors ranked 1..3 by descending cosine
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3]
        assert rs[0]["cosine"] >= rs[1]["cosine"] >= rs[2]["cosine"]
        assert all(r["neighbor_id"] != q for r in rs)
    ivf = knn_join(
        queries, emb, k=3, method="ivf", nprobe=8, exclude_self=True
    ).collect()
    bset = {(r["query_id"], r["neighbor_id"]) for r in rows}
    iset = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    assert len(bset & iset) / len(bset) >= 0.7  # nprobe=8 of nlist=16
    # broadcast_probes=False (the corpus-vs-corpus self-join escape hatch)
    # changes only the join strategy, never the result set
    ivf_nb = knn_join(
        queries, emb, k=3, method="ivf", nprobe=8, exclude_self=True,
        broadcast_probes=False,
    ).collect()
    assert {(r["query_id"], r["neighbor_id"], r["rank"]) for r in ivf_nb} == {
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in ivf
    }


def test_funnel_semantics(spark):
    """Hand-computed: strict ordering, same-ts does not chain, out-of-order
    prefixes don't count."""
    import datetime as dt

    from approximate_query_engine_spark.operators import funnel, funnel_users

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "A", t0), (1, "B", t0 + dt.timedelta(days=1)),
        (1, "C", t0 + dt.timedelta(days=2)),
        (2, "A", t0), (2, "C", t0 + dt.timedelta(days=1)),       # skips B
        (3, "B", t0), (3, "A", t0 + dt.timedelta(days=1)),       # B precedes A
        (3, "C", t0 + dt.timedelta(days=2)),
        (4, "A", t0), (4, "B", t0),                               # same ts
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = {r["step_idx"]: r["n_entities"] for r in funnel(df, ["A", "B", "C"]).collect()}
    assert out == {1: 4, 2: 1, 3: 1}
    completed = funnel_users(df, ["A", "B", "C"]).collect()
    assert [r["user_id"] for r in completed] == [1]
    assert completed[0]["completed_ts"] == t0 + dt.timedelta(days=2)


def test_funnel_window(spark):
    """max_window_sec bounds the WHOLE journey from step 1."""
    import datetime as dt

    from approximate_query_engine_spark.operators import funnel

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "A", t0), (1, "B", t0 + dt.timedelta(hours=1)),      # inside 2h
        (2, "A", t0), (2, "B", t0 + dt.timedelta(hours=3)),      # outside
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = {
        r["step_idx"]: r["n_entities"]
        for r in funnel(df, ["A", "B"], max_window_sec=7200).collect()
    }
    assert out == {1: 2, 2: 1}


def test_sessionize_matches_native_session_window(spark, engine):
    """The composed sessionize agrees with Spark's built-in session_window
    on per-user session counts (boundary semantics differ only when a gap
    EXACTLY equals the threshold — measure-zero on ns timestamps)."""
    from pyspark.sql import functions as F

    from approximate_query_engine_spark.operators import sessionize

    ev = spark.table("events")
    mine = (
        sessionize(ev, "user_id", "ts", 360, tiebreak_col="event_id")
        .groupBy("user_id")
        .agg(F.max("session_idx").alias("n"))
    )
    native = (
        ev.groupBy("user_id", F.session_window("ts", "360 minutes"))
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = {r["user_id"]: r["n"] for r in mine.collect()}
    n = {r["user_id"]: r["n"] for r in native.collect()}
    assert m == n


def test_knn_join_plans(spark, engine):
    """Brute = broadcast nested-loop (the explicit baseline); IVF must be
    a hash join on centroid_id — a cartesian in the IVF path would defeat
    the candidate pruning entirely."""
    from approximate_query_engine_spark.functions.similarity import knn_join

    emb = spark.table("embeddings")
    brute = knn_join(emb.limit(10), emb, k=3)
    bplan = brute._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in bplan
    ivf = knn_join(emb.limit(10), emb, k=3, method="ivf")
    iplan = ivf._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in iplan
    assert "BroadcastHashJoin" in iplan or "SortMergeJoin" in iplan


# ---------------------------------------------------------------------------
# sampled join aggregation (one-sided join AQP)


def test_weighted_sample_designs(spark, engine):
    from approximate_query_engine_spark.operators import weighted_sample

    li = spark.table("lineitem")
    n = li.count()
    sys = weighted_sample(li, every_k=20, key_expr="l_orderkey * 31 + l_linenumber")
    rows = sys.select("__weight").distinct().collect()
    assert [r["__weight"] for r in rows] == [20.0]
    assert abs(sys.count() * 20 - n) / n < 0.2
    bern = weighted_sample(li, fraction=0.1, seed=3)
    assert abs(bern.count() * 10 - n) / n < 0.2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        weighted_sample(li)  # neither design
    with _pytest.raises(ValueError):
        weighted_sample(li, fraction=0.1, every_k=10, key_expr="l_orderkey")


def test_scaled_join_agg_unbiased_and_ci(spark, engine, duck):
    """Fact-side sampling through an FK join: estimates land near exact
    and the 95% CI covers the truth for this seed."""
    from approximate_query_engine_spark.operators import (
        scaled_join_agg,
        weighted_sample,
    )

    li, od = spark.table("lineitem"), spark.table("orders")
    fs = weighted_sample(li, fraction=0.2, seed=11)
    joined = fs.join(od, fs.l_orderkey == od.o_orderkey)
    out = scaled_join_agg(
        joined, [], {"n": "COUNT(*)", "rev": "SUM(l_extendedprice)"}
    ).collect()[0]
    true_n, true_rev = duck.execute(
        "SELECT COUNT(*), SUM(l_extendedprice) FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey"
    ).fetchone()
    assert abs(out["n"] - true_n) / true_n < 0.15
    assert out["n_ci_low"] <= true_n <= out["n_ci_high"]
    assert out["rev_ci_low"] <= true_rev <= out["rev_ci_high"]


def test_scaled_join_agg_decimal_exact_grouped(spark, engine, duck):
    """The deterministic design + decimal accumulation reproduces the
    DuckDB rendering bit-exactly (the q63 contract shape)."""
    from approximate_query_engine_spark.operators import (
        scaled_join_agg,
        weighted_sample,
    )

    li, od = spark.table("lineitem"), spark.table("orders")
    fs = weighted_sample(li, every_k=20, key_expr="l_orderkey * 31 + l_linenumber")
    joined = fs.join(od, fs.l_orderkey == od.o_orderkey)
    out = scaled_join_agg(
        joined,
        ["o_orderpriority"],
        {"n_est": "COUNT(*)", "rev_est": "SUM(l_extendedprice)"},
        decimal_exact=True,
    )
    s = sorted(tuple(r) for r in out.collect())
    d = sorted(
        tuple(r)
        for r in duck.execute(
            "SELECT o_orderpriority, "
            "CAST(ROUND(COALESCE(SUM(20.0), 0.0)) AS BIGINT) AS n_est, "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(20.0 AS DECIMAL(18,2))) AS DOUBLE) AS rev_est "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE (l_orderkey * 31 + l_linenumber) % 20 = 0 "
            "GROUP BY o_orderpriority"
        ).fetchall()
    )
    assert s == d


def test_funnel_window_uses_best_chain_start(spark):
    """A conversion via a LATER step-1 occurrence must count (regression:
    the window was anchored at the entity's earliest step-1 event only,
    undercounting entities whose funnel fits a window starting later)."""
    import datetime as dt

    from approximate_query_engine_spark.operators import funnel, funnel_users

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "A", t0),                                    # stale first A
        (1, "A", t0 + dt.timedelta(seconds=100)),        # fresh A
        (1, "B", t0 + dt.timedelta(seconds=110)),        # 10s after fresh A
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = {
        r["step_idx"]: r["n_entities"]
        for r in funnel(df, ["A", "B"], max_window_sec=50).collect()
    }
    assert out == {1: 1, 2: 1}  # was {1: 1, 2: 0} with first-A anchoring
    fu = funnel_users(df, ["A", "B"], max_window_sec=50).collect()
    assert fu[0]["completed_ts"] == t0 + dt.timedelta(seconds=110)


def test_cohort_retention_toy(spark):
    """Hand-computed cohorts: two users in week-1 cohort (one retained in
    week 2), one user in week-2 cohort."""
    import datetime as dt

    from approximate_query_engine_spark.operators import cohort_retention

    mon1 = dt.datetime(2024, 1, 1)   # a Monday
    mon2 = dt.datetime(2024, 1, 8)
    rows = [
        (1, mon1), (1, mon2),        # cohort w1, active w1+w2
        (2, mon1 + dt.timedelta(days=3)),  # cohort w1, only w1
        (3, mon2 + dt.timedelta(days=1)),  # cohort w2
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        (r["cohort_start"], r["period_offset"]): r["n_entities"]
        for r in cohort_retention(df, period="week").collect()
    }
    assert out == {
        (dt.date(2024, 1, 1), 0): 2,
        (dt.date(2024, 1, 1), 1): 1,
        (dt.date(2024, 1, 8), 0): 1,
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cohort_retention(df, period="month")


def test_cohort_retention_plan(spark, engine):
    """Window-based cohorts keep the plan join-free with at most three
    exchanges (entity window, distinct, final agg — AQE may reuse)."""
    from approximate_query_engine_spark.operators import cohort_retention

    plan = (
        cohort_retention(spark.table("events"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") <= 3, plan
