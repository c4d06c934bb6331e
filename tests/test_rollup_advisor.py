"""The materialization advisor (late round 7): rollup-shaped queries
that run WITHOUT a rollup record their inferred shape; recurring shapes
merge into a concrete create_rollup suggestion; following the advice
routes the original workload and converges the advice to empty."""

import tempfile

import pytest

from approximate_query_engine_spark import AQEngine
from approximate_query_engine_spark.operators.rollup import (
    infer_rollup_shape,
)
from approximate_query_engine_spark.sqlparser import try_parse

WORKLOAD = [
    "SELECT event_type, COUNT(*) AS n FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-05 00:00:00' GROUP BY event_type",
    "SELECT DATE_TRUNC('DAY', ts) AS day, SUM(value) AS sv FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-09 00:00:00' "
    "GROUP BY DATE_TRUNC('DAY', ts)",
    "SELECT event_type, COUNT(DISTINCT user_id) AS du FROM events "
    "WHERE ts BETWEEN TIMESTAMP '2024-01-02 00:00:00' "
    "AND TIMESTAMP '2024-01-05 00:00:00' GROUP BY event_type",
    "SELECT event_type, MEDIAN(value) AS med FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-05 00:00:00' GROUP BY event_type",
]


def test_advisor_end_to_end(spark):
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_"),
        data_dir="/root/testdata/sf0.001",
    )
    for q in WORKLOAD:
        r = e.query(q, max_rel_error=0.05)
        assert r["status"] == "ok", r.get("error")
    recs = e.recommend_rollups(min_count=3)
    assert len(recs) == 1
    rec = recs[0]
    assert rec["table"] == "events" and rec["time_col"] == "ts"
    assert rec["bucket"] == "1 hour"  # finest observed grain wins
    assert rec["dims"] == ["event_type"]
    assert rec["measures"] == ["value"]
    assert rec["distinct_cols"] == ["user_id"]
    assert rec["quantile_cols"] == ["value"]
    assert rec["observed_queries"] == len(WORKLOAD)
    # follow the advice: the whole workload now routes...
    e.create_rollup(
        rec["table"],
        rec["time_col"],
        rec["bucket"],
        dims=rec["dims"],
        measures=rec["measures"],
        distinct_cols=rec["distinct_cols"],
        quantile_cols=rec["quantile_cols"],
        kll_k=800,  # a DIFFERENT k than the suggestion's default
    )
    for q in WORKLOAD:
        r = e.query(q, max_rel_error=0.05)
        assert "rollup" in r["plan"]["reason"], (q, r["plan"]["reason"])
    # ...and the advice converges to empty (coverage is structural —
    # the different kll_k must not keep the suggestion alive)
    assert e.recommend_rollups(min_count=1) == []


def test_advisor_ignores_non_rollup_shapes(spark):
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_neg_"),
        data_dir="/root/testdata/sf0.001",
    )
    for q in (
        "SELECT COUNT(*) AS n FROM lineitem",  # no time dimension
        "SELECT l_returnflag, SUM(l_quantity) AS sq FROM lineitem "
        "GROUP BY l_returnflag",  # no time dimension
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE value > 10 OR user_id = 3 GROUP BY event_type",  # OR
    ):
        assert e.query(q)["status"] == "ok"
    assert e.recommend_rollups(min_count=1) == []


@pytest.mark.parametrize(
    "sql,expect",
    [
        # raw-ts grouping is not a rollup shape
        ("SELECT ts, COUNT(*) AS n FROM events GROUP BY ts", None),
        # two different time columns decline
        (
            "SELECT DATE_TRUNC('DAY', ts) AS d, COUNT(*) AS n FROM events "
            "WHERE event_id >= TIMESTAMP '2024-01-01 00:00:00' GROUP BY "
            "DATE_TRUNC('DAY', ts)",
            None,
        ),
        # minute grain maps to the finest bucket
        (
            "SELECT DATE_TRUNC('MINUTE', ts) AS m, COUNT(*) AS n "
            "FROM events GROUP BY DATE_TRUNC('MINUTE', ts)",
            "1 minute",
        ),
    ],
)
def test_infer_shape_edges(sql, expect):
    parsed = try_parse(sql)
    assert parsed is not None
    shape = infer_rollup_shape(parsed)
    if expect is None:
        assert shape is None
    else:
        assert shape is not None and shape["bucket"] == expect


# ------------------------------------------------------------------ r9
TOPK_WORKLOAD = (
    "SELECT user_id, COUNT(*) AS n FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-09 00:00:00' "
    "GROUP BY user_id ORDER BY n DESC, user_id ASC LIMIT 10"
)


def test_advisor_learns_top_items_shape(spark):
    """VERDICT r8 #1: the q105-shaped workload (high-cardinality group
    key, ORDER BY COUNT(*) DESC LIMIT k) gets an advisor-built
    frequent-items rollup — observe ×3 → maintenance apply → the NEXT
    identical query routes with 'exact regime certified' — instead of
    an un-materializable dims suggestion."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_topk_"),
        # sf0.001 user_id ndv is 15 — set the dim-viability line below
        # it to exercise the too-high-cardinality branch at this scale
        data_dir="/root/testdata/sf0.001",
        advisor_topk_dim_ndv=5,
    )
    e.analyze_table("events", ["user_id"])
    for _ in range(3):
        r = e.query(TOPK_WORKLOAD, dual_execute=False)
        assert r["status"] == "ok", r.get("error")
        assert "rollup" not in r["plan"]["reason"], r["plan"]
    recs = e.recommend_rollups()
    assert len(recs) == 1, recs
    assert recs[0]["topk_cols"] == ["user_id"], recs
    assert recs[0]["dims"] == [], recs  # converted OUT of dims
    # certification fallback companion rides along
    assert recs[0]["distinct_cols"] == ["user_id"], recs
    rep = e.maintain(refresh_stats=False, apply_advice=True)
    applied = rep["rollup_advice_applied"]
    assert applied and applied[0]["applied"] is True, applied
    assert rep["rollup_recommendations"] == []  # advice converged
    r = e.query(TOPK_WORKLOAD, dual_execute=False)
    assert "combined frequent-items state" in r["plan"]["reason"], (
        r["plan"]
    )
    assert "exact regime certified" in r["plan"]["reason"], r["plan"]
    # and the routed answer matches the raw GROUP BY bit-for-bit
    got = [(d["user_id"], d["n"]) for d in r["result"]]
    exact = [
        (x["user_id"], x["n"]) for x in spark.sql(TOPK_WORKLOAD).collect()
    ]
    assert got == exact


def test_advisor_topk_keeps_low_ndv_as_dim(spark):
    """Below the dim-viability line (or with no catalog ndv at all) the
    dims advice stands — an exact dims rollup serves the same query
    through the plain rewrite, no sketch state needed."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_lowndv_"),
        data_dir="/root/testdata/sf0.001",  # user_id ndv 15 < 10k default
    )
    e.analyze_table("events", ["user_id"])
    for _ in range(3):
        e.query(TOPK_WORKLOAD, dual_execute=False)
    recs = e.recommend_rollups()
    assert len(recs) == 1
    assert recs[0]["dims"] == ["user_id"], recs
    assert recs[0]["topk_cols"] == [], recs


def test_advisor_topk_respects_hard_dims(spark):
    """A column some OTHER recurring shape genuinely filters on stays a
    dim even when it is also a top-items candidate — converting it
    would break the dim-filter shape's coverage."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_hard_"),
        data_dir="/root/testdata/sf0.001",
        advisor_topk_dim_ndv=5,
    )
    e.analyze_table("events", ["user_id"])
    hard = (
        "SELECT user_id, COUNT(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00' GROUP BY user_id"
    )  # no ORDER BY count/LIMIT: user_id is a true dim here
    for _ in range(3):
        e.query(TOPK_WORKLOAD, dual_execute=False)
        e.query(hard, dual_execute=False)
    recs = e.recommend_rollups()
    assert len(recs) == 1
    assert recs[0]["dims"] == ["user_id"], recs
    assert recs[0]["topk_cols"] == [], recs


def test_topk_candidate_grammar_edges():
    from approximate_query_engine_spark.operators.rollup import (
        infer_rollup_shape,
    )
    from approximate_query_engine_spark.sqlparser import try_parse

    def cands(sql):
        shape = infer_rollup_shape(try_parse(sql))
        return None if shape is None else shape["topk_candidates"]

    base = (
        "SELECT user_id, COUNT(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "GROUP BY user_id ORDER BY n DESC LIMIT 10"
    )
    assert cands(base) == ["user_id"]
    # ORDER BY the raw COUNT(*) expression works too
    assert cands(base.replace("ORDER BY n DESC", "ORDER BY COUNT(*) DESC")
                 ) == ["user_id"]
    # no LIMIT, ascending count, non-count lead, extra select item,
    # HAVING, secondary DESC: all fall back to plain dims shapes
    assert cands(base.replace(" LIMIT 10", "")) == []
    assert cands(base.replace("ORDER BY n DESC", "ORDER BY n ASC")) == []
    assert cands(base.replace("ORDER BY n DESC", "ORDER BY user_id DESC")
                 ) == []
    assert cands(base.replace(
        "ORDER BY n DESC", "ORDER BY n DESC, user_id DESC")) == []
    assert cands(
        "SELECT user_id, COUNT(*) AS n, SUM(value) AS sv FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "GROUP BY user_id ORDER BY n DESC LIMIT 10"
    ) == []


CLICKS_TOPK = (
    "SELECT user_id, COUNT(*) AS n FROM clicks "
    "WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-07 00:00:00' "
    "GROUP BY user_id ORDER BY n DESC, user_id ASC LIMIT 10"
)


def _clicks_engine(spark, stale_ndv: int = 200):
    """A fact table whose TRUE user_id ndv (2000) exceeds the 1024
    budget floor, with a seeded STALE-LOW catalog ndv — the scenario
    where recommend_rollups under-sizes topk_budget and only the
    build's exact evidence can reveal it (VERDICT r9 #2)."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_repair_"),
        data_dir="/root/testdata/sf0.001",
        advisor_topk_dim_ndv=100,
    )
    n = 12_000
    spark.range(n).selectExpr(
        "CAST(id % 2000 AS BIGINT) AS user_id",
        "timestampadd(SECOND, CAST((id * 43) % 518400 AS INT), "
        "TIMESTAMP '2024-01-01 00:00:00') AS ts",
    ).createOrReplaceTempView("clicks")
    e.catalog.upsert_table_stats("clicks", n)
    e.catalog.upsert_column_ndv("clicks", "user_id", stale_ndv)
    return e


def test_advisor_topk_budget_repair_from_build_evidence(spark):
    """VERDICT r9 #2: a stale-low catalog ndv sizes the advised budget
    at the 1024 floor; the build's exact COUNT(DISTINCT) evidence (2000)
    proves it under-sized, and apply_rollup_advice rebuilds ONCE at the
    evidence-sized budget (next pow2 >= 2000*1.25 = 4096) instead of
    leaving a permanently non-certifiable rollup behind. The catalog ndv
    is repaired from the evidence, and the next query still routes
    'exact regime certified'."""
    e = _clicks_engine(spark)
    for _ in range(3):
        r = e.query(CLICKS_TOPK, dual_execute=False)
        assert r["status"] == "ok", r.get("error")
    recs = e.recommend_rollups()
    assert len(recs) == 1 and recs[0]["topk_budget"] == 1024, recs
    rep = e.apply_rollup_advice()
    assert rep and rep[0]["applied"] is True, rep
    repair = rep[0]["built"]["topk_budget_repair"]
    assert repair["resized"] is True, repair
    assert (repair["from"], repair["to"]) == (1024, 4096), repair
    # the catalog now carries the exact truth for the next advice round
    assert e.catalog.get_column_ndv("clicks", "user_id") == 2000
    info = e.catalog.rollups["clicks"][0]
    assert info["topk_budget"] == 4096, info
    assert info["topk_exact_ndv"]["user_id"] == {
        "ndv": 2000,
        "exact": True,
    }
    r = e.query(CLICKS_TOPK, dual_execute=False)
    assert "combined frequent-items state" in r["plan"]["reason"], (
        r["plan"]
    )
    assert "exact regime certified" in r["plan"]["reason"], r["plan"]
    assert "build evidence" in r["plan"]["reason"], r["plan"]
    got = [(d["user_id"], d["n"]) for d in r["result"]]
    exact = [
        (x["user_id"], x["n"]) for x in spark.sql(CLICKS_TOPK).collect()
    ]
    assert got == exact


def test_advisor_topk_budget_repair_declines_over_state_budget(spark):
    """The repair honors the operator's state-row budget: when the
    evidence-sized rebuild would exceed max_state_rows, the resize is
    DECLINED with a recorded reason — the rollup is kept for its other
    state, and top-k routing declines to exact (exact over-budget
    evidence hard-blocks every statistical tier) instead of silently
    building state nobody budgeted for."""
    e = _clicks_engine(spark)
    for _ in range(3):
        e.query(CLICKS_TOPK, dual_execute=False)
    # initial gate passes at the stale estimate (144 buckets x 201),
    # the exact-evidence resize (144 x 2001) would not
    rep = e.apply_rollup_advice(max_state_rows=50_000)
    assert rep and rep[0]["applied"] is True, rep
    repair = rep[0]["built"]["topk_budget_repair"]
    assert repair["resized"] is False, repair
    assert "max_state_rows" in repair["reason"], repair
    # budget stayed as advised; exact evidence recorded; routing declines
    info = e.catalog.rollups["clicks"][0]
    assert info["topk_budget"] == 1024, info
    r = e.query(CLICKS_TOPK, dual_execute=False)
    assert r["status"] == "ok", r.get("error")
    assert "frequent-items" not in r["plan"]["reason"], r["plan"]
    # the catalog ndv is still repaired, so the NEXT advice round sizes
    # from truth instead of repeating the under-sized build
    assert e.catalog.get_column_ndv("clicks", "user_id") == 2000


def test_advisor_learns_theta_overlap_family(spark):
    """VERDICT r9 #4: the overlap workload (engine.segment_overlap) is
    the one state family SQL shapes can never imply — its raw fallback
    records a (dims=[segment], theta_cols=[key]) observation, three
    recurring calls produce theta_cols advice, maintenance materializes
    it, and the NEXT call answers from unioned rollup theta state with
    identical output."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_theta_"),
        data_dir="/root/testdata/sf0.001",
    )
    raw = None
    for _ in range(3):
        r = e.segment_overlap("events", "event_type", "user_id",
                              time_col="ts")
        assert r["source"] == "raw_scan", r
        assert "shape recorded" in r["reason"], r
        raw = r["df"]
    recs = e.recommend_rollups()
    assert len(recs) == 1, recs
    assert recs[0]["theta_cols"] == ["user_id"], recs
    assert recs[0]["dims"] == ["event_type"], recs
    rep = e.maintain(refresh_stats=False, apply_advice=True)
    applied = rep["rollup_advice_applied"]
    assert applied and applied[0]["applied"] is True, applied
    assert applied[0]["theta_cols"] == ["user_id"], applied
    assert rep["rollup_recommendations"] == [], rep  # advice converged
    r = e.segment_overlap("events", "event_type", "user_id")
    assert r["source"] == "rollup_state", r
    assert "theta state" in r["reason"], r
    # routed output identical to the raw scan (theta exact below 2^lgk)
    assert [tuple(x) for x in r["df"].collect()] == [
        tuple(x) for x in raw.collect()
    ]
    # and bit-identical to the exact set computation
    exact = spark.sql(
        "WITH seg AS (SELECT DISTINCT event_type AS s, user_id AS u "
        "FROM events WHERE user_id IS NOT NULL "
        "AND event_type IS NOT NULL), "
        "card AS (SELECT s, COUNT(*) AS c FROM seg GROUP BY s) "
        "SELECT ca.s, cb.s, ca.c, cb.c FROM card ca JOIN card cb "
        "ON ca.s < cb.s ORDER BY ca.s, cb.s"
    ).collect()
    got = r["df"].collect()
    assert [(x[0], x[1], x[2], x[3]) for x in got] == [
        tuple(x) for x in exact
    ]


def test_overlap_without_time_col_infers_unambiguous_clock(spark):
    """Round 11 (VERDICT r10 #4): no time column named, but the table's
    clock is unambiguous — orders has exactly ONE date/timestamp-typed
    column (o_orderdate) — so the shape IS recorded against the inferred
    clock instead of being dropped (the round-10 behavior this
    supersedes: better-known advice beats no advice when the clock
    cannot be wrong)."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_theta_nt_"),
        data_dir="/root/testdata/sf0.001",
    )
    for _ in range(3):
        r = e.segment_overlap("orders", "o_orderpriority", "o_custkey")
        assert r["source"] == "raw_scan", r
        assert "shape recorded" in r["reason"], r
    book = list(e.catalog.rollup_candidates.values())
    assert len(book) == 1 and book[0]["time_col"] == "o_orderdate", book
    assert book[0]["theta_cols"] == ["o_custkey"], book


def test_overlap_without_time_col_ambiguous_clock_never_records(spark):
    """Round 11 (VERDICT r10 #4): two time-typed columns and no catalog
    record naming the clock -> inference refuses and nothing enters the
    observation book (advice recorded against a guessed clock would
    materialize a rollup bucketed on the wrong column)."""
    spark.sql(
        "SELECT user_id, event_type, ts AS created_ts, ts AS updated_ts "
        "FROM events"
    ).createOrReplaceTempView("events_twoclock")
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_theta_amb_"),
        data_dir="/root/testdata/sf0.001",
    )
    for _ in range(3):
        r = e.segment_overlap("events_twoclock", "event_type", "user_id")
        assert r["source"] == "raw_scan", r
        assert "shape recorded" not in r["reason"], r
    assert e.recommend_rollups() == []


def test_overlap_without_time_col_layout_record_names_clock(spark):
    """Round 11 (VERDICT r10 #4, the ordered Done-case): a LAYOUT-backed
    table's clock comes from the catalog record — even when the schema
    alone is ambiguous (two time-typed columns), the layout's ts_col was
    named by a caller, so the unwindowed overlap call records the shape
    against it."""
    spark.sql(
        "SELECT event_id, user_id, event_type, ts, ts AS ingested_ts "
        "FROM events"
    ).createOrReplaceTempView("events_laid")
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_theta_lay_"),
        data_dir="/root/testdata/sf0.001",
    )
    e.catalog.upsert_table_stats(
        "events_laid", spark.table("events_laid").count()
    )
    e.partition_table("events_laid", "ts", grain="day")
    r = e.segment_overlap("events_laid", "event_type", "user_id")
    assert r["source"] == "raw_scan", r
    assert "shape recorded" in r["reason"], r
    book = list(e.catalog.rollup_candidates.values())
    assert len(book) == 1 and book[0]["time_col"] == "ts", book


def test_overlap_routes_only_with_segment_dim(spark):
    """A fresh rollup tracking the key's theta state WITHOUT the segment
    as a dim cannot group state per segment — the call falls back to
    raw instead of answering from unservable state."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_theta_dim_"),
        data_dir="/root/testdata/sf0.001",
    )
    e.create_rollup("events", "ts", "1 day", dims=[],
                    theta_cols=["user_id"])
    r = e.segment_overlap("events", "event_type", "user_id")
    assert r["source"] == "raw_scan", r


def test_audience_diff_raw_fallback_feeds_advisor(spark):
    """Round 10: the q100 side of the overlap family — with no theta
    rollup and a named time_col, rollup_audience_diff answers EXACTLY
    from one raw scan (single-pass membership flags) and records the
    shape; three calls -> theta advice -> apply -> the same call
    answers from state with identical numbers. Without time_col the
    historical raise contract stands."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_adiff_"),
        data_dir="/root/testdata/sf0.001",
    )
    args = (
        "events", "user_id",
        "2024-01-02 00:00:00", "2024-01-03 00:00:00",
        "2024-01-03 00:00:00", "2024-01-04 00:00:00",
    )
    with pytest.raises(ValueError, match="theta set-algebra"):
        e.rollup_audience_diff(*args)
    raw = None
    for _ in range(3):
        raw = e.rollup_audience_diff(*args, time_col="ts")
        assert raw["source"] == "raw_scan", raw
    # exact by construction: matches the subquery formulation
    ex = spark.sql(
        "WITH a AS (SELECT DISTINCT user_id u FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-03 00:00:00'), "
        "b AS (SELECT DISTINCT user_id u FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-04 00:00:00') "
        "SELECT (SELECT COUNT(*) FROM a) da, "
        "(SELECT COUNT(*) FROM b) db, "
        "(SELECT COUNT(*) FROM a JOIN b ON a.u = b.u) ret"
    ).collect()[0]
    assert (raw["distinct_a"], raw["distinct_b"], raw["returning"]) == (
        ex["da"], ex["db"], ex["ret"],
    )
    recs = e.recommend_rollups()
    assert len(recs) == 1 and recs[0]["theta_cols"] == ["user_id"], recs
    rep = e.maintain(refresh_stats=False, apply_advice=True)
    assert rep["rollup_advice_applied"][0]["applied"] is True
    routed = e.rollup_audience_diff(*args)
    assert routed["source"] == "rollup_state", routed
    keys = (
        "distinct_a", "distinct_b", "returning",
        "union_cnt", "new_in_b", "churned",
    )
    assert {k: routed[k] for k in keys} == {k: raw[k] for k in keys}


def test_windowed_segment_overlap_routed_and_raw(spark):
    """Round 10: [lo, hi) bounds window the overlap on BOTH paths — the
    routed path p_date-prunes state on the rollup's grid, the raw path
    filters the scan; identical output below the sketch's exact-mode
    budget. Off-grid bounds fall back to raw instead of slicing a
    bucket, and a windowed call with neither state nor time_col
    refuses rather than silently answering unwindowed."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_win_"),
        data_dir="/root/testdata/sf0.001",
    )
    lo, hi = "2024-01-02 00:00:00", "2024-01-05 00:00:00"
    r_raw = e.segment_overlap(
        "events", "event_type", "user_id", time_col="ts", lo=lo, hi=hi
    )
    assert r_raw["source"] == "raw_scan", r_raw
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    r_st = e.segment_overlap("events", "event_type", "user_id",
                             lo=lo, hi=hi)
    assert r_st["source"] == "rollup_state", r_st
    assert "p_date-pruned" in r_st["reason"], r_st
    assert [tuple(x) for x in r_st["df"].collect()] == [
        tuple(x) for x in r_raw["df"].collect()
    ]
    # off the day grid: raw fallback, never a sliced bucket
    r_off = e.segment_overlap(
        "events", "event_type", "user_id", time_col="ts",
        lo="2024-01-02 03:00:00", hi=hi,
    )
    assert r_off["source"] == "raw_scan", r_off
    # windowed with neither state nor time_col refuses
    e2 = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_win2_"),
        data_dir="/root/testdata/sf0.001",
    )
    with pytest.raises(ValueError, match="windowed segment_overlap"):
        e2.segment_overlap("events", "event_type", "user_id", lo=lo)


def test_overlap_advice_bucket_inference():
    from approximate_query_engine_spark.engine import (
        _overlap_advice_bucket,
    )

    assert _overlap_advice_bucket() == "1 day"
    assert _overlap_advice_bucket(None, None) == "1 day"
    assert _overlap_advice_bucket("2024-01-02 00:00:00") == "1 day"
    assert _overlap_advice_bucket(
        "2024-01-02 03:00:00", "2024-01-04 00:00:00"
    ) == "1 hour"
    # review fix (round 10): the advice parser speaks the SAME literal
    # grammar as the routed grid check — ISO-T separators and date-only
    # forms must not silently disable the advisor loop
    assert _overlap_advice_bucket("2024-01-02T00:00:00") == "1 day"
    assert _overlap_advice_bucket("2024-01-02T03:00:00") == "1 hour"
    assert _overlap_advice_bucket("2024-01-02") == "1 day"
    # off every grid / unparseable: no advice is better than a build
    # that could never serve the request
    assert _overlap_advice_bucket("2024-01-02 03:30:00") is None
    assert _overlap_advice_bucket("2024-01-02 03:00:00.5") is None
    assert _overlap_advice_bucket("garbage") is None


def test_segment_overlap_pairs_filter_through_state(spark):
    """The pairs restriction applies identically on the routed path —
    pairwise_sketch_overlap is shared, so a routed (a, b)-only request
    returns exactly the raw path's filtered rows."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_pairs_"),
        data_dir="/root/testdata/sf0.001",
    )
    segs = [
        r[0]
        for r in spark.sql(
            "SELECT DISTINCT event_type FROM events ORDER BY 1 LIMIT 2"
        ).collect()
    ]
    pairs = [(segs[0], segs[1])]
    raw = e.segment_overlap(
        "events", "event_type", "user_id", pairs=pairs
    )
    assert raw["source"] == "raw_scan"
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    routed = e.segment_overlap(
        "events", "event_type", "user_id", pairs=pairs
    )
    assert routed["source"] == "rollup_state"
    raw_rows = [tuple(x) for x in raw["df"].collect()]
    routed_rows = [tuple(x) for x in routed["df"].collect()]
    assert len(routed_rows) == 1
    assert routed_rows == raw_rows


def test_segment_overlap_routed_estimation_regime(spark):
    """The routed path degrades exactly like the raw one at warehouse
    ndv: per-bucket theta sketches built past the nominal budget
    (theta_lgk=4 → 16 entries vs 1000 keys/segment) union into
    estimates with ~1/sqrt(2^lgk) relative error — the 100 TB contract
    for overlap-from-state. Checked against exact truth from the same
    synthetic data."""
    from pyspark.sql import functions as F

    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_estim_"),
    )
    # 2 segments, 1000 keys each, keys 500..999 shared → overlap 500
    spark.range(2000).selectExpr(
        "CASE WHEN id < 1000 THEN 'a' ELSE 'b' END AS seg",
        "CAST(CASE WHEN id < 1000 THEN id ELSE id - 500 END AS BIGINT) AS k",
        "timestampadd(HOUR, CAST(id % 72 AS INT), "
        "TIMESTAMP '2024-01-01 00:00:00') AS ts",
    ).createOrReplaceTempView("bigseg")
    e.catalog.upsert_table_stats("bigseg", 2000)
    e.create_rollup(
        "bigseg", "ts", "1 day", dims=["seg"], theta_cols=["k"],
        theta_lgk=4,
    )
    r = e.segment_overlap("bigseg", "seg", "k")
    assert r["source"] == "rollup_state", r
    row = r["df"].collect()[0]
    assert row["distinct_a"] > 16  # estimation mode, not truncation
    # same loose 8-sigma bars as the raw-path estimation test
    assert abs(row["distinct_a"] - 1000) / 1000 < 2.0
    assert abs(row["distinct_b"] - 1000) / 1000 < 2.0
    assert abs(row["overlap_cnt"] - 500) / 500 < 3.0


def test_segment_overlap_dim_filter_routed_and_raw(spark):
    """dims equality filters restrict the population before the overlap
    ("overlap among region=r0 users") — routed only when every filtered
    column is a registered dim of the serving rollup (else raw, never
    a guess against state that didn't group by it); identical output on
    both paths, and the filtered shape's dims are recorded into the
    advice."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_advisor_dimf_"),
    )
    spark.range(4000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS seg",
        "CONCAT('r', CAST(id % 2 AS STRING)) AS region",
        "CAST(id % 40 AS BIGINT) AS k",
        "timestampadd(HOUR, CAST(id % 48 AS INT), "
        "TIMESTAMP '2024-01-01 00:00:00') AS ts",
    ).createOrReplaceTempView("segpop")
    e.catalog.upsert_table_stats("segpop", 4000)
    raw = e.segment_overlap(
        "segpop", "seg", "k", time_col="ts", dims={"region": "r0"}
    )
    assert raw["source"] == "raw_scan", raw
    # the recorded shape carries BOTH the segment and the filter dim
    recs = []
    for _ in range(2):
        e.segment_overlap(
            "segpop", "seg", "k", time_col="ts", dims={"region": "r0"}
        )
    recs = e.recommend_rollups()
    assert recs and sorted(recs[0]["dims"]) == ["region", "seg"], recs
    # a rollup missing the filter dim cannot serve — stays raw
    e.create_rollup("segpop", "ts", "1 day", dims=["seg"],
                    theta_cols=["k"])
    still = e.segment_overlap("segpop", "seg", "k", time_col="ts",
                              dims={"region": "r0"})
    assert still["source"] == "raw_scan", still
    # one that groups by both dims serves, bit-identical to raw
    e.create_rollup("segpop", "ts", "1 hour", dims=["seg", "region"],
                    theta_cols=["k"])
    routed = e.segment_overlap("segpop", "seg", "k",
                               dims={"region": "r0"})
    assert routed["source"] == "rollup_state", routed
    assert [tuple(x) for x in routed["df"].collect()] == [
        tuple(x) for x in raw["df"].collect()
    ]


def test_audience_diff_falls_back_when_state_cannot_serve(spark):
    """Review fix (round 10): a materialized rollup must never make a
    previously-working raw-fallback call STOP working — off-grid bounds
    (or a different clock) with time_col fall through to the raw scan
    instead of raising, and record advice at the grain the bounds
    actually need."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_adiff_fall_"),
        data_dir="/root/testdata/sf0.001",
    )
    e.create_rollup("events", "ts", "1 day", theta_cols=["user_id"])
    # off the day grid: the rollup exists but cannot serve these bounds
    d = e.rollup_audience_diff(
        "events", "user_id",
        "2024-01-02 03:00:00", "2024-01-03 03:00:00",
        "2024-01-03 03:00:00", "2024-01-04 03:00:00",
        time_col="ts",
    )
    assert d["source"] == "raw_scan", d
    # the recorded shape names the hour grain these bounds need
    recs = [
        v for v in e.catalog.rollup_candidates.values()
        if v.get("theta_cols") == ["user_id"]
    ]
    assert recs and recs[0]["bucket"] == "1 hour", recs
    # without time_col the historical raise contract still stands
    with pytest.raises(ValueError, match="not aligned"):
        e.rollup_audience_diff(
            "events", "user_id",
            "2024-01-02 03:00:00", "2024-01-03 03:00:00",
            "2024-01-03 03:00:00", "2024-01-04 03:00:00",
        )


def test_overlap_never_windows_the_wrong_clock(spark):
    """Review fix (round 10): a rollup bucketed on a DIFFERENT time
    column must not serve a windowed request naming another clock —
    same call, same meaning, regardless of which state exists."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_clock_"),
    )
    spark.range(2000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS seg",
        "CAST(id % 50 AS BIGINT) AS k",
        "timestampadd(HOUR, CAST(id % 48 AS INT), "
        "TIMESTAMP '2024-01-01 00:00:00') AS ts",
        # ingest lags the event clock by two days
        "timestampadd(HOUR, CAST(id % 48 AS INT) + 48, "
        "TIMESTAMP '2024-01-01 00:00:00') AS ingest_ts",
    ).createOrReplaceTempView("twoclock")
    e.catalog.upsert_table_stats("twoclock", 2000)
    e.create_rollup("twoclock", "ingest_ts", "1 day", dims=["seg"],
                    theta_cols=["k"])
    r = e.segment_overlap(
        "twoclock", "seg", "k", time_col="ts",
        lo="2024-01-01 00:00:00", hi="2024-01-02 00:00:00",
    )
    # the ingest_ts rollup must NOT serve a ts-windowed request
    assert r["source"] == "raw_scan", r
    # audience diff applies the same clock guard
    d = e.rollup_audience_diff(
        "twoclock", "k",
        "2024-01-01 00:00:00", "2024-01-02 00:00:00",
        "2024-01-02 00:00:00", "2024-01-03 00:00:00",
        time_col="ts",
    )
    assert d["source"] == "raw_scan", d
    # unwindowed calls don't involve a clock at all — state serves
    assert e.segment_overlap("twoclock", "seg", "k")["source"] == (
        "rollup_state"
    )


def test_raw_paths_reject_garbage_bounds(spark):
    """Review fix (round 10): Spark casts an unparseable bound to NULL,
    which silently filters every row — the raw paths must raise like
    the routed one instead of returning exact-looking zeros."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_garbage_"),
        data_dir="/root/testdata/sf0.001",
    )
    with pytest.raises(ValueError, match="timestamp literal"):
        e.segment_overlap(
            "events", "event_type", "user_id", time_col="ts",
            lo="2024/01/02", hi="2024/01/05",
        )
    with pytest.raises(ValueError, match="timestamp literal"):
        e.rollup_audience_diff(
            "events", "user_id",
            "garbage", "2024-01-03 00:00:00",
            "2024-01-03 00:00:00", "2024-01-04 00:00:00",
            time_col="ts",
        )


def test_routed_overlap_drops_all_null_key_segments(spark):
    """Review fix (round 10): a segment whose key is NULL on every row
    never forms on the raw path (key.isNotNull() precedes grouping) —
    the routed path must drop its empty-sketch state rows too, or the
    two paths' row sets diverge."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_nullseg_"),
    )
    spark.range(300).selectExpr(
        "CASE WHEN id % 3 = 0 THEN 'hb' "
        "WHEN id % 3 = 1 THEN 'a' ELSE 'b' END AS seg",
        # the 'hb' heartbeat segment carries no keys at all
        "CASE WHEN id % 3 = 0 THEN CAST(NULL AS BIGINT) "
        "ELSE CAST(id % 20 AS BIGINT) END AS k",
        "timestampadd(HOUR, CAST(id % 24 AS INT), "
        "TIMESTAMP '2024-01-01 00:00:00') AS ts",
    ).createOrReplaceTempView("nullseg")
    e.catalog.upsert_table_stats("nullseg", 300)
    raw = e.segment_overlap("nullseg", "seg", "k")
    e.create_rollup("nullseg", "ts", "1 day", dims=["seg"],
                    theta_cols=["k"])
    routed = e.segment_overlap("nullseg", "seg", "k")
    assert routed["source"] == "rollup_state"
    raw_rows = [tuple(x) for x in raw["df"].collect()]
    routed_rows = [tuple(x) for x in routed["df"].collect()]
    assert routed_rows == raw_rows
    assert all("hb" not in (r[0], r[1]) for r in routed_rows)


def test_overlap_reason_never_claims_unrecorded_shape(spark):
    """Review fix (round 10): a typo'd time_col records nothing — the
    reason string must not claim it did."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_typo_"),
        data_dir="/root/testdata/sf0.001",
    )
    r = e.segment_overlap("events", "event_type", "user_id",
                          time_col="tss")  # typo
    assert r["source"] == "raw_scan"
    assert "shape recorded" not in r["reason"], r
    assert e.recommend_rollups() == []


def test_overlap_staleness_and_refresh_loop(spark):
    """The overlap route honors the same freshness contract as every
    state endpoint: an out-of-band append makes the theta rollup stale
    (raw fallback, never stale numbers), refresh_rollup repairs it, and
    the routed answer reflects the appended keys exactly."""
    from pyspark.sql import functions as F

    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_overlap_fresh_"),
    )

    def mk(n):
        return spark.range(n).selectExpr(
            "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS seg",
            "CAST(id % 30 AS BIGINT) AS k",
            "timestampadd(HOUR, CAST(id % 48 AS INT), "
            "TIMESTAMP '2024-01-01 00:00:00') AS ts",
        )

    mk(600).createOrReplaceTempView("ovfresh")
    e.catalog.upsert_table_stats("ovfresh", 600)
    e.create_rollup("ovfresh", "ts", "1 day", dims=["seg"],
                    theta_cols=["k"])
    assert e.segment_overlap("ovfresh", "seg", "k")["source"] == (
        "rollup_state"
    )
    # out-of-band append: 100 new rows, 10 NEW keys (30..39), all on a
    # LATER day so the incremental tail refresh path applies
    mk(600).unionByName(
        spark.range(100).selectExpr(
            "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS seg",
            "CAST(30 + id % 10 AS BIGINT) AS k",
            "timestampadd(HOUR, CAST(id % 24 AS INT) + 72, "
            "TIMESTAMP '2024-01-01 00:00:00') AS ts",
        )
    ).createOrReplaceTempView("ovfresh")
    e.catalog.upsert_table_stats("ovfresh", 700)
    stale = e.segment_overlap("ovfresh", "seg", "k", time_col="ts")
    assert stale["source"] == "raw_scan", stale  # stale state never serves
    e.refresh_rollup("ovfresh")
    routed = e.segment_overlap("ovfresh", "seg", "k")
    assert routed["source"] == "rollup_state", routed
    row = routed["df"].collect()[0]
    # exact below 2^lgk: id%2 × id%30 gives each segment 15 original
    # keys (even/odd halves of 0..29) and the append adds 5 more
    # (even/odd halves of 30..39) — 20 each, reflecting the append
    assert (row["distinct_a"], row["distinct_b"]) == (20, 20)
    assert [tuple(x) for x in routed["df"].collect()] == [
        tuple(x) for x in stale["df"].collect()
    ]


def test_windowed_overlap_multi_clock_requires_time_col(spark):
    """Second-pass review fix: with serving rollups on TWO different
    clocks, a bounded call naming no time_col is ambiguous — refuse
    loudly instead of letting state freshness decide which column the
    window filters. One clock (unambiguous) still serves; naming the
    clock always disambiguates."""
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_multiclock_"),
    )
    spark.range(1000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS seg",
        "CAST(id % 30 AS BIGINT) AS k",
        "timestampadd(HOUR, CAST(id % 48 AS INT), "
        "TIMESTAMP '2024-01-01 00:00:00') AS ts",
        "timestampadd(HOUR, CAST(id % 48 AS INT) + 48, "
        "TIMESTAMP '2024-01-01 00:00:00') AS ingest_ts",
    ).createOrReplaceTempView("mclock")
    e.catalog.upsert_table_stats("mclock", 1000)
    e.create_rollup("mclock", "ts", "1 day", dims=["seg"],
                    theta_cols=["k"])
    lo, hi = "2024-01-01 00:00:00", "2024-01-02 00:00:00"
    # one clock: unambiguous, serves without naming it
    assert e.segment_overlap("mclock", "seg", "k", lo=lo, hi=hi)[
        "source"
    ] == "rollup_state"
    # a different bucket so the rollup NAME differs (one name per
    # (table, bucket)) and both clock rollups coexist
    e.create_rollup("mclock", "ingest_ts", "1 hour", dims=["seg"],
                    theta_cols=["k"])
    with pytest.raises(ValueError, match="ambiguous"):
        e.segment_overlap("mclock", "seg", "k", lo=lo, hi=hi)
    # naming the clock disambiguates
    assert e.segment_overlap(
        "mclock", "seg", "k", time_col="ts", lo=lo, hi=hi
    )["source"] == "rollup_state"
    # unwindowed calls involve no clock at all — still unambiguous
    assert e.segment_overlap("mclock", "seg", "k")["source"] == (
        "rollup_state"
    )


def test_bound_grammar_edges(spark):
    """Second-pass review fixes: ISO-8601 short/offset forms Spark's
    cast accepts must pass the raw-path bound guard, and a
    calendar-invalid literal is unparseable (None from the advice
    parser, ValueError from the guard) rather than a strptime escape."""
    from approximate_query_engine_spark.engine import (
        _overlap_advice_bucket,
        _parse_overlap_bound,
        _require_ts_bound,
    )

    assert _parse_overlap_bound("2024-02-30") is None  # invalid calendar
    assert _overlap_advice_bucket("2024-02-30") is None
    _require_ts_bound("lo", "2024-01-02 00:00")  # minute precision: ok
    _require_ts_bound("lo", "2024-01-02T00:00:00+00:00")  # offset: ok
    with pytest.raises(ValueError, match="timestamp literal"):
        _require_ts_bound("lo", "2024-02-30")
    # end-to-end: a calendar-invalid bound raises cleanly, it doesn't
    # escape from the best-effort advice bookkeeping
    e = AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_boundedge_"),
        data_dir="/root/testdata/sf0.001",
    )
    with pytest.raises(ValueError, match="timestamp literal"):
        e.segment_overlap(
            "events", "event_type", "user_id", time_col="ts",
            lo="2024-02-30", hi="2024-03-02",
        )
    # a minute-precision bound is served (raw path, advice skipped —
    # the literal is off the rollup grammar but the window is honored)
    r = e.segment_overlap(
        "events", "event_type", "user_id", time_col="ts",
        lo="2024-01-02 00:00", hi="2024-01-05 00:00",
    )
    assert r["source"] == "raw_scan"
    assert r["df"].count() > 0


def test_theta_lgk_above_default_unions_at_state_nominal(spark):
    """Regression: theta_union_agg's function default (lg_k 12) silently
    DOWNSAMPLES state built at a larger nominal — 10k distinct keys
    sketched at lg_k 14 are exact-mode, but a default union retained
    ~4096 entries and estimated 9890 (observed), contradicting the
    routed path's exactness contract. Every union site must pass the
    rollup's own theta_lgk."""
    import tempfile

    from pyspark.sql import functions as F

    from approximate_query_engine_spark import AQEngine

    # segments x: keys 0..9999, y: keys 5000..11999 — 12k distinct total
    # (2^12 < 12k < 2^14), truth: |x∩y| = 5000, |x∪y| = 12000
    base = spark.range(12000).select(F.col("id").alias("u"))
    rows = base.where("u < 10000").selectExpr("u", "'x' AS s").unionAll(
        base.where("u >= 5000").selectExpr("u", "'y' AS s")
    ).selectExpr(
        "CAST(u AS BIGINT) AS u", "s",
        "timestampadd(SECOND, CAST((u * 37) % 172800 AS INT), "
        "TIMESTAMP '2024-01-01 00:00:00') AS ts",
    )
    rows.createOrReplaceTempView("seg14")
    e = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_lgk14_"))
    e.create_rollup(
        "seg14", "ts", "1 hour", dims=["s"], theta_cols=["u"],
        theta_lgk=14,
    )
    r = e.segment_overlap("seg14", "s", "u")
    assert r["source"] == "rollup_state", r
    out = {
        (x["seg_a"], x["seg_b"]): x for x in (
            row.asDict() for row in r["df"].collect()
        )
    }
    pair = out[("x", "y")]
    # exact, not the ~1%-off estimates a default-lg_k union produced
    assert pair["overlap_cnt"] == 5000, pair
    assert pair["union_cnt"] == 12000, pair
    assert pair["distinct_a"] == 10000 and pair["distinct_b"] == 7000, pair
