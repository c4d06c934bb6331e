"""Round 11 (VERDICT r10 #3): segment overlap through the SQL surface.

The two canonical overlap idioms (sqlparser.parse_overlap) route to
materialized theta rollup state (engine._route_overlap_sql) under honest
gates, unrouted hits feed the theta advisor, and everything outside the
idioms stays exact pass-through. Reference parity: the reference has no
set-algebra surface at all; this extends the q96/q100/q108 engine-API
family to the SQL text a BI user actually writes.
"""

import tempfile

import pytest

from approximate_query_engine_spark import AQEngine
from approximate_query_engine_spark.sqlparser import try_parse_overlap

SELF_JOIN = (
    "SELECT COUNT(DISTINCT a.user_id) AS oc FROM events a "
    "JOIN events b ON a.user_id = b.user_id "
    "WHERE a.event_type = 'click' AND b.event_type = 'view'"
)
INTERSECT = (
    "SELECT COUNT(*) AS oc FROM ("
    "SELECT user_id FROM events WHERE event_type = 'click' "
    "INTERSECT "
    "SELECT user_id FROM events WHERE event_type = 'view') t"
)
INTERSECT_CTE = (
    "WITH ca AS (SELECT DISTINCT user_id FROM events "
    "            WHERE event_type = 'click'), "
    "cb AS (SELECT DISTINCT user_id FROM events "
    "       WHERE event_type = 'view') "
    "SELECT COUNT(*) AS oc "
    "FROM (SELECT * FROM ca INTERSECT SELECT * FROM cb) t"
)


# ---------------------------------------------------------------------------
# parser


def test_parse_self_join_idiom():
    ov = try_parse_overlap(SELF_JOIN)
    assert ov is not None and ov.idiom == "self_join"
    assert (ov.table, ov.key_col, ov.segment_col) == (
        "events", "user_id", "event_type",
    )
    assert {ov.lit_a, ov.lit_b} == {"'click'", "'view'"}
    assert ov.alias == "oc"


def test_parse_intersect_idioms():
    for sql in (INTERSECT, INTERSECT_CTE):
        ov = try_parse_overlap(sql)
        assert ov is not None and ov.idiom == "intersect", sql
        assert (ov.table, ov.key_col, ov.segment_col) == (
            "events", "user_id", "event_type",
        )


def test_parse_accepts_reversed_count_side_and_numeric_literals():
    ov = try_parse_overlap(
        "SELECT COUNT(DISTINCT b.uid) AS c FROM t x JOIN t b "
        "ON b.uid = x.uid WHERE x.seg = 1 AND b.seg = 2"
    )
    assert ov is not None and {ov.lit_a, ov.lit_b} == {"1", "2"}


@pytest.mark.parametrize(
    "bad",
    [
        # no alias on the count (routing needs a stable output name)
        "SELECT COUNT(DISTINCT a.u) FROM t a JOIN t b ON a.u = b.u "
        "WHERE a.s = 'x' AND b.s = 'y'",
        # different tables
        "SELECT COUNT(DISTINCT a.u) AS c FROM t a JOIN t2 b ON a.u = b.u "
        "WHERE a.s = 'x' AND b.s = 'y'",
        # outer-join variant
        "SELECT COUNT(DISTINCT a.u) AS c FROM t a LEFT JOIN t b ON a.u = b.u "
        "WHERE a.s = 'x' AND b.s = 'y'",
        # extra conjunct beyond the two segment predicates
        "SELECT COUNT(DISTINCT a.u) AS c FROM t a JOIN t b ON a.u = b.u "
        "WHERE a.s = 'x' AND b.s = 'y' AND a.v > 3",
        # counts a column other than the join key
        "SELECT COUNT(DISTINCT a.v) AS c FROM t a JOIN t b ON a.u = b.u "
        "WHERE a.s = 'x' AND b.s = 'y'",
        # ON equates different columns
        "SELECT COUNT(DISTINCT a.u) AS c FROM t a JOIN t b ON a.u = b.w "
        "WHERE a.s = 'x' AND b.s = 'y'",
        # both predicates on the same alias
        "SELECT COUNT(DISTINCT a.u) AS c FROM t a JOIN t b ON a.u = b.u "
        "WHERE a.s = 'x' AND a.s = 'y'",
        # different segment columns across the two sides
        "SELECT COUNT(DISTINCT a.u) AS c FROM t a JOIN t b ON a.u = b.u "
        "WHERE a.s1 = 'x' AND b.s2 = 'y'",
        # bag semantics is NOT a distinct overlap
        "SELECT COUNT(*) AS c FROM (SELECT u FROM t WHERE s = 'x' "
        "INTERSECT ALL SELECT u FROM t WHERE s = 'y')",
        # INTERSECT across different tables
        "SELECT COUNT(*) AS c FROM (SELECT u FROM t WHERE s = 'x' "
        "INTERSECT SELECT u FROM t2 WHERE s = 'y')",
        # plain aggregates are not overlaps
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
        "GROUP BY l_returnflag",
        # GROUP BY on the self-join shape
        "SELECT COUNT(DISTINCT a.u) AS c FROM t a JOIN t b ON a.u = b.u "
        "WHERE a.s = 'x' AND b.s = 'y' GROUP BY a.s",
        # predicates hidden inside string literals must not parse
        "SELECT note FROM t WHERE note = 'a JOIN b ON x = y'",
    ],
)
def test_parse_rejects_near_misses(bad):
    assert try_parse_overlap(bad) is None, bad


# ---------------------------------------------------------------------------
# engine routing


def _engine(spark):
    return AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_ovsql_"),
        data_dir="/root/testdata/sf0.001",
    )


def _exact(spark, sql):
    return spark.sql(sql).collect()[0]["oc"]


def test_overlap_sql_routes_and_matches_exact(spark):
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e.analyze_table("events", ["user_id"])  # null-proof for INTERSECT
    for sql in (SELF_JOIN, INTERSECT, INTERSECT_CTE):
        r = e.query(sql, dual_execute=False)
        assert r["status"] == "ok", r.get("error")
        assert r["plan"]["type"] == "sketch", (sql, r["plan"])
        assert "theta state" in r["plan"]["reason"], r["plan"]
        assert r["result"][0]["oc"] == _exact(spark, sql), sql


def test_overlap_sql_requires_segment_dim(spark):
    """Theta state without the segment as a dim cannot slice per
    segment — exact pass-through, never a guess from unservable state."""
    e = _engine(spark)
    e.create_rollup("events", "ts", "1 day", dims=[], theta_cols=["user_id"])
    r = e.query(SELF_JOIN, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, SELF_JOIN)


def test_overlap_sql_tolerance_gate_and_exact_regime(spark):
    """Tolerance below 2x the theta rse declines — unless FRESH catalog
    stats prove the key's ndv fits the nominal budget, in which case the
    sketches never sampled and the route is exact regardless of the
    tolerance knob."""
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    r = e.query(SELF_JOIN, max_rel_error=0.001, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]  # gate declines
    e.analyze_table("events", ["user_id"])  # ndv 15 << 2^12, fresh
    r = e.query(SELF_JOIN, max_rel_error=0.001, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert "exact regime" in r["plan"]["reason"], r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, SELF_JOIN)


def test_overlap_sql_prefer_exact_declines(spark):
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    r = e.query(SELF_JOIN, prefer_exact=True, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]


def test_intersect_idiom_needs_null_free_proof(spark):
    """SQL INTERSECT counts a NULL-in-both row sketches can never see:
    without fresh analyzed null_frac == 0 on the key the idiom stays
    exact; the self-join idiom (whose semantics already drop NULLs)
    routes under the same state."""
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    assert e.query(INTERSECT, dual_execute=False)["plan"]["type"] == "exact"
    assert (
        e.query(SELF_JOIN, dual_execute=False)["plan"]["type"] == "sketch"
    )
    e.analyze_table("events", ["user_id"])
    r = e.query(INTERSECT, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, INTERSECT)


def test_unrouted_overlap_sql_feeds_theta_advisor(spark):
    """The SQL side of the q108 loop: three unrouted idiom hits record
    ONE (dims=[segment], theta_cols=[key]) shape with the clock inferred
    from the schema; apply materializes; the same SQL then routes."""
    e = _engine(spark)
    for sql in (SELF_JOIN, INTERSECT, INTERSECT_CTE):
        r = e.query(sql, dual_execute=False)
        assert r["plan"]["type"] == "exact", r["plan"]
    book = list(e.catalog.rollup_candidates.values())
    assert len(book) == 1 and book[0]["count"] == 3, book
    assert book[0]["time_col"] == "ts", book  # inferred (r10 #4)
    assert book[0]["theta_cols"] == ["user_id"], book
    assert book[0]["dims"] == ["event_type"], book
    applied = e.apply_rollup_advice(max_apply=1)
    assert applied and applied[0]["applied"] is True, applied
    r = e.query(SELF_JOIN, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert "theta state" in r["plan"]["reason"], r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, SELF_JOIN)


def test_stale_rollup_declines_and_rerecords(spark):
    """Freshness contract: an append that outdates the serving rollup
    sends the idiom back to exact pass-through (stale state must never
    answer) and the miss re-enters the observation book."""
    spark.table("events").createOrReplaceTempView("events_ovst")
    e = _engine(spark)
    n = spark.table("events_ovst").count()
    e.catalog.upsert_table_stats("events_ovst", n)
    e.create_rollup(
        "events_ovst", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    sql = SELF_JOIN.replace("events ", "events_ovst ")
    assert e.query(sql, dual_execute=False)["plan"]["type"] == "sketch"
    e.catalog.upsert_table_stats("events_ovst", n + 1)  # out-of-band append
    r = e.query(sql, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]
    assert list(e.catalog.rollup_candidates.values()), "miss not recorded"
