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


def test_parse_dispatch_is_token_aware():
    """A column named `intersects` (or a literal containing INTERSECT /
    JOIN text) must not misroute the self-join idiom into the INTERSECT
    parser — dispatch runs on word boundaries over a literal-masked
    copy."""
    ov = try_parse_overlap(
        "SELECT COUNT(DISTINCT a.u) AS c FROM t a JOIN t b ON a.u = b.u "
        "WHERE a.intersects = 'x' AND b.intersects = 'y'"
    )
    assert ov is not None and ov.segment_col == "intersects"
    ov = try_parse_overlap(
        "SELECT COUNT(DISTINCT a.u) AS c FROM t a JOIN t b ON a.u = b.u "
        "WHERE a.s = 'INTERSECT ME' AND b.s = 'WITH GUSTO'"
    )
    assert ov is not None and ov.lit_a == "'INTERSECT ME'"


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


def test_overlap_sql_requires_exact_regime_proof(spark):
    """The SQL route is EXACT-REGIME ONLY: query()'s max_rel_error
    bounds VALUE-relative error, but a theta intersection's error is
    union-relative — a small overlap of two huge segments could be off
    by orders of magnitude under any tolerance. So with no fresh
    analyzed ndv the route declines at EVERY tolerance; once fresh
    stats prove the key fits the nominal budget (sketches never
    sampled), it routes even at a 0.1% tolerance, exactly."""
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    for tol in (0.001, 0.05, 0.5):
        r = e.query(SELF_JOIN, max_rel_error=tol, dual_execute=False)
        assert r["plan"]["type"] == "exact", (tol, r["plan"])
    e.analyze_table("events", ["user_id"])  # ndv 15 << 2^12, fresh
    r = e.query(SELF_JOIN, max_rel_error=0.001, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert "exact regime" in r["plan"]["reason"], r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, SELF_JOIN)


def test_overlap_sql_stale_stats_never_certify(spark):
    """The exact-regime proof dies with stats freshness: an append
    after the analyze pass makes the recorded ndv stale in the
    certifying direction, so the route declines until re-analyzed."""
    spark.table("events").createOrReplaceTempView("events_ovfr")
    e = _engine(spark)
    n = spark.table("events_ovfr").count()
    e.catalog.upsert_table_stats("events_ovfr", n)
    e.create_rollup(
        "events_ovfr", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e.analyze_table("events_ovfr", ["user_id"])
    sql = SELF_JOIN.replace("events ", "events_ovfr ")
    assert e.query(sql, dual_execute=False)["plan"]["type"] == "sketch"
    # out-of-band append: stats now describe a smaller table. The
    # rollup is stale too — but even a refreshed rollup must not route
    # on pre-append ndv, which is what _stats_fresh pins.
    e.catalog.upsert_table_stats("events_ovfr", n + 10)
    r = e.query(sql, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]


def test_overlap_sql_prefer_exact_declines(spark):
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e.analyze_table("events", ["user_id"])  # exact regime provable...
    r = e.query(SELF_JOIN, prefer_exact=True, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]  # ...but caller said raw


def test_overlap_sql_case_insensitive_columns(spark):
    """Spark resolves identifiers case-insensitively; the route and the
    advisor book must too. A case-variant spelling routes through the
    same rollup, and an unrouted case-variant records the SAME
    canonical shape instead of a duplicate candidate."""
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e.analyze_table("events", ["user_id"])
    shouty = (
        "SELECT COUNT(DISTINCT a.USER_ID) AS oc FROM events a "
        "JOIN events b ON a.USER_ID = b.USER_ID "
        "WHERE a.EVENT_TYPE = 'click' AND b.EVENT_TYPE = 'view'"
    )
    r = e.query(shouty, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, SELF_JOIN)
    # unrouted case variants dedupe into one canonical candidate
    e2 = _engine(spark)
    e2.query(SELF_JOIN, dual_execute=False)
    e2.query(shouty, dual_execute=False)
    book = list(e2.catalog.rollup_candidates.values())
    assert len(book) == 1 and book[0]["count"] == 2, book
    assert book[0]["dims"] == ["event_type"], book
    assert book[0]["theta_cols"] == ["user_id"], book


def test_intersect_idiom_needs_null_free_proof(spark):
    """SQL INTERSECT counts a NULL-in-both row sketches can never see:
    on a key column WITH nulls, fresh stats prove null_frac > 0 and the
    INTERSECT idiom declines; the self-join idiom (whose semantics
    already drop NULLs) routes under the same state, exactly."""
    spark.sql(
        "SELECT event_id, ts, event_type, "
        "CASE WHEN event_id % 7 = 0 THEN NULL ELSE user_id END AS ukey "
        "FROM events"
    ).createOrReplaceTempView("events_ovnull")
    e = _engine(spark)
    n = spark.table("events_ovnull").count()
    e.catalog.upsert_table_stats("events_ovnull", n)
    e.create_rollup(
        "events_ovnull", "ts", "1 day", dims=["event_type"],
        theta_cols=["ukey"],
    )
    e.analyze_table("events_ovnull", ["ukey"])  # fresh, null_frac > 0
    isql = (
        "SELECT COUNT(*) AS oc FROM ("
        "SELECT ukey FROM events_ovnull WHERE event_type = 'click' "
        "INTERSECT "
        "SELECT ukey FROM events_ovnull WHERE event_type = 'view') t"
    )
    jsql = (
        "SELECT COUNT(DISTINCT a.ukey) AS oc FROM events_ovnull a "
        "JOIN events_ovnull b ON a.ukey = b.ukey "
        "WHERE a.event_type = 'click' AND b.event_type = 'view'"
    )
    r = e.query(isql, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]  # nulls: declined
    r = e.query(jsql, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]  # NULLs never join
    assert r["result"][0]["oc"] == _exact(spark, jsql)
    # and on a proven null-free key the INTERSECT idiom routes exactly
    e2 = _engine(spark)
    e2.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e2.analyze_table("events", ["user_id"])
    r = e2.query(INTERSECT, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, INTERSECT)


def test_unrouted_overlap_sql_feeds_theta_advisor(spark):
    """The SQL side of the q108 loop: three unrouted idiom hits record
    ONE (dims=[segment], theta_cols=[key]) shape with the clock inferred
    from the schema; apply materializes; the same SQL then routes (once
    fresh stats prove the exact regime)."""
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
    e.analyze_table("events", ["user_id"])  # exact-regime proof
    r = e.query(SELF_JOIN, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert "theta state" in r["plan"]["reason"], r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, SELF_JOIN)


WINDOWED = (
    "SELECT COUNT(DISTINCT a.user_id) AS oc FROM events a "
    "JOIN events b ON a.user_id = b.user_id "
    "WHERE a.event_type = 'click' AND b.event_type = 'view' "
    "AND a.ts >= TIMESTAMP '2024-01-02 00:00:00' "
    "AND a.ts < TIMESTAMP '2024-01-05 00:00:00' "
    "AND b.ts >= TIMESTAMP '2024-01-02 00:00:00' "
    "AND b.ts < TIMESTAMP '2024-01-05 00:00:00'"
)


def test_parse_windowed_idioms_and_symmetry():
    ov = try_parse_overlap(WINDOWED)
    assert ov is not None and ov.idiom == "self_join"
    assert (ov.time_col, ov.lo, ov.hi) == (
        "ts", "2024-01-02 00:00:00", "2024-01-05 00:00:00",
    )
    wi = try_parse_overlap(
        "SELECT COUNT(*) AS oc FROM ("
        "SELECT user_id FROM events WHERE event_type = 'click' "
        "AND ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00' "
        "INTERSECT "
        "SELECT user_id FROM events WHERE event_type = 'view' "
        "AND ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00') t"
    )
    assert wi is not None and wi.lo == "2024-01-02 00:00:00"
    # asymmetric windows are a DIFFERENT question — rejected
    for bad in (
        # bounds on one alias only
        WINDOWED.replace(
            "AND b.ts >= TIMESTAMP '2024-01-02 00:00:00' "
            "AND b.ts < TIMESTAMP '2024-01-05 00:00:00'",
            "",
        ),
        # differing bounds across aliases
        WINDOWED.replace(
            "b.ts < TIMESTAMP '2024-01-05 00:00:00'",
            "b.ts < TIMESTAMP '2024-01-06 00:00:00'",
        ),
        # a lone lower bound
        WINDOWED.replace(
            "AND a.ts < TIMESTAMP '2024-01-05 00:00:00'", ""
        ),
    ):
        assert try_parse_overlap(bad) is None, bad


def test_windowed_overlap_routes_pruned_and_matches_exact(spark):
    """The dashboard form: symmetric ts bounds route through the
    serving rollup's p_date-pruned state when they fall on its grid;
    off-grid bounds fall through to exact."""
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e.analyze_table("events", ["user_id"])
    r = e.query(WINDOWED, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert "p_date-pruned" in r["plan"]["reason"], r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, WINDOWED)
    off_grid = WINDOWED.replace("2024-01-02 00:00:00", "2024-01-02 00:30:00")
    r = e.query(off_grid, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, off_grid)


def test_windowed_overlap_wrong_clock_declines(spark):
    """A rollup bucketed on a DIFFERENT clock must not serve a windowed
    overlap — bounding through it would filter the wrong column."""
    spark.sql(
        "SELECT user_id, event_type, ts, "
        "ts + INTERVAL 2 DAYS AS ingested_ts FROM events"
    ).createOrReplaceTempView("events_ovck")
    e = _engine(spark)
    n = spark.table("events_ovck").count()
    e.catalog.upsert_table_stats("events_ovck", n)
    e.create_rollup(
        "events_ovck", "ingested_ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e.analyze_table("events_ovck", ["user_id"])
    sql = WINDOWED.replace("events ", "events_ovck ")
    r = e.query(sql, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]
    # the unwindowed form serves fine from the same state
    usql = SELF_JOIN.replace("events ", "events_ovck ")
    assert e.query(usql, dual_execute=False)["plan"]["type"] == "sketch"


W1 = (
    "ts >= TIMESTAMP '2024-01-01 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-04 00:00:00'"
)
W2 = (
    "ts >= TIMESTAMP '2024-01-04 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-07 00:00:00'"
)
RETURNING = (
    f"SELECT COUNT(*) AS oc FROM (SELECT user_id FROM events WHERE {W1} "
    f"INTERSECT SELECT user_id FROM events WHERE {W2}) t"
)
CHURNED = (
    f"SELECT COUNT(*) AS oc FROM (SELECT user_id FROM events WHERE {W1} "
    f"EXCEPT SELECT user_id FROM events WHERE {W2}) t"
)


def test_parse_audience_setop_idioms():
    """Unsegmented per-branch-windowed set-ops: INTERSECT = returning,
    EXCEPT = churned (branch order preserved); cross-period SEGMENTED
    branches parse too; the identity question (no segment, no windows)
    and mixed segmented/unsegmented sides are rejected."""
    ov = try_parse_overlap(RETURNING)
    assert ov is not None and (ov.set_op, ov.segment_col) == (
        "intersect", None,
    )
    assert (ov.lo, ov.lo_b) == (
        "2024-01-01 00:00:00", "2024-01-04 00:00:00",
    )
    ch = try_parse_overlap(CHURNED)
    assert ch is not None and ch.set_op == "except"
    xseg = try_parse_overlap(
        "SELECT COUNT(*) AS oc FROM ("
        f"SELECT user_id FROM events WHERE event_type = 'click' AND {W1} "
        "INTERSECT "
        f"SELECT user_id FROM events WHERE event_type = 'view' AND {W2}"
        ") t"
    )
    assert xseg is not None and xseg.segment_col == "event_type"
    assert (xseg.lo, xseg.lo_b) == (
        "2024-01-01 00:00:00", "2024-01-04 00:00:00",
    )
    for bad in (
        # identity question: no segment, no windows
        "SELECT COUNT(*) AS c FROM (SELECT u FROM t "
        "INTERSECT SELECT u FROM t) x",
        # mixed segmented / unsegmented sides
        f"SELECT COUNT(*) AS c FROM (SELECT u FROM t WHERE s = 'x' "
        f"INTERSECT SELECT u FROM t WHERE {W1}) x",
        # bag semantics
        f"SELECT COUNT(*) AS c FROM (SELECT u FROM t WHERE {W1} "
        f"EXCEPT ALL SELECT u FROM t WHERE {W2}) x",
        # half-open branch window
        "SELECT COUNT(*) AS c FROM (SELECT u FROM t "
        "WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' "
        "INTERSECT SELECT u FROM t WHERE s = 'y') x",
    ):
        assert try_parse_overlap(bad) is None, bad


def test_audience_setops_route_and_match_exact(spark):
    """returning/churned answer from two p_date-pruned state unions,
    intersected/differenced sketch-side — exactly, under the same
    exact-regime + null-free proofs; the cross-period segmented form
    routes through the same state."""
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e.analyze_table("events", ["user_id"])
    xseg = (
        "SELECT COUNT(*) AS oc FROM ("
        f"SELECT user_id FROM events WHERE event_type = 'click' AND {W1} "
        "INTERSECT "
        f"SELECT user_id FROM events WHERE event_type = 'view' AND {W2}"
        ") t"
    )
    for sql in (RETURNING, CHURNED, xseg):
        r = e.query(sql, dual_execute=False)
        assert r["plan"]["type"] == "sketch", (sql, r["plan"])
        assert "p_date-pruned" in r["plan"]["reason"], r["plan"]
        assert r["result"][0]["oc"] == _exact(spark, sql), sql
    # EXCEPT against a segment absent from state: A \ empty = |A|,
    # not NULL — the CASE arm must reproduce exact set semantics
    ghost = (
        "SELECT COUNT(*) AS oc FROM ("
        "SELECT user_id FROM events WHERE event_type = 'click' "
        "EXCEPT "
        "SELECT user_id FROM events WHERE event_type = 'ghost') t"
    )
    r = e.query(ghost, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, ghost)


def test_unsegmented_audience_records_dimless_shape(spark):
    """An unrouted audience set-op records a (dims=[], theta_cols=[key])
    candidate — the advisor can materialize a dimension-less theta
    rollup for pure period-over-period workloads."""
    e = _engine(spark)
    for _ in range(3):
        r = e.query(RETURNING, dual_execute=False)
        assert r["plan"]["type"] == "exact", r["plan"]
    book = list(e.catalog.rollup_candidates.values())
    assert len(book) == 1 and book[0]["count"] == 3, book
    assert book[0]["dims"] == [], book
    assert book[0]["theta_cols"] == ["user_id"], book
    applied = e.apply_rollup_advice(max_apply=1)
    assert applied and applied[0]["applied"] is True, applied
    e.analyze_table("events", ["user_id"])
    r = e.query(RETURNING, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, RETURNING)


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
    e.analyze_table("events_ovst", ["user_id"])
    sql = SELF_JOIN.replace("events ", "events_ovst ")
    assert e.query(sql, dual_execute=False)["plan"]["type"] == "sketch"
    e.catalog.upsert_table_stats("events_ovst", n + 1)  # out-of-band append
    r = e.query(sql, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]
    assert list(e.catalog.rollup_candidates.values()), "miss not recorded"


def test_overlap_sql_case_insensitive_table(spark):
    """The TABLE spelling is catalog currency too: 'FROM EVENTS' must
    find the rollup registered under 'events' (Spark resolves tables
    case-insensitively; catalog dicts do not), and an unrouted
    case-variant table must merge into the same advisor candidate
    instead of splitting the observation book."""
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e.analyze_table("events", ["user_id"])
    shouty = (
        "SELECT COUNT(DISTINCT a.user_id) AS oc FROM EVENTS a "
        "JOIN EVENTS b ON a.user_id = b.user_id "
        "WHERE a.event_type = 'click' AND b.event_type = 'view'"
    )
    r = e.query(shouty, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, SELF_JOIN)
    # unrouted: the case-variant table merges into ONE candidate once
    # the catalog knows the canonical spelling (stats record it here)
    e2 = _engine(spark)
    e2.analyze_table("events", ["user_id"])
    e2.query(SELF_JOIN, dual_execute=False)
    e2.query(shouty, dual_execute=False)
    book = list(e2.catalog.rollup_candidates.values())
    assert len(book) == 1 and book[0]["count"] == 2, book
    assert book[0]["table"] == "events", book


# ---------------------------------------------------------------------------
# round 12 (VERDICT r11 #2): the UNION arm — "either segment" reach

UNION_CTE = (
    "WITH ca AS (SELECT DISTINCT user_id FROM events "
    "            WHERE event_type = 'click'), "
    "cb AS (SELECT DISTINCT user_id FROM events "
    "       WHERE event_type = 'view') "
    "SELECT COUNT(*) AS oc "
    "FROM (SELECT * FROM ca UNION SELECT * FROM cb) t"
)
UNION_INLINE = (
    "SELECT COUNT(*) AS oc FROM ("
    "SELECT user_id FROM events WHERE event_type = 'click' "
    "UNION "
    "SELECT user_id FROM events WHERE event_type = 'view') t"
)
SEG_IN = (
    "SELECT COUNT(DISTINCT user_id) AS oc FROM events "
    "WHERE event_type IN ('click', 'view')"
)


def test_parse_union_idioms():
    for sql in (UNION_CTE, UNION_INLINE):
        ov = try_parse_overlap(sql)
        assert ov is not None and ov.set_op == "union", sql
        assert ov.idiom == "intersect"
        assert {ov.lit_a, ov.lit_b} == {"'click'", "'view'"}
    ov = try_parse_overlap(SEG_IN)
    assert ov is not None and (ov.idiom, ov.set_op) == ("seg_in", "union")
    assert (ov.table, ov.key_col, ov.segment_col) == (
        "events", "user_id", "event_type",
    )
    assert (ov.lit_a, ov.lit_b) == ("'click'", "'view'")
    # windowed seg_in: one >=/< pair applying to BOTH branches
    w = (
        "SELECT COUNT(DISTINCT user_id) AS oc FROM events "
        "WHERE event_type IN ('click', 'view') "
        "AND ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00'"
    )
    ov = try_parse_overlap(w)
    assert ov is not None and ov.time_col == "ts"
    assert (ov.lo, ov.hi) == (ov.lo_b, ov.hi_b)
    # N-ary reach: all literals carried in written order
    ov = try_parse_overlap(
        "SELECT COUNT(DISTINCT user_id) AS oc FROM events "
        "WHERE event_type IN ('a', 'b', 'c')"
    )
    assert ov is not None and ov.lits == ("'a'", "'b'", "'c'"), ov
    # near-misses stay unparsed: bag semantics, 1-element IN, key==seg,
    # ordinary IN filters with a non-count projection
    for bad in (
        UNION_INLINE.replace("UNION", "UNION ALL"),
        "SELECT COUNT(DISTINCT user_id) AS oc FROM events "
        "WHERE event_type IN ('a')",
        "SELECT COUNT(DISTINCT user_id) AS oc FROM events "
        "WHERE user_id IN (1, 2)",
        "SELECT event_id AS oc FROM events WHERE event_type IN ('a', 'b')",
    ):
        assert try_parse_overlap(bad) is None, bad


def test_union_idioms_route_and_match_exact(spark):
    """Both reach spellings answer from theta state — per-segment
    per-bucket unions combined with theta_union AT THE ROLLUP'S OWN
    lg_k — exactly, under the same exact-regime proof. The union with
    a segment absent from state is A ∪ empty = |A|, not NULL."""
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e.analyze_table("events", ["user_id"])
    for sql in (UNION_CTE, UNION_INLINE, SEG_IN):
        r = e.query(sql, dual_execute=False)
        assert r["status"] == "ok", r.get("error")
        assert r["plan"]["type"] == "sketch", (sql, r["plan"])
        assert "theta state" in r["plan"]["reason"], r["plan"]
        assert r["result"][0]["oc"] == _exact(spark, sql), sql
    ghost = (
        "SELECT COUNT(*) AS oc FROM ("
        "SELECT user_id FROM events WHERE event_type = 'click' "
        "UNION "
        "SELECT user_id FROM events WHERE event_type = 'ghost') t"
    )
    r = e.query(ghost, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, ghost)
    # windowed seg_in routes p_date-pruned and matches exact
    w = (
        "SELECT COUNT(DISTINCT user_id) AS oc FROM events "
        "WHERE event_type IN ('click', 'view') "
        "AND ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00'"
    )
    r = e.query(w, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert "p_date-pruned" in r["plan"]["reason"], r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, w)


def test_union_cte_needs_null_free_proof_but_seg_in_does_not(spark):
    """SQL UNION keeps a NULL key as one distinct row (verified against
    DuckDB), so the CTE spelling declines on a nullable key exactly
    like INTERSECT/EXCEPT; COUNT(DISTINCT ... IN (...)) IGNORES NULLs
    — theta_union's own semantics — so the seg_in spelling routes on
    the same nullable key and still matches exact."""
    spark.sql(
        "SELECT event_id, ts, event_type, "
        "CASE WHEN event_id % 7 = 0 THEN NULL ELSE user_id END AS ukey "
        "FROM events"
    ).createOrReplaceTempView("events_unull")
    e = _engine(spark)
    e.catalog.upsert_table_stats(
        "events_unull", spark.table("events_unull").count()
    )
    e.create_rollup(
        "events_unull", "ts", "1 day", dims=["event_type"],
        theta_cols=["ukey"],
    )
    e.analyze_table("events_unull", ["ukey"])  # fresh, null_frac > 0
    usql = (
        "SELECT COUNT(*) AS oc FROM ("
        "SELECT ukey FROM events_unull WHERE event_type = 'click' "
        "UNION "
        "SELECT ukey FROM events_unull WHERE event_type = 'view') t"
    )
    r = e.query(usql, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]  # NULL row: declined
    assert r["result"][0]["oc"] == _exact(spark, usql)
    insql = (
        "SELECT COUNT(DISTINCT ukey) AS oc FROM events_unull "
        "WHERE event_type IN ('click', 'view')"
    )
    r = e.query(insql, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]  # NULLs never counted
    assert r["result"][0]["oc"] == _exact(spark, insql)


def test_unrouted_union_feeds_theta_advisor(spark):
    """Unrouted reach hits record the same (dims=[segment],
    theta_cols=[key]) advisor shape as overlap hits — the one candidate
    serves intersect, except AND union questions once materialized."""
    e = _engine(spark)
    # NOTE: unlike the join/set-op idioms, seg_in is plain plannable SQL
    # — under a loose tolerance the planner would answer it with an HLL
    # estimate (honest, but not this test's subject). A tight tolerance
    # forces the unrouted phase exact.
    for _ in range(3):
        r = e.query(SEG_IN, dual_execute=False, max_rel_error=0.001)
        assert r["plan"]["type"] == "exact", r["plan"]
    book = list(e.catalog.rollup_candidates.values())
    assert len(book) == 1 and book[0]["count"] == 3, book
    assert book[0]["dims"] == ["event_type"], book
    assert book[0]["theta_cols"] == ["user_id"], book
    applied = e.apply_rollup_advice(max_apply=1)
    assert applied and applied[0]["applied"] is True, applied
    e.analyze_table("events", ["user_id"])
    r = e.query(SEG_IN, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, SEG_IN)


def test_nary_union_advice_grain_covers_every_branch(spark):
    """Round-13 review fix: the unrouted N-ary union records the grain
    EVERY branch's bounds fall on — a later hour-aligned branch must
    pull day-grain advice down to '1 hour' (a day rollup could never
    serve it: permanent useless build + re-advise loop), and an
    off-every-grid branch must suppress the advice entirely."""
    e = _engine(spark)

    def _b(seg, lo=None, hi=None):
        w = (
            f" AND ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}'"
            if lo
            else ""
        )
        return (
            f"SELECT user_id FROM events WHERE event_type = '{seg}'{w}"
        )

    mixed = (
        "SELECT COUNT(*) AS oc FROM ("
        + _b("click", "2024-01-01 00:00:00", "2024-01-05 00:00:00")
        + " UNION "
        + _b("view", "2024-01-05 06:00:00", "2024-01-06 18:00:00")
        + " UNION "
        + _b("purchase")
        + ") t"
    )
    for _ in range(3):
        r = e.query(mixed, dual_execute=False)
        assert r["plan"]["type"] == "exact", r["plan"]
    book = list(e.catalog.rollup_candidates.values())
    assert len(book) == 1, book
    assert book[0]["bucket"] == "1 hour", book  # NOT '1 day'
    # an off-grid branch (6:30) suppresses advice — nothing could serve
    e2 = _engine(spark)
    off = mixed.replace("06:00:00", "06:30:00")
    for _ in range(3):
        e2.query(off, dual_execute=False)
    assert list(e2.catalog.rollup_candidates.values()) == []


def test_nary_reach_routes_single_state_scan(spark):
    """3+ segments route as ONE theta_union_agg over state filtered to
    the whole IN-list — no per-branch subqueries — and match exact."""
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e.analyze_table("events", ["user_id"])
    sql3 = (
        "SELECT COUNT(DISTINCT user_id) AS oc FROM events "
        "WHERE event_type IN ('click', 'view', 'purchase')"
    )
    r = e.query(sql3, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert "3 segments unioned in ONE state scan" in r["plan"]["reason"]
    assert r["result"][0]["oc"] == _exact(spark, sql3)
    # windowed N-ary form: same single scan, p_date-pruned
    w3 = (
        sql3 + " AND ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00'"
    )
    r = e.query(w3, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert "p_date-pruned" in r["plan"]["reason"], r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, w3)
    # a ghost segment in the list never breaks A ∪ empty semantics
    g = (
        "SELECT COUNT(DISTINCT user_id) AS oc FROM events "
        "WHERE event_type IN ('click', 'ghost')"
    )
    r = e.query(g, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, g)


NARY_CTE = (
    "WITH ca AS (SELECT DISTINCT user_id FROM events "
    "            WHERE event_type = 'click'), "
    "cb AS (SELECT DISTINCT user_id FROM events "
    "       WHERE event_type = 'view'), "
    "cc AS (SELECT DISTINCT user_id FROM events "
    "       WHERE event_type = 'purchase') "
    "SELECT COUNT(*) AS oc FROM "
    "(SELECT * FROM ca UNION SELECT * FROM cb UNION SELECT * FROM cc) t"
)
NARY_INLINE = (
    "SELECT COUNT(*) AS oc FROM ("
    "SELECT user_id FROM events WHERE event_type = 'click' "
    "UNION "
    "SELECT user_id FROM events WHERE event_type = 'view' "
    "UNION "
    "SELECT user_id FROM events WHERE event_type = 'purchase') t"
)


def test_parse_nary_union_cte_chain():
    """Round 13 (VERDICT r12 #3): the set-op UNION arm is N-ary — a
    3-branch CTE chain or inline UNION parses with every branch's
    (literal, window) carried. Round 14 (VERDICT r13 #2): INTERSECT is
    associative too and parses N-ary; EXCEPT stays binary (an
    unparenthesized chain is order-dependent, hence ambiguous)."""
    for sql in (NARY_CTE, NARY_INLINE):
        ov = try_parse_overlap(sql)
        assert ov is not None and ov.set_op == "union", sql
        assert ov.branches is not None and len(ov.branches) == 3, sql
        assert [b[0] for b in ov.branches] == [
            "'click'", "'view'", "'purchase'"
        ], ov.branches
    # the same 3-branch chains spelled INTERSECT ("in ALL three
    # segments") parse with identical branch payloads
    for sql in (
        NARY_CTE.replace("UNION", "INTERSECT"),
        NARY_INLINE.replace("UNION", "INTERSECT"),
    ):
        ov = try_parse_overlap(sql)
        assert ov is not None and ov.set_op == "intersect", sql
        assert ov.branches is not None and len(ov.branches) == 3, sql
        assert [b[0] for b in ov.branches] == [
            "'click'", "'view'", "'purchase'"
        ], ov.branches
    # unsegmented 3-window reach ("active in any of three weeks")
    def _win(lo, hi):
        return (
            f"SELECT user_id FROM events "
            f"WHERE ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}'"
        )

    w3 = (
        "SELECT COUNT(*) AS oc FROM ("
        + _win("2024-01-01 00:00:00", "2024-01-08 00:00:00")
        + " UNION "
        + _win("2024-01-08 00:00:00", "2024-01-15 00:00:00")
        + " UNION "
        + _win("2024-01-15 00:00:00", "2024-01-22 00:00:00")
        + ") t"
    )
    ov = try_parse_overlap(w3)
    assert ov is not None and ov.segment_col is None
    assert ov.branches is not None and len(ov.branches) == 3
    assert all(lo is not None and hi is not None for _l, lo, hi in ov.branches)
    # near-misses stay unparsed: an N-ary EXCEPT chain (not
    # associative), a 3-branch union with one unconstrained branch
    # (the identity question), mixed time columns
    for bad in (
        NARY_INLINE.replace("UNION", "EXCEPT"),
        "SELECT COUNT(*) AS oc FROM ("
        + _win("2024-01-01 00:00:00", "2024-01-08 00:00:00")
        + " UNION "
        + _win("2024-01-08 00:00:00", "2024-01-15 00:00:00")
        + " UNION SELECT user_id FROM events) t",
        "SELECT COUNT(*) AS oc FROM ("
        + _win("2024-01-01 00:00:00", "2024-01-08 00:00:00")
        + " UNION "
        + _win("2024-01-08 00:00:00", "2024-01-15 00:00:00")
        + " UNION SELECT user_id FROM events "
        "WHERE other_ts >= TIMESTAMP '2024-01-15 00:00:00' "
        "AND other_ts < TIMESTAMP '2024-01-22 00:00:00') t",
    ):
        assert try_parse_overlap(bad) is None, bad


def test_nary_union_cte_routes_single_state_scan(spark):
    """The 3-branch CTE chain routes as ONE theta_union_agg state scan
    (never per-branch subqueries) and matches the exact answer —
    including with per-branch windows and ghost segments."""
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e.analyze_table("events", ["user_id"])  # null-proof for set-op idiom
    for sql in (NARY_CTE, NARY_INLINE):
        r = e.query(sql, dual_execute=False)
        assert r["status"] == "ok", r.get("error")
        assert r["plan"]["type"] == "sketch", (sql, r["plan"])
        assert "3 branches unioned in ONE state scan" in r["plan"]["reason"]
        assert r["result"][0]["oc"] == _exact(spark, sql), sql
    # unsegmented cross-period 3-way reach, p_date-pruned, ghost branch
    w3 = (
        "SELECT COUNT(*) AS oc FROM ("
        "SELECT user_id FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00' "
        "UNION "
        "SELECT user_id FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-09 00:00:00' "
        "UNION "
        "SELECT user_id FROM events "
        "WHERE ts >= TIMESTAMP '2030-01-01 00:00:00' "
        "AND ts < TIMESTAMP '2030-01-08 00:00:00') t"
    )
    r = e.query(w3, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert "p_date-pruned" in r["plan"]["reason"], r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, w3)
    # segmented + per-branch windows: each branch's condition is its
    # own (seg AND window) conjunction inside the single scan
    m3 = (
        "SELECT COUNT(*) AS oc FROM ("
        "SELECT user_id FROM events WHERE event_type = 'click' "
        "AND ts >= TIMESTAMP '2024-01-01 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00' "
        "UNION "
        "SELECT user_id FROM events WHERE event_type = 'view' "
        "AND ts >= TIMESTAMP '2024-01-05 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-09 00:00:00' "
        "UNION "
        "SELECT user_id FROM events WHERE event_type = 'purchase') t"
    )
    r = e.query(m3, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, m3)
    # an off-grid branch window declines the WHOLE union to exact
    off = m3.replace("2024-01-05 00:00:00", "2024-01-05 06:30:00")
    r = e.query(off, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, off)


def test_nary_union_cte_needs_null_free_proof(spark):
    """The N-ary CTE spelling is still the set-op idiom: SQL UNION
    keeps a NULL key as one distinct row, so a nullable key declines."""
    spark.sql(
        "SELECT CASE WHEN event_id % 97 = 0 THEN NULL ELSE user_id END "
        "AS user_id, event_type, ts FROM events"
    ).createOrReplaceTempView("ev_nullkey_nary")
    e = _engine(spark)
    e.catalog.upsert_table_stats(
        "ev_nullkey_nary", spark.table("ev_nullkey_nary").count()
    )
    e.create_rollup(
        "ev_nullkey_nary", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e.analyze_table("ev_nullkey_nary", ["user_id"])
    for op in ("UNION", "INTERSECT"):
        sql = NARY_CTE.replace("FROM events", "FROM ev_nullkey_nary")
        sql = sql.replace("UNION", op)
        r = e.query(sql, dual_execute=False)
        assert r["plan"]["type"] == "exact", (op, r["plan"])
        assert r["result"][0]["oc"] == _exact(spark, sql)


def test_nary_intersect_routes_sketch_side(spark):
    """Round 14 (VERDICT r13 #2): the 3-branch INTERSECT chain ("users
    in ALL three segments") routes as N per-branch state unions
    intersected sketch-side — exact under the same never-sampled
    certificate and null-freedom proof the binary INTERSECT idiom
    already required. An empty branch empties the whole intersection;
    EXCEPT chains stay exact (not associative)."""
    e = _engine(spark)
    e.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    e.analyze_table("events", ["user_id"])
    for sql in (
        NARY_CTE.replace("UNION", "INTERSECT"),
        NARY_INLINE.replace("UNION", "INTERSECT"),
    ):
        r = e.query(sql, dual_execute=False)
        assert r["status"] == "ok", r.get("error")
        assert r["plan"]["type"] == "sketch", (sql, r["plan"])
        assert (
            "3 branch state unions intersected sketch-side"
            in r["plan"]["reason"]
        ), r["plan"]
        assert r["result"][0]["oc"] == _exact(spark, sql), sql
    # a ghost segment empties the whole intersection (A ∩ empty = ∅)
    g = NARY_INLINE.replace("UNION", "INTERSECT").replace(
        "'purchase'", "'ghost'"
    )
    r = e.query(g, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert r["result"][0]["oc"] == 0 == _exact(spark, g)
    # unsegmented cross-period 3-way ("in all three windows"),
    # per-branch windows p_date-pruned inside each branch's state union
    w3 = (
        "SELECT COUNT(*) AS oc FROM ("
        "SELECT user_id FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00' "
        "INTERSECT "
        "SELECT user_id FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-09 00:00:00' "
        "INTERSECT "
        "SELECT user_id FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-09 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-13 00:00:00') t"
    )
    r = e.query(w3, dual_execute=False)
    assert r["plan"]["type"] == "sketch", r["plan"]
    assert "p_date-pruned" in r["plan"]["reason"], r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, w3)
    # an off-grid branch window declines the WHOLE chain to exact
    off = w3.replace("2024-01-05 00:00:00", "2024-01-05 06:30:00")
    r = e.query(off, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, off)
    # EXCEPT chains stay exact — not associative, never routed
    x3 = NARY_INLINE.replace("UNION", "EXCEPT")
    r = e.query(x3, dual_execute=False)
    assert r["plan"]["type"] == "exact", r["plan"]
    assert r["result"][0]["oc"] == _exact(spark, x3)


def test_seg_in_parse_fuzz():
    """Property fuzz for the round-12 reach idiom: generated seg_in
    queries round-trip every component; generated near-misses (wrong
    projection, seg == key, 1-element lists, extra conjuncts) never
    parse. Pure parser work — no Spark session."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True).filter(
        lambda s: s.upper() not in {
            "IN", "AND", "OR", "NOT", "SELECT", "FROM", "WHERE", "AS",
            "COUNT", "DISTINCT", "JOIN", "ON", "UNION", "INTERSECT",
            "EXCEPT", "ALL", "BY", "GROUP",
        }
    )
    lit = st.one_of(
        st.integers(-999, 999).map(str),
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=1, max_size=6,
        ).map(lambda t: f"'{t}'"),
    )

    @settings(max_examples=60, deadline=None)
    @given(
        key=ident, seg=ident, tbl=ident, alias=ident,
        lits=st.lists(lit, min_size=2, max_size=5),
    )
    def _roundtrip(key, seg, tbl, alias, lits):
        if seg.lower() == key.lower():
            return
        sql = (
            f"SELECT COUNT(DISTINCT {key}) AS {alias} FROM {tbl} "
            f"WHERE {seg} IN ({', '.join(lits)})"
        )
        ov = try_parse_overlap(sql)
        assert ov is not None, sql
        assert (ov.table, ov.key_col, ov.segment_col) == (tbl, key, seg)
        assert ov.alias == alias and ov.lits == tuple(lits)
        assert (ov.idiom, ov.set_op) == ("seg_in", "union")
        # near-misses derived from the same inputs never parse
        assert try_parse_overlap(sql.replace("COUNT(DISTINCT", "COUNT(")) is None
        assert try_parse_overlap(
            f"SELECT COUNT(DISTINCT {key}) AS {alias} FROM {tbl} "
            f"WHERE {key} IN ({', '.join(lits)})"
        ) is None
        assert try_parse_overlap(
            f"SELECT COUNT(DISTINCT {key}) AS {alias} FROM {tbl} "
            f"WHERE {seg} IN ({lits[0]})"
        ) is None
        assert try_parse_overlap(sql + " AND x > 3") is None

    _roundtrip()


def test_nary_union_parse_fuzz():
    """Property fuzz for the round-13 N-ary set-op UNION arm: generated
    K-branch inline chains (2 <= K <= 6) round-trip table/key/segment
    and every branch literal in written order; the same chains under
    INTERSECT/EXCEPT (K > 2), UNION ALL, or a mixed key never parse.
    Pure parser work — no Spark session."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ident = st.from_regex(
        r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True
    ).filter(
        lambda s: s.upper() not in {
            "IN", "AND", "OR", "NOT", "SELECT", "FROM", "WHERE", "AS",
            "COUNT", "DISTINCT", "JOIN", "ON", "UNION", "INTERSECT",
            "EXCEPT", "ALL", "BY", "GROUP",
        }
    )
    lit = st.one_of(
        st.integers(-999, 999).map(str),
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=1, max_size=6,
        ).map(lambda t: f"'{t}'"),
    )

    @settings(max_examples=50, deadline=None)
    @given(
        key=ident, seg=ident, tbl=ident, alias=ident,
        lits=st.lists(lit, min_size=2, max_size=6),
    )
    def _roundtrip(key, seg, tbl, alias, lits):
        if len({key.lower(), seg.lower(), tbl.lower()}) < 3:
            return
        inner = " UNION ".join(
            f"SELECT {key} FROM {tbl} WHERE {seg} = {l}" for l in lits
        )
        sql = f"SELECT COUNT(*) AS {alias} FROM ({inner}) t"
        ov = try_parse_overlap(sql)
        assert ov is not None, sql
        assert (ov.table, ov.key_col, ov.segment_col) == (tbl, key, seg)
        assert ov.alias == alias and ov.set_op == "union"
        if len(lits) == 2:
            assert ov.branches is None  # binary stays the r12 shape
            assert (ov.lit_a, ov.lit_b) == (lits[0], lits[1])
        else:
            assert ov.branches is not None
            assert [b[0] for b in ov.branches] == lits
            assert all(lo is None and hi is None for _l, lo, hi in ov.branches)
        # INTERSECT chains parse too (round 14 — associative, like
        # UNION); EXCEPT chains never do (not associative); bag
        # semantics and an unsegmented unwindowed branch never parse
        if len(lits) > 2:
            ovi = try_parse_overlap(sql.replace("UNION", "INTERSECT"))
            assert ovi is not None and ovi.set_op == "intersect"
            assert [b[0] for b in ovi.branches] == lits
            assert try_parse_overlap(sql.replace("UNION", "EXCEPT")) is None
        assert try_parse_overlap(sql.replace("UNION", "UNION ALL")) is None
        assert try_parse_overlap(
            f"SELECT COUNT(*) AS {alias} FROM ({inner} "
            f"UNION SELECT {key} FROM {tbl}) t"
        ) is None

    _roundtrip()


def test_seg_in_parses_across_newlines():
    """Round-12 review fix: the cheap pre-filter screens IN as a word,
    not as the ' IN' substring — a newline or tab before IN (BI tools
    wrap clauses freely) must still reach the parser."""
    sql = (
        "SELECT COUNT(DISTINCT user_id) AS oc FROM events\n"
        "WHERE event_type\nIN ('click', 'view')"
    )
    ov = try_parse_overlap(sql)
    assert ov is not None and ov.idiom == "seg_in", sql
    tabbed = sql.replace("\nIN", "\tIN")
    assert try_parse_overlap(tabbed) is not None
    # ...without opening the gate for identifiers containing 'in'
    assert try_parse_overlap(
        "SELECT spending AS oc FROM t WHERE kind = 3"
    ) is None
