"""Round-8 fixes (VERDICT r7 + ADVICE r7):

1. Partition routing declines on UNKNOWN freshness (missing catalog row
   count) — the last survivor of the round-6 unknown-freshness family,
   matching the three rollup sites (engine._route_rewrite).
2. _fresh_rollup_with prefers the COARSEST fresh covering rollup (state
   endpoints scan 24x fewer rows on a day rollup than an hour one).
3. The advisor loop closes: maintenance(apply_advice=True) materializes
   the top recommend_rollups suggestion and the next identical query
   routes to it (observe -> advise -> materialize -> route).
4. Week-grain buckets are rejected loudly (Spark windows are
   epoch/Thursday-aligned; DATE_TRUNC('week') is Monday).
5. can_derive_rollup itself rejects time_col / source_table mismatches
   (ADVICE r7 medium #1).
6. chunk_documents tokenizes on true whitespace (\\s+) and never emits
   a trailing chunk wholly contained in the previous one (ADVICE r7
   low #3/#4).
7. MEDIAN/PERCENTILE rollup routing is gated by a distinct
   max_rank_error knob (ADVICE r7 medium #2) — rank and value error are
   different dimensions.
8. The advisor candidate book is capped with least-observed eviction
   (ADVICE r7 low #5).
"""

import tempfile

import pytest

from approximate_query_engine_spark import AQEngine


def q(engine, sql, **kw):
    r = engine.query(sql, **kw)
    assert r["status"] == "ok", r.get("error")
    return r


@pytest.fixture()
def eng(spark):
    return AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_r8_"),
        data_dir="/root/testdata/sf0.001",
    )


# ---------------------------------------------------------------- 1
def test_partition_routing_unknown_freshness_declines(eng):
    """A dropped/foreign stats file means layout freshness is UNKNOWN —
    exact queries must fall back to the raw plan, never serve a
    possibly-stale partitioned layout labeled exact (mirror of
    test_unknown_base_row_count_declines_routing for rollups)."""
    sql = (
        "SELECT COUNT(*) AS n FROM events "
        "WHERE ts <= TIMESTAMP '2024-01-05 00:00:00'"
    )
    where = "ts <= TIMESTAMP '2024-01-05 00:00:00'"
    eng.partition_table("events", "ts", grain="day")
    assert "events__by_day" in q(eng, sql)["plan"]["sql"]
    saved = eng.catalog.table_stats.pop("events")
    try:
        # _route_rewrite is the shared gate for BOTH the single-table
        # and the join routing shapes; the single-table engine path
        # heals a stats miss via the planner's count-once, but join
        # plans can reach routing without one — the gate itself must
        # decline on unknown freshness
        assert eng._route_rewrite(sql, "events", where, False) is None
        # the full query path stays correct (the planner re-counts,
        # freshness becomes KNOWN, and routing resumes soundly)
        assert q(eng, sql)["status"] == "ok"
    finally:
        eng.catalog.table_stats.setdefault("events", saved)
    assert "events__by_day" in q(eng, sql)["plan"]["sql"]
    # drift (append) also declines, through the same gate
    stats = eng.catalog.table_stats["events"]
    real = stats.row_count
    stats.row_count = real + 1
    try:
        assert eng._route_rewrite(sql, "events", where, False) is None
    finally:
        stats.row_count = real


# ---------------------------------------------------------------- 2
def test_fresh_rollup_with_prefers_coarsest(eng):
    """With hour- AND day-grain rollups both tracking the column, the
    state endpoints must scan the day one (fewest state rows), matching
    _route_rollup's coarsest-first ordering — and fall back to a finer
    FRESH rollup when the coarse one is stale."""
    eng.create_rollup(
        "events", "ts", "1 hour", dims=["event_type"],
        quantile_cols=["value"],
    )
    eng.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        quantile_cols=["value"],
    )
    info = eng._fresh_rollup_with("events", "quantile_cols", "value", "q")
    assert info["bucket"] == "1 day"
    # coarse stale -> the fresh hour rollup serves instead of raising
    day = next(
        e for e in eng.catalog.rollups["events"] if e["bucket"] == "1 day"
    )
    saved = day["built_row_count"]
    day["built_row_count"] = saved - 1
    try:
        info = eng._fresh_rollup_with(
            "events", "quantile_cols", "value", "q"
        )
        assert info["bucket"] == "1 hour"
    finally:
        day["built_row_count"] = saved
    # nothing fresh -> raises
    hour = next(
        e for e in eng.catalog.rollups["events"] if e["bucket"] == "1 hour"
    )
    day["built_row_count"] = saved - 1
    hour_saved = hour["built_row_count"]
    hour["built_row_count"] = hour_saved - 1
    try:
        with pytest.raises(ValueError, match="stale"):
            eng._fresh_rollup_with("events", "quantile_cols", "value", "q")
    finally:
        day["built_row_count"] = saved
        hour["built_row_count"] = hour_saved


# ---------------------------------------------------------------- 3
DASHBOARD = (
    "SELECT event_type, COUNT(*) AS n, SUM(value) AS sv FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-05 00:00:00' GROUP BY event_type"
)


def test_apply_rollup_advice_closes_the_loop(eng):
    from approximate_query_engine_spark.maintenance import run_maintenance

    for _ in range(3):
        r = q(eng, DASHBOARD)
        assert "rollup" not in r["plan"]["reason"]
    assert eng.recommend_rollups(), "workload should produce advice"
    report = run_maintenance(eng, apply_advice=True)
    applied = report["rollup_advice_applied"]
    assert applied and applied[0]["applied"] is True, applied
    assert applied[0]["built"]["rollup"] in (
        e["view"] for e in eng.catalog.rollups["events"]
    )
    # the NEXT identical query routes to the advisor-built rollup
    r = q(eng, DASHBOARD)
    assert "rollup" in r["plan"]["reason"], r["plan"]
    # and the advice converged to empty (report recomputed post-apply)
    assert report["rollup_recommendations"] == []


def test_apply_rollup_advice_budgets(eng):
    for _ in range(3):
        q(eng, DASHBOARD)
    # state-row budget declines WITHOUT building
    out = eng.apply_rollup_advice(max_state_rows=1)
    assert out and out[0]["applied"] is False
    assert "exceed budget" in out[0]["reason"]
    assert not eng.catalog.rollups.get("events")
    # max_apply budget declines the excess
    out = eng.apply_rollup_advice(max_apply=0)
    assert out and out[0]["applied"] is False
    assert out[0]["reason"] == "max_apply budget"
    assert not eng.catalog.rollups.get("events")


# ---------------------------------------------------------------- 4
def test_week_bucket_rejected(eng):
    with pytest.raises(ValueError, match="week-grain"):
        eng.create_rollup("events", "ts", "1 week", dims=["event_type"])
    # the error points the user at the working alternative
    with pytest.raises(ValueError) as ei:
        eng.create_rollup("events", "ts", "2 weeks")
    assert "1 day" in str(ei.value) and "DATE_TRUNC" in str(ei.value)


# ---------------------------------------------------------------- 5
def test_can_derive_rollup_checks_lineage():
    from approximate_query_engine_spark.operators.rollup import (
        RollupSpec,
        can_derive_rollup,
    )

    fine = RollupSpec("events", "ts", "1 hour", dims=["event_type"])
    assert can_derive_rollup(
        fine, RollupSpec("events", "ts", "1 day", dims=["event_type"])
    ) is None
    r = can_derive_rollup(
        fine, RollupSpec("events", "created_at", "1 day")
    )
    assert r is not None and "time column" in r
    r = can_derive_rollup(
        fine, RollupSpec("orders", "ts", "1 day")
    )
    assert r is not None and "source table" in r


# ---------------------------------------------------------------- 6
def test_chunk_documents_whitespace_tokens(spark):
    from approximate_query_engine_spark.functions.packing import (
        chunk_documents,
    )

    df = spark.createDataFrame(
        [(1, "a\tb\nc  d \t e")], ["doc_id", "text"]
    )
    rows = chunk_documents(
        df, chunk_tokens=3, overlap_tokens=1
    ).orderBy("chunk_id").collect()
    # tabs/newlines/multi-space all separate: 5 tokens -> 2 chunks
    assert [r["chunk_text"] for r in rows] == ["a b c", "c d e"]
    assert [r["n_chunk_tokens"] for r in rows] == [3, 3]


def test_chunk_documents_no_redundant_trailing_chunk(spark):
    from approximate_query_engine_spark.functions.packing import (
        chunk_documents,
    )

    def doc(n):
        return " ".join(f"t{i}" for i in range(n))

    df = spark.createDataFrame(
        [(60, doc(60)), (100, doc(100)), (64, doc(64)), (113, doc(113))],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, chunk_tokens=64, overlap_tokens=16)
    got = {
        r["doc_id"]: r["cnt"]
        for r in out.groupBy("doc_id").count().withColumnRenamed(
            "count", "cnt"
        ).collect()
    }
    # n=60 <= 64: ONE chunk (the old code emitted a duplicate 48..59
    # suffix chunk); n=64 likewise; n=100: starts 0,48 (start 96's
    # window 96..99 sits wholly inside 48..99); n=113: start 96's
    # window 96..112 carries NEW token 112 -> 3 chunks
    assert got == {60: 1, 64: 1, 100: 2, 113: 3}
    # every chunk ends where the doc ends; union of chunks == doc
    last = (
        out.where("doc_id = 100").orderBy("chunk_id").collect()[-1]
    )
    assert last["chunk_text"].endswith("t99")


# ---------------------------------------------------------------- 7
QUANT = (
    "SELECT event_type, MEDIAN(value) AS med FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-05 00:00:00' "
    "GROUP BY event_type ORDER BY event_type"
)


def test_max_rank_error_knob(eng):
    eng.create_rollup(
        "events", "ts", "1 hour", dims=["event_type"],
        quantile_cols=["value"], kll_k=800,
    )
    # explicit rank budget routes even under a tight VALUE tolerance
    r = q(eng, QUANT, max_rel_error=0.001, max_rank_error=0.05)
    assert "KLL sketch state" in r["plan"]["reason"], r["plan"]
    # tight rank budget declines even under a loose value tolerance
    r = q(eng, QUANT, max_rel_error=0.05, max_rank_error=0.001)
    assert "rollup" not in r["plan"]["reason"], r["plan"]
    # max_rank_error=0 forbids KLL-served quantiles outright
    r = q(eng, QUANT, max_rank_error=0.0)
    assert "rollup" not in r["plan"]["reason"], r["plan"]
    # absent the knob, the value tolerance doubles as the rank budget
    # (the pre-knob contract, unchanged)
    assert "KLL sketch state" in q(eng, QUANT)["plan"]["reason"]


# ---------------------------------------------------------------- 8
def test_rollup_candidate_book_is_capped(eng):
    eng._MAX_ADVISOR_CANDIDATES = 5
    recurring = (
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' GROUP BY event_type"
    )
    for _ in range(4):
        q(eng, recurring)
    # 6 distinct one-off shapes (distinct dim/agg sets -> distinct sigs)
    for d in ("user_id", "event_id"):
        for agg in ("COUNT(*) AS n", "SUM(value) AS s", "MIN(value) AS m"):
            q(
                eng,
                f"SELECT {d}, {agg} FROM events "
                "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
                f"GROUP BY {d}",
            )
    book = eng.catalog.rollup_candidates
    assert len(book) <= 5
    # the recurring dashboard shape survived eviction
    assert any(r["count"] >= 4 for r in book.values())


def test_apply_advice_build_failure_is_recorded_not_fatal(
    eng, monkeypatch
):
    """A failing build must not abort the apply batch or escape to the
    maintenance sweep — it lands in the report as a per-suggestion
    decline (round-8 review fix)."""
    for _ in range(3):
        q(eng, DASHBOARD)

    def boom(*a, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(eng, "create_rollup", boom)
    out = eng.apply_rollup_advice()
    assert out and out[0]["applied"] is False
    assert "build failed" in out[0]["reason"]
    assert not eng.catalog.rollups.get("events")


def test_apply_layout_advice_build_failure_is_recorded(eng, monkeypatch):
    proj = (
        "SELECT event_id FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-06 00:00:00'"
    )
    for _ in range(3):
        q(eng, proj)

    def boom(*a, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(eng, "partition_table", boom)
    out = eng.apply_layout_advice()
    assert out and out[0]["applied"] is False
    assert "build failed" in out[0]["reason"]
    # evidence survives the failed build (nothing was purged)
    assert eng.catalog.layout_candidates
