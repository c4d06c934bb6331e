"""The partition-LAYOUT advisor (round 8) — the storage-layout sibling of
the rollup advisor: time-bounded queries that run with NO layout to prune
through record their (table, ts_col) shape; recurring shapes merge into
partition_table suggestions; apply_layout_advice (opt-in, bucket-budgeted)
materializes the top one so the next identical query prunes at
file-listing time. observe -> advise -> materialize -> route, closed."""

import tempfile

import pytest

from approximate_query_engine_spark import AQEngine

# a PROJECTION (not rollup-shaped): exercises the layout path alone —
# a rollup could never serve row-level output
PROJ = (
    "SELECT event_id, user_id, event_type FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-06 00:00:00'"
)


def q(engine, sql, **kw):
    r = engine.query(sql, **kw)
    assert r["status"] == "ok", r.get("error")
    return r


@pytest.fixture()
def eng(spark):
    return AQEngine(
        spark,
        workdir=tempfile.mkdtemp(prefix="aqe_layout_adv_"),
        data_dir="/root/testdata/sf0.001",
    )


def test_layout_advisor_end_to_end(eng):
    from approximate_query_engine_spark.maintenance import run_maintenance

    for _ in range(3):
        r = q(eng, PROJ)
        assert "partitioned layout" not in r["plan"]["reason"]
    recs = eng.recommend_partition_layouts()
    assert recs and recs[0]["table"] == "events"
    assert recs[0]["ts_col"] == "ts" and recs[0]["grain"] == "day"
    report = run_maintenance(eng, apply_advice=True)
    applied = report["layout_advice_applied"]
    assert applied and applied[0]["applied"] is True, applied
    assert applied[0]["built"]["table"] == "events__by_day"
    # the NEXT identical query routes through the advisor-built layout
    r = q(eng, PROJ)
    assert "routed to partitioned layout" in r["plan"]["reason"], r["plan"]
    assert "events__by_day" in r["plan"]["sql"]
    # identical rows through the layout
    raw = {tuple(x) for x in eng.spark.sql(PROJ).collect()}
    got = {
        (d["event_id"], d["user_id"], d["event_type"]) for d in r["result"]
    }
    assert got == raw
    # advice converged (report recomputed post-apply)
    assert report["layout_recommendations"] == []
    assert eng.recommend_partition_layouts() == []


def test_layout_advice_budgets(eng):
    for _ in range(3):
        q(eng, PROJ)
    # bucket budget declines WITHOUT partitioning (events spans 30 days)
    out = eng.apply_layout_advice(max_buckets=5)
    assert out and out[0]["applied"] is False
    assert "exceed budget" in out[0]["reason"]
    assert "events" not in eng.catalog.partitioned_views
    out = eng.apply_layout_advice(max_apply=0)
    assert out and out[0]["reason"] == "max_apply budget"
    assert "events" not in eng.catalog.partitioned_views


def test_layout_recorder_selectivity(eng):
    # OR in the WHERE -> underivable -> never recorded
    q(
        eng,
        "SELECT event_id FROM events "
        "WHERE ts <= TIMESTAMP '2024-01-05 00:00:00' OR user_id = 5",
    )
    assert eng.catalog.layout_candidates == {}
    # no time bound at all -> not recorded
    q(eng, "SELECT event_id FROM events WHERE user_id = 5")
    assert eng.catalog.layout_candidates == {}
    # a table that already HAS a layout -> not recorded
    eng.partition_table("events", "ts", grain="day")
    q(eng, PROJ)
    assert eng.catalog.layout_candidates == {}


def test_layout_recorder_skips_rollup_served(eng):
    """A dashboard aggregate a fresh rollup answers never reaches the
    layout recorder — the rollup IS the optimal materialization."""
    eng.create_rollup("events", "ts", "1 hour", dims=["event_type"])
    sql = (
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' GROUP BY event_type"
    )
    r = q(eng, sql)
    assert "rollup" in r["plan"]["reason"]
    assert eng.catalog.layout_candidates == {}


def test_apply_purges_table_candidates_and_any_layout_excludes(eng):
    """One layout per table: applying advice purges the table's
    candidate evidence, and ANY registered layout excludes the table
    from further recommendations — no oscillating full-table rewrites
    (round-8 review fix)."""
    for _ in range(3):
        q(eng, PROJ)
    assert eng.catalog.layout_candidates
    out = eng.apply_layout_advice()
    assert out and out[0]["applied"] is True
    assert eng.catalog.layout_candidates == {}
    # even a hypothetical leftover candidate on another time column
    # cannot resurface while a layout exists
    eng.catalog.layout_candidates["stale"] = {
        "table": "events", "ts_col": "created_at", "grain": "day",
        "count": 99,
    }
    assert eng.recommend_partition_layouts() == []


def test_rollup_shaped_queries_never_record_layout_evidence(eng):
    """Aggregate dashboards belong to the rollup advisor: the layout
    recorder skips rollup-shaped queries even when NO rollup exists, so
    one apply_advice sweep never follows a rollup build with a
    redundant full-table layout rewrite (round-8 review fix)."""
    agg = (
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-06 00:00:00' GROUP BY event_type"
    )
    for _ in range(3):
        q(eng, agg)
    assert eng.catalog.layout_candidates == {}
    assert eng.recommend_rollups()  # the rollup advisor owns the shape
