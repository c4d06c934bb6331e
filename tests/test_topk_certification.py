"""Round-9: the EXACT-evidence tier for top-k certification (VERDICT r8
order #2). create_rollup records an exact COUNT(DISTINCT) per tracked
topk column in the same build pass as the NULL evidence, so the "exact
regime certified" plan label is literally true; refresh degrades the
number to an exact UPPER BOUND (old + tail distinct count) — still a
proof, never a statistic."""

import datetime
import tempfile

from approximate_query_engine_spark import AQEngine

SCHEMA = "ts timestamp, event_type string, user_id bigint"


def _rows(n_users, per_user=4, day=1):
    base = datetime.datetime(2024, 3, day)
    return [
        (base + datetime.timedelta(hours=(u * per_user + i) % 20),
         "click", u)
        for u in range(n_users)
        for i in range(per_user)
    ]


def _mk(spark, name, rows):
    spark.createDataFrame(rows, SCHEMA).createOrReplaceTempView(name)
    e = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_cert_"))
    e.catalog.upsert_table_stats(name, len(rows))
    return e


TOPK = (
    "SELECT user_id, COUNT(*) AS n FROM {t} "
    "WHERE ts >= TIMESTAMP '2024-03-01 00:00:00' "
    "AND ts < TIMESTAMP '2024-03-02 00:00:00' "
    "GROUP BY user_id ORDER BY n DESC, user_id ASC LIMIT 5"
)


def test_exact_evidence_boundary_routes_at_budget(spark):
    """ndv == budget routes (no purge possible); ndv == budget + 1
    declines HARD — exact evidence of a non-fitting column is a proof
    no statistical tier may overrule."""
    ndv = 24
    e = _mk(spark, "cert_ev", _rows(ndv))
    e.create_rollup(
        "cert_ev", "ts", "1 hour", topk_cols=["user_id"],
        topk_budget=ndv,
    )
    info = e.catalog.rollups["cert_ev"][0]
    assert info["topk_exact_ndv"] == {
        "user_id": {"ndv": ndv, "exact": True}
    }
    r = e.query(TOPK.format(t="cert_ev"))
    assert r["status"] == "ok", r.get("error")
    assert (
        f"exact regime certified: exact ndv {ndv} <= budget "
        "(build evidence)" in r["plan"]["reason"]
    ), r["plan"]
    got = [(d["user_id"], d["n"]) for d in r["result"]]
    exact = [
        (x["user_id"], x["n"])
        for x in spark.sql(TOPK.format(t="cert_ev")).collect()
    ]
    assert got == exact

    # one distinct value over budget: decline, even with a fresh
    # catalog ndv that would (wrongly, by margin luck) fit
    e2 = _mk(spark, "cert_ev2", _rows(ndv))
    e2.create_rollup(
        "cert_ev2", "ts", "1 hour", topk_cols=["user_id"],
        topk_budget=ndv - 1,
    )
    e2.catalog.upsert_column_ndv("cert_ev2", "user_id", ndv - 5)
    e2.catalog.analyze_meta["cert_ev2"] = {
        "row_count": e2.catalog.get_row_count("cert_ev2"),
        "columns": ["user_id"],
    }
    r = e2.query(TOPK.format(t="cert_ev2"))
    assert r["status"] == "ok", r.get("error")
    assert "frequent-items" not in r["plan"]["reason"], r["plan"]


def test_refresh_degrades_evidence_to_exact_upper_bound(spark):
    """Appends + refresh: the evidence becomes old + tail distinct
    count (exact upper bound, exact=False). Within budget it still
    certifies — with the upper-bound wording; a no-append refresh
    leaves the evidence untouched."""
    rows = _rows(10)
    e = _mk(spark, "cert_grow", rows)
    e.create_rollup(
        "cert_grow", "ts", "1 hour", topk_cols=["user_id"],
        topk_budget=64,
    )
    info = e.catalog.rollups["cert_grow"][0]
    assert info["topk_exact_ndv"]["user_id"] == {"ndv": 10, "exact": True}

    # no-append refresh: evidence untouched (still exact)
    e.refresh_rollup("cert_grow")
    assert info["topk_exact_ndv"]["user_id"] == {"ndv": 10, "exact": True}

    # append 3 rows for 2 NEW users on the tail day; the tail scan
    # (>= last date dir) re-reads the overlap, so the bound grows by
    # the TAIL's distinct count — a superset of the new users
    late = [
        (datetime.datetime(2024, 3, 1, 21), "click", 100),
        (datetime.datetime(2024, 3, 1, 22), "click", 101),
        (datetime.datetime(2024, 3, 1, 22, 30), "click", 100),
    ]
    spark.createDataFrame(rows + late, SCHEMA).createOrReplaceTempView(
        "cert_grow"
    )
    e.catalog.upsert_table_stats("cert_grow", len(rows) + len(late))
    e.refresh_rollup("cert_grow")
    ev = info["topk_exact_ndv"]["user_id"]
    assert ev["exact"] is False
    # true ndv is 12; the bound is 10 + ndv(tail) = 22 — valid, <= 64
    assert 12 <= ev["ndv"] <= 22
    r = e.query(TOPK.format(t="cert_grow"))
    assert r["status"] == "ok", r.get("error")
    assert "exact upper bound" in r["plan"]["reason"], r["plan"]
    got = [(d["user_id"], d["n"]) for d in r["result"]]
    exact = [
        (x["user_id"], x["n"])
        for x in spark.sql(TOPK.format(t="cert_grow")).collect()
    ]
    assert got == exact


def test_inflated_upper_bound_falls_through_to_sketch_tier(spark):
    """When refresh inflates the bound past the budget, the rollup's
    own distinct-sketch state (current build, +2σ) may still certify —
    the upper bound is conservative, not a veto."""
    rows = _rows(30)
    e = _mk(spark, "cert_infl", rows)
    e.create_rollup(
        "cert_infl", "ts", "1 hour", topk_cols=["user_id"],
        distinct_cols=["user_id"], topk_budget=40,
    )
    info = e.catalog.rollups["cert_infl"][0]
    # simulate many refresh cycles inflating the bound past the budget
    info["topk_exact_ndv"]["user_id"] = {"ndv": 10_000, "exact": False}
    r = e.query(TOPK.format(t="cert_infl"))
    assert r["status"] == "ok", r.get("error")
    assert "exact regime certified" in r["plan"]["reason"], r["plan"]
    assert "rollup distinct state" in r["plan"]["reason"], r["plan"]


def test_derived_build_inherits_exact_evidence(spark):
    """A day rollup derived from hour STATE (no fact re-scan) inherits
    the fine rollup's exact-ndv evidence — same data lineage — and its
    routed top-k certifies from it."""
    rows = _rows(16, per_user=6)
    e = _mk(spark, "cert_derive", rows)
    e.create_rollup(
        "cert_derive", "ts", "1 hour", topk_cols=["user_id"],
        topk_budget=64,
    )
    out = e.create_rollup(
        "cert_derive", "ts", "1 day", topk_cols=["user_id"],
        topk_budget=64,
    )
    assert out["derived_from"] == "cert_derive__rollup_1_hour"
    day = next(
        i for i in e.catalog.rollups["cert_derive"]
        if i["bucket"] == "1 day"
    )
    assert day["topk_exact_ndv"] == {"user_id": {"ndv": 16, "exact": True}}
    assert day["topk_notnull"] == {"user_id": True}


def test_maintenance_reproves_inflated_evidence(spark):
    """Round 9: maintenance restores the EXACT certification tier when
    refresh cycles have inflated the upper bound past the budget on an
    otherwise-fresh rollup — one column-pruned exact COUNT(DISTINCT),
    scheduled instead of silently losing the strongest tier."""
    rows = _rows(20)
    e = _mk(spark, "cert_reprove", rows)
    e.create_rollup(
        "cert_reprove", "ts", "1 hour", topk_cols=["user_id"],
        topk_budget=32,
    )
    info = e.catalog.rollups["cert_reprove"][0]
    # simulate append/refresh cycles inflating the bound past budget
    info["topk_exact_ndv"]["user_id"] = {"ndv": 999, "exact": False}
    # dry run reports the plan without touching the evidence
    rep = e.maintain(refresh_stats=False, dry_run=True)
    planned = [
        a for a in rep["refreshed"]
        if a.get("kind") == "rollup_topk_evidence"
    ]
    assert planned and planned[0]["columns"] == ["user_id"], rep
    assert info["topk_exact_ndv"]["user_id"]["exact"] is False
    # the real run re-proves: exact ndv restored, certification returns
    rep = e.maintain(refresh_stats=False)
    assert info["topk_exact_ndv"]["user_id"] == {"ndv": 20, "exact": True}
    r = e.query(TOPK.format(t="cert_reprove"))
    assert "exact regime certified: exact ndv 20 <= budget" in (
        r["plan"]["reason"]
    ), r["plan"]
    # a bound within budget (still certifying) is NOT re-proved
    info["topk_exact_ndv"]["user_id"] = {"ndv": 25, "exact": False}
    rep = e.maintain(refresh_stats=False)
    assert info["topk_exact_ndv"]["user_id"] == {"ndv": 25, "exact": False}


def test_reprove_scan_budget_defers(spark):
    """Round 10 (VERDICT r9 #6): ``max_reprove_scans`` bounds the exact
    COUNT(DISTINCT) fact scans the re-proof may pay per maintenance
    window. Budget 0 defers every re-proof (action recorded with
    deferred=true, evidence untouched, routing keeps declining to
    exact); budget 1 over two dark rollups re-proves exactly one and
    defers the other; the next window picks up the rest — the same
    spread-across-windows posture advice_max_apply gives builds."""
    rows = _rows(20)
    e = _mk(spark, "cert_budget", rows)
    for bucket in ("1 hour", "1 day"):
        e.create_rollup(
            "cert_budget", "ts", bucket, topk_cols=["user_id"],
            topk_budget=32, derive=False,
        )
    infos = e.catalog.rollups["cert_budget"]
    for info in infos:
        info["topk_exact_ndv"]["user_id"] = {"ndv": 999, "exact": False}
    # budget 0: both deferred, nothing scanned, evidence untouched
    rep = e.maintain(refresh_stats=False, max_reprove_scans=0)
    acts = [
        a for a in rep["refreshed"]
        if a.get("kind") == "rollup_topk_evidence"
    ]
    assert len(acts) == 2 and all(a.get("deferred") for a in acts), rep
    assert all(a.get("reason") and "deferred" in a["reason"] for a in acts)
    assert all(
        i["topk_exact_ndv"]["user_id"] == {"ndv": 999, "exact": False}
        for i in infos
    )
    r = e.query(TOPK.format(t="cert_budget"))
    assert "frequent-items" not in r["plan"]["reason"], r["plan"]
    # budget 1: one re-proved, one deferred
    rep = e.maintain(refresh_stats=False, max_reprove_scans=1)
    acts = [
        a for a in rep["refreshed"]
        if a.get("kind") == "rollup_topk_evidence"
    ]
    assert len(acts) == 2, rep
    assert sorted(bool(a.get("deferred")) for a in acts) == [False, True]
    states = sorted(
        i["topk_exact_ndv"]["user_id"]["exact"] for i in infos
    )
    assert states == [False, True], infos
    # the next window (default unbounded) finishes the job
    e.maintain(refresh_stats=False)
    assert all(
        i["topk_exact_ndv"]["user_id"] == {"ndv": 20, "exact": True}
        for i in infos
    )
    r = e.query(TOPK.format(t="cert_budget"))
    assert "exact regime certified: exact ndv 20 <= budget" in (
        r["plan"]["reason"]
    ), r["plan"]
