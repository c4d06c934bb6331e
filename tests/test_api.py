"""HTTP-contract golden tests via the Flask test client
(reference README.md:119-167 response shapes)."""

import pytest

flask = pytest.importorskip("flask")

from approximate_query_engine_spark.api import create_app


@pytest.fixture(scope="module")
def client(engine):
    app = create_app(engine)
    app.config["TESTING"] = True
    return app.test_client()


def test_health(client):
    assert client.get("/health").get_json() == {"status": "ok"}


def test_tables(client):
    tables = client.get("/tables").get_json()["tables"]
    assert "lineitem" in tables and "orders" in tables


def test_query_exact(client):
    r = client.post("/query", json={"sql": "SELECT COUNT(*) AS c FROM nation"})
    body = r.get_json()
    assert r.status_code == 200 and body["status"] == "ok"
    assert body["result"][0]["c"] == 25
    assert body["plan"]["type"] == "exact"


def test_query_ml_contract(client):
    r = client.post(
        "/query",
        json={
            "sql": "SELECT COUNT(*) AS c FROM lineitem",
            "use_ml_optimization": True,
            "max_rel_error": 0.2,
        },
    )
    body = r.get_json()
    assert body["status"] == "ok"
    ml = body["ml_optimization"]
    assert set(ml) >= {
        "strategy",
        "modified_sql",
        "original_sql",
        "confidence",
        "estimated_speedup",
        "estimated_error",
        "reasoning",
        "transformations",
    }


def test_query_missing_sql_400(client):
    assert client.post("/query", json={}).status_code == 400


def test_query_bad_sql_500_envelope(client):
    r = client.post("/query", json={"sql": "SELECT FROM nothing"})
    assert r.status_code == 500
    assert r.get_json()["status"] == "error"


def test_samples_create_and_stratified(client):
    r = client.post(
        "/samples/create", json={"table": "customer", "sample_fraction": 0.5}
    )
    body = r.get_json()
    assert r.status_code == 200 and body["sample_table"].startswith("customer__sample")
    r = client.post(
        "/samples/stratified",
        json={
            "table": "customer",
            "strata_column": "c_mktsegment",
            "sample_fraction": 0.4,
            "variance_column": "c_acctbal",
        },
    )
    body = r.get_json()
    assert body["allocation_type"] == "neyman"
    assert body["strata"]


def test_samples_create_invalid_fraction_400(client):
    r = client.post(
        "/samples/create", json={"table": "customer", "sample_fraction": 2.0}
    )
    assert r.status_code == 400


def test_sketches_roundtrip(client):
    r = client.post(
        "/sketches/create",
        json={"table": "customer", "column": "c_custkey", "sketch_type": "hll"},
    )
    assert r.get_json()["size_bytes"] > 0
    listed = client.get("/sketches?table=customer").get_json()["sketches"]
    assert any(s["sketch_type"] == "hll" for s in listed)


def test_ml_stats(client):
    body = client.get("/ml/stats").get_json()
    assert {"total_queries", "strategies", "window_days"} <= set(body)


# ---- config module (reference config.py parity) ----
def test_config_from_env(monkeypatch):
    from approximate_query_engine_spark.config import Config

    monkeypatch.setenv("AQE_PORT", "9191")
    monkeypatch.setenv("CORS_ORIGINS", "http://a.example,http://b.example")
    monkeypatch.setenv("FLASK_DEBUG", "1")
    cfg = Config.from_env()
    assert cfg.port == 9191 and cfg.debug is True
    assert cfg.allowed_origin("http://a.example") == "http://a.example"
    assert cfg.allowed_origin("http://evil.example") is None
    monkeypatch.delenv("CORS_ORIGINS")
    assert Config.from_env().allowed_origin("http://any.example") == "*"


def test_cors_headers(engine):
    from approximate_query_engine_spark.config import Config

    app = create_app(engine, Config(cors_origins="http://ok.example"))
    app.config["TESTING"] = True
    c = app.test_client()
    r = c.get("/health", headers={"Origin": "http://ok.example"})
    assert r.headers.get("Access-Control-Allow-Origin") == "http://ok.example"
    # ACAO varies by request Origin → caches must key on it
    assert "Origin" in r.headers.get("Vary", "")
    r2 = c.get("/health", headers={"Origin": "http://other.example"})
    assert "Access-Control-Allow-Origin" not in r2.headers
    assert "Origin" in r2.headers.get("Vary", "")


def test_health_on_configured_port(engine, monkeypatch):
    """/health reachable under an env-configured port (VERDICT item 9):
    run the real server on AQE_PORT in a thread and hit it over HTTP."""
    import threading
    import urllib.request

    from werkzeug.serving import make_server

    from approximate_query_engine_spark.config import Config

    monkeypatch.setenv("AQE_PORT", "8199")
    cfg = Config.from_env()
    app = create_app(engine, cfg)
    srv = make_server("127.0.0.1", cfg.port, app)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{cfg.port}/health", timeout=10
        ) as resp:
            assert b'"ok"' in resp.read()
    finally:
        srv.shutdown()


def test_query_progressive_route(client):
    r = client.post(
        "/query/progressive",
        json={
            "sql": "SELECT COUNT(*) AS c FROM lineitem",
            "target_rel_error": 0.2,
            "mode": "systematic",
            "key_expr": "l_orderkey * 31 + l_linenumber",
        },
    )
    body = r.get_json()
    assert r.status_code == 200 and body["status"] == "ok"
    assert body["result"][0]["c"] > 0
    assert body["meta"]["steps"]
    # missing sql / bad mode -> 400 with error envelope
    assert client.post("/query/progressive", json={}).status_code == 400
    bad = client.post(
        "/query/progressive",
        json={"sql": "SELECT COUNT(*) AS c FROM lineitem", "mode": "systematic"},
    )
    assert bad.status_code == 400
    assert "key_expr" in bad.get_json()["error"]


def test_tables_partition_route(client):
    """POST /tables/partition materializes the time-partitioned layout
    and registers it; the bucket column is queryable (and prunes at
    file-listing time — measured in test_operators.py)."""
    r = client.post(
        "/tables/partition",
        json={"table": "events", "ts_col": "ts", "grain": "day"},
    )
    assert r.status_code == 200
    body = r.get_json()
    assert body["table"] == "events__by_day"
    assert body["partitions"] >= 3
    q = client.post(
        "/query",
        json={
            "sql": (
                "SELECT COUNT(*) AS n FROM events__by_day "
                "WHERE p_bucket = '2024-01-01'"
            )
        },
    )
    assert q.status_code == 200
    assert q.get_json()["result"][0]["n"] > 0
    assert client.post("/tables/partition", json={}).status_code == 400


def test_tables_analyze_route(client):
    """POST /tables/analyze returns the learned numeric ranges and feeds
    the catalog behind the planner's selectivity estimates."""
    r = client.post(
        "/tables/analyze",
        json={"table": "lineitem", "columns": ["l_quantity"]},
    )
    assert r.status_code == 200
    body = r.get_json()
    assert body["table"] == "lineitem"
    lo, hi = body["columns"]["l_quantity"]
    assert 1.0 <= lo < hi <= 50.0
    r2 = client.post("/tables/analyze", json={})
    assert r2.status_code == 400


def test_samples_systematic_route(client):
    """POST /samples/systematic: deterministic md5 1-in-k sample through
    HTTP — exact design fraction, plus the 400 envelope on bad input."""
    out = client.post(
        "/samples/systematic",
        json={"table": "orders", "k": 4, "key_expr": "o_orderkey"},
    ).get_json()
    assert out["sample_table"] == "orders__sys_4"
    assert out["fraction"] == 0.25 and out["rows"] > 0
    bad = client.post(
        "/samples/systematic", json={"table": "orders", "k": 1}
    )
    assert bad.status_code == 400


def test_maintenance_compaction_param(client):
    """POST /maintenance/run forwards compact_files_over (dry run: report
    only, no rewrites)."""
    out = client.post(
        "/maintenance/run",
        json={"dry_run": True, "compact_files_over": 8},
    ).get_json()
    assert "refreshed" in out and "errors" in out


def test_maintenance_apply_advice_param(client):
    """POST /maintenance/run forwards apply_advice + budget params; with
    no recurring workload recorded the applied list is empty but the
    report field is present (round 8)."""
    out = client.post(
        "/maintenance/run",
        json={
            "apply_advice": True,
            "advice_max_apply": 1,
            "advice_max_state_rows": 1000,
        },
    ).get_json()
    assert "rollup_advice_applied" in out
    assert isinstance(out["rollup_advice_applied"], list)


def test_maintenance_reprove_budget_param(client):
    """POST /maintenance/run forwards max_reprove_scans (round 10); a
    non-numeric budget gets the sibling endpoints' 400 JSON envelope."""
    out = client.post(
        "/maintenance/run", json={"max_reprove_scans": 0}
    ).get_json()
    assert "refreshed" in out and "errors" in out
    resp = client.post(
        "/maintenance/run", json={"max_reprove_scans": "lots"}
    )
    assert resp.status_code == 400
    assert resp.get_json()["status"] == "error"


def test_query_max_rank_error_param(client, engine):
    """POST /query forwards max_rank_error: a zero rank budget forbids
    KLL-served quantiles even when a rollup tracks the column (round 8)."""
    engine.create_rollup(
        "events", "ts", "1 hour", dims=["event_type"],
        quantile_cols=["value"], kll_k=800,
    )
    sql = (
        "SELECT event_type, MEDIAN(value) AS med FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-05 00:00:00' GROUP BY event_type"
    )
    try:
        routed = client.post(
            "/query", json={"sql": sql, "max_rank_error": 0.05}
        ).get_json()
        assert routed["status"] == "ok"
        assert "KLL sketch state" in routed["plan"]["reason"]
        forbidden = client.post(
            "/query", json={"sql": sql, "max_rank_error": 0.0}
        ).get_json()
        assert forbidden["status"] == "ok"
        assert "rollup" not in forbidden["plan"]["reason"]
    finally:
        engine.catalog.rollups.pop("events", None)


def test_rollups_routes(client, engine):
    """POST /rollups/create + GET /rollups: a created rollup lists, and
    a matching /query is answered from it (round-6 routing surface)."""
    out = client.post(
        "/rollups/create",
        json={
            "table": "events",
            "time_col": "ts",
            "bucket": "1 hour",
            "dims": ["event_type"],
            "measures": ["value"],
        },
    ).get_json()
    assert out["rollup"] == "events__rollup_1_hour"
    assert out["buckets"] > 0
    listed = client.get("/rollups").get_json()
    assert [e["view"] for e in listed["events"]] == ["events__rollup_1_hour"]
    assert "path" not in listed["events"][0]
    r = client.post(
        "/query",
        json={
            "sql": (
                "SELECT event_type, COUNT(*) AS n FROM events "
                "GROUP BY event_type ORDER BY event_type"
            )
        },
    ).get_json()
    assert "answered from materialized rollup" in r["plan"]["reason"]
    rf = client.post("/rollups/refresh", json={"table": "events"}).get_json()
    assert rf["rollup"] == "events__rollup_1_hour"
    assert rf["refreshed_since"].startswith("2024-")
    bad = client.post(
        "/rollups/create",
        json={"table": "events", "time_col": "ts", "bucket": "1 month"},
    )
    assert bad.status_code == 400  # variable-width bucket
    bad2 = client.post("/rollups/refresh", json={"table": "nation"})
    assert bad2.status_code == 400  # no rollup registered
    # the engine fixture is session-scoped: disarm so later tests'
    # events-aggregate plan assertions stay order-independent
    engine.catalog.rollups.pop("events", None)
    engine.catalog.save()


def test_rollup_state_routes(client, engine):
    """POST /rollups/top_items and /rollups/audience_diff answer from
    combined sketch state; guard errors surface as 400s."""
    out = client.post(
        "/rollups/create",
        json={
            "table": "events",
            "time_col": "ts",
            "bucket": "30 minutes",
            "dims": [],
            "measures": [],
            "topk_cols": ["user_id"],
            "topk_budget": 1024,
            "theta_cols": ["user_id"],
        },
    ).get_json()
    assert out["rollup"] == "events__rollup_30_minutes"
    top = client.post(
        "/rollups/top_items",
        json={
            "table": "events",
            "column": "user_id",
            "k": 3,
            "lo": "2024-01-02 00:00:00",
            "hi": "2024-01-05 00:00:00",
            "candidate_k": 1024,
        },
    ).get_json()
    assert len(top["items"]) == 3
    assert top["items"][0]["rank"] == 1
    assert top["items"][0]["cnt"] >= top["items"][1]["cnt"]
    diff = client.post(
        "/rollups/audience_diff",
        json={
            "table": "events",
            "column": "user_id",
            "a_lo": "2024-01-02 00:00:00",
            "a_hi": "2024-01-03 00:00:00",
            "b_lo": "2024-01-03 00:00:00",
            "b_hi": "2024-01-04 00:00:00",
        },
    ).get_json()
    assert diff["union_cnt"] == (
        diff["distinct_a"] + diff["new_in_b"]
    )
    assert diff["returning"] + diff["new_in_b"] == diff["distinct_b"]
    # misaligned bound → 400, not a silently sliced bucket
    bad = client.post(
        "/rollups/top_items",
        json={
            "table": "events",
            "column": "user_id",
            "lo": "2024-01-02 00:10:09",
        },
    )
    assert bad.status_code == 400


def test_layouts_list_route(client, engine):
    """GET /layouts mirrors GET /rollups for partitioned layouts."""
    out = client.get("/layouts").get_json()
    assert isinstance(out, dict)
    if "events" in out:  # registered by an earlier routing test
        info = out["events"]
        assert info["partition_col"] == "p_bucket"
        assert "path" not in info


def test_rollups_quantile_bounds_route(client, engine):
    """POST /rollups/quantile_bounds returns the value bracket implied
    by the KLL rank guarantee (round 8)."""
    engine.create_rollup(
        "events", "ts", "1 hour", dims=["event_type"],
        quantile_cols=["value"], kll_k=800,
    )
    try:
        out = client.post(
            "/rollups/quantile_bounds",
            json={
                "table": "events", "column": "value", "p": 0.9,
                "lo": "2024-01-02 00:00:00", "hi": "2024-01-05 00:00:00",
            },
        ).get_json()
        assert out["value_lo"] <= out["estimate"] <= out["value_hi"]
        assert out["rank_epsilon"] > 0
        miss = client.post(
            "/rollups/quantile_bounds", json={"table": "events"}
        )
        assert miss.status_code == 400
    finally:
        engine.catalog.rollups.pop("events", None)


def test_layouts_recommend_route(client):
    """GET /layouts/recommend returns the layout advisor's suggestions
    (empty until a recurring time-bounded shape is observed)."""
    out = client.get("/layouts/recommend?min_count=3").get_json()
    assert "recommendations" in out
    assert isinstance(out["recommendations"], list)


def test_overlap_endpoint(client, engine):
    """POST /overlap (round 10): raw-scan answer with advisor recording
    when time_col is named; routes to theta state once a serving rollup
    exists; bad windowed requests get the 400 JSON envelope."""
    out = client.post(
        "/overlap",
        json={
            "table": "events",
            "segment_col": "event_type",
            "key_col": "user_id",
            "time_col": "ts",
        },
    ).get_json()
    assert out["source"] == "raw_scan", out
    assert out["rows"] and {"seg_a", "seg_b", "jaccard"} <= set(
        out["rows"][0]
    )
    engine.create_rollup(
        "events", "ts", "1 day", dims=["event_type"],
        theta_cols=["user_id"],
    )
    routed = client.post(
        "/overlap",
        json={
            "table": "events",
            "segment_col": "event_type",
            "key_col": "user_id",
            "lo": "2024-01-02 00:00:00",
            "hi": "2024-01-05 00:00:00",
        },
    ).get_json()
    assert routed["source"] == "rollup_state", routed
    resp = client.post(
        "/overlap",
        json={"table": "events", "segment_col": "event_type"},
    )
    assert resp.status_code == 400
    assert resp.get_json()["status"] == "error"


def test_audience_diff_endpoint_time_col_fallback(client):
    """POST /rollups/audience_diff forwards time_col (round 10): with no
    theta rollup the answer comes exactly from one raw pass instead of
    a 400."""
    # event_id: no theta rollup tracks it (the module-scope engine may
    # carry user_id theta state from the /overlap test above)
    out = client.post(
        "/rollups/audience_diff",
        json={
            "table": "events",
            "column": "event_id",
            "a_lo": "2024-01-02 00:00:00",
            "a_hi": "2024-01-03 00:00:00",
            "b_lo": "2024-01-03 00:00:00",
            "b_hi": "2024-01-04 00:00:00",
            "time_col": "ts",
        },
    ).get_json()
    assert out.get("source") == "raw_scan", out
    assert out["union_cnt"] >= max(out["distinct_a"], out["distinct_b"])


def test_query_overlap_sql_idiom_over_http(client, engine):
    """Round 11: the overlap SQL idioms ride the existing POST /query
    contract. With no serving theta rollup the idiom executes exactly
    (and its shape enters the theta advisor book); value column follows
    the AS alias like every other query."""
    # o_clerk/o_custkey: columns no other module-scoped test tracks in
    # rollup state, so this stays order-independent
    sql = (
        "SELECT COUNT(DISTINCT a.o_custkey) AS oc FROM orders a "
        "JOIN orders b ON a.o_custkey = b.o_custkey "
        "WHERE a.o_orderpriority = '1-URGENT' "
        "AND b.o_orderpriority = '5-LOW'"
    )
    r = client.post("/query", json={"sql": sql})
    body = r.get_json()
    assert r.status_code == 200 and body["status"] == "ok"
    assert body["plan"]["type"] == "exact"
    assert body["result"][0]["oc"] >= 0
    shapes = [
        s
        for s in engine.catalog.rollup_candidates.values()
        if s.get("theta_cols") == ["o_custkey"]
    ]
    assert shapes and shapes[0]["dims"] == ["o_orderpriority"], shapes
    # clock inferred (orders has exactly one date-typed column)
    assert shapes[0]["time_col"] == "o_orderdate", shapes


def test_ann_routes(client, engine):
    """Round-12 ANN surface over HTTP: build registers the index, query
    answers by id-list and by inline vectors, staleness declines 409."""
    import random

    spark = engine.spark
    rng = random.Random(41)
    rows = []
    for i in range(48):
        c = i % 4
        center = [2.0 * ((c >> b) & 1) - 1.0 for b in range(2)] + [0.0] * 4
        rows.append((i, [x + rng.uniform(-0.05, 0.05) for x in center]))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).createOrReplaceTempView("api_vecs")
    r = client.post(
        "/ann/build", json={"table": "api_vecs", "nlist": 4, "seed": 2}
    )
    assert r.status_code == 200, r.get_json()
    entry = r.get_json()
    assert entry["kind"] == "ivf" and entry["built_row_count"] == 48
    r = client.post(
        "/ann/query",
        json={
            "table": "api_vecs",
            "ids": [0, 1],
            "k": 3,
            "nprobe": 2,
            "exclude_self": True,
        },
    )
    assert r.status_code == 200, r.get_json()
    nb = r.get_json()["neighbors"]
    assert len(nb) == 6
    assert {n["query_id"] for n in nb} == {0, 1}
    # inline-vector form: a probe vector near cluster 0's center
    r = client.post(
        "/ann/query",
        json={
            "table": "api_vecs",
            "vectors": [[999, [-1.0, -1.0, 0.0, 0.0, 0.0, 0.0]]],
            "k": 2,
            "nprobe": 2,
        },
    )
    assert r.status_code == 200, r.get_json()
    nb = r.get_json()["neighbors"]
    assert len(nb) == 2 and all(n["query_id"] == 999 for n in nb)
    # staleness declines 409 until maintenance runs
    engine.catalog.upsert_table_stats("api_vecs", 49)
    r = client.post(
        "/ann/query", json={"table": "api_vecs", "ids": [0], "k": 1}
    )
    assert r.status_code == 409, (r.status_code, r.get_json())
    engine.catalog.upsert_table_stats("api_vecs", 48)  # restore


def test_boilerplate_routes(client, engine):
    """Round-12 boilerplate index over HTTP: build, disjoint update,
    re-fed batch refused with 409."""
    spark = engine.spark
    spark.createDataFrame(
        [(i, f"Banner Line\nbody {i}") for i in range(30)],
        "doc_id long, text string",
    ).createOrReplaceTempView("api_docs")
    r = client.post(
        "/boilerplate/build", json={"table": "api_docs", "min_docs": 25}
    )
    assert r.status_code == 200, r.get_json()
    assert r.get_json()["built_row_count"] == 30
    spark.createDataFrame(
        [(i, f"Banner Line\nnew body {i}") for i in range(100, 110)],
        "doc_id long, text string",
    ).createOrReplaceTempView("api_docs_b2")
    r = client.post(
        "/boilerplate/update",
        json={"table": "api_docs", "batch_view": "api_docs_b2"},
    )
    assert r.status_code == 200, r.get_json()
    body = r.get_json()
    # the banner crossed min_docs in batch 1 — stripped from all 10
    assert body["cleaned_docs"] == 10 and body["lines_removed"] == 10
    assert body["entry"]["built_row_count"] == 40
    # re-feeding the same batch is refused: additive counts would
    # double-count it
    r = client.post(
        "/boilerplate/update",
        json={"table": "api_docs", "batch_view": "api_docs_b2"},
    )
    assert r.status_code == 409, (r.status_code, r.get_json())


def test_semantic_dedup_routes(client, engine):
    """Round-14 SemDedup surface over HTTP (VERDICT r13 #1): the full
    pass returns flagged ids / pairs from the registered index, the
    incremental update assigns a new batch into the persisted buckets
    and appends its codes, a re-fed batch is refused with 409, a NULL-id
    batch with 400, and a stale index declines 409."""
    import math

    spark = engine.spark
    # distinct directions 0.12 rad apart (pairwise cosine <= 0.9964,
    # below the 0.999 threshold) so the ONLY above-threshold pair is
    # the planted copy
    rows = [
        (i, [math.cos(0.12 * i), math.sin(0.12 * i), 1.0])
        for i in range(40)
    ]
    rows.append((99, [x * 1.0000001 for x in rows[0][1]]))  # planted dup
    schema = "vec_id long, embedding array<double>"
    spark.createDataFrame(rows, schema).createOrReplaceTempView("api_sem")
    r = client.post(
        "/ann/build", json={"table": "api_sem", "nlist": 4, "seed": 9}
    )
    assert r.status_code == 200, r.get_json()
    # full pass, marking form: the planted copy (larger id) is flagged
    r = client.post(
        "/dedup/semantic", json={"table": "api_sem", "threshold": 0.999}
    )
    assert r.status_code == 200, r.get_json()
    body = r.get_json()
    assert body["duplicates"] == 1 and body["flagged_ids"] == [99]
    # full pass, pairs form
    r = client.post(
        "/dedup/semantic",
        json={"table": "api_sem", "threshold": 0.999, "return_pairs": True},
    )
    assert r.status_code == 200
    assert {(p["id_a"], p["id_b"]) for p in r.get_json()["pairs"]} == {(0, 99)}
    # incremental update: a dup of id 7 and a novel vector
    spark.createDataFrame(
        [
            (200, [x * 1.0000002 for x in rows[7][1]]),
            (201, [9.0, -9.0, 9.0]),
        ],
        schema,
    ).createOrReplaceTempView("api_sem_b2")
    r = client.post(
        "/dedup/semantic/update",
        json={
            "table": "api_sem",
            "batch_view": "api_sem_b2",
            "threshold": 0.999,
        },
    )
    assert r.status_code == 200, r.get_json()
    body = r.get_json()
    assert body["duplicates"] == 1 and body["flagged_ids"] == [200]
    assert body["entry"]["built_row_count"] == 43
    # base-table contract: the caller appends the batch to the table
    spark.createDataFrame(
        rows + [(200, [x * 1.0000002 for x in rows[7][1]]),
                (201, [9.0, -9.0, 9.0])],
        schema,
    ).createOrReplaceTempView("api_sem")
    # re-feeding the same batch is refused with 409
    r = client.post(
        "/dedup/semantic/update",
        json={"table": "api_sem", "batch_view": "api_sem_b2"},
    )
    assert r.status_code == 409, (r.status_code, r.get_json())
    # NULL-id batch is a 400 (malformed), never a conflict
    spark.createDataFrame(
        [(None, [1.0, 1.0, 1.0])], schema
    ).createOrReplaceTempView("api_sem_null")
    r = client.post(
        "/dedup/semantic/update",
        json={"table": "api_sem", "batch_view": "api_sem_null"},
    )
    assert r.status_code == 400, (r.status_code, r.get_json())
    # a real mutation declines 409 on BOTH routes
    engine.catalog.upsert_table_stats("api_sem", 999)
    assert client.post(
        "/dedup/semantic", json={"table": "api_sem"}
    ).status_code == 409
    assert client.post(
        "/dedup/semantic/update",
        json={"table": "api_sem", "batch_view": "api_sem_b2"},
    ).status_code == 409
    engine.catalog.upsert_table_stats("api_sem", 43)  # restore


def test_ann_skew_route(client, engine):
    """Round-14 observability: GET /ann/skew reports the registered IVF
    index's bucket-population skew (footer probe on the partitioned
    layout), the entry's threshold, and whether a re-train is advised;
    unknown tables are a 404."""
    spark = engine.spark
    rows = [(i, [float(i % 5), float(i % 3), 1.0]) for i in range(40)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).createOrReplaceTempView("api_skew_vecs")
    r = client.post(
        "/ann/build",
        json={"table": "api_skew_vecs", "nlist": 4, "seed": 3,
              "skew_threshold": 5.0},
    )
    assert r.status_code == 200, r.get_json()
    r = client.get("/ann/skew?table=api_skew_vecs")
    assert r.status_code == 200, r.get_json()
    body = r.get_json()
    assert body["probe"] == "footers"
    assert body["skew"]["buckets"] == 4
    assert body["skew_threshold"] == 5.0
    assert body["retrain_advised"] == (body["skew"]["ratio"] > 5.0)
    assert client.get("/ann/skew?table=nope").status_code == 404
    assert client.get("/ann/skew").status_code == 400
