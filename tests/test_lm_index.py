"""Engine-level LM lifecycle (round 13, VERDICT r12 #1): the bigram
language model gets the boilerplate/quantizer operational treatment —
a versioned catalog artifact, an additive incremental count merge under
the ENFORCED disjoint-batch guard, a maintenance drift policy, and an
HTTP surface. The core oracle claim (incremental fit ≡ one batch fit
over the union) is also driver-checked as q118."""

import tempfile

import pytest

from approximate_query_engine_spark import AQEngine


def _docs(spark, lo, hi, tag="ref"):
    rows = [
        (i, f"the quick brown fox {tag} number {i} jumps over the lazy dog")
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


@pytest.fixture()
def eng(spark):
    return AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_lm_"))


def test_build_registers_versioned_artifact(spark, eng):
    _docs(spark, 0, 30).createOrReplaceTempView("lm_ref")
    entry = eng.build_lm_index("lm_ref")
    assert entry["version"] == 1
    assert entry["built_row_count"] == 30
    assert entry["vocab_size"] > 0
    assert entry["path"].endswith("v1")
    # the persisted artifact round-trips with the full sidecar set
    from approximate_query_engine_spark.functions.lm import (
        read_bigram_lm_state,
    )

    uni, bi, v, seen, meta = read_bigram_lm_state(spark, entry["path"])
    assert v == entry["vocab_size"]
    assert seen is not None and seen.count() == 30
    assert meta["text_col"] == "text" and meta["id_col"] == "doc_id"


def test_incremental_merge_equals_batch_fit(spark, eng):
    """The q118 claim at unit scale: build on batch 1, update with a
    DISJOINT batch 2 → count tables identical to one fit over the
    union, version advanced, superseded versions pruned behind a
    one-version grace window."""
    import os

    from approximate_query_engine_spark.functions.lm import (
        fit_bigram_lm,
        read_bigram_lm,
    )

    _docs(spark, 0, 20, "alpha").createOrReplaceTempView("lm_ref2")
    e1 = eng.build_lm_index("lm_ref2")
    e2 = eng.update_lm_index("lm_ref2", _docs(spark, 20, 35, "beta"))
    assert e2["version"] == 2 and e2["built_row_count"] == 35
    # v1 survives ONE update (the grace window: a concurrent reader of
    # the just-superseded version finishes its scan) and is retired by
    # the next — superseded versions never accumulate past the grace
    assert os.path.exists(e1["path"])
    e3 = eng.update_lm_index("lm_ref2", _docs(spark, 35, 40, "gamma"))
    assert e3["version"] == 3
    assert not os.path.exists(e1["path"])
    assert os.path.exists(e2["path"])
    uni_m, bi_m, v_m = read_bigram_lm(spark, e2["path"])
    union = _docs(spark, 0, 20, "alpha").unionByName(
        _docs(spark, 20, 35, "beta")
    )
    uni_b, bi_b = fit_bigram_lm(union)
    assert sorted(map(tuple, uni_m.collect())) == sorted(
        map(tuple, uni_b.collect())
    )
    assert sorted(map(tuple, bi_m.collect())) == sorted(
        map(tuple, bi_b.collect())
    )
    assert v_m == uni_b.count()


def test_disjoint_batch_guard_raises(spark, eng):
    _docs(spark, 0, 10).createOrReplaceTempView("lm_ref3")
    eng.build_lm_index("lm_ref3")
    with pytest.raises(ValueError, match="double-count"):
        eng.update_lm_index("lm_ref3", _docs(spark, 5, 15))
    # the failed update never moved the pointer
    assert eng.catalog.lm_indexes["lm_ref3"]["version"] == 1


def test_lm_score_uses_registered_model(spark, eng):
    from approximate_query_engine_spark.functions.lm import (
        fit_bigram_lm,
        score_documents,
    )

    ref = _docs(spark, 0, 25)
    ref.createOrReplaceTempView("lm_ref4")
    eng.build_lm_index("lm_ref4")
    cand = spark.createDataFrame(
        [
            (100, "the quick brown fox ref number 3 jumps over the lazy dog"),
            (101, "zzz completely unseen gibberish tokens qqq www"),
            (102, None),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r for r in eng.lm_score("lm_ref4", cand).collect()
    }
    uni, bi = fit_bigram_lm(ref)
    want = {
        r["doc_id"]: r for r in score_documents(cand, uni, bi).collect()
    }
    assert set(got) == {100, 101, 102}
    for k in got:
        assert got[k]["bigram_hits"] == want[k]["bigram_hits"]
        assert got[k]["sum_hit_count"] == want[k]["sum_hit_count"]
        assert got[k]["oov_bigrams"] == want[k]["oov_bigrams"]
    # the fluent doc walks reference paths; the gibberish doc is all OOV
    assert got[100]["bigram_hits"] > 0
    assert got[101]["bigram_hits"] == 0
    assert got[102]["n_tokens"] == 0 and got[102]["ppl"] is None
    # threshold form keeps the fluent doc, drops the gibberish one,
    # keeps the no-evidence doc only above min_tokens (102 has none)
    kept = {
        r["doc_id"]
        for r in eng.lm_score(
            "lm_ref4", cand, max_oov_frac=0.5, min_tokens=1
        ).collect()
    }
    assert kept == {100}


def test_maintenance_refits_drifted_reference(spark, eng):
    _docs(spark, 0, 20).createOrReplaceTempView("lm_ref5")
    eng.build_lm_index("lm_ref5")
    # fed append through the incremental path → still fresh
    eng.update_lm_index("lm_ref5", _docs(spark, 20, 24))
    _docs(spark, 0, 24).createOrReplaceTempView("lm_ref5")
    rep = eng.maintain(max_drift=0.10)
    assert any(s.startswith("lm_ref5:lm[v2]") for s in rep["fresh"]), rep
    # unfed mutation past the threshold → refit to v3
    _docs(spark, 0, 40).createOrReplaceTempView("lm_ref5")
    rep = eng.maintain(max_drift=0.10)
    acts = [a for a in rep["refreshed"] if a["kind"] == "lm_index"]
    assert len(acts) == 1 and acts[0]["new_docs"] == 40, rep
    assert eng.catalog.lm_indexes["lm_ref5"]["version"] == 3
    # dry_run only reports
    _docs(spark, 0, 60).createOrReplaceTempView("lm_ref5")
    rep = eng.maintain(max_drift=0.10, dry_run=True)
    acts = [a for a in rep["refreshed"] if a["kind"] == "lm_index"]
    assert acts and acts[0]["dry_run"] is True
    assert eng.catalog.lm_indexes["lm_ref5"]["version"] == 3


def test_catalog_roundtrip_across_sessions(spark, eng):
    """A second engine over the same workdir sees the registered LM and
    scores with it — the cross-session CCNet workflow."""
    _docs(spark, 0, 15).createOrReplaceTempView("lm_ref6")
    eng.build_lm_index("lm_ref6")
    eng2 = AQEngine(spark, workdir=eng.catalog.workdir)
    assert eng2.catalog.lm_indexes["lm_ref6"]["version"] == 1
    cand = _docs(spark, 100, 103)
    assert eng2.lm_score("lm_ref6", cand).count() == 3


def test_http_lm_routes(spark):
    pytest.importorskip("flask")
    from approximate_query_engine_spark.api import create_app

    eng = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_lmapi_"))
    app = create_app(eng)
    app.config["TESTING"] = True
    client = app.test_client()
    _docs(spark, 0, 20).createOrReplaceTempView("lm_api_ref")
    r = client.post("/lm/build", json={"table": "lm_api_ref"})
    assert r.status_code == 200, r.get_json()
    assert r.get_json()["version"] == 1
    _docs(spark, 20, 30).createOrReplaceTempView("lm_api_b2")
    r = client.post(
        "/lm/update",
        json={"table": "lm_api_ref", "batch_view": "lm_api_b2"},
    )
    assert r.status_code == 200, r.get_json()
    assert r.get_json()["version"] == 2
    assert r.get_json()["built_row_count"] == 30
    # re-fed batch → 409
    r = client.post(
        "/lm/update",
        json={"table": "lm_api_ref", "batch_view": "lm_api_b2"},
    )
    assert r.status_code == 409, (r.status_code, r.get_json())
    _docs(spark, 100, 104).createOrReplaceTempView("lm_api_cand")
    r = client.post(
        "/lm/score",
        json={"table": "lm_api_ref", "docs_view": "lm_api_cand", "limit": 10},
    )
    assert r.status_code == 200, r.get_json()
    scored = r.get_json()["scored"]
    assert len(scored) == 4
    assert all("bigram_hits" in s and "ppl" in s for s in scored)
    # unknown model → 400
    r = client.post(
        "/lm/score", json={"table": "nope", "docs_view": "lm_api_cand"}
    )
    assert r.status_code == 400


def test_null_id_batch_refused(spark, eng):
    """A NULL document id can never satisfy the disjoint contract (the
    seen-id semi-join never matches NULL keys, so a re-fed NULL-id doc
    would double-count silently) — the update refuses it loudly."""
    _docs(spark, 0, 10).createOrReplaceTempView("lm_ref7")
    eng.build_lm_index("lm_ref7")
    bad = spark.createDataFrame(
        [(None, "a document with no id")], "doc_id int, text string"
    )
    with pytest.raises(ValueError, match="NULL document ids"):
        eng.update_lm_index("lm_ref7", bad)
    assert eng.catalog.lm_indexes["lm_ref7"]["version"] == 1


def test_lm_update_refuses_in_batch_duplicate_ids(spark):
    """Round-14 review: a batch repeating a document id WITHIN itself
    double-counts that document's grams in one feed — the seen-id set
    (which stores the id once) can never catch it afterward, so the
    guard refuses before any count is merged."""
    import tempfile

    import pytest

    from approximate_query_engine_spark import AQEngine

    spark.createDataFrame(
        [(i, f"alpha beta doc {i}") for i in range(10)],
        "doc_id long, text string",
    ).createOrReplaceTempView("lmdup_ref")
    eng = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_lmdup_"))
    eng.build_lm_index("lmdup_ref")
    dup_batch = spark.createDataFrame(
        [(100, "gamma delta"), (100, "gamma delta"), (101, "epsilon")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="duplicate document ids"):
        eng.update_lm_index("lmdup_ref", dup_batch)
    assert eng.catalog.lm_indexes["lmdup_ref"]["version"] == 1
