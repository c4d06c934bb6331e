"""Round-13 review fixes (r12 ADVICE items).

1. The maintenance quantized-codes arm runs the ghost probe on EVERY
   sweep: an equal-row-count mutation (delete N ids, insert N new ones)
   must trip a rebuild — unlike rollup staleness, a ghost code returns
   WRONG NEIGHBORS, not a coarser approximation.
2. prepare_corpus never drops a NULL-id document: the boilerplate and
   LM stages join their metrics back with LEFT joins (a NULL id carries
   NULL stage metrics and falls through to the other checks).
3. POST /ann/query's ``ids`` form filters with a typed isin, so an ANN
   index built over a string-typed id column stays queryable by id.
"""

import tempfile

import pytest

from approximate_query_engine_spark import AQEngine

SF_SMOKE = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- 1
def test_equal_count_mutation_trips_ghost_probe(spark):
    eng = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_ghost_"))
    rows = [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(40)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).createOrReplaceTempView("ghost_vecs")
    eng.build_quantized_codes("ghost_vecs")
    assert eng.catalog.quantized_codes["ghost_vecs"]["version"] == 1
    # delete id 0, insert id 1000: row count unchanged, contents mutated
    mutated = rows[1:] + [(1000, [0.5, 0.5, 1.0])]
    spark.createDataFrame(
        mutated, "vec_id long, embedding array<double>"
    ).createOrReplaceTempView("ghost_vecs")
    rep = eng.maintain(max_drift=0.10)
    acts = [a for a in rep["refreshed"] if a["kind"] == "quantized_codes"]
    assert len(acts) == 1 and acts[0]["mode"] == "rebuild", rep
    assert "unchanged row count" in acts[0]["reason"], acts
    info = eng.catalog.quantized_codes["ghost_vecs"]
    assert info["version"] == 2, info
    # the rebuilt code table no longer serves the deleted vector
    ids = {
        r["vec_id"] for r in spark.read.parquet(info["path"]).collect()
    }
    assert 0 not in ids and 1000 in ids
    # and an untouched table still reads fresh (the probe found nothing)
    rep = eng.maintain(max_drift=0.10)
    assert any(
        s.startswith("ghost_vecs:quantized") for s in rep["fresh"]
    ), rep


# ---------------------------------------------------------------- 2
def test_prepare_corpus_keeps_null_id_docs(spark):
    from approximate_query_engine_spark.functions.pipeline import (
        prepare_corpus,
    )

    banner = "SUBSCRIBE NOW"
    docs = [
        (i, f"{banner}\nunique body text number {i} runs along here")
        for i in range(12)
    ] + [(None, f"{banner}\nan orphan document with no id at all")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    ref = spark.createDataFrame(
        [(100 + i, f"unique body text number {i} runs along here") for i in range(12)],
        "doc_id int, text string",
    )
    out = prepare_corpus(
        df,
        min_tokens=2,
        boilerplate_min_docs=5,
        lm_ref=ref,
        lm_max_ppl=1e12,
        dedup=None,
    ).collect()
    # no document vanished — including the NULL-id one
    assert len(out) == 13, sorted(
        (r["doc_id"], r["reject_reason"]) for r in out
    )
    orphan = [r for r in out if r["doc_id"] is None]
    assert len(orphan) == 1
    # NULL id ⇒ no boilerplate/LM metric rows matched back, and the doc
    # keeps its ORIGINAL text (banner intact) rather than a NULL text
    assert orphan[0]["lines_removed"] is None
    assert orphan[0]["ppl"] is None
    assert orphan[0]["token_count"] > 2
    # identified docs did get their banner stripped and their LM score
    scored = [r for r in out if r["doc_id"] == 3][0]
    assert scored["lines_removed"] == 1
    assert scored["ppl"] is not None


# ---------------------------------------------------------------- 3
def test_ann_query_ids_string_typed(spark):
    flask = pytest.importorskip("flask")  # noqa: F841
    import random

    from approximate_query_engine_spark.api import create_app

    eng = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_sid_"))
    rng = random.Random(7)
    rows = [
        (
            f"doc-{i:03d}",
            [rng.uniform(-1, 1), rng.uniform(-1, 1), 1.0, 0.0],
        )
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "vec_id string, embedding array<double>"
    ).createOrReplaceTempView("sid_vecs")
    app = create_app(eng)
    app.config["TESTING"] = True
    client = app.test_client()
    r = client.post(
        "/ann/build", json={"table": "sid_vecs", "nlist": 4, "seed": 3}
    )
    assert r.status_code == 200, r.get_json()
    r = client.post(
        "/ann/query",
        json={
            "table": "sid_vecs",
            "ids": ["doc-000", "doc-001"],
            "k": 2,
            "nprobe": 2,
            "exclude_self": True,
        },
    )
    assert r.status_code == 200, r.get_json()
    nb = r.get_json()["neighbors"]
    assert {n["query_id"] for n in nb} == {"doc-000", "doc-001"}
    # empty id list is a loud 400, not a silent empty scan
    r = client.post(
        "/ann/query", json={"table": "sid_vecs", "ids": [], "k": 1}
    )
    assert r.status_code == 400, (r.status_code, r.get_json())


# ---------------------------------------------------------------- 4
def test_version_grace_window_keeps_concurrent_readers_alive(spark):
    """Round-13 (VERDICT r12 #6): every versioned artifact family prunes
    superseded versions behind a ONE-VERSION grace window — a session
    that resolved the catalog pointer just before an update can still
    collect its lazily-read previous version; only the next update
    retires it."""
    import os

    from pyspark.sql import functions as F

    from approximate_query_engine_spark.functions.boilerplate import (
        read_line_frequency,
    )
    from approximate_query_engine_spark.functions.quantization import (
        read_quantized_codes,
    )

    eng = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_grace_"))

    # --- boilerplate family ---
    spark.createDataFrame(
        [(i, f"Banner\nbody {i}") for i in range(20)],
        "doc_id int, text string",
    ).createOrReplaceTempView("grace_docs")
    b1 = eng.build_boilerplate_index("grace_docs", min_docs=5)
    freq_v1, _, _ = read_line_frequency(spark, b1["path"])  # lazy v1 reader
    batch = spark.createDataFrame(
        [(100 + i, f"Banner\nnew {i}") for i in range(5)],
        "doc_id int, text string",
    )
    _, b2 = eng.update_boilerplate_index("grace_docs", batch)
    assert b2["version"] == 2
    # the v1 reader still completes (grace), and v1 is still on disk
    assert freq_v1.count() > 0
    assert os.path.exists(b1["path"]) and os.path.exists(b2["path"])

    # --- quantized-codes family ---
    rows = [(i, [float(i % 5), 1.0]) for i in range(30)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).createOrReplaceTempView("grace_vecs")
    q1 = eng.build_quantized_codes("grace_vecs")
    codes_v1, _ = read_quantized_codes(spark, q1["path"])
    q2 = eng.build_quantized_codes("grace_vecs")  # rebuild → v2
    assert q2["version"] == 2
    assert codes_v1.count() == 30  # v1 reader survives the rebuild
    assert os.path.exists(q1["path"])
    q3 = eng.build_quantized_codes("grace_vecs")  # v3 retires v1
    assert q3["version"] == 3
    assert not os.path.exists(q1["path"])
    assert os.path.exists(q2["path"])
