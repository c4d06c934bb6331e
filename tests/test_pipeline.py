"""Corpus-preparation chain (functions/pipeline.py): reason priority,
whole-corpus dedup semantics, report accounting, clean_corpus output."""

import pytest
from pyspark.sql import functions as F

from approximate_query_engine_spark.functions.pipeline import (
    clean_corpus,
    corpus_report,
    prepare_corpus,
)

GOOD = (
    "the data pipeline processed a batch of records in the cluster today "
    "and the results are stored in the table for this run as it was planned"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, GOOD),  # kept
        (2, "short text"),  # too_short (2 tokens)
        (3, GOOD),  # duplicate of 1 (otherwise acceptable)
        (4, "der die das und ist nicht ein der die das und ist nicht "
            "ein der die das und ist nicht ein und der die"),  # lang=de
        (5, "x " * 400),  # too_long
        (6, "short text"),  # dup of 2 AND too_short -> too_short wins
        (7, "the of zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg"),
        # 7: lang-ID says en (two markers) but junk tokens -> low quality
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def annotated(docs):
    return prepare_corpus(
        docs,
        min_tokens=5,
        max_tokens=100,
        languages=["en"],
        min_quality=0.5,
        dedup="exact",
    ).cache()


def _reasons(annotated):
    return {r["doc_id"]: r["reject_reason"] for r in annotated.collect()}


def test_reason_priority_and_attribution(annotated):
    r = _reasons(annotated)
    assert r[1] is None
    assert r[2] == "too_short"
    assert r[3] == "duplicate"  # passes every other filter
    assert r[4] == "lang"
    assert r[5] == "too_long"
    # higher-priority reason wins even though 6 is also a duplicate
    assert r[6] == "too_short"
    assert r[7] == "low_quality"


def test_report_sums_to_corpus(annotated, docs):
    rep = {r["reason"]: r["n_docs"] for r in corpus_report(annotated).collect()}
    assert sum(rep.values()) == docs.count()
    assert rep["kept"] == 1
    assert rep["duplicate"] == 1
    assert rep["too_short"] == 2


def test_clean_corpus_drops_metrics(annotated):
    clean = clean_corpus(annotated)
    assert clean.columns == ["doc_id", "text"]
    assert [r["doc_id"] for r in clean.collect()] == [1]


def test_none_filters_skipped(docs):
    out = prepare_corpus(docs, min_tokens=1, dedup=None)
    assert "lang_pred" not in out.columns
    assert "quality_score" not in out.columns
    assert "is_duplicate" not in out.columns
    # only the token filter runs; nothing here has <1 token
    assert out.where(F.col("reject_reason").isNotNull()).count() == 0


def test_bad_dedup_mode_rejected(docs):
    with pytest.raises(ValueError):
        prepare_corpus(docs, dedup="minhash")


def test_boilerplate_stage_runs_before_filters(spark):
    # 5 docs share a banner; doc 4 is banner-only. With the boilerplate
    # stage on, the banner strips FIRST, so doc 4 falls to too_short —
    # its banner tokens must not inflate the count past the filter.
    rows = [(i, "the shared banner line\nreal body %d here" % i)
            for i in range(4)] + [(4, "the shared banner line")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = prepare_corpus(
        docs, min_tokens=2, dedup=None, boilerplate_min_docs=5
    )
    r = {x["doc_id"]: x for x in out.collect()}
    assert r[4]["reject_reason"] == "too_short"
    assert r[4]["lines_removed"] == 1
    assert r[0]["reject_reason"] is None
    assert r[0]["token_count"] == 4  # cleaned text only
    # the metric column is dropped by clean_corpus like the others
    assert "lines_removed" not in clean_corpus(out).columns
    # without the stage, the banner-only doc passes the token filter
    out2 = prepare_corpus(docs, min_tokens=2, dedup=None)
    assert {x["doc_id"]: x["reject_reason"] for x in out2.collect()}[4] is None


def test_prepare_corpus_lm_stage(spark):
    """The LM stage (round 12): disfluent docs reject with reason 'lm'
    AFTER the cheap heuristics win their docs, NULL-score docs never
    fall to 'lm', and the pre-fitted lm_tables path equals the lm_ref
    fit path."""
    from approximate_query_engine_spark.functions.lm import fit_bigram_lm
    from approximate_query_engine_spark.functions.pipeline import (
        prepare_corpus,
    )

    ref = spark.createDataFrame(
        [
            (100 + i, "the quick brown fox jumps over the lazy dog")
            for i in range(5)
        ],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the dog"),  # fluent
            (1, "zz yy xx ww vv uu tt ss"),                 # disfluent
            (2, ""),                                        # too_short
            (3, "one"),  # 1 term: passes length, no LM evidence
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.reject_reason
        for r in prepare_corpus(
            docs,
            min_tokens=1,
            dedup=None,
            lm_ref=ref,
            lm_max_oov_frac=0.5,
        ).collect()
    }
    assert out[0] is None, out
    assert out[1] == "lm", out
    assert out[2] == "too_short", out  # heuristic outranks the LM reason
    assert out[3] is None, out  # no bigram evidence: never 'lm'
    # pre-fitted tables path: identical decisions
    uni, bi = fit_bigram_lm(ref)
    out2 = {
        r.doc_id: r.reject_reason
        for r in prepare_corpus(
            docs,
            min_tokens=1,
            dedup=None,
            lm_tables=(uni, bi, uni.count()),
            lm_max_oov_frac=0.5,
        ).collect()
    }
    assert out2 == out
    # thresholds without a model refuse loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lm_ref"):
        prepare_corpus(docs, lm_max_oov_frac=0.5)
