"""Benchmark decontamination (functions/contamination.py)."""

import pytest
from pyspark.sql import functions as F

from approximate_query_engine_spark.functions.contamination import (
    benchmark_ngrams,
    ngram_contamination,
    word_ngrams_expr,
)


def test_word_ngrams_distinct_and_short_doc_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "x y")], ["id", "text"]
    ).select("id", word_ngrams_expr("text", 3).alias("g"))
    rows = {r["id"]: r["g"] for r in df.collect()}
    # windows: "a b c","b c a","c a b","a b c" -> distinct keeps 3
    assert sorted(rows[1]) == ["a b c", "b c a", "c a b"]
    assert rows[2] == []


def test_ngrams_normalize_case_and_punct(spark):
    df = spark.createDataFrame([(1, "The QUICK, brown. fox")], ["id", "text"]).select(
        word_ngrams_expr("text", 3).alias("g")
    )
    assert df.collect()[0]["g"] == ["the quick brown", "quick brown fox"]


@pytest.fixture()
def corpus(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),  # shares "alpha beta gamma" + "beta gamma delta"
            (2, "epsilon zeta eta theta"),  # no overlap
            (3, "one two three alpha beta gamma"),  # shares 1 gram
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    return train, bench


def test_contamination_counts(corpus):
    train, bench = corpus
    hits = {
        r["doc_id"]: r["n_shared_grams"]
        for r in ngram_contamination(train, bench, n=3).collect()
    }
    assert hits == {1: 2, 3: 1}  # doc 2 absent: clean


def test_prebuilt_vocabulary_accepted(corpus):
    train, bench = corpus
    vocab = benchmark_ngrams(bench, n=3)
    direct = ngram_contamination(train, bench, n=3).collect()
    via_vocab = ngram_contamination(train, vocab, n=3).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via_vocab))


def test_broadcast_in_plan(corpus):
    train, bench = corpus
    plan = ngram_contamination(train, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
