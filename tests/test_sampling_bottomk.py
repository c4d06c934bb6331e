"""Deterministic bottom-k sampling (functions/sampling.py) and keep-best
dedup (functions/dedup.dedup_keep_best)."""

import pytest
from pyspark.sql import functions as F

from approximate_query_engine_spark.functions.dedup import dedup_keep_best
from approximate_query_engine_spark.functions.sampling import (
    bottom_k_per_group,
    bottom_k_sample,
)


@pytest.fixture(scope="module")
def rows(spark):
    return spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(90)], ["id", "grp"]
    )


def test_bottom_k_deterministic_and_seed_sensitive(rows):
    a = sorted(r["id"] for r in bottom_k_sample(rows, 10, ["id"], seed=1).collect())
    b = sorted(r["id"] for r in bottom_k_sample(rows, 10, ["id"], seed=1).collect())
    c = sorted(r["id"] for r in bottom_k_sample(rows, 10, ["id"], seed=2).collect())
    assert a == b
    assert a != c
    assert len(a) == 10


def test_bottom_k_stable_under_append(spark, rows):
    """Bottom-k is a consistent sample: adding rows can only swap members
    whose hash beats the old threshold — the old members that survive are
    a subset chosen by the same hash order, so overlap is high and, in
    particular, every surviving member was in the old sample."""
    base = sorted(r["id"] for r in bottom_k_sample(rows, 10, ["id"], seed=1).collect())
    more = rows.union(
        spark.createDataFrame([(i, "gx") for i in range(90, 120)], ["id", "grp"])
    )
    grown = sorted(r["id"] for r in bottom_k_sample(more, 10, ["id"], seed=1).collect())
    old_survivors = [i for i in grown if i < 90]
    assert old_survivors == base[: len(old_survivors)] or set(old_survivors) <= set(base)


def test_bottom_k_per_group_counts_and_determinism(rows):
    out = bottom_k_per_group(rows, 4, ["grp"], ["id"], seed=3)
    per = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert per == {"g0": 4, "g1": 4, "g2": 4}
    again = bottom_k_per_group(rows, 4, ["grp"], ["id"], seed=3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_bottom_k_per_group_small_groups_kept_whole(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["id", "grp"])
    out = bottom_k_per_group(df, 5, ["grp"], ["id"])
    assert out.count() == 3


def test_md5_method_matches_duckdb(spark, rows):
    import duckdb

    sample = bottom_k_sample(rows, 7, ["id"], seed=9, method="md5")
    got = sorted(r["id"] for r in sample.collect())
    pdf = rows.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(
        r[0]
        for r in con.execute(
            "SELECT id FROM t ORDER BY md5(CAST(id AS VARCHAR) || chr(31) || '9') LIMIT 7"
        ).fetchall()
    )
    assert got == want


def test_keep_best_picks_max_score_min_id_ties(spark):
    df = spark.createDataFrame(
        [
            (1, "k1", 0.5),
            (2, "k1", 0.9),
            (3, "k1", 0.9),  # tie with 2 -> keep 2
            (4, "k2", 0.1),
        ],
        ["id", "key", "score"],
    )
    kept = sorted(r["id"] for r in dedup_keep_best(df, ["key"], "score", "id").collect())
    assert kept == [2, 4]


def test_keep_best_accepts_column_expression(spark):
    df = spark.createDataFrame(
        [(1, "k", "aa"), (2, "k", "aaaa")], ["id", "key", "text"]
    )
    kept = dedup_keep_best(df, ["key"], F.length("text"), "id").collect()
    assert [r["id"] for r in kept] == [2]


# ---------------------------------------------------------------------------
# mixture sampling


def test_mixture_sample_rates(spark):
    from approximate_query_engine_spark.functions.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)], ["id", "grp"]
    )
    kept = mixture_sample(
        df, {"a": 1.0, "b": 0.25}, "grp", ["id"], seed=5
    )
    per = {r["grp"]: r["n"] for r in kept.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert per["a"] == 1000  # weight 1.0 keeps everything
    assert 150 < per["b"] < 350  # ~250 expected


def test_mixture_sample_deterministic_and_default_weight(spark):
    from approximate_query_engine_spark.functions.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 4)) for i in range(400)], ["id", "grp"]
    )
    a = sorted(r["id"] for r in mixture_sample(df, {"g0": 0.5}, "grp", ["id"], seed=1, default_weight=0.0).collect())
    b = sorted(r["id"] for r in mixture_sample(df, {"g0": 0.5}, "grp", ["id"], seed=1, default_weight=0.0).collect())
    assert a == b
    assert all(i % 4 == 0 for i in a)  # default 0.0 drops other groups
    assert 20 < len(a) < 80  # ~50 of 100


def test_mixture_weight_validation(spark):
    from approximate_query_engine_spark.functions.sampling import mixture_sample

    df = spark.createDataFrame([(1, "a")], ["id", "grp"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mixture_sample(df, {"a": 1.5}, "grp", ["id"])
