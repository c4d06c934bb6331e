"""Connected components + transitive dedup."""

from approximate_query_engine_spark.functions import dedup
from approximate_query_engine_spark.functions.graph import (
    canonicalize_pairs,
    connected_components,
    dedup_by_components,
)


def test_connected_components_chain_and_islands(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)],
        "id_a long, id_b long",
    )
    comps = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comps[1] == comps[2] == comps[3] == comps[4] == 1
    assert comps[10] == comps[11] == 10
    assert comps[20] == 20


def test_connected_components_long_chain_converges(spark):
    n = 30
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    comps = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(comps.values()) == {0}


def test_canonicalize_and_dedup_by_components(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    canon = {
        r["doc_id"]: r["canonical_id"]
        for r in canonicalize_pairs(df, pairs, "doc_id").collect()
    }
    assert canon == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}
    kept = sorted(r["doc_id"] for r in dedup_by_components(df, pairs, "doc_id").collect())
    assert kept == [0, 3, 4]


def test_dedup_minhash_transitive_closes_chains(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today again"
    rows = [
        (1, base),
        (2, base.replace("today", "tomorrow")),          # ~1
        (3, base.replace("today", "tomorrow").replace("quick", "slow")),  # ~2, maybe not ~1
        (4, "entirely different content about query engines and parquet files"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = dedup.dedup_minhash(df, threshold=0.6, transitive=True, num_hashes=64, bands=16)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert 1 in ids and 4 in ids
    assert 2 not in ids  # absorbed into 1's component
