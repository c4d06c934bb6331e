"""Connected components over an edge list via iterative hash-min label
propagation — the standard Spark-native way to close near-duplicate pair
sets transitively (a~b, b~c ⇒ {a,b,c} share one canonical id even when a,c
were never a candidate pair).

Algorithm: every node starts labeled with itself; each iteration a node
adopts the minimum label in its neighborhood, then a pointer-jumping
(path-halving) step adopts its label's own label — giving O(log diameter)
convergence; each iteration is two joins + one aggregation (shuffles on
node id), with labels materialized per iteration to cut lineage growth.
``max_iterations`` bounds the cost; the default 10 covers diameters to ~2^10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 10,
) -> DataFrame:
    """→ DataFrame(node, component) where component = min node id reachable.

    ``edges`` is undirected (each pair listed once in either direction).
    Isolated nodes absent from ``edges`` are absent from the output —
    callers treat missing as self-component.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # symmetrize + self-loops so every endpoint appears as a node
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .union(e.select(F.col("a"), F.col("a").alias("b")))
        .union(e.select(F.col("b").alias("a"), F.col("b")))
        .distinct()
    )
    labels = sym.groupBy("a").agg(F.min("b").alias("comp")).withColumnRenamed("a", "node")
    for _ in range(max_iterations):
        # each node adopts min(own label, neighbors' labels)
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("node", "b").select("b", "comp"), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("new_comp"))
            .withColumnRenamed("a", "node")
        )
        updated = (
            labels.join(neighbor_labels, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("new_comp"), F.col("comp"))).alias(
                    "comp"
                ),
            )
        )
        # pointer jumping: adopt the label's own label (path halving) —
        # turns O(diameter) convergence into O(log diameter)
        parent = updated.select(
            F.col("node").alias("p_node"), F.col("comp").alias("p_comp")
        )
        updated = (
            updated.join(parent, updated.comp == parent.p_node, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("p_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .filter(F.col("u.comp") != F.col("l.comp"))
            .limit(1)
            .count()
        )
        # materialize the new labels to cut lineage growth across iterations
        labels = updated.localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("comp").alias("component"))


def canonicalize_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 10,
) -> DataFrame:
    """Map each row of ``df`` to its duplicate-set canonical id
    (min id of its connected component; rows with no near-dup map to
    themselves). Adds column ``canonical_id``."""
    comps = connected_components(pairs, src, dst, max_iterations)
    return df.join(
        comps.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn(
        "canonical_id", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("component")


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iterations: int = 10,
) -> DataFrame:
    """Keep one row (the min id) per connected near-duplicate component —
    the transitively-correct version of greedy pair-based dedup."""
    with_canon = canonicalize_pairs(df, pairs, id_col, max_iterations=max_iterations)
    return with_canon.filter(F.col(id_col) == F.col("canonical_id")).drop(
        "canonical_id"
    )
