"""Deterministic fixed-size sampling via hash ordering (bottom-k).

``ORDER BY hash(key, seed) LIMIT k`` is the distributed form of
min-wise/bottom-k sampling (Cohen & Kaplan 2007): every executor computes
its partition's k smallest hashes, the driver merges k·P candidates, and
no full sort or shuffle of the data ever happens (Spark plans it as
TakeOrderedAndProject). Unlike ``rand()`` sampling the result is a pure
function of (keys, seed) — re-running on the same data returns the SAME
rows, appending new data changes the sample minimally (only rows whose
hash beats the current k-th smallest enter), and two engines agree on it
exactly, which makes the operator oracle-checkable.

The per-group variant ranks within each group by the same hash (one window
shuffle on the group key) — the standard "k documents per language" /
"balanced by source" selection of a training-data pipeline.

Hash choice: ``xxhash64`` (JVM codegen, fastest) by default; ``md5`` when
cross-engine reproducibility matters (DuckDB has no xxhash64, but md5 of
the same string is identical everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Separator for md5 key concatenation; unit-separator keeps ('ab','c')
#: distinct from ('a','bc').
_SEP = "\x1f"


def hash_order_expr(
    key_cols: list[str], seed: int = 42, method: str = "xxhash64"
) -> Column:
    """Deterministic sort key over ``key_cols`` + ``seed``.

    ``xxhash64``: 64-bit integer, whole-stage codegen, the production
    default. ``md5``: lowercase hex string, bit-identical in any engine
    (DuckDB: ``md5(col1 || chr(31) || ... || 'seed')``).
    """
    if method == "xxhash64":
        return F.xxhash64(*key_cols, F.lit(seed))
    if method == "md5":
        parts = [F.col(c).cast("string") for c in key_cols]
        return F.md5(F.concat_ws(_SEP, *parts, F.lit(str(seed))))
    raise ValueError(f"unknown hash method {method!r}")


def bottom_k_sample(
    df: DataFrame,
    k: int,
    key_cols: list[str],
    seed: int = 42,
    method: str = "xxhash64",
) -> DataFrame:
    """The k rows with the smallest key hash — a deterministic uniform
    sample of fixed size. Plans as TakeOrderedAndProject: per-partition
    top-k, no shuffle, no full sort."""
    return df.orderBy(hash_order_expr(key_cols, seed, method).asc()).limit(k)


def _hex_threshold(weight: float) -> str:
    """8-hex-digit acceptance threshold for ``weight`` ∈ [0, 1]: a row is
    kept when its 8-char md5 prefix sorts below this string. Comparing
    lowercase hex STRINGS (not parsed integers) keeps the predicate
    bit-identical in any engine with md5 — no hex-to-int support needed.
    weight=1.0 returns 'g' (> every hex char) so everything is kept; the
    widths must match the prefix exactly or lexicographic order stops
    encoding numeric order."""
    if not 0.0 <= weight <= 1.0:
        raise ValueError(f"weight must be in [0, 1], got {weight}")
    t = int(weight * 16**8)
    return "g" if t >= 16**8 else format(t, "08x")


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str,
    key_cols: list[str],
    seed: int = 42,
    default_weight: float = 1.0,
) -> DataFrame:
    """Domain-mixture downsampling: keep each row of group g with
    probability ``weights[g]`` (``default_weight`` for unlisted groups),
    decided by the row's md5 key hash — the deterministic form of the
    per-source reweighting a training pipeline applies to hit target
    mixture proportions.

    Pure scan-side filter (no shuffle, no state): the CASE over group
    thresholds folds into the scan, so at 100 TB this costs nothing
    beyond the read. Reproducible: same (keys, seed, weights) → same
    subset, on any engine (the oracle reproduces it with
    ``substr(md5(...), 1, 9) < threshold``)."""
    parts = [F.col(c).cast("string") for c in key_cols]
    h = F.substring(F.md5(F.concat_ws(_SEP, *parts, F.lit(str(seed)))), 1, 8)
    thr: Column = F.lit(_hex_threshold(default_weight))
    for g, w in sorted(weights.items()):
        thr = F.when(F.col(group_col) == g, F.lit(_hex_threshold(w))).otherwise(thr)
    return df.where(h < thr)


def bottom_k_per_group(
    df: DataFrame,
    k: int,
    group_cols: list[str],
    key_cols: list[str],
    seed: int = 42,
    method: str = "xxhash64",
) -> DataFrame:
    """At most k rows per group, chosen by smallest key hash: deterministic
    balanced sampling (e.g. k docs per language). One shuffle on the group
    key; the rank window never sorts more than a group's rows, and skewed
    groups are AQE's skew-join/partition problem, not a driver collect."""
    w = Window.partitionBy(*group_cols).orderBy(
        hash_order_expr(key_cols, seed, method).asc()
    )
    return (
        df.withColumn("__bk_rank__", F.row_number().over(w))
        .where(F.col("__bk_rank__") <= k)
        .drop("__bk_rank__")
    )
