"""Skew-salted join: for a fact table whose join key is heavily skewed and
a right side too large to broadcast.

The classic recipe: append a random salt in [0, S) to the fact side's key,
replicate the other side S times (one copy per salt value), and join on
(key, salt) — the hot key's rows spread over S tasks instead of one.
Spark's AQE skew-join splitting handles many cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in this engine's session);
explicit salting remains the tool when AQE can't help (e.g. skewed
aggregations feeding a join, or deterministic partition sizing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join ``skewed`` (hot-keyed side) with ``other`` on ``on`` using
    ``salt``-way key splitting. For inner/left joins the result equals the
    plain join; other join types are rejected — replicating ``other``
    salt-times would duplicate its unmatched rows under right/full outer
    and break semi/anti semantics."""
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r} "
            "(right/full/semi/anti would duplicate or miscount the replicated side)"
        )
    s = skewed.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = s.join(o, on=[on, "__salt"], how=how).drop("__salt")
    return out
