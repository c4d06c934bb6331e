"""As-of (most-recent-prior) join — Spark has no native operator.

Two implementations, both distributed:

- :func:`asof_join` (default ``strategy="union"``): the pure-DataFrame
  union-window composition — tag both sides, union on a common schema,
  window by the match keys ordered by the time key, carry the last right
  row forward with ``last(..., ignorenulls=True)``, keep left rows. One
  shuffle on (by, time); no Python. This is the composition-of-existing-ops
  route (preferred per the operator-implementation ladder).
- ``strategy="pandas"``: per-key ``applyInPandas`` with
  ``pandas.merge_asof`` — the escape hatch when tolerance semantics or
  nearest-direction options are needed; Arrow-batched, one shuffle on the
  by-key.

Semantics (like ``pd.merge_asof`` with ``direction="backward"``): each left
row picks the right row with the greatest time key ≤ its own, within the
same ``by`` group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_prefix: str = "r_",
    strategy: str = "union",
    tolerance=None,
) -> DataFrame:
    by = [by] if isinstance(by, str) else (by or [])
    if strategy == "pandas":
        return _asof_pandas(left, right, on, by, right_prefix, tolerance)
    if tolerance is not None:
        raise ValueError("tolerance requires strategy='pandas'")
    return _asof_union(left, right, on, by, right_prefix)


def _asof_union(
    left: DataFrame, right: DataFrame, on: str, by: list[str], right_prefix: str
) -> DataFrame:
    from pyspark.sql import types as T

    lcols = left.columns
    rcols = [c for c in right.columns if c != on and c not in by]
    # the right side travels as ONE struct so the window's last() picks a
    # single as-of ROW atomically — per-column fills would mix columns from
    # different right rows whenever a right value is NULL
    r_struct_type = T.StructType([right.schema[c] for c in rcols])
    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_type).alias("__r"),
        F.lit(1).alias("__is_left"),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c == on or c in by else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.struct(*[F.col(c).alias(c) for c in rcols]).alias("__r"),
        F.lit(0).alias("__is_left"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # order right rows BEFORE left rows at equal time keys so an exact
    # timestamp match is visible to the left row (backward-inclusive)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[F.col(c) for c in lcols],
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__r"),
        F.col("__is_left"),
    )
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *[F.col(c) for c in lcols],
            *[F.col("__r")[c].alias(right_prefix + c) for c in rcols],
        )
    )


def _asof_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_prefix: str,
    tolerance,
) -> DataFrame:
    import pandas as pd

    if not by:
        raise ValueError("strategy='pandas' requires a by-key to group on")
    rcols = [c for c in right.columns if c != on and c not in by]
    out_schema = left.schema
    from pyspark.sql import types as T

    fields = list(out_schema.fields) + [
        T.StructField(right_prefix + c, right.schema[c].dataType, True) for c in rcols
    ]
    schema = T.StructType(fields)
    l_tag = left.withColumn("__side", F.lit("l"))
    r_tag = right.withColumn("__side", F.lit("r"))
    # align schemas for the cogroup-free union route
    combined_cols = set(l_tag.columns) | set(r_tag.columns)
    for c in combined_cols:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None).cast(r_tag.schema[c].dataType))
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(l_tag.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag)

    lcols = [f.name for f in out_schema.fields]

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf["__side"] == "l"][lcols].sort_values(on)
        rpdf = pdf[pdf["__side"] == "r"][[on] + rcols].sort_values(on)
        rpdf = rpdf.rename(columns={c: right_prefix + c for c in rcols})
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in fields])
        kwargs = {}
        if tolerance is not None:
            kwargs["tolerance"] = tolerance
        out = pd.merge_asof(lpdf, rpdf, on=on, direction="backward", **kwargs)
        return out

    return unioned.groupBy(*by).applyInPandas(lambda _, pdf: merge(pdf), schema=schema)
