"""Quantile operators: exact percentiles, one-pass approximations, and
mergeable KLL quantile sketches.

Beyond the reference's surface (it has no quantile support at all) but a
core OLAP capability and the natural companion of the sampling layer:

- :func:`exact_percentiles` — Spark's ``percentile`` (exact, linear
  interpolation; needs a sort-based aggregation — the expensive baseline).
- :func:`approx_percentiles` — ``percentile_approx`` (GK sketch, single
  pass, bounded relative rank error via ``accuracy``).
- :class:`KLLQuantiles` — Spark 4's DataSketches KLL functions: build a
  binary, MERGEABLE sketch per table/column into the engine catalog, then
  answer quantile/rank queries from the sketch without touching the data
  (the quantile analog of persisted HLL; sketches from different
  partitions/days merge associatively — the property that matters at
  100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from approximate_query_engine_spark.catalog import Catalog, SketchInfo


def exact_percentiles(
    df: DataFrame, col: str, probs: list[float]
) -> list[float]:
    arr = F.array(*[F.lit(float(p)) for p in probs])
    row = df.agg(F.percentile(F.col(col), arr).alias("q")).collect()[0]
    return [float(x) for x in row["q"]]


def approx_percentiles(
    df: DataFrame, col: str, probs: list[float], accuracy: int = 10000
) -> list[float]:
    arr = F.array(*[F.lit(float(p)) for p in probs])
    row = df.agg(
        F.percentile_approx(F.col(col), arr, F.lit(accuracy)).alias("q")
    ).collect()[0]
    return [float(x) for x in row["q"]]


class KLLQuantiles:
    """Mergeable KLL quantile sketches persisted in the engine catalog."""

    def __init__(self, spark: SparkSession, catalog: Catalog):
        self.spark = spark
        self.catalog = catalog

    def build(self, table: str, column: str, k: int = 200) -> SketchInfo:
        """One aggregation pass → KLL binary (doubles)."""
        row = (
            self.spark.table(table)
            .where(F.col(column).isNotNull())
            .agg(
                F.expr(
                    f"kll_sketch_agg_double(CAST({column} AS DOUBLE), {k})"
                ).alias("sk")
            )
            .collect()[0]
        )
        info = SketchInfo(
            table_name=table,
            column_name=column,
            sketch_type="kll",
            sketch_data=bytes(row["sk"]) if row["sk"] is not None else b"",
            parameters={"k": k, "format": "datasketches-kll-double"},
        )
        self.catalog.upsert_sketch(info)
        self.catalog.save()
        return info

    def _sketch_df(self, table: str, column: str):
        info = self.catalog.get_sketch(table, column, "kll")
        if info is None or not info.sketch_data:
            return None
        return self.spark.createDataFrame([(info.sketch_data,)], "sk binary")

    def quantiles(
        self, table: str, column: str, probs: list[float]
    ) -> list[float] | None:
        """Quantile estimates from the persisted sketch — no data scan."""
        df = self._sketch_df(table, column)
        if df is None:
            return None
        arr = ", ".join(f"{float(p)!r}D" for p in probs)
        row = df.select(
            F.expr(f"kll_sketch_get_quantile_double(sk, array({arr}))").alias("q")
        ).collect()[0]
        return [float(x) for x in row["q"]]

    def rank(self, table: str, column: str, value: float) -> float | None:
        """Approximate CDF at ``value`` from the persisted sketch."""
        df = self._sketch_df(table, column)
        if df is None:
            return None
        row = df.select(
            F.expr(f"kll_sketch_get_rank_double(sk, CAST({value!r} AS DOUBLE))").alias(
                "r"
            )
        ).collect()[0]
        return float(row["r"])

    def merge_and_estimate(
        self, sketches: list[bytes], probs: list[float]
    ) -> list[float]:
        """Union foreign KLL binaries (e.g. per-partition/per-day sketches)
        and answer quantiles from the merged sketch — associative merge is
        what lets 100 TB be summarized without a global sort.
        ``kll_sketch_merge_double`` is a binary scalar function, so the
        merge folds as a nested expression over the sketch columns."""
        if not sketches:
            raise ValueError("no sketches to merge")
        cols = ", ".join(f"s{i} binary" for i in range(len(sketches)))
        df = self.spark.createDataFrame([tuple(sketches)], cols)
        merged = "s0"
        for i in range(1, len(sketches)):
            merged = f"kll_sketch_merge_double({merged}, s{i})"
        arr = ", ".join(f"{float(p)!r}D" for p in probs)
        row = df.select(
            F.expr(f"kll_sketch_get_quantile_double({merged}, array({arr}))").alias("q")
        ).collect()[0]
        return [float(x) for x in row["q"]]
