"""Time-series rollups (continuous-aggregate style): materialize a
bucketed pre-aggregation of an event table once, then answer matching
window queries from the rollup instead of the raw data.

The hypertable/continuous-aggregate pattern expressed relationally:
a rollup row holds per (time_bucket, dims...) the partial-aggregation
state — counts, sums, min/max — everything needed to re-aggregate at any
coarser granularity without touching raw events. AVG re-derives as
sum/count (never averaged averages). At 100 TB the rollup is smaller than
the raw table by the bucket compression factor and is the only thing
interactive dashboards should scan; it refreshes incrementally by
re-materializing only late buckets (the watermarked streaming agg in
``streaming/approx_stream.py`` is the push-based version of the same
state).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class RollupSpec:
    source_table: str
    time_col: str
    bucket: str  # e.g. "1 hour", "15 minutes"
    dims: list[str] = field(default_factory=list)
    measures: list[str] = field(default_factory=list)  # numeric columns

    @property
    def rollup_name(self) -> str:
        tag = self.bucket.replace(" ", "_")
        return f"{self.source_table}__rollup_{tag}"


def materialize_rollup(
    spark: SparkSession, spec: RollupSpec, path: str | None = None
) -> DataFrame:
    """Build + register the rollup table. One shuffle on
    (bucket, dims); partial-agg state per measure: count/sum/min/max."""
    src = spark.table(spec.source_table)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in spec.measures:
        aggs += [
            F.count(m).alias(f"{m}_count"),
            F.sum(m).alias(f"{m}_sum"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    rolled = (
        src.groupBy(
            F.window(F.col(spec.time_col), spec.bucket).alias("w"), *spec.dims
        )
        .agg(*aggs)
        .select(
            F.col("w.start").alias("bucket_start"),
            *spec.dims,
            F.col("n_rows"),
            *[
                F.col(f"{m}_{s}")
                for m in spec.measures
                for s in ("count", "sum", "min", "max")
            ],
        )
    )
    if path:
        rolled.write.mode("overwrite").parquet(path)
        rolled = spark.read.parquet(path)
    rolled.createOrReplaceTempView(spec.rollup_name)
    return rolled


def query_rollup(
    spark: SparkSession,
    spec: RollupSpec,
    measure: str,
    dims: list[str] | None = None,
    grain: str | None = None,
) -> DataFrame:
    """Aggregate FROM THE ROLLUP at the requested (coarser or equal) grain:
    count/sum re-sum, min/max re-min/max, avg = Σsum/Σcount. ``grain``
    defaults to the rollup bucket; dims default to all spec dims."""
    r = spark.table(spec.rollup_name)
    dims = spec.dims if dims is None else dims
    if grain:
        time_key = F.window(F.col("bucket_start"), grain)["start"].alias("bucket_start")
    else:
        time_key = F.col("bucket_start")
    return r.groupBy(time_key, *dims).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum(f"{measure}_sum").alias(f"{measure}_sum"),
        (F.sum(f"{measure}_sum") / F.sum(f"{measure}_count")).alias(f"{measure}_avg"),
        F.min(f"{measure}_min").alias(f"{measure}_min"),
        F.max(f"{measure}_max").alias(f"{measure}_max"),
    )


def refresh_rollup_buckets(
    spark: SparkSession, spec: RollupSpec, path: str, since_bucket
) -> DataFrame:
    """Incremental refresh: recompute only buckets >= ``since_bucket`` and
    overwrite just those partitions of the materialized rollup (late-data
    repair without a full rebuild)."""
    src = spark.table(spec.source_table).filter(
        F.window(F.col(spec.time_col), spec.bucket)["start"] >= F.lit(since_bucket)
    )
    src.createOrReplaceTempView(spec.source_table + "__late")
    tmp_spec = RollupSpec(
        spec.source_table + "__late", spec.time_col, spec.bucket, spec.dims, spec.measures
    )
    fresh = materialize_rollup(spark, tmp_spec, path=None)
    old = spark.read.parquet(path).filter(F.col("bucket_start") < F.lit(since_bucket))
    merged = old.unionByName(fresh)
    tmp_out = path + "__tmp"
    merged.write.mode("overwrite").parquet(tmp_out)
    out = spark.read.parquet(tmp_out)
    out.write.mode("overwrite").parquet(path)
    final = spark.read.parquet(path)
    final.createOrReplaceTempView(spec.rollup_name)
    return final
