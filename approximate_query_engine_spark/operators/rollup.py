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

#: storage partition column of a materialized rollup (date of the bucket
#: start) — never part of the registered view's schema
_PDATE = "p_date"


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
        # date-partitioned layout: incremental refresh then replaces only
        # the affected date directories (dynamic partition overwrite) and
        # dashboard queries on a date range prune at file-listing time
        out = rolled.withColumn(
            _PDATE, F.date_format("bucket_start", "yyyy-MM-dd")
        )
        out.write.mode("overwrite").partitionBy(_PDATE).parquet(path)
        # the registered view keeps the same schema as the unmaterialized
        # form; the partition column is a storage detail
        rolled = spark.read.parquet(path).drop(_PDATE)
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
    """Incremental refresh via DYNAMIC PARTITION OVERWRITE: recompute the
    rollup from the start of ``since_bucket``'s DATE partition and replace
    only those date directories of the materialized layout. Untouched
    history is NEVER re-read or rewritten — at 100 TB a late-data repair
    of the last day costs one day's scan, not a rewrite of years of
    rollup. The recompute boundary snaps to the partition (date) boundary
    so every replaced directory is fully recomputed; repairing deletions
    of an ENTIRE date's source data is out of scope (as for any
    continuous aggregate — the stale directory would simply not be
    overwritten)."""
    since_date = str(since_bucket)[:10]
    src = spark.table(spec.source_table).filter(
        F.date_format(
            F.window(F.col(spec.time_col), spec.bucket)["start"],
            "yyyy-MM-dd",
        )
        >= F.lit(since_date)
    )
    src.createOrReplaceTempView(spec.source_table + "__late")
    tmp_spec = RollupSpec(
        spec.source_table + "__late", spec.time_col, spec.bucket, spec.dims, spec.measures
    )
    fresh = materialize_rollup(spark, tmp_spec, path=None).withColumn(
        _PDATE, F.date_format("bucket_start", "yyyy-MM-dd")
    )
    # writer-level option: per-write dynamic overwrite, no global conf
    # juggling (and no race with concurrent writers on the same session)
    (
        fresh.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(_PDATE)
        .parquet(path)
    )
    final = spark.read.parquet(path).drop(_PDATE)
    final.createOrReplaceTempView(spec.rollup_name)
    return final
