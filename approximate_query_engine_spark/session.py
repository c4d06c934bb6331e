"""SparkSession bootstrap and testdata registration.

The reference keeps one shared SQLite connection (reference storage.py:16-23);
the Spark analog is one shared SparkSession with temp views registered over
the Parquet testdata. Configuration follows the scale guidance: AQE on,
shuffle partitions sized to local cores (overridable for a real cluster via
normal spark-submit conf), UTC session timezone so results are comparable
with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver materializes at each scale factor (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "approximate-query-engine-spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    local[N] for tests; on a real cluster every knob here is still sane:
    AQE handles partition coalescing and skew joins at runtime, and
    ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # ANSI off: the engine accepts user SQL (reference passes raw SQL to
        # SQLite, which never hard-errors on overflow/cast); permissive
        # evaluation matches the reference's contract.
        .config("spark.sql.ansi.enabled", "false")
        # testdata events.ts is parquet TIMESTAMP(NANOS): read as long nanos
        # (Spark has no nanos timestamp), converted at registration.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def register_testdata(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables=TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Register each testdata Parquet as a temp view; return name->DataFrame.

    The Spark analog of the reference's implicit "every table in the SQLite
    file is queryable" model (reference app.py:45-59). Scans stay lazy —
    Catalyst prunes columns and pushes filters into the Parquet reader.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df = _normalize_nanos_timestamps(df)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def nanos_to_micros_ts(colname: str):
    """Exact ns→µs timestamp conversion: integer `div` (float division
    loses ULPs at epoch-nanosecond magnitudes and can land on the adjacent
    microsecond, flipping window membership vs the DuckDB oracle)."""
    from pyspark.sql import functions as F

    return F.timestamp_micros(F.expr(f"{colname} div 1000"))


def _normalize_nanos_timestamps(df: DataFrame) -> DataFrame:
    """Convert nanos-as-long timestamp columns (see nanosAsLong config) to
    TimestampType at microsecond precision. Detection keys on the parquet
    logical-type metadata Spark attaches to such columns."""
    for f in df.schema.fields:
        if f.dataType.simpleString() == "bigint" and (
            f.metadata.get("__is_nanos_timestamp__") or f.name in ("ts",)
        ):
            df = df.withColumn(f.name, nanos_to_micros_ts(f.name))
    return df
