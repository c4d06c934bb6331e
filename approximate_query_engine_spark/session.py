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
    # local[N] puts driver + all executor threads in ONE JVM; the 1g default
    # heap OOMs on wide hash aggregations (e.g. a 30M-key exact distinct
    # across 32 concurrent tasks). Builder-time only — ignored if a JVM is
    # already up.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", mem)
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


#: Runtime-settable SQL confs the engine's query plans assume. Applied to
#: ANY session handed to the engine (driver harness, notebook, spark-submit)
#: so correctness never depends on who built the SparkSession. All four are
#: plain SQL confs, settable after session start.
_RUNTIME_CONFS = {
    # testdata events.ts is parquet TIMESTAMP(NANOS): read as long nanos
    # (Spark has no nanos timestamp), converted at registration.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # UTC so date/hour extraction matches the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Permissive evaluation matches the reference's SQLite contract.
    "spark.sql.ansi.enabled": "false",
    # Arrow batches for the mapInPandas/applyInPandas paths.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_engine_confs(spark: SparkSession) -> None:
    """Apply the engine's runtime-settable confs to an externally-built
    session. Best-effort per conf: a host that locks a conf down shouldn't
    stop the others from landing."""
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf locked by host
            pass


def register_testdata(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables=TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Register each testdata Parquet as a temp view; return name->DataFrame.

    The Spark analog of the reference's implicit "every table in the SQLite
    file is queryable" model (reference app.py:45-59). Scans stay lazy —
    Catalyst prunes columns and pushes filters into the Parquet reader.

    Works on ANY SparkSession, not just one from :func:`get_spark`: the
    required runtime confs are (re)applied here, and a single unreadable
    table skips rather than zeroing registration of the other tables.
    """
    ensure_engine_confs(spark)
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            # Spark-written tables are directories named after the table
            path = os.path.join(sf_dir, name)
            if not os.path.exists(path):
                continue
        try:
            df = spark.read.parquet(path)
            df = _normalize_nanos_timestamps(df, _nanos_timestamp_cols(path))
            df.createOrReplaceTempView(name)
        except Exception as exc:  # pragma: no cover - defensive per-table
            import warnings

            warnings.warn(f"skipping testdata table {name!r}: {exc}")
            continue
        out[name] = df
    return out


def nanos_to_micros_ts(colname: str):
    """Exact ns→µs timestamp conversion: integer `div` (float division
    loses ULPs at epoch-nanosecond magnitudes and can land on the adjacent
    microsecond, flipping window membership vs the DuckDB oracle)."""
    from pyspark.sql import functions as F

    return F.timestamp_micros(F.expr(f"{colname} div 1000"))


def _nanos_timestamp_cols(path: str) -> frozenset[str]:
    """Column names whose parquet logical type is TIMESTAMP(NANOS), read
    from the footer via pyarrow. Footer truth, not a name allowlist: any
    ns-precision column is detected regardless of what it's called.
    ``pq.read_schema`` handles a single file; a directory dataset (the
    normal shape for Spark-written tables) falls through to
    ``pyarrow.dataset``, which unifies the fragment schemas."""
    try:
        import pyarrow as pa
    except Exception:  # pragma: no cover - pyarrow absent
        return frozenset()

    def _ns_cols(schema) -> frozenset[str]:
        return frozenset(
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        )

    try:
        import pyarrow.parquet as pq

        return _ns_cols(pq.read_schema(path))
    except Exception:
        pass
    try:  # directory dataset (possibly partitioned)
        import pyarrow.dataset as pads

        return _ns_cols(pads.dataset(path, format="parquet").schema)
    except Exception:  # pragma: no cover - unreadable path
        return frozenset()


def _normalize_nanos_timestamps(
    df: DataFrame, ns_cols: frozenset[str] = frozenset()
) -> DataFrame:
    """Normalize event-time columns to plain TimestampType.

    Two parquet layouts occur in the testdata across rounds:

    - TIMESTAMP(NANOS): read as long nanos (see nanosAsLong config),
      converted here to µs TimestampType. ``ns_cols`` comes from the
      parquet footer (:func:`_nanos_timestamp_cols`); the metadata flag is
      a secondary signal for DataFrames built without a file path.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads it as
      TIMESTAMP_NTZ, which breaks every event-time operator that needs
      TIMESTAMP (``withWatermark``, ``unix_micros`` sessionization, window
      rollups). The session timezone is pinned to UTC (get_spark /
      ensure_engine_confs), so casting NTZ→TIMESTAMP is value-preserving
      and matches the DuckDB oracle's naive-timestamp semantics.
    """
    from pyspark.sql import functions as F

    for f in df.schema.fields:
        if f.dataType.simpleString() == "bigint" and (
            f.name in ns_cols or f.metadata.get("__is_nanos_timestamp__")
        ):
            df = df.withColumn(f.name, nanos_to_micros_ts(f.name))
        elif f.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df
