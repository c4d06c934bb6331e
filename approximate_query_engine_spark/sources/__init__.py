"""Source registration: Parquet testdata views and external files.

Namespace for the engine's data-in surface. The implementations live with
their consumers (`session.register_testdata` for driver testdata,
`AQEngine.register_file` for external csv/json/parquet/orc); this package
re-exports them as the stable import point, plus a convenience
:func:`read_source` for format-dispatched reads without an engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from approximate_query_engine_spark.session import (
    TESTDATA_TABLES,
    register_testdata,
)

__all__ = ["register_testdata", "read_source", "TESTDATA_TABLES"]


def read_source(
    spark: SparkSession, path: str, fmt: str = "parquet", options: dict | None = None
) -> DataFrame:
    """Format-dispatched read (csv defaults: header + inferSchema)."""
    opts = dict(options or {})
    reader = spark.read
    if fmt == "csv":
        opts.setdefault("header", "true")
        opts.setdefault("inferSchema", "true")
        return reader.options(**opts).csv(path)
    if fmt == "json":
        return reader.options(**opts).json(path)
    if fmt == "parquet":
        return reader.options(**opts).parquet(path)
    if fmt == "orc":
        return reader.options(**opts).orc(path)
    raise ValueError(f"unsupported format {fmt!r} (csv|json|parquet|orc)")
