"""Bucketed tables for shuffle-free co-located joins.

At 100 TB the dominant join cost is the shuffle of the fact table. Writing
both join sides bucketed on the key (``DISTRIBUTE BY`` into Spark bucket
files via ``bucketBy`` + ``saveAsTable``) lets SortMergeJoin read
pre-partitioned buckets with NO Exchange on either side — the relational
analog of co-located storage. Verify with :func:`exchange_count`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a managed bucketed table (overwrites)."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a crashed previous write can leave the managed location behind with no
    # catalog entry; clear it so saveAsTable doesn't refuse
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = urlparse(warehouse).path or warehouse
    leftover = f"{loc.rstrip('/')}/{table_name.lower()}"
    shutil.rmtree(leftover, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def cocolocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Spark plans a SortMergeJoin whose both sides read bucket
    files directly — zero Exchange operators (assert via
    :func:`exchange_count`). Broadcast is disabled for the call so the
    bucketing path is actually exercised."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right, on=on, how=how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line and "reuses" not in line
    )
