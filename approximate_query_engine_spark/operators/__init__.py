"""Relational operators Spark lacks natively, composed Spark-first:
as-of joins, bucketed co-located joins, skew-salted joins, join-size
estimation, and gap-based sessionization."""

from approximate_query_engine_spark.operators.approx_join import (
    scaled_join_agg,
    weighted_sample,
)
from approximate_query_engine_spark.operators.asof import asof_join
from approximate_query_engine_spark.operators.funnel import funnel, funnel_users
from approximate_query_engine_spark.operators.retention import cohort_retention
from approximate_query_engine_spark.operators.sessionize import (
    session_stats,
    sessionize,
)
from approximate_query_engine_spark.operators.bucketing import (
    bucketize,
    cocolocated_join,
)
from approximate_query_engine_spark.operators.join_estimate import (
    estimate_join_size,
    estimate_join_size_cms,
)
from approximate_query_engine_spark.operators.partitioning import (
    partition_by_time,
    read_partitioned,
    scan_metrics,
)
from approximate_query_engine_spark.operators.salting import salted_join

__all__ = [
    "asof_join",
    "bucketize",
    "cocolocated_join",
    "salted_join",
    "estimate_join_size",
    "estimate_join_size_cms",
    "sessionize",
    "session_stats",
    "funnel",
    "funnel_users",
    "weighted_sample",
    "scaled_join_agg",
    "cohort_retention",
    "partition_by_time",
    "read_partitioned",
    "scan_metrics",
]
