"""Large-scale training-data pipeline operators (beyond-reference
extensions; SURVEY.md §7.2 item 9).

All operators are compositions of built-in ``pyspark.sql.functions`` —
JVM-evaluated, whole-stage-codegen'd, partially aggregated — except where a
Pandas UDF is genuinely required (multimodal decode), so they scale to
100 TB the same way any Spark SQL plan does.
"""

from approximate_query_engine_spark.functions import (
    boilerplate,
    contamination,
    dedup,
    graph,
    lm,
    multimodal,
    pipeline,
    quantiles,
    quantization,
    sampling,
    similarity,
    text,
)

__all__ = [
    "text",
    "dedup",
    "similarity",
    "multimodal",
    "pipeline",
    "sampling",
    "contamination",
    "quantiles",
    "quantization",
    "boilerplate",
    "lm",
    "graph",
]
