"""PySpark-native approximate query engine.

A brand-new engine with the query/data-processing capabilities of the
reference ``sahil-bharadwaj/Approximate-Query-engine`` (Flask + SQLite AQP
prototype), re-expressed Spark-first:

- exact layer: Spark SQL pass-through over Parquet-backed temp views;
- AQP layer: driver-side rewrite of single-table aggregate SQL onto
  pre-materialized uniform/stratified samples (``df.sample`` /
  ``df.sampleBy``) or sketches (``approx_count_distinct`` HLL++,
  DataSketches HLL, Count-Min), with expression-level scaling and
  per-group closed-form confidence intervals;
- strategy selection: rule + cost chooser with a closed learning loop.

See SURVEY.md at the repo root for the capability map to the reference.
"""

from approximate_query_engine_spark.engine import AQEngine
from approximate_query_engine_spark.session import get_spark, register_testdata

__all__ = ["AQEngine", "get_spark", "register_testdata"]
__version__ = "0.1.0"
