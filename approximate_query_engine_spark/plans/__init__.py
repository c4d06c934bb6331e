"""Planning layer namespace: parse → candidates → rewrite → plan dict.

Re-exports the planning pipeline's public API from its implementation
modules (`sqlparser`, `planner`, `rewriter`, `optimizer`) as one stable
import point mirroring the lifecycle order (SURVEY.md §3.1).
"""

from approximate_query_engine_spark.optimizer import (
    MLOptimizer,
    choose_base_strategy,
    extract_features,
)
from approximate_query_engine_spark.planner import Candidate, Planner
from approximate_query_engine_spark.rewriter import (
    RewriteResult,
    plan_dict,
    rewrite_exact,
    rewrite_inline_sample,
    rewrite_sketch,
    rewrite_stratified,
    rewrite_uniform_sample,
)
from approximate_query_engine_spark.sqlparser import (
    ParsedQuery,
    UnsupportedQueryError,
    parse,
    try_parse,
)

__all__ = [
    "parse",
    "try_parse",
    "ParsedQuery",
    "UnsupportedQueryError",
    "extract_features",
    "choose_base_strategy",
    "MLOptimizer",
    "Planner",
    "Candidate",
    "rewrite_exact",
    "rewrite_uniform_sample",
    "rewrite_inline_sample",
    "rewrite_stratified",
    "rewrite_sketch",
    "RewriteResult",
    "plan_dict",
]
