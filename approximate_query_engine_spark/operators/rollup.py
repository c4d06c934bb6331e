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
    #: columns tracked for APPROXIMATE per-bucket distinct counts: each
    #: gets a DataSketches HLL sketch column (Spark-native
    #: hll_sketch_agg) whose state unions across buckets/batches exactly
    #: like the other partials — "distinct users last week" answers from
    #: pre-aggregated state (rel. std. err. ≈ 1.04/sqrt(2^lgk))
    distinct_cols: list[str] = field(default_factory=list)
    hll_lgk: int = 12
    #: columns tracked for APPROXIMATE per-bucket quantiles: each gets a
    #: DataSketches KLL sketch column (Spark-native
    #: ``kll_sketch_agg_double``) whose state merges across buckets —
    #: "p95 latency per day/week" answers from pre-aggregated state.
    #: KLL's guarantee is on RANK, not value: the answer is a true data
    #: value whose rank is within ε(k) ≈ 2.296/k^0.9433 of the requested
    #: p (the published DataSketches single-sided bound); below the
    #: sketch's compaction threshold the answer is exactly the
    #: inclusive-rank order statistic.
    quantile_cols: list[str] = field(default_factory=list)
    kll_k: int = 200
    #: columns tracked for per-bucket HEAVY HITTERS: each gets an
    #: ``approx_top_k_accumulate`` state column (DataSketches
    #: frequent-items) that combines across buckets — "top items last
    #: week" answers from pre-aggregated state via
    #: :meth:`AQEngine.rollup_top_items`. Counts are exact while a
    #: combined range's distinct items fit ``topk_budget`` (no purge can
    #: occur); beyond it the Misra–Gries ``3.5·n/budget`` bound applies
    #: (same contract as sketches.grouped_top_k).
    topk_cols: list[str] = field(default_factory=list)
    topk_budget: int = 1024
    #: columns tracked for cross-window SET ALGEBRA: each gets a theta
    #: sketch column (``theta_sketch_agg``) that unions across buckets
    #: and, unlike HLL, supports INTERSECTION/DIFFERENCE between two
    #: window ranges — "new vs returning users this week" answers from
    #: state via :meth:`AQEngine.rollup_audience_diff`. Exact while each
    #: range's distinct keys fit 2^theta_lgk; ~1/sqrt(2^lgk) relative
    #: error per estimate beyond (Dasgupta et al., DataSketches theta).
    theta_cols: list[str] = field(default_factory=list)
    theta_lgk: int = 12
    #: round-15 v2 theta key encoding (guide §4/§2.3): feed
    #: ``theta_sketch_agg`` the RAW column instead of
    #: ``CAST(col AS STRING)`` — the v1 cast materializes a string per
    #: row just to be hashed (~18% of the sketch-build scan measured at
    #: 120M rows). The two encodings hash DIFFERENT bytes, so sketches
    #: built under one NEVER union/intersect with the other: the flag is
    #: per-spec, travels in the catalog entry, and every state builder
    #: (full materialize, incremental refresh, the hybrid query's fresh
    #: edge slices) derives its key expression from it. In the sketch's
    #: exact regime (range ndv ≤ 2^theta_lgk — the only regime routing
    #: certifies) estimates are exact counts under EITHER encoding, so
    #: flipping encodings via a REBUILD (maintenance's advised
    #: migration) never changes a certified answer. False = v1
    #: byte-compatible default; existing callers/layouts unchanged.
    theta_key_native: bool = False

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
    rolled = _partial_state(src, spec)
    if path:
        # date-partitioned layout: incremental refresh then replaces only
        # the affected date directories (dynamic partition overwrite) and
        # dashboard queries on a date range prune at file-listing time
        rolled.write.mode("overwrite").partitionBy(_PDATE).parquet(path)
        # the registered view keeps the same schema as the unmaterialized
        # form; the partition column is a storage detail
        rolled = spark.read.parquet(path).drop(_PDATE)
    else:
        rolled = rolled.drop(_PDATE)
    rolled.createOrReplaceTempView(spec.rollup_name)
    return rolled


#: column types theta_sketch_agg ingests directly (Spark 4.1's signature:
#: array<int>/array<bigint>/binary/double/float/int/bigint/string) —
#: anything else must keep the v1 CAST..AS STRING encoding
THETA_NATIVE_TYPES = frozenset(
    {"int", "bigint", "float", "double", "string", "binary"}
)


def theta_key_sql(col: str, native: bool) -> str:
    """The theta sketch key expression for ``col`` under the spec's key
    encoding (see ``RollupSpec.theta_key_native``). ONE definition shared
    by every state builder so a layout can never mix encodings."""
    return f"`{col}`" if native else f"CAST(`{col}` AS STRING)"


def can_derive_rollup(fine: RollupSpec, coarse: RollupSpec) -> str | None:
    """None when ``coarse`` is derivable from ``fine``'s state, else the
    human-readable reason it is not. Derivable = coarse bucket is a
    multiple of fine's, coarse dims/measures/sketch columns are subsets
    of fine's, and every sketch parameter matches (merging state built
    at a different k/lgk would silently change the error contract)."""
    # same fact lineage first: state bucketed on a different time column
    # (or built from a different table) is silently-wrong to re-bucket
    if fine.source_table != coarse.source_table:
        return (
            f"source tables differ ({fine.source_table!r} vs "
            f"{coarse.source_table!r})"
        )
    if fine.time_col != coarse.time_col:
        return (
            f"time columns differ ({fine.time_col!r} vs "
            f"{coarse.time_col!r})"
        )
    fb, cb = bucket_seconds(fine.bucket), bucket_seconds(coarse.bucket)
    if fb is None or cb is None:
        return "non-fixed-width bucket"
    if cb % fb != 0:
        return f"coarse bucket {coarse.bucket!r} not a multiple of {fine.bucket!r}"
    # a strict subset collapses dims, which is STATE-sound (counts add,
    # sketches merge) — only NEW dims are underivable
    if not set(coarse.dims) <= set(fine.dims):
        return "coarse dims not a subset of fine dims"
    for name in ("measures", "distinct_cols", "quantile_cols",
                 "topk_cols", "theta_cols"):
        if not set(getattr(coarse, name)) <= set(getattr(fine, name)):
            return f"coarse {name} not a subset of fine {name}"
    # theta_key_native counts as a sketch parameter: the coarse spec's
    # flag describes ITS state's key encoding for every future refresh,
    # and refreshing state derived from the other encoding would union
    # incompatible hash spaces
    for pname in ("hll_lgk", "kll_k", "topk_budget", "theta_lgk",
                  "theta_key_native"):
        tracked = {
            "hll_lgk": coarse.distinct_cols,
            "kll_k": coarse.quantile_cols,
            "topk_budget": coarse.topk_cols,
            "theta_lgk": coarse.theta_cols,
            "theta_key_native": coarse.theta_cols,
        }[pname]
        if tracked and getattr(fine, pname) != getattr(coarse, pname):
            return f"{pname} differs ({getattr(fine, pname)} vs {getattr(coarse, pname)})"
    return None


def derive_rollup_state(
    spark: SparkSession,
    fine: RollupSpec,
    coarse: RollupSpec,
    src: DataFrame | None = None,
) -> DataFrame:
    """Build ``coarse``'s state FROM ``fine``'s materialized state — the
    hierarchical continuous-aggregate build: counts/sums add, min/max
    combine, HLL/theta union, KLL merges, top-k combines, so a daily
    rollup derives from the hourly one at rollup cost (the 20M-row fact
    scan becomes a few-thousand-row state scan — at 100 TB this is the
    only sane way to maintain a grain hierarchy). Raises ValueError when
    the shapes are not derivable (:func:`can_derive_rollup`)."""
    reason = can_derive_rollup(fine, coarse)
    if reason:
        raise ValueError(f"cannot derive {coarse.rollup_name}: {reason}")
    if src is None:
        src = spark.table(fine.rollup_name)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in coarse.measures:
        aggs += [
            F.sum(f"{m}_count").alias(f"{m}_count"),
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    for dc in coarse.distinct_cols:
        aggs.append(F.hll_union_agg(f"{dc}_hll").alias(f"{dc}_hll"))
    for qc in coarse.quantile_cols:
        aggs.append(
            F.expr(
                f"kll_merge_agg_double(`{qc}_kll`, {int(coarse.kll_k)})"
            ).alias(f"{qc}_kll")
        )
    for tc in coarse.topk_cols:
        aggs.append(
            F.expr(
                f"approx_top_k_combine(`{tc}_topk`, "
                f"{int(coarse.topk_budget)})"
            ).alias(f"{tc}_topk")
        )
    for sc in coarse.theta_cols:
        # union at the spec's nominal (can_derive_rollup proved the fine
        # state was built at the same lg_k) — the function default would
        # downsample any state built above lg_k 12
        aggs.append(
            F.expr(
                f"theta_union_agg(`{sc}_theta`, {int(coarse.theta_lgk)})"
            ).alias(f"{sc}_theta")
        )
    out = (
        src.groupBy(
            F.window(F.col("bucket_start"), coarse.bucket)["start"].alias(
                "bucket_start"
            ),
            *coarse.dims,
        )
        .agg(*aggs)
        .select(
            "bucket_start",
            *coarse.dims,
            "n_rows",
            *[
                f"{m}_{s}"
                for m in coarse.measures
                for s in ("count", "sum", "min", "max")
            ],
            *[f"{dc}_hll" for dc in coarse.distinct_cols],
            *[f"{qc}_kll" for qc in coarse.quantile_cols],
            *[f"{tc}_topk" for tc in coarse.topk_cols],
            *[f"{sc}_theta" for sc in coarse.theta_cols],
        )
        .withColumn(_PDATE, F.date_format("bucket_start", "yyyy-MM-dd"))
    )
    return out


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


# ---------------------------------------------------------------------------
# SQL → rollup rewriting (continuous-aggregate query routing)
#
# The materialized-view rewrite every hypertable system performs: a SQL
# aggregate over the RAW event table whose shape is derivable from a
# registered rollup's partial-aggregation state is answered FROM THE
# ROLLUP — exactly (not approximately), because count/sum/min/max
# re-aggregate losslessly and the time bounds are required to align to
# bucket boundaries. At 100 TB this is the difference between scanning
# the fact table and scanning a table smaller by the bucket compression
# factor; combined with the rollup's date-partitioned materialization the
# routed scan also prunes to the queried date directories.

import re as _re
from datetime import datetime, timedelta, timezone

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)

#: every boundary of DATE_TRUNC(unit) falls on an epoch multiple of this
#: many seconds (week+ boundaries are midnights), so a rollup whose
#: bucket divides it can regroup to the unit exactly
_TRUNC_MODULUS = {
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 86400,
    "month": 86400,
    "quarter": 86400,
    "year": 86400,
}


def is_week_bucket(bucket: str) -> bool:
    """True for any week-length bucket, however spelled. Week windows
    are a foot-gun: Spark's ``F.window`` aligns to the epoch (Thursday
    boundaries) while SQL ``DATE_TRUNC('week')`` is Monday, so
    week-bucketed state can never serve calendar-week keys —
    :meth:`AQEngine.create_rollup` refuses them and points at day-grain
    state instead. '7 days' and '168 hours' have the identical epoch
    alignment, so the guard is on SECONDS (any multiple of 604800),
    not the unit spelling."""
    if _re.fullmatch(r"\s*\d+\s+weeks?\s*", bucket, _re.I):
        return True
    bsec = bucket_seconds(bucket)
    return bsec is not None and bsec > 0 and bsec % 604800 == 0


def bucket_seconds(bucket: str) -> int | None:
    """Length of a fixed-width window bucket string in seconds, or None
    for variable-width buckets (months) that alignment math can't cover."""
    m = _re.fullmatch(
        r"\s*(\d+)\s+(second|minute|hour|day|week)s?\s*", bucket, _re.I
    )
    if not m:
        return None
    mult = {
        "second": 1,
        "minute": 60,
        "hour": 3600,
        "day": 86400,
        "week": 604800,
    }[m.group(2).lower()]
    return int(m.group(1)) * mult


def _parse_literal(text: str) -> datetime | None:
    """DATE '...' / TIMESTAMP '...' / bare '...' literal → aware UTC
    datetime (microsecond precision), or None."""
    m = _re.fullmatch(
        r"\s*(?:DATE|TIMESTAMP)?\s*'(\d{4}-\d{2}-\d{2})"
        r"(?:[ T](\d{2}:\d{2}:\d{2})(\.\d{1,6})?)?'\s*",
        text,
        _re.I,
    )
    if not m:
        return None
    base = datetime.strptime(m.group(1), "%Y-%m-%d")
    if m.group(2):
        t = datetime.strptime(m.group(2), "%H:%M:%S")
        base = base.replace(hour=t.hour, minute=t.minute, second=t.second)
    if m.group(3):
        base += timedelta(seconds=float(m.group(3)))
    return base.replace(tzinfo=timezone.utc)


def _epoch_seconds(dt: datetime) -> float:
    return (dt - _EPOCH).total_seconds()


def _epoch_micros(dt: datetime) -> int:
    """Integer microseconds since epoch — alignment checks must not ride
    on float seconds (at 2024 epoch scale float64 resolution is ~0.4 µs,
    too close to the 1 µs distinctions the <=/> rules depend on)."""
    d = dt - _EPOCH
    return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds


def _aligned(dt: datetime, bsec: int) -> bool:
    return _epoch_micros(dt) % (bsec * 1_000_000) == 0


def _desugar_between(where: str) -> str | None:
    """Rewrite ``<expr> BETWEEN <lit> AND <lit>`` (expr = bare column,
    ``DATE_TRUNC('unit', col)`` or ``CAST(col AS DATE)``; literals
    DATE/TIMESTAMP/bare-quoted) into the two-comparison form so the
    top-level AND split can reason conjunct-by-conjunct. Matching runs on
    a literal-masked copy (a BETWEEN inside a string can't trigger);
    ``NOT BETWEEN`` declines the whole clause (None) — its complement is
    a disjunction."""
    from approximate_query_engine_spark.sqlparser import (
        _mask_string_literals,
    )

    masked = _mask_string_literals(where)
    if _re.search(r"\bNOT\s+BETWEEN\b", masked, _re.I):
        return None
    pat = _re.compile(
        r"(DATE_TRUNC\(\s*'[^']*'\s*,\s*[A-Za-z_][\w.]*\s*\)"
        r"|CAST\(\s*[A-Za-z_][\w.]*\s+AS\s+DATE\s*\)"
        r"|[A-Za-z_][\w.]*)"
        r"\s+BETWEEN\s+((?:DATE|TIMESTAMP)?\s*'[^']*')"
        r"\s+AND\s+((?:DATE|TIMESTAMP)?\s*'[^']*')",
        _re.I,
    )
    out, last = [], 0
    for m in pat.finditer(masked):
        expr = where[m.start(1):m.end(1)]
        lo = where[m.start(2):m.end(2)].strip()
        hi = where[m.start(3):m.end(3)].strip()
        out.append(where[last:m.start()])
        out.append(f"{expr} >= {lo} AND {expr} <= {hi}")
        last = m.end()
    out.append(where[last:])
    return "".join(out)


def _trunc_dt(unit: str, dt: datetime) -> datetime:
    """DATE_TRUNC semantics in Python (week → Monday, matching Spark)."""
    d = dt.replace(microsecond=0)
    if unit == "minute":
        return d.replace(second=0)
    d = d.replace(minute=0, second=0)
    if unit == "hour":
        return d
    d = d.replace(hour=0)
    if unit == "day":
        return d
    if unit == "week":
        return d - timedelta(days=d.weekday())
    d = d.replace(day=1)
    if unit == "month":
        return d
    if unit == "quarter":
        return d.replace(month=((d.month - 1) // 3) * 3 + 1)
    return d.replace(month=1)  # year


def _next_boundary(unit: str, dt: datetime) -> datetime:
    """The boundary after a unit-aligned ``dt``."""
    if unit == "minute":
        return dt + timedelta(minutes=1)
    if unit == "hour":
        return dt + timedelta(hours=1)
    if unit == "day":
        return dt + timedelta(days=1)
    if unit == "week":
        return dt + timedelta(days=7)
    step = {"month": 1, "quarter": 3, "year": 12}[unit]
    m = dt.month - 1 + step
    return dt.replace(year=dt.year + m // 12, month=m % 12 + 1)


def _ts_conjunct_bounds(
    sc: str, ts: str, bsec: int
) -> tuple[list[tuple[str, str]], list[tuple[str, datetime]]] | None:
    """Translate one qualifier-stripped WHERE conjunct bounding ``ts``
    into rollup bucket bounds: ``([(op, iso_literal), ...], [(op,
    boundary_dt), ...])`` — the first list becomes ``bucket_start <op>
    TIMESTAMP '<iso>'`` conjuncts, the second the conservative
    ``p_date`` pruning bounds. None when the conjunct is not a provably
    bucket-exact time bound. Rules (each exact, never approximate):

    - raw ``ts >= L`` / ``ts < L``: L must sit ON the bucket grid;
    - raw ``ts <= L`` / ``ts > L``: timestamps have µs precision, so
      these ARE ``ts < L+1µs`` / ``ts >= L+1µs`` — route when the
      shifted bound lands on the grid (the inclusive-end dashboard
      idiom ``<= '… 23:59:59.999999'``);
    - ``DATE_TRUNC('unit', ts) cmp L`` (CAST-to-DATE normalized by the
      caller): unit boundaries must all fall on the bucket grid and L
      must be unit-aligned; ``=`` expands to [L, next), ``<=``/``>``
      shift to the unit's next boundary — exact because every row in
      [L, next) truncates to L.
    """
    # every upper prune below pairs with a STRICT ``bucket_start < B``
    # condition, so the last included bucket starts at or before B - 1µs:
    # truncating THAT instant to a date keeps a midnight-aligned bound
    # from listing the bound's own (fully filtered) day directory — at
    # 100 TB with day directories that's one free directory per query
    def _upper(dt):
        return dt - timedelta(microseconds=1)

    m = _re.fullmatch(
        rf"\s*{_re.escape(ts)}\s*(>=|<=|<|>)\s*"
        r"((?:DATE|TIMESTAMP)?\s*'[^']+')\s*",
        sc,
        _re.I,
    )
    if m:
        lit = _parse_literal(m.group(2))
        if lit is None:
            return None
        op = m.group(1)
        if op in (">=", "<"):
            if not _aligned(lit, bsec):
                return None  # bound slices a bucket
            iso = lit.strftime("%Y-%m-%d %H:%M:%S")
            if op == ">=":
                return [(op, iso)], [(">=", lit)]
            return [(op, iso)], [("<=", _upper(lit))]
        shifted = lit + timedelta(microseconds=1)
        if not _aligned(shifted, bsec):
            return None
        iso = shifted.strftime("%Y-%m-%d %H:%M:%S")
        if op == "<=":
            return [("<", iso)], [("<=", _upper(shifted))]
        return [(">=", iso)], [(">=", shifted)]
    m = _re.fullmatch(
        rf"\s*DATE_TRUNC\(\s*'(\w+)'\s*,\s*{_re.escape(ts)}\s*\)\s*"
        r"(=|>=|<=|<|>)\s*((?:DATE|TIMESTAMP)?\s*'[^']+')\s*",
        sc,
        _re.I,
    )
    if not m:
        return None
    unit, op = m.group(1).lower(), m.group(2)
    lit = _parse_literal(m.group(3))
    mod = _TRUNC_MODULUS.get(unit)
    if (
        lit is None
        or mod is None
        or mod % bsec != 0
        or _trunc_dt(unit, lit.replace(tzinfo=None))
        != lit.replace(tzinfo=None)
    ):
        return None
    iso = lit.strftime("%Y-%m-%d %H:%M:%S")
    nxt = _next_boundary(unit, lit)
    nxt_iso = nxt.strftime("%Y-%m-%d %H:%M:%S")
    if op == "=":
        return (
            [(">=", iso), ("<", nxt_iso)],
            [(">=", lit), ("<=", _upper(nxt))],
        )
    if op == ">=":
        return [(">=", iso)], [(">=", lit)]
    if op == "<":
        return [("<", iso)], [("<=", _upper(lit))]
    if op == "<=":
        return [("<", nxt_iso)], [("<=", _upper(nxt))]
    return [(">=", nxt_iso)], [(">=", nxt)]  # '>'


def _split_conjuncts(where: str) -> list[str] | None:
    """Top-level AND conjuncts of ``where``; None when a top-level OR
    makes conjunct-by-conjunct reasoning unsound."""
    from approximate_query_engine_spark.sqlparser import flatten_and_parens

    where = flatten_and_parens(where)
    desugared = _desugar_between(where)
    if desugared is None:
        return None
    where = desugared
    depth, in_str = 0, False
    parts, start, i = [], 0, 0
    upper = where.upper()
    while i < len(where):
        ch = where[i]
        if ch == "'":
            in_str = not in_str
        elif not in_str and ch == "(":
            depth += 1
        elif not in_str and ch == ")":
            depth -= 1
        elif (
            not in_str
            and depth == 0
            and upper.startswith("AND", i)
            and (i == 0 or not upper[i - 1].isalnum() and upper[i - 1] != "_")
            and (
                i + 3 >= len(upper)
                or not upper[i + 3].isalnum() and upper[i + 3] != "_"
            )
        ):
            parts.append(where[start:i])
            start = i + 3
            i += 3
            continue
        elif (
            not in_str
            and depth == 0
            and upper.startswith("OR", i)
            and (i == 0 or not upper[i - 1].isalnum() and upper[i - 1] != "_")
            and (
                i + 2 >= len(upper)
                or not upper[i + 2].isalnum() and upper[i + 2] != "_"
            )
        ):
            return None
        i += 1
    parts.append(where[start:])
    return [p.strip() for p in parts if p.strip()]


_SQL_KEYWORDS = frozenset(
    "AND OR NOT IN IS NULL BETWEEN LIKE TRUE FALSE DATE TIMESTAMP "
    "INTERVAL CAST AS ESCAPE EXISTS SELECT CASE WHEN THEN ELSE END "
    "BIGINT DOUBLE FLOAT DECIMAL STRING INT SMALLINT TINYINT BOOLEAN".split()
)


def _identifiers(text: str) -> set[str] | None:
    """Bare column identifiers referenced in a predicate (function names
    excluded); None when a subquery/CASE makes the scan unreliable."""
    no_str = _re.sub(r"'[^']*'", "''", text)
    if _re.search(r"\bSELECT\b|\bCASE\b", no_str, _re.I):
        return None
    out = set()
    for m in _re.finditer(r"[A-Za-z_][\w.]*", no_str):
        tok = m.group(0)
        if tok.upper() in _SQL_KEYWORDS:
            continue
        if no_str[m.end():].lstrip().startswith("("):
            continue  # function call
        out.add(tok)
    return out


def _strip_qualifier(expr: str, scopes: set[str]) -> str:
    """Remove ``alias.`` / ``table.`` prefixes owned by the routed table."""
    pat = r"\b(" + "|".join(_re.escape(s) for s in scopes) + r")\.(\w+)"
    return _re.sub(pat, r"\2", expr)


def kll_rank_error(k: int) -> float:
    """DataSketches' published KLL single-sided normalized rank-error
    bound: ε(k) ≈ 2.296 / k^0.9433 at 99% confidence (the quantiles
    component's documented getNormalizedRankError fit). k=200 → ~1.6%,
    k=800 → ~0.42%. The guarantee is on RANK: the returned value is a
    true data value whose rank is within ε of the requested p."""
    return 2.296 / (float(k) ** 0.9433)


def rewrite_to_rollup(
    parsed,
    info: dict,
    allow_approx_distinct: bool = False,
    allow_approx_quantile: bool = False,
) -> tuple[str, str, bool] | None:
    """Rewrite a parsed single-table aggregate to scan ``info``'s rollup
    — ``(sql, note, used_approx_distinct)`` — or None when the shape is
    not derivable.

    With ``allow_approx_distinct``, ``COUNT(DISTINCT c)`` over a column
    in ``info["distinct_cols"]`` rewrites to the merged HLL sketch
    estimate (DataSketches state unions across buckets; rel. std. err.
    ≈ 1.04/√2^lgk) — flagged in the returned bool so the caller
    prices/labels it as a sketch plan.

    With ``allow_approx_quantile``, ``MEDIAN(c)`` / ``PERCENTILE(c, p)``
    over a column in ``info["quantile_cols"]`` rewrites to the merged
    KLL sketch quantile (``kll_merge_agg_double`` across buckets →
    ``kll_sketch_get_quantile_double``) — same flag. The answer is a
    true data value whose rank is within ε(kll_k) of p
    (:func:`kll_rank_error`); below the sketch's compaction threshold it
    is exactly the inclusive-rank order statistic (discrete quantile).

    ``info``: {"view", "files_view", "time_col", "bucket",
    "bucket_seconds", "dims", "measures"} (engine.create_rollup builds
    it). Soundness rules, each of which declines rather than risks a
    wrong answer:

    - aggregates must be COUNT(*)/COUNT(m)/SUM(m)/MIN(m)/MAX(m)/AVG(m)
      over registered measures, no DISTINCT (n_rows / m_count / m_sum /
      m_min / m_max state re-aggregates exactly; AVG = Σsum/Σcount —
      never an average of averages);
    - group keys must be rollup dims or DATE_TRUNC(unit, ts) at a grain
      whose boundaries all fall on the bucket grid;
    - WHERE conjuncts must reference only dims (passed through) or bound
      ts: raw ``>=``/``<`` literals EXACTLY on bucket boundaries,
      ``<=``/``>`` literals one microsecond before a boundary (µs is the
      timestamp tick, so the shift is an identity, not a convention), or
      ``DATE_TRUNC``/``CAST AS DATE`` comparisons (``=``, ``>=``, ``<``,
      ``<=``, ``>``) with unit-aligned literals — ``<=``/``>`` shift to
      the unit's next boundary, which is exact because every row in
      [literal, next) truncates to the literal. ``BETWEEN`` desugars to
      the two comparisons first; a misaligned bound would slice a
      bucket, which the rollup cannot, so it declines;
    - HAVING rewrites its aggregate calls the same way; the rewritten
      clause must reference only dims + rollup state, else decline;
    - OR at the top level of WHERE / quantiles / DISTINCT decline.
    """
    ts = info["time_col"]
    bsec = info["bucket_seconds"]
    dims = set(info["dims"])
    measures = set(info["measures"])
    scopes = {info["source_table"]}
    if parsed.table_alias:
        scopes.add(parsed.table_alias)
    distinct_set = set(info.get("distinct_cols", []))
    theta_set = set(info.get("theta_cols", []))
    quantile_set = set(info.get("quantile_cols", []))
    kll_k = int(info.get("kll_k", 200))
    used_approx: list[str] = []
    used_quantile: list[str] = []
    #: every column the rewritten SQL may legitimately reference — the
    #: post-rewrite soundness check for HAVING
    state_cols = (
        {"n_rows", "bucket_start"}
        | {
            f"{m}_{s}"
            for m in measures
            for s in ("count", "sum", "min", "max")
        }
        | {f"{dc}_hll" for dc in distinct_set}
        | {f"{qc}_kll" for qc in quantile_set}
        | {f"{sc}_theta" for sc in theta_set}
    )

    def strip(e: str) -> str:
        return _strip_qualifier(e, scopes).strip()

    def rewrite_key(expr: str) -> str | None:
        e = strip(expr)
        if e in dims:
            return e
        m = _re.fullmatch(
            rf"DATE_TRUNC\(\s*'(\w+)'\s*,\s*{_re.escape(ts)}\s*\)", e, _re.I
        )
        if m:
            unit = m.group(1).lower()
            mod = _TRUNC_MODULUS.get(unit)
            if mod is not None and mod % bsec == 0:
                return f"DATE_TRUNC('{unit.upper()}', bucket_start)"
        # GROUP BY CAST(ts AS DATE) — the other dashboard day-grain key;
        # DATE-typed (unlike DATE_TRUNC's timestamp), so it rewrites to
        # the same cast of bucket_start
        m = _re.fullmatch(
            rf"CAST\(\s*{_re.escape(ts)}\s+AS\s+DATE\s*\)", e, _re.I
        )
        if m and 86400 % bsec == 0:
            return "CAST(bucket_start AS DATE)"
        return None

    def rewrite_agg(agg) -> str | None:
        if agg.distinct:
            arg = strip(agg.arg)
            if allow_approx_distinct and agg.func == "COUNT":
                if arg in distinct_set:
                    used_approx.append(arg)
                    return (
                        f"hll_sketch_estimate(hll_union_agg({arg}_hll))"
                    )
                # theta state serves plain distinct counts too (union
                # then estimate) — same accuracy family (~1/√2^lgk), so
                # the caller's HLL tolerance gate covers it
                if arg in theta_set:
                    used_approx.append(arg)
                    return (
                        f"CAST(ROUND(theta_sketch_estimate("
                        f"theta_union_agg({arg}_theta, "
                        f"{int(info.get('theta_lgk', 12))}))) AS BIGINT)"
                    )
            return None
        if agg.is_quantile:
            if not allow_approx_quantile:
                return None
            try:
                vexpr, p = agg.quantile_args()
            except Exception:  # noqa: BLE001 - non-literal p: not derivable
                return None
            arg = strip(vexpr)
            if arg not in quantile_set:
                return None
            used_quantile.append(arg)
            return (
                f"kll_sketch_get_quantile_double("
                f"kll_merge_agg_double({arg}_kll, {kll_k}), "
                f"CAST({p!r} AS DOUBLE))"
            )
        if agg.func not in ("COUNT", "SUM", "MIN", "MAX", "AVG"):
            return None
        arg = strip(agg.arg)
        if agg.func == "COUNT":
            if agg.is_star or arg == "1":
                return "COALESCE(SUM(n_rows), CAST(0 AS BIGINT))"
            if arg in measures:
                return f"COALESCE(SUM({arg}_count), CAST(0 AS BIGINT))"
            return None
        if arg not in measures:
            return None
        if agg.func == "SUM":
            return f"SUM({arg}_sum)"
        if agg.func == "MIN":
            return f"MIN({arg}_min)"
        if agg.func == "MAX":
            return f"MAX({arg}_max)"
        return f"SUM({arg}_sum) / NULLIF(SUM({arg}_count), 0)"

    # ---- select list ----
    items, aliases = [], set()
    has_agg, nonagg_keys = False, []
    for it in parsed.select_items:
        if it.agg is not None:
            new = rewrite_agg(it.agg)
            has_agg = True
        else:
            new = rewrite_key(it.raw)
            nonagg_keys.append(new)
        if new is None:
            return None
        if it.alias:
            alias_sql = it.alias
        elif strip(it.raw) in dims:
            # Spark names an unaliased qualified column by its bare name
            alias_sql = strip(it.raw)
        else:
            alias_sql = f"`{it.raw}`"
        items.append(f"{new} AS {alias_sql}")
        if it.alias:
            aliases.add(it.alias)

    # ---- group by ----
    keys = []
    for g in parsed.group_by:
        new = rewrite_key(g)
        if new is None:
            return None
        keys.append(new)

    # the rollup holds one row per (bucket, dims) GROUP, not one row per
    # raw event — an aggregate-free projection (or a select item outside
    # GROUP BY) would come back with the wrong multiplicity, so decline
    if not has_agg or any(k not in keys for k in nonagg_keys):
        return None

    # ---- where ----
    conds, prune = [], []
    if parsed.where:
        conjs = _split_conjuncts(parsed.where)
        if conjs is None:
            return None
        materialized = bool(
            info.get("files_view") and info["files_view"] != info["view"]
        )

        def add_prune(op: str, dt: datetime) -> None:
            # conservative date-directory pruning superset (the
            # bucket_start conjuncts are the exact filter); only the
            # materialized files view carries p_date
            if materialized:
                prune.append(f"p_date {op} '{dt.strftime('%Y-%m-%d')}'")

        for c in conjs:
            ids = _identifiers(c)
            if ids is None:
                return None
            bare = {strip(i) for i in ids}
            if bare and bare <= dims:
                conds.append(strip(c))
                continue
            sc = strip(c)
            # CAST(ts AS DATE) ≡ DATE_TRUNC('DAY', ts) — normalize first
            sc = _re.sub(
                rf"CAST\(\s*{_re.escape(ts)}\s+AS\s+DATE\s*\)",
                f"DATE_TRUNC('DAY', {ts})",
                sc,
                flags=_re.I,
            )
            tb = _ts_conjunct_bounds(sc, ts, bsec)
            if tb is None:
                return None
            bconds, bprunes = tb
            for bop, iso in bconds:
                conds.append(f"bucket_start {bop} TIMESTAMP '{iso}'")
            for pop, pdt in bprunes:
                add_prune(pop, pdt)

    # ---- having ----
    having_sql = None
    if parsed.having:
        from approximate_query_engine_spark.sqlparser import Aggregate

        bad = False

        def _agg_repl(m):
            nonlocal bad
            if m.group(2):  # DISTINCT inside an aggregate
                bad = True
                return m.group(0)
            new = rewrite_agg(
                Aggregate(m.group(1).upper(), m.group(3), False, m.group(0))
            )
            if new is None:
                bad = True
                return m.group(0)
            return f"({new})"

        h = _re.sub(
            r"\b(COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(DISTINCT\s+)?([^()]*)\)",
            _agg_repl,
            parsed.having,
            flags=_re.I,
        )
        ids = None if bad else _identifiers(h)
        if ids is None:
            return None
        # everything the rewritten HAVING references must be a dim or
        # rollup partial-agg state — anything else means an original
        # reference this rewrite didn't account for
        if {strip(i) for i in ids} - dims - state_cols:
            return None
        having_sql = _strip_qualifier(h, scopes)

    # ---- order by / limit ----
    order = []
    for o in parsed.order_by:
        new = rewrite_key(o.expr)
        if new is None:
            m = _re.fullmatch(
                r"(COUNT|SUM|MIN|MAX|AVG)\s*\((.*)\)", o.expr.strip(), _re.I
            )
            if m:
                from approximate_query_engine_spark.sqlparser import Aggregate

                new = rewrite_agg(
                    Aggregate(m.group(1).upper(), m.group(2), False, o.expr)
                )
        if new is None:
            if o.expr in aliases:  # select-list alias — resolves as-is
                order.append(o.render())
                continue
            return None
        order.append(f"{new} DESC" if o.desc else new)

    sql = "SELECT " + ", ".join(items)
    sql += f" FROM {info.get('files_view') or info['view']}"
    allconds = conds + prune
    if allconds:
        sql += " WHERE " + " AND ".join(allconds)
    if keys:
        sql += " GROUP BY " + ", ".join(keys)
    if having_sql:
        sql += f" HAVING {having_sql}"
    if order:
        sql += " ORDER BY " + ", ".join(order)
    if parsed.limit is not None:
        sql += f" LIMIT {parsed.limit}"
    if used_approx or used_quantile:
        import math

        parts = []
        hll_used = sorted({a for a in used_approx if a in distinct_set})
        theta_used = sorted(
            {a for a in used_approx if a in theta_set and a not in distinct_set}
        )
        if hll_used:
            err = 1.04 / math.sqrt(2 ** int(info.get("hll_lgk", 12)))
            parts.append(
                f"COUNT(DISTINCT {', '.join(hll_used)}) "
                f"from merged HLL sketch state, rel err ≈ {err:.1%}"
            )
        if theta_used:
            terr = 1.0 / math.sqrt(2 ** int(info.get("theta_lgk", 12)))
            parts.append(
                f"COUNT(DISTINCT {', '.join(theta_used)}) "
                f"from merged theta sketch state, rel err ≈ {terr:.1%}"
            )
        if used_quantile:
            qerr = kll_rank_error(kll_k)
            parts.append(
                f"quantiles of {', '.join(sorted(set(used_quantile)))} "
                f"from merged KLL sketch state, rank err ≤ {qerr:.2%}"
            )
        note = (
            f"answered from materialized rollup {info['view']} "
            f"(bucket {info['bucket']}; {'; '.join(parts)}; "
            "other aggregates exact)"
        )
    else:
        note = (
            f"answered from materialized rollup {info['view']} "
            f"(bucket {info['bucket']}; exact — partial-agg state "
            "re-aggregated)"
        )
    return sql, note, bool(used_approx or used_quantile)


def rewrite_topk_to_rollup(
    parsed, info: dict
) -> tuple[str, str, bool, str] | None:
    """Rewrite the canonical TOP-ITEMS dashboard SQL —
    ``SELECT col, COUNT(*) FROM t [WHERE ...] GROUP BY col
    ORDER BY COUNT(*) DESC LIMIT k`` — to ``info``'s combined
    frequent-items state (``approx_top_k_combine`` over the range's
    ``col_topk`` sketches), or None when the shape is not derivable.
    The SQL twin of :meth:`AQEngine.rollup_top_items`: the grouping
    column is too high-cardinality to be a rollup dim (that exact case
    routes through rewrite_to_rollup), so the state IS the only
    pre-aggregation that can serve it without a fact scan.

    Accuracy contract: counts are EXACT while the range's distinct
    items fit ``topk_budget`` (no purge can occur in any partial) — the
    CALLER must certify that regime before serving the rewrite (the
    engine checks catalog ndv or the rollup's own distinct-sketch
    state), because beyond the budget the Misra–Gries additive bound
    has no bound relative to the k-th item's count. The sketch is asked
    for its full budget of items (not a candidate prefix), so the
    deterministic (count DESC, item ASC) re-rank breaks ties globally —
    a valid instance of the user's count-DESC ordering. Returns
    ``(sql, note, used_approx, column)``.

    Soundness rules, each declining rather than risking a wrong answer:
    exactly one group key (a tracked topk column), select items are the
    key + one COUNT(*), ORDER BY leads with that count DESC (an
    optional secondary ASC on the key is absorbed), LIMIT present,
    WHERE conjuncts are dim filters or bucket-aligned time bounds
    (combined state cannot slice a bucket), no HAVING/DISTINCT/OR."""
    ts = info["time_col"]
    bsec = info["bucket_seconds"]
    dims = set(info["dims"])
    topk_set = set(info.get("topk_cols", []))
    budget = int(info.get("topk_budget", 1024))
    scopes = {info["source_table"]}
    if parsed.table_alias:
        scopes.add(parsed.table_alias)

    def strip(e: str) -> str:
        return _strip_qualifier(e, scopes).strip()

    if parsed.having or parsed.limit is None or parsed.limit <= 0:
        return None
    if len(parsed.group_by) != 1:
        return None
    col = strip(parsed.group_by[0])
    if col not in topk_set or col in dims:
        return None  # a dim group key re-aggregates exactly — not ours
    if len(parsed.select_items) != 2:
        return None
    col_alias = cnt_alias = None
    for it in parsed.select_items:
        if it.agg is not None:
            if it.agg.distinct or it.agg.func != "COUNT":
                return None
            if not (it.agg.is_star or strip(it.agg.arg) == "1"):
                return None
            cnt_alias = it.alias or f"`{it.raw}`"
        else:
            if strip(it.raw) != col:
                return None
            col_alias = it.alias or col
    if col_alias is None or cnt_alias is None:
        return None
    # ORDER BY must LEAD with the count DESC; a secondary ASC key on the
    # grouping column matches the deterministic re-rank we emit anyway
    if not parsed.order_by:
        return None
    lead = parsed.order_by[0]
    lead_e = strip(lead.expr)
    is_cnt = (
        lead_e == cnt_alias.strip("`")
        or _re.fullmatch(r"COUNT\s*\(\s*(\*|1)\s*\)", lead_e, _re.I)
    )
    if not (lead.desc and is_cnt):
        return None
    if len(parsed.order_by) > 2:
        return None
    if len(parsed.order_by) == 2:
        sec = parsed.order_by[1]
        if sec.desc or strip(sec.expr) not in (col, col_alias):
            return None

    # ---- where: dim filters pass through; ts bounds translate to the
    # bucket grid exactly like rewrite_to_rollup (misaligned declines)
    conds, prune = [], []
    if parsed.where:
        conjs = _split_conjuncts(parsed.where)
        if conjs is None:
            return None
        materialized = bool(
            info.get("files_view") and info["files_view"] != info["view"]
        )
        for c in conjs:
            ids = _identifiers(c)
            if ids is None:
                return None
            bare = {strip(i) for i in ids}
            if bare and bare <= dims:
                conds.append(strip(c))
                continue
            sc = strip(c)
            sc = _re.sub(
                rf"CAST\(\s*{_re.escape(ts)}\s+AS\s+DATE\s*\)",
                f"DATE_TRUNC('DAY', {ts})",
                sc,
                flags=_re.I,
            )
            tb = _ts_conjunct_bounds(sc, ts, bsec)
            if tb is None:
                return None
            bconds, bprunes = tb
            for bop, iso in bconds:
                conds.append(f"bucket_start {bop} TIMESTAMP '{iso}'")
            if materialized:
                for pop, pdt in bprunes:
                    prune.append(
                        f"p_date {pop} '{pdt.strftime('%Y-%m-%d')}'"
                    )

    k = int(parsed.limit)
    # ask the sketch for its FULL budget of items: a shorter candidate
    # list could drop ties at the cutoff that the deterministic re-rank
    # (count DESC, item ASC) must break globally — budget-sized output
    # is still state-scale, so the width costs nothing material
    cand = budget
    src = info.get("files_view") or info["view"]
    where_sql = ""
    allconds = conds + prune
    if allconds:
        where_sql = " WHERE " + " AND ".join(allconds)
    # the inner GROUP BY 'all' makes an EMPTY range produce zero groups
    # (no rows) instead of one empty combine buffer, which Spark 4.1's
    # ApproxTopKCombine cannot serialize (genSketchSerDe MatchError);
    # COALESCE(1) sidesteps the same footgun for empty PARTIAL buffers —
    # free at state cardinality
    sql = (
        f"SELECT e.item AS {col_alias}, e.count AS {cnt_alias} "
        f"FROM (SELECT explode(approx_top_k_estimate("
        f"approx_top_k_combine(`{col}_topk`, {budget}), {cand})) AS e "
        f"FROM (SELECT /*+ COALESCE(1) */ `{col}_topk` FROM {src}"
        f"{where_sql}) GROUP BY 'all') "
        f"ORDER BY {cnt_alias} DESC, {col_alias} ASC LIMIT {k}"
    )
    note = (
        f"top-{k} {col} from combined frequent-items state of "
        f"materialized rollup {info['view']} (bucket {info['bucket']}, "
        f"budget {budget})"
    )
    return sql, note, True, col


def _fmt_ts(dt: datetime) -> str:
    """Full-precision TIMESTAMP literal text (microseconds kept — hybrid
    bounds are routinely off-grid by exactly 1 µs)."""
    if dt.microsecond:
        return dt.strftime("%Y-%m-%d %H:%M:%S.%f")
    return dt.strftime("%Y-%m-%d %H:%M:%S")


def _ceil_bucket(dt: datetime, bsec: int) -> datetime:
    mics = _epoch_micros(dt)
    step = bsec * 1_000_000
    up = ((mics + step - 1) // step) * step
    return _EPOCH + timedelta(microseconds=up)


def _floor_bucket(dt: datetime, bsec: int) -> datetime:
    mics = _epoch_micros(dt)
    step = bsec * 1_000_000
    return _EPOCH + timedelta(microseconds=(mics // step) * step)


def rewrite_to_rollup_hybrid(
    parsed,
    info: dict,
    layout_info: dict | None = None,
    allow_approx_distinct: bool = False,
    allow_approx_quantile: bool = False,
) -> tuple[str, str, bool] | None:
    """REAL-TIME continuous-aggregate rewrite: answer an aggregate whose
    time bounds do NOT align to the bucket grid by unioning the rollup's
    state for every COMPLETE bucket with freshly-built state for the raw
    edge slices — ``(sql, note, used_approx_distinct)`` or None. This is
    the hypertable "real-time aggregate" pattern: ``WHERE ts >= <aligned
    7 days ago> AND ts < <now, mid-bucket>`` reads 7 days of rollup rows
    plus only the current partial bucket's raw rows, exactly.

    Mechanics: the fresh branch aggregates the slice rows to the SAME
    partial-agg state schema as the rollup (COUNT/SUM/MIN/MAX per
    measure, hll_sketch_agg per tracked distinct column) — a map-side
    combine over only the slice rows, so state types match exactly and
    ``COUNT(DISTINCT)`` over a tracked column merges across both
    branches via hll_union_agg (flagged approximate, same pricing as the
    plain sketch path). The slice scan routes through the table's
    time-partitioned layout when one is registered and fresh
    (``layout_info``), pruning to the slice's buckets; otherwise it
    falls back to the base table (parquet min/max pushdown only — fine
    at test scale, register a layout at warehouse scale).

    Soundness: bounds compose by max(lower)/min(upper) over the
    conjuncts; only dim conjuncts may remain; at least one complete
    bucket must fall inside the range (otherwise the rollup contributes
    nothing and the normal planner should own the query)."""
    from dataclasses import replace as _dc_replace

    ts = info["time_col"]
    bsec = info["bucket_seconds"]
    dims = list(info["dims"])
    dim_set = set(dims)
    measures = list(info["measures"])
    scopes = {info["source_table"]}
    if parsed.table_alias:
        scopes.add(parsed.table_alias)

    if not parsed.where:
        return None
    conjs = _split_conjuncts(parsed.where)
    if conjs is None:
        return None
    dim_conjs: list[str] = []
    lowers: list[datetime] = []
    uppers: list[datetime] = []
    saw_misaligned = False
    for c in conjs:
        ids = _identifiers(c)
        if ids is None:
            return None
        bare = {_strip_qualifier(i, scopes).strip() for i in ids}
        if bare and bare <= dim_set:
            dim_conjs.append(_strip_qualifier(c, scopes).strip())
            continue
        sc = _strip_qualifier(c, scopes).strip()
        sc = _re.sub(
            rf"CAST\(\s*{_re.escape(ts)}\s+AS\s+DATE\s*\)",
            f"DATE_TRUNC('DAY', {ts})",
            sc,
            flags=_re.I,
        )
        tb = _ts_conjunct_bounds(sc, ts, bsec)
        if tb is not None:
            # aligned bound: bucket bounds ARE raw-ts bounds
            for bop, iso in tb[0]:
                dt = _parse_literal(f"'{iso}'")
                if dt is None:
                    return None
                (lowers if bop == ">=" else uppers).append(dt)
            continue
        m = _re.fullmatch(
            rf"\s*{_re.escape(ts)}\s*(>=|<=|<|>)\s*"
            r"((?:DATE|TIMESTAMP)?\s*'[^']+')\s*",
            sc,
            _re.I,
        )
        if m is None:
            return None
        lit = _parse_literal(m.group(2))
        if lit is None:
            return None
        op = m.group(1)
        saw_misaligned = True
        if op == ">=":
            lowers.append(lit)
        elif op == ">":
            lowers.append(lit + timedelta(microseconds=1))
        elif op == "<":
            uppers.append(lit)
        else:
            uppers.append(lit + timedelta(microseconds=1))
    if not saw_misaligned:
        return None  # plain rewrite's territory (it declined elsewhere)
    A = max(lowers) if lowers else None
    B = min(uppers) if uppers else None
    ceilA = _ceil_bucket(A, bsec) if A is not None else None
    floorB = _floor_bucket(B, bsec) if B is not None else None
    if ceilA is not None and floorB is not None and ceilA >= floorB:
        return None  # no complete bucket — nothing for the rollup to add
    if A is not None and B is not None and B <= A:
        return None  # empty range — let the normal path answer it

    distinct_cols = list(info.get("distinct_cols", []))
    quantile_cols = list(info.get("quantile_cols", []))
    kll_k = int(info.get("kll_k", 200))
    topk_cols = list(info.get("topk_cols", []))
    topk_budget = int(info.get("topk_budget", 1024))
    theta_cols = list(info.get("theta_cols", []))
    theta_lgk = int(info.get("theta_lgk", 12))
    state_cols = (
        ["n_rows"]
        + [
            f"{m_}_{s}"
            for m_ in measures
            for s in ("count", "sum", "min", "max")
        ]
        + [f"{dc}_hll" for dc in distinct_cols]
        + [f"{qc}_kll" for qc in quantile_cols]
        + [f"{tc}_topk" for tc in topk_cols]
        + [f"{sc}_theta" for sc in theta_cols]
    )
    proj = ", ".join(["bucket_start", *dims, *state_cols])

    # ---- rollup branch: complete buckets only, date-dir pruned ----
    files_view = info.get("files_view") or info["view"]
    materialized = bool(
        info.get("files_view") and info["files_view"] != info["view"]
    )
    rconds = []
    if ceilA is not None:
        rconds.append(f"bucket_start >= TIMESTAMP '{_fmt_ts(ceilA)}'")
        if materialized:
            rconds.append(f"p_date >= '{ceilA.strftime('%Y-%m-%d')}'")
    if floorB is not None:
        rconds.append(f"bucket_start < TIMESTAMP '{_fmt_ts(floorB)}'")
        if materialized:
            # strict upper bound: the last included bucket starts before
            # floorB, so a midnight-aligned floorB must not list its own
            # (fully filtered) day directory
            tight = floorB - timedelta(microseconds=1)
            rconds.append(f"p_date <= '{tight.strftime('%Y-%m-%d')}'")
    rollup_part = f"SELECT {proj} FROM {files_view}"
    if rconds:
        rollup_part += " WHERE " + " AND ".join(rconds)

    # ---- fresh branch: build the SAME partial-agg state over only the
    # edge-slice rows (map-side combine; state types match the rollup's
    # exactly, sketches included) ----
    fresh_state = ["COUNT(*) AS n_rows"]
    for m_ in measures:
        fresh_state += [
            f"COUNT({m_}) AS {m_}_count",
            f"SUM({m_}) AS {m_}_sum",
            f"MIN({m_}) AS {m_}_min",
            f"MAX({m_}) AS {m_}_max",
        ]
    for dc in distinct_cols:
        fresh_state.append(
            f"hll_sketch_agg({dc}, {int(info.get('hll_lgk', 12))}) "
            f"AS {dc}_hll"
        )
    for qc in quantile_cols:
        fresh_state.append(
            f"kll_sketch_agg_double(CAST(`{qc}` AS DOUBLE), {kll_k}) "
            f"AS {qc}_kll"
        )
    for tc in topk_cols:
        fresh_state.append(
            f"approx_top_k_accumulate(`{tc}`, {topk_budget}) "
            f"AS {tc}_topk"
        )
    for sc in theta_cols:
        # the fresh edge-slice sketches MERGE with the layout's state, so
        # the key encoding MUST come from the layout's recorded flag —
        # a mismatched encoding would silently union two hash spaces
        fresh_state.append(
            f"theta_sketch_agg("
            f"{theta_key_sql(sc, bool(info.get('theta_key_native')))}, "
            f"{theta_lgk}) AS {sc}_theta"
        )
    bucket_expr = (
        f"TIMESTAMP_SECONDS(CAST(FLOOR(UNIX_TIMESTAMP({ts}) / {bsec}) "
        f"* {bsec} AS BIGINT))"
    )
    slices: list[tuple[datetime | None, datetime | None]] = []
    if A is not None and (ceilA != A):
        head_hi = ceilA if B is None else min(ceilA, B)
        slices.append((A, head_hi))
    if B is not None and (floorB != B):
        tail_lo = floorB if A is None else max(floorB, A)
        slices.append((tail_lo, B))
    fresh_src, layout_note = info["source_table"], ""
    grain_k = {"hour": 13, "day": 10, "month": 7}
    if layout_info and layout_info.get("grain") in grain_k:
        fresh_src = layout_info["view"]
        layout_note = f" via layout {fresh_src}"
    preds = []
    for lo, hi in slices:
        p = [
            f"{ts} >= TIMESTAMP '{_fmt_ts(lo)}'",
            f"{ts} < TIMESTAMP '{_fmt_ts(hi)}'",
        ]
        if layout_note:
            k = grain_k[layout_info["grain"]]
            pcol = layout_info.get("partition_col", "p_bucket")
            hi_inc = hi - timedelta(microseconds=1)
            p.append(f"{pcol} >= '{lo.isoformat(sep=' ')[:k]}'")
            p.append(f"{pcol} <= '{hi_inc.isoformat(sep=' ')[:k]}'")
        preds.append("(" + " AND ".join(p) + ")")
    if not preds:
        return None  # misaligned flag without a real slice — bail safely
    fresh_proj = ", ".join(
        [f"{bucket_expr} AS bucket_start", *dims, *fresh_state]
    )
    fresh_keys = ", ".join([bucket_expr, *dims])
    fresh_part = (
        f"SELECT {fresh_proj} FROM {fresh_src} "
        f"WHERE {' OR '.join(preds)} GROUP BY {fresh_keys}"
    )

    hybrid_view = f"({rollup_part} UNION ALL {fresh_part}) AS __aqe_rt"
    parsed2 = _dc_replace(
        parsed, where=" AND ".join(dim_conjs) if dim_conjs else None
    )
    info2 = dict(info)
    info2["files_view"] = hybrid_view
    routed = rewrite_to_rollup(
        parsed2,
        info2,
        allow_approx_distinct=allow_approx_distinct,
        allow_approx_quantile=allow_approx_quantile,
    )
    if routed is None:
        return None
    sql, inner_note, used_approx = routed
    n_slices = len(slices)
    approx_note = ""
    if used_approx:
        import math

        parts = []
        if "HLL" in inner_note:
            err = 1.04 / math.sqrt(2 ** int(info.get("hll_lgk", 12)))
            parts.append(
                f"COUNT(DISTINCT) from HLL state merged across both "
                f"branches, rel err ≈ {err:.1%}"
            )
        if "theta sketch state" in inner_note:
            terr = 1.0 / math.sqrt(2 ** int(info.get("theta_lgk", 12)))
            parts.append(
                f"COUNT(DISTINCT) from theta state merged across both "
                f"branches, rel err ≈ {terr:.1%}"
            )
        if "KLL" in inner_note:
            parts.append(
                f"quantiles from KLL state merged across both branches, "
                f"rank err ≤ {kll_rank_error(kll_k):.2%}"
            )
        approx_note = "; " + "; ".join(parts)
    note = (
        f"answered from materialized rollup {info['view']} + raw edge "
        f"slice{'s' if n_slices > 1 else ''}{layout_note} (real-time "
        f"hybrid: complete buckets from partial-agg state, the "
        f"off-grid remainder aggregated in place"
        f"{approx_note or ' — exact'})"
    )
    return sql, note, used_approx


def rewrite_join_to_rollup(
    jq,
    info: dict,
    table_columns: dict[str, list[str]],
    allow_approx_distinct: bool = False,
) -> tuple[str, str, bool] | None:
    """Rewrite a star-join aggregate so the FACT side is the rollup, not
    the raw event table — ``(sql, note, used_approx_distinct)`` or None.

    The 100 TB dashboard shape is ``fact ⋈ dims`` with a time bound and
    aggregates over fact measures. When the join keys on the fact side
    are rollup DIMENSIONS, the join distributes over the pre-aggregation:
    every raw join-output row descends from exactly one fact row, and all
    fact rows of one rollup group share the same dim values, hence the
    same dim matches — so ``COUNT(*)`` over the raw join equals
    ``SUM(n_rows)`` over rollup ⋈ dims, and fact-measure SUM/COUNT/MIN/
    MAX/AVG re-aggregate from state identically. The joined scan shrinks
    from the fact table to the rollup (bucket compression factor), and
    Catalyst still broadcasts the dims. ``COUNT(DISTINCT fact_col)`` for
    a tracked sketch column stays correct under non-unique dim matches
    because HLL union is idempotent.

    Soundness rules (decline, never guess):
    - every ON condition is a conjunction of plain equalities, and any
      fact-side column in one is a rollup dim;
    - aggregates are COUNT(*)/fact-measure COUNT/SUM/MIN/MAX/AVG (or HLL
      COUNT(DISTINCT) when allowed); aggregates over DIM columns decline
      (they'd collapse per-fact-row repetition);
    - group keys are fact dims, bucket-aligned DATE_TRUNC/CAST-to-DATE
      of the fact ts, or dim-table columns (which pass through);
    - non-aggregate select items must appear in GROUP BY and at least
      one aggregate must be present (row multiplicity);
    - WHERE conjuncts reference dim tables only (pass through), fact
      dims only (pass through — the rollup carries them), or bound the
      fact ts bucket-exactly (_ts_conjunct_bounds); mixed fact+dim
      conjuncts decline; HAVING rewrites its aggregates through the same
      rules and declines on anything else;
    - every table reference is unique and unqualified columns must
      resolve to exactly one joined table.
    """
    fact = info["source_table"]
    names = [t for t, _ in jq.tables]
    if names.count(fact) != 1 or len(set(names)) != len(names):
        return None
    ts = info["time_col"]
    bsec = info["bucket_seconds"]
    dims = set(info["dims"])
    measures = set(info["measures"])
    distinct_set = set(info.get("distinct_cols", []))
    theta_set = set(info.get("theta_cols", []))
    fact_alias = jq.alias_of(fact)  # alias if present, else table name
    R = fact_alias  # the rollup keeps the fact's alias in the FROM body
    used_approx: list[str] = []

    own: dict[str, set[str]] = {}
    for t, _a in jq.tables:
        cols = table_columns.get(t)
        if cols is None:
            return None
        for c in cols:
            own.setdefault(c, set()).add(t)
    #: columns the rollup view ADDS relative to the fact table — an
    #: unqualified reference to a same-named DIM column would become
    #: ambiguous once the fact reference is swapped for the rollup
    state_names = (
        {"n_rows", "bucket_start", "p_date"}
        | {f"{m}_{s}" for m in measures for s in ("count", "sum", "min", "max")}
        | {f"{dc}_hll" for dc in distinct_set}
        | {f"{sc}_theta" for sc in theta_set}
        | {f"{qc}_kll" for qc in info.get("quantile_cols", [])}
        | {f"{tc}_topk" for tc in info.get("topk_cols", [])}
    )

    def resolve(ref: str) -> tuple[str, str] | None:
        """qualified/unqualified column reference → (table, column)."""
        ref = ref.strip()
        if "." in ref:
            q, c = ref.split(".", 1)
            for t, a in jq.tables:
                if q == (a or t):
                    return (t, c) if c in table_columns.get(t, []) else None
            return None
        owners = own.get(ref)
        if owners is None or len(owners) != 1:
            return None
        owner = next(iter(owners))
        if owner != fact and ref in state_names:
            return None  # would collide with a rollup state column
        return owner, ref

    # ---- ON conditions: equi-joins whose fact-side keys are dims ----
    for seg in _re.split(r"\bJOIN\b", jq.from_body, flags=_re.I)[1:]:
        mo = _re.search(r"\bON\b", seg, _re.I)
        if not mo:
            return None
        cond = seg[mo.end():]
        for eq in _re.split(r"\bAND\b", cond, flags=_re.I):
            pm = _re.fullmatch(
                r"\s*([A-Za-z_][\w.]*)\s*=\s*([A-Za-z_][\w.]*)\s*", eq
            )
            if pm is None:
                return None
            for side in (pm.group(1), pm.group(2)):
                r = resolve(side)
                if r is None:
                    return None
                if r[0] == fact and r[1] not in dims:
                    return None

    def rewrite_agg(agg) -> str | None:
        if agg.distinct:
            if not (allow_approx_distinct and agg.func == "COUNT"):
                return None
            r = resolve(agg.arg)
            if r is None or r[0] != fact:
                return None
            if r[1] in distinct_set:
                used_approx.append(r[1])
                return (
                    f"hll_sketch_estimate(hll_union_agg({R}.{r[1]}_hll))"
                )
            if r[1] in theta_set:
                # theta union is idempotent like HLL union, so distinct
                # stays correct under non-unique dim matches too
                used_approx.append(r[1])
                return (
                    f"CAST(ROUND(theta_sketch_estimate("
                    f"theta_union_agg({R}.{r[1]}_theta, "
                    f"{int(info.get('theta_lgk', 12))}))) AS BIGINT)"
                )
            return None
        # quantile (KLL) and top-k state must DECLINE over a join: a dim
        # multiplicity of m repeats each fact value m times in the raw
        # join, and sketch state cannot be weight-scaled — unlike
        # counts/sums (multiply via SUM(n_rows)) or HLL/theta
        # (idempotent union). Only the is_quantile grammar reaches here;
        # it falls through to the whitelist below and declines.
        if agg.func not in ("COUNT", "SUM", "MIN", "MAX", "AVG"):
            return None
        if agg.func == "COUNT" and (agg.is_star or agg.arg.strip() == "1"):
            return f"COALESCE(SUM({R}.n_rows), CAST(0 AS BIGINT))"
        r = resolve(agg.arg)
        if r is None or r[0] != fact or r[1] not in measures:
            return None
        c = r[1]
        if agg.func == "COUNT":
            return f"COALESCE(SUM({R}.{c}_count), CAST(0 AS BIGINT))"
        if agg.func == "SUM":
            return f"SUM({R}.{c}_sum)"
        if agg.func == "MIN":
            return f"MIN({R}.{c}_min)"
        if agg.func == "MAX":
            return f"MAX({R}.{c}_max)"
        return f"SUM({R}.{c}_sum) / NULLIF(SUM({R}.{c}_count), 0)"

    def rewrite_key(expr: str) -> str | None:
        e = expr.strip()
        m = _re.fullmatch(
            r"DATE_TRUNC\(\s*'(\w+)'\s*,\s*([A-Za-z_][\w.]*)\s*\)", e, _re.I
        )
        if m:
            r = resolve(m.group(2))
            if r is None or r[0] != fact or r[1] != ts:
                return None
            unit = m.group(1).lower()
            mod = _TRUNC_MODULUS.get(unit)
            if mod is None or mod % bsec != 0:
                return None
            return f"DATE_TRUNC('{unit.upper()}', {R}.bucket_start)"
        m = _re.fullmatch(
            r"CAST\(\s*([A-Za-z_][\w.]*)\s+AS\s+DATE\s*\)", e, _re.I
        )
        if m:
            r = resolve(m.group(1))
            if r is None or r[0] != fact or r[1] != ts:
                return None
            if 86400 % bsec != 0:
                return None
            return f"CAST({R}.bucket_start AS DATE)"
        r = resolve(e)
        if r is None:
            return None
        t, c = r
        if t == fact:
            return f"{R}.{c}" if c in dims else None
        return e  # dim-table column — rides through the join unchanged

    # ---- select list ----
    items, aliases = [], set()
    has_agg, nonagg_keys = False, []
    for it in jq.select_items:
        if it.agg is not None:
            new = rewrite_agg(it.agg)
            has_agg = True
        else:
            new = rewrite_key(it.raw)
            nonagg_keys.append(new)
        if new is None:
            return None
        if it.alias:
            alias_sql = it.alias
        else:
            # Spark names an unaliased (possibly qualified) plain column
            # by its bare name; expressions keep their full text
            rr = resolve(it.raw)
            alias_sql = rr[1] if rr is not None else f"`{it.raw}`"
        items.append(f"{new} AS {alias_sql}")
        if it.alias:
            aliases.add(it.alias)

    # ---- group by ----
    keys = []
    for g in jq.group_by:
        new = rewrite_key(g)
        if new is None:
            return None
        keys.append(new)
    if not has_agg or any(k not in keys for k in nonagg_keys):
        return None

    # ---- having: rewrite its aggregate calls through the same rules,
    # then require every remaining reference to be rollup state (under
    # the fact alias), a fact dim, or a dim-table column ----
    having_sql = None
    if jq.having:
        from approximate_query_engine_spark.sqlparser import Aggregate

        bad = False

        def _agg_repl(m):
            nonlocal bad
            if m.group(2):  # DISTINCT inside a HAVING aggregate
                bad = True
                return m.group(0)
            new = rewrite_agg(
                Aggregate(m.group(1).upper(), m.group(3), False, m.group(0))
            )
            if new is None:
                bad = True
                return m.group(0)
            return f"({new})"

        h = _re.sub(
            r"\b(COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(DISTINCT\s+)?([^()]*)\)",
            _agg_repl,
            jq.having,
            flags=_re.I,
        )
        ids = None if bad else _identifiers(h)
        if ids is None:
            return None
        for i in ids:
            if "." in i:
                q, c = i.split(".", 1)
                if q == R and (c in state_names or c in dims):
                    continue  # rewritten state / fact dim under the alias
            r = resolve(i)
            if r is None or (r[0] == fact and r[1] not in dims):
                return None
        having_sql = h

    # ---- where ----
    conds, prune = [], []
    if jq.where:
        conjs = _split_conjuncts(jq.where)
        if conjs is None:
            return None
        materialized = bool(
            info.get("files_view") and info["files_view"] != info["view"]
        )
        for c in conjs:
            ids = _identifiers(c)
            if ids is None:
                return None
            rs = {i: resolve(i) for i in ids}
            if any(r is None for r in rs.values()):
                return None
            owners = {r[0] for r in rs.values()}
            if not owners or fact not in owners:
                conds.append(c)  # constant or dim-only — passes through
                continue
            if owners != {fact}:
                return None  # mixed fact+dim conjunct
            fact_cols = {r[1] for r in rs.values()}
            if fact_cols <= dims:
                # fact-dim filter: the rollup carries these columns under
                # the same alias, so the conjunct passes through verbatim
                conds.append(c)
                continue
            if fact_cols != {ts}:
                return None
            # strip the fact alias/table qualifier for the bound matcher,
            # then normalize CAST-to-DATE
            sc = _strip_qualifier(c, {fact, fact_alias}).strip()
            sc = _re.sub(
                rf"CAST\(\s*{_re.escape(ts)}\s+AS\s+DATE\s*\)",
                f"DATE_TRUNC('DAY', {ts})",
                sc,
                flags=_re.I,
            )
            tb = _ts_conjunct_bounds(sc, ts, bsec)
            if tb is None:
                return None
            bconds, bprunes = tb
            for bop, iso in bconds:
                conds.append(f"{R}.bucket_start {bop} TIMESTAMP '{iso}'")
            if materialized:
                for pop, pdt in bprunes:
                    prune.append(
                        f"{R}.p_date {pop} '{pdt.strftime('%Y-%m-%d')}'"
                    )

    # ---- order by / limit ----
    order = []
    for o in jq.order_by:
        new = rewrite_key(o.expr)
        if new is None:
            m = _re.fullmatch(
                r"(COUNT|SUM|MIN|MAX|AVG)\s*\((.*)\)", o.expr.strip(), _re.I
            )
            if m:
                from approximate_query_engine_spark.sqlparser import Aggregate

                new = rewrite_agg(
                    Aggregate(m.group(1).upper(), m.group(2), False, o.expr)
                )
        if new is None:
            if o.expr in aliases:
                order.append(o.render())
                continue
            return None
        order.append(f"{new} DESC" if o.desc else new)

    from_body = jq.from_with_replacement(
        fact, info.get("files_view") or info["view"]
    )
    sql = "SELECT " + ", ".join(items) + f" FROM {from_body}"
    allconds = conds + prune
    if allconds:
        sql += " WHERE " + " AND ".join(allconds)
    if keys:
        sql += " GROUP BY " + ", ".join(keys)
    if having_sql:
        sql += f" HAVING {having_sql}"
    if order:
        sql += " ORDER BY " + ", ".join(order)
    if jq.limit is not None:
        sql += f" LIMIT {jq.limit}"
    if used_approx:
        import math

        parts = []
        hll_used = sorted({a for a in used_approx if a in distinct_set})
        theta_used = sorted(
            {a for a in used_approx if a in theta_set and a not in distinct_set}
        )
        if hll_used:
            err = 1.04 / math.sqrt(2 ** int(info.get("hll_lgk", 12)))
            parts.append(
                f"COUNT(DISTINCT {', '.join(hll_used)}) from merged HLL "
                f"sketch state, rel err ≈ {err:.1%}"
            )
        if theta_used:
            terr = 1.0 / math.sqrt(2 ** int(info.get("theta_lgk", 12)))
            parts.append(
                f"COUNT(DISTINCT {', '.join(theta_used)}) from merged "
                f"theta sketch state, rel err ≈ {terr:.1%}"
            )
        note = (
            f"star join answered from materialized rollup {info['view']} "
            f"(bucket {info['bucket']}; fact scan replaced by partial-agg "
            f"state; {'; '.join(parts)}; other aggregates exact)"
        )
    else:
        note = (
            f"star join answered from materialized rollup {info['view']} "
            f"(bucket {info['bucket']}; fact scan replaced by partial-agg "
            "state — exact, dims broadcast as before)"
        )
    return sql, note, bool(used_approx)


def _partial_state(df: DataFrame, spec: RollupSpec) -> DataFrame:
    """Per-(bucket, dims) partial-agg state of ``df`` in the rollup's
    column layout, plus the storage ``p_date`` column."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in spec.measures:
        aggs += [
            F.count(m).alias(f"{m}_count"),
            F.sum(m).alias(f"{m}_sum"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    for dc in spec.distinct_cols:
        aggs.append(F.hll_sketch_agg(dc, spec.hll_lgk).alias(f"{dc}_hll"))
    for qc in spec.quantile_cols:
        aggs.append(
            F.expr(
                f"kll_sketch_agg_double(CAST(`{qc}` AS DOUBLE), "
                f"{int(spec.kll_k)})"
            ).alias(f"{qc}_kll")
        )
    for tc in spec.topk_cols:
        aggs.append(
            F.expr(
                f"approx_top_k_accumulate(`{tc}`, "
                f"{int(spec.topk_budget)})"
            ).alias(f"{tc}_topk")
        )
    for sc in spec.theta_cols:
        aggs.append(
            F.expr(
                f"theta_sketch_agg({theta_key_sql(sc, spec.theta_key_native)}, "
                f"{int(spec.theta_lgk)})"
            ).alias(f"{sc}_theta")
        )
    # Round 14 (guide §1.2 per-task work): for fixed-width buckets the
    # tumbling-window start is plain epoch arithmetic —
    # ts − pmod(unix_micros(ts), width) — exactly TimeWindow's own start
    # formula (origin 0, floor semantics for pre-epoch values via pmod),
    # without materializing the (start, end) struct per row that
    # F.window builds (measured ~0.6 s/20M rows). Value-identity with
    # F.window(...).start is pinned in tests/test_rollup.py; variable
    # width buckets (months) keep F.window.
    bsec = bucket_seconds(spec.bucket)
    if bsec is not None:
        w_us = int(bsec) * 1_000_000
        us = F.unix_micros(F.col(spec.time_col))
        bucket_start = F.timestamp_micros(us - F.pmod(us, F.lit(w_us)))
    else:  # pragma: no cover - month-width buckets are refused upstream
        bucket_start = F.window(F.col(spec.time_col), spec.bucket)["start"]
    # NULL timestamps must be dropped on BOTH paths: Spark's TimeWindowing
    # rule injects IsNotNull(ts) under F.window, so the arithmetic path
    # needs the same explicit filter or a NULL-ts source grows a NULL
    # bucket_start group (and a __HIVE_DEFAULT_PARTITION__ p_date
    # directory) that refresh_rollup_buckets — which still filters via
    # F.window — could never repair.
    return (
        df.where(F.col(spec.time_col).isNotNull())
        .groupBy(bucket_start.alias("w"), *spec.dims)
        .agg(*aggs)
        .select(
            F.col("w").alias("bucket_start"),
            *spec.dims,
            "n_rows",
            *[
                f"{m}_{s}"
                for m in spec.measures
                for s in ("count", "sum", "min", "max")
            ],
            *[f"{dc}_hll" for dc in spec.distinct_cols],
            *[f"{qc}_kll" for qc in spec.quantile_cols],
            *[f"{tc}_topk" for tc in spec.topk_cols],
            *[f"{sc}_theta" for sc in spec.theta_cols],
        )
        .withColumn(_PDATE, F.date_format("bucket_start", "yyyy-MM-dd"))
    )


#: name of the per-date-directory batch marker: records the highest
#: batch_id merged into that directory.  It travels INSIDE the staged
#: directory, so the directory rename that publishes the data publishes
#: the marker in the same atomic step — there is no window in which the
#: data is committed but the idempotency state is not (the flaw of a
#: separate meta file written after the commit).  Underscore-prefixed, so
#: Spark's parquet listing never sees it.
_BATCH_MARKER = "_merged_batch.json"
_STAGING = "_staging"


def _read_marker(date_dir: str) -> int:
    import json as _json
    import os as _os

    try:
        with open(_os.path.join(date_dir, _BATCH_MARKER)) as f:
            return int(_json.load(f).get("last_batch_id", -1))
    except (OSError, ValueError):
        return -1


def _staging_state(path: str) -> tuple[str, int | None]:
    """(staging_dir, staged_batch_id) — batch_id is None unless the
    staging directory holds a COMPLETE staged merge (its ``_batch.json``
    is written last, after every parquet file and marker)."""
    import json as _json
    import os as _os

    staging = _os.path.join(path, _STAGING)
    try:
        with open(_os.path.join(staging, "_batch.json")) as f:
            return staging, int(_json.load(f)["batch_id"])
    except (OSError, ValueError, KeyError):
        return staging, None


def _publish_staging(path: str) -> list[str]:
    """Move every staged date directory into the live layout (delete the
    old directory, rename the staged one in) and remove the staging dir.
    Resumable: a re-run after a crash at ANY point simply moves whatever
    is still staged — a date dir whose rename already happened is gone
    from staging and is skipped."""
    import os as _os
    import shutil as _shutil

    staging = _os.path.join(path, _STAGING)
    moved = []
    for name in sorted(_os.listdir(staging)):
        if not name.startswith(f"{_PDATE}="):
            continue
        target = _os.path.join(path, name)
        if _os.path.exists(target):
            _shutil.rmtree(target)
        _os.rename(_os.path.join(staging, name), target)
        moved.append(name.split("=", 1)[1])
    _shutil.rmtree(staging, ignore_errors=True)
    return moved


def merge_rollup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    spec: RollupSpec,
    path: str,
    batch_id: int | None = None,
) -> dict:
    """MERGE one batch of raw rows into a materialized rollup layout:
    aggregate the batch to partial state, union it with the EXISTING
    state of only the affected date directories, re-aggregate (counts and
    sums add, mins/maxes combine — the state is mergeable by
    construction, so late data is handled exactly, no watermark needed
    for correctness), and swap those directories in. Untouched history is
    never read or written — at 100 TB a micro-batch costs its own dates,
    not the table.

    ``batch_id`` makes the merge EFFECTIVELY-ONCE for at-least-once
    callers (foreachBatch re-runs a batch after a crash) via a
    staged-swap protocol with no unprotected window:

    1. the merged state of the affected dates is written to a staging
       directory, each date dir carrying a ``_merged_batch.json`` marker
       with this batch_id; a ``_batch.json`` manifest is written LAST, so
       its presence proves the staged merge is complete;
    2. each staged date dir is renamed into the live layout — data and
       marker publish in the same atomic rename;
    3. staging is removed.

    A replay of batch ``B`` is classified from durable state alone:
    a complete staging manifest for ``B`` → the merge was computed from
    pre-swap data, so just finish the swap (covers a crash anywhere in
    step 2, including between a delete and its rename); no staging and
    every affected live date dir carries a marker ≥ ``B`` → already
    merged, skip; otherwise → fresh merge (an INCOMPLETE staging dir is
    discarded — the live layout is untouched until the manifest exists).
    Single-writer contract — two concurrent mergers could interleave
    read-modify-write. Marker/staging I/O is local-file; on a shared
    filesystem swap for the Hadoop FS API calls compact_partition_layout
    demonstrates (HDFS/ABFS renames are atomic; on S3 use a committer)."""
    import json as _json
    import os as _os
    import shutil as _shutil

    exists = _os.path.exists(path) and any(
        n.startswith(f"{_PDATE}=") for n in _os.listdir(path)
    )
    if _os.path.exists(path):
        staging, staged_id = _staging_state(path)
        if staged_id is not None:
            # a COMPLETE staged merge (manifest present) from any batch
            # whose swap crashed: its data was computed from pre-swap
            # state, so finishing the swap is always exact — publish
            # first, then classify the incoming batch against markers
            dates = _publish_staging(path)
            if batch_id is not None and staged_id == batch_id:
                spark.catalog.refreshByPath(path)
                final = spark.read.parquet(path).drop(_PDATE)
                final.createOrReplaceTempView(spec.rollup_name)
                return {
                    "merged": True,
                    "affected_dates": dates,
                    "recovered": True,
                }
            exists = exists or bool(dates)
        elif _os.path.exists(staging):
            # incomplete staging (no manifest): the live layout was never
            # touched — discard and recompute
            _shutil.rmtree(staging, ignore_errors=True)
    rolled = _partial_state(batch_df, spec).cache()
    affected = [
        r[_PDATE] for r in rolled.select(_PDATE).distinct().collect()
    ]
    if (
        batch_id is not None
        and exists
        and affected
        and all(
            _read_marker(_os.path.join(path, f"{_PDATE}={d}")) >= batch_id
            for d in affected
        )
    ):
        rolled.unpersist()
        return {"merged": False, "reason": "batch already merged"}
    if not exists:
        merged = rolled
    else:
        existing = spark.read.parquet(path).filter(
            F.col(_PDATE).isin(affected)
        )
        merge_aggs = [F.sum("n_rows").alias("n_rows")]
        for m in spec.measures:
            merge_aggs += [
                F.sum(f"{m}_count").alias(f"{m}_count"),
                F.sum(f"{m}_sum").alias(f"{m}_sum"),
                F.min(f"{m}_min").alias(f"{m}_min"),
                F.max(f"{m}_max").alias(f"{m}_max"),
            ]
        for dc in spec.distinct_cols:
            merge_aggs.append(F.hll_union_agg(f"{dc}_hll").alias(f"{dc}_hll"))
        for qc in spec.quantile_cols:
            merge_aggs.append(
                F.expr(
                    f"kll_merge_agg_double(`{qc}_kll`, {int(spec.kll_k)})"
                ).alias(f"{qc}_kll")
            )
        for tc in spec.topk_cols:
            merge_aggs.append(
                F.expr(
                    f"approx_top_k_combine(`{tc}_topk`, "
                    f"{int(spec.topk_budget)})"
                ).alias(f"{tc}_topk")
            )
        for sc in spec.theta_cols:
            merge_aggs.append(
                F.expr(
                    f"theta_union_agg(`{sc}_theta`, {int(spec.theta_lgk)})"
                ).alias(f"{sc}_theta")
            )
        merged = (
            existing.unionByName(rolled)
            .groupBy("bucket_start", *spec.dims, _PDATE)
            .agg(*merge_aggs)
        )
    # a swapped date dir REPLACES the old one, so its marker must carry
    # the old high-water mark forward even for untracked (batch_id=None)
    # merges — otherwise a later replay of an already-merged batch would
    # no longer classify as merged
    old_markers = {
        d: _read_marker(_os.path.join(path, f"{_PDATE}={d}"))
        for d in affected
    }
    staging = _os.path.join(path, _STAGING)
    merged.write.mode("overwrite").partitionBy(_PDATE).parquet(staging)
    rolled.unpersist()
    for d in affected:
        val = max(
            old_markers.get(d, -1),
            batch_id if batch_id is not None else -1,
        )
        if val >= 0:
            with open(
                _os.path.join(staging, f"{_PDATE}={d}", _BATCH_MARKER), "w"
            ) as f:
                _json.dump({"last_batch_id": int(val)}, f)
    # manifest LAST: staging is recoverable only once it is complete.
    # Untracked merges write batch_id -1 — their staged swap is just as
    # safe to finish after a crash, they only skip replay detection.
    tmp = _os.path.join(staging, "_batch.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(
            {"batch_id": int(batch_id) if batch_id is not None else -1}, f
        )
    _os.replace(tmp, _os.path.join(staging, "_batch.json"))
    _publish_staging(path)
    spark.catalog.refreshByPath(path)
    final = spark.read.parquet(path).drop(_PDATE)
    final.createOrReplaceTempView(spec.rollup_name)
    return {"merged": True, "affected_dates": affected}


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
    # the tmp spec must carry EVERY state-defining field of the original —
    # dropping distinct_cols/hll_lgk here once rewrote refreshed date
    # directories without their {col}_hll sketch columns, leaving the
    # layout with mixed schemas and corrupting routed COUNT(DISTINCT).
    # dataclasses.replace copies every field (present and future) so a
    # new sketch-column kind can never be silently dropped here again.
    from dataclasses import replace as _dc_replace

    tmp_spec = _dc_replace(spec, source_table=spec.source_table + "__late")
    fresh = materialize_rollup(spark, tmp_spec, path=None).withColumn(
        _PDATE, F.date_format("bucket_start", "yyyy-MM-dd")
    )
    old_markers = _snapshot_markers(path)
    # writer-level option: per-write dynamic overwrite, no global conf
    # juggling (and no race with concurrent writers on the same session)
    (
        fresh.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(_PDATE)
        .parquet(path)
    )
    _restore_markers(path, old_markers)
    final = spark.read.parquet(path).drop(_PDATE)
    final.createOrReplaceTempView(spec.rollup_name)
    return final


def refresh_rollup_buckets_from_state(
    spark: SparkSession,
    fine: RollupSpec,
    coarse: RollupSpec,
    path: str,
    since_bucket,
) -> DataFrame:
    """Hierarchical tail refresh: recompute the coarse rollup's date
    directories from ``since_bucket`` by re-aggregating the (already
    refreshed) FINE rollup's state instead of the raw table — the
    maintenance pattern of a grain hierarchy: hour refreshes from raw
    (one day's scan), day refreshes from hour (a state scan). Same
    dynamic-partition-overwrite contract as :func:`refresh_rollup_buckets`
    (the recompute boundary snaps to the coarse bucket's date partition;
    append-mostly data). The caller is responsible for the fine rollup
    being FRESH — engine.refresh_rollup gates on its built_row_count."""
    since_date = str(since_bucket)[:10]
    src = spark.table(fine.rollup_name).filter(
        F.date_format(
            F.window(F.col("bucket_start"), coarse.bucket)["start"],
            "yyyy-MM-dd",
        )
        >= F.lit(since_date)
    )
    fresh = derive_rollup_state(spark, fine, coarse, src=src)
    old_markers = _snapshot_markers(path)
    (
        fresh.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(_PDATE)
        .parquet(path)
    )
    _restore_markers(path, old_markers)
    final = spark.read.parquet(path).drop(_PDATE)
    final.createOrReplaceTempView(coarse.rollup_name)
    return final


def _snapshot_markers(path: str) -> dict[str, int]:
    """Per-date streaming batch markers of a layout (empty when none).
    A dynamic-partition overwrite REPLACES date directories and would
    silently drop them — and a marker-less directory makes a later batch
    replay re-merge rows the refresh already recomputed from source."""
    import os as _os

    out: dict[str, int] = {}
    try:
        names = _os.listdir(path)
    except OSError:
        return out
    for name in names:
        if not name.startswith(f"{_PDATE}="):
            continue
        val = _read_marker(_os.path.join(path, name))
        if val >= 0:
            out[name] = val
    return out


def _restore_markers(path: str, old: dict[str, int]) -> None:
    """Re-write snapshot markers into (possibly rewritten) date dirs.
    The refresh recomputed those dates from SOURCE, which already
    contains every previously-merged batch's rows — so the old
    high-water mark remains the correct replay gate."""
    import json as _json
    import os as _os

    for name, val in old.items():
        target = _os.path.join(path, name)
        if not _os.path.isdir(target):
            continue  # date disappeared from the layout — nothing to gate
        with open(_os.path.join(target, _BATCH_MARKER), "w") as f:
            _json.dump({"last_batch_id": int(val)}, f)


def infer_rollup_shape(parsed) -> dict | None:
    """The rollup spec a query WOULD route to, inferred from its shape —
    or None when no rollup could ever serve it. This is the advisor's
    front half (engine.recommend_rollups): every time a rollup-shaped
    aggregate runs WITHOUT a rollup, its inferred shape is recorded, and
    recurring shapes merge into a concrete create_rollup suggestion.

    Mirrors rewrite_to_rollup's grammar WITHOUT an info dict: aggregates
    must be COUNT(*)/COUNT/SUM/MIN/MAX/AVG over plain columns (→
    measures), COUNT(DISTINCT col) (→ distinct_cols), or
    MEDIAN/PERCENTILE (→ quantile_cols); group keys are plain columns (→
    dims) or DATE_TRUNC/CAST-to-DATE of one time column (→ bucket
    grain); WHERE conjuncts either filter plain columns (→ dims — a
    routed filter column must be a dimension) or bound the time column.
    Anything else returns None — better no advice than wrong advice."""
    scopes = {parsed.table}
    if parsed.table_alias:
        scopes.add(parsed.table_alias)

    def strip(e: str) -> str:
        return _strip_qualifier(e, scopes).strip()

    ident = _re.compile(r"[A-Za-z_]\w*$")
    dims: set[str] = set()
    measures: set[str] = set()
    distinct_cols: set[str] = set()
    quantile_cols: set[str] = set()
    time_col: str | None = None
    unit: str | None = None
    time_bounded = False

    def note_time(col: str, u: str | None) -> bool:
        nonlocal time_col, unit
        if time_col is not None and time_col != col:
            return False  # two different time columns — not a rollup shape
        time_col = col
        if u is not None:
            order = ["minute", "hour", "day", "week", "month",
                     "quarter", "year"]
            if unit is None or (
                u in order and unit in order
                and order.index(u) < order.index(unit)
            ):
                unit = u
        return True

    has_agg = False
    for it in parsed.select_items:
        if it.agg is None:
            continue  # non-agg items must be group keys; handled below
        agg = it.agg
        has_agg = True
        if agg.is_quantile:
            try:
                vexpr, _p = agg.quantile_args()
            except Exception:  # noqa: BLE001
                return None
            c = strip(vexpr)
            if not ident.fullmatch(c):
                return None
            quantile_cols.add(c)
            continue
        if agg.distinct:
            c = strip(agg.arg)
            if agg.func != "COUNT" or not ident.fullmatch(c):
                return None
            distinct_cols.add(c)
            continue
        if agg.func not in ("COUNT", "SUM", "MIN", "MAX", "AVG"):
            return None
        if agg.func == "COUNT" and (agg.is_star or agg.arg.strip() == "1"):
            continue
        c = strip(agg.arg)
        if not ident.fullmatch(c):
            return None
        measures.add(c)
    if not has_agg:
        return None

    for g in parsed.group_by:
        e = strip(g)
        m = _re.fullmatch(
            r"DATE_TRUNC\(\s*'(\w+)'\s*,\s*([A-Za-z_]\w*)\s*\)", e, _re.I
        )
        if m:
            if not note_time(m.group(2), m.group(1).lower()):
                return None
            continue
        m = _re.fullmatch(r"CAST\(\s*([A-Za-z_]\w*)\s+AS\s+DATE\s*\)", e, _re.I)
        if m:
            if not note_time(m.group(1), "day"):
                return None
            continue
        if ident.fullmatch(e):
            dims.add(e)
            continue
        return None

    if parsed.where:
        where = _desugar_between(parsed.where) or parsed.where
        conjs = _split_conjuncts(where)
        if conjs is None:
            return None
        for c in conjs:
            sc = strip(c)
            sc_n = _re.sub(
                r"CAST\(\s*([A-Za-z_]\w*)\s+AS\s+DATE\s*\)",
                r"DATE_TRUNC('DAY', \1)",
                sc,
                flags=_re.I,
            )
            m = _re.match(
                r"\s*(?:DATE_TRUNC\(\s*'\w+'\s*,\s*)?([A-Za-z_]\w*)\s*\)?\s*"
                r"(>=|<=|<|>|=)\s*(?:DATE|TIMESTAMP)\s*'",
                sc_n,
                _re.I,
            )
            if m:
                if not note_time(m.group(1), None):
                    return None
                time_bounded = True
                continue
            ids = _identifiers(sc)
            if ids is None:
                return None
            bare = {strip(i) for i in ids}
            if bare and all(ident.fullmatch(b) for b in bare):
                dims |= bare  # filter columns must be dims to route
                continue
            return None

    if time_col is None:
        return None  # nothing time-series about it — not rollup territory
    if not time_bounded and unit is None:
        return None
    bucket = {
        "minute": "1 minute",
        "hour": "1 hour",
    }.get(unit or "hour", "1 day")
    # the time column can't also be a dim/measure (grouping on raw ts
    # would make every bucket row its own group — not a rollup shape)
    if time_col in dims | measures | distinct_cols | quantile_cols:
        return None
    return {
        "table": parsed.table,
        "time_col": time_col,
        "bucket": bucket,
        "dims": sorted(dims),
        "measures": sorted(measures),
        "distinct_cols": sorted(distinct_cols),
        "quantile_cols": sorted(quantile_cols),
        # the canonical TOP-ITEMS marker: when the query is
        # `GROUP BY <col> ... ORDER BY COUNT(*) DESC LIMIT k`, <col> is
        # recorded here AS WELL AS in dims — the advisor's back half
        # (engine.recommend_rollups) decides from catalog ndv whether
        # to advise it as a dim (re-aggregates exactly) or as
        # frequent-items sketch state (the only viable pre-aggregation
        # when the column is too high-cardinality to be a dim,
        # rewrite_topk_to_rollup's docstring)
        "topk_candidates": _topk_candidate(parsed, dims, measures,
                                           distinct_cols, quantile_cols,
                                           strip),
    }


def _topk_candidate(
    parsed, dims, measures, distinct_cols, quantile_cols, strip
) -> list[str]:
    """``[col]`` when the query is the canonical top-items dashboard
    shape :func:`rewrite_topk_to_rollup` serves — exactly one plain
    group key, select = key + one COUNT(*), ORDER BY leading with that
    count DESC (optional secondary ASC on the key), LIMIT present, no
    HAVING — else ``[]``. Mirrors the rewrite's grammar so recorded
    advice only ever describes a shape the router could actually
    serve."""
    if (
        not parsed.limit
        or parsed.limit <= 0
        or parsed.having
        or measures
        or distinct_cols
        or quantile_cols
        or len(parsed.group_by) != 1
        or len(parsed.select_items) != 2
        or not parsed.order_by
        or len(parsed.order_by) > 2
    ):
        return []
    col = strip(parsed.group_by[0])
    if col not in dims:
        return []  # group key was a time bucket, not a plain column
    cnt_alias = None
    for it in parsed.select_items:
        if it.agg is not None:
            if it.agg.distinct or it.agg.func != "COUNT":
                return []
            if not (it.agg.is_star or it.agg.arg.strip() == "1"):
                return []
            cnt_alias = it.alias
        elif strip(it.raw) != col:
            return []
    lead = parsed.order_by[0]
    lead_e = strip(lead.expr)
    is_cnt = (cnt_alias is not None and lead_e == cnt_alias) or bool(
        _re.fullmatch(r"COUNT\s*\(\s*(\*|1)\s*\)", lead_e, _re.I)
    )
    if not (lead.desc and is_cnt):
        return []
    if len(parsed.order_by) == 2:
        sec = parsed.order_by[1]
        if sec.desc or strip(sec.expr) != col:
            return []
    return [col]
