"""The single rewrite point: parsed query + strategy → executable Spark SQL
with expression-level scaling and companion confidence-interval columns.

This fixes the reference's two documented semantic hazards (SURVEY.md §2.7):

- **double scaling** — the reference rewrites SQL in the ML layer, then the
  planner re-detects the sample table by name and the executor scales
  results, then app.py scales again (reference ml_optimizer.py:227-232,
  planner.py:40-50, executor.py:52-57, app.py:141-143 → ×(1/f)² results).
  Here scaling happens exactly once, inside the generated aggregate
  expressions; nothing downstream ever mutates result cells.
- **keyword-heuristic scaling** — the reference multiplies result columns
  whose *name* contains COUNT/SUM/TOTAL/REVENUE/ORDERS
  (reference executor.py:65-84). Here scaling keys on the aggregate
  function: COUNT and SUM scale by the inverse inclusion probability;
  AVG is a ratio estimator (unscaled); MIN/MAX are never scaled.

Estimators (Horvitz–Thompson under Bernoulli sampling with per-row
inclusion probability f_i; uniform sampling is the constant-f special case):

- COUNT  →  Σ_{i∈s} 1/f_i            SE = sqrt(Σ (1-f_i)/f_i²)
- SUM(x) →  Σ_{i∈s} x_i/f_i          SE = sqrt(Σ x_i²(1-f_i)/f_i²)
- AVG(x) →  Σ x_i/f_i / Σ 1/f_i      SE ≈ stddev_samp(x)/√n  (ratio approx)

CIs are normal-approximation at 95% (z=1.96), emitted PER GROUP as
``{col}_ci_low/_ci_high/_rel_error`` companion columns — the reference
computes a statistically wrong across-groups CI attached to the first row
only (reference executor.py:87-114; SURVEY.md flags this); per-group CIs
are the declared capability done right.

All expressions are plain Spark SQL — JVM-evaluated, whole-stage-codegen'd,
partially aggregated map-side. No Python runs per row, so the rewrite adds
no scale penalty at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from approximate_query_engine_spark.catalog import SampleInfo
from approximate_query_engine_spark.sqlparser import (
    Aggregate,
    OrderItem,
    ParsedQuery,
)

Z_95 = 1.96


class UnsupportedRewriteError(ValueError):
    """The query cannot be safely approximated; caller must run exact."""


@dataclass
class RewriteResult:
    sql: str
    plan_type: str  # exact | sample | stratified | sketch
    sample_table: str | None = None
    sample_fraction: float | None = None
    transformations: list[str] = field(default_factory=list)
    ci_columns: list[str] = field(default_factory=list)


def _bt(name: str) -> str:
    """Backtick-quote an output alias for Spark SQL."""
    return "`" + name.replace("`", "``") + "`"


def _sql_str(val: str) -> str:
    return "'" + val.replace("'", "''") + "'"


#: catalog marker for a NULL-valued stratum (see sampler.stringify_stratum)
NULL_STRATUM = "__NULL__"


def _weight_case_expr(col: str, strata: list, overall_fraction: float) -> str:
    """Per-row inclusion-probability expression for a stratified sample:
    CASE on the stratum value → achieved per-stratum fraction. Strata
    counts are small (they were enumerable at allocation time), so an
    inline CASE stays in codegen and needs no join.

    Stratum values were recorded with ``sampler.stringify_stratum``, which
    matches Spark's CAST(x AS STRING) rendering (booleans lowercase, NULL as
    a marker) — a plain Python str() would silently mismatch and hand every
    row the ELSE fraction."""
    whens = []
    for s in strata:
        if s.fraction and s.fraction > 0:
            if getattr(s, "is_null", False):
                cond = f"{col} IS NULL"
            else:
                cond = f"CAST({col} AS STRING) = {_sql_str(s.strata_value)}"
            whens.append(f"WHEN {cond} THEN CAST({s.fraction!r} AS DOUBLE)")
    else_f = f"CAST({overall_fraction!r} AS DOUBLE)"
    if not whens:  # every stratum empty/zero: constant overall fraction
        return f"({else_f})"
    return "(CASE " + " ".join(whens) + f" ELSE {else_f} END)"


def quantile_ci_levels(p: float, n_est: float) -> tuple[float, float] | None:
    """The binomial rank band in quantile-level space: (p−δ, p+δ) with
    δ = z·√(p(1−p)/n), clamped to [0, 1]. Exposed at module level so a
    value-parity oracle can reproduce the exact literals the rewrite
    emits (same IEEE ops, same order)."""
    import math as _math

    if p <= 0.0 or p >= 1.0:
        return None  # extremes degenerate to MIN/MAX: no CI
    half = Z_95 * _math.sqrt(p * (1.0 - p) / n_est)
    return max(0.0, p - half), min(1.0, p + half)


class _AggScaler:
    """Builds scaled select expressions + CI companions for one query."""

    def __init__(
        self,
        f_expr: str,
        uniform: bool = True,
        n_sample_est: float | None = None,
    ):
        # f_expr: SQL expression for the row's inclusion probability.
        # uniform: True when f is one constant for every row (uniform /
        # inline / systematic designs) — required for quantile rewrites.
        # n_sample_est: planning-time estimate of the sample row count,
        # used only to size quantile order-statistic CIs.
        self.f = f_expr
        self.uniform = uniform
        self.n_sample_est = n_sample_est

    def scaled(self, agg: Aggregate) -> str:
        f = self.f
        if agg.is_quantile:
            # Quantiles are invariant under uniform subsampling: the p-th
            # sample quantile estimates the p-th population quantile with
            # NO weight scaling. Under per-row weights (stratified / PPS)
            # the invariance breaks, but Spark's 3-arg PERCENTILE takes a
            # per-row integral FREQUENCY: the Horvitz–Thompson weight 1/f
            # scaled by 1e6 and rounded reproduces the weighted quantile
            # (frequency-relative error < 1e-6 — far below any sampling
            # noise). That is the textbook weighted sample quantile, a
            # consistent estimator under stratified and PPS designs.
            if not self.uniform:
                col, p = agg.quantile_args()
                freq = f"CAST(ROUND(1000000.0 / {f}) AS BIGINT)"
                return f"PERCENTILE({col}, {p!r}, {freq})"
            return agg.raw
        if agg.distinct:
            # No DISTINCT aggregate is scalable on a sample: COUNT(DISTINCT)
            # routes to the sketch path, SUM/AVG(DISTINCT) have no unbiased
            # sample estimator — callers must fall back to exact.
            raise UnsupportedRewriteError(
                f"{agg.func}(DISTINCT ...) is not approximable by sampling"
            )
        if agg.func == "COUNT":
            base = "1.0" if agg.is_star else f"CASE WHEN ({agg.arg}) IS NOT NULL THEN 1.0 END"
            # COALESCE: a sample keeping zero rows makes SUM NULL, but exact
            # COUNT of an empty input is 0, not NULL.
            return f"CAST(ROUND(COALESCE(SUM({base} / {f}), 0.0)) AS BIGINT)"
        if agg.func == "SUM":
            return f"SUM(CAST(({agg.arg}) AS DOUBLE) / {f})"
        if agg.func == "AVG":
            # ratio estimator: weighted sum / weighted count
            return (
                f"SUM(CAST(({agg.arg}) AS DOUBLE) / {f}) / "
                f"SUM(CASE WHEN ({agg.arg}) IS NOT NULL THEN 1.0 END / {f})"
            )
        # MIN/MAX: not scalable; computed on the sample as-is (documented
        # bias — the reference contract marks them "Not Optimized").
        return agg.raw

    def quantile_with_ci(self, agg: Aggregate) -> tuple[str, str, str] | None:
        """Estimate + order-statistic CI for a quantile, as three
        subscripts of ONE array-percentile call: the rank of the p-th
        sample quantile is Binomial(n, p), so the 95% band in rank space
        is n·p ± z·√(n·p(1−p)); mapped back through the sample quantile
        function that is the pair (Q(p−δ), Q(p+δ)) with
        δ = z·√(p(1−p)/n). n is the planning-time sample-size estimate
        (consistent with the engine's planning-time 1/√(f·N) error
        philosophy — quantile levels must be literals in the query).

        All three levels ride ``PERCENTILE(col, array(p, p_lo, p_hi))``:
        Spark canonicalizes identical aggregate calls to ONE buffer, so
        the estimate and both bounds share a single value-count map
        instead of three (measured 1.35 s → 0.58 s on a 300k-row sample
        at 30M-row big-tier scale; array subscripts are bit-identical to
        the scalar form). Uniform designs only: the binomial rank band
        assumes equal inclusion probabilities, so weighted quantiles
        return their estimate without a CI."""
        if not self.uniform:
            return None
        n = self.n_sample_est
        if n is None or n <= 1:
            return None
        col, p = agg.quantile_args()
        levels = quantile_ci_levels(p, n)
        if levels is None:
            return None
        p_lo, p_hi = levels
        arr = f"PERCENTILE({col}, array({p!r}, {p_lo!r}, {p_hi!r}))"
        return (f"{arr}[0]", f"{arr}[1]", f"{arr}[2]")

    def se_expr(self, agg: Aggregate) -> str | None:
        f = self.f
        if agg.func == "COUNT":
            return f"SQRT(SUM((1.0 - {f}) / ({f} * {f})))"
        if agg.func == "SUM":
            x = f"CAST(({agg.arg}) AS DOUBLE)"
            return f"SQRT(SUM({x} * {x} * (1.0 - {f}) / ({f} * {f})))"
        if agg.func == "AVG":
            # Taylor-linearized variance of the ratio estimator
            # Ŷ = Σ(y/f)/Σ(1/f) under Poisson/Bernoulli designs
            # (Särndal-Swensson-Wretman §5.5): Var ≈ Σ w²·(y−Ŷ)² / N̂²
            # with w² = (1−f)/f². Expanded to plain single-pass aggregates
            # A−2ŶB+Ŷ²C so no second pass is needed. Because f is the
            # PER-ROW inclusion probability, this is design-correct for
            # stratified and PPS samples too (per-stratum f_h flows
            # through), unlike the SRS-only s/√n it replaces.
            x = f"CAST(({agg.arg}) AS DOUBLE)"
            w2 = f"((1.0 - {f}) / ({f} * {f}))"
            a = f"SUM({w2} * {x} * {x})"
            b = f"SUM({w2} * {x})"
            c = f"SUM({w2} * (CASE WHEN ({agg.arg}) IS NOT NULL THEN 1.0 END))"
            nhat = f"SUM(CASE WHEN ({agg.arg}) IS NOT NULL THEN 1.0 END / {f})"
            yhat = self.scaled(agg)
            return (
                f"SQRT(GREATEST(({a}) - 2.0 * ({yhat}) * ({b}) "
                f"+ ({yhat}) * ({yhat}) * ({c}), 0.0)) / NULLIF({nhat}, 0.0)"
            )
        return None


import re as _re

#: an alias-qualified column reference like ``o.o_orderstatus``: emitted
#: WITHOUT a synthetic alias so its output name stays the bare column
#: (what the exact query produces) instead of a dotted identifier
_QUALIFIED_COL_RE = _re.compile(
    r"^[A-Za-z_][A-Za-z0-9_]*\.[A-Za-z_][A-Za-z0-9_]*$"
)


def _passthrough_item(raw: str, name: str) -> str:
    if _QUALIFIED_COL_RE.match(raw.strip()):
        return raw
    return f"{raw} AS {_bt(name)}"


_AGG_CALL_RE = _re.compile(
    r"\b(COUNT|SUM|AVG|MIN|MAX|MEDIAN|PERCENTILE)\s*\(", _re.IGNORECASE
)


def _literal_mask(text: str) -> list[bool]:
    """mask[i] is True when text[i] sits inside a quoted SQL literal
    (single-quoted with '' escapes, or double-quoted identifier)."""
    mask = [False] * len(text)
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in ("'", '"'):
            quote = c
            mask[i] = True
            j = i + 1
            while j < n:
                mask[j] = True
                if text[j] == quote:
                    if quote == "'" and j + 1 < n and text[j + 1] == "'":
                        mask[j + 1] = True
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
        else:
            i += 1
    return mask


def _scale_aggs_in_expr(text: str, scaler: "_AggScaler") -> str:
    """Replace every aggregate call in ``text`` with its scaled form
    (MIN/MAX pass through; DISTINCT aggs raise UnsupportedRewriteError).
    Balanced-paren scan, case-insensitive, quote-aware: matches and parens
    inside string literals are ignored."""
    mask = _literal_mask(text)
    out: list[str] = []
    i = 0
    while True:
        m = _AGG_CALL_RE.search(text, i)
        while m and mask[m.start()]:
            m = _AGG_CALL_RE.search(text, m.end())
        if not m:
            out.append(text[i:])
            break
        out.append(text[i : m.start()])
        depth, j = 0, m.end() - 1  # j at '('
        while j < len(text):
            if not mask[j]:
                if text[j] == "(":
                    depth += 1
                elif text[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
            j += 1
        if depth != 0:
            out.append(text[m.start() :])
            break
        call = text[m.start() : j + 1]
        inner = text[m.end() : j].strip()
        dm = _re.match(r"^DISTINCT\s+(.*)$", inner, _re.IGNORECASE | _re.DOTALL)
        agg = Aggregate(
            func=m.group(1).upper(),
            arg=dm.group(1) if dm else inner,
            distinct=bool(dm),
            raw=call,
        )
        # MIN/MAX pass through (computed on the sample as-is, documented
        # bias). Quantiles pass through under uniform designs (sampling
        # invariance) and take the weighted-frequency form under per-row
        # weights — scaled() produces the right expression either way.
        out.append(
            call
            if agg.func in ("MIN", "MAX")
            or (agg.func in ("MEDIAN", "PERCENTILE") and scaler.uniform)
            else f"({scaler.scaled(agg)})"
        )
        i = j + 1
    return "".join(out)


def rewrite_exact(parsed: ParsedQuery | None, sql: str) -> RewriteResult:
    return RewriteResult(sql=sql, plan_type="exact")


def rewrite_sketch(parsed: ParsedQuery, rsd: float) -> RewriteResult:
    """COUNT(DISTINCT col) → approx_count_distinct(col, rsd): Spark's native
    HLL++ — partially aggregable, no exact-distinct shuffle. This makes the
    reference's *declared* sketch capability real (its 'sketch' strategy
    actually ran a 30% row sample — reference ml_optimizer.py:248-268,
    SURVEY.md vestigial flag #1)."""
    select, ci_cols, transforms = [], [], []
    for it in parsed.select_items:
        name = it.output_name
        if it.agg and it.agg.func == "COUNT" and it.agg.distinct:
            expr = f"approx_count_distinct({it.agg.arg}, {rsd!r})"
            select.append(f"{expr} AS {_bt(name)}")
            lo = f"CAST(ROUND({expr} * (1 - {Z_95} * {rsd!r})) AS BIGINT)"
            hi = f"CAST(ROUND({expr} * (1 + {Z_95} * {rsd!r})) AS BIGINT)"
            select.append(f"{lo} AS {_bt(name + '_ci_low')}")
            select.append(f"{hi} AS {_bt(name + '_ci_high')}")
            select.append(
                f"CAST({Z_95 * rsd!r} AS DOUBLE) AS {_bt(name + '_rel_error')}"
            )
            ci_cols += [f"{name}_ci_low", f"{name}_ci_high", f"{name}_rel_error"]
            transforms.append(
                f"Rewrote {it.agg.raw} to approx_count_distinct(rsd={rsd:.4f}) [HLL++]"
            )
        elif it.alias:
            select.append(f"{it.raw} AS {_bt(it.alias)}")
        else:
            select.append(_passthrough_item(it.raw, name))
    out_sql = parsed.render(select_override=select)
    return RewriteResult(
        sql=out_sql,
        plan_type="sketch",
        transformations=transforms,
        ci_columns=ci_cols,
    )


def rewrite_quantile_sketch(
    parsed: ParsedQuery, accuracy: int = 10_000
) -> RewriteResult:
    """MEDIAN/PERCENTILE → ``approx_percentile(col, p, accuracy)``:
    Spark's native quantile summary (Greenwald–Khanna style) — one pass,
    partially aggregable, mergeable, no per-group sort state. The scale
    path for quantiles when no sample table exists: exact PERCENTILE
    buffers every distinct value per group, approx_percentile keeps
    O(accuracy) state with rank error ≤ 1/accuracy. CI companions come
    from the SAME summary evaluated at p ± 1/accuracy (the guaranteed
    rank band), clamped to [0, 1] — literally the same summary: all
    three levels ride one ``approx_percentile(col, array(...))`` call,
    which Spark canonicalizes to a single Greenwald–Khanna buffer
    instead of three (array subscripts match the scalar form
    bit-for-bit)."""
    eps = 1.0 / accuracy
    select, ci_cols, transforms = [], [], []
    for it in parsed.select_items:
        name = it.output_name
        if it.agg and it.agg.is_quantile:
            col, p = it.agg.quantile_args()
            p_lo, p_hi = max(0.0, p - eps), min(1.0, p + eps)
            arr = (
                f"approx_percentile({col}, "
                f"array({p!r}, {p_lo!r}, {p_hi!r}), {accuracy})"
            )
            expr, lo, hi = f"{arr}[0]", f"{arr}[1]", f"{arr}[2]"
            select.append(f"{expr} AS {_bt(name)}")
            select.append(f"{lo} AS {_bt(name + '_ci_low')}")
            select.append(f"{hi} AS {_bt(name + '_ci_high')}")
            select.append(
                f"(({hi}) - ({lo})) / 2.0 / "
                f"NULLIF(ABS(CAST(({expr}) AS DOUBLE)), 0.0)"
                f" AS {_bt(name + '_rel_error')}"
            )
            ci_cols += [
                f"{name}_ci_low", f"{name}_ci_high", f"{name}_rel_error",
            ]
            transforms.append(
                f"Rewrote {it.agg.raw} to approx_percentile"
                f"(accuracy={accuracy}, rank error <= {eps:.2e})"
            )
        elif it.alias:
            select.append(f"{it.raw} AS {_bt(it.alias)}")
        else:
            select.append(_passthrough_item(it.raw, name))
    out_sql = parsed.render(select_override=select)
    return RewriteResult(
        sql=out_sql,
        plan_type="sketch",
        transformations=transforms,
        ci_columns=ci_cols,
    )


def _scaled_select(
    parsed: ParsedQuery, scaler: _AggScaler, transforms: list[str]
) -> tuple[list[str], list[str]]:
    """The scaled select list + CI companion column names — shared by the
    single-table weighted rewrites and the join-level fact-sample
    rewrite (the HT expressions are identical in both shapes)."""
    n_sample_est = scaler.n_sample_est
    select, ci_cols = [], []
    for it in parsed.select_items:
        name = it.output_name
        if it.agg and it.agg.is_quantile:
            # The rank-band CI needs the group's sample size and the
            # PERCENTILE level must be a literal, so the CI is emitted
            # only for ungrouped queries (where n is the planning-time
            # sample size). A grouped quantile still returns its
            # per-group estimate — with no CI rather than one computed
            # against the wrong n.
            shared = (
                scaler.quantile_with_ci(it.agg)
                if not parsed.group_by
                else None
            )
            if shared is not None:
                est, lo, hi = shared
                select.append(f"{est} AS {_bt(name)}")
                select.append(f"{lo} AS {_bt(name + '_ci_low')}")
                select.append(f"{hi} AS {_bt(name + '_ci_high')}")
                select.append(
                    f"(({hi}) - ({lo})) / 2.0 / "
                    f"NULLIF(ABS(CAST(({est}) AS DOUBLE)), 0.0)"
                    f" AS {_bt(name + '_rel_error')}"
                )
                ci_cols += [
                    f"{name}_ci_low", f"{name}_ci_high", f"{name}_rel_error",
                ]
                transforms.append(
                    f"Computed {it.agg.raw} on the sample (quantiles are "
                    "sampling-invariant); order-statistic 95% CI from the "
                    f"binomial rank band at n≈{n_sample_est:.0f}"
                )
            else:
                # grouped or weighted quantile: estimate only, no CI
                # (scaled() raises for non-uniform designs without a
                # weighted-frequency form)
                select.append(f"{scaler.scaled(it.agg)} AS {_bt(name)}")
        elif it.agg and not (it.agg.func == "COUNT" and it.agg.distinct):
            scaled = scaler.scaled(it.agg)
            select.append(f"{scaled} AS {_bt(name)}")
            se = scaler.se_expr(it.agg)
            if se is not None:
                est = scaled
                select.append(f"({est}) - {Z_95} * ({se}) AS {_bt(name + '_ci_low')}")
                select.append(f"({est}) + {Z_95} * ({se}) AS {_bt(name + '_ci_high')}")
                select.append(
                    f"{Z_95} * ({se}) / NULLIF(ABS(CAST(({est}) AS DOUBLE)), 0.0)"
                    f" AS {_bt(name + '_rel_error')}"
                )
                ci_cols += [f"{name}_ci_low", f"{name}_ci_high", f"{name}_rel_error"]
        elif it.alias:
            select.append(f"{it.raw} AS {_bt(it.alias)}")
        else:
            select.append(_passthrough_item(it.raw, name))
    return select, ci_cols


def _scaled_having_order(
    parsed: ParsedQuery, scaler: _AggScaler
) -> tuple[str | None, list[OrderItem]]:
    """Scale aggregate CALLS inside HAVING (the rewritten query groups
    over sample rows; an unscaled HAVING COUNT(*) > K would compare
    sample-level counts against full-table thresholds) and ORDER BY
    (a raw aggregate there would rank groups by unscaled sample-level
    values — wrong top-k under per-row weights). An ORDER BY aggregate
    matching a select item sorts by that item's output alias (already
    scaled); other aggregates are scaled in place; ordinals and alias
    references pass through untouched."""
    having = parsed.having
    if having:
        having = _scale_aggs_in_expr(having, scaler)

    def _norm(t: str) -> str:
        return _re.sub(r"\s+", "", t).upper()

    by_raw = {
        _norm(it.agg.raw): it.output_name
        for it in parsed.select_items
        if it.agg is not None
    }

    def _order_expr(expr: str) -> str:
        alias = by_raw.get(_norm(expr))
        if alias is not None:
            return _bt(alias)
        return _scale_aggs_in_expr(expr, scaler)

    order_by = [OrderItem(_order_expr(o.expr), o.desc) for o in parsed.order_by]
    return having, order_by


def _rewrite_on_weights(
    parsed: ParsedQuery,
    table_expr: str,
    f_expr: str,
    plan_type: str,
    sample_table: str | None,
    fraction: float,
    transforms: list[str],
    extra_where: str | None = None,
    uniform: bool = True,
    n_rows: float | None = None,
) -> RewriteResult:
    n_sample_est = n_rows * fraction if n_rows else None
    scaler = _AggScaler(f_expr, uniform=uniform, n_sample_est=n_sample_est)
    select, ci_cols = _scaled_select(parsed, scaler, transforms)
    having, order_by = _scaled_having_order(parsed, scaler)
    rendered = ParsedQuery(
        select_items=parsed.select_items,
        table=table_expr,
        table_alias=parsed.table_alias,
        where=parsed.where,
        group_by=parsed.group_by,
        having=having,
        order_by=order_by,
        limit=parsed.limit,
    ).render(select_override=select, extra_where=extra_where)
    return RewriteResult(
        sql=rendered,
        plan_type=plan_type,
        sample_table=sample_table,
        sample_fraction=fraction,
        transformations=transforms,
        ci_columns=ci_cols,
    )


def rewrite_uniform_sample(
    parsed: ParsedQuery, sample: SampleInfo, n_rows: float | None = None
) -> RewriteResult:
    """Table → pre-built uniform sample substitution (the defining rewrite,
    reference planner.py:242 / ml_optimizer.py:227-231), with scaling by the
    catalog's ACHIEVED fraction."""
    f = sample.sample_fraction
    f_expr = f"CAST({f!r} AS DOUBLE)"
    transforms = [
        f"Rewrote to pre-built sample table {sample.sample_table} "
        f"(achieved fraction {f:.6f})",
        f"Scaled COUNT/SUM aggregates by 1/{f:.6f} inside the plan",
    ]
    return _rewrite_on_weights(
        parsed, sample.sample_table, f_expr, "sample", sample.sample_table, f,
        transforms, n_rows=n_rows,
    )


def rewrite_inline_sample(
    parsed: ParsedQuery, fraction: float, seed: int = 42,
    n_rows: float | None = None,
) -> RewriteResult:
    """No pre-built sample: inject a seeded Bernoulli sampling predicate
    ``rand(seed) < f`` — the direct analog of the reference's inline
    ``ROWID % k`` predicate rewrite (reference ml_optimizer.py:234-240).

    Chosen over ``TABLESAMPLE (p PERCENT)`` deliberately: a Sample operator
    sits between Filter and Scan and blocks predicate pushdown, while a
    rand() conjunct lets Catalyst split the conjunction and push the
    deterministic user predicates into the Parquet scan (verified via
    .explain: DataFilters carry the user WHERE). Bernoulli sampling
    commutes with filtering, so the estimator's inclusion probability is
    unchanged."""
    extra = f"rand({seed}) < CAST({fraction!r} AS DOUBLE)"
    f_expr = f"CAST({fraction!r} AS DOUBLE)"
    transforms = [
        f"Injected inline Bernoulli sampling predicate rand({seed}) < {fraction!r}",
        f"Scaled COUNT/SUM aggregates by 1/{fraction:.6f} inside the plan",
    ]
    return _rewrite_on_weights(
        parsed, parsed.table, f_expr, "sample", None, fraction, transforms,
        extra_where=extra, n_rows=n_rows,
    )


def rewrite_systematic_sample(
    parsed: ParsedQuery, k: int, key_expr: str,
    n_rows: float | None = None,
) -> RewriteResult:
    """Deterministic 1-in-``k`` systematic sample: inject the predicate
    ``(key_expr) % k = 0`` and scale by k — the closest Spark analog of the
    reference's inline ``ROWID % k`` rewrite (reference
    ml_optimizer.py:234-240), with the row id replaced by a caller-chosen
    key expression (e.g. a hash or a composite key).

    Unlike ``rewrite_inline_sample`` (seeded ``rand()``, statistically
    cleaner for production), the sampled subset here is a pure function of
    the data, so ANY engine reproduces it bit-for-bit — which is what makes
    progressive/online aggregation oracle-checkable. The estimator treats
    the subset as Bernoulli(1/k); that is sound when the key is
    equidistributed mod k (hash-like or arithmetic over dense ids), the
    same assumption the reference's ROWID % k makes."""
    if k < 1:
        raise UnsupportedRewriteError(f"systematic sample k={k} must be >= 1")
    fraction = 1.0 / k
    extra = f"(({key_expr}) % {k}) = 0"
    f_expr = f"CAST({fraction!r} AS DOUBLE)"
    transforms = [
        f"Injected deterministic systematic sampling predicate ({key_expr}) % {k} = 0",
        f"Scaled COUNT/SUM aggregates by {k} inside the plan",
    ]
    return _rewrite_on_weights(
        parsed, parsed.table, f_expr, "sample", None, fraction, transforms,
        extra_where=extra, n_rows=n_rows,
    )


def rewrite_join_fact_sample(
    jq,
    fact_table: str,
    fraction: float | None = None,
    seed: int = 42,
    n_rows: float | None = None,
    k: int | None = None,
    key_expr: str | None = None,
    sample_table: str | None = None,
) -> RewriteResult:
    """Join-level AQP through the SQL surface (beyond-reference; the
    programmatic analog is operators/approx_join.py): replace the FACT
    side of an inner star join with a sampled subquery and scale the
    aggregates by 1/f. Sampling one side only keeps per-output-row
    inclusion probabilities exact — every join-output row descends from
    exactly one fact row — so the SAME Horvitz–Thompson expressions as
    the single-table rewrite apply to aggregates over ANY column, dim or
    fact. Dims stay exact and still broadcast.

    Pass ``fraction`` for the seeded Bernoulli predicate, ``k`` +
    ``key_expr`` for the deterministic 1-in-k systematic variant (the
    engine-reproducible form used by the oracle contract), or
    ``sample_table`` + ``fraction`` (the ACHIEVED fraction) to substitute
    a pre-built uniform sample of the fact — the scale form: the inline
    predicate still reads every fact row, the pre-built sample reads only
    f·N. The sampling predicate — including ``key_expr`` — evaluates
    INSIDE the fact subquery, so it must reference unqualified fact
    column names. At 100 TB this is the rewrite that cuts the fact scan
    AND the join shuffle by 1/f; the sampling predicate sits inside the
    fact subquery, so it filters BEFORE the join, never after."""
    if sample_table is not None:
        if fraction is None:
            raise UnsupportedRewriteError(
                "join sample via sample_table needs its achieved fraction"
            )
        pred = None
        transforms = [
            f"Replaced fact table {fact_table} with pre-built uniform "
            f"sample {sample_table} (achieved f={fraction:.6f}) inside "
            "the join",
            f"Scaled aggregates by 1/{fraction:.6f} with "
            "Horvitz-Thompson weights",
        ]
    elif k is not None:
        if k < 1:
            raise UnsupportedRewriteError(f"systematic sample k={k} must be >= 1")
        if not key_expr:
            raise UnsupportedRewriteError("systematic join sample needs key_expr")
        fraction = 1.0 / k
        pred = f"(({key_expr}) % {k}) = 0"
        transforms = [
            f"Sampled fact table {fact_table} with deterministic "
            f"({key_expr}) % {k} = 0 inside the join",
            f"Scaled aggregates by {k} with Horvitz-Thompson weights",
        ]
    else:
        if fraction is None:
            raise UnsupportedRewriteError("join sample needs fraction or k")
        pred = f"rand({seed}) < CAST({fraction!r} AS DOUBLE)"
        transforms = [
            f"Sampled fact table {fact_table} with rand({seed}) < "
            f"{fraction!r} inside the join (pre-join, scan-side)",
            f"Scaled aggregates by 1/{fraction:.6f} with "
            "Horvitz-Thompson weights",
        ]
    for agg in jq.aggregates:
        if agg.distinct:
            raise UnsupportedRewriteError(
                f"{agg.func}(DISTINCT ...) is not approximable by sampling"
            )
    f_expr = f"CAST({fraction!r} AS DOUBLE)"
    n_sample_est = n_rows * fraction if n_rows else None
    scaler = _AggScaler(f_expr, uniform=True, n_sample_est=n_sample_est)
    select, ci_cols = _scaled_select(jq, scaler, transforms)
    having, order_by = _scaled_having_order(jq, scaler)
    from_override = (
        jq.from_with_replacement(fact_table, sample_table)
        if sample_table is not None
        else jq.from_with_sampled(fact_table, pred)
    )
    rendered = type(jq)(
        select_items=jq.select_items,
        table=jq.table,
        table_alias=jq.table_alias,
        where=jq.where,
        group_by=jq.group_by,
        having=having,
        order_by=order_by,
        limit=jq.limit,
        tables=jq.tables,
        from_body=jq.from_body,
    ).render(select_override=select, from_override=from_override)
    return RewriteResult(
        sql=rendered,
        plan_type="sample",
        sample_table=sample_table,
        sample_fraction=fraction,
        transformations=transforms,
        ci_columns=ci_cols,
    )


def rewrite_weighted_sample(parsed: ParsedQuery, sample: SampleInfo) -> RewriteResult:
    """Table → measure-biased sample: the per-row inclusion probability is
    the sample's stored ``__p`` column, so the generic Horvitz–Thompson
    scaling/SE expressions apply verbatim with f_expr = __p. For
    SUM(measure) the estimator variance is near zero (big rows are certain
    inclusions), which is the point of PPS sampling."""
    transforms = [
        f"Rewrote to measure-biased sample {sample.sample_table} "
        f"(PPS on {sample.variance_column}, fraction {sample.sample_fraction:.6f})",
        "Applied per-row Horvitz-Thompson weights 1/__p inside aggregates",
    ]
    return _rewrite_on_weights(
        parsed,
        sample.sample_table,
        "__p",
        "sample",
        sample.sample_table,
        sample.sample_fraction,
        transforms,
        uniform=False,
    )


def rewrite_stratified(parsed: ParsedQuery, sample: SampleInfo) -> RewriteResult:
    """Table → stratified sample with per-row Horvitz–Thompson weights from
    the achieved per-stratum fractions. Works for ANY grouping (not just the
    strata column) because weighting is per-row. The reference's stratified
    strategy performed no rewrite at all (reference ml_optimizer.py:270-274,
    SURVEY.md vestigial flag #3); this makes it real."""
    # A plain single-column stratification interpolates the NAME into SQL;
    # a non-identifier name (e.g. "a-b", accepted by the sampler via F.col)
    # would misparse as arithmetic — backtick it. Composite/multi-column
    # stratifications store a genuine SQL expression in strata_column and
    # must interpolate raw.
    strata_expr = sample.strata_column
    source = sample.strata_source_cols or [sample.strata_column]
    if len(source) == 1 and source[0] == sample.strata_column:
        strata_expr = _bt(sample.strata_column)
    f_expr = _weight_case_expr(
        strata_expr, sample.strata, sample.sample_fraction
    )
    transforms = [
        f"Rewrote to stratified sample {sample.sample_table} "
        f"(strata column {sample.strata_column}, {sample.allocation_type} "
        f"allocation, overall fraction {sample.sample_fraction:.6f})",
        "Applied per-stratum Horvitz-Thompson weights 1/f_h inside aggregates",
    ]
    return _rewrite_on_weights(
        parsed,
        sample.sample_table,
        f_expr,
        "stratified",
        sample.sample_table,
        sample.sample_fraction,
        transforms,
        uniform=False,
    )


def plan_dict(
    rw: RewriteResult,
    original_sql: str,
    table: str | None,
    estimated_cost: float,
    estimated_error: float,
    reason: str,
) -> dict[str, Any]:
    """Reference-shaped plan dict (reference planner.py:247-257)."""
    out = {
        "type": rw.plan_type,
        "sql": rw.sql,
        "original_sql": original_sql,
        "table": table,
        "estimated_cost": estimated_cost,
        "estimated_error": estimated_error,
        "reason": reason,
    }
    if rw.sample_table is not None:
        out["sample_table"] = rw.sample_table
    if rw.sample_fraction is not None:
        out["sample_fraction"] = rw.sample_fraction
    return out
