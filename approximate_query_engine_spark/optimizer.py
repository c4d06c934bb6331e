"""'ML' optimizer: rule decision tree + history-weighted re-ranking.

Stage A of the reference lifecycle (reference ml_optimizer.py). The decision
tree keeps the reference's thresholds verbatim (ml_optimizer.py:153-179);
the history re-ranking keeps its scoring (0.6·speedup − 0.4·error, window
±50% on table size and tolerance, last 20 — ml_optimizer.py:115-151,
339-357). Unlike the reference — whose history table is never written
(SURVEY.md vestigial flag #2) — the engine appends every dual-executed
query, so the learning branch actually sees data.

Strategy semantics are made honest where the reference faked them:
- 'sketch' on COUNT(DISTINCT) really uses HLL++ (not a 30% row sample);
- 'stratified' really routes to a stratified sample when the catalog has
  one on a GROUP BY column, else degrades to uniform sampling;
- error estimates keep the reference clamps (ml_optimizer.py:242-274);
  speedup estimates use the cost model's exact/chosen ratio with the
  per-query fixed floor (the reference's flat 1/f promised 100x at
  f=0.01 — the measured big tier delivers ~5-7x and small tables ~1x).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from approximate_query_engine_spark.catalog import Catalog, HistoryRecord
from approximate_query_engine_spark.planner import (
    QUERY_FIXED_COST,
    SKETCH_QUERY_COST,
    Planner,
    inline_fraction_for,
    per_row_agg_work,
)
from approximate_query_engine_spark.sqlparser import ParsedQuery, try_parse


def _clamp(x: float, lo: float, hi: float) -> float:
    return max(lo, min(hi, x))


def _wall_clock_ratio(plan: dict) -> float | None:
    """Cost-model speedup estimate: (exact + floor) / (chosen + floor),
    the ONE implementation both the single-table and join envelopes use.
    None when either cost is missing or the sketch cost is the flat
    no-stats constant (a 10-unit constant against an N-row scan is not a
    wall-clock model). Sub-1 ratios are reported, clamped at 0.1 — a
    forced strategy can be a predicted slowdown, and rounding it up to
    1.0 would hide the prediction from the learning history and the
    bench's estimate_calibration block."""
    cost_exact = plan.get("cost_exact")
    cost_chosen = plan.get("estimated_cost")
    if not cost_exact or not cost_chosen or cost_chosen <= 0:
        return None
    if plan.get("type") == "sketch" and cost_chosen <= SKETCH_QUERY_COST:
        return None
    return _clamp(
        (cost_exact + QUERY_FIXED_COST) / (cost_chosen + QUERY_FIXED_COST),
        0.1,
        100.0,
    )


@dataclass
class Features:
    """Query features (reference ml_optimizer.py:65-113)."""

    has_count: bool
    has_sum: bool
    has_avg: bool
    has_distinct: bool
    has_group_by: bool
    group_by_cardinality: int
    where_complexity: int
    query_length: int
    table_size: int

    def as_dict(self) -> dict[str, Any]:
        return dict(self.__dict__)


def extract_features(parsed: ParsedQuery, sql: str, table_size: int) -> Features:
    return Features(
        has_count=parsed.has_count,
        has_sum=parsed.has_sum,
        has_avg=parsed.has_avg,
        has_distinct=parsed.has_distinct,
        has_group_by=parsed.has_group_by,
        group_by_cardinality=len(parsed.group_by),
        where_complexity=parsed.where_complexity,
        query_length=len(sql),
        table_size=table_size,
    )


def choose_base_strategy(f: Features, tol: float) -> tuple[str, float]:
    """Reference decision tree, thresholds verbatim (ml_optimizer.py:153-179)."""
    if f.table_size <= 1000:
        return "exact", 0.95
    if f.has_distinct and f.has_count and tol > 0.001:
        return "sketch", 0.90
    if f.has_group_by and tol > 0.001:
        if f.table_size > 10000 and f.group_by_cardinality > 1:
            return "stratified", 0.85
        return "sketch", 0.80
    if f.table_size > 5000 and tol > 0.001 and (f.has_count or f.has_sum or f.has_avg):
        return "sample", 0.85
    if f.table_size > 1000 and tol > 0.001 and (f.has_count or f.has_sum):
        return "sample", 0.75
    return "exact", 0.60


class MLOptimizer:
    def __init__(self, catalog: Catalog, planner: Planner):
        self.catalog = catalog
        self.planner = planner

    # ------------------------------------------------------------------
    def optimize_query(self, sql: str, max_rel_error: float = 0.05) -> dict[str, Any]:
        """Return the reference-shaped optimization dict
        (ml_optimizer.py:41-50): {strategy, modified_sql, original_sql,
        confidence, estimated_speedup, estimated_error, reasoning,
        transformations}."""
        parsed = try_parse(sql)
        if parsed is None:
            # Inner star joins are approximable since round 4: delegate to
            # the planner's join path and report its decision in the
            # reference-shaped envelope (the realized plan rides along so
            # the engine doesn't plan twice).
            from approximate_query_engine_spark.sqlparser import (
                try_parse_join,
            )

            jq = try_parse_join(sql)
            if jq is not None:
                plan = self.planner.plan(sql, max_rel_error)
                # cost-model ratio, same honesty rule as _estimates;
                # calibrated from JOIN-cell history (is_join separates
                # the cells — join plan economics differ from a
                # single-table scan at the same per-row work)
                raw_join_est = _wall_clock_ratio(plan) or (
                    1.0 / plan["sample_fraction"]
                    if plan.get("sample_fraction")
                    else 1.0
                )
                join_work = per_row_agg_work(jq)
                est = raw_join_est
                if plan["type"] != "exact":
                    est *= self._speedup_correction(
                        plan["type"],
                        bool(jq.group_by),
                        join_work,
                        is_join=True,
                    )
                return {
                    "_plan": plan,
                    "strategy": plan["type"],
                    "modified_sql": plan["sql"],
                    "original_sql": sql,
                    "confidence": 0.9,
                    "estimated_speedup": est,
                    "estimated_error": plan.get("estimated_error", 0.0),
                    "reasoning": (
                        "inner star join: the fact side samples inside the "
                        f"join while dims stay exact — {plan['reason']}"
                    ),
                    "transformations": plan.get("reason", ""),
                    "features": {
                        "has_group_by": bool(jq.group_by),
                        "raw_est_speedup": float(raw_join_est),
                        "per_row_work": float(join_work),
                        "is_join": True,
                    },
                }
            return self._exact_optimization(
                sql, 0.95, "Query outside the approximable grammar "
                "(subqueries/windows/set-ops run exactly on Spark SQL)."
            )
        n = self.planner.table_row_count(parsed.table) or 0
        feats = extract_features(parsed, sql, n)
        strategy, confidence = choose_base_strategy(feats, max_rel_error)
        strategy, confidence, learned = self._apply_learning(
            feats, max_rel_error, strategy, confidence
        )

        # Honesty downgrades (documented divergence from the reference's
        # fake strategies, SURVEY.md §4.1):
        if strategy == "sketch" and not (feats.has_distinct and feats.has_count):
            strategy = "sample"  # ref 'sketch' here meant a 30% row sample
        if strategy == "stratified":
            from approximate_query_engine_spark.planner import _unqualify

            group_cols = {
                _unqualify(g.strip(), parsed.table_alias) for g in parsed.group_by
            }
            has_strat = any(
                set(s.strata_source_cols or [s.strata_column]) <= group_cols
                for s in self.catalog.stratified_samples_for_table(parsed.table)
            )
            if not has_strat:
                strategy = "sample"

        plan = self.planner.plan(
            sql, max_rel_error, forced_strategy=strategy
        )
        est_speedup, est_error = self._estimates(plan, feats, max_rel_error)
        raw_est_speedup = est_speedup
        per_row_work = per_row_agg_work(parsed)
        corr = 1.0
        if plan["type"] != "exact":
            # calibrate the cost-model promise against what dual
            # execution actually measured for this (strategy, shape,
            # per-row work)
            corr = self._speedup_correction(
                plan["type"], feats.has_group_by, per_row_work
            )
            est_speedup *= corr
        reasoning = self._reasoning(strategy, feats, learned)
        if corr != 1.0:
            reasoning += (
                f"; speedup estimate calibrated x{corr:.2f} from "
                "dual-executed history"
            )
        if plan["type"] != strategy:
            # the chosen strategy wasn't realizable for this query shape
            # (e.g. history favored 'sample' but DISTINCT aggregates can't
            # be sampled): say what the planner actually landed on so the
            # reasoning matches the plan the user sees.
            reasoning += (
                f"; '{strategy}' not realizable here — cost model landed on "
                f"'{plan['type']}'"
            )
        return {
            # the realized plan rides along so the engine doesn't plan twice
            # (popped off before the dict reaches the response)
            "_plan": plan,
            "strategy": plan["type"],
            "modified_sql": plan["sql"],
            "original_sql": sql,
            "confidence": confidence,
            "estimated_speedup": est_speedup,
            "estimated_error": est_error,
            "reasoning": reasoning,
            "transformations": plan.get("reason", ""),
            # the UNCALIBRATED model estimate rides in features so
            # recorded outcomes calibrate against the stationary raw
            # model (actual/raw), not against their own corrected
            # predictions — self-reference would drift the factor to 1
            "features": {
                **feats.as_dict(),
                "raw_est_speedup": float(raw_est_speedup),
                "per_row_work": float(per_row_work),
            },
        }

    # ------------------------------------------------------------------
    def _apply_learning(
        self, feats: Features, tol: float, strategy: str, confidence: float
    ) -> tuple[str, float, bool]:
        """History re-ranking (reference ml_optimizer.py:121-149): among
        strategies seen in similar runs pick max 0.6·speedup − 0.4·error
        subject to avg_error ≤ 1.2·tol."""
        hist = self.catalog.similar_history(feats.table_size, tol, limit=20)
        if not hist:
            return strategy, confidence, False
        by_strategy: dict[str, list[HistoryRecord]] = {}
        for h in hist:
            by_strategy.setdefault(h.strategy, []).append(h)
        best, best_score, best_n = None, float("-inf"), 0
        for strat, rows in by_strategy.items():
            avg_speedup = sum(r.actual_speedup for r in rows) / len(rows)
            errs = [r.actual_error for r in rows if r.actual_error is not None]
            avg_error = sum(errs) / len(errs) if errs else 0.0
            if avg_error > 1.2 * tol:
                continue
            score = 0.6 * avg_speedup - 0.4 * avg_error
            if score > best_score:
                best, best_score, best_n = strat, score, len(rows)
        if best is None:
            return strategy, confidence, False
        conf = min(0.6 + 0.3 * (best_n / 10.0), 0.95)
        return best, conf, True

    # ------------------------------------------------------------------
    def _speedup_correction(
        self,
        strategy: str,
        grouped: bool,
        work: float | None = None,
        is_join: bool = False,
    ) -> float:
        """Per-(strategy, shape) calibration factor from the CLOSED
        learning loop (round 9, VERDICT r8 #4), conditioned on PER-ROW
        WORK: the measured actual/raw ratio rises almost linearly with
        the aggregate's per-row work (a light SUM is floor-bound — the
        exact side is scan-cheap, so sampling delivers ~0.3× of the
        model's scan-ratio promise — while a trig-heavy aggregate
        delivers the full promise). When the cell's history spans ≥2
        distinct work values, fit log(ratio) = α + β·work by least
        squares and predict at this query's work; otherwise fall back
        to the geometric mean of the cell's ratios. Grouped and scalar
        aggregates calibrate separately (sampling shrinks a per-group
        shuffle differently than a scalar scan). Neutral (1.0) with no
        history; clamped to [0.2, 5]. Ratios compare actual against the
        RAW (uncalibrated) model estimate each record carries in
        query_features — calibrating against already-corrected
        predictions would drift the factor toward 1 instead of toward
        the model's true bias (legacy records without the raw estimate
        fall back to their predicted_speedup)."""
        import math

        pts: list[tuple[float | None, float]] = []
        for h in self.catalog.history[-200:]:
            if h.strategy != strategy:
                continue
            if bool(h.query_features.get("has_group_by")) != grouped:
                continue
            if bool(h.query_features.get("is_join")) != is_join:
                continue
            raw = (
                h.query_features.get("raw_est_speedup")
                or h.predicted_speedup
            )
            if raw and raw > 0 and h.actual_speedup and h.actual_speedup > 0:
                pts.append(
                    (
                        h.query_features.get("per_row_work"),
                        h.actual_speedup / raw,
                    )
                )
        if not pts:
            return 1.0

        def _clamped(v: float) -> float:
            return max(0.2, min(5.0, v))

        # aggregate repeated observations at the same work value by the
        # MEDIAN of the 3 MOST RECENT log-ratios: the median sheds a
        # single outlier dual measurement (wall-clock jitter), and the
        # recency window tracks a nonstationary measurement environment
        # (cache/JIT/GC state drifts within a session, so old ratios
        # describe conditions that no longer hold)
        by_w: dict[float, list[float]] = {}
        for w, r in pts:  # pts is history order — oldest first
            if w is not None:
                by_w.setdefault(w, []).append(math.log(r))
        def _recent_median(ys: list[float]) -> float:
            tail = ys[-3:]
            return sorted(tail)[len(tail) // 2]

        if work is not None and len(by_w.get(work, [])) >= 3:
            # LOCAL-FIRST (round 10): the regression exists to
            # generalize to UNSEEN work values; at a work point with
            # ≥3 of its own observations, the local recent median is
            # the better estimator — the global line sits above or
            # below any point whose ratio is off the trend, which
            # showed up as a persistent +20% bias on the one
            # calibration cell whose ratio undershoots the fit
            return _clamped(math.exp(_recent_median(by_w[work])))
        fit = [
            (w, _recent_median(ys)) for w, ys in sorted(by_w.items())
        ]
        if work is not None and len(fit) >= 2:
            # NEVER extrapolate the fitted slope beyond the observed
            # work span (round 10, VERDICT r9 #3): outside it the slope
            # is unvalidated and a thin two-point fit would amplify a
            # single noisy dual measurement into a wild correction —
            # the nearest endpoint's median ratio is the defensible
            # estimate there. Inside the span this is a no-op.
            work = max(fit[0][0], min(fit[-1][0], work))
            n = len(fit)
            mw = sum(w for w, _y in fit) / n
            my = sum(y for _w, y in fit) / n
            var = sum((w - mw) ** 2 for w, _y in fit)
            cov = sum((w - mw) * (y - my) for w, y in fit)
            if var > 1e-12:
                beta = cov / var
                return _clamped(math.exp(my + beta * (work - mw)))
        g = math.exp(
            sum(math.log(r) for _w, r in pts) / len(pts)
        )
        return _clamped(g)

    # ------------------------------------------------------------------
    @staticmethod
    def _estimates(plan: dict, feats: Features, tol: float) -> tuple[float, float]:
        """Speedup/error estimates per strategy. Error keeps the reference
        clamps (ml_optimizer.py:242-274); speedup uses the cost model's
        own exact/chosen ratio when the plan carries both costs — the
        reference's 1/f promise (100x at f=0.01) never survives contact
        with the measured big tier (~5-7x: scan reduction, not wall-clock
        division). Capped at 100x; falls back to the reference formulas
        when the ratio is unavailable or the sketch cost is the flat
        no-stats constant (a flat 10-unit cost against an N-row scan is
        not a wall-clock model)."""
        ptype = plan["type"]
        if ptype == "exact":
            return 1.0, 0.0
        ratio = _wall_clock_ratio(plan)
        if ptype == "sketch":
            err = _clamp(plan.get("estimated_error", 0.02), 0.02, 0.30)
            return (ratio if ratio is not None else 3.3), err
        f = plan.get("sample_fraction") or inline_fraction_for(
            max(feats.table_size, 1), tol
        )
        n_eff = max(feats.table_size * f, 1.0)
        err = _clamp(1.0 / (n_eff**0.5), 0.01, 0.5)
        if ratio is not None:
            return ratio, err
        return (1.0 / f if f > 0 else 1.0), err

    @staticmethod
    def _reasoning(strategy: str, f: Features, learned: bool) -> str:
        """Human-readable reasoning (reference ml_optimizer.py:276-299)."""
        bits = []
        if learned:
            bits.append("historical performance of similar queries favored this strategy")
        if strategy == "exact":
            bits.append(
                "table small or query not approximable; exact Spark SQL is cheap"
                if f.table_size <= 1000
                else "no approximate strategy met the error tolerance"
            )
        elif strategy == "sketch":
            bits.append(
                "COUNT(DISTINCT) detected: HLL++ sketch gives a mergeable, "
                "single-pass cardinality estimate with bounded relative error"
            )
        elif strategy == "stratified":
            bits.append(
                "GROUP BY over a stratified sample preserves per-group accuracy "
                "via per-stratum Horvitz-Thompson weights"
            )
        else:
            bits.append(
                f"table has {f.table_size} rows; sampling trades a bounded "
                "relative error for a proportional scan reduction"
            )
        return "; ".join(bits)

    def _exact_optimization(self, sql: str, conf: float, reason: str) -> dict[str, Any]:
        return {
            "strategy": "exact",
            "modified_sql": sql,
            "original_sql": sql,
            "confidence": conf,
            "estimated_speedup": 1.0,
            "estimated_error": 0.0,
            "reasoning": reason,
            "transformations": "",
            "features": {},
        }

    # ------------------------------------------------------------------
    def record_outcome(
        self,
        sql: str,
        features: dict[str, Any],
        strategy: str,
        actual_speedup: float,
        actual_error: float | None,
        predicted_speedup: float,
        predicted_error: float,
        execution_time_ms: float,
        error_tolerance: float,
    ) -> None:
        """Close the learning loop (the reference defines the history schema
        at ml_optimizer.py:305-321 but never inserts; SURVEY.md flag #2)."""
        self.catalog.append_history(
            HistoryRecord(
                query_pattern=sql[:200],
                table_size=int(features.get("table_size", 0)),
                strategy=strategy,
                actual_speedup=actual_speedup,
                actual_error=actual_error,
                predicted_speedup=predicted_speedup,
                predicted_error=predicted_error,
                execution_time_ms=execution_time_ms,
                error_tolerance=error_tolerance,
                query_features=features,
            )
        )
        self.catalog.save()

    def learning_stats(self, days: int = 30) -> dict[str, Any]:
        """Per-strategy count / avg speedup / avg error (reference
        ml_optimizer.py:406-438, served by GET /ml/stats)."""
        import time

        cutoff = time.time() - days * 86400
        rows = [h for h in self.catalog.history if h.timestamp >= cutoff]
        by_strategy: dict[str, list[HistoryRecord]] = {}
        for h in rows:
            by_strategy.setdefault(h.strategy, []).append(h)
        stats = {}
        for strat, rs in sorted(by_strategy.items()):
            errs = [r.actual_error for r in rs if r.actual_error is not None]
            stats[strat] = {
                "query_count": len(rs),
                "avg_speedup": sum(r.actual_speedup for r in rs) / len(rs),
                "avg_error": (sum(errs) / len(errs)) if errs else None,
            }
        return {"total_queries": len(rows), "strategies": stats, "window_days": days}
