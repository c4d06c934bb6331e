"""Sample/sketch auto-maintenance policies.

The reference has no freshness story at all: samples and sketches are built
once and silently drift as the base table changes (reference sampler.py /
storage.py persist artifacts with no refresh path — SURVEY.md §2.5/§2.6).
At 100 TB, stale samples are the difference between a 2% and a 40% error,
so the rebuild makes maintenance a first-class policy:

- **Drift policy**: an artifact remembers the base-table row count it was
  built against (for samples, ``row_count / sample_fraction``; for
  sketches, the row count recorded in catalog stats at build time). When
  the CURRENT catalog row count deviates by more than ``max_drift``, the
  artifact is rebuilt. Row counts come from the catalog — refreshing stats
  is one cheap ``COUNT(*)`` per table (or free from Parquet footers /
  Delta logs on a real deployment), never per-query work.
- **Age policy** (optional): artifacts older than ``max_age_sec`` rebuild
  regardless of drift — for append-heavy tables where row count alone
  understates content churn.

``run_maintenance`` is driver-side orchestration over tiny metadata; the
rebuilds it triggers are ordinary Spark jobs (sampleBy / sketch_agg), so
the policy scales with the number of ARTIFACTS, not the data.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any


@dataclass
class MaintenanceReport:
    checked: int = 0
    refreshed: list[dict[str, Any]] = field(default_factory=list)
    fresh: list[str] = field(default_factory=list)
    #: drift unmeasurable AND base table empty/uncounted — nothing to do yet
    unknown: list[str] = field(default_factory=list)
    errors: list[dict[str, str]] = field(default_factory=list)
    #: the rollup advisor's current suggestions (engine.recommend_rollups)
    #: — maintenance is the ops surface, so the "you should materialize
    #: this" signal rides the same report as the freshness sweep
    rollup_recommendations: list[dict[str, Any]] = field(
        default_factory=list
    )
    #: advisor suggestions MATERIALIZED this sweep (apply_advice=True —
    #: the observe → advise → materialize → route loop closed in one call)
    rollup_advice_applied: list[dict[str, Any]] = field(
        default_factory=list
    )
    #: the layout advisor's current suggestions
    #: (engine.recommend_partition_layouts) + what apply_advice built
    layout_recommendations: list[dict[str, Any]] = field(
        default_factory=list
    )
    layout_advice_applied: list[dict[str, Any]] = field(
        default_factory=list
    )

    def to_dict(self) -> dict[str, Any]:
        return {
            "checked": self.checked,
            "refreshed": self.refreshed,
            "fresh": self.fresh,
            "unknown": self.unknown,
            "errors": self.errors,
            "rollup_recommendations": self.rollup_recommendations,
            "rollup_advice_applied": self.rollup_advice_applied,
            "layout_recommendations": self.layout_recommendations,
            "layout_advice_applied": self.layout_advice_applied,
        }


def _sample_base_population(info) -> float | None:
    """Base-table row count the sample was built against, reconstructed
    from the achieved fraction (rows / f). None when degenerate."""
    if info.sample_fraction and info.row_count:
        return info.row_count / info.sample_fraction
    return None


def _rollup_tail_repair(engine, info) -> str | None:
    """The ``since`` date from which a drifted rollup can be repaired
    INCREMENTALLY, or None when only a full rebuild is sound. Sound iff
    every row outside the tail is already accounted for: the source rows
    whose bucket lands before the layout's LAST date (a column-pruned
    filtered COUNT — no shuffle) must equal the layout's own n_rows
    total over those dates (a rollup-sized SUM). Equal-count head
    mutation is the same undetectable case as everywhere row counts
    gate freshness — the append-mostly contract of refresh_rollup."""
    from pyspark.sql import functions as F

    from approximate_query_engine_spark.operators.partitioning import (
        list_bucket_dirs,
    )

    try:
        dates = list_bucket_dirs(
            engine.spark, info["path"], partition_col="p_date"
        )
        if not dates:
            return None
        since = dates[-1]
        layout = engine.spark.read.parquet(info["path"])
        head_state = (
            layout.filter(F.col("p_date") < since)
            .agg(F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n"))
            .collect()[0]["n"]
        )
        src_head = (
            engine.spark.table(info["source_table"])
            .filter(
                F.date_format(
                    F.window(F.col(info["time_col"]), info["bucket"])[
                        "start"
                    ],
                    "yyyy-MM-dd",
                )
                < since
            )
            .count()
        )
        return since if int(head_state) == int(src_head) else None
    except Exception:
        return None


def _reprove_topk_evidence(engine, table, info, dry_run, defer=False):
    """Restore the EXACT certification tier for a FRESH rollup's top-k
    evidence (round 9): refresh maintains ``topk_exact_ndv`` as an exact
    upper bound (old + tail distinct count), and after enough append
    cycles the bound can exceed the budget even though the true ndv
    still fits — the strongest routing tier goes dark. Re-prove it with
    one column-pruned exact COUNT(DISTINCT) per affected column:
    scheduled maintenance cost instead of a lost certification.

    ``defer=True`` (round 10, VERDICT r9 #6): the operator's
    ``max_reprove_scans`` budget is exhausted — report the dark evidence
    as a DEFERRED action without paying the fact scan. Safe by
    construction: budget-dark evidence only ever causes honest declines
    (queries fall back to exact), never wrong answers, so deferral
    costs raw-scan wall-clock, not correctness."""
    evid = info.get("topk_exact_ndv") or {}
    budget = int(info.get("topk_budget", 1024))
    stale = sorted(
        c
        for c, v in evid.items()
        if not v.get("exact") and int(v.get("ndv", 0)) > budget
    )
    if not stale:
        return None
    if defer:
        return {
            "kind": "rollup_topk_evidence",
            "table": table,
            "view": info["view"],
            "columns": stale,
            "dry_run": dry_run,
            "deferred": True,
            "reason": (
                "exact ndv upper bound exceeds topk budget "
                f"{budget}, but max_reprove_scans is exhausted — "
                "re-proof deferred to a later maintenance window "
                "(routing declines to exact until then)"
            ),
        }
    action = {
        "kind": "rollup_topk_evidence",
        "table": table,
        "view": info["view"],
        "columns": stale,
        "dry_run": dry_run,
        "reason": (
            f"exact ndv upper bound exceeds topk budget {budget} — "
            "re-proving with an exact COUNT(DISTINCT)"
        ),
    }
    if not dry_run:
        from pyspark.sql import functions as F

        row = (
            engine.spark.table(table)
            .agg(
                *[
                    F.countDistinct(F.col(c)).alias(f"__ndv_{i}")
                    for i, c in enumerate(stale)
                ]
            )
            .collect()[0]
        )
        for i, c in enumerate(stale):
            evid[c] = {"ndv": int(row[f"__ndv_{i}"] or 0), "exact": True}
        info["topk_exact_ndv"] = evid
        engine.catalog.save()
    return action


def run_maintenance(
    engine,
    max_drift: float = 0.10,
    max_age_sec: float | None = None,
    refresh_stats: bool = True,
    dry_run: bool = False,
    compact_files_over: int | None = None,
    apply_advice: bool = False,
    advice_max_apply: int = 1,
    advice_max_state_rows: int | None = 5_000_000,
    advice_max_buckets: int | None = 100_000,
    max_reprove_scans: int | None = None,
) -> dict[str, Any]:
    """Apply the drift/age policies to every cataloged sample and sketch.

    ``refresh_stats``: re-count each distinct base table once up front so
    drift is measured against reality, not stale stats. ``dry_run`` reports
    what WOULD refresh without running any rebuild.
    ``compact_files_over``: when set, every registered partitioned layout
    whose bucket directories hold more than this many data files gets
    compacted to one file per bucket (streaming appends a file per
    micro-batch — see operators.partitioning.compact_partition_layout).
    ``apply_advice``: opt-in — MATERIALIZE the top rollup-advisor
    suggestion(s) (engine.apply_rollup_advice) under the
    ``advice_max_apply`` / ``advice_max_state_rows`` budget, and
    PARTITION the top layout-advisor suggestion(s)
    (engine.apply_layout_advice) under ``advice_max_apply`` /
    ``advice_max_buckets``, so the next matching dashboard query routes
    to pre-aggregated state / a pruned layout; never runs under
    ``dry_run``.
    ``max_reprove_scans`` (round 10, VERDICT r9 #6): bounds the exact
    COUNT(DISTINCT) fact scans the top-k evidence re-proof may pay per
    window (one scan per affected rollup, all dark columns in a single
    agg). None = unbounded (the round-9 behavior); 0 = defer every
    re-proof. Deferred re-proofs are reported with ``deferred: true``
    and cost nothing — budget-dark evidence only causes honest declines
    (routing falls back to exact), never wrong answers, so at 100 TB an
    operator can spread re-proofs across windows the same way
    ``advice_max_apply`` spreads builds.
    """
    catalog = engine.catalog
    report = MaintenanceReport()
    now = time.time()

    # one stats refresh per distinct base table (never per artifact)
    base_tables = (
        {s.table_name for s in catalog.samples.values()}
        | {s.table_name for s in catalog.sketches.values()}
        | set(catalog.analyze_meta)
        | set(catalog.partitioned_views)
        | set(catalog.rollups)
        | set(catalog.boilerplate_indexes)
        | set(catalog.quantized_codes)
        | set(catalog.lm_indexes)
    )
    if refresh_stats:
        for t in sorted(base_tables):
            try:
                catalog.upsert_table_stats(t, engine.spark.table(t).count())
            except Exception as exc:
                report.errors.append({"table": t, "error": str(exc)[:200]})

    def _drift(built_against: float | None, current: int | None) -> float | None:
        if not built_against or current is None:
            return None
        return abs(current - built_against) / built_against

    # ---- samples ----
    for name, info in list(catalog.samples.items()):
        report.checked += 1
        current = catalog.get_row_count(info.table_name)
        drift = _drift(_sample_base_population(info), current)
        age = now - info.created_at
        stale_reasons = []
        if drift is not None and drift > max_drift:
            stale_reasons.append(f"drift {drift:.1%} > {max_drift:.0%}")
        elif drift is None and current:
            # unmeasurable baseline (built against an empty table, or a
            # pre-policy artifact) while the base table has rows NOW:
            # "fresh" would let a 0-row sample serve queries forever.
            # Rebuilding records row_count/fraction, so the NEXT run has a
            # real drift baseline — this fires at most once per artifact.
            stale_reasons.append(
                f"no build-time baseline; base table now has {current} rows"
            )
        if max_age_sec is not None and age > max_age_sec:
            stale_reasons.append(f"age {age:.0f}s > {max_age_sec:.0f}s")
        if not stale_reasons:
            if drift is None:
                report.unknown.append(name)
            else:
                report.fresh.append(name)
            continue
        action = {
            "kind": "sample",
            "name": name,
            "table": info.table_name,
            "reason": "; ".join(stale_reasons),
            "dry_run": dry_run,
        }
        if not dry_run:
            try:
                new = engine.sampler.refresh_sample(name)
                action["new_rows"] = new.row_count
            except Exception as exc:
                report.errors.append({"sample": name, "error": str(exc)[:200]})
                continue
        report.refreshed.append(action)

    # ---- sketches ----
    for key, info in list(catalog.sketches.items()):
        report.checked += 1
        built_against = (info.parameters or {}).get("built_row_count")
        current = catalog.get_row_count(info.table_name)
        drift = _drift(built_against, current)
        age = now - info.created_at
        stale_reasons = []
        if drift is not None and drift > max_drift:
            stale_reasons.append(f"drift {drift:.1%} > {max_drift:.0%}")
        elif drift is None and current:
            # pre-policy sketch with no recorded build size: rebuild once —
            # SketchManager.create stamps built_row_count, making drift
            # measurable from the next run on
            stale_reasons.append(
                f"no build-time baseline; base table now has {current} rows"
            )
        if max_age_sec is not None and age > max_age_sec:
            stale_reasons.append(f"age {age:.0f}s > {max_age_sec:.0f}s")
        if not stale_reasons:
            label = f"{info.table_name}.{info.column_name}:{info.sketch_type}"
            if drift is None:
                report.unknown.append(label)
            else:
                report.fresh.append(label)
            continue
        action = {
            "kind": "sketch",
            "table": info.table_name,
            "column": info.column_name,
            "sketch_type": info.sketch_type,
            "reason": "; ".join(stale_reasons),
            "dry_run": dry_run,
        }
        if not dry_run:
            try:
                engine.sketches.create(
                    info.table_name,
                    info.column_name,
                    info.sketch_type,
                    info.parameters,
                )
            except Exception as exc:
                report.errors.append(
                    {"sketch": f"{key}", "error": str(exc)[:200]}
                )
                continue
        report.refreshed.append(action)

    # ---- partitioned layouts (engine.partition_table) ------------------
    # Same drift policy: a layout is a full copy of its base table, so a
    # drifted base means the exact-path routing serves stale data — the
    # one artifact class where staleness IS a wrong answer. Drift-driven
    # maintenance rebuilds in full (growth may touch any bucket);
    # append-only tails should use refresh_partition_layout directly.
    for table, info in sorted(catalog.partitioned_views.items()):
        report.checked += 1
        current = catalog.get_row_count(table)
        drift = _drift(info.get("built_row_count"), current)
        label = f"{table}:partitioned[{info['view']}]"
        if info["view"] == table:
            # a SAMPLE's own partitioned materialization (view == table,
            # sampler._materialize): its freshness is the sample refresh
            # policy's job above — re-materializing re-arms this entry.
            # Rebuilding via partition_table here would derive a
            # layout-of-a-sample under a different view name.
            report.fresh.append(f"{label} (sample-backed)")
            continue
        if drift is None and not current:
            report.unknown.append(label)
            continue
        if drift is not None and drift <= max_drift:
            report.fresh.append(label)
            continue
        action = {
            "kind": "partitioned_layout",
            "table": table,
            "view": info["view"],
            "reason": (
                f"drift {drift:.1%} > {max_drift:.0%}"
                if drift is not None
                else f"no build-time baseline; base table now has {current} rows"
            ),
            "dry_run": dry_run,
        }
        if not dry_run:
            try:
                engine.partition_table(
                    table, info["ts_col"], info["grain"], name=info["view"]
                )
            except Exception as exc:
                report.errors.append({"layout": table, "error": str(exc)[:200]})
                continue
        report.refreshed.append(action)

    # ---- materialized rollups (engine.create_rollup) -------------------
    # Routing guards rollups with a STRICT row-count equality gate (any
    # base-table drift and _route_rollup declines — stale state is never
    # served), so staleness here doesn't risk wrong answers, it silently
    # COSTS the raw-table scan on every would-have-routed query.
    #
    # Repair policy (round 7): APPEND-ONLY drift repairs INCREMENTALLY —
    # when the new rows all land on/after the layout's last date
    # (verified: the source's pre-tail row count equals the layout's own
    # per-date n_rows total, a column-pruned filtered COUNT vs a
    # rollup-sized SUM), only the tail date directories are recomputed
    # (engine.refresh_rollup → dynamic partition overwrite). At 100 TB
    # that's one day's shuffle+write instead of re-materializing years of
    # history. Anything else (shrink, head mutation, verification
    # mismatch) falls back to the full rebuild, which is always sound.
    reprove_scans = 0  # fact scans paid by evidence re-proofs this window
    for table, entries in sorted(catalog.rollups.items()):
        current = catalog.get_row_count(table)
        # finest bucket first: once the hourly rollup is repaired, the
        # daily one's refresh derives from ITS state (engine.
        # refresh_rollup's hierarchical path) instead of re-scanning raw
        for info in sorted(
            entries, key=lambda i: i.get("bucket_seconds", 0)
        ):
            report.checked += 1
            label = f"{table}:rollup[{info['view']}]"
            if current is None:
                report.unknown.append(label)
                continue
            if info.get("built_row_count") == current:
                report.fresh.append(label)
                # fresh state can still carry budget-dark EXACT-tier
                # evidence (refresh-inflated upper bound) — re-prove it
                # under the operator's per-window scan budget
                try:
                    reproved = _reprove_topk_evidence(
                        engine,
                        table,
                        info,
                        dry_run,
                        defer=(
                            max_reprove_scans is not None
                            and reprove_scans >= max_reprove_scans
                        ),
                    )
                except Exception as exc:  # noqa: BLE001
                    report.errors.append(
                        {"rollup": label, "error": str(exc)[:200]}
                    )
                    reproved = None
                if reproved:
                    if not reproved.get("deferred"):
                        reprove_scans += 1
                    report.refreshed.append(reproved)
                continue
            built = info.get("built_row_count")
            incremental = None
            if current > (built or 0):
                incremental = _rollup_tail_repair(engine, info)
            action = {
                "kind": "rollup",
                "table": table,
                "view": info["view"],
                "mode": "incremental" if incremental else "rebuild",
                "reason": (
                    f"base table rows {current} != built against "
                    f"{built} — routing disarmed until "
                    + (
                        f"tail refresh from {incremental}"
                        if incremental
                        else "rebuilt"
                    )
                ),
                "dry_run": dry_run,
            }
            if not dry_run:
                try:
                    if incremental:
                        engine.refresh_rollup(
                            table, view=info["view"], since=incremental
                        )
                    else:
                        engine.create_rollup(
                            table,
                            info["time_col"],
                            info["bucket"],
                            dims=info.get("dims"),
                            measures=info.get("measures"),
                            distinct_cols=info.get("distinct_cols"),
                            hll_lgk=int(info.get("hll_lgk", 12)),
                            quantile_cols=info.get("quantile_cols"),
                            kll_k=int(info.get("kll_k", 200)),
                            topk_cols=info.get("topk_cols"),
                            topk_budget=int(info.get("topk_budget", 1024)),
                            theta_cols=info.get("theta_cols"),
                            theta_lgk=int(info.get("theta_lgk", 12)),
                        )
                except Exception as exc:
                    report.errors.append(
                        {"rollup": label, "error": str(exc)[:200]}
                    )
                    continue
            report.refreshed.append(action)

    # ---- layout compaction (streaming-fed fragmentation) ---------------
    # A file per micro-batch accretes into thousands of small files per
    # bucket; compaction rewrites only the over-threshold buckets (see
    # compact_partition_layout — staged + dynamic-overwrite swap, content
    # unchanged, registered views survive).
    if compact_files_over is not None:
        from approximate_query_engine_spark.operators.partitioning import (
            compact_partition_layout,
        )

        for table, info in sorted(catalog.partitioned_views.items()):
            try:
                stats = compact_partition_layout(
                    engine.spark,
                    info["path"],
                    max_files_per_bucket=compact_files_over,
                    partition_col=info.get("partition_col", "p_bucket"),
                    dry_run=dry_run,
                )
            except Exception as exc:
                report.errors.append(
                    {"compaction": info["view"], "error": str(exc)[:200]}
                )
                continue
            if stats["compacted_buckets"]:
                if not dry_run:
                    # a temp view registered over the layout pinned the
                    # pre-compaction file listing — re-register it so the
                    # next read lists the rewritten buckets
                    try:
                        engine.spark.read.parquet(
                            info["path"]
                        ).createOrReplaceTempView(info["view"])
                    except Exception as exc:
                        report.errors.append(
                            {"compaction": info["view"], "error": str(exc)[:200]}
                        )
                report.refreshed.append(
                    {
                        "kind": "layout_compaction",
                        "table": table,
                        "view": info["view"],
                        **stats,
                        "dry_run": dry_run,
                    }
                )

    # ---- analyze stats (column min/max, histograms, string ndv) --------
    # Stale column stats don't return wrong ANSWERS (selectivity only
    # prices plans), but they silently misprice every estimate — the same
    # drift policy applies: re-run the one-pass analyze when the base
    # table's row count moved more than max_drift since the analyze.
    for table, meta in sorted(list(catalog.analyze_meta.items())):
        report.checked += 1
        current = catalog.get_row_count(table)
        drift = _drift(meta.get("row_count"), current)
        if drift is None:
            report.unknown.append(f"{table}:stats")
            continue
        if drift <= max_drift:
            report.fresh.append(f"{table}:stats")
            continue
        action = {
            "kind": "analyze_stats",
            "table": table,
            "columns": meta.get("columns", []),
            "reason": f"drift {drift:.1%} > {max_drift:.0%}",
            "dry_run": dry_run,
        }
        if not dry_run:
            try:
                engine.analyze_table(table, meta.get("columns") or None)
            except Exception as exc:
                report.errors.append({"stats": table, "error": str(exc)[:200]})
                continue
        report.refreshed.append(action)

    # ---- boilerplate line-frequency indexes (round 12, VERDICT r11 #3)
    # Fed appends keep the index current (update_boilerplate_index sets
    # built_row_count to the docs it accounts for), so drift here means
    # the base table changed WITHOUT being fed through the incremental
    # path — the re-clean trigger: recount from the current table (a
    # full rebuild is the only sound repair for arbitrary mutation; the
    # additive merge is only defined for disjoint appends).
    for table, info in sorted(list(catalog.boilerplate_indexes.items())):
        report.checked += 1
        label = f"{table}:boilerplate[v{info.get('version', 1)}]"
        current = catalog.get_row_count(table)
        drift = _drift(info.get("built_row_count"), current)
        if drift is None:
            report.unknown.append(label)
            continue
        if drift <= max_drift:
            report.fresh.append(label)
            continue
        action = {
            "kind": "boilerplate_index",
            "table": table,
            "reason": (
                f"base table drifted {drift:.1%} > {max_drift:.0%} "
                "without being fed through update_boilerplate_index — "
                "line counts no longer describe the corpus; recounting"
            ),
            "dry_run": dry_run,
        }
        if not dry_run:
            try:
                new = engine.build_boilerplate_index(
                    table,
                    text_col=info["text_col"],
                    id_col=info["id_col"],
                    min_docs=int(info["min_docs"]),
                    min_chars=int(info["min_chars"]),
                )
                action["new_docs"] = new["built_row_count"]
            except Exception as exc:  # noqa: BLE001
                report.errors.append(
                    {"boilerplate_index": table, "error": str(exc)[:200]}
                )
                continue
        report.refreshed.append(action)

    # ---- bigram LM indexes (round 13, VERDICT r12 #1) — the
    # boilerplate arm's shape: fed batches keep the model current
    # (update_lm_index sets built_row_count to the reference docs it
    # accounts for), so drift here means the REFERENCE table changed
    # without being fed — a full re-fit is the only sound repair for
    # arbitrary mutation (the additive merge is only defined for
    # disjoint appends). A stale LM never returns a wrong answer — it
    # scores against yesterday's reference — but its percentile
    # thresholds silently shift as the trusted corpus evolves.
    for table, info in sorted(list(catalog.lm_indexes.items())):
        report.checked += 1
        label = f"{table}:lm[v{info.get('version', 1)}]"
        current = catalog.get_row_count(table)
        drift = _drift(info.get("built_row_count"), current)
        if drift is None:
            report.unknown.append(label)
            continue
        if drift <= max_drift:
            report.fresh.append(label)
            continue
        built = info.get("built_row_count") or 0
        action = {
            "kind": "lm_index",
            "table": table,
            "reason": (
                (
                    f"model accounts for {built} docs but the reference "
                    f"table holds {current} — batches fed through "
                    "update_lm_index were NOT appended to the table "
                    "(the reference-table contract); refitting from the "
                    "table DROPS the out-of-table counts"
                    if current is not None and built > current
                    else f"reference table drifted {drift:.1%} > "
                    f"{max_drift:.0%} without being fed through "
                    "update_lm_index — gram counts no longer describe "
                    "the trusted corpus; refitting"
                )
            ),
            "dry_run": dry_run,
        }
        if not dry_run:
            try:
                new = engine.build_lm_index(
                    table,
                    text_col=info["text_col"],
                    id_col=info["id_col"],
                )
                action["new_docs"] = new["built_row_count"]
                action["vocab_size"] = new["vocab_size"]
            except Exception as exc:  # noqa: BLE001
                report.errors.append(
                    {"lm_index": table, "error": str(exc)[:200]}
                )
                continue
        report.refreshed.append(action)

    # ---- quantized code tables: clamp-drift policy (round 12, r11 #4)
    # Three regimes per appended delta (appended rows = base ids absent
    # from the code table, an anti-join that scans only at maintenance
    # time, never per query):
    # - shrink/mutation (current < built): codes serve ghosts — rebuild
    #   outright, same posture as partitioned layouts (staleness here IS
    #   a wrong answer: a deleted vector can rank as a neighbor).
    # - in-range appends (clamp fraction <= threshold): encode the new
    #   rows with the EXISTING params and append — cheap, exact, keeps
    #   every previously issued code valid.
    # - out-of-range appends (clamp fraction > threshold): the
    #   distribution moved; codes are losing resolution. Re-fit +
    #   re-encode is a full-corpus job, so it is ADVISED and only
    #   applied under apply_advice (budget-gated like the layout
    #   advice); deferral costs approximation quality, never
    #   correctness (clamped codes still rank, just coarser).
    quantizer_refits = 0
    for table, info in sorted(list(catalog.quantized_codes.items())):
        report.checked += 1
        label = f"{table}:quantized[v{info.get('version', 1)}]"
        current = catalog.get_row_count(table)
        built = info.get("built_row_count")
        if current is None or not built:
            report.unknown.append(label)
            continue
        try:
            from pyspark.sql import functions as F

            from approximate_query_engine_spark.functions.quantization import (
                clamp_stats,
                read_ivf_quantized_codes,
                read_quantized_codes,
            )

            is_ivf = info.get("kind") == "ivf"
            if is_ivf:
                codes, quant, cents = read_ivf_quantized_codes(
                    engine.spark, info["path"]
                )
            else:
                codes, quant = read_quantized_codes(
                    engine.spark, info["path"]
                )
            id_col, vec_col = info["id_col"], info["vec_col"]
            base = engine.spark.table(table)
            # cheap change signal (r13 ADVICE): the base table's input
            # FILE LISTING. Spark writers never mutate a file in place —
            # every overwrite/append lands new part- names — so an
            # unchanged sorted listing at an unchanged row count proves
            # the table cannot have mutated, and the ghost-probe join
            # can be skipped for it. Tables with no file lineage (temp
            # views over in-memory frames return an empty listing) keep
            # the every-sweep probe: no signal means no proof.
            sig = None
            try:
                files = sorted(base.inputFiles())
                if files:
                    import hashlib

                    sig = hashlib.md5(
                        "\n".join(files).encode()
                    ).hexdigest()
            except Exception:  # noqa: BLE001 - signal is best-effort
                sig = None
            ghosts = 0
            if current >= built:
                if (
                    current == built
                    and sig is not None
                    and sig == info.get("base_files_sig")
                ):
                    pass  # provably unchanged — probe skipped
                else:
                    # the ghost probe otherwise runs on EVERY sweep
                    # (r12 ADVICE): growth can MASK deletions (drop 10
                    # ids, add 20) and an equal-count mutation (delete
                    # N, insert N) is invisible to row counts entirely
                    # — unlike rollup staleness this surface returns
                    # WRONG NEIGHBORS, not a coarser approximation, and
                    # the anti-join is cheap at maintenance cadence
                    # (limit-1 short-circuit)
                    ghosts = (
                        codes.select(F.col(id_col))
                        .join(
                            base.select(F.col(id_col)), id_col, "left_anti"
                        )
                        .limit(1)
                        .count()
                    )
            if current == built and not ghosts:
                if sig is not None and sig != info.get("base_files_sig"):
                    # a clean probe under a NEW listing arms the skip
                    # for the next sweep
                    info["base_files_sig"] = sig
                    catalog.save()
                report.fresh.append(label)
                continue
            if current < built or ghosts:
                mode, frac = "rebuild", None
                reason = (
                    (
                        f"base table shrank ({current} < built {built})"
                        if current < built
                        else "base table mutated (code table holds ids "
                        "the base no longer has"
                        + (
                            " at an unchanged row count"
                            if current == built
                            else " under growth"
                        )
                        + ")"
                    )
                    + " — the code table serves vectors that no longer "
                    "exist; rebuilding"
                )
            else:
                appended = base.join(
                    codes.select(F.col(id_col)), id_col, "left_anti"
                )
                row = (
                    clamp_stats(appended, quant, vec_col)
                    .agg(
                        F.coalesce(F.sum("clamped"), F.lit(0)).alias("c"),
                        F.coalesce(F.sum("n"), F.lit(0)).alias("n"),
                    )
                    .collect()[0]
                )
                frac = (
                    float(row["c"]) / float(row["n"]) if row["n"] else 0.0
                )
                threshold = float(info.get("clamp_threshold", 0.005))
                if frac > threshold:
                    mode = "refit"
                    reason = (
                        f"appended rows clamp at {frac:.2%} > "
                        f"{threshold:.2%} — the value distribution "
                        "moved past the fitted range; codes are losing "
                        "resolution. Re-fit + re-encode advised"
                    )
                else:
                    mode = "encode_append"
                    reason = (
                        f"appended rows clamp at {frac:.2%} <= "
                        f"{float(info.get('clamp_threshold', 0.005)):.2%}"
                        " — encoding them with the existing params"
                    )
            action = {
                "kind": "quantized_codes",
                "table": table,
                "mode": mode,
                "appended_clamp_fraction": frac,
                "reason": reason,
                "dry_run": dry_run,
            }
            if dry_run:
                report.refreshed.append(action)
                continue
            if mode == "encode_append":
                if is_ivf:
                    # new rows are ASSIGNED into their coarse buckets
                    # and appended partition-wise — probes keep pruning
                    from approximate_query_engine_spark.functions.quantization import (  # noqa: E501
                        ivf_assign_quantized,
                    )

                    (
                        ivf_assign_quantized(
                            appended,
                            quant,
                            cents,
                            id_col=id_col,
                            vec_col=vec_col,
                        )
                        .write.mode("append")
                        .partitionBy("centroid_id")
                        .parquet(info["path"])
                    )
                else:
                    (
                        appended.select(
                            F.col(id_col),
                            quant.encode_expr(vec_col).alias("codes"),
                        )
                        .write.mode("append")
                        .parquet(info["path"])
                    )
                info["built_row_count"] = int(current)
                if sig is not None:
                    info["base_files_sig"] = sig
                catalog.save()
            elif mode == "rebuild" or (
                apply_advice and quantizer_refits < advice_max_apply
            ):
                common = dict(
                    vec_col=vec_col,
                    id_col=id_col,
                    levels=int(info.get("levels", 256)),
                    sample_fraction=info.get("sample_fraction"),
                    seed=int(info.get("seed", 42)),
                    clamp_threshold=float(
                        info.get("clamp_threshold", 0.005)
                    ),
                )
                if is_ivf:
                    engine.build_ivf_codes(
                        table,
                        nlist=int(info.get("nlist", 16)),
                        sample_rows=int(info.get("sample_rows", 10_000)),
                        # carry the operator's skew knob through the
                        # rebuild/refit — re-registering with the 8.0
                        # default would silently disarm a tighter
                        # policy (round-13 review finding)
                        skew_threshold=float(
                            info.get("skew_threshold", 8.0)
                        ),
                        **common,
                    )
                else:
                    engine.build_quantized_codes(table, **common)
                if sig is not None:
                    # arm the skip for the rebuilt entry (a fresh dict —
                    # the old info's signature died with it)
                    catalog.quantized_codes[table]["base_files_sig"] = sig
                    catalog.save()
                if mode == "refit":
                    quantizer_refits += 1
            else:
                action["deferred"] = True
                action["reason"] += (
                    " (apply_advice off or budget exhausted — deferred; "
                    "clamped codes still rank, just coarser)"
                )
            report.refreshed.append(action)
        except Exception as exc:  # noqa: BLE001
            report.errors.append(
                {"quantized_codes": table, "error": str(exc)[:200]}
            )

    # ---- IVF bucket-skew policy (round 13, VERDICT r12 #4) — the
    # clamp policy's sibling for the COARSE geometry. Appends are
    # assigned into their nearest trained bucket, so a drifting corpus
    # piles new vectors into few buckets and probe cost creeps silently
    # (a probed query pays its buckets' POPULATION — the fat bucket
    # makes every query touching it scan a growing corpus fraction).
    # Runs AFTER the clamp arm so it measures the state this sweep
    # actually left behind (appends encoded, rebuilds done). Skew is a
    # probe-COST trade, never correctness (nearest-trained-centroid
    # assignment stays sound), so the re-train is ADVISED and only
    # applied under apply_advice, sharing the refit budget.
    for table, info in sorted(list(catalog.quantized_codes.items())):
        if info.get("kind") != "ivf":
            continue
        try:
            from approximate_query_engine_spark.functions.quantization import (  # noqa: E501
                ivf_bucket_skew,
                ivf_bucket_skew_from_footers,
            )

            # metadata-only probe (round 14, VERDICT r13 #6): parquet
            # footer row counts per centroid_id directory — a driver
            # side file-listing pass, no Spark job; value-identical to
            # the scan form (test-pinned), which stays as the fallback
            try:
                skew = ivf_bucket_skew_from_footers(
                    engine.spark,
                    info["path"],
                    nlist=int(info.get("nlist", 0)) or None,
                )
            except Exception:  # noqa: BLE001 - fall back to the scan
                skew = ivf_bucket_skew(
                    engine.spark.read.parquet(info["path"]),
                    nlist=int(info.get("nlist", 0)) or None,
                )
            threshold = float(info.get("skew_threshold", 8.0))
            if skew["ratio"] <= threshold:
                continue  # balanced — the entry already reported above
            action = {
                "kind": "ivf_bucket_skew",
                "table": table,
                "bucket_skew": skew,
                "reason": (
                    f"fat bucket holds {skew['ratio']:.1f}x the balanced "
                    f"per-bucket population (> {threshold:.1f}x) — "
                    "appends drifted from the trained coarse geometry; "
                    "probes over the fat bucket scan a growing corpus "
                    "fraction. Coarse re-train advised (probe cost, "
                    "never correctness)"
                ),
                "dry_run": dry_run,
            }
            if dry_run:
                report.refreshed.append(action)
                continue
            if apply_advice and quantizer_refits < advice_max_apply:
                engine.build_ivf_codes(
                    table,
                    vec_col=info["vec_col"],
                    id_col=info["id_col"],
                    nlist=int(info.get("nlist", 16)),
                    levels=int(info.get("levels", 256)),
                    sample_fraction=info.get("sample_fraction"),
                    sample_rows=int(info.get("sample_rows", 10_000)),
                    seed=int(info.get("seed", 42)),
                    clamp_threshold=float(
                        info.get("clamp_threshold", 0.005)
                    ),
                    skew_threshold=threshold,
                    retrain=True,
                )
                quantizer_refits += 1
                new_info = catalog.quantized_codes[table]
                action["retrained_skew"] = ivf_bucket_skew(
                    engine.spark.read.parquet(new_info["path"]),
                    nlist=int(new_info.get("nlist", 0)) or None,
                )
            else:
                action["deferred"] = True
                action["reason"] += (
                    " (apply_advice off or budget exhausted — deferred; "
                    "probe cost creeps, answers stay correct)"
                )
            report.refreshed.append(action)
        except Exception as exc:  # noqa: BLE001
            report.errors.append(
                {"ivf_bucket_skew": table, "error": str(exc)[:200]}
            )

    # ---- theta key-encoding migration (round 15, VERDICT r14 #4) — the
    # v1 rollup theta state hashes CAST(key AS STRING); the v2 native
    # encoding drops the per-row string materialization (~18% of every
    # sketch-build scan at 120M rows). Encodings hash different byte
    # spaces, so a layout flips ONLY via a full rebuild under the SAME
    # advised-action budget as quantizer refits (a migration is a cost
    # trade, never correctness: certified routed answers are exact-regime
    # counts, identical under either encoding). v1 layouts keep serving
    # until their migration is applied — there is no window where mixed
    # encodings could union.
    theta_migrations = 0
    for table in sorted(list(catalog.rollups.keys())):
        for info in list(catalog.rollups.get(table, [])):
            tcols = list(info.get("theta_cols") or [])
            if not tcols or info.get("theta_key_native"):
                continue
            if not engine._theta_native_ok(table, tcols):
                continue  # type not natively hashable — v1 is correct
            action = {
                "kind": "theta_key_encoding",
                "table": table,
                "view": info["view"],
                "theta_cols": tcols,
                "reason": (
                    "theta state hashes CAST(key AS STRING); native "
                    "key encoding drops the per-row cast from every "
                    "build/refresh scan. Full rebuild advised (cost, "
                    "never correctness — certified answers identical)"
                ),
                "dry_run": dry_run,
            }
            if dry_run:
                report.refreshed.append(action)
                continue
            if apply_advice and theta_migrations < advice_max_apply:
                try:
                    engine.create_rollup(
                        table,
                        info["time_col"],
                        info["bucket"],
                        dims=list(info.get("dims", [])),
                        measures=list(info.get("measures", [])),
                        distinct_cols=list(info.get("distinct_cols", [])),
                        hll_lgk=int(info.get("hll_lgk", 12)),
                        quantile_cols=list(info.get("quantile_cols", [])),
                        kll_k=int(info.get("kll_k", 200)),
                        topk_cols=list(info.get("topk_cols", [])),
                        topk_budget=int(info.get("topk_budget", 1024)),
                        theta_cols=tcols,
                        theta_lgk=int(info.get("theta_lgk", 12)),
                        theta_key_native=True,
                        # migration must NOT derive from a sibling
                        # rollup's v1-encoded state — the rebuild's
                        # whole point is a fresh hash space from raw
                        derive=False,
                    )
                    theta_migrations += 1
                    action["migrated"] = True
                except Exception as exc:  # noqa: BLE001
                    action["error"] = str(exc)[:200]
            else:
                action["deferred"] = True
                action["reason"] += (
                    " (apply_advice off or budget exhausted — deferred; "
                    "v1 state keeps serving correctly)"
                )
            report.refreshed.append(action)

    if apply_advice and not dry_run:
        try:
            report.rollup_advice_applied = engine.apply_rollup_advice(
                max_apply=advice_max_apply,
                max_state_rows=advice_max_state_rows,
            )
        except Exception as exc:  # noqa: BLE001 - advice never fails sweep
            report.errors.append(
                {"advisor": "apply_rollups", "error": str(exc)[:200]}
            )
        try:
            report.layout_advice_applied = engine.apply_layout_advice(
                max_apply=advice_max_apply,
                max_buckets=advice_max_buckets,
            )
        except Exception as exc:  # noqa: BLE001 - advice never fails sweep
            report.errors.append(
                {"advisor": "apply_layouts", "error": str(exc)[:200]}
            )
    try:
        # recomputed AFTER any apply so the report shows what is STILL
        # unmaterialized (advice converges to empty once followed)
        report.rollup_recommendations = engine.recommend_rollups()
    except Exception as exc:  # noqa: BLE001 - advice never fails the sweep
        report.errors.append({"advisor": "rollups", "error": str(exc)[:200]})
    try:
        report.layout_recommendations = (
            engine.recommend_partition_layouts()
        )
    except Exception as exc:  # noqa: BLE001 - advice never fails the sweep
        report.errors.append({"advisor": "layouts", "error": str(exc)[:200]})
    catalog.save()
    return report.to_dict()
