"""Property-based tests (hypothesis): parser round-trips and estimator
invariants — the SURVEY §5 'bonus' tier."""

from hypothesis import given, settings
from hypothesis import strategies as st

from approximate_query_engine_spark.planner import sampling_error
from approximate_query_engine_spark.sampler import Sampler
from approximate_query_engine_spark.sqlparser import parse

ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
agg_fn = st.sampled_from(["COUNT", "SUM", "AVG", "MIN", "MAX"])


@st.composite
def agg_query(draw):
    table = draw(ident)
    n_aggs = draw(st.integers(1, 3))
    items = []
    for i in range(n_aggs):
        fn = draw(agg_fn)
        arg = "*" if fn == "COUNT" and draw(st.booleans()) else draw(ident)
        alias = draw(st.one_of(st.none(), ident))
        items.append(f"{fn}({arg})" + (f" AS {alias}" if alias else ""))
    group_cols = draw(st.lists(ident, min_size=0, max_size=2, unique=True))
    sql = "SELECT "
    if group_cols:
        sql += ", ".join(group_cols) + ", "
    sql += ", ".join(items) + f" FROM {table}"
    if draw(st.booleans()):
        sql += f" WHERE {draw(ident)} > {draw(st.integers(0, 100))}"
    if group_cols:
        sql += " GROUP BY " + ", ".join(group_cols)
    if draw(st.booleans()):
        sql += f" LIMIT {draw(st.integers(1, 50))}"
    return sql


@given(agg_query())
@settings(max_examples=200, deadline=None)
def test_parser_roundtrip_stable(sql):
    """parse → render → parse is a fixed point (same structure both times)."""
    p1 = parse(sql)
    rendered = p1.render()
    p2 = parse(rendered)
    assert p2.render() == rendered
    assert p2.table == p1.table
    assert len(p2.select_items) == len(p1.select_items)
    assert [a.func for a in p2.aggregates] == [a.func for a in p1.aggregates]
    assert p2.group_by == p1.group_by
    assert p2.limit == p1.limit


@given(st.integers(1, 10**9), st.floats(1e-6, 1.0, exclude_max=False))
@settings(max_examples=200, deadline=None)
def test_sampling_error_monotone(n, f):
    """Error shrinks (weakly) as the sample grows; always positive."""
    e = sampling_error(n, f)
    assert e > 0
    assert sampling_error(n, min(1.0, f * 2)) <= e + 1e-12
    assert sampling_error(n * 2, f) <= e + 1e-12


@st.composite
def cdf_and_probes(draw):
    """An empirical CDF like analyze_table stores (nondecreasing x, F from
    0 to 1; repeated x encodes point masses) plus probe values."""
    import math

    xs = sorted(
        draw(
            st.lists(
                st.floats(-1e6, 1e6, allow_nan=False, width=32),
                min_size=2,
                max_size=20,
            )
        )
    )
    fs = sorted(
        draw(
            st.lists(
                st.floats(0.0, 1.0, allow_nan=False),
                min_size=len(xs) - 2,
                max_size=len(xs) - 2,
            )
        )
    ) if len(xs) > 2 else []
    cdf = list(zip(xs, [0.0] + fs + [1.0]))
    probes = draw(
        st.lists(
            st.floats(-2e6, 2e6, allow_nan=False, width=32),
            min_size=1,
            max_size=5,
        )
    )
    assert not any(math.isnan(x) for x in xs)
    return cdf, probes


@given(cdf_and_probes())
@settings(max_examples=300, deadline=None)
def test_histogram_fraction_invariants(data):
    """The CDF interpolator behind range selectivity: bounded to [0,1],
    monotone in the probe, strict ≤ inclusive at the same probe (the point
    mass at v belongs to `<=` but not `<`), and exact at the domain ends."""
    from approximate_query_engine_spark.planner import histogram_fraction_leq

    cdf, probes = data
    lo, hi = cdf[0][0], cdf[-1][0]
    prev = None
    for v in sorted(probes):
        inc = histogram_fraction_leq(cdf, v, inclusive=True)
        strict = histogram_fraction_leq(cdf, v, inclusive=False)
        assert 0.0 <= strict <= inc <= 1.0
        if prev is not None:
            assert inc >= prev - 1e-12  # monotone in v
        prev = inc
        if v < lo:
            assert inc == 0.0
        if v > hi:
            assert strict == 1.0
    assert histogram_fraction_leq(cdf, hi, inclusive=True) == 1.0
    assert histogram_fraction_leq(cdf, lo, inclusive=False) == 0.0


@given(
    st.lists(
        st.tuples(
            st.integers(1, 10**6),  # pop_size
            st.one_of(st.none(), st.floats(0, 1e6, allow_nan=False)),  # variance
        ),
        min_size=1,
        max_size=8,
    ),
    st.floats(0.001, 0.999),
)
@settings(max_examples=200, deadline=None)
def test_neyman_allocation_invariants(raw, total_fraction):
    strata = [
        {"strata_value": f"s{i}", "pop_size": p, "variance": v}
        for i, (p, v) in enumerate(raw)
    ]
    alloc = Sampler.neyman_allocation(strata, total_fraction)
    assert set(alloc) == {f"s{i}" for i in range(len(raw))}
    for f in alloc.values():
        assert 0.0 <= f <= 1.0  # capped
    # zero-variance everywhere → proportional fallback
    flat = [
        {"strata_value": s["strata_value"], "pop_size": s["pop_size"], "variance": 0.0}
        for s in strata
    ]
    assert Sampler.neyman_allocation(flat, total_fraction) == {
        s["strata_value"]: total_fraction for s in strata
    }
    # uncapped case preserves the target sample size
    uncapped = all(f < 1.0 for f in alloc.values())
    if uncapped:
        target = total_fraction * sum(s["pop_size"] for s in strata)
        achieved = sum(
            alloc[s["strata_value"]] * s["pop_size"] for s in strata
        )
        assert abs(achieved - target) / target < 1e-6


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )


@given(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e", "ab c", ""]), max_size=40)
)
@settings(max_examples=30, deadline=None)
def test_top_count_matches_counter(arr):
    """top_count_expr (sorted run-length form) == collections.Counter max
    count, for arbitrary small string arrays including duplicates, empty
    strings, and the empty array."""
    import collections

    from pyspark.sql import functions as F

    from approximate_query_engine_spark.functions.text import top_count_expr

    spark = _session()
    df = spark.createDataFrame([(arr,)], "arr array<string>")
    got = df.select(top_count_expr(F.col("arr")).alias("t")).collect()[0]["t"]
    want = max(collections.Counter(arr).values()) if arr else 0
    assert got == want


# ---- sequence packing invariants (pure-python replay of the window rule) --
@given(
    st.lists(st.integers(1, 3000), min_size=1, max_size=200),
    st.integers(64, 2048),
)
@settings(max_examples=200, deadline=None)
def test_packing_rule_invariants(tokens, seq_len):
    """The streaming boundary rule, replayed in python: offsets stay in
    [0, seq_len), pack ids are non-decreasing, every non-final pack's
    starts-here token total reaches past its boundary, and totals are
    conserved."""
    cum = 0
    prev_pack = 0
    per_pack: dict[int, int] = {}
    first_offset: dict[int, int] = {}
    for t in tokens:
        pack = cum // seq_len
        offset = cum % seq_len
        assert 0 <= offset < seq_len
        assert pack >= prev_pack
        # decomposition invariant: pack/offset reconstruct the cumsum
        assert pack * seq_len + offset == cum
        prev_pack = pack
        per_pack[pack] = per_pack.get(pack, 0) + t
        first_offset.setdefault(pack, offset)
        cum += t
    assert sum(per_pack.values()) == sum(tokens)
    last = max(per_pack)
    for p, tot in per_pack.items():
        if p != last:
            # docs starting in pack p carry the running total past the
            # next boundary (else the next doc would still start in p)
            assert first_offset[p] + tot >= seq_len


def test_packing_spark_matches_python_replay(spark):
    """The Spark window implementation equals the python replay on a
    randomized (but fixed-seed) corpus."""
    import random

    from approximate_query_engine_spark.functions.packing import pack_sequences

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 900)) for i in range(300)]
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(
            spark.createDataFrame(rows, "doc_id long, n_tokens int"), 512
        ).collect()
    }
    cum = 0
    for i, t in rows:
        assert got[i] == (cum // 512, cum % 512), i
        cum += t


@given(agg_query())
@settings(max_examples=200, deadline=None)
def test_per_row_work_nonnegative_and_monotone(sql):
    """per_row_agg_work is >= 0 for every parseable aggregate query, and
    appending one more aggregate to the select list never DECREASES the
    work estimate (each aggregate adds work; none subtracts)."""
    from approximate_query_engine_spark.planner import per_row_agg_work

    p = parse(sql)
    w = per_row_agg_work(p)
    assert w >= 0.0
    extended = sql.replace(" FROM ", ", SUM(zz) AS __extra FROM ", 1)
    w2 = per_row_agg_work(parse(extended))
    assert w2 >= w


@given(agg_query(), st.floats(0.01, 0.5))
@settings(max_examples=100, deadline=None)
def test_inline_never_cheaper_than_prebuilt_at_same_fraction(sql, f):
    """Cost-model ordering invariant across the whole grammar: at any
    fraction and any per-row work, a pre-built sample (scan f·N) must
    cost no more than the inline predicate (scan N + filter)."""
    from approximate_query_engine_spark.planner import (
        inline_sample_cost,
        per_row_agg_work,
        sample_cost,
    )

    w = per_row_agg_work(parse(sql))
    n = 1_000_000
    assert sample_cost(n, f, work=w) <= inline_sample_cost(n, f, work=w)


@st.composite
def column_stats(draw):
    """Random but coherent analyze_table output for one numeric column:
    (cdf, null_frac, ndv) over a bounded domain."""
    xs = sorted(
        set(
            draw(
                st.lists(
                    st.integers(-1000, 1000), min_size=2, max_size=12
                )
            )
        )
    )
    if len(xs) < 2:
        xs = [0, 1]
    fs = (
        sorted(
            draw(
                st.lists(
                    st.floats(0.0, 1.0, allow_nan=False),
                    min_size=len(xs) - 2,
                    max_size=len(xs) - 2,
                )
            )
        )
        if len(xs) > 2
        else []
    )
    cdf = list(zip([float(x) for x in xs], [0.0] + fs + [1.0]))
    # keep nf off the clamp rails so IS NULL + IS NOT NULL sums exactly
    nf = draw(st.floats(0.05, 0.95))
    ndv = draw(st.integers(2, 100_000))
    return cdf, nf, ndv


@given(
    column_stats(),
    st.lists(st.integers(-1500, 1500), min_size=1, max_size=4),
)
@settings(max_examples=200, deadline=None)
def test_where_selectivity_invariants(stats, lits):
    """Clause-level invariants of estimate_selectivity over random
    analyze output and literals: clamped to [0.01, 1], range estimates
    monotone in the cut, IN-lists monotone in the value set and
    duplicate-blind, IS NULL / IS NOT NULL complementary, and a
    conjunction never exceeds its cheapest part."""
    import tempfile

    from approximate_query_engine_spark.catalog import Catalog
    from approximate_query_engine_spark.planner import estimate_selectivity

    cdf, nf, ndv = stats
    cat = Catalog(tempfile.mkdtemp(prefix="aqe_selprop_"))
    cat.upsert_table_stats("t", 1_000_000)
    cat.upsert_column_minmax("t", "v", cdf[0][0], cdf[-1][0])
    cat.upsert_column_histogram("t", "v", cdf)
    cat.upsert_column_null_frac("t", "v", nf)
    cat.upsert_column_ndv("t", "v", ndv)

    def est(w):
        out = estimate_selectivity(
            parse(f"SELECT COUNT(*) AS c FROM t WHERE {w}"), cat
        )
        assert 0.01 <= out <= 1.0, (w, out)
        return out

    a, eps = sorted(lits)[0], 1e-9
    for lo, hi in zip(sorted(lits), sorted(lits)[1:]):
        assert est(f"v <= {lo}") <= est(f"v <= {hi}") + eps
    # IN monotone in the set, blind to duplicates
    vals = sorted(set(lits))
    in_all = est(f"v IN ({', '.join(map(str, vals))})")
    assert est(f"v IN ({vals[0]})") <= in_all + eps
    dup = est(f"v IN ({vals[0]}, {vals[0]})")
    assert dup == est(f"v IN ({vals[0]})")
    # null complement (nf chosen off the clamp rails)
    assert abs(est("v IS NULL") + est("v IS NOT NULL") - 1.0) < 1e-9
    # a conjunction never exceeds its cheapest part
    conj = est(f"v <= {a} AND v IS NOT NULL")
    assert conj <= min(est(f"v <= {a}"), est("v IS NOT NULL")) + eps


@given(
    column_stats(),
    st.lists(st.integers(-1500, 1500), min_size=2, max_size=4),
)
@settings(max_examples=100, deadline=None)
def test_paren_and_groups_price_like_flat(stats, lits):
    """Round-6 grammar extension: parentheses that enclose only AND-joined
    simple predicates are flattened before the split, so the estimate
    equals the paren-free clause's — while OR/NOT inside a group still
    falls back to the conservative default (precedence could change)."""
    import tempfile

    from approximate_query_engine_spark.catalog import Catalog
    from approximate_query_engine_spark.planner import (
        WHERE_SELECTIVITY_DEFAULT,
        estimate_selectivity,
    )

    cdf, nf, ndv = stats
    cat = Catalog(tempfile.mkdtemp(prefix="aqe_parenprop_"))
    cat.upsert_table_stats("t", 1_000_000)
    cat.upsert_column_minmax("t", "v", cdf[0][0], cdf[-1][0])
    cat.upsert_column_histogram("t", "v", cdf)
    cat.upsert_column_null_frac("t", "v", nf)
    cat.upsert_column_ndv("t", "v", ndv)

    def est(w):
        return estimate_selectivity(
            parse(f"SELECT COUNT(*) AS c FROM t WHERE {w}"), cat
        )

    lo, hi = min(lits), max(lits)
    flat = f"v >= {lo} AND v <= {hi} AND v IS NOT NULL"
    assert est(f"({flat})") == est(flat)
    assert est(f"(v >= {lo} AND v <= {hi}) AND v IS NOT NULL") == est(flat)
    assert est(f"(v >= {lo}) AND (v <= {hi}) AND (v IS NOT NULL)") == est(flat)
    assert est(f"((v >= {lo} AND v <= {hi})) AND v IS NOT NULL") == est(flat)
    # paren-wrapped IN-lists flatten too (members became markers first)
    assert est(f"(v IN ({lo}, {hi}) AND v IS NOT NULL)") == est(
        f"v IN ({lo}, {hi}) AND v IS NOT NULL"
    )
    # OR inside a group next to AND could change precedence — fallback
    assert (
        est(f"(v <= {lo} OR v >= {hi}) AND v IS NOT NULL")
        == WHERE_SELECTIVITY_DEFAULT
    )
    # NOT scope is never flattened away
    assert est(f"NOT (v <= {lo})") == WHERE_SELECTIVITY_DEFAULT


def test_paren_and_groups_route_partitions():
    """derive_bucket_predicate handles parenthesized AND-groups (the
    routine BI-generated shape) and still refuses OR groups and
    subqueries."""
    from approximate_query_engine_spark.operators.partitioning import (
        derive_bucket_predicate,
    )

    flat = (
        "ts >= TIMESTAMP '2024-01-03 00:00:00' AND "
        "ts < TIMESTAMP '2024-01-06 00:00:00'"
    )
    want = derive_bucket_predicate(flat, "ts", "day")
    assert want == "p_bucket >= '2024-01-03' AND p_bucket <= '2024-01-06'"
    assert derive_bucket_predicate(f"({flat})", "ts", "day") == want
    assert (
        derive_bucket_predicate(
            "(ts >= TIMESTAMP '2024-01-03 00:00:00') AND "
            "(ts < TIMESTAMP '2024-01-06 00:00:00') AND (user_id = 5)",
            "ts",
            "day",
        )
        == want
    )
    # OR anywhere: no derivation
    assert (
        derive_bucket_predicate(
            f"({flat}) OR user_id = 5", "ts", "day"
        )
        is None
    )
    # subquery parens stay: no derivation
    assert (
        derive_bucket_predicate(
            "user_id IN (SELECT user_id FROM other "
            "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00')",
            "ts",
            "day",
        )
        is None
    )


@given(
    lit=st.text(
        alphabet=st.sampled_from(list("ab ()ANDOR=<>")), max_size=24
    ),
    v=st.integers(-5, 5),
    wrap=st.booleans(),
)
@settings(max_examples=150, deadline=None)
def test_flatten_and_parens_never_touches_string_literals(lit, v, wrap):
    """Round-7 (VERDICT r6 #6): flatten_and_parens masks quoted literals
    before its paren scan, so a literal whose CONTENT looks like boolean
    context ('x AND (y = 2) AND z') can never have its parens stripped —
    every literal in the output is byte-identical to the input, and the
    clause's semantics are unchanged (DuckDB oracle on both forms)."""
    import re as _re

    import duckdb

    from approximate_query_engine_spark.sqlparser import flatten_and_parens

    quoted = lit.replace("'", "''")
    base = f"note = '{quoted}' AND v >= {v} AND v <= {v + 3}"
    where = f"({base})" if wrap else base

    flat = flatten_and_parens(where)
    lits_in = _re.findall(r"'[^']*'", where)
    lits_out = _re.findall(r"'[^']*'", flat)
    assert lits_in == lits_out, (where, flat)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            f"('{quoted}', {x})" for x in range(-6, 7)
        )
        + ") AS v(note, v)"
    )
    a = con.execute(f"SELECT COUNT(*) FROM t WHERE {where}").fetchone()
    b = con.execute(f"SELECT COUNT(*) FROM t WHERE {flat}").fetchone()
    assert a == b, (where, flat)
    con.close()
