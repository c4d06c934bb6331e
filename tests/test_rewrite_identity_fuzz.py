"""Differential fuzz of the single rewrite point (SURVEY §2.7): at full
sampling the rewrite must be the identity.

For a grammar of aggregate queries over the real lineitem table,
``rewrite_systematic_sample(k=1)`` (predicate ``key % 1 = 0`` keeps every
row, scale factor 1) and ``rewrite_inline_sample(fraction=1.0)``
(``rand(seed) < 1.0`` keeps every row, scale 1/1) must reproduce the exact
results bit-for-bit on counts and to float tolerance on sums/avgs. This
catches alias-substitution, double-scaling, HAVING-rewrite and
column-ordering bugs across the whole supported query surface, not just
the handful of hand-written cases."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from approximate_query_engine_spark.rewriter import (
    rewrite_inline_sample,
    rewrite_systematic_sample,
)
from approximate_query_engine_spark.sqlparser import parse

GROUP_COLS = ["l_returnflag", "l_linestatus"]
NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@st.composite
def lineitem_agg_query(draw):
    n_aggs = draw(st.integers(1, 3))
    items = []
    for i in range(n_aggs):
        fn = draw(st.sampled_from(["COUNT", "SUM", "AVG", "MIN", "MAX"]))
        arg = "*" if fn == "COUNT" else draw(st.sampled_from(NUM_COLS))
        items.append(f"{fn}({arg}) AS a{i}")
    group_cols = draw(
        st.lists(st.sampled_from(GROUP_COLS), min_size=0, max_size=2, unique=True)
    )
    sql = "SELECT "
    if group_cols:
        sql += ", ".join(group_cols) + ", "
    sql += ", ".join(items) + " FROM lineitem"
    if draw(st.booleans()):
        thr = draw(st.integers(0, 50))
        sql += f" WHERE l_quantity > {thr}"
    if group_cols:
        sql += " GROUP BY " + ", ".join(group_cols)
        if draw(st.booleans()):
            sql += " HAVING COUNT(*) > 1"
    return sql


def _rows_by_key(df, group_cols, agg_aliases):
    out = {}
    for r in df.collect():
        d = r.asDict()
        key = tuple(d[g] for g in group_cols)
        out[key] = [d[a] for a in agg_aliases]
    return out


def _assert_close(name, exact, rewritten):
    assert rewritten.keys() == exact.keys(), f"{name}: group keys differ"
    for key, evals in exact.items():
        for a, b in zip(evals, rewritten[key]):
            if a is None or b is None:
                assert a == b, f"{name} {key}: {a} vs {b}"
            else:
                fa, fb = float(a), float(b)
                assert math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9), (
                    f"{name} {key}: exact={a} rewritten={b}"
                )


@pytest.mark.usefixtures("engine")
@given(sql=lineitem_agg_query())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_full_fraction_rewrite_is_identity(spark, sql):
    parsed = parse(sql)
    group_cols = parsed.group_by
    aliases = [f"a{i}" for i in range(len(parsed.aggregates))]

    exact = _rows_by_key(spark.sql(sql), group_cols, aliases)

    sys_sql = rewrite_systematic_sample(parsed, k=1, key_expr="l_orderkey").sql
    _assert_close(
        "systematic k=1",
        exact,
        _rows_by_key(spark.sql(sys_sql), group_cols, aliases),
    )

    inline_sql = rewrite_inline_sample(parsed, fraction=1.0).sql
    _assert_close(
        "inline f=1.0",
        exact,
        _rows_by_key(spark.sql(inline_sql), group_cols, aliases),
    )


DIM_COLS = ["o.o_orderstatus", "o.o_orderpriority"]
FACT_NUM = ["l.l_quantity", "l.l_extendedprice", "l.l_discount"]


@st.composite
def join_agg_query(draw):
    n_aggs = draw(st.integers(1, 3))
    items = []
    for i in range(n_aggs):
        fn = draw(st.sampled_from(["COUNT", "SUM", "AVG", "MIN", "MAX"]))
        arg = "*" if fn == "COUNT" else draw(
            st.sampled_from(FACT_NUM + ["o.o_totalprice"])
        )
        items.append(f"{fn}({arg}) AS a{i}")
    group_cols = draw(
        st.lists(st.sampled_from(DIM_COLS), min_size=0, max_size=2, unique=True)
    )
    sql = "SELECT "
    if group_cols:
        sql += ", ".join(group_cols) + ", "
    sql += ", ".join(items) + (
        " FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    )
    if draw(st.booleans()):
        sql += f" WHERE l.l_quantity > {draw(st.integers(0, 40))}"
    if group_cols:
        sql += " GROUP BY " + ", ".join(group_cols)
        if draw(st.booleans()):
            sql += " HAVING COUNT(*) > 1"
    return sql, [g.split(".")[1] for g in group_cols]


@pytest.mark.usefixtures("engine")
@given(data=join_agg_query())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_full_fraction_join_rewrite_is_identity_fuzz(spark, data):
    """rewrite_join_fact_sample at k=1 (keep every fact row, scale 1)
    must reproduce the exact join results across the whole grammar —
    including dim-column aggregates and HAVING."""
    from approximate_query_engine_spark.rewriter import (
        rewrite_join_fact_sample,
    )
    from approximate_query_engine_spark.sqlparser import parse_join

    sql, group_cols = data
    jq = parse_join(sql)
    aliases = [f"a{i}" for i in range(len(jq.aggregates))]
    exact = _rows_by_key(spark.sql(sql), group_cols, aliases)
    rw = rewrite_join_fact_sample(
        jq, "lineitem", k=1, key_expr="l_orderkey"
    )
    _assert_close(
        "join k=1", exact, _rows_by_key(spark.sql(rw.sql), group_cols, aliases)
    )
