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
