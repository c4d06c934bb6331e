"""Quantile operators, theta sketches, and external-file registration."""

import json
import os

import pytest

from approximate_query_engine_spark.functions.quantiles import (
    KLLQuantiles,
    approx_percentiles,
    exact_percentiles,
)

PROBS = [0.25, 0.5, 0.75, 0.95]


def test_exact_percentiles_match_duckdb(engine, duck):
    got = exact_percentiles(engine.spark.table("lineitem"), "l_quantity", PROBS)
    want = duck.execute(
        f"SELECT quantile_cont(l_quantity, {PROBS}) FROM lineitem"
    ).fetchone()[0]
    assert got == list(want)  # both use linear interpolation — bit-exact


def test_approx_percentiles_close_to_exact(engine):
    df = engine.spark.table("lineitem")
    exact = exact_percentiles(df, "l_extendedprice", PROBS)
    approx = approx_percentiles(df, "l_extendedprice", PROBS, accuracy=10000)
    for e, a in zip(exact, approx):
        assert abs(a - e) / max(abs(e), 1) < 0.05


def test_kll_sketch_quantiles_and_rank(engine):
    kll = KLLQuantiles(engine.spark, engine.catalog)
    kll.build("lineitem", "l_quantity", k=200)
    qs = kll.quantiles("lineitem", "l_quantity", PROBS)
    exact = exact_percentiles(engine.spark.table("lineitem"), "l_quantity", PROBS)
    assert qs is not None
    for e, a in zip(exact, qs):
        assert abs(a - e) <= max(3.0, 0.1 * abs(e))  # KLL rank error ~1.6% at k=200
    r = kll.rank("lineitem", "l_quantity", exact[1])
    assert r is not None and 0.4 <= r <= 0.6  # median value ranks near 0.5


def test_kll_merge(engine):
    kll = KLLQuantiles(engine.spark, engine.catalog)
    # build per-half sketches and merge: estimates match a whole-table sketch
    spark = engine.spark
    spark.sql("SELECT * FROM lineitem WHERE l_orderkey % 2 = 0").createOrReplaceTempView("li_even")
    spark.sql("SELECT * FROM lineitem WHERE l_orderkey % 2 = 1").createOrReplaceTempView("li_odd")
    engine.catalog.upsert_table_stats("li_even", 1)
    engine.catalog.upsert_table_stats("li_odd", 1)
    a = kll.build("li_even", "l_quantity").sketch_data
    b = kll.build("li_odd", "l_quantity").sketch_data
    merged = kll.merge_and_estimate([a, b], [0.5])
    exact = exact_percentiles(spark.table("lineitem"), "l_quantity", [0.5])
    assert abs(merged[0] - exact[0]) <= max(3.0, 0.1 * abs(exact[0]))


def test_theta_sketch_distinct(engine):
    out = engine.create_sketch("lineitem", "l_partkey", "theta", {"lg_k": 12})
    assert out["size_bytes"] > 0
    est = engine.sketches.estimate_distinct_from_sketch(
        "lineitem", "l_partkey", sketch_type="theta"
    )
    true = engine.spark.sql(
        "SELECT COUNT(DISTINCT l_partkey) AS c FROM lineitem"
    ).collect()[0]["c"]
    assert est is not None and abs(est - true) / true < 0.05


def test_theta_set_algebra(engine, spark):
    """|A ∪ B| / |A ∩ B| / |A \\ B| from persisted theta sketches of two
    overlapping customer segments, each within 5% of exact."""
    spark.sql(
        "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
    ).createOrReplaceTempView("seg_a")
    spark.sql(
        "SELECT o_custkey FROM orders WHERE o_orderpriority IN "
        "('1-URGENT', '2-HIGH')"
    ).createOrReplaceTempView("seg_b")
    engine.create_sketch("seg_a", "o_custkey", "theta", {"lg_k": 12})
    engine.create_sketch("seg_b", "o_custkey", "theta", {"lg_k": 12})

    exact = {
        "union": spark.sql(
            "SELECT COUNT(DISTINCT o_custkey) AS c FROM "
            "(SELECT o_custkey FROM seg_a UNION ALL SELECT o_custkey FROM seg_b)"
        ).collect()[0]["c"],
        "intersection": spark.sql(
            "SELECT COUNT(DISTINCT o_custkey) AS c FROM seg_a "
            "WHERE o_custkey IN (SELECT o_custkey FROM seg_b)"
        ).collect()[0]["c"],
        "difference": spark.sql(
            "SELECT COUNT(DISTINCT o_custkey) AS c FROM seg_a "
            "WHERE o_custkey NOT IN (SELECT o_custkey FROM seg_b)"
        ).collect()[0]["c"],
    }
    for op, true in exact.items():
        est = engine.sketches.theta_set_estimate(
            "seg_a", "o_custkey", "seg_b", "o_custkey", op=op
        )
        assert est is not None
        assert abs(est - true) <= max(2, 0.05 * true), (op, est, true)
    with pytest.raises(ValueError):
        engine.sketches.theta_set_estimate("seg_a", "o_custkey", "seg_b", "o_custkey", op="xor")
    assert (
        engine.sketches.theta_set_estimate("nope", "x", "seg_b", "o_custkey") is None
    )


def test_register_csv(engine, tmp_path):
    p = tmp_path / "ext.csv"
    p.write_text("id,name,score\n1,a,0.5\n2,b,0.75\n3,c,1.0\n")
    out = engine.register_file("ext_csv", str(p), fmt="csv")
    assert out["rows"] == 3 and out["columns"] == ["id", "name", "score"]
    got = engine.query("SELECT COUNT(*) AS c FROM ext_csv", prefer_exact=True)
    assert got["result"][0]["c"] == 3


def test_register_json(engine, tmp_path):
    p = tmp_path / "ext.json"
    p.write_text("\n".join(json.dumps({"k": i, "v": i * 1.5}) for i in range(5)))
    out = engine.register_file("ext_json", str(p), fmt="json")
    assert out["rows"] == 5
    r = engine.query("SELECT SUM(v) AS s FROM ext_json", prefer_exact=True)
    assert r["result"][0]["s"] == pytest.approx(sum(i * 1.5 for i in range(5)))


def test_register_bad_format(engine):
    with pytest.raises(ValueError):
        engine.register_file("x", "/nonexistent", fmt="avro")


def test_segment_overlap_exact_mode(engine, duck):
    """Below the nominal-entry budget every theta estimate — the
    intersections included — is exact, so the whole overlap frame must
    equal the key-level set computation."""
    from approximate_query_engine_spark.sketches import segment_overlap

    got = {
        (r["seg_a"], r["seg_b"]): (
            r["distinct_a"],
            r["distinct_b"],
            r["overlap_cnt"],
            r["union_cnt"],
        )
        for r in segment_overlap(
            engine.spark.table("orders"), "o_orderpriority", "o_custkey"
        ).collect()
    }
    want = duck.execute(
        """
        WITH seg AS (SELECT DISTINCT o_orderpriority s, o_custkey u FROM orders),
        card AS (SELECT s, COUNT(*) c FROM seg GROUP BY s),
        ov AS (SELECT a.s sa, b.s sb, COUNT(*) o FROM seg a
               JOIN seg b ON a.u = b.u AND a.s < b.s GROUP BY 1, 2)
        SELECT sa, sb, ca.c, cb.c, o, ca.c + cb.c - o
        FROM ov JOIN card ca ON ca.s = sa JOIN card cb ON cb.s = sb
        """
    ).fetchall()
    assert len(got) == len(want)
    for sa, sb, ca, cb, o, un in want:
        assert got[(sa, sb)] == (ca, cb, o, un)


def test_segment_overlap_pairs_filter_and_jaccard(engine):
    from approximate_query_engine_spark.sketches import segment_overlap

    rows = segment_overlap(
        engine.spark.table("orders"),
        "o_orderpriority",
        "o_custkey",
        pairs=[("2-HIGH", "1-URGENT")],  # unordered input, canonical output
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["seg_a"], r["seg_b"]) == ("1-URGENT", "2-HIGH")
    assert r["jaccard"] == r["overlap_cnt"] / r["union_cnt"]
    assert 0.0 < r["jaccard"] <= 1.0


def test_segment_overlap_estimation_regime_bounded_error(engine, duck):
    """Past the nominal budget the sketch degrades to ~1/sqrt(2^lg_k)
    relative error per estimate — check a deliberately tiny lg_k (2^4 =
    16 entries, far below the segment ndv at any fixture scale) against
    exact truth computed from the same data."""
    from approximate_query_engine_spark.sketches import segment_overlap

    true_a, true_o = duck.execute(
        """
        WITH seg AS (SELECT DISTINCT o_orderpriority s, o_custkey u FROM orders)
        SELECT (SELECT COUNT(*) FROM seg WHERE s = '1-URGENT'),
               (SELECT COUNT(*) FROM (
                  SELECT u FROM seg WHERE s = '1-URGENT'
                  INTERSECT SELECT u FROM seg WHERE s = '2-HIGH'))
        """
    ).fetchone()
    rows = segment_overlap(
        engine.spark.table("orders"),
        "o_orderpriority",
        "o_custkey",
        lg_k=4,
        pairs=[("1-URGENT", "2-HIGH")],
    ).collect()
    r = rows[0]
    # ~8 sigma of 1/sqrt(16) = 25% — loose, but catches a broken rewrite
    assert abs(r["distinct_a"] - true_a) / true_a < 2.0
    assert abs(r["overlap_cnt"] - true_o) / true_o < 3.0  # intersections noisier
    assert r["distinct_a"] > 16  # genuinely in estimation mode, not truncated
