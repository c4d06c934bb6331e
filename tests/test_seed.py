"""purchases generator: distribution properties from FIXTURES.md §1 and the
reference's seed-script sanity prints (reference seed.py:98-109)."""

import pytest

from approximate_query_engine_spark.seed import (
    CATEGORIES,
    COUNTRIES,
    generate_purchases,
    seed_purchases,
)

N = 20_000


@pytest.fixture(scope="module")
def purchases(spark):
    df = generate_purchases(spark, N, seed=7)
    df.cache()
    df.count()
    return df


def test_schema_and_count(purchases):
    assert purchases.count() == N
    assert [f.name for f in purchases.schema.fields] == [
        "id", "customer_id", "product_id", "amount",
        "country", "city", "category", "purchase_date",
    ]


def test_amount_distribution(purchases):
    row = purchases.selectExpr(
        "AVG(amount) a", "MIN(amount) lo", "MAX(amount) hi"
    ).collect()[0]
    assert row["a"] == pytest.approx(505.0, rel=0.03)  # FIXTURES: ≈505
    assert row["lo"] >= 10.0 and row["hi"] <= 1000.0


def test_categoricals_uniform(purchases):
    counts = {r["country"]: r["c"] for r in
              purchases.groupBy("country").count().withColumnRenamed("count", "c").collect()}
    assert set(counts) == set(COUNTRIES)
    for c in counts.values():
        assert abs(c - N / 10) < N / 10 * 0.2
    cats = {r["category"] for r in purchases.select("category").distinct().collect()}
    assert cats == set(CATEGORIES)


def test_deterministic(spark):
    a = generate_purchases(spark, 1000, seed=3).collect()
    b = generate_purchases(spark, 1000, seed=3).collect()
    assert a == b
    c = generate_purchases(spark, 1000, seed=4).collect()
    assert a != c


def test_fixture_queries_on_purchases(engine):
    """The FIXTURES §4 canonical query surface works end-to-end over a
    seeded purchases table — exact and approximate."""
    seed_purchases(engine, n=20_000, seed=11)
    r = engine.query(
        "SELECT country, COUNT(*) AS cnt, AVG(amount) AS avg_amount "
        "FROM purchases WHERE amount > 500 GROUP BY country",
        max_rel_error=0.1,
        use_ml_optimization=True,
    )
    assert r["status"] == "ok"
    assert len(r["result"]) == 10
    e = engine.query(
        "SELECT COUNT(DISTINCT customer_id) AS n FROM purchases",
        max_rel_error=0.05, use_ml_optimization=True,
    )
    assert e["plan"]["type"] == "sketch"
    # FIXTURES: ≈ 50000·(1−(1−1/50000)^N) ≈ 16484 at N=20k
    assert e["result"][0]["n"] == pytest.approx(16484, rel=0.1)
