"""Synthetic ``purchases`` generator — the reference's only dataset
(reference seed.py:9-111; schema and distributions per FIXTURES.md §1),
generated distributed-style with ``spark.range`` + seeded column
expressions instead of driver-side row loops + batched INSERTs.

Distributions (FIXTURES.md §1):
    id            sequential 1..N
    customer_id   uniform int [1, 50000]
    product_id    uniform int [1, 10000]
    amount        uniform [10.0, 1000.0], 2 dp
    country/city/category  uniform 10-way categorical
    purchase_date 2023-01-01 + uniform 0..365 days (DateType here;
                  the reference stores TEXT — SURVEY.md §1.2 maps it)

Determinism: every column derives from ``rand(seed+k)``, so the same
(n, seed) yields the same table on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COUNTRIES = [
    "USA", "UK", "Canada", "Germany", "France",
    "Japan", "Australia", "Brazil", "India", "China",
]
CITIES = [
    "New York", "London", "Toronto", "Berlin", "Paris",
    "Tokyo", "Sydney", "Rio", "Mumbai", "Beijing",
]
CATEGORIES = [
    "Electronics", "Clothing", "Food", "Books", "Home",
    "Sports", "Toys", "Beauty", "Garden", "Automotive",
]


def _choice(options: list[str], r) -> F.Column:
    arr = F.array(*[F.lit(o) for o in options])
    idx = F.least(F.floor(r * len(options)).cast("int"), F.lit(len(options) - 1))
    return F.element_at(arr, idx + 1)


def generate_purchases(
    spark: SparkSession, n: int = 200_000, seed: int = 42
) -> DataFrame:
    base = spark.range(1, n + 1).withColumnRenamed("id", "id")
    r = lambda k: F.rand(seed + k)  # noqa: E731
    return base.select(
        F.col("id"),
        (F.floor(r(1) * 50_000) + 1).cast("long").alias("customer_id"),
        (F.floor(r(2) * 10_000) + 1).cast("long").alias("product_id"),
        F.round(r(3) * 990.0 + 10.0, 2).alias("amount"),
        _choice(COUNTRIES, r(4)).alias("country"),
        _choice(CITIES, r(5)).alias("city"),
        _choice(CATEGORIES, r(6)).alias("category"),
        F.date_add(F.lit("2023-01-01").cast("date"), F.floor(r(7) * 366).cast("int")).alias(
            "purchase_date"
        ),
    )


def seed_purchases(
    engine, n: int = 200_000, seed: int = 42, table: str = "purchases"
) -> dict:
    """Register a generated purchases table with the engine + catalog stats
    (the analog of running the reference's ``python seed.py N``)."""
    df = generate_purchases(engine.spark, n, seed)
    engine.register_view(table, df)
    engine.catalog.save()
    return {"table": table, "rows": n}
