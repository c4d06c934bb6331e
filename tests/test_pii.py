"""PII detection/redaction (functions/pii.py): pattern behavior on known
rows, redaction order, and engine-parity of the regex subset (the q98
oracle replays the same patterns through DuckDB RE2)."""

import pytest

from approximate_query_engine_spark.functions.pii import (
    PII_PATTERNS,
    pii_stats,
    with_pii,
)

ROWS = [
    (1, "contact me at bob.smith+x@example.co.uk or 555-123-4567", "a"),
    (2, "server 192.168.0.1 ssn 123-45-6789 card 4111-1111 1111-1111", "a"),
    (3, "card 4111-1111-1111-1111 plain text", "b"),
    (4, "nothing here", "b"),
    (5, "two emails a@b.io c@d.org and ip 10.0.0.255", "b"),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, text string, source string"
    )


def test_counts_per_type(pii_df):
    got = {
        r["doc_id"]: (
            r["pii_email"],
            r["pii_phone"],
            r["pii_ipv4"],
            r["pii_ssn"],
            r["pii_credit_card"],
        )
        for r in with_pii(pii_df).collect()
    }
    assert got[1] == (1, 1, 0, 0, 0)
    # the split card "4111-1111 1111-1111" still matches the card shape
    # (mixed separators); the SSN and IP on the same row count once each
    assert got[2] == (0, 0, 1, 1, 1)
    assert got[3] == (0, 0, 0, 0, 1)
    assert got[4] == (0, 0, 0, 0, 0)
    assert got[5] == (2, 0, 1, 0, 0)


def test_redaction_replaces_every_match(pii_df):
    rows = {r["doc_id"]: r for r in with_pii(pii_df).collect()}
    assert rows[1]["text_redacted"] == "contact me at [EMAIL] or [PHONE]"
    assert rows[3]["text_redacted"] == "card [CARD] plain text"
    assert rows[4]["text_redacted"] == "nothing here"
    assert rows[4]["redacted_chars"] == 0
    # redacted text never contains a residual match of any pattern
    from pyspark.sql import functions as F

    red = with_pii(pii_df).select(F.col("text_redacted").alias("text"))
    residual = with_pii(red).agg(F.sum("pii_total")).collect()[0][0]
    assert residual == 0


def test_group_stats(pii_df, duck):
    got = {r["source"]: r for r in pii_stats(pii_df, group_col="source").collect()}
    assert got["a"]["n_docs"] == 2 and got["a"]["docs_with_pii"] == 2
    assert got["a"]["total_matches"] == 5
    assert got["b"]["n_docs"] == 3 and got["b"]["docs_with_pii"] == 2
    # DuckDB RE2 computes identical per-type counts on the same rows —
    # the property the q98 hash oracle rests on
    duck.execute("DROP TABLE IF EXISTS pii_t")
    duck.execute("CREATE TABLE pii_t(doc_id BIGINT, text VARCHAR, source VARCHAR)")
    duck.executemany("INSERT INTO pii_t VALUES (?,?,?)", ROWS)
    for name, pattern, _ph in PII_PATTERNS:
        want = dict(
            duck.execute(
                f"SELECT doc_id, length(regexp_extract_all(text, '{pattern}')) "
                f"FROM pii_t ORDER BY doc_id"
            ).fetchall()
        )
        got_rows = {
            r["doc_id"]: r[f"pii_{name}"] for r in with_pii(pii_df).collect()
        }
        assert got_rows == want, name


def test_patterns_avoid_lookaround_and_backrefs():
    # the engine-parity contract: Java-regex/RE2 common subset only
    for name, pattern, _ph in PII_PATTERNS:
        assert "(?=" not in pattern and "(?<" not in pattern, name
        assert "\\1" not in pattern, name


def test_cross_engine_parity_on_random_corpus(spark, duck):
    """Randomized parity sweep: on 300 random documents with embedded
    PII-ish fragments (and near-miss decoys), Spark's Java regex and
    DuckDB's RE2 must agree on every per-type count AND on the redacted
    text — the exact property the q98 hash oracle rests on."""
    import random

    rng = random.Random(20260815)
    frags = [
        lambda: f"user{rng.randrange(999)}@ex-{rng.randrange(9)}.org",
        lambda: f"{rng.randrange(100,999)}-{rng.randrange(100,999)}-{rng.randrange(1000,9999)}",
        lambda: f"{rng.randrange(1,255)}.{rng.randrange(255)}.{rng.randrange(255)}.{rng.randrange(1,255)}",
        lambda: f"{rng.randrange(100,999)}-{rng.randrange(10,99)}-{rng.randrange(1000,9999)}",
        lambda: (
            f"{rng.randrange(1000,9999)}-{rng.randrange(1000,9999)}-"
            f"{rng.randrange(1000,9999)}-{rng.randrange(1000,9999)}"
        ),
        # decoys: near-misses that must NOT match
        lambda: f"v{rng.randrange(9)}.{rng.randrange(9)}.{rng.randrange(9)}",
        lambda: f"{rng.randrange(10,99)}-{rng.randrange(10,99)}",
        lambda: "a@b",
        lambda: f"{rng.randrange(10000,99999)}.{rng.randrange(10000,99999)}",
    ]
    words = ["lorem", "ipsum", "dolor", "sit", "(amet)", "42", "x.y", "@", "-"]
    rows = []
    for i in range(300):
        parts = []
        for _ in range(rng.randrange(3, 14)):
            parts.append(
                frags[rng.randrange(len(frags))]()
                if rng.random() < 0.4
                else words[rng.randrange(len(words))]
            )
        rows.append((i, " ".join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            tuple(r[f"pii_{n}"] for n, _p, _ph in PII_PATTERNS),
            r["text_redacted"],
        )
        for r in with_pii(df).collect()
    }
    duck.execute("DROP TABLE IF EXISTS pii_rand")
    duck.execute("CREATE TABLE pii_rand(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO pii_rand VALUES (?,?)", rows)
    red = "text"
    for _n, pattern, placeholder in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pattern}', '{placeholder}', 'g')"
    counts = ", ".join(
        f"length(regexp_extract_all(text, '{p}'))"
        for _n, p, _ph in PII_PATTERNS
    )
    want = {
        row[0]: (tuple(row[1:-1]), row[-1])
        for row in duck.execute(
            f"SELECT doc_id, {counts}, {red} FROM pii_rand ORDER BY doc_id"
        ).fetchall()
    }
    assert got == want
