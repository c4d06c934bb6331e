"""PII detection and redaction for training-data pipelines — pure
built-in regexp expressions (JVM-side, whole-stage codegen; no Python in
the hot path), the standard pre-training scrub pass (emails, phone
numbers, IP addresses, SSN-like and credit-card-like digit shapes).

The patterns deliberately use only the regex subset whose semantics are
identical across Java regex (Spark) and RE2 (DuckDB, the test oracle):
character classes, bounded repetition, alternation, word boundaries —
no lookarounds, no backreferences. Detection = count of NON-OVERLAPPING
left-to-right matches (both engines' regexp_extract_all contract);
redaction replaces each match with a typed placeholder, longest/most
specific pattern first so a credit-card number is never half-eaten by
the phone pattern.

Reference parity: the reference has no text operators at all (SURVEY §2
— its surface is SQL aggregates over TPC-H-ish tables); this extends the
repo's corpus-pipeline family (text.py, dedup.py, contamination.py) the
way a 100 TB pre-training pipeline needs. Scale shape: one projection,
no shuffle, no UDF — the scan stays in codegen at any table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, placeholder) in REDACTION ORDER: most specific first.
#: Each pattern is Java-regex/RE2 common-subset; \b anchors prevent a
#: 16-digit card from matching inside a longer digit run.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    (
        "credit_card",
        r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
        "[CARD]",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "[SSN]",
    ),
    (
        "phone",
        r"(?:\+\d{1,3}[- ])?\b\d{3}[-. ]\d{3,4}[-. ]\d{4}\b",
        "[PHONE]",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "[IP]",
    ),
]


def pii_count_expr(text_col: str | Column, pattern: str) -> Column:
    """Count of non-overlapping matches of ``pattern`` in the text."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.array_size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def redact_expr(text_col: str | Column, token: str | None = None) -> Column:
    """The text with every PII match replaced by its typed placeholder
    (or by the uniform ``token`` when given), applied in PII_PATTERNS
    order (most specific first). Idempotent as long as the placeholders
    match no pattern — they don't."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for _name, pattern, placeholder in PII_PATTERNS:
        col = F.regexp_replace(
            col, F.lit(pattern), F.lit(token or placeholder)
        )
    return col


def with_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row PII columns: ``pii_<type>`` match counts (counted on the
    ORIGINAL text — earlier redactions must not hide later pattern
    matches from the report), ``pii_total``, ``text_redacted``, and
    ``redacted_chars`` (how many characters redaction changed)."""
    counts = {
        f"pii_{name}": pii_count_expr(text_col, pattern)
        for name, pattern, _ph in PII_PATTERNS
    }
    out = df
    for cname, expr in counts.items():
        out = out.withColumn(cname, expr)
    total = None
    for cname in counts:
        total = F.col(cname) if total is None else total + F.col(cname)
    return (
        out.withColumn("pii_total", total.cast("long"))
        .withColumn("text_redacted", redact_expr(text_col))
        .withColumn(
            "redacted_chars",
            (
                F.length(F.col(text_col)) - F.length("text_redacted")
            ).cast("long"),
        )
    )


def pii_stats(
    df: DataFrame, text_col: str = "text", group_col: str | None = None
) -> DataFrame:
    """Corpus-level PII report: per ``group_col`` (or whole-corpus) doc
    counts, per-type match totals, docs-with-any-PII, and total redacted
    characters — the summary a scrub pass emits before dropping/cleaning
    documents. One scan, one (tiny) aggregate; no UDF, no per-row
    Python."""
    rowed = with_pii(df, text_col)
    keys = [group_col] if group_col else []
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("pii_total") > 0).cast("long")).alias("docs_with_pii"),
        F.sum("pii_total").alias("total_matches"),
        F.sum("redacted_chars").alias("redacted_chars"),
    ] + [
        F.sum(f"pii_{name}").alias(f"n_{name}")
        for name, _p, _ph in PII_PATTERNS
    ]
    out = rowed.groupBy(*keys).agg(*aggs)
    return out.orderBy(group_col) if group_col else out
