"""Sample-based join-size estimation: how many rows would A ⋈ B produce,
without running the join.

Join the two SAMPLES and scale by 1/(f_a·f_b): each matched pair (i, j)
survives both Bernoulli filters with probability f_a·f_b, so the scaled
pair count is an unbiased Horvitz–Thompson estimate of |A ⋈ B|. The work
is a join of f_a·N_a × f_b·N_b rows — at 1% each, four orders of
magnitude below the real join. This is the planning primitive for
join-order/strategy decisions that statistics alone can't answer (e.g.
correlated keys, filtered inputs).

Caveat (documented, inherent to Bernoulli pair-sampling): variance is
driven by key-frequency skew — a key with a·b pairings contributes like
a·b·f_a·f_b pairs in expectation; the CI reported here uses the plug-in
per-key variance from the sampled pair counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z_95 = 1.96

_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _common_key_type(ta: str, tb: str) -> str | None:
    """Cast target that makes both sides hash identically, mirroring the
    type Spark itself would coerce the join keys to: integral pairs widen
    to bigint, mixed numeric pairs to double (same precision loss a real
    bigint⋈double join takes), date/timestamp pairs to timestamp (a real
    join promotes date to midnight), anything else to its string
    rendering — which is only safe because by then neither side is a
    temporal/numeric type with a non-canonical string form."""
    if ta == tb:
        return None
    numeric = lambda t: t in _INTEGRAL or t in ("float", "double") or t.startswith("decimal")
    temporal = lambda t: t in ("date", "timestamp", "timestamp_ntz")
    if ta in _INTEGRAL and tb in _INTEGRAL:
        return "bigint"
    if numeric(ta) and numeric(tb):
        return "double"
    if temporal(ta) and temporal(tb):
        return "timestamp"
    return "string"


def estimate_join_size(
    left: DataFrame,
    right: DataFrame,
    on: str,
    fraction_left: float = 0.01,
    fraction_right: float = 0.01,
    seed: int = 42,
) -> dict:
    """→ {estimate, ci_low, ci_high, sampled_pairs, scale}."""
    if not (0 < fraction_left <= 1 and 0 < fraction_right <= 1):
        raise ValueError("fractions must be in (0, 1]")
    a = left.sample(fraction=fraction_left, seed=seed).select(F.col(on).alias("__k"))
    b = right.sample(fraction=fraction_right, seed=seed + 1).select(
        F.col(on).alias("__k")
    )
    scale = 1.0 / (fraction_left * fraction_right)
    # per-key sampled pair counts in one aggregation each + a small join on
    # distinct keys (never materializes the pair blow-up)
    ka = a.groupBy("__k").agg(F.count(F.lit(1)).alias("ca"))
    kb = b.groupBy("__k").agg(F.count(F.lit(1)).alias("cb"))
    per_key = ka.join(kb, "__k").select(
        (F.col("ca") * F.col("cb")).cast("double").alias("pairs")
    )
    row = per_key.agg(
        F.sum("pairs").alias("n"),
        F.sum(F.col("pairs") * F.col("pairs")).alias("n2"),
    ).collect()[0]
    sampled_pairs = float(row["n"] or 0.0)
    sum_sq = float(row["n2"] or 0.0)
    est = sampled_pairs * scale
    fab = fraction_left * fraction_right
    if sampled_pairs == 0:
        # zero collisions is NOT certainty of an empty join — the plug-in
        # variance degenerates to 0. Rule of three: with 95% confidence the
        # expected sampled-pair count is below ~3, so the join is below
        # 3·scale. low_support flags the estimate as unusable for planning.
        return {
            "estimate": 0.0,
            "ci_low": 0.0,
            "ci_high": 3.0 * scale,
            "sampled_pairs": 0,
            "scale": scale,
            "low_support": True,
        }
    # plug-in HT variance: Var ≈ Σ pairs_k² · (1 - f_a·f_b) / (f_a·f_b)²
    se = (sum_sq * (1 - fab)) ** 0.5 / fab
    return {
        "estimate": est,
        "ci_low": max(0.0, est - Z_95 * se),
        "ci_high": est + Z_95 * se,
        "sampled_pairs": int(sampled_pairs),
        "scale": scale,
        "low_support": sampled_pairs < 10,
    }


def estimate_join_size_cms(
    left: DataFrame,
    right: DataFrame,
    on: str,
    depth: int = 5,
    width: int = 1 << 16,
    seed: int = 42,
) -> dict:
    """Count-Min inner-product join-size estimate (Cormode–Muthukrishnan
    2005 §4.2): |A ⋈ B| = Σ_k a_k·b_k ≈ min_d Σ_j CM_A[d][j]·CM_B[d][j].

    Expressed relationally instead of via sketch binaries: a CMS counter
    row IS a hash-bucket histogram, so each side is ONE aggregation
    ``groupBy(d, xxhash64(key, seed_d) % width)`` (depth via ``explode`` of
    the seed array — a single pass, no per-depth rescans), the inner
    product is a join on (d, bucket) over ≤ depth·width rows per side, and
    the min over depths is a tiny final aggregate. No driver-side counter
    arrays at any point, so width can scale with key cardinality.

    Guarantees (one-sided): each depth's estimate ≥ the true size, and
    exceeds it by more than (e/width)·N_A·N_B with probability ≤ e^-depth.
    Practical accuracy needs width ≳ key cardinality — below that the
    expected overestimate is ~N_A·N_B/width (collision mass). The sample
    path (:func:`estimate_join_size`) has two-sided CIs; this path is one
    pass per table, mergeable, and exact-zero-safe.
    """
    seeds = list(range(seed, seed + depth))
    cast_to = _common_key_type(dict(left.dtypes)[on], dict(right.dtypes)[on])

    def histogram(df: DataFrame, tag: str) -> DataFrame:
        key = F.col(on)
        # xxhash64 hashes by PHYSICAL type: int32(7) != int64(7). A real
        # join coerces both sides to a common type first; mirror that, or
        # matched keys land in different buckets and the one-sided
        # "overestimate only" guarantee silently inverts.
        if cast_to is not None:
            key = key.cast(cast_to)
        rows = df.select(key.alias("__k")).where(F.col("__k").isNotNull())
        exploded = rows.select(
            F.explode(F.array(*[F.lit(s) for s in seeds])).alias("__d"),
            F.col("__k"),
        )
        return (
            exploded.groupBy(
                "__d",
                (
                    F.pmod(F.xxhash64(F.col("__k"), F.col("__d")), F.lit(width))
                ).alias("__bucket"),
            )
            .agg(F.count(F.lit(1)).alias(f"c_{tag}"))
        )
    ha = histogram(left, "a")
    hb = histogram(right, "b")
    per_depth = (
        ha.join(hb, ["__d", "__bucket"])
        .groupBy("__d")
        .agg(F.sum(F.col("c_a") * F.col("c_b")).alias("ip"))
    )
    # a depth with NO colliding buckets yields no row after the inner join;
    # its inner product is 0, so fewer than `depth` rows means estimate 0
    row = per_depth.agg(
        F.min("ip").alias("est"), F.count(F.lit(1)).alias("nd")
    ).collect()[0]
    estimate = int(row["est"] or 0) if int(row["nd"] or 0) == depth else 0
    return {
        "estimate": estimate,
        "depth": depth,
        "width": width,
        "overestimate_only": True,
        "error_bound_note": (
            f"≤ true + (e/{width})·N_A·N_B with prob ≥ 1 - e^-{depth}"
        ),
    }
