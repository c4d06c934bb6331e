"""Scalar quantization of embedding columns (beyond-reference op).

At 100 TB an ``array<float>`` embedding column dominates storage and
shuffle: a 768-dim float32 vector is 3 KiB/row. Per-dimension scalar
quantization (the FAISS ``SQ8`` layout, public knowledge) maps each
dimension to an int8-range code — 4x smaller, and candidate scoring
becomes integer dot products that whole-stage codegen vectorizes. The
standard pipeline shape: quantize once, run broad-phase kNN / near-dup
over codes, optionally re-rank a small candidate set with the exact
float vectors.

Everything here is deterministic and engine-portable, so it sits under
the DuckDB value-hash gate (q112):

- ``fit`` computes per-dimension min/max with one posexplode +
  groupBy(dim) aggregation. The explode multiplies rows by the
  dimension count, but partial aggregation combines map-side, so the
  shuffle carries (partitions x dims) rows — bounded, scale-safe.
- codes are ``round((x - min_d) * scale_d)`` computed in float64 with a
  fixed operation order both engines replay bit-identically; the rounded
  integer codes are then exact cross-engine currency (no float fuzz in
  the output).
- ``knn_join_quantized`` ranks by cosine over the integer codes — exact
  integer dot products (max 64 * 255^2 per pair here, far inside int64),
  norms and the final ratio in float64 with a pinned order.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ScalarQuantizer:
    """Per-dimension affine quantizer: code = round((x - min_d) * scale_d),
    scale_d = (levels - 1) / (max_d - min_d) (0 for constant dimensions).
    ``mins``/``scales`` are dimension-indexed driver-side constants (a
    dim-length list — bounded, never data-sized)."""

    mins: tuple[float, ...]
    scales: tuple[float, ...]
    levels: int = 256

    @classmethod
    def fit(
        cls,
        df: DataFrame,
        vec_col: str = "embedding",
        levels: int = 256,
        sample_fraction: float | None = None,
        seed: int = 42,
    ) -> "ScalarQuantizer":
        """Learn per-dimension [min, max] over the corpus. One pass:
        posexplode + groupBy(dim) min/max — partial aggregation keeps the
        shuffle at (partitions x dims) rows regardless of corpus size.

        At 100 TB pass ``sample_fraction`` to fit the bounds on a
        Bernoulli sample instead of a full scan — encode CLAMPS codes to
        [0, levels-1], so out-of-sample outliers saturate at the range
        edges instead of producing invalid codes (the FAISS SQ training
        convention). The clamp is a no-op for a full-corpus fit."""
        if sample_fraction is not None:
            df = df.sample(fraction=float(sample_fraction), seed=seed)
        stats = (
            df.select(F.posexplode(F.col(vec_col)).alias("d", "x"))
            .select("d", F.col("x").cast("double").alias("x"))
            .groupBy("d")
            .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
            .orderBy("d")
            .collect()
        )
        if not stats:
            raise ValueError(
                "ScalarQuantizer.fit saw no vectors (empty frame or "
                "sample_fraction too small) — a 0-dim quantizer would "
                "silently encode everything to code 0"
            )
        if any(r.mn is None or r.mx is None for r in stats):
            bad = [r.d for r in stats if r.mn is None]
            raise ValueError(
                f"ScalarQuantizer.fit: dimension(s) {bad} are all-NULL"
            )
        mins = tuple(float(r.mn) for r in stats)
        span = float(levels - 1)
        scales = tuple(
            (span / (float(r.mx) - float(r.mn)))
            if float(r.mx) > float(r.mn)
            else 0.0
            for r in stats
        )
        return cls(mins=mins, scales=scales, levels=int(levels))

    def encode_expr(self, vec_col: str | Column) -> Column:
        """``array<int>`` codes for a vector column. Two zip_with passes
        pin the IEEE operation order to exactly ``(x - min) * scale`` —
        the oracle replays the same order, so the rounded codes match
        bit-for-bit cross-engine."""
        c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
        mins = F.array(*[F.lit(float(m)) for m in self.mins])
        scales = F.array(*[F.lit(float(s)) for s in self.scales])
        shifted = F.zip_with(
            c.cast("array<double>"), mins, lambda x, m: x - m
        )
        hi = F.lit(int(self.levels - 1))
        codes = F.zip_with(
            shifted, scales,
            lambda d, s: F.least(
                F.greatest(F.round(d * s).cast("int"), F.lit(0)), hi
            ),
        )
        # loud dimension-mismatch guard: zip_with would otherwise NULL-pad
        # and the clamp would turn the padding into code 0 — silently
        # ignoring most of the vector (exactly the wrong-params hazard
        # the persisted sidecar exists to prevent)
        return F.when(F.size(c) == len(self.mins), codes).otherwise(
            F.raise_error(
                F.lit(
                    f"quantizer fit on {len(self.mins)} dims; "
                    "vector has a different length"
                )
            )
        )

    def encode(
        self,
        df: DataFrame,
        vec_col: str = "embedding",
        out_col: str = "codes",
    ) -> DataFrame:
        return df.withColumn(out_col, self.encode_expr(vec_col))

    def to_dict(self) -> dict:
        return {
            "mins": list(self.mins),
            "scales": list(self.scales),
            "levels": int(self.levels),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ScalarQuantizer":
        return cls(
            mins=tuple(float(x) for x in d["mins"]),
            scales=tuple(float(x) for x in d["scales"]),
            levels=int(d["levels"]),
        )

    def save(self, path: str) -> None:
        """Persist the quantizer to a DRIVER-LOCAL file (a dim-length
        JSON — the float64 params round-trip exactly via repr). For
        codes + params on a shared/remote filesystem use
        :func:`write_quantized_codes`, which ships the sidecar through
        Spark's writer."""
        import json
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f)

    @classmethod
    def load(cls, path: str) -> "ScalarQuantizer":
        import json

        with open(path) as f:
            return cls.from_dict(json.load(f))

    def decode_expr(self, codes_col: str | Column) -> Column:
        """Reconstructed float64 vector (cell centers): min_d + code/scale
        (constant dimensions decode to min_d)."""
        c = F.col(codes_col) if isinstance(codes_col, str) else codes_col
        mins = F.array(*[F.lit(float(m)) for m in self.mins])
        scales = F.array(*[F.lit(float(s)) for s in self.scales])
        scaled = F.zip_with(
            c.cast("array<double>"), scales,
            lambda x, s: F.when(s > 0.0, x / s).otherwise(F.lit(0.0)),
        )
        return F.zip_with(scaled, mins, lambda x, m: x + m)


def write_quantized_codes(
    df: DataFrame,
    quantizer: ScalarQuantizer,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Materialize the corpus code table — the 'encode once, probe many'
    operational model the kNN paths assume at scale. Writes
    ``(id_col, codes)`` Parquet under ``path`` plus the quantizer params
    under ``<path>/_quantizer/`` so a later session reloads BOTH halves
    consistently (codes from one fit scored against another fit's params
    would be silently wrong). The sidecar goes through Spark's text
    writer, so it lands on the SAME filesystem as the codes (S3/HDFS
    paths included — a driver-local ``open()`` would silently write a
    local file beside remote codes); the underscore prefix keeps both
    out of the Parquet reader's file listing. Returns the reloaded codes
    frame."""
    import json

    spark = df.sparkSession
    (
        df.select(F.col(id_col), quantizer.encode_expr(vec_col).alias("codes"))
        .write.mode("overwrite")
        .parquet(path)
    )
    (
        spark.createDataFrame(
            [(json.dumps(quantizer.to_dict()),)], ["value"]
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(path.rstrip("/") + "/_quantizer")
    )
    return spark.read.parquet(path)


def read_quantized_codes(
    spark, path: str
) -> tuple[DataFrame, ScalarQuantizer]:
    """The read half of :func:`write_quantized_codes`: the codes frame
    and the quantizer that produced it, as one consistent pair."""
    import json

    payload = spark.read.text(path.rstrip("/") + "/_quantizer").collect()
    (row,) = [r for r in payload if r.value.strip()]
    return (
        spark.read.parquet(path),
        ScalarQuantizer.from_dict(json.loads(row.value)),
    )


def clamp_stats(
    df: DataFrame,
    quantizer: ScalarQuantizer,
    vec_col: str = "embedding",
) -> DataFrame:
    """Drift diagnostic for a persisted quantizer: per-dimension count
    and fraction of values falling OUTSIDE the fitted [min, max] (the
    values encode clamps to the range edges). A sample-fitted quantizer
    clamps a little by design; a rising fraction on appended data means
    the distribution moved and the codes are losing resolution — the
    signal to re-fit and re-encode. One posexplode + groupBy(dim) pass,
    same bounded-shuffle shape as fit. Returns
    (d, n, clamped, clamp_fraction) per dimension."""
    mins = F.array(*[F.lit(float(m)) for m in quantizer.mins])
    scales = F.array(*[F.lit(float(s)) for s in quantizer.scales])
    span = float(quantizer.levels - 1)
    # a value clamps when (x - min) * scale rounds outside [0, span] —
    # test the SAME arithmetic encode uses, not a plain range check, so
    # boundary rounding agrees with the actual codes
    out_flag = F.zip_with(
        F.zip_with(
            F.col(vec_col).cast("array<double>"), mins, lambda x, m: x - m
        ),
        scales,
        lambda d, s: (
            (F.round(d * s) < 0.0) | (F.round(d * s) > F.lit(span))
        ).cast("int"),
    )
    return (
        df.select(F.posexplode(out_flag).alias("d", "clamped"))
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("clamped").alias("clamped"),
        )
        .withColumn(
            "clamp_fraction",
            F.col("clamped") / F.col("n").cast("double"),
        )
        .orderBy("d")
    )


def _int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two int-code arrays. Each factor is
    widened to int64 BEFORE the multiply: int32 products overflow past
    levels ~46341 (65535^2 > 2^31), which would silently wrap ranks."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _int_norm(a: Column) -> Column:
    """sqrt of the exact integer sum of squares, as float64."""
    return F.sqrt(_int_dot(a, a).cast("double"))


def quantized_cosine_expr(a: Column, b: Column) -> Column:
    """Cosine over integer code arrays: exact int64 dot, then
    ``(dot / norm_a) / norm_b`` in float64 (pinned division order; the
    oracle replays the same). Zero-norm codes define cosine 0.0."""
    na, nb = _int_norm(a), _int_norm(b)
    return F.when(
        (na > 0.0) & (nb > 0.0),
        (_int_dot(a, b).cast("double") / na) / nb,
    ).otherwise(F.lit(0.0))


def knn_join_quantized(
    left: DataFrame,
    right: DataFrame,
    quantizer: ScalarQuantizer,
    k: int = 5,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
    right_encoded: DataFrame | None = None,
) -> DataFrame:
    """Brute-phase kNN over quantized codes: for every left row, the
    top-k rows of ``right`` by cosine over int codes →
    (query_id, neighbor_id, qcosine, rank). Same join shape as
    functions/similarity.knn_join's brute path (broadcast right, streamed
    left) but the broadcast ships 4x-smaller code arrays and each pair
    costs one integer dot — the broad phase of a quantize → shortlist →
    exact-rerank pipeline. Ties break by neighbor id.

    Pass ``right_encoded`` — a (right_id, codes) frame from
    ``quantizer.encode`` — to skip re-encoding the corpus: the
    operational model at scale is codes materialized once beside the
    vectors (like knn_join's ``assigned`` IVF table) and only the query
    batch encoded at lookup time."""
    from pyspark.sql import Window

    lhs = left.select(
        F.col(left_id).alias("query_id"),
        quantizer.encode_expr(vec_col).alias("__qc"),
    ).withColumn("__qn", _int_norm(F.col("__qc")))
    if right_encoded is not None:
        rhs = right_encoded.select(
            F.col(right_id).alias("neighbor_id"),
            F.col("codes").alias("__nc"),
        )
    else:
        rhs = right.select(
            F.col(right_id).alias("neighbor_id"),
            quantizer.encode_expr(vec_col).alias("__nc"),
        )
    rhs = rhs.withColumn("__nn", _int_norm(F.col("__nc")))
    cand = lhs.crossJoin(F.broadcast(rhs))
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("__qcos"), F.col("neighbor_id")
    )
    # per-side norms were hoisted BEFORE the pair join (once per row,
    # like knn_join) so each candidate pair costs exactly one integer
    # dot pass — value identical to quantized_cosine_expr (same
    # operations, same division order)
    qcos = F.when(
        (F.col("__qn") > 0.0) & (F.col("__nn") > 0.0),
        (_int_dot(F.col("__qc"), F.col("__nc")).cast("double")
         / F.col("__qn")) / F.col("__nn"),
    ).otherwise(F.lit(0.0))
    return (
        cand.withColumn("__qcos", qcos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(
            "query_id",
            "neighbor_id",
            F.col("__qcos").alias("qcosine"),
            "rank",
        )
    )


def knn_join_reranked(
    left: DataFrame,
    right: DataFrame,
    quantizer: ScalarQuantizer,
    k: int = 5,
    shortlist_factor: int = 4,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
    right_encoded: DataFrame | None = None,
) -> DataFrame:
    """The full production ANN pipeline: quantized BROAD PHASE shortlists
    ``k * shortlist_factor`` candidates per query over int codes, then an
    exact float cosine RERANK over only the shortlisted pairs picks the
    final top-k → (query_id, neighbor_id, cosine, rank).

    Scale shape: the expensive all-pairs work happens on 4x-smaller
    codes; the float vectors are touched only for |queries| x (k x
    factor) shortlisted pairs — two id-equi joins, never an all-pairs
    float pass. The rerank cosine is IEEE-identical to
    functions/similarity.knn_join's (same fold order), so with a
    sufficient shortlist the output EQUALS the exact brute result."""
    from pyspark.sql import Window

    from approximate_query_engine_spark.functions.dedup import (
        dot_expr,
        sumsq_expr,
    )

    shortlist = knn_join_quantized(
        left,
        right,
        quantizer,
        k=int(k) * int(shortlist_factor),
        left_id=left_id,
        right_id=right_id,
        vec_col=vec_col,
        exclude_self=exclude_self,
        right_encoded=right_encoded,
    ).select("query_id", "neighbor_id")
    qv = left.select(
        F.col(left_id).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__qn", F.sqrt(sumsq_expr(F.col("__qv"))))
    nv = right.select(
        F.col(right_id).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    ).withColumn("__nn", F.sqrt(sumsq_expr(F.col("__nv"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        shortlist.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .withColumn(
            "cosine",
            F.when(
                (F.col("__qn") > 0.0) & (F.col("__nn") > 0.0),
                dot_expr(F.col("__qv"), F.col("__nv"))
                / (F.col("__qn") * F.col("__nn")),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def recall_at_k(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Per-query recall of an approximate kNN result against the exact
    one: |approx ∩ exact| / |exact| on (query_id, neighbor_id). Both
    inputs are (query_id, neighbor_id, ...) as produced by knn_join /
    knn_join_quantized."""
    # dedupe both projections: a duplicate (query, neighbor) pair on
    # either side would fan the join out and inflate both the hit count
    # and the denominator
    e = exact.select("query_id", "neighbor_id").dropDuplicates()
    a = approx.select(
        "query_id", "neighbor_id", F.lit(1).alias("__hit")
    ).dropDuplicates(["query_id", "neighbor_id"])
    return (
        e.join(a, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            (F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
             / F.count(F.lit(1))).alias("recall")
        )
    )
