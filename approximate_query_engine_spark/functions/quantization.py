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
    ) -> "ScalarQuantizer":
        """Learn per-dimension [min, max] over the corpus. One pass:
        posexplode + groupBy(dim) min/max — partial aggregation keeps the
        shuffle at (partitions x dims) rows regardless of corpus size."""
        stats = (
            df.select(F.posexplode(F.col(vec_col)).alias("d", "x"))
            .select("d", F.col("x").cast("double").alias("x"))
            .groupBy("d")
            .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
            .orderBy("d")
            .collect()
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
        return F.zip_with(
            shifted, scales,
            lambda d, s: F.round(d * s).cast("int"),
        )

    def encode(
        self,
        df: DataFrame,
        vec_col: str = "embedding",
        out_col: str = "codes",
    ) -> DataFrame:
        return df.withColumn(out_col, self.encode_expr(vec_col))

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


def _int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two int-code arrays (int64 sums)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
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
) -> DataFrame:
    """Brute-phase kNN over quantized codes: for every left row, the
    top-k rows of ``right`` by cosine over int codes →
    (query_id, neighbor_id, qcosine, rank). Same join shape as
    functions/similarity.knn_join's brute path (broadcast right, streamed
    left) but the broadcast ships 4x-smaller code arrays and each pair
    costs one integer dot — the broad phase of a quantize → shortlist →
    exact-rerank pipeline. Ties break by neighbor id."""
    from pyspark.sql import Window

    lhs = left.select(
        F.col(left_id).alias("query_id"),
        quantizer.encode_expr(vec_col).alias("__qc"),
    )
    rhs = right.select(
        F.col(right_id).alias("neighbor_id"),
        quantizer.encode_expr(vec_col).alias("__nc"),
    )
    cand = lhs.crossJoin(F.broadcast(rhs))
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("__qcos"), F.col("neighbor_id")
    )
    return (
        cand.withColumn(
            "__qcos", quantized_cosine_expr(F.col("__qc"), F.col("__nc"))
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(
            "query_id",
            "neighbor_id",
            F.col("__qcos").alias("qcosine"),
            "rank",
        )
    )


def recall_at_k(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Per-query recall of an approximate kNN result against the exact
    one: |approx ∩ exact| / |exact| on (query_id, neighbor_id). Both
    inputs are (query_id, neighbor_id, ...) as produced by knn_join /
    knn_join_quantized."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select(
        "query_id", "neighbor_id", F.lit(1).alias("__hit")
    )
    return (
        e.join(a, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            (F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
             / F.count(F.lit(1))).alias("recall")
        )
    )
