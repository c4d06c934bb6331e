"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata, processed by
Arrow-batched Pandas UDFs via ``mapInPandas`` — the Spark-idiomatic shape
for per-blob Python work (one Arrow batch per task, never per-row serde).

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernels are STUBS: ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, in which case a clearly-marked
deterministic fake parses our own header layout. The Spark-side plumbing —
schemas, batch iteration, partition sizing, UDF signatures — is real and
tested; swapping in a real codec changes only the kernel body.

Scale notes: blobs should live in Parquet binary columns (or object-store
pointers for >~1 MB blobs) with metadata columns alongside so Catalyst can
prune/filter WITHOUT touching bytes; ``spark.sql.files.maxPartitionBytes``
bounds the per-task Arrow batch footprint.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema for a media table: opaque bytes + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

_MAGIC = b"FAKEMEDIA"


def encode_fake_media(media_id: int, kind: str, w: int, h: int, payload_len: int = 64) -> bytes:
    """Deterministic fake blob: magic + header + seeded payload bytes.
    Exists so the plumbing is testable without real codecs."""
    rng = np.random.default_rng(media_id)
    payload = rng.integers(0, 256, size=payload_len, dtype=np.uint8).tobytes()
    return _MAGIC + struct.pack("<BII", {"image": 1, "audio": 2, "video": 3}[kind], w, h) + payload


def make_fake_media_df(spark, n: int = 100) -> DataFrame:
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = 64 + (i % 8) * 32, 48 + (i % 5) * 32
        rows.append(
            (i, kind, encode_fake_media(i, kind, w, h), "fake", w, h, 1000 * (i % 30))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# decode kernels (STUBS — see module docstring)


def _decode_blob(content: bytes, fake: bool) -> tuple[int, int, int, float]:
    """→ (kind_code, width, height, payload_mean). Raises unless fake."""
    if content is None:
        return (0, 0, 0, float("nan"))
    if content[: len(_MAGIC)] == _MAGIC and fake:
        kind, w, h = struct.unpack_from("<BII", content, len(_MAGIC))
        payload = np.frombuffer(content[len(_MAGIC) + 9 :], dtype=np.uint8)
        return (kind, w, h, float(payload.mean()) if payload.size else float("nan"))
    raise NotImplementedError(
        "real media decoding requires PIL/librosa/ffmpeg, not present in this "
        "environment; pass fake=True for the deterministic test decoder"
    )


DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, decoded_kind int, "
    "decoded_width int, decoded_height int, payload_mean double"
)


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode blobs via ``mapInPandas`` (Arrow batches per partition)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_blob(c, fake) for c in pdf["content"]]
            out = pdf[["media_id", "kind", "width", "height"]].copy()
            out["decoded_kind"] = [d[0] for d in decoded]
            out["decoded_width"] = [d[1] for d in decoded]
            out["decoded_height"] = [d[2] for d in decoded]
            out["payload_mean"] = [d[3] for d in decoded]
            yield out

    return df.mapInPandas(kernel, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = "media_id long, feature array<float>"


def extract_features(df: DataFrame, dim: int = 8, fake: bool = False) -> DataFrame:
    """Feature-extraction plumbing: blob → fixed-dim float vector.
    Fake kernel: seeded moments of the payload; a real model swaps in
    here (batched inference inside the same mapInPandas shape)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if not fake:
                    raise NotImplementedError("feature extraction is stubbed; fake=True")
                rng = np.random.default_rng(int(mid))
                feats.append(rng.standard_normal(dim).astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (the decode of each frame stays stubbed). Pure built-ins: explode a
    generated timestamp sequence — no Python until the decode kernel."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def media_stats(df: DataFrame, include_bytes: bool = False) -> DataFrame:
    """Per-kind metadata aggregation. Default is metadata-only — the binary
    column is pruned out of the parquet scan (check ReadSchema in .explain);
    ``include_bytes`` adds total blob size at the cost of reading bytes."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
    ]
    if include_bytes:
        aggs.append(F.sum(F.length("content")).alias("total_bytes"))
    return df.groupBy("kind").agg(*aggs)
