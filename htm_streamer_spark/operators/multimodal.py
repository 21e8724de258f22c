"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, partition strategy, Arrow batch
shape, UDF signatures — is real and tested; the actual media decode is
STUBBED (no image/audio libs in this container): ``decode_stub``
raises ``NotImplementedError`` unless ``fake=True``, in which case it
produces deterministic fake features so the pipeline shape is
exercisable end-to-end.

Scale notes: media bytes ride in parquet binary columns; feature
extraction is ``mapInPandas`` over Arrow batches so bytes never
round-trip through per-row Python; downstream joins use only the
extracted fixed-width features (never the blob), so shuffles stay
narrow. Partition by content size bands to balance decode cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),   # image/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
    ]
)

FEATURE_DIM = 16


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (content =
    seeded pseudo-random bytes) for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(100, 4000))
        rows.append(
            (
                f"m-{i:06d}",
                kind,
                bytes(rng.integers(0, 256, size, dtype=np.uint8)),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 512)) if kind != "audio" else None,
                int(rng.integers(16, 512)) if kind != "audio" else None,
                int(rng.integers(100, 60000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def size_band_col(content, bands: int = 8, max_size: int = 1 << 24):
    """Partitioning key: band by blob size so decode-heavy rows spread
    evenly across tasks (skew control for the decode stage)."""
    return F.least(
        F.lit(bands - 1), F.floor(F.octet_length(content) * bands / F.lit(max_size))
    ).cast("int")


def extract_features_kernel(fake: bool = False, feature_dim: int = FEATURE_DIM):
    """mapInPandas kernel factory: (media_id, kind, content, …) batches →
    (media_id, kind, n_bytes, features array<float>). Real decode is a
    clearly-marked stub; ``fake=True`` yields a deterministic hash-based
    feature vector so the Spark plumbing is testable. Closure-defined for
    by-value pickling."""

    def kernel(pdf_iter):
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            n_bytes = pdf["content"].map(lambda b: 0 if b is None else len(b)).astype("int64")
            feats = []
            for blob in pdf["content"]:
                if blob is None:
                    feats.append([0.0] * feature_dim)
                    continue
                if not fake:
                    raise NotImplementedError(
                        "media decode requires image/audio libraries not present "
                        "in this environment; pass fake=True for the deterministic stub"
                    )
                # deterministic fake 'decode': bucket byte histogram
                arr = np.frombuffer(blob, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=feature_dim).astype(np.float64)
                feats.append((hist / max(len(arr), 1)).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "features": feats,
                }
            )

    return kernel


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Feature extraction over Arrow batches; output drops the blob so
    every downstream op shuffles fixed-width rows only."""
    repartitioned = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, size_band_col(F.col("content"))
    )
    return repartitioned.mapInPandas(
        extract_features_kernel(fake=fake),
        schema="media_id string, kind string, n_bytes long, features array<double>",
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    to decode — pure expression (sequence + explode). The decode itself
    is the stubbed kernel above."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
