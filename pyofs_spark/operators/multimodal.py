"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque `binary` columns with typed metadata structs;
all heavy kernels are Arrow-batched `mapInPandas` stages so bytes never
round-trip through per-row Python. The DECODE step is stubbed (no
image/audio libs in this container — marked clearly below); everything
around it — schema, batching, partition sizing, deterministic fake
features — is real and tested (tests/test_multimodal.py).

Design for 100 TB: binary columns dominate scan cost → metadata-only
queries must never touch them (column pruning does this for free when the
payload sits in its own parquet column); decode stages repartition by size
so Arrow batches stay ~64 MB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload_sha256", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 16


def synth_media(spark, n_rows: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from media_id."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    df = spark.range(0, n_rows, 1, partitions).withColumnRenamed("id", "media_id")
    return df.select(
        "media_id",
        F.element_at(kinds, (F.pmod("media_id", F.lit(3)) + 1).cast("int")).alias("kind"),
        F.encode(
            F.concat(F.lit("PAYLOAD:"), F.sha2(F.col("media_id").cast("string"), 256)),
            "utf-8",
        ).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod("media_id", F.lit(1024)) + 16).alias("width"),
        (F.pmod(F.col("media_id") * 7, F.lit(768)) + 16).alias("height"),
        (F.pmod(F.col("media_id") * 13, F.lit(60000))).alias("duration_ms"),
    )


def decode_media(payload: bytes, kind: str) -> np.ndarray:
    """REAL DECODE STUB — image/audio codecs are not installed in this
    container. Production swaps this single function for PIL/libsndfile/
    ffmpeg; the Spark-side plumbing is unchanged. Here: a deterministic
    fake 'decode' = sha256-seeded feature vector, so tests are exact."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / 65535.0


def extract_features(media: DataFrame, batch_target_rows: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of binary payloads →
    (sha256, size, feature[FEATURE_DIM]). The per-batch loop is numpy/
    hashlib over the Arrow buffer — no Spark-row Python objects."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = np.stack(
                [decode_media(bytes(p), k) for p, k in zip(payloads, pdf["kind"])]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in payloads
                    ],
                    "payload_bytes": [len(bytes(p)) for p in payloads],
                    "feature": list(feats),
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled frame timestamp
    (the decode of each frame is the stub above). Pure Spark: sequence +
    explode — demonstrates the fan-out shape without the codec."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("duration_ms"), F.lit(every_ms)
                )
            ),
        )
        .select("media_id", "frame_ms", "payload")
    )
