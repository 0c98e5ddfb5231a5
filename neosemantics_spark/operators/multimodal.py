"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode/feature-extract kernels are STUBS (no image/audio libraries in
this container — clearly marked below); the Spark-side plumbing is real
and tested: schemas, Arrow-batched `mapInPandas` signatures, partitioning,
and batch shapes are exactly what a production decode stage needs — swap
`_decode_stub` for a PIL/ffmpeg call and nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import round4
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),    # opaque bytes
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload_sha", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def synthetic_media(spark, n: int = 64, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (payload = repeatable bytes)."""
    return (
        spark.range(0, n, 1, partitions)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")).alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.encode(F.concat(F.lit("payload-"), F.sha2(F.col("id").cast("string"), 256)), "utf-8").cast("binary").alias("payload"),
            (F.col("id") % 640 + 1).cast("int").alias("meta_width"),
            (F.col("id") % 480 + 1).cast("int").alias("meta_height"),
            (F.col("id") * 1000 % 60000).alias("meta_duration_ms"),
        )
    )


def _decode_stub(kind: str, payload: bytes) -> list[float]:
    """STUB decode/feature-extract kernel.

    Real deployment: image → PIL.Image.open + resize + channel means;
    audio → soundfile/librosa frame energies; video → ffmpeg frame sample.
    Those libraries are absent here, so this produces a deterministic fake
    8-dim feature from the payload bytes. Raise NotImplementedError instead
    if silent fakes are unacceptable for your pipeline.
    """
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched decode: one Python call per record batch, vectorized
    over the batch (the production shape for CPU-bound decode). Narrow
    stage — parallelism = input partitions; repartition upstream if the
    source files are few and large."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(k, bytes(p)) for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha": [hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation — pure columnar, no decode needed."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            round4(F.avg("meta_width")).alias("avg_width"),
            round4(F.avg("meta_duration_ms")).alias("avg_duration_ms"),
        )
    )
