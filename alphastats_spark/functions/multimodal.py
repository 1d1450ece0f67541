"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride Spark as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages (the only place Python belongs — per-batch, never
per-row). The container has no image/audio libraries, so the actual decode
step is STUBBED: ``decoder="fake"`` produces a deterministic feature vector
from the payload bytes (real Spark plumbing — schema, batching,
partitioning — with a fake kernel); ``decoder="real"`` raises
``NotImplementedError`` telling the user which library to install.

At 100 TB scale the pattern is: keep payloads in their own parquet column
(column pruning skips them unless needed), ``repartition`` by size-balanced
key before the decode stage (CPU-bound, benefits from even batches), and
emit fixed-size ``array<float>`` features so downstream similarity reuses
:mod:`.similarity` unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-seeded feature vector."""
    digest = hashlib.md5(payload or b"").digest()
    return [digest[i % len(digest)] / 255.0 for i in range(dim)]


def decode_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: str = "fake",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """binary payloads → fixed-size float features via Arrow-batched mapInPandas."""
    if decoder == "real":
        raise NotImplementedError(
            "No image/audio codec available in this environment — install "
            "pillow/torchaudio and swap the kernel in decode_features()."
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        _fake_features(bytes(p) if p is not None else b"", dim)
                        for p in pdf[content_col]
                    ],
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, out_schema)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Plumbing for an image-resize stage: passes payloads through and
    rewrites metadata (the real kernel would transform the bytes)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def sample_frames_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled timestamp (frame decode itself is the stubbed kernel)."""
    n_frames = F.greatest(
        (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int"), F.lit(1)
    )
    return df.select(
        "media_id",
        "meta",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
