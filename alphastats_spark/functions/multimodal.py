"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride Spark as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages (the only place Python belongs — per-batch, never
per-row).

Decoder kernels (:mod:`.codecs`) are REAL for every format decodable with
the standard library + numpy — WAV (8/16/32-bit PCM), BMP (24/32-bit), PPM/
PGM, and PNG (8-bit, all five scanline filters) — and dispatch on the
``meta.mime`` column. The resize stage (:func:`resize_images`) and the
frame-sampling stage (:func:`sample_frames`, over concatenated-PPM/PGM
animation payloads) are REAL too — decode → transform → re-encode, all
three value-hashed by the driver gate. Entropy-coded formats (JPEG, video
containers) stay behind an import-try of the optional real libraries.
``decoder="fake"`` remains for payloads with no parseable format (a
deterministic md5-seeded vector) and for determinism tests.

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

from alphastats_spark.functions import codecs

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


def _real_features(payload: bytes, mime: str, dim: int) -> list[float]:
    """Mime-dispatched real decode + feature extraction (codecs kernels)."""
    if mime in codecs.SUPPORTED_AUDIO_MIMES:
        samples, sample_rate = codecs.decode_wav(payload)
        return codecs.audio_features(samples, sample_rate, dim)
    img = codecs.decode_image(payload, mime)  # raises on unsupported mime
    return codecs.image_features(img, dim)


def decode_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: str = "fake",
    dim: int = FEATURE_DIM,
    mime_col: str = "meta.mime",
    on_error: str = "raise",
    passthrough_cols: tuple[str, ...] = (),
) -> DataFrame:
    """binary payloads → fixed-size float features via Arrow-batched mapInPandas.

    ``decoder="real"`` dispatches on the mime column to the dependency-free
    codec kernels (WAV/BMP/PPM/PGM/PNG — :mod:`.codecs`); unsupported mimes
    raise, or yield a null feature row with ``on_error="null"`` (the
    pipeline-friendly mode: corrupt payloads must not kill a 100 TB job).
    ``decoder="fake"`` keeps the deterministic md5-seeded vector.
    ``passthrough_cols`` names top-level columns carried through unchanged
    (e.g. ``frame_idx`` from :func:`sample_frames`, whose id column alone
    is not unique per row).
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if on_error not in ("raise", "null"):
        raise ValueError(f"unknown on_error {on_error!r}")

    pass_fields = [df.schema[c] for c in passthrough_cols]
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            *pass_fields,
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )
    cols = [F.col(id_col)]
    cols += [F.col(c) for c in passthrough_cols]
    cols.append(F.col(content_col).alias("__content"))
    if decoder == "real":
        cols.append(F.col(mime_col).alias("__mime"))

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            feats = []
            for i in range(len(pdf)):
                payload = pdf["__content"].iloc[i]
                payload = bytes(payload) if payload is not None else b""
                if decoder == "fake":
                    feats.append(_fake_features(payload, dim))
                    continue
                try:
                    feats.append(_real_features(payload, pdf["__mime"].iloc[i], dim))
                except Exception:
                    if on_error == "raise":
                        raise
                    feats.append(None)
            out = {id_col: pdf[id_col]}
            for c in passthrough_cols:
                out[c] = pdf[c]
            out["features"] = feats
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(batches, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL image resize stage: decode (mime-dispatched codec kernels) →
    nearest-neighbor resize → re-encode as binary PPM/PGM, with the meta
    struct rewritten to the new dims and mime. Same Arrow-batched
    ``mapInPandas`` shape as :func:`decode_features` — payload columns never
    leave the executor as rows.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            contents, metas = [], []
            for i in range(len(pdf)):
                payload = bytes(pdf["__content"].iloc[i] or b"")
                img = codecs.decode_image(payload, pdf["__mime"].iloc[i])
                resized = codecs.resize_nearest(img, width, height)
                contents.append(codecs.encode_ppm(resized))
                metas.append(
                    {
                        "mime": "image/x-portable-pixmap"
                        if resized.ndim == 3
                        else "image/x-portable-graymap",
                        "width": width,
                        "height": height,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "content": contents, "meta": metas}
            )

    return df.select(
        F.col(id_col), F.col(content_col).alias("__content"), F.col("meta.mime").alias("__mime")
    ).mapInPandas(batches, MEDIA_SCHEMA)


def transcode_images(
    df: DataFrame,
    to_mime: str = "image/jpeg",
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL format-transcode stage: decode (mime-dispatched codec kernels)
    → re-encode to ``to_mime`` (jpeg / png / ppm), meta rewritten. The
    standard normalization step when a crawled corpus carries a mix of
    formats and downstream kernels want exactly one. Same Arrow-batched
    ``mapInPandas`` shape as :func:`resize_images`.
    """
    encoders = {
        "image/jpeg": codecs.encode_jpeg,
        "image/png": codecs.encode_png,
        "image/x-portable-pixmap": codecs.encode_ppm,
        "image/x-portable-graymap": codecs.encode_ppm,
    }
    if to_mime not in encoders:
        raise ValueError(f"no encoder for {to_mime!r} (have {sorted(encoders)})")
    encode = encoders[to_mime]

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            contents, metas = [], []
            for i in range(len(pdf)):
                payload = bytes(pdf["__content"].iloc[i] or b"")
                img = codecs.decode_image(payload, pdf["__mime"].iloc[i])
                contents.append(encode(img))
                h, w = img.shape[:2]
                mime = to_mime
                if encode is codecs.encode_ppm:  # P6 vs P5 follows the data
                    mime = (
                        "image/x-portable-pixmap"
                        if img.ndim == 3
                        else "image/x-portable-graymap"
                    )
                metas.append(
                    {"mime": mime, "width": w, "height": h, "duration_ms": None}
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "content": contents, "meta": metas}
            )

    return df.select(
        F.col(id_col), F.col(content_col).alias("__content"), F.col("meta.mime").alias("__mime")
    ).mapInPandas(batches, MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        *MEDIA_SCHEMA.fields[1:],  # content, meta
    ]
)


def sample_frames(
    df: DataFrame,
    every: int = 2,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL frame-sampling stage over concatenated-PPM/PGM animation
    payloads (the dependency-free multi-frame container): parse the frame
    boundaries, keep every ``every``-th frame, emit ONE ROW PER SAMPLED
    FRAME with its standalone image payload and rewritten metadata.

    Same Arrow-batched ``mapInPandas`` shape as the decode/resize stages —
    this is the row-exploding variant (a batch of n animations yields
    Σ ceil(frames/every) rows). Downstream stages (:func:`decode_features`,
    :func:`resize_images`) consume the output unchanged.
    """
    if every < 1:
        raise ValueError("every must be >= 1")

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, idxs, contents, metas = [], [], [], []
            for i in range(len(pdf)):
                payload = bytes(pdf["__content"].iloc[i] or b"")
                frames = codecs.split_ppm_frames(payload)
                for fi in range(0, len(frames), every):
                    fb = frames[fi]
                    magic, w, h, _, _ = codecs._ppm_header(fb)
                    ids.append(pdf[id_col].iloc[i])
                    idxs.append(fi)
                    contents.append(fb)
                    metas.append(
                        {
                            "mime": "image/x-portable-pixmap"
                            if magic == b"P6"
                            else "image/x-portable-graymap",
                            "width": w,
                            "height": h,
                            "duration_ms": None,
                        }
                    )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "content": pd.Series(contents, dtype="object"),
                    "meta": pd.Series(metas, dtype="object"),
                }
            )

    return df.select(
        F.col(id_col), F.col(content_col).alias("__content")
    ).mapInPandas(batches, FRAME_SCHEMA)
