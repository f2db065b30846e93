"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over mapInPandas. The decode kernels are STUBBED (no
image/audio libraries in this container) behind ``FakeDecoder`` — a
deterministic stand-in so the Spark-side plumbing (schema, batching,
partitioning, UDF signatures) is real and tested; swapping in Pillow/
torchaudio later only replaces the numpy body.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)


class FakeDecoder:
    """Deterministic decode stub: payload bytes -> pseudo-pixels.

    Real deployments replace decode() with Pillow/ffmpeg; everything
    downstream (batch shape, dtype, feature math) is unchanged.

    The stub is CLOSED-FORM, not RNG-based, so downstream statistics
    are reproducible by an external SQL oracle: flattened pixel ``m``
    of the (h, w, 3) image is ``md5(payload).digest()[m % 16]``, i.e.
    the 16 digest bytes tiled across the image. Mean luminance then
    reduces to ``(hw//16) * 1000 * sum(digest) + tail`` over the first
    ``hw % 16`` pixels (one 16-pixel period contributes exactly
    ``(299+587+114) * sum(digest)``), which DuckDB can evaluate from
    ``md5(text)`` alone — see queries.SQL_IMAGE_FEATURES.
    """

    @staticmethod
    def decode(payload: bytes, h: int, w: int) -> np.ndarray:
        digest = np.frombuffer(hashlib.md5(payload or b"").digest(), dtype=np.uint8)
        n = h * w * 3
        return np.tile(digest, -(-n // 16))[:n].reshape(h, w, 3)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def image_features(media: DataFrame, resize_to: int = 8) -> DataFrame:
    """Per-image features via mapInPandas: decode (stub) -> resize ->
    8x8 luma grid feature + mean luminance. Arrow-batched; the numpy
    body processes the whole batch with no per-row Python beyond the
    decode call itself (IO-bound in real use)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, lumas, feats = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                h = int(meta["height"] or 32)
                w = int(meta["width"] or 32)
                img = FakeDecoder.decode(payload, h, w).astype(np.int64)
                # integer-scaled BT.601 luma (x1000): the per-image mean is
                # then ONE exact int/int double division, bit-identical to
                # what an external SQL oracle computes from the same ints.
                luma_scaled = 299 * img[..., 0] + 587 * img[..., 1] + 114 * img[..., 2]
                # nearest-neighbor resample handles any h/w >= 1
                rows = np.arange(resize_to) * h // resize_to
                cols = np.arange(resize_to) * w // resize_to
                small = luma_scaled[rows][:, cols] / 1000.0
                ids.append(mid)
                lumas.append(float(luma_scaled.sum()) / (1000.0 * h * w))
                feats.append(small.flatten().astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": ids, "mean_luma": lumas, "feature": feats})

    return media.filter(F.col("kind") == "image").mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan: explode frame indices 0, n, 2n, ...
    (decode of individual frames is the stubbed step)."""
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
    return (
        media.filter((F.col("kind") == "video") & (F.col("meta.n_frames") > 0))
        .select("media_id", F.explode(idx).alias("frame_idx"))
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Audio stub: deterministic pseudo-waveform stats per clip."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                sr = int(meta["sample_rate"] or 16000)
                wave = FakeDecoder.decode(payload, 1, min(sr, 4096))[0, :, 0].astype(np.float64)
                rows.append((mid, float(wave.mean()), float(wave.std())))
            yield pd.DataFrame(rows, columns=["media_id", "wave_mean", "wave_std"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("wave_mean", T.DoubleType()),
            T.StructField("wave_std", T.DoubleType()),
        ]
    )
    return media.filter(F.col("kind") == "audio").mapInPandas(kernel, schema=schema)
