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


class PillowDecoder:
    """Real image decode via Pillow, when the library is present.

    Same interface as FakeDecoder: decode(payload, h, w) -> (h, w, 3)
    uint8. The h/w arguments are the TARGET shape from the metadata
    struct (the real image is resized to match), so downstream feature
    math is identical whichever decoder runs.
    """

    @staticmethod
    def available() -> bool:
        try:
            import PIL  # noqa: F401

            return True
        except ImportError:
            return False

    @staticmethod
    def decode(payload: bytes, h: int, w: int) -> np.ndarray:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("RGB").resize((w, h))
        return np.asarray(img, dtype=np.uint8)


def default_decoder():
    """PillowDecoder when the container has Pillow, else the documented
    closed-form stub. Resolved INSIDE the executor-side kernel, so the
    driver never needs the media lib installed."""
    return PillowDecoder if PillowDecoder.available() else FakeDecoder


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def image_features(media: DataFrame, resize_to: int = 8, decoder=None) -> DataFrame:
    """Per-image features via mapInPandas: decode -> resize -> 8x8 luma
    grid feature + mean luminance. Arrow-batched; the numpy body
    processes the whole batch with no per-row Python beyond the decode
    call itself (IO-bound in real use).

    ``decoder``: any object with decode(payload, h, w) -> (h, w, 3)
    uint8. Default: PillowDecoder when Pillow is importable on the
    executors, else the closed-form FakeDecoder stub (this container
    ships no media libs). The seam is resolved inside the kernel, so a
    cluster with Pillow installed gets real decode with zero code
    change."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = decoder if decoder is not None else default_decoder()
        for pdf in batches:
            ids, lumas, feats = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                h = int(meta["height"] or 32)
                w = int(meta["width"] or 32)
                img = dec.decode(payload, h, w).astype(np.int64)
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


def audio_features(media: DataFrame, decoder=None) -> DataFrame:
    """Per-clip pseudo-waveform stats (decode stub; same seam as
    image_features). Mean and population std are computed from exact
    integer sums — mean = s/n, std = sqrt(n*ssq - s^2)/n — so one float
    division / sqrt each, bit-identical to an external SQL oracle fed
    the same integers."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # default stays FakeDecoder even when Pillow is present:
        # PillowDecoder is an IMAGE decoder and would be semantically
        # wrong for waveforms — a real deployment passes a torchaudio/
        # ffmpeg-backed object through the ``decoder`` seam.
        dec = decoder if decoder is not None else FakeDecoder
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                sr = int(meta["sample_rate"] or 16000)
                n = min(sr, 4096)
                wave = dec.decode(payload, 1, n)[0, :, 0].astype(np.int64)
                s = int(wave.sum())
                ssq = int((wave * wave).sum())
                mean = float(s) / n
                std = float(np.sqrt(float(n * ssq - s * s))) / n
                rows.append((mid, mean, std))
            yield pd.DataFrame(rows, columns=["media_id", "wave_mean", "wave_std"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("wave_mean", T.DoubleType()),
            T.StructField("wave_std", T.DoubleType()),
        ]
    )
    return media.filter(F.col("kind") == "audio").mapInPandas(kernel, schema=schema)
