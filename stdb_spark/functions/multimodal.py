"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container this repo is developed in has no image/audio codecs, so
the *decode* step is stubbed behind ``DecodeUnavailable`` or a
deterministic fake — but everything Spark-side is real and tested:
schema, Arrow batch shape (mapInPandas), partition sizing, and the
pipeline contract (decode -> feature -> filter).  Swapping the stub for
Pillow/torchaudio changes one function body, not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by real decode paths in this container (no codec libs)."""


def make_fake_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake payloads (seeded bytes) for plumbing tests."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(i)
        payload = bytes(rng.integers(0, 256, size=256, dtype=np.uint8))
        rows.append((i, kind, f"{kind}/fake", 32, 24, 1000 + i, payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB — a real deployment decodes with Pillow/libjpeg.
    Raises DecodeUnavailable to make the boundary explicit."""
    raise DecodeUnavailable("image codecs not present in this container")


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in: payload bytes tiled to (height, width)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(width * height / arr.size))
    return np.tile(arr, reps)[: width * height].reshape(height, width)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("std_px", T.DoubleType()),
        T.StructField("n_px", T.LongType()),
    ]
)


def extract_image_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of (payload, dims)
    -> per-image statistics.  The UDF sees columnar batches, never
    row-at-a-time Python; executors stream partitions, so a 100 TB media
    table is bounded by `spark.sql.files.maxPartitionBytes`, not RAM."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "mean_px": [], "std_px": [], "n_px": []}
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                img = _fake_decode(payload, int(w), int(h))
                out["media_id"].append(int(mid))
                out["mean_px"].append(float(img.mean()))
                out["std_px"].append(float(img.std()))
                out["n_px"].append(int(img.size))
            yield pd.DataFrame(out)

    return df.select("media_id", "payload", "width", "height").mapInPandas(
        fn, schema=FEATURE_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas audio features over the fake-PCM decode: RMS level and
    zero-crossing count — the standard cheap audio-quality signals a
    training pipeline filters on.  Same Arrow-batch contract as
    extract_image_features; a real deployment swaps the decode for
    torchaudio/ffmpeg without touching the plan."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "duration_ms": [], "rms": [],
                "zero_crossings": [], "n_samples": [],
            }
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                # fake PCM: payload bytes centered to [-128, 127]
                pcm = np.frombuffer(payload, dtype=np.uint8).astype(np.int16) - 128
                out["media_id"].append(int(mid))
                out["duration_ms"].append(int(dur))
                out["rms"].append(float(np.sqrt(np.mean(pcm.astype("f8") ** 2))))
                out["zero_crossings"].append(
                    int(np.count_nonzero(np.diff(np.signbit(pcm))))
                )
                out["n_samples"].append(int(pcm.size))
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "audio").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(fn, schema=AUDIO_FEATURE_SCHEMA)


def resize_plan(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: emits (media_id, payload, target dims) with the
    decode/resize marked; the actual pixel work is the same mapInPandas
    shape as extract_image_features."""
    return df.select(
        "media_id",
        "payload",
        F.lit(target_w).alias("target_w"),
        F.lit(target_h).alias("target_h"),
    )


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (explode of a sequence) — the decode of each frame is the
    stubbed boundary."""
    ticks = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return df.filter(F.col("kind") == "video").select(
        "media_id", F.explode(ticks).alias("frame_ms"), "payload"
    )


PHASH_SCHEMA = "media_id long, phash long"


def image_phash(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """64-bit perceptual hash per image (classic DCT pHash: decode →
    grayscale 32×32 → 2D DCT-II → top-left 8×8 low-frequency block →
    bit = coefficient > median).  Near-duplicate images differ in a few
    bits, so the output column feeds ``dedup.hamming_pairs`` unchanged —
    the multimodal twin of SimHash text dedup, same full-recall
    pigeonhole pairing, same one-shuffle plan.

    Arrow-batched mapInPandas; the DCT is a fixed 32×32 matrix multiply
    per image (numpy, vectorized).  Decode is the deterministic stub
    (_fake_decode) in this container — swapping in a real codec changes
    no Spark plumbing."""
    N = 32

    # DCT-II basis (orthonormal), fixed small matrix shared per batch
    k = np.arange(N)
    basis = np.sqrt(2.0 / N) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * N))
    basis[0, :] = np.sqrt(1.0 / N)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = _fake_decode(bytes(payload), N, N).astype(np.float64)
                coeffs = basis @ img @ basis.T
                block = coeffs[:8, :8].flatten()
                # threshold = median of the 63 AC terms (DC excluded:
                # it tracks brightness, not structure) but ALL 64
                # coefficients contribute a bit — a full 64-bit hash,
                # bit i from block[i]
                med = float(np.median(block[1:]))
                bits = 0
                for i, c in enumerate(block):
                    if c > med:
                        bits |= 1 << i
                # two's-complement into signed 64-bit (bit 63 = sign)
                if bits >= 1 << 63:
                    bits -= 1 << 64
                out.append((int(mid), bits))
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return df.select("media_id", "payload").mapInPandas(fn, schema=PHASH_SCHEMA)
