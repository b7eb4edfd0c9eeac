"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas`` (the batch-at-a-time
callback shape of the reference's user sink, `include/paragrapher.h:93`).

The image/audio codec libraries are NOT in this container, so the decode
kernels are STUBS behind ``codec="fake"``: a deterministic,
seeded-from-payload-hash fake that exercises the real Spark plumbing —
schema, batching, partitioning, output shapes — end to end. ``codec="real"``
raises NotImplementedError at the exact point a PIL/ffmpeg call would go.

Scale notes: payload columns never pass through a shuffle here — every
operator is a map-only stage (mapInPandas), so 100 TB of media moves only
scan-side; metadata-only projections (``media_stats``) prune the binary
column at the parquet reader (check ReadSchema in .explain).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int, codec string"
)


def synth_media(spark: SparkSession, n: int = 100, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table: payload = sha256-seeded bytes."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), 3) + 1).cast("int"),
    )
    payload = F.to_binary(
        F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256), F.lit("hex")
    )
    return spark.range(0, n, 1, partitions).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 1024) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 768) + 16).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 60000) + 100).cast("int").alias("duration_ms"),
        F.lit("fake").alias("codec"),
    )


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_image_features(
    media: DataFrame, codec: str = "fake", feat_dim: int = 8
) -> DataFrame:
    """(media_id, features: array<float>, mean_luma: double) — decode +
    feature-extract. Real plumbing, stubbed codec."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, lumas = [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if codec != "fake":
                    raise NotImplementedError(
                        "real image decoding requires PIL/libjpeg — not in "
                        "this container; plumbing is exercised via codec='fake'"
                    )
                px = _fake_pixels(bytes(payload), int(w), int(h))
                luma = float(
                    (0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]).mean()
                )
                hist = np.histogram(px[..., 0], bins=feat_dim, range=(0, 256))[0]
                feats.append((hist / hist.sum()).astype(np.float32).tolist())
                lumas.append(luma)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": feats,
                    "mean_luma": pd.Series(lumas, dtype="float64"),
                }
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload", "width", "height")
        .mapInPandas(batch, schema="media_id long, features array<float>, mean_luma double")
    )


def resize_image(media: DataFrame, out_w: int, out_h: int, codec: str = "fake") -> DataFrame:
    """(media_id, payload) resized payloads — fake path re-derives a
    deterministic payload for the new dimensions."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = []
            for payload in pdf["payload"]:
                if codec != "fake":
                    raise NotImplementedError("real resize needs an image codec")
                digest = hashlib.sha256(
                    bytes(payload) + f"{out_w}x{out_h}".encode()
                ).digest()
                outs.append(digest)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": outs,
                    "width": out_w,
                    "height": out_h,
                }
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(
            batch, schema="media_id long, payload binary, width int, height int"
        )
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, codec: str = "fake", max_frames: int = 32
) -> DataFrame:
    """(media_id, frame_idx, ts_ms, payload) — frame sampling for video
    rows; one output row per sampled frame (flatMap shape)."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, payloads = [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if codec != "fake":
                    raise NotImplementedError("real frame sampling needs ffmpeg")
                n = min(max_frames, max(1, int(dur) // every_ms))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    payloads.append(
                        hashlib.sha256(bytes(payload) + i.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "payload": payloads,
                }
            )

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "payload", "duration_ms")
        .mapInPandas(
            batch,
            schema="media_id long, frame_idx int, ts_ms long, payload binary",
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must NOT read the payload column (column
    pruning; verify via .explain ReadSchema)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )
