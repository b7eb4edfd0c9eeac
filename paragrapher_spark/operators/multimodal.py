"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas`` (the batch-at-a-time
callback shape of the reference's user sink, `include/paragrapher.h:93`).

Codec tiers:

- ``codec="fake"`` — deterministic, seeded-from-payload-hash fake that
  exercises the Spark plumbing (schema, batching, partitioning, output
  shapes) without any real decoding.
- ``codec="real"`` — REAL pure-python/numpy codecs for the two formats
  that need no external library: binary PPM (P6) images and PCM-16 WAV
  audio (decode, feature-extract, nearest-neighbor resize). Compressed
  formats (JPEG/MP3/H.264) would need PIL/ffmpeg, which are not in this
  container — those payloads raise NotImplementedError at the exact call
  site, with the magic bytes named.

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
    """Deterministic fake media table: payload = sha256-seeded bytes.

    Metadata columns use plain modular arithmetic (not engine-specific hash
    functions) so an ANSI-SQL oracle can regenerate them exactly — that is
    what puts ``media_stats`` under the DuckDB correctness gate."""
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
        (F.pmod(F.col("id") * 37 + 11, 1024) + 16).cast("int").alias("width"),
        (F.pmod(F.col("id") * 53 + 7, 768) + 16).cast("int").alias("height"),
        (F.pmod(F.col("id") * 97 + 13, 60000) + 100).cast("int").alias("duration_ms"),
        F.lit("fake").alias("codec"),
    )


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# real pure-python codecs: binary PPM (P6) and PCM-16 WAV
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a binary PPM (P6) payload."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse a binary PPM (P6) payload to an (h, w, 3) uint8 array.
    Handles whitespace/comment-tolerant headers per the netpbm spec."""
    if payload[:2] != b"P6":
        raise NotImplementedError(
            f"unsupported image magic {payload[:2]!r}: only binary PPM (P6) "
            "decodes without external codec libraries (JPEG/PNG need "
            "PIL/libjpeg, not in this container)"
        )
    # header = magic, width, height, maxval tokens (comments start with #)
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 mono samples as a PCM-16 WAV (RIFF) payload."""
    import struct

    assert samples.dtype == np.int16
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM-16 WAV payload -> (int16 samples, sample_rate).
    Walks RIFF chunks, so extra chunks (LIST, fact) are tolerated."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            f"unsupported audio magic {payload[:4]!r}: only RIFF/WAVE PCM "
            "decodes without external codec libraries"
        )
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1:
                raise NotImplementedError("only PCM WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    if bits != 16 or channels != 1:
        raise NotImplementedError("only 16-bit mono PCM supported")
    return np.frombuffer(data, dtype=np.int16), rate


def synth_real_media(spark: SparkSession, n: int = 24, partitions: int = 4) -> DataFrame:
    """Media table whose payloads are REAL encoded formats: even ids carry
    a deterministic gradient PPM image, odd ids a deterministic sine-tone
    WAV clip — the end-to-end fixtures for ``codec="real"``."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i % 2 == 0:
                    w, h = 16 + (i % 7) * 4, 12 + (i % 5) * 4
                    yy, xx = np.mgrid[0:h, 0:w]
                    px = np.stack(
                        [
                            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                            np.full((h, w), i % 256, dtype=np.uint8),
                        ],
                        axis=-1,
                    )
                    rows.append(
                        (i, "image", encode_ppm(px), w, h, 0, "ppm")
                    )
                else:
                    rate, dur_ms = 16000, 40 + (i % 5) * 20
                    t = np.arange(rate * dur_ms // 1000)
                    freq = 220.0 + 55.0 * (i % 8)
                    samp = (
                        np.sin(2 * np.pi * freq * t / rate) * 12000
                    ).astype(np.int16)
                    rows.append(
                        (i, "audio", encode_wav(samp, rate), 0, 0, dur_ms, "wav")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height",
                    "duration_ms", "codec",
                ],
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image_features(
    media: DataFrame, codec: str = "fake", feat_dim: int = 8
) -> DataFrame:
    """(media_id, features: array<float>, mean_luma: double) — decode +
    feature-extract. ``codec="real"`` decodes binary PPM payloads with the
    pure-numpy parser above (non-PPM magic raises NotImplementedError
    naming the missing library); ``codec="fake"`` derives deterministic
    pixels from the payload hash (plumbing-only mode)."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, lumas = [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if codec == "fake":
                    px = _fake_pixels(bytes(payload), int(w), int(h))
                elif codec == "real":
                    px = decode_ppm(bytes(payload))
                else:
                    raise ValueError(f"unknown codec mode: {codec!r}")
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


def decode_audio_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """(media_id, sample_rate, n_samples, rms, peak) — audio decode +
    feature-extract. ``codec="real"`` parses PCM-16 WAV payloads (RIFF
    chunk walk, pure struct/numpy); ``codec="fake"`` hash-derives stats."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if codec == "fake":
                    seed = int.from_bytes(
                        hashlib.sha256(bytes(payload)).digest()[:8], "little"
                    )
                    rng = np.random.default_rng(seed)
                    samp = rng.integers(-32768, 32768, size=256).astype(np.int16)
                    rate = 16000
                elif codec == "real":
                    samp, rate = decode_wav(bytes(payload))
                else:
                    raise ValueError(f"unknown codec mode: {codec!r}")
                x = samp.astype(np.float64)
                rows.append(
                    (
                        int(mid),
                        int(rate),
                        int(len(samp)),
                        float(np.sqrt((x * x).mean())) if len(x) else 0.0,
                        float(np.abs(x).max()) if len(x) else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "rms", "peak"],
            )

    return (
        media.where(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(
            batch,
            schema="media_id long, sample_rate int, n_samples long, "
            "rms double, peak double",
        )
    )


def resize_image(media: DataFrame, out_w: int, out_h: int, codec: str = "fake") -> DataFrame:
    """(media_id, payload, width, height) resized payloads.
    ``codec="real"``: nearest-neighbor resample of PPM payloads (numpy
    index maps — a real, verifiable transform); ``codec="fake"``: derives
    a deterministic placeholder payload for the new dimensions."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = []
            for payload in pdf["payload"]:
                if codec == "fake":
                    outs.append(
                        hashlib.sha256(
                            bytes(payload) + f"{out_w}x{out_h}".encode()
                        ).digest()
                    )
                elif codec == "real":
                    px = decode_ppm(bytes(payload))
                    h, w, _ = px.shape
                    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                    outs.append(encode_ppm(px[yi][:, xi]))
                else:
                    raise ValueError(f"unknown codec mode: {codec!r}")
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
