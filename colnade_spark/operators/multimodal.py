"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side design is REAL and tested — schemas, partitioning, UDF
signatures, batch shapes. The actual media decode is STUBBED behind
``NotImplementedError`` (no image/audio libraries in this container) with a
deterministic fake decoder for exercising the pipeline end-to-end.

At 100 TB: media bytes stay in executor-side Arrow batches (never
collected); decode/resize/frame-sample parallelism is per input split;
``spark.sql.files.maxPartitionBytes`` bounds batch memory; derived features
are small typed columns so downstream joins/aggs shuffle features, not
media bytes.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata carried alongside the opaque payload.
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_TYPE, True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("std_intensity", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an encoded image payload to an HxWx3 uint8 array.

    STUB: real decoding needs PIL/opencv, which are not available in this
    container. Use ``fake_decode_image`` (deterministic) to exercise the
    pipeline, or inject a real decoder into ``image_features``.
    """
    raise NotImplementedError(
        "image decoding requires PIL/opencv (not installed); pass "
        "decoder=fake_decode_image for a deterministic stand-in"
    )


def fake_decode_image(payload: bytes, size: int = 16) -> np.ndarray:
    """Deterministic fake decoder: expands the payload digest into a
    ``size×size×3`` uint8 'image'. Stable across runs/processes — usable in
    tests and oracle checks."""
    # counter-mode expansion: each 32-byte block gets its own digest, so
    # the fake image has full entropy (a single tiled digest made every
    # 8-row block identical — degenerate phashes with frequent collisions).
    # The counter suffix is ASCII (":i", not packed bytes) so a SQL oracle
    # can replay the expansion with VARCHAR sha256 (DuckDB's sha256 does
    # not accept BLOB): sha256(text || ':' || i) over the UTF-8 payload.
    need = size * size * 3
    blocks = []
    for i in range((need + 31) // 32):
        blocks.append(
            hashlib.sha256((payload or b"") + b":" + str(i).encode()).digest()
        )
    raw = np.frombuffer(b"".join(blocks), dtype=np.uint8)
    return raw[:need].reshape(size, size, 3)


def _phash64(img: np.ndarray) -> int:
    """Tiny perceptual-hash: 8x8 mean-threshold bits of the grayscale image.

    Integer formulation (block GRAY-SUM × 64 vs total gray-sum over the
    truncated region — identical bits to block-mean > mean-of-block-means
    for equal-size blocks): exact, tie-stable, and replayable in integer
    SQL, where the float version's ~1e-12 rounding could flip a bit on an
    exact rational tie."""
    g3 = img.astype(np.int64).sum(axis=2)  # 3 x gray, exact integers
    h, w = g3.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    t = g3[: bh * 8, : bw * 8]
    blocks = t.reshape(8, bh, 8, bw).sum(axis=(1, 3))
    bits = (blocks * 64 > int(t.sum())).flatten()
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out - (1 << 64) if out >= 1 << 63 else out


def image_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = decode_image,
) -> DataFrame:
    """Decode + feature-extract images via Arrow-batched mapInPandas.

    The UDF receives an iterator of pandas batches (bounded memory per
    executor thread) and emits small typed feature rows — media bytes never
    leave the executor.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {
                "media_id": [],
                "width": [],
                "height": [],
                "mean_intensity": [],
                "std_intensity": [],
                "phash": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decoder(payload)
                out["media_id"].append(mid)
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                # integer-moment formulation: sum / sum-of-squares are exact
                # int64, so mean and std reduce to a FIXED sequence of IEEE
                # ops — bit-reproducible by a SQL oracle, unlike np.mean/
                # np.std whose pairwise-summation order is private.
                n = float(img.size)
                s = int(img.sum(dtype=np.int64))
                ss = int((img.astype(np.int64) ** 2).sum())
                out["mean_intensity"].append(s / n)
                out["std_intensity"].append(math.sqrt((ss - s * s / n) / n))
                out["phash"].append(_phash64(img))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        extract, schema=IMAGE_FEATURES_SCHEMA
    )


def resize_images(
    media: DataFrame,
    target: int = 64,
    decoder: Callable[[bytes], np.ndarray] = decode_image,
) -> DataFrame:
    """Re-encode images at a target size. Decode is pluggable (stubbed);
    the 'resize' here is nearest-neighbor sampling in numpy and the output
    payload is the raw RGB buffer — schema/batching plumbing is the point."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decoder(payload)
                h, w = img.shape[:2]
                yi = (np.arange(target) * h // target).clip(0, h - 1)
                xi = (np.arange(target) * w // target).clip(0, w - 1)
                resized = img[yi][:, xi]
                ids.append(mid)
                payloads.append(resized.astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return media.select("media_id", "payload").mapInPandas(
        work,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), True),
            ]
        ),
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
    ]
)


def decode_audio(payload: bytes) -> np.ndarray:
    """Decode an encoded audio payload to a float32 mono waveform.

    STUB: real decoding needs soundfile/ffmpeg (not in this container); use
    ``fake_decode_audio`` to exercise the pipeline."""
    raise NotImplementedError(
        "audio decoding requires soundfile/ffmpeg (not installed); pass "
        "decoder=fake_decode_audio for a deterministic stand-in"
    )


def fake_decode_audio(payload: bytes, n: int = 1024) -> np.ndarray:
    """Deterministic fake decoder: digest-seeded waveform in [-1, 1]."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
    reps = (n + len(raw) - 1) // len(raw)
    wave = np.tile(raw, reps)[:n]
    return ((wave / 127.5) - 1.0).astype(np.float32)


def audio_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = decode_audio,
) -> DataFrame:
    """Waveform feature extraction (RMS, peak, zero-crossing count) via
    Arrow-batched mapInPandas — same plumbing contract as image_features."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {
                "media_id": [],
                "n_samples": [],
                "rms": [],
                "peak": [],
                "zero_crossings": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                wave = decoder(payload).astype(np.float64)
                out["media_id"].append(mid)
                out["n_samples"].append(len(wave))
                out["rms"].append(float(np.sqrt(np.mean(wave**2))) if len(wave) else None)
                out["peak"].append(float(np.abs(wave).max()) if len(wave) else None)
                out["zero_crossings"].append(
                    int((np.diff(np.signbit(wave)) != 0).sum())
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        extract, schema=AUDIO_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling plan for video payloads: emits (media_id, frame_ts_ms)
    rows from the metadata duration — the decode of actual frames is the
    stubbed step. Pure built-ins: explode over a generated sequence."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        rows.append(
            (
                i,
                payload,
                ("image", "png", 16, 16, None, None)
                if i % 3 != 0
                else ("video", "mp4", 320, 240, 5000, None),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def image_near_dups(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = decode_image,
    max_hamming: int = 3,
) -> DataFrame:
    """Image near-duplicate candidate pairs: decode → 64-bit perceptual
    hash → Charikar 16-bit chunk blocking (reuses the text-side
    ``dedup.simhash_near_pairs`` machinery — the blocking is modality-
    agnostic once content is a 64-bit sketch). Pairs within hamming ≤ 3
    are guaranteed found; media bytes never cross a shuffle — only
    (media_id, phash) rows do."""
    from colnade_spark.operators.dedup import simhash_near_pairs

    feats = image_features(media, decoder=decoder).select("media_id", "phash")
    return simhash_near_pairs(
        feats, id_col="media_id", sim_col="phash", max_hamming=max_hamming
    )


def dedup_images(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = decode_image,
    max_hamming: int = 3,
) -> DataFrame:
    """Surviving media_ids after perceptual near-dedup (keep-smallest-id,
    same policy as the text dedups)."""
    pairs = image_near_dups(media, decoder, max_hamming)
    dups = pairs.select(F.col("id_b").alias("media_id")).distinct()
    return media.select("media_id").join(dups, "media_id", "left_anti")


def sniff_media_format(payload):
    """REAL (decode-free) media format detection from magic bytes —
    pure built-in hex/substring comparisons, scan-speed, no UDF. Covers
    the common container/codec signatures; returns NULL for unknown or
    NULL payloads. The first line of defense against corrupt or
    mislabeled media at ingest (a 'jpeg' row whose bytes say RIFF/WAVE
    is mislabeled, not decodable)."""
    h = F.hex(F.substring(payload, 1, 12))
    riff = h.startswith("52494646")  # 'RIFF' — container: tag at bytes 9-12
    tag = F.substring(h, 17, 8)
    return (
        F.when(h.startswith("89504E470D0A1A0A"), "png")
        .when(h.startswith("FFD8FF"), "jpeg")
        .when(h.startswith("474946383761") | h.startswith("474946383961"), "gif")
        .when(riff & (tag == "57454250"), "webp")   # 'WEBP'
        .when(riff & (tag == "57415645"), "wav")    # 'WAVE'
        .when(riff & (tag == "41564920"), "avi")    # 'AVI '
        .when(h.startswith("664C6143"), "flac")     # 'fLaC'
        .when(h.startswith("4F676753"), "ogg")      # 'OggS'
        .when(
            h.startswith("494433")                   # 'ID3'
            | h.startswith("FFFB") | h.startswith("FFF3") | h.startswith("FFF2"),
            "mp3",
        )
        .when(F.substring(h, 9, 8) == "66747970", "mp4")  # 'ftyp' at byte 5
        .when(h.startswith("1A45DFA3"), "webm")     # EBML (webm/mkv)
        .otherwise(F.lit(None).cast("string"))
    )


def media_format_mismatches(media: DataFrame) -> DataFrame:
    """(media_id, declared, sniffed): rows whose declared meta.format
    disagrees with the magic bytes (jpg/jpeg normalized) — including
    payloads whose signature is unrecognized (sniffed NULL). Scan-speed
    projection + filter; media bytes never leave the scan."""
    declared = F.lower(F.col("meta.format"))
    declared = F.when(declared == "jpg", "jpeg").otherwise(declared)
    sniffed = sniff_media_format(F.col("payload"))
    out = media.select(
        "media_id",
        declared.alias("declared"),
        sniffed.alias("sniffed"),
    )
    return out.filter(
        F.col("declared").isNotNull()
        & ~F.col("sniffed").eqNullSafe(F.col("declared"))
    )


def byte_stats(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL per-payload byte statistics via one Arrow-batched pandas
    pass: length, distinct byte count, and Shannon entropy in bits/byte
    (0 for constant payloads, ->8 for uniform random). Encrypted or
    compressed media sits near 8; truncated/zero-padded payloads fall
    out of their format's typical band — a cheap corruption screen that
    needs no decoder. Media bytes stay in executor Arrow batches."""

    def _stats(s: pd.Series) -> pd.DataFrame:
        out = []
        for b in s:
            if b is None or len(b) == 0:
                out.append((0, 0, 0.0))
                continue
            arr = np.frombuffer(bytes(b), dtype=np.uint8)
            counts = np.bincount(arr, minlength=256)
            nz = counts[counts > 0]
            p = nz / arr.size
            ent = float(-(p * np.log2(p)).sum())
            out.append((int(arr.size), int(nz.size), ent))
        return pd.DataFrame(
            out, columns=["n_bytes", "n_distinct_bytes", "entropy_bits"]
        )

    _stats.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
    udf = F.pandas_udf(
        _stats,
        "struct<n_bytes: long, n_distinct_bytes: long, entropy_bits: double>",
    )
    other = [c for c in media.columns if c != payload_col]
    return media.select(*other, udf(F.col(payload_col)).alias("_bs")).select(
        *other, "_bs.n_bytes", "_bs.n_distinct_bytes", "_bs.entropy_bits"
    )
