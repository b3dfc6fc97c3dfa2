"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no codec libraries, so the *decode* steps are stubs
(clearly marked). What is real — and tested — is the Spark-side plumbing a
100 TB multimodal pipeline needs:

- schema convention: `content: binary` + `content_type: string` + metadata
  struct,
- Arrow-batched `mapInPandas` for per-item byte processing (hashing,
  sizing, header sniffing) — batch-shaped, never per-row Python,
- deterministic fake feature extractor so downstream plumbing (embedding
  join, ANN) is exercisable without codecs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BINARY_META_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("sha256_hex", T.StringType()),
])


def with_binary_content(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Adapter used in tests: treat utf-8 text bytes as an opaque blob."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("content_type"),
    )


def binary_metadata(df: DataFrame) -> DataFrame:
    """Byte length + sha256 per blob via Arrow-batched mapInPandas.

    Per-partition batches of (id, content); pandas vectorizes the loop body
    at the batch level. No shuffle — runs at scan speed.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "id": pdf["id"],
                "byte_len": pdf["content"].map(len).astype("int64"),
                "sha256_hex": pdf["content"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()
                ),
            })

    return df.select("id", "content").mapInPandas(batches, BINARY_META_SCHEMA)


FAKE_FEATURE_DIM = 8

FAKE_FEATURE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def fake_feature_extract(df: DataFrame) -> DataFrame:
    """Deterministic stand-in for an image/audio feature extractor:
    8 floats derived from the sha256 digest. Replaces a real model forward
    pass; the batch shape / schema / partitioning is exactly what the real
    extractor would use."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                [
                    int.from_bytes(
                        hashlib.sha256(bytes(b)).digest()[4 * i: 4 * i + 4], "big"
                    )
                    / 2**32
                    for i in range(FAKE_FEATURE_DIM)
                ]
                for b in pdf["content"]
            ]
            yield pd.DataFrame({"id": pdf["id"], "feature": feats})

    return df.select("id", "content").mapInPandas(batches, FAKE_FEATURE_SCHEMA)


def decode_image(df: DataFrame, content_col: str = "content") -> DataFrame:
    """STUB — image decode (PIL/libvips not installed in this container).

    Real implementation: mapInPandas over (id, content) batches decoding to
    (id, width, height, channels, pixels: binary); partition-size-aware so
    a batch of decoded frames fits executor memory.
    """
    raise NotImplementedError(
        "image decode requires a codec library not present in this environment; "
        "the plumbing contract is (id, content) -> (id, width, height, channels, pixels)"
    )


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB — video frame sampling (no av/ffmpeg in this container)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg bindings; contract: "
        "(id, content) -> (id, frame_idx, frame_png: binary) one row per sampled frame"
    )


def resize_image(df: DataFrame, width: int, height: int,
                 content_col: str = "content") -> DataFrame:
    """STUB — image resize (no PIL/libvips in this container).

    Real implementation: mapInPandas over (id, pixels) batches emitting
    (id, pixels: binary) at the target size; co-partitioned with decode so
    decode→resize fuses into one Python worker pass (no shuffle between).
    """
    raise NotImplementedError(
        "image resize requires a codec library; contract: "
        f"(id, pixels) -> (id, pixels at {width}x{height})"
    )


def decode_audio(df: DataFrame, content_col: str = "content") -> DataFrame:
    """STUB — audio decode (no soundfile/ffmpeg in this container).

    Real implementation: mapInPandas over (id, content) batches decoding to
    (id, sample_rate, n_samples, pcm: binary); long files should be
    row-split into fixed-duration chunks *before* decode so one batch's
    decoded PCM fits executor memory.
    """
    raise NotImplementedError(
        "audio decode requires ffmpeg/soundfile; contract: "
        "(id, content) -> (id, sample_rate, n_samples, pcm)"
    )
