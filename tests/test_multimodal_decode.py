"""Real (codec-free) multimodal decode: header parsing for PNG/JPEG/GIF/
BMP/WAV, BMP pixel decode + nearest-neighbor resize, WAV PCM decode, and
AVI container demux for frame sampling. Fixtures are built byte-by-byte
with `struct` — independent of the parsers under test."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from api_to_amt_data_lake_spark.operators.multimodal import (
    audio_header_metadata,
    decode_audio,
    decode_image,
    image_header_metadata,
    parse_image_header,
    parse_wav_header,
    resize_image,
    sample_video_frames,
)


# --------------------------------------------------------------------------
# Fixture builders (pure struct — no dependency on the code under test)
# --------------------------------------------------------------------------

def png_bytes(w: int, h: int, color_type: int = 2) -> bytes:
    ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
    return (b"\x89PNG\r\n\x1a\x0a"
            + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00")


def jpeg_bytes(w: int, h: int, channels: int = 3) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 8 + 3 * channels) + b"\x08"
            + struct.pack(">HH", h, w) + bytes([channels])
            + b"\x01\x11\x00" * channels)
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def gif_bytes(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def bmp_bytes(pixels: np.ndarray) -> bytes:
    """24-bit bottom-up BMP from an (h, w, 3) uint8 RGB array."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y, :, ::-1].tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(rows), 2835, 2835, 0, 0))
    return header + rows


def wav_bytes(rate: int, samples: np.ndarray, channels: int = 1) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def avi_bytes(frames: list[bytes]) -> bytes:
    chunks = b""
    for f in frames:
        chunks += b"00dc" + struct.pack("<I", len(f)) + f + b"\x00" * (len(f) & 1)
    movi = b"LIST" + struct.pack("<I", 4 + len(chunks)) + b"movi" + chunks
    return b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVI " + movi


# --------------------------------------------------------------------------
# Pure-parser unit tests
# --------------------------------------------------------------------------

def test_parse_image_headers():
    assert parse_image_header(png_bytes(640, 480)) == ("png", 640, 480, 3)
    assert parse_image_header(png_bytes(10, 7, color_type=6)) == ("png", 10, 7, 4)
    assert parse_image_header(jpeg_bytes(1920, 1080)) == ("jpeg", 1920, 1080, 3)
    assert parse_image_header(gif_bytes(320, 200)) == ("gif", 320, 200, 3)
    bmp = bmp_bytes(np.zeros((4, 6, 3), dtype=np.uint8))
    assert parse_image_header(bmp) == ("bmp", 6, 4, 3)
    assert parse_image_header(b"not an image") is None


def test_parse_wav_header():
    wav = wav_bytes(16000, np.arange(100), channels=2)
    assert parse_wav_header(wav) == (16000, 2, 16, 50)
    assert parse_wav_header(b"RIFFxxxxJUNK") is None


# --------------------------------------------------------------------------
# Spark-side decode tests
# --------------------------------------------------------------------------

def _blob_df(spark, blobs: list[bytes]):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(blobs)],
        "id long, content binary")


def test_image_header_metadata_spark(spark):
    df = _blob_df(spark, [png_bytes(12, 34), jpeg_bytes(56, 78),
                          b"opaque junk"])
    rows = {r["id"]: r for r in image_header_metadata(df).collect()}
    assert (rows[0]["format"], rows[0]["width"], rows[0]["height"]) == ("png", 12, 34)
    assert (rows[1]["format"], rows[1]["width"], rows[1]["height"]) == ("jpeg", 56, 78)
    assert rows[2]["format"] is None and rows[2]["width"] is None


def test_audio_header_metadata_spark(spark):
    df = _blob_df(spark, [wav_bytes(8000, np.zeros(25))])
    row = audio_header_metadata(df).collect()[0]
    assert (row["sample_rate"], row["audio_channels"],
            row["bits_per_sample"], row["n_samples"]) == (8000, 1, 16, 25)


def test_decode_bmp_pixels_roundtrip(spark):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    out = decode_image(_blob_df(spark, [bmp_bytes(img)])).collect()[0]
    got = np.frombuffer(bytes(out["pixels"]), dtype=np.uint8).reshape(5, 3, 3)
    assert (out["width"], out["height"], out["channels"]) == (3, 5, 3)
    np.testing.assert_array_equal(got, img)  # exact: BGR flip + row flip undone


def test_decode_image_rejects_compressed(spark):
    with pytest.raises(Exception, match="codec"):
        decode_image(_blob_df(spark, [png_bytes(2, 2)])).collect()


def test_resize_image_nearest_neighbor(spark):
    # 2x2 quadrant image upscaled to 4x4: each quadrant becomes a 2x2 block.
    img = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
    decoded = decode_image(_blob_df(spark, [bmp_bytes(img)]))
    out = resize_image(decoded, 4, 4).collect()[0]
    got = np.frombuffer(bytes(out["pixels"]), dtype=np.uint8).reshape(4, 4, 3)
    expected = img.repeat(2, axis=0).repeat(2, axis=1)
    np.testing.assert_array_equal(got, expected)


def test_decode_audio_pcm(spark):
    # Stereo: L=+16384, R=-16384 every sample -> mono average 0.
    samples = np.tile([16384, -16384], 10)
    df = _blob_df(spark, [wav_bytes(44100, samples, channels=2)])
    out = decode_audio(df).collect()[0]
    pcm = np.frombuffer(bytes(out["pcm"]), dtype="<f4")
    assert out["sample_rate"] == 44100 and out["n_samples"] == 10
    np.testing.assert_allclose(pcm, np.zeros(10))
    # Mono full-scale negative -> -1.0 exactly.
    out2 = decode_audio(
        _blob_df(spark, [wav_bytes(8000, np.full(4, -32768))])).collect()[0]
    np.testing.assert_allclose(
        np.frombuffer(bytes(out2["pcm"]), dtype="<f4"), np.full(4, -1.0))


def test_sample_video_frames_avi(spark):
    frames = [f"frame-{i}".encode() for i in range(10)]
    df = _blob_df(spark, [avi_bytes(frames)])
    out = sample_video_frames(df, every_n=3).collect()
    got = {(r["frame_idx"], bytes(r["frame"])) for r in out}
    assert got == {(0, b"frame-0"), (3, b"frame-3"),
                   (6, b"frame-6"), (9, b"frame-9")}


def test_sample_video_frames_rejects_non_avi(spark):
    with pytest.raises(Exception, match="AVI"):
        sample_video_frames(_blob_df(spark, [b"mp4 junk"]), 2).collect()
