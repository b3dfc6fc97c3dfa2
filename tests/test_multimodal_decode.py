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


def test_decode_h264_ipcm_roundtrip(spark):
    """H.264 Annex-B intra decode (r8 — the video boundary moved
    inward): a conformant baseline stream of I_PCM macroblocks decodes
    byte-exact through the same decode_image operator, including
    non-MB-multiple dimensions (frame cropping) and zero-heavy content
    (emulation-prevention bytes on both encode and decode)."""
    from api_to_amt_data_lake_spark.operators.h264 import encode_h264_ipcm

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(18, 20), dtype=np.uint8)
    img[:4, :6] = 0  # zero runs force emulation-prevention bytes
    out = decode_image(_blob_df(spark, [encode_h264_ipcm(img)])) \
        .collect()[0]
    assert (out["width"], out["height"], out["channels"]) == (20, 18, 1)
    got = np.frombuffer(bytes(out["pixels"]), dtype=np.uint8).reshape(18, 20)
    np.testing.assert_array_equal(got, img)


def test_decode_h264_named_boundaries():
    """Inside H.264 the boundary is now precise: CABAC streams and
    entropy-coded (non-I_PCM) macroblocks raise errors NAMING the
    contract; P/B slices likewise."""
    from api_to_amt_data_lake_spark.operators.h264 import (
        _BitWriter,
        _nal,
        decode_h264_iframe,
        encode_h264_ipcm,
    )

    good = encode_h264_ipcm(np.full((16, 16), 7, dtype=np.uint8))
    nals = good.split(b"\x00\x00\x00\x01")[1:]  # [sps, pps, slice]
    sps_nal = b"\x00\x00\x00\x01" + nals[0]

    # CABAC PPS: flip entropy_coding_mode_flag.
    pps = _BitWriter()
    for v in (0, 0):
        pps.ue(v)
    pps.u(1, 1)  # entropy_coding_mode_flag = CABAC
    pps.u(0, 1)
    for v in (0, 0, 0):
        pps.ue(v)
    pps.u(0, 1)
    pps.u(0, 2)
    for v in (0, 0, 0):
        pps.se(v)
    pps.u(1, 1)
    pps.u(0, 1)
    pps.u(0, 1)
    pps.rbsp_trailing()
    stream = (sps_nal + _nal(3, 8, pps.rbsp())
              + b"\x00\x00\x00\x01" + nals[2])
    with pytest.raises(ValueError, match="CABAC"):
        decode_h264_iframe(stream)

    # Entropy-coded macroblock (mb_type 0 = I_NxN) in a CAVLC slice.
    sl = _BitWriter()
    sl.ue(0)
    sl.ue(7)
    sl.ue(0)
    sl.u(0, 4)
    sl.ue(0)
    sl.u(1, 1)
    sl.u(1, 1)
    sl.se(0)
    sl.ue(1)
    sl.ue(0)  # mb_type 0: I_NxN — the named CAVLC boundary
    sl.rbsp_trailing()
    stream = (sps_nal + b"\x00\x00\x00\x01" + nals[1]
              + _nal(3, 5, sl.rbsp()))
    with pytest.raises(ValueError, match="CAVLC"):
        decode_h264_iframe(stream)

    # P slice (slice_type 0).
    sl = _BitWriter()
    sl.ue(0)
    sl.ue(0)  # slice_type P
    sl.rbsp_trailing()
    with pytest.raises(ValueError, match="intra"):
        decode_h264_iframe(sps_nal + b"\x00\x00\x00\x01" + nals[1]
                           + _nal(3, 1, sl.rbsp()))

    # Multi-slice picture: a second-slice header (first_mb != 0) is a
    # named boundary, and a slice whose data ends early likewise.
    sl = _BitWriter()
    sl.ue(1)  # first_mb_in_slice != 0
    sl.ue(7)
    sl.ue(0)
    sl.u(0, 4)
    sl.ue(0)
    sl.u(1, 1)
    sl.u(1, 1)
    sl.se(0)
    sl.ue(1)
    sl.rbsp_trailing()
    with pytest.raises(ValueError, match="multi-slice"):
        decode_h264_iframe(sps_nal + b"\x00\x00\x00\x01" + nals[1]
                           + _nal(3, 5, sl.rbsp()))
    truncated = good[:len(good) - 300]  # cut into the I_PCM payload
    with pytest.raises(ValueError, match="multi-slice|truncated"):
        decode_h264_iframe(truncated)


def test_decode_image_rejects_garbage_video_bitstreams(spark):
    with pytest.raises(Exception, match="H.264|Golomb|slice|NAL"):
        decode_image(_blob_df(spark, [b"\x00\x00\x00\x01h264 nalu"])) \
            .collect()


def test_decode_image_rejects_scanless_jpeg(spark):
    # header-only JPEG (no SOS): a named JPEG error, not a crash
    with pytest.raises(Exception, match="scan"):
        decode_image(_blob_df(spark, [jpeg_bytes(2, 2)])).collect()


def full_png_bytes(pixels: np.ndarray, filters: list[int],
                   color_type: int = 2, palette: bytes | None = None) -> bytes:
    """A complete, valid PNG built independently of the decoder: encode
    each scanline with the requested filter type per the PNG spec, zlib-
    compress, emit real chunk CRCs."""
    import zlib as _z
    h, w = pixels.shape[:2]
    ch = 1 if pixels.ndim == 2 else pixels.shape[2]
    flat = pixels.reshape(h, w * ch).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        cur, ft = flat[y], filters[y % len(filters)]
        if ft == 0:
            enc = cur.copy()
        elif ft == 1:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - left) & 0xFF
        elif ft == 2:
            enc = (cur - prev) & 0xFF
        elif ft == 3:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif ft == 4:
            enc = np.empty(w * ch, np.int32)
            for x in range(w * ch):
                a = int(cur[x - ch]) if x >= ch else 0
                b_ = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)
                enc[x] = (cur[x] - pred) & 0xFF
        raw.append(ft)
        raw += enc.astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", _z.crc32(tag + data)))

    ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
    out = b"\x89PNG\r\n\x1a\x0a" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette)
    return out + chunk(b"IDAT", _z.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_decode_png_all_filters(spark):
    """Round-trip RGB pixels through every PNG filter type (None, Sub,
    Up, Average, Paeth) — a real zlib-compressed, CRC-correct PNG in,
    the original pixels out."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        blob = full_png_bytes(img, filters)
        out = decode_image(_blob_df(spark, [blob])).collect()[0]
        assert (out["width"], out["height"], out["channels"]) == (6, 10, 3)
        got = np.frombuffer(bytes(out["pixels"]),
                            dtype=np.uint8).reshape(10, 6, 3)
        np.testing.assert_array_equal(got, img)


def test_decode_png_color_types(spark):
    """Grayscale stays 1 channel, RGBA keeps alpha, palette expands to
    RGB via the PLTE lookup."""
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    pal = bytes(range(48))  # 16 RGB entries
    idx = rng.integers(0, 16, size=(4, 4), dtype=np.uint8)
    rows = decode_image(_blob_df(spark, [
        full_png_bytes(gray, [0, 2], color_type=0),
        full_png_bytes(rgba, [1, 4], color_type=6),
        full_png_bytes(idx, [0, 1], color_type=3, palette=pal),
    ])).orderBy("id").collect()
    g = np.frombuffer(bytes(rows[0]["pixels"]), np.uint8).reshape(4, 5)
    np.testing.assert_array_equal(g, gray)
    assert rows[0]["channels"] == 1
    a = np.frombuffer(bytes(rows[1]["pixels"]), np.uint8).reshape(3, 4, 4)
    np.testing.assert_array_equal(a, rgba)
    assert rows[1]["channels"] == 4
    want = np.frombuffer(pal, np.uint8).reshape(16, 3)[idx]
    p = np.frombuffer(bytes(rows[2]["pixels"]), np.uint8).reshape(4, 4, 3)
    np.testing.assert_array_equal(p, want)
    assert rows[2]["channels"] == 3


def test_decode_png_then_resize(spark):
    """decode_image -> resize_image composes for PNG input exactly as
    for BMP (same DECODED_IMAGE_SCHEMA contract)."""
    img = np.repeat(np.repeat(
        np.array([[[255, 0, 0], [0, 255, 0]],
                  [[0, 0, 255], [9, 9, 9]]], dtype=np.uint8), 2, 0), 2, 1)
    out = resize_image(
        decode_image(_blob_df(spark, [full_png_bytes(img, [4])])), 2, 2
    ).collect()[0]
    got = np.frombuffer(bytes(out["pixels"]), np.uint8).reshape(2, 2, 3)
    np.testing.assert_array_equal(got, img[::2, ::2])


def full_gif_bytes(idx: np.ndarray, palette: bytes) -> bytes:
    """A complete GIF built independently of the decoder, using the
    classic 'uncompressed' LZW encoding: every pixel emitted as a
    literal code, with the code width grown exactly as the LZW table
    fills (one implicit entry per literal after the first) and a CLEAR
    emitted whenever the table would overflow 12 bits."""
    h, w = idx.shape
    n_colors = len(palette) // 3
    min_code = max(2, (n_colors - 1).bit_length())
    clear, end = 1 << min_code, (1 << min_code) + 1

    bits: list[tuple[int, int]] = []  # (code, width)
    table_len, code_size = end + 1, min_code + 1
    bits.append((clear, code_size))
    first = True
    for px in idx.flatten():
        if table_len == 4096:
            bits.append((clear, code_size))
            table_len, code_size, first = end + 1, min_code + 1, True
        bits.append((int(px), code_size))
        if first:
            first = False
        else:
            table_len += 1
            if table_len == 1 << code_size and code_size < 12:
                code_size += 1
    bits.append((end, code_size))

    stream, acc, nacc = bytearray(), 0, 0
    for code, width in bits:
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        stream.append(acc & 0xFF)

    blocks = bytearray()
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"

    gct_size = max(1, (n_colors - 1).bit_length() - 1) if n_colors > 2 \
        else 0
    while (2 << gct_size) < n_colors:
        gct_size += 1
    pal = palette + b"\x00" * (3 * (2 << gct_size) - len(palette))
    return (b"GIF89a" + struct.pack("<HH", w, h)
            + bytes([0x80 | gct_size, 0, 0]) + pal
            + b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
            + bytes([min_code]) + blocks + b"\x3B")


def test_decode_gif_lzw_roundtrip(spark):
    """Real LZW: an independently-encoded GIF (literal codes, growing
    widths, mid-stream CLEARs) decodes back to the exact palette-mapped
    pixels — including a large frame that forces width growth past 9
    bits and at least one table-overflow CLEAR."""
    rng = np.random.default_rng(19)
    pal16 = bytes(rng.integers(0, 256, 48, dtype=np.uint8))
    small = rng.integers(0, 16, size=(5, 7), dtype=np.uint8)
    big = rng.integers(0, 16, size=(64, 90), dtype=np.uint8)  # >4096 px
    rows = decode_image(_blob_df(spark, [
        full_gif_bytes(small, pal16), full_gif_bytes(big, pal16),
    ])).orderBy("id").collect()
    want_pal = np.frombuffer(pal16, np.uint8).reshape(16, 3)
    for row, idx in zip(rows, (small, big)):
        h, w = idx.shape
        assert (row["width"], row["height"], row["channels"]) == (w, h, 3)
        got = np.frombuffer(bytes(row["pixels"]), np.uint8).reshape(h, w, 3)
        np.testing.assert_array_equal(got, want_pal[idx])


def _gif_descriptor_offset(blob: bytes) -> int:
    """Offset of the image descriptor (0x2C block) in a full_gif_bytes
    output: 13-byte header + the global color table."""
    gct_size = blob[10] & 0x07
    return 13 + 3 * (2 << gct_size)


def test_decode_gif_contract_errors():
    from api_to_amt_data_lake_spark.operators.multimodal import _decode_gif
    idx = np.zeros((2, 2), dtype=np.uint8)
    blob = bytearray(full_gif_bytes(idx, bytes(12)))
    pos = _gif_descriptor_offset(blob)
    assert blob[pos] == 0x2C
    blob[pos + 1] = 1  # left offset: a partial (composited) frame
    with pytest.raises(ValueError, match="compositing"):
        _decode_gif(bytes(blob))


def test_decode_png_contract_errors(spark):
    from api_to_amt_data_lake_spark.operators.multimodal import _decode_png
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    blob = bytearray(full_png_bytes(img, [0]))
    blob[28] = 2  # unknown interlace method
    with pytest.raises(ValueError, match="interlace"):
        _decode_png(bytes(blob))
    blob = bytearray(full_png_bytes(img, [0]))
    blob[24] = 16  # bit depth
    with pytest.raises(ValueError, match="depth"):
        _decode_png(bytes(blob))


def adam7_png_bytes(pixels: np.ndarray, color_type: int = 2) -> bytes:
    """Adam7-interlaced PNG built independently of the decoder: slice
    the seven sub-images per the pass geometry, filter each pass's
    scanlines (None on the first row, Up after), deflate, real CRCs."""
    import zlib as _z
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    h, w = pixels.shape[:2]
    ch = 1 if pixels.ndim == 2 else pixels.shape[2]
    flat = pixels.reshape(h, w, ch)
    raw = bytearray()
    for (x0, y0, dx, dy) in passes:
        rows = list(range(y0, h, dy))
        cols = list(range(x0, w, dx))
        if not rows or not cols:
            continue
        sub = flat[np.ix_(rows, cols)]
        prev = np.zeros(len(cols) * ch, np.int32)
        for y in range(len(rows)):
            line = sub[y].reshape(-1).astype(np.int32)
            if y == 0:
                raw.append(0)
                raw += line.astype(np.uint8).tobytes()
            else:
                raw.append(2)  # Up
                raw += ((line - prev) & 0xFF).astype(np.uint8).tobytes()
            prev = line

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", _z.crc32(tag + data)))

    ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 1])
    return (b"\x89PNG\r\n\x1a\x0a" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_decode_png_adam7_interlaced(spark):
    """Adam7 PNGs deinterlace to the exact original pixels — including
    sizes where late passes are empty (1x1) and non-multiples of 8."""
    rng = np.random.default_rng(37)
    rgb = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (9, 5), dtype=np.uint8)
    tiny = rng.integers(0, 256, (1, 1, 3), dtype=np.uint8)
    rows = decode_image(_blob_df(spark, [
        adam7_png_bytes(rgb), adam7_png_bytes(gray, color_type=0),
        adam7_png_bytes(tiny),
    ])).orderBy("id").collect()
    got = np.frombuffer(bytes(rows[0]["pixels"]), np.uint8).reshape(11, 13, 3)
    np.testing.assert_array_equal(got, rgb)
    g = np.frombuffer(bytes(rows[1]["pixels"]), np.uint8).reshape(9, 5)
    np.testing.assert_array_equal(g, gray)
    t = np.frombuffer(bytes(rows[2]["pixels"]), np.uint8).reshape(1, 1, 3)
    np.testing.assert_array_equal(t, tiny)


def test_decode_gif_interlaced(spark):
    """An interlaced GIF (rows streamed in 4-pass order) deinterlaces
    to the original row order."""
    rng = np.random.default_rng(41)
    pal = bytes(rng.integers(0, 256, 48, dtype=np.uint8))
    idx = rng.integers(0, 16, size=(13, 6), dtype=np.uint8)
    order = np.concatenate([np.arange(0, 13, 8), np.arange(4, 13, 8),
                            np.arange(2, 13, 4), np.arange(1, 13, 2)])
    blob = bytearray(full_gif_bytes(idx[order], pal))
    pos = _gif_descriptor_offset(blob)
    assert blob[pos] == 0x2C
    blob[pos + 9] |= 0x40  # interlace flag on the image descriptor
    out = decode_image(_blob_df(spark, [bytes(blob)])).collect()[0]
    want = np.frombuffer(pal, np.uint8).reshape(16, 3)[idx]
    got = np.frombuffer(bytes(out["pixels"]), np.uint8).reshape(13, 6, 3)
    np.testing.assert_array_equal(got, want)


def test_jpeg_restart_markers_roundtrip(spark):
    """DRI + RSTn: encoder emits restart markers, decoder resets DC
    predictions per interval — pixels still round-trip tightly."""
    from api_to_amt_data_lake_spark.operators.jpeg import (
        encode_jpeg_baseline)

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    blob = encode_jpeg_baseline(img, restart_interval=4)
    assert b"\xff\xdd" in blob and b"\xff\xd0" in blob
    out = decode_image(_blob_df(spark, [blob])).collect()[0]
    got = np.frombuffer(bytes(out["pixels"]), np.uint8).reshape(24, 40)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


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


# --------------------------------------------------------------------------
# Baseline JPEG (operators/jpeg.py) — verified against the MATH, not just
# encoder<->decoder round-trip (symmetric bugs would cancel).
# --------------------------------------------------------------------------

def test_jpeg_idct_matches_cosine_sum_definition():
    from api_to_amt_data_lake_spark.operators.jpeg import _idct2

    rng = np.random.default_rng(2)
    F = rng.uniform(-100, 100, (8, 8))
    direct = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.125) if u == 0 else np.sqrt(0.25)
                    cv = np.sqrt(0.125) if v == 0 else np.sqrt(0.25)
                    s += (cu * cv * F[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            direct[x, y] = s
    np.testing.assert_allclose(_idct2(F), direct, atol=1e-9)


def test_jpeg_zigzag_is_the_standard_order():
    from api_to_amt_data_lake_spark.operators.jpeg import ZIGZAG
    assert len(ZIGZAG) == 64 and len(set(ZIGZAG)) == 64
    assert ZIGZAG[:10] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
                           (0, 2), (0, 3), (1, 2), (2, 1), (3, 0)]
    assert ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]


def test_jpeg_single_coefficient_decodes_to_analytic_pattern():
    """Encode images that are exactly the IDCT of one nonzero AC
    coefficient at several (u, v) positions: the decoded pixels must
    reproduce the analytic cosine pattern exactly (flat quant). A
    zigzag or basis error on either side cannot cancel here — the
    assertion is against the mathematical pattern, not the encoder."""
    from api_to_amt_data_lake_spark.operators.jpeg import (
        _idct2, decode_jpeg_baseline, encode_jpeg_baseline)

    for (u, v) in [(0, 1), (1, 0), (3, 2), (7, 7), (0, 5)]:
        F = np.zeros((8, 8))
        F[u, v] = 40.0
        img = np.clip(np.round(_idct2(F) + 128.0), 0, 255).astype(np.uint8)
        w, h, ch, px = decode_jpeg_baseline(encode_jpeg_baseline(img))
        got = np.frombuffer(px, np.uint8).reshape(8, 8)
        assert (w, h, ch) == (8, 8, 1)
        np.testing.assert_array_equal(got, img)


def test_jpeg_roundtrip_gray_and_color(spark):
    """Non-multiple-of-8 sizes (edge padding), random content, flat
    quantization: decoded pixels within DCT-rounding tolerance; runs
    through the Spark decode_image path end to end."""
    from api_to_amt_data_lake_spark.operators.jpeg import (
        encode_jpeg_baseline)

    rng = np.random.default_rng(29)
    gray = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    color = rng.integers(0, 256, (10, 9, 3), dtype=np.uint8)
    rows = decode_image(_blob_df(spark, [
        encode_jpeg_baseline(gray), encode_jpeg_baseline(color),
    ])).orderBy("id").collect()
    g = np.frombuffer(bytes(rows[0]["pixels"]), np.uint8).reshape(13, 21)
    assert rows[0]["channels"] == 1
    assert np.abs(g.astype(int) - gray.astype(int)).max() <= 2
    c = np.frombuffer(bytes(rows[1]["pixels"]), np.uint8).reshape(10, 9, 3)
    assert rows[1]["channels"] == 3
    assert np.abs(c.astype(int) - color.astype(int)).max() <= 4


def test_jpeg_real_quant_table_still_close():
    """A genuinely lossy table (flat 16s) keeps smooth content close —
    the codec is a real JPEG, not a fixture format."""
    from api_to_amt_data_lake_spark.operators.jpeg import (
        decode_jpeg_baseline, encode_jpeg_baseline)

    x = np.arange(32)
    img = np.clip(np.round(
        128 + 60 * np.sin(np.pi * x / 16))[None, :].repeat(16, 0),
        0, 255).astype(np.uint8)
    blob = encode_jpeg_baseline(img, quant=np.full((8, 8), 16.0))
    w, h, ch, px = decode_jpeg_baseline(blob)
    got = np.frombuffer(px, np.uint8).reshape(16, 32)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 24
    assert np.abs(got.astype(float) - img.astype(float)).mean() <= 6


def test_jpeg_contract_errors():
    from api_to_amt_data_lake_spark.operators.jpeg import (
        decode_jpeg_baseline, encode_jpeg_baseline)

    img = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(encode_jpeg_baseline(img))
    sof = blob.index(b"\xff\xc0")
    blob[sof + 1] = 0xC3  # lossless sequential: out of scope
    with pytest.raises(ValueError, match="baseline.*progressive"):
        decode_jpeg_baseline(bytes(blob))
    # Relabeling a baseline stream as SOF2 is malformed (a progressive
    # DC scan cannot span Se=63) and must be named, not misdecoded.
    blob = bytearray(encode_jpeg_baseline(img))
    sof = blob.index(b"\xff\xc0")
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg_baseline(bytes(blob))
    blob = bytearray(encode_jpeg_baseline(img))
    sof = blob.index(b"\xff\xc0")
    blob[sof + 11] = 0x33  # 3x3 sampling: beyond the 2x2 envelope
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg_baseline(bytes(blob))


def test_jpeg_chroma_subsampling_420_and_422():
    """4:2:0 / 4:2:2: interleaved multi-block MCUs decode correctly.
    With spatially-constant chroma the box downsample/upsample is
    lossless, so the full round-trip stays within DCT rounding; with
    random chroma the luma channel must still carry through (mean
    recomputed-luma error small — chroma clipping is the only leak)."""
    from api_to_amt_data_lake_spark.operators.jpeg import (
        decode_jpeg_baseline, encode_jpeg_baseline)

    rng = np.random.default_rng(43)
    y = rng.integers(30, 220, (19, 22)).astype(float)
    cb, cr = 140.0, 110.0
    img = np.clip(np.round(np.stack([
        y + 1.402 * (cr - 128),
        y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
        y + 1.772 * (cb - 128)], -1)), 0, 255).astype(np.uint8)
    for sub in ("420", "422"):
        blob = encode_jpeg_baseline(img, subsampling=sub)
        w, h, ch, px = decode_jpeg_baseline(blob)
        got = np.frombuffer(px, np.uint8).reshape(19, 22, 3)
        assert (w, h, ch) == (22, 19, 3)
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 2
    # 420 writes a quarter of the chroma blocks -> smaller than 444
    # once the image dwarfs MCU padding
    big = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    assert len(encode_jpeg_baseline(big, subsampling="420")) < \
        len(encode_jpeg_baseline(big, subsampling="444"))

    cimg = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    blob = encode_jpeg_baseline(cimg, subsampling="420",
                                restart_interval=2)
    w, h, ch, px = decode_jpeg_baseline(blob)
    got = np.frombuffer(px, np.uint8).reshape(24, 17, 3).astype(float)

    def luma(a):
        return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]

    assert np.abs(luma(got) - luma(cimg.astype(float))).mean() <= 3.0


# --- progressive (SOF2) JPEG ------------------------------------------------


def _sof2_gray_stream(scans):
    """Hand-assemble a minimal single-component SOF2 stream: flat quant,
    the module's canonical tables, one SOS per (ss, se, ah, al, bits).
    Encoder-INDEPENDENT: scans are raw bit payloads built in the test,
    so a decoder bug cannot be cancelled by encoder symmetry."""
    import struct

    from api_to_amt_data_lake_spark.operators.jpeg import (
        _AC_COUNTS, _AC_SYMBOLS, _DC_COUNTS, _DC_SYMBOLS, ZIGZAG)

    dqt = (b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
           + bytes(1 for _ in ZIGZAG))
    sof = (b"\xff\xc2" + struct.pack(">H", 11) + b"\x08"
           + struct.pack(">HH", 8, 8) + b"\x01" + bytes([1, 0x11, 0]))

    def dht(tc, th, counts, symbols):
        payload = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out = (b"\xff\xd8" + dqt + sof
           + dht(0, 0, _DC_COUNTS, _DC_SYMBOLS)
           + dht(1, 0, _AC_COUNTS, _AC_SYMBOLS))
    for ss, se, ah, al, payload in scans:
        out += (b"\xff\xda" + struct.pack(">H", 8) + b"\x01"
                + bytes([1, 0x00, ss, se, (ah << 4) | al]) + payload)
    return out + b"\xff\xd9"


def _dc_zero_scans():
    """DC first (Al=1, value 0) + DC refinement (bit 0) payloads."""
    from api_to_amt_data_lake_spark.operators.jpeg import (
        _BitWriter, _DC_CODES)

    w1 = _BitWriter()
    ln, code = _DC_CODES[0]
    w1.write(code, ln)          # diff category 0
    w2 = _BitWriter()
    w2.write(0, 1)              # refinement bit
    return [(0, 0, 0, 1, w1.flush()), (0, 0, 1, 0, w2.flush())]


def test_progressive_single_coeff_successive_approximation():
    """Hand-built SOF2 stream: one AC coefficient (value 5 at a chosen
    zigzag position) delivered across an Al=1 first scan (sends 5>>1=2)
    and an Ah=1 refinement scan (EOB + correction bit 1). The decoded
    block must equal the analytic IDCT pattern of coefficient 5 —
    pinning the G.1.2.2/G.1.2.3 bit protocol against the math."""
    from api_to_amt_data_lake_spark.operators.jpeg import (
        _AC_CODES, _BitWriter, _idct2, ZIGZAG, decode_jpeg)

    for zz_pos in (3, 10, 63):
        # AC first scan, Al=1: run zz_pos-1, size 2, bits '10' (=2)
        wf = _BitWriter()
        run = zz_pos - 1
        while run > 15:
            ln, code = _AC_CODES[0xF0]
            wf.write(code, ln)
            run -= 16
        ln, code = _AC_CODES[(run << 4) | 2]
        wf.write(code, ln)
        wf.write(2, 2)
        if zz_pos < 63:
            ln, code = _AC_CODES[0x00]
            wf.write(code, ln)
        # AC refinement, Ah=1 Al=0: EOB then correction bit 1 (5 & 1)
        wr = _BitWriter()
        ln, code = _AC_CODES[0x00]
        wr.write(code, ln)
        wr.write(1, 1)
        blob = _sof2_gray_stream(_dc_zero_scans() + [
            (1, 63, 0, 1, wf.flush()), (1, 63, 1, 0, wr.flush())])
        w, h, ch, px = decode_jpeg(blob)
        got = np.frombuffer(px, np.uint8).reshape(8, 8)
        F = np.zeros((8, 8))
        r, c = ZIGZAG[zz_pos]
        F[r, c] = 5.0
        want = np.clip(np.round(_idct2(F) + 128.0), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(got, want)


def test_progressive_refine_zrl_with_interleaved_history():
    """The G.1.2.3 corner the spec figure gets subtle about: a ZRL in a
    refinement scan must carry the correction bits of the HISTORY
    coefficients it walks over, and the newly significant coefficient's
    sign precedes the corrections of coefficients crossed by its run.
    Coefficients: zigzag 2 = 4 (history, correction 0), zigzag 21 = 1
    (newly significant after an 18-zero run -> ZRL + run 2)."""
    from api_to_amt_data_lake_spark.operators.jpeg import (
        _AC_CODES, _BitWriter, _idct2, ZIGZAG, decode_jpeg)

    # first scan (Al=1): position 2 -> 4>>1 = 2 (run 1, size 2);
    # position 21 -> 1>>1 = 0 not sent; EOB.
    wf = _BitWriter()
    ln, code = _AC_CODES[(1 << 4) | 2]
    wf.write(code, ln)
    wf.write(2, 2)
    ln, code = _AC_CODES[0x00]
    wf.write(code, ln)
    # refinement (Al=0): pos1 zero-history (run 1); pos2 history ->
    # pending bit 0; pos3..20 zeros (run 19); pos21 newly significant:
    # run>15 -> ZRL + flush pending, then (run=3, size=1) + sign + no
    # pending; trailing zeros -> EOB.
    wr = _BitWriter()
    ln, code = _AC_CODES[0xF0]
    wr.write(code, ln)
    wr.write(0, 1)  # correction bit of history coeff at pos 2
    ln, code = _AC_CODES[(3 << 4) | 1]
    wr.write(code, ln)
    wr.write(1, 1)  # sign: positive
    ln, code = _AC_CODES[0x00]
    wr.write(code, ln)
    blob = _sof2_gray_stream(_dc_zero_scans() + [
        (1, 63, 0, 1, wf.flush()), (1, 63, 1, 0, wr.flush())])
    w, h, ch, px = decode_jpeg(blob)
    got = np.frombuffer(px, np.uint8).reshape(8, 8)
    F = np.zeros((8, 8))
    F[ZIGZAG[2]] = 4.0
    F[ZIGZAG[21]] = 1.0
    want = np.clip(np.round(_idct2(F) + 128.0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_progressive_matches_baseline_decode_exactly():
    """encode_jpeg_progressive -> decode must be BIT-IDENTICAL to the
    baseline round trip of the same image for every subsampling ×
    successive-approximation × band-split combination (same quantized
    coefficients, different transport)."""
    from api_to_amt_data_lake_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_baseline, encode_jpeg_progressive)

    rng = np.random.default_rng(31)
    gray = rng.integers(0, 256, (21, 13), dtype=np.uint8)
    color = rng.integers(0, 256, (19, 26, 3), dtype=np.uint8)
    base_g = decode_jpeg(encode_jpeg_baseline(gray))
    for succ in (False, True):
        for split in (False, True):
            assert decode_jpeg(encode_jpeg_progressive(
                gray, successive=succ, split_bands=split)) == base_g
    for sub in ("444", "422", "420"):
        base_c = decode_jpeg(encode_jpeg_baseline(color, subsampling=sub))
        for succ in (False, True):
            assert decode_jpeg(encode_jpeg_progressive(
                color, subsampling=sub, successive=succ)) == base_c


def test_progressive_through_spark_decode_image(spark):
    """SOF2 blobs flow through the Arrow-batched decode_image path with
    the same schema/partitioning as every other format."""
    from api_to_amt_data_lake_spark.operators.jpeg import (
        encode_jpeg_progressive)

    rng = np.random.default_rng(37)
    img = rng.integers(0, 256, (11, 17), dtype=np.uint8)
    rows = decode_image(_blob_df(spark, [
        encode_jpeg_progressive(img, successive=True)])).collect()
    assert (rows[0]["width"], rows[0]["height"], rows[0]["channels"]) \
        == (17, 11, 1)
    got = np.frombuffer(bytes(rows[0]["pixels"]), np.uint8).reshape(11, 17)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_mjpeg_demux_decode_is_single_python_pass(spark, sf_dir):
    """q74h chains sample_video_frames -> pixel decode; both are
    mapInPandas projections, so the physical plan must pipeline them
    within one stage — NO Exchange anywhere (demux fan-out and decode
    happen where the scan partition lives), and the decoded
    constant-gray frames must match the arithmetic expectation
    exactly."""
    from api_to_amt_data_lake_spark.plans import conformance

    df = conformance.QUERIES["q74h_mjpeg_pixel_decode"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 2
    assert "Exchange" not in plan
    rows = df.collect()
    # doc_id < 60 exist only at sf >= 0.01 partially; at sf0.001 the
    # documents table still has doc_id 0..n; assert on whatever rows came
    assert rows, "no sampled frames decoded"
    for r in rows:
        v = 20 * (r["doc_id"] % 6) + 15 * r["frame_idx"]
        assert r["frame_idx"] in (0, 2, 4)
        assert (r["width"], r["height"]) == (16, 8)
        assert r["pixel_sum"] == 128 * v
        assert abs(r["pixel_mean"] - v) < 1e-9


def test_annexb_codec_sniff_rejects_foreign_codecs():
    """ADVICE r8: the Annex-B start-code framing is shared by H.264,
    H.265 and MPEG-2/PS — the dispatch must sniff NAL header bytes and
    reject foreign codecs with the codec-library contract message, not
    an H.264-internal parse error."""
    from api_to_amt_data_lake_spark.operators.h264 import (
        encode_h264_ipcm,
        sniff_annexb_codec,
    )
    from api_to_amt_data_lake_spark.operators.multimodal import (
        _decode_pixels,
    )

    # Real H.264 still sniffs as h264 and decodes.
    good = encode_h264_ipcm(np.full((16, 16), 9, dtype=np.uint8))
    assert sniff_annexb_codec(good) == "h264"
    assert _decode_pixels(good)[:3] == (16, 16, 1)

    # H.265: VPS(32)/SPS(33)/PPS(34) NAL headers — first header byte
    # 0x40/0x42/0x44, second byte 0x01 (layer 0, tid 1).
    h265 = (b"\x00\x00\x00\x01\x40\x01\x0c\x01"
            b"\x00\x00\x00\x01\x42\x01\x01\x01"
            b"\x00\x00\x00\x01\x44\x01\xc0\xf2")
    assert sniff_annexb_codec(h265) == "h265"
    with pytest.raises(ValueError, match=r"H\.265.*codec library"):
        _decode_pixels(h265)

    # MPEG-PS pack header (0xBA) + MPEG-2 sequence header (0xB3):
    # start-code bytes with the high bit set, which H.264's
    # forbidden_zero_bit forbids.
    mpeg = (b"\x00\x00\x01\xba\x44\x00\x04\x00\x04\x01"
            b"\x00\x00\x01\xb3\x16\x00\xf0\xc4")
    assert sniff_annexb_codec(mpeg) == "mpeg2-ps"
    with pytest.raises(ValueError, match=r"MPEG-2.*codec library"):
        _decode_pixels(mpeg)
