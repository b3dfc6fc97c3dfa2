"""Audio decode + feature tests: struct-built WAV fixtures round-trip
through `operators/audio.py` and land on numpy/closed-form references.

Covers every decode width (PCM 8/16/24/32-bit, float32/64), stereo
interleaving + mono downmix, chunk-order tolerance, the compressed-
codec ValueError contract, JVM-side features vs numpy, the Goertzel
probe vs a naive DFT, the full spectrogram vs an O(N^2) DFT, and the
linear resampler vs np.interp.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.operators.audio import (
    _decode_wav,
    audio_features,
    decode_audio,
    goertzel_bin_energy,
    resample_linear,
    spectrogram,
)


def make_wav(samples, rate=8000, bits=16, channels=1, fmt=1,
             extra_chunk=False):
    """Build a RIFF/WAVE blob from a flat interleaved sample list.
    Integer widths take raw ints; float widths take floats."""
    if fmt == 1:
        if bits == 8:
            data = bytes((int(s) + 128) & 0xFF for s in samples)
        elif bits == 16:
            data = b"".join(struct.pack("<h", int(s)) for s in samples)
        elif bits == 24:
            data = b"".join(
                struct.pack("<i", int(s) << 8)[1:4] for s in samples)
        elif bits == 32:
            data = b"".join(struct.pack("<i", int(s)) for s in samples)
    else:  # IEEE float
        code = "<f" if bits == 32 else "<d"
        data = b"".join(struct.pack(code, float(s)) for s in samples)
    block = channels * bits // 8
    fmt_body = struct.pack("<HHIIHH", fmt, channels, rate, rate * block,
                           block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if extra_chunk:  # decoders must skip unknown chunks (word-aligned)
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ---------------------------------------------------------------------------
# _decode_wav: pure-Python decode across widths
# ---------------------------------------------------------------------------

def test_decode_pcm16_roundtrip():
    vals = [0, 1000, -1000, 32767, -32768]
    rate, ch, x = _decode_wav(make_wav(vals))
    assert (rate, ch) == (8000, 1)
    np.testing.assert_allclose(x, np.array(vals) / 32768.0)


@pytest.mark.parametrize("bits,denom", [(8, 128.0), (24, float(1 << 23)),
                                        (32, float(1 << 31))])
def test_decode_pcm_other_widths(bits, denom):
    top = int(denom) - 1
    vals = [0, top // 2, -top // 2, top, -int(denom)]
    if bits == 8:
        vals = [0, 50, -50, 127, -128]
    rate, ch, x = _decode_wav(make_wav(vals, bits=bits))
    np.testing.assert_allclose(x, np.array(vals) / denom, atol=1e-12)


@pytest.mark.parametrize("bits", [32, 64])
def test_decode_ieee_float(bits):
    vals = [0.0, 0.25, -0.75, 0.5]
    rate, ch, x = _decode_wav(make_wav(vals, bits=bits, fmt=3))
    np.testing.assert_allclose(x, vals, rtol=1e-6)


def test_decode_stereo_and_extra_chunks():
    inter = [100, -100, 200, -200, 300, -300]  # L,R interleaved
    rate, ch, x = _decode_wav(
        make_wav(inter, rate=44100, channels=2, extra_chunk=True))
    assert (rate, ch) == (44100, 2)
    np.testing.assert_allclose(x, np.array(inter) / 32768.0)


def test_decode_rejects_compressed_and_garbage():
    with pytest.raises(ValueError, match="codec"):
        _decode_wav(b"ID3\x04mp3-ish bytes here")
    mp3ish = make_wav([0, 0], fmt=85)  # MPEG layer III format code
    with pytest.raises(ValueError, match="compressed|unsupported"):
        _decode_wav(mp3ish)


# ---------------------------------------------------------------------------
# Spark-side: decode_audio + JVM features vs numpy
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def decoded(spark):
    rows = []
    rng = np.random.default_rng(7)
    for i in range(6):
        n = 40 + 13 * i
        vals = (rng.integers(-20000, 20000, n)).tolist()
        rows.append((i, bytearray(make_wav(vals, rate=8000 + 500 * i))))
    df = spark.createDataFrame(rows, "id long, content binary")
    return decode_audio(df).cache()


def test_decode_audio_schema_and_values(decoded):
    got = {r["id"]: r for r in decoded.collect()}
    assert len(got) == 6
    for i, row in got.items():
        assert row["sample_rate"] == 8000 + 500 * i
        assert row["channels"] == 1
        assert len(row["samples"]) == 40 + 13 * i
        assert all(-1.0 <= v < 1.0 for v in row["samples"])


def test_audio_features_match_numpy(decoded):
    feats = {r["id"]: r for r in audio_features(decoded).collect()}
    for r in decoded.collect():
        x = np.array(r["samples"])
        f = feats[r["id"]]
        assert f["n_samples"] == len(x)
        assert f["duration_sec"] == pytest.approx(
            round(len(x) / r["sample_rate"], 6), abs=1e-9)
        assert f["rms"] == pytest.approx(
            round(float(np.sqrt(np.mean(x ** 2))), 6), abs=2e-6)
        assert f["peak_abs"] == int(round(np.max(np.abs(x)) * 32768))
        assert f["zero_crossings"] == int(np.sum(x[:-1] * x[1:] < 0))


def test_stereo_mono_downmix(spark):
    # L = 8000, R = -4000 everywhere -> mono mean = 2000/32768
    inter = [8000, -4000] * 50
    df = spark.createDataFrame(
        [(1, bytearray(make_wav(inter, channels=2)))],
        "id long, content binary")
    row = audio_features(decode_audio(df)).collect()[0]
    assert row["n_samples"] == 50
    assert row["rms"] == pytest.approx(2000 / 32768.0, abs=2e-6)
    assert row["zero_crossings"] == 0


def test_goertzel_matches_naive_dft(decoded):
    k = 3
    got = {r["id"]: r["bin_energy"]
           for r in goertzel_bin_energy(decoded, k=k).collect()}
    for r in decoded.collect():
        x = np.array(r["samples"])
        n = len(x)
        i = np.arange(n)
        re = float(np.sum(x * np.cos(2 * math.pi * k * i / n)))
        im = float(np.sum(x * np.sin(2 * math.pi * k * i / n)))
        assert got[r["id"]] == pytest.approx(
            round(re * re + im * im, 6), abs=1e-4)


def test_spectrogram_matches_naive_dft(spark):
    n, fs, hop = 64, 32, 16
    x = np.sin(2 * math.pi * 5 * np.arange(n) / fs) * 0.5
    df = spark.createDataFrame(
        [(1, bytearray(make_wav((x * 32767).astype(int).tolist())))],
        "id long, content binary")
    frames = spectrogram(decode_audio(df), frame_size=fs, hop=hop) \
        .orderBy("frame_idx").collect()
    dec = np.array((x * 32767).astype(int)) / 32768.0
    win = np.hanning(fs)
    nframes = 1 + (n - fs + hop - 1) // hop
    assert len(frames) == nframes
    for f in frames:
        seg = dec[f["frame_idx"] * hop:f["frame_idx"] * hop + fs]
        seg = np.pad(seg, (0, fs - len(seg))) * win
        bins = np.arange(fs // 2 + 1)
        naive = [abs(sum(seg[t] * np.exp(-2j * math.pi * b * t / fs)
                         for t in range(fs))) for b in bins]
        np.testing.assert_allclose(f["magnitudes"], naive, atol=1e-9)


def test_resample_linear_matches_np_interp(spark):
    x = np.linspace(-0.9, 0.9, 100)
    df = spark.createDataFrame(
        [(1, bytearray(make_wav((x * 32000).astype(int).tolist(),
                                rate=8000)))],
        "id long, content binary")
    out = resample_linear(decode_audio(df), target_rate=12000).collect()[0]
    assert out["sample_rate"] == 12000
    src = np.array((x * 32000).astype(int)) / 32768.0
    n_out = int(round(len(src) * 12000 / 8000.0))
    idx = np.arange(n_out) * (8000.0 / 12000)
    ref = np.interp(idx, np.arange(len(src)), src)
    np.testing.assert_allclose(out["samples"], ref, atol=1e-12)
    # no-op path: already at target rate
    same = resample_linear(decode_audio(df), target_rate=8000).collect()[0]
    np.testing.assert_allclose(same["samples"], src, atol=1e-15)


def test_decode_audio_plan_is_single_python_stage(decoded):
    # Features must NOT add a second Python hop: only the decode's
    # mapInPandas appears in the physical plan.
    plan = audio_features(decoded)._jdf.queryExecution().executedPlan() \
        .toString()
    assert plan.count("MapInPandas") <= 1


def test_decode_audio_nonlong_id_types(spark):
    # id schema must follow the input column's type, not hardcode long
    # (a string or int32 id used to fail with an Arrow type error).
    from api_to_amt_data_lake_spark.operators.audio import spectrogram

    wav = bytearray(make_wav([0.5, -0.5, 0.25, -0.25] * 64))
    for decl, val in [("string", "doc-a"), ("int", 7)]:
        df = spark.createDataFrame(
            [(val, wav)], f"id {decl}, content binary")
        out = decode_audio(df).collect()
        assert out[0]["id"] == val and out[0]["channels"] == 1
        spec = spectrogram(decode_audio(df), frame_size=64,
                           hop=32).limit(1).collect()
        assert spec[0]["id"] == val
