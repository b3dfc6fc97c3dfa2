"""Audio decode + feature extraction over binary columns, Spark-first.

Completes the multimodal triad (image: `multimodal.py`/`jpeg.py`,
video: `multimodal.py::sample_video_frames`, audio: here). Audio blobs
travel as opaque `binary` columns; WAV (RIFF PCM) is decoded FOR REAL
with zero codec libraries — a pure struct walk + numpy view:

- PCM integer: 8-bit unsigned, 16/24/32-bit signed little-endian
- IEEE float: 32- and 64-bit (format code 3)
- mono or interleaved multi-channel (any channel count)
- chunk-walking tolerant of extra chunks (LIST/fact/cue) in any order

Entropy-coded audio (MP3, AAC, Opus, Vorbis) needs a codec library the
cluster may not have — those raise ValueError naming the contract, so
callers can swap `_decode_wav` for a codec call while the Spark-side
plumbing (schema, Arrow batching, partitioning) stays identical. Same
boundary policy as images (`multimodal.py`: H.264).

Scale notes (100 TB): decode is the ONLY Python hop — one Arrow-batched
`mapInPandas` pass, embarrassingly parallel, no shuffle. Everything
downstream of decode (RMS, peak, zero-crossings, per-frame single-bin
DFT energy) is expressed with Spark's higher-order array functions
(`aggregate`/`zip_with`/`transform`/`slice`) and runs JVM-side inside
WholeStageCodegen — no second Python hop, no UDF in the hot path. The
full-spectrum spectrogram and the resampler, which genuinely need an
FFT / gather, are numpy inside the same single decode-side pass.

Reference parity: the reference (Ed-Fi API-to-AMT) has no audio path;
this module is beyond-reference scope — the training-data-pipeline
mandate's multimodal columns (image/audio/video as opaque binary plus
typed metadata), sibling to `multimodal.py`.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "decode_audio",
    "audio_features",
    "goertzel_bin_energy",
    "spectrogram",
    "resample_linear",
]

_PCM_WIDTHS = {8, 16, 24, 32}
_FLOAT_WIDTHS = {32, 64}


def _decode_wav(b: bytes):
    """Parse one RIFF/WAVE blob -> (sample_rate, channels, samples).

    `samples` is a 1-D float64 numpy array of the interleaved frames
    normalized to [-1, 1): integers divide by 2^(bits-1), floats pass
    through. Raises ValueError on non-RIFF bytes, compressed format
    codes, or unsupported widths — naming the contract so the decode
    stage can be swapped for a codec library with the same signature.
    """
    import numpy as np

    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(
            "audio decode is real for RIFF/WAVE PCM and IEEE-float; "
            "compressed codecs (MP3/AAC/Opus) need a codec library — "
            "contract: (id, content) -> "
            "(id, sample_rate, channels, samples)")
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    (bits,) = struct.unpack_from("<H", fmt, 14)
    if audio_format == 0xFFFE and len(fmt) >= 26:  # WAVE_FORMAT_EXTENSIBLE
        (audio_format,) = struct.unpack_from("<H", fmt, 24)
    if audio_format == 1 and bits in _PCM_WIDTHS:
        if bits == 8:  # 8-bit WAV is unsigned, midpoint 128
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 24:  # no native int24: widen 3-byte LE to int32
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
            x = (raw[:, 0].astype(np.int32)
                 | (raw[:, 1].astype(np.int32) << 8)
                 | (raw[:, 2].astype(np.int32) << 16))
            x = np.where(x >= 1 << 23, x - (1 << 24), x)
            x = x.astype(np.float64) / float(1 << 23)
        else:
            dt = np.int16 if bits == 16 else np.int32
            x = np.frombuffer(
                data[: (len(data) // (bits // 8)) * (bits // 8)],
                dtype=np.dtype(dt).newbyteorder("<")).astype(np.float64)
            x = x / float(1 << (bits - 1))
    elif audio_format == 3 and bits in _FLOAT_WIDTHS:
        dt = np.float32 if bits == 32 else np.float64
        x = np.frombuffer(
            data[: (len(data) // (bits // 8)) * (bits // 8)],
            dtype=np.dtype(dt).newbyteorder("<")).astype(np.float64)
    else:
        raise ValueError(
            f"WAV format code {audio_format} width {bits} is compressed "
            "or unsupported; decode contract covers PCM 8/16/24/32-bit "
            "and IEEE float 32/64-bit")
    if channels > 1:  # drop a trailing partial frame, keep interleaving
        x = x[: (len(x) // channels) * channels]
    return int(sample_rate), int(channels), x


def decode_audio(df: DataFrame, content_col: str = "content",
                 id_col: str = "id") -> DataFrame:
    """Decode WAV blobs to normalized sample arrays, Arrow-batched.

    (id, content: binary) -> (id, sample_rate int, channels int,
    samples array<double>) with `samples` interleaved when channels > 1
    and every value in [-1, 1). One mapInPandas pass, no shuffle; all
    downstream features stay JVM-side (see `audio_features`).
    """
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (f"{id_col} {id_type}, sample_rate int, channels int, "
                  "samples array<double>")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_wav(bytes(b)) for b in pdf[content_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "sample_rate": pd.array([d[0] for d in decoded],
                                        dtype="Int32"),
                "channels": pd.array([d[1] for d in decoded],
                                     dtype="Int32"),
                "samples": [list(d[2]) for d in decoded],
            })

    return df.mapInPandas(batches, out_schema)


def _mono(samples: Column, channels: Column) -> Column:
    """Mean-downmix interleaved frames to mono, JVM-side.

    For channels == 1 this is the identity (fast path, no transform).
    Otherwise frame f averages samples[f*ch .. f*ch+ch-1] via a
    transform over frame indices + an inner aggregate — still inside
    codegen, no Python.
    """
    n_frames = (F.size(samples) / channels).cast("int")
    mixed = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda f: F.aggregate(
            F.slice(samples, f * channels + 1, channels),
            F.lit(0.0), lambda acc, x: acc + x) / channels)
    return F.when(channels == 1, samples).otherwise(mixed)


def audio_features(df: DataFrame, samples_col: str = "samples",
                   rate_col: str = "sample_rate",
                   channels_col: str = "channels") -> DataFrame:
    """Per-row audio features over a decoded sample array — all
    computed with Spark higher-order functions (JVM, codegen), zero
    Python:

    - n_samples: frames after mono downmix
    - duration_sec: frames / rate (6dp)
    - rms: sqrt(mean(x^2)) of the normalized signal (6dp)
    - peak_abs: max |sample| in RAW int16 units (exact integer — the
      normalization is by 2^15, so peak*32768 is integral for 16-bit
      sources and a faithful rounding otherwise)
    - zero_crossings: adjacent sign flips (x[i]*x[i+1] < 0) via
      zip_with over two shifted slices
    """
    s = _mono(F.col(samples_col), F.col(channels_col))
    df = df.withColumn("_mono", s)
    m = F.col("_mono")
    n = F.size(m)
    sumsq = F.aggregate(m, F.lit(0.0), lambda acc, x: acc + x * x)
    peak = F.aggregate(m, F.lit(0.0),
                       lambda acc, x: F.greatest(acc, F.abs(x)))
    pairlen = F.greatest(n - 1, F.lit(0))  # slice() rejects negatives
    flips = F.zip_with(
        F.slice(m, 1, pairlen), F.slice(m, 2, pairlen),
        lambda a, b: F.when(a * b < 0, 1).otherwise(0))
    return (
        df.withColumn("n_samples", n)
        .withColumn("duration_sec",
                    F.round(n.cast("double") / F.col(rate_col), 6))
        .withColumn("rms", F.round(F.sqrt(sumsq / n), 6))
        .withColumn("peak_abs",
                    F.round(peak * F.lit(32768.0)).cast("long"))
        .withColumn("zero_crossings",
                    F.aggregate(flips, F.lit(0),
                                lambda acc, x: acc + x).cast("long"))
        .drop("_mono")
    )


def goertzel_bin_energy(df: DataFrame, k: int,
                        samples_col: str = "samples",
                        out_col: str = "bin_energy") -> DataFrame:
    """Energy at DFT bin k over the whole clip, JVM-side (no FFT):
    (sum x_i cos(2*pi*k*i/n))^2 + (sum x_i sin(2*pi*k*i/n))^2.

    The classic single-bin Goertzel/DFT probe (tone detection, DTMF):
    for a handful of bins this beats materializing a full spectrum, and
    — unlike an FFT — it is expressible entirely with `transform` +
    `aggregate`, so it stays inside WholeStageCodegen AND has an exact
    SQL oracle (sum of cos/sin terms). Use `spectrogram` when you need
    every bin.
    """
    s = F.col(samples_col)
    n = F.size(s)
    idx = F.sequence(F.lit(0), n - 1)
    two_pi_k = F.lit(2.0 * 3.141592653589793 * k)
    re_terms = F.zip_with(s, idx,
                          lambda x, i: x * F.cos(two_pi_k * i / n))
    im_terms = F.zip_with(s, idx,
                          lambda x, i: x * F.sin(two_pi_k * i / n))
    re = F.aggregate(re_terms, F.lit(0.0), lambda a, x: a + x)
    im = F.aggregate(im_terms, F.lit(0.0), lambda a, x: a + x)
    return df.withColumn(out_col, F.round(re * re + im * im, 6))


def spectrogram(df: DataFrame, frame_size: int = 256, hop: int = 128,
                samples_col: str = "samples",
                id_col: str = "id") -> DataFrame:
    """Full magnitude spectrogram: one row per (id, frame_idx) with
    `magnitudes: array<double>` of length frame_size//2 + 1 (rFFT bins,
    Hann-windowed). numpy FFT inside one Arrow-batched pass — the FFT
    genuinely can't be expressed with built-in operators; everything
    around it (framing layout, schema, partitioning) is plain Spark.
    Frames shorter than frame_size at the tail are zero-padded.
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (f"{id_col} {id_type}, frame_idx int, "
                  "magnitudes array<double>")
    win = None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nonlocal win
        import numpy as np
        if win is None:
            win = np.hanning(frame_size)
        for pdf in it:
            ids, fidx, mags = [], [], []
            for rid, arr in zip(pdf[id_col], pdf[samples_col]):
                x = np.asarray(arr, dtype=np.float64)
                nframes = max(1, 1 + (len(x) - frame_size + hop - 1)
                              // hop) if len(x) else 0
                for f in range(nframes):
                    seg = x[f * hop:f * hop + frame_size]
                    if len(seg) < frame_size:
                        seg = np.pad(seg, (0, frame_size - len(seg)))
                    spec = np.abs(np.fft.rfft(seg * win))
                    ids.append(rid)
                    fidx.append(f)
                    mags.append(list(spec))
            yield pd.DataFrame({id_col: ids,
                                "frame_idx": pd.array(fidx, dtype="Int32"),
                                "magnitudes": mags})

    return df.mapInPandas(batches, out_schema)


def resample_linear(df: DataFrame, target_rate: int,
                    samples_col: str = "samples",
                    rate_col: str = "sample_rate") -> DataFrame:
    """Linear-interpolation resample of mono sample arrays to
    target_rate, one Arrow-batched pass (numpy interp — a gather with
    fractional indices, not expressible with built-in array functions).
    Output replaces `samples` and sets sample_rate = target_rate. The
    resampled length is round(n * target/orig) so duration is
    preserved to within half an output sample.
    """
    import pandas as pd

    fields = ", ".join(
        f"{f.name} int" if f.name == rate_col
        else f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields)
    cols = list(df.columns)  # captured as plain data — never the DataFrame
    other = [c for c in cols if c not in (samples_col, rate_col)]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in it:
            out_samples = []
            for arr, orig in zip(pdf[samples_col], pdf[rate_col]):
                x = np.asarray(arr, dtype=np.float64)
                if int(orig) == target_rate or len(x) == 0:
                    out_samples.append(list(x))
                    continue
                n_out = max(1, int(round(len(x) * target_rate
                                         / float(orig))))
                src = np.arange(n_out, dtype=np.float64) \
                    * (float(orig) / target_rate)
                out_samples.append(list(np.interp(
                    src, np.arange(len(x), dtype=np.float64), x)))
            data = {c: pdf[c] for c in other}
            data[rate_col] = pd.array([target_rate] * len(pdf),
                                      dtype="Int32")
            data[samples_col] = out_samples
            yield pd.DataFrame(data)[cols]

    return df.mapInPandas(batches, fields)
