"""Baseline + progressive JPEG codec — pure Python + numpy, no codec
library.

Closes the last image-decode boundary in `operators/multimodal.py`:
BMP, PNG (stdlib zlib), and GIF (pure-Python LZW) already decode for
real; this module adds baseline sequential DCT JPEG (SOF0) and
progressive DCT JPEG (SOF2).

Decoder scope: 8-bit baseline (SOF0) and progressive (SOF2), grayscale
and 4:4:4 / 4:2:2 / 4:2:0 color (sampling factors up to 2×2,
interleaved MCUs, nearest chroma upsampling), restart markers honored
(DRI + RSTn prediction resets). Progressive covers both dimensions of
T.81 Annex G: spectral selection (DC scan + per-component AC band
scans, EOB-run coding) and successive approximation (DC/AC first scans
at Al > 0 plus DC bit refinement and the G.1.2.3 AC correction-bit
refinement procedure). Anything else (hierarchical, arithmetic coding,
12-bit) raises a named ValueError. The baseline pieces:

- segment walk: DQT (8-bit precision), DHT (canonical Huffman), SOF0,
  SOS; APPn/COM skipped by length,
- MSB-first bit reader over the 0xFF00-unstuffed entropy stream,
- per-block decode: DC category + difference with prediction, AC
  run/size symbols with EOB and ZRL, dezigzag, dequantize,
- exact orthonormal inverse DCT as two 8×8 matrix multiplies,
- level shift + clip; JFIF full-range YCbCr→RGB for 3 components.

Encoder (`encode_jpeg_baseline`): the sink half — writing an image
column back out as standards-compliant JPEG bytes — and the fixture
builder for verification. It emits simple, provably legal Huffman
tables (all 4-bit DC codes, all 9-bit AC codes — canonical, never
all-ones) rather than the Annex K defaults; any conformant decoder
reads the tables from the DHT segments it writes.

Verification is NOT just encoder↔decoder round-trip (symmetric bugs
would cancel): tests also pin the IDCT against the direct O(N⁴)
cosine-sum definition and decode single-coefficient streams into
their analytic cosine patterns, which catches zigzag/scale/basis
errors asymmetrically. With a flat quantization table the lossy steps
reduce to DCT-coefficient rounding, so round-trips assert tight ±
tolerances.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag: scan-order index -> (row, col). Odd diagonals walk down-right,
# even walk up-right, clipped to the 8x8 block.
ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    _rng = range(_s + 1) if _s % 2 else reversed(range(_s + 1))
    for _r in _rng:
        _c = _s - _r
        if _r < 8 and _c < 8:
            ZIGZAG.append((_r, _c))

# Orthonormal 8-point DCT-II matrix: forward F = C @ f @ C.T, inverse
# f = C.T @ F @ C. JPEG's normalization matches the orthonormal form.
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else np.sqrt(0.25)
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _build_decode_table(counts: list[int], symbols: list[int]) -> dict:
    """Canonical Huffman: {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


class _Bits:
    """MSB-first reader over an already-unstuffed entropy buffer."""

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0  # bit position

    def bit(self) -> int:
        byte = self.i >> 3
        if byte >= len(self.d):
            raise ValueError("JPEG entropy stream ended early")
        b = (self.d[byte] >> (7 - (self.i & 7))) & 1
        self.i += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _entropy_segments(b: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy data split at restart markers, 0xFF00 unstuffed: one
    buffer per restart interval (a single buffer when DRI is unused).
    Returns (segments, position of the terminating marker's 0xFF)."""
    segs = [bytearray()]
    while pos < len(b):
        c = b[pos]
        if c == 0xFF:
            nxt = b[pos + 1] if pos + 1 < len(b) else 0xD9
            if nxt == 0x00:
                segs[-1].append(0xFF)
                pos += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: new interval
                segs.append(bytearray())
                pos += 2
                continue
            break  # next real marker (EOI, DHT, SOS, ...)
        segs[-1].append(c)
        pos += 1
    return [bytes(s) for s in segs], pos


def _unstuff_segments(b: bytes, pos: int) -> list[bytes]:
    return _entropy_segments(b, pos)[0]


def decode_jpeg(b: bytes) -> tuple[int, int, int, bytes]:
    """JPEG → (w, h, channels, row-major sample bytes). Grayscale stays
    1 channel; color returns RGB. Handles baseline sequential (SOF0,
    single interleaved scan) and progressive (SOF2, multi-scan spectral
    selection + successive approximation)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG blob")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    w = h = None
    dri = 0
    progressive = False
    comps: list[tuple[int, int, int, int]] = []  # (id, tq, hi, vi)
    prog = None  # _ProgressiveState once SOF2 is seen
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG segment misalignment")
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", b[pos + 2:pos + 4])[0]
        seg = b[pos + 4:pos + 2 + ln]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros((8, 8))
                for i, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = seg[off + 1 + i]
                qt[tq] = tbl
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                counts = list(seg[off + 1:off + 17])
                n = sum(counts)
                symbols = list(seg[off + 17:off + 17 + n])
                huff[(tc, th)] = _build_decode_table(counts, symbols)
                off += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"JPEG precision {prec} not supported")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                hi, vi = samp >> 4, samp & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"JPEG sampling factor {hi}x{vi} not supported "
                        f"(1x1 / 2x1 / 1x2 / 2x2 decode here)")
                comps.append((cid, tq, hi, vi))
            if progressive:
                prog = _ProgressiveState(w, h, comps)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential (SOF0) and progressive (SOF2) "
                "JPEG decode here (no hierarchical / arithmetic / "
                "lossless modes)")
        elif marker == 0xDD:  # DRI — restart interval in MCUs
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                idx = next(j for j, c in enumerate(comps) if c[0] == cid)
                scan.append((idx, tabs >> 4, tabs & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            segs, end = _entropy_segments(b, pos + 2 + ln)
            if not progressive:
                return _decode_scan(segs, w, h, comps, scan, qt, huff, dri)
            prog.decode_scan(segs, scan, ss, se, ah, al, huff, dri)
            pos = end
            continue
        pos += 2 + ln
    if progressive and prog is not None and prog.any_scan:
        return prog.finish(qt)
    raise ValueError("JPEG has no scan data")


# Kept name: the original baseline-only entry point now also handles
# progressive streams (same contract, wider coverage).
decode_jpeg_baseline = decode_jpeg


def _read_block(bits, dct, act, pred_val, quant):
    """One 8x8 block: DC diff + AC run/size stream -> spatial pixels
    (level-shifted). Returns (pixel block, new DC prediction)."""
    coeffs = np.zeros(64)
    t = bits.huff(dct)
    pred_val += _extend(bits.bits(t), t)
    coeffs[0] = pred_val
    k = 1
    while k < 64:
        sym = bits.huff(act)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k > 63 or size == 0:
            raise ValueError("corrupt JPEG AC coefficients")
        coeffs[k] = _extend(bits.bits(size), size)
        k += 1
    block = np.zeros((8, 8))
    for i, (r, c) in enumerate(ZIGZAG):
        block[r, c] = coeffs[i]
    return _idct2(block * quant) + 128.0, pred_val


def _decode_scan(segs, w, h, comps, scan, qt, huff, dri=0):
    bits = _Bits(segs[0])
    nc = len(scan)
    hmax = max(comps[ci][2] for ci, _, _ in scan)
    vmax = max(comps[ci][3] for ci, _, _ in scan)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # per-scan-component plane at ITS OWN resolution (hi/hmax of full)
    planes = [np.zeros((mcuy * 8 * comps[ci][3], mcux * 8 * comps[ci][2]))
              for ci, _, _ in scan]
    pred = [0] * nc
    mcu = seg_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu and mcu % dri == 0:
                # restart: next interval segment, byte-aligned, DC
                # predictions reset
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("JPEG missing restart interval data")
                bits = _Bits(segs[seg_i])
                pred = [0] * nc
            mcu += 1
            # MCU = vi x hi blocks per component, components in scan
            # order, blocks raster order within the component
            for s_i, (ci, dc_id, ac_id) in enumerate(scan):
                _, tq, hi, vi = comps[ci]
                for byy in range(vi):
                    for bxx in range(hi):
                        px, pred[s_i] = _read_block(
                            bits, huff[(0, dc_id)], huff[(1, ac_id)],
                            pred[s_i], qt[tq])
                        y0 = (my * vi + byy) * 8
                        x0 = (mx * hi + bxx) * 8
                        planes[s_i][y0:y0 + 8, x0:x0 + 8] = px
    # upsample every component to full resolution (nearest), then crop
    full = []
    for s_i, (ci, _, _) in enumerate(scan):
        _, _, hi, vi = comps[ci]
        p = planes[s_i]
        if hi != hmax or vi != vmax:
            rows = np.arange(mcuy * 8 * vmax) * vi // vmax
            cols = np.arange(mcux * 8 * hmax) * hi // hmax
            p = p[np.ix_(rows, cols)]
        full.append(p[:h, :w])
    planes = full
    if nc == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return (w, h, 1, gray.tobytes())
    if nc != 3:
        raise ValueError(f"{nc}-component JPEG not supported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.round(np.stack([r, g, bl], axis=-1)), 0, 255) \
        .astype(np.uint8)
    return (w, h, 3, np.ascontiguousarray(rgb).tobytes())


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode — T.81 Annex G.
# ---------------------------------------------------------------------------


class _ProgressiveState:
    """Accumulates DCT coefficients across a progressive JPEG's scans.

    Coefficients live in zigzag order, one int32[64] row per 8×8 block,
    per component, at the MCU-padded block grid. DC scans may be
    interleaved (MCU order) or single-component; AC scans are always
    single-component (T.81 G.1) and walk the component's OWN block grid
    (ceil(comp_w/8) × ceil(comp_h/8)), not the padded one. Successive
    approximation state: per-(component, band) EOB run counters live
    only within one scan; DC prediction resets per scan and per restart
    interval.
    """

    def __init__(self, w: int, h: int, comps):
        self.w, self.h, self.comps = w, h, comps
        self.hmax = max(c[2] for c in comps)
        self.vmax = max(c[3] for c in comps)
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.coef: list[np.ndarray] = []
        self.bdims: list[tuple[int, int]] = []  # non-interleaved (bw, bh)
        for _, _, hi, vi in comps:
            pad_bw, pad_bh = self.mcux * hi, self.mcuy * vi
            self.coef.append(
                np.zeros((pad_bh, pad_bw, 64), dtype=np.int64))
            comp_w = -(-w * hi // self.hmax)
            comp_h = -(-h * vi // self.vmax)
            self.bdims.append((-(-comp_w // 8), -(-comp_h // 8)))
        self.any_scan = False

    # -- per-block coefficient procedures (T.81 G.1.2 / libjpeg names) --

    @staticmethod
    def _dc_first(bits, dct, coef, pred, al):
        t = bits.huff(dct)
        pred += _extend(bits.bits(t), t)
        coef[0] = pred << al
        return pred

    @staticmethod
    def _dc_refine(bits, coef, al):
        if bits.bit():
            coef[0] |= 1 << al

    @staticmethod
    def _ac_first(bits, act, coef, ss, se, al, eobrun):
        """G.1.2.2: first AC scan of a band — run/size with EOBn runs;
        values arrive shifted left by the point transform."""
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            sym = bits.huff(act)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += bits.bits(r)
                break
            k += r
            if k > se:
                raise ValueError("corrupt progressive JPEG AC band")
            coef[k] = _extend(bits.bits(s), s) << al
            k += 1
        return eobrun

    @staticmethod
    def _ac_refine(bits, act, coef, ss, se, al, eobrun):
        """G.1.2.3: AC successive-approximation refinement — newly
        significant coefficients carry sign bits; already-nonzero ones
        receive correction bits along every traversal."""
        p1, m1 = 1 << al, -1 << al

        def correct(k):
            if bits.bit() and (coef[k] & p1) == 0:
                coef[k] += p1 if coef[k] >= 0 else m1

        k = ss
        if eobrun == 0:
            while k <= se:
                sym = bits.huff(act)
                r, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += bits.bits(r)
                        break
                    val = 0  # ZRL: pass 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError(
                            "corrupt AC refinement (size != 1)")
                    val = p1 if bits.bit() else m1
                while k <= se:
                    if coef[k] != 0:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    coef[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:  # EOB run still refines nonzero history
                if coef[k] != 0:
                    correct(k)
                k += 1
            eobrun -= 1
        return eobrun

    # -- scan walk --

    def decode_scan(self, segs, scan, ss, se, ah, al, huff, dri):
        self.any_scan = True
        if ss == 0 and se != 0:
            raise ValueError(
                "progressive DC scan must have Se=0 (T.81 G.1 spectral "
                "selection); a baseline-shaped 0..63 scan is not legal "
                "under SOF2")
        if ss != 0 and len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        bits = _Bits(segs[0])
        seg_i = 0
        pred = [0] * len(scan)
        if ss == 0 and len(scan) > 1:
            # interleaved DC scan: MCU order, vi×hi blocks per component
            mcu = 0
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    if dri and mcu and mcu % dri == 0:
                        seg_i += 1
                        bits = _Bits(segs[seg_i])
                        pred = [0] * len(scan)
                    mcu += 1
                    for s_i, (ci, dc_id, _) in enumerate(scan):
                        _, _, hi, vi = self.comps[ci]
                        for byy in range(vi):
                            for bxx in range(hi):
                                blk = self.coef[ci][my * vi + byy,
                                                    mx * hi + bxx]
                                if ah == 0:
                                    pred[s_i] = self._dc_first(
                                        bits, huff[(0, dc_id)], blk,
                                        pred[s_i], al)
                                else:
                                    self._dc_refine(bits, blk, al)
            return
        # single-component scan (DC or an AC band): component block grid
        ci, dc_id, ac_id = scan[0]
        bw, bh = self.bdims[ci]
        eobrun = 0
        blkno = 0
        for by in range(bh):
            for bx in range(bw):
                if dri and blkno and blkno % dri == 0:
                    seg_i += 1
                    bits = _Bits(segs[seg_i])
                    pred = [0]
                    eobrun = 0
                blkno += 1
                blk = self.coef[ci][by, bx]
                if ss == 0:
                    if ah == 0:
                        pred[0] = self._dc_first(
                            bits, huff[(0, dc_id)], blk, pred[0], al)
                    else:
                        self._dc_refine(bits, blk, al)
                elif ah == 0:
                    eobrun = self._ac_first(
                        bits, huff[(1, ac_id)], blk, ss, se, al, eobrun)
                else:
                    eobrun = self._ac_refine(
                        bits, huff[(1, ac_id)], blk, ss, se, al, eobrun)

    # -- final reconstruction (shared tail with the baseline path) --

    def finish(self, qt) -> tuple[int, int, int, bytes]:
        planes = []
        for ci, (_, tq, hi, vi) in enumerate(self.comps):
            pad_bh, pad_bw = self.coef[ci].shape[:2]
            plane = np.zeros((pad_bh * 8, pad_bw * 8))
            quant = qt[tq]
            for by in range(pad_bh):
                for bx in range(pad_bw):
                    zz = self.coef[ci][by, bx]
                    block = np.zeros((8, 8))
                    for i, (r, c) in enumerate(ZIGZAG):
                        block[r, c] = zz[i]
                    plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                        _idct2(block * quant) + 128.0
            if hi != self.hmax or vi != self.vmax:
                rows = np.arange(self.mcuy * 8 * self.vmax) * vi // self.vmax
                cols = np.arange(self.mcux * 8 * self.hmax) * hi // self.hmax
                plane = plane[np.ix_(rows, cols)]
            planes.append(plane[:self.h, :self.w])
        w, h = self.w, self.h
        if len(planes) == 1:
            gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
            return (w, h, 1, gray.tobytes())
        if len(planes) != 3:
            raise ValueError(f"{len(planes)}-component JPEG not supported")
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.round(np.stack([r, g, bl], axis=-1)), 0, 255) \
            .astype(np.uint8)
        return (w, h, 3, np.ascontiguousarray(rgb).tobytes())


# ---------------------------------------------------------------------------
# Encoder — the sink half, and the independent fixture builder.
# ---------------------------------------------------------------------------

# Legal-by-construction canonical tables: 12 DC symbols at 4 bits
# (codes 0..11 — never all-ones), 255 AC symbols at 9 bits + 1 at 10
# (a DHT count byte caps at 255 per length; the canonical 10-bit code
# is 0b1111111100 — not all-ones). Wasteful vs Annex K, trivially
# correct.
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = list(range(12))
_AC_COUNTS = [0] * 8 + [255, 1] + [0] * 6
_AC_SYMBOLS = list(range(256))


def _encode_codes(counts, symbols):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[symbols[k]] = (ln, code)
            k += 1
            code += 1
        code <<= 1
    return codes


_DC_CODES = _encode_codes(_DC_COUNTS, _DC_SYMBOLS)
_AC_CODES = _encode_codes(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def byte_align(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad

    def raw(self, bts: bytes) -> None:
        assert self.n == 0
        self.out += bts

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(wtr: _BitWriter, block: np.ndarray, quant: np.ndarray,
                  pred: int) -> int:
    coeffs = np.round(_dct2(block - 128.0) / quant).astype(int)
    zz = [int(coeffs[r, c]) for (r, c) in ZIGZAG]
    diff = zz[0] - pred
    t = _category(diff)
    ln, code = _DC_CODES[t]
    wtr.write(code, ln)
    if t:
        wtr.write(_mag_bits(diff, t), t)
    k, run = 1, 0
    while k < 64:
        v = zz[k]
        if v == 0:
            run += 1
        else:
            while run > 15:
                ln, code = _AC_CODES[0xF0]
                wtr.write(code, ln)
                run -= 16
            s = _category(v)
            ln, code = _AC_CODES[(run << 4) | s]
            wtr.write(code, ln)
            wtr.write(_mag_bits(v, s), s)
            run = 0
        k += 1
    if run:
        ln, code = _AC_CODES[0x00]
        wtr.write(code, ln)
    return zz[0]


_SUBSAMPLING = {
    "444": [(1, 1), (1, 1), (1, 1)],
    "422": [(2, 1), (1, 1), (1, 1)],
    "420": [(2, 2), (1, 1), (1, 1)],
}


def _component_planes(pixels: np.ndarray, subsampling: str):
    """RGB→YCbCr (or passthrough gray), per-component box-average chroma
    downsample, edge-pad to whole MCUs. Returns (padded planes, sampling
    factors, mcux, mcuy) — shared by both encoders."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
        samps = [(1, 1)]
    else:
        p = pixels.astype(np.float64)
        r, g, bl = p[..., 0], p[..., 1], p[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * bl,
            -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0,
        ]
        samps = _SUBSAMPLING[subsampling]
    hmax = max(hv[0] for hv in samps)
    vmax = max(hv[1] for hv in samps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for pl, (hi, vi) in zip(planes, samps):
        if (hi, vi) != (hmax, vmax):
            # box-average downsample to this component's resolution
            fy, fx = vmax // vi, hmax // hi
            ph = -(-h // fy) * fy
            pw = -(-w // fx) * fx
            fullp = np.pad(pl, ((0, ph - h), (0, pw - w)), mode="edge")
            pl = fullp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        ch, cw = pl.shape
        th, tw = mcuy * 8 * vi, mcux * 8 * hi
        padded.append(np.pad(pl, ((0, th - ch), (0, tw - cw)),
                             mode="edge"))
    return padded, samps, mcux, mcuy


def encode_jpeg_baseline(pixels: np.ndarray,
                         quant: np.ndarray | None = None,
                         restart_interval: int = 0,
                         subsampling: str = "444") -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as
    baseline JPEG. Default quantization is the flat all-ones table —
    near-lossless (DCT rounding only), the right setting for fixture
    bytes and archival sinks; pass a real table for compression.
    `restart_interval` > 0 writes a DRI segment and RSTn markers every
    that many MCUs (what camera/scanner JPEGs do for error resilience —
    and the decoder-side path that exercises prediction resets).
    `subsampling` is "444", "422", or "420" for color input — "420"
    box-averages chroma 2x2 (the camera default, half the chroma
    blocks of 4:4:4)."""
    if quant is None:
        quant = np.ones((8, 8))
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    padded, samps, mcux, mcuy = _component_planes(pixels, subsampling)
    hmax = max(hv[0] for hv in samps)
    vmax = max(hv[1] for hv in samps)

    wtr = _BitWriter()
    pred = [0] * len(padded)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wtr.byte_align()
                n = (mcu // restart_interval - 1) % 8
                wtr.raw(bytes([0xFF, 0xD0 + n]))
                pred = [0] * len(padded)
            mcu += 1
            for ci, (pl, (hi, vi)) in enumerate(zip(padded, samps)):
                for byy in range(vi):
                    for bxx in range(hi):
                        y0 = (my * vi + byy) * 8
                        x0 = (mx * hi + bxx) * 8
                        block = pl[y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = _encode_block(wtr, block, quant,
                                                 pred[ci])
    data = wtr.flush()

    zz_quant = bytes(int(quant[r, c]) for (r, c) in ZIGZAG)
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_quant
    nc = 1 if gray else 3
    sof_comp = b"".join(
        bytes([i + 1, (samps[i][0] << 4) | samps[i][1], 0])
        for i in range(nc))
    sof = (b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc) + b"\x08"
           + struct.pack(">HH", h, w) + bytes([nc]) + sof_comp)

    def dht(tc, th, counts, symbols):
        payload = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    dhts = dht(0, 0, _DC_COUNTS, _DC_SYMBOLS) \
        + dht(1, 0, _AC_COUNTS, _AC_SYMBOLS)
    dri_seg = b""
    if restart_interval:
        dri_seg = b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos_comp = b"".join(bytes([i + 1, 0x00]) for i in range(nc))
    sos = (b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
           + sos_comp + b"\x00\x3f\x00")
    return (b"\xff\xd8" + dqt + sof + dhts + dri_seg + sos + data
            + b"\xff\xd9")


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — fixture builder and sink variant.
# ---------------------------------------------------------------------------


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _zz_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Quantized DCT coefficients for every 8×8 block of a padded
    plane, in zigzag order: int array (bh, bw, 64)."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            c = np.round(_dct2(
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0)
                / quant).astype(np.int64)
            out[by, bx] = [c[r, cc] for (r, cc) in ZIGZAG]
    return out


def _emit_dc_first(wtr, zz0: int, pred: int, al: int) -> int:
    """DC first scan: diff of the arithmetic-shifted value."""
    v = zz0 >> al  # arithmetic shift: two's-complement consistent with
    diff = v - pred  # the decoder's (pred << al) | refinement-bit rebuild
    t = _category(diff)
    ln, code = _DC_CODES[t]
    wtr.write(code, ln)
    if t:
        wtr.write(_mag_bits(diff, t), t)
    return v


def _emit_ac_first(wtr, zz: np.ndarray, ss: int, se: int, al: int) -> None:
    """AC first scan of a band (per-block EOB, no cross-block runs).
    Point transform is sign-magnitude: |v| >> al with the sign kept
    (T.81 A.4 for AC), so the refinement scan's correction bits are the
    next magnitude bits."""
    def pt(v):
        m = abs(int(v)) >> al
        return -m if v < 0 else m

    vals = [pt(zz[k]) for k in range(ss, se + 1)]
    last = max((i for i, v in enumerate(vals) if v), default=-1)
    run = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = _AC_CODES[0xF0]
            wtr.write(code, ln)
            run -= 16
        s = _category(v)
        ln, code = _AC_CODES[(run << 4) | s]
        wtr.write(code, ln)
        wtr.write(_mag_bits(v, s), s)
        run = 0
    if last < len(vals) - 1:
        ln, code = _AC_CODES[0x00]  # EOB (run length 1)
        wtr.write(code, ln)


def _emit_ac_refine(wtr, zz: np.ndarray, ss: int, se: int, al: int) -> None:
    """AC successive-approximation refinement (T.81 G.1.2.3 /
    libjpeg encode_mcu_AC_refine, per-block EOB): newly significant
    coefficients (|v| >> al == 1) get run/1 + sign; history
    coefficients (|v| >> al > 1) get correction bits buffered and
    flushed right after the next emitted symbol — the exact positions
    the decoder's traversal reads them."""
    temps = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    signs = [int(zz[k]) >= 0 for k in range(ss, se + 1)]
    eob = max((i for i, t in enumerate(temps) if t == 1), default=-1)
    run = 0          # zero-HISTORY positions since last symbol
    pending: list[int] = []  # correction bits since last symbol
    for i, t in enumerate(temps):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            ln, code = _AC_CODES[0xF0]
            wtr.write(code, ln)
            run -= 16
            for b in pending:
                wtr.write(b, 1)
            pending = []
        if t > 1:  # history: correction bit only, run unaffected
            pending.append(t & 1)
            continue
        # newly significant
        ln, code = _AC_CODES[(run << 4) | 1]
        wtr.write(code, ln)
        wtr.write(1 if signs[i] else 0, 1)
        for b in pending:
            wtr.write(b, 1)
        pending = []
        run = 0
    if run > 0 or pending:
        ln, code = _AC_CODES[0x00]  # EOB; decoder then corrects the tail
        wtr.write(code, ln)
        for b in pending:
            wtr.write(b, 1)


def encode_jpeg_progressive(pixels: np.ndarray,
                            quant: np.ndarray | None = None,
                            subsampling: str = "444",
                            successive: bool = True,
                            split_bands: bool = True) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as
    PROGRESSIVE (SOF2) JPEG — the fixture builder for the decoder's
    Annex G path and the archival sink variant.

    Scan script (the shape real progressive encoders emit):
      1. interleaved DC scan, Al=1 when `successive` else 0
      2. DC refinement scan (Ah=1, Al=0) when `successive`
      3. per component, AC band scans (Ss 1-5 and 6-63 when
         `split_bands`, else one 1-63 band), Al=1 when `successive`
      4. per component+band, AC refinement scans (Ah=1, Al=0) when
         `successive` — the G.1.2.3 correction-bit procedure.
    Tables are the module's legal-by-construction canonical set; every
    scan re-uses them via the single DHT pair.
    """
    if quant is None:
        quant = np.ones((8, 8))
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    padded, samps, mcux, mcuy = _component_planes(pixels, subsampling)
    nc = len(padded)
    coefs = [_zz_blocks(pl, quant) for pl in padded]

    al1 = 1 if successive else 0
    bands = [(1, 5), (6, 63)] if split_bands else [(1, 63)]

    scans: list[bytes] = []

    def sos_header(comp_ids, ss, se, ah, al):
        comp_bytes = b"".join(bytes([cid, 0x00]) for cid in comp_ids)
        return (b"\xff\xda" + struct.pack(">H", 6 + 2 * len(comp_ids))
                + bytes([len(comp_ids)]) + comp_bytes
                + bytes([ss, se, (ah << 4) | al]))

    # 1. interleaved DC first scan
    wtr = _BitWriter()
    pred = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                hi, vi = samps[ci]
                for byy in range(vi):
                    for bxx in range(hi):
                        zz0 = int(coefs[ci][my * vi + byy,
                                            mx * hi + bxx, 0])
                        pred[ci] = _emit_dc_first(wtr, zz0, pred[ci], al1)
    scans.append(sos_header(range(1, nc + 1), 0, 0, 0, al1) + wtr.flush())

    # 2. DC refinement
    if successive:
        wtr = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    hi, vi = samps[ci]
                    for byy in range(vi):
                        for bxx in range(hi):
                            zz0 = int(coefs[ci][my * vi + byy,
                                                mx * hi + bxx, 0])
                            wtr.write(zz0 & 1, 1)
        scans.append(sos_header(range(1, nc + 1), 0, 0, 1, 0)
                     + wtr.flush())

    # 3./4. per-component AC bands: non-interleaved, the component's
    # OWN block grid (ceil(comp_dim/8)), matching the decoder walk.
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    def comp_blocks(ci):
        hi, vi = samps[ci]
        return (_ceil_div(_ceil_div(w * hi, hmax), 8),
                _ceil_div(_ceil_div(h * vi, vmax), 8))

    for ci in range(nc):
        bw, bh = comp_blocks(ci)
        for ss, se in bands:
            wtr = _BitWriter()
            for by in range(bh):
                for bx in range(bw):
                    _emit_ac_first(wtr, coefs[ci][by, bx], ss, se, al1)
            scans.append(sos_header([ci + 1], ss, se, 0, al1)
                         + wtr.flush())
    if successive:
        for ci in range(nc):
            bw, bh = comp_blocks(ci)
            for ss, se in bands:
                wtr = _BitWriter()
                for by in range(bh):
                    for bx in range(bw):
                        _emit_ac_refine(wtr, coefs[ci][by, bx], ss, se, 0)
                scans.append(sos_header([ci + 1], ss, se, 1, 0)
                             + wtr.flush())

    zz_quant = bytes(int(quant[r, c]) for (r, c) in ZIGZAG)
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_quant
    sof_comp = b"".join(
        bytes([i + 1, (samps[i][0] << 4) | samps[i][1], 0])
        for i in range(nc))
    sof = (b"\xff\xc2" + struct.pack(">H", 8 + 3 * nc) + b"\x08"
           + struct.pack(">HH", h, w) + bytes([nc]) + sof_comp)

    def dht(tc, th, counts, symbols):
        payload = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    dhts = dht(0, 0, _DC_COUNTS, _DC_SYMBOLS) \
        + dht(1, 0, _AC_COUNTS, _AC_SYMBOLS)
    return (b"\xff\xd8" + dqt + sof + dhts + b"".join(scans)
            + b"\xff\xd9")
