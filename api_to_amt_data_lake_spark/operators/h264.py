"""H.264/AVC Annex-B I-frame decode, pure Python — the video boundary
(`multimodal.py::_decode_pixels`) moved inward.

The multimodal contract treats video bitstreams as opaque binary until
a decoder exists; since r4 that boundary said "H.264 needs a codec
library". This module is a REAL H.264 decoder for the intra subset,
built from the public ITU-T H.264 / ISO 14496-10 spec (same playbook as
the pure-Python baseline+progressive JPEG decoder in `operators/
jpeg.py`):

- Annex-B framing: start-code scan (00 00 01 / 00 00 00 01) and
  emulation-prevention-byte removal (00 00 03 xx → 00 00 xx).
- RBSP bit reader with Exp-Golomb ue(v)/se(v).
- SPS parsing (baseline/main profile field set: frame size in
  macroblocks, frame cropping, POC type, frame_mbs_only).
- PPS parsing (CAVLC vs CABAC flag, deblocking-control flag, QP init).
- IDR/I slice header parsing.
- Macroblock decode for **I_PCM** macroblocks (mb_type 25): raw
  4:2:0 samples after pcm alignment — byte-exact luma/chroma.

Entropy-coded macroblocks (CAVLC residual, mb_type 0–24) and CABAC
slices raise a ValueError NAMING the remaining contract — the same
explicit-boundary policy as MP3/AAC in `operators/audio.py`, now one
layer deeper: container and bitstream structure parse for real, and
the boundary is precisely the arithmetic/VLC residual decode.

`encode_h264_ipcm` emits conformant baseline Annex-B streams (SPS +
PPS + one all-I_PCM IDR slice) so tests and conformance fixtures
exercise the decoder on valid bitstreams with pinned pixel output —
I_PCM is lossless by construction, so decode(encode(img)) == img
byte-for-byte, including emulation-prevention round-trips for
zero-valued samples.

Scale shape: decode runs inside the one Arrow-batched `mapInPandas`
pass `decode_image` already owns (`multimodal.py` dispatches on the
Annex-B start code) — embarrassingly parallel, zero shuffle, no new
Python hop.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Bit I/O


class _BitReader:
    """MSB-first bit reader over an RBSP (emulation bytes already
    stripped)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        if self.pos + n > 8 * len(self.data):
            raise ValueError("H.264 bitstream truncated mid-read")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("corrupt Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bytes_raw(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        start = self.pos >> 3
        if start + n > len(self.data):
            raise ValueError("H.264 bitstream truncated mid-read")
        self.pos += 8 * n
        return self.data[start:start + n]


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        code = v + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def byte_align_raw(self, data: bytes) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)
        for b in data:
            self.u(b, 8)

    def rbsp_trailing(self) -> None:
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)

    def rbsp(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i:i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


# ---------------------------------------------------------------------------
# NAL layer

def _ebsp_to_rbsp(data: bytes) -> bytes:
    """Strip emulation prevention: 00 00 03 → 00 00 (when followed by
    00/01/02/03)."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(data):
        b = data[i]
        if zeros >= 2 and b == 3 and i + 1 < len(data) and data[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _rbsp_to_ebsp(data: bytes) -> bytes:
    """Insert emulation prevention bytes."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def annexb_nals(b: bytes) -> list[tuple[int, int, bytes]]:
    """(nal_ref_idc, nal_unit_type, rbsp) per NAL unit in an Annex-B
    stream."""
    # Find start-code positions.
    starts = []
    i = 0
    n = len(b)
    while i + 2 < n:
        if b[i] == 0 and b[i + 1] == 0:
            if b[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i + 3 < n and b[i + 2] == 0 and b[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    if not starts:
        raise ValueError("no Annex-B start code in H.264 stream")
    nals = []
    for k, (sc, payload) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else n
        raw = b[payload:end]
        if not raw:
            continue
        hdr = raw[0]
        if hdr & 0x80:
            raise ValueError("forbidden_zero_bit set in NAL header")
        nals.append(((hdr >> 5) & 3, hdr & 0x1F, _ebsp_to_rbsp(raw[1:])))
    return nals


def sniff_annexb_codec(b: bytes) -> str:
    """Classify an Annex-B-framed stream by its NAL/start-code header
    bytes WITHOUT parsing payloads. The 00 00 01 / 00 00 00 01 framing
    is shared by H.264, H.265 and MPEG-2/MPEG-PS, so magic-byte
    dispatch alone would route foreign codecs into the H.264 parser
    and surface confusing internal errors ('no slice NAL unit',
    'forbidden_zero_bit') instead of the codec-boundary contract
    message. Returns 'h264', 'h265', 'mpeg2-ps', or 'unknown'.

    Heuristics over the first byte after each start code (first 8):
    - MPEG-2/PS start codes ARE that byte (0xB3 seq, 0xBA pack,
      0xE0-0xEF PES...) and mostly have the high bit set, which H.264's
      forbidden_zero_bit forbids → any high bit ⇒ mpeg2-ps.
    - H.265 NAL types live in bits 6..1 (VPS=32→0x40, SPS=33→0x42,
      PPS=34→0x44); read as H.264 those give nal_unit_type 0 or other
      invalid/reserved values → invalid-as-H.264 but valid-as-H.265
      ⇒ h265.
    - All headers valid H.264 (zero high bit, type 1..23) ⇒ h264.
    """
    hdrs = []
    i, n = 0, len(b)
    while i + 2 < n and len(hdrs) < 8:
        if b[i] == 0 and b[i + 1] == 0:
            if b[i + 2] == 1:
                if i + 3 < n:
                    hdrs.append(b[i + 3])
                i += 3
                continue
            if i + 3 < n and b[i + 2] == 0 and b[i + 3] == 1:
                if i + 4 < n:
                    hdrs.append(b[i + 4])
                i += 4
                continue
        i += 1
    if not hdrs:
        return "unknown"
    if any(h & 0x80 for h in hdrs):
        return "mpeg2-ps"
    bad_h264 = [h for h in hdrs if not 1 <= (h & 0x1F) <= 23]
    if not bad_h264:
        return "h264"
    if any((h >> 1) & 0x3F in (32, 33, 34) for h in bad_h264):
        return "h265"
    return "unknown"


# ---------------------------------------------------------------------------
# Parameter sets

def parse_sps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1  # 4:2:0 implied below high profiles
    bit_depth_luma = bit_depth_chroma = 8
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        bit_depth_luma = r.ue() + 8
        bit_depth_chroma = r.ue() + 8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            raise ValueError("H.264 scaling matrices not supported")
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc_lsb = 0
    poc_always_zero = 1
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        poc_always_zero = r.u(1)  # delta_pic_order_always_zero_flag
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    w_mbs = r.ue() + 1
    h_map = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        raise ValueError("interlaced (field-coded) H.264 not supported")
    r.u(1)  # direct_8x8_inference_flag
    crop = (0, 0, 0, 0)
    if r.u(1):  # frame_cropping_flag
        crop = (r.ue(), r.ue(), r.ue(), r.ue())
    if w_mbs * h_map > 1 << 22:
        # 4M macroblocks = a gigapixel frame; beyond any H.264 level.
        # Unvalidated, a ~20-byte hostile blob could demand a
        # multi-terabyte numpy allocation.
        raise ValueError(
            f"H.264 SPS declares {w_mbs}x{h_map} macroblocks — beyond "
            "any conformant level; refusing the allocation")
    width = 16 * w_mbs - 2 * (crop[0] + crop[1])
    height = 16 * h_map - 2 * (crop[2] + crop[3])
    if width <= 0 or height <= 0:
        raise ValueError(
            f"H.264 SPS frame cropping {crop} exceeds the "
            f"{16 * w_mbs}x{16 * h_map} coded frame")
    return {
        "sps_id": sps_id, "profile_idc": profile_idc,
        "level_idc": level_idc,
        "chroma_format_idc": chroma_format_idc,
        "bit_depth_luma": bit_depth_luma,
        "bit_depth_chroma": bit_depth_chroma,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type, "log2_max_poc_lsb": log2_max_poc_lsb,
        "poc_always_zero": poc_always_zero,
        "width_mbs": w_mbs, "height_mbs": h_map,
        "crop": crop,
        "width": width,
        "height": height,
    }


def parse_pps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    cabac = r.u(1)
    bottom_field_poc = r.u(1)
    if r.ue() != 0:  # num_slice_groups_minus1
        raise ValueError("H.264 slice groups (FMO) not supported")
    r.ue()  # num_ref_idx_l0_default_active_minus1
    r.ue()  # num_ref_idx_l1_default_active_minus1
    r.u(1)  # weighted_pred_flag
    r.u(2)  # weighted_bipred_idc
    init_qp = r.se() + 26
    r.se()  # pic_init_qs_minus26
    r.se()  # chroma_qp_index_offset
    deblock_ctrl = r.u(1)
    constrained_intra = r.u(1)
    redundant_pic = r.u(1)
    return {
        "pps_id": pps_id, "sps_id": sps_id, "cabac": cabac,
        "bottom_field_poc": bottom_field_poc, "init_qp": init_qp,
        "deblock_ctrl": deblock_ctrl,
        "constrained_intra": constrained_intra,
        "redundant_pic": redundant_pic,
    }


# ---------------------------------------------------------------------------
# Slice decode (I slices)

_I_SLICE_TYPES = (2, 7)  # I, I (all slices in picture)


def _parse_slice_header(r: _BitReader, sps_map: dict, pps_map: dict,
                        nal_type: int, nal_ref_idc: int) -> tuple:
    first_mb = r.ue()
    slice_type = r.ue()
    if slice_type not in _I_SLICE_TYPES:
        raise ValueError(
            f"H.264 slice_type {slice_type}: only intra (I) slices are "
            "decoded; P/B prediction needs reference-frame state")
    pps_id = r.ue()
    if pps_id not in pps_map:
        raise ValueError(f"H.264 slice references unknown PPS {pps_id}")
    pps = pps_map[pps_id]
    if pps["sps_id"] not in sps_map:
        raise ValueError(
            f"H.264 PPS {pps_id} references unknown SPS {pps['sps_id']}")
    sps = sps_map[pps["sps_id"]]
    r.u(sps["log2_max_frame_num"])  # frame_num
    if nal_type == 5:
        r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])
        if pps["bottom_field_poc"]:
            r.se()
    elif sps["poc_type"] == 1 and not sps["poc_always_zero"]:
        r.se()  # delta_pic_order_cnt[0]
        if pps["bottom_field_poc"]:
            r.se()  # delta_pic_order_cnt[1]
    if pps["redundant_pic"]:
        r.ue()
    if nal_ref_idc != 0:  # dec_ref_pic_marking
        if nal_type == 5:
            r.u(1)  # no_output_of_prior_pics_flag
            r.u(1)  # long_term_reference_flag
        elif r.u(1):  # adaptive_ref_pic_marking_mode_flag
            raise ValueError(
                "H.264 adaptive reference-picture marking (memory "
                "management control ops) not supported in a non-IDR "
                "reference slice")
    slice_qp = pps["init_qp"] + r.se()
    if pps["deblock_ctrl"]:
        if r.ue() != 1:  # disable_deblocking_filter_idc
            r.se()
            r.se()
    return ({"first_mb": first_mb, "slice_type": slice_type,
             "slice_qp": slice_qp}, sps, pps)


def decode_h264_iframe(b: bytes) -> tuple[int, int, int, bytes]:
    """Decode the first I frame of an Annex-B H.264 stream to grayscale
    luma pixels: (width, height, 1, y_plane) — the `_decode_pixels`
    contract. I_PCM macroblocks decode byte-exact; entropy-coded
    macroblocks are the named remaining boundary."""
    sps_map: dict[int, dict] = {}
    pps_map: dict[int, dict] = {}
    for ref_idc, nal_type, rbsp in annexb_nals(b):
        if nal_type == 7:
            sps = parse_sps(rbsp)
            sps_map[sps["sps_id"]] = sps
        elif nal_type == 8:
            pps = parse_pps(rbsp)
            pps_map[pps["pps_id"]] = pps
        elif nal_type in (1, 5):
            if not sps_map or not pps_map:
                raise ValueError("H.264 slice before SPS/PPS")
            r = _BitReader(rbsp)
            # The slice's pps_id selects its PPS, whose sps_id selects
            # the SPS — multi-parameter-set streams resolve to the
            # RIGHT geometry, never the last-seen one.
            hdr, sps, pps = _parse_slice_header(r, sps_map, pps_map,
                                                nal_type, ref_idc)
            if pps["cabac"]:
                raise ValueError(
                    "H.264 CABAC entropy coding not supported; "
                    "re-encode with CAVLC (entropy_coding_mode_flag=0)")
            if hdr["first_mb"] != 0:
                raise ValueError(
                    "H.264 multi-slice pictures not supported: "
                    f"slice starts at macroblock {hdr['first_mb']}")
            return _decode_i_slice(r, sps)
    raise ValueError("H.264 stream contains no slice NAL unit")


def _more_rbsp_data(r: _BitReader) -> bool:
    """True while bits remain before the rbsp_stop_bit (the LAST set
    bit in the RBSP, per the spec's more_rbsp_data())."""
    i = len(r.data) - 1
    while i >= 0 and r.data[i] == 0:
        i -= 1
    if i < 0:
        return False
    b = r.data[i]
    low = (b & -b).bit_length() - 1  # lowest set bit index
    stop = 8 * i + (7 - low)  # bit position of the stop bit
    return r.pos < stop


def _decode_i_slice(r: _BitReader, sps: dict) -> tuple[int, int, int, bytes]:
    if sps["bit_depth_luma"] != 8 or sps["bit_depth_chroma"] != 8:
        # I_PCM payload is BitDepth bits per sample; the reads below
        # hardcode 8-bit strides.
        raise ValueError(
            f"H.264 bit depth {sps['bit_depth_luma']}/"
            f"{sps['bit_depth_chroma']}: only 8-bit streams are decoded")
    if sps["chroma_format_idc"] != 1:
        # I_PCM payload size and crop units below assume 4:2:0; 4:4:4 /
        # 4:2:2 / monochrome would mis-stride every macroblock.
        raise ValueError(
            f"H.264 chroma_format_idc {sps['chroma_format_idc']}: only "
            "4:2:0 streams are decoded")
    w_mbs, h_mbs = sps["width_mbs"], sps["height_mbs"]
    y = np.zeros((16 * h_mbs, 16 * w_mbs), dtype=np.uint8)
    for mb in range(w_mbs * h_mbs):
        if not _more_rbsp_data(r):
            # Slice data ended (only the rbsp stop bit remains) before
            # covering the picture: the frame is split across slices.
            raise ValueError(
                "H.264 multi-slice pictures not supported: slice data "
                f"ended after {mb} of {w_mbs * h_mbs} macroblocks")
        mb_type = r.ue()
        if mb_type != 25:  # not I_PCM
            raise ValueError(
                f"H.264 mb_type {mb_type}: CAVLC residual decode "
                "(Intra_4x4/Intra_16x16 coded macroblocks) is the "
                "remaining boundary; I_PCM macroblocks decode for real")
        r.byte_align()  # pcm_alignment_zero_bit
        my, mx = 16 * (mb // w_mbs), 16 * (mb % w_mbs)
        luma = np.frombuffer(r.bytes_raw(256), dtype=np.uint8)
        y[my:my + 16, mx:mx + 16] = luma.reshape(16, 16)
        r.bytes_raw(128)  # chroma Cb + Cr (4:2:0), not returned
    left, right, top, bottom = sps["crop"]
    y = y[2 * top: 16 * h_mbs - 2 * bottom,
          2 * left: 16 * w_mbs - 2 * right]
    return sps["width"], sps["height"], 1, y.tobytes()


# ---------------------------------------------------------------------------
# Fixture encoder

def _nal(ref_idc: int, nal_type: int, rbsp: bytes) -> bytes:
    return (b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | nal_type])
            + _rbsp_to_ebsp(rbsp))


def encode_h264_ipcm(gray: np.ndarray) -> bytes:
    """Conformant baseline Annex-B stream (SPS + PPS + one IDR slice of
    all-I_PCM macroblocks) carrying `gray` as the luma plane (chroma =
    constant 128). Dimensions may be any size; macroblock padding is
    declared via frame cropping. Lossless: decode_h264_iframe returns
    the exact input bytes."""
    h, w = gray.shape
    w_mbs, h_mbs = -(-w // 16), -(-h // 16)
    crop_r, crop_b = (16 * w_mbs - w), (16 * h_mbs - h)
    if crop_r % 2 or crop_b % 2:
        raise ValueError("H.264 4:2:0 frame cropping is in units of 2 "
                         f"samples; pad to even dimensions, got {w}x{h}")
    padded = np.full((16 * h_mbs, 16 * w_mbs), 0, dtype=np.uint8)
    padded[:h, :w] = gray

    sps = _BitWriter()
    sps.u(66, 8)        # profile_idc: baseline
    sps.u(0, 8)         # constraint flags
    sps.u(30, 8)        # level 3.0
    sps.ue(0)           # sps_id
    sps.ue(0)           # log2_max_frame_num_minus4
    sps.ue(2)           # pic_order_cnt_type 2 (display order = decode)
    sps.ue(1)           # max_num_ref_frames
    sps.u(0, 1)         # gaps_in_frame_num_value_allowed_flag
    sps.ue(w_mbs - 1)
    sps.ue(h_mbs - 1)
    sps.u(1, 1)         # frame_mbs_only_flag
    sps.u(0, 1)         # direct_8x8_inference_flag
    if crop_r or crop_b:
        sps.u(1, 1)
        sps.ue(0)
        sps.ue(crop_r // 2)
        sps.ue(0)
        sps.ue(crop_b // 2)
    else:
        sps.u(0, 1)
    sps.u(0, 1)         # vui_parameters_present_flag
    sps.rbsp_trailing()

    pps = _BitWriter()
    pps.ue(0)           # pps_id
    pps.ue(0)           # sps_id
    pps.u(0, 1)         # entropy_coding_mode_flag: CAVLC
    pps.u(0, 1)         # bottom_field_pic_order_in_frame_present_flag
    pps.ue(0)           # num_slice_groups_minus1
    pps.ue(0)           # num_ref_idx_l0_default_active_minus1
    pps.ue(0)           # num_ref_idx_l1_default_active_minus1
    pps.u(0, 1)         # weighted_pred_flag
    pps.u(0, 2)         # weighted_bipred_idc
    pps.se(0)           # pic_init_qp_minus26
    pps.se(0)           # pic_init_qs_minus26
    pps.se(0)           # chroma_qp_index_offset
    pps.u(1, 1)         # deblocking_filter_control_present_flag
    pps.u(0, 1)         # constrained_intra_pred_flag
    pps.u(0, 1)         # redundant_pic_cnt_present_flag
    pps.rbsp_trailing()

    sl = _BitWriter()
    sl.ue(0)            # first_mb_in_slice
    sl.ue(7)            # slice_type: I (all slices)
    sl.ue(0)            # pps_id
    sl.u(0, 4)          # frame_num
    sl.ue(0)            # idr_pic_id
    sl.u(1, 1)          # no_output_of_prior_pics_flag
    sl.u(1, 1)          # long_term_reference_flag
    sl.se(0)            # slice_qp_delta
    sl.ue(1)            # disable_deblocking_filter_idc: off
    for mb in range(w_mbs * h_mbs):
        my, mx = 16 * (mb // w_mbs), 16 * (mb % w_mbs)
        sl.ue(25)       # mb_type: I_PCM
        sl.byte_align_raw(
            padded[my:my + 16, mx:mx + 16].tobytes()
            + b"\x80" * 128)  # chroma Cb + Cr at mid-gray
    sl.rbsp_trailing()

    return (_nal(3, 7, sps.rbsp()) + _nal(3, 8, pps.rbsp())
            + _nal(3, 5, sl.rbsp()))
