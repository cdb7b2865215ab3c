"""Motion-JPEG in AVI and MP4 containers — pure stdlib/numpy, written from
the public specs (ITU-T T.81 baseline JPEG: DQT/DHT/SOF0/SOS marker
segments, Annex K tables, Annex F entropy coding; Microsoft RIFF/AVI
container layout; ISO/IEC 14496-12 box structure + sample tables).

This is the realistically implementable step up from Y4M for the video
branch of ``SampleFrames`` (functions/multimodal.py): an AVI or MP4 whose
frames are baseline JPEGs decodes for real — RIFF ``movi`` walk or ISO-BMFF
stbl sample-table walk, per-frame Huffman decode, dequantize, IDCT, luma
plane out. Compressed inter-frame codecs (H.264 &c.) remain a strict-raise
stub — no stdlib entropy/bitstream machinery exists for them.

Scope, stated honestly:
- decode: baseline sequential DCT (SOF0), 8-bit, any number of components /
  sampling factors. The cheap path (``decode_baseline_jpeg_luma`` — what the
  video feature stage uses) reconstructs ONLY the luma plane (chroma
  coefficients are entropy-decoded to keep stream position, then dropped);
  ``decode_baseline_jpeg_rgb`` reconstructs every component, nearest-
  upsamples subsampled chroma and converts JFIF YCbCr → RGB. Progressive
  (SOF2) and arithmetic coding raise.
- encode (fixture writers): grayscale baseline, and interleaved YCbCr color
  at 4:2:0 or 4:4:4 (Annex K.1/K.2 quant tables quality-scaled, the four
  Annex K.3 standard Huffman tables) — the 4:2:0 writer is what exercises
  the decoder's multi-block MCU walk against real camera-style streams.
- container: RIFF AVI with ``movi`` ``00dc``/``00db`` frame chunks (also
  inside ``rec `` lists); the writer emits plausible ``hdrl`` headers. MP4:
  box-tree walk with stsc/stsz/stco(co64) sample placement — the sample
  tables ARE the frame index, so frames slice straight out of ``mdat``
  without scanning it; the writer emits a one-sample-per-chunk layout with
  a trailing ``moov`` so offsets never depend on moov size.

The decoder reads its quant/Huffman tables from the stream (DQT/DHT), not
from the writer's constants, so decode is exercised against real bytes the
same way sources/rdb.py and the PNG codec are.

SCALE NOTE: the entropy decode is a sequential bit-walk per frame (Huffman
is inherently serial within a scan); parallelism comes from the actor-pool
stage decoding many frames/payloads concurrently (SampleFrames — one task
per small batch of binary rows), which is the unit that matters at corpus
scale. IDCT/dequant are vectorized per block, and chroma blocks skip both.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- constants

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1 luminance quantization table (NATURAL row-major order, as
# printed in the spec; the DQT wire payload is zigzag-serialized from it)
STD_LUM_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

# Annex K.2 chrominance quantization table (natural order, like K.1 above)
STD_CHROM_QUANT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 standard Huffman tables (luminance)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


# Annex K.3 standard Huffman tables (chrominance) — used ONLY as the
# default-table fallback below (real-world MJPEG frames often omit DHT and
# rely on the Annex K defaults, per the de-facto AVI MJPEG convention)
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    t = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) * 0.5
    t[0, :] *= 1 / np.sqrt(2)
    return t


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """{symbol: (code, length)} for canonical JPEG Huffman tables."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict:
    """{(length, code): symbol} for the bit-serial decoder."""
    enc = _canonical_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


def scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg's public jpeg_quality_scaling curve)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


# ------------------------------------------------------------ bit stream

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)       # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # 1-fill to byte boundary
        return bytes(self.out)


class _BitReader:
    """Reads the entropy-coded segment: 0xFF00 unstuffed to 0xFF; any other
    0xFF-marker ends the segment (RSTn are handled by the caller via
    align+skip)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("jpeg: marker inside entropy segment")
        else:
            self.pos += 1
        # mask to the live window — without it acc accumulates every byte
        # ever read as one growing bigint and the decode turns quadratic
        # (512px frame: 38 s unmasked, 0.5 s masked)
        self.acc = (((self.acc << 8) | b)
                    & ((1 << (self.nbits + 8)) - 1))
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_and_skip_rst(self) -> None:
        self.acc = 0
        self.nbits = 0
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _huff_decode(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


# ---------------------------------------------------------------- decode

def decode_baseline_jpeg_luma(data: bytes) -> np.ndarray:
    """Baseline JPEG → luma plane, uint8 (h, w). Chroma components are
    entropy-decoded (stream position) and discarded — the cheap path the
    feature stages use."""
    return _decode_baseline(data, color=False)


def decode_baseline_jpeg_rgb(data: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 (h, w, 3) RGB. All components are dequantized
    and IDCT'd; subsampled chroma planes are nearest-upsampled to full
    resolution and converted per the JFIF full-range YCbCr matrix. A
    grayscale stream comes back with the gray plane replicated; component
    counts other than 1/3 (e.g. Adobe CMYK) raise NotImplementedError."""
    return _decode_baseline(data, color=True)


def _decode_baseline(data: bytes, color: bool) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart = 0
    i = 2
    while True:
        if data[i] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {i}")
        m = data[i + 1]
        i += 2
        if m == 0xD9:                      # EOI
            raise ValueError("jpeg: EOI before SOS")
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue                       # parameterless
        ln = struct.unpack(">H", data[i:i + 2])[0]
        seg = data[i + 2:i + ln]
        if m == 0xDB:                      # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tab = np.frombuffer(seg[p:p + 64], np.uint8).astype(np.int64)
                    p += 64
                else:
                    tab = np.frombuffer(seg[p:p + 128], ">u2").astype(np.int64)
                    p += 128
                nat = np.zeros(64, np.int64)
                nat[ZIGZAG] = tab
                qt[tq] = nat.reshape(8, 8)
        elif m == 0xC0 or m == 0xC1:       # SOF0/1 (baseline / ext. seq.)
            h, w = struct.unpack(">HH", seg[1:5])
            for c in range(seg[5]):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise NotImplementedError("jpeg: only baseline (SOF0) supported")
        elif m == 0xC4:                    # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(bits, vals)
                p += 17 + n
        elif m == 0xDD:                    # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:                    # SOS
            scan = []
            for c in range(seg[0]):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next((x for x in comps if x["id"] == cid), None)
                if comp is None:
                    raise ValueError(
                        f"jpeg: SOS component id {cid} not declared in SOF")
                scan.append({**comp, "dc": tabs >> 4, "ac": tabs & 0xF})
            # default-table fallback: real-world MJPEG frames commonly omit
            # DHT and rely on the Annex K standard tables (the de-facto AVI
            # MJPEG convention: table 0 = luminance, table 1 = chrominance)
            for c in scan:
                if c["dc"] not in dc_tabs:
                    dc_tabs[c["dc"]] = _decode_table(
                        *((DC_LUM_BITS, DC_LUM_VALS) if c["dc"] == 0
                          else (DC_CHROM_BITS, DC_CHROM_VALS)))
                if c["ac"] not in ac_tabs:
                    ac_tabs[c["ac"]] = _decode_table(
                        *((AC_LUM_BITS, AC_LUM_VALS) if c["ac"] == 0
                          else (AC_CHROM_BITS, AC_CHROM_VALS)))
            i += ln
            break
        i += ln

    if not comps or h == 0 or w == 0:
        raise ValueError("jpeg: no frame header")
    if color and len(scan) not in (1, 3):
        raise NotImplementedError(
            f"jpeg: {len(scan)}-component color decode unsupported "
            "(grayscale and YCbCr only)")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(scan) == 1:
        # T.81 A.2.2: a non-interleaved (Ns=1) scan has ONE 8x8 data unit
        # per MCU, walked in raster order over the component's own block
        # grid — its declared sampling factors shape only its sample
        # dimensions, never the MCU (a grayscale frame declaring 2x2 is
        # legal and must not be walked as 4-block MCUs)
        cw = -(-(w * scan[0]["h"]) // hmax)
        ch = -(-(h * scan[0]["v"]) // vmax)
        mcux, mcuy = -(-cw // 8), -(-ch // 8)
        walk = [{**scan[0], "h": 1, "v": 1}]
    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        walk = scan
    luma = walk[0]                          # first scan component = Y
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in walk if color or c is luma}
    plane = planes[luma["id"]]

    r = _BitReader(data, i)
    pred = {c["id"]: 0 for c in scan}
    idct_t = _DCT.T

    def decode_block(c, want_pixels: bool) -> np.ndarray | None:
        sym = _huff_decode(r, dc_tabs[c["dc"]])
        diff = _extend(r.bits(sym), sym) if sym else 0
        pred[c["id"]] += diff
        coef = np.zeros(64, np.int64)
        coef[0] = pred[c["id"]]
        k = 1
        while k < 64:
            rs = _huff_decode(r, ac_tabs[c["ac"]])
            run, size = rs >> 4, rs & 0xF
            if size == 0:
                if run == 15:
                    k += 16
                    continue
                break                       # EOB
            k += run
            if k > 63:
                raise ValueError("jpeg: AC index overflow")
            coef[k] = _extend(r.bits(size), size)
            k += 1
        if not want_pixels:
            return None     # chroma: entropy decode keeps stream position,
                            # dequant/IDCT would be thrown away
        nat = np.zeros(64, np.float64)
        nat[ZIGZAG] = coef
        return idct_t @ (nat.reshape(8, 8) * qt[c["tq"]]) @ _DCT

    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                r.align_and_skip_rst()
                for cid in pred:
                    pred[cid] = 0
            try:
                for c in walk:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            blk = decode_block(
                                c, want_pixels=color or c is luma)
                            if blk is not None:
                                y0 = (my * c["v"] + v) * 8
                                x0 = (mx * c["h"] + hh) * 8
                                planes[c["id"]][y0:y0 + 8,
                                                x0:x0 + 8] = blk
            except _RestartMarker:
                raise ValueError("jpeg: unexpected restart marker")
            n_mcu += 1
    if not color:
        return np.clip(plane[:h, :w] + 128, 0, 255).astype(np.uint8)

    # nearest-upsample every component to full resolution (general integer
    # floor map, so non-divisible sampling factor combos also place right)
    full = []
    for c in scan:
        p = planes[c["id"]]
        rows = (np.arange(h, dtype=np.int64) * c["v"]) // vmax
        cols = (np.arange(w, dtype=np.int64) * c["h"]) // hmax
        full.append(p[rows[:, None], cols[None, :]] + 128.0)
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(rgb, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode

def _size_of(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(blk: np.ndarray, qmat: np.ndarray, dc_enc: dict,
                  ac_enc: dict, bw: _BitWriter, pred: int) -> int:
    """Forward-DCT, quantize and entropy-code one 8×8 block (level-shifted
    float input); returns the new DC predictor."""
    coef = np.round((_DCT @ blk @ _DCT.T) / qmat).astype(np.int64)
    zz = coef.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    t = _size_of(diff)
    code, ln = dc_enc[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    nz = np.flatnonzero(zz[1:]) + 1
    last = nz[-1] if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            bw.write(code, ln)
            run -= 16
        t = _size_of(v)
        code, ln = ac_enc[(run << 4) | t]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << t) - 1, t)
        run = 0
    if last < 63:
        code, ln = ac_enc[0x00]             # EOB
        bw.write(code, ln)
    return pred


def encode_baseline_jpeg_gray(img: np.ndarray, quality: int = 85) -> bytes:
    """uint8 (h, w) → grayscale baseline JPEG (fixture writer)."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape
    q = scale_quant(STD_LUM_QUANT, quality)     # natural (row-major) order
    qmat = q.reshape(8, 8)
    dqt_payload = q[ZIGZAG]                     # DQT wire form is zigzag

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img.astype(np.float64) - 128,
                    ((0, ph - h), (0, pw - w)), mode="edge")
    dc_enc = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_enc = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    pred = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            pred = _encode_block(padded[by:by + 8, bx:bx + 8], qmat,
                                 dc_enc, ac_enc, bw, pred)
    entropy = bw.flush()

    out = bytearray(b"\xff\xd8")            # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"      # DQT, pq=0 tq=0
    out += bytes(int(x) for x in dqt_payload)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)  # SOF0, 1 comp
    out += bytes([1, 0x11, 0])              # id=1, 1x1 sampling, qtable 0
    for tc, bits, vals in ((0, DC_LUM_BITS, DC_LUM_VALS),
                           (1, AC_LUM_BITS, AC_LUM_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([tc << 4]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    out += entropy + b"\xff\xd9"            # EOI
    return bytes(out)


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """uint8 (h, w, 3) RGB → float64 (h, w, 3) JFIF full-range YCbCr."""
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    return np.stack([0.299 * r + 0.587 * g + 0.114 * b,
                     128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                     128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b], axis=2)


def encode_baseline_jpeg_color(img: np.ndarray, quality: int = 85,
                               subsampling: str = "4:2:0") -> bytes:
    """uint8 (h, w, 3) RGB → interleaved YCbCr baseline JPEG. ``4:2:0``
    (Y sampled 2×2, chroma box-averaged 2:1 both ways — the dominant wire
    layout, and the one that actually exercises a decoder's multi-block MCU
    walk) or ``4:4:4`` (no subsampling). Two quant tables (Annex K.1 lum /
    K.2 chrom, quality-scaled) and the four Annex K.3 Huffman tables, like
    every camera MJPEG stream."""
    img = np.asarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("color encoder wants (h, w, 3) RGB")
    if subsampling not in ("4:2:0", "4:4:4"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    cs = 2 if subsampling == "4:2:0" else 1     # luma sampling factor
    h, w = img.shape[:2]
    mcu = 8 * cs
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    ycc = np.pad(rgb_to_ycbcr(img) - 128.0,
                 ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    y = ycc[:, :, 0]
    if cs == 2:                                 # 2×2 box-average chroma
        chroma = [c.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                  for c in (ycc[:, :, 1], ycc[:, :, 2])]
    else:
        chroma = [ycc[:, :, 1], ycc[:, :, 2]]

    ql = scale_quant(STD_LUM_QUANT, quality)
    qc = scale_quant(STD_CHROM_QUANT, quality)
    qlm, qcm = ql.reshape(8, 8), qc.reshape(8, 8)
    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(0, ph, mcu):
        for mx in range(0, pw, mcu):
            for v in range(cs):                 # Y blocks, row-major
                for hh in range(cs):
                    y0, x0 = my + 8 * v, mx + 8 * hh
                    preds[0] = _encode_block(y[y0:y0 + 8, x0:x0 + 8], qlm,
                                             dc_l, ac_l, bw, preds[0])
            cy, cx = my // cs, mx // cs
            for ci, cp in enumerate(chroma):
                preds[ci + 1] = _encode_block(
                    cp[cy:cy + 8, cx:cx + 8], qcm, dc_c, ac_c, bw,
                    preds[ci + 1])
    entropy = bw.flush()

    out = bytearray(b"\xff\xd8")                # SOI
    for tq, q in ((0, ql), (1, qc)):            # DQT ×2
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(x) for x in q[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF0
    samp = (cs << 4) | cs
    out += bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1])
    for tc_th, bits, vals in ((0x00, DC_LUM_BITS, DC_LUM_VALS),
                              (0x10, AC_LUM_BITS, AC_LUM_VALS),
                              (0x01, DC_CHROM_BITS, DC_CHROM_VALS),
                              (0x11, AC_CHROM_BITS, AC_CHROM_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += entropy + b"\xff\xd9"                # EOI
    return bytes(out)


# ------------------------------------------------------------ AVI (RIFF)

def _riff_chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _riff_list(listtype: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", listtype + payload)


def encode_avi_mjpeg(jpeg_frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """Minimal but well-formed MJPEG AVI: hdrl (avih + one vids stream with
    fourcc MJPG) + movi with one 00dc chunk per frame."""
    usec = 1_000_000 // max(1, fps)
    maxbytes = max((len(j) for j in jpeg_frames), default=0)
    avih = struct.pack("<14I", usec, maxbytes * fps, 0, 0x10,  # HASINDEX-less
                       len(jpeg_frames), 0, 1, maxbytes, width, height,
                       0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<I", 0)
            + struct.pack("<HHI", 0, 0, 0)
            + struct.pack("<5I", 1, fps, 0, len(jpeg_frames), maxbytes)
            + struct.pack("<iI", -1, 0) + struct.pack("<4H", 0, 0,
                                                      width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    strl = _riff_list(b"strl", _riff_chunk(b"strh", strh)
                      + _riff_chunk(b"strf", strf))
    hdrl = _riff_list(b"hdrl", _riff_chunk(b"avih", avih) + strl)
    movi = _riff_list(b"movi",
                      b"".join(_riff_chunk(b"00dc", j) for j in jpeg_frames))
    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi)


def is_avi(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"AVI "


def avi_frame_chunks(data: bytes) -> list[bytes]:
    """Walk the RIFF tree and return every video frame payload
    (``..dc``/``..db`` chunks inside ``movi``, descending into ``rec ``)."""
    if not is_avi(data):
        raise ValueError("avi: not a RIFF AVI")
    frames: list[bytes] = []

    def walk(lo: int, hi: int, in_movi: bool) -> None:
        pos = lo
        while pos + 8 <= hi:
            fourcc = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_lo = pos + 8
            body_hi = min(body_lo + size, hi)
            if fourcc in (b"LIST", b"RIFF"):
                listtype = data[body_lo:body_lo + 4]
                walk(body_lo + 4, body_hi,
                     in_movi or listtype in (b"movi", b"rec "))
            elif in_movi and fourcc[2:4] in (b"dc", b"db"):
                frames.append(data[body_lo:body_hi])
            pos = body_lo + size + (size & 1)

    walk(12, len(data), False)
    return frames


def decode_avi_mjpeg_frame(chunk: bytes) -> np.ndarray:
    """One movi frame chunk → luma plane. Non-JPEG payloads (a non-MJPEG
    AVI) raise NotImplementedError — the caller's strict/stub split decides
    what to do with that."""
    if chunk[:2] != b"\xff\xd8":
        raise NotImplementedError("avi: frame is not a baseline JPEG "
                                  "(non-MJPEG codecs unsupported)")
    return decode_baseline_jpeg_luma(chunk)


# ------------------------------------------------------------ MP4 (ISO BMFF)
# Written from the public ISO/IEC 14496-12 base-media-file-format spec: a
# box tree (size + fourcc), sample tables under moov/trak/mdia/minf/stbl
# (stsd codec entry, stsz sample sizes, stsc sample-to-chunk runs, stco /
# co64 chunk offsets). Motion-JPEG rides in MP4 as a 'jpeg' (or 'mjpa' /
# 'AVDJ') VisualSampleEntry whose samples are plain JPEG codestreams, so the
# same baseline decoder serves both containers. Compressed sample entries
# ('avc1' &c.) raise NotImplementedError — same honest limit as AVI.

_MP4_JPEG_ENTRIES = (b"jpeg", b"mjpa", b"mjpb", b"AVDJ", b"avdj", b"MJPG")


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _fullbox(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + payload)


def encode_mp4_mjpeg(jpeg_frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """Minimal but well-formed MJPEG MP4: ftyp + mdat (samples back to back)
    + trailing moov whose stbl places one sample per chunk. mdat precedes
    moov so stco offsets depend only on the fixed-size prefix."""
    fps = max(1, fps)
    n = len(jpeg_frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(jpeg_frames))
    sizes = [len(j) for j in jpeg_frames]
    offs, pos = [], len(ftyp) + 8
    for s in sizes:
        offs.append(pos)
        pos += s

    mvhd = _fullbox(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, 1000, n * 1000 // fps)
        + struct.pack(">iH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _fullbox(b"tkhd", 0, 3, struct.pack(
        ">IIIII", 0, 0, 1, 0, n * 1000 // fps) + b"\x00" * 16
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _fullbox(b"mdhd", 0, 0,
                    struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0))
    hdlr = _fullbox(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                    + b"VideoHandler\x00")
    # 'jpeg' VisualSampleEntry (14496-12 §12.1.3): reserved+dref index, then
    # dimensions, 72 dpi, frame_count 1, 32-byte compressorname, depth 24
    entry = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
             + struct.pack(">HH", width, height)
             + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
             + bytes([5]) + b"mjpeg" + b"\x00" * 26
             + struct.pack(">Hh", 24, -1))
    stsd = _fullbox(b"stsd", 0, 0,
                    struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _fullbox(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _fullbox(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _fullbox(b"stsz", 0, 0, struct.pack(">II", 0, n)
                    + struct.pack(f">{n}I", *sizes))
    stco = _fullbox(b"stco", 0, 0, struct.pack(">I", n)
                    + struct.pack(f">{n}I", *offs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = _box(b"dinf", _fullbox(b"dref", 0, 0, struct.pack(">I", 1)
                                  + _fullbox(b"url ", 0, 1, b"")))
    vmhd = _fullbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _mp4_children(data: bytes, lo: int, hi: int):
    """Yield (fourcc, body_lo, body_hi) for each box in [lo, hi); handles
    64-bit largesize (size==1) and to-end-of-enclosing (size==0)."""
    pos = lo
    while pos + 8 <= hi:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4:pos + 8]
        body_lo = pos + 8
        if size == 1:
            if pos + 16 > hi:
                raise ValueError("mp4: truncated largesize box header")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body_lo = pos + 16
        end = hi if size == 0 else pos + size
        if end < body_lo or end > hi:
            raise ValueError(f"mp4: box {fourcc!r} overruns its parent")
        yield fourcc, body_lo, end
        if size == 0:
            break
        pos = end


def _mp4_find(data: bytes, lo: int, hi: int, path: tuple[bytes, ...]):
    """Descend a fourcc path; returns (body_lo, body_hi) of the first match
    or None."""
    if not path:
        return lo, hi
    for fourcc, blo, bhi in _mp4_children(data, lo, hi):
        if fourcc == path[0]:
            return _mp4_find(data, blo, bhi, path[1:])
    return None


def mp4_frame_chunks(data: bytes) -> list[bytes]:
    """Walk the box tree of an MJPEG MP4 and return every video sample's
    bytes, in track order — the stbl sample tables (stsc runs × stco chunk
    offsets × stsz sizes) ARE the frame index, so no mdat scan is needed.
    Non-JPEG sample entries raise NotImplementedError; a structurally
    broken tree raises ValueError."""
    if not is_mp4(data):
        raise ValueError("mp4: no ftyp box")
    moov = _mp4_find(data, 0, len(data), (b"moov",))
    if moov is None:
        raise ValueError("mp4: no moov box")
    for fourcc, tlo, thi in _mp4_children(data, *moov):
        if fourcc != b"trak":
            continue
        hdlr = _mp4_find(data, tlo, thi, (b"mdia", b"hdlr"))
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        stbl = _mp4_find(data, tlo, thi, (b"mdia", b"minf", b"stbl"))
        if stbl is None:
            raise ValueError("mp4: video trak has no stbl")
        boxes = {f: (lo, hi) for f, lo, hi in _mp4_children(data, *stbl)}

        lo, hi = boxes[b"stsd"]
        entries = list(_mp4_children(data, lo + 8, hi))
        if not entries:
            raise ValueError("mp4: empty stsd")
        codec = entries[0][0]
        if codec not in _MP4_JPEG_ENTRIES:
            raise NotImplementedError(
                f"mp4: sample entry {codec!r} unsupported (MJPEG only)")

        lo, hi = boxes[b"stsz"]
        fixed, count = struct.unpack_from(">II", data, lo + 4)
        if fixed:
            sizes = [fixed] * count
        else:
            sizes = list(struct.unpack_from(f">{count}I", data, lo + 12))

        if b"stco" in boxes:
            lo, hi = boxes[b"stco"]
            (nch,) = struct.unpack_from(">I", data, lo + 4)
            chunk_offs = struct.unpack_from(f">{nch}I", data, lo + 8)
        elif b"co64" in boxes:
            lo, hi = boxes[b"co64"]
            (nch,) = struct.unpack_from(">I", data, lo + 4)
            chunk_offs = struct.unpack_from(f">{nch}Q", data, lo + 8)
        else:
            raise ValueError("mp4: no stco/co64")

        lo, hi = boxes[b"stsc"]
        (nruns,) = struct.unpack_from(">I", data, lo + 4)
        runs = [struct.unpack_from(">III", data, lo + 8 + 12 * i)
                for i in range(nruns)]

        # expand stsc runs → samples-per-chunk for each chunk, slice samples
        frames: list[bytes] = []
        si = 0
        for ri, (first, per_chunk, _desc) in enumerate(runs):
            last = (runs[ri + 1][0] - 1) if ri + 1 < len(runs) else nch
            for ci in range(first - 1, last):
                pos = chunk_offs[ci]
                for _ in range(per_chunk):
                    if si >= count:
                        break
                    frames.append(bytes(data[pos:pos + sizes[si]]))
                    pos += sizes[si]
                    si += 1
        if si != count:
            raise ValueError(f"mp4: sample tables inconsistent "
                             f"({si} placed of {count})")
        return frames
    raise ValueError("mp4: no video track")


# ---------------------------------------------------------- MKV (Matroska)
# Written from the public Matroska/EBML specs (RFC 8794 EBML structure;
# matroska.org element registry): elements are (id, size-vint, payload),
# the video track is a Segment>Tracks>TrackEntry with CodecID "V_MJPEG",
# and frames ride Cluster>SimpleBlock (or BlockGroup>Block) payloads as
# plain JPEG codestreams after a track-number vint, a 2-byte relative
# timestamp and a flags byte. Inter-frame codecs ("V_MPEG4/ISO/AVC" &c.)
# raise NotImplementedError — same honest limit as AVI/MP4; lacing is a
# structural ValueError (a V_MJPEG muxer has no reason to lace).

_MKV_EBML = b"\x1a\x45\xdf\xa3"
_MKV_SEGMENT = b"\x18\x53\x80\x67"
_MKV_TRACKS = b"\x16\x54\xae\x6b"
_MKV_CLUSTER = b"\x1f\x43\xb6\x75"


def _ebml_vint(v: int) -> bytes:
    """Size vint: smallest width where ``v`` is below the reserved
    all-ones (unknown-size) value."""
    for n in range(1, 9):
        if v < (1 << (7 * n)) - 1:
            return ((1 << (7 * n)) | v).to_bytes(n, "big")
    raise ValueError(f"ebml: size {v} unencodable")


def _ebml(eid: bytes, payload: bytes) -> bytes:
    return eid + _ebml_vint(len(payload)) + payload


def _ebml_uint(eid: bytes, v: int) -> bytes:
    return _ebml(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def encode_mkv_mjpeg(jpeg_frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """Minimal but well-formed MJPEG Matroska: EBML header (DocType
    matroska), one Segment holding Info (1 ms timestamp scale), a V_MJPEG
    video TrackEntry, and one Cluster per frame whose SimpleBlock carries
    the JPEG codestream (keyframe flag, no lacing)."""
    fps = max(1, fps)
    head = _ebml(_MKV_EBML,
                 _ebml_uint(b"\x42\x86", 1)        # EBMLVersion
                 + _ebml_uint(b"\x42\xf7", 1)      # EBMLReadVersion
                 + _ebml_uint(b"\x42\xf2", 4)      # EBMLMaxIDLength
                 + _ebml_uint(b"\x42\xf3", 8)      # EBMLMaxSizeLength
                 + _ebml(b"\x42\x82", b"matroska")
                 + _ebml_uint(b"\x42\x87", 4)      # DocTypeVersion
                 + _ebml_uint(b"\x42\x85", 2))     # DocTypeReadVersion
    info = _ebml(b"\x15\x49\xa9\x66",
                 _ebml_uint(b"\x2a\xd7\xb1", 1_000_000))   # 1 ms ticks
    track = _ebml(b"\xae",
                  _ebml_uint(b"\xd7", 1)           # TrackNumber
                  + _ebml_uint(b"\x73\xc5", 1)     # TrackUID
                  + _ebml_uint(b"\x83", 1)         # TrackType: video
                  + _ebml(b"\x86", b"V_MJPEG")     # CodecID
                  + _ebml(b"\xe0", _ebml_uint(b"\xb0", width)
                          + _ebml_uint(b"\xba", height)))
    body = [info, _ebml(_MKV_TRACKS, track)]
    for i, j in enumerate(jpeg_frames):
        block = b"\x81" + struct.pack(">h", 0) + b"\x80" + j
        body.append(_ebml(_MKV_CLUSTER,
                          _ebml_uint(b"\xe7", i * 1000 // fps)
                          + _ebml(b"\xa3", block)))
    return head + _ebml(_MKV_SEGMENT, b"".join(body))


def is_mkv(data: bytes) -> bool:
    return data.startswith(_MKV_EBML)


def _ebml_read_id(data: bytes, pos: int, hi: int) -> tuple[bytes, int]:
    if pos >= hi:
        raise ValueError("ebml: truncated element id")
    b0 = data[pos]
    for n in range(1, 5):
        if b0 >> (8 - n) == 1:
            if pos + n > hi:
                raise ValueError("ebml: truncated element id")
            return bytes(data[pos:pos + n]), pos + n
    raise ValueError(f"ebml: invalid id lead byte {b0:#04x}")


def _ebml_read_size(data: bytes, pos: int, hi: int) -> tuple[int | None, int]:
    """Size vint → (value, new_pos); the reserved all-ones pattern decodes
    to None (unknown size — runs to the end of the enclosing element)."""
    if pos >= hi:
        raise ValueError("ebml: truncated size vint")
    b0 = data[pos]
    for n in range(1, 9):
        if b0 >> (8 - n) == 1:
            if pos + n > hi:
                raise ValueError("ebml: truncated size vint")
            raw = int.from_bytes(data[pos:pos + n], "big") - (1 << (7 * n))
            return (None if raw == (1 << (7 * n)) - 1 else raw), pos + n
    raise ValueError(f"ebml: invalid size lead byte {b0:#04x}")


# ids that can only start a NEW top-level Segment child — per RFC 8794 an
# unknown-size element ends at the first id that is not a valid child, so
# any of these inside an unsized Cluster terminates it (Info, SeekHead,
# Tracks, Cluster, Cues, Chapters, Attachments, Tags)
_MKV_TOPLEVEL = frozenset((
    b"\x15\x49\xa9\x66", b"\x11\x4d\x9b\x74", _MKV_TRACKS, _MKV_CLUSTER,
    b"\x1c\x53\xbb\x6b", b"\x10\x43\xa7\x70", b"\x19\x41\xa4\x69",
    b"\x12\x54\xc3\x67"))


def _mkv_children(data: bytes, lo: int, hi: int):
    """Yield (id, body_lo, body_hi) for each sized element in [lo, hi).
    Unknown-size is legal only for Segment (runs to end of input) here;
    unknown-size Clusters are resolved by the caller's terminator scan —
    treating them as to-end-of-parent would swallow every later cluster's
    frames silently."""
    pos = lo
    while pos < hi:
        eid, p = _ebml_read_id(data, pos, hi)
        size, body = _ebml_read_size(data, p, hi)
        if size is None:
            if eid != _MKV_SEGMENT:
                raise ValueError(
                    f"mkv: unknown-size element {eid.hex()} (only Segment "
                    "and Cluster may be unsized; Clusters are handled by "
                    "the segment walk)")
            end = hi
        else:
            end = body + size
        if end > hi:
            raise ValueError(f"mkv: element {eid.hex()} overruns its parent")
        yield eid, body, end
        pos = end


def _mkv_uint(data: bytes, lo: int, hi: int) -> int:
    return int.from_bytes(data[lo:hi], "big")


def _mkv_block_frame(data: bytes, lo: int, hi: int,
                     track_no: int) -> bytes | None:
    """(Simple)Block body → frame bytes for ``track_no`` (None = another
    track's block). Lacing is refused, not skipped — silently dropping
    laced frames would under-sample the clip."""
    tn, pos = _ebml_read_size(data, lo, hi)     # track number is a vint
    if tn is None:
        # the all-ones reservation applies to element DATA SIZES only
        # (RFC 8794 §4.4) — a Block's track-number vint 0xFF is simply the
        # VALUE 127 (likewise 0x7F 0xFF = 16383, ...): recover it instead
        # of rejecting a spec-valid foreign file
        n = pos - lo
        tn = (1 << (7 * n)) - 1
    if pos + 3 > hi:
        raise ValueError("mkv: malformed block header")
    if tn != track_no:
        return None     # another track's block (audio is often laced —
                        # only the video track's lacing is our problem)
    if data[pos + 2] & 0x06:
        raise ValueError("mkv: laced blocks unsupported")
    return bytes(data[pos + 3:hi])


def mkv_frame_chunks(data: bytes) -> list[bytes]:
    """Walk the EBML tree of an MJPEG Matroska and return every video
    frame's bytes in stream order (SimpleBlock and BlockGroup>Block both).
    Non-MJPEG CodecIDs raise NotImplementedError; a structurally broken
    tree raises ValueError."""
    if not is_mkv(data):
        raise ValueError("mkv: no EBML header")
    seg = next(((lo, hi) for eid, lo, hi in _mkv_children(data, 0, len(data))
                if eid == _MKV_SEGMENT), None)
    if seg is None:
        raise ValueError("mkv: no Segment element")
    track_no = None
    frames: list[bytes] = []

    def cluster_child(cid: bytes, clo: int, chi: int) -> None:
        if cid == b"\xa3":                      # SimpleBlock
            f = _mkv_block_frame(data, clo, chi, track_no)
            if f is not None:
                frames.append(f)
        elif cid == b"\xa0":                    # BlockGroup
            for gid, glo, ghi in _mkv_children(data, clo, chi):
                if gid == b"\xa1":              # Block
                    f = _mkv_block_frame(data, glo, ghi, track_no)
                    if f is not None:
                        frames.append(f)

    pos, seg_hi = seg
    while pos < seg_hi:
        eid, p = _ebml_read_id(data, pos, seg_hi)
        size, body = _ebml_read_size(data, p, seg_hi)
        if size is None:
            # unknown-size Cluster (the live-streaming layout): it ends at
            # the first id that cannot be its child (RFC 8794), so scan
            # sized children until a top-level id — later clusters keep
            # their frames instead of being swallowed
            if eid != _MKV_CLUSTER:
                raise ValueError(
                    f"mkv: unknown-size element {eid.hex()} in Segment")
            if track_no is None:
                raise ValueError("mkv: Cluster before a video TrackEntry")
            pos = body
            while pos < seg_hi:
                cid, cp = _ebml_read_id(data, pos, seg_hi)
                if cid in _MKV_TOPLEVEL:
                    break
                csize, cbody = _ebml_read_size(data, cp, seg_hi)
                if csize is None or cbody + csize > seg_hi:
                    raise ValueError("mkv: malformed child in an "
                                     "unknown-size Cluster")
                cluster_child(cid, cbody, cbody + csize)
                pos = cbody + csize
            continue
        end = body + size
        if end > seg_hi:
            raise ValueError(f"mkv: element {eid.hex()} overruns its parent")
        if eid == _MKV_TRACKS:
            for tid, tlo, thi in _mkv_children(data, body, end):
                if tid != b"\xae":              # TrackEntry
                    continue
                num, ttype, codec = None, None, b""
                for fid, flo, fhi in _mkv_children(data, tlo, thi):
                    if fid == b"\xd7":
                        num = _mkv_uint(data, flo, fhi)
                    elif fid == b"\x83":
                        ttype = _mkv_uint(data, flo, fhi)
                    elif fid == b"\x86":
                        codec = bytes(data[flo:fhi])
                if ttype == 1:                  # video track
                    if codec != b"V_MJPEG":
                        raise NotImplementedError(
                            f"mkv: codec {codec.decode('latin1')!r} "
                            "unsupported (V_MJPEG only)")
                    track_no = num
        elif eid == _MKV_CLUSTER:
            if track_no is None:
                raise ValueError("mkv: Cluster before a video TrackEntry")
            for cid, clo, chi in _mkv_children(data, body, end):
                cluster_child(cid, clo, chi)
        pos = end
    if track_no is None:
        raise ValueError("mkv: no video track")
    return frames
