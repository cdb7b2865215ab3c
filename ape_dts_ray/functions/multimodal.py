"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns with typed metadata columns beside them
(``media_type``, ``width``/``height``/``duration_ms``...). Decode /
feature-extract / resize / frame-sample run as ACTOR-POOL ``map_batches``
stages: codec/model setup happens once per actor in ``__init__``; batches stay
small because each row can carry megabytes (size ``batch_size`` so
batch_bytes × concurrency fits the worker heap — the memory-aware rule).

Codec: PIL when available; otherwise a PURE-numpy+zlib PNG codec implemented
from the public PNG spec (RFC 2083: chunk layout, zlib IDAT, filter types
0–4) — so ``DecodeImage(strict=True)`` genuinely decodes real PNG payloads
in this container. Non-PNG formats without PIL raise in strict mode; the
deterministic fake decode remains for non-strict plumbing tests.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

# --- minimal PNG codec (public spec, RFC 2083; 8-bit gray/RGB/RGBA,
#     no interlace, no palette) ---

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) or (h, w, ch). Supports bit depth 8,
    color types 0/2/6, all five scanline filters, no interlacing."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, hdr = 8, [], None
    while pos < len(data):
        ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = hdr
    if depth != 8 or ctype not in _CHANNELS or interlace:
        raise NotImplementedError(
            f"PNG variant unsupported (depth={depth}, color={ctype}, "
            f"interlace={interlace})")
    ch = _CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=y * (stride + 1) + 1)
        if f == 0:
            cur = line.copy()
        elif f == 1:                                   # sub: cumsum per channel
            # cur[x] = line[x] + cur[x-ch] (mod 256) — addition mod 256 is
            # associative, so the recurrence IS a prefix sum per channel
            px = line.reshape(w, ch).astype(np.int64)
            cur = (np.cumsum(px, axis=0) & 0xFF).astype(np.uint8).reshape(stride)
        elif f == 2:                                   # up (uint8 wraps mod 256)
            cur = line + prev
        elif f in (3, 4):                              # average/paeth: true
            # serial dependence in x (pred needs the DECODED left pixel), so
            # loop per PIXEL with channels vectorized — ch× fewer interpreter
            # ops; PIL remains the production codec for these filters
            px = line.reshape(w, ch).astype(np.int32)
            pv = prev.reshape(w, ch).astype(np.int32)
            dec = np.empty((w, ch), np.int32)
            a = np.zeros(ch, np.int32)
            if f == 3:
                for x in range(w):
                    a = (px[x] + ((a + pv[x]) >> 1)) & 0xFF
                    dec[x] = a
            else:
                c = np.zeros(ch, np.int32)
                for x in range(w):
                    b = pv[x]
                    p = a + b - c
                    da, db, dc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where((da <= db) & (da <= dc), a,
                                    np.where(db <= dc, b, c))
                    a = (px[x] + pred) & 0xFF
                    dec[x] = a
                    c = b
            cur = dec.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"PNG filter {f} invalid")
        out[y] = cur
        prev = out[y]
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (h, w) / (h, w, 3) / (h, w, 4) → PNG bytes.

    ``filter_type`` 0 (none, the fast path), 1 (sub), 2 (up) or 4 (paeth) is
    applied to every scanline — residuals are computed vectorized over the
    whole image (the encoder sees all original pixels, so even paeth needs no
    recurrence). Non-zero filters exist mainly to exercise the decoder's
    unfilter paths against externally-produced PNGs."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        ctype, ch = 0, 1
        a = a[:, :, None]
    elif a.shape[2] == 3:
        ctype, ch = 2, 3
    elif a.shape[2] == 4:
        ctype, ch = 6, 4
    else:
        raise ValueError("expected gray / RGB / RGBA uint8 array")
    h, w = a.shape[:2]
    img = a.astype(np.int32)
    left = np.zeros_like(img)
    left[:, 1:] = img[:, :-1]                  # a: pixel to the left
    up = np.zeros_like(img)
    up[1:] = img[:-1]                          # b: pixel above
    upleft = np.zeros_like(img)
    upleft[1:, 1:] = img[:-1, :-1]             # c: pixel above-left
    if filter_type == 0:
        res = img
    elif filter_type == 1:
        res = (img - left) & 0xFF
    elif filter_type == 2:
        res = (img - up) & 0xFF
    elif filter_type == 4:
        p = left + up - upleft
        da, db, dc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((da <= db) & (da <= dc), left,
                        np.where(db <= dc, up, upleft))
        res = (img - pred) & 0xFF
    else:
        raise ValueError(f"unsupported encode filter {filter_type}")
    res = res.astype(np.uint8).reshape(h, w * ch)
    ftag = bytes([filter_type])
    raw = b"".join(ftag + res[y].tobytes() for y in range(h))

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + typ + payload +
                struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (gray or multi-channel uint8/float)."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[yi][:, xi]

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),       # "image/png", "audio/wav", ...
    ("payload", pa.binary()),          # opaque encoded bytes
    ("width", pa.int32()),             # -1 when unknown / not applicable
    ("height", pa.int32()),
])


def synthesize_media_table(n: int, seed: int = 13, side: int = 64) -> pa.Table:
    """Deterministic media corpus for tests/benchmarks: REAL encoded PNG
    payloads (seeded pixel noise through encode_png; no external data)."""
    rng = np.random.default_rng(seed)
    payloads = [encode_png(rng.integers(0, 256, size=(side, side),
                                        dtype=np.uint8))
                for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "media_type": pa.array(["image/png"] * n),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(np.full(n, side, dtype=np.int32)),
        "height": pa.array(np.full(n, side, dtype=np.int32)),
    })


# --- minimal WAV (RIFF PCM) codec — stdlib struct only ---

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 samples in [-1, 1] shaped (n, channels), rate).
    Supports PCM 8/16/32-bit — the RIFF/WAVE layout is public spec."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, ln = data[pos:pos + 4], struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _bps, _align, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"WAV format {audio_fmt} unsupported (PCM only)")
    if channels == 0:
        raise ValueError("WAV: zero channels")
    if bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    elif bits == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit WAV unsupported")
    n = len(x) // channels
    return x[:n * channels].reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """float samples in [-1, 1] (n,) or (n, ch) → 16-bit PCM WAV bytes."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.round(np.clip(s * 32767.0, -32768, 32767)).astype("<i2").tobytes()
    ch, bits = s.shape[1], 16
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                                   rate * ch * bits // 8, ch * bits // 8, bits)
           + b"data" + struct.pack("<I", len(pcm)))
    return hdr + pcm


# --- minimal AIFF (big-endian PCM) codec — the WAV layout's IFF sibling ---

def _f80_to_rate(b: bytes) -> int:
    """AIFF COMM sampleRate is an 80-bit IEEE-754 extended float (public
    AIFF-1.3 spec); real rates are small integers so float math is exact."""
    exp = ((b[0] & 0x7F) << 8) | b[1]
    mant = int.from_bytes(b[2:10], "big")
    if exp == 0 and mant == 0:
        return 0
    if exp > 16383 + 63:            # rate beyond 2^63: corrupt field
        raise ValueError("AIFF: implausible sample rate exponent")
    val = mant * 2.0 ** (exp - 16383 - 63)
    return int(round(-val if b[0] >> 7 else val))


def _rate_to_f80(v: int) -> bytes:
    if v <= 0:
        return b"\x00" * 10
    e = v.bit_length() - 1
    return struct.pack(">H", 16383 + e) + (v << (63 - e)).to_bytes(8, "big")


def decode_aiff(data: bytes) -> tuple[np.ndarray, int]:
    """AIFF bytes → (float64 samples in [-1, 1] shaped (n, channels), rate).
    PCM 8/16/32-bit (AIFF 8-bit is SIGNED, unlike WAV's unsigned)."""
    if data[:4] != b"FORM" or data[8:12] != b"AIFF":
        raise ValueError("not a FORM/AIFF payload")
    pos, comm, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack(">I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if cid == b"COMM":
            ch, _nf, bits = struct.unpack(">HIH", body[:8])
            comm = (ch, bits, _f80_to_rate(body[8:18]))
        elif cid == b"SSND":
            off, _blk = struct.unpack(">II", body[:8])
            raw = body[8 + off:]
    if comm is None or raw is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    channels, bits, rate = comm
    if channels == 0:
        raise ValueError("AIFF: zero channels")
    if bits == 16:
        x = np.frombuffer(raw, dtype=">i2").astype(np.float64) / 32768.0
    elif bits == 32:
        x = np.frombuffer(raw, dtype=">i4").astype(np.float64) / 2147483648.0
    elif bits == 8:
        x = np.frombuffer(raw, dtype=np.int8).astype(np.float64) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit AIFF unsupported")
    n = len(x) // channels
    return x[:n * channels].reshape(n, channels), rate


def encode_aiff(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """float samples in [-1, 1] (n,) or (n, ch) → 16-bit PCM AIFF bytes."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.round(np.clip(s * 32767.0, -32768, 32767)).astype(">i2").tobytes()
    comm = (b"COMM" + struct.pack(">IHIH", 18, s.shape[1], s.shape[0], 16)
            + _rate_to_f80(rate))
    ssnd = b"SSND" + struct.pack(">III", 8 + len(pcm), 0, 0) + pcm
    return (b"FORM" + struct.pack(">I", 4 + len(comm) + len(ssnd)) + b"AIFF"
            + comm + ssnd)


def audio_features(samples: np.ndarray, rate: int,
                   n_frames: int = 8) -> np.ndarray:
    """Per-frame RMS energy + zero-crossing rate over ``n_frames`` equal
    windows (mono mixdown) — the classic cheap audio descriptors, vectorized."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return np.zeros(2 * n_frames)
    edges = np.linspace(0, n, n_frames + 1, dtype=np.int64)
    rms = np.empty(n_frames)
    zcr = np.empty(n_frames)
    signs = np.signbit(mono)
    flips = np.concatenate([[False], signs[1:] != signs[:-1]])
    for i in range(n_frames):               # n_frames is tiny (fixed output)
        lo, hi = edges[i], max(edges[i + 1], edges[i] + 1)
        seg = mono[lo:hi]
        rms[i] = np.sqrt(np.mean(seg * seg))
        zcr[i] = flips[lo:hi].mean()
    return np.concatenate([rms, zcr])


class DecodeAudio:
    """Actor-pool stage: WAV/AIFF payload → fixed-size feature row (RMS +
    ZCR per frame). ``strict=True`` raises on undecodable payloads; else a
    deterministic fake (payload-digest-seeded) keeps plumbing testable."""

    def __init__(self, n_frames: int = 8, strict: bool = False):
        self.n_frames = n_frames
        self.strict = strict

    def _decode(self, payload: bytes) -> np.ndarray:
        try:
            if payload[:4] == b"RIFF":
                samples, rate = decode_wav(payload)
                return audio_features(samples, rate, self.n_frames)
            if payload[:4] == b"FORM" and payload[8:12] == b"AIFF":
                samples, rate = decode_aiff(payload)
                return audio_features(samples, rate, self.n_frames)
        except (ValueError, NotImplementedError, struct.error, IndexError):
            # malformed / unsupported container: strict keeps the error, a
            # mixed corpus in non-strict mode falls through to the stub
            # instead of killing the whole actor-pool stage
            if self.strict:
                raise
        else:
            if self.strict:
                raise NotImplementedError(
                    "no codec for this payload (WAV and AIFF PCM only)")
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
        return np.random.default_rng(seed).random(2 * self.n_frames)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p).tolist()
                 for p in batch.column("payload").to_pylist()]
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.array(feats, type=pa.list_(pa.float64())),
        })


class DecodeImage:
    """Actor-pool stage: binary payload → fixed-size float feature row.

    Codec resolution at actor init (once per actor): PIL when installed, else
    the module's pure PNG codec for ``image/png`` payloads. ``strict=True``
    raises on payloads no available codec can decode (honest production
    behavior); ``strict=False`` falls back to a deterministic fake decode so
    downstream plumbing can be exercised with any payload.
    """

    def __init__(self, out_size: int = 8, strict: bool = False):
        self.out_size = out_size
        self.strict = strict
        try:
            from PIL import Image
            self._pil = Image
        except ImportError:
            self._pil = None

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-pixels seeded by the payload digest
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.random((self.out_size, self.out_size), dtype=np.float64)

    def _decode(self, payload: bytes) -> np.ndarray:
        if self._pil is not None:
            import io
            try:
                img = self._pil.open(io.BytesIO(payload)).convert("L")
                img = img.resize((self.out_size, self.out_size))
                return np.asarray(img, dtype=np.float64) / 255.0
            except Exception:
                # the class contract: strict raises, non-strict falls back
                # to the deterministic fake — an unguarded PIL error would
                # kill the whole actor-pool stage on one bad payload
                if self.strict:
                    raise
                return self._fake_decode(payload)
        if payload[:8] == _PNG_SIG:
            try:
                img = decode_png(payload)
                if img.ndim == 3:                   # luma from RGB(A)
                    img = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                           + 0.114 * img[:, :, 2])
                img = resize_nearest(img.astype(np.float64),
                                     self.out_size, self.out_size)
                return img / 255.0
            except Exception:   # struct/zlib/Value errors from a corrupt
                if self.strict:  # body — same contract as the PIL branch
                    raise
                return self._fake_decode(payload)
        if payload[:2] == b"\xff\xd8":              # baseline JPEG → luma
            from ape_dts_ray.functions.mjpeg import decode_baseline_jpeg_luma

            try:
                img = decode_baseline_jpeg_luma(payload)
            except (ValueError, NotImplementedError, IndexError,
                    struct.error, EOFError, KeyError):
                # progressive / malformed: strict keeps the error,
                # non-strict falls back to the deterministic fake
                if self.strict:
                    raise
                return self._fake_decode(payload)
            img = resize_nearest(img.astype(np.float64),
                                 self.out_size, self.out_size)
            return img / 255.0
        if self.strict:
            raise NotImplementedError(
                "no codec for this payload (PIL absent; not a PNG/JPEG)")
        return self._fake_decode(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p).mean(axis=0)      # column-mean feature vector
                 for p in batch.column("payload").to_pylist()]
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.array([f.tolist() for f in feats],
                                type=pa.list_(pa.float64())),
        })


# --- minimal Y4M (YUV4MPEG2) container — pure stdlib/numpy. The format is
#     a public plain-text header + uncompressed planar frames, so a real
#     video decode IS expressible here (unlike compressed codecs). ---

_Y4M_MAGIC = b"YUV4MPEG2"
_Y4M_PLANES = {           # luma+chroma bytes per pixel numerator/denominator
    "420": (3, 2), "420jpeg": (3, 2), "420mpeg2": (3, 2), "420paldv": (3, 2),
    "422": (2, 1), "444": (3, 1), "mono": (1, 1),
}


def y4m_info(data: bytes) -> dict:
    """Parse the stream header: width, height, colourspace, frame geometry."""
    if not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    w = h = None
    cs = "420jpeg"                       # spec default when C is absent
    for tok in data[len(_Y4M_MAGIC):nl].split(b" "):
        tok = tok.decode("ascii", "replace")
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("C"):
            cs = tok[1:]
    if w is None or h is None or cs not in _Y4M_PLANES:
        raise NotImplementedError(f"unsupported Y4M header (C{cs})")
    num, den = _Y4M_PLANES[cs]
    frame_bytes = w * h * num // den
    return {"width": w, "height": h, "colourspace": cs,
            "header_end": nl + 1, "frame_bytes": frame_bytes}


def y4m_frame_offsets(data: bytes, info: dict) -> list[int]:
    """Byte offsets of each frame's pixel data (after its FRAME line).
    Walks only FRAME headers — O(frames), no pixel decode."""
    offs, pos, n = [], info["header_end"], len(data)
    fb = info["frame_bytes"]
    while pos < n:
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError(f"Y4M: expected FRAME marker at byte {pos}")
        nl = data.index(b"\n", pos)
        if nl + 1 + fb > n:
            raise ValueError(f"Y4M: truncated frame at byte {nl + 1} "
                             f"(need {fb} bytes, have {n - nl - 1})")
        offs.append(nl + 1)
        pos = nl + 1 + fb
    return offs


def decode_y4m_frame(data: bytes, info: dict, offset: int) -> np.ndarray:
    """Luma plane of one frame as a uint8 (h, w) array (zero-copy view)."""
    w, h = info["width"], info["height"]
    return np.frombuffer(data, dtype=np.uint8, count=w * h,
                         offset=offset).reshape(h, w)


def encode_y4m(frames: np.ndarray, colourspace: str = "mono") -> bytes:
    """uint8 (n, h, w) luma frames → Y4M bytes. ``mono`` writes luma only;
    ``420jpeg`` pads neutral (128) chroma planes."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    hdr = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{colourspace}\n".encode()
    if colourspace == "mono":
        chroma = b""
    elif colourspace in ("420", "420jpeg"):
        if w % 2 or h % 2:
            # 4:2:0 subsamples both axes by 2 — an odd dimension would make
            # our written frame size disagree with y4m_info's h*w*3//2 and
            # the stream unreadable; refuse instead of emitting it
            raise ValueError(f"4:2:0 needs even dimensions, got {w}x{h}")
        chroma = bytes([128]) * (w // 2 * (h // 2) * 2)
    else:
        raise NotImplementedError(f"encode for C{colourspace} not implemented")
    return hdr + b"".join(b"FRAME\n" + f[i].tobytes() + chroma
                          for i in range(n))


class SampleFrames:
    """Actor-pool stage: video payload → ``n_frames`` evenly spaced frame
    features. Y4M (YUV4MPEG2) payloads are REALLY decoded — header parse,
    frame-offset walk (no full-stream decode), luma extraction, nearest
    resize, column-mean feature — so ``strict=True`` works end-to-end on
    uncompressed video; MJPEG in an AVI, MP4 or MKV container likewise
    (RIFF ``movi`` walk / ISO-BMFF sample tables / Matroska EBML clusters →
    per-frame baseline-JPEG luma,
    functions/mjpeg.py). Inter-frame codecs (H.264 &c.) are not expressible
    with the stdlib: strict mode raises for them; otherwise the payload is
    split into even byte spans whose digests seed deterministic fake frame
    features, keeping the plumbing (even spacing, per-frame rows, batch
    sizing) testable with any payload."""

    def __init__(self, n_frames: int = 4, feat_size: int = 8,
                 strict: bool = False):
        self.n_frames = n_frames
        self.feat_size = feat_size
        self.strict = strict

    def _frame_rows(self, payload: bytes):
        if payload.startswith(_Y4M_MAGIC):
            try:
                info = y4m_info(payload)
                offs = y4m_frame_offsets(payload, info)
            except (ValueError, NotImplementedError, IndexError):
                # malformed / unsupported-colourspace Y4M: strict mode keeps
                # the error, non-strict falls back to the stub path below
                # (the old never-raise contract for arbitrary payloads)
                if self.strict:
                    raise
                info = offs = None
            if offs is not None:
                return self._y4m_rows(payload, info, offs)
        from ape_dts_ray.functions import mjpeg as _mjpeg

        if (_mjpeg.is_avi(payload) or _mjpeg.is_mp4(payload)
                or _mjpeg.is_mkv(payload)):
            try:
                chunks = (_mjpeg.avi_frame_chunks(payload)
                          if _mjpeg.is_avi(payload)
                          else _mjpeg.mp4_frame_chunks(payload)
                          if _mjpeg.is_mp4(payload)
                          else _mjpeg.mkv_frame_chunks(payload))
                if chunks:
                    return self._mjpeg_rows(chunks)
            except (ValueError, NotImplementedError, IndexError,
                    struct.error, EOFError, KeyError):
                # non-MJPEG codec / malformed container / truncated entropy
                # segment (EOFError) / missing quant table (KeyError):
                # strict raises, non-strict keeps the deterministic stub
                if self.strict:
                    raise
        if self.strict:
            raise NotImplementedError(
                "no codec for this payload (strict mode decodes Y4M and "
                "MJPEG in AVI / MP4 / MKV containers only)")
        return self._stub_rows(payload)

    def _mjpeg_rows(self, chunks: list[bytes]):
        from ape_dts_ray.functions.mjpeg import decode_avi_mjpeg_frame

        pick = np.unique(np.linspace(0, len(chunks) - 1, self.n_frames,
                                     dtype=np.int64))
        out = []
        for fi, idx in enumerate(pick):
            luma = decode_avi_mjpeg_frame(chunks[idx])
            small = resize_nearest(luma.astype(np.float64),
                                   self.feat_size, self.feat_size)
            out.append((fi, (small.mean(axis=0) / 255.0).tolist()))
        return out

    def _y4m_rows(self, payload: bytes, info: dict, offs: list[int]):
        if not offs:
            return []
        # evenly spaced frame indices across the clip (dedup keeps order)
        pick = np.unique(np.linspace(0, len(offs) - 1, self.n_frames,
                                     dtype=np.int64))
        out = []
        for fi, idx in enumerate(pick):
            luma = decode_y4m_frame(payload, info, offs[idx])
            small = resize_nearest(luma.astype(np.float64),
                                   self.feat_size, self.feat_size)
            out.append((fi, (small.mean(axis=0) / 255.0).tolist()))
        return out

    def _stub_rows(self, payload: bytes):
        edges = np.linspace(0, len(payload), self.n_frames + 1, dtype=np.int64)
        out = []
        for fi in range(self.n_frames):
            span = payload[edges[fi]:max(edges[fi + 1], edges[fi] + 1)]
            seed = int.from_bytes(hashlib.sha256(span).digest()[:8], "little")
            out.append((fi, np.random.default_rng(seed)
                        .random(self.feat_size).tolist()))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, feats = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            for fi, feat in self._frame_rows(payload):
                ids.append(mid)
                frames.append(fi)
                feats.append(feat)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frames, pa.int32()),
            "feature": pa.array(feats, type=pa.list_(pa.float64())),
        })


class ResizeStage:
    """Actor-pool stage operating on decoded features (here: truncate/pad the
    feature vector — stands in for a resize/crop kernel with identical
    plumbing)."""

    def __init__(self, target: int = 4):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for f in batch.column("feature").to_pylist():
            v = (f + [0.0] * self.target)[: self.target]
            out.append(v)
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.array(out, type=pa.list_(pa.float64())),
        })


def media_feature_pipeline(media_ds, out_size: int = 8, target: int = 4,
                           batch_size: int = 64, concurrency: int = 2):
    """decode → resize as two actor-pool stages; small batches because rows
    carry binary payloads."""
    return (media_ds
            .map_batches(DecodeImage, fn_constructor_args=(out_size,),
                         batch_format="pyarrow", batch_size=batch_size,
                         concurrency=concurrency)
            .map_batches(ResizeStage, fn_constructor_args=(target,),
                         batch_format="pyarrow", batch_size=batch_size,
                         concurrency=concurrency))
