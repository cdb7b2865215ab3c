"""RESP protocol codec + Redis Cluster key slots.

- ``encode_cmd`` / ``parse_resp``: the wire format spoken by the reference's
  psync/AOF tail and sinker (dt-common/src/meta/redis/command/cmd_encoder.rs,
  dt-connector/src/extractor/redis/redis_resp_reader.rs). A command is a RESP
  array of bulk strings; a replication log is just a concatenation of those,
  and the byte position of each command IS its replication offset — exactly
  the psync offset semantics, so parse_resp returns (offset, args) pairs.
- ``calc_slot`` / ``calc_slots``: CRC16-CCITT(XMODEM) of the key (or its
  ``{hashtag}``) mod 16384 (key_parser.rs:164-210). ``calc_slots`` is the
  vectorized batch form used by the partitioner — table-driven CRC16 over a
  padded byte matrix, one numpy step per byte position (keys are short, so
  this is ~20 masked table lookups per batch, no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# ------------------------------------------------------------------ CRC16
# CCITT/XMODEM: poly 0x1021, init 0, no reflection. crc16(b"123456789")=0x31C3.

_CRC16_POLY = 0x1021


def _make_crc16_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        crc = i << 8
        for _ in range(8):
            crc = ((crc << 1) ^ _CRC16_POLY) if crc & 0x8000 else (crc << 1)
            crc &= 0xFFFF
        table[i] = crc
    return table


_CRC16_TABLE = _make_crc16_table()


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ int(_CRC16_TABLE[((crc >> 8) ^ b) & 0xFF])
    return crc


def _hashtag(key: bytes) -> bytes:
    """The {hashtag} substring if present and non-empty, else the whole key."""
    i = key.find(b"{")
    if i >= 0:
        j = key.find(b"}", i + 1)
        if j > i + 1:
            return key[i + 1:j]
    return key


def calc_slot(key: bytes) -> int:
    return crc16(_hashtag(key)) & 0x3FFF


def calc_slots(keys: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized cluster slots for a string/binary Arrow array. Keys that
    contain '{' fall back to the scalar path (hashtag extraction); the rest
    run table-driven CRC16 across a padded uint8 matrix."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
        keys = keys.cast(pa.binary())
    arr = keys
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    buffers = arr.buffers()
    # a SLICED array shares its parent's buffers and records the shift in
    # arr.offset — window the offsets there (the offset VALUES are absolute
    # into the shared data buffer, so only this slice needs the shift)
    offsets = np.frombuffer(buffers[1], dtype=np.int32, count=n + 1,
                            offset=arr.offset * 4)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None \
        else np.zeros(0, dtype=np.uint8)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    max_len = int(lens.max()) if n else 0
    crc = np.zeros(n, dtype=np.uint16)
    brace = np.zeros(n, dtype=bool)
    if max_len:
        idx = offsets[:-1, None].astype(np.int64) + np.arange(max_len)[None, :]
        valid = np.arange(max_len)[None, :] < lens[:, None]
        safe = np.minimum(idx, max(len(data) - 1, 0))
        padded = np.where(valid, data[safe] if len(data) else 0, 0).astype(np.uint8)
        brace = (padded == 0x7B).any(axis=1)        # rows containing '{'
        for j in range(max_len):
            active = valid[:, j]
            c = crc[active]
            crc[active] = ((c << np.uint16(8))
                           ^ _CRC16_TABLE[((c >> np.uint16(8))
                                           ^ padded[active, j]).astype(np.uint8)])
    slots = (crc & np.uint16(0x3FFF)).astype(np.int32)
    # hashtag fallback for keys containing '{' (rare; per-key scalar path)
    for i in np.nonzero(brace)[0]:
        slots[int(i)] = calc_slot(arr[int(i)].as_py())
    return slots


# ------------------------------------------------------------------ RESP

def encode_cmd(args: list[bytes]) -> bytes:
    """RESP array of bulk strings (cmd_encoder.rs:26-57)."""
    out = bytearray(b"*%d\r\n" % len(args))
    for a in args:
        out += b"$%d\r\n" % len(a)
        out += a
        out += b"\r\n"
    return bytes(out)


def encode_cmds(cmds: list[list[bytes]]) -> bytes:
    out = bytearray()
    for c in cmds:
        out += encode_cmd(c)
    return bytes(out)


class _Truncated(Exception):
    """Frame needs bytes past the end of the buffer (cut read, not corrupt)."""


def parse_resp(data: bytes, base_offset: int = 0,
               tolerate_truncation: bool = False):
    """Parse a RESP command stream → list of (offset, [args]).

    offset = base_offset + byte position of the command's first byte (the
    replication-offset semantics of the psync stream). Inline status/error/
    integer frames (+OK, -ERR, :n) are skipped, like the extractor's ACK
    handling; only arrays of bulk strings become commands.

    Truncation (a frame needing bytes past the buffer end — a cut read or a
    torn final write) is distinguished from corruption (a wrong byte WITHIN
    the buffer): with ``tolerate_truncation`` the complete frames parsed so
    far are returned (head-sample prechecks over an arbitrary byte cut);
    without it truncation raises like corruption — a torn trailing bulk
    string must never silently yield a shortened argument.
    """
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        start = pos
        try:
            t = data[pos:pos + 1]
            if t in (b"+", b"-", b":"):
                eol = data.find(b"\r\n", pos)
                if eol < 0:
                    raise _Truncated
                pos = eol + 2
                continue
            if t == b"\n":                   # psync keep-alive newline
                pos += 1
                continue
            if t != b"*":
                raise ValueError(f"resp: unexpected byte {t!r} at {pos}")
            eol = data.find(b"\r\n", pos)
            if eol < 0:
                raise _Truncated
            argc = int(data[pos + 1:eol])
            pos = eol + 2
            args = []
            for _ in range(argc):
                if pos >= n:
                    raise _Truncated
                if data[pos:pos + 1] != b"$":
                    raise ValueError(f"resp: expected bulk string at {pos}")
                eol = data.find(b"\r\n", pos)
                if eol < 0:
                    raise _Truncated
                ln = int(data[pos + 1:eol])
                pos = eol + 2
                if pos + ln + 2 > n:
                    raise _Truncated
                args.append(data[pos:pos + ln])
                pos += ln + 2                # skip trailing \r\n
            out.append((base_offset + start, args))
        except _Truncated:
            if tolerate_truncation:
                return out
            raise ValueError(
                f"resp: truncated frame at {start} (torn write?)") from None
    return out
