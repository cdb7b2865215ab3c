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
    if (pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type)
            or pa.types.is_large_binary(keys.type)):
        # normalize to 32-bit-offset binary: the frombuffer below assumes
        # int32 offsets — a large_binary array (polars' default) silently
        # reinterpreted int64 offsets as int32 and computed WRONG slots
        # (nondeterministic partitioning, duplicated keys in the fold)
        keys = keys.cast(pa.binary())
    elif not pa.types.is_binary(keys.type):
        raise TypeError(f"calc_slots: expected a string/binary array, got "
                        f"{keys.type}")
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
    # the padded matrix is n × LONGEST key — one 1 MB key (Redis allows up
    # to 512 MB) in a 100k-row batch would make it ~100 GB. Route oversize
    # rows through the per-key scalar path (like brace rows) and size the
    # matrix by the longest REMAINING key.
    long = lens > 512
    lens_m = np.where(long, 0, lens)
    max_len = int(lens_m.max()) if n else 0
    crc = np.zeros(n, dtype=np.uint16)
    brace = np.zeros(n, dtype=bool)
    if max_len:
        idx = offsets[:-1, None].astype(np.int64) + np.arange(max_len)[None, :]
        valid = np.arange(max_len)[None, :] < lens_m[:, None]
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
    # scalar fallback: keys containing '{' (hashtag extraction) and
    # oversize keys (kept out of the padded matrix)
    for i in np.nonzero(brace | long)[0]:
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


import threading as _threading

_SCAN_WS = _threading.local()


def _ws(name: str, size: int, dtype) -> np.ndarray:
    """Per-thread reusable scratch array (grown geometrically, never
    shrunk). Fresh multi-MB numpy allocations re-fault their pages on every
    call and intermittently stall for SECONDS under THP/kcompactd reclaim
    on this host class (measured; same mechanism as the minhash fix in
    functions/dedup.py) — scan_resp routes all its O(tokens) temporaries
    through this pool so a long-lived parse worker allocates once. Slices
    handed out alias the pool: callers must fully overwrite before reading
    and must copy (fancy-index) anything that outlives the call."""
    pool = getattr(_SCAN_WS, "pool", None)
    if pool is None:
        pool = _SCAN_WS.pool = {}
    buf = pool.get(name)
    if buf is None or buf.size < size or buf.dtype != np.dtype(dtype):
        cap = 1 << max(16, int(size - 1).bit_length())
        buf = pool[name] = np.empty(cap, dtype)
    return buf[:size]


def _scalar_step(data: bytes, pos: int):
    """Parse ONE frame at ``pos`` with the exact parse_resp semantics.
    Returns (new_pos, cmd) where cmd is (start, [(arg_pos, arg_len), ...])
    or None for skipped inline frames / keep-alives. Raises _Truncated /
    ValueError exactly like the scalar walker — this is the fallback unit
    of scan_resp for the irregular cases (inline frames, keep-alive
    newlines, payloads containing CRLF, torn tails)."""
    n = len(data)
    t = data[pos:pos + 1]
    if t in (b"+", b"-", b":"):
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            raise _Truncated
        return eol + 2, None
    if t == b"\n":                       # psync keep-alive newline
        return pos + 1, None
    if t != b"*":
        raise ValueError(f"resp: unexpected byte {t!r} at {pos}")
    start = pos
    eol = data.find(b"\r\n", pos)
    if eol < 0:
        raise _Truncated
    argc = int(data[pos + 1:eol])
    if argc < 0:
        # *-1 (null array) is a reply form, like $-1 below — same loud
        # refusal instead of emitting a phantom empty command
        raise ValueError(f"resp: null/negative array header at {start}")
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
        if ln < 0:
            # $-1 (null bulk) is a REPLY form — a command stream's args are
            # plain bulk strings (cmd_encoder.rs emits no nulls), and the
            # length-driven walk cannot represent a null arg. Loud refusal
            # beats the silent frame misalignment a -1 stride would cause.
            raise ValueError(f"resp: null/negative bulk length at {pos}")
        pos = eol + 2
        if pos + ln + 2 > n:
            raise _Truncated
        args.append((pos, ln))
        pos += ln + 2
    return pos, (start, args)


def scan_resp(data: bytes, base_offset: int = 0,
              tolerate_truncation: bool = False,
              window: int = 8 << 20):
    """Columnar RESP scan — parse_resp's semantics without per-arg Python
    objects. Returns four numpy int64 arrays:

        (cmd_off[ncmd], argc[ncmd], arg_pos[nargs], arg_len[nargs])

    where command i's arguments are the flat slice
    ``arg_pos/arg_len[cum_argc[i] : cum_argc[i] + argc[i]]`` into ``data``
    — consumers gather bytes vectorially (redis_replay.scan_to_events).

    Fast path: one numpy pass per WINDOW finds every CRLF; header tokens
    parse their decimal vectorially (only '*'/'$'-leading tokens, loop
    bounded by their actual digit width); the command chain advances one
    Python int per COMMAND (t += 1 + 2·argc) instead of per byte; every
    declared bulk length is validated against the actual token layout. Any
    irregular frame — inline status/error/integer, keep-alive newline, a
    payload that itself contains CRLF, a torn tail, a frame spanning the
    window boundary — fails validation and is handled by ``_scalar_step``
    (exact parse_resp semantics, over the FULL buffer), after which the
    fast scan resumes. Big temporaries live in a per-thread workspace
    reused across calls AND windows — fresh multi-MB numpy allocations
    fault pathologically on THP/reclaim-pressure hosts (seconds-long
    stalls, same mechanism as the round-3 minhash fix in BASELINE.md);
    windowing bounds the workspace (and so the one-time first-touch cost)
    by ``window``, not by file size."""
    n = len(data)

    def _empty():
        z = np.zeros(0, np.int64)
        return z, z.copy(), z.copy(), z.copy()

    if n == 0:
        return _empty()
    if n >= 1 << 31:
        # int32 fast-path positions (here and in scan_to_events' gathers /
        # Arrow binary offsets) would wrap — refuse loudly rather than
        # corrupt. Log segments are the parallel read unit; split them
        # (the per-file offset stride supports any segment count).
        raise ValueError("scan_resp: segment exceeds 2 GiB — split the "
                         "RESP log into smaller segment files")
    a = np.frombuffer(data, np.uint8)
    seg_off, seg_argc, seg_apos, seg_alen = [], [], [], []

    def emit_scalar(cmd) -> None:
        st, args = cmd
        seg_off.append(np.array([base_offset + st], np.int64))
        seg_argc.append(np.array([len(args)], np.int64))
        seg_apos.append(np.array([p for p, _ in args], np.int64))
        seg_alen.append(np.array([l for _, l in args], np.int64))

    pos = 0
    try:
        while pos < n:
            w0, wend = pos, min(pos + window, n)
            # ---- per-window token tables (positions are ABSOLUTE)
            sub = a[w0:wend]
            if wend - w0 > 1:
                eq = _ws("eq", wend - w0 - 1, np.bool_)
                np.equal(sub[:-1], 13, out=eq)
                eq2 = _ws("eq2", wend - w0 - 1, np.bool_)
                np.equal(sub[1:], 10, out=eq2)
                eq &= eq2
                crlf = np.flatnonzero(eq)
                crlf += w0
            else:
                crlf = np.zeros(0, np.int64)
            ntok = len(crlf)
            # int32 throughout (windows ≪ 2 GB; the digit parse is capped
            # at 9 digits so values stay in range) — halves the workspace
            starts = _ws("starts", ntok, np.int32)
            if ntok:
                starts[0] = w0
                np.add(crlf[:-1], 2, out=starts[1:], casting="unsafe")
            tok_len = _ws("tok_len", ntok, np.int32)
            np.subtract(crlf, starts, out=tok_len, casting="unsafe")
            fb = a[starts] if ntok else np.zeros(0, np.uint8)  # empty→'\r'
            # decimal parse, restricted to '*'/'$' tokens with 1-9 digits
            # (a 10+-digit argc/bulk-len breaks validation → scalar path)
            val = _ws("val", ntok, np.int32)
            val.fill(-1)                  # -1 = not a parseable header
            is_hdr = _ws("is_hdr", ntok, np.bool_)
            np.equal(fb, 42, out=is_hdr)
            eqd = _ws("eqd", ntok, np.bool_)
            np.equal(fb, 36, out=eqd)
            is_hdr |= eqd
            is_hdr &= tok_len >= 2
            is_hdr &= tok_len <= 10
            cand = np.flatnonzero(is_hdr)
            if len(cand):
                cs = starts[cand] + 1
                cdl = tok_len[cand] - 1
                vc = np.zeros(len(cand), np.int32)
                okc = np.ones(len(cand), np.bool_)
                for j in range(int(cdl.max())):
                    m = j < cdl
                    d = a[np.minimum(cs + j, n - 1)].astype(np.int32)
                    okc &= ~m | ((d >= 48) & (d <= 57))
                    m &= okc
                    vc[m] = vc[m] * 10 + (d[m] - 48)
                vc[~okc] = -1
                val[cand] = vc
            chv = _ws("chv", ntok, np.int32)   # '*' headers: argc, else -1
            np.copyto(chv, val)
            chv[fb != 42] = -1
            chv_l = chv.tolist()          # fast scalar access for the walk
            hdr_ok = _ws("hdr_ok", ntok, np.bool_)  # '$' + valid length
            np.equal(fb, 36, out=hdr_ok)
            hdr_ok &= val >= 0

            # ---- frames starting inside this window
            while pos < wend:
                t0 = int(np.searchsorted(crlf, pos))
                if t0 >= ntok or starts[t0] != pos:
                    # mid-token resume (after keep-alive), torn tail, or a
                    # frame whose first line crosses the window boundary
                    pos, cmd = _scalar_step(data, pos)
                    if cmd is not None:
                        emit_scalar(cmd)
                    continue
                # chain walk: one Python step per command
                cmds = []
                t = t0
                while t < ntok:
                    v = chv_l[t]
                    nxt = t + 1 + 2 * v
                    if v < 0 or nxt > ntok:
                        break
                    cmds.append(t)
                    t = nxt
                walked = len(cmds)
                k = walked
                if walked:
                    ct = np.asarray(cmds, np.int64)
                    ac = chv[ct].astype(np.int64)
                    cum = np.cumsum(ac)
                    cum0 = np.concatenate([np.zeros(1, np.int64), cum[:-1]])
                    intra = (np.arange(int(cum[-1]), dtype=np.int64)
                             - np.repeat(cum0, ac))
                    hdr = np.repeat(ct, ac) + 1 + 2 * intra
                    pay = hdr + 1
                    valid = hdr_ok[hdr] & (val[hdr] == tok_len[pay])
                    if not valid.all():
                        # first structurally inconsistent command: all
                        # before it are proven (every bulk length matched
                        # the token layout); the chain past it is discarded
                        bad_arg = int(np.argmax(~valid))
                        k = int(np.searchsorted(cum, bad_arg, side="right"))
                    if k:
                        keep = int(cum[k - 1])
                        seg_off.append(base_offset
                                       + starts[ct[:k]].astype(np.int64))
                        seg_argc.append(ac[:k])
                        seg_apos.append(starts[pay[:keep]].astype(np.int64))
                        seg_alen.append(tok_len[pay[:keep]].astype(np.int64))
                        last = int(ct[k - 1] + 2 * ac[k - 1])  # last token
                        pos = int(crlf[last]) + 2
                if k == walked and walked and t >= ntok:
                    break       # all accepted; next window (or torn tail)
                # irregular frame at pos: command k failed validation, or
                # the chain stopped on a non-'*' token (pos == its start
                # either way) — exact scalar semantics for this one frame
                pos, cmd = _scalar_step(data, pos)
                if cmd is not None:
                    emit_scalar(cmd)
    except _Truncated:
        if not tolerate_truncation:
            raise ValueError(
                f"resp: truncated frame at {pos} (torn write?)") from None
    if not seg_off:
        return _empty()
    return (np.concatenate(seg_off), np.concatenate(seg_argc),
            np.concatenate(seg_apos), np.concatenate(seg_alen))


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

    The frame grammar lives ONCE in ``_scalar_step`` — this walker and
    scan_resp's fallback share it structurally, not by hand-kept lockstep.
    """
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        start = pos
        try:
            pos, cmd = _scalar_step(data, pos)
        except _Truncated:
            if tolerate_truncation:
                return out
            raise ValueError(
                f"resp: truncated frame at {start} (torn write?)") from None
        if cmd is not None:
            st, args = cmd
            out.append((base_offset + st, [data[p:p + l] for p, l in args]))
    return out
