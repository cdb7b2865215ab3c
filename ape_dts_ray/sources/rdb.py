"""Redis RDB binary codec — pure stdlib, written from the public RDB format
(redis/src/rdb.h opcodes, listpack.c / ziplist.c / intset.c layouts, LZF).

Closes the last SURVEY §2 coverage gap (the Redis family):

- ``parse_rdb``     — RedisPsyncExtractor / snapshot-file analog of the
  reference's parser tree (dt-connector/src/extractor/redis/rdb/rdb_parser.rs,
  reader/{length,string,zip_list,list_pack}.rs, entry_parser/*.rs). Handles
  the same type bytes: string(0), list(1/10/14/18), set(2/11/20),
  zset(3/5/12/17), hash(4/9/13/16/22-25 — incl. pre-2.6 zipmap, which the
  reference bails on, and the 7.4-RC pre-GA TTL variants), stream(15/19/21)
  and opcodes SELECT/EXPIRE/EXPIRE_MS/AUX/RESIZEDB/IDLE/FREQ/EOF. Unknown
  types raise (honest, like the reference's bail); module2(7) values are
  SKIP-PARSED positionally — the key is dropped with a warning row in
  ``meta["skipped_modules"]`` and the rest of the keyspace parses
  (module2_parser.rs:26-73 parity) — while module v1(6) stays a hard error
  (no framing to skip by).
- ``encode_rdb``    — writer used by the RDB sinker/fixtures so every decode
  path (int strings, LZF, intset, ziplist, listpack, quicklist2, binary
  doubles, field TTLs) is exercised against real bytes, the same
  encode-from-public-spec strategy as stages/avro.py and the PNG codec.
- ``crc64_redis``   — CRC-64/REDIS (Jones polynomial, reflected), the RDB
  trailer checksum and the DUMP/RESTORE footer checksum
  (reference table: dt-connector/src/sinker/redis/entry_rewriter.rs).

Entries are plain dicts (db, key, type, expire_ms, value/elements/fields) —
the Ray-facing exploded-row conversion lives in pipelines/redis_replay.py.
"""

from __future__ import annotations

import itertools
import struct

# ---------------------------------------------------------------- CRC-64/REDIS
# Jones polynomial 0xad93d23594c935a9, reflected, init 0, xorout 0.
# Check value: crc64(b"123456789") == 0xe9c6d914c4b8d9ca.

_CRC64_POLY_REFLECTED = 0x95AC9329AC4BC9B5


def _make_crc64_table() -> list[int]:
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (_CRC64_POLY_REFLECTED if crc & 1 else 0)
        table.append(crc)
    return table


_CRC64_TABLE = _make_crc64_table()


def crc64_redis(data: bytes, crc: int = 0) -> int:
    table = _CRC64_TABLE
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc


# -------------------------------------------------------------------- LZF
# Decoder mirrors the reference's lzf_decompress (reader/string.rs:47-80);
# the compressor is the standard greedy LZF (3-byte hash chains).

def lzf_decompress(data: bytes, out_len: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 32:                       # literal run of ctrl+1 bytes
            out += data[i:i + ctrl + 1]
            i += ctrl + 1
        else:                               # back-reference
            length = ctrl >> 5
            if length == 7:
                length += data[i]
                i += 1
            ref = len(out) - ((ctrl & 0x1F) << 8) - data[i] - 1
            i += 1
            if ref < 0:
                raise ValueError("lzf: back-reference before start")
            for _ in range(length + 2):     # may overlap: copy byte-wise
                out.append(out[ref])
                ref += 1
    if len(out) != out_len:
        raise ValueError(f"lzf: expected {out_len} bytes, got {len(out)}")
    return bytes(out)


def lzf_compress(data: bytes) -> bytes | None:
    """Greedy LZF. Returns None when compression would not shrink the input
    (the RDB writer then stores the string raw, like real Redis)."""
    n = len(data)
    out = bytearray()
    lit = bytearray()
    htab: dict[bytes, int] = {}

    def flush_literals() -> None:
        j = 0
        while j < len(lit):
            chunk = lit[j:j + 32]
            out.append(len(chunk) - 1)
            out.extend(chunk)
            j += 32
        lit.clear()

    i = 0
    while i < n:
        if i + 3 <= n:
            seq = data[i:i + 3]
            j = htab.get(seq, -1)
            htab[seq] = i
            dist = i - j - 1
            if j >= 0 and dist < 8192:
                max_len = min(n - i, 264)
                length = 3
                while length < max_len and data[j + length] == data[i + length]:
                    length += 1
                flush_literals()
                lenc = length - 2
                if lenc < 7:
                    out.append((lenc << 5) | (dist >> 8))
                else:
                    out.append((7 << 5) | (dist >> 8))
                    out.append(lenc - 7)
                out.append(dist & 0xFF)
                i += length
                continue
        lit.append(data[i])
        i += 1
    flush_literals()
    return bytes(out) if len(out) < n else None


# ------------------------------------------------------------- type bytes
RDB_TYPE_STRING = 0
RDB_TYPE_LIST = 1
RDB_TYPE_SET = 2
RDB_TYPE_ZSET = 3
RDB_TYPE_HASH = 4
RDB_TYPE_ZSET_2 = 5
RDB_TYPE_MODULE = 6        # pre-GA module format: unparseable without the module
RDB_TYPE_MODULE_2 = 7      # opcode-framed: skip-parseable positionally
RDB_TYPE_HASH_ZIPMAP = 9
RDB_TYPE_LIST_ZIPLIST = 10
RDB_TYPE_SET_INTSET = 11
RDB_TYPE_ZSET_ZIPLIST = 12
RDB_TYPE_HASH_ZIPLIST = 13
RDB_TYPE_LIST_QUICKLIST = 14
RDB_TYPE_STREAM_LISTPACKS = 15
RDB_TYPE_HASH_LISTPACK = 16
RDB_TYPE_ZSET_LISTPACK = 17
RDB_TYPE_LIST_QUICKLIST_2 = 18
RDB_TYPE_STREAM_LISTPACKS_2 = 19
RDB_TYPE_SET_LISTPACK = 20
RDB_TYPE_STREAM_LISTPACKS_3 = 21
RDB_TYPE_HASH_METADATA_PRE_GA = 22
RDB_TYPE_HASH_LISTPACK_EX_PRE_GA = 23
RDB_TYPE_HASH_METADATA = 24
RDB_TYPE_HASH_LISTPACK_EX = 25

_VALUE_TYPE_BYTES = {
    RDB_TYPE_STRING, RDB_TYPE_LIST, RDB_TYPE_SET, RDB_TYPE_ZSET,
    RDB_TYPE_HASH, RDB_TYPE_ZSET_2, RDB_TYPE_HASH_ZIPMAP,
    RDB_TYPE_LIST_ZIPLIST,
    RDB_TYPE_SET_INTSET, RDB_TYPE_ZSET_ZIPLIST, RDB_TYPE_HASH_ZIPLIST,
    RDB_TYPE_LIST_QUICKLIST, RDB_TYPE_HASH_LISTPACK, RDB_TYPE_ZSET_LISTPACK,
    RDB_TYPE_LIST_QUICKLIST_2, RDB_TYPE_SET_LISTPACK,
    RDB_TYPE_HASH_METADATA_PRE_GA, RDB_TYPE_HASH_LISTPACK_EX_PRE_GA,
    RDB_TYPE_HASH_METADATA, RDB_TYPE_HASH_LISTPACK_EX,
    RDB_TYPE_STREAM_LISTPACKS, RDB_TYPE_STREAM_LISTPACKS_2,
    RDB_TYPE_STREAM_LISTPACKS_3,
}

# opcodes (rdb_parser.rs:9-20)
OP_SLOT_INFO = 0xF4
OP_MODULE_AUX = 0xF7
OP_IDLE = 0xF8
OP_FREQ = 0xF9
OP_AUX = 0xFA
OP_RESIZEDB = 0xFB
OP_EXPIRETIME_MS = 0xFC
OP_EXPIRETIME = 0xFD
OP_SELECTDB = 0xFE
OP_EOF = 0xFF


class RdbReader:
    """Byte-cursor with the RDB primitive readers (reader/*.rs analogs)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.data[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("rdb: truncated input")
        self.pos += n
        return b

    def read_u8(self) -> int:
        return self.read(1)[0]

    # length.rs:16-70
    def read_encoded_length(self) -> tuple[int, bool]:
        first = self.read_u8()
        kind = (first & 0xC0) >> 6
        if kind == 0:                       # 6-bit
            return first & 0x3F, False
        if kind == 1:                       # 14-bit
            return ((first & 0x3F) << 8) | self.read_u8(), False
        if kind == 2:
            if first == 0x80:               # 32-bit BE
                return struct.unpack(">I", self.read(4))[0], False
            if first == 0x81:               # 64-bit BE
                return struct.unpack(">Q", self.read(8))[0], False
            raise ValueError(f"rdb: illegal length byte {first:#x}")
        return first & 0x3F, True           # special string encoding

    def read_length(self) -> int:
        n, special = self.read_encoded_length()
        if special:
            raise ValueError("rdb: unexpected special length")
        return n

    # string.rs:14-44
    def read_string(self) -> bytes:
        n, special = self.read_encoded_length()
        if not special:
            return self.read(n)
        if n == 0:                          # int8
            return b"%d" % struct.unpack("<b", self.read(1))[0]
        if n == 1:                          # int16
            return b"%d" % struct.unpack("<h", self.read(2))[0]
        if n == 2:                          # int32
            return b"%d" % struct.unpack("<i", self.read(4))[0]
        if n == 3:                          # LZF
            clen = self.read_length()
            ulen = self.read_length()
            return lzf_decompress(self.read(clen), ulen)
        raise ValueError(f"rdb: unknown string encoding {n}")

    # float.rs: len-prefixed ASCII double (legacy zset scores)
    def read_float(self) -> float:
        n = self.read_u8()
        if n == 253:
            return float("nan")
        if n == 254:
            return float("inf")
        if n == 255:
            return float("-inf")
        return float(self.read(n).decode("ascii"))

    def read_double(self) -> float:
        return struct.unpack("<d", self.read(8))[0]

    # ---- packed containers (each stored as one RDB string) ----

    def read_intset(self) -> list[bytes]:
        buf = self.read_string()
        enc, size = struct.unpack_from("<II", buf, 0)
        fmt = {2: "<h", 4: "<i", 8: "<q"}.get(enc)
        if fmt is None:
            raise ValueError(f"rdb: intset encoding {enc}")
        return [b"%d" % struct.unpack_from(fmt, buf, 8 + i * enc)[0]
                for i in range(size)]

    def read_ziplist(self) -> list[bytes]:
        buf = self.read_string()
        pos = 8                               # skip zlbytes, zltail
        size = struct.unpack_from("<H", buf, pos)[0]
        pos += 2
        out: list[bytes] = []
        while True:
            if size != 65535 and len(out) == size:
                if buf[pos] != 0xFF:
                    raise ValueError("rdb: ziplist missing 0xFF terminator")
                break
            prev = buf[pos]
            if size == 65535 and prev == 0xFF:
                break
            pos += 5 if prev == 0xFE else 1   # prevlen
            enc = buf[pos]
            pos += 1
            kind = (enc & 0xC0) >> 6
            if kind == 0:                     # 6-bit str
                ln = enc & 0x3F
                out.append(buf[pos:pos + ln]); pos += ln
            elif kind == 1:                   # 14-bit str
                ln = ((enc & 0x3F) << 8) | buf[pos]
                pos += 1
                out.append(buf[pos:pos + ln]); pos += ln
            elif enc == 0x80:                 # 32-bit str (len BE)
                ln = struct.unpack_from(">I", buf, pos)[0]
                pos += 4
                out.append(buf[pos:pos + ln]); pos += ln
            elif enc == 0xC0:
                out.append(b"%d" % struct.unpack_from("<h", buf, pos)[0]); pos += 2
            elif enc == 0xD0:
                out.append(b"%d" % struct.unpack_from("<i", buf, pos)[0]); pos += 4
            elif enc == 0xE0:
                out.append(b"%d" % struct.unpack_from("<q", buf, pos)[0]); pos += 8
            elif enc == 0xF0:                 # 24-bit LE signed
                v = int.from_bytes(buf[pos:pos + 3], "little", signed=True)
                out.append(b"%d" % v); pos += 3
            elif enc == 0xFE:
                out.append(b"%d" % struct.unpack_from("<b", buf, pos)[0]); pos += 1
            elif (enc >> 4) == 0x0F and enc != 0xFF:   # 4-bit immediate
                out.append(b"%d" % ((enc & 0x0F) - 1))
            else:
                raise ValueError(f"rdb: ziplist encoding {enc:#x}")
        return out

    def read_zipmap(self) -> list[tuple[bytes, bytes]]:
        """Pre-2.6 hash encoding (redis src/zipmap.c — the format the
        reference bails on, hash_parser.rs:53-60; decoded here from the
        public layout): ``<zmlen> (<klen> key <vlen> <free> value+free)*
        0xFF``. A length byte < 254 is the length itself; 254 prefixes a
        4-byte LE u32; 255 marks the end (key position only). zmlen < 254
        is the pair count, otherwise it's unknown and we traverse."""
        buf = self.read_string()
        pos = 1                               # skip zmlen (traversal-driven)
        out: list[tuple[bytes, bytes]] = []

        def declen(p: int) -> tuple[int, int]:
            b0 = buf[p]
            if b0 < 254:
                return b0, p + 1
            return struct.unpack_from("<I", buf, p + 1)[0], p + 5

        while True:
            if pos >= len(buf):
                raise ValueError("rdb: zipmap missing 0xFF terminator")
            if buf[pos] == 0xFF:
                break
            klen, pos = declen(pos)
            key = buf[pos:pos + klen]; pos += klen
            vlen, pos = declen(pos)
            free = buf[pos]; pos += 1
            out.append((key, buf[pos:pos + vlen]))
            pos += vlen + free
        return out

    def read_listpack(self) -> list[bytes]:
        buf = self.read_string()
        size = struct.unpack_from("<H", buf, 4)[0]   # skip total-bytes u32
        if size == 65535:
            # listpack.c: 65535 means "count unknown, scan to 0xFF" — our
            # writers never emit packs that large (nodes are chunked)
            raise ValueError("rdb: listpack with unknown element count")
        pos = 6
        out: list[bytes] = []
        for _ in range(size):
            first = buf[pos]
            if (first & 0x80) == 0:                   # 7-bit uint
                out.append(b"%d" % (first & 0x7F)); entry = 1
            elif (first & 0xC0) == 0x80:              # 6-bit str
                ln = first & 0x3F
                out.append(buf[pos + 1:pos + 1 + ln]); entry = 1 + ln
            elif (first & 0xE0) == 0xC0:              # 13-bit int
                uval = ((first & 0x1F) << 8) | buf[pos + 1]
                out.append(b"%d" % (uval - 8192 if uval >= 4096 else uval))
                entry = 2
            elif first == 0xF1:
                out.append(b"%d" % struct.unpack_from("<h", buf, pos + 1)[0]); entry = 3
            elif first == 0xF2:
                v = int.from_bytes(buf[pos + 1:pos + 4], "little", signed=True)
                out.append(b"%d" % v); entry = 4
            elif first == 0xF3:
                out.append(b"%d" % struct.unpack_from("<i", buf, pos + 1)[0]); entry = 5
            elif first == 0xF4:
                out.append(b"%d" % struct.unpack_from("<q", buf, pos + 1)[0]); entry = 9
            elif (first & 0xF0) == 0xE0:              # 12-bit str
                ln = ((first & 0x0F) << 8) | buf[pos + 1]
                out.append(buf[pos + 2:pos + 2 + ln]); entry = 2 + ln
            elif first == 0xF0:                       # 32-bit str
                ln = struct.unpack_from("<I", buf, pos + 1)[0]
                out.append(buf[pos + 5:pos + 5 + ln]); entry = 5 + ln
            else:
                raise ValueError(f"rdb: listpack encoding {first:#x}")
            pos += entry + _backlen_size(entry)
        if buf[pos] != 0xFF:
            raise ValueError("rdb: listpack missing 0xFF terminator")
        return out


def _backlen_size(entry_len: int) -> int:
    if entry_len <= 127:
        return 1
    if entry_len < 16384:
        return 2
    if entry_len < 1 << 21:
        return 3
    if entry_len < 1 << 28:
        return 4
    return 5


# ---------------------------------------------------------------- parse

def parse_rdb(data: bytes, verify_checksum: bool = True):
    """Parse a full RDB image → (meta, entries).

    meta: {"version": str, "aux": {k: v}}. entries: list of dicts
    {"db", "key", "type", "expire_ms", and "value" (string) / "elements"
    (list, set) / "fields" ([(field, value)] or [(field, value, ttl_ms)]
    for TTL hashes) / "zset" ([(member, score)])}.
    """
    r = RdbReader(data)
    if r.read(5) != b"REDIS":
        raise ValueError("rdb: bad magic")
    version = r.read(4).decode("ascii")
    meta = {"version": version, "aux": {}}
    entries: list[dict] = []
    db = 0
    expire_ms = 0
    freq = -1
    while True:
        tb = r.read_u8()
        if tb == OP_EOF:
            if version >= "0005":
                if r.pos + 8 > len(data):
                    # a file cut INSIDE the 8-byte CRC footer still has its
                    # EOF opcode — silently skipping verification here would
                    # pass exactly the torn write verify_checksum exists to
                    # catch (one byte earlier raises 'truncated input')
                    if verify_checksum:
                        raise ValueError(
                            "rdb: truncated CRC-64 footer (file cut inside "
                            "the checksum)")
                else:
                    (stored,) = struct.unpack_from("<Q", data, r.pos)
                    if verify_checksum and stored != 0:
                        if crc64_redis(data[:r.pos]) != stored:
                            raise ValueError("rdb: CRC-64 checksum mismatch")
            break
        if tb == OP_SELECTDB:
            db = r.read_length(); continue
        if tb == OP_RESIZEDB:
            r.read_length(); r.read_length(); continue
        if tb == OP_AUX:
            k = r.read_string(); v = r.read_string()
            meta["aux"][k.decode("utf-8", "replace")] = v.decode("utf-8", "replace")
            continue
        if tb == OP_EXPIRETIME_MS:
            expire_ms = struct.unpack("<Q", r.read(8))[0]; continue
        if tb == OP_EXPIRETIME:
            expire_ms = struct.unpack("<I", r.read(4))[0] * 1000; continue
        if tb == OP_IDLE:
            r.read_length(); continue
        if tb == OP_FREQ:
            # LFU access frequency (rdb_parser.rs:107-110) — carried on the
            # entry so hot-key statistics can filter on it (the reference's
            # RedisStatisticSinker HotKey mode)
            freq = r.read_u8(); continue
        if tb == OP_SLOT_INFO:
            r.read_length(); r.read_length(); r.read_length(); continue
        if tb == OP_MODULE_AUX:
            # keyspace-free module data (rdb.c RDB_OPCODE_MODULE_AUX:
            # moduleid, when_opcode, when, then the same opcode stream as a
            # MODULE_2 value) — skip-parse it like module2 values so a
            # snapshot from a server with aux-saving modules (RediSearch et
            # al.) parses the REST of the keyspace instead of aborting on
            # 'unsupported type byte 247'
            module_id = r.read_length()
            r.read_length()                  # when_opcode
            r.read_length()                  # when
            _skip_module_opcodes(r)
            meta.setdefault("skipped_modules", []).append(
                {"db": db, "key": None,
                 "module": module_type_name(module_id), "aux": True})
            continue
        if tb == RDB_TYPE_MODULE:
            # v1 module values carry no framing — without the module itself
            # the stream position is lost, so this stays a hard error
            # (module2_parser.rs:19-25 bails identically)
            raise ValueError("rdb: module type v1 (type byte 6) is "
                             "unparseable without the module")
        if tb == RDB_TYPE_MODULE_2:
            # skip-parse parity (module2_parser.rs:26-73): consume the
            # opcode stream positionally, DROP the key with a warning row in
            # meta, and keep parsing — one module key must not abort the
            # rest of the keyspace
            key = r.read_string()
            name = _skip_module2(r)
            meta.setdefault("skipped_modules", []).append(
                {"db": db, "key": key, "module": name})
            expire_ms = 0
            freq = -1
            continue
        if tb not in _VALUE_TYPE_BYTES:
            raise ValueError(f"rdb: unsupported type byte {tb}")
        key = r.read_string()
        entry = {"db": db, "key": key, "expire_ms": expire_ms}
        if freq >= 0:
            entry["freq"] = freq
        expire_ms = 0
        freq = -1
        _parse_value(r, tb, entry)
        entries.append(entry)
    return meta, entries


_MODULE_NAME_CHARSET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_")


def module_type_name(module_id: int) -> str:
    """9-char module type name from the 64-bit module id: the id's top 54
    bits (above the 10-bit encoding version) are nine 6-bit indexes into
    the charset (module2_parser.rs:35-46)."""
    mid = module_id >> 10
    chars = [""] * 9
    for i in range(8, -1, -1):
        chars[i] = _MODULE_NAME_CHARSET[mid & 63]
        mid >>= 6
    return "".join(chars)


def _skip_module_opcodes(r: "RdbReader") -> None:
    """Consume a module opcode stream without interpreting it: EOF=0
    terminates; 1|2 = length-encoded int, 3 = 4-byte binary float
    (rdbLoadBinaryFloatValue — NOT the len-prefixed ASCII float the
    reference's module2_parser.rs:55 wrongly assumes; redis rdb.c is
    normative), 4 = 8-byte binary double, 5 = string."""
    opcode = r.read_length()
    while opcode != 0:
        if opcode in (1, 2):
            r.read_length()
        elif opcode == 3:
            r.read(4)
        elif opcode == 4:
            r.read_double()
        elif opcode == 5:
            r.read_string()
        else:
            raise ValueError(f"rdb: unknown module opcode {opcode}")
        opcode = r.read_length()


def _skip_module2(r: "RdbReader") -> str:
    """Consume a MODULE_2 value positionally (module2_parser.rs:48-73
    semantics, binary-float corrected). Returns the decoded module type
    name for the warning row."""
    module_id = r.read_length()
    _skip_module_opcodes(r)
    return module_type_name(module_id)


def _pairs(flat: list[bytes]) -> list[tuple[bytes, bytes]]:
    if len(flat) % 2:
        raise ValueError("rdb: odd pair-list length")
    return [(flat[i], flat[i + 1]) for i in range(0, len(flat), 2)]


def _parse_value(r: RdbReader, tb: int, entry: dict) -> None:
    if tb == RDB_TYPE_STRING:
        entry["type"] = "string"
        entry["value"] = r.read_string()
    elif tb in (RDB_TYPE_LIST, RDB_TYPE_LIST_ZIPLIST, RDB_TYPE_LIST_QUICKLIST,
                RDB_TYPE_LIST_QUICKLIST_2):
        entry["type"] = "list"
        if tb == RDB_TYPE_LIST:
            entry["elements"] = [r.read_string() for _ in range(r.read_length())]
        elif tb == RDB_TYPE_LIST_ZIPLIST:
            entry["elements"] = r.read_ziplist()
        elif tb == RDB_TYPE_LIST_QUICKLIST:
            els: list[bytes] = []
            for _ in range(r.read_length()):
                els.extend(r.read_ziplist())
            entry["elements"] = els
        else:                                # quicklist2: container per node
            els = []
            for _ in range(r.read_length()):
                container = r.read_length()
                if container == 1:           # PLAIN
                    els.append(r.read_string())
                elif container == 2:         # PACKED listpack
                    els.extend(r.read_listpack())
                else:
                    raise ValueError(f"rdb: quicklist container {container}")
            entry["elements"] = els
    elif tb in (RDB_TYPE_SET, RDB_TYPE_SET_INTSET, RDB_TYPE_SET_LISTPACK):
        entry["type"] = "set"
        if tb == RDB_TYPE_SET:
            entry["elements"] = [r.read_string() for _ in range(r.read_length())]
        elif tb == RDB_TYPE_SET_INTSET:
            entry["elements"] = r.read_intset()
        else:
            entry["elements"] = r.read_listpack()
    elif tb in (RDB_TYPE_ZSET, RDB_TYPE_ZSET_2, RDB_TYPE_ZSET_ZIPLIST,
                RDB_TYPE_ZSET_LISTPACK):
        entry["type"] = "zset"
        if tb in (RDB_TYPE_ZSET, RDB_TYPE_ZSET_2):
            out = []
            for _ in range(r.read_length()):
                member = r.read_string()
                score = r.read_double() if tb == RDB_TYPE_ZSET_2 else r.read_float()
                out.append((member, score))
            entry["zset"] = out
        else:
            flat = (r.read_ziplist() if tb == RDB_TYPE_ZSET_ZIPLIST
                    else r.read_listpack())
            entry["zset"] = [(m, float(s)) for m, s in _pairs(flat)]
    elif tb in (RDB_TYPE_HASH, RDB_TYPE_HASH_ZIPMAP, RDB_TYPE_HASH_ZIPLIST,
                RDB_TYPE_HASH_LISTPACK,
                RDB_TYPE_HASH_METADATA_PRE_GA, RDB_TYPE_HASH_METADATA,
                RDB_TYPE_HASH_LISTPACK_EX_PRE_GA, RDB_TYPE_HASH_LISTPACK_EX):
        entry["type"] = "hash"
        if tb == RDB_TYPE_HASH:
            entry["fields"] = [(r.read_string(), r.read_string())
                               for _ in range(r.read_length())]
        elif tb == RDB_TYPE_HASH_ZIPMAP:
            entry["fields"] = r.read_zipmap()
        elif tb == RDB_TYPE_HASH_ZIPLIST:
            entry["fields"] = _pairs(r.read_ziplist())
        elif tb == RDB_TYPE_HASH_LISTPACK:
            entry["fields"] = _pairs(r.read_listpack())
        elif tb in (RDB_TYPE_HASH_METADATA, RDB_TYPE_HASH_METADATA_PRE_GA):
            # GA layout (redis src/rdb.c): minExpire u64, len, then per field
            # relative-ttl (length-encoded; 0 = none, else abs = min + rel - 1),
            # field, value. PRE_GA (7.4-RC, type 22): no minExpire header and
            # the per-field length-encoded ttl is already absolute. (The
            # reference inverts which variant carries the header,
            # hash_parser.rs:90-117 — redis rdb.c is normative here.)
            if tb == RDB_TYPE_HASH_METADATA:
                min_expire = struct.unpack("<Q", r.read(8))[0]
            out = []
            for _ in range(r.read_length()):
                ttl = r.read_length()
                f = r.read_string()
                v = r.read_string()
                if tb == RDB_TYPE_HASH_METADATA and ttl:
                    ttl = min_expire + ttl - 1
                out.append((f, v, ttl))
            entry["fields"] = out
        else:                                 # HASH_LISTPACK_EX[_PRE_GA]
            if tb == RDB_TYPE_HASH_LISTPACK_EX:
                r.read(8)                     # minExpire (absolute ttls follow)
            flat = r.read_listpack()
            if len(flat) % 3:
                raise ValueError("rdb: listpack_ex length not multiple of 3")
            entry["fields"] = [(flat[i], flat[i + 1], int(flat[i + 2]))
                               for i in range(0, len(flat), 3)]
    elif tb in (RDB_TYPE_STREAM_LISTPACKS, RDB_TYPE_STREAM_LISTPACKS_2,
                RDB_TYPE_STREAM_LISTPACKS_3):
        _parse_stream(r, tb, entry)
    else:  # pragma: no cover - guarded by _VALUE_TYPE_BYTES
        raise ValueError(f"rdb: type byte {tb}")


def _parse_stream(r: RdbReader, tb: int, entry: dict) -> None:
    """Stream layout (redis src/rdb.c rdbLoadObject RDB_TYPE_STREAM_*;
    reference analog stream_parser.rs:13-205): rax of (master-id → listpack
    of [count, deleted, num-master-fields, master-fields..., "0", then per
    entry: flags, ms-delta, seq-delta, values-or-explicit-pairs, lp_count]),
    then stream length, last id, (v2+: first id, max-deleted id,
    entries-added), consumer groups with PELs. We materialize the live
    entries and group names; PEL bookkeeping is consumed and dropped (the
    reference turns it into XCLAIM commands; our sink re-derives ids)."""
    entries: list[tuple[bytes, list[tuple[bytes, bytes]]]] = []
    for _ in range(r.read_length()):
        master = r.read_string()
        mms = int.from_bytes(master[:8], "big")
        mseq = int.from_bytes(master[8:], "big")
        els = r.read_listpack()
        count, deleted, nf = int(els[0]), int(els[1]), int(els[2])
        fields = els[3:3 + nf]
        i = 3 + nf
        if els[i] != b"0":
            raise ValueError("rdb: stream master block not 0-terminated")
        i += 1
        while count or deleted:
            flags, ems, eseq = int(els[i]), int(els[i + 1]), int(els[i + 2])
            i += 3
            eid = b"%d-%d" % (ems + mms, eseq + mseq)
            if flags & 2:                    # SAMEFIELDS as master
                fvs = list(zip(fields, els[i:i + nf]))
                i += nf
                want_lp = 3 + nf
            else:
                num = int(els[i]); i += 1
                fvs = [(els[i + 2 * k], els[i + 2 * k + 1]) for k in range(num)]
                i += 2 * num
                want_lp = 4 + 2 * num
            # lp_count is redis's reverse-iteration jump distance (elements
            # per record EXCLUDING this one, t_stream.c) — validate instead
            # of skipping blind, so a miscounting writer (ours included, the
            # pre-fix encoder was one too high) can't ship records a real
            # Redis would misparse backwards
            if int(els[i]) != want_lp:
                raise ValueError(
                    f"rdb: stream record lp_count {int(els[i])} != "
                    f"{want_lp} for entry {eid!r}")
            i += 1
            if flags & 1:                    # deleted tombstone
                deleted -= 1
            else:
                count -= 1
                entries.append((eid, fvs))
    r.read_length()                          # stream length
    entry["type"] = "stream"
    entry["entries"] = entries
    entry["last_id"] = b"%d-%d" % (r.read_length(), r.read_length())
    if tb >= RDB_TYPE_STREAM_LISTPACKS_2:
        r.read_length(); r.read_length()     # first id
        r.read_length(); r.read_length()     # max-deleted id
        r.read_length()                      # entries-added
    groups = []
    for _ in range(r.read_length()):
        gname = r.read_string()
        gid = b"%d-%d" % (r.read_length(), r.read_length())
        if tb >= RDB_TYPE_STREAM_LISTPACKS_2:
            r.read_length()                  # group entries-read offset
        for _ in range(r.read_length()):     # global PEL
            r.read(16)                       # id (BE ms+seq)
            r.read(8)                        # delivery time
            r.read_length()                  # delivery count
        for _ in range(r.read_length()):     # consumers
            r.read_string()
            r.read(8)                        # seen time
            if tb >= RDB_TYPE_STREAM_LISTPACKS_3:
                r.read(8)                    # active time
            for _ in range(r.read_length()):
                r.read(16)                   # consumer PEL id
        groups.append((gname, gid))
    entry["groups"] = groups


# ---------------------------------------------------------------- encode

def _canonical_int(b: bytes) -> int | None:
    """The integer i iff b is its canonical ASCII form (what Redis would
    int-encode); None otherwise."""
    try:
        i = int(b)
    except ValueError:
        return None
    return i if b == b"%d" % i and -(1 << 63) <= i < (1 << 63) else None


def write_length(out: bytearray, n: int) -> None:
    if n <= 0x3F:
        out.append(n)
    elif n <= 0x3FFF:
        out.append(0x40 | (n >> 8)); out.append(n & 0xFF)
    elif n <= 0xFFFFFFFF:
        out.append(0x80); out += struct.pack(">I", n)
    else:
        out.append(0x81); out += struct.pack(">Q", n)


def write_string(out: bytearray, b: bytes, try_int: bool = True,
                 lzf_sample: int = 1) -> None:
    """``lzf_sample``: 0 = never compress; k = attempt LZF only on strings
    whose length is a multiple of k. The pure-Python compressor is this
    codec's one hot loop, so bulk sinks sample it deterministically (the
    unit tests run k=1, i.e. always, like redis rdbcompression)."""
    if try_int:
        i = _canonical_int(b)
        if i is not None and -(1 << 31) <= i < (1 << 31):
            if -128 <= i < 128:
                out.append(0xC0); out += struct.pack("<b", i)
            elif -32768 <= i < 32768:
                out.append(0xC1); out += struct.pack("<h", i)
            else:
                out.append(0xC2); out += struct.pack("<i", i)
            return
    if lzf_sample and len(b) > 20 and len(b) % lzf_sample == 0:
        comp = lzf_compress(b)
        if comp is not None:
            out.append(0xC3)
            write_length(out, len(comp))
            write_length(out, len(b))
            out += comp
            return
    write_length(out, len(b))
    out += b


def _encode_backlen(entry_len: int) -> bytes:
    # listpack.c lpEncodeBacklen: 7 bits per byte, continuation on all but
    # the first, laid out so it parses right-to-left.
    if entry_len <= 127:
        return bytes([entry_len])
    chunks = []
    v = entry_len
    while v > 0:
        chunks.append(v & 0x7F)
        v >>= 7
    chunks.reverse()                         # most-significant first
    return bytes([chunks[0]] + [c | 0x80 for c in chunks[1:]])


def encode_listpack(elements: list[bytes]) -> bytes:
    body = bytearray()
    for el in elements:
        i = _canonical_int(el)
        ent = bytearray()
        if i is not None:
            if 0 <= i <= 127:
                ent.append(i)
            elif -4096 <= i <= 4095:
                u = i & 0x1FFF
                ent.append(0xC0 | (u >> 8)); ent.append(u & 0xFF)
            elif -32768 <= i < 32768:
                ent.append(0xF1); ent += struct.pack("<h", i)
            elif -(1 << 23) <= i < (1 << 23):
                ent.append(0xF2); ent += i.to_bytes(3, "little", signed=True)
            elif -(1 << 31) <= i < (1 << 31):
                ent.append(0xF3); ent += struct.pack("<i", i)
            else:
                ent.append(0xF4); ent += struct.pack("<q", i)
        elif len(el) < 64:
            ent.append(0x80 | len(el)); ent += el
        elif len(el) < 4096:
            ent.append(0xE0 | (len(el) >> 8)); ent.append(len(el) & 0xFF)
            ent += el
        else:
            ent.append(0xF0); ent += struct.pack("<I", len(el)); ent += el
        body += ent
        body += _encode_backlen(len(ent))
    if len(elements) > 65534:
        raise ValueError("rdb: listpack limited to 65534 elements — chunk "
                         "into multiple nodes (quicklist / stream rax)")
    total = 4 + 2 + len(body) + 1
    return struct.pack("<IH", total, len(elements)) + bytes(body) + b"\xff"


def encode_ziplist(elements: list[bytes]) -> bytes:
    body = bytearray()
    prev_len = 0
    tail_off = 0
    for idx, el in enumerate(elements):
        if idx == len(elements) - 1:
            tail_off = 10 + len(body)
        ent = bytearray()
        if prev_len < 254:
            ent.append(prev_len)
        else:
            ent.append(0xFE); ent += struct.pack("<I", prev_len)
        i = _canonical_int(el)
        if i is not None:
            if 0 <= i <= 12:
                ent.append(0xF0 | (i + 1))
            elif -128 <= i < 128:
                ent.append(0xFE); ent += struct.pack("<b", i)
            elif -32768 <= i < 32768:
                ent.append(0xC0); ent += struct.pack("<h", i)
            elif -(1 << 23) <= i < (1 << 23):
                ent.append(0xF0); ent += i.to_bytes(3, "little", signed=True)
            elif -(1 << 31) <= i < (1 << 31):
                ent.append(0xD0); ent += struct.pack("<i", i)
            else:
                ent.append(0xE0); ent += struct.pack("<q", i)
        elif len(el) < 64:
            ent.append(len(el)); ent += el
        elif len(el) < 16384:
            ent.append(0x40 | (len(el) >> 8)); ent.append(len(el) & 0xFF)
            ent += el
        else:
            ent.append(0x80); ent += struct.pack(">I", len(el)); ent += el
        body += ent
        prev_len = len(ent)
    head = struct.pack("<IIH", 10 + len(body) + 1, tail_off,
                       min(len(elements), 65535))
    return head + bytes(body) + b"\xff"


def encode_intset(ints: list[int]) -> bytes:
    width = 2
    for i in ints:
        if not -32768 <= i < 32768:
            width = max(width, 4)
        if not -(1 << 31) <= i < (1 << 31):
            width = 8
    fmt = {2: "<h", 4: "<i", 8: "<q"}[width]
    out = bytearray(struct.pack("<II", width, len(ints)))
    for i in sorted(ints):                   # intsets are sorted in redis
        out += struct.pack(fmt, i)
    return bytes(out)


def encode_rdb(entries: list[dict], version: int = 11,
               aux: dict[str, str] | None = None,
               packed_threshold: int = 128, lzf_sample: int = 1) -> bytes:
    """Write an RDB image. Per-entry dicts as produced by parse_rdb; encoding
    is chosen per value (packed listpack/ziplist/intset below
    ``packed_threshold`` elements, plain above — same policy shape as redis
    *-max-listpack-entries). ``entry["encoding"]`` forces one of
    {"plain", "ziplist", "listpack", "intset", "quicklist", "zset2", "zset"}.
    """
    out = bytearray(b"REDIS%04d" % version)
    for k, v in (aux or {"redis-ver": "7.4.0", "redis-bits": "64"}).items():
        out.append(OP_AUX)
        write_string(out, k.encode())
        write_string(out, v.encode())
    cur_db = None
    for e in sorted(entries, key=lambda e: e.get("db", 0)):
        db = e.get("db", 0)
        if db != cur_db:
            out.append(OP_SELECTDB)
            write_length(out, db)
            cur_db = db
        if e.get("expire_ms"):
            out.append(OP_EXPIRETIME_MS)
            out += struct.pack("<Q", e["expire_ms"])
        freq = int(e.get("freq", -1))
        if freq >= 0:                       # LFU frequency prefix (0xF9)
            if freq > 255:
                raise ValueError(f"rdb: LFU freq {freq} out of the u8 "
                                 "range (0-255)")
            out.append(OP_FREQ)
            out.append(freq)
        _encode_value(out, e, packed_threshold, lzf_sample)
    out.append(OP_EOF)
    out += struct.pack("<Q", crc64_redis(bytes(out)))
    return bytes(out)


def encode_rdb_strings(keys, values, freqs=None, db: int = 0,
                       version: int = 11, aux: dict[str, str] | None = None,
                       lzf_sample: int = 1) -> bytes:
    """Columnar fast path for the all-string, single-db keyspace shape the
    statistic fixtures produce (key/value columns plus an optional LFU-freq
    column). Byte-identical to ``encode_rdb`` over the equivalent per-entry
    dicts (property-tested in test_redis.py) — it skips building one dict
    per entry and the per-entry type dispatch, which is all the generic
    path spends on this shape. ``freqs``: per-key LFU u8, negative = no
    0xF9 prefix for that key; expirations aren't part of this shape (use
    ``encode_rdb``)."""
    out = bytearray(b"REDIS%04d" % version)
    for k, v in (aux or {"redis-ver": "7.4.0", "redis-bits": "64"}).items():
        out.append(OP_AUX)
        write_string(out, k.encode())
        write_string(out, v.encode())
    out.append(OP_SELECTDB)
    write_length(out, db)
    if len(values) != len(keys) or (freqs is not None
                                    and len(freqs) != len(keys)):
        # a bare zip would silently truncate the shard to the shortest
        # column — a checksum-valid image missing keys, the worst failure
        raise ValueError(
            f"rdb: column length mismatch (keys={len(keys)} "
            f"values={len(values)}"
            + (f" freqs={len(freqs)})" if freqs is not None else ")"))
    if freqs is None:
        freqs = itertools.repeat(-1)
    for key, val, f in zip(keys, values, freqs):
        f = int(f)
        if f >= 0:                          # LFU frequency prefix (0xF9)
            if f > 255:
                raise ValueError(f"rdb: LFU freq {f} out of the u8 "
                                 "range (0-255)")
            out.append(OP_FREQ)
            out.append(f)
        out.append(RDB_TYPE_STRING)
        write_string(out, key, try_int=False, lzf_sample=lzf_sample)
        write_string(out, val, lzf_sample=lzf_sample)
    out.append(OP_EOF)
    out += struct.pack("<Q", crc64_redis(bytes(out)))
    return bytes(out)


def _encode_value(out: bytearray, e: dict, packed_threshold: int,
                  lzf_sample: int = 1) -> None:
    def wstr(b: bytes, try_int: bool = True) -> None:
        write_string(out, b, try_int=try_int, lzf_sample=lzf_sample)

    t = e["type"]
    enc = e.get("encoding")
    key = e["key"]

    def header(tb: int) -> None:
        out.append(tb)
        wstr(key, try_int=False)

    if t == "string":
        header(RDB_TYPE_STRING)
        wstr(e["value"])
    elif t == "list":
        els = e["elements"]
        small = len(els) <= packed_threshold
        if enc == "ziplist":
            header(RDB_TYPE_LIST_ZIPLIST)
            wstr(encode_ziplist(els), try_int=False)
        elif enc == "plain":
            header(RDB_TYPE_LIST)
            write_length(out, len(els))
            for el in els:
                wstr(el)
        else:                               # quicklist2, the modern default
            header(RDB_TYPE_LIST_QUICKLIST_2)
            nodes = [els] if small else [els[i:i + packed_threshold]
                                         for i in range(0, len(els), packed_threshold)]
            write_length(out, len(nodes))
            for node in nodes:
                write_length(out, 2)        # PACKED
                wstr(encode_listpack(node), try_int=False)
    elif t == "set":
        els = e["elements"]
        ints = [_canonical_int(x) for x in els]
        if enc == "intset" or (enc is None and els and all(i is not None for i in ints)
                               and len(els) <= packed_threshold):
            if any(i is None for i in ints):
                # forced intset with non-integer members would silently
                # drop them — refuse (real redis would have OBJ_ENCODING_HT)
                bad = next(x for x, i in zip(els, ints) if i is None)
                raise ValueError(
                    f"rdb: intset encoding forced but member {bad!r} "
                    "is not a 16/32/64-bit integer")
            header(RDB_TYPE_SET_INTSET)
            wstr(encode_intset([i for i in ints if i is not None]),
                 try_int=False)
        elif enc == "listpack" or (enc is None and len(els) <= packed_threshold):
            header(RDB_TYPE_SET_LISTPACK)
            wstr(encode_listpack(els), try_int=False)
        else:
            header(RDB_TYPE_SET)
            write_length(out, len(els))
            for el in els:
                wstr(el)
    elif t == "zset":
        pairs = e["zset"]
        flat = []
        for m, s in pairs:
            flat += [m, _format_score(s)]
        if enc == "ziplist":
            header(RDB_TYPE_ZSET_ZIPLIST)
            wstr(encode_ziplist(flat), try_int=False)
        elif enc == "zset":                 # legacy ASCII-float scores
            header(RDB_TYPE_ZSET)
            write_length(out, len(pairs))
            for m, s in pairs:
                wstr(m)
                _write_ascii_float(out, s)
        elif enc == "zset2" or (enc is None and len(pairs) > packed_threshold):
            header(RDB_TYPE_ZSET_2)
            write_length(out, len(pairs))
            for m, s in pairs:
                wstr(m)
                out += struct.pack("<d", s)
        else:
            header(RDB_TYPE_ZSET_LISTPACK)
            wstr(encode_listpack(flat), try_int=False)
    elif t == "hash":
        fields = e["fields"]
        has_ttl = any(len(f) == 3 and f[2] for f in fields)
        if has_ttl or enc in ("metadata", "listpack_ex"):
            norm = [(f[0], f[1], f[2] if len(f) == 3 else 0) for f in fields]
            ttls = [t3 for _, _, t3 in norm if t3]
            min_exp = min(ttls) if ttls else 0
            if enc == "metadata" or len(fields) > packed_threshold:
                header(RDB_TYPE_HASH_METADATA)
                out += struct.pack("<Q", min_exp)
                write_length(out, len(norm))
                for f, v, t3 in norm:
                    write_length(out, t3 - min_exp + 1 if t3 else 0)
                    wstr(f)
                    wstr(v)
            else:
                header(RDB_TYPE_HASH_LISTPACK_EX)
                out += struct.pack("<Q", min_exp)
                flat = []
                for f, v, t3 in norm:
                    flat += [f, v, b"%d" % t3]
                wstr(encode_listpack(flat), try_int=False)
        elif enc == "ziplist":
            header(RDB_TYPE_HASH_ZIPLIST)
            flat = [x for fv in fields for x in fv[:2]]
            wstr(encode_ziplist(flat), try_int=False)
        elif enc == "plain" or len(fields) > packed_threshold:
            header(RDB_TYPE_HASH)
            write_length(out, len(fields))
            for fv in fields:
                wstr(fv[0])
                wstr(fv[1])
        else:
            header(RDB_TYPE_HASH_LISTPACK)
            flat = [x for fv in fields for x in fv[:2]]
            wstr(encode_listpack(flat), try_int=False)
    elif t == "stream":
        header(RDB_TYPE_STREAM_LISTPACKS_2)
        _encode_stream(out, e, wstr)
    else:
        raise ValueError(f"rdb: entry type {t}")


def _parse_id(eid: bytes) -> tuple[int, int]:
    ms, _, seq = eid.partition(b"-")
    return int(ms), int(seq or b"0")


def _encode_stream(out: bytearray, e: dict, wstr) -> None:
    """One listpack holding every live entry (entries must be id-sorted, as
    XADD guarantees); master id = first entry, SAMEFIELDS when an entry's
    field names match the master's. Groups written with empty PELs."""
    entries = e.get("entries", [])
    if entries:
        ids = [_parse_id(i) for i, _ in entries]
        if ids != sorted(ids):
            raise ValueError("rdb: stream entries must be id-ordered")
        # chunk into listpack nodes (redis caps nodes via
        # stream-node-max-entries, default 100) — one giant listpack would
        # overflow its u16 element count past ~6k entries. The entry cap
        # alone is NOT enough: each entry contributes up to 2·nf+5
        # elements, so 100 wide entries (~330 fields) would still blow the
        # 65534-element listpack limit — bound the ELEMENT budget too.
        NODE = 100
        LP_MAX = 65000
        pairs = list(zip(ids, entries))   # hoisted: rebuilding the zip per
        chunks, cur, budget = [], [], 0   # chunk was O(n²/NODE) on big
        for item in pairs:                # streams
            nf = len(item[1][1])
            cost = 2 * nf + 5             # non-SAMEFIELDS upper bound
            if cur and (len(cur) >= NODE or budget + cost > LP_MAX):
                chunks.append(cur)
                cur, budget = [], 0
            if not cur:
                budget = 4 + nf           # node header: count, deleted,
            cur.append(item)              # nf, fields..., "0"
            budget += cost
        if cur:
            chunks.append(cur)
        write_length(out, len(chunks))
        for chunk in chunks:
            (mms, mseq) = chunk[0][0]
            master_fields = [f for f, _ in chunk[0][1][1]]
            els: list[bytes] = [b"%d" % len(chunk), b"0",
                                b"%d" % len(master_fields), *master_fields,
                                b"0"]
            for (ms, seq), (_, fvs) in chunk:
                same = [f for f, _ in fvs] == master_fields
                els += [b"2" if same else b"0",
                        b"%d" % (ms - mms), b"%d" % (seq - mseq)]
                # lp_count EXCLUDES the lp-count element itself (redis
                # t_stream.c streamAppendItem: numfields+3 for SAMEFIELDS,
                # 2*numfields+4 otherwise) — it is the number of elements a
                # reverse iterator jumps back over to land on flags; one
                # too high lands one element early and misparses every
                # entry in XREVRANGE/XDEL on a real target
                if same:
                    els += [v for _, v in fvs]
                    lp_count = 3 + len(fvs)
                else:
                    els.append(b"%d" % len(fvs))
                    for f, v in fvs:
                        els += [f, v]
                    lp_count = 4 + 2 * len(fvs)
                els.append(b"%d" % lp_count)
            # master key: 16 bytes big-endian ms+seq, stored as an RDB string
            wstr(struct.pack(">QQ", mms, mseq), try_int=False)
            wstr(encode_listpack(els), try_int=False)
    else:
        write_length(out, 0)
    write_length(out, len(entries))              # stream length
    last = _parse_id(e.get("last_id") or (entries[-1][0] if entries else b"0-0"))
    write_length(out, last[0]); write_length(out, last[1])
    first = _parse_id(entries[0][0]) if entries else (0, 0)
    write_length(out, first[0]); write_length(out, first[1])
    write_length(out, 0); write_length(out, 0)   # max-deleted id
    write_length(out, len(entries))              # entries-added
    groups = e.get("groups", [])
    write_length(out, len(groups))
    for gname, gid in groups:
        wstr(gname, try_int=False)
        g = _parse_id(gid)
        write_length(out, g[0]); write_length(out, g[1])
        write_length(out, 0)                     # entries-read offset
        write_length(out, 0)                     # global PEL
        write_length(out, 0)                     # consumers


def _format_score(s: float) -> bytes:
    return b"%d" % int(s) if float(s).is_integer() and abs(s) < 1e17 \
        else repr(float(s)).encode()


def _write_ascii_float(out: bytearray, s: float) -> None:
    import math
    if math.isnan(s):
        out.append(253)
    elif s == float("inf"):
        out.append(254)
    elif s == float("-inf"):
        out.append(255)
    else:
        b = _format_score(s)
        out.append(len(b))
        out += b


# ------------------------------------------------- DUMP / RESTORE payloads

def dump_value(entry: dict, rdb_version: int = 11,
               lzf_sample: int = 1) -> bytes:
    """The DUMP/RESTORE wire payload for one value: <type byte><rdb value>
    <rdb-version u16 LE><crc64 LE> — entry_rewriter.rs create_value_dump
    analog (built on our own encoder instead of captured raw bytes).
    ``lzf_sample`` forwards to the string encoder (the pure-Python LZF
    loop is this codec's one hot path — bulk sinks sample it)."""
    body = bytearray()
    _encode_value(body, {**entry, "key": b""}, packed_threshold=128,
                  lzf_sample=lzf_sample)
    # body = type byte + 1-byte empty-key length (0x00) + value bytes
    out = bytearray([body[0]])
    out += body[2:]
    out += struct.pack("<H", rdb_version)
    out += struct.pack("<Q", crc64_redis(bytes(out)))
    return bytes(out)


def parse_dump_value(payload: bytes) -> dict:
    """Inverse of dump_value (validates footer version + CRC)."""
    if len(payload) < 11:
        raise ValueError("restore: payload too short")
    body = payload[:-10]
    ver = struct.unpack("<H", payload[-10:-8])[0]
    crc = struct.unpack("<Q", payload[-8:])[0]
    if crc64_redis(payload[:-8]) != crc:
        raise ValueError("restore: CRC-64 mismatch")
    if ver > 12:
        raise ValueError(f"restore: unsupported RDB version {ver}")
    r = RdbReader(body)
    tb = r.read_u8()
    entry = {"db": 0, "key": b"", "expire_ms": 0}
    _parse_value(r, tb, entry)
    return entry
