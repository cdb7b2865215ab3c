"""Avro binary envelope — the RdkafkaSinker/AvroConverter analog with REAL
Avro wire bytes (the round-1 JSON stand-in kept interop-incompatible
consumers out; this closes it without an avro library).

Implements the public Avro 1.11 spec subset the change-event record needs:
zigzag-varint longs/ints, length-prefixed strings, ``["null", T]`` unions,
records, and the SINGLE-OBJECT ENCODING framing (marker ``C3 01`` + 8-byte
little-endian CRC-64-AVRO schema fingerprint + body) so any standard Avro
consumer can resolve the writer schema by fingerprint. Reference semantics:
dt-common/src/meta/avro/avro_converter.rs:58-77 (row → Avro record keyed by
the order col) and avro_converter_schema.rs:5-60 (the record layout).

Encoding loops per row — inherent to a row-framed wire format; this is a
serialization SINK stage, not the apply hot path.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ape_dts_ray.meta import COL_OFFSET, COL_OP, COL_SEQ

AVRO_SCHEMA = {
    "type": "record",
    "name": "ChangeEvent",
    "namespace": "ape_dts_ray",
    "fields": [
        {"name": "log_offset", "type": "long"},
        {"name": "seq", "type": "int"},
        {"name": "op", "type": "string"},
        {"name": "conv_id", "type": "string"},
        {"name": "turn_idx", "type": "int"},
        {"name": "role", "type": ["null", "string"], "default": None},
        {"name": "text", "type": ["null", "string"], "default": None},
        {"name": "tool", "type": ["null", "string"], "default": None},
        {"name": "ts",
         "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}],
         "default": None},
    ],
}
AVRO_SCHEMA_JSON = json.dumps(AVRO_SCHEMA, separators=(",", ":"))

_NULLABLE = ("role", "text", "tool")

# --- Parsing Canonical Form (Avro spec "Transforming into Parsing Canonical
# Form"): primitives unwrapped to bare strings, namespaces folded into full
# names, only parsing-relevant attributes kept, in the spec's fixed order,
# minimal JSON. Fingerprinting the PCF (not the raw writer JSON) is what lets
# any standard Avro consumer resolve the writer schema by fingerprint. ---

_PRIMITIVES = frozenset(
    ("null", "boolean", "int", "long", "float", "double", "bytes", "string"))
_CANON_ORDER = ("name", "type", "fields", "symbols", "items", "values", "size")


def _canon(schema, namespace: str | None = None) -> str:
    if isinstance(schema, str):
        if schema in _PRIMITIVES or "." in schema or namespace is None:
            return json.dumps(schema)
        return json.dumps(f"{namespace}.{schema}")   # named-type reference
    if isinstance(schema, list):                     # union
        return "[" + ",".join(_canon(s, namespace) for s in schema) + "]"
    t = schema["type"]
    if t in _PRIMITIVES and set(schema) <= {"type", "logicalType", "doc"}:
        return json.dumps(t)                         # unwrap {"type": "int"}
    parts: list[str] = []
    if t in ("record", "enum", "fixed"):
        name = schema["name"]
        ns = namespace if "." in name else schema.get("namespace", namespace)
        full = name if "." in name else (f"{ns}.{name}" if ns else name)
        namespace = full.rsplit(".", 1)[0] if "." in full else None
        parts.append('"name":' + json.dumps(full))
    for attr in _CANON_ORDER:
        if attr == "name" or attr not in schema:
            continue
        if attr == "type":
            v = json.dumps(t) if isinstance(t, str) and (
                t in _PRIMITIVES or t in ("record", "enum", "fixed", "array",
                                          "map")) else _canon(t, namespace)
            parts.append('"type":' + v)
        elif attr == "fields":
            fs = ",".join(
                '{"name":' + json.dumps(f["name"]) +
                ',"type":' + _canon(f["type"], namespace) + "}"
                for f in schema["fields"])
            parts.append('"fields":[' + fs + "]")
        elif attr == "symbols":
            parts.append('"symbols":[' +
                         ",".join(json.dumps(s) for s in schema["symbols"]) + "]")
        elif attr in ("items", "values"):
            parts.append(f'"{attr}":' + _canon(schema[attr], namespace))
        elif attr == "size":
            parts.append('"size":' + str(int(schema["size"])))
    return "{" + ",".join(parts) + "}"


def parsing_canonical_form(schema: dict | list | str = AVRO_SCHEMA) -> str:
    return _canon(schema)


# --- CRC-64-AVRO schema fingerprint (Avro spec "Schema Fingerprints") ---
_EMPTY64 = 0xC15D213AA4D7A795


def _crc64_table():
    table = []
    for i in range(256):
        fp = i
        for _ in range(8):
            fp = (fp >> 1) ^ (_EMPTY64 & -(fp & 1))
        table.append(fp)
    return table


_TABLE = _crc64_table()


def schema_fingerprint(schema: dict | list | str = AVRO_SCHEMA) -> bytes:
    """CRC-64-AVRO over the schema's Parsing Canonical Form, little-endian —
    the exact 8 bytes a standard Avro single-object-encoding reader expects
    after the C3 01 marker."""
    fp = _EMPTY64
    for b in parsing_canonical_form(schema).encode():
        fp = (fp >> 8) ^ _TABLE[(fp ^ b) & 0xFF]
    return fp.to_bytes(8, "little")


_MARKER = b"\xc3\x01"


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _varint(buf: bytearray, n: int) -> None:
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _put_str(buf: bytearray, s: str) -> None:
    raw = s.encode()
    _varint(buf, len(raw))
    buf += raw


def _check_i32(v: int, name: str) -> int:
    """The schema declares seq/turn_idx as Avro 'int' (32-bit): a wider
    value would encode fine but WRAP on any spec-conformant reader (our
    own columnar decoder included) — refuse at the writer, identically in
    the scalar and columnar codecs."""
    if not -(1 << 31) <= v < (1 << 31):
        raise ValueError(f"avro: {name}={v} overflows the schema's 'int' "
                         "(32-bit) field")
    return v


def encode_event(row: dict) -> bytes:
    """One change event → Avro single-object bytes."""
    buf = bytearray(_MARKER + schema_fingerprint())
    _varint(buf, int(row[COL_OFFSET]))
    _varint(buf, _check_i32(int(row.get(COL_SEQ, 0)), COL_SEQ))
    _put_str(buf, row[COL_OP])
    _put_str(buf, row["conv_id"])
    _varint(buf, _check_i32(int(row["turn_idx"]), "turn_idx"))
    for c in _NULLABLE:
        v = row.get(c)
        if v is None:
            _varint(buf, 0)          # union branch: null
        else:
            _varint(buf, 1)
            _put_str(buf, v)
    ts = row.get("ts")
    if ts is None:
        _varint(buf, 0)
    else:
        _varint(buf, 1)
        _varint(buf, int(ts))        # timestamp-micros
    return bytes(buf)


def decode_event(data: bytes) -> dict:
    if data[:2] != _MARKER:
        raise ValueError("not Avro single-object encoding")
    if data[2:10] != schema_fingerprint():
        raise ValueError("unknown writer schema fingerprint")
    pos = 10

    def rd_str(p):
        ln, p = _read_varint(data, p)
        return data[p:p + ln].decode(), p + ln

    row = {}
    row[COL_OFFSET], pos = _read_varint(data, pos)
    row[COL_SEQ], pos = _read_varint(data, pos)
    row[COL_OP], pos = rd_str(pos)
    row["conv_id"], pos = rd_str(pos)
    row["turn_idx"], pos = _read_varint(data, pos)
    for c in _NULLABLE:
        branch, pos = _read_varint(data, pos)
        if branch == 0:
            row[c] = None
        else:
            row[c], pos = rd_str(pos)
    branch, pos = _read_varint(data, pos)
    if branch == 0:
        row["ts"] = None
    else:
        row["ts"], pos = _read_varint(data, pos)
    return row


# ---- columnar codec kernels (the batch path; encode_event/decode_event
# above stay the per-record reference — property tests pin byte equality)

def _zigzag_vec(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def _varint_len_vec(z: np.ndarray) -> np.ndarray:
    nb = np.ones(len(z), np.int64)
    for k in range(1, 10):
        nb += (z >= np.uint64(1) << np.uint64(7 * k))
    return nb


def _write_varints(out: np.ndarray, dst: np.ndarray, z: np.ndarray,
                   nb: np.ndarray) -> None:
    """Scatter each z's zigzag-varint bytes at byte offset dst (vectors)."""
    if not len(z):
        return
    for j in range(int(nb.max())):
        m = nb > j
        b = ((z[m] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        b |= ((nb[m] - 1 > j).astype(np.uint8) << np.uint8(7))
        out[dst[m] + j] = b


def _scatter_bytes(out: np.ndarray, dst: np.ndarray, starts: np.ndarray,
                   lens: np.ndarray, data: np.ndarray) -> None:
    total = int(lens.sum())
    if not total:
        return
    cum0 = np.zeros(len(lens), np.int64)
    np.cumsum(lens[:-1], out=cum0[1:])
    intra = np.arange(total, dtype=np.int64) - np.repeat(cum0, lens)
    out[np.repeat(dst, lens) + intra] = data[np.repeat(starts, lens) + intra]


def _col_bytes(arr):
    """(starts, lens, data, valid) views of a string/binary Arrow column;
    null rows get len 0. Normalized through large_binary so int64 offsets
    are read for EVERY input width — reading a large_string's int64
    offsets as int32 silently corrupts the wire bytes."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type != pa.large_binary():
        arr = arr.cast(pa.large_binary())
    n = len(arr)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], np.int64, count=n + 1,
                         offset=arr.offset * 8)
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None \
        else np.zeros(0, np.uint8)
    starts, lens = offs[:-1], offs[1:] - offs[:-1]
    import pyarrow.compute as pc
    valid = pc.is_valid(arr).to_numpy(zero_copy_only=False) \
        if arr.null_count else np.ones(n, bool)
    return starts.astype(np.int64), np.where(valid, lens, 0), data, valid


def avro_encode(batch: pa.Table, key_cols=("conv_id", "turn_idx")) -> pa.Table:
    """map_batches body: change events → (key, log_offset, value) envelope
    rows with Avro single-object payloads. Fully columnar — per-field
    zigzag-varints and string payloads are scattered into ONE output buffer
    at vector-computed offsets (byte-identical to encode_event per row; the
    property suite pins it). ~20× the per-record loop."""
    n = batch.num_rows
    if n == 0:
        return pa.table({"key": pa.array([], pa.string()),
                         "log_offset": pa.array([], pa.int64()),
                         "value": pa.array([], pa.binary())})
    names = batch.column_names
    for c in (COL_OFFSET, COL_SEQ, "turn_idx", COL_OP, "conv_id"):
        # required (non-union) record fields — the scalar reference raised
        # on a null here; silence would launder bad data into valid-looking
        # wire records
        if c in names and batch.column(c).null_count:
            raise ValueError(f"avro: null in required field {c!r}")

    def ints(col, default=None):
        if col not in names:
            # scalar parity (encode_event): offset/turn_idx are required
            # record fields and raise KeyError when absent; ONLY seq
            # defaults (row.get(COL_SEQ, 0)) — a silent 0 for the others
            # would launder a malformed batch into valid-looking wire
            # records, exactly what the null-check above refuses
            if default is None:
                raise KeyError(f"avro: required field {col!r} missing "
                               "from batch")
            return np.full(n, default, np.int64)
        return batch.column(col).cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)

    i_seq = ints(COL_SEQ, default=0)
    i_turn = ints("turn_idx")
    for nm, v in ((COL_SEQ, i_seq), ("turn_idx", i_turn)):
        bad = (v < -(1 << 31)) | (v >= (1 << 31))
        if bad.any():
            _check_i32(int(v[int(np.argmax(bad))]), nm)  # same msg as scalar
    z_off = _zigzag_vec(ints(COL_OFFSET))
    z_seq = _zigzag_vec(i_seq)
    z_turn = _zigzag_vec(i_turn)
    l_off, l_seq, l_turn = (_varint_len_vec(z) for z in (z_off, z_seq, z_turn))

    op_s, op_l, op_d, _ = _col_bytes(batch.column(COL_OP))
    cv_s, cv_l, cv_d, _ = _col_bytes(batch.column("conv_id"))
    z_opl, z_cvl = _zigzag_vec(op_l), _zigzag_vec(cv_l)
    l_opl, l_cvl = _varint_len_vec(z_opl), _varint_len_vec(z_cvl)

    nul = []                              # (starts, lens, data, valid, z_l, l_l)
    for c in _NULLABLE:
        if c in names:
            s, l, d, v = _col_bytes(batch.column(c))
        else:
            s = np.zeros(n, np.int64); l = np.zeros(n, np.int64)
            d = np.zeros(0, np.uint8); v = np.zeros(n, bool)
        zl = _zigzag_vec(l)
        nul.append((s, l, d, v, zl, np.where(v, _varint_len_vec(zl), 0)))

    if "ts" in names:
        ts_col = batch.column("ts")
        if pa.types.is_timestamp(ts_col.type):
            ts_col = ts_col.cast(pa.timestamp("us")).cast(pa.int64())
        else:
            ts_col = ts_col.cast(pa.int64())
        import pyarrow.compute as pc
        if ts_col.null_count:
            ts_valid = pc.is_valid(ts_col).to_numpy(zero_copy_only=False)
            # fill nulls on the ARROW side: to_numpy on a null-bearing
            # int64 column yields float64, and values past 2^53 would
            # round before zigzag — diverging from encode_event's bytes
            ts_col = pc.fill_null(ts_col, 0)
        else:
            ts_valid = np.ones(n, bool)
        ts_v = ts_col.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        ts_valid = np.zeros(n, bool)
        ts_v = np.zeros(n, np.int64)
    z_ts = _zigzag_vec(ts_v)
    l_ts = np.where(ts_valid, _varint_len_vec(z_ts), 0)

    sizes = (10 + l_off + l_seq + l_opl + op_l + l_cvl + cv_l + l_turn
             + sum(1 + f[5] + f[1] for f in nul) + 1 + l_ts)
    row_start = np.zeros(n, np.int64)
    np.cumsum(sizes[:-1], out=row_start[1:])
    total = int(row_start[-1] + sizes[-1])
    out = np.empty(total, np.uint8)

    hdr = np.frombuffer(_MARKER + schema_fingerprint(), np.uint8)
    dst = row_start
    for j in range(10):
        out[dst + j] = hdr[j]
    dst = dst + 10
    for z, nb in ((z_off, l_off), (z_seq, l_seq)):
        _write_varints(out, dst, z, nb)
        dst = dst + nb
    for zl, ll, s, l, d in ((z_opl, l_opl, op_s, op_l, op_d),
                            (z_cvl, l_cvl, cv_s, cv_l, cv_d)):
        _write_varints(out, dst, zl, ll)
        dst = dst + ll
        _scatter_bytes(out, dst, s, l, d)
        dst = dst + l
    _write_varints(out, dst, z_turn, l_turn)
    dst = dst + l_turn
    for s, l, d, v, zl, ll in nul:
        out[dst] = np.where(v, 2, 0).astype(np.uint8)   # union branch byte
        dst = dst + 1
        _write_varints(out, dst[v], zl[v], ll[v])
        dst = dst + ll
        _scatter_bytes(out, dst, s, l, d)               # null rows: len 0
        dst = dst + l
    out[dst] = np.where(ts_valid, 2, 0).astype(np.uint8)
    dst = dst + 1
    _write_varints(out, dst[ts_valid], z_ts[ts_valid], l_ts[ts_valid])

    if total >= 1 << 31:
        # int32 Arrow binary offsets would wrap — same loud refusal as
        # scan_resp's segment guard; split the batch upstream
        raise ValueError("avro: encoded batch exceeds 2 GiB — use a "
                         "smaller batch_size")
    v_offs = np.zeros(n + 1, np.int64)
    np.cumsum(sizes, out=v_offs[1:])
    value = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(v_offs.astype(np.int32)), pa.py_buffer(out)])

    import pyarrow.compute as pc
    key = None
    for c in key_cols:                    # "\x1f".join(str(...)) per row
        col = batch.column(c)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type) \
                or pa.types.is_integer(col.type):
            part = pc.coalesce(pc.cast(col, pa.string()),
                               pa.scalar("None"))     # str(None) parity
        else:                             # rare exotic key types: exact str()
            part = pa.array([str(v) for v in col.to_pylist()], pa.string())
        key = part if key is None else pc.binary_join_element_wise(
            key, part, "\x1f")
    return pa.table({
        "key": key,
        "log_offset": batch.column(COL_OFFSET),
        "value": value,
    })


_DECODED_SCHEMA = pa.schema(
    [(COL_OFFSET, pa.int64()), (COL_SEQ, pa.int32()),
     ("op", pa.string()), ("conv_id", pa.string()),
     ("turn_idx", pa.int32()), ("role", pa.string()),
     ("text", pa.string()), ("tool", pa.string()),
     ("ts", pa.timestamp("us"))])


def _read_varints_vec(a: np.ndarray, pos: np.ndarray, limit: np.ndarray):
    """Vectorized zigzag-varint read at per-row cursors, bounds-enforced
    against each row's own end (``limit``) — a torn/corrupt row must fail
    loudly, never walk into a NEIGHBORING row's bytes (the scalar
    decode_event confined reads to its row; so does this). Returns
    (values int64, advanced cursors)."""
    n = len(pos)
    acc = np.zeros(n, np.uint64)
    shift = np.zeros(n, np.uint64)
    p = pos.copy()
    active = np.ones(n, bool)
    guard = 0
    while active.any():
        idx = np.flatnonzero(active)
        if (p[idx] >= limit[idx]).any():
            raise ValueError("avro: corrupt record (varint overruns row)")
        b = a[p[idx]].astype(np.uint64)
        acc[idx] |= (b & np.uint64(0x7F)) << shift[idx]
        p[idx] += 1
        shift[idx] += np.uint64(7)
        active[idx[(b & np.uint64(0x80)) == 0]] = False
        guard += 1
        if guard > 10:
            raise ValueError("avro: varint longer than 10 bytes")
    val = ((acc >> np.uint64(1))
           ^ (np.uint64(0) - (acc & np.uint64(1)))).view(np.int64)
    return val, p


def _take_strings(a: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                  valid: np.ndarray) -> pa.Array:
    """Arrow string array from per-row (start, len) slices + validity —
    one index gather, no per-row Python."""
    n = len(starts)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(np.where(valid, lens, 0), out=offs[1:])
    total = int(offs[-1])
    if total >= 1 << 31:
        raise ValueError("avro: decoded batch exceeds 2 GiB — use a "
                         "smaller batch_size")
    if total:
        l = np.where(valid, lens, 0)
        intra = (np.arange(total, dtype=np.int64)
                 - np.repeat(offs[:-1], l))
        buf = a[np.repeat(starts, l) + intra]
    else:
        buf = np.zeros(0, np.uint8)
    bitmap = pa.py_buffer(np.packbits(valid, bitorder="little"))
    return pa.Array.from_buffers(
        pa.string(), n,
        [None if valid.all() else bitmap,
         pa.py_buffer(offs.astype(np.int32)), pa.py_buffer(buf)],
        null_count=int((~valid).sum()))


def avro_decode(batch: pa.Table) -> pa.Table:
    """Inverse: Avro envelope rows → normalized change events, fully
    columnar (a per-row cursor vector walks the fixed field sequence; each
    varint field is ≤10 masked numpy passes, strings are one gather). The
    schema is PINNED for every block — inference would type an all-null
    column (e.g. a batch of tool-less turns, or an empty block after an
    upstream filter) as null instead of string, and the first downstream
    concat/union across blocks would fail on the mismatch."""
    col = batch.column("value")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return _DECODED_SCHEMA.empty_table()
    col = col.cast(pa.binary()) if not pa.types.is_binary(col.type) else col
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], np.int32, count=n + 1,
                         offset=col.offset * 4).astype(np.int64)
    a = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None \
        else np.zeros(0, np.uint8)
    starts, ends = offs[:-1], offs[1:]
    if ((ends - starts) < 10).any():
        raise ValueError("not Avro single-object encoding")
    hdr = np.frombuffer(_MARKER + schema_fingerprint(), np.uint8)
    for j in range(2):
        if (a[starts + j] != hdr[j]).any():
            raise ValueError("not Avro single-object encoding")
    for j in range(2, 10):
        if (a[starts + j] != hdr[j]).any():
            raise ValueError("unknown writer schema fingerprint")

    pos = starts + 10
    log_offset, pos = _read_varints_vec(a, pos, ends)
    seq, pos = _read_varints_vec(a, pos, ends)

    def rd_str(pos, valid=None):
        if valid is None:
            ln, pos = _read_varints_vec(a, pos, ends)
            if ((ln < 0) | (pos + ln > ends)).any():
                raise ValueError("avro: corrupt record (string overruns row)")
            arr = _take_strings(a, pos, ln, np.ones(n, bool))
            return arr, pos + ln
        ln = np.zeros(n, np.int64)
        if valid.any():
            lnv, pv = _read_varints_vec(a, pos[valid], ends[valid])
            ln[valid] = lnv
            newpos = pos.copy()
            newpos[valid] = pv
        else:
            newpos = pos
        if valid.any() and ((ln[valid] < 0)
                            | (newpos[valid] + ln[valid]
                               > ends[valid])).any():
            raise ValueError("avro: corrupt record (string overruns row)")
        arr = _take_strings(a, newpos, ln, valid)
        return arr, newpos + np.where(valid, ln, 0)

    op, pos = rd_str(pos)
    conv, pos = rd_str(pos)
    turn, pos = _read_varints_vec(a, pos, ends)
    nullable = {}
    for c in _NULLABLE:
        branch, pos = _read_varints_vec(a, pos, ends)
        nullable[c], pos = rd_str(pos, valid=branch != 0)
    branch, pos = _read_varints_vec(a, pos, ends)
    ts_valid = branch != 0
    ts = np.zeros(n, np.int64)
    if ts_valid.any():
        tsv, _ = _read_varints_vec(a, pos[ts_valid], ends[ts_valid])
        ts[ts_valid] = tsv
    ts_arr = pa.Array.from_buffers(
        pa.timestamp("us"), n,
        [None if ts_valid.all()
         else pa.py_buffer(np.packbits(ts_valid, bitorder="little")),
         pa.py_buffer(ts)],
        null_count=int((~ts_valid).sum()))
    return pa.table({
        COL_OFFSET: pa.array(log_offset, pa.int64()),
        COL_SEQ: pa.array(seq.astype(np.int32), pa.int32()),
        "op": op, "conv_id": conv,
        "turn_idx": pa.array(turn.astype(np.int32), pa.int32()),
        "role": nullable["role"], "text": nullable["text"],
        "tool": nullable["tool"], "ts": ts_arr,
    }, schema=_DECODED_SCHEMA)
