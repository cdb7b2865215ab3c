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


def encode_event(row: dict) -> bytes:
    """One change event → Avro single-object bytes."""
    buf = bytearray(_MARKER + schema_fingerprint())
    _varint(buf, int(row[COL_OFFSET]))
    _varint(buf, int(row.get(COL_SEQ, 0)))
    _put_str(buf, row[COL_OP])
    _put_str(buf, row["conv_id"])
    _varint(buf, int(row["turn_idx"]))
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


def avro_encode(batch: pa.Table, key_cols=("conv_id", "turn_idx")) -> pa.Table:
    """map_batches body: change events → (key, log_offset, value) envelope
    rows with Avro single-object payloads."""
    rows = batch.to_pylist()
    values, keys = [], []
    for r in rows:
        ts = r.get("ts")
        if ts is not None and not isinstance(ts, (int, np.integer)):
            # pandas/py datetime → micros since epoch
            ts64 = np.datetime64(ts, "us").astype(np.int64)
            r = {**r, "ts": int(ts64)}
        values.append(encode_event(r))
        keys.append("\x1f".join(str(r[c]) for c in key_cols))
    return pa.table({
        "key": pa.array(keys, pa.string()),
        "log_offset": batch.column(COL_OFFSET),
        "value": pa.array(values, pa.binary()),
    })


_DECODED_SCHEMA = pa.schema(
    [(COL_OFFSET, pa.int64()), (COL_SEQ, pa.int32()),
     ("op", pa.string()), ("conv_id", pa.string()),
     ("turn_idx", pa.int32()), ("role", pa.string()),
     ("text", pa.string()), ("tool", pa.string()),
     ("ts", pa.timestamp("us"))])


def avro_decode(batch: pa.Table) -> pa.Table:
    """Inverse: Avro envelope rows → normalized change events. The schema is
    PINNED for every block — inference would type an all-null column (e.g. a
    batch of tool-less turns, or an empty block after an upstream filter) as
    null instead of string, and the first downstream concat/union across
    blocks would fail on the mismatch."""
    rows = [decode_event(v) for v in batch.column("value").to_pylist()]
    return pa.Table.from_pylist(rows, schema=_DECODED_SCHEMA)
