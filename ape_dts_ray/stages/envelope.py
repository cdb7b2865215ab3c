"""Event-envelope serialization — the Kafka/Avro sink analog.

The reference Avro-encodes each RowData into a record
``{schema, tb, operation, fields, before, after, extra}`` with the order-col
value as the message key and a per-table topic route
(dt-common/src/meta/avro/avro_converter_schema.rs:5-60, avro_converter.rs:
58-77, rdb_router.rs:79-89). Without a broker in this environment the
transport is a Dataset of envelope rows (``ds.write_json`` / ``read_json``
compatible): the same columns, with the payload JSON-encoded so heterogeneous
schema versions ride in one stream. ``from_envelope`` inverts exactly.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ape_dts_ray.meta import COL_OFFSET, COL_OP

ENVELOPE_COLS = ("topic", "key", "log_offset", "op", "payload")


def make_to_envelope(table: str = "transcripts",
                     topic_map: dict[str, str] | None = None,
                     key_cols: tuple[str, ...] = ("conv_id", "turn_idx")):
    """map_batches body: change events → envelope rows. Message key = joined
    key-col values (avro_converter.rs:58-77 uses the order col); topic routed
    per table (rdb_router.rs:79-89)."""
    topic = (topic_map or {}).get(table, table)

    def to_envelope(batch: pa.Table) -> pa.Table:
        import pandas as pd

        n = batch.num_rows
        payload_cols = [c for c in batch.column_names
                        if c not in (COL_OFFSET, COL_OP)]
        sel = batch.select(payload_cols)
        # Arrow→pandas would turn nullable int columns into float64 (3 → 3.0
        # in JSON, precision loss above 2^53): map integer Arrow types to
        # pandas' nullable Int dtypes AT conversion so values stay integral
        _int_map = {pa.int8(): pd.Int8Dtype(), pa.int16(): pd.Int16Dtype(),
                    pa.int32(): pd.Int32Dtype(), pa.int64(): pd.Int64Dtype(),
                    pa.uint8(): pd.UInt8Dtype(), pa.uint16(): pd.UInt16Dtype(),
                    pa.uint32(): pd.UInt32Dtype(), pa.uint64(): pd.UInt64Dtype()}
        df = sel.to_pandas(types_mapper=_int_map.get)
        # vectorized row serialization (pandas' C JSON writer) — ISO µs
        # timestamps ride as strings and cast back in from_envelope
        # double_precision=15: pandas defaults to 10 significant digits,
        # silently truncating float64 payloads; 15 is the writer's max
        # (ujson), so round-trips are exact to 15 significant digits —
        # full 17-digit float64 fidelity needs the Avro binary envelope
        # (stages/avro.py), which this JSON transport intentionally is not
        payload = df.to_json(orient="records", lines=True, date_format="iso",
                             date_unit="us",
                             double_precision=15).splitlines()
        key_parts = [df[c].astype(str) for c in key_cols]
        keys = key_parts[0]
        for p in key_parts[1:]:
            keys = keys + "\x1f" + p
        return pa.table({
            "topic": pa.array([topic] * n, pa.string()),
            "key": pa.array(keys.to_numpy(dtype=object), pa.string()),
            "log_offset": batch.column(COL_OFFSET),
            "op": batch.column(COL_OP),
            "payload": pa.array(payload, pa.string()),
        })

    return to_envelope


def from_envelope(batch: pa.Table, schema: pa.Schema | None = None) -> pa.Table:
    """Inverse: envelope rows → change events (payload JSON re-expanded;
    columns cast to ``schema`` types when given — timestamps ride as ISO
    strings in the envelope and cast back)."""
    records = [json.loads(p) for p in batch.column("payload").to_pylist()]
    payload = pa.Table.from_pylist(records)
    out = pa.table({
        COL_OFFSET: batch.column("log_offset"),
        COL_OP: batch.column("op"),
    })
    for name in payload.column_names:
        col = payload.column(name)
        # membership check, not schema.field(name): pa.Schema.field RAISES
        # on a missing name, so columns absent from the target schema
        # (heterogeneous version streams) must be detected by name
        if schema is not None and name in schema.names:
            try:
                col = col.cast(schema.field(name).type)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                pass
        out = out.append_column(name, col)
    return out
