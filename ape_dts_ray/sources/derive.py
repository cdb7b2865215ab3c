"""Derive a transcripts CDC stream from the driver's ``events`` table.

The correctness harness (CORRECTNESS_r{N}.json) compares Ray pipelines against
DuckDB SQL over the same sf parquet views — so the change stream the CDC
queries replay must be a **pure, SQL-expressible function** of the ``events``
table (event_id, ts, user_id, event_type, value, props). This module holds the
one derivation, implemented twice and kept in lockstep:

- ``derive_changes``: vectorized Arrow ``map_batches`` body;
- ``CHANGES_CTE``: the equivalent DuckDB CTE used by every oracle query.

Mapping (deterministic):
    log_offset = event_id                      (Position analog — total order)
    op         = error→delete, click/view→update, signup/purchase→insert
    conv_id    = 'conv-' || user_id            (partition_col)
    turn_idx   = event_id % 40                 (PK part 2)
    role       = event_type        | NULL for deletes
    text       = 'msg <id> <props>'| NULL for deletes
    tool       = 'search' if value > 100 else '' | NULL for deletes
    ts         = ts                | NULL for deletes

Deletes carry no after-image, exactly like ape-dts RowData (Delete has only
``before`` and we keep just its key — dt-common/src/meta/row_data.rs:18-26).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TURN_MOD = 40

CHANGES_CTE = f"""
WITH changes AS (
  SELECT
    event_id AS log_offset,
    CASE WHEN event_type = 'error' THEN 'delete'
         WHEN event_type IN ('click', 'view') THEN 'update'
         ELSE 'insert' END AS op,
    'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(event_id % {TURN_MOD} AS INTEGER) AS turn_idx,
    CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS role,
    CASE WHEN event_type = 'error' THEN NULL
         ELSE 'msg ' || CAST(event_id AS VARCHAR) || ' ' || props END AS text,
    CASE WHEN event_type = 'error' THEN NULL
         WHEN value > 100 THEN 'search' ELSE '' END AS tool,
    CASE WHEN event_type = 'error' THEN NULL ELSE ts END AS ts
  FROM events
)
"""


def derive_changes(batch: pa.Table) -> pa.Table:
    """Arrow map_batches body — must match CHANGES_CTE row for row."""
    et = batch.column("event_type")
    is_del = pc.equal(et, pa.scalar("error"))
    is_upd = pc.is_in(et, value_set=pa.array(["click", "view"]))
    op = pc.if_else(is_del, pa.scalar("delete"),
                    pc.if_else(is_upd, pa.scalar("update"), pa.scalar("insert")))

    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    conv = pc.binary_join_element_wise(
        pa.array(np.full(len(eid), "conv-", dtype=object), type=pa.string()),
        pc.cast(batch.column("user_id"), pa.string()), "")
    turn = pa.array((eid % TURN_MOD).astype(np.int32))

    idstr = pc.cast(batch.column("event_id"), pa.string())
    text = pc.binary_join_element_wise(
        pa.array(np.full(len(eid), "msg", dtype=object), type=pa.string()),
        idstr, batch.column("props"), " ")
    # fill_null(False): SQL `value > 100` is NULL for NULL value and the CTE's
    # CASE falls through to ELSE '' — the Arrow side must agree on NULL inputs
    tool = pc.if_else(
        pc.fill_null(pc.greater(batch.column("value"), pa.scalar(100.0)), False),
        pa.scalar("search"), pa.scalar(""))

    def nulled(arr, typ):
        return pc.if_else(is_del, pa.nulls(len(eid), typ), arr)

    return pa.table({
        "log_offset": batch.column("event_id").cast(pa.int64()),
        "op": op,
        "conv_id": conv,
        "turn_idx": turn,
        "role": nulled(et, pa.string()),
        "text": nulled(text, pa.string()),
        "tool": nulled(tool, pa.string()),
        "ts": nulled(batch.column("ts"), pa.timestamp("us")),
    })


def changes_dataset(sf_dir: str, batch_size: int = 65_536):
    """events.parquet → normalized change-event Dataset."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    return ds.map_batches(derive_changes, batch_format="pyarrow",
                          batch_size=batch_size)
