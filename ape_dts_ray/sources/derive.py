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


# ---------------------------------------------------------------------------
# Wide-type change stream — the reference's ColValue breadth through the
# engine (dt-common/src/meta/col_value.rs:15-46: Decimal(String),
# Blob(Vec<u8>), Set/Enum, Json, exercised by the 29-col one_pk_multi_uk
# fixtures, SURVEY §5). Same key shape as transcripts; payload carries
#   amount      decimal128(18,4)  (exact: built from integer 1/10000ths)
#   payload_bin binary            (Blob analog)
#   tier        dictionary<string> (Enum analog; dict-encoded in flight)
#   meta_json   string (JSON doc)  (Json analog)
#   qty         int16             (widened to int64 by a schema op)
#   note        string            (dropped by a schema op)
# Deletes carry no after-image (keys only), like the transcript stream.
# WIDE_CTE is the lockstep DuckDB derivation used by the oracle.
# ---------------------------------------------------------------------------

WIDE_CTE = f"""
WITH wide AS (
  SELECT
    event_id AS log_offset,
    CASE WHEN event_type = 'error' THEN 'delete'
         WHEN event_type IN ('click', 'view') THEN 'update'
         ELSE 'insert' END AS op,
    'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(event_id % {TURN_MOD} AS INTEGER) AS turn_idx,
    CASE WHEN event_type = 'error' THEN NULL ELSE
      CAST(CAST((event_id * 10007 + user_id) // 10000 AS VARCHAR) || '.' ||
           lpad(CAST((event_id * 10007 + user_id) % 10000 AS VARCHAR), 4, '0')
           AS DECIMAL(18,4))
    END AS amount,
    CASE WHEN event_type = 'error' THEN NULL ELSE encode(props) END AS payload_bin,
    CASE WHEN event_type = 'error' THEN NULL
         WHEN value > 300 THEN 'gold'
         WHEN value > 100 THEN 'silver' ELSE 'bronze' END AS tier,
    CASE WHEN event_type = 'error' THEN NULL
         ELSE '{{"et":"' || event_type || '","uid":' ||
              CAST(user_id AS VARCHAR) || '}}' END AS meta_json,
    CASE WHEN event_type = 'error' THEN NULL
         ELSE CAST(user_id % 1000 AS SMALLINT) END AS qty,
    CASE WHEN event_type = 'error' THEN NULL ELSE props END AS note
  FROM events
)
"""


def derive_wide_changes(batch: pa.Table) -> pa.Table:
    """Arrow map_batches body — must match WIDE_CTE row for row."""
    import pandas as pd

    et = batch.column("event_type")
    is_del = pc.equal(et, pa.scalar("error"))
    is_upd = pc.is_in(et, value_set=pa.array(["click", "view"]))
    op = pc.if_else(is_del, pa.scalar("delete"),
                    pc.if_else(is_upd, pa.scalar("update"), pa.scalar("insert")))

    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    uid = batch.column("user_id").to_numpy(zero_copy_only=False)
    n = len(eid)
    conv = pc.binary_join_element_wise(
        pa.array(np.full(n, "conv-", dtype=object), type=pa.string()),
        pc.cast(batch.column("user_id"), pa.string()), "")
    turn = pa.array((eid % TURN_MOD).astype(np.int32))

    # decimal built from an exact integer count of 1/10000ths — no float
    # rounding on either side of the oracle pair
    unscaled = eid * 10007 + uid
    amt_str = (pd.Series(unscaled // 10000).astype(str) + "." +
               pd.Series(unscaled % 10000).astype(str).str.zfill(4))
    amount = pa.array(amt_str.to_numpy(dtype=object)).cast(pa.decimal128(18, 4))

    payload_bin = batch.column("props").cast(pa.binary())
    val = batch.column("value")
    gt300 = pc.fill_null(pc.greater(val, pa.scalar(300.0)), False)
    gt100 = pc.fill_null(pc.greater(val, pa.scalar(100.0)), False)
    tier = pc.if_else(is_del, pa.nulls(n, pa.string()),
                      pc.if_else(gt300, pa.scalar("gold"),
                                 pc.if_else(gt100, pa.scalar("silver"),
                                            pa.scalar("bronze"))))
    if isinstance(tier, pa.ChunkedArray):
        tier = tier.combine_chunks()
    tier = pc.dictionary_encode(tier)        # Enum analog: dict-encoded in flight
    meta_json = pc.binary_join_element_wise(
        pa.array(np.full(n, '{"et":"', dtype=object), type=pa.string()), et,
        pa.array(np.full(n, '","uid":', dtype=object), type=pa.string()),
        pc.cast(batch.column("user_id"), pa.string()),
        pa.array(np.full(n, "}", dtype=object), type=pa.string()), "")
    qty = pa.array((uid % 1000).astype(np.int16))

    def nulled(arr, typ):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pc.if_else(is_del, pa.nulls(n, typ), arr)

    return pa.table({
        "log_offset": batch.column("event_id").cast(pa.int64()),
        "op": op,
        "conv_id": conv,
        "turn_idx": turn,
        "amount": nulled(amount, pa.decimal128(18, 4)),
        "payload_bin": nulled(payload_bin, pa.binary()),
        "tier": tier,                        # nulls already applied pre-encode
        "meta_json": nulled(meta_json, pa.string()),
        "qty": nulled(qty, pa.int16()),
        "note": nulled(batch.column("props"), pa.string()),
    })


def wide_changes_dataset(sf_dir: str, batch_size: int = 65_536):
    """events.parquet → wide-typed change-event Dataset."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    return ds.map_batches(derive_wide_changes, batch_format="pyarrow",
                          batch_size=batch_size)


# ---------------------------------------------------------------------------
# Mongo-shaped change stream — the MongoMerger semantics (dt-parallelizer/
# src/mongo_merger.rs:17-100: LWW by the single `_id` key; the oplog's
# update/delete carry the doc after-image or just the key) as a derived
# stream: one id column, one JSON doc payload. MONGO_CTE is the lockstep
# DuckDB derivation. `% 359` churns ids so updates/deletes overwrite.
# ---------------------------------------------------------------------------

MONGO_ID_MOD = 359

MONGO_CTE = f"""
WITH mongo AS (
  SELECT
    event_id AS log_offset,
    CASE WHEN event_type = 'error' THEN 'delete'
         WHEN event_type IN ('click', 'view') THEN 'update'
         ELSE 'insert' END AS op,
    'oid-' || CAST(user_id % {MONGO_ID_MOD} AS VARCHAR) AS _id,
    CASE WHEN event_type = 'error' THEN NULL
         ELSE '{{"et":"' || event_type || '","uid":' ||
              CAST(user_id AS VARCHAR) || ',"ev":' ||
              CAST(event_id AS VARCHAR) || '}}' END AS doc
  FROM events
)
"""


def derive_mongo_changes(batch: pa.Table) -> pa.Table:
    """Arrow map_batches body — must match MONGO_CTE row for row."""
    et = batch.column("event_type")
    is_del = pc.equal(et, pa.scalar("error"))
    is_upd = pc.is_in(et, value_set=pa.array(["click", "view"]))
    op = pc.if_else(is_del, pa.scalar("delete"),
                    pc.if_else(is_upd, pa.scalar("update"),
                               pa.scalar("insert")))
    n = batch.num_rows
    uid = batch.column("user_id")
    uid_np = uid.to_numpy(zero_copy_only=False)
    oid = pc.binary_join_element_wise(
        pa.array(np.full(n, "oid-", dtype=object), type=pa.string()),
        pa.array((uid_np % MONGO_ID_MOD).astype(str)), "")
    doc = pc.binary_join_element_wise(
        pa.array(np.full(n, '{"et":"', dtype=object), type=pa.string()), et,
        pa.array(np.full(n, '","uid":', dtype=object), type=pa.string()),
        pc.cast(uid, pa.string()),
        pa.array(np.full(n, ',"ev":', dtype=object), type=pa.string()),
        pc.cast(batch.column("event_id"), pa.string()),
        pa.array(np.full(n, "}", dtype=object), type=pa.string()), "")
    return pa.table({
        "log_offset": batch.column("event_id").cast(pa.int64()),
        "op": op,
        "_id": oid,
        "doc": pc.if_else(is_del, pa.nulls(n, pa.string()), doc),
    })


def mongo_changes_dataset(sf_dir: str, batch_size: int = 65_536):
    """events.parquet → Mongo-shaped change-event Dataset."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type"])
    return ds.map_batches(derive_mongo_changes, batch_format="pyarrow",
                          batch_size=batch_size)


# ---------------------------------------------------------------------------
# DCL statement stream — a deterministic mix of the statements the
# reference's DclParser classifies (dcl_parser.rs:66-229 heads; scenario
# shape from dt-tests mysql_to_mysql/cdc/dcl_test/src_test.sql), derived
# from events so the oracle can rebuild it. ``derive_dcl_statements`` emits
# the RAW text (comments included — the classifier must strip them);
# DCL_CTE emits the post-strip text plus the ground-truth type per template,
# with NULL dcl_type for the DML row (dropped by dcl_simple_judgment on the
# engine side, by `dcl_type IN (...)` on the oracle side). It also exposes
# the template id ``k`` and ``uid`` so downstream oracles (cdc_rbac_state's
# ``rx`` CTE in __ray_entry__.py) can rebuild per-template STRUCTURED facts
# (hosts, pw||offset, r{uid%50}, db{uid%10}) without re-deriving the event
# selection — if a template below changes, rx's facts must change with it.
# ---------------------------------------------------------------------------

DCL_KINDS = 12

DCL_CTE = f"""
WITH dcl AS (
  SELECT
    event_id AS log_offset,
    CAST(event_id % {DCL_KINDS} AS INTEGER) AS k,
    user_id AS uid,
    CASE CAST(event_id % {DCL_KINDS} AS INTEGER)
      WHEN 0 THEN 'CREATE USER ''u' || CAST(user_id AS VARCHAR)
        || '''@''localhost'' IDENTIFIED BY ''pw' || CAST(event_id AS VARCHAR) || ''''
      WHEN 1 THEN 'create user if not exists ''u' || CAST(user_id AS VARCHAR)
        || '''@''%'' identified by ''pw' || CAST(event_id AS VARCHAR) || ''''
      WHEN 2 THEN 'ALTER USER ''u' || CAST(user_id AS VARCHAR)
        || '''@''localhost'' IDENTIFIED BY ''pw' || CAST(event_id AS VARCHAR) || ''''
      WHEN 3 THEN 'DROP USER IF EXISTS ''u' || CAST(user_id AS VARCHAR) || '''@''%'''
      WHEN 4 THEN 'CREATE ROLE ''r' || CAST(user_id % 50 AS VARCHAR) || ''''
      WHEN 5 THEN 'Drop Role ''r' || CAST(user_id % 50 AS VARCHAR) || ''''
      WHEN 6 THEN 'GRANT SELECT, INSERT ON db' || CAST(user_id % 10 AS VARCHAR)
        || '.tb1 TO ''u' || CAST(user_id AS VARCHAR) || '''@''%'''
      WHEN 7 THEN 'Grant All On *.* To ''u' || CAST(user_id AS VARCHAR)
        || '''@''localhost'' WITH GRANT OPTION'
      WHEN 8 THEN 'REVOKE SELECT ON db' || CAST(user_id % 10 AS VARCHAR)
        || '.tb1 FROM ''u' || CAST(user_id AS VARCHAR) || '''@''%'''
      WHEN 9 THEN 'SET DEFAULT ROLE ''r' || CAST(user_id % 50 AS VARCHAR)
        || ''' TO ''u' || CAST(user_id AS VARCHAR) || '''@''%'''
      WHEN 10 THEN 'FLUSH PRIVILEGES'
      ELSE 'INSERT INTO tb1 VALUES (' || CAST(event_id AS VARCHAR) || ')'
    END AS statement,
    CASE CAST(event_id % {DCL_KINDS} AS INTEGER)
      WHEN 0 THEN 'create_user' WHEN 1 THEN 'create_user'
      WHEN 2 THEN 'alter_user' WHEN 3 THEN 'drop_user'
      WHEN 4 THEN 'create_role' WHEN 5 THEN 'drop_role'
      WHEN 6 THEN 'grant' WHEN 7 THEN 'grant'
      WHEN 8 THEN 'revoke' WHEN 9 THEN 'set_role'
      WHEN 10 THEN 'unknown' ELSE NULL
    END AS dcl_type
  FROM events
)
"""


def derive_dcl_statements(batch: pa.Table) -> pa.Table:
    """Arrow map_batches body — must match DCL_CTE row for row AFTER the
    classifier strips comments (templates 1 and 2 carry block comments here
    that the CTE's post-strip text omits)."""
    import pandas as pd

    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    uid = batch.column("user_id").to_numpy(zero_copy_only=False)
    kind = eid % DCL_KINDS
    u = pd.Series(uid).astype(str)
    e = pd.Series(eid).astype(str)
    r = pd.Series(uid % 50).astype(str)
    d = pd.Series(uid % 10).astype(str)
    templates = [
        "CREATE USER 'u" + u + "'@'localhost' IDENTIFIED BY 'pw" + e + "'",
        # abutting comment: strip leaves exactly one space between keywords
        "create /*c*/user if not exists 'u" + u + "'@'%' identified by 'pw"
        + e + "'",
        "ALTER /*multi\nline*/USER 'u" + u + "'@'localhost' IDENTIFIED BY 'pw"
        + e + "'",
        "DROP USER IF EXISTS 'u" + u + "'@'%'",
        "CREATE ROLE 'r" + r + "'",
        "Drop Role 'r" + r + "'",
        "GRANT SELECT, INSERT ON db" + d + ".tb1 TO 'u" + u + "'@'%'",
        "Grant All On *.* To 'u" + u + "'@'localhost' WITH GRANT OPTION",
        "REVOKE SELECT ON db" + d + ".tb1 FROM 'u" + u + "'@'%'",
        "SET DEFAULT ROLE 'r" + r + "' TO 'u" + u + "'@'%'",
        pd.Series(np.full(len(eid), "FLUSH PRIVILEGES", dtype=object)),
        "INSERT INTO tb1 VALUES (" + e + ")",
    ]
    stmt = np.select([kind == i for i in range(DCL_KINDS)],
                     [t.to_numpy(dtype=object) for t in templates])
    return pa.table({
        "log_offset": batch.column("event_id").cast(pa.int64()),
        "statement": pa.array(stmt, pa.string()),
    })


def dcl_dataset(sf_dir: str, batch_size: int = 65_536):
    """events.parquet → raw DCL statement Dataset (pruned to the two
    columns the derivation needs)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id"])
    return ds.map_batches(derive_dcl_statements, batch_format="pyarrow",
                          batch_size=batch_size)
