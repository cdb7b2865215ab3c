"""SQL formatter sink — the SqlSinker analog (dt-connector/src/sinker/
basic/sql_sinker.rs:22-50): instead of applying events, print the SQL each
would execute. ``reverse=True`` emits undo SQL (``row_data.reverse()``,
row_data.rs:54-69): an insert reverses to a keyed DELETE; an update/delete
reverses to a REPLACE of the before-image — since this engine carries only
after-images plus keys (LWW lake model), reversing a delete emits a comment
placeholder exactly where the reference would need the before-image.

Vectorized string assembly per batch (no Python row loop for the common
single-quote escaping path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _sql_str(s: pd.Series) -> pd.Series:
    return "'" + s.astype("string").str.replace("'", "''", regex=False) + "'"


def format_sql(batch: pa.Table, table: str = "transcripts",
               key_cols=("conv_id", "turn_idx"),
               payload_cols=("role", "text", "tool"),
               reverse: bool = False) -> pa.Table:
    df = batch.to_pandas()
    where = ("conv_id = " + _sql_str(df["conv_id"]) +
             " AND turn_idx = " + df["turn_idx"].astype(str))
    cols = [*key_cols, *payload_cols]
    values = (_sql_str(df["conv_id"]) + ", " + df["turn_idx"].astype(str))
    for c in payload_cols:
        v = _sql_str(df[c])
        values = values + ", " + v.fillna("NULL")
    insert_sql = (f"REPLACE INTO {table} (" + ", ".join(cols) + ") VALUES (" +
                  values + ");")
    delete_sql = f"DELETE FROM {table} WHERE " + where + ";"

    is_del = df["op"].eq("delete")
    if not reverse:
        sql = np.where(is_del, delete_sql, insert_sql)
    else:
        is_ins = df["op"].eq("insert")
        sql = np.where(is_ins, delete_sql,
                       np.where(is_del,
                                "-- cannot reverse delete without before-image ("
                                + where + ")",
                                insert_sql))
    out = pa.table({
        "log_offset": batch.column("log_offset"),
        "sql": pa.array(sql.astype(object), type=pa.string()),
    })
    return out
