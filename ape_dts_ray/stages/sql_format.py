"""SQL formatter sink — the SqlSinker analog (dt-connector/src/sinker/
basic/sql_sinker.rs:22-50): instead of applying events, print the SQL each
would execute. ``reverse=True`` emits undo SQL (``row_data.reverse()``,
row_data.rs:54-69): an insert reverses to a keyed DELETE; an update/delete
reverses to a REPLACE of the before-image. ``format_sql(reverse=True)``
alone has no before-image (events carry after-images only) and emits a
comment placeholder for deletes AND updates (re-emitting an update's
after-image would re-apply the change, not undo it);
``reverse_sql_with_before`` closes that gap
by joining the before-image from the LAKE STATE — valid when the state is
from BEFORE the batch was applied (the undo-preview use of the reference's
reverse mode).

Vectorized string assembly per batch (no Python row loop for the common
single-quote escaping path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _sql_str(s: pd.Series) -> pd.Series:
    return "'" + s.astype("string").str.replace("'", "''", regex=False) + "'"


def _sql_val(s: pd.Series) -> pd.Series:
    """SQL literal per dtype: numerics bare, everything else quoted+escaped.
    Nulls come back as <NA>/None so the caller's fillna("NULL") fires —
    a plain astype(str) would render NaN as the literal 'nan' (and a
    null-bearing int column, arriving as float64, would render 3 as '3.0')."""
    if pd.api.types.is_numeric_dtype(s):
        out = s.convert_dtypes().astype("string")   # nullable: null -> <NA>
        out[s.isna()] = None
        return out
    return _sql_str(s)


def _where_clause(df: pd.DataFrame, key_cols) -> pd.Series:
    parts = [c + " = " + _sql_val(df[c]) for c in key_cols]
    out = parts[0]
    for p in parts[1:]:
        out = out + " AND " + p
    return out


def _key_values(df: pd.DataFrame, key_cols) -> pd.Series:
    out = _sql_val(df[key_cols[0]])
    for c in key_cols[1:]:
        out = out + ", " + _sql_val(df[c])
    return out


def format_sql(batch: pa.Table, table: str = "transcripts",
               key_cols=("conv_id", "turn_idx"),
               payload_cols=("role", "text", "tool"),
               reverse: bool = False) -> pa.Table:
    df = batch.to_pandas()
    where = _where_clause(df, key_cols)
    cols = [*key_cols, *payload_cols]
    values = _key_values(df, key_cols)
    for c in payload_cols:
        v = _sql_val(df[c])
        values = values + ", " + v.fillna("NULL")
    insert_sql = (f"REPLACE INTO {table} (" + ", ".join(cols) + ") VALUES (" +
                  values + ");")
    delete_sql = f"DELETE FROM {table} WHERE " + where + ";"

    is_del = df["op"].eq("delete")
    if not reverse:
        sql = np.where(is_del, delete_sql, insert_sql)
    else:
        # honest placeholders: updates are as before-image-less as deletes —
        # emitting the after-image REPLACE would RE-APPLY the change, not
        # undo it (use reverse_sql_with_before for real undo of both)
        is_ins = df["op"].eq("insert")
        sql = np.where(is_ins, delete_sql,
                       np.where(is_del,
                                "-- cannot reverse delete without before-image ("
                                + where + ")",
                                "-- cannot reverse update without before-image ("
                                + where + ")"))
    out = pa.table({
        "log_offset": batch.column("log_offset"),
        "sql": pa.array(sql.astype(object), type=pa.string()),
    })
    return out


def reverse_sql_with_before(events_ds, state_ds, table: str = "transcripts",
                            key_cols=("conv_id", "turn_idx"),
                            payload_cols=("role", "text", "tool"),
                            num_partitions: int = 32):
    """Undo SQL per event with the BEFORE-IMAGE joined from the lake state
    (row_data.reverse(), row_data.rs:54-69 — the reference reads before from
    the event; the lake model reconstructs it from state-as-of-before-apply):

    - insert              → keyed DELETE (remove the inserted row)
    - update/delete, key in state → REPLACE INTO with the before-image row
    - update with no prior row    → keyed DELETE (the upsert created it)

    One partitioned union-join (checker shape): both sides hash-partitioned
    by key, vectorized pandas merge per partition. Returns a Dataset of
    (log_offset, sql); apply in descending log_offset order to undo."""
    import numpy as np

    from ape_dts_ray.partition import COL_PART, add_partition_column

    kc, pcl = list(key_cols), list(payload_cols)

    # null-pad a column missing from one side with the TYPE the other side
    # carries (checker.check_datasets recipe) — a hard-coded pa.string()
    # made the union fail when an evolved non-string payload column (e.g.
    # a new int64) existed on only one side
    col_types: dict[str, pa.DataType] = {}
    for ds in (events_ds, state_ds):
        sch = ds.schema()
        if sch is None:
            continue
        for name, typ in zip(sch.names, sch.types):
            col_types.setdefault(name, typ)

    def tag(side, cols):
        def fn(t: pa.Table) -> pa.Table:
            keep = [c for c in cols if c in t.column_names]
            t = t.select(keep)
            for c in cols:            # align schemas for the union
                if c not in t.column_names:
                    typ = pa.int64() if c == "log_offset" else \
                        col_types.get(c, pa.string())
                    t = t.append_column(c, pa.nulls(t.num_rows, typ))
            t = t.append_column("_side", pa.array(
                np.full(t.num_rows, side, dtype=object), type=pa.string()))
            return add_partition_column(t, num_partitions,
                                        conv_col=kc[0], turn_col=kc[-1])
        return fn

    cols = [*kc, "log_offset", "op", *pcl]
    ev = events_ds.map_batches(tag("e", cols), batch_format="pyarrow")
    st = state_ds.map_batches(tag("s", cols), batch_format="pyarrow")

    def emit(group: pd.DataFrame) -> pd.DataFrame:
        e = group[group["_side"] == "e"]
        if e.empty:      # typed empty keeps the union schema stable
            return pd.DataFrame({"log_offset": pd.array([], dtype="int64"),
                                 "sql": pd.array([], dtype="string")})
        s = group[group["_side"] == "s"][[*kc, *pcl]]
        m = e[[*kc, "log_offset", "op"]].merge(
            s, on=kc, how="left", indicator=True)
        where = _where_clause(m, kc)
        delete_sql = f"DELETE FROM {table} WHERE " + where + ";"
        values = _key_values(m, kc)
        for c in pcl:
            values = values + ", " + _sql_val(m[c]).fillna("NULL")
        replace_sql = (f"REPLACE INTO {table} (" + ", ".join([*kc, *pcl]) +
                       ") VALUES (" + values + ");")
        has_before = m["_merge"].eq("both")
        is_ins = m["op"].eq("insert")
        sql = np.where(is_ins | ~has_before, delete_sql, replace_sql)
        return pd.DataFrame({"log_offset": m["log_offset"].astype("int64"),
                             "sql": sql.astype(object)})

    return (ev.union(st).groupby(COL_PART)
            .map_groups(emit, batch_format="pandas"))
