"""Vectorized last-writer-wins (LWW) merge kernels.

Semantics mirror ape-dts's micro-batch compaction (``RdbMerger``,
dt-parallelizer/src/rdb_merger.rs:74-120): within a batch, events are folded
per primary key — Update behaves as delete(before)+insert(after), the last
event by log position wins. The reference keys groups by a 128-bit hash of the
id-col values and bails out to a serial path on NULL keys / hash collisions /
changed unique keys (rdb_merger.rs:54-59,124-161; row_data.rs:183-199). We
compare actual key tuples (no collisions), reject NULL keys at validation
(transcripts PK is non-null by construction), and turn PK-change updates into
delete(old)+insert(new) upstream (stages/normalize.py) — so there is no serial
fallback at all, which is what makes the apply stage embarrassingly parallel.

Kernels are Arrow-in/Arrow-out and vectorized (polars sort+unique — no Python
row loops); they run inside ``map_groups`` / ``map_batches`` per partition.
"""

from __future__ import annotations

from collections.abc import Sequence

import polars as pl
import pyarrow as pa

from ape_dts_ray.meta import COL_OFFSET, COL_OP, COL_SEQ, OP_DELETE

KEY_COLS = ("conv_id", "turn_idx")
ORDER_COLS = (COL_OFFSET, COL_SEQ)


def lww_winner_indices(
    events: pa.Table,
    key_cols: Sequence[str] = KEY_COLS,
    order_cols: Sequence[str] = ORDER_COLS,
) -> "pl.Series":
    """Row indices of the last event per key by ``order_cols``. Operates on
    the NARROW key+order columns only — the wide payload (text) is never
    sorted or shuffled; winners are gathered afterwards with ``Table.take``."""
    missing = [c for c in order_cols if c not in events.column_names]
    if missing:
        # refusal, not silence: ranking by a subset of the requested order
        # silently changes which row wins (e.g. a piece without its _epoch
        # stamp would lose to base rows regardless of offset)
        raise ValueError(f"lww: order column(s) {missing} missing from the "
                         "table")
    order = list(order_cols)
    narrow = pl.from_arrow(events.select([*key_cols, *order]))
    narrow = narrow.with_row_index("_row")
    # maintain_order: winners come out in (order_cols) order, so the single
    # downstream Table.take already yields canonical rows — no extra
    # full-payload sort pass needed for byte-deterministic delta files
    out = narrow.sort(order).unique(subset=list(key_cols), keep="last",
                                    maintain_order=True)
    return out["_row"]


def lww_last(
    events: pa.Table,
    key_cols: Sequence[str] = KEY_COLS,
    order_cols: Sequence[str] = ORDER_COLS,
) -> pa.Table:
    """Collapse an event table to one row per key: the last event by
    ``order_cols``. Keeps delete events as rows (tombstones) — the caller
    decides whether to drop them (delta files keep them; final state drops).

    RdbMerger analog: rdb_merger.rs:74-120 (delete_rows/insert_rows fold).
    """
    if events.num_rows == 0:
        return events
    idx = lww_winner_indices(events, key_cols, order_cols)
    return events.take(pa.array(idx.to_numpy())).combine_chunks()


def drop_tombstones(state: pa.Table, op_col: str = COL_OP) -> pa.Table:
    import pyarrow.compute as pc

    if state.num_rows == 0 or op_col not in state.column_names:
        return state
    return state.filter(pc.not_equal(state.column(op_col), pa.scalar(OP_DELETE)))


def _alias_type(alias: str) -> pa.DataType:
    """Arrow type from a string alias, extended with decimal128(p,s) which
    ``pa.type_for_alias`` does not parse (needed by widen ops fed from the
    DDL-text adapter's DECIMAL/NUMERIC mapping)."""
    import re

    m = re.match(r"^decimal128\((\d+),\s*(\d+)\)$", alias)
    if m:
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    return pa.type_for_alias(alias)


def apply_schema_ops(t: pa.Table, ops: Sequence[dict]) -> pa.Table:
    """Non-additive schema evolution at merge-on-read — the DDL family the
    reference parses from the source (dt-common/src/meta/ddl_meta/
    ddl_type.rs:7-36 RenameTable/AlterTable/DropColumn...; the sinker drops
    its cached meta on DDL, mysql_sinker.rs:123-128). Here each op is a pure
    table transform applied to every piece (base/delta of any era) before the
    LWW fold, so files written under the old schema read back under the new:

    - {"op": "rename", "from": a, "to": b} — rename; if a piece carries BOTH
      (a mixed-era delta), per-row coalesce(b, a): a post-barrier row never
      holds the old column non-null, so new wins row-wise.
    - {"op": "drop", "col": c} — column removed from the table.
    - {"op": "widen", "col": c, "type": alias} — cast to a wider type
      (int32→int64, float32→float64, ...).

    Renaming/dropping an id col is rejected at registration
    (LakeTable.set_schema_ops) — the LWW key must stay stable. Ops are
    applied in list order, so chained renames (a→b, then b→c) compose.
    """
    import pyarrow.compute as pc

    for op in ops:
        kind = op["op"]
        if kind == "rename":
            src, dst = op["from"], op["to"]
            has_src, has_dst = src in t.column_names, dst in t.column_names
            if has_src and has_dst:
                dst_type = t.schema.field(dst).type
                merged = pc.coalesce(t.column(dst), t.column(src).cast(dst_type))
                t = t.set_column(t.column_names.index(dst), dst, merged)
                t = t.drop_columns([src])
            elif has_src:
                t = t.rename_columns(
                    [dst if c == src else c for c in t.column_names])
        elif kind == "drop":
            if op["col"] in t.column_names:
                t = t.drop_columns([op["col"]])
        elif kind == "widen":
            c = op["col"]
            if c in t.column_names:
                t = t.set_column(t.column_names.index(c), c,
                                 t.column(c).cast(_alias_type(op["type"])))
        else:
            raise ValueError(f"unknown schema op: {kind!r}")
    return t


def unify_tables(tables: list[pa.Table]) -> list[pa.Table]:
    """Additive schema evolution: align tables to the unified schema,
    null-backfilling missing columns (ape-dts column-mapping rule — columns
    absent from an event are simply absent; targets null-fill them, SURVEY §1.2).
    """
    tables = [t for t in tables if t is not None]
    schemas = [t.schema for t in tables]
    unified = pa.unify_schemas(schemas, promote_options="permissive")
    out = []
    for t in tables:
        arrays = []
        for f in unified:
            if f.name in t.column_names:
                arrays.append(t.column(f.name).cast(f.type))
            else:
                arrays.append(pa.nulls(t.num_rows, type=f.type))
        out.append(pa.Table.from_arrays(arrays, schema=unified))
    return out


def fold_state(
    pieces: list[pa.Table],
    key_cols: Sequence[str] = KEY_COLS,
    order_cols: Sequence[str] = ("_epoch", COL_OFFSET, COL_SEQ),
    keep_tombstones: bool = False,
) -> pa.Table | None:
    """Merge-on-read for one lake partition: fold base + delta tables (each
    already LWW-unique per key within itself) into live state. Base rows carry
    ``_epoch = -1`` so any delta beats them; across deltas the (epoch, offset)
    order decides. This is the engine-side equivalent of the reference's
    target-side merge-on-read (StarRocks/ClickHouse sign+version columns,
    starrocks_sinker.rs:102-126; Foxlake MERGE ... DEDUPLICATION='SOURCE',
    foxlake_merger.rs:82-104).
    """
    pieces = [p for p in pieces if p is not None and p.num_rows > 0]
    if not pieces:
        return None
    aligned = unify_tables(pieces)
    cat = pa.concat_tables(aligned)
    for c in order_cols:
        # unify_tables null-backfills a column missing from a piece, and
        # polars sorts nulls FIRST — a delta lacking its _epoch stamp would
        # silently rank below base rows (_epoch=-1) and resurrect stale
        # state. That's a corrupt/foreign file: refuse loudly instead.
        if c not in cat.column_names or cat.column(c).null_count:
            raise ValueError(
                f"fold_state: order column {c!r} missing or null in a "
                "piece — unstamped rows cannot be ranked")
    merged = lww_last(cat, key_cols, order_cols)
    if not keep_tombstones:
        merged = drop_tombstones(merged)
    return merged
