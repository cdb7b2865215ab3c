"""Event normalization: validation, op canonicalisation, PK-change splitting.

Reference semantics:
- NULL in a key column means "cannot merge" in ape-dts and forces the serial
  path (dt-common/src/meta/row_data.rs:183-199 — NULL hashes to 0 sentinel).
  We instead REJECT null-key events at the door (raise, or route to an error
  side-channel) — the transcripts PK is non-null by construction.
- An update that changes the primary/unique key cannot be merged or even
  partitioned in the reference (rdb_partitioner.rs:32-82 ``can_be_partitioned``
  → whole batch applies serially). We split such an event into
  delete(old key) + insert(new key) — exactly how ape-dts splits updates for
  its change-log lake sink (foxlake_pusher.rs:131-139, row_data.rs:71-82) —
  so each half hash-partitions to its own partition and no serial fallback is
  needed. The two halves keep the parent's ``log_offset`` and get
  ``seq`` = 0 (delete) / 1 (insert) so LWW ordering stays total.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ape_dts_ray.meta import COL_OFFSET, COL_OP, COL_SEQ, OP_DELETE, OP_INSERT


class NullKeyError(ValueError):
    pass


def validate_events(batch: pa.Table, key_cols=("conv_id", "turn_idx")) -> pa.Table:
    """Reject events with NULL primary-key columns (row_data.rs:183-199 analog)."""
    for c in key_cols:
        nulls = batch.column(c).null_count
        if nulls:
            raise NullKeyError(f"{nulls} events with NULL key column {c!r}")
    return batch


def ensure_seq(batch: pa.Table) -> pa.Table:
    if COL_SEQ not in batch.column_names:
        batch = batch.append_column(COL_SEQ, pa.array(np.zeros(batch.num_rows, dtype=np.int32)))
    return batch


def split_pk_change(
    batch: pa.Table,
    new_key_col: str | None = None,
    key_col: str | None = None,
    key_cols=("conv_id", "turn_idx"),
) -> pa.Table:
    """Split PK-change updates (non-null ``new_key_col``) into
    delete(old key, seq=0) + insert(new key, seq=1); drop the helper column.

    The helper column defaults to ``new_<last key col>`` — derived from
    ``key_cols`` so generic tables work (an explicit ``new_turn_idx`` on a
    table whose keys don't include ``turn_idx`` previously crashed here).

    Vectorized: one filter + one take per side, no row loop.
    """
    batch = ensure_seq(batch)
    if key_col is None:
        key_col = key_cols[-1]
    if new_key_col is None:
        new_key_col = f"new_{key_col}"
    if new_key_col not in batch.column_names or key_col not in batch.column_names:
        return batch
    is_change = pc.and_(
        batch.column(new_key_col).is_valid(),
        pc.not_equal(batch.column(COL_OP), pa.scalar(OP_DELETE)),
    )
    if pc.sum(is_change).as_py() in (None, 0):
        return batch.drop_columns([new_key_col])

    normal = batch.filter(pc.invert(is_change)).drop_columns([new_key_col])
    changed = batch.filter(is_change)

    n = changed.num_rows
    # delete half: old key, payload nulled, op=delete, seq=0
    del_half = changed.drop_columns([new_key_col])
    del_half = del_half.set_column(
        del_half.column_names.index(COL_OP), COL_OP,
        pa.array([OP_DELETE] * n, type=pa.string()))
    # seq FORCED to 0, not inherited: a source that populates seq (e.g. a
    # multi-event-per-offset stream) could carry seq>=2 into the delete
    # half, which would then outrank same-offset seq-1 events — the
    # documented contract is delete=0 / insert=1 at the change's offset
    del_half = del_half.set_column(
        del_half.column_names.index(COL_SEQ), COL_SEQ,
        pa.array(np.zeros(n, dtype=np.int32)))
    for col in del_half.column_names:
        if col in (COL_OFFSET, COL_SEQ, COL_OP) or col in key_cols or col == key_col:
            continue
        idx = del_half.column_names.index(col)
        del_half = del_half.set_column(idx, col, pa.nulls(n, type=del_half.column(col).type))
    # insert half: new key, full payload, op=insert, seq=1
    ins_half = changed.set_column(
        changed.column_names.index(key_col), key_col,
        changed.column(new_key_col).cast(changed.schema.field(key_col).type))
    ins_half = ins_half.drop_columns([new_key_col])
    ins_half = ins_half.set_column(
        ins_half.column_names.index(COL_OP), COL_OP,
        pa.array([OP_INSERT] * n, type=pa.string()))
    ins_half = ins_half.set_column(
        ins_half.column_names.index(COL_SEQ), COL_SEQ,
        pa.array(np.ones(n, dtype=np.int32)))
    return pa.concat_tables([normal, del_half, ins_half]).combine_chunks()


def normalize_batch(batch: pa.Table, key_cols=("conv_id", "turn_idx")) -> pa.Table:
    batch = ensure_seq(batch)
    batch = split_pk_change(batch, key_cols=key_cols)
    return validate_events(batch, key_cols)
