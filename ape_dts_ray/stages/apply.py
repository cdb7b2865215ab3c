"""The apply stage: per-(epoch, partition) LWW merge + delta write + lineage.

This is the Ray-Data translation of ape-dts's MergeParallelizer + sinker pool
(dt-parallelizer/src/merge_parallelizer.rs:53-191 + rdb_merger.rs:74-120): the
events are hash-shuffled by lake partition, and each (epoch, partition) group
is folded to one row per primary key (last writer by (log_offset, seq) wins;
deletes kept as tombstones), then written as ONE delta Parquet file whose name
is a deterministic function of (epoch, partition) — the retry-safe,
exactly-once write (see state/manifest.py).

Several epoch windows are applied in a single pipeline execution: the shuffle
key is ``_shard = epoch_index * num_partitions + part_id``, so one sort fans
out every (epoch, partition) group and no per-epoch barrier exists — the
streaming executor keeps all stages busy across epochs (the driver still
commits manifests in epoch order). Epoch windows have disjoint offset ranges,
so cross-epoch concurrency cannot violate LWW ordering (merge-on-read sorts by
(_epoch, log_offset, seq)).

Each task returns lineage rows (PartitionLineage analog of S3FileMeta,
s3_file_meta.rs:10-22); the driver assembles per-epoch manifests from them.

Unlike the reference there is NO serial fallback path: NULL keys are rejected
and PK-changes are pre-split (stages/normalize.py), so every group is
independent — this is what makes throughput scale with partitions.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ape_dts_ray.meta import COL_EPOCH, COL_OFFSET, COL_OP, OP_DELETE
from ape_dts_ray.stages.merge import lww_last

COL_SHARD = "_shard"

LINEAGE_SCHEMA = pa.schema([
    ("epoch", pa.int64()), ("part_id", pa.int32()), ("file", pa.string()),
    ("rows", pa.int64()), ("events", pa.int64()), ("upserts", pa.int64()),
    ("deletes", pa.int64()), ("offset_min", pa.int64()), ("offset_max", pa.int64()),
])


def _lineage_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return LINEAGE_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA)


def add_shard_column(batch: pa.Table, epoch_los: np.ndarray, epoch_ids: np.ndarray,
                     num_partitions: int, hot_keys=None,
                     part_col: str = "conv_id",
                     salt_col: str = "turn_idx",
                     hi_max: int | None = None) -> pa.Table:
    """Append ``_shard`` = epoch_index * P + part_id (vectorized).

    ``epoch_los``: ascending window lower bounds; ``epoch_ids``: the epoch
    number of each window (epoch = ids[searchsorted(los, offset, 'right')-1]).
    ``part_col``/``salt_col`` come from TableMeta (partition_col + the id col
    used to spread hot keys) — any PK shape works, not just transcripts.
    """
    from ape_dts_ray.partition import partition_ids

    if COL_SHARD in batch.column_names:
        # same refusal as add_partition_column: append_column would create
        # a duplicate field and the shard-decode downstream reads whichever
        # copy Arrow resolves — refuse the reserved column up front
        raise ValueError(
            f"events carry the reserved column {COL_SHARD!r} — drop or "
            "rename it before replay")
    off = batch.column(COL_OFFSET).to_numpy(zero_copy_only=False)
    idx = np.searchsorted(epoch_los, off, side="right") - 1
    if len(off) and idx.min() < 0:
        # an offset below the first window would wrap to epoch_ids[-1] and
        # silently outrank newer events in the LWW fold — a prefiltered
        # source / events_factory that leaks low offsets is a contract
        # violation, so fail loudly instead
        bad = int(off[idx < 0].min())
        raise ValueError(f"event offset {bad} below the first window's lo "
                         f"{int(epoch_los[0])} — source not window-filtered")
    if hi_max is not None and len(off) and off.max() > hi_max:
        # the symmetric leak: an offset above the last window would silently
        # land in the final epoch's delta and later re-apply under its true
        # epoch — same contract violation, same loud failure
        raise ValueError(f"event offset {int(off.max())} above the last "
                         f"window's hi {hi_max} — source not window-filtered")
    epochs = epoch_ids[idx]
    conv = batch.column(part_col).to_numpy(zero_copy_only=False)
    turn = batch.column(salt_col).to_numpy(zero_copy_only=False)
    pid = partition_ids(conv, turn, num_partitions, hot_keys)
    shard = epochs.astype(np.int64) * num_partitions + pid
    return batch.append_column(COL_SHARD, pa.array(shard))


# winner rows = lineage rows + the per-group winner offsets (narrow pass)
WINNER_SCHEMA = LINEAGE_SCHEMA.append(pa.field("winners", pa.list_(pa.int64())))


def _group_lineage(group: pa.Table, num_partitions: int,
                   lake_root: str, id_cols: tuple[str, ...]):
    """Shared core of the wide apply and the narrow winner pass: decode the
    shard id, fold LWW winners, and assemble the lineage row — ONE
    implementation so the two passes can never drift (the narrow path
    asserts their lineage rows are identical)."""
    shard = int(group.column(COL_SHARD)[0].as_py())
    epoch, part_id = divmod(shard, num_partitions)
    events = group.drop_columns([COL_SHARD])
    win = lww_last(events, key_cols=id_cols)
    deletes = int(pc.sum(pc.equal(win.column(COL_OP),
                                  pa.scalar(OP_DELETE))).as_py() or 0)
    offs = events.column(COL_OFFSET)
    path = os.path.join(lake_root, "delta", f"epoch-{epoch:08d}",
                        f"part-{part_id:05d}.parquet")
    row = {
        "epoch": epoch, "part_id": part_id,
        "file": os.path.relpath(path, lake_root),
        "rows": win.num_rows, "events": events.num_rows,
        "upserts": win.num_rows - deletes, "deletes": deletes,
        "offset_min": int(pc.min(offs).as_py()),
        "offset_max": int(pc.max(offs).as_py()),
    }
    return epoch, part_id, events, win, path, row


def make_winner_fn(lake_root: str, num_partitions: int, id_cols: tuple[str, ...]):
    """Pass 1 of the narrow-shuffle apply: the ``map_groups`` body over the
    NARROW projection (id cols + offset + seq + op) — computes per-group LWW
    winner offsets and the full lineage row, without ever moving the payload
    through the shuffle. SURVEY §7's 'project keys through the shuffle,
    rejoin payload by winner indices' plan."""

    def winner_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return WINNER_SCHEMA.empty_table()
        _, _, _, win, _, row = _group_lineage(group, num_partitions,
                                              lake_root, id_cols)
        row["winners"] = win.column(COL_OFFSET).to_pylist()
        return pa.Table.from_pylist([row], schema=WINNER_SCHEMA)

    return winner_group


def make_apply_fn(lake_root: str, num_partitions: int, id_cols: tuple[str, ...]):
    """Build the ``map_groups`` body. Captures only plain strings/ints (cheap
    to ship to tasks; no driver state)."""

    def apply_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _lineage_table([])
        # lww_last (inside _group_lineage) emits winners in canonical
        # (offset, seq) order (lww_winner_indices maintain_order) — delta
        # bytes are independent of shuffle arrival order without an extra
        # payload sort pass
        epoch, _, _, merged, path, row = _group_lineage(
            group, num_partitions, lake_root, id_cols)
        if COL_EPOCH in merged.column_names:
            # a source already carrying the reserved stamp (e.g. re-seeding
            # from another lake's exported delta/base files) would get a
            # DUPLICATE _epoch column — the delta commits fine and every
            # later fold then dies on the ambiguous field; refuse before
            # commit, with the fix named
            raise ValueError(
                f"events carry the reserved column {COL_EPOCH!r} — drop or "
                "rename it before replay (exported lake files keep engine "
                "columns)")
        merged = merged.append_column(
            COL_EPOCH, pa.array(np.full(merged.num_rows, epoch,
                                        dtype=np.int64)))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        from ape_dts_ray.state.manifest import atomic_write_parquet

        # atomic write to the deterministic per-(epoch, partition) name; the
        # manifest commit (driver-side, after ALL the epoch's writes) is the
        # atomicity point. lz4 for deltas: short-lived (compaction re-writes
        # zstd), cheaper codec = less CPU in the hot apply path
        atomic_write_parquet(merged, path, compression="lz4")
        return _lineage_table([row])

    return apply_group
