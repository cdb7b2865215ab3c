"""The apply stage: per-partition LWW merge + delta write + lineage.

This is the Ray-Data translation of ape-dts's MergeParallelizer + sinker pool
(dt-parallelizer/src/merge_parallelizer.rs:53-191 + rdb_merger.rs:74-120): the
epoch's events are hash-shuffled by lake partition (``groupby(part_id)``), and
each group is folded to one row per primary key (last writer by
(log_offset, seq) wins; deletes kept as tombstones), then written as ONE delta
Parquet file whose name is a deterministic function of (epoch, partition) —
the retry-safe, exactly-once write (see state/manifest.py).

The task returns a single lineage row (PartitionLineage analog of S3FileMeta,
s3_file_meta.rs:10-22); the driver assembles the epoch manifest from those and
commits it atomically.

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
from ape_dts_ray.partition import COL_PART
from ape_dts_ray.stages.merge import lww_last
from ape_dts_ray.state.manifest import atomic_write_parquet


def make_apply_fn(lake_root: str, epoch: int, id_cols: tuple[str, ...],
                  delta_path_fmt: str | None = None):
    """Build the ``map_groups`` body for one epoch. Captures only plain
    strings/ints (cheap to ship to tasks; no driver state)."""

    def apply_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _lineage_table([])
        part_id = int(group.column(COL_PART)[0].as_py())
        events = group.drop_columns([COL_PART])
        merged = lww_last(events, key_cols=id_cols)
        n = merged.num_rows
        is_del = pc.equal(merged.column(COL_OP), pa.scalar(OP_DELETE))
        deletes = int(pc.sum(is_del).as_py() or 0)
        merged = merged.append_column(
            COL_EPOCH, pa.array(np.full(n, epoch, dtype=np.int64)))

        path = os.path.join(
            lake_root, "delta", f"epoch-{epoch:08d}", f"part-{part_id:05d}.parquet")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        atomic_write_parquet(merged, path, compression="zstd")

        offs = events.column(COL_OFFSET)
        row = {
            "part_id": part_id,
            "file": os.path.relpath(path, lake_root),
            "rows": n,
            "events": events.num_rows,
            "upserts": n - deletes,
            "deletes": deletes,
            "offset_min": int(pc.min(offs).as_py()),
            "offset_max": int(pc.max(offs).as_py()),
        }
        return _lineage_table([row])

    return apply_group


LINEAGE_SCHEMA = pa.schema([
    ("part_id", pa.int32()), ("file", pa.string()), ("rows", pa.int64()),
    ("events", pa.int64()), ("upserts", pa.int64()), ("deletes", pa.int64()),
    ("offset_min", pa.int64()), ("offset_max", pa.int64()),
])


def _lineage_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return LINEAGE_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA)
