"""Snapshot (full-load) pipeline: base table → lake base files.

The reference's snapshot path (MysqlSnapshotExtractor keyset pagination →
SnapshotParallelizer round-robin slices → batch INSERTs,
mysql_snapshot_extractor.rs:158-227, snapshot_parallelizer.rs:62-84) maps to:
``read_parquet`` (parallel splits replace hand-rolled key ranges) → hash
partition → one task per lake partition writing a base Parquet file directly.

Snapshot rows rank BELOW every CDC event (log_offset = -1, _epoch = -1), so a
subsequent CDC replay upserts over them — the snapshot+cdc handoff of the
reference (snapshot finishes, cdc resumes from the snapshot position). A
``snapshot.json`` marker records completion (finished.log /
RdbSnapshotFinished analog, task_runner.rs:559-576); re-running the load is
idempotent (deterministic file names, marker overwritten).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ape_dts_ray.meta import COL_EPOCH, COL_OFFSET, COL_OP, COL_SEQ, OP_INSERT
from ape_dts_ray.partition import COL_PART, add_partition_column
from ape_dts_ray.state.lake import MANIFEST_DIR, LakeTable
from ape_dts_ray.state.manifest import atomic_write_parquet, atomic_write_text


def load_snapshot(lake: LakeTable, snapshot_ds, batch_size: int | None = None) -> dict:
    """Bulk-load a snapshot Dataset as the lake's base state. Returns the
    per-partition row counts (lineage)."""
    import json

    cfg = lake.config
    hot = frozenset(cfg.hot_keys) if cfg.hot_keys else None
    nparts = cfg.num_partitions

    def to_events(t: pa.Table) -> pa.Table:
        n = t.num_rows
        t = t.append_column(COL_OFFSET, pa.array(np.full(n, -1, dtype=np.int64)))
        t = t.append_column(COL_SEQ, pa.array(np.zeros(n, dtype=np.int32)))
        t = t.append_column(COL_OP, pa.array(np.full(n, OP_INSERT, dtype=object),
                                             type=pa.string()))
        t = t.append_column(COL_EPOCH, pa.array(np.full(n, -1, dtype=np.int64)))
        return add_partition_column(t, nparts, hot)

    ds = snapshot_ds.map_batches(to_events, batch_format="pyarrow",
                                 batch_size=batch_size)
    root = lake.root

    def write_base(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"part_id": pa.array([], pa.int32()),
                             "rows": pa.array([], pa.int64())})
        pid = int(group.column(COL_PART)[0].as_py())
        out = group.drop_columns([COL_PART])
        path = os.path.join(root, "base", f"part-{pid:05d}.parquet")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        atomic_write_parquet(out, path, compression="zstd")
        return pa.table({"part_id": pa.array([pid], pa.int32()),
                         "rows": pa.array([group.num_rows], pa.int64())})

    lineage = ds.groupby(COL_PART).map_groups(write_base, batch_format="pyarrow")
    rows = lineage.take_all()
    marker = {"rows": int(sum(r["rows"] for r in rows)),
              "partitions": sorted(int(r["part_id"]) for r in rows)}
    atomic_write_text(os.path.join(root, MANIFEST_DIR, "snapshot.json"),
                      json.dumps(marker, indent=1))
    return marker


def snapshot_finished(lake: LakeTable) -> bool:
    return os.path.exists(os.path.join(lake.root, MANIFEST_DIR, "snapshot.json"))
