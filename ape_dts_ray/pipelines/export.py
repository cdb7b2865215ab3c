"""Resumable partitioned export: live lake state → a directory of Parquet
files, one per lake partition, with per-partition done markers.

The brief's output rule for 100-TB jobs: write partitioned Parquet (one file
per shard / key range) so a failed run skips finished partitions — never one
giant file. Each partition's write is atomic (tmp+rename) and followed by a
marker; a rerun folds and writes ONLY unmarked partitions (the lake layout
is partition-pure, so skipping is free — no shuffle, no scan of finished
partitions). The same recipe as the snapshot loader's resume
(pipelines/snapshot.py), applied on the way out.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from ape_dts_ray.state.lake import LakeTable, _retry_vanished_files
from ape_dts_ray.state.manifest import (atomic_write_parquet,
                                        atomic_write_text, read_part_markers)

DONE_DIR = "_done"


def export_done_partitions(out_dir: str) -> dict[int, int]:
    return read_part_markers(os.path.join(out_dir, DONE_DIR))


def export_state(lake: LakeTable, out_dir: str,
                 columns: list[str] | None = None,
                 drop_engine_cols: bool = True,
                 fail_after_parts: int | None = None) -> dict:
    """Export the lake's live state to ``out_dir`` as one Parquet file per
    partition, resumably. Returns {"rows": total, "partitions": [...]}.

    ``fail_after_parts`` is the test-only crash-injection hook (writer tasks
    raise once that many partitions are marked done)."""
    import ray.data as rd

    from ape_dts_ray.meta import COL_EPOCH, COL_OFFSET, COL_OP, COL_SEQ

    lake._refuse_if_truncating()
    if lake.rotation_in_progress():
        # mid-rotation, old-salt deltas coexist with a new-salt base (or
        # base/ is mid-swap): a fold would export a row set that never
        # existed — and the done markers would make the rerun keep it.
        # Same refusal contract as replay()/compact()/state reads.
        raise RuntimeError(
            "hot-key rotation in progress (rotation.json present) — re-run "
            "compact(new_hot_keys=...) to finish it before exporting")
    ddir = os.path.join(out_dir, DONE_DIR)
    os.makedirs(ddir, exist_ok=True)
    done = export_done_partitions(out_dir)
    pending = [{"part_id": p} for p in range(lake.config.num_partitions)
               if p not in done]
    root, meta, cfg, sv, ops = (lake.root, lake.meta, lake.config,
                                lake.schema_version, lake.schema_ops)
    engine_cols = (COL_EPOCH, COL_OFFSET, COL_SEQ, COL_OP, "part_id")

    def write_part(batch: pa.Table):   # generator UDF — lineage rows only
        lk = LakeTable(root, meta, cfg, sv, ops)
        for pid in batch.column("part_id").to_pylist():
            if fail_after_parts is not None and \
                    len(os.listdir(ddir)) >= fail_after_parts:
                raise RuntimeError("injected export crash")
            def fold_one(pid=pid):    # re-lists on retry: the reader/
                files = lk.partition_files(pid)   # compactor vanished-delta
                return lk._fold_files(files, columns=columns) \
                    if files else None            # race (lake.py helper doc)
            t = _retry_vanished_files(fold_one)
            n = 0
            if t is not None and t.num_rows:
                if drop_engine_cols:
                    t = t.drop_columns([c for c in engine_cols
                                        if c in t.column_names])
                sort_cols = [c for c in meta.order_cols
                             if c in t.column_names] \
                    or [c for c in meta.id_cols if c in t.column_names]
                if sort_cols:      # byte-determinism; generalized tables
                    t = t.sort_by([(c, "ascending") for c in sort_cols])
                atomic_write_parquet(
                    t, os.path.join(out_dir, f"part-{pid:05d}.parquet"),
                    compression="zstd")
                n = t.num_rows
            atomic_write_text(os.path.join(ddir, f"part-{pid:05d}.json"),
                              json.dumps({"part_id": pid, "rows": n}))
            yield pa.table({"part_id": pa.array([pid], pa.int32()),
                            "rows": pa.array([n], pa.int64())})

    if pending:
        (rd.from_items(pending)
         .map_batches(write_part, batch_format="pyarrow", batch_size=1)
         .take_all())
    final = export_done_partitions(out_dir)
    return {"rows": int(sum(final.values())), "partitions": sorted(final)}
