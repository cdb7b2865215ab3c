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


SNAP_PART_DIR = "snapshot_parts"


def _snap_part_dir(lake: LakeTable) -> str:
    return os.path.join(lake.root, MANIFEST_DIR, SNAP_PART_DIR)


def snapshot_done_partitions(lake: LakeTable) -> dict[int, int]:
    """{part_id: rows} for partitions whose base file is complete — the
    per-partition progress the resumer skips (snapshot_resumer.rs:29-174
    keeps a keyset cursor; the Ray-idiomatic unit of progress is the hash
    partition, whose base write is atomic)."""
    from ape_dts_ray.state.manifest import read_part_markers

    return read_part_markers(_snap_part_dir(lake))


def load_snapshot(lake: LakeTable, snapshot_ds, batch_size: int | None = None,
                  fail_after_parts: int | None = None) -> dict:
    """Bulk-load a snapshot Dataset as the lake's base state. Returns the
    per-partition row counts (lineage).

    RESUMABLE: each partition's base write is atomic and followed by a
    progress marker; a killed load re-runs with the finished partitions'
    ROWS FILTERED OUT AT THE SOURCE (their part id is a pure function of the
    key), so only unfinished partitions are re-read, re-shuffled and
    re-written — a crashed 100-TB load does not restart from zero. A marker
    without its base write cannot exist (write order), and a base write
    without a marker is simply redone (idempotent deterministic content).

    ``fail_after_parts`` is a test-only fault-injection hook: writer tasks
    raise once that many partitions are marked done (stop_after_epoch
    analog)."""
    import json

    cfg = lake.config
    hot = frozenset(cfg.hot_keys) if cfg.hot_keys else None
    nparts = cfg.num_partitions
    root = lake.root
    pdir = _snap_part_dir(lake)
    os.makedirs(pdir, exist_ok=True)
    done = snapshot_done_partitions(lake)
    not_null_cols = tuple(c["col"] for c in lake.constraints
                          if c["type"] == "not_null")
    # unique constraints + unique-kind indexes (structure/index.rs analog)
    unique_sets = lake.unique_column_sets()

    def to_events(t: pa.Table) -> pa.Table:
        for c in not_null_cols:          # constraint enforcement (hard):
            if c in t.column_names:      # structure_type.rs NOT-NULL analog
                nulls = t.column(c).null_count
                if nulls:
                    raise ValueError(
                        f"snapshot violates NOT NULL({c}): {nulls} null rows")
        clash = [c for c in (COL_OFFSET, COL_SEQ, COL_OP, COL_EPOCH)
                 if c in t.column_names]
        if clash:
            # a snapshot source already carrying engine columns (e.g.
            # re-ingesting an exported change log) would get DUPLICATE
            # fields from append_column — the base commits fine and every
            # later fold dies on the ambiguity; same refusal family as
            # partition.py's COL_PART guard
            raise ValueError(
                f"snapshot rows carry reserved engine column(s) {clash} — "
                "drop or rename them before load_snapshot")
        n = t.num_rows
        t = t.append_column(COL_OFFSET, pa.array(np.full(n, -1, dtype=np.int64)))
        t = t.append_column(COL_SEQ, pa.array(np.zeros(n, dtype=np.int32)))
        t = t.append_column(COL_OP, pa.array(np.full(n, OP_INSERT, dtype=object),
                                             type=pa.string()))
        t = t.append_column(COL_EPOCH, pa.array(np.full(n, -1, dtype=np.int64)))
        # partition by the SAME columns replay shards by (meta.partition_col
        # + the salt id col) — a snapshot placed by different columns would
        # strand base rows in partitions CDC deltas never reach
        ids = lake.meta.id_cols
        t = add_partition_column(
            t, nparts, hot, conv_col=lake.meta.partition_col,
            turn_col=ids[-1] if len(ids) > 1 else ids[0])
        if done:   # resume: drop rows of finished partitions at the source
            pid = t.column(COL_PART).to_numpy(zero_copy_only=False)
            mask = ~np.isin(pid, np.fromiter(done, dtype=np.int64))
            t = t.filter(pa.array(mask))
        return t

    ds = snapshot_ds.map_batches(to_events, batch_format="pyarrow",
                                 batch_size=batch_size)

    def write_base(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"part_id": pa.array([], pa.int32()),
                             "rows": pa.array([], pa.int64())})
        if fail_after_parts is not None and \
                len(os.listdir(pdir)) >= fail_after_parts:
            raise RuntimeError("injected snapshot-load crash")
        pid = int(group.column(COL_PART)[0].as_py())
        out = group.drop_columns([COL_PART])
        # canonical key order: base bytes independent of shuffle arrival
        out = out.sort_by([(c, "ascending") for c in lake.meta.id_cols])
        # UNIQUE enforcement within the partition (sound globally for sets
        # the placement hash is a function of — the id cols; others are
        # additionally sample-checked by precheck)
        for cols in ((lake.meta.id_cols,) + unique_sets):
            keep = [c for c in cols if c in out.column_names]
            if not keep:
                continue
            import pyarrow.compute as pc
            # SQL UNIQUE permits multiple NULLs — exclude null tuples
            # (id cols are separately NOT-NULL-validated upstream)
            tuples = out.select(keep)
            valid = pc.is_valid(tuples.column(keep[0]))
            for c2 in keep[1:]:
                valid = pc.and_(valid, pc.is_valid(tuples.column(c2)))
            grp = tuples.filter(valid).group_by(keep).aggregate(
                [([], "count_all")])
            dups = pc.sum(pc.greater(grp.column("count_all"),
                                     pa.scalar(1))).as_py() or 0
            if dups:
                raise ValueError(
                    f"snapshot violates UNIQUE({', '.join(keep)}): "
                    f"{dups} duplicated key tuples in partition {pid}")
        path = os.path.join(root, "base", f"part-{pid:05d}.parquet")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        atomic_write_parquet(out, path, compression="zstd")
        atomic_write_text(os.path.join(pdir, f"part-{pid:05d}.json"),
                          json.dumps({"part_id": pid, "rows": group.num_rows}))
        return pa.table({"part_id": pa.array([pid], pa.int32()),
                         "rows": pa.array([group.num_rows], pa.int64())})

    lineage = ds.groupby(COL_PART).map_groups(write_base, batch_format="pyarrow")
    lineage.take_all()
    final = snapshot_done_partitions(lake)   # markers incl. resumed runs
    marker = {"rows": int(sum(final.values())),
              "partitions": sorted(final)}
    atomic_write_text(os.path.join(root, MANIFEST_DIR, "snapshot.json"),
                      json.dumps(marker, indent=1))
    return marker


def snapshot_finished(lake: LakeTable) -> bool:
    return os.path.exists(os.path.join(lake.root, MANIFEST_DIR, "snapshot.json"))
