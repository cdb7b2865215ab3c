"""Multi-table orchestration — the table-level parallelism of the reference.

ape-dts runs snapshot tables as concurrent single-table tasks bounded by a
``tb_parallel_size`` semaphore (dt-task/src/task_runner.rs:256-303) and fans
CDC batches out per table (TableParallelizer, table_parallelizer.rs:86-114).
Here each logical table is its own lake directory + replay pipeline; the
runner drives up to ``tb_parallel`` of them concurrently from driver threads
(Ray schedules all their tasks jointly), honoring the TableFilter allow/deny
wildcards and the Router's table-name map.

Tables already finished (their event log fully committed, finished.log analog)
are skipped on resume — each table's own watermark handles that.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ape_dts_ray.meta import COL_EPOCH, COL_OFFSET, COL_OP, EngineConfig, OP_DELETE, TableMeta
from ape_dts_ray.stages.filter import TableFilter
from ape_dts_ray.stages.router import Router
from ape_dts_ray.state.lake import LakeTable, MaintenanceInProgress, _dbg


@dataclass
class TableJob:
    name: str                    # source table name (schema.table style ok)
    events_path: str | list[str] | None = None
    events_ds: object = None
    meta: TableMeta | None = None
    config: EngineConfig | None = None
    replay_kwargs: dict = field(default_factory=dict)


def run_tables(
    lake_root: str,
    jobs: list[TableJob],
    table_filter: TableFilter | None = None,
    router: Router | None = None,
    tb_parallel: int = 4,
) -> dict[str, list]:
    """Replay every allowed table, ≤ tb_parallel concurrently. Returns
    {target_table_name: committed manifests}."""
    from ape_dts_ray.pipelines.replay import replay

    table_filter = table_filter or TableFilter()
    router = router or Router()

    def run_one(job: TableJob):
        target = router.route_table(job.name)
        lake = LakeTable.create(
            f"{lake_root}/{target}",
            job.meta or TableMeta(name=target),
            job.config or EngineConfig(),
            if_exists="ignore")
        router_fn = router.batch_fn(job.name)
        return target, replay(lake, events_path=job.events_path,
                              events_ds=job.events_ds, router_fn=router_fn,
                              **job.replay_kwargs)

    allowed = [j for j in jobs if not table_filter.filtered(j.name)]
    routed = {j.name: router.route_table(j.name) for j in allowed}
    if len(set(routed.values())) != len(routed):
        # same refusal as replay_mixed: two jobs routed onto one target
        # share a lake root, and their deterministic delta paths collide —
        # the second job's atomic writes silently erase the first's rows
        raise ValueError(
            "many-to-one table routing is not supported by run_tables "
            f"(targets: {sorted(routed.values())}) — union the sources "
            "upstream instead")
    results: dict[str, list] = {}
    with ThreadPoolExecutor(max_workers=max(1, tb_parallel)) as pool:
        for target, ms in pool.map(run_one, allowed):
            results[target] = ms
    return results


def replay_mixed(
    lake_root: str,
    tables: list[str],
    events_path: str | list[str] | None = None,
    events_ds=None,
    table_col: str = "table",
    meta: TableMeta | None = None,
    config: EngineConfig | None = None,
    table_filter: TableFilter | None = None,
    router: Router | None = None,
    group_epochs: int = 4,
    max_offset: int | None = None,
) -> dict[str, list]:
    """ONE interleaved event log carrying a ``table`` column → N lakes, in a
    single pass — the TableParallelizer batch fan-out
    (dt-parallelizer/src/table_parallelizer.rs:86-114: one merged batch is
    split per table and sunk concurrently), Ray-Data-first: the table index
    joins the shuffle key (``_shard = epoch·T·P + table·P + part``), so one
    sort routes every (epoch, table, partition) group to its own delta
    writer. No per-table re-read of the log.

    All tables share epoch geometry (the log's offsets are global), so each
    table's watermark is the same committed global offset — exactly the
    reference's single-binlog position shared by all tables. Resume re-runs
    any epoch missing from ANY table; per-table re-commits of already
    committed epochs are deterministic no-op overwrites. Unknown or filtered
    table names are dropped in the shard stage (TableFilter wildcards via
    ``table_filter``; renames via ``router``)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ape_dts_ray.partition import partition_ids
    from ape_dts_ray.pipelines.replay import _DS_BUILD_LOCK, plan_epochs
    from ape_dts_ray.stages.apply import LINEAGE_SCHEMA
    from ape_dts_ray.stages.merge import lww_last
    from ape_dts_ray.stages.normalize import normalize_batch
    from ape_dts_ray.state.manifest import (EpochManifest, PartitionLineage,
                                            atomic_write_parquet)

    table_filter = table_filter or TableFilter()
    router = router or Router()
    meta = meta or TableMeta()
    config = config or EngineConfig()
    src_tables = sorted(t for t in tables if not table_filter.filtered(t))
    targets = {t: router.route_table(t) for t in src_tables}
    if len(set(targets.values())) != len(targets):
        # two source tables mapped onto one target would both write the
        # SAME delta path per (epoch, partition) — the second atomic write
        # silently erases the first table's rows. Refuse; many-to-one
        # consolidation needs a union upstream, not colliding sinks.
        raise ValueError(f"many-to-one table routing is not supported by "
                         f"replay_mixed (targets: {sorted(targets.values())})")
    lakes = {t: LakeTable.create(os.path.join(lake_root, targets[t]),
                                 TableMeta(name=targets[t],
                                           id_cols=meta.id_cols,
                                           partition_col=meta.partition_col,
                                           order_cols=meta.order_cols,
                                           payload_cols=meta.payload_cols),
                                 config, if_exists="ignore")
             for t in src_tables}
    for t, lk in lakes.items():
        # a pre-existing lake returns ITS persisted config — epoch planning
        # below must use identical window boundaries or committed epoch ids
        # would be silently reinterpreted (replay() refuses the same way)
        if (lk.config.epoch_size != config.epoch_size
                or lk.config.num_partitions != config.num_partitions):
            raise ValueError(
                f"lake {lk.root} persisted epoch_size/num_partitions "
                f"({lk.config.epoch_size}/{lk.config.num_partitions}) differ "
                f"from the call's ({config.epoch_size}/"
                f"{config.num_partitions}) — resume with the lake's config")
        if lk.rotation_in_progress():
            raise MaintenanceInProgress(
                f"lake {lk.root}: hot-key rotation in "
                "progress — finish compact(new_hot_keys=...)")
        if lk.truncate_in_progress():
            raise MaintenanceInProgress(
                f"lake {lk.root}: truncate in progress — "
                "re-run truncate() first")
        from ape_dts_ray.pipelines.checker import REVISE_EPOCH_BASE
        if any(e >= REVISE_EPOCH_BASE for e in lk.committed_epochs()):
            raise RuntimeError(
                f"lake {lk.root} has committed revise epochs — compact() "
                "before replaying (revise rows outrank every normal epoch)")
    tidx = {t: i for i, t in enumerate(src_tables)}
    T, P = len(src_tables), config.num_partitions
    # plan-time placement generations, verified at every commit: a rotation
    # completing mid-chunk would leave rows placed under the old salt with
    # no marker left to refuse the commit (see LakeTable.commit_epoch)
    plan_gens = {t: lk.placement_gen for t, lk in lakes.items()}

    paths = None
    if events_path is not None and events_ds is None:
        paths = [events_path] if isinstance(events_path, str) else events_path
        if max_offset is None:
            from ape_dts_ray.pipelines.replay import max_offset_from_footers
            max_offset = max_offset_from_footers(paths)
            if max_offset is None:             # stats-less files: one-column
                mx = -1                        # scan, never a silent no-op
                for p in paths:
                    t = pq.read_table(p, columns=[COL_OFFSET])
                    if t.num_rows:
                        import pyarrow.compute as _pc
                        mx = max(mx, _pc.max(t.column(COL_OFFSET)).as_py())
                max_offset = mx
    elif max_offset is None:
        # a full upstream execution — callers who know the stream's span
        # (e.g. a derived log whose offsets mirror a parquet column) pass
        # max_offset and skip it
        max_offset = events_ds.max(COL_OFFSET)

    windows = plan_epochs(max_offset, config.epoch_size)
    # Per-lake done semantics (mirrors replay.py's single-lake planning): a
    # window is skippable only when EVERY lake holds it — via a committed
    # manifest OR folded past it into that lake's compacted base. The old
    # intersection-of-manifests + min(compacted_watermark) pair counted
    # NOTHING as done once one lake compacted (its manifests fold away, the
    # intersection empties, the other lake's watermark is still -1);
    # re-running those windows over a pruned source (the follow daemon
    # prunes segments below the pending floor) then committed EMPTY
    # manifests over the uncompacted lake's real ones — one lost LWW winner
    # in the concurrent-compactor verify drive.
    committed_sets = {t: set(lk.committed_epochs())
                      for t, lk in lakes.items()}
    win_by_id = {w.epoch: w for w in windows}
    for t, lk in lakes.items():
        # growing-log resume (see replay.py): this lake's tail epoch may
        # have been committed while the log was shorter — re-run the whole
        # window (deterministic delta names + manifest overwrite keep it
        # exactly-once)
        if not committed_sets[t]:
            continue
        last = max(committed_sets[t])
        w_last = win_by_id.get(last)
        if w_last is None:
            continue
        try:
            if lk.read_manifest(last).offset_max < w_last.hi:
                committed_sets[t].discard(last)
        except FileNotFoundError:
            # folded by a concurrent compactor between the listing and the
            # read — coverage moves to the compacted watermark read below
            committed_sets[t].discard(last)
        # re-finalize provisional manifests whose replanned window is now
        # FINAL with an identical span (replay.py does the same): without
        # the flip the fold prefix wedges behind them forever, since the
        # growing-log recommit never fires when offset_max == w.hi. Cheap:
        # post-fold only the unfolded suffix still has manifests.
        for e in sorted(committed_sets[t]):
            w = win_by_id.get(e)
            if w is None or not w.final:
                continue
            try:
                m = lk.read_manifest(e)
            except FileNotFoundError:
                continue                 # folded concurrently; cws covers
            if (not m.final and m.offset_min == w.lo
                    and m.offset_max == w.hi):
                lk.refinalize_epoch(m)
    # compacted watermarks are read AFTER the manifest snapshots: anything
    # a concurrent compactor folds between the two reads is covered by the
    # later watermark (truncate publishes compacted.json too, so this is
    # also the truncate clamp)
    cws = {t: lk.compacted_watermark() for t, lk in lakes.items()}
    pending = [w for w in windows
               if not all(w.hi <= cws[t] or w.epoch in committed_sets[t]
                          for t in src_tables)]
    if not pending:
        return {targets[t]: [] for t in src_tables}

    # per-table hot-key salts, adopted from each lake's PERSISTED config
    # (exactly like replay()'s refresh_placement): placement is a pure
    # function of (num_partitions, hot_keys) and each lake may have rotated
    # independently — one global set would double-place a rotated lake's hot
    # keys, and a caller-supplied set can never match N divergent lakes at
    # once. config.hot_keys only seeds lakes CREATED by this call; the
    # plan_gens check at commit still refuses a rotation landing mid-chunk.
    hots = [frozenset(lakes[t].config.hot_keys) or None for t in src_tables]
    any_hot = any(hots)
    id_cols = meta.id_cols
    roots = [lakes[t].root for t in src_tables]
    table_names = pa.array(src_tables, pa.string())  # index == tidx value
    # per-table floors for the shard stage: rows at/below a table's truncate
    # floor must never re-apply (replay.py clamps its read the same way —
    # without this, a window pending only because ANOTHER lake lacks it
    # resurrects pre-truncate history into the truncated lake), and rows in
    # a (window, table) pair that lake already holds are skipped so covered
    # lakes get neither orphan delta writes nor re-commits
    tfloors = np.array([lakes[t].truncate_offset for t in src_tables],
                       dtype=np.int64)

    def lake_done(t: str, w) -> bool:
        return w.hi <= cws[t] or w.epoch in committed_sets[t]

    def make_shard_fn(chunk):
        epoch_los = np.array([w.lo for w in chunk], dtype=np.int64)
        epoch_ids = np.array([w.epoch for w in chunk], dtype=np.int64)
        lo, hi = chunk[0].lo, chunk[-1].hi
        skip_mat = np.array([[lake_done(t, w) for t in src_tables]
                             for w in chunk], dtype=bool)   # (windows, T)

        def add_mixed_shard(t: pa.Table) -> pa.Table:
            keep = pc.and_(pc.greater_equal(t.column(COL_OFFSET), lo),
                           pc.less_equal(t.column(COL_OFFSET), hi))
            t = t.filter(keep)
            if t.num_rows == 0:
                return t.drop_columns([table_col]).append_column(
                    "_shard", pa.array([], pa.int64()))
            # vectorized name → table-index: index_in against the sorted
            # table list (whose positions ARE the tidx codes); unknown or
            # filtered names come back null and are dropped
            ti_arr = pc.index_in(t.column(table_col), value_set=table_names)
            t = t.filter(pc.is_valid(ti_arr))
            ti = ti_arr.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
            off = t.column(COL_OFFSET).to_numpy(zero_copy_only=False)
            widx = np.searchsorted(epoch_los, off, side="right") - 1
            row_keep = ~skip_mat[widx, ti] & (off > tfloors[ti])
            if not row_keep.all():
                t = t.filter(pa.array(row_keep))
                ti = ti[row_keep]
                off = off[row_keep]
                widx = widx[row_keep]
            epochs = epoch_ids[widx]
            conv = t.column(meta.partition_col).to_numpy(zero_copy_only=False)
            salt = id_cols[-1] if len(id_cols) > 1 else id_cols[0]
            turn = t.column(salt).to_numpy(zero_copy_only=False)
            if not any_hot:
                pid = partition_ids(conv, turn, P, None)
            else:
                # per-table salting: T is small, each subset vectorized
                pid = np.empty(len(conv), dtype=np.int64)
                for k in range(T):
                    mask = ti == k
                    if mask.any():
                        pid[mask] = partition_ids(conv[mask], turn[mask],
                                                  P, hots[k])
            shard = (epochs * T + ti) * P + pid
            return t.drop_columns([table_col]).append_column(
                "_shard", pa.array(shard))

        return add_mixed_shard

    def apply_group(group: pa.Table) -> pa.Table:
        # mirrors stages/apply.py::apply_group with the table axis decoded
        # from the shard key and per-table delta roots
        if group.num_rows == 0:
            return LINEAGE_SCHEMA.empty_table()
        shard = int(group.column("_shard")[0].as_py())
        et, part_id = divmod(shard, P)
        epoch, ti = divmod(et, T)
        events = group.drop_columns(["_shard"])
        if COL_EPOCH in events.column_names:
            # same refusal as stages/apply.py: a source carrying the
            # reserved stamp (exported lake files keep engine columns)
            # would commit a duplicate-field delta that breaks every fold
            raise ValueError(
                f"events carry the reserved column {COL_EPOCH!r} — drop or "
                "rename it before replay_mixed")
        merged = lww_last(events, key_cols=id_cols)   # canonical order (lww)
        n = merged.num_rows
        deletes = int(pc.sum(pc.equal(merged.column(COL_OP),
                                      pa.scalar(OP_DELETE))).as_py() or 0)
        merged = merged.append_column(
            COL_EPOCH, pa.array(np.full(n, epoch, dtype=np.int64)))
        root = roots[ti]
        path = os.path.join(root, "delta", f"epoch-{epoch:08d}",
                            f"part-{part_id:05d}.parquet")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        offs = events.column(COL_OFFSET)
        off_min, off_max = int(pc.min(offs).as_py()), int(pc.max(offs).as_py())
        if os.environ.get("APE_DEBUG_LOG"):   # args are cheap ints, but the
            _dbg("delta_write_mixed", root=root, epoch=epoch,  # guard keeps
                 pid_part=part_id, rows=n, events=events.num_rows,  # the hot
                 off_min=off_min, off_max=off_max)   # path call-free
        atomic_write_parquet(merged, path, compression="lz4")
        row = {"epoch": epoch * T + ti,   # (epoch, table) packed for routing
               "part_id": part_id, "file": os.path.relpath(path, root),
               "rows": n, "events": events.num_rows, "upserts": n - deletes,
               "deletes": deletes,
               "offset_min": off_min, "offset_max": off_max}
        return pa.Table.from_pylist([row], schema=LINEAGE_SCHEMA)

    import pyarrow.dataset as pads

    g = max(1, group_epochs)
    chunks = [pending[i:i + g] for i in range(0, len(pending), g)]
    spill = None
    if events_ds is not None:
        # same scratch-parquet spill as replay(): >1 chunk would re-execute
        # the full upstream Dataset once per chunk, and since the
        # stale-compactor retry below can re-run even a SINGLE chunk, a
        # non-deterministic upstream could otherwise yield different rows
        # across attempts — spill unconditionally so every execution reads
        # the same frozen parquet
        from ape_dts_ray.pipelines.replay import _SpillState

        spill = _SpillState()
        spilled = spill.write(events_ds)
        if spilled is not None:
            paths, events_ds = spilled, None
    results: dict[str, list] = {targets[t]: [] for t in src_tables}
    by_te: dict[tuple[int, int], list[dict]] = {}
    try:
        for chunk in chunks:    # group-size memory rule, same as replay()
            if paths is not None:
                expr = ((pads.field(COL_OFFSET) >= chunk[0].lo)
                        & (pads.field(COL_OFFSET) <= chunk[-1].hi))
                with _DS_BUILD_LOCK:
                    src = rd.read_parquet(paths, filter=expr)
                # Parquet sources: Ray's SplitBlocks emits ~30k-row
                # sub-blocks that flood the _shard sort with P² tiny
                # objects — the same 8× pitfall replay() re-bundles away
                # (replay.py / BASELINE.md r5). Real event rows, so bundle
                # to the tuned ~131k-row unit; the descriptor-stream branch
                # below keeps batch_size=None.
                bs = 131_072
            else:
                src = events_ds
                bs = None
            for attempt in range(5):
                # bounded chunk-level retry of the stale-compactor race
                # (replay.py's commit_verified re-runs one window; the
                # mixed apply is one shuffle for the whole chunk, so the
                # retry unit is the chunk — idempotent: deterministic
                # delta names, no-op re-commits). The soak showed this
                # race fires routinely under an aggressive compactor; a
                # loud death here would kill the daemon on a transient.
                for w in chunk:          # a retry re-derives the lineage
                    for i2 in range(T):
                        by_te.pop((w.epoch, i2), None)
                ds = (src.map_batches(lambda t: normalize_batch(t, id_cols),
                                      batch_format="pyarrow", batch_size=bs)
                      .map_batches(make_shard_fn(chunk),
                                   batch_format="pyarrow", batch_size=bs))
                lineage = ds.groupby("_shard").map_groups(
                    apply_group, batch_format="pyarrow").take_all()
                for r in lineage:
                    epoch, ti = divmod(r["epoch"], T)
                    by_te.setdefault((epoch, ti), []).append(
                        {**r, "epoch": epoch})
                # commit this chunk's windows (checkpoint granularity =
                # chunk, like replay()); re-commits are no-ops. (window,
                # lake) pairs the lake already held at PLAN time were
                # dropped at the shard stage — skip their commits too.
                committed_now: list[tuple[str, object]] = []
                failed = False
                for w in chunk:
                    for t in src_tables:
                        if lake_done(t, w):
                            continue
                        ti = tidx[t]
                        rows = sorted(by_te.get((w.epoch, ti), []),
                                      key=lambda r: r["part_id"])
                        m = EpochManifest(
                            epoch=w.epoch, offset_min=w.lo, offset_max=w.hi,
                            final=w.final, schema_version=w.schema_version,
                            partitions=[PartitionLineage(
                                **{k: v for k, v in r.items()
                                   if k != "epoch"})
                                for r in rows])
                        lakes[t].commit_epoch(
                            m, expect_placement_gen=plan_gens[t])
                        # post-commit delta verification (commit_verified
                        # analog): a stale compactor — snapshot taken
                        # before this tail recommit — can rmtree the
                        # epoch's files between write and commit with its
                        # published coverage BELOW our offset_max
                        missing = [p.file for p in m.partitions
                                   if not os.path.exists(
                                       os.path.join(lakes[t].root, p.file))]
                        if missing and \
                                lakes[t].compacted_watermark() < m.offset_max:
                            # UN-commit: with the manifest in place the
                            # retry would see the epoch complete and skip
                            # it, pinning the corruption
                            try:
                                os.remove(lakes[t].manifest_path(w.epoch))
                            except FileNotFoundError:
                                pass
                            failed = True
                        else:
                            committed_now.append((targets[t], m))
                if not failed:
                    results_chunk = committed_now
                    break
                if attempt == 4:
                    raise RuntimeError(
                        "delta files kept vanishing under concurrent "
                        "compaction without watermark coverage across "
                        f"{attempt + 1} chunk retries — stop the racing "
                        "compactor and re-run replay_mixed")
            for tgt, m in results_chunk:
                results[tgt].append(m)
    finally:
        if spill is not None:
            spill.cleanup()
    return results
