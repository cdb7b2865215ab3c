"""End-to-end CDC replay: event log → committed Parquet lake state.

Pipeline (SURVEY §7 target shape; lifecycle mirrors the reference's CDC task
wiring, dt-task/src/task_runner.rs:398-602 + dt-pipeline/src/base_pipeline.rs:
59-141, re-expressed as ONE Ray Data pipeline with exactly one shuffle):

    read events in [lo, hi]            read_parquet(filter=...) | Dataset | factory
      → normalize (validate, PK-change split)        map_batches, Arrow
      → event filter / router (optional)             map_batches, Arrow
      → _shard = epoch_idx·P + hash(PK) (hot-salted) map_batches, Arrow
      → groupby(_shard).map_groups(apply)            THE shuffle + delta write
      → lineage rows → per-epoch manifests → atomic commits in order (driver)

Multiple epoch windows are applied per pipeline execution (``group_epochs``):
windows have disjoint offset ranges so their (epoch, partition) groups are
independent — the streaming executor pipelines them without per-epoch
barriers, and the driver still commits manifests in epoch order. Group size =
checkpoint granularity (a crash re-runs at most one group).

Epoch windows never span a schema-change offset — the DDL barrier
(dt-connector/src/extractor/base_extractor.rs:118-124 drains the queue before
pushing a DDL; we cut the window instead). Resume: committed epochs are
skipped wholesale (cdc_resumer.rs analog); a partially applied group re-runs
and its deterministic delta names make the re-apply idempotent.

NOTE batch_size: replay stages use batch_size=None (one batch per block).
Setting a row-count batch_size on a stage whose upstream emits few-row
descriptor blocks (range/manifest datasets) makes Ray bundle that many INPUT
rows into one task and the pipeline collapses to a single task.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

# Dataset CONSTRUCTION (read_parquet → filesystem resolution) is not safe to
# race from overlapped group threads: Ray probes `fsspec.implementations.http`
# on every read, and with aiohttp absent a concurrent import of that module
# leaves a partially-initialized module that raises a plain ImportError (not
# the ModuleNotFoundError Ray catches). Construction is cheap (metadata only)
# — serialize it; EXECUTION stays concurrent.
_DS_BUILD_LOCK = threading.Lock()

from ape_dts_ray.meta import COL_OFFSET, EngineConfig
from ape_dts_ray.stages.apply import COL_SHARD, add_shard_column, make_apply_fn
from ape_dts_ray.stages.normalize import normalize_batch
from ape_dts_ray.state.lake import LakeTable, MaintenanceInProgress
from ape_dts_ray.state.manifest import EpochManifest, PartitionLineage


@dataclass(frozen=True)
class EpochWindow:
    epoch: int
    lo: int          # inclusive
    hi: int          # inclusive
    schema_version: int = 0
    # False iff this window was cut short by the END OF THE LOG (hi ==
    # max_offset with no natural boundary there): a growing log may extend
    # it, so its commit is re-runnable and must never be folded into base
    # (manifest.py EpochManifest.final). Synthetic/ad-hoc windows default
    # to final: only plan_epochs-produced tails are extendable.
    final: bool = True


def suggest_epoch_config(avg_event_bytes: int, num_cpus: int = 32,
                         block_rows: int = 125_000,
                         target_group_bytes: int = 1 << 30) -> dict:
    """Memory-aware window sizing. The shuffle materializes each group in the
    object store, so a group (epoch_size × group_epochs × bytes/event) must
    stay well under the store's budget or the sort spills and throughput
    collapses (measured 8.6× on 1KB-text rows). Rule encoded here: group ≈
    1 GiB, split into ≥2 epochs (checkpoint granularity), epochs a multiple of
    the source block size."""
    group_events = max(2 * block_rows, target_group_bytes // max(1, avg_event_bytes))
    group_epochs = 2 if group_events < 4 * block_rows else 4
    epoch_size = max(block_rows, (group_events // group_epochs)
                     // block_rows * block_rows)
    return {"epoch_size": epoch_size, "group_epochs": group_epochs,
            "pipeline_depth": 1 if avg_event_bytes > 512 else 2}


def plan_epochs(max_offset: int, epoch_size: int,
                barriers: list[tuple[int, int]] | None = None,
                min_offset: int = 0, base_epoch: int = 0,
                commit_offsets=None, align: bool = False) -> list[EpochWindow]:
    """Cut [min_offset, max_offset] into epoch windows of ≤ epoch_size events,
    additionally cutting at schema-change barriers.

    ``barriers`` = [(offset, new_schema_version)]: the window containing
    ``offset`` ends at offset-1; events from ``offset`` on carry the new
    version (base_extractor.rs:118-124 barrier semantics).

    ``base_epoch``: first epoch id — used by ``replay`` when planning from a
    non-zero ``min_offset`` so ids stay globally offset-derived and never
    collide with previously committed epochs.

    ``commit_offsets``: sorted offsets of transaction COMMIT events (each is
    the last event of a source transaction). When given, every window end is
    SNAPPED to a commit offset — down to the largest commit ≤ the size
    target, or (for a transaction longer than an epoch) up to the next
    commit — so no epoch boundary, and therefore no resume point, ever
    splits a transaction. This is the reference's Begin/Commit-aligned
    checkpointing (dt-pipeline/src/base_pipeline.rs:239-268: positions are
    recorded only when a full transaction has been sunk). Schema barriers
    must themselves be transaction-aligned (offset-1 a commit)."""
    cuts = sorted(set(b[0] for b in (barriers or [])
                      if min_offset < b[0] <= max_offset))
    ver_at = sorted(barriers or [])
    co = None
    if commit_offsets is not None:
        co = np.asarray(sorted(set(int(c) for c in commit_offsets)),
                        dtype=np.int64)
        for c in cuts:
            if len(co) and not np.any(co == c - 1):
                raise ValueError(
                    f"schema barrier at {c} is not transaction-aligned "
                    f"(offset {c - 1} is not a commit)")
    windows, epoch, lo = [], base_epoch, min_offset
    version = 0
    for boff, bver in ver_at:
        if boff <= min_offset:
            version = max(version, bver)
    bounds = cuts + [max_offset + 1]
    for bound in bounds:
        while lo < bound:
            # align=True snaps window ends to global epoch_size boundaries
            # (epoch = offset // epoch_size), so a misaligned min_offset
            # yields one short first window and then boundary-aligned ones —
            # the id↔offset-range mapping is stable across replays
            if align:
                nat = (lo // epoch_size + 1) * epoch_size - 1
            else:
                nat = lo + epoch_size - 1
            hi = min(nat, bound - 1)
            if co is not None and hi < bound - 1:
                i = np.searchsorted(co, hi, side="right") - 1
                if i >= 0 and co[i] >= lo:
                    hi = int(co[i])            # snap down to the last commit
                else:
                    j = np.searchsorted(co, hi, side="right")
                    if j < len(co) and co[j] < bound - 1:
                        hi = int(co[j])        # oversized txn: extend to its end
                    else:
                        hi = bound - 1
            # a window is EXTENDABLE (final=False) only when the log end was
            # what cut it: hi == max_offset and no natural size boundary
            # coincides there. Barrier cuts (bound < max_offset + 1),
            # size-boundary ends and commit snaps below the log end are all
            # natural — re-planning a longer log reproduces them verbatim.
            windows.append(EpochWindow(epoch, lo, hi, version,
                                       final=(hi < max_offset or hi == nat)))
            epoch += 1
            lo = hi + 1
        for boff, bver in ver_at:
            if boff == bound:
                version = bver
    return windows


def apply_windows(
    lake: LakeTable,
    windows: list[EpochWindow],
    events_path: str | list[str] | None = None,
    events_ds=None,
    window_prefiltered: bool = False,
    event_filter=None,
    router_fn=None,
    batch_size: int | None = None,
    read_columns: list[str] | None = None,
    narrow_shuffle: bool = False,
) -> list[EpochManifest]:
    """Apply a contiguous run of epoch windows in one pipeline execution;
    returns their (uncommitted) manifests in epoch order.

    ``narrow_shuffle=True`` runs the SURVEY §7 two-pass apply: pass 1 moves
    only (id cols, offset, seq, op) through the shuffle and picks LWW winner
    offsets per (epoch, partition); pass 2 filters the (materialized, group-
    bounded) events to winners — typically a small fraction of an
    update-heavy stream — and shuffles just their payload to the delta
    writers. Shuffle traffic drops from full payload × events to narrow ×
    events + payload × winners."""
    import ray.data as rd

    cfg: EngineConfig = lake.config
    lo, hi = windows[0].lo, windows[-1].hi
    # a TRUNCATE consumed everything at or below its floor — clamp the read
    # so a window straddling it cannot resurrect pre-truncate history
    lo = max(lo, lake.truncate_offset + 1)
    bs = batch_size

    if window_prefiltered:
        if lo > windows[0].lo:     # truncate floor inside a prefiltered span
            events_ds = events_ds.map_batches(
                lambda t: t.filter(pc.greater_equal(
                    t.column(COL_OFFSET), pa.scalar(lo, pa.int64()))),
                batch_format="pyarrow", batch_size=bs)
    elif events_ds is None:
        # row-group pushdown on the offset range — prune at the read
        expr = (pads.field(COL_OFFSET) >= lo) & (pads.field(COL_OFFSET) <= hi)
        with _DS_BUILD_LOCK:
            events_ds = rd.read_parquet(events_path, filter=expr,
                                        columns=read_columns)
        if bs is None:
            # Parquet sources: Ray splits compressed files into ~30k-row
            # sub-blocks (SplitBlocks) to hit its parallelism target, and
            # those tiny blocks flood the sort shuffle with P² intermediate
            # objects — measured 9.0 s vs 2.3 s for the same chunk's sort
            # (the round-1 tiny-generator-block pitfall, BASELINE.md).
            # Re-bundle REAL event rows to the tuned ~18 MB/125k-row unit.
            # (The batch_size=None rule protects few-row DESCRIPTOR streams
            # — factory mode — where bundling collapses parallelism; a
            # parquet event log is actual rows, the opposite regime.)
            bs = 131_072
    else:
        events_ds = events_ds.map_batches(
            lambda t: t.filter(pc.and_(
                pc.greater_equal(t.column(COL_OFFSET), lo),
                pc.less_equal(t.column(COL_OFFSET), hi))),
            batch_format="pyarrow", batch_size=bs)

    key_cols = lake.meta.id_cols
    ds = events_ds.map_batches(lambda t: normalize_batch(t, key_cols),
                               batch_format="pyarrow", batch_size=bs)
    if event_filter is not None:
        ds = ds.map_batches(event_filter, batch_format="pyarrow", batch_size=bs)
    if router_fn is not None:
        ds = ds.map_batches(router_fn, batch_format="pyarrow", batch_size=bs)

    hot = frozenset(cfg.hot_keys) if cfg.hot_keys else None
    nparts = cfg.num_partitions
    part_col = lake.meta.partition_col
    salt_col = key_cols[-1] if len(key_cols) > 1 else key_cols[0]
    epoch_los = np.array([w.lo for w in windows], dtype=np.int64)
    epoch_ids = np.array([w.epoch for w in windows], dtype=np.int64)
    hi_max = int(max(w.hi for w in windows))
    ds = ds.map_batches(
        lambda t: add_shard_column(t, epoch_los, epoch_ids, nparts, hot,
                                   part_col, salt_col, hi_max=hi_max),
        batch_format="pyarrow", batch_size=bs)

    apply_fn = make_apply_fn(lake.root, nparts, lake.meta.id_cols)
    if narrow_shuffle:
        lineage_rows = _narrow_apply(lake, ds, apply_fn)
    else:
        lineage_ds = ds.groupby(COL_SHARD).map_groups(apply_fn,
                                                      batch_format="pyarrow")
        lineage_rows = lineage_ds.take_all()  # ≤ windows × partitions — small

    by_epoch: dict[int, list[dict]] = {}
    for r in lineage_rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    manifests = []
    for w in windows:
        rows = sorted(by_epoch.get(w.epoch, []), key=lambda r: r["part_id"])
        manifests.append(EpochManifest(
            epoch=w.epoch, offset_min=w.lo, offset_max=w.hi,
            final=w.final, schema_version=w.schema_version,
            partitions=[PartitionLineage(**{k: v for k, v in r.items()
                                            if k != "epoch"}) for r in rows]))
    return manifests


def _narrow_apply(lake: LakeTable, ds_sharded, apply_fn) -> list[dict]:
    """Two-pass narrow-shuffle apply over an already-sharded event Dataset.

    The chunk is materialized once (bounded by the group-size rule,
    suggest_epoch_config ≈ 1 GiB) so both passes read it from the object
    store instead of re-executing the upstream. The winner-offset array is
    bounded by the chunk's event count (≤ group events × 8 B) and broadcast
    once via ``ray.put``; pass 2 re-runs LWW on the filtered superset (rows
    sharing an offset with a winner — PK-change splits share offsets), which
    contains every true winner by construction."""
    import ray

    from ape_dts_ray.meta import COL_OP, COL_SEQ
    from ape_dts_ray.stages.apply import make_winner_fn

    ds_sharded = ds_sharded.materialize()
    id_cols = lake.meta.id_cols
    narrow_cols = [*id_cols, COL_OFFSET, COL_SEQ, COL_OP, COL_SHARD]

    def select_narrow(t):
        return t.select([c for c in narrow_cols if c in t.column_names])

    winner_fn = make_winner_fn(lake.root, lake.config.num_partitions, id_cols)
    win_rows = (ds_sharded.map_batches(select_narrow, batch_format="pyarrow")
                .groupby(COL_SHARD)
                .map_groups(winner_fn, batch_format="pyarrow")
                .take_all())   # one row per (epoch, partition) + winner lists

    if win_rows:
        winners = np.sort(np.concatenate(
            [np.asarray(r["winners"], dtype=np.int64) for r in win_rows]))
    else:
        winners = np.zeros(0, dtype=np.int64)
    wref = ray.put(winners)

    def keep_winners(t):
        w = ray.get(wref)    # zero-copy from local plasma after first fetch
        if len(w) == 0 or t.num_rows == 0:
            return t.slice(0, 0)
        off = t.column(COL_OFFSET).to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(w, off), len(w) - 1)
        return t.filter(pa.array(w[idx] == off))

    lineage2 = (ds_sharded.map_batches(keep_winners, batch_format="pyarrow")
                .groupby(COL_SHARD)
                .map_groups(apply_fn, batch_format="pyarrow")
                .take_all())
    rows2 = {(r["epoch"], r["part_id"]): r["rows"] for r in lineage2}
    out = []
    for r in win_rows:
        got = rows2.get((r["epoch"], r["part_id"]), 0)
        if got != r["rows"]:
            # contract violation, not a debug assert: a divergence between
            # the winner pass and the delta write must fail the chunk even
            # under python -O (a stripped assert would commit corrupt
            # manifests silently)
            raise RuntimeError(
                f"narrow apply wrote {got} rows for epoch {r['epoch']} part "
                f"{r['part_id']}, winner pass expected {r['rows']}")
        out.append({k: v for k, v in r.items() if k != "winners"})
    return out


def replay_window(lake: LakeTable, window: EpochWindow, **kw) -> EpochManifest:
    """Apply one epoch window and return its (uncommitted) manifest."""
    return apply_windows(lake, [window], **kw)[0]


def replay(
    lake: LakeTable,
    events_path: str | list[str] | None = None,
    events_ds=None,
    events_factory=None,
    max_offset: int | None = None,
    min_offset: int = 0,
    barriers: list[tuple[int, int]] | None = None,
    event_filter=None,
    router_fn=None,
    stop_after_epoch: int | None = None,
    group_epochs: int = 4,
    pipeline_depth: int = 2,
    narrow_shuffle: bool = False,
    commit_offsets=None,
    max_rps: float | None = None,
    heartbeat: bool = True,
    auto_compact_max_deltas: int | None = None,
) -> list[EpochManifest]:
    """Full replay driver: plan windows, skip committed epochs (resume), apply
    + commit the rest in order, ``group_epochs`` windows per pipeline
    execution. ``stop_after_epoch`` simulates a crash for exactly-once tests.

    ``events_factory(window) -> Dataset`` produces exactly the given window
    span's events (already offset-bounded) — used by bench/generated streams
    so each group synthesizes only its own slice; requires ``max_offset``.

    SCALE NOTE on the three source kinds: ``events_path`` (row-group-pruned
    read per chunk) and ``events_factory`` (per-chunk synthesis) are the
    scale paths. A plain ``events_ds`` would re-execute its upstream once
    per chunk (O(chunks × full-scan) on a 10^10-event Dataset), so replay
    SPILLS it to scratch Parquet in one pass and continues in
    ``events_path`` mode. Two decision points: with ``max_offset`` unknown,
    the spill happens up front (discovering the max is a full execution
    anyway — the spill's parquet footers answer it for free, total ONE
    execution); with ``max_offset`` supplied, the decision waits for the
    real chunk plan (barriers, committed epochs, stop_after_epoch
    included) and only a >1-chunk plan spills — a known-small stream keeps
    the direct Dataset with zero write amplification.

    ``pipeline_depth`` > 1 overlaps up to that many group executions (driver
    threads; Ray schedules their tasks jointly) while manifests still commit
    strictly in epoch order — the ape-dts extractor/pipeline overlap
    (task_runner.rs:531-556 joins both tokio tasks) at group granularity.
    Exactly-once is unaffected: a group is visible only once every EARLIER
    epoch committed, and delta names stay deterministic.

    ``auto_compact_max_deltas``: ONLINE incremental compaction — the
    reference's merger consumes sealed epochs continuously alongside the
    pusher (foxlake_parallelizer.rs:70-126); here, after each committed
    chunk whose delta buildup exceeds the threshold, a partial compaction
    (state/lake.py::compact(max_delta_files=...)) folds the over-threshold
    partitions inline, bounding merge-on-read amplification for the WHOLE
    replay instead of requiring an offline pass at the end. Safe under
    ``pipeline_depth`` > 1: partial compaction touches only COMMITTED
    epochs' files, in-flight groups write uncommitted epochs it never
    reads, and commits are serialized on the driver. SIZE THE THRESHOLD
    for the reader, not the writer: every tick re-folds the full base of
    each over-threshold partition (write-amp ≈ state/K per tick — the
    size-tiered tradeoff), so pick K several× group_epochs; an aggressive
    K=4 over 16 epochs measured 2.2× replay wall (BASELINE.md round 4).
    """
    if events_factory is not None and max_offset is None \
            and events_path is None and events_ds is None:
        raise ValueError(
            "replay(events_factory=...) requires max_offset — the factory "
            "is invoked per planned window, so the plan's span cannot be "
            "discovered from it")
    spill = _SpillState()
    try:
        if events_ds is not None and events_factory is None \
                and max_offset is None:
            # Discovering max_offset from a Dataset is a full execution —
            # spill NOW so that one execution also persists the stream
            # (max then comes from the spill's parquet footers for free).
            # Callers who know the stream is small and want zero write
            # amplification pass max_offset explicitly.
            ep = spill.write(events_ds)
            if ep is None:              # empty upstream
                max_offset = -1
            else:
                events_path, events_ds = ep, None
        return _replay_inner(
            lake, events_path, events_ds, events_factory, max_offset,
            min_offset, barriers, event_filter, router_fn, stop_after_epoch,
            group_epochs, pipeline_depth, narrow_shuffle, commit_offsets,
            max_rps, heartbeat, auto_compact_max_deltas, spill)
    finally:
        spill.cleanup()


def max_offset_from_footers(paths, col: str = COL_OFFSET):
    """Max of ``col`` across parquet files from ROW-GROUP STATISTICS only
    (no data read). Returns None when no file carries statistics for the
    column — callers must fall back to a real scan, not treat the absence
    as an empty log."""
    import pyarrow.parquet as pq

    if isinstance(paths, str):
        paths = [paths]
    mx, seen = -1, False
    for p in paths:
        f = pq.ParquetFile(p)
        ci = f.schema_arrow.get_field_index(col)
        for rg in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(rg).column(ci).statistics
            if st is not None and st.max is not None:
                mx, seen = max(mx, st.max), True
    return mx if seen else None


class _SpillState:
    """Scratch-parquet spill of a Dataset source (lifecycle = one replay)."""

    def __init__(self):
        self.dir = None

    def write(self, events_ds) -> list[str] | None:
        import glob as _glob
        import shutil as _shutil
        import tempfile as _tempfile

        import ray

        if ray.is_initialized() and \
                sum(1 for n in ray.nodes() if n.get("Alive")) > 1:
            # the spill dir is DRIVER-local: on a multi-node cluster each
            # worker writes to its own /tmp and the driver's glob would see
            # zero/partial files — a non-empty stream silently planning as
            # empty. Refuse; multi-node callers pass events_path on shared
            # storage (or pre-spill the Dataset themselves).
            raise RuntimeError(
                "Dataset spill requires single-node Ray (the scratch dir "
                "is driver-local) — on a cluster, write the events to "
                "shared storage and pass events_path instead")
        self.dir = _tempfile.mkdtemp(prefix="ape_dts_replay_spill_")
        events_ds.write_parquet(self.dir)
        spilled = sorted(_glob.glob(os.path.join(self.dir, "*.parquet")))
        if not spilled:                 # empty upstream — nothing to spill
            _shutil.rmtree(self.dir, ignore_errors=True)
            self.dir = None
            return None
        return spilled

    def cleanup(self):
        if self.dir is not None:
            import shutil as _shutil
            _shutil.rmtree(self.dir, ignore_errors=True)
            self.dir = None


def _replay_inner(lake, events_path, events_ds, events_factory, max_offset,
                  min_offset, barriers, event_filter, router_fn,
                  stop_after_epoch, group_epochs, pipeline_depth,
                  narrow_shuffle, commit_offsets, max_rps, heartbeat,
                  auto_compact_max_deltas,
                  spill: _SpillState) -> list[EpochManifest]:
    import pyarrow.parquet as pq

    if max_offset is None:
        if events_path is None:
            max_offset = events_ds.max(COL_OFFSET)
        else:
            max_offset = max_offset_from_footers(events_path)
            if max_offset is None:
                # stats-less files (write_statistics=False): scan the one
                # offset column rather than silently planning zero epochs
                paths = [events_path] if isinstance(events_path, str) \
                    else events_path
                mx = -1
                for p in paths:
                    t = pq.read_table(p, columns=[COL_OFFSET])
                    if t.num_rows:
                        mx = max(mx, pc.max(t.column(COL_OFFSET)).as_py())
                max_offset = mx

    # refresh the persisted placement state (hot-key salt, truncate floor)
    # into this instance: a follower daemon holds ONE LakeTable across
    # rounds, and an external rotation completed between rounds would
    # otherwise leave this plan placing hot keys under the stale salt —
    # old-salt deltas + new-salt base both fold the key, duplicating it
    # (maintenance soak, seed 274662159). Commits verify the gen below.
    placement_gen = lake.refresh_placement()
    if lake.rotation_in_progress():
        raise MaintenanceInProgress(
            "hot-key rotation in progress (rotation.json present) — re-run "
            "compact(new_hot_keys=...) to finish it before replaying")
    if lake.truncate_in_progress():
        raise MaintenanceInProgress(
            "truncate in progress (truncate.json present) — re-run "
            "lake.truncate() to finish it before replaying")
    committed = set(lake.committed_epochs())
    from ape_dts_ray.pipelines.checker import REVISE_EPOCH_BASE
    if any(e >= REVISE_EPOCH_BASE for e in committed):
        raise RuntimeError(
            "lake has committed revise epochs — revise is terminal for the "
            "CDC stream (revise rows outrank every normal epoch); compact() "
            "folds them into base and re-enables replay")
    base_epoch = 0
    align = False
    if min_offset > 0:
        # Epoch ids are ALWAYS offset-derived for a non-zero min_offset —
        # epoch = offset // epoch_size, with the first window snapped up to
        # the next boundary. This makes the plan a pure function of
        # (min_offset, epoch_size, barriers), so the FIRST run and any
        # crash-resume of the identical call number windows identically (a
        # fresh-lake first run that numbered from 0 would collide with its
        # own committed epochs on resume). Commit-aligned windows can't be
        # offset-derived, and barriers at/below min_offset would have
        # shifted earlier numbering — both refuse.
        if commit_offsets is not None:
            raise ValueError("commit-aligned windows are not "
                             "offset-derivable; replay with min_offset=0 "
                             "(committed epochs are skipped automatically)")
        if barriers and any(b[0] <= min_offset for b in barriers):
            raise ValueError("barriers at or below min_offset would have "
                             "shifted earlier epoch numbering; replay from 0")
        base_epoch = min_offset // lake.config.epoch_size
        align = True
    windows = plan_epochs(max_offset, lake.config.epoch_size, barriers,
                          min_offset, base_epoch, commit_offsets, align=align)
    # GROWING-LOG resume: the tail epoch may have been committed while the
    # log was shorter — its manifest may end before the window's planned end
    # (events appended into it since would be silently skipped by the
    # epoch-id filter), or, with commit-aligned windows, the replanned tail
    # may have SNAPPED SHORTER than what was applied (a longer log turns a
    # mid-transaction cut into a commit snap). Either way: re-run the whole
    # window; deterministic delta names + manifest overwrite keep it
    # exactly-once, and shrunk-away events are re-applied by the following
    # window. Only the highest committed epoch can mismatch this way —
    # earlier windows were complete when later ones committed, and only the
    # tail window's snap point depends on the log end.
    if committed:
        last = max(committed)
        w_last = next((w for w in windows if w.epoch == last), None)
        if w_last is not None:
            try:
                if lake.read_manifest(last).offset_max != w_last.hi:
                    committed.discard(last)
            except FileNotFoundError:
                # folded by a concurrent compactor between the listing and
                # this read — its coverage moves to the compacted watermark
                # (read AFTER the manifest snapshot, below)
                committed.discard(last)
    # Any OTHER committed epoch that reappears in this plan must cover the
    # same offset range — a mismatch means an earlier replay used different
    # window boundaries (e.g. a different min_offset before the ids were
    # offset-derived); a silent skip would drop or double-apply the
    # non-overlapping part, so refuse loudly.
    if committed:
        win_by_id = {w.epoch: w for w in windows}
        for e in sorted(committed):
            w = win_by_id.get(e)
            if w is None:
                continue                   # history below min_offset
            try:
                m = lake.read_manifest(e)
            except FileNotFoundError:
                committed.discard(e)       # folded concurrently; coverage
                continue                   # moves to the compacted watermark
            if (not m.final and w.final and m.offset_min == w.lo
                    and m.offset_max == w.hi):
                # the replan reproduced this provisional window byte-for-byte
                # but it is now FINAL (a barrier/commit-snap/boundary landed
                # exactly on the old log end, or a legacy pre-`final`
                # manifest): flip the flag so the fold prefix can pass it —
                # the growing-log recommit above never fires (offset_max ==
                # w.hi), so without this the epoch wedges compaction forever
                lake.refinalize_epoch(m)
            if m.offset_min != -1 and not (w.lo <= m.offset_min
                                           and m.offset_max <= w.hi):
                raise ValueError(
                    f"committed epoch {e} covers [{m.offset_min}, "
                    f"{m.offset_max}] but this plan's window is [{w.lo}, "
                    f"{w.hi}] — earlier replays used different boundaries; "
                    "replay from min_offset=0 with identical settings")
    cw = lake.compacted_watermark()        # hoisted: one JSON read, not one
    pending = [w for w in windows          # per planned window
               if w.epoch not in committed and w.hi > cw]
    if stop_after_epoch is not None:
        pending = [w for w in pending if w.epoch <= stop_after_epoch]

    def run_chunk(chunk: list[EpochWindow]) -> list[EpochManifest]:
        if events_factory is not None:
            span = EpochWindow(chunk[0].epoch, chunk[0].lo, chunk[-1].hi)
            return apply_windows(lake, chunk, events_ds=events_factory(span),
                                 window_prefiltered=True,
                                 event_filter=event_filter, router_fn=router_fn,
                                 narrow_shuffle=narrow_shuffle)
        return apply_windows(lake, chunk, events_path=events_path,
                             events_ds=events_ds,
                             event_filter=event_filter, router_fn=router_fn,
                             narrow_shuffle=narrow_shuffle)

    g = max(1, group_epochs)
    chunks = [pending[i:i + g] for i in range(0, len(pending), g)]
    if events_ds is not None and events_factory is None and len(chunks) > 1:
        # Spill decision from the REAL plan (barriers, committed epochs and
        # stop_after_epoch included): >1 chunk would re-execute the Dataset
        # upstream once per chunk — persist it once and prune-read instead.
        # (max_offset was supplied here, else the pre-plan spill already ran.)
        ep = spill.write(events_ds)
        if ep is not None:
            events_path, events_ds = ep, None
    done: list[EpochManifest] = []

    # max_rps: driver-side token pacing at chunk granularity (the reference's
    # rps limiter counts records before pushing them to sinkers,
    # dt-task/src/task_runner.rs:615-624 + base_parallelizer.rs:65-92).
    # Pacing requires serialized chunk execution, so it forces depth 1.
    import time as _time
    t_start = _time.monotonic()
    applied_events = 0

    def after_commit(ms: list[EpochManifest]) -> None:
        nonlocal applied_events
        if heartbeat:
            lake.write_heartbeat()
        if auto_compact_max_deltas is not None:
            # online incremental compaction (see replay docstring): fold
            # partitions whose committed delta buildup crossed the
            # threshold; a no-op when none did
            import ray
            try:
                counts = lake.delta_file_counts()
                if counts and max(counts.values()) > auto_compact_max_deltas:
                    lake.compact(max_delta_files=auto_compact_max_deltas,
                                 parallel=ray.is_initialized())
                # COLD partitions under the threshold pin the manifest
                # prefix (their epoch-0 file keeps every later manifest
                # alive), which would grow both committed_epochs() and the
                # per-chunk scan above linearly over a long run — once the
                # retained span exceeds 4× the threshold anyway, fold every
                # partition with files, clearing the prefix and bounding
                # the scan at partitions × O(threshold)
                if len(lake.committed_epochs()) > max(
                        8, 4 * auto_compact_max_deltas):
                    lake.compact(max_delta_files=0,
                                 parallel=ray.is_initialized())
            except MaintenanceInProgress:
                # an EXTERNAL rotation/truncate owns the lake this tick
                # (marker up, or the maintenance lock held) — skip, like
                # compact()'s own lock-busy tick: a rotation IS a full
                # compaction, so it restores the delta bound itself, and
                # dying here would kill a daemon mid-round on a transient.
                # This chunk's commits already landed; the NEXT commit (or
                # the daemon's next round) retries the tick.
                pass
        if max_rps is not None:
            applied_events += sum(p.events for m in ms for p in m.partitions)
            min_elapsed = applied_events / max_rps
            wait = min_elapsed - (_time.monotonic() - t_start)
            if wait > 0:
                _time.sleep(wait)

    if not chunks and auto_compact_max_deltas is not None:
        # resume after a kill that landed BETWEEN the final manifest commit
        # and its auto-compact tick: there is nothing to apply, but an
        # invocation under the compaction policy must still restore the
        # bound — otherwise the torn tick's delta buildup (threshold+1
        # files) survives every subsequent no-op resume
        after_commit([])

    win_by_id = {w.epoch: w for w in pending}

    def commit_verified(ms: list[EpochManifest]) -> None:
        """Commit in epoch order (the watermark only advances), then verify
        each manifest's delta files still exist. A STALE concurrent
        compactor — snapshot taken before a growing-log tail recommit —
        can rmtree this epoch's dir between our delta writes and this
        commit, publishing a compacted watermark BELOW our offset_max:
        without this check the manifest would claim coverage for rows whose
        files were destroyed unfolded (silent loss of the extension
        events). A LEGITIMATE consumer is distinguishable by ordering: it
        listed our manifest before folding, so its compacted.json (written
        before any unlink) already covers our offset_max."""
        for m in ms:
            lake.commit_epoch(m, schema_version=m.schema_version,
                              expect_placement_gen=placement_gen)
            for attempt in range(5):
                missing = [p.file for p in m.partitions if not os.path.exists(
                    os.path.join(lake.root, p.file))]
                if not missing or lake.compacted_watermark() >= m.offset_max:
                    break
                if attempt == 4:
                    # verify-first: the LAST re-run was re-checked above, so
                    # this raise fires only when a check still fails after
                    # four restorations — never after a successful one
                    raise RuntimeError(
                        f"epoch {m.epoch}: delta files kept vanishing under "
                        "concurrent compaction without watermark coverage — "
                        "stop the racing compactor and re-run replay")
                rerun = run_chunk([win_by_id[m.epoch]])
                if rerun:
                    m = rerun[0]
                    lake.commit_epoch(m, schema_version=m.schema_version,
                                      expect_placement_gen=placement_gen)

    if pipeline_depth <= 1 or len(chunks) <= 1 or max_rps is not None:
        for chunk in chunks:
            ms = run_chunk(chunk)
            commit_verified(ms)
            after_commit(ms)
            done.extend(ms)
        return done

    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=pipeline_depth) as pool:
        futures = [pool.submit(run_chunk, c) for c in chunks]
        for fut in futures:            # iterate in chunk order ⇒ ordered commits
            ms = fut.result()
            commit_verified(ms)
            after_commit(ms)
            done.extend(ms)
    return done
