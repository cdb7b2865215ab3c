"""End-to-end CDC replay: event log → committed Parquet lake state.

Pipeline per epoch window (SURVEY §7 target shape; lifecycle mirrors the
reference's CDC task wiring, dt-task/src/task_runner.rs:398-602 +
dt-pipeline/src/base_pipeline.rs:59-141, re-expressed as ONE Ray Data pipeline
with exactly one shuffle):

    read events in [lo, hi]           read_parquet(filter=...) | Dataset
      → normalize (validate, PK-change split)      map_batches, Arrow
      → event filter / router (optional)           map_batches, Arrow
      → part_id = hash(PK) with hot-key salt       map_batches, Arrow
      → groupby(part_id).map_groups(apply)         THE shuffle + stateful write
      → lineage rows → EpochManifest → atomic commit (driver)

Epoch windows never span a schema-change offset — the DDL barrier
(dt-connector/src/extractor/base_extractor.rs:118-124 drains the queue before
pushing a DDL; we cut the window instead). Resume: windows whose epoch is
already committed are skipped wholesale (cdc_resumer.rs analog); a partially
applied window re-runs and its deterministic file names make the re-apply
idempotent.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow.compute as pc
import pyarrow.dataset as pads

from ape_dts_ray.meta import COL_OFFSET, EngineConfig
from ape_dts_ray.partition import add_partition_column
from ape_dts_ray.stages.apply import make_apply_fn
from ape_dts_ray.stages.normalize import normalize_batch
from ape_dts_ray.state.lake import LakeTable
from ape_dts_ray.state.manifest import EpochManifest, PartitionLineage


@dataclass(frozen=True)
class EpochWindow:
    epoch: int
    lo: int          # inclusive
    hi: int          # inclusive
    schema_version: int = 0


def plan_epochs(max_offset: int, epoch_size: int,
                barriers: list[tuple[int, int]] | None = None,
                min_offset: int = 0) -> list[EpochWindow]:
    """Cut [min_offset, max_offset] into epoch windows of ≤ epoch_size events,
    additionally cutting at schema-change barriers.

    ``barriers`` = [(offset, new_schema_version)]: the window containing
    ``offset`` ends at offset-1; events from ``offset`` on carry the new
    version (base_extractor.rs:118-124 barrier semantics).
    """
    cuts = sorted(set(b[0] for b in (barriers or [])
                      if min_offset < b[0] <= max_offset))
    ver_at = sorted(barriers or [])
    windows, epoch, lo = [], 0, min_offset
    version = 0
    for boff, bver in ver_at:
        if boff <= min_offset:
            version = max(version, bver)
    bounds = cuts + [max_offset + 1]
    for bound in bounds:
        while lo < bound:
            hi = min(lo + epoch_size - 1, bound - 1)
            windows.append(EpochWindow(epoch, lo, hi, version))
            epoch += 1
            lo = hi + 1
        for boff, bver in ver_at:
            if boff == bound:
                version = bver
    return windows


def replay_window(
    lake: LakeTable,
    window: EpochWindow,
    events_path: str | list[str] | None = None,
    events_ds=None,
    event_filter=None,
    router_fn=None,
    batch_size: int | None = None,
    read_columns: list[str] | None = None,
) -> EpochManifest:
    """Apply one epoch window and return its (uncommitted) manifest."""
    import ray.data as rd

    cfg: EngineConfig = lake.config
    bs = batch_size or cfg.batch_size

    if events_ds is None:
        # row-group pushdown on the offset range — prune at the read
        expr = (pads.field(COL_OFFSET) >= window.lo) & (pads.field(COL_OFFSET) <= window.hi)
        events_ds = rd.read_parquet(events_path, filter=expr, columns=read_columns)
    else:
        lo, hi = window.lo, window.hi
        events_ds = events_ds.map_batches(
            lambda t: t.filter(pc.and_(
                pc.greater_equal(t.column(COL_OFFSET), lo),
                pc.less_equal(t.column(COL_OFFSET), hi))),
            batch_format="pyarrow", batch_size=bs)

    ds = events_ds.map_batches(normalize_batch, batch_format="pyarrow", batch_size=bs)
    if event_filter is not None:
        ds = ds.map_batches(event_filter, batch_format="pyarrow", batch_size=bs)
    if router_fn is not None:
        ds = ds.map_batches(router_fn, batch_format="pyarrow", batch_size=bs)

    hot = frozenset(cfg.hot_keys) if cfg.hot_keys else None
    nparts = cfg.num_partitions
    ds = ds.map_batches(
        lambda t: add_partition_column(t, nparts, hot),
        batch_format="pyarrow", batch_size=bs)

    apply_fn = make_apply_fn(lake.root, window.epoch, lake.meta.id_cols)
    lineage_ds = ds.groupby("part_id").map_groups(apply_fn, batch_format="pyarrow")
    lineage_rows = lineage_ds.take_all()   # ≤ num_partitions rows — small by design

    manifest = EpochManifest(
        epoch=window.epoch, offset_min=window.lo, offset_max=window.hi,
        schema_version=window.schema_version,
        partitions=[PartitionLineage(**r) for r in
                    sorted(lineage_rows, key=lambda r: r["part_id"])])
    return manifest


def replay(
    lake: LakeTable,
    events_path: str | list[str] | None = None,
    events_ds=None,
    max_offset: int | None = None,
    min_offset: int = 0,
    barriers: list[tuple[int, int]] | None = None,
    event_filter=None,
    router_fn=None,
    stop_after_epoch: int | None = None,
) -> list[EpochManifest]:
    """Full replay driver: plan windows, skip committed epochs (resume), apply
    + commit the rest in order. ``stop_after_epoch`` simulates a crash for
    exactly-once tests."""
    import pyarrow.parquet as pq

    if max_offset is None:
        if events_path is None:
            max_offset = events_ds.max(COL_OFFSET)
        else:
            paths = [events_path] if isinstance(events_path, str) else events_path
            mx = -1
            for p in paths:  # footer statistics only — no data read
                f = pq.ParquetFile(p)
                col = f.schema_arrow.get_field_index(COL_OFFSET)
                for rg in range(f.metadata.num_row_groups):
                    st = f.metadata.row_group(rg).column(col).statistics
                    mx = max(mx, st.max)
            max_offset = mx

    windows = plan_epochs(max_offset, lake.config.epoch_size, barriers, min_offset)
    committed = set(lake.committed_epochs())
    done = []
    for w in windows:
        if w.epoch in committed or w.hi <= lake.compacted_watermark():
            continue
        m = replay_window(lake, w, events_path=events_path, events_ds=events_ds,
                          event_filter=event_filter, router_fn=router_fn)
        lake.commit_epoch(m, schema_version=w.schema_version)
        done.append(m)
        if stop_after_epoch is not None and w.epoch >= stop_after_epoch:
            break
    return done
