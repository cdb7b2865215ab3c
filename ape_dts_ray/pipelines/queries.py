"""Named query pipelines over the driver's sf parquet tables.

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
rows (and column NAMES) match the DuckDB oracle in ``__ray_entry__.oracle_sql``
— the driver compares row-count + schema + order-insensitive value hash.

The CDC queries replay the change stream derived from the ``events`` view
(sources/derive.py) through the REAL engine: a fresh lake under /tmp, the full
normalize → shuffle → apply → commit path, then state read-back. They are the
operator-inventory coverage for SURVEY §2 (sources, sinks, transforms,
parallelizers); the documents/embeddings queries cover the training-data ops.

Ray is initialised by the caller (driver / test fixture / bench.py) — nothing
here calls ray.init().
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ape_dts_ray.meta import EngineConfig, TableMeta
from ape_dts_ray.partition import COL_PART, add_partition_column
from ape_dts_ray.sources.derive import changes_dataset
from ape_dts_ray.state.lake import LakeTable

QUERY_PARTITIONS = 16
# epoch geometry for every lake a driver query creates. LOCKSTEP: the
# cdc_lineage_totals oracle SQL (__ray_entry__.py) derives epoch ids as
# `log_offset // __EPOCH_SIZE__` — the sentinel is substituted from THIS
# constant there (and raises if it goes missing), so change it here and the
# SQL follows; a per-site literal would desynchronize the oracle from the
# engine with no signal.
QUERY_EPOCH_SIZE = 50_000


def _fresh_lake(tag: str, **cfg) -> LakeTable:
    root = tempfile.mkdtemp(prefix=f"ape_dts_ray_{tag}_")
    defaults = dict(num_partitions=QUERY_PARTITIONS, epoch_size=QUERY_EPOCH_SIZE)
    defaults.update(cfg)
    return LakeTable.create(root + "/lake", TableMeta(), EngineConfig(**defaults))


def _events_max_offset(sf_dir: str) -> int | None:
    """``log_offset == event_id`` in every derived change stream
    (sources/derive.py), so a stream's max offset is free from the source
    parquet's footer statistics. Passing it to replay() keeps a
    known-small stream on the direct Dataset path (no max-discovery
    execution, no scratch spill). Returns None (NOT a sentinel that plans
    zero epochs) when the file carries no statistics — replay() then
    discovers the span itself via the spill path."""
    from ape_dts_ray.pipelines.replay import max_offset_from_footers

    return max_offset_from_footers(f"{sf_dir}/events.parquet",
                                   col="event_id")


def _replay_changes(sf_dir: str, tag: str, event_filter=None) -> LakeTable:
    from ape_dts_ray.pipelines.replay import replay

    lake = _fresh_lake(tag)
    ds = changes_dataset(sf_dir)
    replay(lake, events_ds=ds, event_filter=event_filter,
           max_offset=_events_max_offset(sf_dir))
    return lake


# ---------- CDC engine queries (SURVEY §2.1/2.2/2.4) ----------

def _consume_lake(lake) -> pa.Table:
    """Read the full state then remove the scratch lake (queries returning a
    materialized table don't need the /tmp directory afterwards)."""
    import shutil

    t = lake.state_table()
    shutil.rmtree(os.path.dirname(lake.root), ignore_errors=True)
    return t


def cdc_apply_lww(sf_dir: str) -> pa.Table:
    """Flagship: full CDC replay → committed lake → live state.
    Covers extractor→normalize→shuffle→LWW apply→manifest commit→merge-on-read."""
    lake = _replay_changes(sf_dir, "lww")
    return _consume_lake(lake)


def cdc_merge_batch(sf_dir: str):
    """RdbMerger micro-batch semantics in isolation (rdb_merger.rs:74-120):
    per-key last event incl. tombstones — (key, last_op, last_offset)."""
    from ape_dts_ray.stages.merge import lww_last

    ds = changes_dataset(sf_dir).map_batches(
        lambda t: add_partition_column(t, QUERY_PARTITIONS),
        batch_format="pyarrow")

    def merge_group(t: pa.Table) -> pa.Table:
        out = lww_last(t.drop_columns([COL_PART]),
                       key_cols=("conv_id", "turn_idx"),
                       order_cols=("log_offset",))
        return out.select(["conv_id", "turn_idx", "op", "log_offset"]).rename_columns(
            ["conv_id", "turn_idx", "last_op", "last_offset"])

    return ds.groupby(COL_PART).map_groups(merge_group, batch_format="pyarrow")


def cdc_filter_events(sf_dir: str):
    """RdbFilter analog (rdb_filter.rs:95-100 do_events + where_condition)."""
    from ape_dts_ray.stages.filter import EventFilter

    f = EventFilter(do_events=("insert", "update"),
                    where_expr=pc.field("tool") == "search")
    return changes_dataset(sf_dir).map_batches(
        f, batch_format="pyarrow").select_columns(
        ["log_offset", "op", "conv_id", "turn_idx", "text"])


def cdc_route_rename(sf_dir: str):
    """RdbRouter column-map analog (rdb_router.rs:122-158) — zero-copy rename."""
    from ape_dts_ray.stages.router import Router

    r = Router(col_maps={"transcripts": {"conv_id": "conversation_id",
                                         "text": "content"}})
    return changes_dataset(sf_dir).map_batches(
        r.batch_fn("transcripts"), batch_format="pyarrow").select_columns(
        ["log_offset", "conversation_id", "turn_idx", "content"])


def cdc_lineage_per_conv(sf_dir: str):
    """Lineage/metrics counters (counter_type.rs analog): per conversation,
    event counts by class + applied offset range. Partial-aggregates inside
    map_batches, then a small groupby — the pre-aggregation pattern."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        # combiner: collapse each batch to one row per conv BEFORE the
        # shuffle — the groupby then moves ≤ convs × blocks partial rows
        # instead of every event
        import pandas as pd

        df = pd.DataFrame({
            "conv_id": t.column("conv_id").to_pandas(),
            "log_offset": t.column("log_offset").to_numpy(zero_copy_only=False),
            "is_delete": pc.cast(pc.equal(t.column("op"), pa.scalar("delete")),
                                 pa.int64()).to_numpy(zero_copy_only=False),
        })
        g = df.groupby("conv_id", sort=False)
        out = g.agg(n_events=("log_offset", "size"),
                    n_deletes=("is_delete", "sum"),
                    offset_min=("log_offset", "min"),
                    offset_max=("log_offset", "max")).reset_index()
        out["n_upserts"] = out["n_events"] - out["n_deletes"]
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = changes_dataset(sf_dir).map_batches(partial, batch_format="pyarrow")
    return ds.groupby("conv_id").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("n_upserts", alias_name="n_upserts"),
        Sum("n_deletes", alias_name="n_deletes"),
        Min("offset_min", alias_name="offset_min"),
        Max("offset_max", alias_name="offset_max"),
    )


def cdc_snapshot_read(sf_dir: str):
    """Snapshot extractor analog (mysql_snapshot_extractor.rs keyset scan +
    where_condition + projection): pruned, filtered parquet read — columns and
    row filters pushed into the read."""
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
        filter=pads.field("n_chars") > 200)


def cdc_snapshot_sample(sf_dir: str):
    """Snapshot row sampling (mysql_snapshot_extractor.rs:200-202
    ``sample_interval``: emit every Nth row of the keyset scan) — here a
    deterministic modulus on the order column, vectorized at the read."""
    import ray.data as rd

    def every_7th(t: pa.Table) -> pa.Table:
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(doc % 7 == 0))

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    return ds.map_batches(every_7th, batch_format="pyarrow")


def cdc_snapshot_load(sf_dir: str) -> pa.Table:
    """Snapshot full-load path (SnapshotParallelizer analog): the insert-only
    LWW state is bulk-loaded via ``load_snapshot`` (hash-partitioned base
    write + finished marker) and read back through merge-on-read."""
    from ape_dts_ray.pipelines.snapshot import load_snapshot, snapshot_finished
    from ape_dts_ray.stages.filter import EventFilter

    src = _replay_changes(sf_dir, "snapload_src",
                          event_filter=EventFilter(do_events=("insert",)))
    lake = _fresh_lake("snapload_dst")
    load_snapshot(lake, src.state_dataset(
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]))
    assert snapshot_finished(lake)
    # plain rmtree — _consume_lake(src) would re-read src's ENTIRE state
    # (a second full merge-on-read) just to reach the cleanup inside it
    import shutil
    shutil.rmtree(os.path.dirname(src.root), ignore_errors=True)
    return _consume_lake(lake)


def cdc_checker(sf_dir: str):
    """Checker analog (mysql_checker.rs:71-150): full replay state vs
    insert-only state; miss = keys whose first write wasn't an insert,
    diff = keys later updated, extra = keys later deleted."""
    from ape_dts_ray.pipelines.checker import check_datasets
    from ape_dts_ray.stages.filter import EventFilter

    import shutil

    src_lake = _replay_changes(sf_dir, "chk_src")
    dst_lake = _replay_changes(sf_dir, "chk_dst",
                               event_filter=EventFilter(do_events=("insert",)))
    out = check_datasets(src_lake.state_dataset(), dst_lake.state_dataset(),
                         num_partitions=QUERY_PARTITIONS, include_extra=True)
    # materialize BEFORE deleting the scratch lakes (a lazy Dataset over
    # removed files would fail downstream; un-deleted lakes leaked two full
    # replay states into /tmp per invocation)
    t = pa.concat_tables(
        out.select_columns(["conv_id", "turn_idx", "check_type"])
        .iter_batches(batch_format="pyarrow")).combine_chunks()
    shutil.rmtree(os.path.dirname(src_lake.root), ignore_errors=True)
    shutil.rmtree(os.path.dirname(dst_lake.root), ignore_errors=True)
    return t


def cdc_schema_evolution(sf_dir: str) -> pa.Table:
    """Additive schema evolution: second half of the log carries a new
    ``channel`` column (schema v1); the replay crosses the barrier and the
    final state null-backfills rows last written under v0 (pa.unify_schemas —
    the ddl barrier + column-mapping rule, SURVEY §1.2/§2.6)."""
    import pyarrow.parquet as pq

    from ape_dts_ray.pipelines.replay import replay

    # barrier at the median offset — SQL-expressible via a constant only if the
    # oracle recomputes it; use count/2 on event_id (dense 0..n-1 by generation)
    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    cut = n // 2

    def with_channel(t: pa.Table) -> pa.Table:
        # batches may mix v0/v1 rows (grouped-epoch execution), so the column
        # is derived row-level; v0-only batches genuinely LACK the column
        # (additive evolution) and fold_state null-backfills at merge-on-read
        if t.num_rows == 0 or pc.max(t.column("log_offset")).as_py() < cut:
            return t
        is_v1 = pc.greater_equal(t.column("log_offset"), pa.scalar(cut, pa.int64()))
        ch = pc.if_else(
            pc.and_(is_v1, pc.not_equal(t.column("op"), pa.scalar("delete"))),
            pc.if_else(pc.equal(t.column("tool"), pa.scalar("search")),
                       pa.scalar("web"), pa.scalar("chat")),
            pa.nulls(t.num_rows, pa.string()))
        return t.append_column("channel", ch)

    lake = _fresh_lake("schemaevo")
    replay(lake, events_ds=changes_dataset(sf_dir), barriers=[(cut, 1)],
           router_fn=with_channel, max_offset=_events_max_offset(sf_dir))
    assert lake.schema_version == 1
    return _consume_lake(lake)


def _rename_tool_router(cut: int):
    """Post-cut source-schema shift shared by cdc_schema_nonadditive and
    cdc_ddl_text (lockstep by construction — the two queries differ ONLY in
    how the schema ops reach the lake): rows at offset >= cut emit
    ``tool_name`` instead of ``tool``. A batch may mix eras under
    grouped-epoch execution, so the split is row-level."""
    def rename_tool(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or pc.max(t.column("log_offset")).as_py() < cut:
            return t
        is_v1 = pc.greater_equal(t.column("log_offset"), pa.scalar(cut, pa.int64()))
        nulls = pa.nulls(t.num_rows, pa.string())
        tool_name = pc.if_else(is_v1, t.column("tool"), nulls)
        old_tool = pc.if_else(is_v1, nulls, t.column("tool"))
        t = t.set_column(t.column_names.index("tool"), "tool", old_tool)
        return t.append_column("tool_name", tool_name)
    return rename_tool


def cdc_schema_nonadditive(sf_dir: str) -> pa.Table:
    """NON-additive schema evolution (ddl_type.rs rename/drop/alter family):
    at the median offset the stream renames ``tool``→``tool_name`` (post-cut
    events carry the new column), the target drops ``role``, and ``turn_idx``
    widens int32→int64. Old-era delta files are mapped at merge-on-read by
    the lake's persisted schema ops (stages/merge.py::apply_schema_ops) —
    pre-cut winners surface their tool value under ``tool_name``."""
    import pyarrow.parquet as pq

    from ape_dts_ray.pipelines.replay import replay

    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    cut = n // 2
    rename_tool = _rename_tool_router(cut)

    lake = _fresh_lake("schemanonadd")
    lake.set_schema_ops([
        {"op": "rename", "from": "tool", "to": "tool_name"},
        {"op": "drop", "col": "role"},
        {"op": "widen", "col": "turn_idx", "type": "int64"},
    ])
    replay(lake, events_ds=changes_dataset(sf_dir), barriers=[(cut, 1)],
           router_fn=rename_tool, max_offset=_events_max_offset(sf_dir))
    assert lake.schema_version == 1
    out = _consume_lake(lake)
    assert "role" not in out.column_names and "tool" not in out.column_names
    return out


def cdc_ddl_text(sf_dir: str) -> pa.Table:
    """``cdc_schema_nonadditive`` driven by DDL TEXT instead of structured
    ops: replay the pre-cut leg, feed real ``ALTER TABLE`` statements through
    the text adapter (stages/ddl.py — the ddl_parser.rs → ddl_type.rs
    alter-family subset), reopen the lake (ops are persisted), replay the
    rest across the barrier. Same oracle as the structured-ops query — the
    two entry points must land the identical state."""
    import pyarrow.parquet as pq

    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.stages.ddl import apply_ddl

    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    cut = n // 2

    lake = _fresh_lake("ddltext")
    replay(lake, events_ds=changes_dataset(sf_dir), max_offset=cut - 1)
    for sql in ("ALTER TABLE transcripts RENAME COLUMN tool TO tool_name",
                "ALTER TABLE transcripts DROP COLUMN role",
                "ALTER TABLE transcripts MODIFY COLUMN turn_idx BIGINT"):
        apply_ddl(lake, sql)
    lake = LakeTable.open(lake.root)            # ops arrived via persistence
    assert len(lake.schema_ops) == 3
    replay(lake, events_ds=changes_dataset(sf_dir), barriers=[(cut, 1)],
           router_fn=_rename_tool_router(cut),
           max_offset=_events_max_offset(sf_dir))
    assert lake.schema_version == 1
    out = _consume_lake(lake)
    assert "role" not in out.column_names and "tool" not in out.column_names
    return out


def _conv_uid(t: pa.Table) -> pa.Array:
    """Numeric conversation id from the ``conv-<uid>`` convention
    (sources/derive.py) — the one place that parses it."""
    return pc.cast(pc.utf8_slice_codeunits(t.column("conv_id"), 5, 99),
                   pa.int64())


_MIXED_TABLES = ("tbl_even", "tbl_odd")


def _add_mixed_table(t: pa.Table) -> pa.Table:
    """conv-parity → table column; MUST stay in lockstep with the shared
    ``MULTITABLE_SQL`` oracle in __ray_entry__.py (both cdc_multitable and
    cdc_follow_mixed derive from this one definition)."""
    uid = _conv_uid(t)
    tbl = pc.if_else(pc.equal(pc.bit_wise_and(uid, pa.scalar(1, pa.int64())),
                              pa.scalar(0, pa.int64())),
                     pa.scalar(_MIXED_TABLES[0]), pa.scalar(_MIXED_TABLES[1]))
    return t.append_column("table", tbl)


def _union_mixed_lakes(root: str) -> pa.Table:
    """Both mixed lakes' states unioned back with the table name — the
    shape the shared oracle ranks."""
    pieces = []
    for name in _MIXED_TABLES:
        t = LakeTable.open(os.path.join(root, name)).state_table()
        pieces.append(t.append_column(
            "tbl", pa.array([name] * t.num_rows, pa.string())))
    return pa.concat_tables(pieces)


def cdc_multitable(sf_dir: str) -> pa.Table:
    """Mixed-stream multi-table fan-out (TableParallelizer,
    table_parallelizer.rs:86-114): ONE interleaved change stream carries a
    ``table`` column (conv parity); ``replay_mixed`` splits it into two lakes
    in a single pass; the result is both lakes' states unioned back with the
    table name — oracle = ranked winners per table in SQL."""
    import shutil

    from ape_dts_ray.pipelines.multitable import replay_mixed

    root = tempfile.mkdtemp(prefix="ape_dts_ray_multitable_")
    ds = changes_dataset(sf_dir).map_batches(_add_mixed_table,
                                             batch_format="pyarrow")
    replay_mixed(root, list(_MIXED_TABLES), events_ds=ds,
                 config=EngineConfig(num_partitions=QUERY_PARTITIONS,
                                     epoch_size=QUERY_EPOCH_SIZE),
                 max_offset=_events_max_offset(sf_dir))
    out = _union_mixed_lakes(root)
    shutil.rmtree(root, ignore_errors=True)
    return out


def cdc_two_way(sf_dir: str) -> pa.Table:
    """Two-way (cycle_basic) replication over the sf stream
    (dt-connector/src/data_marker.rs, docs/en/cdc/two_way.md): conv-parity
    split into per-node LOCAL writes (node A = even convs, B = odd), each
    node's log + lake live on disk; a bidirectional exchange ships the peer's
    outbound stream (origin coalesced to the peer's name) and appends it with
    post-watermark local offsets; the reflected round re-reads the peer's log
    past the cursor and must drop every event (origin == self — the
    DataMarker cycle breaker, no ping-pong). Both lakes must converge to the
    global LWW fold — the query asserts A == B and returns A's state, so the
    oracle is exactly ``cdc_apply_lww``'s.

    Scale shape: logs are Parquet directories (``events_path`` replay — the
    row-group-pruned source), the exchange is a Dataset filter+map+write (no
    driver landing), and per-key LWW order is preserved because a key
    originates on exactly one node (appended peer events keep their relative
    order at ``base + orig_offset``)."""
    import shutil

    import pyarrow.parquet as pq

    from ape_dts_ray.pipelines.replay import replay

    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    root = tempfile.mkdtemp(prefix="ape_dts_ray_twoway_")
    nodes = ("A", "B")
    logs = {m: os.path.join(root, f"log_{m}") for m in nodes}
    lakes = {m: LakeTable.create(
        os.path.join(root, f"lake_{m}"), TableMeta(),
        EngineConfig(num_partitions=QUERY_PARTITIONS, epoch_size=QUERY_EPOCH_SIZE))
        for m in nodes}

    def local_writes(node: str):
        want = 0 if node == "A" else 1

        def f(t: pa.Table) -> pa.Table:
            uid = _conv_uid(t)
            out = t.filter(pc.equal(pc.bit_wise_and(uid, pa.scalar(1, pa.int64())),
                                    pa.scalar(want, pa.int64())))
            return out.append_column("origin",
                                     pa.nulls(out.num_rows, pa.string()))
        return f

    def pull(dst: str, src: str, cursor: int) -> int:
        """dst consumes src's log from ``cursor`` via the shared DataMarker
        link (pipelines/cycle.py): coalesce origin to the peer's name
        (outbound stamp), drop self-originated events (cycle breaker),
        append with offsets shifted past dst's local range. ONE pipeline
        execution: write, then count from the written files' parquet
        footers (count()+write would run the read+stamp twice, and a
        materialize() barrier measured WORSE — BASELINE.md)."""
        from ape_dts_ray.pipelines.cycle import ship_link

        return ship_link(logs[src],
                         os.path.join(logs[dst], f"from_{src}", f"r{cursor}"),
                         cursor, src_node=src, dst_node=dst, offset_base=n)

    def log_files(m: str) -> list[str]:
        import glob

        return sorted(glob.glob(os.path.join(logs[m], "**", "*.parquet"),
                                recursive=True))

    for m in nodes:
        changes_dataset(sf_dir).map_batches(
            local_writes(m), batch_format="pyarrow").write_parquet(
            os.path.join(logs[m], "local"))
        replay(lakes[m], events_path=log_files(m))

    # exchange round: each node pulls the peer's stream and syncs
    got = {m: pull(m, p, cursor=0) for m, p in (("A", "B"), ("B", "A"))}
    assert got["A"] + got["B"] == n, got
    for m in nodes:
        replay(lakes[m], events_path=log_files(m))

    # reflected round: the peer's log now ends with this node's own events
    # back (origin == self) — the cycle breaker drops all of them and the
    # re-replay is a no-op
    assert pull("A", "B", cursor=n) == 0
    assert pull("B", "A", cursor=n) == 0
    assert replay(lakes["A"], events_path=log_files("A")) == []

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    state = {m: lakes[m].state_table().select(cols)
             .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
             for m in nodes}
    assert state["A"].equals(state["B"])
    shutil.rmtree(root, ignore_errors=True)
    return state["A"]


def _drive_follow_two_waves(root: str, stage_ds, run_follower, watermark_fn):
    """Shared two-wave reveal harness for the follow queries (``cdc_follow``
    and ``cdc_follow_mixed`` differ only in the follower and the watermark
    probe): stage the change stream as parquet segments, reveal them to a
    follower RUNNING in a sibling thread in two offset-ordered waves
    (write-then-rename appends), wait for ``watermark_fn()`` to pass each
    wave's max offset, stop via the stop file and return the follower's
    stats (stop-file shutdown + ≥2 replay rounds asserted here, once).

    ``run_follower(log_dir, stop_file)`` runs the daemon until stopped.
    A wave that fails to drain within 300 s raises TimeoutError — a stall
    diagnosis (overloaded host / wedged follower), instead of silently
    falling through to the misleading replay_rounds assertion."""
    import glob
    import threading
    import time

    from ape_dts_ray.pipelines.follow import _file_offset_span

    stage = os.path.join(root, "stage")
    log = os.path.join(root, "log")
    stop = os.path.join(root, "stop")
    os.makedirs(log, exist_ok=True)
    # order-preserving split: ≥2 segments per wave even when the sf
    # events parquet is a single row group
    stage_ds.repartition(8).write_parquet(stage)
    files = sorted(glob.glob(os.path.join(stage, "*.parquet")))
    spans = {p: _file_offset_span(p, "log_offset") for p in files}
    files.sort(key=lambda p: spans[p][0])     # offset-ordered appends
    cut = max(1, len(files) // 2)
    wave_max = [max(spans[p][1] for p in files[:cut]),
                max(spans[p][1] for p in files)]
    box: dict = {}

    def run():
        try:
            box["stats"] = run_follower(log, stop)
        except BaseException as e:
            box["exc"] = e

    th = threading.Thread(target=run)
    th.start()
    try:
        for wave, batch in enumerate((files[:cut], files[cut:])):
            for i, p in enumerate(batch):
                os.rename(p, os.path.join(log, f"seg{wave}_{i:04d}.parquet"))
            t0 = time.time()
            while watermark_fn() < wave_max[wave] and "exc" not in box:
                if time.time() - t0 >= 300:
                    raise TimeoutError(
                        f"follow harness: wave {wave} not drained after "
                        f"300 s (watermark {watermark_fn()} < "
                        f"{wave_max[wave]}) — stalled follower or "
                        "overloaded host")
                time.sleep(0.05)
    finally:
        open(stop, "w").close()
        th.join(timeout=300)
    if "exc" in box:
        raise box["exc"]
    if th.is_alive():
        # the follower neither returned nor raised within the join budget —
        # surface the wedge itself; falling through would mask it behind a
        # bare KeyError('stats')
        raise TimeoutError("follower failed to stop within 300 s of the "
                           "stop file — wedged replay round")
    stats = box["stats"]
    assert stats.stopped_by == "stop_file" and stats.replay_rounds >= 2
    return stats


def cdc_follow(sf_dir: str) -> pa.Table:
    """Continuous tail mode (pipelines/follow.py — the reference's daemon
    drain loop, base_pipeline.rs:59-141 + cdc_resumer.rs:24-89): the change
    stream is staged as parquet segments and revealed to a RUNNING follower
    in two waves (write-then-rename appends in offset order). The follower
    drains each wave as it appears, heartbeats, and stops on the stop file;
    the final state must equal the one-shot replay's, so the oracle is
    exactly ``cdc_apply_lww``'s."""
    import shutil

    from ape_dts_ray.pipelines.follow import replay_follow

    root = tempfile.mkdtemp(prefix="ape_dts_ray_follow_")
    lake = _fresh_lake("follow")
    try:
        _drive_follow_two_waves(
            root, changes_dataset(sf_dir),
            lambda log, stop: replay_follow(lake, log, poll_interval=0.05,
                                            stop_file=stop, pipeline_depth=1),
            lambda: LakeTable.open(lake.root).watermark())
        assert LakeTable.open(lake.root).heartbeat() is not None
        out = LakeTable.open(lake.root).state_table()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(os.path.dirname(lake.root), ignore_errors=True)
    return out


def cdc_follow_mixed(sf_dir: str) -> pa.Table:
    """Mixed-stream daemon (pipelines/follow.py::replay_follow_mixed — the
    reference service's actual shape: ONE log position, TableParallelizer
    fan-out per drained batch, table_parallelizer.rs:86-114 +
    base_pipeline.rs:59-141): the interleaved two-table change stream is
    staged as parquet segments and revealed to a RUNNING mixed follower in
    two waves; the drained lakes unioned back must equal the one-shot
    fan-out, so the oracle is exactly ``cdc_multitable``'s."""
    import shutil

    from ape_dts_ray.pipelines.follow import replay_follow_mixed

    root = tempfile.mkdtemp(prefix="ape_dts_ray_followmixed_")
    lakes_root = os.path.join(root, "lakes")
    cfg = EngineConfig(num_partitions=QUERY_PARTITIONS, epoch_size=QUERY_EPOCH_SIZE)

    def min_wm() -> int:
        try:
            return min(LakeTable.open(os.path.join(lakes_root, n))
                       .watermark() for n in _MIXED_TABLES)
        except FileNotFoundError:
            return -1

    try:
        _drive_follow_two_waves(
            root,
            changes_dataset(sf_dir).map_batches(_add_mixed_table,
                                                batch_format="pyarrow"),
            lambda log, stop: replay_follow_mixed(
                lakes_root, list(_MIXED_TABLES), log, poll_interval=0.05,
                stop_file=stop, config=cfg),
            min_wm)
        out = _union_mixed_lakes(lakes_root)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def cdc_pk_change(sf_dir: str) -> pa.Table:
    """PK-change updates (uk_changed_test analog): 'view' updates renumber
    turn_idx by +40; the engine splits each into delete(old)+insert(new)
    (stages/normalize.py) instead of the reference's serial fallback. The SQL
    oracle performs the same split explicitly."""
    from ape_dts_ray.pipelines.replay import replay

    def add_pk_change(t: pa.Table) -> pa.Table:
        is_chg = pc.and_(pc.equal(t.column("op"), pa.scalar("update")),
                         pc.equal(t.column("role"), pa.scalar("view")))
        new_turn = pc.if_else(is_chg,
                              pc.add(t.column("turn_idx"), pa.scalar(40, pa.int32())),
                              pa.nulls(t.num_rows, pa.int32()))
        return t.append_column("new_turn_idx", new_turn)

    lake = _fresh_lake("pkchange")
    ds = changes_dataset(sf_dir).map_batches(add_pk_change, batch_format="pyarrow")
    replay(lake, events_ds=ds, max_offset=_events_max_offset(sf_dir))
    return _consume_lake(lake)


def cdc_lineage_totals(sf_dir: str) -> pa.Table:
    """End-to-end lineage audit: replay the stream, then answer ONLY from the
    committed manifests (S3FileMeta / position.log analog). The oracle
    recomputes the same totals from the raw stream in SQL — every event must
    be accounted for in lineage, with post-LWW row/delete counts per
    (key, epoch) matching exactly."""
    lake = _replay_changes(sf_dir, "lineage")
    lin = lake.lineage_table()
    agg = pa.table({
        "n_events": pa.array([pc.sum(lin.column("events")).as_py()], pa.int64()),
        "n_rows": pa.array([pc.sum(lin.column("rows")).as_py()], pa.int64()),
        "n_upserts": pa.array([pc.sum(lin.column("upserts")).as_py()], pa.int64()),
        "n_deletes": pa.array([pc.sum(lin.column("deletes")).as_py()], pa.int64()),
        "offset_min": pa.array([pc.min(lin.column("offset_min")).as_py()], pa.int64()),
        "offset_max": pa.array([pc.max(lin.column("offset_max")).as_py()], pa.int64()),
    })
    return agg


def cdc_time_window(sf_dir: str):
    """start/end time-window filter (time_filter.rs:5-40 analog): only events
    inside [2024-01-10, 2024-01-20) pass."""
    from ape_dts_ray.stages.filter import EventFilter

    lo = pa.scalar(np.datetime64("2024-01-10T00:00:00", "us"))
    hi = pa.scalar(np.datetime64("2024-01-20T00:00:00", "us"))
    f = EventFilter(do_events=("insert", "update"),
                    where_expr=(pc.field("ts") >= lo) & (pc.field("ts") < hi))
    return changes_dataset(sf_dir).map_batches(
        f, batch_format="pyarrow").select_columns(
        ["log_offset", "conv_id", "turn_idx", "ts"])


def cdc_sql_format(sf_dir: str):
    """SqlSinker analog: forward SQL per change event — oracle-backed (the
    string assembly is mirrored in DuckDB concat/replace)."""
    from ape_dts_ray.stages.sql_format import format_sql

    return changes_dataset(sf_dir).map_batches(
        format_sql, batch_format="pyarrow")


def redis_hotkeys(sf_dir: str) -> pa.Table:
    """Hot-key statistic sink (redis_statistic_sinker.rs:55-66): encode a
    document keyspace into RDB shards WITH per-key LFU frequency prefixes
    (0xF9, rdb_parser.rs:107-110), parse them back, and emit every key
    whose freq reaches the threshold, hottest first. freq is derived
    deterministically from doc_id so the oracle can recompute the exact
    set. Oracle-backed."""
    import shutil

    import ray

    from ape_dts_ray.pipelines.redis_replay import (COL_SLOT_PART,
                                                    _write_rdb_bytes,
                                                    add_slot_partition,
                                                    hotkey_statistics,
                                                    rdb_key_statistics)
    from ape_dts_ray.sources import rdb as rdbmod

    snap_dir = tempfile.mkdtemp(prefix="ape_dts_ray_hotkeys_")
    try:
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"])

        def to_rows(t: pa.Table) -> pa.Table:
            did = t.column("doc_id").to_numpy(zero_copy_only=False)
            keys = pa.array(np.char.add("doc:", did.astype(str)))
            return add_slot_partition(pa.table({
                "key": keys.cast(pa.binary()),
                "value": t.column("text").cast(pa.binary()),
                "freq": pa.array((did * 7) % 256, pa.int64()),
            }), QUERY_PARTITIONS)

        def write_shard(t: pa.Table) -> pa.Table:
            # columnar handoff: Arrow columns go straight into the string
            # fast-path encoder — no per-entry dict materialization
            pid = int(t.column(COL_SLOT_PART)[0].as_py())
            buf = rdbmod.encode_rdb_strings(
                t.column("key").to_pylist(), t.column("value").to_pylist(),
                freqs=t.column("freq").to_numpy(zero_copy_only=False),
                lzf_sample=16)
            _write_rdb_bytes(buf, snap_dir, pid)
            return pa.table({"part_id": pa.array([pid], pa.int32())})

        (ds.map_batches(to_rows, batch_format="pyarrow")
           .groupby(COL_SLOT_PART)
           .map_groups(write_shard, batch_format="pyarrow")
           .materialize())
        hot = hotkey_statistics(rdb_key_statistics(snap_dir),
                                freq_threshold=200)
        batches = list(hot.iter_batches(batch_format="pyarrow"))
        out = pa.concat_tables(batches).combine_chunks() if batches else \
            pa.schema([("db_id", pa.int64()), ("key", pa.string()),
                       ("freq", pa.int64())]).empty_table()
    finally:
        shutil.rmtree(snap_dir, ignore_errors=True)
    return out


def _crash_probe_epoch_size(n_events: int) -> int:
    """Epoch size for the crash+resume probe queries: guarantees >= 2 epochs
    at EVERY scale factor, so stop_after_epoch=0 always crashes on a real
    epoch boundary with committed work behind it and pending work ahead —
    at sf0.001 a fixed size would make one epoch swallow the whole stream
    and the 'resume' would be a fresh run proving nothing."""
    return max(1, min(n_events // 2, max(4000, n_events // 8)))


def cdc_mongo_doc(sf_dir: str) -> pa.Table:
    """Mongo oplog replay (MongoSnapshot/MongoCdc → MongoMerger,
    mongo_merger.rs:17-100): a SINGLE-id-col (`_id`) table with JSON doc
    payloads rides the generic engine path — partition AND salt fall back
    to the id col itself — through the full apply, a mid-replay crash, a
    fresh-process resume (oplog resume-token analog: committed epochs skip
    wholesale), and merge-on-read. Oracle-backed: the final docs are the
    per-_id LWW winners in SQL."""
    import pyarrow.parquet as pq

    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.sources.derive import mongo_changes_dataset

    meta = TableMeta(name="docs", id_cols=("_id",), partition_col="_id",
                     order_cols=("_id",), payload_cols=("doc",))
    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    epoch_size = _crash_probe_epoch_size(n)
    root = tempfile.mkdtemp(prefix="ape_dts_ray_mongo_")
    lake = LakeTable.create(root + "/lake", meta,
                            EngineConfig(num_partitions=QUERY_PARTITIONS,
                                         epoch_size=epoch_size))
    ds = mongo_changes_dataset(sf_dir)
    mx = _events_max_offset(sf_dir)
    replay(lake, events_ds=ds, stop_after_epoch=0, max_offset=mx)  # crash
    lake = LakeTable.open(lake.root)                # fresh-process resume
    replay(lake, events_ds=ds, max_offset=mx)
    return _consume_lake(lake)


def cdc_avro_transport(sf_dir: str) -> pa.Table:
    """Kafka-envelope transport (avro_converter.rs:58-77 +
    kafka_sinker/extractor semantics, no broker in this environment): the
    change stream is encoded into REAL Avro single-object binary frames
    (spec marker + CRC-64-AVRO schema fingerprint + zigzag varints),
    decoded back, and replayed — the state after transport must equal the
    direct replay's oracle exactly (shared with cdc_apply_lww)."""
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.stages.avro import avro_decode, avro_encode

    lake = _fresh_lake("avrotrans")
    # the sf events parquet is ONE row group → one read block; without a
    # repartition the per-record codec (sequential by format, like the
    # broker's per-message framing) would run in a single task
    ds = (changes_dataset(sf_dir)
          .repartition(QUERY_PARTITIONS * 2)
          .map_batches(avro_encode, batch_format="pyarrow")
          .map_batches(avro_decode, batch_format="pyarrow"))
    replay(lake, events_ds=ds, max_offset=_events_max_offset(sf_dir))
    return _consume_lake(lake)


def cdc_dcl(sf_dir: str):
    """DCL replication path (dcl_parser.rs:26-229 classification →
    rdb_filter.rs:118-124 ``do_dcls`` filter → statement log, the SqlSinker
    shape — a Parquet lake has no users/grants to apply, so the sink is the
    deterministic statement log an operator replays by hand): classify the
    derived raw statements (comments stripped, DML rejected, heads matched
    case-insensitively — all vectorized), keep the migration-critical
    subset, emit (log_offset, dcl_type, statement)."""
    from ape_dts_ray.sources.derive import dcl_dataset
    from ape_dts_ray.stages.dcl import DclFilter, classify_dcl_batch

    f = DclFilter(do_dcls=("create_user", "drop_user", "grant", "revoke"))
    return (dcl_dataset(sf_dir)
            .map_batches(classify_dcl_batch, batch_format="pyarrow")
            .map_batches(f, batch_format="pyarrow")
            .select_columns(["log_offset", "dcl_type", "statement"]))


def cdc_rbac_state(sf_dir: str):
    """RBAC structure migration (pg_create_rbac_statement.rs analog, the
    last structure_type.rs member): classify the DCL stream, extract
    normalized role/user/grant/default-role events (vectorized regex +
    privilege explosion), and fold them into the SURVIVING catalog state —
    last create/drop wins per principal, DROP USER wipes earlier grants,
    multi-privilege GRANTs explode to one row per privilege. One hash
    shuffle keyed by owning principal; shuffle rows bounded by live-entity
    count via a per-batch partial reduce (stages/rbac.py)."""
    from ape_dts_ray.sources.derive import dcl_dataset
    from ape_dts_ray.stages.dcl import DclFilter, classify_dcl_batch
    from ape_dts_ray.stages.rbac import extract_rbac_batch, fold_rbac

    f = DclFilter(do_dcls=("create_user", "alter_user", "drop_user",
                           "create_role", "drop_role", "grant", "revoke",
                           "set_role"))
    ds = (dcl_dataset(sf_dir)
          .map_batches(classify_dcl_batch, batch_format="pyarrow")
          .map_batches(f, batch_format="pyarrow")
          .map_batches(extract_rbac_batch, batch_format="pyarrow"))
    return fold_rbac(ds)    # map_groups output is already STATE_COLS-only


def cdc_wide_types(sf_dir: str) -> pa.Table:
    """Column-type breadth through the FULL apply path (ColValue span,
    col_value.rs:15-46: Decimal/Blob/Enum/Json + a narrow int): the wide
    stream (sources/derive.py::derive_wide_changes — decimal128(18,4),
    binary, dict-encoded tier, JSON string, int16) replays through
    normalize → shuffle → LWW apply with THREE schema ops registered
    (rename payload_bin→payload, widen qty int16→int64, drop note), takes a
    mid-replay crash + resume, then COMPACTS — so every wide value crosses
    delta write, manifest commit, merge-on-read mapping and the base
    rewrite before being read back."""
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.sources.derive import wide_changes_dataset

    meta = TableMeta(name="wide",
                     payload_cols=("amount", "payload_bin", "tier",
                                   "meta_json", "qty", "note"))
    root = tempfile.mkdtemp(prefix="ape_dts_ray_widetypes_")
    # epoch_size scales with the input so the epoch count stays ~8 at every
    # sf (4000 fixed meant 200 epochs → 50 serialized pipeline executions at
    # sf0.1); the floor keeps ≥2 epochs at sf0.001 so the mid-replay crash
    # below still lands on a real epoch boundary
    import pyarrow.parquet as pq

    n_events = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    # >=2 epochs at EVERY sf (the crash probe below must cross a real epoch
    # boundary — sf0.001 has 1000 events, so the cap n//2 guarantees it),
    # ~8 epochs at larger sf (bounded pipeline executions)
    epoch_size = _crash_probe_epoch_size(n_events)
    lake = LakeTable.create(root + "/lake", meta,
                            EngineConfig(num_partitions=QUERY_PARTITIONS,
                                         epoch_size=epoch_size))
    lake.set_schema_ops([
        {"op": "rename", "from": "payload_bin", "to": "payload"},
        {"op": "widen", "col": "qty", "type": "int64"},
        {"op": "drop", "col": "note"},
    ])
    ds = wide_changes_dataset(sf_dir)
    mx = _events_max_offset(sf_dir)
    replay(lake, events_ds=ds, stop_after_epoch=0,      # crash after epoch 0
           max_offset=mx)
    lake = LakeTable.open(lake.root)                    # fresh-process resume
    replay(lake, events_ds=ds, max_offset=mx)
    lake.compact()                                      # base rewrite incl. ops
    # complete epochs folded away; at most the PROVISIONAL tail epoch (its
    # window cut by the log end, extendable on a growing log) remains as
    # delta — schema ops apply to it at read time (lake._fold_files)
    left = lake.committed_epochs()
    assert len(left) <= 1, left          # the whole final prefix folded
    assert all(not lake.read_manifest(e).final for e in left), left
    out = _consume_lake(lake)
    assert out.schema.field("amount").type == pa.decimal128(18, 4)
    assert out.schema.field("payload").type == pa.binary()
    assert out.schema.field("qty").type == pa.int64()
    assert "note" not in out.column_names
    # Comparison projection: decimal → canonical scale-4 string and binary →
    # utf8 (props is ASCII by construction), mirrored by VARCHAR casts in the
    # oracle SQL. Driver-side pandas value hashing renders DuckDB DECIMAL as
    # float64 and BLOB as bytearray, which would false-mismatch the exact
    # decimal128/binary values the assertions above already pin; strings hash
    # identically under every fetch path. The Enum analog rides dict-encoded
    # in flight; present as plain string.
    i = out.column_names.index("tier")
    out = out.set_column(i, "tier", out.column("tier").cast(pa.string()))
    i = out.column_names.index("amount")
    out = out.set_column(i, "amount", out.column("amount").cast(pa.string()))
    i = out.column_names.index("payload")
    return out.set_column(i, "payload", out.column("payload").cast(pa.string()))


# ---------- training-data ops over documents / embeddings ----------

def _docs_ds(sf_dir: str, columns: list[str], nblocks: int = 32):
    """documents read for per-doc compute stages. The sf file is ONE row
    group, so Ray gets a single block and every downstream map runs in one
    task; repartition splits it (tiny shuffle locally — at real scale files
    carry many row groups and this is a no-op choice)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)
    return ds.repartition(nblocks)

def dedup_exact(sf_dir: str):
    """Exact dedup: hash-partition by content, keep smallest doc_id per text
    (groupby + per-group first — the guide's canonical exact-dedup shape)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "n_chars"])

    def hash_col(t: pa.Table) -> pa.Table:
        import pandas as pd
        h = pd.util.hash_array(t.column("text").to_numpy(zero_copy_only=False))
        # shard, not raw hash: bounded groupby cardinality (256 Ray groups),
        # exact-match dedup runs vectorized inside each shard
        return t.append_column("_h", pa.array((h % np.uint64(256)).astype(np.int64)))

    ds = ds.map_batches(hash_col, batch_format="pyarrow")

    def first_per_text(t: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(t)
        out = df.sort("doc_id").unique(subset=["text"], keep="first")
        return out.select(["doc_id", "n_chars"]).to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())]))

    return ds.groupby("_h").map_groups(first_per_text, batch_format="pyarrow")


def text_quality_counts(sf_dir: str):
    """Quality-scoring integer primitives (functions/text.py) — SQL oracle via
    regexp counts."""
    import ray.data as rd

    from ape_dts_ray.functions.text import quality_counts

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).map_batches(
        quality_counts, batch_format="pyarrow")


def text_langid(sf_dir: str):
    """Stopword-vote language ID — oracle-backed (the vote is mirrored in
    SQL over a generated stopword VALUES table)."""
    from ape_dts_ray.functions.text import LangId

    # task pool, not actors: LangId's init is a regex compile — actor-pool
    # spin-up would dominate; tasks scale instantly with the block count
    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        LangId(), batch_format="pandas")


def doc_fingerprint(sf_dir: str):
    """Winnowing-style rolling-hash fingerprints — oracle-backed (window
    hashes recomputed in SQL over the ASCII corpus)."""
    from ape_dts_ray.functions.text import Fingerprint

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        Fingerprint(), batch_format="pandas")


def dedup_minhash(sf_dir: str):
    """MinHash-LSH near-dup pairs over documents, fully distributed (banding →
    sharded candidates → keyed text joins → in-partition Jaccard verify; no
    driver-side corpus map). Banding recall ≈ 1 at the sf corpus (planted
    dup pairs all have J ≥ 0.87), so the output equals the exact true-Jaccard
    pair set and carries a shingle-join SQL oracle."""
    from ape_dts_ray.functions.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_docs_ds(sf_dir, ["doc_id", "text"]),
                               threshold=0.6, bands=32)


def dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs over documents. With the hot-bucket guard
    disabled, 4×16-bit banding is EXACT for Hamming ≤ 3 (pigeonhole), and the
    md5-derived word hash is reproducible in SQL — so the output equals the
    all-pairs Hamming join and carries a DuckDB oracle (bit_count ∘ xor)."""
    from ape_dts_ray.functions.dedup import simhash_dedup

    return simhash_dedup(_docs_ds(sf_dir, ["doc_id", "text"]),
                         max_hamming=3, max_bucket=1_000_000_000)


def dedup_embedding(sf_dir: str):
    """Embedding-cosine near-dup pairs, EXACT (block-pair all-pairs matmul —
    functions/dedup.py::cosine_pairs) so it carries a SQL oracle
    (list_cosine_similarity over a self-join). τ=0.3 is calibrated to the sf
    corpus (max pair cosine ≈ 0.51) so the result is non-trivial. The
    approximate scale path (sign-LSH buckets, ``embedding_dedup``) is covered
    by unit tests with planted duplicates."""
    from ape_dts_ray.functions.dedup import cosine_pairs

    out = cosine_pairs(f"{sf_dir}/embeddings.parquet", threshold=0.3)
    return out.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)


def _ann_inputs(sf_dir: str):
    """Shared ANN inputs: the embedding Dataset + the first-5 query dict —
    one implementation for ann_topk and ann_ivf so the read columns, query
    count and dtype can never drift between the exact baseline and the
    approximate path it is judged against."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).repartition(16)
    qdf = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"],
                          filter=pads.field("vec_id") < 5).to_pandas()
    queries = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
               for r in qdf.itertuples()}
    return ds, queries


def ann_topk(sf_dir: str):
    """Brute-force cosine top-10 of the first 5 embeddings against the corpus
    — exact, so it carries a SQL oracle (list_cosine_similarity)."""
    from ape_dts_ray.functions.similarity import brute_force_topk

    ds, queries = _ann_inputs(sf_dir)
    out = brute_force_topk(ds, queries, k=10)
    return out[["query_id", "vec_id", "rank"]]


def ann_ivf(sf_dir: str):
    """IVF-bucketed approximate top-10 — the scale path: sample-trained
    centroids, (centroid, shard) shuffle key so bucket-search parallelism is
    C×S tasks with bounded group size. Rows-only check (approximate by
    construction); recall@10 vs the exact ann_topk is asserted ≥ 0.9 in
    tests/test_functions.py and reported in BASELINE.md."""
    from ape_dts_ray.functions.similarity import ivf_topk

    ds, queries = _ann_inputs(sf_dir)
    # C=32/P=16/spill=2 measured recall@10 ≥ 0.90 (mean 0.96) at sf0.01 and
    # sf0.1 — random embeddings are the ANN-hardest case (no cluster
    # structure), hence the high probe fraction; real embedding corpora
    # cluster and run at much lower n_probe/n_centroids.
    out = ivf_topk(ds, queries, k=10, n_centroids=32, n_probe=16, n_shards=4,
                   spill=2)
    return out[["query_id", "vec_id", "rank"]]


def text_stats(sf_dir: str):
    """Quality-scoring primitives (integer outputs for exact oracle compare):
    token count (single-space split), char length, uppercase-letter count."""
    import ray.data as rd

    def stats(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        n_tokens = pc.add(pc.count_substring(txt, " "), 1)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "text_len": pc.cast(pc.utf8_length(txt), pa.int64()),
        })

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow")


# ---------- Redis family (SURVEY §2: psync extractor / sinker / parallelizer) ----------

REDIS_CHUNK = 10_000     # events per RESP log file (one psync segment each)
_STR_MOD = 997           # string keyspace width (forces SET/DEL contention)
_ZKEY_MOD = 13           # zset keyspace width (forces member-LWW contention)


def _redis_cmds_batch(t: pa.Table) -> pa.Table:
    """events batch → (chunk, event_id, cmd): full RESP frames as strings,
    vectorized pandas concat (no per-row Python). Derivation (kept in
    lockstep with the redis_replay oracle SQL in __ray_entry__):
      click/view → SET ev:{eid%997} v:{eid}:{props}
      error      → DEL ev:{eid%997}
      signup     → HSET conv:{uid} f{eid%40} {props}
      purchase   → ZADD zrank:{uid%13} {value} m{uid}
    All payloads are ASCII (props is JSON-ASCII), so char length == byte
    length and the RESP $<len> headers are exact."""
    import pandas as pd

    df = t.to_pandas()
    et = df["event_type"]

    def frame(args):
        s = pd.Series(f"*{len(args)}\r\n", index=args[-1].index)
        for a in args:
            if isinstance(a, str):
                s = s + f"${len(a)}\r\n{a}\r\n"
            else:
                s = s + "$" + a.str.len().astype(str) + "\r\n" + a + "\r\n"
        return s

    # build each frame only on its event-type subset (building all four on
    # the full batch quadrupled the string work — this stage was 4s of the
    # query's 3.9s at sf0.1)
    cmd = pd.Series(index=df.index, dtype=object)
    m_del = et.eq("error").to_numpy()
    m_set = et.isin(["click", "view"]).to_numpy()
    m_hset = et.eq("signup").to_numpy()
    m_zadd = et.eq("purchase").to_numpy()
    if df.loc[m_zadd, "value"].isna().any():
        # astype(str) would serialize NULL as the literal 'nan' while the
        # oracle's max_by yields NULL — fail loudly on latent data drift
        raise ValueError("redis_replay derivation: purchase event with NULL "
                         "value cannot be a deterministic ZADD score")
    if df.loc[m_set | m_hset, "props"].isna().any():
        # same drift class for the string-payload commands: NaN would ride
        # pandas string concat into cmd and only explode later as an
        # unintelligible TypeError inside the chunk writer's join
        raise ValueError("redis_replay derivation: click/view/signup event "
                         "with NULL props cannot build a deterministic "
                         "SET/HSET payload")
    unmatched = ~(m_del | m_set | m_hset | m_zadd)
    if unmatched.any():
        # the oracle enumerates exactly these five types — a catch-all here
        # would silently diverge from it if the generator's domain grew
        raise ValueError("redis_replay derivation: unknown event_type(s) "
                         f"{sorted(et[unmatched].unique())}")
    for mask, build in (
        (m_del, lambda d: frame([
            "DEL", "ev:" + (d["event_id"] % _STR_MOD).astype(str)])),
        (m_set, lambda d: frame([
            "SET", "ev:" + (d["event_id"] % _STR_MOD).astype(str),
            "v:" + d["event_id"].astype(str) + ":" + d["props"]])),
        (m_hset, lambda d: frame([
            "HSET", "conv:" + d["user_id"].astype(str),
            "f" + (d["event_id"] % 40).astype(str), d["props"]])),
        (m_zadd, lambda d: frame([
            "ZADD", "zrank:" + (d["user_id"] % _ZKEY_MOD).astype(str),
            d["value"].astype(str),     # shortest-roundtrip repr: exact
            "m" + d["user_id"].astype(str)])),
    ):
        if mask.any():
            cmd[mask] = build(df[mask])
    eid = df["event_id"]
    return pa.table({"chunk": pa.array((eid // REDIS_CHUNK).to_numpy(),
                                       pa.int64()),
                     "event_id": pa.array(eid.to_numpy(), pa.int64()),
                     # explicit string type: a 0-row batch would otherwise
                     # infer cmd: null and hand the groupby mixed schemas
                     "cmd": pa.array(cmd.to_numpy(), pa.string())})


def _write_redis_log(sf_dir: str, log_dir: str) -> None:
    """Derive the RESP replication log from events, distributed — one file
    per event-id chunk (= psync segment), written inside map_groups."""
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value", "props"])
    cmds = ds.map_batches(_redis_cmds_batch, batch_format="pyarrow")

    def write_chunk(t: pa.Table) -> pa.Table:
        import polars as pl

        g = pl.from_arrow(t).sort("event_id")
        seq = int(g["chunk"][0])
        path = os.path.join(log_dir, f"aof_{seq:06d}.resp")
        with open(path + ".tmp", "w") as f:
            f.write("".join(g["cmd"].to_list()))
        os.replace(path + ".tmp", path)
        return pa.table({"chunk": [seq], "cmds": [len(g)]})

    cmds.groupby("chunk").map_groups(
        write_chunk, batch_format="pyarrow").materialize()


_REDIS_LOG_CACHE: dict[str, str] = {}


def _shared_redis_log(sf_dir: str) -> str:
    """The derived RESP log is a PURE function of events.parquet, and both
    ``redis_replay`` and ``redis_incremental`` consume the identical bytes
    (the latter's oracle IS the former's) — derive it once per process and
    share, instead of paying the distributed log generation twice per suite
    run. Cleaned up at process exit."""
    import atexit
    import shutil

    d = _REDIS_LOG_CACHE.get(sf_dir)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix="ape_dts_ray_redislog_")
        _write_redis_log(sf_dir, d)
        _REDIS_LOG_CACHE[sf_dir] = d
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _redis_oracle_shape(out: pa.Table) -> pa.Table:
    """THE oracle landing shape shared by redis_replay and redis_incremental
    (their docstrings promise identical output; one cast table keeps that
    true by construction rather than by copy-paste)."""
    return pa.table({
        "key": pc.cast(out.column("key"), pa.string()),
        "field": pc.cast(out.column("field"), pa.string()),
        "value": pc.cast(out.column("value"), pa.string()),
        "score": out.column("score"),
    })


def redis_replay(sf_dir: str) -> pa.Table:
    """Full Redis CDC path: derive a RESP replication log from events
    (distributed, one file per event-id chunk = psync segment), tail it back
    (RedisPsyncExtractor analog), slot-partition (RedisParallelizer), fold to
    the final keyspace (RedisSinker apply semantics). Oracle-backed."""
    from ape_dts_ray.pipelines.redis_replay import read_resp_log, replay_redis

    log_dir = _shared_redis_log(sf_dir)
    state = replay_redis(read_resp_log(log_dir),
                         num_partitions=QUERY_PARTITIONS)
    out = pa.concat_tables(
        state.iter_batches(batch_format="pyarrow")).combine_chunks()
    return _redis_oracle_shape(out)


def redis_incremental(sf_dir: str) -> pa.Table:
    """Incremental Redis replication (the psync committed-offset / repl-ack
    story, redis_psync_extractor.rs:48-142): the SAME derived log as
    ``redis_replay``, but consumed through ``RedisKeyspaceStore`` in two
    watermark-advancing ingest calls — previous state re-folds as synthetic
    events below every fresh offset — plus a third call proving the
    consumed log is a no-op. The final keyspace must equal the one-shot
    fold, so the oracle IS ``redis_replay``'s."""
    import glob
    import shutil

    from ape_dts_ray.pipelines.redis_replay import RedisKeyspaceStore

    root = tempfile.mkdtemp(prefix="ape_dts_ray_redisinc_")
    live = os.path.join(root, "live")
    os.makedirs(live)
    try:
        # the SAME log bytes as redis_replay (shared derivation); hard-link
        # segments into the live dir in two waves to model log growth
        stage = _shared_redis_log(sf_dir)
        files = sorted(glob.glob(os.path.join(stage, "*.resp")))
        store = RedisKeyspaceStore.create(os.path.join(root, "store"),
                                          num_partitions=QUERY_PARTITIONS)
        cut = max(1, len(files) // 2)
        for f in files[:cut]:
            os.link(f, os.path.join(live, os.path.basename(f)))
        r1 = store.ingest(live)
        for f in files[cut:]:
            os.link(f, os.path.join(live, os.path.basename(f)))
        r2 = store.ingest(live)
        assert r1["files"] + r2["files"] == len(files)
        assert store.ingest(live)["files"] == 0      # consumed log = no-op
        out = store.keyspace_table()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return _redis_oracle_shape(out)


def redis_snapshot(sf_dir: str) -> pa.Table:
    """RDB snapshot roundtrip: documents → keyspace rows → partitioned RDB
    shard files (real binary format: length/int/LZF-sampled string encodings,
    CRC-64 trailers) → parse back (snapshot-file extractor). Oracle-backed."""
    import shutil

    import ray

    from ape_dts_ray.pipelines.redis_replay import (
        KEYSPACE_SCHEMA, read_rdb_snapshot, write_rdb_snapshot)

    snap_dir = tempfile.mkdtemp(prefix="ape_dts_ray_rdbsnap_")
    try:
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text", "n_chars"])

        def to_keyspace(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            sid = df["doc_id"].astype(str)
            keys = pd.concat(["doc:" + sid, "len:" + sid])
            vals = pd.concat([df["text"], df["n_chars"].astype(str)])
            n = len(keys)
            return pa.table({
                "db": pa.array(np.zeros(n, dtype=np.int32)),
                "key": pc.cast(pa.array(keys, type=pa.string()), pa.binary()),
                "rtype": pa.array(["string"] * n),
                "field": pa.nulls(n, pa.binary()),
                "idx": pa.nulls(n, pa.int64()),
                "value": pc.cast(pa.array(vals, type=pa.string()), pa.binary()),
                "score": pa.nulls(n, pa.float64()),
                "expire_ms": pa.array(np.zeros(n, dtype=np.int64)),
                "field_ttl_ms": pa.array(np.zeros(n, dtype=np.int64)),
            }, schema=KEYSPACE_SCHEMA)

        ks = ds.map_batches(to_keyspace, batch_format="pyarrow")
        write_rdb_snapshot(ks, snap_dir, num_partitions=QUERY_PARTITIONS,
                           lzf_sample=16).materialize()
        back = read_rdb_snapshot(snap_dir)
        out = pa.concat_tables(
            back.iter_batches(batch_format="pyarrow")).combine_chunks()
    finally:
        shutil.rmtree(snap_dir, ignore_errors=True)
    return pa.table({
        "key": pc.cast(out.column("key"), pa.string()),
        "value": pc.cast(out.column("value"), pa.string()),
    })


def redis_bigkeys(sf_dir: str) -> pa.Table:
    """Big-key statistic sink (redis_statistic_sinker.rs:20-53): encode a
    mixed string+hash keyspace to real RDB shards, parse them back (the RDB
    scan the reference's statistic task runs on), and emit the keys whose
    serialized size crosses the threshold, largest first, top-40. Hash
    buckets aggregate many documents, so they dominate the top — exactly
    the pre-migration hotspot this diagnostic exists to find. Oracle-backed
    (data_size is reproducible from documents in SQL)."""
    import shutil

    import ray

    from ape_dts_ray.pipelines.redis_replay import (
        KEYSPACE_SCHEMA, bigkey_statistics, read_rdb_snapshot,
        write_rdb_snapshot)

    snap_dir = tempfile.mkdtemp(prefix="ape_dts_ray_bigkeys_")
    try:
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"])

        def to_keyspace(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            sid = df["doc_id"].astype(str)
            n = len(df)
            keys = pd.concat(["doc:" + sid,
                              "bucket:" + (df["doc_id"] % 29).astype(str)])
            fields = pd.concat([pd.Series([None] * n, dtype=object),
                                "d" + sid])
            vals = pd.concat([df["text"], df["text"]])
            return pa.table({
                "db": pa.array(np.zeros(2 * n, dtype=np.int32)),
                "key": pc.cast(pa.array(keys, type=pa.string()), pa.binary()),
                "rtype": pa.array(["string"] * n + ["hash"] * n),
                "field": pc.cast(pa.array(fields, type=pa.string()),
                                 pa.binary()),
                "idx": pa.nulls(2 * n, pa.int64()),
                "value": pc.cast(pa.array(vals, type=pa.string()), pa.binary()),
                "score": pa.nulls(2 * n, pa.float64()),
                "expire_ms": pa.array(np.zeros(2 * n, dtype=np.int64)),
                "field_ttl_ms": pa.array(np.zeros(2 * n, dtype=np.int64)),
            }, schema=KEYSPACE_SCHEMA)

        ks = ds.map_batches(to_keyspace, batch_format="pyarrow")
        write_rdb_snapshot(ks, snap_dir, num_partitions=QUERY_PARTITIONS,
                           lzf_sample=16).materialize()
        out_ds = bigkey_statistics(read_rdb_snapshot(snap_dir),
                                   data_size_threshold=420, top_n=40,
                                   num_partitions=QUERY_PARTITIONS)
        batches = list(out_ds.iter_batches(batch_format="pyarrow"))
        if batches:
            out = pa.concat_tables(batches).combine_chunks()
        else:                       # nothing over the threshold: empty table
            out = pa.schema([("db_id", pa.int64()),
                             ("key_type", pa.string()),
                             ("key", pa.string()),
                             ("data_size", pa.int64())]).empty_table()
    finally:
        shutil.rmtree(snap_dir, ignore_errors=True)
    return out
