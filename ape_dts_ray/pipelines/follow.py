"""Continuous tail mode: follow a growing event-log directory as a daemon.

The reference is a long-running service — its CDC extractor tails a live log
indefinitely and the pipeline drains micro-batches forever
(dt-pipeline/src/base_pipeline.rs:59-141 drain loop;
dt-connector/src/extractor/mysql/mysql_cdc_extractor.rs:149-299 binlog tail),
resuming from the committed position on restart
(dt-task/src/task_runner.rs + cdc_resumer.rs:24-89).

Here the "live log" is a directory into which immutable Parquet segments are
appended (the lake-native analog of binlog file rotation). Each poll round:

    1. discover new/changed segments; read ONLY their footers (row-group
       statistics) to learn each file's max offset — cached by (path, size),
       so a long-running follower pays O(new files) per round, not O(log);
    2. if the log's max offset is past the lake's committed watermark, run
       the ordinary batch ``replay`` over just the segments that can still
       contain pending offsets — resume, exactly-once, growing-log tail
       recommit, DDL barriers and ONLINE compaction are all inherited from
       ``replay`` (pipelines/replay.py), follow adds only the loop;
    3. write a liveness heartbeat (also on idle rounds) and check the
       shutdown conditions (stop file / idle limit / round limit).

Crash safety is replay's: a SIGKILL anywhere leaves committed epochs + a
re-runnable tail; a restarted follower (or a one-shot ``replay`` of the full
log) converges to the identical state (tests/test_follow.py drives the
SIGKILL probe in a separate process).

SCALE NOTE: segments are assumed immutable once visible (the writer must
write-then-rename, as every sink in this repo does); a file whose size
changed is re-footered, never partially trusted. Pruned segments (footer max
below the pending floor) cost nothing per round. With
``auto_compact_max_deltas`` set, merge-on-read amplification stays bounded
for the whole (unbounded) run.
"""

from __future__ import annotations

import glob
import os
import time
from dataclasses import dataclass

from ape_dts_ray.state.lake import LakeTable, MaintenanceInProgress, _retry_vanished_files


@dataclass
class FollowStats:
    """Counts only — a daemon may run for months, so nothing here grows
    with the number of rounds (per-epoch manifests live in the lake)."""

    rounds: int = 0                 # poll rounds (idle + replaying)
    replay_rounds: int = 0          # rounds that ran a replay
    epochs_committed: int = 0
    events_applied: int = 0
    stopped_by: str = ""            # "stop_file" | "idle_limit" | "max_rounds"


def _file_offset_span(path: str, offset_col: str) -> tuple[int, int]:
    """(min, max) offset in one segment from footer statistics; falls back
    to a single-column scan unless EVERY row group carries statistics — a
    foreign writer mixing stats-bearing and stats-less row groups in one
    file would otherwise under-report max (events past the reported max
    would silently never replay). (-1, -1) for a 0-row segment."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    ci = f.schema_arrow.get_field_index(offset_col)
    if ci < 0:
        # a parquet file WITHOUT the offset column matched the log glob (a
        # foreign writer the docstring budgets for) — get_field_index
        # returns -1, and column(-1) would raise a bare IndexError that
        # kills the daemon mid-round; refuse with the actual problem named
        raise ValueError(
            f"follow: segment {path!r} lacks offset column {offset_col!r} "
            "— a foreign parquet file is in the log directory")
    mn, mx, complete = None, None, True
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(ci).statistics
        if st is None or st.max is None or st.min is None:
            complete = False
            break
        mn = st.min if mn is None else min(mn, st.min)
        mx = st.max if mx is None else max(mx, st.max)
    if not complete or mn is None:
        import pyarrow.compute as pc

        t = pq.read_table(path, columns=[offset_col])
        if t.num_rows == 0:
            return (-1, -1)
        mn = pc.min(t.column(offset_col)).as_py()
        mx = pc.max(t.column(offset_col)).as_py()
    return (int(mn), int(mx))


def _pending_floor(lake: LakeTable) -> int:
    """Lowest offset any pending window can start at. Commits are strictly
    epoch-ordered (replay.py), so everything below the highest committed
    epoch's offset_min is committed-and-skipped; only that tail epoch can be
    re-run by the growing-log recommit. Compaction markers carry
    offset_min == -1 and are fully covered by the compacted watermark.

    List-then-read is the reader/compactor race (a concurrent or orphaned
    ``compact()`` folds epochs and unlinks their manifests between our
    ``committed_epochs()`` and ``read_manifest()``) — this runs once per
    daemon round, so it goes through the same ``_retry_vanished_files``
    re-list contract as every other fold/export reader: a fresh listing
    sees the post-compaction epochs + advanced compacted watermark."""

    def body() -> int:
        committed = lake.committed_epochs()
        lo = 0
        if committed:
            m = lake.read_manifest(max(committed))
            # a FINAL tail epoch can never be extended (its window ended at
            # a natural boundary), so nothing below its end is pending; a
            # provisional tail may be re-committed with more events when
            # the log grows — keep every segment back to its window start
            if m.offset_min == -1 or m.final:
                lo = m.offset_max + 1
            else:
                lo = m.offset_min
        return max(lo, lake.compacted_watermark() + 1,
                   lake.truncate_offset + 1, 0)

    return _retry_vanished_files(body)


class _SegmentScan:
    """Incremental footer scan of a growing segment directory — the
    source-side half of the follow loop, shared by the single-lake and
    mixed-stream followers. ``scan(floor)`` returns the live
    ``{path: (size, min_off, max_off)}`` map, or None to defer the whole
    round (a transient read error on a LIVE segment — evicting it would let
    replay commit past its unapplied offsets, so the round retries instead,
    bounded at 10 consecutive deferrals). Vanished files (retention /
    rename races) are evicted, same as before. Gap refusal: a segment
    appearing after the follower committed past its offsets means the
    writer appended out of order — raise, never replay over a hole; the
    round-1 catch-up exemption burns only once segments have been SEEN."""

    def __init__(self, log_dir: str, pattern: str, offset_col: str):
        self.log_dir = log_dir
        self.pattern = pattern
        self.ocol = offset_col
        self.cache: dict[str, tuple[int, int, int]] = {}
        self.first_scan = True
        self.defer_rounds = 0

    def _check_vanish(self, p: str, floor: int) -> None:
        """A vanished segment whose CACHED span still reaches the pending
        floor held offsets replay has not durably moved past (the tail
        epoch's recommit re-reads them): silently evicting it would let the
        next recommit overwrite the committed delta with a SUBSET — erase
        already-applied rows. Refuse; only fully-below-floor segments (all
        offsets durably committed and compact-covered) evict quietly."""
        hit = self.cache.get(p)
        if hit is not None and hit[2] >= floor:
            raise RuntimeError(
                f"follow: segment {p} vanished while covering offsets at or "
                f"above the pending floor {floor} (cached span [{hit[1]}, "
                f"{hit[2]}]) — retention must not prune unapplied or "
                "tail-epoch segments")

    def scan(self, floor: int) -> dict[str, tuple[int, int, int]] | None:
        present: dict[str, tuple[int, int, int]] = {}
        deferred: OSError | None = None
        for p in sorted(glob.glob(os.path.join(self.log_dir, self.pattern))):
            try:
                size = os.path.getsize(p)
            except OSError as e:
                if not os.path.exists(p):
                    self._check_vanish(p, floor)
                    continue                # raced with retention/rename
                deferred = e                # live segment, transient error
                break
            hit = self.cache.get(p)
            if hit is not None and hit[0] == size:
                present[p] = hit
                continue
            try:
                mn, mx = _file_offset_span(p, self.ocol)
            except OSError as e:
                if not os.path.exists(p):
                    self._check_vanish(p, floor)
                    continue                # vanished between stat and
                                            # footer read (retention)
                deferred = e                # live segment, transient error
                break
            if hit is None and not self.first_scan and mn != -1 and mn < floor:
                raise RuntimeError(
                    f"late segment {p}: min offset {mn} is below the pending "
                    f"floor {floor} — segments must be appended to the log "
                    "in nondecreasing offset order")
            present[p] = (size, mn, mx)
        if deferred is not None:
            # keep last round's cache (no partial rebuild, first_scan not
            # burned) and retry at the next poll — an idle round, not a
            # replay over a hole. Bounded so a PERSISTENT error surfaces
            # loudly instead of spinning silently forever.
            self.defer_rounds += 1
            if self.defer_rounds >= 10:
                raise RuntimeError(
                    f"follow: {self.defer_rounds} consecutive rounds failed "
                    "to read a live segment's footer — giving up"
                ) from deferred
            return None
        self.defer_rounds = 0
        for p in self.cache:
            if p not in present:
                # vanished BEFORE this round's glob (retention sweep) —
                # the in-loop checks only see mid-round races
                self._check_vanish(p, floor)
        self.cache = present
        if present:
            self.first_scan = False
        return present


class _MaintenanceDefer:
    """Daemon-side handling of ``MaintenanceInProgress``: the marker means a
    rotation/truncate is RUNNING (or just completed under an in-flight
    chunk's plan) — it clears by itself moments later, so the round defers
    (sleeps one poll, reports progress=True so drain-then-exit mode cannot
    stop with unapplied offsets) and the next round re-plans under the
    lake's fresh placement. A marker that NEVER clears is a crashed
    maintenance op only an operator's re-run fixes: after ``grace`` seconds
    of consecutive refusals the original exception re-raises loudly. Any
    successful replay resets the clock."""

    def __init__(self, grace: float, poll_interval: float):
        self.grace = grace
        self.poll = poll_interval
        self.since: float | None = None

    def defer(self) -> bool:
        now = time.monotonic()
        if self.since is None:
            self.since = now
        elif now - self.since > self.grace:
            raise   # noqa: PLE0704 — only reachable from an except block
        time.sleep(self.poll)
        return True

    def clear(self) -> None:
        self.since = None


def replay_follow(
    lake: LakeTable,
    log_dir: str,
    pattern: str = "*.parquet",
    poll_interval: float = 0.25,
    stop_file: str | None = None,
    max_idle_rounds: int | None = None,
    max_rounds: int | None = None,
    group_epochs: int = 4,
    pipeline_depth: int = 2,
    auto_compact_max_deltas: int | None = None,
    heartbeat: bool = True,
    event_filter=None,
    router_fn=None,
    narrow_shuffle: bool = False,
    barriers: list[tuple[int, int]] | None = None,
    maintenance_grace: float = 60.0,
) -> FollowStats:
    """Tail ``log_dir`` forever (or until a stop condition), replaying every
    offset past the lake's watermark as it appears.

    Shutdown, in priority order (checked between rounds — a round in flight
    always finishes, so stop is always clean):
      * ``stop_file`` exists (touch it to request shutdown; the follower
        deletes it on exit so a restart doesn't immediately stop);
      * ``max_idle_rounds`` consecutive rounds saw no new offsets
        (drain-then-exit mode for tests / bounded backfills);
      * ``max_rounds`` total rounds ran.
    With all three unset the loop is the reference's daemon: it never
    returns.

    A round that races a CONCURRENT maintenance op (hot-key rotation /
    truncate — ``MaintenanceInProgress``) is deferred and retried: the op
    completes on its own and the next round re-plans under the lake's fresh
    placement, so dying would force an operator restart after every routine
    rotation (the mixed soak starved a follower to death this way under
    rotation churn). Bounded by ``maintenance_grace`` seconds of
    CONSECUTIVE refusals: a marker left by a CRASHED op never clears by
    itself, and only the operator's re-run fixes it — surface that loudly.
    """
    from ape_dts_ray.meta import COL_OFFSET
    from ape_dts_ray.pipelines.replay import replay

    if stop_file is None:
        stop_file = os.path.join(lake.root, "follow.stop")
    # segments carry the engine's canonical offset column — replay() plans,
    # filters and commits on COL_OFFSET, so the footer scan must use the
    # same column (a per-caller override here would desynchronize pruning
    # from the apply path)
    scanner = _SegmentScan(log_dir, pattern, COL_OFFSET)
    maint = _MaintenanceDefer(maintenance_grace, poll_interval)

    def one_round(stats: FollowStats) -> bool:
        floor = _pending_floor(lake)
        present = scanner.scan(floor)
        if present is None:
            # deferred round: a LIVE segment is pending behind a transient
            # read error — report progress=True so max_idle_rounds
            # (drain-then-exit mode) cannot mistake it for a drained log
            # and stop with unapplied offsets; the scanner's own 10-round
            # budget turns a persistent error into a loud failure
            return True
        log_max = max((mx for _, _, mx in present.values()), default=-1)
        wm = lake.watermark()
        if log_max <= wm:
            if heartbeat:
                # lag gauge: newest source offset vs committed watermark —
                # the monitor pair the reference's heartbeat publishes
                lake.write_heartbeat(source_max=max(log_max, wm))
            return False

        paths = sorted(p for p, (_, _, mx) in present.items()
                       if mx >= floor)
        try:
            ms = replay(lake, events_path=paths, max_offset=log_max,
                        barriers=barriers, event_filter=event_filter,
                        router_fn=router_fn, group_epochs=group_epochs,
                        pipeline_depth=pipeline_depth,
                        narrow_shuffle=narrow_shuffle, heartbeat=heartbeat,
                        auto_compact_max_deltas=auto_compact_max_deltas)
        except MaintenanceInProgress:
            return maint.defer()        # transient marker: retry next round
        maint.clear()
        stats.replay_rounds += 1
        stats.epochs_committed += len(ms)
        stats.events_applied += sum(p.events for m in ms for p in m.partitions)
        if heartbeat:
            # refresh the lag gauge against THIS round's source scan (the
            # replay's own heartbeats carry only the sink-side watermark)
            lake.write_heartbeat(source_max=log_max)
        return True

    return follow_loop(stop_file, poll_interval, max_idle_rounds, max_rounds,
                       one_round)


def replay_follow_mixed(
    lake_root: str,
    tables: list[str],
    log_dir: str,
    pattern: str = "*.parquet",
    poll_interval: float = 0.25,
    stop_file: str | None = None,
    max_idle_rounds: int | None = None,
    max_rounds: int | None = None,
    group_epochs: int = 4,
    heartbeat: bool = True,
    meta=None,
    config=None,
    table_filter=None,
    router=None,
    maintenance_grace: float = 60.0,
) -> FollowStats:
    """Mixed-stream daemon: tail ONE growing interleaved log (a ``table``
    column per event) into N lakes — the reference service's actual shape
    (one binlog position, TableParallelizer fan-out per drained batch,
    table_parallelizer.rs:86-114 + base_pipeline.rs:59-141). Each round is
    a ``replay_mixed`` over the pending segments, so the single sort-shuffle
    fan-out, shared epoch geometry, per-lake resume and the many-to-one
    routing refusal are all inherited; follow adds only the loop, the
    footer scan and the per-lake lag heartbeat. Crash safety: SIGKILL
    leaves epochs missing from SOME lakes; the next round (or a one-shot
    ``replay_mixed``) re-runs every window missing from ANY lake and
    converges — probed in tests/test_follow.py. A round racing a rotation
    or truncate on ANY of the lakes defers and retries like the single-lake
    daemon (``maintenance_grace``) — under rotation churn a die-and-restart
    follower starves (mixed soak, seed 785203650)."""
    from ape_dts_ray.meta import COL_OFFSET
    from ape_dts_ray.pipelines.multitable import replay_mixed
    from ape_dts_ray.stages.filter import TableFilter
    from ape_dts_ray.stages.router import Router

    if stop_file is None:
        stop_file = os.path.join(lake_root, "follow.stop")
    table_filter = table_filter or TableFilter()
    router = router or Router()
    targets = [router.route_table(t) for t in tables
               if not table_filter.filtered(t)]
    if not targets:
        # a daemon with zero tables would busy-spin re-reading the whole
        # log every round (replay_mixed drops every row, one_round never
        # idles) — a config error, refuse up front
        raise ValueError("replay_follow_mixed: no tables remain after "
                         "filtering — nothing to follow")
    scanner = _SegmentScan(log_dir, pattern, COL_OFFSET)  # see replay_follow
    maint = _MaintenanceDefer(maintenance_grace, poll_interval)
    opened: dict[str, LakeTable] = {}      # lifetime handles (config/meta
                                           # are immutable; committed state
                                           # is read from disk per call)

    def lakes() -> list[LakeTable]:
        for name in targets:
            if name not in opened:
                try:
                    opened[name] = LakeTable.open(
                        os.path.join(lake_root, name))
                except FileNotFoundError:
                    pass                   # not created yet (first round)
        return [opened[n] for n in targets if n in opened]

    def one_round(stats: FollowStats) -> bool:
        lks = lakes()
        if len(lks) < len(targets):
            # a target lake doesn't exist yet (first round, or a table
            # ADDED to a running set): it must backfill the WHOLE log, so
            # no segment may be pruned and no window skipped — floor 0.
            # Pruning by the established lakes' floor here would feed
            # replay_mixed a partial log while it plans ALL windows for
            # the new lake: early windows would commit EMPTY manifests
            # (history silently lost) and overwrite the established
            # lakes' real manifests with empty partition lists.
            floor = 0
        else:
            # min across lakes: conservative — replay_mixed re-runs any
            # window missing from ANY lake, so the lowest pending floor
            # governs both segment pruning and the gap refusal
            floor = min(_pending_floor(lk) for lk in lks)
        present = scanner.scan(floor)
        if present is None:
            # deferred round: a LIVE segment is pending behind a transient
            # read error — report progress=True so max_idle_rounds
            # (drain-then-exit mode) cannot mistake it for a drained log
            # and stop with unapplied offsets; the scanner's own 10-round
            # budget turns a persistent error into a loud failure
            return True
        log_max = max((mx for _, _, mx in present.values()), default=-1)
        wm = min((lk.watermark() for lk in lks), default=-1) \
            if len(lks) == len(targets) else -1
        if log_max <= wm:
            if heartbeat:
                for lk in lks:
                    lk.write_heartbeat(source_max=max(log_max, wm))
            return False
        paths = sorted(p for p, (_, _, mx) in present.items() if mx >= floor)
        if not paths:
            return False                    # nothing pending yet (empty log)
        try:
            res = replay_mixed(lake_root, tables, events_path=paths,
                               max_offset=log_max, meta=meta, config=config,
                               table_filter=table_filter, router=router,
                               group_epochs=group_epochs)
        except MaintenanceInProgress:
            return maint.defer()        # transient marker: retry next round
        maint.clear()
        ms_all = [m for ms in res.values() for m in ms]
        if not ms_all:
            return False                    # nothing committed — idle round
        stats.replay_rounds += 1
        # distinct epochs, like the single-lake follower (each epoch
        # commits one manifest PER lake). events_applied is a WORK gauge,
        # not an exactly-once ledger: a crash-recovery round re-runs every
        # window missing from ANY lake, so lakes that already held it
        # count those events again (same ≥ semantics as the single-lake
        # tail recommit).
        stats.epochs_committed += len({m.epoch for m in ms_all})
        stats.events_applied += sum(p.events for m in ms_all
                                    for p in m.partitions)
        if heartbeat:
            for lk in lakes():
                lk.write_heartbeat(source_max=log_max)
        return True

    return follow_loop(stop_file, poll_interval, max_idle_rounds, max_rounds,
                       one_round)


def follow_loop(stop_file: str, poll_interval: float,
                max_idle_rounds: int | None, max_rounds: int | None,
                round_fn) -> FollowStats:
    """Shared daemon shell for the follow twins (``replay_follow`` here and
    ``RedisKeyspaceStore.follow``): stop-file consume, round/idle/limit
    accounting, poll sleep — the contract that must stay in lockstep between
    them lives once. ``round_fn(stats)`` runs ONE round and returns True on
    progress (idle counter resets, no sleep) or False for an idle round
    (counts toward ``max_idle_rounds``, then sleeps ``poll_interval``).
    Shutdown conditions are checked BETWEEN rounds, so a round in flight
    always finishes and stop is always clean; the stop file is deleted on
    exit so a restart doesn't immediately stop."""
    stats = FollowStats()
    idle = 0
    while True:
        if os.path.exists(stop_file):
            stats.stopped_by = "stop_file"
            try:
                os.unlink(stop_file)
            except OSError:
                pass
            return stats
        if max_rounds is not None and stats.rounds >= max_rounds:
            stats.stopped_by = "max_rounds"
            return stats
        if max_idle_rounds is not None and idle >= max_idle_rounds:
            stats.stopped_by = "idle_limit"
            return stats
        stats.rounds += 1
        if round_fn(stats):
            idle = 0
        else:
            idle += 1
            time.sleep(poll_interval)
