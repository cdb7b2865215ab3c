"""Continuous tail mode (pipelines/follow.py): a follower drains a growing
segment directory, shuts down cleanly, survives SIGKILL + restart with state
identical to a one-shot replay, refuses out-of-order segments, and resumes
over a pre-existing log without re-applying (base_pipeline.rs:59-141 drain
loop + cdc_resumer.rs:24-89 semantics)."""

import json
import os
import signal
import subprocess
import sys
import threading
import time

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from ape_dts_ray.fixtures import gen_events, oracle_replay
from ape_dts_ray.meta import EngineConfig, TableMeta
from ape_dts_ray.pipelines.follow import replay_follow
from ape_dts_ray.pipelines.replay import replay
from ape_dts_ray.state.lake import LakeTable


def _mk_lake(tmp_path, name="lake", parts=8, epoch=1000):
    return LakeTable.create(str(tmp_path / name), TableMeta(),
                            EngineConfig(num_partitions=parts,
                                         epoch_size=epoch))


def _append_segment(tmp_path, log_dir, table, idx):
    """Write-then-rename, the immutability contract follow assumes."""
    tmpf = str(tmp_path / f"_seg{idx}.tmp")
    pq.write_table(table, tmpf)
    os.rename(tmpf, os.path.join(log_dir, f"seg{idx:04d}.parquet"))


def _segments(events, k):
    """Split the event table into k contiguous segments; returns
    (segments, per-segment max offsets). gen_events' row count is inserts +
    changes, so segment by ACTUAL rows, never by n_events."""
    n = events.num_rows
    bounds = [round(i * n / k) for i in range(k + 1)]
    segs = [events.slice(bounds[i], bounds[i + 1] - bounds[i])
            for i in range(k)]
    maxes = [int(pc.max(s.column("log_offset")).as_py()) for s in segs]
    return segs, maxes


def _wait_watermark(root, target, timeout=120.0, exc_box=None):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if exc_box and exc_box.get("exc") is not None:
            raise exc_box["exc"]
        if LakeTable.open(root).watermark() >= target:
            return
        time.sleep(0.1)
    raise TimeoutError(f"watermark never reached {target}")


@pytest.mark.usefixtures("ray_session")
def test_follow_drains_growing_log(tmp_path):
    events = gen_events(seed=71, n_convs=40, max_turns=8, n_events=6000,
                        delete_frac=0.2)
    segs, maxes = _segments(events, 4)
    log = tmp_path / "log"
    log.mkdir()
    lake = _mk_lake(tmp_path)
    stop = str(tmp_path / "stop")
    box = {"stats": None, "exc": None}

    def run():
        try:
            box["stats"] = replay_follow(lake, str(log), poll_interval=0.05,
                                         stop_file=stop, pipeline_depth=1)
        except BaseException as e:          # surfaced by _wait_watermark
            box["exc"] = e

    th = threading.Thread(target=run)
    th.start()
    try:
        for i, seg in enumerate(segs):
            _append_segment(tmp_path, str(log), seg, i)
            _wait_watermark(lake.root, maxes[i], exc_box=box)
    finally:
        open(stop, "w").close()
        th.join(timeout=120)
    assert not th.is_alive()
    assert box["exc"] is None
    stats = box["stats"]
    assert stats.stopped_by == "stop_file"
    assert stats.replay_rounds >= 4            # one per appended segment
    assert stats.events_applied >= events.num_rows  # tail recommit re-applies
    assert not os.path.exists(stop)            # consumed on shutdown

    state = LakeTable.open(lake.root).state_table().to_pandas()
    oracle = oracle_replay(events)
    assert len(state) == len(oracle)
    assert list(state["text"]) == list(oracle["text"])
    hb = LakeTable.open(lake.root).heartbeat()
    assert hb is not None and hb["watermark"] == maxes[-1]


_FOLLOW_SCRIPT = r"""
import sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ape_dts_ray.pipelines.follow import replay_follow
from ape_dts_ray.state.lake import LakeTable
lake = LakeTable.open(sys.argv[1])
print("FOLLOWER_READY", flush=True)
replay_follow(lake, sys.argv[2], poll_interval=0.05, stop_file=sys.argv[3],
              pipeline_depth=1, group_epochs=2, auto_compact_max_deltas=4)
"""


@pytest.mark.usefixtures("ray_session")
def test_follow_sigkill_restart_converges(tmp_path):
    """The verdict's soak probe: segments appended while a separate-process
    follower runs, SIGKILL mid-follow, restart (fresh process here = the
    pytest process), final state equal to a one-shot replay of the full
    log — the daemon's crash contract is exactly replay's."""
    events = gen_events(seed=72, n_convs=60, max_turns=8, n_events=8000,
                        delete_frac=0.25)
    segs, maxes = _segments(events, 4)
    log = tmp_path / "log"
    log.mkdir()
    lake = _mk_lake(tmp_path, epoch=1000)
    stop = str(tmp_path / "stop")

    _append_segment(tmp_path, str(log), segs[0], 0)
    proc = subprocess.Popen(
        [sys.executable, "-c", _FOLLOW_SCRIPT, lake.root, str(log), stop],
        cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        _wait_watermark(lake.root, maxes[0], timeout=180)  # seg0 applied
        _append_segment(tmp_path, str(log), segs[1], 1)
        _wait_watermark(lake.root, maxes[1], timeout=120)  # mid-follow
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    assert proc.returncode == -signal.SIGKILL

    # the log keeps growing while the follower is down
    _append_segment(tmp_path, str(log), segs[2], 2)
    _append_segment(tmp_path, str(log), segs[3], 3)

    # restart: catch-up replays the backlog, then drains to idle and exits
    lake2 = LakeTable.open(lake.root)
    stats = replay_follow(lake2, str(log), poll_interval=0.05,
                          max_idle_rounds=3, pipeline_depth=1,
                          group_epochs=2, auto_compact_max_deltas=4)
    assert stats.stopped_by == "idle_limit"
    assert stats.replay_rounds >= 1
    assert LakeTable.open(lake.root).watermark() == maxes[-1]

    oneshot = _mk_lake(tmp_path, name="oneshot", epoch=1000)
    full = str(tmp_path / "full.parquet")
    pq.write_table(events, full)
    replay(oneshot, events_path=full)

    got = LakeTable.open(lake.root).state_table().to_pandas()
    want = oneshot.state_table().to_pandas()
    assert len(got) == len(want)
    assert list(got["text"]) == list(want["text"])
    assert list(got["conv_id"]) == list(want["conv_id"])


_FOLLOW_MIXED_SCRIPT = r"""
import sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ape_dts_ray.meta import EngineConfig
from ape_dts_ray.pipelines.follow import replay_follow_mixed
print("FOLLOWER_READY", flush=True)
replay_follow_mixed(sys.argv[1], ["tbl_even", "tbl_odd"], sys.argv[2],
                    poll_interval=0.05, stop_file=sys.argv[3],
                    config=EngineConfig(num_partitions=4, epoch_size=1000))
"""


@pytest.mark.usefixtures("ray_session")
def test_follow_mixed_sigkill_restart_converges(tmp_path):
    """Mixed-stream crash contract: SIGKILL a separate-process mixed
    follower mid-drain (epochs may be committed in SOME lakes only),
    restart, and both lakes converge to a one-shot replay_mixed of the
    full log."""
    import pyarrow as pa
    import pyarrow.compute as pc2

    from ape_dts_ray.meta import EngineConfig as EC
    from ape_dts_ray.pipelines.follow import replay_follow_mixed
    from ape_dts_ray.pipelines.multitable import replay_mixed

    events = gen_events(seed=78, n_convs=60, max_turns=8, n_events=8000,
                        delete_frac=0.25)
    parity = pc2.bit_wise_and(
        pc2.index_in(events.column("conv_id"),
                     value_set=pc2.unique(events.column("conv_id"))),
        pa.scalar(1, pa.int32()))
    mixed = events.append_column(
        "table", pc2.if_else(pc2.equal(parity, pa.scalar(0, pa.int32())),
                             pa.scalar("tbl_even"), pa.scalar("tbl_odd")))
    segs, maxes = _segments(mixed, 4)
    log = tmp_path / "log"
    log.mkdir()
    root = str(tmp_path / "lakes")
    stop = str(tmp_path / "stop")
    cfg = EC(num_partitions=4, epoch_size=1000)

    def wm_even():
        try:
            return LakeTable.open(os.path.join(root, "tbl_even")).watermark()
        except FileNotFoundError:
            return -1

    _append_segment(tmp_path, str(log), segs[0], 0)
    proc = subprocess.Popen(
        [sys.executable, "-c", _FOLLOW_MIXED_SCRIPT, root, str(log), stop],
        cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        t0 = time.time()
        while wm_even() < maxes[0]:
            assert time.time() - t0 < 180, "seg0 never applied"
            time.sleep(0.1)
        _append_segment(tmp_path, str(log), segs[1], 1)
        t0 = time.time()
        while wm_even() < maxes[1]:
            assert time.time() - t0 < 120, "seg1 never applied"
            time.sleep(0.05)
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    assert proc.returncode == -signal.SIGKILL

    _append_segment(tmp_path, str(log), segs[2], 2)
    _append_segment(tmp_path, str(log), segs[3], 3)

    stats = replay_follow_mixed(root, ["tbl_even", "tbl_odd"], str(log),
                                poll_interval=0.05, max_idle_rounds=3,
                                config=cfg)
    assert stats.stopped_by == "idle_limit" and stats.replay_rounds >= 1

    oneshot = str(tmp_path / "oneshot")
    full = str(tmp_path / "full.parquet")
    pq.write_table(mixed, full)
    replay_mixed(oneshot, ["tbl_even", "tbl_odd"], events_path=full,
                 config=cfg)
    for name in ("tbl_even", "tbl_odd"):
        got = LakeTable.open(os.path.join(root, name)).state_table() \
                       .to_pandas()
        want = LakeTable.open(os.path.join(oneshot, name)).state_table() \
                        .to_pandas()
        assert len(got) == len(want)
        assert list(got["text"]) == list(want["text"])
        assert list(got["conv_id"]) == list(want["conv_id"])


@pytest.mark.usefixtures("ray_session")
def test_follow_idle_limit_and_heartbeat(tmp_path):
    log = tmp_path / "log"
    log.mkdir()
    lake = _mk_lake(tmp_path)
    stats = replay_follow(lake, str(log), poll_interval=0.01,
                          max_idle_rounds=3)
    assert stats.stopped_by == "idle_limit"
    assert stats.rounds == 3 and stats.replay_rounds == 0
    assert lake.heartbeat() is not None       # liveness even when idle


@pytest.mark.usefixtures("ray_session")
def test_follow_mixed_drains_growing_log(tmp_path):
    """Mixed-stream daemon (the reference's actual service shape — one log
    position, table fan-out per drained batch): a growing interleaved log
    drains into BOTH lakes, each converging to the per-table oracle, with
    per-lake lag heartbeats; a restart over the drained log is a no-op."""
    import pyarrow as pa
    import pyarrow.compute as pc2

    from ape_dts_ray.pipelines.follow import replay_follow_mixed

    events = gen_events(seed=77, n_convs=40, max_turns=8, n_events=6000,
                        delete_frac=0.2)
    parity = pc2.bit_wise_and(
        pc2.index_in(events.column("conv_id"),
                     value_set=pc2.unique(events.column("conv_id"))),
        pa.scalar(1, pa.int32()))
    tblcol = pc2.if_else(pc2.equal(parity, pa.scalar(0, pa.int32())),
                         pa.scalar("tbl_even"), pa.scalar("tbl_odd"))
    mixed = events.append_column("table", tblcol)
    segs, maxes = _segments(mixed, 3)
    log = tmp_path / "log"
    log.mkdir()
    root = str(tmp_path / "lakes")
    stop = str(tmp_path / "stop")
    cfg = EngineConfig(num_partitions=4, epoch_size=1000)
    box = {"stats": None, "exc": None}

    def run():
        try:
            box["stats"] = replay_follow_mixed(
                root, ["tbl_even", "tbl_odd"], str(log), poll_interval=0.05,
                stop_file=stop, config=cfg)
        except BaseException as e:
            box["exc"] = e

    def wait_both(target, timeout=120.0):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if box["exc"] is not None:
                raise box["exc"]
            try:
                if all(LakeTable.open(os.path.join(root, n)).watermark()
                       >= target for n in ("tbl_even", "tbl_odd")):
                    return
            except FileNotFoundError:
                pass
            time.sleep(0.1)
        raise TimeoutError(f"watermarks never reached {target}")

    th = threading.Thread(target=run)
    th.start()
    try:
        for i, seg in enumerate(segs):
            _append_segment(tmp_path, str(log), seg, i)
            wait_both(maxes[i])
    finally:
        open(stop, "w").close()
        th.join(timeout=120)
    assert not th.is_alive() and box["exc"] is None
    assert box["stats"].replay_rounds >= 3
    assert box["stats"].events_applied >= events.num_rows

    for name, par in (("tbl_even", 0), ("tbl_odd", 1)):
        lk = LakeTable.open(os.path.join(root, name))
        mask = pc2.equal(parity, pa.scalar(par, pa.int32()))
        oracle = oracle_replay(events.filter(mask))
        state = lk.state_table().to_pandas()
        assert len(state) == len(oracle)
        assert sorted(state["text"]) == sorted(oracle["text"])
        hb = lk.heartbeat()
        assert hb["source_max"] == maxes[-1] and hb["lag"] == 0

    # restart over the fully-drained log: pure no-op rounds
    stats2 = replay_follow_mixed(root, ["tbl_even", "tbl_odd"], str(log),
                                 poll_interval=0.01, max_idle_rounds=2,
                                 config=cfg)
    assert stats2.replay_rounds == 0 and stats2.stopped_by == "idle_limit"


@pytest.mark.usefixtures("ray_session")
def test_mixed_late_table_onboarding(tmp_path):
    """A table ADDED to an existing mixed-lake set (service config change)
    backfills from the shared log without disturbing the established lake:
    replay_mixed re-runs every window missing from ANY lake, per-table
    re-commits of already committed epochs are deterministic no-op
    overwrites, and the late lake converges to its per-table oracle."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc2

    from ape_dts_ray.pipelines.multitable import replay_mixed

    events = gen_events(seed=79, n_convs=30, max_turns=6, n_events=4000,
                        delete_frac=0.2)
    parity = pc2.bit_wise_and(
        pc2.index_in(events.column("conv_id"),
                     value_set=pc2.unique(events.column("conv_id"))),
        pa.scalar(1, pa.int32()))
    mixed = events.append_column(
        "table", pc2.if_else(pc2.equal(parity, pa.scalar(0, pa.int32())),
                             pa.scalar("tbl_even"), pa.scalar("tbl_odd")))
    path = str(tmp_path / "mixed.parquet")
    pq.write_table(mixed, path)
    root = str(tmp_path / "lakes")
    cfg = EngineConfig(num_partitions=4, epoch_size=1000)

    # phase 1: the service only knows tbl_even (tbl_odd rows are unknown
    # table names — dropped in the shard stage)
    replay_mixed(root, ["tbl_even"], events_path=path, config=cfg)
    even = LakeTable.open(os.path.join(root, "tbl_even"))
    before = even.state_table().to_pandas()

    # phase 2: tbl_odd onboards — the new lake backfills the whole log,
    # the established lake's state is untouched by the no-op re-commits
    replay_mixed(root, ["tbl_even", "tbl_odd"], events_path=path, config=cfg)
    after = LakeTable.open(os.path.join(root, "tbl_even")) \
        .state_table().to_pandas()
    pd.testing.assert_frame_equal(before, after)
    for name, par in (("tbl_even", 0), ("tbl_odd", 1)):
        state = LakeTable.open(os.path.join(root, name)) \
            .state_table().to_pandas()
        oracle = oracle_replay(
            events.filter(pc2.equal(parity, pa.scalar(par, pa.int32()))))
        assert len(state) == len(oracle)
        assert sorted(state["text"]) == sorted(oracle["text"])


@pytest.mark.usefixtures("ray_session")
def test_follow_mixed_late_onboarding_backfills(tmp_path):
    """Late onboarding through the FOLLOW loop (review finding): with an
    established lake already drained past the log, a follower started with
    an ADDITIONAL table must backfill the new lake from offset 0 — pruning
    by the established lake's floor would feed replay_mixed a partial log
    while it plans ALL windows for the new lake (empty manifests = history
    silently lost, and the established lake's manifests overwritten with
    empty partition lists)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc2

    from ape_dts_ray.pipelines.follow import replay_follow_mixed
    from ape_dts_ray.pipelines.multitable import replay_mixed

    events = gen_events(seed=80, n_convs=30, max_turns=6, n_events=4000,
                        delete_frac=0.2)
    parity = pc2.bit_wise_and(
        pc2.index_in(events.column("conv_id"),
                     value_set=pc2.unique(events.column("conv_id"))),
        pa.scalar(1, pa.int32()))
    mixed = events.append_column(
        "table", pc2.if_else(pc2.equal(parity, pa.scalar(0, pa.int32())),
                             pa.scalar("tbl_even"), pa.scalar("tbl_odd")))
    segs, _ = _segments(mixed, 3)
    log = tmp_path / "log"
    log.mkdir()
    for i, seg in enumerate(segs):
        _append_segment(tmp_path, str(log), seg, i)
    root = str(tmp_path / "lakes")
    cfg = EngineConfig(num_partitions=4, epoch_size=1000)

    # phase 1: the service only knows tbl_even; drain the whole log
    paths = sorted(str(p) for p in log.glob("*.parquet"))
    replay_mixed(root, ["tbl_even"], events_path=paths, config=cfg)
    even = LakeTable.open(os.path.join(root, "tbl_even"))
    before = even.state_table().to_pandas()
    even_lineage_rows = even.lineage_table().num_rows

    # phase 2: tbl_odd onboards through the DAEMON over the drained log
    stats = replay_follow_mixed(root, ["tbl_even", "tbl_odd"], str(log),
                                poll_interval=0.01, max_idle_rounds=2,
                                config=cfg)
    assert stats.replay_rounds >= 1            # backfill actually ran
    after_even = LakeTable.open(os.path.join(root, "tbl_even"))
    pd.testing.assert_frame_equal(before,
                                  after_even.state_table().to_pandas())
    # the established lake's lineage survives the no-op re-commits
    assert after_even.lineage_table().num_rows >= even_lineage_rows
    odd = LakeTable.open(os.path.join(root, "tbl_odd"))
    oracle = oracle_replay(
        events.filter(pc2.equal(parity, pa.scalar(1, pa.int32()))))
    state = odd.state_table().to_pandas()
    assert len(state) == len(oracle)
    assert sorted(state["text"]) == sorted(oracle["text"])

    # empty table set: refuse up front instead of busy-spinning forever
    with pytest.raises(ValueError, match="no tables"):
        replay_follow_mixed(root, [], str(log), max_idle_rounds=1)


@pytest.mark.usefixtures("ray_session")
def test_follow_mixed_survives_external_rotation(tmp_path):
    """Rotating ONE lake of a mixed set while the daemon runs: the shard
    stage adopts each lake's PERSISTED salt per table (config.hot_keys only
    seeds new lakes), so the daemon keeps draining after the rotation and
    both lakes converge to their oracles — no duplicated hot keys (the
    pre-fix one-global-salt placement folded old-salt deltas AND the
    rotated base). Sequenced so the rotation lands while the daemon is
    idle: a rotation racing an in-flight round is the marker/placement-gen
    refusal, probed elsewhere."""
    import pyarrow as pa
    import pyarrow.compute as pc2

    from ape_dts_ray.pipelines.follow import replay_follow_mixed

    events = gen_events(seed=78, n_convs=30, max_turns=8, n_events=5000,
                        delete_frac=0.2)
    parity = pc2.bit_wise_and(
        pc2.index_in(events.column("conv_id"),
                     value_set=pc2.unique(events.column("conv_id"))),
        pa.scalar(1, pa.int32()))
    tblcol = pc2.if_else(pc2.equal(parity, pa.scalar(0, pa.int32())),
                         pa.scalar("tbl_even"), pa.scalar("tbl_odd"))
    mixed = events.append_column("table", tblcol)
    segs, maxes = _segments(mixed, 4)
    log = tmp_path / "log"
    log.mkdir()
    root = str(tmp_path / "lakes")
    stop = str(tmp_path / "stop")
    cfg = EngineConfig(num_partitions=4, epoch_size=1000)
    box = {"stats": None, "exc": None}

    def run():
        try:
            box["stats"] = replay_follow_mixed(
                root, ["tbl_even", "tbl_odd"], str(log), poll_interval=0.05,
                stop_file=stop, config=cfg)
        except BaseException as e:
            box["exc"] = e

    def wait_both(target, timeout=120.0):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if box["exc"] is not None:
                raise box["exc"]
            try:
                if all(LakeTable.open(os.path.join(root, n)).watermark()
                       >= target for n in ("tbl_even", "tbl_odd")):
                    return
            except FileNotFoundError:
                pass
            time.sleep(0.1)
        raise TimeoutError(f"watermarks never reached {target}")

    th = threading.Thread(target=run)
    th.start()
    try:
        for i, seg in enumerate(segs[:2]):
            _append_segment(tmp_path, str(log), seg, i)
            wait_both(maxes[i])
        # external rotation of ONE lake while the daemon idles (conv-000000
        # is first-seen → tbl_even); a SEPARATE instance, like an operator
        # CLI — the daemon must pick the new salt up from disk next round
        even = LakeTable.open(os.path.join(root, "tbl_even"))
        assert even.compact(new_hot_keys=("conv-000000",),
                            parallel=False) >= 0
        assert even.placement_gen == 1
        for i, seg in enumerate(segs[2:]):
            _append_segment(tmp_path, str(log), seg, 2 + i)
            wait_both(maxes[2 + i])
    finally:
        open(stop, "w").close()
        th.join(timeout=120)
    assert not th.is_alive() and box["exc"] is None

    for name, par in (("tbl_even", 0), ("tbl_odd", 1)):
        lk = LakeTable.open(os.path.join(root, name))
        mask = pc2.equal(parity, pa.scalar(par, pa.int32()))
        oracle = oracle_replay(events.filter(mask))
        state = lk.state_table().to_pandas()
        assert not state.duplicated(["conv_id", "turn_idx"]).any()
        assert len(state) == len(oracle)
        assert sorted(state["text"]) == sorted(oracle["text"])


@pytest.mark.usefixtures("ray_session")
def test_follow_defers_through_live_rotation_marker(tmp_path):
    """A rotation marker appearing between rounds must NOT kill the daemon:
    MaintenanceInProgress is transient by construction (the op completes and
    the marker clears), so the round defers and retries — dying here forces
    an operator restart after every routine rotation (the mixed soak starved
    a follower to death that way, seed 785203650). While the marker is
    present the watermark must hold (refusal, not replay-over-maintenance);
    once it clears the daemon drains to convergence on its own."""
    events = gen_events(seed=81, n_convs=30, max_turns=8, n_events=4000,
                        delete_frac=0.2)
    segs, maxes = _segments(events, 2)
    log = tmp_path / "log"
    log.mkdir()
    lake = _mk_lake(tmp_path)
    stop = str(tmp_path / "stop")
    box = {"stats": None, "exc": None}

    def run():
        try:
            box["stats"] = replay_follow(lake, str(log), poll_interval=0.05,
                                         stop_file=stop, pipeline_depth=1)
        except BaseException as e:
            box["exc"] = e

    th = threading.Thread(target=run)
    th.start()
    marker = os.path.join(lake.root, "_manifests", "rotation.json")
    try:
        _append_segment(tmp_path, str(log), segs[0], 0)
        _wait_watermark(lake.root, maxes[0], exc_box=box)
        # rotation starts while the daemon idles: marker file IS the gate
        with open(marker, "w") as f:
            json.dump({"new_hot_keys": []}, f)
        _append_segment(tmp_path, str(log), segs[1], 1)
        t0 = time.time()
        while time.time() - t0 < 2.0:       # daemon alive, deferring, held
            assert th.is_alive() and box["exc"] is None
            assert LakeTable.open(lake.root).watermark() == maxes[0]
            time.sleep(0.2)
        os.unlink(marker)                   # rotation finished
        _wait_watermark(lake.root, maxes[1], exc_box=box)
    finally:
        if os.path.exists(marker):
            os.unlink(marker)
        open(stop, "w").close()
        th.join(timeout=120)
    assert not th.is_alive() and box["exc"] is None

    state = LakeTable.open(lake.root).state_table().to_pandas()
    oracle = oracle_replay(events)
    assert len(state) == len(oracle)
    assert list(state["text"]) == list(oracle["text"])


@pytest.mark.usefixtures("ray_session")
def test_follow_raises_after_maintenance_grace(tmp_path):
    """A marker that NEVER clears is a crashed maintenance op — only an
    operator's re-run fixes it, so after maintenance_grace seconds of
    consecutive refusals the daemon surfaces the original exception loudly
    instead of deferring forever."""
    from ape_dts_ray.state.lake import MaintenanceInProgress

    events = gen_events(seed=82, n_convs=10, max_turns=4, n_events=500)
    log = tmp_path / "log"
    log.mkdir()
    lake = _mk_lake(tmp_path)
    _append_segment(tmp_path, str(log), events, 0)
    marker = os.path.join(lake.root, "_manifests", "rotation.json")
    with open(marker, "w") as f:
        json.dump({"new_hot_keys": []}, f)
    t0 = time.time()
    with pytest.raises(MaintenanceInProgress, match="rotation in progress"):
        replay_follow(lake, str(log), poll_interval=0.05,
                      stop_file=str(tmp_path / "stop"), pipeline_depth=1,
                      maintenance_grace=1.0)
    assert time.time() - t0 >= 1.0          # it did defer through the grace


@pytest.mark.usefixtures("ray_session")
def test_follow_mixed_defers_through_live_rotation_marker(tmp_path):
    """Mixed-daemon twin of the defer test: a rotation marker on ONE lake of
    the set holds the WHOLE round (replay_mixed plans all lakes together),
    the daemon stays alive, and draining resumes once the marker clears."""
    import pyarrow as pa
    import pyarrow.compute as pc2

    from ape_dts_ray.pipelines.follow import replay_follow_mixed

    events = gen_events(seed=83, n_convs=24, max_turns=6, n_events=3000,
                        delete_frac=0.2)
    parity = pc2.bit_wise_and(
        pc2.index_in(events.column("conv_id"),
                     value_set=pc2.unique(events.column("conv_id"))),
        pa.scalar(1, pa.int32()))
    tblcol = pc2.if_else(pc2.equal(parity, pa.scalar(0, pa.int32())),
                         pa.scalar("tbl_even"), pa.scalar("tbl_odd"))
    mixed = events.append_column("table", tblcol)
    segs, maxes = _segments(mixed, 2)
    log = tmp_path / "log"
    log.mkdir()
    root = str(tmp_path / "lakes")
    stop = str(tmp_path / "stop")
    cfg = EngineConfig(num_partitions=4, epoch_size=1000)
    box = {"stats": None, "exc": None}

    def run():
        try:
            box["stats"] = replay_follow_mixed(
                root, ["tbl_even", "tbl_odd"], str(log), poll_interval=0.05,
                stop_file=stop, config=cfg)
        except BaseException as e:
            box["exc"] = e

    def wait_both(target, timeout=120.0):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if box["exc"] is not None:
                raise box["exc"]
            try:
                if all(LakeTable.open(os.path.join(root, n)).watermark()
                       >= target for n in ("tbl_even", "tbl_odd")):
                    return
            except FileNotFoundError:
                pass
            time.sleep(0.1)
        raise TimeoutError(f"watermarks never reached {target}")

    th = threading.Thread(target=run)
    th.start()
    marker = os.path.join(root, "tbl_even", "_manifests", "rotation.json")
    try:
        _append_segment(tmp_path, str(log), segs[0], 0)
        wait_both(maxes[0])
        with open(marker, "w") as f:
            json.dump({"new_hot_keys": []}, f)
        _append_segment(tmp_path, str(log), segs[1], 1)
        t0 = time.time()
        while time.time() - t0 < 2.0:
            assert th.is_alive() and box["exc"] is None
            assert LakeTable.open(os.path.join(root, "tbl_even")) \
                .watermark() == maxes[0]
            time.sleep(0.2)
        os.unlink(marker)
        wait_both(maxes[1])
    finally:
        if os.path.exists(marker):
            os.unlink(marker)
        open(stop, "w").close()
        th.join(timeout=120)
    assert not th.is_alive() and box["exc"] is None

    for name, par in (("tbl_even", 0), ("tbl_odd", 1)):
        lk = LakeTable.open(os.path.join(root, name))
        mask = pc2.equal(parity, pa.scalar(par, pa.int32()))
        oracle = oracle_replay(events.filter(mask))
        state = lk.state_table().to_pandas()
        assert len(state) == len(oracle)
        assert sorted(state["text"]) == sorted(oracle["text"])


@pytest.mark.usefixtures("ray_session")
def test_follow_heartbeat_lag_gauge(tmp_path):
    """The follower's heartbeat publishes the source position and derived
    lag (the reference monitor's sinked-vs-extracted pair): zero after a
    drain, the unapplied span while the source is ahead."""
    log = tmp_path / "log"
    log.mkdir()
    lake = _mk_lake(tmp_path)
    events = gen_events(seed=31, n_convs=40, n_events=3_000)
    segs, maxes = _segments(events, 2)
    _append_segment(tmp_path, str(log), segs[0], 0)
    _append_segment(tmp_path, str(log), segs[1], 1)
    replay_follow(lake, str(log), poll_interval=0.01, max_idle_rounds=2)
    hb = lake.heartbeat()
    assert hb["source_max"] == maxes[1]
    assert hb["lag"] == 0 and hb["watermark"] == maxes[1]
    # source ahead of the sink: direct gauge write (what a follower's scan
    # does before its replay round lands)
    hb2 = lake.write_heartbeat(source_max=maxes[1] + 57)
    assert hb2["lag"] == 57 and hb2["source_max"] == maxes[1] + 57


@pytest.mark.usefixtures("ray_session")
def test_follow_max_rounds(tmp_path):
    log = tmp_path / "log"
    log.mkdir()
    lake = _mk_lake(tmp_path)
    stats = replay_follow(lake, str(log), poll_interval=0.01, max_rounds=2)
    assert stats.stopped_by == "max_rounds" and stats.rounds == 2


@pytest.mark.usefixtures("ray_session")
def test_follow_gap_refusal(tmp_path):
    """A segment appearing AFTER the follower committed past its offsets is
    an out-of-order append — refused loudly (positional-log contract), never
    silently skipped or double-applied."""
    events = gen_events(seed=73, n_convs=20, max_turns=6, n_events=3000)
    log = tmp_path / "log"
    log.mkdir()
    lake = _mk_lake(tmp_path)
    stop = str(tmp_path / "stop")
    box = {"exc": None, "stats": None}

    def run():
        try:
            box["stats"] = replay_follow(lake, str(log), poll_interval=0.05,
                                         stop_file=stop, pipeline_depth=1)
        except BaseException as e:
            box["exc"] = e

    seg0 = events.slice(0, 2000)
    _append_segment(tmp_path, str(log), seg0, 0)
    th = threading.Thread(target=run)
    th.start()
    try:
        _wait_watermark(lake.root,
                        int(pc.max(seg0.column("log_offset")).as_py()),
                        exc_box=box)
        # late segment: offsets far below the committed watermark
        _append_segment(tmp_path, str(log), events.slice(500, 400), 1)
        th.join(timeout=60)
    finally:
        open(stop, "w").close()
        th.join(timeout=60)
    assert isinstance(box["exc"], RuntimeError)
    assert "late segment" in str(box["exc"])


@pytest.mark.usefixtures("ray_session")
def test_follow_with_schema_barrier(tmp_path):
    """Daemon + DDL barrier: a schema-change offset mid-log (additive column
    under version 1) cuts epoch windows identically whether the log is
    consumed by a follower in waves or by one-shot replay — the barrier
    plan is a pure function of (epoch_size, barriers), not of arrival."""
    import pyarrow as pa
    import pyarrow.compute as pc2

    events = gen_events(seed=76, n_convs=20, max_turns=6, n_events=3000)
    n = events.num_rows
    cut = (n // 2) // 7 * 7 + 3              # deliberately not epoch-aligned
    segs, maxes = _segments(events, 3)
    log = tmp_path / "log"
    log.mkdir()
    lake = _mk_lake(tmp_path, parts=4, epoch=700)

    def add_channel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or pc2.max(t.column("log_offset")).as_py() < cut:
            return t
        is_v1 = pc2.greater_equal(t.column("log_offset"),
                                  pa.scalar(cut, pa.int64()))
        ch = pc2.if_else(
            pc2.and_(is_v1, pc2.not_equal(t.column("op"),
                                          pa.scalar("delete"))),
            pa.scalar("v1"), pa.nulls(t.num_rows, pa.string()))
        return t.append_column("channel", ch)

    stop = str(tmp_path / "stop")
    box = {}

    def run():
        try:
            box["stats"] = replay_follow(
                lake, str(log), poll_interval=0.05, stop_file=stop,
                pipeline_depth=1, barriers=[(cut, 1)], router_fn=add_channel)
        except BaseException as e:
            box["exc"] = e

    th = threading.Thread(target=run)
    th.start()
    try:
        for i, seg in enumerate(segs):
            _append_segment(tmp_path, str(log), seg, i)
            _wait_watermark(lake.root, maxes[i], exc_box=box)
    finally:
        open(stop, "w").close()
        th.join(timeout=120)
    assert box.get("exc") is None, box.get("exc")

    full = str(tmp_path / "full.parquet")
    pq.write_table(events, full)
    oneshot = _mk_lake(tmp_path, name="oneshot", parts=4, epoch=700)
    replay(oneshot, events_path=full, barriers=[(cut, 1)],
           router_fn=add_channel)

    cols = ["conv_id", "turn_idx", "text", "channel"]
    got = (LakeTable.open(lake.root).state_table().select(cols)
           .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]))
    want = (oneshot.state_table().select(cols)
            .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]))
    assert got.equals(want)
    # the barrier actually split an epoch window in BOTH paths
    ep = sorted(LakeTable.open(lake.root).committed_epochs())
    assert ep == sorted(oneshot.committed_epochs())
    ends = [LakeTable.open(lake.root).read_manifest(e).offset_max
            for e in ep]
    assert cut - 1 in ends                   # window cut exactly at barrier


@pytest.mark.usefixtures("ray_session")
def test_redis_store_follow_drains_growing_log(tmp_path):
    """The Redis-family daemon twin: RedisKeyspaceStore.follow tails a
    growing RESP log (one ingest per round, ingest's own gap refusal and
    generation-watermark crash contract), stops on the stop file, and the
    final keyspace equals a one-shot ingest of the full log."""
    from ape_dts_ray.pipelines.redis_replay import (RedisKeyspaceStore,
                                                    write_resp_log)

    cmds = ([[b"SET", b"k%d" % i, b"v%d" % i] for i in range(300)]
            + [[b"HSET", b"h%d" % (i % 7), b"f%d" % i, b"x"]
               for i in range(200)]
            + [[b"DEL", b"k%d" % i] for i in range(0, 300, 3)])
    cuts = [0, 150, 350, len(cmds)]

    log = str(tmp_path / "log")      # NOT created yet: the daemon starts
    store = RedisKeyspaceStore.create(str(tmp_path / "store"),  # first and
                                      num_partitions=4)         # idles
    stop = str(tmp_path / "stop")
    box = {}

    def run():
        try:
            box["stats"] = store.follow(log, poll_interval=0.05,
                                        stop_file=stop)
        except BaseException as e:
            box["exc"] = e

    th = threading.Thread(target=run)
    th.start()
    try:
        time.sleep(0.3)              # several missing-dir idle rounds
        assert box.get("exc") is None
        for seq in range(3):
            write_resp_log(cmds[cuts[seq]:cuts[seq + 1]], log, seq)
            t0 = time.time()
            while (RedisKeyspaceStore.open(store.root)
                   .watermark()["next_file_seq"] <= seq):
                if box.get("exc") is not None:
                    raise box["exc"]
                if time.time() - t0 > 120:
                    raise TimeoutError(f"store never consumed seq {seq}")
                time.sleep(0.05)
    finally:
        open(stop, "w").close()
        th.join(timeout=120)
    assert box.get("exc") is None, box.get("exc")
    stats = box["stats"]
    assert stats.stopped_by == "stop_file"
    # one commit point (generation) per consumed wave
    assert stats.replay_rounds == 3 and stats.epochs_committed == 3
    hb = json.load(open(os.path.join(store.root, "heartbeat.json")))
    assert hb["watermark"]["next_file_seq"] == 3 and "time_unix" in hb

    oneshot = RedisKeyspaceStore.create(str(tmp_path / "oneshot"),
                                        num_partitions=4)
    oneshot.ingest(log)
    got = store.keyspace_table()
    want = oneshot.keyspace_table()
    assert got.num_rows == want.num_rows and got.equals(want)
    # idle drain mode exits cleanly on a consumed log
    s2 = RedisKeyspaceStore.open(store.root).follow(
        log, poll_interval=0.01, max_idle_rounds=2)
    assert s2.stopped_by == "idle_limit" and s2.replay_rounds == 0


@pytest.mark.usefixtures("ray_session")
def test_follow_resumes_existing_log_without_reapply(tmp_path):
    """Round-1 catch-up over a fully committed log is a no-op (committed
    epochs skip wholesale) — no replay round runs, state bytes untouched."""
    events = gen_events(seed=74, n_convs=20, max_turns=6, n_events=2000)
    log = tmp_path / "log"
    log.mkdir()
    _append_segment(tmp_path, str(log), events, 0)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=str(log / "seg0000.parquet"))
    before = lake.state_table()
    wm = lake.watermark()

    stats = replay_follow(LakeTable.open(lake.root), str(log),
                          poll_interval=0.01, max_idle_rounds=2)
    assert stats.replay_rounds == 0 and stats.stopped_by == "idle_limit"
    after = LakeTable.open(lake.root)
    assert after.watermark() == wm
    assert after.state_table().equals(before)


@pytest.mark.usefixtures("ray_session")
def test_follow_restart_over_late_appearing_log_catches_up(tmp_path):
    """Review finding: the round-1 catch-up exemption must burn only once
    segments have actually been SEEN. A follower restarted while the log
    dir is momentarily empty (daemon-before-producer start order) must
    catch up when the pre-existing segments appear, not gap-refuse."""
    events = gen_events(seed=76, n_convs=20, max_turns=6, n_events=3000)
    segs, maxes = _segments(events, 2)
    log = tmp_path / "log"
    log.mkdir()
    lake = _mk_lake(tmp_path, parts=4, epoch=500)
    # one-shot replay of segment 0 → committed floor/watermark > 0
    _append_segment(tmp_path, str(log), segs[0], 0)
    replay(lake, events_path=str(log / "seg0000.parquet"))
    assert lake.watermark() == maxes[0]
    # the log dir the restarted follower sees is EMPTY for its first scans
    os.unlink(str(log / "seg0000.parquet"))

    stop = str(tmp_path / "stop")
    box = {"stats": None, "exc": None}

    def run():
        try:
            box["stats"] = replay_follow(LakeTable.open(lake.root), str(log),
                                         poll_interval=0.05, stop_file=stop,
                                         pipeline_depth=1)
        except BaseException as e:
            box["exc"] = e

    th = threading.Thread(target=run)
    th.start()
    try:
        time.sleep(0.3)                     # several empty scans elapse
        # both segments appear, incl. seg0 whose offsets sit BELOW the
        # committed floor — the catch-up exemption must still apply
        _append_segment(tmp_path, str(log), segs[0], 0)
        _append_segment(tmp_path, str(log), segs[1], 1)
        _wait_watermark(lake.root, maxes[1], exc_box=box)
    finally:
        open(stop, "w").close()
        th.join(timeout=120)
    assert not th.is_alive()
    assert box["exc"] is None

    state = LakeTable.open(lake.root).state_table().to_pandas()
    oracle = oracle_replay(events)
    assert len(state) == len(oracle)
    assert list(state["text"]) == list(oracle["text"])


@pytest.mark.usefixtures("ray_session")
def test_follow_survives_footer_read_race(tmp_path, monkeypatch):
    """Review finding: a transient footer-read failure (here the
    retention-race FileNotFoundError shape) must not kill the daemon — and
    since the segment still EXISTS, it must be DEFERRED (the whole round
    retried later), never evicted: evicting a live segment would let the
    round replay past its unapplied offsets, a durable silent skip."""
    from ape_dts_ray.pipelines import follow as followmod

    events = gen_events(seed=77, n_convs=15, max_turns=5, n_events=2000)
    log = tmp_path / "log"
    log.mkdir()
    lake = _mk_lake(tmp_path, parts=4, epoch=500)
    _append_segment(tmp_path, str(log), events, 0)

    real = followmod._file_offset_span
    tripped = {"n": 0}

    def racy(p, ocol):
        if tripped["n"] == 0:               # first footer read vanishes
            tripped["n"] += 1
            raise FileNotFoundError(p)
        return real(p, ocol)

    monkeypatch.setattr(followmod, "_file_offset_span", racy)
    mx = int(pc.max(events.column("log_offset")).as_py())
    stats = replay_follow(lake, str(log), poll_interval=0.01,
                          max_idle_rounds=3, pipeline_depth=1)
    assert tripped["n"] == 1                # the race actually fired
    assert stats.stopped_by == "idle_limit"
    assert lake.watermark() == mx           # later round applied the segment

    state = lake.state_table().to_pandas()
    oracle = oracle_replay(events)
    assert len(state) == len(oracle)


@pytest.mark.usefixtures("ray_session")
def test_follow_defers_round_on_live_segment_read_error(tmp_path, monkeypatch):
    """Review finding (severe): a transient read error (EIO/EMFILE shape) on
    a segment that still EXISTS must defer the whole round — before the fix
    the segment was evicted like a vanished one, so the round replayed PAST
    its unapplied offsets and committed the skip durably (the next round's
    gap refusal then fired only after the data loss). With deferral the
    follower retries and ends with the complete state."""
    from ape_dts_ray.pipelines import follow as followmod

    events = gen_events(seed=79, n_convs=20, max_turns=6, n_events=3000)
    segs, maxes = _segments(events, 2)
    log = tmp_path / "log"
    log.mkdir()
    lake = _mk_lake(tmp_path, parts=4, epoch=500)
    _append_segment(tmp_path, str(log), segs[0], 0)
    _append_segment(tmp_path, str(log), segs[1], 1)

    real = followmod._file_offset_span
    trips = {"n": 0}
    failing = os.path.join(str(log), "seg0000.parquet")

    def flaky(p, ocol):
        if p == failing and trips["n"] < 2:   # live file, transient error
            trips["n"] += 1
            raise OSError(5, "Input/output error", p)
        return real(p, ocol)

    monkeypatch.setattr(followmod, "_file_offset_span", flaky)
    stats = replay_follow(lake, str(log), poll_interval=0.01,
                          max_idle_rounds=3, pipeline_depth=1)
    assert trips["n"] == 2                  # the error actually fired twice
    assert stats.stopped_by == "idle_limit"
    assert lake.watermark() == maxes[1]

    state = lake.state_table().to_pandas()
    oracle = oracle_replay(events)
    assert len(state) == len(oracle)        # nothing skipped
    assert list(state["text"]) == list(oracle["text"])


@pytest.mark.usefixtures("ray_session")
def test_follow_gives_up_loudly_on_persistent_read_error(tmp_path,
                                                         monkeypatch):
    """The deferral is bounded: a PERSISTENT footer-read failure must
    surface as an error after a handful of rounds, not spin silently
    forever — and nothing may have been committed past the failed segment."""
    from ape_dts_ray.pipelines import follow as followmod

    events = gen_events(seed=80, n_convs=10, max_turns=4, n_events=1200)
    log = tmp_path / "log"
    log.mkdir()
    lake = _mk_lake(tmp_path, parts=4, epoch=500)
    _append_segment(tmp_path, str(log), events, 0)

    def broken(p, ocol):
        raise OSError(24, "Too many open files", p)

    monkeypatch.setattr(followmod, "_file_offset_span", broken)
    with pytest.raises(RuntimeError, match="consecutive rounds"):
        replay_follow(lake, str(log), poll_interval=0.001, pipeline_depth=1)
    assert lake.watermark() == -1           # no skip was ever committed


@pytest.mark.usefixtures("ray_session")
def test_mixed_replan_after_one_lake_compacts(tmp_path):
    """Regression (round-5 verify drive, concurrent-compactor race): once
    ONE mixed lake compacts, its manifests fold into the compacted base —
    replay_mixed's old intersection-of-manifests planning then counted
    NOTHING as done, and a follow-style delta round over a PRUNED source
    (only tail segments survive the pending floor) re-ran every early
    window empty, overwriting the OTHER lake's real manifests (lost LWW
    winners). Planning is per-lake now (manifest OR compacted coverage):
    the delta round must be a pure no-op and both states must stay exact."""
    import pyarrow as pa
    import pyarrow.compute as pc2

    from ape_dts_ray.pipelines.multitable import replay_mixed

    events = gen_events(seed=88, n_convs=40, max_turns=8, n_events=6000,
                        delete_frac=0.2)
    parity = pc2.bit_wise_and(
        pc2.index_in(events.column("conv_id"),
                     value_set=pc2.unique(events.column("conv_id"))),
        pa.scalar(1, pa.int32()))
    tblcol = pc2.if_else(pc2.equal(parity, pa.scalar(0, pa.int32())),
                         pa.scalar("tbl_even"), pa.scalar("tbl_odd"))
    mixed = events.append_column("table", tblcol)
    segs, maxes = _segments(mixed, 3)
    log = tmp_path / "log"
    log.mkdir()
    for i, seg in enumerate(segs):
        _append_segment(tmp_path, str(log), seg, i)
    paths = sorted(str(log / f) for f in os.listdir(log))
    names = ["tbl_even", "tbl_odd"]
    cfg = EngineConfig(num_partitions=4, epoch_size=1000)
    root = str(tmp_path / "lakes")
    replay_mixed(root, names, events_path=paths, config=cfg)

    LakeTable.open(os.path.join(root, "tbl_even")).compact()
    odd_manifests = set(
        LakeTable.open(os.path.join(root, "tbl_odd")).committed_epochs())

    # follow-style delta round: everything is committed, the floor pruned
    # all but the tail segment — must be a no-op for BOTH lakes
    res = replay_mixed(root, names, events_path=[paths[-1]], config=cfg,
                       max_offset=maxes[-1])
    assert all(ms == [] for ms in res.values()), res
    assert set(LakeTable.open(os.path.join(root, "tbl_odd"))
               .committed_epochs()) == odd_manifests

    for name, par in (("tbl_even", 0), ("tbl_odd", 1)):
        lk = LakeTable.open(os.path.join(root, name))
        mask = pc2.equal(parity, pa.scalar(par, pa.int32()))
        oracle = oracle_replay(events.filter(mask))
        state = lk.state_table().to_pandas()
        assert len(state) == len(oracle), name
        assert sorted(state["text"]) == sorted(oracle["text"]), name
