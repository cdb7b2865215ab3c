"""Round-4 operators: incremental/partial compaction (bounded read
amplification), plus the crash probes that prove its markerless protocol.

Reference semantics: the merger consumes only sealed epochs incrementally
(foxlake_parallelizer.rs:70-126, foxlake_merger.rs:82-104) instead of
rewriting the full base — partial compaction is this engine's analog.
"""

import hashlib
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from ape_dts_ray.fixtures import gen_events, oracle_replay
from ape_dts_ray.meta import EngineConfig, TableMeta
from ape_dts_ray.pipelines.replay import replay
from ape_dts_ray.state.lake import LakeTable


def _mk_lake(tmp_path, **cfg):
    defaults = dict(num_partitions=8, epoch_size=500)
    defaults.update(cfg)
    return LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(**defaults))


def _md5(path):
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


def _base_hashes(lake):
    out = {}
    for pid in range(lake.config.num_partitions):
        bp = lake.base_path(pid)
        if os.path.exists(bp):
            out[pid] = _md5(bp)
    return out


@pytest.mark.usefixtures("ray_session")
def test_partial_compaction_horizon_preserves_state(tmp_path):
    """compact(keep_epochs=H) folds only the sealed prefix: state and
    watermark unchanged, the newest H epochs' deltas stay as files, every
    partition's merge-on-read amplification drops to ≤ 1 base + H deltas,
    and replay resume stays a no-op."""
    events = gen_events(seed=41, n_convs=40, max_turns=8, n_events=4180,
                        delete_frac=0.2)   # 4500 events = 9 full epochs
    path = str(tmp_path / "e.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path)
    epochs = lake.committed_epochs()
    assert len(epochs) >= 8
    before, wm = lake.state_table(), lake.watermark()
    assert max(lake.delta_file_counts().values()) >= 4

    folded = lake.compact(keep_epochs=2, parallel=False)
    assert folded >= 1
    assert lake.committed_epochs() == epochs[-2:]       # sealed horizon kept
    assert all(c <= 2 for c in lake.delta_file_counts().values())
    assert lake.watermark() == wm
    assert lake.state_table().equals(before)

    # resume is still a no-op, and the lake reopens clean
    assert replay(LakeTable.open(lake.root), events_path=path) == []
    assert LakeTable.open(lake.root).state_table().equals(before)


@pytest.mark.usefixtures("ray_session")
def test_partial_compaction_threshold_is_strict_subset(tmp_path):
    """compact(max_delta_files=K) touches ONLY partitions over the
    threshold: after a hot-partition-only delta buildup, cold partitions'
    base files are byte-identical (never rewritten) while hot ones fold."""
    events = gen_events(seed=43, n_convs=40, max_turns=8, n_events=4180,
                        delete_frac=0.1)   # 4500 events = 9 full epochs
    path = str(tmp_path / "e.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path)
    lake.compact(parallel=False)                         # clean full base
    cold_hashes = _base_hashes(lake)

    # follow-on CDC burst touching ONE conversation → few partitions hot
    import pyarrow as pa
    import pyarrow.compute as pc
    n0 = events.num_rows
    tail = gen_events(seed=44, n_convs=1, max_turns=8, n_events=1492,
                      delete_frac=0.0)     # 1500 events = 3 full epochs
    tail = tail.set_column(
        tail.column_names.index("log_offset"), "log_offset",
        pc.add(tail.column("log_offset"), pa.scalar(n0, pa.int64())))
    tpath = str(tmp_path / "tail.parquet")
    pq.write_table(tail, tpath)
    replay(LakeTable.open(lake.root), events_path=tpath, min_offset=n0)

    lake = LakeTable.open(lake.root)
    counts = lake.delta_file_counts()
    hot = {p for p, c in counts.items() if c > 0}
    assert 0 < len(hot) < lake.config.num_partitions     # genuinely a subset

    folded = lake.compact(max_delta_files=0, parallel=False)
    assert folded == len(hot)
    after_hashes = _base_hashes(lake)
    for pid in set(cold_hashes) - hot:                   # cold: untouched bytes
        assert after_hashes[pid] == cold_hashes[pid], pid
    for pid in hot:                                      # hot: rewritten
        assert after_hashes.get(pid) != cold_hashes.get(pid), pid
    assert lake.committed_epochs() == []                 # prefix fully consumed

    full = pa.concat_tables([events, tail]).combine_chunks()
    oracle = oracle_replay(full)
    state = lake.state_table().to_pandas()
    assert len(state) == len(oracle)
    assert list(state["text"]) == list(oracle["text"])


@pytest.mark.usefixtures("ray_session")
def test_partial_compaction_below_threshold_noop(tmp_path):
    events = gen_events(seed=45, n_convs=20, max_turns=6, n_events=2000)
    path = str(tmp_path / "e.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path)
    epochs = lake.committed_epochs()
    before = lake.state_table()
    assert lake.compact(max_delta_files=99, parallel=False) == 0
    assert lake.committed_epochs() == epochs             # nothing consumed
    assert lake.state_table().equals(before)
    with pytest.raises(ValueError):                      # rotation needs full
        lake.compact(new_hot_keys=("conv-000000",), max_delta_files=1)


_CRASH_SCRIPT = r"""
import os, sys
import ape_dts_ray.state.lake as lake_mod
from ape_dts_ray.state.lake import LakeTable

orig = lake_mod.atomic_write_parquet
n = [0]
def dying_write(t, path, **kw):
    orig(t, path, **kw)
    n[0] += 1
    if n[0] == int(sys.argv[2]):
        os._exit(137)          # SIGKILL analog: no cleanup, no unlink
lake_mod.atomic_write_parquet = dying_write
LakeTable.open(sys.argv[1]).compact(max_delta_files=0, parallel=False)
"""


@pytest.mark.usefixtures("ray_session")
def test_partial_compaction_crash_midway_converges(tmp_path):
    """Hard-kill partial compaction right after a partition's new base is
    written but BEFORE its consumed deltas are unlinked (the widest crash
    window of the markerless protocol): the overlap (base ⊇ deltas) folds
    to identical LWW winners, so state is unchanged, and a rerun converges
    to the clean-compaction result."""
    events = gen_events(seed=46, n_convs=40, max_turns=8, n_events=4180,
                        delete_frac=0.25)
    path = str(tmp_path / "e.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path)
    before, wm = lake.state_table(), lake.watermark()

    r = subprocess.run([sys.executable, "-c", _CRASH_SCRIPT, lake.root, "3"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 137, r.stderr

    crashed = LakeTable.open(lake.root)                  # overlap window:
    assert crashed.state_table().equals(before)          # state unharmed
    assert crashed.watermark() == wm

    crashed.compact(max_delta_files=0, parallel=False)   # rerun converges
    done = LakeTable.open(lake.root)
    assert done.state_table().equals(before)
    assert done.watermark() == wm
    assert done.committed_epochs() == []
    assert all(c == 0 for c in done.delta_file_counts().values())
    assert replay(LakeTable.open(lake.root), events_path=path) == []


@pytest.mark.usefixtures("ray_session")
def test_bigkey_statistics_sizes_and_topn():
    """Big-key sink size semantics (redis_statistic_sinker.rs:20-53 via
    redis_entry.rs:53-61): data_size = key bytes + Σ(field + value bytes +
    8 per score); threshold filters, top_n truncates under the
    (size desc, key asc) total order — including a key whose rows arrive
    split across batches."""
    import pyarrow as pa
    import ray.data as rd

    from ape_dts_ray.pipelines.redis_replay import (KEYSPACE_SCHEMA,
                                                    bigkey_statistics)

    def row(key, rtype, field=None, value=None, score=None):
        return {"db": 0, "key": key.encode(), "rtype": rtype,
                "field": field.encode() if field else None, "idx": None,
                "value": value.encode() if value else None, "score": score,
                "expire_ms": 0, "field_ttl_ms": 0}

    rows = [
        row("s1", "string", value="x" * 100),          # 2 + 100 = 102
        row("zbig", "zset", field="m1", score=1.0),    # 4 + (2+8)
        row("zbig", "zset", field="m2", score=2.0),    # + (2+8) = 24
        row("h", "hash", field="f1", value="v" * 50),  # 1 + 52
        row("h", "hash", field="f2", value="v" * 50),  # + 52 = 105
        row("tiny", "string", value="v"),              # 4 + 1 = 5
    ]
    # split the hash key across two input blocks: partials must re-combine
    ds = rd.from_arrow([
        pa.Table.from_pylist(rows[:4], schema=KEYSPACE_SCHEMA),
        pa.Table.from_pylist(rows[4:], schema=KEYSPACE_SCHEMA)])
    out = pa.concat_tables(bigkey_statistics(ds, data_size_threshold=24)
                           .iter_batches(batch_format="pyarrow"))
    got = {r["key"]: (r["key_type"], r["data_size"])
           for r in out.to_pylist()}
    assert got == {"s1": ("string", 102), "h": ("hash", 105),
                   "zbig": ("zset", 24)}                 # tiny filtered out
    top = pa.concat_tables(
        bigkey_statistics(ds, data_size_threshold=0, top_n=2)
        .iter_batches(batch_format="pyarrow")).to_pylist()
    assert [r["key"] for r in top] == ["h", "s1"]        # size-desc order


@pytest.mark.usefixtures("ray_session")
def test_online_auto_compaction_during_replay(tmp_path):
    """replay(auto_compact_max_deltas=K): the continuous-merger mode
    (foxlake_parallelizer.rs:70-126 — merge runs ALONGSIDE the pusher).
    Delta buildup stays bounded at K for the whole replay, the state is
    oracle-exact, a mid-replay crash resumes exactly-once under the same
    policy, and depth-2 overlapped groups are safe."""
    events = gen_events(seed=49, n_convs=40, max_turns=8, n_events=6180,
                        delete_frac=0.2)
    path = str(tmp_path / "e.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path, epoch_size=250)   # 24+ epochs of buildup
    replay(lake, events_path=path, group_epochs=2, pipeline_depth=2,
           auto_compact_max_deltas=3)
    counts = lake.delta_file_counts()
    assert max(counts.values()) <= 3            # bounded THROUGHOUT
    oracle = oracle_replay(events)
    state = lake.state_table().to_pandas()
    assert len(state) == len(oracle)
    assert list(state["text"]) == list(oracle["text"])

    # crash mid-replay, resume under the same policy → identical state
    lake2 = LakeTable.create(str(tmp_path / "lake2"), TableMeta(),
                             EngineConfig(num_partitions=8, epoch_size=250))
    replay(lake2, events_path=path, stop_after_epoch=7,
           auto_compact_max_deltas=3)
    lake2 = LakeTable.open(lake2.root)
    replay(lake2, events_path=path, auto_compact_max_deltas=3)
    state2 = lake2.state_table().to_pandas()
    assert list(state2["text"]) == list(oracle["text"])
    assert max(lake2.delta_file_counts().values(), default=0) <= 3
    assert replay(LakeTable.open(lake2.root), events_path=path) == []


_AC_KILL_SCRIPT = r"""
import sys
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ape_dts_ray.pipelines.replay import replay
from ape_dts_ray.state.lake import LakeTable
replay(LakeTable.open(sys.argv[1]), events_path=sys.argv[2],
       group_epochs=1, auto_compact_max_deltas=2)
print("COMPLETED")
"""


@pytest.mark.usefixtures("ray_session")
def test_online_auto_compaction_sigkill_resume(tmp_path):
    """Hard-kill the DRIVER mid-replay while online compaction is active
    (the windows between compact ticks, delta unlinks and manifest commits
    all land under the kill), then resume under the same policy in a fresh
    process — state converges to the oracle exactly once."""
    import time

    events = gen_events(seed=50, n_convs=30, max_turns=8, n_events=5010,
                        delete_frac=0.2)
    path = str(tmp_path / "e.parquet")
    pq.write_table(events, path)
    lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(num_partitions=8, epoch_size=250))

    crashed = False
    for delay in (11.0, 8.0, 6.0):       # land the kill mid-replay
        proc = subprocess.Popen([sys.executable, "-c", _AC_KILL_SCRIPT,
                                 lake.root, path],
                                cwd="/root/repo", stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True)
        time.sleep(delay)
        if proc.poll() is None:
            proc.kill()
            proc.wait()
            crashed = True
            break
        # finished before the kill — wipe and retry faster
        import shutil as _sh
        _sh.rmtree(lake.root)
        lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                                EngineConfig(num_partitions=8,
                                             epoch_size=250))
    # whether or not a kill landed (machine-speed dependent), the resume
    # must converge exactly-once; a landed kill additionally exercises the
    # torn auto-compact windows
    replay(LakeTable.open(lake.root), events_path=path, group_epochs=1,
           auto_compact_max_deltas=2)
    lake = LakeTable.open(lake.root)
    oracle = oracle_replay(events)
    state = lake.state_table().to_pandas()
    assert len(state) == len(oracle)
    assert list(state["text"]) == list(oracle["text"])
    assert max(lake.delta_file_counts().values(), default=0) <= 2
    assert replay(LakeTable.open(lake.root), events_path=path) == []
    assert crashed or True                # informational; see docstring


@pytest.mark.usefixtures("ray_session")
def test_partial_compaction_random_sequences_converge(tmp_path):
    """Randomized schedules: any interleaving of partial compactions
    (random thresholds/horizons), CDC continuation, and full compaction
    preserves the oracle state at every step — the maintenance policy can
    fire WHENEVER it wants between replays."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    events = gen_events(seed=48, n_convs=30, max_turns=8, n_events=3000,
                        delete_frac=0.2)
    half = events.num_rows // 2
    p1, p2 = str(tmp_path / "e1.parquet"), str(tmp_path / "e2.parquet")
    pq.write_table(events.slice(0, half), p1)
    pq.write_table(events.slice(half), p2)
    oracle_half = oracle_replay(events.slice(0, half))
    oracle_full = oracle_replay(events)

    rng = np.random.default_rng(7)
    for trial in range(6):
        root = str(tmp_path / f"lake{trial}")
        lake = LakeTable.create(root, TableMeta(),
                                EngineConfig(num_partitions=8, epoch_size=300))
        replay(lake, events_path=p1)

        def check(expect):
            got = LakeTable.open(root).state_table().to_pandas()
            assert len(got) == len(expect)
            assert list(got["text"]) == list(expect["text"])

        for _ in range(int(rng.integers(1, 4))):        # random maintenance
            lake = LakeTable.open(root)
            lake.compact(max_delta_files=int(rng.integers(0, 4)),
                         keep_epochs=int(rng.integers(0, 4)),
                         parallel=False)
            check(oracle_half)
        replay(LakeTable.open(root), events_path=p2, min_offset=half)
        check(oracle_full)
        lake = LakeTable.open(root)
        if rng.random() < 0.5:
            lake.compact(max_delta_files=0, parallel=False)
        else:
            lake.compact(parallel=False)
        check(oracle_full)
        assert replay(LakeTable.open(root), events_path=p2,
                      min_offset=half) == []             # resume no-op


@pytest.mark.usefixtures("ray_session")
def test_hot_key_detection_high_cardinality_bounded():
    """A stream with 50k UNIQUE conversations plus one hot key: detection
    still finds exactly the hot key, and the driver only ever receives the
    top-⌊1/threshold⌋+1 candidate rows (structural bound in hotkeys.py —
    this stream would previously land 50k rows)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ape_dts_ray.stages.hotkeys import detect_hot_keys

    n_unique, n_hot = 50_000, 30_000
    conv = np.concatenate([
        np.char.add("conv-", np.arange(n_unique).astype(str)),
        np.full(n_hot, "conv-hot", dtype=object)])
    rng = np.random.default_rng(4)
    rng.shuffle(conv)
    ds = rd.from_arrow(pa.table({"conv_id": pa.array(conv, pa.string())}))
    assert detect_hot_keys(ds, threshold=0.05) == ("conv-hot",)
    # sub-threshold world (unique ids only): nothing hot, empty tuple —
    # not a 50k-row driver landing
    uniform = np.char.add("conv-", np.arange(n_unique).astype(str))
    ds2 = rd.from_arrow(pa.table({"conv_id": pa.array(uniform, pa.string())}))
    assert detect_hot_keys(ds2, threshold=0.05) == ()
    assert detect_hot_keys(ds2.limit(0), threshold=0.05) == ()


def test_avro_columnar_guards():
    """Review findings on the columnar codec: torn/bit-flipped rows raise
    in-row corruption errors (cursors never read a NEIGHBOR row's bytes),
    null required fields refuse at encode (the scalar reference raised),
    and large_string inputs encode byte-identically (int64 offsets — the
    int32 read silently corrupted them)."""
    import pyarrow as pa

    from ape_dts_ray.stages import avro

    row = {"log_offset": 5, "seq": 0, "op": "insert", "conv_id": "c",
           "turn_idx": 1, "role": None, "text": "hello world",
           "tool": None, "ts": 123}
    good = avro.encode_event(row)
    for cut in (11, 15, len(good) - 3):
        with pytest.raises(ValueError, match="corrupt record"):
            avro.avro_decode(pa.table(
                {"value": pa.array([good, good[:cut]], pa.binary())}))

    t = pa.table({"log_offset": pa.array([1], pa.int64()),
                  "seq": pa.array([0], pa.int32()),
                  "op": pa.array(["insert"]),
                  "conv_id": pa.array([None], pa.string()),
                  "turn_idx": pa.array([0], pa.int32()),
                  "role": pa.array([None], pa.string()),
                  "text": pa.array([None], pa.string()),
                  "tool": pa.array([None], pa.string()),
                  "ts": pa.array([None], pa.timestamp("us"))})
    with pytest.raises(ValueError, match="required field"):
        avro.avro_encode(t)

    big = pa.table({"log_offset": pa.array([7], pa.int64()),
                    "seq": pa.array([1], pa.int32()),
                    "op": pa.array(["insert"], pa.large_string()),
                    "conv_id": pa.array(["cv"], pa.large_string()),
                    "turn_idx": pa.array([2], pa.int32()),
                    "role": pa.array(["user"], pa.large_string()),
                    "text": pa.array(["tx"], pa.large_string()),
                    "tool": pa.array([None], pa.large_string()),
                    "ts": pa.array([9], pa.timestamp("us"))})
    want = avro.encode_event({"log_offset": 7, "seq": 1, "op": "insert",
                              "conv_id": "cv", "turn_idx": 2, "role": "user",
                              "text": "tx", "tool": None, "ts": 9})
    assert avro.avro_encode(big).column("value")[0].as_py() == want


def test_resp_null_bulk_and_scalar_lockstep():
    """Review findings: $-1 (null bulk — a reply form, never a command
    arg) refuses loudly in BOTH walkers instead of misaligning; parse_resp
    is now structurally built on _scalar_step, so the two cannot drift."""
    from ape_dts_ray.pipelines.redis_replay import scan_to_events
    from ape_dts_ray.sources.resp import parse_resp, scan_resp

    null_bulk = b"*3\r\n$3\r\nSET\r\n$1\r\nq\r\n$-1\r\n"
    null_array = b"*-1\r\n*1\r\n$4\r\nPING\r\n"
    for fn in (parse_resp, lambda d: scan_resp(d), scan_to_events):
        with pytest.raises(ValueError, match="null/negative bulk"):
            fn(null_bulk)
        with pytest.raises(ValueError, match="null/negative array"):
            fn(null_array)
    assert parse_resp(b"*0\r\n") == [(0, [])]    # empty command stays legal
    with pytest.raises(ValueError, match="2 GiB"):
        from unittest import mock

        import ape_dts_ray.sources.resp as respmod
        big = mock.MagicMock()
        big.__len__ = lambda self: 1 << 31
        respmod.scan_resp(big)


@pytest.mark.usefixtures("ray_session")
def test_bigkeys_empty_threshold_and_hotkeys_guard():
    """redis_bigkeys with nothing over the threshold returns an EMPTY table
    (not a concat crash); detect_hot_keys validates threshold > 0."""
    import pyarrow as pa
    import ray.data as rd

    from ape_dts_ray.pipelines.redis_replay import (KEYSPACE_SCHEMA,
                                                    bigkey_statistics)
    from ape_dts_ray.stages.hotkeys import detect_hot_keys

    rows = [{"db": 0, "key": b"k", "rtype": "string", "field": None,
             "idx": None, "value": b"v", "score": None, "expire_ms": 0,
             "field_ttl_ms": 0}]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=KEYSPACE_SCHEMA))
    out = list(bigkey_statistics(ds, data_size_threshold=10**9)
               .iter_batches(batch_format="pyarrow"))
    assert sum(t.num_rows for t in out) == 0

    with pytest.raises(ValueError, match="threshold"):
        detect_hot_keys(ds, threshold=0)


@pytest.mark.usefixtures("ray_session")
def test_hotkey_statistics_freq_and_topn(tmp_path):
    """HotKey statistic semantics (redis_statistic_sinker.rs:55-66): the
    LFU freq prefix rides encode→parse per key (absent → -1, never hot);
    the filter keeps freq ≥ threshold; top_n orders hottest-first."""
    import pyarrow as pa

    from ape_dts_ray.pipelines.redis_replay import (hotkey_statistics,
                                                    rdb_key_statistics)
    from ape_dts_ray.sources import rdb as rdbmod

    entries = [
        {"db": 0, "key": b"hot1", "type": "string", "expire_ms": 0,
         "value": b"v", "freq": 250},
        {"db": 0, "key": b"hot2", "type": "hash", "expire_ms": 0,
         "fields": [(b"f", b"vv", 0)], "freq": 230},
        {"db": 0, "key": b"warm", "type": "string", "expire_ms": 0,
         "value": b"v", "freq": 100},
        {"db": 0, "key": b"nofreq", "type": "string", "expire_ms": 0,
         "value": b"v"},
    ]
    p = tmp_path / "rdb_part_00000.rdb"
    p.write_bytes(rdbmod.encode_rdb(entries))
    stats = pa.concat_tables(rdb_key_statistics(str(tmp_path))
                             .iter_batches(batch_format="pyarrow"))
    by_key = {r["key"]: r for r in stats.to_pylist()}
    assert by_key[b"hot1"]["freq"] == 250
    assert by_key[b"nofreq"]["freq"] == -1
    assert by_key[b"hot2"]["data_size"] == 4 + 1 + 2       # key + f + vv
    hot = pa.concat_tables(
        hotkey_statistics(rdb_key_statistics(str(tmp_path)), 200)
        .iter_batches(batch_format="pyarrow")).to_pylist()
    assert [r["key"] for r in hot] == ["hot1", "hot2"]     # freq desc
    top1 = pa.concat_tables(
        hotkey_statistics(rdb_key_statistics(str(tmp_path)), 0, top_n=1)
        .iter_batches(batch_format="pyarrow")).to_pylist()
    assert [r["key"] for r in top1] == ["hot1"]


# ---------------------------------------------------------------------------
# DCL classification (dcl_parser.rs:26-229 semantics; expect lists taken
# from the reference's own test scenarios, dcl_parser.rs:264-553)
# ---------------------------------------------------------------------------

def test_dcl_classification_reference_cases():
    from ape_dts_ray.stages.dcl import parse_dcl

    cases = {
        "create_user": [
            "CREATE USER 'user1'@'localhost' IDENTIFIED BY 'password123'",
            "CREATE /*comment1*/ USER /*comment2*/ 'user2'@'localhost' "
            "IDENTIFIED BY 'pass123'",
            "CREATE /*multi-line\ncomment*/ USER -- line comment\n"
            "'user3'@'localhost' IDENTIFIED BY 'pass123'",
            "Create User 'USER4'@'localhost' IDENTIFIED BY 'pass123'",
            "CREATE    USER    \n'user5'@'localhost'    \n"
            "IDENTIFIED    BY    'pass123'",
            "CREATE USER IF NOT EXISTS 'user8'@'localhost' "
            "IDENTIFIED BY 'pass123'",
            "CREATE USER 'user10'@'localhost' IDENTIFIED BY 'pass123' "
            "ACCOUNT LOCK",
        ],
        "alter_user": [
            "ALTER USER 'user1'@'localhost' IDENTIFIED BY 'password123'",
            "Alter User 'USER4'@'localhost' IDENTIFIED BY 'pass123'",
            "ALTER USER IF EXISTS 'user8'@'localhost' IDENTIFIED BY 'p'",
        ],
        "create_role": ["CREATE ROLE role1", "Create Role ROLE4",
                        "CREATE ROLE IF NOT EXISTS role8",
                        "CREATE /*comment1*/ ROLE /*comment2*/ role2"],
        "drop_user": ["DROP USER 'user1'@'localhost'",
                      "Drop User 'USER4'@'localhost'",
                      "DROP USER IF EXISTS 'user8'@'localhost'"],
        "drop_role": ["DROP ROLE role1", "Drop Role ROLE4",
                      "DROP ROLE \nrole6,\nrole7"],
        "grant": ["GRANT ALL ON db.* TO 'user1'@'localhost'",
                  "Grant All On db.* To 'USER4'@'localhost'",
                  "GRANT SELECT, INSERT, UPDATE ON db.table TO 'u'@'l'",
                  "GRANT ALL ON *.* TO 'user7'@'localhost' WITH GRANT OPTION"],
        "revoke": ["REVOKE ALL ON db.* FROM 'user1'@'localhost'",
                   "Revoke All On db.* From 'USER4'@'localhost'",
                   "REVOKE GRANT OPTION ON *.* FROM 'user7'@'localhost'"],
        "set_role": ["SET DEFAULT ROLE role1 TO 'user1'@'localhost'",
                     "Set Default Role ROLE4 To 'USER4'@'localhost'",
                     "SET DEFAULT ROLE ALL TO 'user9'@'localhost'"],
    }
    for expect, sqls in cases.items():
        for sql in sqls:
            got = parse_dcl(sql)
            assert got is not None and got[0] == expect, (sql, got)

    # non-DCL statements classify as something ELSE (the reference's
    # not_expect lists): DDL → unknown, DML → None
    assert parse_dcl('CREATE TABLE IF NOT EXISTS d.t(id int)')[0] == "unknown"
    assert parse_dcl("alter table aaa.bbb add column value int")[0] == "unknown"
    assert parse_dcl("/*alter user*/alter table a.b add column v int")[0] \
        == "unknown"
    assert parse_dcl("FLUSH PRIVILEGES")[0] == "unknown"
    assert parse_dcl("INSERT INTO t VALUES (1)") is None
    assert parse_dcl("update t set a = 1") is None
    assert parse_dcl("delete from t") is None
    assert parse_dcl("REPLACE INTO t VALUES (1)") is None
    # origin = comment-stripped trimmed text (dcl_statement.rs to_sql)
    assert parse_dcl("  GRANT /*x*/ALL ON db.* TO 'u'@'%'  ") == \
        ("grant", "GRANT ALL ON db.* TO 'u'@'%'")


def test_dcl_batch_classifier_and_filter():
    import pyarrow as pa

    from ape_dts_ray.stages.dcl import (DclFilter, classify_dcl_batch,
                                        parse_dcl)

    stmts = [
        "CREATE USER 'a'@'%' IDENTIFIED BY 'x'",
        "create /*c*/user if not exists 'b'@'%' identified by 'y'",
        "GRANT SELECT ON d.t TO 'a'@'%'",
        "REVOKE SELECT ON d.t FROM 'a'@'%'",
        "DROP USER 'a'@'%'",
        "SET DEFAULT ROLE r TO 'a'@'%'",
        "INSERT INTO t VALUES (1)",          # DML: dropped pre-classification
        "FLUSH PRIVILEGES",                  # unknown
    ]
    t = pa.table({"log_offset": pa.array(range(len(stmts)), pa.int64()),
                  "statement": pa.array(stmts)})
    out = classify_dcl_batch(t)
    assert out.num_rows == len(stmts) - 1                    # DML gone
    got = dict(zip(out.column("log_offset").to_pylist(),
                   out.column("dcl_type").to_pylist()))
    assert got == {0: "create_user", 1: "create_user", 2: "grant",
                   3: "revoke", 4: "drop_user", 5: "set_role", 7: "unknown"}
    # batch classifier ≡ scalar parser on every row
    for off, stmt in zip(t.column("log_offset").to_pylist(), stmts):
        scalar = parse_dcl(stmt)
        assert (scalar[0] if scalar else None) == got.get(off)

    # rdb_filter.rs:118-124: empty do_dcls drops everything; '*' keeps all;
    # a set keeps exactly its members
    assert DclFilter(())(out).num_rows == 0
    assert DclFilter(("*",))(out).num_rows == out.num_rows
    sub = DclFilter(("grant", "revoke"))(out)
    assert sorted(sub.column("dcl_type").to_pylist()) == ["grant", "revoke"]


_CLEANUP_CRASH_SCRIPT = r"""
import os, sys
from ape_dts_ray.state.lake import LakeTable

orig_remove = os.remove
def dying_remove(path):
    orig_remove(path)
    if path.endswith(".json"):    # first manifest removed → die
        os._exit(137)
os.remove = dying_remove
LakeTable.open(sys.argv[1]).compact(max_delta_files=0, parallel=False)
"""


@pytest.mark.usefixtures("ray_session")
def test_partial_compaction_crash_during_manifest_cleanup(tmp_path):
    """Crash window (c): compacted.json published, only SOME prefix
    manifests removed. The watermark never regresses (compacted.json covers
    the full removable prefix before any removal; surviving manifests only
    raise it), surviving manifests with empty delta dirs are harmless, and a
    rerun finishes the cleanup."""
    events = gen_events(seed=47, n_convs=30, max_turns=6, n_events=3320,
                        delete_frac=0.2)   # 3500 events = 7 full epochs
    path = str(tmp_path / "e.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path)
    before, wm = lake.state_table(), lake.watermark()
    n_epochs = len(lake.committed_epochs())
    assert n_epochs >= 3

    r = subprocess.run([sys.executable, "-c", _CLEANUP_CRASH_SCRIPT,
                        lake.root], capture_output=True, text=True,
                       cwd="/root/repo")
    assert r.returncode == 137, r.stderr

    crashed = LakeTable.open(lake.root)
    assert len(crashed.committed_epochs()) == n_epochs - 1  # torn cleanup
    assert crashed.watermark() == wm                        # never regressed
    assert crashed.state_table().equals(before)

    crashed.compact(max_delta_files=0, parallel=False)      # rerun converges
    done = LakeTable.open(lake.root)
    assert done.committed_epochs() == []
    assert done.watermark() == wm
    assert done.state_table().equals(before)
    assert replay(LakeTable.open(lake.root), events_path=path) == []
