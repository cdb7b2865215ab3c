"""End-to-end replay tests: event log → lake → state equals oracle replay.

Mirrors the reference's e2e strategy (dt-tests: drive events, compare full
final state under stable (conv_id, turn_idx) order — rdb_test_runner.rs:599-726).
Per-turn text equality is the north-star invariant (BASELINE.json input_hint).
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ape_dts_ray.fixtures import gen_events, oracle_replay
from ape_dts_ray.meta import EngineConfig, TableMeta
from ape_dts_ray.pipelines.replay import plan_epochs, replay
from ape_dts_ray.state.lake import LakeTable


def _mk_lake(tmp_path, **cfg):
    defaults = dict(num_partitions=8, epoch_size=4000)
    defaults.update(cfg)
    return LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(**defaults))


def _assert_state_matches(lake, events, check_cols=("role", "text", "tool", "ts")):
    state = lake.state_table().to_pandas()
    oracle = oracle_replay(events)
    assert len(state) == len(oracle), (len(state), len(oracle))
    state = state.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for col in ("conv_id", "turn_idx", *check_cols):
        pd.testing.assert_series_equal(
            state[col], oracle[col], check_dtype=False, check_names=False,
            obj=f"column {col}")


@pytest.mark.usefixtures("ray_session")
def test_basic_replay_matches_oracle(tmp_path):
    events = gen_events(seed=42, n_convs=50, max_turns=10, n_events=5000,
                        delete_frac=0.2)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    manifests = replay(lake, events_path=path)
    assert len(manifests) == len(plan_epochs(events.num_rows - 1, 4000))
    _assert_state_matches(lake, events)


@pytest.mark.usefixtures("ray_session")
def test_pk_change_and_hot_key(tmp_path):
    events = gen_events(seed=7, n_convs=20, max_turns=8, n_events=4000,
                        hot_frac=0.4, delete_frac=0.1, pk_change_frac=0.1)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)
    # conv-000000 is hot → salted across partitions
    lake = _mk_lake(tmp_path, hot_keys=("conv-000000",))
    replay(lake, events_path=path)
    _assert_state_matches(lake, events)


@pytest.mark.usefixtures("ray_session")
def test_resume_exactly_once(tmp_path):
    """Crash after epoch 1, rerun → same final state; re-feeding committed
    epochs is a no-op (cdc_resumer semantics, idempotence via LWW +
    deterministic file names)."""
    events = gen_events(seed=3, n_convs=30, max_turns=10, n_events=6000,
                        delete_frac=0.15)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)

    lake = _mk_lake(tmp_path, epoch_size=2000)
    replay(lake, events_path=path, stop_after_epoch=1)   # "crash" mid-replay
    assert lake.committed_epochs() == [0, 1]
    wm_mid = lake.watermark()
    assert wm_mid == 2 * 2000 - 1

    lake2 = LakeTable.open(lake.root)                    # fresh driver
    replay(lake2, events_path=path)                      # resumes
    _assert_state_matches(lake2, events)
    state1 = lake2.state_table()

    replay(LakeTable.open(lake.root), events_path=path)  # full re-feed: no-op
    state2 = LakeTable.open(lake.root).state_table()
    assert state1.equals(state2)


@pytest.mark.usefixtures("ray_session")
def test_compaction_preserves_state_and_watermark(tmp_path):
    events = gen_events(seed=9, n_convs=25, max_turns=6, n_events=3000,
                        delete_frac=0.3)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path, epoch_size=1500)
    replay(lake, events_path=path)
    before = lake.state_table()
    wm = lake.watermark()
    n = lake.compact()
    assert n >= 2
    after = lake.state_table()
    assert before.equals(after)
    assert lake.watermark() == wm
    # the PROVISIONAL tail epoch (window cut by the log end, extendable by
    # a growing log) must survive compaction as a delta — folding it would
    # let a later tail re-commit outrank base rows (lake.py fold snapshot);
    # every complete epoch below it is folded and GC'd
    tail = lake.committed_epochs()
    assert tail == [2]
    assert not lake.read_manifest(2).final
    # replay after compaction is a no-op (watermark covers all offsets)
    replay(LakeTable.open(lake.root), events_path=path)
    assert LakeTable.open(lake.root).state_table().equals(before)


@pytest.mark.usefixtures("ray_session")
def test_lineage_counts(tmp_path):
    events = gen_events(seed=5, n_convs=10, max_turns=5, n_events=1000,
                        delete_frac=0.25)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path, epoch_size=10**9)  # single epoch
    (m,) = replay(lake, events_path=path)
    assert sum(p.events for p in m.partitions) == events.num_rows
    assert m.offset_max >= events.num_rows - 1
    offsets = [(p.offset_min, p.offset_max) for p in m.partitions]
    assert all(lo >= 0 and hi < events.num_rows for lo, hi in offsets)
    # per-partition delta files exist and are partition-pure
    for p in m.partitions:
        assert os.path.exists(os.path.join(lake.root, p.file))


@pytest.mark.usefixtures("ray_session")
def test_compact_then_continue_cdc(tmp_path):
    """Compaction mid-stream, then MORE events arrive: epoch ids derive from
    global offsets so they never collide with compacted ones, and base rows
    (_epoch=-1) lose to any later delta."""
    events = gen_events(seed=22, n_convs=20, max_turns=6, n_events=4000,
                        delete_frac=0.2)
    half = events.num_rows // 2
    p1, p2 = str(tmp_path / "e1.parquet"), str(tmp_path / "e2.parquet")
    pq.write_table(events.slice(0, half), p1)
    pq.write_table(events.slice(half), p2)

    lake = _mk_lake(tmp_path, epoch_size=1000)
    replay(lake, events_path=p1)
    lake.compact(parallel=False)
    # complete epochs folded; the provisional tail (cut at the half-log
    # end, extendable) stays as delta — the exact shape this test's
    # continuation then exercises
    remaining = lake.committed_epochs()
    assert all(not lake.read_manifest(e).final for e in remaining)
    replay(LakeTable.open(lake.root), events_path=p2, min_offset=half)
    _assert_state_matches(LakeTable.open(lake.root), events)


@pytest.mark.usefixtures("ray_session")
def test_sparse_and_empty_windows(tmp_path):
    """Event log with offset gaps: windows covering no events still commit
    (empty manifests) and the watermark advances past them."""
    events = gen_events(seed=23, n_convs=10, max_turns=4, n_events=500)
    # keep only even offsets in [0, 400) plus a far tail at 2000+
    import pyarrow.compute as pc
    off = events.column("log_offset")
    keep = pc.or_(pc.less(off, pa.scalar(400, pa.int64())),
                  pc.greater_equal(off, pa.scalar(500, pa.int64())))
    sparse = events.filter(keep)
    # shift the tail out to create fully-empty windows
    tail_mask = pc.greater_equal(sparse.column("log_offset"), pa.scalar(500, pa.int64()))
    shifted = pc.if_else(tail_mask,
                         pc.add(sparse.column("log_offset"), pa.scalar(1500, pa.int64())),
                         sparse.column("log_offset"))
    sparse = sparse.set_column(0, "log_offset", shifted)
    path = str(tmp_path / "sparse.parquet")
    pq.write_table(sparse, path)

    lake = _mk_lake(tmp_path, epoch_size=300)
    ms = replay(lake, events_path=path)
    assert any(not m.partitions for m in ms)          # some windows were empty
    assert lake.watermark() == int(pc.max(shifted).as_py())
    oracle = oracle_replay(sparse)
    assert lake.state_table().num_rows == len(oracle)
    # resume after the sparse replay is still a no-op
    assert replay(LakeTable.open(lake.root), events_path=path) == []


@pytest.mark.usefixtures("ray_session")
def test_empty_event_log(tmp_path):
    events = gen_events(seed=1, n_convs=2, max_turns=2, n_events=10).slice(0, 0)
    path = str(tmp_path / "empty.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    ms = replay(lake, events_path=path)
    assert ms == []
    assert lake.state_table().num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_unicode_and_odd_payloads(tmp_path):
    """charset/json scenario analog: emoji, CJK, quotes, newlines, NULs and
    JSON-looking payloads survive the full replay byte-exactly."""
    texts = ["héllo wörld 🎉", "对话第一轮", 'quote"s\'n\\backslash',
             "line1\nline2\ttab", "nul\x00byte", '{"json": [1, 2, {"k": "v"}]}',
             "", "🙂" * 100]
    n = len(texts)
    events = pa.table({
        "log_offset": pa.array(range(n), pa.int64()),
        "op": pa.array(["insert"] * n),
        "conv_id": pa.array([f"conv-ünïcode-{i % 2}" for i in range(n)]),
        "turn_idx": pa.array(range(n), pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array(texts),
        "tool": pa.array([""] * n),
        "ts": pa.array([None] * n, pa.timestamp("us")),
    })
    path = str(tmp_path / "u.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path)
    state = lake.state_table()
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in state.to_pylist()}
    for i, t in enumerate(texts):
        assert got[(f"conv-ünïcode-{i % 2}", i)] == t
