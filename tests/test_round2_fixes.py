"""Round-2 hardening tests (VERDICT/ADVICE items): min_offset epoch-id
derivation, revise epoch band terminality, compact() watermark ordering,
NULL-value derivation parity, checker defect-set caps."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from ape_dts_ray.fixtures import gen_events, oracle_replay
from ape_dts_ray.meta import EngineConfig, TableMeta
from ape_dts_ray.pipelines.checker import (REVISE_EPOCH_BASE, check_datasets,
                                           revise)
from ape_dts_ray.pipelines.replay import replay
from ape_dts_ray.pipelines.snapshot import load_snapshot
from ape_dts_ray.state.lake import LakeTable


def _mk_lake(tmp_path, name="lake", **cfg):
    defaults = dict(num_partitions=8, epoch_size=2000)
    defaults.update(cfg)
    return LakeTable.create(str(tmp_path / name), TableMeta(),
                            EngineConfig(**defaults))


def _assert_matches(lake, events):
    state = lake.state_table().to_pandas()
    oracle = oracle_replay(events)
    assert len(state) == len(oracle), (len(state), len(oracle))
    pd.testing.assert_series_equal(state["text"], oracle["text"],
                                   check_dtype=False, check_names=False)


@pytest.mark.usefixtures("ray_session")
def test_min_offset_continuation_on_committed_lake(tmp_path):
    """ADVICE replay.py:231 repro: replay a prefix, then continue with an
    aligned min_offset on the same (uncompacted) lake — epoch ids must stay
    offset-derived so the continuation actually applies."""
    events = gen_events(seed=21, n_convs=40, max_turns=8, n_events=6000,
                        delete_frac=0.15)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)

    replay(lake, events_path=path, max_offset=3999)      # epochs 0, 1
    assert lake.committed_epochs() == [0, 1]
    replay(lake, events_path=path, min_offset=4000)      # epochs 2, 3 — no collision
    assert lake.committed_epochs() == [0, 1, 2, 3]
    _assert_matches(lake, events)

    # a misaligned min_offset now plans a SNAPPED first window [4100, 5999];
    # committed epoch 2 covers [4000, 5999] → boundary mismatch, loud error
    # (round-3: ids are offset-derived for ANY min_offset, so the failure
    # mode is a range-consistency refusal, not an alignment precondition)
    with pytest.raises(ValueError, match="different boundaries"):
        replay(lake, events_path=path, min_offset=4100)
    # an overlapping min_offset whose windows MATCH the committed ranges is
    # a legal resume: everything is already committed → no-op, state intact
    before = lake.state_table()
    replay(lake, events_path=path, min_offset=2000)
    assert lake.committed_epochs() == [0, 1, 2, 3]
    assert lake.state_table().equals(before)


@pytest.mark.usefixtures("ray_session")
def test_revise_band_is_terminal_until_compact(tmp_path):
    events = gen_events(seed=22, n_convs=20, max_turns=6, n_events=2000,
                        delete_frac=0.1)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)
    src = _mk_lake(tmp_path, "src")
    replay(src, events_path=path)

    corrupted = src.state_table().to_pandas().iloc[2:]
    dst = _mk_lake(tmp_path, "dst")
    load_snapshot(dst, rd.from_pandas(corrupted))
    check = check_datasets(src.state_dataset(), dst.state_dataset(),
                           num_partitions=8)
    assert revise(dst, src.state_dataset(), check) == 2
    revs = [e for e in dst.committed_epochs() if e >= REVISE_EPOCH_BASE]
    assert len(revs) == 1                       # reserved band, not max+1

    with pytest.raises(RuntimeError, match="revise"):
        replay(dst, events_path=path)           # revise is terminal…
    dst.compact(parallel=False)
    replay(dst, events_path=path)               # …until compaction folds it
    _assert_matches(dst, events)


@pytest.mark.usefixtures("ray_session")
def test_compact_crash_window_never_regresses_watermark(tmp_path, monkeypatch):
    """ADVICE lake.py:276: crash between base rewrite and manifest cleanup
    must keep watermark() at its pre-compact value (no full re-apply)."""
    events = gen_events(seed=23, n_convs=25, max_turns=6, n_events=4000,
                        delete_frac=0.1)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path)
    wm = lake.watermark()
    before = lake.state_table().to_pandas()

    import ape_dts_ray.state.lake as lake_mod

    orig_rmtree = lake_mod.shutil.rmtree

    def boom(*a, **k):
        raise RuntimeError("injected crash during compact cleanup")

    monkeypatch.setattr(lake_mod.shutil, "rmtree", boom)
    with pytest.raises(RuntimeError, match="injected"):
        lake.compact(parallel=False)
    monkeypatch.setattr(lake_mod.shutil, "rmtree", orig_rmtree)

    crashed = LakeTable.open(lake.root)
    assert crashed.watermark() == wm            # never regressed
    after = crashed.state_table().to_pandas()   # overlap fold is idempotent
    pd.testing.assert_frame_equal(before, after)

    crashed.compact(parallel=False)             # cleanup completes on retry
    assert crashed.watermark() == wm
    pd.testing.assert_frame_equal(before, crashed.state_table().to_pandas())


def test_derive_null_value_matches_cte():
    """ADVICE derive.py:72: NULL `value` must produce tool='' on both sides."""
    import duckdb

    from ape_dts_ray.sources.derive import CHANGES_CTE, derive_changes

    batch = pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array([np.datetime64("2024-01-01", "us")] * 3,
                       pa.timestamp("us")),
        "user_id": pa.array([1, 2, 3], pa.int64()),
        "event_type": pa.array(["signup", "click", "error"]),
        "value": pa.array([None, None, None], pa.float64()),
        "props": pa.array(["p0", "p1", "p2"]),
    })
    got = derive_changes(batch).to_pandas()
    con = duckdb.connect()
    con.register("events", batch)
    want = con.sql(CHANGES_CTE + "SELECT * FROM changes").df()
    con.close()
    pd.testing.assert_series_equal(got["tool"], want["tool"],
                                   check_dtype=False, check_names=False)


@pytest.mark.usefixtures("ray_session")
def test_narrow_shuffle_apply_matches_wide(tmp_path):
    """SURVEY §7 two-pass apply: project keys through the shuffle, rejoin
    payload by winner offsets — final state must equal the wide path (and the
    oracle), including PK-change splits (shared offsets) and deletes."""
    events = gen_events(seed=31, n_convs=30, max_turns=8, n_events=5000,
                        delete_frac=0.2, pk_change_frac=0.1, hot_frac=0.2)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)

    wide = _mk_lake(tmp_path, "wide", hot_keys=("conv-000000",))
    replay(wide, events_path=path)
    narrow = _mk_lake(tmp_path, "narrow", hot_keys=("conv-000000",))
    ms = replay(narrow, events_path=path, narrow_shuffle=True)

    _assert_matches(narrow, events)
    sw = wide.state_table().to_pandas()
    sn = narrow.state_table().to_pandas()
    pd.testing.assert_frame_equal(sw, sn)
    # manifests carry identical lineage (events counted in the narrow pass)
    for m in ms:
        wm = wide.read_manifest(m.epoch)
        assert sum(p.events for p in m.partitions) == \
               sum(p.events for p in wm.partitions)
        assert sum(p.rows for p in m.partitions) == \
               sum(p.rows for p in wm.partitions)


@pytest.mark.usefixtures("ray_session")
def test_nonadditive_schema_evolution_resume_and_compact(tmp_path):
    """Rename/drop/widen ops survive a crash before the barrier (persisted in
    _table.json), the resumed replay crosses the rename barrier, and
    compaction materializes the evolved schema with identical state."""
    import pyarrow.compute as pc

    events = gen_events(seed=41, n_convs=25, max_turns=8, n_events=4000,
                        delete_frac=0.15)
    n = events.num_rows
    cut = (n // 2 // 2000) * 2000          # barrier on an epoch boundary ±
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)

    ops = [{"op": "rename", "from": "tool", "to": "tool_name"},
           {"op": "drop", "col": "role"},
           {"op": "widen", "col": "turn_idx", "type": "int64"}]

    def rename_tool(t):
        if t.num_rows == 0 or pc.max(t.column("log_offset")).as_py() < cut:
            return t
        is_v1 = pc.greater_equal(t.column("log_offset"),
                                 pa.scalar(cut, pa.int64()))
        nulls = pa.nulls(t.num_rows, pa.string())
        t = t.append_column("tool_name",
                            pc.if_else(is_v1, t.column("tool"), nulls))
        return t.set_column(t.column_names.index("tool"), "tool",
                            pc.if_else(is_v1, nulls, t.column("tool")))

    def run(lake, **kw):
        replay(lake, events_path=path, barriers=[(cut, 1)],
               router_fn=rename_tool, **kw)

    # uninterrupted reference
    ref = _mk_lake(tmp_path, "ref")
    ref.set_schema_ops(ops)
    run(ref)
    want = ref.state_table().to_pandas()
    assert "tool_name" in want.columns and "tool" not in want.columns
    assert "role" not in want.columns
    assert want["turn_idx"].dtype == "int64"
    # pre-cut winners surface their value under the NEW name
    oracle = oracle_replay(events)
    assert len(want) == len(oracle)
    pd.testing.assert_series_equal(want["tool_name"], oracle["tool"],
                                   check_dtype=False, check_names=False)

    # crash before the barrier → reopen (ops restored from disk) → resume
    crash = _mk_lake(tmp_path, "crash")
    crash.set_schema_ops(ops)
    run(crash, stop_after_epoch=0)
    resumed = LakeTable.open(crash.root)
    assert resumed.schema_ops == ops
    run(resumed)

    def canon(df):   # column order is unify-dependent; contract is by name
        return df[sorted(df.columns)].reset_index(drop=True)

    pd.testing.assert_frame_equal(
        canon(want), canon(resumed.state_table().to_pandas()))

    # compaction folds old-era files through the ops; state identical
    resumed.compact(parallel=False)
    pd.testing.assert_frame_equal(
        canon(want), canon(LakeTable.open(crash.root).state_table().to_pandas()))


@pytest.mark.usefixtures("ray_session")
def test_mixed_stream_multi_table_replay(tmp_path):
    """One interleaved log carrying a `table` column → two lakes in a single
    pass (TableParallelizer fan-out); both states oracle-exact, shared global
    watermark, resume is a no-op, unknown tables dropped."""
    import pyarrow.compute as pc

    from ape_dts_ray.pipelines.multitable import replay_mixed

    ev_a = gen_events(seed=51, n_convs=20, max_turns=6, n_events=2000,
                      delete_frac=0.15)
    ev_b = gen_events(seed=52, n_convs=15, max_turns=5, n_events=1500,
                      delete_frac=0.1)

    def renumber(t, start, step, name):
        n = t.num_rows
        t = t.set_column(t.column_names.index("log_offset"), "log_offset",
                         pa.array(start + step * np.arange(n, dtype=np.int64)))
        return t.append_column("table", pa.array([name] * n))

    a = renumber(ev_a, 0, 3, "alpha")
    b = renumber(ev_b, 1, 3, "beta")
    junk = renumber(ev_b.slice(0, 50), 2, 3, "unknown")   # dropped
    log = pa.concat_tables([a, b, junk]).sort_by("log_offset")
    path = str(tmp_path / "mixed.parquet")
    pq.write_table(log, path)

    from ape_dts_ray.meta import EngineConfig
    res = replay_mixed(str(tmp_path / "lakes"), ["alpha", "beta"],
                       events_path=path,
                       config=EngineConfig(num_partitions=8, epoch_size=4000),
                       group_epochs=2)
    assert set(res) == {"alpha", "beta"}

    for name, ev in (("alpha", ev_a), ("beta", ev_b)):
        lake = LakeTable.open(str(tmp_path / "lakes" / name))
        state = lake.state_table().to_pandas()
        oracle = oracle_replay(ev)
        assert len(state) == len(oracle), (name, len(state), len(oracle))
        pd.testing.assert_series_equal(state["text"], oracle["text"],
                                       check_dtype=False, check_names=False)
        # shared global watermark — the single-binlog position
        assert lake.watermark() == int(pc.max(log.column("log_offset")).as_py())

    # resume: everything committed in both lakes → nothing pending
    res2 = replay_mixed(str(tmp_path / "lakes"), ["alpha", "beta"],
                        events_path=path,
                        config=EngineConfig(num_partitions=8, epoch_size=4000))
    assert res2 == {"alpha": [], "beta": []}


@pytest.mark.usefixtures("ray_session")
def test_partial_snapshot_resume(tmp_path):
    """A snapshot load killed mid-way resumes from per-partition markers:
    finished partitions are filtered out at the source, and the final base
    files are byte-identical to an uninterrupted load."""
    import hashlib

    from ape_dts_ray.pipelines.snapshot import (load_snapshot,
                                                snapshot_done_partitions,
                                                snapshot_finished)

    events = gen_events(seed=61, n_convs=40, max_turns=8, n_events=0)
    snap = pa.Table.from_pandas(oracle_replay(events), preserve_index=False)

    def base_hashes(lake):
        out = {}
        bdir = f"{lake.root}/base"
        for f in sorted(os.listdir(bdir)):
            with open(f"{bdir}/{f}", "rb") as fh:
                out[f] = hashlib.md5(fh.read()).hexdigest()
        return out

    clean = _mk_lake(tmp_path, "clean")
    m0 = load_snapshot(clean, rd.from_arrow(snap))
    assert m0["rows"] == snap.num_rows

    crash = _mk_lake(tmp_path, "crash")
    with pytest.raises(Exception, match="injected snapshot-load crash"):
        load_snapshot(crash, rd.from_arrow(snap), fail_after_parts=3)
    partial = snapshot_done_partitions(crash)
    assert 0 < len(partial) < 8          # some but not all partitions done
    assert not snapshot_finished(crash)

    m1 = load_snapshot(crash, rd.from_arrow(snap))   # resume
    assert snapshot_finished(crash)
    assert m1["rows"] == snap.num_rows
    assert base_hashes(crash) == base_hashes(clean)  # byte-identical
    assert crash.state_table().num_rows == snap.num_rows


def test_plan_epochs_commit_aligned():
    """No window boundary may split a transaction; oversized transactions
    extend their window to the next commit."""
    from ape_dts_ray.pipelines.replay import plan_epochs

    commits = [6, 13, 20, 27, 34, 41, 48, 55]      # txns of 7 events
    ws = plan_epochs(59, epoch_size=10, commit_offsets=commits)
    his = [w.hi for w in ws]
    assert his[-1] == 59                            # log end always allowed
    assert all(h in commits for h in his[:-1])      # every cut is a commit
    assert ws[0].lo == 0
    for a, b in zip(ws, ws[1:]):
        assert b.lo == a.hi + 1                     # contiguous cover
    # a transaction longer than the epoch extends its window
    ws2 = plan_epochs(59, epoch_size=10, commit_offsets=[25, 55])
    assert [w.hi for w in ws2] == [25, 55, 59]
    # barriers must themselves be transaction-aligned
    with pytest.raises(ValueError, match="transaction-aligned"):
        plan_epochs(59, 10, barriers=[(10, 1)], commit_offsets=commits)
    ws3 = plan_epochs(59, 10, barriers=[(14, 1)], commit_offsets=commits)
    assert any(w.hi == 13 for w in ws3)
    assert {w.schema_version for w in ws3} == {0, 1}


@pytest.mark.usefixtures("ray_session")
def test_commit_aligned_replay_crash_keeps_whole_transactions(tmp_path):
    """A crash/resume boundary under commit_offsets is always a whole number
    of transactions: the committed watermark lands exactly on a commit, and
    the committed state equals the oracle over the complete prefix."""
    events = gen_events(seed=71, n_convs=20, max_turns=6, n_events=3000,
                        delete_frac=0.1)
    n = events.num_rows
    commits = list(range(6, n, 7)) + [n - 1]        # txn = 7 events
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)

    lake = _mk_lake(tmp_path, epoch_size=1000)
    replay(lake, events_path=path, commit_offsets=commits,
           stop_after_epoch=1)                      # crash after 2 windows
    wm = lake.watermark()
    assert wm in commits                            # checkpoint on a commit
    prefix = events.slice(0, wm + 1)
    state = lake.state_table().to_pandas()
    oracle = oracle_replay(prefix)
    assert len(state) == len(oracle)
    pd.testing.assert_series_equal(state["text"], oracle["text"],
                                   check_dtype=False, check_names=False)

    lake2 = LakeTable.open(lake.root)               # resume to completion
    replay(lake2, events_path=path, commit_offsets=commits)
    _assert_matches(lake2, events)


@pytest.mark.usefixtures("ray_session")
def test_avro_envelope_roundtrip_and_replay(tmp_path):
    """Avro single-object envelope: encode → decode is exact (incl. nullable
    delete rows and timestamps), the framing carries the spec marker + schema
    fingerprint, and a replay from the decoded stream matches the direct
    replay."""
    from ape_dts_ray.stages import avro

    events = gen_events(seed=81, n_convs=15, max_turns=5, n_events=1200,
                        delete_frac=0.2)
    enc = avro_encode_table = avro.avro_encode(events)
    assert enc.column("value")[0].as_py()[:2] == b"\xc3\x01"
    assert enc.column("value")[0].as_py()[2:10] == avro.schema_fingerprint()

    dec = avro.avro_decode(avro_encode_table)
    got = dec.select(["log_offset", "op", "conv_id", "turn_idx",
                      "role", "text", "tool", "ts"]).to_pandas()
    want = events.select(["log_offset", "op", "conv_id", "turn_idx",
                          "role", "text", "tool", "ts"]).to_pandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    direct = _mk_lake(tmp_path, "direct")
    replay(direct, events_ds=rd.from_arrow(events))
    via = _mk_lake(tmp_path, "via_avro")
    replay(via, events_ds=rd.from_arrow(enc).map_batches(
        avro.avro_decode, batch_format="pyarrow"))
    pd.testing.assert_frame_equal(direct.state_table().to_pandas(),
                                  via.state_table().to_pandas())


@pytest.mark.usefixtures("ray_session")
def test_rate_limit_and_heartbeat(tmp_path):
    """max_rps paces chunk commits (wall ≥ events/max_rps) and the heartbeat
    file tracks the committed watermark."""
    import time

    events = gen_events(seed=82, n_convs=10, max_turns=5, n_events=1950)
    path = str(tmp_path / "ev.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path, epoch_size=500)
    t0 = time.monotonic()
    replay(lake, events_path=path, max_rps=2000, group_epochs=1)
    assert time.monotonic() - t0 >= events.num_rows / 2000
    hb = lake.heartbeat()
    assert hb is not None and hb["watermark"] == lake.watermark()
    assert hb["committed_epochs"] == len(lake.committed_epochs())


@pytest.mark.usefixtures("ray_session")
def test_reverse_sql_with_before_image(tmp_path):
    """Undo SQL joins the before-image from pre-apply lake state: delete →
    REPLACE carrying the old row, insert → keyed DELETE, update of an
    unknown key → keyed DELETE (the upsert created it)."""
    from ape_dts_ray.stages.sql_format import reverse_sql_with_before

    events = gen_events(seed=91, n_convs=10, max_turns=4, n_events=500,
                        delete_frac=0.0)
    path = str(tmp_path / "ev.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path)
    state = lake.state_table().to_pandas()
    k0 = state.iloc[0]                      # existing key → delete it
    tail = pa.table({
        "log_offset": pa.array([10_000, 10_001, 10_002], pa.int64()),
        "op": pa.array(["delete", "insert", "update"]),
        "conv_id": pa.array([k0["conv_id"], "conv-zz", "conv-new"]),
        "turn_idx": pa.array([int(k0["turn_idx"]), 1, 2], pa.int32()),
        "role": pa.array([None, "user", "user"]),
        "text": pa.array([None, "hello", "edit"]),
        "tool": pa.array([None, "", ""]),
    })
    out = reverse_sql_with_before(rd.from_arrow(tail), lake.state_dataset(),
                                  num_partitions=8)
    rows = {r["log_offset"]: r["sql"] for r in out.take_all()}
    assert len(rows) == 3
    # delete of an existing key → REPLACE with its before-image text
    assert rows[10_000].startswith("REPLACE INTO transcripts")
    assert k0["text"].replace("'", "''") in rows[10_000]
    # insert → keyed DELETE
    assert rows[10_001] == ("DELETE FROM transcripts WHERE conv_id = "
                            "'conv-zz' AND turn_idx = 1;")
    # update with no prior row → keyed DELETE
    assert rows[10_002].startswith("DELETE FROM transcripts")


@pytest.mark.usefixtures("ray_session")
def test_hot_key_rotation_compaction(tmp_path):
    """compact(new_hot_keys=...) re-salts the whole base: state identical,
    watermark preserved, hot key's rows actually spread across partitions,
    and a continued replay with the new salt stays oracle-exact."""
    events = gen_events(seed=95, n_convs=15, max_turns=8, n_events=4000,
                        hot_frac=0.6, delete_frac=0.1)
    path = str(tmp_path / "ev.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)                       # unsalted
    replay(lake, events_path=path, max_offset=3999)
    wm = lake.watermark()
    before = lake.state_table().to_pandas()

    n = lake.compact(new_hot_keys=("conv-000000",))  # rotate salt in
    assert n == 2 and not lake.rotation_in_progress()
    rotated = LakeTable.open(lake.root)
    assert rotated.config.hot_keys == ("conv-000000",)
    assert rotated.watermark() == wm
    pd.testing.assert_frame_equal(before, rotated.state_table().to_pandas())
    # the hot conversation's rows now span several base partitions
    import pyarrow.parquet as pqq
    parts_with_hot = sum(
        1 for f in sorted(os.listdir(f"{lake.root}/base"))
        if "conv-000000" in set(
            pqq.read_table(f"{lake.root}/base/{f}", columns=["conv_id"])
            .column("conv_id").to_pylist()))
    assert parts_with_hot > 1

    # CDC continues under the new salt; final state matches the full oracle
    replay(rotated, events_path=path)
    _assert_matches(rotated, events)


@pytest.mark.usefixtures("ray_session")
def test_http_pull_server_pipeline(tmp_path):
    """HttpServerPipeline analog: consumer pulls Avro batches over HTTP,
    acks advance the checkpoint, an unacked batch is re-served verbatim
    (fetch_old), and the acked position survives a server restart. The
    pulled stream replays to the oracle-exact state."""
    import urllib.request

    from ape_dts_ray.pipelines.pull_server import PullServer, unframe_records
    from ape_dts_ray.stages import avro

    events = gen_events(seed=97, n_convs=10, max_turns=5, n_events=800,
                        delete_frac=0.15)
    path = str(tmp_path / "ev.parquet")
    pq.write_table(events, path)
    srv = PullServer(path, str(tmp_path / "pull_state.json")).start()
    base = f"http://127.0.0.1:{srv.port}"

    def get(p):
        with urllib.request.urlopen(base + p) as r:
            return r.read()

    info = json.loads(get("/info"))
    assert info == {"acked": -1, "max_offset": events.num_rows - 1,
                    "inflight_hi": -1}

    pulled = []
    b1 = get("/fetch_new?batch_size=300")
    # consumer "crash" before ack: double fetch_new conflicts, old re-serves
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        get("/fetch_new?batch_size=300")
    assert get("/fetch_old") == b1
    while True:
        if not b1:
            break
        rows = [avro.decode_event(v) for v in unframe_records(b1)]
        pulled.extend(rows)
        get(f"/ack?offset={rows[-1]['log_offset']}")
        b1 = get("/fetch_new?batch_size=300")
    assert len(pulled) == events.num_rows

    # acked position persists across server restart
    srv.stop()
    srv2 = PullServer(path, str(tmp_path / "pull_state.json")).start()
    assert json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{srv2.port}/info").read())["acked"] == \
        events.num_rows - 1
    assert urllib.request.urlopen(
        f"http://127.0.0.1:{srv2.port}/fetch_new?batch_size=10").read() == b""
    srv2.stop()

    # the pulled stream replays to the same state as the direct log
    dec = avro.avro_decode(pa.table({"value": pa.array(
        [avro.encode_event({**r}) for r in pulled], pa.binary())}))
    lake = _mk_lake(tmp_path)
    replay(lake, events_ds=rd.from_arrow(dec))
    _assert_matches(lake, events)


@pytest.mark.usefixtures("ray_session")
def test_generic_primary_key_table(tmp_path):
    """The apply path is generic over TableMeta: a (doc_id, rev) PK table
    with a `body` payload replays, resumes, and compacts correctly — no
    transcripts-shaped column names anywhere in the stream."""
    rng = np.random.default_rng(7)
    n = 3000
    docs = rng.integers(0, 80, size=n)
    revs = rng.integers(0, 6, size=n).astype(np.int32)
    ops = np.where(rng.random(n) < 0.15, "delete", "update").astype(object)
    ops[:480] = "insert"
    events = pa.table({
        "log_offset": pa.array(np.arange(n, dtype=np.int64)),
        "op": pa.array(ops, pa.string()),
        "doc_id": pa.array([f"doc-{d:04d}" for d in docs], pa.string()),
        "rev": pa.array(revs),
        "body": pa.array([None if o == "delete" else f"b{i}"
                          for i, o in enumerate(ops)], pa.string()),
    })
    path = str(tmp_path / "docs_ev.parquet")
    pq.write_table(events, path)

    meta = TableMeta(name="docs", id_cols=("doc_id", "rev"),
                     partition_col="doc_id", order_cols=("doc_id", "rev"),
                     payload_cols=("body",))
    lake = LakeTable.create(str(tmp_path / "doclake"), meta,
                            EngineConfig(num_partitions=8, epoch_size=1000))
    replay(lake, events_path=path, stop_after_epoch=0)   # crash + resume
    lake2 = LakeTable.open(lake.root)
    replay(lake2, events_path=path)

    # brute-force oracle
    state = {}
    for r in events.to_pylist():
        k = (r["doc_id"], r["rev"])
        if r["op"] == "delete":
            state.pop(k, None)
        else:
            state[k] = r["body"]
    got = lake2.state_table().to_pandas()
    assert len(got) == len(state)
    for r in got.itertuples():
        assert state[(r.doc_id, r.rev)] == r.body
    lake2.compact(parallel=False)
    assert LakeTable.open(lake.root).state_table().num_rows == len(state)


@pytest.mark.usefixtures("ray_session")
def test_multi_file_event_log(tmp_path):
    """A log split across several Parquet files (the 100-TB shape: one file
    per source segment) replays identically — footer-stats max-offset scan
    and pruned reads handle file lists."""
    events = gen_events(seed=99, n_convs=25, max_turns=6, n_events=4500,
                        delete_frac=0.15)
    n = events.num_rows
    paths = []
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3),
                                  (2 * n // 3, n)]):
        p = str(tmp_path / f"seg-{i}.parquet")
        pq.write_table(events.slice(lo, hi - lo), p)
        paths.append(p)

    lake = _mk_lake(tmp_path)
    replay(lake, events_path=paths)
    _assert_matches(lake, events)
    assert replay(LakeTable.open(lake.root), events_path=paths) == []


@pytest.mark.usefixtures("ray_session")
def test_resumable_partitioned_export(tmp_path):
    """State export writes one Parquet per partition with done markers; a
    crashed export resumes writing ONLY unfinished partitions and the final
    content is byte-identical to an uninterrupted export."""
    import hashlib

    from ape_dts_ray.pipelines.export import (export_done_partitions,
                                              export_state)

    events = gen_events(seed=102, n_convs=30, max_turns=6, n_events=3000,
                        delete_frac=0.15)
    path = str(tmp_path / "ev.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path)

    def tree_hash(d):
        out = {}
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                with open(os.path.join(d, f), "rb") as fh:
                    out[f] = hashlib.md5(fh.read()).hexdigest()
        return out

    clean = str(tmp_path / "out_clean")
    m0 = export_state(lake, clean)
    oracle = oracle_replay(events)
    assert m0["rows"] == len(oracle)

    crash = str(tmp_path / "out_crash")
    with pytest.raises(Exception, match="injected export crash"):
        export_state(lake, crash, fail_after_parts=3)
    partial = export_done_partitions(crash)
    assert 0 < len(partial) < 8
    m1 = export_state(lake, crash)            # resume
    assert m1 == m0
    assert tree_hash(crash) == tree_hash(clean)
    # exported files ARE the state (round-trip read)
    import ray.data as rdm
    back = rdm.read_parquet(clean).to_pandas()
    assert len(back) == len(oracle)


@pytest.mark.usefixtures("ray_session")
def test_single_key_mongo_shaped_table(tmp_path):
    """Mongo-shaped stream: a SINGLE id col (_id) with a JSON-ish doc
    payload — the MongoMerger LWW semantics (mongo_merger.rs:17-100) ride
    the generic path (partition salt falls back to the id col itself)."""
    rng = np.random.default_rng(17)
    n = 2000
    ids = rng.integers(0, 150, size=n)
    ops = np.where(rng.random(n) < 0.2, "delete", "update").astype(object)
    ops[:150] = "insert"
    events = pa.table({
        "log_offset": pa.array(np.arange(n, dtype=np.int64)),
        "op": pa.array(ops, pa.string()),
        "_id": pa.array([f"oid-{d:06d}" for d in ids], pa.string()),
        "doc": pa.array([None if o == "delete" else '{"v": %d}' % i
                         for i, o in enumerate(ops)], pa.string()),
    })
    path = str(tmp_path / "mongo_ev.parquet")
    pq.write_table(events, path)
    meta = TableMeta(name="docs", id_cols=("_id",), partition_col="_id",
                     order_cols=("_id",), payload_cols=("doc",))
    lake = LakeTable.create(str(tmp_path / "mongolake"), meta,
                            EngineConfig(num_partitions=8, epoch_size=600))
    replay(lake, events_path=path)

    state = {}
    for r in events.to_pylist():
        if r["op"] == "delete":
            state.pop(r["_id"], None)
        else:
            state[r["_id"]] = r["doc"]
    got = lake.state_table().to_pandas()
    assert len(got) == len(state)
    assert dict(zip(got["_id"], got["doc"])) == state


@pytest.mark.usefixtures("ray_session")
def test_checker_defect_cap(tmp_path):
    """A fully-diverged table must fail the broadcast path fast, not OOM."""
    events = gen_events(seed=24, n_convs=20, max_turns=6, n_events=1500,
                        delete_frac=0.0)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)
    src = _mk_lake(tmp_path, "src")
    replay(src, events_path=path)
    dst = _mk_lake(tmp_path, "dst")    # empty → every key is a miss
    mangled = src.state_table().to_pandas().copy()
    mangled["text"] = "X"
    load_snapshot(dst, rd.from_pandas(mangled))
    check = check_datasets(src.state_dataset(), dst.state_dataset(),
                           num_partitions=8)
    with pytest.raises(ValueError):
        revise(dst, src.state_dataset(), check, max_defects=5)
