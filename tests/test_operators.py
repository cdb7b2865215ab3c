"""Operator-family tests: snapshot load, check/revise, SQL formatter, origin
marker (cyclic replication), time filter, struct conflict policy, processor
hook — the scenario families of FIXTURES.md §3 / reference test dirs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from ape_dts_ray.fixtures import gen_events, oracle_replay
from ape_dts_ray.meta import EngineConfig, TableMeta
from ape_dts_ray.pipelines.checker import (CHECK_DIFF, CHECK_MISS,
                                           check_datasets, revise,
                                           write_check_logs)
from ape_dts_ray.pipelines.replay import replay
from ape_dts_ray.pipelines.snapshot import load_snapshot, snapshot_finished
from ape_dts_ray.stages.filter import EventFilter
from ape_dts_ray.stages.processor import ProcessorError, UserProcessor
from ape_dts_ray.stages.sql_format import format_sql
from ape_dts_ray.state.lake import LakeTable


def _mk_lake(tmp_path, name="lake", **cfg):
    defaults = dict(num_partitions=8, epoch_size=4000)
    defaults.update(cfg)
    return LakeTable.create(str(tmp_path / name), TableMeta(),
                            EngineConfig(**defaults))


@pytest.mark.usefixtures("ray_session")
def test_snapshot_then_cdc(tmp_path):
    """Snapshot full-load, then CDC replay upserts over it — the
    snapshot+cdc handoff (reference: snapshot task then cdc task)."""
    events = gen_events(seed=12, n_convs=40, max_turns=8, n_events=3000,
                        delete_frac=0.2)
    # snapshot = oracle state of the insert-only prefix
    n_ins = 40 * 8
    snap_events = events.slice(0, n_ins)
    snapshot = pa.Table.from_pandas(oracle_replay(snap_events),
                                    preserve_index=False)
    lake = _mk_lake(tmp_path)
    marker = load_snapshot(lake, rd.from_arrow(snapshot))
    assert snapshot_finished(lake)
    assert marker["rows"] == snapshot.num_rows
    assert lake.state_table().num_rows == snapshot.num_rows

    # CDC tail on top (offsets n_ins..)
    path = str(tmp_path / "tail.parquet")
    pq.write_table(events.slice(n_ins), path)
    replay(lake, events_path=path, min_offset=n_ins)
    state = lake.state_table().to_pandas()
    oracle = oracle_replay(events)
    assert len(state) == len(oracle)
    pd.testing.assert_series_equal(state["text"], oracle["text"],
                                   check_dtype=False, check_names=False)


@pytest.mark.usefixtures("ray_session")
def test_check_revise_roundtrip(tmp_path):
    """Corrupt lake state out-of-band → checker emits exactly the defect set →
    revise re-applies source truth → re-check comes back clean (check/revise/
    review lifecycle, docs/en/snapshot/{check,revise,review}.md)."""
    events = gen_events(seed=15, n_convs=30, max_turns=6, n_events=2000,
                        delete_frac=0.1)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)
    src_lake = _mk_lake(tmp_path, "src")
    replay(src_lake, events_path=path)

    # corrupted copy: drop 3 rows (miss) + mangle 2 texts (diff)
    state = src_lake.state_table()
    n = state.num_rows
    corrupted = state.to_pandas()
    dropped = corrupted.iloc[:3][["conv_id", "turn_idx"]]
    mangled = corrupted.iloc[5:7][["conv_id", "turn_idx"]]
    corrupted = corrupted.iloc[3:].copy()
    corrupted.iloc[2:4, corrupted.columns.get_loc("text")] = "CORRUPTED"
    dst_lake = _mk_lake(tmp_path, "dst")
    load_snapshot(dst_lake, rd.from_pandas(corrupted))

    check = check_datasets(src_lake.state_dataset(), dst_lake.state_dataset(),
                           num_partitions=8)
    rows = check.take_all()
    miss = {(r["conv_id"], r["turn_idx"]) for r in rows
            if r["check_type"] == CHECK_MISS}
    diff = {(r["conv_id"], r["turn_idx"]) for r in rows
            if r["check_type"] == CHECK_DIFF}
    assert miss == set(map(tuple, dropped.itertuples(index=False)))
    assert diff == set(map(tuple, mangled.itertuples(index=False)))

    counts = write_check_logs(check, str(tmp_path / "checklogs"))
    assert counts == {"miss": 3, "diff": 2}
    assert (tmp_path / "checklogs" / "miss.log").exists()

    n_revised = revise(dst_lake, src_lake.state_dataset(), check)
    assert n_revised == 5
    recheck = check_datasets(src_lake.state_dataset(), dst_lake.state_dataset(),
                             num_partitions=8)
    assert recheck.count() == 0
    assert dst_lake.state_table().num_rows == n


@pytest.mark.usefixtures("ray_session")
def test_sql_formatter():
    t = pa.table({
        "log_offset": pa.array([1, 2], pa.int64()),
        "op": pa.array(["insert", "delete"]),
        "conv_id": pa.array(["c'1", "c2"]),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "role": pa.array(["user", None]),
        "text": pa.array(["hi", None]),
        "tool": pa.array(["", None]),
    })
    fwd = format_sql(t)["sql"].to_pylist()
    assert fwd[0].startswith("REPLACE INTO transcripts") and "c''1" in fwd[0]
    assert fwd[1] == "DELETE FROM transcripts WHERE conv_id = 'c2' AND turn_idx = 1;"
    rev = format_sql(t, reverse=True)["sql"].to_pylist()
    assert rev[0].startswith("DELETE FROM")          # reverse(insert) = delete
    assert rev[1].startswith("-- cannot reverse")    # needs before-image


@pytest.mark.usefixtures("ray_session")
def test_origin_marker_filter(tmp_path):
    """Two-way topology: events stamped with our own node id are dropped
    before apply (DataMarker semantics, docs/en/cdc/two_way.md)."""
    events = gen_events(seed=8, n_convs=10, max_turns=4, n_events=500,
                        delete_frac=0.0)
    origins = np.array([None, "node_a", "node_b"], dtype=object)[
        np.arange(events.num_rows) % 3]
    events = events.append_column("origin", pa.array(origins, pa.string()))
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)

    lake = _mk_lake(tmp_path)
    f = EventFilter(exclude_origins=("node_a",))
    replay(lake, events_path=path, event_filter=f)
    kept = events.filter(pc.or_kleene(
        pc.not_equal(events.column("origin"), pa.scalar("node_a")),
        events.column("origin").is_null()))
    oracle = oracle_replay(kept.drop_columns(["origin"]))
    state = lake.state_table().to_pandas()
    assert len(state) == len(oracle)
    pd.testing.assert_series_equal(state["text"], oracle["text"],
                                   check_dtype=False, check_names=False)


@pytest.mark.usefixtures("ray_session")
def test_time_filter(tmp_path):
    """start/end time window (time_filter.rs:5-40 analog): only events inside
    the window apply."""
    events = gen_events(seed=4, n_convs=10, max_turns=4, n_events=300,
                        delete_frac=0.0)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)
    ts = events.column("ts").to_pandas().dropna()
    cut = ts.quantile(0.5)
    f = EventFilter(where_expr=pc.field("ts") < pa.scalar(cut))
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path, event_filter=f)
    kept = events.filter(pc.less(events.column("ts"), pa.scalar(cut)))
    assert lake.state_table().num_rows == len(oracle_replay(kept))


def test_struct_conflict_policy(tmp_path):
    root = str(tmp_path / "t")
    LakeTable.create(root)
    with pytest.raises(FileExistsError):
        LakeTable.create(root)                       # interrupt policy
    t = LakeTable.create(root, if_exists="ignore")   # ignore policy
    assert t.meta.name == "transcripts"
    t2 = LakeTable.create(root, if_exists="overwrite",
                          config=EngineConfig(num_partitions=4))
    assert t2.config.num_partitions == 4


def test_user_processor_guards():
    t = pa.table({
        "log_offset": pa.array([1], pa.int64()),
        "seq": pa.array([0], pa.int32()),
        "op": pa.array(["insert"]),
        "conv_id": pa.array(["c1"]),
        "turn_idx": pa.array([0], pa.int32()),
        "text": pa.array(["hello"]),
    })
    # well-behaved processor: uppercase the text, drop nothing
    p = UserProcessor(lambda b: b.set_column(
        b.column_names.index("text"), "text",
        pc.utf8_upper(b.column("text"))))
    assert p(t).column("text").to_pylist() == ["HELLO"]
    # dropping a required column is rejected
    with pytest.raises(ProcessorError):
        UserProcessor(lambda b: b.drop_columns(["op"]))(t)
    # invalid op alphabet is rejected
    bad = UserProcessor(lambda b: b.set_column(
        b.column_names.index("op"), "op", pa.array(["nope"])))
    with pytest.raises(ProcessorError):
        bad(t)


@pytest.mark.usefixtures("ray_session")
def test_hot_key_detection(tmp_path):
    from ape_dts_ray.stages.hotkeys import detect_hot_keys

    events = gen_events(seed=2, n_convs=50, max_turns=5, n_events=5000,
                        hot_frac=0.4)
    hot = detect_hot_keys(rd.from_arrow(events), threshold=0.1)
    assert hot == ("conv-000000",)
    # a uniform stream has no hot keys at a 10% threshold
    uniform = gen_events(seed=2, n_convs=50, max_turns=5, n_events=5000)
    assert detect_hot_keys(rd.from_arrow(uniform), threshold=0.1) == ()


@pytest.mark.usefixtures("ray_session")
def test_multi_table_runner(tmp_path):
    """Table-level parallelism + filter + route (task_runner.rs:256-303 /
    TableParallelizer analog): three tables, one denied by wildcard, one
    renamed by the router."""
    from ape_dts_ray.pipelines.multitable import TableJob, run_tables
    from ape_dts_ray.stages.router import Router
    from ape_dts_ray.stages.filter import TableFilter

    jobs = []
    for i, name in enumerate(["db.chat", "db.agent", "db.tmp_scratch"]):
        ev = gen_events(seed=40 + i, n_convs=10, max_turns=4, n_events=400)
        p = str(tmp_path / f"{i}.parquet")
        pq.write_table(ev, p)
        jobs.append(TableJob(name=name, events_path=p,
                             config=EngineConfig(num_partitions=4,
                                                 epoch_size=1000)))
    res = run_tables(
        str(tmp_path / "lakes"), jobs,
        table_filter=TableFilter(ignore_tables=("*.tmp_*",)),
        router=Router(table_map={"db.agent": "db.agent_v2"}),
        tb_parallel=2)
    assert set(res) == {"db.chat", "db.agent_v2"}
    assert not (tmp_path / "lakes" / "db.tmp_scratch").exists()
    for i, name in [(0, "db.chat"), (1, "db.agent_v2")]:
        lake = LakeTable.open(str(tmp_path / "lakes" / name))
        ev = gen_events(seed=40 + i, n_convs=10, max_turns=4, n_events=400)
        assert lake.state_table().num_rows == len(oracle_replay(ev))


@pytest.mark.usefixtures("ray_session")
def test_review_mode(tmp_path):
    """review = re-check only logged keys; after revise it returns clean, and
    it never rescans beyond the logged key set."""
    from ape_dts_ray.pipelines.checker import review

    events = gen_events(seed=17, n_convs=20, max_turns=5, n_events=1000,
                        delete_frac=0.1)
    path = str(tmp_path / "e.parquet")
    pq.write_table(events, path)
    src = _mk_lake(tmp_path, "src")
    replay(src, events_path=path)
    corrupted = src.state_table().to_pandas().iloc[2:]
    dst = _mk_lake(tmp_path, "dst")
    load_snapshot(dst, rd.from_pandas(corrupted))

    check = check_datasets(src.state_dataset(), dst.state_dataset(),
                           num_partitions=8)
    assert check.count() == 2
    # review reproduces the same defects from the logged keys only
    again = review(src.state_dataset(), dst.state_dataset(), check,
                   num_partitions=8)
    assert again.count() == 2
    revise(dst, src.state_dataset(), check)
    clean = review(src.state_dataset(), dst.state_dataset(), check,
                   num_partitions=8)
    assert clean.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_envelope_roundtrip_and_replay(tmp_path):
    """Kafka-sink analog: events → JSON envelopes (topic, key, payload) →
    write_json → read back → from_envelope → replay produces the same state
    as replaying the original log."""
    import ray.data as rd
    from ape_dts_ray.stages.envelope import from_envelope, make_to_envelope

    events = gen_events(seed=33, n_convs=15, max_turns=5, n_events=800,
                        delete_frac=0.2)
    env = make_to_envelope("transcripts",
                           topic_map={"transcripts": "cdc.transcripts"})(events)
    assert env.column("topic")[0].as_py() == "cdc.transcripts"
    assert env.num_rows == events.num_rows

    out_dir = str(tmp_path / "envelopes")
    rd.from_arrow(env).write_json(out_dir)
    back = rd.read_json(out_dir).map_batches(
        lambda t: from_envelope(t, schema=events.schema),
        batch_format="pyarrow")

    lake = _mk_lake(tmp_path, name="lake_env")
    replay(lake, events_ds=back, max_offset=events.num_rows - 1)
    oracle = oracle_replay(events)
    state = lake.state_table().to_pandas()
    assert len(state) == len(oracle)
    pd.testing.assert_series_equal(state["text"], oracle["text"],
                                   check_dtype=False, check_names=False)


@pytest.mark.usefixtures("ray_session")
def test_lineage_table(tmp_path):
    events = gen_events(seed=34, n_convs=10, max_turns=5, n_events=1000,
                        delete_frac=0.25)
    path = str(tmp_path / "e.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path, epoch_size=500)
    replay(lake, events_path=path)
    lin = lake.lineage_table()
    assert lin.num_rows > 0
    import pyarrow.compute as pc2
    assert pc2.sum(lin.column("events")).as_py() == events.num_rows
    n_del = events.filter(pc.equal(events.column("op"), pa.scalar("delete"))).num_rows
    # per-partition LWW can collapse several deletes of one key into one
    # tombstone row, but a delete-last key always yields exactly one
    assert pc2.sum(lin.column("deletes")).as_py() <= n_del
    assert pc2.max(lin.column("offset_max")).as_py() == events.num_rows - 1


def test_precheck(tmp_path):
    """Precheck analog (dt-precheck): good source+lake pass; bad sources fail
    with named checks, never exceptions."""
    from ape_dts_ray.pipelines.precheck import assert_precheck, precheck

    good = gen_events(seed=60, n_convs=5, max_turns=3, n_events=100)
    gp = str(tmp_path / "good.parquet")
    pq.write_table(good, gp)
    lake = _mk_lake(tmp_path, name="pl")
    results = precheck(lake.root, gp, epoch_size=4000)
    assert results and all(r.ok for r in results)
    assert_precheck(lake.root, gp)   # no raise

    # planning estimate (estimate_record_count analog): exact from footers
    from ape_dts_ray.pipelines.precheck import estimate_events
    est = estimate_events(gp)
    assert est["events"] == good.num_rows
    assert est["offset_min"] == 0 and est["offset_max"] == good.num_rows - 1
    assert est["avg_event_bytes"] > 0
    # absurd epoch sizing is flagged, not raised
    res = {r.name: r.ok for r in precheck(events_path=gp,
                                          epoch_size=1_000_000_000)}
    assert res["plan_epoch_bytes"] is False

    # missing column
    bad1 = str(tmp_path / "bad1.parquet")
    pq.write_table(good.drop_columns(["op"]), bad1)
    res = {r.name: r.ok for r in precheck(events_path=bad1)}
    assert res["column:op"] is False

    # duplicate offsets + null PK
    import pyarrow.compute as pc
    dup = good.set_column(0, "log_offset",
                          pa.array([1] * good.num_rows, pa.int64()))
    dup = dup.set_column(dup.column_names.index("conv_id"), "conv_id",
                         pa.nulls(good.num_rows, pa.string()))
    bad2 = str(tmp_path / "bad2.parquet")
    pq.write_table(dup, bad2)
    res = {r.name: r.ok for r in precheck(events_path=bad2)}
    assert res["offsets_unique_sample"] is False
    assert res["pk_non_null:conv_id"] is False
    with pytest.raises(RuntimeError, match="precheck failed"):
        assert_precheck(events_path=bad2)

    # nonexistent lake
    res = precheck(lake_root=str(tmp_path / "nope"))
    assert not res[0].ok
