"""Round-3 hardening tests (ADVICE items): rotation swap crash-safety, generic
key-cols through replay_mixed / sql formatting, Avro Parsing-Canonical-Form
fingerprints, envelope integer fidelity."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from ape_dts_ray.fixtures import gen_events, oracle_replay
from ape_dts_ray.meta import EngineConfig, TableMeta
from ape_dts_ray.pipelines.replay import replay
from ape_dts_ray.state.lake import LakeTable


def _mk_lake(tmp_path, name="lake", **cfg):
    defaults = dict(num_partitions=8, epoch_size=2000)
    defaults.update(cfg)
    return LakeTable.create(str(tmp_path / name), TableMeta(),
                            EngineConfig(**defaults))


def _rotation_fixture(tmp_path):
    """Lake with a compacted base AND uncompacted deltas — the state the
    ADVICE data-loss scenario needs (base rows not covered by deltas)."""
    events = gen_events(seed=131, n_convs=25, max_turns=8, n_events=6000,
                        hot_frac=0.5, delete_frac=0.1)
    path = str(tmp_path / "ev.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path, max_offset=3999)
    lake.compact(parallel=False)              # base now holds epochs 0-1
    replay(lake, events_path=path)            # epochs 2 on ride as deltas
    return lake, events


def _expect(lake):
    return lake.state_table().to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_rotation_crash_between_renames_recovers(tmp_path, monkeypatch):
    """ADVICE lake.py:382 repro: crash between rename(base, old) and
    rename(next, base) leaves no base/. Re-running compact(new_hot_keys=...)
    must restore every row (the old code silently dropped all base rows and
    then destroyed base_old)."""
    lake, events = _rotation_fixture(tmp_path)
    wm = lake.watermark()
    before = _expect(lake)
    assert len(before) > 0

    real_rename = os.rename

    def crashing(src, dst):
        real_rename(src, dst)
        if str(dst).endswith("base_old"):
            raise RuntimeError("injected crash mid-swap")

    monkeypatch.setattr(os, "rename", crashing)
    with pytest.raises(RuntimeError, match="injected crash"):
        lake.compact(new_hot_keys=("conv-000000",))
    monkeypatch.setattr(os, "rename", real_rename)

    assert not os.path.isdir(os.path.join(lake.root, "base"))   # the bad state
    assert lake.rotation_in_progress()
    lake2 = LakeTable.open(lake.root)
    with pytest.raises(RuntimeError, match="rotation in progress"):
        replay(lake2, events_path=str(tmp_path / "ev.parquet"))
    lake2.compact(new_hot_keys=("conv-000000",))                # recovery
    assert not lake2.rotation_in_progress()
    assert lake2.watermark() == wm
    after = LakeTable.open(lake.root).state_table().to_pandas()
    pd.testing.assert_frame_equal(before, after)


@pytest.mark.usefixtures("ray_session")
def test_rotation_crash_after_swap_before_cleanup(tmp_path, monkeypatch):
    """Crash after rename(next, base) but before base_old/delta cleanup:
    recovery must finish the cleanup without rebuilding from the mixed
    (new-salt base + old-salt delta) layout."""
    lake, events = _rotation_fixture(tmp_path)
    wm = lake.watermark()
    before = _expect(lake)

    real_rmtree = shutil.rmtree

    def crashing(path, *a, **kw):
        if str(path).endswith("base_old") and os.path.isdir(path) \
                and not kw.get("ignore_errors"):
            raise RuntimeError("injected crash post-swap")
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(shutil, "rmtree", crashing)
    monkeypatch.setattr("ape_dts_ray.state.lake.shutil.rmtree", crashing)
    with pytest.raises(RuntimeError, match="injected crash"):
        lake.compact(new_hot_keys=("conv-000000",))
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)
    monkeypatch.setattr("ape_dts_ray.state.lake.shutil.rmtree", real_rmtree)

    assert os.path.isdir(os.path.join(lake.root, "base_old"))
    lake2 = LakeTable.open(lake.root)
    lake2.compact(new_hot_keys=("conv-000000",))
    assert not os.path.isdir(os.path.join(lake.root, "base_old"))
    assert not lake2.rotation_in_progress()
    assert lake2.watermark() == wm
    after = LakeTable.open(lake.root).state_table().to_pandas()
    pd.testing.assert_frame_equal(before, after)
    # and CDC can continue: replay is a no-op (everything compacted)
    assert replay(LakeTable.open(lake.root),
                  events_path=str(tmp_path / "ev.parquet")) == []


@pytest.mark.usefixtures("ray_session")
def test_rotation_crash_during_build_restarts_clean(tmp_path, monkeypatch):
    """Crash while base_next/ is half-built (before the swap commit point):
    base/ is untouched, and a re-run rebuilds from scratch."""
    lake, events = _rotation_fixture(tmp_path)
    before = _expect(lake)

    # leave a half-built next dir + rotation marker, as a build crash would
    next_dir = os.path.join(lake.root, "base_next")
    os.makedirs(next_dir, exist_ok=True)
    with open(os.path.join(next_dir, "part-00000.parquet"), "wb") as f:
        f.write(b"partial garbage")
    from ape_dts_ray.state.manifest import atomic_write_text
    atomic_write_text(os.path.join(lake.root, "_manifests", "rotation.json"),
                      json.dumps({"hot_keys": ["conv-000000"]}))

    lake2 = LakeTable.open(lake.root)
    assert lake2.rotation_in_progress()
    lake2.compact(new_hot_keys=("conv-000000",))
    after = LakeTable.open(lake.root).state_table().to_pandas()
    pd.testing.assert_frame_equal(before, after)


@pytest.mark.usefixtures("ray_session")
def test_replay_mixed_generic_id_cols(tmp_path):
    """ADVICE multitable.py:229 repro: replay_mixed with a non-transcript
    TableMeta must honor meta.id_cols in normalization (the old code passed
    the transcript defaults and KeyError'd on conv_id)."""
    from ape_dts_ray.pipelines.multitable import replay_mixed

    rng = np.random.default_rng(41)
    n = 3000
    docs = rng.integers(0, 60, size=n)
    revs = rng.integers(0, 5, size=n).astype(np.int32)
    ops = np.where(rng.random(n) < 0.15, "delete", "update").astype(object)
    ops[:300] = "insert"
    tables = np.where(rng.random(n) < 0.5, "left", "right").astype(object)
    events = pa.table({
        "log_offset": pa.array(np.arange(n, dtype=np.int64)),
        "op": pa.array(ops, pa.string()),
        "doc_id": pa.array([f"doc-{d:04d}" for d in docs], pa.string()),
        "rev": pa.array(revs),
        "body": pa.array([None if o == "delete" else f"b{i}"
                          for i, o in enumerate(ops)], pa.string()),
        "table": pa.array(tables, pa.string()),
    })
    path = str(tmp_path / "mixed_docs.parquet")
    pq.write_table(events, path)

    meta = TableMeta(name="docs", id_cols=("doc_id", "rev"),
                     partition_col="doc_id", order_cols=("doc_id", "rev"),
                     payload_cols=("body",))
    res = replay_mixed(str(tmp_path / "lakes"), ["left", "right"],
                       events_path=path, meta=meta,
                       config=EngineConfig(num_partitions=8, epoch_size=1500),
                       group_epochs=2)
    assert set(res) == {"left", "right"}

    for name in ("left", "right"):
        want = {}
        for r in events.filter(
                pa.compute.equal(events.column("table"), name)).to_pylist():
            k = (r["doc_id"], r["rev"])
            if r["op"] == "delete":
                want.pop(k, None)
            else:
                want[k] = r["body"]
        got = LakeTable.open(str(tmp_path / "lakes" / name)).state_table() \
                       .to_pandas()
        assert len(got) == len(want), name
        for r in got.itertuples():
            assert want[(r.doc_id, r.rev)] == r.body


def test_avro_parsing_canonical_form():
    """ADVICE avro.py:65: fingerprints are over Parsing Canonical Form —
    defaults/logicalTypes/doc stripped, namespace folded into the full name,
    attributes in spec order — so a standard Avro reader derives the same
    8 bytes from the writer schema."""
    from ape_dts_ray.stages.avro import (AVRO_SCHEMA, parsing_canonical_form,
                                         schema_fingerprint)

    pcf = parsing_canonical_form(AVRO_SCHEMA)
    assert '"default"' not in pcf and "logicalType" not in pcf
    assert '"namespace"' not in pcf
    assert '"name":"ape_dts_ray.ChangeEvent"' in pcf
    assert pcf.index('"name"') < pcf.index('"type"') < pcf.index('"fields"')
    # spec transforms on toy schemas
    assert parsing_canonical_form("int") == '"int"'
    assert parsing_canonical_form({"type": "string", "doc": "x"}) == '"string"'
    assert parsing_canonical_form(
        {"type": "long", "logicalType": "timestamp-micros"}) == '"long"'
    assert parsing_canonical_form(
        {"type": "record", "name": "R", "namespace": "ns", "doc": "d",
         "fields": [{"name": "f", "type": "long", "default": 0}]}
    ) == '{"name":"ns.R","type":"record","fields":[{"name":"f","type":"long"}]}'
    # equal schemas modulo stripped attributes → equal fingerprints
    stripped = json.loads(json.dumps(AVRO_SCHEMA))
    for f in stripped["fields"]:
        f.pop("default", None)
    assert schema_fingerprint(stripped) == schema_fingerprint(AVRO_SCHEMA)


def test_format_sql_generic_key_cols():
    """ADVICE sql_format.py:106: WHERE/VALUES built from the actual key_cols
    (string keys quoted, numeric keys bare)."""
    from ape_dts_ray.stages.sql_format import format_sql

    batch = pa.table({
        "log_offset": pa.array([1, 2], pa.int64()),
        "op": pa.array(["insert", "delete"]),
        "doc_id": pa.array(["d'1", "d2"]),
        "rev": pa.array([3, 4], pa.int32()),
        "body": pa.array(["x", None]),
    })
    out = format_sql(batch, table="docs", key_cols=("doc_id", "rev"),
                     payload_cols=("body",))
    sqls = out.column("sql").to_pylist()
    assert sqls[0] == ("REPLACE INTO docs (doc_id, rev, body) "
                       "VALUES ('d''1', 3, 'x');")
    assert sqls[1] == "DELETE FROM docs WHERE doc_id = 'd2' AND rev = 4;"


@pytest.mark.usefixtures("ray_session")
def test_reverse_sql_generic_key_cols(tmp_path):
    from ape_dts_ray.stages.sql_format import reverse_sql_with_before

    state = pa.table({
        "doc_id": pa.array(["d1", "d2"]),
        "rev": pa.array([1, 2], pa.int32()),
        "body": pa.array(["old1", "old2"]),
    })
    events = pa.table({
        "log_offset": pa.array([10, 11], pa.int64()),
        "op": pa.array(["delete", "insert"]),
        "doc_id": pa.array(["d1", "d9"]),
        "rev": pa.array([1, 9], pa.int32()),
        "body": pa.array([None, "new"]),
    })
    out = reverse_sql_with_before(
        rd.from_arrow(events), rd.from_arrow(state), table="docs",
        key_cols=("doc_id", "rev"), payload_cols=("body",), num_partitions=4)
    rows = {r["log_offset"]: r["sql"] for r in out.take_all()}
    assert rows[10] == ("REPLACE INTO docs (doc_id, rev, body) "
                        "VALUES ('d1', 1, 'old1');")
    assert rows[11] == "DELETE FROM docs WHERE doc_id = 'd9' AND rev = 9;"


@pytest.mark.usefixtures("ray_session")
def test_non_utf8_binary_payload_through_replay_and_compact(tmp_path):
    """Blob fidelity (ColValue::Blob analog): binary payloads with NUL /
    0xFF / arbitrary bytes survive LWW apply, crash-resume, and compaction
    byte-for-byte (not SQL-expressible — DuckDB views can't carry these
    bytes through the CTE derivation, so this rides pytest only)."""
    rng = np.random.default_rng(53)
    n = 2000
    convs = [f"conv-{i % 60:04d}" for i in range(n)]
    turns = (np.arange(n) % 12).astype(np.int32)
    ops = np.where(rng.random(n) < 0.1, "delete", "update").astype(object)
    ops[:200] = "insert"
    blobs = [None if o == "delete"
             else bytes([0, 255, i % 256, (i * 7) % 256]) + f"|{i}".encode()
             for i, o in enumerate(ops)]
    events = pa.table({
        "log_offset": pa.array(np.arange(n, dtype=np.int64)),
        "op": pa.array(ops, pa.string()),
        "conv_id": pa.array(convs, pa.string()),
        "turn_idx": pa.array(turns),
        "blob": pa.array(blobs, pa.binary()),
    })
    path = str(tmp_path / "blob_ev.parquet")
    pq.write_table(events, path)

    meta = TableMeta(name="blobs", payload_cols=("blob",))
    lake = LakeTable.create(str(tmp_path / "bloblake"), meta,
                            EngineConfig(num_partitions=8, epoch_size=500))
    replay(lake, events_path=path, stop_after_epoch=1)   # crash + resume
    replay(LakeTable.open(lake.root), events_path=path)
    lake = LakeTable.open(lake.root)
    lake.compact(parallel=False)

    want = {}
    for r in events.to_pylist():
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            want.pop(k, None)
        else:
            want[k] = r["blob"]
    got = lake.state_table()
    assert got.schema.field("blob").type == pa.binary()
    rows = got.to_pylist()
    assert len(rows) == len(want)
    for r in rows:
        assert want[(r["conv_id"], r["turn_idx"])] == r["blob"]


@pytest.mark.usefixtures("ray_session")
def test_growing_log_reruns_partial_tail_epoch(tmp_path):
    """A replay of a then-shorter log commits a PARTIAL tail epoch (its
    manifest ends mid-window). When the log grows inside that window, the
    resume must re-run the window — the old epoch-id filter silently
    dropped every event appended into it (found by the two-way cycle
    test; the reference never hits this because binlog positions, not
    epoch ids, drive its resume)."""
    events = gen_events(seed=141, n_convs=20, max_turns=8, n_events=5000,
                        delete_frac=0.15)
    n = events.num_rows
    cut = 3000                                  # inside epoch 1 ([2000,3999])
    short = str(tmp_path / "short.parquet")
    full = str(tmp_path / "full.parquet")
    pq.write_table(events.slice(0, cut), short)
    pq.write_table(events, full)

    lake = _mk_lake(tmp_path, "grow")
    replay(lake, events_path=short)             # tail epoch 1 = [2000, 2999]
    assert lake.watermark() == cut - 1
    replay(lake, events_path=full)              # log grew inside epoch 1
    want = oracle_replay(events)
    got = lake.state_table().to_pandas()
    assert len(got) == len(want)
    pd.testing.assert_series_equal(got["text"], want["text"],
                                   check_dtype=False, check_names=False)

    # idempotence: replaying the full log again is a no-op (tail epoch now
    # covers its full window, so the manifest check passes)
    assert replay(LakeTable.open(lake.root), events_path=full) == []


def test_envelope_preserves_nullable_ints():
    """ADVICE envelope.py:36: nullable int payloads must serialize as exact
    integers (not 3.0 / 2^53-rounded floats)."""
    from ape_dts_ray.stages.envelope import from_envelope, make_to_envelope

    big = 9_007_199_254_740_993            # 2^53 + 1 — float64 cannot hold it
    batch = pa.table({
        "log_offset": pa.array([1, 2, 3], pa.int64()),
        "op": pa.array(["insert"] * 3),
        "conv_id": pa.array(["a", "b", "c"]),
        "turn_idx": pa.array([3, None, big], pa.int64()),
    })
    env = make_to_envelope()(batch)
    payloads = [json.loads(p) for p in env.column("payload").to_pylist()]
    assert payloads[0]["turn_idx"] == 3
    assert payloads[1]["turn_idx"] is None
    assert payloads[2]["turn_idx"] == big
    assert env.column("key").to_pylist()[0] == "a\x1f3"      # not "3.0"
    back = from_envelope(env, schema=batch.schema)
    assert back.column("turn_idx").to_pylist() == [3, None, big]


def test_min_offset_fresh_lake_crash_resume(ray_session, tmp_path):
    """Review fix: a FRESH lake replayed with min_offset>0 numbers epochs by
    offset (not from 0), so a crash-resume of the identical call skips its
    own committed epochs instead of renumbering/duplicating them."""
    import pyarrow.parquet as pq

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable

    events = gen_events(seed=31, n_convs=30, n_events=6000)
    path = str(tmp_path / "ev.parquet")
    pq.write_table(events, path)
    lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(num_partitions=4, epoch_size=1000))
    # misaligned min_offset on a FRESH lake: offset-derived ids + snapped
    # first window [2500, 2999], then aligned ones
    replay(lake, events_path=path, min_offset=2500, stop_after_epoch=3)
    first = lake.committed_epochs()
    assert first[0] == 2 and 3 in first            # 2500 // 1000 = 2
    # resume the identical call (fresh process analog): identical numbering,
    # committed epochs skipped, remainder applied exactly once
    lake2 = LakeTable.open(lake.root)
    replay(lake2, events_path=path, min_offset=2500)
    assert lake2.committed_epochs()[0] == 2
    assert sorted(set(lake2.committed_epochs())) == lake2.committed_epochs()
    # events below min_offset never applied; above it applied exactly once
    import pyarrow.compute as pc

    state = lake2.state_table(drop_engine_cols=False)
    offs = state.column("log_offset").to_pylist()
    assert min(o for o in offs if o >= 0) >= 2500


def test_rotation_generic_key_columns(ray_session, tmp_path):
    """Review fix: hot-key rotation on a table with generalized id cols
    (non-transcript names) partitions by meta.partition_col, not conv_id."""
    import pyarrow as pa
    import ray.data as rd

    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable

    meta = TableMeta(name="kv", id_cols=("tenant", "sku"),
                     partition_col="tenant", payload_cols=("val",))
    lake = LakeTable.create(str(tmp_path / "lake"), meta,
                            EngineConfig(num_partitions=4, epoch_size=100))
    n = 300
    ev = pa.table({
        "log_offset": pa.array(range(n), pa.int64()),
        "op": ["insert"] * n,
        "tenant": [f"t{i % 7}" for i in range(n)],
        "sku": [f"s{i}" for i in range(n)],          # STRING salt col
        "val": [f"v{i}" for i in range(n)],
    })
    replay(lake, events_ds=rd.from_arrow(ev))
    before = lake.state_table()
    # rotation with a hot STRING-salted key: previously KeyError'd on
    # conv_id and crashed the int64 salt cast
    lake.compact(new_hot_keys=("t0",))
    after = LakeTable.open(lake.root).state_table()
    assert after.num_rows == before.num_rows == n
    a = sorted(map(tuple, before.to_pylist()[0].items() and [
        (r["tenant"], r["sku"], r["val"]) for r in before.to_pylist()]))
    b = sorted((r["tenant"], r["sku"], r["val"]) for r in after.to_pylist())
    assert a == b
    # continued replay with the hot key still converges
    ev2 = pa.table({
        "log_offset": pa.array(range(n, n + 50), pa.int64()),
        "op": ["update"] * 50,
        "tenant": ["t0"] * 50,
        "sku": [f"s{i}" for i in range(50)],
        "val": [f"V{i}" for i in range(50)],
    })
    replay(LakeTable.open(lake.root), events_ds=rd.from_arrow(ev2))
    state = {(r["tenant"], r["sku"]): r["val"]
             for r in LakeTable.open(lake.root).state_table().to_pylist()}
    assert state[("t0", "s1")] == "V1"


def test_compact_refuses_during_rotation(ray_session, tmp_path):
    import json
    import os

    import pytest as _pytest

    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.state.lake import MANIFEST_DIR, LakeTable

    lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(num_partitions=2))
    marker = os.path.join(lake.root, MANIFEST_DIR, "rotation.json")
    with open(marker, "w") as f:
        json.dump({"hot_keys": []}, f)
    with _pytest.raises(RuntimeError, match="rotation in progress"):
        lake.compact()
    with _pytest.raises(RuntimeError, match="rotation in progress"):
        lake.truncate()


def test_below_window_offset_raises(ray_session):
    import numpy as np
    import pyarrow as pa

    import pytest as _pytest

    from ape_dts_ray.stages.apply import add_shard_column

    t = pa.table({"log_offset": pa.array([5, 50], pa.int64()),
                  "conv_id": ["a", "b"], "turn_idx": [1, 2]})
    with _pytest.raises(ValueError, match="below the first window"):
        add_shard_column(t, np.array([10]), np.array([0]), 4, None)


def test_checker_generic_keys_and_types(ray_session):
    """Review fix: check_datasets co-partitions by the ACTUAL key cols and
    null-pads missing compare cols with the other side's type."""
    import pyarrow as pa
    import ray.data as rd

    from ape_dts_ray.pipelines.checker import check_datasets

    src = rd.from_arrow(pa.table({
        "id": [1, 2, 3], "v": [10, 20, 30],
        "ts": pa.array([1000, 2000, 3000], pa.timestamp("us"))}))
    dst = rd.from_arrow(pa.table({
        "id": [1, 2], "v": [10, 99]}))       # no ts column at all
    out = pa.concat_tables(check_datasets(
        src, dst, key_cols=("id",), compare_cols=("v", "ts"),
        num_partitions=4).iter_batches(batch_format="pyarrow"))
    got = {(r["id"], r["check_type"]) for r in out.to_pylist()}
    # 3 missing from dst; 1 matches on v but dst lacks ts -> diff; 2 diff
    assert got == {(3, "miss"), (1, "diff"), (2, "diff")}


def test_replay_mixed_refuses_many_to_one_and_config_drift(ray_session, tmp_path):
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from ape_dts_ray.meta import EngineConfig
    from ape_dts_ray.pipelines.multitable import replay_mixed
    from ape_dts_ray.stages.router import Router

    ev = pa.table({
        "log_offset": pa.array([0, 1], pa.int64()), "op": ["insert"] * 2,
        "table": ["a", "b"],
        "conv_id": ["c1", "c2"], "turn_idx": [1, 2],
        "role": ["u", "u"], "text": ["x", "y"], "tool": ["", ""],
        "ts": pa.array([None, None], pa.timestamp("us"))})
    with _pytest.raises(ValueError, match="many-to-one"):
        replay_mixed(str(tmp_path / "l1"), ["a", "b"],
                     events_ds=rd.from_arrow(ev),
                     router=Router(table_map={"a": "t", "b": "t"}),
                     config=EngineConfig(num_partitions=2, epoch_size=10))
    # config drift on resume: first run persists epoch_size=10; re-running
    # with 5 must refuse instead of silently re-windowing
    replay_mixed(str(tmp_path / "l2"), ["a", "b"],
                 events_ds=rd.from_arrow(ev),
                 config=EngineConfig(num_partitions=2, epoch_size=10))
    with _pytest.raises(ValueError, match="persisted epoch_size"):
        replay_mixed(str(tmp_path / "l2"), ["a", "b"],
                     events_ds=rd.from_arrow(ev),
                     config=EngineConfig(num_partitions=2, epoch_size=5))


def test_envelope_precision_and_unknown_columns(ray_session):
    """Review fixes: float payloads survive the JSON envelope at full
    precision; payload columns absent from the target schema are carried
    through instead of crashing the decode."""
    import pyarrow as pa

    from ape_dts_ray.stages.envelope import from_envelope, make_to_envelope

    t = pa.table({
        "log_offset": pa.array([0], pa.int64()),
        "op": ["insert"], "conv_id": ["c1"], "turn_idx": [1],
        "value": pa.array([0.12345678901234567], pa.float64()),
    })
    env = make_to_envelope()(t)
    back = from_envelope(env, schema=pa.schema([("value", pa.float64())]))
    # 15 significant digits is the JSON writer's max (ujson); the default
    # of 10 lost 0.12345678901234567 -> 0.123456789
    assert abs(back.column("value")[0].as_py() - 0.12345678901234567) < 1e-15
    # 'conv_id' / 'turn_idx' are NOT in the given schema — must not raise
    assert back.column("conv_id")[0].as_py() == "c1"


def test_unique_allows_multiple_nulls(ray_session, tmp_path):
    """SQL UNIQUE permits multiple NULLs — snapshot load must not reject a
    source two of whose rows have a NULL unique column."""
    import pyarrow as pa
    import ray.data as rd

    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.snapshot import load_snapshot
    from ape_dts_ray.state.lake import LakeTable

    lake = LakeTable.create(
        str(tmp_path / "lake"),
        TableMeta(payload_cols=("role", "text", "tool", "ts", "email")),
        EngineConfig(num_partitions=2))
    lake.set_constraints([{"type": "unique", "cols": ["email"]}])
    snap = pa.table({
        "conv_id": ["a", "b", "c"], "turn_idx": [1, 2, 3],
        "role": ["u"] * 3, "text": ["x"] * 3, "tool": [""] * 3,
        "ts": pa.nulls(3, pa.timestamp("us")),
        "email": pa.array([None, None, "e@x"], pa.string()),
    })
    load_snapshot(lake, rd.from_arrow(snap))     # two NULL emails: legal
    assert lake.state_table().num_rows == 3


def test_pk_change_generic_key_col(ray_session):
    """split_pk_change derives the helper column from key_cols — a generic
    table's 'new_<key>' column splits; a stray transcript-named helper on a
    generic table is ignored instead of crashing."""
    import pyarrow as pa

    from ape_dts_ray.stages.normalize import normalize_batch

    t = pa.table({
        "log_offset": pa.array([0, 1], pa.int64()),
        "op": ["update", "update"],
        "tenant": ["t1", "t2"], "item": [1, 2],
        "new_item": pa.array([None, 9], pa.int64()),
        "val": ["a", "b"],
    })
    out = normalize_batch(t, key_cols=("tenant", "item"))
    rows = sorted((r["tenant"], r["item"], r["op"]) for r in out.to_pylist())
    assert rows == [("t1", 1, "update"), ("t2", 2, "delete"),
                    ("t2", 9, "insert")]
    # transcript-named helper on a generic table: no such key col -> no split
    t2 = pa.table({
        "log_offset": pa.array([0], pa.int64()), "op": ["update"],
        "tenant": ["t1"], "item": [1],
        "new_turn_idx": pa.array([5], pa.int64()), "val": ["a"],
    })
    out2 = normalize_batch(t2, key_cols=("tenant", "item"))
    assert out2.num_rows == 1


def test_truncate_marker_blocks_state_reads(ray_session, tmp_path):
    """Review r3: mid-truncate some partitions are deleted and some are not —
    state_table/state_dataset/export_state must refuse while truncate.json
    is present (same marker contract replay() and compact() already honor),
    and work again once truncate() finishes."""
    from ape_dts_ray.pipelines.export import export_state

    events = gen_events(seed=47, n_convs=10, max_turns=6, n_events=1500)
    path = str(tmp_path / "ev.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path)
    assert lake.state_table().num_rows > 0

    marker = os.path.join(lake.root, "_manifests", "truncate.json")
    with open(marker, "w") as f:
        json.dump({"watermark": lake.watermark()}, f)
    with pytest.raises(RuntimeError, match="truncate in progress"):
        lake.state_table()
    with pytest.raises(RuntimeError, match="truncate in progress"):
        lake.state_dataset()
    with pytest.raises(RuntimeError, match="truncate in progress"):
        export_state(lake, str(tmp_path / "export"))

    lake.truncate()                     # idempotent finish removes the marker
    assert lake.state_table().num_rows == 0


def test_intset_forced_encoding_refuses_non_int():
    """Review r3: encoding="intset" with a non-integer member silently
    dropped it (data loss in the written RDB) — must raise instead."""
    from ape_dts_ray.sources.rdb import encode_rdb, parse_rdb

    good = [{"type": "set", "key": b"s", "db": 0,
             "elements": [b"1", b"2", b"30"], "encoding": "intset"}]
    _, parsed = parse_rdb(encode_rdb(good))
    assert sorted(parsed[0]["elements"]) == [b"1", b"2", b"30"]

    bad = [{"type": "set", "key": b"s", "db": 0,
            "elements": [b"1", b"oops"], "encoding": "intset"}]
    with pytest.raises(ValueError, match="intset"):
        encode_rdb(bad)


def test_avro_decode_pins_schema_for_all_null_and_empty_blocks():
    """Review r3: avro_decode inferred the schema per block, so an all-null
    ``tool`` column (or an empty block) typed as null and broke the first
    downstream concat. The schema is now pinned."""
    from ape_dts_ray.stages.avro import avro_decode, avro_encode

    batch = pa.table({
        "log_offset": pa.array([0, 1], pa.int64()),
        "seq": pa.array([0, 0], pa.int32()),
        "op": ["insert", "insert"],
        "conv_id": ["conv-1", "conv-2"],
        "turn_idx": pa.array([0, 1], pa.int32()),
        "role": ["user", "assistant"],
        "text": ["hi", "yo"],
        "tool": pa.nulls(2, pa.string()),          # all-null block
        "ts": pa.array([1_700_000_000_000_000] * 2, pa.timestamp("us")),
    })
    dec = avro_decode(avro_encode(batch))
    assert dec.schema.field("tool").type == pa.string()
    assert dec.schema.field("ts").type == pa.timestamp("us")
    assert dec.column("conv_id").to_pylist() == ["conv-1", "conv-2"]

    empty = avro_decode(avro_encode(batch.slice(0, 0)))
    assert empty.num_rows == 0
    assert empty.schema.field("turn_idx").type == pa.int32()
    assert pa.concat_tables([dec, empty]).num_rows == 2


def test_multi_chunk_events_ds_spills_once(ray_session, tmp_path, monkeypatch):
    """Scale fix: a plain events_ds with a multi-chunk plan is spilled to
    scratch Parquet in ONE pass and replayed via pruned reads (the upstream
    used to re-execute once per chunk). The spill must engage, be cleaned
    up, and produce the identical lake state as an events_path replay."""
    import ray.data as rd

    events = gen_events(seed=61, n_convs=30, max_turns=8, n_events=20_000,
                        delete_frac=0.1)
    path = str(tmp_path / "ev.parquet")
    pq.write_table(events, path)

    spilled = []
    import tempfile as _tf
    orig = _tf.mkdtemp

    def spy_mkdtemp(*a, **kw):
        d = orig(*a, **kw)
        if kw.get("prefix", "").startswith("ape_dts_replay_spill_"):
            spilled.append(d)
        return d

    monkeypatch.setattr(_tf, "mkdtemp", spy_mkdtemp)

    # epoch_size 2000 → 10 windows → 3 chunks at group_epochs=4 → spill
    lake_ds = _mk_lake(tmp_path, "lake_ds", epoch_size=2000)
    replay(lake_ds, events_ds=rd.read_parquet(path))
    assert len(spilled) == 1, "multi-chunk events_ds should spill exactly once"
    assert not os.path.exists(spilled[0]), "spill dir must be cleaned up"

    lake_fp = _mk_lake(tmp_path, "lake_fp", epoch_size=2000)
    replay(lake_fp, events_path=path)
    a = lake_ds.state_table().to_pandas()
    b = lake_fp.state_table().to_pandas()
    pd.testing.assert_frame_equal(a, b)

    # known-max single-chunk plan keeps the direct Dataset (no spill);
    # without max_offset the spill doubles as the max-discovery execution
    mx = int(pa.compute.max(events.column("log_offset")).as_py())
    spilled.clear()
    lake_small = _mk_lake(tmp_path, "lake_small", epoch_size=mx + 1)
    replay(lake_small, events_ds=rd.read_parquet(path), max_offset=mx)
    assert spilled == []
    pd.testing.assert_frame_equal(a, lake_small.state_table().to_pandas())

    # a fully-committed resume with a known max plans zero chunks → no spill
    spilled.clear()
    replay(lake_ds, events_ds=rd.read_parquet(path), max_offset=mx)
    assert spilled == []


def test_statless_parquet_replay_not_silent_noop(ray_session, tmp_path):
    """Review r3 (2nd pass): events parquet written WITHOUT column
    statistics must still replay fully — the footer-max helper returns
    None (not a zero-epoch sentinel) and replay falls back to a
    one-column scan."""
    from ape_dts_ray.pipelines.replay import max_offset_from_footers

    events = gen_events(seed=83, n_convs=10, max_turns=5, n_events=3000)
    path = str(tmp_path / "nostats.parquet")
    pq.write_table(events, path, write_statistics=False)
    assert max_offset_from_footers(path) is None

    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path)
    assert lake.state_table().num_rows > 0
    assert lake.watermark() == int(
        pa.compute.max(events.column("log_offset")).as_py())
