"""Unit tests for the LWW merge kernels (no Ray needed).

Covers the RdbMerger edge cases the reference's basic_test fixtures exercise
(SURVEY §2.4/§5): multi-update dedup, delete-then-reinsert, insert-then-delete,
NULL-key rejection, PK-change splitting, additive schema unify.
"""

import numpy as np
import pyarrow as pa
import pytest

from ape_dts_ray.meta import OP_DELETE, OP_INSERT, OP_UPDATE
from ape_dts_ray.stages.merge import drop_tombstones, fold_state, lww_last, unify_tables
from ape_dts_ray.stages.normalize import NullKeyError, normalize_batch, split_pk_change


def ev(rows):
    cols = {
        "log_offset": pa.array([r[0] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int32()),
        "op": pa.array([r[2] for r in rows], pa.string()),
        "conv_id": pa.array([r[3] for r in rows], pa.string()),
        "turn_idx": pa.array([r[4] for r in rows], pa.int32()),
        "text": pa.array([r[5] for r in rows], pa.string()),
    }
    return pa.table(cols)


def test_lww_take_last():
    t = ev([
        (1, 0, OP_INSERT, "c1", 0, "a"),
        (2, 0, OP_UPDATE, "c1", 0, "b"),
        (5, 0, OP_UPDATE, "c1", 0, "final"),
        (3, 0, OP_INSERT, "c2", 0, "x"),
    ])
    out = lww_last(t)
    d = {(r["conv_id"], r["turn_idx"]): r["text"] for r in out.to_pylist()}
    assert d == {("c1", 0): "final", ("c2", 0): "x"}
    assert out.schema == t.schema


def test_delete_then_reinsert_and_insert_then_delete():
    t = ev([
        (1, 0, OP_INSERT, "c1", 0, "a"),
        (2, 0, OP_DELETE, "c1", 0, None),
        (3, 0, OP_INSERT, "c1", 0, "back"),   # reinsert survives
        (4, 0, OP_INSERT, "c2", 0, "y"),
        (5, 0, OP_DELETE, "c2", 0, None),      # tombstone wins
    ])
    live = drop_tombstones(lww_last(t))
    d = {(r["conv_id"], r["turn_idx"]): r["text"] for r in live.to_pylist()}
    assert d == {("c1", 0): "back"}


def test_seq_breaks_offset_ties():
    t = ev([
        (7, 0, OP_DELETE, "c1", 5, None),   # delete half of a pk-change
        (7, 1, OP_INSERT, "c1", 5, "new"),  # same offset, higher seq wins
    ])
    out = drop_tombstones(lww_last(t))
    assert out.to_pylist() == [
        {"log_offset": 7, "seq": 1, "op": "insert", "conv_id": "c1",
         "turn_idx": 5, "text": "new"}]


def test_null_key_rejected():
    t = pa.table({
        "log_offset": pa.array([1], pa.int64()),
        "op": pa.array(["insert"]),
        "conv_id": pa.array([None], pa.string()),
        "turn_idx": pa.array([0], pa.int32()),
    })
    with pytest.raises(NullKeyError):
        normalize_batch(t)


def test_split_pk_change():
    t = pa.table({
        "log_offset": pa.array([10, 11], pa.int64()),
        "op": pa.array([OP_UPDATE, OP_UPDATE]),
        "conv_id": pa.array(["c1", "c1"]),
        "turn_idx": pa.array([3, 4], pa.int32()),
        "text": pa.array(["moved", "stay"]),
        "new_turn_idx": pa.array([30, None], pa.int32()),
    })
    out = split_pk_change(t)
    assert "new_turn_idx" not in out.column_names
    rows = sorted(out.to_pylist(), key=lambda r: (r["log_offset"], r["seq"]))
    assert [(r["op"], r["turn_idx"], r["text"]) for r in rows] == [
        (OP_DELETE, 3, None),      # old key tombstoned
        (OP_INSERT, 30, "moved"),  # new key carries payload
        (OP_UPDATE, 4, "stay"),
    ]


def test_unify_additive_schema():
    t1 = ev([(1, 0, OP_INSERT, "c1", 0, "a")])
    t2 = t1.append_column("lang", pa.array(["en"]))
    a, b = unify_tables([t1, t2])
    assert a.schema == b.schema
    assert a.column("lang").null_count == 1


def test_fold_state_epoch_order():
    base = ev([(100, 0, OP_INSERT, "c1", 0, "old")]).append_column(
        "_epoch", pa.array([-1], pa.int64()))
    d1 = ev([(5, 0, OP_UPDATE, "c1", 0, "newer")]).append_column(
        "_epoch", pa.array([3], pa.int64()))
    # delta epoch 3 beats base even though base offset is higher (compacted rank)
    out = fold_state([base, d1])
    assert out.to_pylist()[0]["text"] == "newer"


def test_table_filter_wildcards():
    from ape_dts_ray.stages.filter import TableFilter, wildcard_to_regex

    f = TableFilter(do_tables=("db1.*", "db2.tb_?"), ignore_tables=("db1.secret*",))
    assert not f.filtered("db1.anything")
    assert f.filtered("db1.secret_keys")     # deny wins over allow
    assert not f.filtered("db2.tb_1")
    assert f.filtered("db2.tb_10")           # ? matches exactly one char
    assert f.filtered("db3.tb")              # not in allow list
    assert TableFilter().filtered("x") is False   # empty allow = allow-all
    # escaped wildcard matches literally (rdb_filter.rs escape semantics)
    assert wildcard_to_regex(r"a\*b").match("a*b")
    assert not wildcard_to_regex(r"a\*b").match("aXb")


def test_suggest_epoch_config():
    from ape_dts_ray.pipelines.replay import suggest_epoch_config

    narrow = suggest_epoch_config(avg_event_bytes=150)
    assert narrow["epoch_size"] * narrow["group_epochs"] * 150 < 2 << 30
    assert narrow["epoch_size"] % 125_000 == 0
    wide = suggest_epoch_config(avg_event_bytes=1000)
    assert wide["epoch_size"] * wide["group_epochs"] * 1000 <= (1 << 30) + (125_000 * 4 * 1000)
    assert wide["pipeline_depth"] == 1
