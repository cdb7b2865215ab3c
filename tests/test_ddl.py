"""DDL-text adapter tests: parsing the alter-family subset, mid-stream
equivalence with structured schema_ops, TRUNCATE semantics + crash marker,
id-col protection."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from ape_dts_ray.fixtures import gen_events, oracle_replay
from ape_dts_ray.meta import EngineConfig, TableMeta
from ape_dts_ray.pipelines.replay import replay
from ape_dts_ray.stages.ddl import (DdlError, UnsupportedDdlError, apply_ddl,
                                    parse_ddl)
from ape_dts_ray.state.lake import LakeTable


def _mk_lake(tmp_path, name="lake", **cfg):
    defaults = dict(num_partitions=8, epoch_size=2000)
    defaults.update(cfg)
    return LakeTable.create(str(tmp_path / name), TableMeta(),
                            EngineConfig(**defaults))


# ---------- parsing ----------

def test_parse_alter_family():
    p = parse_ddl("ALTER TABLE db1.transcripts RENAME COLUMN tool TO tool_name")
    assert p.kind == "rename" and p.schema_op == {
        "op": "rename", "from": "tool", "to": "tool_name"}
    p = parse_ddl("alter table `transcripts` drop column `role`;")
    assert p.kind == "drop" and p.schema_op == {"op": "drop", "col": "role"}
    p = parse_ddl('ALTER TABLE "transcripts" ADD COLUMN channel VARCHAR(32) NULL')
    assert p.kind == "add" and p.schema_op is None
    assert p.extra == {"col": "channel", "type": "string"}
    p = parse_ddl("ALTER TABLE t MODIFY COLUMN turn_idx BIGINT NOT NULL")
    assert p.schema_op == {"op": "widen", "col": "turn_idx", "type": "int64"}
    p = parse_ddl("ALTER TABLE t ALTER COLUMN amount SET DATA TYPE DECIMAL(38, 4)")
    assert p.schema_op == {"op": "widen", "col": "amount",
                           "type": "decimal128(38,4)"}
    p = parse_ddl("ALTER TABLE t ALTER qty TYPE DOUBLE PRECISION")
    assert p.schema_op == {"op": "widen", "col": "qty", "type": "float64"}
    p = parse_ddl("TRUNCATE TABLE transcripts")
    assert p.kind == "truncate" and p.table == "transcripts"
    assert parse_ddl("truncate transcripts;").kind == "truncate"


def test_parse_rejects_out_of_scope():
    for sql in ("CREATE INDEX i ON t(a)",
                "ALTER TABLE t ADD CONSTRAINT c UNIQUE (a)",
                "ALTER TABLE t ADD COLUMN c SOMEWEIRDTYPE",
                "CREATE VIEW v AS SELECT 1",
                "GRANT SELECT ON t TO u"):
        with pytest.raises(UnsupportedDdlError):
            parse_ddl(sql)
    # table-lifecycle statements parse, but are rejected at the LAKE-scoped
    # execution point — they belong to apply_table_ddl on a multitable root
    assert parse_ddl("DROP TABLE t").kind == "drop_table"
    with pytest.raises(DdlError, match="table-lifecycle"):
        apply_ddl(None, "DROP TABLE t")


def test_apply_ddl_protects_id_cols(tmp_path):
    lake = _mk_lake(tmp_path)
    with pytest.raises(ValueError, match="id col"):
        apply_ddl(lake, "ALTER TABLE transcripts DROP COLUMN conv_id")
    with pytest.raises(ValueError, match="id col"):
        apply_ddl(lake, "ALTER TABLE transcripts RENAME COLUMN turn_idx TO t2")
    with pytest.raises(DdlError, match="collides"):
        apply_ddl(lake, "ALTER TABLE transcripts ADD COLUMN conv_id TEXT")
    assert lake.schema_ops == []            # nothing persisted on rejection


# ---------- mid-stream equivalence with structured ops ----------

@pytest.mark.usefixtures("ray_session")
def test_ddl_text_mid_stream_equals_structured_ops(tmp_path):
    """Feeding DDL strings between two replay legs produces the identical
    lake state as registering the structured schema_ops up front (the
    ddl_parser.rs → ddl_type.rs path collapsed onto apply_schema_ops)."""
    events = gen_events(seed=71, n_convs=25, max_turns=8, n_events=4000,
                        delete_frac=0.15)
    cut = 2000                              # epoch boundary
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)

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

    ref = _mk_lake(tmp_path, "ref")
    ref.set_schema_ops([{"op": "rename", "from": "tool", "to": "tool_name"},
                        {"op": "drop", "col": "role"},
                        {"op": "widen", "col": "turn_idx", "type": "int64"}])
    replay(ref, events_path=path, barriers=[(cut, 1)], router_fn=rename_tool)
    want = ref.state_table().to_pandas()

    ddl = _mk_lake(tmp_path, "ddl")
    replay(ddl, events_path=path, max_offset=cut - 1)       # pre-DDL leg
    for sql in ("ALTER TABLE transcripts RENAME COLUMN tool TO tool_name",
                "ALTER TABLE transcripts DROP COLUMN role",
                "ALTER TABLE transcripts MODIFY COLUMN turn_idx BIGINT"):
        apply_ddl(ddl, sql)
    ddl = LakeTable.open(ddl.root)                          # ops persisted
    assert len(ddl.schema_ops) == 3
    replay(ddl, events_path=path, barriers=[(cut, 1)], router_fn=rename_tool)

    def canon(df):
        return df[sorted(df.columns)].reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(want),
                                  canon(ddl.state_table().to_pandas()))
    # and through compaction
    ddl.compact(parallel=False)
    pd.testing.assert_frame_equal(
        canon(want), canon(LakeTable.open(ddl.root).state_table().to_pandas()))


# ---------- TRUNCATE ----------

@pytest.mark.usefixtures("ray_session")
def test_truncate_preserves_watermark_and_accepts_new_tail(tmp_path):
    events = gen_events(seed=72, n_convs=20, max_turns=6, n_events=3000,
                        delete_frac=0.1)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path)
    wm = lake.watermark()
    assert lake.state_table().num_rows > 0

    apply_ddl(lake, "TRUNCATE TABLE transcripts")
    assert lake.state_table().num_rows == 0
    assert lake.watermark() == wm
    # consumed history is NOT re-applied
    assert replay(LakeTable.open(lake.root), events_path=path) == []

    # a post-truncate tail (offsets past the watermark) applies normally
    tail = pa.table({
        "log_offset": pa.array([wm + 1, wm + 2], pa.int64()),
        "op": pa.array(["insert", "insert"]),
        "conv_id": pa.array(["conv-new", "conv-new"]),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "role": pa.array(["user", "assistant"]),
        "text": pa.array(["hello", "world"]),
        "tool": pa.array(["", ""]),
        "ts": pa.array([None, None], pa.timestamp("us")),
    })
    tail_path = str(tmp_path / "tail.parquet")
    pq.write_table(tail, tail_path)
    lake2 = LakeTable.open(lake.root)
    replay(lake2, events_path=[path, tail_path])
    got = lake2.state_table().to_pandas()
    assert sorted(got["text"]) == ["hello", "world"]


@pytest.mark.usefixtures("ray_session")
def test_truncate_crash_marker_blocks_replay_and_rerun_finishes(tmp_path,
                                                                monkeypatch):
    import os

    events = gen_events(seed=73, n_convs=15, max_turns=5, n_events=2000,
                        delete_frac=0.1)
    path = str(tmp_path / "events.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    replay(lake, events_path=path)
    wm = lake.watermark()

    real_remove = os.remove

    # crash mid-delete: after the marker is written, before manifest cleanup
    def crash_on_manifest(p):
        if str(p).endswith(".json") and "epoch-" in str(p):
            raise RuntimeError("injected truncate crash")
        real_remove(p)

    monkeypatch.setattr(os, "remove", crash_on_manifest)
    with pytest.raises(RuntimeError, match="injected truncate crash"):
        lake.truncate()
    monkeypatch.setattr(os, "remove", real_remove)

    lake2 = LakeTable.open(lake.root)
    assert lake2.truncate_in_progress()
    with pytest.raises(RuntimeError, match="truncate in progress"):
        replay(lake2, events_path=path)
    lake2.truncate()                         # idempotent re-run finishes
    assert not lake2.truncate_in_progress()
    assert lake2.state_table().num_rows == 0
    assert lake2.watermark() == wm


def test_change_column(ray_session, tmp_path):
    """MySQL CHANGE COLUMN = rename + new definition in one statement."""
    from ape_dts_ray.stages.ddl import apply_ddl, parse_ddl

    p = parse_ddl("ALTER TABLE t CHANGE COLUMN a b BIGINT")
    assert p.kind == "rename"
    assert p.schema_op == {"op": "rename", "from": "a", "to": "b"}
    assert p.extra["also"] == {"op": "widen", "col": "b", "type": "int64"}
    # same-name CHANGE degenerates to a widen
    p2 = parse_ddl("ALTER TABLE t CHANGE c c DECIMAL(18,4)")
    assert p2.kind == "widen"
    assert p2.schema_op == {"op": "widen", "col": "c",
                            "type": "decimal128(18,4)"}

    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.state.lake import LakeTable

    lake = LakeTable.create(
        str(tmp_path / "lake"),
        TableMeta(payload_cols=("role", "text", "tool", "ts", "a")),
        EngineConfig(num_partitions=2))
    apply_ddl(lake, "ALTER TABLE t CHANGE COLUMN a b BIGINT")
    assert {"op": "rename", "from": "a", "to": "b"} in lake.schema_ops
    assert {"op": "widen", "col": "b", "type": "int64"} in lake.schema_ops


def test_quoted_identifier_escapes():
    from ape_dts_ray.stages.ddl import parse_ddl

    p = parse_ddl('ALTER TABLE t RENAME COLUMN `a``b` TO "c""d"')
    assert p.schema_op == {"op": "rename", "from": "a`b", "to": 'c"d'}


# ---------- table lifecycle (ddl_type.rs CreateTable/DropTable/RenameTable) --

def _mixed_events(n=2000, seed=71):
    rng = np.random.default_rng(seed)
    uids = rng.integers(0, 40, size=n)
    items = rng.integers(0, 6, size=n).astype(np.int32)
    ops = np.where(rng.random(n) < 0.12, "delete", "update").astype(object)
    ops[:200] = "insert"
    return pa.table({
        "log_offset": pa.array(np.arange(n, dtype=np.int64)),
        "op": pa.array(ops, pa.string()),
        "uid": pa.array([f"u-{u:03d}" for u in uids], pa.string()),
        "item": pa.array(items),
        "val": pa.array([None if o == "delete" else f"v{i}"
                         for i, o in enumerate(ops)], pa.string()),
    })


def test_create_table_parses_columns_keys_and_constraints(tmp_path):
    from ape_dts_ray.stages.ddl import apply_table_ddl, list_tables

    root = str(tmp_path)
    p = apply_table_ddl(root, """
        CREATE TABLE orders_x (
          uid VARCHAR NOT NULL,
          item INT,
          amount DECIMAL(18,4),
          val TEXT NOT NULL,
          PRIMARY KEY (uid, item)
        )""")
    assert p.kind == "create_table"
    lake = LakeTable.open(str(tmp_path / "orders_x"))
    assert lake.meta.id_cols == ("uid", "item")
    assert lake.meta.partition_col == "uid"
    assert set(lake.meta.payload_cols) == {"amount", "val"}
    # payload NOT NULL became a precheck descriptor; id-col NOT NULL implied
    assert {"type": "not_null", "col": "val"} in lake.constraints
    assert all(c["col"] != "uid" for c in lake.constraints)
    assert list_tables(root) == ["orders_x"]

    # IF NOT EXISTS is a no-op; plain re-create refuses
    apply_table_ddl(root, "CREATE TABLE IF NOT EXISTS orders_x (a INT, "
                          "PRIMARY KEY (a))")
    assert LakeTable.open(str(tmp_path / "orders_x")).meta.id_cols == \
        ("uid", "item")
    with pytest.raises(DdlError, match="already exists"):
        apply_table_ddl(root, "CREATE TABLE orders_x (a INT, PRIMARY KEY (a))")

    # a PK is mandatory (LWW needs stable id cols) and must name real cols
    with pytest.raises(DdlError, match="PRIMARY KEY"):
        apply_table_ddl(root, "CREATE TABLE t2 (a INT)")
    with pytest.raises(DdlError, match="undefined columns"):
        apply_table_ddl(root, "CREATE TABLE t2 (a INT, PRIMARY KEY (b))")
    # inline single-column PK spelling
    apply_table_ddl(root, "CREATE TABLE t3 (id BIGINT PRIMARY KEY, x TEXT)")
    assert LakeTable.open(str(tmp_path / "t3")).meta.id_cols == ("id",)


@pytest.mark.usefixtures("ray_session")
def test_table_lifecycle_create_replay_rename_drop(tmp_path):
    from ape_dts_ray.stages.ddl import apply_table_ddl, list_tables

    root = str(tmp_path)
    apply_table_ddl(root, "CREATE TABLE live_t (uid VARCHAR, item INT, "
                          "val TEXT, PRIMARY KEY (uid, item))",
                    config=EngineConfig(num_partitions=8, epoch_size=1000))
    events = _mixed_events()
    path = str(tmp_path / "ev.parquet")
    pq.write_table(events, path)
    lake = LakeTable.open(str(tmp_path / "live_t"))
    replay(lake, events_path=path)
    before = lake.state_table().to_pandas()
    assert len(before) > 0

    # RENAME moves the directory and rewrites the persisted meta name
    apply_table_ddl(root, "RENAME TABLE live_t TO live_t2")
    assert list_tables(root) == ["live_t2"]
    lake2 = LakeTable.open(str(tmp_path / "live_t2"))
    assert lake2.meta.name == "live_t2"
    pd.testing.assert_frame_equal(before, lake2.state_table().to_pandas())
    # re-running a COMPLETED rename is refused (the destination is no
    # longer a half-renamed source) — silent absorption would let a typo'd
    # rename report success against an unrelated table
    with pytest.raises(DdlError, match="does not exist"):
        apply_table_ddl(root, "RENAME TABLE live_t TO live_t2")
    # the actual crash window: directory renamed, meta rewrite skipped —
    # re-running the statement finishes the rewrite
    import os as _os
    _os.rename(str(tmp_path / "live_t2"), str(tmp_path / "live_t2b"))
    # simulate: dst exists under the new name but meta still says live_t2
    apply_table_ddl(root, "RENAME TABLE live_t2 TO live_t2b")
    assert LakeTable.open(str(tmp_path / "live_t2b")).meta.name == "live_t2b"
    _os.rename(str(tmp_path / "live_t2b"), str(tmp_path / "live_t2"))
    lk = LakeTable.open(str(tmp_path / "live_t2"))
    from dataclasses import replace as _replace
    lk.meta = _replace(lk.meta, name="live_t2")
    lk._save_table_json()
    # ALTER TABLE ... RENAME TO spelling
    apply_table_ddl(root, "ALTER TABLE live_t2 RENAME TO live_t3")
    assert list_tables(root) == ["live_t3"]

    # DROP removes it; IF EXISTS tolerates a second run
    apply_table_ddl(root, "DROP TABLE live_t3")
    assert list_tables(root) == []
    with pytest.raises(DdlError, match="does not exist"):
        apply_table_ddl(root, "DROP TABLE live_t3")
    apply_table_ddl(root, "DROP TABLE IF EXISTS live_t3")


def test_drop_table_crash_leaves_tombstone_not_half_table(tmp_path,
                                                          monkeypatch):
    """A crash between the tombstone rename and the rmtree must leave a
    ``._dropped`` dir that list_tables hides and the next DROP/CREATE of
    the name sweeps."""
    import shutil as _shutil

    from ape_dts_ray.stages.ddl import apply_table_ddl, list_tables

    root = str(tmp_path)
    apply_table_ddl(root, "CREATE TABLE victim (a INT, PRIMARY KEY (a))")

    def crashing(path, *a, **kw):
        raise RuntimeError("injected crash mid-drop")

    real = _shutil.rmtree
    monkeypatch.setattr(_shutil, "rmtree", crashing)
    with pytest.raises(RuntimeError, match="injected"):
        apply_table_ddl(root, "DROP TABLE victim")
    monkeypatch.setattr(_shutil, "rmtree", real)

    assert (tmp_path / "victim._dropped").is_dir()
    assert list_tables(root) == []               # tombstone hidden
    apply_table_ddl(root, "DROP TABLE IF EXISTS victim")   # sweeps it
    assert not (tmp_path / "victim._dropped").exists()

    # CREATE of the same name also sweeps a leftover tombstone
    apply_table_ddl(root, "CREATE TABLE victim (a INT, PRIMARY KEY (a))")
    monkeypatch.setattr(_shutil, "rmtree", crashing)
    with pytest.raises(RuntimeError):
        apply_table_ddl(root, "DROP TABLE victim")
    monkeypatch.setattr(_shutil, "rmtree", real)
    apply_table_ddl(root, "CREATE TABLE victim (b INT, PRIMARY KEY (b))")
    assert not (tmp_path / "victim._dropped").exists()
    assert LakeTable.open(str(tmp_path / "victim")).meta.id_cols == ("b",)


def test_create_table_mysqldump_shape(tmp_path):
    """Review r3: the table-lifecycle parser must accept the statement shape
    a MySQL CDC source actually emits — table options tail, AUTO_INCREMENT,
    secondary KEY / FK clauses (surfaced as skipped, not silently lost),
    UNIQUE KEY → constraint descriptor, quoted DEFAULTs, ON UPDATE."""
    from ape_dts_ray.stages.ddl import apply_table_ddl, parse_ddl

    sql = """CREATE TABLE `orders` (
      `id` INT UNSIGNED NOT NULL AUTO_INCREMENT,
      `email` VARCHAR(128) UNIQUE,
      `note` TEXT DEFAULT 'no note yet',
      `mtime` TIMESTAMP DEFAULT CURRENT_TIMESTAMP ON UPDATE CURRENT_TIMESTAMP,
      `cust_id` BIGINT NOT NULL,
      PRIMARY KEY (`id`),
      UNIQUE KEY `uk_mail2` (`email`, `cust_id`),
      KEY `idx_cust` (`cust_id`),
      CONSTRAINT `fk_c` FOREIGN KEY (`cust_id`) REFERENCES `customer` (`id`)
    ) ENGINE=InnoDB AUTO_INCREMENT=17 DEFAULT CHARSET=utf8mb4
      COLLATE=utf8mb4_0900_ai_ci COMMENT='order header'"""
    p = parse_ddl(sql)
    assert p.kind == "create_table"
    assert p.extra["id_cols"] == ["id"]
    assert p.extra["auto_increment"] == ["id"]
    assert ["email"] in p.extra["unique"]
    assert ["email", "cust_id"] in p.extra["unique"]
    assert len(p.extra["skipped"]) == 2          # KEY + FK surfaced
    assert dict(p.extra["columns"])["id"] == "int32"
    assert dict(p.extra["columns"])["mtime"] == "timestamp[us]"

    apply_table_ddl(str(tmp_path), sql)
    lake = LakeTable.open(str(tmp_path / "orders"))
    assert {"type": "unique", "cols": ["email", "cust_id"]} in lake.constraints
    assert {"type": "not_null", "col": "cust_id"} in lake.constraints
    assert lake.sequences and lake.sequences[0]["col"] == "id"

    # unknown table options still refuse loudly
    with pytest.raises(UnsupportedDdlError, match="table options"):
        parse_ddl("CREATE TABLE t (a INT, PRIMARY KEY (a)) "
                  "PARTITION BY HASH(a)")


def test_create_table_quoted_literals_and_key_parts(tmp_path):
    """Review r3: quoted DEFAULT/COMMENT values may contain ',' '(' ')';
    unique keys may carry prefix lengths and USING BTREE; the table-option
    AUTO_INCREMENT=N must seed the sequence counter."""
    from ape_dts_ray.stages.ddl import apply_table_ddl, parse_ddl

    p = parse_ddl("CREATE TABLE t (a INT PRIMARY KEY, "
                  "b TEXT DEFAULT 'x)', c TEXT DEFAULT '(', "
                  "d TEXT COMMENT 'order total, cents')")
    assert [c for c, _ in p.extra["columns"]] == ["a", "b", "c", "d"]

    p = parse_ddl("CREATE TABLE u (email VARCHAR(128), cust BIGINT, "
                  "PRIMARY KEY (cust), "
                  "UNIQUE KEY `uk` (`email`(20)) USING BTREE)")
    assert p.extra["unique"] == [["email"]]

    sql = ("CREATE TABLE seq_t (id INT AUTO_INCREMENT, v TEXT, "
           "PRIMARY KEY (id)) ENGINE=InnoDB AUTO_INCREMENT=17")
    assert parse_ddl(sql).extra["auto_increment_start"] == 17
    apply_table_ddl(str(tmp_path), sql)
    lake = LakeTable.open(str(tmp_path / "seq_t"))
    assert lake.sequences[0]["next_value"] == 17


def test_create_table_escapes_pk_prefix_and_comment_autoincrement(tmp_path):
    """Review r3 (2nd pass): '' escapes in COMMENT/DEFAULT literals, prefix
    lengths in PRIMARY KEY, and AUTO_INCREMENT named inside a quoted
    COMMENT must not leak into the table-option counter."""
    from ape_dts_ray.stages.ddl import parse_ddl

    p = parse_ddl("CREATE TABLE t (a INT PRIMARY KEY, "
                  "b TEXT COMMENT 'can''t, retry', "
                  "c TEXT DEFAULT 'it''s fine')")
    assert [c for c, _ in p.extra["columns"]] == ["a", "b", "c"]

    p = parse_ddl("CREATE TABLE t (email VARCHAR(64), "
                  "PRIMARY KEY (email(20)))")
    assert p.extra["id_cols"] == ["email"]

    p = parse_ddl("CREATE TABLE t (id INT AUTO_INCREMENT, PRIMARY KEY (id)) "
                  "COMMENT='migrated, old AUTO_INCREMENT=999'")
    assert p.extra["auto_increment_start"] is None
    p = parse_ddl("CREATE TABLE t (id INT AUTO_INCREMENT, PRIMARY KEY (id)) "
                  "AUTO_INCREMENT=7 COMMENT='x'")
    assert p.extra["auto_increment_start"] == 7
