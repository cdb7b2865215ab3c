"""Redis family: RDB binary codec, RESP protocol, cluster slots, psync-log
replay fold, RDB snapshot roundtrip, RESP/RESTORE sinkers.

Codec vectors are public: CRC-64/REDIS and CRC16/XMODEM check values, the
CLUSTER KEYSLOT examples from the redis docs (also quoted in the reference,
key_parser.rs:168-175)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from ape_dts_ray.sources import rdb as rdbmod
from ape_dts_ray.sources.resp import (calc_slot, calc_slots, crc16,
                                      encode_cmd, encode_cmds, parse_resp)


# ------------------------------------------------------------ pure codec

def test_crc_check_values():
    assert rdbmod.crc64_redis(b"123456789") == 0xE9C6D914C4B8D9CA
    assert crc16(b"123456789") == 0x31C3


def test_cluster_slots():
    # public vectors: redis docs CLUSTER KEYSLOT examples
    assert calc_slot(b"somekey") == 11058
    assert calc_slot(b"foo") == 12182
    assert calc_slot(b"foo{hash_tag}") == calc_slot(b"bar{hash_tag}") == 2515
    # empty hashtag falls back to the whole key
    assert calc_slot(b"foo{}bar") == crc16(b"foo{}bar") & 0x3FFF
    keys = pa.array(["somekey", "foo", "foo{hash_tag}", "bar{hash_tag}",
                     "foo{}bar", "", "x" * 100])
    got = calc_slots(keys)
    want = [calc_slot(k.encode()) for k in keys.to_pylist()]
    assert list(got) == want


def test_lzf_roundtrip():
    rng = np.random.default_rng(11)
    cases = [b"", b"a" * 3000, b"abcabcabc" * 50,
             bytes(rng.integers(0, 256, 400, dtype=np.uint8)),
             bytes(rng.integers(97, 101, 8000, dtype=np.uint8))]
    for data in cases:
        comp = rdbmod.lzf_compress(data)
        if comp is not None:
            assert rdbmod.lzf_decompress(comp, len(data)) == data
    # incompressible input is declined (stored raw by the writer)
    assert rdbmod.lzf_compress(bytes(rng.integers(0, 256, 64, dtype=np.uint8))) is None


def _sample_entries():
    return [
        {"db": 0, "key": b"s_raw", "type": "string",
         "value": b"short", "expire_ms": 0},
        {"db": 0, "key": b"s_lzf", "type": "string",
         "value": b"compress me please " * 40, "expire_ms": 0},
        {"db": 0, "key": b"s_int", "type": "string",
         "value": b"-70000", "expire_ms": 1999999999999},
        {"db": 0, "key": b"s_bin", "type": "string",
         "value": bytes(range(256)), "expire_ms": 0},
        {"db": 0, "key": b"l_lp", "type": "list",
         "elements": [b"a", b"4095", b"-4096", b"128", b"x" * 200], "expire_ms": 0},
        {"db": 0, "key": b"l_zl", "type": "list", "encoding": "ziplist",
         "elements": [b"e", b"12", b"-1", b"40000", b"9999999999"], "expire_ms": 0},
        {"db": 0, "key": b"l_big", "type": "list",
         "elements": [b"%d" % i for i in range(400)], "expire_ms": 0},
        {"db": 0, "key": b"l_plain", "type": "list", "encoding": "plain",
         "elements": [b"p1", b"p2"], "expire_ms": 0},
        {"db": 1, "key": b"set_int", "type": "set",
         "elements": [b"3", b"-40000", b"5000000000"], "expire_ms": 0},
        {"db": 1, "key": b"set_lp", "type": "set",
         "elements": [b"m1", b"m2", b"77"], "expire_ms": 0},
        {"db": 1, "key": b"set_plain", "type": "set", "encoding": "plain",
         "elements": [b"big" * 60, b"z"], "expire_ms": 0},
        {"db": 1, "key": b"z_lp", "type": "zset",
         "zset": [(b"a", 1.5), (b"b", -3.0)], "expire_ms": 0},
        {"db": 1, "key": b"z_zl", "type": "zset", "encoding": "ziplist",
         "zset": [(b"c", 2.0)], "expire_ms": 0},
        {"db": 1, "key": b"z_ascii", "type": "zset", "encoding": "zset",
         "zset": [(b"d", 0.25), (b"e", 7.0)], "expire_ms": 0},
        {"db": 1, "key": b"z_big", "type": "zset",
         "zset": [(b"m%d" % i, i * 0.5) for i in range(300)], "expire_ms": 0},
        {"db": 2, "key": b"h_lp", "type": "hash",
         "fields": [(b"f1", b"v1"), (b"f2", b"123")], "expire_ms": 0},
        {"db": 2, "key": b"h_zl", "type": "hash", "encoding": "ziplist",
         "fields": [(b"f", b"v")], "expire_ms": 0},
        {"db": 2, "key": b"h_big", "type": "hash",
         "fields": [(b"f%d" % i, b"v%d" % i) for i in range(300)], "expire_ms": 0},
        {"db": 2, "key": b"h_ttl", "type": "hash",
         "fields": [(b"f1", b"v1", 1750000000123), (b"f2", b"v2", 0)],
         "expire_ms": 0},
        {"db": 2, "key": b"h_ttl_big", "type": "hash",
         "fields": [(b"f%d" % i, b"v", 1750000000000 + i) for i in range(200)],
         "expire_ms": 0},
    ]


def _norm_fields(fs):
    return sorted((f[0], f[1], f[2] if len(f) == 3 else 0) for f in fs)


def test_rdb_roundtrip_all_encodings():
    entries = _sample_entries()
    img = rdbmod.encode_rdb(entries)
    meta, back = rdbmod.parse_rdb(img)
    assert meta["version"] == "0011"
    assert meta["aux"]["redis-bits"] == "64"
    assert len(back) == len(entries)
    want = {(e["db"], e["key"]): e for e in entries}
    for b in back:
        e = want[(b["db"], b["key"])]
        assert b["type"] == e["type"]
        assert b["expire_ms"] == e["expire_ms"]
        if e["type"] == "string":
            assert b["value"] == e["value"]
        elif e["type"] == "list":
            assert b["elements"] == e["elements"]
        elif e["type"] == "set":
            assert sorted(b["elements"]) == sorted(e["elements"])
        elif e["type"] == "zset":
            assert b["zset"] == e["zset"]
        else:
            assert _norm_fields(b["fields"]) == _norm_fields(e["fields"])


def test_rdb_strings_columnar_byte_equal():
    # the columnar string fast path must be byte-identical to encode_rdb
    # over the equivalent per-entry dicts — every length/int/LZF branch
    rng = np.random.default_rng(7)
    keys, values, freqs = [], [], []
    for i in range(200):
        keys.append(b"k:%d" % i)
        if i % 5 == 0:
            values.append(b"%d" % (rng.integers(-2**40, 2**40)))  # int enc
        elif i % 5 == 1:
            values.append(bytes(rng.integers(97, 123, size=64,
                                             dtype=np.uint8)))    # lzf-eligible
        else:
            values.append(bytes(rng.integers(32, 127,
                                             size=int(rng.integers(0, 40)),
                                             dtype=np.uint8)))
        freqs.append(int(rng.integers(0, 256)) if i % 3 else -1)
    for lzf in (0, 1, 16):
        entries = [{"db": 0, "key": k, "type": "string", "expire_ms": 0,
                    "value": v, **({"freq": f} if f >= 0 else {})}
                   for k, v, f in zip(keys, values, freqs)]
        want = rdbmod.encode_rdb(entries, lzf_sample=lzf)
        got = rdbmod.encode_rdb_strings(keys, values, freqs=freqs,
                                        lzf_sample=lzf)
        assert got == want
    # no-freq form and u8 overflow refusal
    plain = [{"db": 0, "key": k, "type": "string", "expire_ms": 0, "value": v}
             for k, v in zip(keys, values)]
    assert rdbmod.encode_rdb_strings(keys, values) == rdbmod.encode_rdb(plain)
    with pytest.raises(ValueError, match="u8"):
        rdbmod.encode_rdb_strings([b"k"], [b"v"], freqs=[256])
    # mismatched column lengths refuse loudly (a bare zip would silently
    # truncate the shard to a checksum-valid image missing keys)
    with pytest.raises(ValueError, match="length mismatch"):
        rdbmod.encode_rdb_strings([b"a", b"b"], [b"v"])
    with pytest.raises(ValueError, match="length mismatch"):
        rdbmod.encode_rdb_strings([b"a", b"b"], [b"v", b"w"], freqs=[1])


def test_rdb_checksum_detects_corruption():
    img = bytearray(rdbmod.encode_rdb(_sample_entries()[:3]))
    img[30] ^= 0xFF
    with pytest.raises(ValueError, match="checksum|rdb"):
        rdbmod.parse_rdb(bytes(img))


def test_rdb_unknown_type_raises():
    img = bytearray(b"REDIS0011")
    img.append(99)           # not a known type byte or opcode
    with pytest.raises(ValueError, match="unsupported type"):
        rdbmod.parse_rdb(bytes(img), verify_checksum=False)
    # module v1 (6) stays a hard error — no framing to skip by
    # (module2(7) now SKIP-PARSES; see test_round5_ops.py)
    img = bytearray(b"REDIS0011")
    img.append(6)
    rdbmod.write_string(img, b"k", try_int=False)
    with pytest.raises(ValueError, match="module type v1"):
        rdbmod.parse_rdb(bytes(img), verify_checksum=False)


def test_rdb_zipmap_decode():
    # Pre-2.6 zipmap (redis src/zipmap.c): hand-built blob exercising the
    # 1-byte length, the 254+u32le big length, and nonzero free bytes.
    long_v = bytes(range(256)) + b"Z" * 44          # len 300 ≥ 254
    zm = bytearray([2])                             # zmlen: 2 pairs
    zm += bytes([4]) + b"name"
    zm += bytes([5, 2]) + b"alice" + b"\x00\x00"    # vlen=5, free=2 junk
    zm += bytes([3]) + b"big"
    zm += bytes([254]) + (300).to_bytes(4, "little") + bytes([0]) + long_v
    zm.append(0xFF)

    img = bytearray(b"REDIS0003")                   # zipmap-era version
    img.append(rdbmod.RDB_TYPE_HASH_ZIPMAP)
    rdbmod.write_string(img, b"h_zm")
    rdbmod.write_string(img, bytes(zm), try_int=False, lzf_sample=0)
    img.append(0xFF)                                # EOF (pre-0005: no CRC)
    _, back = rdbmod.parse_rdb(bytes(img))
    assert back == [{"db": 0, "key": b"h_zm", "type": "hash", "expire_ms": 0,
                     "fields": [(b"name", b"alice"), (b"big", long_v)]}]


def test_rdb_hash_ttl_pre_ga():
    # 7.4-RC layouts (redis rdb.c): type 22 = no minExpire header, absolute
    # length-encoded per-field ttl; type 23 = listpack triplets, no header.
    img = bytearray(b"REDIS0011")
    img.append(rdbmod.RDB_TYPE_HASH_METADATA_PRE_GA)
    rdbmod.write_string(img, b"h_pre")
    rdbmod.write_length(img, 2)
    rdbmod.write_length(img, 1750000000123)
    rdbmod.write_string(img, b"f1"); rdbmod.write_string(img, b"v1")
    rdbmod.write_length(img, 0)                     # no ttl
    rdbmod.write_string(img, b"f2"); rdbmod.write_string(img, b"v2")

    img.append(rdbmod.RDB_TYPE_HASH_LISTPACK_EX_PRE_GA)
    rdbmod.write_string(img, b"h_pre_lp")
    lp = rdbmod.encode_listpack([b"fa", b"va", b"1750000000456",
                                 b"fb", b"vb", b"0"])
    rdbmod.write_string(img, lp, try_int=False, lzf_sample=0)
    img.append(0xFF)
    img += (0).to_bytes(8, "little")                # zero CRC = unchecked
    _, back = rdbmod.parse_rdb(bytes(img))
    by_key = {e["key"]: e for e in back}
    assert by_key[b"h_pre"]["fields"] == [(b"f1", b"v1", 1750000000123),
                                          (b"f2", b"v2", 0)]
    assert by_key[b"h_pre_lp"]["fields"] == [(b"fa", b"va", 1750000000456),
                                             (b"fb", b"vb", 0)]


def _stream_entry():
    return {"db": 0, "key": b"st", "type": "stream", "expire_ms": 0,
            "entries": [
                (b"1700000000000-0", [(b"a", b"1"), (b"b", b"2")]),
                (b"1700000000000-1", [(b"a", b"3"), (b"b", b"4")]),
                (b"1700000000050-0", [(b"x", b"9")]),
            ],
            "last_id": b"1700000000050-0",
            "groups": [(b"g1", b"1700000000000-1")]}


def test_stream_roundtrip():
    e = _stream_entry()
    _, back = rdbmod.parse_rdb(rdbmod.encode_rdb([e]))
    assert back[0]["entries"] == e["entries"]
    assert back[0]["last_id"] == e["last_id"]
    assert back[0]["groups"] == e["groups"]
    p = rdbmod.parse_dump_value(rdbmod.dump_value(e))
    assert p["entries"] == e["entries"]


def test_dump_restore_payloads():
    for e in _sample_entries()[:6]:
        back = rdbmod.parse_dump_value(rdbmod.dump_value(e))
        assert back["type"] == e["type"]
        if e["type"] == "string":
            assert back["value"] == e["value"]
    # corrupted footer refuses
    payload = bytearray(rdbmod.dump_value(_sample_entries()[0]))
    payload[-1] ^= 1
    with pytest.raises(ValueError, match="CRC"):
        rdbmod.parse_dump_value(bytes(payload))


def test_resp_roundtrip_binary_safe():
    cmds = [[b"SET", b"k\x00", b"\xff\xfe\r\n"], [b"DEL", b"k2"],
            [b"HSET", b"h", b"f", b""]]
    blob = (b"+FULLRESYNC deadbeef 42\r\n" + encode_cmds(cmds)
            + b"\n" + encode_cmd([b"PING"]))
    parsed = parse_resp(blob, base_offset=500)
    assert [a for _, a in parsed] == cmds + [[b"PING"]]
    offs = [o for o, _ in parsed]
    assert offs == sorted(offs) and offs[0] == 500 + 25


# ------------------------------------------------------------ distributed

@pytest.fixture
def redis_dirs(tmp_path):
    return str(tmp_path / "log"), str(tmp_path / "out")


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(batches).combine_chunks() if batches else pa.table({})


def test_replay_fold_and_sinkers(ray_session, redis_dirs):
    from ape_dts_ray.pipelines.redis_replay import (
        read_resp_log, replay_redis, write_resp_log, write_resp_sink)

    log_dir, out_dir = redis_dirs
    write_resp_log([
        [b"SET", b"a", b"1"], [b"SET", b"a", b"2"],
        [b"SET", b"gone", b"x"],
        [b"HSET", b"h", b"f1", b"v1", b"f2", b"v2"],
        [b"RPUSH", b"l", b"x", b"y"],
    ], log_dir, 0)
    write_resp_log([
        [b"DEL", b"gone"],
        [b"HDEL", b"h", b"f2"],
        [b"RPUSH", b"l", b"z"],
        [b"ZADD", b"z", b"1", b"m"], [b"ZADD", b"z", b"5", b"m"],
        [b"SADD", b"s", b"p", b"q"], [b"SREM", b"s", b"p"],
        [b"SET", b"ttl", b"t", b"PXAT", b"9000"],
        [b"PEXPIREAT", b"ttl", b"1234567890123"],
    ], log_dir, 1)

    state = replay_redis(read_resp_log(log_dir), num_partitions=4)
    t = _collect(state)
    d = {(r["key"], r["field"], r["idx"]): r for r in t.to_pylist()}
    assert d[(b"a", None, None)]["value"] == b"2"
    assert (b"gone", None, None) not in d
    assert d[(b"h", b"f1", None)]["value"] == b"v1"
    assert (b"h", b"f2", None) not in d
    assert [d[(b"l", None, i)]["value"] for i in range(3)] == [b"x", b"y", b"z"]
    assert d[(b"z", b"m", None)]["score"] == 5.0
    assert (b"s", b"p", None) not in d and (b"s", b"q", None) in d
    assert d[(b"ttl", None, None)]["expire_ms"] == 1234567890123

    # both sinker methods re-replay to the identical keyspace (idempotent
    # rewrite, exactly the reference's serial_sink/rewrite contract)
    ref = {(r["key"], r["field"], r["idx"]):
           (r["value"], r["score"], r["expire_ms"]) for r in t.to_pylist()}
    for method in ("rewrite", "restore"):
        mdir = out_dir + "_" + method
        lin = _collect(write_resp_sink(state, mdir, num_partitions=4,
                                       method=method))
        assert sum(lin.column("rows").to_pylist()) == t.num_rows
        t2 = _collect(replay_redis(read_resp_log(mdir), num_partitions=4))
        got = {(r["key"], r["field"], r["idx"]):
               (r["value"], r["score"], r["expire_ms"]) for r in t2.to_pylist()}
        assert got == ref, method


def test_rdb_snapshot_roundtrip_distributed(ray_session, redis_dirs):
    import ray

    from ape_dts_ray.pipelines.redis_replay import (
        KEYSPACE_SCHEMA, read_rdb_snapshot, write_rdb_snapshot)

    _, out_dir = redis_dirs
    n = 2000
    rows = pa.table({
        "db": pa.array(np.zeros(n, dtype=np.int32)),
        "key": pa.array([b"k%04d" % i for i in range(n)], type=pa.binary()),
        "rtype": pa.array(["string"] * n),
        "field": pa.nulls(n, pa.binary()),
        "idx": pa.nulls(n, pa.int64()),
        "value": pa.array([b"payload %d " % i + b"z" * (i % 97)
                           for i in range(n)], type=pa.binary()),
        "score": pa.nulls(n, pa.float64()),
        "expire_ms": pa.array(np.zeros(n, dtype=np.int64)),
        "field_ttl_ms": pa.array(np.zeros(n, dtype=np.int64)),
    }, schema=KEYSPACE_SCHEMA)
    ds = ray.data.from_arrow(rows)
    lin = _collect(write_rdb_snapshot(ds, out_dir, num_partitions=8))
    assert sum(lin.column("keys").to_pylist()) == n
    assert len([f for f in os.listdir(out_dir) if f.endswith(".rdb")]) == \
        lin.num_rows
    back = _collect(read_rdb_snapshot(out_dir))
    assert back.num_rows == n
    got = dict(zip(back.column("key").to_pylist(),
                   back.column("value").to_pylist()))
    want = dict(zip(rows.column("key").to_pylist(),
                    rows.column("value").to_pylist()))
    assert got == want


def test_slot_partitioning_matches_cluster(ray_session):
    """Keys land in the partition their CLUSTER KEYSLOT dictates — the
    reshard-faithful RedisParallelizer contract."""
    from ape_dts_ray.pipelines.redis_replay import add_slot_partition

    keys = [b"user:%d" % i for i in range(500)]
    t = pa.table({"key": pa.array(keys, type=pa.binary())})
    out = add_slot_partition(t, 16)
    pids = out.column("part_id").to_pylist()
    assert pids == [calc_slot(k) % 16 for k in keys]


def test_stream_replay_and_sinkers(ray_session, redis_dirs):
    """XADD through the fold, then both sinker methods re-replay streams to
    the identical keyspace (incl. RDB snapshot roundtrip)."""
    from ape_dts_ray.pipelines.redis_replay import (
        read_rdb_snapshot, read_resp_log, replay_redis, write_rdb_snapshot,
        write_resp_log, write_resp_sink)

    log_dir, out_dir = redis_dirs
    write_resp_log([
        [b"XADD", b"st", b"1-0", b"a", b"1", b"b", b"2"],
        [b"XADD", b"st", b"1-1", b"a", b"3", b"b", b"4"],
        [b"XADD", b"st", b"2-0", b"x", b"9"],
        [b"XSETID", b"st", b"2-0"],
        [b"XGROUP", b"CREATE", b"st", b"g", b"1-1"],
        [b"SET", b"plain", b"v"],
    ], log_dir, 0)
    state = replay_redis(read_resp_log(log_dir), num_partitions=4)
    t = _collect(state)
    rows = {(r["key"], r["field"]): r["value"] for r in t.to_pylist()}
    assert rows[(b"st", b"1-0:a")] == b"1"
    assert rows[(b"st", b"2-0:x")] == b"9"
    assert rows[(b"plain", None)] == b"v"

    for method in ("rewrite", "restore"):
        mdir = out_dir + "_stream_" + method
        _collect(write_resp_sink(state, mdir, num_partitions=4, method=method))
        t2 = _collect(replay_redis(read_resp_log(mdir), num_partitions=4))
        got = {(r["key"], r["field"]): r["value"] for r in t2.to_pylist()}
        assert got == rows, method

    rdb_dir = out_dir + "_stream_rdb"
    _collect(write_rdb_snapshot(state, rdb_dir, num_partitions=4))
    t3 = _collect(read_rdb_snapshot(rdb_dir))
    got = {(r["key"], r["field"]): r["value"] for r in t3.to_pylist()}
    assert got == rows


def test_restore_replaces_whole_key(ray_session):
    """RESTORE has REPLACE semantics — it never merges with earlier content
    (real Redis errors BUSYKEY without REPLACE and replaces with it)."""
    from ape_dts_ray.pipelines.redis_replay import (commands_to_events,
                                                    fold_events)
    from ape_dts_ray.sources.rdb import dump_value
    from ape_dts_ray.sources.resp import encode_cmds, parse_resp

    payload = dump_value({"db": 0, "key": b"", "type": "list",
                          "elements": [b"x", b"y"], "expire_ms": 0})
    cmds = [[b"RPUSH", b"l", b"a"],
            [b"RESTORE", b"l", b"0", payload, b"REPLACE"]]
    ev = commands_to_events(parse_resp(encode_cmds(cmds)))
    out = fold_events(ev).to_pylist()
    assert [(r["idx"], r["value"]) for r in out] == [(0, b"x"), (1, b"y")]

    # relative (non-ABSTTL) ttl is refused — no wall clock in the engine
    import pytest as _pytest
    with _pytest.raises(ValueError, match="ABSTTL"):
        commands_to_events(parse_resp(encode_cmds(
            [[b"RESTORE", b"k", b"5000", payload, b"REPLACE"]])))
    # ABSTTL accepted and attached
    ev2 = commands_to_events(parse_resp(encode_cmds(
        [[b"RESTORE", b"k", b"1234567890123", payload, b"REPLACE",
          b"ABSTTL"]])))
    rows = fold_events(ev2).to_pylist()
    assert all(r["expire_ms"] == 1234567890123 for r in rows)


def test_precheck_and_reshard(ray_session, tmp_path):
    from ape_dts_ray.pipelines.redis_replay import (precheck_redis,
                                                    read_rdb_snapshot,
                                                    replay_redis, reshard_rdb,
                                                    read_resp_log,
                                                    write_rdb_snapshot,
                                                    write_resp_log)

    log_dir = str(tmp_path / "log")
    write_resp_log([[b"SET", b"k%d" % i, b"v%d" % i] for i in range(300)],
                   log_dir, 0)
    write_resp_log([[b"SET", b"x", b"y"]], log_dir, 1)
    state = replay_redis(read_resp_log(log_dir), num_partitions=4)

    rdb_dir = str(tmp_path / "rdb")
    _collect(write_rdb_snapshot(state, rdb_dir, num_partitions=4))

    rep = precheck_redis(rdb_dir=rdb_dir, resp_dir=log_dir)
    assert rep["rdb_files"] == 4 and rep["resp_files"] == 2

    # aggregate-and-abort on bad magic + a gap in the resp sequence
    (tmp_path / "rdb" / "rdb_part_00099.rdb").write_bytes(b"NOTRDB" + b"\0" * 8)
    os.rename(os.path.join(log_dir, "aof_000001.resp"),
              os.path.join(log_dir, "aof_000005.resp"))
    with pytest.raises(ValueError) as e:
        precheck_redis(rdb_dir=rdb_dir, resp_dir=log_dir)
    assert "bad RDB magic" in str(e.value) and "gaps" in str(e.value)
    (tmp_path / "rdb" / "rdb_part_00099.rdb").unlink()

    # reshard 4 -> 8: same keyspace, different shard layout
    out_dir = str(tmp_path / "rdb8")
    lin = _collect(reshard_rdb(rdb_dir, out_dir, num_partitions=8))
    assert lin.num_rows == 8
    a = _collect(read_rdb_snapshot(rdb_dir))
    b = _collect(read_rdb_snapshot(out_dir))
    ka = sorted(zip(a.column("key").to_pylist(), a.column("value").to_pylist()))
    kb = sorted(zip(b.column("key").to_pylist(), b.column("value").to_pylist()))
    assert ka == kb


def test_hash_field_ttls_end_to_end():
    """Per-field hash TTLs (HPEXPIREAT / RDB TTL containers, types 22-25)
    survive every hop: parse → fold (HSET-overwrite clears), keyspace ↔
    entries assembly, RDB encode/parse, and both sinkers' streams replay to
    the identical fold. Regression for the reshard path silently dropping
    field TTLs (entries carried 3-tuples the keyspace schema couldn't)."""
    from ape_dts_ray.pipelines.redis_replay import (
        _entries_table, _keyspace_to_entries, _restore_cmds, _rewrite_cmds,
        commands_to_events, fold_events)
    from ape_dts_ray.sources import rdb as rdbmod
    from ape_dts_ray.sources.resp import encode_cmd, parse_resp

    cmds = [
        (0, [b"HSET", b"h", b"f1", b"v1", b"f2", b"v2"]),
        (20, [b"HPEXPIREAT", b"h", b"1700000000000",
              b"FIELDS", b"2", b"f1", b"f2"]),
        (40, [b"HSET", b"h", b"f2", b"v2b"]),   # overwrite clears f2's TTL
    ]
    by = {r["field"]: r
          for r in fold_events(commands_to_events(cmds)).to_pylist()}
    assert by[b"f1"]["field_ttl_ms"] == 1700000000000
    assert by[b"f2"]["field_ttl_ms"] == 0 and by[b"f2"]["value"] == b"v2b"

    entry = {"db": 0, "key": b"th", "type": "hash", "expire_ms": 0,
             "fields": [(b"a", b"1", 1700000000001), (b"b", b"2", 0)]}
    back = _keyspace_to_entries(_entries_table([entry]))
    assert back[0]["fields"] == [(b"a", b"1", 1700000000001), (b"b", b"2", 0)]
    _, dec = rdbmod.parse_rdb(rdbmod.encode_rdb(back))
    fs = {f[0]: f for f in dec[0]["fields"]}
    assert fs[b"a"][2] == 1700000000001
    assert len(fs[b"b"]) == 2 or not fs[b"b"][2]

    for to_cmds in (_rewrite_cmds, _restore_cmds):
        raw = b"".join(encode_cmd(c) for c in to_cmds(back))
        ks = {r["field"]: r["field_ttl_ms"]
              for r in fold_events(commands_to_events(parse_resp(raw)))
              .to_pylist()}
        assert ks == {b"a": 1700000000001, b"b": 0}, (to_cmds.__name__, ks)


def test_resp_truncation_vs_corruption():
    """parse_resp distinguishes a cut/torn tail (tolerate_truncation returns
    the complete frames; strict mode raises 'truncated') from corruption
    (raises in both modes) — and precheck accepts a head sample cut at ANY
    byte, including inside a '*'-containing argument."""
    import pytest

    from ape_dts_ray.sources.resp import encode_cmd, parse_resp

    f1 = encode_cmd([b"SET", b"key*1", b"value"])
    f2 = encode_cmd([b"GET", b"key*1"])
    data = f1 + f2
    for cut in range(len(data) + 1):
        got = parse_resp(data[:cut], tolerate_truncation=True)
        assert len(got) == (2 if cut == len(data)
                            else 1 if cut >= len(f1) else 0)
    with pytest.raises(ValueError, match="truncated"):
        parse_resp(data[:-3])
    bad = data[:5] + b"Z" + data[6:]
    for tol in (False, True):
        with pytest.raises(ValueError):
            parse_resp(bad, tolerate_truncation=tol)


def test_precheck_star_in_payload(tmp_path):
    from ape_dts_ray.pipelines.redis_replay import (precheck_redis,
                                                    write_resp_log)

    d = str(tmp_path / "resp")
    write_resp_log([[b"SET", b"key*1", b"value*2"]], d)
    assert precheck_redis(resp_dir=d)["resp_files"] == 1


def test_calc_slots_sliced_arrays():
    """Sliced (non-zero-offset) Arrow arrays must slot by their own rows,
    not the parent buffer's first rows (regression: np.frombuffer ignored
    arr.offset, mis-partitioning every key in a sliced block)."""
    import pyarrow as pa

    from ape_dts_ray.sources.resp import calc_slot, calc_slots

    a = pa.array([b"a", b"bb", b"ccc", b"dddd", b"foo{tag}bar"])
    assert list(calc_slots(a.slice(2))) == [
        calc_slot(b"ccc"), calc_slot(b"dddd"), calc_slot(b"foo{tag}bar")]
    c = pa.chunked_array([a.slice(1, 2), a.slice(4)])
    assert list(calc_slots(c)) == [
        calc_slot(b"bb"), calc_slot(b"ccc"), calc_slot(b"foo{tag}bar")]


# ---------------- incremental keyspace store (psync committed-offset) -------

def _sorted_rows(t: pa.Table):
    return sorted((r["db"], r["key"], r["rtype"], r["field"], r["idx"],
                   r["value"], r["score"], r["expire_ms"], r["field_ttl_ms"])
                  for r in t.to_pylist())


def _gen_cmd_stream(seed=29, n=600):
    """Seeded mixed-type command stream exercising every fold rule across
    segment boundaries: barriers (SET/DEL over containers), field-level LWW,
    list appends, key TTLs (+ SET clearing them), hash-field TTLs."""
    import numpy as np

    rng = np.random.default_rng(seed)
    cmds = []
    for i in range(n):
        k = f"k{rng.integers(0, 25)}".encode()
        roll = rng.random()
        if roll < 0.18:
            cmds.append([b"SET", k, b"s%d" % i])
        elif roll < 0.24:
            cmds.append([b"DEL", k])
        elif roll < 0.42:
            cmds.append([b"HSET", k, b"f%d" % rng.integers(0, 6), b"h%d" % i])
        elif roll < 0.50:
            cmds.append([b"HDEL", k, b"f%d" % rng.integers(0, 6)])
        elif roll < 0.60:
            cmds.append([b"ZADD", k, b"%d" % rng.integers(0, 50),
                         b"m%d" % rng.integers(0, 5)])
        elif roll < 0.68:
            cmds.append([b"SADD", k, b"e%d" % rng.integers(0, 8)])
        elif roll < 0.74:
            cmds.append([b"SREM", k, b"e%d" % rng.integers(0, 8)])
        elif roll < 0.86:
            cmds.append([b"RPUSH", k, b"x%d" % i])
        elif roll < 0.93:
            cmds.append([b"PEXPIREAT", k, b"%d" % (1_700_000_000_000 + i)])
        else:
            cmds.append([b"HPEXPIREAT", k, b"%d" % (1_800_000_000_000 + i),
                         b"FIELDS", b"1", b"f%d" % rng.integers(0, 6)])
    return cmds


def test_incremental_ingest_equals_one_shot_fold(ray_session, tmp_path):
    from ape_dts_ray.pipelines.redis_replay import (
        RedisKeyspaceStore, read_resp_log, replay_redis, write_resp_log)

    cmds = _gen_cmd_stream()
    log_dir = str(tmp_path / "log")
    # 4 segments of very different sizes (incl. a tiny one)
    cuts = [0, 50, 51, 400, len(cmds)]
    for seq in range(4):
        write_resp_log(cmds[cuts[seq]:cuts[seq + 1]], log_dir, seq)

    oneshot = _collect(replay_redis(read_resp_log(log_dir),
                                    num_partitions=4))

    store = RedisKeyspaceStore.create(str(tmp_path / "store"),
                                      num_partitions=4)
    # ingest in three calls: [file0], [file1, file2], [file3]
    seg = str(tmp_path / "seg")
    import shutil as _sh
    os.makedirs(seg)
    for group in ([0], [1, 2], [3]):
        for s in group:
            _sh.copy(os.path.join(log_dir, f"aof_{s:06d}.resp"), seg)
        r = store.ingest(seg)
        assert r["files"] == len(group)
    assert _sorted_rows(store.keyspace_table()) == _sorted_rows(oneshot)

    # watermark advanced; re-ingest of the same log is a no-op
    assert store.watermark()["next_file_seq"] == 4
    assert store.ingest(seg) == {"files": 0, "partitions": []}
    assert _sorted_rows(store.keyspace_table()) == _sorted_rows(oneshot)

    # a gap after the watermark refuses loudly
    write_resp_log([[b"SET", b"late", b"x"]], seg, 6)   # seq 5 missing
    with pytest.raises(ValueError, match="gap"):
        store.ingest(seg)


def test_incremental_ingest_crash_resume(ray_session, tmp_path):
    from ape_dts_ray.pipelines.redis_replay import (RedisKeyspaceStore,
                                                    write_resp_log)

    cmds = _gen_cmd_stream(seed=31, n=400)
    log_dir = str(tmp_path / "log")
    write_resp_log(cmds[:250], log_dir, 0)
    store = RedisKeyspaceStore.create(str(tmp_path / "store"),
                                      num_partitions=4)
    store.ingest(log_dir)
    wm1 = store.watermark()
    clean = RedisKeyspaceStore.create(str(tmp_path / "clean"),
                                      num_partitions=4)

    write_resp_log(cmds[250:], log_dir, 1)
    with pytest.raises(Exception, match="injected ingest crash"):
        store.ingest(log_dir, fail_before_commit=True)
    # crash left the OLD generation live: watermark unmoved, state readable
    assert store.watermark() == wm1
    store.keyspace_table()

    r = store.ingest(log_dir)                 # resume rebuilds the new gen
    assert r["files"] == 1
    clean.ingest(log_dir)
    assert _sorted_rows(store.keyspace_table()) == \
        _sorted_rows(clean.keyspace_table())
    # exactly one generation dir remains (old one swept after commit)
    import glob as _glob
    assert len(_glob.glob(str(tmp_path / "store" / "gen-*"))) == 1


def test_incremental_untouched_partition_copy_forward(ray_session, tmp_path):
    """A second segment touching ONE key must not re-fold (or lose) the
    other partitions — they are carried forward file-for-file."""
    from ape_dts_ray.pipelines.redis_replay import (RedisKeyspaceStore,
                                                    write_resp_log)
    from ape_dts_ray.sources.resp import calc_slot

    log_dir = str(tmp_path / "log")
    keys = [b"alpha", b"beta", b"gamma", b"delta", b"epsilon"]
    write_resp_log([[b"SET", k, b"v-" + k] for k in keys], log_dir, 0)
    store = RedisKeyspaceStore.create(str(tmp_path / "store"),
                                      num_partitions=8)
    store.ingest(log_dir)
    before = {r["key"]: r["value"]
              for r in store.keyspace_table().to_pylist()}
    assert before == {k: b"v-" + k for k in keys}

    write_resp_log([[b"SET", b"alpha", b"updated"]], log_dir, 1)
    store.ingest(log_dir)
    after = {r["key"]: r["value"]
             for r in store.keyspace_table().to_pylist()}
    assert after[b"alpha"] == b"updated"
    for k in keys[1:]:
        assert after[k] == b"v-" + k


def test_incremental_preserves_streams_and_refuses_missing_dir(ray_session,
                                                               tmp_path):
    """Review r3: stream rows (rtype='stream', composite <id>:<name>
    fields) must survive an incremental re-fold of their partition, and
    ingest on a nonexistent log dir must refuse rather than report
    caught-up."""
    from ape_dts_ray.pipelines.redis_replay import (RedisKeyspaceStore,
                                                    write_resp_log)

    log_dir = str(tmp_path / "log")
    write_resp_log([
        [b"XADD", b"st", b"1-1", b"temp", b"20"],
        [b"XADD", b"st", b"1-2", b"temp", b"21"],
        [b"SET", b"other", b"x"],
    ], log_dir, 0)
    store = RedisKeyspaceStore.create(str(tmp_path / "store"),
                                      num_partitions=1)   # same partition —
    store.ingest(log_dir)                                 # re-fold touches it
    write_resp_log([[b"SET", b"other", b"y"],
                    [b"XADD", b"st", b"2-1", b"temp", b"22"]], log_dir, 1)
    store.ingest(log_dir)
    rows = {(r["key"], r["field"]): r["value"]
            for r in store.keyspace_table().to_pylist()}
    assert rows[(b"st", b"1-1:temp")] == b"20"     # survived the re-fold
    assert rows[(b"st", b"1-2:temp")] == b"21"
    assert rows[(b"st", b"2-1:temp")] == b"22"
    assert rows[(b"other", None)] == b"y"

    with pytest.raises(FileNotFoundError, match="does not exist"):
        store.ingest(str(tmp_path / "no_such_dir"))


def test_resp_sink_preserves_databases(ray_session, tmp_path):
    """Review r3: the RESP sinkers emitted no SELECT frames, so a multi-db
    keyspace collapsed into db 0 on re-replay — colliding the SAME key
    living in two databases. Each partition file now opens every db group
    with an explicit SELECT (the AOF-rewrite convention)."""
    import ray.data as rd

    from ape_dts_ray.pipelines.redis_replay import (
        KEYSPACE_SCHEMA, read_resp_log, replay_redis, write_resp_sink)

    ks = pa.table({
        "db": pa.array([0, 2, 2], pa.int32()),
        "key": pa.array([b"dup", b"dup", b"only2"], pa.binary()),
        "rtype": ["string", "string", "string"],
        "field": pa.array([None, None, None], pa.binary()),
        "idx": pa.array([None, None, None], pa.int64()),
        "value": pa.array([b"v0", b"v2", b"x"], pa.binary()),
        "score": pa.array([None, None, None], pa.float64()),
        "expire_ms": pa.array([0, 0, 0], pa.int64()),
        "field_ttl_ms": pa.array([0, 0, 0], pa.int64()),
    }, schema=KEYSPACE_SCHEMA)

    for method in ("rewrite", "restore"):
        out = str(tmp_path / f"sink_{method}")
        _collect(write_resp_sink(rd.from_arrow(ks), out, num_partitions=2,
                                 method=method))
        back = _collect(replay_redis(read_resp_log(out), num_partitions=2))
        got = {(r["db"], r["key"]): r["value"] for r in back.to_pylist()}
        assert got == {(0, b"dup"): b"v0", (2, b"dup"): b"v2",
                       (2, b"only2"): b"x"}, method
