"""Redis snapshot + psync-stream replication, Ray-Data-native.

Reference surface being re-expressed (SURVEY §2 Redis family):
- RedisPsyncExtractor / RedisSnapshotFileExtractor
  (dt-connector/src/extractor/redis/redis_psync_extractor.rs:48-142,
  redis_snapshot_file_extractor.rs): here the snapshot is a set of RDB shard
  files and the replication stream is a set of RESP log files — the byte
  position of a command is its replication offset, with a per-file stride
  preserving total order across files (the psync offset semantics without a
  live socket, which this environment cannot have).
- RedisParallelizer (dt-parallelizer/src/redis_parallelizer.rs): keyed
  parallelism — every command for one key lands in one partition. We use the
  REAL cluster mapping (CRC16 key slot % P, key_parser.rs:164-210) so the
  partitioning is exactly a Redis Cluster reshard.
- RedisSinker (dt-connector/src/sinker/redis/redis_sinker.rs,
  entry_rewriter.rs): ``write_resp_sink`` re-emits the keyspace as RESP
  command files — ``rewrite`` method (SET/HSET/SADD/ZADD/RPUSH + PEXPIREAT)
  or ``restore`` method (DUMP payloads built by sources/rdb.py, CRC-64
  footers included).

Keyspace model — the schema shared by the RDB snapshot reader and the
command-stream fold (one row per element):
    db int32 | key binary | rtype str | field binary | idx int64 |
    value binary | score float64 | expire_ms int64 | field_ttl_ms int64

Fold semantics (vectorized polars per partition, no Python row loops):
  * SET/DEL are key-level: the last key-level event is a barrier K; a SET
    winner yields a string row, a DEL winner leaves the key dead.
  * HSET/HDEL/SADD/SREM/ZADD/ZREM are field-level LWW per (db,key,field),
    counted only after K (Redis: SET/DEL destroy the whole container).
  * RPUSH is append-only after K, ordered by (offset, arg-seq).
  * PEXPIREAT/EXPIRE attach the last TTL to the key's surviving rows.
    TTL *eviction* is not simulated — the engine is deterministic and has no
    wall clock; expiry is data, like the reference's PEXPIREAT passthrough.
  * HPEXPIREAT attaches per-field hash TTLs (``field_ttl_ms``); an HSET
    overwriting the field clears its TTL (Redis 7.4 semantics). RDB TTL-hash
    containers (types 22-25) carry the same column through snapshot reads,
    reshard and both sinkers (HPEXPIREAT / TTL-container dumps).

Scale shape: RESP/RDB files are the parallel read unit (one parse task per
file — byte-stream formats are inherently sequential per file, exactly like
the reference's single psync socket, but we get file-level parallelism it
doesn't have). The only shuffle is the slot partition; the fold is per-group
polars. At 100 TB, files are the resume/retry unit and slots bound skew to
1/16384 of the keyspace.
"""

from __future__ import annotations

import os
import re
import time

import numpy as np
import pyarrow as pa

from ape_dts_ray.sources import rdb as rdbmod
import pyarrow.compute as pc

from ape_dts_ray.sources.resp import (calc_slots, encode_cmd, parse_resp,
                                      scan_resp)

RESP_FILE_STRIDE = 1 << 40      # per-file offset namespace (total order)
_SCAN_MAX_BYTES = 1 << 31       # columnar-scan ceiling: pa.binary() offsets
                                # and position gathers are int32 — larger
                                # buffers route to the scalar walker
COL_SLOT_PART = "part_id"

KEYSPACE_SCHEMA = pa.schema([
    ("db", pa.int32()),
    ("key", pa.binary()),
    ("rtype", pa.string()),
    ("field", pa.binary()),
    ("idx", pa.int64()),
    ("value", pa.binary()),
    ("score", pa.float64()),
    ("expire_ms", pa.int64()),
    ("field_ttl_ms", pa.int64()),   # per-field hash TTL (RDB types 22-25,
])                                  # HEXPIRE family); 0 = none

_EVENT_SCHEMA = pa.schema([
    ("db", pa.int32()),
    ("key", pa.binary()),
    ("level", pa.string()),      # key | field | list | expire | fexpire
    ("rtype", pa.string()),
    ("op", pa.string()),         # set | del | add | rem | push | expire
    ("field", pa.binary()),
    ("value", pa.binary()),
    ("score", pa.float64()),
    ("log_offset", pa.int64()),
    ("seq", pa.int32()),
])


# ------------------------------------------------------------ RESP log I/O

def write_resp_log(cmds: list[list[bytes]], log_dir: str,
                   file_seq: int = 0) -> str:
    """Append one RESP log file holding ``cmds`` (driver/test helper — the
    distributed generator in queries.py encodes inside map_batches)."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"aof_{file_seq:06d}.resp")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        for c in cmds:
            f.write(encode_cmd(c))
    os.replace(tmp, path)
    return path


def _file_seq(path: str) -> int:
    base = os.path.basename(path)
    return int(base.split("_")[1].split(".")[0])


def _strict_f64(b: bytes) -> float:
    """Numeric arg parse with EXACT parity to scan_to_events' Arrow cast
    chain (binary → string → float64): both event derivations must
    accept/reject identical byte forms (the event-multiset-equality
    contract) — Python float() is laxer (b"1_0" → 10.0, leading '+',
    surrounding whitespace) and would make only one side raise."""
    return pc.cast(pa.array([b], pa.binary()).cast(pa.string()),
                   pa.float64())[0].as_py()


def _strict_ms(b: bytes) -> float:
    """Millisecond arg parse — parity with the fast path's
    binary → string → int64 → float64 chain."""
    return pc.cast(pc.cast(pa.array([b], pa.binary()).cast(pa.string()),
                           pa.int64()), pa.float64())[0].as_py()


# minimum argc per command — a shorter command is a corrupt/truncated log
# and refuses with context instead of a bare IndexError; real Redis rejects
# all of these with arity errors. scan_to_events routes under-arity fast
# commands here so both derivations raise identically.
_MIN_ARITY = {b"SELECT": 2, b"SET": 3, b"DEL": 2, b"UNLINK": 2,
              b"HSET": 4, b"HMSET": 4, b"HDEL": 3, b"SADD": 3, b"SREM": 3,
              b"ZADD": 4, b"ZREM": 3, b"RPUSH": 3, b"PEXPIREAT": 3,
              b"HPEXPIREAT": 6, b"XADD": 5, b"RESTORE": 4}

_XADD_ID_RE = re.compile(rb"^\d+(-\d+)?$")


def commands_to_events(cmds_with_offsets, db: int = 0) -> pa.Table:
    """Expand parsed commands into columnar element events. The per-command
    loop is the sequential tail of the per-file parse task (same unit as the
    RESP byte walk itself); everything downstream is columnar."""
    cols = {name: [] for name in _EVENT_SCHEMA.names}

    def emit(key, level, rtype, op, field=None, value=None, score=None,
             off=0, seq=0):
        cols["db"].append(db)
        cols["key"].append(key)
        cols["level"].append(level)
        cols["rtype"].append(rtype)
        cols["op"].append(op)
        cols["field"].append(field)
        cols["value"].append(value)
        cols["score"].append(score)
        cols["log_offset"].append(off)
        cols["seq"].append(seq)

    for off, args in cmds_with_offsets:
        if not args:
            continue
        cmd = args[0].upper()
        if cmd in (b"PING", b"REPLCONF", b"MULTI", b"EXEC"):
            continue
        need = _MIN_ARITY.get(cmd)
        if need is not None and len(args) < need:
            raise ValueError(
                f"redis replay: {cmd.decode(errors='replace')} needs >= "
                f"{need} args, got {len(args)} (offset {off}) — truncated "
                "or corrupt log")
        if cmd == b"SELECT":
            db = int(args[1])
            continue
        if cmd == b"SET":
            emit(args[1], "key", "string", "set", value=args[2], off=off)
            # Redis itself rewrites relative TTLs (EX/PX) to absolute PXAT
            # when propagating to AOF/replicas — exactly because relative
            # TTLs are non-deterministic on replay. We accept what a real
            # replication stream carries and refuse the rest: EX/PX/EXAT
            # need a wall clock, NX/XX/GET are conditional on live state.
            i = 3
            while i < len(args):
                o = args[i].upper()
                if o == b"PXAT":
                    if i + 1 >= len(args):
                        raise ValueError(
                            f"redis replay: SET PXAT missing its deadline "
                            f"(offset {off}) — truncated or corrupt log")
                    # strict ms parse, same chain as PEXPIREAT — the lax
                    # float(int(...)) accepted byte forms (b' 123 ') the
                    # documented parity contract refuses
                    emit(args[1], "expire", "key", "expire",
                         score=_strict_ms(args[i + 1]), off=off)
                    i += 2
                elif o == b"KEEPTTL":
                    # fold clears TTLs older than the SET barrier; KEEPTTL
                    # would need the opposite — refuse rather than mis-fold
                    raise ValueError("redis replay: SET KEEPTTL unsupported "
                                     "(TTL-clearing fold)")
                elif o in (b"EX", b"PX", b"EXAT"):
                    raise ValueError(f"redis replay: SET {o.decode()} is "
                                     "non-deterministic; AOF-style logs "
                                     "carry PXAT")
                elif o in (b"NX", b"XX", b"GET"):
                    raise ValueError(f"redis replay: SET {o.decode()} is "
                                     "conditional on live state")
                else:
                    raise ValueError(f"redis replay: SET flag {o!r}")
        elif cmd in (b"DEL", b"UNLINK"):
            for k in args[1:]:
                emit(k, "key", "key", "del", off=off)
        elif cmd == b"HSET" or cmd == b"HMSET":
            if (len(args) - 2) % 2:
                raise ValueError(
                    f"redis replay: {cmd.decode()} has an unpaired trailing "
                    f"argument (offset {off}) — Redis rejects the whole "
                    "command; refusing instead of half-applying it")
            for s, i in enumerate(range(2, len(args) - 1, 2)):
                emit(args[1], "field", "hash", "add", field=args[i],
                     value=args[i + 1], off=off, seq=s)
        elif cmd == b"HDEL":
            for s, f in enumerate(args[2:]):
                emit(args[1], "field", "hash", "rem", field=f, off=off, seq=s)
        elif cmd == b"SADD":
            for s, m in enumerate(args[2:]):
                emit(args[1], "field", "set", "add", field=m, off=off, seq=s)
        elif cmd == b"SREM":
            for s, m in enumerate(args[2:]):
                emit(args[1], "field", "set", "rem", field=m, off=off, seq=s)
        elif cmd == b"ZADD":
            if (len(args) - 2) % 2:
                raise ValueError(
                    f"redis replay: ZADD has an unpaired trailing argument "
                    f"(offset {off}) — Redis rejects the whole command")
            for s, i in enumerate(range(2, len(args) - 1, 2)):
                emit(args[1], "field", "zset", "add", field=args[i + 1],
                     score=_strict_f64(args[i]), off=off, seq=s)
        elif cmd == b"ZREM":
            for s, m in enumerate(args[2:]):
                emit(args[1], "field", "zset", "rem", field=m, off=off, seq=s)
        elif cmd == b"RPUSH":
            for s, v in enumerate(args[2:]):
                emit(args[1], "list", "list", "push", value=v, off=off, seq=s)
        elif cmd == b"PEXPIREAT":
            if len(args) > 3:
                # NX/XX/GT/LT are conditional on live TTL state (same
                # refusal class as SET NX/XX); anything else real Redis
                # rejects outright — silently applying the deadline
                # unconditionally diverged from both
                o = args[3].upper()
                if o in (b"NX", b"XX", b"GT", b"LT"):
                    raise ValueError(
                        f"redis replay: PEXPIREAT {o.decode()} is "
                        "conditional on live state")
                raise ValueError(
                    f"redis replay: PEXPIREAT unexpected argument "
                    f"{args[3]!r} (offset {off})")
            emit(args[1], "expire", "key", "expire",
                 score=_strict_ms(args[2]), off=off)
        elif cmd == b"HPEXPIREAT":
            # HPEXPIREAT key unix-ms FIELDS n f1 .. fn — the absolute form
            # Redis propagates for every hash-field TTL variant (HEXPIRE
            # etc. are relative → refused by the generic unknown branch)
            if len(args) < 6 or args[3].upper() != b"FIELDS":
                raise ValueError("redis replay: HPEXPIREAT requires "
                                 "'FIELDS n f1 ... fn'")
            try:
                nf = int(args[4])
            except ValueError:
                raise ValueError(
                    f"redis replay: HPEXPIREAT field count {args[4]!r} is "
                    f"not a number (offset {off})") from None
            flds = args[5:5 + nf]
            if len(flds) != nf or len(args) != 5 + nf:
                raise ValueError("redis replay: HPEXPIREAT field count "
                                 "mismatch")
            for s, f in enumerate(flds):
                emit(args[1], "fexpire", "hash", "expire", field=f,
                     score=_strict_ms(args[2]), off=off, seq=s)
        elif cmd == b"XADD":
            # skip the trim/option tokens Redis propagates ahead of the id
            # (XADD key [NOMKSTREAM] [MAXLEN|MINID [~|=] n [LIMIT m]] id ...)
            # — treating args[2] as the id silently turned 'MAXLEN' into a
            # stream id and the real id into a field value
            i = 2
            while i < len(args):
                o = args[i].upper()
                if o == b"NOMKSTREAM":
                    i += 1
                elif o in (b"MAXLEN", b"MINID"):
                    i += 2 if (i + 1 < len(args)
                               and args[i + 1] in (b"~", b"=")) else 1
                    i += 1                        # the threshold value
                elif o == b"LIMIT":
                    i += 2
                else:
                    break
            if i >= len(args):
                raise ValueError("redis replay: XADD missing stream id "
                                 f"(offset {off})")
            eid = args[i]
            if eid == b"*" or eid.endswith(b"-*"):
                raise ValueError("redis replay: XADD with an auto id is "
                                 "non-deterministic; logs must carry "
                                 "explicit stream ids")
            if not _XADD_ID_RE.match(eid):
                raise ValueError(f"redis replay: XADD id {eid!r} is not "
                                 f"'<ms>[-<seq>]' (offset {off})")
            rest = args[i + 1:]
            if not rest or len(rest) % 2:
                raise ValueError(
                    f"redis replay: XADD field/value arity (offset {off}) — "
                    "Redis rejects the whole command")
            for s, j in enumerate(range(0, len(rest) - 1, 2)):
                emit(args[1], "field", "stream", "add",
                     field=eid + b":" + rest[j], value=rest[j + 1],
                     off=off, seq=s)
        elif cmd in (b"XSETID", b"XGROUP"):
            continue    # metadata; the sink re-derives last_id from max id
        elif cmd == b"RESTORE":
            entry = rdbmod.parse_dump_value(args[3])
            entry["key"] = args[1]
            try:
                ttl = int(args[2])
            except ValueError:
                raise ValueError(
                    f"redis replay: RESTORE ttl {args[2]!r} is not a "
                    f"number (offset {off})") from None
            absttl = any(a.upper() == b"ABSTTL" for a in args[4:])
            if ttl and not absttl:
                # a relative TTL needs a wall clock to become a deadline —
                # this engine is deterministic, so only ABSTTL is honest
                # (the sinker always emits ABSTTL)
                raise ValueError("redis replay: RESTORE with a relative ttl "
                                 "is non-deterministic; use ABSTTL")
            # RESTORE replaces the whole key (REPLACE semantics; plain
            # RESTORE on a live key errors in Redis — it never merges):
            # a key-level barrier at off kills earlier content, the restored
            # rows land at off+1 (> barrier; commands are >14 bytes apart so
            # off+1 never collides with the next command's offset)
            emit(args[1], "key", "key", "del", off=off)
            t = _entries_table([{**entry, "db": db, "expire_ms": 0}])
            for s, row in enumerate(t.to_pylist()):   # restore rows are few
                rt = row["rtype"]
                if rt == "string":
                    emit(row["key"], "key", rt, "set",
                         value=row["value"], off=off + 1, seq=s)
                elif rt == "list":
                    emit(row["key"], "list", rt, "push",
                         value=row["value"], off=off + 1, seq=s)
                else:
                    emit(row["key"], "field", rt, "add", field=row["field"],
                         value=row["value"], score=row["score"],
                         off=off + 1, seq=s)
                    if row["field_ttl_ms"]:   # TTL-hash dump payloads
                        emit(row["key"], "fexpire", rt, "expire",
                             field=row["field"],
                             score=float(row["field_ttl_ms"]),
                             off=off + 1, seq=s)
            if ttl:
                emit(args[1], "expire", "key", "expire",
                     score=float(ttl), off=off + 1)
        else:
            raise ValueError(f"redis replay: unsupported command {cmd!r}")
    return pa.Table.from_pydict(cols, schema=_EVENT_SCHEMA)


# ------------------------------------------------------------ vectorized
# scan_to_events: the columnar fast path over sources/resp.py::scan_resp.
# Semantics are commands_to_events's, kept in lockstep by equality tests
# (tests/test_redis_property.py) — hot commands expand vectorially, the
# rare/stateful ones (RESTORE, XADD, HPEXPIREAT, SET with flags) fall back
# to the per-command loop with their SELECT context re-synthesized.

_CMD_NAMES = [b"SET", b"DEL", b"UNLINK", b"HSET", b"HMSET", b"HDEL",
              b"SADD", b"SREM", b"ZADD", b"ZREM", b"RPUSH", b"PEXPIREAT",
              b"SELECT", b"PING", b"REPLCONF", b"MULTI", b"EXEC",
              b"XSETID", b"XGROUP", b"RESTORE", b"XADD", b"HPEXPIREAT"]
_CMD_CODE = {n: i for i, n in enumerate(_CMD_NAMES)}
_NAME_W = 12
_NAME_MAT = np.zeros((len(_CMD_NAMES), _NAME_W), np.uint8)
_NAME_LEN = np.zeros(len(_CMD_NAMES), np.int64)
for _i, _n in enumerate(_CMD_NAMES):
    _NAME_MAT[_i, :len(_n)] = np.frombuffer(_n, np.uint8)
    _NAME_LEN[_i] = len(_n)


def _gather_bin(a: np.ndarray, starts: np.ndarray,
                lens: np.ndarray) -> pa.Array:
    """Arrow binary array from sorted, disjoint (start, len) slices of one
    byte buffer — scan_resp's arg layout. Called ONCE per file by
    scan_to_events (every column is then an Arrow ``take`` against the
    result): a +1/-1 delta at slice boundaries, one int8 cumsum, one
    boolean take — O(covered bytes) C passes through reused workspace
    buffers. The naive ``repeat+arange`` index gather is 8 bytes of fresh
    index per PAYLOAD byte (hundreds of MB per 70 MB segment — measured
    4-5 s/file on first-touch-pathological hosts). Unsorted/overlapping
    slices (not produced by any caller today) take that fallback."""
    from ape_dts_ray.sources.resp import _ws

    n = len(starts)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    total = int(offs[-1])
    if total == 0:
        buf = np.zeros(0, np.uint8)
    else:
        ends = starts + lens
        if n > 1 and not bool((starts[1:] >= ends[:-1]).all()):
            idx = (np.repeat(starts, lens)
                   + (np.arange(total, dtype=np.int64)
                      - np.repeat(offs[:-1], lens)))
            buf = a[idx]
        else:
            span = int(ends[-1])
            delta = _ws("gb_delta", span + 1, np.int8)
            delta.fill(0)
            delta[starts] += 1
            delta[ends] -= 1
            inside = _ws("gb_inside", span, np.int8)
            np.cumsum(delta[:-1], out=inside)
            buf = a[:span][inside.view(np.bool_)]
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offs.astype(np.int32)), pa.py_buffer(buf)])


def scan_to_events(data: bytes, base_offset: int = 0, db: int = 0) -> pa.Table:
    """Columnar commands_to_events over a raw RESP buffer: scan_resp's
    index arrays in, the element-event table out, with per-command Python
    only for the rare complex commands. ~an order of magnitude faster than
    parse_resp + commands_to_events on update-heavy streams."""
    if len(data) >= _SCAN_MAX_BYTES:
        # the columnar gather builds pa.binary() (32-bit value offsets) and
        # int32 position indices — positions past 2 GiB would WRAP negative
        # and gather garbage bytes with no error raised. A foreign AOF can
        # be that large; route it through the scalar walker instead
        # (event-multiset-equal by the property contract).
        from ape_dts_ray.sources.resp import parse_resp

        return commands_to_events(parse_resp(data, base_offset), db=db)
    off, argc, apos, alen = scan_resp(data, base_offset)
    ncmd = len(off)
    if ncmd == 0:
        return _EVENT_SCHEMA.empty_table()
    a = np.frombuffer(data, np.uint8)
    n = len(a)
    cum0 = np.zeros(ncmd, np.int64)
    np.cumsum(argc[:-1], out=cum0[1:])

    # ---- command-name codes (padded gather + uppercase + table match)
    has_args = argc > 0
    if len(apos):
        safe0 = np.minimum(cum0, len(apos) - 1)
        n0 = np.where(has_args, apos[safe0], 0)
        l0 = np.where(has_args, alen[safe0], 0)
    else:
        n0 = np.zeros(ncmd, np.int64)
        l0 = np.zeros(ncmd, np.int64)
    w = _NAME_W
    colidx = np.arange(w, dtype=np.int32)[None, :]
    gidx = np.minimum(n0[:, None].astype(np.int32) + colidx,
                      max(n - 1, 0)).astype(np.int32, copy=False)
    valid = colidx < np.minimum(l0, w)[:, None]
    padded = np.where(valid, a[gidx], 0).astype(np.uint8)
    lower = (padded >= 97) & (padded <= 122)
    padded[lower] -= 32
    code = np.full(ncmd, -1, np.int64)                 # -1 = unknown → slow
    for i in range(len(_CMD_NAMES)):
        m = (l0 == _NAME_LEN[i]) & (padded == _NAME_MAT[i]).all(axis=1)
        code[m] = i
    code[~has_args] = -2                               # argc==0: skipped

    # ---- SELECT forward-fill (db context is sequential state)
    db_per_cmd = np.full(ncmd, db, np.int64)
    sel = np.flatnonzero(code == _CMD_CODE[b"SELECT"])
    if len(sel):
        sel_vals = np.zeros(len(sel), np.int64)
        for si, i in enumerate(sel.tolist()):          # rare: once per db
            s0 = int(cum0[i])                          # switch per file
            args = [bytes(a[apos[j]:apos[j] + alen[j]])
                    for j in range(s0, s0 + int(argc[i]))]
            if len(args) < 2:
                raise ValueError(
                    f"redis replay: SELECT needs >= 2 args, got {len(args)} "
                    f"(offset {int(off[i])}) — truncated or corrupt log")
            sel_vals[si] = int(args[1])
        seg = np.searchsorted(sel, np.arange(ncmd), side="right")
        db_per_cmd = np.where(seg > 0, sel_vals[np.maximum(seg - 1, 0)], db)

    pieces: list[pa.Table] = []
    # ALL arg payloads gathered once (one pair of C passes over the file);
    # every column below is an Arrow take against this array — C-speed
    # copies proportional to the column's bytes, duplicates included
    all_args = _gather_bin(a, apos, alen)

    def bincol(flat):
        return all_args.take(pa.array(flat, pa.int64()))

    def piece(ev_cmd, level, rtype, op, key_flat, field_flat=None,
              value_flat=None, score=None, seq=None):
        ne = len(ev_cmd)
        cols = {
            "db": pa.array(db_per_cmd[ev_cmd].astype(np.int32), pa.int32()),
            "key": bincol(key_flat),
            "level": pa.repeat(pa.scalar(level, pa.string()), ne),
            "rtype": pa.repeat(pa.scalar(rtype, pa.string()), ne),
            "op": pa.repeat(pa.scalar(op, pa.string()), ne),
            "field": (bincol(field_flat) if field_flat is not None
                      else pa.nulls(ne, pa.binary())),
            "value": (bincol(value_flat) if value_flat is not None
                      else pa.nulls(ne, pa.binary())),
            "score": (score if score is not None
                      else pa.nulls(ne, pa.float64())),
            "log_offset": pa.array(off[ev_cmd], pa.int64()),
            "seq": pa.array((seq if seq is not None
                             else np.zeros(ne, np.int32)).astype(np.int32),
                            pa.int32()),
        }
        pieces.append(pa.table(cols, schema=_EVENT_SCHEMA))

    def members(g, skip):
        """(ev_cmd, flat_idx, seq) for args[skip:] of each command in g."""
        cnt = np.maximum(argc[g] - skip, 0)
        tot = int(cnt.sum())
        ev = np.repeat(g, cnt)
        c0 = np.zeros(len(g), np.int64)
        np.cumsum(cnt[:-1], out=c0[1:])
        s = np.arange(tot, dtype=np.int64) - np.repeat(c0, cnt)
        return ev, np.repeat(cum0[g] + skip, cnt) + s, s

    def pairs(g):
        """(ev_cmd, first_flat, second_flat, seq) for (args[2+2s],
        args[3+2s]) pairs — commands_to_events's range(2, argc-1, 2)."""
        cnt = np.maximum((argc[g] - 2) // 2, 0)
        tot = int(cnt.sum())
        ev = np.repeat(g, cnt)
        c0 = np.zeros(len(g), np.int64)
        np.cumsum(cnt[:-1], out=c0[1:])
        s = np.arange(tot, dtype=np.int64) - np.repeat(c0, cnt)
        first = np.repeat(cum0[g] + 2, cnt) + 2 * s
        return ev, first, first + 1, s

    slow = code == -1

    # malformed arities route to the per-command loop so BOTH derivations
    # refuse with the same diagnostic (the event-multiset-equality contract
    # covers errors too): under-arity for every fast command, and an
    # unpaired trailing argument for the pair-expanded ones
    malformed = np.zeros(ncmd, bool)
    for nm, na in ((b"DEL", 2), (b"UNLINK", 2), (b"HDEL", 3), (b"SADD", 3),
                   (b"SREM", 3), (b"ZREM", 3), (b"RPUSH", 3)):
        malformed |= (code == _CMD_CODE[nm]) & (argc < na)
    pair_bad = (argc < 4) | (((argc - 2) % 2) != 0)
    for nm in (b"HSET", b"HMSET", b"ZADD"):
        malformed |= (code == _CMD_CODE[nm]) & pair_bad
    slow |= malformed
    ok = ~malformed

    g = np.flatnonzero((code == _CMD_CODE[b"SET"]) & (argc == 3))
    if len(g):
        piece(g, "key", "string", "set", cum0[g] + 1, value_flat=cum0[g] + 2)
    slow |= (code == _CMD_CODE[b"SET"]) & (argc != 3)

    g = np.flatnonzero(((code == _CMD_CODE[b"DEL"])
                        | (code == _CMD_CODE[b"UNLINK"])) & ok)
    if len(g):
        ev, flat, _ = members(g, 1)
        piece(ev, "key", "key", "del", flat)          # seq 0 per key (loop
                                                      # parity: emit default)
    g = np.flatnonzero(((code == _CMD_CODE[b"HSET"])
                        | (code == _CMD_CODE[b"HMSET"])) & ok)
    if len(g):
        ev, f, v, s = pairs(g)
        piece(ev, "field", "hash", "add", cum0[ev] + 1, field_flat=f,
              value_flat=v, seq=s)

    for nm, rtype, op in ((b"HDEL", "hash", "rem"), (b"SADD", "set", "add"),
                          (b"SREM", "set", "rem"), (b"ZREM", "zset", "rem")):
        g = np.flatnonzero((code == _CMD_CODE[nm]) & ok)
        if len(g):
            ev, flat, s = members(g, 2)
            piece(ev, "field", rtype, op, cum0[ev] + 1, field_flat=flat,
                  seq=s)

    g = np.flatnonzero((code == _CMD_CODE[b"ZADD"]) & ok)
    if len(g):
        ev, sc_flat, m_flat, s = pairs(g)
        sc = pc.cast(pc.cast(bincol(sc_flat), pa.string()), pa.float64())
        piece(ev, "field", "zset", "add", cum0[ev] + 1, field_flat=m_flat,
              score=sc, seq=s)

    g = np.flatnonzero((code == _CMD_CODE[b"RPUSH"]) & ok)
    if len(g):
        ev, flat, s = members(g, 2)
        piece(ev, "list", "list", "push", cum0[ev] + 1, value_flat=flat,
              seq=s)

    g = np.flatnonzero((code == _CMD_CODE[b"PEXPIREAT"]) & (argc == 3))
    if len(g):
        ms = pc.cast(pc.cast(pc.cast(bincol(cum0[g] + 2), pa.string()),
                             pa.int64()), pa.float64())
        piece(g, "expire", "key", "expire", cum0[g] + 1, score=ms)
    # argc != 3 → the loop, which refuses NX/XX/GT/LT (conditional on live
    # state) and anything else with the same diagnostic on both paths
    slow |= (code == _CMD_CODE[b"PEXPIREAT"]) & (argc != 3)

    # rare/stateful commands: exact per-command loop with SELECT context
    slow |= np.isin(code, [_CMD_CODE[b"RESTORE"], _CMD_CODE[b"XADD"],
                           _CMD_CODE[b"HPEXPIREAT"]])
    slow_idx = np.flatnonzero(slow)
    if len(slow_idx):
        feed = []
        cur_db = 0
        for i in slow_idx.tolist():
            s0 = int(cum0[i])
            args = [bytes(a[apos[j]:apos[j] + alen[j]])
                    for j in range(s0, s0 + int(argc[i]))]
            d = int(db_per_cmd[i])
            if d != cur_db:
                feed.append((int(off[i]), [b"SELECT", b"%d" % d]))
                cur_db = d
            feed.append((int(off[i]), args))
        pieces.append(commands_to_events(feed, db=0))

    if not pieces:
        return _EVENT_SCHEMA.empty_table()
    return pa.concat_tables(pieces)


def read_resp_log(log_dir: str):
    """RESP log files → Dataset of element events. One parse task per file
    (the psync stream analog; file seq preserves replication order)."""
    import glob

    return read_resp_log_files(
        sorted(glob.glob(os.path.join(log_dir, "*.resp")), key=_file_seq))


# ------------------------------------------------------------ the fold

def add_slot_partition(batch: pa.Table, num_partitions: int) -> pa.Table:
    """Cluster-faithful partitioning: CRC16 slot % P (RedisParallelizer
    analog — keyed parallelism with the real reshard mapping)."""
    slots = calc_slots(batch.column("key"))
    pid = (slots % np.int32(num_partitions)).astype(np.int32)
    return batch.append_column(COL_SLOT_PART, pa.array(pid, type=pa.int32()))


def fold_events(t: pa.Table) -> pa.Table:
    """Vectorized keyspace fold for one partition (semantics in the module
    docstring). polars only — no Python per-row work."""
    import polars as pl

    if t.num_rows == 0:
        return KEYSPACE_SCHEMA.empty_table()
    df = pl.from_arrow(t.select(_EVENT_SCHEMA.names))
    gk = ["db", "key"]

    kl = df.filter(pl.col("level") == "key")
    barrier = kl.group_by(gk).agg(pl.col("log_offset").max().alias("_k_off"))
    k_win = (kl.join(barrier, on=gk)
               .filter(pl.col("log_offset") == pl.col("_k_off")))
    strings = (k_win.filter(pl.col("op") == "set")
               .select("db", "key",
                       pl.lit("string").alias("rtype"),
                       pl.lit(None, dtype=pl.Binary).alias("field"),
                       pl.lit(None, dtype=pl.Int64).alias("idx"),
                       "value",
                       pl.lit(None, dtype=pl.Float64).alias("score"),
                       pl.lit(0, dtype=pl.Int64).alias("field_ttl_ms")))

    after_barrier = (df.join(barrier, on=gk, how="left")
                       .filter(pl.col("log_offset")
                               > pl.col("_k_off").fill_null(-1)))

    fl = after_barrier.filter(pl.col("level") == "field")
    f_win = (fl.sort("log_offset", "seq")
               .unique(subset=[*gk, "rtype", "field"], keep="last",
                       maintain_order=True)
               .filter(pl.col("op") == "add"))
    # hash-field TTLs (HPEXPIREAT / TTL-hash RESTOREs): last deadline AT OR
    # AFTER the field's winning add survives — Redis clears a field's TTL
    # when HSET overwrites the value (RESTORE emits add+fexpire at one
    # offset, hence >=)
    fx = (after_barrier.filter(pl.col("level") == "fexpire")
          .sort("log_offset", "seq")
          .unique(subset=[*gk, "field"], keep="last", maintain_order=True)
          .select(*gk, "field",
                  pl.col("score").cast(pl.Int64).alias("_fx_ttl"),
                  pl.col("log_offset").alias("_fx_off")))
    # STREAM rows carry their XADD insertion order in idx (matching the
    # RDB-parse path's entry+field ordering role): Redis streams preserve
    # field order per entry, and the sinks order fields by (idx, field) —
    # a null idx would re-emit 'XADD s 5-1 b 1 a 2' as 'a 2 b 1'. Computed
    # BEFORE the fx join (joins don't guarantee row order); f_win is in
    # (log_offset, seq) order here. Hash/set/zset keep idx null (Redis
    # guarantees no order there).
    f_win = f_win.with_columns(
        pl.when(pl.col("rtype") == "stream")
        .then(pl.int_range(pl.len()).over([*gk, "rtype"]))
        .otherwise(pl.lit(None, dtype=pl.Int64))
        .cast(pl.Int64).alias("_stream_idx"))
    fields = (f_win.join(fx, on=[*gk, "field"], how="left")
              .with_columns(
                  pl.when((pl.col("rtype") == "hash")
                          & (pl.col("_fx_off").fill_null(-1)
                             >= pl.col("log_offset")))
                  .then(pl.col("_fx_ttl")).otherwise(0)
                  .alias("field_ttl_ms"))
              .select("db", "key", "rtype", "field",
                      pl.col("_stream_idx").alias("idx"),
                      "value", "score", "field_ttl_ms"))

    lists = (after_barrier.filter(pl.col("level") == "list")
             .sort("log_offset", "seq")
             .with_columns(pl.col("seq").cum_count().over(gk).alias("idx"))
             .select("db", "key", "rtype", "field",
                     (pl.col("idx").cast(pl.Int64) - 1).alias("idx"),
                     "value", "score",
                     pl.lit(0, dtype=pl.Int64).alias("field_ttl_ms")))

    out = pl.concat([strings, fields, lists])

    # a key-level SET/DEL clears any earlier TTL (Redis: SET discards the
    # TTL unless KEEPTTL, which the parser refuses) — only expire events at
    # or after the barrier survive (SET..PXAT emits both at the same offset)
    ttl = (df.filter(pl.col("level") == "expire")
             .join(barrier, on=gk, how="left")
             .filter(pl.col("log_offset") >= pl.col("_k_off").fill_null(-1))
             .sort("log_offset")
             .unique(subset=gk, keep="last", maintain_order=True)
             .select(gk + [pl.col("score").cast(pl.Int64).alias("expire_ms")]))
    out = out.join(ttl, on=gk, how="left").with_columns(
        pl.col("expire_ms").fill_null(0))
    return (out.select([*KEYSPACE_SCHEMA.names])
            .to_arrow().cast(KEYSPACE_SCHEMA))


def replay_redis(events_ds, num_partitions: int = 16):
    """Command events → final keyspace Dataset. One shuffle (slot % P),
    per-group vectorized fold — the same canonical shape as the CDC apply."""
    return (events_ds
            .map_batches(lambda t: add_slot_partition(t, num_partitions),
                         batch_format="pyarrow", batch_size=None)
            .groupby(COL_SLOT_PART)
            .map_groups(lambda t: fold_events(t.drop_columns([COL_SLOT_PART])),
                        batch_format="pyarrow"))


# ------------------------------------------------------------ RDB snapshot

def _entries_table(entries: list[dict]) -> pa.Table:
    """Parsed RDB entries → exploded keyspace rows (columnar assembly)."""
    cols = {name: [] for name in KEYSPACE_SCHEMA.names}

    def emit(e, field=None, idx=None, value=None, score=None, field_ttl=0):
        cols["db"].append(e["db"])
        cols["key"].append(e["key"])
        cols["rtype"].append(e["type"])
        cols["field"].append(field)
        cols["idx"].append(idx)
        cols["value"].append(value)
        cols["score"].append(score)
        cols["expire_ms"].append(e.get("expire_ms", 0))
        cols["field_ttl_ms"].append(field_ttl)

    for e in entries:
        t = e["type"]
        if t == "string":
            emit(e, value=e["value"])
        elif t == "list":
            for i, v in enumerate(e["elements"]):
                emit(e, idx=i, value=v)
        elif t == "set":
            for m in e["elements"]:
                emit(e, field=m)
        elif t == "zset":
            for m, s in e["zset"]:
                emit(e, field=m, score=s)
        elif t == "hash":
            for fv in e["fields"]:      # (f, v) or (f, v, ttl_ms) — types
                emit(e, field=fv[0], value=fv[1],     # 22-25 carry a ttl
                     field_ttl=fv[2] if len(fv) == 3 else 0)
        elif t == "stream":
            # one row per (entry, field); the composite field key
            # "<id>:<name>" is safe to split on the first ':' because stream
            # ids are digits+dash; idx preserves entry + field order
            for eo, (eid, fvs) in enumerate(e["entries"]):
                for fo, (f, v) in enumerate(fvs):
                    emit(e, field=eid + b":" + f, idx=eo * 65536 + fo, value=v)
    return pa.Table.from_pydict(cols, schema=KEYSPACE_SCHEMA)


def _rdb_shard_paths(path: str):
    """Only ``*.rdb`` shards from a snapshot directory: a writer crash
    between the ``.rdb.tmp`` write and its rename leaves an orphan tmp,
    which a bare directory read would ingest — crashing the parser on a
    torn file or, worse, silently DOUBLE-COUNTING a fully-written orphan
    next to its committed successor. A direct file path passes through."""
    if os.path.isdir(path):
        import glob as _g

        files = sorted(_g.glob(os.path.join(path, "*.rdb")))
        if not files:
            raise FileNotFoundError(f"no *.rdb shards in {path!r}")
        return files
    return path


def read_rdb_snapshot(path: str, verify_checksum: bool = True):
    """RDB shard files → keyspace Dataset (RedisSnapshotFileExtractor
    analog; one parse task per shard file)."""
    import ray

    ds = ray.data.read_binary_files(_rdb_shard_paths(path))

    def parse_file(batch: pa.Table) -> pa.Table:
        tables = []
        for data in batch.column("bytes").to_pylist():
            # same working-set bound as rdb_key_statistics: one shard is
            # one task's heap; a FOREIGN monolithic dump would balloon the
            # worker — refuse with guidance instead of OOMing
            if len(data) > MAX_RDB_SHARD_BYTES:
                raise ValueError(
                    f"rdb shard is {len(data)} bytes (> "
                    f"{MAX_RDB_SHARD_BYTES}); split the dump into "
                    "per-slot shards (write_rdb_snapshot layout) before "
                    "reading")
            _, entries = rdbmod.parse_rdb(data, verify_checksum=verify_checksum)
            tables.append(_entries_table(entries))
        return pa.concat_tables(tables) if tables else \
            KEYSPACE_SCHEMA.empty_table()

    # batch_size=None: one batch per file block — the default bundles
    # many files into ONE task and collapses the per-file parallelism
    return ds.map_batches(parse_file, batch_format="pyarrow",
                          batch_size=None)


def _keyspace_to_entries(t: pa.Table) -> list[dict]:
    """Group keyspace rows back into RDB entries (sink-side assembly).
    Vectorized: element lists are built by one polars group_by().agg per
    container type (not per-key Python group iteration — that was 6s for
    10k keys); the remaining loop is one iteration per ENTRY over
    already-aggregated lists."""
    import polars as pl

    df = pl.from_arrow(t).sort("db", "key", "idx", "field")
    entries: list[dict] = []
    gk = ["db", "key", "expire_ms"]

    strings = df.filter(pl.col("rtype") == "string")
    entries += [{"db": db, "key": key, "type": "string", "expire_ms": exp,
                 "value": val}
                for db, key, exp, val in zip(strings["db"], strings["key"],
                                             strings["expire_ms"],
                                             strings["value"])]
    for rtype in ("list", "set", "zset", "hash", "stream"):
        sub = df.filter(pl.col("rtype") == rtype)
        if sub.height == 0:
            continue
        agg = sub.group_by(gk, maintain_order=True).agg(
            pl.col("field"), pl.col("value"), pl.col("score"),
            pl.col("field_ttl_ms"))
        rows = zip(agg["db"], agg["key"], agg["expire_ms"],
                   agg["field"], agg["value"], agg["score"],
                   agg["field_ttl_ms"])
        if rtype == "list":
            entries += [{"db": db, "key": key, "type": rtype,
                         "expire_ms": exp, "elements": vals.to_list()}
                        for db, key, exp, _, vals, _, _ in rows]
        elif rtype == "set":
            entries += [{"db": db, "key": key, "type": rtype,
                         "expire_ms": exp, "elements": flds.to_list()}
                        for db, key, exp, flds, _, _, _ in rows]
        elif rtype == "zset":
            entries += [{"db": db, "key": key, "type": rtype,
                         "expire_ms": exp,
                         "zset": list(zip(flds.to_list(), scores.to_list()))}
                        for db, key, exp, flds, _, scores, _ in rows]
        elif rtype == "hash":
            # 3-tuples (f, v, ttl_ms) round-trip per-field TTLs; encode_rdb
            # picks the TTL container iff any ttl is nonzero
            entries += [{"db": db, "key": key, "type": rtype,
                         "expire_ms": exp,
                         "fields": list(zip(flds.to_list(), vals.to_list(),
                                            ttls.to_list()))}
                        for db, key, exp, flds, vals, _, ttls in rows]
        else:                                   # stream: regroup by entry id
            for db, key, exp, flds, vals, _, _ in rows:
                items = []
                for f, v in zip(flds.to_list(), vals.to_list()):
                    eid, _, fname = bytes(f).partition(b":")
                    ms, _, seq = eid.partition(b"-")
                    items.append((int(ms), int(seq or b"0"), eid, fname, v))
                items.sort(key=lambda x: x[:2])   # id order; field order is
                ents: list = []                   # row (idx) order within id
                for ms, seq, eid, fname, v in items:
                    if ents and ents[-1][0] == eid:
                        ents[-1][1].append((fname, v))
                    else:
                        ents.append((eid, [(fname, v)]))
                entries.append({
                    "db": db, "key": key, "type": "stream", "expire_ms": exp,
                    "entries": [(i, fv) for i, fv in ents],
                    "last_id": ents[-1][0] if ents else b"0-0",
                    "groups": []})                # groups aren't keyspace rows
    return entries


def _write_rdb_bytes(buf: bytes, out_dir: str, pid: int) -> str:
    """THE atomic RDB shard write (deterministic name, tmp+rename — a
    failed run overwrites its partial shard, the resume contract of every
    sink in this engine). Shared by the keyspace snapshot writer and any
    producer with pre-encoded bytes (e.g. the hot-key statistic query's
    columnar string shards via ``encode_rdb_strings``)."""
    path = os.path.join(out_dir, f"rdb_part_{pid:05d}.rdb")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf)
    os.replace(tmp, path)
    return path


def _write_rdb_shard(entries: list[dict], out_dir: str, pid: int,
                     lzf_sample: int = 1) -> str:
    """Entries-level shard write (atomic protocol in _write_rdb_bytes)."""
    return _write_rdb_bytes(rdbmod.encode_rdb(entries, lzf_sample=lzf_sample),
                            out_dir, pid)


def write_rdb_snapshot(keyspace_ds, out_dir: str, num_partitions: int = 16,
                       lzf_sample: int = 1):
    """Keyspace Dataset → partitioned RDB shard files (atomic protocol in
    _write_rdb_shard). Returns per-shard lineage. ``lzf_sample``: see
    sources/rdb.py::write_string (bulk sinks sample the pure-Python LZF
    instead of paying it per value)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_part(t: pa.Table) -> pa.Table:
        pid = int(t.column(COL_SLOT_PART)[0].as_py())
        entries = _keyspace_to_entries(t.drop_columns([COL_SLOT_PART]))
        _write_rdb_shard(entries, out_dir, pid, lzf_sample)
        return pa.table({"part_id": [pid], "keys": [len(entries)],
                         "rows": [t.num_rows]})

    return (keyspace_ds
            .map_batches(lambda t: add_slot_partition(t, num_partitions),
                         batch_format="pyarrow", batch_size=None)
            .groupby(COL_SLOT_PART)
            .map_groups(write_part, batch_format="pyarrow"))


# ------------------------------------------------------------ RESP sinker

def _rewrite_cmds(entries: list[dict]) -> list[list[bytes]]:
    """entry_rewriter.rs rewrite_* analog: one idempotent command stream
    per entry (hset/rpush/sadd/zadd grouped per key; set single)."""
    cmds: list[list[bytes]] = []
    for e in entries:
        key = e["key"]
        t = e["type"]
        if t == "string":
            cmds.append([b"SET", key, e["value"]])
        elif t == "list":
            cmds.append([b"RPUSH", key, *e["elements"]])
        elif t == "set":
            cmds.append([b"SADD", key, *e["elements"]])
        elif t == "zset":
            args = [b"ZADD", key]
            for m, s in e["zset"]:
                args += [rdbmod._format_score(s), m]
            cmds.append(args)
        elif t == "hash":
            args = [b"HSET", key]
            for fv in e["fields"]:
                args += [fv[0], fv[1]]
            cmds.append(args)
            for fv in e["fields"]:      # per-field TTLs ride HPEXPIREAT
                if len(fv) == 3 and fv[2]:   # (absolute ms — replayable)
                    cmds.append([b"HPEXPIREAT", key, b"%d" % fv[2],
                                 b"FIELDS", b"1", fv[0]])
        elif t == "stream":
            for eid, fvs in e["entries"]:
                args = [b"XADD", key, eid]
                for f, v in fvs:
                    args += [f, v]
                cmds.append(args)
            if e.get("last_id"):
                cmds.append([b"XSETID", key, e["last_id"]])
            for gname, gid in e.get("groups", []):
                cmds.append([b"XGROUP", b"CREATE", key, gname, gid])
        if e.get("expire_ms"):
            cmds.append([b"PEXPIREAT", key, b"%d" % e["expire_ms"]])
    return cmds


def _restore_cmds(entries: list[dict]) -> list[list[bytes]]:
    """entry_rewriter.rs rewrite_as_restore analog: RESTORE key ttl payload
    REPLACE [ABSTTL], payload = our DUMP encoding with the CRC-64 footer.
    expire_ms is an absolute epoch-ms deadline (PEXPIREAT semantics), so a
    nonzero ttl always carries ABSTTL — without it Redis would read the
    value as a relative TTL ~39 years long."""
    out = []
    for e in entries:
        cmd = [b"RESTORE", e["key"], b"%d" % e.get("expire_ms", 0),
               rdbmod.dump_value(e, lzf_sample=16), b"REPLACE"]
        if e.get("expire_ms"):
            cmd.append(b"ABSTTL")
        out.append(cmd)
    return out


def write_resp_sink(keyspace_ds, out_dir: str, num_partitions: int = 16,
                    method: str = "rewrite"):
    """Keyspace Dataset → RESP command files, one per slot partition
    (RedisSinker analog; method = rewrite | restore, redis_write_method.rs)."""
    os.makedirs(out_dir, exist_ok=True)
    to_cmds = {"rewrite": _rewrite_cmds, "restore": _restore_cmds}[method]

    def write_part(t: pa.Table) -> pa.Table:
        pid = int(t.column(COL_SLOT_PART)[0].as_py())
        entries = _keyspace_to_entries(t.drop_columns([COL_SLOT_PART]))
        # each db gets an explicit SELECT before its commands: every parse task
        # starts a file at db 0 (the AOF-rewrite convention — files open
        # with SELECT), so without it a multi-db keyspace would collapse
        # into db 0 on re-replay, colliding keys across databases
        cmds: list[list[bytes]] = []
        by_db: dict[int, list[dict]] = {}
        for e in entries:
            by_db.setdefault(e.get("db", 0), []).append(e)
        for db in sorted(by_db):
            cmds.append([b"SELECT", b"%d" % db])
            cmds.extend(to_cmds(by_db[db]))
        write_resp_log(cmds, out_dir, file_seq=pid)   # THE atomic log write
        return pa.table({"part_id": [pid], "cmds": [len(cmds)],
                         "rows": [t.num_rows]})

    return (keyspace_ds
            .map_batches(lambda t: add_slot_partition(t, num_partitions),
                         batch_format="pyarrow", batch_size=None)
            .groupby(COL_SLOT_PART)
            .map_groups(write_part, batch_format="pyarrow"))


# ------------------------------------------------------------ precheck / reshard

MIN_RDB_VERSION = 1
MAX_RDB_VERSION = 12

# rdb_key_statistics reads each shard whole (keys must stay intact within a
# file); the writer's per-slot shards are far below this, the bound exists to
# refuse a foreign monolithic dump before it balloons one task's heap
MAX_RDB_SHARD_BYTES = 1 << 30


def _row_payload_bytes(t: pa.Table) -> pa.Array:
    """Per-row payload bytes of exploded keyspace rows — the
    get_data_malloc_size element term (redis_entry.rs:53-61): field bytes +
    value bytes + 8 per score (doubles). ONE definition, used by both
    statistic sinks; key bytes are added once per key after aggregation."""
    zero = pa.scalar(0, pa.int32())
    payload = pc.add(
        pc.add(pc.coalesce(pc.binary_length(t.column("field")), zero),
               pc.coalesce(pc.binary_length(t.column("value")), zero)),
        pc.if_else(pc.is_null(t.column("score")), 0, 8))
    out = payload.cast(pa.int64())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _key_to_text(arr) -> pa.Array:
    """Binary keys → report text for the statistic sinks. Redis keys are
    binary-safe; a non-UTF8 key cannot land in an Arrow string column, so
    it renders as Python backslash escapes (b'\\xff..' → '\\xff..') instead
    of aborting the whole statistics job on ArrowInvalid. The escape path
    is per-batch and only taken when the vectorized cast refuses."""
    try:
        return arr.cast(pa.string())
    except pa.ArrowInvalid:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pa.array(
            [None if v is None else v.decode("utf-8", "backslashreplace")
             for v in arr.to_pylist()], pa.string())


def bigkey_statistics(keyspace_ds, data_size_threshold: int = 0,
                      top_n: int | None = None, num_partitions: int = 16):
    """RedisStatisticSinker BigKey analog (redis_statistic_sinker.rs:20-53)
    — the diagnostic operators run over an RDB scan before a migration:
    keys whose serialized payload exceeds ``data_size_threshold``, as rows
    (db_id, key_type, key, data_size) in (size desc, key asc) order,
    optionally truncated to the ``top_n`` largest.

    data_size over exploded keyspace rows = len(key) + Σ per-row
    (len(field) + len(value) + 8·has_score) — the get_data_malloc_size
    analog (redis_entry.rs:53-61: key bytes + value malloc size; scores are
    8-byte doubles). Shape: vectorized per-batch partial aggregation → ONE
    shuffle on the cluster slot (a key's partials always co-locate) →
    per-partition final fold + threshold filter → total order over the tiny
    surviving set. No driver-side data path; the unfiltered keyspace never
    leaves the partitions."""
    import polars as pl

    out_schema = pa.schema([("db_id", pa.int64()), ("key_type", pa.string()),
                            ("key", pa.string()), ("data_size", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("db", pa.int32()), ("key", pa.binary()),
                              ("rtype", pa.string()),
                              ("payload", pa.int64()),
                              (COL_SLOT_PART, pa.int32())]).empty_table()
        narrow = pa.table({
            "db": t.column("db"), "key": t.column("key"),
            "rtype": t.column("rtype"),
            "payload": _row_payload_bytes(t)})
        agg = (pl.from_arrow(narrow)
               .group_by(["db", "key", "rtype"])
               .agg(pl.col("payload").sum())).to_arrow()
        agg = agg.set_column(agg.column_names.index("key"), "key",
                             agg.column("key").cast(pa.binary()))
        return add_slot_partition(agg, num_partitions)

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = (pl.from_arrow(t.select(["db", "key", "rtype", "payload"]))
              .group_by(["db", "key", "rtype"])
              .agg(pl.col("payload").sum()))
        out = df.to_arrow()
        size = pc.add(pc.binary_length(out.column("key")).cast(pa.int64()),
                      out.column("payload"))
        out = pa.table({
            "db_id": out.column("db").cast(pa.int64()),
            "key_type": out.column("rtype"),
            "key": _key_to_text(out.column("key")),
            "data_size": size})
        out = out.filter(pc.greater_equal(
            out.column("data_size"),
            pa.scalar(data_size_threshold, pa.int64())))
        # partial top-N: the global top_n under (size desc, key asc) is a
        # subset of the union of per-partition top_n — truncate HERE so the
        # final total-order sort sees ≤ partitions × top_n rows even with
        # threshold=0 over a huge keyspace (never a full-keyspace sort)
        if top_n is not None and out.num_rows > top_n:
            out = out.sort_by([("data_size", "descending"),
                               ("key", "ascending")]).slice(0, top_n)
        return out

    ds = (keyspace_ds
          .map_batches(partial, batch_format="pyarrow", batch_size=None)
          .groupby(COL_SLOT_PART)
          .map_groups(lambda t: final(t), batch_format="pyarrow")
          .sort(["data_size", "key"], descending=[True, False]))
    if top_n is not None:
        ds = ds.limit(top_n)
    return ds


def rdb_key_statistics(path: str):
    """Per-KEY statistic rows straight from RDB shards — the scan the
    reference's statistic task runs over (redis_statistic_sinker.rs feeds
    on parsed RedisEntry items). One row per key:
    (db_id, key_type, key, data_size, freq); data_size per
    redis_entry.rs:53-61 (key bytes + Σ element payload bytes, scores as
    8-byte doubles), freq = the LFU prefix (rdb_parser.rs:107-110), -1
    when the image carries none. A key's rows are whole within its shard
    file, so the aggregation is file-local — NO shuffle at all."""
    import polars as pl
    import ray

    ds = ray.data.read_binary_files(_rdb_shard_paths(path))
    schema = pa.schema([("db_id", pa.int64()), ("key_type", pa.string()),
                        ("key", pa.binary()), ("data_size", pa.int64()),
                        ("freq", pa.int64())])

    def stat_file(batch: pa.Table) -> pa.Table:
        out = []
        for data in batch.column("bytes").to_pylist():
            # one shard = one task's working set: this engine's RDB writer
            # partitions the keyspace into bounded shards, but a FOREIGN
            # monolithic dump would balloon a single task — refuse with
            # guidance instead of OOMing the worker
            if len(data) > MAX_RDB_SHARD_BYTES:
                raise ValueError(
                    f"rdb shard is {len(data)} bytes (> "
                    f"{MAX_RDB_SHARD_BYTES}); split the dump into "
                    "per-slot shards (write_rdb_snapshot layout) before "
                    "running statistics")
            _, entries = rdbmod.parse_rdb(data)
            if not entries:
                continue
            t = _entries_table(entries)
            narrow = pa.table({
                "db_id": t.column("db").cast(pa.int64()),
                "key": t.column("key").cast(pa.binary()),
                "payload": _row_payload_bytes(t)})
            agg = (pl.from_arrow(narrow)
                   .group_by(["db_id", "key"])
                   .agg(pl.col("payload").sum()))
            # base frame = one row per ENTRY (key_type + freq straight from
            # the entry) so a key with zero exploded rows — an empty
            # collection — still surfaces with payload 0
            base = pa.Table.from_pylist(
                [{"db_id": e.get("db", 0), "key": e["key"],
                  "key_type": e["type"], "freq": e.get("freq", -1)}
                 for e in entries],
                schema=pa.schema([("db_id", pa.int64()),
                                  ("key", pa.binary()),
                                  ("key_type", pa.string()),
                                  ("freq", pa.int64())]))
            j = (pl.from_arrow(base)
                 .join(agg, on=["db_id", "key"], how="left")
                 .with_columns(pl.col("payload").fill_null(0))).to_arrow()
            size = pc.add(pc.binary_length(j.column("key")).cast(pa.int64()),
                          j.column("payload"))
            out.append(pa.table({
                "db_id": j.column("db_id"), "key_type": j.column("key_type"),
                "key": j.column("key").cast(pa.binary()), "data_size": size,
                "freq": j.column("freq")}, schema=schema))
        return pa.concat_tables(out) if out else schema.empty_table()

    return ds.map_batches(stat_file, batch_format="pyarrow", batch_size=None)


def hotkey_statistics(stats_ds, freq_threshold: int,
                      top_n: int | None = None):
    """RedisStatisticSinker HotKey mode (redis_statistic_sinker.rs:55-66):
    keys whose LFU frequency reaches ``freq_threshold``, as
    (db_id, key, freq) in (freq desc, key asc) order, optionally the
    top_n hottest. Input = rdb_key_statistics rows."""
    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("freq"),
                                      pa.scalar(freq_threshold, pa.int64())))
        out = pa.table({"db_id": t.column("db_id"),
                        "key": _key_to_text(t.column("key")),
                        "freq": t.column("freq")})
        # partial top-N per shard batch (keys are whole within a shard): the
        # global top_n is a subset of the union of per-batch top_n, so the
        # final sort sees ≤ shards × top_n rows even at threshold 0
        if top_n is not None and out.num_rows > top_n:
            out = out.sort_by([("freq", "descending"),
                               ("key", "ascending")]).slice(0, top_n)
        return out

    ds = (stats_ds.map_batches(keep, batch_format="pyarrow", batch_size=None)
          .sort(["freq", "key"], descending=[True, False]))
    if top_n is not None:
        ds = ds.limit(top_n)
    return ds


def precheck_redis(rdb_dir: str | None = None, resp_dir: str | None = None,
                   sample_bytes: int = 1 << 16) -> dict:
    """RedisPrechecker analog (dt-precheck/src/prechecker/redis_prechecker.rs:
    connectivity + MIN_SUPPORTED_VERSION gate before the task starts). File
    sources replace the live server, so the checks become: shards exist and
    are readable, RDB magic + version in the supported band, RESP files named
    with parseable monotone sequence numbers and a parseable head sample.
    Aggregate-and-abort: every failure is collected, then raised together
    (same contract as pipelines/precheck.py)."""
    failures: list[str] = []
    report: dict = {"rdb_files": 0, "resp_files": 0}
    if rdb_dir is not None:
        files = sorted(f for f in os.listdir(rdb_dir) if f.endswith(".rdb")) \
            if os.path.isdir(rdb_dir) else []
        if not files:
            failures.append(f"no .rdb shards under {rdb_dir}")
        for f in files:
            path = os.path.join(rdb_dir, f)
            with open(path, "rb") as fh:
                head = fh.read(9)
            if head[:5] != b"REDIS":
                failures.append(f"{f}: bad RDB magic")
                continue
            try:
                ver = int(head[5:9])
            except ValueError:
                failures.append(f"{f}: unparseable RDB version {head[5:9]!r}")
                continue
            if not MIN_RDB_VERSION <= ver <= MAX_RDB_VERSION:
                failures.append(f"{f}: RDB version {ver} outside supported "
                                f"[{MIN_RDB_VERSION}, {MAX_RDB_VERSION}]")
        report["rdb_files"] = len(files)
    if resp_dir is not None:
        files = sorted(f for f in os.listdir(resp_dir) if f.endswith(".resp")) \
            if os.path.isdir(resp_dir) else []
        if not files:
            failures.append(f"no .resp log files under {resp_dir}")
        seqs = []
        for f in files:
            try:
                seqs.append(_file_seq(os.path.join(resp_dir, f)))
            except (IndexError, ValueError):
                failures.append(f"{f}: name not aof_<seq>.resp")
        if seqs and sorted(seqs) != list(range(min(seqs), min(seqs) + len(seqs))):
            failures.append(f"resp file sequence has gaps: {sorted(seqs)}")
        for f in files[:1]:                  # head sample parse
            with open(os.path.join(resp_dir, f), "rb") as fh:
                data = fh.read(sample_bytes)
            try:                             # an arbitrary byte cut may land
                parse_resp(data, tolerate_truncation=True)   # mid-frame
            except Exception as e:           # noqa: BLE001 - aggregated
                failures.append(f"{f}: RESP head sample unparseable: {e}")
        report["resp_files"] = len(files)
    if failures:
        raise ValueError("redis precheck failed:\n- " + "\n- ".join(failures))
    return report


def reshard_rdb(in_dir: str, out_dir: str, num_partitions: int,
                lzf_sample: int = 16):
    """RedisReshardExtractor analog (redis_reshard_extractor.rs:25-100:
    rebalance slots across a different node count): re-key existing RDB
    shards onto a new partition count. Pure composition of the snapshot
    reader and writer — the slot of every key is invariant, only
    slot % num_partitions changes, exactly like a cluster reshard moving
    slot ranges between nodes. Streaming end-to-end; returns per-new-shard
    lineage."""
    return write_rdb_snapshot(read_rdb_snapshot(in_dir), out_dir,
                              num_partitions=num_partitions,
                              lzf_sample=lzf_sample)


# ------------------------------------------------- incremental keyspace store

def keyspace_to_events(t: pa.Table, base_offset: int) -> pa.Table:
    """Folded keyspace rows → synthetic element events at ``base_offset``.

    This is what makes the fold INCREMENTAL: fold(state ∪ new) == fold(all)
    provided every state event sits strictly below every new offset.
    Mapping (inverse of fold_events, checked by the equivalence property
    test): string rows → key-level ``set`` (the barrier), container fields →
    field-level ``add``, lists → ``push`` ordered by idx, key TTLs → one
    ``expire`` per key, hash-field TTLs → ``fexpire`` at the same (offset,
    seq) as their field's add (the RESTORE-shaped >= tie the fold accepts).
    The string barrier sits at ``base_offset - 1``, one below the container
    events: the fold counts container elements strictly AFTER the key-level
    barrier, and a mixed-type key (string + container rows — legal output
    of a fold that does not simulate WRONGTYPE) would otherwise lose its
    container rows on re-fold."""
    import polars as pl

    if t.num_rows == 0:
        return _EVENT_SCHEMA.empty_table()
    # seq follows ROW order, so order rows by idx within a key first: a
    # stream's (or list's) element order must survive the refold — the gen
    # files are sorted with field BEFORE idx (a comparison-stable order),
    # which would re-derive stream idx in field-byte order otherwise
    df = (pl.from_arrow(t)
          .sort("db", "key", "rtype", "idx", "field")
          .with_row_index("_seq"))
    off = pl.lit(base_offset, dtype=pl.Int64).alias("log_offset")
    off_key = pl.lit(base_offset - 1, dtype=pl.Int64).alias("log_offset")
    seq = pl.col("_seq").cast(pl.Int32).alias("seq")

    strings = (df.filter(pl.col("rtype") == "string")
               .select("db", "key", pl.lit("key").alias("level"), "rtype",
                       pl.lit("set").alias("op"), "field", "value",
                       pl.lit(None, dtype=pl.Float64).alias("score"),
                       off_key, seq))
    fields = (df.filter(pl.col("rtype").is_in(["hash", "set", "zset",
                                               "stream"]))
              .select("db", "key", pl.lit("field").alias("level"), "rtype",
                      pl.lit("add").alias("op"), "field", "value", "score",
                      off, seq))
    fexpire = (df.filter((pl.col("rtype") == "hash")
                         & (pl.col("field_ttl_ms") > 0))
               .select("db", "key", pl.lit("fexpire").alias("level"), "rtype",
                       pl.lit("expire").alias("op"), "field",
                       pl.lit(None, dtype=pl.Binary).alias("value"),
                       pl.col("field_ttl_ms").cast(pl.Float64).alias("score"),
                       off, seq))
    lists = (df.filter(pl.col("rtype") == "list")
             .select("db", "key", pl.lit("list").alias("level"), "rtype",
                     pl.lit("push").alias("op"), "field", "value",
                     pl.lit(None, dtype=pl.Float64).alias("score"), off,
                     pl.col("idx").cast(pl.Int32).alias("seq")))
    ttls = (df.filter(pl.col("expire_ms") > 0)
            .unique(subset=["db", "key"], keep="first", maintain_order=True)
            .select("db", "key", pl.lit("expire").alias("level"), "rtype",
                    pl.lit("expire").alias("op"),
                    pl.lit(None, dtype=pl.Binary).alias("field"),
                    pl.lit(None, dtype=pl.Binary).alias("value"),
                    pl.col("expire_ms").cast(pl.Float64).alias("score"),
                    off, seq))
    out = pl.concat([strings, fields, fexpire, lists, ttls])
    return out.to_arrow().cast(_EVENT_SCHEMA)


class RedisKeyspaceStore:
    """Incremental, crash-safe keyspace fold over a growing RESP log — the
    psync committed-offset story (redis_psync_extractor.rs repl_offset ack;
    the sinker's position.log analog) for the Redis path:

    - the WATERMARK is the next unconsumed log file sequence, published
      atomically (tmp+rename of ``watermark.json``) only after a complete
      new state generation is on disk — a crash anywhere mid-ingest leaves
      the old generation live and the re-run rebuilds deterministically;
    - state lives as one parquet per slot partition under ``gen-K/``;
      ingest folds each touched partition (previous state replayed as
      synthetic events below every new offset — ``keyspace_to_events``) and
      copy-forwards untouched partitions without decoding them;
    - re-running ingest over an already-consumed log is a no-op, and a log
      with a GAP after the watermark refuses loudly (a missed segment would
      silently fold out of order).
    """

    STORE_FILE = "store.json"
    WM_FILE = "watermark.json"

    def __init__(self, root: str, num_partitions: int):
        self.root = root
        self.num_partitions = num_partitions

    # ---------- lifecycle ----------
    @classmethod
    def create(cls, root: str, num_partitions: int = 16) -> "RedisKeyspaceStore":
        from ape_dts_ray.state.manifest import atomic_write_text
        import json

        os.makedirs(root, exist_ok=True)
        if os.path.exists(os.path.join(root, cls.STORE_FILE)):
            raise FileExistsError(f"keyspace store already exists at {root}")
        atomic_write_text(os.path.join(root, cls.STORE_FILE),
                          json.dumps({"num_partitions": num_partitions}))
        atomic_write_text(os.path.join(root, cls.WM_FILE),
                          json.dumps({"gen": 0, "next_file_seq": 0}))
        os.makedirs(os.path.join(root, "gen-00000000"), exist_ok=True)
        return cls(root, num_partitions)

    @classmethod
    def open(cls, root: str) -> "RedisKeyspaceStore":
        import json

        with open(os.path.join(root, cls.STORE_FILE)) as f:
            d = json.load(f)
        return cls(root, d["num_partitions"])

    def watermark(self) -> dict:
        import json

        with open(os.path.join(self.root, self.WM_FILE)) as f:
            return json.load(f)

    def _gen_dir(self, gen: int) -> str:
        return os.path.join(self.root, f"gen-{gen:08d}")

    def _part_path(self, gen: int, pid: int) -> str:
        return os.path.join(self._gen_dir(gen), f"part-{pid:05d}.parquet")

    def _gen_files(self) -> tuple[int, list[str]]:
        """(gen, parquet files) with the list-then-read retry: a concurrent
        ingest commits gen+1 and rmtree's the old dir between our watermark
        read and the glob — an empty listing for a generation that has since
        ADVANCED is that race, not an empty store, and returning it as truth
        would silently read zero keys (same contract as lake.py's
        committed_watermark re-list)."""
        import glob

        for _ in range(8):
            gen = self.watermark()["gen"]
            files = sorted(glob.glob(os.path.join(self._gen_dir(gen),
                                                  "*.parquet")))
            if files or self.watermark()["gen"] == gen:
                return gen, files
        raise RuntimeError("keyspace read: generation kept advancing "
                           "mid-listing — pause the racing ingest")

    # ---------- ingest ----------
    def ingest(self, log_dir: str, fail_after_parts: int | None = None,
               fail_before_commit: bool = False) -> dict:
        """Consume every log file at or past the watermark; returns
        {"files": n, "partitions": [...]} (empty no-op if none).

        ``fail_after_parts`` (in-task, racy by nature under parallel folds)
        and ``fail_before_commit`` (driver-side, deterministic: the new
        generation is fully built but the watermark never publishes) are
        test-only crash-injection hooks."""
        import glob
        import json
        import shutil

        import pyarrow.parquet as pq

        from ape_dts_ray.state.manifest import (atomic_write_parquet,
                                                atomic_write_text)

        wm = self.watermark()
        gen, next_seq = wm["gen"], wm["next_file_seq"]
        if not os.path.isdir(log_dir):
            # a typo'd path would otherwise be indistinguishable from
            # "fully caught up" — same loud-refusal contract as gaps
            raise FileNotFoundError(f"resp log dir does not exist: {log_dir}")
        all_files = sorted(glob.glob(os.path.join(log_dir, "*.resp")),
                          key=_file_seq)
        fresh = [f for f in all_files if _file_seq(f) >= next_seq]
        if not fresh:
            return {"files": 0, "partitions": []}
        seqs = [_file_seq(f) for f in fresh]
        if seqs[0] != next_seq or seqs != list(range(seqs[0],
                                                     seqs[0] + len(seqs))):
            raise ValueError(
                f"resp log gap: watermark expects file seq {next_seq}, "
                f"found {seqs} — a missed segment would fold out of order")
        new_gen = gen + 1
        # sweep crash leftovers: any gen dir that is neither current nor
        # the one being built
        for d in glob.glob(os.path.join(self.root, "gen-*")):
            g = int(os.path.basename(d).split("-")[1])
            if g != gen:
                shutil.rmtree(d, ignore_errors=True)
        os.makedirs(self._gen_dir(new_gen), exist_ok=True)

        base = next_seq * RESP_FILE_STRIDE - 1   # below every fresh offset,
        root, P = self.root, self.num_partitions  # above every folded one

        def fold_part(t: pa.Table):
            pid = int(t.column(COL_SLOT_PART)[0].as_py())
            if fail_after_parts is not None:
                done_now = len(glob.glob(os.path.join(
                    root, f"gen-{new_gen:08d}", "*.parquet")))
                if done_now >= fail_after_parts:
                    raise RuntimeError("injected ingest crash")
            ev = t.drop_columns([COL_SLOT_PART])
            prev = os.path.join(root, f"gen-{gen:08d}",
                                f"part-{pid:05d}.parquet")
            if os.path.exists(prev):
                state_ev = keyspace_to_events(pq.read_table(prev), base)
                ev = pa.concat_tables([state_ev, ev])
            folded = fold_events(ev)
            folded = folded.sort_by([(c, "ascending")
                                     for c in ("db", "key", "rtype", "field",
                                               "idx")])
            atomic_write_parquet(folded, os.path.join(
                root, f"gen-{new_gen:08d}", f"part-{pid:05d}.parquet"),
                compression="zstd")
            return pa.table({"part_id": pa.array([pid], pa.int32()),
                             "rows": pa.array([folded.num_rows], pa.int64())})

        lineage = (read_resp_log_files(fresh)
                   .map_batches(lambda t: add_slot_partition(t, P),
                                batch_format="pyarrow", batch_size=None)
                   .groupby(COL_SLOT_PART)
                   .map_groups(fold_part, batch_format="pyarrow")
                   .take_all())
        if fail_before_commit:
            raise RuntimeError("injected ingest crash before commit")
        touched = {r["part_id"] for r in lineage}
        for pid in range(P):                 # copy-forward untouched parts
            prev = self._part_path(gen, pid)
            if pid not in touched and os.path.exists(prev):
                dst = self._part_path(new_gen, pid)
                try:
                    os.link(prev, dst)       # no byte copy when possible
                except OSError:
                    shutil.copy2(prev, dst)
        # the COMMIT point: watermark names the new generation
        atomic_write_text(os.path.join(self.root, self.WM_FILE),
                          json.dumps({"gen": new_gen,
                                      "next_file_seq": seqs[-1] + 1}))
        shutil.rmtree(self._gen_dir(gen), ignore_errors=True)
        return {"files": len(fresh), "partitions": sorted(
            {**{pid: 0 for pid in range(P)},
             **{r["part_id"]: r["rows"] for r in lineage}}.items())}

    # ---------- read path ----------
    def keyspace_dataset(self):
        import ray.data as rd

        _, files = self._gen_files()
        if not files:
            return rd.from_arrow(KEYSPACE_SCHEMA.empty_table())
        return rd.read_parquet(files)

    def keyspace_table(self) -> pa.Table:
        import pyarrow.parquet as pq

        for _ in range(8):
            _, files = self._gen_files()
            if not files:
                return KEYSPACE_SCHEMA.empty_table()
            try:
                t = pa.concat_tables([pq.read_table(f) for f in files])
            except FileNotFoundError:
                continue      # the listed generation was GC'd mid-read —
                              # re-list sees the committed successor
            return t.sort_by([(c, "ascending")
                              for c in ("db", "key", "rtype", "field",
                                        "idx")])
        raise RuntimeError("keyspace read: generation kept advancing "
                           "mid-read — pause the racing ingest")

    def write_heartbeat(self) -> dict:
        """Liveness write-back, same shape as LakeTable's
        (state/lake.py:801): wall-clock ``time_unix`` (cross-process lag is
        the point of a heartbeat) + the nested watermark, so one monitoring
        consumer reads both families."""
        import json

        from ape_dts_ray.state.manifest import atomic_write_text

        hb = {"time_unix": time.time(), "watermark": self.watermark()}
        atomic_write_text(os.path.join(self.root, "heartbeat.json"),
                          json.dumps(hb, indent=1))
        return hb

    def follow(self, log_dir: str, poll_interval: float = 0.25,
               stop_file: str | None = None,
               max_idle_rounds: int | None = None,
               max_rounds: int | None = None):
        """Daemon tail over a growing RESP log — the Redis-family twin of
        ``replay_follow`` (pipelines/follow.py; the reference's psync loop
        keeps consuming the replication stream forever,
        redis_psync_extractor.rs:48-142). One round = one ``ingest`` call:
        consume every file at or past the committed file-seq watermark
        (no-op when caught up; out-of-sequence files are ingest's own loud
        gap refusal), heartbeat, check shutdown. Crash contract is
        ingest's: the watermark publishes only after a complete state
        generation, so SIGKILL anywhere leaves the previous generation
        live and a restarted follower converges."""
        from ape_dts_ray.pipelines.follow import FollowStats, follow_loop

        if stop_file is None:
            stop_file = os.path.join(self.root, "follow.stop")

        def one_round(stats: FollowStats) -> bool:
            if not os.path.isdir(log_dir):
                # daemon started before the producer created the log dir
                # (normal tail-before-write order): idle and poll, like the
                # lake twin — ingest()'s loud FileNotFoundError stays for
                # one-shot calls, where a typo'd path must not look caught-up
                self.write_heartbeat()
                return False
            r = self.ingest(log_dir)
            self.write_heartbeat()
            if r["files"] == 0:
                return False
            stats.replay_rounds += 1
            # one ingest = ONE atomic commit point (a single new state
            # generation), however many queued files it consumed;
            # events_applied stays 0 — ingest reports files, not events
            stats.epochs_committed += 1
            return True

        return follow_loop(stop_file, poll_interval, max_idle_rounds,
                           max_rounds, one_round)


def read_resp_log_files(paths: list[str]):
    """RESP log → element events for an explicit file list — THE parse
    path (read_resp_log delegates here): one parse task per file; offsets
    carry the file-seq stride, so read order never matters. Each file
    parses with an initial db context of 0 — a multi-db producer must
    re-emit SELECT at file start (the AOF-rewrite convention; both our
    sinkers do), since SELECT context cannot cross the file-parallel
    boundary."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse_file(batch: pa.Table) -> pa.Table:
        tables = []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            base = _file_seq(path) * RESP_FILE_STRIDE
            tables.append(scan_to_events(data, base))
        return pa.concat_tables(tables) if tables else \
            _EVENT_SCHEMA.empty_table()

    # batch_size=None: one batch per file block — the default bundles
    # many files into ONE task and collapses the per-file parallelism
    return ds.map_batches(parse_file, batch_format="pyarrow",
                          batch_size=None)
