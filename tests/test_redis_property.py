"""Property-based evidence for the Redis path.

1. RDB codec: arbitrary entries (all five container types + streams, random
   binary payloads, random encodings) encode → parse to the identical value.
2. Keyspace fold: a random command log folds to exactly what a sequential
   dict-model Redis produces (key-level SET/DEL barrier, field-level LWW,
   RPUSH order, TTL attach) — checked WITHOUT Ray (fold_events is a pure
   Arrow→Arrow function) so hypothesis can drive hundreds of cases.
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ape_dts_ray.pipelines.redis_replay import commands_to_events, fold_events
from ape_dts_ray.sources import rdb as rdbmod
from ape_dts_ray.sources.resp import encode_cmds, parse_resp

# ---------------------------------------------------------------- codec

_blob = st.binary(min_size=0, max_size=40)
_key = st.binary(min_size=1, max_size=16)
# canonical-int-looking and arbitrary strings both exercised
_element = st.one_of(_blob, st.integers(-2**40, 2**40).map(lambda i: b"%d" % i))


def _mk_string(key, value, expire):
    return {"db": 0, "key": key, "type": "string", "value": value,
            "expire_ms": expire}


def _mk_list(key, els, expire):
    return {"db": 0, "key": key, "type": "list", "elements": els,
            "expire_ms": expire}


def _mk_set(key, els, expire):
    # sets: unique members
    uniq = list(dict.fromkeys(els))
    return {"db": 0, "key": key, "type": "set", "elements": uniq,
            "expire_ms": expire}


def _mk_hash(key, pairs, expire):
    seen = {}
    for f, v in pairs:
        seen[f] = v
    return {"db": 0, "key": key, "type": "hash",
            "fields": list(seen.items()), "expire_ms": expire}


def _mk_zset(key, pairs, expire):
    seen = {}
    for m, s in pairs:
        seen[m] = s
    return {"db": 0, "key": key, "type": "zset",
            "zset": list(seen.items()), "expire_ms": expire}


_expire = st.one_of(st.just(0), st.integers(1, 2**45))
_score = st.floats(allow_nan=False, allow_infinity=False, width=32)

_entry = st.one_of(
    st.builds(_mk_string, _key, _element, _expire),
    st.builds(_mk_list, _key, st.lists(_element, max_size=12), _expire),
    st.builds(_mk_set, _key, st.lists(_element, min_size=1, max_size=12),
              _expire),
    st.builds(_mk_hash, _key,
              st.lists(st.tuples(_element, _element), min_size=1, max_size=8),
              _expire),
    st.builds(_mk_zset, _key,
              st.lists(st.tuples(_element, _score), min_size=1, max_size=8),
              _expire),
)


def _canon(e):
    t = e["type"]
    if t == "string":
        return (t, e["value"], e["expire_ms"])
    if t == "list":
        return (t, tuple(e["elements"]), e["expire_ms"])
    if t == "set":
        return (t, tuple(sorted(e["elements"])), e["expire_ms"])
    if t == "hash":
        return (t, tuple(sorted((f[0], f[1]) for f in e["fields"])),
                e["expire_ms"])
    return (t, tuple(sorted(e["zset"])), e["expire_ms"])


@settings(max_examples=150, deadline=None)
@given(st.lists(_entry, max_size=8))
def test_rdb_roundtrip_property(entries):
    # last entry wins per key, as in a real keyspace
    by_key = {e["key"]: e for e in entries}
    entries = list(by_key.values())
    img = rdbmod.encode_rdb(entries)
    _, back = rdbmod.parse_rdb(img)
    got = {e["key"]: _canon(e) for e in back}
    want = {}
    for e in entries:
        c = _canon(e)
        if e["type"] == "zset":
            # scores roundtrip through shortest-repr ASCII in packed
            # encodings — float32-valued doubles survive exactly
            pass
        want[e["key"]] = c
    assert got == want


def test_large_stream_chunks_nodes():
    n = 7000    # > 65535/10 listpack elements if unchunked
    e = {"db": 0, "key": b"big", "type": "stream", "expire_ms": 0,
         "entries": [(b"%d-0" % i, [(b"f", b"%d" % i)]) for i in range(n)],
         "last_id": b"%d-0" % (n - 1), "groups": []}
    _, back = rdbmod.parse_rdb(rdbmod.encode_rdb([e]))
    assert back[0]["entries"] == e["entries"]


# ---------------------------------------------------------------- fold

_skey = st.sampled_from([b"a", b"b", b"c"])
_fld = st.sampled_from([b"f1", b"f2"])
_val = st.sampled_from([b"v1", b"v2", b"v3"])

_cmd = st.one_of(
    st.tuples(st.just(b"SET"), _skey, _val).map(list),
    st.tuples(st.just(b"DEL"), _skey).map(list),
    st.tuples(st.just(b"HSET"), _skey, _fld, _val).map(list),
    st.tuples(st.just(b"HDEL"), _skey, _fld).map(list),
    st.tuples(st.just(b"SADD"), _skey, _fld).map(list),
    st.tuples(st.just(b"SREM"), _skey, _fld).map(list),
    st.tuples(st.just(b"ZADD"), _skey,
              st.sampled_from([b"1", b"2.5"]), _fld).map(list),
    st.tuples(st.just(b"RPUSH"), _skey, _val).map(list),
    st.tuples(st.just(b"PEXPIREAT"), _skey,
              st.sampled_from([b"1000", b"2000"])).map(list),
)


def _model(cmds):
    """Sequential dict-model of the documented fold semantics."""
    barrier: dict[bytes, int] = {}          # key -> last key-level cmd index
    strings: dict[bytes, tuple[int, bytes | None]] = {}
    fields: dict[tuple, tuple[int, str, bytes | None, float | None]] = {}
    pushes: dict[bytes, list[tuple[int, bytes]]] = {}
    ttls: dict[bytes, int] = {}
    for i, c in enumerate(cmds):
        op, k = c[0], c[1]
        if op == b"SET":
            barrier[k] = i
            strings[k] = (i, c[2])
        elif op == b"DEL":
            barrier[k] = i
            strings[k] = (i, None)
        elif op in (b"HSET", b"SADD", b"ZADD", b"HDEL", b"SREM"):
            rtype = {b"HSET": "hash", b"HDEL": "hash", b"SADD": "set",
                     b"SREM": "set", b"ZADD": "zset"}[op]
            if op == b"ZADD":
                f, v, s = c[3], None, float(c[2])
            elif op in (b"HSET",):
                f, v, s = c[2], c[3], None
            else:
                f, v, s = c[2], None, None
            add = op in (b"HSET", b"SADD", b"ZADD")
            fields[(k, rtype, f)] = (i, "add" if add else "rem", v, s)
        elif op == b"RPUSH":
            pushes.setdefault(k, []).append((i, c[2]))
        elif op == b"PEXPIREAT":
            ttls[k] = (i, int(c[2]))
    out = set()
    live_keys = set()
    for k, (i, v) in strings.items():
        if v is not None and barrier.get(k) == i:
            out.add((k, "string", None, None, v, None))
            live_keys.add(k)
    for (k, rtype, f), (i, op, v, s) in fields.items():
        if op == "add" and i > barrier.get(k, -1):
            out.add((k, rtype, f, None, v, s))
            live_keys.add(k)
    for k, items in pushes.items():
        idx = 0
        for i, v in items:
            if i > barrier.get(k, -1):
                out.add((k, "list", None, idx, v, None))
                live_keys.add(k)
                idx += 1
    # a key-level SET/DEL clears earlier TTLs: the last expire counts only
    # if it is at/after the key's barrier
    ttl_of = {}
    for k in live_keys:
        i, v = ttls.get(k, (-1, 0))
        ttl_of[k] = v if i >= barrier.get(k, -1) else 0
    return {(k, r, f, ix, v, s, ttl_of[k]) for (k, r, f, ix, v, s) in out}


@settings(max_examples=200, deadline=None)
@given(st.lists(_cmd, max_size=25))
def test_fold_matches_sequential_model(cmds):
    ev = commands_to_events(parse_resp(encode_cmds(cmds)))
    got = {(r["key"], r["rtype"], r["field"], r["idx"], r["value"],
            r["score"], r["expire_ms"])
           for r in fold_events(ev).to_pylist()}
    assert got == _model(cmds)


# -------------------------------------------- scan path ≡ per-command loop

@settings(max_examples=200, deadline=None)
@given(st.lists(_cmd, max_size=25))
def test_scan_to_events_matches_loop(cmds):
    """The columnar fast path (scan_resp + vectorized expansion) emits the
    exact event multiset of the per-command loop, for any command log the
    fold strategy generates."""
    from ape_dts_ray.pipelines.redis_replay import scan_to_events

    data = encode_cmds(cmds)
    loop = commands_to_events(parse_resp(data, 1 << 40))
    fast = scan_to_events(data, 1 << 40)
    assert loop.schema.equals(fast.schema)
    assert sorted(map(str, loop.to_pylist())) == \
        sorted(map(str, fast.to_pylist()))


def test_scan_to_events_edges():
    """Edges the strategy cannot reach: payloads containing CRLF, SELECT db
    context for fast AND slow commands, inline frames + keep-alives, RESTORE
    (slow path), empty/odd arities, error parity for unsupported commands."""
    from ape_dts_ray.pipelines.redis_replay import scan_to_events
    from ape_dts_ray.sources import rdb as rdbmod
    from ape_dts_ray.sources.resp import encode_cmd

    dump = rdbmod.dump_value({"type": "string", "value": b"hello"})
    cmds = [
        [b"SELECT", b"3"],
        [b"SET", b"crlf", b"a\r\nb\r\n"],            # payload with CRLF
        [b"set", b"lower", b"v"],                    # case-insensitive name
        [b"DEL", b"a", b"b", b"c"],
        [b"RESTORE", b"rk", b"0", dump],             # slow path under db 3
        [b"SELECT", b"0"],
        [b"ZADD", b"z", b"2.5", b"m\r\nx"],          # CRLF in member
        [b"PEXPIREAT", b"crlf", b"123456"],
        [b"PING"], [b"MULTI"], [b"EXEC"], [b"XSETID", b"s", b"1-1"],
    ]
    data = b"+FULLRESYNC abc 0\r\n" + b"\n".join(
        encode_cmd(c) for c in cmds) + b"\n"         # keep-alives interleaved
    loop = commands_to_events(parse_resp(data, 7))
    fast = scan_to_events(data, 7)
    assert sorted(map(str, loop.to_pylist())) == \
        sorted(map(str, fast.to_pylist()))
    assert any(r["db"] == 3 for r in fast.to_pylist())   # SELECT reached both

    for bad in ([[b"FLUSHALL"]], [[b"SET", b"k", b"v", b"EX", b"1"]],
                [[b"XADD", b"s", b"*", b"f", b"v"]],
                [[b"SET", b"k", b"v", b"KEEPTTL"]],
                # arity refusals must also match between the derivations:
                # dangling pair tail (Redis rejects the whole command),
                # under-arity (truncated log), XADD auto-seq id
                [[b"HSET", b"h", b"f", b"v", b"odd"]],
                [[b"ZADD", b"z", b"1.5"]],
                [[b"SET", b"k"]],
                [[b"SELECT"]],
                [[b"XADD", b"s", b"5-*", b"f", b"v"]]):
        raw = encode_cmds(bad)
        e_loop = e_fast = None
        try:
            commands_to_events(parse_resp(raw))
        except Exception as e:
            e_loop = str(e)
        try:
            scan_to_events(raw)
        except Exception as e:
            e_fast = str(e)
        assert e_loop and e_loop == e_fast


def _materialize_scan(data, scan, base=0):
    off, argc, apos, alen = scan
    out, j = [], 0
    for i in range(len(off)):
        args = [data[apos[j + k]:apos[j + k] + alen[j + k]]
                for k in range(argc[i])]
        j += argc[i]
        out.append((int(off[i]), args))
    return out


def test_scan_resp_equivalence_adversarial():
    """scan_resp ≡ parse_resp on adversarial streams: random binary args
    (CRLF injected mid-payload, empty args, pure-CRLF args), inline frames
    and keep-alives interleaved, EVERY truncation cut of a mixed stream
    (same results under tolerate_truncation, same raise/no-raise strict),
    tiny window sizes forcing frame spans across window boundaries."""
    import numpy as np

    from ape_dts_ray.sources.resp import encode_cmd, scan_resp

    rng = np.random.default_rng(3)

    def rand_cmds(n, crlf_frac=0.0):
        cmds = []
        for _ in range(n):
            args = []
            for _ in range(int(rng.integers(1, 6))):
                b = bytes(rng.integers(32, 127, int(rng.integers(0, 40)),
                                       dtype=np.uint8))
                if crlf_frac and rng.random() < crlf_frac:
                    b = b[:len(b) // 2] + b"\r\n" + b[len(b) // 2:]
                if rng.random() < 0.1:
                    b = b""
                if rng.random() < 0.05:
                    b = b"\r\n" * int(rng.integers(1, 3))
                args.append(b)
            cmds.append(args)
        return cmds

    parts = []
    for i, c in enumerate(rand_cmds(200, crlf_frac=0.25)):
        if i % 7 == 0:
            parts.append(b"+OK\r\n")
        if i % 11 == 0:
            parts.append(b"\n")
        if i % 13 == 0:
            parts.append(b":42\r\n-ERR boom\r\n")
        parts.append(encode_cmd(c))
    data = b"".join(parts)
    assert _materialize_scan(data, scan_resp(data, 9)) == parse_resp(data, 9)
    for wsz in (7, 64, 300):
        assert _materialize_scan(
            data, scan_resp(data, 9, window=wsz)) == parse_resp(data, 9)

    small = b"+OK\r\n\n" + encode_cmds(rand_cmds(25, crlf_frac=0.3))
    for cut in range(len(small) + 1):
        d = small[:cut]
        assert _materialize_scan(
            d, scan_resp(d, 5, tolerate_truncation=True)) == \
            parse_resp(d, 5, tolerate_truncation=True), cut
        e1 = e2 = None
        try:
            parse_resp(d, 5)
        except ValueError as e:
            e1 = str(e)
        try:
            _materialize_scan(d, scan_resp(d, 5))
        except ValueError as e:
            e2 = str(e)
        assert (e1 is None) == (e2 is None), (cut, e1, e2)
