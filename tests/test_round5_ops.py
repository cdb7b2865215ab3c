"""Round-5 operator additions and fixes: RDB module2 skip-parse parity,
scale-safe top-N statistic sinks, avro required-field parity, strict numeric
parse parity between the scalar and columnar RESP event derivations, and the
vectorized streaming-join Jaccard fallback edge cases."""

import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ape_dts_ray.sources import rdb as rdbmod


# ------------------------------------------------ RDB module2 skip-parse

def _module2_bytes(key: bytes, module_id: int) -> bytes:
    """A MODULE_2 entry exercising every skip opcode (1/2 ints, 3 float,
    4 double, 5 string, 0 EOF)."""
    out = bytearray()
    out.append(rdbmod.RDB_TYPE_MODULE_2)
    rdbmod.write_string(out, key, try_int=False)
    rdbmod.write_length(out, module_id)
    rdbmod.write_length(out, 1); rdbmod.write_length(out, 7)        # sint
    rdbmod.write_length(out, 2); rdbmod.write_length(out, 999999)   # uint
    out.append(3); out += struct.pack("<f", 2.5)    # 4-byte binary float
    # (rdbLoadBinaryFloatValue — redis rdb.c is normative, not the
    # reference's len-prefixed ASCII assumption)
    rdbmod.write_length(out, 4); out += struct.pack("<d", 3.5)      # double
    rdbmod.write_length(out, 5)
    rdbmod.write_string(out, b"opaque module payload", try_int=False)
    rdbmod.write_length(out, 0)                                     # EOF
    return bytes(out)


def _img(body: bytes) -> bytes:
    out = bytearray(b"REDIS0011") + body
    out.append(rdbmod.OP_EOF)
    out += struct.pack("<Q", rdbmod.crc64_redis(bytes(out)))
    return bytes(out)


def test_module2_skip_parse_keeps_rest_of_keyspace():
    """module2_parser.rs:26-73 parity: a module key is consumed positionally
    and dropped with a warning row; keys BEFORE and AFTER it parse."""
    body = bytearray()
    body.append(rdbmod.RDB_TYPE_STRING)
    rdbmod.write_string(body, b"k1", try_int=False)
    rdbmod.write_string(body, b"v1")
    body += _module2_bytes(b"modkey", (12345 << 10) | 1)
    body.append(rdbmod.RDB_TYPE_STRING)
    rdbmod.write_string(body, b"k2", try_int=False)
    rdbmod.write_string(body, b"v2")

    meta, entries = rdbmod.parse_rdb(_img(bytes(body)))
    assert [e["key"] for e in entries] == [b"k1", b"k2"]
    assert [e["value"] for e in entries] == [b"v1", b"v2"]
    skipped = meta["skipped_modules"]
    assert len(skipped) == 1
    assert skipped[0]["key"] == b"modkey" and skipped[0]["db"] == 0
    assert skipped[0]["module"] == rdbmod.module_type_name((12345 << 10) | 1)
    assert len(skipped[0]["module"]) == 9


def test_module2_expire_and_freq_do_not_leak_to_next_key():
    """An expire/LFU prefix attached to a skipped module key must not bleed
    onto the following entry."""
    body = bytearray()
    body.append(rdbmod.OP_EXPIRETIME_MS)
    body += struct.pack("<Q", 1234567890123)
    body.append(rdbmod.OP_FREQ)
    body.append(42)
    body += _module2_bytes(b"m", 1 << 10)
    body.append(rdbmod.RDB_TYPE_STRING)
    rdbmod.write_string(body, b"after", try_int=False)
    rdbmod.write_string(body, b"x")

    _, entries = rdbmod.parse_rdb(_img(bytes(body)))
    assert len(entries) == 1
    assert entries[0]["key"] == b"after"
    assert entries[0]["expire_ms"] == 0
    assert "freq" not in entries[0]


def test_module_v1_still_raises():
    body = bytearray()
    body.append(rdbmod.RDB_TYPE_MODULE)
    rdbmod.write_string(body, b"old", try_int=False)
    with pytest.raises(ValueError, match="module type v1"):
        rdbmod.parse_rdb(_img(bytes(body)))


def test_module2_unknown_opcode_raises():
    body = bytearray()
    body.append(rdbmod.RDB_TYPE_MODULE_2)
    rdbmod.write_string(body, b"m", try_int=False)
    rdbmod.write_length(body, 1 << 10)
    rdbmod.write_length(body, 9)            # not a module opcode
    with pytest.raises(ValueError, match="module opcode"):
        rdbmod.parse_rdb(_img(bytes(body)))


def test_module2_skip_property():
    """Random opcode streams: the skip walk must recover the exact stream
    position (the key AFTER the module entry always parses)."""
    import random

    rng = random.Random(17)
    for trial in range(25):
        body = bytearray()
        body.append(rdbmod.RDB_TYPE_MODULE_2)
        rdbmod.write_string(body, b"m%d" % trial, try_int=False)
        rdbmod.write_length(body, rng.getrandbits(62))
        for _ in range(rng.randrange(0, 12)):
            op = rng.choice((1, 2, 3, 4, 5))
            rdbmod.write_length(body, op)
            if op in (1, 2):
                rdbmod.write_length(body, rng.getrandbits(40))
            elif op == 3:
                # 4 raw binary bytes (rdbLoadBinaryFloatValue)
                body += struct.pack("<f", rng.uniform(-1e6, 1e6))
            elif op == 4:
                body += struct.pack("<d", rng.uniform(-1e9, 1e9))
            else:
                rdbmod.write_string(
                    body, bytes(rng.randrange(256)
                                for _ in range(rng.randrange(0, 300))),
                    try_int=False)
        rdbmod.write_length(body, 0)
        body.append(rdbmod.RDB_TYPE_STRING)
        rdbmod.write_string(body, b"sentinel", try_int=False)
        rdbmod.write_string(body, b"ok")
        meta, entries = rdbmod.parse_rdb(_img(bytes(body)))
        assert [e["key"] for e in entries] == [b"sentinel"], trial
        assert meta["skipped_modules"][0]["key"] == b"m%d" % trial


def test_jpeg_codec_property():
    """Randomized images × quality levels: decode never desyncs, shape is
    exact, error bounded by ~max quant step (spec-level bound for baseline
    roundtrip of uint8 data)."""
    rng = np.random.default_rng(23)
    from ape_dts_ray.functions import mjpeg

    for _ in range(12):
        h = int(rng.integers(1, 50))
        w = int(rng.integers(1, 50))
        q = int(rng.integers(10, 100))
        kind = rng.integers(0, 3)
        if kind == 0:
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        elif kind == 1:
            img = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
        else:
            yy, xx = np.mgrid[0:h, 0:w]
            img = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
        dec = mjpeg.decode_baseline_jpeg_luma(
            mjpeg.encode_baseline_jpeg_gray(img, q))
        assert dec.shape == (h, w)
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        qmax = int(mjpeg.scale_quant(mjpeg.STD_LUM_QUANT, q).max())
        assert err <= max(8, 2 * qmax), (h, w, q, err, qmax)


# --------------------------------------- scale-safe top-N statistic sinks

@pytest.mark.usefixtures("ray_session")
def test_bigkey_topn_partial_reduce_bounds_sort_input(monkeypatch):
    """threshold=0, top_n=K over a large keyspace: the rows entering the
    final total-order sort are bounded by partitions × K (per-partition
    partial top-N), and the result equals the brute-force top-K."""
    import ray.data as rd

    from ape_dts_ray.pipelines.redis_replay import (KEYSPACE_SCHEMA,
                                                    bigkey_statistics)

    n_keys, top_n, parts = 600, 3, 8
    rows = [{"db": 0, "key": f"key{i:05d}".encode(), "rtype": "string",
             "field": None, "idx": None, "value": b"v" * (i % 97 + 1),
             "score": None, "expire_ms": 0, "field_ttl_ms": 0}
            for i in range(n_keys)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=KEYSPACE_SCHEMA))

    captured = {}
    orig_sort = rd.Dataset.sort

    def spy_sort(self, *a, **k):
        captured["rows"] = self.count()
        return orig_sort(self, *a, **k)

    monkeypatch.setattr(rd.Dataset, "sort", spy_sort)
    out = pa.concat_tables(
        bigkey_statistics(ds, data_size_threshold=0, top_n=top_n,
                          num_partitions=parts)
        .iter_batches(batch_format="pyarrow")).to_pylist()
    monkeypatch.setattr(rd.Dataset, "sort", orig_sort)

    assert captured["rows"] <= parts * top_n       # never a full-keyspace sort
    brute = sorted(
        ((len(r["key"]) + len(r["value"]), r["key"].decode()) for r in rows),
        key=lambda t: (-t[0], t[1]))[:top_n]
    assert [(r["data_size"], r["key"]) for r in out] == brute


@pytest.mark.usefixtures("ray_session")
def test_hotkey_topn_partial_reduce(monkeypatch):
    import ray.data as rd

    from ape_dts_ray.pipelines.redis_replay import hotkey_statistics

    schema = pa.schema([("db_id", pa.int64()), ("key_type", pa.string()),
                        ("key", pa.binary()), ("data_size", pa.int64()),
                        ("freq", pa.int64())])
    blocks = []
    for b in range(4):
        blocks.append(pa.Table.from_pylist(
            [{"db_id": 0, "key_type": "string",
              "key": f"k{b}_{i:04d}".encode(), "data_size": 10,
              "freq": (i * 7 + b) % 200} for i in range(300)],
            schema=schema))
    ds = rd.from_arrow(blocks)

    captured = {}
    orig_sort = rd.Dataset.sort

    def spy_sort(self, *a, **k):
        captured["rows"] = self.count()
        return orig_sort(self, *a, **k)

    monkeypatch.setattr(rd.Dataset, "sort", spy_sort)
    out = pa.concat_tables(
        hotkey_statistics(ds, freq_threshold=0, top_n=5)
        .iter_batches(batch_format="pyarrow")).to_pylist()
    monkeypatch.setattr(rd.Dataset, "sort", orig_sort)

    assert captured["rows"] <= 4 * 5
    all_rows = [r for t in blocks for r in t.to_pylist()]
    brute = sorted(((r["freq"], r["key"].decode()) for r in all_rows),
                   key=lambda t: (-t[0], t[1]))[:5]
    assert [(r["freq"], r["key"]) for r in out] == brute


# --------------------------------------------- avro required-field parity

def test_avro_encode_missing_required_int_field_raises():
    """Scalar parity (encode_event raises KeyError on absent turn_idx /
    offset); only seq defaults to 0."""
    from ape_dts_ray.stages.avro import avro_decode, avro_encode

    base = {"log_offset": [1, 2], "op": ["insert", "update"],
            "conv_id": ["c1", "c2"], "turn_idx": [0, 1]}
    ok = avro_encode(pa.table(base))                   # seq absent → 0
    dec = avro_decode(ok.select(["value"]))
    assert dec.column("seq").to_pylist() == [0, 0]

    for missing in ("turn_idx", "log_offset"):
        cols = {k: v for k, v in base.items() if k != missing}
        with pytest.raises(KeyError, match=missing):
            avro_encode(pa.table(cols))


# --------------------------- strict numeric parity (scalar ≡ columnar RESP)

def test_numeric_parse_parity_nonclean_forms():
    """Both event derivations must accept/reject IDENTICAL byte forms for
    ZADD scores and PEXPIREAT ms (the event-multiset-equality contract);
    Python float()/int() used to be laxer than the fast path's Arrow casts
    (b'1_0' → 10.0, b'+5', padded numbers)."""
    from ape_dts_ray.pipelines.redis_replay import (commands_to_events,
                                                    scan_to_events)
    from ape_dts_ray.sources.resp import encode_cmds, parse_resp

    def outcomes(data):
        res = []
        for fn in (lambda: commands_to_events(parse_resp(data)),
                   lambda: scan_to_events(data)):
            try:
                res.append(("ok", sorted(map(str, fn().to_pylist()))))
            except Exception as e:
                res.append(("err", type(e).__name__))
        return res

    zadd_forms = [b"1_0", b"+5", b" 5", b"5 ", b"1e3", b"2.5", b"-0",
                  b"nan", b"inf", b"0x10", b"", b"12"]
    for arg in zadd_forms:
        got = outcomes(encode_cmds([[b"ZADD", b"z", arg, b"m"]]))
        assert got[0] == got[1], (arg, got)
    assert outcomes(encode_cmds([[b"ZADD", b"z", b"1_0", b"m"]]))[0][0] == "err"

    ms_forms = [b"1_0", b"+5", b" 5", b"5.0", b"99", b"", b"-1"]
    for arg in ms_forms:
        got = outcomes(encode_cmds([[b"PEXPIREAT", b"k", arg]]))
        assert got[0] == got[1], (arg, got)
    assert outcomes(encode_cmds([[b"PEXPIREAT", b"k", b"99"]]))[0][0] == "ok"


# ------------------------------------------------------- MJPEG-in-AVI video

def _gradient_clip(n, h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return [np.clip(128 + 60 * np.sin(xx / 9 + k + seed)
                    + 40 * np.cos(yy / 7 - k), 0, 255).astype(np.uint8)
            for k in range(n)]


def test_baseline_jpeg_codec_roundtrip():
    """Pure-numpy baseline JPEG: encode (Annex K tables) → decode (tables
    read from the stream) with bounded quantization error, including odd
    dimensions, flat blocks, ZRL runs and noise at low quality."""
    from ape_dts_ray.functions import mjpeg

    rng = np.random.default_rng(11)
    for (h, w), q, tol in [((48, 64), 90, 6), ((17, 23), 85, 40),
                           ((8, 8), 50, 64), ((1, 70), 95, 8)]:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8) if q < 90 else \
            _gradient_clip(1, h, w)[0]
        dec = mjpeg.decode_baseline_jpeg_luma(
            mjpeg.encode_baseline_jpeg_gray(img, q))
        assert dec.shape == (h, w)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= tol
    # sparse high-frequency block exercises the ZRL path
    img = np.zeros((8, 8), np.uint8)
    img[7, 7] = 255
    dec = mjpeg.decode_baseline_jpeg_luma(
        mjpeg.encode_baseline_jpeg_gray(img, 95))
    assert dec.shape == (8, 8)
    with pytest.raises(ValueError):
        mjpeg.decode_baseline_jpeg_luma(b"not a jpeg")


def test_jpeg_default_huffman_tables():
    """Real-world MJPEG frames commonly omit DHT and rely on the Annex K
    defaults — strip the DHT segments from an encoded frame and the decoder
    must reconstruct via the standard tables (identical bytes to the
    DHT-carrying decode). All four default tables must be self-consistent."""
    from ape_dts_ray.functions import mjpeg

    for bits, vals in ((mjpeg.DC_LUM_BITS, mjpeg.DC_LUM_VALS),
                       (mjpeg.AC_LUM_BITS, mjpeg.AC_LUM_VALS),
                       (mjpeg.DC_CHROM_BITS, mjpeg.DC_CHROM_VALS),
                       (mjpeg.AC_CHROM_BITS, mjpeg.AC_CHROM_VALS)):
        assert sum(bits) == len(vals)
        mjpeg._decode_table(bits, vals)      # canonical build, no collisions

    img = _gradient_clip(1, 32, 40)[0]
    full = mjpeg.encode_baseline_jpeg_gray(img, 88)
    out, i = bytearray(full[:2]), 2
    while i < len(full):                     # drop every DHT segment
        m = full[i + 1]
        if m == 0xDA or m == 0xD9:
            out += full[i:]
            break
        ln = struct.unpack(">H", full[i + 2:i + 4])[0]
        if m != 0xC4:
            out += full[i:i + 2 + ln]
        i += 2 + ln
    stripped = bytes(out)
    assert b"\xff\xc4" not in stripped[:stripped.find(b"\xff\xda")]
    dec = mjpeg.decode_baseline_jpeg_luma(stripped)
    assert (dec == mjpeg.decode_baseline_jpeg_luma(full)).all()


def test_jpeg_dqt_wire_order_and_malformed_frames():
    """Review findings: (a) the DQT payload must be ZIGZAG-serialized from
    the natural-order Annex K table (a self-consistently-permuted codec
    would still roundtrip — check the wire bytes independently); (b) a
    truncated entropy segment and an SOS referencing an undeclared
    component must raise catchable errors, and non-strict SampleFrames must
    stub, not crash."""
    from ape_dts_ray.functions import mjpeg, multimodal

    img = _gradient_clip(1, 16, 16)[0]
    j = mjpeg.encode_baseline_jpeg_gray(img, 75)
    i = j.find(b"\xff\xdb")
    payload = np.frombuffer(j[i + 5:i + 5 + 64], np.uint8).astype(np.int64)
    nat = np.zeros(64, np.int64)
    nat[mjpeg.ZIGZAG] = payload             # descramble the wire bytes
    want = mjpeg.scale_quant(mjpeg.STD_LUM_QUANT, 75)
    assert (nat == want).all()              # natural order recovered exactly

    # truncated entropy segment → catchable error, and non-strict stubs
    trunc = j[:-6]
    with pytest.raises((EOFError, ValueError, IndexError)):
        mjpeg.decode_baseline_jpeg_luma(trunc)
    avi = mjpeg.encode_avi_mjpeg([trunc], 16, 16)
    with pytest.raises((EOFError, ValueError, IndexError)):
        multimodal.SampleFrames(2, 4, strict=True)._frame_rows(avi)
    rows = multimodal.SampleFrames(2, 4, strict=False)._frame_rows(avi)
    assert len(rows) == 2

    # SOS referencing a component not in SOF → ValueError, not StopIteration
    s = j.find(b"\xff\xda")
    bad = bytearray(j)
    bad[s + 5] = 9                          # scan component id 9, SOF has 1
    with pytest.raises(ValueError, match="not declared"):
        mjpeg.decode_baseline_jpeg_luma(bytes(bad))


@pytest.mark.usefixtures("ray_session")
def test_follow_vanished_segment_evicted(tmp_path):
    """Review finding: a segment deleted after being footer-cached
    (retention of a segment fully BELOW the pending floor) must be evicted
    — no dead path handed to replay, no phantom log_max — and the follower
    keeps consuming new segments normally. The TAIL-range segment is NOT
    safe retention (the tail epoch's recommit re-reads it; a boundary snap
    would silently lose its rows) — pruning it is the loud refusal
    covered by test_segment_vanish_above_floor_refuses."""
    import threading
    import time as _time

    from ape_dts_ray.fixtures import gen_events, oracle_replay
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.follow import replay_follow
    from ape_dts_ray.state.lake import LakeTable

    events = gen_events(seed=75, n_convs=20, max_turns=6, n_events=3000)
    n = events.num_rows
    bounds = [0, n // 3, 2 * n // 3, n]
    segs = [events.slice(bounds[i], bounds[i + 1] - bounds[i])
            for i in range(3)]
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    maxes = [int(pc.max(s.column("log_offset")).as_py()) for s in segs]

    log = tmp_path / "log"
    log.mkdir()
    lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(num_partitions=4, epoch_size=500))
    stop = str(tmp_path / "stop")
    box = {}

    def run():
        try:
            box["stats"] = replay_follow(lake, str(log), poll_interval=0.05,
                                         stop_file=stop, pipeline_depth=1)
        except BaseException as e:
            box["exc"] = e

    th = threading.Thread(target=run)
    th.start()
    try:
        for i in (0, 1):
            pq.write_table(segs[i], str(tmp_path / f"s{i}.tmp"))
            os.rename(str(tmp_path / f"s{i}.tmp"),
                      str(log / f"seg{i:04d}.parquet"))
        t0 = _time.time()
        while (LakeTable.open(lake.root).watermark() < maxes[1]
               and _time.time() - t0 < 120):
            _time.sleep(0.05)
        # retention: delete the INTERIOR committed segment (fully below the
        # pending floor — seg1's tail-epoch range must stay)
        os.unlink(str(log / "seg0000.parquet"))
        _time.sleep(0.5)                    # several idle scans post-eviction
        assert "exc" not in box
        pq.write_table(segs[2], str(tmp_path / "s2.tmp"))
        os.rename(str(tmp_path / "s2.tmp"), str(log / "seg0002.parquet"))
        t0 = _time.time()
        while (LakeTable.open(lake.root).watermark() < maxes[2]
               and _time.time() - t0 < 120):
            if "exc" in box:
                raise box["exc"]
            _time.sleep(0.05)
    finally:
        open(stop, "w").close()
        th.join(timeout=120)
    assert "exc" not in box, box.get("exc")
    state = LakeTable.open(lake.root).state_table().to_pandas()
    oracle = oracle_replay(events)
    assert len(state) == len(oracle)
    assert list(state["text"]) == list(oracle["text"])


def test_avi_container_walk():
    from ape_dts_ray.functions import mjpeg

    frames = _gradient_clip(7, 24, 32)
    jpegs = [mjpeg.encode_baseline_jpeg_gray(f, 90) for f in frames]
    avi = mjpeg.encode_avi_mjpeg(jpegs, 32, 24, fps=5)
    assert mjpeg.is_avi(avi)
    chunks = mjpeg.avi_frame_chunks(avi)
    assert chunks == jpegs                   # byte-exact payload recovery
    with pytest.raises(ValueError):
        mjpeg.avi_frame_chunks(b"RIFF\x04\x00\x00\x00WAVE")


@pytest.mark.usefixtures("ray_session")
def test_video_mjpeg_avi_strict_frame_sampling_end_to_end():
    """The Y4M end-to-end contract now holds for MJPEG AVIs too: strict
    SampleFrames decodes real frames (RIFF walk → JPEG luma), even spacing,
    features recomputed locally within quantization tolerance."""
    import ray.data as rd

    from ape_dts_ray.functions import mjpeg, multimodal

    clips = [_gradient_clip(10, 24, 32, seed=0), _gradient_clip(3, 16, 16,
                                                                seed=5)]
    payloads = [mjpeg.encode_avi_mjpeg(
        [mjpeg.encode_baseline_jpeg_gray(f, 92) for f in c],
        c[0].shape[1], c[0].shape[0]) for c in clips]
    tbl = pa.table({"media_id": pa.array([0, 1], pa.int64()),
                    "payload": pa.array(payloads, type=pa.binary())})
    out = rd.from_arrow(tbl).map_batches(
        multimodal.SampleFrames, fn_constructor_args=(4, 8, True),
        batch_format="pyarrow", batch_size=1, concurrency=2).take_all()
    assert {(r["media_id"], r["frame_idx"]) for r in out} == \
        {(0, f) for f in range(4)} | {(1, f) for f in range(3)}
    pick = np.unique(np.linspace(0, 9, 4, dtype=np.int64))
    luma = clips[0][pick[1]]
    want = (multimodal.resize_nearest(luma.astype(np.float64), 8, 8)
            .mean(axis=0) / 255.0)
    got = np.array([r for r in out
                    if r["media_id"] == 0 and r["frame_idx"] == 1][0]["feature"])
    assert np.abs(got - want).max() < 0.05   # JPEG quantization tolerance


def test_non_mjpeg_avi_strict_raises_nonstrict_stubs():
    from ape_dts_ray.functions import mjpeg, multimodal

    avi = mjpeg.encode_avi_mjpeg([b"\x00\x01h264-ish payload"], 8, 8)
    with pytest.raises(NotImplementedError):
        multimodal.SampleFrames(2, 4, strict=True)._frame_rows(avi)
    rows = multimodal.SampleFrames(2, 4, strict=False)._frame_rows(avi)
    assert len(rows) == 2 and all(len(f) == 4 for _, f in rows)


def test_decode_image_jpeg_path():
    from ape_dts_ray.functions import mjpeg, multimodal

    dec = multimodal.DecodeImage(out_size=8, strict=True)
    if dec._pil is not None:
        pytest.skip("PIL present")
    img = _gradient_clip(1, 32, 32)[0]
    feat = dec._decode(mjpeg.encode_baseline_jpeg_gray(img, 92))
    want = multimodal.resize_nearest(img.astype(np.float64), 8, 8) / 255.0
    assert np.abs(feat - want).max() < 0.05


# --------------------------------------------- DCL routing (filter→route→log)

def test_dcl_filter_route_log_chain():
    """DCL composes with the Router like every other statement family: the
    classified+filtered statements' default_schema is mapped through the
    schema map (route_ddl's tail, rdb_router.rs:184-186 — per-statement DCL
    rewrite is a marked TODO in the reference, base_extractor.rs:126-128),
    the statement text stays the untouched sink payload, and reverse()
    routes the log back to source schemas."""
    from ape_dts_ray.stages.dcl import DclFilter, classify_dcl_batch
    from ape_dts_ray.stages.router import Router

    t = pa.table({
        "log_offset": [1, 2, 3, 4, 5],
        "default_schema": ["app", "app", "legacy", "other", "app"],
        "statement": [
            "CREATE USER 'u'@'%' IDENTIFIED BY 'x'",
            "GRANT SELECT ON app.* TO 'u'@'%'",
            "DROP USER 'old'@'%'",
            "INSERT INTO t VALUES (1)",          # DML: dropped pre-filter
            "SET DEFAULT ROLE r TO 'u'@'%'",     # filtered by do_dcls
        ]})
    router = Router(schema_map={"app": "app_v2", "legacy": "archive"})
    filt = DclFilter(do_dcls=("create_user", "grant", "drop_user"))
    out = router.dcl_batch_fn()(filt(classify_dcl_batch(t)))

    assert out.column("dcl_type").to_pylist() == \
        ["create_user", "grant", "drop_user"]
    assert out.column("default_schema").to_pylist() == \
        ["app_v2", "app_v2", "archive"]
    assert out.column("statement").to_pylist()[0].startswith("CREATE USER")

    back = router.reverse().dcl_batch_fn()(out)
    assert back.column("default_schema").to_pylist() == \
        ["app", "app", "legacy"]
    # unmapped schemas pass through untouched
    t2 = pa.table({"default_schema": ["unmapped"], "statement": ["GRANT x"]})
    routed = router.dcl_batch_fn()(classify_dcl_batch(t2))
    assert routed.column("default_schema").to_pylist() == ["unmapped"]


# ------------------------------ vectorized Jaccard fallback edge semantics

@pytest.mark.usefixtures("ray_session")
def test_verify_pairs_jaccard_vectorized_edges():
    """Empty/None texts keep jaccard()'s conventions (both-empty → 1.0,
    one-empty → 0.0) through the exploded-merge kernel, and the output
    matches the scalar jaccard() on every pair."""
    import ray.data as rd

    from ape_dts_ray.functions.dedup import jaccard, verify_pairs_jaccard

    texts = {0: "the quick brown fox jumps over the lazy dog",
             1: "the quick brown fox jumps over the lazy cat",
             2: "completely different content here",
             3: "", 4: None, 5: "the quick brown fox jumps over the lazy dog"}
    pairs = [(0, 1), (0, 2), (3, 4), (0, 3), (0, 5), (1, 5)]
    df = pd.DataFrame({
        "a": [a for a, _ in pairs], "b": [b for _, b in pairs],
        "text_a": pd.array([texts[a] for a, _ in pairs], dtype="string"),
        "text_b": pd.array([texts[b] for _, b in pairs], dtype="string")})
    thr = 0.6
    out = verify_pairs_jaccard(rd.from_pandas(df), thr, shingle_k=5).to_pandas()
    got = set(zip(out["a"], out["b"]))
    want = {(a, b) for a, b in pairs
            if jaccard(texts[a] or "", texts[b] or "", 5) >= thr}
    assert got == want
    assert (3, 4) in got                       # both-empty pair is 1.0


# ------------------------------------------------ RBAC structure-state fold

def _rbac_fold_frame(df):
    """Simulate the distributed fold path (prefold per batch → group fold)
    on a plain DataFrame, mirroring fold_rbac()'s stages without Ray."""
    from ape_dts_ray.stages.rbac import fold_rbac_group, prefold_rbac_batch

    pre = prefold_rbac_batch(df)
    groups = [fold_rbac_group(g) for _, g in pre.groupby("rbac_key")]
    out = pd.concat(groups, ignore_index=True) if groups else pre.iloc[:0]
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def _rbac_events(stmts):
    from ape_dts_ray.stages.dcl import classify_dcl_batch
    from ape_dts_ray.stages.rbac import extract_rbac_batch

    t = pa.table({"log_offset": pa.array(range(len(stmts)), pa.int64()),
                  "statement": pa.array(stmts, pa.string())})
    return extract_rbac_batch(classify_dcl_batch(t))


def test_rbac_fold_scenario():
    """pg_create_rbac_statement.rs analog over a statement log: DROP USER
    wipes prior grants and bindings, a re-created account starts clean,
    revoke kills one privilege of an exploded multi-grant, password follows
    the last create/alter, role lifecycle is last-create/drop-wins."""
    ev = _rbac_events([
        "CREATE USER 'a'@'%' IDENTIFIED BY 'p0'",            # 0
        "GRANT SELECT, INSERT ON db.t TO 'a'@'%'",           # 1 explode
        "REVOKE INSERT ON db.t FROM 'a'@'%'",                # 2
        "Grant All On *.* To 'a'@'%' WITH GRANT OPTION",     # 3
        "ALTER USER 'a'@'%' IDENTIFIED BY 'p4'",             # 4
        "DROP USER IF EXISTS 'a'@'%'",                       # 5 wipes 1,3
        "CREATE USER 'a'@'%' IDENTIFIED BY 'p6'",            # 6 clean slate
        "GRANT SELECT ON db2.t TO 'a'@'%'",                  # 7 survives
        "SET DEFAULT ROLE 'r9' TO 'a'@'%'",                  # 8 survives
        "CREATE ROLE 'r9'",                                  # 9
        "CREATE ROLE 'dead'",                                # 10
        "Drop Role 'dead'",                                  # 11
        "CREATE USER 'gone'@'h' IDENTIFIED BY 'x'",          # 12
        "GRANT SELECT ON g.t TO 'gone'@'h'",                 # 13
        "DROP USER 'gone'@'h'",                              # 14 kills both
    ])
    out = _rbac_fold_frame(ev.to_pandas())
    got = {(r.kind, r.user_name, r.host, r.role_name, r.grant_object,
            r.privilege, r.with_grant, r.password)
           for r in out.itertuples(index=False)}
    assert got == {
        ("user", "a", "%", "", "", "", False, "p6"),
        ("grant", "a", "%", "", "db2.t", "SELECT", False, ""),
        ("default_role", "a", "%", "r9", "", "", False, ""),
        ("role", "", "", "r9", "", "", False, ""),
    }
    # password came from the post-recreate create (p6), not the wiped alter
    assert out.loc[out.kind == "user", "log_offset"].iat[0] == 6


def test_rbac_prefold_is_lossless_and_bounding():
    """The per-batch partial reduce keeps fold results identical under any
    batch split AND bounds shuffle rows by entity count, not log length."""
    from ape_dts_ray.stages.rbac import prefold_rbac_batch

    rng = np.random.default_rng(7)
    stmts = []
    for i in range(600):
        u, r, db = rng.integers(4), rng.integers(3), rng.integers(2)
        stmts.append(rng.choice([
            f"CREATE USER 'u{u}'@'%' IDENTIFIED BY 'pw{i}'",
            f"DROP USER 'u{u}'@'%'",
            f"ALTER USER 'u{u}'@'%' IDENTIFIED BY 'pw{i}'",
            f"CREATE ROLE 'r{r}'",
            f"DROP ROLE 'r{r}'",
            f"GRANT SELECT, INSERT ON db{db}.t TO 'u{u}'@'%'",
            f"REVOKE SELECT ON db{db}.t FROM 'u{u}'@'%'",
            f"SET DEFAULT ROLE 'r{r}' TO 'u{u}'@'%'",
        ]))
    df = _rbac_events(stmts).to_pandas()
    whole = _rbac_fold_frame(df)
    # arbitrary 3-way split, batches prefolded independently then combined
    cut1, cut2 = len(df) // 3, 2 * len(df) // 3
    pre = pd.concat([prefold_rbac_batch(df.iloc[:cut1]),
                     prefold_rbac_batch(df.iloc[cut1:cut2]),
                     prefold_rbac_batch(df.iloc[cut2:])])
    split = _rbac_fold_frame(pre)
    pd.testing.assert_frame_equal(whole, split)
    # 600 events over ≤4 users × ≤3 roles × few grains → far fewer rows
    assert len(prefold_rbac_batch(df)) < len(df) / 4


def test_rbac_bucket_fold_equals_group_fold():
    """The vectorized multi-principal bucket fold (the fold_rbac hot path)
    must be row-identical to the per-principal reference fold on a
    randomized log — same state under any bucket assignment."""
    from ape_dts_ray.stages.rbac import (STATE_COLS, fold_rbac_bucket,
                                         prefold_rbac_batch)

    rng = np.random.default_rng(11)
    stmts = []
    for i in range(800):
        u, h, r, db = (rng.integers(6), rng.integers(2), rng.integers(4),
                       rng.integers(3))
        stmts.append(rng.choice([
            f"CREATE USER 'u{u}'@'h{h}' IDENTIFIED BY 'pw{i}'",
            f"DROP USER 'u{u}'@'h{h}'",
            f"ALTER USER 'u{u}'@'h{h}' IDENTIFIED BY 'pw{i}'",
            f"CREATE ROLE 'r{r}'",
            f"DROP ROLE 'r{r}'",
            f"GRANT SELECT, UPDATE ON db{db}.t TO 'u{u}'@'h{h}'",
            f"GRANT ALL ON *.* TO 'u{u}'@'h{h}' WITH GRANT OPTION",
            f"REVOKE UPDATE ON db{db}.t FROM 'u{u}'@'h{h}'",
            f"SET DEFAULT ROLE 'r{r}' TO 'u{u}'@'h{h}'",
        ]))
    df = _rbac_events(stmts).to_pandas()
    want = _rbac_fold_frame(df)                    # per-principal reference
    pre = prefold_rbac_batch(df)
    # split principals across 3 arbitrary buckets the way fold_rbac's hash
    # does (any principal-complete split must give the same union)
    bucket = pd.util.hash_array(pre["rbac_key"].to_numpy(dtype=object)) % 3
    got = pd.concat([fold_rbac_bucket(pre[bucket == b]) for b in range(3)],
                    ignore_index=True)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        want[list(STATE_COLS)].reset_index(drop=True), got)
    # single-bucket path too (everything in one group)
    one = fold_rbac_bucket(pre).sort_values(list(got.columns))
    pd.testing.assert_frame_equal(
        want[list(STATE_COLS)].reset_index(drop=True),
        one.reset_index(drop=True))


def test_rbac_malformed_statement_ignored():
    """dcl_parser.rs:175-180 policy: a statement its family regex cannot
    extract is ignored, never an error, and neighbors still fold."""
    ev = _rbac_events([
        "CREATE USER 'ok'@'%' IDENTIFIED BY 'p'",
        "GRANT broken syntax with no account",       # classified grant, no TO
        "CREATE USER missing_quotes@nohost",         # no 'x'@'y' literal
    ])
    df = ev.to_pandas()
    assert set(zip(df.kind, df.action)) == {("user", "create")}
    assert df.user_name.tolist() == ["ok"]


def test_rbac_to_sqls_order_and_structure_filter():
    """to_sqls parity: dependency order (roles → users → grants →
    default-role) and rdb_filter.rs:126-129 structure gating — '*' keeps,
    a set without 'rbac' drops everything, empty set drops everything."""
    from ape_dts_ray.stages.rbac import filter_structure, rbac_to_sqls

    ev = _rbac_events([
        "CREATE ROLE 'r1'",
        "CREATE USER 'b'@'%' IDENTIFIED BY 'p'",
        "GRANT ALL ON *.* TO 'b'@'%' WITH GRANT OPTION",
        "SET DEFAULT ROLE 'r1' TO 'b'@'%'",
    ])
    state = _rbac_fold_frame(ev.to_pandas())
    sqls = rbac_to_sqls(state, do_structures=("*",))
    kinds = [k.split(".")[1] for k, _ in sqls]
    assert kinds == ["role", "user", "grant", "default_role"]
    assert sqls[2][1] == "GRANT ALL ON *.* TO 'b'@'%' WITH GRANT OPTION"
    assert rbac_to_sqls(state, do_structures=("table", "index")) == []
    assert rbac_to_sqls(state, do_structures=()) == []
    assert not filter_structure("rbac", ("rbac",))
    assert filter_structure("rbac", ("constraint",))


# ------------------------------------------- index structures + struct_sqls

def _idx_lake(tmp_path, name="ilake"):
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.state.lake import LakeTable

    return LakeTable.create(str(tmp_path / name), TableMeta(),
                            EngineConfig(num_partitions=4, epoch_size=500))


def test_index_descriptors_roundtrip_and_unique_sets(tmp_path):
    """structure/index.rs analog: descriptors persist through _table.json,
    kinds validate against the IndexKind set, and unique-kind indexes join
    the unique constraints in unique_column_sets()."""
    from ape_dts_ray.state.lake import LakeTable

    lake = _idx_lake(tmp_path)
    lake.set_constraints([{"type": "unique", "cols": ["conv_id", "turn_idx"]}])
    lake.set_indexes([
        {"name": "ix_ts", "cols": ["ts"]},
        {"name": "uq_role_ts", "cols": ["role", "ts"], "kind": "UNIQUE"},
        {"name": "ft_text", "cols": ["text"], "kind": "fulltext"},
    ])
    re_open = LakeTable.open(lake.root)
    assert re_open.indexes == [
        {"name": "ix_ts", "cols": ["ts"], "kind": ""},
        {"name": "uq_role_ts", "cols": ["role", "ts"], "kind": "unique"},
        {"name": "ft_text", "cols": ["text"], "kind": "fulltext"},
    ]
    assert re_open.unique_column_sets() == (("conv_id", "turn_idx"),
                                            ("role", "ts"))
    assert re_open.cluster_sort_cols() == ["ts", "conv_id", "turn_idx"]
    with pytest.raises(ValueError):
        lake.set_indexes([{"name": "x", "cols": ["a"], "kind": "hashish"}])
    with pytest.raises(ValueError):
        lake.set_indexes([{"name": "x", "cols": []}])


def test_struct_sqls_emission_and_structure_filter(tmp_path):
    """to_sqls parity (mysql_create_table_statement.rs:36-105): btree and
    unique indexes JOIN into one ALTER, fulltext emits standalone, UNIQUE
    kind is gated under 'table' (not 'index') exactly like the reference,
    and every family honors filter_structure."""
    from ape_dts_ray.meta import transcript_schema
    from ape_dts_ray.stages.ddl import struct_sqls

    lake = _idx_lake(tmp_path)
    lake.set_constraints([{"type": "not_null", "col": "role"}])
    lake.set_sequences([{"name": "seq_turn", "col": "turn_idx",
                         "next_value": 41}])
    lake.set_comments([{"type": "table", "comment": "conv transcripts"}])
    lake.set_indexes([
        {"name": "ix_ts", "cols": ["ts"]},
        {"name": "uq_role_ts", "cols": ["role", "ts"], "kind": "unique"},
        {"name": "ft_text", "cols": ["text"], "kind": "fulltext"},
    ])
    schema = transcript_schema()

    sqls = dict(struct_sqls(lake, schema, do_structures=("*",)))
    assert sqls["table.transcripts"].startswith(
        "CREATE TABLE `transcripts` (`conv_id` TEXT, `turn_idx` INT,")
    assert sqls["table.transcripts"].endswith(
        "PRIMARY KEY (`conv_id`, `turn_idx`))")
    assert sqls["index.transcripts"] == (
        "ALTER TABLE `transcripts` ADD INDEX `ix_ts` (`ts`), "
        "ADD UNIQUE INDEX `uq_role_ts` (`role`, `ts`)")
    assert sqls["index.transcripts.ft_text"] == (
        "CREATE FULLTEXT INDEX `ft_text` ON `transcripts` (`text`)")
    assert sqls["constraint.transcripts.nn_role"] == (
        "ALTER TABLE `transcripts` ADD CONSTRAINT `nn_role` "
        "CHECK (`role` IS NOT NULL)")
    assert sqls["sequence.seq_turn"] == (
        'CREATE SEQUENCE "seq_turn" START WITH 41 INCREMENT BY 1')
    assert sqls["comment.transcripts"] == (
        "COMMENT ON TABLE \"transcripts\" IS 'conv transcripts'")

    # index-only view: table CREATE and the unique index are gated OUT
    # under 'table' (reference :50-55), plain+fulltext stay
    only_idx = dict(struct_sqls(lake, None, do_structures=("index",)))
    assert set(only_idx) == {"index.transcripts",
                             "index.transcripts.ft_text"}
    assert "UNIQUE" not in only_idx["index.transcripts"]
    # table view carries the unique index append but not the plain one
    only_tb = dict(struct_sqls(lake, schema, do_structures=("table",)))
    assert only_tb["index.transcripts"] == (
        "ALTER TABLE `transcripts` ADD UNIQUE INDEX `uq_role_ts` "
        "(`role`, `ts`)")
    assert struct_sqls(lake, None, do_structures=()) == []
    with pytest.raises(ValueError):
        struct_sqls(lake, None, do_structures=("table",))   # schema needed


@pytest.mark.usefixtures("ray_session")
def test_compact_clusters_base_by_first_index(tmp_path):
    """A registered index makes compact() cluster each base partition by the
    index columns (+ id tiebreak): row-group stats become prunable on the
    indexed column, state is unchanged, and the clustered re-fold stays
    byte-deterministic."""
    import hashlib

    import pyarrow.parquet as pq

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.pipelines.replay import replay

    events = gen_events(seed=43, n_convs=30, max_turns=6, n_events=2500,
                        delete_frac=0.1)
    path = str(tmp_path / "e.parquet")
    pq.write_table(events, path)

    plain = _idx_lake(tmp_path, "plain")
    replay(plain, events_path=path)
    plain.compact(parallel=False)

    lake = _idx_lake(tmp_path, "clustered")
    lake.set_indexes([{"name": "ix_role_ts", "cols": ["role", "ts"]}])
    replay(lake, events_path=path)
    lake.compact(parallel=False)

    import pandas as pd
    hashes = {}
    seen_base = 0
    for pid in range(lake.config.num_partitions):
        bp = lake.base_path(pid)
        if not os.path.exists(bp):
            continue
        seen_base += 1
        df = pq.read_table(bp).to_pandas()
        key = df[["role", "ts", "conv_id", "turn_idx"]]
        assert (pd.MultiIndex.from_frame(key).is_monotonic_increasing
                ), f"partition {pid} not clustered"
        with open(bp, "rb") as f:
            hashes[pid] = hashlib.md5(f.read()).hexdigest()
    assert seen_base > 0
    # same live state as the unclustered lake (order-insensitive)
    a = plain.state_table().to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    b = lake.state_table().to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


@pytest.mark.usefixtures("ray_session")
def test_unique_index_enforced_at_snapshot_load(tmp_path):
    """A unique-kind index is enforced exactly like a unique constraint
    (rdb_meta_manager.rs:82-96 reads unique indexes as candidate keys):
    load_snapshot rejects a snapshot violating it within a partition."""
    import ray.data as rd

    from ape_dts_ray.pipelines.snapshot import load_snapshot

    lake = _idx_lake(tmp_path, "uniq")
    lake.set_indexes([{"name": "uq_role_ts", "cols": ["role", "ts"],
                       "kind": "unique"}])
    snap = pd.DataFrame({
        "conv_id": ["c1", "c1"], "turn_idx": np.array([0, 1], np.int32),
        "role": ["user", "user"], "text": ["a", "b"], "tool": ["", ""],
        "ts": pd.to_datetime(["2026-01-01", "2026-01-01"]),
    })
    with pytest.raises(Exception, match="(?i)unique"):
        load_snapshot(lake, rd.from_pandas(snap))


@pytest.mark.usefixtures("ray_session")
def test_auto_compact_policy_enforced_on_noop_resume(tmp_path):
    """The torn-final-tick window, deterministically: all epochs committed
    (auto-compact off → delta buildup), then a resume under
    auto_compact_max_deltas with NOTHING to apply must still restore the
    bound — the policy belongs to the invocation, not to the windows it
    happens to apply."""
    import pyarrow.parquet as pq

    from ape_dts_ray.fixtures import gen_events, oracle_replay
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable

    events = gen_events(seed=51, n_convs=25, max_turns=6, n_events=3000,
                        delete_frac=0.15)
    path = str(tmp_path / "e.parquet")
    pq.write_table(events, path)
    lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(num_partitions=4, epoch_size=300))
    replay(lake, events_path=path)                   # no policy: buildup
    assert max(lake.delta_file_counts().values()) > 2
    wm = lake.watermark()

    out = replay(LakeTable.open(lake.root), events_path=path,
                 group_epochs=1, auto_compact_max_deltas=2)
    assert out == []                                 # nothing to apply...
    lake = LakeTable.open(lake.root)
    assert max(lake.delta_file_counts().values(), default=0) <= 2   # ...bound restored
    assert lake.watermark() == wm
    state = lake.state_table().to_pandas()
    oracle = oracle_replay(events)
    assert len(state) == len(oracle)
    assert list(state["text"]) == list(oracle["text"])


def test_mp4_container_walk():
    """ISO-BMFF walk: byte-exact sample recovery, multi-sample-per-chunk
    stsc expansion, co64 offsets, and the honest error surfaces."""
    from ape_dts_ray.functions import mjpeg

    frames = _gradient_clip(7, 24, 32)
    jpegs = [mjpeg.encode_baseline_jpeg_gray(f, 90) for f in frames]
    mp4 = mjpeg.encode_mp4_mjpeg(jpegs, 32, 24, fps=5)
    assert mjpeg.is_mp4(mp4)
    assert mjpeg.mp4_frame_chunks(mp4) == jpegs   # byte-exact recovery

    # same samples re-tabled as ONE chunk holding all 7 (stsc run expansion)
    # and 64-bit co64 offsets — the layouts a real muxer commonly emits
    ftyp = mjpeg._box(b"ftyp", b"isom" + b"\x00" * 4 + b"isom")
    mdat = mjpeg._box(b"mdat", b"".join(jpegs))
    base = len(ftyp) + 8
    sizes = [len(j) for j in jpegs]
    stsd = mjpeg._fullbox(
        b"stsd", 0, 0, struct.pack(">I", 1)
        + mjpeg._box(b"jpeg", b"\x00" * 6 + struct.pack(">H", 1)
                     + b"\x00" * 70))
    stsz = mjpeg._fullbox(b"stsz", 0, 0, struct.pack(">II", 0, 7)
                          + struct.pack(">7I", *sizes))
    stsc = mjpeg._fullbox(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 7, 1))
    co64 = mjpeg._fullbox(b"co64", 0, 0, struct.pack(">IQ", 1, base))
    stbl = mjpeg._box(b"stbl", stsd + stsc + stsz + co64)
    hdlr = mjpeg._fullbox(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 13)
    mdia = mjpeg._box(b"mdia", hdlr + mjpeg._box(b"minf", stbl))
    moov = mjpeg._box(b"moov", mjpeg._box(b"trak", mdia))
    assert mjpeg.mp4_frame_chunks(ftyp + mdat + moov) == jpegs

    # tkhd spec-offset check (14496-12 §8.3.2 v0): size 92, and width/height
    # land at payload offsets 76/80 — a 4-byte-short reserved run misaligns
    # both for any conforming external parser
    ti = mp4.index(b"tkhd")
    tk_size = struct.unpack(">I", mp4[ti - 4:ti])[0]
    assert tk_size == 92
    body = mp4[ti + 4 + 4:ti - 4 + tk_size]   # past version/flags
    assert len(body) == 80
    w, h = struct.unpack(">II", body[72:80])
    assert (w >> 16, h >> 16) == (32, 24)

    with pytest.raises(ValueError, match="no ftyp"):
        mjpeg.mp4_frame_chunks(b"\x00" * 16)
    with pytest.raises(ValueError, match="no moov"):
        mjpeg.mp4_frame_chunks(ftyp + mdat)
    # non-MJPEG sample entry (an H.264 track) raises the strict stub error
    avc = mp4.replace(b"jpeg", b"avc1")
    with pytest.raises(NotImplementedError, match="avc1"):
        mjpeg.mp4_frame_chunks(avc)


def test_video_mjpeg_mp4_strict_frame_sampling():
    """SampleFrames strict mode decodes MJPEG-in-MP4 for real (sample-table
    walk → JPEG luma), with the same even spacing and locally recomputable
    features as the AVI/Y4M paths; non-strict stubs on a truncated tree."""
    from ape_dts_ray.functions import mjpeg, multimodal

    clip = _gradient_clip(10, 24, 32, seed=3)
    payload = mjpeg.encode_mp4_mjpeg(
        [mjpeg.encode_baseline_jpeg_gray(f, 92) for f in clip], 32, 24)
    rows = multimodal.SampleFrames(4, 8, strict=True)._frame_rows(payload)
    assert [fi for fi, _ in rows] == [0, 1, 2, 3]
    pick = np.unique(np.linspace(0, 9, 4, dtype=np.int64))
    want = (multimodal.resize_nearest(clip[pick[2]].astype(np.float64), 8, 8)
            .mean(axis=0) / 255.0)
    assert np.abs(np.array(rows[2][1]) - want).max() < 0.05

    trunc = payload[:len(payload) // 2]     # moov trails: walk fails
    with pytest.raises((ValueError, NotImplementedError, IndexError)):
        multimodal.SampleFrames(2, 4, strict=True)._frame_rows(trunc)
    stub = multimodal.SampleFrames(2, 4, strict=False)._frame_rows(trunc)
    assert len(stub) == 2 and all(len(f) == 4 for _, f in stub)


def test_mkv_container_walk():
    """Matroska EBML walk: byte-exact frame recovery from SimpleBlocks,
    BlockGroup>Block and unknown-size Segment layouts, other-track blocks
    skipped, and the honest error surfaces (non-MJPEG codec, lacing,
    overrun)."""
    from ape_dts_ray.functions import mjpeg

    frames = _gradient_clip(6, 24, 32)
    jpegs = [mjpeg.encode_baseline_jpeg_gray(f, 90) for f in frames]
    mkv = mjpeg.encode_mkv_mjpeg(jpegs, 32, 24, fps=5)
    assert mjpeg.is_mkv(mkv)
    assert mjpeg.mkv_frame_chunks(mkv) == jpegs    # byte-exact recovery

    # the streamed layout real muxers emit: unknown-size Segment (all-ones
    # vint), frames in BlockGroup>Block, plus a second (audio) track whose
    # blocks must be skipped, and a laced video block that must refuse
    def ebml(eid, payload):
        return mjpeg._ebml(eid, payload)

    track_v = ebml(b"\xae", mjpeg._ebml_uint(b"\xd7", 2)
                   + mjpeg._ebml_uint(b"\x83", 1)
                   + ebml(b"\x86", b"V_MJPEG"))
    track_a = ebml(b"\xae", mjpeg._ebml_uint(b"\xd7", 1)
                   + mjpeg._ebml_uint(b"\x83", 2)       # audio
                   + ebml(b"\x86", b"A_PCM/INT/LIT"))
    tracks = ebml(mjpeg._MKV_TRACKS, track_a + track_v)
    blocks = b"".join(
        ebml(b"\xa0", ebml(b"\xa1", b"\x82" + b"\x00\x00\x80" + j))
        for j in jpegs)
    # audio block is LACED (0x06 flags) — common for PCM; must be skipped
    # by track number, never refused
    other = ebml(b"\xa3", b"\x81" + b"\x00\x00\x86" + b"pcm-bytes")
    cluster = ebml(mjpeg._MKV_CLUSTER,
                   mjpeg._ebml_uint(b"\xe7", 0) + other + blocks)
    body = tracks + cluster
    streamed = (mkv[:mkv.index(mjpeg._MKV_SEGMENT)]       # EBML header
                + mjpeg._MKV_SEGMENT + b"\xff" + body)    # unknown size
    assert mjpeg.mkv_frame_chunks(streamed) == jpegs

    # unknown-size CLUSTERS (live-stream layout): two back-to-back unsized
    # clusters must BOTH contribute frames — an unsized cluster ends at the
    # next top-level id, it must not swallow its successors
    half = len(jpegs) // 2
    def unsized_cluster(js):
        body = mjpeg._ebml_uint(b"\xe7", 0) + b"".join(
            ebml(b"\xa3", b"\x82" + b"\x00\x00\x80" + j) for j in js)
        return mjpeg._MKV_CLUSTER + b"\xff" + body
    live = (mkv[:mkv.index(mjpeg._MKV_SEGMENT)] + mjpeg._MKV_SEGMENT + b"\xff"
            + tracks + unsized_cluster(jpegs[:half])
            + unsized_cluster(jpegs[half:]))
    assert mjpeg.mkv_frame_chunks(live) == jpegs

    laced = cluster.replace(b"\x82" + b"\x00\x00\x80", b"\x82\x00\x00\x86", 1)
    with pytest.raises(ValueError, match="laced"):
        mjpeg.mkv_frame_chunks(streamed.replace(cluster, laced))
    with pytest.raises(NotImplementedError, match="V_MPEG"):
        mjpeg.mkv_frame_chunks(mkv.replace(b"V_MJPEG", b"V_MPEG4"))
    with pytest.raises(ValueError, match="no EBML header"):
        mjpeg.mkv_frame_chunks(b"\x00" * 16)
    with pytest.raises(ValueError, match="overruns"):
        mjpeg.mkv_frame_chunks(mkv[:-20])


def test_video_mjpeg_mkv_strict_frame_sampling():
    """SampleFrames strict mode decodes MJPEG-in-MKV for real (EBML cluster
    walk → JPEG luma), same even spacing / locally recomputable features as
    the AVI/MP4/Y4M paths; non-strict stubs on a truncated tree."""
    from ape_dts_ray.functions import mjpeg, multimodal

    clip = _gradient_clip(10, 24, 32, seed=4)
    payload = mjpeg.encode_mkv_mjpeg(
        [mjpeg.encode_baseline_jpeg_gray(f, 92) for f in clip], 32, 24)
    rows = multimodal.SampleFrames(4, 8, strict=True)._frame_rows(payload)
    assert [fi for fi, _ in rows] == [0, 1, 2, 3]
    pick = np.unique(np.linspace(0, 9, 4, dtype=np.int64))
    want = (multimodal.resize_nearest(clip[pick[1]].astype(np.float64), 8, 8)
            .mean(axis=0) / 255.0)
    assert np.abs(np.array(rows[1][1]) - want).max() < 0.05

    trunc = payload[:len(payload) // 2]
    with pytest.raises((ValueError, NotImplementedError, IndexError)):
        multimodal.SampleFrames(2, 4, strict=True)._frame_rows(trunc)
    stub = multimodal.SampleFrames(2, 4, strict=False)._frame_rows(trunc)
    assert len(stub) == 2 and all(len(f) == 4 for _, f in stub)


def _color_clip(h, w, seed=0):
    """Smooth RGB gradient (small quantization/subsampling error by
    construction, so roundtrip tolerances stay tight)."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        np.clip(120 + 60 * np.sin(xx / 11 + seed), 0, 255),
        np.clip(110 + 50 * np.cos(yy / 9 - seed), 0, 255),
        np.clip(128 + 40 * np.sin((xx + yy) / 13), 0, 255)], axis=2
    ).astype(np.uint8)


def test_color_jpeg_roundtrip_both_subsamplings():
    """Interleaved YCbCr encode → full RGB decode: 4:2:0 exercises the
    decoder's multi-block MCU walk (4 Y + Cb + Cr per MCU, chroma
    upsampling), 4:4:4 the trivial layout; both bounded-error on smooth
    input, odd dimensions included."""
    from ape_dts_ray.functions import mjpeg

    img = _color_clip(37, 53)
    for sub, tol in (("4:2:0", 12), ("4:4:4", 6)):
        enc = mjpeg.encode_baseline_jpeg_color(img, 95, sub)
        dec = mjpeg.decode_baseline_jpeg_rgb(enc)
        assert dec.shape == (37, 53, 3)
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        assert err <= tol, (sub, err)

    # grayscale stream through the RGB surface: replicated channels
    g = _gradient_clip(1, 24, 31)[0]
    rgb = mjpeg.decode_baseline_jpeg_rgb(mjpeg.encode_baseline_jpeg_gray(g))
    assert rgb.shape == (24, 31, 3)
    assert (rgb[:, :, 0] == rgb[:, :, 1]).all()
    assert np.abs(rgb[:, :, 0].astype(int) - g.astype(int)).max() <= 6

    with pytest.raises(ValueError, match="subsampling"):
        mjpeg.encode_baseline_jpeg_color(img, 90, "4:2:2")
    with pytest.raises(ValueError, match="RGB"):
        mjpeg.encode_baseline_jpeg_color(g, 90)


def test_noninterleaved_scan_ignores_sampling_factors():
    """T.81 A.2.2: an Ns=1 scan walks ONE 8x8 unit per MCU regardless of
    the component's declared sampling factors. A grayscale frame declaring
    2x2 (legal, emitted by some foreign encoders) must decode identically
    to the same stream declaring 1x1 — on a non-multiple-of-16 size, the
    interleaved walk would even disagree on the block COUNT and desync."""
    from ape_dts_ray.functions import mjpeg

    img = _gradient_clip(1, 19, 29)[0]       # 19x29: not multiples of 16
    enc = mjpeg.encode_baseline_jpeg_gray(img, 92)
    sof = enc.index(b"\xff\xc0")
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) nf(1) then id, h<<4|v, tq
    assert enc[sof + 10:sof + 13] == b"\x01\x11\x00"
    patched = enc[:sof + 11] + b"\x22" + enc[sof + 12:]
    ref = mjpeg.decode_baseline_jpeg_luma(enc)
    got = mjpeg.decode_baseline_jpeg_luma(patched)
    assert np.array_equal(got, ref)
    rgb = mjpeg.decode_baseline_jpeg_rgb(patched)   # color surface too
    assert np.array_equal(rgb[:, :, 0], ref)


def test_entropy_decode_linear_time():
    """The bit-reader masks its accumulator to the live window: decode
    time must grow ~linearly with pixel count, not quadratically (the
    unmasked bigint accumulator took 38 s on a single 512px frame)."""
    import time

    from ape_dts_ray.functions import mjpeg

    rng = np.random.default_rng(3)

    def t(px):
        img = rng.integers(0, 256, (px, px), dtype=np.uint8)
        enc = mjpeg.encode_baseline_jpeg_gray(img, 85)
        t0 = time.perf_counter()
        mjpeg.decode_baseline_jpeg_luma(enc)
        return time.perf_counter() - t0

    t(64)                                   # warm-up
    t512 = t(512)
    # absolute ceiling, not a t128-relative ratio: the two ratio samples
    # land at different instants and this sandbox's load swings timing ~2x,
    # making a 40x ratio bound flaky. Masked decode is ~0.5 s; the unmasked
    # quadratic regression took ~38 s — 8 s holds ~16x regression headroom
    # even under a 2x load spike.
    assert t512 < 8.0, t512


def test_luma_path_positional_parity_on_subsampled_stream():
    """The cheap luma-only decode must stay positionally correct on a REAL
    interleaved 4:2:0 stream — chroma blocks are entropy-decoded and
    dropped, so a mis-walk would corrupt every later MCU. Verified against
    the encoder's own Y plane, and against the full-RGB decode's luma."""
    from ape_dts_ray.functions import mjpeg

    img = _color_clip(41, 66, seed=2)
    enc = mjpeg.encode_baseline_jpeg_color(img, 92, "4:2:0")
    luma = mjpeg.decode_baseline_jpeg_luma(enc)
    ytrue = mjpeg.rgb_to_ycbcr(img)[:, :, 0]
    assert np.abs(luma.astype(float) - ytrue).max() <= 8

    rgb = mjpeg.decode_baseline_jpeg_rgb(enc)
    yback = mjpeg.rgb_to_ycbcr(rgb)[:, :, 0]
    assert np.abs(luma.astype(float) - yback).max() <= 3


def test_video_color_mjpeg_avi_strict_sampling():
    """A color (4:2:0) MJPEG AVI through SampleFrames strict mode: the
    frame features come from the decoded luma of the subsampled stream and
    match a locally recomputed Y-plane feature."""
    from ape_dts_ray.functions import mjpeg, multimodal

    clip = [_color_clip(24, 32, seed=k) for k in range(6)]
    avi = mjpeg.encode_avi_mjpeg(
        [mjpeg.encode_baseline_jpeg_color(f, 93, "4:2:0") for f in clip],
        32, 24)
    rows = multimodal.SampleFrames(3, 8, strict=True)._frame_rows(avi)
    assert [fi for fi, _ in rows] == [0, 1, 2]
    pick = np.unique(np.linspace(0, 5, 3, dtype=np.int64))
    ytrue = mjpeg.rgb_to_ycbcr(clip[pick[1]])[:, :, 0]
    want = multimodal.resize_nearest(ytrue, 8, 8).mean(axis=0) / 255.0
    assert np.abs(np.array(rows[1][1]) - want).max() < 0.05


# ------------------------------------------------ reader/compactor race

def test_fold_retries_when_delta_vanishes_mid_read(tmp_path):
    """A listed delta can vanish between the exists() check and the read
    (a concurrent — or SIGKILL-orphaned — compactor worker unlinking a
    consumed file after publishing its replacement base). The fold sites
    must re-list and retry, not die: the unlink ordering guarantees the
    fresh listing folds to identical LWW winners. Seen live as the
    test_follow_sigkill_restart_converges flake (FileNotFoundError in
    ray::fold_partition)."""
    from ape_dts_ray.fixtures import gen_events, oracle_replay
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state import lake as lakemod
    from ape_dts_ray.state.lake import LakeTable

    events = gen_events(seed=78, n_convs=15, max_turns=5, n_events=2000)
    lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(num_partitions=4, epoch_size=400))
    import pyarrow.parquet as pqmod
    src = str(tmp_path / "events.parquet")
    pqmod.write_table(events, src)
    replay(lake, events_path=src)
    oracle = oracle_replay(events)

    real = LakeTable._fold_files
    trips = {"n": 0}

    def racy(self, files, **kw):
        if trips["n"] < 2:                 # two consecutive vanishes, then ok
            trips["n"] += 1
            raise FileNotFoundError(files[-1])
        return real(self, files, **kw)

    # state read path
    import unittest.mock as mock
    with mock.patch.object(LakeTable, "_fold_files", racy):
        got = lake.state_table().to_pandas()
    assert trips["n"] == 2
    assert len(got) == len(oracle)
    assert list(got["text"]) == list(oracle["text"])

    # partial-compaction path (inline so the patch is visible to the fold)
    trips["n"] = 0
    with mock.patch.object(LakeTable, "_fold_files", racy):
        folded = lake.compact(max_delta_files=0, parallel=False)
    assert trips["n"] == 2 and folded > 0
    got = lake.state_table().to_pandas()
    assert len(got) == len(oracle)
    assert list(got["text"]) == list(oracle["text"])

    # bounded: a file that NEVER reappears propagates after the retries
    def always(self, files, **kw):
        raise FileNotFoundError(files[-1])

    with mock.patch.object(LakeTable, "_fold_files", always):
        with pytest.raises(FileNotFoundError):
            lake.state_table()


def test_retry_budget_resets_per_path():
    """Review finding: sustained compaction churn vanishes MANY different
    deltas in sequence — each individually the benign publish-before-unlink
    race. The retry budget must charge per PATH (reset when the failing file
    changes), not one global counter, or a long churn run exhausts it and
    raises the very error the wrapper exists to suppress."""
    from ape_dts_ray.state.lake import _retry_vanished_files

    calls = {"n": 0}

    def churn():                            # 8 distinct vanishes (> attempts)
        calls["n"] += 1
        if calls["n"] <= 8:
            raise FileNotFoundError(f"/lake/delta/epoch-{calls['n']:08d}/p0")
        return "ok"

    assert _retry_vanished_files(churn, attempts=4) == "ok"

    # but the SAME file vanishing `attempts` times in a row still propagates
    def stuck():
        raise FileNotFoundError("/lake/delta/epoch-00000001/p0")

    with pytest.raises(FileNotFoundError):
        _retry_vanished_files(stuck, attempts=4)


# ------------------------------------------ compaction-protocol review fixes


def test_compact_rotate_refuses_on_torn_truncate(tmp_path):
    """compact(new_hot_keys=...) against a torn truncate must refuse BEFORE
    writing rotation.json: pre-fix the rotation branch ran first, wrote the
    rotation marker, then died on the truncate refusal inside the fold —
    leaving BOTH markers, where truncate() refuses on rotation and every
    compact/replay on truncate (a wedge only hand-deleting a marker could
    clear)."""
    import pyarrow.parquet as pqmod

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import MANIFEST_DIR, LakeTable

    events = gen_events(seed=91, n_convs=10, max_turns=4, n_events=1000)
    lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(num_partitions=4, epoch_size=400))
    src = str(tmp_path / "ev.parquet")
    pqmod.write_table(events, src)
    replay(lake, events_path=src)
    # torn truncate: the marker exists (deletes may or may not have run)
    open(os.path.join(lake.root, MANIFEST_DIR, "truncate.json"), "w").close()
    with pytest.raises(RuntimeError, match="truncate in progress"):
        lake.compact(new_hot_keys=("conv-0000001",), parallel=False)
    assert not lake.rotation_in_progress()       # no second marker written
    lake.truncate()                              # recovery path still open
    assert not lake.truncate_in_progress()


def test_partial_compact_gc_ignores_orphan_tmp(tmp_path):
    """A SIGKILL-orphaned atomic-write temporary (part-*.parquet.tmp-<uuid>)
    in a delta epoch dir must not pin the manifest prefix: pre-fix the
    consumed-prefix check treated ANY dir entry as content, so manifests
    below the orphan never GC'd and committed_epochs() grew forever in a
    long follow run."""
    import pyarrow.parquet as pqmod

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable

    # 48 inserts + 1952 changes = 2000 events: the log ends exactly on an
    # epoch boundary so every window is final (foldable prefix)
    events = gen_events(seed=92, n_convs=12, max_turns=4, n_events=1952)
    lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(num_partitions=4, epoch_size=400))
    src = str(tmp_path / "ev.parquet")
    pqmod.write_table(events, src)
    replay(lake, events_path=src)
    wm = lake.watermark()
    epochs = lake.committed_epochs()
    assert len(epochs) > 1
    orphan = os.path.join(lake.root, "delta", f"epoch-{epochs[0]:08d}",
                          "part-00000.parquet.tmp-deadbeef")
    with open(orphan, "wb") as f:
        f.write(b"torn write")
    lake.compact(max_delta_files=0, parallel=False)
    assert lake.committed_epochs() == []         # prefix fully GC'd
    assert lake.watermark() == wm                # never regresses
    assert not os.path.exists(orphan)            # removed with its dir


def test_full_compact_never_regresses_published_watermark(tmp_path):
    """Full compact() publishes max(own watermark, current compacted.json):
    a concurrent compactor may have published a HIGHER watermark while this
    run was folding — pre-fix the verbatim overwrite regressed watermark()
    and the next follow round re-scanned/re-applied the regressed span."""
    import pyarrow.parquet as pqmod

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import MANIFEST_DIR, LakeTable
    from ape_dts_ray.state.manifest import EpochManifest, atomic_write_text

    events = gen_events(seed=93, n_convs=10, max_turns=4, n_events=1000)
    lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(num_partitions=4, epoch_size=400))
    src = str(tmp_path / "ev.parquet")
    pqmod.write_table(events, src)
    replay(lake, events_path=src)
    high = lake.watermark() + 50_000
    m = EpochManifest(epoch=999, offset_min=-1, offset_max=high,
                      schema_version=lake.schema_version, partitions=[])
    atomic_write_text(os.path.join(lake.root, MANIFEST_DIR,
                                   "compacted.json"), m.to_json())
    lake.compact(parallel=False)
    assert lake.compacted_watermark() == high    # max()-ed, not overwritten


def test_replay_events_factory_requires_max_offset(tmp_path):
    """events_factory without max_offset must refuse with a clear error —
    the factory is invoked per planned window, so the plan's span cannot be
    discovered from it (pre-fix: opaque AttributeError on NoneType)."""
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable

    lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(num_partitions=2, epoch_size=400))
    with pytest.raises(ValueError, match="requires max_offset"):
        replay(lake, events_factory=lambda w: None)


# --------------------------------------------- redis review fixes (round 5)


def test_xadd_trim_options_parse():
    """XADD with trim/option tokens (MAXLEN/MINID [~|=] n, NOMKSTREAM,
    LIMIT) — the forms Redis actually propagates to AOF/replicas. Pre-fix
    args[2] was taken as the stream id unconditionally, silently emitting
    field=b'MAXLEN:100' garbage rows; the id is now found past the options
    and validated as '<ms>[-<seq>]'."""
    from ape_dts_ray.pipelines.redis_replay import (commands_to_events,
                                                    scan_to_events)
    from ape_dts_ray.sources.resp import encode_cmd

    cmds = [[b"XADD", b"s", b"MAXLEN", b"~", b"100", b"5-1", b"f", b"v"],
            [b"XADD", b"s", b"NOMKSTREAM", b"6-0", b"g", b"w"],
            [b"XADD", b"s", b"MINID", b"=", b"3", b"LIMIT", b"10",
             b"7-2", b"h", b"x"],
            [b"XADD", b"s", b"8", b"i", b"y"]]        # seq-less explicit id
    t = commands_to_events([(o, c) for o, c in enumerate(cmds)])
    assert [r["field"] for r in t.to_pylist()] == \
        [b"5-1:f", b"6-0:g", b"7-2:h", b"8:i"]
    # fast path (XADD is always slow-routed) agrees byte-for-byte
    data = b"".join(encode_cmd(c) for c in cmds)
    from ape_dts_ray.sources.resp import parse_resp
    loop = commands_to_events(parse_resp(data))
    fast = scan_to_events(data)
    assert sorted(map(str, loop.to_pylist())) == \
        sorted(map(str, fast.to_pylist()))
    # a malformed id where the options end is a loud refusal, not garbage
    with pytest.raises(ValueError, match="XADD id"):
        commands_to_events([(0, [b"XADD", b"s", b"MAXLEN", b"100",
                                 b"notanid", b"f", b"v"])])


def test_statistic_sinks_survive_non_utf8_keys(ray_session):
    """Redis keys are binary-safe; the bigkey/hotkey report sinks must not
    abort on a non-UTF8 key (pre-fix: ArrowInvalid from .cast(pa.string())
    killed the whole statistics job). Invalid bytes render as backslash
    escapes."""
    import ray.data as rd

    from ape_dts_ray.pipelines.redis_replay import (KEYSPACE_SCHEMA,
                                                    bigkey_statistics,
                                                    hotkey_statistics)

    raw = pa.table({
        "db": pa.array([0, 0], pa.int32()),
        "key": pa.array([b"\xff\xfekey", b"plain"], pa.binary()),
        "rtype": ["string", "string"],
        "field": pa.array([None, None], pa.binary()),
        "idx": pa.array([None, None], pa.int64()),
        "value": pa.array([b"v" * 10, b"w"], pa.binary()),
        "score": pa.array([None, None], pa.float64()),
        "expire_ms": pa.array([0, 0], pa.int64()),
        "field_ttl_ms": pa.array([0, 0], pa.int64()),
    }, schema=KEYSPACE_SCHEMA)
    big = bigkey_statistics(rd.from_arrow(raw), data_size_threshold=0,
                            top_n=10).take_all()
    keys = {r["key"] for r in big}
    assert "plain" in keys and any("\\xff" in k for k in keys)

    stats = pa.table({"db_id": pa.array([0], pa.int64()),
                      "key": pa.array([b"\xff\xfekey"], pa.binary()),
                      "key_type": ["string"],
                      "data_size": pa.array([12], pa.int64()),
                      "freq": pa.array([9], pa.int64())})
    hot = hotkey_statistics(rd.from_arrow(stats), freq_threshold=0,
                            top_n=5).take_all()
    assert len(hot) == 1 and "\\xff" in hot[0]["key"]


def test_calc_slots_large_binary():
    """polars hands back large_binary; pre-fix calc_slots reinterpreted its
    int64 offsets as int32 and computed silently WRONG slots
    (nondeterministic partitioning). Now normalized via cast; unsupported
    types refuse."""
    from ape_dts_ray.sources.resp import calc_slots

    keys = [b"user:1001", b"user:1002", b"abc", b"{tag}x", b"{tag}y"]
    want = calc_slots(pa.array(keys, pa.binary())).tolist()
    got = calc_slots(pa.array(keys, pa.large_binary())).tolist()
    assert got == want
    assert got[3] == got[4]                     # hashtag co-location holds
    with pytest.raises(TypeError, match="calc_slots"):
        calc_slots(pa.array([1, 2], pa.int64()))


# ---------------------------------------- ddl / avro / merge review fixes


def test_ddl_quoted_qualified_names(tmp_path):
    """`db1`.`users` and db1.users must name the SAME table — pre-fix the
    quote strip ran on the whole dotted token, creating 'db1`.`users' and
    leaving the later unquoted DROP to hit 'does not exist' while the real
    data lived on under the mangled name."""
    from ape_dts_ray.stages.ddl import apply_table_ddl

    root = str(tmp_path)
    apply_table_ddl(root, "CREATE TABLE `db1`.`users` (id INT PRIMARY KEY)")
    assert os.path.isdir(os.path.join(root, "db1.users"))
    apply_table_ddl(root, "DROP TABLE db1.users")      # unquoted spelling
    assert not os.path.isdir(os.path.join(root, "db1.users"))
    # doubled-quote escape still collapses inside a segment
    apply_table_ddl(root, 'CREATE TABLE "a""b" (id INT PRIMARY KEY)')
    assert os.path.isdir(os.path.join(root, 'a"b'))


def test_ddl_backslash_escape_in_string_literal(tmp_path):
    """mysqldump emits COMMENT 'don\\'t panic' under default sql_mode —
    pre-fix the quote scan honored only doubled quotes and raised
    'unterminated quote' on valid source DDL."""
    from ape_dts_ray.stages.ddl import apply_table_ddl, parse_ddl

    apply_table_ddl(str(tmp_path), "CREATE TABLE t (id INT PRIMARY KEY, "
                    "v TEXT COMMENT 'don\\'t panic')")
    assert os.path.isdir(os.path.join(str(tmp_path), "t"))
    p = parse_ddl("CREATE TABLE u (id INT PRIMARY KEY, "
                  "w TEXT DEFAULT 'a\\')b')")
    assert p.table == "u" and "w" in [c[0] for c in p.extra["columns"]]


def test_ddl_strict_drop_replay_after_crash(tmp_path):
    """Crash between the tombstone rename and the rmtree, then replay the
    strict DROP: the re-run must finish the drop and report success —
    pre-fix the sweep destroyed the tombstone first and the replay aborted
    on 'does not exist' for a drop that actually succeeded."""
    from ape_dts_ray.stages.ddl import DdlError, apply_table_ddl

    root = str(tmp_path)
    apply_table_ddl(root, "CREATE TABLE t1 (id INT PRIMARY KEY)")
    # simulate the torn drop: rename done, rmtree never ran
    os.rename(os.path.join(root, "t1"), os.path.join(root, "t1._dropped"))
    apply_table_ddl(root, "DROP TABLE t1")             # replayed statement
    assert not os.path.exists(os.path.join(root, "t1._dropped"))
    # a drop of a table that never existed still refuses
    with pytest.raises(DdlError, match="does not exist"):
        apply_table_ddl(root, "DROP TABLE never_was")


def test_avro_ts_nulls_keep_int64_precision():
    """A null-bearing ts column must not launder the valid rows through
    float64 (to_numpy on null-bearing int64) — values past 2^53 rounded
    before zigzag, diverging from encode_event's bytes."""
    from ape_dts_ray.stages.avro import avro_encode, encode_event

    big = 2**60 + 1
    batch = pa.table({
        "log_offset": pa.array([1, 2], pa.int64()),
        "seq": pa.array([0, 0], pa.int32()),
        "op": ["insert", "insert"], "conv_id": ["c1", "c2"],
        "turn_idx": pa.array([0, 1], pa.int32()),
        "role": ["user", "user"], "text": ["a", "b"],
        "tool": pa.array([None, None], pa.string()),
        "ts": pa.array([big, None], pa.int64()),
    })
    enc = avro_encode(batch)
    ref = encode_event({"log_offset": 1, "seq": 0, "op": "insert",
                        "conv_id": "c1", "turn_idx": 0, "role": "user",
                        "text": "a", "tool": None, "ts": big})
    assert enc.column("value")[0].as_py() == ref


def test_avro_refuses_int32_overflow():
    """seq/turn_idx are Avro 'int' (32-bit): wider values would encode but
    WRAP on any spec-conformant reader — both codecs refuse at the writer
    with the same message."""
    from ape_dts_ray.stages.avro import avro_encode, encode_event

    row = {"log_offset": 1, "seq": 0, "op": "insert", "conv_id": "c",
           "turn_idx": 2**31, "role": None, "text": None, "tool": None,
           "ts": None}
    with pytest.raises(ValueError, match="overflows"):
        encode_event(row)
    batch = pa.table({
        "log_offset": pa.array([1], pa.int64()),
        "seq": pa.array([0], pa.int64()),
        "op": ["insert"], "conv_id": ["c"],
        "turn_idx": pa.array([2**31], pa.int64()),
        "role": pa.array([None], pa.string()),
        "text": pa.array([None], pa.string()),
        "tool": pa.array([None], pa.string()),
    })
    with pytest.raises(ValueError, match="overflows"):
        avro_encode(batch)


def test_fold_refuses_unstamped_piece():
    """A delta piece without its _epoch stamp must refuse loudly —
    unify_tables null-backfills the column and polars sorts nulls FIRST,
    so pre-fix the unstamped (newer!) delta silently LOST to base rows
    (_epoch=-1) and resurrected stale state."""
    from ape_dts_ray.stages.merge import fold_state, lww_winner_indices

    base = pa.table({"conv_id": ["c"], "turn_idx": pa.array([0], pa.int32()),
                     "op": ["insert"], "text": ["old"],
                     "log_offset": pa.array([100], pa.int64()),
                     "seq": pa.array([0], pa.int32()),
                     "_epoch": pa.array([-1], pa.int64())})
    delta = pa.table({"conv_id": ["c"], "turn_idx": pa.array([0], pa.int32()),
                      "op": ["update"], "text": ["new"],
                      "log_offset": pa.array([500], pa.int64()),
                      "seq": pa.array([0], pa.int32())})   # no _epoch stamp
    with pytest.raises(ValueError, match="_epoch"):
        fold_state([base, delta])
    with pytest.raises(ValueError, match="order column"):
        lww_winner_indices(delta, order_cols=("_epoch", "log_offset", "seq"))


# ------------------------------- post-review fixes: race + parser edges


def test_ddl_mixed_quoting_qualified_names(tmp_path):
    """db1.`users` (the mysqldump form — only the TABLE segment quoted)
    must name the same table as `db1`.`users` and db1.users — pre-fix the
    unquoting was gated on the FIRST character, so a mixed-quoted name
    kept its backticks and became a silently distinct lake directory."""
    from ape_dts_ray.stages.ddl import apply_table_ddl, parse_ddl

    assert parse_ddl("DROP TABLE db1.`users`").table == "db1.users"
    assert parse_ddl('DROP TABLE db1."users"').table == "db1.users"
    assert parse_ddl("DROP TABLE `db1`.users").table == "db1.users"
    root = str(tmp_path)
    apply_table_ddl(root, "CREATE TABLE db1.`users` (id INT PRIMARY KEY)")
    assert os.path.isdir(os.path.join(root, "db1.users"))
    apply_table_ddl(root, "DROP TABLE `db1`.`users`")   # other spelling
    assert not os.path.isdir(os.path.join(root, "db1.users"))


def test_mkv_block_track_127():
    """A Block's track-number vint 0xFF is the VALUE 127, not the all-ones
    'unknown size' reservation (that applies to element DATA SIZES only,
    RFC 8794 §4.4) — pre-fix a spec-valid file whose video track number
    was 127 failed every block with 'malformed block header'."""
    import struct as _struct

    from ape_dts_ray.functions import mjpeg

    frames = _gradient_clip(2, 24, 32)
    jpegs = [mjpeg.encode_baseline_jpeg_gray(f, 90) for f in frames]
    # same layout as encode_mkv_mjpeg but TrackNumber 127 everywhere
    track = mjpeg._ebml(b"\xae",
                        mjpeg._ebml_uint(b"\xd7", 127)
                        + mjpeg._ebml_uint(b"\x73\xc5", 1)
                        + mjpeg._ebml_uint(b"\x83", 1)
                        + mjpeg._ebml(b"\x86", b"V_MJPEG")
                        + mjpeg._ebml(b"\xe0", mjpeg._ebml_uint(b"\xb0", 32)
                                      + mjpeg._ebml_uint(b"\xba", 24)))
    body = [mjpeg._ebml(b"\x15\x49\xa9\x66",
                        mjpeg._ebml_uint(b"\x2a\xd7\xb1", 1_000_000)),
            mjpeg._ebml(mjpeg._MKV_TRACKS, track)]
    for i, j in enumerate(jpegs):
        block = b"\xff" + _struct.pack(">h", 0) + b"\x80" + j  # vint 0xFF=127
        body.append(mjpeg._ebml(mjpeg._MKV_CLUSTER,
                                mjpeg._ebml_uint(b"\xe7", i * 100)
                                + mjpeg._ebml(b"\xa3", block)))
    ebml_head = mjpeg.encode_mkv_mjpeg(jpegs, 32, 24).split(
        mjpeg._MKV_SEGMENT)[0]
    mkv = ebml_head + mjpeg._ebml(mjpeg._MKV_SEGMENT, b"".join(body))
    assert mjpeg.mkv_frame_chunks(mkv) == jpegs
    # direct unit check: 0xFF decodes to track 127, other tracks still skip
    blk = b"\xff" + _struct.pack(">h", 0) + b"\x80" + b"payload"
    assert mjpeg._mkv_block_frame(blk, 0, len(blk), 127) == b"payload"
    assert mjpeg._mkv_block_frame(blk, 0, len(blk), 1) is None


def test_follow_span_refuses_missing_offset_column(tmp_path):
    """A foreign parquet without the offset column in the log dir must
    refuse with the problem named — pre-fix get_field_index's -1 walked
    into column(-1) and killed the daemon with a bare IndexError."""
    import pyarrow.parquet as pq

    from ape_dts_ray.pipelines.follow import _file_offset_span

    p = str(tmp_path / "foreign.parquet")
    pq.write_table(pa.table({"not_offset": [1, 2]}), p)
    with pytest.raises(ValueError, match="lacks offset column"):
        _file_offset_span(p, "log_offset")


def test_atomic_write_parquet_recreates_vanished_dir(tmp_path):
    """A concurrent compactor's epoch GC can rmtree the delta dir between
    the apply task's makedirs and the write — the atomic writer recreates
    it and retries once instead of crashing the round."""
    from ape_dts_ray.state.manifest import atomic_write_parquet

    path = str(tmp_path / "gone" / "part.parquet")
    atomic_write_parquet(pa.table({"a": [1]}), path)     # dir never existed
    import pyarrow.parquet as pq
    assert pq.read_table(path).num_rows == 1


def test_commit_survives_stale_compactor_gc(tmp_path):
    """The fatal interleaving the randomized soak exposed: a STALE
    concurrent compactor (snapshot taken before a tail recommit) rmtree's
    the epoch dir right after our delta writes and publishes a compacted
    watermark BELOW our offset_max. Pre-fix the manifest then claimed
    coverage for rows whose files were destroyed unfolded — silent loss.
    The post-commit verification must detect (files missing AND watermark
    not covering) and re-run the window."""
    import shutil as _shutil

    import pyarrow.parquet as pq

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable
    from ape_dts_ray.state.manifest import EpochManifest, atomic_write_text

    events = gen_events(seed=47, n_convs=40, max_turns=6, n_events=3000,
                        delete_frac=0.1)
    path = str(tmp_path / "e.parquet")
    pq.write_table(events, path)
    cfg = EngineConfig(num_partitions=4, epoch_size=1000)

    clean = LakeTable.create(str(tmp_path / "clean"), TableMeta(), cfg)
    replay(clean, events_path=path)
    want = clean.state_table()

    lake = LakeTable.create(str(tmp_path / "raced"), TableMeta(), cfg)
    real_commit = lake.commit_epoch
    fired = {}

    def sabotage(m, schema_version=None, **kw):
        real_commit(m, schema_version=schema_version, **kw)
        if m.epoch == 1 and "done" not in fired:
            fired["done"] = True
            # the stale compactor: destroys the dir it believed empty and
            # publishes coverage only up to its stale snapshot (offset 100)
            _shutil.rmtree(os.path.join(lake.root, "delta", "epoch-00000001"))
            stale = EpochManifest(epoch=1, offset_min=-1, offset_max=100,
                                  schema_version=0, partitions=[])
            atomic_write_text(os.path.join(lake.root, "_manifests",
                                           "compacted.json"), stale.to_json())

    lake.commit_epoch = sabotage
    replay(lake, events_path=path)
    assert fired.get("done")                       # the race actually fired
    got = lake.state_table()
    assert got.num_rows == want.num_rows
    assert got.equals(want)                        # no silent row loss
    # and the epoch-1 delta files were re-created by the re-run
    assert os.path.isdir(os.path.join(lake.root, "delta", "epoch-00000001"))


# --------------------------- redis path post-review fixes (second pass)


def _ev_multiset(t):
    return sorted(map(str, t.to_pylist()))


def test_pexpireat_options_refused_both_paths():
    """PEXPIREAT NX/XX/GT/LT is conditional on live TTL state and anything
    else is rejected by real Redis — pre-fix both derivations silently
    applied the deadline unconditionally (and the fast path for ANY argc>=3)."""
    from ape_dts_ray.pipelines.redis_replay import (commands_to_events,
                                                    scan_to_events)
    from ape_dts_ray.sources.resp import encode_cmds, parse_resp

    for extra, msg in ((b"XX", "conditional on live state"),
                       (b"garbage", "unexpected argument")):
        raw = encode_cmds([[b"PEXPIREAT", b"k", b"1000", extra]])
        with pytest.raises(ValueError, match=msg):
            commands_to_events(parse_resp(raw))
        with pytest.raises(ValueError, match=msg):
            scan_to_events(raw)
    # the plain form still folds identically on both paths
    raw = encode_cmds([[b"SET", b"k", b"v"], [b"PEXPIREAT", b"k", b"1000"]])
    assert _ev_multiset(scan_to_events(raw)) == \
        _ev_multiset(commands_to_events(parse_resp(raw)))


def test_truncated_set_pxat_and_bad_numbers_refuse_with_context():
    """A log truncated at 'SET k v PXAT' must refuse with command+offset
    context on BOTH derivations (pre-fix: bare IndexError); HPEXPIREAT
    field counts and RESTORE ttls that aren't numbers name the command."""
    from ape_dts_ray.pipelines.redis_replay import (commands_to_events,
                                                    scan_to_events)
    from ape_dts_ray.sources.resp import encode_cmds, parse_resp

    raw = encode_cmds([[b"SET", b"k", b"v", b"PXAT"]])
    with pytest.raises(ValueError, match="SET PXAT missing"):
        commands_to_events(parse_resp(raw))
    with pytest.raises(ValueError, match="SET PXAT missing"):
        scan_to_events(raw)
    raw = encode_cmds([[b"HPEXPIREAT", b"k", b"1000", b"FIELDS", b"x",
                        b"f1", b"f2"]])
    with pytest.raises(ValueError, match="HPEXPIREAT field count"):
        scan_to_events(raw)
    payload = rdbmod.dump_value({"db": 0, "key": b"k", "type": "string",
                                 "expire_ms": 0, "value": b"v"})
    raw = encode_cmds([[b"RESTORE", b"k", b"zzz", payload]])
    with pytest.raises(ValueError, match="RESTORE ttl"):
        scan_to_events(raw)


def test_scan_oversize_falls_back_to_scalar(monkeypatch):
    """Buffers at/past the int32 gather ceiling route through the scalar
    walker (pa.binary() offsets and position gathers would WRAP past 2 GiB
    and emit garbage silently) — multiset equality must hold across the
    switch."""
    from ape_dts_ray.pipelines import redis_replay as rr
    from ape_dts_ray.sources.resp import encode_cmds, parse_resp

    raw = encode_cmds([[b"SET", b"k", b"v" * 40],
                       [b"HSET", b"h", b"f", b"w"],
                       [b"PEXPIREAT", b"k", b"1000"]])
    want = _ev_multiset(rr.commands_to_events(parse_resp(raw)))
    assert _ev_multiset(rr.scan_to_events(raw)) == want    # columnar path
    monkeypatch.setattr(rr, "_SCAN_MAX_BYTES", 8)
    assert _ev_multiset(rr.scan_to_events(raw)) == want    # fallback path


def test_rdb_reader_ignores_orphan_tmp(tmp_path, ray_session):
    """A writer crash leaves shard.rdb.tmp next to committed shards — the
    directory readers must parse only *.rdb (pre-fix the bare directory
    read ingested the orphan: a torn tmp crashed the parser, a complete
    one silently DOUBLE-COUNTED every key in the shard)."""
    from ape_dts_ray.pipelines.redis_replay import (rdb_key_statistics,
                                                    read_rdb_snapshot)

    entries = [{"db": 0, "key": b"k1", "type": "string", "expire_ms": 0,
                "value": b"v1"}]
    buf = rdbmod.encode_rdb(entries)
    d = tmp_path / "snap"
    d.mkdir()
    (d / "rdb_part_00000.rdb").write_bytes(buf)
    (d / "rdb_part_00001.rdb.tmp").write_bytes(buf[: len(buf) // 2])  # torn
    t = pa.concat_tables(read_rdb_snapshot(str(d)).iter_batches(
        batch_format="pyarrow", batch_size=None))
    assert t.num_rows == 1 and t.column("key").to_pylist() == [b"k1"]
    stats = pa.concat_tables(rdb_key_statistics(str(d)).iter_batches(
        batch_format="pyarrow", batch_size=None))
    assert stats.num_rows == 1 and stats.column("key").to_pylist() == [b"k1"]


def test_keyspace_read_retries_generation_advance(tmp_path, ray_session):
    """A concurrent ingest commits gen+1 and rmtree's the old generation
    between a reader's watermark read and its glob — the reader must
    re-list instead of silently returning an EMPTY keyspace."""
    from ape_dts_ray.pipelines.redis_replay import (RedisKeyspaceStore,
                                                    write_resp_log)

    log = str(tmp_path / "log")
    write_resp_log([[b"SET", b"a", b"1"], [b"SET", b"b", b"2"]], log, 0)
    store = RedisKeyspaceStore.create(str(tmp_path / "store"),
                                      num_partitions=2)
    store.ingest(log)
    real_wm = store.watermark()["gen"]
    calls = {"n": 0}
    real = RedisKeyspaceStore.watermark

    def stale_once(self):
        calls["n"] += 1
        wm = real(self)
        if calls["n"] == 1:
            return {**wm, "gen": wm["gen"] - 1}    # the GC'd generation
        return wm

    store.watermark = stale_once.__get__(store)
    t = store.keyspace_table()
    assert t.num_rows == 2                          # not the silent empty
    assert store.watermark()["gen"] == real_wm


def test_stream_field_order_survives_fold_and_sink(ray_session):
    """Redis streams preserve field insertion order per entry — fold-derived
    keyspaces must carry it in idx like the RDB-parse path does (pre-fix
    idx was null and the sink re-emitted 'XADD s 5-1 b 1 a 2' as 'a 2 b 1'),
    and the order must survive the incremental refold."""
    from ape_dts_ray.pipelines.redis_replay import (_keyspace_to_entries,
                                                    commands_to_events,
                                                    fold_events,
                                                    keyspace_to_events)
    from ape_dts_ray.sources.resp import encode_cmds, parse_resp

    raw = encode_cmds([[b"XADD", b"s", b"5-1", b"b", b"1", b"a", b"2"],
                       [b"XADD", b"s", b"6-1", b"z", b"9", b"y", b"8"]])
    folded = fold_events(commands_to_events(parse_resp(raw)))
    ents = _keyspace_to_entries(folded)
    assert ents[0]["entries"] == [(b"5-1", [(b"b", b"1"), (b"a", b"2")]),
                                  (b"6-1", [(b"z", b"9"), (b"y", b"8")])]
    # incremental refold: state -> synthetic events -> fold, order intact
    refold = fold_events(keyspace_to_events(folded, base_offset=10_000))
    assert _keyspace_to_entries(refold)[0]["entries"] == ents[0]["entries"]


# ------------------------------ rdb/resp codec post-review fixes


def test_stream_lp_count_matches_redis():
    """The stored lp_count EXCLUDES the lp-count element itself (redis
    t_stream.c: numfields+3 SAMEFIELDS, 2*numfields+4 explicit) — it is
    the reverse-iteration jump distance, and one-too-high (the pre-fix
    encoder) lands a real Redis one element early on every XREVRANGE.
    The parser now validates it, so the roundtrip proves the wire value."""
    entries = [{"db": 0, "key": b"s", "type": "stream", "expire_ms": 0,
                "entries": [
                    (b"5-1", [(b"a", b"1"), (b"b", b"2")]),   # master shape
                    (b"6-1", [(b"a", b"3"), (b"b", b"4")]),   # SAMEFIELDS
                    (b"7-1", [(b"x", b"9")]),                 # explicit
                ],
                "last_id": b"7-1", "groups": []}]
    buf = rdbmod.encode_rdb(entries)
    _, back = rdbmod.parse_rdb(buf)
    assert back[0]["entries"] == entries[0]["entries"]
    # a miscounted record (the pre-fix +1 shape) is refused, not skipped
    # blind: rebuild the listpack with the off-by-one counts by hand
    els = [b"3", b"0", b"2", b"a", b"b", b"0",
           b"2", b"0", b"0", b"1", b"2", b"6",     # SAMEFIELDS: should be 5
           b"2", b"1", b"0", b"3", b"4", b"6",
           b"0", b"2", b"0", b"1", b"x", b"9", b"7"]  # explicit: should be 6
    body = bytearray()
    body.append(rdbmod.RDB_TYPE_STREAM_LISTPACKS_2)
    rdbmod.write_string(body, b"s", try_int=False)
    rdbmod.write_length(body, 1)
    rdbmod.write_string(body, struct.pack(">QQ", 5, 1), try_int=False)
    rdbmod.write_string(body, rdbmod.encode_listpack(els), try_int=False)
    for v in (3, 7, 1, 5, 1, 0, 0, 3, 0):       # len, last, first, maxdel,
        rdbmod.write_length(body, v)            # added, groups
    with pytest.raises(ValueError, match="lp_count"):
        rdbmod.parse_rdb(_img(bytes(body)))


def test_stream_wide_entries_chunk_by_element_budget():
    """100 entries x 400 fields would blow the 65534-element listpack cap
    under entry-count-only chunking — the encoder must bound the ELEMENT
    budget per node."""
    fvs = [(b"f%03d" % i, b"v") for i in range(400)]
    entries = [{"db": 0, "key": b"wide", "type": "stream", "expire_ms": 0,
                "entries": [(b"%d-1" % (i + 1), fvs) for i in range(100)],
                "last_id": b"100-1", "groups": []}]
    buf = rdbmod.encode_rdb(entries)
    _, back = rdbmod.parse_rdb(buf)
    assert back[0]["entries"] == entries[0]["entries"]


def test_module_aux_skip_parse():
    """RDB_OPCODE_MODULE_AUX (0xF7: moduleid, when_opcode, when, opcode
    stream) must skip-parse like MODULE_2 — pre-fix the whole snapshot
    aborted with 'unsupported type byte 247'."""
    body = bytearray()
    body.append(rdbmod.OP_MODULE_AUX)
    rdbmod.write_length(body, (77 << 10) | 2)     # module id (encver 2)
    rdbmod.write_length(body, 2)                  # when_opcode
    rdbmod.write_length(body, 0)                  # when
    rdbmod.write_length(body, 5)                  # opcode: string
    rdbmod.write_string(body, b"aux payload", try_int=False)
    rdbmod.write_length(body, 3)                  # opcode: binary float
    body += struct.pack("<f", 1.5)
    rdbmod.write_length(body, 0)                  # opcode EOF
    body.append(rdbmod.RDB_TYPE_STRING)
    rdbmod.write_string(body, b"k", try_int=False)
    rdbmod.write_string(body, b"v", try_int=False)
    meta, entries = rdbmod.parse_rdb(_img(bytes(body)))
    assert [(e["key"], e["value"]) for e in entries] == [(b"k", b"v")]
    assert meta["skipped_modules"][0]["aux"] is True
    assert meta["skipped_modules"][0]["key"] is None


def test_truncated_crc_footer_refuses():
    """A file cut INSIDE the 8-byte CRC footer still carries its EOF opcode
    — pre-fix verification was silently skipped and the torn file passed
    verify_checksum=True."""
    buf = rdbmod.encode_rdb([{"db": 0, "key": b"k", "type": "string",
                              "expire_ms": 0, "value": b"v"}])
    torn = buf[:-4]
    with pytest.raises(ValueError, match="truncated CRC"):
        rdbmod.parse_rdb(torn)
    meta, entries = rdbmod.parse_rdb(torn, verify_checksum=False)
    assert entries[0]["key"] == b"k"


def test_calc_slots_oversize_key_scalar_path():
    """A single huge key must not size the padded CRC matrix for the whole
    batch (n x max_len int64 — one 1 MB key in a 100k batch is ~100 GB);
    oversize rows take the scalar path and slots stay correct."""
    from ape_dts_ray.sources.resp import calc_slot, calc_slots

    big = b"K" * 20_000
    keys = pa.array([b"a", big, b"{tag}x", b"b"], pa.binary())
    got = calc_slots(keys).tolist()
    assert got == [calc_slot(b"a"), calc_slot(big), calc_slot(b"{tag}x"),
                   calc_slot(b"b")]


def test_dump_value_lzf_sample_roundtrip():
    """dump_value forwards lzf_sample (the RESTORE sink uses 16, matching
    the RDB sink) — sampled compression changes bytes, never content."""
    e = {"db": 0, "key": b"k", "type": "string", "expire_ms": 0,
         "value": b"abcabcabcabcabcabcabcabcabcabc" * 4}
    for sample in (0, 1, 16):
        back = rdbmod.parse_dump_value(rdbmod.dump_value(e, lzf_sample=sample))
        assert back["value"] == e["value"]


# ---------------------------- lake/apply post-review fixes (third pass)


def _mini_lake(tmp_path, name, **cfg_kw):
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.state.lake import LakeTable

    cfg = EngineConfig(num_partitions=cfg_kw.pop("num_partitions", 4),
                       epoch_size=cfg_kw.pop("epoch_size", 1000))
    return LakeTable.create(str(tmp_path / name), TableMeta(), cfg)


def test_commit_refuses_during_rotation_and_truncate(tmp_path):
    """replay()'s plan-time marker check leaves a window where an in-flight
    chunk commits AFTER rotation/truncate began — an epoch the maintenance
    snapshot never saw, with old-salt placements. commit_epoch now turns
    that silent divergence into a loud crash."""
    from ape_dts_ray.state.manifest import EpochManifest, atomic_write_text

    lake = _mini_lake(tmp_path, "l1")
    m = EpochManifest(epoch=0, offset_min=0, offset_max=9, schema_version=0,
                      partitions=[])
    for marker in ("rotation.json", "truncate.json"):
        p = os.path.join(lake.root, "_manifests", marker)
        atomic_write_text(p, "{}")
        with pytest.raises(RuntimeError, match="in progress"):
            lake.commit_epoch(m)
        os.remove(p)
    lake.commit_epoch(m)                       # markers gone: commits fine
    assert lake.committed_epochs() == [0]


def test_rotation_recovery_deletes_only_snapshot_epochs(tmp_path):
    """Crash recovery must delete exactly the epochs the crashed rotation
    folded into base_next (recorded in the swap marker) — pre-fix it used
    a FRESH listing and destroyed any epoch committed mid-rotation,
    regressing the watermark below rows the rebuilt base never saw."""
    import json as _json

    import pyarrow.parquet as pq

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.manifest import EpochManifest, atomic_write_text

    lake = _mini_lake(tmp_path, "l2")
    ev = gen_events(seed=53, n_convs=20, max_turns=4, n_events=2500)
    src = str(tmp_path / "ev.parquet")
    pq.write_table(ev, src)
    replay(lake, events_path=src)
    epochs = lake.committed_epochs()
    assert len(epochs) >= 2
    snap, late = epochs[:-1], epochs[-1]
    # simulate the crashed rotation: swap committed (marker + base_next),
    # snapshot = all but the LAST epoch (committed "mid-rotation")
    nxt = os.path.join(lake.root, "base_next")
    os.makedirs(nxt, exist_ok=True)
    atomic_write_text(os.path.join(lake.root, "_manifests",
                                   "rotation_swap.json"),
                      _json.dumps({"hot_keys": [], "epochs": snap}))
    atomic_write_text(
        os.path.join(lake.root, "_manifests", "compacted.json"),
        EpochManifest(epoch=snap[-1], offset_min=-1,
                      offset_max=lake.read_manifest(snap[-1]).offset_max,
                      schema_version=0, partitions=[]).to_json())
    wm_before = lake.watermark()
    lake._recover_rotation()
    assert lake.committed_epochs() == [late]   # mid-rotation epoch SURVIVES
    assert lake.watermark() == wm_before       # coverage never regressed


def test_publish_compacted_never_regresses(tmp_path):
    """Two concurrent compactors' read-then-write could regress the
    published watermark; the write-verify loop re-publishes the max."""
    from ape_dts_ray.state.manifest import EpochManifest, atomic_write_text

    lake = _mini_lake(tmp_path, "l3")
    high = EpochManifest(epoch=5, offset_min=-1, offset_max=1000,
                         schema_version=0, partitions=[])
    atomic_write_text(os.path.join(lake.root, "_manifests",
                                   "compacted.json"), high.to_json())
    low = EpochManifest(epoch=3, offset_min=-1, offset_max=80,
                        schema_version=0, partitions=[])
    lake._publish_compacted(low)
    assert lake.compacted_watermark() == 1000


def test_reserved_columns_refused(tmp_path):
    """Events already carrying _epoch/_shard/part_id (exported lake files
    keep engine columns) must refuse loudly — append_column would create a
    duplicate field that breaks every later fold/groupby."""
    import pyarrow.parquet as pq

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.partition import add_partition_column
    from ape_dts_ray.pipelines.replay import replay

    ev = gen_events(seed=54, n_convs=5, max_turns=3, n_events=200)
    poisoned = ev.append_column("_epoch", pa.array(
        np.zeros(ev.num_rows, np.int64)))
    src = str(tmp_path / "poisoned.parquet")
    pq.write_table(poisoned, src)
    lake = _mini_lake(tmp_path, "l4")
    with pytest.raises(Exception, match="reserved column"):
        replay(lake, events_path=src)
    assert lake.committed_epochs() == []       # refused BEFORE commit
    with_part = ev.append_column("part_id", pa.array(
        np.zeros(ev.num_rows, np.int32)))
    with pytest.raises(ValueError, match="reserved column"):
        add_partition_column(with_part, 4)


def test_create_validates_if_exists_on_fresh_path(tmp_path):
    from ape_dts_ray.meta import TableMeta
    from ape_dts_ray.state.lake import LakeTable

    with pytest.raises(ValueError, match="invalid if_exists"):
        LakeTable.create(str(tmp_path / "fresh"), TableMeta(),
                         if_exists="overwite")
    assert not os.path.exists(str(tmp_path / "fresh" / "_table.json"))


def test_full_compact_noop_skips_base_rewrite(tmp_path):
    """compact() on an already-compacted unindexed lake must not re-fold
    and rewrite byte-identical base files — at the 100-TB shape that turns
    a no-op maintenance pass into a full-lake rewrite."""
    import pyarrow.parquet as pq

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.pipelines.replay import replay

    lake = _mini_lake(tmp_path, "l5")
    src = str(tmp_path / "ev5.parquet")
    pq.write_table(gen_events(seed=55, n_convs=20, max_turns=4,
                              n_events=2000), src)
    replay(lake, events_path=src)
    lake.compact(parallel=False)
    stats = {p: os.stat(lake.base_path(p)).st_mtime_ns
             for p in range(lake.config.num_partitions)
             if os.path.exists(lake.base_path(p))}
    assert stats
    t_before = lake.state_table()
    lake.compact(parallel=False)               # no new deltas: a no-op
    for p, mt in stats.items():
        assert os.stat(lake.base_path(p)).st_mtime_ns == mt
    assert lake.state_table().equals(t_before)


def test_rotation_clusters_by_index(tmp_path):
    """compact(new_hot_keys=...) must keep the registered index as the base
    files' clustering key (the __init__ contract) — pre-fix it re-sorted by
    id cols, scrambling indexed-column row-group stats until the next full
    compact."""
    import pyarrow.parquet as pq

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.pipelines.replay import replay

    lake = _mini_lake(tmp_path, "l6")
    lake.set_indexes([{"name": "by_role", "cols": ["role"]}])
    src = str(tmp_path / "ev6.parquet")
    pq.write_table(gen_events(seed=56, n_convs=30, max_turns=4,
                              n_events=2500), src)
    replay(lake, events_path=src)
    lake.compact(new_hot_keys=("c1",), parallel=False)
    seen = 0
    for p in range(lake.config.num_partitions):
        bp = lake.base_path(p)
        if not os.path.exists(bp):
            continue
        roles = pq.read_table(bp, columns=["role"]).column("role").to_pylist()
        assert roles == sorted(roles), f"partition {p} not role-clustered"
        seen += 1
    assert seen


# ------------------------ pipeline post-review fixes (fourth pass)


def test_revise_offsets_never_advance_source_watermark(tmp_path, ray_session):
    """revise() squats synthetic offsets wm+1..wm+n; pre-fix compact()
    published them as SOURCE coverage, so the next n real CDC events
    planned as already-consumed and silently skipped. Watermarks must
    exclude the revise band, and post-compact replay of real events at
    those offsets must apply."""
    import ray.data as rd

    import pyarrow.parquet as pq

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.pipelines.checker import check_datasets, revise
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.pipelines.snapshot import load_snapshot

    events = gen_events(seed=60, n_convs=20, max_turns=6, n_events=2000,
                        delete_frac=0.1)
    path = str(tmp_path / "ev.parquet")
    pq.write_table(events, path)
    src = _mini_lake(tmp_path, "src60")
    replay(src, events_path=path)
    wm = src.watermark()

    corrupted = src.state_table().to_pandas().iloc[3:]
    dst = _mini_lake(tmp_path, "dst60")
    load_snapshot(dst, rd.from_pandas(corrupted))
    check = check_datasets(src.state_dataset(), dst.state_dataset(),
                           num_partitions=4)
    n = revise(dst, src.state_dataset(), check)
    assert n >= 3
    assert dst.watermark() <= wm               # synthetic offsets excluded
    dst.compact(parallel=False)
    assert dst.watermark() <= wm               # and compact doesn't publish
    # real CDC events arriving at the offsets revise squatted MUST apply
    import pyarrow.compute as pc
    late = pa.table({
        "log_offset": pa.array([wm + 1], pa.int64()),
        "seq": pa.array([0], pa.int32()),
        "op": ["insert"], "conv_id": ["late_conv"],
        "turn_idx": pa.array([0], pa.int32()),
        "role": ["user"], "text": ["late row"],
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([None], pa.timestamp("us")),
    })
    late_path = str(tmp_path / "late.parquet")
    pq.write_table(late, late_path)
    replay(dst, events_path=late_path, min_offset=wm + 1)
    t = dst.state_table()
    assert "late_conv" in set(t.column("conv_id").to_pylist())


def test_segment_vanish_above_floor_refuses(tmp_path):
    """A cached segment that vanishes while still covering offsets at/above
    the pending floor was silently evicted — the next tail recommit then
    overwrote the committed delta with a SUBSET. Must refuse; fully-below-
    floor segments still evict quietly."""
    import pyarrow.parquet as pq

    from ape_dts_ray.pipelines.follow import _SegmentScan

    log = tmp_path / "log"
    log.mkdir()
    for i, (lo, hi) in enumerate([(0, 99), (100, 199)]):
        pq.write_table(pa.table({"log_offset": pa.array(
            [lo, hi], pa.int64())}), str(log / f"seg{i}.parquet"))
    sc = _SegmentScan(str(log), "*.parquet", "log_offset")
    assert len(sc.scan(floor=0)) == 2          # both cached
    os.remove(str(log / "seg1.parquet"))
    with pytest.raises(RuntimeError, match="vanished while covering"):
        sc.scan(floor=150)                     # cached mx=199 >= floor
    os.remove(str(log / "seg0.parquet"))       # mx=99 < floor: fine
    sc.cache.pop(str(log / "seg1.parquet"))
    assert sc.scan(floor=150) == {}


def test_export_refuses_mid_rotation(tmp_path, ray_session):
    from ape_dts_ray.pipelines.export import export_state
    from ape_dts_ray.state.manifest import atomic_write_text

    lake = _mini_lake(tmp_path, "l60")
    atomic_write_text(os.path.join(lake.root, "_manifests", "rotation.json"),
                      "{}")
    with pytest.raises(RuntimeError, match="rotation in progress"):
        export_state(lake, str(tmp_path / "out"))


def test_follow_defer_does_not_count_idle(tmp_path, ray_session, monkeypatch):
    """Transient footer-read errors defer the round; pre-fix deferrals
    counted toward max_idle_rounds, so drain-then-exit mode could stop
    'idle_limit' with pending offsets unapplied. Now the 10-round defer
    budget surfaces the persistent error loudly instead."""
    import pyarrow.parquet as pq

    from ape_dts_ray.pipelines import follow as fmod

    log = tmp_path / "log"
    log.mkdir()
    pq.write_table(pa.table({"log_offset": pa.array([0, 50], pa.int64())}),
                   str(log / "seg0.parquet"))
    lake = _mini_lake(tmp_path, "l61")

    def boom(path, col):
        raise OSError("injected transient footer error")

    monkeypatch.setattr(fmod, "_file_offset_span", boom)
    with pytest.raises(RuntimeError, match="giving up"):
        fmod.replay_follow(lake, str(log), poll_interval=0.01,
                           max_idle_rounds=3)


def test_ship_link_retry_does_not_double_count(tmp_path, ray_session):
    """A crashed shipment leaves partial parquet in out_dir; the retry must
    not sum both sets (the shard would carry duplicate events and an
    inflated count)."""
    import pyarrow.parquet as pq

    from ape_dts_ray.pipelines.cycle import ship_link

    src_log = tmp_path / "srclog"
    src_log.mkdir()
    t = pa.table({
        "log_offset": pa.array([0, 1, 2], pa.int64()),
        "seq": pa.array([0, 0, 0], pa.int32()),
        "op": ["insert"] * 3, "conv_id": ["a", "b", "c"],
        "turn_idx": pa.array([0, 0, 0], pa.int32()),
        "role": ["user"] * 3, "text": ["x", "y", "z"],
        "origin": ["A", "A", "A"],
    })
    pq.write_table(t, str(src_log / "p0.parquet"))
    out = tmp_path / "ship"
    out.mkdir()
    pq.write_table(t.slice(0, 1), str(out / "stale-partial.parquet"))
    got = ship_link(str(src_log), str(out), cursor=0,
                    src_node="A", dst_node="B")
    assert got == 3                            # not 4 (stale file cleared)


def test_write_check_logs_clears_stale_files(tmp_path, ray_session):
    import json as _json

    import ray.data as rd

    from ape_dts_ray.pipelines.checker import write_check_logs

    out = str(tmp_path / "check")
    miss = pa.table({"conv_id": ["c1"], "turn_idx": pa.array([0], pa.int32()),
                     "check_type": ["miss"]})
    counts = write_check_logs(rd.from_arrow(miss), out)
    assert counts == {"miss": 1}
    assert os.path.exists(os.path.join(out, "miss.log"))
    # clean re-check: no defects — the stale miss.log must not survive
    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "turn_idx": pa.array([], pa.int32()),
                      "check_type": pa.array([], pa.string())})
    counts = write_check_logs(rd.from_arrow(empty), out)
    assert counts == {}
    assert not os.path.exists(os.path.join(out, "miss.log"))


# ---------------------- functions/stages post-review fixes (fifth pass)


def test_minhash_degenerate_bucket_star_expansion(ray_session):
    """All-identical (e.g. empty) docs share every band bucket; all-pairs
    would allocate O(m²). The star expansion keeps O(m) pairs while the
    union-find still recovers the full connected component — no duplicate
    silently survives."""
    import ray.data as rd

    from ape_dts_ray.functions import dedup as dd

    n = 5000                      # > MAX_LSH_BUCKET: the star path fires
    assert n > dd.MAX_LSH_BUCKET
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": ["same text body here"] * n})
    src_pairs = dd.minhash_dedup_pairs(rd.from_pandas(docs), threshold=0.8)
    assert len(src_pairs) == n - 1             # star, not the n(n-1)/2 pairs
    comp = set(src_pairs["a"]) | set(src_pairs["b"])
    assert comp == set(range(n))               # one full component
    # every doc except the min-id keeper is a duplicate OF doc 0
    dups = dd.minhash_dedup(rd.from_pandas(docs), threshold=0.8)
    assert sorted(dups["doc_id"]) == list(range(1, n))
    assert set(dups["dup_of"]) == {0}


def test_cosine_pairs_sparse_ids(tmp_path, ray_session):
    """Gaps in the id domain must not crash the empty-block read, and a
    snowflake-wide domain refuses with the problem named instead of
    building a quadratic descriptor grid on the driver."""
    import pyarrow.parquet as pq

    from ape_dts_ray.functions.dedup import cosine_pairs

    rng = np.random.default_rng(5)
    V = rng.standard_normal((6, 8))
    V[1] = V[0]                               # one exact near-dup pair
    ids = np.array([0, 1, 2, 5000, 5001, 5002], np.int64)  # gap in the middle
    p = str(tmp_path / "emb.parquet")
    pq.write_table(pa.table({"vec_id": ids, "embedding": list(V)}), p)
    pairs = pa.concat_tables(
        cosine_pairs(p, threshold=0.99, block_rows=1024).iter_batches(
            batch_format="pyarrow", batch_size=None))
    assert (0, 1) in set(zip(pairs.column("a").to_pylist(),
                             pairs.column("b").to_pylist()))
    wide = str(tmp_path / "wide.parquet")
    pq.write_table(pa.table({"vec_id": pa.array([0, 1 << 40], pa.int64()),
                             "embedding": list(V[:2])}), wide)
    with pytest.raises(ValueError, match="dense id domain"):
        cosine_pairs(wide, threshold=0.9, block_rows=1024)


def test_split_pk_change_forces_delete_seq_zero():
    """The delete half must carry seq=0 per the documented LWW tie-break —
    an inherited source seq>=2 would outrank same-offset seq-1 events."""
    from ape_dts_ray.stages.normalize import split_pk_change

    batch = pa.table({
        "log_offset": pa.array([10], pa.int64()),
        "seq": pa.array([3], pa.int32()),
        "op": ["update"], "conv_id": ["c"],
        "turn_idx": pa.array([1], pa.int32()),
        "new_turn_idx": pa.array([2], pa.int32()),
        "text": ["body"],
    })
    out = split_pk_change(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["seq"])
    assert [(r["op"], r["seq"], r["turn_idx"]) for r in rows] == \
        [("delete", 0, 1), ("insert", 1, 2)]


def test_langid_handles_pd_na():
    from ape_dts_ray.functions.text import LangId

    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": pd.array(["the and of this", None],
                                        dtype="string")})
    out = LangId()(df)
    assert list(out["lang_pred"]) == ["en", "und"]


def test_rolling_hashes_chunked_identical():
    """The chunked window matrix must emit byte-identical hashes to the
    single-shot formula (same per-window arithmetic)."""
    from ape_dts_ray.functions.text import MOD, BASE, rolling_hashes

    rng = np.random.default_rng(9)
    data = bytes(rng.integers(0, 256, 100_000, dtype=np.uint8))
    w = 16
    hs = rolling_hashes(data, w)
    assert len(hs) == len(data) - w + 1
    # spot-check against the direct definition at a few positions
    b = np.frombuffer(data, np.uint8).astype(np.uint64)
    pows = np.empty(w, np.uint64)
    pows[0] = 1
    for i in range(1, w):
        pows[i] = (pows[i - 1] * BASE) % MOD
    for pos in (0, 1, 31337, len(hs) - 1):
        want = int((b[pos:pos + w] * pows[::-1]).sum() % MOD)
        assert int(hs[pos]) == want, pos


def test_reverse_sql_evolved_column_types(ray_session):
    """A payload column existing on only ONE side must null-pad with the
    type the other side carries — the hard-coded string pad made the union
    fail for evolved int64 columns."""
    import ray.data as rd

    from ape_dts_ray.stages.sql_format import reverse_sql_with_before

    events = pa.table({
        "conv_id": ["c"], "turn_idx": pa.array([0], pa.int32()),
        "log_offset": pa.array([5], pa.int64()), "op": ["update"],
        "text": ["new"], "score": pa.array([42], pa.int64()),  # evolved col
    })
    state = pa.table({
        "conv_id": ["c"], "turn_idx": pa.array([0], pa.int32()),
        "text": ["old"],                                  # no score column
    })
    out = reverse_sql_with_before(
        rd.from_arrow(events), rd.from_arrow(state), table="t",
        key_cols=("conv_id", "turn_idx"), payload_cols=("text", "score"),
        num_partitions=2)
    rows = pa.concat_tables(out.iter_batches(batch_format="pyarrow",
                                             batch_size=None)).to_pylist()
    assert len(rows) == 1 and "REPLACE INTO" in rows[0]["sql"]


# -------------------- replay/multitable post-review fixes (sixth pass)


def test_mixed_no_truncate_resurrection(tmp_path, ray_session):
    """A truncated lake must stay truncated through replay_mixed even when
    ANOTHER lake still lacks those windows — pre-fix the window was pending
    globally and the truncated lake's pre-truncate rows were re-applied
    over its emptied base."""
    import pyarrow.parquet as pq

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.meta import EngineConfig
    from ape_dts_ray.pipelines.multitable import replay_mixed
    from ape_dts_ray.state.lake import LakeTable

    ev = gen_events(seed=70, n_convs=20, max_turns=4, n_events=3000)
    half = ev.num_rows // 2
    rng = np.random.default_rng(3)
    tbl = pa.array(np.where(rng.random(ev.num_rows) < 0.5, "ta", "tb"))
    mixed = ev.append_column("table", tbl)
    log = tmp_path / "log"
    log.mkdir()
    pq.write_table(mixed.slice(0, half), str(log / "seg0.parquet"))
    root = str(tmp_path / "lakes")
    cfg = EngineConfig(num_partitions=4, epoch_size=500)
    replay_mixed(root, ["ta", "tb"], events_path=str(log / "seg0.parquet"),
                 config=cfg)
    la = LakeTable.open(os.path.join(root, "ta"))
    assert la.state_table().num_rows > 0
    la.truncate()                              # A emptied, watermark kept
    assert la.state_table().num_rows == 0
    # lake B loses ground: wipe B so every early window is pending for it
    import shutil as _shutil
    _shutil.rmtree(os.path.join(root, "tb"))
    pq.write_table(mixed.slice(half), str(log / "seg1.parquet"))
    replay_mixed(root, ["ta", "tb"],
                 events_path=[str(log / "seg0.parquet"),
                              str(log / "seg1.parquet")], config=cfg)
    la = LakeTable.open(os.path.join(root, "ta"))
    ta_rows = la.state_table()
    # A holds ONLY post-truncate state: every live row's offset is above
    # the truncate floor (pre-truncate history did not resurrect)
    floor = la.truncate_offset
    assert floor > 0
    live = la.state_table(drop_engine_cols=False)
    if live.num_rows:
        assert min(live.column("log_offset").to_pylist()) > floor
    # B converged over the full log
    lb = LakeTable.open(os.path.join(root, "tb"))
    assert lb.watermark() == la.watermark()


def test_run_tables_refuses_many_to_one(tmp_path, ray_session):
    from ape_dts_ray.pipelines.multitable import TableJob, run_tables
    from ape_dts_ray.stages.router import Router

    router = Router(table_map={"a.t1": "t1", "b.t1": "t1"})
    with pytest.raises(ValueError, match="many-to-one"):
        run_tables(str(tmp_path), [TableJob("a.t1"), TableJob("b.t1")],
                   router=router)


def test_user_processor_guards_seq():
    from ape_dts_ray.stages.processor import ProcessorError, UserProcessor

    batch = pa.table({
        "log_offset": pa.array([1], pa.int64()),
        "seq": pa.array([0], pa.int32()),
        "op": ["insert"], "conv_id": ["c"],
        "turn_idx": pa.array([0], pa.int32()),
    })

    def drops_seq(t: pa.Table) -> pa.Table:
        return t.drop_columns(["seq"])

    with pytest.raises(ProcessorError, match="seq"):
        UserProcessor(drops_seq)(batch)
    # a batch that never carried seq is not required to invent it
    no_seq = batch.drop_columns(["seq"])
    assert UserProcessor(lambda t: t)(no_seq).num_rows == 1


def test_precheck_validates_every_file(tmp_path):
    import pyarrow.parquet as pq

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.pipelines.precheck import check_event_source

    good = gen_events(seed=71, n_convs=5, max_turns=3, n_events=200)
    p0 = str(tmp_path / "seg0.parquet")
    p1 = str(tmp_path / "seg1.parquet")
    pq.write_table(good, p0)
    pq.write_table(good.drop_columns(["op"]), p1)     # older producer
    results = check_event_source([p0, p1])
    bad = [r for r in results if not r.ok]
    assert any("seg1" in r.detail and r.name == "column:op" for r in bad)
    assert all(r.ok for r in check_event_source([p0, p0]))


# ------------------- final sweep fixes (multimodal/server/snapshot)


def test_decode_image_nonstrict_never_raises():
    """The class contract: strict raises, non-strict falls back to the
    deterministic fake — pre-fix the PIL and pure-PNG branches had no
    guard and one bad payload killed the whole actor-pool stage."""
    from ape_dts_ray.functions.multimodal import _PNG_SIG, DecodeImage

    dec = DecodeImage(out_size=4, strict=False)
    for payload in (b"garbage not an image",
                    _PNG_SIG + b"\x00\x01corrupt body"):
        img = dec._decode(payload)
        assert img.shape == (4, 4)
    strict = DecodeImage(out_size=4, strict=True)
    with pytest.raises(Exception):
        strict._decode(_PNG_SIG + b"\x00\x01corrupt body")


def test_pull_server_statless_footers_and_bad_requests(tmp_path):
    """Stats-less parquet must not truncate the served stream at -1, /ack
    without an offset must be a 400 (not a dropped connection), and a
    malformed batch_size a 400 (not a misleading 409)."""
    import urllib.error
    import urllib.request

    import pyarrow.parquet as pq

    from ape_dts_ray.pipelines.pull_server import PullServer

    t = pa.table({
        "log_offset": pa.array([0, 5_000], pa.int64()),     # sparse
        "seq": pa.array([0, 0], pa.int32()),
        "op": ["insert", "insert"], "conv_id": ["a", "b"],
        "turn_idx": pa.array([0, 0], pa.int32()),
        "role": ["user", "user"], "text": ["x", "y"],
        "tool": pa.array([None, None], pa.string()),
        "ts": pa.array([None, None], pa.timestamp("us")),
    })
    p = str(tmp_path / "ev.parquet")
    pq.write_table(t, p, write_statistics=False)
    srv = PullServer(p, str(tmp_path / "state.json")).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        assert srv.max_offset == 5_000            # scanned, not -1
        got = urllib.request.urlopen(f"{base}/fetch_new?batch_size=1").read()
        assert got                                 # first row served
        for bad, code in (("/ack", 400), ("/fetch_new?batch_size=abc", 400)):
            try:
                urllib.request.urlopen(base + bad)
                raise AssertionError("expected HTTPError")
            except urllib.error.HTTPError as e:
                assert e.code == code, (bad, e.code)
    finally:
        srv.stop()


def test_load_snapshot_refuses_engine_columns(tmp_path, ray_session):
    import ray.data as rd

    from ape_dts_ray.pipelines.snapshot import load_snapshot

    lake = _mini_lake(tmp_path, "snapres")
    rows = pa.table({
        "conv_id": ["c"], "turn_idx": pa.array([0], pa.int32()),
        "text": ["x"], "log_offset": pa.array([9], pa.int64()),  # reserved
    })
    with pytest.raises(Exception, match="reserved engine column"):
        load_snapshot(lake, rd.from_arrow(rows))


def test_gc_epoch_tolerates_concurrent_recommit_write(tmp_path, monkeypatch):
    """A tail recommit can write NEW delta files into an epoch dir while a
    compactor's rmtree walks it — rmtree then fails ENOTEMPTY. The GC must
    leave the dir AND the manifest for the writer to re-claim (pre-fix the
    OSError escaped the FileNotFoundError-only guard and crashed the
    compactor; the mixed soak reproduced it)."""
    import errno
    import shutil as _shutil

    from ape_dts_ray.state import lake as lakemod
    from ape_dts_ray.state.manifest import EpochManifest

    lake = _mini_lake(tmp_path, "gc1")
    os.makedirs(os.path.join(lake.root, "delta", "epoch-00000000"))
    lake.commit_epoch(EpochManifest(epoch=0, offset_min=0, offset_max=9,
                                    final=True, schema_version=0,
                                    partitions=[]))

    def busy_rmtree(path, **kw):
        raise OSError(errno.ENOTEMPTY, "Directory not empty", path)

    monkeypatch.setattr(lakemod.shutil, "rmtree", busy_rmtree)
    lake._gc_epoch(0)                              # must NOT raise
    assert lake.committed_epochs() == [0]          # manifest left in place
    monkeypatch.undo()
    lake._gc_epoch(0)                              # normal path still GCs
    assert lake.committed_epochs() == []


# --------------------------------------- replay_mixed chunk retry (race)

def _mixed_fixture(tmp_path, seed, n_events):
    """An interleaved two-table log (parity of the conv_id's first-seen
    index) + its per-table oracle inputs — the shape test_multitable uses."""
    import pyarrow.compute as pc2
    import pyarrow.parquet as pq

    from ape_dts_ray.fixtures import gen_events

    events = gen_events(seed=seed, n_convs=20, max_turns=5,
                        n_events=n_events, delete_frac=0.2)
    parity = pc2.bit_wise_and(
        pc2.index_in(events.column("conv_id"),
                     value_set=pc2.unique(events.column("conv_id"))),
        pa.scalar(1, pa.int32()))
    mixed = events.append_column(
        "table", pc2.if_else(pc2.equal(parity, pa.scalar(0, pa.int32())),
                             pa.scalar("tbl_even"), pa.scalar("tbl_odd")))
    path = str(tmp_path / "mixed.parquet")
    pq.write_table(mixed, path)
    return events, parity, path


@pytest.mark.usefixtures("ray_session")
def test_replay_mixed_retries_stale_compactor_vanish(tmp_path, monkeypatch):
    """A stale compactor rmtree-ing a freshly committed epoch's delta files
    without watermark coverage used to kill replay_mixed with a loud
    RuntimeError on the FIRST hit — but the follow daemon made the race
    routine (the soak fired it every few rounds). The chunk-level bounded
    retry must re-derive lineage, re-commit idempotently and converge."""
    import shutil as _shutil

    import pyarrow.compute as pc2

    from ape_dts_ray.fixtures import oracle_replay
    from ape_dts_ray.meta import EngineConfig
    from ape_dts_ray.pipelines.multitable import replay_mixed
    from ape_dts_ray.state.lake import LakeTable

    events, parity, path = _mixed_fixture(tmp_path, seed=81, n_events=2000)
    root = str(tmp_path / "lakes")
    cfg = EngineConfig(num_partitions=4, epoch_size=10_000)

    real_commit = LakeTable.commit_epoch
    hits = {"n": 0}

    def compactor_races_once(self, m, schema_version=None, **kw):
        real_commit(self, m, schema_version, **kw)
        if hits["n"] == 0 and m.partitions:
            # the stale compactor's rmtree lands between the delta write
            # and the post-commit verification; its published coverage
            # (compacted_watermark = -1 here) stays below offset_max
            hits["n"] += 1
            _shutil.rmtree(os.path.join(self.root, "delta",
                                        f"epoch-{m.epoch:08d}"),
                           ignore_errors=True)

    monkeypatch.setattr(LakeTable, "commit_epoch", compactor_races_once)
    res = replay_mixed(root, ["tbl_even", "tbl_odd"], events_path=path,
                       config=cfg)
    monkeypatch.undo()
    assert hits["n"] == 1                      # the race actually fired
    assert sorted(res) == ["tbl_even", "tbl_odd"]
    for name, par in (("tbl_even", 0), ("tbl_odd", 1)):
        got = LakeTable.open(os.path.join(root, name)) \
            .state_table().to_pandas()
        want = oracle_replay(events.filter(
            pc2.equal(parity, pa.scalar(par, pa.int32()))))
        assert len(got) == len(want)
        assert sorted(got["text"]) == sorted(want["text"])


@pytest.mark.usefixtures("ray_session")
def test_replay_mixed_retry_exhaustion_raises(tmp_path, monkeypatch):
    """A compactor that NEVER stops destroying fresh commits is not a
    transient — after the bounded retries replay_mixed must still die
    loudly instead of spinning (the old single-shot refusal, deferred)."""
    import shutil as _shutil

    from ape_dts_ray.meta import EngineConfig
    from ape_dts_ray.pipelines.multitable import replay_mixed
    from ape_dts_ray.state.lake import LakeTable

    _, _, path = _mixed_fixture(tmp_path, seed=82, n_events=600)
    root = str(tmp_path / "lakes")
    cfg = EngineConfig(num_partitions=2, epoch_size=10_000)

    real_commit = LakeTable.commit_epoch

    def compactor_races_always(self, m, schema_version=None, **kw):
        real_commit(self, m, schema_version, **kw)
        if m.partitions:
            _shutil.rmtree(os.path.join(self.root, "delta",
                                        f"epoch-{m.epoch:08d}"),
                           ignore_errors=True)

    monkeypatch.setattr(LakeTable, "commit_epoch", compactor_races_always)
    with pytest.raises(RuntimeError, match="racing"):
        replay_mixed(root, ["tbl_even", "tbl_odd"], events_path=path,
                     config=cfg)


# ------------------------- concurrent-compactor stale-base race (stamp)

@pytest.mark.usefixtures("ray_session")
def test_base_stamp_blocks_stale_compactor_overwrite(tmp_path, monkeypatch):
    """TWO compactors with different snapshots race per-partition base
    writes: the one that saw fewer epochs lands its fold LAST, erasing the
    newer fold's rows after the newer run already GC'd their deltas
    (reproduced by the randomized soak, seed 1050803233 — one partition's
    base capped at 79999 under a published watermark of 97999). The fold
    stamp must make the stale write a no-op. The maintenance lock is
    bypassed here: the stamp is the backstop for exactly the windows the
    lock cannot cover (steal races, multi-node)."""
    import threading

    import pyarrow.compute as pc2
    import ray.data as rd

    from ape_dts_ray.fixtures import gen_events, oracle_replay
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state import lake as lakemod

    events = gen_events(seed=91, n_convs=10, max_turns=5, n_events=400,
                        delete_frac=0.3)
    max_off = int(pc2.max(events.column("log_offset")).as_py())
    es = max_off // 2 + 1                     # exactly 2 epochs
    lake = _mini_lake(tmp_path, "race", num_partitions=2, epoch_size=es)

    monkeypatch.setattr(lakemod.LakeTable, "_acquire_maintenance",
                        lambda self: True)
    monkeypatch.setattr(lakemod.LakeTable, "_release_maintenance",
                        lambda self: None)

    # epoch 0 only
    ep0 = events.filter(pc2.less(events.column("log_offset"),
                                 pa.scalar(es, pa.int64())))
    replay(lake, events_ds=rd.from_arrow(ep0), max_offset=es - 1,
           heartbeat=False)

    gate, reached = threading.Event(), threading.Event()
    real_fold = lakemod.LakeTable._fold_files

    def pausing_fold(self, files, **kw):
        out = real_fold(self, files, **kw)
        if threading.current_thread().name == "stale-compactor":
            reached.set()
            assert gate.wait(30)
        return out

    monkeypatch.setattr(lakemod.LakeTable, "_fold_files", pausing_fold)

    # stale compactor: snapshot + listing see ONLY epoch 0, then stall
    # between fold and write — exactly the soak's interleaving
    errs = []

    def stale_run():
        try:
            lake.compact(parallel=False)
        except Exception as e:                 # pragma: no cover
            errs.append(e)

    t = threading.Thread(target=stale_run, name="stale-compactor")
    t.start()
    assert reached.wait(30)

    # meanwhile the world moves on: epoch 1 commits and a fresh compactor
    # folds BOTH epochs and GCs their deltas
    replay(lake, events_ds=rd.from_arrow(events), max_offset=max_off,
           heartbeat=False)
    assert lake.compact(parallel=False) >= 1
    want = oracle_replay(events)

    gate.set()
    t.join(60)
    assert not t.is_alive() and not errs

    got = lake.state_table().to_pandas()
    assert len(got) == len(want)
    assert sorted(got["text"]) == sorted(want["text"])
    # and the lake still accepts further maintenance after the stale no-op
    assert lake.compact(parallel=False) == 0  # nothing left to fold


def test_maintenance_lock_busy_skips_and_dead_holder_stolen(tmp_path):
    """A live holder makes compact() a no-op tick (returns 0) and truncate()
    loud; a SIGKILLed holder's stale lock is stolen via the pid+starttime
    liveness probe."""
    import json as _json
    import subprocess
    import sys

    from ape_dts_ray.state import lake as lakemod
    from ape_dts_ray.state.manifest import EpochManifest

    lake = _mini_lake(tmp_path, "lock")
    os.makedirs(os.path.join(lake.root, "delta", "epoch-00000000"))
    lake.commit_epoch(EpochManifest(epoch=0, offset_min=0, offset_max=9,
                                    final=True, schema_version=0,
                                    partitions=[]))

    # live holder: a real sleeping process
    holder = subprocess.Popen([sys.executable, "-c",
                               "import time; time.sleep(60)"])
    try:
        with open(lake._maintenance_lock_path(), "w") as f:
            _json.dump({"pid": holder.pid,
                        "start": lakemod._proc_start(holder.pid)}, f)
        assert lake.compact(parallel=False) == 0          # busy tick: skip
        with pytest.raises(RuntimeError, match="maintenance"):
            lake.truncate()
        with pytest.raises(RuntimeError, match="maintenance"):
            lake.compact(new_hot_keys=("conv-000000",), parallel=False)
        assert lake.committed_epochs() == [0]             # nothing happened
    finally:
        holder.kill()
        holder.wait()

    # the holder is dead now (SIGKILL analog): the next compact steals the
    # lock and folds for real
    assert lake.compact(parallel=False) == 1
    assert lake.committed_epochs() == []
    assert not os.path.exists(lake._maintenance_lock_path())


def test_truncate_strict_gc_raises_with_marker_intact(tmp_path, monkeypatch):
    """truncate() removes its marker right after epoch GC, and commit_epoch
    refuses under the marker — so an ENOTEMPTY-tolerated GC would leave a
    manifest NOTHING ever re-claims, permanently resurrecting pre-truncate
    rows (code-review finding). Strict GC must raise with the marker intact;
    re-running truncate() (the documented recovery) finishes the job."""
    import errno

    from ape_dts_ray.state import lake as lakemod
    from ape_dts_ray.state.manifest import EpochManifest

    lake = _mini_lake(tmp_path, "tr")
    os.makedirs(os.path.join(lake.root, "delta", "epoch-00000000"))
    lake.commit_epoch(EpochManifest(epoch=0, offset_min=0, offset_max=9,
                                    final=True, schema_version=0,
                                    partitions=[]))

    def busy_rmtree(path, **kw):
        raise OSError(errno.ENOTEMPTY, "Directory not empty", path)

    monkeypatch.setattr(lakemod.shutil, "rmtree", busy_rmtree)
    with pytest.raises(OSError, match="refilling"):
        lake.truncate()
    assert lake.truncate_in_progress()                # marker stays
    assert lake.committed_epochs() == [0]             # manifest stays
    monkeypatch.undo()
    lake.truncate()                                   # recovery finishes
    assert not lake.truncate_in_progress()
    assert lake.committed_epochs() == []


@pytest.mark.usefixtures("ray_session")
def test_all_tombstone_fold_writes_empty_stamped_base(tmp_path):
    """A partition whose fold is ALL tombstones used to os.remove its base —
    losing the coverage stamp, so a stale sibling could resurrect the
    deleted rows. The fold now writes an EMPTY stamped base instead, and
    state reads treat it as zero rows."""
    import pyarrow.compute as pc2
    import ray.data as rd

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.state import lake as lakemod

    events = gen_events(seed=92, n_convs=4, max_turns=3, n_events=50,
                        delete_frac=0.2)
    # append a delete for EVERY key after everything else
    ins = events.slice(0, 12)                       # insert phase: all keys
    max_off = int(pc2.max(events.column("log_offset")).as_py())
    dele = ins.set_column(ins.column_names.index("op"), "op",
                          pa.array(["delete"] * ins.num_rows))
    dele = dele.set_column(
        dele.column_names.index("log_offset"), "log_offset",
        pa.array(np.arange(max_off + 1, max_off + 1 + ins.num_rows,
                           dtype=np.int64)))
    full = pa.concat_tables([events, dele])

    from ape_dts_ray.pipelines.replay import replay

    # epoch_size exactly spans the log so the single window ends at its
    # natural boundary (final) — a provisional tail is excluded from folds
    lake = _mini_lake(tmp_path, "tomb", num_partitions=2,
                      epoch_size=max_off + 1 + ins.num_rows)
    replay(lake, events_ds=rd.from_arrow(full), heartbeat=False)
    assert lake.compact(parallel=False) >= 1
    assert lake.state_table().num_rows == 0
    for pid in range(2):
        bp = lake.base_path(pid)
        assert os.path.exists(bp)                   # empty, not absent
        assert lakemod._base_stamp(bp) >= max_off + ins.num_rows
    # replaying nothing new + recompacting stays a no-op and stays empty
    assert lake.state_table().num_rows == 0


# ---------------- stale placement after an external rotation (gen check)

@pytest.mark.usefixtures("ray_session")
def test_long_lived_instance_refreshes_placement_after_rotation(tmp_path):
    """A follower daemon holds ONE LakeTable across rounds. An EXTERNAL
    rotation completing between its rounds changes where hot keys live;
    pre-fix the daemon's next replay placed them under the stale in-memory
    salt — old-salt delta + new-salt base both fold the key, DUPLICATING it
    (maintenance soak, seed 274662159: 9 duplicated conv-000000 keys).
    replay() now refreshes the persisted placement at plan time."""
    import pyarrow.compute as pc2
    import ray.data as rd

    from ape_dts_ray.fixtures import gen_events, oracle_replay
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable

    events = gen_events(seed=93, n_convs=8, max_turns=6, n_events=1500,
                        hot_frac=0.5, delete_frac=0.1)
    max_off = int(pc2.max(events.column("log_offset")).as_py())
    cut = max_off // 2
    lake = _mini_lake(tmp_path, "rotstale", num_partitions=4,
                      epoch_size=cut + 1)

    first = events.filter(pc2.less_equal(events.column("log_offset"),
                                         pa.scalar(cut, pa.int64())))
    replay(lake, events_ds=rd.from_arrow(first), max_offset=cut,
           heartbeat=False)

    # external rotation through a SEPARATE instance (operator CLI analog)
    other = LakeTable.open(lake.root)
    assert other.compact(new_hot_keys=("conv-000000",), parallel=False) >= 0
    assert other.placement_gen == 1

    # the ORIGINAL instance replays the second half — must pick up the salt
    replay(lake, events_ds=rd.from_arrow(events), max_offset=max_off,
           heartbeat=False)
    got = lake.state_table().to_pandas()
    assert not got.duplicated(["conv_id", "turn_idx"]).any()
    want = oracle_replay(events)
    assert len(got) == len(want)
    assert sorted(got["text"]) == sorted(want["text"])


def test_commit_refuses_on_moved_placement_gen(tmp_path):
    """commit_epoch(expect_placement_gen=...) is the backstop for a rotation
    that starts AND finishes inside one chunk's apply window (no marker
    left at commit time): the moved generation refuses the stale-salt
    commit the same way the markers refuse an in-flight one."""
    from ape_dts_ray.state.manifest import EpochManifest

    lake = _mini_lake(tmp_path, "genref")
    g = lake.refresh_placement()
    m = EpochManifest(epoch=0, offset_min=0, offset_max=9, schema_version=0,
                      partitions=[])
    lake.commit_epoch(m, expect_placement_gen=g)      # clean path commits
    lake.placement_gen += 1                           # rotation's bump
    lake._save_table_json()
    with pytest.raises(RuntimeError, match="placement gen"):
        lake.commit_epoch(m, expect_placement_gen=g)
    lake.commit_epoch(m, expect_placement_gen=lake.refresh_placement())


@pytest.mark.usefixtures("ray_session")
def test_online_compact_tick_skips_external_maintenance(tmp_path):
    """The ONLINE auto-compact tick after each committed chunk must SKIP
    when an external rotation/truncate owns the lake (marker up or lock
    held) instead of propagating — a rotation IS a full compaction, so it
    restores the delta bound itself, and dying here killed a daemon
    mid-round on a transient. compact()'s marker/lock refusals are typed
    MaintenanceInProgress and the tick swallows exactly that."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq2

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable, MaintenanceInProgress

    events = gen_events(seed=95, n_convs=20, max_turns=6, n_events=4000)
    ev = str(tmp_path / "ev.parquet")
    pq2.write_table(events, ev)
    lake = _mini_lake(tmp_path, "tick", num_partitions=4, epoch_size=500)
    calls = {"n": 0}
    orig = LakeTable.compact

    def busy_compact(self, **kw):
        calls["n"] += 1
        raise MaintenanceInProgress("simulated: external rotation holds "
                                    "the maintenance lock")

    LakeTable.compact = busy_compact
    try:
        ms = replay(lake, events_path=ev, auto_compact_max_deltas=1,
                    group_epochs=2)
    finally:
        LakeTable.compact = orig
    assert calls["n"] >= 1                  # the tick DID run and refuse
    assert len(ms) >= 4                     # every epoch still committed
    assert lake.watermark() == int(
        pc.max(events.column("log_offset")).as_py())
    # and the bound restores on the next unobstructed invocation
    assert replay(lake, events_path=ev, auto_compact_max_deltas=1) == []
    assert max(lake.delta_file_counts().values()) <= 2


def test_commit_epoch_drops_unlisted_files_both_orders(tmp_path):
    """commit_epoch enforces the manifest as source of truth for its epoch
    dir, with the cleanup ORDER depending on the commit kind: a FRESH epoch
    cleans before publishing (a crash mid-cleanup leaves the epoch
    uncommitted, the re-run repeats it), a RE-commit cleans after (deleting
    first could leave the still-committed old manifest pointing at removed
    files). Listed files survive both; strays — stale placements, orphan
    .tmp from crashed writers — do not."""
    import pyarrow.parquet as pq2

    from ape_dts_ray.state.manifest import EpochManifest, PartitionLineage

    lake = _mini_lake(tmp_path, "cln")
    ddir = os.path.join(lake.root, "delta", "epoch-00000000")
    os.makedirs(ddir)
    tiny = pa.table({"x": pa.array([1])})
    for fn in ("part-00000.parquet", "part-00003.parquet",
               "part-00001.parquet.tmp-dead"):
        pq2.write_table(tiny, os.path.join(ddir, fn))
    m = EpochManifest(
        epoch=0, offset_min=0, offset_max=9, schema_version=0,
        partitions=[PartitionLineage(
            part_id=0, file="delta/epoch-00000000/part-00000.parquet",
            rows=1, events=1, upserts=1, deletes=0,
            offset_min=0, offset_max=9)])
    lake.commit_epoch(m)                              # fresh: clean BEFORE
    assert sorted(os.listdir(ddir)) == ["part-00000.parquet"]

    # re-commit: a stray re-appears (e.g. the pre-cleanup status quo of a
    # snapped-shorter tail), the same manifest re-publishes, stray dropped
    pq2.write_table(tiny, os.path.join(ddir, "part-00002.parquet"))
    lake.commit_epoch(m)
    assert sorted(os.listdir(ddir)) == ["part-00000.parquet"]
    assert 0 in lake.committed_epochs()


@pytest.mark.usefixtures("ray_session")
def test_recommit_after_rotation_drops_stale_placement(tmp_path):
    """The manifest is the source of truth for its epoch dir: an
    interrupted chunk's delta files written under the OLD salt survive a
    rotation (the rotation GCs only its committed-epoch snapshot), and the
    re-placed re-run only overwrites partitions it emits rows into — a
    partition left EMPTY under the new salt kept the old-salt file and
    partition_files() (existence-based) folded its rows forever,
    duplicating them. Reachable by plain SIGKILL-after-apply → rotate →
    resume. commit_epoch now removes unlisted files (before publishing for
    a fresh epoch; after, for a re-commit, so a crash can never leave the
    committed manifest pointing at removed files)."""
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.partition import partition_ids
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable, MaintenanceInProgress

    P = 8
    conv = "conv-000000"
    # a turn whose SALTED placement differs from the unsalted one — the
    # premise that makes the old-salt orphan un-overwritten
    turn = next(t for t in range(64)
                if partition_ids(np.array([conv]),
                                 np.array([t], np.int64), P, None)[0]
                != partition_ids(np.array([conv]), np.array([t], np.int64),
                                 P, frozenset([conv]))[0])
    n = 200
    t = pa.table({
        "log_offset": pa.array(np.arange(n, dtype=np.int64)),
        "seq": pa.array(np.zeros(n, dtype=np.int64)),
        "op": pa.array(["upsert"] * n),
        "conv_id": pa.array([conv] * n),
        "turn_idx": pa.array(np.full(n, turn, dtype=np.int32)),
        "role": pa.array(["user"] * n),
        "text": pa.array([f"text-{i}" for i in range(n)]),
        "tool": pa.array([""] * n),
        "ts": pa.array(np.arange(n, dtype=np.int64).astype("datetime64[us]")),
    })
    ev = str(tmp_path / "ev.parquet")
    pa.parquet.write_table(t, ev)
    lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(num_partitions=P, epoch_size=100))
    replay(lake, events_path=ev, max_offset=99)       # epoch 0 committed

    # epoch 1: delta files land, commit refused — the rotation race (same
    # state as a SIGKILL between apply and commit)
    orig = LakeTable.commit_epoch
    LakeTable.commit_epoch = lambda self, m, **kw: (_ for _ in ()).throw(
        MaintenanceInProgress("simulated: rotation raced this chunk"))
    try:
        with pytest.raises(MaintenanceInProgress):
            replay(lake, events_path=ev)
    finally:
        LakeTable.commit_epoch = orig
    d1 = os.path.join(lake.root, "delta", "epoch-00000001")
    orphans = sorted(os.listdir(d1))
    assert orphans                                    # old-salt placement

    lake2 = LakeTable.open(lake.root)
    lake2.compact(new_hot_keys=(conv,), parallel=False)
    assert sorted(os.listdir(d1)) == orphans          # rotation can't see it

    lake3 = LakeTable.open(lake.root)
    replay(lake3, events_path=ev)                     # documented recovery
    assert orphans[0] not in os.listdir(d1)           # stale file dropped
    st = lake3.state_table().to_pandas()
    assert not st.duplicated(["conv_id", "turn_idx"]).any()
    assert len(st) == 1 and st["text"].iloc[0] == f"text-{n - 1}"


@pytest.mark.usefixtures("ray_session")
def test_replay_mixed_adopts_per_table_salt_after_rotation(tmp_path):
    """Placement is a pure function of (num_partitions, hot_keys) and each
    lake rotates INDEPENDENTLY — after rotating one lake of a mixed set, no
    single caller-supplied hot-key set can match every lake, so the shard
    stage must adopt each lake's PERSISTED salt per table (config.hot_keys
    only seeds new lakes — the mixed analog of replay()'s
    refresh_placement). Pre-change, the one global salt double-placed the
    rotated lake's hot keys: old-salt delta + new-salt base both fold."""
    import pyarrow.compute as pc2

    from ape_dts_ray.fixtures import oracle_replay
    from ape_dts_ray.meta import EngineConfig
    from ape_dts_ray.pipelines.multitable import replay_mixed
    from ape_dts_ray.state.lake import LakeTable

    events, parity, path = _mixed_fixture(tmp_path, seed=94, n_events=2000)
    max_off = int(pc2.max(events.column("log_offset")).as_py())
    cut = max_off // 2
    root = str(tmp_path / "lakes")
    cfg = EngineConfig(num_partitions=4, epoch_size=cut + 1)
    replay_mixed(root, ["tbl_even", "tbl_odd"], events_path=path, config=cfg,
                 max_offset=cut)

    # external rotation of ONE lake (conv-000000 is first-seen → tbl_even)
    even = LakeTable.open(os.path.join(root, "tbl_even"))
    assert even.compact(new_hot_keys=("conv-000000",), parallel=False) >= 0
    assert even.placement_gen == 1

    # same caller config (hot_keys=()) — must adopt tbl_even's new salt
    replay_mixed(root, ["tbl_even", "tbl_odd"], events_path=path, config=cfg)
    for name, par in (("tbl_even", 0), ("tbl_odd", 1)):
        got = LakeTable.open(os.path.join(root, name)) \
            .state_table().to_pandas()
        assert not got.duplicated(["conv_id", "turn_idx"]).any()
        want = oracle_replay(events.filter(
            pc2.equal(parity, pa.scalar(par, pa.int32()))))
        assert len(got) == len(want)
        assert sorted(got["text"]) == sorted(want["text"])


def test_rdb_shard_size_bound_refuses(tmp_path, ray_session, monkeypatch):
    """Both directory readers bound their per-task working set: a FOREIGN
    monolithic dump (one shard ≫ MAX_RDB_SHARD_BYTES) must refuse with
    split guidance instead of ballooning a worker's heap (the writer's own
    shards are bounded by construction, so only foreign dumps hit this)."""
    import ape_dts_ray.pipelines.redis_replay as rr

    entries = [{"db": 0, "key": b"k1", "type": "string", "expire_ms": 0,
                "value": b"v" * 64}]
    d = tmp_path / "snap"
    d.mkdir()
    (d / "rdb_part_00000.rdb").write_bytes(rdbmod.encode_rdb(entries))
    monkeypatch.setattr(rr, "MAX_RDB_SHARD_BYTES", 16)
    for reader in (rr.read_rdb_snapshot, rr.rdb_key_statistics):
        # Ray wraps the task's ValueError in RayTaskError(UserCodeException)
        with pytest.raises(Exception, match="split the dump"):
            pa.concat_tables(reader(str(d)).iter_batches(
                batch_format="pyarrow", batch_size=None))


# ---------------------------------------------------------------------------
# Provisional-tail fold exclusion (mixed-soak divergence, seed 164990304):
# an epoch whose window was cut by the then-current LOG END may be
# re-committed with more events when the log grows. Folding it into base
# flattens its rank to _epoch = -1 and drops its tombstones, so the later
# re-commit outranks base rows folded from HIGHER epochs — resurrecting
# deleted keys and rewinding LWW winners. Plain folds must consume only the
# prefix of FINAL epochs; commit_epoch backstops the residual races.
# ---------------------------------------------------------------------------

def _tail_lake(tmp_path, name="tl", epoch_size=100):
    from ape_dts_ray.meta import EngineConfig
    from ape_dts_ray.state.lake import LakeTable
    return LakeTable.create(str(tmp_path / name),
                            config=EngineConfig(num_partitions=4,
                                                epoch_size=epoch_size))


@pytest.mark.usefixtures("ray_session")
def test_compact_excludes_provisional_tail(tmp_path):
    import pyarrow.parquet as pq
    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable

    full = gen_events(seed=41, n_convs=8, max_turns=4, n_events=568,
                      delete_frac=0.3)                # 600 events, ES=100
    events = full.slice(0, 350)           # the log as first observed
    p = str(tmp_path / "e.parquet")
    pq.write_table(events, p)
    lake = _tail_lake(tmp_path)
    replay(lake, events_path=p)
    # windows: 0-2 final, 3 = [300, 349] cut by the log end → provisional
    ms = {e: lake.read_manifest(e) for e in lake.committed_epochs()}
    assert [ms[e].final for e in sorted(ms)] == [True, True, True, False]

    lake.compact(parallel=False)
    # the provisional tail survives as delta (manifest AND files), the
    # complete prefix folds, and the compacted watermark stops BELOW the
    # tail window — so a tail re-commit is never "under" base coverage
    assert lake.committed_epochs() == [3]
    assert ms[3].offset_min == 300
    assert lake.compacted_watermark() == 299
    assert any(os.path.exists(lake.delta_path(3, pid)) for pid in range(4))
    assert lake.watermark() == 349

    # grow the log past the tail window and replay: the tail re-commit
    # extends epoch 3 to its natural end, later epochs commit above it
    pq.write_table(full, p)
    replay(LakeTable.open(lake.root), events_path=p)
    lake = LakeTable.open(lake.root)
    assert lake.read_manifest(3).final          # now ends at 399 naturally
    lake.compact(parallel=False)

    # state equals a clean one-shot replay of the full log
    clean = _tail_lake(tmp_path, "clean")
    replay(clean, events_path=p)
    got = lake.state_table().to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    want = clean.state_table().to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_commit_refuses_below_folded_coverage(tmp_path):
    """The rank-invariant backstop: committing an epoch whose whole window
    is already folded into base must refuse (transient, deferrable) — a
    delta under the folded coverage would outrank base rows."""
    import pyarrow.parquet as pq
    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import MaintenanceInProgress
    from ape_dts_ray.state.manifest import EpochManifest

    events = gen_events(seed=43, n_convs=6, max_turns=4, n_events=176)
    p = str(tmp_path / "e.parquet")
    pq.write_table(events, p)
    lake = _tail_lake(tmp_path)
    replay(lake, events_path=p)
    lake.compact(parallel=False)
    cw = lake.compacted_watermark()
    assert cw >= 99                      # at least epoch 0 folded
    stale = EpochManifest(epoch=0, offset_min=0, offset_max=99,
                          schema_version=0, final=True)
    with pytest.raises(MaintenanceInProgress):
        lake.commit_epoch(stale)


def test_manifest_final_field_roundtrip_and_legacy():
    from ape_dts_ray.state.manifest import EpochManifest

    m = EpochManifest(epoch=7, offset_min=700, offset_max=755,
                      schema_version=0, final=False)
    m2 = EpochManifest.from_json(m.to_json())
    assert m2.final is False and m2.offset_max == 755
    # legacy manifest without the field: conservatively extendable
    import json as _json
    d = _json.loads(m.to_json())
    d.pop("final")
    legacy = EpochManifest.from_json(_json.dumps(d))
    assert legacy.final is False


def test_plan_epochs_final_flags():
    from ape_dts_ray.pipelines.replay import plan_epochs

    # log ends mid-window → provisional tail
    ws = plan_epochs(max_offset=349, epoch_size=100)
    assert [w.final for w in ws] == [True, True, True, False]
    # log ends exactly on a window boundary → ALL final
    ws = plan_epochs(max_offset=399, epoch_size=100)
    assert [w.final for w in ws] == [True] * 4
    # barrier cut below the log end is a natural boundary; the log-end cut
    # stays provisional (350+99=449 nat ≠ 429)
    ws = plan_epochs(max_offset=429, epoch_size=100,
                     barriers=[(150, 1)])
    by_hi = {w.hi: w.final for w in ws}
    assert by_hi[149] is True            # barrier-cut window is final
    assert by_hi[429] is False           # log-end cut stays provisional
    # a window that happens to end at BOTH a size boundary and the log end
    # replans identically on a longer log → final
    ws = plan_epochs(max_offset=349, epoch_size=100,
                     commit_offsets=[49, 149, 249, 349])
    assert ws[-1].hi == 349 and ws[-1].final is True
    # a log ending mid-window stays provisional even under commit alignment
    ws = plan_epochs(max_offset=339, epoch_size=100,
                     commit_offsets=[49, 149, 249, 339])
    assert ws[-1].hi == 339 and ws[-1].final is False
    assert all(w.final for w in ws[:-1])


@pytest.mark.usefixtures("ray_session")
def test_pending_floor_final_vs_provisional_tail(tmp_path):
    import pyarrow.parquet as pq
    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.pipelines.follow import _pending_floor
    from ape_dts_ray.pipelines.replay import replay

    full = gen_events(seed=44, n_convs=6, max_turns=4, n_events=376)
    p = str(tmp_path / "e.parquet")
    pq.write_table(full.slice(0, 330), p)
    lake = _tail_lake(tmp_path)
    replay(lake, events_path=p)          # tail [300, 329] provisional
    # provisional tail: everything from its window start is re-runnable
    assert _pending_floor(lake) == 300
    # a final tail pends nothing below its end
    pq.write_table(full, p)              # grows to 400 = a window boundary
    from ape_dts_ray.state.lake import LakeTable
    replay(LakeTable.open(lake.root), events_path=p)   # tail now [300,399] final
    lake = LakeTable.open(lake.root)
    assert lake.read_manifest(max(lake.committed_epochs())).final
    assert _pending_floor(lake) == 400


@pytest.mark.usefixtures("ray_session")
def test_refinalize_unwedges_boundary_landed_tail(tmp_path):
    """Review finding on the provisional-tail fix: a window that becomes
    FINAL without changing its end (here: a schema barrier lands exactly at
    old-log-end+1 on the longer replan) is never re-committed — offset_max
    == w.hi, so the growing-log recommit never fires — and without
    re-finalization the fold prefix wedges behind it forever."""
    import pyarrow.parquet as pq
    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable

    full = gen_events(seed=46, n_convs=6, max_turns=4, n_events=576)  # 600
    p = str(tmp_path / "e.parquet")
    pq.write_table(full.slice(0, 350), p)
    lake = _tail_lake(tmp_path)
    barriers = [(350, 1)]                 # exactly at the first log's end+1
    replay(lake, events_path=p, barriers=barriers)
    assert not lake.read_manifest(3).final          # [300,349] cut by eof
    lake.compact(parallel=False)
    assert lake.committed_epochs() == [3]           # wedge candidate
    assert lake.compacted_watermark() == 299

    pq.write_table(full, p)               # log grows; replan: [300,349] is
    replay(LakeTable.open(lake.root), events_path=p,   # now BARRIER-final
           barriers=barriers)             # with an identical span
    lake = LakeTable.open(lake.root)
    assert lake.read_manifest(3).final              # re-finalized in place
    lake.compact(parallel=False)
    # the prefix passes epoch 3: everything final folds, only the new
    # provisional tail [550,599] remains — no permanent wedge
    left = lake.committed_epochs()
    assert left == [6] and not lake.read_manifest(6).final
    assert lake.compacted_watermark() == 549

    clean = _tail_lake(tmp_path, "clean46")
    replay(clean, events_path=p, barriers=barriers)
    got = lake.state_table().to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    want = clean.state_table().to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_refinalize_heals_legacy_manifest(tmp_path):
    """A pre-`final`-field manifest (key absent → conservatively
    extendable) must not wedge compaction forever: the next replan with
    identical boundaries re-finalizes it in place."""
    import json as _json

    import pyarrow.parquet as pq
    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable

    events = gen_events(seed=47, n_convs=6, max_turns=4, n_events=376)  # 400
    p = str(tmp_path / "e.parquet")
    pq.write_table(events, p)
    lake = _tail_lake(tmp_path)
    replay(lake, events_path=p)
    # simulate a legacy lake: strip the field from epoch 0's manifest
    mp = lake.manifest_path(0)
    d = _json.load(open(mp))
    d.pop("final")
    with open(mp, "w") as f:
        _json.dump(d, f)
    assert not lake.read_manifest(0).final          # legacy default
    lake.compact(parallel=False)
    assert 0 in lake.committed_epochs()             # prefix wedged at 0

    replay(LakeTable.open(lake.root), events_path=p)   # replan heals it
    lake = LakeTable.open(lake.root)
    assert lake.read_manifest(0).final
    lake.compact(parallel=False)
    assert lake.committed_epochs() == []            # 400 = boundary: all fold
