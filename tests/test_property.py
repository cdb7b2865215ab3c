"""Property-based tests: the vectorized LWW kernels against a brute-force
reference on arbitrary event sequences (hypothesis). No Ray needed."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ape_dts_ray.fixtures import oracle_replay
from ape_dts_ray.stages.merge import drop_tombstones, fold_state, lww_last

OPS = ["insert", "update", "delete"]


@st.composite
def event_tables(draw, max_events=60, n_keys=6):
    n = draw(st.integers(1, max_events))
    convs = draw(st.lists(st.integers(0, 2), min_size=n, max_size=n))
    turns = draw(st.lists(st.integers(0, n_keys - 1), min_size=n, max_size=n))
    ops = draw(st.lists(st.sampled_from(OPS), min_size=n, max_size=n))
    texts = draw(st.lists(st.one_of(st.none(), st.text(max_size=8)),
                          min_size=n, max_size=n))
    offsets = draw(st.permutations(range(n)))
    return pa.table({
        "log_offset": pa.array(list(offsets), pa.int64()),
        "seq": pa.array([0] * n, pa.int32()),
        "op": pa.array(ops, pa.string()),
        "conv_id": pa.array([f"c{c}" for c in convs], pa.string()),
        "turn_idx": pa.array(turns, pa.int32()),
        "text": pa.array([t if o != "delete" else None
                          for t, o in zip(texts, ops)], pa.string()),
    })


def brute_force_live(t: pa.Table) -> dict:
    """Reference: replay events one by one in offset order."""
    rows = sorted(t.to_pylist(), key=lambda r: (r["log_offset"], r["seq"]))
    state = {}
    for r in rows:
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            state.pop(k, None)
        else:
            state[k] = r["text"]
    return state


@given(event_tables())
@settings(max_examples=200, deadline=None)
def test_lww_last_matches_brute_force(t):
    live = drop_tombstones(lww_last(t))
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in live.to_pylist()}
    assert got == brute_force_live(t)


@given(event_tables(), st.integers(1, 5))
@settings(max_examples=100, deadline=None)
def test_fold_state_equals_single_fold(t, n_splits):
    """Splitting the log into epoch deltas and folding must equal folding the
    whole log at once — the associativity the merge-on-read design relies on."""
    n = t.num_rows
    bounds = np.linspace(0, n, n_splits + 1).astype(int)
    import pyarrow.compute as pc
    pieces = []
    for i in range(n_splits):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        mask = pc.and_(pc.greater_equal(t.column("log_offset"), pa.scalar(lo, pa.int64())),
                       pc.less(t.column("log_offset"), pa.scalar(hi, pa.int64())))
        piece = t.filter(mask)
        if piece.num_rows == 0:
            continue
        piece = lww_last(piece)   # each delta is per-key-unique, like apply writes
        pieces.append(piece.append_column(
            "_epoch", pa.array(np.full(piece.num_rows, i, dtype=np.int64))))
    folded = fold_state(pieces)
    got = {} if folded is None else {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in folded.to_pylist()}
    assert got == brute_force_live(t)


@given(event_tables())
@settings(max_examples=50, deadline=None)
def test_oracle_replay_agrees_with_brute_force(t):
    """The pandas oracle used by the e2e tests is itself validated here."""
    df = oracle_replay(t)
    got = dict(zip(zip(df["conv_id"], df["turn_idx"]), df["text"]))
    expect = brute_force_live(t)
    assert {k: (v if pd.notna(v) else None) for k, v in got.items()} == expect


# --- Avro single-object codec: roundtrip identity on arbitrary payloads ---

@st.composite
def avro_rows(draw):
    return {
        # negative magnitudes exercise the zigzag sign propagation and
        # 9-10-byte varints — the trickiest vector branches of the
        # columnar codec
        "log_offset": draw(st.integers(-2**62, 2**62)),
        "seq": draw(st.integers(-3, 3)),
        "op": draw(st.sampled_from(OPS)),
        "conv_id": draw(st.text(min_size=1, max_size=20)),
        "turn_idx": draw(st.integers(-10_000, 10_000)),
        "role": draw(st.one_of(st.none(), st.text(max_size=12))),
        "text": draw(st.one_of(st.none(), st.text(max_size=64))),
        "tool": draw(st.one_of(st.none(), st.text(max_size=8))),
        "ts": draw(st.one_of(st.none(), st.integers(-2**52, 2**52))),
    }


@given(avro_rows())
@settings(max_examples=300, deadline=None)
def test_avro_event_roundtrip_identity(row):
    from ape_dts_ray.stages.avro import decode_event, encode_event

    assert decode_event(encode_event(row)) == row


# --- schema ops: composition and idempotence ---

@given(st.lists(st.one_of(st.none(), st.text(max_size=6)),
                min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_schema_ops_rename_chain_and_widen(vals):
    from ape_dts_ray.stages.merge import apply_schema_ops

    t = pa.table({"x": pa.array(vals, pa.string()),
                  "n": pa.array(list(range(len(vals))), pa.int32())})
    ops = [{"op": "rename", "from": "x", "to": "y"},
           {"op": "rename", "from": "y", "to": "z"},
           {"op": "widen", "col": "n", "type": "int64"}]
    out = apply_schema_ops(t, ops)
    assert out.column_names == ["z", "n"]
    assert out.column("z").to_pylist() == vals
    assert out.schema.field("n").type == pa.int64()
    # idempotent on an already-evolved table
    again = apply_schema_ops(out, ops)
    assert again.equals(out)
    # mixed-era coalesce: old column only fills rows where new is null
    mixed = pa.table({
        "x": pa.array(vals, pa.string()),
        "z": pa.array([None] * len(vals), pa.string()),
        "n": pa.array(list(range(len(vals))), pa.int64())})
    m = apply_schema_ops(mixed, ops[1:2] + ops[:1])  # order-insensitive here
    assert "x" not in m.column_names


# ---------- DDL CREATE TABLE round-trip (stages/ddl.py) ----------

_SQL_TYPES = [("INT", "int32"), ("BIGINT", "int64"), ("SMALLINT", "int16"),
              ("VARCHAR(64)", "string"), ("TEXT", "string"),
              ("DOUBLE PRECISION", "float64"), ("BLOB", "binary"),
              ("DECIMAL(18,4)", "decimal128(18,4)"),
              ("TIMESTAMP", "timestamp[us]"), ("JSON", "string")]

_ident_st = st.text(alphabet="abcdefghij_", min_size=1, max_size=8).filter(
    lambda s: s[0] != "_")


@st.composite
def create_tables(draw):
    names = draw(st.lists(_ident_st, min_size=1, max_size=6, unique=True))
    cols = [(n, draw(st.sampled_from(_SQL_TYPES))) for n in names]
    pk = draw(st.lists(st.sampled_from(names), min_size=1, max_size=2,
                       unique=True))
    quote = draw(st.sampled_from(["", "`", '"']))
    not_null = draw(st.lists(st.sampled_from(names), max_size=3, unique=True))
    defaults = {n: draw(st.sampled_from(
        ["'x)'", "'a,b'", "'it''s'", "42", "NULL"]))
        for n in draw(st.lists(st.sampled_from(names), max_size=2,
                               unique=True))}

    def q(n):
        return f"{quote}{n}{quote}" if quote else n

    defs = []
    for n, (sql_t, _) in cols:
        d = f"{q(n)} {sql_t}"
        if n in defaults:
            d += f" DEFAULT {defaults[n]}"
        if n in not_null:
            d += " NOT NULL"
        defs.append(d)
    defs.append(f"PRIMARY KEY ({', '.join(q(c) for c in pk)})")
    opts = draw(st.sampled_from(
        ["", " ENGINE=InnoDB", " ENGINE=InnoDB DEFAULT CHARSET=utf8mb4",
         " AUTO_INCREMENT=99 COMMENT='tbl, (notes)'"]))
    sql = f"CREATE TABLE {q('tb')} ({', '.join(defs)}){opts}"
    return sql, cols, pk, set(not_null) | set(pk)


@given(create_tables())
@settings(max_examples=150, deadline=None)
def test_create_table_roundtrip(case):
    """Random column sets, quoting styles, tricky quoted defaults (')',
    ',', doubled quotes) and option tails parse back to exactly the
    declared columns, arrow types, PK and NOT-NULL set."""
    from ape_dts_ray.stages.ddl import parse_ddl

    sql, cols, pk, not_null = case
    p = parse_ddl(sql)
    assert p.kind == "create_table" and p.table == "tb"
    assert p.extra["columns"] == [(n, at) for n, (_, at) in cols]
    assert p.extra["id_cols"] == pk
    assert set(p.extra["not_null"]) | set(pk) == not_null
    if "AUTO_INCREMENT=99" in sql:
        assert p.extra["auto_increment_start"] == 99


@given(st.lists(avro_rows(), min_size=0, max_size=30))
@settings(max_examples=150, deadline=None)
def test_avro_columnar_matches_scalar(rows):
    """The columnar batch codec is BYTE-identical to the per-record
    reference (encode) and value-identical back (decode) on arbitrary
    payloads — the lockstep that lets encode_event/decode_event stay the
    readable spec while avro_encode/avro_decode carry the throughput."""
    import pyarrow as pa

    from ape_dts_ray.stages.avro import avro_decode, avro_encode, encode_event

    schema = pa.schema([
        ("log_offset", pa.int64()), ("seq", pa.int32()),
        ("op", pa.string()), ("conv_id", pa.string()),
        ("turn_idx", pa.int32()), ("role", pa.string()),
        ("text", pa.string()), ("tool", pa.string()),
        ("ts", pa.timestamp("us"))])
    t = pa.Table.from_pylist(rows, schema=schema)
    enc = avro_encode(t)
    assert enc.column("value").to_pylist() == [encode_event(r) for r in rows]
    assert enc.column("key").to_pylist() == \
        ["\x1f".join(str(r[c]) for c in ("conv_id", "turn_idx"))
         for r in rows]
    dec = avro_decode(enc)
    assert dec.to_pylist() == [
        {**r, "ts": None if r["ts"] is None else
         pa.scalar(r["ts"], pa.timestamp("us")).as_py()} for r in rows]
