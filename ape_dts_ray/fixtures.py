"""Deterministic synthetic fixtures: transcripts snapshot + CDC event streams,
and a pure-pandas oracle replay.

Mirrors the reference's test corpus structure (dt-tests: prepare → drive
events → compare final state under stable order, dt-tests/README.md:16-31;
comparison rdb_test_runner.rs:599-726). Scenario families (FIXTURES.md §3):
basic, upsert-dedup, delete-reinsert, pk-change, hot-conv skew,
schema-evolution, resume/exactly-once, filter/route, check/revise.

Everything is a pure function of the seed — generators are also used by
bench.py to synthesize events per-epoch on the fly inside Ray tasks (never
materializing the full 10^8+ stream on the driver).

Upsert semantics note: an update to a key that was never inserted acts as an
upsert — identical to the reference's lake/merge-on-read targets (StarRocks
sign+version columns, ClickHouse ReplacingMergeTree, Foxlake MERGE), which is
the model this engine implements. The oracle applies the same rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ape_dts_ray.meta import OP_DELETE, OP_INSERT, OP_UPDATE

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["", "search", "code", "browser"])
EPOCH0 = np.datetime64("2025-01-01T00:00:00", "us")


def _conv_ids(idx: np.ndarray) -> np.ndarray:
    return np.char.add("conv-", np.char.zfill(idx.astype(str), 6)).astype(object)


def _texts(conv: np.ndarray, turn: np.ndarray, off: np.ndarray, rng) -> np.ndarray:
    filler = rng.integers(0, 1_000_000, size=len(off))
    return np.char.add(
        np.char.add(np.char.add(conv.astype(str), " t"), turn.astype(str)),
        np.char.add(np.char.add(" o", off.astype(str)),
                    np.char.add(" x", filler.astype(str)))).astype(object)


def gen_events(
    seed: int = 42,
    n_convs: int = 100,
    max_turns: int = 20,
    n_events: int = 10_000,
    hot_frac: float = 0.0,          # fraction of change events hitting conv 0
    delete_frac: float = 0.15,
    pk_change_frac: float = 0.0,    # fraction of updates that renumber turn_idx
    offset_start: int = 0,
    with_lang_after: int | None = None,  # offsets ≥ this carry a 'lang' column value
) -> pa.Table:
    """Insert phase (every (conv, turn) key once) followed by a change phase of
    updates/deletes; offsets strictly increasing from ``offset_start``."""
    rng = np.random.default_rng(seed)

    # insert phase: all keys, interleaved across conversations
    convs = np.repeat(np.arange(n_convs), max_turns)
    turns = np.tile(np.arange(max_turns, dtype=np.int32), n_convs)
    order = rng.permutation(len(convs))
    convs, turns = convs[order], turns[order]
    n_ins = len(convs)
    ins_op = np.full(n_ins, OP_INSERT, dtype=object)

    # change phase
    n_ch = n_events
    hot = rng.random(n_ch) < hot_frac
    ch_conv = rng.integers(0, n_convs, size=n_ch)
    ch_conv[hot] = 0
    ch_turn = rng.integers(0, max_turns, size=n_ch).astype(np.int32)
    is_del = rng.random(n_ch) < delete_frac
    ch_op = np.where(is_del, OP_DELETE, OP_UPDATE).astype(object)

    conv_i = np.concatenate([convs, ch_conv])
    turn = np.concatenate([turns, ch_turn]).astype(np.int32)
    op = np.concatenate([ins_op, ch_op])
    n = len(op)
    off = np.arange(offset_start, offset_start + n, dtype=np.int64)
    conv = _conv_ids(conv_i)

    role = ROLES[(conv_i + turn) % len(ROLES)].astype(object)
    tool = TOOLS[(conv_i * 7 + turn) % len(TOOLS)].astype(object)
    text = _texts(conv, turn, off, rng)
    ts = EPOCH0 + (off * 1_000_000).astype("timedelta64[us]")

    deletes = np.concatenate([np.zeros(n_ins, dtype=bool), is_del])
    role[deletes] = None
    tool[deletes] = None
    text[deletes] = None
    ts_arr = pa.array(ts, type=pa.timestamp("us"))
    ts_arr = pa.compute.if_else(pa.array(~deletes), ts_arr, pa.nulls(n, pa.timestamp("us")))

    cols = {
        "log_offset": pa.array(off),
        "op": pa.array(op, type=pa.string()),
        "conv_id": pa.array(conv, type=pa.string()),
        "turn_idx": pa.array(turn, type=pa.int32()),
        "role": pa.array(role, type=pa.string()),
        "text": pa.array(text, type=pa.string()),
        "tool": pa.array(tool, type=pa.string()),
        "ts": ts_arr,
    }

    if pk_change_frac > 0:
        upd = (op == OP_UPDATE)
        pkc = rng.random(n) < pk_change_frac
        pkc &= upd
        new_turn = np.where(pkc, turn + max_turns, -1).astype(np.int32)
        cols["new_turn_idx"] = pa.compute.if_else(
            pa.array(pkc), pa.array(new_turn), pa.nulls(n, pa.int32()))

    if with_lang_after is not None:
        langs = np.array(["en", "es", "zh", "de"])[(conv_i + off) % 4].astype(object)
        has = (off >= with_lang_after) & ~deletes
        langs[~has] = None
        cols["lang"] = pa.array(langs, type=pa.string())

    return pa.table(cols)


def oracle_replay(events: pa.Table, key_cols=("conv_id", "turn_idx"),
                  order_cols=("log_offset",)) -> pd.DataFrame:
    """Independent pandas reimplementation of normalize + LWW + tombstone drop,
    used as the test oracle (the duckdb window query in __ray_entry__ is the
    second, SQL oracle). Returns final live state sorted by key."""
    df = events.to_pandas()
    if "seq" not in df.columns:
        df["seq"] = 0
    if "new_turn_idx" in df.columns:
        pkc = df["new_turn_idx"].notna() & (df["op"] != OP_DELETE)
        normal = df[~pkc].drop(columns=["new_turn_idx"])
        ch = df[pkc]
        dels = ch.drop(columns=["new_turn_idx"]).copy()
        dels["op"] = OP_DELETE
        dels["seq"] = 0
        for c in dels.columns:
            if c not in ("log_offset", "seq", "op", *key_cols):
                dels[c] = None
        ins = ch.copy()
        ins["turn_idx"] = ins["new_turn_idx"].astype(df["turn_idx"].dtype)
        ins = ins.drop(columns=["new_turn_idx"])
        ins["op"] = OP_INSERT
        ins["seq"] = 1
        df = pd.concat([normal, dels, ins], ignore_index=True)
    df = df.sort_values([*order_cols, "seq"], kind="stable")
    last = df.drop_duplicates(list(key_cols), keep="last")
    live = last[last["op"] != OP_DELETE].drop(columns=["op", "seq", "log_offset"])
    return live.sort_values(list(key_cols), kind="stable").reset_index(drop=True)
