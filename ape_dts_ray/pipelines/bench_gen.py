"""On-the-fly distributed CDC-stream generation for benchmarking.

The bench replays 10^6–10^8+ events locally as a stand-in for the 10^10-event
target; the stream is NEVER materialized on the driver — each Ray task
synthesizes one block of events as a pure function of ``(seed, block_id)``
(deterministic, so a resumed bench regenerates identical data; this is also
why scripts must not use wall-clock/randomness in the plan).

Stream shape mirrors the reference benchmark's CDC load (sysbench
oltp_update_index: an update-dominated stream over a fixed key space,
docs/en/benchmark.md:41-44) plus deletes and hot-conversation skew.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ape_dts_ray.fixtures import ROLES, TOOLS

TS0 = np.datetime64("2025-01-01T00:00:00", "us")


def gen_block(
    seed: int,
    block_id: int,
    block_size: int,
    n_convs: int,
    max_turns: int,
    delete_frac: float = 0.1,
    hot_frac: float = 0.0,
    text_len: int = 80,
) -> pa.Table:
    """One block of change events, offsets [block_id*block_size, ...)."""
    import pyarrow.compute as pc

    rng = np.random.default_rng(np.random.SeedSequence([seed, block_id]))
    n = block_size
    off = np.arange(block_id * block_size, block_id * block_size + n, dtype=np.int64)

    conv_i = rng.integers(0, n_convs, size=n)
    if hot_frac > 0:
        conv_i[rng.random(n) < hot_frac] = 0
    turn = rng.integers(0, max_turns, size=n).astype(np.int32)
    is_del = pa.array(rng.random(n) < delete_frac)

    # all string assembly via Arrow kernels — ~8x faster than np.char chains
    op = pc.if_else(is_del, pa.scalar("delete"), pa.scalar("update"))
    conv = pc.binary_join_element_wise(
        pa.scalar("conv-"),
        pc.ascii_lpad(pc.cast(pa.array(conv_i), pa.string()), 7, "0"), "")
    role = pa.DictionaryArray.from_arrays(
        pa.array(((conv_i + turn) % len(ROLES)).astype(np.int32)),
        pa.array(ROLES)).dictionary_decode()
    tool = pa.DictionaryArray.from_arrays(
        pa.array(((conv_i * 7 + turn) % len(TOOLS)).astype(np.int32)),
        pa.array(TOOLS)).dictionary_decode()
    pad = "x" * max(1, text_len - 24)
    text = pc.binary_join_element_wise(
        conv, pc.cast(pa.array(turn), pa.string()),
        pc.cast(pa.array(off), pa.string()), pa.scalar(pad), " ")
    ts = TS0 + (off * 1000).astype("timedelta64[us]")

    def nulled(arr, typ):
        return pc.if_else(is_del, pa.nulls(n, typ), arr)

    return pa.table({
        "log_offset": pa.array(off),
        "op": op,
        "conv_id": conv,
        "turn_idx": pa.array(turn),
        "role": nulled(role, pa.string()),
        "text": nulled(text, pa.string()),
        "tool": nulled(tool, pa.string()),
        "ts": nulled(pa.array(ts, type=pa.timestamp("us")), pa.timestamp("us")),
    })


def stream_factory(seed: int, total_events: int, block_size: int,
                   n_convs: int, max_turns: int, delete_frac: float = 0.1,
                   hot_frac: float = 0.0, text_len: int = 80,
                   blocks_per_task: int = 1):
    """Returns ``events_factory(window) -> Dataset`` for ``replay(...)``:
    generates exactly the blocks covering [window.lo, window.hi] in parallel
    Ray tasks (epoch windows are aligned to block boundaries by choosing
    epoch_size as a multiple of block_size).

    ``blocks_per_task`` packs several generator blocks into one output block —
    the stream CONTENT is unchanged (block_size stays the seed unit), only the
    physical packaging: fewer, larger blocks mean fewer per-block driver/
    object-store operations downstream."""
    import ray.data as rd

    def factory(window):
        b_lo = window.lo // block_size
        b_hi = window.hi // block_size
        assert window.lo == b_lo * block_size, "epoch_size must be a multiple of block_size"
        # the generated stream is used window_prefiltered=True, so the last
        # block must not leak offsets past window.hi (they'd be clamped into
        # the final epoch and overstate its manifest range)
        assert (window.hi + 1) % block_size == 0, \
            "window.hi+1 must be a multiple of block_size (aligned windows)"

        def gen(batch: pa.Table) -> pa.Table:
            out = [gen_block(seed, int(b), block_size, n_convs, max_turns,
                             delete_frac, hot_frac, text_len)
                   for b in batch.column("id").to_pylist()]
            return pa.concat_tables(out)

        return rd.range(b_hi - b_lo + 1).map_batches(
            lambda t: t.set_column(0, "id", pa.compute.add(t.column("id"), b_lo)),
            batch_format="pyarrow").map_batches(
            gen, batch_format="pyarrow", batch_size=blocks_per_task)

    return factory
