"""Deterministic hash partitioning with explicit hot-key (skew) salting.

Reference semantics: ape-dts hash-partitions DML by ``partition_col``
(dt-parallelizer/src/rdb_partitioner.rs:84-107, ``col.hash_code() % N``) and has
NO skew handling — a hot key simply serializes on one sinker. We keep the
keyed-parallelism contract (all events of one key land in one partition, so
per-key LWW needs no cross-partition coordination) but add salt splitting:
conversations listed in ``hot_keys`` are spread by ``(conv_id, turn_idx)``
instead of ``conv_id`` alone. That is still a pure function of the primary key,
so partition assignment is stable across epochs, retries and resumes — a
requirement for merge-on-read correctness (every version of a key must live in
the same lake partition). The hot set may only change at compaction boundaries
(when files are rewritten); see state/lake.py.

Hashing is pandas' SipHash-1-3 with a fixed key (``pd.util.hash_array``), which
is deterministic across processes and machines — partition ids must survive a
driver restart (resume reads back per-partition manifests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

COL_PART = "part_id"


def hash_strings(arr: np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of a string/object array."""
    return pd.util.hash_array(np.asarray(arr, dtype=object), categorize=True)


def hash_ints(arr: np.ndarray) -> np.ndarray:
    return pd.util.hash_array(np.asarray(arr, dtype=np.int64))


def partition_ids(
    conv_id: np.ndarray,
    turn_idx: np.ndarray,
    num_partitions: int,
    hot_keys: frozenset[str] | None = None,
) -> np.ndarray:
    """part = hash(conv_id) % P; hot convs use hash(conv_id) ^ hash(turn_idx)."""
    h = hash_strings(conv_id)
    if hot_keys:
        hot = np.isin(np.asarray(conv_id, dtype=object), list(hot_keys))
        if hot.any():
            h = h.copy()
            salt = np.asarray(turn_idx)
            if salt.dtype.kind in "iuf":      # numeric salt col
                h[hot] ^= hash_ints(salt[hot].astype(np.int64))
            else:                             # string/object salt col
                h[hot] ^= hash_strings(salt[hot])
    return (h % np.uint64(num_partitions)).astype(np.int32)


def add_partition_column(
    batch: pa.Table,
    num_partitions: int,
    hot_keys: frozenset[str] | None = None,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
) -> pa.Table:
    """map_batches body: append ``part_id`` (vectorized, no row loop)."""
    if COL_PART in batch.column_names:
        # a source already carrying the reserved column would get a
        # duplicate field (append_column doesn't check) and every
        # downstream groupby/select dies on the ambiguity — refuse loudly
        raise ValueError(
            f"events carry the reserved column {COL_PART!r} — drop or "
            "rename it before partitioning")
    conv = batch.column(conv_col).to_numpy(zero_copy_only=False)
    turn = batch.column(turn_col).to_numpy(zero_copy_only=False)
    pid = partition_ids(conv, turn, num_partitions, hot_keys)
    return batch.append_column(COL_PART, pa.array(pid, type=pa.int32()))
