"""Data model: table metadata + Arrow schemas for the transcripts lake.

Mirrors ape-dts's per-table metadata (``RdbTbMeta``,
dt-common/src/meta/rdb_tb_meta.rs:8-19) and its key-column derivation rules
(dt-common/src/meta/rdb_meta_manager.rs:72-101): ``id_cols`` = primary key,
``partition_col`` = first id col, ``order_col`` drives stable test ordering.

The change-event envelope flattens ape-dts's ``RowData{before, after}`` +
``Position`` (dt-common/src/meta/row_data.rs:18-26, position.rs:12-60) into
flat Arrow columns: PK cols + payload cols + ``op`` + ``log_offset`` (+ a
``seq`` tiebreak used when one source event is split into delete+insert, e.g.
PK-change updates — row_data.rs:71-82 splits an Update the same way).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

# --- op codes (dt-common/src/meta/row_type.rs:5-12) ---
OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"
OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)

# engine-reserved columns on change events
COL_OFFSET = "log_offset"   # int64, global total order of the log (Position analog)
COL_SEQ = "seq"             # int32, tiebreak for split events (delete=0, insert=1)
COL_OP = "op"               # insert|update|delete
COL_EPOCH = "_epoch"        # int64, epoch the delta file belongs to (base = -1)

# transcripts payload (BASELINE.json input_hint)
TRANSCRIPT_FIELDS: list[tuple[str, pa.DataType]] = [
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
]


def transcript_schema(extra: list[tuple[str, pa.DataType]] | None = None) -> pa.Schema:
    fields = list(TRANSCRIPT_FIELDS) + list(extra or [])
    return pa.schema(fields)


@dataclass(frozen=True)
class TableMeta:
    """Per-table metadata (RdbTbMeta analog).

    ``id_cols``: primary key (smallest unique key fallback in the reference,
    rdb_meta_manager.rs:82-96). ``partition_col``: first id col
    (rdb_meta_manager.rs:99) — drives the hash shuffle. ``order_col``: stable
    read-back ordering for tests/checker (rdb_meta_manager.rs:97-98).
    """

    name: str = "transcripts"
    id_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    partition_col: str = "conv_id"
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    payload_cols: tuple[str, ...] = ("role", "text", "tool", "ts")

    @property
    def all_cols(self) -> tuple[str, ...]:
        return tuple(dict.fromkeys(self.id_cols + self.payload_cols))




@dataclass
class EngineConfig:
    """Engine knobs — the analog of ape-dts's [pipeline]/[parallelizer] config
    sections (dt-task/src/task_config.rs; docs/en/config.md)."""

    num_partitions: int = 32            # lake hash partitions (parallel_size analog)
    epoch_size: int = 1_000_000         # events per epoch window (micro-batch analog)
    batch_size: int = 65_536            # map_batches batch size
    hot_keys: tuple[str, ...] = ()      # conv_ids salted across partitions (skew split)
