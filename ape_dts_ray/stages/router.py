"""Routing / renaming — the RdbRouter analog (dt-connector/src/rdb_router.rs).

The reference re-keys per-row col-value hash maps (rdb_router.rs:122-158) and
maps schema/table names (:43-77), with ``reverse()`` used to route check logs
back to source names (:91-120). In Arrow the column rename is zero-copy
(``Table.rename_columns``), and table-name mapping is driver-side config.
This is the "column-mapping rule" the schema-evolution story leans on: a target
never sees source column names it wasn't configured to receive, and columns
missing after routing are null-filled by the apply stage (stages/merge.py
``unify_tables``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa


@dataclass
class Router:
    table_map: dict[str, str] = field(default_factory=dict)   # src table -> dst table
    col_maps: dict[str, dict[str, str]] = field(default_factory=dict)  # per src table

    def route_table(self, name: str) -> str:
        return self.table_map.get(name, name)

    def reverse(self) -> "Router":
        """Invert maps for check-log routing (rdb_router.rs:91-120)."""
        return Router(
            table_map={v: k for k, v in self.table_map.items()},
            col_maps={self.table_map.get(t, t): {v: k for k, v in m.items()}
                      for t, m in self.col_maps.items()},
        )

    def batch_fn(self, table: str):
        """Zero-copy column-rename map_batches body for one table."""
        col_map = self.col_maps.get(table, {})

        def rename(batch: pa.Table) -> pa.Table:
            if not col_map:
                return batch
            return batch.rename_columns(
                [col_map.get(c, c) for c in batch.column_names])

        return rename
