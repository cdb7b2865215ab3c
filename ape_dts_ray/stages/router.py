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
import pyarrow.compute as pc


@dataclass
class Router:
    table_map: dict[str, str] = field(default_factory=dict)   # src table -> dst table
    col_maps: dict[str, dict[str, str]] = field(default_factory=dict)  # per src table
    schema_map: dict[str, str] = field(default_factory=dict)  # src db -> dst db

    def route_table(self, name: str) -> str:
        return self.table_map.get(name, name)

    def route_schema(self, name: str) -> str:
        return self.schema_map.get(name, name)

    def reverse(self) -> "Router":
        """Invert maps for check-log routing (rdb_router.rs:91-120)."""
        return Router(
            table_map={v: k for k, v in self.table_map.items()},
            col_maps={self.table_map.get(t, t): {v: k for k, v in m.items()}
                      for t, m in self.col_maps.items()},
            schema_map={v: k for k, v in self.schema_map.items()},
        )

    def dcl_batch_fn(self):
        """Vectorized ``default_schema`` rewrite for classified DCL batches —
        the filter→route→log chain. The reference leaves per-statement DCL
        routing a marked TODO (base_extractor.rs:126-128) and routes every
        other statement family's default schema through get_schema_map
        (route_ddl's tail, rdb_router.rs:184-186); that is the semantics
        applied here: the statement text is untouched (it is the sink
        payload, dcl_statement.rs:30-45), only the schema the operator
        replays it under is mapped. Unmapped schemas pass through."""
        smap = self.schema_map

        def route(batch: pa.Table) -> pa.Table:
            if not smap or "default_schema" not in batch.column_names:
                return batch
            col = batch.column("default_schema")
            keys = pa.array(list(smap.keys()), pa.string())
            vals = pa.array(list(smap.values()), pa.string())
            idx = pc.index_in(col, value_set=keys)
            routed = pc.if_else(pc.is_valid(idx),
                                pc.take(vals, idx), col)
            return batch.set_column(
                batch.column_names.index("default_schema"),
                "default_schema", routed)

        return route

    def batch_fn(self, table: str):
        """Zero-copy column-rename map_batches body for one table."""
        col_map = self.col_maps.get(table, {})

        def rename(batch: pa.Table) -> pa.Table:
            if not col_map:
                return batch
            return batch.rename_columns(
                [col_map.get(c, c) for c in batch.column_names])

        return rename
