"""Event filtering — the RdbFilter analog (dt-common/src/rdb_filter.rs).

Capabilities reproduced:
- schema/table allow+deny lists with ``*`` / ``?`` wildcards and escape-aware
  exact match (rdb_filter.rs:61-128,190-200) — here a pure-config matcher used
  by the driver to decide which logical tables run at all;
- event-type filter (``do_events`` insert/update/delete, rdb_filter.rs:95-100)
  — a vectorized ``op ∈ allowed`` predicate;
- per-table ``ignore_cols`` → column projection (drop before shuffle);
- per-table ``where_conditions`` appended to snapshot scans
  (base_extractor.rs:190-205) → a pyarrow dataset filter expression pushed
  into ``read_parquet`` / applied per batch.

Ray-Data-first: row predicates run as vectorized masks inside ``map_batches``
(never ``ds.filter(row_fn)``); projections happen at the read where possible.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc


def wildcard_to_regex(pattern: str) -> re.Pattern:
    """``*``/``?`` wildcards with ``\\`` escaping, matching rdb_filter.rs:190-200."""
    out, i = [], 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1])); i += 2; continue
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
        i += 1
    return re.compile("^" + "".join(out) + "$")


@dataclass
class TableFilter:
    """Allow/deny table matcher (rdb_filter.rs:61-128). Patterns are
    ``schema.table`` strings with wildcards; deny wins over allow; empty
    allow-list means allow-all. Decisions are cached (DashMap analog,
    rdb_filter.rs:77-93)."""

    do_tables: tuple[str, ...] = ()
    ignore_tables: tuple[str, ...] = ()
    _cache: dict = field(default_factory=dict, repr=False)

    def filtered(self, name: str) -> bool:
        """True if the table should be SKIPPED."""
        if name in self._cache:
            return self._cache[name]
        deny = any(wildcard_to_regex(p).match(name) for p in self.ignore_tables)
        allow = (not self.do_tables) or any(
            wildcard_to_regex(p).match(name) for p in self.do_tables)
        res = deny or not allow
        self._cache[name] = res
        return res


@dataclass
class EventFilter:
    """Row-level event filter: op types + optional pyarrow expression.

    ``do_events`` mirrors rdb_filter.rs:95-100; ``where_expr`` mirrors the
    snapshot ``where_condition`` (base_extractor.rs:190-205) and should also be
    handed to ``read_parquet(filter=...)`` for row-group pushdown.
    ``ignore_cols`` mirrors per-table ignore_cols (projection).
    ``exclude_origins`` is the DataMarker cyclic-replication breaker
    (dt-connector/src/data_marker.rs; base_extractor.rs:84-111): in a two-way
    topology the sink stamps every applied event with its node id in an
    ``origin`` column, and the extractor side drops events whose origin is
    itself — the marker-transaction check flattened to a per-event column.
    """

    do_events: tuple[str, ...] = ("insert", "update", "delete")
    where_expr: "pc.Expression | None" = None
    ignore_cols: tuple[str, ...] = ()
    exclude_origins: tuple[str, ...] = ()
    origin_col: str = "origin"

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("op"), value_set=pa.array(self.do_events))
        batch = batch.filter(mask)
        if self.exclude_origins and self.origin_col in batch.column_names:
            keep = pc.invert(pc.is_in(batch.column(self.origin_col),
                                      value_set=pa.array(self.exclude_origins)))
            # NULL origin (locally originated) is always kept
            keep = pc.or_kleene(keep, batch.column(self.origin_col).is_null())
            batch = batch.filter(keep)
        if self.where_expr is not None:
            batch = batch.filter(self.where_expr)
        drop = [c for c in self.ignore_cols if c in batch.column_names]
        if drop:
            batch = batch.drop_columns(drop)
        return batch
