"""DCL statement classification + filter + statement-log sink.

The reference parses CREATE USER / ALTER USER / CREATE ROLE / DROP USER /
DROP ROLE / GRANT / REVOKE / SET DEFAULT ROLE into typed events
(dt-common/src/meta/dcl_meta/dcl_parser.rs:26-229 → dcl_type.rs:7-26, the
statement payload staying the origin text, dcl_statement.rs:30-45), filters
them with ``do_dcls`` (rdb_filter.rs:118-124: empty set → drop all, ``*`` →
keep all, else set membership on the serialized type name), and sinks the
surviving statements verbatim. A Parquet lake has no users/grants to apply,
so the sink analog is a deterministic DCL statement LOG (the SqlSinker
shape) — exactly what a migration operator replays against the target by
hand.

Semantics mirrored 1:1:
- comments are stripped FIRST (dcl_parser.rs:51-55 regex — block and line
  comments), then the head keywords classify case-insensitively with any
  whitespace run between them (nom ``multispace1``);
- DML heads (insert into / update / delete / replace into) are rejected
  before classification (``dcl_simple_judgment``, dcl_parser.rs:57-63) —
  they are not DCL and produce no row;
- anything else that matches no head is ``unknown`` (dcl_type.rs default);
- the emitted statement is the comment-stripped, trimmed origin text
  (dcl_parser.rs:33 trims the stripped SQL before parsing; to_sql() returns
  that origin, dcl_statement.rs:30-45).

The batch path is fully vectorized: one RE2 comment-strip pass plus one
head-match pass per type over the whole column (pyarrow.compute regex
kernels) — no per-row Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# dcl_parser.rs:53 (the reference's odd [^*/*] class ≡ [^*/])
_COMMENT_RE = r"(/\*([^*]|\*+[^*/])*\*+/)|(--[^\n]*\n)"

# classification order = dcl_parser.rs:66-75 alt() order
_HEADS: tuple[tuple[str, str], ...] = (
    ("create_user", r"^create\s+user"),
    ("alter_user", r"^alter\s+user"),
    ("create_role", r"^create\s+role"),
    ("drop_user", r"^drop\s+user"),
    ("drop_role", r"^drop\s+role"),
    ("grant", r"^grant\s"),
    ("revoke", r"^revoke\s"),
    ("set_role", r"^set\s+default\s+role"),
)

DCL_TYPES = tuple(t for t, _ in _HEADS) + ("unknown",)

_DML_RE = r"^\s*(insert\s+into\s|update\s|delete\s|replace\s+into\s)"


def strip_comments(s: str) -> str:
    import re

    return re.sub(_COMMENT_RE, "", s)


def parse_dcl(sql: str) -> tuple[str, str] | None:
    """Scalar classifier (dcl_parser.rs::parse): returns (dcl_type, origin)
    or None for DML statements (the reference's Ok(None)). ``origin`` is the
    comment-stripped, trimmed statement; unmatched non-DML classifies as
    ``unknown`` rather than erroring (dcl_type.rs default — the stream
    context cannot bail on one statement)."""
    import re

    stripped = strip_comments(sql).strip()
    if re.match(_DML_RE, stripped, re.I):
        return None
    for name, head in _HEADS:
        if re.match(head, stripped, re.I):
            return name, stripped
    return "unknown", stripped


def classify_dcl_batch(t: pa.Table, col: str = "statement") -> pa.Table:
    """Vectorized batch classifier: strips comments, drops DML rows, and
    appends a ``dcl_type`` column; the statement column is replaced by the
    stripped+trimmed origin (what to_sql() would emit)."""
    if t.num_rows == 0:
        return t.append_column("dcl_type", pa.array([], pa.string()))
    s = pc.replace_substring_regex(t.column(col), pattern=_COMMENT_RE,
                                   replacement="")
    s = pc.utf8_trim_whitespace(s)
    dml = pc.match_substring_regex(s, r"(?i)" + _DML_RE)
    t = t.set_column(t.column_names.index(col), col, s)
    t = t.filter(pc.invert(dml))
    s = t.column(col)
    kind = np.full(t.num_rows, "unknown", dtype=object)
    undecided = np.ones(t.num_rows, dtype=bool)
    for name, head in _HEADS:
        m = pc.match_substring_regex(s, r"(?i)" + head).to_numpy(
            zero_copy_only=False)
        take = undecided & m
        kind[take] = name
        undecided &= ~m
    return t.append_column("dcl_type", pa.array(kind, pa.string()))


@dataclass
class DclFilter:
    """``do_dcls`` filter (rdb_filter.rs:118-124): empty → drop ALL DCL
    (filter_all_dcl), ``*`` member → keep all, else keep types in the set.
    Runs after classify_dcl_batch (needs the ``dcl_type`` column)."""

    do_dcls: tuple[str, ...] = ()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.do_dcls:
            return batch.slice(0, 0)
        if "*" in self.do_dcls:
            return batch
        mask = pc.is_in(batch.column("dcl_type"),
                        value_set=pa.array(list(self.do_dcls)))
        return batch.filter(mask)
