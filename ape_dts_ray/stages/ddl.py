"""DDL-text adapter: the alter-family subset of the reference's SQL parser.

ape-dts parses full DDL statements into a typed model
(dt-common/src/meta/ddl_meta/ddl_parser.rs:1-2052 → ddl_type.rs:7-36
CreateTable/AlterTable/Truncate/...); its sinkers drop cached metadata on DDL
and the extractor drains queues around it (base_extractor.rs:118-124). This
engine's schema changes are structured ``schema_ops`` applied at
merge-on-read (stages/merge.py::apply_schema_ops) plus epoch barriers — the
adapter closes the most common real-world shape by translating the DDL
*text* a CDC source would emit into those ops:

    ALTER TABLE t RENAME COLUMN a TO b          → {"op": "rename", ...}
    ALTER TABLE t DROP COLUMN c                 → {"op": "drop", ...}
    ALTER TABLE t ADD COLUMN c <type>           → additive (no op needed;
                                                  validated + recorded)
    ALTER TABLE t MODIFY [COLUMN] c <type>      → {"op": "widen", ...}
    ALTER TABLE t CHANGE [COLUMN] a b <type>    → rename + widen (MySQL)
    ALTER TABLE t ALTER [COLUMN] c [SET DATA] TYPE <type>   (PG spelling)
    TRUNCATE [TABLE] t                          → LakeTable.truncate()

Everything else (CREATE/DROP TABLE, indexes, constraints) is out of the
alter-family scope and raises ``UnsupportedDdlError`` — honest refusal, not
silent drop. Identifiers may be backtick/double-quote/bracket-quoted;
keywords are case-insensitive. Type names use the MySQL/PG spellings and map
to Arrow type aliases for the widen op.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class DdlError(ValueError):
    pass


class UnsupportedDdlError(DdlError):
    pass


_TYPE_MAP = {
    "tinyint": "int8", "smallint": "int16", "mediumint": "int32",
    "int": "int32", "integer": "int32", "bigint": "int64",
    "float": "float32", "real": "float32",
    "double": "float64", "double precision": "float64",
    "text": "string", "varchar": "string", "char": "string",
    "string": "string", "blob": "binary", "binary": "binary",
    "varbinary": "binary", "bytea": "binary",
    "date": "date32", "datetime": "timestamp[us]",
    "timestamp": "timestamp[us]", "json": "string",
}


def _ident(tok: str) -> str:
    tok = tok.strip()
    if tok and tok[0] in "`\"[" and len(tok) >= 2:
        body = tok[1:-1]
        # collapse doubled quote chars inside quoted identifiers
        # (MySQL `a``b` → a`b, SQL "a""b" → a"b; brackets have no escape)
        if tok[0] == "`":
            body = body.replace("``", "`")
        elif tok[0] == '"':
            body = body.replace('""', '"')
        return body
    return tok


def _map_type(sql_type: str) -> str:
    sql_type = re.sub(r"(?:\s+(?:not\s+null|null|default\s+\S+))+\s*$", "",
                      sql_type.strip(), flags=re.I)
    base = re.sub(r"\(.*\)", "", sql_type).strip().lower()
    base = re.sub(r"\s+(unsigned|signed|zerofill)\b", "", base).strip()
    if base in _TYPE_MAP:
        return _TYPE_MAP[base]
    if re.match(r"^decimal|^numeric", base):
        m = re.match(r"^(?:decimal|numeric)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)",
                     sql_type.strip().lower())
        if m:
            return f"decimal128({m.group(1)},{m.group(2)})"
        return "decimal128(38,9)"
    raise UnsupportedDdlError(f"unmapped SQL type: {sql_type!r}")


_ID = r"(?:`(?:[^`]|``)+`|\"(?:[^\"]|\"\")+\"|\[[^\]]+\]|[A-Za-z_][\w$]*)"
_QUALID = rf"{_ID}(?:\.{_ID})*"

_RE_RENAME = re.compile(
    rf"^ALTER\s+TABLE\s+(?P<tb>{_QUALID})\s+RENAME\s+COLUMN\s+"
    rf"(?P<src>{_ID})\s+TO\s+(?P<dst>{_ID})\s*;?\s*$", re.I)
_RE_DROP = re.compile(
    rf"^ALTER\s+TABLE\s+(?P<tb>{_QUALID})\s+DROP\s+(?:COLUMN\s+)?"
    rf"(?P<col>{_ID})\s*;?\s*$", re.I)
_RE_ADD = re.compile(
    rf"^ALTER\s+TABLE\s+(?P<tb>{_QUALID})\s+ADD\s+(?:COLUMN\s+)?"
    rf"(?P<col>{_ID})\s+(?P<type>[\w\s]+(?:\([^)]*\))?[\w\s]*?)"
    rf"(?:\s+(?:NULL|NOT\s+NULL|DEFAULT\s+\S+))*\s*;?\s*$", re.I)
_RE_MODIFY = re.compile(
    rf"^ALTER\s+TABLE\s+(?P<tb>{_QUALID})\s+MODIFY\s+(?:COLUMN\s+)?"
    rf"(?P<col>{_ID})\s+(?P<type>[\w\s]+(?:\([^)]*\))?[\w\s]*?)"
    rf"(?:\s+(?:NULL|NOT\s+NULL|DEFAULT\s+\S+))*\s*;?\s*$", re.I)
_RE_ALTER_TYPE = re.compile(
    rf"^ALTER\s+TABLE\s+(?P<tb>{_QUALID})\s+ALTER\s+(?:COLUMN\s+)?"
    rf"(?P<col>{_ID})\s+(?:SET\s+DATA\s+)?TYPE\s+"
    rf"(?P<type>[\w\s]+(?:\([^)]*\))?)\s*;?\s*$", re.I)
_RE_CHANGE = re.compile(
    rf"^ALTER\s+TABLE\s+(?P<tb>{_QUALID})\s+CHANGE\s+(?:COLUMN\s+)?"
    rf"(?P<src>{_ID})\s+(?P<dst>{_ID})\s+(?P<type>[\w\s]+(?:\([^)]*\))?[\w\s]*?)"
    rf"(?:\s+(?:NULL|NOT\s+NULL|DEFAULT\s+\S+))*\s*;?\s*$", re.I)
_RE_TRUNCATE = re.compile(
    rf"^TRUNCATE\s+(?:TABLE\s+)?(?P<tb>{_QUALID})\s*;?\s*$", re.I)


@dataclass
class ParsedDdl:
    """One parsed statement (DdlType analog, ddl_type.rs:7-36)."""

    kind: str                       # rename | drop | add | widen | truncate
    table: str
    schema_op: dict | None = None   # merge-on-read op, when one is needed
    extra: dict = field(default_factory=dict)


def parse_ddl(sql: str) -> ParsedDdl:
    s = " ".join(sql.strip().split())
    m = _RE_RENAME.match(s)
    if m:
        return ParsedDdl("rename", _ident(m["tb"]),
                         {"op": "rename", "from": _ident(m["src"]),
                          "to": _ident(m["dst"])})
    m = _RE_DROP.match(s)
    if m:
        return ParsedDdl("drop", _ident(m["tb"]),
                         {"op": "drop", "col": _ident(m["col"])})
    m = _RE_ALTER_TYPE.match(s) or _RE_MODIFY.match(s)
    if m:
        return ParsedDdl("widen", _ident(m["tb"]),
                         {"op": "widen", "col": _ident(m["col"]),
                          "type": _map_type(m["type"])})
    m = _RE_CHANGE.match(s)
    if m:   # MySQL CHANGE = rename + full new definition in one statement;
            # emitted as rename then widen-on-the-new-name (extra carries
            # the second op; same-name CHANGE degenerates to a widen)
        src, dst = _ident(m["src"]), _ident(m["dst"])
        widen = {"op": "widen", "col": dst, "type": _map_type(m["type"])}
        if src == dst:
            return ParsedDdl("widen", _ident(m["tb"]), widen)
        return ParsedDdl("rename", _ident(m["tb"]),
                         {"op": "rename", "from": src, "to": dst},
                         {"also": widen})
    m = _RE_ADD.match(s)
    if m:   # additive evolution: new columns just appear in the stream and
            # fold_state null-backfills older files — no merge-op needed
        return ParsedDdl("add", _ident(m["tb"]), None,
                         {"col": _ident(m["col"]),
                          "type": _map_type(m["type"])})
    m = _RE_TRUNCATE.match(s)
    if m:
        return ParsedDdl("truncate", _ident(m["tb"]))
    raise UnsupportedDdlError(
        f"statement outside the alter-family subset: {sql!r}")


def apply_ddl(lake, sql: str) -> ParsedDdl:
    """Parse one DDL statement and apply it to the lake's persisted schema
    state (the execution point the reference reaches through its sinkers'
    DDL branch). Ops touching an id col are rejected by
    ``LakeTable.set_schema_ops`` — the LWW key must stay stable. Returns the
    parsed statement so replay drivers can place the epoch barrier."""
    parsed = parse_ddl(sql)
    if parsed.kind in ("rename", "drop", "widen"):
        ops = [*lake.schema_ops, parsed.schema_op]
        if parsed.extra.get("also"):
            ops.append(parsed.extra["also"])
        lake.set_schema_ops(ops)
    elif parsed.kind == "add":
        if parsed.extra["col"] in lake.meta.id_cols:
            raise DdlError(f"ADD COLUMN {parsed.extra['col']!r} collides "
                           "with an id col")
    elif parsed.kind == "truncate":
        lake.truncate()
    return parsed
