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

Table-LIFECYCLE statements (ddl_type.rs CreateTable/DropTable/RenameTable)
operate on a multitable ROOT (one lake directory per table, the
``replay_mixed`` layout) through ``apply_table_ddl``:

    CREATE TABLE [IF NOT EXISTS] t (cols..., PRIMARY KEY (a[, b]))
        → LakeTable.create with the parsed key/payload columns; NOT NULL
          column constraints land as precheck descriptors
    DROP TABLE [IF EXISTS] t                    → crash-safe delete
          (rename to a ``._dropped`` tombstone first, then remove — a crash
          between the two leaves a tombstone that re-running the DROP or
          any later CREATE of the name finishes deleting)
    RENAME TABLE a TO b / ALTER TABLE a RENAME TO b
        → directory rename (atomic) + meta name rewrite; re-running the
          statement after a crash between the two completes the rewrite

CREATE TABLE accepts the real mysqldump/binlog shape: table-options tail
(ENGINE/CHARSET/COLLATE/COMMENT — validated then ignored, they have no
Parquet meaning), AUTO_INCREMENT columns (→ sequence descriptors),
UNIQUE [KEY] (→ unique-constraint descriptors), and secondary KEY / FK
clauses (no lake analog — parsed and surfaced in ``extra["skipped"]``,
never silently vanished). Everything else (standalone CREATE INDEX,
views, grants, unknown table options) raises ``UnsupportedDdlError`` —
honest refusal, not silent drop. Identifiers may
be backtick/double-quote/bracket-quoted; keywords are case-insensitive.
Type names use the MySQL/PG spellings and map to Arrow type aliases for
the widen op.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field, replace


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


def _unquote_one(seg: str) -> str:
    if seg and seg[0] in "`\"[" and len(seg) >= 2:
        body = seg[1:-1]
        # collapse doubled quote chars inside quoted identifiers
        # (MySQL `a``b` → a`b, SQL "a""b" → a"b; brackets have no escape)
        if seg[0] == "`":
            body = body.replace("``", "`")
        elif seg[0] == '"':
            body = body.replace('""', '"')
        return body
    return seg


def _ident(tok: str) -> str:
    tok = tok.strip()
    if not tok or not any(q in tok for q in "`\"["):
        return tok        # unquoted (qualified names keep their dots as-is)
    if "." not in tok:
        return _unquote_one(tok)
    # qualified name with at least one QUOTED segment (any position — the
    # mysqldump form db1.`users` quotes only the table): split on dots
    # OUTSIDE the quotes and strip each segment — stripping the outer pair
    # of the whole dotted token mangled `db1`.`users` into db1`.`users, and
    # gating on tok[0] alone left db1.`users` fully quoted — in both cases
    # a silently distinct table from the unquoted db1.users
    parts, i, start = [], 0, 0
    while i < len(tok):
        c = tok[i]
        if c in "`\"'":
            i = _skip_quoted(tok, i) or (i + 1)
        elif c == "[":
            j = tok.find("]", i + 1)
            i = len(tok) if j == -1 else j + 1
        elif c == ".":
            parts.append(tok[start:i])
            start = i + 1
            i += 1
        else:
            i += 1
    parts.append(tok[start:])
    return ".".join(_unquote_one(p.strip()) for p in parts)


def _map_type(sql_type: str) -> str:
    # column-level COMMENT '<string>' (backslash or doubled-quote escapes)
    # is pure annotation — strip it before the attribute tail so a COMMENT
    # carrying spaces doesn't defeat the default\S+ strip below
    sql_type = re.sub(
        r"\s+comment\s+(?:'(?:\\.|''|[^'\\])*'|\"(?:\\.|\"\"|[^\"\\])*\")",
        " ", sql_type.strip(), flags=re.I)
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
_RE_CREATE_HEAD = re.compile(
    rf"^CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<tb>{_QUALID})\s*"
    rf"\(", re.I | re.S)


def _skip_quoted(s: str, i: int) -> int | None:
    """If ``s[i]`` opens a quoted literal/identifier, return the index just
    past its closing quote (doubled-quote escapes honored); else None. Both
    the paren-balance scan and the comma split use this so ',' '(' ')' in
    DEFAULT/COMMENT strings never count as structure."""
    q = s[i]
    if q not in "'\"`":
        return None
    i += 1
    while i < len(s):
        if q != "`" and s[i] == "\\" and i + 1 < len(s):
            # MySQL backslash escapes inside STRING literals (default
            # sql_mode; mysqldump emits COMMENT 'don\'t') — backticked
            # identifiers only escape by doubling
            i += 2
            continue
        if s[i] == q:
            if i + 1 < len(s) and s[i + 1] == q:
                i += 2
                continue
            return i + 1
        i += 1
    raise UnsupportedDdlError(f"unterminated {q} quote in DDL")


def _strip_quoted(s: str) -> str:
    """Blank out quoted spans (a COMMENT mentioning AUTO_INCREMENT must not
    look like the table option)."""
    out, i = [], 0
    while i < len(s):
        j = _skip_quoted(s, i)
        if j is not None:
            out.append(" " * (j - i))
            i = j
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _match_create_table(s: str):
    """CREATE TABLE head + paren-BALANCED, quote-aware body scan (a greedy
    regex would let parens in the options tail, e.g. PARTITION BY HASH(a),
    steal the body's closing paren; a naive balance scan would miscount a
    ')' inside DEFAULT 'x)'). Returns (if_not_exists, table, body, opts)
    or None."""
    m = _RE_CREATE_HEAD.match(s)
    if not m:
        return None
    depth, i = 1, m.end()
    while i < len(s) and depth:
        j = _skip_quoted(s, i)
        if j is not None:
            i = j
            continue
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
        i += 1
    if depth:
        raise UnsupportedDdlError(f"unbalanced parens in CREATE TABLE: {s!r}")
    return (bool(m["ine"]), _ident(m["tb"]),
            s[m.end():i - 1], s[i:].strip().rstrip(";").strip())
# the table-options tail a mysqldump/binlog CREATE TABLE actually carries
# (ENGINE=InnoDB AUTO_INCREMENT=17 DEFAULT CHARSET=utf8mb4 COLLATE=...
# COMMENT='...'); storage options have no Parquet-lake meaning and are
# validated-then-ignored, anything unrecognized still refuses loudly
_RE_TABLE_OPTS = re.compile(
    r"^(?:\s*(?:ENGINE|AUTO_INCREMENT|ROW_FORMAT|COLLATE|CHECKSUM|COMMENT|"
    r"KEY_BLOCK_SIZE|MAX_ROWS|MIN_ROWS|(?:DEFAULT\s+)?CHARSET|"
    r"(?:DEFAULT\s+)?CHARACTER\s+SET|(?:DEFAULT\s+)?COLLATE)"
    r"\s*=?\s*(?:'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"|[\w.]+))*\s*$", re.I)
_RE_DROP_TABLE = re.compile(
    rf"^DROP\s+TABLE\s+(?P<ie>IF\s+EXISTS\s+)?(?P<tb>{_QUALID})\s*;?\s*$",
    re.I)
_RE_RENAME_TABLE = re.compile(
    rf"^(?:RENAME\s+TABLE\s+(?P<a>{_QUALID})\s+TO\s+(?P<b>{_QUALID})"
    rf"|ALTER\s+TABLE\s+(?P<a2>{_QUALID})\s+RENAME\s+(?:TO\s+)?"
    rf"(?P<b2>{_QUALID}))\s*;?\s*$", re.I)
_RE_COL_DEF = re.compile(rf"^(?P<col>{_ID})\s+(?P<rest>.+?)\s*$", re.I)
_SQSTR = r"'(?:[^']|'')*'"        # quoted literal, '' escape honored
_DQSTR = r'"(?:[^"]|"")*"'
_RE_COL_TAIL = re.compile(
    rf"\s+(?P<tok>NOT\s+NULL|NULL|DEFAULT\s+(?:{_SQSTR}|{_DQSTR}|\S+)|"
    rf"ON\s+UPDATE\s+\S+|PRIMARY\s+KEY|AUTO_INCREMENT|UNIQUE(?:\s+KEY)?|"
    rf"COMMENT\s+(?:{_SQSTR}|{_DQSTR}))\s*$", re.I)
_RE_PK_CLAUSE = re.compile(
    rf"^PRIMARY\s+KEY\s*\((?P<cols>.*)\)\s*(?:USING\s+\w+)?\s*$",
    re.I | re.S)
# mysqldump bodies also carry secondary-index and FK clauses; a Parquet
# lake has no indexes (COVERAGE.md: Index/Rbac out of scope) so these are
# parsed and surfaced in extra["skipped"], never silently vanished —
# except UNIQUE KEY, which becomes a unique-constraint descriptor
_RE_UNIQUE_CLAUSE = re.compile(
    rf"^UNIQUE\s+(?:KEY|INDEX)?\s*(?:{_ID})?\s*\((?P<cols>.*)\)"
    rf"\s*(?:USING\s+\w+)?\s*$", re.I | re.S)
_RE_KEYPART = re.compile(rf"^(?P<col>{_ID})\s*(?:\(\s*\d+\s*\))?"
                         rf"(?:\s+(?:ASC|DESC))?$", re.I)


def _key_cols(cols: str) -> list[str]:
    """Index key-part list → column names (mysqldump prefix lengths like
    `email`(20) and ASC/DESC are part of the key, not the name)."""
    out = []
    for part in _split_defs(cols):
        m = _RE_KEYPART.match(part)
        if not m:
            raise UnsupportedDdlError(f"unparsed index key part: {part!r}")
        out.append(_ident(m["col"]))
    return out
_RE_SKIP_CLAUSE = re.compile(
    rf"^(?:KEY|INDEX|FULLTEXT\s+KEY|SPATIAL\s+KEY|CONSTRAINT\s+{_ID}\s+"
    rf"FOREIGN\s+KEY|FOREIGN\s+KEY)\b", re.I)


def _parse_col_def(d: str) -> tuple[str, str, set[str]]:
    """One column definition → (name, arrow type, constraint tokens).
    Constraint tokens are peeled off the END so a multi-word type
    ('DOUBLE PRECISION') never swallows them."""
    m = _RE_COL_DEF.match(d)
    if not m:
        raise UnsupportedDdlError(f"unparsed column definition: {d!r}")
    rest, toks = m["rest"], set()
    while True:
        t = _RE_COL_TAIL.search(rest)
        if not t:
            break
        toks.add(" ".join(t["tok"].upper().split()))
        rest = rest[:t.start()]
    return _ident(m["col"]), _map_type(rest), toks


def _split_defs(body: str) -> list[str]:
    """Split a CREATE TABLE body on top-level commas — paren-aware (so
    DECIMAL(18,4) stays whole) and quote-aware (so COMMENT 'total, cents'
    does too)."""
    out, depth, cur, i = [], 0, [], 0
    while i < len(body):
        j = _skip_quoted(body, i)
        if j is not None:
            cur.append(body[i:j])
            i = j
            continue
        ch = body[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


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
    ct = _match_create_table(s)
    if ct:
        ine, tb, body, opts = ct
        if opts and not _RE_TABLE_OPTS.match(opts):
            raise UnsupportedDdlError(f"unrecognized table options: {opts!r}")
        ai = re.search(r"AUTO_INCREMENT\s*=?\s*(\d+)",
                       _strip_quoted(opts), re.I)
        ai_start = int(ai.group(1)) if ai else None
        cols, id_cols, not_null = [], [], []
        uniques, autoinc, skipped = [], [], []
        for d in _split_defs(body):
            pk = _RE_PK_CLAUSE.match(d)
            if pk:
                id_cols.extend(_key_cols(pk["cols"]))
                continue
            uq = _RE_UNIQUE_CLAUSE.match(d)
            if uq:
                uniques.append(_key_cols(uq["cols"]))
                continue
            if _RE_SKIP_CLAUSE.match(d):
                skipped.append(d)       # secondary indexes / FKs: no
                continue                # Parquet analog, surfaced not lost
            col, typ, toks = _parse_col_def(d)
            cols.append((col, typ))
            if "PRIMARY KEY" in toks:
                id_cols.append(col)
            if "NOT NULL" in toks or "PRIMARY KEY" in toks:
                not_null.append(col)
            if any(t.startswith("UNIQUE") for t in toks):
                uniques.append([col])
            if "AUTO_INCREMENT" in toks:
                autoinc.append(col)
        if not id_cols:
            raise DdlError("CREATE TABLE without a PRIMARY KEY: the LWW "
                           "fold needs stable id cols")
        unknown = [c for c in id_cols if c not in dict(cols)]
        if unknown:
            raise DdlError(f"PRIMARY KEY names undefined columns: {unknown}")
        return ParsedDdl("create_table", tb, None,
                         {"columns": cols, "id_cols": id_cols,
                          "not_null": not_null, "unique": uniques,
                          "auto_increment": autoinc,
                          "auto_increment_start": ai_start,
                          "skipped": skipped, "if_not_exists": ine})
    m = _RE_DROP_TABLE.match(s)
    if m:
        return ParsedDdl("drop_table", _ident(m["tb"]), None,
                         {"if_exists": bool(m["ie"])})
    m = _RE_RENAME_TABLE.match(s)
    if m:
        src = _ident(m["a"] or m["a2"])
        return ParsedDdl("rename_table", src,
                         None, {"to": _ident(m["b"] or m["b2"])})
    raise UnsupportedDdlError(
        f"statement outside the supported DDL subset: {sql!r}")


def apply_ddl(lake, sql: str) -> ParsedDdl:
    """Parse one DDL statement and apply it to the lake's persisted schema
    state (the execution point the reference reaches through its sinkers'
    DDL branch). Ops touching an id col are rejected by
    ``LakeTable.set_schema_ops`` — the LWW key must stay stable. Returns the
    parsed statement so replay drivers can place the epoch barrier."""
    parsed = parse_ddl(sql)
    if parsed.kind in ("create_table", "drop_table", "rename_table"):
        raise DdlError(f"{parsed.kind} is a table-lifecycle statement — "
                       "apply it to a multitable root via apply_table_ddl")
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


_DROPPED_SUFFIX = "._dropped"


def _sweep_tombstones(root: str, name: str) -> None:
    import shutil

    tomb = os.path.join(root, name + _DROPPED_SUFFIX)
    if os.path.isdir(tomb):
        shutil.rmtree(tomb)


def list_tables(root: str) -> list[str]:
    """Live table directories under a multitable root (tombstones and
    non-lake dirs excluded)."""
    out = []
    for n in sorted(os.listdir(root)):
        if n.endswith(_DROPPED_SUFFIX):
            continue
        if os.path.exists(os.path.join(root, n, "_table.json")):
            out.append(n)
    return out


def apply_table_ddl(root: str, sql: str, config=None) -> ParsedDdl:
    """Execute one table-lifecycle statement against a multitable root
    (one lake directory per table — the ``replay_mixed`` layout;
    ddl_type.rs CreateTable/DropTable/RenameTable execution point).

    Crash safety: CREATE is atomic at the ``_table.json`` write; DROP
    renames to a ``._dropped`` tombstone (atomic) before removing, and both
    DROP and CREATE of the same name sweep a leftover tombstone first;
    RENAME is an atomic directory rename followed by the meta-name rewrite,
    and re-running the statement completes a rewrite the crash skipped."""
    import shutil

    from ape_dts_ray.meta import TableMeta
    from ape_dts_ray.state.lake import LakeTable

    parsed = parse_ddl(sql)
    if parsed.kind == "create_table":
        _sweep_tombstones(root, parsed.table)
        path = os.path.join(root, parsed.table)
        exists = os.path.exists(os.path.join(path, "_table.json"))
        if exists and parsed.extra["if_not_exists"]:
            return parsed
        if exists:
            raise DdlError(f"table {parsed.table!r} already exists")
        ids = tuple(parsed.extra["id_cols"])
        payload = tuple(c for c, _ in parsed.extra["columns"]
                        if c not in ids)
        meta = TableMeta(name=parsed.table, id_cols=ids,
                         partition_col=ids[0], order_cols=ids,
                         payload_cols=payload)
        lake = LakeTable.create(path, meta, config)
        nn = [c for c in parsed.extra["not_null"] if c not in ids]
        cons = [{"type": "not_null", "col": c} for c in nn]
        cons += [{"type": "unique", "cols": u}
                 for u in parsed.extra["unique"] if tuple(u) != ids]
        if cons:  # id-col NOT NULL is implied; payload NOT NULL/UNIQUE →
            lake.set_constraints([*lake.constraints, *cons])   # precheck
        if parsed.extra["auto_increment"]:
            # AUTO_INCREMENT → sequence descriptor (the migration's
            # setval-handoff machinery, LakeTable.advance_sequences); the
            # table option AUTO_INCREMENT=N seeds the counter at the
            # SOURCE's position — starting at 1 would re-issue ids the
            # source already consumed for rows since deleted
            start = parsed.extra["auto_increment_start"] or 1
            lake.set_sequences([
                {"name": f"{parsed.table}_{c}_seq", "col": c,
                 "start_value": start, "next_value": start}
                for c in parsed.extra["auto_increment"]])
    elif parsed.kind == "drop_table":
        path = os.path.join(root, parsed.table)
        had_tomb = os.path.isdir(path + _DROPPED_SUFFIX)
        _sweep_tombstones(root, parsed.table)
        if not os.path.isdir(path):
            if parsed.extra["if_exists"] or had_tomb:
                # had_tomb: a prior DROP crashed between the tombstone
                # rename and the rmtree — the sweep above FINISHED that
                # drop, so the replaying driver's re-run reports success
                # (the documented crash-recovery contract), not
                # 'does not exist'
                return parsed
            raise DdlError(f"table {parsed.table!r} does not exist")
        tomb = path + _DROPPED_SUFFIX
        os.rename(path, tomb)
        shutil.rmtree(tomb)
    elif parsed.kind == "rename_table":
        src = os.path.join(root, parsed.table)
        dst = os.path.join(root, parsed.extra["to"])
        if os.path.isdir(src):
            if os.path.exists(dst):
                raise DdlError(f"rename target {parsed.extra['to']!r} "
                               "already exists")
            os.rename(src, dst)
            lake = LakeTable.open(dst)
        elif os.path.isdir(dst):
            # crash between rename and meta rewrite — finish below (one
            # open serves both the check and the rewrite)
            lake = LakeTable.open(dst)
            if lake.meta.name != parsed.table:
                # STRICT: an existing destination whose persisted name is
                # not the source is an unrelated table — absorbing the
                # statement would let a typo'd/replayed rename report
                # success while the operator believes the data moved
                raise DdlError(f"table {parsed.table!r} does not exist")
        else:
            raise DdlError(f"table {parsed.table!r} does not exist")
        if lake.meta.name == parsed.table:      # finish (or redo) the rewrite
            lake.meta = replace(lake.meta, name=parsed.extra["to"])
            lake._save_table_json()
    else:
        raise DdlError(f"{parsed.kind} is a single-table statement — "
                       "apply it to the lake via apply_ddl")
    return parsed


# ---------------------------------------------------------------------------
# Structure emission — struct_statement.rs::to_sqls analog
# ---------------------------------------------------------------------------

_ARROW_TO_SQL = {
    "int8": "TINYINT", "int16": "SMALLINT", "int32": "INT",
    "int64": "BIGINT", "float": "FLOAT", "float32": "FLOAT",
    "double": "DOUBLE", "float64": "DOUBLE", "bool": "BOOLEAN",
    "string": "TEXT", "large_string": "TEXT",
    "binary": "BLOB", "large_binary": "BLOB",
    "date32[day]": "DATE", "timestamp[us]": "DATETIME",
}


def _sql_type_of(t) -> str:
    s = str(t)
    if s in _ARROW_TO_SQL:
        return _ARROW_TO_SQL[s]
    m = re.match(r"^decimal128\((\d+),\s*(\d+)\)$", s)
    if m:
        return f"DECIMAL({m.group(1)},{m.group(2)})"
    if s.startswith("dictionary"):       # dict-encoded enum analog rides as
        return "TEXT"                    # plain text on a server target
    raise UnsupportedDdlError(f"no SQL emission for Arrow type {s!r}")


def struct_sqls(lake, schema=None,
                do_structures: tuple[str, ...] = ("*",)
                ) -> list[tuple[str, str]]:
    """Emit the structure-migration script for a lake table as ordered
    ``(key, sql)`` pairs — the mysql_create_table_statement.rs::to_sqls
    analog (:36-105), gated per structure type by
    ``RdbFilter::filter_structure`` semantics (rdb_filter.rs:126-129, via
    stages/rbac.filter_structure):

    - ``table``: CREATE TABLE from the Arrow ``schema`` (engine columns
      excluded) + PRIMARY KEY over ``meta.id_cols``. UNIQUE-kind indexes are
      gated under ``table`` exactly like the reference (:50-55 — a unique
      index is part of the table's key structure, not decoration).
    - ``index``: plain (btree) and unique indexes JOIN into one
      ``ALTER TABLE .. ADD [UNIQUE] INDEX ..`` per table (:63-67, 77-91);
      fulltext/spatial emit standalone CREATE statements (:68-74).
    - ``constraint`` / ``sequence`` / ``comment``: one statement per
      descriptor (constraint_to_sql shape; sequences carry the
      setval-to-max handoff in START WITH; comments use the PG COMMENT ON
      form like structure/comment.rs).

    RBAC is emitted separately by ``stages/rbac.rbac_to_sqls`` (it needs the
    folded DCL state, not table metadata). ``schema`` (the state dataset's
    Arrow schema) is only required when the table statement itself survives
    the filter."""
    from ape_dts_ray.meta import COL_EPOCH, COL_OFFSET, COL_OP, COL_SEQ
    from ape_dts_ray.stages.rbac import filter_structure

    tb = lake.meta.name
    sqls: list[tuple[str, str]] = []

    if not filter_structure("table", do_structures):
        if schema is None:
            raise ValueError("struct_sqls needs the state Arrow schema to "
                             "emit the CREATE TABLE statement")
        engine_cols = {COL_EPOCH, COL_OFFSET, COL_SEQ, COL_OP}
        defs = [f"`{f.name}` {_sql_type_of(f.type)}"
                for f in schema if f.name not in engine_cols]
        defs.append("PRIMARY KEY (" +
                    ", ".join(f"`{c}`" for c in lake.meta.id_cols) + ")")
        sqls.append((f"table.{tb}",
                     f"CREATE TABLE `{tb}` (" + ", ".join(defs) + ")"))

    appends: list[str] = []
    for i in lake.indexes:
        gate = "table" if i["kind"] == "unique" else "index"
        if filter_structure(gate, do_structures):
            continue
        cols = ", ".join(f"`{c}`" for c in i["cols"])
        if i["kind"] in ("fulltext", "spatial"):
            sqls.append((f"index.{tb}.{i['name']}",
                         f"CREATE {i['kind'].upper()} INDEX `{i['name']}` "
                         f"ON `{tb}` ({cols})"))
        else:
            uq = "UNIQUE " if i["kind"] == "unique" else ""
            appends.append(f"ADD {uq}INDEX `{i['name']}` ({cols})")
    if appends:
        sqls.append((f"index.{tb}",
                     f"ALTER TABLE `{tb}` " + ", ".join(appends)))

    if not filter_structure("constraint", do_structures):
        for c in lake.constraints:
            if c["type"] == "not_null":
                name = f"nn_{c['col']}"
                sqls.append((f"constraint.{tb}.{name}",
                             f"ALTER TABLE `{tb}` ADD CONSTRAINT `{name}` "
                             f"CHECK (`{c['col']}` IS NOT NULL)"))
            else:
                name = "uq_" + "_".join(c["cols"])
                cols = ", ".join(f"`{x}`" for x in c["cols"])
                sqls.append((f"constraint.{tb}.{name}",
                             f"ALTER TABLE `{tb}` ADD CONSTRAINT `{name}` "
                             f"UNIQUE ({cols})"))

    if not filter_structure("sequence", do_structures):
        for s in lake.sequences:
            sqls.append((f"sequence.{s['name']}",
                         f"CREATE SEQUENCE \"{s['name']}\" START WITH "
                         f"{s['next_value']} INCREMENT BY {s['increment']}"))

    if not filter_structure("comment", do_structures):
        for c in lake.comments:
            txt = c["comment"].replace("'", "''")
            if c["type"] == "table":
                sqls.append((f"comment.{tb}",
                             f"COMMENT ON TABLE \"{tb}\" IS '{txt}'"))
            else:
                sqls.append((f"comment.{tb}.{c['column']}",
                             f"COMMENT ON COLUMN \"{tb}\".\"{c['column']}\" "
                             f"IS '{txt}'"))
    return sqls
