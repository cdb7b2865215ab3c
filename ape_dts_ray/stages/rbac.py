"""RBAC structure migration: fold a DCL statement log into the surviving
roles / users / grants / default-role state and emit reconstruction SQL.

The reference extracts role-based access control from the source catalog and
replays it as CREATE ROLE / GRANT statements against the target
(dt-common/src/meta/struct_meta/statement/pg_create_rbac_statement.rs:15-140:
roles → ``CREATE ROLE .. WITH ..``, members → GRANTs, privileges verbatim —
all gated by ``RdbFilter::filter_structure(StructureType::Rbac)``,
rdb_filter.rs:126-129; structure_type.rs:20-23 notes RBAC migration reads
catalog state). A Parquet lake has no live catalog, so the catalog-state
analog here is a FOLD over the DCL statement log the engine already
classifies (stages/dcl.py): the surviving state after create/alter/drop
user, create/drop role, grant/revoke, and SET DEFAULT ROLE — exactly what
replaying that log against a fresh server would leave behind.

Fold semantics (MySQL account model — users are ``'name'@'host'``
principals, DROP USER wipes the account's privileges, a re-created account
starts clean):

- **user**: survives iff the LAST create/drop event for ``(user, host)`` is
  a create; its password comes from the last create/alter event. ALTER on a
  dropped account folds away (the log's source DB enforced existence — the
  same trust the reference places in statements it replays).
- **role**: survives iff the last create/drop for the role name is a create.
- **grant**: grain is ``(user, host, object, privilege)`` — a multi-privilege
  GRANT explodes into one row per privilege. Survives iff the last
  grant/revoke at that grain is a grant, the grantee survives, AND the grant
  is newer than the grantee's last DROP USER (drop wipes prior grants).
- **default_role**: last SET DEFAULT ROLE per account, same drop-wipe rule.
  MySQL keeps the binding even if the role is later dropped (it errors at
  login), so role survival is deliberately NOT required.

Scale shape: extraction is vectorized Arrow (one ``extract_regex`` pass per
statement family, list-flatten for the privilege explosion — no per-row
Python); the fold keys every event by its owning principal
(``u:user@host`` / ``r:role``) so ONE hash shuffle co-locates an account
with its grants; a per-batch partial reduce (last event per
(key, kind, action, object, privilege)) bounds shuffle rows by live-entity
count, not log length. State stays distributed until the caller consumes it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# one 'x'@'y' account literal (first occurrence anchors the principal)
_ACCT_RE = r"'(?P<user>[^']*)'@'(?P<host>[^']*)'"
_PW_RE = r"(?i)identified\s+by\s+'(?P<pw>[^']*)'"
_ROLE_RE = r"'(?P<role>[^']*)'"
_GRANT_RE = (r"(?i)^grant\s+(?P<privs>.*?)\s+on\s+(?P<obj>\S+)\s+to\s+"
             r"'(?P<user>[^']*)'@'(?P<host>[^']*)'")
_REVOKE_RE = (r"(?i)^revoke\s+(?P<privs>.*?)\s+on\s+(?P<obj>\S+)\s+from\s+"
              r"'(?P<user>[^']*)'@'(?P<host>[^']*)'")
_SETROLE_RE = (r"(?i)^set\s+default\s+role\s+'(?P<role>[^']*)'\s+to\s+"
               r"'(?P<user>[^']*)'@'(?P<host>[^']*)'")
_WGO_RE = r"(?i)with\s+grant\s+option"

# normalized RBAC event / state columns
STATE_COLS = ("kind", "user_name", "host", "role_name", "grant_object",
              "privilege", "with_grant", "password", "log_offset")


def _empty_events() -> pa.Table:
    # column ORDER must match the non-empty emit() path — Ray unifies block
    # schemas positionally when concatenating map_batches outputs
    cols: dict[str, pa.Array] = {}
    for n in ("kind", "action", "user_name", "host", "role_name",
              "grant_object", "privilege"):
        cols[n] = pa.array([], pa.string())
    cols["with_grant"] = pa.array([], pa.bool_())
    cols["password"] = pa.array([], pa.string())
    cols["log_offset"] = pa.array([], pa.int64())
    cols["rbac_key"] = pa.array([], pa.string())
    return pa.table(cols)


def _grp(st: pa.Array, name: str) -> pa.Array:
    """Named regex group with non-matches (parent nulls) filled to ''."""
    return pc.fill_null(pc.struct_field(st, name), "")


def extract_rbac_batch(t: pa.Table, col: str = "statement") -> pa.Table:
    """Classified DCL batch (``log_offset``, ``dcl_type``, ``statement``) →
    normalized RBAC event rows. Statements that fail extraction are ignored,
    mirroring the reference's parse-error policy (dcl_parser.rs:175-180
    "failed to parse dcl, will try ignore it"); FLUSH/unknown types carry no
    RBAC state and drop here too."""
    if t.num_rows == 0:
        return _empty_events()
    s, kind, off = t.column(col), t.column("dcl_type"), t.column("log_offset")
    parts: list[pa.Table] = []

    def emit(n, *, kindv, action, offsets, user=None, host=None, role=None,
             obj=None, priv=None, wgo=None, pw=None):
        if n == 0:
            return

        def cstr(v):
            return pa.array([""] * n, pa.string()) if v is None else v

        parts.append(pa.table({
            "kind": pa.array([kindv] * n, pa.string()),
            "action": pa.array([action] * n, pa.string()),
            "user_name": cstr(user), "host": cstr(host),
            "role_name": cstr(role), "grant_object": cstr(obj),
            "privilege": cstr(priv),
            "with_grant": (pa.array([False] * n, pa.bool_())
                           if wgo is None else wgo),
            "password": cstr(pw), "log_offset": offsets,
        }))

    # --- user lifecycle ---
    for dcl_type, action in (("create_user", "create"),
                             ("alter_user", "alter"),
                             ("drop_user", "drop")):
        m = pc.equal(kind, dcl_type)
        if not (pc.any(m).as_py() or False):
            continue
        sub, o = pc.filter(s, m), pc.filter(off, m)
        acct = pc.extract_regex(sub, _ACCT_RE)
        ok = pc.is_valid(acct)          # drop unparseable (reference: ignore)
        pw = pc.extract_regex(sub, _PW_RE)
        emit(int(pc.sum(ok).as_py() or 0), kindv="user", action=action,
             user=pc.filter(_grp(acct, "user"), ok),
             host=pc.filter(_grp(acct, "host"), ok),
             pw=pc.filter(_grp(pw, "pw"), ok),
             offsets=pc.filter(o, ok))

    # --- role lifecycle ---
    for dcl_type, action in (("create_role", "create"), ("drop_role", "drop")):
        m = pc.equal(kind, dcl_type)
        if not (pc.any(m).as_py() or False):
            continue
        sub, o = pc.filter(s, m), pc.filter(off, m)
        r = pc.extract_regex(sub, _ROLE_RE)
        ok = pc.is_valid(r)
        emit(int(pc.sum(ok).as_py() or 0), kindv="role", action=action,
             role=pc.filter(_grp(r, "role"), ok), offsets=pc.filter(o, ok))

    # --- grant / revoke (privilege explosion) ---
    for dcl_type, action, rx in (("grant", "grant", _GRANT_RE),
                                 ("revoke", "revoke", _REVOKE_RE)):
        m = pc.equal(kind, dcl_type)
        if not (pc.any(m).as_py() or False):
            continue
        sub, o = pc.filter(s, m), pc.filter(off, m)
        g = pc.extract_regex(sub, rx)
        ok = pc.is_valid(g)
        sub, o = pc.filter(sub, ok), pc.filter(o, ok)
        if len(sub) == 0:
            continue
        privs = pc.split_pattern(pc.filter(_grp(g, "privs"), ok), ",")
        flat = pc.utf8_upper(pc.utf8_trim_whitespace(pc.list_flatten(privs)))
        parent = pc.list_parent_indices(privs)
        wgo = pc.match_substring_regex(sub, _WGO_RE)
        emit(len(flat), kindv="grant", action=action,
             user=pc.take(pc.filter(_grp(g, "user"), ok), parent),
             host=pc.take(pc.filter(_grp(g, "host"), ok), parent),
             obj=pc.take(pc.filter(_grp(g, "obj"), ok), parent),
             priv=flat, wgo=pc.take(wgo, parent), offsets=pc.take(o, parent))

    # --- default role binding ---
    m = pc.equal(kind, "set_role")
    if pc.any(m).as_py() or False:
        sub, o = pc.filter(s, m), pc.filter(off, m)
        sr = pc.extract_regex(sub, _SETROLE_RE)
        ok = pc.is_valid(sr)
        emit(int(pc.sum(ok).as_py() or 0), kindv="default_role", action="set",
             user=pc.filter(_grp(sr, "user"), ok),
             host=pc.filter(_grp(sr, "host"), ok),
             role=pc.filter(_grp(sr, "role"), ok),
             offsets=pc.filter(o, ok))

    if not parts:
        return _empty_events()
    out = pa.concat_tables(parts).combine_chunks()
    # partition key: the owning principal — grants/default-role ride with
    # their grantee so the fold needs exactly ONE shuffle
    is_role = pc.equal(out.column("kind"), "role")
    acct_key = pc.binary_join_element_wise(
        pa.array(["u:"] * out.num_rows),
        pc.binary_join_element_wise(out.column("user_name").combine_chunks(),
                                    out.column("host").combine_chunks(), "@"),
        "")
    role_key = pc.binary_join_element_wise(
        pa.array(["r:"] * out.num_rows),
        out.column("role_name").combine_chunks(), "")
    return out.append_column("rbac_key", pc.if_else(is_role, role_key,
                                                    acct_key))


_GRAIN = ["rbac_key", "kind", "action", "grant_object", "privilege"]


def prefold_rbac_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch partial reduce: the fold only ever consults the LAST event
    per (key, kind, action, object, privilege) — per-action maxima preserve
    every "last of {a,b}" the group fold computes — so shuffle rows are
    bounded by live-entity count, not log length."""
    if not len(df):
        return df
    df = df.sort_values("log_offset", kind="stable")
    return df.groupby(_GRAIN, sort=False, as_index=False).tail(1)


_STATE_DTYPES = {"kind": object, "user_name": object, "host": object,
                 "role_name": object, "grant_object": object,
                 "privilege": object, "with_grant": bool, "password": object,
                 "log_offset": np.int64}


def _empty_state() -> pd.DataFrame:
    return pd.DataFrame({n: pd.Series(dtype=d)
                         for n, d in _STATE_DTYPES.items()})


def fold_rbac_group(df: pd.DataFrame) -> pd.DataFrame:
    """One principal's events → its surviving state rows (see module doc)."""
    df = df.sort_values("log_offset", kind="stable")
    cols = list(STATE_COLS)
    if df["rbac_key"].iat[0].startswith("r:"):
        last = df[df["kind"] == "role"].iloc[-1:]
        if len(last) and last["action"].iat[0] == "create":
            return last[cols].astype(_STATE_DTYPES)
        return _empty_state()

    u = df[df["kind"] == "user"]
    cd = u[u["action"].isin(("create", "drop"))]
    if not len(cd) or cd["action"].iat[-1] != "create":
        return _empty_state()           # account gone (or never created)
    drops = cd.loc[cd["action"] == "drop", "log_offset"]
    last_drop = int(drops.max()) if len(drops) else -1

    rows = [u[u["action"].isin(("create", "alter"))].iloc[-1:][cols]]

    g = df[(df["kind"] == "grant") & (df["log_offset"] > last_drop)]
    if len(g):
        last = g.groupby(["grant_object", "privilege"], sort=False,
                         as_index=False).tail(1)
        rows.append(last[last["action"] == "grant"][cols])

    s = df[(df["kind"] == "default_role") & (df["log_offset"] > last_drop)]
    if len(s):
        rows.append(s.iloc[-1:][cols])
    return pd.concat(rows, ignore_index=True).astype(_STATE_DTYPES)


def fold_rbac_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """MANY principals' events → their surviving state rows with ONE set of
    vectorized groupbys (semantics identical to ``fold_rbac_group`` per
    principal — equivalence is test-pinned on randomized logs). The bucket
    is a hash of the principal key, so every principal arrives whole;
    folding per principal via map_groups was one Python call + several
    pandas ops per principal (13 s for ~5k principals at sf0.1) where this
    shape is milliseconds."""
    if not len(df):
        return _empty_state()
    df = df.sort_values("log_offset", kind="stable")
    cols = list(STATE_COLS)
    out: list[pd.DataFrame] = []

    r = df[df["kind"] == "role"]
    if len(r):
        last = r.groupby("rbac_key", sort=False).tail(1)
        out.append(last[last["action"] == "create"][cols])

    u = df[df["kind"] == "user"]
    cd = u[u["action"].isin(("create", "drop"))]
    surv_last = cd.groupby("rbac_key", sort=False).tail(1)
    survivors = set(surv_last.loc[surv_last["action"] == "create",
                                  "rbac_key"])
    if survivors:
        # last DROP per surviving account wipes its older grants/bindings
        drops = (cd[cd["action"] == "drop"]
                 .groupby("rbac_key", sort=False)["log_offset"].max())

        def floor_of(keys: pd.Series) -> pd.Series:
            return keys.map(drops).fillna(-1).astype(np.int64)

        ca = u[u["action"].isin(("create", "alter"))
               & u["rbac_key"].isin(survivors)]
        out.append(ca.groupby("rbac_key", sort=False).tail(1)[cols])

        g = df[(df["kind"] == "grant") & df["rbac_key"].isin(survivors)]
        if len(g):
            g = g[g["log_offset"] > floor_of(g["rbac_key"])]
            last = g.groupby(["rbac_key", "grant_object", "privilege"],
                             sort=False).tail(1)
            out.append(last[last["action"] == "grant"][cols])

        s = df[(df["kind"] == "default_role")
               & df["rbac_key"].isin(survivors)]
        if len(s):
            s = s[s["log_offset"] > floor_of(s["rbac_key"])]
            out.append(s.groupby("rbac_key", sort=False).tail(1)[cols])
    if not out:
        return _empty_state()
    return pd.concat(out, ignore_index=True).astype(_STATE_DTYPES)


_RBAC_BUCKETS = 64


def fold_rbac(events_ds):
    """Normalized RBAC event Dataset → surviving-state Dataset (one hash
    shuffle keyed by principal-bucket; see module doc for the fold rules).
    Bucketing (process-stable pd.util.hash_array, the engine's partition
    hash) keeps principals whole per group while amortizing the per-group
    Python dispatch across ~len/64 principals."""

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        df = prefold_rbac_batch(df)
        b = (pd.util.hash_array(df["rbac_key"].to_numpy(dtype=object))
             % _RBAC_BUCKETS if len(df) else
             np.array([], dtype=np.uint64))
        return df.assign(rbac_bucket=b)

    return (events_ds.map_batches(pre, batch_format="pandas",
                                  batch_size=None)
            .groupby("rbac_bucket")
            .map_groups(fold_rbac_bucket, batch_format="pandas"))


# --- structure-type filter + reconstruction SQL (to_sqls analog) ---

def filter_structure(structure_type: str,
                     do_structures: tuple[str, ...]) -> bool:
    """rdb_filter.rs:126-129: True = filtered OUT. ``*`` keeps all;
    membership otherwise (an empty set drops every structure)."""
    return "*" not in do_structures and structure_type not in do_structures


def rbac_to_sqls(state: pa.Table | pd.DataFrame,
                 do_structures: tuple[str, ...] = ("rbac",),
                 ) -> list[tuple[str, str]]:
    """Surviving state → ordered (key, sql) reconstruction statements
    (pg_create_rbac_statement.rs::to_sqls shape: roles first, then users,
    grants, default-role bindings — dependencies before dependents; the
    whole family gated as StructureType::Rbac)."""
    if filter_structure("rbac", do_structures):
        return []
    df = state.to_pandas() if isinstance(state, pa.Table) else state.copy()
    order = {"role": 0, "user": 1, "grant": 2, "default_role": 3}
    df["_k"] = df["kind"].map(order)
    df = df.sort_values(["_k", "user_name", "host", "role_name",
                         "grant_object", "privilege"], kind="stable")
    sqls: list[tuple[str, str]] = []
    for r in df.itertuples(index=False):
        acct = f"'{r.user_name}'@'{r.host}'"
        if r.kind == "role":
            sqls.append((f"rbac.role.{r.role_name}",
                         f"CREATE ROLE '{r.role_name}'"))
        elif r.kind == "user":
            sql = f"CREATE USER {acct}"
            if r.password:
                sql += f" IDENTIFIED BY '{r.password}'"
            sqls.append((f"rbac.user.{r.user_name}@{r.host}", sql))
        elif r.kind == "grant":
            sql = f"GRANT {r.privilege} ON {r.grant_object} TO {acct}"
            if r.with_grant:
                sql += " WITH GRANT OPTION"
            sqls.append((f"rbac.grant.{r.user_name}@{r.host}."
                         f"{r.grant_object}.{r.privilege}", sql))
        else:
            sqls.append((f"rbac.default_role.{r.user_name}@{r.host}",
                         f"SET DEFAULT ROLE '{r.role_name}' TO {acct}"))
    return sqls
