"""Data check / revise — the ape-dts checker family re-expressed as joins.

Reference semantics (dt-connector/src/sinker/mysql/mysql_checker.rs:71-150,
base_checker.rs:21-83): for every extracted source row, look the target row up
by id cols; absent → ``miss.log``; present but any column differs → ``diff.log``
(JSON lines, routed back through the reverse router). ``revise`` re-applies
the correct source rows; ``review`` re-checks only logged keys
(mysql_check_extractor.rs:52-106).

Ray-Data-first: the keyed lookup becomes ONE partitioned full-outer join —
both sides get the same deterministic ``part_id`` (hash of the PK), are
unioned with a side tag, and each partition is compared with a vectorized
pandas merge inside ``map_groups``. No driver-side loops, no per-key lookups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ape_dts_ray.partition import COL_PART, add_partition_column

# Revise epochs live in their own id band so they can never collide with
# offset-derived replay epoch ids (a later replay would silently skip the
# colliding window). Rows in this band outrank every normal epoch in the LWW
# fold, so revise is TERMINAL for the CDC stream: replay() refuses to run
# while a revise epoch is committed; compact() folds it into base. The
# band's synthetic offsets are EXCLUDED from every watermark computation
# (lake.py owns the constant; re-exported here for the historical import
# path) — otherwise the n fixes' offsets wm+1..wm+n would count as source
# coverage and the next n real CDC events would silently skip.
from ape_dts_ray.state.lake import REVISE_EPOCH_BASE  # noqa: F401 (re-export)

CHECK_MISS = "miss"     # in src, absent from dst
CHECK_DIFF = "diff"     # in both, compared columns differ
CHECK_EXTRA = "extra"   # in dst, absent from src (not emitted by the reference
                        # checker, which only probes src rows; optional here)


def check_datasets(
    src_ds,
    dst_ds,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    compare_cols: tuple[str, ...] = ("role", "text", "tool", "ts"),
    num_partitions: int = 32,
    include_extra: bool = False,
):
    """Full-outer compare of two datasets on ``key_cols``. Returns a Dataset of
    ``key_cols + [check_type]`` rows (empty when the tables match)."""
    # a compare col missing on one side must be null-padded with the type
    # the OTHER side carries, or the union fails on mismatched schemas —
    # peek both schemas once (lazy metadata fetch)
    col_types: dict[str, pa.DataType] = {}
    for ds in (src_ds, dst_ds):
        sch = ds.schema()
        if sch is None:                    # empty side (e.g. no defect rows)
            continue
        for name, typ in zip(sch.names, sch.types):
            col_types.setdefault(name, typ)

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            # canonical (*key_cols, *compare_cols) COLUMN ORDER on both
            # sides, padding missing compare cols in place — appending at
            # the end gave the two sides different block layouts through
            # union (correct by-name today, but positionally fragile and a
            # per-block executor schema warning)
            arrays, names = [], []
            for c in (*key_cols, *compare_cols):
                if c in t.column_names:
                    arrays.append(t.column(c))
                else:
                    arrays.append(pa.nulls(t.num_rows,
                                           col_types.get(c, pa.string())))
                names.append(c)
            arrays.append(pa.array(np.full(t.num_rows, side, dtype=object),
                                   type=pa.string()))
            names.append("_side")
            return pa.table(dict(zip(names, arrays)))
        return fn

    # co-partition both sides by the ACTUAL merge key (generic key_cols —
    # the transcript defaults would KeyError or, worse, split equal keys
    # across partitions and report false misses)
    part_col, salt_col = key_cols[0], key_cols[-1]
    src = src_ds.map_batches(tag("src"), batch_format="pyarrow")
    dst = dst_ds.map_batches(tag("dst"), batch_format="pyarrow")
    both = src.union(dst).map_batches(
        lambda t: add_partition_column(t, num_partitions,
                                       conv_col=part_col, turn_col=salt_col),
        batch_format="pyarrow")

    kc, cc = list(key_cols), list(compare_cols)

    def compare(group: pd.DataFrame) -> pd.DataFrame:
        s = group[group["_side"] == "src"]
        d = group[group["_side"] == "dst"]
        m = s.merge(d, on=kc, how="outer", suffixes=("_s", "_d"), indicator=True)
        out = []
        miss = m[m["_merge"] == "left_only"]
        if len(miss):
            out.append(miss[kc].assign(check_type=CHECK_MISS))
        bothm = m[m["_merge"] == "both"]
        if len(bothm):
            neq = np.zeros(len(bothm), dtype=bool)
            for c in cc:
                a, b = bothm[f"{c}_s"], bothm[f"{c}_d"]
                neq |= ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                out.append(bothm.loc[neq, kc].assign(check_type=CHECK_DIFF))
        if include_extra:
            extra = m[m["_merge"] == "right_only"]
            if len(extra):
                out.append(extra[kc].assign(check_type=CHECK_EXTRA))
        if not out:
            return pd.DataFrame({c: pd.Series(dtype=group[c].dtype) for c in kc}
                                | {"check_type": pd.Series(dtype=object)})
        return pd.concat(out, ignore_index=True)

    return both.groupby(COL_PART).map_groups(compare, batch_format="pandas")


def write_check_logs(check_ds, out_dir: str) -> dict[str, int]:
    """Persist check results as ``miss.log`` / ``diff.log`` / ``extra.log``
    JSONL — the check/miss.log, check/diff.log layout of the reference
    (docs/en/snapshot/check.md). Returns per-type counts."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    for stale in (CHECK_MISS, CHECK_DIFF, CHECK_EXTRA):
        # a re-check into the same out_dir must not leave a previous run's
        # log reporting already-fixed defects: types absent THIS run never
        # open (mode 'w') their file, so remove all three up front
        try:
            os.remove(os.path.join(out_dir, f"{stale}.log"))
        except FileNotFoundError:
            pass
    counts: dict[str, int] = {}
    files: dict[str, object] = {}
    try:
        # streamed, not take_all(): a fully-diverged table makes the defect
        # set as large as the table itself — never hold it on the driver
        for batch in check_ds.iter_batches(batch_format="pandas"):
            for t, grp in batch.groupby("check_type", sort=False):
                if t not in files:
                    files[t] = open(os.path.join(out_dir, f"{t}.log"), "w")
                f = files[t]
                for r in grp.drop(columns=["check_type"]).to_dict("records"):
                    f.write(json.dumps(r, default=str, sort_keys=True) + "\n")
                counts[t] = counts.get(t, 0) + len(grp)
    finally:
        for f in files.values():
            f.close()
    return counts


MAX_DEFECT_KEYS = 1_000_000   # review/revise broadcast the defect key set to
                              # every task; a fully-diverged table would make
                              # it the whole table — fail fast instead of
                              # OOMing the driver (split the repair instead)


def _defect_rows(check_ds, max_defects: int) -> list[dict]:
    rows = check_ds.take_all(limit=max_defects)
    return rows


def _keyset_pick(bad: list[dict], key_cols: tuple[str, ...]):
    """Broadcast semi-join filter for the logged defect keys, shared by
    review() and revise() (one implementation so a fix to the string-cast
    key match can never drift between them). Separator is \x1f (unit
    separator) — NUL would be silently truncated by numpy/pandas
    fixed-width string paths. Returns a generator UDF for map_batches."""
    keyset = {"\x1f".join(str(r[c]) for c in key_cols) for r in bad}
    kc = list(key_cols)

    def pick(t: pa.Table):      # generator UDF: empty matches yield nothing
        if t.num_rows == 0 or kc[0] not in t.column_names:
            return
        df = t.to_pandas()
        combined = df[kc[0]].astype(str)
        for c in kc[1:]:
            combined = combined + "\x1f" + df[c].astype(str)
        picked = df[combined.isin(keyset)]
        if not picked.empty:
            yield pa.Table.from_pandas(picked, preserve_index=False)

    return pick


def review(src_ds, dst_ds, check_ds,
           key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
           compare_cols: tuple[str, ...] = ("role", "text", "tool", "ts"),
           num_partitions: int = 32, max_defects: int = MAX_DEFECT_KEYS,
           include_extra: bool = False):
    """Re-check ONLY the keys named in a previous check result — the review
    task (check-log extractor → check sinker, mysql_check_extractor.rs:52-106).
    Both sides are pre-filtered to the logged keys (broadcast semi-join), then
    compared with the normal checker; returns the remaining defects.

    Raises if the defect set exceeds ``max_defects`` (broadcast-size guard)."""
    bad = _defect_rows(check_ds, max_defects)
    pick = _keyset_pick(bad, key_cols)

    return check_datasets(
        src_ds.map_batches(pick, batch_format="pyarrow"),
        dst_ds.map_batches(pick, batch_format="pyarrow"),
        key_cols=key_cols, compare_cols=compare_cols,
        num_partitions=num_partitions, include_extra=include_extra)


def revise(lake, src_ds, check_ds,
           key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
           max_defects: int = MAX_DEFECT_KEYS) -> int:
    """Re-apply source truth for every miss/diff key (revise task analog:
    check_log extractor → write sinker). Returns #keys revised.

    The fix is applied as a synthetic epoch of insert events above the current
    watermark, so it flows through the normal exactly-once apply path. The
    epoch id comes from the reserved revise band (REVISE_EPOCH_BASE) — see the
    band's comment: revise is terminal until the next compact().

    Raises if the defect set exceeds ``max_defects`` (broadcast-size guard)."""
    import pyarrow.compute as pc

    from ape_dts_ray.pipelines.replay import EpochWindow, replay_window

    bad = _defect_rows(check_ds, max_defects)
    bad = [r for r in bad if r["check_type"] in (CHECK_MISS, CHECK_DIFF)]
    if not bad:
        return 0
    # broadcast the (small) defect key set; semi-join filter inside
    # map_batches (_keyset_pick — shared with review())
    pick = _keyset_pick(bad, key_cols)
    kc = list(key_cols)

    # The fix rows (incl. wide text payload) STAY a Dataset — only the
    # G per-group row counts land on the driver. Offsets must be the same
    # contiguous, deterministic wm+1..wm+n as a driver-side enumerate would
    # give (delta-file byte determinism for resume), so: group fixes by a
    # stable key hash, count per group (tiny), then assign
    # base[g] + rank-within-group-sorted-by-key inside map_groups.
    from ape_dts_ray.partition import hash_strings

    G = 64

    def tag_group(t: pa.Table) -> pa.Table:
        drop = [c for c in ("log_offset", "seq", "op", "_epoch", "part_id")
                if c in t.column_names]
        t = t.drop_columns(drop)
        combined = pd.Series(
            t.column(kc[0]).cast(pa.string()).to_numpy(zero_copy_only=False))
        for c in kc[1:]:
            combined = combined + "\x1f" + pd.Series(
                t.column(c).cast(pa.string()).to_numpy(zero_copy_only=False))
        g = (hash_strings(combined.to_numpy()) % np.uint64(G)).astype(np.int32)
        return t.append_column("_g", pa.array(g, type=pa.int32()))

    fixes = (src_ds.map_batches(pick, batch_format="pyarrow")
             .map_batches(tag_group, batch_format="pyarrow")
             .materialize())
    counts = {int(r["_g"]): int(r["count()"])
              for r in fixes.groupby("_g").count().take_all()}
    n = sum(counts.values())
    if n == 0:
        return 0
    wm = lake.watermark()
    base = {}
    acc = wm + 1
    for g in sorted(counts):
        base[g] = acc
        acc += counts[g]

    def assign(t: pa.Table) -> pa.Table:
        g = int(t.column("_g")[0].as_py())
        idx = pa.Table.from_arrays(
            [t.column(c).cast(pa.string()) for c in kc], names=kc)
        import polars as pl

        order = pl.from_arrow(idx).with_row_index("_r").sort(kc)["_r"].to_numpy()
        t = t.drop_columns(["_g"]).take(pa.array(order))
        m = t.num_rows
        t = t.append_column("log_offset", pa.array(
            np.arange(base[g], base[g] + m, dtype=np.int64)))
        return t.append_column("op", pa.array(
            np.full(m, "insert", dtype=object), type=pa.string()))

    ev_ds = fixes.groupby("_g").map_groups(assign, batch_format="pyarrow")
    prior = [e for e in lake.committed_epochs() if e >= REVISE_EPOCH_BASE]
    epoch = (max(prior) + 1) if prior else REVISE_EPOCH_BASE
    w = EpochWindow(epoch=epoch, lo=wm + 1, hi=wm + n, schema_version=lake.schema_version)
    m = replay_window(lake, w, events_ds=ev_ds)
    lake.commit_epoch(m)
    # rows actually re-applied — a logged key whose source row vanished
    # between check and revise is NOT counted (callers use this to decide
    # whether a re-check is needed)
    return n
