"""Precheck — the dt-precheck analog (dt-precheck/src/prechecker/
mysql_prechecker.rs:40-256: connectivity / version / permission / structure
checks run before a task starts; dt-main routes a precheck config to
``do_precheck`` before ever building a task, main.rs:24-30).

Our environment's equivalents: the event-log source is readable and carries
the engine's required columns with sane types; offsets are unique (sampled);
primary-key columns are non-null where required; the lake directory is
writable and its persisted config is self-consistent. Each check returns a
``CheckResult`` and ``precheck()`` aggregates them — callers abort before
replay on any failed check, like the reference interrupts on precheck errors.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from ape_dts_ray.meta import COL_OFFSET, COL_OP, OPS

REQUIRED_EVENT_COLS = {
    COL_OFFSET: (pa.int64(),),
    COL_OP: (pa.string(), pa.large_string()),
    "conv_id": (pa.string(), pa.large_string()),
    "turn_idx": (pa.int32(), pa.int64()),
}


@dataclass
class CheckResult:
    name: str
    ok: bool
    detail: str = ""


def check_event_source(paths: str | list[str],
                       sample_rows: int = 100_000) -> list[CheckResult]:
    paths = [paths] if isinstance(paths, str) else list(paths)
    out = []
    try:
        f = pq.ParquetFile(paths[0])
        schema = f.schema_arrow
        out.append(CheckResult("source_readable", True, paths[0]))
    except Exception as e:  # noqa: BLE001 — precheck reports, never raises
        return [CheckResult("source_readable", False, repr(e))]

    for col, types in REQUIRED_EVENT_COLS.items():
        idx = schema.get_field_index(col)
        if idx < 0:
            out.append(CheckResult(f"column:{col}", False, "missing"))
        elif schema.field(idx).type not in types:
            out.append(CheckResult(
                f"column:{col}", False,
                f"type {schema.field(idx).type} not in {types}"))
        else:
            out.append(CheckResult(f"column:{col}", True))

    # the column/type check is footer-only (cheap) — run it over EVERY
    # file: a later segment written by an older producer (missing op, or a
    # mistyped key column) previously passed precheck on file 0's schema
    # and crashed replay deep inside a Ray task. Row sampling stays
    # first-file-only (documented trade-off).
    for p in paths[1:]:
        try:
            sch = pq.ParquetFile(p).schema_arrow
        except Exception as e:  # noqa: BLE001
            out.append(CheckResult("source_readable", False,
                                   f"{p}: {e!r}"))
            continue
        for col, types in REQUIRED_EVENT_COLS.items():
            idx = sch.get_field_index(col)
            if idx < 0:
                out.append(CheckResult(f"column:{col}", False,
                                       f"missing in {p}"))
            elif sch.field(idx).type not in types:
                out.append(CheckResult(
                    f"column:{col}", False,
                    f"{p}: type {sch.field(idx).type} not in {types}"))

    if all(r.ok for r in out):
        sample = f.read_row_group(0).slice(0, sample_rows) \
            if f.metadata.num_row_groups else schema.empty_table()
        if sample.num_rows:
            import pyarrow.compute as pc
            offs = sample.column(COL_OFFSET)
            uniq = pc.count_distinct(offs).as_py() == sample.num_rows
            out.append(CheckResult("offsets_unique_sample", uniq,
                                   "" if uniq else "duplicate offsets in sample"))
            for col in ("conv_id", "turn_idx"):
                nulls = sample.column(col).null_count
                out.append(CheckResult(f"pk_non_null:{col}", nulls == 0,
                                       f"{nulls} nulls" if nulls else ""))
            badop = sample.filter(
                pc.invert(pc.is_in(sample.column(COL_OP),
                                   value_set=pa.array(OPS)))).num_rows
            out.append(CheckResult("op_alphabet", badop == 0,
                                   f"{badop} invalid ops" if badop else ""))
    return out


def check_lake(root: str) -> list[CheckResult]:
    out = []
    table_file = os.path.join(root, "_table.json")
    if not os.path.exists(table_file):
        return [CheckResult("lake_exists", False, f"no {table_file}")]
    out.append(CheckResult("lake_exists", True))
    try:
        from ape_dts_ray.state.lake import LakeTable
        lake = LakeTable.open(root)
        out.append(CheckResult("lake_config", lake.config.num_partitions > 0,
                               f"P={lake.config.num_partitions}"))
        probe = os.path.join(root, "_manifests", ".precheck")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
        out.append(CheckResult("lake_writable", True))
    except Exception as e:  # noqa: BLE001
        out.append(CheckResult("lake_open", False, repr(e)))
    return out


def estimate_events(paths: str | list[str]) -> dict:
    """Planning metric from footer metadata only (the reference's
    ``estimate_record_count``, dt-task/src/task_runner.rs:183-188): event
    count, offset span, and average event bytes — the inputs
    ``suggest_epoch_config`` sizes windows from, without reading any data."""
    paths = [paths] if isinstance(paths, str) else list(paths)
    rows, bytes_, mn, mx = 0, 0, None, None
    for p in paths:
        f = pq.ParquetFile(p)
        md = f.metadata
        rows += md.num_rows
        ci = f.schema_arrow.get_field_index(COL_OFFSET)
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            bytes_ += g.total_byte_size
            # ci == -1 (no log_offset column) would silently index the LAST
            # column; stats may also be absent (write_statistics=False) —
            # both leave mn/mx None and check_plan REPORTS instead of raising
            st = g.column(ci).statistics if ci >= 0 else None
            if st is not None and st.min is not None:
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
    return {"events": rows, "offset_min": mn, "offset_max": mx,
            "avg_event_bytes": (bytes_ // rows) if rows else 0}


def check_plan(paths: str | list[str], epoch_size: int) -> list[CheckResult]:
    """Window-plan sanity from the planning estimate: the offset span must be
    dense enough that epochs aren't mostly empty, and the epoch byte volume
    should respect the group-size memory rule (suggest_epoch_config)."""
    from ape_dts_ray.pipelines.replay import suggest_epoch_config

    est = estimate_events(paths)
    if not est["events"]:
        return [CheckResult("plan_nonempty", False, "no events")]
    if est["offset_max"] is None:
        # a reporting check must not raise: missing log_offset column or
        # footer statistics means the plan can't be sized from metadata
        return [CheckResult(
            "plan_offset_stats", False,
            "no log_offset footer statistics (column missing or "
            "write_statistics disabled) — cannot size epoch windows")]
    span = est["offset_max"] - est["offset_min"] + 1
    density = est["events"] / span
    sug = suggest_epoch_config(est["avg_event_bytes"])
    epoch_bytes = epoch_size * est["avg_event_bytes"]
    return [
        CheckResult("plan_offset_density", density >= 0.01,
                    f"{est['events']} events over span {span} "
                    f"(density {density:.3f})"),
        CheckResult("plan_epoch_bytes", epoch_bytes <= (1 << 31),
                    f"epoch {epoch_size} × {est['avg_event_bytes']}B ≈ "
                    f"{epoch_bytes >> 20}MiB (suggested epoch_size="
                    f"{sug['epoch_size']})"),
    ]


def check_constraints(lake_root: str, events_path: str | list[str],
                      sample_rows: int = 100_000) -> list[CheckResult]:
    """Sampled source validation of the lake's persisted constraint
    descriptors (structure_type.rs NOT-NULL/UNIQUE subset): non-delete
    events must satisfy NOT-NULL columns; declared unique col-sets must not
    repeat within the sample. Sampled (first row group) — the hard
    enforcement point is load_snapshot; this catches misdeclared sources
    before a task starts, like the reference's structure prechecks."""
    import pyarrow.compute as pc

    from ape_dts_ray.state.lake import LakeTable

    lake = LakeTable.open(lake_root)
    # unique-kind INDEXES are enforced exactly like unique constraints;
    # unique_column_sets() is the one source of that mapping, deduped here
    # so a col-set declared as both constraint and index is checked once
    checks = [c for c in lake.constraints if c["type"] != "unique"]
    checks += [{"type": "unique", "cols": list(cols)}
               for cols in dict.fromkeys(lake.unique_column_sets())]
    if not checks:
        return [CheckResult("constraints", True, "none declared")]
    paths = [events_path] if isinstance(events_path, str) else list(events_path)
    f = pq.ParquetFile(paths[0])
    sample = (f.read_row_group(0).slice(0, sample_rows)
              if f.metadata.num_row_groups else f.schema_arrow.empty_table())
    if COL_OP in sample.column_names:    # deletes carry no after-image
        sample = sample.filter(
            pc.not_equal(sample.column(COL_OP), pa.scalar("delete")))
    out = []
    for c in checks:
        if c["type"] == "not_null":
            col = c["col"]
            if col not in sample.column_names:
                out.append(CheckResult(f"not_null:{col}", False,
                                       "column missing from source"))
                continue
            nulls = sample.column(col).null_count
            out.append(CheckResult(f"not_null:{col}", nulls == 0,
                                   f"{nulls} nulls in sample" if nulls else ""))
        else:
            cols = [x for x in c["cols"] if x in sample.column_names]
            label = f"unique:{','.join(c['cols'])}"
            if len(cols) != len(c["cols"]):
                out.append(CheckResult(label, False,
                                       "column missing from source"))
                continue
            # last-writer state is what the constraint governs — count
            # distinct FINAL keys vs distinct constraint tuples among the
            # latest event per PK in the sample
            latest = sample
            if COL_OFFSET in sample.column_names:
                import polars as pl
                latest = (pl.from_arrow(sample)
                          .sort(COL_OFFSET)
                          .unique(subset=list(lake.meta.id_cols), keep="last")
                          .to_arrow())
            # SQL UNIQUE permits multiple NULLs (MySQL/PG) — drop tuples
            # with any NULL component before counting duplicates
            tuples = latest.select(cols)
            valid = pc.is_valid(tuples.column(cols[0]))
            for c2 in cols[1:]:
                valid = pc.and_(valid, pc.is_valid(tuples.column(c2)))
            tuples = tuples.filter(valid)
            grp = tuples.group_by(cols).aggregate([([], "count_all")])
            dups = pc.sum(pc.greater(grp.column("count_all"),
                                     pa.scalar(1))).as_py() or 0
            out.append(CheckResult(label, dups == 0,
                                   f"{dups} duplicated tuples in sample"
                                   if dups else ""))
    return out


def precheck(lake_root: str | None = None,
             events_path: str | list[str] | None = None,
             epoch_size: int | None = None) -> list[CheckResult]:
    out = []
    if events_path is not None:
        out += check_event_source(events_path)
        if epoch_size is not None:
            out += check_plan(events_path, epoch_size)
    if lake_root is not None:
        out += check_lake(lake_root)
        if events_path is not None:
            try:
                out += check_constraints(lake_root, events_path)
            except Exception as e:  # noqa: BLE001 — precheck reports
                out.append(CheckResult("constraints", False, repr(e)))
    return out


def assert_precheck(lake_root=None, events_path=None) -> None:
    results = precheck(lake_root, events_path)
    failed = [r for r in results if not r.ok]
    if failed:
        raise RuntimeError("precheck failed: " +
                           "; ".join(f"{r.name} ({r.detail})" for r in failed))
