"""The Parquet lake table: layout, commit/watermark API, merge-on-read state,
compaction.

Layout (one directory per logical table — the "table = unit of state" rule,
SURVEY §1.3; resumable because every file is addressed by (epoch, partition)):

    <root>/
      _table.json                     # TableMeta + partitioning config + schema version
      _manifests/epoch-%08d.json      # committed-epoch manifests (state/manifest.py)
      base/part-%05d.parquet          # compacted state, _epoch = -1 sort rank
      delta/epoch-%08d/part-%05d.parquet

Visibility rule: a delta file exists physically once its apply task finished,
but is readable only if its epoch's manifest is committed — uncommitted epochs
are invisible, so a crashed replay resumes by re-running the first uncommitted
epoch and deterministically overwriting its orphan files (exactly-once; see
state/manifest.py docstring for the reference citations).

Merge-on-read: live state of a partition = LWW fold of base + committed deltas
ordered by (_epoch, log_offset, seq) — stages/merge.py ``fold_state``.
Compaction (the FoxlakeMerger analog, foxlake_merger.rs:82-104) folds sealed
deltas into base and deletes them; it is also the only boundary where the
hot-key salt set may change (ape_dts_ray/partition.py docstring).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ape_dts_ray.meta import COL_EPOCH, COL_OFFSET, COL_OP, COL_SEQ, EngineConfig, TableMeta
from ape_dts_ray.state.manifest import (
    EpochManifest,
    atomic_write_parquet,
    atomic_write_text,
)
from ape_dts_ray.stages import merge as merge_mod

MANIFEST_DIR = "_manifests"
TABLE_FILE = "_table.json"


def _dbg(event: str, **kw) -> None:
    """Append-only forensic trace, active only when APE_DEBUG_LOG is set —
    one JSON line per maintenance/commit mutation so a diverged randomized
    soak can be autopsied (single O_APPEND write stays atomic per line)."""
    path = os.environ.get("APE_DEBUG_LOG")
    if not path:
        return
    import time as _time
    try:
        rec = {"t": round(_time.time(), 4), "pid": os.getpid(), "ev": event}
        rec.update(kw)
        with open(path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")
    except OSError:
        pass
# Reserved epoch band for checker.revise() fixes: ids at/above this are
# synthetic (not source-log coverage). Owned here so watermark computations
# can exclude them without importing pipeline modules (checker re-exports).
REVISE_EPOCH_BASE = 1 << 40


# Parquet footer metadata key carrying a base file's fold coverage: the max
# source offset whose effects the file is guaranteed to contain. The stamp is
# the anti-regression guard for CONCURRENT COMPACTORS: two compact() calls
# with different snapshots race per-partition base writes, and the stale one
# landing last silently erases the newer fold's rows AFTER the newer run
# GC'd the deltas (reproduced by the randomized soak, seed 1050803233 —
# partition base capped at 79999 under a published watermark of 97999).
# Folds consume epoch PREFIXES, so a higher stamp always means a superset
# fold; writers refuse to replace a base whose stamp exceeds their own.
BASE_STAMP_KEY = b"ape_folded_wm"


class MaintenanceInProgress(RuntimeError):
    """A replay plan or epoch commit raced a maintenance marker (hot-key
    rotation / truncate in flight, or the placement generation moved under
    an in-flight chunk). TRANSIENT by construction: the maintenance op
    completes on its own and the identical replay call then succeeds —
    unlike every other RuntimeError in this module, nothing is wrong with
    the caller's inputs or the lake. Subclasses RuntimeError so one-shot
    callers keep the loud-refusal contract; the follow daemons catch
    exactly this type to defer the round and retry, bounded by a grace
    window so a CRASHED maintenance op (marker left behind, which only an
    operator's re-run clears) still surfaces loudly."""


def _base_stamp(path: str) -> int:
    """Fold-coverage stamp of a base file (-1 for absent or legacy unstamped
    files — those are always an INPUT of whatever fold replaces them, so any
    write may proceed over them)."""
    try:
        md = pq.read_schema(path).metadata
    except (FileNotFoundError, OSError):
        return -1
    if md and BASE_STAMP_KEY in md:
        try:
            return int(md[BASE_STAMP_KEY])
        except ValueError:
            return -1
    return -1


def _stamped(t: "pa.Table", wm: int) -> "pa.Table":
    md = dict(t.schema.metadata or {})
    md[BASE_STAMP_KEY] = str(int(wm)).encode()
    return t.replace_schema_metadata(md)


def _proc_start(pid) -> int | None:
    """Process start time in clock ticks (/proc/<pid>/stat field 22) — the
    pid-reuse guard for the maintenance lock. None = no such process (or no
    /proc, where liveness degrades to a bare kill-0 probe)."""
    if not pid:
        return None
    try:
        with open(f"/proc/{int(pid)}/stat", "rb") as f:
            data = f.read()
        # comm (field 2) may contain spaces/parens — split after the LAST ')'
        return int(data.rsplit(b") ", 1)[1].split()[19])
    except (FileNotFoundError, ProcessLookupError, PermissionError,
            IndexError, ValueError, OSError):
        return None


def _pid_alive(pid, start) -> bool:
    if not pid:
        return False
    s = _proc_start(pid)
    if s is not None:
        return start is None or s == start
    # no /proc entry readable: fall back to signal-0 (non-Linux)
    try:
        os.kill(int(pid), 0)
        return True
    except (ProcessLookupError, ValueError):
        return False
    except PermissionError:
        return True


def _retry_vanished_files(fn, attempts: int = 4):
    """Run ``fn`` (which must RE-LIST its input files on every call), retrying
    when a listed file vanishes between the exists() check and the read.

    This is the reader/compactor race: a concurrent (or SIGKILL-orphaned)
    compactor worker unlinks a consumed delta only AFTER its replacement base
    is durable (publish-before-unlink, compact()/ _compact_partial docstrings),
    so any vanished file is already folded into the base a fresh listing
    picks up — re-folding the fresh listing yields identical LWW winners.
    Bounded PER FILE: only the SAME file vanishing ``attempts`` times in a
    row propagates (a repeated vanish with no durable replacement base is
    real corruption); the budget resets when the failing path changes, so
    sustained compaction churn across MANY deltas — each vanish individually
    benign — cannot exhaust it. A hard total cap keeps the loop finite."""
    import time as _time

    last, tries, total = None, 0, 0
    while True:
        try:
            return fn()
        except FileNotFoundError as e:
            path = e.filename or str(e)
            tries = tries + 1 if path == last else 1
            last = path
            total += 1
            if tries >= attempts or total >= attempts * 16:
                raise
            _time.sleep(0.05 * tries)


def _cluster_sorted(t: "pa.Table", cols: list[str]) -> "pa.Table":
    """Sort a folded partition by the clustering key (cluster_sort_cols) so
    base-file row groups carry tight min/max stats on the indexed columns.
    Columns renamed away by schema_ops are skipped; the id-col tiebreak
    keeps the order total → byte-deterministic across re-folds."""
    keys = [(c, "ascending") for c in cols if c in t.column_names]
    return t.sort_by(keys) if keys else t


class LakeTable:
    def __init__(self, root: str, meta: TableMeta, config: EngineConfig,
                 schema_version: int = 0,
                 schema_ops: list[dict] | None = None):
        self.root = root
        self.meta = meta
        self.config = config
        self.schema_version = schema_version
        # non-additive evolution ops (stages/merge.py::apply_schema_ops) —
        # persisted so merge-on-read maps old-era files after a restart
        self.schema_ops: list[dict] = list(schema_ops or [])
        # highest offset consumed by a TRUNCATE (-1 = never truncated):
        # replay permanently drops events at or below it — without this, a
        # straddling epoch window would resurrect pre-truncate history
        self.truncate_offset: int = -1
        # monotonic counter bumped by every hot-key rotation: partition
        # placement is a pure function of (num_partitions, hot_keys), and a
        # LONG-LIVED LakeTable instance (a follower daemon) that keeps its
        # stale in-memory hot set after an EXTERNAL rotation completes
        # would place rotated keys at their old-salt partition while the
        # rotated base holds them at the new one — both fold, duplicating
        # the key (caught by the maintenance soak, seed 274662159). replay
        # refreshes from disk at plan time and commits verify the gen.
        self.placement_gen: int = 0
        # constraint descriptors (structure_type.rs:5-24 subset — the
        # reference migrates constraints/indexes as structures; a Parquet
        # lake has no indexes, but NOT-NULL/UNIQUE descriptors feed
        # precheck and snapshot-load validation): list of
        # {"type": "not_null", "col": c} | {"type": "unique", "cols": [...]}
        self.constraints: list[dict] = []
        # sequence descriptors (structure/sequence.rs analog): the migration
        # handoff step is "setval to max" so the target keeps inserting —
        # here advance_sequences() computes next_value from the live state.
        # {"name", "col", "increment"?: 1, "start_value"?: 1, "next_value"}
        self.sequences: list[dict] = []
        # comment descriptors (structure/comment.rs analog): surfaced as
        # Arrow schema/field metadata so they ride INSIDE the Parquet files.
        # {"type": "table"|"column", "column"?: c, "comment": str}
        self.comments: list[dict] = []
        # index descriptors (structure/index.rs analog: name, columns,
        # IndexKind Unique/FullText/Spatial/plain-Btree=""). A Parquet lake
        # has no live B-tree, so an index means two real things here:
        # "unique" kinds are ENFORCED like unique constraints (precheck +
        # load_snapshot), and the FIRST index is the CLUSTERING key —
        # compact() sorts each partition's base file by it, so Parquet
        # row-group min/max stats prune reads on those columns (the lake
        # analog of what a B-tree buys a server).
        # {"name": n, "cols": [...], "kind": ""|"unique"|"fulltext"|"spatial"}
        self.indexes: list[dict] = []

    # ---------- lifecycle ----------
    @classmethod
    def create(cls, root: str, meta: TableMeta | None = None,
               config: EngineConfig | None = None,
               if_exists: str = "error") -> "LakeTable":
        """Structure-migration analog (struct sinkers' conflict policy,
        mysql_struct_sinker.rs / struct/config ConflictPolicy ignore|interrupt):
        ``if_exists`` = "error" (interrupt) | "ignore" (open existing) |
        "overwrite"."""
        meta = meta or TableMeta()
        config = config or EngineConfig()
        if if_exists not in ("error", "ignore", "overwrite"):
            # validated BEFORE the exists() branch: a typo'd mode must fail
            # on the first (fresh-path) run, not surface later as an
            # unexplained FileExistsError
            raise ValueError(f"invalid if_exists: {if_exists!r}")
        if os.path.exists(os.path.join(root, TABLE_FILE)):
            if if_exists == "ignore":
                return cls.open(root)
            if if_exists == "overwrite":
                shutil.rmtree(root)
            else:
                raise FileExistsError(f"lake table already exists at {root}")
        os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(root, "base"), exist_ok=True)
        os.makedirs(os.path.join(root, "delta"), exist_ok=True)
        t = cls(root, meta, config)
        t._save_table_json()
        return t

    @classmethod
    def open(cls, root: str) -> "LakeTable":
        with open(os.path.join(root, TABLE_FILE)) as f:
            d = json.load(f)
        meta = TableMeta(
            name=d["name"], id_cols=tuple(d["id_cols"]),
            partition_col=d["partition_col"], order_cols=tuple(d["order_cols"]),
            payload_cols=tuple(d["payload_cols"]))
        cfg = EngineConfig(num_partitions=d["num_partitions"],
                           epoch_size=d.get("epoch_size", EngineConfig.epoch_size),
                           batch_size=d.get("batch_size", EngineConfig.batch_size),
                           hot_keys=tuple(d.get("hot_keys", ())))
        t = cls(root, meta, cfg, schema_version=d.get("schema_version", 0),
                schema_ops=d.get("schema_ops", []))
        t.truncate_offset = d.get("truncate_offset", -1)
        t.placement_gen = d.get("placement_gen", 0)
        t.constraints = d.get("constraints", [])
        t.sequences = d.get("sequences", [])
        t.comments = d.get("comments", [])
        t.indexes = d.get("indexes", [])
        return t

    def _save_table_json(self) -> None:
        d = {
            "name": self.meta.name, "id_cols": list(self.meta.id_cols),
            "partition_col": self.meta.partition_col,
            "order_cols": list(self.meta.order_cols),
            "payload_cols": list(self.meta.payload_cols),
            "num_partitions": self.config.num_partitions,
            # epoch planning must replay identically after a driver restart —
            # resume skips by epoch id, so window boundaries are persisted state
            "epoch_size": self.config.epoch_size,
            "batch_size": self.config.batch_size,
            "hot_keys": list(self.config.hot_keys),
            "schema_version": self.schema_version,
            "schema_ops": self.schema_ops,
            "truncate_offset": self.truncate_offset,
            "placement_gen": self.placement_gen,
            "constraints": self.constraints,
            "sequences": self.sequences,
            "comments": self.comments,
            "indexes": self.indexes,
        }
        atomic_write_text(os.path.join(self.root, TABLE_FILE),
                          json.dumps(d, indent=1, sort_keys=True))

    # ---------- paths ----------
    def delta_path(self, epoch: int, part_id: int) -> str:
        return os.path.join(self.root, "delta", f"epoch-{epoch:08d}",
                            f"part-{part_id:05d}.parquet")

    def base_path(self, part_id: int) -> str:
        return os.path.join(self.root, "base", f"part-{part_id:05d}.parquet")

    def manifest_path(self, epoch: int) -> str:
        return os.path.join(self.root, MANIFEST_DIR, f"epoch-{epoch:08d}.json")

    # ---------- commit protocol ----------
    def committed_epochs(self) -> list[int]:
        mdir = os.path.join(self.root, MANIFEST_DIR)
        out = []
        for f in os.listdir(mdir):
            if f.startswith("epoch-") and f.endswith(".json"):
                out.append(int(f[len("epoch-"):-len(".json")]))
        return sorted(out)

    def read_manifest(self, epoch: int) -> EpochManifest:
        with open(self.manifest_path(epoch)) as f:
            return EpochManifest.from_json(f.read())

    def committed_watermark(self) -> int:
        """Highest committed SOURCE log offset (position.log analog). -1 if
        none. Revise-band epochs (>= REVISE_EPOCH_BASE) are EXCLUDED: their
        offsets are synthetic (checker.revise squats wm+1..wm+n) — counting
        them as source coverage would make the next n real CDC events plan
        as already-consumed and silently skip. Retried list-then-read:
        followers poll this every round while a concurrent compactor may
        fold the tail manifest away — a fresh listing sees the
        post-compaction epochs."""

        def body() -> int:
            epochs = [e for e in self.committed_epochs()
                      if e < REVISE_EPOCH_BASE]
            if not epochs:
                return -1
            return self.read_manifest(epochs[-1]).offset_max

        return _retry_vanished_files(body)

    def refresh_placement(self) -> int:
        """Re-read the PERSISTED placement state (hot-key salt set, placement
        generation, truncate floor) into this instance and return the
        generation. A long-lived instance (follower daemon) calls this at
        every replay plan: an EXTERNAL rotation that completed since the
        instance was opened changed where hot keys live, and planning with
        the stale in-memory salt would double-place them (old-salt delta +
        new-salt base both fold the key)."""
        with open(os.path.join(self.root, TABLE_FILE)) as f:
            d = json.load(f)
        self.config.hot_keys = tuple(d.get("hot_keys", ()))
        self.placement_gen = d.get("placement_gen", 0)
        self.truncate_offset = max(self.truncate_offset,
                                   d.get("truncate_offset", -1))
        return self.placement_gen

    def commit_epoch(self, manifest: EpochManifest,
                     schema_version: int | None = None,
                     expect_placement_gen: int | None = None) -> None:
        """Atomically publish an epoch (tmp+rename). Idempotent: re-committing
        an already-committed epoch with identical deterministic content is a
        no-op overwrite (duplicate replays deduped by epoch id —
        foxlake_parallelizer.rs:99-121 analog).

        Refuses while a rotation/truncate marker is present: replay()'s
        plan-time refusal leaves a window where an in-flight chunk commits
        AFTER the marker appeared — an epoch the rotation/truncate snapshot
        never saw, carrying old-salt placements the new base can't fold.
        The refusal turns that silent divergence into a crash; re-running
        replay after the maintenance op re-applies the chunk (delta file
        names are deterministic, the overwrite converges).

        ``expect_placement_gen`` closes the marker check's blind spot: a
        rotation that STARTED AND FINISHED entirely inside this chunk's
        apply window leaves no marker at commit time, yet the chunk's rows
        were placed under the pre-rotation salt. Callers pass the
        generation they planned under; a moved generation refuses the same
        way (re-running replay re-plans under the new salt).

        The manifest is the SOURCE OF TRUTH for the epoch dir's contents:
        any file in the dir the manifest doesn't list is removed before
        publishing. partition_files() is existence-based, so a stale file
        would otherwise fold into reads forever — concretely, an
        interrupted chunk's delta written under the OLD salt survives a
        rotation (the rotation GCs only its committed-epoch snapshot) and
        the re-placed re-run only overwrites partitions it emits rows
        into: a partition left empty under the new salt keeps the old-salt
        file, duplicating its rows (reachable by plain SIGKILL-after-apply
        → rotate → resume; reproduced deterministically,
        tests/test_round5_ops.py::test_recommit_after_rotation_drops_stale_placement)."""
        if self.rotation_in_progress() or self.truncate_in_progress():
            raise MaintenanceInProgress(
                "cannot commit an epoch: rotation/truncate in progress — "
                "this chunk raced the marker; finish the maintenance op and "
                "re-run replay")
        cw = self.compacted_watermark() if manifest.epoch < REVISE_EPOCH_BASE \
            else -1
        if manifest.offset_max <= cw:
            # rank-invariant backstop: this epoch's whole window is already
            # folded into base (_epoch = -1, tombstones dropped) — a delta
            # committed UNDER the folded coverage would outrank those base
            # rows and rewind/resurrect keys. Folds exclude the provisional
            # tail precisely so no live plan ever reaches this; hitting it
            # means the plan raced a fold that covered the window since,
            # and the re-plan will see it covered and skip. Check-then-act:
            # under the ONE-replayer-per-lake deployment model (the
            # reference's one-merger rule) a fold can only cover epochs the
            # sole writer already committed, so the residual read→write
            # window is unreachable; two concurrent replayers on one lake
            # could still interleave past it.
            raise MaintenanceInProgress(
                f"cannot commit epoch {manifest.epoch}: its window "
                f"[{manifest.offset_min}, {manifest.offset_max}] is already "
                f"folded into base (compacted watermark {cw}) — re-plan; "
                "the window will be skipped as covered")
        if expect_placement_gen is not None:
            with open(os.path.join(self.root, TABLE_FILE)) as f:
                cur = json.load(f).get("placement_gen", 0)
            if cur != expect_placement_gen:
                raise MaintenanceInProgress(
                    f"cannot commit an epoch: hot-key rotation completed "
                    f"mid-chunk (placement gen {expect_placement_gen} → "
                    f"{cur}) — this chunk's rows were placed under the old "
                    "salt; re-run replay to re-place them")
        def drop_unlisted():
            ddir = os.path.dirname(self.delta_path(manifest.epoch, 0))
            keep = {os.path.basename(p.file) for p in manifest.partitions}
            try:
                stale = [fn for fn in os.listdir(ddir) if fn not in keep]
            except FileNotFoundError:
                stale = []      # empty epoch, or a concurrent compactor's
                                # GC — post-commit verification covers it
            for fn in stale:
                _dbg("drop_unlisted", root=self.root, epoch=manifest.epoch,
                     file=fn)
                try:
                    os.remove(os.path.join(ddir, fn))
                except FileNotFoundError:
                    pass

        # unlisted files are stale placements (see docstring) or orphan
        # .tmp-* from a crashed writer. ORDER vs the manifest write matters
        # for the crash windows: a FRESH epoch cleans BEFORE publishing
        # (SIGKILL mid-loop leaves the epoch uncommitted, the re-run repeats
        # the cleanup), but a RE-commit (growing-log tail) cleans AFTER —
        # deleting first would leave the still-committed OLD manifest
        # pointing at removed files if the publish never lands (rows the
        # watermark claims covered would silently vanish from folds).
        recommit = os.path.exists(self.manifest_path(manifest.epoch))
        if os.environ.get("APE_DEBUG_LOG"):    # guard: args are O(partitions)
            _dbg("commit_epoch", root=self.root, epoch=manifest.epoch,
                 recommit=recommit, n_parts=len(manifest.partitions),
                 files=sorted(os.path.basename(p.file)
                              for p in manifest.partitions),
                 off_min=manifest.offset_min, off_max=manifest.offset_max,
                 events=sum(p.events for p in manifest.partitions))
        if not recommit:
            drop_unlisted()
        atomic_write_text(self.manifest_path(manifest.epoch), manifest.to_json())
        if recommit:
            drop_unlisted()     # crash before this = the pre-cleanup status
                                # quo (same-partition staleness, LWW-folded)
        if schema_version is not None and schema_version != self.schema_version:
            self.schema_version = schema_version
            self._save_table_json()

    def refinalize_epoch(self, m: EpochManifest) -> None:
        """Flip a committed PROVISIONAL manifest to final=True in place —
        called by the PLANNERS (the only components that know window
        finality: barriers/commit snaps live in the plan, not the lake)
        when a replan reproduces the window byte-for-byte but now final.
        Without this, a window that becomes final WITHOUT changing its end
        (a schema barrier at old-log-end+1; a commit snap landing exactly
        on the old end; any pre-`final`-field legacy manifest) is never
        re-committed — offset_max == w.hi so the growing-log recommit
        never fires — and the fold prefix wedges behind it forever.
        Content is unchanged, so this is safe under every reader; skipped
        while a rotation/truncate marker is up (their strict GC must not
        race a manifest resurrection), and only an EXISTING manifest is
        rewritten (a concurrently-folded epoch stays folded)."""
        if self.rotation_in_progress() or self.truncate_in_progress():
            return
        path = self.manifest_path(m.epoch)
        if not os.path.exists(path):
            return                       # folded+GC'd concurrently
        from dataclasses import replace as _dc_replace
        atomic_write_text(path, _dc_replace(m, final=True).to_json())
        _dbg("refinalize_epoch", root=self.root, epoch=m.epoch,
             off_min=m.offset_min, off_max=m.offset_max)

    # ---------- read path ----------
    def partition_files(self, part_id: int) -> list[str]:
        """Base + committed delta files for one partition, epoch-ascending."""
        files = []
        bp = self.base_path(part_id)
        if os.path.exists(bp):
            files.append(bp)
        for e in self.committed_epochs():
            dp = self.delta_path(e, part_id)
            if os.path.exists(dp):
                files.append(dp)
        return files

    def set_constraints(self, constraints: list[dict]) -> None:
        """Register (and persist) constraint descriptors. Validated here;
        ENFORCED by precheck (sampled source check) and load_snapshot
        (hard check: not-null per batch, unique per partition — sound for
        the id cols because partition placement is a pure function of them;
        other unique sets are checked within-partition and sampled globally
        by precheck)."""
        for c in constraints:
            t = c.get("type")
            if t == "not_null":
                if "col" not in c:
                    raise ValueError(f"not_null constraint needs 'col': {c}")
            elif t == "unique":
                if not c.get("cols"):
                    raise ValueError(f"unique constraint needs 'cols': {c}")
            else:
                raise ValueError(f"unknown constraint type: {c}")
        self.constraints = list(constraints)
        self._save_table_json()

    def set_sequences(self, sequences: list[dict]) -> None:
        """Register (and persist) sequence descriptors
        (struct_meta/structure/sequence.rs analog: name/start/increment;
        a Parquet lake has no server-side counter, so the sequence's STATE
        is next_value, maintained by advance_sequences)."""
        out = []
        for s in sequences:
            if "name" not in s or "col" not in s:
                raise ValueError(f"sequence needs 'name' and 'col': {s}")
            d = {"name": s["name"], "col": s["col"],
                 "increment": int(s.get("increment", 1)),
                 "start_value": int(s.get("start_value", 1))}
            d["next_value"] = int(s.get("next_value", d["start_value"]))
            out.append(d)
        self.sequences = out
        self._save_table_json()

    def advance_sequences(self) -> dict[str, int]:
        """The migration's sequence-handoff step (PG: setval(max(col)) after
        the copy, so inserts on the target continue where the source left
        off): next_value = max(col over live state) + increment, computed
        distributed (pruned column read). Returns {name: next_value}.
        ONE merge-on-read scan covers every sequence (a per-sequence scan
        would re-fold the whole table N times for the same maxima)."""
        out = {}
        if self.sequences:
            from ray.data.aggregate import Max

            cols = sorted({s["col"] for s in self.sequences})
            ds = self.state_dataset(columns=cols)
            agg = ds.aggregate(*[Max(c) for c in cols]) or {}
            maxima = {c: agg.get(f"max({c})") for c in cols}
        for s in self.sequences:
            mx = maxima.get(s["col"])
            if mx is not None:
                s["next_value"] = max(s["next_value"],
                                      int(mx) + s["increment"])
            out[s["name"]] = s["next_value"]
        if self.sequences:
            self._save_table_json()
        return out

    def set_comments(self, comments: list[dict]) -> None:
        """Register (and persist) table/column comment descriptors
        (struct_meta/structure/comment.rs analog). Column comments are
        attached as Arrow field metadata by state_table(), so they travel
        inside any Parquet the state is exported to."""
        for c in comments:
            if c.get("type") not in ("table", "column"):
                raise ValueError(f"comment type must be table|column: {c}")
            if c["type"] == "column" and not c.get("column"):
                raise ValueError(f"column comment needs 'column': {c}")
            if "comment" not in c:
                raise ValueError(f"comment needs 'comment': {c}")
        self.comments = list(comments)
        self._save_table_json()

    def set_indexes(self, indexes: list[dict]) -> None:
        """Register (and persist) index descriptors
        (struct_meta/structure/index.rs analog — index_name, columns,
        IndexKind where "" is the plain/Btree default). See the __init__
        note for what an index MEANS on a Parquet lake: "unique" kinds are
        enforced with the unique constraints (``unique_column_sets``), and
        the first index is compact()'s clustering key."""
        out = []
        for i in indexes:
            if not i.get("name") or not i.get("cols"):
                raise ValueError(f"index needs 'name' and 'cols': {i}")
            kind = str(i.get("kind", "")).lower()
            if kind not in ("", "unique", "fulltext", "spatial"):
                raise ValueError(f"unknown index kind: {i}")
            out.append({"name": i["name"], "cols": list(i["cols"]),
                        "kind": kind})
        self.indexes = out
        self._save_table_json()

    def unique_column_sets(self) -> tuple[tuple[str, ...], ...]:
        """Column sets under uniqueness enforcement: declared unique
        constraints plus unique-kind indexes (the reference treats a unique
        index as part of the table structure — mysql_create_table_statement
        .rs:50-55 gates them under StructureType::Table, and its key-column
        derivation reads them as candidate keys, rdb_meta_manager.rs:82-96)."""
        sets = [tuple(c["cols"]) for c in self.constraints
                if c["type"] == "unique"]
        sets += [tuple(i["cols"]) for i in self.indexes
                 if i["kind"] == "unique"]
        return tuple(sets)

    def cluster_sort_cols(self) -> list[str]:
        """compact()'s clustering key: the FIRST registered index's columns
        with the id cols appended as a tiebreak — rows are unique per id
        after the LWW fold, so the sort is total and the base file bytes
        stay deterministic across crash+resume re-folds."""
        if not self.indexes:
            return []
        cols = list(self.indexes[0]["cols"])
        cols += [c for c in self.meta.id_cols if c not in cols]
        return cols

    def _with_comment_metadata(self, t: "pa.Table") -> "pa.Table":
        if not self.comments:
            return t
        col_comments = {c["column"]: c["comment"] for c in self.comments
                        if c["type"] == "column"}
        tbl_comment = next((c["comment"] for c in self.comments
                            if c["type"] == "table"), None)
        fields = []
        for f in t.schema:
            if f.name in col_comments:
                f = f.with_metadata({**(f.metadata or {}),
                                     b"comment": col_comments[f.name]})
            fields.append(f)
        schema = pa.schema(fields,
                           metadata={**(t.schema.metadata or {}),
                                     **({b"comment": tbl_comment}
                                        if tbl_comment else {})})
        return t.cast(schema)

    def set_schema_ops(self, ops: list[dict]) -> None:
        """Register (and persist) non-additive schema-evolution ops — the DDL
        execution point (ddl_type.rs rename/drop/alter analog). Renaming or
        dropping an id col is rejected: the LWW key must stay stable."""
        for op in ops:
            touched = op.get("from") or op.get("col")
            if op["op"] in ("rename", "drop") and touched in self.meta.id_cols:
                raise ValueError(f"schema op {op} touches id col {touched!r}; "
                                 "the LWW key must remain stable")
        self.schema_ops = list(ops)
        self._save_table_json()

    def _fold_files(self, files: list[str], keep_tombstones: bool = False,
                    columns: list[str] | None = None) -> pa.Table | None:
        if columns and not self.schema_ops:
            # prune at the READ: only the requested columns plus what the
            # fold needs leave storage (a 1-column advance_sequences scan
            # must not read multi-GB text payloads). With schema_ops active,
            # old-era files store pre-rename names — read fully, map, then
            # select (the rare, post-DDL-pre-compaction window only).
            need = set(columns) | set(self.meta.id_cols) | {
                COL_EPOCH, COL_OFFSET, COL_SEQ, COL_OP}
            pieces = []
            for f in files:
                names = pq.ParquetFile(f).schema_arrow.names
                pieces.append(pq.read_table(
                    f, columns=[c for c in names if c in need]))
        else:
            pieces = [pq.read_table(f) for f in files]
        if self.schema_ops:
            pieces = [merge_mod.apply_schema_ops(p, self.schema_ops)
                      for p in pieces]
        folded = merge_mod.fold_state(
            pieces, key_cols=self.meta.id_cols, keep_tombstones=keep_tombstones)
        if folded is not None and columns:
            folded = folded.select([c for c in columns if c in folded.column_names])
        return folded

    def _refuse_if_truncating(self) -> None:
        """Reader-side half of the truncate marker contract: mid-truncate
        some partitions are already deleted and some are not, so a state
        read would return a row set that never existed. Same refusal shape
        as replay()/compact()."""
        if self.truncate_in_progress():
            raise RuntimeError(
                "truncate in progress (truncate.json present) — re-run "
                "truncate() to finish it before reading state")

    def state_dataset(self, columns: list[str] | None = None,
                      concurrency: int | None = None):
        """Live state as a Ray Dataset — one task per lake partition, each
        folding only its own files (partition-pure layout ⇒ NO shuffle).
        This is the manifest-reader source pattern (FoxlakeS3Extractor analog,
        foxlake_s3_extractor.rs — list committed files, emit their contents)."""
        import ray.data as rd

        self._refuse_if_truncating()

        parts = [{"part_id": p} for p in range(self.config.num_partitions)]
        root, meta, cfg, sv = self.root, self.meta, self.config, self.schema_version
        ops = self.schema_ops

        def fold(batch: pa.Table):   # generator UDF: empty partitions yield
            lake = LakeTable(root, meta, cfg, sv, ops)  # nothing (no null-schema
            out = []                                 # blocks polluting unions)
            for pid in batch.column("part_id").to_pylist():
                def fold_one(pid=pid):
                    files = lake.partition_files(pid)
                    return lake._fold_files(files, columns=columns) \
                        if files else None
                t = _retry_vanished_files(fold_one)
                if t is not None and t.num_rows:
                    out.append(t)
            if out:
                yield pa.concat_tables(merge_mod.unify_tables(out))

        ds = rd.from_items(parts).map_batches(
            fold, batch_format="pyarrow", batch_size=1,
            concurrency=concurrency)
        return ds

    def state_table(self, drop_engine_cols: bool = True) -> pa.Table:
        """Whole live state as one Arrow table (tests / small results only)."""
        self._refuse_if_truncating()
        pieces = []
        for pid in range(self.config.num_partitions):
            def fold_one(pid=pid):
                files = self.partition_files(pid)
                return self._fold_files(files) if files else None
            t = _retry_vanished_files(fold_one)
            if t is not None and t.num_rows:
                pieces.append(t)
        if not pieces:
            return pa.table({})
        out = pa.concat_tables(merge_mod.unify_tables(pieces))
        if drop_engine_cols:
            drop = [c for c in (COL_EPOCH, COL_OFFSET, COL_SEQ, COL_OP, "part_id")
                    if c in out.column_names]
            out = out.drop_columns(drop)
        import pyarrow.compute as pc
        # order_cols defaults to the transcript PK; on a generalized table
        # that never overrode it, fall back to the actual id cols
        sort_cols = [c for c in self.meta.order_cols if c in out.column_names] \
            or [c for c in self.meta.id_cols if c in out.column_names]
        idx = pc.sort_indices(out, sort_keys=[(c, "ascending")
                                              for c in sort_cols])
        return self._with_comment_metadata(out.take(idx))

    # ---------- compaction ----------
    # ---------- maintenance serialization ----------
    def _maintenance_lock_path(self) -> str:
        return os.path.join(self.root, MANIFEST_DIR, "maintenance.lock")

    def _acquire_maintenance(self) -> bool:
        """Advisory per-lake lock serializing maintenance (compact / partial
        compact / rotation / truncate) within a node. Crash-safe without a
        marker: the payload carries (pid, /proc start ticks); a holder that
        died (SIGKILL) fails the liveness probe and its lock is stolen.
        Maintenance is periodic, so a busy lock means SKIP THIS TICK (compact
        returns 0), never wait. This is the common-case guard against the
        concurrent-compactor stale-base race; the per-partition fold stamp
        (BASE_STAMP_KEY) is the correctness backstop for the residual windows
        (steal races, multi-node deployments where pid liveness is
        meaningless — there, run ONE merger per lake, the reference's own
        model, foxlake_merger.rs)."""
        import time as _time

        path = self._maintenance_lock_path()
        for _ in range(16):
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                try:
                    with open(path) as f:
                        cur = json.load(f)
                except (FileNotFoundError, json.JSONDecodeError, OSError):
                    _time.sleep(0.02)      # released or mid-write — retry
                    continue
                if _pid_alive(cur.get("pid"), cur.get("start")):
                    return False
                try:                       # dead holder — steal and retry
                    os.remove(path)
                except FileNotFoundError:
                    pass
                continue
            with os.fdopen(fd, "w") as f:
                json.dump({"pid": os.getpid(),
                           "start": _proc_start(os.getpid())}, f)
            return True
        return False

    def _release_maintenance(self) -> None:
        path = self._maintenance_lock_path()
        try:
            with open(path) as f:
                if json.load(f).get("pid") == os.getpid():
                    os.remove(path)
        except (FileNotFoundError, json.JSONDecodeError, OSError):
            pass

    def compact(self, new_hot_keys: tuple[str, ...] | None = None,
                parallel: bool = True,
                max_delta_files: int | None = None,
                keep_epochs: int = 0) -> int:
        """Fold committed deltas into base, then drop them. Returns #epochs
        folded (partial mode: #partitions folded — see below). FoxlakeMerger
        analog (foxlake_merger.rs:82-104); runs offline relative to replay.
        Tombstones are dropped at compaction (a key fully deleted needs no
        base row; any later re-insert has a higher offset in a newer epoch).
        Hot-key set may be rotated here only (partition.py).

        PARTIAL / INCREMENTAL mode (``max_delta_files`` and/or
        ``keep_epochs``): the 100-TB operational shape — the reference's
        merger consumes only sealed epochs incrementally
        (foxlake_parallelizer.rs:70-126, foxlake_merger.rs:82-104) instead of
        rewriting the world. Only partitions whose delta-file count within
        the horizon EXCEEDS ``max_delta_files`` are folded (bounding
        merge-on-read amplification at ≤ max_delta_files + keep_epochs files
        per untouched partition, and rewrite cost at one base file per hot
        partition per tick); ``keep_epochs`` excludes the newest N committed
        epochs from folding (the sealed-epoch horizon — their deltas stay as
        files). Folded epochs are always an epoch-PREFIX per partition, so
        base rows (``_epoch = -1``) still rank below every remaining delta.
        Crash-safe WITHOUT a marker: each partition's new base is written
        atomically before its consumed delta files are unlinked, and
        re-folding committed deltas over a base that already contains them
        picks identical LWW winners — rerunning after a SIGKILL at any point
        converges. Epoch manifests are dropped only once they form a fully
        consumed prefix, after publishing their watermark to
        ``compacted.json`` (never regresses). Returns #partitions folded.

        ``parallel=True`` runs one Ray task per partition (the second, offline
        shuffle of SURVEY §7 — partition-pure, so no data exchange at all);
        ``False`` folds inline (tests / tiny lakes / no Ray session)."""
        if self.truncate_in_progress():
            # checked BEFORE the rotation branch: compact(new_hot_keys=...)
            # against a torn truncate would write rotation.json and then
            # refuse on the truncate marker — leaving BOTH markers in place,
            # where truncate() refuses on rotation and rotation on truncate
            # (a mutual wedge only hand-deleting a marker could clear)
            raise MaintenanceInProgress(
                "truncate in progress (truncate.json present) — re-run "
                "truncate() to finish it before compacting")
        if new_hot_keys is not None:
            if max_delta_files is not None or keep_epochs:
                raise ValueError("hot-key rotation requires a FULL compaction "
                                 "(every row re-placed under the new salt)")
        elif self.rotation_in_progress():
            # a plain compact against a half-rotated lake would fold
            # old-salt deltas into a possibly new-salt base — duplicate key
            # placements forever. Same refusal contract as replay().
            raise MaintenanceInProgress(
                "hot-key rotation in progress (rotation.json present) — "
                "re-run compact(new_hot_keys=...) to finish it first")
        if not self._acquire_maintenance():
            if new_hot_keys is not None:
                # a rotation silently skipped would leave the operator
                # believing the salt changed — loud, unlike plain ticks
                raise MaintenanceInProgress(
                    "another maintenance run holds this lake's lock — "
                    "retry compact(new_hot_keys=...) once it finishes")
            return 0               # maintenance tick: skip, next tick folds
        try:
            if new_hot_keys is not None:
                # repartition-on-compact: fold full state, re-split by salt
                return self._compact_rotate(tuple(new_hot_keys))
            if max_delta_files is not None or keep_epochs:
                return self._compact_partial(max_delta_files, keep_epochs,
                                             parallel)
            return self._compact_full(parallel)
        finally:
            self._release_maintenance()

    def _compact_full(self, parallel: bool) -> int:
        def snapshot() -> tuple[list[int], int]:
            # retried list-then-read: a concurrent compactor (e.g. a
            # follower's auto-compact tick racing an operator-run compact)
            # can fold the tail manifest between the listing and the read.
            # The WATERMARK comes from the last NON-revise epoch: revise
            # fixes squat synthetic offsets wm+1..wm+n, and publishing them
            # as source coverage would skip the next n real CDC events
            # after this compact re-enables replay.
            #
            # PROVISIONAL-TAIL EXCLUSION: a non-final epoch (its window was
            # cut by the then-current log end) may be RE-COMMITTED with more
            # events when the log grows. Folding it flattens its rows to
            # _epoch = -1 and drops its tombstones; a later re-commit of
            # the same epoch id then ranks ABOVE base rows folded from
            # HIGHER epochs — resurrecting deleted keys and rewinding LWW
            # winners (mixed-soak divergence, seed 164990304). Plain folds
            # therefore consume only the PREFIX of final epochs and leave
            # the extendable tail as delta. Exception: once REVISE epochs
            # are committed the lake is in the operator-serialized
            # revise→compact()→replay window (replay refuses until the
            # revise band folds), so compact() folds EVERYTHING — the
            # documented recovery path, with no concurrent writer by
            # construction. Rotation/truncate also fold everything; their
            # markers refuse every concurrent commit.
            es = self.committed_epochs()
            if not any(e >= REVISE_EPOCH_BASE for e in es):
                kept = []
                for e in es:
                    if not self.read_manifest(e).final:
                        break
                    kept.append(e)
                es = kept
            src = [e for e in es if e < REVISE_EPOCH_BASE]
            return (es, self.read_manifest(src[-1]).offset_max) if src \
                else (es, -1)

        epochs, watermark = _retry_vanished_files(snapshot)
        _dbg("compact_full_snapshot", root=self.root, epochs=epochs,
             wm=watermark)
        if not epochs:
            return 0

        root, meta, cfg, sv = self.root, self.meta, self.config, self.schema_version
        ops = self.schema_ops
        cluster = self.cluster_sort_cols()

        def compact_partition(pid: int) -> None:
            lake = LakeTable(root, meta, cfg, sv, ops)

            def body():
                # files PINNED to the snapshot's epoch list (NOT a fresh
                # partition_files listing): epochs committed after the
                # snapshot — above all the provisional tail, which a
                # concurrent round may be re-committing right now — must
                # stay as deltas ranked above this fold's base, and the
                # epilogue GC removes exactly the snapshot epochs
                bp0 = lake.base_path(pid)
                files = ([bp0] if os.path.exists(bp0) else []) + \
                    [f for f in (lake.delta_path(e, pid) for e in epochs)
                     if os.path.exists(f)]
                if not files:
                    return
                bp = lake.base_path(pid)
                if (len(files) == 1 and files[0] == bp
                        and not ops and not cluster):
                    # base-only partition with no pending schema op and no
                    # clustering key that could have changed since the base
                    # was written: re-folding would byte-identically rewrite
                    # the file — on the 100-TB shape that turns a no-op
                    # maintenance pass into a full-lake rewrite
                    return
                # coverage this fold will contain: the snapshot watermark,
                # or the listed base's own stamp if a sibling already
                # folded further (that base is an INPUT here, so its
                # coverage carries through)
                in_stamp = _base_stamp(bp) if files[0] == bp else -1
                my_wm = max(watermark, in_stamp)
                folded = lake._fold_files(files, keep_tombstones=False)
                if folded is None:
                    return
                # base rows rank below every future delta. A zero-row fold
                # (all tombstones) writes an EMPTY stamped base, never
                # os.remove: an absent file has no stamp, and a stale
                # sibling could then resurrect the deleted rows.
                n = folded.num_rows
                i = folded.column_names.index(COL_EPOCH)
                folded = folded.set_column(
                    i, COL_EPOCH, pa.array(np.full(n, -1, dtype=np.int64)))
                folded = _cluster_sorted(folded, cluster)
                if _base_stamp(bp) > my_wm:
                    # a sibling compactor published a STRICTLY newer fold
                    # while we folded; ours is a subset — overwriting would
                    # erase rows whose deltas the sibling already GC'd
                    _dbg("fold_abort_stamp", root=root, pid_part=pid,
                         my_wm=my_wm, base_stamp=_base_stamp(bp))
                    return
                _dbg("fold_write", root=root, pid_part=pid, my_wm=my_wm,
                     rows=n, files=[os.path.basename(os.path.dirname(f))
                                    + "/" + os.path.basename(f)
                                    for f in files])
                atomic_write_parquet(_stamped(folded, my_wm), bp,
                                     compression="zstd")

            _retry_vanished_files(body)

        import ray
        if parallel and ray.is_initialized():
            task = ray.remote(num_cpus=1)(compact_partition)
            ray.get([task.remote(p) for p in range(self.config.num_partitions)])
        else:
            for pid in range(self.config.num_partitions):
                compact_partition(pid)
        # Publish the compacted watermark BEFORE dropping deltas/manifests:
        # a crash inside the cleanup window must never regress watermark() —
        # folding committed deltas over a base that already contains them is
        # idempotent (same LWW winners), so the transient overlap is safe,
        # while a regressed watermark would re-apply the entire log. max()
        # against the CURRENT compacted.json for the same reason: a
        # concurrent compactor may have published a higher watermark while
        # this run was folding (the "never regresses" contract is global,
        # not per-invocation).
        self._publish_compacted(
            EpochManifest(epoch=epochs[-1], offset_min=-1,
                          offset_max=watermark,
                          schema_version=self.schema_version, partitions=[]))
        for e in epochs:
            self._gc_epoch(e)   # tolerant of sibling-GC and recommit races
        return len(epochs)

    def delta_file_counts(self) -> dict[int, int]:
        """Committed delta files per partition — the merge-on-read
        amplification metric partial compaction bounds (a state read of
        partition p folds 1 base + counts[p] delta files)."""
        epochs = self.committed_epochs()
        out = {}
        for pid in range(self.config.num_partitions):
            out[pid] = sum(1 for e in epochs
                           if os.path.exists(self.delta_path(e, pid)))
        return out

    def _compact_partial(self, max_delta_files: int | None,
                         keep_epochs: int, parallel: bool) -> int:
        """Incremental compaction body — see compact() docstring. Folds a
        strict subset: partitions over the delta-file threshold, epochs
        before the sealed horizon. Per-partition protocol (no marker needed):

            1. fold base + horizon delta files → atomic-write new base
            2. unlink the consumed delta files (partition now reads 1 base
               + only post-horizon deltas)

        A crash between 1 and 2 leaves base ⊇ deltas — the fold is
        idempotent (identical LWW winners), so any rerun converges. Epoch
        manifests stay until every partition's file in them is consumed AND
        they form a prefix of committed epochs; the prefix watermark is
        published to compacted.json BEFORE manifests are removed so
        watermark() never regresses (resume contract, replay.py)."""
        # fold only the prefix of FINAL epochs (same provisional-tail rule
        # as _compact_full — an extendable tail folded here would let its
        # re-commit outrank base rows folded from higher epochs) and never
        # the revise band (revise drains through the documented full
        # compact() only). Re-listed on retry: a concurrent fold can GC a
        # manifest between the listing and the read.
        def kept_prefix() -> list[int]:
            out = []
            for e in self.committed_epochs():
                if e >= REVISE_EPOCH_BASE or not self.read_manifest(e).final:
                    break
                out.append(e)
            return out

        epochs = _retry_vanished_files(kept_prefix)
        horizon = epochs[:len(epochs) - keep_epochs] if keep_epochs else epochs
        if not horizon:
            return 0
        threshold = int(max_delta_files) if max_delta_files is not None else 0

        root, meta, cfg, sv = self.root, self.meta, self.config, self.schema_version
        ops = self.schema_ops
        hz = list(horizon)
        cluster = self.cluster_sort_cols()

        def fold_partition(pid: int) -> bool:
            lake = LakeTable(root, meta, cfg, sv, ops)

            def body() -> bool:
                consumed = [(e, lake.delta_path(e, pid)) for e in hz]
                consumed = [(e, f) for e, f in consumed if os.path.exists(f)]
                if len(consumed) <= threshold:
                    return False
                bp = lake.base_path(pid)
                in_stamp = _base_stamp(bp)
                files = ([bp] if os.path.exists(bp) else []) \
                    + [f for _, f in consumed]
                # coverage claim: everything ≤ the last consumed NON-revise
                # epoch's offset_max for this partition is in base ∪ consumed
                # (epochs partition the offset space; earlier epochs are in
                # the base via the prefix invariant). Revise epochs carry
                # synthetic offsets — never claim them as source coverage.
                src_es = [e for e, _ in consumed if e < REVISE_EPOCH_BASE]
                try:
                    ewm = lake.read_manifest(src_es[-1]).offset_max \
                        if src_es else -1
                except FileNotFoundError:
                    # a sibling folded+GC'd the manifest after publishing
                    # compacted.json — that publish covers the epoch
                    ewm = lake.compacted_watermark()
                my_wm = max(in_stamp, ewm)
                folded = lake._fold_files(files, keep_tombstones=False)
                if folded is None:
                    return False
                n = folded.num_rows    # zero-row fold → EMPTY stamped base
                i = folded.column_names.index(COL_EPOCH)
                folded = folded.set_column(
                    i, COL_EPOCH, pa.array(np.full(n, -1, dtype=np.int64)))
                folded = _cluster_sorted(folded, cluster)
                if _base_stamp(bp) > my_wm:
                    return False     # sibling folded strictly further: ours
                                     # is a subset — skip write AND unlink
                                     # (the sibling's GC owns those files)
                _dbg("partial_fold_write", root=root, pid_part=pid,
                     my_wm=my_wm, rows=n,
                     consumed=[e for e, _ in consumed])
                atomic_write_parquet(_stamped(folded, my_wm), bp,
                                     compression="zstd")
                for _, f in consumed:    # only after the new base is durable
                    try:
                        os.remove(f)
                    except FileNotFoundError:
                        pass             # another compactor consumed it —
                                         # its base is durable too (same
                                         # publish-before-unlink ordering)
                return True

            return _retry_vanished_files(body)

        import ray
        if parallel and ray.is_initialized():
            task = ray.remote(num_cpus=1)(fold_partition)
            done = ray.get([task.remote(p)
                            for p in range(self.config.num_partitions)])
        else:
            done = [fold_partition(p)
                    for p in range(self.config.num_partitions)]

        # drop the fully-consumed epoch PREFIX (manifest watermark first).
        # Orphaned atomic-write temporaries (*.tmp-<uuid>, a writer SIGKILLed
        # mid pq.write_table; resume rewrites under a FRESH uuid) don't count
        # as content — they would otherwise pin the prefix forever, manifests
        # would never GC, and the auto-compact fallback would full-rewrite
        # the base every tick. The rmtree below removes them with the dir.
        removable = []
        for e in epochs:
            ddir = os.path.join(self.root, "delta", f"epoch-{e:08d}")
            if os.path.isdir(ddir) and any(
                    ".tmp-" not in f for f in os.listdir(ddir)):
                break
            removable.append(e)
        if removable:
            try:
                src = [e for e in removable if e < REVISE_EPOCH_BASE]
                # revise-band manifests carry synthetic offsets — never
                # publish them as source coverage (see committed_watermark)
                mwm = self.read_manifest(src[-1]).offset_max if src else -1
            except FileNotFoundError:
                # a concurrent compactor consumed it after publishing its
                # own compacted.json, which therefore covers this epoch —
                # the re-read below carries the watermark
                mwm = -1
            wm = max(mwm, self.compacted_watermark())
            if wm == -1:
                # no watermark source at all (should be unreachable: a
                # vanished manifest implies a durable compacted.json) —
                # never GC manifests without coverage; defer to next tick
                return sum(bool(d) for d in done)
            self._publish_compacted(
                EpochManifest(epoch=removable[-1], offset_min=-1,
                              offset_max=wm,
                              schema_version=self.schema_version,
                              partitions=[]))
            for e in removable:
                self._gc_epoch(e)   # sibling-GC + recommit-race tolerant
        return sum(bool(d) for d in done)

    def rotation_in_progress(self) -> bool:
        return os.path.exists(os.path.join(self.root, MANIFEST_DIR,
                                           "rotation.json"))

    # ---------- truncate (DDL) ----------
    def truncate_in_progress(self) -> bool:
        return os.path.exists(os.path.join(self.root, MANIFEST_DIR,
                                           "truncate.json"))

    def truncate(self) -> None:
        """TRUNCATE TABLE analog (ddl_type.rs Truncate): drop every live row
        while PRESERVING the committed watermark — the log up to it stays
        consumed, so a subsequent replay resumes after the truncate point
        instead of resurrecting history. Crash-safe via the same
        marker-refusal pattern as rotation: ``truncate.json`` brackets the
        deletes, replay() refuses while it exists, and re-running
        ``truncate()`` (idempotent) finishes the job."""
        if self.rotation_in_progress():
            raise MaintenanceInProgress(
                "hot-key rotation in progress (rotation.json present) — "
                "re-run compact(new_hot_keys=...) to finish it before "
                "truncating")
        if not self._acquire_maintenance():
            # a compactor mid-fold could rewrite base files AFTER the
            # deletes below (its fold predates the marker) — resurrecting
            # truncated rows. Loud: truncate is an operator DDL, not a tick.
            raise MaintenanceInProgress(
                "another maintenance run holds this lake's lock — retry "
                "truncate() once it finishes")
        try:
            self._truncate_locked()
        finally:
            self._release_maintenance()

    def _truncate_locked(self) -> None:
        marker = os.path.join(self.root, MANIFEST_DIR, "truncate.json")
        wm = self.watermark()
        atomic_write_text(marker, json.dumps({"watermark": wm}))
        # persist the floor FIRST: events ≤ wm are gone even if the replay
        # log later extends past them inside the same epoch window
        self.truncate_offset = max(self.truncate_offset, wm)
        self._save_table_json()
        epochs = self.committed_epochs()
        self._publish_compacted(
            EpochManifest(epoch=epochs[-1] if epochs else 0, offset_min=-1,
                          offset_max=wm, schema_version=self.schema_version,
                          partitions=[]))
        for pid in range(self.config.num_partitions):
            bp = self.base_path(pid)
            if os.path.exists(bp):
                os.remove(bp)
        for e in epochs:
            # STRICT: commit_epoch refuses under the marker, so nothing
            # re-claims a left-behind manifest — it would resurrect
            # pre-truncate rows forever. Raising keeps the marker; re-run
            # truncate() to finish (the documented idempotent recovery).
            self._gc_epoch(e, strict=True)
        os.remove(marker)

    def _recover_rotation(self) -> None:
        """Bring a lake crashed mid-rotation back to a consistent state.

        The rotation protocol has exactly one commit point: the
        ``rotation_swap.json`` marker, written only after ``base_next/`` is
        COMPLETE. Every on-disk state is therefore recoverable:

        - no swap marker → any ``base_next/`` is partial (discarded by the
          rebuild); if ``base/`` is missing, ``base_old/`` is the pre-rotation
          base from an interrupted swap of a PREVIOUS protocol — restore it.
        - swap marker + ``base_next/`` present → the swap may or may not have
          started; ``base/``+``base_next/`` both existing means base is still
          pre-rotation (the swap renames next away before base reappears), so
          finish the swap: base→base_old, base_next→base, drop base_old.
        - swap marker, no ``base_next/`` → the swap completed through
          ``rename(next, base)``; drop any leftover ``base_old/`` and finish
          the delta/manifest cleanup the crashed run never reached.

        ``base_old/`` is only ever deleted AFTER a verified ``base/`` exists.
        """
        base = os.path.join(self.root, "base")
        old = os.path.join(self.root, "base_old")
        next_dir = os.path.join(self.root, "base_next")
        swap_marker = os.path.join(self.root, MANIFEST_DIR, "rotation_swap.json")
        if not os.path.exists(swap_marker):
            if not os.path.isdir(base) and os.path.isdir(old):
                os.rename(old, base)       # interrupted swap: restore
            return
        with open(swap_marker) as f:
            keys = tuple(json.load(f)["hot_keys"])
        if os.path.isdir(next_dir):        # complete the committed swap
            if os.path.isdir(base):
                shutil.rmtree(old, ignore_errors=True)
                os.rename(base, old)
            os.rename(next_dir, base)
        elif not os.path.isdir(base) and os.path.isdir(old):
            # defensive ROLLBACK: base_next vanished after the swap marker
            # (external tampering). Restore the pre-rotation base and STOP —
            # running the epilogue would delete committed deltas and claim
            # the new salt against an old-salt base. The rotation is simply
            # not done; re-running compact(new_hot_keys=...) redoes it.
            os.rename(old, base)
            os.remove(swap_marker)
            return
        if not os.path.isdir(base):
            raise RuntimeError(
                f"rotation recovery: no base/, base_next/ or base_old/ under "
                f"{self.root} — lake state is unrecoverable")
        shutil.rmtree(old, ignore_errors=True)
        self.config.hot_keys = keys
        self.placement_gen += 1     # the crashed run may have bumped before
        self._save_table_json()     # the swap marker — double-bump is fine,
                                    # the check is "moved", not "+1"
        # delete ONLY the epochs the crashed rotation's snapshot folded into
        # base_next (recorded in the swap marker) — a fresh listing would
        # also destroy any epoch committed mid-rotation, regressing the
        # watermark and losing rows the rebuilt base never saw. Older swap
        # markers without the list fall back to the fresh listing (their
        # commit_epoch had no marker refusal either).
        with open(swap_marker) as f:
            snap = json.load(f).get("epochs")
        for e in (snap if snap is not None else self.committed_epochs()):
            self._gc_epoch(e, strict=True)   # marker semantics — see truncate
        os.remove(swap_marker)

    def _compact_rotate(self, new_hot_keys: tuple[str, ...]) -> int:
        """Repartitioning compaction — the ONLY point where the hot-key salt
        set may change (partition.py contract: placement must stay stable
        between rotations). Fold the full live state, re-split every row by
        the NEW salt (one offline shuffle — SURVEY §7's second shuffle), and
        atomically swap the base directory.

        Crash safety: a ``rotation.json`` marker brackets the whole
        operation; replay() refuses to run while it exists, and re-running
        ``compact(new_hot_keys=...)`` restarts the rotation —
        ``_recover_rotation`` first repairs any half-done directory swap
        (the ``rotation_swap.json`` marker is the commit point; base_old/ is
        never deleted until a verified base/ is in place). The watermark is
        published before any cleanup, so it never regresses."""
        import ray.data as rd  # requires a Ray session (offline op)

        from ape_dts_ray.partition import COL_PART, add_partition_column

        self._recover_rotation()
        marker = os.path.join(self.root, MANIFEST_DIR, "rotation.json")
        atomic_write_text(marker, json.dumps({"hot_keys": list(new_hot_keys)}))
        epochs = self.committed_epochs()
        watermark = self.watermark()
        nparts = self.config.num_partitions
        hot = frozenset(new_hot_keys) if new_hot_keys else None
        next_dir = os.path.join(self.root, "base_next")
        shutil.rmtree(next_dir, ignore_errors=True)
        os.makedirs(next_dir)

        ds = self.state_dataset()          # folded rows incl. engine columns

        # generic key columns: partition by meta.partition_col, salt by the
        # same id col replay uses (replay.py salt_col derivation)
        part_col = self.meta.partition_col
        ids = self.meta.id_cols
        salt_col = ids[-1] if len(ids) > 1 else ids[0]

        def repart(t: pa.Table) -> pa.Table:
            n = t.num_rows                 # base rows rank below all deltas
            if COL_EPOCH in t.column_names:
                t = t.set_column(t.column_names.index(COL_EPOCH), COL_EPOCH,
                                 pa.array(np.full(n, -1, dtype=np.int64)))
            return add_partition_column(t, nparts, hot,
                                        conv_col=part_col, turn_col=salt_col)

        meta = self.meta

        # indexed lakes cluster like compact(); otherwise the id-col sort
        # keeps rotated base bytes deterministic (groupby row order isn't)
        cluster = self.cluster_sort_cols() or list(meta.id_cols)

        def write_next(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return pa.table({"part_id": pa.array([], pa.int32())})
            pid = int(group.column(COL_PART)[0].as_py())
            out = group.drop_columns([COL_PART])
            # same clustering key as compact(): a registered index IS the
            # base files' sort order (the __init__ contract) — id-col sort
            # here scrambled indexed-column row-group stats until the next
            # full compact
            out = _cluster_sorted(out, cluster)
            atomic_write_parquet(
                _stamped(out, watermark),
                os.path.join(next_dir, f"part-{pid:05d}.parquet"),
                compression="zstd")
            return pa.table({"part_id": pa.array([pid], pa.int32())})

        (ds.map_batches(repart, batch_format="pyarrow")
         .groupby(COL_PART)
         .map_groups(write_next, batch_format="pyarrow")
         .take_all())

        # publish watermark, then config, then the swap commit point, then
        # the swap itself, then cleanup — every crash window between these
        # steps is repaired by _recover_rotation (see its docstring)
        ep = epochs[-1] if epochs else 0
        self._publish_compacted(
            EpochManifest(epoch=ep, offset_min=-1, offset_max=watermark,
                          schema_version=self.schema_version, partitions=[]))
        self.config.hot_keys = tuple(new_hot_keys)
        self.placement_gen += 1     # invalidates every plan made under the
        self._save_table_json()     # old salt (commit_epoch gen check)
        base = os.path.join(self.root, "base")
        old = os.path.join(self.root, "base_old")
        swap_marker = os.path.join(self.root, MANIFEST_DIR, "rotation_swap.json")
        # COMMIT POINT: base_next/ is complete from here on. The marker
        # carries the epoch SNAPSHOT so crash recovery deletes exactly what
        # this run folded — not whatever is committed at recovery time.
        atomic_write_text(swap_marker,
                          json.dumps({"hot_keys": list(new_hot_keys),
                                      "epochs": list(epochs)}))
        shutil.rmtree(old, ignore_errors=True)   # stale from older rotations
        os.rename(base, old)
        os.rename(next_dir, base)
        if not os.path.isdir(base):              # paranoia before destruction
            raise RuntimeError("rotation swap failed to produce base/")
        shutil.rmtree(old)
        for e in epochs:
            self._gc_epoch(e, strict=True)   # marker semantics — see truncate
        os.remove(swap_marker)
        os.remove(marker)
        return len(epochs)

    def compacted_watermark(self) -> int:
        p = os.path.join(self.root, MANIFEST_DIR, "compacted.json")
        if os.path.exists(p):
            with open(p) as f:
                return EpochManifest.from_json(f.read()).offset_max
        return -1

    def _gc_epoch(self, e: int, strict: bool = False) -> None:
        """Remove one epoch's delta dir + manifest, tolerating BOTH
        directions of the concurrent race: already GC'd by a sibling
        compactor (FileNotFoundError), and a concurrent tail recommit
        WRITING fresh delta files into the dir mid-rmtree (ENOTEMPTY —
        rmtree removed the old files, then rmdir found the writer's new
        ones).

        ``strict=False`` (compact epilogues): on ENOTEMPTY leave the dir
        AND the manifest — the writer's commit re-claims the epoch moments
        later, the rows this compactor folded from the old files are
        idempotent, and readers tolerate manifest entries whose files
        vanished (partition_files exists-checks; _retry_vanished_files).

        ``strict=True`` (truncate / rotation epilogues): those paths REMOVE
        their marker right after this loop, and commit_epoch REFUSES under
        the marker — so no writer ever re-claims the epoch, and a leftover
        manifest would resurrect pre-truncate (or old-salt) delta files
        into every later read. Retry the rmtree briefly (the racing
        writer's chunk finishes in bounded time, its commit dies on the
        marker), then raise WITH THE MARKER INTACT — re-running truncate()
        / compact(new_hot_keys=...) finishes the job, the documented
        recovery for both."""
        import errno
        import time as _time

        ddir = os.path.join(self.root, "delta", f"epoch-{e:08d}")
        for attempt in range(8 if strict else 1):
            try:
                if os.environ.get("APE_DEBUG_LOG"):   # guard: listdir arg
                    _dbg("gc_epoch", root=self.root, epoch=e, strict=strict,
                         files=sorted(os.listdir(ddir))
                         if os.path.isdir(ddir) else [])
                if os.path.isdir(ddir):
                    shutil.rmtree(ddir)
                os.remove(self.manifest_path(e))
                _dbg("gc_epoch_done", root=self.root, epoch=e)
                return
            except FileNotFoundError:
                return
            except OSError as err:
                if err.errno != errno.ENOTEMPTY:
                    raise
                if not strict:
                    return
                _time.sleep(0.1 * (attempt + 1))
        raise OSError(
            errno.ENOTEMPTY,
            f"epoch {e} delta dir kept refilling during strict GC — a "
            "writer is racing this truncate/rotation; its commit will be "
            "refused by the marker, re-run the maintenance op to finish",
            ddir)

    def _publish_compacted(self, m: EpochManifest) -> None:
        """Publish compacted.json without regressing offset_max. A plain
        max()-then-write is a read-then-write race (no FS compare-and-swap):
        two concurrent compactors can interleave read(60) write(100)
        write(80) and regress the published watermark. The write-verify
        loop re-reads after writing and re-publishes the max until stable —
        each pass shrinks the window to the write itself, and a surviving
        regression costs only an idempotent re-apply of the regressed span
        (deterministic delta names), never divergence."""
        from dataclasses import replace as _dc_replace

        path = os.path.join(self.root, MANIFEST_DIR, "compacted.json")
        target = m.offset_max
        for _ in range(4):
            target = max(target, self.compacted_watermark())
            atomic_write_text(path, _dc_replace(m, offset_max=target).to_json())
            if self.compacted_watermark() >= target:
                return

    def watermark(self) -> int:
        return max(self.committed_watermark(), self.compacted_watermark())

    # ---------- heartbeat / liveness ----------
    def write_heartbeat(self, source_max: int | None = None) -> dict:
        """Progress write-back (mysql_cdc_extractor.rs:425-533 heartbeat
        analog: the reference periodically UPDATEs a heartbeat table with the
        current position so operators can monitor lag). Written after each
        committed chunk; monitoring reads it without touching manifests.
        ``source_max``: the newest offset visible at the SOURCE (a follower's
        log scan) — recorded with the derived ``lag`` gauge, the number the
        reference's monitor publishes as sinked-vs-extracted position."""
        import time

        hb = {"time_unix": time.time(),
              "watermark": self.watermark(),
              "committed_epochs": len(self.committed_epochs()),
              "schema_version": self.schema_version}
        if source_max is not None:
            hb["source_max"] = int(source_max)
            hb["lag"] = max(0, int(source_max) - hb["watermark"])
        atomic_write_text(os.path.join(self.root, MANIFEST_DIR, "heartbeat.json"),
                          json.dumps(hb, indent=1))
        return hb

    def heartbeat(self) -> dict | None:
        p = os.path.join(self.root, MANIFEST_DIR, "heartbeat.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    # ---------- lineage / metrics ----------
    def lineage_table(self) -> pa.Table:
        """Per-(epoch, partition) lineage from all committed manifests — the
        metrics surface (counter windows / task_metrics.rs analog): applied
        offset ranges + upsert/delete counts, queryable as a Dataset.
        Retried list-then-read (see committed_watermark)."""

        def body() -> list[dict]:
            out = []
            for e in self.committed_epochs():
                m = self.read_manifest(e)
                for p in m.partitions:
                    out.append({
                        "epoch": e, "part_id": p.part_id, "events": p.events,
                        "rows": p.rows, "upserts": p.upserts,
                        "deletes": p.deletes,
                        "offset_min": p.offset_min, "offset_max": p.offset_max,
                    })
            return out

        rows = _retry_vanished_files(body)
        schema = pa.schema([
            ("epoch", pa.int64()), ("part_id", pa.int32()),
            ("events", pa.int64()), ("rows", pa.int64()),
            ("upserts", pa.int64()), ("deletes", pa.int64()),
            ("offset_min", pa.int64()), ("offset_max", pa.int64())])
        return (pa.Table.from_pylist(rows, schema=schema)
                if rows else schema.empty_table())
