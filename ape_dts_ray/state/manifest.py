"""Epoch manifests: the exactly-once commit protocol + lineage record.

Design (SURVEY §2.6/§4, mirroring ape-dts's recipe of at-least-once transport +
idempotent apply = exactly-once effect):

- Every apply task writes its partition's delta file under a name that is a
  **deterministic function of (epoch, partition)** — a retried/replayed task
  overwrites rather than duplicates. This mirrors the Foxlake sequencer/epoch
  reasoning (dt-connector/src/sinker/foxlake/orc_sequencer.rs:15-43;
  duplicate-epoch handling foxlake_parallelizer.rs:99-121).
- An epoch becomes VISIBLE only when its manifest JSON exists; the manifest is
  written tmp+rename (atomic on POSIX). Readers/compaction consume only
  committed ("sealed") epochs — the epoch-barrier rule of
  foxlake_parallelizer.rs:70-126.
- The manifest carries per-partition lineage: applied offset range,
  upsert/delete counts, file name — the ``S3FileMeta`` analog
  (dt-common/src/meta/foxlake/s3_file_meta.rs:10-22) and the source of the
  committed-offset watermark (``position.log`` analog,
  dt-pipeline/src/base_pipeline.rs:365-390). Resume = max committed offset.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionLineage:
    part_id: int
    file: str              # relative path of the delta file
    rows: int              # rows in the delta (post-LWW, incl. tombstones)
    events: int            # raw events folded into it
    upserts: int
    deletes: int
    offset_min: int
    offset_max: int


@dataclass
class EpochManifest:
    epoch: int
    offset_min: int        # window lower bound (inclusive)
    offset_max: int        # window upper bound (inclusive) = committed watermark
    schema_version: int
    partitions: list[PartitionLineage] = field(default_factory=list)
    # True iff the window ended at a NATURAL boundary (epoch-size multiple,
    # schema barrier, or commit snap) rather than at the then-current end of
    # the log. A provisional (final=False) tail epoch may legally be
    # RE-COMMITTED with more events when the log grows — so plain compaction
    # must never fold it into base: base rows are re-ranked to _epoch = -1
    # and their tombstones dropped, and a later re-commit of the same epoch
    # id would rank ABOVE base rows folded from HIGHER offsets, resurrecting
    # deleted keys and rewinding winners (the mixed-soak divergence, seed
    # 164990304 — see lake.py fold snapshots). Default False: a legacy
    # manifest without the field is conservatively treated as extendable.
    final: bool = False

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=1, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "EpochManifest":
        d = json.loads(s)
        parts = [PartitionLineage(**p) for p in d.pop("partitions")]
        # a legacy manifest without the field gets the dataclass default
        # (final=False, the safe extendable direction); planners re-finalize
        # it on the next replan (LakeTable.refinalize_epoch)
        return EpochManifest(partitions=parts, **d)


def atomic_write_text(path: str, text: str) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def atomic_write_parquet(table, path: str, **kw) -> None:
    import pyarrow.parquet as pq

    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    try:
        pq.write_table(table, tmp, **kw)
        os.replace(tmp, path)
    except FileNotFoundError:
        # the PARENT DIR vanished mid-write: a concurrent compactor's
        # epoch GC rmtree'd a delta dir it saw as empty/tmp-only while this
        # writer (a growing-log tail recommit) was filling it. Recreate and
        # retry once — replay's post-commit delta verification then either
        # publishes these rows or re-runs the window, so the recreated dir
        # can never carry silently-uncovered state.
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        pq.write_table(table, tmp, **kw)
        os.replace(tmp, path)


def read_part_markers(d: str) -> dict[int, int]:
    """{part_id: rows} from a directory of per-partition ``part-*.json``
    done markers (written with atomic_write_text) — the resume unit shared
    by the snapshot loader and the state exporter; one reader so a marker
    format change can never drift between them."""
    out: dict[int, int] = {}
    if not os.path.isdir(d):
        return out
    for f in os.listdir(d):
        if f.startswith("part-") and f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                m = json.load(fh)
            out[int(m["part_id"])] = int(m["rows"])
    return out
