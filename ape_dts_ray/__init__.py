"""ape_dts_ray — a from-scratch, Ray-Data-native CDC / incremental-ingest engine.

Semantics match loomts/ape-dts (reference at /root/reference, cited per-module as
file:line); the architecture is idiomatic Ray Data: ``ray.data.Dataset`` pipelines,
``map_batches`` over zero-copy Arrow batches, actor pools for stateful stages, one
explicit hash shuffle per epoch, streaming execution with backpressure.

Core pipeline (SURVEY.md §7):

    change-event Parquet (offset-ordered log over transcripts)
      → read (epoch-windowed, schema-barrier cut)
      → normalize / filter / route        (stateless map_batches)
      → hash shuffle by PK partition      (groupby(part_id))
      → per-partition LWW merge + delta write + lineage (stateful apply)
      → atomic epoch-manifest commit      (exactly-once, resumable)
      → merge-on-read state / compaction
"""

from ape_dts_ray.meta import TRANSCRIPT_FIELDS, TableMeta, transcript_schema
from ape_dts_ray.state.lake import LakeTable

__all__ = ["TableMeta", "TRANSCRIPT_FIELDS", "transcript_schema", "LakeTable"]
__version__ = "0.1.0"
