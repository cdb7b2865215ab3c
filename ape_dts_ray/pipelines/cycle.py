"""Cyclic-replication origin markers — the DataMarker model.

Re-expresses dt-connector/src/data_marker.rs (config model
dt-common/src/config/data_marker_config.rs; scenarios
dt-tests/tests/*/cdc/cycle_{basic,star,net}_test) for Parquet-log nodes:

- Every node's change log carries an ``origin`` string column; local writes
  leave it NULL and the outbound stamp coalesces NULL → the emitting node's
  name (data_marker.rs: the marker transaction written ahead of each batch).
- A replication LINK (src_node → dst_node) filters by origin exactly like
  the reference's ``[data_marker]`` section: keep events whose origin is in
  ``do_nodes`` and not in ``ignore_nodes``. The reference topologies:
    * cycle_basic (A↔B):    do={src}, ignore={dst}
    * cycle_star (hub h, spokes s1..sn):
        spoke→hub: do={spoke},            ignore={hub} ∪ other spokes
        hub→spoke: do={hub} ∪ others,     ignore={spoke}
      (topo1_node1_to_node2/task_config.ini: do_nodes=node1,node3
       ignore_nodes=node2 — the hub FORWARDS third-party origins, which is
       why origin must be preserved, not re-stamped, on forwarded rows)
    * cycle_net (full mesh): do={src}, ignore=everything else — each pair
      exchanges directly, nobody forwards.
- do_nodes is the load-bearing half on multi-hop topologies: a hub
  re-reading a spoke's log sees its own forwards reflected back with
  third-party origins; dropping only origin==self would re-ingest them as
  duplicates. The reference encodes the same rule in its per-task configs.

Scale shape: ``ship_link`` is a Dataset filter+map+write (no driver
landing); the written shard is counted from parquet footers, and per-key
LWW order survives because a key originates on exactly one node, every
link ships a key's events in original relative order, and the offset shift
is a per-link constant.
"""

from __future__ import annotations

import glob
import os
import shutil
from collections.abc import Iterable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def marker_filter(t: pa.Table, src_node: str,
                  do_nodes: Iterable[str] | None = None,
                  ignore_nodes: Iterable[str] = ()) -> pa.Table:
    """Stamp + filter one outbound batch of ``src_node``'s log.

    Coalesces NULL origin to ``src_node`` (local writes), then applies the
    data_marker keep rule. ``do_nodes=None`` keeps every non-ignored origin
    (cycle_basic's two-node case needs no allowlist)."""
    org = pc.coalesce(t.column("origin"), pa.scalar(src_node))
    t = t.set_column(t.column_names.index("origin"), "origin", org)
    mask = None
    if do_nodes is not None:
        mask = pc.is_in(t.column("origin"),
                        value_set=pa.array(sorted(set(do_nodes)), pa.string()))
    ign = sorted(set(ignore_nodes))
    if ign:
        not_ign = pc.invert(pc.is_in(t.column("origin"),
                                     value_set=pa.array(ign, pa.string())))
        mask = not_ign if mask is None else pc.and_(mask, not_ign)
    return t if mask is None else t.filter(mask)


def ship_link(src_log_dir: str, out_dir: str, cursor: int,
              src_node: str, dst_node: str,
              do_nodes: Iterable[str] | None = None,
              ignore_nodes: Iterable[str] | None = None,
              offset_base: int = 0) -> int:
    """Run one replication link: read ``src_node``'s Parquet log past
    ``cursor``, apply the origin-marker rule, shift offsets by
    ``offset_base`` (append past the destination's local range) and write
    the shard to ``out_dir``. Returns the shipped row count (from footers —
    single pipeline execution, no count()+write double run).

    ``ignore_nodes`` defaults to {dst_node}: never ship a node its own
    events back (the cycle breaker every reference config includes)."""
    import ray.data

    ign = {dst_node} if ignore_nodes is None else set(ignore_nodes) | {dst_node}

    def stamp(t: pa.Table) -> pa.Table:
        t = marker_filter(t, src_node, do_nodes, ign)
        off = pc.add(t.column("log_offset"),
                     pa.scalar(offset_base, pa.int64()))
        return t.set_column(t.column_names.index("log_offset"),
                            "log_offset", off)

    # a retried shipment into the same out_dir must not double-count: Ray
    # writes per-run UUID file names in place, so a crash mid-write leaves
    # a partial set the retry would add to (and the footer count below
    # would sum BOTH) — start each shipment from an empty dir
    shutil.rmtree(out_dir, ignore_errors=True)
    src_ds = ray.data.read_parquet(src_log_dir).filter(
        expr=f"log_offset >= {cursor}")
    src_ds.map_batches(stamp, batch_format="pyarrow").write_parquet(
        out_dir, min_rows_per_file=1)
    got = sum(pq.ParquetFile(f).metadata.num_rows
              for f in glob.glob(os.path.join(out_dir, "*.parquet")))
    if got == 0:
        shutil.rmtree(out_dir, ignore_errors=True)   # no empty log shard
    return got


def star_links(hub: str, spokes: list[str]) -> list[dict]:
    """The cycle_star link table (one dict per reference task config)."""
    links = []
    for s in spokes:
        links.append({"src": s, "dst": hub, "do": {s},
                      "ignore": {hub, *(o for o in spokes if o != s)}})
        links.append({"src": hub, "dst": s,
                      "do": {hub, *(o for o in spokes if o != s)},
                      "ignore": {s}})
    return links


def net_links(nodes: list[str]) -> list[dict]:
    """The cycle_net link table: full mesh, each link ships only the
    source's own origin."""
    return [{"src": a, "dst": b, "do": {a},
             "ignore": {n for n in nodes if n != a}}
            for a in nodes for b in nodes if a != b]
