"""Round-3 operator tests: scrapeable metrics endpoint, constraint
descriptors through precheck/load_snapshot, and the two-way replication
cycle (DataMarker origin-breaker convergence, the cycle_basic scenario)."""

import json
import urllib.request

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from ape_dts_ray.fixtures import gen_events, oracle_replay
from ape_dts_ray.meta import EngineConfig, TableMeta
from ape_dts_ray.pipelines.replay import replay
from ape_dts_ray.state.lake import LakeTable


def _mk_lake(tmp_path, name="lake", **cfg):
    defaults = dict(num_partitions=8, epoch_size=2000)
    defaults.update(cfg)
    return LakeTable.create(str(tmp_path / name), TableMeta(),
                            EngineConfig(**defaults))


def _get(url: str) -> bytes:
    with urllib.request.urlopen(url) as r:
        return r.read()


# ---------- metrics endpoint (task_metrics/prometheus_metrics analog) ----------

@pytest.mark.usefixtures("ray_session")
def test_metrics_endpoint_scrape_during_replay(tmp_path):
    from ape_dts_ray.pipelines.metrics import MetricsServer

    events = gen_events(seed=81, n_convs=20, max_turns=6, n_events=4000,
                        delete_frac=0.1)
    path = str(tmp_path / "ev.parquet")
    pq.write_table(events, path)
    lake = _mk_lake(tmp_path)
    srv = MetricsServer(lake.root).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        s0 = json.loads(_get(base + "/metrics.json"))
        assert s0["events_total"] == 0 and s0["watermark"] == -1

        replay(lake, events_path=path, max_offset=1999)      # first leg
        s1 = json.loads(_get(base + "/metrics.json"))
        assert s1["events_total"] == 2000
        assert s1["watermark"] == 1999
        assert s1["heartbeat_time_unix"] > 0
        assert s1["upserts_total"] + s1["deletes_total"] == s1["rows_total"]

        replay(lake, events_path=path)                       # second leg
        n, mx = events.num_rows, int(pc.max(events.column("log_offset")).as_py())
        s2 = json.loads(_get(base + "/metrics.json"))
        assert s2["events_total"] == n and s2["watermark"] == mx

        # Prometheus text exposition with TYPE lines and the table label
        text = _get(base + "/metrics").decode()
        assert "# TYPE ape_dts_ray_events_total counter" in text
        assert f'ape_dts_ray_events_total{{table="transcripts"}} {n}' in text
        assert f'ape_dts_ray_watermark{{table="transcripts"}} {mx}' in text

        # compaction folds manifests away — counters must NOT regress
        lake.compact(parallel=False)
        s3 = json.loads(_get(base + "/metrics.json"))
        assert s3["events_total"] >= n
        assert s3["watermark"] == mx
    finally:
        srv.stop()


# ---------- constraint descriptors (structure_type.rs subset) ----------

def test_set_constraints_validation(tmp_path):
    lake = _mk_lake(tmp_path)
    lake.set_constraints([{"type": "not_null", "col": "text"},
                          {"type": "unique", "cols": ["role", "text"]}])
    assert LakeTable.open(lake.root).constraints == lake.constraints
    with pytest.raises(ValueError, match="unknown constraint"):
        lake.set_constraints([{"type": "check", "expr": "x > 0"}])
    with pytest.raises(ValueError, match="needs 'col'"):
        lake.set_constraints([{"type": "not_null"}])


@pytest.mark.usefixtures("ray_session")
def test_load_snapshot_enforces_constraints(tmp_path):
    from ape_dts_ray.pipelines.snapshot import load_snapshot

    good = pa.table({
        "conv_id": pa.array(["c1", "c1", "c2"]),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "text": pa.array(["a", "b", "c"]),
    })
    lake = _mk_lake(tmp_path, "ok")
    lake.set_constraints([{"type": "not_null", "col": "text"}])
    assert load_snapshot(lake, rd.from_arrow(good))["rows"] == 3

    # NOT NULL violation → load refuses
    bad_null = good.set_column(2, "text", pa.array(["a", None, "c"]))
    lake2 = _mk_lake(tmp_path, "nn")
    lake2.set_constraints([{"type": "not_null", "col": "text"}])
    with pytest.raises(Exception, match="NOT NULL"):
        load_snapshot(lake2, rd.from_arrow(bad_null))

    # duplicate primary key → load refuses (id-col uniqueness is implicit)
    dup_pk = pa.table({
        "conv_id": pa.array(["c1", "c1"]),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "text": pa.array(["a", "b"]),
    })
    lake3 = _mk_lake(tmp_path, "uq")
    with pytest.raises(Exception, match="UNIQUE"):
        load_snapshot(lake3, rd.from_arrow(dup_pk))


def test_precheck_reports_constraint_violations(tmp_path):
    from ape_dts_ray.pipelines.precheck import precheck

    events = gen_events(seed=83, n_convs=10, max_turns=5, n_events=500,
                        delete_frac=0.1)
    # poke nulls into `role` of some upsert rows
    role = events.column("role").to_pylist()
    ops = events.column("op").to_pylist()
    k = 0
    for i, o in enumerate(ops):
        if o != "delete" and k < 5:
            role[i] = None
            k += 1
    events = events.set_column(events.column_names.index("role"), "role",
                               pa.array(role, pa.string()))
    path = str(tmp_path / "ev.parquet")
    pq.write_table(events, path)

    lake = _mk_lake(tmp_path)
    lake.set_constraints([{"type": "not_null", "col": "role"},
                          {"type": "not_null", "col": "text"}])
    res = {r.name: r for r in precheck(lake.root, path)}
    assert not res["not_null:role"].ok and "5 nulls" in res["not_null:role"].detail
    assert res["not_null:text"].ok

    # declared unique over the PK itself passes on a clean LWW stream
    lake.set_constraints([{"type": "unique", "cols": ["conv_id", "turn_idx"]}])
    res2 = {r.name: r for r in precheck(lake.root, path)}
    assert res2["unique:conv_id,turn_idx"].ok


# ---------- two-way cycle (data_marker.rs / cycle_basic convergence) ----------


class _Node:
    """One replication node: a local change LOG (its 'binlog' — arriving
    events get local offsets in arrival order, with an ``origin`` marker
    column) + the lake replaying that log, + per-peer read cursors (the
    reference tracks its position in each peer's binlog). This is the
    cycle_basic topology (docs/en/cdc/two_way.md, data_marker.rs): the
    DataMarker stamp rides as the ``origin`` column, and ingest drops
    events whose origin is this node — the cycle breaker."""

    def __init__(self, tmp_path, name: str):
        self.name = name
        self.lake = _mk_lake(tmp_path, f"node_{name}",
                             num_partitions=8, epoch_size=2000)
        self.log: pa.Table | None = None
        self.cursors: dict[str, int] = {}       # peer → next offset to read

    def _append(self, t: pa.Table) -> None:
        if t.num_rows == 0:
            return
        start = 0 if self.log is None else self.log.num_rows
        t = t.set_column(t.column_names.index("log_offset"), "log_offset",
                         pa.array(np.arange(start, start + t.num_rows,
                                            dtype=np.int64)))
        self.log = t if self.log is None else pa.concat_tables([self.log, t])

    def write_local(self, events: pa.Table) -> None:
        ev = events.append_column(
            "origin", pa.nulls(events.num_rows, pa.string()))
        self._append(ev)

    def outbound(self) -> pa.Table:
        """The node's emitted change stream: origin = original node for
        replicated events, this node for local ones (coalesce)."""
        t = self.log
        org = pc.coalesce(t.column("origin"), pa.scalar(self.name))
        return t.set_column(t.column_names.index("origin"), "origin", org)

    def pull_from(self, peer: "_Node", do_nodes=None, ignore_nodes=()) -> int:
        """Incremental consume of the peer's log from the stored cursor
        through the shared DataMarker rule (pipelines/cycle.py): keep
        origins in ``do_nodes`` (None = all), drop ``ignore_nodes`` and
        always self. Returns how many events were actually ingested."""
        from ape_dts_ray.pipelines.cycle import marker_filter

        out = peer.outbound()
        cur = self.cursors.get(peer.name, 0)
        fresh = out.filter(pc.greater_equal(out.column("log_offset"),
                                            pa.scalar(cur, pa.int64())))
        self.cursors[peer.name] = out.num_rows
        keep = marker_filter(fresh, peer.name, do_nodes,
                             {self.name, *ignore_nodes})
        self._append(keep)
        return keep.num_rows

    def sync(self) -> None:
        replay(self.lake, events_ds=rd.from_arrow(self.log))

    def state(self) -> pd.DataFrame:
        t = self.lake.state_table()
        return (t.drop_columns([c for c in ("origin",) if c in t.column_names])
                .to_pandas().reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_two_way_cycle_converges_without_ping_pong(tmp_path):
    """cycle_basic: A and B each take local writes and replicate both ways
    with origin markers + per-peer positions. After a full bidirectional
    exchange AND a reflected round (each node re-reads the peer's log,
    which now contains its own events back), both lakes hold the identical
    union state and the reflected own-events are dropped — no ping-pong."""
    ev_a = gen_events(seed=85, n_convs=12, max_turns=6, n_events=2000,
                      delete_frac=0.1)
    ev_b = gen_events(seed=86, n_convs=10, max_turns=6, n_events=1800,
                      delete_frac=0.1)
    conv_b = pc.replace_substring(ev_b.column("conv_id"), "conv-", "bnode-")
    ev_b = ev_b.set_column(ev_b.column_names.index("conv_id"), "conv_id",
                           conv_b)

    a, b = _Node(tmp_path, "A"), _Node(tmp_path, "B")
    a.write_local(ev_a)
    b.write_local(ev_b)
    a.sync()
    b.sync()

    # exchange round: each pulls the peer's stream (origin-filtered) + syncs
    got_a = a.pull_from(b)
    got_b = b.pull_from(a)
    assert got_a == ev_b.num_rows and got_b == ev_a.num_rows
    a.sync()
    b.sync()
    state_a, state_b = a.state(), b.state()

    # reflected round: each peer's log now ENDS with this node's own events
    # (stamped with this node's origin) — the cycle breaker must drop all
    # of them; nothing is appended, replay is a no-op, state unchanged
    assert a.pull_from(b) == 0
    assert b.pull_from(a) == 0
    len_a, len_b = a.log.num_rows, b.log.num_rows
    a.sync()
    b.sync()
    assert (a.log.num_rows, b.log.num_rows) == (len_a, len_b)
    pd.testing.assert_frame_equal(state_a, a.state())
    pd.testing.assert_frame_equal(state_b, b.state())

    # convergence: identical union state on both nodes, oracle-exact
    oracle = pd.concat([oracle_replay(ev_a), oracle_replay(ev_b)],
                       ignore_index=True).sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    sa = state_a.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    sb = state_b.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(sa) == len(oracle) == len(sb)
    pd.testing.assert_series_equal(sa["text"], oracle["text"],
                                   check_dtype=False, check_names=False)
    pd.testing.assert_frame_equal(sa, sb)


def test_sequences_and_comments(ray_session, tmp_path):
    """Structure-migration breadth (structure_type.rs Sequence/Comment):
    sequence handoff advances next_value to max(col)+increment over the live
    state; comments ride as Arrow schema/field metadata; both persist."""
    import pyarrow.parquet as pq

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable

    events = gen_events(seed=9, n_convs=20, n_events=3000)
    p = tmp_path / "ev.parquet"
    pq.write_table(events, str(p))
    lake = LakeTable.create(str(tmp_path / "lake"), TableMeta(),
                            EngineConfig(num_partitions=4, epoch_size=1000))
    lake.set_sequences([{"name": "turn_seq", "col": "turn_idx",
                         "increment": 1}])
    lake.set_comments([
        {"type": "table", "comment": "conversation turns"},
        {"type": "column", "column": "text", "comment": "utterance body"},
    ])
    replay(lake, events_path=str(p))
    adv = lake.advance_sequences()
    mx = lake.state_dataset(columns=["turn_idx"]).max("turn_idx")
    assert adv["turn_seq"] == mx + 1

    t = lake.state_table()
    assert t.schema.metadata[b"comment"] == b"conversation turns"
    assert t.schema.field("text").metadata[b"comment"] == b"utterance body"

    # persistence across reopen; advancing again is monotonic/idempotent
    lake2 = LakeTable.open(lake.root)
    assert lake2.sequences[0]["next_value"] == mx + 1
    assert lake2.advance_sequences()["turn_seq"] == mx + 1
    assert lake2.comments == lake.comments

    # validation
    import pytest as _pytest
    with _pytest.raises(ValueError):
        lake.set_sequences([{"name": "x"}])
    with _pytest.raises(ValueError):
        lake.set_comments([{"type": "column", "comment": "no col"}])


def _prefixed_events(seed, prefix, n_convs=8, n_events=1200):
    ev = gen_events(seed=seed, n_convs=n_convs, max_turns=6,
                    n_events=n_events, delete_frac=0.1)
    conv = pc.replace_substring(ev.column("conv_id"), "conv-", f"{prefix}-")
    return ev.set_column(ev.column_names.index("conv_id"), "conv_id", conv)


def _converged_oracle(event_sets):
    return pd.concat([oracle_replay(e) for e in event_sets],
                     ignore_index=True).sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)


def _sorted_state(node):
    return node.state().sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_star_cycle_converges_and_do_nodes_is_load_bearing(tmp_path):
    """cycle_star (dt-tests mysql_to_mysql/cdc/cycle_star_test topology,
    data_marker.rs): hub H exchanges with spokes S1/S2; links carry the
    reference's do_nodes/ignore_nodes filters (hub→spoke forwards
    {hub, other spokes}, spoke→hub ships only {spoke}). After one full link
    round all three lakes converge to the global LWW fold; a reflected
    round ships zero events. The allowlist is proven load-bearing: with
    drop-self only (cycle_basic's rule), the hub WOULD re-ingest its own
    forwards of S2's events from S1's log as duplicates."""
    from ape_dts_ray.pipelines.cycle import marker_filter, star_links

    ev = {"H": _prefixed_events(90, "hub"),
          "S1": _prefixed_events(91, "sp1"),
          "S2": _prefixed_events(92, "sp2")}
    nodes = {m: _Node(tmp_path, m) for m in ev}
    for m, node in nodes.items():
        node.write_local(ev[m])
        node.sync()

    links = star_links("H", ["S1", "S2"])
    assert {(l["src"], l["dst"]) for l in links} == \
        {("S1", "H"), ("S2", "H"), ("H", "S1"), ("H", "S2")}

    # inbound (spoke→hub) before outbound so one round fully converges —
    # in steady-state CDC all links run continuously and ordering is just
    # scheduling; a different order converges one round later
    ordered = sorted(links, key=lambda l: l["dst"] != "H")

    def run_round():
        shipped = 0
        for l in ordered:
            shipped += nodes[l["dst"]].pull_from(
                nodes[l["src"]], do_nodes=l["do"], ignore_nodes=l["ignore"])
        for node in nodes.values():
            node.sync()
        return shipped

    n_h, n_s1, n_s2 = (ev[m].num_rows for m in ("H", "S1", "S2"))
    # round 1: hub gets both spokes; each spoke gets hub + the other spoke
    assert run_round() == (n_s1 + n_s2) + (n_h + n_s2) + (n_h + n_s1)
    cur_r1 = nodes["H"].cursors["S1"]    # hub's S1-log position after round 1
    # reflected round: every link ships zero — no ping-pong, state fixed
    states = {m: _sorted_state(n) for m, n in nodes.items()}
    assert run_round() == 0
    for m, node in nodes.items():
        pd.testing.assert_frame_equal(states[m], _sorted_state(node))

    oracle = _converged_oracle(ev.values())
    for m, node in nodes.items():
        st = _sorted_state(node)
        assert len(st) == len(oracle), m
        pd.testing.assert_series_equal(st["text"], oracle["text"],
                                       check_dtype=False, check_names=False)

    # NEGATIVE: drop-self alone re-ingests hub forwards as duplicates.
    out = nodes["S1"].outbound()
    fresh = out.filter(pc.greater_equal(
        out.column("log_offset"), pa.scalar(cur_r1, pa.int64())))
    dupes_without_allowlist = marker_filter(fresh, "S1", None, {"H"})
    assert dupes_without_allowlist.num_rows == n_s2, \
        "hub re-reading S1's log must see S2-originated forwards that only " \
        "do_nodes filtering removes"


@pytest.mark.usefixtures("ray_session")
def test_net_cycle_full_mesh_converges(tmp_path):
    """cycle_net (full mesh): every pair exchanges directly and each link
    ships only the source's OWN origin (do_nodes={src}) — nobody forwards.
    One round converges all three lakes; the reflected round ships zero."""
    from ape_dts_ray.pipelines.cycle import net_links

    ev = {"A": _prefixed_events(93, "na"),
          "B": _prefixed_events(94, "nb"),
          "C": _prefixed_events(95, "nc")}
    nodes = {m: _Node(tmp_path, m) for m in ev}
    for m, node in nodes.items():
        node.write_local(ev[m])
        node.sync()

    links = net_links(["A", "B", "C"])
    assert len(links) == 6

    def run_round():
        shipped = 0
        for l in links:
            shipped += nodes[l["dst"]].pull_from(
                nodes[l["src"]], do_nodes=l["do"], ignore_nodes=l["ignore"])
        for node in nodes.values():
            node.sync()
        return shipped

    total = sum(e.num_rows for e in ev.values())
    assert run_round() == 2 * total      # each node's events reach 2 peers
    states = {m: _sorted_state(n) for m, n in nodes.items()}
    assert run_round() == 0
    for m, node in nodes.items():
        pd.testing.assert_frame_equal(states[m], _sorted_state(node))

    oracle = _converged_oracle(ev.values())
    for m, node in nodes.items():
        st = _sorted_state(node)
        assert len(st) == len(oracle), m
        pd.testing.assert_series_equal(st["text"], oracle["text"],
                                       check_dtype=False, check_names=False)
