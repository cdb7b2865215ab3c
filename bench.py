#!/usr/bin/env python
"""Benchmark driver for ape_dts_ray.

Default mode: one JSON line with the headline metric — wall seconds to replay a
generated CDC stream end-to-end (synthesize → normalize → shuffle → LWW apply →
committed Parquet lake) — plus per-query timings over $GRAFT_SF_DIR.

--scaling: run the identical replay at two parallelism levels (2/8/6/24/32 CPUs,
matching the north rule's N vs 4N cluster sizes) in fresh processes and report
throughputs + scaling efficiency; results also appended to BASELINE.md by hand.

Env: RAY_GRAFT_CPUS (default 32), GRAFT_SF_DIR (default /root/testdata/sf0.1),
BENCH_EVENTS (default 8,000,000), BENCH_QUERIES=0 to skip query timings.
"""

from __future__ import annotations

import json
import os

# one compute thread per Ray task slot — polars/arrow pools inside every worker
# oversubscribe the node otherwise (set before ray.init so workers inherit)
os.environ.setdefault("POLARS_MAX_THREADS", "1")

import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("BENCH_EVENTS", str(8_000_000)))

# block size is part of the stream definition (gen_block seeds by block_id),
# so it must be IDENTICAL across the 8- and 32-cpu scaling runs. ~18MB blocks:
# smaller blocks (tested 31k rows) flood the sort shuffle with P^2 tiny
# intermediate objects and HALVE throughput; at 4 epochs per execution both
# levels still get 32 concurrent gen/apply tasks
BLOCK = 125_000
EPOCH = 1_000_000
N_CONVS = int(os.environ.get("BENCH_CONVS", "200000"))
MAX_TURNS = 40
SEED = 42
# BENCH_NARROW=1 switches the apply to the two-pass narrow shuffle (keys
# through the sort, payload rejoined by winner offsets) — the SURVEY §7
# experiment; BENCH_TEXT_LEN grows the payload to model fat-row streams
NARROW = os.environ.get("BENCH_NARROW") == "1"
TEXT_LEN = int(os.environ.get("BENCH_TEXT_LEN", "80"))


def _wait_quiet(limit: float = 1.5, timeout: float = 600.0) -> float:
    """BASELINE.md measurement protocol (shared by the strong and weak
    ladders so the gate can never drift between them): this sandbox loses
    up to 2-3x throughput to residual load from just-finished Ray sessions,
    so a level is only recordable on a quiet machine. Returns the 1-min
    loadavg the level actually started at (recorded alongside it)."""
    t0 = time.time()
    load = os.getloadavg()[0]
    while load >= limit and time.time() - t0 < timeout:
        time.sleep(15)
        load = os.getloadavg()[0]
    return load


def _compact_host_memory() -> None:
    """Best-effort defragmentation before measuring (BASELINE.md round-4
    finding: THP allocation stalls from accumulated memory fragmentation
    degrade the identical bench ~2-3× late in a host session; one write to
    vm.compact_memory recovers most of it). Host-global side effect, so it
    only runs when explicitly requested via BENCH_COMPACT_MEM=1, and says so
    on stderr so recorded numbers carry whether compaction preceded them."""
    if os.environ.get("BENCH_COMPACT_MEM") != "1":
        return
    try:
        with open("/proc/sys/vm/compact_memory", "w") as f:
            f.write("1")
        print("bench: vm.compact_memory triggered before measurement",
              file=sys.stderr)
        time.sleep(2)
    except OSError:
        pass


def run_replay_bench() -> dict:
    import ray

    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.bench_gen import stream_factory
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable

    n_events = (N_EVENTS // EPOCH) * EPOCH or EPOCH
    factory = stream_factory(SEED, n_events, BLOCK, N_CONVS, MAX_TURNS,
                             delete_frac=0.1, hot_frac=0.05,
                             text_len=TEXT_LEN)

    root = tempfile.mkdtemp(prefix="ape_dts_bench_")
    try:
        # warm-up: one FULL-size replay — Ray grows its worker pool lazily over
        # several executions, so small warm-ups leave cold-start inside the
        # measured window (measured: compute + shuffle, not process spawn)
        for wi in range(int(os.environ.get("BENCH_WARM_RUNS", "2"))):
            warm = LakeTable.create(
                f"{root}/warm{wi}", TableMeta(),
                EngineConfig(num_partitions=64, epoch_size=EPOCH,
                             hot_keys=("conv-0000000",)))
            replay(warm, events_factory=factory, max_offset=n_events - 1,
                   group_epochs=4, pipeline_depth=2, narrow_shuffle=NARROW)
            shutil.rmtree(f"{root}/warm{wi}", ignore_errors=True)

        best, manifests = None, None
        n_trials = int(os.environ.get("BENCH_TRIALS", "2"))
        for trial in range(n_trials):    # best-of-N: local-mode variance is high
            lake = LakeTable.create(
                f"{root}/lake{trial}", TableMeta(),
                EngineConfig(num_partitions=64, epoch_size=EPOCH,
                             hot_keys=("conv-0000000",)))
            t0 = time.perf_counter()
            manifests = replay(lake, events_factory=factory,
                               max_offset=n_events - 1,
                               group_epochs=4, pipeline_depth=2,
                               narrow_shuffle=NARROW)
            dt = time.perf_counter() - t0
            applied = sum(p.events for m in manifests for p in m.partitions)
            assert applied == n_events, (applied, n_events)
            best = dt if best is None else min(best, dt)
            shutil.rmtree(f"{root}/lake{trial}", ignore_errors=True)
        return {"replay_sec": round(best, 3), "events": n_events,
                "events_per_sec": round(n_events / best, 1),
                "epochs": len(manifests)}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_query_bench() -> dict:
    import __ray_entry__ as entrymod

    out = {}
    for name, fn in sorted(entrymod.queries().items()):
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        if hasattr(res, "iter_batches"):   # Dataset → consume fully
            for _ in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
                pass
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def _host_health() -> dict:
    """Self-diagnosis embedded in the result: this sandbox's CPU allotment
    is squeezed by the host at arbitrary times (sched_getaffinity observed
    dropping 32 → 1 mid-session, and hypervisor throttling persists after
    it returns) — the identical bench measured 2.4 s healthy vs 7.8-20.5 s
    squeezed, minutes apart, on an otherwise idle box. A 2000² float64
    matmul ×3 runs well under 1 s healthy; report it so a recorded number
    can be judged against the host state it was measured under.

    The squeeze can hit WIDE work only (three same-day ladders: every
    2-24-cpu level stable, only the 32-cpu level degraded, by a different
    factor each run), which the single-thread probe cannot see — so also
    report a 16-process matmul: healthy = per-worker time ≈ the
    single-thread rate (~0.3 s for 4× 1200² here); a squeezed host shows
    per-worker times several × that while the serial probe stays clean."""
    import numpy as np
    from concurrent.futures import ProcessPoolExecutor

    t0 = time.perf_counter()
    a = np.random.default_rng(0).random((2000, 2000))
    for _ in range(3):
        a @ a
    serial = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    with ProcessPoolExecutor(16) as ex:
        workers = list(ex.map(_parallel_probe_worker, range(16)))
    return {"cpus_effective": len(os.sched_getaffinity(0)),
            "host_matmul3_sec": serial,
            "host_par16_wall_sec": round(time.perf_counter() - t0, 2),
            "host_par16_worker_max_sec": round(max(workers), 2),
            "load_1min": round(os.getloadavg()[0], 2)}


def _parallel_probe_worker(_i: int) -> float:
    import numpy as np

    a = np.random.default_rng(1).random((1200, 1200))
    t0 = time.perf_counter()
    for _ in range(4):
        a @ a
    return time.perf_counter() - t0


def main() -> None:
    import ray

    health = _host_health()
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # NOTE: ShuffleStrategy.HASH_SHUFFLE was evaluated as an alternative to
    # the default sort shuffle (our groups don't need sorted order) but a
    # trivial groupby().map_groups hangs under it in this Ray build — the
    # engine stays on SORT_SHUFFLE_PULL_BASED (details in BASELINE.md).

    _compact_host_memory()
    replay_res = run_replay_bench()
    queries = {} if os.environ.get("BENCH_QUERIES") == "0" else run_query_bench()

    result = {
        "metric": "CDC replay wall time (events -> committed Parquet lake)",
        "value": replay_res["replay_sec"],
        "unit": "sec",
        "events": replay_res["events"],
        "events_per_sec": replay_res["events_per_sec"],
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "host": health,
    }
    ray.shutdown()
    print(json.dumps(result))


def scaling() -> None:
    """Two-cluster-size evidence (north rule): identical input + pipeline at N
    and 4N CPUs in fresh processes. PRIMARY pair 2→8 (the headline
    ``scaling_efficiency``): both levels sit below this sandbox's
    single-socket memory-bandwidth ceiling, so it is the cleanest proxy for
    adding nodes. 6→24 and 8→32 are reported alongside; at those levels the
    Ray control plane (driver, raylet, object store) competes with workers
    as num_cpus approaches the core count — a penalty a real 4N-node
    cluster does not pay, since every node hosts its own raylet (full
    analysis in BASELINE.md)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_QUERIES="0",
                   BENCH_TRIALS="3")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True)
        time.sleep(10)   # let the previous Ray session's processes fully exit
        return json.loads(out.stdout.strip().splitlines()[-1])

    report = {}
    for n in (2, 8, 6, 24, 32):
        load = _wait_quiet()
        r = run(n)
        report[f"sec_{n}cpu"] = r["value"]
        report[f"events_per_sec_{n}cpu"] = r["events_per_sec"]
        report[f"load1_{n}cpu"] = round(load, 2)
        report["events"] = r["events"]
    for lo, hi in ((2, 8), (6, 24), (8, 32)):
        report[f"scaling_efficiency_{lo}_{hi}"] = round(
            report[f"events_per_sec_{hi}cpu"]
            / (4 * report[f"events_per_sec_{lo}cpu"]), 3)
    # primary N→4N pair: both levels below the single-socket memory-bandwidth
    # ceiling of this sandbox (see BASELINE.md) — the proxy for node scaling
    report["scaling_efficiency"] = report["scaling_efficiency_2_8"]
    print(json.dumps(report))


def _psi(kind: str) -> dict:
    """/proc/pressure/{kind} cumulative stall totals (µs), keyed some/full."""
    out = {}
    try:
        with open(f"/proc/pressure/{kind}") as f:
            for line in f:
                parts = line.split()
                out[parts[0]] = int(parts[-1].split("=")[1])
    except OSError:
        pass
    return out


def _vmstat(keys=("compact_stall", "compact_fail", "thp_fault_fallback",
                  "compact_migrate_scanned", "allocstall_normal")) -> dict:
    out = {}
    try:
        with open("/proc/vmstat") as f:
            for line in f:
                k, _, v = line.partition(" ")
                if k in keys:
                    out[k] = int(v)
    except OSError:
        pass
    return out


def weak_scaling() -> None:
    """WEAK-scaling ladder: fixed events PER CORE, so under perfect engine
    scaling every level's wall time is identical — a rising wall time with
    core count is, by construction, a shared-resource (memory-bus/allocator)
    effect, not an engine serial section. This is the direct within-run
    separation of engine-vs-machine the strong-scaling pairs cannot give on
    one socket (no `perf` binary in this sandbox, so the counter evidence is
    PSI stall totals + /proc/vmstat compaction/THP counters per level).

    Output adds, per level: wall secs, events/s/core, and the DELTAS of
    cpu/memory pressure-stall totals and vmstat counters across the level's
    subprocess (warmups included — deltas are attribution evidence, not a
    per-event rate)."""
    per_core = int(os.environ.get("BENCH_WEAK_PER_CORE", "500000"))

    levels = tuple(int(x) for x in os.environ.get(
        "BENCH_WEAK_LEVELS", "2,8,32").split(","))
    report = {"mode": "weak_scaling", "events_per_core": per_core,
              "levels": list(levels)}
    for n in levels:
        load = _wait_quiet()
        cpu0, mem0, vm0 = _psi("cpu"), _psi("memory"), _vmstat()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n), BENCH_QUERIES="0",
                   BENCH_TRIALS="2", BENCH_EVENTS=str(per_core * n))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        cpu1, mem1, vm1 = _psi("cpu"), _psi("memory"), _vmstat()
        report[f"sec_{n}cpu"] = r["value"]
        report[f"events_{n}cpu"] = r["events"]
        report[f"events_per_sec_per_core_{n}cpu"] = round(
            r["events_per_sec"] / n, 1)
        report[f"load1_{n}cpu"] = round(load, 2)
        report[f"psi_cpu_some_us_{n}cpu"] = cpu1.get("some", 0) - cpu0.get("some", 0)
        report[f"psi_mem_some_us_{n}cpu"] = mem1.get("some", 0) - mem0.get("some", 0)
        report[f"psi_mem_full_us_{n}cpu"] = mem1.get("full", 0) - mem0.get("full", 0)
        for k in vm0:
            report[f"vm_{k}_{n}cpu"] = vm1.get(k, 0) - vm0.get(k, 0)
        time.sleep(10)
    # flat wall time across levels = the engine scales; <1 quantifies the
    # shared-resource inflation at k× the cores on k× the work. Computed as
    # the PER-CORE-THROUGHPUT ratio, which stays exact even when main()'s
    # EPOCH rounding nudges a level's actual event count off n × per_core
    # (e.g. BENCH_WEAK_PER_CORE=250000 at 2 cpus rounds 500k up to 1M).
    for lo in levels:
        for hi in levels:
            if hi > lo:
                report[f"weak_efficiency_{lo}_{hi}"] = round(
                    report[f"events_per_sec_per_core_{hi}cpu"]
                    / report[f"events_per_sec_per_core_{lo}cpu"], 3)
    print(json.dumps(report))


def follow_bench() -> None:
    """Sustained-follow probe: stage the bench stream as parquet segments,
    reveal them to a RUNNING ``replay_follow`` in waves, and measure pure
    catch-up time (reveal → watermark reaches the wave's max). Reports
    sustained events/s through the daemon loop (poll + footer scan + replay
    + commit + online compaction) vs the one-shot replay of the same files.
    Env: BENCH_FOLLOW_EVENTS (default 16M), BENCH_FOLLOW_WAVES (default 4)."""
    import shutil
    import threading

    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.bench_gen import stream_factory
    from ape_dts_ray.pipelines.follow import replay_follow
    from ape_dts_ray.pipelines.replay import EpochWindow, replay
    from ape_dts_ray.state.lake import LakeTable

    n_events = int(os.environ.get("BENCH_FOLLOW_EVENTS", str(16_000_000)))
    n_events = (n_events // EPOCH) * EPOCH or EPOCH
    waves = int(os.environ.get("BENCH_FOLLOW_WAVES", "4"))
    factory = stream_factory(SEED, n_events, BLOCK, N_CONVS, MAX_TURNS,
                             delete_frac=0.1, hot_frac=0.05,
                             text_len=TEXT_LEN)
    root = tempfile.mkdtemp(prefix="ape_dts_follow_bench_")
    try:
        stage = os.path.join(root, "stage")
        log = os.path.join(root, "log")
        os.makedirs(log)
        segs = []
        for e in range(n_events // EPOCH):     # one segment file per epoch
            w = EpochWindow(e, e * EPOCH, (e + 1) * EPOCH - 1)
            d = os.path.join(stage, f"ep{e:04d}")
            factory(w).write_parquet(d)
            segs.append((d, w.hi))

        lake = LakeTable.create(
            os.path.join(root, "lake"), TableMeta(),
            EngineConfig(num_partitions=64, epoch_size=EPOCH,
                         hot_keys=("conv-0000000",)))
        stop = os.path.join(root, "stop")
        box: dict = {}

        def run():
            try:
                box["stats"] = replay_follow(
                    lake, log, poll_interval=0.05, stop_file=stop,
                    group_epochs=4, pipeline_depth=2,
                    auto_compact_max_deltas=16)
            except BaseException as exc:
                box["exc"] = exc

        th = threading.Thread(target=run)
        th.start()
        per_wave = []
        chunk = max(1, len(segs) // waves)
        k = 0
        try:
            for lo in range(0, len(segs), chunk):
                wave = segs[lo:lo + chunk]
                for d, _ in wave:
                    for f in sorted(os.listdir(d)):
                        os.rename(os.path.join(d, f), os.path.join(
                            log, f"seg{k:06d}.parquet"))
                        k += 1
                target = wave[-1][1]
                t0 = time.perf_counter()
                while LakeTable.open(lake.root).watermark() < target:
                    if "exc" in box:
                        raise box["exc"]
                    time.sleep(0.02)
                per_wave.append(time.perf_counter() - t0)
        finally:
            open(stop, "w").close()
            th.join(timeout=600)
        if "exc" in box:
            raise box["exc"]
        catchup = sum(per_wave)

        one = LakeTable.create(
            os.path.join(root, "oneshot"), TableMeta(),
            EngineConfig(num_partitions=64, epoch_size=EPOCH,
                         hot_keys=("conv-0000000",)))
        t0 = time.perf_counter()
        replay(one, events_path=sorted(
            os.path.join(log, f) for f in os.listdir(log)),
            group_epochs=4, pipeline_depth=2)
        oneshot = time.perf_counter() - t0

        print(json.dumps({
            "mode": "follow", "events": n_events, "waves": waves,
            "catchup_sec": round(catchup, 3),
            "events_per_sec_follow": round(n_events / catchup, 1),
            "per_wave_sec": [round(x, 3) for x in per_wave],
            "oneshot_sec": round(oneshot, 3),
            "events_per_sec_oneshot": round(n_events / oneshot, 1),
            "follow_overhead": round(catchup / oneshot, 3),
            "replay_rounds": box["stats"].replay_rounds,
            "num_cpus": NCPU,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--weak" in sys.argv:
        weak_scaling()
    elif "--follow" in sys.argv:
        follow_bench()
    else:
        main()
