"""Randomized crash/race soak: replay_follow in a SUBPROCESS over a growing
log, SIGKILLed at a random moment and restarted fresh, while a separate
process loops compact() on the same lake the whole time (across the kill).
Feeder keeps nondecreasing offset order (the documented follow contract) but
randomizes wave sizes and cadence per seeded iteration. Final state must be
hash-equal to a one-shot replay of the full log.

Usage: python soak_random.py <n_iters> [master_seed]
"""
import glob
import hashlib
import os
import random
import shutil
import signal
import subprocess
import sys
import time

ROOT = os.environ.get("APE_DTS_RAY_SOAK_DIR", "/tmp/vdrive") + "/soakrand"
REPO = os.environ.get("APE_DTS_RAY_REPO", "/root/repo")
sys.path.insert(0, REPO)  # script dir, not cwd, is on sys.path

FOLLOWER_SRC = """
import sys, os
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ape_dts_ray.state.lake import LakeTable
from ape_dts_ray.pipelines.follow import replay_follow
lake = LakeTable.open({lake!r})
stats = replay_follow(lake, {log!r}, poll_interval=0.05,
                      stop_file={stop!r}, pipeline_depth=1,
                      auto_compact_max_deltas={acd})
print("follower stats:", stats, flush=True)
ray.shutdown()
"""

COMPACTOR_SRC = """
import os, sys, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ape_dts_ray.state.lake import LakeTable
n = 0
while not os.path.exists({cstop!r}):
    try:
        LakeTable.open({lake!r}).compact()
        n += 1
    except FileNotFoundError:
        pass
    time.sleep({pause})
print("compactions:", n, flush=True)
ray.shutdown()
"""


def state_md5(lake_root):
    from ape_dts_ray.state.lake import LakeTable
    t = LakeTable.open(lake_root).state_table()
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    return hashlib.md5(str(t.to_pydict()).encode()).hexdigest(), t.num_rows


def spawn(src, tag):
    err = open(f"/tmp/soak_{tag}.err", "w")
    return subprocess.Popen(
        [sys.executable, "-c", src], stdout=subprocess.PIPE,
        stderr=err, text=True,
        env={**os.environ, "RAY_DEDUP_LOGS": "0"})


def one_iter(it, seed):
    rng = random.Random(seed)
    import ray
    import ray.data as rd
    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.follow import _file_offset_span
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable

    shutil.rmtree(ROOT, ignore_errors=True)
    stage, log = os.path.join(ROOT, "stage"), os.path.join(ROOT, "log")
    os.makedirs(log)
    n_events = rng.choice([60_000, 90_000, 126_000])
    n_segs = rng.choice([4, 6, 9])
    t = gen_events(n_events=n_events, n_convs=rng.choice([200, 400]),
                   seed=seed & 0xffff)
    rd.from_arrow(t).repartition(n_segs).write_parquet(stage)
    files = sorted(glob.glob(os.path.join(stage, "*.parquet")))
    files.sort(key=lambda p: _file_offset_span(p, "log_offset")[0])

    cfg = EngineConfig(num_partitions=rng.choice([4, 8]),
                       epoch_size=rng.choice([10_000, 20_000]))
    lake_root = os.path.join(ROOT, "lake")
    LakeTable.create(lake_root, TableMeta(), cfg)
    stop = os.path.join(ROOT, "stop")
    cstop = os.path.join(ROOT, "cstop")   # follower unlinks ITS stop file
    acd = rng.choice(["None", "4"])

    fsrc = FOLLOWER_SRC.format(repo=REPO, lake=lake_root, log=log,
                               stop=stop, acd=acd)
    csrc = COMPACTOR_SRC.format(repo=REPO, lake=lake_root, cstop=cstop,
                                pause=rng.choice([0.05, 0.2]))
    follower = spawn(fsrc, "follower")
    compactor = spawn(csrc, "compactor")

    # feed segments in offset order with randomized cadence; SIGKILL the
    # follower once, at a random point while feeding, and restart it fresh
    kill_after = rng.randrange(1, len(files))
    killed = False
    for i, p in enumerate(files):
        os.rename(p, os.path.join(log, f"seg{i:03d}.parquet"))
        time.sleep(rng.uniform(0.5, 3.0))
        if not killed and i + 1 >= kill_after:
            time.sleep(rng.uniform(0.0, 2.0))
            follower.send_signal(signal.SIGKILL)
            follower.wait()
            killed = True
            time.sleep(rng.uniform(0.0, 1.0))
            follower = spawn(fsrc, "follower-restart")
    # wait until the follower's watermark covers everything fed — the stop
    # file halts at the next ROUND boundary without draining pending
    # segments (by design), so stopping earlier loses the tail legally
    max_off = max(_file_offset_span(os.path.join(log, f), "log_offset")[1]
                  for f in os.listdir(log))
    t0 = time.time()
    while True:
        try:
            lk = LakeTable.open(lake_root)
            if lk.watermark() >= max_off:
                break
        except FileNotFoundError:
            pass
        if time.time() - t0 > 150:
            raise TimeoutError(f"iter {it} seed {seed}: follower never "
                               f"reached watermark {max_off}")
        time.sleep(0.2)
    open(stop, "w").close()
    out, _ = follower.communicate(timeout=180)
    if follower.returncode != 0:
        raise RuntimeError(
            f"iter {it} seed {seed}: follower rc={follower.returncode}\n{out}")
    open(cstop, "w").close()
    cout, _ = compactor.communicate(timeout=120)
    if compactor.returncode != 0:
        raise RuntimeError(
            f"iter {it} seed {seed}: compactor rc={compactor.returncode}")

    md5_f, rows_f = state_md5(lake_root)
    oneshot = LakeTable.create(os.path.join(ROOT, "oneshot"), TableMeta(), cfg)
    segs = sorted(glob.glob(os.path.join(log, "*.parquet")))
    replay(oneshot, events_path=segs)
    md5_o, rows_o = state_md5(oneshot.root)
    ok = md5_f == md5_o and rows_f == rows_o
    print(f"iter {it} seed={seed} events={n_events} segs={n_segs} "
          f"acd={acd} kill@{kill_after} {cout.strip()} "
          f"rows={rows_f}/{rows_o} {'CONVERGED' if ok else 'DIVERGED'}",
          flush=True)
    if not ok:
        raise AssertionError(f"iter {it} seed {seed} DIVERGED: "
                             f"{md5_f}/{rows_f} vs {md5_o}/{rows_o}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    master = int(sys.argv[2]) if len(sys.argv) > 2 else int(time.time())
    if os.environ.get("SOAK_ONE_SEED"):
        import ray
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        one_iter(0, int(os.environ["SOAK_ONE_SEED"]))
        ray.shutdown()
        return
    print(f"master seed {master}, {n} iters", flush=True)
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    explicit = os.environ.get("APE_SOAK_SEEDS")
    if explicit:
        # replay exact per-iteration seeds (e.g. a diverged one) verbatim
        for it, s in enumerate(explicit.split(",")):
            one_iter(it, int(s))
    else:
        rng = random.Random(master)
        for it in range(n):
            one_iter(it, rng.randrange(1 << 30))
    print("ALL CONVERGED", flush=True)
    ray.shutdown()


main()
