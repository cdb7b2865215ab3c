"""Randomized crash/race soak for MAINTENANCE DDL racing a live follower:
replay_follow in a subprocess over a growing log while truncate() or
compact(new_hot_keys=...) runs concurrently from another process — both
optionally SIGKILLed at random moments and re-run (the documented recovery:
markers + maintenance lock + strict epoch GC). The follower is expected to
die LOUDLY on the marker refusal mid-op and is restarted once the op
completes. Final state must equal a one-shot oracle replay:
  truncate: events with log_offset > the persisted truncate floor
  rotation: all events (rotation is state-preserving)
Usage: python soak_maint.py <n_iters> [master_seed]
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

ROOT = os.environ.get("APE_DTS_RAY_SOAK_DIR", "/tmp/vdrive") + "/soakmaint"
REPO = os.environ.get("APE_DTS_RAY_REPO", "/root/repo")
sys.path.insert(0, REPO)  # script dir, not cwd, is on sys.path

FOLLOWER_SRC = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ape_dts_ray.pipelines.follow import replay_follow
from ape_dts_ray.state.lake import LakeTable
lake = LakeTable.open({lake!r})
stats = replay_follow(lake, {log!r}, poll_interval=0.05,
                      stop_file={stop!r},
                      auto_compact_max_deltas={acd})
print("follower stats:", stats, flush=True)
ray.shutdown()
"""

MAINT_SRC = """
import sys, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ape_dts_ray.state.lake import LakeTable
deadline = time.time() + 120
while True:
    lake = LakeTable.open({lake!r})
    try:
        if {op!r} == "truncate":
            lake.truncate()
        else:
            lake.compact(new_hot_keys=("conv-000000",), parallel=True)
        break
    except RuntimeError as e:
        # maintenance lock busy (follower auto-compact tick) or a marker
        # left by OUR OWN earlier killed attempt that this path refuses —
        # retry; strict-GC ENOTEMPTY raises retry the same way
        if time.time() > deadline:
            raise
        time.sleep(0.2)
    except OSError:
        if time.time() > deadline:
            raise
        time.sleep(0.2)
print("maint done floor:", LakeTable.open({lake!r}).truncate_offset,
      flush=True)
ray.shutdown()
"""


def state_md5(lake_root):
    from ape_dts_ray.state.lake import LakeTable
    t = LakeTable.open(lake_root).state_table()
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    return hashlib.md5(str(t.to_pydict()).encode()).hexdigest(), t.num_rows


def spawn(src, tag):
    err = open(f"/tmp/soakm_{tag}.err", "w")
    return subprocess.Popen(
        [sys.executable, "-c", src], stdout=subprocess.PIPE,
        stderr=err, text=True,
        env={**os.environ, "RAY_DEDUP_LOGS": "0"})


def one_iter(it, seed):
    rng = random.Random(seed)
    import pyarrow.compute as pc
    import ray.data as rd
    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.meta import EngineConfig, TableMeta
    from ape_dts_ray.pipelines.follow import _file_offset_span
    from ape_dts_ray.pipelines.replay import replay
    from ape_dts_ray.state.lake import LakeTable

    shutil.rmtree(ROOT, ignore_errors=True)
    stage, log = os.path.join(ROOT, "stage"), os.path.join(ROOT, "log")
    os.makedirs(log)
    n_events = rng.choice([40_000, 60_000])
    n_segs = rng.choice([6, 9])
    t = gen_events(n_events=n_events, n_convs=rng.choice([200, 400]),
                   seed=seed & 0xffff)
    rd.from_arrow(t).repartition(n_segs).write_parquet(stage)
    files = sorted(glob.glob(os.path.join(stage, "*.parquet")))
    files.sort(key=lambda p: _file_offset_span(p, "log_offset")[0])

    cfg = EngineConfig(num_partitions=rng.choice([4, 8]),
                       epoch_size=rng.choice([5_000, 10_000]))
    lake_root = os.path.join(ROOT, "lake")
    LakeTable.create(lake_root, TableMeta(), cfg)
    stop = os.path.join(ROOT, "stop")
    acd = rng.choice(["None", "4"])
    op = rng.choice(["truncate", "rotate"])
    kill_maint = rng.random() < 0.5
    kill_follower = rng.random() < 0.4

    fsrc = FOLLOWER_SRC.format(repo=REPO, lake=lake_root, log=log,
                               stop=stop, acd=acd)
    msrc = MAINT_SRC.format(repo=REPO, lake=lake_root, op=op)
    follower = spawn(fsrc, "follower")

    # phase 1: feed roughly half the segments
    split = rng.randrange(2, len(files) - 1)
    for i, p in enumerate(files[:split]):
        os.rename(p, os.path.join(log, f"seg{i:03d}.parquet"))
        time.sleep(rng.uniform(0.3, 1.5))
    if kill_follower:
        time.sleep(rng.uniform(0.0, 1.0))
        follower.send_signal(signal.SIGKILL)
        follower.wait()
        follower = spawn(fsrc, "follower-restart")
        time.sleep(rng.uniform(0.0, 1.0))

    # phase 2: maintenance op races the live follower
    maint = spawn(msrc, "maint")
    kills = 0
    if kill_maint:
        time.sleep(rng.uniform(0.5, 4.0))
        if maint.poll() is None:
            maint.send_signal(signal.SIGKILL)
            maint.wait()
            kills = 1
            maint = spawn(msrc, "maint-retry")   # finish the torn op
    mout, _ = maint.communicate(timeout=180)
    if maint.returncode != 0:
        raise RuntimeError(f"iter {it} seed {seed}: maint rc="
                           f"{maint.returncode}\n{mout}")
    floor = int(mout.strip().split()[-1])

    # the follower may have died on the marker/commit refusal — restart it
    frestarts = 0
    if follower.poll() is not None:
        frestarts = 1
        follower = spawn(fsrc, "follower-after-maint")

    # phase 3: feed the rest
    for i, p in enumerate(files[split:]):
        os.rename(p, os.path.join(log, f"seg{split + i:03d}.parquet"))
        time.sleep(rng.uniform(0.2, 1.0))

    max_off = max(_file_offset_span(os.path.join(log, f), "log_offset")[1]
                  for f in os.listdir(log))
    t0 = time.time()
    while True:
        try:
            if LakeTable.open(lake_root).watermark() >= max_off:
                break
        except FileNotFoundError:
            pass
        if follower.poll() is not None:
            # one more marker-window death (e.g. it was mid-commit when the
            # RETRIED maintenance landed) — restart, bounded
            if frestarts >= 3:
                out, _ = follower.communicate(timeout=30)
                raise RuntimeError(f"iter {it} seed {seed}: follower kept "
                                   f"dying\n{out}")
            frestarts += 1
            follower = spawn(fsrc, f"follower-r{frestarts}")
        if time.time() - t0 > 180:
            raise TimeoutError(f"iter {it} seed {seed}: watermark never "
                               f"reached {max_off}")
        time.sleep(0.2)
    open(stop, "w").close()
    out, _ = follower.communicate(timeout=180)
    if follower.returncode != 0:
        raise RuntimeError(f"iter {it} seed {seed}: follower rc="
                           f"{follower.returncode}\n{out}")

    md5_f, rows_f = state_md5(lake_root)
    # one-shot oracle: truncate → only events past the persisted floor;
    # rotation → everything (state-preserving repartition)
    if op == "truncate":
        want = t.filter(pc.greater(t.column("log_offset"), floor))
    else:
        want = t
    oneshot = LakeTable.create(os.path.join(ROOT, "oneshot"), TableMeta(), cfg)
    if want.num_rows:
        replay(oneshot, events_ds=rd.from_arrow(want),
               min_offset=floor + 1 if op == "truncate" else 0,
               heartbeat=False)
    md5_o, rows_o = state_md5(oneshot.root)
    ok = md5_f == md5_o and rows_f == rows_o
    print(f"iter {it} seed={seed} op={op} events={n_events} segs={n_segs} "
          f"acd={acd} kill_m={kills} f_restarts={frestarts} floor={floor} "
          f"rows={rows_f}/{rows_o} {'CONVERGED' if ok else 'DIVERGED'}",
          flush=True)
    if not ok:
        raise AssertionError(f"iter {it} seed {seed} DIVERGED: "
                             f"{md5_f}/{rows_f} vs {md5_o}/{rows_o}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    master = int(sys.argv[2]) if len(sys.argv) > 2 else int(time.time())
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
