"""Randomized crash/race soak for the MIXED daemon: replay_follow_mixed in a
SUBPROCESS over a growing interleaved log (a `table` column per event, two
target lakes), SIGKILLed once at a random moment and restarted fresh, while a
separate process loops compact() over BOTH lakes the whole time — and, per
iteration, HOT-KEY ROTATES a lake a bounded number of times at random ticks
(compact(new_hot_keys=...)): a rotation racing an in-flight round DEFERS the
daemon's round (MaintenanceInProgress; it retries and re-plans under each
lake's persisted salt per table — pre-fix the follower died on every refusal
and starved under rotation churn, seed 785203650). Rotations are BOUNDED per
iteration, not a per-tick probability forever: an operator rotates rarely,
and unbounded ~5 attempts/sec keeps a marker up most of wall time — the
daemon then correctly defers all the way to the drain timeout (seed
923500474), which probes nothing. The restart path stays as a safety net
for a grace-window expiry. Final state of both lakes must equal a one-shot
replay_mixed of the full log (rotation is state-preserving, so the oracle
is unchanged).
Usage: python soak_mixed.py <n_iters> [master_seed]
APE_SOAK_SEEDS=<s1,s2,...> replays exact per-iteration seeds.
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

ROOT = os.environ.get("APE_DTS_RAY_SOAK_DIR", "/tmp/vdrive") + "/soakmixed"
REPO = os.environ.get("APE_DTS_RAY_REPO", "/root/repo")
sys.path.insert(0, REPO)  # script dir, not cwd, is on sys.path
TABLES = ["tbl_even", "tbl_odd"]

FOLLOWER_SRC = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ape_dts_ray.meta import EngineConfig
from ape_dts_ray.pipelines.follow import replay_follow_mixed
cfg = EngineConfig(num_partitions={P}, epoch_size={ES})
stats = replay_follow_mixed({lakes!r}, {tables!r}, {log!r},
                            poll_interval=0.05, stop_file={stop!r},
                            config=cfg)
print("follower stats:", stats, flush=True)
ray.shutdown()
"""

COMPACTOR_SRC = """
import os, random, sys, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ape_dts_ray.state.lake import LakeTable
rng = random.Random({cseed})
n = 0
rot = 0
rot_budget = {rotate_n}
while not os.path.exists({cstop!r}):
    for t in {tables!r}:
        try:
            lk = LakeTable.open(os.path.join({lakes!r}, t))
            if rot_budget > 0 and rng.random() < 0.08:
                # occasional HOT-KEY ROTATION of one lake, BOUNDED per
                # iteration (operators rotate rarely; unbounded churn just
                # starves the drain — see module docstring): the follower
                # defers the racing round (MaintenanceInProgress) and must
                # adopt the persisted salt per table next round. Key parity
                # matches the table.
                par = 0 if t == "tbl_even" else 1
                key = "conv-%06d" % rng.choice([par, par + 2, par + 4])
                lk.compact(new_hot_keys=(key,))
                rot += 1
                rot_budget -= 1
            else:
                lk.compact()
            n += 1
        except FileNotFoundError:
            pass
        except (RuntimeError, OSError):
            pass   # maintenance lock busy / marker left by a racing op
    time.sleep({pause})
print("compactions:", n, "rotations:", rot, flush=True)
ray.shutdown()
"""


def state_md5(lakes_root):
    import pyarrow as pa

    from ape_dts_ray.state.lake import LakeTable
    pieces = []
    for n in TABLES:
        t = LakeTable.open(os.path.join(lakes_root, n)).state_table()
        pieces.append(t.append_column("tbl", pa.array([n] * t.num_rows)))
    t = pa.concat_tables(pieces)
    rows = sorted(map(str, t.to_pylist()))
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), t.num_rows


def spawn(src, tag):
    err = open(f"/tmp/soakmixed_{tag}.err", "w")
    return subprocess.Popen([sys.executable, "-c", src],
                            stdout=subprocess.PIPE, stderr=err, text=True)


def one_iter(it, seed):
    rng = random.Random(seed)
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ape_dts_ray.fixtures import gen_events
    from ape_dts_ray.meta import EngineConfig
    from ape_dts_ray.pipelines.follow import _file_offset_span
    from ape_dts_ray.pipelines.multitable import replay_mixed
    from ape_dts_ray.state.lake import LakeTable

    shutil.rmtree(ROOT, ignore_errors=True)
    stage, log = os.path.join(ROOT, "stage"), os.path.join(ROOT, "log")
    os.makedirs(log)

    def add_table(t):
        ti = pc.cast(pc.utf8_slice_codeunits(t.column("conv_id"), 5, 99),
                     pa.int64())
        tbl = pc.if_else(pc.equal(pc.bit_wise_and(ti, 1), 0),
                         pa.scalar("tbl_even"), pa.scalar("tbl_odd"))
        return t.append_column("table", tbl)

    n_events = rng.choice([60_000, 90_000])
    n_segs = rng.choice([4, 6])
    t = gen_events(n_events=n_events, n_convs=rng.choice([200, 400]),
                   seed=seed & 0xffff)
    rd.from_arrow(add_table(t)).repartition(n_segs).write_parquet(stage)
    files = sorted(glob.glob(os.path.join(stage, "*.parquet")))
    files.sort(key=lambda p: _file_offset_span(p, "log_offset")[0])

    P = rng.choice([4, 8])
    ES = rng.choice([10_000, 20_000])
    lakes = os.path.join(ROOT, "lakes")
    stop = os.path.join(ROOT, "stop")
    cstop = os.path.join(ROOT, "cstop")
    fsrc = FOLLOWER_SRC.format(repo=REPO, P=P, ES=ES, lakes=lakes,
                               tables=TABLES, log=log, stop=stop)
    rotate_n = rng.choice([0, 2, 5])
    csrc = COMPACTOR_SRC.format(repo=REPO, cstop=cstop, tables=TABLES,
                                lakes=lakes, pause=rng.choice([0.05, 0.2]),
                                cseed=seed ^ 0x5f5f, rotate_n=rotate_n)
    follower = spawn(fsrc, "follower")
    compactor = spawn(csrc, "compactor")

    kill_after = rng.randrange(1, len(files))
    killed = False
    frestarts = 0
    max_off = -1

    def ensure_follower(f):
        # the daemon DEFERS maintenance races internally now; a death here
        # is the maintenance_grace expiring (or a real bug) — restart it,
        # bounded, so a grace blip can't fail the whole iteration.
        nonlocal frestarts
        if f.poll() is None:
            return f
        if frestarts >= 12:
            out, _ = f.communicate(timeout=30)
            raise RuntimeError(f"iter {it} seed {seed}: follower kept "
                               f"dying\n{out}")
        frestarts += 1
        return spawn(fsrc, f"follower-r{frestarts}")

    for i, p in enumerate(files):
        max_off = max(max_off, _file_offset_span(p, "log_offset")[1])
        os.rename(p, os.path.join(log, f"seg{i:03d}.parquet"))
        time.sleep(rng.uniform(0.5, 2.5))
        follower = ensure_follower(follower)
        if not killed and i + 1 >= kill_after:
            time.sleep(rng.uniform(0.0, 1.5))
            follower.send_signal(signal.SIGKILL)
            follower.wait()
            killed = True
            follower = spawn(fsrc, "follower-restart")
    # wait until BOTH lakes cover everything fed, then stop cleanly
    t0 = time.time()
    while True:
        try:
            wm = min(LakeTable.open(os.path.join(lakes, n)).watermark()
                     for n in TABLES)
            if wm >= max_off:
                break
        except FileNotFoundError:
            pass
        follower = ensure_follower(follower)
        if time.time() - t0 > 150:
            raise TimeoutError(f"iter {it} seed {seed}: stuck below "
                               f"{max_off}")
        time.sleep(0.2)
    open(stop, "w").close()
    out, _ = follower.communicate(timeout=180)
    if follower.returncode != 0:
        raise RuntimeError(f"iter {it} seed {seed}: follower "
                           f"rc={follower.returncode}\n{out}")
    open(cstop, "w").close()
    cout, _ = compactor.communicate(timeout=120)
    if compactor.returncode != 0:
        raise RuntimeError(f"iter {it} seed {seed}: compactor "
                           f"rc={compactor.returncode}")
    md5_f, rows_f = state_md5(lakes)

    oneshot = os.path.join(ROOT, "oneshot")
    cfg = EngineConfig(num_partitions=P, epoch_size=ES)
    segs = sorted(glob.glob(os.path.join(log, "*.parquet")))
    replay_mixed(oneshot, TABLES, events_path=segs, config=cfg)
    md5_o, rows_o = state_md5(oneshot)
    ok = md5_f == md5_o and rows_f == rows_o
    print(f"iter {it} seed={seed} events={n_events} segs={n_segs} P={P} "
          f"ES={ES} kill@{kill_after} rot_n={rotate_n} "
          f"f_restarts={frestarts} {cout.strip()} rows={rows_f}/{rows_o} "
          f"{'CONVERGED' if ok else 'DIVERGED'}", flush=True)
    if not ok:
        raise AssertionError(f"iter {it} seed {seed} DIVERGED")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
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
