"""Randomized crash/race soak for the Redis keyspace store: a follower
PROCESS tails a growing RESP log (store.follow), a reader process loops
keyspace_table() against the same store the whole time (exercising the
generation-GC retry), the follower is SIGKILLed once at a random moment and
restarted fresh. Final keyspace must equal a one-shot ingest of the full
log. Usage: python soak_redis.py <n_iters> [master_seed]
"""
import hashlib
import os
import random
import shutil
import signal
import subprocess
import sys
import time

ROOT = os.environ.get("APE_DTS_RAY_SOAK_DIR", "/tmp/vdrive") + "/soakredis"
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
from ape_dts_ray.pipelines.redis_replay import RedisKeyspaceStore
store = RedisKeyspaceStore.open({store!r})
stats = store.follow({log!r}, poll_interval=0.05, stop_file={stop!r})
print("follower stats:", stats, flush=True)
ray.shutdown()
"""

READER_SRC = """
import os, sys, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ape_dts_ray.pipelines.redis_replay import RedisKeyspaceStore
n = 0
seen_rows = 0
while not os.path.exists({rstop!r}):
    try:
        store = RedisKeyspaceStore.open({store!r})
    except FileNotFoundError:
        time.sleep(0.05); continue
    t = store.keyspace_table()
    n += 1
    if seen_rows and t.num_rows == 0:
        raise AssertionError("silent empty read after %d rows" % seen_rows)
    seen_rows = max(seen_rows, t.num_rows)
    time.sleep({pause})
print("reads:", n, "max_rows:", seen_rows, flush=True)
ray.shutdown()
"""


def _gen_cmds(rng, n):
    """Mixed command stream: strings, hashes (TTL'd), sets, zsets, lists,
    streams with NON-lexicographic field order, dels, expires."""
    cmds = []
    sid = 0
    for _ in range(n):
        k = f"k{rng.randrange(40)}".encode()
        roll = rng.random()
        if roll < 0.25:
            cmds.append([b"SET", k, b"v%d" % rng.randrange(1000)])
        elif roll < 0.40:
            cmds.append([b"HSET", b"h" + k, b"f%d" % rng.randrange(6),
                         b"w%d" % rng.randrange(100)])
        elif roll < 0.50:
            cmds.append([b"SADD", b"s" + k, b"m%d" % rng.randrange(8)])
        elif roll < 0.60:
            cmds.append([b"ZADD", b"z" + k, b"%d.5" % rng.randrange(50),
                        b"m%d" % rng.randrange(8)])
        elif roll < 0.70:
            cmds.append([b"RPUSH", b"l" + k, b"e%d" % rng.randrange(100)])
        elif roll < 0.80:
            sid += 1
            cmds.append([b"XADD", b"x" + k, b"%d-1" % sid,
                         b"zz", b"1", b"aa", b"2"])   # non-lex field order
        elif roll < 0.90:
            cmds.append([b"DEL", k])
        else:
            cmds.append([b"PEXPIREAT", k, b"%d" % (10**12 + rng.randrange(10**9))])
    return cmds


def state_md5(store_root):
    from ape_dts_ray.pipelines.redis_replay import RedisKeyspaceStore
    t = RedisKeyspaceStore.open(store_root).keyspace_table()
    rows = sorted(map(str, t.to_pylist()))
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), t.num_rows


def spawn(src, tag):
    err = open(f"/tmp/soakredis_{tag}.err", "w")
    return subprocess.Popen([sys.executable, "-c", src],
                            stdout=subprocess.PIPE, stderr=err, text=True)


def one_iter(it, seed):
    rng = random.Random(seed)
    from ape_dts_ray.pipelines.redis_replay import (RedisKeyspaceStore,
                                                    write_resp_log)

    shutil.rmtree(ROOT, ignore_errors=True)
    stage, log = os.path.join(ROOT, "stage"), os.path.join(ROOT, "log")
    os.makedirs(stage); os.makedirs(log)
    n_cmds = rng.choice([2000, 5000])
    n_files = rng.choice([5, 8, 12])
    cmds = _gen_cmds(rng, n_cmds)
    per = (len(cmds) + n_files - 1) // n_files
    files = []
    for i in range(n_files):
        chunk = cmds[i * per:(i + 1) * per]
        if chunk:
            files.append(write_resp_log(chunk, stage, i))

    store_root = os.path.join(ROOT, "store")
    RedisKeyspaceStore.create(store_root,
                              num_partitions=rng.choice([4, 8]))
    stop = os.path.join(ROOT, "stop")
    rstop = os.path.join(ROOT, "rstop")
    fsrc = FOLLOWER_SRC.format(repo=REPO, store=store_root, log=log,
                               stop=stop)
    rsrc = READER_SRC.format(repo=REPO, store=store_root, rstop=rstop,
                             pause=rng.choice([0.05, 0.2]))
    follower = spawn(fsrc, "follower")
    reader = spawn(rsrc, "reader")

    kill_after = rng.randrange(1, len(files))
    killed = False
    for i, p in enumerate(files):
        os.rename(p, os.path.join(log, os.path.basename(p)))
        time.sleep(rng.uniform(0.5, 2.5))
        if not killed and i + 1 >= kill_after:
            time.sleep(rng.uniform(0.0, 1.5))
            follower.send_signal(signal.SIGKILL)
            follower.wait()
            killed = True
            follower = spawn(fsrc, "follower-restart")
    # wait for the watermark to cover every fed file, then stop cleanly
    t0 = time.time()
    while True:
        wm = RedisKeyspaceStore.open(store_root).watermark()
        if wm["next_file_seq"] >= len(files):
            break
        if time.time() - t0 > 150:
            raise TimeoutError(f"iter {it} seed {seed}: stuck at {wm}")
        time.sleep(0.2)
    open(stop, "w").close()
    out, _ = follower.communicate(timeout=120)
    if follower.returncode != 0:
        raise RuntimeError(f"iter {it} seed {seed}: follower "
                           f"rc={follower.returncode}\n{out}")
    open(rstop, "w").close()
    rout, _ = reader.communicate(timeout=120)
    if reader.returncode != 0:
        raise RuntimeError(f"iter {it} seed {seed}: reader "
                           f"rc={reader.returncode}")
    md5_f, rows_f = state_md5(store_root)

    oneshot = os.path.join(ROOT, "oneshot")
    P = RedisKeyspaceStore.open(store_root).num_partitions
    RedisKeyspaceStore.create(oneshot, num_partitions=P)
    RedisKeyspaceStore.open(oneshot).ingest(log)
    md5_o, rows_o = state_md5(oneshot)
    ok = md5_f == md5_o and rows_f == rows_o
    print(f"iter {it} seed={seed} cmds={n_cmds} files={len(files)} "
          f"kill@{kill_after} {rout.strip()} rows={rows_f}/{rows_o} "
          f"{'CONVERGED' if ok else 'DIVERGED'}", flush=True)
    if not ok:
        raise AssertionError(f"iter {it} seed {seed} DIVERGED")


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
