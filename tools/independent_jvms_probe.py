"""Decisive experiment: 4 concurrent independent local[1] JVMs (disjoint
2-core cpusets) vs solo local[1]. If each concurrent worker sustains ~solo
speed, host memory bandwidth is innocent and the local[4] inflation is
intra-JVM (shared heap/GC/thread contention)."""
import json, os, subprocess, sys, threading, time

ROOT = "/root/repo"
SEEDS = os.environ.get("BENCH_SEEDS", "160000")

def worker(cpuset):
    env = dict(os.environ)
    env.update({"SPARK_GRAFT_CPUS": "1", "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
                "BENCH_MODE": "scaling", "BENCH_SERVE": "1", "BENCH_SEEDS": SEEDS})
    return subprocess.Popen(["taskset", "-c", cpuset, sys.executable, f"{ROOT}/bench.py"],
                            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True, bufsize=1, env=env, cwd=ROOT)

def read_json(p):
    while True:
        line = p.stdout.readline()
        if not line: raise RuntimeError("worker died")
        line = line.strip()
        if line.startswith("{"):
            try: return json.loads(line)
            except json.JSONDecodeError: continue

def crawl(p, out, key):
    p.stdin.write("crawl\n"); p.stdin.flush()
    out[key] = read_json(p)

cpusets = ["0-1", "4-5", "8-9", "12-13"]
procs = [worker(cs) for cs in cpusets]
for i, p in enumerate(procs):
    r = read_json(p); assert r.get("ready"), r
    print(f"worker {i} ready", file=sys.stderr, flush=True)

# warm all four simultaneously (discarded)
out = {}
ts = [threading.Thread(target=crawl, args=(p, out, i)) for i, p in enumerate(procs)]
[t.start() for t in ts]; [t.join() for t in ts]
print("warm done:", {k: v["urls_per_sec"] for k, v in out.items()}, file=sys.stderr, flush=True)

results = {"solo": [], "conc": []}
for rep in range(3):
    # solo crawl on worker 0 (others idle)
    out = {}
    crawl(procs[0], out, 0)
    solo = out[0]["urls_per_sec"]
    results["solo"].append(solo)
    # 4 concurrent crawls
    out = {}
    ts = [threading.Thread(target=crawl, args=(p, out, i)) for i, p in enumerate(procs)]
    t0 = time.time()
    [t.start() for t in ts]; [t.join() for t in ts]
    wall = time.time() - t0
    per = [out[i]["urls_per_sec"] for i in range(4)]
    urls = out[0]["urls"]
    agg_sync = 4 * urls / wall  # aggregate over the straggler wall
    results["conc"].append({"per_worker": per, "agg_sync": round(agg_sync, 1),
                            "wall": round(wall, 2)})
    print(f"rep {rep}: solo={solo} conc={[round(x) for x in per]} "
          f"agg_sync={agg_sync:.0f} eff_sum={sum(per)/(4*solo):.3f} "
          f"eff_sync={agg_sync/(4*solo):.3f}", file=sys.stderr, flush=True)

for p in procs:
    try: p.stdin.close(); p.wait(timeout=30)
    except Exception: p.kill()
print(json.dumps(results))
