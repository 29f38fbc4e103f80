"""CPU decomposition probe: where does the local-cluster 4N side's extra
CPU go?  Runs the identical scaling crawl SOLO (quiet host, ample pinned
cores) under three masters and reports urls/s + total JVM CPU-seconds
(driver + executor children, bench.py serve loop):

    local-cluster[1,1,m]  — the scaling pair's N side (zero remote shuffle)
    local-cluster[4,1,m]  — the pair's 4N side (3/4 of shuffle crosses
                            executor processes via netty/loopback)
    local[4]              — same 4-way parallelism, one JVM (in-process
                            shuffle, shared heap)

If CPU(lc4) >> CPU(local4) ≈ CPU(lc1), the jvms-topology kappa (~1.5) is
cross-process shuffle serde — real distributed-execution work the
1-executor side never pays — and the 1v4 pair structurally charges the
whole "going distributed" tax to the scaling ratio.
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEEDS = os.environ.get("BENCH_SEEDS", "160000")
CONFIGS = [
    ("lc1", "0-9", "1", "local-cluster[1,1,6144]"),
    ("lc4", "0-9", "4", "local-cluster[4,1,6144]"),
    ("local4", "0-9", "4", None),
]


def read_json(p):
    while True:
        line = p.stdout.readline()
        if not line:
            raise RuntimeError("worker died")
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue


def run(name, cpuset, cpus, master):
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": cpus,
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
        "BENCH_MODE": "scaling",
        "BENCH_SERVE": "1",
        "BENCH_SEEDS": SEEDS,
    })
    if master:
        env["SPARK_GRAFT_MASTER"] = master
        env["SPARK_GRAFT_EXECUTOR_MEM"] = "5632m"
    p = subprocess.Popen(
        ["taskset", "-c", cpuset, sys.executable, f"{ROOT}/bench.py"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1, env=env, cwd=ROOT,
    )
    r = read_json(p)
    assert r.get("ready"), r
    out = []
    for i in range(3):  # crawl 0 discarded (JIT warm)
        p.stdin.write("crawl\n")
        p.stdin.flush()
        r = read_json(p)
        out.append(r)
        print(f"{name} crawl {i}: {r['urls_per_sec']} urls/s "
              f"wall={r['wall_s']}s jvm_cpu={r['jvm_cpu_s']}s",
              file=sys.stderr, flush=True)
    try:
        p.stdin.close()
        p.wait(timeout=60)
    except Exception:
        p.kill()
    return out


if __name__ == "__main__":
    results = {}
    for name, cpuset, cpus, master in CONFIGS:
        results[name] = run(name, cpuset, cpus, master)
    print(json.dumps(results))
