"""Probe: WHAT on the neighbor cpuset inflates a pinned crawl's CPU?

r4's concurrent scaling runs showed the 4N side burning ~1.5x the
CPU-seconds for an identical crawl whenever the N side ran on its own
disjoint cpuset (kappa in BENCH_SCALING_HISTORY.jsonl pinned-* runs),
while solo it reads CPU parity with the N side.  Disjoint cpusets
partition cores, not the memory system — this probe separates the two.

It warms a local-cluster[4,1] crawl worker pinned to cores 16-25, then
re-measures the same crawl under neighbor loads pinned to cores 0-3
(the N side's cpuset in the scaling protocol):

  solo          — no neighbors (baseline)
  alu_0_3       — 4 register-only ALU spinners (CPU pressure, ~zero
                  memory traffic)
  solo2         — baseline again (drift check)
  alu_12_15     — ALU spinners on a different socket-local cpuset
  mem_0_3       — 4 streaming numpy adds over 320 MB arrays each
                  (saturates DRAM bandwidth, modest CPU)

Observed (2026-08-19, near-zero steal):

  phase        ups        jvm_cpu_s   wall_s
  solo         31.7-39.0k  103-115    23-28
  alu_0_3      36.3-40.6k  106-114    22-25      <- no effect
  solo2        41.0-41.2k  107-108    22
  alu_12_15    31.3-42.1k  101-115    21-29      <- no effect
  mem_0_3      14.5k       266        62         <- 2.5x CPU inflation

Conclusion: the concurrent-protocol inflation is DRAM-bandwidth/LLC
contention, not core scheduling (ALU load on the same cores is
invisible) and not host steal (measured ~0 throughout).  Two separate
clusters of machines do not share a memory controller, so this is a
protocol artifact of co-locating both levels on one VM — the basis for
the solo-alternating protocol v4 (tools/scaling_solo.py).

Usage: python tools/membw_interference_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def burn_alu(stop, cpu):
    """Register-only spinner: full CPU pressure, ~zero memory traffic."""
    os.sched_setaffinity(0, {cpu})
    x = 1.0
    while not stop.is_set():
        for _ in range(100000):
            x = x * 1.0000001 + 1e-9


def burn_membw(stop, cpu):
    """Streaming adds over arrays far beyond LLC: DRAM-bandwidth load."""
    os.sched_setaffinity(0, {cpu})
    import numpy as np

    n = 40_000_000  # 3 x 320 MB
    a, b, c = np.ones(n), np.ones(n), np.empty(n)
    while not stop.is_set():
        np.add(a, b, out=c)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": "4",
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "BENCH_MODE": "scaling",
        "BENCH_SERVE": "1",
        "BENCH_SEEDS": os.environ.get("BENCH_SEEDS", "160000"),
        "SPARK_GRAFT_MASTER": "local-cluster[4,1,6144]",
        "SPARK_GRAFT_EXECUTOR_MEM": "5632m",
    })
    p = subprocess.Popen(
        ["taskset", "-c", "16-25", sys.executable, os.path.join(ROOT, "bench.py")],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1, env=env, cwd=ROOT,
    )

    def read_json():
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

    r = read_json()
    assert r.get("ready"), r
    print("ready", file=sys.stderr, flush=True)

    def crawl():
        p.stdin.write("crawl\n")
        p.stdin.flush()
        return read_json()

    for i in range(4):  # JIT warm until CPU stabilizes
        r = crawl()
        print(json.dumps({"phase": f"warm{i}", "ups": r["urls_per_sec"],
                          "cpu": r["jvm_cpu_s"], "wall": r["wall_s"]}), flush=True)
        if r["jvm_cpu_s"] and r["jvm_cpu_s"] < 120:
            break

    conditions = [
        ("solo", None, []),
        ("alu_0_3", burn_alu, [0, 1, 2, 3]),
        ("solo2", None, []),
        ("alu_12_15", burn_alu, [12, 13, 14, 15]),
        ("mem_0_3", burn_membw, [0, 1, 2, 3]),
    ]
    for name, fn, cpus in conditions:
        stop = mp.Event()
        procs = []
        for c in cpus:
            pr = mp.Process(target=fn, args=(stop, c))
            pr.start()
            procs.append(pr)
        time.sleep(1.0)
        for rep in range(2):
            r = crawl()
            print(json.dumps({"phase": name, "rep": rep, "ups": r["urls_per_sec"],
                              "cpu": r["jvm_cpu_s"], "wall": r["wall_s"]}), flush=True)
        stop.set()
        for pr in procs:
            pr.join(timeout=5)
            pr.terminate()

    p.stdin.close()
    p.wait(timeout=60)


if __name__ == "__main__":
    main()
