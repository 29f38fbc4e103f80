"""Concurrent pinned-cpuset scaling measurement (BASELINE.md criterion).

Why this protocol: the sandbox VM has NO in-VM cgroup quota
(cpu.cfs_quota_us = -1) — its CPU-supply variance is host-side vCPU
scheduling, which behaves like a credit bucket: the first heavy run in
a window is fast, the next is throttled (observed 2-6x pair spreads on
identical workloads, direction set purely by run ORDER).  No temporal
interleave can cancel a credit bucket.

So the two levels run AT THE SAME TIME on disjoint cpusets:

    local[N]  pinned to cores 0..2N-1     (JVM task threads + python workers)
    local[4N] pinned to cores 16..16+8N-1

Both crawls share every host epoch — a host-level squeeze hits both
levels in the same proportion, so the 4N/N ratio is preserved even
under heavy steal.  This is also the closest sandbox emulation of the
criterion's actual shape: an N-executor and a 4N-executor cluster
existing simultaneously on shared substrate.  In-VM the two cpusets
are disjoint (10 busy procs on 32 idle vCPUs — no scheduler contention
between levels), and JDK 17 / Spark size their thread pools from
sched_getaffinity, so each JVM sees exactly its pinned cores.

Each worker is `bench.py` in BENCH_MODE=scaling BENCH_SERVE=1 (one
crawl per "crawl" stdin line, one JSON line out).  Both workers build
the corpus + warm up, run one discarded crawl, then `TIGHT_REPS`
simultaneous crawl pairs.  Headline = median of per-pair
(4N_i / N_i) / 4.  Per-rep /proc/stat steal is recorded as evidence of
host conditions.

Usage: python tools/scaling_tight.py [N] [sf_dir]
Env: TIGHT_REPS (default 7), BENCH_SEEDS (default 160000), SCALING_N,
SCALING_TOPOLOGY=threads|jvms.  Appends BENCH_SCALING_HISTORY.jsonl,
prints one JSON line.

Topology `jvms` (default since r4): the two levels run as
``local-cluster[N,1,mem]`` vs ``local-cluster[4N,1,mem]`` — N separate
executor JVMs with ONE core and a PRIVATE heap each, plus a scheduling
driver JVM.  This is the faithful emulation of the north rule's "N vs
4N executors": on a real cluster every executor owns its heap, so the
4N side never pays 4 task threads contending one shared young-gen the
way ``local[4]`` does.  r4 measured that shared-heap contention
directly (tools/independent_jvms_probe.py): 4 concurrent INDEPENDENT
local[1] JVMs on disjoint 2-core cpusets each sustain ~solo throughput
once JIT-warm (per-JVM eff 0.97/0.99 in reps 1-2; aggregate ≈ 4x
solo), while the same 4-way parallelism inside ONE local[4] JVM reads
0.52-0.70 — so the host supplies 4x cycles cleanly and the deficit is
intra-JVM (GC 26s vs 7s for identical work, task CPU x1.8).  Topology
`threads` (the r3 protocol, local[N] vs local[4N] in one JVM) is kept
for comparison.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import threading
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _read_stat() -> tuple[int, int]:
    """(busy_ticks, steal_ticks) VM-wide from /proc/stat."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    user, nice, system, idle, iowait, irq, softirq, steal = (vals + [0] * 8)[:8]
    return user + nice + system + irq + softirq, steal


class Worker:
    def __init__(
        self,
        cpus: int,
        cpuset: str,
        sf_dir: str,
        seeds: int,
        topology: str = "threads",
    ):
        env = dict(os.environ)
        env.update({
            "SPARK_GRAFT_CPUS": str(cpus),
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "BENCH_MODE": "scaling",
            "BENCH_SERVE": "1",
            "BENCH_SEEDS": str(seeds),
        })
        if topology == "jvms":
            # one single-core executor JVM per parallelism unit, each
            # with a private heap (mem arg is MB per executor)
            mem = os.environ.get("SCALING_EXECUTOR_MB", "6144")
            env["SPARK_GRAFT_MASTER"] = f"local-cluster[{cpus},1,{mem}]"
            env["SPARK_GRAFT_EXECUTOR_MEM"] = f"{int(mem) - 512}m"
        self.cpus = cpus
        self.cpuset = cpuset
        self.proc = subprocess.Popen(
            ["taskset", "-c", cpuset, sys.executable, str(ROOT / "bench.py")],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            bufsize=1,
            env=env,
            cwd=ROOT,
        )
        self.last: dict | None = None

    def _read_json(self) -> dict:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"worker local[{self.cpus}] died")
            line = line.strip()
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue

    def wait_ready(self) -> dict:
        d = self._read_json()
        assert d.get("ready"), d
        return d

    def crawl(self) -> dict:
        self.proc.stdin.write("crawl\n")
        self.proc.stdin.flush()
        self.last = self._read_json()
        return self.last

    def close(self):
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("SCALING_N", "1"))
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(os.environ.get("TIGHT_REPS", "7"))
    seeds = int(os.environ.get("BENCH_SEEDS", "160000"))
    topology = os.environ.get("SCALING_TOPOLOGY", "jvms")

    # disjoint pins: each level drives ~2 procs per parallelism unit
    # (task thread or executor JVM, plus its Arrow python worker).
    # Under `jvms` each side also gets 2 extra cores for its scheduling
    # driver JVM — on a real cluster the driver is a separate machine,
    # so its cycles must not be taken out of either side's executor
    # budget (and must not be amortized asymmetrically: 1 driver over N
    # executors vs over 4N would flatter the hi side).
    drv = 2 if topology == "jvms" else 0
    lo_set = f"0-{max(2 * n + drv, 2) - 1}"
    hi_set = f"16-{16 + 8 * n + drv - 1}"
    lo = Worker(n, lo_set, sf_dir, seeds, topology)
    hi = Worker(4 * n, hi_set, sf_dir, seeds, topology)
    lo_ready = lo.wait_ready()
    hi_ready = hi.wait_ready()

    # warm both (discarded): page-cache + plan warm, simultaneous
    _w = {}
    t1 = threading.Thread(target=lambda: _w.update(a=lo.crawl()))
    t2 = threading.Thread(target=lambda: _w.update(b=hi.crawl()))
    t1.start(); t2.start(); t1.join(); t2.join()

    # Per rep: ONE N crawl; the 4N worker loops crawls for that whole
    # window, so the N side is contended throughout (no solo-fast tail
    # inflating the denominator).  4N_i = median of the loop's crawls
    # that finished inside the N window (+ the in-flight one is kept if
    # it overlaps the window by >=80% of its own wall).
    pairs, runs_n, runs_4n, steals, n_inside = [], [], [], [], []
    cpu_n, cpu_4n, kappas, effs_norm = [], [], [], []
    for i in range(reps):
        busy0, steal0 = _read_stat()
        res: dict = {}
        stop = threading.Event()
        hi_runs: list[tuple[float, float, dict]] = []

        def n_side():
            res["n"] = lo.crawl()
            stop.set()

        def hi_side():
            while not stop.is_set():
                t0 = time.time()
                r = hi.crawl()
                hi_runs.append((t0, time.time(), r))

        ta = threading.Thread(target=n_side)
        tb = threading.Thread(target=hi_side)
        t_start = time.time()
        ta.start(); tb.start(); ta.join()
        t_end = time.time()
        tb.join()
        busy1, steal1 = _read_stat()

        kept = []
        kept_cpu = []
        for t0, t1_, r in hi_runs:
            overlap = min(t1_, t_end) - max(t0, t_start)
            if overlap >= 0.8 * (t1_ - t0):
                kept.append(r["urls_per_sec"])
                if r.get("jvm_cpu_s"):
                    kept_cpu.append(r["jvm_cpu_s"])
        if not kept and hi_runs:
            kept = [hi_runs[0][2]["urls_per_sec"]]
            if hi_runs[0][2].get("jvm_cpu_s"):
                kept_cpu = [hi_runs[0][2]["jvm_cpu_s"]]

        rn = res["n"]
        ups_4n = statistics.median(kept)
        runs_n.append(rn["urls_per_sec"])
        runs_4n.append(round(ups_4n, 2))
        n_inside.append(len(kept))
        eff = round(ups_4n / rn["urls_per_sec"] / 4, 3)
        pairs.append(eff)
        # work-inflation factor: CPU-seconds the 4N JVM burned for ONE
        # crawl over the N JVM's CPU-seconds for the IDENTICAL crawl.
        # kappa > 1 means the host delivered fewer cycles per unit of
        # work at higher occupancy (SMT/power/overcommit on the host —
        # NOT visible as steal); eff_norm = eff * kappa is the
        # cycle-supply-corrected structural efficiency (what the plan
        # shape/barriers/stragglers cost, net of host cycle deflation).
        kap = eff_n = None
        if kept_cpu and rn.get("jvm_cpu_s"):
            kap = round(statistics.median(kept_cpu) / rn["jvm_cpu_s"], 3)
            eff_n = round(eff * kap, 3)
            cpu_n.append(rn["jvm_cpu_s"])
            cpu_4n.append(round(statistics.median(kept_cpu), 2))
            kappas.append(kap)
            effs_norm.append(eff_n)
        steal_pct = round(100.0 * (steal1 - steal0) / max(busy1 - busy0, 1), 2)
        steals.append(steal_pct)
        print(
            f"rep {i}: N={rn['urls_per_sec']} ({rn['wall_s']}s) "
            f"4N=med{round(ups_4n, 1)} over {len(kept)} crawls eff={eff} "
            f"kappa={kap} eff_norm={eff_n} steal={steal_pct}%",
            file=sys.stderr, flush=True,
        )
    lo.close()
    hi.close()

    med = round(statistics.median(pairs), 3)
    lvl = round(statistics.median(runs_4n) / statistics.median(runs_n) / 4, 3)
    proto_lo = (
        f"local-cluster[{n},1,_]" if topology == "jvms" else f"local[{n}]"
    )
    proto_hi = (
        f"local-cluster[{4*n},1,_]" if topology == "jvms" else f"local[{4*n}]"
    )
    result = {
        "metric": "scaling_efficiency",
        "topology": topology,
        "protocol": "concurrent disjoint-cpuset pairs "
                    f"({proto_lo} on {lo_set} || {proto_hi} on {hi_set})",
        "n_cpus": n,
        "n4_cpus": 4 * n,
        "efficiency": med,
        "pairings": {
            "runs_n": runs_n,
            "runs_4n": runs_4n,
            "eff_per_pair": pairs,
            "eff_median": med,
            "eff_level_median": lvl,
            "eff_best": max(pairs),
            "eff_worst": min(pairs),
            # cycle-supply decomposition (r4): see the kappa note above
            "jvm_cpu_n": cpu_n,
            "jvm_cpu_4n": cpu_4n,
            "kappa_per_pair": kappas,
            "kappa_median": round(statistics.median(kappas), 3) if kappas else None,
            "eff_norm_per_pair": effs_norm,
            "eff_norm_median": (
                round(statistics.median(effs_norm), 3) if effs_norm else None
            ),
        },
        "steal_pct_per_rep": steals,
        "hi_crawls_inside_window": n_inside,
        "reps": reps,
        "seeds": seeds,
        "corpus_pages": lo_ready.get("corpus_pages"),
        "sf_dir": sf_dir,
    }
    print(json.dumps(result))

    hist = ROOT / "BENCH_SCALING_HISTORY.jsonl"
    entry = {"run": f"pinned-{time.strftime('%Y%m%d-%H%M')}", **result}
    with hist.open("a") as f:
        f.write(json.dumps(entry) + "\n")
    return result


if __name__ == "__main__":
    main()
