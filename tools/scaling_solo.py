"""Pinned SOLO-alternating scaling measurement (protocol v4).

Why this replaces the concurrent protocol (v3) as the criterion run:

v3 ran local-cluster[1] and local-cluster[4] AT THE SAME TIME on
disjoint cpusets to cancel host-steal epochs.  That worked (the ratio
was steal-insensitive), but r4's cause analysis showed the concurrency
itself taxes the 4N side through the one resource cpusets cannot
partition — DRAM bandwidth / LLC.  Evidence
(tools/membw_interference_probe.py, run 2026-08-19):

  * warm local-cluster[4] solo:            cpu 103-115 s, 37-41k URLs/s
  * + 4 ALU-only burners on cores 0-3:     cpu 106-114 s  (no effect)
  * + 4 memory-bandwidth burners on 0-3:   cpu 265.7 s, 14.5k URLs/s
                                           (2.5x CPU inflation)

and the v3 kappa decomposition (BENCH_SCALING_HISTORY.jsonl run
pinned-20260819-1527): the 4N side burns 1.5x the CPU-seconds for the
IDENTICAL crawl only while the N side runs; per-delivered-cycle
efficiency is 0.995.  The criterion compares an N-executor cluster to
a 4N-executor cluster — two fleets of SEPARATE machines that do not
share a memory controller — so cross-level bandwidth interference is
protocol artifact, not engine cost.  A real 4N cluster has 4x the DRAM
channels; the sandbox VM has one memory system, and running both
levels on it simultaneously measures that, not the engine.

v4 therefore runs the levels SOLO, alternating, on the same pinned
cpusets, and replaces v3's concurrency with direct evidence against
the two failure modes concurrency was guarding:

  * host steal        — measured from /proc/stat around EVERY crawl and
                        reported per rep; the run is only claimed at
                        near-zero steal (<2% each rep).
  * credit-bucket     — the order inside each rep alternates (even reps
    order effects      N-first, odd reps 4N-first), and per-crawl
                        JVM CPU-seconds are reported: both levels burn
                        the same CPU for this workload when unthrottled
                        (~104-115 s), so any hidden throttling of one
                        side shows up as kappa drifting off ~1.

Topology: `jvms` (local-cluster[N,1,mem] — one single-core executor
JVM with a private heap per parallelism unit, plus a driver JVM), the
faithful shape of "N executors vs 4N executors".

Usage: python tools/scaling_solo.py [N] [sf_dir]
Env: SOLO_REPS (default 5), BENCH_SEEDS (default 160000),
SOLO_MAX_WARM (default 4).  Appends BENCH_SCALING_HISTORY.jsonl
(run name solo-<ts>), prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

from scaling_tight import Worker, _read_stat  # noqa: E402


def _warm(worker: Worker, tag: str, max_warm: int) -> list[dict]:
    """Crawl until JVM CPU-seconds stabilize (JIT/codegen warm).

    The first crawls of a fresh executor JVM burn ~2x CPU in the JIT
    (probe: 239 s -> 145 s -> 115 s); measuring them would grade the
    compiler, not the engine.  Stop when two consecutive crawls are
    within 10% CPU of each other, or after max_warm crawls.
    """
    runs = []
    prev = None
    streak = 0
    min_warm = int(os.environ.get("SOLO_MIN_WARM", "4"))
    for i in range(max_warm):
        r = worker.crawl()
        runs.append(r)
        cpu = r.get("jvm_cpu_s")
        print(
            f"warm {tag}#{i}: ups={r['urls_per_sec']} cpu={cpu} wall={r['wall_s']}",
            file=sys.stderr, flush=True,
        )
        # JIT warm has a plateau-then-cliff shape (the first 2 crawls can
        # read within 2% of each other while both are still cold), so a
        # one-shot delta rule under-warms: require a minimum number of
        # crawls AND two consecutive <5% CPU deltas.
        if prev and cpu:
            if abs(cpu - prev) / prev < 0.05:
                streak += 1
            else:
                streak = 0
        if i + 1 >= min_warm and streak >= 2:
            break
        prev = cpu
    return runs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("SCALING_N", "1"))
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(os.environ.get("SOLO_REPS", "5"))
    seeds = int(os.environ.get("BENCH_SEEDS", "160000"))
    max_warm = int(os.environ.get("SOLO_MAX_WARM", "8"))

    drv = 2
    lo_set = f"0-{2 * n + drv - 1}"
    hi_set = f"16-{16 + 8 * n + drv - 1}"
    lo = Worker(n, lo_set, sf_dir, seeds, "jvms")
    hi = Worker(4 * n, hi_set, sf_dir, seeds, "jvms")
    lo_ready = lo.wait_ready()
    hi.wait_ready()

    # Warm SOLO and sequentially — same conditions as the measured reps.
    _warm(lo, "N", max_warm)
    _warm(hi, "4N", max_warm)

    def solo_crawl(worker: Worker):
        busy0, steal0 = _read_stat()
        r = worker.crawl()
        busy1, steal1 = _read_stat()
        steal = round(100.0 * (steal1 - steal0) / max(busy1 - busy0, 1), 2)
        return r, steal

    pairs, runs_n, runs_4n, steals = [], [], [], []
    cpu_n, cpu_4n, kappas = [], [], []
    orders = []
    for i in range(reps):
        order = ["n", "hi"] if i % 2 == 0 else ["hi", "n"]
        orders.append("N-first" if order[0] == "n" else "4N-first")
        got = {}
        rep_steal = []
        for side in order:
            w = lo if side == "n" else hi
            r, st = solo_crawl(w)
            got[side] = r
            rep_steal.append(st)
        rn, rh = got["n"], got["hi"]
        eff = round(rh["urls_per_sec"] / rn["urls_per_sec"] / 4, 3)
        pairs.append(eff)
        runs_n.append(rn["urls_per_sec"])
        runs_4n.append(rh["urls_per_sec"])
        steals.append(max(rep_steal))
        kap = None
        if rn.get("jvm_cpu_s") and rh.get("jvm_cpu_s"):
            kap = round(rh["jvm_cpu_s"] / rn["jvm_cpu_s"], 3)
            cpu_n.append(rn["jvm_cpu_s"])
            cpu_4n.append(rh["jvm_cpu_s"])
            kappas.append(kap)
        print(
            f"rep {i} ({orders[-1]}): N={rn['urls_per_sec']} ({rn['wall_s']}s, "
            f"cpu {rn.get('jvm_cpu_s')}) 4N={rh['urls_per_sec']} ({rh['wall_s']}s, "
            f"cpu {rh.get('jvm_cpu_s')}) eff={eff} kappa={kap} steal={max(rep_steal)}%",
            file=sys.stderr, flush=True,
        )
    lo.close()
    hi.close()

    med = round(statistics.median(pairs), 3)
    result = {
        "metric": "scaling_efficiency",
        "topology": "jvms",
        "protocol": "solo-alternating pinned cpusets "
                    f"(local-cluster[{n},1,_] on {lo_set} / "
                    f"local-cluster[{4*n},1,_] on {hi_set}, one level at a time, "
                    "order alternated per rep)",
        "n_cpus": n,
        "n4_cpus": 4 * n,
        "efficiency": med,
        "pairings": {
            "runs_n": runs_n,
            "runs_4n": runs_4n,
            "eff_per_pair": pairs,
            "eff_median": med,
            "eff_level_median": round(
                statistics.median(runs_4n) / statistics.median(runs_n) / 4, 3
            ),
            "eff_best": max(pairs),
            "eff_worst": min(pairs),
            "order_per_rep": orders,
            "jvm_cpu_n": cpu_n,
            "jvm_cpu_4n": cpu_4n,
            "kappa_per_pair": kappas,
            "kappa_median": round(statistics.median(kappas), 3) if kappas else None,
        },
        "steal_pct_per_rep": steals,
        "reps": reps,
        "seeds": seeds,
        "corpus_pages": lo_ready.get("corpus_pages"),
        "sf_dir": sf_dir,
    }
    print(json.dumps(result))
    hist = ROOT / "BENCH_SCALING_HISTORY.jsonl"
    entry = {"run": f"solo-{time.strftime('%Y%m%d-%H%M')}", **result}
    with hist.open("a") as f:
        f.write(json.dumps(entry) + "\n")
    return result


if __name__ == "__main__":
    main()
