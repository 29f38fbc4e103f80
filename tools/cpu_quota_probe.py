"""Measure the sandbox's effective CPU capacity vs process count.

The scaling-efficiency criterion compares throughput at N and 4N
parallelism.  That comparison is only meaningful if the machine can
actually deliver 4x the CPU between the two levels: this probe runs an
identical pure-Python burn at increasing process counts and reports
aggregate throughput, exposing the cgroup quota / contention ceiling.

Output: JSON lines {procs, iters_per_sec, scale_vs_1proc}.  Used by
tools/scaling_bench.py to document why the N=1/N=4 pair is the largest
1:4 comparison the box can express (each local[N] Arrow-UDF stage
drives ~2N threads: N JVM task threads + N Python workers).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(q, dur):
    t_end = time.time() + dur
    n = 0
    x = 1.0
    while time.time() < t_end:
        for _ in range(10000):
            x = x * 1.0000001 + 1e-9
        n += 1
    q.put(n)


def run(nproc: int, dur: float = 6.0) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_burn, args=(q, dur)) for _ in range(nproc)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps) / dur


def main():
    counts = [int(c) for c in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    base = None
    rows = []
    for nproc in counts:
        r = run(nproc)
        if base is None:
            base = r / nproc  # per-proc at the smallest count
        rows.append(
            {
                "procs": nproc,
                "iters_per_sec": round(r),
                "scale_vs_linear": round(r / (base * nproc), 3),
            }
        )
        print(json.dumps(rows[-1]))
    return rows


if __name__ == "__main__":
    main()
