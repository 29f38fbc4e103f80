"""Evidence probe: JVM cycles-per-work vs total busy vCPUs.

Runs an IDENTICAL Spark stage workload (the crawl's discovery shape:
explode → hybrid-normalize fast expr → validity → scorer → agg over a
cached 341k-parent corpus slice) at local[4] pinned to cores 16-23,
under three neighbor conditions on cores 0-1:

  solo    — nothing else busy
  alu     — two register-only python burn loops (no memory traffic)
  mem     — two numpy stream loops (~10 GB/s each)

and reports the JVM's utime+stime per repetition.  On this sandbox the
same work costs up to ~1.3-1.9x the CPU-seconds as total busy vCPUs
rise (r4 measurement) while /proc/stat steal stays <0.2% — i.e. the
host deflates cycle delivery per vCPU at higher occupancy in a way the
guest cannot observe as steal.  This is the denominator distortion
behind the raw N-vs-4N efficiency ratio; BENCH_SCALING.md uses it to
justify reporting the kappa-normalized structural efficiency alongside
the raw ratio.

Usage: python tools/neighbor_inflation_probe.py [reps=3]
Prints one JSON line per condition.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _alu_burn(stop):
    x = 1.0
    while not stop.is_set():
        for _ in range(100000):
            x = x * 1.0000001 + 1e-9


def _mem_burn(stop):
    import numpy as np

    n = 40_000_000
    a, b, c = np.ones(n), np.ones(n), np.empty(n)
    while not stop.is_set():
        np.add(a, b, out=c)


def _pin(pid: int, cpus: str):
    os.system(f"taskset -cp {cpus} {pid} >/dev/null 2>&1")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # pin ourselves (and the JVM we spawn) to 16-23
    _pin(os.getpid(), "16-23")

    from pyspark.sql import functions as F

    import bench
    from crawl4ai_spark.functions.filters import valid_crawl_url
    from crawl4ai_spark.functions.normalize import (
        normalize_eligible_fast, normalize_fast_expr,
    )
    from crawl4ai_spark.session import get_spark
    from crawl4ai_spark.sources import corpus

    spark = get_spark("inflation_probe", cpus=4, shuffle_partitions=4)
    parents = (
        corpus.build_pages(spark, 750_000)
        .filter(F.col("success")).limit(341_000)
        .select("url", "links").repartition(4).persist()
    )
    parents.count()

    def pipeline():
        linked = parents.select(
            F.col("url").alias("src_url"),
            F.posexplode_outer("links").alias("link_idx", "link"),
        ).filter(F.col("link").isNotNull() & ~F.col("link.is_external"))
        href, base = F.col("link.href"), F.col("src_url")
        cand = linked.filter(normalize_eligible_fast(href, base)).withColumn(
            "norm_url", normalize_fast_expr(href, base)
        )
        cand = cand.filter(valid_crawl_url(F.col("norm_url"))).withColumn(
            "score", bench.SCORER.column(F.col("norm_url"))
        )
        return cand.select(F.count("norm_url"), F.sum("score"))

    pipeline().collect()  # codegen/JIT warm

    def jvm_pid():
        me = str(os.getpid())
        import glob
        for d in glob.glob("/proc/[0-9]*"):
            try:
                parts = open(d + "/stat").read().split()
                if parts[3] == me and "java" in parts[1]:
                    return d.split("/")[2]
            except OSError:
                continue
        return None

    jp = jvm_pid()
    tck = os.sysconf("SC_CLK_TCK")

    def jvm_cpu():
        parts = open(f"/proc/{jp}/stat").read().split()
        return (int(parts[13]) + int(parts[14])) / tck

    def steal():
        vals = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        busy = sum(vals[:3]) + vals[5] + vals[6]
        return busy, vals[7]

    conditions = [("solo", None), ("alu", _alu_burn), ("mem", _mem_burn)]
    base_cpu = None
    for name, burn in conditions:
        stop = mp.Event()
        procs = []
        if burn is not None:
            for core in ("0", "1"):
                p = mp.Process(target=burn, args=(stop,))
                p.start()
                _pin(p.pid, core)
                procs.append(p)
            time.sleep(1.0)
        walls, cpus_ = [], []
        b0, s0 = steal()
        for _ in range(reps):
            c0, t0 = jvm_cpu(), time.time()
            pipeline().collect()
            walls.append(round(time.time() - t0, 2))
            cpus_.append(round(jvm_cpu() - c0, 2))
        b1, s1 = steal()
        stop.set()
        for p in procs:
            p.join(timeout=5)
            p.terminate()
        med_cpu = sorted(cpus_)[len(cpus_) // 2]
        if base_cpu is None:
            base_cpu = med_cpu
        print(json.dumps({
            "condition": name, "reps": reps, "walls_s": walls,
            "jvm_cpu_s": cpus_, "cpu_vs_solo": round(med_cpu / base_cpu, 3),
            "steal_pct": round(100.0 * (s1 - s0) / max(b1 - b0, 1), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
