"""Two-parallelism scaling evidence (BASELINE.md criterion).

Runs the identical bench job at local[N] and local[4N] (fresh JVM per
level — Spark master is fixed at session creation) and reports both
throughputs plus scaling efficiency = (T_4N / T_N) / 4.

Usage: python tools/scaling_bench.py [N] [sf_dir]
Writes/updates BENCH_SCALING.md and prints a JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_level(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("BENCH_MODE", "scaling")
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=ROOT,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    # best-of-REPS per level: the sandbox VM shows multi-minute noise
    # spikes; taking the faster repeat measures the engine, not the
    # neighbor (both levels get identical treatment).  The scaling
    # workload crawls ~6M URLs, so default to one rep (SCALING_REPS=2
    # for the more robust estimate when wall-clock allows).
    reps = int(os.environ.get("SCALING_REPS", "1"))
    lo = max(
        (run_level(n, sf_dir) for _ in range(reps)),
        key=lambda r: r["urls_per_sec"],
    )
    hi = max(
        (run_level(4 * n, sf_dir) for _ in range(reps)),
        key=lambda r: r["urls_per_sec"],
    )
    t_lo = lo["urls_per_sec"]
    t_hi = hi["urls_per_sec"]
    eff = round((t_hi / t_lo) / 4, 3)
    result = {
        "metric": "scaling_efficiency",
        "n_cpus": n,
        "n4_cpus": 4 * n,
        "urls_per_sec_n": t_lo,
        "urls_per_sec_4n": t_hi,
        "efficiency": eff,
        "sf_dir": sf_dir,
        "bench_n": lo,
        "bench_4n": hi,
    }
    md = ROOT / "BENCH_SCALING.md"
    md.write_text(
        "# Scaling evidence (N vs 4N parallelism)\n\n"
        "Same job, same input, two parallelism levels (sandbox stand-in\n"
        "for two cluster sizes — BASELINE.md criterion).\n\n"
        "Each local[N] level drives ~2N cores on this box (N JVM task\n"
        "threads + N Arrow-UDF Python workers), so the N=4 / 4N=16 pair\n"
        "is the largest 1:4 comparison where BOTH levels fit the\n"
        "32-core machine without oversubscription — local[32] would\n"
        "demand ~64 cores and measure contention, not scaling.  On a\n"
        "real cluster each executor has its own host, so executor\n"
        "count N vs 4N maps to exactly this comparison.\n\n"
        f"| level | cores | URLs/sec | crawl wall s |\n|---|---|---|---|\n"
        f"| N | {n} | {t_lo} | {lo.get('wall_s', '?')} |\n"
        f"| 4N | {4*n} | {t_hi} | {hi.get('wall_s', '?')} |\n\n"
        f"**Scaling efficiency = (T_4N / T_N) / 4 = {eff}**\n\n"
        f"Raw: `{json.dumps({k: v for k, v in result.items() if k not in ('bench_n','bench_4n')})}`\n"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
