"""Two-parallelism scaling evidence (BASELINE.md criterion).

Runs the identical bench job at local[N] and local[4N] (fresh JVM per
level — Spark master is fixed at session creation) and reports both
throughputs plus scaling efficiency = (T_4N / T_N) / 4.

Pair choice is constrained by the sandbox, not the engine: the box's
cgroup CPU quota delivers ~4x CPU only between small process counts
(tools/cpu_quota_probe.py), and every local[N] Arrow-UDF stage drives
~2N threads (N JVM task threads + N Python workers).  N=1 vs N=4
(2 vs 8 threads) is therefore the largest 1:4 pair whose CPU supply
actually quadruples; larger pairs measure the quota, not the engine.
On a real cluster each executor owns its cores, so executor count
N vs 4N maps to exactly this comparison.

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


def cpu_probe() -> list[dict]:
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "cpu_quota_probe.py"),
         "1", "2", "4", "8", "16", "32"],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    return [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    probe = cpu_probe()
    # best-of-REPS per level, INTERLEAVED (N, 4N, N, 4N): the sandbox
    # shows multi-minute noise spikes; interleaving gives both levels
    # the same exposure and best-of measures the engine, not the
    # neighbor.
    reps = int(os.environ.get("SCALING_REPS", "2"))
    lo_runs, hi_runs = [], []
    for _ in range(reps):
        lo_runs.append(run_level(n, sf_dir))
        hi_runs.append(run_level(4 * n, sf_dir))
    lo = max(lo_runs, key=lambda r: r["urls_per_sec"])
    hi = max(hi_runs, key=lambda r: r["urls_per_sec"])
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
        "cpu_probe": probe,
        "bench_n": lo,
        "bench_4n": hi,
    }
    probe_tbl = "\n".join(
        f"| {p['procs']} | {p['iters_per_sec']} | {p['scale_vs_linear']} |"
        for p in probe
    )
    md = ROOT / "BENCH_SCALING.md"
    md.write_text(
        "# Scaling evidence (N vs 4N parallelism)\n\n"
        "Same job, same input, two parallelism levels (sandbox stand-in\n"
        "for two cluster sizes — BASELINE.md criterion).\n\n"
        "## Why local[1] vs local[4]\n\n"
        "The sandbox enforces a CPU quota: an identical pure-Python burn\n"
        "at rising process counts shows aggregate CPU stops scaling well\n"
        "before 32 procs (table below; `scale_vs_linear` = throughput /\n"
        "(procs x 1-proc throughput)).  Every local[N] Arrow-UDF stage\n"
        "drives ~2N threads (N JVM task threads + N Python workers), so\n"
        "local[1]->local[4] (2->8 threads) is the largest 1:4 pair whose\n"
        "CPU supply actually quadruples; local[4]->local[16] (8->32\n"
        "threads) is quota-capped at ~2.9-3.4x CPU and cannot express a\n"
        "0.8+ engine efficiency regardless of the engine.  On a real\n"
        "cluster each executor owns its cores, so executor count N vs 4N\n"
        "maps to exactly this comparison.\n\n"
        "| procs | iters/s | scale vs linear |\n|---|---|---|\n"
        f"{probe_tbl}\n\n"
        "## Measurement\n\n"
        f"Interleaved best-of-{reps} per level, depth-3 multi-seed BFS\n"
        f"(seeds {lo.get('seeds')}, corpus {lo.get('corpus_pages')} pages,\n"
        f"{lo.get('bfs_urls_emitted')} URLs emitted), JIT/codegen warmup\n"
        "excluded (identical at both levels).\n\n"
        f"| level | cores | URLs/sec | crawl wall s |\n|---|---|---|---|\n"
        f"| N | {n} | {t_lo} | {lo.get('wall_s', '?')} |\n"
        f"| 4N | {4*n} | {t_hi} | {hi.get('wall_s', '?')} |\n\n"
        f"**Scaling efficiency = (T_4N / T_N) / 4 = {eff}**\n\n"
        f"All runs: N={[r['urls_per_sec'] for r in lo_runs]}, "
        f"4N={[r['urls_per_sec'] for r in hi_runs]} URLs/sec\n\n"
        f"Raw: `{json.dumps({k: v for k, v in result.items() if k not in ('bench_n','bench_4n','cpu_probe')})}`\n"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
