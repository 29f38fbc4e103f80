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

Noise protocol (VERDICT r2 #3): >=3 interleaved reps per level
(N, 4N, N, 4N, ...); each level runs best-of-2 crawls inside one JVM
(symmetric burst guard).  Headline = MEDIAN of per-pair ratios
(4N_i / N_i) / 4 — a pair's two runs are temporally adjacent, so slow
contention drift cancels inside each ratio; the level-median pairing
and best/worst cases are reported alongside, plus a local[2]/local[8]
cross-check point away from the single-core regime.

Usage: python tools/scaling_bench.py [N] [sf_dir]
Env: SCALING_REPS (default 3), BENCH_CRAWL_REPS (default 2),
SCALING_CROSS=0 to skip the cross-check, CROSS_REPS (default 2).
Writes/updates BENCH_SCALING.md and prints a JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_level(cpus: int, sf_dir: str, extra_env: dict | None = None) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("BENCH_MODE", "scaling")
    if extra_env:
        env.update(extra_env)
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


def pairings(lo_runs: list[dict], hi_runs: list[dict]) -> dict:
    """Efficiency estimators over interleaved (N, 4N) run pairs.

    Headline = median of PER-PAIR ratios: rep i's N and 4N runs are
    temporally adjacent (interleave order N, 4N, N, 4N, ...), so slow
    box-contention drift hits both sides of a pair and cancels in the
    ratio — unlike the level-median pairing, which compares runs up to
    an hour apart.  The level-median pairing is reported alongside.
    """
    lo = [r["urls_per_sec"] for r in lo_runs]
    hi = [r["urls_per_sec"] for r in hi_runs]
    per_pair = [round((h / l) / 4, 3) for l, h in zip(lo, hi)]
    return {
        "runs_n": lo,
        "runs_4n": hi,
        "eff_per_pair": per_pair,
        "eff_median": round(statistics.median(per_pair), 3),
        "eff_level_median": round(
            (statistics.median(hi) / statistics.median(lo)) / 4, 3
        ),
        "eff_best": round((max(hi) / min(lo)) / 4, 3),
        "eff_worst": round((min(hi) / max(lo)) / 4, 3),
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    probe = cpu_probe()
    reps = int(os.environ.get("SCALING_REPS", "3"))
    # best-of-K crawls inside each JVM (symmetric at both levels): a
    # ~30-s 4N crawl is hostage to a single quota burst in a way a
    # ~110-s N crawl is not; within-session repetition de-biases that
    crawl_reps = {"BENCH_CRAWL_REPS": os.environ.get("BENCH_CRAWL_REPS", "2")}
    lo_runs, hi_runs = [], []
    for _ in range(reps):
        lo_runs.append(run_level(n, sf_dir, crawl_reps))
        hi_runs.append(run_level(4 * n, sf_dir, crawl_reps))
    main_pair = pairings(lo_runs, hi_runs)
    eff = main_pair["eff_median"]

    # cross-check pair away from the 1-core memory-thrash regime;
    # ceiling note: the quota itself only scales 2->8 procs by ~3.3x
    # (eff ~0.83), so this point under-reports the engine by design
    cross = None
    if os.environ.get("SCALING_CROSS", "1") != "0" and n == 1:
        # per-core-matched workload: 2x the seeds of the 1/4 pair so the
        # N=2 level does the same work per core as N=1 did — otherwise
        # the 8-core run finishes in ~20s and fixed per-round costs
        # (invariant to core count) dominate the ratio
        cross_env = {"BENCH_SEEDS": os.environ.get("CROSS_SEEDS", "80000"),
                     **crawl_reps}
        c_lo, c_hi = [], []
        for _ in range(int(os.environ.get("CROSS_REPS", "2"))):
            c_lo.append(run_level(2, sf_dir, cross_env))
            c_hi.append(run_level(8, sf_dir, cross_env))
        cross = pairings(c_lo, c_hi)

    # Quota-relative efficiency: every local[M] Arrow-UDF crawl stage
    # drives ~2M processes (M JVM task threads + M python workers), so
    # the N=1 vs 4N=4 pair consumes 2 vs 8 processes of box CPU.  The
    # same-day probe measures how much aggregate CPU the box's cgroup
    # quota actually delivers between those counts — on a contended day
    # that ratio itself drops well below 4x, capping raw efficiency for
    # ANY engine.  eff_quota_rel = raw speedup / delivered-CPU ratio is
    # the box-independent number (on a real cluster executors own their
    # cores and the denominator is 4).
    probe_by = {p["procs"]: p["iters_per_sec"] for p in probe}
    quota_ratio = (
        probe_by[2 * 4 * n] / probe_by[2 * n]
        if probe_by.get(2 * n) and probe_by.get(2 * 4 * n)
        else None
    )
    eff_quota_rel = (
        round(eff * 4 / quota_ratio, 3) if quota_ratio else None
    )
    lo_best = max(lo_runs, key=lambda r: r["urls_per_sec"])
    hi_best = max(hi_runs, key=lambda r: r["urls_per_sec"])
    result = {
        "metric": "scaling_efficiency",
        "n_cpus": n,
        "n4_cpus": 4 * n,
        "urls_per_sec_n": statistics.median(main_pair["runs_n"]),
        "urls_per_sec_4n": statistics.median(main_pair["runs_4n"]),
        "efficiency": eff,
        "quota_cpu_ratio_2_to_8_procs": round(quota_ratio, 3)
        if quota_ratio
        else None,
        "efficiency_quota_relative": eff_quota_rel,
        "pairings": main_pair,
        "cross_check_2_8": cross,
        "reps": reps,
        "sf_dir": sf_dir,
        "cpu_probe": probe,
        "bench_n": lo_best,
        "bench_4n": hi_best,
    }
    # append-only measurement history (every run, raw + probe context)
    with open(ROOT / "BENCH_SCALING_HISTORY.jsonl", "a") as fh:
        fh.write(json.dumps(
            {k: v for k, v in result.items() if k not in ("bench_n", "bench_4n")}
        ) + "\n")
    probe_tbl = "\n".join(
        f"| {p['procs']} | {p['iters_per_sec']} | {p['scale_vs_linear']} |"
        for p in probe
    )
    cross_md = ""
    if cross is not None:
        cross_md = (
            "\n## Cross-check: local[2] vs local[8]\n\n"
            "Same job away from the single-core regime, seeds doubled\n"
            "(per-core work matched to the 1/4 pair).  The quota's own\n"
            "4->16-proc scaling (probe table) caps this point below\n"
            "1.0, and local[8]'s 16 threads sit in the box's\n"
            "oversubscription band — a sanity bound, not the criterion\n"
            "measurement.\n\n"
            f"Runs (URLs/sec): N=2 {cross['runs_n']}, "
            f"4N=8 {cross['runs_4n']}\n\n"
            f"median-pairing efficiency **{cross['eff_median']}** "
            f"(best {cross['eff_best']}, worst {cross['eff_worst']})\n"
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
        f"{reps} interleaved reps per level (N, 4N, N, 4N, ...), depth-3\n"
        f"multi-seed BFS (seeds {lo_best.get('seeds')}, corpus\n"
        f"{lo_best.get('corpus_pages')} pages,\n"
        f"{lo_best.get('bfs_urls_emitted')} URLs emitted), JIT/codegen\n"
        "warmup excluded (identical at both levels); each level takes\n"
        "best-of-2 crawls within one JVM (symmetric burst guard).\n"
        "Headline = median of per-pair ratios (4N_i / N_i) / 4 over the\n"
        "interleaved pairs: a pair's two runs are adjacent in time, so\n"
        "slow box-contention drift cancels inside each ratio — robust\n"
        "to the box's documented +-40% quota noise (VERDICT r2 #3).\n\n"
        f"All runs (URLs/sec): N={main_pair['runs_n']},\n"
        f"4N={main_pair['runs_4n']}\n"
        f"Per-pair efficiencies: {main_pair['eff_per_pair']}\n\n"
        f"**Scaling efficiency (median per-pair) = {eff}**\n"
        f"(level-median pairing {main_pair['eff_level_median']}, "
        f"best-case {main_pair['eff_best']}, worst-case "
        f"{main_pair['eff_worst']})\n\n"
        "## Quota-relative efficiency (same-day box ceiling)\n\n"
        "The crawl drives ~2M processes at local[M] (JVM tasks + python\n"
        "workers): the N=1 vs 4N=4 pair consumes 2 vs 8 procs.  The\n"
        "probe above measures how much aggregate CPU the box actually\n"
        "delivers between those counts on THIS run's day — on a\n"
        "contended day that is itself well below 4x, capping raw\n"
        "efficiency for any engine.  On a real cluster each executor\n"
        "owns its cores and the denominator is 4.\n\n"
        f"Delivered-CPU ratio 2→8 procs (same-day probe): "
        f"**{round(quota_ratio, 3) if quota_ratio else 'n/a'}** "
        "(4.0 = uncontended)\n\n"
        f"**Quota-relative efficiency = {eff_quota_rel}** "
        "(raw speedup / delivered-CPU ratio)\n\n"
        "Full per-run history (every invocation, raw + probe):\n"
        "`BENCH_SCALING_HISTORY.jsonl`\n"
        f"{cross_md}\n"
        f"Raw: `{json.dumps({k: v for k, v in result.items() if k not in ('bench_n', 'bench_4n', 'cpu_probe')})}`\n"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
