"""Where do local-cluster[4]'s extra CPU-seconds go vs local-cluster[1]?

r4's solo-alternating runs show the fully-warm 4-executor topology
burning ~1.5x the JVM CPU of the 1-executor topology for the IDENTICAL
scaling crawl (both solo, near-zero steal).  That tax — not host supply
— is what caps raw scaling efficiency at ~0.7.  This probe attributes
it: it runs the exact bench scaling workload (same corpus, seeds,
spec) under one topology with the Spark UI REST API on, warms until
the crawl wall converges, then diffs /api/v1 stage metrics across the
final measured crawl:

    executorRunTime / executorCpuTime   — task work
    jvmGcTime                           — GC inside task threads
    shuffleWriteTime / FetchWaitTime    — shuffle serde + netty waits
    executorDeserializeTime             — task binary + broadcast deser
    resultSerializationTime             — result path

Usage: taskset -c 16-25 python tools/profile_topology.py 4 [sf_dir]
       taskset -c 0-3   python tools/profile_topology.py 1 [sf_dir]
Env: BENCH_SEEDS (default 160000), PROFILE_MAX_WARM (default 10),
PROFILE_UI_PORT (default 4055).
Prints one JSON line with the stage-metric deltas of the last crawl.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _get(port: int, path: str):
    with urllib.request.urlopen(
        f"http://localhost:{port}/api/v1{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def main():
    n_exec = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    seeds_n = int(os.environ.get("BENCH_SEEDS", "160000"))
    max_warm = int(os.environ.get("PROFILE_MAX_WARM", "10"))
    port = int(os.environ.get("PROFILE_UI_PORT", "4055"))

    mem = int(os.environ.get("SCALING_EXECUTOR_MB", "6144"))
    os.environ["SPARK_GRAFT_MASTER"] = f"local-cluster[{n_exec},1,{mem}]"
    os.environ["SPARK_GRAFT_EXECUTOR_MEM"] = f"{mem - 512}m"

    os.environ["BENCH_MODE"] = "scaling"  # bench constants: mult/depth/scorer
    from pyspark.sql import functions as F

    from crawl4ai_spark.session import get_spark
    from crawl4ai_spark.sources import corpus
    from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec

    import bench

    spark = get_spark(
        "profile_topology", cpus=n_exec, shuffle_partitions=max(4, n_exec),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(port),
            "spark.appStatusStore.maxRetainedStages": "5000",
        },
    )
    scorer = bench.SCORER
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_corpus = docs.count() * bench.CORPUS_MULT
    pages = CrawlEngine.prepare_pages(corpus.build_pages(spark, n_corpus))
    pages.count()
    seed_src = spark.range(0, seeds_n).select(
        corpus.canonical_url_col((F.col("id") * 17 + 1) % n_corpus).alias("url")
    )

    def crawl() -> float:
        eng = CrawlEngine(
            spark, pages, CrawlSpec(max_depth=3, strategy="bfs", scorer=scorer)
        )
        t0 = time.time()
        eng.run(seed_src).count()
        return time.time() - t0

    app_id = _get(port, "/applications")[0]["id"]

    walls, streak = [], 0
    for i in range(max_warm):
        w = crawl()
        walls.append(round(w, 2))
        print(f"warm {i}: wall={w:.2f}s", file=sys.stderr, flush=True)
        if len(walls) > 1 and abs(walls[-1] - walls[-2]) / walls[-2] < 0.03:
            streak += 1
            if streak >= 2:
                break
        else:
            streak = 0

    def stage_ids():
        return {
            s["stageId"]
            for s in _get(port, f"/applications/{app_id}/stages?status=COMPLETE")
        }

    before = stage_ids()
    wall = crawl()
    stages = [
        s
        for s in _get(port, f"/applications/{app_id}/stages?status=COMPLETE")
        if s["stageId"] not in before
    ]
    keys = [
        "executorRunTime", "executorCpuTime", "jvmGcTime",
        "executorDeserializeTime", "executorDeserializeCpuTime",
        "resultSerializationTime", "shuffleWriteTime",
        "shuffleFetchWaitTime", "shuffleWriteBytes", "shuffleReadBytes",
        "shuffleRemoteBytesRead", "shuffleLocalBytesRead",
        "memoryBytesSpilled", "diskBytesSpilled", "numTasks",
        "inputBytes", "inputRecords",
    ]
    agg = {k: 0 for k in keys}
    for s in stages:
        for k in keys:
            agg[k] += s.get(k) or 0
    top = sorted(stages, key=lambda s: -(s.get("executorCpuTime") or 0))[:10]
    for s in top:
        print(json.dumps({
            "stage": s["stageId"],
            "name": (s.get("name") or "")[:60],
            "tasks": s.get("numTasks"),
            "cpu_s": round((s.get("executorCpuTime") or 0) / 1e9, 2),
            "run_s": round((s.get("executorRunTime") or 0) / 1e3, 2),
            "in_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
            "sw_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 1),
            "sr_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 1),
        }), file=sys.stderr, flush=True)
    # nano -> seconds for the two nano-denominated metrics
    out = {
        "topology": f"local-cluster[{n_exec},1,{mem}]",
        "wall_s": round(wall, 2),
        "n_stages": len(stages),
        "n_tasks": agg["numTasks"],
        "run_s": round(agg["executorRunTime"] / 1e3, 2),
        "cpu_s": round(agg["executorCpuTime"] / 1e9, 2),
        "gc_s": round(agg["jvmGcTime"] / 1e3, 2),
        "deser_s": round(agg["executorDeserializeTime"] / 1e3, 2),
        "deser_cpu_s": round(agg["executorDeserializeCpuTime"] / 1e9, 2),
        "result_ser_s": round(agg["resultSerializationTime"] / 1e3, 2),
        "shuffle_write_s": round(agg["shuffleWriteTime"] / 1e9, 2),
        "shuffle_fetch_wait_s": round(agg["shuffleFetchWaitTime"] / 1e3, 2),
        "shuffle_write_mb": round(agg["shuffleWriteBytes"] / 1e6, 1),
        "shuffle_read_mb": round(agg["shuffleReadBytes"] / 1e6, 1),
        "shuffle_remote_mb": round(agg["shuffleRemoteBytesRead"] / 1e6, 1),
        "shuffle_local_mb": round(agg["shuffleLocalBytesRead"] / 1e6, 1),
        "spill_mem_mb": round(agg["memoryBytesSpilled"] / 1e6, 1),
        "input_mb": round(agg["inputBytes"] / 1e6, 1),
        "input_rows": agg["inputRecords"],
        "warm_walls": walls,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
