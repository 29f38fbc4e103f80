"""Microbenchmark of the round-0 discovery pipeline, step by step.

Usage: python tools/profile_discover.py [cpus]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    from crawl4ai_spark.functions.filters import valid_crawl_url
    from crawl4ai_spark.functions.normalize import normalize_udf
    from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
    from crawl4ai_spark.session import get_spark
    from crawl4ai_spark.sources import corpus

    import bench

    spark = get_spark("profile_discover", cpus=cpus, shuffle_partitions=cpus)
    n_corpus = 1_000_000
    pages = CrawlEngine.prepare_pages(corpus.build_pages(spark, n_corpus))
    pages.count()
    spark.range(0, cpus * 4, 1, cpus).select(
        normalize_udf(F.lit("https://w.com/a"), F.lit("https://w.com/")).alias("n")
    ).count()
    seeds = sorted(
        {corpus.py_canonical_url((17 * i + 1) % n_corpus) for i in range(30000)}
    )

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        print(f"{name:28s} {time.time() - t0:8.2f}s  -> {out}")

    frontier = spark.createDataFrame(
        [(s, None, 0, 0.0, i) for i, s in enumerate(seeds)],
        "url string, parent_url string, depth int, score double, seq long",
    )
    eng = CrawlEngine(
        spark, pages, CrawlSpec(max_depth=2, strategy="bfs", scorer=bench.SCORER)
    )
    frontier = frontier.localCheckpoint(eager=True)
    timed("fetch_join", lambda: eng._fetch(frontier).count())
    emitted = (
        eng._fetch(frontier)
        .withColumn("emit_seq", F.col("seq"))
        .withColumn("round", F.lit(0))
        .select("emit_seq", "round", "url", "depth", "parent_url",
                "score", "success", "status_code", "links")
        .localCheckpoint(eager=True)
    )
    parents = emitted.filter(F.col("success"))

    linked = parents.select(
        F.col("url").alias("src_url"), "emit_seq", "depth",
        F.posexplode_outer("links").alias("link_idx", "link"),
    ).filter(F.col("link").isNotNull()).filter(~F.col("link.is_external"))
    timed("explode_only", lambda: linked.count())

    norm = linked.withColumn(
        "norm_url", normalize_udf(F.col("link.href"), F.col("src_url"))
    ).filter(F.col("norm_url").isNotNull())
    timed("explode+normalize", lambda: norm.count())

    cand = norm.withColumn("next_depth", F.col("depth") + 1).filter(
        F.col("next_depth") <= 2
    )
    ok = valid_crawl_url(F.col("norm_url"))
    cand1 = cand.filter(ok)
    timed("+validity", lambda: cand1.count())

    cand2 = cand1.withColumn("score", bench.SCORER.column(F.col("norm_url")))
    timed("+scorer", lambda: cand2.count())

    w = Window.partitionBy("norm_url").orderBy("emit_seq", "link_idx")
    dd = cand2.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    timed("+dedupe_window", lambda: dd.count())

    timed("full_ckpt", lambda: dd.localCheckpoint(eager=True).count())


if __name__ == "__main__":
    main()
