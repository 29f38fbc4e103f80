"""Per-round phase profile of the scaling-mode BFS crawl.

Usage: python tools/profile_bfs.py [cpus] [seeds] [corpus_mult] [depth]
Prints per-round phase timings from CrawlEngine.metrics.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 60000
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    sf_dir = "/root/testdata/sf0.1"

    from crawl4ai_spark.functions.normalize import normalize_udf
    from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
    from crawl4ai_spark.session import get_spark
    from crawl4ai_spark.sources import corpus

    import bench

    spark = get_spark("profile", cpus=cpus, shuffle_partitions=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_corpus = docs.count() * mult
    pages = CrawlEngine.prepare_pages(corpus.build_pages(spark, n_corpus))
    pages.count()
    from crawl4ai_spark.operators import ordering as _ordering

    warm = CrawlEngine(
        spark, pages,
        CrawlSpec(max_depth=2, strategy="bfs", scorer=bench.SCORER,
                  repartition_discovery=True),
    )
    _thr = _ordering.TWO_PHASE_THRESHOLD
    _ordering.TWO_PHASE_THRESHOLD = 1
    try:
        warm.run(spark.range(0, 64).select(
            corpus.canonical_url_col((F.col("id") * 31) % n_corpus).alias("url")
        ))
    finally:
        _ordering.TWO_PHASE_THRESHOLD = _thr
    spark.range(0, cpus * 4, 1, cpus).select(
        normalize_udf(F.lit("https://w.com/a"), F.lit("https://w.com/")).alias("n")
    ).count()
    seed_src = spark.range(0, n_seeds).select(
        corpus.canonical_url_col((F.col("id") * 17 + 1) % n_corpus).alias("url")
    )

    t0 = time.time()
    eng = CrawlEngine(
        spark, pages, CrawlSpec(max_depth=depth, strategy="bfs", scorer=bench.SCORER)
    )
    n = eng.run(seed_src).count()
    wall = time.time() - t0
    print(json.dumps({
        "cpus": cpus, "corpus": n_corpus, "seeds": n_seeds,
        "emitted": n, "wall": round(wall, 1),
        "urls_per_sec": round(n / wall, 1),
    }))
    for m in eng.metrics:
        print(json.dumps(m))


if __name__ == "__main__":
    main()
