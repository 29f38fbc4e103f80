"""spark-submit entry point + --py-files packager (north-rule delivery).

Build the dependency zip and run the crawl as a submitted job:

    python tools/submit_job.py --package-only        # just build the zip
    spark-submit --py-files dist/crawl4ai_spark.zip \
        tools/submit_job.py --seeds 1000 --max-depth 2 --strategy bfs \
        --corpus-pages 100000 --out /tmp/crawl_out

On a real cluster, `--master yarn/k8s://...` works unchanged: the job
only uses the SparkSession handed to it (no local-mode assumptions);
the corpus table would be an Iceberg table path instead of the
synthetic generator.
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def build_zip(out_dir: Path | None = None) -> Path:
    """Zip the crawl4ai_spark package for --py-files distribution."""
    out_dir = out_dir or ROOT / "dist"
    out_dir.mkdir(exist_ok=True)
    zpath = out_dir / "crawl4ai_spark.zip"
    pkg = ROOT / "crawl4ai_spark"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted(pkg.rglob("*.py")):
            z.write(py, py.relative_to(ROOT))
    return zpath


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--package-only", action="store_true")
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--max-depth", type=int, default=2)
    ap.add_argument("--strategy", default="bfs",
                    choices=["bfs", "dfs", "best_first"])
    ap.add_argument("--max-pages", type=float, default=float("inf"))
    ap.add_argument("--corpus-pages", type=int, default=10_000)
    ap.add_argument("--seen-mode", default="exact", choices=["exact", "bloom"])
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--out", default=None, help="parquet output path")
    args = ap.parse_args()

    zpath = build_zip()
    if args.package_only:
        print(zpath)
        return

    sys.path.insert(0, str(ROOT))
    from pyspark.sql import SparkSession

    # Under spark-submit, the session comes from the launcher config;
    # builder.getOrCreate() attaches to it.  Standalone invocation
    # (python tools/submit_job.py) falls back to a local session.
    spark = SparkSession.builder.appName("crawl4ai-spark-crawl").getOrCreate()
    spark.sparkContext.addPyFile(str(zpath))

    from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
    from crawl4ai_spark.sources import corpus

    pages = CrawlEngine.prepare_pages(
        corpus.build_pages(spark, args.corpus_pages)
    )
    seeds = [
        corpus.py_canonical_url((17 * i + 1) % args.corpus_pages)
        for i in range(args.seeds)
    ]
    spec = CrawlSpec(
        max_depth=args.max_depth,
        strategy=args.strategy,
        max_pages=args.max_pages,
        seen_mode=args.seen_mode,
        checkpoint_dir=args.checkpoint_dir,
    )
    eng = CrawlEngine(spark, pages, spec)
    res = eng.run(sorted(set(seeds)))
    if args.out:
        res.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        n = res.count()
        print(f"crawled {n} results; metrics={eng.metrics[-3:]}")


if __name__ == "__main__":
    main()
