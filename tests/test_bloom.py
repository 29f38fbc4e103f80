"""Partitioned bloom segments: no false negatives, bounded false
positives, and engine equivalence (bloom seen store == exact store)."""

from pyspark.sql import functions as F

from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.operators.seen_bloom import BloomSegments, BloomSeenStore
from crawl4ai_spark.sources import corpus


def test_no_false_negatives_and_bounded_fp(spark):
    urls = spark.range(0, 2000).select(
        F.concat(F.lit("https://x.com/p/"), F.col("id").cast("string")).alias("url")
    )
    bloom = BloomSegments(spark, n_segments=8, capacity_per_segment=1024, fp_rate=0.01)
    bloom.add(urls)
    # every inserted URL must probe maybe_seen=True
    probed = bloom.probe(urls, "url")
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    # fresh URLs: false-positive rate well under 5× the target
    fresh = spark.range(10_000, 14_000).select(
        F.concat(F.lit("https://x.com/p/"), F.col("id").cast("string")).alias("url")
    )
    fp = bloom.probe(fresh, "url").filter(F.col("maybe_seen")).count()
    assert fp / 4000 < 0.05


def test_incremental_merge(spark):
    a = spark.range(0, 500).select(
        F.concat(F.lit("https://a.com/"), F.col("id").cast("string")).alias("url")
    )
    b = spark.range(500, 1000).select(
        F.concat(F.lit("https://a.com/"), F.col("id").cast("string")).alias("url")
    )
    bloom = BloomSegments(spark, n_segments=4, capacity_per_segment=2048)
    bloom.add(a)
    bloom.add(b)
    both = a.unionByName(b)
    assert bloom.probe(both, "url").filter(~F.col("maybe_seen")).count() == 0


def test_bloom_store_antijoin_equals_exact(spark):
    store = BloomSeenStore(spark, n_segments=4, capacity_per_segment=4096)
    seen = spark.range(0, 300).select(
        F.concat(F.lit("https://s.com/"), F.col("id").cast("string")).alias("url")
    )
    store.add(seen)
    cand = spark.range(150, 600).select(
        F.concat(F.lit("https://s.com/"), F.col("id").cast("string")).alias("url")
    )
    got = sorted(r["url"] for r in store.anti_join(cand, "url").collect())
    expected = sorted(f"https://s.com/{i}" for i in range(300, 600))
    assert got == expected


def test_engine_bloom_matches_exact(spark):
    pages = corpus.build_pages(spark, 60)
    start = corpus.py_canonical_url(1)
    results = {}
    for mode in ("exact", "bloom"):
        eng = CrawlEngine(
            spark, pages, CrawlSpec(max_depth=2, strategy="bfs", seen_mode=mode)
        )
        rows = eng.run(start).collect()
        results[mode] = [
            (r["emit_seq"], r["url"], r["depth"], r["parent_url"]) for r in rows
        ]
    assert results["exact"] == results["bloom"]
