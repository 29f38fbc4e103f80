"""Two-phase distributed ranking must be bit-identical to the global
window — verified directly and through full engine parity with the
threshold forced to 0 (so every rank takes the parallel path)."""

import pytest
from pyspark.sql import functions as F

import crawl4ai_spark.operators.ordering as ordering
from crawl4ai_spark.operators.ordering import with_global_cumsum, with_global_rank


def test_rank_matches_window(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") * 37 % 5000).alias("k"), F.col("id").alias("v")
    )
    small = with_global_rank(df, [F.asc("k")], "rn", n_rows_hint=10).collect()
    large = with_global_rank(df, [F.asc("k")], "rn", n_rows_hint=10**9).collect()
    assert sorted((r["k"], r["rn"]) for r in small) == sorted(
        (r["k"], r["rn"]) for r in large
    )


def test_cumsum_matches_window(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("k"), (F.col("id") % 3 == 0).cast("long").alias("f")
    )
    small = with_global_cumsum(df, ["k"], F.col("f"), "c", n_rows_hint=10).collect()
    large = with_global_cumsum(df, ["k"], F.col("f"), "c", n_rows_hint=10**9).collect()
    assert sorted((r["k"], r["c"]) for r in small) == sorted(
        (r["k"], int(r["c"])) for r in large
    )


def test_engine_parity_with_forced_two_phase(spark, monkeypatch):
    from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
    from crawl4ai_spark.oracle import CrawlSpec as OSpec, crawl_oracle
    from crawl4ai_spark.sources import corpus

    monkeypatch.setattr(ordering, "TWO_PHASE_THRESHOLD", 0)
    start = corpus.py_canonical_url(1)
    pages = corpus.build_pages(spark, 60)
    kw = dict(max_depth=2, strategy="bfs", max_pages=12)
    eng = CrawlEngine(spark, pages, CrawlSpec(**kw))
    got = [
        (r["emit_seq"], r["url"], r["depth"], r["parent_url"], r["success"])
        for r in eng.run(start).collect()
    ]
    exp, _ = crawl_oracle(corpus.pages_dict(60), start, OSpec(**kw))
    assert got == [(e.seq, e.url, e.depth, e.parent_url, e.success) for e in exp]
