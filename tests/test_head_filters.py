"""Head-metadata filters F5/F6 (filters.py:502-691 semantics)."""

import math

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.head_filters import (
    ContentRelevanceFilter,
    SEOFilter,
    build_head_document,
    seo_canonical,
    seo_meta_description,
    seo_title_length,
    seo_url_quality,
)


def test_build_head_document_repeat_quirk(spark):
    # str*3 repeats with NO separator: "a b"*3 → "a ba ba b"
    df = spark.createDataFrame([("a b", "c", "k", "m1", "m2")],
                               "t string, d string, k string, m1 string, m2 string")
    doc = df.select(
        build_head_document(
            F.col("t"), F.col("d"), F.col("k"), [F.col("m1"), F.col("m2")]
        ).alias("doc")
    ).collect()[0]["doc"]
    assert doc == "a ba ba b cc k m1 m2"


def test_content_relevance_bm25_threshold(spark):
    f = ContentRelevanceFilter(query="spark engine", threshold=0.5)
    df = spark.createDataFrame(
        [("spark engine spark docs",), ("unrelated text entirely",)],
        "doc string",
    )
    got = [r["v"] for r in df.select(f.column(F.col("doc")).alias("v")).collect()]
    assert got == [True, False]
    # hand value: doc tokens [spark x2, engine, docs], dl=4
    s = 0.0
    for tf in (1.0, 2.0):  # engine, spark (sorted term order)
        idf = math.log(2.0 / (tf + 0.5) + 1.0)
        s += idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * 4.0 / 1000.0)))
    got_score = df.select(
        f.score_column(F.col("doc")).alias("s")
    ).collect()[0]["s"]
    assert got_score == pytest.approx(s, abs=1e-12)


def test_seo_subscores(spark):
    df = spark.createDataFrame([(1,)], "x int")
    vals = df.select(
        seo_title_length(F.lit("x" * 55)).alias("t1"),
        seo_title_length(F.lit("x" * 45)).alias("t2"),
        seo_title_length(F.lit("x" * 10)).alias("t3"),
        seo_meta_description(F.lit("d" * 150)).alias("d1"),
        seo_meta_description(F.lit("d" * 130)).alias("d2"),
        seo_meta_description(F.lit("d" * 10)).alias("d3"),
        seo_canonical(F.lit(None).cast("string"), F.lit("u")).alias("c1"),
        seo_canonical(F.lit("u"), F.lit("u")).alias("c2"),
        seo_canonical(F.lit("v"), F.lit("u")).alias("c3"),
        seo_url_quality(F.lit("https://x.com/a_b/2024/page?id=1")).alias("uq"),
    ).collect()[0]
    assert (vals["t1"], vals["t2"], vals["t3"]) == (1.0, 0.7, 0.3)
    assert (vals["d1"], vals["d2"], vals["d3"]) == (1.0, 0.5, 0.2)
    assert (vals["c1"], vals["c2"], vals["c3"]) == (0.5, 1.0, 0.2)
    # penalties: 4-digit year ×0.8, query ×0.6, underscore ×0.9
    assert vals["uq"] == pytest.approx(1.0 * 0.8 * 0.6 * 0.9, abs=1e-12)


def test_seo_filter_total(spark):
    f = SEOFilter(threshold=0.6, keywords=["spark", "crawl"])
    df = spark.createDataFrame(
        [
            # good page: keyword title (55 chars), good desc, canonical ok
            ("https://x.com/docs", "spark crawl guide".ljust(55, "x"),
             "d" * 150, "index,follow", "https://x.com/docs", True),
            # bad page: noindex, no canonical, junky url
            ("https://x.com/a_b/2024/p?q=1", "short", "d" * 10, "noindex",
             None, False),
        ],
        "url string, title string, description string, robots string, "
        "canonical string, has_ldjson boolean",
    )
    got = df.select(
        f.column(
            F.col("url"), F.col("title"), F.col("description"),
            F.col("robots"), F.col("canonical"), F.col("has_ldjson"),
        ).alias("v")
    ).collect()
    assert [r["v"] for r in got] == [True, False]


def test_bloom_cardinality_estimate(spark):
    from crawl4ai_spark.operators.seen_bloom import BloomSegments

    urls = spark.range(0, 3000).select(
        F.concat(F.lit("https://c.com/"), F.col("id").cast("string")).alias("url")
    )
    bloom = BloomSegments(spark, n_segments=8, capacity_per_segment=2048)
    bloom.add(urls)
    est = bloom.estimate_cardinality()
    assert 2700 <= est <= 3300  # within ~10%
