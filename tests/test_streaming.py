"""Structured Streaming surface: windowed event rollups (watermark) and
the crawl-snapshot tail, both drained with Trigger.AvailableNow for
determinism and cross-checked against the equivalent batch query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.streaming.windowed import (
    per_domain_rates,
    run_complete_available_now,
    stream_crawl_results,
    stream_windowed_events,
)

SF_DIR = "/root/testdata/sf0.001"


def test_windowed_events_matches_batch(spark):
    stream = stream_windowed_events(spark, f"{SF_DIR}/events.parquet")
    run_complete_available_now(stream, "win_events")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_events").collect()
    }
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("tv"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "tv")
        .collect()
    )
    want = {(r["ws"], r["event_type"]): (r["n"], r["tv"]) for r in batch}
    assert got == want
    assert len(got) > 0


@pytest.mark.usefixtures("spark")
def test_crawl_snapshot_tail(spark, tmp_path):
    from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
    from crawl4ai_spark.sources import corpus

    ckpt = str(tmp_path / "snaps")
    pages = corpus.build_pages(spark, 40)
    eng = CrawlEngine(
        spark,
        pages,
        CrawlSpec(max_depth=2, strategy="bfs", checkpoint_dir=ckpt),
    )
    eng.run("https://d1.example.com/docs/2016/doc-1.pdf")

    tail = stream_crawl_results(spark, ckpt, table="frontier")
    rates = per_domain_rates(
        tail.withColumn("success", F.lit(True))
    )
    run_complete_available_now(rates, "tail_rates")
    rows = spark.sql("SELECT * FROM tail_rates").collect()
    # every frontier row carries a d*.example.com URL
    assert rows and all(r["domain"].endswith("example.com") for r in rows)
    assert sum(r["fetched"] for r in rows) > 0


def test_stream_scrape_pages(spark, tmp_path):
    """HTML-tier extraction under a streaming scan (r5): the scraped
    link/metadata output of the streaming query equals the batch
    scrape of the same pages."""
    from crawl4ai_spark.functions.scrape import with_scraped_page
    from crawl4ai_spark.sources.html_corpus import build_html_pages
    from crawl4ai_spark.streaming.windowed import (
        run_available_now,
        stream_scrape_pages,
    )

    pages = build_html_pages(spark, 40).select("doc_id", "url", "html")
    d = str(tmp_path / "html_pages")
    pages.repartition(4).write.parquet(d)

    out = stream_scrape_pages(spark, d, markdown=True)
    run_available_now(out, "scraped_stream")
    got = spark.table("scraped_stream")
    assert got.count() == 40
    batch = with_scraped_page(pages).select(
        "doc_id",
        F.size("scraped.links").alias("n_links"),
        F.col("scraped.metadata")["title"].alias("title"),
    )
    stream_side = got.select(
        "doc_id",
        F.size("scraped.links").alias("n_links"),
        F.col("scraped.metadata")["title"].alias("title"),
    )
    a = {(r["doc_id"], r["n_links"], r["title"]) for r in batch.collect()}
    b = {(r["doc_id"], r["n_links"], r["title"])
         for r in stream_side.collect()}
    assert a == b
    md = got.select("markdown.raw_markdown").limit(1).collect()
    assert md[0]["raw_markdown"].startswith("# doc-")
