"""Content tier through the facade (r5): an html-backed WebCrawler
builds its fetch links FROM the html and attaches scraped
links/media/metadata + markdown structs to crawl results — the full
reference arun pipeline (fetch → scrape → markdown,
async_webcrawler.py:821-949) driven from reference-shaped call sites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.api import (
    BFSDeepCrawlStrategy,
    CrawlerRunConfig,
    LXMLWebScrapingStrategy,
    WebCrawler,
    WebScrapingStrategy,
)
from crawl4ai_spark.functions.markdown import (
    DefaultMarkdownGenerator,
    PruningContentFilter,
)
from crawl4ai_spark.sources import corpus
from crawl4ai_spark.sources.html_corpus import build_html_pages

N = 60


@pytest.fixture(scope="module")
def html_pages(spark):
    return build_html_pages(spark, N).drop("links").cache()


def test_html_backed_crawler_crawls_like_links_backed(spark, html_pages):
    seed = corpus.py_canonical_url(1)
    cfg = CrawlerRunConfig(
        deep_crawl_strategy=BFSDeepCrawlStrategy(max_depth=2)
    )
    got = WebCrawler(spark, html_pages).arun(seed, cfg).collect()
    want = WebCrawler(spark, corpus.build_pages(spark, N)).arun(
        seed, cfg
    ).collect()
    key = lambda r: r["emit_seq"]
    assert [(r["url"], r["depth"]) for r in sorted(got, key=key)] == [
        (r["url"], r["depth"]) for r in sorted(want, key=key)
    ]


def test_scraping_and_markdown_result_columns(spark, html_pages):
    crawler = WebCrawler(spark, html_pages, scrape_mode="full")
    cfg = CrawlerRunConfig(
        deep_crawl_strategy=BFSDeepCrawlStrategy(max_depth=1),
        scraping_strategy=LXMLWebScrapingStrategy(),
        markdown_generator=DefaultMarkdownGenerator(
            content_filter=PruningContentFilter(threshold=0.48)
        ),
    )
    rows = crawler.arun(corpus.py_canonical_url(1), cfg).collect()
    assert len(rows) > 2
    for r in rows:
        assert r["markdown"]["raw_markdown"].startswith("# doc-")
        assert "## References" in r["markdown"]["references_markdown"]
        assert r["markdown"]["fit_markdown"] != ""
        assert len(r["scraped"]["links"]) > 0
        assert r["scraped"]["metadata"]["title"].startswith("doc-")
    # scraping options forward: externals excluded
    no_ext = WebScrapingStrategy(exclude_external_links=True)
    rows2 = crawler.arun(
        corpus.py_canonical_url(6),
        CrawlerRunConfig(
            deep_crawl_strategy=BFSDeepCrawlStrategy(max_depth=0),
            scraping_strategy=no_ext,
        ),
    ).collect()
    assert all(
        not l["is_external"] for r in rows2 for l in r["scraped"]["links"]
    )
    assert "markdown" not in rows2[0].asDict()


def test_batch_path_content_and_links_corpus_guard(spark, html_pages):
    crawler = WebCrawler(spark, html_pages)
    res = crawler.arun_many(
        [corpus.py_canonical_url(1), corpus.py_canonical_url(2)],
        CrawlerRunConfig(markdown_generator=DefaultMarkdownGenerator()),
    ).collect()
    assert all(
        r["markdown"]["raw_markdown"].startswith("# doc-") for r in res
    )
    # links-backed corpus: asking for content columns raises
    links_crawler = WebCrawler(spark, corpus.build_pages(spark, N))
    with pytest.raises(ValueError, match="html-backed"):
        links_crawler.arun(
            corpus.py_canonical_url(1),
            CrawlerRunConfig(markdown_generator=DefaultMarkdownGenerator()),
        )


def test_scraping_strategy_scrap_entry_point():
    """Reference call-site parity: strategy.scrap(url, html) returns
    the ScrapingResult shape with internal/external link split."""
    html = """<html><head><title>T</title></head><body>
    <div>ctx words<img src="/i.png" width="200" height="200" alt="a"></div>
    <a href="/in">in</a><a href="https://other.org/x">out</a>
    <script>junk()</script></body></html>"""
    r = LXMLWebScrapingStrategy().scrap("https://e.com/p", html)
    assert r["success"]
    assert [l["href"] for l in r["links"]["internal"]] == [
        "https://e.com/in"
    ]
    assert [l["href"] for l in r["links"]["external"]] == [
        "https://other.org/x"
    ]
    assert r["media"]["images"][0]["src"] == "/i.png"
    assert r["metadata"]["title"] == "T"
    assert "junk" not in r["cleaned_html"]
    # per-call kwargs override ctor options
    r2 = WebScrapingStrategy().scrap(
        "https://e.com/p", html, exclude_external_links=True
    )
    assert r2["links"]["external"] == []
