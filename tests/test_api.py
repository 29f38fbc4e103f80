"""Reference-shaped facade (crawl4ai_spark.api): strategy objects,
CacheMode read/write gates, robots gate, deep-crawl divert parity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.api import (
    BestFirstCrawlingStrategy,
    BFSDeepCrawlStrategy,
    CacheMode,
    CrawlerRunConfig,
    DFSDeepCrawlStrategy,
    WebCrawler,
)
from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.operators.robots import RobotsRules
from crawl4ai_spark.sources import corpus


@pytest.fixture(scope="module")
def pages(spark):
    return corpus.build_pages(spark, 60).cache()


def _url(i: int) -> str:
    return corpus.py_canonical_url(i)


def test_strategy_ctor_mapping():
    s = BestFirstCrawlingStrategy(
        max_depth=3, include_external=True, score_threshold=0.25, max_pages=7
    )
    spec = s.to_spec()
    assert spec.strategy == "best_first"
    assert spec.max_depth == 3 and spec.include_external
    assert spec.score_threshold == 0.25 and spec.max_pages == 7
    assert DFSDeepCrawlStrategy(max_depth=1).to_spec().strategy == "dfs"
    d = BFSDeepCrawlStrategy(max_depth=1).to_spec()
    assert d.strategy == "bfs" and d.score_threshold == -math.inf


def test_deep_crawl_divert_matches_engine(spark, pages):
    crawler = WebCrawler(spark, pages)
    got = crawler.arun(
        _url(1),
        CrawlerRunConfig(deep_crawl_strategy=BFSDeepCrawlStrategy(max_depth=2)),
    ).collect()
    want = (
        CrawlEngine(spark, pages, CrawlSpec(max_depth=2, strategy="bfs"))
        .run(_url(1))
        .collect()
    )
    key = lambda r: r["emit_seq"]
    assert [(r["url"], r["depth"]) for r in sorted(got, key=key)] == [
        (r["url"], r["depth"]) for r in sorted(want, key=key)
    ]


def test_cache_mode_gates(spark, pages):
    crawler = WebCrawler(spark, pages)
    u = _url(1)

    # ENABLED miss: live fetch, then written to cache
    r1 = crawler.arun(u, CrawlerRunConfig(cache_mode=CacheMode.ENABLED)).collect()
    assert len(r1) == 1 and not r1[0]["from_cache"] and r1[0]["success"]
    assert crawler.cache.count() == 1

    # ENABLED hit: served from cache
    r2 = crawler.arun(u, CrawlerRunConfig(cache_mode=CacheMode.ENABLED)).collect()
    assert r2[0]["from_cache"]

    # BYPASS: ignores the cache both ways
    r3 = crawler.arun(u, CrawlerRunConfig(cache_mode=CacheMode.BYPASS)).collect()
    assert not r3[0]["from_cache"]
    assert crawler.cache.count() == 1

    # READ_ONLY on a new url: live fetch, NOT written
    v = _url(2)
    r4 = crawler.arun(v, CrawlerRunConfig(cache_mode=CacheMode.READ_ONLY)).collect()
    assert not r4[0]["from_cache"]
    assert crawler.cache.filter(F.col("url") == v).count() == 0

    # WRITE_ONLY: no read (u stays live-fetched) but v gets written
    r5 = crawler.arun_many(
        [u, v], CrawlerRunConfig(cache_mode=CacheMode.WRITE_ONLY)
    ).collect()
    assert all(not r["from_cache"] for r in r5)
    assert crawler.cache.filter(F.col("url") == v).count() == 1

    # DISABLED: neither
    w = _url(3)
    crawler.arun(w, CrawlerRunConfig(cache_mode=CacheMode.DISABLED)).collect()
    assert crawler.cache.filter(F.col("url") == w).count() == 0

    # config.cache_mode=None defaults to ENABLED (async_webcrawler.py:261)
    r7 = crawler.arun(u, CrawlerRunConfig(cache_mode=None)).collect()
    assert r7[0]["from_cache"]


def test_dead_url_fails_and_is_not_cached(spark, pages):
    crawler = WebCrawler(spark, pages)
    r = crawler.arun(
        "https://nowhere.example.com/x",
        CrawlerRunConfig(cache_mode=CacheMode.ENABLED),
    ).collect()
    assert len(r) == 1 and not r[0]["success"] and r[0]["status_code"] is None
    assert crawler.cache.count() == 0


def test_robots_gate_403_never_fetched_or_cached(spark, pages):
    u = _url(1)
    dom = u.split("/")[2]
    robots = RobotsRules(disallow={dom: ["/docs"]})
    crawler = WebCrawler(spark, pages, robots=robots)
    cfg = CrawlerRunConfig(cache_mode=CacheMode.ENABLED, check_robots_txt=True)
    rows = {r["url"]: r for r in crawler.arun_many([u, _url(2)], cfg).collect()}
    blocked = rows[u]
    assert not blocked["success"] and blocked["status_code"] == 403
    assert crawler.cache.filter(F.col("url") == u).count() == 0
    # robots off: same url fetches fine
    ok = crawler.arun(u, CrawlerRunConfig(cache_mode=CacheMode.BYPASS)).collect()
    assert ok[0]["success"]
    # reference ordering: the cache is read BEFORE the robots gate
    # (async_webcrawler.py:260-348 vs :383-397) — once cached (with the
    # gate off), the blocked url is served from cache
    crawler.arun(u, CrawlerRunConfig(cache_mode=CacheMode.ENABLED))
    served = crawler.arun(u, cfg).collect()
    assert served[0]["from_cache"] and served[0]["success"]


def test_rate_limited_batch_fetch(spark, pages):
    """enable_rate_limiting routes the non-deep arun_many batch through
    the politeness engine (the reference's dispatcher RateLimiter
    wiring, async_webcrawler.py:1054-1066) — same result set as the
    flat join, budget machinery exercised."""
    # include an unknown url: both paths must emit exactly ONE row per
    # input url (the politeness engine must not double-emit dead urls)
    urls = [_url(i) for i in range(1, 30)] + ["https://nowhere.example.com/x"]
    crawler = WebCrawler(spark, pages)
    plain = crawler.arun_many(
        urls, CrawlerRunConfig(cache_mode=CacheMode.BYPASS)
    ).collect()
    limited = crawler.arun_many(
        urls,
        CrawlerRunConfig(cache_mode=CacheMode.BYPASS, enable_rate_limiting=True),
    ).collect()
    key = lambda rows: sorted((r["url"], r["success"], r["status_code"]) for r in rows)
    assert key(limited) == key(plain)
    assert len(limited) == len(set(urls))
    # explicit politeness spec wins over the mean_delay defaults
    from crawl4ai_spark.operators.politeness import PolitenessSpec

    cfg = CrawlerRunConfig(
        politeness=PolitenessSpec(round_duration=2.0, seed=3),
        enable_rate_limiting=True,
    )
    assert cfg.effective_politeness().round_duration == 2.0
    d = CrawlerRunConfig(enable_rate_limiting=True).effective_politeness()
    assert (d.base_lo, d.base_hi, d.max_delay, d.max_retries) == (0.1, 0.4, 60.0, 3)


def test_adaptive_facade_matches_engine(spark):
    from crawl4ai_spark.api import AdaptiveConfig, AdaptiveCrawler
    from crawl4ai_spark.operators.adaptive_crawl import (
        AdaptiveCrawler as Engine,
        AdaptiveSpec,
    )
    from crawl4ai_spark.sources.adaptive_corpus import (
        adaptive_url,
        build_adaptive_pages,
    )

    pages = build_adaptive_pages(spark, 40)
    cfg = AdaptiveConfig(confidence_threshold=0.5, max_depth=4)
    adaptive = AdaptiveCrawler(WebCrawler(spark, pages), cfg)
    with pytest.raises(RuntimeError):
        _ = adaptive.confidence
    hist = adaptive.digest(adaptive_url(0), "alpha beta").collect()

    want = Engine(
        spark, pages,
        AdaptiveSpec(query="alpha beta", confidence_threshold=0.5, max_depth=4),
    ).digest(adaptive_url(0)).collect()
    assert [tuple(r) for r in hist] == [tuple(r) for r in want]
    stats = adaptive.coverage_stats()
    assert stats["confidence"] == pytest.approx(adaptive.confidence)
    assert stats["stop_reason"] in (
        "confidence", "max_pages", "no_links", "saturation", "max_depth",
    )

    # struct-shaped links (corpus pages) need a text column
    with pytest.raises(ValueError):
        AdaptiveCrawler(
            WebCrawler(spark, corpus.build_pages(spark, 20))
        ).digest(_url(1), "q")


SITEMAP = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.com/blog/p1</loc></url>
  <url><loc>https://a.com/blog/p2</loc></url>
  <url><loc>https://a.com/robots.txt</loc></url>
</urlset>"""


def test_url_seeder_pipeline(spark):
    from crawl4ai_spark.api import SeedingConfig, UrlSeeder

    sitemap_docs = spark.createDataFrame(
        [("https://a.com/sitemap.xml", SITEMAP)],
        "sitemap_url string, content string",
    )
    cc_index = spark.createDataFrame(
        [
            ("a.com", "https://a.com/blog/p2"),   # duplicate across sources
            ("a.com", "https://a.com/cc/only"),
            ("b.com", "https://b.com/x"),          # other domain, excluded
        ],
        "url_host_registered_domain string, url string",
    )
    heads = spark.createDataFrame(
        [
            ("https://a.com/blog/p1", "spark data spark pipelines"),
            ("https://a.com/blog/p2", "spark mentioned once"),
            ("https://a.com/cc/only", "nothing relevant here"),
        ],
        "url string, head_text string",
    )
    seeder = UrlSeeder(spark, sitemap_docs, cc_index, heads)

    # plain discovery: union + nonsense filter + dedupe
    plain = {r["url"] for r in seeder.urls("a.com").collect()}
    assert plain == {
        "https://a.com/blog/p1", "https://a.com/blog/p2",
        "https://a.com/cc/only",
    }  # robots.txt filtered, p2 deduped, b.com absent

    # nonsense filter off keeps robots.txt (reference flag)
    keep = seeder.urls("a.com", SeedingConfig(filter_nonsense_urls=False))
    assert "https://a.com/robots.txt" in {r["url"] for r in keep.collect()}

    # BM25 scoring: sorted desc, threshold drops the irrelevant url
    cfg = SeedingConfig(
        extract_head=True, query="spark data", score_threshold=0.01
    )
    scored = seeder.urls("a.com", cfg).collect()
    assert [r["url"] for r in scored] == [
        "https://a.com/blog/p1", "https://a.com/blog/p2",
    ]
    assert scored[0]["relevance_score"] >= scored[1]["relevance_score"]

    # pattern + cap; single-source configs
    pat = seeder.urls(
        "a.com", SeedingConfig(source="sitemap", pattern="*blog*")
    )
    assert {r["url"] for r in pat.collect()} == {
        "https://a.com/blog/p1", "https://a.com/blog/p2",
    }
    cc_only = seeder.urls("a.com", SeedingConfig(source="cc", max_urls=1))
    assert cc_only.count() == 1

    with pytest.raises(ValueError):
        seeder.urls("a.com", SeedingConfig(source="wayback"))
    with pytest.raises(ValueError):
        UrlSeeder(spark, sitemap_docs).urls(
            "a.com", SeedingConfig(source="cc")
        )
    # ADVICE r4: a typo'd token must raise, not silently run a subset
    # ("sitemp+cc" previously ran cc-only because of substring matching)
    with pytest.raises(ValueError, match="sitemp"):
        seeder.urls("a.com", SeedingConfig(source="sitemp+cc"))
    with pytest.raises(ValueError):
        seeder.urls("a.com", SeedingConfig(source=""))


def test_domain_mapper_facade(spark):
    from crawl4ai_spark.api import DomainMapper, DomainMapperConfig

    mpages = spark.createDataFrame(
        [("https://ex.com/",), ("https://ex.com/docs",)], "url string"
    )
    sitemap_seeds = spark.createDataFrame(
        [("https://ex.com/docs",), ("https://ex.com/sm-only",),
         ("https://ex.com/robots.txt",)],
        "url string",
    )
    cdx = spark.createDataFrame(
        [("https://ex.com/wb-only",)], "original string"
    )
    mapper = DomainMapper(
        spark, mpages, sitemap_seeds=sitemap_seeds, wayback_cdx=cdx
    )

    # default sources exclude wayback; probe mines the corpus root;
    # nonsense urls (robots.txt) filtered by default
    got = {r["url"]: r["source"] for r in
           mapper.scan("https://EX.com/").collect()}
    assert got["https://ex.com/docs"] == "sitemap"
    assert got["https://ex.com/"] == "probe"
    assert "https://ex.com/wb-only" not in got
    assert "https://ex.com/robots.txt" not in got

    # explicit wayback source includes it; nonsense kept when disabled
    got2 = {r["url"] for r in mapper.scan(
        "ex.com",
        DomainMapperConfig(source="sitemap+wayback",
                           filter_nonsense_urls=False),
    ).collect()}
    assert "https://ex.com/wb-only" in got2
    assert "https://ex.com/robots.txt" in got2

    # invalid source rejected with the reference's error shape
    with pytest.raises(ValueError, match="Invalid source"):
        mapper.scan("ex.com", DomainMapperConfig(source="sitemap+homepage"))

    # max_urls cap
    assert mapper.scan(
        "ex.com", DomainMapperConfig(max_urls=1)
    ).count() == 1


def test_deep_crawl_cache_write_gate(spark, pages):
    """The deep path honors the cache WRITE gate (reference caches each
    successfully processed page); default BYPASS writes nothing."""
    crawler = WebCrawler(spark, pages)
    deep = CrawlerRunConfig(deep_crawl_strategy=BFSDeepCrawlStrategy(max_depth=1))
    crawler.arun(_url(1), deep)                       # BYPASS default
    assert crawler.cache.count() == 0
    deep_en = CrawlerRunConfig(
        deep_crawl_strategy=BFSDeepCrawlStrategy(max_depth=1),
        cache_mode=CacheMode.ENABLED,
    )
    res = crawler.arun(_url(1), deep_en).collect()
    n_success = sum(1 for r in res if r["success"])
    assert crawler.cache.count() == n_success > 0


def test_cache_write_retries_through_stale_claim(spark, pages, tmp_path):
    """ADVICE r4 (medium): a crashed crawler's claimed-but-unpublished
    version used to make every later cache write raise CommitConflict;
    _cache_write now janitors the stale claim and retries."""
    import os
    import time

    cache_dir = str(tmp_path / "fetched")
    crawler = WebCrawler(spark, pages, cache_dir=cache_dir)
    crawler.arun(_url(1), CrawlerRunConfig(cache_mode=CacheMode.ENABLED))
    t = crawler._cache_table
    # simulate a crash: claim v2, never publish, and make it look old
    base = t.path / "v=2"
    base.mkdir()
    (base / "claim").touch()
    old = time.time() - 3600
    os.utime(base / "claim", (old, old))
    crawler.arun(_url(2), CrawlerRunConfig(cache_mode=CacheMode.ENABLED))
    assert t.current_version() == 2 and t.read().count() == 2
    # a NEW crawler opening the dir behind another stale claim also
    # recovers (open-time janitor)
    base3 = t.path / "v=3"
    base3.mkdir()
    (base3 / "claim").touch()
    os.utime(base3 / "claim", (old, old))
    crawler2 = WebCrawler(spark, pages, cache_dir=cache_dir)
    crawler2.arun(_url(3), CrawlerRunConfig(cache_mode=CacheMode.ENABLED))
    assert crawler2._cache_table.read().count() == 3


def test_durable_cache_is_versioned(spark, pages, tmp_path):
    cache_dir = str(tmp_path / "fetched")
    crawler = WebCrawler(spark, pages, cache_dir=cache_dir)
    crawler.arun(_url(1), CrawlerRunConfig(cache_mode=CacheMode.ENABLED))
    crawler.arun(_url(2), CrawlerRunConfig(cache_mode=CacheMode.ENABLED))
    t = crawler._cache_table
    assert t.current_version() == 2  # create + two MERGE commits
    assert t.read(1).count() == 1 and t.read(2).count() == 2
    # a new crawler over the same dir resumes the cache
    crawler2 = WebCrawler(spark, pages, cache_dir=cache_dir)
    r = crawler2.arun(_url(1), CrawlerRunConfig(cache_mode=CacheMode.ENABLED)).collect()
    assert r[0]["from_cache"]


def test_p7_facade_max_retries_surfaces_retry_count(spark, pages):
    """VERDICT-r4 #5: CrawlerRunConfig(max_retries=N) alone must turn
    on the per-URL requeue composition and surface retry_count —
    the reference call site CrawlerRunConfig(max_retries=...)
    (async_configs.py:1704) translated."""
    crawler = WebCrawler(spark, pages)
    cfg = CrawlerRunConfig(max_retries=2)
    spec = cfg.effective_politeness()
    assert spec is not None and spec.requeue and spec.max_retries == 2
    # politeness spec provided explicitly: max_retries folds in
    from crawl4ai_spark.operators.politeness import PolitenessSpec

    cfg2 = CrawlerRunConfig(
        politeness=PolitenessSpec(seed=7), max_retries=4
    )
    spec2 = cfg2.effective_politeness()
    assert spec2.requeue and spec2.max_retries == 4 and spec2.seed == 7
    # end-to-end: batch fetch through the requeue engine carries the
    # column (429/503 statuses in the corpus exercise the retry loop)
    urls = [_url(i) for i in range(1, 40) if i % 13 != 0]
    res = crawler.arun_many(urls, CrawlerRunConfig(max_retries=2))
    assert "retry_count" in res.columns
    rows = res.collect()
    assert all(
        r["retry_count"] is None or r["retry_count"] >= 0 for r in rows
    )


def test_p7_facade_proxy_rotation(spark, pages):
    """Reference call site CrawlerRunConfig(
    proxy_rotation_strategy=RoundRobinProxyStrategy(proxies))
    (async_configs.py:1605) — results carry a proxy struct; deep-path
    assignment is cycle-parity over emit_seq."""
    from crawl4ai_spark.api import RoundRobinProxyStrategy

    strat = RoundRobinProxyStrategy(
        ["10.0.0.1:8080:u:pw", "10.0.0.2:8080"]
    )
    assert [p.server for p in strat.proxies] == [
        "http://10.0.0.1:8080", "http://10.0.0.2:8080",
    ]
    crawler = WebCrawler(spark, pages)
    res = crawler.arun(
        _url(1),
        CrawlerRunConfig(
            deep_crawl_strategy=BFSDeepCrawlStrategy(max_depth=1),
            proxy_rotation_strategy=strat,
        ),
    )
    rows = sorted(res.collect(), key=lambda r: r["emit_seq"])
    assert len(rows) > 2
    for r in rows:
        want = strat.proxies[r["emit_seq"] % 2]
        assert r["proxy"]["server"] == want.server
        assert r["proxy"]["username"] == want.username
    # static proxy_config: constant struct on the flat batch path
    from crawl4ai_spark.api import ProxyConfig

    res2 = crawler.arun_many(
        [_url(1), _url(2)],
        CrawlerRunConfig(proxy_config=ProxyConfig(server="http://p:1")),
    ).collect()
    assert all(r["proxy"]["server"] == "http://p:1" for r in res2)
    # sticky session: every row gets the SAME pool member
    res3 = crawler.arun_many(
        [_url(1), _url(2), _url(4)],
        CrawlerRunConfig(
            proxy_rotation_strategy=strat, proxy_session_id="sess-9"
        ),
    ).collect()
    servers = {r["proxy"]["server"] for r in res3}
    assert len(servers) == 1 and servers <= {p.server for p in strat.proxies}
