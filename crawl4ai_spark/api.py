"""Reference-shaped user API — the switchover surface.

A user of the reference drives crawls through ``AsyncWebCrawler.arun /
arun_many`` with a ``CrawlerRunConfig`` holding a deep-crawl strategy
object (``async_webcrawler.py:169-171``, ``base_strategy.py:10-43``).
This module exposes the same nouns over the Spark engine so reference
call sites translate one-for-one:

    crawler = WebCrawler(spark, pages)                 # "the web" table
    df = crawler.arun(url, CrawlerRunConfig(
        deep_crawl_strategy=BFSDeepCrawlStrategy(max_depth=2),
        cache_mode=CacheMode.BYPASS,
    ))

Differences from the reference, by design (batch engine, not asyncio):

- ``arun`` returns the results **DataFrame** (url, depth, parent_url,
  score, status_code, success, …) instead of a ``CrawlResult``
  container — collect it or keep composing.
- ``stream=True`` has no async-generator analog; rounds already emit
  incrementally into the result (accepted and ignored).
- ``arun_many`` with a deep-crawl strategy runs ONE shared-frontier
  multi-seed crawl (the production shape) rather than the reference's
  sequential per-seed loop (``async_webcrawler.py:1026-1052``); single
  seeds match the reference loop exactly.
- On the deep path only the cache WRITE gate is observable: the fetch
  is already a join against the table the cache rows mirror, so
  ``should_read`` changes no values; successful pages are merged into
  the cache under ENABLED/WRITE_ONLY exactly as the reference caches
  each processed page.

Strategy constructors are field-for-field the reference's
(``bfs_strategy.py:25-43``, ``dfs_strategy.py``, ``bff_strategy.py:
36-50``); ``CacheMode`` is value-for-value ``cache_context.py:4-20``
with the read/write gates of ``CacheContext.should_read/should_write``
(``cache_context.py:59-87``) applied as DataFrame joins, and the
``config.cache_mode = None → ENABLED`` defaulting of
``async_webcrawler.py:261``.  With ``cache_dir`` set, the fetched
cache is a ``plans.table.VersionedTable`` — cache writes are MERGE
INTO commits, so the cache is durable, time-travelable state (the
"Iceberg fetched table IS the cache" design of SURVEY §1 S7).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from enum import Enum

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.functions.filters import FilterChain
from crawl4ai_spark.functions.proxies import ProxyConfig
from crawl4ai_spark.functions.scorers import Scorer
from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.operators.politeness import PolitenessSpec
from crawl4ai_spark.operators.robots import RobotsRules
from crawl4ai_spark.plans.table import VersionedTable


class CacheMode(Enum):
    """cache_context.py:4-20, value-for-value."""

    ENABLED = "enabled"
    DISABLED = "disabled"
    READ_ONLY = "read_only"
    WRITE_ONLY = "write_only"
    BYPASS = "bypass"


def _should_read(mode: CacheMode) -> bool:
    return mode in (CacheMode.ENABLED, CacheMode.READ_ONLY)


def _should_write(mode: CacheMode) -> bool:
    return mode in (CacheMode.ENABLED, CacheMode.WRITE_ONLY)


def _cacheable(url: Column) -> Column:
    """CacheContext.is_cacheable (cache_context.py:55)."""
    return (
        url.startswith("http://")
        | url.startswith("https://")
        | url.startswith("file://")
    )


@dataclass
class _DeepCrawlStrategy:
    """Shared constructor surface of the reference strategies
    (bfs_strategy.py:25-43 / bff_strategy.py:36-50)."""

    max_depth: int
    filter_chain: FilterChain = field(default_factory=FilterChain)
    url_scorer: Scorer | None = None
    include_external: bool = False
    score_threshold: float = -math.inf
    max_pages: float = math.inf
    resume_state: dict | None = None
    on_state_change: object = None
    should_cancel: object = None

    _strategy = "bfs"

    def to_spec(self, **overrides) -> CrawlSpec:
        return CrawlSpec(
            max_depth=self.max_depth,
            strategy=self._strategy,
            filter_chain=self.filter_chain,
            scorer=self.url_scorer,
            include_external=self.include_external,
            score_threshold=self.score_threshold,
            max_pages=self.max_pages,
            resume_state=self.resume_state,
            on_state_change=self.on_state_change,
            should_cancel=self.should_cancel,
            **overrides,
        )


class BFSDeepCrawlStrategy(_DeepCrawlStrategy):
    _strategy = "bfs"


class DFSDeepCrawlStrategy(_DeepCrawlStrategy):
    _strategy = "dfs"


class BestFirstCrawlingStrategy(_DeepCrawlStrategy):
    _strategy = "best_first"


class RoundRobinProxyStrategy:
    """Facade for the reference's ``RoundRobinProxyStrategy``
    (proxy_strategy.py:190-223): holds the proxy pool and deals
    assignments.  The driver-side ``itertools.cycle`` becomes the pure
    Column functions of functions/proxies.py — request order k → proxy
    k mod n, sticky sessions → salted-hash mod n — so the rotation
    distributes without a shared iterator.  Accepts ``ProxyConfig``
    objects or 'ip:port[:user:pass]' strings (from_string parity)."""

    def __init__(self, proxies=None):
        from crawl4ai_spark.functions.proxies import ProxyConfig

        self.proxies = [
            p if isinstance(p, ProxyConfig) else ProxyConfig.from_string(p)
            for p in (proxies or [])
        ]

    def column(self, order_col, session_col=None, epoch: int = 0):
        from crawl4ai_spark.functions.proxies import (
            round_robin_proxy,
            session_proxy,
        )

        if session_col is not None:
            return session_proxy(session_col, self.proxies, epoch=epoch)
        return round_robin_proxy(order_col, self.proxies)


class WebScrapingStrategy:
    """Facade for the reference's scraping strategies — both
    ``WebScrapingStrategy`` (BeautifulSoup) and
    ``LXMLWebScrapingStrategy`` produce the same links/media/metadata
    result (content_scraping_strategy.py); here ONE DOM-lite
    implementation (functions/scrape.py) serves both names.  Holds the
    option set (exclude_external_links, exclude_domains,
    exclude_social_media_links, image_score_threshold,
    exclude_external_images) forwarded to the scrape UDF."""

    def __init__(self, **options):
        self.options = dict(options)

    def scrap(self, url: str, html: str, **kwargs) -> dict:
        """Single-page ``ScrapingResult`` parity
        (content_scraping_strategy.py:93-95, models.ScrapingResult):
        {cleaned_html, success, media{images,videos,audios,tables},
        links{internal,external}, metadata} — the strategy's direct
        entry point, for reference call sites that scrape one page
        outside a crawl.  Batch work should use the Column surface
        (functions/scrape.with_scraped_page) instead."""
        from crawl4ai_spark.functions.scrape import (
            CLEAN_OPT_KEYS,
            py_cleaned_html,
            py_extract_metadata,
            py_scrape_links,
            py_scrape_media,
        )

        opts = {**self.options, **kwargs}
        links = py_scrape_links(
            url, html,
            exclude_external_links=opts.get("exclude_external_links", False),
            exclude_domains=opts.get("exclude_domains", frozenset()),
            exclude_social_media_links=opts.get(
                "exclude_social_media_links", False
            ),
            score_links=opts.get("score_links", False),
        )
        media = py_scrape_media(
            url, html,
            image_score_threshold=opts.get("image_score_threshold", 2),
            exclude_external_images=opts.get(
                "exclude_external_images", False
            ),
            exclude_domains=opts.get("exclude_domains", frozenset()),
            table_extraction=opts.get("table_extraction"),
        )
        return {
            "cleaned_html": py_cleaned_html(
                url, html,
                **{k: v for k, v in opts.items() if k in CLEAN_OPT_KEYS},
            ),
            "success": True,
            "media": media,
            "links": {
                "internal": [
                    l for l in links if not l["is_external"]
                ],
                "external": [l for l in links if l["is_external"]],
            },
            "metadata": py_extract_metadata(html),
        }


# ctor-name parity for reference call sites; same implementation
LXMLWebScrapingStrategy = WebScrapingStrategy


@dataclass
class CrawlerRunConfig:
    """The crawl-tier subset of the reference's CrawlerRunConfig
    (async_configs.py): strategy, cache mode, robots gate, politeness,
    retries, proxy rotation.  Browser/scraping/extraction knobs are
    content-tier, out of scope."""

    deep_crawl_strategy: _DeepCrawlStrategy | None = None
    cache_mode: CacheMode | None = CacheMode.BYPASS  # async_configs default
    check_robots_txt: bool = False
    stream: bool = False  # accepted; rounds already emit incrementally
    politeness: PolitenessSpec | None = None
    # arun_many rate-limiter wiring (async_webcrawler.py:1054-1066:
    # RateLimiter(base_delay=(mean_delay, mean_delay + max_range),
    # max_delay=60, max_retries=3)).  Opt-in here because the
    # politeness rounds change emission batching; the reference applies
    # it to NON-deep arun_many batches only (deep crawls bypass the
    # dispatcher, :1026-1052) and so does this facade.
    enable_rate_limiting: bool = False
    mean_delay: float = 0.1   # async_configs.py:1634
    max_range: float = 0.3    # async_configs.py:1635
    # P7 wiring (VERDICT-r4 #5).  max_retries (async_configs.py:1704,
    # default 0) turns on the engine's per-URL requeue composition
    # (PolitenessSpec.requeue) with that retry budget; results then
    # carry retry_count.  proxy_rotation_strategy
    # (async_configs.py:1605) / proxy_config assign a ``proxy`` struct
    # column to every result row — data, not connections: the fetch
    # layer reads it when issuing requests.
    max_retries: int = 0
    proxy_rotation_strategy: RoundRobinProxyStrategy | None = None
    proxy_config: "ProxyConfig | None" = None
    proxy_session_id: str | None = None
    # content tier (r5, html-backed corpora only): the reference runs
    # scraping on every arun and markdown via markdown_generator
    # (async_webcrawler.py:821-949).  Here both are opt-in columns —
    # ``scraping_strategy`` attaches the ``scraped`` struct
    # (links/media/metadata), ``markdown_generator`` the ``markdown``
    # struct (raw/citations/references/fit) — joined back by url, so
    # the page bytes never ride the crawl shuffle.
    scraping_strategy: WebScrapingStrategy | None = None
    markdown_generator: object | None = None

    def effective_politeness(self) -> PolitenessSpec | None:
        if self.politeness is not None:
            spec = self.politeness
            if self.max_retries > 0 and not spec.requeue:
                spec = replace(
                    spec, requeue=True, max_retries=self.max_retries
                )
            return spec
        if self.enable_rate_limiting or self.max_retries > 0:
            return PolitenessSpec(
                base_lo=self.mean_delay,
                base_hi=self.mean_delay + self.max_range,
                max_delay=60.0,
                max_retries=(
                    self.max_retries if self.max_retries > 0 else 3
                ),
                requeue=self.max_retries > 0,
            )
        return None

    def proxy_column(self, order_col):
        """The ``proxy`` struct for a result row, or None when no proxy
        machinery is configured.  Precedence mirrors the reference:
        a rotation strategy over a static proxy_config
        (async_webcrawler.py picks rotation when both are set)."""
        if self.proxy_rotation_strategy is not None:
            if self.proxy_session_id is not None:
                return self.proxy_rotation_strategy.column(
                    order_col, session_col=F.lit(self.proxy_session_id)
                )
            return self.proxy_rotation_strategy.column(order_col)
        if self.proxy_config is not None:
            p = self.proxy_config
            return F.struct(
                F.lit(p.server).alias("server"),
                F.lit(p.username).cast("string").alias("username"),
                F.lit(p.password).cast("string").alias("password"),
                F.lit(p.ip).cast("string").alias("ip"),
            )
        return None


FETCH_RESULT_COLS = ["url", "success", "status_code", "from_cache"]


VALID_MAPPER_SOURCES = {
    "sitemap", "cc", "wayback", "crt", "probe", "robots", "feed",
}  # domain_mapper.py:83 minus "homepage" (browser-only, content-tier)


@dataclass
class DomainMapperConfig:
    """Crawl-tier subset of the reference DomainMapperConfig
    (async_configs.py:2434-2465); live-HTTP knobs (concurrency,
    hits_per_sec, timeouts, soft-404 detection) have no table analog."""

    source: str = "sitemap+cc+crt+probe"  # reference default
    max_urls: int = -1
    filter_nonsense_urls: bool = True
    query: str | None = None
    score_threshold: float | None = None
    scoring_method: str = "bm25"


class DomainMapper:
    """``DomainMapper.scan(domain, config)`` analog
    (domain_mapper.py:122,206-303): multi-source URL discovery —
    host discovery (crt/wayback/cc) then per-source URL mining with
    first-source-wins dedupe — over the table-backed sources
    (sources/domain_mapper.py).  Returns (url, host, source) plus
    ``relevance_score`` when BM25 scoring is configured."""

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        sitemap_seeds: DataFrame | None = None,
        cc_index: DataFrame | None = None,
        wayback_cdx: DataFrame | None = None,
        ct_entries: DataFrame | None = None,
        robots_docs: DataFrame | None = None,
        homepages: DataFrame | None = None,
        heads: DataFrame | None = None,
    ):
        self.spark = spark
        self.pages = pages
        self.sitemap_seeds = sitemap_seeds
        self.cc_index = cc_index
        self.wayback_cdx = wayback_cdx
        self.ct_entries = ct_entries
        self.robots_docs = robots_docs
        self.homepages = homepages
        self.heads = heads

    def scan(
        self, domain: str, config: DomainMapperConfig | None = None
    ) -> DataFrame:
        import re as _re

        from crawl4ai_spark.sources.domain_mapper import map_domain
        from crawl4ai_spark.sources.seeder import corpus_bm25, is_nonsense_url

        cfg = config or DomainMapperConfig()
        sources = {s.strip().lower() for s in cfg.source.split("+") if s.strip()}
        invalid = sources - VALID_MAPPER_SOURCES
        if invalid:  # domain_mapper.py:233-235
            raise ValueError(
                f"Invalid source(s): {invalid}. Valid: {VALID_MAPPER_SOURCES}"
            )
        base_domain = _re.sub(r"^https?://", "", domain).strip("/").lower()
        # crt/robots are host-discovery / probe-path sources: their
        # yield surfaces as probed URLs (reference phase 2 scans every
        # discovered host, domain_mapper.py:259-303), so selecting
        # either implies the probe phase
        probe_on = bool({"probe", "crt", "robots"} & sources)
        out = map_domain(
            base_domain,
            self.pages,
            sitemap_seeds=self.sitemap_seeds if "sitemap" in sources else None,
            cc_index=self.cc_index if "cc" in sources else None,
            wayback_cdx=self.wayback_cdx if "wayback" in sources else None,
            ct_entries=self.ct_entries if "crt" in sources else None,
            robots_docs=self.robots_docs if "robots" in sources else None,
            homepages=self.homepages if "feed" in sources else None,
            probe=probe_on,
        )
        if cfg.filter_nonsense_urls:
            out = out.filter(~is_nonsense_url(F.col("url")))
        if cfg.query and cfg.scoring_method == "bm25":
            if self.heads is None:
                raise ValueError(
                    "BM25 scoring needs a heads corpus (url, head_text) — "
                    "the head-extraction analog of extract_head"
                )
            rel = corpus_bm25(
                self.heads, cfg.query, text_col="head_text", key_col="url"
            ).select("url", "relevance_score")
            out = out.join(rel, "url", "left")
            if cfg.score_threshold is not None:
                out = out.filter(F.col("relevance_score") >= cfg.score_threshold)
            out = out.orderBy(F.desc("relevance_score"), F.asc("url"))
        if cfg.max_urls > 0:
            out = out.limit(cfg.max_urls)
        return out


@dataclass
class AdaptiveConfig:
    """The statistical-strategy subset of the reference AdaptiveConfig
    (adaptive_crawler.py:154-168); embedding/LLM strategy knobs are
    covered by functions/adaptive_embedding.py, and the confidence
    weights are fixed at the reference's 0.4/0.3/0.3
    (adaptive_crawler.py:309-326)."""

    confidence_threshold: float = 0.7
    max_depth: int = 5
    max_pages: int = 20
    top_k_links: int = 3
    min_gain_threshold: float = 0.1
    saturation_threshold: float = 0.8


class AdaptiveCrawler:
    """Reference entry point ``AdaptiveCrawler(crawler, config)`` +
    ``digest(start_url, query)`` (adaptive_crawler.py:1292-1446) over
    the composed Spark loop (operators/adaptive_crawl.py).  Returns
    the per-round confidence stream DataFrame; ``confidence`` /
    ``coverage_stats`` mirror the reference's post-digest accessors."""

    def __init__(self, crawler: WebCrawler, config: AdaptiveConfig | None = None):
        self.crawler = crawler
        self.config = config or AdaptiveConfig()
        self._history: DataFrame | None = None

    def digest(self, start_url: str, query: str) -> DataFrame:
        from crawl4ai_spark.operators.adaptive_crawl import (
            AdaptiveCrawler as _Engine,
            AdaptiveSpec,
        )

        cfg = self.config
        spec = AdaptiveSpec(
            query=query,
            confidence_threshold=cfg.confidence_threshold,
            max_depth=cfg.max_depth,
            max_pages=cfg.max_pages,
            top_k_links=cfg.top_k_links,
            min_gain_threshold=cfg.min_gain_threshold,
            saturation_threshold=cfg.saturation_threshold,
        )
        pages = self.crawler.pages
        if "text" not in pages.columns:
            raise ValueError(
                "adaptive digest needs a 'text' column on the pages "
                "table (the KB is built from page text)"
            )
        if "href" in _links_element_fields(pages):
            # corpus-shaped links (array<struct<href,...>>) → plain urls
            pages = pages.withColumn(
                "links", F.transform(F.col("links"), lambda l: l.getField("href"))
            )
        self._history = _Engine(self.crawler.spark, pages, spec).digest(start_url)
        return self._history

    @property
    def confidence(self) -> float:
        """Final confidence (reference ``adaptive.confidence``)."""
        if self._history is None:
            raise RuntimeError("digest() has not run")
        rows = self._history.orderBy(F.desc("round")).limit(1).collect()
        return float(rows[0]["confidence"]) if rows else 0.0

    def coverage_stats(self) -> dict:
        """Final-round stats dict (reference print_stats data)."""
        if self._history is None:
            raise RuntimeError("digest() has not run")
        rows = self._history.orderBy(F.desc("round")).limit(1).collect()
        if not rows:
            return {}
        r = rows[0]
        return {
            "pages_crawled": r["n_kb"],
            "coverage": r["coverage"],
            "consistency": r["consistency"],
            "saturation": r["saturation"],
            "confidence": r["confidence"],
            "stop_reason": r["stop_reason"],
        }


def _links_element_fields(pages: DataFrame) -> list[str]:
    """Field names of the links array element, [] for plain strings."""
    from pyspark.sql import types as T

    f = pages.schema["links"].dataType
    if isinstance(f, T.ArrayType) and isinstance(f.elementType, T.StructType):
        return [sf.name for sf in f.elementType.fields]
    return []


@dataclass
class SeedingConfig:
    """The crawl-tier subset of the reference SeedingConfig
    (async_configs.py:2339-2362).  ``live_check``/``concurrency``/
    ``hits_per_sec`` govern live HTTP in the reference; here discovery
    reads tables, so they have no analog (Spark parallelism + the
    politeness layer cover them)."""

    source: str = "sitemap+cc"
    pattern: str | None = "*"
    extract_head: bool = False
    max_urls: int = -1  # -1 = no limit (reference convention)
    query: str | None = None
    score_threshold: float | None = None
    scoring_method: str = "bm25"
    filter_nonsense_urls: bool = True


class UrlSeeder:
    """``AsyncUrlSeeder`` analog (async_url_seeder.py:364-555): the
    discovery sources are tables — a sitemap corpus
    ``(sitemap_url, content)``, a Common Crawl columnar index, and an
    optional head-metadata corpus ``(url, head_text)`` for BM25
    relevance (the head-extraction analog, fetch-as-join).

    ``urls(domain, config)`` = union sources → nonsense filter → glob
    pattern → dedupe → [BM25 score + threshold + sort] → max_urls cap,
    exactly the reference pipeline order (dedupe :447-462, scoring
    :540-548, cap :489-508)."""

    def __init__(
        self,
        spark: SparkSession,
        sitemap_docs: DataFrame | None = None,
        cc_index: DataFrame | None = None,
        heads: DataFrame | None = None,
    ):
        self.spark = spark
        self.sitemap_docs = sitemap_docs
        self.cc_index = cc_index
        self.heads = heads

    def urls(
        self, domain: str | list[str], config: SeedingConfig | None = None
    ) -> DataFrame:
        from crawl4ai_spark.sources.seeder import corpus_bm25, seed_pipeline
        from crawl4ai_spark.sources.sitemap import (
            cc_index_seeds,
            seed_from_sitemaps,
        )

        cfg = config or SeedingConfig()
        domains = [domain] if isinstance(domain, str) else list(domain)
        # validate the '+'-joined source tokens against the known set,
        # like DomainMapper.scan — a typo ("sitemp+cc") must raise, not
        # silently run a subset of the requested sources
        tokens = [t for t in cfg.source.split("+") if t]
        unknown = sorted(set(tokens) - {"sitemap", "cc"})
        if unknown or not tokens:
            raise ValueError(
                f"unknown seeding source tokens {unknown!r} in "
                f"{cfg.source!r}: expected '+'-joined subset of "
                "{'sitemap', 'cc'}"
            )
        srcs: list[DataFrame] = []
        if "sitemap" in tokens:
            if self.sitemap_docs is None:
                raise ValueError("source includes 'sitemap' but no sitemap_docs")
            ddf = self.spark.createDataFrame(
                [(d,) for d in domains], "domain string"
            )
            srcs.append(
                seed_from_sitemaps(ddf, self.sitemap_docs).select("url")
            )
        if "cc" in tokens:
            if self.cc_index is None:
                raise ValueError("source includes 'cc' but no cc_index")
            for d in domains:
                srcs.append(cc_index_seeds(self.cc_index, d).select("url"))

        relevance = None
        threshold = None
        if cfg.query and cfg.extract_head and cfg.scoring_method == "bm25":
            if self.heads is None:
                raise ValueError(
                    "BM25 scoring needs a heads corpus (url, head_text) — "
                    "the head-extraction analog of extract_head=True"
                )
            relevance = corpus_bm25(
                self.heads, cfg.query, text_col="head_text", key_col="url"
            ).select("url", "relevance_score")
            threshold = cfg.score_threshold
        return seed_pipeline(
            srcs,
            max_urls=cfg.max_urls if cfg.max_urls > 0 else None,
            pattern=cfg.pattern,
            relevance=relevance,
            filter_nonsense=cfg.filter_nonsense_urls,
            score_threshold=threshold,
        )


class WebCrawler:
    """``AsyncWebCrawler`` analog: holds "the web" (a pages DataFrame —
    fetch is a join, S1/S2) plus the fetched-cache and robots state the
    reference keeps in SQLite."""

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: RobotsRules | None = None,
        cache_dir: str | None = None,
        scrape_mode: str = "fast",
    ):
        self.spark = spark
        self._html: DataFrame | None = None
        if "links" not in pages.columns and "html" in pages.columns:
            # html-backed "web": build the fetch-shaped links FROM the
            # html (functions/scrape.scraped_pages) and keep the raw
            # html aside for the content tier (scraping_strategy /
            # markdown_generator result columns)
            from crawl4ai_spark.functions.scrape import scraped_pages

            self._html = pages.select("url", "html")
            pages = scraped_pages(pages, mode=scrape_mode)
        self.pages = pages
        self.robots = robots
        self._cache_table: VersionedTable | None = None
        if cache_dir is not None:
            t = VersionedTable(spark, cache_dir)
            if t.current_version() is None:
                empty = spark.createDataFrame(
                    [], "url string, success boolean, status_code int"
                )
                t = VersionedTable.create(spark, cache_dir, empty, key=["url"])
            else:
                # open-time janitor: a crawl that crashed mid-commit left
                # a claimed-but-manifestless head+1 dir; clear it (once
                # stale) so this crawler's first cache write isn't doomed
                t.remove_stale_claim(
                    t.current_version() + 1,
                    stale_after_sec=self._STALE_CLAIM_SEC,
                )
            self._cache_table = t
        else:
            self._cache: DataFrame = spark.createDataFrame(
                [], "url string, success boolean, status_code int"
            )

    # -- cache state ---------------------------------------------------------

    @property
    def cache(self) -> DataFrame:
        if self._cache_table is not None:
            return self._cache_table.read()
        return self._cache

    def _cache_write(self, rows: DataFrame) -> None:
        """acache_url analog (async_database.py:478): upsert fetched
        rows by url PK.  Durable path = MERGE INTO commit, retried on
        ``CommitConflict`` as table.py prescribes: another crawler
        sharing this cache_dir may have published first (re-merge on the
        new head), or a crashed writer may have left a claimed-but-
        unpublished version (janitored via ``remove_stale_claim``)."""
        rows = rows.select("url", "success", "status_code")
        if self._cache_table is not None:
            if not rows.isEmpty():  # don't commit empty MERGE versions
                self._merge_with_retry(rows)
        else:
            self._cache = (
                self._cache.join(rows, "url", "left_anti")
                .unionByName(rows)
                .localCheckpoint(eager=True)
            )

    _MERGE_RETRIES = 5
    _STALE_CLAIM_SEC = 60.0

    def _merge_with_retry(self, rows: DataFrame) -> None:
        import time as _time

        from crawl4ai_spark.plans.table import CommitConflict

        last: CommitConflict | None = None
        for attempt in range(self._MERGE_RETRIES):
            try:
                self._cache_table.merge(rows)
                return
            except CommitConflict as exc:
                last = exc
                # merge() re-reads the head on retry, which absorbs a
                # competing *published* commit by itself; the case that
                # needs help is a claimed-but-manifestless version from
                # a crashed writer blocking head+1 forever.
                head = self._cache_table.current_version()
                blocking = 0 if head is None else head + 1
                if not self._cache_table.remove_stale_claim(
                    blocking, stale_after_sec=self._STALE_CLAIM_SEC
                ):
                    # fresh claim — a live writer is staging; back off
                    _time.sleep(0.1 * (attempt + 1))
        raise last

    # -- entry points --------------------------------------------------------

    def arun(self, url: str, config: CrawlerRunConfig | None = None) -> DataFrame:
        """Single-URL entry (async_webcrawler.py:arun): deep crawl when
        a strategy is configured (the DeepCrawlDecorator divert,
        base_strategy.py:10-43), else one cached/robots-gated fetch."""
        return self.arun_many([url], config)

    def arun_many(
        self, urls: list[str], config: CrawlerRunConfig | None = None
    ) -> DataFrame:
        """Batch entry (async_webcrawler.py:arun_many).

        Contract divergence from the reference: the result has ONE ROW
        PER UNIQUE URL (the batch is ``dropDuplicates``-ed before the
        fetch join), not one CrawlResult per input list element — join
        your own table against the result on ``url`` instead of zipping
        it positionally against the input list.  A set-semantics batch
        is the natural DataFrame shape; preserving input multiplicity
        would force an input-index column through every downstream
        join for no information gain (duplicate inputs fetch once
        either way, per the cache)."""
        if not urls:
            raise ValueError("arun_many needs at least one url")
        config = config or CrawlerRunConfig()
        if config.deep_crawl_strategy is not None:
            # effective_politeness folds max_retries into the requeue
            # spec (P7), so CrawlerRunConfig(max_retries=N) alone turns
            # on per-URL retries and surfaces retry_count in results
            spec = config.deep_crawl_strategy.to_spec(
                politeness=config.effective_politeness(),
                robots=self.robots if config.check_robots_txt else None,
            )
            engine = CrawlEngine(self.spark, self.pages, spec)
            res = engine.run(urls[0] if len(urls) == 1 else urls)
            pc = config.proxy_column(F.col("emit_seq"))
            if pc is not None:
                res = res.withColumn("proxy", pc)
            res = self._attach_content(res, config)
            # cache WRITE gate on the deep path (the reference caches
            # each successfully processed page, async_webcrawler.py:
            # 671-672).  Cache READS are a semantic no-op here: the
            # fetch is already a join against the same table the cache
            # rows mirror, so should_read changes no values — only the
            # write side is observable (and durable with cache_dir).
            mode = (
                config.cache_mode
                if config.cache_mode is not None
                else CacheMode.ENABLED
            )
            if _should_write(mode):
                self._cache_write(
                    res.filter(
                        F.col("success") & _cacheable(F.col("url"))
                    ).select("url", "success", "status_code")
                )
            return res
        return self._fetch_batch(urls, config)

    def _attach_content(
        self, res: DataFrame, config: CrawlerRunConfig
    ) -> DataFrame:
        """Content tier over crawl results (html-backed corpora): the
        reference scrapes every fetched page and renders markdown
        (async_webcrawler.py:821-949); here each is one Arrow pass over
        the result's pages — bytes joined back by url AFTER the crawl,
        never riding the frontier shuffle (the image_crawl posture)."""
        if self._html is None or (
            config.scraping_strategy is None
            and config.markdown_generator is None
        ):
            if self._html is None and (
                config.scraping_strategy is not None
                or config.markdown_generator is not None
            ):
                raise ValueError(
                    "scraping_strategy/markdown_generator need an "
                    "html-backed corpus (pages with an 'html' column)"
                )
            return res
        out = res.join(self._html, "url", "left")
        if config.scraping_strategy is not None:
            from crawl4ai_spark.functions.scrape import (
                CLEAN_OPT_KEYS,
                cleaned_html_udf,
                with_scraped_page,
            )

            opts = config.scraping_strategy.options
            out = with_scraped_page(out, **opts)
            # ScrapingResult.cleaned_html (the _scrap cleaning
            # pipeline) rides along, honoring the cleaning-tier options
            out = out.withColumn(
                "cleaned_html",
                cleaned_html_udf(
                    **{k: v for k, v in opts.items() if k in CLEAN_OPT_KEYS}
                )(F.col("url"), F.col("html")),
            )
        if config.markdown_generator is not None:
            from crawl4ai_spark.functions.markdown import markdown_udf

            gen = config.markdown_generator
            out = out.withColumn(
                "markdown",
                markdown_udf(
                    citations=True,
                    content_filter=getattr(gen, "content_filter", None),
                    content_source=getattr(
                        gen, "content_source", "cleaned_html"
                    ),
                )(F.col("url"), F.col("html")),
            )
        return out.drop("html")

    # -- the single-fetch pipeline (arun without a strategy) -----------------

    def _fetch_batch(
        self, urls: list[str], config: CrawlerRunConfig
    ) -> DataFrame:
        # None → ENABLED (async_webcrawler.py:261)
        mode = config.cache_mode if config.cache_mode is not None else CacheMode.ENABLED
        seeds = self.spark.createDataFrame(
            [(u,) for u in urls], "url string"
        ).dropDuplicates(["url"])

        # cache read gate (cache_context.py:59-72) runs BEFORE the
        # robots gate, as in the reference (cache read
        # async_webcrawler.py:260-348; robots checked only before a
        # live fetch, :383-397) — a cached row is served even when
        # robots would block the fetch
        if _should_read(mode):
            gated = seeds.withColumn("__c", _cacheable(F.col("url")))
            hits = (
                gated.filter("__c")
                .drop("__c")
                .join(self.cache, "url", "inner")
                .select(
                    "url", "success", "status_code",
                    F.lit(True).alias("from_cache"),
                )
            )
            misses = gated.drop("__c").join(
                hits.select("url"), "url", "left_anti"
            )
        else:
            hits = None
            misses = seeds

        # robots gate on the fetch path (async_webcrawler.py:383-397):
        # blocked rows emit 403 and are never fetched or cached
        blocked = None
        if config.check_robots_txt and self.robots is not None:
            is_blocked = self.robots.blocked_column(F.col("url"))
            blocked = misses.filter(is_blocked).select(
                "url",
                F.lit(False).alias("success"),
                F.lit(403).alias("status_code"),
                F.lit(False).alias("from_cache"),
            )
            misses = misses.filter(~is_blocked)

        # live fetch = corpus join (S1/S2); unknown urls fail like a
        # dead fetch.  With rate limiting on, the fetch runs through
        # the politeness engine (max_depth=0 rounds = the dispatcher's
        # per-domain budget loop) instead of one flat join.
        polite = config.effective_politeness()
        if polite is not None:
            eng = CrawlEngine(
                self.spark,
                self.pages,
                CrawlSpec(max_depth=0, strategy="bfs", politeness=polite),
            )
            # corpus-known urls only: the dead anti-join below stays the
            # single source of unknown-url failure rows on both paths
            known = misses.join(self.pages.select("url"), "url", "left_semi")
            raw = eng.run(known)
            # surface the accumulated retry_count when the requeue path
            # ran (max_retries > 0 — async_configs.py:1704 semantics)
            extra = (
                [F.col("retry_count")]
                if "retry_count" in raw.columns and config.max_retries > 0
                else []
            )
            emitted = raw.select(
                "url", "success", "status_code",
                F.lit(False).alias("from_cache"), *extra,
            )
            # urls whose domain retired mid-batch are dropped by the
            # engine's long-standing retired-domain semantics; the
            # reference instead returns the rate-limited response past
            # max_retries (async_dispatcher.py:75-85), so emit them
            # terminally with their page status and success=False —
            # one result row per input url, like the flat path
            dropped = (
                known.join(emitted.select("url"), "url", "left_anti")
                .join(self.pages.select("url", "status_code"), "url")
                .select(
                    "url",
                    F.lit(False).alias("success"),
                    "status_code",
                    F.lit(False).alias("from_cache"),
                )
            )
            live = emitted.unionByName(dropped, allowMissingColumns=True)
        else:
            live = misses.join(
                self.pages.select("url", "success", "status_code"),
                "url", "inner",
            ).select(
                "url", "success", "status_code",
                F.lit(False).alias("from_cache"),
            )
        dead = misses.join(self.pages.select("url"), "url", "left_anti").select(
            "url",
            F.lit(False).alias("success"),
            F.lit(None).cast("int").alias("status_code"),
            F.lit(False).alias("from_cache"),
        )

        # cache write gate (cache_context.py:74-87): successful,
        # cacheable live fetches only (acache_url is called after a
        # successful crawl, async_webcrawler.py:671-672)
        if _should_write(mode):
            self._cache_write(
                live.filter(F.col("success") & _cacheable(F.col("url")))
            )

        out = live.unionByName(dead, allowMissingColumns=True)
        if hits is not None:
            out = hits.unionByName(out, allowMissingColumns=True)
        if blocked is not None:
            out = blocked.unionByName(out, allowMissingColumns=True)
        cols = list(FETCH_RESULT_COLS)
        if "retry_count" in out.columns:
            # null for cache hits / robots blocks / dead urls — only
            # live politeness-path fetches carry a real count
            cols.append("retry_count")
        out = out.select(*cols)
        # static batches have no request order, so the rotation is the
        # stateless url-hash assignment (a documented divergence from
        # the reference's dispatch-order cycle — same pool, same
        # determinism, no shared iterator)
        pc = config.proxy_column(F.abs(F.xxhash64(F.col("url"))))
        if pc is not None:
            out = out.withColumn("proxy", pc)
        return self._attach_content(out, config)
