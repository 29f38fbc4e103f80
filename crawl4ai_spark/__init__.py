"""crawl4ai_spark — a from-scratch, PySpark-native URL-frontier + fetch
scheduler with the crawl semantics of unclecode/crawl4ai.

The reference (read-only at /root/reference) is a Python/asyncio crawler;
this package re-expresses *what* it computes as batch-iterative Spark
DataFrame programs:

- ``functions``  — URL canonicalization, scorers, filters as Column
  expressions / vectorized pandas UDFs (reference: crawl4ai/utils.py,
  deep_crawling/scorers.py, deep_crawling/filters.py).
- ``operators``  — the crawl engine (frontier rounds), URL-seen store
  (anti-join + bloom segments), politeness budgeting, window orderings
  (reference: deep_crawling/{bfs,dfs,bff}_strategy.py,
  async_dispatcher.py).
- ``sources``    — synthetic crawl corpus ("the web" as a table; fetch is
  a join), URL seeder, image payload table.
- ``plans``      — checkpoint/resume snapshots in the reference's state
  shapes (bfs_strategy.py:273-284 etc.).
- ``oracle``     — a pure-Python re-implementation of the reference's
  traversal loops used as the parity oracle in tests.
"""

__version__ = "0.1.0"

from crawl4ai_spark.session import get_spark  # noqa: F401

# Reference-shaped user surface (api.py) — imported lazily-safe: these
# pull only pyspark + package-internal modules.
from crawl4ai_spark.api import (  # noqa: F401
    AdaptiveConfig,
    AdaptiveCrawler,
    BestFirstCrawlingStrategy,
    BFSDeepCrawlStrategy,
    CacheMode,
    CrawlerRunConfig,
    DFSDeepCrawlStrategy,
    DomainMapper,
    DomainMapperConfig,
    SeedingConfig,
    UrlSeeder,
    WebCrawler,
)
