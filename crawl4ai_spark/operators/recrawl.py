"""TTL expiry + re-crawl — the composition the deletable cuckoo seen
store exists for (VERDICT-r3 #4).

Reference semantics being replicated:
- robots.txt entries expire after a 7-day TTL and are re-fetched
  (utils.py:252-275);
- CacheMode revalidation re-fetches stale cache entries
  (cache_context.py:59-87).

Spark mapping: the fetch log carries a ``fetched_at`` epoch column;
``stale_urls`` filters it against (now - ttl); ``expire_and_recrawl``
calls ``store.remove(stale)`` — deleting the fingerprints WITHOUT
rebuilding the filter, the capability bloom lacks — then re-runs the
crawl with the store injected (``CrawlSpec.seen_store``).  In the
re-crawl only the seed (start-recrawl quirk) and the expired pages
pass the seen anti-join; everything still fresh stays blocked, so the
re-crawl fetches exactly the stale set reachable through stale
ancestors.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec


def stale_urls(fetch_log: DataFrame, now_epoch: int, ttl_seconds: int) -> DataFrame:
    """urls whose ``fetched_at`` is older than the TTL at ``now``."""
    return fetch_log.filter(
        F.col("fetched_at") < F.lit(now_epoch - ttl_seconds)
    ).select("url")


def expire_and_recrawl(
    store,
    expired: DataFrame,
    pages: DataFrame,
    spec: CrawlSpec,
    seed: str,
) -> DataFrame:
    """Forget ``expired`` in ``store`` (any seen store with a
    ``remove(urls)`` method — CuckooSeenStore in practice) and re-run
    the crawl from ``seed`` with the mutated store injected; returns
    the re-crawl emissions."""
    store.remove(expired)
    spec2 = replace(spec, seen_store=store)
    return CrawlEngine(pages.sparkSession, pages, spec2).run(seed)
