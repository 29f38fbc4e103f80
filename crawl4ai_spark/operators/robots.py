"""Robots.txt gating as a broadcast rule table.

Reference: ``RobotsParser.can_fetch`` (utils.py:313-365, stdlib
RobotFileParser over a SQLite-cached robots.txt, TTL 7 days) checked
before fetch in ``arun`` (async_webcrawler.py:383-397); a blocked URL
yields CrawlResult(success=False, status_code=403) and is never
fetched.

Here the parsed rules are a driver-side spec compiled into a Column
predicate (rule tables are small — one row per domain —so they live in
the plan as literals / a broadcast map).  Semantics implemented: the
``User-agent: *`` Disallow prefix rules, allow-on-no-rule, longest
match irrelevant because we support Disallow only (the reference's
default crawl configuration exercises exactly this path).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawl4ai_spark.functions.filters import url_path
from crawl4ai_spark.functions.normalize import domain_of


@dataclass
class RobotsRules:
    """{domain: [disallow path prefixes]}"""

    disallow: dict[str, list[str]] = field(default_factory=dict)

    def blocked_column(self, url: Column) -> Column:
        dom = domain_of(url)
        path = url_path(url)
        verdict = F.lit(False)
        for domain, prefixes in self.disallow.items():
            dom_match = dom == domain.lower()
            any_prefix = F.lit(False)
            for p in prefixes:
                any_prefix = any_prefix | path.startswith(p)
            verdict = verdict | (dom_match & any_prefix)
        return verdict

    def is_blocked(self, url: str) -> bool:
        """Pure-Python mirror (oracle path)."""
        from urllib.parse import urlparse

        parsed = urlparse(url)
        dom = parsed.netloc.lower()
        for domain, prefixes in self.disallow.items():
            if dom == domain.lower() and any(
                parsed.path.startswith(p) for p in prefixes
            ):
                return True
        return False
