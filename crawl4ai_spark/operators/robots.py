"""Robots.txt gating: full-parity rules table + Column fast path.

Reference: ``RobotsParser.can_fetch`` (utils.py:313-365) parses the
cached robots.txt with stdlib ``RobotFileParser`` (Allow + Disallow,
FIRST applicable rule in file order — verified stdlib behavior), over a
SQLite cache keyed by domain with a 7-day TTL (utils.py:252-275);
missing/stale/unfetchable rules ⇒ allow.  Checked before fetch in
``arun`` (async_webcrawler.py:383-397); a blocked URL yields
CrawlResult(success=False, status_code=403) and is never fetched.

Two implementations here:

- ``RobotsTable`` — exact parity at scale: a (domain, rules_text,
  fetch_time) DataFrame joined to the frontier on domain (broadcast
  when small, shuffle on the shared domain key otherwise) + an
  Arrow-vectorized UDF that runs the SAME stdlib parser the reference
  runs, memoized per distinct rules text within each batch.
- ``RobotsRules`` — Disallow-prefix-only Column predicate (zero Python
  crossings) for the engine's hot gate when rules fit that shape (the
  reference's default crawl configuration exercises exactly this path).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def can_fetch_udf(user_agent: str = "*"):
    """Arrow-vectorized stdlib-parser verdict over (url, rules_text).

    Runs the EXACT parser the reference runs (utils.py:359-365:
    ``RobotFileParser.parse(rules.splitlines())``, unparseable/absent ⇒
    allow), so Allow/Disallow precedence, agent-group selection, and
    path-quoting quirks are inherited rather than re-implemented.
    Parsers are memoized per distinct rules text within each Arrow
    batch — a frontier has few distinct domains per batch relative to
    rows, so parsing cost is amortized."""

    @F.pandas_udf(T.BooleanType())
    def _udf(url: pd.Series, rules_text: pd.Series) -> pd.Series:
        from urllib.robotparser import RobotFileParser

        cache: dict[str, RobotFileParser | None] = {}
        out = []
        for u, txt in zip(url, rules_text):
            if txt is None or not str(txt).strip():
                out.append(True)  # no/stale rules ⇒ allow (utils.py:344-357)
                continue
            txt = str(txt)
            if txt not in cache:
                p = RobotFileParser()
                p.parse(txt.splitlines())
                cache[txt] = p if p.mtime() else None
            p = cache[txt]
            out.append(True if p is None else bool(p.can_fetch(user_agent, u)))
        return pd.Series(out, dtype=object)

    return _udf


class RobotsTable:
    """(domain, rules_text, fetch_time) rules table with the reference's
    7-day TTL (utils.py:268-275): stale rows behave as absent (allow) —
    on a live deployment a refresh job re-joins the robots corpus to
    replace them, exactly like the reference's refetch."""

    DEFAULT_TTL = 7 * 24 * 3600  # utils.py:255

    SCHEMA = T.StructType(
        [
            T.StructField("domain", T.StringType()),
            T.StructField("rules_text", T.StringType()),
            T.StructField("fetch_time", T.LongType()),
        ]
    )

    def __init__(self, df: DataFrame, ttl: int = DEFAULT_TTL):
        self.df = df
        self.ttl = ttl

    @classmethod
    def from_texts(
        cls,
        spark: SparkSession,
        texts: dict[str, str],
        fetch_time: int,
        ttl: int = DEFAULT_TTL,
    ) -> "RobotsTable":
        df = spark.createDataFrame(
            [(d.lower(), t, int(fetch_time)) for d, t in texts.items()],
            cls.SCHEMA,
        )
        return cls(df, ttl=ttl)

    def with_can_fetch(
        self,
        urls: DataFrame,
        now: int,
        user_agent: str = "*",
        url_col: str = "url",
        out_col: str = "allowed",
    ) -> DataFrame:
        """urls + boolean ``allowed`` column.

        Left join on domain — the optimizer broadcasts a small rules
        table; at 10^7+ domains both sides shuffle on the shared domain
        key (the same key the politeness state joins on, so the
        exchanges line up across the round)."""
        dom = domain_of(F.col(url_col))
        rules = self.df.select(
            F.col("domain").alias("__rdom"), "rules_text", "fetch_time"
        )
        joined = urls.withColumn("__rdom", dom).join(rules, "__rdom", "left")
        fresh_text = F.when(
            (F.lit(int(now)) - F.col("fetch_time")) < F.lit(self.ttl),
            F.col("rules_text"),
        )
        return (
            joined.withColumn(
                out_col, can_fetch_udf(user_agent)(F.col(url_col), fresh_text)
            )
            .drop("__rdom", "rules_text", "fetch_time")
        )
