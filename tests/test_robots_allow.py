"""S8 robots parity: Allow+Disallow with stdlib-RobotFileParser
semantics (first applicable rule in file order — verified behavior of
the parser the reference calls at utils.py:359-365), plus the 7-day
TTL table semantics (utils.py:252-275: stale/missing rules ⇒ allow)."""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.robots import RobotsTable, RobotsRules

RULES_A = """User-agent: *
Disallow: /private/
Allow: /private/public
Disallow: /tmp
Allow: /
"""

RULES_B = """User-agent: googlebot
Disallow: /

User-agent: *
Disallow: /admin
Allow: /admin/help
"""

URLS = [
    "https://a.com/private/x",
    "https://a.com/private/public/ok",
    "https://a.com/tmp2",
    "https://a.com/ok",
    "https://b.com/admin/panel",
    "https://b.com/admin/help",
    "https://b.com/open",
    "https://c.com/anything",  # no rules for c.com → allow
]


def _oracle(rules_by_domain, url, agent="*"):
    from urllib.parse import urlparse

    dom = urlparse(url).netloc.lower()
    txt = rules_by_domain.get(dom)
    if not txt:
        return True
    p = RobotFileParser()
    p.parse(txt.splitlines())
    if not p.mtime():
        return True
    return p.can_fetch(agent, url)


@pytest.fixture(scope="module")
def table(spark):
    return RobotsTable.from_texts(
        spark,
        {"a.com": RULES_A, "b.com": RULES_B},
        fetch_time=1_000_000,
    )


def test_can_fetch_matches_stdlib(spark, table):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    out = {
        r["url"]: r["allowed"]
        for r in table.with_can_fetch(df, now=1_000_100).collect()
    }
    rules = {"a.com": RULES_A, "b.com": RULES_B}
    for u in URLS:
        assert out[u] == _oracle(rules, u), u


def test_agent_specific_group(spark, table):
    df = spark.createDataFrame([("https://b.com/open",)], "url string")
    out = table.with_can_fetch(df, now=1_000_100, user_agent="googlebot").collect()
    # googlebot group: Disallow / ⇒ blocked even on /open
    assert out[0]["allowed"] is False


def test_ttl_expiry_allows(spark, table):
    df = spark.createDataFrame([("https://a.com/private/x",)], "url string")
    fresh = table.with_can_fetch(df, now=1_000_100).collect()[0]["allowed"]
    stale = table.with_can_fetch(
        df, now=1_000_000 + RobotsTable.DEFAULT_TTL + 1
    ).collect()[0]["allowed"]
    assert fresh is False
    # stale cache ⇒ the reference refetches, and on any failure allows
    # (utils.py:344-353); with no fresher corpus the gate opens
    assert stale is True


def test_column_fast_path_still_matches():
    # the Disallow-prefix Column path (engine fast gate) agrees with the
    # full parser wherever only Disallow-prefix rules exist
    rules = RobotsRules(disallow={"a.com": ["/private/", "/tmp"]})
    assert rules.is_blocked("https://a.com/private/x")
    assert not rules.is_blocked("https://a.com/ok")
    assert not rules.is_blocked("https://other.com/private/x")
