"""S10 DomainMapper multi-source composition: CT/wayback/CC host
mining, robots Sitemap/Disallow mining, feed extraction, probe
existence join, and first-source-wins dedupe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.sources.domain_mapper import (
    feed_urls,
    hosts_from_cc,
    hosts_from_crt,
    hosts_from_wayback,
    map_domain,
    probe_urls,
    sitemap_urls_from_robots,
    urls_from_wayback,
)

BASE = "ex.com"


def test_hosts_from_crt(spark):
    ct = spark.createDataFrame(
        [
            ("www.ex.com", "www.ex.com\n*.api.ex.com\nMAIL.EX.COM"),
            ("other.org", "other.org"),
            ("ex.com", None),
        ],
        "common_name string, name_value string",
    )
    got = {r["host"] for r in hosts_from_crt(ct, BASE).collect()}
    assert got == {"www.ex.com", "api.ex.com", "mail.ex.com", "ex.com"}


def test_wayback_urls_and_hosts(spark):
    cdx = spark.createDataFrame(
        [
            ("https://ex.com/a",),
            ("https://old.ex.com:8080/b",),
            ("https://not-ex.org/c",),
            ("  https://ex.com/a  ",),
        ],
        "original string",
    )
    urls = {r["url"] for r in urls_from_wayback(cdx, BASE).collect()}
    assert urls == {"https://ex.com/a", "https://old.ex.com:8080/b"}
    hosts = {r["host"] for r in hosts_from_wayback(cdx, BASE).collect()}
    assert hosts == {"ex.com", "old.ex.com"}


def test_robots_mining(spark):
    robots = spark.createDataFrame(
        [
            ("ex.com", "User-agent: *\nDisallow: /private\nSitemap: https://ex.com/sm.xml\nsitemap: https://ex.com/sm2.xml"),
        ],
        "host string, content string",
    )
    sm = {r["sitemap_url"] for r in sitemap_urls_from_robots(robots).collect()}
    assert sm == {"https://ex.com/sm.xml", "https://ex.com/sm2.xml"}


def test_feed_urls(spark):
    hp = spark.createDataFrame(
        [
            ("ex.com",
             '<html><link rel="alternate" type="application/rss+xml" href="/feed.xml">'
             '<link rel="alternate" type="application/atom+xml" href="https://ex.com/atom"></html>'),
        ],
        "host string, content string",
    )
    got = {r["url"] for r in feed_urls(hp, BASE).collect()}
    assert got == {"https://ex.com/feed.xml", "https://ex.com/atom"}


def test_map_domain_compose_and_priority(spark):
    pages = spark.createDataFrame(
        [("https://ex.com/",), ("https://ex.com/docs",), ("https://api.ex.com/",)],
        "url string",
    )
    sitemap_seeds = spark.createDataFrame(
        [("https://ex.com/docs",), ("https://ex.com/sm-only",)], "url string"
    )
    cdx = spark.createDataFrame(
        [("https://ex.com/docs",), ("https://ex.com/wb-only",),
         ("https://api.ex.com/x",)],
        "original string",
    )
    out = map_domain(
        BASE, pages, sitemap_seeds=sitemap_seeds, wayback_cdx=cdx,
    )
    rows = {r["url"]: r["source"] for r in out.collect()}
    # first-source-wins: sitemap beats wayback beats probe
    assert rows["https://ex.com/docs"] == "sitemap"
    assert rows["https://ex.com/wb-only"] == "wayback"
    assert rows["https://ex.com/sm-only"] == "sitemap"
    # probe found the corpus-backed roots (incl. the wayback-discovered
    # api subdomain's homepage), and skipped non-existent probe paths
    assert rows["https://ex.com/"] == "probe"
    assert rows["https://api.ex.com/"] == "probe"
    assert "https://ex.com/admin" not in rows
    # every URL appears exactly once
    assert out.count() == out.select("url").distinct().count()
