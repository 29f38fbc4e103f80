"""S3/S4 seed sources: sitemap parsing (nested indexes, gz, relative
locs) and CC-index reads, mirroring the reference behaviors at
async_url_seeder.py:829-883 and :885-1104."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from crawl4ai_spark.sources.sitemap import (
    cc_index_seeds,
    glob_to_regex,
    gunzip_text_udf,
    parse_sitemap,
    seed_from_sitemaps,
    sitemap_probe_candidates,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.com/page1</loc><lastmod>2024-01-01</lastmod></url>
  <url><loc> https://a.com/page2 </loc></url>
  <url><loc>​https://a.com/page3﻿</loc></url>
  <url><loc>/relative/page4</loc></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.com/sitemap-a.xml</loc><lastmod>2024-02-02</lastmod></sitemap>
  <sitemap><loc>https://a.com/sitemap-b.xml</loc></sitemap>
  <url><loc>https://a.com/IGNORED-because-index</loc></url>
</sitemapindex>"""

SUB_A = """<urlset><url><loc>https://a.com/a1</loc></url>
<url><loc>https://a.com/a2</loc></url></urlset>"""
SUB_B = """<urlset><url><loc>https://a.com/b1</loc></url></urlset>"""


def test_parse_urlset(spark):
    docs = spark.createDataFrame(
        [("https://a.com/sitemap.xml", URLSET)], "sitemap_url string, content string"
    )
    rows = parse_sitemap(docs).orderBy("loc_idx").collect()
    assert [r["loc"] for r in rows] == [
        "https://a.com/page1",
        "https://a.com/page2",
        "https://a.com/page3",          # zero-width/BOM stripped
        "https://a.com/relative/page4",  # resolved against the sitemap URL
    ]
    assert all(not r["is_index"] for r in rows)


def test_parse_index_ignores_url_entries(spark):
    docs = spark.createDataFrame(
        [("https://a.com/sitemap.xml", INDEX)], "sitemap_url string, content string"
    )
    rows = parse_sitemap(docs).orderBy("loc_idx").collect()
    # index docs yield ONLY sub-sitemap locs (reference :1050-1066)
    assert [r["loc"] for r in rows] == [
        "https://a.com/sitemap-a.xml",
        "https://a.com/sitemap-b.xml",
    ]
    assert all(r["is_index"] for r in rows)


def test_gunzip_udf(spark):
    payload = gzip.compress(URLSET.encode())
    df = spark.createDataFrame([(payload,), (b"plain text",)], "content binary")
    got = [r["t"] for r in df.select(gunzip_text_udf("content").alias("t")).collect()]
    assert got[0] == URLSET
    assert got[1] == "plain text"


def test_seed_from_sitemaps_nested(spark):
    domains = spark.createDataFrame([("a.com",)], "domain string")
    docs = spark.createDataFrame(
        [
            ("https://a.com/sitemap.xml", INDEX),
            ("https://a.com/sitemap-a.xml", SUB_A),
            ("https://a.com/sitemap-b.xml", SUB_B),
        ],
        "sitemap_url string, content string",
    )
    got = {
        r["url"]
        for r in seed_from_sitemaps(domains, docs).collect()
    }
    assert got == {"https://a.com/a1", "https://a.com/a2", "https://a.com/b1"}


def test_seed_probe_order(spark):
    # no https/sitemap.xml in the corpus → falls to https/sitemap_index.xml
    domains = spark.createDataFrame([("b.org",)], "domain string")
    docs = spark.createDataFrame(
        [
            ("https://b.org/sitemap_index.xml",
             "<urlset><url><loc>https://b.org/x</loc></url></urlset>"),
            ("http://b.org/sitemap.xml",
             "<urlset><url><loc>https://b.org/WRONG</loc></url></urlset>"),
        ],
        "sitemap_url string, content string",
    )
    probes = sitemap_probe_candidates(domains).orderBy("probe_rank").collect()
    assert [p["probe_url"] for p in probes] == [
        "https://b.org/sitemap.xml",
        "https://b.org/sitemap_index.xml",
        "http://b.org/sitemap.xml",
        "http://b.org/sitemap_index.xml",
    ]
    got = [r["url"] for r in seed_from_sitemaps(domains, docs).collect()]
    assert got == ["https://b.org/x"]  # https index wins over http sitemap


def test_seed_pattern_filter(spark):
    domains = spark.createDataFrame([("a.com",)], "domain string")
    docs = spark.createDataFrame(
        [("https://a.com/sitemap.xml", URLSET)], "sitemap_url string, content string"
    )
    got = {
        r["url"]
        for r in seed_from_sitemaps(domains, docs, url_pattern="*page[13]*").collect()
    }
    assert got == {"https://a.com/page1", "https://a.com/page3"}


def test_glob_to_regex():
    import re

    rx = glob_to_regex("*docs/*.html")
    assert re.match(rx, "https://x.com/docs/a.html")
    assert not re.match(rx, "https://x.com/blog/a.html")


def test_cc_index_seeds_pushdown(spark, tmp_path):
    # simulate a CC columnar index as parquet; check pushed filters
    p = str(tmp_path / "cc")
    spark.createDataFrame(
        [
            ("a.com", "https://sub.a.com/p1", 200),
            ("a.com", "https://a.com/p2", 200),
            ("a.com", "https://a.com/p2", 200),  # dup record
            ("b.org", "https://b.org/q", 200),
        ],
        "url_host_registered_domain string, url string, status int",
    ).write.parquet(p)
    cc = spark.read.parquet(p)
    out = cc_index_seeds(cc, "a.com")
    got = {r["url"] for r in out.collect()}
    assert got == {"https://sub.a.com/p1", "https://a.com/p2"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # domain filter + column pruning reach the parquet scan
    assert "PushedFilters: [IsNotNull(url_host_registered_domain), EqualTo(url_host_registered_domain,a.com)" in plan
    assert "status" not in plan.split("ReadSchema")[1].splitlines()[0]

    filtered = cc_index_seeds(cc, "a.com", url_pattern="*a.com/p*")
    assert {r["url"] for r in filtered.collect()} == {
        "https://sub.a.com/p1",
        "https://a.com/p2",
    }
