"""Filter truth tables from the reference suites
(tests/general/test_deep_crawl_filters.py, tests/general/test_url_pattern.py:19-59,
tests/deep_crwaling/test_filter.py:20-75)."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.filters import (
    ContentTypeFilter,
    DomainFilter,
    FilterChain,
    URLPatternFilter,
    py_valid_crawl_url,
    valid_crawl_url,
)


def check_both(spark, filt, cases):
    """Assert python and Column agree with the expected verdicts."""
    for url, expected in cases:
        assert filt.apply(url) is expected, f"py: {url}"
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["v"]
        for r in df.select("url", filt.column("url").alias("v")).collect()
    }
    for url, expected in cases:
        assert got[url] == expected, f"spark: {url}"


def test_pattern_suffix(spark):
    f = URLPatternFilter(patterns=["*.html"])
    check_both(
        spark,
        f,
        [
            ("https://example.com/page.html", True),
            ("https://example.com/page.pdf", False),
            ("https://example.com/page", False),
        ],
    )


def test_pattern_prefix_path_boundary(spark):
    # tests/general/test_url_pattern.py: '/api/*' matches '/api/v1' and
    # '/api?param=1' but not '/apiv2/'
    f = URLPatternFilter(patterns=["/api/*"])
    check_both(
        spark,
        f,
        [
            ("https://example.com/api/v1", True),
            ("https://example.com/api?param=1", True),
            ("https://example.com/api", True),
            ("https://example.com/apiv2/", False),
        ],
    )


def test_pattern_glob_and_reverse(spark):
    f = URLPatternFilter(patterns=["*blog*"])
    check_both(
        spark,
        f,
        [
            ("https://example.com/blog/post", True),
            ("https://example.com/shop", False),
        ],
    )
    r = URLPatternFilter(patterns=["*blog*"], reverse=True)
    check_both(
        spark,
        r,
        [
            ("https://example.com/blog/post", False),
            ("https://example.com/shop", True),
        ],
    )


def test_pattern_regex(spark):
    f = URLPatternFilter(patterns=[r"^https://example\.com/\d+$"])
    check_both(
        spark,
        f,
        [
            ("https://example.com/123", True),
            ("https://example.com/abc", False),
        ],
    )


def test_content_type_filter(spark):
    f = ContentTypeFilter(allowed_types=["text/html"])
    check_both(
        spark,
        f,
        [
            ("https://example.com/page.html", True),
            ("https://example.com/page.htm", True),
            ("https://example.com/page.pdf", False),
            ("https://example.com/page", True),  # no extension ⇒ pass
            ("https://example.com/", True),
            ("https://example.com", True),
        ],
    )


def test_content_type_extension_extraction():
    assert ContentTypeFilter.extract_extension("https://x.com/file.tar.gz") == "gz"
    assert ContentTypeFilter.extract_extension("https://x.com/file.HTML") == "html"
    assert ContentTypeFilter.extract_extension("https://x.com/dir/") == ""
    assert ContentTypeFilter.extract_extension("https://x.com") == ""


def test_content_type_php_family(spark):
    f = ContentTypeFilter(allowed_types=["application/x-httpd-php"])
    check_both(
        spark,
        f,
        [
            ("https://example.com/index.php", True),
            ("https://example.com/index.php5", True),
            ("https://example.com/index.phtml", True),
            ("https://example.com/index.html", False),
        ],
    )


def test_domain_filter(spark):
    f = DomainFilter(allowed_domains=["example.com"])
    check_both(
        spark,
        f,
        [
            ("https://example.com/a", True),
            ("https://sub.example.com/a", True),  # subdomain allowed
            ("https://notexample.com/a", False),
            ("https://evil-example.com/a", False),
        ],
    )
    b = DomainFilter(blocked_domains=["bad.com"])
    check_both(
        spark,
        b,
        [
            ("https://bad.com/a", False),
            ("https://sub.bad.com/a", False),
            ("https://good.com/a", True),
        ],
    )
    both = DomainFilter(allowed_domains=["example.com"], blocked_domains=["spam.example.com"])
    check_both(
        spark,
        both,
        [
            ("https://example.com/a", True),
            ("https://spam.example.com/a", False),  # blocked wins
            ("https://ok.example.com/a", True),
        ],
    )


def test_filter_chain_conjunction(spark):
    chain = FilterChain(
        [
            URLPatternFilter(patterns=["*.html"]),
            DomainFilter(allowed_domains=["example.com"]),
        ]
    )
    cases = [
        ("https://example.com/a.html", True),
        ("https://example.com/a.pdf", False),
        ("https://other.com/a.html", False),
    ]
    for url, expected in cases:
        assert chain.apply(url) is expected
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["v"]
        for r in df.select("url", chain.column("url").alias("v")).collect()
    }
    assert got == dict(cases)


def test_valid_crawl_url(spark):
    cases = [
        ("https://example.com/a", True),
        ("http://example.com", True),
        ("HTTPS://EXAMPLE.COM/A", True),  # urlparse lowercases scheme
        ("ftp://example.com/a", False),
        ("https://localhost/a", False),  # no dot in netloc
        ("not-a-url", False),
        ("https:///path", False),  # empty netloc
    ]
    for url, expected in cases:
        assert py_valid_crawl_url(url) is expected, url
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["v"]
        for r in df.select("url", valid_crawl_url("url").alias("v")).collect()
    }
    assert got == dict(cases)
