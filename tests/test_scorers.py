"""Scorer golden values, ported verbatim from
/root/reference/tests/general/test_deep_crawl_scorers.py:4-175.

Each scorer is evaluated BOTH as a Spark Column and through the
pure-Python oracle mirror; both must reproduce the reference's exact
expected values (tolerance 1e-5, same as the reference test)."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.scorers import (
    CompositeScorer,
    ContentTypeScorer,
    DomainAuthorityScorer,
    FreshnessScorer,
    KeywordRelevanceScorer,
    PathDepthScorer,
    py_score,
)

KEYWORD = KeywordRelevanceScorer(keywords=["python", "blog"], weight=1.0)
PATH = PathDepthScorer(optimal_depth=2, weight=1.0)
CTYPE = ContentTypeScorer(
    type_weights={".html$": 1.0, ".pdf$": 0.8, ".jpg$": 0.6}, weight=1.0
)
FRESH = FreshnessScorer(weight=1.0, current_year=2024)
DOMAIN = DomainAuthorityScorer(
    domain_weights={"python.org": 1.0, "github.com": 0.8, "medium.com": 0.6},
    default_weight=0.3,
    weight=1.0,
)
COMPOSITE = CompositeScorer(
    scorers=[KEYWORD, PATH, CTYPE, FRESH, DOMAIN], normalize=True
)

GOLDEN = [
    (KEYWORD, "https://example.com/python-blog", 1.0),
    (KEYWORD, "https://example.com/PYTHON-BLOG", 1.0),
    (KEYWORD, "https://example.com/python-only", 0.5),
    (KEYWORD, "https://example.com/other", 0.0),
    (PATH, "https://example.com/a/b", 1.0),
    (PATH, "https://example.com/a", 0.5),
    (PATH, "https://example.com/a/b/c", 0.5),
    (PATH, "https://example.com", 0.33333333),
    (CTYPE, "https://example.com/doc.html", 1.0),
    (CTYPE, "https://example.com/doc.pdf", 0.8),
    (CTYPE, "https://example.com/img.jpg", 0.6),
    (CTYPE, "https://example.com/other.txt", 0.0),
    (FRESH, "https://example.com/2024/01/post", 1.0),
    (FRESH, "https://example.com/2023/12/post", 0.9),
    (FRESH, "https://example.com/2022/post", 0.8),
    (FRESH, "https://example.com/no-date", 0.5),
    (DOMAIN, "https://python.org/about", 1.0),
    (DOMAIN, "https://github.com/repo", 0.8),
    (DOMAIN, "https://medium.com/post", 0.6),
    (DOMAIN, "https://unknown.com", 0.3),
    (COMPOSITE, "https://python.org/blog/2024/01/new-release.html", 0.86666667),
    (COMPOSITE, "https://github.com/repo/old-code.pdf", 0.62),
    (COMPOSITE, "https://unknown.com/random", 0.26),
]


@pytest.mark.parametrize("scorer,url,expected", GOLDEN)
def test_py_golden(scorer, url, expected):
    assert round(py_score(scorer, url), 8) == pytest.approx(expected, abs=1e-5)


def test_spark_golden(spark):
    df = spark.createDataFrame([(u,) for _, u, _ in GOLDEN], "url string")
    cols = [s.column(F.col("url")).alias(f"s{i}") for i, (s, _, _) in enumerate(GOLDEN)]
    row = df.select(cols).collect()
    got = [row[i][f"s{i}"] for i, _ in enumerate(GOLDEN)]
    for (scorer, url, expected), g in zip(GOLDEN, got):
        assert round(g, 8) == pytest.approx(expected, abs=1e-5), (scorer, url)


def test_spark_matches_python_exactly(spark):
    """Bit-for-bit agreement between Column and oracle mirrors, beyond
    the golden tolerance — required for engine/oracle score-order parity."""
    urls = [u for _, u, _ in GOLDEN]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    for scorer in [KEYWORD, PATH, CTYPE, FRESH, DOMAIN, COMPOSITE]:
        got = {
            r["url"]: r["s"]
            for r in df.select("url", scorer.column("url").alias("s")).collect()
        }
        for u in urls:
            assert got[u] == py_score(scorer, u), (scorer, u)


def test_weighted_scorer_float32(spark):
    s = KeywordRelevanceScorer(keywords=["a"], weight=0.7)
    # 0.7 → float32 → 0.699999988079071; 1.0 * w must carry that exactly
    assert py_score(s, "https://x.com/a") == pytest.approx(0.699999988079071, abs=1e-12)
