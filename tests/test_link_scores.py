"""C7 intrinsic link score, C8 total score, C9 fuzzy URL relevance
(utils.py:3344-3504, async_url_seeder.py:1519-1605)."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.link_scores import (
    intrinsic_link_score,
    py_url_relevance,
    total_score,
    url_relevance_udf,
)


def test_intrinsic_hand_cases(spark):
    df = spark.createDataFrame(
        [
            # docs path +2, depth<=2... https bonus, title attr, good text
            ("API Reference Guide", "https://x.com/docs/", "Full API docs",
             "nav primary", None, 7.0),
            #  ^ title>3 +1, nav class +1.5, /docs/ +2, depth(3-2=1? count '/'=4 → 2)… see below
            ("click here", "http://x.com/admin/deep/a/b/c/d/e", None,
             "ad banner", "nofollow sponsored", 0.0),
        ],
        "text string, url string, title string, cls string, rel string, expected double",
    )
    got = df.select(
        intrinsic_link_score(
            F.col("text"), F.col("url"), F.col("title"), F.col("cls"), F.col("rel")
        ).alias("s"),
        "expected",
    ).collect()
    # row 1: title +1, nav +1.5, /docs/ +2, depth = 4-2 = 2 → +1,
    #        https +0.5, text>3 +1 (wait: 'API Reference Guide' 3 words → +0.5)
    r1 = got[0]["s"]
    assert r1 == pytest.approx(1 + 1.5 + 2 + 1 + 0.5 + 1 + 0.5, abs=1e-9)
    # row 2: everything negative + generic text → clamped at 0
    assert got[1]["s"] == 0.0


def test_total_score_cases(spark):
    df = spark.createDataFrame([(6.0, 0.5)], "i double, c double")
    rows = df.select(
        total_score(None, None, False, False).alias("off"),
        total_score(F.col("i"), None, True, False).alias("intr_only"),
        total_score(F.col("i"), F.col("c"), True, True).alias("both"),
    ).collect()[0]
    assert rows["off"] == 5.0
    assert rows["intr_only"] == 6.0
    assert rows["both"] == pytest.approx(6.0 * 0.7 + 5.0 * 0.3, abs=1e-12)


def test_url_relevance_exact_substring():
    # query contained in a path part → 1.0 dominates the harmonic blend
    s = py_url_relevance("python", "https://docs.python.org/python/tutorial")
    assert s > 0.8
    weak = py_url_relevance("quantum", "https://example.com/cooking/recipes")
    assert weak < 0.2
    assert py_url_relevance("python", "https://x.com") >= 0.0


def test_url_relevance_udf_matches_python(spark):
    urls = [
        "https://docs.python.org/3/tutorial",
        "https://github.com/repo/python-guide",
        "https://example.com/shop?item=python-book",
        "https://unrelated.org/misc",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    udf = url_relevance_udf("python tutorial")
    got = {r["url"]: r["s"] for r in df.select("url", udf(F.col("url")).alias("s")).collect()}
    for u in urls:
        assert got[u] == py_url_relevance("python tutorial", u)
