"""Seeder pipeline + BM25 scorers (async_url_seeder.py:364-555,
1703-1747; filters.py:559-578)."""

import math

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.sources.seeder import (
    corpus_bm25,
    head_bm25,
    is_nonsense_url,
    seed_pipeline,
)

DOCS = [
    (0, "spark table data data query"),
    (1, "row scan filter join join join"),
    (2, "data spark spark engine"),
    (3, "unrelated words only here"),
]
QUERY = "data spark"


def okapi_reference(query, docs, k1=1.5, b=0.75, epsilon=0.25):
    """Independent pure-Python BM25Okapi (public algorithm): corpus idf
    with the epsilon floor for negative idfs, then min-max normalize
    (the seeder's normalization)."""
    tokenized = [d.lower().split() for d in docs]
    n = len(tokenized)
    avgdl = sum(len(d) for d in tokenized) / n
    df = {}
    for d in tokenized:
        for t in set(d):
            df[t] = df.get(t, 0) + 1
    idf = {t: math.log((n - f + 0.5) / (f + 0.5)) for t, f in df.items()}
    avg_idf = sum(idf.values()) / len(idf)
    floor = epsilon * avg_idf
    idf = {t: (v if v >= 0 else floor) for t, v in idf.items()}
    scores = []
    for d in tokenized:
        s = 0.0
        for t in set(query.lower().split()):
            if t not in idf:
                continue
            tf = d.count(t)
            if tf == 0:
                continue
            s += idf[t] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avgdl))
        scores.append(s)
    lo, hi = min(scores), max(scores)
    if hi == lo:
        return [0.5] * len(scores)
    return [(x - lo) / (hi - lo) for x in scores]


def test_corpus_bm25_matches_okapi(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["relevance_score"]
        for r in corpus_bm25(df, QUERY).collect()
    }
    expected = okapi_reference(QUERY, [t for _, t in DOCS])
    for (i, _), e in zip(DOCS, expected):
        assert got[i] == pytest.approx(e, abs=1e-12), i


def test_head_bm25_hand_value(spark):
    # one doc: "data data spark" vs query "data spark"
    # dl=3; data: tf=2 idf=ln(2/2.5+1)=ln(1.8); part=idf*2*2.2/(2+1.2*(0.25+0.75*3/1000))
    df = spark.createDataFrame([("data data spark",)], "text string")
    tf_d, tf_s, dl = 2.0, 1.0, 3.0
    exp = 0.0
    for tf in (tf_d, tf_s):
        idf = math.log(2.0 / (tf + 0.5) + 1.0)
        exp += idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / 1000.0))))
    got = df.select(head_bm25(F.col("text"), "data spark").alias("s")).collect()[0]["s"]
    assert got == pytest.approx(exp, abs=1e-12)


def test_nonsense_filter(spark):
    cases = [
        ("https://x.com/robots.txt", True),
        ("https://x.com/sitemap.xml", True),
        ("https://x.com/sitemap_news.xml", True),
        ("https://x.com/favicon.ico", True),
        ("https://x.com/blog/post", False),
        ("https://x.com/sitemap-viewer", False),  # no xml/txt suffix
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["v"]
        for r in df.select("url", is_nonsense_url(F.col("url")).alias("v")).collect()
    }
    assert got == dict(cases)


def test_seed_pipeline_dedupe_filter_limit(spark):
    a = spark.createDataFrame(
        [("https://x.com/a",), ("https://x.com/b",), ("https://x.com/robots.txt",)],
        "url string",
    )
    b = spark.createDataFrame(
        [("https://x.com/b",), ("https://x.com/c",)], "url string"
    )
    rel = spark.createDataFrame(
        [("https://x.com/a", 0.1), ("https://x.com/b", 0.9), ("https://x.com/c", 0.5)],
        "url string, relevance_score double",
    )
    out = seed_pipeline([a, b], max_urls=2, relevance=rel).collect()
    assert [r["url"] for r in out] == ["https://x.com/b", "https://x.com/c"]
