"""P3 memory governor (CrawlSpec.max_round_size): round-size-capped BFS
must reproduce the ungoverned crawl EXACTLY — same emissions, same seen
set — because deferred rows keep their seqs and children rank after
them, so the global emission order is the reference BFS order
(async_dispatcher.py:155-288 throttles concurrency without changing
crawl semantics; so must we)."""

from crawl4ai_spark.functions.scorers import KeywordRelevanceScorer
from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.sources import corpus

N = 60
START = corpus.py_canonical_url(1)


def run(spark, **kw):
    pages = corpus.build_pages(spark, N)
    eng = CrawlEngine(spark, pages, CrawlSpec(**kw))
    rows = eng.run(START).collect()
    return eng, [
        (r["emit_seq"], r["url"], r["depth"], r["parent_url"], r["success"])
        for r in rows
    ]


def test_governed_equals_ungoverned(spark):
    e0, base = run(spark, max_depth=2)
    e1, gov = run(spark, max_depth=2, max_round_size=4)
    assert gov == base
    assert set(e1.seen_store.urls()) == set(e0.seen_store.urls())


def test_governed_with_cap_and_scorer(spark):
    scorer = KeywordRelevanceScorer(keywords=["blog", "docs"], weight=1.0)
    _, base = run(spark, max_depth=2, max_pages=9, scorer=scorer)
    _, gov = run(
        spark, max_depth=2, max_pages=9, scorer=scorer, max_round_size=3
    )
    assert gov == base


def test_round_sizes_bounded(spark):
    eng, rows = run(spark, max_depth=2, max_round_size=4)
    assert len(rows) > 4  # multiple rounds actually happened
    for m in eng.metrics:
        assert m["fetched"] <= 4
