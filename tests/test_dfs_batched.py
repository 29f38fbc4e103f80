"""DFS batched throughput mode (SURVEY §2.6 W2) vs strict DFS.

With batch_size=1 the batched engine must reproduce strict DFS — and
therefore the reference's dfs_strategy.py loop (already oracle-checked
in test_crawl_parity.py) — exactly: emission order, depths, parents,
seen set, stack evolution.  With larger batches the crawled SET must
match on uncapped crawls; ordering is batch-granular by design.
"""

import pytest

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
        (r["emit_seq"], r["url"], r["depth"], r["parent_url"],
         r["success"], r["status_code"])
        for r in rows
    ]


def test_batch1_equals_strict(spark):
    _, strict = run(spark, max_depth=2, strategy="dfs", max_pages=10)
    _, batched = run(
        spark, max_depth=2, strategy="dfs_batched", max_pages=10, batch_size=1
    )
    assert batched == strict


def test_batch1_equals_strict_with_scorer_overflow(spark):
    scorer = KeywordRelevanceScorer(keywords=["blog", "docs"], weight=1.0)
    _, strict = run(
        spark, max_depth=2, strategy="dfs", max_pages=5, scorer=scorer
    )
    _, batched = run(
        spark, max_depth=2, strategy="dfs_batched", max_pages=5,
        batch_size=1, scorer=scorer,
    )
    assert batched == strict


def test_batched_uncapped_same_set_as_strict(spark):
    e_strict, strict = run(spark, max_depth=2, strategy="dfs", max_pages=30)
    e_batched, batched = run(
        spark, max_depth=2, strategy="dfs_batched", max_pages=30, batch_size=8
    )
    # same crawled set + same per-url depth/success (order differs by design)
    s = {(u, d, ok) for _, u, d, _, ok, _ in strict}
    b = {(u, d, ok) for _, u, d, _, ok, _ in batched}
    assert b == s
    assert set(e_batched.seen_store.urls()) == set(e_strict.seen_store.urls())


def test_batched_respects_max_pages_boundary(spark):
    _, batched = run(
        spark, max_depth=3, strategy="dfs_batched", max_pages=7, batch_size=4
    )
    n_success = sum(1 for _, _, _, _, ok, _ in batched if ok)
    assert n_success == 7
    # emit_seq is dense and strictly increasing
    seqs = [t[0] for t in batched]
    assert seqs == list(range(len(seqs)))


def test_batched_export_state_shape(spark):
    eng, _ = run(
        spark, max_depth=2, strategy="dfs_batched", max_pages=6, batch_size=4
    )
    st = eng.export_state()
    assert st["strategy_type"] == "dfs"
    # the capacity trim can under-fill the cap when a trimmed-in page
    # later fails (strict-mode behavior too) — never exceeds it
    assert 0 < st["pages_crawled"] <= 6
    assert isinstance(st["visited"], list)
    assert isinstance(st["stack"], list)


def test_batched_resume_continues(spark):
    eng, first = run(
        spark, max_depth=2, strategy="dfs_batched", max_pages=4, batch_size=2
    )
    st = eng.export_state()
    pages = corpus.build_pages(spark, N)
    eng2 = CrawlEngine(
        spark, pages,
        CrawlSpec(max_depth=2, strategy="dfs_batched", max_pages=8,
                  batch_size=2, resume_state=st),
    )
    more = eng2.run(START).collect()
    # resumed crawl never re-crawls already-visited URLs
    first_urls = {t[1] for t in first}
    more_urls = {r["url"] for r in more}
    assert first_urls.isdisjoint(more_urls)
    assert eng2._pages_crawled >= 8 or len(more) == 0
