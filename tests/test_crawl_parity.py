"""Engine ↔ oracle parity over the synthetic corpus.

The oracle (crawl4ai_spark/oracle.py) executes the reference's own
traversal loops; the Spark engine must reproduce emission order, depth,
parent, score, success/status AND the final URL-seen set exactly.
Mirrors the reference's strategy tests
(tests/deep_crawling/test_deep_crawl_resume.py,
tests/regression/test_reg_deep_crawl.py:115-209,519-569)."""

import math

import pytest

from crawl4ai_spark.functions.filters import FilterChain, URLPatternFilter
from crawl4ai_spark.functions.scorers import KeywordRelevanceScorer
from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.oracle import CrawlSpec as OracleSpec
from crawl4ai_spark.oracle import crawl_oracle
from crawl4ai_spark.sources import corpus

N = 60
START = corpus.py_canonical_url(1)  # not a failure row


def run_both(spark, spec_kwargs, start=START, n=N):
    pages_df = corpus.build_pages(spark, n)
    engine = CrawlEngine(spark, pages_df, CrawlSpec(**spec_kwargs))
    got = engine.run(start).collect()
    oracle_emissions, oracle_visited = crawl_oracle(
        corpus.pages_dict(n), start, OracleSpec(**spec_kwargs)
    )
    return engine, got, oracle_emissions, oracle_visited


def assert_parity(engine, got, oracle_emissions, oracle_visited, check_seen=True):
    got_t = [
        (r["emit_seq"], r["url"], r["depth"], r["parent_url"],
         r["score"], r["success"], r["status_code"])
        for r in got
    ]
    exp_t = [
        (e.seq, e.url, e.depth, e.parent_url, e.score, e.success, e.status_code)
        for e in oracle_emissions
    ]
    assert got_t == exp_t
    if check_seen:
        engine_seen = set(engine.seen_store.urls())
        assert engine_seen == oracle_visited


def test_bfs_depth2(spark):
    engine, got, exp, visited = run_both(
        spark, dict(max_depth=2, strategy="bfs")
    )
    assert_parity(engine, got, exp, visited)
    # reference invariant: depths never decrease per level
    depths = [r["depth"] for r in got]
    assert depths == sorted(depths)


def test_bfs_max_pages(spark):
    engine, got, exp, visited = run_both(
        spark, dict(max_depth=3, strategy="bfs", max_pages=7)
    )
    assert_parity(engine, got, exp, visited)
    # successes only count toward the cap; a level in flight is not truncated
    assert sum(1 for e in exp if e.success) >= 7


def test_bfs_with_scorer_and_cap(spark):
    engine, got, exp, visited = run_both(
        spark,
        dict(
            max_depth=3,
            strategy="bfs",
            max_pages=9,
            scorer=KeywordRelevanceScorer(keywords=["blog", "docs"], weight=1.0),
        ),
    )
    assert_parity(engine, got, exp, visited)


def test_bfs_filter_chain(spark):
    chain = FilterChain([URLPatternFilter(patterns=["*doc-*"], reverse=False)])
    engine, got, exp, visited = run_both(
        spark, dict(max_depth=2, strategy="bfs", filter_chain=chain)
    )
    assert_parity(engine, got, exp, visited)


def test_bfs_include_external(spark):
    engine, got, exp, visited = run_both(
        spark, dict(max_depth=2, strategy="bfs", include_external=True)
    )
    assert_parity(engine, got, exp, visited)
    # external links are fetch-misses → success=False rows present
    ext = [r for r in got if "partner.org" in r["url"]]
    assert ext and all(not r["success"] for r in ext)


def test_bff_priority_order(spark):
    engine, got, exp, visited = run_both(
        spark,
        dict(
            max_depth=2,
            strategy="best_first",
            scorer=KeywordRelevanceScorer(keywords=["blog", "docs"], weight=1.0),
            max_pages=18,
        ),
    )
    assert_parity(engine, got, exp, visited)


def test_bff_threshold(spark):
    engine, got, exp, visited = run_both(
        spark,
        dict(
            max_depth=2,
            strategy="best_first",
            scorer=KeywordRelevanceScorer(keywords=["blog", "docs"], weight=1.0),
            score_threshold=0.5,
            max_pages=12,
        ),
    )
    assert_parity(engine, got, exp, visited)


def test_dfs_order(spark):
    engine, got, exp, visited = run_both(
        spark, dict(max_depth=2, strategy="dfs", max_pages=8)
    )
    assert_parity(engine, got, exp, visited, check_seen=False)
    assert engine.visited_set == visited


def test_dfs_with_scorer(spark):
    engine, got, exp, visited = run_both(
        spark,
        dict(
            max_depth=2,
            strategy="dfs",
            max_pages=6,
            scorer=KeywordRelevanceScorer(keywords=["blog"], weight=1.0),
        ),
    )
    assert_parity(engine, got, exp, visited, check_seen=False)
    assert engine.visited_set == visited


def test_corpus_spark_matches_python(spark):
    """The Spark corpus generator and its pure-Python mirror are the
    same spec — node attrs and link lists must agree row-for-row."""
    df = corpus.build_pages(spark, 40).collect()
    py = corpus.pages_dict(40)
    assert len(df) == len(py)
    for row in df:
        page = py[row["url"]]
        assert row["status_code"] == page.status_code
        assert row["success"] == page.success
        got_links = [(l["href"], l["is_external"]) for l in row["links"]]
        assert got_links == page.links


def test_bff_larger_batch(spark):
    """batch_size is a scale knob — engine and oracle agree at any size."""
    engine, got, exp, visited = run_both(
        spark,
        dict(
            max_depth=2,
            strategy="best_first",
            scorer=KeywordRelevanceScorer(keywords=["blog", "docs"], weight=1.0),
            max_pages=25,
            batch_size=30,
        ),
    )
    assert_parity(engine, got, exp, visited)


def test_bfs_multiseed(spark):
    engine, got, exp, visited = run_both(
        spark,
        dict(max_depth=1, strategy="bfs"),
        start=[corpus.py_canonical_url(1), corpus.py_canonical_url(7),
               corpus.py_canonical_url(11)],
    )
    assert_parity(engine, got, exp, visited)
