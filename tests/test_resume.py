"""Resume/checkpoint semantics — mirrors the reference's
tests/deep_crawling/test_deep_crawl_resume.py:
- state shape per strategy (:175-211, 375-404, 443-476)
- resume-no-recrawl / crawl-pending (:213-319)
- DFS stack order on resume (:405-437)
- best-first priority order on resume (:477-509)
"""

import pytest

from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.plans.checkpoint import (
    latest_round,
    resume_state_from_snapshot,
)
from crawl4ai_spark.sources import corpus

N = 40
U = corpus.py_canonical_url


def engine(spark, **kw):
    pages = corpus.build_pages(spark, N)
    return CrawlEngine(spark, pages, CrawlSpec(**kw))


def test_bfs_state_shape_and_resume(spark):
    e = engine(spark, max_depth=1, strategy="bfs")
    e.run(U(1))
    state = e.export_state()
    assert state["strategy_type"] == "bfs"
    assert set(state) >= {"visited", "pending", "depths", "pages_crawled", "cancelled"}
    assert state["pending"] == []  # crawl ran to completion
    assert state["pages_crawled"] >= 1

    # manual mid-crawl state: page U(1) done, U(4)/U(5) pending at depth 1
    mid = {
        "strategy_type": "bfs",
        "visited": [U(4), U(5)],
        "pending": [
            {"url": U(4), "parent_url": U(1)},
            {"url": U(5), "parent_url": U(1)},
        ],
        "depths": {U(1): 0, U(4): 1, U(5): 1},
        "pages_crawled": 1,
        "cancelled": False,
    }
    r = engine(spark, max_depth=1, strategy="bfs", resume_state=mid)
    got = r.run(U(1)).collect()
    urls = [x["url"] for x in got]
    assert urls == [U(4), U(5)]  # pending crawled in order, U(1) NOT recrawled
    assert [x["depth"] for x in got] == [1, 1]
    assert [x["parent_url"] for x in got] == [U(1), U(1)]


def test_dfs_resume_stack_order(spark):
    # stack is saved bottom→top; resume pops the TOP (last item) first
    mid = {
        "strategy_type": "dfs",
        "visited": [U(1)],
        "dfs_seen": [U(1), U(4), U(5)],
        "stack": [
            {"url": U(5), "parent_url": U(1), "depth": 1},
            {"url": U(4), "parent_url": U(1), "depth": 1},
        ],
        "depths": {U(1): 0, U(4): 1, U(5): 1},
        "pages_crawled": 1,
    }
    r = engine(spark, max_depth=1, strategy="dfs", resume_state=mid)
    got = r.run(U(1)).collect()
    urls = [x["url"] for x in got]
    assert urls == [U(4), U(5)]  # top of stack first
    assert U(1) not in urls


def test_bff_resume_priority_order(spark):
    # higher score (more-negative heap key) pops first
    mid = {
        "strategy_type": "best_first",
        "visited": [U(1)],
        "queue_items": [
            {"score": -0.2, "depth": 1, "url": U(4), "parent_url": U(1)},
            {"score": -0.9, "depth": 1, "url": U(5), "parent_url": U(1)},
            {"score": -0.5, "depth": 1, "url": U(6), "parent_url": U(1)},
        ],
        "depths": {U(1): 0, U(4): 1, U(5): 1, U(6): 1},
        "pages_crawled": 1,
    }
    r = engine(spark, max_depth=1, strategy="best_first", resume_state=mid)
    got = r.run(U(1)).collect()
    assert [x["url"] for x in got] == [U(5), U(6), U(4)]
    assert [x["score"] for x in got] == [0.9, 0.5, 0.2]
    assert U(1) not in {x["url"] for x in got}


def test_checkpoint_snapshot_roundtrip(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    e = engine(spark, max_depth=2, strategy="bfs", checkpoint_dir=ckpt)
    full = e.run(U(1)).collect()
    last = latest_round(ckpt)
    assert last is not None and last >= 1

    # resume from the round-1 snapshot: emissions must equal the full
    # run's rounds ≥ 1 (same urls/depths/parents, re-sequenced)
    state = resume_state_from_snapshot(spark, ckpt, 1)
    r = engine(spark, max_depth=2, strategy="bfs", resume_state=state)
    got = r.run(U(1)).collect()
    expected_tail = [x for x in full if x["round"] >= 1]
    assert [(x["url"], x["depth"], x["parent_url"]) for x in got] == [
        (x["url"], x["depth"], x["parent_url"]) for x in expected_tail
    ]


@pytest.mark.parametrize("strategy", ["best_first", "dfs", "dfs_batched"])
def test_table_resume_matches_dict_resume_non_bfs(spark, tmp_path, strategy):
    """export_state_tables -> resume_state_from_tables must reconstruct
    the queue (incl. the neg_score heap key) / stack and produce the
    same continuation as the reference-dict resume path."""
    from crawl4ai_spark.functions.scorers import KeywordRelevanceScorer

    scorer = (
        KeywordRelevanceScorer(["docs", "2019"]) if strategy == "best_first"
        else None
    )
    pages = corpus.build_pages(spark, N)
    # stop via cancellation, not max_pages: the page cap's capacity
    # trim (reference remaining-capacity guard) throttles pushes toward
    # zero pending at the cap, while a cancel leaves the queue/stack
    # mid-flight — the state a crash-recovery resume actually sees
    batch = 2 if strategy == "dfs_batched" else 10
    depth = 3 if strategy == "dfs_batched" else 2
    checks = {"n": 0}

    def cancel_after_a_few():
        checks["n"] += 1
        return checks["n"] > 1

    eng = CrawlEngine(
        spark, pages,
        CrawlSpec(max_depth=depth, strategy=strategy, scorer=scorer,
                  batch_size=batch, should_cancel=cancel_after_a_few),
    )
    first = eng.run(U(1)).collect()
    assert len(first) > 0

    out = str(tmp_path / f"state_{strategy}")
    manifest = eng.export_state_tables(out)
    assert manifest["pending_kind"] == (
        "queue" if strategy == "best_first" else "stack"
    )
    dict_state = eng.export_state()
    table_state = CrawlEngine.resume_state_from_tables(spark, out)
    assert table_state["pending_df"].count() > 0  # something to resume

    runs = []
    for st in (dict_state, table_state):
        eng2 = CrawlEngine(
            spark, pages,
            CrawlSpec(max_depth=depth, strategy=strategy, max_pages=9,
                      scorer=scorer, batch_size=batch,
                      resume_state=st),
        )
        rows = eng2.run(U(1)).collect()
        runs.append(
            [(r["emit_seq"], r["url"], r["depth"], r["score"]) for r in rows]
        )
    assert runs[0] == runs[1]
    assert len(runs[0]) > 0
