"""Cooperative cancellation, mirroring the reference invariants
(tests/deep_crawling/test_deep_crawl_cancellation.py): should_cancel
callback stops the crawl, `cancelled` reflects state, callback errors
fail open, exported state carries cancelled=True, and a cancelled crawl
resumes to completion."""

from __future__ import annotations

import pytest

from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.sources import corpus

START = "https://d1.example.com/docs/2016/doc-1.pdf"
N = 60


def _run(spark, **spec_kw):
    pages = corpus.build_pages(spark, N)
    eng = CrawlEngine(spark, pages, CrawlSpec(**spec_kw))
    rows = eng.run(START).collect()
    return eng, rows


def test_should_cancel_stops_crawl(spark):
    calls = {"n": 0}

    def cancel_after_first_check(**_):
        calls["n"] += 1
        return calls["n"] > 1  # first round runs, second is cancelled

    eng, rows = _run(
        spark, max_depth=3, strategy="bfs", should_cancel=cancel_after_first_check
    )
    full_eng, full_rows = _run(spark, max_depth=3, strategy="bfs")
    assert eng.cancelled is True
    assert 0 < len(rows) < len(full_rows)
    assert full_eng.cancelled is False


def test_cancel_method_and_property(spark):
    pages = corpus.build_pages(spark, N)
    eng = CrawlEngine(spark, pages, CrawlSpec(max_depth=2))
    assert eng.cancelled is False
    eng.cancel()
    assert eng.cancelled is True
    rows = eng.run(START).collect()
    assert rows == []  # cancelled before round 0


def test_failing_callback_fails_open(spark):
    def broken():
        raise RuntimeError("boom")

    eng, rows = _run(spark, max_depth=2, strategy="bfs", should_cancel=broken)
    full_eng, full_rows = _run(spark, max_depth=2, strategy="bfs")
    assert eng.cancelled is False
    assert len(rows) == len(full_rows)


def test_state_includes_cancelled_flag(spark):
    stop = {"flag": False}

    def cb():
        return stop["flag"]

    pages = corpus.build_pages(spark, N)
    eng = CrawlEngine(
        spark, pages, CrawlSpec(max_depth=3, strategy="bfs", should_cancel=cb)
    )
    stop["flag"] = True
    eng.run(START)
    state = eng.export_state()
    assert state["cancelled"] is True


@pytest.mark.parametrize("strategy", ["bfs", "dfs", "best_first"])
def test_resume_after_cancel_completes(spark, strategy):
    calls = {"n": 0}

    def cancel_mid(**_):
        calls["n"] += 1
        return calls["n"] > 2

    pages = corpus.build_pages(spark, N)
    eng1 = CrawlEngine(
        spark,
        pages,
        CrawlSpec(max_depth=2, strategy=strategy, should_cancel=cancel_mid),
    )
    part1 = eng1.run(START).collect()
    assert eng1.cancelled is True
    state = eng1.export_state()
    assert state["cancelled"] is True

    state["cancelled"] = False  # reference resets the event on resume
    eng2 = CrawlEngine(
        spark,
        pages,
        CrawlSpec(max_depth=2, strategy=strategy, resume_state=state),
    )
    # resume_state supplies the pending frontier/stack/queue; the seed
    # argument is ignored in resume mode
    part2 = eng2.run(START).collect()

    full = CrawlEngine(spark, pages, CrawlSpec(max_depth=2, strategy=strategy))
    full_rows = full.run(START).collect()

    # no URL crawled twice across the two halves, and the union reaches
    # every URL the uncancelled crawl reaches
    seen1 = {r["url"] for r in part1}
    seen2 = {r["url"] for r in part2}
    assert not (seen1 & seen2)
    assert seen1 | seen2 == {r["url"] for r in full_rows}
