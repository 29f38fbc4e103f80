"""Physical-plan pins for the fetch join (frontier._fetch).

The strict/batched pop regime (n_rows_hint ≤ BROADCAST_FETCH_MAX_ROWS)
must take the broadcast-probe plan: the only BroadcastExchanges are the
tiny frontier-key / page-hit sides — the corpus side is NEVER broadcast
and NEVER sorted.  Without the hint Catalyst is free to pick, which at
small scale broadcast the whole corpus each round and at large scale
re-sorted the cached corpus — the regressions these pins guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.sources import corpus


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mk(spark, n_pages=20_000):
    pages = CrawlEngine.prepare_pages(corpus.build_pages(spark, n_pages))
    pages.count()
    eng = CrawlEngine(spark, pages, CrawlSpec(max_depth=2))
    frontier = spark.createDataFrame(
        [(corpus.py_canonical_url(i), i) for i in range(10)],
        "url string, pop_rn long",
    ).localCheckpoint(eager=True)
    return eng, frontier


def test_small_frontier_fetch_never_broadcasts_or_sorts_corpus(spark):
    eng, frontier = _mk(spark)
    plan = _plan(eng._fetch(frontier, n_rows_hint=10))
    # The corpus flows through the inner probe BEFORE anything is
    # broadcast — only the ≤ n_rows_hint surviving page rows enter a
    # BroadcastExchange.  Pin: no BroadcastExchange sits DIRECTLY on
    # the corpus scan (which is what Catalyst picked unhinted at small
    # SF), modulo an interposed isnotnull Filter.
    lines = [l for l in plan.splitlines() if l.strip()]
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        nxt = lines[i + 1: i + 3]
        # direct child being the corpus scan (possibly behind its
        # isnotnull Filter) = whole-corpus broadcast — the regression
        assert "InMemoryTableScan" not in nxt[0], f"corpus broadcast:\n{plan}"
        if "Filter" in nxt[0] and len(nxt) > 1:
            assert "InMemoryTableScan" not in nxt[1], f"corpus broadcast:\n{plan}"
    # and the corpus is never sort-merge-joined (no per-round sort)
    assert "SortMergeJoin" not in plan, plan
    # the inner probe against the corpus scan is present
    assert plan.count("BroadcastHashJoin") == 2, plan


def test_small_frontier_fetch_matches_legacy_values(spark):
    eng, frontier = _mk(spark, n_pages=5_000)
    fast = eng._fetch(frontier, n_rows_hint=10).orderBy("pop_rn").collect()
    legacy = eng._fetch(frontier, n_rows_hint=None).orderBy("pop_rn").collect()
    key = lambda r: (r["url"], r["success"], r["status_code"], r["links"])
    assert [key(r) for r in fast] == [key(r) for r in legacy]


def test_unreachable_urls_surface_as_failures(spark):
    eng, _ = _mk(spark, n_pages=1_000)
    frontier = spark.createDataFrame(
        [("https://nowhere.example.com/missing", 1),
         (corpus.py_canonical_url(1), 2)],
        "url string, pop_rn long",
    )
    rows = {r["url"]: r for r in eng._fetch(frontier, n_rows_hint=2).collect()}
    missing = rows["https://nowhere.example.com/missing"]
    assert missing["success"] is False and missing["status_code"] == 0
    assert rows[corpus.py_canonical_url(1)]["success"] is True
