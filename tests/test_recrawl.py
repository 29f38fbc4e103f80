"""TTL expiry + re-crawl composition (operators/recrawl.py): the
cuckoo store forgets exactly the stale urls and the injected-store
re-crawl fetches exactly the open subgraph."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.operators.recrawl import expire_and_recrawl, stale_urls
from crawl4ai_spark.sources import corpus

N = 120
SEED_ID = 1
B = corpus.DEFAULT_BRANCHING


def _success(i):
    return i % 13 != 0 and i % 17 != 0 and i % 19 != 0


def _stale(i):
    return (i + 6) % 10 < 3


def _open_reach(max_depth=2):
    """Python mirror of the re-crawl: BFS from the seed where a child
    passes the post-remove seen anti-join iff stale or the seed."""
    emitted = {}  # id -> min depth (seed quirk: separate entry not needed
    frontier = [(SEED_ID, 0)]
    emitted[SEED_ID] = 0
    seen2 = set()  # urls re-added during the re-crawl
    quirk_emitted = None
    depth = 0
    while frontier and depth < max_depth:
        nxt = []
        for i, d in frontier:
            if not _success(i):
                continue
            for j in range(1, B + 1):
                c = (i * B + j) % N
                if c in seen2:
                    continue
                if c == SEED_ID and quirk_emitted is None:
                    quirk_emitted = d + 1
                    seen2.add(c)
                    nxt.append((c, d + 1))
                elif _stale(c) and c not in seen2 and c not in emitted:
                    seen2.add(c)
                    emitted[c] = d + 1
                    nxt.append((c, d + 1))
        frontier = nxt
        depth += 1
    rows = {(i, d) for i, d in emitted.items()}
    if quirk_emitted is not None:
        rows.add((SEED_ID, quirk_emitted))
    return rows


def test_ttl_recrawl_fetches_exactly_open_subgraph(spark):
    pages = corpus.build_pages(spark, N)
    seed = corpus.py_canonical_url(SEED_ID)
    eng1 = CrawlEngine(
        spark, pages, CrawlSpec(max_depth=2, strategy="bfs", seen_mode="cuckoo")
    )
    res1 = eng1.run(seed)
    store = eng1.seen_store
    n_before = store.contains_count()

    did = F.regexp_extract("url", r"doc-(\d+)", 1).cast("long")
    log = res1.select("url", (((did + 6) % 10) * 86400).alias("fetched_at"))
    expired = stale_urls(log, now_epoch=9 * 86400 + 43200, ttl_seconds=7 * 86400)
    n_expired_in_store = (
        expired.dropDuplicates(["url"])
        .join(store.df.select("url"), "url", "left_semi")
        .count()
    )

    res2 = expire_and_recrawl(
        store, expired, pages, CrawlSpec(max_depth=2, strategy="bfs"), seed
    )
    got = {
        (int(r["url"].rsplit("doc-", 1)[1].split(".")[0]), int(r["depth"]))
        for r in res2.collect()
    }
    assert got == _open_reach()
    # the re-crawl re-added every url it emitted except the seed, so the
    # store ends where it started minus expired urls never re-reached
    n_after = store.contains_count()
    reemitted = {i for i, d in got if i != SEED_ID}
    assert n_after == n_before - n_expired_in_store + len(reemitted)


def test_stale_urls_filter(spark):
    log = spark.createDataFrame(
        [("a", 0), ("b", 200_000), ("c", 1_000_000)], "url string, fetched_at long"
    )
    got = sorted(r["url"] for r in stale_urls(log, 1_000_000, 500_000).collect())
    assert got == ["a", "b"]


def test_seen_store_injection_bfs_only(spark):
    from crawl4ai_spark.operators.seen_cuckoo import CuckooSeenStore

    pages = corpus.build_pages(spark, 30)
    spec = CrawlSpec(
        max_depth=1, strategy="dfs", seen_store=CuckooSeenStore(spark)
    )
    with pytest.raises(ValueError, match="BFS only"):
        CrawlEngine(spark, pages, spec).run(corpus.py_canonical_url(1))
