"""Partitioned cuckoo-filter segments (seen_cuckoo.py): no false
negatives, bounded false positives, DELETION (the capability bloom
lacks), stash overflow safety, order-independent bytes, and engine
equivalence (cuckoo seen store == exact store)."""

from pyspark.sql import functions as F

from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.operators.seen_cuckoo import CuckooSegments, CuckooSeenStore
from crawl4ai_spark.sources import corpus


def _urls(spark, lo, hi, prefix="https://x.com/p/"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("url")
    )


def test_no_false_negatives_and_bounded_fp(spark):
    urls = _urls(spark, 0, 2000)
    ck = CuckooSegments(spark, n_segments=8, capacity_per_segment=1024)
    ck.add(urls)
    assert ck.probe(urls, "url").filter(~F.col("maybe_seen")).count() == 0
    # 16-bit fingerprints: fp rate ~ 2b/2^16 ≈ 0.012%; allow slack
    fresh = _urls(spark, 10_000, 14_000)
    fp = ck.probe(fresh, "url").filter(F.col("maybe_seen")).count()
    assert fp / 4000 < 0.01
    assert ck.count_items() == 2000


def test_incremental_merge(spark):
    ck = CuckooSegments(spark, n_segments=4, capacity_per_segment=2048)
    ck.add(_urls(spark, 0, 500, "https://a.com/"))
    ck.add(_urls(spark, 500, 1000, "https://a.com/"))
    both = _urls(spark, 0, 1000, "https://a.com/")
    assert ck.probe(both, "url").filter(~F.col("maybe_seen")).count() == 0
    assert ck.count_items() == 1000


def test_delete_forgets_only_deleted(spark):
    ck = CuckooSegments(spark, n_segments=4, capacity_per_segment=2048)
    ck.add(_urls(spark, 0, 1000))
    ck.delete(_urls(spark, 0, 500))
    # kept urls: still no false negatives
    kept = _urls(spark, 500, 1000)
    assert ck.probe(kept, "url").filter(~F.col("maybe_seen")).count() == 0
    # deleted urls: gone except rare same-fp collisions with kept items
    gone = _urls(spark, 0, 500)
    still = ck.probe(gone, "url").filter(F.col("maybe_seen")).count()
    assert still / 500 < 0.01
    assert ck.count_items() == 500


def test_stash_overflow_keeps_membership_exact(spark):
    # capacity 16 (nb*b tiny) forces kicking failures into the stash
    ck = CuckooSegments(spark, n_segments=1, capacity_per_segment=16, max_kicks=8)
    urls = _urls(spark, 0, 300)
    ck.add(urls)
    assert ck.probe(urls, "url").filter(~F.col("maybe_seen")).count() == 0
    row = ck.segments.collect()[0]
    assert len(row["stash"]) > 0  # the valve actually engaged
    assert ck.count_items() == 300
    # stashed fingerprints are deletable too
    ck.delete(urls)
    assert ck.count_items() == 0


def test_bytes_independent_of_insertion_order(spark):
    fwd = _urls(spark, 0, 400)
    rev = fwd.orderBy(F.desc("url")).repartition(7)
    a = CuckooSegments(spark, n_segments=2, capacity_per_segment=1024)
    b = CuckooSegments(spark, n_segments=2, capacity_per_segment=1024)
    a.add(fwd)
    b.add(rev)
    rows_a = {r["seg"]: (r["table"], r["stash"]) for r in a.segments.collect()}
    rows_b = {r["seg"]: (r["table"], r["stash"]) for r in b.segments.collect()}
    assert rows_a == rows_b


def test_seen_store_anti_join_matches_exact(spark):
    from crawl4ai_spark.operators.seen import SeenStore

    seen_urls = _urls(spark, 0, 300)
    cands = _urls(spark, 150, 450)
    ck = CuckooSeenStore(spark, n_segments=4, capacity_per_segment=1024)
    ex = SeenStore(spark)
    ck.add(seen_urls)
    ex.add(seen_urls)
    got = sorted(r["url"] for r in ck.anti_join(cands, "url").collect())
    want = sorted(r["url"] for r in ex.anti_join(cands, "url").collect())
    assert got == want  # exact confirm kills the (rare) cuckoo fp


def test_remove_reopens_urls_for_recrawl(spark):
    ck = CuckooSeenStore(spark, n_segments=4, capacity_per_segment=1024)
    ck.add(_urls(spark, 0, 100))
    ck.remove(_urls(spark, 0, 50))  # TTL expiry: forget the first 50
    survivors = ck.anti_join(_urls(spark, 0, 100), "url")
    got = sorted(int(r["url"].rsplit("/", 1)[1]) for r in survivors.collect())
    assert got == list(range(50))
    assert ck.contains_count() == 50


def test_remove_ignores_absent_and_duplicate_urls(spark):
    """Cuckoo deletion of an absent url can strip a colliding stored
    fingerprint; the store must guard by semi-joining the request
    against the exact set and de-duplicating it."""
    ck = CuckooSeenStore(spark, n_segments=4, capacity_per_segment=1024)
    ck.add(_urls(spark, 0, 200))
    # half the request was never added, and every url appears twice
    req = _urls(spark, 100, 300).unionByName(_urls(spark, 100, 300))
    ck.remove(req)
    survivors = ck.anti_join(_urls(spark, 0, 300), "url")
    got = sorted(int(r["url"].rsplit("/", 1)[1]) for r in survivors.collect())
    assert got == list(range(100, 300))
    assert ck.contains_count() == 100
    # filter-level: every kept url still probes maybe_seen (no stored
    # fingerprint was stripped by the absent/duplicate requests)
    kept = _urls(spark, 0, 100)
    assert ck.cuckoo.probe(kept, "url").filter(~F.col("maybe_seen")).count() == 0
    assert ck.cuckoo.count_items() == 100


def test_engine_cuckoo_mode_matches_exact_mode(spark):
    pages = corpus.build_pages(spark, 80)
    seed = corpus.py_canonical_url(1)

    def run(mode):
        eng = CrawlEngine(
            spark, pages,
            CrawlSpec(max_depth=2, strategy="bfs", seen_mode=mode),
        )
        res = eng.run(seed).orderBy("emit_seq").collect()
        return [(r["url"], r["depth"], r["parent_url"]) for r in res]

    assert run("cuckoo") == run("exact")


def test_add_dedupes_within_batch(spark):
    """Duplicate urls within one add() batch must store ONE fingerprint
    copy (n_items exact), and one delete() must fully forget them —
    the ADVICE-r3 silent-miscount fix."""
    ck = CuckooSegments(spark, n_segments=4, capacity_per_segment=1024)
    tripled = (
        _urls(spark, 0, 100)
        .unionByName(_urls(spark, 0, 100))
        .unionByName(_urls(spark, 0, 100))
    )
    ck.add(tripled)
    assert ck.count_items() == 100
    ck.delete(_urls(spark, 0, 100))
    assert ck.count_items() == 0
    still = ck.probe(_urls(spark, 0, 100), "url").filter(F.col("maybe_seen")).count()
    assert still == 0


def test_seen_store_public_remove_and_replace(spark):
    from crawl4ai_spark.operators.seen import SeenStore

    ex = SeenStore(spark)
    ex.add(_urls(spark, 0, 100))
    ex.remove(_urls(spark, 0, 40))
    assert ex.contains_count() == 60
    ex.replace(_urls(spark, 0, 10))
    assert ex.contains_count() == 10
    assert ex.anti_join(_urls(spark, 0, 20), "url").count() == 10
