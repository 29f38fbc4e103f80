"""plans/stats.py: the checkpoint stats-reset that keeps iterative
crawl loops out of Catalyst's BigInteger death spiral (see module
docstring of crawl4ai_spark/plans/stats.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.plans.stats import (
    STATS_RESET_THRESHOLD,
    reset_stats_if_inflated,
)


def _size(df) -> int:
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def test_reset_drops_inflated_stats_keeps_data(spark):
    # the crawl-loop pathology in miniature: each join estimates the
    # PRODUCT of its children and localCheckpoint PRESERVES it, so a
    # few checkpointed self-join iterations square the estimate past
    # any honest size
    j = spark.range(100).selectExpr("id", "id * 2 AS v").localCheckpoint()
    for _ in range(7):
        other = j.selectExpr("id", "v + 1 AS w")
        j = j.join(other, "id").select("id", F.col("w").alias("v")).localCheckpoint()
    assert _size(j) > STATS_RESET_THRESHOLD

    r = reset_stats_if_inflated(j)
    assert _size(r) <= STATS_RESET_THRESHOLD
    assert sorted(r.collect()) == sorted(j.collect())


def test_reset_noop_below_threshold(spark):
    df = spark.range(10).localCheckpoint()
    assert _size(df) <= STATS_RESET_THRESHOLD
    assert reset_stats_if_inflated(df) is df


def test_iterated_loop_stats_stay_bounded(spark):
    """The crawl-loop shape: each iteration joins the previous
    checkpoint against a derived frame and checkpoints again.  Without
    the reset the estimate squares per iteration; with it the digit
    count must stay flat."""
    cur = spark.range(50).selectExpr("id", "id AS v").localCheckpoint()
    for _ in range(12):
        other = cur.selectExpr("id", "v + 1 AS w")
        nxt = cur.join(other, "id").select("id", F.col("w").alias("v"))
        cur = reset_stats_if_inflated(nxt.localCheckpoint())
        assert len(str(_size(cur))) < 45
    assert cur.count() == 50
