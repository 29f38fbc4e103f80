"""Plan-statistics hygiene for iterative DataFrame loops.

``Dataset.localCheckpoint`` truncates RDD lineage but PRESERVES the
logical plan's estimated statistics (Spark captures them into the
resulting ``LogicalRDD`` so join-strategy decisions survive the
checkpoint).  In an iterative crawl loop that estimate compounds:
``SizeInBytesOnlyStatsPlanVisitor`` scores most joins as the PRODUCT
of their children's sizeInBytes, each round's checkpoint feeds the
next round's joins, and the BigInt's digit count doubles per round —
size(r) ≈ size(r-1)², because both the queue side and the seen side
descend from the previous round's checkpoint.  By round ~18 the
estimate is a million-digit BigInteger and Catalyst spends MINUTES in
``BigInteger.multiply`` (Karatsuba/Toom-Cook) per plan, on the driver,
single-threaded.  (Measured here: 236 digits → 7,706 digits in 12
checkpoints; jstack showed 12½ minutes of CPU inside
``statsEstimation.SizeInBytesOnlyStatsPlanVisitor.visitJoin`` →
``BigInteger.multiplyToomCook3``.)

``reset_stats_if_inflated`` cuts the feedback loop: when a
checkpointed frame's estimate exceeds ``threshold`` (any honest size
is far below it), the DataFrame is rebuilt over the SAME materialized
RDD via ``internalCreateDataFrame`` — a fresh ``LogicalRDD`` whose
stats fall back to ``spark.sql.defaultSizeInBytes`` (a constant).  No
data moves, no job runs; only the bogus estimate is dropped.  The cost
is that Spark also forgets checkpoint-preserved output partitioning,
so callers whose downstream plan RELIES on that partitioning (the BFS
bucket-aligned rank window) must opt out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# 2^127 bytes.  Real sizes are < 2^60; estimate-products of a few
# checkpointed parts stay < 2^127 once resets are in force, so in the
# steady state at most every other checkpoint actually resets.
STATS_RESET_THRESHOLD = 1 << 127


def reset_stats_if_inflated(
    df: DataFrame, threshold: int = STATS_RESET_THRESHOLD
) -> DataFrame:
    """Drop the plan-stats estimate of ``df`` (already checkpointed)
    when it exceeds ``threshold``; return ``df`` unchanged otherwise."""
    jdf = df._jdf
    try:
        size = int(jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except ValueError:
        # py4j refuses to convert the BigInteger: > 4300 digits — the
        # estimate is definitely inflated
        size = None
    except Exception:
        return df  # stats unreadable — leave the frame alone
    if size is not None and size <= threshold:
        return df
    spark = df.sparkSession
    jdf2 = spark._jsparkSession.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    return DataFrame(jdf2, spark)
