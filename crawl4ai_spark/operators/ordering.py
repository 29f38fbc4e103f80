"""Distributed total-order ranking (W1-W6 at scale).

A global ``row_number().over(Window.orderBy(...))`` collapses the round
onto one partition — fine for 10-row best-first pops, an Amdahl wall
for 10^6-row BFS levels.  ``with_global_rank`` produces the EXACT same
rank with a parallel plan:

    repartitionByRange(order) → sortWithinPartitions
    → per-partition row_number (parallel)
    → + per-partition offsets (one tiny collect)

Because the order columns form a total order (the engine's seq/link
keys are unique), range boundaries only decide which partition a row
lands in; the offset correction makes the final rank identical to the
single-partition window, so parity is untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# below this row count a plain global window is cheaper than the extra
# shuffle + collect of the two-phase plan (env override: bench warm-up
# lowers it to compile the two-phase plan shape before timing)
import os

TWO_PHASE_THRESHOLD = int(
    os.environ.get("SPARK_GRAFT_TWO_PHASE_THRESHOLD", "50000")
)


def with_global_rank(
    df: DataFrame,
    order_cols: list,
    out_col: str,
    n_rows_hint: int | None = None,
    n_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """rank 1..N by ``order_cols`` (must be a total order).

    ``total_col``: optionally attach the TOTAL row count as a column —
    free in both paths (full-frame count in the single window; the
    two-phase offset sum as a literal), so callers that need the size
    don't pay a separate count job."""
    if n_rows_hint is not None and n_rows_hint < TWO_PHASE_THRESHOLD:
        w = Window.orderBy(*order_cols)
        out = df.withColumn(out_col, F.row_number().over(w))
        if total_col:
            out = out.withColumn(
                total_col,
                F.count("*").over(
                    w.rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                ),
            )
        return out

    spark = df.sparkSession
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism
    # repartitionByRange runs a SAMPLING pass before the shuffle; without
    # a cache that pass re-executes the whole upstream plan (which may
    # cross the Arrow-UDF bridge) a second time.  Persist for the
    # duration of the two passes, then release.
    src = df.persist()
    ranged = (
        src.repartitionByRange(n_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin partition ids
    )
    src.unpersist()
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    if offsets:
        offset_map = F.create_map(
            *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
        )
        offset_col = F.coalesce(offset_map[F.col("__pid")], F.lit(0))
    else:  # empty input: rank column still needs a valid expression
        offset_col = F.lit(0)
    out = ranged.withColumn(
        out_col, F.row_number().over(w) + offset_col
    ).drop("__pid")
    if total_col:
        out = out.withColumn(total_col, F.lit(acc).cast("long"))
    return out


def with_global_cumsum(
    df: DataFrame,
    order_cols: list,
    value: Column,
    out_col: str,
    n_rows_hint: int | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Running sum of ``value`` in ``order_cols`` order (inclusive)."""
    if n_rows_hint is not None and n_rows_hint < TWO_PHASE_THRESHOLD:
        w = Window.orderBy(*order_cols).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return df.withColumn(out_col, F.sum(value).over(w))

    spark = df.sparkSession
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism
    src = df.persist()  # see with_global_rank: avoid the sampling double-compute
    ranged = (
        src.repartitionByRange(n_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__v", value)
        .localCheckpoint(eager=True)
    )
    src.unpersist()
    sums = {
        r["__pid"]: r["s"] or 0
        for r in ranged.groupBy("__pid").agg(F.sum("__v").alias("s")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    w = Window.partitionBy("__pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    if offsets:
        offset_map = F.create_map(
            *[F.lit(x) for pid, off in offsets.items() for x in (pid, float(off))]
        )
        offset_col = F.coalesce(offset_map[F.col("__pid")], F.lit(0.0))
    else:
        offset_col = F.lit(0.0)
    return (
        ranged.withColumn(out_col, F.sum("__v").over(w) + offset_col)
        .drop("__pid", "__v")
    )
