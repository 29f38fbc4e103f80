"""A6+ Adaptive ``EmbeddingStrategy`` — semantic-space coverage as
DataFrame programs.

Reference: ``EmbeddingStrategy`` (/root/reference/crawl4ai/
adaptive_crawler.py:615-1100).  Semantics replicated:

- KB dedup: an incoming document whose cosine similarity to the
  existing knowledge base is ≥ ``kb_similarity_threshold`` (0.95,
  :631) adds no information and is dropped.
- ``find_coverage_gaps`` (:841-869): per query variation, the gap is
  the MINIMUM cosine distance to any KB document (1.0 when the KB is
  empty).
- Confidence / learning score (:1040-1100 math): per query,
  ``nearest_weight·exp(-k_exp·min_dist) + top_k_weight·mean(exp(-k_exp
  ·d) for the top-3 distances)``; the learning score is the mean over
  queries.  Defaults k_exp=1.0, nearest 0.7, top-k 0.3 (AdaptiveConfig
  :196-226).
- ``select_links_for_expansion`` (:871-960): a link's value is the
  averaged scaled improvement (2×(gap−new_dist)) over gaps still
  outside ``coverage_radius`` (0.2, :192).
- Validation: held-out query variations score the same way; stopping
  requires the validation score too (:218-219) — driver-side policy in
  ``should_stop``.

Spark shapes: gaps/confidence are one broadcast-join of the (small)
query-variation table against the KB scan + a per-query top-k — the
``brute_force_knn_join`` shape; at 10^10 KB rows swap in
``lsh_knn_join`` (same output schema).  Link selection joins the
candidate links against the gap table (tiny — one row per query
variation) — broadcast, no shuffle of the link side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawl4ai_spark.functions.similarity import cosine


def kb_dedup(
    new_docs: DataFrame,
    kb: DataFrame | None,
    vec_col: str = "embedding",
    key_col: str = "doc_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Drop incoming docs that duplicate the existing KB (max cosine ≥
    threshold) — adaptive_crawler.py:631 semantics.  One broadcast of
    the incoming batch (bounded by the round size) against the KB scan."""
    if kb is None:
        return new_docs
    kbv = kb.select(F.col(vec_col).cast("array<double>").alias("__kbv"))
    scored = new_docs.crossJoin(kbv).groupBy(key_col).agg(
        F.max(
            cosine(F.col(vec_col).cast("array<double>"), F.col("__kbv"))
        ).alias("__max_sim")
    )
    keep = scored.filter(F.col("__max_sim") < threshold).select(key_col)
    return new_docs.join(keep, key_col, "left_semi")


def coverage_gaps(
    queries: DataFrame,
    kb: DataFrame | None,
    vec_col: str = "embedding",
    query_key_col: str = "query_id",
    top_k: int = 3,
) -> DataFrame:
    """(query_id, gap, top_dists): gap = min cosine DISTANCE to the KB,
    ``top_dists`` = the ``top_k`` smallest distances (for the hybrid
    confidence).  Empty KB ⇒ gap 1.0 (reference :847-851)."""
    if kb is None or len(kb.take(1)) == 0:
        return queries.select(
            query_key_col,
            F.lit(1.0).alias("gap"),
            F.array(F.lit(1.0)).alias("top_dists"),
        )
    q = queries.select(
        F.col(query_key_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    kbv = kb.select(F.col(vec_col).cast("array<double>").alias("__kv"))
    dist = (F.lit(1.0) - cosine(F.col("__kv"), F.col("__qv"))).alias("dist")
    scored = kbv.crossJoin(F.broadcast(q)).select(query_key_col, dist)
    w = Window.partitionBy(query_key_col).orderBy(F.asc("dist"))
    topk = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_k)
    )
    return topk.groupBy(query_key_col).agg(
        F.min("dist").alias("gap"),
        F.sort_array(F.collect_list("dist")).alias("top_dists"),
    )


def embedding_confidence(
    gaps: DataFrame,
    k_exp: float = 1.0,
    nearest_weight: float = 0.7,
    top_k_weight: float = 0.3,
) -> DataFrame:
    """Per-query hybrid score + the corpus learning score (one row:
    ``learning_score``) — the reference's exp-decay hybrid
    (adaptive_crawler.py:1040-1100, AdaptiveConfig :196-226)."""
    nearest = F.exp(-F.lit(k_exp) * F.col("gap"))
    topk_avg = F.aggregate(
        F.col("top_dists"),
        F.lit(0.0),
        lambda acc, d: acc + F.exp(-F.lit(k_exp) * d),
    ) / F.greatest(F.size("top_dists"), F.lit(1))
    per_query = gaps.select(
        "query_id",
        (F.lit(nearest_weight) * nearest + F.lit(top_k_weight) * topk_avg).alias(
            "query_score"
        ),
    )
    return per_query


def learning_score(per_query: DataFrame) -> float:
    """Mean hybrid score over query variations (driver scalar — one
    tiny agg; the stopping decision is a driver policy)."""
    row = per_query.agg(F.avg("query_score").alias("s")).collect()[0]
    return float(row["s"] or 0.0)


def select_links_for_gaps(
    links: DataFrame,
    gaps: DataFrame,
    coverage_radius: float = 0.2,
    vec_col: str = "embedding",
    key_col: str = "href",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Score candidate links by how much they shrink uncovered gaps
    (adaptive_crawler.py:930-956): for every gap with distance >
    radius, a link improving it contributes 2×(gap − new_dist); the
    link score is total improvement / number of gaps needing help.

    ``gaps`` must carry the query vectors: (query_id, gap, embedding).
    """
    needing = gaps.filter(F.col("gap") > coverage_radius).select(
        "query_id",
        F.col("gap").alias("__gap"),
        F.col(query_vec_col).cast("array<double>").alias("__gv"),
    )
    n_needing = needing.count()
    if n_needing == 0:
        return links.select(key_col, F.lit(0.0).alias("gap_score"))
    lv = links.select(
        F.col(key_col), F.col(vec_col).cast("array<double>").alias("__lv")
    )
    joined = lv.crossJoin(F.broadcast(needing))
    new_dist = F.lit(1.0) - cosine(F.col("__lv"), F.col("__gv"))
    improvement = F.when(
        new_dist < F.col("__gap"), (F.col("__gap") - new_dist) * 2.0
    ).otherwise(F.lit(0.0))
    return joined.groupBy(key_col).agg(
        (F.sum(improvement) / F.lit(float(n_needing))).alias("gap_score")
    )


def should_stop(
    score_now: float,
    score_prev: float | None,
    validation_score: float,
    confidence_threshold: float = 0.7,
    min_gain_fraction: float = 0.1,
    validation_min_score: float = 0.3,
) -> bool:
    """Reference stopping policy (AdaptiveConfig :210-219): stop when
    the learning score clears the threshold, OR it has converged (gain
    below min_gain_fraction×score) AND the held-out validation score is
    trustworthy."""
    if score_now >= confidence_threshold:
        return True
    if score_prev is None:
        return False
    converged = (score_now - score_prev) < min_gain_fraction * max(score_now, 1e-9)
    return converged and validation_score >= validation_min_score
