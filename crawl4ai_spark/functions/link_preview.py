"""The composed link-preview operator (reference link_preview.py, 410
LoC): per-page link filtering → head-data join → contextual BM25 vs a
query → total-score wiring → relevance sort.

Reference semantics replicated (file:line into /root/reference/crawl4ai):

- ``_filter_links`` (link_preview.py:112-175): internal links (+
  external if configured), include glob patterns (any), exclude glob
  patterns (none), TRUNCATE to max_links FIRST, then dedupe preserving
  order — the truncate-before-dedupe order is a reference quirk kept
  as-is.
- head extraction (:177-274) = join against the head table on href
  (fetch-as-join, like S6 head peek); missing heads keep the link with
  head_status='missing' and no contextual score.
- ``_merge_head_data`` (:276-406): contextual_score = the seeder's BM25
  relevance of the query vs the weighted head document;
  total_score = calculate_total_score(intrinsic, contextual,
  score_links_enabled, query_provided) (utils.py:3459-3504 — C8);
  links sorted by relevance desc when any relevance exists, missing
  relevance sorts as 0.0, ties keep discovery order (stable).

Everything is JVM Column math over one explode + two windows + one
join; the only Python crossing is none at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawl4ai_spark.functions.head_filters import build_head_document
from crawl4ai_spark.functions.link_scores import total_score
from crawl4ai_spark.sources.seeder import head_bm25
from crawl4ai_spark.sources.sitemap import glob_to_regex


def link_preview(
    results: DataFrame,
    heads: DataFrame,
    query: str | None = None,
    include_internal: bool = True,
    include_external: bool = False,
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
    max_links: int = 10,
    score_links: bool = True,
    url_col: str = "url",
    links_col: str = "links",
) -> DataFrame:
    """Per-link preview rows for every page in ``results``.

    ``results``: (url, links array<struct<href, is_external, ...>>).
    ``heads``: (url, title, description, keywords) — the head corpus.

    Returns (src_url, link_rank, href, is_external, head_status,
    contextual_score, total_score): ``link_rank`` is the final
    within-page order (relevance-sorted when a query is given).
    """
    linked = results.select(
        F.col(url_col).alias("src_url"),
        F.posexplode(F.col(links_col)).alias("link_idx", "link"),
    ).select(
        "src_url",
        "link_idx",
        F.col("link.href").alias("href"),
        F.col("link.is_external").alias("is_external"),
    ).filter(F.col("href").isNotNull())

    allowed = F.lit(False)
    if include_internal:
        allowed = allowed | ~F.col("is_external")
    if include_external:
        allowed = allowed | F.col("is_external")
    linked = linked.filter(allowed)
    if include_patterns:
        match_any = F.lit(False)
        for p in include_patterns:
            match_any = match_any | F.col("href").rlike(glob_to_regex(p))
        linked = linked.filter(match_any)
    if exclude_patterns:
        match_none = F.lit(True)
        for p in exclude_patterns:
            match_none = match_none & ~F.col("href").rlike(glob_to_regex(p))
        linked = linked.filter(match_none)

    # truncate FIRST (reference :157-162), dedupe-preserving-order
    # SECOND (:164-170)
    w_page = Window.partitionBy("src_url").orderBy("link_idx")
    if max_links > 0:
        linked = (
            linked.withColumn("__rn", F.row_number().over(w_page))
            .filter(F.col("__rn") <= max_links)
            .drop("__rn")
        )
    w_first = Window.partitionBy("src_url", "href").orderBy("link_idx")
    linked = (
        linked.withColumn("__fk", F.row_number().over(w_first))
        .filter(F.col("__fk") == 1)
        .drop("__fk")
    )

    head_side = heads.select(
        F.col("url").alias("href"),
        F.col("title").alias("__title"),
        F.col("description").alias("__desc"),
        F.col("keywords").alias("__kw"),
    )
    joined = linked.join(head_side, "href", "left")
    has_head = F.col("__title").isNotNull() | F.col("__desc").isNotNull()

    if query:
        doc = build_head_document(
            F.coalesce(F.col("__title"), F.lit("")),
            F.coalesce(F.col("__desc"), F.lit("")),
            F.coalesce(F.col("__kw"), F.lit("")),
            [],
        )
        contextual = F.when(has_head, head_bm25(doc, query))
    else:
        contextual = F.lit(None).cast("double")
    joined = joined.withColumn("contextual_score", contextual)
    # the engine's link structs carry no text/title/class attributes, so
    # intrinsic scoring (C7) plugs in upstream when available; absent ⇒
    # None, and calculate_total_score handles the missing-arm exactly
    intrinsic = F.lit(None).cast("double")
    joined = joined.withColumn(
        "total_score",
        total_score(
            intrinsic,
            F.col("contextual_score"),
            score_links_enabled=score_links,
            query_provided=bool(query),
        ),
    )

    rel = F.coalesce(F.col("contextual_score"), F.lit(0.0))
    w_rank = Window.partitionBy("src_url").orderBy(
        F.desc("__rel"), F.asc("link_idx")
    )
    return (
        joined.withColumn("__rel", rel)
        .withColumn("link_rank", F.row_number().over(w_rank))
        .select(
            "src_url",
            "link_rank",
            "href",
            "is_external",
            F.when(has_head, F.lit("valid")).otherwise(F.lit("missing")).alias(
                "head_status"
            ),
            "contextual_score",
            "total_score",
        )
    )
