"""North-rule end-to-end composition: crawl → image fetch → per-row
payload validation.

BASELINE.json's north rule frames the engine as a frontier + fetch
scheduler *over an Iceberg table of image+caption pairs* whose fetched
bytes are "validated per-row against the reference with PSNR≥40dB
decoded-pixel allclose plus exact caption equality".  The crawl engine
(operators/frontier.py) and the J8 validator (functions/images.py:166,
mirroring the reference's media extraction + scoring path,
content_scraping_strategy.py:440-467 and models.py:361-370) each exist
as operators; this module is the composed pipeline, shaped for 100 TB:

1. **bytes never ride the crawl.**  The crawl result is re-joined to
   the pages table projecting ONLY ``image_id`` (SURVEY.md §7 risk 7:
   "binary columns inflate shuffles — fetch-join should project bytes
   only for the current round's rows (semi-join first)").
2. **each unique image decodes once.**  Crawled pages → distinct
   image_id → semi-join into the image table → validate.  A 10^10-page
   crawl references images many-to-one (hot logos/thumbnails dominate);
   decoding per page row would multiply Arrow-batch work by the reuse
   factor.  Verdicts are joined back to page rows afterwards — Catalyst
   broadcasts the verdict side automatically when it is small.
3. **validation is executor-side Arrow batches** (mapInPandas inside
   validate_images) over the pruned (image_id, bytes, dims, caption)
   projection — the only Python crossing in the pipeline.

Plan shape at scale: two shuffles (result⋈pages on url — both sides
hash-partitioned by url, the corpus side pre-partitioned once by the
engine; distinct on image_id) plus one bucketable equi-join into the
image table; on an Iceberg deployment the image table would be
bucketed by image_id, making the fetch join shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.functions.images import validate_images


def crawl_image_ids(results: DataFrame, pages: DataFrame) -> DataFrame:
    """(url, emit_seq, image_id) for every successfully crawled page.

    ``results`` is CrawlEngine output (RESULT_SCHEMA); ``pages`` is the
    corpus with an ``image_id`` column.  Only the two join columns of
    ``pages`` are read (column pruning reaches the scan), and bytes are
    not touched at all."""
    return (
        results.where(F.col("success"))
        .select("url", "emit_seq")
        .join(pages.select("url", "image_id"), "url")
    )


def validated_crawl(
    results: DataFrame,
    pages: DataFrame,
    images: DataFrame,
    reference: DataFrame,
    min_psnr_db: float = 40.0,
    seed: int = 42,
) -> DataFrame:
    """Per crawled page: the north-rule invariant verdict for its image.

    Returns (url, emit_seq, image_id, psnr_db, pixels_ok, caption_ok,
    phash_match) — one row per successful crawl emit.  Each distinct
    image is fetched (bytes projected via semi-join) and decoded exactly
    once; verdicts fan back out to page rows through an equi-join."""
    page_imgs = crawl_image_ids(results, pages)
    wanted = page_imgs.select("image_id").distinct()
    fetched = images.join(wanted, "image_id")  # bytes only for crawled imgs
    verdicts = validate_images(fetched, reference, min_psnr_db, seed)
    return page_imgs.join(verdicts, "image_id").select(
        "url", "emit_seq", "image_id",
        "psnr_db", "pixels_ok", "caption_ok", "phash_match",
    )


def validation_metrics(validated: DataFrame) -> DataFrame:
    """One-row crawl-level rollup of the invariant (the per-round
    fetch/dedup metrics' payload-side sibling): pages validated, unique
    images decoded, pass counts, and the worst PSNR seen."""
    return validated.agg(
        F.count("*").alias("pages_validated"),
        F.countDistinct("image_id").alias("unique_images"),
        F.sum(F.col("pixels_ok").cast("long")).alias("pixels_ok_pages"),
        F.sum(F.col("caption_ok").cast("long")).alias("caption_ok_pages"),
        F.sum(F.col("phash_match").cast("long")).alias("phash_match_pages"),
        F.min("psnr_db").alias("min_psnr_db"),
    )
