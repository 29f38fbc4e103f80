"""End-to-end north-rule composition: BFS crawl over the pages table →
image fetch (bytes projected only for crawled pages) → per-row PSNR +
caption validation (operators/image_crawl.py)."""

from pyspark.sql import functions as F

from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.operators.image_crawl import (
    crawl_image_ids,
    validated_crawl,
    validation_metrics,
)
from crawl4ai_spark.sources import corpus
from crawl4ai_spark.sources.images import build_images, reference_table


def _crawl(spark, n=120, depth=2):
    pages = corpus.build_pages(spark, n)
    eng = CrawlEngine(spark, pages, CrawlSpec(max_depth=depth, strategy="bfs"))
    res = eng.run(corpus.py_canonical_url(1))  # doc 0 is a failure row
    return pages, res


def test_crawl_image_ids_matches_successes(spark):
    pages, res = _crawl(spark)
    got = crawl_image_ids(res, pages)
    n_success = res.where("success").count()
    assert got.count() == n_success
    # every crawled page's image_id agrees with the corpus row
    joined = got.join(
        pages.select("url", F.col("image_id").alias("want")), "url"
    )
    assert joined.where(F.col("image_id") != F.col("want")).count() == 0


def test_validated_crawl_invariant_holds(spark):
    pages, res = _crawl(spark)
    images = build_images(spark, 499)
    ref = reference_table(spark, 499)
    v = validated_crawl(res, pages, images, ref)
    rows = v.collect()
    assert len(rows) == res.where("success").count() > 0
    assert all(r["pixels_ok"] and r["caption_ok"] and r["phash_match"] for r in rows)
    lossy = [r for r in rows if r["psnr_db"] < 999.0]
    assert all(r["psnr_db"] >= 40.0 for r in lossy)


def test_validated_crawl_decodes_each_image_once(spark):
    pages, res = _crawl(spark)
    images = build_images(spark, 499)
    ref = reference_table(spark, 499)
    page_imgs = crawl_image_ids(res, pages)
    n_unique = page_imgs.select("image_id").distinct().count()
    # the validator's input is the semi-joined distinct set: its output
    # (one verdict per decoded image) must have exactly n_unique rows
    from crawl4ai_spark.functions.images import validate_images

    wanted = page_imgs.select("image_id").distinct()
    verdicts = validate_images(images.join(wanted, "image_id"), ref)
    assert verdicts.count() == n_unique
    # and fan-out restores one row per page
    m = validation_metrics(validated_crawl(res, pages, images, ref)).collect()[0]
    assert m["pages_validated"] == res.where("success").count()
    assert m["unique_images"] == n_unique
    assert m["pixels_ok_pages"] == m["pages_validated"]
    assert m["min_psnr_db"] >= 40.0


def test_validated_crawl_flags_tampered_image(spark):
    import pandas as pd

    from crawl4ai_spark.sources.images import (
        IMAGE_SCHEMA,
        make_image_row,
    )

    pages, res = _crawl(spark, n=60)
    rows = [make_image_row(i) for i in range(499)]
    rows[5] = make_image_row(5, tamper=True)  # img-5 is referenced by doc 5
    images = spark.createDataFrame(pd.DataFrame(rows), IMAGE_SCHEMA)
    ref = reference_table(spark, 499)
    v = validated_crawl(res, pages, images, ref)
    bad = v.where(~F.col("pixels_ok")).select("image_id").distinct().collect()
    assert [r["image_id"] for r in bad] == ["img-5"]
    # tamper flips decoded pixels, not the stored phash column
    assert v.where(~F.col("pixels_ok") & ~F.col("caption_ok")).count() == 0


def test_bytes_pruned_from_crawl_join(spark, tmp_path):
    """The result⋈pages join reads only (url, image_id): when pages come
    from parquet (the deployment shape), column pruning must reach the
    scan — ReadSchema carries the two join columns, never links."""
    pages, res = _crawl(spark, n=60)
    pq = str(tmp_path / "pages.parquet")
    pages.write.parquet(pq)
    got = crawl_image_ids(res, spark.read.parquet(pq))
    plan = got._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan, plan
    for line in scan:
        schema = line.split("ReadSchema:", 1)[1]
        assert "url" in schema and "image_id" in schema
        assert "links" not in schema and "title" not in schema
