"""Image payload invariant (north rule J8): decoded-pixel allclose
(PSNR ≥ 40 dB for lossy) + exact caption equality + phash match."""

import numpy as np
import pytest

from crawl4ai_spark.functions.images import (
    average_hash,
    image_score,
    png_decode,
    png_encode,
    psnr,
    quantize_lossy,
    reference_pixels,
    validate_images,
)
from crawl4ai_spark.sources.images import build_images, make_image_row, reference_table


def test_png_roundtrip_lossless():
    pix = reference_pixels("img-7", 64, 48)
    assert np.array_equal(png_decode(png_encode(pix)), pix)


def test_quantization_psnr_band():
    pix = reference_pixels("img-3", 128, 64)
    q = quantize_lossy(pix, step=4)
    p = psnr(pix, q)
    assert 40.0 <= p <= 60.0  # lossy but above the 40 dB invariant


def test_phash_stability_and_sensitivity():
    pix = reference_pixels("img-11", 96, 96)
    h1 = average_hash(pix)
    assert h1 == average_hash(pix.copy())
    other = reference_pixels("img-12", 96, 96)
    assert h1 != average_hash(other)


def test_validate_images_all_pass(spark):
    fetched = build_images(spark, 30)
    ref = reference_table(spark, 30)
    v = validate_images(fetched, ref).collect()
    assert len(v) == 30
    assert all(r["pixels_ok"] for r in v)
    assert all(r["caption_ok"] for r in v)
    assert all(r["phash_match"] for r in v)
    lossy = [r for r in v if r["psnr_db"] < 999.0]
    assert lossy and all(r["psnr_db"] >= 40.0 for r in lossy)


def test_validate_detects_tamper(spark):
    import pandas as pd

    from crawl4ai_spark.sources.images import IMAGE_SCHEMA

    rows = [make_image_row(i) for i in range(6)]
    rows[2] = make_image_row(2, tamper=True)
    bad_caption = make_image_row(4)
    bad_caption["caption"] = "wrong caption"
    rows[4] = bad_caption
    fetched = spark.createDataFrame(pd.DataFrame(rows), IMAGE_SCHEMA)
    ref = reference_table(spark, 6)
    v = {r["image_id"]: r for r in validate_images(fetched, ref).collect()}
    assert not v["img-2"]["pixels_ok"]  # png row must be exact
    assert not v["img-4"]["caption_ok"]
    assert v["img-1"]["pixels_ok"] and v["img-1"]["caption_ok"]


def test_image_score_rubric(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            # (w, h, alt, index, total, fmt, srcset, picture) → expected
            (200, 200, "a cat", 0, 10, "jpeg", True, True, 7),
            (100, 200, None, 9, 10, "tiff", False, False, 1),
            (151, 151, "", 4, 10, "png", False, False, 4),
        ],
        "w int, h int, alt string, index int, total int, fmt string, "
        "has_srcset boolean, in_picture boolean, expected int",
    )
    got = df.select(
        image_score(
            F.col("w"), F.col("h"), F.col("alt"), F.col("index"),
            F.col("total"), F.col("fmt"), F.col("has_srcset"),
            F.col("in_picture"),
        ).alias("s"),
        "expected",
    ).collect()
    for r in got:
        assert r["s"] == r["expected"]
