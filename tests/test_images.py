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


# -- multimodal transforms (resize / features / frame sampling) -------------

def test_resize_images(spark):
    from crawl4ai_spark.functions.images import (
        png_decode, resize_images, resize_nearest,
    )
    from crawl4ai_spark.sources.images import build_images

    src = build_images(spark, 6)
    originals = {r["image_id"]: bytes(r["bytes"]) for r in src.collect()}
    out = {r["image_id"]: r for r in resize_images(src, 16, 12).collect()}
    assert set(out) == set(originals)
    for iid, r in out.items():
        assert (r["out_w"], r["out_h"]) == (16, 12)
        got = png_decode(bytes(r["bytes"]))
        want = resize_nearest(png_decode(originals[iid]), 12, 16)
        assert got.shape == (12, 16, 3)
        assert (got == want).all()


def test_image_features(spark):
    import numpy as np

    from crawl4ai_spark.functions.images import (
        image_features, png_decode, resize_nearest,
    )
    from crawl4ai_spark.sources.images import build_images

    src = build_images(spark, 4)
    originals = {r["image_id"]: bytes(r["bytes"]) for r in src.collect()}
    rows = {r["image_id"]: r["features"] for r in image_features(src, grid=4).collect()}
    for iid, feats in rows.items():
        assert len(feats) == 48
        assert all(0.0 <= f <= 1.0 for f in feats)
        pix = png_decode(originals[iid])
        want = resize_nearest(pix, 4, 4).astype(np.float64) / 255.0
        assert np.allclose(np.array(feats).reshape(4, 4, 3), want, atol=1e-6)


def test_sample_frames(spark):
    import numpy as np

    from crawl4ai_spark.functions.images import (
        fake_video_encode, png_decode, reference_pixels, sample_frames,
    )

    frames = [reference_pixels(f"vid0-f{i}", 8, 6) for i in range(5)]
    df = spark.createDataFrame(
        [("vid0", bytearray(fake_video_encode(frames)), "fakevid")],
        "video_id string, bytes binary, fmt string",
    )
    got = sorted(
        sample_frames(df, every_n=2).collect(), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in got] == [0, 2, 4]
    for r in got:
        assert np.array_equal(png_decode(bytes(r["bytes"])), frames[r["frame_idx"]])


def test_sample_frames_real_codec_stubbed(spark):
    import pytest as _pytest

    from crawl4ai_spark.functions.images import sample_frames

    df = spark.createDataFrame(
        [("vid1", bytearray(b"\x00\x00"), "mp4")],
        "video_id string, bytes binary, fmt string",
    )
    with _pytest.raises(Exception, match="NotImplementedError|fakevid|codec"):
        sample_frames(df).collect()


# ---------------------------------------------------------------------------
# phash near-dup join (Manku block-permutation banding, exact recall)
# ---------------------------------------------------------------------------


def _i64(x):
    x &= (1 << 64) - 1
    return x - (1 << 64) if x >= (1 << 63) else x


def _brute_pairs(rows, max_hamming):
    out = set()
    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((rows[a] ^ rows[b]) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                out.add((a, b, d))
    return out


def _phash_df(spark, hashes):
    return spark.createDataFrame(
        [(k, v) for k, v in hashes.items()], "image_id string, phash long"
    )


def test_phash_near_dup_matches_brute_force(spark):
    from crawl4ai_spark.functions.images import phash_near_dup

    # real phash values from the synthetic image table, plus perturbed
    # copies 1-3 bits away (near dups) and untouched far rows
    base = {r["image_id"]: r["phash"] for r in
            build_images(spark, 25).select("image_id", "phash").collect()}
    hashes = dict(base)
    for j, (iid, h) in enumerate(sorted(base.items())[:8]):
        flip = 0
        for b in range(j % 3 + 1):
            flip |= 1 << ((7 * j + 13 * b + 1) % 64)
        hashes[f"{iid}-dup"] = _i64(h ^ flip)
    expect = _brute_pairs(hashes, 4)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_dup(_phash_df(spark, hashes), max_hamming=4).collect()
    }
    assert got == expect
    assert len(got) >= 8  # every perturbed copy found


def test_phash_near_dup_manku_multiblock_config(spark):
    """blocks=6, key_blocks=2 (the wide-key scale config): same exact
    pair set as the brute force — recall is guaranteed, not tuned."""
    from crawl4ai_spark.functions.images import phash_near_dup

    base = {r["image_id"]: r["phash"] for r in
            build_images(spark, 20).select("image_id", "phash").collect()}
    hashes = dict(base)
    for j, (iid, h) in enumerate(sorted(base.items())[:6]):
        hashes[f"{iid}-dup"] = _i64(h ^ (1 << (11 * j % 64)) ^ (1 << ((11 * j + 29) % 64)))
    expect = _brute_pairs(hashes, 4)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_dup(
            _phash_df(spark, hashes), max_hamming=4, blocks=6, key_blocks=2
        ).collect()
    }
    assert got == expect


def test_phash_near_dup_rejects_lossy_config():
    from crawl4ai_spark.functions.images import phash_near_dup

    with pytest.raises(ValueError):
        phash_near_dup(None, max_hamming=4, blocks=4, key_blocks=1)
    with pytest.raises(ValueError):
        phash_near_dup(None, max_hamming=8, blocks=16, key_blocks=8)


def test_phash_near_dup_bucket_cap_drops_degenerate(spark):
    """An all-identical cluster (e.g. blank images) exceeds the cap and
    is dropped from the join; distinct hashes are unaffected."""
    from crawl4ai_spark.functions.images import phash_near_dup

    hashes = {f"blank-{i}": 0 for i in range(12)}
    hashes["a"] = (1 << 5) | (1 << 33) | (1 << 40) | (1 << 50)
    hashes["b"] = _i64(hashes["a"] | (1 << 63))
    df = _phash_df(spark, hashes)
    capped = phash_near_dup(df, max_hamming=2, max_bucket_size=8).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert got == {("a", "b")}
    uncapped = phash_near_dup(df, max_hamming=2).count()
    assert uncapped == 12 * 11 // 2 + 1


def test_validator_flags_corrupt_rows_without_aborting(spark):
    # corrupt bytes / dimension mismatches are what the validator
    # exists to flag — per row, never by killing the job
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.images import validate_images

    rows = [make_image_row(i) for i in range(4)]
    ref = reference_table(spark, 4)
    df = spark.createDataFrame(rows)
    bad_id = rows[1]["image_id"]
    bad = df.withColumn(
        "bytes",
        F.when(F.col("image_id") == bad_id, F.lit(b"not a png"))
        .otherwise(F.col("bytes")),
    )
    out = {r["image_id"]: r for r in validate_images(bad, ref).collect()}
    assert out[bad_id]["pixels_ok"] is False and out[bad_id]["psnr_db"] == 0.0
    ok_ids = [rows[i]["image_id"] for i in (0, 2, 3)]
    assert all(out[i]["pixels_ok"] for i in ok_ids)


def test_phash_near_dup_exact_mode(spark):
    # max_hamming=0 => one 64-bit block; the full mask must not be
    # built as an unrepresentable long literal
    from crawl4ai_spark.functions.images import phash_near_dup

    imgs = spark.createDataFrame(
        [("a", 7), ("b", 7), ("c", 9)], "image_id string, phash long"
    )
    pairs = phash_near_dup(
        imgs, id_col="image_id", phash_col="phash",
        max_hamming=0, key_blocks=1,
    ).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [
        ("a", "b", 0)
    ]
