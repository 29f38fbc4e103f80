"""Deterministic image+caption table (the graft's input_hint shape):
(image_id:string, bytes:binary, w:int, h:int, fmt:string,
caption:string, phash:long).

Generated executor-side with mapInPandas over spark.range — pixels are
md5-seeded per image_id (functions/images.py:reference_pixels), so the
"reference table" side of the J8 validation is re-derivable anywhere
without shipping ground-truth pixels.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from crawl4ai_spark.functions.images import (
    average_hash,
    png_encode,
    quantize_lossy,
    reference_pixels,
)

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)

SIZES = [(32, 32), (64, 48), (96, 96), (128, 64), (256, 192)]
WORDS = ["red", "blue", "green", "small", "large", "cat", "dog", "tree", "car", "sky"]


def make_image_row(i: int, seed: int = 42, tamper: bool = False) -> dict:
    image_id = f"img-{i}"
    w, h = SIZES[i % len(SIZES)]
    fmt = "png" if i % 3 else "jpeg"
    pix = reference_pixels(image_id, w, h, seed)
    stored = quantize_lossy(pix, step=4) if fmt == "jpeg" else pix
    if tamper:
        stored = stored.copy()
        stored[0, 0, 0] = (int(stored[0, 0, 0]) + 128) % 256
    caption = (
        f"{WORDS[i % 10]} {WORDS[(i // 10) % 10]} {WORDS[(i // 7) % 10]} #{i}"
    )
    return {
        "image_id": image_id,
        "bytes": png_encode(stored),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": average_hash(pix),
    }


def build_images(
    spark: SparkSession,
    n: int = 200,
    seed: int = 42,
    tamper_mod: int | None = None,
) -> DataFrame:
    """``tamper_mod``: deterministically tamper one pixel of every
    png row whose id ≡ 0 (mod tamper_mod) — the id-derived corruption
    the image_validation oracle predicts.  Only png rows: their
    compare is exact so any tamper fails; a single tampered pixel on
    a quantize-lossy ('jpeg') row sits at ~39.9 dB, too close to the
    40 dB PSNR threshold for a deterministic cross-engine boolean."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                make_image_row(
                    int(i),
                    seed,
                    tamper=(
                        tamper_mod is not None
                        and i % tamper_mod == 0
                        and i % 3 != 0  # png rows only (fmt rule)
                    ),
                )
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_SCHEMA])

    return spark.range(0, n).mapInPandas(gen, IMAGE_SCHEMA)


def reference_table(spark: SparkSession, n: int = 200, seed: int = 42) -> DataFrame:
    """Metadata-only reference side (captions/phash/dims) — pixels are
    re-derived from the seed during validation."""
    return build_images(spark, n, seed).select(
        "image_id", "w", "h", "fmt", "caption", "phash"
    )
