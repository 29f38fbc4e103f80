"""Deduplication operators for training-data pipelines.

All variants are expressed as DataFrame programs (no driver loops):

- exact_dedup        — md5(text) groupBy, keep min doc_id
- ngram_shingles     — character/word n-gram shingling
- minhash_signature  — k independent min-hashes over shingles via
                       md5-derived permutations (cross-engine stable)
- minhash_lsh_pairs  — band → bucket-join candidate pairs
- jaccard_pairs      — exact n-gram Jaccard over candidate pairs
- simhash            — 64-bit simhash from token hashes

Scale notes: minhash/LSH is the 100 TB path — shingle explode is a
flatMap (no shuffle), signatures aggregate per doc (one shuffle on
doc_id), banding emits B rows/doc, and the bucket self-join shuffles
on (band, band_hash) where bucket sizes are bounded; the quadratic
work happens only inside buckets.  The exact Jaccard confirm runs on
candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_prefix_long(c: Column, salt: str = "") -> Column:
    """Stable 60-bit integer hash usable identically in DuckDB:
    CAST(first 15 md5 hex digits AS bigint)."""
    base = F.concat(F.lit(salt), c) if salt else c
    return F.conv(F.substring(F.md5(base), 1, 15), 16, 10).cast("long")


def uhash_chunks(num_hashes: int) -> list[tuple[str, int]]:
    """(salt, hex_offset) schedule for the chunked minhash family:
    hash h = 32-bit chunk ``h % 4`` of ``md5("q{h//4}:" || shingle)``.
    ⌈k/4⌉ digests per shingle instead of k — 4× less digest work — and
    the chunks of a (salted) md5 are mutually independent, unlike
    affine mixes of one shared base (an affine map with a small
    multiplier is piecewise order-preserving, so all k "permutations"
    would elect the same min shingle and LSH buckets degenerate)."""
    return [(f"q{h // 4}:", (h % 4) * 8) for h in range(num_hashes)]


def exact_dedup(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min key) per identical text.

    Hash-aggregate on md5(text): one shuffle keyed by the digest, never
    by the full text (100 TB: digests are 32 bytes; map-side partial
    aggregation applies)."""
    return (
        docs.withColumn("text_md5", F.md5(F.col(text_col)))
        .groupBy("text_md5")
        .agg(
            F.min(key_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of word n-gram shingle strings (space-joined, lowercased).

    Documents with fewer than ``n`` tokens yield an EMPTY array — the
    k < 1 branch matters: ``sequence(1, 0)`` is the DESCENDING array
    [1, 0], whose element_at(toks, 0) / out-of-range reads abort the
    job on any short document."""
    toks = F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != "")
    k = F.size(toks) - (n - 1)
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
    )


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """(key, sig array<long>): sig[h] = min over shingles of the h-th
    permutation hash.  Two families, same plan shape, both DuckDB-exact:

    * ``"md5"`` (compat default): md5("h{h}:" || shingle) per
      permutation — k full digests per shingle.
    * ``"universal"`` (the scale path): ⌈k/4⌉ salted md5 digests per
      shingle, each split into four independent 32-bit chunks — 4×
      less digest work for the same independent-permutation semantics
      (one-permutation/multi-chunk minhashing in the spirit of Li,
      Owen & Zhang, NIPS'12).
    """
    ex = docs.select(
        F.col(key_col),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), shingle_n))).alias(
            "shingle"
        ),
    )
    if hash_family == "universal":
        n_digests = (num_hashes + 3) // 4
        for d in range(n_digests):
            ex = ex.withColumn(
                f"__d{d}", F.md5(F.concat(F.lit(f"q{d}:"), F.col("shingle")))
            )
        mins = []
        for h, (salt, off) in enumerate(uhash_chunks(num_hashes)):
            d = h // 4
            val = F.conv(
                F.substring(F.col(f"__d{d}"), off + 1, 8), 16, 10
            ).cast("long")
            mins.append(F.min(val).alias(f"m{h}"))
    elif hash_family == "md5":
        mins = [
            F.min(md5_prefix_long(F.col("shingle"), salt=f"h{h}:")).alias(f"m{h}")
            for h in range(num_hashes)
        ]
    else:
        raise ValueError(f"unknown hash_family: {hash_family}")
    agg = ex.groupBy(key_col).agg(*mins)
    return agg.select(
        key_col, F.array(*[F.col(f"m{h}") for h in range(num_hashes)]).alias("sig")
    )


def _band_buckets(
    signatures: DataFrame, key_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """(key, band, bucket) rows: md5 over each band's signature slice.

    bands × rows_per_band must fit the signature: out-of-range slices
    would either error (ANSI element_at) or — worse — hash the empty
    string into one degenerate mega-bucket per overflowing band,
    sending the self-join quadratic over the whole corpus.  A per-row
    guard raises loudly instead."""
    need = bands * rows_per_band
    return signatures.withColumn(
        "sig",
        F.when(F.size("sig") >= F.lit(need), F.col("sig")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"LSH banding needs bands*rows_per_band={need} "
                        "signature entries, got "
                    ),
                    F.size("sig").cast("string"),
                )
            )
        ),
    ).select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(key_col, "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    signatures: DataFrame,
    key_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band bucket.

    Each doc emits `bands` (band_id, bucket_hash) rows; the self-join
    shuffles on the bucket key only, and the quadratic work happens
    only INSIDE buckets — which is safe only if bucket sizes are
    actually bounded.  A degenerate bucket (empty docs, boilerplate —
    every member pairs with every other) goes quadratic at 100 TB, so
    buckets larger than ``max_bucket_size`` are DROPPED before the
    join: members of such a bucket are near-identical boilerplate
    whose pairs would add ~size²/2 rows of no dedup value (they are
    still found through their other, smaller bands, or belong in an
    exact-dedup pass).  Dropped mass is observable via
    ``lsh_bucket_stats`` rather than silently discarded.

    ``max_bucket_size=None`` (the default) keeps exact reference
    semantics — every bucket joins, recall is the full LSH recall.
    At scale, PASS A CAP (e.g. 1000) explicitly and audit the dropped
    mass with ``lsh_bucket_stats``; the cap is opt-in so parity runs
    can't silently lose pairs.
    """
    buckets = _band_buckets(signatures, key_col, bands, rows_per_band)
    if max_bucket_size is not None:
        # count per (band, bucket) — same shuffle key as the self-join,
        # map-side partial agg; oversized buckets are filtered out of
        # BOTH join sides
        w = Window.partitionBy("band", "bucket")
        buckets = buckets.withColumn(
            "__bsz", F.count("*").over(w)
        ).filter(F.col("__bsz") <= max_bucket_size).drop("__bsz")
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
        )
        .select(
            F.col(f"a.{key_col}").alias("id_a"),
            F.col(f"b.{key_col}").alias("id_b"),
        )
        .distinct()
    )
    return pairs


def lsh_bucket_stats(
    signatures: DataFrame,
    key_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Observability for the bucket cap: per band, how many buckets /
    member rows exceed ``max_bucket_size`` (the mass the capped join
    drops).  Run it alongside ``minhash_lsh_pairs`` when auditing a
    corpus; one groupBy on the same key as the join shuffle."""
    sized = _band_buckets(signatures, key_col, bands, rows_per_band)
    per_bucket = sized.groupBy("band", "bucket").agg(F.count("*").alias("sz"))
    return per_bucket.groupBy("band").agg(
        F.count("*").alias("n_buckets"),
        F.max("sz").alias("max_bucket"),
        F.sum(F.when(F.col("sz") > max_bucket_size, 1).otherwise(0)).alias(
            "buckets_over_cap"
        ),
        F.sum(F.when(F.col("sz") > max_bucket_size, F.col("sz")).otherwise(0)).alias(
            "rows_dropped"
        ),
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for given candidate (id_a, id_b) pairs."""
    sh = docs.select(
        F.col(key_col),
        F.array_distinct(word_shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    j = (
        pairs.join(sh.withColumnRenamed(key_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(key_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .select(
            "id_a",
            "id_b",
            (F.col("inter").cast("double") / F.greatest(F.col("uni"), F.lit(1)).cast("double")).alias("jaccard"),
        )
    )
    return j


def simhash(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash from word-token md5 hashes.

    For each bit position, sum +1/-1 over tokens' bit values and take
    the sign.  Pure Column math (aggregate over the token array) — no
    UDF, no shuffle."""
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != "")
    )
    hashes = F.transform(toks, lambda t: md5_prefix_long(t))
    # 60 usable bits from md5_prefix_long; build the simhash over 60
    usable = min(bits, 60)
    bit_cols = []
    for i in range(usable):
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit_cols.append(F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0)).cast("long") * F.lit(2**i).cast("long"))
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
