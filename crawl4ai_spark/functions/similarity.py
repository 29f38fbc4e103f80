"""Similarity search over embedding columns (array<float/double>).

- cosine / dot product as Column expressions (F.zip_with + F.aggregate
  — JVM-side, no UDF)
- brute_force_topk    — exact cosine top-k vs a query vector
- lsh_bucket_topk     — random-hyperplane (SimHash) bucketed ANN: the
  scale path.  Buckets are computed per row with the same md5-derived
  deterministic hyperplanes, so bucketing is reproducible anywhere.

Scale notes: brute force is one scan + one top-k (per-partition top-k
then a single-reducer merge — F.row_number over a global sort is
avoided via `orderBy + limit`, which Spark executes as TakeOrdered);
LSH reduces the scan to matching buckets; for 100 TB, signatures are
precomputed once and stored alongside the vectors.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))


def brute_force_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: scan → score → TakeOrdered(k)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = vectors.select(
        F.col(key_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(key_col)).limit(k)


def _hyperplane(dim: int, plane_id: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 —
    reproducible across engines and sessions."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"hp:{seed}:{plane_id}:{d}".encode()).hexdigest()
        out.append(int(h[:8], 16) / 0x80000000 - 1.0)  # [-1, 1)
    return out


def rh_signature(vec: Column, dim: int, planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane signature: bit i = sign(vec · plane_i)."""
    sig = F.lit(0).cast("long")
    for p in range(planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p, seed)])
        bit = F.when(dot(vec, plane) > 0, F.lit(1)).otherwise(F.lit(0))
        sig = sig + bit.cast("long") * F.lit(2**p).cast("long")
    return sig


def brute_force_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    query_key_col: str = "query_id",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact batch k-NN: every query row gets its cosine top-k from the
    corpus.  Returns (query_id, vec_id, cos_sim, rank).

    Plan shape: broadcast the (small) query table against the corpus
    scan — scoring is JVM Column math on each corpus partition, no
    corpus shuffle; only the scored (query_id, key, sim) triplets
    shuffle into the per-query top-k window.  This is the exactness
    baseline — ``lsh_knn_join`` is the scale path that replaces the
    full cross product with a bucket equi-join.

    ``broadcast_queries=False`` drops the broadcast hint when the
    query batch is too large to fit executor memory (the cross product
    then shuffles both sides — at that size prefer ``lsh_knn_join`` or
    ``lsh_self_join``)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_key_col),
        F.col(vec_col).cast("array<double>").alias("__qvec"),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    scored = corpus.crossJoin(q).select(
        query_key_col,
        key_col,
        F.round(
            cosine(F.col(vec_col).cast("array<double>"), F.col("__qvec")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_key_col).orderBy(
        F.desc("cos_sim"), F.asc(key_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    query_key_col: str = "query_id",
    planes: int = 8,
    probe_bits: int = 1,
    seed: int = 42,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate batch k-NN: signatures on BOTH sides with the same
    deterministic hyperplanes, bucket equi-join instead of a cross
    product, per-query top-k over candidates only.

    Multi-probe: each query also probes buckets within ``probe_bits``
    bit-flips of its own signature — ALL bit-flip combinations up to
    that hamming radius (probe_bits=1 ⇒ planes+1 buckets, probe_bits=2
    adds the C(planes,2) two-flip buckets), trading join fan-out for
    recall.

    Scale shape: corpus signatures are computed once (store them next
    to the vectors at 100 TB); the join shuffles on the 64-bit bucket
    key; candidate sets per query are bucket-sized, not corpus-sized.
    ``broadcast_queries=False`` for query batches too large for one
    executor's memory; for corpus-vs-corpus dedup use
    ``lsh_self_join`` (no broadcast anywhere).
    """
    from itertools import combinations

    from pyspark.sql import Window

    sig_corpus = corpus.withColumn(
        "__bucket", rh_signature(F.col(vec_col).cast("array<double>"), dim, planes, seed)
    )
    probes = [F.col("__qsig")]
    for r in range(1, probe_bits + 1):
        for flips in combinations(range(planes), r):
            mask = sum(2**p for p in flips)
            probes.append(F.col("__qsig").bitwiseXOR(F.lit(mask).cast("long")))
    q = (
        queries.select(
            F.col(query_key_col),
            F.col(vec_col).cast("array<double>").alias("__qvec"),
        )
        .withColumn("__qsig", rh_signature(F.col("__qvec"), dim, planes, seed))
        .withColumn("__probe", F.explode(F.array(*probes)))
    )
    if broadcast_queries:
        q = F.broadcast(q)
    cand = sig_corpus.join(
        q, F.col("__bucket") == F.col("__probe")
    ).select(
        query_key_col,
        key_col,
        F.round(
            cosine(F.col(vec_col).cast("array<double>"), F.col("__qvec")), 6
        ).alias("cos_sim"),
    ).dropDuplicates([query_key_col, key_col])
    w = Window.partitionBy(query_key_col).orderBy(
        F.desc("cos_sim"), F.asc(key_col)
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_self_join(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.8,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    planes: int = 8,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Corpus-vs-corpus near-duplicate pairs — the training-data dedup
    shape at 100 TB.  Returns (id_a, id_b, cos_sim) with id_a < id_b
    and cos_sim ≥ ``threshold``.

    No broadcast anywhere: hyperplane signatures are computed on the
    single corpus scan, the self-join is an equi-join on the 64-bit
    bucket key (one hash shuffle of (bucket, key, vec) rows), and the
    quadratic work happens only inside buckets.  ``max_bucket_size``
    caps degenerate buckets exactly like
    ``dedup.minhash_lsh_pairs`` — opt-in, audit with a bucket-stats
    pass before enabling.

    Recall: pairs agreeing on all ``planes`` hyperplanes are found;
    raise recall by unioning several independent signature seeds
    (each is another scan + equi-join, still no cross product).
    """
    from pyspark.sql import Window

    sig = corpus.select(
        F.col(key_col),
        F.col(vec_col).cast("array<double>").alias("__vec"),
    ).withColumn("__bucket", rh_signature(F.col("__vec"), dim, planes, seed))
    if max_bucket_size is not None:
        w = Window.partitionBy("__bucket")
        sig = (
            sig.withColumn("__bsz", F.count("*").over(w))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a = sig.alias("a")
    b = sig.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__bucket") == F.col("b.__bucket"))
        & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
    ).select(
        F.col(f"a.{key_col}").alias("id_a"),
        F.col(f"b.{key_col}").alias("id_b"),
        F.round(cosine(F.col("a.__vec"), F.col("b.__vec")), 6).alias("cos_sim"),
    )
    return pairs.filter(F.col("cos_sim") >= threshold)


def lsh_bucket_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k restricted to the query's hyperplane bucket (hamming
    distance 0) — recall grows with multi-probe (≤1 bit flips here)."""
    dim = len(query)
    q = [float(x) for x in query]
    # query signature computed driver-side with the same hyperplanes
    qsig = 0
    for p in range(planes):
        plane = _hyperplane(dim, p, seed)
        if sum(a * b for a, b in zip(q, plane)) > 0:
            qsig |= 1 << p
    probe_sigs = [qsig] + [qsig ^ (1 << p) for p in range(planes)]
    sig = rh_signature(F.col(vec_col).cast("array<double>"), dim, planes, seed)
    qcol = F.array(*[F.lit(x) for x in q])
    candidates = vectors.withColumn("bucket", sig).filter(
        F.col("bucket").isin(probe_sigs)
    )
    scored = candidates.select(
        F.col(key_col),
        cosine(F.col(vec_col).cast("array<double>"), qcol).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(key_col)).limit(k)
