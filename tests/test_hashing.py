"""Vectorized murmur3 parity (reference: deep_crawling/crazy.py:122-131
``mmh3.hash(item, seed) % size`` bloom digests).

The batch numpy path is checked bit-exactly against an independent
pure-Python scalar implementation plus published mmh3 vectors, then the
murmur3 bloom family is checked to set exactly the bit indices the
reference prototype would (same m/k ceil math, same per-seed digests).
"""

import math

import numpy as np
import pytest

from crawl4ai_spark.functions.hashing import (
    murmur3_32_batch,
    murmur3_32_scalar,
    murmur3_positions,
)
from crawl4ai_spark.operators.seen_bloom import optimal_m_k_reference

CASES = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "hello",
    "https://example.com/path?q=1",
    "https://example.com/" + "x" * 300,
    "ünïcødé-пример-例",
    "trailing space ",
]


def test_known_mmh3_vectors():
    # mmh3.hash("hello", 0) == 613153351 (mmh3 README); empty @ seed 0 == 0
    assert murmur3_32_scalar("hello", 0) == 613153351
    assert murmur3_32_scalar("", 0) == 0
    assert int(murmur3_32_batch(["hello"], seed=0)[0]) == 613153351


@pytest.mark.parametrize("seed", [0, 1, 2, 5, 42, 0x9747B28C])
def test_batch_matches_scalar(seed):
    got = murmur3_32_batch(CASES, seed=seed)
    want = np.array([murmur3_32_scalar(c, seed) for c in CASES], dtype=np.int32)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, want)


def test_batch_matches_scalar_random_bytes():
    rng = np.random.default_rng(42)
    blobs = [bytes(rng.integers(0, 256, size=int(n), dtype=np.uint8)) for n in rng.integers(0, 64, size=100)]
    got = murmur3_32_batch(blobs, seed=7)
    want = np.array([murmur3_32_scalar(b, 7) for b in blobs], dtype=np.int32)
    np.testing.assert_array_equal(got, want)


def test_empty_batch():
    assert murmur3_32_batch([], seed=0).shape == (0,)


def test_optimal_m_k_reference_ceil_math():
    # crazy.py:112-120: m = ceil(-n ln p / ln2^2), k = ceil(m/n * ln2)
    for n, p in [(1000, 0.01), (50, 0.1), (1 << 16, 0.001)]:
        m, k = optimal_m_k_reference(n, p)
        assert m == int(math.ceil(-n * math.log(p) / (math.log(2) ** 2)))
        assert k == int(math.ceil(m / n * math.log(2)))


def test_positions_match_reference_digest_rule():
    m, k = optimal_m_k_reference(100, 0.01)
    urls = [f"https://example.com/p{i}" for i in range(20)]
    pos = murmur3_positions(urls, m, k)
    for i, u in enumerate(urls):
        for seed in range(k):
            assert pos[i, seed] == murmur3_32_scalar(u, seed) % m


class _ReferenceBloom:
    """Pure-Python mirror of crazy.py:102-131 (set of bit indices —
    bitarray isn't in the container, the index set is the semantics)."""

    def __init__(self, capacity, error_rate):
        self.size, self.hashes = optimal_m_k_reference(capacity, error_rate)
        self.bits = set()

    def add(self, item):
        for seed in range(self.hashes):
            self.bits.add(murmur3_32_scalar(item, seed) % self.size)

    def __contains__(self, item):
        return all(
            murmur3_32_scalar(item, seed) % self.size in self.bits
            for seed in range(self.hashes)
        )


def test_bloom_segments_murmur3_parity(spark):
    from crawl4ai_spark.operators.seen_bloom import BloomSegments

    urls = [f"https://d{i % 3}.example.com/page/{i}" for i in range(200)]
    unseen = [f"https://other.example.com/x/{i}" for i in range(200)]
    bs = BloomSegments(
        spark, n_segments=4, capacity_per_segment=500, fp_rate=0.01,
        hash_family="murmur3",
    )
    ref = _ReferenceBloom(500, 0.01)
    assert (bs.m, bs.k) == (ref.size, ref.hashes)
    for u in urls:
        ref.add(u)

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    bs.add(df)

    # every added URL must probe maybe_seen=True (no false negatives),
    # exactly as the reference filter reports membership
    probed = bs.probe(df, "url").select("url", "maybe_seen").collect()
    assert all(r.maybe_seen for r in probed)

    # unseen URLs: every bit a segment sets comes from some added URL's
    # (seed, digest) — the same digest the reference also set, so each
    # segment's bit set ⊆ the reference's bit set.  Hence an engine
    # false positive is NECESSARILY a reference false positive
    # (sharding can only lower the FP rate, never raise it).
    un_df = spark.createDataFrame([(u,) for u in unseen], "url string")
    got = {r.url: r.maybe_seen for r in bs.probe(un_df, "url").collect()}
    for u in unseen:
        if got[u]:
            assert u in ref
