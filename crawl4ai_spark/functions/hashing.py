"""Vectorized murmur3 (x86_32) — the reference's URL hash family.

Reference analog: the bloom prototype hashes each URL with
``mmh3.hash(item, seed)`` for seed in 0..k-1 and sets
``digest % size`` (deep_crawling/crazy.py:122-131).  ``mmh3`` is a
C extension; here the same x86_32 algorithm is re-implemented as
BATCH numpy arithmetic (uint32 wrap-around gives the mod-2^32
semantics for free), exposed as an Arrow-batched pandas UDF — the
"URLs canonicalized + murmur3-hashed in vectorized Arrow UDFs" path
of the north rule.  No per-row Python: one padded (n, L) byte matrix
per batch, one vectorized pass per 4-byte block column.

The JVM-side ``xxhash64`` fast path (functions/normalize.py:url_hash)
remains the default for engine-internal hashing (whole-stage codegen,
no Python crossing); this module exists for exact bit-level parity
with the reference's bloom prototype and for callers that need
mmh3-compatible digests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_M32 = 0xFFFFFFFF


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _pad_matrix(items: "pd.Series | list") -> tuple[np.ndarray, np.ndarray]:
    """Pack variable-length byte strings into a zero-padded (n, L) uint8
    matrix with L a multiple of 4 (>= maxlen + 4, so every tail gather
    stays in bounds).  Placement is fully vectorized: one flat
    frombuffer over the concatenation + computed scatter indices."""
    bs = [
        x if isinstance(x, (bytes, bytearray)) else ("" if x is None else str(x)).encode("utf-8")
        for x in items
    ]
    n = len(bs)
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    pad = ((maxlen + 3) // 4) * 4 + 4
    buf = np.zeros((max(n, 1), pad), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
        row_idx = np.repeat(np.arange(n), lens)
        col_idx = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        buf[row_idx, col_idx] = flat
    return buf, lens


def murmur3_32_batch(items, seed: int = 0, signed: bool = True) -> np.ndarray:
    """murmur3 x86_32 of each byte string, vectorized over the batch.

    Bit-exact with ``mmh3.hash(item, seed)`` (signed int32, the form
    crazy.py:124 uses) when ``signed=True``; uint32 otherwise.
    """
    buf, lens = _pad_matrix(items)
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=np.int32 if signed else np.uint32)
    words = np.ascontiguousarray(buf).view("<u4")  # (n, pad//4) LE blocks
    nblocks = (lens // 4).astype(np.int64)
    h = np.full(n, np.uint32(seed & _M32), dtype=np.uint32)

    for j in range(int(nblocks.max()) if n else 0):
        active = nblocks > j
        k1 = words[:, j].copy()
        k1 *= _C1
        k1 = _rotl32(k1, 15)
        k1 *= _C2
        hx = h ^ k1
        hx = _rotl32(hx, 13)
        hx = hx * np.uint32(5) + np.uint32(0xE6546B64)
        h = np.where(active, hx, h)

    tail_len = (lens & 3).astype(np.int64)
    base = nblocks * 4
    rows = np.arange(n)
    k1 = np.zeros(n, dtype=np.uint32)
    k1 ^= np.where(tail_len >= 3, buf[rows, base + 2].astype(np.uint32) << np.uint32(16), np.uint32(0))
    k1 ^= np.where(tail_len >= 2, buf[rows, base + 1].astype(np.uint32) << np.uint32(8), np.uint32(0))
    k1 ^= np.where(tail_len >= 1, buf[rows, base].astype(np.uint32), np.uint32(0))
    k1 *= _C1
    k1 = _rotl32(k1, 15)
    k1 *= _C2
    h = np.where(tail_len > 0, h ^ k1, h)

    h ^= lens.astype(np.uint32)
    h ^= h >> np.uint32(16)
    h *= np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h *= np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h.astype(np.int32) if signed else h


def murmur3_32_scalar(item: "str | bytes", seed: int = 0) -> int:
    """Pure-Python scalar murmur3 x86_32 (mmh3.hash-compatible signed
    int32).  The independent oracle the vectorized path is tested
    against — mirrors the algorithm mmh3's C source implements."""
    data = item.encode("utf-8") if isinstance(item, str) else bytes(item)
    length = len(data)
    h = seed & _M32
    c1, c2 = 0xCC9E2D51, 0x1B873593
    rot = lambda x, r: ((x << r) | (x >> (32 - r))) & _M32
    nblocks = length // 4
    for i in range(nblocks):
        k1 = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k1 = (k1 * c1) & _M32
        k1 = rot(k1, 15)
        k1 = (k1 * c2) & _M32
        h ^= k1
        h = rot(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks * 4 :]
    k1 = 0
    if len(tail) >= 3:
        k1 ^= tail[2] << 16
    if len(tail) >= 2:
        k1 ^= tail[1] << 8
    if len(tail) >= 1:
        k1 ^= tail[0]
        k1 = (k1 * c1) & _M32
        k1 = rot(k1, 15)
        k1 = (k1 * c2) & _M32
        h ^= k1
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def murmur3_udf(col: "Column | str", seed: int = 0) -> Column:
    """``mmh3.hash(url, seed)`` as an Arrow-batched pandas UDF column
    (int signed 32-bit, the reference's digest type)."""

    @F.pandas_udf("int")
    def _mmh3(s: pd.Series) -> pd.Series:
        return pd.Series(murmur3_32_batch(s, seed=seed), dtype="int32")

    return _mmh3(F.col(col) if isinstance(col, str) else col)


def murmur3_positions(items, m: int, k: int) -> np.ndarray:
    """(n, k) bloom bit positions exactly as crazy.py:122-131 computes
    them: ``mmh3.hash(item, seed) % m`` for seed in 0..k-1 (Python %
    on the SIGNED digest — always non-negative)."""
    n = len(items)
    out = np.empty((n, k), dtype=np.int64)
    for seed in range(k):
        out[:, seed] = murmur3_32_batch(items, seed=seed).astype(np.int64) % m
    return out
