"""Partitioned bloom segments — the URL-seen membership structure at
10^10-URL scale.

Reference analog: the murmur3+bitarray BloomFilter prototype
(deep_crawling/crazy.py:102-165, optimal m/k at :112-120).  The
prototype is a single in-process bitarray; here the filter is SHARDED:
segment(url) = pmod(xxhash64(url), S), each segment an independent
bloom bit-array stored as one binary row — per-partition lineage the
north rule asks for, persisted with every checkpoint snapshot.

Membership probe is a COGROUP: candidates grouped by segment meet their
segment's bit-array in one Arrow batch per segment
(``cogroup().applyInPandas``) — the bit-array is shipped once per
segment per round, never once per row, and the candidate shuffle is on
the 8-byte segment key.  A bloom "maybe" is then confirmed by the exact
anti-join on the (much smaller) maybe-set; a bloom "no" is definitely
unseen (no false negatives), so at scale the expensive exact anti-join
sees only |maybe| ≈ |dup| + fp·|new| rows instead of the whole frontier.

Bit positions use Kirsch–Mitzenmacher double hashing over the 64-bit
xxhash (h_i = h1 + i·h2 mod m), k and m from the standard optimal
formulas (same math as crazy.py:112-120).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.operators.seen import ProbeConfirmSeenStore, with_xxhash_seg

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("seg", T.IntegerType()),
        T.StructField("bits", T.BinaryType()),
        T.StructField("n_items", T.LongType()),
    ]
)


def optimal_m_k(capacity: int, fp_rate: float) -> tuple[int, int]:
    """Optimal bit count and hash count (crazy.py:112-120 math)."""
    m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
    k = max(1, int(round(m / max(capacity, 1) * math.log(2))))
    return m, k


def optimal_m_k_reference(capacity: int, fp_rate: float) -> tuple[int, int]:
    """The reference's EXACT m/k (crazy.py:112-120: np.ceil both) — used
    by the murmur3 parity family so bit arrays byte-match the prototype."""
    m = int(math.ceil(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
    k = int(math.ceil(m / max(capacity, 1) * math.log(2)))
    return max(m, 1), max(k, 1)


def _positions(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing on uint64."""
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(m)
    # splitmix-style second hash
    h2 = h ^ (h >> np.uint64(33))
    h2 = (h2 * np.uint64(0xFF51AFD7ED558CCD)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    h2 = (h2 % np.uint64(m - 1)) + np.uint64(1)
    ks = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(m)


class BloomSegments:
    """S independent bloom segments as a (seg, bits, n_items) DataFrame."""

    def __init__(
        self,
        spark: SparkSession,
        n_segments: int = 32,
        capacity_per_segment: int = 1 << 16,
        fp_rate: float = 0.01,
        hash_family: str = "xxhash64",
    ):
        self.spark = spark
        self.S = n_segments
        # hash_family="murmur3" is the reference-parity mode: bit
        # positions are mmh3.hash(url, seed) % m for seed in 0..k-1 and
        # m/k use the prototype's ceil math, so each segment sets the
        # exact bit indices crazy.py's BloomFilter would for the same
        # item set (byte layout here is little-endian-bit packing).
        # "xxhash64" (default) stays JVM-side + Kirsch–Mitzenmacher —
        # one hash per row instead of k.
        if hash_family not in ("xxhash64", "murmur3"):
            raise ValueError(f"unknown hash_family: {hash_family}")
        self.hash_family = hash_family
        if hash_family == "murmur3":
            self.m, self.k = optimal_m_k_reference(capacity_per_segment, fp_rate)
        else:
            self.m, self.k = optimal_m_k(capacity_per_segment, fp_rate)
        self._segments: DataFrame | None = None  # (seg, bits, n_items)

    # -- hashing --------------------------------------------------------------

    def with_seg(self, df: DataFrame, url_col: str) -> DataFrame:
        return with_xxhash_seg(df, url_col, self.S)

    def _batch_positions(self, pdf: pd.DataFrame, url_col: str) -> np.ndarray:
        """(n, k) bit positions for one Arrow batch, per hash family."""
        if self.hash_family == "murmur3":
            from crawl4ai_spark.functions.hashing import murmur3_positions

            return murmur3_positions(pdf[url_col].tolist(), self.m, self.k)
        return _positions(pdf["__h"].to_numpy(np.uint64), self.m, self.k)

    # -- build / merge ----------------------------------------------------------

    def _pos_fn(self, url_col: str):
        """Serializable (pdf -> (n, k) positions) closure — captures the
        family/m/k scalars, never ``self`` (which holds the session)."""
        m, k, family = self.m, self.k, self.hash_family
        if family == "murmur3":
            from crawl4ai_spark.functions.hashing import murmur3_positions

            return lambda pdf: murmur3_positions(pdf[url_col].tolist(), m, k)
        return lambda pdf: _positions(pdf["__h"].to_numpy(np.uint64), m, k)

    def add(self, urls: DataFrame, url_col: str = "url") -> None:
        m, k = self.m, self.k
        n_bytes = (m + 7) // 8
        positions = self._pos_fn(url_col)
        carry = ["__seg", url_col] if self.hash_family == "murmur3" else ["__seg", "__h"]

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            seg = int(pdf["__seg"].iloc[0])
            bits = np.zeros(n_bytes, dtype=np.uint8)
            pos = positions(pdf).ravel()
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            return pd.DataFrame(
                [{"seg": seg, "bits": bits.tobytes(), "n_items": len(pdf)}]
            )

        new = (
            self.with_seg(urls, url_col)
            .select(*carry)
            .groupBy("__seg")
            .applyInPandas(build, SEGMENT_SCHEMA)
        )
        if self._segments is None:
            self._segments = new.localCheckpoint(eager=True)
            return

        def merge(pdf: pd.DataFrame) -> pd.DataFrame:
            seg = int(pdf["seg"].iloc[0])
            acc = np.zeros(n_bytes, dtype=np.uint8)
            for b in pdf["bits"]:
                acc |= np.frombuffer(b, dtype=np.uint8)
            return pd.DataFrame(
                [{"seg": seg, "bits": acc.tobytes(),
                  "n_items": int(pdf["n_items"].sum())}]
            )

        self._segments = (
            self._segments.unionByName(new)
            .groupBy("seg")
            .applyInPandas(merge, SEGMENT_SCHEMA)
            .localCheckpoint(eager=True)
        )

    @property
    def segments(self) -> DataFrame | None:
        return self._segments

    def estimate_cardinality(self) -> float:
        """A6: bloom cardinality estimate −(m/k)·ln(1 − X/m) per segment
        (crazy.py:140-158), summed across segments."""
        if self._segments is None:
            return 0.0
        m, k = self.m, self.k

        def est(pdf: pd.DataFrame) -> pd.DataFrame:
            out = []
            for b in pdf["bits"]:
                x = int(np.unpackbits(np.frombuffer(b, dtype=np.uint8)).sum())
                if x >= m:
                    out.append(float(m))
                else:
                    out.append(-(m / k) * math.log(1.0 - x / m))
            return pd.DataFrame({"n_est": out})

        total = (
            self._segments.select("bits")
            .mapInPandas(lambda it: (est(pdf) for pdf in it), "n_est double")
            .agg(F.sum("n_est"))
            .collect()[0][0]
        )
        return float(total or 0.0)

    # -- probe --------------------------------------------------------------

    def probe(self, candidates: DataFrame, url_col: str) -> DataFrame:
        """candidates + boolean ``maybe_seen`` (False ⇒ definitely new)."""
        if self._segments is None:
            return candidates.withColumn("maybe_seen", F.lit(False))
        cand = self.with_seg(candidates, url_col)
        out_schema = T.StructType(
            cand.schema.fields + [T.StructField("maybe_seen", T.BooleanType())]
        )
        positions = self._pos_fn(url_col)

        def check(cand_pdf: pd.DataFrame, seg_pdf: pd.DataFrame) -> pd.DataFrame:
            if cand_pdf.empty:
                return cand_pdf.assign(maybe_seen=pd.Series(dtype=bool))
            if seg_pdf.empty:
                return cand_pdf.assign(maybe_seen=False)
            bits = np.frombuffer(seg_pdf["bits"].iloc[0], dtype=np.uint8)
            pos = positions(cand_pdf)
            hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
            return cand_pdf.assign(maybe_seen=hit.all(axis=1))

        probed = (
            cand.groupby("__seg")
            .cogroup(self._segments.withColumnRenamed("seg", "__seg").groupby("__seg"))
            .applyInPandas(check, out_schema)
        )
        return probed.drop("__h", "__seg")


class BloomSeenStore(ProbeConfirmSeenStore):
    """Drop-in SeenStore with a bloom pre-filter before the exact
    anti-join (J1 at scale: bloom-segment probe, then exact anti-join on
    survivors only).  Probe/confirm shell shared with the cuckoo store
    (seen.ProbeConfirmSeenStore)."""

    def __init__(
        self,
        spark: SparkSession,
        n_segments: int = 32,
        capacity_per_segment: int = 1 << 16,
        fp_rate: float = 0.01,
        hash_family: str = "xxhash64",
    ):
        super().__init__(spark)
        self.bloom = self.prefilter = BloomSegments(
            spark, n_segments, capacity_per_segment, fp_rate, hash_family
        )
        self.stats = {"probed": 0, "maybe": 0}
