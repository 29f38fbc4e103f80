"""Partitioned cuckoo-filter segments — the deletable URL-seen
membership structure (the north rule's "bloom/cuckoo URL-seen").

Same sharding as the bloom segments (seen_bloom.py): segment(url) =
pmod(xxhash64(url), S), one binary row per segment, probed via a
cogroup so each segment table ships once per round, never once per
row.  What cuckoo adds over bloom is DELETION (Fan et al., "Cuckoo
Filter: Practically Better Than Bloom", CoNEXT 2014 — public
algorithm): a fingerprint can be removed, so TTL-style re-crawl
semantics (robots 7-day expiry, utils.py:252-275; CacheMode
revalidation, cache_context.py:59-87) can *forget* a URL without
rebuilding the filter, which a bloom fundamentally cannot.

Per segment the table is ``nb`` buckets × ``b`` slots of nonzero
16-bit fingerprints (0 = empty), all derived from the JVM-side
xxhash64 of the url:

    fp  = 1 + ((h >> 32) & 0xFFFF) % 0xFFFF        (never 0)
    i1  = h & (nb - 1)                             (nb a power of 2)
    i2  = i1 XOR (fp * 0x5bd1e995 & (nb - 1))      (involutive)

so membership, insertion and deletion never need the original url —
only (i1, fp) — and i1 is always recoverable from whichever bucket a
fingerprint sits in.  Inserts that still collide after ``max_kicks``
evictions go to a per-segment STASH of canonical (min(i1,i2), fp)
keys (probed vectorized) instead of failing — the safety valve for
over-capacity segments; size ``capacity_per_segment`` so the load
factor stays under ~0.95 and the stash stays empty.

Determinism: the builder dedupes each ``add()`` batch on the 64-bit
hash and sorts by (i1, fp) before inserting, so the table bytes are
order-independent PER CALL — the same batch produces the same bytes
regardless of shuffle arrival order (required for byte-stable
checkpoint snapshots).  Across multiple add() calls the layout
depends on the batch sequence: two stores holding the same item set
built via different call orders may differ byte-wise (membership
answers are identical either way).

Scale shape: identical to the bloom path — build/merge/delete are one
``cogroup().applyInPandas`` over the segment key (full-outer: segments
with no updates pass through untouched), the candidate shuffle is on
the 8-byte segment key, and a probe "no" is definitely-unseen so the
exact anti-join only sees the maybe-set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.operators.seen import ProbeConfirmSeenStore, with_xxhash_seg

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("seg", T.IntegerType()),
        T.StructField("table", T.BinaryType()),
        T.StructField("stash", T.BinaryType()),
        T.StructField("n_items", T.LongType()),
    ]
)

_FP_SCRAMBLE = np.uint64(0x5BD1E995)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _derive(h: np.ndarray, nb: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fp uint16-as-uint64, i1, i2) for 64-bit hashes; nb power of 2."""
    h = h.astype(np.uint64)
    mask = np.uint64(nb - 1)
    fp = ((h >> np.uint64(32)) & np.uint64(0xFFFF)) % np.uint64(0xFFFF) + np.uint64(1)
    i1 = h & mask
    i2 = i1 ^ ((fp * _FP_SCRAMBLE) & mask)
    return fp, i1, i2


def _canon(i1: np.ndarray, i2: np.ndarray, fp: np.ndarray) -> np.ndarray:
    """Order-free stash key: (min(i1,i2) << 16) | fp, as uint64."""
    return (np.minimum(i1, i2) << np.uint64(16)) | fp


class CuckooSegments:
    """S independent cuckoo-filter segments as a
    (seg, table, stash, n_items) DataFrame."""

    def __init__(
        self,
        spark: SparkSession,
        n_segments: int = 32,
        capacity_per_segment: int = 1 << 16,
        bucket_size: int = 4,
        max_kicks: int = 500,
    ):
        self.spark = spark
        self.S = n_segments
        self.b = bucket_size
        self.max_kicks = max_kicks
        # size buckets for ~0.84 load at stated capacity (b=4 cuckoo
        # filters stay insertable to ~0.95 load, so capacity has slack)
        self.nb = _next_pow2(max(2, int(capacity_per_segment / bucket_size / 0.84)))
        self._segments: DataFrame | None = None

    # -- hashing ------------------------------------------------------------

    def with_seg(self, df: DataFrame, url_col: str) -> DataFrame:
        return with_xxhash_seg(df, url_col, self.S)

    # -- mutate (insert / delete share one cogroup pass) ---------------------

    def _apply(self, urls: DataFrame, url_col: str, op: str) -> None:
        nb, b, max_kicks = self.nb, self.b, self.max_kicks
        # dedupe on the 64-bit hash: the filter only ever sees fp/i1/i2
        # derived from __h, so same-hash rows are one item to it; without
        # this, duplicate URLs in a batch would store multiple fingerprint
        # copies and inflate n_items (and a later delete would remove
        # only one copy).
        updates = (
            self.with_seg(urls, url_col)
            .select("__seg", "__h")
            .dropDuplicates(["__h"])
        )
        segs = self._segments
        if segs is None:
            if op == "delete":
                return
            segs = self.spark.createDataFrame([], SEGMENT_SCHEMA)

        def mutate(cand: pd.DataFrame, seg_pdf: pd.DataFrame) -> pd.DataFrame:
            if seg_pdf.empty:
                seg = int(cand["__seg"].iloc[0])
                table = np.zeros(nb * b, dtype=np.uint16)
                stash = np.zeros(0, dtype=np.uint64)
                n_items = 0
            else:
                seg = int(seg_pdf["__seg"].iloc[0])
                table = np.frombuffer(seg_pdf["table"].iloc[0], dtype=np.uint16).copy()
                stash = np.frombuffer(seg_pdf["stash"].iloc[0], dtype=np.uint64).copy()
                n_items = int(seg_pdf["n_items"].iloc[0])
            if not cand.empty:
                fp, i1, i2 = _derive(cand["__h"].to_numpy(np.uint64), nb)
                order = np.lexsort((fp, i1))  # order-independent bytes
                tab2 = table.reshape(nb, b)
                stash_list = list(stash)
                for j in order:
                    f, a, c = int(fp[j]), int(i1[j]), int(i2[j])
                    if op == "insert":
                        placed = False
                        for idx in (a, c):
                            row = tab2[idx]
                            empty = np.flatnonzero(row == 0)
                            if empty.size:
                                row[empty[0]] = f
                                placed = True
                                break
                        kick_idx, kick_fp = a, f
                        if not placed:
                            for _ in range(max_kicks):
                                # evict slot 0 (deterministic), follow
                                # the displaced fp to its alternate
                                row = tab2[kick_idx]
                                kick_fp, row[0] = int(row[0]), kick_fp
                                kick_idx = kick_idx ^ int(
                                    (np.uint64(kick_fp) * _FP_SCRAMBLE)
                                    & np.uint64(nb - 1)
                                )
                                row = tab2[kick_idx]
                                empty = np.flatnonzero(row == 0)
                                if empty.size:
                                    row[empty[0]] = kick_fp
                                    placed = True
                                    break
                        if not placed:
                            # stash the evicted fingerprint's canonical key
                            ka = np.uint64(kick_idx)
                            kc = ka ^ (
                                (np.uint64(kick_fp) * _FP_SCRAMBLE)
                                & np.uint64(nb - 1)
                            )
                            stash_list.append(
                                int(_canon(ka, kc, np.uint64(kick_fp)))
                            )
                        n_items += 1
                    else:  # delete — remove ONE copy from i1/i2/stash
                        removed = False
                        for idx in (a, c):
                            row = tab2[idx]
                            hit = np.flatnonzero(row == f)
                            if hit.size:
                                row[hit[0]] = 0
                                removed = True
                                break
                        if not removed:
                            key = int(_canon(np.uint64(a), np.uint64(c), np.uint64(f)))
                            if key in stash_list:
                                stash_list.remove(key)
                                removed = True
                        if removed:
                            n_items -= 1
                stash = np.array(sorted(stash_list), dtype=np.uint64)
                table = tab2.ravel()
            return pd.DataFrame(
                [{
                    "seg": seg,
                    "table": table.tobytes(),
                    "stash": stash.tobytes(),
                    "n_items": n_items,
                }]
            )

        self._segments = (
            updates.groupby("__seg")
            .cogroup(segs.withColumnRenamed("seg", "__seg").groupby("__seg"))
            .applyInPandas(mutate, SEGMENT_SCHEMA)
            .localCheckpoint(eager=True)
        )

    def add(self, urls: DataFrame, url_col: str = "url") -> None:
        """Insert fingerprints.  Duplicates WITHIN the batch are deduped
        (on the 64-bit hash); across calls the caller must not re-add
        URLs already in the store — the engine guarantees this by
        anti-joining before every discovery — or n_items/count_items()
        will overcount and a single delete() removes only one copy."""
        self._apply(urls, url_col, "insert")

    def delete(self, urls: DataFrame, url_col: str = "url") -> None:
        """Remove one stored copy of each url's fingerprint.  Only
        delete urls known to be present: deleting an absent url whose
        fingerprint collides with a stored one evicts the OTHER item
        (the standard cuckoo-filter deletion contract)."""
        self._apply(urls, url_col, "delete")

    @property
    def segments(self) -> DataFrame | None:
        return self._segments

    def count_items(self) -> int:
        """Exact stored-item count (cuckoo tracks it; bloom estimates)."""
        if self._segments is None:
            return 0
        n = self._segments.agg(F.sum("n_items")).collect()[0][0]
        return int(n or 0)

    # -- probe ----------------------------------------------------------------

    def probe(self, candidates: DataFrame, url_col: str) -> DataFrame:
        """candidates + boolean ``maybe_seen`` (False ⇒ definitely new)."""
        if self._segments is None:
            return candidates.withColumn("maybe_seen", F.lit(False))
        nb, b = self.nb, self.b
        cand = self.with_seg(candidates, url_col)
        out_schema = T.StructType(
            cand.schema.fields + [T.StructField("maybe_seen", T.BooleanType())]
        )

        def check(cand_pdf: pd.DataFrame, seg_pdf: pd.DataFrame) -> pd.DataFrame:
            if cand_pdf.empty:
                return cand_pdf.assign(maybe_seen=pd.Series(dtype=bool))
            if seg_pdf.empty:
                return cand_pdf.assign(maybe_seen=False)
            table = np.frombuffer(seg_pdf["table"].iloc[0], dtype=np.uint16)
            stash = np.frombuffer(seg_pdf["stash"].iloc[0], dtype=np.uint64)
            tab2 = table.reshape(nb, b)
            fp, i1, i2 = _derive(cand_pdf["__h"].to_numpy(np.uint64), nb)
            fp16 = fp.astype(np.uint16)
            hit = (tab2[i1.astype(np.int64)] == fp16[:, None]).any(axis=1)
            hit |= (tab2[i2.astype(np.int64)] == fp16[:, None]).any(axis=1)
            if stash.size:
                hit |= np.isin(_canon(i1, i2, fp), stash)
            return cand_pdf.assign(maybe_seen=hit)

        probed = (
            cand.groupby("__seg")
            .cogroup(self._segments.withColumnRenamed("seg", "__seg").groupby("__seg"))
            .applyInPandas(check, out_schema)
        )
        return probed.drop("__h", "__seg")


class CuckooSeenStore(ProbeConfirmSeenStore):
    """Drop-in SeenStore: cuckoo pre-filter before the exact anti-join
    (J1 at scale), plus ``remove`` — the re-crawl path bloom can't do.
    Probe/confirm shell shared with the bloom store
    (seen.ProbeConfirmSeenStore)."""

    def __init__(
        self,
        spark: SparkSession,
        n_segments: int = 32,
        capacity_per_segment: int = 1 << 16,
    ):
        super().__init__(spark)
        self.cuckoo = self.prefilter = CuckooSegments(
            spark, n_segments, capacity_per_segment
        )

    def remove(self, urls: DataFrame) -> None:
        """Forget urls (TTL expiry / forced re-crawl): deletes the
        fingerprints AND rebuilds the exact set without them.

        Only urls actually present are deleted from the filter —
        cuckoo deletion of an absent item whose fingerprint collides
        with a stored one would strip the OTHER item and create a
        false negative, so the request is semi-joined against the
        exact set (and de-duplicated: two requests for one url must
        not remove two fingerprint copies) before touching it."""
        if self.exact.df is None:
            return
        present = (
            urls.select("url")
            .distinct()
            .join(self.exact.df.select("url"), "url", "left_semi")
            .localCheckpoint(eager=True)  # both consumers read it once
        )
        self.exact.remove(present)
        self.cuckoo.delete(present)

