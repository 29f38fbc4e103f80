"""URL-seen store — the crawl's membership structure.

Reference analog: the in-memory ``visited: Set[str]``
(bfs_strategy.py:231) / ``_dfs_seen`` (dfs_strategy.py:22-26) and the
bloom prototype (deep_crawling/crazy.py:102-165).

Exact mode (default): a persisted DataFrame of URLs; membership = LEFT
ANTI join (SURVEY.md §2.4 J1).  At 10^10-URL scale the anti-join is
preceded by a probabilistic segment probe — bloom (seen_bloom.py) or
deletable cuckoo (seen_cuckoo.py), both built on
``ProbeConfirmSeenStore`` below — that discards the vast majority of
already-seen candidates before they reach the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SeenStore:
    """Exact URL-seen set backed by a checkpointed DataFrame.

    The store keeps a single ``url`` column; the anti-join shuffles on
    the url itself (Spark hash-partitions the string key), and the
    probabilistic prefilters below carry their own xxhash64 so the
    exact side never needs a stored hash column.
    """

    def __init__(self, spark: SparkSession, checkpoint_every: int = 8):
        self.spark = spark
        self._df: DataFrame | None = None
        self._adds_since_checkpoint = 0
        self._checkpoint_every = checkpoint_every

    @property
    def df(self) -> DataFrame | None:
        return self._df

    def add(self, urls: DataFrame) -> None:
        """Union new URLs in (caller guarantees they are not present —
        the engine always anti-joins before discovery).

        Parts handed in by the engine are already checkpointed, so the
        union chain is cheap to recompute; materializing the whole seen
        set is deferred to every ``checkpoint_every``-th add (a per-add
        checkpoint re-copies the entire set each round — measurable in
        the 10-row best-first rounds)."""
        part = urls.select(F.col("url"))
        if self._df is None:
            self._df = part.localCheckpoint(eager=True)
            return
        self._df = self._df.unionByName(part)
        self._adds_since_checkpoint += 1
        if self._adds_since_checkpoint >= self._checkpoint_every:
            self._df = self._df.localCheckpoint(eager=True)
            self._adds_since_checkpoint = 0

    def replace(self, df: DataFrame) -> None:
        """Atomically swap the stored set for ``df`` (a one-column
        ``url`` DataFrame) — the public mutation hook for removal /
        TTL-expiry flows (e.g. CuckooSeenStore.remove), so callers
        never reach into private state."""
        self._df = df.select("url").localCheckpoint(eager=True)
        self._adds_since_checkpoint = 0

    def remove(self, urls: DataFrame) -> None:
        """Drop the given urls from the set (anti-join + replace)."""
        if self._df is None:
            return
        gone = urls.select(F.col("url").alias("__gone"))
        kept = self._df.join(
            gone, F.col("url") == F.col("__gone"), "left_anti"
        )
        self.replace(kept)

    def anti_join(self, candidates: DataFrame, url_col: str) -> DataFrame:
        if self._df is None:
            return candidates
        seen = self._df.select(F.col("url").alias("__seen_url"))
        return candidates.join(
            seen, candidates[url_col] == seen["__seen_url"], "left_anti"
        )

    def contains_count(self) -> int:
        return self._df.count() if self._df is not None else 0

    def urls(self) -> list[str]:
        if self._df is None:
            return []
        return [r["url"] for r in self._df.collect()]


def with_xxhash_seg(df: DataFrame, url_col: str, n_segments: int) -> DataFrame:
    """Shared segment sharding for the probabilistic seen structures:
    segment(url) = pmod(xxhash64(url), S), hash kept as ``__h`` so the
    segment builders never re-hash Python-side."""
    h = F.xxhash64(F.col(url_col))
    return df.withColumn("__h", h).withColumn(
        "__seg", F.pmod(h, F.lit(n_segments)).cast("int")
    )


class ProbeConfirmSeenStore:
    """Shared shell for probabilistic-prefilter + exact-confirm seen
    stores (J1 at scale): ``self.prefilter`` (set by the subclass; any
    object with ``add(urls, url_col)`` / ``probe(candidates, url_col)``
    returning a ``maybe_seen`` column) answers membership per
    candidate; a probe "no" is definitely-new and skips the exact
    anti-join, a "maybe" is confirmed exactly — so the expensive exact
    join sees only |dups| + fp·|new| rows, never the whole frontier."""

    prefilter = None  # subclasses assign in __init__

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.exact = SeenStore(spark)
        self._last_probed: DataFrame | None = None

    @property
    def df(self) -> DataFrame | None:
        return self.exact.df

    def add(self, urls: DataFrame) -> None:
        self.exact.add(urls)
        self.prefilter.add(urls)

    def anti_join(self, candidates: DataFrame, url_col: str) -> DataFrame:
        if self.exact.df is None:
            return candidates
        # release the previous round's probe cache — its consumers have
        # materialized (the engine checkpoints every round), so holding
        # it would leak one cached DF per round into storage memory
        if self._last_probed is not None:
            self._last_probed.unpersist(blocking=False)
        probed = self.prefilter.probe(candidates, url_col).persist()
        self._last_probed = probed
        fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        confirmed_new = self.exact.anti_join(maybe, url_col)
        return fresh.unionByName(confirmed_new)

    def urls(self) -> list[str]:
        return self.exact.urls()

    def contains_count(self) -> int:
        return self.exact.contains_count()
