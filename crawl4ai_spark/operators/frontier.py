"""The batch-iterative crawl engine: frontier(t+1) = f(frontier(t)).

One crawl round is one DataFrame program (SURVEY.md §3.2):

    frontier_r
      → [politeness window: per-domain budget]          (async_dispatcher.py analog)
      → [robots broadcast join → 403 rows]              (async_webcrawler.py:383-397)
      → fetch = LEFT JOIN against the corpus table      (S1/S2: fetch is a lookup)
      → emit results_r (canonical emit_seq order)
      → discovery: explode(links) → normalize (Arrow UDF)
          → anti-join URL-seen → validity+filter chain (Column conjunction)
          → score (Column) → threshold → first-occurrence dedupe (window)
          → per-parent capacity trim (window over cumulative successes)
      → frontier_{r+1}; seen += discovered

Strategy semantics replicate the reference exactly (see oracle.py for
the list of replicated quirks and their file:line cites):

- BFS  (bfs_strategy.py:207-301): round = level; no mid-level break.
- BFF  (bff_strategy.py:193-361): round = one priority-queue pop of
  BATCH_SIZE items; ordering window = (-score, depth, url, parent) —
  exactly the reference's heap tuple; pop-time dedupe; break after the
  boundary page.
- DFS  (dfs_strategy.py:28-139): round = one popped stack item (strict
  parity mode; DFS is sequential by definition — the 10^10 scaling
  target applies to BFS/BFF frontiers).

Emission-order canonicalization: within a round, results are emitted in
frontier-sequence order (BFS) / pop order (BFF, DFS).  The reference's
within-level order is network-arrival nondeterministic; its tests only
assert level monotonicity and queue order, both of which this order
satisfies, and the oracle uses the same rule.

Scale notes (the part local[32] can't show): the fetch join and the
anti-join shuffle on url; the corpus side is pre-partitioned once and
reused every round; frontier rows per round ≪ corpus rows, so AQE
turns the fetch join into a broadcast when the round is small.  Skewed
hot domains only matter for the politeness window, which partitions by
(domain, salt) — see politeness.py.  The per-round global sequence
(emit_seq) is a single-partition window over ONE ROUND's rows only
(bounded by the politeness budget / BATCH_SIZE), never over the corpus.
"""

from __future__ import annotations

import math
import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.functions.filters import FilterChain, valid_crawl_url
from crawl4ai_spark.functions.normalize import with_normalized
from crawl4ai_spark.functions.scorers import Scorer
from crawl4ai_spark.operators.ordering import with_global_cumsum, with_global_rank
from crawl4ai_spark.operators.politeness import PolitenessSpec, PolitenessState
from crawl4ai_spark.operators.robots import RobotsRules
from crawl4ai_spark.operators.seen import SeenStore
from crawl4ai_spark.plans.stats import reset_stats_if_inflated

BATCH_SIZE = 10  # bff_strategy.py:19

# Seq epoch stride for politeness rate-limit requeues: attempt k of a
# URL carries seq = base_seq + k * STRIDE, so retried rows order after
# every fresh/deferred/child seq (reference priority = retry_count,
# async_dispatcher.py:217-226) while keeping first-enqueue tie order.
RETRY_SEQ_STRIDE = 1 << 44

# BFS fast-path (fuse_stats) checkpoint eagerness knobs — experiment
# handles for the per-round driver-job budget (VERDICT r3 #1).  With
# both False the steady-state BFS round submits ONE job (the fused
# bucket-count/success collect materializes the lazy emit + discovery
# checkpoints as part of its own stages) instead of three.  Strict/
# batched micro-loops are NOT governed by these (they measured slower
# deferred — see _checkpoint's r3 note).
BFS_EAGER_EMIT = False
BFS_EAGER_DISCOVERY = False

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("emit_seq", T.LongType()),
        T.StructField("round", T.IntegerType()),
        T.StructField("url", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("parent_url", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("success", T.BooleanType()),
        T.StructField("status_code", T.IntegerType()),
        # P7 schema parity: the reference's anti-bot retry loop
        # (async_webcrawler.py:399-646) stamps how many attempts a fetch
        # took; fetch-as-join always succeeds first try, so this is the
        # constant 0 — kept so result rows are column-compatible with a
        # live deployment that retries.
        T.StructField("retry_count", T.IntegerType()),
    ]
)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("parent_url", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("seq", T.LongType()),
    ]
)


@dataclass
class CrawlSpec:
    """Engine configuration — field-for-field the reference strategy
    constructor args (bfs_strategy.py:25-43)."""

    max_depth: int
    strategy: str = "bfs"  # bfs | dfs | best_first
    filter_chain: FilterChain = field(default_factory=FilterChain)
    scorer: Scorer | None = None
    include_external: bool = False
    score_threshold: float = -math.inf
    max_pages: float = math.inf
    politeness: PolitenessSpec | None = None
    robots: RobotsRules | None = None
    max_rounds: int = 10_000  # safety valve
    # best-first pop size: 10 = reference parity (bff_strategy.py:19);
    # larger batches amortize per-round cost at scale (same semantics,
    # different pop granularity)
    batch_size: int = BATCH_SIZE
    # URL-seen membership: "exact" (anti-join), "bloom" (partitioned
    # bloom-segment probe, then exact confirm — the 10^10 path), or
    # "cuckoo" (same probe shape, deletable fingerprints for TTL-style
    # re-crawl — seen_cuckoo.py)
    seen_mode: str = "exact"
    # resume from a reference-shape state dict (bfs_strategy.py:275-284,
    # dfs_strategy.py:106-120, bff_strategy.py:332-345)
    resume_state: dict | None = None
    # directory for per-round snapshots (plans/checkpoint.py); None = off
    checkpoint_dir: str | None = None
    # discovery-stage respread: None = auto (only when the round has
    # >5000 parents), True/False = force.  True is used by warm-up
    # crawls so they compile the exact plan shape of large rounds.
    repartition_discovery: bool | None = None
    # P3 MemoryAdaptiveDispatcher analog (async_dispatcher.py:155-288):
    # the reference throttles concurrent sessions when memory pressure
    # rises; here the per-round working set IS the frontier slice, so
    # the governor caps how many frontier rows fetch per round and
    # defers the rest — deferred rows keep their (lower) seqs, newly
    # discovered children rank after them, so the global emission order
    # is EXACTLY the ungoverned BFS order.  None = unbounded (Spark's
    # own memory management, the default).  BFS only; ignored when a
    # politeness spec already bounds the round.
    max_round_size: int | None = None
    # pre-built URL-seen store to resume membership from (TTL re-crawl
    # composition, operators/recrawl.py: build the store once, remove()
    # the expired urls, crawl again WITHOUT rebuilding the filter — the
    # whole point of deletable cuckoo segments).  BFS only; overrides
    # seen_mode.
    seen_store: object = None
    # cooperative cancellation callback (reference bfs_strategy.py:
    # 84-131): checked between rounds (per level for BFS/BFF, per URL
    # for strict DFS); a truthy return stops the crawl.  Exceptions
    # fail OPEN (crawl continues), mirroring the reference.
    should_cancel: object = None
    # per-URL state callback at the reference's cadence
    # (bfs_strategy.py:266-284): fired once per SUCCESSFUL URL with the
    # reference-shape state dict — visited/pending/depths as they stood
    # right after that URL's link_discovery, pages_crawled == i+1.
    # Parity mode (BFS only): deriving the per-URL stream collects the
    # round's emitted + discovered rows on the driver, so set this only
    # on driver-sized crawls; at scale use checkpoint_dir + the
    # per_url_states() snapshot reader instead (same states, derived
    # offline from the round snapshot).
    on_state_change: object = None


class CrawlEngine:
    """Deep-crawl over a corpus DataFrame with crawl4ai semantics."""

    FETCH_COLS = ["url", "success", "status_code", "links"]

    @classmethod
    def prepare_pages(cls, pages: DataFrame) -> DataFrame:
        """Project + hash-partition by url + persist the fetch-relevant
        corpus columns once; pass the result to several engines to share
        one cache.

        The repartition matters at scale: InMemoryRelation preserves
        the HashPartitioning(url) of the cached data, so every round's
        fetch join shuffles ONLY the (small) frontier side — without
        it, the whole corpus re-shuffles on every round.  Equivalent to
        bucketing the Iceberg pages table by url on a real deployment.
        """
        spark = pages.sparkSession
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # sortWithinPartitions: InMemoryRelation preserves outputOrdering,
        # so every round's sort-merge fetch join streams the cached
        # corpus with NO per-round sort — only the (small) frontier side
        # sorts.  Equivalent to bucketing AND sorting the Iceberg pages
        # table by url.
        return (
            pages.select(*cls.FETCH_COLS)
            .repartition(n, "url")
            .sortWithinPartitions("url")
            .persist()
        )

    def __init__(self, spark: SparkSession, pages: DataFrame, spec: CrawlSpec):
        self.spark = spark
        self.spec = spec
        if set(pages.columns) == set(self.FETCH_COLS):
            self.pages = pages  # already prepared (possibly shared cache)
        else:
            self.pages = self.prepare_pages(pages)
        self._result_parts: list[DataFrame] = []
        self._emit_count = 0
        # next unassigned frontier seq on the politeness path (set at
        # the first round's recount; stays None on non-politeness paths,
        # whose dense arithmetic needs no high-water mark)
        self._seq_high: int | None = None
        self._pages_crawled = 0
        self._metrics: list[dict] = []
        # final frontier/stack/queue — kept as a LAZY (df, order_cols)
        # pair; collected only inside export_state().  An unconditional
        # collect here would OOM the driver on a depth-capped run that
        # stops with a 10^8-row frontier.
        self._pending_df: DataFrame | None = None
        self._pending_order: list = []
        self._pending_kind: str = "pending"
        self._depths: dict[str, int] = {}
        self._cancelled = False
        # on_state_change bookkeeping (reference visited/depths streams;
        # only maintained when the callback is set)
        self._cb_visited: list[str] = []
        self._cb_depths: dict[str, int] = {}
        self._last_state: dict | None = None

    # -- cancellation (bfs_strategy.py:84-131 semantics) --------------------

    def cancel(self) -> None:
        """Stop before the next round; the in-flight round completes
        (the reference lets the current URL complete)."""
        self._cancelled = True

    @property
    def cancelled(self) -> bool:
        return self._cancelled

    def _check_cancellation(self) -> bool:
        """Internal flag OR the user callback; callback errors fail
        OPEN (crawl continues — bfs_strategy.py:120-129)."""
        if self._cancelled:
            return True
        cb = self.spec.should_cancel
        if cb is not None:
            try:
                if cb():
                    self._cancelled = True
                    return True
            except Exception:
                pass
        return False

    # -- public API ---------------------------------------------------------

    def run(self, start_url: str | list[str] | DataFrame) -> DataFrame:
        """Crawl from one seed (reference semantics), a seed list, or a
        seed DataFrame.

        Multi-seed is the scale mode: all seeds enter the round-0
        frontier and share one URL-seen set — the production-crawler
        behavior (the reference instead runs deep crawls sequentially
        per seed, async_webcrawler.py:1026-1052; our oracle implements
        the shared-frontier semantics for parity testing).

        A DataFrame seed source (column ``url``; optional ``seq`` for
        explicit ordering, otherwise seeds are ordered by url) never
        touches the driver — the 10^10-frontier entry path.  BFS only.
        """
        if isinstance(start_url, DataFrame):
            if self.spec.strategy != "bfs":
                raise ValueError("DataFrame seeds are supported for BFS only")
            if self.spec.on_state_change is not None:
                raise ValueError(
                    "on_state_change is a driver-sized parity mode; with "
                    "DataFrame seeds use checkpoint_dir + per_url_states()"
                )
            self._run_bfs(start_url)
            return self.results()
        if self.spec.seen_store is not None and self.spec.strategy != "bfs":
            raise ValueError("seen_store injection is supported for BFS only")
        seeds = [start_url] if isinstance(start_url, str) else list(start_url)
        if self.spec.strategy == "bfs":
            self._run_bfs(seeds)
        elif self.spec.strategy == "best_first":
            with self._micro_plan_mode(self.spec.batch_size <= 64):
                self._run_bff(seeds)
        elif self.spec.strategy == "dfs":
            with self._micro_plan_mode(True):
                self._run_dfs(seeds)
        elif self.spec.strategy == "dfs_batched":
            with self._micro_plan_mode(self.spec.batch_size <= 64):
                self._run_dfs_batched(seeds)
        else:
            raise ValueError(self.spec.strategy)
        return self.results()

    @contextmanager
    def _micro_plan_mode(self, enable: bool):
        """Micro-batch loops (strict parity: ≤ tens of rows per round,
        dozens of rounds) are driver-job-bound, and AQE re-plans every
        shuffle stage as its own job — measured 18.4 vs 8.2 jobs/round
        for the identical strict best-first crawl (test_job_budget
        methodology).  Disable AQE for the loop and restore after; the
        big-frame paths (BFS levels, batched modes above the threshold)
        keep AQE for partition coalescing and skew-join handling, where
        it earns its stage jobs back."""
        if not enable:
            yield
            return
        # the save/set/restore mechanics live in session.micro_plan_mode
        # (shared with the adaptive digest loop); this wrapper only adds
        # the enable gate keyed on batch size
        from crawl4ai_spark.session import micro_plan_mode

        with micro_plan_mode(self.spark):
            yield

    def results(self) -> DataFrame:
        if not self._result_parts:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        out = self._result_parts[0]
        for part in self._result_parts[1:]:
            out = out.unionByName(part)
        return out.orderBy("emit_seq")

    @property
    def metrics(self) -> list[dict]:
        """Per-round fetch/dedup/discovery counters (north rule:
        per-partition lineage + metrics; rolled up per round here,
        per-partition detail lives in the seen store)."""
        return self._metrics

    # -- shared round pieces --------------------------------------------------

    def _checkpoint(
        self, df: DataFrame, eager: bool = True, reset_stats: bool = True
    ) -> DataFrame:
        """Truncate lineage via localCheckpoint.

        ``eager=False`` defers materialization to the first job that
        reads the result.  Lazy is only safe when the FIRST reader is a
        single-branch job that computes EVERY partition (a collect, an
        eager checkpoint, a full-frame agg — or a head(1) over a plan
        that is provably one partition).  NOTE (r3, measured): naively
        deferring the strict loops' checkpoints ran them 1.7-2x SLOWER —
        the broadcast-probe fetch reads the frontier twice (keys build
        thread + probe), so the un-pinned plan was race-recomputed.  r4
        resolved it by pairing lazy pop checkpoints with the single-read
        fetch plan (``_fetch(single_read=True)``) so each round's slim
        collect is the sole materializer; job-count structure is pinned
        by tests/test_job_budget.py.

        ``reset_stats``: localCheckpoint PRESERVES the estimated plan
        stats, and in a round loop the estimate squares every round
        until Catalyst burns driver-minutes multiplying million-digit
        BigIntegers (see plans/stats.py).  Default on; the one caller
        whose downstream window relies on checkpoint-preserved
        partitioning (the BFS bucket rank) opts out."""
        out = df.localCheckpoint(eager=eager)
        if reset_stats:
            out = reset_stats_if_inflated(out)
        return out

    def _make_seen(self):
        if self.spec.seen_mode == "bloom":
            from crawl4ai_spark.operators.seen_bloom import BloomSeenStore

            return BloomSeenStore(self.spark)
        if self.spec.seen_mode == "cuckoo":
            from crawl4ai_spark.operators.seen_cuckoo import CuckooSeenStore

            return CuckooSeenStore(self.spark)
        return SeenStore(self.spark)

    # fetch joins with a known frontier size at or below this take the
    # broadcast-probe plan (measured faster for strict/batched pops of
    # 1-500 rows: 0.28 s vs 0.34 s per action at 500k pages/local[4],
    # and it can never broadcast or sort the corpus).  Above it — BFS
    # levels — the partitioned join wins locally (hash-partitioned
    # cached corpus, only the frontier shuffles; 0.17 s vs 0.43 s at a
    # 30k frontier) and is the right 100-TB plan when the Iceberg pages
    # table is bucketed AND sorted by url (sort-merge streams the
    # corpus with no per-round sort).
    BROADCAST_FETCH_MAX_ROWS = 2_000

    def _fetch(
        self,
        frontier: DataFrame,
        n_rows_hint: int | None = None,
        single_read: bool = False,
    ) -> DataFrame:
        """frontier ⋈ corpus (left) + robots gate. Missing page ⇒
        failed result (arun on unreachable URL returns success=False).

        ``n_rows_hint``: exact upper bound on the frontier's row count
        when the caller knows it (strict pops ≤ batch_size; BFS tracks
        n_frontier arithmetically).  Small frontiers take a two-step
        plan: an outer join can never build from the small (preserved)
        side, so Catalyst either broadcasts the whole corpus (small SF)
        or sort-merge-joins — re-sorting the cached corpus every round
        (large SF).  Instead: (1) probe the corpus scan once with a
        broadcast hash of the distinct frontier urls (inner BHJ, no
        corpus sort/shuffle/broadcast), (2) left-join the frontier
        against the ≤ n_rows_hint surviving page rows, themselves
        broadcast — a legal BuildRight outer join.  Output is identical
        to the direct left join (corpus urls are unique).

        ``single_read=True`` forces the direct partitioned left join
        instead, which reads the frontier plan exactly ONCE.  The
        broadcast-probe plan reads it twice (keys build + probe), so a
        frontier whose lineage contains a LAZY localCheckpoint would be
        race-recomputed by the broadcast-build thread — the r3 pathology
        that made deferred checkpoints slower (_checkpoint's note).  The
        strict loops use this so the whole round fuses into the one
        collect that materializes the lazy parts; per-action cost is
        within noise of the probe plan (0.34 vs 0.28 s at 500k pages)
        now that the cached corpus is sorted within partitions (no
        per-round corpus sort — see prepare_pages)."""
        if not single_read and (
            n_rows_hint is not None
            and n_rows_hint <= self.BROADCAST_FETCH_MAX_ROWS
        ):
            keys = frontier.select("url").distinct()
            page_side = self.pages.join(F.broadcast(keys), "url", "inner")
            fetched = frontier.join(F.broadcast(page_side), "url", "left")
        else:
            fetched = frontier.join(self.pages, "url", "left")
        robots = self.spec.robots
        if robots is not None:
            blocked = robots.blocked_column(F.col("url"))
            # Blocked rows: success=False, 403, never fetched, no links
            # (async_webcrawler.py:383-397).
            fetched = fetched.withColumn(
                "success",
                F.when(blocked, F.lit(False)).otherwise(F.col("success")),
            ).withColumn(
                "status_code",
                F.when(blocked, F.lit(403)).otherwise(F.col("status_code")),
            ).withColumn(
                "links",
                F.when(blocked, F.lit(None).cast(fetched.schema["links"].dataType))
                .otherwise(F.col("links")),
            )
        return fetched.withColumn(
            "success", F.coalesce(F.col("success"), F.lit(False))
        ).withColumn("status_code", F.coalesce(F.col("status_code"), F.lit(0)))

    def _emit(
        self, fetched: DataFrame, round_no: int, order_cols: list,
        n_rows_hint: int | None = 0, eager: bool = True,
    ) -> DataFrame:
        ranked = with_global_rank(
            fetched, order_cols, "__emit_rn", n_rows_hint=n_rows_hint
        )
        # retry_count rides the frontier only once a politeness requeue
        # happened (models.py:361-370 carries it on every result)
        rc_col = (
            F.coalesce(F.col("retry_count"), F.lit(0)).cast("int")
            if "retry_count" in fetched.columns
            else F.lit(0).cast("int")
        )
        emitted = (
            ranked.withColumn(
                "emit_seq", F.col("__emit_rn") + F.lit(self._emit_count) - 1
            )
            .drop("__emit_rn")
            .withColumn("round", F.lit(round_no))
            .select(
                "emit_seq", "round", "url", "depth", "parent_url",
                "score", "success", "status_code",
                rc_col.alias("retry_count"),
                # carried for discovery:
                "links",
            )
        )
        return self._checkpoint(emitted, eager=eager)

    def _discover_candidates(
        self, parents: DataFrame, carry: tuple = (), n_parents_hint: int = 0,
        defer_url_filters: bool = False,
    ) -> DataFrame:
        """explode links → normalize → validity + filter chain + score.

        ``parents`` needs: url (source), emit_seq, depth, links.
        Returns: norm_url, parent_url, next_depth, link_idx, emit_seq, score.

        ``defer_url_filters=True`` skips the validity/filter-chain/score
        steps (and the norm_url isNotNull guard): the caller applies
        ``_url_filters_and_score`` AFTER the first-occurrence dedupe
        instead.  Legal because every one of those predicates (and the
        score) is a pure Column function of ``norm_url`` — the dedupe
        key — so all occurrences of a key pass or fail together: the
        set of surviving keys AND the chosen first-occurrence
        representative per key are identical whether the filter runs
        before or after the dedupe window.  (The ``next_depth`` guard
        is NOT key-pure — deferred/governor rows mix depths within a
        round — so it always stays here, pre-dedupe.)  The win is
        plan-shape (r4, measured): Catalyst's filter pushdown inlines
        the whole normalize expression into every predicate that
        consumes ``norm_url`` (validity regexes, chain, 4 scorer
        regexes ⇒ 6-8 re-evaluations per candidate row); after the
        dedupe exchange ``norm_url`` is a concrete attribute and the
        row count has collapsed by the graph's in-degree (~3-4x), so
        the predicates run ONCE per unique URL — this halved the
        per-round discovery CPU on the scaling workload.
        """
        spec = self.spec
        do_repart = (
            spec.repartition_discovery
            if spec.repartition_discovery is not None
            else n_parents_hint > 5000
        )
        if do_repart:
            # The fetch-join output AQE-coalesces to few partitions (the
            # frontier is small in bytes); without respreading, the
            # explode→normalize→score stage runs nearly serial.  One
            # round-robin shuffle of the parents (cheap: pre-explode row
            # count) restores full parallelism for the round's heaviest
            # stage.
            parents = parents.repartition(
                self.spark.sparkContext.defaultParallelism
            )
        linked = parents.select(
            F.col("url").alias("src_url"),
            "emit_seq",
            "depth",
            *carry,
            F.posexplode_outer("links").alias("link_idx", "link"),
        ).filter(F.col("link").isNotNull())
        if not spec.include_external:
            linked = linked.filter(~F.col("link.is_external"))
        cand = with_normalized(linked, "link.href", "src_url")
        cand = cand.withColumn("next_depth", F.col("depth") + 1).filter(
            F.col("next_depth") <= spec.max_depth
        )
        if defer_url_filters:
            return cand
        return self._url_filters_and_score(
            cand.filter(F.col("norm_url").isNotNull())
        )

    def _url_filters_and_score(self, cand: DataFrame) -> DataFrame:
        """Validity + filter chain + score (+ threshold) over norm_url —
        the key-pure tail of discovery; see ``_discover_candidates``'s
        ``defer_url_filters`` note for why callers may apply it after
        the dedupe window instead of inline."""
        spec = self.spec
        ok = valid_crawl_url(F.col("norm_url")) & spec.filter_chain.column(
            F.col("norm_url")
        )
        cand = cand.filter(ok)
        score_col = (
            spec.scorer.column(F.col("norm_url")) if spec.scorer else F.lit(0.0)
        )
        cand = cand.withColumn("score", score_col)
        if spec.score_threshold != -math.inf:
            cand = cand.filter(F.col("score") >= F.lit(float(spec.score_threshold)))
        return cand

    # -- BFS ------------------------------------------------------------------

    def _run_bfs(self, seeds: list[str]) -> None:
        spark = self.spark
        spec = self.spec
        # BFS visited: discovery-time set, seeds NOT included
        seen = spec.seen_store if spec.seen_store is not None else self._make_seen()
        self.seen_store = seen
        rs = spec.resume_state
        if rs:
            visited_df = rs.get("visited_df")
            if visited_df is not None:
                # table-resume path (VERDICT r2 #9): the seen set enters
                # as a DataFrame and never touches the driver
                seen.add(visited_df.select("url"))
                if spec.on_state_change is not None:
                    # the callback's state dicts must include the
                    # pre-resume visited set; on_state_change is a
                    # documented driver-sized parity mode, so the
                    # collect is within its contract
                    self._cb_visited = [
                        r["url"] for r in visited_df.select("url").collect()
                    ]
            else:
                visited = rs.get("visited", [])
                if visited:
                    seen.add(
                        spark.createDataFrame([(u,) for u in visited], "url string")
                    )
                if spec.on_state_change is not None:
                    self._cb_visited = list(visited)
            depths = dict(rs.get("depths", {}))
            self._depths.update(depths)
            if spec.on_state_change is not None:
                self._cb_depths.update(depths)
            self._pages_crawled = int(rs.get("pages_crawled", 0))
            pending_df = rs.get("pending_df")
            if pending_df is not None:
                # rows carry their own depth; seq (if present) is an
                # order hint re-ranked to the dense form the engine needs
                order = (
                    [F.asc("seq"), F.asc("url")]
                    if "seq" in pending_df.columns
                    else [F.asc("url")]
                )
                # Re-expand the retry-epoch seq offsets the export's
                # dense re-rank collapsed: without this, a previously
                # requeued row (dense seq < n) would order AHEAD of
                # children discovered after resume (seq ≥ n) —
                # inverting the dispatcher's retried-behind-everything
                # ordering.  Epoch = retry_count × stride, base = the
                # dense rank (unique), exactly the live encoding.
                rc_epoch = (
                    F.coalesce(F.col("retry_count"), F.lit(0)).cast("long")
                    * F.lit(RETRY_SEQ_STRIDE)
                    if "retry_count" in pending_df.columns
                    and spec.politeness is not None
                    else F.lit(0).cast("long")
                )
                frontier = with_global_rank(
                    pending_df, order, "__rs_seq"
                ).select(
                    "url",
                    F.col("parent_url").cast("string"),
                    F.col("depth").cast("int"),
                    F.lit(0.0).alias("score"),
                    ((F.col("__rs_seq") - F.lit(1)).cast("long") + rc_epoch)
                    .alias("seq"),
                    *(
                        [F.col("retry_count").cast("int").alias("retry_count")]
                        if "retry_count" in pending_df.columns
                        else []
                    ),
                )
            else:
                pending_items = rs.get("pending", [])
                if any("retry_count" in it for it in pending_items):
                    # same epoch re-expansion as the table-resume path
                    _stride = (
                        RETRY_SEQ_STRIDE if spec.politeness is not None else 0
                    )
                    frontier = spark.createDataFrame(
                        [
                            (it["url"], it.get("parent_url"),
                             int(depths.get(it["url"], 0)), 0.0,
                             i + int(it.get("retry_count", 0)) * _stride,
                             int(it.get("retry_count", 0)))
                            for i, it in enumerate(pending_items)
                        ],
                        T.StructType(
                            FRONTIER_SCHEMA.fields
                            + [T.StructField("retry_count", T.IntegerType())]
                        ),
                    )
                else:
                    frontier = spark.createDataFrame(
                        [
                            (it["url"], it.get("parent_url"),
                             int(depths.get(it["url"], 0)), 0.0, i)
                            for i, it in enumerate(pending_items)
                        ],
                        FRONTIER_SCHEMA,
                    )
        elif isinstance(seeds, DataFrame):
            # distributed seed source: never collected on the driver
            sdf = seeds
            if "seq" in sdf.columns:
                # Caller-supplied seq is an ORDER, not a sequence: it is
                # re-ranked to the dense 1-based form the engine's
                # emit_seq==seq fast path requires (a sparse/0-based/
                # duplicated caller seq would silently corrupt emit order
                # otherwise); url breaks ties deterministically.
                sdf = with_global_rank(
                    sdf.select("url", F.col("seq").alias("__user_seq")),
                    [F.asc("__user_seq"), F.asc("url")], "seq",
                )
            else:
                sdf = with_global_rank(
                    sdf.select("url").dropDuplicates(["url"]),
                    [F.asc("url")], "seq",
                )
            frontier = sdf.select(
                F.col("url"),
                F.lit(None).cast("string").alias("parent_url"),
                F.lit(0).cast("int").alias("depth"),
                F.lit(0.0).alias("score"),
                (F.col("seq") - F.lit(1)).cast("long").alias("seq"),
            )
        else:
            frontier = spark.createDataFrame(
                [(s, None, 0, 0.0, i) for i, s in enumerate(seeds)], FRONTIER_SCHEMA
            )
            self._depths.update({s: 0 for s in seeds})
            if spec.on_state_change is not None:
                self._cb_depths.update({s: 0 for s in seeds})
        politeness: PolitenessState | None = (
            PolitenessState(spark, spec.politeness)
            if spec.politeness is not None
            else None
        )
        self.politeness_state = politeness
        round_no = 0
        # Minimum depth in the round-0 frontier (driver-known): fresh
        # seeds start at 0; resumed pending rows carry their own depths.
        # Materialize the initial frontier once; every later round
        # inherits a cached next-frontier plus its exact row count from
        # the discovery pass, so the steady-state loop top is job-free
        # (the round-1 shape paid 2 driver jobs per round just to learn
        # a number the rank pass already knew).
        frontier = self._checkpoint(frontier)
        if rs and rs.get("pending_df") is not None:
            # table-resume: min depth rides the same job as the count
            row0 = frontier.agg(
                F.count("*").alias("n"), F.min("depth").alias("d")
            ).collect()[0]
            n_frontier = int(row0["n"])
            base_min_depth = int(row0["d"] or 0)
        else:
            if rs:
                base_min_depth = min(
                    (int(depths.get(it["url"], 0)) for it in rs.get("pending", [])),
                    default=0,
                )
            else:
                base_min_depth = 0
            n_frontier = frontier.count()
        while round_no < spec.max_rounds and not self._check_cancellation():
            if self._pages_crawled >= spec.max_pages:
                break
            if n_frontier == 0:
                break
            t = {}

            if politeness is not None:
                # parity path: deferred rows re-enter the frontier, so the
                # size must be re-measured and the plan re-truncated.
                # LAZY checkpoint + count fused into ONE job (VERDICT r3
                # missing #5): count() is the first reader and computes
                # every partition, so it materializes the checkpoint's
                # blocks in its own stages — every later reader (the
                # budget split, the fetch) sees pinned blocks.
                t0 = time.time()
                frontier = self._checkpoint(frontier, eager=False)
                n_frontier = frontier.count()
                t["frontier_ckpt"] = round(time.time() - t0, 3)
                if n_frontier == 0:
                    break
                if self._seq_high is None:
                    # round 0: the frontier is the dense-seq'd seed set
                    # (requeue-epoch offsets only appear later), so its
                    # size is the next unassigned child seq.  Children
                    # must rank after every deferred row's ORIGINAL seq
                    # — basing them on emit counts instead collides a
                    # deferred row with a child (same seq ⇒ shuffle-
                    # order-dependent budget/emission ties).
                    self._seq_high = n_frontier
                frontier_now, deferred = politeness.split_budget(frontier)
                n_defer = None  # unknown until the loop-top recount
            elif (
                spec.max_round_size is not None
                and n_frontier > spec.max_round_size
            ):
                # memory governor: fetch the dense seq-prefix of the
                # frontier, defer the rest — emit_seq == seq still holds
                # for the fetched slice, and both split sizes are known
                # arithmetically (no extra jobs).  Deferred rows chain
                # filter/union plans across rounds; a checkpoint every 4
                # splits bounds the plan depth.
                gov_splits = getattr(self, "_gov_splits", 0) + 1
                self._gov_splits = gov_splits
                if gov_splits % 4 == 0:
                    frontier = self._checkpoint(frontier)
                cutoff = self._emit_count + spec.max_round_size
                frontier_now = frontier.filter(F.col("seq") < F.lit(cutoff))
                deferred = frontier.filter(F.col("seq") >= F.lit(cutoff))
                n_defer = n_frontier - spec.max_round_size
            else:
                frontier_now, deferred = frontier, None
                n_defer = 0

            t0 = time.time()
            # n_frontier is exact (recounted above when politeness is
            # on), so it upper-bounds frontier_now in every branch; the
            # max_round_size cap tightens it ONLY on the governor path —
            # the politeness split is per-domain and ignores
            # max_round_size, so min()-ing there would understate a
            # large budget-passing frontier and mis-route it onto the
            # broadcast-probe fetch plan
            hint = n_frontier
            if politeness is None and spec.max_round_size is not None:
                hint = min(hint, spec.max_round_size)
            fetched = self._fetch(frontier_now, n_rows_hint=hint)
            requeued = None
            pol_outcomes = None
            if politeness is None:
                # Without a politeness split the frontier's seq is dense
                # [emit_count, emit_count + n): each round's next-frontier
                # ranks start exactly at the updated emit counter and every
                # frontier row is fetched+emitted.  emit_seq == seq, so the
                # global rank is skipped entirely.
                # Fast path (max_pages unbounded): the checkpoint is LAZY —
                # the round's single fused collect below materializes these
                # blocks inside its own stages, saving one driver job per
                # round (the per-job floor is the scaling-efficiency tax).
                # The capacity path keeps it eager: its stats collect and
                # cumsum window read emitted before discovery exists.
                emit_eager = (
                    BFS_EAGER_EMIT
                    or spec.max_pages != math.inf
                    or spec.on_state_change is not None
                    or spec.checkpoint_dir is not None
                )
                # a frontier resumed from a cancelled requeue crawl can
                # carry retry_count even without politeness configured —
                # preserve it instead of resetting attempts to 0
                rc_col = (
                    F.coalesce(F.col("retry_count"), F.lit(0)).cast("int")
                    if "retry_count" in fetched.columns
                    else F.lit(0).cast("int")
                )
                emitted = self._checkpoint(
                    fetched.withColumn("emit_seq", F.col("seq"))
                    .withColumn("round", F.lit(round_no))
                    .select(
                        "emit_seq", "round", "url", "depth", "parent_url",
                        "score", "success", "status_code",
                        rc_col.alias("retry_count"),
                        "links",
                    ),
                    eager=emit_eager,
                )
            else:
                if spec.politeness.requeue:
                    # Rate-limit requeue (PolitenessSpec.requeue — the
                    # dispatcher's memory-requeue loop shape,
                    # async_dispatcher.py:288-318, driven by
                    # update_delay's fail budget, :65-75):
                    # the verdict is a JVM window over the pre-update
                    # domain state; requeued responses produce NO result
                    # row and re-enter the next frontier with
                    # retry_count+1.  Eager checkpoint: the verdict,
                    # the emission and the state fold all read it, and
                    # the verdict plan must pin the PRE-round state.
                    verd = self._checkpoint(
                        politeness.with_requeue(fetched, order_col="seq")
                    )
                    requeued = verd.filter(F.col("__requeue"))
                    emitted = self._emit(
                        verd.filter(~F.col("__requeue")).drop("__requeue"),
                        round_no, [F.col("seq")], n_rows_hint=n_frontier,
                    )
                    # the state fold sees EVERY response, requeued ones
                    # included, in fetch (seq) order — the reference
                    # calls update_delay on each response it requeues
                    pol_outcomes = verd.select(
                        F.col("seq").alias("emit_seq"), "url", "status_code"
                    )
                else:
                    emitted = self._emit(
                        fetched, round_no, [F.col("seq")], n_rows_hint=n_frontier
                    )
            # Fast path (no politeness, no page cap): the emitted count
            # is ARITHMETIC — emit_seq == seq and every frontier_now row
            # is fetched+emitted — and the success sum is deferred to
            # ride the discovery's bucket-count collect below (one fused
            # driver job instead of a separate stats job per round; the
            # per-job floor is the scaling-efficiency tax at small
            # rounds).  Paths that need the success count BEFORE
            # building discovery (politeness re-entry, max_pages
            # capacity) keep the explicit stats job.
            fuse_stats = politeness is None and spec.max_pages == math.inf
            if fuse_stats:
                n_round = (
                    min(n_frontier, spec.max_round_size)
                    if n_defer
                    else n_frontier
                )
                n_success = None  # resolved by the fused collect below
            else:
                stats = emitted.agg(
                    F.count("*").alias("n"),
                    F.sum(F.col("success").cast("long")).alias("ok"),
                ).collect()[0]
                n_round = int(stats["n"])
                n_success = int(stats["ok"] or 0)
            t["fetch_emit_stats"] = round(time.time() - t0, 3)
            prior_crawled = self._pages_crawled
            self._result_parts.append(emitted.drop("links"))
            if not fuse_stats:
                self._pages_crawled += n_success
                round_metrics = {
                    "round": round_no,
                    "strategy": "bfs",
                    "fetched": n_round,
                    "succeeded": n_success,
                    "pages_crawled": self._pages_crawled,
                    "t": t,
                }
                if requeued is not None:
                    # requeued responses were fetched too — without this
                    # the metric undercounts every rate-limited fetch
                    # (count rides the already-pinned verdict checkpoint)
                    n_req = requeued.count()
                    round_metrics["fetched"] = n_round + n_req
                    round_metrics["requeued"] = n_req
                self._metrics.append(round_metrics)
            if politeness is not None:
                politeness.update(
                    pol_outcomes
                    if pol_outcomes is not None
                    else emitted.select("emit_seq", "url", "status_code"),
                    round_no,
                )

            # ---- discovery over this round's successful parents ----
            # Arithmetic last-round skip: in a pure BFS (no politeness
            # deferrals) round r's parents all sit at depth
            # base_min_depth + r, so when that reaches max_depth every
            # child would fail the next_depth guard — the reference
            # returns from link_discovery before touching visited
            # (bfs_strategy.py:141-152), and the engine can skip the
            # whole discovery job (its fixed stage/scheduling floor is
            # pure waste on a provably-empty result).
            if (
                politeness is None
                and spec.max_round_size is None
                and base_min_depth + round_no >= spec.max_depth
            ):
                if fuse_stats:
                    # no discovery job to ride on the last round — the
                    # success sum gets its own (small) agg over the
                    # checkpointed emit blocks, same as the old shape
                    n_success = int(
                        emitted.agg(
                            F.sum(F.col("success").cast("long")).alias("ok")
                        ).collect()[0]["ok"]
                        or 0
                    )
                    self._pages_crawled += n_success
                    self._metrics.append(
                        {
                            "round": round_no,
                            "strategy": "bfs",
                            "fetched": n_round,
                            "succeeded": n_success,
                            "pages_crawled": self._pages_crawled,
                            "t": t,
                        }
                    )
                self._emit_count += n_round
                frontier = spark.createDataFrame([], FRONTIER_SCHEMA)
                n_frontier = 0
                round_no += 1
                if spec.on_state_change is not None:
                    self._fire_bfs_states(emitted, None, None, prior_crawled)
                if spec.checkpoint_dir:
                    self._snapshot_round(
                        round_no, frontier=frontier,
                        results=emitted.drop("links"),
                    )
                continue
            parents = emitted.filter(F.col("success"))
            if spec.max_pages != math.inf:
                # cumulative successes in emit order = _pages_crawled at
                # the time each parent's link_discovery ran
                # (bfs_strategy.py:266-271); only the capacity cut needs it
                parents = with_global_cumsum(
                    parents, ["emit_seq"], F.col("success").cast("long"),
                    "crawled_incl", n_rows_hint=n_frontier,
                ).withColumn("crawled_incl", F.col("crawled_incl").cast("long"))
                # a parent whose remaining capacity is ≤ 0 skips
                # link_discovery entirely — its candidates never reach the
                # visited set (bfs_strategy.py:148-152)
                parents = parents.filter(
                    (F.lit(int(spec.max_pages)) - F.lit(prior_crawled)
                     - F.col("crawled_incl")) >= 1
                )
                carry = ("crawled_incl",)
            else:
                carry = ()
            t0 = time.time()
            cand = self._discover_candidates(
                parents, carry=carry, n_parents_hint=n_round,
                defer_url_filters=True,
            )
            # first-occurrence dedupe within the level == the reference's
            # sequential visited.add at discovery time (bfs_strategy.py:186).
            # (emit_seq, link_idx) is unique per candidate row, so the
            # lexicographic MIN struct is exactly the rank-1 row of a
            # window ordered by (emit_seq, link_idx) — but as a hash
            # AGGREGATE instead of a window: duplicates collapse map-side
            # before the exchange (the window shuffled and then SORTED
            # every candidate row), only the slim carried columns ride
            # the shuffle (the href struct and parent depth are dropped
            # here instead of riding two exchanges), and the output stays
            # hash-partitioned on norm_url, which the seen anti-join
            # below reuses — ONE candidate-scale exchange per round
            # instead of two.
            keep = ["emit_seq", "link_idx", "src_url", "next_depth", *carry]
            deduped = (
                cand.groupBy("norm_url")
                .agg(F.min(F.struct(*keep)).alias("__first"))
                .select("norm_url", "__first.*")
            )
            # deferred key-pure predicates + score: once per UNIQUE url,
            # on the post-exchange attribute (see _discover_candidates).
            # Key-purity also means validity/chain/score and the seen
            # anti-join all act per-norm_url, so they commute with the
            # dedupe — the cheapest legal order is dedupe → filter →
            # anti-join: the join probes only unique surviving URLs and
            # its probe side arrives co-partitioned from the groupBy.
            # Runs before seen.add in every branch below, so invalid
            # URLs never enter visited (reference filters before
            # visited.add, bfs_strategy.py:170-186).
            deduped = self._url_filters_and_score(deduped)
            deduped = seen.anti_join(deduped, "norm_url")
            if spec.max_pages != math.inf:
                # parity path: the seen set takes ALL deduped (pre-trim)
                # rows — trimmed-off URLs are never crawled later
                # (reference quirk, bfs_strategy.py:186-196) — so pre-trim
                # rows must be materialized separately
                deduped = self._checkpoint(deduped)
                seen.add(deduped.select(F.col("norm_url").alias("url")))
            # else: no trim filter ⇒ post-shuffle rows ≡ deduped rows;
            # the seen part is taken from the bucket-shuffle checkpoint
            # below (zero recompute, one materialization per round)

            # capacity trim per parent: remaining = max_pages - crawled@parent
            if spec.max_pages != math.inf:
                capacity = (
                    F.lit(int(spec.max_pages))
                    - F.lit(prior_crawled)
                    - F.col("crawled_incl")
                )
            else:
                capacity = F.lit(None).cast("long")
            if spec.max_pages != math.inf:
                order_cols = (
                    [F.desc("score"), F.asc("link_idx")]
                    if spec.scorer
                    else [F.asc("link_idx")]
                )
                w_parent = Window.partitionBy("emit_seq").orderBy(*order_cols)
                w_count = Window.partitionBy("emit_seq")
                trimmed = deduped.withColumn(
                    "trim_rn", F.row_number().over(w_parent)
                ).withColumn("n_valid", F.count("*").over(w_count))
                trimmed = trimmed.withColumn("capacity", capacity).filter(
                    F.col("trim_rn") <= F.col("capacity")
                )
                # when a parent overflows AND a scorer is set, the kept
                # children enter the next level in score order (the
                # reference sorts valid_links in place only on overflow,
                # bfs_strategy.py:189-196); otherwise discovery order
                child_ord = F.when(
                    F.col("n_valid") > F.col("capacity"), F.col("trim_rn")
                ).otherwise(F.col("link_idx"))
                trimmed = trimmed.withColumn("child_ord", child_ord)
            else:
                # no capacity ⇒ no trim: skip the per-parent windows (and
                # their emit_seq shuffle) entirely — children keep
                # discovery order
                trimmed = deduped.withColumn("child_ord", F.col("link_idx"))

            # Global rank over (emit_seq, child_ord) WITHOUT range
            # sampling: parent emit_seq is dense in [emit_base,
            # emit_base+n), so bucket = floor((emit_seq-base)·P/n) is a
            # monotone key-aligned partitioner computed JVM-side.  One
            # hash shuffle on the bucket + per-bucket counts gives both
            # the exact global rank (same order as a single-partition
            # window) AND the next frontier's row count — no sampling
            # pass, no re-checkpoint + count job at the next loop top.
            n_emit = n_round
            emit_base = self._emit_count
            n_parts = self.spark.sparkContext.defaultParallelism
            # more buckets than partitions: hash(small int) % P collides
            # (≈1/e of partitions would sit empty with P buckets); ~8
            # buckets per partition evens the load without sampling
            n_buckets = min(max(n_emit, 1), 8 * n_parts)
            bucket = F.floor(
                ((F.col("emit_seq") - F.lit(emit_base)) * F.lit(n_buckets))
                / F.lit(max(n_emit, 1))
            ).cast("int")
            # Eager checkpoint (NOT persist): the discovery pipeline runs
            # exactly once here, lineage is truncated (next round's plans
            # and the seen chain read raw row blocks), and no
            # cache-manager plan matching is involved.
            # reset_stats=False: the rank window below PARTITIONS BY __b
            # and counts on Spark remembering this checkpoint's hash
            # partitioning — a stats reset would forget it and re-shuffle
            shuffled = self._checkpoint(
                trimmed.withColumn("__b", bucket).repartition(n_parts, "__b"),
                # fast path: lazy — the fused collect below is this
                # round's ONE job and materializes the blocks itself
                eager=(
                    BFS_EAGER_DISCOVERY
                    or not fuse_stats
                    or spec.on_state_change is not None
                    or spec.checkpoint_dir is not None
                ),
                reset_stats=False,
            )
            if spec.max_pages == math.inf:
                seen.add(shuffled.select(F.col("norm_url").alias("url")))
            if fuse_stats:
                # ONE collect serves the round's two scalars/maps: the
                # per-bucket counts (rank offsets + next frontier size)
                # and the emit success sum — both read already-pinned
                # checkpoint blocks, so the crossJoin costs nothing over
                # the bucket-count job it rides on.
                fused_rows = (
                    shuffled.groupBy("__b")
                    .agg(F.count("*").alias("cnt"))
                    .crossJoin(
                        emitted.agg(
                            F.sum(F.col("success").cast("long")).alias("ok")
                        )
                    )
                    .collect()
                )
                bcounts = {r["__b"]: r["cnt"] for r in fused_rows}
                if fused_rows:
                    n_success = int(fused_rows[0]["ok"] or 0)
                else:
                    # empty discovery ⇒ the crossJoin produced no rows;
                    # the success sum needs its own small agg
                    n_success = int(
                        emitted.agg(
                            F.sum(F.col("success").cast("long")).alias("ok")
                        ).collect()[0]["ok"]
                        or 0
                    )
                self._pages_crawled += n_success
                self._metrics.append(
                    {
                        "round": round_no,
                        "strategy": "bfs",
                        "fetched": n_round,
                        "succeeded": n_success,
                        "pages_crawled": self._pages_crawled,
                        "t": t,
                    }
                )
            else:
                bcounts = {
                    r["__b"]: r["cnt"]
                    for r in shuffled.groupBy("__b")
                    .agg(F.count("*").alias("cnt"))
                    .collect()
                }
            t["discover"] = round(time.time() - t0, 3)
            n_next = sum(bcounts.values())
            offsets, acc = {}, 0
            for b in sorted(bcounts):
                offsets[b] = acc
                acc += bcounts[b]
            if offsets:
                offset_map = F.create_map(
                    *[F.lit(x) for b, off in offsets.items() for x in (b, off)]
                )
                offset_col = F.coalesce(offset_map[F.col("__b")], F.lit(0))
            else:
                offset_col = F.lit(0)
            # children's seq base: on the politeness path, deferred rows
            # keep their ORIGINAL seqs, so children must start at the
            # tracked high-water mark (seq ever assigned), not at the
            # emit counter — emit-based bases collide with deferrals.
            # The governor/capacity paths stay on the dense arithmetic
            # (their deferred slice is exactly [cutoff, end), so
            # emit_count + n_emit + n_defer IS the frontier end).
            if politeness is not None:
                child_base = self._seq_high
                self._seq_high += n_next
            else:
                child_base = self._emit_count + n_emit + (n_defer or 0)
            w_next = Window.partitionBy("__b").orderBy("emit_seq", "child_ord")
            next_frontier = shuffled.withColumn(
                "__next_rn", F.row_number().over(w_next) + offset_col
            ).select(
                F.col("norm_url").alias("url"),
                F.col("src_url").alias("parent_url"),
                F.col("next_depth").alias("depth"),
                F.col("score"),
                # children rank AFTER any governor-deferred rows so the
                # next frontier's seqs stay dense and in BFS order
                (F.col("__next_rn") + F.lit(child_base) - 1).alias("seq"),
                # parent's emit_seq: lets the per-URL state stream
                # (on_state_change / per_url_states) attribute each child
                # to the URL whose link_discovery produced it
                F.col("emit_seq").alias("src_emit_seq"),
            )
            self._emit_count += n_emit
            # pre-trim discovered rows (what the reference adds to
            # `visited` BEFORE the capacity cut, bfs_strategy.py:186-196)
            discovered_src = (
                deduped if spec.max_pages != math.inf else shuffled
            )
            if spec.on_state_change is not None:
                self._fire_bfs_states(
                    emitted, discovered_src, next_frontier, prior_crawled
                )
            if deferred is not None:
                next_frontier = deferred.unionByName(
                    next_frontier, allowMissingColumns=True
                )
                # politeness deferrals make the true size unknown here
                # (the loop top re-counts; -1 keeps the fast-path break
                # from firing); governor deferrals are arithmetic
                n_frontier = -1 if n_defer is None else n_next + n_defer
            else:
                n_frontier = n_next
            if requeued is not None:
                # Rate-limited responses re-enter behind EVERYTHING
                # (the dispatcher's requeue loop enqueues at priority =
                # retry_count, async_dispatcher.py:217-226,290-293 —
                # see PolitenessSpec.requeue for why the engine points
                # that loop at rate limits): seq moves to a
                # per-retry epoch — base seq (stable across retries via
                # pmod) + retry_count * 2^44 — so retried rows sort
                # after all fresh/deferred/child seqs, later retries
                # after earlier ones, and ties keep first-enqueue order.
                # 2^44 emitted URLs (~10^13) before collision is beyond
                # any single crawl's emit counter.
                rc = (
                    F.coalesce(F.col("retry_count"), F.lit(0))
                    if "retry_count" in requeued.columns
                    else F.lit(0)
                )
                re_rows = requeued.select(
                    "url", "parent_url", "depth", "score",
                    (
                        F.pmod(F.col("seq"), F.lit(RETRY_SEQ_STRIDE))
                        + (rc + 1).cast("long") * F.lit(RETRY_SEQ_STRIDE)
                    ).alias("seq"),
                    (rc + 1).cast("int").alias("retry_count"),
                )
                next_frontier = next_frontier.unionByName(
                    re_rows, allowMissingColumns=True
                )
                n_frontier = -1  # loop top re-counts (politeness path)
            frontier = next_frontier
            round_no += 1
            if spec.checkpoint_dir:
                self._snapshot_round(
                    round_no, frontier=frontier,
                    results=emitted.drop("links"),
                    discovered=discovered_src.select(
                        F.col("emit_seq").alias("src_emit_seq"),
                        "link_idx", "norm_url", "next_depth",
                    ),
                )

        if spec.on_state_change is not None and self._cancelled:
            # final state on cancellation: pending = the un-crawled
            # remainder of the frontier (bfs_strategy.py:289-301)
            rows = frontier.orderBy("seq").collect()
            has_rc = "retry_count" in frontier.columns
            state = {
                "strategy_type": "bfs",
                "visited": list(self._cb_visited),
                # retry_count rides along (same fix as the table-export
                # paths): resuming from this state must not silently
                # reset politeness-requeue attempt counts
                "pending": [
                    {
                        "url": r["url"],
                        "parent_url": r["parent_url"],
                        **(
                            {"retry_count": int(r["retry_count"] or 0)}
                            if has_rc
                            else {}
                        ),
                    }
                    for r in rows
                ],
                "depths": dict(self._cb_depths),
                "pages_crawled": self._pages_crawled,
                "cancelled": True,
            }
            self._last_state = state
            self._fire_callback(state)

        self._pending_df = frontier
        self._pending_order = [F.asc("seq")]
        self._pending_kind = "pending"

    def _snapshot_round(self, round_no: int, **dfs: DataFrame) -> None:
        from crawl4ai_spark.plans.checkpoint import snapshot_round

        snapshot_round(
            self.spec.checkpoint_dir, round_no,
            pages_crawled=self._pages_crawled,
            strategy=self.spec.strategy,
            seen=self.seen_store.df,
            metrics=self._metrics,
            **dfs,
        )

    def _pending(self) -> list[dict]:
        """Collect the final frontier/stack/queue — lazily, only when
        state export actually needs it (a depth-capped run can stop with
        a frontier far too large for the driver; the run path itself
        never collects it)."""
        if self._pending_df is None:
            return []
        rows = self._pending_df.orderBy(*self._pending_order).collect()
        if self._pending_kind == "queue":
            return [
                {"score": r["neg_score"], "depth": r["depth"], "url": r["url"],
                 "parent_url": r["parent_url"]}
                for r in rows
            ]
        has_rc = "retry_count" in self._pending_df.columns
        return [
            {
                "url": r["url"], "parent_url": r["parent_url"],
                "depth": r["depth"],
                # politeness-requeue rows keep their attempt count
                # through the dict-shaped export too (the table path
                # preserves it; dropping it here reset resumed retries)
                **(
                    {"retry_count": int(r["retry_count"] or 0)}
                    if has_rc
                    else {}
                ),
            }
            for r in rows
        ]

    def export_state(self) -> dict:
        """Reference-shape resume state (bfs_strategy.py:275-284 etc.)."""
        strategy = self.spec.strategy
        res = self.results().collect()
        pending_rows = self._pending()
        depths = dict(self._depths)
        for r in res:
            depths[r["url"]] = r["depth"]
        for it in pending_rows:
            depths.setdefault(it["url"], it["depth"])
        visited = self.seen_store.urls()
        state = {
            "strategy_type": {
                "bfs": "bfs", "dfs": "dfs", "dfs_batched": "dfs",
                "best_first": "best_first",
            }[strategy],
            "visited": visited,
            "depths": depths,
            "pages_crawled": self._pages_crawled,
            "cancelled": self._cancelled,
        }
        if strategy == "bfs":
            # reference pending shape is (url, parent_url)
            # (bfs_strategy.py:275-284); retry_count is the engine's
            # requeue extension and rides along only when present so
            # resumed retries aren't silently reset
            state["pending"] = [
                {
                    "url": it["url"], "parent_url": it["parent_url"],
                    **(
                        {"retry_count": it["retry_count"]}
                        if "retry_count" in it
                        else {}
                    ),
                }
                for it in pending_rows
            ]
        elif strategy in ("dfs", "dfs_batched"):
            state["visited"] = (
                sorted(self.visited_set)
                if self.visited_set is not None
                else sorted(self.pop_seen_store.urls())
            )
            state["dfs_seen"] = visited
            state["stack"] = pending_rows  # bottom → top
        else:
            state["queue_items"] = pending_rows
        return state

    # -- per-URL state stream (bfs_strategy.py:266-284 cadence) ---------------

    def _fire_callback(self, state: dict) -> None:
        self._last_state = state
        cb = self.spec.on_state_change
        if cb is not None:
            cb(state)

    def _fire_bfs_states(
        self,
        emitted: DataFrame,
        discovered: DataFrame | None,
        pending: DataFrame | None,
        prior_crawled: int,
    ) -> None:
        """Fire on_state_change once per SUCCESSFUL URL of the round,
        reconstructing the reference's sequential stream from the
        round's set-oriented outputs: ``visited`` grows by the parent's
        PRE-trim candidates (the reference adds to visited before the
        capacity cut, bfs_strategy.py:186-196), ``pending`` by its
        post-trim children in push order, ``depths`` by the enqueued
        children, and ``pages_crawled`` increments by exactly 1 per
        state (test_deep_crawl_resume.py:321-349).

        Driver-sized parity mode: collects the round's (checkpointed)
        emitted/discovered/pending rows — one cheap scan each, no
        recompute of the discovery pipeline.
        """
        em = emitted.select("emit_seq", "url", "success").orderBy(
            "emit_seq"
        ).collect()
        disc = (
            discovered.select("emit_seq", "link_idx", "norm_url")
            .orderBy("emit_seq", "link_idx")
            .collect()
            if discovered is not None
            else []
        )
        pend = (
            pending.select("seq", "src_emit_seq", "url", "parent_url", "depth")
            .orderBy("seq")
            .collect()
            if pending is not None
            else []
        )
        di = pi = 0
        crawled = prior_crawled
        pending_acc: list[dict] = []
        for row in em:
            if not row["success"]:
                continue
            e = row["emit_seq"]
            while di < len(disc) and disc[di]["emit_seq"] <= e:
                self._cb_visited.append(disc[di]["norm_url"])
                di += 1
            while pi < len(pend) and pend[pi]["src_emit_seq"] <= e:
                p = pend[pi]
                pending_acc.append(
                    {"url": p["url"], "parent_url": p["parent_url"]}
                )
                self._cb_depths[p["url"]] = int(p["depth"])
                pi += 1
            crawled += 1
            self._fire_callback(
                {
                    "strategy_type": "bfs",
                    "visited": list(self._cb_visited),
                    "pending": list(pending_acc),
                    "depths": dict(self._cb_depths),
                    "pages_crawled": crawled,
                    "cancelled": self._cancelled,
                }
            )

    # -- table-shaped state export (the 10^10 path; VERDICT r2 #9) ------------

    def export_state_tables(self, out_dir: str) -> dict:
        """Write the resume state as parquet tables — seen + pending stay
        DataFrames end-to-end, nothing is collected on the driver.

        ``export_state()`` (the reference-dict form, bfs_strategy.py:
        275-284) materializes the whole seen set + frontier driver-side
        and is small-crawl-only; this is the export that still works
        when the seen set is 10^10 rows.  Layout::

            <out_dir>/seen/*.parquet
            <out_dir>/pending/*.parquet   (url, parent_url, depth, seq)
            <out_dir>/manifest.json

        Returns the manifest.  Resume with
        ``CrawlEngine.resume_state_from_tables(spark, out_dir)``.
        """
        import json as _json
        import os as _os
        from pathlib import Path

        base = Path(out_dir)
        base.mkdir(parents=True, exist_ok=True)
        counts: dict = {}
        if self.seen_store.df is not None:
            self.seen_store.df.write.mode("overwrite").parquet(
                str(base / "seen")
            )
        if self._pending_df is not None:
            pend = with_global_rank(
                self._pending_df, self._pending_order, "__seq"
            )
            url_col = "url" if "url" in pend.columns else "norm_url"
            pend.select(
                F.col(url_col).alias("url"),
                F.col("parent_url"),
                F.col("depth").cast("int").alias("depth"),
                (F.col("__seq") - F.lit(1)).cast("long").alias("seq"),
                # politeness-requeue rows keep their attempt count across
                # export/resume (seq re-ranks dense, preserving the
                # retry-epoch ORDER the stride encoded)
                *(
                    [
                        F.coalesce(F.col("retry_count"), F.lit(0))
                        .cast("int").alias("retry_count")
                    ]
                    if "retry_count" in pend.columns
                    else []
                ),
                # queue exports carry the heap key so the priority
                # queue is reconstructible on table-resume (seq alone
                # preserves order but not the scores the reference's
                # queue_items serialize, bff_strategy.py:332-345)
                *(
                    [F.col("neg_score").cast("double").alias("neg_score")]
                    if self._pending_kind == "queue"
                    else []
                ),
            ).write.mode("overwrite").parquet(str(base / "pending"))
        manifest = {
            "strategy_type": {
                "bfs": "bfs", "dfs": "dfs", "dfs_batched": "dfs",
                "best_first": "best_first",
            }[self.spec.strategy],
            "pending_kind": self._pending_kind,
            "pages_crawled": self._pages_crawled,
            "cancelled": self._cancelled,
        }
        tmp = base / "manifest.json.tmp"
        tmp.write_text(_json.dumps(manifest, indent=1))
        _os.replace(tmp, base / "manifest.json")
        return manifest

    @staticmethod
    def resume_state_from_tables(spark: SparkSession, out_dir: str) -> dict:
        """Load an ``export_state_tables`` directory as a resume_state
        whose seen/pending enter the engine as DataFrames (never
        collected).  BFS resume consumes ``visited_df``/``pending_df``
        directly; pass the result as ``CrawlSpec(resume_state=...)``."""
        import json as _json
        from pathlib import Path

        base = Path(out_dir)
        manifest = _json.loads((base / "manifest.json").read_text())
        state = dict(manifest)
        if (base / "seen").exists():
            state["visited_df"] = spark.read.parquet(str(base / "seen"))
        if (base / "pending").exists():
            state["pending_df"] = spark.read.parquet(str(base / "pending"))
        return state

    # -- Best-first -----------------------------------------------------------

    def _run_bff(self, seeds: list[str]) -> None:
        spark = self.spark
        spec = self.spec
        seen = self._make_seen()  # BFF visited: pop-time set
        self.seen_store = seen
        # (enq_round, enq_seq) identifies a queue entry: enq_seq is the
        # enqueue rank WITHIN its round, so uniqueness needs no global
        # counter — and therefore no per-round count job to advance one.
        queue_schema = (
            "neg_score double, depth int, url string, parent_url string, "
            "enq_round int, enq_seq long"
        )
        rs = spec.resume_state
        if rs:
            visited_df = rs.get("visited_df")
            if visited_df is not None:
                # table-resume: the seen set enters as a DataFrame
                seen.add(visited_df.select("url"))
            visited = rs.get("visited", [])
            if visited:
                seen.add(spark.createDataFrame([(u,) for u in visited], "url string"))
            self._depths.update(rs.get("depths", {}))
            self._pages_crawled = int(rs.get("pages_crawled", 0))
            pdf = rs.get("pending_df")
            if pdf is not None:
                # table-resume queue (export_state_tables, kind="queue"):
                # rows are in heap order with the neg_score heap key
                if "neg_score" not in pdf.columns:
                    raise ValueError(
                        "best_first table-resume needs a 'neg_score' "
                        "column in pending — re-export with this "
                        "engine version (older exports dropped the "
                        "heap key and cannot rebuild the queue)"
                    )
                queue = pdf.select(
                    F.col("neg_score").cast("double").alias("neg_score"),
                    F.col("depth").cast("int").alias("depth"),
                    F.col("url"),
                    F.col("parent_url").cast("string").alias("parent_url"),
                    F.lit(-1).cast("int").alias("enq_round"),
                    F.col("seq").cast("long").alias("enq_seq"),
                )
                queue_size = queue.count()
            else:
                items = rs.get("queue_items", [])
                queue = spark.createDataFrame(
                    [
                        (float(it["score"]), int(it["depth"]), it["url"],
                         it.get("parent_url"), -1, i)
                        for i, it in enumerate(items)
                    ],
                    queue_schema,
                )
                queue_size = len(items)
        else:
            seed_df = spark.createDataFrame(
                [(s, i) for i, s in enumerate(seeds)], "url string, enq_seq long"
            )
            score_col = (
                spec.scorer.column(F.col("url")) if spec.scorer else F.lit(0.0)
            )
            queue = seed_df.select(
                (-score_col).alias("neg_score"),
                F.lit(0).cast("int").alias("depth"),
                "url",
                F.lit(None).cast("string").alias("parent_url"),
                F.lit(-1).cast("int").alias("enq_round"),
                "enq_seq",
            )
            queue_size = len(seeds)
            self._depths.update({s: 0 for s in seeds})
        round_no = 0
        # Heap order = the reference's tuple (-score, depth, url, parent)
        # (bff_strategy.py:228,266,325). NULL parent sorts first — the
        # reference would raise on a None-vs-str tie; any total order is
        # parity-safe there.
        pop_order = [
            F.asc("neg_score"),
            F.asc("depth"),
            F.asc("url"),
            F.asc_nulls_first("parent_url"),
        ]
        rounds_since_ckpt = 0
        while round_no < spec.max_rounds and not self._check_cancellation():
            if self._pages_crawled >= spec.max_pages:
                break
            # Bound the queue's lazy plan: every popped/new_items part is
            # checkpointed, so the un-materialized chain is a few cheap
            # anti-joins/unions over tiny cached parts; a full queue
            # checkpoint every 4 rounds keeps planning time flat without
            # paying a materialization job per round.
            if rounds_since_ckpt >= 4:
                queue = self._checkpoint(queue)
                rounds_since_ckpt = 0
            # queue emptiness is detected by the pop collect coming back
            # empty (queue_size is a rank-strategy hint, not a counter —
            # it deliberately lags the round's enqueue)

            # ONE materialization for the whole pop side (r3 fusion —
            # VERDICT r2 #3): global rank ∘ batch filter ∘ visited flag ∘
            # within-batch dup window ∘ corpus fetch join, checkpointed
            # together.  A driver-side collect of the slim columns
            # (links excluded — ≤ batch_size rows) then replaces what r2
            # ran as three further jobs: the emit-rank window, the emit
            # checkpoint and the fused stats collect.  Emission order,
            # the max_pages boundary, the parent set and the round
            # metrics are plain Python over the collected rows; the
            # Spark-side emitted/parents frames are cheap filters over
            # the already-pinned checkpoint blocks.
            ranked = with_global_rank(
                queue, pop_order, "pop_rn", n_rows_hint=queue_size,
                total_col="__qsz",
            ).filter(F.col("pop_rn") <= spec.batch_size)
            if seen.df is not None:
                seen_flag = seen.df.select(
                    F.col("url").alias("__seen_url"), F.lit(True).alias("__seen")
                )
                ranked = ranked.join(
                    seen_flag, ranked["url"] == seen_flag["__seen_url"], "left"
                ).drop("__seen_url")
            else:
                ranked = ranked.withColumn("__seen", F.lit(None).cast("boolean"))
            w_first = Window.partitionBy("url").orderBy("pop_rn")
            popped = ranked.withColumn(
                "__dup",
                F.coalesce(F.col("__seen"), F.lit(False))
                | (F.row_number().over(w_first) > 1),
            ).drop("__seen")
            # repartition(1): the seen/fetch joins spread ≤ batch_size
            # rows over shuffle.partitions mostly-empty partitions;
            # collapsing AFTER the join (shuffle of ≤ batch_size rows)
            # keeps the corpus scan parallel while giving downstream
            # readers — the discovery Arrow UDF above all — one task
            # instead of 32 Python-worker spawns per round.
            # LAZY checkpoint + single-read fetch (r4): the slim collect
            # below is the round's ONE job — it materializes batch_full
            # (and, transitively, the previous round's lazy new_items
            # part riding in the queue plan) in its own stages.  The
            # fetch must be single_read: the broadcast-probe plan's
            # keys-build thread would race-recompute the un-pinned plan
            # (the r3 lazy-checkpoint regression).  Every later consumer
            # (queue anti-join, seen.add, the emit/parents filters) runs
            # strictly after the collect and reads pinned blocks.
            batch_full = self._checkpoint(
                self._fetch(
                    popped, n_rows_hint=spec.batch_size, single_read=True
                ).repartition(1),
                eager=False,
            )
            slim = batch_full.select(
                "enq_round", "enq_seq", "pop_rn", "__dup", "__qsz", "success"
            ).collect()
            if not slim:
                break  # queue exhausted
            # exact queue size at pop time rode the rank window for free;
            # the estimate lags this round's enqueue by design (it only
            # picks the rank strategy next round, never affects values)
            queue_size = max(0, int(slim[0]["__qsz"]) - len(slim))
            queue = queue.join(
                batch_full.select("enq_round", "enq_seq"),
                ["enq_round", "enq_seq"],
                "left_anti",
            )
            # visited gains the whole non-dup batch at pop time
            seen.add(batch_full.filter(~F.col("__dup")).select("url"))

            slim.sort(key=lambda r: r["pop_rn"])
            remaining_before = (
                float(spec.max_pages) - self._pages_crawled
                if spec.max_pages != math.inf
                else math.inf
            )
            # Driver replica of the emit boundary — ONLY for the round's
            # scalars (n_emitted / n_success): emit rows whose
            # prior-success count < remaining; the boundary page is
            # kept, rows after it are dropped (bff_strategy.py:295-307)
            n_emitted = 0
            n_success = 0
            cum = 0
            for r in slim:
                if r["__dup"]:
                    continue
                prior = cum
                if r["success"]:
                    cum += 1
                if prior >= remaining_before:
                    continue
                n_emitted += 1
                if r["success"]:
                    n_success += 1
            if n_emitted == 0:  # whole batch was already-visited dupes
                round_no += 1
                rounds_since_ckpt += 1
                continue

            # emitted/parents are the SAME boundary logic as Column
            # expressions over the pinned batch (no extra action; no
            # per-row literal maps, which at batch_size=500 dominate
            # plan-build time)
            w_pop = Window.orderBy("pop_rn")
            cum_col = F.sum(F.col("success").cast("long")).over(
                w_pop.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            fe = batch_full.filter(~F.col("__dup")).withColumn("cum_ok", cum_col)
            if spec.max_pages != math.inf:
                fe = fe.filter(
                    (F.col("cum_ok") - F.col("success").cast("long"))
                    < F.lit(remaining_before)
                )
            fe = fe.withColumn(
                "emit_seq",
                F.row_number().over(w_pop) + F.lit(self._emit_count) - 1,
            ).withColumn("round", F.lit(round_no))
            emitted = fe.select(
                "emit_seq", "round", "url", "depth", "parent_url",
                (-F.col("neg_score")).alias("score"),
                "success", "status_code",
                F.lit(0).cast("int").alias("retry_count"),
                "links",
            )
            # only non-boundary successes parent the discovery
            parents = fe.filter(F.col("success"))
            if spec.max_pages != math.inf:
                parents = parents.filter(
                    F.col("cum_ok") < F.lit(remaining_before)
                )
            parents = parents.select("url", "emit_seq", "depth", "links")
            cand = self._discover_candidates(parents)
            # BFF dedupes ONLY against visited — duplicates may re-enter
            # the queue from different parents (pop-time dedupe)
            cand = seen.anti_join(cand, "norm_url")
            new_items = with_global_rank(
                cand, ["emit_seq", "link_idx"], "__enq_rn",
                n_rows_hint=spec.batch_size * 4,
            ).select(
                (-F.col("score")).alias("neg_score"),
                F.col("next_depth").alias("depth"),
                F.col("norm_url").alias("url"),
                F.col("src_url").alias("parent_url"),
                F.lit(round_no).cast("int").alias("enq_round"),
                (F.col("__enq_rn") - 1).cast("long").alias("enq_seq"),
            )
            # checkpoint the (small) new_items part: every later pop
            # reuses it without re-running the discovery pipeline (which
            # crosses the Arrow UDF bridge).  LAZY (r4): its single
            # first reader is the next round's pop collect (the rank
            # window reads the whole queue, so every partition
            # materializes inside that job) — the discovery pipeline
            # becomes stages of next round's one job instead of its own
            # driver job.  The periodic queue checkpoint / snapshot
            # paths also read it whole, so no partial-materialization
            # hazard exists on any path.
            new_items = self._checkpoint(new_items, eager=False)

            self._pages_crawled += n_success
            self._result_parts.append(emitted.drop("links"))
            self._metrics.append(
                {
                    "round": round_no,
                    "strategy": "best_first",
                    "fetched": n_emitted,
                    "succeeded": n_success,
                    "pages_crawled": self._pages_crawled,
                }
            )
            reached_cap = (
                spec.max_pages != math.inf
                and self._pages_crawled >= spec.max_pages
            )
            self._emit_count += n_emitted
            queue = queue.unionByName(new_items)
            if spec.checkpoint_dir:
                self._snapshot_round(round_no + 1, queue=queue)
            if reached_cap:
                break
            round_no += 1
            rounds_since_ckpt += 1


        self._pending_df = queue
        self._pending_order = [
            F.asc("neg_score"), F.asc("depth"), F.asc("url"),
            F.asc_nulls_first("parent_url"),
        ]
        self._pending_kind = "queue"

    # -- DFS (strict parity mode: one URL per round) ---------------------------

    def _run_dfs(self, seeds: list[str]) -> None:
        spark = self.spark
        spec = self.spec
        dfs_seen = self._make_seen()
        self.seen_store = dfs_seen
        visited: set[str] = set()  # bounded by pages actually crawled
        self.visited_set = visited
        stack_schema = (
            "url string, parent_url string, depth int, score double, pos long"
        )
        rs = spec.resume_state
        if rs:
            dseen = rs.get("dfs_seen", [])
            if dseen:
                dfs_seen.add(
                    spark.createDataFrame([(u,) for u in dseen], "url string")
                )
            visited.update(rs.get("visited", []))
            self._depths.update(rs.get("depths", {}))
            self._pages_crawled = int(rs.get("pages_crawled", 0))
            vdf = rs.get("visited_df")
            if vdf is not None:
                # table-resume: the exported seen table IS dfs_seen;
                # visited stays empty — discovery-time dedupe pushes
                # each url at most once, so no resumed stack entry can
                # already be visited
                dfs_seen.add(vdf.select("url"))
            pdf = rs.get("pending_df")
            if pdf is not None:
                n_stack = pdf.count()
                stack = pdf.select(
                    "url",
                    F.col("parent_url").cast("string").alias("parent_url"),
                    F.col("depth").cast("int").alias("depth"),
                    F.lit(0.0).alias("score"),
                    (F.col("seq") + 1).cast("long").alias("pos"),
                )
                pos_counter = n_stack + 1
            else:
                items = rs.get("stack", [])  # bottom → top
                stack = spark.createDataFrame(
                    [
                        (it["url"], it.get("parent_url"), int(it["depth"]), 0.0, i)
                        for i, it in enumerate(items)
                    ],
                    stack_schema,
                )
                pos_counter = len(items) + 1
        else:
            dfs_seen.add(spark.createDataFrame([(s,) for s in seeds], "url string"))
            stack = spark.createDataFrame(
                [(s, None, 0, 0.0, len(seeds) - i) for i, s in enumerate(seeds)],
                stack_schema,
            )
            pos_counter = len(seeds) + 1
            self._depths.update({s: 0 for s in seeds})
        round_no = 0
        pops_since_ckpt = 0
        while round_no < spec.max_rounds and not self._check_cancellation():
            # loop-top page-cap check (same as _run_bff/_run_dfs_batched):
            # a crawl resumed at/over max_pages must emit nothing
            if self._pages_crawled >= spec.max_pages:
                break
            # stack lives as a lazy filter/union chain over checkpointed
            # new_items parts; a full checkpoint every 4 pops bounds the
            # plan without paying a materialization job per URL
            if pops_since_ckpt >= 4:
                stack = self._checkpoint(stack)
                pops_since_ckpt = 0
            # top-of-stack pop + fetch join (+ re-score) in ONE
            # checkpoint; the slim collect reads the pinned single row —
            # the r2 emit checkpoint, the leaf success collect and the
            # emitted half of the stats job all ride it.  The fetch of a
            # row that turns out visited/over-depth is a wasted 1-row
            # join; the skip itself stays driver-side as before.
            top_full = self._fetch(
                stack.orderBy(F.desc("pos")).limit(1), n_rows_hint=1,
                single_read=True,
            )
            if spec.scorer is not None:
                # dfs_strategy.py:88-90: popped URL is re-scored
                top_full = top_full.withColumn(
                    "score", spec.scorer.column(F.col("url"))
                )
            # lazy + single-read fetch (r4, same shape as the BFF pop):
            # the collect below is the pop's ONE job and materializes
            # the checkpoint itself; single_read keeps the un-pinned
            # plan out of any broadcast-build thread.
            top_full = self._checkpoint(top_full.repartition(1), eager=False)
            top = top_full.select("pos", "url", "depth", "success").collect()
            if not top:
                break
            row = top[0]
            stack = stack.filter(F.col("pos") != row["pos"])
            pops_since_ckpt += 1
            if row["url"] in visited or row["depth"] > spec.max_depth:
                continue
            visited.add(row["url"])

            ok = bool(row["success"])
            emitted = (
                top_full.withColumn(
                    "emit_seq", F.lit(self._emit_count).cast("long")
                )
                .withColumn("round", F.lit(round_no))
                .select(
                    "emit_seq", "round", "url", "depth", "parent_url",
                    "score", "success", "status_code",
                    F.lit(0).cast("int").alias("retry_count"),
                    "links",
                )
            )
            self._result_parts.append(emitted.drop("links"))
            self._emit_count += 1
            round_no += 1

            # Arithmetic leaf skip: a pop at max_depth cannot produce
            # children (next_depth guard) — skip the whole discovery job
            # (the reference's can_process fails for every child,
            # dfs_strategy.py:62-70); the success flag came with the pop.
            if row["depth"] >= spec.max_depth:
                self._pages_crawled += int(ok)
                self._metrics.append(
                    {"round": round_no, "strategy": "dfs", "fetched": 1,
                     "succeeded": int(ok), "pages_crawled": self._pages_crawled}
                )
                if ok and self._pages_crawled >= spec.max_pages:
                    break
                continue

            if not ok:
                self._metrics.append(
                    {"round": round_no, "strategy": "dfs", "fetched": 1,
                     "succeeded": 0, "pages_crawled": self._pages_crawled}
                )
                continue

            parents = emitted.filter(F.col("success")).withColumn(
                "crawled_incl", F.lit(1)
            )
            cand = self._discover_candidates(parents)
            cand = dfs_seen.anti_join(cand, "norm_url")
            w_first = Window.partitionBy("norm_url").orderBy("link_idx")
            deduped = (
                cand.withColumn("rk", F.row_number().over(w_first))
                .filter(F.col("rk") == 1)
                .drop("rk")
                # valid-child count rides the checkpoint as a column
                # (single tiny partition) — read back via head(1), not
                # an aggregate job
                .withColumn(
                    "__nv", F.count("*").over(Window.partitionBy(F.lit(1)))
                )
            )
            deduped = self._checkpoint(deduped)
            dfs_seen.add(deduped.select(F.col("norm_url").alias("url")))

            nv_row = deduped.select("__nv").head(1)
            n_valid = int(nv_row[0]["__nv"]) if nv_row else 0
            self._pages_crawled += 1
            self._metrics.append(
                {"round": round_no, "strategy": "dfs", "fetched": 1,
                 "succeeded": 1, "pages_crawled": self._pages_crawled}
            )
            if self._pages_crawled >= spec.max_pages:
                break

            remaining = (
                int(spec.max_pages) - self._pages_crawled
                if spec.max_pages != math.inf
                else None
            )
            order_cols = (
                [F.desc("score"), F.asc("link_idx")]
                if spec.scorer
                else [F.asc("link_idx")]
            )
            w_trim = Window.orderBy(*order_cols)
            trimmed = deduped.withColumn("trim_rn", F.row_number().over(w_trim))
            overflow = remaining is not None and n_valid > remaining
            if remaining is not None:
                trimmed = trimmed.filter(F.col("trim_rn") <= F.lit(remaining))
            # push order: score order only when the capacity cut occurred
            # (dfs_strategy.py:318-321), else discovery order; reversed
            # push: first-discovered gets the HIGHEST pos → pops next
            # (dfs_strategy.py:100-103).  n_new is arithmetic — the trim
            # is a prefix cut of the n_valid rows, no second count job.
            child_ord = F.col("trim_rn") if overflow else F.col("link_idx")
            n_new = n_valid if remaining is None else min(n_valid, remaining)
            new_items = trimmed.select(
                F.col("norm_url").alias("url"),
                F.col("src_url").alias("parent_url"),
                F.col("next_depth").alias("depth"),
                F.col("score"),
                (F.lit(pos_counter + n_new)
                 - F.row_number().over(Window.orderBy(child_ord)))
                .cast("long")
                .alias("pos"),
            )
            pos_counter += n_new
            stack = stack.unionByName(new_items)
            if spec.checkpoint_dir:
                self._snapshot_round(round_no, stack=stack)

        self._pending_df = stack
        self._pending_order = [F.asc("pos")]
        self._pending_kind = "stack"

    # -- DFS (batched throughput mode: top-of-stack slice per round) -----------

    def _run_dfs_batched(self, seeds: list[str]) -> None:
        """W2 throughput mode (SURVEY §2.6): each round pops the
        contiguous top-``batch_size`` slice of the stack, fetches it as
        one join, and pushes all children so that children of
        earlier-popped parents pop first — DFS at batch granularity.

        Semantics vs strict mode (``strategy="dfs"``), by design:

        - With ``batch_size=1`` the traversal, emission order, seen set
          and stack evolution are IDENTICAL to strict mode (covered by
          tests/test_dfs_batched.py parity cases).
        - With larger batches, the crawled SET equals strict DFS on an
          uncapped crawl (same reachability through the same dedupe
          rules); ordering is batch-granular: a round's URLs emit in
          stack order even though strict DFS would finish the first
          URL's subtree before touching the second.
        - Under ``max_pages`` the boundary behaves like the best-first
          batch cap (boundary page kept, rows after dropped; the
          reference's overflow score-sort quirk is strict-mode-only —
          batched pushes in discovery order).

        Per round: 2 driver jobs (r4) — the slim batch collect, which
        materializes the lazy pop+dedupe+fetch checkpoint in its own
        stages, and the valid-count head(1), which materializes the
        lazy single-partition discovery checkpoint — amortized over
        ``batch_size`` URLs, vs per-URL actions in strict mode.  (The
        r3 lazy-checkpoint regression was the broadcast-probe fetch
        race; single_read fetch removed it — see ``_checkpoint``.)
        """
        spark = self.spark
        spec = self.spec
        pop_seen = self._make_seen()   # pop-time visited (strict's python set)
        dfs_seen = self._make_seen()   # discovery-time dedupe (_dfs_seen)
        self.seen_store = dfs_seen
        self.pop_seen_store = pop_seen
        self.visited_set = None        # export_state falls back to pop_seen
        stack_schema = (
            "url string, parent_url string, depth int, score double, pos long"
        )
        rs = spec.resume_state
        if rs:
            dseen = rs.get("dfs_seen", [])
            if dseen:
                dfs_seen.add(
                    spark.createDataFrame([(u,) for u in dseen], "url string")
                )
            vis = rs.get("visited", [])
            if vis:
                pop_seen.add(
                    spark.createDataFrame([(u,) for u in vis], "url string")
                )
            self._depths.update(rs.get("depths", {}))
            self._pages_crawled = int(rs.get("pages_crawled", 0))
            vdf = rs.get("visited_df")
            if vdf is not None:
                # table-resume (see strict-DFS note: exported seen =
                # dfs_seen; an empty pop_seen is safe because discovery
                # dedupe pushes each url at most once)
                dfs_seen.add(vdf.select("url"))
            pdf = rs.get("pending_df")
            if pdf is not None:
                n_stack = pdf.count()
                stack = pdf.select(
                    "url",
                    F.col("parent_url").cast("string").alias("parent_url"),
                    F.col("depth").cast("int").alias("depth"),
                    F.lit(0.0).alias("score"),
                    (F.col("seq") + 1).cast("long").alias("pos"),
                )
                pos_counter = n_stack + 1
                stack_size = n_stack
            else:
                items = rs.get("stack", [])  # bottom → top
                stack = spark.createDataFrame(
                    [
                        (it["url"], it.get("parent_url"), int(it["depth"]), 0.0, i)
                        for i, it in enumerate(items)
                    ],
                    stack_schema,
                )
                pos_counter = len(items) + 1
                stack_size = len(items)
        else:
            dfs_seen.add(spark.createDataFrame([(s,) for s in seeds], "url string"))
            stack = spark.createDataFrame(
                [(s, None, 0, 0.0, len(seeds) - i) for i, s in enumerate(seeds)],
                stack_schema,
            )
            pos_counter = len(seeds) + 1
            stack_size = len(seeds)
            self._depths.update({s: 0 for s in seeds})
        round_no = 0
        rounds_since_ckpt = 0
        while round_no < spec.max_rounds and not self._check_cancellation():
            if self._pages_crawled >= spec.max_pages:
                break
            if stack_size <= 0:
                break
            if rounds_since_ckpt >= 4:
                stack = self._checkpoint(stack)
                rounds_since_ckpt = 0

            # pop side fused into ONE checkpoint + a slim driver collect,
            # exactly like _run_bff: rank ∘ slice ∘ visited/depth dup
            # flag ∘ fetch join (+ re-score) materialize together; the
            # collect (≤ batch_size rows, links excluded) supplies
            # emission order, the max_pages boundary, the parent set and
            # round metrics driver-side — r2's emit checkpoint and the
            # emitted half of the stats job disappear.  pos is already
            # unique across the stack, so it is the driver's row key.
            ranked = with_global_rank(
                stack, [F.desc("pos")], "pop_rn", n_rows_hint=stack_size
            ).filter(F.col("pop_rn") <= spec.batch_size)
            if pop_seen.df is not None:
                seen_flag = pop_seen.df.select(
                    F.col("url").alias("__seen_url"), F.lit(True).alias("__seen")
                )
                ranked = ranked.join(
                    seen_flag, ranked["url"] == seen_flag["__seen_url"], "left"
                ).drop("__seen_url")
            else:
                ranked = ranked.withColumn("__seen", F.lit(None).cast("boolean"))
            w_first = Window.partitionBy("url").orderBy("pop_rn")
            popped = ranked.withColumn(
                "__dup",
                F.coalesce(F.col("__seen"), F.lit(False))
                | (F.row_number().over(w_first) > 1)
                | (F.col("depth") > F.lit(spec.max_depth)),
            ).drop("__seen")
            fetched_all = self._fetch(
                popped, n_rows_hint=spec.batch_size, single_read=True
            )
            if spec.scorer is not None:
                # dfs_strategy.py:88-90: popped URL is re-scored
                fetched_all = fetched_all.withColumn(
                    "score", spec.scorer.column(F.col("url"))
                )
            # lazy + single-read fetch: the slim collect is the pop
            # side's ONE job and materializes the checkpoint itself
            # (see _run_bff's note on the r3 broadcast-thread race)
            batch_full = self._checkpoint(
                fetched_all.repartition(1), eager=False
            )
            slim = batch_full.select(
                "pos", "pop_rn", "__dup", "success"
            ).collect()
            if not slim:
                break
            stack = stack.join(batch_full.select("pos"), "pos", "left_anti")
            stack_size = max(0, stack_size - len(slim))
            pop_seen.add(batch_full.filter(~F.col("__dup")).select("url"))

            slim.sort(key=lambda r: r["pop_rn"])
            remaining_before = (
                float(spec.max_pages) - self._pages_crawled
                if spec.max_pages != math.inf
                else math.inf
            )
            # driver replica of the emit boundary — round scalars only
            n_emitted = 0
            n_success = 0
            cum = 0
            for r in slim:
                if r["__dup"]:
                    continue
                prior = cum
                if r["success"]:
                    cum += 1
                if prior >= remaining_before:
                    continue
                n_emitted += 1
                if r["success"]:
                    n_success += 1
            if n_emitted == 0:  # whole slice was dup/over-depth
                round_no += 1
                rounds_since_ckpt += 1
                continue

            # same boundary logic as Column expressions over the pinned
            # batch (see _run_bff — no per-row literal maps)
            w_pop = Window.orderBy("pop_rn")
            cum_col = F.sum(F.col("success").cast("long")).over(
                w_pop.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            fe = batch_full.filter(~F.col("__dup")).withColumn("cum_ok", cum_col)
            if spec.max_pages != math.inf:
                fe = fe.filter(
                    (F.col("cum_ok") - F.col("success").cast("long"))
                    < F.lit(remaining_before)
                )
            fe = fe.withColumn(
                "emit_seq",
                F.row_number().over(w_pop) + F.lit(self._emit_count) - 1,
            ).withColumn("round", F.lit(round_no))
            emitted = fe.select(
                "emit_seq", "round", "url", "depth", "parent_url",
                "score", "success", "status_code",
                F.lit(0).cast("int").alias("retry_count"),
                "links",
            )
            parents = fe.filter(F.col("success"))
            if spec.max_pages != math.inf:
                parents = parents.filter(
                    F.col("cum_ok") < F.lit(remaining_before)
                )
            parents = parents.select("url", "emit_seq", "depth", "links")
            cand = self._discover_candidates(parents)
            cand = dfs_seen.anti_join(cand, "norm_url")
            # first-occurrence dedupe across the round's parents, in
            # (parent pop order, link order) — strict's sequential
            # dfs_seen.add at batch granularity
            w_cfirst = Window.partitionBy("norm_url").orderBy(
                "emit_seq", "link_idx"
            )
            uniq = (
                cand.withColumn("rk", F.row_number().over(w_cfirst))
                .filter(F.col("rk") == 1)
                .drop("rk")
            )
            # two selection orders, same checkpoint: discovery order for
            # the normal push, score order for the capacity-overflow cut
            # (strict mode's dfs_strategy.py:318-321 quirk); the valid
            # count rides the rank window as total_col — the read below
            # is a head(1) over pinned blocks, not an aggregate job
            uniq = with_global_rank(
                uniq, [F.asc("emit_seq"), F.asc("link_idx")], "__push_rn",
                n_rows_hint=spec.batch_size * 4,
            )
            score_order = (
                [F.desc("score"), F.asc("emit_seq"), F.asc("link_idx")]
                if spec.scorer
                else [F.asc("emit_seq"), F.asc("link_idx")]
            )
            # lazy when the rank took the single-window path (the plan
            # is then exactly ONE partition, so the head(1) below is its
            # sole first reader and materializes it whole — no partial-
            # materialization hazard); the two-phase path checkpoints
            # eagerly inside with_global_rank already
            from crawl4ai_spark.operators import ordering as _ord
            deduped = self._checkpoint(
                with_global_rank(
                    uniq, score_order, "__score_rn",
                    n_rows_hint=spec.batch_size * 4, total_col="__nv",
                ),
                eager=spec.batch_size * 4 >= _ord.TWO_PHASE_THRESHOLD,
            )
            dfs_seen.add(deduped.select(F.col("norm_url").alias("url")))

            nv_row = deduped.select("__nv").head(1)
            n_valid = int(nv_row[0]["__nv"]) if nv_row else 0
            self._pages_crawled += n_success
            self._result_parts.append(emitted.drop("links"))
            self._metrics.append(
                {
                    "round": round_no,
                    "strategy": "dfs_batched",
                    "fetched": n_emitted,
                    "succeeded": n_success,
                    "pages_crawled": self._pages_crawled,
                }
            )
            self._emit_count += n_emitted

            remaining_after = (
                int(spec.max_pages) - self._pages_crawled
                if spec.max_pages != math.inf
                else None
            )
            n_new = (
                n_valid if remaining_after is None
                else min(n_valid, max(remaining_after, 0))
            )
            if n_new > 0:
                # overflow + scorer ⇒ keep the top-scoring children and
                # push them in score order (strict parity); otherwise
                # select and push in discovery order
                sel = (
                    F.col("__score_rn")
                    if (n_valid > n_new and spec.scorer is not None)
                    else F.col("__push_rn")
                )
                trimmed = deduped.filter(sel <= F.lit(n_new))
                # reversed push generalized over the batch: the j-th child
                # in selection order gets the j-th HIGHEST pos — children
                # of the first-popped parent pop first
                new_items = trimmed.select(
                    F.col("norm_url").alias("url"),
                    F.col("src_url").alias("parent_url"),
                    F.col("next_depth").alias("depth"),
                    F.col("score"),
                    (F.lit(pos_counter + n_new) - sel)
                    .cast("long")
                    .alias("pos"),
                )
                pos_counter += n_new
                stack = stack.unionByName(new_items)
                stack_size += n_new
            if spec.checkpoint_dir:
                self._snapshot_round(round_no + 1, stack=stack)
            round_no += 1
            rounds_since_ckpt += 1

        self._pending_df = stack
        self._pending_order = [F.asc("pos")]
        self._pending_kind = "stack"
