"""Per-domain politeness as deterministic round budgets.

Reference: ``RateLimiter`` (async_dispatcher.py:28-85) —
- first request to a domain draws delay ~ U(base_lo, base_hi);
- 429/503 ⇒ delay = min(delay * 2 * U(0.75, 1.25), max_delay),
  fail_count += 1, give up past max_retries;
- success ⇒ delay = max(U(base_lo, base_hi), delay * 0.75), fail_count=0.

The reference sleeps on the wall clock with a global RNG — inherently
nondeterministic under concurrency.  The Spark engine replaces sleeping
with a *round budget*: per round of nominal duration ``round_duration``
seconds, a domain may fetch ``max(1, floor(round_duration / delay))``
URLs; the rest of its frontier rows defer to the next round.  All
randomness is a seeded hash (md5 of domain/round/draw-index), so the
same seed list + politeness budget gives the same schedule everywhere —
including in the pure-Python oracle, which runs the identical fold.

State evolution folds this round's outcomes per domain IN EMISSION
ORDER (matching the reference's sequential update_delay calls) inside
``applyInPandas`` — grouped, Arrow-batched, no driver loop, and the
state table is partitioned by domain exactly like the budget join that
consumes it.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.functions.normalize import domain_of

RATE_LIMIT_CODES = (429, 503)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("current_delay", T.DoubleType()),
        T.StructField("fail_count", T.IntegerType()),
        T.StructField("retired", T.BooleanType()),
    ]
)


def _unit(seed: int, *parts) -> float:
    """Deterministic U(0,1) from md5 — identical in Spark workers and
    the oracle."""
    key = ":".join(str(p) for p in parts) + f":{seed}"
    h = hashlib.md5(key.encode()).hexdigest()
    return int(h[:8], 16) / 0x100000000


@dataclass(frozen=True)
class PolitenessSpec:
    base_lo: float = 1.0
    base_hi: float = 3.0
    max_delay: float = 60.0
    max_retries: int = 3
    round_duration: float = 30.0
    seed: int = 42
    # salt buckets for the two-phase hot-domain top-k in split_budget;
    # None → defaultParallelism.  1 disables salting (single exact
    # window per domain) — exists so the skew bench can show the
    # naive plan's straggler against the salted plan on the same
    # frontier (SURVEY.md §2.4 skew note).
    salt_n: int | None = None
    # Per-URL rate-limit requeue — a COMPOSITION of two reference
    # mechanisms, not a replay of either (the reference itself requeues
    # only on critical MEMORY pressure, async_dispatcher.py:288-318,
    # and emits every rate-limited response once with update_delay
    # bookkeeping, :325-330):
    #   * the requeue shape (no result row; re-enter the queue with
    #     retry_count+1 at priority = retry_count, behind fresh tasks)
    #     is the dispatcher's memory-requeue loop
    #     (async_dispatcher.py:288-318, 217-226);
    #   * the requeue/terminal decision is update_delay's sequential
    #     per-domain fail arithmetic (:65-75): requeue while the
    #     post-increment fail_count ≤ max_retries, emit terminally with
    #     the accumulated retry_count once the budget is spent.
    # Rationale: memory pressure is Spark's concern here (the
    # max_round_size governor), so the engine points the requeue loop
    # at the condition a distributed crawl actually retries on.  A row
    # requeued and then orphaned by its domain retiring is dropped at
    # the next split exactly like any other retired-domain row (the
    # engine's long-standing retired-domain semantics) — it does NOT
    # get a terminal emission.  Off by default: the requeue-less mode
    # (every fetch emits once — the reference's literal rate-limit
    # behavior) is the long-standing oracle-verified path.
    requeue: bool = False

    def initial_delay(self, domain: str) -> float:
        return self.base_lo + (self.base_hi - self.base_lo) * _unit(
            self.seed, "init", domain
        )

    def budget(self, delay: float) -> int:
        return max(1, int(self.round_duration / delay))

    def fold_outcomes(
        self,
        domain: str,
        delay: float,
        fail_count: int,
        statuses: list[int],
        round_no: int,
        k0: int = 0,
    ) -> tuple[float, int, bool]:
        """Sequential update_delay fold (async_dispatcher.py:65-85).

        ``k0`` offsets the jitter index — the streaming form
        (streaming/stateful.py) folds a round in several chunks and
        continues the index across them so chunking never changes the
        result."""
        retired = False
        for k, status in enumerate(statuses, start=k0):
            if status in RATE_LIMIT_CODES:
                fail_count += 1
                if fail_count > self.max_retries:
                    retired = True
                jitter = 0.75 + 0.5 * _unit(self.seed, "back", domain, round_no, k)
                delay = min(delay * 2 * jitter, self.max_delay)
            else:
                base = self.base_lo + (self.base_hi - self.base_lo) * _unit(
                    self.seed, "succ", domain, round_no, k
                )
                delay = max(base, delay * 0.75)
                fail_count = 0
        return delay, fail_count, retired


class PolitenessState:
    """domain_state table + budget window, evolved per round."""

    def __init__(self, spark: SparkSession, spec: PolitenessSpec):
        self.spark = spark
        self.spec = spec
        self._state: DataFrame = spark.createDataFrame([], STATE_SCHEMA)

    @property
    def state(self) -> DataFrame:
        return self._state

    def _with_delay(self, frontier: DataFrame) -> DataFrame:
        spec = self.spec
        dom = domain_of(F.col("url")).alias("domain")
        fr = frontier.withColumn("domain", dom)
        # No broadcast hint: a real web crawl has 10^7-10^8 domains, so
        # the optimizer must stay free to pick a shuffle join keyed on
        # domain (the same key the budget window partitions by); small
        # fixture states still broadcast via the size-based threshold.
        joined = fr.join(self._state, "domain", "left")

        @F.pandas_udf(T.DoubleType())
        def init_delay(domain: pd.Series) -> pd.Series:
            return domain.map(spec.initial_delay)

        return joined.withColumn(
            "current_delay",
            F.coalesce(F.col("current_delay"), init_delay(F.col("domain"))),
        ).withColumn("retired", F.coalesce(F.col("retired"), F.lit(False)))

    def split_budget(
        self, frontier: DataFrame, salt_n: int | None = None
    ) -> tuple[DataFrame, DataFrame]:
        """(now, deferred): per-domain top-``budget`` rows by frontier
        priority (seq asc) crawl this round; the rest wait.  Retired
        domains' rows are dropped (reference returns rate-limit error
        results past max_retries).

        Hot-domain skew (SURVEY.md §2.4 skew note; the synthetic corpus
        puts ~half of all URLs on one domain) is broken with a salted
        two-phase top-k: rows first rank within (domain, salt) buckets —
        a salted repartition that spreads a hot domain over ``salt_n``
        tasks — and any row ranked past the budget inside its own bucket
        cannot be in the domain's global top-budget, so it defers
        immediately.  The exact per-domain window then runs over ≤
        salt_n × budget survivors per domain instead of the full (skewed)
        frontier.
        """
        from pyspark.sql import Window

        spec = self.spec
        salt_n = (
            salt_n or spec.salt_n or self.spark.sparkContext.defaultParallelism
        )
        fr = self._with_delay(frontier).filter(~F.col("retired"))
        budget = F.greatest(
            F.lit(1),
            F.floor(F.lit(spec.round_duration) / F.col("current_delay")),
        )
        cols = frontier.columns
        fr = fr.withColumn("__budget", budget).withColumn(
            "__salt", F.pmod(F.xxhash64("url"), F.lit(salt_n))
        )
        w_salt = Window.partitionBy("domain", "__salt").orderBy("seq")
        fr = fr.withColumn("__rns", F.row_number().over(w_salt))
        survivors = fr.filter(F.col("__rns") <= F.col("__budget"))
        pre_deferred = fr.filter(F.col("__rns") > F.col("__budget"))
        w = Window.partitionBy("domain").orderBy("seq")
        ranked = survivors.withColumn("__rn", F.row_number().over(w))
        now = ranked.filter(F.col("__rn") <= F.col("__budget")).select(*cols)
        deferred = ranked.filter(F.col("__rn") > F.col("__budget")).select(
            *cols
        ).unionByName(pre_deferred.select(*cols))
        return now, deferred

    def with_requeue(
        self, fetched: DataFrame, order_col: str = "seq"
    ) -> DataFrame:
        """Add a ``__requeue`` boolean: does this fetch outcome requeue
        (rate-limited AND the domain's fail budget survives the
        response) instead of emitting?  (See ``PolitenessSpec.requeue``
        for what is and is not reference behavior here.)

        Pure Column/window replica of the sequential ``update_delay``
        fail-count arithmetic (async_dispatcher.py:65-75): per domain in
        ``order_col`` order, every 429/503 increments ``fail_count``,
        any other status resets it to 0, and the response requeues iff
        the post-increment count ≤ max_retries.  With reset-on-success,
        the count at row k is (# rate-limited rows since the last
        non-rate-limited row, inclusive), seeded with the domain's
        PRE-round ``fail_count`` when no reset precedes k — all
        window-expressible, so the verdict runs JVM-side with no
        per-row Python.  Must be called BEFORE :meth:`update` folds the
        round (it reads the pre-round state).
        """
        from pyspark.sql import Window

        spec = self.spec
        fr = fetched.withColumn("__dom", domain_of(F.col("url")))
        st = self._state.select(
            F.col("domain").alias("__dom"),
            F.col("fail_count").alias("__prior_fails"),
        )
        fr = fr.join(st, "__dom", "left").withColumn(
            "__prior_fails", F.coalesce(F.col("__prior_fails"), F.lit(0))
        )
        w = Window.partitionBy("__dom").orderBy(order_col)
        is_rl = F.col("status_code").isin(*RATE_LIMIT_CODES)
        fr = fr.withColumn("__rl_cum", F.sum(is_rl.cast("int")).over(w))
        # __rl_cum at the most recent non-rate-limited row ≤ current;
        # on a rate-limited row that row strictly precedes it, so the
        # difference counts rate-limited rows since the last reset,
        # current included — exactly the post-increment fail_count.
        last_reset = F.max(F.when(~is_rl, F.col("__rl_cum"))).over(w)
        fails_at = F.when(
            last_reset.isNull(), F.col("__prior_fails") + F.col("__rl_cum")
        ).otherwise(F.col("__rl_cum") - last_reset)
        return fr.withColumn(
            "__requeue", is_rl & (fails_at <= F.lit(spec.max_retries))
        ).drop("__dom", "__prior_fails", "__rl_cum")

    def update(self, outcomes: DataFrame, round_no: int) -> None:
        """Fold this round's (url, status_code) outcomes into the state,
        per domain, in emission order."""
        spec = self.spec
        with_dom = outcomes.withColumn("domain", domain_of(F.col("url")))
        prev = self._state.withColumnRenamed("current_delay", "prev_delay")

        merged = with_dom.join(prev, "domain", "left")

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("emit_seq") if "emit_seq" in pdf else pdf
            domain = pdf["domain"].iloc[0]
            delay = pdf["prev_delay"].iloc[0]
            if pd.isna(delay):
                delay = spec.initial_delay(domain)
            fails = pdf["fail_count"].iloc[0]
            fails = 0 if pd.isna(fails) else int(fails)
            already_retired = bool(pdf["retired"].iloc[0]) if not pd.isna(
                pdf["retired"].iloc[0]
            ) else False
            delay, fails, retired = spec.fold_outcomes(
                domain, float(delay), fails,
                [int(s) for s in pdf["status_code"]], round_no,
            )
            return pd.DataFrame(
                [
                    {
                        "domain": domain,
                        "current_delay": delay,
                        "fail_count": fails,
                        "retired": retired or already_retired,
                    }
                ]
            )

        updated = merged.groupBy("domain").applyInPandas(fold, STATE_SCHEMA)
        untouched = self._state.join(
            with_dom.select("domain").distinct(), "domain", "left_anti"
        )
        self._state = updated.unionByName(untouched).localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# Pure-Python mirror for the oracle / golden budget tables
# ---------------------------------------------------------------------------

class PyPoliteness:
    """Driver-side replica of PolitenessState for the parity oracle."""

    def __init__(self, spec: PolitenessSpec):
        self.spec = spec
        self.state: dict[str, tuple[float, int, bool]] = {}

    def _get(self, domain: str) -> tuple[float, int, bool]:
        if domain not in self.state:
            self.state[domain] = (self.spec.initial_delay(domain), 0, False)
        return self.state[domain]

    def budget(self, domain: str) -> int:
        delay, _, retired = self._get(domain)
        if retired:
            return 0
        return self.spec.budget(delay)

    def is_retired(self, domain: str) -> bool:
        return self._get(domain)[2]

    def update(self, outcomes_by_domain: dict[str, list[int]], round_no: int):
        for domain, statuses in sorted(outcomes_by_domain.items()):
            delay, fails, retired = self._get(domain)
            delay, fails, newly_retired = self.spec.fold_outcomes(
                domain, delay, fails, statuses, round_no
            )
            self.state[domain] = (delay, fails, retired or newly_retired)


def py_domain_of(url: str) -> str:
    import re

    from crawl4ai_spark.functions.normalize import NETLOC_RE

    m = re.match(NETLOC_RE, url)
    return m.group(1).lower() if m else ""
