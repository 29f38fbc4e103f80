"""Custom stateful streaming operator: per-domain adaptive backoff.

The batch engine folds each round's fetch outcomes into per-domain
politeness state with ``PolitenessState.update`` (operators/politeness.py,
reference semantics async_dispatcher.py:65-85).  This module is the
Structured Streaming form of the same fold: crawl results arrive as a
stream, ``applyInPandasWithState`` keys it by domain and carries
``(current_delay, fail_count, retired, k)`` across micro-batches — the
10^10-crawl shape where rate-limiter state must outlive any single
batch job and be queryable while the crawl runs.

Semantics: identical to ``PolitenessSpec.fold_outcomes`` applied to the
whole stream as ONE round (round_no=0) — the jitter index ``k`` is the
running count of outcomes per domain, continuing across micro-batches,
so a stream delivered in N batches produces bit-identical state to the
same rows folded in one batch (tests/test_streaming_stateful.py).

Scale notes: state lives in the state store partitioned by domain (the
shuffle key), one struct row per domain — millions of domains is a few
hundred MB of state spread over executors; outcomes shuffle once on
domain per micro-batch with Arrow-batched transfer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.functions.normalize import domain_of
from crawl4ai_spark.operators.politeness import PolitenessSpec

STATE_SCHEMA = T.StructType(
    [
        T.StructField("current_delay", T.DoubleType()),
        T.StructField("fail_count", T.IntegerType()),
        T.StructField("retired", T.BooleanType()),
        T.StructField("k", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("current_delay", T.DoubleType()),
        T.StructField("fail_count", T.IntegerType()),
        T.StructField("retired", T.BooleanType()),
        T.StructField("outcomes_seen", T.LongType()),
    ]
)


def stream_domain_backoff(
    outcomes: DataFrame,
    spec: PolitenessSpec | None = None,
) -> DataFrame:
    """Fold a streaming ``(emit_seq, url, status_code)`` relation into
    live per-domain backoff state.

    Emits one updated state row per domain per micro-batch (update
    mode).  ``outcomes`` must be a streaming DataFrame; rows fold in
    ``emit_seq`` order within a micro-batch, and the per-domain jitter
    index continues across batches via the group state.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    spec = spec or PolitenessSpec()

    def fold(key, pdfs, state: GroupState):
        domain = key[0]
        if state.exists:
            delay, fails, retired, k = state.get
        else:
            delay, fails, retired, k = (
                spec.initial_delay(domain), 0, False, 0,
            )
        # a group's rows may span several Arrow chunks — concatenate
        # before sorting so the fold sees the batch's full emit order
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks).sort_values("emit_seq")
            statuses = [int(s) for s in pdf["status_code"]]
            # k continues across micro-batches — equivalent to folding
            # the whole stream as a single round (round_no=0)
            delay, fails, chunk_retired = spec.fold_outcomes(
                domain, float(delay), int(fails), statuses,
                round_no=0, k0=int(k),
            )
            retired = bool(retired) or chunk_retired
            k += len(statuses)
        state.update((float(delay), int(fails), bool(retired), int(k)))
        yield pd.DataFrame(
            [
                {
                    "domain": domain,
                    "current_delay": float(delay),
                    "fail_count": int(fails),
                    "retired": bool(retired),
                    "outcomes_seen": int(k),
                }
            ]
        )

    keyed = outcomes.withColumn("domain", domain_of(F.col("url")))
    return keyed.groupBy("domain").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
