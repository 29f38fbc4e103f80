"""Composed AdaptiveCrawler — the reference's crawl-until-confident
loop (adaptive_crawler.py:1292-1446 ``AdaptiveCrawler.digest``) wired
over the already-verified confidence/gap/stop operators
(functions/adaptive.py).

Loop (reference :1388-1445, StatisticalStrategy):

    initial crawl of start_url → KB
    while depth < max_depth:
        confidence = 0.4·coverage + 0.3·consistency + 0.3·saturation
        if should_stop: break            (:527-546 — threshold /
                                          max_pages / no links /
                                          saturation)
        ranked = rank_links(pending)     (:413-470 info gain)
        if not ranked or top gain < min_gain_threshold: break
        crawl top_k links → extend KB, crawled, pending
        depth += 1

Spark mapping: fetch is a join against the pages corpus (S1/S2
fetch-as-join); the KB and pending sets stay DataFrames; the only
driver-side state per round is the 1-row confidence collect and the
top-k selection (k rows) — the same O(k) the reference holds in
memory.  Link "preview text" for ranking comes from the target page's
text via the corpus join (the reference's head-peek link preview,
fetch-as-join form).

Pending is keyed by url (a link discovered twice enters once) — the
reference's pending list can hold duplicates on diamond-shaped graphs
but ranks/crawls each url once, so set semantics are value-identical.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.functions.adaptive import confidence_df, rank_links


@dataclass
class AdaptiveSpec:
    """Field-for-field the reference AdaptiveConfig defaults
    (adaptive_crawler.py:156-160, saturation via :543-545)."""

    query: str
    confidence_threshold: float = 0.7
    max_depth: int = 5          # expansion rounds
    max_pages: int = 20
    top_k_links: int = 3
    min_gain_threshold: float = 0.1
    saturation_threshold: float = 0.8
    kb_limit: int = 40


ROUND_SCHEMA = (
    "round int, n_kb int, n_pending long, coverage double, "
    "consistency double, saturation double, confidence double, "
    "stop_reason string"
)


class AdaptiveCrawler:
    """Digest a corpus from a seed until the statistical confidence
    model says the query is answered.

    ``pages``: corpus DataFrame with columns
    (url, success, status_code, links, text).
    """

    def __init__(self, spark: SparkSession, pages: DataFrame, spec: AdaptiveSpec):
        self.spark = spark
        self.spec = spec
        self.pages = pages.select(
            "url", "success", "links", F.col("text").cast("string").alias("text")
        ).persist()
        self.kb: DataFrame | None = None       # (ord long, url, text)
        self.crawled: DataFrame | None = None  # (url)
        self.pending: DataFrame | None = None  # (url)
        self.history: list[dict] = []

    # -- state updates (all DataFrame-side) ---------------------------------

    def _fetch(self, urls: DataFrame) -> DataFrame:
        """Fetch-as-join: url set → successful page rows."""
        return self.pages.join(urls.select("url"), "url", "left_semi").filter(
            F.col("success")
        )

    def _extend_kb(self, fetched_ranked: DataFrame) -> None:
        """Append fetched pages to the KB in selection-rank order (the
        reference appends results in crawl order — saturation depends
        on it).  The append base comes from ``max(ord)+1`` INSIDE the
        plan (a 1-row agg crossJoin), so no driver job is spent
        counting the KB; the eager checkpoint is the round's only KB
        materialization."""
        if self.kb is None:
            part = fetched_ranked.select(
                (F.col("__rk") - 1).cast("long").alias("ord"), "url", "text"
            )
            self.kb = part.localCheckpoint(eager=True)
            return
        base = self.kb.agg(
            F.coalesce(F.max("ord") + 1, F.lit(0)).alias("__base")
        )
        part = fetched_ranked.crossJoin(base).select(
            (F.col("__base") + F.col("__rk") - 1).cast("long").alias("ord"),
            "url",
            "text",
        )
        self.kb = self.kb.unionByName(part).localCheckpoint(eager=True)

    def _add_pending(self, new_links: DataFrame) -> None:
        # lazy checkpoints: materialized by the next round's fused
        # stats job instead of their own driver jobs
        pend = new_links.select(F.explode("links").alias("url")).dropDuplicates(
            ["url"]
        )
        if self.crawled is not None:
            pend = pend.join(self.crawled, "url", "left_anti")
        if self.pending is not None:
            pend = pend.join(self.pending, "url", "left_anti")
            pend = self.pending.unionByName(pend)
        self.pending = pend.localCheckpoint(eager=False)

    def _mark_crawled(self, urls: DataFrame) -> None:
        part = urls.select("url")
        self.crawled = (
            part if self.crawled is None else self.crawled.unionByName(part)
        ).localCheckpoint(eager=False)
        if self.pending is not None:
            self.pending = self.pending.join(
                part, "url", "left_anti"
            ).localCheckpoint(eager=False)

    # -- the digest loop ------------------------------------------------------

    def digest(self, start_url: str) -> DataFrame:
        """Run the adaptive loop; returns the per-round confidence
        stream (ROUND_SCHEMA) — the reference's metrics trace.

        Runs under ``micro_plan_mode`` (AQE + constraint propagation
        off): every frame in the loop is ≤ kb_limit rows, so AQE's
        per-exchange re-plan jobs and the O(plan²) constraint pass are
        pure driver latency — the same measured trade as the crawl
        engine's strict loops."""
        from crawl4ai_spark.session import micro_plan_mode

        with micro_plan_mode(self.spark):
            return self._digest(start_url)

    def _digest(self, start_url: str) -> DataFrame:
        spec = self.spec
        seed = self.spark.createDataFrame([(start_url,)], "url string")
        fetched = self._fetch(seed).withColumn("__rk", F.lit(1))
        self._extend_kb(fetched)
        self._mark_crawled(seed)
        self._add_pending(fetched)

        for depth in range(spec.max_depth + 1):
            # ONE fused driver job per loop top: confidence (already a
            # 1-row crossJoin of three aggs) × n_kb × n_pending
            counts = self.kb.agg(F.count("*").alias("__nkb")) if (
                self.kb is not None
            ) else self.spark.range(1).select(F.lit(0).alias("__nkb"))
            pend_n = self.pending.agg(F.count("*").alias("__npend")) if (
                self.pending is not None
            ) else self.spark.range(1).select(F.lit(0).alias("__npend"))
            if self.kb is not None:
                fused = (
                    confidence_df(
                        self.kb, spec.query, spec.kb_limit,
                        id_col="ord", text_col="text",
                    )
                    .crossJoin(counts)
                    .crossJoin(pend_n)
                    .collect()
                )
            else:
                fused = []
            if not fused or int(fused[0]["__nkb"]) == 0:
                # empty KB (seed fetch failed): fall back to the plain
                # counts job for the recorded n_pending
                n_pending = int(
                    counts.crossJoin(pend_n).collect()[0]["__npend"]
                )
                self.history.append(
                    dict(round=depth, n_kb=0, n_pending=n_pending,
                         coverage=0.0, consistency=0.0, saturation=0.0,
                         confidence=0.0, stop_reason="no_kb")
                )
                break
            conf = fused[0]
            n_kb = int(conf["__nkb"])
            n_pending = int(conf["__npend"])
            row = dict(
                round=depth, n_kb=n_kb, n_pending=n_pending,
                coverage=float(conf["coverage"]),
                consistency=float(conf["consistency"]),
                saturation=float(conf["saturation"]),
                confidence=float(conf["confidence"]),
                stop_reason="",
            )
            # should_stop (reference :527-546), checked in its order
            if row["confidence"] >= spec.confidence_threshold:
                row["stop_reason"] = "confidence"
            elif n_kb >= spec.max_pages:
                row["stop_reason"] = "max_pages"
            elif n_pending == 0:
                row["stop_reason"] = "no_links"
            elif row["saturation"] >= spec.saturation_threshold:
                row["stop_reason"] = "saturation"
            elif depth == spec.max_depth:
                row["stop_reason"] = "max_depth"
            self.history.append(row)
            if row["stop_reason"]:
                break

            # rank pending by info gain; link text = target page text
            cand = self.pending.join(
                self.pages.select("url", F.col("text").alias("link_text")),
                "url",
                "left",
            ).select(F.col("url").alias("link_id"), "link_text")
            ranked = rank_links(
                cand,
                self.kb.select(F.col("ord").alias("doc_id"), "text"),
                spec.query,
                id_col="link_id", text_col="link_text",
            )
            top = (
                ranked.orderBy(F.desc("score"), F.asc("link_id"))
                .limit(spec.top_k_links)
                .collect()
            )
            if not top or float(top[0]["score"]) < spec.min_gain_threshold:
                self.history[-1]["stop_reason"] = "min_gain"
                break
            sel = self.spark.createDataFrame(
                [(r["link_id"], i + 1) for i, r in enumerate(top)],
                "url string, __rk int",
            )
            fetched = self._fetch(sel).drop("__rk").join(sel, "url")
            self._extend_kb(fetched)
            self._mark_crawled(sel)
            self._add_pending(fetched)

        return self.spark.createDataFrame(
            [tuple(h[k] for k in (
                "round", "n_kb", "n_pending", "coverage", "consistency",
                "saturation", "confidence", "stop_reason",
            )) for h in self.history],
            ROUND_SCHEMA,
        )
