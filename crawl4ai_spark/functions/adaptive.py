"""Adaptive-crawler confidence metrics (SURVEY.md §2.5 A5).

Replicates the statistical confidence model of the reference's
``StatisticalStrategy`` (adaptive_crawler.py:300-411):

- coverage   (adaptive_crawler.py:328-367): per query term,
  ``doc_coverage * (1 + 0.5 * freq_signal)`` where
  ``doc_coverage = df/N`` and ``freq_signal = ln(1+tf)/ln(1+max_tf)``;
  averaged over query terms, then ``min(1, sqrt(·))``.
- consistency (adaptive_crawler.py:369-394): mean pairwise Jaccard of
  document term-sets; 1.0 when the knowledge base has < 2 documents;
  pairs with an empty side are skipped.
- saturation (adaptive_crawler.py:396-411): 1 - recent/initial new-term
  discovery rate over the per-document history (zero rates replaced
  by 1), clamped to [0, 1]; 0.0 with < 2 history entries.
- confidence = 0.4*coverage + 0.3*consistency + 0.3*saturation
  (adaptive_crawler.py:309-326).

Tokenization is the reference's ``_tokenize`` (adaptive_crawler.py:
598-607): lowercase, strip ``[^\\w\\s]`` to spaces, whitespace split,
keep tokens with length > 2.  Both Spark (Java regex) and the DuckDB
oracle (RE2) treat ``\\w`` as ASCII word chars, so the mirrors agree.

Scale notes: tf/df are one hash-aggregate over the exploded term-doc
pairs (map-side partial agg; no driver loop).  The O(n²) pairwise
consistency is bounded to a knowledge-base sample (``kb_limit``) just
as the reference's knowledge base is a bounded in-memory list — at
100 TB you'd swap it for the MinHash estimate in functions/dedup.py.
Saturation is one first-occurrence aggregation over the same exploded
pairs; no state is kept on the driver.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

COVERAGE_W, CONSISTENCY_W, SATURATION_W = 0.4, 0.3, 0.3


def py_tokenize(text: str) -> list[str]:
    """Driver-side mirror of _tokenize for the (tiny) query string."""
    text = re.sub(r"[^\w\s]", " ", text, flags=re.ASCII)
    return [t for t in text.split() if len(t) > 2]


def terms_column(text: Column) -> Column:
    """array<string> of document terms (reference tokenizer)."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(text), r"[^\w\s]", " "), r"\s+"),
        lambda t: F.length(t) > 2,
    )


def term_doc_pairs(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, term) exploded pairs — the base relation for tf/df."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(terms_column(F.lower(F.col(text_col)))).alias("term"),
    )


def term_stats(td: DataFrame) -> DataFrame:
    """Per-term corpus stats: tf (total occurrences), df (docs with term).

    One shuffle on term; partial aggregation is map-side (Catalyst
    hash-agg), so the exploded pair count never crosses the wire raw.
    """
    return td.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )


def coverage_df(docs: DataFrame, query: str, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """1-row (coverage double) — adaptive_crawler.py:328-367."""
    spark = docs.sparkSession
    qterms = py_tokenize(query.lower())
    stats = term_stats(term_doc_pairs(docs, id_col, text_col))
    n_docs = docs.count()
    if not qterms or n_docs == 0:
        return spark.createDataFrame([(0.0,)], "coverage double")
    max_tf = stats.agg(F.max("tf").alias("m"))
    qdf = spark.createDataFrame([(t,) for t in qterms], "term string")
    per_term = (
        qdf.join(stats, "term", "left")
        .crossJoin(F.broadcast(max_tf))
        .select(
            F.when(
                F.col("df").isNotNull() & (F.col("df") > 0),
                (F.col("df") / F.lit(float(n_docs)))
                * (
                    F.lit(1.0)
                    + F.lit(0.5)
                    * F.log(F.lit(1.0) + F.col("tf"))
                    / F.log(F.lit(1.0) + F.col("m"))
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("term_score")
        )
    )
    return per_term.agg(
        F.least(F.lit(1.0), F.sqrt(F.avg("term_score"))).alias("coverage")
    )


def consistency_df(docs: DataFrame, kb_limit: int = 40,
                   id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """1-row (consistency double) — mean pairwise Jaccard over the
    first ``kb_limit`` docs (adaptive_crawler.py:369-394).

    Distributed set-similarity: |A∩B| per pair from a self-join on
    term, |A∪B| = |A|+|B|-|A∩B|; zero-overlap pairs contribute 0 via
    the closed-form denominator C(m,2) instead of materializing them.
    """
    kb = docs.orderBy(id_col).limit(kb_limit)
    n_kb = kb.count()
    if n_kb < 2:
        return docs.sparkSession.createDataFrame([(1.0,)], "consistency double")
    td = term_doc_pairs(kb, id_col, text_col).distinct().persist()
    sizes = td.groupBy("doc_id").agg(F.count("*").alias("sz"))
    m = sizes.count()  # docs with ≥1 term
    a, b = td.alias("a"), td.alias("b")
    inter = (
        a.join(b, "term")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .agg(F.count("*").alias("c"))
    )
    si = sizes.select(F.col("doc_id").alias("i"), F.col("sz").alias("si"))
    sj = sizes.select(F.col("doc_id").alias("j"), F.col("sz").alias("sj"))
    sum_row = (
        inter.join(si, "i").join(sj, "j")
        .select((F.col("c") / (F.col("si") + F.col("sj") - F.col("c"))).alias("jac"))
        .agg(F.coalesce(F.sum("jac"), F.lit(0.0)).alias("s"))
    )
    td.unpersist()
    denom = m * (m - 1) / 2.0
    if denom == 0:
        return docs.sparkSession.createDataFrame([(0.0,)], "consistency double")
    return sum_row.select((F.col("s") / F.lit(denom)).alias("consistency"))


def saturation_df(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """1-row (saturation double) — adaptive_crawler.py:396-411.

    The reference appends one new-term count per document in crawl
    order; saturation compares the last entry to the first.  Documents
    are ordered by ``id_col`` (the synthetic crawl order).
    """
    spark = docs.sparkSession
    n_docs = docs.count()
    if n_docs < 2:
        return spark.createDataFrame([(0.0,)], "saturation double")
    td = term_doc_pairs(docs, id_col, text_col)
    first_seen = td.groupBy("term").agg(F.min("doc_id").alias("fd"))
    new_per_doc = first_seen.groupBy("fd").agg(F.count("*").alias("nt"))
    hist = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(new_per_doc, F.col("doc_id") == F.col("fd"), "left")
        .select("doc_id", F.coalesce(F.col("nt"), F.lit(0)).alias("nt"))
    )
    ends = hist.agg(
        F.min_by("nt", "doc_id").alias("first_nt"),
        F.max_by("nt", "doc_id").alias("last_nt"),
    )
    recent = F.when(F.col("last_nt") > 0, F.col("last_nt")).otherwise(F.lit(1))
    initial = F.when(F.col("first_nt") > 0, F.col("first_nt")).otherwise(F.lit(1))
    sat = F.lit(1.0) - recent.cast("double") / initial.cast("double")
    return ends.select(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), sat)).alias("saturation")
    )


def rank_links(
    links: DataFrame,
    corpus_docs: DataFrame,
    query: str,
    rel_w: float = 0.5,
    nov_w: float = 0.3,
    auth_w: float = 0.2,
    id_col: str = "link_id",
    text_col: str = "link_text",
) -> DataFrame:
    """Expected-information-gain link ranking
    (adaptive_crawler.py:413-470; weights :171-173):

    - relevance = |query_terms ∩ link_terms| / |query_terms|
      (0.0 for empty link text);
    - novelty   = |link_terms ∖ corpus_vocabulary| / |link_terms|
      (1.0 when the knowledge base is empty, 0.5 for term-less links);
    - authority = 1.0 (reference hardcodes it, :425-426);
    - score     = rel_w·relevance + nov_w·novelty + auth_w·authority.

    Distributed form: vocabulary membership is an anti-join of the
    exploded link terms against the corpus term dictionary — no
    driver-side vocabulary set, so it scales to any corpus size.
    """
    qterms = sorted(set(py_tokenize(query.lower())))
    n_q = len(qterms)
    vocab = term_doc_pairs(corpus_docs).select("term").distinct()
    corpus_empty = corpus_docs.isEmpty()

    lt = links.select(
        F.col(id_col).alias("link_id"),
        F.explode(terms_column(F.col(text_col))).alias("term"),
    ).distinct()
    n_terms = lt.groupBy("link_id").agg(F.count("*").alias("n_t"))
    over = (
        lt.filter(F.col("term").isin(qterms))
        .groupBy("link_id")
        .agg(F.count("*").alias("n_q"))
        if n_q
        else None
    )
    new_terms = lt.join(vocab, "term", "left_anti").groupBy("link_id").agg(
        F.count("*").alias("n_new")
    )
    out = links.select(F.col(id_col).alias("link_id")).join(
        n_terms, "link_id", "left"
    ).join(new_terms, "link_id", "left")
    if over is not None:
        out = out.join(over, "link_id", "left")
        relevance = F.coalesce(F.col("n_q"), F.lit(0)) / F.lit(float(n_q))
    else:
        relevance = F.lit(0.0)
    if corpus_empty:
        novelty = F.lit(1.0)
    else:
        novelty = (
            F.when(
                F.col("n_t").isNull() | (F.col("n_t") == 0), F.lit(0.5)
            ).otherwise(
                F.coalesce(F.col("n_new"), F.lit(0)) / F.col("n_t")
            )
        )
    score = (
        F.lit(rel_w) * relevance
        + F.lit(nov_w) * novelty
        + F.lit(auth_w) * F.lit(1.0)
    )
    return out.select("link_id", score.alias("score"))


def confidence_df(docs: DataFrame, query: str, kb_limit: int = 40,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """1-row (coverage, consistency, saturation, confidence) —
    the 0.4/0.3/0.3 blend of adaptive_crawler.py:309-326."""
    cov = coverage_df(docs, query, id_col, text_col)
    con = consistency_df(docs, kb_limit, id_col, text_col)
    sat = saturation_df(docs, id_col, text_col)
    out = cov.crossJoin(con).crossJoin(sat)
    return out.select(
        "coverage",
        "consistency",
        "saturation",
        (
            F.lit(COVERAGE_W) * F.col("coverage")
            + F.lit(CONSISTENCY_W) * F.col("consistency")
            + F.lit(SATURATION_W) * F.col("saturation")
        ).alias("confidence"),
    )
