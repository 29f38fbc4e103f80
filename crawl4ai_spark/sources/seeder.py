"""URL seeding pipeline (AsyncUrlSeeder, async_url_seeder.py:364-555).

Spark shape: union of per-source seed DataFrames → nonsense-URL filter
(:1607-1701) → dropDuplicates (:454-462) → relevance scoring → sort →
limit(max_urls) (:489-508).

Two scorers are provided:

- ``head_bm25`` — ContentRelevanceFilter's simplified-IDF BM25 over a
  head/doc text column (filters.py:559-578): per-row column math,
  idf = log(2/(tf+0.5)+1), k1=1.2, b=0.75, avgdl=1000.
- ``corpus_bm25`` — the seeder's rank_bm25 (BM25Okapi) scoring
  (:1703-1747): corpus-statistics IDF with the Okapi epsilon floor for
  negative IDFs, min-max normalized.  Two aggregation passes (df/avgdl),
  then a per-row score — the A4 two-pass plan from SURVEY §2.5.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# BM25Okapi defaults (public rank_bm25 package semantics)
OKAPI_K1 = 1.5
OKAPI_B = 0.75
OKAPI_EPSILON = 0.25


def tokenize(text: Column) -> Column:
    """Reference tokenization: text.lower().split() — whitespace only."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def head_bm25(doc_text: Column, query: str, k1: float = 1.2, b: float = 0.75,
              avgdl: int = 1000) -> Column:
    """Simplified-IDF BM25 of a query against one document column
    (ContentRelevanceFilter._bm25, filters.py:559-578)."""
    toks = tokenize(doc_text)
    dl = F.size(toks)
    score = F.lit(0.0)
    for term in sorted(set(query.lower().split())):
        tf = F.size(F.filter(toks, lambda t: t == F.lit(term))).cast("double")
        idf = F.log((F.lit(2.0) / (tf + 0.5)) + 1.0)
        num = tf * (k1 + 1)
        den = tf + F.lit(k1) * (
            1 - b + F.lit(b) * (dl.cast("double") / F.lit(float(avgdl)))
        )
        score = score + idf * (num / den)
    return score


def corpus_bm25(
    docs: DataFrame,
    query: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    k1: float = OKAPI_K1,
    b: float = OKAPI_B,
    epsilon: float = OKAPI_EPSILON,
) -> DataFrame:
    """(key, bm25, relevance_score): BM25Okapi scores of every doc vs
    the query, min-max normalized to [0,1] (all-equal → 0.5), matching
    _calculate_bm25_score (async_url_seeder.py:1703-1747).

    Plan: explode tokens → per-(doc, term) tf + per-doc dl (one shuffle
    on key) → per-term df (one shuffle on term, corpus-wide) → broadcast
    tiny per-term idf of the QUERY terms only → per-row score — at
    100 TB the only corpus-wide state is the term-df table, which prunes
    to query terms before the join.
    """
    toks = docs.select(
        F.col(key_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    n_and_avgdl = toks.groupBy(key_col).agg(F.count("*").alias("dl"))
    stats = n_and_avgdl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])

    term_df = toks.distinct().groupBy("term").agg(F.count("*").alias("df"))
    # Okapi IDF with epsilon floor: idf = ln((N - df + 0.5)/(df + 0.5));
    # negatives → epsilon * mean(idf over ALL corpus terms)
    idf_all = term_df.withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
    )
    avg_idf = idf_all.agg(F.avg("idf")).collect()[0][0] or 0.0
    floor = epsilon * avg_idf
    query_terms = list(dict.fromkeys(query.lower().split()))
    idf_q = {
        r["term"]: (r["idf"] if r["idf"] >= 0 else floor)  # floor ONLY negatives
        for r in idf_all.filter(F.col("term").isin(query_terms)).collect()
    }

    tf = (
        toks.filter(F.col("term").isin(query_terms))
        .groupBy(key_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = n_and_avgdl
    scored_terms = tf.join(dl, key_col).withColumn(
        "part",
        F.create_map(*[F.lit(x) for kv in idf_q.items() for x in kv])[F.col("term")]
        * (
            F.col("tf").cast("double")
            * (k1 + 1)
            / (
                F.col("tf").cast("double")
                + F.lit(k1)
                * (1 - b + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl))
            )
        ),
    )
    # per-doc sum in SORTED term order (float addition is not
    # associative; a fixed order keeps scores bit-identical across
    # engines and runs)
    term_cols = [
        F.coalesce(
            F.sum(F.when(F.col("term") == t, F.col("part"))), F.lit(0.0)
        ).alias(f"__p{i}")
        for i, t in enumerate(sorted(set(query_terms)))
    ]
    agg_parts = scored_terms.groupBy(key_col).agg(*term_cols)
    score = F.lit(0.0)
    for i in range(len(set(query_terms))):
        score = score + F.col(f"__p{i}")
    per_doc = agg_parts.select(key_col, score.alias("bm25"))
    # docs with zero query-term hits score 0 (BM25Okapi returns 0 rows → 0)
    all_docs = docs.select(key_col).join(per_doc, key_col, "left").fillna(
        {"bm25": 0.0}
    )
    lo, hi = all_docs.agg(F.min("bm25"), F.max("bm25")).collect()[0]
    if hi == lo:
        return all_docs.withColumn("relevance_score", F.lit(0.5))
    return all_docs.withColumn(
        "relevance_score", (F.col("bm25") - F.lit(lo)) / F.lit(hi - lo)
    )


NONSENSE_UTILITY_FILES = [
    "ads.txt", "humans.txt", "security.txt", ".well-known/security.txt",
    "crossdomain.xml", "browserconfig.xml", "manifest.json",
    "apple-app-site-association", ".well-known/apple-app-site-association",
    "favicon.ico", "apple-touch-icon.png", "android-chrome-192x192.png",
]


def is_nonsense_url(url: Column) -> Column:
    """_is_nonsense_url (async_url_seeder.py:1607-1701, active rules
    1-3): robots/sitemap files + common utility files."""
    from crawl4ai_spark.functions.filters import url_path

    path = F.lower(url_path(url))
    verdict = (
        path.endswith("/robots.txt")
        | path.endswith("/sitemap.xml")
        | path.endswith("/sitemap_index.xml")
        | (
            path.contains("/sitemap")
            & (path.endswith(".xml") | path.endswith(".xml.gz") | path.endswith(".txt"))
        )
    )
    for f in NONSENSE_UTILITY_FILES:
        verdict = verdict | path.endswith("/" + f)
    return verdict


def seed_pipeline(
    sources: list[DataFrame],
    max_urls: int | None = None,
    pattern: str | None = None,
    relevance: DataFrame | None = None,
    key_col: str = "url",
    filter_nonsense: bool = True,
    score_threshold: float | None = None,
) -> DataFrame:
    """union → [nonsense filter] → [glob pattern] → dedupe → [join
    relevance + threshold + sort desc] → limit (the seeder's urls()
    pipeline; score_threshold drops low-relevance urls BEFORE the cap,
    async_url_seeder.py:540-555)."""
    import fnmatch

    out = sources[0]
    for s in sources[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    if filter_nonsense:
        out = out.filter(~is_nonsense_url(F.col(key_col)))
    if pattern and pattern != "*":
        out = out.filter(F.col(key_col).rlike(fnmatch.translate(pattern)))
    out = out.dropDuplicates([key_col])
    if relevance is not None:
        out = out.join(relevance, key_col, "left")
        if score_threshold is not None:
            out = out.filter(F.col("relevance_score") >= score_threshold)
        out = out.orderBy(F.desc("relevance_score"), F.asc(key_col))
    if max_urls is not None and max_urls > 0:
        out = out.limit(max_urls)
    return out
