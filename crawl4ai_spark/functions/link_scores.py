"""Link-level scoring: intrinsic link quality (C7), total score (C8),
fuzzy URL relevance (C9).

- ``intrinsic_link_score`` — utils.py:3344-3456: 0-10 heuristic over the
  link's own attributes + URL structure + text quality + page-term
  overlap.  Pure Column math over (link_text, url, title_attr,
  class_attr, rel_attr) and a broadcast page-context (terms set,
  is_docs_site) — no Python in the hot path.
- ``total_score`` — utils.py:3459-3504: 5.0 when scoring off; intrinsic
  clamped; else 0.7·intrinsic + 0.3·min(contextual·10, 10).
- ``url_relevance`` — async_url_seeder.py:1519-1605: token/substring/
  3-gram-Jaccard harmonic blend; set-heavy, so it runs as an Arrow
  pandas UDF with an exact pure-Python core shared with the oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

NAV_CLASSES = ["nav", "menu", "primary", "main", "important"]
BAD_CLASSES = ["ad", "sponsor", "track", "promo", "banner"]
GOOD_RELS = ["canonical", "next", "prev", "chapter"]
BAD_RELS = ["nofollow", "sponsored", "ugc"]
GOOD_PATHS = ["/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/"]
MEDIUM_PATHS = ["/blog/", "/article/", "/post/", "/news/"]
BAD_PATHS = ["/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/"]
GENERIC_TEXTS = ["click here", "read more", "more info", "link", "here"]
DOC_KEYWORDS = ["api", "reference", "guide", "tutorial", "example"]


def _any_contains(col: Column, needles: list[str]) -> Column:
    v = F.lit(False)
    for n in needles:
        v = v | col.contains(n)
    return v


def intrinsic_link_score(
    link_text: Column,
    url: Column,
    title_attr: Column,
    class_attr: Column,
    rel_attr: Column,
    page_terms: list[str] | None = None,
    is_docs_site: bool = False,
) -> Column:
    """utils.py:3344-3456 as one Column expression, clamped to [0, 10]."""
    score = F.lit(0.0)

    title = F.coalesce(title_attr, F.lit(""))
    score = score + F.when(F.length(F.trim(title)) > 3, 1.0).otherwise(0.0)

    cls = F.lower(F.coalesce(class_attr, F.lit("")))
    score = score + F.when(_any_contains(cls, NAV_CLASSES), 1.5).otherwise(0.0)
    score = score - F.when(_any_contains(cls, BAD_CLASSES), 1.0).otherwise(0.0)

    rel = F.lower(F.coalesce(rel_attr, F.lit("")))
    score = score + F.when(_any_contains(rel, GOOD_RELS), 1.0).otherwise(0.0)
    score = score - F.when(_any_contains(rel, BAD_RELS), 0.5).otherwise(0.0)

    u = F.lower(url)
    score = score + (
        F.when(_any_contains(u, GOOD_PATHS), 2.0)
        .when(_any_contains(u, MEDIUM_PATHS), 1.0)
        .otherwise(0.0)
    )
    score = score - F.when(_any_contains(u, BAD_PATHS), 1.5).otherwise(0.0)

    # url depth = '/' count − 2 (protocol + domain), utils.py:3404-3409
    depth = (
        F.length(url) - F.length(F.replace(url, F.lit("/"), F.lit("")))
    ) - 2
    score = score + F.when(depth <= 2, 1.0).when(depth > 5, -0.5).otherwise(0.0)
    score = score + F.when(url.startswith("https://"), 0.5).otherwise(0.0)

    text = F.trim(F.coalesce(link_text, F.lit("")))
    words = F.size(F.filter(F.split(text, r"\s+"), lambda w: w != ""))
    score = score + F.when(F.length(text) > 3, 1.0).otherwise(0.0)
    score = score + F.when(words >= 2, 0.5).otherwise(0.0)
    score = score + F.when(words >= 4, 0.5).otherwise(0.0)
    score = score - F.when(F.lower(text).isin(GENERIC_TEXTS), 1.0).otherwise(0.0)

    if page_terms:
        # word overlap of link text vs broadcast page-term set
        # (utils.py:3436-3446): strip punctuation, keep len>2
        cleaned = F.filter(
            F.transform(
                F.split(F.lower(text), r"\s+"),
                lambda w: F.regexp_replace(w, r'^[.,!?;:"()\[\]{}]+|[.,!?;:"()\[\]{}]+$', ""),
            ),
            lambda w: F.length(w) > 2,
        )
        link_words = F.array_distinct(cleaned)
        terms_arr = F.array(*[F.lit(t) for t in sorted(set(page_terms))])
        overlap = F.size(F.array_intersect(link_words, terms_arr))
        ratio = overlap.cast("double") / F.least(
            F.size(link_words), F.lit(10)
        ).cast("double")
        score = score + F.when(overlap > 0, ratio * 2.0).otherwise(0.0)

    if is_docs_site:
        lt = F.lower(text)
        score = score + F.when(
            (F.length(text) > 0) & _any_contains(lt, DOC_KEYWORDS), 1.0
        ).otherwise(0.0)

    return F.greatest(F.lit(0.0), F.least(score, F.lit(10.0)))


def total_score(
    intrinsic: Column | None,
    contextual: Column | None,
    score_links_enabled: bool,
    query_provided: bool,
) -> Column:
    """utils.py:3459-3504."""
    if not score_links_enabled:
        return F.lit(5.0)
    i = F.coalesce(intrinsic, F.lit(0.0)) if intrinsic is not None else F.lit(0.0)
    if not query_provided or contextual is None:
        return F.greatest(F.lit(0.0), F.least(i, F.lit(10.0)))
    c = F.coalesce(contextual, F.lit(0.0))
    scaled = F.least(c * 10.0, F.lit(10.0))
    return F.greatest(F.lit(0.0), F.least(i * 0.7 + scaled * 0.3, F.lit(10.0)))


# ---------------------------------------------------------------------------
# C9: fuzzy URL relevance (exact reference algorithm, Arrow-batched)
# ---------------------------------------------------------------------------

def py_url_relevance(query: str, url: str) -> float:
    """Exact _calculate_url_relevance_score semantics
    (async_url_seeder.py:1519-1605)."""
    from urllib.parse import urlparse

    query_lower = query.lower()
    parsed = urlparse(url)
    domain = parsed.netloc.replace("www.", "")
    path = parsed.path.strip("/")
    domain_parts = domain.split(".")
    path_parts = [p for p in path.split("/") if p]
    param_parts: list[str] = []
    if parsed.query:
        for param in parsed.query.split("&"):
            if "=" in param:
                key, value = param.split("=", 1)
                param_parts.extend([key, value])
    all_parts = domain_parts + path_parts + param_parts

    scores: list[float] = []
    query_tokens = query_lower.split()
    for part in all_parts:
        part_lower = part.lower()
        if query_lower in part_lower:
            scores.append(1.0)
        elif part_lower in query_lower:
            scores.append(0.9)
    for token in query_tokens:
        token_scores = []
        for part in all_parts:
            part_lower = part.lower()
            if token in part_lower:
                token_scores.append(0.7 * len(token) / len(part_lower))
            elif part_lower in token:
                token_scores.append(0.6 * len(part_lower) / len(token))
        if token_scores:
            scores.append(max(token_scores))

    url_text = " ".join(all_parts).lower()
    if len(query_lower) >= 3 and len(url_text) >= 3:
        qgrams = {query_lower[i : i + 3] for i in range(len(query_lower) - 2)}
        ugrams = {url_text[i : i + 3] for i in range(len(url_text) - 2)}
        if qgrams and ugrams:
            jaccard = len(qgrams & ugrams) / len(qgrams | ugrams)
            scores.append(0.5 * jaccard)

    if not scores:
        return 0.0
    scores.sort(reverse=True)
    weighted = sum(s / (i + 1) for i, s in enumerate(scores))
    total_w = sum(1 / (i + 1) for i in range(len(scores)))
    return min(weighted / total_w, 1.0)


def url_relevance_udf(query: str):
    """Arrow UDF factory: relevance of every URL vs a fixed query."""

    @F.pandas_udf(T.DoubleType())
    def _udf(url: pd.Series) -> pd.Series:
        return url.map(lambda u: py_url_relevance(query, u) if u else 0.0)

    return _udf
