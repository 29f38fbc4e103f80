"""Head-metadata filters: ContentRelevanceFilter (F5) and SEOFilter (F6).

The reference HEAD-peeks live pages (utils.py:3027-3058) and parses
<head>; in this engine head fields are COLUMNS of the corpus (fetch is a
lookup), so both filters are pure Column expressions over
(title, description, keywords, robots, canonical, has_ldjson).

ContentRelevanceFilter (filters.py:502-578):
  document = title*3 + " " + description*2 + " " + keywords + " " + all
  meta values (``str * 3`` repeats WITHOUT separators — replicated with
  F.repeat, including the token-merging quirk at the joints), then the
  simplified-IDF BM25 (k1=1.2, b=0.75, avgdl=1000) ≥ threshold.

SEOFilter (filters.py:581-691): weighted head-quality sub-scores with
the reference's exact weights and penalty tables.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawl4ai_spark.sources.seeder import head_bm25

SEO_DEFAULT_WEIGHTS = {
    "title_length": 0.15,
    "title_kw": 0.18,
    "meta_description": 0.12,
    "canonical": 0.10,
    "robot_ok": 0.20,
    "schema_org": 0.10,
    "url_quality": 0.15,
}


def build_head_document(
    title: Column, description: Column, keywords: Column, meta_values: list[Column]
) -> Column:
    """_build_document (filters.py:544-553): ' '.join([title*3, desc*2,
    keywords, ' '.join(meta.values())])."""
    t = F.coalesce(title, F.lit(""))
    d = F.coalesce(description, F.lit(""))
    k = F.coalesce(keywords, F.lit(""))
    metas = F.concat_ws(" ", *[F.coalesce(m, F.lit("")) for m in meta_values])
    return F.concat_ws(" ", F.repeat(t, 3), F.repeat(d, 2), k, metas)


@dataclass
class ContentRelevanceFilter:
    query: str
    threshold: float
    k1: float = 1.2
    b: float = 0.75
    avgdl: int = 1000

    def score_column(self, doc_text: Column) -> Column:
        return head_bm25(doc_text, self.query, self.k1, self.b, self.avgdl)

    def column(self, doc_text: Column) -> Column:
        return self.score_column(doc_text) >= F.lit(float(self.threshold))


def seo_title_length(title: Column) -> Column:
    n = F.length(F.coalesce(title, F.lit("")))
    return (
        F.when((n >= 50) & (n <= 60), 1.0)
        .when(((n >= 40) & (n < 50)) | ((n > 60) & (n <= 70)), 0.7)
        .otherwise(0.3)
    )


def seo_keyword_presence(title: Column, keywords: list[str]) -> Column:
    """min(0.3 × whole-word matches, 1.0) (filters.py:652-656)."""
    if not keywords:
        return F.lit(0.0)
    import re as _re

    pattern = r"(?i)\b({})\b".format("|".join(_re.escape(k) for k in keywords))
    matches = F.regexp_count(F.coalesce(title, F.lit("")), F.lit(pattern))
    return F.least(matches.cast("double") * 0.3, F.lit(1.0))


def seo_meta_description(desc: Column) -> Column:
    n = F.length(F.coalesce(desc, F.lit("")))
    return (
        F.when((n >= 140) & (n <= 160), 1.0)
        .when((n >= 120) & (n <= 200), 0.5)
        .otherwise(0.2)
    )


def seo_canonical(canonical: Column, url: Column) -> Column:
    return (
        F.when(canonical.isNull() | (canonical == ""), 0.5)
        .when(canonical == url, 1.0)
        .otherwise(0.2)
    )


def seo_robot_ok(robots: Column) -> Column:
    return F.when(
        F.coalesce(robots, F.lit("")).contains("noindex"), 0.0
    ).otherwise(1.0)


def seo_url_quality(url: Column) -> Column:
    """Multiplicative penalties on the URL path (filters.py:677-691)."""
    from crawl4ai_spark.functions.filters import url_path

    path = F.lower(url_path(url))
    q = F.regexp_extract(url, r"\?(.*)$", 1)
    score = F.lit(1.0)
    score = score * F.when(F.length(path) > 80, 0.7).otherwise(1.0)
    score = score * F.when(path.rlike(r"\d{4}"), 0.8).otherwise(1.0)
    score = score * F.when(q != "", 0.6).otherwise(1.0)
    score = score * F.when(path.contains("_"), 0.9).otherwise(1.0)
    return score


@dataclass
class SEOFilter:
    threshold: float = 0.65
    keywords: list[str] = field(default_factory=list)
    weights: dict | None = None

    def score_column(
        self,
        url: Column,
        title: Column,
        description: Column,
        robots: Column,
        canonical: Column,
        has_ldjson: Column,
    ) -> Column:
        w = self.weights or SEO_DEFAULT_WEIGHTS
        scores = {
            "title_length": seo_title_length(title),
            "title_kw": seo_keyword_presence(title, self.keywords),
            "meta_description": seo_meta_description(description),
            "canonical": seo_canonical(canonical, url),
            "robot_ok": seo_robot_ok(robots),
            "schema_org": F.when(has_ldjson, 1.0).otherwise(0.0),
            "url_quality": seo_url_quality(url),
        }
        total = F.lit(0.0)
        for factor, weight in w.items():
            total = total + F.lit(float(weight)) * scores[factor]
        return total

    def column(self, *args) -> Column:
        return self.score_column(*args) >= F.lit(float(self.threshold))
