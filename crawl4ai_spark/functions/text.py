"""Text-analysis operators for a large-scale training-data pipeline.

These run over the ``documents`` table (doc_id, text, lang, source,
n_chars).  All hot-path logic is JVM Column expressions; each operator
has a deliberately SQL-expressible definition so the driver's DuckDB
oracle can verify it (see __spark_entry__.oracle_sql).

Operators:
- token_count        — whitespace tokenization count
- word_stats         — punct/digit/upper/whitespace ratios
- quality_score      — length + punctuation + stopword-ratio heuristic
- lang_id            — stopword-hit n-gram heuristic over a small
                       per-language marker list
- fingerprint        — document fingerprint (md5-based 64-bit)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny marker lexicons for the language-ID heuristic (padded with spaces
# so they match as words; deterministic + SQL-expressible)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " in "],
    "de": [" der ", " und ", " die ", " ist ", " nicht "],
    "fr": [" le ", " la ", " et ", " les ", " des "],
    "es": [" el ", " la ", " los ", " que ", " de "],
}

STOPWORDS_EN = ["the", "and", "of", "to", "in", "a", "is", "it", "for", "on"]


def token_count(text: Column) -> Column:
    """Whitespace token count — size of the non-empty split."""
    return F.size(F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != ""))


def char_ratio(text: Column, pattern: str) -> Column:
    """Fraction of characters matching a regex char class."""
    stripped = F.regexp_replace(text, pattern, "")
    return (F.length(text) - F.length(stripped)).cast("double") / F.greatest(
        F.length(text).cast("double"), F.lit(1.0)
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, 1]:
    0.4·length-band + 0.3·(1 - punct_ratio·5 capped) + 0.3·alpha_ratio.

    Mirrors the shape of the reference's head-quality scoring
    (SEOFilter weights, filters.py:587-595) applied to body text; used
    for corpus filtering at ingest."""
    n = F.length(text).cast("double")
    length_band = F.when(n < 50, n / 50.0).when(n > 10000, F.lit(0.5)).otherwise(1.0)
    punct = char_ratio(text, r"[^\w\s]")
    alpha = char_ratio(text, r"[A-Za-z]")
    return (
        F.lit(0.4) * length_band
        + F.lit(0.3) * F.greatest(F.lit(0.0), F.lit(1.0) - punct * 5.0)
        + F.lit(0.3) * alpha
    )


def lang_marker_hits(text: Column, lang: str) -> Column:
    """Non-overlapping occurrence count of each space-padded marker,
    via the length-difference trick (literal replace — identical
    semantics in Spark and DuckDB)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits = F.lit(0.0)
    for marker in LANG_MARKERS[lang]:
        removed = F.replace(padded, F.lit(marker), F.lit(""))
        hits = hits + (F.length(padded) - F.length(removed)).cast("double") / float(
            len(marker)
        )
    return hits


def lang_id(text: Column) -> Column:
    """argmax over per-language marker hit counts; 'und' when all zero.
    Ties break by language code order (deterministic)."""
    pairs = [
        F.struct(
            lang_marker_hits(text, lang).alias("hits"), F.lit(lang).alias("lang")
        )
        for lang in sorted(LANG_MARKERS)
    ]
    best = F.array_max(F.array(*pairs))  # struct compare: hits then lang
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """64-bit md5-derived fingerprint (first 15 hex digits → bigint).

    md5 exists verbatim in DuckDB, making this cross-engine verifiable —
    unlike xxhash64 which is Spark-private."""
    return F.conv(F.substring(F.md5(text), 1, 15), 16, 10).cast("long")


def stopword_ratio(text: Column) -> Column:
    toks = F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != "")
    stops = F.filter(toks, lambda t: t.isin(*STOPWORDS_EN))
    return F.size(stops).cast("double") / F.greatest(
        F.size(toks).cast("double"), F.lit(1.0)
    )
