"""S3/S4 seed sources: sitemap-XML parsing and Common Crawl index reads.

Reference semantics (re-expressed, not ported):

- ``_iter_sitemap_content`` (/root/reference/crawl4ai/async_url_seeder.py:
  1000-1104): gunzip ``.gz`` payloads; a document containing
  ``<sitemap><loc>`` nodes is a sitemap INDEX — yield the sub-sitemap
  locations and recurse; only a non-index document yields its
  ``<url><loc>`` page entries.  Each loc is stripped of zero-width/BOM
  characters and resolved against the sitemap's own URL.
- ``_from_sitemaps`` (:885-983): per domain, probe
  {https,http} × {/sitemap.xml,/sitemap_index.xml} and use the FIRST
  candidate that resolves; filter discovered URLs by a glob pattern.
- ``_from_cc`` (:829-883): query the Common Crawl index for
  ``*.<domain>/*`` and filter by the same glob pattern.  The CC index
  is columnar; in Spark this is a parquet scan with the domain filter
  PUSHED DOWN — no API pagination, no driver loop.

Spark mapping: sitemap XML is machine-generated and schema-fixed, so
the ``<loc>`` extraction runs entirely JVM-side with
``regexp_extract_all`` (the equivalent of the reference's
local-name()-based XPath for well-formed sitemaps); only non-absolute
locs (rare) cross the Arrow bridge for a true ``urljoin``.  Nested
index expansion is a bounded driver loop of joins against the document
corpus (fetch-as-join, like the crawl engine's S1/S2): level ≤
``max_levels`` keeps the plan finite, and every level is one
distributed join + explode — no per-sitemap tasks on the driver.
"""

from __future__ import annotations

import gzip
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# <sitemap ...><loc>X</loc> — sub-sitemap entries of a sitemap INDEX.
# `(?:\s[^>]*)?>` keeps `<sitemapindex>` / `<urlset>` wrappers from
# matching as entry tags.
_SITEMAP_LOC_RE = r"(?s)<sitemap(?:\s[^>]*)?>.*?<loc>\s*(.*?)\s*</loc>"
_URL_LOC_RE = r"(?s)<url(?:\s[^>]*)?>.*?<loc>\s*(.*?)\s*</loc>"

_ABS_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"


@F.pandas_udf(T.StringType())
def urljoin_udf(base: pd.Series, loc: pd.Series) -> pd.Series:
    """True RFC-3986 resolve for the rare non-absolute sitemap loc."""
    return pd.Series(
        [urljoin(b or "", l) if l else None for b, l in zip(base, loc)],
        dtype=object,
    )


@F.pandas_udf(T.StringType())
def gunzip_text_udf(content: pd.Series) -> pd.Series:
    """Decompress gzipped sitemap payloads (binary → text).  Non-gzip
    bytes pass through decoded as-is (the reference switches on the
    ``.gz`` suffix; magic-byte sniffing here serves the same purpose
    without trusting the name)."""

    def _one(b):
        if b is None:
            return None
        raw = bytes(b)
        if raw[:2] == b"\x1f\x8b":
            try:
                raw = gzip.decompress(raw)
            except OSError:
                return None
        return raw.decode("utf-8", errors="replace")

    return pd.Series([_one(b) for b in content], dtype=object)


def _clean_loc(c: Column) -> Column:
    # strip + drop zero-width space / BOM (async_url_seeder.py:1004-1008)
    return F.regexp_replace(F.trim(c), "[​﻿]", "")


def _resolve_loc(base: Column, loc: Column) -> Column:
    """Absolute locs stay JVM-side; relative ones get a real urljoin."""
    cleaned = _clean_loc(loc)
    return F.when(cleaned.rlike(_ABS_RE), cleaned).otherwise(
        urljoin_udf(base, cleaned)
    )


def parse_sitemap(
    docs: DataFrame,
    url_col: str = "sitemap_url",
    xml_col: str = "content",
    carry: list[str] | None = None,
) -> DataFrame:
    """One row per ``<loc>`` entry across a DataFrame of sitemap
    documents: (sitemap_url, loc, is_index, loc_idx [, *carry]).

    ``is_index`` is per-DOCUMENT (reference: any <sitemap> node makes
    the whole document an index and its <url> entries are ignored —
    async_url_seeder.py:1050-1066).

    ``carry`` names extra input columns to pass through unchanged
    (e.g. the owning domain) — carrying context beats recovering it
    with a post-hoc join on sitemap_url, which is NOT unique when two
    domains reference the same sub-sitemap.
    """
    base = F.col(url_col)
    xml = F.col(xml_col)
    carry = list(carry or [])
    sub = F.regexp_extract_all(xml, F.lit(_SITEMAP_LOC_RE), 1)
    urls = F.regexp_extract_all(xml, F.lit(_URL_LOC_RE), 1)
    is_index = F.size(sub) > 0
    entries = F.when(is_index, sub).otherwise(urls)
    exploded = docs.select(
        base.alias("sitemap_url"),
        is_index.alias("is_index"),
        F.posexplode(entries).alias("loc_idx", "raw_loc"),
        *carry,
    )
    return exploded.select(
        "sitemap_url",
        "is_index",
        "loc_idx",
        _resolve_loc(F.col("sitemap_url"), F.col("raw_loc")).alias("loc"),
        *carry,
    ).filter(F.col("loc").isNotNull() & (F.col("loc") != ""))


def sitemap_probe_candidates(domains: DataFrame, url_col: str = "domain") -> DataFrame:
    """The reference's root-sitemap probe order per domain
    (async_url_seeder.py:919-933): https/sitemap.xml,
    https/sitemap_index.xml, http/sitemap.xml, http/sitemap_index.xml.
    Returns (domain, probe_url, probe_rank)."""
    probes = [
        (scheme, suffix)
        for scheme in ("https", "http")
        for suffix in ("/sitemap.xml", "/sitemap_index.xml")
    ]
    arr = F.array(
        *[
            F.struct(
                F.concat(
                    F.lit(f"{scheme}://"), F.col(url_col), F.lit(suffix)
                ).alias("probe_url"),
                F.lit(i).alias("probe_rank"),
            )
            for i, (scheme, suffix) in enumerate(probes)
        ]
    )
    return domains.select(
        F.col(url_col).alias("domain"), F.explode(arr).alias("p")
    ).select("domain", "p.probe_url", "p.probe_rank")


def seed_from_sitemaps(
    domains: DataFrame,
    sitemap_docs: DataFrame,
    url_pattern: str = "*",
    max_levels: int = 4,
) -> DataFrame:
    """Full S3 pipeline: probe root sitemaps per domain → expand nested
    sitemap indexes (bounded driver loop of joins) → page URLs filtered
    by glob pattern.  Returns (domain, url).

    ``sitemap_docs``: the sitemap corpus (fetch-as-join analog of the
    reference's HTTP GETs) with columns (sitemap_url, content); gz
    payloads should be pre-decoded via ``gunzip_text_udf``.

    Scale: each level is one equi-join on sitemap_url (broadcastable —
    a level's frontier is tiny next to the corpus) + a JVM-side
    regex-explode; no sitemap content ever reaches the driver.
    """
    probes = sitemap_probe_candidates(domains)
    found = probes.join(
        sitemap_docs.select(F.col("sitemap_url").alias("probe_url"), "content"),
        "probe_url",
    )
    w = Window.partitionBy("domain").orderBy("probe_rank")
    roots = (
        found.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("domain", F.col("probe_url").alias("sitemap_url"), "content")
    )

    page_parts: list[DataFrame] = []
    frontier = roots
    for _ in range(max_levels):
        # domain rides through the parse (carry=) — recovering it via a
        # join on sitemap_url would multiply entries when two domains
        # reference the same sub-sitemap URL
        entries = parse_sitemap(
            frontier.select("domain", "sitemap_url", "content"),
            url_col="sitemap_url",
            xml_col="content",
            carry=["domain"],
        )
        page_parts.append(
            entries.filter(~F.col("is_index")).select(
                "domain", F.col("loc").alias("url")
            )
        )
        sub = entries.filter(F.col("is_index")).select(
            "domain", F.col("loc").alias("sitemap_url")
        ).dropDuplicates(["domain", "sitemap_url"])
        # fetch the next level of sitemaps (join is the fetch)
        frontier = sub.join(sitemap_docs, "sitemap_url").select(
            "domain", "sitemap_url", "content"
        )
        # bounded loop: an empty level ends expansion early via the
        # emptiness of every later join (no driver-side count needed)

    out = page_parts[0]
    for p in page_parts[1:]:
        out = out.unionByName(p)
    out = out.dropDuplicates(["url"])
    if url_pattern and url_pattern != "*":
        out = out.filter(F.col("url").rlike(glob_to_regex(url_pattern)))
    return out


def glob_to_regex(pattern: str) -> str:
    """fnmatch-style glob → anchored Java regex (the reference filters
    discovered URLs with fnmatch, async_url_seeder.py:178)."""
    import fnmatch

    # fnmatch.translate emits python-specific (?s:...)\Z — convert
    inner = fnmatch.translate(pattern)
    if inner.startswith("(?s:") and inner.endswith(r")\Z"):
        inner = inner[4:-3]
    return f"(?s)^{inner}$"


def cc_index_seeds(
    cc_index: DataFrame,
    domain: str,
    url_pattern: str = "*",
    domain_col: str = "url_host_registered_domain",
    url_col: str = "url",
) -> DataFrame:
    """S4: seed URLs for one registered domain from a Common Crawl
    columnar index table (the parquet form of the index the reference
    queries over HTTP, async_url_seeder.py:829-883).

    The domain equality filter and the url/domain column pruning reach
    the parquet scan (PushedFilters) — at the real CC index's ~3·10^9
    rows/crawl that partition-pruned scan is the whole game; the glob
    filter then runs JVM-side on the survivors."""
    out = (
        cc_index.filter(F.col(domain_col) == domain)
        .select(F.col(url_col).alias("url"))
        .dropDuplicates(["url"])
    )
    if url_pattern and url_pattern != "*":
        out = out.filter(F.col("url").rlike(glob_to_regex(url_pattern)))
    return out.withColumn("domain", F.lit(domain)).select("domain", "url")
