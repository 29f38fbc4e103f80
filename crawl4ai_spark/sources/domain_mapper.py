"""S10 DomainMapper: multi-source URL discovery for a whole domain.

Reference: ``DomainMapper`` (/root/reference/crawl4ai/domain_mapper.py,
1,132 LoC) discovers URLs under a domain from 8 sources — sitemap, cc,
wayback, crt, probe, robots, feed, homepage (``VALID_SOURCES``,
domain_mapper.py:83) — in two phases: host discovery (crt/wayback/cc
subdomain mining, :305-471) then per-host URL discovery (:506-600),
merged with per-URL dedupe.

Spark mapping — every network API becomes a table + a Column program
(fetch-as-join, like S1/S2):

- crt.sh JSON entries     → ``hosts_from_crt``      (explode SANs)
- Wayback CDX lines       → ``hosts_from_wayback`` / ``urls_from_wayback``
- CC index                → ``hosts_from_cc`` (reuses S4's pushdown scan)
- robots.txt Sitemap:     → ``sitemap_urls_from_robots`` (regex lines)
- probe paths             → ``probe_urls`` (hosts × paths, existence =
                            join against the fetch corpus)
- feed/homepage hrefs     → ``feed_urls`` (regex over homepage HTML)
- composition             → ``map_domain`` (union + first-source-wins
                            dedupe by source priority, then order)

Scale: host discovery unions small per-source host sets (broadcastable);
URL discovery is per-source scans unioned then deduped by url — one
hash shuffle on url, the same key the crawl's seen store uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawl4ai_spark.functions.normalize import domain_of

# reference domain_mapper.py:83
VALID_SOURCES = ("sitemap", "cc", "wayback", "crt", "probe", "robots", "feed", "homepage")

# reference DEFAULT_PROBE_PATHS (domain_mapper.py:61-80 spirit): the
# common well-known paths a mapper checks even when unlisted
DEFAULT_PROBE_PATHS = (
    "/", "/about", "/contact", "/blog", "/docs", "/api", "/login",
    "/admin", "/sitemap.xml", "/feed", "/rss",
)


def _host_suffix_filter(host, base_domain: str):
    return (host == base_domain.lower()) | host.endswith("." + base_domain.lower())


def hosts_from_crt(ct_entries: DataFrame, base_domain: str) -> DataFrame:
    """Subdomains from Certificate Transparency entries
    (domain_mapper.py:361-389): split newline-separated SANs in
    common_name/name_value, strip wildcards, keep ``*.base_domain``."""
    names = ct_entries.select(
        F.explode(
            F.split(
                F.concat_ws("\n", F.col("common_name"), F.col("name_value")), "\n"
            )
        ).alias("raw")
    )
    cleaned = names.select(F.lower(F.trim(F.col("raw"))).alias("host_c")).select(
        F.when(F.col("host_c").startswith("*."), F.expr("substring(host_c, 3)"))
        .otherwise(F.col("host_c"))
        .alias("host")
    )
    return (
        cleaned.filter(F.col("host") != "")
        .filter(_host_suffix_filter(F.col("host"), base_domain))
        .dropDuplicates(["host"])
    )


def urls_from_wayback(cdx: DataFrame, base_domain: str, url_col: str = "original") -> DataFrame:
    """Wayback CDX rows (fl=original) → (url, host), suffix-filtered
    (domain_mapper.py:391-420)."""
    host = F.lower(F.substring_index(domain_of(F.col(url_col)), ":", 1))
    return (
        cdx.select(F.trim(F.col(url_col)).alias("url"), host.alias("host"))
        .filter((F.col("url") != "") & (F.col("host") != ""))
        .filter(_host_suffix_filter(F.col("host"), base_domain))
    )


def hosts_from_wayback(cdx: DataFrame, base_domain: str, url_col: str = "original") -> DataFrame:
    return urls_from_wayback(cdx, base_domain, url_col).select("host").dropDuplicates(["host"])


def hosts_from_cc(cc_index: DataFrame, base_domain: str, url_col: str = "url") -> DataFrame:
    """Unique hostnames from CC index rows (domain_mapper.py:422-445)."""
    host = F.lower(F.substring_index(domain_of(F.col(url_col)), ":", 1))
    return (
        cc_index.select(host.alias("host"))
        .filter(F.col("host") != "")
        .filter(_host_suffix_filter(F.col("host"), base_domain))
        .dropDuplicates(["host"])
    )


def sitemap_urls_from_robots(robots_docs: DataFrame) -> DataFrame:
    """``Sitemap:`` lines mined from robots.txt documents
    ((host, content) rows → (host, sitemap_url)); the reference feeds
    these into its sitemap scan (domain_mapper.py:524-526)."""
    return robots_docs.select(
        "host",
        F.explode(
            F.regexp_extract_all(
                F.col("content"), F.lit(r"(?im)^\s*sitemap:\s*(\S+)"), 1
            )
        ).alias("sitemap_url"),
    ).dropDuplicates(["sitemap_url"])


def probe_urls(hosts: DataFrame, extra_paths: list[str] | None = None) -> DataFrame:
    """hosts × probe paths → candidate URLs; existence is established
    downstream by joining against the fetch corpus (the reference HEADs
    each probe, :447-505 — fetch-as-join here)."""
    paths = list(dict.fromkeys(DEFAULT_PROBE_PATHS + tuple(extra_paths or ())))
    arr = F.array(*[F.lit(p) for p in paths])
    return hosts.select(
        "host", F.explode(arr).alias("path")
    ).select(
        "host", F.concat(F.lit("https://"), F.col("host"), F.col("path")).alias("url")
    )


def feed_urls(homepages: DataFrame, base_domain: str) -> DataFrame:
    """Feed links from homepage HTML: <link rel=alternate type=rss/atom
    href=...> (domain_mapper.py feed source).  Regex over the href —
    homepage HTML is one row per host, JVM-side."""
    hrefs = F.regexp_extract_all(
        F.col("content"),
        F.lit(r'(?is)<link[^>]*type="application/(?:rss|atom)\+xml"[^>]*href="([^"]+)"'),
        1,
    )
    out = homepages.select("host", F.explode(hrefs).alias("href"))
    url = F.when(
        F.col("href").rlike(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"), F.col("href")
    ).otherwise(F.concat(F.lit("https://"), F.col("host"), F.col("href")))
    return out.select("host", url.alias("url")).dropDuplicates(["url"])


def map_domain(
    base_domain: str,
    pages: DataFrame,
    sitemap_seeds: DataFrame | None = None,
    cc_index: DataFrame | None = None,
    wayback_cdx: DataFrame | None = None,
    ct_entries: DataFrame | None = None,
    robots_docs: DataFrame | None = None,
    homepages: DataFrame | None = None,
    probe: bool = True,
    source_priority: tuple = ("sitemap", "cc", "wayback", "feed", "probe"),
) -> DataFrame:
    """Compose the per-source URL sets into one deduped map:
    (url, host, source) with first-source-wins dedupe by
    ``source_priority`` order then URL order.

    ``pages`` (the fetch corpus, column ``url``) validates probe
    candidates — a probe URL that isn't fetchable doesn't exist.
    """
    parts: list[DataFrame] = []

    def _tag(df: DataFrame, source: str) -> DataFrame:
        host = F.lower(F.substring_index(domain_of(F.col("url")), ":", 1))
        return df.select(
            F.col("url"), host.alias("host"), F.lit(source).alias("source")
        )

    if sitemap_seeds is not None:
        parts.append(_tag(sitemap_seeds.select("url"), "sitemap"))
    if cc_index is not None:
        from crawl4ai_spark.sources.sitemap import cc_index_seeds

        cc = cc_index_seeds(cc_index, base_domain)
        parts.append(_tag(cc.select("url"), "cc"))
    if wayback_cdx is not None:
        parts.append(_tag(urls_from_wayback(wayback_cdx, base_domain).select("url"), "wayback"))
    if homepages is not None:
        parts.append(_tag(feed_urls(homepages, base_domain).select("url"), "feed"))
    if probe:
        hosts = None
        for src in (
            hosts_from_crt(ct_entries, base_domain) if ct_entries is not None else None,
            hosts_from_wayback(wayback_cdx, base_domain) if wayback_cdx is not None else None,
            hosts_from_cc(cc_index, base_domain) if cc_index is not None else None,
        ):
            if src is None:
                continue
            hosts = src if hosts is None else hosts.unionByName(src)
        spark = pages.sparkSession
        base = spark.createDataFrame([(base_domain,)], "host string")
        hosts = base if hosts is None else hosts.unionByName(base).dropDuplicates(["host"])
        extra = None
        if robots_docs is not None:
            # robots Disallow paths extend the probe list in the
            # reference (:533-541): mine them as extra probe paths
            extra = [
                r["p"]
                for r in robots_docs.select(
                    F.explode(
                        F.regexp_extract_all(
                            F.col("content"),
                            F.lit(r"(?im)^\s*disallow:\s*(/\S*)"), 1,
                        )
                    ).alias("p")
                ).distinct().limit(100).collect()
            ]
        probes = probe_urls(hosts, extra_paths=extra)
        # existence check = semi-join against the corpus
        existing = probes.join(pages.select("url"), "url", "left_semi")
        parts.append(_tag(existing.select("url"), "probe"))

    if not parts:
        raise ValueError("at least one source table must be provided")
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    prio = F.array(*[F.lit(s) for s in source_priority])
    # array_position returns 0 (not NULL) on a miss — an unlisted
    # source must rank LAST (99), not first
    pos = F.array_position(prio, F.col("source"))
    rank_expr = F.when(pos > 0, pos).otherwise(F.lit(99))
    w = Window.partitionBy("url").orderBy(rank_expr.asc(), F.col("source"))
    return (
        merged.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
