"""Deterministic synthetic crawl corpus — "the web" as a DataFrame.

The reference fetches live pages (async_crawler_strategy.py); in this
sandbox a fetch is a join of the frontier against this corpus table
(SURVEY.md §2.1 S1/S2).  The corpus is generated entirely with Column
expressions over ``spark.range(n)`` so the identical generator scales
from 30 rows (parity tests) to 10^10 rows (the frontier design point)
without any driver-side materialization.

Every attribute is pure integer arithmetic on ``doc_id`` so that
(a) a pure-Python mirror (``pages_dict``) feeds the parity oracle and
(b) a DuckDB SQL mirror (``PAGES_SQL``) feeds the driver's oracle-SQL
correctness gate — three independent implementations of one spec.

Graph: node i links to children (i*B + j) % n for j=1..B, giving a
connected expander-ish digraph with hubs.  Hrefs are intentionally
messy (relative paths, tracking params, fragments) so engine-side
normalization is load-bearing; every variant canonicalizes back to
``canonical_url(child)``.

Domains: ~half of all nodes land on the hot domain d0 (skew fixture —
SURVEY.md §2.4 skew note); the rest spread over d1..d6.

Failure rows: doc_id % 13 == 0 → 404, % 17 == 0 → 429, % 19 == 0 → 503
(politeness/backoff fixture), else 200.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.oracle import Page

SECTIONS = ["blog", "docs", "api", "news", "shop"]
EXTS = [".html", ".pdf", ".jpg", ""]
N_DOMAINS = 7
DEFAULT_BRANCHING = 3


# -- shared spec, integer arithmetic only ----------------------------------

def _dom_idx(i: int) -> int:
    return 0 if i % 2 == 0 else i % N_DOMAINS


def py_canonical_url(i: int) -> str:
    sec = SECTIONS[i % 5]
    year = 2015 + i % 10
    ext = EXTS[i % 4]
    return f"https://d{_dom_idx(i)}.example.com/{sec}/{year}/doc-{i}{ext}"


def py_status(i: int) -> int:
    if i % 13 == 0:
        return 404
    if i % 17 == 0:
        return 429
    if i % 19 == 0:
        return 503
    return 200


def py_children(i: int, n: int, branching: int) -> list[int]:
    return [(i * branching + j) % n for j in range(1, branching + 1)]


def py_href(parent: int, child: int, j: int) -> str:
    """Messy href variant chosen by (parent + j) % 4; all variants
    normalize to py_canonical_url(child)."""
    canon = py_canonical_url(child)
    v = (parent + j) % 4
    if v == 1 and _dom_idx(parent) == _dom_idx(child):
        # relative path — same-domain only, resolves via urljoin
        return canon.split(".example.com", 1)[1]
    if v == 2:
        return canon + "?utm_source=feed"
    if v == 3:
        return canon + "#frag"
    return canon


def py_external(i: int) -> list[str]:
    if i % 6 == 0:
        return [f"https://ext{i % 3}.partner.org/p/{i}"]
    return []


def pages_dict(n: int, branching: int = DEFAULT_BRANCHING) -> dict[str, Page]:
    """Pure-Python mirror for the parity oracle."""
    pages: dict[str, Page] = {}
    for i in range(n):
        links = [
            (py_href(i, c, j + 1), False)
            for j, c in enumerate(py_children(i, n, branching))
        ]
        links += [(e, True) for e in py_external(i)]
        status = py_status(i)
        pages[py_canonical_url(i)] = Page(
            url=py_canonical_url(i),
            status_code=status,
            success=status == 200,
            links=links,
        )
    return pages


# -- Spark generator ---------------------------------------------------------

def _dom_idx_col(i: Column) -> Column:
    return F.when(i % 2 == 0, F.lit(0)).otherwise(i % N_DOMAINS)


def canonical_url_col(i: Column) -> Column:
    sec = F.element_at(F.array(*[F.lit(s) for s in SECTIONS]), (i % 5 + 1).cast("int"))
    year = (F.lit(2015) + i % 10).cast("string")
    ext = F.element_at(F.array(*[F.lit(e) for e in EXTS]), (i % 4 + 1).cast("int"))
    return F.concat(
        F.lit("https://d"), _dom_idx_col(i).cast("string"),
        F.lit(".example.com/"), sec, F.lit("/"), year,
        F.lit("/doc-"), i.cast("string"), ext,
    )


def _status_col(i: Column) -> Column:
    return (
        F.when(i % 13 == 0, 404)
        .when(i % 17 == 0, 429)
        .when(i % 19 == 0, 503)
        .otherwise(200)
    )


def _href_col(parent: Column, child: Column, j: int) -> Column:
    canon = canonical_url_col(child)
    v = (parent + j) % 4
    relative = F.substring_index(canon, ".example.com", -1)
    return (
        F.when((v == 1) & (_dom_idx_col(parent) == _dom_idx_col(child)), relative)
        .when(v == 2, F.concat(canon, F.lit("?utm_source=feed")))
        .when(v == 3, F.concat(canon, F.lit("#frag")))
        .otherwise(canon)
    )


def build_pages(
    spark: SparkSession,
    n: int,
    branching: int = DEFAULT_BRANCHING,
    partitions: int | None = None,
) -> DataFrame:
    """Corpus DataFrame: (doc_id, url, domain, status_code, success,
    links array<struct<href,is_external>>, image_id)."""
    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    children = [((i * branching + j) % n) for j in range(1, branching + 1)]
    internal = [
        F.struct(
            _href_col(i, c, j + 1).alias("href"),
            F.lit(False).alias("is_external"),
        )
        for j, c in enumerate(children)
    ]
    external = F.when(
        i % 6 == 0,
        F.array(
            F.struct(
                F.concat(
                    F.lit("https://ext"), (i % 3).cast("string"),
                    F.lit(".partner.org/p/"), i.cast("string"),
                ).alias("href"),
                F.lit(True).alias("is_external"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<href:string,is_external:boolean>>"))
    status = _status_col(i)
    return rng.select(
        i.alias("doc_id"),
        canonical_url_col(i).alias("url"),
        F.concat(F.lit("d"), _dom_idx_col(i).cast("string"), F.lit(".example.com")).alias("domain"),
        status.alias("status_code"),
        (status == 200).alias("success"),
        F.concat(F.array(*internal), external).alias("links"),
        F.concat(F.lit("img-"), (i % 499).cast("string")).alias("image_id"),
    )


# -- DuckDB SQL mirror -------------------------------------------------------

def pages_sql_cte(n: int, branching: int = DEFAULT_BRANCHING) -> str:
    """A DuckDB CTE body producing (doc_id, url, domain, status_code,
    success) — the link graph is re-derived arithmetically in the oracle
    queries that need it, so this carries node attributes only."""
    return f"""
    SELECT
      i AS doc_id,
      'https://d' || (CASE WHEN i % 2 = 0 THEN 0 ELSE i % {N_DOMAINS} END)
        || '.example.com/'
        || (['blog','docs','api','news','shop'])[(i % 5) + 1]
        || '/' || (2015 + i % 10)
        || '/doc-' || i
        || (['.html','.pdf','.jpg',''])[(i % 4) + 1] AS url,
      'd' || (CASE WHEN i % 2 = 0 THEN 0 ELSE i % {N_DOMAINS} END) || '.example.com' AS domain,
      (CASE WHEN i % 13 = 0 THEN 404 WHEN i % 17 = 0 THEN 429
            WHEN i % 19 = 0 THEN 503 ELSE 200 END) AS status_code,
      (i % 13 <> 0 AND i % 17 <> 0 AND i % 19 <> 0) AS success
    FROM range({n}) t(i)
    """
