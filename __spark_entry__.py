"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for
every SQL-expressible one (the driver compares row count + schema +
order-insensitive value hash at sf=0.01).  Even the strict best-first
traversal has a recursive-CTE oracle (round-by-round replay,
_bff_crawl_sql); only DFS strict order and binary image decode remain
rows-only, by design.

The synthetic "web" used by crawl queries derives every attribute from
``doc_id`` arithmetic (crawl4ai_spark/sources/corpus.py), so the same
graph is constructible in Spark, in pure Python (parity oracle), and in
DuckDB SQL (recursive CTE) — three independent implementations that
must agree.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from pathlib import Path

_ROOT = str(Path(__file__).resolve().parent)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
# executor python workers must import crawl4ai_spark too (pandas UDFs
# pickle by module reference); harmless if the session already exists
# with cwd == repo root.
_pp = os.environ.get("PYTHONPATH", "")
if _ROOT not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = f"{_ROOT}{os.pathsep}{_pp}" if _pp else _ROOT

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.functions import chunking as CH
from crawl4ai_spark.functions import dedup as D
from crawl4ai_spark.functions import similarity as SIM
from crawl4ai_spark.functions import text as TX
from crawl4ai_spark.functions.filters import (
    ContentTypeFilter,
    DomainFilter,
    URLPatternFilter,
    valid_crawl_url,
)
from crawl4ai_spark.functions.normalize import normalize_udf
from crawl4ai_spark.functions.scorers import (
    CompositeScorer,
    ContentTypeScorer,
    DomainAuthorityScorer,
    FreshnessScorer,
    KeywordRelevanceScorer,
    PathDepthScorer,
)
from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.sources import corpus

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

BRANCHING = corpus.DEFAULT_BRANCHING


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _doc_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + the synthetic canonical URL derived from doc_id."""
    return _docs(spark, sf_dir).withColumn(
        "url", corpus.canonical_url_col(F.col("doc_id"))
    )


# SQL mirror of corpus.canonical_url_col over a doc_id expression
def _sql_url(e: str = "doc_id") -> str:
    return (
        f"'https://d' || CAST(CASE WHEN {e} % 2 = 0 THEN 0 ELSE {e} % 7 END AS VARCHAR)"
        f" || '.example.com/' || (['blog','docs','api','news','shop'])[CAST({e} % 5 AS INT) + 1]"
        f" || '/' || CAST(2015 + {e} % 10 AS VARCHAR)"
        f" || '/doc-' || CAST({e} AS VARCHAR)"
        f" || (['.html','.pdf','.jpg',''])[CAST({e} % 4 AS INT) + 1]"
    )


_SQL_TOKS = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"
)

_SCORERS = {
    "keyword": KeywordRelevanceScorer(keywords=["docs", "blog"], weight=1.0),
    "ctype": ContentTypeScorer(
        type_weights={".html$": 1.0, ".pdf$": 0.8, ".jpg$": 0.6}, weight=1.0
    ),
    "fresh": FreshnessScorer(weight=1.0, current_year=2024),
    "domauth": DomainAuthorityScorer(
        domain_weights={"d0.example.com": 1.0, "d1.example.com": 0.8},
        default_weight=0.3,
        weight=1.0,
    ),
}
_COMPOSITE = CompositeScorer(scorers=list(_SCORERS.values()), normalize=True)

# SQL mirrors of each scorer ON THE SYNTHETIC URL (expected values by
# construction of the URL — an independent derivation, not a port of the
# Column expression)
_SQL_KEYWORD = (
    "(CASE WHEN contains(url,'docs') THEN 1 ELSE 0 END"
    " + CASE WHEN contains(url,'blog') THEN 1 ELSE 0 END) / 2.0"
)
_SQL_CTYPE = (
    "CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 1.0 WHEN 1 THEN 0.8 WHEN 2 THEN 0.6 ELSE 0.0 END"
)
# year = 2015 + doc_id%10 → diff = 9 - doc_id%10; table literals for
# diff<6, else the SAME float arithmetic as the Column expression
# (scorers.py FreshnessScorer fallback): 1.0 - 6*0.1 is 0.3999999999999999,
# one ULP under a 0.4 literal — rounded literals here would diverge in
# the last bit exactly as _bff_crawl_sql's docstring warns
_SQL_FRESH = (
    "CASE WHEN 9 - CAST(doc_id % 10 AS INT) < 6 THEN"
    " CASE 9 - CAST(doc_id % 10 AS INT)"
    " WHEN 0 THEN 1.0 WHEN 1 THEN 0.9 WHEN 2 THEN 0.8 WHEN 3 THEN 0.7"
    " WHEN 4 THEN 0.6 ELSE 0.5 END"
    " ELSE greatest(0.1, 1.0 - CAST(9 - CAST(doc_id % 10 AS INT) AS DOUBLE) * 0.1)"
    " END"
)
_SQL_DOMAUTH = (
    "CASE CASE WHEN doc_id % 2 = 0 THEN 0 ELSE CAST(doc_id % 7 AS INT) END"
    " WHEN 0 THEN 1.0 WHEN 1 THEN 0.8 ELSE 0.3 END"
)


def _bff_crawl_sql(max_pages: int = 30, max_depth: int = 2, batch: int = 10) -> str:
    """Recursive-CTE replay of the strict best-first crawl (W3) —
    bit-exact against the Spark engine (verified at n∈{40,60,100,200,500}
    across max_depth 2-4 and binding/non-binding max_pages).

    One recursive iteration = one engine round: rank the queue by the
    reference's heap tuple (-score, depth, url, parent)
    (bff_strategy.py:228,254-270), pop ``batch`` rows, drop already-
    visited and within-batch-duplicate pops, fetch, emit under the
    cumulative max_pages boundary (bff_strategy.py:295-307), and enqueue
    scored children of non-boundary successes.  State rows (queue /
    visited / counters) are regenerated each iteration; emission rows
    are produced exactly once in their round and accumulate in the CTE
    result.  The freshness term mirrors the engine's arithmetic
    (``greatest(0.1, 1.0 - diff*0.1)`` for diff ≥ 6, table below) so
    scores — and therefore pop ORDER — match to the last bit; a rounded
    lookup table here would flip ties and diverge the whole traversal.
    """
    url_i = _sql_url("i")
    return f"""
WITH RECURSIVE
nn AS (SELECT count(*) AS n FROM documents),
nodes AS (
  SELECT i AS doc_id,
         {url_i} AS url,
         (i % 13 <> 0 AND i % 17 <> 0 AND i % 19 <> 0) AS ok,
         (
           (CASE WHEN contains({url_i},'docs') THEN 1 ELSE 0 END
            + CASE WHEN contains({url_i},'blog') THEN 1 ELSE 0 END) / 2.0
           + CASE CAST(i % 4 AS INT) WHEN 0 THEN 1.0 WHEN 1 THEN 0.8 WHEN 2 THEN 0.6 ELSE 0.0 END
           + CASE WHEN 9 - CAST(i % 10 AS INT) < 6
                  THEN ([1.0, 0.9, 0.8, 0.7, 0.6, 0.5])[(9 - CAST(i % 10 AS INT)) + 1]
                  ELSE greatest(0.1, 1.0 - CAST(9 - (i % 10) AS DOUBLE) * 0.1) END
           + CASE CASE WHEN i % 2 = 0 THEN 0 ELSE CAST(i % 7 AS INT) END
               WHEN 0 THEN 1.0 WHEN 1 THEN 0.8 ELSE 0.3 END
         ) / 4.0 AS comp
  FROM (SELECT doc_id AS i FROM documents) t
),
st(kind, doc_id, parent_id, neg_score, depth, url, parent_url, seq, success, pages, emitc) AS (
  SELECT 'q', nd.doc_id, CAST(-1 AS BIGINT), -nd.comp, 0, nd.url, '',
         CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
  FROM nodes nd WHERE nd.doc_id = 1
  UNION ALL
  SELECT 'c', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
         CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION ALL
  SELECT * FROM (
    WITH cur AS (SELECT * FROM st),
    cnt AS (SELECT pages, emitc FROM cur WHERE kind = 'c'),
    qq AS (SELECT * FROM cur WHERE kind = 'q'),
    vis AS (SELECT doc_id FROM cur WHERE kind = 'v'),
    popped AS (
      SELECT q.*, row_number() OVER (ORDER BY q.neg_score, q.depth, q.url, q.parent_url) AS rn
      FROM qq q
      QUALIFY rn <= {batch}
    ),
    batch AS (
      SELECT p.*, row_number() OVER (ORDER BY p.rn) AS bseq
      FROM (
        SELECT p2.*, row_number() OVER (PARTITION BY p2.doc_id ORDER BY p2.rn) AS occ
        FROM popped p2
        WHERE p2.doc_id NOT IN (SELECT doc_id FROM vis)
      ) p
      WHERE p.occ = 1
    ),
    emitted AS (
      SELECT f.*,
             SUM(CASE WHEN f.ok2 THEN 1 ELSE 0 END) OVER (
               ORDER BY f.bseq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM (SELECT b.*, nd.ok AS ok2 FROM batch b JOIN nodes nd ON nd.doc_id = b.doc_id) f
      QUALIFY cum - (CASE WHEN f.ok2 THEN 1 ELSE 0 END) < {max_pages} - (SELECT pages FROM cnt)
    ),
    newq AS (
      SELECT c.cid AS doc_id, c.parent_id, -nd.comp AS neg_score, c.cdepth AS depth,
             nd.url AS url, c.purl AS parent_url
      FROM (
        SELECT (p.doc_id * {BRANCHING} + j) % (SELECT n FROM nn) AS cid,
               p.doc_id AS parent_id, p.depth + 1 AS cdepth, p.url AS purl
        FROM emitted p CROSS JOIN range(1, {BRANCHING} + 1) t(j)
        WHERE p.ok2 AND p.cum < {max_pages} - (SELECT pages FROM cnt)
          AND p.depth + 1 <= {max_depth}
      ) c
      JOIN nodes nd ON nd.doc_id = c.cid
      WHERE c.cid NOT IN (SELECT doc_id FROM vis)
        AND c.cid NOT IN (SELECT doc_id FROM batch)
    ),
    nxt AS (
      SELECT 'q' AS kind, q.doc_id, q.parent_id, q.neg_score, q.depth, q.url, q.parent_url,
             CAST(NULL AS BIGINT) AS seq, CAST(NULL AS BOOLEAN) AS success,
             CAST(NULL AS BIGINT) AS pages, CAST(NULL AS BIGINT) AS emitc
      FROM qq q
      WHERE NOT EXISTS (
        SELECT 1 FROM popped p
        WHERE p.doc_id = q.doc_id AND p.parent_id = q.parent_id
      )
      UNION ALL
      SELECT 'q', nq.doc_id, nq.parent_id, nq.neg_score, nq.depth, nq.url, nq.parent_url,
             NULL, NULL, NULL, NULL
      FROM newq nq
      UNION ALL
      SELECT 'v', v.doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL FROM vis v
      UNION ALL
      SELECT 'v', b.doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL FROM batch b
      UNION ALL
      SELECT 'c', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
             (SELECT pages FROM cnt) + (SELECT count(*) FILTER (WHERE ok2) FROM emitted),
             (SELECT emitc FROM cnt) + (SELECT count(*) FROM emitted)
      UNION ALL
      SELECT 'e', e.doc_id, NULL, e.neg_score, e.depth, e.url, e.parent_url,
             (SELECT emitc FROM cnt) + e.bseq - 1, e.ok2, NULL, NULL
      FROM emitted e
    )
    SELECT * FROM nxt
    WHERE (SELECT count(*) FROM qq) > 0 AND (SELECT pages FROM cnt) < {max_pages}
  )
)
SELECT seq AS emit_seq, url, CAST(depth AS INT) AS depth,
       NULLIF(parent_url, '') AS parent_url,
       -neg_score AS score, success
FROM st WHERE kind = 'e'
"""


def _dfs_crawl_sql(n: int = 40, max_pages: int = 10, max_depth: int = 2) -> str:
    """Recursive-CTE replay of the strict DFS crawl (W2) — bit-exact
    against both the pure-Python oracle and the Spark engine (verified
    at 7 configs spanning n∈{37..500}, max_depth 2-4, binding and
    unbounded max_pages).

    One recursive iteration = one pop (dfs_strategy.py:59-139): take the
    highest stack position, skip silently if visited or over-depth,
    fetch, emit, and — below the max_pages boundary — push unseen
    children first-discovered-on-top.  ``dfs_seen`` (the reference's
    pre-insertion dedupe set) is tracked separately from ``visited``:
    children enter it at discovery even when the max_pages remainder
    trims them off the stack, exactly like the engine.  The contract
    query fixes n=40 (build_pages(spark, 40)), so nodes derive from
    range(40), independent of the sf tables."""
    url_i = _sql_url("i")
    return f"""
WITH RECURSIVE
nodes AS (
  SELECT i AS doc_id, {url_i} AS url,
         (i % 13 <> 0 AND i % 17 <> 0 AND i % 19 <> 0) AS ok
  FROM range({n}) t(i)
),
st(kind, pos, doc_id, depth, url, parent_url, seq, success, pages, emitc) AS (
  SELECT 's', CAST(0 AS BIGINT), nd.doc_id, 0, nd.url, CAST(NULL AS VARCHAR),
         CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
  FROM nodes nd WHERE nd.doc_id = 1
  UNION ALL
  SELECT 'd', NULL, nd.doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL
  FROM nodes nd WHERE nd.doc_id = 1
  UNION ALL
  SELECT 'c', NULL, NULL, NULL, NULL, NULL, NULL, NULL, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION ALL
  SELECT * FROM (
    WITH cur AS (SELECT * FROM st),
    cnt AS (SELECT pages, emitc FROM cur WHERE kind = 'c'),
    ss  AS (SELECT * FROM cur WHERE kind = 's'),
    vis AS (SELECT doc_id FROM cur WHERE kind = 'v'),
    dseen AS (SELECT doc_id FROM cur WHERE kind = 'd'),
    top AS (SELECT * FROM ss ORDER BY pos DESC LIMIT 1),
    rest AS (SELECT * FROM ss WHERE pos < (SELECT pos FROM top)),
    skip AS (
      SELECT ((SELECT doc_id FROM top) IN (SELECT doc_id FROM vis)
              OR (SELECT depth FROM top) > {max_depth}) AS s
    ),
    fetched AS (
      SELECT t.*, nd.ok AS ok2 FROM top t JOIN nodes nd ON nd.doc_id = t.doc_id
      WHERE NOT (SELECT s FROM skip)
    ),
    newpages AS (
      SELECT (SELECT pages FROM cnt)
             + coalesce((SELECT CASE WHEN ok2 THEN 1 ELSE 0 END FROM fetched), 0) AS p
    ),
    boundary AS (
      SELECT (EXISTS (SELECT 1 FROM fetched WHERE ok2)
              AND (SELECT p FROM newpages) >= {max_pages}) AS b
    ),
    valid AS (
      SELECT c.cid, c.j, nd.url AS curl,
             row_number() OVER (ORDER BY c.j) AS vidx
      FROM (
        SELECT (f.doc_id * {BRANCHING} + j) % {n} AS cid, j
        FROM fetched f CROSS JOIN range(1, {BRANCHING} + 1) t(j)
        WHERE f.ok2 AND NOT (SELECT b FROM boundary)
          AND f.depth + 1 <= {max_depth}
      ) c
      JOIN nodes nd ON nd.doc_id = c.cid
      WHERE c.cid NOT IN (SELECT doc_id FROM dseen)
    ),
    pushed AS (
      SELECT v.*, count(*) OVER () AS k
      FROM valid v
      WHERE v.vidx <= {max_pages} - (SELECT p FROM newpages)
    ),
    base AS (SELECT coalesce((SELECT max(pos) FROM rest), CAST(-1 AS BIGINT)) AS b),
    nxt AS (
      SELECT 's' AS kind, r.pos, r.doc_id, r.depth, r.url, r.parent_url,
             CAST(NULL AS BIGINT) AS seq, CAST(NULL AS BOOLEAN) AS success,
             CAST(NULL AS BIGINT) AS pages, CAST(NULL AS BIGINT) AS emitc
      FROM rest r
      UNION ALL
      SELECT 's', (SELECT b FROM base) + (p.k - p.vidx + 1), p.cid,
             (SELECT depth FROM top) + 1, p.curl, (SELECT url FROM top),
             NULL, NULL, NULL, NULL
      FROM pushed p
      UNION ALL
      SELECT 'v', NULL, v.doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL FROM vis v
      UNION ALL
      SELECT 'v', NULL, f.doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL FROM fetched f
      UNION ALL
      SELECT 'd', NULL, d.doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL FROM dseen d
      UNION ALL
      SELECT 'd', NULL, v.cid, NULL, NULL, NULL, NULL, NULL, NULL, NULL FROM valid v
      UNION ALL
      SELECT 'c', NULL, NULL, NULL, NULL, NULL, NULL, NULL,
             (SELECT p FROM newpages),
             (SELECT emitc FROM cnt) + (SELECT count(*) FROM fetched)
      UNION ALL
      SELECT 'e', NULL, f.doc_id, f.depth, f.url, f.parent_url,
             (SELECT emitc FROM cnt), f.ok2, NULL, NULL
      FROM fetched f
    )
    SELECT * FROM nxt
    WHERE (SELECT count(*) FROM ss) > 0
      AND (kind = 'e' OR NOT (SELECT b FROM boundary))
  )
)
SELECT seq AS emit_seq, url, CAST(depth AS INT) AS depth, parent_url, success
FROM st WHERE kind = 'e'
"""


def _md5long_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def _rh_sig_sql(vec: str, dim: int = 64, planes: int = 8, seed: int = 42) -> str:
    """SQL mirror of similarity.rh_signature over a DOUBLE[] expression.

    The hyperplane constants are the same md5-derived floats (embedded
    as repr() literals, which round-trip exactly) and the dot product
    is written in Spark's left-fold order (0.0 + x1 + x2 + ...), so the
    signs — and therefore the bucket ids — match bit-for-bit."""
    from crawl4ai_spark.functions.similarity import _hyperplane

    bits = []
    for p in range(planes):
        plane = _hyperplane(dim, p, seed)
        dot = " + ".join(f"{vec}[{d + 1}] * ({plane[d]!r})" for d in range(dim))
        bits.append(f"(CASE WHEN (0.0 + {dot}) > 0 THEN {2**p} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def _cos_sql(a: str, b: str, dim: int = 64) -> str:
    """SQL mirror of similarity.cosine in Spark's exact fold order."""
    dot = " + ".join(f"{a}[{d}] * {b}[{d}]" for d in range(1, dim + 1))
    na = " + ".join(f"{a}[{d}] * {a}[{d}]" for d in range(1, dim + 1))
    nb = " + ".join(f"{b}[{d}] * {b}[{d}]" for d in range(1, dim + 1))
    return (
        f"((0.0 + {dot}) / greatest(sqrt(0.0 + {na}) * sqrt(0.0 + {nb}), 1e-12))"
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_normalize_suite(spark, sf_dir):
    """N1+N2+N3 normalizer suite in one scan (r4 merge of the r3 rows
    ``normalize_urls`` → columns norm_deep/norm_eff and
    ``normalize_urls_full`` → column norm_url; every retired column is
    carried verbatim, see RETIRED_INTO): N1 normalize_url full variant
    (big tracking set, sorted query, blank values kept), N2
    normalize_url_for_deep_crawl (strips tracking params + fragment,
    sorts the query), N3 efficient variant (only drops the fragment) —
    three Arrow UDF columns over the same messy hrefs."""
    from crawl4ai_spark.functions.normalize import (
        normalize_efficient_udf,
        normalize_full_udf,
    )

    du = _doc_urls(spark, sf_dir)
    messy_deep = F.concat(
        F.col("url"),
        F.lit("?utm_source=x&b="),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("&a=1#sec"),
    )
    v = (F.col("doc_id") % 4).cast("int")
    messy_full = F.concat(
        F.col("url"),
        F.when(v == 0, F.lit("?utm_term=x&ref_src=tw&b=2&a=1#frag"))
        .when(v == 1, F.lit("?b=&a=1"))
        .when(v == 2, F.lit("#keep"))
        .otherwise(F.lit("?fbclid=1&GCLID=2")),
    )
    full_udf = normalize_full_udf()
    return du.select(
        "doc_id",
        full_udf(messy_full, F.col("url")).alias("norm_url"),
        normalize_udf(messy_deep, F.col("url")).alias("norm_deep"),
        normalize_efficient_udf(messy_deep, F.col("url")).alias("norm_eff"),
    )


def q_sitemap_seeds(spark, sf_dir):
    """S3: per-domain root sitemap INDEX → nested sub-sitemaps → page
    URLs, through the real parse/expand pipeline (regex explode +
    bounded join loop)."""
    from crawl4ai_spark.sources.sitemap import seed_from_sitemaps

    du = _doc_urls(spark, sf_dir)
    docs = du.withColumn(
        "domain", F.regexp_extract("url", r"^https://([^/]*)", 1)
    )
    entry = F.concat(F.lit("<url><loc>"), F.col("url"), F.lit("</loc></url>"))
    subs = (
        docs.groupBy("domain", (F.col("doc_id") % 2).alias("j"))
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.concat_ws("", F.sort_array(F.collect_list(entry))),
                F.lit("</urlset>"),
            ).alias("content")
        )
        .select(
            F.concat(
                F.lit("https://"), F.col("domain"), F.lit("/sm-"),
                F.col("j").cast("string"), F.lit(".xml"),
            ).alias("sitemap_url"),
            "content",
        )
    )
    roots = docs.select("domain").distinct().select(
        F.concat(F.lit("https://"), F.col("domain"), F.lit("/sitemap.xml"))
        .alias("sitemap_url"),
        F.concat(
            F.lit("<sitemapindex><sitemap><loc>https://"), F.col("domain"),
            F.lit("/sm-0.xml</loc></sitemap><sitemap><loc>https://"),
            F.col("domain"), F.lit("/sm-1.xml</loc></sitemap></sitemapindex>"),
        ).alias("content"),
    )
    sitemap_docs = roots.unionByName(subs)
    domains = docs.select("domain").distinct()
    return seed_from_sitemaps(domains, sitemap_docs)


def q_cc_seeds(spark, sf_dir):
    """S4: CC-columnar-index seed read with domain pushdown + glob."""
    from crawl4ai_spark.sources.sitemap import cc_index_seeds

    du = _doc_urls(spark, sf_dir)
    cc = du.select(
        F.regexp_extract("url", r"^https://([^/]*)", 1)
        .alias("url_host_registered_domain"),
        "url",
    )
    return cc_index_seeds(cc, "d0.example.com", url_pattern="*/docs/*")


def q_seeds_suite(spark, sf_dir):
    """S3+S4 as one suite (r5 rotation; RETIRED_INTO): sitemap rows =
    the full nested-index expand pipeline, cc rows = the CC columnar
    index read with domain pushdown + glob — each tagged by source."""
    sm = q_sitemap_seeds(spark, sf_dir).select(
        F.lit("sitemap").alias("source"), "domain", "url"
    )
    cc = q_cc_seeds(spark, sf_dir).select(
        F.lit("cc").alias("source"), "domain", "url"
    )
    return sm.unionByName(cc)


def q_scrape_suite(spark, sf_dir):
    """HTML-tier scrape contract (VERDICT-r4 #1): raw html pages →
    links (full _process_element parity: entity decode, <base href>
    override, first-occurrence dedupe, per-link base_domain,
    special-scheme externals) + media (image scoring/variant
    expansion, video/audio + <source> rows) + head metadata — one
    long-format row per recovered fact.  The Spark side PARSES the
    html (sources/html_corpus serializes the corpus graph into real
    HTML); the oracle re-derives every row from the construction
    arithmetic without parsing (derived-oracle pattern, as
    image_validation).  One scrape UDF pass, persisted, five explode
    views over it."""
    from crawl4ai_spark.functions.scrape import with_scraped_page
    from crawl4ai_spark.sources.html_corpus import build_html_pages

    n = _docs(spark, sf_dir).count()
    sc = (
        with_scraped_page(
            build_html_pages(spark, n),
            score_links=True,
            table_extraction=True,
        )
        .select("doc_id", "scraped")
        .persist()
    )
    nil = F.lit(None).cast("int")

    # link rows carry n1 = floor(intrinsic_score·1e6) — the r5
    # score_links path (utils.py:3344-3456 over the per-page context)
    # verified arithmetically per link kind
    links = sc.select("doc_id", F.explode("scraped.links").alias("l")).select(
        "doc_id", F.lit("link").alias("kind"),
        F.col("l.href").alias("k1"), F.col("l.text").alias("k2"),
        F.col("l.title").alias("k3"), F.col("l.base_domain").alias("k4"),
        F.floor(F.col("l.intrinsic_score") * 1e6).cast("int").alias("n1"),
        nil.alias("n2"), nil.alias("n3"),
        F.col("l.is_external").alias("flag"),
    )
    imgs = sc.select(
        "doc_id", F.explode("scraped.media.images").alias("m")
    ).select(
        "doc_id", F.lit("image").alias("kind"),
        F.col("m.src").alias("k1"), F.col("m.alt").alias("k2"),
        F.col("m.desc").alias("k3"), F.col("m.format").alias("k4"),
        F.col("m.score").alias("n1"), F.col("m.width").alias("n2"),
        F.col("m.group_id").alias("n3"), F.lit(False).alias("flag"),
    )

    def _av(field, kind):
        return sc.select(
            "doc_id", F.explode(f"scraped.media.{field}").alias("m")
        ).select(
            "doc_id", F.lit(kind).alias("kind"),
            F.col("m.src").alias("k1"), F.col("m.alt").alias("k2"),
            F.col("m.desc").alias("k3"),
            F.lit(None).cast("string").alias("k4"),
            nil.alias("n1"), nil.alias("n2"), nil.alias("n3"),
            F.lit(False).alias("flag"),
        )

    tabs = sc.select(
        "doc_id", F.col("scraped.media.tables").alias("ts")
    ).select(
        "doc_id", F.explode("ts").alias("t")
    ).select(
        "doc_id", "t", F.posexplode("t.rows").alias("ridx", "r")
    ).select(
        "doc_id", F.lit("table").alias("kind"),
        F.array_join("t.headers", "|").alias("k1"),
        F.array_join("r", "|").alias("k2"),
        F.col("t.caption").alias("k3"),
        F.col("t.table_id").alias("k4"),
        F.col("ridx").cast("int").alias("n1"),
        F.col("t.row_count").alias("n2"),
        F.col("t.column_count").alias("n3"),
        F.col("t.has_headers").alias("flag"),
    )

    meta = sc.select(
        "doc_id", F.explode("scraped.metadata").alias("k1", "k2")
    ).select(
        "doc_id", F.lit("meta").alias("kind"), "k1", "k2",
        F.lit(None).cast("string").alias("k3"),
        F.lit(None).cast("string").alias("k4"),
        nil.alias("n1"), nil.alias("n2"), nil.alias("n3"),
        F.lit(False).alias("flag"),
    )
    return (
        links.unionByName(imgs)
        .unionByName(_av("videos", "video"))
        .unionByName(_av("audios", "audio"))
        .unionByName(tabs)
        .unionByName(meta)
    )


def q_markdown_gen(spark, sf_dir):
    """Markdown generation contract (VERDICT-r4 #6): html corpus →
    DefaultMarkdownGenerator (functions/markdown.py) — raw markdown
    under the documented converter rules, reference-exact ⟨n⟩
    citations + References block (fast_urljoin quirk included) —
    verified as FULL-STRING fingerprints against the arithmetic
    oracle, plus the reference count."""
    from crawl4ai_spark.functions.markdown import with_markdown
    from crawl4ai_spark.sources.html_corpus import build_html_pages

    n = _docs(spark, sf_dir).count()
    pages = build_html_pages(spark, n).select("doc_id", "url", "html")
    md = with_markdown(pages)
    fp = TX.fingerprint
    return md.select(
        "doc_id",
        fp(F.col("markdown.raw_markdown")).alias("raw_fp"),
        fp(F.col("markdown.markdown_with_citations")).alias("cit_fp"),
        fp(F.col("markdown.references_markdown")).alias("ref_fp"),
        F.regexp_count(
            F.col("markdown.references_markdown"), F.lit("⟨")
        ).cast("int").alias("n_refs"),
    )


def q_robots_allow(spark, sf_dir):
    """S8 full parity: Allow+Disallow via the stdlib parser the
    reference calls (first-match-in-file-order), fresh-TTL table."""
    from crawl4ai_spark.operators.robots import RobotsTable

    du = _doc_urls(spark, sf_dir)
    table = RobotsTable.from_texts(
        spark,
        {
            "d0.example.com": (
                "User-agent: *\nAllow: /docs/2021/doc-1\n"
                "Disallow: /docs/\nDisallow: /blog\n"
            ),
            "d1.example.com": "User-agent: *\nDisallow: /\n",
        },
        fetch_time=1_000_000,
    )
    return table.with_can_fetch(
        du.select("doc_id", "url"), now=1_000_100
    ).select("doc_id", "allowed")


def q_seen_anti_join(spark, sf_dir):
    """J1: frontier candidates ∖ URL-seen via LEFT ANTI join."""
    du = _doc_urls(spark, sf_dir).select("doc_id", "url")
    seen = du.filter(F.col("doc_id") % 3 == 0).select(F.col("url").alias("seen_url"))
    return du.join(seen, du["url"] == seen["seen_url"], "left_anti").select(
        "doc_id", "url"
    )


def q_scorer_suite(spark, sf_dir):
    """C1-C6 scorer suite in one scan: every URLScorer subclass
    (keyword / content-type / freshness / domain-authority / path-depth)
    plus the normalized CompositeScorer blend, each as its own verified
    column.  path_depth runs on a depth-varied URL (same variant the
    retired singleton query used)."""
    du = _doc_urls(spark, sf_dir)
    url2 = F.concat(
        F.col("url"),
        F.element_at(
            F.array(F.lit(""), F.lit("/x"), F.lit("/x/y")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
    )
    depth_scorer = PathDepthScorer(optimal_depth=4, weight=1.0)
    return du.select(
        "doc_id",
        _SCORERS["keyword"].column(F.col("url")).alias("kw_score"),
        _SCORERS["ctype"].column(F.col("url")).alias("ctype_score"),
        _SCORERS["fresh"].column(F.col("url")).alias("fresh_score"),
        _SCORERS["domauth"].column(F.col("url")).alias("domauth_score"),
        depth_scorer.column(url2).alias("depth_score"),
        _COMPOSITE.column(F.col("url")).alias("comp_score"),
    )


def q_filter_chain(spark, sf_dir):
    """F1-F4+F7 filter suite in one scan: per-filter verdict columns
    plus the conjunctive FilterChain verdict (the reference applies
    filters as an AND chain, filters.py:69-116).  Validity runs on a
    mixed valid/invalid URL variant."""
    from crawl4ai_spark.functions.filters import FilterChain

    du = _doc_urls(spark, sf_dir)
    pat = URLPatternFilter(patterns=["*.html", "/docs/*"])
    cty = ContentTypeFilter(allowed_types=["text/html"])
    dom = DomainFilter(
        allowed_domains=["example.com"], blocked_domains=["d3.example.com"]
    )
    chain = FilterChain(filters=[pat, cty, dom])
    mixed = (
        F.when(F.col("doc_id") % 4 == 0, F.col("url"))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("ftp://x.com/"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 4 == 2, F.lit("not-a-url"))
        .otherwise(F.lit("https://localhost/p"))
    )
    return du.select(
        "doc_id",
        "url",
        pat.column(F.col("url")).alias("pat_pass"),
        cty.column(F.col("url")).alias("ctype_pass"),
        dom.column(F.col("url")).alias("dom_pass"),
        chain.column(F.col("url")).alias("chain_pass"),
        valid_crawl_url(mixed).alias("valid_pass"),
    )


def q_bff_priority_topk(spark, sf_dir):
    """W3: best-first pop order — (-score, depth, url) over the whole
    candidate set, BATCH_SIZE=10 (bff_strategy.py:228,254-270)."""
    du = _doc_urls(spark, sf_dir)
    scored = du.select(
        "doc_id",
        "url",
        (F.col("doc_id") % 4).cast("int").alias("depth"),
        _COMPOSITE.column(F.col("url")).alias("score"),
    )
    return scored.orderBy(
        F.desc("score"), F.asc("depth"), F.asc("url")
    ).limit(10)


def q_politeness_budget(spark, sf_dir):
    """P1: per-domain per-round fetch budget via window ranking."""
    du = _doc_urls(spark, sf_dir).withColumn(
        "domain", F.regexp_extract("url", r"://([^/]+)", 1)
    )
    budget = F.when(F.col("domain") == "d0.example.com", 3).otherwise(2)
    w = Window.partitionBy("domain").orderBy("doc_id")
    return (
        du.withColumn("rn", F.row_number().over(w))
        .withColumn("budget", budget)
        .filter(F.col("rn") <= F.col("budget"))
        .select("doc_id", "domain", "rn")
    )


def q_fairness_aging(spark, sf_dir):
    """W6 dispatcher fairness: oldest-first rank per event_type."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_id", "event_type", "rn")
    )


def q_robots_gate(spark, sf_dir):
    """P6: robots disallow-prefix gate as a broadcast rule column."""
    from crawl4ai_spark.operators.robots import RobotsRules

    rules = RobotsRules(
        disallow={"d0.example.com": ["/shop", "/api"], "d2.example.com": ["/"]}
    )
    du = _doc_urls(spark, sf_dir)
    return du.select(
        "doc_id", "url", rules.blocked_column(F.col("url")).alias("blocked")
    )


def q_bfs_reach(spark, sf_dir):
    """§3.2 BFS deep crawl (depth ≤ 2) over the synthetic corpus; result
    = (url, depth, n_emitted). The DuckDB oracle re-derives the same
    traversal with a recursive CTE (min-depth reachability through
    success nodes + the start-recrawl quirk)."""
    n = _docs(spark, sf_dir).count()
    pages = corpus.build_pages(spark, n)
    engine = CrawlEngine(spark, pages, CrawlSpec(max_depth=2, strategy="bfs"))
    res = engine.run(corpus.py_canonical_url(1))
    return res.groupBy("url", "depth").agg(F.count("*").alias("n")).select(
        "url", F.col("depth").cast("int").alias("depth"), "n"
    )


def q_bfs_level_metrics(spark, sf_dir):
    """A2 traversal stats: per-depth fetched/succeeded counts."""
    n = _docs(spark, sf_dir).count()
    pages = corpus.build_pages(spark, n)
    engine = CrawlEngine(spark, pages, CrawlSpec(max_depth=2, strategy="bfs"))
    res = engine.run(corpus.py_canonical_url(1))
    return res.groupBy(F.col("depth").cast("int").alias("depth")).agg(
        F.count("*").alias("fetched"),
        F.sum(F.col("success").cast("long")).alias("succeeded"),
    )


def q_bff_crawl(spark, sf_dir):
    """W3 end-to-end best-first crawl.  Hash-checked since r3: the
    DuckDB oracle (_bff_crawl_sql) replays the round loop with a
    recursive CTE, bit-exact including emission order and scores."""
    n = _docs(spark, sf_dir).count()
    pages = corpus.build_pages(spark, n)
    engine = CrawlEngine(
        spark,
        pages,
        CrawlSpec(
            max_depth=2,
            strategy="best_first",
            scorer=_COMPOSITE,
            max_pages=30,
        ),
    )
    return engine.run(corpus.py_canonical_url(1)).select(
        "emit_seq", "url", "depth", "parent_url", "score", "success"
    )


def q_dfs_crawl(spark, sf_dir):
    """W2 DFS strict-order crawl.  Hash-checked since r3: the DuckDB
    oracle (_dfs_crawl_sql) replays the one-pop-per-iteration stack
    loop in a recursive CTE, bit-exact including emission order."""
    pages = corpus.build_pages(spark, 40)
    engine = CrawlEngine(
        spark, pages, CrawlSpec(max_depth=2, strategy="dfs", max_pages=10)
    )
    return engine.run(corpus.py_canonical_url(1)).select(
        "emit_seq", "url", "depth", "parent_url", "success"
    )


def q_exact_dedup(spark, sf_dir):
    return D.exact_dedup(_docs(spark, sf_dir)).select(
        "text_md5", "keep_id", "n_copies"
    )


def q_text_stats_suite(spark, sf_dir):
    """Text-analysis suite in one scan over ``documents``: token count,
    quality score (fixed-point: floor(q*1e6) — duckdb's round() goes
    through the decimal repr and can differ by 1 ulp), language-ID,
    stopword ratio, and the rolling-hash document fingerprint — each a
    verified column (the five retired singleton queries).

    r4 adds the chunking family (functions/chunking.py — reference
    chunking_strategy.py) as verified columns: fixed-length chunk
    count + first-chunk fingerprint (FixedLengthWordChunking :146-171),
    sliding-window count incl. the leaked-loop-index tail rule
    (SlidingWindowChunking :174-211), and overlapping-window count
    (OverlappingWindowChunking :214-255)."""
    fixed = CH.FixedLengthWordChunking(50).column(F.col("text"))
    sliding = CH.SlidingWindowChunking(40, 30).column(F.col("text"))
    overlap = CH.OverlappingWindowChunking(60, 20).column(F.col("text"))
    return _docs(spark, sf_dir).select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        F.floor(TX.quality_score(F.col("text")) * 1e6).cast("long").alias("quality"),
        TX.lang_id(F.col("text")).alias("lang_pred"),
        F.round(TX.stopword_ratio(F.col("text")), 6).alias("stop_ratio"),
        TX.fingerprint(F.col("text")).alias("fp"),
        F.size(fixed).alias("n_chunks_fixed"),
        TX.fingerprint(F.element_at(fixed, 1)).alias("first_chunk_fp"),
        F.size(sliding).alias("n_chunks_sliding"),
        F.size(overlap).alias("n_chunks_overlap"),
    )


def q_chunk_suite(spark, sf_dir):
    """Chunking family across parameterizations (VERDICT-r4 #7): three
    strategies × two parameter settings each, binding the
    sequence/slice window arithmetic (functions/chunking.py; reference
    chunking_strategy.py:146-255) through count + FIRST and LAST chunk
    fingerprints — the tails are where the leaked-loop-index rule
    (sliding) and the short-final-chunk rule (overlapping) live."""
    text = F.col("text")

    def row(strat: str, arr):
        return F.struct(
            F.lit(strat).alias("strat"),
            F.size(arr).cast("int").alias("n"),
            TX.fingerprint(F.element_at(arr, 1)).alias("first_fp"),
            TX.fingerprint(F.element_at(arr, -1)).alias("last_fp"),
        )

    rows = F.array(
        row("fixed_50", CH.FixedLengthWordChunking(50).column(text)),
        row("fixed_120", CH.FixedLengthWordChunking(120).column(text)),
        row("sliding_30_10", CH.SlidingWindowChunking(30, 10).column(text)),
        row("sliding_45_15", CH.SlidingWindowChunking(45, 15).column(text)),
        row("overlap_60_20", CH.OverlappingWindowChunking(60, 20).column(text)),
        row("overlap_40_10", CH.OverlappingWindowChunking(40, 10).column(text)),
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(rows).alias("r"))
        .select("doc_id", "r.*")
    )


def q_json_extract(spark, sf_dir):
    """JsonCssExtractionStrategy contract (VERDICT-r4 #2): schema-driven
    field extraction over the raw-html corpus — CSS base/child
    selection, RAW attribute values (entity-decoded hrefs: the v2
    variant's &amp;fbclid survives as a real query param here, unlike
    the normalized scrape_suite hrefs), text, transform, a
    ["attribute","regex"] pipeline, and default fallback on the
    title-less dup anchor.  Oracle re-derives every record from the
    corpus construction arithmetic."""
    from crawl4ai_spark.functions.extract import with_extracted
    from crawl4ai_spark.sources.html_corpus import build_html_pages

    n = _docs(spark, sf_dir).count()
    schema = {
        "name": "anchors",
        "baseSelector": "li",
        "fields": [
            {"name": "href", "selector": "a", "type": "attribute",
             "attribute": "href"},
            {"name": "label", "selector": "a", "type": "text"},
            {"name": "label_up", "selector": "a", "type": "text",
             "transform": "uppercase"},
            {"name": "title", "selector": "a", "type": "attribute",
             "attribute": "title", "default": ""},
            {"name": "child_id", "selector": "a",
             "type": ["attribute", "regex"], "attribute": "title",
             "pattern": r"t-(\d+)", "group": 1},
        ],
    }
    stype = T.ArrayType(T.StructType([
        T.StructField("href", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("label_up", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("child_id", T.StringType()),
    ]))
    pages = build_html_pages(spark, n).select("doc_id", "url", "html")
    return (
        with_extracted(pages, schema, stype)
        .select("doc_id", F.explode("extracted").alias("e"))
        .select("doc_id", "e.*")
    )


def q_dedup_suite(spark, sf_dir):
    """exact_dedup + minhash_signature + simhash as one long-format
    suite (r5 rotation; RETIRED_INTO) — each retired row becomes a
    tagged (kind, id_s, k, v) row group with the identical values the
    singletons verified."""
    e = q_exact_dedup(spark, sf_dir).select(
        F.lit("exact").alias("kind"),
        F.col("text_md5").alias("id_s"),
        F.explode(F.create_map(
            F.lit("keep_id"), F.col("keep_id").cast("long"),
            F.lit("n_copies"), F.col("n_copies").cast("long"),
        )).alias("k", "v"),
    )
    m = q_minhash_signature(spark, sf_dir)
    m_long = m.select(
        F.lit("minhash").alias("kind"),
        F.col("doc_id").cast("string").alias("id_s"),
        F.explode(F.create_map(*[
            x for h in range(8)
            for x in (F.lit(f"m{h}"), F.col(f"m{h}").cast("long"))
        ])).alias("k", "v"),
    )
    s = q_simhash(spark, sf_dir).select(
        F.lit("simhash").alias("kind"),
        F.col("doc_id").cast("string").alias("id_s"),
        F.lit("sh").alias("k"),
        F.col("sh").cast("long").alias("v"),
    )
    return e.unionByName(m_long).unionByName(s)


def q_minhash_signature(spark, sf_dir):
    """Universal-family minhash (dedup.uhash_params): the DuckDB oracle
    embeds the same (a, b) literals and md5-derived 32-bit base, so the
    fast arithmetic path — not just the md5-per-permutation compat
    family — is the value-verified one."""
    sig = D.minhash_signature(
        _docs(spark, sf_dir), num_hashes=8, shingle_n=3, hash_family="universal"
    )
    cols = [F.element_at("sig", h + 1).alias(f"m{h}") for h in range(8)]
    return sig.select("doc_id", *cols)


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs (share ≥1 shingle, j ≥ 0.2)."""
    docs = _docs(spark, sf_dir)
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(D.word_shingles(F.col("text"), 3))
        ).alias("shingle"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    j = D.jaccard_pairs(docs, pairs)
    return j.filter(F.col("jaccard") >= 0.2).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash+LSH candidate pairs confirmed by exact Jaccard ≥ 0.2.
    The universal-family permutations and band hashes are fully
    deterministic, so the DuckDB oracle re-derives the exact same
    band → bucket → pair set and confirms with the same exact-Jaccard
    filter (uncapped: ``max_bucket_size=None`` preserves reference
    semantics)."""
    docs = _docs(spark, sf_dir)
    sig = D.minhash_signature(
        docs, num_hashes=16, shingle_n=3, hash_family="universal"
    )
    pairs = D.minhash_lsh_pairs(sig, bands=4, rows_per_band=4, max_bucket_size=None)
    j = D.jaccard_pairs(docs, pairs)
    return j.filter(F.col("jaccard") >= 0.2).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def q_simhash(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", D.simhash(F.col("text"), bits=16).alias("sh")
    )


def q_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    query = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][
        "embedding"
    ]
    top = SIM.brute_force_topk(emb, list(query), k=10)
    return top.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


def q_ann_lsh_topk(spark, sf_dir):
    """IVF/LSH-bucketed ANN top-k.  Buckets come from md5-deterministic
    hyperplanes, so the DuckDB oracle recomputes the same signatures,
    probe set and top-k — a hard value check despite the approximate
    recall (approximation is in WHICH rows are candidates, and that
    choice is deterministic)."""
    emb = _emb(spark, sf_dir)
    query = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][
        "embedding"
    ]
    top = SIM.lsh_bucket_topk(emb, list(query), k=10, planes=8)
    return top.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


def q_similarity_topk(spark, sf_dir):
    """Suite query: brute-force cosine top-k (the exactness baseline)
    UNION the LSH-bucketed ANN top-k (the scale path), tagged by
    method — one registry row covering both single-query similarity
    operators with the same hard oracles (registry policy, VERDICT r2
    #1: merge related singletons to keep the registry at 50)."""
    brute = q_cosine_topk(spark, sf_dir).select(
        F.lit("brute").alias("method"), "vec_id", "cos_sim"
    )
    ann = q_ann_lsh_topk(spark, sf_dir).select(
        F.lit("lsh").alias("method"), "vec_id", "cos_sim"
    )
    return brute.unionByName(ann)


def q_phash_near_dup(spark, sf_dir):
    """Image near-duplicate pairs: EXACT hamming ≤ 3 matching over the
    input table's perceptual-hash column (input_hint: phash:int64) via
    Manku block-permutation banding (images.py:phash_near_dup — the
    image analog of MinHash LSH, guaranteed recall by pigeonhole).

    The synthetic phash column is md5-deterministic and SQL-expressible:
    groups of 4 ids share a 60-bit base hash with 0/1/2/3 fixed bits
    flipped, so intra-group pairs are near dups at hamming ≤ 3 and the
    DuckDB oracle can brute-force the exact same pair set."""
    from crawl4ai_spark.functions.images import phash_near_dup

    du = _docs(spark, sf_dir)
    g = F.floor(F.col("doc_id") / 4).cast("long")
    base = F.conv(
        F.substring(F.md5(F.concat(F.lit("ph:"), g.cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    # member m of a group flips bits {}, {3}, {3,17}, {3,17,41}
    masks = F.array(*[F.lit(v).cast("long") for v in
                      (0, 8, 131080, 2199023386632)])
    m = (F.col("doc_id") % 4).cast("int")
    tbl = du.select(
        F.col("doc_id").alias("image_id"),
        base.bitwiseXOR(F.element_at(masks, m + 1)).alias("phash"),
    )
    return phash_near_dup(tbl, max_hamming=3, n_bits=60, key_blocks=1)


def q_knn_join(spark, sf_dir):
    """Batch exact k-NN join: each query row gets its cosine top-k from
    the corpus (broadcast queries × corpus scan → per-query window)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.brute_force_knn_join(queries, emb, k=5).select(
        "query_id", "vec_id", "cos_sim", "rank"
    )


def q_ann_knn_join(spark, sf_dir):
    """Approximate batch k-NN via hyperplane-bucket equi-join.  Same
    determinism argument as q_ann_lsh_topk: the DuckDB oracle rebuilds
    the signatures, the multi-probe candidate set and the per-query
    top-k exactly."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dim = len(emb.select("embedding").first()["embedding"])
    return SIM.lsh_knn_join(queries, emb, dim=dim, k=5).select(
        "query_id", "vec_id", "cos_sim", "rank"
    )


def q_embedding_coverage(spark, sf_dir):
    """Adaptive EmbeddingStrategy coverage: per query variation, min
    cosine distance to the KB + the exp-decay hybrid confidence
    (adaptive_crawler.py:841-869, :1040-1100)."""
    from crawl4ai_spark.functions.adaptive_embedding import (
        coverage_gaps,
        embedding_confidence,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.filter((F.col("vec_id") % 5 == 0) & (F.col("vec_id") < 100)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kb = emb.filter(F.col("vec_id") % 5 != 0)
    gaps = coverage_gaps(queries, kb)
    conf = embedding_confidence(gaps)
    return gaps.join(conf, "query_id").select(
        "query_id",
        F.round("gap", 6).alias("gap"),
        F.round("query_score", 6).alias("confidence"),
    )


def q_politeness_backoff(spark, sf_dir):
    """P2 adaptive backoff fold over one round of outcomes
    (async_dispatcher.py:65-85).  The md5-seeded jitter stream makes
    the sequential per-domain fold fully deterministic, so the DuckDB
    oracle replays the identical fold as a recursive CTE — both sides
    run the same IEEE-double op sequence, value-hash checked."""
    from crawl4ai_spark.operators.politeness import PolitenessSpec, PolitenessState

    n = _docs(spark, sf_dir).count()
    pages = corpus.build_pages(spark, n)
    outcomes = pages.select(
        F.col("doc_id").alias("emit_seq"), "url", "status_code"
    )
    state = PolitenessState(spark, PolitenessSpec(seed=42))
    state.update(outcomes, round_no=0)
    return state.state.select(
        "domain",
        # round-before-floor: cross-engine ULP robustness (see q_seo_filter)
        F.floor(F.round(F.col("current_delay"), 9) * 1e6)
        .cast("long")
        .alias("delay_fp"),
        "fail_count",
        "retired",
    )


def q_image_validation(spark, sf_dir):
    """J8 image invariant: decode fetched bytes, PSNR vs reference
    pixels + caption/phash equality (content_scraping_strategy.py:
    440-467, models.py:361-370).  Hash-checked since r4 via a
    DERIVED-BOOLEAN oracle (VERDICT-r3 #2): the fetched side carries
    deterministic id-derived corruptions — a tampered pixel on png
    rows with i % 11 == 0 (png compare is exact, so any tamper fails;
    jpeg rows are excluded because one tampered pixel lands ~39.9 dB,
    too close to the 40 dB threshold for a cross-engine boolean), a
    corrupted caption where i % 7 == 3, a flipped phash bit where
    i % 5 == 2.  The Spark side actually DECODES the PNG bytes and
    measures; the oracle PREDICTS each boolean from the construction
    arithmetic — any decode/PSNR/join defect breaks the value hash.
    (Raw PSNR values stay pytest-covered: test_images.py asserts the
    quantize-lossy rows land in [40, 999).)"""
    from crawl4ai_spark.functions.images import validate_images
    from crawl4ai_spark.sources.images import build_images, reference_table

    fetched = build_images(spark, 60, tamper_mod=11)
    i = F.regexp_extract("image_id", r"img-(\d+)", 1).cast("long")
    fetched = fetched.withColumn(
        "caption",
        F.when(i % 7 == 3, F.concat(F.col("caption"), F.lit(" CORRUPT")))
        .otherwise(F.col("caption")),
    ).withColumn(
        "phash",
        F.when(i % 5 == 2, F.col("phash").bitwiseXOR(F.lit(1)))
        .otherwise(F.col("phash")),
    )
    ref = reference_table(spark, 60)
    v = validate_images(fetched, ref)
    return v.select(
        "image_id",
        "pixels_ok",
        "caption_ok",
        "phash_match",
        (F.col("pixels_ok") & F.col("caption_ok") & F.col("phash_match"))
        .alias("valid"),
    )


def q_image_score(spark, sf_dir):
    """C10 image score rubric over synthetic MediaItem metadata
    (content_scraping_strategy.py:440-467)."""
    from crawl4ai_spark.functions.images import image_score

    du = _docs(spark, sf_dir)
    i = F.col("doc_id")
    widths = F.array(*[F.lit(x) for x in [32, 64, 96, 128, 256]])
    heights = F.array(*[F.lit(x) for x in [32, 48, 96, 64, 192]])
    fmts = F.array(F.lit("jpeg"), F.lit("png"), F.lit("tiff"))
    meta = du.select(
        "doc_id",
        F.element_at(widths, (i % 5 + 1).cast("int")).alias("w"),
        F.element_at(heights, (i % 5 + 1).cast("int")).alias("h"),
        F.when(i % 3 != 0, F.lit("alt text")).otherwise(F.lit(None)).alias("alt"),
        (i % 10).cast("int").alias("index"),
        F.lit(10).alias("total"),
        F.element_at(fmts, (i % 3 + 1).cast("int")).alias("fmt"),
        (i % 4 == 0).alias("has_srcset"),
        (i % 5 == 0).alias("in_picture"),
    )
    return meta.select(
        "doc_id",
        image_score(
            F.col("w"), F.col("h"), F.col("alt"), F.col("index"),
            F.col("total"), F.col("fmt"), F.col("has_srcset"), F.col("in_picture"),
        ).alias("img_score"),
    )


def q_head_bm25(spark, sf_dir):
    """F5 ContentRelevanceFilter BM25 (simplified IDF) over doc text."""
    from crawl4ai_spark.sources.seeder import head_bm25

    return _docs(spark, sf_dir).select(
        "doc_id",
        F.floor(head_bm25(F.col("text"), "data spark table") * 1e6)
        .cast("long")
        .alias("bm25_fp"),
    )


def q_seeder_bm25(spark, sf_dir):
    """A4 corpus BM25 (rank_bm25 semantics: Okapi idf + epsilon floor,
    min-max normalized) — the seeder's relevance scoring."""
    from crawl4ai_spark.sources.seeder import corpus_bm25

    out = corpus_bm25(_docs(spark, sf_dir), "data spark table")
    return out.select(
        "doc_id",
        F.floor(F.col("relevance_score") * 1e6).cast("long").alias("rel_fp"),
    )


def q_nonsense_url_filter(spark, sf_dir):
    """F8 seeder nonsense-URL filter (robots/sitemap/utility files)."""
    from crawl4ai_spark.sources.seeder import is_nonsense_url

    du = _doc_urls(spark, sf_dir)
    suffixes = F.array(
        F.lit(""), F.lit("/robots.txt"), F.lit("/sitemap.xml"),
        F.lit("/favicon.ico"), F.lit("/manifest.json"), F.lit("/page"),
        F.lit("/sitemap_news.xml"),
    )
    test_url = F.concat(
        F.lit("https://d0.example.com"),
        F.element_at(suffixes, (F.col("doc_id") % 7 + 1).cast("int")),
    )
    return du.select(
        "doc_id", is_nonsense_url(test_url).alias("nonsense")
    )


def q_seed_pipeline(spark, sf_dir):
    """S5 seeder pipeline: union sources → nonsense filter → dedupe →
    BM25 relevance sort → limit(max_urls)."""
    from crawl4ai_spark.sources.seeder import corpus_bm25, seed_pipeline

    docs = _docs(spark, sf_dir)
    urls = _doc_urls(spark, sf_dir).select("doc_id", "url")
    # two overlapping "sources" (sitemap ∪ common-crawl analog) + junk
    src_a = urls.filter(F.col("doc_id") % 2 == 0)
    src_b = urls.filter(F.col("doc_id") % 3 == 0)
    junk = spark.range(5).select(
        (F.lit(-1) - F.col("id")).alias("doc_id"),
        F.concat(
            F.lit("https://d0.example.com/x"), F.col("id").cast("string"),
            F.lit("/robots.txt"),
        ).alias("url"),
    )
    rel = corpus_bm25(docs, "data spark table").select(
        "doc_id", "relevance_score"
    )
    urls_rel = urls.join(rel, "doc_id").select("url", "relevance_score")
    out = seed_pipeline(
        [src_a.select("url"), src_b.select("url"), junk.select("url")],
        max_urls=25,
        relevance=urls_rel,
    )
    return out.select(
        "url", F.floor(F.col("relevance_score") * 1e6).cast("long").alias("rel_fp")
    )


def _head_fields(du):
    """Synthetic head metadata derived from doc_id (shared by the F5/F6
    queries and their SQL mirrors)."""
    i = F.col("doc_id")
    title = F.concat(
        F.when(i % 4 == 0, F.lit("spark crawl ")).otherwise(F.lit("")),
        F.repeat(F.lit("t"), (F.lit(40) + i % 35).cast("int")),
    )
    desc = F.repeat(F.lit("d"), (F.lit(100) + i % 120).cast("int"))
    canonical = (
        F.when(i % 3 == 0, F.col("url"))
        .when(i % 3 == 1, F.concat(F.col("url"), F.lit("x")))
        .otherwise(F.lit(None))
    )
    robots = F.when(i % 5 == 0, F.lit("noindex,follow")).otherwise(
        F.lit("index,follow")
    )
    return du.select(
        "doc_id",
        "url",
        title.alias("title"),
        desc.alias("description"),
        canonical.alias("canonical"),
        robots.alias("robots"),
        (i % 6 == 0).alias("has_ldjson"),
    )


def q_seo_filter(spark, sf_dir):
    """F6 SEOFilter: weighted head-quality score + threshold."""
    from crawl4ai_spark.functions.head_filters import SEOFilter

    h = _head_fields(_doc_urls(spark, sf_dir))
    f = SEOFilter(threshold=0.65, keywords=["spark", "crawl"])
    score = f.score_column(
        F.col("url"), F.col("title"), F.col("description"),
        F.col("robots"), F.col("canonical"), F.col("has_ldjson"),
    )
    return h.select(
        "doc_id",
        # round(·,9) before floor: Spark's and DuckDB's double-arithmetic
        # orderings can differ by one ULP, which straddles the floor edge.
        F.floor(F.round(score, 9) * 1e6).cast("long").alias("seo_fp"),
        (score >= 0.65).alias("passed"),
    )


def q_content_relevance_filter(spark, sf_dir):
    """F5 ContentRelevanceFilter: simplified-IDF BM25 over the weighted
    head document (title×3 + desc×2 + keywords + meta values)."""
    from crawl4ai_spark.functions.head_filters import (
        ContentRelevanceFilter,
        build_head_document,
    )

    du = _doc_urls(spark, sf_dir)
    i = F.col("doc_id")
    title = F.when(i % 3 == 0, F.lit("spark data engine")).otherwise(
        F.lit("misc page notes")
    )
    desc = F.when(i % 2 == 0, F.lit("fast spark jobs")).otherwise(
        F.lit("none here")
    )
    kw = F.lit("data tools")
    doc = build_head_document(title, desc, kw, [desc])
    f = ContentRelevanceFilter(query="spark data", threshold=0.4)
    # r5: head_bm25 retired into this row — the seeder's simplified-IDF
    # BM25 over the document text rides along as its own column
    from crawl4ai_spark.sources.seeder import head_bm25

    return du.select(
        "doc_id",
        F.floor(f.score_column(doc) * 1e6).cast("long").alias("bm25_fp"),
        f.column(doc).alias("passed"),
        F.floor(head_bm25(F.col("text"), "data spark table") * 1e6)
        .cast("long")
        .alias("text_bm25_fp"),
    )


def q_total_score(spark, sf_dir):
    """C7+C8 link scoring: intrinsic link quality over rich synthetic
    attributes (title/class/rel variants, utils.py:3344-3456) AND the
    total score blend 0.7·intrinsic + 0.3·min(contextual·10, 10)
    (utils.py:3459-3504) — one scan, both verified columns."""
    from crawl4ai_spark.functions.link_scores import intrinsic_link_score, total_score

    du = _doc_urls(spark, sf_dir)
    i = F.col("doc_id")
    text = F.when(i % 3 == 0, F.lit("API Reference Guide")).otherwise(
        F.lit("read more")
    )
    # C7 variant: exercises title/class(nav penalty)/rel(nofollow) paths
    title = F.when(i % 2 == 0, F.lit("Documentation page")).otherwise(F.lit(""))
    cls = F.when(i % 4 == 0, F.lit("nav primary")).otherwise(F.lit("content"))
    rel = F.when(i % 5 == 0, F.lit("nofollow")).otherwise(F.lit(""))
    rich_intrinsic = intrinsic_link_score(text, F.col("url"), title, cls, rel)
    # C8 blend uses the bare-attribute intrinsic + the composite scorer
    intrinsic = intrinsic_link_score(
        text, F.col("url"), F.lit(""), F.lit(""), F.lit("")
    )
    contextual = _COMPOSITE.column(F.col("url"))
    return du.select(
        "doc_id",
        F.floor(rich_intrinsic * 1e6).cast("long").alias("intrinsic_fp"),
        # round-before-floor: cross-engine ULP robustness (see q_seo_filter)
        F.floor(F.round(total_score(intrinsic, contextual, True, True), 9) * 1e6)
        .cast("long")
        .alias("total_fp"),
    )


def q_url_relevance(spark, sf_dir):
    """C9 fuzzy URL relevance (async_url_seeder.py:1519-1605): the
    harmonic-weighted blend of part-containment, token-containment and
    3-gram Jaccard scores.  The DuckDB oracle re-derives the same
    algorithm over the synthetic URL's six parts with list lambdas —
    an independent second implementation, value-hash checked."""
    from crawl4ai_spark.functions.link_scores import url_relevance_udf

    du = _doc_urls(spark, sf_dir)
    udf = url_relevance_udf("docs example")
    return du.select(
        "doc_id",
        # round-before-floor: cross-engine ULP robustness (see q_seo_filter)
        F.floor(F.round(udf(F.col("url")), 9) * 1e6).cast("long").alias("rel_fp"),
    )


def q_adaptive_confidence(spark, sf_dir):
    """A5 adaptive-crawler confidence: coverage/consistency/saturation
    and the 0.4/0.3/0.3 blend (adaptive_crawler.py:309-411)."""
    from crawl4ai_spark.functions.adaptive import confidence_df

    out = confidence_df(_docs(spark, sf_dir), "spark data web", kb_limit=40)
    return out.select(
        F.floor(F.col("coverage") * 1e6).cast("long").alias("coverage_fp"),
        F.floor(F.col("consistency") * 1e6).cast("long").alias("consistency_fp"),
        F.floor(F.col("saturation") * 1e6).cast("long").alias("saturation_fp"),
        F.floor(F.col("confidence") * 1e6).cast("long").alias("confidence_fp"),
    )


def q_base_domain(spark, sf_dir):
    """N4/N5 base-domain extraction + internal/external classification
    (utils.py:2480-2562) in Arrow UDFs, over canonical / external /
    second-level-TLD / port-carrying URL variants."""
    from crawl4ai_spark.functions.normalize import base_domain_udf, is_external_udf

    du = _doc_urls(spark, sf_dir)
    i = F.col("doc_id")
    ext_u = F.concat(
        F.lit("https://ext"), (i % 3).cast("string"),
        F.lit(".partner.org/p/"), i.cast("string"),
    )
    shop_u = F.concat(
        F.lit("https://www.shop"), (i % 4).cast("string"),
        F.lit(".co.uk/p/"), i.cast("string"),
    )
    port_u = F.concat(F.lit("https://api.example.com:8080/x/"), i.cast("string"))
    variants = du.select(
        "doc_id",
        F.explode(
            F.array_compact(
                F.array(
                    F.struct(F.lit(0).alias("kind"), F.col("url").alias("u")),
                    F.when(i % 6 == 0, F.struct(F.lit(1).alias("kind"), ext_u.alias("u"))),
                    F.when(i % 5 == 0, F.struct(F.lit(2).alias("kind"), shop_u.alias("u"))),
                    F.when(i % 7 == 0, F.struct(F.lit(3).alias("kind"), port_u.alias("u"))),
                )
            )
        ).alias("v"),
    )
    return variants.select(
        "doc_id",
        F.col("v.kind").alias("kind"),
        base_domain_udf(F.col("v.u")).alias("base_dom"),
        is_external_udf(F.col("v.u"), F.lit("example.com")).alias("is_ext"),
    )


def q_head_fingerprint(spark, sf_dir):
    """C11 head fingerprint (utils.py:2847; used for cache freshness
    validation, async_webcrawler.py:648-653): stable md5 of the head
    fields, JVM-side (whole-stage codegen, no UDF)."""
    h = _head_fields(_doc_urls(spark, sf_dir))
    blob = F.concat_ws(
        "|",
        F.col("title"),
        F.col("description"),
        F.coalesce(F.col("canonical"), F.lit("")),
        F.col("robots"),
    )
    return h.select(
        "doc_id",
        F.conv(F.substring(F.md5(blob), 1, 15), 16, 10).cast("long").alias("head_fp"),
    )


def q_max_links_trim(spark, sf_dir):
    """T3 max_links-per-page trim (link_preview.py:157-162): keep the
    top-2 links per source page by relevance score (window top-k)."""
    du = _doc_urls(spark, sf_dir)
    n = du.count()
    kw = _SCORERS["keyword"]
    links = du.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        ((F.col("doc_id") * BRANCHING + j) % n).alias("child"),
                    )
                    for j in range(1, BRANCHING + 1)
                ]
            )
        ).alias("l"),
    ).select("doc_id", F.col("l.j").alias("j"), F.col("l.child").alias("child"))
    scored = links.withColumn(
        "s", kw.column(corpus.canonical_url_col(F.col("child")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("j"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("doc_id", "j", "child")
    )


def q_cache_mode(spark, sf_dir):
    """S7 CacheMode read gate (cache_context.py:59-87): ENABLED reads
    resolve against the fetched-cache table via left join; misses fall
    through to a live fetch."""
    du = _doc_urls(spark, sf_dir)
    cache = du.filter(F.col("doc_id") % 2 == 0).select(F.col("url").alias("curl"))
    joined = du.join(cache, du.url == cache.curl, "left")
    return joined.groupBy(
        (F.col("doc_id") % 7).cast("int").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("curl").isNotNull(), 1).otherwise(0)).alias("cache_hits"),
        F.sum(F.when(F.col("curl").isNull(), 1).otherwise(0)).alias("live_fetches"),
    )


def q_queue_stats(spark, sf_dir):
    """A7 dispatcher queue statistics (async_dispatcher.py:509-521):
    queued count + max/avg wait per domain (synthetic enqueue ts)."""
    du = _doc_urls(spark, sf_dir)
    i = F.col("doc_id")
    wait = F.lit(200.0) - (i * 7 % 101).cast("double")
    domain = F.concat(
        F.lit("d"),
        F.when(i % 2 == 0, F.lit(0)).otherwise(i % 7).cast("string"),
    )
    return (
        du.select(domain.alias("domain"), wait.alias("wait"))
        .groupBy("domain")
        .agg(
            F.count("*").alias("queued"),
            F.max("wait").alias("max_wait"),
            F.floor(F.avg("wait") * 1e6).cast("long").alias("avg_wait_fp"),
        )
    )


def q_adaptive_rank_links(spark, sf_dir):
    """Adaptive link ranking by expected information gain
    (adaptive_crawler.py:413-470): 0.5*relevance + 0.3*novelty + 0.2."""
    from crawl4ai_spark.functions.adaptive import rank_links

    docs = _docs(spark, sf_dir)
    links = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("link_id"),
        F.substring(F.col("text"), 1, 60).alias("link_text"),
    )
    out = rank_links(links, docs, "spark data web")
    return out.select(
        F.col("link_id").alias("doc_id"),
        F.floor(F.col("score") * 1e6).cast("long").alias("gain_fp"),
    )


def q_image_resize(spark, sf_dir):
    """Multimodal transform: decode → nearest-neighbor resize →
    re-encode in mapInPandas Arrow batches; the oracle checks the
    deterministic metadata (ids + output dims); pixel correctness is
    covered by tests/test_images.py."""
    from crawl4ai_spark.functions.images import resize_images
    from crawl4ai_spark.sources.images import build_images

    out = resize_images(build_images(spark, 60), 16, 12)
    return out.select("image_id", "out_w", "out_h")


def q_domain_map(spark, sf_dir):
    """S10 DomainMapper (domain_mapper.py:122): union of per-source URL
    discoveries (sitemap / Common-Crawl analogs) → dedupe → per-domain
    inventory with per-source counts."""
    du = _doc_urls(spark, sf_dir)
    sitemap = du.filter(F.col("doc_id") % 2 == 0).select(
        "url", F.lit("sitemap").alias("source")
    )
    cc = du.filter(F.col("doc_id") % 3 == 0).select(
        "url", F.lit("cc").alias("source")
    )
    # first-source-wins dedupe (reference merges source dicts in order)
    merged = sitemap.unionByName(cc)
    w = Window.partitionBy("url").orderBy(
        F.when(F.col("source") == "sitemap", 0).otherwise(1)
    )
    deduped = (
        merged.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    domain = F.regexp_extract(F.col("url"), r"^https://([^/]*)", 1)
    return deduped.groupBy(domain.alias("domain")).agg(
        F.count("*").alias("n_urls"),
        F.sum(F.when(F.col("source") == "sitemap", 1).otherwise(0)).alias("n_sitemap"),
        F.sum(F.when(F.col("source") == "cc", 1).otherwise(0)).alias("n_cc"),
    )


def q_wayback_urls(spark, sf_dir):
    """S10 DomainMapper wayback source (domain_mapper.py:391-420):
    CDX rows → suffix-filtered (url, host); off-domain rows dropped."""
    from crawl4ai_spark.sources.domain_mapper import urls_from_wayback

    du = _doc_urls(spark, sf_dir)
    i = F.col("doc_id")
    original = F.when(
        i % 3 == 0,
        F.concat(F.lit("https://other"), (i % 4).cast("string"),
                 F.lit(".org/p/"), i.cast("string")),
    ).otherwise(F.col("url"))
    cdx = du.select(original.alias("original"))
    return urls_from_wayback(cdx, "example.com")


def q_crt_hosts(spark, sf_dir):
    """S10 DomainMapper crt.sh source (domain_mapper.py:361-389):
    split newline-joined SANs, strip wildcards, suffix-filter, dedupe."""
    from crawl4ai_spark.sources.domain_mapper import hosts_from_crt

    du = _docs(spark, sf_dir)
    i = F.col("doc_id")
    common = F.concat(F.lit("d"), (i % 7).cast("string"), F.lit(".example.com"))
    sans = (
        F.when(i % 4 == 0, F.lit("*.example.com\nmail.example.com"))
        .when(i % 4 == 1, F.concat(F.lit("www.d"), (i % 7).cast("string"),
                                   F.lit(".example.com")))
        .when(i % 4 == 2, F.lit("evil.other.org\nEXAMPLE.COM"))
        .otherwise(F.lit(""))
    )
    ct = du.select(common.alias("common_name"), sans.alias("name_value"))
    return hosts_from_crt(ct, "example.com")


def q_domain_sources(spark, sf_dir):
    """S10 DomainMapper per-source suite (domain_mapper.py:305-600) —
    r4 merge of the r3 singleton rows ``wayback_urls`` and
    ``crt_hosts`` (each rides as its own tagged row group, inputs
    unchanged) plus FIRST driver rows for the probe and feed sources
    (VERDICT-r3 #5):

    - wayback: CDX originals suffix-filtered to (url, host)
      (domain_mapper.py:391-420)
    - crt: SAN mining from CT entries (:361-389); host-only rows carry
      a synthetic ``crt://host`` url so the union stays null-free
    - probe: hosts × DEFAULT_PROBE_PATHS candidates, existence =
      semi-join against the fetchable set (fetch-as-join for the
      reference's per-probe HEAD, :447-505); fetchable is the
      deterministic (hidx + length(url)) % 3 != 0 subset
    - feed: <link rel=alternate type=rss/atom> hrefs mined from
      homepage HTML, relative hrefs resolved against the host
    """
    from crawl4ai_spark.sources.domain_mapper import feed_urls, probe_urls

    way = q_wayback_urls(spark, sf_dir).select(
        F.lit("wayback").alias("source"), "host", "url"
    )
    crt = q_crt_hosts(spark, sf_dir).select(
        F.lit("crt").alias("source"),
        "host",
        F.concat(F.lit("crt://"), F.col("host")).alias("url"),
    )
    hosts = spark.range(0, 7).select(
        F.concat(F.lit("d"), F.col("id").cast("string"), F.lit(".example.com"))
        .alias("host"),
        F.col("id").alias("hidx"),
    )
    probes = probe_urls(hosts.select("host"))
    fetchable = (
        probes
        .join(hosts, "host")
        .filter((F.col("hidx") + F.length(F.col("url"))) % 3 != 0)
        .select("url")
    )
    probe = probes.join(fetchable, "url", "left_semi").select(
        F.lit("probe").alias("source"), "host", "url"
    )
    rss = (
        '<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
    )
    homepages = hosts.select(
        "host",
        F.when(
            F.col("hidx") % 3 == 0,
            F.concat(
                F.lit("<html><head>" + rss),
                F.lit('<link rel="alternate" type="application/atom+xml"'
                      ' href="https://feeds.'),
                F.col("host"),
                F.lit('/atom"></head></html>'),
            ),
        )
        .when(
            F.col("hidx") % 3 == 1,
            F.lit('<html><head><link rel="alternate"'
                  ' type="application/json" href="/no"></head></html>'),
        )
        .otherwise(F.lit("<html><body>no feeds</body></html>"))
        .alias("content"),
    )
    feed = feed_urls(homepages, "example.com").select(
        F.lit("feed").alias("source"), "host", "url"
    )
    return way.unionByName(crt).unionByName(probe).unionByName(feed)


def q_ttl_recrawl(spark, sf_dir):
    """TTL re-crawl on the deletable cuckoo seen store (VERDICT-r3 #4;
    robots 7-day TTL utils.py:252-275, CacheMode revalidation
    cache_context.py:59-87): BFS crawl once with the cuckoo store,
    stamp each emitted page with a deterministic fetched_at (page i
    fetched (i+6)%10 days after epoch — the phase puts the seed's
    children in the stale set, so the re-crawl traversal is non-trivial
    and a broken remove() visibly changes it), revalidate at day 9.5
    with a 7-day TTL (stale ⟺ (i+6)%10 < 3 ⟺ i%10 ∈ {4,5,6}),
    ``remove()`` the stale urls from the store, and re-run the SAME
    crawl with the mutated store injected —
    only the seed (start-recrawl quirk) and stale pages reachable
    through stale ancestors pass the seen anti-join.  The oracle
    replays the re-crawl as a recursive CTE over the open subgraph, so
    a remove() defect (missed delete, or a collision-delete false
    negative) changes the emission set and breaks the hash."""
    from crawl4ai_spark.operators.recrawl import expire_and_recrawl, stale_urls

    n = _docs(spark, sf_dir).count()
    pages = corpus.build_pages(spark, n)
    seed = corpus.py_canonical_url(1)
    eng1 = CrawlEngine(
        spark, pages, CrawlSpec(max_depth=2, strategy="bfs", seen_mode="cuckoo")
    )
    res1 = eng1.run(seed)
    did = F.regexp_extract("url", r"doc-(\d+)", 1).cast("long")
    log = res1.select("url", (((did + 6) % 10) * 86400).alias("fetched_at"))
    expired = stale_urls(log, now_epoch=9 * 86400 + 43200, ttl_seconds=7 * 86400)
    res2 = expire_and_recrawl(
        eng1.seen_store, expired, pages,
        CrawlSpec(max_depth=2, strategy="bfs"), seed,
    )
    return res2.select(
        "url", F.col("depth").cast("int").alias("depth"), "status_code"
    )


def q_adaptive_crawl(spark, sf_dir):
    """Composed AdaptiveCrawler digest loop (adaptive_crawler.py:
    1292-1446): crawl → KB update → 0.4/0.3/0.3 confidence →
    info-gain link selection → stop (threshold / max_pages / no_links
    / saturation / max_depth), VERDICT-r3 #3.  Runs over the
    closed-form 3-ary tree corpus (sources/adaptive_corpus.py) whose
    gain scores depend only on the doc id, so the DuckDB oracle
    replays the ENTIRE loop — per-round selection, KB order, pending
    counts, confidence stream AND the stop decision — as a recursive
    CTE over id arithmetic.  Stops at round 4 via the confidence
    threshold (0.5) with max_depth 6, so the threshold rule itself is
    hash-bound."""
    from crawl4ai_spark.operators.adaptive_crawl import (
        AdaptiveCrawler,
        AdaptiveSpec,
    )
    from crawl4ai_spark.sources.adaptive_corpus import (
        adaptive_url,
        build_adaptive_pages,
    )

    pages = build_adaptive_pages(spark, 40)
    spec = AdaptiveSpec(
        query="alpha beta", confidence_threshold=0.5, max_depth=6,
        max_pages=20, top_k_links=3,
    )
    hist = AdaptiveCrawler(spark, pages, spec).digest(adaptive_url(0))
    return hist.select(
        "round", "n_kb", "n_pending",
        F.round("coverage", 6).alias("coverage"),
        F.round("consistency", 6).alias("consistency"),
        F.round("saturation", 6).alias("saturation"),
        F.round("confidence", 6).alias("confidence"),
        "stop_reason",
    )


def q_lsh_self_join(spark, sf_dir):
    """Corpus-vs-corpus near-dup pairs via hyperplane-bucket self-join
    (similarity.lsh_self_join) — the no-broadcast 100 TB dedup shape.
    The hyperplanes are md5-deterministic, so the DuckDB oracle
    recomputes the exact signatures and the same pair set."""
    emb = _emb(spark, sf_dir)
    return SIM.lsh_self_join(emb, dim=64, threshold=0.2, planes=8)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the north-rule composition end-to-end — BFS deep crawl
    (depth 2) over the synthetic corpus sized from sf0.001 documents,
    then every crawled page's image payload validated per-row against
    the reference table (PSNR ≥ 40 dB decoded-pixel check + exact
    caption equality + phash match; operators/image_crawl.py)."""
    from crawl4ai_spark.operators.image_crawl import validated_crawl
    from crawl4ai_spark.sources.images import build_images, reference_table

    n = _docs(spark, "/root/testdata/sf0.001").count()
    pages = corpus.build_pages(spark, n)
    engine = CrawlEngine(spark, pages, CrawlSpec(max_depth=2, strategy="bfs"))
    res = engine.run(corpus.py_canonical_url(1))
    n_images = min(n, 499)  # corpus pages reference img-{i % 499}
    validated = validated_crawl(
        res, pages, build_images(spark, n_images), reference_table(spark, n_images)
    )
    return validated.select(
        "url",
        F.col("emit_seq").cast("long").alias("emit_seq"),
        "image_id",
        F.round("psnr_db", 3).alias("psnr_db"),
        "pixels_ok", "caption_ok", "phash_match",
    )


# Rotation ledger (VERDICT r3 #8): every retired registry row and the
# suite that carries its verified columns/rows now.  test_entry_contract
# asserts each suite still exposes the retired coverage, so future
# consolidations cannot silently drop hard-won verification.
RETIRED_INTO = {
    # r3 consolidations
    "keyword_scorer|ctype_scorer|fresh_scorer|domauth_scorer|path_scorer|"
    "composite_scorer": ("scorer_suite", "one verified column per scorer"),
    "url_pattern_filter|content_type_filter|domain_filter|url_valid":
        ("filter_chain", "one verdict column per filter"),
    "token_count|quality_score|lang_id|stopword_ratio|fingerprint":
        ("text_stats_suite", "one verified column per text op"),
    "cosine_topk|ann_lsh_topk":
        ("similarity_topk", "both methods unioned, same oracles"),
    # r4 consolidations
    "normalize_urls": ("normalize_suite", "columns norm_deep + norm_eff"),
    "normalize_urls_full": ("normalize_suite", "column norm_url"),
    "wayback_urls": ("domain_sources", "source='wayback' rows, same input"),
    "crt_hosts": ("domain_sources", "source='crt' rows, same input"),
    # r5 consolidations
    "sitemap_seeds": ("seeds_suite", "source='sitemap' rows, same pipeline"),
    "cc_seeds": ("seeds_suite", "source='cc' rows, same pipeline"),
    "exact_dedup|minhash_signature|simhash":
        ("dedup_suite", "one tagged (kind,id_s,k,v) row group per op"),
    "head_bm25": ("content_relevance_filter",
                  "column text_bm25_fp, same query/terms over doc text"),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry policy (VERDICT r2 #1): the driver grades the FIRST 50
    # entries, so the registry is kept at exactly 50 — redundant
    # singletons are merged into suite queries, with RETIRED_INTO (above)
    # recording where every retired row's coverage lives — and ordered so
    # queries without a driver-green row in the LAST round grade first.
    # r4 rotation: normalize_urls + normalize_urls_full → normalize_suite;
    # wayback_urls + crt_hosts (+ first-time probe/feed sources) →
    # domain_sources; freed rows spent on adaptive_crawl + ttl_recrawl.
    qs = {
        # --- never / not-recently driver-green ---
        "cache_mode": q_cache_mode,
        "content_relevance_filter": q_content_relevance_filter,
        "seed_pipeline": q_seed_pipeline,
        "adaptive_confidence": q_adaptive_confidence,
        "base_domain": q_base_domain,
        "head_fingerprint": q_head_fingerprint,
        "max_links_trim": q_max_links_trim,
        "queue_stats": q_queue_stats,
        "domain_map": q_domain_map,
        "image_resize": q_image_resize,
        "adaptive_rank_links": q_adaptive_rank_links,
        # --- new / changed in r4 (rotation ledger in RETIRED_INTO) ---
        "adaptive_crawl": q_adaptive_crawl,
        "ttl_recrawl": q_ttl_recrawl,
        "domain_sources": q_domain_sources,
        "normalize_suite": q_normalize_suite,
        # --- r3 additions ---
        "phash_near_dup": q_phash_near_dup,
        "similarity_topk": q_similarity_topk,
        "lsh_self_join": q_lsh_self_join,
        "scorer_suite": q_scorer_suite,
        "filter_chain": q_filter_chain,
        "text_stats_suite": q_text_stats_suite,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "url_relevance": q_url_relevance,
        "ann_knn_join": q_ann_knn_join,
        # cosine_topk + ann_lsh_topk merged into similarity_topk (one row,
        # same oracles unioned) to stay at 50 with phash_near_dup added
        "total_score": q_total_score,
        # --- new in r5 (rotation ledger in RETIRED_INTO) ---
        "scrape_suite": q_scrape_suite,
        "json_extract": q_json_extract,
        "markdown_gen": q_markdown_gen,
        "chunk_suite": q_chunk_suite,
        "dedup_suite": q_dedup_suite,
        "seeds_suite": q_seeds_suite,
        # --- stable, driver-green in r2 ---
        "robots_allow": q_robots_allow,
        "seen_anti_join": q_seen_anti_join,
        "bff_priority_topk": q_bff_priority_topk,
        "politeness_budget": q_politeness_budget,
        "fairness_aging": q_fairness_aging,
        "robots_gate": q_robots_gate,
        "bfs_reach": q_bfs_reach,
        "bfs_level_metrics": q_bfs_level_metrics,
        "bff_crawl": q_bff_crawl,
        "dfs_crawl": q_dfs_crawl,
        "politeness_backoff": q_politeness_backoff,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "knn_join": q_knn_join,
        "embedding_coverage": q_embedding_coverage,
        "image_validation": q_image_validation,
        "image_score": q_image_score,
        "seeder_bm25": q_seeder_bm25,
        "nonsense_url_filter": q_nonsense_url_filter,
        "seo_filter": q_seo_filter,
    }
    assert len(qs) == 50, f"registry must stay at 50 entries, got {len(qs)}"
    return qs


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; views: region nation customer supplier part orders
# lineitem events documents embeddings)
# ---------------------------------------------------------------------------

def _markdown_gen_sql() -> str:
    from crawl4ai_spark.sources.html_corpus import markdown_expected_sql

    return markdown_expected_sql()


def _json_extract_sql() -> str:
    """json_extract oracle: per-<li> records re-derived from the
    html_corpus anchor arithmetic — RAW (entity-decoded) hrefs, labels,
    titles, uppercase transform, regex-extracted child ids, and the
    title-less dup row falling back to default/NULL."""
    n_expr = "(SELECT COUNT(*) FROM documents)"
    canon_c = _sql_url("child")
    secs = "(['blog','docs','api','news','shop'])"
    exts = "(['.html','.pdf','.jpg',''])"
    return f"""
        WITH pages AS (
          SELECT row_number() OVER () - 1 AS i FROM documents
        ),
        kids AS (
          SELECT i, j, (i * 3 + j) % {n_expr} AS child
          FROM pages, range(1, 4) r(j)
        ),
        hrefs AS (
          SELECT i, j, child,
            CASE
              WHEN (i + j) % 4 = 1
                   AND (CASE WHEN i % 2 = 0 THEN 0 ELSE i % 7 END)
                     = (CASE WHEN child % 2 = 0 THEN 0 ELSE child % 7 END)
                THEN '/' || {secs}[CAST(child % 5 AS INT) + 1]
                     || '/' || CAST(2015 + child % 10 AS VARCHAR)
                     || '/doc-' || child
                     || {exts}[CAST(child % 4 AS INT) + 1]
              WHEN (i + j) % 4 = 2
                THEN {canon_c} || '?utm_source=feed&fbclid=f' || i
              WHEN (i + j) % 4 = 3 THEN {canon_c} || '#frag'
              ELSE {canon_c}
            END AS href
          FROM kids
        )
        SELECT i AS doc_id, href,
               'anchor ' || i || ' ' || j AS label,
               'ANCHOR ' || i || ' ' || j AS label_up,
               't-' || child AS title,
               CAST(child AS VARCHAR) AS child_id
        FROM hrefs
        UNION ALL
        SELECT i, href, 'dup ' || i, 'DUP ' || i, '',
               CAST(NULL AS VARCHAR)
        FROM hrefs WHERE j = 1
    """


def _chunk_suite_sql() -> str:
    """chunk_suite oracle: the window arithmetic of chunking.py
    re-derived as list slicing — count + first/last chunk fingerprints
    per (strategy, parameters)."""
    md5 = _md5long_sql

    def join_words(a: str, b: str) -> str:
        return f"array_to_string(wlist[{a}:{b}], ' ')"

    parts = []
    for sz in (50, 120):
        last_start = f"(CAST(ceil(nw / {sz}.0) AS INT) - 1) * {sz} + 1"
        parts.append(f"""
        SELECT doc_id, 'fixed_{sz}' AS strat,
          CAST(ceil(nw / {sz}.0) AS INT) AS n,
          CASE WHEN nw = 0 THEN NULL
               ELSE {md5(join_words('1', str(sz)))} END AS first_fp,
          CASE WHEN nw = 0 THEN NULL
               ELSE {md5(join_words(last_start, 'nw'))} END AS last_fp
        FROM base""")
    for w, st in ((30, 10), (45, 15)):
        i_last = f"((nw - {w}) - ((nw - {w}) % {st}))"
        has_tail = f"({i_last} + {w} < nw)"
        parts.append(f"""
        SELECT doc_id, 'sliding_{w}_{st}' AS strat,
          CASE WHEN nw <= {w} THEN 1
               ELSE CAST(floor((nw - {w}) / {st}.0) AS INT) + 1
                    + (CASE WHEN {has_tail} THEN 1 ELSE 0 END) END AS n,
          CASE WHEN nw <= {w} THEN {md5('text')}
               ELSE {md5(join_words('1', str(w)))} END AS first_fp,
          CASE WHEN nw <= {w} THEN {md5('text')}
               WHEN {has_tail}
                 THEN {md5(join_words(f'nw - {w} + 1', 'nw'))}
               ELSE {md5(join_words(f'{i_last} + 1', f'{i_last} + {w}'))}
          END AS last_fp
        FROM base""")
    for w, ov in ((60, 20), (40, 10)):
        stride = w - ov
        kmax = f"CAST(ceil((nw - {w}) / {stride}.0) AS INT)"
        parts.append(f"""
        SELECT doc_id, 'overlap_{w}_{ov}' AS strat,
          CASE WHEN nw <= {w} THEN 1 ELSE {kmax} + 1 END AS n,
          CASE WHEN nw <= {w} THEN {md5('text')}
               ELSE {md5(join_words('1', str(w)))} END AS first_fp,
          CASE WHEN nw <= {w} THEN {md5('text')}
               ELSE {md5(join_words(f'{kmax} * {stride} + 1',
                                    f'{kmax} * {stride} + {w}'))}
          END AS last_fp
        FROM base""")
    unions = "\n        UNION ALL".join(parts)
    return f"""
        WITH base AS (
          SELECT doc_id, text,
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> '')
                   AS wlist,
                 len(list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '')) AS nw
          FROM documents
        )
        {unions}
    """


def _dedup_suite_sql(minhash_mins: str) -> str:
    """dedup_suite oracle: the three retired singleton oracles (exact
    md5 groups, universal-family minhash mins, 16-bit simhash) wrapped
    into the suite's long (kind, id_s, k, v) format — identical value
    arithmetic, only reshaped."""
    simhash_bits = []
    for i in range(16):
        vote = f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END)"
        simhash_bits.append(f"CASE WHEN {vote} > 0 THEN {2**i} ELSE 0 END")
    simhash_expr = " + ".join(simhash_bits)
    m_unions = "\n            UNION ALL ".join(
        f"SELECT 'minhash' AS kind, CAST(doc_id AS VARCHAR) AS id_s, "
        f"'m{h}' AS k, CAST(m{h} AS BIGINT) AS v FROM msig"
        for h in range(8)
    )
    return f"""
        WITH e AS (
          SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id,
                 count(*) AS n_copies
          FROM documents GROUP BY md5(text)
        ),
        msig AS (
          SELECT * FROM (
            WITH toks AS (
              SELECT doc_id, {_SQL_TOKS} AS tl FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] AS shingle
              FROM toks, UNNEST(range(1, greatest(len(tl) - 2, 0) + 1)) t(i)
            )
            SELECT doc_id, {minhash_mins} FROM sh GROUP BY doc_id
          ) t
        ),
        ssig AS (
          SELECT * FROM (
            WITH toks AS (
              SELECT doc_id, UNNEST(list_distinct({_SQL_TOKS})) AS tok
              FROM documents
            ),
            hashes AS (
              SELECT doc_id, {_md5long_sql('tok')} AS h FROM toks
            )
            SELECT doc_id, CAST({simhash_expr} AS BIGINT) AS sh
            FROM hashes GROUP BY doc_id
          ) t
        )
        SELECT 'exact' AS kind, text_md5 AS id_s, 'keep_id' AS k,
               CAST(keep_id AS BIGINT) AS v FROM e
        UNION ALL
        SELECT 'exact', text_md5, 'n_copies', CAST(n_copies AS BIGINT) FROM e
        UNION ALL {m_unions}
        UNION ALL
        SELECT 'simhash', CAST(doc_id AS VARCHAR), 'sh', CAST(sh AS BIGINT)
        FROM ssig
    """


def _scrape_suite_sql() -> str:
    """q_scrape_suite's oracle: the arithmetic re-derivation of every
    scraped link/image/video/audio/meta row, sized from the documents
    view exactly as the Spark side sizes the html corpus."""
    from crawl4ai_spark.sources.html_corpus import scrape_expected_sql

    return scrape_expected_sql(None)


def oracle_sql() -> dict[str, str]:
    url = _sql_url("doc_id")
    simhash_bits = []
    for i in range(16):
        vote = (
            f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END)"
        )
        simhash_bits.append(f"CASE WHEN {vote} > 0 THEN {2**i} ELSE 0 END")
    simhash_expr = " + ".join(simhash_bits)

    # chunked minhash family (dedup.uhash_chunks): hash h = 32-bit
    # chunk h%4 of md5("q{h//4}:" || shingle) — the scale path (4× less
    # digest work), identical string/substr/hex semantics on both engines
    from crawl4ai_spark.functions.dedup import uhash_chunks

    def _umins(num_hashes: int) -> str:
        return ", ".join(
            "MIN(CAST('0x' || substr(md5('{salt}' || shingle), {pos}, 8) "
            "AS BIGINT)) AS m{h}".format(salt=salt, pos=off + 1, h=h)
            for h, (salt, off) in enumerate(uhash_chunks(num_hashes))
        )

    minhash_mins = _umins(8)
    minhash_mins16 = _umins(16)
    # band bucket = md5 of the comma-joined 4-slice of the signature
    # (mirrors dedup._band_buckets' concat_ws over long columns)
    lsh_band_selects = "\n              UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({concat}) AS bucket FROM sig".format(
            b=b,
            concat=" || ',' || ".join(
                f"CAST(m{b * 4 + r} AS VARCHAR)" for r in range(4)
            ),
        )
        for b in range(4)
    )
    sig_sql = _rh_sig_sql("e")
    # multi-probe predicate: exact bucket or any 1-bit flip (planes=8)
    ann_probe_pred = " OR ".join(
        ["s.sig = q.qsig"] + [f"s.sig = xor(q.qsig, {2**p})" for p in range(8)]
    )

    return {
        "normalize_suite": f"""
            SELECT doc_id,
                   {url} || CASE CAST(doc_id % 4 AS INT)
                     WHEN 0 THEN '?a=1&b=2'
                     WHEN 1 THEN '?a=1&b='
                     ELSE '' END AS norm_url,
                   {url} || '?b=' || CAST(doc_id % 5 AS VARCHAR) || '&a=1' AS norm_deep,
                   {url} || '?utm_source=x&b=' || CAST(doc_id % 5 AS VARCHAR)
                         || '&a=1' AS norm_eff
            FROM documents
        """,
        "seeds_suite": f"""
            SELECT 'sitemap' AS source,
                   'd' || CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                                    ELSE doc_id % 7 END AS VARCHAR)
                       || '.example.com' AS domain,
                   {url} AS url
            FROM documents
            UNION ALL
            SELECT 'cc' AS source, 'd0.example.com' AS domain, {url} AS url
            FROM documents
            WHERE (doc_id % 2 = 0 OR doc_id % 7 = 0) AND doc_id % 5 = 1
        """,
        "scrape_suite": _scrape_suite_sql(),
        "robots_allow": """
            SELECT doc_id,
              CASE
                WHEN doc_id % 2 = 0 OR doc_id % 7 = 0 THEN
                  CASE WHEN doc_id % 5 = 1 THEN
                         (doc_id % 10 = 6 AND CAST(doc_id AS VARCHAR) LIKE '1%')
                       WHEN doc_id % 5 = 0 THEN FALSE
                       ELSE TRUE END
                WHEN doc_id % 7 = 1 THEN FALSE
                ELSE TRUE
              END AS allowed
            FROM documents
        """,
        "seen_anti_join": f"""
            SELECT doc_id, {url} AS url FROM documents WHERE doc_id % 3 <> 0
        """,
        "scorer_suite": f"""
            SELECT doc_id,
                   {_SQL_KEYWORD} AS kw_score,
                   {_SQL_CTYPE} AS ctype_score,
                   {_SQL_FRESH} AS fresh_score,
                   {_SQL_DOMAUTH} AS domauth_score,
                   CASE CAST(doc_id % 3 AS INT) WHEN 1 THEN 1.0 ELSE 0.5 END AS depth_score,
                   ({_SQL_KEYWORD} + {_SQL_CTYPE} + {_SQL_FRESH} + {_SQL_DOMAUTH}) / 4.0 AS comp_score
            FROM (SELECT doc_id, {url} AS url FROM documents)
        """,
        "filter_chain": f"""
            SELECT doc_id, url,
                   (doc_id % 4 = 0 OR doc_id % 5 = 1) AS pat_pass,
                   (doc_id % 4 = 0 OR doc_id % 4 = 3) AS ctype_pass,
                   NOT (doc_id % 2 = 1 AND doc_id % 7 = 3) AS dom_pass,
                   ((doc_id % 4 = 0 OR doc_id % 5 = 1)
                    AND (doc_id % 4 = 0 OR doc_id % 4 = 3)
                    AND NOT (doc_id % 2 = 1 AND doc_id % 7 = 3)) AS chain_pass,
                   (doc_id % 4 = 0) AS valid_pass
            FROM (SELECT doc_id, {url} AS url FROM documents)
        """,
        "bff_priority_topk": f"""
            SELECT doc_id, url, CAST(doc_id % 4 AS INT) AS depth,
                   ({_SQL_KEYWORD} + {_SQL_CTYPE} + {_SQL_FRESH} + {_SQL_DOMAUTH}) / 4.0 AS score
            FROM (SELECT doc_id, {url} AS url FROM documents)
            ORDER BY score DESC, depth ASC, url ASC
            LIMIT 10
        """,
        "politeness_budget": f"""
            SELECT doc_id, domain, rn FROM (
              SELECT doc_id, domain,
                     row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn,
                     CASE WHEN domain = 'd0.example.com' THEN 3 ELSE 2 END AS budget
              FROM (SELECT doc_id,
                           'd' || CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE doc_id % 7 END AS VARCHAR)
                           || '.example.com' AS domain
                    FROM documents)
            ) WHERE rn <= budget
        """,
        "fairness_aging": """
            SELECT event_id, event_type, rn FROM (
              SELECT event_id, event_type,
                     row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
              FROM events
            ) WHERE rn <= 5
        """,
        # P2 backoff: replay the engine's sequential per-domain fold
        # (async_dispatcher.py:65-85 semantics, md5-seeded jitter) as a
        # recursive CTE — same IEEE-double op order, so values match
        # bit-for-bit before the fingerprint floor.
        "politeness_backoff": """
            WITH RECURSIVE
            steps AS (
              SELECT domain, status_code,
                     row_number() OVER (PARTITION BY domain ORDER BY doc_id) - 1 AS k
              FROM (
                SELECT doc_id,
                       'd' || CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                                        ELSE doc_id % 7 END AS VARCHAR)
                       || '.example.com' AS domain,
                       (CASE WHEN doc_id % 13 = 0 THEN 404
                             WHEN doc_id % 17 = 0 THEN 429
                             WHEN doc_id % 19 = 0 THEN 503
                             ELSE 200 END) AS status_code
                FROM documents
              )
            ),
            fold AS (
              SELECT domain, CAST(-1 AS BIGINT) AS k,
                     1.0 + 2.0 * (CAST('0x' || substr(md5('init:' || domain || ':42'), 1, 8) AS BIGINT) / 4294967296.0) AS delay,
                     0 AS fails, FALSE AS retired
              FROM (SELECT DISTINCT domain FROM steps)
              UNION ALL
              SELECT s.domain, s.k,
                     CASE WHEN s.status_code IN (429, 503)
                          THEN least(f.delay * 2 * (0.75 + 0.5 * (CAST('0x' || substr(md5('back:' || s.domain || ':0:' || s.k || ':42'), 1, 8) AS BIGINT) / 4294967296.0)), 60.0)
                          ELSE greatest(1.0 + 2.0 * (CAST('0x' || substr(md5('succ:' || s.domain || ':0:' || s.k || ':42'), 1, 8) AS BIGINT) / 4294967296.0), f.delay * 0.75)
                     END AS delay,
                     CASE WHEN s.status_code IN (429, 503) THEN f.fails + 1 ELSE 0 END AS fails,
                     (f.retired OR (s.status_code IN (429, 503) AND f.fails + 1 > 3)) AS retired
              FROM fold f
              JOIN steps s ON s.domain = f.domain AND s.k = f.k + 1
            )
            SELECT f.domain,
                   CAST(FLOOR(ROUND(f.delay, 9) * 1e6) AS BIGINT) AS delay_fp,
                   CAST(f.fails AS INT) AS fail_count,
                   f.retired
            FROM fold f
            JOIN (SELECT domain, MAX(k) AS mk FROM fold GROUP BY domain) m
              ON f.domain = m.domain AND f.k = m.mk
        """,
        "robots_gate": f"""
            SELECT doc_id, url,
                   (
                     (domain = 'd0.example.com' AND (sec = 'shop' OR sec = 'api'))
                     OR domain = 'd2.example.com'
                   ) AS blocked
            FROM (SELECT doc_id, {url} AS url,
                         'd' || CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE doc_id % 7 END AS VARCHAR)
                         || '.example.com' AS domain,
                         (['blog','docs','api','news','shop'])[CAST(doc_id % 5 AS INT) + 1] AS sec
                  FROM documents)
        """,
        # BFS over the arithmetic graph: min-depth reachability through
        # success nodes, plus the start-recrawl quirk (start never enters
        # visited at depth 0 — bfs_strategy.py:231-234,186)
        # Strict best-first crawl replayed round-by-round in a recursive
        # CTE — emission order, parents, scores, success all hash-checked
        # (was rows-only through r2; see _bff_crawl_sql docstring)
        "bff_crawl": _bff_crawl_sql(max_pages=30, max_depth=2),
        # Strict DFS replayed pop-by-pop in a recursive CTE (was
        # rows-only through r2; see _dfs_crawl_sql docstring)
        "dfs_crawl": _dfs_crawl_sql(n=40, max_pages=10, max_depth=2),
        # Re-crawl after TTL expiry: BFS over the OPEN subgraph only —
        # a node passes the (post-remove) seen anti-join iff it is
        # stale ((doc_id+6) % 10 < 3, i.e. fetched > 7 days before the
        # day-9.5 revalidation) or it is the seed (never stored:
        # start-recrawl quirk); expansion still requires success.
        "ttl_recrawl": f"""
            WITH RECURSIVE
            n AS (SELECT count(*) AS n FROM documents),
            nodes AS (
              SELECT doc_id,
                     (doc_id % 13 <> 0 AND doc_id % 17 <> 0 AND doc_id % 19 <> 0) AS success
              FROM documents
            ),
            reach2(doc_id, depth) AS (
              SELECT CAST(1 AS BIGINT), 0
              UNION
              SELECT CAST((r.doc_id * {BRANCHING} + j) % (SELECT n FROM n) AS BIGINT),
                     r.depth + 1
              FROM reach2 r
              JOIN nodes p ON p.doc_id = r.doc_id AND p.success
              CROSS JOIN range(1, {BRANCHING} + 1) t(j)
              WHERE r.depth + 1 <= 2
                AND ((((r.doc_id * {BRANCHING} + j) % (SELECT n FROM n)) + 6) % 10 < 3
                     OR (r.doc_id * {BRANCHING} + j) % (SELECT n FROM n) = 1)
            ),
            firsts AS (
              SELECT doc_id, MIN(depth) AS depth FROM reach2
              WHERE NOT (doc_id = 1 AND depth > 0)
              GROUP BY doc_id
            ),
            start_recrawl AS (
              SELECT doc_id, MIN(depth) AS depth FROM reach2
              WHERE doc_id = 1 AND depth > 0
              GROUP BY doc_id
            ),
            emitted AS (
              SELECT * FROM firsts UNION ALL SELECT * FROM start_recrawl
            )
            SELECT {_sql_url('doc_id')} AS url,
                   CAST(depth AS INT) AS depth,
                   CAST(CASE WHEN doc_id % 13 = 0 THEN 404
                             WHEN doc_id % 17 = 0 THEN 429
                             WHEN doc_id % 19 = 0 THEN 503
                             ELSE 200 END AS INT) AS status_code
            FROM emitted
        """,
        "bfs_reach": f"""
            WITH RECURSIVE
            n AS (SELECT count(*) AS n FROM documents),
            nodes AS (
              SELECT doc_id,
                     (doc_id % 13 <> 0 AND doc_id % 17 <> 0 AND doc_id % 19 <> 0) AS success
              FROM documents
            ),
            reach(doc_id, depth) AS (
              SELECT CAST(1 AS BIGINT), 0
              UNION
              SELECT CAST((r.doc_id * {BRANCHING} + j) % (SELECT n FROM n) AS BIGINT), r.depth + 1
              FROM reach r
              JOIN nodes p ON p.doc_id = r.doc_id AND p.success
              CROSS JOIN range(1, {BRANCHING} + 1) t(j)
              WHERE r.depth + 1 <= 2
            ),
            firsts AS (
              SELECT doc_id, MIN(depth) AS depth FROM reach
              WHERE NOT (doc_id = 1 AND depth > 0)
              GROUP BY doc_id
            ),
            start_recrawl AS (
              SELECT doc_id, MIN(depth) AS depth FROM reach
              WHERE doc_id = 1 AND depth > 0
              GROUP BY doc_id
            ),
            emitted AS (
              SELECT * FROM firsts UNION ALL SELECT * FROM start_recrawl
            )
            SELECT {_sql_url('doc_id')} AS url, CAST(depth AS INT) AS depth,
                   CAST(1 AS BIGINT) AS n
            FROM emitted
        """,
        "bfs_level_metrics": f"""
            WITH RECURSIVE
            n AS (SELECT count(*) AS n FROM documents),
            nodes AS (
              SELECT doc_id,
                     (doc_id % 13 <> 0 AND doc_id % 17 <> 0 AND doc_id % 19 <> 0) AS success
              FROM documents
            ),
            reach(doc_id, depth) AS (
              SELECT CAST(1 AS BIGINT), 0
              UNION
              SELECT CAST((r.doc_id * {BRANCHING} + j) % (SELECT n FROM n) AS BIGINT), r.depth + 1
              FROM reach r
              JOIN nodes p ON p.doc_id = r.doc_id AND p.success
              CROSS JOIN range(1, {BRANCHING} + 1) t(j)
              WHERE r.depth + 1 <= 2
            ),
            firsts AS (
              SELECT doc_id, MIN(depth) AS depth FROM reach
              WHERE NOT (doc_id = 1 AND depth > 0)
              GROUP BY doc_id
            ),
            start_recrawl AS (
              SELECT doc_id, MIN(depth) AS depth FROM reach
              WHERE doc_id = 1 AND depth > 0
              GROUP BY doc_id
            ),
            emitted AS (
              SELECT * FROM firsts UNION ALL SELECT * FROM start_recrawl
            )
            SELECT CAST(e.depth AS INT) AS depth, count(*) AS fetched,
                   CAST(SUM(CASE WHEN nd.success THEN 1 ELSE 0 END) AS BIGINT) AS succeeded
            FROM emitted e JOIN nodes nd ON nd.doc_id = e.doc_id
            GROUP BY e.depth
        """,
        "dedup_suite": _dedup_suite_sql(minhash_mins),
        "json_extract": _json_extract_sql(),
        "chunk_suite": _chunk_suite_sql(),
        "markdown_gen": _markdown_gen_sql(),
        "text_stats_suite": _text_stats_sql(),
        "ngram_jaccard_pairs": f"""
            WITH toks AS (
              SELECT doc_id, {_SQL_TOKS} AS tl FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(tl) - 2, 0) + 1),
                       i -> tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2]
                     )) AS shset
              FROM toks
            ),
            flat AS (SELECT doc_id, UNNEST(shset) AS shingle FROM sh),
            pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM flat a JOIN flat b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            )
            SELECT p.id_a, p.id_b,
                   round(len(list_intersect(sa.shset, sb.shset)) * 1.0
                         / greatest(len(list_distinct(sa.shset || sb.shset)), 1), 6) AS jaccard
            FROM pairs p
            JOIN sh sa ON sa.doc_id = p.id_a
            JOIN sh sb ON sb.doc_id = p.id_b
            WHERE len(list_intersect(sa.shset, sb.shset)) * 1.0
                  / greatest(len(list_distinct(sa.shset || sb.shset)), 1) >= 0.2
        """,
        # deterministic LSH: same md5 permutations, same band buckets,
        # same exact-Jaccard confirm — a full value oracle for the LSH
        # candidate-pair pipeline (uncapped)
        "minhash_lsh_pairs": f"""
            WITH toks AS (
              SELECT doc_id, {_SQL_TOKS} AS tl FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] AS shingle
              FROM toks, UNNEST(range(1, greatest(len(tl) - 2, 0) + 1)) t(i)
            ),
            sig AS (
              SELECT doc_id, {minhash_mins16} FROM sh GROUP BY doc_id
            ),
            bk AS (
              {lsh_band_selects}
            ),
            pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bk a JOIN bk b
                ON a.band = b.band AND a.bucket = b.bucket
               AND a.doc_id < b.doc_id
            ),
            shs AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(tl) - 2, 0) + 1),
                       i -> tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2]
                     )) AS shset
              FROM toks
            ),
            j AS (
              SELECT p.id_a, p.id_b,
                     len(list_intersect(sa.shset, sb.shset)) * 1.0
                       / greatest(len(list_distinct(sa.shset || sb.shset)), 1) AS jac
              FROM pairs p
              JOIN shs sa ON sa.doc_id = p.id_a
              JOIN shs sb ON sb.doc_id = p.id_b
            )
            SELECT id_a, id_b, round(jac, 6) AS jaccard FROM j WHERE jac >= 0.2
        """,
        # C9: independent re-derivation of the harmonic-weighted fuzzy
        # relevance over the synthetic URL's six parts (query = 'docs
        # example': part 'example' ⊂ query → 0.9; token 'example' in
        # part 'example' → 0.7; sec='docs' adds 0.9 + 0.7; plus
        # 0.5 × 3-gram Jaccard of query vs the space-joined parts)
        "url_relevance": """
            WITH parts AS (
              SELECT doc_id,
                'd' || CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                                 ELSE doc_id % 7 END AS VARCHAR) AS p1,
                (['blog','docs','api','news','shop'])[CAST(doc_id % 5 AS INT) + 1] AS sec,
                CAST(2015 + doc_id % 10 AS VARCHAR) AS yr,
                'doc-' || CAST(doc_id AS VARCHAR)
                       || (['.html','.pdf','.jpg',''])[CAST(doc_id % 4 AS INT) + 1] AS lastp
              FROM documents
            ),
            ut AS (
              SELECT doc_id, sec,
                p1 || ' example com ' || sec || ' ' || yr || ' ' || lastp AS url_text
              FROM parts
            ),
            ug AS (
              SELECT doc_id, sec,
                list_distinct(list_transform(
                  range(1, length(url_text) - 1), i -> substr(url_text, i, 3)
                )) AS ugrams,
                list_distinct(list_transform(
                  range(1, length('docs example') - 1), i -> substr('docs example', i, 3)
                )) AS qgrams
              FROM ut
            ),
            sc AS (
              SELECT doc_id,
                list_sort(
                  [0.9, 0.7,
                   0.5 * (len(list_intersect(qgrams, ugrams)) * 1.0
                          / len(list_distinct(qgrams || ugrams)))]
                  || (CASE WHEN sec = 'docs' THEN [0.9, 0.7]
                           ELSE CAST([] AS DOUBLE[]) END),
                  'DESC') AS ls
              FROM ug
            )
            SELECT doc_id,
              CAST(floor(round(least(
                list_sum(list_transform(range(1, len(ls) + 1), i -> ls[i] / i))
                / list_sum(list_transform(range(1, len(ls) + 1), i -> 1.0 / i)),
                1.0), 9) * 1e6) AS BIGINT) AS rel_fp
            FROM sc
        """,
        # S10 per-source suite: wayback (on-domain CDX originals; the
        # synthetic off-domain doc_id%3=0 rows filtered) + crt (SAN
        # mining; crt:// synthetic url) + probe (hosts × paths with the
        # deterministic fetchable subset) + feed (rss/atom href mining)
        "domain_sources": f"""
            WITH crt_e AS (
              SELECT doc_id,
                'd' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS common,
                CASE CAST(doc_id % 4 AS INT)
                  WHEN 0 THEN '*.example.com' || chr(10) || 'mail.example.com'
                  WHEN 1 THEN 'www.d' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
                  WHEN 2 THEN 'evil.other.org' || chr(10) || 'EXAMPLE.COM'
                  ELSE '' END AS sans
              FROM documents
            ),
            crt_names AS (
              SELECT UNNEST(string_split(common || chr(10) || sans, chr(10))) AS raw
              FROM crt_e
            ),
            crt_hosts AS (
              SELECT DISTINCT
                CASE WHEN starts_with(h, '*.') THEN substr(h, 3) ELSE h END AS host
              FROM (SELECT lower(trim(raw)) AS h FROM crt_names)
              WHERE h <> ''
            ),
            hosts AS (
              SELECT i AS hidx,
                     'd' || CAST(i AS VARCHAR) || '.example.com' AS host
              FROM range(7) t(i)
            ),
            paths(path) AS (VALUES
              ('/'), ('/about'), ('/contact'), ('/blog'), ('/docs'),
              ('/api'), ('/login'), ('/admin'), ('/sitemap.xml'),
              ('/feed'), ('/rss')
            ),
            probes AS (
              SELECT hidx, host, 'https://' || host || path AS url
              FROM hosts CROSS JOIN paths
            ),
            feeds AS (
              SELECT host, 'https://' || host || '/feed.xml' AS url FROM hosts
              WHERE hidx % 3 = 0
              UNION ALL
              SELECT host, 'https://feeds.' || host || '/atom' AS url FROM hosts
              WHERE hidx % 3 = 0
            )
            SELECT 'wayback' AS source,
                   'd' || CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                                    ELSE doc_id % 7 END AS VARCHAR)
                       || '.example.com' AS host,
                   {url} AS url
            FROM documents WHERE doc_id % 3 <> 0
            UNION ALL
            SELECT 'crt', host, 'crt://' || host
            FROM crt_hosts
            WHERE host = 'example.com' OR host LIKE '%.example.com'
            UNION ALL
            SELECT 'probe', host, url FROM probes
            WHERE (hidx + length(url)) % 3 <> 0
            UNION ALL
            SELECT 'feed', host, url FROM feeds
        """,
        # hyperplane signatures recomputed exactly (see _rh_sig_sql) —
        # the approximate join's candidate set is deterministic
        "lsh_self_join": f"""
            WITH v AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ),
            s AS (SELECT vec_id, e, {sig_sql} AS sig FROM v),
            p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round({_cos_sql('a.e', 'b.e')}, 6) AS cos_sim
              FROM s a JOIN s b
                ON a.sig = b.sig AND a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.2
        """,
        "ann_knn_join": f"""
            WITH v AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ),
            s AS (SELECT vec_id, e, {sig_sql} AS sig FROM v),
            q AS (
              SELECT vec_id AS query_id, e AS qe, sig AS qsig
              FROM s WHERE vec_id < 3
            ),
            cand AS (
              SELECT q.query_id, s.vec_id,
                     round({_cos_sql('s.e', 'q.qe')}, 6) AS cos_sim
              FROM s CROSS JOIN q
              WHERE {ann_probe_pred}
            ),
            r AS (
              SELECT query_id, vec_id, cos_sim,
                     CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
              FROM cand
            )
            SELECT query_id, vec_id, cos_sim, rank FROM r WHERE rank <= 5
        """,
        # cosine_topk + ann_lsh_topk oracles, unioned under a method tag
        # (mirrors q_similarity_topk's union of the two operators)
        "similarity_topk": f"""
            WITH v AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ),
            bq AS (SELECT e AS qe FROM v WHERE vec_id = 0),
            braw AS (
              -- rank on the RAW fold-order cosine like the Spark side
              -- (and the lsh branch below); ranking on the rounded
              -- value would break ties differently at the k boundary
              SELECT v.vec_id, {_cos_sql('v.e', 'bq.qe')} AS raw_cos
              FROM v CROSS JOIN bq
            ),
            brute AS (
              SELECT 'brute' AS method, vec_id, round(raw_cos, 6) AS cos_sim
              FROM braw
              ORDER BY raw_cos DESC, vec_id ASC
              LIMIT 10
            ),
            s AS (SELECT vec_id, e, {sig_sql} AS sig FROM v),
            q AS (SELECT e AS qe, sig AS qsig FROM s WHERE vec_id = 0),
            cand AS (
              SELECT s.vec_id, {_cos_sql('s.e', 'q.qe')} AS raw_cos
              FROM s CROSS JOIN q
              WHERE {ann_probe_pred}
            ),
            lsh AS (
              SELECT 'lsh' AS method, vec_id, round(raw_cos, 6) AS cos_sim
              FROM cand ORDER BY raw_cos DESC, vec_id ASC LIMIT 10
            )
            SELECT * FROM brute UNION ALL SELECT * FROM lsh
        """,
        # brute-force hamming self-join over the same md5-deterministic
        # 60-bit phash column q_phash_near_dup synthesises; the Spark
        # side's Manku banding has guaranteed recall, so the pair sets
        # are identical, not just approximately equal
        "phash_near_dup": """
            WITH t AS (
              SELECT doc_id AS image_id,
                     xor(CAST('0x' || substr(md5('ph:' ||
                           CAST(doc_id // 4 AS VARCHAR)), 1, 15) AS BIGINT),
                         CASE CAST(doc_id % 4 AS INT)
                           WHEN 0 THEN 0 WHEN 1 THEN 8
                           WHEN 2 THEN 131080 ELSE 2199023386632 END
                     ) AS phash
              FROM documents
            )
            SELECT a.image_id AS id_a, b.image_id AS id_b,
                   CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
            FROM t a JOIN t b ON a.image_id < b.image_id
            WHERE bit_count(xor(a.phash, b.phash)) <= 3
        """,
        "seeder_bm25": r"""
            WITH 
            toks AS (
              SELECT doc_id, UNNEST(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
              FROM documents
            ),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
            stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
            tdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
            idf_all AS (
              SELECT term, ln(((SELECT n_docs FROM stats) - df + 0.5) / (df + 0.5)) AS idf
              FROM tdf
            ),
            avg_idf AS MATERIALIZED (SELECT avg(idf) AS a FROM idf_all),
            idf_q AS (
              SELECT term,
                     CASE WHEN idf >= 0 THEN idf ELSE 0.25 * (SELECT a FROM avg_idf) END AS idf
              FROM idf_all WHERE term IN ('data','spark','table')
            ),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM toks
              WHERE term IN ('data','spark','table') GROUP BY doc_id, term
            ),
            parts AS (
              SELECT t.doc_id, t.term,
                     q.idf * (CAST(t.tf AS DOUBLE) * 2.5
                         / (CAST(t.tf AS DOUBLE) + 1.5 * (0.25 + 0.75 * CAST(d.dl AS DOUBLE) / (SELECT avgdl FROM stats)))) AS part
              FROM tf t JOIN idf_q q USING (term) JOIN dl d USING (doc_id)
            ),
            raw AS (
              SELECT doc_id,
                     0.0 + coalesce(MAX(CASE WHEN term = 'data' THEN part END), 0.0)
                         + coalesce(MAX(CASE WHEN term = 'spark' THEN part END), 0.0)
                         + coalesce(MAX(CASE WHEN term = 'table' THEN part END), 0.0) AS bm25
              FROM parts GROUP BY doc_id
            ),
            bm25 AS MATERIALIZED (
              SELECT doc_id, coalesce(r.bm25, 0.0) AS bm25
              FROM (SELECT doc_id FROM documents) LEFT JOIN raw r USING (doc_id)
            ),
            mm AS MATERIALIZED (SELECT min(bm25) AS lo, max(bm25) AS hi FROM bm25),
            rel AS MATERIALIZED (
              SELECT doc_id,
                     CASE WHEN (SELECT hi FROM mm) = (SELECT lo FROM mm) THEN 0.5
                          ELSE (bm25 - (SELECT lo FROM mm)) / ((SELECT hi FROM mm) - (SELECT lo FROM mm)) END AS relevance_score
              FROM bm25
            )
            SELECT doc_id, CAST(floor(relevance_score * 1e6) AS BIGINT) AS rel_fp FROM rel
        """,

        "seo_filter": """
            WITH h AS (
              SELECT doc_id,
                (CASE WHEN doc_id % 4 = 0 THEN 12 ELSE 0 END) + 40 + CAST(doc_id % 35 AS INT) AS tlen,
                100 + CAST(doc_id % 120 AS INT) AS dlen,
                CAST(doc_id % 3 AS INT) AS canon_kind,
                (doc_id % 5 = 0) AS noindex,
                (doc_id % 6 = 0) AS ldjson,
                (doc_id % 4 = 0) AS kw_title
              FROM documents
            ),
            s AS (
              SELECT doc_id,
                0.0
                + 0.15 * (CASE WHEN tlen BETWEEN 50 AND 60 THEN 1.0
                               WHEN (tlen >= 40 AND tlen < 50) OR (tlen > 60 AND tlen <= 70) THEN 0.7
                               ELSE 0.3 END)
                + 0.18 * (CASE WHEN kw_title THEN 0.6 ELSE 0.0 END)
                + 0.12 * (CASE WHEN dlen BETWEEN 140 AND 160 THEN 1.0
                               WHEN dlen BETWEEN 120 AND 200 THEN 0.5 ELSE 0.2 END)
                + 0.10 * (CASE canon_kind WHEN 0 THEN 1.0 WHEN 1 THEN 0.2 ELSE 0.5 END)
                + 0.20 * (CASE WHEN noindex THEN 0.0 ELSE 1.0 END)
                + 0.10 * (CASE WHEN ldjson THEN 1.0 ELSE 0.0 END)
                + 0.15 * 0.8
                AS seo
              FROM h
            )
            SELECT doc_id, CAST(floor(round(seo, 9) * 1e6) AS BIGINT) AS seo_fp,
                   seo >= 0.65 AS passed
            FROM s
        """,
        "content_relevance_filter": """
            SELECT crf.*, hb.text_bm25_fp
            FROM (
            WITH h AS (
              SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN 'spark data engine' ELSE 'misc page notes' END AS title,
                CASE WHEN doc_id % 2 = 0 THEN 'fast spark jobs' ELSE 'none here' END AS dsc
              FROM documents
            ),
            d AS (
              SELECT doc_id,
                concat_ws(' ', repeat(title, 3), repeat(dsc, 2), 'data tools', dsc) AS doc
              FROM h
            ),
            t AS (
              SELECT doc_id,
                list_filter(string_split_regex(lower(doc), '\\s+'), x -> x <> '') AS toks
              FROM d
            ),
            sc AS (
              SELECT doc_id,
                0.0
                + ln((2.0 / (CAST(len(list_filter(toks, x -> x = 'data')) AS DOUBLE) + 0.5)) + 1.0)
                  * (CAST(len(list_filter(toks, x -> x = 'data')) AS DOUBLE) * 2.2
                     / (CAST(len(list_filter(toks, x -> x = 'data')) AS DOUBLE)
                        + 1.2 * (0.25 + 0.75 * (CAST(len(toks) AS DOUBLE) / 1000.0))))
                + ln((2.0 / (CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) + 0.5)) + 1.0)
                  * (CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) * 2.2
                     / (CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE)
                        + 1.2 * (0.25 + 0.75 * (CAST(len(toks) AS DOUBLE) / 1000.0))))
                AS score
              FROM t
            )
            SELECT doc_id, CAST(floor(score * 1e6) AS BIGINT) AS bm25_fp,
                   score >= 0.4 AS passed
            FROM sc
        ) crf
            JOIN (

            WITH t AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
              FROM documents
            )
            SELECT doc_id, CAST(floor((0.0 + ln((2.0 / (CAST(len(list_filter(toks, x -> x = 'data')) AS DOUBLE) + 0.5)) + 1.0) * (CAST(len(list_filter(toks, x -> x = 'data')) AS DOUBLE) * 2.2 / (CAST(len(list_filter(toks, x -> x = 'data')) AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(len(toks) AS DOUBLE) / 1000.0)))) + ln((2.0 / (CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) + 0.5)) + 1.0) * (CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) * 2.2 / (CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(len(toks) AS DOUBLE) / 1000.0)))) + ln((2.0 / (CAST(len(list_filter(toks, x -> x = 'table')) AS DOUBLE) + 0.5)) + 1.0) * (CAST(len(list_filter(toks, x -> x = 'table')) AS DOUBLE) * 2.2 / (CAST(len(list_filter(toks, x -> x = 'table')) AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(len(toks) AS DOUBLE) / 1000.0))))) * 1e6) AS BIGINT) AS text_bm25_fp FROM t
        ) hb USING (doc_id)
        """,

        "total_score": f"""
            WITH c AS (
              SELECT doc_id,
                greatest(0.0, least(
                    (CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0.0 END)
                  + (CASE WHEN doc_id % 4 = 0 THEN 1.5 ELSE 0.0 END)
                  + (CASE WHEN doc_id % 5 = 0 THEN -0.5 ELSE 0.0 END)
                  + (CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 1.0 WHEN 1 THEN 2.0
                          WHEN 2 THEN 2.0 WHEN 3 THEN 1.0 ELSE 0.0 END)
                  + 0.5
                  + (CASE WHEN doc_id % 3 = 0 THEN 1.5 ELSE 0.5 END)
                , 10.0)) AS rich_intr,
                greatest(0.0, least(
                    (CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 1.0 WHEN 1 THEN 2.0
                          WHEN 2 THEN 2.0 WHEN 3 THEN 1.0 ELSE 0.0 END)
                  + 0.5
                  + (CASE WHEN doc_id % 3 = 0 THEN 1.5 ELSE 0.5 END)
                , 10.0)) AS intr,
                ({_SQL_KEYWORD} + {_SQL_CTYPE} + {_SQL_FRESH} + {_SQL_DOMAUTH}) / 4.0 AS ctx
              FROM (SELECT doc_id, {url} AS url FROM documents)
            )
            SELECT doc_id,
                   CAST(floor(rich_intr * 1e6) AS BIGINT) AS intrinsic_fp,
                   CAST(floor(round(greatest(0.0, least(intr * 0.7 + least(ctx * 10.0, 10.0) * 0.3, 10.0)), 9) * 1e6) AS BIGINT) AS total_fp
            FROM c
        """,
        "nonsense_url_filter": """
            SELECT doc_id, (CAST(doc_id % 7 AS INT) IN (1, 2, 3, 4, 6)) AS nonsense
            FROM documents
        """,
        "seed_pipeline": rf"""
            WITH 
            toks AS (
              SELECT doc_id, UNNEST(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
              FROM documents
            ),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
            stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
            tdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
            idf_all AS (
              SELECT term, ln(((SELECT n_docs FROM stats) - df + 0.5) / (df + 0.5)) AS idf
              FROM tdf
            ),
            avg_idf AS MATERIALIZED (SELECT avg(idf) AS a FROM idf_all),
            idf_q AS (
              SELECT term,
                     CASE WHEN idf >= 0 THEN idf ELSE 0.25 * (SELECT a FROM avg_idf) END AS idf
              FROM idf_all WHERE term IN ('data','spark','table')
            ),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM toks
              WHERE term IN ('data','spark','table') GROUP BY doc_id, term
            ),
            parts AS (
              SELECT t.doc_id, t.term,
                     q.idf * (CAST(t.tf AS DOUBLE) * 2.5
                         / (CAST(t.tf AS DOUBLE) + 1.5 * (0.25 + 0.75 * CAST(d.dl AS DOUBLE) / (SELECT avgdl FROM stats)))) AS part
              FROM tf t JOIN idf_q q USING (term) JOIN dl d USING (doc_id)
            ),
            raw AS (
              SELECT doc_id,
                     0.0 + coalesce(MAX(CASE WHEN term = 'data' THEN part END), 0.0)
                         + coalesce(MAX(CASE WHEN term = 'spark' THEN part END), 0.0)
                         + coalesce(MAX(CASE WHEN term = 'table' THEN part END), 0.0) AS bm25
              FROM parts GROUP BY doc_id
            ),
            bm25 AS MATERIALIZED (
              SELECT doc_id, coalesce(r.bm25, 0.0) AS bm25
              FROM (SELECT doc_id FROM documents) LEFT JOIN raw r USING (doc_id)
            ),
            mm AS MATERIALIZED (SELECT min(bm25) AS lo, max(bm25) AS hi FROM bm25),
            rel AS MATERIALIZED (
              SELECT doc_id,
                     CASE WHEN (SELECT hi FROM mm) = (SELECT lo FROM mm) THEN 0.5
                          ELSE (bm25 - (SELECT lo FROM mm)) / ((SELECT hi FROM mm) - (SELECT lo FROM mm)) END AS relevance_score
              FROM bm25
            ),
            urls AS (
              SELECT doc_id, {url} AS url FROM documents
              WHERE doc_id % 2 = 0 OR doc_id % 3 = 0
            )
            SELECT u.url, CAST(floor(r.relevance_score * 1e6) AS BIGINT) AS rel_fp
            FROM urls u JOIN rel r USING (doc_id)
            ORDER BY r.relevance_score DESC, u.url ASC
            LIMIT 25
        """,
        "image_score": """
            SELECT doc_id,
                (CASE WHEN ([32,64,96,128,256])[CAST(doc_id % 5 AS INT) + 1] > 150 THEN 1 ELSE 0 END)
              + (CASE WHEN ([32,48,96,64,192])[CAST(doc_id % 5 AS INT) + 1] > 150 THEN 1 ELSE 0 END)
              + (CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END)
              + (CASE WHEN (doc_id % 10) / 10.0 < 0.5 THEN 1 ELSE 0 END)
              + (CASE WHEN (['jpeg','png','tiff'])[CAST(doc_id % 3 AS INT) + 1] IN ('jpeg','png') THEN 1 ELSE 0 END)
              + (CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END)
              + (CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
              AS img_score
            FROM documents
        """,
        "knn_join": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 3
            ),
            s AS (
              SELECT q.query_id, e.vec_id,
                     round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cos_sim
              FROM embeddings e CROSS JOIN q
            ),
            r AS (
              SELECT query_id, vec_id, cos_sim,
                     CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank
              FROM s
            )
            SELECT query_id, vec_id, cos_sim, rank FROM r WHERE rank <= 5
        """,
        "embedding_coverage": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id % 5 = 0 AND vec_id < 100
            ),
            kb AS (
              SELECT CAST(embedding AS DOUBLE[]) AS kv
              FROM embeddings WHERE vec_id % 5 <> 0
            ),
            d AS (
              SELECT q.query_id,
                     1.0 - list_cosine_similarity(kb.kv, q.qv) AS dist
              FROM kb CROSS JOIN q
            ),
            t AS (
              SELECT query_id, dist,
                     row_number() OVER (PARTITION BY query_id ORDER BY dist ASC) AS rn
              FROM d
            ),
            g AS (
              SELECT query_id, min(dist) AS gap,
                     sum(exp(-dist)) / count(*) AS topk_avg
              FROM t WHERE rn <= 3 GROUP BY query_id
            )
            SELECT query_id,
                   round(gap, 6) AS gap,
                   round(0.7 * exp(-gap) + 0.3 * topk_avg, 6) AS confidence
            FROM g
        """,
        # A5: independent DuckDB execution of the adaptive-confidence
        # formulas (coverage / consistency / saturation / 0.4-0.3-0.3)
        "adaptive_confidence": r"""
            WITH toks AS (
              SELECT doc_id,
                     UNNEST(list_filter(
                       string_split_regex(
                         regexp_replace(lower(text), '[^\w\s]', ' ', 'g'), '\s+'),
                       x -> length(x) > 2)) AS term
              FROM documents
            ),
            stats AS MATERIALIZED (
              SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
              FROM toks GROUP BY term
            ),
            nn AS (SELECT count(*) AS n_docs FROM documents),
            mx AS (SELECT max(tf) AS max_tf FROM stats),
            qt AS (SELECT UNNEST(['spark','data','web']) AS term),
            cov AS (
              SELECT least(1.0, sqrt(avg(
                CASE WHEN s.df IS NOT NULL AND s.df > 0
                     THEN (CAST(s.df AS DOUBLE) / (SELECT n_docs FROM nn))
                          * (1 + 0.5 * ln(1 + s.tf) / ln(1 + (SELECT max_tf FROM mx)))
                     ELSE 0.0 END))) AS coverage
              FROM qt LEFT JOIN stats s USING (term)
            ),
            kb AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 40),
            kbt AS MATERIALIZED (
              SELECT DISTINCT doc_id, term FROM toks
              WHERE doc_id IN (SELECT doc_id FROM kb)
            ),
            sizes AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM kbt GROUP BY doc_id),
            mm AS (SELECT count(*) AS m FROM sizes),
            inter AS (
              SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
              FROM kbt a JOIN kbt b USING (term)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            ),
            sumj AS (
              SELECT coalesce(sum(CAST(c AS DOUBLE) / (si.sz + sj.sz - c)), 0.0) AS s
              FROM inter
              JOIN sizes si ON si.doc_id = inter.i
              JOIN sizes sj ON sj.doc_id = inter.j
            ),
            cons AS (
              SELECT CASE WHEN (SELECT count(*) FROM kb) < 2 THEN 1.0
                          WHEN (SELECT m FROM mm) >= 2
                            THEN (SELECT s FROM sumj)
                                 / ((SELECT m FROM mm) * ((SELECT m FROM mm) - 1) / 2.0)
                          ELSE 0.0 END AS consistency
            ),
            fs AS (SELECT term, min(doc_id) AS fd FROM toks GROUP BY term),
            npd AS (SELECT fd, count(*) AS nt FROM fs GROUP BY fd),
            hist AS (
              SELECT d.doc_id, coalesce(n.nt, 0) AS nt
              FROM documents d LEFT JOIN npd n ON d.doc_id = n.fd
            ),
            ends AS (SELECT
              (SELECT nt FROM hist ORDER BY doc_id ASC  LIMIT 1) AS first_nt,
              (SELECT nt FROM hist ORDER BY doc_id DESC LIMIT 1) AS last_nt),
            sat AS (
              SELECT CASE WHEN (SELECT n_docs FROM nn) < 2 THEN 0.0
                ELSE greatest(0.0, least(1.0,
                  1.0 - CAST(CASE WHEN last_nt > 0 THEN last_nt ELSE 1 END AS DOUBLE)
                      / CAST(CASE WHEN first_nt > 0 THEN first_nt ELSE 1 END AS DOUBLE)))
                END AS saturation
              FROM ends
            )
            SELECT CAST(floor(coverage * 1e6) AS BIGINT) AS coverage_fp,
                   CAST(floor(consistency * 1e6) AS BIGINT) AS consistency_fp,
                   CAST(floor(saturation * 1e6) AS BIGINT) AS saturation_fp,
                   CAST(floor((0.4 * coverage + 0.3 * consistency
                               + 0.3 * saturation) * 1e6) AS BIGINT) AS confidence_fp
            FROM cov, cons, sat
        """,
        # N4/N5: expected base domains by construction of each variant
        "base_domain": """
            WITH v AS (
              SELECT doc_id, 0 AS kind FROM documents
              UNION ALL SELECT doc_id, 1 FROM documents WHERE doc_id % 6 = 0
              UNION ALL SELECT doc_id, 2 FROM documents WHERE doc_id % 5 = 0
              UNION ALL SELECT doc_id, 3 FROM documents WHERE doc_id % 7 = 0
            )
            SELECT doc_id, kind,
                   CASE kind
                     WHEN 0 THEN 'example.com'
                     WHEN 1 THEN 'partner.org'
                     WHEN 2 THEN 'shop' || CAST(doc_id % 4 AS VARCHAR) || '.co.uk'
                     ELSE 'example.com' END AS base_dom,
                   kind IN (1, 2) AS is_ext
            FROM v
        """,
        "head_fingerprint": f"""
            WITH h AS (
              SELECT doc_id,
                (CASE WHEN doc_id % 4 = 0 THEN 'spark crawl ' ELSE '' END)
                  || repeat('t', 40 + CAST(doc_id % 35 AS INT)) AS title,
                repeat('d', 100 + CAST(doc_id % 120 AS INT)) AS description,
                CASE CAST(doc_id % 3 AS INT)
                  WHEN 0 THEN {_sql_url("doc_id")}
                  WHEN 1 THEN {_sql_url("doc_id")} || 'x'
                  ELSE '' END AS canonical,
                CASE WHEN doc_id % 5 = 0 THEN 'noindex,follow'
                     ELSE 'index,follow' END AS robots
              FROM documents
            )
            SELECT doc_id,
                   {_md5long_sql("title || '|' || description || '|' || canonical || '|' || robots")}
                   AS head_fp
            FROM h
        """,
        "max_links_trim": f"""
            WITH n AS (SELECT count(*) AS c FROM documents),
            links AS (
              SELECT doc_id, j, (doc_id * 3 + j) % (SELECT c FROM n) AS child
              FROM documents, (SELECT UNNEST([1, 2, 3]) AS j)
            ),
            scored AS (
              SELECT doc_id, j, child,
                     (CASE WHEN contains({_sql_url("child")}, 'docs') THEN 1 ELSE 0 END
                    + CASE WHEN contains({_sql_url("child")}, 'blog') THEN 1 ELSE 0 END) / 2.0 AS s
              FROM links
            )
            SELECT doc_id, j, child FROM (
              SELECT doc_id, j, child,
                     row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, j) AS rn
              FROM scored
            ) WHERE rn <= 2
        """,
        "cache_mode": """
            SELECT CAST(doc_id % 7 AS INT) AS bucket,
                   count(*) AS n,
                   CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cache_hits,
                   CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS live_fetches
            FROM documents GROUP BY 1
        """,
        "queue_stats": """
            SELECT 'd' || CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                                    ELSE doc_id % 7 END AS VARCHAR) AS domain,
                   count(*) AS queued,
                   max(200.0 - CAST(doc_id * 7 % 101 AS DOUBLE)) AS max_wait,
                   CAST(floor(avg(200.0 - CAST(doc_id * 7 % 101 AS DOUBLE)) * 1e6) AS BIGINT)
                     AS avg_wait_fp
            FROM documents GROUP BY 1
        """,
        "domain_map": """
            WITH merged AS (
              SELECT doc_id, 'sitemap' AS source FROM documents WHERE doc_id % 2 = 0
              UNION ALL
              SELECT doc_id, 'cc' FROM documents WHERE doc_id % 3 = 0
            ),
            dd AS (
              SELECT doc_id, source, row_number() OVER (
                PARTITION BY doc_id
                ORDER BY CASE WHEN source = 'sitemap' THEN 0 ELSE 1 END
              ) AS rk
              FROM merged
            )
            SELECT 'd' || CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                                    ELSE doc_id % 7 END AS VARCHAR)
                       || '.example.com' AS domain,
                   count(*) AS n_urls,
                   CAST(sum(CASE WHEN source = 'sitemap' THEN 1 ELSE 0 END) AS BIGINT) AS n_sitemap,
                   CAST(sum(CASE WHEN source = 'cc' THEN 1 ELSE 0 END) AS BIGINT) AS n_cc
            FROM dd WHERE rk = 1
            GROUP BY 1
        """,
        "image_resize": """
            SELECT 'img-' || CAST(i AS VARCHAR) AS image_id,
                   16 AS out_w, 12 AS out_h
            FROM range(60) t(i)
        """,
        # Full recursive replay of the composed AdaptiveCrawler loop:
        # per-round top-k selection (closed-form gain keys, see
        # q_adaptive_crawl), KB-order-dependent confidence stream, and
        # the stop decision — all hash-bound.
        "adaptive_crawl": """
            WITH RECURSIVE
            doc AS (
              SELECT i,
                     CASE WHEN i % 2 = 0 AND i > 0 THEN 1 ELSE 0 END AS a,
                     CASE WHEN i % 3 = 0 AND i > 0 THEN 1 ELSE 0 END AS b
              FROM range(40) t(i)
            ),
            -- pending entries encoded as sortable keys: (600 - gain*600)*1000 + i
            -- gain*600 = 150*(a+b) + 180/(3+a+b) + 120  (exact integers)
            rounds(r, kb, pending) AS (
              SELECT 0,
                     [CAST(0 AS BIGINT)],
                     list_sort(list_transform(
                       [CAST(1 AS BIGINT), 2, 3],
                       c -> (600 - (150*((CASE WHEN c % 2 = 0 THEN 1 ELSE 0 END)
                                        + (CASE WHEN c % 3 = 0 THEN 1 ELSE 0 END))
                                    + 180 // (3 + (CASE WHEN c % 2 = 0 THEN 1 ELSE 0 END)
                                                + (CASE WHEN c % 3 = 0 THEN 1 ELSE 0 END))
                                    + 120)) * 1000 + c))
              UNION ALL
              SELECT r + 1,
                     kb || list_transform(pending[1:3], x -> x % 1000),
                     list_sort(
                       pending[4:] ||
                       list_transform(
                         list_filter(
                           flatten(list_transform(
                             list_transform(pending[1:3], x -> x % 1000),
                             p -> [3*p + 1, 3*p + 2, 3*p + 3])),
                           c -> c < 40),
                         c -> (600 - (150*((CASE WHEN c % 2 = 0 THEN 1 ELSE 0 END)
                                          + (CASE WHEN c % 3 = 0 THEN 1 ELSE 0 END))
                                      + 180 // (3 + (CASE WHEN c % 2 = 0 THEN 1 ELSE 0 END)
                                                  + (CASE WHEN c % 3 = 0 THEN 1 ELSE 0 END))
                                      + 120)) * 1000 + c))
              FROM rounds
              WHERE r < 6 AND len(pending) > 0
            ),
            kb_docs AS (
              SELECT r.r,
                     CAST(u.o - 1 AS BIGINT) AS ord,
                     r.kb[u.o] AS i
              FROM rounds r
              CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(r.kb))) AS o) u
            ),
            kd AS (
              SELECT k.r, k.ord, k.i, d.a, d.b, 3 + d.a + d.b AS n_t
              FROM kb_docs k JOIN doc d USING (i)
            ),
            agg AS (
              SELECT r, count(*) AS n, sum(a) AS dfa, sum(b) AS dfb FROM kd GROUP BY r
            ),
            cov AS (
              SELECT r,
                     least(1.0, sqrt((
                       (CASE WHEN dfa > 0
                             THEN (dfa / CAST(n AS DOUBLE))
                                  * (1.0 + 0.5 * ln(1.0 + dfa) / ln(1.0 + n))
                             ELSE 0.0 END)
                     + (CASE WHEN dfb > 0
                             THEN (dfb / CAST(n AS DOUBLE))
                                  * (1.0 + 0.5 * ln(1.0 + dfb) / ln(1.0 + n))
                             ELSE 0.0 END)) / 2.0)) AS coverage
              FROM agg
            ),
            pairs AS (
              SELECT x.r,
                     (1 + x.a * y.a + x.b * y.b)
                       / CAST(x.n_t + y.n_t - (1 + x.a * y.a + x.b * y.b) AS DOUBLE) AS jac
              FROM kd x JOIN kd y ON x.r = y.r AND x.ord < y.ord
            ),
            con AS (
              SELECT a.r,
                     CASE WHEN a.n < 2 THEN 1.0
                          ELSE coalesce(p.s, 0.0) / (a.n * (a.n - 1) / 2.0)
                     END AS consistency
              FROM agg a LEFT JOIN (SELECT r, sum(jac) AS s FROM pairs GROUP BY r) p
                ON a.r = p.r
            ),
            nt AS (
              SELECT r, ord,
                     2 + (CASE WHEN ord = 0 THEN 1 ELSE 0 END)
                       + (CASE WHEN a = 1 AND ord = min(CASE WHEN a = 1 THEN ord END)
                                                 OVER (PARTITION BY r) THEN 1 ELSE 0 END)
                       + (CASE WHEN b = 1 AND ord = min(CASE WHEN b = 1 THEN ord END)
                                                 OVER (PARTITION BY r) THEN 1 ELSE 0 END)
                     AS nt
              FROM kd
            ),
            sat AS (
              SELECT a.r,
                     CASE WHEN a.n < 2 THEN 0.0
                     ELSE greatest(0.0, least(1.0,
                       1.0 - (CASE WHEN l.last_nt > 0 THEN l.last_nt ELSE 1 END)
                           / CAST(CASE WHEN l.first_nt > 0 THEN l.first_nt ELSE 1 END AS DOUBLE)))
                     END AS saturation
              FROM agg a JOIN (
                SELECT r, min_by(nt, ord) AS first_nt, max_by(nt, ord) AS last_nt
                FROM nt GROUP BY r
              ) l ON a.r = l.r
            ),
            conf AS (
              SELECT r.r,
                     a.n AS n_kb,
                     len(r.pending) AS n_pending,
                     c.coverage, o.consistency, s.saturation,
                     0.4 * c.coverage + 0.3 * o.consistency + 0.3 * s.saturation AS confidence
              FROM rounds r
              JOIN agg a ON a.r = r.r
              JOIN cov c ON c.r = r.r
              JOIN con o ON o.r = r.r
              JOIN sat s ON s.r = r.r
            ),
            flagged AS (
              SELECT *,
                     CASE WHEN confidence >= 0.5 THEN 'confidence'
                          WHEN n_kb >= 20 THEN 'max_pages'
                          WHEN n_pending = 0 THEN 'no_links'
                          WHEN saturation >= 0.8 THEN 'saturation'
                          WHEN r = 6 THEN 'max_depth'
                          ELSE '' END AS stop_reason
              FROM conf
            ),
            stop_at AS (
              SELECT coalesce(min(r), 6) AS sr FROM flagged WHERE stop_reason <> ''
            )
            SELECT CAST(r AS INT) AS round,
                   CAST(n_kb AS INT) AS n_kb,
                   CAST(n_pending AS BIGINT) AS n_pending,
                   round(coverage, 6) AS coverage,
                   round(consistency, 6) AS consistency,
                   round(saturation, 6) AS saturation,
                   round(confidence, 6) AS confidence,
                   stop_reason
            FROM flagged, stop_at
            WHERE r <= sr
            ORDER BY r
        """,
        # Derived-boolean oracle: predicts the decode verdicts from the
        # corruption arithmetic (tamper png rows i%11==0; caption i%7==3;
        # phash bit-flip i%5==2) — the Spark side measures them by
        # actually decoding the PNG bytes (q_image_validation docstring).
        "image_validation": """
            SELECT 'img-' || CAST(i AS VARCHAR) AS image_id,
                   NOT (i % 11 = 0 AND i % 3 <> 0) AS pixels_ok,
                   NOT (i % 7 = 3) AS caption_ok,
                   NOT (i % 5 = 2) AS phash_match,
                   (NOT (i % 11 = 0 AND i % 3 <> 0)
                    AND NOT (i % 7 = 3)
                    AND NOT (i % 5 = 2)) AS valid
            FROM range(60) t(i)
        """,
        "adaptive_rank_links": r"""
            WITH vocab AS (
              SELECT DISTINCT UNNEST(list_filter(
                string_split_regex(
                  regexp_replace(lower(text), '[^\w\s]', ' ', 'g'), '\s+'),
                x -> length(x) > 2)) AS term
              FROM documents
            ),
            lt AS (
              SELECT DISTINCT doc_id,
                UNNEST(list_filter(
                  string_split_regex(
                    regexp_replace(lower(substr(text, 1, 60)), '[^\w\s]', ' ', 'g'),
                    '\s+'),
                  x -> length(x) > 2)) AS term
              FROM documents WHERE doc_id % 5 <> 0
            ),
            nt AS (SELECT doc_id, count(*) AS n_t FROM lt GROUP BY doc_id),
            nq AS (
              SELECT doc_id, count(*) AS n_q FROM lt
              WHERE term IN ('data','spark','web') GROUP BY doc_id
            ),
            nn AS (
              SELECT doc_id, count(*) AS n_new FROM lt
              WHERE term NOT IN (SELECT term FROM vocab) GROUP BY doc_id
            ),
            base AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 0)
            SELECT b.doc_id,
                   CAST(floor((
                     0.5 * (coalesce(nq.n_q, 0) / 3.0)
                   + 0.3 * (CASE WHEN nt.n_t IS NULL OR nt.n_t = 0 THEN 0.5
                                 ELSE CAST(coalesce(nn.n_new, 0) AS DOUBLE) / nt.n_t END)
                   + 0.2 * 1.0) * 1e6) AS BIGINT) AS gain_fp
            FROM base b
            LEFT JOIN nt USING (doc_id)
            LEFT JOIN nq USING (doc_id)
            LEFT JOIN nn USING (doc_id)
        """,
    }


def _text_stats_sql() -> str:
    """DuckDB mirror of q_text_stats_suite: token count, quality
    fixed-point, language-ID (marker-hit argmax), stopword ratio and
    md5 fingerprint in one statement.  Float parenthesization mirrors
    the Column expressions exactly — addition/multiplication order
    matters for bit-equality."""
    from crawl4ai_spark.functions.text import LANG_MARKERS

    hit_exprs = {}
    for lang in sorted(LANG_MARKERS):
        terms = []
        for marker in LANG_MARKERS[lang]:
            m = marker.replace("'", "''")
            terms.append(
                f"(length(padded) - length(replace(padded, '{m}', ''))) / {len(marker)}.0"
            )
        hit_exprs[lang] = " + ".join(terms)
    # Spark's array_max over (hits, lang) structs: highest hits, ties →
    # lexicographically LARGEST lang
    langs_desc = sorted(LANG_MARKERS, reverse=True)
    case = "CASE "
    for lang in langs_desc[:-1]:
        case += f"WHEN h_{lang} = m THEN '{lang}' "
    case += f"ELSE '{langs_desc[-1]}' END"
    hits_cols = ", ".join(f"{e} AS h_{lang}" for lang, e in hit_exprs.items())
    greatest = "greatest(" + ", ".join(f"h_{lang}" for lang in hit_exprs) + ")"
    quality = r"""CAST(floor((
              0.4 * (CASE WHEN length(text) < 50 THEN length(text) / 50.0
                          WHEN length(text) > 10000 THEN 0.5 ELSE 1.0 END)
              + 0.3 * greatest(0.0, 1.0 -
                  ((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                     / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 5.0)
              + 0.3 * ((length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
                     / greatest(CAST(length(text) AS DOUBLE), 1.0))
            ) * 1e6) AS BIGINT)"""
    stop_ratio = f"""round(
              len(list_filter({_SQL_TOKS},
                  x -> list_contains(['the','and','of','to','in','a','is','it','for','on'], x)))
              * 1.0 / greatest(len({_SQL_TOKS}), 1), 6)"""
    # chunking mirrors (functions/chunking.py): case-preserving word
    # list; fixed-50 count/first-chunk fp, sliding(40,30) count with
    # the reference's leaked-index tail rule, overlapping(60,20) count
    first_chunk = "array_to_string(wlist[1:50], ' ')"
    n_sliding = """CASE WHEN nw <= 40 THEN 1 ELSE
              CAST(floor((nw - 40) / 30.0) AS INT) + 1 +
              (CASE WHEN ((nw - 40) - ((nw - 40) % 30) + 40) < nw
                    THEN 1 ELSE 0 END) END"""
    return f"""
        WITH base AS (
          SELECT doc_id, text, ' ' || lower(text) || ' ' AS padded,
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> '')
                   AS wlist
          FROM documents
        ),
        hits AS (
          SELECT doc_id, text, wlist, len(wlist) AS nw, {hits_cols} FROM base
        ),
        hm AS (
          SELECT *, {greatest} AS m FROM hits
        )
        SELECT doc_id,
               CAST(len({_SQL_TOKS}) AS INT) AS n_tokens,
               {quality} AS quality,
               CASE WHEN m > 0 THEN {case} ELSE 'und' END AS lang_pred,
               {stop_ratio} AS stop_ratio,
               {_md5long_sql('text')} AS fp,
               CAST(ceil(nw / 50.0) AS INT) AS n_chunks_fixed,
               CASE WHEN nw = 0 THEN NULL
                    ELSE {_md5long_sql(first_chunk)} END AS first_chunk_fp,
               {n_sliding} AS n_chunks_sliding,
               CASE WHEN nw <= 60 THEN 1
                    ELSE CAST(ceil((nw - 60) / 40.0) AS INT) + 1
               END AS n_chunks_overlap
        FROM hm
    """
