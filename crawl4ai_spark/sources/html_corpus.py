"""Deterministic synthetic RAW-HTML corpus — "fetched pages" as a
DataFrame, for the HTML-tier scrape operators.

``sources/corpus.py`` models the web as pages with PRE-EXTRACTED link
arrays; this module models the tier below it: the same graph (same
children / href-variant / external arithmetic — the two generators
share ``corpus``'s Column helpers) but serialized into actual HTML
that ``functions/scrape.py`` must parse back out.  That gives three
independent views of one spec:

  build_pages(n).links        what the page links to      (corpus.py)
  build_html_pages(n).html    the page itself             (this file)
  scrape_expected_sql(n)      what a correct scraper must
                              recover from the html       (DuckDB oracle)

so the driver's correctness gate binds the whole html→links/media/meta
path: the Spark side genuinely parses HTML (entities, <base href>,
nested text, dedupe, decoy anchors, image scoring); the oracle predicts
every output row from the construction arithmetic — the same derived-
oracle pattern as q_image_validation.

Page anatomy (everything pure integer arithmetic on doc_id ``i``):

- head: title ``doc-{i} [{sec}]``, meta description; ``og:title`` on
  i%7==0; ``<base href="https://d{dom}.example.com/">`` on i%11==0
  (a no-op for resolution — absolute + root-relative hrefs — so the
  base-override CODE PATH is exercised without forking the graph).
- links: one <a> per corpus child with the corpus href variants (the
  v2 tracking variant carries an entity-encoded ``&amp;fbclid=f{i}``
  so entity decoding is load-bearing; both params are dropped by both
  normalizers), a duplicate anchor (first-occurrence dedupe), the
  i%6==0 partner external, and decoys: ``javascript:``/``mailto:``
  (external per is_external_url's special-scheme rule).  A ``<a
  href="#">`` decoy is deliberately NOT emitted: it resolves to the
  page itself, adding a u→u edge the links-table corpus doesn't have —
  visible exactly when u is the crawl seed (the reference re-discovers
  seeds) — so '#'-resolution parity is pinned in tests/test_scrape.py
  instead of forking the shared graph here.
- media: a scored main image (kept iff width/height/alt arithmetic
  clears IMAGE_SCORE_THRESHOLD), an always-rejected icon decoy, a
  <picture>+srcset group on i%9==0 (variant expansion with widths),
  <video>+<source> on i%10==0, <audio> on i%15==0 — each wrapped in a
  <figure> with direct text so closest-parent descriptions are exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.sources.corpus import (
    DEFAULT_BRANCHING,
    _dom_idx_col,
    build_pages,
    canonical_url_col,
)

SECTIONS_SQL = "(['blog','docs','api','news','shop'])"


def _s(x) -> Column:
    return x if isinstance(x, Column) else F.lit(str(x))


def _cat(*parts) -> Column:
    return F.concat(*[_s(p) for p in parts])


def _html_href(parent: Column, child: Column, j: int) -> Column:
    """corpus._href_col variants, HTML-attribute flavor: v2 appends an
    entity-encoded second tracking param so the parser's entity
    decoding is observable (both params drop out in normalization)."""
    canon = canonical_url_col(child)
    v = (parent + j) % 4
    relative = F.substring_index(canon, ".example.com", -1)
    return (
        F.when(
            (v == 1) & (_dom_idx_col(parent) == _dom_idx_col(child)), relative
        )
        .when(v == 2, _cat(canon, "?utm_source=feed&amp;fbclid=f",
                           parent.cast("string")))
        .when(v == 3, _cat(canon, "#frag"))
        .otherwise(canon)
    )


def html_col(i: Column, n: int, branching: int = DEFAULT_BRANCHING) -> Column:
    """The page HTML as ONE Column expression (pure JVM concat — the
    generator itself never leaves codegen, so test corpora scale to any
    n without Python)."""
    dom = _cat("d", _dom_idx_col(i).cast("string"), ".example.com")
    sec = F.element_at(
        F.array(*[F.lit(s) for s in ["blog", "docs", "api", "news", "shop"]]),
        (i % 5 + 1).cast("int"),
    )
    si = i.cast("string")

    head = _cat(
        "<html><head><title>doc-", si, " [", sec, "]</title>",
        '<meta name="description" content="Synthetic ', sec, " page ", si,
        '">',
        F.when(i % 7 == 0,
               _cat('<meta property="og:title" content="OG doc-', si, '">')
               ).otherwise(F.lit("")),
        F.when(i % 11 == 0,
               _cat('<base href="https://', dom, '/">')).otherwise(F.lit("")),
        "</head><body><h1>doc-", si, "</h1>",
    )

    w = F.when(i % 2 == 0, F.lit("200")).otherwise(F.lit("80"))
    h = F.when(i % 3 == 0, F.lit("300")).otherwise(F.lit("100"))
    alt = F.when(i % 5 != 0, _cat("pic ", si)).otherwise(F.lit(""))
    media = _cat(
        '<div class="media">media context for doc ', si,
        '<img src="/img/doc-', (i % 499).cast("string"), '.png"',
        ' width="', w, '" height="', h, '" alt="', alt, '">',
        '<img src="/icons/logo-', si, '.png" alt="icon">', "</div>",
        F.when(i % 9 == 0, _cat(
            "<figure>gallery ", si,
            '<picture><source srcset="/big-', si, '.jpg 800w">',
            '<img srcset="/small-', si, '.jpg 400w" alt="pp ', si, '">',
            "</picture></figure>",
        )).otherwise(F.lit("")),
        F.when(i % 10 == 0, _cat(
            "<figure>clip ", si, '<video src="/v/', si, '.mp4">',
            '<source src="/v/', si, '.webm"></video></figure>',
        )).otherwise(F.lit("")),
        F.when(i % 15 == 0, _cat(
            "<figure>audio ", si, '<audio src="/a/', si,
            '.ogg"></audio></figure>',
        )).otherwise(F.lit("")),
    )

    children = [(i * branching + j) % n for j in range(1, branching + 1)]
    anchors = [
        _cat(
            '<li><a href="', _html_href(i, c, j + 1), '" title="t-',
            c.cast("string"), '">anchor ', si, " ", str(j + 1), "</a></li>",
        )
        for j, c in enumerate(children)
    ]
    dup = _cat('<li><a href="', _html_href(i, children[0], 1), '">dup ', si,
               "</a></li>")
    links = _cat("<ul>", *anchors, dup, "</ul>",
                 F.when(i % 6 == 0, _cat(
                     '<p>see <a href="https://ext', (i % 3).cast("string"),
                     ".partner.org/p/", si, '">partner ', si, "</a></p>",
                 )).otherwise(F.lit("")))

    table = F.when(i % 8 == 0, _cat(
        '<table id="t-', si, '"><caption>stats ', si, "</caption>",
        '<thead><tr><th>k</th><th colspan="2">v</th></tr></thead>',
        "<tbody><tr><td>a</td><td>", si, "</td><td>",
        (i % 7).cast("string"), "</td></tr>",
        "<tr><td>b</td><td>", (i * 2).cast("string"), "</td><td>",
        (i % 5).cast("string"), "</td></tr></tbody></table>",
    )).otherwise(F.lit(""))

    decoys = _cat(
        '<a href="javascript:void(0)">menu</a>',
        '<a href="mailto:contact@', dom, '">contact</a>',
    )
    return _cat(head, media, links, table, decoys, "</body></html>")


def build_html_pages(
    spark: SparkSession,
    n: int,
    branching: int = DEFAULT_BRANCHING,
    partitions: int | None = None,
) -> DataFrame:
    """build_pages + an ``html`` column serializing the same graph.
    The links column is kept so html-backed and links-backed paths can
    be compared row-for-row on identical inputs."""
    pages = build_pages(spark, n, branching, partitions)
    return pages.withColumn("html", html_col(F.col("doc_id"), n, branching))


# ---------------------------------------------------------------------------
# DuckDB oracle: expected scrape output, re-derived arithmetically
# ---------------------------------------------------------------------------

def _sql_canon(e: str) -> str:
    return (
        f"'https://d' || CAST(CASE WHEN ({e}) % 2 = 0 THEN 0 ELSE ({e}) % 7 END AS VARCHAR)"
        f" || '.example.com/' || {SECTIONS_SQL}[CAST(({e}) % 5 AS INT) + 1]"
        f" || '/' || CAST(2015 + ({e}) % 10 AS VARCHAR)"
        f" || '/doc-' || CAST({e} AS VARCHAR)"
        f" || (['.html','.pdf','.jpg',''])[CAST(({e}) % 4 AS INT) + 1]"
    )


def scrape_expected_sql(
    n: int | None, branching: int = DEFAULT_BRANCHING
) -> str:
    """SELECT (doc_id, kind, k1, k2, k3, k4, n1, n2, n3, flag) — every
    row ``with_scraped_page`` must recover from ``html_col``'s pages,
    predicted from the construction arithmetic alone (never by parsing
    HTML): links (children + partner + js/mailto decoys, dup dropped),
    kept images with score/width/group, video/audio rows, and head
    metadata.  ``n=None`` sizes the corpus from the driver's
    ``documents`` view (row_number, matching the Spark side's
    ``_docs().count()``), for the oracle_sql() entry."""
    canon_i = _sql_canon("i")
    canon_c = _sql_canon("child")
    if n is None:
        src = "SELECT row_number() OVER () - 1 AS i FROM documents"
        n_expr = "(SELECT COUNT(*) FROM documents)"
    else:
        src = f"SELECT i FROM range({n}) t(i)"
        n_expr = str(n)
    return f"""
    WITH pages AS (
      SELECT i,
             CAST(CASE WHEN i % 2 = 0 THEN 0 ELSE i % 7 END AS VARCHAR) AS dom,
             {SECTIONS_SQL}[CAST(i % 5 AS INT) + 1] AS sec,
             {canon_i} AS url
      FROM ({src}) t0
    ),
    kids AS (
      SELECT i, j, (i * {branching} + j) % {n_expr} AS child
      FROM pages, range(1, {branching + 1}) r(j)
    ),
    link_rows AS (
      -- children, document order; hrefs normalize to the child canon.
      -- n1 = floor(intrinsic·1e6), re-derived (utils.py:3344-3456):
      -- text 'anchor i j' = +1.5, https +0.5, title 't-c' +1 iff
      -- len>3 (c≥10), section path bonus (docs/api +2, blog/news +1),
      -- page-term overlap +1 iff str(i) is a ≥3-char term (i≥100:
      -- link word str(i) ∩ desc term str(i), ratio 1/min(2,10)·2)
      SELECT k.i AS doc_id, 'link' AS kind,
             {canon_c} AS k1,
             'anchor ' || k.i || ' ' || k.j AS k2,
             't-' || child AS k3,
             'example.com' AS k4,
             CAST(floor((2.0
               + (CASE WHEN child >= 10 THEN 1.0 ELSE 0 END)
               + (CASE CAST(child % 5 AS INT)
                    WHEN 1 THEN 2.0 WHEN 2 THEN 2.0
                    WHEN 0 THEN 1.0 WHEN 3 THEN 1.0
                    ELSE 0 END)
               + (CASE WHEN k.i >= 100 THEN 1.0 ELSE 0 END)) * 1e6)
               AS INT) AS n1,
             FALSE AS flag
      FROM kids k
      UNION ALL
      -- partner: text +1.5, depth 2 → +1, https +0.5 (+ overlap)
      SELECT i, 'link',
             'https://ext' || (i % 3) || '.partner.org/p/' || i,
             'partner ' || i, '', 'partner.org',
             CAST(floor((3.0
               + (CASE WHEN i >= 100 THEN 1.0 ELSE 0 END)) * 1e6)
               AS INT),
             TRUE
      FROM pages WHERE i % 6 = 0
      UNION ALL
      -- javascript:/mailto:: text +1, depth -2 → +1
      SELECT i, 'link', 'javascript:void(0)', 'menu', '', '',
             2000000, TRUE
      FROM pages
      UNION ALL
      SELECT i, 'link',
             'mailto:contact@d' || dom || '.example.com',
             'contact', '', '', 2000000, TRUE
      FROM pages
    ),
    image_rows AS (
      -- main image: kept iff score > 2 with score =
      -- (w>150) + (h>150) + (alt<>'') + position + png format
      SELECT i AS doc_id, 'image' AS kind,
             '/img/doc-' || (i % 499) || '.png' AS k1,
             CASE WHEN i % 5 <> 0 THEN 'pic ' || i ELSE '' END AS k2,
             'media context for doc ' || i AS k3,
             'png' AS k4,
             CAST(2 + CAST(i % 2 = 0 AS INT) + CAST(i % 3 = 0 AS INT)
                    + CAST(i % 5 <> 0 AS INT) AS INT) AS n1,
             CAST(NULL AS INT) AS n2,
             0 AS n3
      FROM pages
      WHERE (i % 2 = 0) OR (i % 3 = 0) OR (i % 5 <> 0)
      UNION ALL
      SELECT i, 'image', '/small-' || i || '.jpg', 'pp ' || i,
             'gallery ' || i, 'jpg', 4, 400, 2
      FROM pages WHERE i % 9 = 0
      UNION ALL
      SELECT i, 'image', '/big-' || i || '.jpg', 'pp ' || i,
             'gallery ' || i, 'jpg', 4, 800, 2
      FROM pages WHERE i % 9 = 0
    ),
    av_rows AS (
      SELECT i AS doc_id, 'video' AS kind, '/v/' || i || '.mp4' AS k1,
             CAST(NULL AS VARCHAR) AS k2, 'clip ' || i AS k3
      FROM pages WHERE i % 10 = 0
      UNION ALL
      SELECT i, 'video', '/v/' || i || '.webm', NULL, 'clip ' || i
      FROM pages WHERE i % 10 = 0
      UNION ALL
      SELECT i, 'audio', '/a/' || i || '.ogg', NULL, 'audio ' || i
      FROM pages WHERE i % 15 = 0
    ),
    table_rows AS (
      -- DefaultTableExtraction parity: colspan-expanded headers,
      -- td-only body rows, caption/id/metadata (table_extraction.py)
      SELECT i AS doc_id, 'table' AS kind,
             'k|v|v' AS k1,
             'a|' || i || '|' || (i % 7) AS k2,
             'stats ' || i AS k3,
             't-' || i AS k4,
             0 AS n1, 2 AS n2, 3 AS n3
      FROM pages WHERE i % 8 = 0
      UNION ALL
      SELECT i, 'table', 'k|v|v',
             'b|' || (i * 2) || '|' || (i % 5),
             'stats ' || i, 't-' || i, 1, 2, 3
      FROM pages WHERE i % 8 = 0
    ),
    meta_rows AS (
      SELECT i AS doc_id, 'meta' AS kind, 'title' AS k1,
             'doc-' || i || ' [' || sec || ']' AS k2
      FROM pages
      UNION ALL
      SELECT i, 'meta', 'description', 'Synthetic ' || sec || ' page ' || i
      FROM pages
      UNION ALL
      SELECT i, 'meta', 'og:title', 'OG doc-' || i
      FROM pages WHERE i % 7 = 0
    )
    SELECT doc_id, kind, k1, k2, k3, k4,
           n1, CAST(NULL AS INT) AS n2,
           CAST(NULL AS INT) AS n3, flag
    FROM link_rows
    UNION ALL
    SELECT doc_id, kind, k1, k2, k3, k4, n1, n2, n3, FALSE
    FROM image_rows
    UNION ALL
    SELECT doc_id, kind, k1, k2, k3, CAST(NULL AS VARCHAR),
           NULL, NULL, NULL, FALSE
    FROM av_rows
    UNION ALL
    SELECT doc_id, kind, k1, k2, k3, k4, n1, n2, n3, TRUE
    FROM table_rows
    UNION ALL
    SELECT doc_id, kind, k1, k2, CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), NULL, NULL, NULL, FALSE
    FROM meta_rows
    """


def markdown_expected_sql(branching: int = DEFAULT_BRANCHING) -> str:
    """q_markdown_gen oracle: the FULL raw / citations / references
    markdown strings of every html_col page, reconstructed from the
    construction arithmetic (markdown.py's documented rule set +
    the reference-exact citation algorithm, including fast_urljoin's
    naive base||path join for root-relative hrefs), then fingerprinted.
    Sized from the documents view like scrape_expected_sql(None)."""
    assert branching == 3, "oracle is specialized to branching=3"
    n_expr = "(SELECT COUNT(*) FROM documents)"
    nl = "chr(10)"
    nl2 = f"{nl} || {nl}"

    def md5fp(expr: str) -> str:
        return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"

    canon_c = _sql_canon("child")
    secs = "(['blog','docs','api','news','shop'])"
    exts = "(['.html','.pdf','.jpg',''])"
    # raw (entity-decoded) href per child — markdown uses it verbatim
    href = f"""CASE
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
      END"""

    # blocks
    alt = "CASE WHEN i % 5 <> 0 THEN 'pic ' || i ELSE '' END"
    raw = f"""
        '# doc-' || i
        || {nl2} || 'media context for doc ' || i
        || '![' || {alt} || '](/img/doc-' || (i % 499) || '.png)'
        || '![icon](/icons/logo-' || i || '.png)'
        || CASE WHEN i % 9 = 0 THEN {nl2} || 'gallery ' || i ELSE '' END
        || CASE WHEN i % 10 = 0 THEN {nl2} || 'clip ' || i ELSE '' END
        || CASE WHEN i % 15 = 0 THEN {nl2} || 'audio ' || i ELSE '' END
        || {nl2}
        || '* [anchor ' || i || ' 1](' || h1 || ' "t-' || c1 || '")' || {nl}
        || '* [anchor ' || i || ' 2](' || h2 || ' "t-' || c2 || '")' || {nl}
        || '* [anchor ' || i || ' 3](' || h3 || ' "t-' || c3 || '")' || {nl}
        || '* [dup ' || i || '](' || h1 || ')'
        || CASE WHEN i % 6 = 0 THEN {nl2} || 'see [partner ' || i
                || '](https://ext' || (i % 3) || '.partner.org/p/' || i || ')'
           ELSE '' END
        || CASE WHEN i % 8 = 0 THEN {nl2}
                || '| k | v |' || {nl} || '|---|---|' || {nl}
                || '| a | ' || i || ' | ' || (i % 7) || ' |' || {nl}
                || '| b | ' || (i * 2) || ' | ' || (i % 5) || ' |'
           ELSE '' END
        || {nl2} || '[menu](javascript:void(0))[contact](mailto:contact@d'
        || dom || '.example.com)'
    """
    cit = f"""
        '# doc-' || i
        || {nl2} || 'media context for doc ' || i
        || '![' || {alt} || '⟨1⟩]' || '![icon⟨2⟩]'
        || CASE WHEN i % 9 = 0 THEN {nl2} || 'gallery ' || i ELSE '' END
        || CASE WHEN i % 10 = 0 THEN {nl2} || 'clip ' || i ELSE '' END
        || CASE WHEN i % 15 = 0 THEN {nl2} || 'audio ' || i ELSE '' END
        || {nl2}
        || '* anchor ' || i || ' 1⟨3⟩' || {nl}
        || '* anchor ' || i || ' 2⟨4⟩' || {nl}
        || '* anchor ' || i || ' 3⟨5⟩' || {nl}
        || '* dup ' || i || '⟨3⟩'
        || CASE WHEN i % 6 = 0 THEN {nl2} || 'see partner ' || i || '⟨6⟩'
           ELSE '' END
        || CASE WHEN i % 8 = 0 THEN {nl2}
                || '| k | v |' || {nl} || '|---|---|' || {nl}
                || '| a | ' || i || ' | ' || (i % 7) || ' |' || {nl}
                || '| b | ' || (i * 2) || ' | ' || (i % 5) || ' |'
           ELSE '' END
        || {nl2} || 'menu⟨' || (6 + CAST(i % 6 = 0 AS INT))
        || '⟩contact⟨' || (7 + CAST(i % 6 = 0 AS INT)) || '⟩'
    """
    # references: citation urls AFTER fast_urljoin (root-relative v1
    # hrefs become pageurl||relpath — the reference's naive join)
    refs = f"""
        {nl2} || '## References' || {nl2}
        || '⟨1⟩ ' || url || '/img/doc-' || (i % 499) || '.png'
        || CASE WHEN i % 5 <> 0 THEN ': pic ' || i ELSE '' END || {nl}
        || '⟨2⟩ ' || url || '/icons/logo-' || i || '.png: icon' || {nl}
        || '⟨3⟩ ' || u1 || ': t-' || c1 || ' - anchor ' || i || ' 1' || {nl}
        || '⟨4⟩ ' || u2 || ': t-' || c2 || ' - anchor ' || i || ' 2' || {nl}
        || '⟨5⟩ ' || u3 || ': t-' || c3 || ' - anchor ' || i || ' 3' || {nl}
        || CASE WHEN i % 6 = 0 THEN '⟨6⟩ https://ext' || (i % 3)
                || '.partner.org/p/' || i || ': partner ' || i || {nl}
           ELSE '' END
        || '⟨' || (6 + CAST(i % 6 = 0 AS INT))
        || '⟩ javascript:void(0): menu' || {nl}
        || '⟨' || (7 + CAST(i % 6 = 0 AS INT))
        || '⟩ mailto:contact@d' || dom || '.example.com: contact' || {nl}
    """
    return f"""
    WITH pages AS (
      SELECT row_number() OVER () - 1 AS i FROM documents
    ),
    p2 AS (
      SELECT i,
             CAST(CASE WHEN i % 2 = 0 THEN 0 ELSE i % 7 END AS VARCHAR)
               AS dom,
             {_sql_canon("i")} AS url
      FROM pages
    ),
    kids AS (
      SELECT i, j, (i * 3 + j) % {n_expr} AS child
      FROM pages, range(1, 4) r(j)
    ),
    kh AS (
      SELECT i, j, child, {href} AS href FROM kids
    ),
    kk AS (
      SELECT i,
             MAX(CASE WHEN j = 1 THEN child END) AS c1,
             MAX(CASE WHEN j = 2 THEN child END) AS c2,
             MAX(CASE WHEN j = 3 THEN child END) AS c3,
             MAX(CASE WHEN j = 1 THEN href END) AS h1,
             MAX(CASE WHEN j = 2 THEN href END) AS h2,
             MAX(CASE WHEN j = 3 THEN href END) AS h3
      FROM kh GROUP BY i
    ),
    joined AS (
      SELECT p2.i, p2.dom, p2.url, kk.c1, kk.c2, kk.c3,
             kk.h1, kk.h2, kk.h3,
             CASE WHEN kk.h1 LIKE '/%' THEN p2.url || kk.h1 ELSE kk.h1 END AS u1,
             CASE WHEN kk.h2 LIKE '/%' THEN p2.url || kk.h2 ELSE kk.h2 END AS u2,
             CASE WHEN kk.h3 LIKE '/%' THEN p2.url || kk.h3 ELSE kk.h3 END AS u3
      FROM p2 JOIN kk ON p2.i = kk.i
    )
    SELECT i AS doc_id,
           {md5fp(f"({raw})")} AS raw_fp,
           {md5fp(f"({cit})")} AS cit_fp,
           {md5fp(f"({refs})")} AS ref_fp,
           CAST(7 + CAST(i % 6 = 0 AS INT) AS INT) AS n_refs
    FROM joined
    """
