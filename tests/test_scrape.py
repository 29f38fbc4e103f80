"""HTML-tier scrape parity — functions/scrape.py vs hand-derived
expectations mirroring the reference:

- full path  = WebScrapingStrategy._process_element
  (content_scraping_strategy.py:231-377) + process_image (:410-515)
  + extract_metadata_using_lxml (utils.py:1497-1581)
- quick path = quick_extract_links (utils.py:2416-2459)

plus the three-way corpus check (Spark UDF == pure-Python mirror ==
DuckDB arithmetic oracle over sources/html_corpus).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.scrape import (
    py_extract_metadata,
    py_quick_links,
    py_scrape_links,
    py_scrape_media,
    quick_links_udf,
    scrape_page_udf,
    with_scraped_page,
)
from crawl4ai_spark.sources.html_corpus import (
    build_html_pages,
    scrape_expected_sql,
)

URL = "https://www.example.com/docs/page1"

PAGE = """<html><head><title> My Page </title>
<meta name="description" content="A test page">
<meta property="og:title" content="OG Title">
<meta name="twitter:card" content="summary">
<meta property="article:author" content="arthur">
</head><body>
<div>image one context <img src="/img/a.png" width="200" height="300" alt="pic a"></div>
<img src="/icons/logo.png" alt="logo">
<img src="/x.png" style="width:1px;display:none">
<button><img src="/inbutton.png" alt="in button"></button>
<div class="nav-icon-bar"><img src="/navpic.png" alt="nav"></div>
<picture><source srcset="/big.webp 800w, /small.webp 400w"><img srcset="/b.jpg 700w" alt="respons"></picture>
<a href="/docs/x?utm_source=feed&amp;fbclid=z">Doc <b>X</b></a>
<a href="/docs/x">dup dropped</a>
<a href="https://other.org/page" title="Other">Ext</a>
<a href="#frag">self</a>
<a href="javascript:void(0)">js</a>
<a href="mailto:a@b.c">mail</a>
<a href="tel:+15551234">call</a>
<a href="">empty</a>
<a>no href</a>
<noscript><a href="/hidden">ns</a></noscript>
<script>var a = '<a href="/fake">not a link</a>';</script>
<video src="/v/1.mp4"><source src="/v/1.webm"></video>
</body></html>"""


def test_full_links_reference_semantics():
    links = py_scrape_links(URL, PAGE)
    by_href = {l["href"]: l for l in links}
    # normalize_url drops both tracking params (entity-decoded &amp;)
    assert "https://www.example.com/docs/x" in by_href
    doc_x = by_href["https://www.example.com/docs/x"]
    # nested text_content, stripped; dup anchor dropped (first wins)
    assert doc_x["text"] == "Doc X"
    assert not doc_x["is_external"]
    assert doc_x["base_domain"] == "example.com"
    # external: per-link base_domain
    ext = by_href["https://other.org/page"]
    assert ext["is_external"] and ext["base_domain"] == "other.org"
    assert ext["title"] == "Other"
    # '#frag' → the page itself, fragment dropped (internal self-link)
    assert "https://www.example.com/docs/page1" in by_href
    # javascript:/mailto:/tel: survive the full path as externals with
    # empty base_domain (is_external_url special-scheme rule)
    for scheme_href in ("javascript:void(0)", "mailto:a@b.c",
                        "tel:+15551234"):
        assert by_href[scheme_href]["is_external"]
        assert by_href[scheme_href]["base_domain"] == ""
    # empty href / no href / <noscript> / <script> content never emit
    assert not any("hidden" in h or "fake" in h for h in by_href)
    assert len(links) == 6


def test_quick_links_skips_and_truncates():
    links = py_quick_links(URL, PAGE)
    hrefs = [l["href"] for l in links]
    # deep normalizer keeps path, drops utm_source+fbclid; skips
    # '#'/javascript:/mailto:/tel: entirely
    assert hrefs == [
        "https://www.example.com/docs/x",
        "https://other.org/page",
        "https://www.example.com/hidden",  # noscript NOT removed (quick)
    ]
    long_text = "<a href='/y'>" + "word " * 100 + "</a>"
    # attribute in single quotes — parser handles both
    out = py_quick_links(URL, f"<html><body>{long_text}</body></html>")
    assert len(out[0]["text"]) == 200


def test_base_href_full_vs_quick():
    """Full path: raw <base href> REPLACES the resolution base
    (content_scraping_strategy.py:245-252).  Quick path: urljoin'd
    (utils.py:2437-2449), base_domain stays anchored to the page."""
    html = (
        '<html><head><base href="/sub/dir/"></head><body>'
        '<a href="rel.html">r</a></body></html>'
    )
    full = py_scrape_links(URL, html)
    # raw base "/sub/dir/" as base_url → urljoin("/sub/dir/", "rel.html")
    # — scheme-less, exactly what the reference produces here
    assert full[0]["href"] == "/sub/dir/rel.html"
    quick = py_quick_links(URL, html)
    # urljoin(page, "/sub/dir/") → https://www.example.com/sub/dir/
    assert quick[0]["href"] == "https://www.example.com/sub/dir/rel.html"


def test_exclude_options():
    html = (
        '<html><body><a href="https://other.org/a">x</a>'
        '<a href="https://x.com/t">tw</a>'
        '<a href="/in">in</a></body></html>'
    )
    no_ext = py_scrape_links(URL, html, exclude_external_links=True)
    assert [l["href"] for l in no_ext] == ["https://www.example.com/in"]
    no_social = py_scrape_links(URL, html, exclude_social_media_links=True)
    assert "https://x.com/t" not in [l["href"] for l in no_social]
    assert "https://other.org/a" in [l["href"] for l in no_social]
    no_dom = py_scrape_links(URL, html, exclude_domains={"other.org"})
    assert "https://other.org/a" not in [l["href"] for l in no_dom]


def test_image_scoring_gates():
    m = py_scrape_media(URL, PAGE)
    srcs = [i["src"] for i in m["images"]]
    # icon/display:none/button-parent/icon-class-parent all rejected
    for bad in ("/icons/logo.png", "/x.png", "/inbutton.png", "/navpic.png"):
        assert bad not in srcs
    main = next(i for i in m["images"] if i["src"] == "/img/a.png")
    # w>150, h>150, alt, position, png format → 5
    assert main["score"] == 5 and main["format"] == "png"
    assert main["desc"] == "image one context"
    assert main["group_id"] == 0
    # picture group: img srcset + <source> srcset variants, widths kept
    pic = [i for i in m["images"] if i["group_id"] == 5]
    assert [(i["src"], i["width"]) for i in pic] == [
        ("/b.jpg", 700), ("/big.webp", 800), ("/small.webp", 400),
    ]
    # score: alt + jpg-format + srcset + picture (idx 5/6 → no position)
    assert all(i["score"] == 4 for i in pic)


def test_image_threshold_and_datasrc():
    html = (
        '<html><body><div>ctx words<img src="/plain.png"></div>'
        '<img data-src="https://cdn.example.com/lazy.webp" alt="lazy">'
        '</body></html>'
    )
    m = py_scrape_media(URL, html)
    # plain.png: position+format = 2, NOT > threshold 2 → rejected
    srcs = [i["src"] for i in m["images"]]
    assert "/plain.png" not in srcs
    # data-src variant: alt+format+... = position is idx1/2 → 0;
    # alt(1)+webp(1) = 2 → also rejected at default threshold
    assert srcs == []
    # threshold 1 admits both
    m1 = py_scrape_media(URL, html, image_score_threshold=1)
    assert [i["src"] for i in m1["images"]] == [
        "/plain.png", "https://cdn.example.com/lazy.webp",
    ]


def test_video_audio_source_rows():
    m = py_scrape_media(URL, PAGE)
    assert [(v["src"]) for v in m["videos"]] == ["/v/1.mp4", "/v/1.webm"]
    html = '<figure>a clip<audio src="/a.ogg"><source src="/a.mp3"></audio></figure>'
    m2 = py_scrape_media(URL, f"<html><body>{html}</body></html>")
    assert [(a["src"], a["desc"]) for a in m2["audios"]] == [
        ("/a.ogg", "a clip"), ("/a.mp3", "a clip"),
    ]


def test_metadata_extraction():
    meta = py_extract_metadata(PAGE)
    assert meta["title"] == "My Page"
    assert meta["description"] == "A test page"
    assert meta["og:title"] == "OG Title"
    assert meta["twitter:card"] == "summary"
    assert meta["article:author"] == "arthur"
    assert meta["keywords"] is None and meta["author"] is None
    # title fallback: og:title, then twitter:title
    og = '<html><head><meta property="og:title" content="OGT"></head><body></body></html>'
    assert py_extract_metadata(og)["title"] == "OGT"
    no_head = "<div>nothing</div>"
    assert py_extract_metadata(no_head) == {}
    assert py_scrape_links(URL, None) == []
    assert py_quick_links(URL, "") == []


# ---------------------------------------------------------------------------
# corpus three-way: Spark UDF == python mirror == DuckDB oracle
# ---------------------------------------------------------------------------

N = 60
COLS = ["doc_id", "kind", "k1", "k2", "k3", "k4", "n1", "n2", "n3", "flag"]


def _suite_rows_from_scraped(rows) -> pd.DataFrame:
    got = []
    for r in rows:
        i, s = r["doc_id"], r["scraped"]
        for l in s["links"]:
            got.append((i, "link", l["href"], l["text"], l["title"],
                        l["base_domain"],
                        int(l["intrinsic_score"] * 1e6 // 1),
                        None, None, l["is_external"]))
        for im in s["media"]["images"]:
            got.append((i, "image", im["src"], im["alt"], im["desc"],
                        im["format"], im["score"], im["width"],
                        im["group_id"], False))
        for v in s["media"]["videos"]:
            got.append((i, "video", v["src"], v["alt"], v["desc"],
                        None, None, None, None, False))
        for a in s["media"]["audios"]:
            got.append((i, "audio", a["src"], a["alt"], a["desc"],
                        None, None, None, None, False))
        for t in s["media"]["tables"]:
            for ridx, r in enumerate(t["rows"]):
                got.append((i, "table", "|".join(t["headers"]),
                            "|".join(r), t["caption"], t["table_id"],
                            ridx, t["row_count"], t["column_count"],
                            t["has_headers"]))
        for k, v in s["metadata"].items():
            got.append((i, "meta", k, v, None, None, None, None, None,
                        False))
    return pd.DataFrame(got, columns=COLS)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[COLS].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(COLS).reset_index(drop=True)


def test_corpus_scrape_matches_arithmetic_oracle(spark):
    pages = build_html_pages(spark, N)
    rows = (
        with_scraped_page(pages, score_links=True, table_extraction=True)
        .select("doc_id", "scraped")
        .collect()
    )
    got = _canon(_suite_rows_from_scraped(rows))
    want = _canon(duckdb.sql(scrape_expected_sql(N)).df())
    assert len(got) == len(want)
    assert (got.values == want.values).all()


def test_corpus_udf_matches_python_mirror(spark):
    pages = build_html_pages(spark, N).select("doc_id", "url", "html")
    udf_rows = pages.withColumn(
        "ql", quick_links_udf(F.col("url"), F.col("html"))
    ).collect()
    for row in udf_rows:
        exp = py_quick_links(row["url"], row["html"])
        got = [
            {"href": x["href"], "text": x["text"],
             "is_external": x["is_external"]}
            for x in row["ql"]
        ]
        assert got == exp, row["doc_id"]


def test_intrinsic_score_reference_parity():
    """py_intrinsic_score vs hand-computed utils.py:3344-3456 cases,
    plus py_page_context's term harvest and the score_links wiring."""
    from crawl4ai_spark.functions.scrape import (
        py_intrinsic_score,
        py_page_context,
    )
    from crawl4ai_spark.functions.html_dom import parse_html

    ctx = {"terms": set(), "is_docs_site": False}
    # nav class +1.5, good rel +1, good path +2, depth<=2 +1,
    # https +.5, text>3 +1, 2 words +.5 → 7.5
    assert py_intrinsic_score(
        "User Guide", "https://a.io/docs/x", "", "main-nav", "next", ctx
    ) == pytest.approx(7.5)
    # bad class -1, bad rel -.5, bad path -1.5, generic text -1,
    # depth<=2 +1, text 'read more' >3 +1 +.5 words → -0.5 → clamp 0
    assert py_intrinsic_score(
        "read more", "http://a.io/admin/x", "", "ad-banner", "nofollow",
        ctx,
    ) == 0.0
    # title>3 +1; deep url (>5) -0.5; 4 words +1+0.5+0.5
    assert py_intrinsic_score(
        "a long link label", "http://a.io/a/b/c/d/e/f", "titled", "", "",
        ctx,
    ) == pytest.approx(1 - 0.5 + 2 + 0)
    # overlap: 2 of 3 link words in terms → (2/3)*2
    ctx2 = {"terms": {"spark", "engine"}, "is_docs_site": False}
    got = py_intrinsic_score(
        "spark engine rocks", "https://a.io/", "", "", "", ctx2
    )
    base = 1.0 + 0.5 + 1.0 + 0.5  # depth+https+len+2words... 3 words
    assert got == pytest.approx(base + (2 / 3) * 2.0)
    # docs site bonus keys off link text keywords
    ctx3 = {"terms": set(), "is_docs_site": True}
    assert py_intrinsic_score(
        "api reference", "https://docs.a.io/", "", "", "", ctx3
    ) == pytest.approx(1 + 0.5 + 1 + 0.5 + 1.0)

    html = ('<html><head><title>Spark Engine Docs</title>'
            '<meta name="description" content="fast data engine"></head>'
            '<body><h2>engine internals</h2></body></html>')
    c = py_page_context(parse_html(html), "https://docs.example.com/x")
    assert c["is_docs_site"]
    assert {"spark", "engine", "docs", "fast", "data", "internals"} <= \
        c["terms"]

    # wiring: score_links=True fills intrinsic_score, default leaves 0
    page = ('<html><head><title>alpha beta</title></head><body>'
            '<a href="/docs/a" title="long title">alpha guide</a>'
            '</body></html>')
    scored = py_scrape_links("https://e.com/p", page, score_links=True)
    assert scored[0]["intrinsic_score"] > 0
    plain = py_scrape_links("https://e.com/p", page)
    assert plain[0]["intrinsic_score"] == 0.0


def test_cleaned_html_pipeline():
    """py_cleaned_html vs the _scrap cleaning pipeline
    (content_scraping_strategy.py:615-905): removals, only_text,
    base64 cleanup, empty-element pruning, attribute stripping, and
    the deepcopy-before-cleaning css_selector quirk."""
    from crawl4ai_spark.functions.scrape import py_cleaned_html

    html = """<html><head><title>t</title><style>.x{}</style></head><body>
<nav class="topnav" style="color:red" onclick="x()">menu items here</nav>
<div><p>Real paragraph with several words.</p><span></span></div>
<img src="data:image/png;base64,AAAA" alt="inline">
<b>bold words</b>
<form><input name="q"></form>
<script>var x=1;</script>
</body></html>"""
    out = py_cleaned_html("u", html)
    # style/script gone; style/onclick attrs stripped, class kept
    assert "<style>" not in out and "var x" not in out
    assert 'class="topnav"' in out and "onclick" not in out
    # base64 src emptied; empty span pruned; form survives by default
    assert 'src=""' in out and "<span>" not in out
    assert "<form>" in out and 'name="q"' not in out  # name not important

    opts = py_cleaned_html(
        "u", html, excluded_tags=("nav",), only_text=True,
        remove_forms=True,
    )
    assert "topnav" not in opts and "<form>" not in opts
    assert "<span>bold words</span>" in opts  # only_text b→span

    # css_selector: selected content is DEEPCOPIED before cleaning, so
    # it keeps what body-side cleaning would remove (reference quirk)
    sel = py_cleaned_html("u", html, css_selector="div")
    assert sel.startswith("<div>") and "<span></span>" in sel

    # target_elements compose with word_count pruning
    tgt = py_cleaned_html("u", html, target_elements=["p"])
    assert tgt == "<div><p>Real paragraph with several words.</p></div>"

    # empty-element threshold: 3-word floor prunes short blocks
    short = "<html><body><div>tiny</div><p>longer text here ok</p></body></html>"
    pruned = py_cleaned_html("u", short, word_count_threshold=3)
    assert "tiny" not in pruned and "longer text" in pruned


def test_dom_implicit_close_recovery():
    """Real-web malformed markup: unclosed <li>/<p>/table cells become
    SIBLINGS (browser/lxml recovery), not a nesting chain — so link
    texts and table rows extract correctly from tag-soup pages."""
    from crawl4ai_spark.functions.html_dom import parse_html
    from crawl4ai_spark.functions.tables import DefaultTableExtraction

    soup = """<html><body>
    <ul><li><a href="/a">first</a><li><a href="/b">second</a></ul>
    <p>one<p>two
    <table><tr><td>x<td>y<tr><td>z<td>w</table>
    </body></html>"""
    links = py_scrape_links("https://e.com/", soup)
    # nested-li parsing would glue 'second' into the first anchor text
    assert [(l["href"], l["text"]) for l in links] == [
        ("https://e.com/a", "first"), ("https://e.com/b", "second"),
    ]
    root = parse_html(soup)
    ul = root.find("ul")
    assert sum(
        1 for c in ul.children if not isinstance(c, str) and c.tag == "li"
    ) == 2
    ps = list(root.iter("p"))
    assert [p.text_content().strip() for p in ps][:2] == ["one", "two"]
    # tag-soup table still yields 2x2 rows
    (t,) = DefaultTableExtraction(table_score_threshold=4).extract_tables(
        root
    )
    assert t["rows"] == [["x", "y"], ["z", "w"]]
