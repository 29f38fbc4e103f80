"""Markdown generation (functions/markdown.py): converter rule set,
reference-exact citations (markdown_generation_strategy.py:82-147),
PruningContentFilter scoring (content_filter_strategy.py:541-806), and
the corpus fingerprint three-way vs the arithmetic oracle."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.markdown import (
    DefaultMarkdownGenerator,
    PruningContentFilter,
    convert_links_to_citations,
    fast_urljoin,
    html_to_markdown,
    with_markdown,
)
from crawl4ai_spark.sources.html_corpus import (
    build_html_pages,
    markdown_expected_sql,
)


def test_converter_core_elements():
    html = """<html><body>
    <h1>Title</h1><h3>Sub</h3>
    <p>Some <b>bold</b> and <em>italic</em> and <code>x=1</code>.</p>
    <p>A <a href="/rel" title="T">link</a> and <img src="/i.png" alt="pic">.</p>
    <ul><li>one</li><li>two<ul><li>nested</li></ul></li></ul>
    <ol><li>first</li><li>second</li></ol>
    <blockquote><p>quoted</p></blockquote>
    <pre>  code block  </pre>
    <hr>
    <table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>
    </body></html>"""
    md = html_to_markdown(html)
    assert "# Title" in md and "### Sub" in md
    assert "Some **bold** and *italic* and `x=1`." in md
    assert '[link](/rel "T")' in md and "![pic](/i.png)" in md
    assert "* one\n* two\n  * nested" in md
    assert "1. first\n2. second" in md
    assert "> quoted" in md
    assert "```\n  code block  \n```" in md  # pre strips newlines only
    assert "---" in md
    assert "| a | b |\n|---|---|\n| 1 | 2 |" in md
    # head/script/style/video content never leaks
    noisy = ("<html><head><title>t</title><style>.x{}</style></head>"
             "<body><script>var a;</script><video src='/v'></video>"
             "<p>real</p></body></html>")
    assert html_to_markdown(noisy) == "real"


def test_citations_reference_parity():
    md = ('See [Alpha](https://a.org "A") and [Beta](/b) and '
          '![img](/i.png) and [Alpha](https://a.org "A") again.')
    cit, refs = convert_links_to_citations(md, "https://base.org/page")
    # first-occurrence numbering; repeat reuses the number
    assert cit == ("See Alpha⟨1⟩ and Beta⟨2⟩ and ![img⟨3⟩] and "
                   "Alpha⟨1⟩ again.")
    assert refs == ("\n\n## References\n\n"
                    "⟨1⟩ https://a.org: A - Alpha\n"
                    "⟨2⟩ https://base.org/page/b: Beta\n"
                    "⟨3⟩ https://base.org/page/i.png: img\n")
    # no base_url → relative urls kept verbatim
    cit2, refs2 = convert_links_to_citations("[x](/y)")
    assert "⟨1⟩ /y: x" in refs2
    # title == text → single desc
    _, refs3 = convert_links_to_citations('[T](https://t.io "T")')
    assert refs3.endswith("⟨1⟩ https://t.io: T\n")


def test_fast_urljoin_quirks():
    # reference parity: absolute path naively appended to a non-slash
    # base (markdown_generation_strategy.py:18-22)
    assert fast_urljoin("https://a.org/deep/page", "/x") == \
        "https://a.org/deep/page/x"
    assert fast_urljoin("https://a.org/", "/x") == "https://a.org/x"
    assert fast_urljoin("https://a.org/d/", "rel") == "https://a.org/d/rel"
    assert fast_urljoin("https://a.org", "https://b.org/p") == \
        "https://b.org/p"
    assert fast_urljoin("https://a.org", "//cdn.org/p") == "//cdn.org/p"


def test_pruning_filter_fixed_threshold():
    html = """<body>
    <article>This is a long paragraph of real content with many words
    that should comfortably survive pruning because its text density is
    high and it has no links at all in it.</article>
    <div class="sidebar-ads"><a href="/x">ad</a></div>
    <ul><li><a href="/1">l1</a></li><li><a href="/2">l2</a></li></ul>
    </body>"""
    blocks = PruningContentFilter(threshold=0.48).filter_content(html)
    joined = " ".join(blocks)
    assert "real content" in joined
    assert "sidebar-ads" not in joined  # negative class + link-only
    assert "/1" not in joined           # link list pruned
    # min_word_threshold: short nodes get guaranteed removal
    few = PruningContentFilter(
        threshold=0.0, min_word_threshold=50
    ).filter_content(html)
    assert few == []


def test_pruning_preserve_and_dynamic():
    html = ('<body><nav>gone</nav>'
            '<div class="keepme"><a href="/x">y</a></div>'
            '<p>Plain paragraph with enough words to stand alone '
            'and a decent text ratio overall.</p></body>')
    # excluded tags removed before scoring
    out = PruningContentFilter(threshold=0.0).filter_content(html)
    assert not any("gone" in b for b in out)
    # at 0.48 the link-only div is pruned; preserve_classes rescues it
    # (preservation guards nodes reached during recursion — a body-level
    # wipeout at an absurd threshold removes everything, as in the
    # reference)
    pruned = PruningContentFilter(threshold=0.48).filter_content(html)
    assert not any("keepme" in b for b in pruned)
    kept = PruningContentFilter(
        threshold=0.48, preserve_classes=["keepme"]
    ).filter_content(html)
    assert any("keepme" in b for b in kept)
    # dynamic threshold runs (p gets the 0.8 importance discount)
    dyn = PruningContentFilter(
        threshold=0.48, threshold_type="dynamic"
    ).filter_content(html)
    assert any("Plain paragraph" in b for b in dyn)


def test_generator_composition(spark):
    gen = DefaultMarkdownGenerator(
        content_filter=PruningContentFilter(threshold=0.48)
    )
    html = ('<body><h2>H</h2><p>Body text with enough words to '
            'survive the pruning filter easily here.</p>'
            '<ul><li><a href="/a">a</a></li></ul></body>')
    r = gen.generate_markdown(html, "https://s.io/p")
    assert r["raw_markdown"].startswith("## H")
    assert "⟨1⟩" in r["markdown_with_citations"]
    assert r["references_markdown"].startswith("\n\n## References")
    assert "Body text" in r["fit_markdown"]
    assert "[a](/a)" not in r["fit_markdown"]  # link list pruned


N = 60


def _py_fp(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_corpus_markdown_matches_arithmetic_oracle(spark):
    rows = build_html_pages(spark, N).select("doc_id", "url", "html").collect()
    gen = DefaultMarkdownGenerator()
    got = []
    for r in rows:
        m = gen.generate_markdown(r["html"], r["url"])
        got.append((
            r["doc_id"], _py_fp(m["raw_markdown"]),
            _py_fp(m["markdown_with_citations"]),
            _py_fp(m["references_markdown"]),
            m["references_markdown"].count("⟨"),
        ))
    gdf = pd.DataFrame(
        got, columns=["doc_id", "raw_fp", "cit_fp", "ref_fp", "n_refs"]
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM range({N}) t(doc_id)")
    odf = con.sql(markdown_expected_sql()).df()
    m = gdf.merge(odf, on="doc_id", suffixes=("_g", "_o"))
    for c in ("raw_fp", "cit_fp", "ref_fp", "n_refs"):
        assert (m[f"{c}_g"].astype("int64") ==
                m[f"{c}_o"].astype("int64")).all(), c


def test_markdown_udf_single_crossing(spark):
    pages = build_html_pages(spark, N).select("doc_id", "url", "html")
    df = with_markdown(pages)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count("ArrowEvalPython (") == 1, plan
    out = df.select("doc_id", "markdown.raw_markdown").limit(2).collect()
    assert all(r["raw_markdown"].startswith("# doc-") for r in out)


def test_bm25_okapi_matches_reference_algorithm():
    """bm25_okapi_scores vs hand-computed rank_bm25 BM25Okapi values
    (k1=1.5, b=0.75, epsilon=0.25)."""
    import math

    from crawl4ai_spark.functions.markdown import bm25_okapi_scores

    corpus = [["spark", "engine", "fast"], ["slow", "engine"],
              ["spark", "spark", "jobs"]]
    scores = bm25_okapi_scores(corpus, ["spark"])
    # df(spark)=2, N=3 → idf = ln(3-2+0.5) - ln(2+0.5) = ln(1.5/2.5)
    # < 0 → floored to eps*avg_idf
    idfs = {
        "spark": math.log(1.5) - math.log(2.5),
        "engine": math.log(1.5) - math.log(2.5),
        "fast": math.log(2.5) - math.log(1.5),
        "slow": math.log(2.5) - math.log(1.5),
        "jobs": math.log(2.5) - math.log(1.5),
    }
    avg = sum(idfs.values()) / 5
    floor = 0.25 * avg
    avgdl = 8 / 3
    def okapi(f, dl):
        return floor * (f * 2.5) / (f + 1.5 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert scores[0] == pytest.approx(okapi(1, 3))
    assert scores[1] == 0.0
    assert scores[2] == pytest.approx(okapi(2, 3))


def test_bm25_content_filter():
    from crawl4ai_spark.functions.markdown import (
        BM25ContentFilter,
        clean_tokens,
        extract_text_chunks,
    )
    from crawl4ai_spark.functions.html_dom import parse_html

    html = """<html><head><title>spark engine guide</title></head><body>
    <h1>Spark engine internals</h1>
    <p>The spark engine schedules jobs across executors with
    speculative retries and whole-stage codegen for engine speed.</p>
    <p>Cookie policy and unrelated legal boilerplate text lives in this
    completely different paragraph about privacy terms.</p>
    </body></html>"""
    blocks = BM25ContentFilter(bm25_threshold=0.1).filter_content(html)
    joined = " ".join(blocks)
    assert "spark engine schedules" in joined.replace("  ", " ") or any(
        "schedules" in b for b in blocks
    )
    assert not any("privacy" in b for b in blocks)
    # h1 gets the 5.0 priority boost → surfaces even at higher threshold
    hi = BM25ContentFilter(bm25_threshold=0.3).filter_content(html)
    assert any("<h1>" in b for b in hi)
    # no query and no metadata → []
    assert BM25ContentFilter().filter_content("<body><div>x</div></body>") == []
    # user_query drives scoring; min_word_threshold drops the 3-word
    # h1 so only 2 chunks remain — and at N=2, df=1 gives idf=0
    # (faithful BM25Okapi), so the threshold must admit score 0
    uq = BM25ContentFilter(
        user_query="privacy terms", bm25_threshold=0.0
    ).filter_content(html, min_word_threshold=5)
    assert any("privacy" in b for b in uq)
    assert not any("<h1>" in b for b in uq)  # min_word_threshold
    # clean_tokens parity spot checks
    assert clean_tokens(["the", "spark", "engine", "up", "↑x", "ab"]) == [
        "spark", "engine",
    ]
    # chunk extraction: inline tags glue, blocks split, headers tagged
    root = parse_html(
        "<body><h2>Head<b>er</b></h2><div>one <span>two</span></div></body>"
    )
    chunks = extract_text_chunks(root.find("body"))
    # faithful reference quirk: stripped strings GLUE with no
    # separator ("one " + "two" → "onetwo", ''.join at :232)
    assert [(c[1], c[2]) for c in chunks] == [
        ("Header", "header"), ("onetwo", "content"),
    ]


def test_fit_markdown_with_bm25_filter():
    from crawl4ai_spark.functions.markdown import BM25ContentFilter

    gen = DefaultMarkdownGenerator(
        content_filter=BM25ContentFilter(bm25_threshold=0.1),
        content_source="raw_html",
    )
    html = """<html><head><title>data pipelines</title></head><body>
    <p>Building data pipelines with distributed processing engines and
    columnar formats for pipelines at scale.</p>
    <p>Weather report tomorrow sunny intervals with light winds.</p>
    <nav>home about contact sitemap login register</nav>
    </body></html>"""
    r = gen.generate_markdown(html, "https://e.io/p")
    assert "pipelines" in r["fit_markdown"]
    assert "sitemap login" not in r["fit_markdown"]
    assert "Weather" not in r["fit_markdown"]


def test_content_source_fit_html():
    from crawl4ai_spark.functions.markdown import BM25ContentFilter

    html = """<html><head><title>data pipelines</title></head><body>
    <p>Building data pipelines with distributed processing engines and
    columnar formats for pipelines at scale.</p>
    <p>Weather report tomorrow sunny intervals with light winds.</p>
    <nav>home about contact sitemap login register</nav>
    </body></html>"""
    gen = DefaultMarkdownGenerator(
        content_filter=BM25ContentFilter(bm25_threshold=0.1),
        content_source="fit_html",
    )
    r = gen.generate_markdown(html, "https://e.io/p")
    # raw markdown now comes FROM the filtered blocks
    assert "pipelines" in r["raw_markdown"]
    assert "Weather" not in r["raw_markdown"]
    with pytest.raises(ValueError, match="content_filter"):
        DefaultMarkdownGenerator(content_source="fit_html")
    with pytest.raises(ValueError, match="content_source"):
        DefaultMarkdownGenerator(content_source="nope")
