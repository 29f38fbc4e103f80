"""Composed link-preview operator (reference link_preview.py):
filter → truncate-then-dedupe → head join → BM25 contextual →
total_score → relevance sort."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.link_preview import link_preview


@pytest.fixture(scope="module")
def pages(spark):
    def link(h, ext=False):
        return {"href": h, "is_external": ext}

    rows = [
        (
            "https://s.com/a",
            [
                link("https://s.com/one"),
                link("https://s.com/two"),
                link("https://ext.org/x", True),
                link("https://s.com/one"),      # duplicate
                link("https://s.com/three"),
                link("https://s.com/four"),
            ],
        ),
        ("https://s.com/b", [link("https://s.com/two"), link("https://s.com/nohead")]),
    ]
    return spark.createDataFrame(
        rows, "url string, links array<struct<href:string,is_external:boolean>>"
    )


@pytest.fixture(scope="module")
def heads(spark):
    rows = [
        ("https://s.com/one", "spark data engine", "all about spark jobs", "spark"),
        ("https://s.com/two", "cooking recipes", "pasta and pizza", "food"),
        ("https://s.com/three", "spark spark spark", "spark only", "spark"),
        ("https://s.com/four", "misc", "nothing relevant", ""),
        ("https://ext.org/x", "external spark page", "spark here too", "spark"),
    ]
    return spark.createDataFrame(
        rows, "url string, title string, description string, keywords string"
    )


def test_internal_only_dedupe_and_sort(spark, pages, heads):
    out = link_preview(pages, heads, query="spark").collect()
    a = sorted(
        [r for r in out if r["src_url"] == "https://s.com/a"],
        key=lambda r: r["link_rank"],
    )
    hrefs = [r["href"] for r in a]
    # external excluded by default; duplicate removed; relevance desc:
    # spark-heavy heads first, food page last
    assert set(hrefs) == {
        "https://s.com/one", "https://s.com/two",
        "https://s.com/three", "https://s.com/four",
    }
    rels = [r["contextual_score"] or 0.0 for r in a]
    assert rels == sorted(rels, reverse=True)
    assert hrefs[-1] in ("https://s.com/two", "https://s.com/four")


def test_truncate_before_dedupe_quirk(spark, pages, heads):
    # max_links=4 keeps [one, two, ext?, one-dup] → with external off the
    # page-a candidate list is [one, two, one-dup, three]: truncation to
    # 4 happens on the FILTERED list, then dedupe ⇒ 'four' never enters
    out = link_preview(pages, heads, max_links=3).collect()
    a_hrefs = {r["href"] for r in out if r["src_url"] == "https://s.com/a"}
    assert a_hrefs == {"https://s.com/one", "https://s.com/two"}


def test_missing_head_and_total_score_defaults(spark, pages, heads):
    out = {
        (r["src_url"], r["href"]): r
        for r in link_preview(pages, heads, query=None, score_links=False).collect()
    }
    r = out[("https://s.com/b", "https://s.com/nohead")]
    assert r["head_status"] == "missing"
    assert r["contextual_score"] is None
    # score_links disabled + no query ⇒ reference default 5.0
    assert r["total_score"] == pytest.approx(5.0)


def test_patterns_and_external(spark, pages, heads):
    out = link_preview(
        pages, heads, include_external=True,
        include_patterns=["*spark*", "*ext.org*"],
        exclude_patterns=["*two*"],
    ).collect()
    a_hrefs = {r["href"] for r in out if r["src_url"] == "https://s.com/a"}
    assert a_hrefs == {"https://ext.org/x"}
