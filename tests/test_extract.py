"""JsonCss / JsonXPath extraction parity (functions/extract.py) vs
hand-derived expectations mirroring extraction_strategy.py:1088-1310 +
the Css (:1989-2034) and XPath (:2449-2511) accessor flavors."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.functions.extract import (
    JsonCssExtractionStrategy,
    JsonXPathExtractionStrategy,
    css_select,
    node_html,
    with_extracted,
    xpath_select,
)
from crawl4ai_spark.functions.html_dom import parse_html

HTML = """<html><body>
<div class="product" id="p1" data-sku="A1">
  <h2 class="name">Widget <b>Pro</b></h2>
  <span class="price">$ 19.99</span>
  <ul class="tags"><li>new</li><li>sale</li></ul>
  <a href="/buy/1" title="buy-1">Buy</a>
  <div class="spec"><span class="k">w</span><span class="v">10</span></div>
</div>
<div class="product" id="p2">
  <h2 class="name">Gadget</h2>
  <span class="price">$5</span>
  <ul class="tags"><li>old</li></ul>
</div>
<div class="other"><span class="price">$999</span></div>
</body></html>"""

SCHEMA = {
    "name": "products",
    "baseSelector": "div.product",
    "baseFields": [
        {"name": "sku", "type": "attribute", "attribute": "data-sku"},
    ],
    "fields": [
        {"name": "pid", "type": "attribute", "attribute": "id"},
        {"name": "title", "selector": "h2.name", "type": "text"},
        {"name": "price", "selector": "span.price",
         "type": ["text", "regex"], "pattern": r"([\d.]+)"},
        {"name": "link", "selector": "a[href]", "type": "attribute",
         "attribute": "href", "default": "none"},
        {"name": "tags", "type": "list", "selector": "ul.tags li",
         "fields": [{"name": "t", "type": "text"}]},
        {"name": "spec", "type": "nested", "selector": "div.spec",
         "fields": [
             {"name": "k", "selector": "span.k", "type": "text"},
             {"name": "v", "selector": "span.v", "type": "text"},
         ]},
        {"name": "name_html", "selector": "h2", "type": "html"},
    ],
}


def test_css_extraction_full_schema():
    items = JsonCssExtractionStrategy(SCHEMA).extract("u", HTML)
    assert len(items) == 2  # div.other excluded by baseSelector
    p1, p2 = items
    # baseFields read off the base element itself
    assert p1["sku"] == "A1" and "sku" not in p2  # None → key omitted
    # BeautifulSoup get_text(strip=True): per-string strip, joined — so
    # "Widget <b>Pro</b>" → "WidgetPro" (the reference's own behavior)
    assert p1["title"] == "WidgetPro"
    # ["text","regex"] pipeline with group 1
    assert p1["price"] == "19.99" and p2["price"] == "5"
    # default on missing selector
    assert p1["link"] == "/buy/1" and p2["link"] == "none"
    # list type: one dict per match
    assert p1["tags"] == [{"t": "new"}, {"t": "sale"}]
    assert p2["tags"] == [{"t": "old"}]
    # nested: first match → dict; missing → {}
    assert p1["spec"] == {"k": "w", "v": "10"}
    assert p2["spec"] == {}
    # html type re-serializes the subtree (entities re-encoded)
    assert p1["name_html"] == '<h2 class="name">Widget <b>Pro</b></h2>'


def test_transforms_and_pipeline_short_circuit():
    schema = {
        "name": "t", "baseSelector": "div.product",
        "fields": [
            {"name": "up", "selector": "h2", "type": "text",
             "transform": "uppercase"},
            {"name": "low", "selector": "h2", "type": "text",
             "transform": "lowercase"},
            # attribute absent → None mid-pipeline → default
            {"name": "missing", "selector": "h2",
             "type": ["attribute", "regex"], "attribute": "nope",
             "pattern": r"(x)", "default": "dflt"},
        ],
    }
    items = JsonCssExtractionStrategy(schema).extract("u", HTML)
    assert items[0]["up"] == "WIDGETPRO"
    assert items[0]["low"] == "widgetpro"
    assert items[0]["missing"] == "dflt"


def test_xpath_flavor():
    items = JsonXPathExtractionStrategy({
        "name": "p",
        "baseSelector": "//div[@class='product']",
        "fields": [
            {"name": "pid", "type": "attribute", "attribute": "id"},
            # XPath text flavor: join then ONE strip → space preserved
            {"name": "title", "selector": ".//h2", "type": "text"},
            {"name": "first_tag", "selector": ".//li[1]", "type": "text"},
        ],
    }).extract("u", HTML)
    assert [it["pid"] for it in items] == ["p1", "p2"]
    assert items[0]["title"] == "Widget Pro"
    assert [it["first_tag"] for it in items] == ["new", "old"]
    # _basic_css_to_xpath acceptance: bare CSS-ish selectors
    bare = JsonXPathExtractionStrategy(
        {"name": "x", "baseSelector": "span", "fields":
         [{"name": "t", "type": "text"}]}
    ).extract("u", HTML)
    assert len(bare) == 5


def test_selector_engines_direct():
    root = parse_html(HTML)
    assert len(css_select(root, "div.product")) == 2
    assert len(css_select(root, "div.product span.price")) == 2
    assert len(css_select(root, "ul > li")) == 3
    assert len(css_select(root, "#p1 a[href]")) == 1
    assert len(css_select(root, "a[title=buy-1]")) == 1
    assert len(css_select(root, "h2, span.price")) == 5
    # child combinator is strict
    assert css_select(root, "body > li") == []
    assert len(xpath_select(root, "//div[@class='product']//span")) == 4
    assert len(xpath_select(root, "//ul/li")) == 3
    assert len(xpath_select(root, "//div[@data-sku]")) == 1
    with pytest.raises(ValueError):
        css_select(root, "div:nth-child(2)")
    with pytest.raises(ValueError):
        xpath_select(root, "//div[contains(@class,'x')]")


def test_node_html_reencodes_entities():
    root = parse_html('<p title="a&amp;b">x &lt; y</p>')
    p = root.find("p")
    assert node_html(p) == '<p title="a&amp;b">x &lt; y</p>'


def test_spark_typed_and_json_modes(spark):
    df = spark.createDataFrame([("u1", HTML)], "url string, html string")
    stype = T.ArrayType(T.StructType([
        T.StructField("pid", T.StringType()),
        T.StructField("price", T.StringType()),
        T.StructField("link", T.StringType()),
    ]))
    schema = {
        "name": "p", "baseSelector": "div.product",
        "fields": [
            {"name": "pid", "type": "attribute", "attribute": "id"},
            {"name": "price", "selector": "span.price",
             "type": ["text", "regex"], "pattern": r"([\d.]+)"},
            {"name": "link", "selector": "a[href]", "type": "attribute",
             "attribute": "href"},
        ],
    }
    typed = (
        with_extracted(df, schema, stype)
        .select(F.explode("extracted").alias("e"))
        .select("e.*")
        .collect()
    )
    assert [(r["pid"], r["price"], r["link"]) for r in typed] == [
        ("p1", "19.99", "/buy/1"), ("p2", "5", None),
    ]
    js = (
        with_extracted(df, schema)
        .select(F.explode("extracted").alias("j"))
        .collect()
    )
    parsed = [json.loads(r["j"]) for r in js]
    assert parsed[0]["pid"] == "p1" and "link" not in parsed[1]


def test_attribute_operators():
    """soupsieve attribute operators the reference's selectors lean on:
    ^= prefix, $= suffix, *= substring, ~= whitespace-word."""
    root = parse_html(
        '<div><a href="https://a.io/docs/x.pdf" rel="nofollow external">d</a>'
        '<a href="/local/y.html" rel="external">l</a></div>'
    )
    assert len(css_select(root, 'a[href^="https://"]')) == 1
    assert len(css_select(root, 'a[href$=".pdf"]')) == 1
    assert len(css_select(root, 'a[href*="local"]')) == 1
    assert len(css_select(root, 'a[rel~="external"]')) == 2
    assert len(css_select(root, 'a[rel~="nofollow"]')) == 1
    assert css_select(root, 'a[rel~="follow"]') == []
    assert css_select(root, 'a[href^="ftp"]') == []
