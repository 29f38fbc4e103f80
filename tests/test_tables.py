"""DefaultTableExtraction parity (functions/tables.py) vs hand-derived
expectations mirroring reference table_extraction.py:66-297: the
data-vs-layout scoring gates and the colspan/alignment extraction."""

from __future__ import annotations

import pytest

from crawl4ai_spark.functions.html_dom import parse_html
from crawl4ai_spark.functions.tables import DefaultTableExtraction

DATA_TABLE = """<table id="stats" summary="yearly numbers">
<caption>Yearly</caption>
<thead><tr><th>year</th><th colspan="2">value</th></tr></thead>
<tbody>
<tr><td>2020</td><td>10</td><td>11</td></tr>
<tr><td>2021</td><td>20</td><td>21</td></tr>
</tbody></table>"""


def _extract(html, **kw):
    return DefaultTableExtraction(**kw).extract_tables(
        parse_html(f"<html><body>{html}</body></html>")
    )


def test_data_table_extraction_colspan_and_metadata():
    (t,) = _extract(DATA_TABLE)
    assert t["headers"] == ["year", "value", "value"]  # colspan expanded
    assert t["rows"] == [["2020", "10", "11"], ["2021", "20", "21"]]
    assert t["caption"] == "Yearly" and t["summary"] == "yearly numbers"
    m = t["metadata"]
    assert m["row_count"] == 2 and m["column_count"] == 3
    assert m["has_headers"] and m["has_caption"] and m["has_summary"]
    assert m["id"] == "stats"


def test_layout_tables_rejected():
    # role=presentation -3, no thead/tbody/th, single row
    layout = '<table role="presentation"><tr><td>a</td><td>b</td></tr></table>'
    assert _extract(layout) == []
    # bare 2x2 without structure: variance +2, size +2 → 4 < 7
    bare = ("<table><tr><td>a</td><td>b</td></tr>"
            "<tr><td>c</td><td>d</td></tr></table>")
    assert _extract(bare) == []
    # same table passes once the threshold is lowered (ctor override);
    # reference quirk mirrored: without a thead, the first row's td
    # cells become the headers AND remain a data row
    (t,) = _extract(bare, table_score_threshold=4)
    assert t["headers"] == ["a", "b"]
    assert t["rows"] == [["a", "b"], ["c", "d"]]
    assert not t["metadata"]["has_headers"]


def test_nested_table_penalty_and_min_filters():
    nested = DATA_TABLE.replace(
        "<td>10</td>", "<td><table><tr><td>x</td></tr></table></td>"
    )
    # inner table text rides along, but the -3 nested penalty plus the
    # broken column variance keeps the outer table only if score still
    # clears 7: thead2+tbody1+th2+1+caption2+summary1+size2 = 11-3 = 8
    out = _extract(nested)
    assert len(out) >= 1
    # min_rows / min_cols filters
    assert _extract(DATA_TABLE, min_rows=3) == []
    assert _extract(DATA_TABLE, min_cols=4) == []
    assert len(_extract(DATA_TABLE, min_rows=2, min_cols=3)) == 1


def test_headerless_first_row_and_alignment():
    html = """<table><caption>c</caption>
    <tr><th>a</th><th>b</th><th>c</th></tr>
    <tr><td>1</td><td>2</td><td>3</td></tr>
    <tr><td>4</td></tr>
    </table>"""
    (t,) = _extract(html, table_score_threshold=5)
    # no thead: first row's th cells become headers; body rows use td
    # only, short rows padded to header width
    assert t["headers"] == ["a", "b", "c"]
    assert t["rows"] == [["1", "2", "3"], ["4", "", ""]]
    assert t["metadata"]["has_headers"]


def test_scrape_media_table_hook(spark):
    from crawl4ai_spark.functions.scrape import py_scrape_media

    html = f"<html><body>{DATA_TABLE}</body></html>"
    none = py_scrape_media("https://e.com/", html)
    assert none["tables"] == []
    on = py_scrape_media("https://e.com/", html, table_extraction=True)
    assert len(on["tables"]) == 1
    custom = py_scrape_media(
        "https://e.com/", html,
        table_extraction=DefaultTableExtraction(min_rows=5),
    )
    assert custom["tables"] == []
