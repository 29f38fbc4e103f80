"""Schema-driven structured extraction — JsonCss / JsonXPath strategy
parity as vectorized operators (VERDICT-r4 #2).

Reference semantics replicated (not copied) from
extraction_strategy.py:

- ``JsonElementExtractionStrategy.extract`` (:1088-1131): baseSelector
  → base elements; ``baseFields`` + ``fields``; None values omitted.
- ``_extract_single_field`` (:1178-1239): optional per-field selector
  (first match), type PIPELINES (a list like ["attribute","regex"] runs
  left-to-right), types text / attribute / html / regex (search, group
  default 1), ``transform`` lowercase/uppercase/strip, ``default``
  fallback; a None mid-pipeline short-circuits.
- ``_extract_field`` (:1148-1176): nested (first match → dict, {} when
  absent), list / nested_list (all matches → list of dicts); errors →
  default.
- CSS accessors (:2019-2034): BeautifulSoup ``select`` semantics
  (descendant search), ``get_text(strip=True)`` = per-string strip,
  empties dropped, joined by "".
- XPath accessors (:2479-2511): element sets via xpath,
  ``.//text()`` join + single strip.

Neither BeautifulSoup/soupsieve nor lxml ships in this container, so
both selector engines are implemented here over the shared DOM-lite
tree (functions/html_dom.py):

- CSS subset: compound selectors (``tag``, ``.class``, ``#id``,
  ``[attr]``, ``[attr=val]`` plus the ``^=``/``$=``/``*=``/``~=``
  operators), descendant and ``>`` combinators, ``,`` groups — the
  subset the reference's own docs/test schemas use.
- XPath subset: ``//`` and ``/`` steps, ``*`` wildcard, ``[@attr]`` /
  ``[@attr='v']`` / positional ``[n]`` predicates — matching the
  output of the reference's ``_basic_css_to_xpath`` plus the
  hand-written paths in its examples.  Unsupported syntax raises
  ValueError rather than silently matching nothing.

Spark surface: one Arrow-batched pandas UDF per strategy, returning a
typed ``array<struct<...>>`` (caller supplies the Spark type matching
the schema — the driver row does) or JSON strings for schema-free use.
Same 100-TB posture as functions/scrape.py: one parse + one Python
crossing per page, columnar transfer, and everything downstream of the
UDF (explode / project / filter) stays JVM-side.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.functions.html_dom import Node, VOID_ELEMENTS, parse_html

# ---------------------------------------------------------------------------
# CSS selector subset
# ---------------------------------------------------------------------------

_COMPOUND_RE = re.compile(
    r"""(?x)
    (?P<tag>[a-zA-Z][\w-]*|\*)?
    (?P<rest>(?:
        \.[\w-]+ |
        \#[\w-]+ |
        \[[\w-]+(?:[~^$*]?=(?:"[^"]*"|'[^']*'|[^\]]*))?\]
    )*)
    $"""
)


def _parse_compound(tok: str):
    m = _COMPOUND_RE.match(tok)
    if not m or (not m.group("tag") and not m.group("rest")):
        raise ValueError(f"unsupported CSS compound: {tok!r}")
    tag = m.group("tag")
    conds = []
    for part in re.findall(
        r"\.[\w-]+|\#[\w-]+|\[[\w-]+(?:[~^$*]?=(?:\"[^\"]*\"|'[^']*'|[^\]]*))?\]",
        m.group("rest") or "",
    ):
        if part.startswith("."):
            conds.append(("class", part[1:]))
        elif part.startswith("#"):
            conds.append(("id", part[1:]))
        else:
            inner = part[1:-1]
            mm = re.match(r"([\w-]+)([~^$*]?=)(.*)$", inner, re.S)
            if mm:
                a, op, v = mm.group(1), mm.group(2), mm.group(3).strip("\"'")
                kind = {
                    "=": "attr_eq", "^=": "attr_prefix",
                    "$=": "attr_suffix", "*=": "attr_contains",
                    "~=": "attr_word",
                }[op]
                conds.append((kind, (a, v)))
            else:
                conds.append(("attr", inner))
    return tag, conds


def _matches_compound(node: Node, tag, conds) -> bool:
    if not isinstance(node, Node) or node.tag.startswith("#"):
        return False
    if tag and tag != "*" and node.tag != tag:
        return False
    for kind, arg in conds:
        if kind == "class" and arg not in node.classes():
            return False
        if kind == "id" and node.get("id") != arg:
            return False
        if kind == "attr" and node.get(arg) is None:
            return False
        if kind.startswith("attr_"):
            val = node.get(arg[0])
            if val is None:
                return False
            want = arg[1]
            if kind == "attr_eq" and val != want:
                return False
            if kind == "attr_prefix" and not (
                want and val.startswith(want)
            ):
                return False
            if kind == "attr_suffix" and not (
                want and val.endswith(want)
            ):
                return False
            if kind == "attr_contains" and not (want and want in val):
                return False
            if kind == "attr_word" and want not in val.split():
                return False
    return True


def _parse_css(selector: str):
    """selector group → list of chains; chain = [(combinator, compound)]
    with combinator in {' ', '>'} (first entry ' ' = descendant-of-root)."""
    chains = []
    for alt in selector.split(","):
        alt = alt.strip()
        if not alt:
            raise ValueError(f"empty selector in {selector!r}")
        toks = re.split(r"\s*>\s*|\s+", alt)
        combs = [" "]
        pos = 0
        for mm in re.finditer(r"\s*>\s*|\s+", alt):
            combs.append(">" if ">" in mm.group(0) else " ")
        chain = [
            (combs[i], _parse_compound(tok)) for i, tok in enumerate(toks)
        ]
        chains.append(chain)
    return chains


def _chain_matches(node: Node, chain, root: Node) -> bool:
    """Right-to-left match: node matches the last compound, ancestors
    satisfy the rest under their combinators, all within root."""

    def rec(n: Node, idx: int) -> bool:
        comb, (tag, conds) = chain[idx]
        if not _matches_compound(n, tag, conds):
            return False
        if idx == 0:
            # leftmost compound must still be a strict descendant of root
            return _is_descendant(n, root)
        prev_comb = chain[idx][0]
        if prev_comb == ">":
            p = n.parent
            return p is not None and rec(p, idx - 1)
        p = n.parent
        while p is not None:
            if rec(p, idx - 1):
                return True
            p = p.parent
        return False

    return rec(node, len(chain) - 1)


def _is_descendant(n: Node, root: Node) -> bool:
    p = n.parent
    while p is not None:
        if p is root:
            return True
        p = p.parent
    return False


def css_select(root: Node, selector: str) -> list[Node]:
    """BeautifulSoup ``element.select`` shape: document-order strict
    descendants of ``root`` matching the selector group."""
    chains = _parse_css(selector)
    out = []
    for node in root.iter():
        if any(_chain_matches(node, chain, root) for chain in chains):
            out.append(node)
    return out


# ---------------------------------------------------------------------------
# XPath subset
# ---------------------------------------------------------------------------

_XP_STEP_RE = re.compile(
    r"(/{1,2})([a-zA-Z][\w-]*|\*)"
    r"((?:\[(?:@[\w-]+(?:='[^']*'|=\"[^\"]*\")?|\d+)\])*)"
)


def _parse_xpath(path: str):
    p = path.strip()
    if p.startswith("."):
        p = p[1:]
    if not p.startswith("/"):
        p = "//" + p
    steps = []
    consumed = 0
    for m in _XP_STEP_RE.finditer(p):
        if m.start() != consumed:
            raise ValueError(f"unsupported XPath: {path!r}")
        consumed = m.end()
        preds = []
        for pr in re.findall(
            r"\[(@[\w-]+(?:='[^']*'|=\"[^\"]*\")?|\d+)\]", m.group(3) or ""
        ):
            if pr.startswith("@"):
                if "=" in pr:
                    a, v = pr[1:].split("=", 1)
                    preds.append(("attr_eq", (a, v.strip("\"'"))))
                else:
                    preds.append(("attr", pr[1:]))
            else:
                preds.append(("pos", int(pr)))
        steps.append((m.group(1) == "//", m.group(2), preds))
    if consumed != len(p) or not steps:
        raise ValueError(f"unsupported XPath: {path!r}")
    return steps


def xpath_select(root: Node, path: str) -> list[Node]:
    current = [root]
    for deep, tag, preds in _parse_xpath(path):
        nxt: list[Node] = []
        for node in current:
            if deep:
                cands = list(
                    node.iter(*([] if tag == "*" else [tag]))
                )
            else:
                cands = [
                    c for c in node.children
                    if isinstance(c, Node)
                    and (tag == "*" or c.tag == tag)
                ]
            for kind, arg in preds:
                if kind == "attr":
                    cands = [c for c in cands if c.get(arg) is not None]
                elif kind == "attr_eq":
                    cands = [c for c in cands if c.get(arg[0]) == arg[1]]
                elif kind == "pos":
                    cands = cands[arg - 1:arg] if len(cands) >= arg else []
            nxt.extend(cands)
        # dedupe while keeping document order (diamond paths)
        seen = set()
        current = []
        for c in nxt:
            if id(c) not in seen:
                seen.add(id(c))
                current.append(c)
    return current


# ---------------------------------------------------------------------------
# serialization (the "html" field type)
# ---------------------------------------------------------------------------

def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


def node_html(node: Node) -> str:
    """Subtree serialization (the reference's ``str(element)`` /
    ``etree.tostring``), re-encoding the entities the parser decoded."""
    attrs = "".join(
        f' {k}="{_esc_attr(v)}"' for k, v in node.attrs.items()
    )
    inner = "".join(
        _esc_text(c) if isinstance(c, str) else node_html(c)
        for c in node.children
    )
    if node.tag in VOID_ELEMENTS:
        return f"<{node.tag}{attrs}>"
    return f"<{node.tag}{attrs}>{inner}</{node.tag}>"


# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------

class JsonCssExtractionStrategy:
    """extraction_strategy.py:1989-2034 parity on the CSS subset."""

    def __init__(self, schema: dict):
        self.schema = schema

    # element accessors (the strategy-varying layer)
    def _select(self, element: Node, selector: str) -> list[Node]:
        return css_select(element, selector)

    def _text(self, element: Node) -> str:
        pieces: list[str] = []
        element._gather_text(pieces, frozenset())
        return "".join(s for s in (p.strip() for p in pieces) if s)

    # shared JsonElementExtractionStrategy machinery
    def extract(self, url: str, html: str | None) -> list[dict]:
        root = parse_html(html)
        results = []
        for element in self._select(root, self.schema["baseSelector"]):
            item = {}
            for field in self.schema.get("baseFields", []):
                value = self._single(element, field)
                if value is not None:
                    item[field["name"]] = value
            item.update(self._item(element, self.schema["fields"]))
            if item:
                results.append(item)
        return results

    def _item(self, element: Node, fields) -> dict:
        item = {}
        for field in fields:
            value = self._field(element, field)
            if value is not None:
                item[field["name"]] = value
        return item

    def _field(self, element: Node, field):
        try:
            ftype = field["type"]
            if ftype == "nested":
                els = self._select(element, field["selector"])
                return self._item(els[0], field["fields"]) if els else {}
            if ftype in ("list", "nested_list"):
                els = self._select(element, field["selector"])
                if ftype == "list":
                    return [
                        {
                            f["name"]: v
                            for f in field["fields"]
                            if (v := self._single(el, f)) is not None
                        }
                        for el in els
                    ]
                return [self._item(el, field["fields"]) for el in els]
            return self._single(element, field)
        except Exception:
            return field.get("default")

    def _single(self, element: Node, field):
        if "selector" in field:
            selected = self._select(element, field["selector"])
            if not selected:
                return field.get("default")
            selected = selected[0]
        else:
            selected = element

        pipeline = field["type"]
        if not isinstance(pipeline, list):
            pipeline = [pipeline]
        value = selected
        for step in pipeline:
            if step == "text":
                value = self._text(value)
            elif step == "attribute":
                value = value.get(field["attribute"])
            elif step == "html":
                value = node_html(value)
            elif step == "regex":
                pattern = field.get("pattern")
                if pattern:
                    if not isinstance(value, str):
                        value = self._text(value)
                    m = re.search(pattern, value)
                    value = m.group(field.get("group", 1)) if m else None
            if value is None:
                break
        if "transform" in field and value is not None:
            value = _transform(value, field["transform"])
        return value if value is not None else field.get("default")


class JsonXPathExtractionStrategy(JsonCssExtractionStrategy):
    """extraction_strategy.py:2449-2511 parity on the XPath subset,
    including `_basic_css_to_xpath` acceptance of bare CSS-ish
    selectors (no '/' → '//' prefixing, ' > ' → '/', ' ' → '//')."""

    def _select(self, element: Node, selector: str) -> list[Node]:
        return xpath_select(element, self._to_xpath(selector))

    @staticmethod
    def _to_xpath(selector: str) -> str:
        if "/" in selector:
            return selector
        if " > " in selector:
            return "//" + "/".join(selector.split(" > "))
        if " " in selector:
            return "//" + "//".join(selector.split(" "))
        return "//" + selector

    def _text(self, element: Node) -> str:
        # XPath flavor: join all text then ONE strip (:2504-2505)
        return element.text_content().strip()


def _transform(value, transform: str):
    if transform == "lowercase":
        return value.lower()
    if transform == "uppercase":
        return value.upper()
    if transform == "strip":
        return value.strip()
    return value


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def json_extract_udf(
    schema: dict,
    spark_type: T.DataType | None = None,
    flavor: str = "css",
):
    """(url, html) → extracted records.  With ``spark_type`` (an
    ``ArrayType(StructType(...))`` matching the schema's fields): typed
    structs, missing fields null.  Without: ``array<string>`` of
    sorted-key JSON — schema-free, for exploratory use."""
    cls = (
        JsonCssExtractionStrategy if flavor == "css"
        else JsonXPathExtractionStrategy
    )
    rtype = spark_type or T.ArrayType(T.StringType())
    as_json = spark_type is None

    @F.pandas_udf(rtype)
    def _udf(url: pd.Series, html: pd.Series) -> pd.Series:
        strat = cls(schema)  # per-batch construction, no driver pickle
        out = []
        for u, h in zip(url, html):
            items = strat.extract(u, h)
            if as_json:
                out.append([json.dumps(it, sort_keys=True) for it in items])
            else:
                out.append(items)
        return pd.Series(out)

    return _udf


def with_extracted(
    df: DataFrame,
    schema: dict,
    spark_type: T.DataType | None = None,
    url_col: str = "url",
    html_col: str = "html",
    flavor: str = "css",
    out_col: str = "extracted",
) -> DataFrame:
    return df.withColumn(
        out_col,
        json_extract_udf(schema, spark_type, flavor)(
            F.col(url_col), F.col(html_col)
        ),
    )
