"""Markdown generation — the deterministic core of the reference's
most-used output format (VERDICT-r4 #6).

Three pieces, replicated (not copied) from the reference:

1. ``html_to_markdown`` — html → markdown over the shared DOM-lite
   tree.  The reference converts with its vendored html2text fork
   (markdown_generation_strategy.py:210 ``h.handle(input_html)``);
   html2text is NOT in this container, so this is a from-scratch
   converter with a DOCUMENTED, deterministic rule set covering the
   element vocabulary the crawl tier produces (headings, paragraphs,
   inline links/images/emphasis/code, nested lists, blockquotes,
   fenced pre, tables, hr).  It does not claim html2text bit-parity;
   its contract is determinism + the rules below, pinned by
   tests/test_markdown.py.
2. ``convert_links_to_citations`` — reference-EXACT algorithm
   (markdown_generation_strategy.py:82-147): LINK_PATTERN scan,
   fast_urljoin resolution, first-occurrence numbering, ⟨n⟩ citation
   marks, "## References" block.
3. ``PruningContentFilter`` — reference-exact scoring
   (content_filter_strategy.py:541-806): comment/unwanted-tag removal,
   composite score (text density 0.4, link density 0.2, tag weight
   0.2, class/id weight 0.1, log text length 0.1), fixed or dynamic
   threshold, preserve lists, min-word guaranteed removal; surviving
   top-level blocks re-serialized — feeding ``fit_markdown``.

``DefaultMarkdownGenerator`` composes them like the reference
(:148-250), including the ``"    ```" → "```"`` post-fix quirk.

Spark surface: one Arrow-batched pandas UDF returning the whole
markdown result struct per page — same single-crossing posture as
functions/scrape.py.
"""

from __future__ import annotations

import math
import re
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.functions.html_dom import Node, parse_html

# markdown_generation_strategy.py:11 — parity constant
LINK_PATTERN = re.compile(
    r'!?\[((?:[^\[\]]|\[(?:[^\[\]]|\[[^\]]*\])*\])*)\]'
    r'\(((?:[^()\s]|\([^()]*\))*)(?:\s+"([^"]*)")?\)'
)

_SKIP_TAGS = frozenset({
    "script", "style", "noscript", "head", "title", "meta", "link",
    "base", "svg", "template", "iframe", "video", "audio", "source",
    "track", "picture", "button", "input", "select", "option",
})

_BLOCK_TAGS = frozenset({
    "h1", "h2", "h3", "h4", "h5", "h6", "p", "div", "section",
    "article", "main", "figure", "figcaption", "ul", "ol", "li",
    "blockquote", "pre", "hr", "table", "header", "footer", "nav",
    "aside", "form", "fieldset", "address", "details", "summary",
    "body", "html",
})

_WS_RE = re.compile(r"\s+")


def fast_urljoin(base: str, url: str) -> str:
    """markdown_generation_strategy.py:14-23 parity."""
    if url.startswith(("http://", "https://", "mailto:", "//")):
        return url
    if url.startswith("/"):
        if base.endswith("/"):
            return base[:-1] + url
        return base + url
    return urljoin(base, url)


# ---------------------------------------------------------------------------
# html → markdown
# ---------------------------------------------------------------------------

def _inline(node) -> str:
    """Inline rendering: whitespace-collapsed text, [text](href),
    ![alt](src), **strong**, *em*, `code`; unknown inline tags recurse
    transparently."""
    if isinstance(node, str):
        return _WS_RE.sub(" ", node)
    if node.tag in _SKIP_TAGS:
        return ""
    if node.tag == "br":
        return "  \n"
    if node.tag == "img":
        src = node.get("src")
        if not src:
            return ""
        alt = _WS_RE.sub(" ", node.get("alt") or "").strip()
        return f"![{alt}]({src})"
    inner = "".join(_inline(c) for c in node.children)
    if node.tag == "a":
        href = node.get("href")
        if not href:
            return inner
        text = inner.strip()
        title = (node.get("title") or "").strip()
        if title:
            return f'[{text}]({href} "{title}")'
        return f"[{text}]({href})"
    if node.tag in ("strong", "b"):
        s = inner.strip()
        return f"**{s}**" if s else ""
    if node.tag in ("em", "i"):
        s = inner.strip()
        return f"*{s}*" if s else ""
    if node.tag == "code":
        s = inner.strip()
        return f"`{s}`" if s else ""
    return inner


def _render_blocks(node: Node, depth: int = 0) -> list[str]:
    """Children of a block container → list of markdown blocks.
    Consecutive inline children coalesce into one implicit paragraph."""
    blocks: list[str] = []
    run: list[str] = []

    def flush():
        if run:
            para = "".join(run).strip()
            if para:
                blocks.append(para)
            run.clear()

    for c in node.children:
        is_block = isinstance(c, Node) and c.tag in _BLOCK_TAGS
        if not is_block:
            if isinstance(c, Node) and c.tag in _SKIP_TAGS:
                continue
            run.append(_inline(c))
            continue
        flush()
        blocks.extend(_block(c, depth))
    flush()
    return blocks


def _block(node: Node, depth: int) -> list[str]:
    tag = node.tag
    if tag in _SKIP_TAGS:
        return []
    if tag == "hr":
        return ["---"]
    if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
        level = int(tag[1])
        text = "".join(_inline(c) for c in node.children).strip()
        return [f"{'#' * level} {text}"] if text else []
    if tag == "pre":
        code = node.text_content()
        return ["```\n" + code.strip("\n") + "\n```"]
    if tag == "blockquote":
        inner = _render_blocks(node, depth)
        lines = "\n\n".join(inner).split("\n")
        return ["\n".join("> " + ln for ln in lines)] if inner else []
    if tag in ("ul", "ol"):
        items = []
        num = 0
        for c in node.children:
            if isinstance(c, Node) and c.tag == "li":
                num += 1
                items.append(_list_item(c, depth, tag == "ol", num))
        return ["\n".join(items)] if items else []
    if tag == "table":
        return _table(node)
    # generic block container (p/div/section/figure/...)
    inner = _render_blocks(node, depth)
    return inner


def _list_item(li: Node, depth: int, ordered: bool, num: int) -> str:
    marker = f"{num}. " if ordered else "* "
    indent = "  " * depth
    # split the item into its inline lead and nested list blocks
    lead: list[str] = []
    nested: list[str] = []
    for c in li.children:
        if isinstance(c, Node) and c.tag in ("ul", "ol"):
            nested.extend(_block(c, depth + 1))
        elif isinstance(c, Node) and c.tag in _BLOCK_TAGS:
            nested.extend(_block(c, depth + 1))
        elif isinstance(c, Node) and c.tag in _SKIP_TAGS:
            continue
        else:
            lead.append(_inline(c))
    line = indent + marker + "".join(lead).strip()
    if nested:
        sub = "\n".join(
            "  " * (depth + 1) + ln if not ln.startswith("  ") else ln
            for block in nested for ln in block.split("\n")
        )
        return line + "\n" + sub
    return line


def _table(node: Node) -> list[str]:
    rows = []
    for tr in node.iter("tr"):
        cells = [
            "".join(_inline(c) for c in cell.children).strip()
            for cell in tr.children
            if isinstance(cell, Node) and cell.tag in ("td", "th")
        ]
        if cells:
            rows.append(cells)
    if not rows:
        return []
    out = ["| " + " | ".join(rows[0]) + " |",
           "|" + "---|" * len(rows[0])]
    for r in rows[1:]:
        out.append("| " + " | ".join(r) + " |")
    return ["\n".join(out)]


def html_to_markdown(html: str | None) -> str:
    root = parse_html(html)
    body = root.find("body") or root
    return "\n\n".join(_render_blocks(body)).strip()


# ---------------------------------------------------------------------------
# citations (reference-exact)
# ---------------------------------------------------------------------------

def convert_links_to_citations(
    markdown: str, base_url: str = ""
) -> tuple[str, str]:
    """markdown_generation_strategy.py:82-147 parity: ⟨n⟩ marks by
    first occurrence, per-link "title - text" descriptions, image
    links collapse to ![text⟨n⟩]."""
    link_map: dict[str, tuple[int, str]] = {}
    url_cache: dict[str, str] = {}
    parts: list[str] = []
    last_end = 0
    counter = 1
    for match in LINK_PATTERN.finditer(markdown):
        parts.append(markdown[last_end:match.start()])
        text, url, title = match.groups()
        if base_url and not url.startswith(
            ("http://", "https://", "mailto:")
        ):
            if url not in url_cache:
                url_cache[url] = fast_urljoin(base_url, url)
            url = url_cache[url]
        if url not in link_map:
            desc = []
            if title:
                desc.append(title)
            if text and text != title:
                desc.append(text)
            link_map[url] = (counter, ": " + " - ".join(desc) if desc else "")
            counter += 1
        num = link_map[url][0]
        parts.append(
            f"{text}⟨{num}⟩"
            if not match.group(0).startswith("!")
            else f"![{text}⟨{num}⟩]"
        )
        last_end = match.end()
    parts.append(markdown[last_end:])
    converted_text = "".join(parts)
    references = ["\n\n## References\n\n"]
    references.extend(
        f"⟨{num}⟩ {url}{desc}\n"
        for url, (num, desc) in sorted(
            link_map.items(), key=lambda x: x[1][0]
        )
    )
    return converted_text, "".join(references)


# ---------------------------------------------------------------------------
# PruningContentFilter (reference-exact scoring)
# ---------------------------------------------------------------------------

EXCLUDED_TAGS = frozenset({
    "nav", "footer", "header", "aside", "script", "style", "form",
    "iframe", "noscript",
})  # content_filter_strategy.py:101-111

NEGATIVE_PATTERNS = re.compile(
    r"nav|footer|header|sidebar|ads|comment|promo|advert|social|share",
    re.I,
)  # content_filter_strategy.py:113-115

TAG_IMPORTANCE = {
    "article": 1.5, "main": 1.4, "section": 1.3, "p": 1.2,
    "h1": 1.4, "h2": 1.3, "h3": 1.2, "div": 0.7, "span": 0.6,
}
METRIC_WEIGHTS = {
    "text_density": 0.4, "link_density": 0.2, "tag_weight": 0.2,
    "class_id_weight": 0.1, "text_length": 0.1,
}
TAG_WEIGHTS = {
    "div": 0.5, "p": 1.0, "article": 1.5, "section": 1.0, "span": 0.3,
    "li": 0.5, "ul": 0.5, "ol": 0.5, "h1": 1.2, "h2": 1.1, "h3": 1.0,
    "h4": 0.9, "h5": 0.8, "h6": 0.7,
}


def _bs_text(node: Node) -> str:
    """BeautifulSoup get_text(strip=True): per-string strip, empties
    dropped, joined by ''."""
    pieces: list[str] = []
    node._gather_text(pieces, frozenset())
    return "".join(s for s in (p.strip() for p in pieces) if s)


def _inner_html(node: Node) -> str:
    from crawl4ai_spark.functions.extract import _esc_text, node_html

    return "".join(
        _esc_text(c) if isinstance(c, str) else node_html(c)
        for c in node.children
    )


class PruningContentFilter:
    """content_filter_strategy.py:541-806 parity (lxml → DOM-lite)."""

    def __init__(
        self,
        user_query: str | None = None,
        min_word_threshold: int | None = None,
        threshold_type: str = "fixed",
        threshold: float = 0.48,
        preserve_classes: list | None = None,
        preserve_tags: list | None = None,
    ):
        self.min_word_threshold = min_word_threshold
        self.threshold_type = threshold_type
        self.threshold = threshold
        self.preserve_classes = set(preserve_classes or ())
        self.preserve_tags = set(preserve_tags or ())

    def filter_content(self, html: str | None) -> list[str]:
        from crawl4ai_spark.functions.extract import node_html

        if not html or not isinstance(html, str):
            return []
        root = parse_html(html)
        body = root.find("body")
        if body is None:
            body = parse_html(f"<body>{html}</body>").find("body")
        self._remove_unwanted(body)
        self._prune(body)
        blocks = []
        for el in body.children:
            if isinstance(el, str):
                continue
            if len(_bs_text(el)) > 0:
                blocks.append(node_html(el))
        return blocks

    def _remove_unwanted(self, body: Node) -> None:
        for tag in EXCLUDED_TAGS:
            for el in list(body.iter(tag)):
                if el.parent is not None and el in el.parent.children:
                    el.parent.children.remove(el)

    def _is_preserved(self, node: Node) -> bool:
        if self.preserve_tags and node.tag in self.preserve_tags:
            return True
        if self.preserve_classes and node.get("class") is not None:
            if set(node.classes()) & self.preserve_classes:
                return True
        return False

    def _prune(self, node: Node) -> None:
        if not isinstance(node, Node):
            return
        if self._is_preserved(node):
            return
        text_len = len(_bs_text(node))
        tag_len = len(_inner_html(node))
        # direct-child <a> whose sole child is a string (.string parity)
        link_text_len = 0
        for c in node.children:
            if isinstance(c, Node) and c.tag == "a":
                if len(c.children) == 1 and isinstance(c.children[0], str):
                    link_text_len += len(c.children[0].strip())
        score = self._composite(node, text_len, tag_len, link_text_len)
        if self.threshold_type == "fixed":
            should_remove = score < self.threshold
        else:
            tag_importance = TAG_IMPORTANCE.get(node.tag, 0.7)
            text_ratio = text_len / tag_len if tag_len > 0 else 0
            link_ratio = link_text_len / text_len if text_len > 0 else 1
            threshold = self.threshold
            if tag_importance > 1:
                threshold *= 0.8
            if text_ratio > 0.4:
                threshold *= 0.9
            if link_ratio > 0.6:
                threshold *= 1.2
            should_remove = score < threshold
        if should_remove:
            # BS decompose() destroys the subtree — clearing children
            # matters when the removed node is the body filter_content
            # iterates afterwards
            if node.parent is not None and node in node.parent.children:
                node.parent.children.remove(node)
            node.children.clear()
        else:
            for child in [c for c in node.children if isinstance(c, Node)]:
                self._prune(child)

    def _composite(
        self, node: Node, text_len: int, tag_len: int, link_text_len: int
    ) -> float:
        if self.min_word_threshold:
            word_count = _bs_text(node).count(" ") + 1
            if word_count < self.min_word_threshold:
                return -1.0
        score = 0.0
        total_weight = 0.0
        density = text_len / tag_len if tag_len > 0 else 0
        score += METRIC_WEIGHTS["text_density"] * density
        total_weight += METRIC_WEIGHTS["text_density"]
        density = 1 - (link_text_len / text_len if text_len > 0 else 0)
        score += METRIC_WEIGHTS["link_density"] * density
        total_weight += METRIC_WEIGHTS["link_density"]
        score += METRIC_WEIGHTS["tag_weight"] * TAG_WEIGHTS.get(
            node.tag, 0.5
        )
        total_weight += METRIC_WEIGHTS["tag_weight"]
        score += METRIC_WEIGHTS["class_id_weight"] * max(
            0, self._class_id_weight(node)
        )
        total_weight += METRIC_WEIGHTS["class_id_weight"]
        score += METRIC_WEIGHTS["text_length"] * math.log(text_len + 1)
        total_weight += METRIC_WEIGHTS["text_length"]
        return score / total_weight if total_weight > 0 else 0

    @staticmethod
    def _class_id_weight(node: Node) -> float:
        score = 0.0
        if node.get("class") is not None:
            if NEGATIVE_PATTERNS.match(" ".join(node.classes())):
                score -= 0.5
        if node.get("id") is not None:
            if NEGATIVE_PATTERNS.match(node.get("id")):
                score -= 0.5
        return score


# ---------------------------------------------------------------------------
# generator (composition, reference-shaped)
# ---------------------------------------------------------------------------

class DefaultMarkdownGenerator:
    """markdown_generation_strategy.py:55-250 composition: raw →
    citations → optional content-filtered fit_markdown, including the
    '    ```' → '```' post-fix.

    ``content_source`` mirrors the reference's input selection
    (markdown_generation_strategy.py:62-80; applied by the caller in
    async_webcrawler): "cleaned_html" (the reference default — the
    _scrap cleaning pipeline runs first, functions/scrape.py:
    py_cleaned_html), "raw_html", or "fit_html" (the content filter's
    surviving blocks become the markdown input — requires a
    content_filter)."""

    def __init__(
        self,
        content_filter=None,
        options: dict | None = None,
        content_source: str = "cleaned_html",
    ):
        self.content_filter = content_filter
        self.options = options or {}
        if content_source not in ("cleaned_html", "raw_html", "fit_html"):
            raise ValueError(
                f"unknown content_source: {content_source!r}"
            )
        if content_source == "fit_html" and content_filter is None:
            raise ValueError(
                "content_source='fit_html' needs a content_filter"
            )
        self.content_source = content_source

    def generate_markdown(
        self,
        input_html: str,
        base_url: str = "",
        citations: bool = True,
        content_filter=None,
    ) -> dict:
        if self.content_source == "cleaned_html":
            from crawl4ai_spark.functions.scrape import py_cleaned_html

            input_html = py_cleaned_html(base_url, input_html)
        elif self.content_source == "fit_html":
            # the reference's third source: the content filter's
            # surviving blocks ARE the markdown input
            flt = content_filter or self.content_filter
            input_html = "\n".join(flt.filter_content(input_html))
        raw_markdown = html_to_markdown(input_html)
        raw_markdown = raw_markdown.replace("    ```", "```")
        markdown_with_citations = raw_markdown
        references_markdown = ""
        if citations:
            markdown_with_citations, references_markdown = (
                convert_links_to_citations(raw_markdown, base_url)
            )
        fit_markdown = ""
        fit_html = ""
        flt = content_filter or self.content_filter
        if flt:
            blocks = flt.filter_content(input_html)
            fit_html = "\n".join(blocks)
            fit_markdown = html_to_markdown(fit_html)
        return {
            "raw_markdown": raw_markdown,
            "markdown_with_citations": markdown_with_citations,
            "references_markdown": references_markdown,
            "fit_html": fit_html,
            "fit_markdown": fit_markdown,
        }


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

MARKDOWN_TYPE = T.StructType([
    T.StructField("raw_markdown", T.StringType()),
    T.StructField("markdown_with_citations", T.StringType()),
    T.StructField("references_markdown", T.StringType()),
    T.StructField("fit_markdown", T.StringType()),
])


def markdown_udf(
    citations: bool = True,
    content_filter: PruningContentFilter | None = None,
    content_source: str = "cleaned_html",
):
    """(url, html) → markdown result struct; one parse + one Python
    crossing per page, like every HTML-tier UDF."""
    flt = content_filter
    src = content_source

    @F.pandas_udf(MARKDOWN_TYPE)
    def _udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
        gen = DefaultMarkdownGenerator(content_filter=flt, content_source=src)
        rows = []
        for u, h in zip(url, html):
            r = gen.generate_markdown(h or "", u or "", citations=citations)
            rows.append({
                "raw_markdown": r["raw_markdown"],
                "markdown_with_citations": r["markdown_with_citations"],
                "references_markdown": r["references_markdown"],
                "fit_markdown": r["fit_markdown"],
            })
        return pd.DataFrame(
            rows,
            columns=[
                "raw_markdown", "markdown_with_citations",
                "references_markdown", "fit_markdown",
            ],
        )

    return _udf


def with_markdown(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    citations: bool = True,
    content_filter: PruningContentFilter | None = None,
    content_source: str = "cleaned_html",
    out_col: str = "markdown",
) -> DataFrame:
    return df.withColumn(
        out_col,
        markdown_udf(citations, content_filter, content_source)(
            F.col(url_col), F.col(html_col)
        ),
    )


# ---------------------------------------------------------------------------
# BM25ContentFilter (reference-exact scoring, stemming optional)
# ---------------------------------------------------------------------------

# utils.py:2565-2791 — parity data tables
_CLEAN_NOISE = {
    "ccp", "up", "↑", "▲", "⬆️", "a", "an", "at", "by", "in", "of",
    "on", "to", "the",
}
_CLEAN_STOP_WORDS = {
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
    "to", "was", "were", "will", "with",
    "i", "you", "she", "we", "they", "me", "him", "her", "us", "them",
    "my", "your", "his", "our", "their", "mine", "yours", "hers",
    "ours", "theirs", "myself", "yourself", "himself", "herself",
    "itself", "ourselves", "themselves",
    "am", "been", "being", "have", "had", "having", "do", "does",
    "did", "doing",
    "about", "above", "across", "after", "against", "along", "among",
    "around", "before", "behind", "below", "beneath", "beside",
    "between", "beyond", "down", "during", "except", "inside", "into",
    "near", "off", "out", "outside", "over", "past", "through",
    "toward", "under", "underneath", "until", "upon", "within",
    "but", "or", "nor", "yet", "so", "although", "because", "since",
    "unless",
    "this", "these", "those", "what", "which", "who", "whom", "whose",
    "when", "where", "why", "how", "all", "any", "both", "each",
    "few", "more", "most", "other", "some", "such", "can", "cannot",
    "can't", "could", "couldn't", "may", "might", "must", "mustn't",
    "shall", "should", "shouldn't", "won't", "would", "wouldn't",
    "not", "n't", "no", "none",
}


def clean_tokens(tokens: list[str]) -> list[str]:
    """utils.py:2565-2791 parity: len>2, noise/stop-word removal,
    arrow-prefix removal."""
    return [
        t for t in tokens
        if len(t) > 2
        and t not in _CLEAN_NOISE
        and t not in _CLEAN_STOP_WORDS
        and not t.startswith(("↑", "▲", "⬆"))
    ]


def bm25_okapi_scores(
    corpus: list[list[str]],
    query: list[str],
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
) -> list[float]:
    """Pure-Python mirror of the public rank_bm25 ``BM25Okapi``
    (the package is not in this container): ln((N-df+0.5)/(df+0.5))
    idf with the epsilon·avg-idf floor for negative idfs, standard
    Okapi tf saturation — the same semantics sources/seeder.py mirrors
    in SQL/Column form."""
    n = len(corpus)
    if n == 0:
        return []
    doc_lens = [len(d) for d in corpus]
    avgdl = sum(doc_lens) / n if n else 0.0
    freqs = [dict() for _ in corpus]
    df: dict[str, int] = {}
    for i, doc in enumerate(corpus):
        f = freqs[i]
        for w in doc:
            f[w] = f.get(w, 0) + 1
        for w in f:
            df[w] = df.get(w, 0) + 1
    idf: dict[str, float] = {}
    negative = []
    idf_sum = 0.0
    for w, d in df.items():
        v = math.log(n - d + 0.5) - math.log(d + 0.5)
        idf[w] = v
        idf_sum += v
        if v < 0:
            negative.append(w)
    avg_idf = idf_sum / len(idf) if idf else 0.0
    floor = epsilon * avg_idf
    for w in negative:
        idf[w] = floor
    scores = []
    for i in range(n):
        s = 0.0
        dl = doc_lens[i]
        denom_norm = k1 * (1 - b + b * dl / avgdl) if avgdl else k1
        for q in query:
            f = freqs[i].get(q, 0)
            if not f:
                continue
            s += idf.get(q, 0.0) * (f * (k1 + 1)) / (f + denom_norm)
        scores.append(s)
    return scores


_BM25_INLINE_TAGS = frozenset({
    "a", "abbr", "acronym", "b", "bdo", "big", "br", "button", "cite",
    "code", "dfn", "em", "i", "img", "input", "kbd", "label", "map",
    "object", "q", "samp", "script", "select", "small", "span",
    "strong", "sub", "sup", "textarea", "time", "tt", "var",
})  # content_filter_strategy.py:174-207
_BM25_HEADER_TAGS = frozenset(
    {"h1", "h2", "h3", "h4", "h5", "h6", "header"}
)
_CLEAN_EL_UNWANTED_TAGS = frozenset(
    {"script", "style", "aside", "form", "iframe", "noscript"}
)
_CLEAN_EL_UNWANTED_ATTRS = frozenset(
    {"style", "onclick", "onmouseover", "align", "bgcolor", "class", "id"}
)


def extract_page_query(root: Node, body: Node, user_query=None) -> str:
    """RelevantContentFilter.extract_page_query parity
    (content_filter_strategy.py:125-159): title → h1 → meta
    keywords/description → first long <p> fallback."""
    if user_query:
        return user_query
    parts: list[str] = []
    t = root.find("title")
    if t is not None and t.text:
        parts.append(t.text)
    h1 = root.find("h1")
    if h1 is not None:
        parts.append(h1.text_content())
    temp = ""
    for meta_name in ("keywords", "description"):
        for m in root.iter("meta"):
            if m.get("name") == meta_name and m.get("content"):
                parts.append(m.get("content"))
                temp += m.get("content")
                break
    if not temp:
        for p in body.iter("p"):
            text = p.text_content()
            if len(text) > 150:
                parts.append(text[:150])
                break
    return " ".join(filter(None, parts))


def extract_text_chunks(
    body: Node, min_word_threshold: int | None = None
) -> list[tuple]:
    """RelevantContentFilter.extract_text_chunks parity
    (content_filter_strategy.py:161-268): iterative DFS; inline tags
    never break the running chunk, block ends flush it tagged
    header/content; stripped strings GLUE without separators exactly
    as the reference's ''.join does."""
    chunks: list[tuple] = []
    current_text: list[str] = []
    chunk_index = 0

    def should_break(el: Node) -> bool:
        return el.tag not in _BM25_INLINE_TAGS and not (
            el.tag == "p" and len(current_text) == 0
        )

    stack: list[tuple] = [(body, False)]
    while stack:
        element, visited = stack.pop()
        if visited:
            if current_text and should_break(element):
                text = " ".join("".join(current_text).split())
                if text:
                    tag_type = (
                        "header"
                        if element.tag in _BM25_HEADER_TAGS
                        else "content"
                    )
                    chunks.append((chunk_index, text, tag_type, element))
                    chunk_index += 1
                current_text = []
            continue
        if isinstance(element, str):
            if element.strip():
                current_text.append(element.strip())
            continue
        if not element.children:
            continue
        stack.append((element, True))
        for child in reversed(element.children):
            stack.append((child, False))
    if current_text:
        text = " ".join("".join(current_text).split())
        if text:
            chunks.append((chunk_index, text, "content", body))
    if min_word_threshold:
        chunks = [
            c for c in chunks if len(c[1].split()) >= min_word_threshold
        ]
    return chunks


def clean_element(tag: Node) -> str:
    """RelevantContentFilter.clean_element parity
    (content_filter_strategy.py:329-377): skip unwanted tags, drop
    unwanted attrs, STRIPPED text pieces (no re-escaping, glued —
    the reference's string-builder does exactly this)."""
    builder: list[str] = []

    def render(el) -> None:
        if isinstance(el, str):
            builder.append(el.strip())
            return
        if el.tag in _CLEAN_EL_UNWANTED_TAGS:
            return
        builder.append(f"<{el.tag}")
        for k, v in el.attrs.items():
            if k not in _CLEAN_EL_UNWANTED_ATTRS:
                builder.append(f' {k}="{v}"')
        builder.append(">")
        for child in el.children:
            render(child)
        builder.append(f"</{el.tag}>")

    render(tag)
    return "".join(builder)


class BM25ContentFilter:
    """content_filter_strategy.py:380-540 parity: page query with
    fallbacks, ordered text chunks, BM25Okapi scoring, priority-tag
    boosts, threshold + document-order + text dedupe, clean_element
    serialization.

    Divergence, documented: ``use_stemming`` defaults to False here
    (the reference defaults True via snowballstemmer, which this
    container does not ship); pass any ``str -> str`` callable as
    ``stemmer`` to restore stemmed matching."""

    PRIORITY_TAGS = {
        "h1": 5.0, "h2": 4.0, "h3": 3.0, "title": 4.0, "strong": 2.0,
        "b": 1.5, "em": 1.5, "blockquote": 2.0, "code": 2.0,
        "pre": 1.5, "th": 1.5,
    }

    def __init__(
        self,
        user_query: str | None = None,
        bm25_threshold: float = 1.0,
        use_stemming: bool = False,
        stemmer=None,
    ):
        self.user_query = user_query
        self.bm25_threshold = bm25_threshold
        if use_stemming and stemmer is None:
            raise ValueError(
                "use_stemming needs a stemmer callable "
                "(snowballstemmer is not available in this environment)"
            )
        self.stemmer = stemmer if use_stemming else None

    def filter_content(
        self, html: str | None, min_word_threshold: int | None = None
    ) -> list[str]:
        if not html or not isinstance(html, str):
            return []
        root = parse_html(html)
        body = root.find("body")
        if body is None:
            root = parse_html(f"<body>{html}</body>")
            body = root.find("body")
        query = extract_page_query(root, body, self.user_query)
        if not query:
            return []
        candidates = extract_text_chunks(body, min_word_threshold)
        if not candidates:
            return []
        if self.stemmer is not None:
            corpus = [
                [self.stemmer(w) for w in chunk.lower().split()]
                for _, chunk, _, _ in candidates
            ]
            q_tokens = [self.stemmer(w) for w in query.lower().split()]
        else:
            corpus = [
                chunk.lower().split() for _, chunk, _, _ in candidates
            ]
            q_tokens = query.lower().split()
        corpus = [clean_tokens(t) for t in corpus]
        q_tokens = clean_tokens(q_tokens)
        scores = bm25_okapi_scores(corpus, q_tokens)
        selected = []
        for score, (index, chunk, _tag_type, tag) in zip(
            scores, candidates
        ):
            adjusted = score * self.PRIORITY_TAGS.get(tag.tag, 1.0)
            if adjusted >= self.bm25_threshold:
                selected.append((index, chunk, tag))
        if not selected:
            return []
        selected.sort(key=lambda x: x[0])
        seen_texts = set()
        out = []
        for index, chunk, tag in selected:
            if chunk not in seen_texts:
                seen_texts.add(chunk)
                out.append(clean_element(tag))
        return out
