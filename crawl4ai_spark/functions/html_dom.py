"""DOM-lite: a minimal HTML tree on stdlib ``html.parser``.

The reference's scraping tier is built on lxml/BeautifulSoup
(content_scraping_strategy.py:122-640); neither ships in this
container, and Spark has no built-in HTML parser, so the HTML-tier
operators (scrape / extract / markdown) share this small tree built by
the stdlib event parser instead.  It models exactly what those
operators need from lxml's ``HtmlElement``:

- ``text``          direct text before the first child element
                    (lxml ``.text`` — find_closest_parent_with_useful_text
                    keys off its truthiness, content_scraping_strategy.py:385)
- ``text_content()``all descendant text, document order (lxml
                    ``.text_content()``)
- ``parent``        upward walks (closest-parent description, picture
                    ancestor checks)
- ``iter(tag)``     document-order descendant iteration (the ``.//a``
                    xpath shape)

Parsing is lenient the way browsers are lenient: void elements never
push, a stray end tag pops to its nearest open match or is ignored,
and EOF auto-closes everything.  This is NOT a spec HTML5 tree builder
(no foster parenting, no active formatting elements); for the crawl
tier's link/media/metadata extraction over real-world-shaped pages the
simple stack model matches lxml's recovery on everything exercised in
tests/test_scrape.py.

Entity decoding (``&amp;`` etc.) is handled by ``html.parser`` itself
(``convert_charrefs=True`` default) — href attributes and text arrive
decoded, same as lxml.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# subtrees the reference removes before link/media extraction
# (content_scraping_strategy.py:788-812: style/link/meta/noscript
# dropped, script dropped with tail spliced — sibling text survives
# either way, so simply skipping the subtree is value-equivalent)
NON_CONTENT_TAGS = frozenset({"script", "style", "link", "meta", "noscript"})


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict | None = None, parent=None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # Node | str, document order
        self.parent = parent

    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    @property
    def text(self) -> str | None:
        """lxml ``.text``: concatenated text pieces before the first
        child element (None when there are none)."""
        pieces = []
        for c in self.children:
            if isinstance(c, str):
                pieces.append(c)
            else:
                break
        return "".join(pieces) if pieces else None

    def text_content(self, skip_tags: frozenset = frozenset()) -> str:
        out: list[str] = []
        self._gather_text(out, skip_tags)
        return "".join(out)

    def _gather_text(self, out: list, skip_tags: frozenset) -> None:
        for c in self.children:
            if isinstance(c, str):
                out.append(c)
            elif c.tag not in skip_tags:
                c._gather_text(out, skip_tags)

    def iter(self, *tags: str, skip_tags: frozenset = frozenset()):
        """Document-order descendants (self excluded), optionally
        restricted to ``tags`` and never descending into
        ``skip_tags`` subtrees — the ``.//tag`` xpath shape over the
        post-removal tree."""
        for c in self.children:
            if isinstance(c, str) or c.tag in skip_tags:
                continue
            if not tags or c.tag in tags:
                yield c
            yield from c.iter(*tags, skip_tags=skip_tags)

    def find(self, tag: str):
        for n in self.iter(tag):
            return n
        return None

    def ancestors(self):
        cur = self.parent
        while cur is not None:
            yield cur
            cur = cur.parent

    def classes(self) -> list[str]:
        return (self.get("class") or "").split()


# HTML5-style implicit end tags (the recovery lxml/browsers apply that
# a bare event parser does not): starting <li> closes an open <li>,
# table parts close each other, a block start closes an open <p> — so
# real-web `<li>a<li>b` markup yields SIBLINGS, not a nesting chain.
_CLOSES_ON_START = {
    "li": frozenset({"li"}),
    "p": frozenset({"p"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "tr": frozenset({"tr", "td", "th"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "thead": frozenset({"tr", "td", "th", "tbody"}),
    "tbody": frozenset({"tr", "td", "th", "thead"}),
    "tfoot": frozenset({"tr", "td", "th", "tbody"}),
    "option": frozenset({"option"}),
    "optgroup": frozenset({"option", "optgroup"}),
}

# block-level starts that implicitly close an open <p>
_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figure "
    "figcaption footer form h1 h2 h3 h4 h5 h6 header hr main nav ol "
    "pre section table ul".split()
)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__()  # convert_charrefs=True: entities decoded
        self.root = Node("#document")
        self.stack = [self.root]

    # -- element events ------------------------------------------------------

    def handle_starttag(self, tag, attrs):
        closes = _CLOSES_ON_START.get(tag)
        if closes:
            while len(self.stack) > 1 and self.stack[-1].tag in closes:
                self.stack.pop()
        if tag in _P_CLOSERS and self.stack[-1].tag == "p":
            self.stack.pop()
        # first attr occurrence wins, like lxml
        amap: dict[str, str] = {}
        for k, v in attrs:
            amap.setdefault(k, v if v is not None else "")
        node = Node(tag, amap, parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in VOID_ELEMENTS:
            self.stack.pop()

    def handle_endtag(self, tag):
        # pop to the nearest matching open element; ignore strays
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    # comments / declarations / PIs are not content
    def handle_comment(self, data):  # pragma: no cover - trivial
        pass


def parse_html(html: str | None) -> Node:
    """Parse (possibly malformed) HTML into a DOM-lite tree.  Never
    raises: the reference wraps document_fromstring failures into empty
    results, and stdlib HTMLParser is already error-recovering."""
    builder = _TreeBuilder()
    if html:
        try:
            builder.feed(html)
            builder.close()
        except Exception:  # pragma: no cover - HTMLParser rarely throws
            pass
    return builder.root
