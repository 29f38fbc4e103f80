"""HTML-tier scraping: raw ``html`` column → the reference's link /
media / metadata structures.

This is the operator VERDICT-r4 ranked the #1 gap: the engine's fetch
join consumed corpus tables with pre-extracted ``links`` arrays; any
user pointing it at a real fetched-HTML table (Common Crawl WARC-derived
parquet) needs links built FROM the html.  Reference semantics being
replicated (not copied):

- full path:  ``WebScrapingStrategy._process_element``
  (content_scraping_strategy.py:231-377) — per-<a> ``normalize_url``,
  text_content/title, first-occurrence dedupe, internal/external split
  with per-link base_domain, <base href> override (raw replacement);
  images via ``process_image`` (:410-515) — icon/display:none/parent
  gates, the 7-signal score vs IMAGE_SCORE_THRESHOLD, srcset/picture
  variant expansion; video/audio + nested <source> rows (:344-360);
  metadata via ``extract_metadata_using_lxml`` (utils.py:1497-1581).
  script/style/link/meta/noscript subtrees are excluded from link/media
  extraction exactly as the reference removes them first
  (content_scraping_strategy.py:788-812).
- quick path: ``quick_extract_links`` (utils.py:2416-2459) — <a href>
  only, skip ``#``/``javascript:``/``mailto:``/``tel:``, deep-crawl
  normalizer, one shared seen-set across internal+external, text
  truncated to 200 chars, <base href> resolved via urljoin while
  base_domain stays anchored to the page url.

Execution model (100-TB shape): HTML parsing is genuinely impossible in
JVM Column expressions, so the full path is an Arrow-batched pandas UDF
(the sanctioned slow path — one Python call per row, batched transfer,
no per-row pickling) returning the complete links/media/meta struct in
ONE pass per page: one parse, one Python boundary crossing, columnar
output.  For the prefetch/seeding tier where only hrefs matter,
``quick_links_fast`` stays entirely JVM-side (regexp over the html) and
feeds the engine's existing normalize/dedupe pipeline — at corpus scan
scale that is the path that must survive 100 TB, and it does: a narrow
projection inside whole-stage codegen, no Python at all.

Determinism note: ``process_image`` in the reference picks
``detected_format`` by iterating a set literal — order varies with
PYTHONHASHSEED across processes.  Here the formats are probed in the
fixed tuple order below; identical outcome whenever at most one format
matches (every test fixture), deterministic superset behavior
otherwise.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.functions.html_dom import (
    NON_CONTENT_TAGS,
    Node,
    parse_html,
)
from crawl4ai_spark.functions.normalize import (
    get_base_domain,
    is_external_url,
    normalize_url,
    normalize_url_for_deep_crawl,
)

# config.py:75-85 — parity data table
SOCIAL_MEDIA_DOMAINS = [
    "facebook.com", "twitter.com", "x.com", "linkedin.com",
    "instagram.com", "pinterest.com", "tiktok.com", "snapchat.com",
    "reddit.com",
]

IMAGE_SCORE_THRESHOLD = 2           # config.py:95
IMAGE_DESCRIPTION_MIN_WORDS = 1     # config.py:49

# fixed probe order (see determinism note above); same members as the
# reference's set literal (content_scraping_strategy.py:434)
IMAGE_FORMATS = ("jpg", "jpeg", "png", "webp", "avif", "gif")

QUICK_SKIP_PREFIXES = ("#", "javascript:", "mailto:", "tel:")


# ---------------------------------------------------------------------------
# pure-Python mirrors (executed inside the Arrow UDFs; also the parity
# oracle for tests)
# ---------------------------------------------------------------------------

def _full_base_url(root: Node, url: str) -> str:
    """<base href> override, full-path flavor: the RAW base href
    replaces the resolution base wholesale
    (content_scraping_strategy.py:245-252 sets ``url = base_href``)."""
    head = root.find("head")
    if head is not None:
        for base in head.iter("base"):
            href = (base.get("href") or "").strip()
            if href:
                return href
    return url


_PUNCT = '.,!?;:"()[]{}'

NAV_CLASSES = ("nav", "menu", "primary", "main", "important")
BAD_CLASSES = ("ad", "sponsor", "track", "promo", "banner")
GOOD_RELS = ("canonical", "next", "prev", "chapter")
BAD_RELS = ("nofollow", "sponsored", "ugc")
GOOD_PATHS = ("/docs/", "/api/", "/guide/", "/tutorial/", "/reference/",
              "/manual/")
MEDIUM_PATHS = ("/blog/", "/article/", "/post/", "/news/")
BAD_PATHS = ("/admin/", "/login/", "/cart/", "/checkout/", "/track/",
             "/click/")
GENERIC_TEXTS = ("click here", "read more", "more info", "link", "here")
DOC_KEYWORDS = ("api", "reference", "guide", "tutorial", "example")
_DOCS_DOMAINS = ("docs.", "api.", "developer.", "reference.")


def py_page_context(root: Node, url: str) -> dict:
    """extract_page_context + the page-context harvest of _scrap
    (content_scraping_strategy.py:636-660, utils.py:3299-3341): title,
    h1-h3 headlines, meta description → lowercase term set (punct
    stripped, len>2), docs-site flag from the domain."""
    from urllib.parse import urlparse

    title_el = root.find("title")
    page_title = title_el.text_content() if title_el is not None else ""
    headlines = []
    for tag in ("h1", "h2", "h3"):
        for el in root.iter(tag):
            t = el.text_content().strip()
            if t:
                headlines.append(t)
    headlines_text = " ".join(headlines)
    meta_description = ""
    for m in root.iter("meta"):
        if m.get("name") == "description" and m.get("content") is not None:
            meta_description = m.get("content")
            break
    ctx = {
        "terms": set(),
        "headlines": headlines_text or "",
        "meta_description": meta_description or "",
        "domain": "",
        "is_docs_site": False,
    }
    try:
        parsed = urlparse(url)
        ctx["domain"] = parsed.netloc.lower()
        ctx["is_docs_site"] = any(
            d in ctx["domain"] for d in _DOCS_DOMAINS
        )
        all_text = (
            (page_title or "") + " " + ctx["headlines"] + " "
            + ctx["meta_description"]
        ).lower()
        ctx["terms"] = {
            w.strip(_PUNCT)
            for w in all_text.split()
            if len(w.strip(_PUNCT)) > 2
        }
    except Exception:
        pass
    return ctx


def py_intrinsic_score(
    link_text: str,
    url: str,
    title_attr: str,
    class_attr: str,
    rel_attr: str,
    page_context: dict,
) -> float:
    """calculate_link_intrinsic_score parity (utils.py:3344-3456):
    attribute/url/text quality + page-term overlap + docs-site bonus,
    clamped to [0, 10]."""
    score = 0.0
    try:
        if title_attr and len(title_attr.strip()) > 3:
            score += 1.0
        class_str = (class_attr or "").lower()
        if any(c in class_str for c in NAV_CLASSES):
            score += 1.5
        if any(c in class_str for c in BAD_CLASSES):
            score -= 1.0
        rel_str = (rel_attr or "").lower()
        if any(r in rel_str for r in GOOD_RELS):
            score += 1.0
        if any(r in rel_str for r in BAD_RELS):
            score -= 0.5
        url_lower = url.lower()
        if any(p in url_lower for p in GOOD_PATHS):
            score += 2.0
        elif any(p in url_lower for p in MEDIUM_PATHS):
            score += 1.0
        if any(p in url_lower for p in BAD_PATHS):
            score -= 1.5
        url_depth = url.count("/") - 2
        if url_depth <= 2:
            score += 1.0
        elif url_depth > 5:
            score -= 0.5
        if url.startswith("https://"):
            score += 0.5
        if link_text:
            text_clean = link_text.strip()
            if len(text_clean) > 3:
                score += 1.0
            word_count = len(text_clean.split())
            if word_count >= 2:
                score += 0.5
            if word_count >= 4:
                score += 0.5
            if text_clean.lower() in GENERIC_TEXTS:
                score -= 1.0
        if page_context.get("terms") and link_text:
            link_words = {
                w.strip(_PUNCT).lower()
                for w in link_text.split()
                if len(w.strip(_PUNCT)) > 2
            }
            if link_words:
                overlap = len(link_words & page_context["terms"])
                if overlap > 0:
                    score += (overlap / min(len(link_words), 10)) * 2.0
        if page_context.get("is_docs_site", False):
            if link_text and any(
                k in link_text.lower() for k in DOC_KEYWORDS
            ):
                score += 1.0
    except Exception:
        score = 0.5
    return max(0.0, min(score, 10.0))


def py_scrape_links(
    url: str,
    html: str | None,
    *,
    exclude_external_links: bool = False,
    exclude_domains: set[str] | frozenset[str] = frozenset(),
    exclude_social_media_links: bool = False,
    preserve_https: bool = False,
    original_scheme: str | None = None,
    score_links: bool = False,
) -> list[dict]:
    """One flat list of link dicts (href/text/title/base_domain/
    is_external), first occurrence per normalized href per side —
    the internal/external dicts of _process_element flattened, order =
    document order (dict insertion order in the reference)."""
    root = parse_html(html)
    base_domain = get_base_domain(url)
    excl = set(exclude_domains)
    if exclude_social_media_links:
        excl |= set(SOCIAL_MEDIA_DOMAINS)
    base = _full_base_url(root, url)
    # page context harvested ONCE per page when scoring
    # (content_scraping_strategy.py:636-660 does it before removals)
    ctx = py_page_context(root, url) if score_links else None

    seen_internal: set[str] = set()
    seen_external: set[str] = set()
    out: list[dict] = []
    for a in root.iter("a", skip_tags=NON_CONTENT_TAGS):
        href = (a.get("href") or "").strip()
        if not href:
            continue
        try:
            norm = normalize_url(
                href, base,
                preserve_https=preserve_https,
                original_scheme=original_scheme,
            )
        except Exception:
            continue  # reference logs and skips (:293-295)
        if not norm:
            continue
        text = a.text_content(skip_tags=NON_CONTENT_TAGS).strip()
        title = (a.get("title") or "").strip()
        link = {
            "href": norm,
            "text": text,
            "title": title,
            "base_domain": base_domain,
            "is_external": False,
            # score_links=False → 0, as the reference assigns
            # (content_scraping_strategy.py:286-289)
            "intrinsic_score": (
                py_intrinsic_score(
                    text, norm, title,
                    a.get("class") or "", a.get("rel") or "", ctx,
                )
                if score_links
                else 0.0
            ),
        }
        if is_external_url(norm, base_domain):
            link_dom = get_base_domain(norm)
            link["base_domain"] = link_dom
            link["is_external"] = True
            if exclude_external_links or link_dom in excl:
                continue
            if norm not in seen_external:
                seen_external.add(norm)
                out.append(link)
        else:
            if norm not in seen_internal:
                seen_internal.add(norm)
                out.append(link)
    return out


def py_quick_links(url: str, html: str | None) -> list[dict]:
    """quick_extract_links parity (utils.py:2416-2459): href+text only,
    one shared seen set, deep-crawl normalizer, base via urljoin,
    base_domain anchored to the page url."""
    from urllib.parse import urljoin

    root = parse_html(html)
    base_domain = get_base_domain(url)
    base = url
    head = root.find("head")
    if head is not None:
        for b in head.iter("base"):
            href = (b.get("href") or "").strip()
            if href:
                base = urljoin(url, href)
                break
    seen: set[str] = set()
    out: list[dict] = []
    for a in root.iter("a"):
        href = (a.get("href") or "").strip()
        if not href or href.startswith(QUICK_SKIP_PREFIXES):
            continue
        norm = normalize_url_for_deep_crawl(href, base)
        if not norm or norm in seen:
            continue
        seen.add(norm)
        out.append({
            "href": norm,
            "text": a.text_content().strip()[:200],
            "is_external": is_external_url(norm, base_domain),
        })
    return out


def _closest_parent_text(el: Node) -> str | None:
    """find_closest_parent_with_useful_text
    (content_scraping_strategy.py:380-395): first of self-then-ancestors
    with truthy ``.text`` AND ≥ threshold words in text_content."""
    cur: Node | None = el
    while cur is not None:
        if cur.text and len(
            cur.text_content().split()
        ) >= IMAGE_DESCRIPTION_MIN_WORDS:
            return cur.text_content().strip()
        cur = cur.parent
    return None


def _parse_srcset(s: str) -> list[dict]:
    """content_scraping_strategy.py:42-60."""
    variants = []
    for part in (s or "").split(","):
        part = part.strip()
        if not part:
            continue
        bits = part.split()
        if bits:
            width = (
                bits[1].rstrip("w").split(".")[0]
                if len(bits) > 1 and bits[1].endswith("w")
                else None
            )
            variants.append({"url": bits[0], "width": width})
    return variants


def _process_image(
    img: Node, idx: int, total: int, *,
    image_score_threshold: int = IMAGE_SCORE_THRESHOLD,
) -> list[dict]:
    style = img.get("style") or ""
    alt = img.get("alt") or ""
    src = img.get("src") or ""
    data_src = img.get("data-src") or ""
    srcset = img.get("srcset") or ""
    data_srcset = img.get("data-srcset") or ""

    if "display:none" in style:
        return []
    parent = img.parent
    if parent is not None:
        if parent.tag in ("button", "input"):
            return []
        if any(
            "button" in c or "icon" in c or "logo" in c
            for c in parent.classes()
        ):
            return []
    if (src and any(c in src for c in ("button", "icon", "logo"))) or (
        alt and any(c in alt for c in ("button", "icon", "logo"))
    ):
        return []

    score = 0
    width = img.get("width")
    if width and width.isdigit():
        score += 1 if int(width) > 150 else 0
    height = img.get("height")
    if height and height.isdigit():
        score += 1 if int(height) > 150 else 0
    if alt:
        score += 1
    score += idx / total < 0.5

    detected_format = None
    for u in (src, data_src, srcset, data_srcset):
        if u:
            matches = [f for f in IMAGE_FORMATS if f in u.lower()]
            if matches:
                detected_format = matches[0]
                score += 1
                break

    if srcset or data_srcset:
        score += 1
    picture = next(
        (anc for anc in img.ancestors() if anc.tag == "picture"), None
    )
    if picture is not None:
        score += 1
    if score <= image_score_threshold:
        return []

    unique: set[str] = set()
    variants: list[dict] = []
    base_info = {
        "alt": alt,
        "desc": _closest_parent_text(img),
        "score": int(score),
        "type": "image",
        "group_id": idx,
        "format": detected_format,
        "width": None,
    }

    def add(u: str, w: str | None = None):
        if u and not u.startswith("data:") and u not in unique:
            unique.add(u)
            v = dict(base_info, src=u)
            if w is not None:
                v["width"] = int(w) if str(w).lstrip("-").isdigit() else None
            variants.append(v)

    add(src)
    add(data_src)
    for ss in (srcset, data_srcset):
        for source in _parse_srcset(ss):
            add(source["url"], source["width"])
    if picture is not None:
        for source in picture.iter("source"):
            for src_data in _parse_srcset(source.get("srcset") or ""):
                add(src_data["url"], src_data["width"])
    for attr, value in img.attrs.items():
        if (
            attr.startswith("data-")
            and ("src" in attr or "srcset" in attr)
            and "http" in (value or "")
        ):
            add(value)
    return variants


def py_scrape_media(
    url: str,
    html: str | None,
    *,
    image_score_threshold: int = IMAGE_SCORE_THRESHOLD,
    exclude_external_images: bool = False,
    exclude_domains: set[str] | frozenset[str] = frozenset(),
    table_extraction=None,
) -> dict:
    """{"images": [...], "videos": [...], "audios": [...], "tables":
    [...]} mirroring _process_element's media loops
    (content_scraping_strategy.py:315-360) + the table_extraction
    strategy hook (:861-870; functions/tables.py).  Pass ``True`` for
    a default-config DefaultTableExtraction."""
    root = parse_html(html)
    base_domain = get_base_domain(url)
    excl = set(exclude_domains)

    images: list[dict] = []
    imgs = list(root.iter("img", skip_tags=NON_CONTENT_TAGS))
    total = len(imgs)
    for idx, img in enumerate(imgs):
        src = img.get("src") or ""
        img_domain = get_base_domain(src)
        if (img_domain in excl) or (
            exclude_external_images and is_external_url(src, base_domain)
        ):
            continue
        images.extend(
            _process_image(
                img, idx, total, image_score_threshold=image_score_threshold
            )
        )

    out = {"images": images, "videos": [], "audios": [], "tables": []}
    if table_extraction:
        if table_extraction is True:
            from crawl4ai_spark.functions.tables import (
                DefaultTableExtraction,
            )

            table_extraction = DefaultTableExtraction()
        out["tables"] = table_extraction.extract_tables(root)
    for media_type in ("video", "audio"):
        rows = out[media_type + "s"]
        for el in root.iter(media_type, skip_tags=NON_CONTENT_TAGS):
            info = {
                "src": el.get("src"),
                "alt": el.get("alt"),
                "type": media_type,
                "desc": _closest_parent_text(el),
            }
            rows.append(info)
            for source in el.iter("source"):
                s = source.get("src")
                if s:
                    rows.append(dict(info, src=s))
    return out


def py_extract_metadata(html: str | None) -> dict:
    """extract_metadata_using_lxml parity (utils.py:1497-1581): title
    (og:/twitter: fallback), description, keywords, author, og:* /
    twitter:* / article:* tags."""
    root = parse_html(html)
    head = root.find("head")
    if head is None:
        return {}
    meta: dict[str, str | None] = {}

    title = None
    t = head.find("title")
    if t is not None:
        title = t.text_content()
    if not title:
        for m in root.iter("meta"):
            if m.get("property") == "og:title" and m.get("content"):
                title = m.get("content")
                break
        else:
            for m in root.iter("meta"):
                if m.get("name") == "twitter:title" and m.get("content"):
                    title = m.get("content")
                    break
    meta["title"] = title.strip() if title else None

    def head_meta(attr: str, value: str) -> str | None:
        for m in head.iter("meta"):
            if m.get(attr) == value:
                c = m.get("content")
                return c.strip() if c is not None else None
        return None

    meta["description"] = head_meta("name", "description")
    meta["keywords"] = head_meta("name", "keywords")
    meta["author"] = head_meta("name", "author")
    for m in head.iter("meta"):
        prop = (m.get("property") or "").strip()
        name = (m.get("name") or "").strip()
        content = (m.get("content") or "").strip()
        if content and (
            prop.startswith(("og:", "article:"))
        ):
            meta[prop] = content
        elif content and name.startswith("twitter:"):
            meta[name] = content
    return meta


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

LINK_TYPE = T.ArrayType(T.StructType([
    T.StructField("href", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("base_domain", T.StringType()),
    T.StructField("is_external", T.BooleanType()),
    T.StructField("intrinsic_score", T.DoubleType()),
]))

_IMAGE_FIELDS = [
    T.StructField("src", T.StringType()),
    T.StructField("alt", T.StringType()),
    T.StructField("desc", T.StringType()),
    T.StructField("score", T.IntegerType()),
    T.StructField("group_id", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
]
_AV_FIELDS = [
    T.StructField("src", T.StringType()),
    T.StructField("alt", T.StringType()),
    T.StructField("desc", T.StringType()),
]
_TABLE_FIELDS = [
    T.StructField("headers", T.ArrayType(T.StringType())),
    T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType()))),
    T.StructField("caption", T.StringType()),
    T.StructField("summary", T.StringType()),
    T.StructField("row_count", T.IntegerType()),
    T.StructField("column_count", T.IntegerType()),
    T.StructField("has_headers", T.BooleanType()),
    T.StructField("table_id", T.StringType()),
]
MEDIA_TYPE = T.StructType([
    T.StructField("images", T.ArrayType(T.StructType(_IMAGE_FIELDS))),
    T.StructField("videos", T.ArrayType(T.StructType(_AV_FIELDS))),
    T.StructField("audios", T.ArrayType(T.StructType(_AV_FIELDS))),
    T.StructField("tables", T.ArrayType(T.StructType(_TABLE_FIELDS))),
])

META_TYPE = T.MapType(T.StringType(), T.StringType())

PAGE_TYPE = T.StructType([
    T.StructField("links", LINK_TYPE),
    T.StructField("media", MEDIA_TYPE),
    T.StructField("metadata", META_TYPE),
])


def _scrape_page_py(url: str, html: str | None, opts: dict) -> dict:
    links = py_scrape_links(
        url, html,
        exclude_external_links=opts.get("exclude_external_links", False),
        exclude_domains=opts.get("exclude_domains", frozenset()),
        exclude_social_media_links=opts.get(
            "exclude_social_media_links", False
        ),
        score_links=opts.get("score_links", False),
    )
    media = py_scrape_media(
        url, html,
        image_score_threshold=opts.get(
            "image_score_threshold", IMAGE_SCORE_THRESHOLD
        ),
        exclude_external_images=opts.get("exclude_external_images", False),
        exclude_domains=opts.get("exclude_domains", frozenset()),
        table_extraction=opts.get("table_extraction"),
    )
    m = py_extract_metadata(html)
    return {
        "links": links,
        "media": {
            "images": [
                {k: v for k, v in img.items() if k != "type"}
                for img in media["images"]
            ],
            "videos": [
                {k: v for k, v in r.items() if k != "type"}
                for r in media["videos"]
            ],
            "audios": [
                {k: v for k, v in r.items() if k != "type"}
                for r in media["audios"]
            ],
            "tables": [
                {
                    "headers": t["headers"],
                    "rows": t["rows"],
                    "caption": t["caption"],
                    "summary": t["summary"],
                    "row_count": t["metadata"]["row_count"],
                    "column_count": t["metadata"]["column_count"],
                    "has_headers": t["metadata"]["has_headers"],
                    "table_id": t["metadata"].get("id"),
                }
                for t in media["tables"]
            ],
        },
        "metadata": {k: v for k, v in m.items() if v is not None},
    }


def scrape_page_udf(**opts):
    """Arrow-batched scrape: (url, html) → struct(links, media,
    metadata) — ONE parse and ONE Python crossing per page."""
    frozen = dict(opts)

    @F.pandas_udf(PAGE_TYPE)
    def _udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
        rows = [
            _scrape_page_py(u, h, frozen)
            for u, h in zip(url, html)
        ]
        return pd.DataFrame(rows, columns=["links", "media", "metadata"])

    return _udf


def scrape_links_udf(**opts):
    """(url, html) → array<struct href,text,title,base_domain,
    is_external> — the full-path link extractor alone."""
    frozen = dict(opts)

    @F.pandas_udf(LINK_TYPE)
    def _udf(url: pd.Series, html: pd.Series) -> pd.Series:
        return pd.Series([
            py_scrape_links(u, h, **frozen) for u, h in zip(url, html)
        ])

    return _udf


QUICK_LINK_TYPE = T.ArrayType(T.StructType([
    T.StructField("href", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("is_external", T.BooleanType()),
]))


@F.pandas_udf(QUICK_LINK_TYPE)
def quick_links_udf(url: pd.Series, html: pd.Series) -> pd.Series:
    return pd.Series([
        py_quick_links(u, h) for u, h in zip(url, html)
    ])


def with_scraped_page(
    df: DataFrame, url_col: str = "url", html_col: str = "html", **opts
) -> DataFrame:
    """df + ``scraped`` struct column (links/media/metadata)."""
    return df.withColumn(
        "scraped", scrape_page_udf(**opts)(F.col(url_col), F.col(html_col))
    )


# -- JVM fast path -----------------------------------------------------------

_ANCHOR_RE = r'(?is)<a\b[^>]*\bhref\s*=\s*"([^"]*)"[^>]*>'
_ANCHOR_FULL_RE = r'(?is)<a\b[^>]*\bhref\s*=\s*"[^"]*"[^>]*>(.*?)</a>'
_BASE_RE = r'(?is)<base\b[^>]*\bhref\s*=\s*"([^"]*)"'


def _decode_entities(c: Column) -> Column:
    """The five standard entities + numeric &#NN; are what double-quoted
    href attributes legally need; &amp; LAST so '&amp;lt;' decodes to
    '&lt;' not '<' (single-pass parity with real decoders is not
    attempted — this is the prefetch approximation, documented)."""
    c = F.regexp_replace(c, "&lt;", "<")
    c = F.regexp_replace(c, "&gt;", ">")
    c = F.regexp_replace(c, "&quot;", '"')
    c = F.regexp_replace(c, "&#39;", "'")
    c = F.regexp_replace(c, "&amp;", "&")
    return c


def quick_links_fast(html: Column | str) -> Column:
    """Prefetch-tier link mining, 100% JVM: array<struct<href,text>> of
    raw (unnormalized, unresolved) anchors.  Pair with the engine's
    existing normalize/dedupe pipeline — the same division of labor as
    the corpus ``links`` arrays, so the whole scan stays inside
    whole-stage codegen with zero Python.  Approximations vs the UDF
    quick path (by design, for the scan tier): double-quoted hrefs
    only, tag-stripped inner text, entity decode limited to the five
    standard entities."""
    h = html if isinstance(html, Column) else F.col(html)
    hrefs = F.regexp_extract_all(h, F.lit(_ANCHOR_RE), F.lit(1))
    texts = F.regexp_extract_all(h, F.lit(_ANCHOR_FULL_RE), F.lit(1))
    # zip positionally; anchors without a closing </a> make the two
    # arrays ragged — zip_with pads with NULL text, href side wins
    pairs = F.zip_with(
        hrefs, texts,
        lambda href, text: F.struct(
            F.trim(_decode_entities(href)).alias("href"),
            F.trim(_decode_entities(F.regexp_replace(
                F.coalesce(text, F.lit("")), r"(?s)<[^>]*>", ""
            ))).alias("text"),
        ),
    )
    return F.filter(
        pairs,
        lambda p: (p["href"] != "")
        & ~p["href"].rlike(r"^(#|javascript:|mailto:|tel:)"),
    )


def base_href_fast(html: Column | str) -> Column:
    """<base href> of the page (empty string when absent) — JVM regex,
    for resolving quick_links_fast hrefs at the engine boundary."""
    h = html if isinstance(html, Column) else F.col(html)
    return F.regexp_extract(h, _BASE_RE, 1)


# -- engine wiring: html corpus → fetch-shaped pages -------------------------

_SCHEME_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)"
_PROTO_REL_RE = r"^//([^/:?#]+)"

# normalize._SECOND_LEVEL, JVM copy (get_base_domain parity)
_SECOND_LEVEL_SQL = (
    "array('co','com','org','gov','edu','net','mil','int','ac',"
    "'ad','ae','af','ag')"
)


def base_domain_fast(url: Column | str) -> Column:
    """JVM mirror of normalize.get_base_domain: lowercase host minus
    port and leading www., eTLD+1 with the second-level-domain list."""
    u = url if isinstance(url, Column) else F.col(url)
    host = F.lower(
        F.coalesce(
            F.nullif(F.regexp_extract(u, _SCHEME_HOST_RE, 1), F.lit("")),
            F.regexp_extract(u, _PROTO_REL_RE, 1),
        )
    )
    host = F.regexp_replace(host, r"^www\.", "")
    parts = F.split(host, r"\.")
    second = F.element_at(parts, -2)
    return F.when(
        (F.size(parts) > 2)
        & F.array_contains(F.expr(_SECOND_LEVEL_SQL), second),
        F.concat_ws(".", F.slice(parts, -3, 3)),
    ).otherwise(F.concat_ws(".", F.slice(parts, -2, 2)))


def is_external_fast(href: Column, page_url: Column) -> Column:
    """JVM mirror of normalize.is_external_url for the post-skip-filter
    cases (absolute http(s) / protocol-relative / relative hrefs —
    special schemes are already filtered by quick_links_fast).  Python
    quirk mirrored: the url side strips EVERY "www." occurrence
    (str.replace), the base side only the leading one."""
    host = F.lower(
        F.coalesce(
            F.nullif(F.regexp_extract(href, _SCHEME_HOST_RE, 1), F.lit("")),
            F.nullif(F.regexp_extract(href, _PROTO_REL_RE, 1), F.lit("")),
        )
    )
    url_domain = F.regexp_replace(host, r"www\.", "")
    base = base_domain_fast(page_url)
    return F.when(
        host.isNull() | (host == ""), F.lit(False)
    ).otherwise(~F.endswith(url_domain, base))


def scraped_pages(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    mode: str = "fast",
    **opts,
) -> DataFrame:
    """html corpus → the CrawlEngine fetch shape (url, success,
    status_code, links array<struct<href,is_external>>), links built
    FROM the html — the VERDICT-r4 #1 wiring: point the engine at any
    fetched-HTML table (e.g. Common Crawl WARC-derived parquet).

    mode="fast"   quick_links_fast, 100% JVM (the 100-TB scan path);
                  raw hrefs — the engine's own normalize/dedupe
                  pipeline resolves them, exactly as it does for
                  corpus link arrays.  <base href> pages are resolved
                  by the engine against the page url (approximation,
                  exact for absolute/root-relative hrefs).
    mode="quick"  quick_extract_links parity via Arrow UDF
                  (deep-normalized hrefs, decoys skipped).
    mode="full"   _process_element parity via Arrow UDF (full
                  normalizer, decoy anchors kept: '#'→self-link,
                  javascript:/mailto: → external rows).
    """
    u, h = F.col(url_col), F.col(html_col)
    if mode == "fast":
        links = F.transform(
            quick_links_fast(h),
            lambda x: F.struct(
                x["href"].alias("href"),
                is_external_fast(x["href"], u).alias("is_external"),
            ),
        )
    elif mode == "quick":
        links = F.transform(
            quick_links_udf(u, h),
            lambda x: F.struct(
                x["href"].alias("href"),
                x["is_external"].alias("is_external"),
            ),
        )
    elif mode == "full":
        links = F.transform(
            scrape_links_udf(**opts)(u, h),
            lambda x: F.struct(
                x["href"].alias("href"),
                x["is_external"].alias("is_external"),
            ),
        )
    else:
        raise ValueError(f"unknown scrape mode: {mode!r}")
    return df.select(
        u.alias("url"),
        F.col("success"),
        F.col("status_code"),
        links.alias("links"),
    )


# -- cleaned_html (the _scrap cleaning pipeline) -----------------------------

# config.py:51-74 — parity data tables
IMPORTANT_ATTRS = (
    "src", "href", "alt", "title", "width", "height", "class", "id",
    "rowspan", "colspan",
)
ONLY_TEXT_ELIGIBLE_TAGS = (
    "b", "i", "u", "span", "del", "ins", "sub", "sup", "strong", "em",
    "code", "kbd", "var", "s", "q", "abbr", "cite", "dfn", "time",
    "small", "mark",
)
_EMPTY_BYPASS_TAGS = frozenset(
    "a img br hr input meta link source track wbr tr td th".split()
)  # content_scraping_strategy.py:522-536
_BASE64_RE = __import__("re").compile(r'data:image/[^;]+;base64,([^"]+)')


def _clone(node: Node, parent=None) -> Node:
    c = Node(node.tag, dict(node.attrs), parent=parent)
    c.children = [
        ch if isinstance(ch, str) else _clone(ch, c) for ch in node.children
    ]
    return c


def _remove_node(el: Node) -> None:
    if el.parent is not None and el in el.parent.children:
        el.parent.children.remove(el)


CLEAN_OPT_KEYS = frozenset({
    "excluded_tags", "excluded_selector", "css_selector",
    "target_elements", "only_text", "remove_forms",
    "exclude_all_images", "keep_data_attributes", "word_count_threshold",
})


def py_cleaned_html(
    url: str,
    html: str | None,
    *,
    excluded_tags: tuple | list = (),
    excluded_selector: str | None = None,
    css_selector: str | None = None,
    target_elements: list | None = None,
    only_text: bool = False,
    remove_forms: bool = False,
    exclude_all_images: bool = False,
    keep_data_attributes: bool = False,
    word_count_threshold: int = 1,
) -> str:
    """``cleaned_html`` parity — the _scrap cleaning pipeline
    (content_scraping_strategy.py:615-905) in reference order:
    exclude_all_images → excluded_tags → excluded_selector →
    css_selector / target_elements content capture (DEEPCOPIED BEFORE
    later cleaning, so a css-selected content element keeps its
    styles/attributes — the reference's own behavior) → style/link/
    meta/noscript/script removal → remove_forms → only_text span
    replacement → base64 src cleanup → bottom-up empty-element removal
    (word_count_threshold=1 at the call site) → attribute stripping to
    IMPORTANT_ATTRS (+data-* when kept).

    Divergence, documented: serialization is functions/extract.node_html
    (compact), not lxml ``tostring(pretty_print=True)`` — structural
    parity, not byte formatting (lxml is not in this container).
    Mermaid-SVG placeholdering (:736-790) is out of scope (no mermaid
    in the crawl tier's corpora)."""
    from crawl4ai_spark.functions.extract import css_select, node_html

    root = parse_html(html)
    body = root

    if exclude_all_images:
        for img in list(body.iter("img")):
            _remove_node(img)
    for tag in excluded_tags or ():
        for el in list(body.iter(tag)):
            _remove_node(el)
    if excluded_selector:
        try:
            for el in css_select(body, excluded_selector):
                _remove_node(el)
        except ValueError:
            pass  # reference logs and continues (:688-691)

    content: Node | None = None
    if css_selector:
        try:
            selected = css_select(body, css_selector)
        except ValueError:
            selected = []
        if selected:
            content = Node("div")
            content.children = [_clone(n, content) for n in selected]
        else:
            content = body
    if target_elements:
        source = content if content is not None else body
        found: list[Node] = []
        for t in target_elements:
            try:
                found.extend(css_select(source, t))
            except ValueError:
                return ""
        content = Node("div")
        content.children = [_clone(n, content) for n in found]
    elif content is None:
        content = body

    # style/link/meta/noscript/script removal; sibling text survives by
    # construction in this DOM (the reference splices script tails)
    for tag in ("style", "link", "meta", "noscript", "script"):
        for el in list(body.iter(tag)):
            _remove_node(el)
    if remove_forms:
        for el in list(body.iter("form")):
            _remove_node(el)

    if only_text:
        for tag in ONLY_TEXT_ELIGIBLE_TAGS:
            for el in list(body.iter(tag)):
                if el.parent is None:
                    continue
                span = Node("span", parent=el.parent)
                span.children = [el.text_content()]
                try:
                    idx = el.parent.children.index(el)
                    el.parent.children[idx] = span
                except ValueError:
                    pass

    for img in body.iter("img"):
        src = img.get("src") or ""
        if _BASE64_RE.match(src):
            img.attrs["src"] = _BASE64_RE.sub("", src)

    # bottom-up empty-element removal (:517-577)
    for el in reversed(list(body.iter())):
        if el.tag in _EMPTY_BYPASS_TAGS:
            continue
        if any(a.tag in ("pre", "code") for a in el.ancestors()):
            continue
        text = el.text_content().strip()
        has_child_elements = any(
            isinstance(c, Node) for c in el.children
        )
        if len(text.split()) < word_count_threshold and not has_child_elements:
            _remove_node(el)

    # attribute stripping (:578-613)
    keep = set(IMPORTANT_ATTRS)
    for el in [body, *body.iter()]:
        el.attrs = {
            k: v
            for k, v in el.attrs.items()
            if k in keep
            or (keep_data_attributes and k.startswith("data-"))
        }

    if content.tag == "#document":
        out = "".join(
            node_html(c) if isinstance(c, Node) else c
            for c in content.children
        )
    else:
        out = node_html(content)
    return out.strip()


@F.pandas_udf(T.StringType())
def _cleaned_html_default_udf(url: pd.Series, html: pd.Series) -> pd.Series:
    return pd.Series([py_cleaned_html(u, h) for u, h in zip(url, html)])


def cleaned_html_udf(**opts):
    """(url, html) → cleaned_html string; Arrow-batched."""
    if not opts:
        return _cleaned_html_default_udf
    frozen = dict(opts)

    @F.pandas_udf(T.StringType())
    def _udf(url: pd.Series, html: pd.Series) -> pd.Series:
        return pd.Series([
            py_cleaned_html(u, h, **frozen) for u, h in zip(url, html)
        ])

    return _udf
