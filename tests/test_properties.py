"""Hypothesis property tests over the pure-Python layer.

These pin the *invariants* the Spark plans rely on, complementary to
the golden-value suites: the PNG codec round-trips exactly (the image
validation join decodes what the corpus encoder wrote), the quantizer
stays above the PSNR gate by construction, the Manku block-permutation
banding has guaranteed recall (the phash_near_dup docstring's
pigeonhole claim, tested adversarially), the URL normalizers are
idempotent (the seen anti-join dedupes on normalized keys — a
non-idempotent normalizer would leak re-crawls), and filter
``reverse`` is an exact negation.

All pure Python/numpy — no SparkSession, so the whole file runs in
seconds and hypothesis can afford wide exploration.
"""

from __future__ import annotations

import numpy as np
from hypothesis import assume, given, settings, strategies as st

from crawl4ai_spark.functions.images import (
    _phash_blocks,
    average_hash,
    png_decode,
    png_encode,
    psnr,
    quantize_lossy,
    resize_nearest,
)
from crawl4ai_spark.functions.normalize import (
    efficient_normalize_url_for_deep_crawl,
    get_base_domain,
    is_external_url,
    normalize_url,
    normalize_url_for_deep_crawl,
)
from crawl4ai_spark.functions.filters import URLPatternFilter, py_valid_crawl_url


# --------------------------------------------------------------------------
# URL strategies: well-formed-ish URLs with adversarial paths/queries.
# Hosts avoid the literal substring "www" except as an explicit prefix —
# the reference's is_external_url strips "www." ANYWHERE in the netloc
# (utils.py quirk we mirror), which is out of scope for these invariants.
# --------------------------------------------------------------------------

_label = st.text(
    alphabet="abcdefghijklmnopqrstuvz0123456789-", min_size=1, max_size=8
).filter(lambda s: "www" not in s and not s.startswith("-") and not s.endswith("-"))

_host = st.lists(_label, min_size=2, max_size=4).map(".".join)

_pathseg = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789._~%+-", max_size=8
)

_path = st.lists(_pathseg, max_size=4).map(lambda segs: "/" + "/".join(segs))

_qkey = st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8)
_qval = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789%+ .", max_size=8)

_query = st.lists(st.tuples(_qkey, _qval), max_size=4).map(
    lambda kvs: "&".join(f"{k}={v}" for k, v in kvs)
)


@st.composite
def urls(draw, scheme=st.sampled_from(["http", "https"])):
    u = f"{draw(scheme)}://{draw(_host)}{draw(_path)}"
    q = draw(_query)
    if q:
        u += "?" + q
    if draw(st.booleans()):
        u += "#" + draw(_pathseg)
    return u


# --------------------------------------------------------------------------
# Normalizers: idempotence + shape invariants
# --------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(urls())
def test_deep_crawl_normalize_idempotent(u):
    once = normalize_url_for_deep_crawl(u, None)
    assert normalize_url_for_deep_crawl(once, None) == once
    assert "#" not in once  # fragment always dropped


@settings(max_examples=300, deadline=None)
@given(urls())
def test_full_normalize_idempotent(u):
    once = normalize_url(u, None)
    assert normalize_url(once, None) == once


@settings(max_examples=300, deadline=None)
@given(urls())
def test_efficient_normalize_idempotent(u):
    # Genuine reference quirk (hypothesis-found): N3 keeps the query
    # verbatim, so a query ending in whitespace survives pass 1 but is
    # strip()ped on re-entry — idempotence only holds for URLs whose
    # pre-fragment part carries no trailing whitespace.
    pre = u.split("#", 1)[0]
    assume(pre == pre.rstrip())
    once = efficient_normalize_url_for_deep_crawl(u, None)
    assert efficient_normalize_url_for_deep_crawl(once, None) == once
    # N3 keeps the query untouched but must still drop the fragment
    # and guarantee a non-empty path
    assert "#" not in once
    host_end = once.index("://") + 3
    assert "/" in once[host_end:]


@settings(max_examples=200, deadline=None)
@given(urls(), _pathseg)
def test_normalize_relative_resolution(base, seg):
    """A root-relative href lands on the base's scheme+netloc."""
    out = normalize_url_for_deep_crawl("/" + seg, base)
    from urllib.parse import urlparse

    pb, po = urlparse(base), urlparse(out)
    assert po.scheme == pb.scheme
    assert po.netloc == pb.netloc.lower()


@settings(max_examples=300, deadline=None)
@given(_host, _path)
def test_base_domain_invariants(host, path):
    url = f"http://{host}{path}"
    base = get_base_domain(url)
    assert ":" not in base
    # www. prefix never changes the base domain
    assert get_base_domain(f"http://www.{host}{path}") == base
    # a URL is never external to its own base domain
    assert is_external_url(url, base) is False


@settings(max_examples=300, deadline=None)
@given(urls())
def test_valid_crawl_url_accepts_normalized_http(u):
    once = normalize_url_for_deep_crawl(u, None)
    assert py_valid_crawl_url(once) is True


# --------------------------------------------------------------------------
# URLPatternFilter: reverse is an exact negation
# --------------------------------------------------------------------------

_patterns = st.lists(
    st.sampled_from(
        ["*.html", "*.pdf", "/docs/*", "*blog*", "^https://", r"\d{4}", "*/20??/*"]
    ),
    min_size=1,
    max_size=3,
)


@settings(max_examples=300, deadline=None)
@given(urls(), _patterns)
def test_pattern_filter_reverse_negates(u, pats):
    fwd = URLPatternFilter(pats).apply(u)
    rev = URLPatternFilter(pats, reverse=True).apply(u)
    assert rev == (not fwd)


# --------------------------------------------------------------------------
# PNG codec: exact round-trip (the image-validation join's correctness
# rests on decode(encode(x)) == x for the corpus encoder)
# --------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_exact(h, w, seed):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(pix)), pix)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_quantize_psnr_above_gate(h, w, seed):
    """step=4 quantization error is ≤ 2/channel ⇒ MSE ≤ 4 ⇒
    PSNR ≥ 10·log10(255²/4) ≈ 42.1 dB — always above the 40 dB
    validation gate, for EVERY image, not just the corpus ones."""
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert psnr(quantize_lossy(pix, step=4), pix) >= 42.0
    assert psnr(pix, pix) == float("inf")


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_resize_identity(h, w, seed):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(resize_nearest(pix, h, w), pix)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_average_hash_stable_64bit(seed):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    hsh = average_hash(pix)
    # signed int64 — the phash:int64 column contract (wraps negative
    # when bit 63 is set, matching Spark LongType)
    assert -(2**63) <= hsh < 2**63
    assert average_hash(pix) == hsh


# --------------------------------------------------------------------------
# Manku block-permutation banding: guaranteed recall (pigeonhole)
# --------------------------------------------------------------------------


def _block_vals(x: int, n_bits: int, blocks: int) -> list[int]:
    return [(x >> lo) & ((1 << w) - 1) for lo, w in _phash_blocks(n_bits, blocks)]


@settings(max_examples=400, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**64 - 1),
    st.lists(st.integers(min_value=0, max_value=63), min_size=0, max_size=4),
    st.integers(min_value=1, max_value=4),
)
def test_banding_pigeonhole_recall(x, flip_bits, max_hamming):
    """Any pair within ``max_hamming`` MUST share at least one of
    ``max_hamming + 1`` blocks — the exact-recall guarantee
    phash_near_dup's equi-join key relies on (adversarial bit flips,
    including several flips landing in the same block)."""
    flips = set(flip_bits[:max_hamming])
    y = x
    for b in flips:
        y ^= 1 << b
    blocks = max_hamming + 1
    ax, ay = _block_vals(x, 64, blocks), _block_vals(y, 64, blocks)
    assert any(a == b for a, b in zip(ax, ay))


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1), st.integers(2, 8))
def test_phash_blocks_partition_exactly(x, blocks):
    """Blocks tile the 64 bits exactly: reassembling block values
    reproduces the hash (no gap, no overlap)."""
    ranges = _phash_blocks(64, blocks)
    assert sum(w for _, w in ranges) == 64
    re = 0
    for (lo, w), v in zip(ranges, _block_vals(x, 64, blocks)):
        re |= v << lo
    assert re == x


# ---------------------------------------------------------------------------
# HTML tier (r5): the parser/scrapers must be total functions over
# arbitrary byte-soup — a crawl of the real web feeds them everything
# ---------------------------------------------------------------------------

_html_soup = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00"
    ),
    max_size=400,
)
_taggy = st.lists(
    st.sampled_from([
        "<div>", "</div>", "<a href='/x'>", "<a>", "</a>", "<p>", "<li>",
        "<img src=/i.png>", "<table>", "<tr>", "<td>", "</td>", "text ",
        "&amp;", "&bogus;", "<b>", "</i>", "<script>", "</script>",
        '<base href="/b/">', "<!-- c -->", "<![CDATA[x]]>", "<input",
        ">", "<", '"', "<h1>", "</h1>", "<meta name=description content=d>",
    ]),
    max_size=40,
).map("".join)


@given(st.one_of(_html_soup, _taggy))
@settings(max_examples=200, deadline=None)
def test_html_tier_total_on_soup(html):
    """parse/scrape/quick/clean/markdown/tables never raise and keep
    their output contracts on arbitrary soup (tag fragments, stray
    brackets, bogus entities, unclosed everything)."""
    from crawl4ai_spark.functions.html_dom import Node, parse_html
    from crawl4ai_spark.functions.markdown import (
        BM25ContentFilter,
        DefaultMarkdownGenerator,
        PruningContentFilter,
    )
    from crawl4ai_spark.functions.scrape import (
        py_cleaned_html,
        py_extract_metadata,
        py_quick_links,
        py_scrape_links,
        py_scrape_media,
    )
    from crawl4ai_spark.functions.tables import DefaultTableExtraction

    url = "https://prop.example.com/base/page"
    root = parse_html(html)
    assert isinstance(root, Node)
    links = py_scrape_links(url, html, score_links=True)
    assert all(isinstance(l["href"], str) for l in links)
    assert all(0.0 <= l["intrinsic_score"] <= 10.0 for l in links)
    quick = py_quick_links(url, html)
    # quick path never emits skipped schemes
    assert not any(
        l["href"].startswith(("javascript:", "mailto:", "tel:"))
        for l in quick
    )
    media = py_scrape_media(url, html, table_extraction=True)
    assert set(media) == {"images", "videos", "audios", "tables"}
    assert isinstance(py_extract_metadata(html), dict)
    assert isinstance(py_cleaned_html(url, html), str)
    DefaultTableExtraction().extract_tables(root)
    r = DefaultMarkdownGenerator(
        content_filter=PruningContentFilter()
    ).generate_markdown(html, url)
    assert isinstance(r["raw_markdown"], str)
    BM25ContentFilter(user_query="probe query").filter_content(html)


@given(_taggy)
@settings(max_examples=150, deadline=None)
def test_scrape_links_deduped_and_classified(html):
    """Scrape invariants the engine relies on: hrefs unique per side,
    classification consistent with is_external_url, text never None."""
    from crawl4ai_spark.functions.normalize import (
        get_base_domain,
        is_external_url,
    )
    from crawl4ai_spark.functions.scrape import py_scrape_links

    url = "https://prop.example.com/base/page"
    base = get_base_domain(url)
    links = py_scrape_links(url, html)
    internal = [l["href"] for l in links if not l["is_external"]]
    external = [l["href"] for l in links if l["is_external"]]
    assert len(internal) == len(set(internal))
    assert len(external) == len(set(external))
    for l in links:
        assert l["is_external"] == is_external_url(l["href"], base)
        assert l["text"] is not None and l["title"] is not None


@given(_taggy)
@settings(max_examples=100, deadline=None)
def test_node_html_reparse_stable(html):
    """Serialize → reparse → serialize is a fixed point: node_html
    output is valid HTML that parses back to itself."""
    from crawl4ai_spark.functions.extract import node_html
    from crawl4ai_spark.functions.html_dom import parse_html

    root = parse_html(html)
    ser = "".join(
        node_html(c) for c in root.children if not isinstance(c, str)
    )
    again = parse_html(ser)
    ser2 = "".join(
        node_html(c) for c in again.children if not isinstance(c, str)
    )
    assert ser == ser2
