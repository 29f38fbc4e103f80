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
