"""URL canonicalization — exact parity with the reference normalizer.

Reference semantics being replicated (not copied):
- ``normalize_url_for_deep_crawl`` (/root/reference/crawl4ai/utils.py:2317-2373):
  urljoin(base, href.strip()) → lowercase netloc → drop fragment → drop
  the 5 tracking params {utm_source, utm_medium, utm_campaign, ref,
  fbclid} via parse_qs/urlencode(doseq) → path or '/' (trailing slash
  preserved).  Called by every deep-crawl strategy
  (bfs_strategy.py:170, dfs_strategy.py:299, bff_strategy.py:179), so
  byte-level parity here is what makes the URL-seen set match.
- ``get_base_domain`` (utils.py:2480-2528) and ``is_external_url``
  (utils.py:2531-2562) for internal/external link classification.

The scalar functions are pure Python (stdlib urllib) and are shipped to
executors inside Arrow-vectorized pandas UDFs — one Python call per row
but batched transfer, no per-row serialization (input_hint: "no per-row
Python" refers to row-at-a-time PySpark UDFs; pandas UDFs are the
sanctioned slow path).  URL hashing is JVM-side ``xxhash64``.
"""

from __future__ import annotations

import re
from urllib.parse import (
    parse_qs,
    parse_qsl,
    urlencode,
    urljoin,
    urlparse,
    urlunparse,
)

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "ref", "fbclid")

# The full normalizer's larger tracking set (utils.py:2285-2289),
# matched case-insensitively.
FULL_TRACKING_PARAMS = frozenset(
    {
        "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
        "gclid", "fbclid", "ref", "ref_src",
    }
)

# Second-level domains treated as part of the TLD (utils.py:2510-2524).
_SECOND_LEVEL = {
    "co", "com", "org", "gov", "edu", "net", "mil", "int", "ac",
    "ad", "ae", "af", "ag",
}

_SPECIAL_SCHEMES = ("mailto:", "tel:", "ftp:", "file:", "data:", "javascript:")


def _preserve_https(full_url: str, href: str, base_url: str | None) -> str:
    """Same-domain http→https upgrade (utils.py:2256-2263 / 2330-2337):
    applied only when the resolved URL is http, shares the base's netloc,
    and the href is not protocol-relative."""
    p_full = urlparse(full_url)
    p_base = urlparse(base_url or "")
    if (
        p_full.scheme == "http"
        and p_full.netloc == p_base.netloc
        and not href.strip().startswith("//")
    ):
        return full_url.replace("http://", "https://", 1)
    return full_url


def normalize_url(
    href: str | None,
    base_url: str | None,
    *,
    drop_query_tracking: bool = True,
    sort_query: bool = True,
    keep_fragment: bool = False,
    extra_drop_params=None,
    preserve_https: bool = False,
    original_scheme: str | None = None,
) -> str | None:
    """Full URL normalizer — N1, the variant the seeder / link_preview
    call (utils.py:2216-2314 semantics):

    urljoin(base, href.strip()) → optional same-domain https
    preservation → lowercase netloc → drop the LARGE tracking set
    {utm_*, gclid, fbclid, ref, ref_src} (+ extra_drop_params),
    case-insensitively, via parse_qsl(keep_blank_values=True) —
    blank values and repeated keys survive, unlike the deep-crawl
    variant's parse_qs → optionally sort query keys (stable) →
    optionally keep fragment.  Path is kept verbatim (NO '/' default —
    that's the deep-crawl variant's quirk, not this one's).
    """
    if not href:
        return None
    full_url = urljoin(base_url or "", href.strip())
    if preserve_https and original_scheme == "https":
        full_url = _preserve_https(full_url, href, base_url)
    parsed = urlparse(full_url)
    netloc = parsed.netloc.lower()
    query = parsed.query
    if query:
        params = parse_qsl(query, keep_blank_values=True)
        if drop_query_tracking:
            drop = set(FULL_TRACKING_PARAMS)
            if extra_drop_params:
                drop |= {p.lower() for p in extra_drop_params}
            params = [(k, v) for k, v in params if k.lower() not in drop]
        if sort_query:
            params.sort(key=lambda kv: kv[0])
        query = urlencode(params, doseq=True) if params else ""
    fragment = parsed.fragment if keep_fragment else ""
    return urlunparse(
        (parsed.scheme, netloc, parsed.path, parsed.params, query, fragment)
    )


def efficient_normalize_url_for_deep_crawl(
    href: str | None,
    base_url: str | None,
    preserve_https: bool = False,
    original_scheme: str | None = None,
) -> str | None:
    """Light normalizer — N3 (utils.py:2375-2412 semantics): urljoin,
    lowercase netloc, drop fragment, path or '/'; query kept UNTOUCHED
    (tracking params survive).  The reference lru_caches this; past the
    engine's seen anti-join each URL is normalized once, so no
    memoization is needed here."""
    if not href:
        return None
    full_url = urljoin(base_url or "", href.strip())
    if preserve_https and original_scheme == "https":
        full_url = _preserve_https(full_url, href, base_url)
    parsed = urlparse(full_url)
    return urlunparse(
        (
            parsed.scheme, parsed.netloc.lower(), parsed.path or "/",
            parsed.params, parsed.query, "",
        )
    )


def normalize_url_for_deep_crawl(
    href: str | None,
    base_url: str | None,
    preserve_https: bool = False,
    original_scheme: str | None = None,
) -> str | None:
    """Scalar normalizer with the exact semantics of utils.py:2317-2373."""
    if not href:
        return None
    full_url = urljoin(base_url or "", href.strip())
    if preserve_https and original_scheme == "https":
        full_url = _preserve_https(full_url, href, base_url)
    parsed = urlparse(full_url)
    netloc = parsed.netloc.lower()
    query = parsed.query
    if query:
        params = parse_qs(query)  # drops blank values, groups repeats
        for param in TRACKING_PARAMS:
            if param in params:
                del params[param]
        query = urlencode(params, doseq=True) if params else ""
    return urlunparse(
        (parsed.scheme, netloc, parsed.path or "/", parsed.params, query, "")
    )


def get_base_domain(url: str) -> str:
    """eTLD+1-ish base domain (utils.py:2480-2528 semantics)."""
    try:
        domain = urlparse(url).netloc.lower()
        if not domain:
            return ""
        domain = domain.split(":")[0]
        domain = re.sub(r"^www\.", "", domain)
        parts = domain.split(".")
        if len(parts) > 2 and parts[-2] in _SECOND_LEVEL:
            return ".".join(parts[-3:])
        return ".".join(parts[-2:])
    except Exception:
        return ""


def is_external_url(url: str, base_domain: str) -> bool:
    """utils.py:2531-2562 semantics: special schemes ⇒ external; relative
    ⇒ internal; else url domain must end with the base domain."""
    low = url.lower()
    if any(low.startswith(p) for p in _SPECIAL_SCHEMES):
        return True
    try:
        parsed = urlparse(url)
        if not parsed.netloc:
            return False
        url_domain = parsed.netloc.lower().split(":")[0].replace("www.", "")
        base = base_domain.lower().split(":")[0].replace("www.", "")
        return not url_domain.endswith(base)
    except Exception:
        return False


# --------------------------------------------------------------------------
# Vectorized (Arrow) wrappers
# --------------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def normalize_udf(href: pd.Series, base_url: pd.Series) -> pd.Series:
    return pd.Series(
        [normalize_url_for_deep_crawl(h, b) for h, b in zip(href, base_url)],
        dtype=object,
    )


def normalize_full_udf(**opts):
    """Factory: Arrow-vectorized N1 ``normalize_url`` with the given
    keyword options baked in (options are plain Python values, captured
    in the closure — they never become columns)."""

    @F.pandas_udf(T.StringType())
    def _udf(href: pd.Series, base_url: pd.Series) -> pd.Series:
        return pd.Series(
            [normalize_url(h, b, **opts) for h, b in zip(href, base_url)],
            dtype=object,
        )

    return _udf


@F.pandas_udf(T.StringType())
def normalize_efficient_udf(href: pd.Series, base_url: pd.Series) -> pd.Series:
    """Arrow-vectorized N3 ``efficient_normalize_url_for_deep_crawl``."""
    return pd.Series(
        [
            efficient_normalize_url_for_deep_crawl(h, b)
            for h, b in zip(href, base_url)
        ],
        dtype=object,
    )


@F.pandas_udf(T.StringType())
def base_domain_udf(url: pd.Series) -> pd.Series:
    return url.map(lambda u: get_base_domain(u) if u is not None else None)


@F.pandas_udf(T.BooleanType())
def is_external_udf(url: pd.Series, base_domain: pd.Series) -> pd.Series:
    return pd.Series(
        [is_external_url(u, b) if u is not None and b is not None else None
         for u, b in zip(url, base_domain)],
        dtype=object,
    )


def _fast_parts(href: Column, base_url: Column):
    """Shared Column pieces of the JVM fast-path normalizer."""
    h = F.trim(href)
    nofrag = F.substring_index(h, "#", 1)
    has_query = nofrag.contains("?")
    # Simple single-pair query: exactly one '?', one key=value pair whose
    # key and value use only unreserved chars ([A-Za-z0-9_.~-]).  For this
    # subset the reference's parse_qs → drop-tracking → urlencode(doseq)
    # round-trip (utils.py:2317-2373) reduces to a Column decision:
    #   - value empty        → parse_qs drops the pair      → query ''
    #   - key in TRACKING    → deleted                      → query ''
    #   - otherwise          → pair survives byte-for-byte  → query kept
    # (parse_qs %-decodes and '+'-decodes, urlencode re-quotes via
    # quote_plus; unreserved chars are fixed points of both, '=' '&' '%'
    # '+' and anything else fall to the UDF.)  At web scale this covers
    # the dominant query-bearing link classes (?page=2, ?utm_source=x,
    # ?id=123) without the JVM→Arrow→Python bridge, which profiling
    # showed capping multi-core scaling (see BENCH_SCALING.md r4).
    # All query-pieces are guarded by when(has_query, ...): CaseWhen
    # branches evaluate lazily at runtime, so the ~75% of anchors with
    # no '?' never pay the regex (these expressions are inlined into
    # every downstream consumer of norm_url, so per-row cost here is
    # multiplied — keep it minimal).
    q_ok = F.when(
        has_query,
        nofrag.rlike(r"^[^?]*\?[A-Za-z0-9_.~-]+=[A-Za-z0-9_.~-]*$"),
    ).otherwise(F.lit(True))
    # the pieces below are only consumed on rows simple_query admitted,
    # where there is exactly one '?' and one '=' — substring_index is
    # exact there (and garbage-but-unread elsewhere)
    qraw = F.substring_index(nofrag, "?", -1)
    qkey = F.substring_index(qraw, "=", 1)
    qval = F.substring_index(qraw, "=", -1)
    q_suffix = F.when(
        has_query & (qval != "") & ~qkey.isin(*TRACKING_PARAMS),
        F.concat(F.lit("?"), qraw),
    ).otherwise(F.lit(""))
    nofrag_noq = F.substring_index(nofrag, "?", 1)
    is_http_abs = nofrag.rlike(r"^(?i)https?://")
    # single leading slash (not protocol-relative //host)
    is_root_rel = nofrag.rlike(r"^/(?!/)")
    b_scheme = F.lower(
        F.regexp_extract(base_url, r"^(?i)([a-z][a-z0-9+.\-]*)://", 1)
    )
    b_netloc = F.lower(
        F.regexp_extract(base_url, r"^(?i)[a-z][a-z0-9+.\-]*://([^/?#]*)", 1)
    )
    # Root-relative hrefs containing dot-segments ('/a/../b', '/a/./b')
    # must fall to the UDF path: urljoin collapses them when resolving a
    # relative reference, but the fast expression concatenates the path
    # verbatim.  (Absolute http(s) hrefs legitimately KEEP dot-segments —
    # urljoin returns an absolute href unchanged.)  A dot-segment can
    # also end at the query separator ('/a/..?x=1'), so '?' terminates
    # the match like '/' or end-of-string.
    has_dot_segment = nofrag.rlike(r"/\.\.?(/|[?]|$)")
    # coalesce → false so a NULL base (or NULL href) routes to the UDF
    # fallback instead of vanishing from both filter branches.
    eligible = F.coalesce(
        href.isNotNull()
        & q_ok
        & (
            is_http_abs
            | (is_root_rel & ~has_dot_segment & (b_scheme != "") & (b_netloc != ""))
        ),
        F.lit(False),
    )
    scheme = F.lower(F.regexp_extract(nofrag, r"^(?i)(https?)://", 1))
    netloc = F.lower(F.regexp_extract(nofrag, r"^(?i)https?://([^/?#]*)", 1))
    path_abs = F.regexp_extract(nofrag, r"^(?i)https?://[^/?#]*([^?#]*)", 1)
    fast = F.when(
        is_http_abs,
        F.concat(
            scheme, F.lit("://"), netloc,
            F.when(path_abs == "", F.lit("/")).otherwise(path_abs),
            q_suffix,
        ),
    ).otherwise(F.concat(b_scheme, F.lit("://"), b_netloc, nofrag_noq, q_suffix))
    return eligible, fast


_FAST_PARTS_CACHE: dict = {}


def _fast_parts_cached(href_col: str, base_col: str):
    """Memoized ``_fast_parts`` over column NAMES (see with_normalized).

    Keyed on the SparkContext OBJECT (identity), not ``id(sc)``: the
    strong reference in the key pins the context object, so a restarted
    JVM can never hand a new context the recycled id of a dead one and
    serve its stale py4j Column handles.  Entries of non-current
    contexts are evicted on the next miss (bounded by the number of
    context restarts in a process — ~1 everywhere we run)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    key = (sc, href_col, base_col)
    hit = _FAST_PARTS_CACHE.get(key)
    if hit is None:
        for k in [k for k in _FAST_PARTS_CACHE if k[0] is not sc]:
            del _FAST_PARTS_CACHE[k]  # drop handles of dead contexts
        hit = _fast_parts(F.col(href_col), F.col(base_col))
        _FAST_PARTS_CACHE[key] = hit
    return hit


def normalize_eligible_fast(href: Column, base_url: Column) -> Column:
    """True where the JVM fast path reproduces the reference normalizer
    byte-for-byte: no query string AND (absolute http(s) OR
    root-relative against a usable base)."""
    eligible, _ = _fast_parts(href, base_url)
    return eligible


def normalize_fast_expr(href: Column, base_url: Column) -> Column:
    """JVM-only normalization, valid ONLY where ``normalize_eligible_fast``
    holds: strip fragment, lowercase netloc, default path to '/',
    resolve root-relative hrefs against the base's scheme+netloc.

    For no-query hrefs the reference normalizer (utils.py:2317-2373)
    reduces to exactly this ("urljoin → lowercase netloc → drop
    fragment → path or '/'"); tests/test_normalize.py cross-checks
    every case class against the Python implementation.
    """
    _, fast = _fast_parts(href, base_url)
    return fast


def with_normalized(
    df, href_col: str, base_col: str, out_col: str = "norm_url"
):
    """Hybrid normalizer over a DataFrame: JVM fast path + Arrow UDF
    fallback, via filter/union.

    The pandas-UDF bridge is the crawl loop's throughput ceiling (it
    moves every row JVM→Python→JVM and scales poorly with cores), so
    rows the fast path can handle never leave the JVM.  The split MUST
    be a physical filter+union: a ``when(eligible, fast).otherwise(udf)``
    expression does NOT short-circuit — Catalyst extracts Python UDFs
    into an unconditional ArrowEvalPython node, so every row would pay
    the bridge anyway.

    At web scale the overwhelming majority of anchors are plain
    absolute or root-relative links with no query string or a single
    simple key=value pair (?page=2, ?utm_source=x) — all JVM-eligible —
    so the Python fallback sees only the long tail (multi-param or
    escaped queries, special schemes, dot-segments, protocol-relative,
    empty).  r4 measured the bridge not just as per-row cost but as a
    multi-core scaling cap: the ArrowEvalPython stage running
    concurrently with the discovery's JVM stage inflated that stage's
    CPU ~2x at local[4] (cache/TLB pressure from 2x the busy threads),
    so rows kept out of Python pay off twice at high parallelism.

    The (eligible, fast) expression pair is a large Column tree whose
    construction is pure py4j chatter (~60 ms); strict crawl loops call
    this once per round with identical column names, so the pair is
    memoized per (SparkContext, href_col, base_col) — Columns are
    immutable unresolved expressions, reusable across DataFrames, and
    keying on the context object drops stale JVM handles if the
    context is rebuilt.
    """
    href, base = F.col(href_col), F.col(base_col)
    eligible, fast_expr = _fast_parts_cached(href_col, base_col)
    fast = df.filter(eligible).withColumn(out_col, fast_expr)
    # eligibility is coalesced to false (never NULL), so ~eligible is the
    # exact complement — no row can vanish from both branches.
    slow = df.filter(~eligible).withColumn(
        out_col, normalize_udf(href, base)
    )
    return fast.unionByName(slow)


def url_hash(url_col: Column | str) -> Column:
    """64-bit URL hash for the seen-set / bloom segments.

    JVM-side xxhash64 — stays in whole-stage codegen; the reference's
    bloom prototype uses mmh3 (deep_crawling/crazy.py:122-131) but any
    stable 64-bit hash satisfies the same contract with lower collision
    rate than murmur3-32.  For exact mmh3 digest parity use
    ``functions.hashing.murmur3_udf`` (vectorized Arrow batch, tested
    bit-exact vs mmh3 vectors) or ``BloomSegments(hash_family="murmur3")``.
    """
    return F.xxhash64(url_col)


# ONE netloc pattern shared by the Column extractor below and the
# pure-Python oracle mirror (operators/politeness.py:py_domain_of):
# oracle parity depends on the two staying byte-identical.
NETLOC_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"


def domain_of(url_col: Column | str) -> Column:
    """netloc extraction as a Column (lowercased, port kept).

    Matches ``urlparse(url).netloc.lower()`` for absolute http(s) URLs —
    the only kind that survives the validity predicate.
    """
    c = url_col if isinstance(url_col, Column) else F.col(url_col)
    return F.lower(F.regexp_extract(c, NETLOC_RE, 1))
