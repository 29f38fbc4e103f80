"""Deterministic corpus for the composed-AdaptiveCrawler contract
query: a 3-ary link tree whose info-gain ranking is CLOSED-FORM, so a
SQL oracle can replay selection, confidence and the stop rule exactly.

Construction (doc i, i = 0..n-1):

- links: i → 3i+1, 3i+2, 3i+3 (within range) — a tree, so every url
  is discovered exactly once and pending never holds duplicates.
- text terms (each term once per doc; reference tokenizer keeps
  length > 2):
    'alpha'  iff i % 2 == 0 and i > 0
    'beta'   iff i % 3 == 0 and i > 0
    'gamma'  always
    'uniq{i}x uniq{i}y'  always (2 per-doc unique terms)
  The SEED (i = 0) carries only gamma + its uniq terms — no query
  terms — so round-0 coverage is 0 and confidence grows as alpha/beta
  docs join the KB.
- url zero-pads the id ('p/007') so lexicographic tie-breaks equal
  numeric order.

Why gain is closed-form: after round 0 the KB vocabulary contains
alpha/beta/gamma (docs 2 and 3 are always selected first — see below),
so a candidate's new terms are exactly its 2 uniq terms.  With
query = 'alpha beta':

    relevance = (is_alpha + is_beta) / 2
    novelty   = 2 / n_terms,  n_terms = 3 + is_alpha + is_beta
    gain      = 0.5·relevance + 0.3·novelty + 0.2

which depends only on i — selection each round is simply the top-k of
pending by (gain desc, url asc).  Round 0 is the one special case
(alpha/beta still novel): pending is exactly {1,2,3} and top_k ≥ 3
selects all of them, so no ranking divergence is possible there.

All fetches succeed (success = true): the adaptive loop's stop logic,
not fetch failure, is the system under test here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BRANCH = 3


def adaptive_url(i: int) -> str:
    return f"https://a.example.com/p/{i:03d}"


def build_adaptive_pages(spark: SparkSession, n: int = 40) -> DataFrame:
    i = F.col("id")
    url = F.concat(
        F.lit("https://a.example.com/p/"),
        F.lpad(i.cast("string"), 3, "0"),
    )
    child = lambda k: i * BRANCH + k  # noqa: E731
    links = F.filter(
        F.array(*[child(k + 1) for k in range(BRANCH)]),
        lambda c: c < F.lit(n),
    )
    link_urls = F.transform(
        links,
        lambda c: F.concat(
            F.lit("https://a.example.com/p/"), F.lpad(c.cast("string"), 3, "0")
        ),
    )
    text = F.concat_ws(
        " ",
        F.when((i % 2 == 0) & (i > 0), F.lit("alpha")),
        F.when((i % 3 == 0) & (i > 0), F.lit("beta")),
        F.lit("gamma"),
        F.concat(F.lit("uniq"), i.cast("string"), F.lit("x")),
        F.concat(F.lit("uniq"), i.cast("string"), F.lit("y")),
    )
    return spark.range(0, n).select(
        url.alias("url"),
        F.lit(True).alias("success"),
        F.lit(200).alias("status_code"),
        link_urls.alias("links"),
        text.alias("text"),
    )


def pages_pydict(n: int = 40) -> dict:
    """Pure-Python mirror for the parity oracle in tests."""
    out = {}
    for i in range(n):
        terms = []
        if i % 2 == 0 and i > 0:
            terms.append("alpha")
        if i % 3 == 0 and i > 0:
            terms.append("beta")
        terms += ["gamma", f"uniq{i}x", f"uniq{i}y"]
        out[adaptive_url(i)] = {
            "text": " ".join(terms),
            "links": [
                adaptive_url(BRANCH * i + k)
                for k in range(1, BRANCH + 1)
                if BRANCH * i + k < n
            ],
        }
    return out
