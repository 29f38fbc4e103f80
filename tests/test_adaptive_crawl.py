"""Composed AdaptiveCrawler (operators/adaptive_crawl.py) vs a pure-
Python mirror of the reference digest loop (adaptive_crawler.py:
1388-1446, StatisticalStrategy :309-546)."""

import math
import re

import pytest

from crawl4ai_spark.operators.adaptive_crawl import AdaptiveCrawler, AdaptiveSpec
from crawl4ai_spark.sources.adaptive_corpus import (
    adaptive_url,
    build_adaptive_pages,
    pages_pydict,
)


def _tok(s):
    s = re.sub(r"[^\w\s]", " ", s.lower(), flags=re.ASCII)
    return [t for t in s.split() if len(t) > 2]


def _confidence(kb, query):
    """kb: list of term-lists in crawl order."""
    q = _tok(query)
    n = len(kb)
    # coverage (adaptive_crawler.py:328-367)
    tf, df = {}, {}
    for terms in kb:
        for t in terms:
            tf[t] = tf.get(t, 0) + 1
        for t in set(terms):
            df[t] = df.get(t, 0) + 1
    max_tf = max(tf.values()) if tf else 1
    scores = []
    for t in q:
        d = df.get(t, 0)
        if d > 0:
            freq = math.log(1 + tf[t]) / math.log(1 + max_tf)
            scores.append((d / n) * (1 + 0.5 * freq))
        else:
            scores.append(0.0)
    coverage = min(1.0, math.sqrt(sum(scores) / len(scores))) if q and n else 0.0
    # consistency (:369-394)
    if n < 2:
        consistency = 1.0
    else:
        sets = [set(t) for t in kb]
        overlaps = [
            len(sets[i] & sets[j]) / len(sets[i] | sets[j])
            for i in range(n) for j in range(i + 1, n)
            if sets[i] and sets[j]
        ]
        consistency = sum(overlaps) / len(overlaps) if overlaps else 0.0
    # saturation (:396-411): per-document new-term counts in crawl order
    seen, hist = set(), []
    for terms in kb:
        new = [t for t in set(terms) if t not in seen]
        hist.append(len(new))
        seen.update(new)
    if len(hist) < 2:
        saturation = 0.0
    else:
        recent = hist[-1] if hist[-1] > 0 else 1
        initial = hist[0] if hist[0] > 0 else 1
        saturation = max(0.0, min(1.0, 1 - recent / initial))
    return coverage, consistency, saturation, (
        0.4 * coverage + 0.3 * consistency + 0.3 * saturation
    )


def _mirror_digest(pages, start, spec: AdaptiveSpec):
    """Reference loop shape; pending keyed by url like the operator."""
    q = _tok(spec.query)
    kb, kb_urls = [], []
    crawled, pending = set(), []
    crawled.add(start)
    if start in pages:
        kb.append(_tok(pages[start]["text"]))
        kb_urls.append(start)
        for u in pages[start]["links"]:
            if u not in crawled and u not in pending:
                pending.append(u)
    hist = []
    for depth in range(spec.max_depth + 1):
        cov, con, sat, conf = _confidence(kb, spec.query)
        row = dict(round=depth, n_kb=len(kb), n_pending=len(pending),
                   coverage=cov, consistency=con, saturation=sat,
                   confidence=conf, stop_reason="")
        if conf >= spec.confidence_threshold:
            row["stop_reason"] = "confidence"
        elif len(kb) >= spec.max_pages:
            row["stop_reason"] = "max_pages"
        elif not pending:
            row["stop_reason"] = "no_links"
        elif sat >= spec.saturation_threshold:
            row["stop_reason"] = "saturation"
        elif depth == spec.max_depth:
            row["stop_reason"] = "max_depth"
        hist.append(row)
        if row["stop_reason"]:
            break
        # rank (adaptive_crawler.py:413-470): distinct terms; link text
        # = target page text (head-peek as fetch-as-join)
        vocab = set()
        for terms in kb:
            vocab.update(terms)
        ranked = []
        for u in pending:
            terms = set(_tok(pages[u]["text"])) if u in pages else set()
            rel = (len(terms & set(q)) / len(q)) if q else 0.0
            if not kb:
                nov = 1.0
            elif not terms:
                nov = 0.5
            else:
                nov = len(terms - vocab) / len(terms)
            ranked.append((u, 0.5 * rel + 0.3 * nov + 0.2 * 1.0))
        ranked.sort(key=lambda t: (-t[1], t[0]))
        top = ranked[: spec.top_k_links]
        if not top or top[0][1] < spec.min_gain_threshold:
            hist[-1]["stop_reason"] = "min_gain"
            break
        for u, _ in top:
            crawled.add(u)
            pending.remove(u)
        for u, _ in top:
            if u in pages:
                kb.append(_tok(pages[u]["text"]))
                kb_urls.append(u)
                for v in pages[u]["links"]:
                    if v not in crawled and v not in pending:
                        pending.append(v)
    return hist, kb_urls


def test_digest_matches_python_mirror(spark):
    spec = AdaptiveSpec(query="alpha beta", confidence_threshold=0.5,
                        max_depth=6, max_pages=20, top_k_links=3)
    ac = AdaptiveCrawler(spark, build_adaptive_pages(spark, 40), spec)
    got = [r.asDict() for r in ac.digest(adaptive_url(0)).collect()]
    want, kb_urls = _mirror_digest(pages_pydict(40), adaptive_url(0), spec)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["round"], g["n_kb"], g["n_pending"], g["stop_reason"]) == (
            w["round"], w["n_kb"], w["n_pending"], w["stop_reason"])
        for k in ("coverage", "consistency", "saturation", "confidence"):
            assert g[k] == pytest.approx(w[k], abs=1e-9), (g["round"], k)
    # KB crawl order matches too (saturation depends on it)
    spark_kb = [r["url"] for r in ac.kb.orderBy("ord").collect()]
    assert spark_kb == kb_urls


def test_stop_by_max_pages(spark):
    spec = AdaptiveSpec(query="alpha beta", confidence_threshold=0.99,
                        max_depth=10, max_pages=5, top_k_links=3,
                        saturation_threshold=1.1)
    ac = AdaptiveCrawler(spark, build_adaptive_pages(spark, 40), spec)
    rows = ac.digest(adaptive_url(0)).collect()
    assert rows[-1]["stop_reason"] == "max_pages"
    assert rows[-1]["n_kb"] >= 5


def test_stop_by_no_links(spark):
    # 1-node corpus: seed has no in-range children
    spec = AdaptiveSpec(query="alpha beta", confidence_threshold=0.99,
                        max_depth=5)
    ac = AdaptiveCrawler(spark, build_adaptive_pages(spark, 1), spec)
    rows = ac.digest(adaptive_url(0)).collect()
    assert len(rows) == 1
    assert rows[0]["stop_reason"] == "no_links"


def test_no_kb_when_seed_fetch_fails(spark):
    # seed absent from the corpus: the fetch-join yields nothing, the
    # loop records one no_kb row and stops (fused-stats fallback path)
    spec = AdaptiveSpec(query="alpha beta")
    ac = AdaptiveCrawler(spark, build_adaptive_pages(spark, 40), spec)
    rows = ac.digest("https://nowhere.example.com/").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["stop_reason"] == "no_kb" and r["n_kb"] == 0
    assert r["confidence"] == 0.0 and r["n_pending"] == 0
