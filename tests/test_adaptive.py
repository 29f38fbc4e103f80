"""A5 adaptive-confidence metrics vs a pure-Python reference mirror.

The mirror implements adaptive_crawler.py:309-411 verbatim (tokenize,
tf/df update order, coverage/consistency/saturation formulas) so the
distributed implementation is checked against an independent
single-process execution of the reference algorithm.
"""

from __future__ import annotations

import math
import re

import pytest

from crawl4ai_spark.functions import adaptive as A


# -- pure-python reference mirror (adaptive_crawler.py) ---------------------

def tok(text: str) -> list[str]:
    text = re.sub(r"[^\w\s]", " ", text.lower(), flags=re.ASCII)
    return [t for t in text.split() if len(t) > 2]


def ref_metrics(texts: list[str], query: str, kb_limit: int):
    tf: dict[str, int] = {}
    df: dict[str, int] = {}
    history = []
    for text in texts:
        terms = tok(text)
        before = len(tf)
        seen = set()
        for t in terms:
            tf[t] = tf.get(t, 0) + 1
            seen.add(t)
        for t in seen:
            df[t] = df.get(t, 0) + 1
        history.append(len(tf) - before)
    n = len(texts)

    # coverage (adaptive_crawler.py:328-367)
    qterms = tok(query.lower())
    max_tf = max(tf.values()) if tf else 1
    scores = []
    for t in qterms:
        d = df.get(t, 0)
        if d > 0:
            freq = math.log(1 + tf[t]) / math.log(1 + max_tf) if max_tf > 0 else 0
            scores.append((d / n) * (1 + 0.5 * freq))
        else:
            scores.append(0.0)
    coverage = min(1.0, math.sqrt(sum(scores) / len(scores))) if scores and n else 0.0

    # consistency (:369-394) over the first kb_limit docs
    kb = [set(tok(t)) for t in texts[:kb_limit]]
    if len(kb) < 2:
        consistency = 1.0
    else:
        overlaps = []
        for i in range(len(kb)):
            for j in range(i + 1, len(kb)):
                if kb[i] and kb[j]:
                    overlaps.append(len(kb[i] & kb[j]) / len(kb[i] | kb[j]))
        consistency = sum(overlaps) / len(overlaps) if overlaps else 0.0

    # saturation (:396-411)
    if len(history) < 2:
        saturation = 0.0
    else:
        recent = history[-1] if history[-1] > 0 else 1
        initial = history[0] if history[0] > 0 else 1
        saturation = max(0.0, min(1 - recent / initial, 1.0))

    return coverage, consistency, saturation, (
        0.4 * coverage + 0.3 * consistency + 0.3 * saturation
    )


TEXTS = [
    "Spark crawls the web with data pipelines and data joins.",
    "The web crawler visits pages; pages link to other pages!",
    "Data engineering with spark: joins, shuffles, and pipelines.",
    "An unrelated note about gardening tulips in spring soil.",
    "spark spark spark data data web",
    "",
    "tiny a b c",  # only 'tiny' survives len>2
    "The crawler revisits the web pages it crawls for data.",
]


@pytest.mark.parametrize("query", ["spark data web", "gardening", "zzz missing"])
def test_confidence_matches_reference_mirror(spark, query):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = A.confidence_df(docs, query, kb_limit=5).collect()[0]
    want = ref_metrics(TEXTS, query, kb_limit=5)
    assert got["coverage"] == pytest.approx(want[0], abs=1e-9)
    assert got["consistency"] == pytest.approx(want[1], abs=1e-9)
    assert got["saturation"] == pytest.approx(want[2], abs=1e-9)
    assert got["confidence"] == pytest.approx(want[3], abs=1e-9)


def test_edge_single_doc(spark):
    docs = spark.createDataFrame([(0, "one doc only")], "doc_id long, text string")
    row = A.confidence_df(docs, "doc", kb_limit=5).collect()[0]
    want = ref_metrics(["one doc only"], "doc", kb_limit=5)
    assert row["consistency"] == 1.0
    assert row["saturation"] == 0.0
    assert row["coverage"] == pytest.approx(want[0], abs=1e-9)
