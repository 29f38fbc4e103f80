"""Adaptive EmbeddingStrategy: KB dedup, coverage gaps, hybrid
confidence, gap-driven link selection, stopping policy."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.adaptive_embedding import (
    coverage_gaps,
    embedding_confidence,
    kb_dedup,
    learning_score,
    select_links_for_gaps,
    should_stop,
)


@pytest.fixture(scope="module")
def kb(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.7, 0.7, 0.0]),
    ]
    return spark.createDataFrame(rows, "doc_id long, embedding array<double>")


def test_kb_dedup_drops_near_identical(spark, kb):
    new = spark.createDataFrame(
        [
            (10, [0.99, 0.01, 0.0]),   # ~parallel to doc 1 ⇒ dropped
            (11, [0.0, 0.0, 1.0]),     # orthogonal ⇒ kept
        ],
        "doc_id long, embedding array<double>",
    )
    kept = {r["doc_id"] for r in kb_dedup(new, kb, threshold=0.95).collect()}
    assert kept == {11}
    assert {r["doc_id"] for r in kb_dedup(new, None).collect()} == {10, 11}


def test_coverage_gaps_and_confidence(spark, kb):
    queries = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),   # exactly covered ⇒ gap 0
            (1, [0.0, 0.0, 1.0]),   # orthogonal to all ⇒ gap 1
        ],
        "query_id long, embedding array<double>",
    )
    gaps = {r["query_id"]: r for r in coverage_gaps(queries, kb).collect()}
    assert gaps[0]["gap"] == pytest.approx(0.0, abs=1e-9)
    assert gaps[1]["gap"] == pytest.approx(1.0, abs=1e-9)
    assert len(gaps[0]["top_dists"]) == 3

    per_q = {r["query_id"]: r["query_score"]
             for r in embedding_confidence(coverage_gaps(queries, kb)).collect()}
    # covered query: nearest term = exp(0) = 1 → score ≥ 0.7
    assert per_q[0] > 0.7
    assert per_q[1] < per_q[0]
    s = learning_score(embedding_confidence(coverage_gaps(queries, kb)))
    assert s == pytest.approx((per_q[0] + per_q[1]) / 2)


def test_empty_kb_gap_is_one(spark, kb):
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0])], "query_id long, embedding array<double>"
    )
    gaps = coverage_gaps(queries, None).collect()
    assert gaps[0]["gap"] == 1.0


def test_select_links_for_gaps(spark, kb):
    queries = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),   # covered (gap 0 ≤ radius)
            (1, [0.0, 0.0, 1.0]),   # uncovered
        ],
        "query_id long, embedding array<double>",
    )
    gaps = coverage_gaps(queries, kb).join(
        queries, "query_id"
    )
    links = spark.createDataFrame(
        [
            ("https://x/z", [0.0, 0.0, 1.0]),   # fills the uncovered gap
            ("https://x/a", [1.0, 0.0, 0.0]),   # helps nothing new
        ],
        "href string, embedding array<double>",
    )
    got = {r["href"]: r["gap_score"] for r in
           select_links_for_gaps(links, gaps).collect()}
    assert got["https://x/z"] == pytest.approx(2.0)  # gap 1→0, ×2 scaling
    assert got["https://x/a"] == pytest.approx(0.0)


def test_should_stop_policy():
    assert should_stop(0.75, None, 0.0)                      # over threshold
    assert not should_stop(0.5, None, 0.9)                   # first round
    assert not should_stop(0.5, 0.3, 0.9)                    # still learning
    assert should_stop(0.5, 0.499, 0.5)                      # converged + valid
    assert not should_stop(0.5, 0.499, 0.1)                  # converged, bad val
