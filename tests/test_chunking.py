"""Chunking strategies vs independent Python mirrors.

The mirrors re-state the reference semantics (chunking_strategy.py:
RegexChunking :38-63, FixedLengthWordChunking :146-171,
SlidingWindowChunking :174-211 incl. the leaked-loop-index tail rule,
OverlappingWindowChunking :214-255) from the cited behavior, written
independently — the Spark Columns must agree on every text in the grid,
including the edge rows (empty, whitespace-only, exact-window,
tail-aligned, short-final-chunk).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.chunking import (
    FixedLengthWordChunking,
    IdentityChunking,
    OverlappingWindowChunking,
    RegexChunking,
    SlidingWindowChunking,
    chunk_table,
)


# -- independent mirrors -----------------------------------------------------

def py_regex(text, patterns):
    parts = [text]
    for p in patterns:
        parts = [piece for s in parts for piece in re.split(p, s)]
    return parts


def py_fixed(text, size):
    ws = text.split()
    return [" ".join(ws[i : i + size]) for i in range(0, len(ws), size)]


def py_sliding(text, win, step):
    ws = text.split()
    n = len(ws)
    if n <= win:
        return [text]
    out = [" ".join(ws[i : i + win]) for i in range(0, n - win + 1, step)]
    i_last = ((n - win) // step) * step
    if i_last + win < n:
        out.append(" ".join(ws[-win:]))
    return out


def py_overlap(text, win, ov):
    ws = text.split()
    n = len(ws)
    if n <= win:
        return [text]
    out, start = [], 0
    while start < n:
        end = start + win
        out.append(" ".join(ws[start:end]))
        if end >= n:
            break
        start = end - ov
    return out


TEXTS = [
    "",
    "   ",
    "one",
    "alpha beta",
    "  leading and trailing  spaced   words here  ",
    " ".join(f"w{i}" for i in range(5)),
    " ".join(f"w{i}" for i in range(6)),     # exact window for win=6
    " ".join(f"w{i}" for i in range(7)),     # window + 1
    " ".join(f"w{i}" for i in range(12)),    # tail-aligned for step=3
    " ".join(f"w{i}" for i in range(13)),
    " ".join(f"w{i}" for i in range(40)),
    "para one\n\npara two\n\npara three",
    "a,b;c d\n\ne,f",
    # unicode whitespace: NBSP, EN QUAD, LINE SEPARATOR, NEL — Python
    # str.split() splits all of these; (?U) makes Java \s match them
    "foo bar baz qux\x85quux one two three four five",
    # C0 separators FS/GS/RS/US: Python str.split() treats them as
    # whitespace but Unicode White_Space does NOT -- words_of adds them
    # to the class explicitly (ADVICE r4)
    "alpha\x1cbeta\x1dgamma\x1edelta\x1fepsilon zeta",
]


def _run(spark, col):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    return [r["chunks"] for r in
            df.select(col.alias("chunks")).collect()]


def test_identity_and_regex_parity(spark):
    got = _run(spark, IdentityChunking().column("text"))
    assert got == [[t] for t in TEXTS]

    for patterns in ([r"\n\n"], [r"\n\n", r"[,;]"]):
        got = _run(spark, RegexChunking(patterns).column("text"))
        assert got == [py_regex(t, patterns) for t in TEXTS], patterns


@pytest.mark.parametrize("size", [1, 3, 5, 100])
def test_fixed_length_parity(spark, size):
    got = _run(spark, FixedLengthWordChunking(size).column("text"))
    assert got == [py_fixed(t, size) for t in TEXTS]


@pytest.mark.parametrize("win,step", [(6, 3), (6, 4), (6, 6), (5, 2), (3, 7)])
def test_sliding_window_parity(spark, win, step):
    got = _run(spark, SlidingWindowChunking(win, step).column("text"))
    assert got == [py_sliding(t, win, step) for t in TEXTS], (win, step)


@pytest.mark.parametrize("win,ov", [(6, 2), (6, 5), (5, 1), (10, 3)])
def test_overlapping_window_parity(spark, win, ov):
    got = _run(spark, OverlappingWindowChunking(win, ov).column("text"))
    assert got == [py_overlap(t, win, ov) for t in TEXTS], (win, ov)


def test_overlap_geq_window_rejected():
    with pytest.raises(ValueError):
        OverlappingWindowChunking(window_size=5, overlap=5)


def test_regex_capturing_groups_rejected():
    # re.split emits captured separators; Java split drops them — the
    # divergence is rejected loudly instead of silently mismatching
    with pytest.raises(ValueError, match="capturing groups"):
        RegexChunking([r"(\n\n)"])
    RegexChunking([r"(?:\n\n)"])  # non-capturing is fine


def test_chunk_table_shape_and_plan(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    out = chunk_table(docs, FixedLengthWordChunking(3))
    rows = out.collect()
    expect = [
        (i, j, c)
        for i, t in enumerate(TEXTS)
        for j, c in enumerate(py_fixed(t, 3))
    ]
    assert sorted((r["doc_id"], r["chunk_id"], r["chunk"]) for r in rows) == \
        sorted(expect)
    # no Python boundary anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
