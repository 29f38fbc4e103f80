"""Politeness budgets + adaptive backoff (T7 fixture semantics).

Reference: RateLimiter (async_dispatcher.py:28-85) — seeded determinism
replaces wall-clock sleeps with per-round budgets (politeness.py)."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.operators.politeness import (
    PolitenessSpec,
    PyPoliteness,
    py_domain_of,
)
from crawl4ai_spark.sources import corpus

SPEC = PolitenessSpec(base_lo=1.0, base_hi=3.0, max_delay=60.0, max_retries=3,
                      round_duration=6.0, seed=7)


def test_initial_delay_deterministic_in_range():
    d1 = SPEC.initial_delay("a.com")
    assert d1 == SPEC.initial_delay("a.com")
    assert 1.0 <= d1 < 3.0
    assert SPEC.initial_delay("b.com") != d1


def test_budget_floor():
    assert SPEC.budget(2.0) == 3          # 6s round / 2s delay
    assert SPEC.budget(100.0) == 1        # never starve a domain


def test_backoff_fold_and_retirement():
    delay0 = 2.0
    d1, f1, r1 = SPEC.fold_outcomes("d.com", delay0, 0, [429], round_no=0)
    assert f1 == 1 and not r1
    assert 2 * 0.75 * delay0 <= d1 <= min(2 * 1.25 * delay0, 60.0)
    # success resets and decays toward base
    d2, f2, r2 = SPEC.fold_outcomes("d.com", d1, f1, [200], round_no=1)
    assert f2 == 0 and not r2
    assert d2 >= 1.0
    # four consecutive rate-limits (max_retries=3) ⇒ retired
    d, f, r = SPEC.fold_outcomes("d.com", 2.0, 0, [429, 503, 429, 429], round_no=2)
    assert f == 4 and r
    # delay capped
    d, _, _ = SPEC.fold_outcomes("d.com", 50.0, 0, [429, 429], round_no=3)
    assert d <= 60.0


def test_engine_budget_compliance_and_coverage(spark):
    n = 60
    pages = corpus.build_pages(spark, n)
    start = corpus.py_canonical_url(1)
    polite_spec = PolitenessSpec(base_lo=1.0, base_hi=3.0, round_duration=4.0, seed=7)

    free = CrawlEngine(spark, pages, CrawlSpec(max_depth=2, strategy="bfs"))
    free_rows = free.run(start).collect()

    eng = CrawlEngine(
        spark, pages,
        CrawlSpec(max_depth=2, strategy="bfs", politeness=polite_spec),
    )
    rows = eng.run(start).collect()

    # same crawl coverage, just spread over more rounds
    assert {r["url"] for r in rows} == {r["url"] for r in free_rows}
    assert len({r["round"] for r in rows}) > len({r["round"] for r in free_rows})

    # per-round per-domain counts comply with the budget implied by the
    # domain-state fold over the engine's actual emission history
    py = PyPoliteness(polite_spec)
    by_round = defaultdict(list)
    for r in sorted(rows, key=lambda x: x["emit_seq"]):
        by_round[r["round"]].append(r)
    for rnd in sorted(by_round):
        counts = defaultdict(int)
        for r in by_round[rnd]:
            counts[py_domain_of(r["url"])] += 1
        for dom, cnt in counts.items():
            assert cnt <= py.budget(dom), (rnd, dom, cnt, py.budget(dom))
        outcomes = defaultdict(list)
        for r in by_round[rnd]:
            outcomes[py_domain_of(r["url"])].append(r["status_code"])
        py.update(outcomes, rnd)

    # engine's final domain state matches the pure-Python fold
    state_rows = {
        r["domain"]: (round(r["current_delay"], 9), r["fail_count"])
        for r in eng.politeness_state.state.collect()
    }
    for dom, (delay, fails, _retired) in py.state.items():
        assert dom in state_rows
        assert state_rows[dom][0] == pytest.approx(delay, abs=1e-9)
        assert state_rows[dom][1] == fails


def test_politeness_emission_deterministic_across_partitioning(spark):
    """Children discovered on the politeness path must never collide
    with deferred rows' seqs (children base = the seq high-water mark,
    not the emit counter): with a collision, budget/emission ties break
    on shuffle order and the emitted sequence varies with partitioning.
    """
    pages = corpus.build_pages(spark, 60)
    start = corpus.py_canonical_url(1)
    polite = PolitenessSpec(base_lo=1.0, base_hi=3.0, round_duration=3.0, seed=5)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    seqs = []
    try:
        for parts in ("3", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            eng = CrawlEngine(
                spark, pages,
                CrawlSpec(max_depth=2, strategy="bfs", politeness=polite),
            )
            rows = eng.run(start).collect()
            seqs.append(
                [r["url"] for r in sorted(rows, key=lambda x: x["emit_seq"])]
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert seqs[0] == seqs[1]
