"""Per-URL ``on_state_change`` cadence + mid-level resume (VERDICT r2 #5)
and table-shaped state export (#9).

Reference semantics: bfs_strategy.py:266-284 fires the callback once per
SUCCESSFUL URL with visited/pending/depths as they stand right after
that URL's link_discovery and ``pages_crawled == i+1``
(tests/deep_crawling/test_deep_crawl_resume.py:321-349); resume
re-enters with current_level = state["pending"] (bfs_strategy.py:221-228).
The engine reconstructs the same stream from its set-oriented round
outputs — live via CrawlSpec.on_state_change, offline via
plans.checkpoint.per_url_states over a round snapshot.
"""

import pytest

from crawl4ai_spark.functions.scorers import KeywordRelevanceScorer
from crawl4ai_spark.operators.frontier import CrawlEngine, CrawlSpec
from crawl4ai_spark.oracle import CrawlSpec as OracleSpec
from crawl4ai_spark.oracle import crawl_oracle
from crawl4ai_spark.plans.checkpoint import per_url_states
from crawl4ai_spark.sources import corpus

N = 60
START = corpus.py_canonical_url(1)
SCORER = KeywordRelevanceScorer(keywords=["blog", "docs"], weight=1.0)


def run_engine(spark, collector=None, **kw):
    pages = corpus.build_pages(spark, N)
    eng = CrawlEngine(
        spark, pages, CrawlSpec(on_state_change=collector, **kw)
    )
    rows = eng.run(START).collect()
    return eng, rows


def run_oracle(collector=None, **kw):
    return crawl_oracle(
        corpus.pages_dict(N), START,
        OracleSpec(on_state_change=collector, **kw),
    )


def norm_state(s):
    return (
        s["pages_crawled"],
        sorted(s["visited"]),
        [(p["url"], p["parent_url"]) for p in s["pending"]],
        dict(s["depths"]),
        s["cancelled"],
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(max_depth=2),
        dict(max_depth=2, max_pages=9, scorer=SCORER),  # trim + score order
        dict(max_depth=3, max_pages=11),
    ],
)
def test_callback_stream_matches_reference_loop(spark, kw):
    got, exp = [], []
    run_engine(spark, collector=lambda s: got.append(norm_state(s)), **kw)
    run_oracle(collector=lambda s: exp.append(norm_state(s)), **kw)
    assert got == exp


def test_callback_fires_per_url_with_incrementing_count(spark):
    # mirrors reference test_callback_fires_per_url
    seq = []
    eng, _ = run_engine(
        spark, collector=lambda s: seq.append(s["pages_crawled"]),
        max_depth=2, max_pages=8,
    )
    assert len(seq) == eng._pages_crawled
    assert seq == [i + 1 for i in range(len(seq))]


def test_mid_level_states_from_snapshot(spark, tmp_path):
    # offline per_url_states over the snapshot == the live callback
    # stream (same visited/pending/pages_crawled per successful URL)
    live = []
    eng, _ = run_engine(
        spark, collector=lambda s: live.append(s),
        max_depth=2, max_pages=9, checkpoint_dir=str(tmp_path / "ck"),
    )
    offline = []
    rno = 1
    while True:
        try:
            offline.extend(per_url_states(spark, str(tmp_path / "ck"), rno))
        except FileNotFoundError:
            break
        rno += 1
    assert len(offline) == len(live)
    for o, l in zip(offline, live):
        assert o["pages_crawled"] == l["pages_crawled"]
        assert sorted(o["visited"]) == sorted(l["visited"])
        assert [(p["url"], p["parent_url"]) for p in o["pending"]] == [
            (p["url"], p["parent_url"]) for p in l["pending"]
        ]


def test_mid_level_resume_matches_reference(spark, tmp_path):
    # crash mid-level: resume from the i-th per-URL state and the
    # continued crawl must equal the reference loop resumed from the
    # same state — engine and oracle compared emission-for-emission
    ck = str(tmp_path / "ck")
    run_engine(spark, max_depth=2, max_pages=20, checkpoint_dir=ck)
    states = per_url_states(spark, ck, 2)  # round 1: a multi-URL level
    assert len(states) >= 2
    mid = states[len(states) // 2]  # mid-level crash point

    exp, _ = crawl_oracle(
        corpus.pages_dict(N), START,
        OracleSpec(max_depth=2, max_pages=20, resume_state=mid),
    )
    pages = corpus.build_pages(spark, N)
    eng2 = CrawlEngine(
        spark, pages,
        CrawlSpec(max_depth=2, max_pages=20, resume_state=mid),
    )
    got = eng2.run(START).collect()
    got_t = [
        (r["emit_seq"], r["url"], r["depth"], r["parent_url"], r["success"])
        for r in got
    ]
    exp_t = [(e.seq, e.url, e.depth, e.parent_url, e.success) for e in exp]
    assert got_t == exp_t
    # pages_crawled == i+1 semantics held at the crash point
    assert mid["pages_crawled"] == states[0]["pages_crawled"] + len(states) // 2


def test_final_state_on_cancellation(spark):
    # reference fires one final state with pending = un-crawled frontier
    states = []
    calls = {"n": 0}

    def cancel_after_two(_=None):
        calls["n"] += 1
        return calls["n"] > 2

    pages = corpus.build_pages(spark, N)
    eng = CrawlEngine(
        spark, pages,
        CrawlSpec(
            max_depth=3, strategy="bfs",
            on_state_change=lambda s: states.append(s),
            should_cancel=cancel_after_two,
        ),
    )
    eng.run(START)
    assert eng.cancelled
    assert states[-1]["cancelled"] is True
    # the final state's pending is the frontier the crawl never reached
    assert states[-1]["pages_crawled"] == eng._pages_crawled


def test_export_state_tables_roundtrip(spark, tmp_path):
    # table export: seen/pending written as parquet (no driver
    # materialization), resume consumes them as DataFrames; result must
    # equal the reference-dict resume path exactly
    eng, _ = run_engine(spark, max_depth=3, max_pages=6)
    out = str(tmp_path / "state")
    manifest = eng.export_state_tables(out)
    assert manifest["strategy_type"] == "bfs"
    assert manifest["pages_crawled"] == eng._pages_crawled

    dict_state = eng.export_state()
    table_state = CrawlEngine.resume_state_from_tables(spark, out)
    assert table_state["pages_crawled"] == dict_state["pages_crawled"]

    pages = corpus.build_pages(spark, N)
    runs = []
    for st in (dict_state, table_state):
        eng2 = CrawlEngine(
            spark, pages,
            CrawlSpec(max_depth=3, max_pages=12, resume_state=st),
        )
        rows = eng2.run(START).collect()
        runs.append(
            [
                (r["emit_seq"], r["url"], r["depth"], r["parent_url"],
                 r["success"])
                for r in rows
            ]
        )
    assert runs[0] == runs[1]
    assert len(runs[0]) > 0
