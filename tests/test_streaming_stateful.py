"""Stateful streaming backoff (streaming/stateful.py) vs the batch fold.

The operator must be chunking-invariant: folding the outcome stream in
one micro-batch or several must produce bit-identical per-domain state,
equal to ``PolitenessSpec.fold_outcomes`` over the concatenated rows
(the same sequential fold the batch engine and the DuckDB
politeness_backoff oracle replay)."""

import os

import pytest

from crawl4ai_spark.operators.politeness import PolitenessSpec
from crawl4ai_spark.streaming.stateful import stream_domain_backoff

N = 400
SPEC = PolitenessSpec(seed=42)


def _outcome_rows():
    # corpus-shaped: hot domain d0, deterministic 429/503 pattern
    rows = []
    for i in range(N):
        dom = "d%d.example.com" % (0 if i % 2 == 0 else i % 7)
        st = (
            404 if i % 13 == 0 else 429 if i % 17 == 0
            else 503 if i % 19 == 0 else 200
        )
        rows.append((i, f"https://{dom}/doc-{i}", st))
    return rows


def _expected():
    by_dom: dict[str, list[int]] = {}
    for i, url, st in _outcome_rows():
        dom = url.split("//")[1].split("/")[0]
        by_dom.setdefault(dom, []).append(st)
    exp = {}
    for dom, sts in by_dom.items():
        delay, fails, retired = SPEC.fold_outcomes(
            dom, SPEC.initial_delay(dom), 0, sts, round_no=0
        )
        exp[dom] = (delay, fails, retired, len(sts))
    return exp


def _drain(spark, src_dir, sink, max_files=None):
    reader = spark.readStream.schema(
        "emit_seq long, url string, status_code int"
    )
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.parquet(src_dir)
    out = stream_domain_backoff(stream, SPEC)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        f"SELECT * FROM {sink} ORDER BY outcomes_seen"
    ).collect()
    final = {}
    for r in rows:  # last update per domain wins
        final[r["domain"]] = (
            r["current_delay"], r["fail_count"], r["retired"],
            r["outcomes_seen"],
        )
    return final


@pytest.fixture()
def src(spark, tmp_path):
    rows = _outcome_rows()
    half = len(rows) // 2
    d = str(tmp_path / "outcomes")
    os.makedirs(d)
    schema = "emit_seq long, url string, status_code int"
    # stage each half, then move its single part file flat into the
    # source dir (file streams + partition-style subdirs don't mix)
    now = 1_700_000_000
    for i, chunk in enumerate((rows[:half], rows[half:])):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        dst = os.path.join(d, f"{i}.parquet")
        os.rename(os.path.join(stage, part), dst)
        # deterministic arrival order for the multi-batch case
        os.utime(dst, (now + i * 60, now + i * 60))
    return d


def test_single_batch_matches_batch_fold(spark, src):
    got = _drain(spark, src, "backoff_single")
    exp = _expected()
    assert got == exp


def test_multi_batch_state_continues(spark, src):
    # one file per trigger: the fold crosses micro-batch boundaries via
    # the group state and must still equal the one-shot fold
    got = _drain(spark, src, "backoff_multi", max_files=1)
    exp = _expected()
    assert got == exp
