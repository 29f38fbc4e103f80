"""VersionedTable — the Iceberg MERGE / time-travel / rollback semantics
SURVEY §1 promises, exercised on the atomic-manifest protocol.

Pins (a) MERGE INTO value semantics against a pandas oracle, (b) the
equivalence of the on-disk MERGE with the engine's in-memory
domain_state upsert (politeness.update: updated ∪ untouched) and the
seen-set union, (c) snapshot isolation / time travel (old versions
readable and byte-stable after later commits), (d) metadata-only
rollback, and (e) optimistic-concurrency conflict detection.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.politeness import (
    PolitenessSpec,
    PolitenessState,
)
from crawl4ai_spark.plans.table import CommitConflict, VersionedTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def target(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"d{i}.com", float(i), i % 2) for i in range(5)],
        "domain string, current_delay double, fail_count int",
    )
    return VersionedTable.create(spark, str(tmp_path / "t"), df, key=["domain"])


def test_create_read_head(spark, target):
    assert target.current_version() == 0
    assert target.read().count() == 5
    assert target.key == ["domain"]
    with pytest.raises(FileExistsError):
        VersionedTable.create(
            spark, str(target.path), target.read(), key=["domain"]
        )


def test_merge_upsert_matches_pandas_oracle(spark, target):
    source = spark.createDataFrame(
        [("d1.com", 99.0, 7), ("d3.com", 88.0, 8), ("dX.com", 1.0, 0),
         ("dY.com", 2.0, 1)],
        "domain string, current_delay double, fail_count int",
    )
    v = target.merge(source)
    assert v == 1
    got = target.read().toPandas().set_index("domain").sort_index()

    tgt = pd.DataFrame(
        [(f"d{i}.com", float(i), i % 2) for i in range(5)],
        columns=["domain", "current_delay", "fail_count"],
    )
    src = source.toPandas()
    oracle = (
        pd.concat([tgt[~tgt.domain.isin(src.domain)], src])
        .set_index("domain")
        .sort_index()
    )
    pd.testing.assert_frame_equal(
        got, oracle, check_dtype=False, check_like=True
    )


def test_merge_delete_is_ttl_expiry_shape(spark, target):
    expired = spark.createDataFrame(
        [("d0.com",), ("d4.com",), ("nope.com",)], "domain string"
    )
    target.merge(expired, when_matched="delete")
    left = {r["domain"] for r in target.read().collect()}
    assert left == {"d1.com", "d2.com", "d3.com"}


def test_time_travel_reads_stable(spark, target):
    v0 = _rows(target.read(0))
    target.merge(
        spark.createDataFrame(
            [("d0.com", 50.0, 9)],
            "domain string, current_delay double, fail_count int",
        )
    )
    target.overwrite(
        spark.createDataFrame(
            [("only.com", 1.0, 0)],
            "domain string, current_delay double, fail_count int",
        )
    )
    # v0 unchanged by later commits; every version still readable
    assert _rows(target.read(0)) == v0
    assert target.read(1).filter(
        F.col("domain") == "d0.com"
    ).collect()[0]["current_delay"] == 50.0
    assert target.read().count() == 1
    ops = [m["operation"] for m in target.history()]
    assert ops == ["create", "merge_update", "overwrite"]


def test_rollback_is_metadata_only(spark, target):
    v0 = _rows(target.read(0))
    target.overwrite(
        spark.createDataFrame(
            [("x.com", 0.0, 0)],
            "domain string, current_delay double, fail_count int",
        )
    )
    v = target.rollback(0)
    assert v == 2
    # nothing rewritten: the rollback version has no data directory and
    # its manifest references v0's files
    assert not (target.path / "v=2" / "data").exists()
    assert target._manifest(2)["data_ref"] == 0
    assert _rows(target.read()) == v0
    assert target._manifest(2)["count"] == 5
    # history preserved, not truncated
    assert len(target.history()) == 3


def test_commit_conflict_detected(spark, target):
    src = spark.createDataFrame(
        [("d0.com", 5.0, 1)],
        "domain string, current_delay double, fail_count int",
    )
    # writer B publishes v1 while writer A still believes head == 0
    other = VersionedTable(spark, str(target.path))
    other.merge(src)
    with pytest.raises(CommitConflict):
        target._commit(src, parent=0, operation="merge_update",
                       key=["domain"])
    # retry on the new head succeeds (the Iceberg commit.retry shape)
    assert target.merge(src) == 2


def test_domain_state_merge_equivalence(spark, tmp_path):
    """The on-disk MERGE INTO reproduces the engine's in-memory
    domain_state upsert round for round, and time travel returns each
    round's state."""
    spec = PolitenessSpec(seed=11)
    state = PolitenessState(spark, spec)
    table = VersionedTable.create(
        spark, str(tmp_path / "domain_state"), state.state, key=["domain"]
    )
    rounds = [
        [("https://a.com/1", 200, 0), ("https://b.com/1", 429, 1)],
        [("https://b.com/2", 429, 0), ("https://c.com/1", 200, 1)],
        [("https://a.com/2", 503, 0)],
    ]
    snapshots = []
    for rnd, recs in enumerate(rounds):
        outcomes = spark.createDataFrame(
            recs, "url string, status_code int, emit_seq long"
        )
        state.update(outcomes, rnd)
        # MERGE the touched-domain rows (the round's delta) into the table
        touched = state.state.join(
            outcomes.select(
                F.regexp_extract("url", r"https://([^/]+)/", 1).alias("domain")
            ).distinct(),
            "domain",
            "left_semi",
        )
        table.merge(touched)
        snapshots.append(_rows(state.state))
    for rnd, snap in enumerate(snapshots):
        assert _rows(table.read(rnd + 1)) == snap


def test_seen_merge_union_shape(spark, tmp_path):
    """MERGE seen += frontier hashes (SURVEY §3.2): version k holds the
    union of the first k batches."""
    batches = [
        [("u1",), ("u2",)],
        [("u2",), ("u3",)],
        [("u4",)],
    ]
    table = VersionedTable.create(
        spark,
        str(tmp_path / "seen"),
        spark.createDataFrame(batches[0], "url string"),
        key=["url"],
    )
    acc = {u for (u,) in batches[0]}
    for i, b in enumerate(batches[1:], start=1):
        table.merge(spark.createDataFrame(b, "url string"))
        acc |= {u for (u,) in b}
        assert {r["url"] for r in table.read(i).collect()} == acc
    assert table.read().count() == 4


def test_merge_rejects_duplicate_source_keys(spark, target):
    """ADVICE r4: a source with two rows for one key would silently
    produce duplicate PK rows after the anti-join ∪ union — MERGE must
    reject it up front, as Iceberg errors on multiple matches."""
    dup = spark.createDataFrame(
        [("d1.com", 1.0, 1), ("d1.com", 2.0, 2), ("dY.com", 3.0, 3)],
        "domain string, current_delay double, fail_count int",
    )
    with pytest.raises(ValueError, match="duplicate key"):
        target.merge(dup)
    # nothing was committed
    assert target.current_version() == 0


def test_remove_stale_claim_janitor(spark, target):
    """A crashed writer's claimed-but-manifestless v=N dir blocks every
    later claimant; the janitor clears it once stale, leaves fresh
    claims and published versions alone."""
    import os
    import time

    base = target.path / "v=1"
    base.mkdir()
    (base / "claim").touch()
    src = spark.createDataFrame(
        [("dZ.com", 1.0, 0)],
        "domain string, current_delay double, fail_count int",
    )
    with pytest.raises(CommitConflict):
        target.merge(src)
    # fresh claim: a live writer may be staging — kept
    assert not target.remove_stale_claim(1, stale_after_sec=60.0)
    # age the claim past the threshold, then the janitor removes it
    old = time.time() - 120
    os.utime(base / "claim", (old, old))
    assert target.remove_stale_claim(1, stale_after_sec=60.0)
    assert target.merge(src) == 1
    # published version: never janitored
    assert not target.remove_stale_claim(1, stale_after_sec=0.0)
    assert target.read(1).count() == 6
