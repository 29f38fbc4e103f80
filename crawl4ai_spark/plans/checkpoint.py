"""Per-round crawl snapshots — Iceberg-style atomic commits on parquet.

Reference analog: the ``on_state_change`` JSON checkpoint stream
(bfs_strategy.py:273-284; tests/deep_crawling/test_deep_crawl_resume.py).
The reference serializes its whole state as JSON per URL; at 10^10-URL
scale the seen set cannot live in a JSON document, so a snapshot is a
directory commit:

    <dir>/round=N/
        manifest.json     {round, strategy, pages_crawled, counts, metrics}
        seen/*.parquet    URL-seen set (per-partition files = per-partition
                          lineage, north rule)
        frontier|queue|stack/*.parquet

A snapshot is readable while the next is being written (new directory);
``latest_round`` finds the highest complete manifest — resume = read
that round's tables.  Swap the directory for an Iceberg table and the
commit becomes a snapshot ID; the layout is deliberately isomorphic.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def snapshot_round(
    checkpoint_dir: str,
    round_no: int,
    pages_crawled: int,
    strategy: str,
    seen: DataFrame | None,
    metrics: list[dict],
    **tables: DataFrame,
) -> None:
    base = Path(checkpoint_dir) / f"round={round_no}"
    base.mkdir(parents=True, exist_ok=True)
    counts = {}
    if seen is not None:
        seen.write.mode("overwrite").parquet(str(base / "seen"))
        counts["seen"] = seen.count()
        # per-partition lineage (north rule): which partition holds how
        # many seen URLs, with the url-hash range it covers — enough to
        # re-derive bloom segment ownership on resume
        lineage = seen.groupBy(
            F.spark_partition_id().alias("partition_id")
        ).agg(
            F.count("*").alias("n_urls"),
            F.min(F.xxhash64("url")).alias("min_url_hash"),
            F.max(F.xxhash64("url")).alias("max_url_hash"),
        )
        lineage.write.mode("overwrite").parquet(str(base / "seen_lineage"))
    for name, df in tables.items():
        if df is None:
            continue
        df.write.mode("overwrite").parquet(str(base / name))
        counts[name] = df.count()
    manifest = {
        "round": round_no,
        "strategy": strategy,
        "pages_crawled": pages_crawled,
        "counts": counts,
        "metrics": metrics,
    }
    # manifest written last = commit point (atomic rename)
    tmp = base / "manifest.json.tmp"
    tmp.write_text(json.dumps(manifest, indent=1))
    os.replace(tmp, base / "manifest.json")


def latest_round(checkpoint_dir: str) -> int | None:
    base = Path(checkpoint_dir)
    if not base.exists():
        return None
    rounds = []
    for d in base.iterdir():
        if d.name.startswith("round=") and (d / "manifest.json").exists():
            rounds.append(int(d.name.split("=", 1)[1]))
    return max(rounds) if rounds else None


def load_round(
    spark: SparkSession, checkpoint_dir: str, round_no: int | None = None
) -> dict:
    """Returns {manifest, seen?, frontier?/queue?/stack?} DataFrames."""
    if round_no is None:
        round_no = latest_round(checkpoint_dir)
        if round_no is None:
            raise FileNotFoundError(f"no snapshots in {checkpoint_dir}")
    base = Path(checkpoint_dir) / f"round={round_no}"
    manifest = json.loads((base / "manifest.json").read_text())
    out: dict = {"manifest": manifest}
    for sub in base.iterdir():
        if sub.is_dir():
            out[sub.name] = spark.read.parquet(str(sub))
    return out


def per_url_states(
    spark: SparkSession, checkpoint_dir: str, round_no: int | None = None
) -> list[dict]:
    """Reconstruct the reference's per-URL ``on_state_change`` stream
    (bfs_strategy.py:266-284) for the BFS round that produced snapshot
    ``round_no`` — one reference-shape state dict per successful URL,
    with ``pages_crawled == i+1`` semantics, each usable as a
    ``resume_state`` to restart MID-LEVEL (the crash-recovery cadence of
    test_deep_crawl_resume.py:321-349).

    Derivation (no live engine needed): snapshot N holds round N-1's
    ``results`` (emit order), pre-trim ``discovered`` rows tagged with
    the parent's emit_seq, the post-trim next ``frontier`` (also
    src-tagged), the ``seen`` set AFTER the round, and the manifest's
    pages_crawled AFTER the round.  State i is then:

    - visited  = seen minus candidates discovered by parents AFTER the
      i-th success (reference adds pre-trim candidates to visited);
    - pending  = post-trim children of parents up to i, in push order;
    - depths   = this round's URLs + enqueued children (the slice of the
      reference's accumulated dict that a mid-level resume reads);
    - pages_crawled = (pages before the round) + i + 1.

    Pure-BFS snapshots only (politeness-deferred frontier rows carry a
    stale/absent src_emit_seq and are treated as pending from state 0).
    """
    snap = load_round(spark, checkpoint_dir, round_no)
    manifest = snap["manifest"]
    if manifest["strategy"] != "bfs" or "results" not in snap:
        raise ValueError(
            "per_url_states needs a BFS snapshot with a results table"
        )
    res = snap["results"].orderBy("emit_seq").collect()
    emit_seqs = {r["emit_seq"] for r in res}
    disc = (
        snap["discovered"].orderBy("src_emit_seq", "link_idx").collect()
        if "discovered" in snap
        else []
    )
    fr = snap["frontier"]
    has_src = "src_emit_seq" in fr.columns
    pend_rows = fr.orderBy("seq").collect() if has_src else []
    seen_urls = (
        [r["url"] for r in snap["seen"].collect()] if "seen" in snap else []
    )
    n_succ = sum(1 for r in res if r["success"])
    prior_crawled = manifest["pages_crawled"] - n_succ

    # visited before subtracting this round: full seen; later parents'
    # candidates are removed incrementally (dict preserves insert order)
    later = {}
    for d in disc:
        later.setdefault(d["norm_url"], d["src_emit_seq"])
    depths = {r["url"]: r["depth"] for r in res}
    states: list[dict] = []
    i = 0
    pending_acc: list[dict] = []
    pi = 0
    # pending rows whose src tag is outside this round's emit range are
    # carry-over (politeness deferrals): pending from the start
    base_pending = [
        {"url": p["url"], "parent_url": p["parent_url"]}
        for p in pend_rows
        if p["src_emit_seq"] is None or p["src_emit_seq"] not in emit_seqs
    ]
    round_children = [
        p for p in pend_rows
        if p["src_emit_seq"] is not None and p["src_emit_seq"] in emit_seqs
    ]
    for r in res:
        if not r["success"]:
            continue
        e = r["emit_seq"]
        while pi < len(round_children) and round_children[pi]["src_emit_seq"] <= e:
            p = round_children[pi]
            pending_acc.append({"url": p["url"], "parent_url": p["parent_url"]})
            depths[p["url"]] = p["depth"]
            pi += 1
        visited_i = [
            u for u in seen_urls
            if u not in later or later[u] <= e
        ]
        i += 1
        states.append(
            {
                "strategy_type": "bfs",
                "visited": visited_i,
                "pending": base_pending + list(pending_acc),
                "depths": dict(depths),
                "pages_crawled": prior_crawled + i,
                "cancelled": False,
            }
        )
    return states


def resume_state_from_snapshot(
    spark: SparkSession, checkpoint_dir: str, round_no: int | None = None
) -> dict:
    """Build a reference-shape resume dict from a snapshot (small-state
    path; at scale the engine consumes the DataFrames directly)."""
    snap = load_round(spark, checkpoint_dir, round_no)
    manifest = snap["manifest"]
    strategy = manifest["strategy"]
    state = {
        "strategy_type": strategy,
        "pages_crawled": manifest["pages_crawled"],
        "visited": [r["url"] for r in snap["seen"].collect()]
        if "seen" in snap
        else [],
        "depths": {},
        "cancelled": False,
    }
    if strategy == "bfs" and "frontier" in snap:
        rows = snap["frontier"].orderBy("seq").collect()
        state["pending"] = [
            {"url": r["url"], "parent_url": r["parent_url"]} for r in rows
        ]
        state["depths"] = {r["url"]: r["depth"] for r in rows}
    if strategy == "dfs" and "stack" in snap:
        rows = snap["stack"].orderBy("pos").collect()
        state["stack"] = [
            {"url": r["url"], "parent_url": r["parent_url"], "depth": r["depth"]}
            for r in rows
        ]
        state["dfs_seen"] = state["visited"]
    if strategy == "best_first" and "queue" in snap:
        # heap order (-score, depth, url, parent) — the reference's
        # queue_items serialization order (bff_strategy.py:332-345)
        rows = snap["queue"].orderBy(
            "neg_score", "depth", "url", "parent_url"
        ).collect()
        state["queue_items"] = [
            {
                "score": r["neg_score"],
                "depth": r["depth"],
                "url": r["url"],
                "parent_url": r["parent_url"],
            }
            for r in rows
        ]
    return state
