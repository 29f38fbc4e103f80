"""Versioned parquet tables — the Iceberg semantics SURVEY §1 promises
(MERGE INTO, time travel, rollback), exercised rather than asserted.

``plans/checkpoint.py`` commits crawl rounds with an atomic-manifest
protocol deliberately isomorphic to an Iceberg snapshot commit; this
module completes the isomorphism for the *table* operations the design
relies on:

- ``seen`` evolution:      MERGE seen += frontier hashes   (SURVEY §3.2)
- ``domain_state`` update: MERGE INTO domain_state          (SURVEY §2.9 P2)
- resume/fork:             time-travel read of any version  (SURVEY §1)

Layout (one directory per table)::

    <dir>/v=N/data/*.parquet      row data for version N (absent when the
                                  commit is metadata-only, e.g. rollback)
    <dir>/v=N/manifest.json       {version, parent, operation, key, count,
                                  data_ref}  — written LAST via atomic
                                  rename: the commit point

``data_ref`` names the version whose ``data/`` directory holds this
version's rows.  Normal commits self-reference; ``rollback`` commits
reference the restored version — a *metadata-only* commit, exactly how
Iceberg rolls back (a new snapshot pointing at old data files, nothing
rewritten).  Readers resolve through ``data_ref``, so any version
remains readable forever (time travel) and a reader holding version N
is never disturbed by a writer committing N+1 (snapshot isolation: data
directories are immutable once their manifest lands).

Concurrency is optimistic, Iceberg-style, with an exclusive CLAIM as
the version gate: the first writer to create ``v=N/claim``
(``open(..., "x")`` — atomic on POSIX) owns version N; every later
claimant raises ``CommitConflict`` before staging anything, so two
writers can never write into the same ``data/`` directory or delete
each other's files.  The claim owner stages data, then publishes with
an atomic manifest rename — readers only ever trust the manifest.
On conflict, retry on top of the new head, as an Iceberg
``commit.retry`` would.  A writer that crashes between claim and
manifest leaves a claimed-but-unpublished version: readers ignore it
(no manifest), and recovery is deleting that ``v=N`` directory — the
same janitorial step as expiring a stale Iceberg metadata lock.

MERGE is a DataFrame program, not a planner extension: match on the key
columns; matched target rows are replaced by the source row (or deleted
with ``when_matched="delete"``), unmatched source rows are inserted.
That is the exact shape of both engine upserts (politeness
``update()``: updated ∪ untouched; seen store: seen ∪ new hashes), so
the on-disk MERGE is value-equivalent to the in-memory paths — pinned
by tests/test_table.py against both.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer published this version first (optimistic
    concurrency): re-read the head and retry the operation."""


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = Path(path)

    # -- bootstrap -----------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        key: list[str],
    ) -> "VersionedTable":
        t = cls(spark, path)
        if t.current_version() is not None:
            raise FileExistsError(f"table already exists at {path}")
        t._commit(df, parent=None, operation="create", key=key)
        return t

    # -- metadata ------------------------------------------------------------

    def _manifest(self, version: int) -> dict:
        return json.loads(
            (self.path / f"v={version}" / "manifest.json").read_text()
        )

    def current_version(self) -> int | None:
        if not self.path.exists():
            return None
        versions = [
            int(d.name.split("=", 1)[1])
            for d in self.path.iterdir()
            if d.name.startswith("v=") and (d / "manifest.json").exists()
        ]
        return max(versions) if versions else None

    def history(self) -> list[dict]:
        head = self.current_version()
        if head is None:
            return []
        return [self._manifest(v) for v in range(head + 1)]

    @property
    def key(self) -> list[str]:
        head = self.current_version()
        if head is None:
            raise FileNotFoundError(f"no table at {self.path}")
        return self._manifest(head)["key"]

    # -- reads (time travel) -------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        head = self.current_version()
        if head is None:
            raise FileNotFoundError(f"no table at {self.path}")
        if version is None:
            version = head
        ref = self._manifest(version)["data_ref"]
        return self.spark.read.parquet(str(self.path / f"v={ref}" / "data"))

    # -- writes --------------------------------------------------------------

    def _commit(
        self,
        df: DataFrame | None,
        parent: int | None,
        operation: str,
        key: list[str],
        data_ref: int | None = None,
    ) -> int:
        version = 0 if parent is None else parent + 1
        base = self.path / f"v={version}"
        base.mkdir(parents=True, exist_ok=True)
        # exclusive claim: the one atomic gate deciding who owns this
        # version — losers bail BEFORE staging, so no writer can ever
        # overwrite or delete another's staged/published data files
        try:
            fd = os.open(base / "claim", os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            raise CommitConflict(
                f"version {version} already claimed at {self.path}"
            ) from None
        if df is not None:
            # data staged by the claim owner only; invisible to readers
            # until the manifest rename lands
            df.write.mode("overwrite").parquet(str(base / "data"))
            count = self.spark.read.parquet(str(base / "data")).count()
            data_ref = version
        else:
            assert data_ref is not None
            count = self._manifest(data_ref)["count"]
        manifest = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "key": key,
            "count": count,
            "data_ref": data_ref,
        }
        tmp = base / "manifest.json.tmp"
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, base / "manifest.json")
        return version

    def overwrite(self, df: DataFrame) -> int:
        return self._commit(
            df, parent=self.current_version(), operation="overwrite",
            key=self.key,
        )

    def append(self, df: DataFrame) -> int:
        head = self.current_version()
        merged = self.read(head).unionByName(df)
        return self._commit(merged, parent=head, operation="append",
                            key=self.key)

    def merge(
        self, source: DataFrame, when_matched: str = "update"
    ) -> int:
        """MERGE INTO this table USING ``source`` ON the table key.

        ``when_matched="update"``: matched target rows are replaced by
        the source row and unmatched source rows are inserted (upsert —
        the domain_state / seen shape).
        ``when_matched="delete"``: matched target rows are removed and
        no inserts happen (the TTL-expiry shape).

        A source with duplicate key values is rejected (``ValueError``)
        before anything is staged — Iceberg MERGE likewise errors when a
        target row matches multiple source rows; silently inserting both
        would break the PK invariant every reader of this table assumes.
        """
        head = self.current_version()
        key = self.key
        target = self.read(head)
        if when_matched == "update":
            dup = (
                source.groupBy(*key).count().filter("count > 1").limit(1).count()
            )
            if dup:
                raise ValueError(
                    "merge source has duplicate key rows on "
                    f"{key} — MERGE requires at most one source row per key"
                )
            merged = target.join(source, key, "left_anti").unionByName(source)
        elif when_matched == "delete":
            merged = target.join(source.select(*key), key, "left_anti")
        else:
            raise ValueError(f"unknown when_matched: {when_matched}")
        return self._commit(merged, parent=head, operation=f"merge_{when_matched}",
                            key=key)

    def remove_stale_claim(
        self, version: int, stale_after_sec: float = 60.0
    ) -> bool:
        """Janitor for a crashed writer: delete a claimed-but-unpublished
        ``v=N`` directory (claim exists, manifest never landed) once the
        claim is older than ``stale_after_sec`` — the recovery step the
        module docstring prescribes, equivalent to expiring a stale
        Iceberg metadata lock.  A *fresh* claim is left alone (its owner
        may still be staging); returns whether anything was removed."""
        base = self.path / f"v={version}"
        claim = base / "claim"
        if (base / "manifest.json").exists() or not claim.exists():
            return False
        try:
            age = time.time() - claim.stat().st_mtime
        except FileNotFoundError:  # published or cleaned concurrently
            return False
        if age < stale_after_sec:
            return False
        shutil.rmtree(base, ignore_errors=True)
        return True

    def rollback(self, version: int) -> int:
        """Restore the table to ``version`` as a NEW commit that
        references the old data files (metadata-only, nothing
        rewritten) — history is preserved, not truncated."""
        head = self.current_version()
        ref = self._manifest(version)["data_ref"]
        return self._commit(
            None, parent=head, operation=f"rollback_to_{version}",
            key=self.key, data_ref=ref,
        )
