"""SparkSession factory tuned for the crawl engine.

Local-mode testing uses ``local[N]``; on a real cluster the same settings
apply (AQE, adaptive skew-join, Arrow) and the partition counts scale with
``spark.sql.shuffle.partitions`` / executor count.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from pathlib import Path

from pyspark.sql import SparkSession

_PKG_ROOT = str(Path(__file__).resolve().parent.parent)


def _export_pythonpath() -> None:
    """Make the package importable in executor Python workers.

    Equivalent of ``spark-submit --py-files crawl4ai_spark.zip``: pandas
    UDF closures are pickled by module reference, so workers must be
    able to ``import crawl4ai_spark`` regardless of the driver's cwd.
    Must run before the JVM launches.
    """
    existing = os.environ.get("PYTHONPATH", "")
    if _PKG_ROOT not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{_PKG_ROOT}{os.pathsep}{existing}" if existing else _PKG_ROOT
        )


def get_spark(
    app_name: str = "crawl4ai_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession.

    cpus=None → ``local[*]``. Shuffle partitions default to the core
    count: crawl rounds are many small-to-medium jobs, so 200 default
    partitions would just add scheduling overhead; at cluster scale the
    caller passes an explicit value sized to executor count.
    """
    _export_pythonpath()
    if cpus is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        cpus = int(cpus_env) if cpus_env else os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(4, cpus)

    # SPARK_GRAFT_MASTER overrides the master URL verbatim.  The scaling
    # harness uses it to run the identical job under
    # ``local-cluster[N,1,mem]`` — N separate executor JVMs with one core
    # and a private heap each, the faithful emulation of the north rule's
    # "N vs 4N executors" (local[N] shares one heap across N task threads,
    # which measures GC contention a real multi-executor cluster never
    # pays).  ``cpus`` must still equal the TOTAL core count so shuffle
    # partitioning and parallelism size correctly.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        # AQE default OFF for the crawl engine: a batch-iterative crawl
        # job runs hundreds of small exchanges; AQE's per-exchange
        # materialization barrier + replan serializes them (measured 3x
        # slowdown at local[16] on the scaling bench).  Partitioning is
        # managed explicitly instead: corpus cache pre-partitioned by
        # url, discovery respread to defaultParallelism, two-phase
        # global ranks, salted politeness windows.  Flip the env var for
        # workloads that want runtime re-planning / skew-join instead.
        .config(
            "spark.sql.adaptive.enabled",
            os.environ.get("SPARK_GRAFT_AQE", "false"),
        )
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Iterative round loop: keep broadcast threshold default but make
        # in-memory relations cheap to re-join.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # fetch join: corpus side is cached pre-partitioned on url;
        # shuffled-hash join streams it without sorting 10^10 rows
        # per round (build side = the bounded per-round frontier)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # Per-call origin capture (stack walk in Python + an EXTRA py4j
        # roundtrip per DataFrame API call to ship the call site to the
        # JVM) exists to enrich error messages; the strict crawl loops
        # issue tens of thousands of DataFrame calls per run and the
        # capture is ~10% of their driver time (cProfile, r4).  Off by
        # default; set SPARK_GRAFT_DF_DEBUG=true when debugging plans.
        # (pyspark compares the conf with == "true", so normalize the
        # conventional truthy env spellings)
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            "true"
            if os.environ.get("SPARK_GRAFT_DF_DEBUG", "").lower()
            in ("1", "true", "yes", "on")
            else "false",
        )
    )
    if master.startswith("local-cluster"):
        # executor heap must fit the per-executor memory in the master
        # string (local-cluster[n,c,MEM_MB]); python workers are per
        # executor, exactly as on a real cluster.  Default the heap to
        # what the worker actually advertises (minus JVM headroom) —
        # a flat default larger than the worker's allocation would make
        # every executor launch request unfillable and the first action
        # hang waiting for resources.
        import re as _re

        m = _re.match(r"local-cluster\[\s*\d+\s*,\s*\d+\s*,\s*(\d+)\s*\]", master)
        if m:
            worker_mb = int(m.group(1))
            default_mem = f"{max(worker_mb - 512, 512)}m" if worker_mb < 2560 else "2g"
        else:
            default_mem = "2g"
        builder = builder.config(
            "spark.executor.memory",
            os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", default_mem),
        )
        # Keep Spark's default delay scheduling (3s).  r4 measured the
        # r3 setting of 0s directly (tools/profile_topology.py): with
        # single-core executors, locality.wait=0 scheduled corpus-cache
        # and shuffle-read tasks onto executors that did not hold the
        # blocks, and the remote block fetch + deserialization inflated
        # the identical crawl's task CPU 99.1s -> 68.5s when restored
        # (10s) — walls 24.5-34.8s -> 21.0-23.8s.  Same reason it's the
        # default on a real cluster: cached-corpus locality is worth a
        # bounded wait.  Overridable for locality experiments.
        wait = os.environ.get("SPARK_GRAFT_LOCALITY_WAIT")
        if wait:
            builder = builder.config("spark.locality.wait", wait)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


@contextmanager
def micro_plan_mode(spark: SparkSession):
    """Disable AQE + constraint propagation while driving a micro-query
    loop (tiny frames, many actions): AQE re-plans every shuffle stage
    as its own driver job, and constraint propagation is an O(plan^2)
    optimizer pass — both pure driver latency when no scan exceeds a
    few hundred rows.  Same rationale and settings as the crawl
    engine's strict-loop mode (operators/frontier.py:_micro_plan_mode,
    measured 18.4 -> 8.2 jobs/round there); restores previous values
    on exit."""
    conf = spark.conf
    _AQ = "spark.sql.adaptive.enabled"
    _CP = "spark.sql.constraintPropagation.enabled"
    prev_aq = conf.get(_AQ, "true")
    prev_cp = conf.get(_CP, "true")
    conf.set(_AQ, "false")
    conf.set(_CP, "false")
    try:
        yield
    finally:
        conf.set(_AQ, prev_aq)
        conf.set(_CP, prev_cp)
