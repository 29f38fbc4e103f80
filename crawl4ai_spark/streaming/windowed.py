"""Structured Streaming surface of the engine.

The reference's "stream mode" (async_configs.py:1683; bfs_strategy.py:
303-401) is incremental emission of a batch computation — the engine
covers that with per-round emission (operators/frontier.py).  This
module provides the genuinely time-windowed streaming pieces a
large-scale crawl deployment needs around the batch-iterative core:

- ``stream_windowed_events``: readStream → withWatermark → windowed
  aggregation → (test: availableNow + memory sink) over an event-time
  table — the canonical late-data-tolerant rollup (crawl request logs,
  fetch telemetry).
- ``stream_crawl_results``: readStream over the crawl checkpoint
  directory (plans/checkpoint.py snapshots) — each committed round's
  parquet becomes a micro-batch, giving a live tail of crawl emissions
  for downstream consumers (the Iceberg-snapshot analog of the
  reference's AsyncGenerator stream mode).

At scale these run as separate always-on queries against the same
snapshot/Iceberg tables the crawl commits to; in tests they run with
``Trigger.AvailableNow`` for determinism.
"""

from __future__ import annotations

import atexit
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

RESULT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("emit_seq", T.LongType()),
        T.StructField("round", T.IntegerType()),
        T.StructField("url", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("parent_url", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("success", T.BooleanType()),
        T.StructField("status_code", T.IntegerType()),
    ]
)


def stream_windowed_events(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming windowed rollup with late-data tolerance.

    readStream(parquet) → withWatermark(ts) → groupBy(window(ts),
    event_type).agg(count, sum) — the watermark bounds state: windows
    older than (max event time − watermark) finalize and evict, so the
    query runs indefinitely at constant memory no matter how many
    billions of events flow through.

    ``events_path`` may be a directory (the production shape: a table
    location files land in) or a single parquet file — file streams
    require a directory, so a lone file is exposed through a temp
    directory symlink.
    """
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(_as_stream_dir(events_path))
    )
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_STREAM_DIR_CACHE: dict[str, str] = {}


def _as_stream_dir(path: str) -> str:
    """File streams only accept directories; wrap a single parquet file
    in a temp directory via symlink (no data copy).

    The wrapper dir is cached per resolved file path: repeated calls on
    the same file return the SAME source path (stable for checkpointed
    stream resume) instead of leaking a new temp dir each time.  Dirs
    are removed atexit."""
    if not os.path.isfile(path):
        return path
    key = os.path.abspath(path)
    d = _STREAM_DIR_CACHE.get(key)
    if d is not None and os.path.isdir(d):
        return d
    d = tempfile.mkdtemp(prefix="stream_src_")
    os.symlink(key, os.path.join(d, os.path.basename(path)))
    _STREAM_DIR_CACHE[key] = d
    return d


def _cleanup_stream_dirs() -> None:  # pragma: no cover - atexit hook
    import shutil

    for d in _STREAM_DIR_CACHE.values():
        shutil.rmtree(d, ignore_errors=True)
    _STREAM_DIR_CACHE.clear()


atexit.register(_cleanup_stream_dirs)


def run_available_now(stream_df: DataFrame, sink_table: str) -> None:
    """Drain all currently-available input into an in-memory sink table
    (deterministic test/batch-catchup mode)."""
    q = (
        stream_df.writeStream.outputMode("append" if stream_df.isStreaming else "append")
        .format("memory")
        .queryName(sink_table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_complete_available_now(stream_df: DataFrame, sink_table: str) -> None:
    """Complete-mode drain (for aggregations where append would wait for
    watermark expiry of the final windows)."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_crawl_results(
    spark: SparkSession, checkpoint_dir: str, table: str = "frontier"
) -> DataFrame:
    """Tail the crawl's committed snapshots as a stream: each round's
    ``round=N/<table>`` parquet files arrive as micro-batches."""
    return (
        spark.readStream.option("maxFilesPerTrigger", 64)
        .schema(_snapshot_schema(spark, checkpoint_dir, table))
        .parquet(f"{checkpoint_dir}/round=*/{table}")
    )


def _snapshot_schema(spark: SparkSession, checkpoint_dir: str, table: str):
    """Infer the snapshot table's schema from any committed round (file
    streams require an explicit schema)."""
    return spark.read.parquet(f"{checkpoint_dir}/round=*/{table}").schema


def per_domain_rates(results_stream: DataFrame) -> DataFrame:
    """Live per-domain fetch/success counts over the result tail —
    the dispatcher-telemetry analog (async_dispatcher.py:509-521)."""
    domain = F.regexp_extract(F.col("url"), r"^https?://([^/?#]*)", 1)
    return (
        results_stream.groupBy(domain.alias("domain"))
        .agg(
            F.count("*").alias("fetched"),
            F.sum(F.when(F.col("success"), 1).otherwise(0)).alias("succeeded"),
        )
    )


HTML_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("html", T.StringType()),
    ]
)


def stream_scrape_pages(
    spark: SparkSession,
    pages_dir: str,
    markdown: bool = False,
    **scrape_opts,
) -> DataFrame:
    """readStream over a fetched-HTML parquet directory → the HTML-tier
    content extraction as a live tail: each micro-batch of fetched
    pages is scraped (links/media/metadata struct; optional markdown)
    exactly like the batch path — the Arrow UDFs are stateless per
    page, so the streaming plan IS the batch plan under a streaming
    scan (r5).  At scale this is the always-on "parse fetched pages as
    they land in the Iceberg table" query downstream of the crawler."""
    from crawl4ai_spark.functions.markdown import markdown_udf
    from crawl4ai_spark.functions.scrape import scrape_page_udf

    stream = (
        spark.readStream.schema(HTML_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(_as_stream_dir(pages_dir))
    )
    out = stream.withColumn(
        "scraped",
        scrape_page_udf(**scrape_opts)(F.col("url"), F.col("html")),
    )
    if markdown:
        out = out.withColumn(
            "markdown", markdown_udf()(F.col("url"), F.col("html"))
        )
    return out.drop("html")
