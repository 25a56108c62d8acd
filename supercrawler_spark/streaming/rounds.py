"""Structured-Streaming expression of the crawl loop (SURVEY.md §2.8 L1).

The reference's scheduler loop (src/supercrawler.rs:1259-1369) is an async
work queue; the engine's batch ``Crawler`` re-expresses it as round-
synchronous micro-batches. This module additionally runs those rounds through
Spark Structured Streaming with an ``availableNow`` trigger + ``foreachBatch``
— the idiomatic way to drive incremental table-to-table pipelines — so the
frontier store behaves like a streaming source and the metrics table like a
streaming sink:

  - L1 scheduler loop  → one micro-batch per crawl round (foreachBatch)
  - L2 time budget     → between-batch driver check (round = atomic unit)
  - L4 incremental SSE → per-batch metrics appends (the SSE completion JSON
                         ≙ final summary row)
  - L6 checkpoint      → the CrawlStore manifest (exactly-once per round via
                         atomic manifest commit; Spark's own checkpointing is
                         not needed because rounds are deterministic and the
                         store is idempotent — re-running a round overwrites
                         the same paths)
  - L7/L8 (watermarks/stateful aggs) are n/a for parity (absent in the
    reference); ``event_metrics_stream`` below shows the engine's windowed-
    aggregation surface over the ``events`` table for completeness.

The streaming runner produces byte-identical round artifacts to the batch
Crawler (same store layout) — asserted by test_stream_crawl_matches_batch and
test_event_metrics_stream in tests/test_operators.py.
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from supercrawler_spark.crawler import Crawler, CrawlConfig


def stream_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    config: CrawlConfig | None = None,
    store_dir: str | None = None,
    robots: DataFrame | None = None,
    host_priority: DataFrame | None = None,
):
    """Drive crawl rounds as a rate-limited stream of round tokens: a
    memory-source stream of round indices triggers one ``foreachBatch`` per
    round; each batch executes the identical round plan as the batch engine
    against the shared CrawlStore. Returns the CrawlResult."""
    crawler = Crawler(spark, pages, config, store_dir, robots, host_priority)
    crawler.store.init_config(
        __import__("dataclasses").asdict(crawler.cfg))
    if crawler.store.read_manifest()["init"] is None:
        crawler._init_frontier(seeds)
    scope = F.broadcast(crawler._scope_df())
    cfg = crawler.cfg

    # stream of round tokens, one row per potential round
    tokens = (spark.readStream.format("rate")
              .option("rowsPerSecond", 1000)
              .option("numPartitions", 1).load()
              .limit(cfg.crawl_depth + 1))

    state = {"stop": False}
    start = time.monotonic()

    def run_round(batch_df, batch_id: int) -> None:
        # Termination mirrors Crawler.run: by PROGRESS (frontier drained)
        # and by TIME BUDGET — not by round index; politeness/throttle
        # deferral legitimately pushes rounds past crawl_depth (the
        # deferred work must drain), but never past time_limit_secs.
        if state["stop"]:
            return
        if (cfg.time_limit_secs is not None
                and time.monotonic() - start >= cfg.time_limit_secs):  # L2
            state["stop"] = True
            return
        r = crawler.store.last_committed_round() + 1
        frontier_path = (crawler.store.init_frontier_path() if r == 0
                         else crawler.store.frontier_path(r))
        if not os.path.exists(frontier_path):
            state["stop"] = True
            return
        frontier = spark.read.parquet(frontier_path)
        counts = crawler._run_round(r, frontier, scope)
        if counts["frontier"] == 0 or (
                counts["new_urls"] == 0 and counts["deferred"] == 0):
            state["stop"] = True

    query = (tokens.writeStream
             .foreachBatch(run_round)
             .trigger(availableNow=True)
             .option("checkpointLocation",
                     tempfile.mkdtemp(prefix="crawl_stream_ckpt_"))
             .start())
    query.awaitTermination()
    # availableNow delivers a bounded number of batches; keep driving rounds
    # until the frontier drains (deferral can extend past crawl_depth+1)
    while not state["stop"]:
        run_round(None, -1)
    crawler.store.mark_done()
    return crawler.result()


def event_metrics_stream(spark: SparkSession, events_path: str,
                         out_dir: str, window: str = "1 hour"):
    """Windowed streaming aggregation over the ``events`` table (L7/L8
    surface): tumbling-window per-type counts with a watermark for late data,
    availableNow trigger. Returns the StreamingQuery (already terminated)."""
    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        # FileStreamSource only watches directories — stage the file
        stage = tempfile.mkdtemp(prefix="events_src_")
        os.symlink(events_path, os.path.join(stage, "part-0.parquet"))
        events_path = stage
    stream = (spark.readStream.schema(schema).format("parquet")
              .load(events_path))
    agg = (stream
           # parquet TIMESTAMP_NTZ → TIMESTAMP: watermarks need an instant
           .withColumn("ts", F.col("ts").cast("timestamp"))
           .withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", window).alias("w"), "event_type")
           .agg(F.count("*").alias("n"),
                F.round(F.sum("value"), 6).alias("total_value"))
           .select(F.col("w.start").alias("window_start"),
                   F.col("w.end").alias("window_end"),
                   "event_type", "n", "total_value"))
    q = (agg.writeStream.outputMode("append")
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation",
                 tempfile.mkdtemp(prefix="events_ckpt_"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
