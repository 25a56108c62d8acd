"""Streaming feed-poll seed discovery: incremental RSS/Atom ingestion.

A production crawl polls thousands of feeds on short intervals; each poll
delivers MOSTLY entries it has already seen (feeds re-list their recent
window), so the pipeline's job is *incremental* extraction of the new
URLs: parse every arriving feed snapshot, drop entries already emitted,
append genuinely-new seeds. That is exactly Spark Structured Streaming's
stateful dedup over a file source:

  readStream(feed snapshots dir)
    -> parse_feeds (the same whole-stage-codegen parser as batch,
       with poll_ts carried through the explode)
    -> withWatermark(poll_ts) . dropDuplicatesWithinWatermark(url)
    -> append sink (new-seed table)

The watermark bounds the dedup state: a URL older than the watermark
delay can re-emit (feeds don't re-list entries months later; if one does,
the crawl rounds' exact seen-set anti-join still drops it). State is
therefore O(urls within the delay window), not O(all urls ever) — what
lets the poller run for months. The heavy exact seen-set stays in the
crawl rounds where it already exists; this stage is the cheap
high-frequency edge in front of it.

``poll_feeds_available_now`` runs one availableNow pass over whatever
feed snapshots are on disk. Restartable: the checkpoint carries source
offsets AND dedup state, so a second call ingests only snapshots added
since — the poller loop is this function on a timer.
tests/test_streaming_feeds.py pins batch equivalence and the
incremental/restart behavior.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from supercrawler_spark.operators.feeds import parse_feeds

FEED_SCHEMA = ("host string, xml string, poll_ts timestamp")

SEED_SCHEMA = ("host string, poll_ts timestamp, pos long, url string, "
               "published date, title string, fmt string")


def poll_feeds_available_now(spark: SparkSession, feeds_dir: str,
                             out_dir: str, checkpoint_dir: str,
                             watermark: str = "1 hour") -> None:
    """One availableNow pass: parse every feed snapshot parquet under
    ``feeds_dir``, drop urls already emitted within the watermark window,
    append the new seeds to ``out_dir``."""
    src = spark.readStream.schema(FEED_SCHEMA).parquet(feeds_dir)
    entries = parse_feeds(src, xml_col="xml", host_col="host",
                          carry=("poll_ts",))
    dedup = (entries.withWatermark("poll_ts", watermark)
             .dropDuplicatesWithinWatermark(["url"]))
    (dedup.writeStream.format("parquet")
     .option("path", out_dir)
     .option("checkpointLocation", checkpoint_dir)
     .trigger(availableNow=True)
     .start().awaitTermination())


def read_new_seeds(spark: SparkSession, out_dir: str):
    if not os.path.isdir(out_dir) or not any(
            f.endswith(".parquet") for f in os.listdir(out_dir)):
        return spark.createDataFrame([], SEED_SCHEMA)
    return spark.read.parquet(out_dir)
