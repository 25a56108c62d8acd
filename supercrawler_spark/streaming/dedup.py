"""Streaming exact dedup: continuous document ingestion with stateful
duplicate suppression (L7/L8 surface beyond the demo aggregation).

A training-data pipeline that ingests crawl output continuously cannot
re-run batch dedup over the whole corpus per increment; Structured
Streaming's stateful ``dropDuplicates`` keeps the seen-hash state in the
state store across micro-batches, so each arriving document is emitted at
most once per content hash — first arrival wins, duplicates from LATER
batches are suppressed against state, not against a rescan.

Two state regimes:
- unbounded (``watermark=None``): exact global dedup; state = one row per
  distinct hash. At 10^10 docs that is a large-but-flat keyed state spread
  over the shuffle partitions (RocksDB state store in production).
- watermarked (``ts_col`` + ``watermark``): ``dropDuplicatesWithinWatermark``
  evicts hash state older than the watermark — bounded state for streams
  where duplicates arrive temporally close (the common crawl-recrawl case),
  trading eviction for exactness beyond the horizon.

Uses the same 60-bit portable content hash as ``operators/dedup.exact_dedup``
so the streamed output is directly comparable to the batch operator
(tests/test_operators.py::test_stream_exact_dedup_matches_batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from supercrawler_spark.operators.dedup import _md5_long


def stream_exact_dedup(spark: SparkSession, docs_dir: str, out_dir: str,
                       text_col: str = "text", ts_col: str | None = None,
                       watermark: str = "1 hour",
                       max_files_per_trigger: int = 1) -> DataFrame:
    """Run the dedup stream over a parquet directory source (one micro-batch
    per ``max_files_per_trigger`` files, availableNow) and return the
    deduplicated output DataFrame. First arrival per content hash wins."""
    # a resumed checkpoint is only valid for the SAME source and state
    # shape: validate the call parameters against the ones persisted with
    # the checkpoint, failing loud instead of resuming dedup state built
    # over a different source (or crashing deep in the state store on a
    # dropDuplicates vs dropDuplicatesWithinWatermark operator mismatch)
    import json
    params = {"docs_dir": os.path.abspath(docs_dir), "text_col": text_col,
              "ts_col": ts_col, "watermark": watermark if ts_col else None}
    ppath = os.path.join(out_dir, "_dedup_params.json")
    if os.path.exists(ppath):
        with open(ppath) as f:
            prev = json.load(f)
        if prev != params:
            raise ValueError(
                f"out_dir {out_dir!r} holds a dedup checkpoint for "
                f"{prev}; re-invoke with the same parameters or use a "
                f"fresh out_dir (got {params})")
    else:
        os.makedirs(out_dir, exist_ok=True)
        with open(ppath, "w") as f:
            json.dump(params, f, indent=1, sort_keys=True)

    schema = spark.read.parquet(docs_dir).schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .load(docs_dir))
    s = stream.withColumn("content_hash", _md5_long(F.col(text_col)))
    if ts_col is not None:
        s = (s.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
             .withWatermark(ts_col, watermark)
             .dropDuplicatesWithinWatermark(["content_hash"]))
    else:
        s = s.dropDuplicates(["content_hash"])
    # the checkpoint lives WITH the output: re-invoking on a grown source
    # resumes from the saved state/source offsets, so already-emitted hashes
    # stay suppressed and already-read files are not re-appended — a fresh
    # temp checkpoint per call would re-emit the whole history every run
    q = (s.writeStream.outputMode("append").format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.read.parquet(out_dir)
