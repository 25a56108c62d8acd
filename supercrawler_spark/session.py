"""SparkSession factory tuned for the crawl engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same confs apply per-executor. Settings are chosen for the 100 TB design
point and scale *down* to the sandbox, not the other way around:

  - AQE on (runtime coalescing of small crawl rounds, skew-join splitting for
    the hot-host pages lookup).
  - Bloom seen-set filtering is ENGINE code, not a Catalyst runtime filter:
    `CrawlConfig.seen_bloom` routes candidates through explicit per-bucket
    Bloom filters (operators/bloom.py) before the exact anti-join. Spark's
    own runtime.bloomFilter injection stays off (measured pathology below);
    SPARK_GRAFT_BLOOM=1 re-enables it on a real cluster.
  - Arrow batches capped small (256): html blobs are KB–MB sized, so the
    default 10k-row batches would hold GBs in the Python worker.
  - shuffle.partitions defaults to 2× cores locally; on a cluster size it to
    keep post-shuffle partitions ≤ maxPartitionBytes at the target SF.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "supercrawler-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # CRITICAL measured fix: the extract stage is CPU-bound Python work
        # over small-ish bytes, so AQE's default 64m byte-based coalescing
        # collapses it to a handful of tasks and serializes the UDF (84s →
        # 22s at local[32] on the sf0.1 scan with 8m). Bytes are a bad proxy
        # for cost when rows carry multi-ms UDF work.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # NOTE: two measured pathologies on this PySpark 4.1.2 local build —
        # runtimeFilter.semiJoinReduction=true deadlocks trivial parquet
        # reads, and runtime.bloomFilter=true injects per-join aggregation
        # subqueries that multiply small-job latency ~4x (127s → never-
        # finishes on the sf0.001 crawl). Both stay off by default; on a real
        # cluster with 10^10-row seen tables the Bloom runtime filter is
        # worth re-enabling via SPARK_GRAFT_BLOOM=1.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled",
                "true" if os.environ.get("SPARK_GRAFT_BLOOM") == "1" else "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.autoBroadcastJoinThreshold", "32m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def mask_api_key(value: str | None) -> str:
    """Startup credential report after the reference's masking rule
    (src/main.rs:1021-1045): long keys show first-5 + '...' + last-5;
    shorter non-empty keys report '(short key)' with no content; empty
    and unset are distinguished. DELIBERATE divergence: the reference
    reveals the edges from 10 chars up, so a 10-char key is logged
    verbatim (5+5 covers it) and 11-13 char keys leak all but 1-3 chars;
    here the edges only show when >= 4 chars stay hidden (len >= 14) —
    the masked line is never reassemblable into the key. The reference
    slices bytes (Rust ``&s[0..5]``, ASCII keys assumed); char slicing
    here is identical on that domain. Offline the engine holds no live
    credentials — this exists so a live-fetcher deployment logs the same
    shape of masked line the reference logs, never the key itself."""
    if value is None:
        return "not found"
    if value == "":
        return "set but empty"
    if len(value) >= 14:
        return f"{value[:5]}...{value[-5:]}"
    return "(short key)"


def credential_report(names: tuple[str, ...] = ("FIRECRAWL_API_KEY",
                                                "YOUTUBE_API_KEY")) -> dict:
    """{env var -> masked status} for startup logging (rs:1021-1045)."""
    return {n: mask_api_key(os.environ.get(n)) for n in names}
