#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (north-rule run mode).

Cluster usage (the designed deployment):

    zip -r supercrawler_spark.zip supercrawler_spark
    spark-submit --py-files supercrawler_spark.zip \\
        --conf spark.sql.adaptive.advisoryPartitionSizeInBytes=8m \\
        scripts/crawl_job.py \\
        --pages  s3://bucket/pages    \\
        --seeds  s3://bucket/seeds.parquet \\
        --store  s3://bucket/crawlstore \\
        --depth 2 [--politeness --robots s3://bucket/robots.parquet] [--resume]

Local sandbox verification (scripts/run_submit_local.sh) runs the same file
through a real ``spark-submit --master local[N] --py-files`` with the zipped
package — exercising the exact packaging the cluster mode needs. The
SparkSession is taken from spark-submit's conf (no hardcoded master here).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--seeds", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--robots", default=None)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--politeness", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-buckets", type=int, default=32)
    ap.add_argument("--variant", default="supercrawler",
                    choices=["supercrawler", "main"],
                    help="engine-variant semantics (SURVEY §2.9)")
    ap.add_argument("--no-snapshot-dedup", action="store_true",
                    help="skip latest-warc_ts resolution (pages url-unique)")
    ap.add_argument("--max-fetch-per-round", type=int, default=None,
                    help="frontier dequeue cap per round (overflow re-queues)")
    ap.add_argument("--host-priority", default=None,
                    help="parquet path of (host, priority) scores — e.g. "
                         "pagerank output — ordering the throttled dequeue")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from supercrawler_spark.crawler import Crawler, CrawlConfig

    spark = SparkSession.builder.appName("supercrawler-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    pages = spark.read.parquet(args.pages)
    robots = spark.read.parquet(args.robots) if args.robots else None
    cfg = CrawlConfig(crawl_depth=args.depth, politeness=args.politeness,
                      num_buckets=args.num_buckets, variant=args.variant,
                      snapshot_dedup=not args.no_snapshot_dedup,
                      max_fetch_per_round=args.max_fetch_per_round)
    prio = (spark.read.parquet(args.host_priority)
            if args.host_priority else None)
    crawler = Crawler(spark, pages, cfg, store_dir=args.store, robots=robots,
                      host_priority=prio)
    seeds = None if args.resume else spark.read.parquet(args.seeds)
    result = crawler.run(seeds)

    summary = {
        "rounds_run": result.rounds_run,
        "docs": result.docs.count() if result.docs is not None else 0,
        "seen": result.seen.count(),
        "store": args.store,
    }
    print("CRAWL_SUMMARY " + json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
