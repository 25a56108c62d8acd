"""Streaming feed-poll discovery: batch equivalence, incremental restart,
and watermark-bounded dedup state."""

import datetime
import os

from pyspark.sql import functions as F

from supercrawler_spark.operators.feeds import parse_feeds
from supercrawler_spark.streaming.feeds import (poll_feeds_available_now,
                                                read_new_seeds)


def _snapshot(spark, path, rows):
    spark.createDataFrame(
        rows, "host string, xml string, poll_ts timestamp") \
        .coalesce(1).write.mode("append").parquet(path)


def _rss(urls):
    items = "".join(
        f"<item><title>t</title><link>{u}</link>"
        f"<pubDate>Mon, 05 Jan 2026 00:00:00 GMT</pubDate></item>"
        for u in urls)
    return ('<?xml version="1.0"?><rss version="2.0"><channel>'
            f"<title>c</title>{items}</channel></rss>")


def test_stream_matches_batch_and_restarts_incrementally(spark, tmp_path):
    feeds_dir = str(tmp_path / "feeds")
    out_dir = str(tmp_path / "seeds")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime.datetime(2026, 1, 5, 12, 0, 0)

    # poll 1: two hosts, overlapping recent windows within each feed
    _snapshot(spark, feeds_dir,
              [("h1", _rss(["https://h1/a", "https://h1/b"]), t0),
               ("h2", _rss(["https://h2/x"]), t0)])
    poll_feeds_available_now(spark, feeds_dir, out_dir, ckpt,
                             watermark="1 hour")
    got1 = {r["url"] for r in read_new_seeds(spark, out_dir).collect()}
    assert got1 == {"https://h1/a", "https://h1/b", "https://h2/x"}

    # batch equivalence on the same snapshots: parse + distinct
    batch = (parse_feeds(spark.read.parquet(feeds_dir),
                         carry=("poll_ts",))
             .select("url").distinct())
    assert {r["url"] for r in batch.collect()} == got1

    # poll 2: h1 re-lists a and b (already emitted) plus a NEW url c —
    # only c may appear after the restart
    t1 = t0 + datetime.timedelta(minutes=10)
    _snapshot(spark, feeds_dir,
              [("h1", _rss(["https://h1/a", "https://h1/b",
                            "https://h1/c"]), t1)])
    poll_feeds_available_now(spark, feeds_dir, out_dir, ckpt,
                             watermark="1 hour")
    got2 = {r["url"] for r in read_new_seeds(spark, out_dir).collect()}
    assert got2 == got1 | {"https://h1/c"}

    # seed rows carry the parse columns a frontier init needs
    cols = set(read_new_seeds(spark, out_dir).columns)
    assert {"host", "url", "pos", "published", "fmt",
            "poll_ts"} <= cols


def test_empty_out_dir_reads_empty(spark, tmp_path):
    assert read_new_seeds(spark, str(tmp_path / "none")).count() == 0


def test_feed_discovery_drives_a_crawl(spark, tmp_path):
    """Close the loop: feed snapshots -> streaming poll -> bootstrap ->
    live crawl. The crawl seeded from feed-discovered URLs must produce
    exactly the docs of the same crawl seeded directly."""
    import datetime

    from supercrawler_spark.crawler import CrawlConfig, crawl
    from supercrawler_spark.operators.bootstrap import seed_bootstrap
    from supercrawler_spark.sources.synth import ensure_corpus, load_tables

    pages, seeds, _robots = load_tables(spark, ensure_corpus(0.001))
    seed_urls = [r["url"] for r in
                 seeds.orderBy("seed_order").collect()]
    t0 = datetime.datetime(2026, 1, 5, 12, 0, 0)
    _snapshot(spark, str(tmp_path / "feeds"),
              [("h", _rss(seed_urls), t0)])
    poll_feeds_available_now(spark, str(tmp_path / "feeds"),
                             str(tmp_path / "seeds"),
                             str(tmp_path / "ckpt"))
    discovered = read_new_seeds(spark, str(tmp_path / "seeds"))
    boot = seed_bootstrap(feed=discovered.select("url"))
    assert {r["src"] for r in boot.select("src").distinct().collect()} \
        == {"feed"}

    cfg = CrawlConfig(crawl_depth=1, politeness=False)
    via_feed = crawl(spark, pages, boot.select("url"), cfg,
                     store_dir=str(tmp_path / "store_feed"))
    direct = crawl(spark, pages, seeds.select("url"), cfg,
                   store_dir=str(tmp_path / "store_direct"))
    got = {r["url"] for r in via_feed.docs.select("url").collect()}
    want = {r["url"] for r in direct.docs.select("url").collect()}
    assert got == want and len(want) > 0
