"""Tests for the distributed Bloom URL-seen filter (operators/bloom.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from supercrawler_spark.operators import bloom

M = 1 << 12  # small filter so false positives are actually exercised
K = 3


def _hashed(spark, urls, buckets=4):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return (df.withColumn("url_hash", F.xxhash64("url"))
            .withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(buckets))))


def test_bloom_no_false_negatives(spark):
    seen_urls = [f"https://h{i % 7}.example.com/p{i}" for i in range(500)]
    seen = _hashed(spark, seen_urls)
    filt = bloom.build_bloom(seen, m_bits=M, k=K)
    tagged = bloom.seen_prefilter(seen, filt, m_bits=M, k=K)
    # every member must probe positive — Bloom filters cannot false-negative
    assert tagged.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    seen = _hashed(spark, [f"https://s.example.com/a{i}" for i in range(500)])
    novel = _hashed(spark, [f"https://n.example.com/b{i}" for i in range(2000)])
    filt = bloom.build_bloom(seen, m_bits=M, k=K)
    fp = bloom.seen_prefilter(novel, filt, m_bits=M, k=K) \
        .filter(F.col("maybe_seen")).count()
    # 500 keys in 4096 bits/bucket across 4 buckets (~1000 bits/key-bucket
    # load): theoretical fp ~ (1-e^{-kn/m})^k « 0.3; assert a loose bound
    assert fp / 2000 < 0.3


def test_bloom_empty_bucket_is_definitely_new(spark):
    # bucket present in candidates but absent from the filter table
    seen = _hashed(spark, ["https://s.example.com/only"], buckets=64)
    filt = bloom.build_bloom(seen, m_bits=M, k=K)
    novel = _hashed(spark, [f"https://x.example.com/c{i}" for i in range(64)],
                    buckets=64)
    tagged = bloom.seen_prefilter(novel, filt, m_bits=M, k=K)
    assert tagged.count() == 64  # left join keeps every candidate


def test_bloom_filter_table_is_tiny_and_broadcast(spark):
    seen = _hashed(spark, [f"https://s.example.com/a{i}" for i in range(200)])
    filt = bloom.build_bloom(seen, m_bits=M, k=K)
    assert filt.count() <= 4  # one row per bucket
    plan = bloom.seen_prefilter(seen, filt, m_bits=M, k=K) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bloom_crawl_parity(spark, corpus_sf0001, tmp_path_factory):
    """The Bloom-prefiltered seen anti-join must produce the IDENTICAL
    crawl (seen depths, docs, ordering) as the exact-only path — the
    filter only routes rows, never decides them. A deliberately tiny
    filter (4096 bits/bucket) forces real false positives through the
    exact-join branch."""
    from supercrawler_spark.crawler import CrawlConfig, crawl
    from supercrawler_spark.sources.synth import load_tables
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    base = crawl(spark, pages, seeds,
                 CrawlConfig(crawl_depth=2, num_buckets=8),
                 store_dir=str(tmp_path_factory.mktemp("bloom_base")))
    bl = crawl(spark, pages, seeds,
               CrawlConfig(crawl_depth=2, num_buckets=8, seen_bloom=True,
                           bloom_bits_per_bucket=4096),
               store_dir=str(tmp_path_factory.mktemp("bloom_on")))
    base_seen = {r["url"]: r["depth"] for r in
                 base.seen.select("url", "depth").collect()}
    bl_seen = {r["url"]: r["depth"] for r in
               bl.seen.select("url", "depth").collect()}
    assert bl_seen == base_seen
    b = [r["url"] for r in base.docs.orderBy("depth", "seq").collect()]
    f = [r["url"] for r in bl.docs.orderBy("depth", "seq").collect()]
    assert b == f
    # the bloom_definite_new metric must be live and account for most
    # novel candidates (everything except seen repeats + false positives)
    m = bl.metrics.agg(F.sum("bloom_definite_new"),
                       F.sum("frontier_added")).collect()[0]
    assert m[0] is not None and m[1] is not None and m[0] > 0


def test_bloom_crawl_resume(spark, corpus_sf0001, tmp_path_factory):
    """Resume of a bloom-enabled crawl picks the cumulative word file back
    up from the manifest and finishes identically to an uninterrupted run."""
    import json
    import os
    from supercrawler_spark.crawler import CrawlConfig, crawl, resume
    from supercrawler_spark.sources.synth import load_tables
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    cfg = CrawlConfig(crawl_depth=2, num_buckets=8, seen_bloom=True,
                      bloom_bits_per_bucket=4096)
    full = crawl(spark, pages, seeds, cfg,
                 store_dir=str(tmp_path_factory.mktemp("bloom_full")))
    # simulate a crash after round 0: drop later manifest entries
    crash_dir = str(tmp_path_factory.mktemp("bloom_crash"))
    crawl(spark, pages, seeds, cfg, store_dir=crash_dir)
    mpath = os.path.join(crash_dir, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["rounds"] = manifest["rounds"][:1]
    manifest["done"] = False
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    resumed = resume(spark, pages, crash_dir, cfg)
    assert ({r["url"]: r["depth"] for r in resumed.seen.collect()}
            == {r["url"]: r["depth"] for r in full.seen.collect()})


def test_bloom_word_values_fit_32_bits(spark):
    seen = _hashed(spark, [f"https://s.example.com/a{i}" for i in range(300)])
    filt = bloom.build_bloom(seen, m_bits=M, k=K)
    words = filt.select(F.explode("bloom").alias("w", "bits"))
    bad = words.filter((F.col("bits") < 0)
                       | (F.col("bits") >= F.lit(1 << 32))).count()
    assert bad == 0
