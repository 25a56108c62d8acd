"""Scale-path crawl semantics: the bucket-wise fetch join, Common-Crawl
multi-snapshot resolution, and politeness-deferral depth correctness must all
produce the SAME crawl as the reference-parity broadcast path."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from supercrawler_spark.crawler import CrawlConfig, crawl
from supercrawler_spark.sources.synth import load_tables


def _seen_depths(res) -> dict:
    return {r["url"]: r["depth"] for r in
            res.seen.select("url", "depth").collect()}


def _docs_map(res) -> dict:
    return {r["url"]: r["mdx"] for r in res.docs.select("url", "mdx").collect()}


# ---------------------------------------------------------------------------
# bucket-wise fetch join (frontier above the broadcast threshold)
# ---------------------------------------------------------------------------


def test_bucketwise_fetch_join_equals_broadcast(spark, corpus_sf0001,
                                                tmp_path_factory):
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    base = crawl(spark, pages, seeds, CrawlConfig(crawl_depth=2, num_buckets=8),
                 store_dir=str(tmp_path_factory.mktemp("bw_base")))
    # broadcast_frontier_max=0 forces the bucket-wise emulated
    # storage-partitioned join on every round
    forced = crawl(spark, pages, seeds,
                   CrawlConfig(crawl_depth=2, num_buckets=8,
                               broadcast_frontier_max=0),
                   store_dir=str(tmp_path_factory.mktemp("bw_forced")))
    assert _seen_depths(forced) == _seen_depths(base)
    assert _docs_map(forced) == _docs_map(base)
    # crawl ordering contract holds on the scale path too
    b = [r["url"] for r in base.docs.orderBy("depth", "seq").collect()]
    f = [r["url"] for r in forced.docs.orderBy("depth", "seq").collect()]
    assert b == f


def test_frontier_broadcast_byte_budget_guard():
    """The broadcast decision is rows AND bytes: 1M tiny URLs pass the row
    cap but 1M × 500-byte URLs (~1 GB build side) must NOT broadcast."""
    from supercrawler_spark.crawler import frontier_broadcast_ok
    cfg = CrawlConfig()  # 1M rows / 64 MB defaults
    assert frontier_broadcast_ok(0, 0.0, cfg)
    assert frontier_broadcast_ok(100_000, 40.0, cfg)     # ~13 MB: ok
    assert not frontier_broadcast_ok(2_000_000, 40.0, cfg)  # row cap
    assert not frontier_broadcast_ok(1_000_000, 500.0, cfg)  # ~1 GB: bytes
    # the byte budget is a conf: raising it re-admits the wide frontier
    wide = CrawlConfig(broadcast_frontier_bytes=2 << 30)
    assert frontier_broadcast_ok(1_000_000, 500.0, wide)


def test_byte_budget_fallback_crawl_parity(spark, corpus_sf0001,
                                           tmp_path_factory):
    """Forcing the byte guard to reject every broadcast (1-byte budget)
    must route rounds through the bucket-wise ladder with identical crawl
    results — the guard changes the physical strategy, never the answer."""
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    base = crawl(spark, pages, seeds, CrawlConfig(crawl_depth=2, num_buckets=8),
                 store_dir=str(tmp_path_factory.mktemp("bb_base")))
    forced = crawl(spark, pages, seeds,
                   CrawlConfig(crawl_depth=2, num_buckets=8,
                               broadcast_frontier_bytes=1),
                   store_dir=str(tmp_path_factory.mktemp("bb_forced")))
    assert _seen_depths(forced) == _seen_depths(base)
    assert _docs_map(forced) == _docs_map(base)


def test_bucketwise_join_plan_has_no_shuffle_on_pages(spark, corpus_sf0001):
    """Plan audit: the per-bucket broadcast join unioned across buckets must
    contain NO shuffle exchange — pages html bytes never cross the wire even
    when the frontier cannot be broadcast whole."""
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    frontier = (seeds.select("url")
                .withColumn("bucket",
                            F.pmod(F.xxhash64("url"), F.lit(32)).cast("int")))
    parts = []
    for b in range(4):
        pb = pages.filter(F.col("bucket") == b).select("url", "html")
        fb = frontier.filter(F.col("bucket") == b)
        parts.append(pb.join(F.broadcast(fb), "url", "inner"))
    joined = parts[0]
    for p in parts[1:]:
        joined = joined.unionByName(p)
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# Common-Crawl multi-snapshot pages (latest warc_ts wins)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("broadcast_max", [1_000_000, 0])
def test_snapshot_dedup_latest_wins(spark, corpus_sf0001, tmp_path_factory,
                                    broadcast_max):
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    # add an OLDER snapshot per url with junk html: latest-wins must ignore it
    stale = (pages
             .withColumn("warc_ts",
                         F.col("warc_ts") - F.expr("INTERVAL 1 DAY"))
             .withColumn("html", F.lit(
                 "<html><body><p>STALE SNAPSHOT</p></body></html>")
                 .cast("binary"))
             .withColumn("content_type", F.lit("text/html; charset=utf-8")))
    multi = pages.unionByName(stale)
    cfg = CrawlConfig(crawl_depth=1, num_buckets=8,
                      broadcast_frontier_max=broadcast_max)
    base = crawl(spark, pages, seeds, cfg,
                 store_dir=str(tmp_path_factory.mktemp("snap_base")))
    got = crawl(spark, multi, seeds, cfg,
                store_dir=str(tmp_path_factory.mktemp("snap_multi")))
    assert _docs_map(got) == _docs_map(base)
    assert _seen_depths(got) == _seen_depths(base)
    assert "STALE SNAPSHOT" not in "".join(_docs_map(got).values())


# ---------------------------------------------------------------------------
# politeness deferral: depth labels + completeness (ADVICE medium finding)
# ---------------------------------------------------------------------------


def test_deferred_parents_keep_depth_and_expand(spark, corpus_sf0001,
                                                tmp_path_factory):
    """Crawl-delay deferral must only DELAY work, never relabel or truncate
    it: with a pure crawl-delay robots table (no disallow rules) the polite
    crawl's seen set AND per-url depths equal the non-polite crawl's, even
    though deferred parents are processed in rounds far beyond their depth."""
    pages, seeds, robots = load_tables(spark, corpus_sf0001)
    # strip disallow rules; keep a crawl delay on every host so deferral is
    # forced hard (cap = max(1, budget/delay/salt) = 1 per salt window)
    delay_only = robots.select(
        "host",
        F.array().cast("array<string>").alias("disallow_prefixes"),
        F.lit(500).alias("crawl_delay_ms"))
    base = crawl(spark, pages, seeds, CrawlConfig(crawl_depth=1, num_buckets=8),
                 store_dir=str(tmp_path_factory.mktemp("pol_base")))
    polite = crawl(spark, pages, seeds,
                   CrawlConfig(crawl_depth=1, num_buckets=8, politeness=True,
                               round_budget_ms=1000, politeness_salt=2),
                   store_dir=str(tmp_path_factory.mktemp("pol_def")),
                   robots=delay_only)
    # deferral actually happened (otherwise this test proves nothing)
    n_def = polite.metrics.agg(F.sum("deferred")).collect()[0][0]
    assert (n_def or 0) > 0, "no deferral occurred — tighten the delay"
    assert polite.rounds_run > base.rounds_run, \
        "deferral should stretch the crawl over extra rounds"
    assert _seen_depths(polite) == _seen_depths(base)
    assert _docs_map(polite) == _docs_map(base)
    # depth column on docs matches too (children of a deferred depth-0
    # parent must carry depth 1, not round_number+1)
    base_depths = {r["url"]: r["depth"] for r in base.docs.collect()}
    pol_depths = {r["url"]: r["depth"] for r in polite.docs.collect()}
    assert pol_depths == base_depths


def test_frontier_throttle_only_delays_work(spark, corpus_sf0001,
                                            tmp_path_factory):
    """max_fetch_per_round caps each round's fetches FIFO-by-seq; overflow
    re-queues like a deferral. The throttled crawl must reach the SAME seen
    set, depths and docs as the unthrottled one — just over more rounds."""
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    base = crawl(spark, pages, seeds, CrawlConfig(crawl_depth=1, num_buckets=8),
                 store_dir=str(tmp_path_factory.mktemp("thr_base")))
    thr = crawl(spark, pages, seeds,
                CrawlConfig(crawl_depth=1, num_buckets=8,
                            max_fetch_per_round=7),
                store_dir=str(tmp_path_factory.mktemp("thr_capped")))
    assert thr.rounds_run > base.rounds_run
    assert _seen_depths(thr) == _seen_depths(base)
    assert _docs_map(thr) == _docs_map(base)
    n_thr = thr.metrics.agg(F.sum("throttled")).collect()[0][0]
    assert (n_thr or 0) > 0
    # per-round fetch cap actually held
    per_round = (thr.metrics.filter(F.col("stage") == "fetch")
                 .groupBy("round").agg(F.sum("processed").alias("p")).collect())
    assert all(r["p"] <= 7 for r in per_round)


def test_docs_compaction(spark, corpus_sf0001, tmp_path_factory):
    """store.compact_docs writes one bucketed docs table equal to the union
    of the per-round docs dirs, with the bucket layout the engine uses."""
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    res = crawl(spark, pages, seeds, CrawlConfig(crawl_depth=2, num_buckets=8),
                store_dir=str(tmp_path_factory.mktemp("compact_docs")))
    out = res.store.compact_docs(spark, num_buckets=8)
    compact = spark.read.parquet(out)
    a = {(r["url"], r["mdx"]) for r in res.docs.select("url", "mdx").collect()}
    b = {(r["url"], r["mdx"]) for r in compact.select("url", "mdx").collect()}
    assert a == b
    got_buckets = {r["bucket"] for r in compact.select("bucket").distinct().collect()}
    assert got_buckets <= set(range(8))
    bad = compact.filter(
        F.col("bucket") != F.pmod(F.xxhash64("url"), F.lit(8))).count()
    assert bad == 0


def test_crawl_with_empty_pages_table(spark, corpus_sf0001, tmp_path_factory):
    """Every fetch fails (pages table empty): the crawl terminates cleanly
    with zero docs, every seed marked failed, and the seen set = seeds."""
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    empty = pages.filter(F.lit(False))
    res = crawl(spark, empty, seeds, CrawlConfig(crawl_depth=2, num_buckets=8),
                store_dir=str(tmp_path_factory.mktemp("empty_pages")))
    assert res.docs.count() == 0
    n_seeds = res.seen.count()
    assert n_seeds > 0
    failed = res.metrics.agg(F.sum("failed")).collect()[0][0]
    assert failed == n_seeds


def test_crawl_with_empty_seeds(spark, corpus_sf0001, tmp_path_factory):
    """Zero valid seeds: the crawl terminates after round 0 with nothing."""
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    none = seeds.filter(F.lit(False))
    res = crawl(spark, pages, none, CrawlConfig(crawl_depth=2, num_buckets=8),
                store_dir=str(tmp_path_factory.mktemp("empty_seeds")))
    assert res.seen.count() == 0
    assert res.docs is None or res.docs.count() == 0


def test_all_scale_features_combined(spark, corpus_sf0001, tmp_path_factory):
    """Integration: delay-only politeness + fetch throttle + bucket-wise
    fetch join + multi-snapshot pages, all in ONE crawl, must still equal the
    plain reference-parity crawl (each feature is individually proven above;
    this guards their interactions)."""
    pages, seeds, robots = load_tables(spark, corpus_sf0001)
    stale = (pages
             .withColumn("warc_ts", F.col("warc_ts") - F.expr("INTERVAL 2 DAYS"))
             .withColumn("html", F.lit("<html><body><p>OLD</p></body></html>")
                         .cast("binary")))
    multi = pages.unionByName(stale)
    delay_only = robots.select(
        "host", F.array().cast("array<string>").alias("disallow_prefixes"),
        F.lit(400).alias("crawl_delay_ms"))
    base = crawl(spark, pages, seeds, CrawlConfig(crawl_depth=1, num_buckets=8),
                 store_dir=str(tmp_path_factory.mktemp("combo_base")))
    combo = crawl(spark, multi, seeds,
                  CrawlConfig(crawl_depth=1, num_buckets=8, politeness=True,
                              round_budget_ms=1600, politeness_salt=2,
                              max_fetch_per_round=11,
                              broadcast_frontier_max=0),
                  store_dir=str(tmp_path_factory.mktemp("combo_all")),
                  robots=delay_only)
    assert combo.rounds_run > base.rounds_run
    assert _seen_depths(combo) == _seen_depths(base)
    assert _docs_map(combo) == _docs_map(base)


def test_stream_crawl_drains_throttled_frontier(spark, corpus_sf0001,
                                                tmp_path_factory):
    """The Structured-Streaming round runner must terminate by PROGRESS, not
    round index: under a fetch throttle the drain extends past crawl_depth+1
    rounds and the streamed crawl must still equal the batch crawl."""
    from supercrawler_spark.streaming.rounds import stream_crawl
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    cfg = CrawlConfig(crawl_depth=1, num_buckets=8, max_fetch_per_round=7)
    batch = crawl(spark, pages, seeds, cfg,
                  store_dir=str(tmp_path_factory.mktemp("sthr_batch")))
    streamed = stream_crawl(spark, pages, seeds, cfg,
                            store_dir=str(tmp_path_factory.mktemp("sthr_str")))
    assert streamed.rounds_run == batch.rounds_run > 2
    assert _seen_depths(streamed) == _seen_depths(batch)
    assert _docs_map(streamed) == _docs_map(batch)


def test_resume_mid_throttle_drain(spark, corpus_sf0001, tmp_path_factory):
    """Crash-resume while a throttled crawl is still draining overflow
    frontiers: the resumed crawl must finish the drain and equal the
    uninterrupted run (checkpoint lineage covers deferred work too)."""
    import json
    import os
    from supercrawler_spark.crawler import resume
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    cfg = CrawlConfig(crawl_depth=1, num_buckets=8, max_fetch_per_round=7)
    full = crawl(spark, pages, seeds, cfg,
                 store_dir=str(tmp_path_factory.mktemp("thr_full")))
    assert full.rounds_run >= 3, "need a multi-round drain for this test"

    crash_dir = str(tmp_path_factory.mktemp("thr_crash"))
    crawl(spark, pages, seeds, cfg, store_dir=crash_dir)
    mpath = os.path.join(crash_dir, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["rounds"] = manifest["rounds"][:2]   # crash mid-drain
    manifest["done"] = False
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    resumed = resume(spark, pages, crash_dir, cfg)
    assert _seen_depths(resumed) == _seen_depths(full)
    assert _docs_map(resumed) == _docs_map(full)


def test_seed_preview_materialized_and_mdx_readback(spark, corpus_sf0001,
                                                    tmp_path_factory):
    """A6: the first-five-seeds preview is a materialized store artifact.
    S8: a single doc reads back from the docs table by url (the reference's
    GET /output/{domain}/{path}.mdx analog, main.rs:989-1002)."""
    import json
    import os
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    store_dir = str(tmp_path_factory.mktemp("preview"))
    res = crawl(spark, pages, seeds, CrawlConfig(crawl_depth=0, num_buckets=8),
                store_dir=store_dir)
    manifest = json.load(open(os.path.join(store_dir, "manifest.json")))
    path = manifest["init"]["paths"]["seed_preview"]
    rows = spark.read.parquet(path).orderBy("seq").collect()
    assert 0 < len(rows) <= 5
    assert [r["seq"] for r in rows] == sorted(r["seq"] for r in rows)
    # S8 readback: url -> (mdx, doc_key); absent url -> empty (the 404)
    some = res.docs.select("url").limit(1).collect()[0]["url"]
    hit = res.docs.filter(F.col("url") == some).collect()
    assert len(hit) == 1 and hit[0]["mdx"].strip()
    assert res.docs.filter(
        F.col("url") == "https://nope.example.com/x").count() == 0

def test_priority_dequeue_orders_throttled_frontier(spark, corpus_sf0001,
                                                    tmp_path_factory):
    """North-rule priority queue: with a host_priority score table, the
    throttled dequeue serves high-priority hosts first (FIFO seq as
    tie-break), observable in the overflow re-queued to frontier r+1.
    Priority changes dequeue ORDER only — the drained crawl must equal the
    FIFO-throttled one."""
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window \
        .partitionBy("host").orderBy("url")
    urls = sorted(r["url"] for r in
                  pages.select("url",
                               F.split("url", "/").getItem(2).alias("host"))
                  .distinct()
                  .withColumn("_rk", F.row_number().over(w))
                  .filter(F.col("_rk") <= 4).select("url").collect())
    my_seeds = spark.createDataFrame([(u,) for u in urls], "url STRING")
    hosts = sorted({u.split("/")[2] for u in urls})
    assert len(hosts) >= 2, "need multi-host seeds for a priority test"
    top = hosts[-1]  # alphabetically-last host outranks everything
    # duplicate host rows on purpose: the engine must max-aggregate, not
    # multiply frontier rows through the join
    prio = spark.createDataFrame([(top, 10.0), (top, 4.0)],
                                 "host STRING, priority DOUBLE")

    cfg = CrawlConfig(crawl_depth=0, num_buckets=8, max_fetch_per_round=5)
    res = crawl(spark, pages, my_seeds, cfg,
                store_dir=str(tmp_path_factory.mktemp("prio")),
                host_priority=prio)

    # expected dequeue order: seed seq is the dense rank by url (alphabetical
    # here); priority host's rows first, then the rest FIFO
    seq = {u: i for i, u in enumerate(urls)}
    ordered = sorted(urls, key=lambda u: (-(10.0 if u.split("/")[2] == top
                                            else 0.0), seq[u]))
    f1 = {r["url"] for r in
          spark.read.parquet(res.store.frontier_path(1)).collect()}
    assert f1 == set(ordered[5:])
    f2 = {r["url"] for r in
          spark.read.parquet(res.store.frontier_path(2)).collect()}
    assert f2 == set(ordered[10:])
    n_rounds = -(-len(urls) // 5)           # ceil(len/cap) drain rounds
    assert res.rounds_run == n_rounds

    # drain equivalence: identity of the crawl is untouched by reordering
    fifo = crawl(spark, pages, my_seeds, cfg,
                 store_dir=str(tmp_path_factory.mktemp("prio_fifo")))
    assert fifo.rounds_run == n_rounds
    assert _seen_depths(res) == _seen_depths(fifo)
    assert _docs_map(res) == _docs_map(fifo)
    # but the FIFO round-0 overflow differs whenever the priority host is
    # not already the FIFO head — proves the reorder actually happened
    fifo_f1 = {r["url"] for r in
               spark.read.parquet(fifo.store.frontier_path(1)).collect()}
    assert fifo_f1 == set(urls[5:])
