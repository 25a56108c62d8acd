"""Crawl-semantics tests: the Spark engine must equal the pure-Python oracle
BFS (concurrency-1 reference mirror, SURVEY.md §5.3/§7.0) on the synthetic
corpus — per-round frontier (order included), final seen set, docs, metrics,
and byte-identical extracted text."""

import json
import os

import pytest
from pyspark.sql import functions as F

from supercrawler_spark.crawler import Crawler, CrawlConfig, crawl, resume
from supercrawler_spark.oracle import oracle_bfs
from supercrawler_spark.sources.synth import generate_corpus, load_tables

CFG = CrawlConfig(crawl_depth=2, num_buckets=8)


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(0.001)


@pytest.fixture(scope="module")
def oracle(corpus):
    return oracle_bfs({p.url: (p.html, p.content_type) for p in corpus.pages},
                      corpus.seeds,
                      crawl_depth=CFG.crawl_depth, strip_tracking=True)


@pytest.fixture(scope="module")
def engine_result(spark, corpus_sf0001, tmp_path_factory):
    pages, seeds, robots = load_tables(spark, corpus_sf0001)
    store_dir = str(tmp_path_factory.mktemp("store"))
    return crawl(spark, pages, seeds, CFG, store_dir=store_dir)


def test_frontier_rounds_match_oracle_in_order(engine_result, oracle):
    for depth, expected in oracle.frontier_by_depth.items():
        got_df = engine_result.frontiers.get(depth)
        assert got_df is not None, f"engine missing frontier at depth {depth}"
        got = [r["url"] for r in got_df.orderBy("seq").collect()]
        assert got == expected, f"depth {depth}: order/content mismatch"


def test_final_seen_set_matches_oracle(engine_result, oracle):
    got = {r["url"] for r in engine_result.seen.select("url").collect()}
    assert got == oracle.seen


def test_docs_match_oracle_and_goldens(spark, engine_result, oracle, corpus):
    docs = {r["url"]: r["mdx"] for r in engine_result.docs.collect()}
    assert set(docs) == set(oracle.doc_urls())
    golden = {p.url: p.text for p in corpus.pages}
    for url, mdx in docs.items():
        assert mdx == golden[url], f"extracted text not byte-identical: {url}"


def test_doc_crawl_order_matches_oracle(engine_result, oracle):
    got = [r["url"] for r in engine_result.docs.orderBy("depth", "seq").collect()]
    assert got == oracle.doc_urls()


def test_metrics_totals_match_oracle(engine_result, oracle):
    m = (engine_result.metrics
         .groupBy("round")
         .agg(F.sum("fetched").alias("fetched"),
              F.sum("failed").alias("failed"),
              F.sum("deduped").alias("deduped"),
              F.sum("frontier_added").alias("added"))
         .collect())
    by_round = {r["round"]: r for r in m}
    for depth, om in oracle.metrics_by_depth.items():
        got = by_round[depth]
        assert got["fetched"] == om["fetched"], f"round {depth} fetched"
        assert got["failed"] == om["failed"], f"round {depth} failed"
        assert (got["deduped"] or 0) == om["deduped"], f"round {depth} deduped"
        assert (got["added"] or 0) == om["frontier_added"], f"round {depth} added"


def test_pdf_dispatch(engine_result, oracle, corpus):
    """F5/S3/X8/F6: reachable PDF pages yield PDF-wrapped MDX and contribute
    no outgoing links; unsupported content types yield no docs."""
    pdf_urls = {p.url for p in corpus.pages if p.content_type == "application/pdf"}
    other_urls = {p.url for p in corpus.pages
                  if p.content_type == "application/octet-stream"}
    docs = {r["url"]: r["mdx"] for r in engine_result.docs.collect()}
    crawled_pdfs = set(docs) & pdf_urls
    assert crawled_pdfs == {u for u, _, _ in oracle.docs} & pdf_urls
    for u in crawled_pdfs:
        assert docs[u].startswith('---\ntitle: "PDF Document: ')
    assert not set(docs) & other_urls


def test_metrics_are_per_partition(engine_result):
    rows = engine_result.metrics.filter(F.col("stage") == "fetch").collect()
    assert all(r["partition_id"] is not None for r in rows)


def test_phase_times_recorded(engine_result):
    """A5: every committed round carries per-phase wall timings in the
    manifest, surfaced on CrawlResult.phase_times, keyed 'init' + round."""
    pt = engine_result.phase_times
    assert "init" in pt and "seed_prep_write" in pt["init"]
    rounds = [k for k in pt if k != "init"]
    assert len(rounds) == engine_result.rounds_run
    for r in rounds:
        assert {"stats_collect", "fetch_extract_write",
                "docs_write", "metrics_write"} <= set(pt[r])
        assert all(v >= 0 for v in pt[r].values())


def test_robots_politeness(spark, corpus_sf0001, corpus, tmp_path_factory):
    pages, seeds, robots = load_tables(spark, corpus_sf0001)
    cfg = CrawlConfig(crawl_depth=2, num_buckets=8, politeness=True)
    store_dir = str(tmp_path_factory.mktemp("store_rob"))
    res = crawl(spark, pages, seeds, cfg, store_dir=store_dir, robots=robots)
    orc = oracle_bfs({p.url: (p.html, p.content_type) for p in corpus.pages},
                     corpus.seeds,
                     crawl_depth=2, strip_tracking=True, robots=corpus.robots)
    blocked = res.metrics.agg(F.sum("robots_blocked")).collect()[0][0]
    expected_blocked = sum(m["robots_blocked"] for m in orc.metrics_by_depth.values())
    assert blocked == expected_blocked and expected_blocked > 0
    # no /private docs were fetched
    priv = res.docs.filter(F.col("url").contains("/private/")).count()
    assert priv == 0


def test_resume_equals_uninterrupted(spark, corpus_sf0001, tmp_path_factory):
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    full_dir = str(tmp_path_factory.mktemp("store_full"))
    full = crawl(spark, pages, seeds, CFG, store_dir=full_dir)
    full_seen = {r["url"] for r in full.seen.select("url").collect()}
    full_docs = {r["url"] for r in full.docs.select("url").collect()}

    # simulate a crash after round 0: drop later manifest entries
    crash_dir = str(tmp_path_factory.mktemp("store_crash"))
    crawl(spark, pages, seeds, CFG, store_dir=crash_dir)
    mpath = os.path.join(crash_dir, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["rounds"] = manifest["rounds"][:1]
    manifest["done"] = False
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    resumed = resume(spark, pages, crash_dir, CFG)
    got_seen = {r["url"] for r in resumed.seen.select("url").collect()}
    got_docs = {r["url"] for r in resumed.docs.select("url").collect()}
    assert got_seen == full_seen
    assert got_docs == full_docs


def test_seen_compaction(spark, corpus_sf0001, oracle, tmp_path_factory):
    """With a tight compaction cadence the seen set compacts mid-crawl and
    the final seen set is unchanged."""
    import json as _json
    import os as _os

    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    cfg = CrawlConfig(crawl_depth=2, num_buckets=8, compact_seen_every=2)
    store_dir = str(tmp_path_factory.mktemp("store_compact"))
    res = crawl(spark, pages, seeds, cfg, store_dir=store_dir)
    manifest = _json.load(open(_os.path.join(store_dir, "manifest.json")))
    assert any("seen_compact" in e["paths"] for e in manifest["rounds"]), \
        "compaction never triggered"
    got = {r["url"] for r in res.seen.select("url").collect()}
    assert got == oracle.seen


def test_depth_zero_crawl(spark, corpus_sf0001, tmp_path_factory):
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    cfg = CrawlConfig(crawl_depth=0, num_buckets=8)
    res = crawl(spark, pages, seeds, cfg,
                store_dir=str(tmp_path_factory.mktemp("store_d0")))
    assert res.rounds_run == 1
    assert res.docs.count() == res.seen.count() == seeds.count()


def test_all_resolved_round_skips_recovery(spark, tmp_path_factory):
    """Fast path: when every fetchable url has a pages row, the round's
    observed extract count equals the fetchable count and the failed-fetch
    recovery append is skipped — docs/metrics must be identical to a crawl
    that takes the recovery branch (here: complete, with failed == 0)."""
    html = ('<html><head><title>t</title></head>'
            '<body><p>body {i}</p><a href="/p{j}">n</a></body></html>')
    rows = [(f"https://allgood.test/p{i}",
             html.replace("{i}", str(i)).replace("{j}", str((i + 1) % 4)),
             "text/html") for i in range(4)]
    pages = spark.createDataFrame(rows, "url string, html string, content_type string")
    seeds = spark.createDataFrame([("https://allgood.test/p0",)], "url string")
    res = crawl(spark, pages, seeds, CrawlConfig(crawl_depth=3, num_buckets=8),
                store_dir=str(tmp_path_factory.mktemp("store_allgood")))
    assert res.docs.count() == 4
    m = res.metrics.agg(F.sum("failed").alias("f"),
                        F.sum("fetched").alias("ok")).collect()[0]
    assert (m["f"] or 0) == 0 and m["ok"] == 4


def test_dup_page_row_cannot_fake_completeness(spark, tmp_path_factory):
    """Contract-violating pages input (duplicate row for one url) plus a
    missing url: row counts offset, but the url-hash checksum must force
    the recovery branch so the missing url still gets its fetched=false
    row and the failed metric is right."""
    h = ('<html><head><title>t</title></head>'
         '<body><p>x</p><a href="/gone">g</a></body></html>')
    rows = [("https://dup.test/a", h, "text/html"),
            ("https://dup.test/a", h, "text/html")]  # dup, no /gone row
    pages = spark.createDataFrame(rows, "url string, html string, content_type string")
    seeds = spark.createDataFrame([("https://dup.test/a",),
                                   ("https://dup.test/gone",)], "url string")
    res = crawl(spark, pages, seeds, CrawlConfig(crawl_depth=0, num_buckets=8),
                store_dir=str(tmp_path_factory.mktemp("store_dup")))
    m = res.metrics.agg(F.sum("failed").alias("f")).collect()[0]
    assert (m["f"] or 0) == 1, "missing url lost its fetched=false row"
