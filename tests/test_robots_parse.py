"""robots.txt parser (north-rule politeness input): RFC-9309-style grammar
units, plus the end-to-end derivation — a polite crawl driven by a robots
table PARSED from /robots.txt pages must equal one driven by the hand-built
robots table."""

from pyspark.sql import functions as F

from supercrawler_spark.crawler import CrawlConfig, crawl
from supercrawler_spark.operators.robots import (parse_robots_txt,
                                                 robots_from_pages)
from supercrawler_spark.sources.synth import load_tables


def test_basic_group():
    dis, alw, ms = parse_robots_txt(
        "User-agent: *\nDisallow: /private\nCrawl-delay: 2\n")
    assert dis == ["/private"] and alw == [] and ms == 2000


def test_comments_case_and_blank_lines():
    body = """
# global rules
USER-AGENT: *   # everyone
DISALLOW: /tmp  # scratch
Disallow:
crawl-delay: 0.5
"""
    dis, _, ms = parse_robots_txt(body)
    assert dis == ["/tmp"]      # empty Disallow contributes nothing
    assert ms == 500


def test_specific_agent_beats_wildcard():
    body = ("User-agent: *\nDisallow: /a\nCrawl-delay: 9\n\n"
            "User-agent: SuperCrawler\nDisallow: /b\nCrawl-delay: 1\n")
    dis, _, ms = parse_robots_txt(body, user_agent="supercrawler")
    assert dis == ["/b"] and ms == 1000
    dis, _, ms = parse_robots_txt(body, user_agent="otherbot")
    assert dis == ["/a"] and ms == 9000


def test_multi_agent_group_and_merge():
    body = ("User-agent: a\nUser-agent: b\nDisallow: /x\n\n"
            "User-agent: b\nDisallow: /y\nCrawl-delay: 3\n")
    dis, _, ms = parse_robots_txt(body, user_agent="b")
    assert dis == ["/x", "/y"] and ms == 3000


def test_garbage_tolerance():
    assert parse_robots_txt("") == ([], [], 0)
    assert parse_robots_txt("not a field line\n???\n") == ([], [], 0)
    assert parse_robots_txt("User-agent: *\nCrawl-delay: soon\n") == ([], [], 0)


def test_allow_longest_match_precedence():
    from supercrawler_spark.operators.robots import is_blocked
    body = ("User-agent: *\nDisallow: /private\n"
            "Allow: /private/public\nCrawl-delay: 1\n")
    dis, alw, ms = parse_robots_txt(body)
    assert dis == ["/private"] and alw == ["/private/public"] and ms == 1000
    assert is_blocked("/private/x", dis, alw)
    assert not is_blocked("/private/public/doc", dis, alw)  # Allow wins (longer)
    assert not is_blocked("/open", dis, alw)
    # tie: Allow beats Disallow at equal length
    assert not is_blocked("/p", ["/p"], ["/p"])


def test_engine_allow_overrides_disallow(spark, corpus_sf0001,
                                         tmp_path_factory):
    """Engine-level RFC 9309 precedence: an Allow prefix under a disallowed
    tree re-opens exactly that subtree to the polite crawl."""
    pages, seeds, robots_tbl = load_tables(spark, corpus_sf0001)
    with_allow = robots_tbl.select(
        "host", "disallow_prefixes",
        F.array(F.lit("/private/p1")).alias("allow_prefixes"),
        "crawl_delay_ms")
    cfg = CrawlConfig(crawl_depth=2, num_buckets=8, politeness=True)
    base = crawl(spark, pages, seeds, cfg,
                 store_dir=str(tmp_path_factory.mktemp("allow_base")),
                 robots=robots_tbl)
    opened = crawl(spark, pages, seeds, cfg,
                   store_dir=str(tmp_path_factory.mktemp("allow_open")),
                   robots=with_allow)
    base_priv = {r["url"] for r in base.docs.collect()
                 if "/private/" in r["url"]}
    open_priv = {r["url"] for r in opened.docs.collect()
                 if "/private/" in r["url"]}
    assert base_priv == set()
    assert all("/private/p1" in u for u in open_priv)
    b_blocked = base.metrics.agg(F.sum("robots_blocked")).collect()[0][0] or 0
    o_blocked = opened.metrics.agg(F.sum("robots_blocked")).collect()[0][0] or 0
    assert o_blocked <= b_blocked


def test_robots_one_row_per_host_across_urls(spark):
    """A host serving robots.txt under several URLs (http+https, snapshots)
    must collapse to ONE row — latest warc_ts wins, ties broken by max url —
    or the politeness left join would fan out every frontier row."""
    import datetime
    from supercrawler_spark.operators.robots import robots_from_pages
    ts = datetime.datetime
    rows = [
        ("http://a.com/robots.txt", ts(2025, 1, 1), b"User-agent: *\nDisallow: /old\n"),
        ("https://a.com/robots.txt", ts(2025, 6, 1), b"User-agent: *\nDisallow: /new\n"),
        ("https://b.com/robots.txt", ts(2025, 1, 1), b"User-agent: *\nDisallow: /b\n"),
    ]
    pages = spark.createDataFrame(
        [(u, t, h, "", "en") for u, t, h in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    out = robots_from_pages(pages).collect()
    got = {r["host"]: list(r["disallow_prefixes"]) for r in out}
    assert len(out) == 2
    assert got == {"a.com": ["/new"], "b.com": ["/b"]}


def test_polite_crawl_from_parsed_robots(spark, corpus_sf0001,
                                         tmp_path_factory):
    """End-to-end: augment pages with /robots.txt rows whose bodies encode
    the corpus robots table, parse them back with robots_from_pages, and
    check the polite crawl equals one using the original table."""
    pages, seeds, robots_tbl = load_tables(spark, corpus_sf0001)
    body = F.concat(
        F.lit("User-agent: *\n"),
        F.concat_ws("", F.transform(
            F.col("disallow_prefixes"),
            lambda p: F.concat(F.lit("Disallow: "), p, F.lit("\n")))),
        F.when(F.col("crawl_delay_ms") > 0,
               F.concat(F.lit("Crawl-delay: "),
                        (F.col("crawl_delay_ms") / 1000).cast("string"),
                        F.lit("\n"))).otherwise(F.lit("")))
    robot_pages = robots_tbl.select(
        F.concat(F.lit("https://"), "host", F.lit("/robots.txt")).alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        body.cast("binary").alias("html"),
        F.lit("").alias("text"), F.lit("en").alias("lang"),
        F.lit("text/plain").alias("content_type"))
    aug = pages.unionByName(robot_pages.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(8)).cast("int")))

    parsed = robots_from_pages(aug)
    got = {r["host"]: (sorted(r["disallow_prefixes"]), r["crawl_delay_ms"])
           for r in parsed.collect()}
    exp = {r["host"]: (sorted(r["disallow_prefixes"]), r["crawl_delay_ms"])
           for r in robots_tbl.collect()}
    assert got == exp

    cfg = CrawlConfig(crawl_depth=1, num_buckets=8, politeness=True)
    a = crawl(spark, pages, seeds, cfg,
              store_dir=str(tmp_path_factory.mktemp("rob_tbl")),
              robots=robots_tbl)
    b = crawl(spark, aug, seeds, cfg,
              store_dir=str(tmp_path_factory.mktemp("rob_parsed")),
              robots=parsed)
    sa = {r["url"] for r in a.seen.select("url").collect()}
    sb = {r["url"] for r in b.seen.select("url").collect()}
    assert sa == sb
    # robots="auto": the crawler derives the table itself from pages
    c = crawl(spark, aug, seeds, cfg,
              store_dir=str(tmp_path_factory.mktemp("rob_auto")),
              robots="auto")
    sc = {r["url"] for r in c.seen.select("url").collect()}
    assert sc == sa
