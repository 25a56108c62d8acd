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


# ---- RFC 9309 §2.2.3 wildcard rules (* and $) ------------------------------

def test_wildcard_match_battery():
    """The de-facto-standard wildcard cases (as published in the RFC and
    Google's robots.txt documentation)."""
    from supercrawler_spark.operators.robots import is_blocked, rule_match_len

    # /fish* == /fish (prefix), matches subpaths and suffixes
    for path in ("/fish", "/fishheads", "/fish.php", "/fish/salmon.html"):
        assert rule_match_len(path, "/fish*") == 6, path
    assert rule_match_len("/Fish.asp", "/fish*") == -1  # case-sensitive
    # /*.php: any path containing .php
    for path in ("/index.php", "/folder/filename.php",
                 "/folder/filename.php?parameters", "/index.php/"):
        assert rule_match_len(path, "/*.php") == 6, path
    assert rule_match_len("/", "/*.php") == -1
    assert rule_match_len("/windows.PHP", "/*.php") == -1
    # /*.php$: must END with .php
    assert rule_match_len("/filename.php", "/*.php$") == 7
    assert rule_match_len("/folder/filename.php", "/*.php$") == 7
    assert rule_match_len("/filename.php?parameters", "/*.php$") == -1
    assert rule_match_len("/filename.php5", "/*.php$") == -1
    # /fish*.php: .php somewhere after /fish
    assert rule_match_len("/fish.php", "/fish*.php") == 10
    assert rule_match_len("/fishheads/catfish.php?p=1", "/fish*.php") == 10
    assert rule_match_len("/Fish.PHP", "/fish*.php") == -1
    # precedence: longest RULE wins, allow beats disallow on ties
    assert not is_blocked("/page", ["/"], ["/p"])
    assert not is_blocked("/folder/page", ["/folder"], ["/folder"])
    assert is_blocked("/page.htm", ["/*.htm"], ["/page"])   # 6 > 5
    assert not is_blocked("/", ["/"], ["/$"])                # 2 > 1
    assert is_blocked("/other", ["/"], ["/$"])               # $ anchors
    # regex metacharacters in paths are literal in rules
    assert rule_match_len("/a.b/c", "/a.b/*") == 6
    assert rule_match_len("/aXb/c", "/a.b/*") == -1


def test_parse_splits_wildcard_rules():
    from supercrawler_spark.operators.robots import (_split_wild,
                                                     parse_robots_txt)
    body = ("User-agent: *\nDisallow: /private\nDisallow: /*.php$\n"
            "Allow: /public*html\nAllow: /open\n")
    d, a, ms = parse_robots_txt(body)
    assert d == ["/private", "/*.php$"] and a == ["/public*html", "/open"]
    dp, dwr, dwl = _split_wild(d)
    assert dp == ["/private"] and dwl == [7]
    assert dwr == ["(?s)^/.*\\.php\\z"]
    ap, awr, awl = _split_wild(a)
    assert ap == ["/open"] and awl == [12]


def test_dollar_anchor_is_absolute_end_of_path():
    """RFC end-of-path semantics: '$' anchors at the ABSOLUTE end. A path
    ending in a stray newline ('/x.php\\n') must NOT satisfy '/*.php$' —
    regex '$' in both Java and Python would match before that final
    newline, which is why glob_to_regex emits \\z (\\Z in the Python
    flavor) instead."""
    from supercrawler_spark.operators.robots import rule_match_len
    assert rule_match_len("/x.php", "/*.php$") == 7
    assert rule_match_len("/x.php\n", "/*.php$") == -1
    assert rule_match_len("/x.php\nmore", "/*.php$") == -1
    # '*' runs still cross newlines ((?s) DOTALL): non-anchored rule
    assert rule_match_len("/a\nb/x.php", "/*.php") == len("/*.php")


def test_jvm_fold_equals_python_spec(spark):
    """best_match_len (the engine's codegen fold) must agree with the
    pure-Python rule_match_len spec on a rules x paths matrix that
    exercises prefixes, *-runs, $-anchors and regex metacharacters."""
    from supercrawler_spark.operators.robots import (best_match_len,
                                                     is_blocked, _split_wild)
    disallow = ["/private", "/*.php$", "/fish*", "/a.b/*", "/*?session"]
    allow = ["/fish/ok", "/private/pub*", "/$"]
    paths = ["/", "/private", "/private/pub/x", "/index.php",
             "/index.php5", "/fish", "/fishheads/catfish.php",
             "/fish/ok/page", "/a.b/c", "/aXb/c", "/page?session=1",
             "/other", "/x.php\n", "/index.php\nextra"]
    dp, dwr, dwl = _split_wild(disallow)
    ap, awr, awl = _split_wild(allow)
    rows = [(p, dp, dwr, dwl, ap, awr, awl) for p in paths]
    df = spark.createDataFrame(
        rows, "path STRING, dp ARRAY<STRING>, dwr ARRAY<STRING>, "
              "dwl ARRAY<BIGINT>, ap ARRAY<STRING>, awr ARRAY<STRING>, "
              "awl ARRAY<BIGINT>")
    out = df.select(
        "path",
        best_match_len(F.col("path"), F.col("dp"), F.col("dwr"),
                       F.col("dwl")).alias("d"),
        best_match_len(F.col("path"), F.col("ap"), F.col("awr"),
                       F.col("awl")).alias("a")).collect()
    from supercrawler_spark.operators.robots import rule_match_len
    for r in out:
        exp_d = max((rule_match_len(r["path"], x) for x in disallow),
                    default=-1)
        exp_a = max((rule_match_len(r["path"], x) for x in allow),
                    default=-1)
        assert r["d"] == max(exp_d, 0), r
        assert r["a"] == max(exp_a, 0), r
        assert (r["d"] > r["a"]) == is_blocked(r["path"], disallow, allow), r


def test_polite_crawl_with_wildcard_rules_matches_oracle(spark):
    """End-to-end: a politeness crawl whose robots.txt carries wildcard
    rules blocks exactly the urls the pure-Python BFS oracle blocks."""
    from supercrawler_spark.oracle import oracle_bfs
    from supercrawler_spark.operators.robots import robots_from_pages

    host = "w.example.com"
    body = ("User-agent: *\nDisallow: /*.php$\nDisallow: /trap*\n"
            "Allow: /trapdoor\n")
    site = {
        f"https://{host}/": ["a.php", "b.html", "trap/x", "trapdoor",
                             "c.php?x=1"],
        f"https://{host}/b.html": ["deep.php"],
    }
    pages_rows = [(f"https://{host}/robots.txt", body.encode())]
    for url, links in site.items():
        html = "<html><head></head><body>" + "".join(
            f'<a href="/{l}">x</a>' for l in links) + "</body></html>"
        pages_rows.append((url, html.encode()))
    for l in ["a.php", "trap/x", "trapdoor", "c.php?x=1", "deep.php"]:
        pages_rows.append((f"https://{host}/{l}",
                           b"<html><head></head><body>leaf</body></html>"))
    pages = spark.createDataFrame(pages_rows, "url STRING, html BINARY")
    seeds = spark.createDataFrame([(f"https://{host}/", 0)],
                                  "url STRING, seed_order LONG")
    robots_tbl = robots_from_pages(pages)
    import tempfile
    cfg = CrawlConfig(crawl_depth=2, num_buckets=4, politeness=True)
    res = crawl(spark, pages, seeds, cfg,
                store_dir=tempfile.mkdtemp(prefix="robwild_"),
                robots=robots_tbl)
    blocked = int(res.metrics.agg(F.sum("robots_blocked")).collect()[0][0])
    oracle_pages = {u: h.decode() for u, h in pages_rows}
    orc = oracle_bfs(
        oracle_pages, [f"https://{host}/"], crawl_depth=2,
        robots=[{"host": host,
                 "disallow_prefixes": ["/*.php$", "/trap*"],
                 "allow_prefixes": ["/trapdoor"],
                 "crawl_delay_ms": 0}])
    exp_blocked = sum(m["robots_blocked"]
                      for m in orc.metrics_by_depth.values())
    assert blocked == exp_blocked > 0
