"""RSS/Atom feed parser edge cases (the round-trip parity runs in
tests/test_oracle_parity.py as `feed_seeds`)."""

import datetime

from pyspark.sql import functions as F

from supercrawler_spark.operators.feeds import build_feeds, parse_feeds

RSS = ('<?xml version="1.0"?><rss version="2.0"><channel>'
       "<title>chan title</title>"
       "<item><title> First </title><link> https://h.example/a </link>"
       "<pubDate>Mon, 05 Jan 2026 13:45:00 GMT</pubDate></item>"
       "<item><link>https://h.example/no-date</link></item>"
       "<item><title>no link, dropped</title></item>"
       "<item><title></title><link>https://h.example/empty-title</link>"
       "</item>"
       "</channel></rss>")

ATOM = ('<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
        "<title>feed title</title>"
        '<entry><title>E1</title><link rel="alternate" '
        'href="https://a.example/x"/>'
        "<updated>2026-02-03T09:30:00Z</updated></entry>"
        '<entry><link href="https://a.example/y"/></entry>'
        "<entry><title>dropped: no link</title></entry>"
        "</feed>")


def _parse(spark, xml):
    df = spark.createDataFrame([("h", xml)], "host string, xml string")
    return {r["pos"]: r for r in parse_feeds(df).collect()}


def test_rss_entries(spark):
    rows = _parse(spark, RSS)
    # channel preamble is not an entry; the no-link item is dropped
    assert set(rows) == {0, 1, 3}
    assert rows[0]["url"] == "https://h.example/a"
    assert rows[0]["title"] == "First"  # whitespace trimmed
    assert rows[0]["published"] == datetime.date(2026, 1, 5)
    assert rows[0]["fmt"] == "rss"
    assert rows[1]["published"] is None and rows[1]["title"] is None
    assert rows[3]["title"] is None  # empty tag -> NULL


def test_atom_entries(spark):
    rows = _parse(spark, ATOM)
    assert set(rows) == {0, 1}
    assert rows[0]["url"] == "https://a.example/x"
    assert rows[0]["published"] == datetime.date(2026, 2, 3)
    assert rows[0]["fmt"] == "atom"
    assert rows[1]["published"] is None


def test_unknown_format_yields_nothing(spark):
    df = spark.createDataFrame([("h", "<html><body>not a feed</body></html>")],
                               "host string, xml string")
    assert parse_feeds(df).count() == 0


def test_roundtrip_both_formats_present(spark):
    import __spark_entry__ as entry_mod
    docs = entry_mod._docs(spark, "/root/testdata/sf0.001")
    out = parse_feeds(build_feeds(docs))
    fmts = {r["fmt"] for r in out.select("fmt").distinct().collect()}
    assert fmts == {"rss", "atom"}
    assert out.count() == docs.count()
    assert out.filter(F.col("published").isNull()).count() == 0


def test_rss_numeric_zone_yields_null_not_crash(spark):
    """Spark 4 ANSI mode: a '+0000' numeric zone (RFC-5322-preferred) must
    surface as published=NULL, never abort the job."""
    xml = ('<?xml version="1.0"?><rss version="2.0"><channel>'
           "<item><link>https://h/a</link>"
           "<pubDate>Mon, 05 Jan 2026 00:00:00 +0000</pubDate></item>"
           "</channel></rss>")
    rows = _parse(spark, xml)
    assert rows[0]["url"] == "https://h/a"
    assert rows[0]["published"] is None


def test_rss_weekday_optional(spark):
    """RFC 822 day-of-week is optional — dates without it must parse."""
    import datetime
    xml = ('<?xml version="1.0"?><rss version="2.0"><channel>'
           "<item><link>https://h/b</link>"
           "<pubDate>05 Jan 2026 13:45:00 GMT</pubDate></item>"
           "</channel></rss>")
    rows = _parse(spark, xml)
    assert rows[0]["published"] == datetime.date(2026, 1, 5)


def test_atom_garbage_updated_yields_null(spark):
    xml = ('<?xml version="1.0"?><feed><entry>'
           '<link href="https://h/c"/><updated>not-a-date</updated>'
           "</entry></feed>")
    rows = _parse(spark, xml)
    assert rows[0]["published"] is None


def test_hreflang_edges_and_clusters(spark):
    from supercrawler_spark.operators.alternates import (hreflang_clusters,
                                                         hreflang_edges)
    html_a = ('<html><head>'
              '<link rel="alternate" hreflang="en" href="https://a/en"/>'
              '<link rel="alternate" hreflang="fr" href="https://a/fr"/>'
              '<link rel="stylesheet" href="https://a/css"/>'
              '<link rel="alternate" href="https://a/no-lang"/>'
              "</head><body/></html>")
    pages = spark.createDataFrame(
        [("https://a/en", html_a),
         ("https://a/fr", html_a),
         ("https://b/solo", "<html><head></head><body/></html>")],
        "url string, html string")
    edges = hreflang_edges(pages)
    got = {(r["url"], r["hreflang"], r["alt_url"]) for r in edges.collect()}
    # stylesheet and lang-less alternates excluded; no-declaration page
    # yields nothing
    assert got == {("https://a/en", "en", "https://a/en"),
                   ("https://a/en", "fr", "https://a/fr"),
                   ("https://a/fr", "en", "https://a/en"),
                   ("https://a/fr", "fr", "https://a/fr")}
    cl = {r["url"]: (r["cluster_id"], r["n_alternates"])
          for r in hreflang_clusters(edges).collect()}
    assert cl == {"https://a/en": ("https://a/en", 2),
                  "https://a/fr": ("https://a/en", 2)}


def test_hreflang_quoting_variants(spark):
    """Real-web attribute syntax: single-quoted and unquoted declarations
    must parse identically to double-quoted ones; rel=alternately must
    NOT match the unquoted rel test."""
    from supercrawler_spark.operators.alternates import hreflang_edges
    html = ('<html><head>'
            "<link rel='alternate' hreflang='en' href='https://a/en'/>"
            '<link rel=alternate hreflang=fr href=https://a/fr />'
            '<link rel="alternate" hreflang = "de" href = "https://a/de"/>'
            '<link rel=alternately hreflang=xx href=https://a/xx />'
            "</head><body/></html>")
    pages = spark.createDataFrame([("https://a/en", html)],
                                  "url string, html string")
    got = {(r["hreflang"], r["alt_url"])
           for r in hreflang_edges(pages).collect()}
    assert got == {("en", "https://a/en"), ("fr", "https://a/fr"),
                   ("de", "https://a/de")}
