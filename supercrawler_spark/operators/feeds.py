"""RSS/Atom feed ingestion: parse syndication feeds into frontier seed rows.

Feeds are the freshness channel sitemaps aren't: a site's ``/feed.xml``
lists its NEWEST documents with publish timestamps, so a crawl scheduler
polls feeds at high frequency to discover new URLs minutes after they
appear, while sitemaps (operators/sitemaps.py) enumerate the whole site for
completeness. The reference engine discovers URLs only from in-page links
(/root/reference/src/supercrawler.rs:596-610); this is the other missing
production seed source.

Same Spark-first parsing design as the sitemap parser: split on the item
element boundary, ``posexplode`` fragments, regexp-extract fields from each
small fragment — whole-stage-codegen JVM expressions end to end, no Python
in the row path, embarrassingly parallel over feeds, O(entries) per feed.

Both wire formats are handled in one pass:
- RSS 2.0: ``<item>`` entries, ``<link>url</link>``, RFC-822
  ``<pubDate>`` (normalized to a DATE via ``to_timestamp`` with the
  RFC-822 pattern);
- Atom: ``<entry>`` entries, ``<link href="url"/>``, ISO-8601
  ``<updated>`` (date prefix).

Entries lacking a usable link are dropped (protocol-invalid); missing
dates/titles surface as NULL. Document order is preserved via ``pos`` for
deterministic downstream tie-breaks.

The CORRECTNESS fixture builds one feed per host from ``documents`` —
even-group hosts publish RSS, odd-group hosts Atom, so BOTH branches parse
non-vacuously — and parses them back; the DuckDB oracle declares the
expected rows directly from ``documents`` (round-trip equality proves the
parser, not the builder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Spark's post-3.0 datetime parser rejects the EEE weekday pattern when
# PARSING (formatting only), so the RFC-822 weekday prefix is stripped by
# regexp before to_timestamp sees the rest
_RFC822_TAIL = "dd MMM yyyy HH:mm:ss 'GMT'"


def _doc_rows(docs: DataFrame) -> DataFrame:
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.date_sub(F.lit("2026-01-01").cast("date"),
                   (F.col("doc_id") % 365).cast("int")).alias("pub"),
        F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
        .alias("title"),
        # host group id drives the format split (src7 -> 7)
        F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("long")
        .alias("gid"))
    return d.withColumn("fmt", F.when(F.col("gid") % 2 == 0, "rss")
                        .otherwise(F.lit("atom")))


def build_feeds(docs: DataFrame) -> DataFrame:
    """Deterministic per-host feed fixture: (host, xml) — RSS 2.0 for
    even-gid hosts, Atom for odd-gid hosts, items in doc_id order."""
    d = _doc_rows(docs)
    rss_item = F.concat(
        F.lit("<item><title>"), F.col("title"), F.lit("</title><link> "),
        F.col("url"), F.lit(" </link><pubDate>"),
        F.date_format(F.col("pub"), "EEE, dd MMM yyyy"),
        F.lit(" 00:00:00 GMT</pubDate></item>"))
    atom_entry = F.concat(
        F.lit("<entry><title>"), F.col("title"),
        F.lit('</title><link rel="alternate" href="'), F.col("url"),
        F.lit('"/><updated>'),
        F.date_format(F.col("pub"), "yyyy-MM-dd"),
        F.lit("T00:00:00Z</updated></entry>"))
    item = F.when(F.col("fmt") == "rss", rss_item).otherwise(atom_entry)
    body = F.concat_ws("", F.transform(
        F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
        lambda s: s["entry"]))
    return (d.withColumn("entry", item)
            .groupBy("host", "fmt")
            .agg(body.alias("items"))
            .select("host", F.when(
                F.col("fmt") == "rss",
                F.concat(F.lit('<?xml version="1.0"?><rss version="2.0">'
                               "<channel><title>feed</title>"),
                         F.col("items"), F.lit("</channel></rss>")))
                .otherwise(F.concat(
                    F.lit('<?xml version="1.0"?>'
                          '<feed xmlns="http://www.w3.org/2005/Atom">'
                          "<title>feed</title>"),
                    F.col("items"), F.lit("</feed>"))).alias("xml")))


def parse_feeds(feeds: DataFrame, xml_col: str = "xml",
                host_col: str = "host",
                carry: tuple[str, ...] = ()) -> DataFrame:
    """(host, [carry...,] pos, url, published, title, fmt): one row per
    feed entry, RSS and Atom in the same pass. Pure codegen string
    expressions — format sniff on the root element, fragment split on the
    item boundary, per-fragment regexps; RFC-822 pubDates and ISO-8601
    updated stamps both normalize to a DATE. ``carry`` names input columns
    to ride through (e.g. the poll timestamp a streaming watermark
    needs)."""
    fmt = F.when(F.col(xml_col).contains("<rss"), "rss") \
        .when(F.col(xml_col).contains("<feed"), "atom")
    frags = F.split(F.col(xml_col), F.lit("<item>|<entry>"))
    z = (feeds.select(F.col(host_col).alias("host"),
                      *[F.col(c) for c in carry], fmt.alias("fmt"),
                      F.posexplode(frags).alias("rawpos", "frag"))
         .filter(F.col("fmt").isNotNull() & (F.col("rawpos") > 0))
         .withColumn("pos", (F.col("rawpos") - 1).cast("long")))
    rss_link = F.regexp_extract(F.col("frag"),
                                r"<link>\s*([^<]*?)\s*</link>", 1)
    atom_link = F.regexp_extract(F.col("frag"),
                                 r'<link[^>]*href="([^"]*)"', 1)
    url = F.when(F.col("fmt") == "rss", rss_link).otherwise(atom_link)
    nn = lambda c: F.when(F.length(c) > 0, c)  # ''/absent -> NULL
    # try_* variants: under Spark 4's default ANSI mode the plain
    # to_timestamp/to_date THROW on unparseable text (a single feed with a
    # '+0000' numeric zone would abort the job — and in the streaming
    # poller, wedge the checkpoint permanently); malformed dates must
    # surface as NULL per this parser's contract. The RFC-822 weekday
    # prefix is optional (RFC 5322 day-of-week is optional), hence the
    # non-capturing (?:\w+,\s*)? group.
    rss_date = F.to_date(F.try_to_timestamp(
        nn(F.regexp_extract(
            F.col("frag"),
            r"<pubDate>\s*(?:\w+,\s*)?([^<]*?)\s*</pubDate>", 1)),
        F.lit(_RFC822_TAIL)))
    atom_date = F.try_to_date(nn(F.substring(
        F.regexp_extract(F.col("frag"), r"<updated>([^<]*)</updated>", 1),
        1, 10)))
    title = F.regexp_extract(F.col("frag"),
                             r"<title>\s*([^<]*?)\s*</title>", 1)
    return (z.withColumn("url", url)
            .filter(F.length("url") > 0)
            .select("host", *carry, "pos", "url",
                    F.when(F.col("fmt") == "rss", rss_date)
                    .otherwise(atom_date).alias("published"),
                    nn(title).alias("title"), "fmt"))


def feed_seeds(docs: DataFrame) -> DataFrame:
    """Fixture + parse round-trip: the CORRECTNESS surface."""
    return parse_feeds(build_feeds(docs))
