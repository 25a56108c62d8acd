"""Sitemap ingestion: parse sitemap.xml documents into frontier seed rows.

Real crawls bootstrap their frontier from ``/sitemap.xml`` (the reference
follows only in-page links — ``/root/reference/src/supercrawler.rs:596-610``;
sitemaps are the missing seed source a production crawl needs). A sitemap is
an XML ``<urlset>`` of ``<url>`` entries carrying ``<loc>`` (required) and
optional ``<lastmod>`` / ``<changefreq>`` hints that feed recrawl
scheduling.

Spark-first design: parsing runs entirely JVM-side as whole-stage-codegen
string expressions (split on element boundaries + per-fragment regexp — no
Python in the row path, no Hive xpath UDF re-parse per entry). Each sitemap
row parses independently, so the operator is embarrassingly parallel: at 10^8 hosts the input is just a string column,
the output explodes to one row per ``<url>`` entry, and the only shuffle is
whatever the caller does next (typically the seen-set anti-join). Per the
sitemaps.org protocol a single file carries at most 50k entries (~10 MB),
bounding per-row memory.

Parsing contract (mirrors the protocol's laxness):
- entries = every ``/urlset/url`` element, document order preserved via
  ``posexplode`` (position feeds deterministic tie-breaks downstream);
- missing ``<lastmod>`` / ``<changefreq>`` yield NULL, not a dropped row
  (xpath returns '' for absent children of a present entry — normalized to
  NULL here);
- surrounding whitespace in ``<loc>`` is trimmed (the protocol requires
  clients to trim).

The CORRECTNESS fixture builds one sitemap per host from ``documents``
(every doc contributes a <url>; docs with doc_id % 11 == 0 omit lastmod,
changefreq cycles daily/weekly/monthly by doc_id % 3), then parses it back;
the DuckDB oracle declares the expected rows directly from ``documents`` —
round-trip equality proves the parser, not the builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_CHANGEFREQ = ("daily", "weekly", "monthly")


def _entry_rows(docs: DataFrame) -> DataFrame:
    """Per-doc (doc_id, host, entry-xml) building block for the fixtures."""
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("loc"),
        F.when(F.col("doc_id") % 11 == 0, F.lit(None)).otherwise(
            F.date_format(
                F.date_sub(F.lit("2026-01-01").cast("date"),
                           (F.col("doc_id") % 365).cast("int")),
                "yyyy-MM-dd")).alias("lastmod"),
        F.element_at(F.array(*[F.lit(c) for c in _CHANGEFREQ]),
                     (F.col("doc_id") % 3 + 1).cast("int"))
        .alias("changefreq"))
    entry = F.concat(
        F.lit("<url><loc> "), F.col("loc"), F.lit(" </loc>"),
        F.when(F.col("lastmod").isNotNull(),
               F.concat(F.lit("<lastmod>"), F.col("lastmod"),
                        F.lit("</lastmod>"))).otherwise(F.lit("")),
        F.lit("<changefreq>"), F.col("changefreq"),
        F.lit("</changefreq></url>"))
    return d.withColumn("entry", entry).select("doc_id", "host", "entry")


def _urlset(grouped) -> DataFrame:
    """Aggregate (doc_id, entry) groups into one <urlset> xml, doc_id
    order."""
    return grouped.agg(F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?><urlset>'),
        F.concat_ws("", F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
            lambda s: s["entry"])),
        F.lit("</urlset>")).alias("xml"))


def build_sitemaps(docs: DataFrame) -> DataFrame:
    """Deterministic per-host sitemap.xml fixture derived from documents:
    (host, xml). Entries are ordered by doc_id within each host."""
    return _urlset(_entry_rows(docs).groupBy("host"))


def build_sharded_sitemaps(docs: DataFrame, shards: int = 3):
    """Two-level fixture: per host a <sitemapindex> listing ``shards`` child
    sitemaps (shard = doc_id % shards), plus the child sitemap bodies
    themselves as (url, xml) — the shape large hosts actually publish.
    Returns (index_df(host, xml), bodies_df(url, xml))."""
    e = _entry_rows(docs).withColumn(
        "child_url",
        F.concat(F.lit("https://"), F.col("host"), F.lit("/sitemap-"),
                 (F.col("doc_id") % shards).cast("string"), F.lit(".xml")))
    bodies = _urlset(e.groupBy("host", "child_url")) \
        .select(F.col("child_url").alias("url"), "xml")
    index = (e.select("host", "child_url").distinct()
             .groupBy("host")
             .agg(F.concat(
                 F.lit('<?xml version="1.0"?><sitemapindex>'),
                 F.concat_ws("", F.transform(
                     F.array_sort(F.collect_list("child_url")),
                     lambda u: F.concat(F.lit("<sitemap><loc>"), u,
                                        F.lit("</loc></sitemap>")))),
                 F.lit("</sitemapindex>")).alias("xml")))
    return index, bodies


def parse_sitemaps(sitemaps: DataFrame, xml_col: str = "xml",
                   host_col: str = "host",
                   carry: tuple[str, ...] = ()) -> DataFrame:
    """(host, [carry...,] pos, loc, lastmod, changefreq) — one row per
    <url> entry; ``carry`` names input columns to ride through (lineage).

    Single linear pass per sitemap, all whole-stage-codegen JVM expressions:
    split on the ``<url>`` element boundary, posexplode the fragments, then
    regexp-extract each entry's tags from its own small fragment. (The
    per-entry ``xpath_string(xml, '/urlset/url[i]/…')`` alternative re-parses
    the WHOLE document per entry — O(entries²) per sitemap, hostile at the
    protocol's 50k-entry cap — and one-shot ``xpath`` arrays can't represent
    absent optional tags without losing positional alignment.) Absent
    optional tags surface as NULL; ``<loc>`` is trimmed per the protocol.
    Entries lacking a ``<loc>`` are protocol-invalid and dropped.
    """
    frags = F.split(F.col(xml_col), F.lit("<url>"))
    z = sitemaps.select(
        F.col(host_col).alias("host"), *[F.col(c) for c in carry],
        F.posexplode(frags).alias("rawpos", "frag"))
    # fragment 0 is the preamble before the first <url>; real entries carry
    # a </loc>
    z = (z.filter((F.col("rawpos") > 0) & F.col("frag").contains("</loc>"))
         .withColumn("pos", (F.col("rawpos") - 1).cast("long")))
    tag = lambda t: F.regexp_extract(
        F.col("frag"), f"<{t}>([^<]*)</{t}>", 1)
    nn = lambda c: F.when(F.length(c) > 0, c)
    # \s-trim inside the regex: SQL trim() strips only spaces, the protocol
    # says trim all whitespace
    loc = F.regexp_extract(F.col("frag"), r"<loc>\s*([^<]*?)\s*</loc>", 1)
    return z.select(
        "host", *carry, "pos",
        loc.alias("loc"),
        nn(tag("lastmod")).alias("lastmod"),
        nn(tag("changefreq")).alias("changefreq"))


def sitemap_seeds(docs: DataFrame) -> DataFrame:
    """Fixture + parse round-trip: the CORRECTNESS surface."""
    return parse_sitemaps(build_sitemaps(docs))


def parse_sitemap_index(indexes: DataFrame, xml_col: str = "xml",
                        host_col: str = "host") -> DataFrame:
    """Parse ``<sitemapindex>`` documents (sitemaps-of-sitemaps, the form
    large hosts shard their URL inventory into) → (host, pos, sitemap_url,
    lastmod). Same single-pass split+regexp strategy as ``parse_sitemaps``,
    on the ``<sitemap>`` element boundary; entries without ``<loc>`` are
    protocol-invalid and dropped."""
    frags = F.split(F.col(xml_col), F.lit("<sitemap>"))
    z = indexes.select(F.col(host_col).alias("host"),
                       F.posexplode(frags).alias("rawpos", "frag"))
    z = (z.filter((F.col("rawpos") > 0) & F.col("frag").contains("</loc>"))
         .withColumn("pos", (F.col("rawpos") - 1).cast("long")))
    loc = F.regexp_extract(F.col("frag"), r"<loc>\s*([^<]*?)\s*</loc>", 1)
    lastmod = F.regexp_extract(F.col("frag"), "<lastmod>([^<]*)</lastmod>", 1)
    return z.select(
        "host", "pos", loc.alias("sitemap_url"),
        F.when(F.length(lastmod) > 0, lastmod).alias("lastmod"))


def expand_sitemap_index(indexes: DataFrame, sitemap_bodies: DataFrame,
                         index_xml_col: str = "xml",
                         body_url_col: str = "url",
                         body_xml_col: str = "xml") -> DataFrame:
    """Two-level expansion: parse the index, fetch each child sitemap's body
    from ``sitemap_bodies`` (url → xml; at crawl scale this is the pages
    store, so the join is the standard frontier-fetch shape — small
    index-derived side broadcast against the big bucketed store), parse the
    children. Child entry rows carry the child sitemap's url for lineage."""
    idx = parse_sitemap_index(indexes, xml_col=index_xml_col)
    bodies = sitemap_bodies.select(
        F.col(body_url_col).alias("sitemap_url"),
        F.col(body_xml_col).alias("child_xml"))
    fetched = idx.join(bodies, "sitemap_url")
    return parse_sitemaps(
        fetched.select("host", F.col("sitemap_url").alias("from_sitemap"),
                       F.col("child_xml").alias("xml")),
        xml_col="xml", host_col="host", carry=("from_sitemap",))


def sitemap_index_seeds(docs: DataFrame, shards: int = 3) -> DataFrame:
    """Two-level fixture + expansion round-trip: the CORRECTNESS surface for
    the sitemapindex path."""
    index, bodies = build_sharded_sitemaps(docs, shards)
    return expand_sitemap_index(index, bodies)


def sitemap_directives(robots: DataFrame, body_col: str = "body",
                       host_col: str = "host") -> DataFrame:
    """Extract ``Sitemap:`` directives from robots.txt bodies →
    (host, line_no, sitemap_url).

    RFC 9309 §2.3 / sitemaps.org: Sitemap lines are *group-independent*
    (they apply regardless of any User-agent section), so — unlike the
    Allow/Disallow grouping state machine in ``robots.parse_robots_txt``
    (a pandas UDF by necessity) — this is a stateless per-line scan and
    stays pure JVM: split body on line breaks, posexplode, one
    case-insensitive regexp per line, comments (#…) honored. One Generate
    per robots row, no Python, no shuffle."""
    lines = F.split(F.col(body_col), "\r\n|\r|\n")
    z = robots.select(F.col(host_col).alias("host"),
                      F.posexplode(lines).alias("line_no", "line"))
    url = F.regexp_extract(
        F.regexp_replace(F.col("line"), "#.*$", ""),
        r"(?i)^\s*sitemap\s*:\s*(\S+)\s*$", 1)
    return (z.withColumn("sitemap_url", url)
            .filter(F.length("sitemap_url") > 0)
            .select("host", F.col("line_no").cast("long").alias("line_no"),
                    "sitemap_url"))


def build_robots_fixture(docs: DataFrame) -> DataFrame:
    """Deterministic per-host robots.txt fixture: every host advertises its
    primary sitemap (mixed-case directive for hosts with even doc-count to
    exercise case-insensitivity, plus a commented-out decoy and a news
    sitemap for hosts with >= 100 docs)."""
    h = (docs.groupBy(
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"))
        .agg(F.count("*").alias("n_docs")))
    directive = F.when(
        F.col("n_docs") % 2 == 0,
        F.concat(F.lit("sitemap: https://"), F.col("host"),
                 F.lit("/sitemap.xml"))).otherwise(
        F.concat(F.lit("Sitemap: https://"), F.col("host"),
                 F.lit("/sitemap.xml")))
    news = F.when(
        F.col("n_docs") >= 100,
        F.concat(F.lit("\nSitemap: https://"), F.col("host"),
                 F.lit("/sitemap-news.xml"))).otherwise(F.lit(""))
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /private\n"
              "# Sitemap: https://decoy.invalid/sitemap.xml\n"),
        directive, news, F.lit("\n"))
    return h.select("host", body.alias("body"))
