"""Page-template fingerprints: cluster pages by HTML STRUCTURE, not text.

Boilerplate detection's structural half: pages generated from one CMS
template share their tag sequence even when every text node differs, so a
fingerprint of the tag stream groups a host's pages into its templates.
Uses: boilerplate-aware extraction (learn the template once, subtract it),
trap triage (one template with unbounded URL variants = generated pages),
and coverage accounting (how much of a host is article template vs index
template). ``traps.url_templates`` mines the same idea from URL shapes;
this operator reads the page itself.

Spark shape: ``regexp_extract_all`` pulls the opening-tag stream in one
codegen pass over the html column (no DOM parse — structure fingerprints
don't need one), the fingerprint is the md5 of the joined stream, and the
per-host stats are one groupBy. Nothing here shuffles page bytes: the
fingerprint projection reduces each page to (url, host, tpl_hash, n_tags)
before any exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from supercrawler_spark.operators.trainmix import md5long

_TAG_RE = "<([a-zA-Z][a-zA-Z0-9]*)"


def page_templates(pages: DataFrame, html_col: str = "html",
                   url_col: str = "url",
                   host_col: str = "host") -> DataFrame:
    """(url, host, tpl_hash, n_tags): structural fingerprint per page —
    md5 (60-bit) of the '>'-joined opening-tag sequence. html may be a
    string or UTF-8 binary column."""
    html = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(html, F.lit(_TAG_RE), 1)
    return pages.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        md5long(F.array_join(tags, ">")).alias("tpl_hash"),
        F.size(tags).cast("long").alias("n_tags"))


def template_stats(fps: DataFrame, min_pages: int = 2) -> DataFrame:
    """(host, n_templates, n_pages, dominant_share): per-host template
    census — how many distinct structures the host serves and what
    fraction of its pages the most common one covers (a host where one
    template dominates thousands of pages is machine-generated; a
    long-tail host is hand-authored). Hosts under ``min_pages`` are
    dropped (share of 1 page is vacuous)."""
    per_tpl = (fps.groupBy("host", "tpl_hash")
               .agg(F.count("*").alias("c")))
    return (per_tpl.groupBy("host")
            .agg(F.count("*").cast("long").alias("n_templates"),
                 F.sum("c").cast("long").alias("n_pages"),
                 F.round(F.max("c") / F.sum("c"), 6)
                 .alias("dominant_share"))
            .filter(F.col("n_pages") >= min_pages))
