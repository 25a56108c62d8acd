"""hreflang alternates: site-DECLARED language-variant clusters.

Multilingual sites declare their language variants with
``<link rel="alternate" hreflang="fr" href="..."/>`` head tags; search
engines and crawl dedup both trust this declaration over URL heuristics.
This is the declared counterpart to ``operators/bitext`` (which INFERS
pairs from URL shape): bitext finds candidates on sites that don't
declare, hreflang is ground truth where they do — a pipeline runs both
and lets declarations win.

Spark shape: same no-DOM pattern as the template fingerprints — one
``regexp_extract_all`` pulls the ``<link ...>`` tags, a higher-order
``transform``/``filter`` keeps rel=alternate tags with both attributes,
and ``explode`` yields the edge list. Cluster ids come from each page's
own declared set (hreflang blocks list every variant including self), so
``cluster_id = min(alt_url)`` needs only a per-page aggregation — no
iterative connected components, because the declaration IS the clique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_LINK_TAG = "<link\\s[^>]*>"


def _attr(t, name: str):
    """Attribute value of ``name`` in tag text ``t``, accepting double-
    quoted, single-quoted, and unquoted syntax — real-web HTML uses all
    three, and a double-quote-only regex silently drops declared
    alternates on the other two (shrinking clusters). Quoted forms win
    over the unquoted fallback; missing attribute yields ''."""
    dq = F.regexp_extract(t, f'{name}\\s*=\\s*"([^"]*)"', 1)
    sq = F.regexp_extract(t, f"{name}\\s*=\\s*'([^']*)'", 1)
    uq = F.regexp_extract(t, f"""{name}\\s*=\\s*([^"'\\s>]+)""", 1)
    return (F.when(dq != "", dq)
            .otherwise(F.when(sq != "", sq).otherwise(uq)))


_REL_ALTERNATE = """rel\\s*=\\s*("alternate"|'alternate'|alternate(?=[\\s/>]))"""


def hreflang_edges(pages: DataFrame, html_col: str = "html",
                   url_col: str = "url") -> DataFrame:
    """(url, hreflang, alt_url): one row per declared alternate. Tags
    missing either attribute are dropped; html may be string or UTF-8
    binary; attributes may be double-quoted, single-quoted, or unquoted."""
    html = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(html, F.lit(_LINK_TAG), 0)
    alts = F.filter(tags, lambda t: t.rlike(_REL_ALTERNATE))
    pairs = F.transform(alts, lambda t: F.struct(
        _attr(t, "hreflang").alias("hreflang"),
        _attr(t, "href").alias("alt_url")))
    return (pages.select(F.col(url_col).alias("url"),
                         F.explode(pairs).alias("p"))
            .select("url", F.col("p.hreflang").alias("hreflang"),
                    F.col("p.alt_url").alias("alt_url"))
            .filter((F.col("hreflang") != "") & (F.col("alt_url") != "")))


def hreflang_clusters(edges: DataFrame) -> DataFrame:
    """(url, cluster_id, n_alternates): cluster id = lexicographic min of
    the page's declared alternates (hreflang blocks are self-inclusive
    cliques, so the min is consistent across every member — no iteration
    needed)."""
    return (edges.groupBy("url")
            .agg(F.min("alt_url").alias("cluster_id"),
                 F.count("*").cast("long").alias("n_alternates")))
