"""Frontier bootstrap: merge every seed source into one deduplicated,
provenance-tagged seed table.

A production crawl's round-0 frontier is the union of several discovery
channels — the operator explicitly requested seed list, sitemap
enumeration (operators/sitemaps), and feed polling (operators/feeds) —
and the same URL routinely arrives from several of them. The bootstrap
reduces that union to ONE row per URL carrying the highest-priority
provenance (explicit > sitemap > feed), which downstream scheduling uses:
explicit seeds are never throttled, sitemap seeds inherit lastmod hints,
feed seeds inherit freshness.

Scale shape: unions are free (no shuffle); the dedup is a single
groupBy(url) min-struct aggregation — map-side combined, the same shape
as every seen-set reduction in the engine. The reference takes seeds from
exactly one channel per endpoint (/root/reference/src/supercrawler.rs:1177,
src/main.rs:768); multi-source bootstrap is part of the production surface
layered on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PRIORITIES = (("explicit", 0), ("sitemap", 1), ("feed", 2))


def seed_bootstrap(explicit: DataFrame | None = None,
                   sitemap: DataFrame | None = None,
                   feed: DataFrame | None = None,
                   url_col: str = "url") -> DataFrame:
    """(url, src, priority): one row per distinct seed URL with its
    best-priority provenance. Each input needs only a ``url_col`` column;
    None sources are skipped. Ties cannot occur (one priority per source;
    within a source duplicates collapse to the same (src, priority))."""
    parts = []
    for df, (src, pri) in zip((explicit, sitemap, feed), PRIORITIES):
        if df is not None:
            parts.append(df.select(
                F.col(url_col).alias("url"),
                F.lit(src).alias("src"),
                F.lit(pri).cast("long").alias("priority")))
    if not parts:
        raise ValueError("seed_bootstrap needs at least one source")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    best = (u.groupBy("url")
            .agg(F.min(F.struct("priority", "src")).alias("_b")))
    return best.select("url", F.col("_b.src").alias("src"),
                       F.col("_b.priority").alias("priority"))
