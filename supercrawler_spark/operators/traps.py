"""Crawl-trap detection: per-host URL-shape signals that flag spider traps.

Calendar pages, session-id query strings, and cyclic path segments generate
unbounded URL spaces under a single host; a BFS crawler that doesn't watch
for them spends its fetch budget on one host's infinite corner. The standard
defence is cheap URL-shape statistics per host — no fetching, no content:

- ``query_ratio``: fraction of URLs carrying a query string (session ids,
  calendar offsets, faceted-search permutations);
- ``repeat_ratio``: fraction of URLs whose path repeats a segment
  (``/a/b/a/b/…`` cycles from relative-link resolution bugs);
- ``avg_depth`` / ``max_depth``: path-segment depth (trap URLs grow).

A host is a trap suspect when it has at least ``min_urls`` URLs and any
signal exceeds its threshold; feed the suspects into ``host_priority`` (or a
scope filter) to throttle them. Everything is one projection over the URL
scan plus one map-side-combinable groupBy(host) — at 10^10 frontier URLs the
shuffle carries only per-host partial sums, never URLs.

The reference crawls a fixed seed scope and has no trap logic; this is a
SURVEY.md §2 crawl-frontier extension. Input URLs are assumed unique (the
frontier/seen tables guarantee it). No Python UDFs; exact DuckDB-oracle twin
in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"


def _url_parts(url_col: str):
    """(base, host, path) columns — the ONE parsing discipline both
    operators in this module share: fragment stripped before query
    detection, case-insensitive scheme, lowercased host; callers drop
    host == '' strays."""
    base = F.substring_index(F.col(url_col), "#", 1)
    host = F.lower(F.regexp_extract(base, _HOST_RE, 1))
    path = F.regexp_extract(base, _PATH_RE, 1)
    return base, host, path


def trap_signals(urls: DataFrame, url_col: str = "url", min_urls: int = 10,
                 max_query_ratio: float = 0.3, max_repeat_ratio: float = 0.2,
                 max_avg_depth: float = 4.0) -> DataFrame:
    """(host, n_urls, query_ratio, repeat_ratio, avg_depth, max_depth,
    suspect): per-host trap signals over a URL table; ``suspect`` = 1 when
    the host clears ``min_urls`` and any ratio/depth threshold trips.

    The fragment is stripped before query detection (a '?' inside '#…' is
    not a query string), the scheme match is case-insensitive, hosts are
    lowercased, and URLs with no parseable scheme://host (relative or
    scheme-relative strays) are EXCLUDED rather than pooled into a phantom
    host '' that could mask or fake a suspect."""
    base, host, path = _url_parts(url_col)
    segs = F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    per_url = urls.select(
        host.alias("host"),
        (F.instr(base, "?") > 0).cast("long").alias("has_query"),
        (F.size(segs) > F.size(F.array_distinct(segs))).cast("long")
        .alias("has_repeat"),
        F.size(segs).cast("long").alias("depth"))
    agg = (per_url.filter(F.col("host") != "").groupBy("host")
           .agg(F.count("*").alias("n_urls"),
                F.round(F.avg("has_query"), 6).alias("query_ratio"),
                F.round(F.avg("has_repeat"), 6).alias("repeat_ratio"),
                F.round(F.avg("depth"), 6).alias("avg_depth"),
                F.max("depth").alias("max_depth")))
    suspect = ((F.col("n_urls") >= min_urls)
               & ((F.col("query_ratio") > max_query_ratio)
                  | (F.col("repeat_ratio") > max_repeat_ratio)
                  | (F.col("avg_depth") > max_avg_depth)))
    return agg.withColumn("suspect", suspect.cast("long"))


def url_templates(urls: DataFrame, url_col: str = "url", k: int = 5,
                  min_urls: int = 2) -> DataFrame:
    """(host, template, n_urls, rank): each host's ``k`` most common URL
    path templates, with digit runs folded to ``{n}`` and long hex runs to
    ``{hex}``, and ``?{q}`` marking a query string — the structure-mining
    pass that tells a crawler which URL families dominate a site (pagination,
    calendars, session mirrors) and feeds scope rules or `host_priority`.

    Same parsing discipline as :func:`trap_signals` (fragment stripped,
    case-insensitive scheme, lowercased host, unparseable strays excluded).
    Scale shape: one projection + groupBy(host, template) with map-side
    partial aggregation (template cardinality per host is tiny by
    construction — that is the point of templating), then a per-host rank
    window whose ``rank <= k`` filter Spark 4 pushes into WindowGroupLimit.
    """
    base, host, path = _url_parts(url_col)
    # case-insensitive hex fold — uppercase UUID/hash segments must
    # template-collapse too, or a host's dominant family shatters into
    # per-URL singletons and the map-side-combine cardinality claim dies
    template = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-fA-F]{8,}", "{hex}"),
        r"[0-9]+", "{n}")
    template = F.concat(template,
                        F.when(F.instr(base, "?") > 0, F.lit("?{q}"))
                        .otherwise(F.lit("")))
    counts = (urls
              .select(host.alias("host"), template.alias("template"))
              .filter(F.col("host") != "")
              .groupBy("host", "template")
              .agg(F.count("*").alias("n_urls"))
              .filter(F.col("n_urls") >= min_urls))
    w = Window.partitionBy("host").orderBy(F.desc("n_urls"),
                                           F.asc("template"))
    return (counts.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))
