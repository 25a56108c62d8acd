"""Recrawl scheduling: age-prioritized refresh selection with per-host caps.

A continuous crawler does not only discover new URLs — it re-fetches known
ones as they go stale. This operator turns the pages snapshot history into a
bounded per-round refresh list: latest snapshot per URL, staleness filter,
oldest-first priority, and a per-host cap so one giant stale host cannot
monopolize the politeness budget (the reference's single-node semaphore has
no analog — scheduling there is implicit in the task queue,
src/supercrawler.rs:640-666).

Scale shape: one shuffle keyed on url for the latest-snapshot aggregate
(map-side-combinable max), one shuffle keyed on host for the cap window.
The ``row_number() <= cap`` filter is recognized by Catalyst's
WindowGroupLimit rule, so each partition keeps only ``cap`` rows per host
*before* the shuffle-side sort — the cap is a push-down limit, not a full
per-host sort. Host skew: hot hosts are bounded by the cap itself; the
group-limit prunes their rows map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def recrawl_schedule(pages: DataFrame, now_ts, min_age_days: int = 60,
                     per_host_cap: int = 100,
                     url_col: str = "url", host_col: str = "host",
                     ts_col: str = "warc_ts") -> DataFrame:
    """(url, host, age_days, rk): URLs whose latest snapshot is at least
    ``min_age_days`` old, ranked oldest-first within each host, at most
    ``per_host_cap`` per host. ``now_ts`` is an explicit timestamp column or
    literal — never wall-clock — so schedules are reproducible."""
    latest = (pages
              .groupBy(F.col(url_col).alias("url"),
                       F.col(host_col).alias("host"))
              .agg(F.max(ts_col).alias("latest_ts")))
    aged = latest.withColumn(
        "age_days", F.datediff(F.lit(now_ts).cast("timestamp"), "latest_ts")
        .cast("long"))
    w = Window.partitionBy("host").orderBy(F.desc("age_days"), F.asc("url"))
    return (aged
            .filter(F.col("age_days") >= min_age_days)
            .withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= per_host_cap)
            .select("url", "host", "age_days", "rk"))

def snapshot_diff(old_pages: DataFrame, new_pages: DataFrame,
                  url_col: str = "url", content_col: str = "html",
                  include_unchanged: bool = False) -> DataFrame:
    """Incremental-crawl delta between two pages snapshots: one row per url
    with status 'added' (new only), 'removed' (old only), 'changed' (both,
    content differs) — and 'unchanged' when ``include_unchanged`` (off by
    default; at web scale unchanged is the overwhelming majority and is
    usually only counted, not materialized).

    Scale shape: content is hashed MAP-SIDE on each scan (md5 of the bytes),
    so the full-outer join moves only (url, 16-byte hash) rows — page bodies
    never shuffle. One url-keyed join, status is a projection."""
    def side(df, alias):
        return df.select(
            F.col(url_col).alias("url"),
            F.md5(F.col(content_col).cast("binary")).alias(alias))
    a = side(old_pages, "_old_h")
    b = side(new_pages, "_new_h")
    out = (a.join(b, "url", "full_outer")
           .withColumn("status",
                       F.when(F.col("_old_h").isNull(), F.lit("added"))
                       .when(F.col("_new_h").isNull(), F.lit("removed"))
                       .when(F.col("_old_h") != F.col("_new_h"),
                             F.lit("changed"))
                       .otherwise(F.lit("unchanged")))
           .select("url", "status"))
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
