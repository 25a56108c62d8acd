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
                  ts_col: str = "warc_ts",
                  include_unchanged: bool = False) -> DataFrame:
    """Incremental-crawl delta between two pages snapshots: one row per url
    with status 'added' (new only), 'removed' (old only), 'changed' (both,
    content differs) — and 'unchanged' when ``include_unchanged`` (off by
    default; at web scale unchanged is the overwhelming majority and is
    usually only counted, not materialized).

    Multi-capture tables (repeated (url, warc_ts) rows — the engine's own
    pages model) are reduced to the LATEST capture per url per side when
    ``ts_col`` is present; without it, ties resolve deterministically by
    max hash. NULL content is tracked by an explicit presence marker, so a
    url with a failed/empty capture on one side is still 'changed' /
    matched correctly rather than misread as a join miss.

    Scale shape: content is hashed MAP-SIDE on each scan (the codebase's
    8-byte portable content hash), so the per-side reduction and the
    full-outer join move only (url, 8-byte hash) rows — page bodies never
    shuffle. One url-keyed shuffle per side feeding the join, status is a
    projection."""
    from supercrawler_spark.operators.dedup import _md5_long

    def side(df: DataFrame, h: str, p: str) -> DataFrame:
        has_ts = ts_col in df.columns
        hashed = df.select(
            F.col(url_col).alias("url"),
            _md5_long(F.col(content_col)).alias(h),
            *([F.col(ts_col).alias("_ts")] if has_ts else []))
        if has_ts:
            red = hashed.groupBy("url").agg(
                F.max_by(F.col(h), F.col("_ts")).alias(h))
        else:
            red = hashed.groupBy("url").agg(F.max(F.col(h)).alias(h))
        return red.withColumn(p, F.lit(True))

    a = side(old_pages, "_old_h", "_old_p")
    b = side(new_pages, "_new_h", "_new_p")
    out = (a.join(b, "url", "full_outer")
           .withColumn("status",
                       F.when(F.col("_old_p").isNull(), F.lit("added"))
                       .when(F.col("_new_p").isNull(), F.lit("removed"))
                       .when(~F.col("_old_h").eqNullSafe(F.col("_new_h")),
                             F.lit("changed"))
                       .otherwise(F.lit("unchanged")))
           .select("url", "status"))
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def sitemap_refresh(entries: DataFrame, pages: DataFrame,
                    loc_col: str = "loc", lastmod_col: str = "lastmod",
                    host_col: str = "host",
                    url_col: str = "url", ts_col: str = "warc_ts"
                    ) -> DataFrame:
    """Sitemap-hinted refresh selection → (host, url, reason, lastmod).

    ``recrawl_schedule`` refreshes blind on age; sitemap ``<lastmod>`` hints
    let the crawler refetch only what the host *says* changed (and fetch
    what it never stored at all):

    - ``reason = 'new'``   — the sitemap advertises a URL with no stored
      capture (a frontier gap sitemap discovery closes);
    - ``reason = 'stale'`` — the advertised lastmod is strictly newer than
      the latest stored capture's date.

    URLs with no lastmod hint are left to the age-based scheduler
    (conservative: an absent hint is not a change signal), and up-to-date
    URLs are dropped — at web scale unchanged is the overwhelming majority.

    Scale shape: latest-capture reduction is a map-side-combinable max per
    url, then one url-keyed equi-join of two narrow projections (url + one
    date each — page bodies never shuffle). Both sides are frontier-sized,
    so this is the standard sort-merge shape; no window, no skew key (urls
    are unique on both sides).
    """
    latest = (pages.groupBy(F.col(url_col).alias("url"))
              .agg(F.max(ts_col).alias("latest_ts")))
    e = entries.select(F.col(host_col).alias("host"),
                       F.col(loc_col).alias("url"),
                       F.col(lastmod_col).alias("lastmod"),
                       F.to_date(lastmod_col).alias("lastmod_d"))
    j = e.join(latest, "url", "left")
    reason = (F.when(F.col("latest_ts").isNull(), F.lit("new"))
              .when(F.col("lastmod_d") > F.to_date("latest_ts"),
                    F.lit("stale")))
    return (j.withColumn("reason", reason)
            .filter(F.col("reason").isNotNull())
            .select("host", "url", "reason", "lastmod"))


def content_drift(old_pages: DataFrame, new_pages: DataFrame,
                  num_hashes: int = 8, url_col: str = "url",
                  text_col: str = "text",
                  ts_col: str = "warc_ts") -> DataFrame:
    """(url, changed, n_agree, drift_est): per-URL content drift between two
    crawl snapshots, estimated as 1 - minhash-Jaccard of the 3-token
    shingle sets. snapshot_diff (above) answers WHICH urls changed;
    this answers HOW MUCH — the signal an adaptive recrawl scheduler feeds
    back into per-URL refresh intervals (big drift -> crawl more often,
    cosmetic drift -> back off), and the reason a scheduler doesn't
    re-extract near-identical refetches.

    Scale shape: one minhash signature pass per snapshot (the same
    word-count-shaped shingle aggregation as dedup), then a url+hash_id
    equi-join of the two narrow signature tables — text bytes never join.
    URLs missing from either snapshot, or too short to shingle (<3
    tokens), drop out of the inner join; `changed` is the exact text
    inequality, so a drift_est of 0.0 with changed=true flags edits below
    minhash resolution.

    Each snapshot is first reduced to ONE text per url: latest ``ts_col``
    wins when the column exists (multi-capture Common-Crawl snapshots),
    ties and ts-less inputs break on max(text). Without this, same-url
    captures would merge their shingle sets into one phantom signature
    and the text join would fan out conflicting `changed` rows."""
    from supercrawler_spark.operators.dedup import minhash_sig_array

    def one_per_url(df):
        if ts_col in df.columns:
            best = F.max(F.struct(F.col(ts_col).alias("_ts"),
                                  F.col(text_col).alias("_t")))
        else:
            best = F.max(F.struct(F.col(text_col).alias("_t")))
        return (df.groupBy(F.col(url_col))
                .agg(best.alias("_b"))
                .select(url_col, F.col("_b._t").alias(text_col)))

    old_pages = one_per_url(old_pages)
    new_pages = one_per_url(new_pages)
    sig = lambda df: (minhash_sig_array(
        df.select(F.col(url_col).alias("doc_id"), text_col),
        num_hashes=num_hashes)
        .select(F.col("doc_id").alias(url_col), "sig"))
    so = sig(old_pages).withColumnRenamed("sig", "sig_old")
    sn = sig(new_pages).withColumnRenamed("sig", "sig_new")
    texts = (old_pages.select(url_col, F.col(text_col).alias("_t_old"))
             .join(new_pages.select(url_col,
                                    F.col(text_col).alias("_t_new")),
                   url_col))
    agree = F.aggregate(
        F.zip_with("sig_old", "sig_new",
                   lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0), lambda acc, v: acc + v).cast("long")
    return (so.join(sn, url_col).join(texts, url_col)
            .select(F.col(url_col).alias("url"),
                    (F.col("_t_old") != F.col("_t_new")).alias("changed"),
                    agree.alias("n_agree"),
                    F.round(1 - agree / F.lit(float(num_hashes)), 6)
                    .alias("drift_est")))


def adaptive_intervals(drift: DataFrame, prev: DataFrame | None = None,
                       base_days: int = 30, min_days: int = 7,
                       max_days: int = 365, low: float = 0.125,
                       high: float = 0.5) -> DataFrame:
    """(url, interval_days): the drift-feedback loop that closes adaptive
    recrawl — AIMD-style per-URL refresh intervals. High drift (>= high)
    halves the interval (crawl more often, floor min_days); negligible
    drift (<= low — including exactly-unchanged refetches) doubles it
    (back off, cap max_days); mid drift keeps it. ``prev`` is the previous
    (url, interval_days) table; URLs without history start at base_days.

    Pure integer column arithmetic over the content_drift output joined to
    a narrow interval table — one url-keyed left join, exact in both
    engines. recrawl_schedule then consumes these intervals in place of
    its fixed min_age_days."""
    d = drift.select("url", "drift_est")
    if prev is not None:
        d = d.join(prev.select("url", F.col("interval_days").alias("_pi")),
                   "url", "left")
    else:
        d = d.withColumn("_pi", F.lit(None).cast("long"))
    pi = F.coalesce(F.col("_pi"), F.lit(base_days)).cast("long")
    new = (F.when(F.col("drift_est") >= high,
                  F.greatest(F.lit(min_days).cast("long"),
                             F.floor(pi / 2)))
           .when(F.col("drift_est") <= low,
                 F.least(F.lit(max_days).cast("long"), pi * 2))
           .otherwise(pi))
    return d.select("url", new.cast("long").alias("interval_days"))
