"""Per-host fetch-budget allocation for a crawl round.

The politeness scheduler (operators/robots + crawler salted crawl-delay
windows) bounds how FAST a host may be fetched; this operator bounds how
MUCH of a round's frontier a host may occupy — the standard frontier-
fairness stage between dequeue and fetch: rank each host's candidate URLs
by (priority, url) and keep the top ``quota`` per host, where the quota is
either uniform or derived from the host's crawl-delay (a host that allows
one request per 10 s gets round_seconds/10 slots). Without this stage a
mega-host (the 10^7-URL forum) starves every small host in the round even
though politeness would have throttled its actual fetches.

Physical shape: ONE hash shuffle on host + an in-partition sort
(row_number window). The per-host partition holds only that host's
*frontier candidates for this round* — already bounded upstream by the
depth gate and seen anti-join — and the hosts that make the window large
are exactly the ones the quota then truncates, so the sort output is
consumed locally by the rank filter (no second shuffle). Crawl-delay
quotas arrive via broadcast join (the delay table is per-host metadata,
kilobytes at web scale).

Reference anchor: the reference caps global in-flight work (semaphore,
/root/reference/src/main.rs:1014) but has no per-host fairness; this is
the distributed upgrade the north-star architecture calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def host_budget(frontier: DataFrame, quota: int = 100,
                delays: DataFrame | None = None,
                round_seconds: int = 60,
                url_col: str = "url", host_col: str = "host",
                priority_col: str = "priority") -> DataFrame:
    """(url, host, priority, host_rank, host_quota, kept): deterministic
    per-host top-``quota`` selection ordered by (priority asc, url asc).

    When ``delays`` (host, crawl_delay seconds) is given, a host's quota is
    ``max(1, floor(round_seconds / crawl_delay))`` capped at ``quota``;
    hosts absent from ``delays`` use ``quota`` unchanged. ``kept`` marks
    the selected rows; callers filter on it (the full ranking is returned
    so deferred rows can re-queue with their rank as aging evidence).
    """
    w = (Window.partitionBy(host_col)
         .orderBy(F.col(priority_col).asc(), F.col(url_col).asc()))
    out = frontier.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        F.col(priority_col).alias("priority"))
    if delays is not None:
        d = delays.select(
            F.col("host"),
            F.least(
                F.lit(quota).cast("long"),
                F.greatest(F.lit(1).cast("long"),
                           F.floor(F.lit(round_seconds)
                                   / F.col("crawl_delay")).cast("long")))
            .alias("host_quota"))
        out = (out.join(F.broadcast(d), "host", "left")
               .withColumn("host_quota",
                           F.coalesce(F.col("host_quota"),
                                      F.lit(quota).cast("long"))))
    else:
        out = out.withColumn("host_quota", F.lit(quota).cast("long"))
    out = out.withColumn("host_rank",
                         F.row_number().over(w).cast("long"))
    return (out.withColumn("kept",
                           F.col("host_rank") <= F.col("host_quota"))
            .select("url", "host", "priority", "host_rank",
                    "host_quota", "kept"))


def fetch_waves(frontier: DataFrame, slots_per_host: int = 4,
                delays: DataFrame | None = None,
                default_delay_ms: int = 1000,
                url_col: str = "url", host_col: str = "host",
                priority_col: str = "priority") -> DataFrame:
    """(url, host, priority, host_rank, wave, slot, eta_ms): politeness
    DISPATCH schedule for a round's (already quota-capped) fetch batch.

    :func:`host_budget` decides WHICH urls a host gets this round; this
    decides WHEN each one may launch: a host runs ``slots_per_host``
    concurrent connections, so its urls are dispatched in waves of that
    size ordered by (priority asc, url asc) — ``wave = (rank-1) div
    slots``, ``slot = (rank-1) mod slots`` — and wave w may not start
    before ``eta_ms = w * crawl_delay_ms`` into the round (hosts absent
    from ``delays`` use ``default_delay_ms``). The executor fetching a
    partition replays this schedule locally with no coordination: ETAs
    are a pure function of the row, so the per-host pacing the reference
    enforces with a process-global semaphore (src/main.rs:1014) falls out
    of the plan itself on 1000 executors.

    Scale shape: ONE hash shuffle on host + in-partition rank (same
    window family as host_budget — per-host rows are the post-quota
    batch, bounded); the delay table is broadcast host metadata.
    """
    w = (Window.partitionBy(host_col)
         .orderBy(F.col(priority_col).asc(), F.col(url_col).asc()))
    out = frontier.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        F.col(priority_col).alias("priority"))
    if delays is not None:
        d = delays.select(
            "host",
            (F.col("crawl_delay") * 1000).cast("long").alias("_delay_ms"))
        out = (out.join(F.broadcast(d), "host", "left")
               .withColumn("_delay_ms",
                           F.coalesce(F.col("_delay_ms"),
                                      F.lit(default_delay_ms).cast("long"))))
    else:
        out = out.withColumn("_delay_ms",
                             F.lit(default_delay_ms).cast("long"))
    out = out.withColumn("host_rank", F.row_number().over(w).cast("long"))
    return (out
            .withColumn("wave",
                        F.expr(f"(host_rank - 1) div {slots_per_host}")
                        .cast("long"))
            .withColumn("slot",
                        ((F.col("host_rank") - 1) % slots_per_host)
                        .cast("long"))
            .withColumn("eta_ms", (F.col("wave") * F.col("_delay_ms"))
                        .cast("long"))
            .select("url", "host", "priority", "host_rank",
                    "wave", "slot", "eta_ms"))
