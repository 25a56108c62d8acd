"""Recrawl scheduling: latest-snapshot staleness + per-host capped ranking."""

import datetime

import pytest
from pyspark.sql import functions as F

from supercrawler_spark.operators import recrawl

NOW = "2026-01-01 00:00:00"


def ts(days_old: int) -> datetime.datetime:
    return (datetime.datetime(2026, 1, 1)
            - datetime.timedelta(days=days_old))


@pytest.fixture(scope="module")
def pages(spark):
    rows = []
    # host a: 5 urls, ages 10,70,80,90,100 — each with an older extra snapshot
    for i, age in enumerate([10, 70, 80, 90, 100]):
        rows.append((f"https://a.com/{i}", "a.com", ts(age)))
        rows.append((f"https://a.com/{i}", "a.com", ts(age + 500)))
    # host b: 3 urls all stale at the same age (tie → url asc)
    for i in range(3):
        rows.append((f"https://b.com/{i}", "b.com", ts(61)))
    return spark.createDataFrame(
        rows, "url STRING, host STRING, warc_ts TIMESTAMP")


def test_latest_snapshot_wins_and_staleness_filter(pages):
    out = recrawl.recrawl_schedule(pages, NOW, min_age_days=60,
                                   per_host_cap=100).collect()
    ages = {r["url"]: r["age_days"] for r in out}
    # url 0 on host a is fresh (10 d) despite its 510-day-old extra snapshot
    assert "https://a.com/0" not in ages
    assert ages["https://a.com/4"] == 100 and ages["https://b.com/2"] == 61


def test_per_host_cap_and_priority_order(pages):
    out = recrawl.recrawl_schedule(pages, NOW, min_age_days=60,
                                   per_host_cap=2).collect()
    got = sorted((r["host"], r["rk"], r["url"], r["age_days"]) for r in out)
    assert got == [
        ("a.com", 1, "https://a.com/4", 100),   # oldest first
        ("a.com", 2, "https://a.com/3", 90),
        ("b.com", 1, "https://b.com/0", 61),    # age tie → url asc
        ("b.com", 2, "https://b.com/1", 61),
    ]


def test_rank_filter_uses_window_group_limit(pages):
    plan = recrawl.recrawl_schedule(
        pages, NOW, per_host_cap=2)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_deterministic_under_repartition(pages):
    a = sorted(map(tuple, recrawl.recrawl_schedule(
        pages, NOW, per_host_cap=2).collect()))
    b = sorted(map(tuple, recrawl.recrawl_schedule(
        pages.repartition(7), NOW, per_host_cap=2).collect()))
    assert a == b

def test_snapshot_diff_statuses_and_narrow_join(spark):
    from supercrawler_spark.operators.recrawl import snapshot_diff
    old = spark.createDataFrame(
        [("u1", b"same"), ("u2", b"old body"), ("u3", b"gone")],
        "url string, html binary")
    new = spark.createDataFrame(
        [("u1", b"same"), ("u2", b"new body"), ("u4", b"fresh")],
        "url string, html binary")
    got = {r["url"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {"u2": "changed", "u3": "removed", "u4": "added"}
    full = {r["url"]: r["status"]
            for r in snapshot_diff(old, new, include_unchanged=True).collect()}
    assert full["u1"] == "unchanged" and len(full) == 4
    # scale shape: page bodies never shuffle — the join exchanges carry only
    # (url, md5) columns
    plan = snapshot_diff(old, new)._jdf.queryExecution() \
        .executedPlan().toString()
    import re
    exch = re.findall(r"Exchange hashpartitioning[^\n]*", plan)
    assert exch and not any("html" in l for l in exch), exch

def test_snapshot_diff_null_content_and_multicapture(spark):
    from supercrawler_spark.operators.recrawl import snapshot_diff
    # multi-capture old side: u1 latest capture (ts 2) matches new -> the
    # stale ts-1 body must NOT produce a phantom 'changed' or duplicate row
    old = spark.createDataFrame(
        [("u1", b"A", 1), ("u1", b"B", 2),
         ("u2", None, 1),            # failed capture: NULL body, url EXISTS
         ("u3", b"C", 1)],
        "url string, html binary, warc_ts long")
    new = spark.createDataFrame(
        [("u1", b"B", 3),
         ("u2", b"real body now", 3),
         ("u4", None, 3)],           # new url whose fetch failed
        "url string, html binary, warc_ts long")
    rows = snapshot_diff(old, new, include_unchanged=True).collect()
    got = {r["url"]: r["status"] for r in rows}
    assert len(rows) == len(got), "duplicate rows per url"
    assert got == {"u1": "unchanged",   # latest captures match
                   "u2": "changed",    # NULL -> content is a change
                   "u3": "removed",
                   "u4": "added"}      # present only in new, despite NULL


def test_snapshot_diff_without_ts_column(spark):
    from supercrawler_spark.operators.recrawl import snapshot_diff
    old = spark.createDataFrame([("u1", b"x")], "url string, html binary")
    new = spark.createDataFrame([("u1", b"y"), ("u2", b"z")],
                                "url string, html binary")
    got = {r["url"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {"u1": "changed", "u2": "added"}


def test_sitemap_refresh_reasons(spark):
    from supercrawler_spark.operators import recrawl

    entries = spark.createDataFrame(
        [("h", "u/new", "2026-01-05", "daily"),
         ("h", "u/stale", "2026-01-05", "daily"),
         ("h", "u/fresh", "2026-01-01", "daily"),
         ("h", "u/nohint", None, "daily"),
         ("h", "u/nohint-new", None, "daily")],
        "host string, loc string, lastmod string, changefreq string")
    pages = spark.createDataFrame(
        [("u/stale", "2026-01-02 00:00:00"),
         ("u/stale", "2026-01-01 00:00:00"),   # older capture: latest wins
         ("u/fresh", "2026-01-03 00:00:00"),
         ("u/nohint", "2025-12-01 00:00:00")],
        "url string, warc_ts string").selectExpr(
        "url", "cast(warc_ts as timestamp) warc_ts")
    got = {(r.url, r.reason) for r in
           recrawl.sitemap_refresh(entries, pages).collect()}
    # u/fresh: lastmod <= latest capture date → dropped
    # u/nohint: stored, no hint → left to the age-based scheduler
    assert got == {("u/new", "new"), ("u/stale", "stale"),
                   ("u/nohint-new", "new")}


def test_sitemap_refresh_narrow_join(spark):
    from pyspark.sql import functions as F
    from supercrawler_spark.operators import recrawl

    entries = spark.createDataFrame(
        [("h", "u1", "2026-01-05", "daily")],
        "host string, loc string, lastmod string, changefreq string")
    pages = spark.createDataFrame(
        [("u1", "2026-01-01 00:00:00", "BODYBYTES" * 100)],
        "url string, warc_ts string, html string").selectExpr(
        "url", "cast(warc_ts as timestamp) warc_ts", "html")
    opt = recrawl.sitemap_refresh(entries, pages) \
        ._jdf.queryExecution().optimizedPlan().toString()
    # page bodies must be pruned before the join: html may appear only in
    # the source relation's own schema line, never in any Project/Aggregate
    # above it
    above_scan = [ln for ln in opt.splitlines() if "LogicalRDD" not in ln]
    assert all("html" not in ln for ln in above_scan), opt


def test_content_drift_semantics(spark):
    """Unchanged urls: changed=false, drift 0. Appended-text urls:
    changed=true with drift below 1 (most shingles survive). Fully
    rewritten urls: drift 1.0. Sub-resolution edits keep changed=true."""
    from pyspark.sql import functions as F

    from supercrawler_spark.operators.recrawl import content_drift
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [("u0", base), ("u1", base), ("u2", base), ("u3", "a b")]
    old = spark.createDataFrame(rows, "url string, text string")
    new = spark.createDataFrame(
        [("u0", base),                                   # unchanged
         ("u1", base + " freshly appended tail tokens"), # drifted a bit
         ("u2", "totally different words in every single position now "
                "nothing shared with the original text at all here"),
         ("u3", "a b"),                                  # too short: no sig
         ("u9", base)],                                  # new url: no match
        "url string, text string")
    out = {r["url"]: r for r in content_drift(old, new).collect()}
    assert set(out) == {"u0", "u1", "u2"}  # u3 unshingleable, u9 unmatched
    assert out["u0"]["changed"] is False and out["u0"]["drift_est"] == 0.0
    assert out["u1"]["changed"] is True
    assert 0.0 <= out["u1"]["drift_est"] < 1.0
    assert out["u2"]["changed"] is True and out["u2"]["drift_est"] == 1.0


def test_adaptive_intervals_aimd(spark):
    from supercrawler_spark.operators.recrawl import adaptive_intervals
    drift = spark.createDataFrame(
        [("hot", True, 2, 0.75), ("mid", True, 6, 0.25),
         ("calm", False, 8, 0.0), ("edge-hi", True, 4, 0.5),
         ("edge-lo", True, 7, 0.125)],
        "url string, changed boolean, n_agree long, drift_est double")
    prev = spark.createDataFrame(
        [("hot", 10), ("mid", 40), ("calm", 200), ("edge-hi", 7),
         ("edge-lo", 364)],
        "url string, interval_days long")
    out = {r["url"]: r["interval_days"]
           for r in adaptive_intervals(drift, prev).collect()}
    assert out["hot"] == 7          # floor(10/2)=5 -> clamped to min 7
    assert out["mid"] == 40         # mid drift: unchanged
    assert out["calm"] == 365       # 200*2 -> clamped to max
    assert out["edge-hi"] == 7      # >= high halves; floor(7/2)=3 -> min 7
    assert out["edge-lo"] == 365    # <= low doubles; 728 -> max 365
    # no history -> base_days path
    out2 = {r["url"]: r["interval_days"]
            for r in adaptive_intervals(drift).collect()}
    assert out2["hot"] == 15 and out2["calm"] == 60 and out2["mid"] == 30


def test_content_drift_multi_capture_latest_wins(spark):
    """Snapshots with several captures per url reduce to the latest
    warc_ts before signatures — no phantom merged documents, one output
    row per url."""
    import datetime

    from supercrawler_spark.operators.recrawl import content_drift
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon")
    t1 = datetime.datetime(2026, 1, 1)
    t2 = datetime.datetime(2026, 2, 1)
    old = spark.createDataFrame(
        [("u", "totally different stale early capture words here now ok",
          t1), ("u", base, t2)],
        "url string, text string, warc_ts timestamp")
    new = spark.createDataFrame(
        [("u", base, t1)], "url string, text string, warc_ts timestamp")
    out = content_drift(old, new).collect()
    assert len(out) == 1
    # latest old capture == new text -> unchanged, drift 0
    assert out[0]["changed"] is False and out[0]["drift_est"] == 0.0
