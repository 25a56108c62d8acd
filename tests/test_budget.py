"""Unit tests for per-host fetch-budget allocation (operators/budget):
quota truncation, priority ordering, crawl-delay-derived quotas, and the
single-shuffle plan shape."""

from pyspark.sql import functions as F

from supercrawler_spark.operators.budget import host_budget


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, priority long")


def test_quota_truncates_hot_host(spark):
    rows = [(f"https://hot/p/{i}", "hot", i % 4) for i in range(12)]
    rows += [(f"https://cold/p/{i}", "cold", 0) for i in range(2)]
    out = host_budget(_frontier(spark, rows), quota=5).collect()
    hot = [r for r in out if r["host"] == "hot"]
    assert sum(r["kept"] for r in hot) == 5
    assert all(r["kept"] for r in out if r["host"] == "cold")
    # priority ordering: every kept hot row beats every dropped one
    kept_keys = sorted((r["priority"], r["url"]) for r in hot if r["kept"])
    drop_keys = sorted((r["priority"], r["url"]) for r in hot if not r["kept"])
    assert kept_keys[-1] < drop_keys[0]


def test_rank_is_dense_and_deterministic(spark):
    rows = [(f"https://h/p/{i}", "h", 7) for i in range(6)]
    out = host_budget(_frontier(spark, rows), quota=3).collect()
    ranks = sorted(r["host_rank"] for r in out)
    assert ranks == [1, 2, 3, 4, 5, 6]
    # ties on priority break by url asc
    by_rank = sorted(out, key=lambda r: r["host_rank"])
    assert [r["url"] for r in by_rank] == sorted(r["url"] for r in out)


def test_crawl_delay_quota(spark):
    rows = [(f"https://slow/p/{i}", "slow", 0) for i in range(10)]
    rows += [(f"https://fast/p/{i}", "fast", 0) for i in range(10)]
    delays = spark.createDataFrame(
        [("slow", 30.0), ("fast", 0.1)], "host string, crawl_delay double")
    out = host_budget(_frontier(spark, rows), quota=8, delays=delays,
                      round_seconds=60).collect()
    slow = [r for r in out if r["host"] == "slow"]
    fast = [r for r in out if r["host"] == "fast"]
    assert slow[0]["host_quota"] == 2  # floor(60/30)
    assert fast[0]["host_quota"] == 8  # 600 capped at quota
    assert sum(r["kept"] for r in slow) == 2
    assert sum(r["kept"] for r in fast) == 8


def test_unknown_host_gets_default_quota(spark):
    rows = [("https://x/p/1", "x", 0)]
    delays = spark.createDataFrame(
        [("y", 1.0)], "host string, crawl_delay double")
    out = host_budget(_frontier(spark, rows), quota=9, delays=delays)
    assert out.collect()[0]["host_quota"] == 9


def test_single_shuffle_plan(spark):
    rows = [(f"https://h{i % 3}/p/{i}", f"h{i % 3}", i) for i in range(30)]
    df = host_budget(_frontier(spark, rows), quota=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    # one hash exchange for the window; the delay join (absent here) would
    # be broadcast-only
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
