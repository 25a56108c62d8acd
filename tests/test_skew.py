"""Unit tests for shuffle-key skew diagnostics (operators/skew)."""

from supercrawler_spark.operators.skew import key_skew_stats


def _stats(spark, keys, **kw):
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    return key_skew_stats(df, "k", **kw).collect()[0]


def test_uniform_keys(spark):
    r = _stats(spark, [f"k{i % 4}" for i in range(40)], target_rows=100)
    assert r["n_rows"] == 40 and r["n_keys"] == 4
    assert r["max_count"] == 10 and r["mean_count"] == 10.0
    assert r["skew_ratio"] == 1.0
    assert r["n_heavy"] == 0
    assert r["suggested_salt"] == 1


def test_hot_key_detected_and_salted(spark):
    keys = ["hot"] * 90 + [f"c{i}" for i in range(10)]
    r = _stats(spark, keys, target_rows=20, heavy_factor=5.0)
    assert r["max_count"] == 90
    assert r["n_keys"] == 11
    # mean = 100/11 ~ 9.09; hot (90) > 5*mean, singletons are not
    assert r["n_heavy"] == 1
    assert r["skew_ratio"] > 9.0
    assert r["suggested_salt"] == 5  # ceil(90/20)


def test_salt_floor_is_one(spark):
    r = _stats(spark, ["a", "b"], target_rows=1000)
    assert r["suggested_salt"] == 1
