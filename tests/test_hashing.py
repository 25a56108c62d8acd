"""Python-vs-JVM xxhash64 parity: the generator/oracle's pure-Python mirror
(functions/hashing.py) must agree with Spark's built-in ``F.xxhash64`` on the
exact string corpus shapes the engine buckets on — otherwise bucket pruning
would be silently disabled (Crawler.__init__ sample check) or, worse, the
synth corpus layout would disagree with the engine's JVM-side bucketing."""

from pyspark.sql import functions as F

from supercrawler_spark.functions.hashing import url_bucket, xxhash64_string

# length-boundary cases (0/7/8/31/32 bytes cross the xxhash64 stripe/lane
# boundaries), non-ASCII (UTF-8 multi-byte), and realistic URLs
CASES = [
    "",
    "a",
    "abcdefg",          # 7 bytes
    "abcdefgh",         # 8 bytes
    "a" * 31,
    "a" * 32,
    "a" * 33,
    "https://hot.example.com/p123",
    "https://alpha.example.com/docs/s3/p17?q=1",
    "über-straße/日本語/ページ",   # multi-byte UTF-8
    "naïve-café",
    "x" * 1000,
]


def test_python_xxhash64_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s STRING")
    got = {r["s"]: r["h"] for r in
           df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in CASES:
        assert xxhash64_string(s) == got[s], f"divergence on {s!r}"


def test_url_bucket_matches_spark_pmod(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s STRING")
    got = {r["s"]: r["b"] for r in
           df.select("s", F.pmod(F.xxhash64("s"), F.lit(32)).alias("b"))
           .collect()}
    for s in CASES:
        assert url_bucket(s, 32) == got[s], f"bucket divergence on {s!r}"
