"""zorder_key: Morton interleave correctness and clustering property."""

from pyspark.sql import functions as F

from supercrawler_spark.operators.layout import zorder_key


def _morton(a, b, bits=16):
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_matches_reference_bits(spark):
    rows = [(a, b) for a in (0, 1, 2, 3, 255, 65535)
            for b in (0, 1, 7, 1024, 65535)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = {(r["a"], r["b"]): r["zkey"]
           for r in zorder_key(df, "a", "b").collect()}
    for (a, b), z in out.items():
        assert z == _morton(a % 65536, b % 65536)
    # interleave identities
    assert out[(1, 0)] == 2 and out[(0, 1)] == 1 and out[(1, 1)] == 3


def test_zorder_clusters_2d_neighbors(spark):
    # rows in the same 256x256 tile share the top interleaved bits, so the
    # zkey range inside a tile is tighter than the full-key span — the
    # min/max-stats pruning property a layout rewrite relies on
    df = spark.range(4096).select(
        (F.col("id") % 64 + 512).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"))
    out = zorder_key(df, "a", "b").agg(
        F.min("zkey").alias("lo"), F.max("zkey").alias("hi")).collect()[0]
    # 64x64 tile starting at (512, 0): keys stay inside one 4096-wide block
    assert out["hi"] - out["lo"] < 64 * 64 * 2
    assert out["lo"] >= _morton(512, 0)
