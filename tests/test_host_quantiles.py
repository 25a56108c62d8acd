"""host_quantiles: hand-checked interpolation + quantile monotonicity."""

from pyspark.sql import functions as F

from supercrawler_spark.operators import corpus


def test_quantiles_hand_checked(spark):
    # source a: lengths 1,2,3,4 chars → h=(n-1)p: p25→1.75, p50→2.5,
    # p75→3.25, p90→3.7
    docs = spark.createDataFrame(
        [(i, "a", "x" * n) for i, n in enumerate([1, 2, 3, 4])],
        "doc_id long, source string, text string")
    got = {r.q: r.chars_q for r in corpus.host_quantiles(docs).collect()}
    assert got == {"0.25": 1.75, "0.50": 2.5, "0.75": 3.25, "0.90": 3.7}


def test_quantiles_monotone_per_source(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
        F.repeat(F.lit("y"), ((F.col("id") * 37) % 91 + 1).cast("int"))
        .alias("text"))
    rows = corpus.host_quantiles(docs).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, {})[r.q] = r.chars_q
    assert len(by_src) == 3
    for qs in by_src.values():
        assert qs["0.25"] <= qs["0.50"] <= qs["0.75"] <= qs["0.90"]
