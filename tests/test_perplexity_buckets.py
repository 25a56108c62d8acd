"""Unit tests for CCNet-style perplexity bucketing (operators/lm
.perplexity_buckets): distributed-rank correctness vs an exact window,
bucket balance, label semantics."""

from pyspark.sql import Window, functions as F

from supercrawler_spark.operators.lm import perplexity_buckets, unigram_logprob


def _docs(spark):
    rows = [(i, ("the quick fox " * (1 + i % 5)) + f"rare{i} " * (i % 3))
            for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_buckets_match_exact_window(spark):
    docs = _docs(spark)
    out, cache = perplexity_buckets(docs, n_buckets=3, vocab_size=10)
    got = {r["doc_id"]: (r["rank"], r["bucket"]) for r in out.collect()}
    cache.unpersist()
    exact = (unigram_logprob(docs, vocab_size=10)
             .withColumn("rank", F.row_number().over(
                 Window.orderBy("avg_nll", "doc_id")) - 1))
    n = exact.count()
    want = {r["doc_id"]: (r["rank"], r["rank"] * 3 // n)
            for r in exact.collect()}
    assert got == want


def test_buckets_balanced_and_labeled(spark):
    out, cache = perplexity_buckets(_docs(spark), n_buckets=3, vocab_size=10)
    rows = out.collect()
    cache.unpersist()
    sizes = {}
    for r in rows:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
        assert r["bucket_label"] == {0: "head", 1: "middle", 2: "tail"}[r["bucket"]]
    assert set(sizes) == {0, 1, 2}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # head holds the most fluent (lowest avg_nll) documents
    by_bucket = {b: [r["avg_nll"] for r in rows if r["bucket"] == b]
                 for b in (0, 2)}
    assert max(by_bucket[0]) <= min(by_bucket[2])


def test_no_single_partition_global_window(spark):
    out, cache = perplexity_buckets(_docs(spark), n_buckets=3, vocab_size=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    cache.unpersist()
    # the rank must come from the _pid-partitioned two-phase path, never a
    # global (single-task) row_number window. (Scalar one-row aggregates —
    # the LM total, the top-K vocab limit — legitimately use a
    # SinglePartition exchange; only the corpus-sized window matters.)
    import re
    windows = re.findall(r"row_number\(\) windowspecdefinition\(([^,]+),",
                         plan)
    assert windows, "expected a row_number window in the plan"
    assert all(w.startswith("_pid") for w in windows), windows
