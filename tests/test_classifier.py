"""Hashed-logreg quality classifier semantics (oracle parity runs in
tests/test_oracle_parity.py as `quality_classifier`)."""

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from supercrawler_spark.operators.classifier import hashed_logreg_scores

SF_DIR = "/root/testdata/sf0.001"


def test_separates_disjoint_vocab(spark):
    rows = [(i, "aaa bbb ccc ddd eee", "en") for i in range(6)] \
        + [(10 + i, "xxx yyy zzz www vvv", "zz") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = hashed_logreg_scores(docs, n_buckets=32, iters=2, lr=2.0)
    s = {r["doc_id"]: r for r in out.collect()}
    assert all(s[i]["y"] == 1 for i in range(6))
    assert all(s[10 + i]["y"] == 0 for i in range(6))
    pos = [s[i]["score"] for i in range(6)]
    neg = [s[10 + i]["score"] for i in range(6)]
    assert min(pos) > max(neg)
    assert all(p > 0.5 for p in pos) and all(n < 0.5 for n in neg)


def test_training_improves_over_zero_model(spark):
    """With zero iterations every score is sigmoid(0)=0.5; training must
    move the classes apart on the real corpus."""
    docs = entry_mod._docs(spark, SF_DIR)
    base = hashed_logreg_scores(docs, iters=0)
    assert {r["score"] for r in base.select("score").distinct().collect()} \
        == {0.5}
    trained = hashed_logreg_scores(docs, iters=2)
    m = {r["y"]: r["m"] for r in trained.groupBy("y")
         .agg(F.avg("score").alias("m")).collect()}
    # the synthetic corpus shares nearly all vocabulary across languages
    # (the hand-built disjoint-vocab test above shows real separation), so
    # only the ORDER is asserted here
    assert m[1] > m[0]


def test_empty_docs_dropped_and_deterministic(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta", "en"), (1, "   ", "en"), (2, "gamma", "fr")],
        "doc_id long, text string, lang string")
    a = sorted(map(tuple, hashed_logreg_scores(docs, n_buckets=16).collect()))
    b = sorted(map(tuple, hashed_logreg_scores(docs, n_buckets=16).collect()))
    assert a == b
    assert [r[0] for r in a] == [0, 2]


def test_null_lang_counts_as_negative(spark):
    docs = spark.createDataFrame(
        [(0, "aaa bbb", "en"), (1, "aaa bbb", None), (2, "ccc ddd", None)],
        "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in
           hashed_logreg_scores(docs, n_buckets=16, iters=1).collect()}
    assert out[1]["y"] == 0 and out[2]["y"] == 0
    assert out[0]["y"] == 1
    assert all(r["score"] is not None for r in out.values())


def test_score_calibration_bins_and_rates(spark):
    from supercrawler_spark.operators.classifier import score_calibration
    scored = spark.createDataFrame(
        [(0, 1, 0.95), (1, 1, 0.91), (2, 0, 0.95),   # bin 9
         (3, 0, 0.05), (4, 0, 0.02),                 # bin 0
         (5, 1, 1.0)],                               # 1.0 folds into bin 9
        "doc_id long, y long, score double")
    out = {r["bin"]: r for r in score_calibration(scored, bins=10).collect()}
    assert set(out) == {0, 9}
    assert out[9]["n"] == 4 and out[9]["n_pos"] == 3
    assert abs(out[9]["pos_rate"] - 0.75) < 1e-9
    assert out[0]["n"] == 2 and out[0]["n_pos"] == 0
