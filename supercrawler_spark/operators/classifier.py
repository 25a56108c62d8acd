"""Trained quality classifier: hashed-bag-of-words logistic regression.

The model-based document filter of modern pretraining pipelines (CCNet's
fastText language/quality gates, DCLM's fastText quality classifier): a
linear model over hashed token features, trained on an in-corpus label and
applied to every document. DSIR (operators/dsir.py) reweights toward a
target via count ratios; this LEARNS a discriminative boundary — they are
the two standard selection levers.

Spark-first training, batch gradient descent with the iteration count fixed
and small (like the engine's Lloyd's k-means and PageRank: iterative
algorithms unroll into k deterministic dataflow rounds):

- one pass builds per-document term-frequency features over ``n_buckets``
  md5-hashed buckets — (doc_id, bucket, tf) rows, the only corpus-sized
  table;
- each GD iteration is: broadcast-join the (tiny) weight table onto the
  feature rows, per-doc margin aggregation, sigmoid, then a per-bucket
  gradient aggregation — two map-side-combined shuffles of NARROW rows per
  iteration, never text;
- weights are ROUNDED to 6 decimals after every update: that pins the
  model bit-for-bit across engines (distributed double-sum reassociation
  drifts at ~1e-13; rounding resets it each round), so the DuckDB oracle —
  the same iterations unrolled as generated CTEs — reproduces scores
  exactly.

From-zero initialization makes iteration 1's sigmoid constant 0.5, so the
first update is the class-balance-corrected mean feature difference —
convenient for hand-checking in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from supercrawler_spark.operators.textquality import _tokens
from supercrawler_spark.operators.trainmix import md5long


def _features(docs: DataFrame, n_buckets: int, text_col: str,
              id_col: str, label: Column) -> DataFrame:
    """(doc_id, y, b, tf): per-document hashed-bucket term frequencies
    (token count in bucket / doc token count) plus the 0/1 label."""
    tok = (docs
           .filter(F.length(F.trim(F.col(text_col))) > 0)
           .select(F.col(id_col).alias("doc_id"),
                   label.cast("long").alias("y"),
                   F.explode(_tokens(text_col)).alias("token")))
    tok = tok.withColumn("b", F.pmod(md5long(F.col("token")),
                                     F.lit(n_buckets)))
    cnt = (tok.groupBy("doc_id", "y", "b")
           .agg(F.count("*").alias("c")))
    tot = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    return (cnt.join(tot, "doc_id")
            .select("doc_id", "y", "b",
                    (F.col("c") / F.col("n")).alias("tf")))


def hashed_logreg_scores(docs: DataFrame, target_lang: str = "en",
                         n_buckets: int = 64, iters: int = 2,
                         lr: float = 2.0, text_col: str = "text",
                         id_col: str = "doc_id",
                         lang_col: str = "lang") -> DataFrame:
    """(doc_id, y, score): train ``iters`` rounds of batch GD from zero
    weights on the ``lang_col == target_lang`` label, then score every
    document with the final model. ``score`` is the rounded sigmoid
    probability of the target class. Empty documents are dropped."""
    feats = _features(docs, n_buckets, text_col, id_col,
                      (F.col(lang_col) == target_lang))
    n_docs = feats.select("doc_id").distinct().count()
    # weights live as a tiny DataFrame (b, w); from-zero start
    spark = docs.sparkSession
    w = spark.range(n_buckets).select(F.col("id").cast("long").alias("b"),
                                      F.lit(0.0).alias("w"))
    for _ in range(iters):
        z = (feats.join(F.broadcast(w), "b")
             .groupBy("doc_id", "y")
             .agg(F.sum(F.col("tf") * F.col("w")).alias("z")))
        resid = z.select("doc_id",
                         (F.col("y") - 1.0 / (1.0 + F.exp(-F.col("z"))))
                         .alias("r"))
        grad = (feats.join(resid, "doc_id")
                .groupBy("b")
                .agg((F.sum(F.col("tf") * F.col("r")) / F.lit(float(n_docs)))
                     .alias("g")))
        # right outer keeps zero-gradient buckets; round pins the model
        # bit-for-bit across engines (module docstring)
        w = (w.join(grad, "b", "left")
             .select("b", F.round(F.col("w")
                                  + F.lit(lr) * F.coalesce("g", F.lit(0.0)),
                                  6).alias("w")))
    scored = (feats.join(F.broadcast(w), "b")
              .groupBy("doc_id", "y")
              .agg(F.sum(F.col("tf") * F.col("w")).alias("z")))
    return scored.select(
        "doc_id", "y",
        F.round(1.0 / (1.0 + F.exp(-F.round("z", 9))), 6).alias("score"))
