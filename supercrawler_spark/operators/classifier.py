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
    (token count in bucket / doc token count) plus the 0/1 label.
    NULL labels (e.g. lang IS NULL) are 0, never NULL — a NULL y would
    silently drop the document from every gradient while still counting
    in the denominator (and diverge from the oracle's CASE ... ELSE 0)."""
    tok = (docs
           .filter(F.length(F.trim(F.col(text_col))) > 0)
           .select(F.col(id_col).alias("doc_id"),
                   F.when(label, 1).otherwise(0).cast("long").alias("y"),
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
    # ONE corpus pass builds the feature table; everything else reads the
    # cache (without this, each GD round re-tokenizes the corpus — ~2k+2
    # full scans instead of one at the 100 TB design point). Training is
    # driver-synchronous anyway (each round's argmax-free update still
    # materializes), so weights are collected per round (n_buckets rows)
    # and the cache is released before the lazily-scored result returns —
    # the final scoring recomputes the feature lineage exactly once.
    feats = feats.persist()
    try:
        n_docs = feats.select("doc_id").distinct().count()
        spark = docs.sparkSession
        weights = [(int(b), 0.0) for b in range(n_buckets)]  # from zero
        for _ in range(iters):
            w = spark.createDataFrame(weights, "b long, w double")
            z = (feats.join(F.broadcast(w), "b")
                 .groupBy("doc_id", "y")
                 .agg(F.sum(F.col("tf") * F.col("w")).alias("z")))
            resid = z.select("doc_id",
                             (F.col("y") - 1.0 / (1.0 + F.exp(-F.col("z"))))
                             .alias("r"))
            grad = (feats.join(resid, "doc_id")
                    .groupBy("b")
                    .agg((F.sum(F.col("tf") * F.col("r"))
                          / F.lit(float(n_docs))).alias("g")))
            # left join keeps zero-gradient buckets; the ROUND runs in
            # Spark (HALF_UP, matching DuckDB's away-from-zero) — Python's
            # banker's round would diverge at exact half-ulp boundaries.
            # Collecting n_buckets rows per round bounds the plan lineage.
            new_w = (w.join(grad, "b", "left")
                     .select("b", F.round(
                         F.col("w")
                         + F.lit(lr) * F.coalesce("g", F.lit(0.0)),
                         6).alias("w")))
            weights = sorted((int(r["b"]), float(r["w"]))
                             for r in new_w.collect())
    finally:
        feats.unpersist()
    w = spark.createDataFrame(weights, "b long, w double")
    scored = (feats.join(F.broadcast(w), "b")
              .groupBy("doc_id", "y")
              .agg(F.sum(F.col("tf") * F.col("w")).alias("z")))
    return scored.select(
        "doc_id", "y",
        F.round(1.0 / (1.0 + F.exp(-F.round("z", 9))), 6).alias("score"))


def score_calibration(scored: DataFrame, bins: int = 10) -> DataFrame:
    """(bin, n, n_pos, pos_rate): decile calibration of classifier scores
    against the training label — the acceptance check before a score
    threshold gates a corpus (a well-calibrated filter shows pos_rate
    rising with bin; a flat profile means the model learned nothing and
    thresholding it would just subsample). One tiny aggregation over the
    (doc_id, y, score) output; score==1.0 folds into the top bin."""
    b = F.least(F.floor(F.col("score") * bins).cast("long"),
                F.lit(bins - 1))
    return (scored.groupBy(b.alias("bin"))
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("y").cast("long").alias("n_pos"),
                 F.round(F.sum("y") / F.count("*"), 6).alias("pos_rate")))
