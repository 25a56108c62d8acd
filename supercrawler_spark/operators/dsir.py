"""DSIR-style data selection: hashed n-gram importance log-weights.

Data Selection via Importance Resampling (Xie et al., 2023) scores every
raw-corpus document by how much more likely its token mix is under a
*target* distribution (curated/high-quality text) than under the raw-corpus
distribution, using bag-of-hashed-ngram unigram models; documents are then
sampled proportionally to the importance weight. This is the standard
pretraining-mix lever between "keep everything" and a trained quality
classifier, and it is embarrassingly Spark-shaped:

1. one pass fits BOTH models: explode tokens, hash each into one of
   ``n_buckets`` feature buckets (md5-based so the DuckDB oracle matches),
   count per bucket for the raw corpus and for the target slice — a single
   ``groupBy(bucket)`` with map-side partial aggregation; the result is a
   ``n_buckets``-row table, trivially broadcastable no matter the corpus
   size;
2. a second pass scores: re-explode, broadcast-join token buckets to their
   add-0.5-smoothed log-likelihood ratio, and average per document.

Two corpus scans total, no corpus-sized shuffle beyond the per-doc scalar
aggregation, no Python UDFs. At 100 TB the bucket table (default 256 rows)
is the only state; both passes are scan+combine jobs.

The reference engine has no selection stage at all — every crawled page is
kept (/root/reference/src/supercrawler.rs:1317-1332); this operator is part
of the training-data surface layered on top of the crawl store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from supercrawler_spark.operators.textquality import _tokens
from supercrawler_spark.operators.trainmix import md5long


def dsir_logweights(docs: DataFrame, target_lang: str = "en",
                    n_buckets: int = 256, text_col: str = "text",
                    id_col: str = "doc_id",
                    lang_col: str = "lang") -> DataFrame:
    """(doc_id, n_tokens, dsir_logweight): mean per-token natural-log
    likelihood ratio ln(p_target(bucket) / p_raw(bucket)) under hashed
    unigram models with add-0.5 smoothing. The target model is fit on the
    ``lang_col == target_lang`` slice; the raw model on the whole corpus.
    Positive weight => the document looks more target-like than the corpus
    average. Empty documents are dropped (no tokens to score)."""
    tok = (docs
           .filter(F.length(F.trim(F.col(text_col))) > 0)
           .select(F.col(id_col).alias("doc_id"),
                   F.col(lang_col).alias("lang"),
                   F.explode(_tokens(text_col)).alias("token")))
    tok = tok.withColumn("b", F.pmod(md5long(F.col("token")), F.lit(n_buckets)))
    # one grouped pass fits both models: raw count + target count per bucket
    buckets = (tok.groupBy("b")
               .agg(F.count("*").alias("cr"),
                    F.sum((F.col("lang") == target_lang).cast("long"))
                    .alias("ct")))
    totals = buckets.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    llr = (buckets.crossJoin(F.broadcast(totals))
           .select("b",
                   (F.log((F.col("ct") + 0.5)
                          / (F.col("nt") + 0.5 * n_buckets))
                    - F.log((F.col("cr") + 0.5)
                            / (F.col("nr") + 0.5 * n_buckets))).alias("llr")))
    return (tok.join(F.broadcast(llr), "b")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.avg("llr"), 6).alias("dsir_logweight")))
