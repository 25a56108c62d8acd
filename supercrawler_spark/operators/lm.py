"""Corpus language-model scoring: unigram log-probability quality signal.

A cheap, trainable-in-one-pass stand-in for the perplexity filters used by
CCNet / Gopher / LLaMA data pipelines (a real KenLM is unavailable in this
sandbox, and at 100 TB the unigram model is the one you can fit as a
by-product of word count anyway): fit a unigram distribution on the corpus
itself, restricted to the top ``vocab_size`` tokens, and score every document
by its mean negative log2 token probability. Documents whose token mix is far
from the corpus distribution (gibberish, boilerplate symbol soup, wrong
language) score high; fluent prose scores low.

Scale design: the model fit is word count (explode -> groupBy(token) — the
canonical scale-out job, map-side partial aggregation); the top-K vocabulary
and the scalar token total are tiny and BROADCAST back over the corpus scan,
so scoring adds no corpus-sized shuffle beyond the per-doc aggregation of
(doc_id, logp) scalars. No Python UDFs; exact DuckDB-oracle twin in
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from supercrawler_spark.operators.textquality import _tokens


def unigram_logprob(docs: DataFrame, vocab_size: int = 1000,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, oov_tokens, avg_nll): mean negative log2 unigram
    probability per document under the corpus's own top-``vocab_size``
    unigram model. In-vocabulary tokens cost -log2(count/total); tokens
    outside the vocabulary cost the rare-word floor -log2(1/total). The
    vocabulary rank ties break on the token string, so the model — and the
    score — is fully deterministic. Empty documents are dropped."""
    tok = (docs
           .filter(F.length(F.trim(F.col(text_col))) > 0)
           .select(F.col(id_col).alias("doc_id"),
                   F.explode(_tokens(text_col)).alias("token")))
    counts = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))  # 1 row, broadcast
    # TakeOrderedAndProject: distributed partial top-K — never a global
    # single-partition rank window over the (vocabulary-sized) counts table
    vocab = (counts.orderBy(F.col("cnt").desc(), "token")
             .limit(vocab_size).select("token", "cnt"))
    scored = (tok
              .join(F.broadcast(vocab), "token", "left")
              .crossJoin(F.broadcast(total))
              .select("doc_id",
                      F.col("cnt").isNull().cast("long").alias("oov"),
                      (-F.log2(F.coalesce(F.col("cnt"), F.lit(1))
                               / F.col("total"))).alias("nll")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("oov").alias("oov_tokens"),
                 F.round(F.avg("nll"), 6).alias("avg_nll")))
