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


def bigram_logprob(docs: DataFrame, lam: float = 0.7,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, avg_nll2): mean negative log2 probability of
    each document's adjacent-token bigrams under a Jelinek-Mercer
    interpolated model fit on the corpus itself:
    ``p(y|x) = lam * n_xy/n_x + (1-lam) * n_y/N``. The bigram term captures
    local fluency that the unigram score cannot (scrambled-word documents
    share the unigram distribution but crater here); interpolation keeps
    unseen-context mass from zeroing the product, CCNet-style.

    Scale shape: bigram and unigram count fits are the two canonical
    word-count jobs (explode -> groupBy, map-side combined). Scoring never
    joins the per-POSITION stream: the per-pair cost is computed once on
    the distinct-bigram table (three equi-joins over vocabulary-sized
    rows), then each document joins its distinct (doc, x, y, c) triples to
    that pair-cost table in ONE join and averages weighted by c — for web
    text the distinct-triple stream is a small fraction of the raw
    position stream (Zipf), and the join count drops from three
    corpus-sized joins to one. Per-pair cost is rounded to 9 decimals
    before the weighted average so the regrouped sum is bit-stable across
    engines. Documents with fewer than 2 tokens have no bigrams and are
    dropped."""
    toks = _tokens(text_col)
    n = F.size(toks)
    grams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(F.element_at(toks, i).alias("x"),
                           F.element_at(toks, i + 1).alias("y")))) \
        .otherwise(F.array().cast("array<struct<x:string,y:string>>"))
    trip = (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(grams).alias("g"))
            .groupBy("doc_id", F.col("g.x").alias("x"),
                     F.col("g.y").alias("y"))
            .agg(F.count("*").cast("long").alias("c")))
    bi = trip.groupBy("x", "y").agg(F.sum("c").cast("long").alias("n_xy"))
    uni = (docs.select(F.explode(toks).alias("t"))
           .groupBy("t").agg(F.count("*").cast("long").alias("n_t")))
    total = uni.agg(F.sum("n_t").cast("double").alias("n1"))
    ux = uni.select(F.col("t").alias("x"), F.col("n_t").alias("n_x"))
    uy = uni.select(F.col("t").alias("y"), F.col("n_t").alias("n_y"))
    pair_cost = (bi.join(ux, "x").join(uy, "y")
                 .crossJoin(F.broadcast(total))
                 .select("x", "y", F.round(
                     -F.log2(F.lit(lam) * F.col("n_xy") / F.col("n_x")
                             + F.lit(1.0 - lam) * F.col("n_y")
                             / F.col("n1")), 9).alias("nll2")))
    return (trip.join(pair_cost, ["x", "y"])
            .groupBy("doc_id")
            .agg(F.sum("c").alias("n_bigrams"),
                 F.round(F.sum(F.col("c") * F.col("nll2")) / F.sum("c"), 6)
                 .alias("avg_nll2")))


def perplexity_buckets(docs: DataFrame, n_buckets: int = 3,
                       vocab_size: int = 1000, text_col: str = "text",
                       id_col: str = "doc_id"):
    """CCNet-style perplexity bucketing: rank every document by its
    corpus-self-fit LM score (``unigram_logprob.avg_nll``, fluent = low)
    and split the corpus into ``n_buckets`` equal rank slices —
    (doc_id, avg_nll, rank, bucket, bucket_label) with 'head' (most
    fluent), 'middle', 'tail' labels. CCNet keeps head+middle for
    pretraining and routes tail to re-cleaning.

    The global rank is the distributed two-phase dense rank
    (``crawler.attach_dense_seq``: range repartition -> per-partition
    row_number -> broadcast offsets) — never a single-task global window —
    ordered by the unique (avg_nll, doc_id) key so ties are deterministic.
    ``bucket = floor(rank * n_buckets / total)`` gives equal-size slices
    (±1). Returns ``(df, cache)``; the caller must ``cache.unpersist()``
    after materializing (attach_dense_seq contract)."""
    from supercrawler_spark.crawler import attach_dense_seq
    scored = unigram_logprob(docs, vocab_size=vocab_size,
                             text_col=text_col, id_col=id_col) \
        .select("doc_id", "avg_nll")
    seqd, total, cache = attach_dense_seq(
        scored, ["avg_nll", "doc_id"], out_col="rank")
    bucket = F.floor(F.col("rank") * n_buckets / F.lit(total)).cast("long")
    label = (F.when(bucket == 0, F.lit("head"))
             .when(bucket == n_buckets - 1, F.lit("tail"))
             .otherwise(F.lit("middle")))
    out = seqd.select("doc_id", "avg_nll", F.col("rank").cast("long").alias("rank"),
                      bucket.alias("bucket"), label.alias("bucket_label"))
    return out, cache
