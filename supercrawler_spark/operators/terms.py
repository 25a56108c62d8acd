"""Term-statistics operators: per-document TF-IDF keyterms and corpus-wide
bigram collocations (PMI) — the keyword-extraction and phrase-mining passes
a training-data pipeline runs for topic accounting, dedup keys, and
boilerplate discovery.

The reference (duggal1/supercrawler) collects documents but has no term
statistics; these extend its pipeline the same way ``corpus.top_tokens``
does (SURVEY.md §2 "training-data operators").

Scale shape: everything partial-aggregates map-side before its single
shuffle; the vocabulary-sized count tables join back on the token key
(sort-merge — the vocabulary of a 100 TB web corpus is far beyond any
broadcast threshold); per-document top-k runs as a rank window whose
``rank <= k`` filter Spark 4 pushes into a WindowGroupLimit (per-partition
heaps, no full per-doc sort materialization). Corpus totals are one-row
aggregates broadcast back with a cross join — never a driver collect in the
plan. No Python UDFs; exact DuckDB-oracle twins in
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from supercrawler_spark.operators.textquality import _tokens


def tfidf_topterms(docs: DataFrame, n_docs: int, k: int = 5,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, token, tf, tfidf, rank): each document's ``k`` highest
    TF-IDF terms, smooth-idf variant ``tf * (ln((N+1)/(df+1)) + 1)`` with
    ``N = n_docs`` (pass the corpus size in, like ``graph.url_edges`` —
    keeping it a parameter avoids a second scan just to count).

    Ties break on ``token`` ascending so the output is deterministic; equal
    (tf, df) produce bit-identical tfidf in both engines, so tie-breaks are
    portable. ``tfidf`` is rounded to 6 decimals in the OUTPUT only — the
    rank is computed on the unrounded value.
    """
    pairs = (docs.select(F.col(id_col).alias("doc_id"),
                         F.explode(_tokens(text_col)).alias("token"))
             .groupBy("doc_id", "token")
             .agg(F.count("*").cast("long").alias("tf")))
    dfreq = pairs.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    idf = F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df") + F.lit(1.0))) + 1.0
    scored = (pairs.join(dfreq, "token")
              .withColumn("_tfidf", F.col("tf") * idf))
    w = Window.partitionBy("doc_id").orderBy(F.desc("_tfidf"), F.asc("token"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("doc_id", "token", "tf",
                    F.round("_tfidf", 6).alias("tfidf"), "rank"))


def bigram_pmi(docs: DataFrame, min_count: int = 5, k: int = 50,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(x, y, n_xy, pmi, rank): the ``k`` adjacent-token bigrams with the
    highest pointwise mutual information ``ln(p(x,y) / (p(x) p(y)))``, with
    ``p`` estimated from corpus bigram/unigram occurrence counts and a
    ``min_count`` floor keeping one-off rare pairs out (the standard PMI
    degenerate case).

    Adjacent bigrams only — a within-document all-pairs co-occurrence is
    quadratic in document vocabulary and dies on long web pages; adjacency
    is linear in corpus tokens and is what collocation mining wants.
    The PMI ratio is assembled with one fixed association
    ``(n_xy * N1 * N1) / (N2 * n_x * n_y)`` mirrored verbatim in the oracle
    so both engines round the same double. Top-k is TakeOrderedAndProject
    ordered by (pmi desc, x, y); the rank window runs after the limit over
    k rows.
    """
    toks = _tokens(text_col)
    n = F.size(toks)
    grams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(F.element_at(toks, i).alias("x"),
                           F.element_at(toks, i + 1).alias("y")))) \
        .otherwise(F.array().cast("array<struct<x:string,y:string>>"))
    bi = (docs.select(F.explode(grams).alias("g"))
          .select(F.col("g.x").alias("x"), F.col("g.y").alias("y"))
          .groupBy("x", "y").agg(F.count("*").cast("long").alias("n_xy")))
    uni = (docs.select(F.explode(toks).alias("token"))
           .groupBy("token").agg(F.count("*").cast("long").alias("n_t")))
    tot_uni = uni.agg(F.sum("n_t").cast("double").alias("_n1"))
    tot_bi = bi.agg(F.sum("n_xy").cast("double").alias("_n2"))
    ux = uni.select(F.col("token").alias("x"), F.col("n_t").alias("n_x"))
    uy = uni.select(F.col("token").alias("y"), F.col("n_t").alias("n_y"))
    scored = (bi.filter(F.col("n_xy") >= min_count)
              .join(ux, "x").join(uy, "y")
              .crossJoin(F.broadcast(tot_uni))
              .crossJoin(F.broadcast(tot_bi))
              .withColumn("_pmi", F.log(
                  (F.col("n_xy") * F.col("_n1") * F.col("_n1"))
                  / (F.col("_n2") * F.col("n_x") * F.col("n_y")))))
    top = scored.orderBy(F.desc("_pmi"), F.asc("x"), F.asc("y")).limit(k)
    w = Window.orderBy(F.desc("_pmi"), F.asc("x"), F.asc("y"))
    return (top.withColumn("rank", F.row_number().over(w).cast("long"))
            .select("x", "y", "n_xy", F.round("_pmi", 6).alias("pmi"),
                    "rank"))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, score, n_terms, rank): BM25 top-k retrieval — the ranking
    function behind the inverted index, used in pipeline curation to pull
    topic-targeted subsets out of a web corpus (retrieval-based data
    selection). Lucene-style idf ``ln((N - df + 0.5)/(df + 0.5) + 1)``
    (always positive), term saturation ``tf*(k1+1)/(tf + k1*(1-b+b*dl/
    avgdl))``, score = sum over matched query terms; ties break on doc_id.

    Scale shape: the corpus scan filters to the query-term postings FIRST
    (an ``isin`` over a literal list, pushed below the explode's project),
    so tf/df aggregate over |postings| rows, not the corpus; doc length and
    the (N, avgdl) totals are long/double aggregates (map-side combined);
    totals and the per-term df table broadcast. The final top-k is a
    ``TakeOrderedAndProject`` — no global sort. The rank window runs over
    exactly k rows after the limit."""
    toks = _tokens(text_col)
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
    dl = base.select("doc_id", F.size("_t").cast("long").alias("dl"))
    tot = dl.agg(F.count("*").cast("long").alias("_n"),
                 F.avg("dl").alias("_avgdl"))
    tf = (base.select("doc_id", F.explode("_t").alias("term"))
          .filter(F.col("term").isin([str(t) for t in query_terms]))
          .groupBy("doc_id", "term")
          .agg(F.count("*").cast("long").alias("tf")))
    dfc = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = (tf.join(F.broadcast(dfc), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(tot))
              .withColumn("_idf", F.log(
                  (F.col("_n") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5) + 1.0))
              .withColumn("_s", F.col("_idf") * F.col("tf") * (k1 + 1.0)
                          / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                                 / F.col("_avgdl"))))
              .groupBy("doc_id")
              .agg(F.round(F.sum("_s"), 6).alias("score"),
                   F.count("*").cast("long").alias("n_terms")))
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (top.withColumn("rank", F.row_number().over(w).cast("long"))
            .select("doc_id", "score", "n_terms", "rank"))


def inverted_index(docs: DataFrame, min_df: int = 2, max_df: int = 200,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(term, df, postings): a df-banded inverted index — per term, the
    sorted posting list of documents containing it, serialized as a
    comma-joined id string (representation-stable across engines; the
    array form is one ``split()`` away).

    The df band is the scale contract: ``min_df`` drops the hapax tail
    (typically >half the vocabulary of web text, all useless for lookup),
    ``max_df`` drops stopword-grade terms whose posting lists would be
    corpus-sized rows — exactly the terms a query planner answers with a
    scan anyway.

    TWO-PHASE build so no list buffer ever exists for an out-of-band
    term: phase 1 counts df per term (map-side-combinable longs only) and
    applies the band; phase 2 joins the surviving term set back to the
    postings relation and only THEN aggregates the lists — every
    ``collect_list`` group is ≤ ``max_df`` ids by construction. A
    single-pass build (count + collect_list in one groupBy) would
    materialize a corpus-sized array in one aggregation buffer for every
    stopword-grade term before the band filter could drop it — list
    buffers are NOT reduced by partial aggregation, so that is exactly
    the skew/OOM hazard the band exists to avoid. The extra cost is one
    term-keyed join of the (term, doc_id) relation against the banded df
    table — narrow rows, same key as the aggregate that follows."""
    t = (docs.select(F.col(id_col).alias("doc_id"),
                     F.explode(_tokens(text_col)).alias("term"))
         .dropDuplicates(["term", "doc_id"]))
    dfc = (t.groupBy("term")
           .agg(F.count("*").cast("long").alias("df"))
           .filter((F.col("df") >= min_df) & (F.col("df") <= max_df)))
    return (t.join(dfc, "term")
            .groupBy("term", "df")
            .agg(F.array_join(
                F.transform(F.sort_array(F.collect_list("doc_id")),
                            lambda x: x.cast("string")), ",")
                .alias("postings"))
            .select("term", "df", "postings"))


def zipf_fit(docs: DataFrame, top_n: int = 100, skip_ranks: int = 0,
             text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-row corpus diagnostic: least-squares fit of ln(freq) against
    ln(rank) over the ``top_n`` most frequent tokens (optionally skipping
    the first ``skip_ranks`` — function words flatten the head). A healthy
    natural-language corpus sits near slope -1 (Zipf's law); a corpus
    poisoned by boilerplate, templates, or a broken tokenizer drifts far
    from it, so this is the cheap smoke alarm a 100 TB ingest runs per
    batch. Output (n_ranks, slope, intercept, r2).

    Scale shape: ONE token-keyed count shuffle (map-side partial
    aggregation), then the top-n selection is a TakeOrderedAndProject —
    the regression itself runs over ``top_n`` rows on a one-row aggregate,
    never a corpus-sized window. The fit uses the explicit closed form
    (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) so the DuckDB oracle states the SAME
    arithmetic rather than an engine-specific regr_* implementation.
    """
    tok = docs.select(F.explode(_tokens(text_col)).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), F.asc("token")) \
        .limit(top_n + skip_ranks)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    ranked = (top.withColumn("rank", F.row_number().over(w).cast("long"))
              .filter(F.col("rank") > skip_ranks))
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    agg = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"), F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"))
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    # nullif-guard the denominators: on a degenerate corpus (< 2 ranks, or
    # all-equal counts => vary = 0) the fit is undefined, and NULL is the
    # one value Spark and the DuckDB oracle agree on for x/0
    varx = F.nullif(n * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0))
    vary = F.nullif(n * F.col("syy") - F.col("sy") * F.col("sy"), F.lit(0.0))
    slope = cov / varx
    intercept = (F.col("sy") - slope * F.col("sx")) / F.nullif(n, F.lit(0.0))
    r2 = (cov * cov) / (varx * vary)
    return agg.select(
        F.col("n").alias("n_ranks"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"))
