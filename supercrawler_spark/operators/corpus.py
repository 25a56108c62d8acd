"""Corpus-hygiene operators for training-data pipelines: Gopher-style
repetition signals, PII redaction, and per-source provenance stats.

Like the rest of ``operators/``, everything here is built-in JVM expressions
(higher-order array functions, regexp builtins) — no Python UDFs, no
driver-side loops — so each operator runs at parquet-scan speed and scales
linearly with the corpus. Each has an exact DuckDB-oracle twin in
``__spark_entry__.oracle_sql``.

These extend the reference's pipeline (duggal1/supercrawler collects MDX
documents but ships no corpus-quality pass; see SURVEY.md §2 "training-data
operators") with the standard cleaning stages a 100 TB pre-training corpus
needs: repetition filters (Rae et al., Gopher §A1.3), PII scrubbing, and
source-mix accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from supercrawler_spark.operators.textquality import _tokens


def repetition_signals(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition features:

    - ``unique_token_ratio``: distinct tokens / tokens (low ⇒ boilerplate),
    - ``top_2gram_frac``: occurrences of the most frequent token 2-gram /
      total 2-grams,
    - ``dup_2gram_frac``: fraction of 2-gram occurrences beyond each gram's
      first (1 - distinct/total).

    All three are computed inside per-row array expressions — the most
    frequent 2-gram count comes from a sort + linear run-length fold
    (O(L log L) per document, L = token count), NOT a per-(doc, gram)
    shuffle and NOT an O(L²) distinct×occurrence probe — so the operator
    is shuffle-free and runs at scan speed at any corpus size. Documents
    with fewer than two tokens report 0.0 for the 2-gram fractions.
    """
    toks = _tokens(text_col)
    n = F.size(toks)
    # guard n >= 2: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not
    # an empty list, so single-token docs need an explicit empty gram array
    grams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i),
                              F.element_at(toks, i + 1)))) \
        .otherwise(F.array().cast("array<string>"))
    n_grams = F.size(grams)
    # max run length over the sorted gram array == count of the mode 2-gram
    sorted_grams = F.array_sort(grams)
    zero = F.struct(F.lit("").alias("prev"),
                    F.lit(0).cast("long").alias("run"),
                    F.lit(0).cast("long").alias("best"))
    top_count = F.aggregate(
        sorted_grams, zero,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1)
                .otherwise(F.lit(1).cast("long"))).alias("best")),
        lambda acc: acc.best)
    gram_frac = lambda num: (  # noqa: E731 — local shaping helper
        F.when(n_grams > 0, F.round(num / n_grams, 6)).otherwise(F.lit(0.0)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks)) / n, 6)
        .alias("unique_token_ratio"),
        gram_frac(top_count).alias("top_2gram_frac"),
        gram_frac(n_grams - F.size(F.array_distinct(grams)))
        .alias("dup_2gram_frac"),
    )


# PII patterns — kept to the RE2 ∩ java.util.regex common dialect (no
# lookaround, no backreferences) so the Spark expression and the DuckDB
# oracle compile the SAME pattern text.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d[\d-]{7,14}\d"


def scrub_pii(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Redact emails, IPv4 addresses and international phone numbers with
    typed placeholders, reporting per-document hit counts.

    Applied in a fixed order (email → ip → phone, each pass running on the
    previous pass's output) so overlapping matches resolve deterministically
    — e.g. the digit runs inside an already-redacted IP can never be
    re-matched as a phone number. Pure ``regexp_replace`` /
    ``regexp_extract_all`` builtins: whole-stage-codegen'd, shuffle-free,
    scan-speed at 100 TB.
    """
    t0 = F.col(text_col)
    # idx=0 (whole match): Spark's regexp_extract_all defaults to GROUP 1,
    # which raises on these group-free patterns
    n_emails = F.size(F.regexp_extract_all(t0, F.lit(EMAIL_RE), F.lit(0)))
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(IPV4_RE), F.lit(0)))
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PHONE_RE), F.lit(0)))
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        t3.alias("redacted"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
    )


def source_stats(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 source_col: str = "source") -> DataFrame:
    """Per-source corpus accounting (the data-mix table a pre-training run
    is planned from): document count, token/char totals, mean document
    length, and distinct-language count per source.

    One hash aggregation keyed on the low-cardinality source column —
    map-side partial aggregation does almost all the work, so the single
    shuffle moves only ~|sources| rows per input partition.
    """
    toks = F.size(_tokens(text_col))
    return (docs
            .select(F.col(source_col).alias("source"),
                    F.col(id_col).alias("doc_id"),
                    toks.alias("n_toks"),
                    F.length(F.col(text_col)).alias("n_chars"),
                    F.col("lang"))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_toks").cast("long").alias("total_tokens"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.round(F.avg("n_toks"), 6).alias("mean_tokens"),
                 F.countDistinct("lang").alias("n_langs")))

def length_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Log2-bucketed document-length histogram: (bucket, lo_chars, hi_chars,
    n_docs, total_chars, avg_tokens) where bucket ``b`` covers lengths
    ``[2^(b-1), 2^b - 1]`` (bucket 0 = empty documents) — the corpus-shape
    report behind length-filter thresholds and pack-budget sizing.

    The bucket id is the integer bit length of the char count (pure
    ``length(bin(n))`` — no float log2 whose boundary values could disagree
    across engines), so the single groupBy key has ~40 values at any corpus
    size: map-side partial aggregation collapses each input partition to a
    few dozen rows before the one tiny shuffle.
    """
    n_chars = F.length(F.col(text_col))
    bucket = F.when(n_chars == 0, F.lit(0)) \
        .otherwise(F.length(F.bin(n_chars.cast("long")))).cast("long")
    n_toks = F.size(_tokens(text_col))
    return (docs
            .select(bucket.alias("bucket"), n_chars.alias("n_chars"),
                    n_toks.alias("n_toks"))
            .groupBy("bucket")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.round(F.avg("n_toks"), 6).alias("avg_tokens"))
            .select("bucket",
                    F.when(F.col("bucket") == 0, F.lit(0)).otherwise(
                        F.pow(F.lit(2.0), F.col("bucket") - 1).cast("long"))
                    .alias("lo_chars"),
                    (F.pow(F.lit(2.0), F.col("bucket")).cast("long") - 1)
                    .alias("hi_chars"),
                    "n_docs", "total_chars", "avg_tokens"))


def top_tokens(docs: DataFrame, k: int = 50, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide vocabulary heavy hitters: the ``k`` most frequent tokens
    with occurrence and document counts — the Zipf-head/top-vocabulary query
    every corpus report starts with. Output (token, n_occurrences, n_docs,
    rank), ordered by (count desc, token asc) for determinism.

    Scale shape: the exploded (token, doc_id) stream never materializes
    globally — occurrence counts partial-aggregate map-side, the distinct
    doc count rides the same shuffle as a two-level agg (distinct pairs,
    then counts), and the global top-k is TakeOrderedAndProject (per-
    partition heaps + driver merge of k rows, no single-partition sort).
    The rank window runs AFTER the limit, over k rows."""
    occ = docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(_tokens(text_col)).alias("token"))
    pairs = (occ.groupBy("token", "doc_id")
             .agg(F.count("*").alias("_n")))
    counts = (pairs.groupBy("token")
              .agg(F.sum("_n").cast("long").alias("n_occurrences"),
                   F.count("*").cast("long").alias("n_docs")))
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def host_quantiles(docs: DataFrame, text_col: str = "text",
                   source_col: str = "source",
                   qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9)
                   ) -> DataFrame:
    """Per-source document-length quantile profile → (source, q, chars_q):
    the host-level gate a corpus pipeline filters whole domains with (e.g.
    drop hosts whose median doc is < 200 chars — boilerplate farms — or
    whose p90 explodes — listing/spam hosts).

    Exact `percentile` (classic h = (n-1)p linear interpolation, matching
    DuckDB's quantile_cont) computed once per group for all cut points via
    the array form, then unpivoted. Exactness costs a per-group sort of the
    length values — at 10^9 docs / 10^7 hosts that's ~100 values per group,
    trivially fine and far cheaper than it sounds because the shuffle moves
    only (source, length:long) pairs, never text. For truly degenerate
    single-host skew, swap in percentile_approx (t-digest, mergeable
    map-side) at the cost of oracle exactness; the profile's downstream use
    (threshold gates) tolerates that approximation.
    Values round to 6 decimals (repo float-parity convention).
    """
    q_arr = F.array(*[F.lit(float(q)) for q in qs])
    pct = F.expr(
        f"percentile(chars, array({', '.join(str(float(q)) + 'D' for q in qs)}))")
    prof = (docs.select(F.col(source_col).alias("source"),
                        F.length(F.col(text_col)).alias("chars"))
            .groupBy("source")
            .agg(pct.alias("p")))
    pairs = F.arrays_zip(q_arr.alias("q"), F.col("p").alias("chars_q"))
    return (prof.select("source", F.explode(pairs).alias("e"))
            .select("source",
                    F.format_number(F.col("e.q"), 2).alias("q"),
                    F.round(F.col("e.chars_q"), 6).alias("chars_q")))


def audit_sample(docs: DataFrame, k: int = 3, salt: str = "audit-1",
                 group_col: str = "source",
                 id_col: str = "doc_id") -> DataFrame:
    """(group, doc_id, rk): a deterministic fixed-k sample per group — the
    human-QA audit draw every corpus release ships (k docs per source/host
    for manual inspection, reproducible across reruns so reviewers and
    pipelines see the same rows).

    Selection key is the salted md5 of the id — uniform, deterministic,
    and independent of ingestion order — ranked per group with a window
    whose ``rk <= k`` filter Spark pushes into a WindowGroupLimit
    (per-partition top-k heaps, no full per-group sort)."""
    from pyspark.sql import Window

    from supercrawler_spark.operators.trainmix import _salted_id_hash
    w = Window.partitionBy(group_col).orderBy(
        _salted_id_hash(salt, id_col), F.col(id_col))
    return (docs.select(F.col(group_col).alias("grp"),
                        F.col(id_col).alias("doc_id"),
                        F.row_number().over(w).cast("long").alias("rk"))
            .filter(F.col("rk") <= k))
