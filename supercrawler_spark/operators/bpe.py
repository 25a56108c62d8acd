"""Corpus-fit BPE: learn byte-pair-encoding merges from the corpus and
encode documents with them.

The real tokenizer pass of a training-data pipeline — SURVEY.md's "token
counting (whitespace + a BPE-ish regex)" is the cheap proxy; this is the
actual algorithm (Sennrich et al. 2016): iteratively merge the most
frequent adjacent symbol pair, re-segmenting the vocabulary between steps.

Scale shape — the part people get wrong: BPE learning never touches the
corpus per iteration. One corpus scan builds the word-frequency table
(``explode -> groupBy(word)`` — the canonical word-count job); every merge
iteration then runs on that VOCABULARY table (for web text, millions of
rows — orders of magnitude smaller than the corpus), with one
single-row argmax collect per merge (k rows total to the driver — the
merge list IS driver state by construction; this is how every distributed
BPE/unigram-LM trainer works). Encoding broadcasts the k merges back as
literal replaces over token segmentations — pure string expressions, no
Python UDF anywhere.

Portability trick that keeps the whole thing DuckDB-oracle-checkable: a
segmentation is a DOUBLE-space-joined, double-space-wrapped string
(``"cat"`` -> ``"  c  a  t  "``) and merge (l, r) is the literal
``replace(seg, " l  r ", " lr ")`` — single-space flanks in the pattern,
so each match consumes only its own inner separator and leaves one space
of each outer double separator in place. With that invariant, SQL
``replace`` (non-overlapping left-to-right in BOTH engines) applies the
merge to every occurrence exactly like the greedy BPE scan — including
adjacent occurrences (``aaaa`` -> ``(aa)(aa)``) and odd runs (``aaa`` ->
``(aa)(a)``) — property-fuzzed against a reference greedy merger in
tests/test_bpe.py. A single-space representation would fail here: its
matches share separator spaces, so ``" a b a b "`` merges only the first
pair. Symbols can never contain spaces (they come from whitespace-split
tokens), so the flanks are unambiguous symbol boundaries. The oracle
unrolls the k iterations as generated CTEs (``__spark_entry__`` builds
them with the same Python loop shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from supercrawler_spark.operators.textquality import _tokens


def _seg(col):
    """'  c  a  t  ' segmentation-string of a token (chars joined and
    wrapped with DOUBLE spaces — see module docstring)."""
    return F.concat(F.lit("  "), F.array_join(F.split(col, ""), "  "),
                    F.lit("  "))


def _apply_merge(seg_col, l: str, r: str):
    # single-space flanks against the double-space separators: greedy-
    # equivalent (module docstring). call_function avoids SQL-literal
    # injection: web-text symbols can contain quotes
    return F.call_function("replace", seg_col,
                           F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    t = F.split(F.trim(F.col("seg")), "  ")
    n = F.size(t)
    pairs = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(F.element_at(t, i).alias("l"),
                           F.element_at(t, i + 1).alias("r")))) \
        .otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (vocab.select("freq", F.explode(pairs).alias("g"))
            .select("freq", F.col("g.l").alias("l"), F.col("g.r").alias("r"))
            .groupBy("l", "r")
            .agg(F.sum("freq").cast("long").alias("cnt")))


def learn_bpe(docs: DataFrame, k: int = 3,
              text_col: str = "text",
              batch: int = 64) -> list[tuple[int, str, str, int]]:
    """Learn ``k`` BPE merges; returns [(step, lhs, rhs, pair_count)].
    Ties break on (lhs, rhs) ascending so the merge sequence — and
    everything encoded with it — is fully deterministic. Stops early if no
    pair remains (vocabulary fully merged).

    ``batch`` collects the top-``batch`` candidate pairs per driver round
    trip and applies the longest SAFE prefix in one go — cutting the
    per-merge collect round trips (the one driver-synchronous cost of
    distributed BPE) while staying EXACTLY equal to the 1-merge-per-round
    greedy (equality-fuzzed in tests/test_bpe.py; ``batch=1`` is the
    plain loop). A later candidate is applied only when the snapshot
    provably still ranks it first after the earlier applied merges:

    - its count is unchanged — merging (l,r) only ever DECREASES counts of
      pairs shaped (x,l) or (r,y), so a candidate is stale iff its rhs is
      some applied lhs or its lhs is some applied rhs;
    - no pair CREATED by an applied merge can outrank it — each occurrence
      of a new pair (x, lr) / (lr, y) maps 1:1 to an old occurrence of
      (x, l) / (r, y), so new-pair counts are bounded by the snapshot
      counts of those adjacent forms (and by the last collected count for
      pairs below the collected horizon); the candidate must STRICTLY
      exceed that bound (a tie could re-order against the new pair's
      unknown string sort key).
    """
    vocab = (docs.select(F.explode(_tokens(text_col)).alias("word"))
             .groupBy("word").agg(F.count("*").cast("long").alias("freq"))
             .withColumn("seg", _seg(F.col("word")))
             .persist())
    try:
        merges: list[tuple[int, str, str, int]] = []
        cur = vocab
        while len(merges) < k:
            top = (_pair_counts(cur)
                   .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                   .limit(max(1, batch)).collect())
            if not top:
                break
            # complete snapshot: nothing exists below the collected horizon
            complete = len(top) < max(1, batch)
            cnt_min = top[-1]["cnt"]
            applied: list[tuple[str, str]] = []
            for b in top:
                if len(merges) >= k:
                    break
                if applied:
                    if any(b["r"] == jl or b["l"] == jr
                           for jl, jr in applied):
                        break               # count possibly decreased
                    bound = max((p["cnt"] for p in top
                                 for jl, jr in applied
                                 if p["r"] == jl or p["l"] == jr),
                                default=0)
                    if not complete:
                        bound = max(bound, cnt_min)
                    if b["cnt"] <= bound:
                        break               # a created pair could outrank
                applied.append((b["l"], b["r"]))
                merges.append((len(merges) + 1, b["l"], b["r"], b["cnt"]))
            for l, r in applied:
                # applied merges are mutually symbol-disjoint (stale rule),
                # so the stacked replaces commute
                cur = cur.withColumn("seg",
                                     _apply_merge(F.col("seg"), l, r))
        return merges
    finally:
        vocab.unpersist()


def bpe_merges(docs: DataFrame, k: int = 3,
               text_col: str = "text") -> DataFrame:
    """The learned merge table as a DataFrame:
    (step, lhs, rhs, pair_count)."""
    spark = docs.sparkSession
    return spark.createDataFrame(
        learn_bpe(docs, k=k, text_col=text_col),
        "step long, lhs string, rhs string, pair_count long")


def bpe_encode(docs: DataFrame, merges: list[tuple[int, str, str, int]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_pieces): encode every document with the learned
    merges and count the resulting BPE pieces — the token-budget number a
    packing/pricing pass actually needs. The merge chain is applied as k
    stacked literal replaces over per-token segmentation strings: pure
    whole-stage-codegen expressions, corpus scanned once, per-doc scalar
    aggregation is the only shuffle. Empty documents are dropped."""
    seg = _seg(F.col("word"))
    for _, l, r, _cnt in merges:
        seg = _apply_merge(seg, l, r)
    tok = (docs
           .filter(F.length(F.trim(F.col(text_col))) > 0)
           .select(F.col(id_col).alias("doc_id"),
                   F.explode(_tokens(text_col)).alias("word")))
    return (tok.select("doc_id",
                       F.size(F.split(F.trim(seg), "  ")).alias("pieces"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("pieces").cast("long").alias("n_pieces")))
