"""Duplicate-span detection: the scalable core of exact-substring dedup.

Suffix-array substring dedup (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better") removes any >= N-token span repeated across
the corpus. A distributed suffix array is impractical at 100 TB; the
standard approximation is sliding fixed-width token-window hashing: a span
repeated across documents makes every token window inside it collide, so
flagging window hashes seen in more than one document recovers the repeated
spans (at window-width granularity) with plain hash aggregation — the same
machinery as shingling, but position-preserving.

Scale design: window hashes aggregate with map-side partial aggs (one
shuffle keyed on the hash), and only the *duplicated* hash set joins back —
on real web text that's the boilerplate tail, orders of magnitude smaller
than the corpus. The per-document summary (``span_dup_stats``) exists so the
common pipeline decision ("drop or trim docs whose duplicated fraction
exceeds X", RefinedWeb-style) never materializes per-span rows at all. No
Python UDFs; exact DuckDB-oracle twins in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from supercrawler_spark.operators.textquality import _tokens
from supercrawler_spark.operators.trainmix import md5long


def _windows(docs: DataFrame, w: int, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, pos, span_hash): hash of every ``w``-token sliding window
    (stride 1, 0-based token position). Documents shorter than ``w`` tokens
    yield nothing (F.sequence would count DOWN for negative spans)."""
    toks = _tokens(text_col)
    spans = F.transform(
        F.sequence(F.lit(0), F.size(toks) - w),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            md5long(F.concat_ws(" ", F.slice(toks, i + 1, w)))
            .alias("span_hash")))
    return (docs
            .filter(F.size(toks) >= w)
            .select(F.col(id_col).alias("doc_id"), F.explode(spans).alias("s"))
            .select("doc_id", F.col("s.pos").alias("pos"),
                    F.col("s.span_hash").alias("span_hash")))


def _dup_hashes(wins: DataFrame, min_count: int) -> DataFrame:
    """Window hashes occurring at least ``min_count`` times in the corpus —
    total occurrences, not distinct docs, so a span repeated 500x inside ONE
    spam document is flagged exactly like a cross-document boilerplate span
    (that within-document case is the one the suffix-array method was
    built for). (span_hash, n_docs, n_occ)."""
    return (wins.groupBy("span_hash")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count("*").alias("n_occ"))
            .filter(F.col("n_occ") >= min_count))


def duplicate_spans(docs: DataFrame, w: int = 8, min_count: int = 2,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, span_hash, n_docs, n_occ): every ``w``-token window
    whose hash occurs at least ``min_count`` times corpus-wide (within OR
    across documents) — the positions a substring-dedup pass would cut.
    Consecutive flagged positions merge into one repeated span of length
    (run + w - 1) tokens downstream."""
    wins = _windows(docs, w, text_col, id_col)
    return (wins.join(_dup_hashes(wins, min_count), "span_hash")
            .select("doc_id", "pos", "span_hash", "n_docs", "n_occ"))


def span_dup_stats(docs: DataFrame, w: int = 8, min_count: int = 2,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_windows, dup_windows, dup_fraction): per-document share of
    ``w``-token windows repeated >= ``min_count`` times corpus-wide — the
    drop/trim signal, computed without materializing per-span rows.
    Documents shorter than ``w`` tokens have no windows and are absent.
    One left join + one conditional aggregation (no totals join-back), so
    the window-explode kernel appears twice in the plan, not three times."""
    wins = _windows(docs, w, text_col, id_col)
    dup = _dup_hashes(wins, min_count).select("span_hash",
                                              F.lit(1).alias("_hit"))
    return (wins.join(dup, "span_hash", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_windows"),
                 F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
                 .alias("dup_windows"))
            .withColumn("dup_fraction",
                        F.round(F.col("dup_windows") / F.col("n_windows"), 6)))


def remove_duplicate_spans(docs: DataFrame, w: int = 8, min_count: int = 2,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, removed_tokens, clean_text): the exact-substring
    CUT (Lee et al. 2022) — every token covered by a duplicated ``w``-token
    window is excised from the text, except in the span's single global
    keeper occurrence, so one copy of each repeated substring survives the
    corpus. ``duplicate_spans`` detects; this rewrites.

    Keeper = the occurrence with the smallest (doc_id, pos), chosen with a
    plain ``min(struct(doc_id, pos))`` inside the SAME hash-keyed
    aggregation that counts occurrences — one map-side-combinable shuffle,
    no per-hash window rank (a corpus-wide boilerplate span repeated 10^6
    times would otherwise serialize its occurrences through one sort
    partition). Removed positions explode to ``w`` rows per flagged window
    (bounded by the duplicated tail, not the corpus) and fold back to one
    sorted per-doc array; the rebuild is a higher-order ``filter`` over the
    token array — scan-speed, no Python.

    Documents with no flagged window pass through with their text
    re-joined on single spaces (the tokenizer is whitespace-normalizing,
    so clean_text is canonical-whitespace for every row)."""
    wins = _windows(docs, w, text_col, id_col)
    keep = (wins.groupBy("span_hash")
            .agg(F.count("*").alias("n_occ"),
                 F.min(F.struct("doc_id", "pos")).alias("k"))
            .filter(F.col("n_occ") >= min_count)
            .select("span_hash", F.col("k.doc_id").alias("k_doc"),
                    F.col("k.pos").alias("k_pos")))
    flagged = (wins.join(keep, "span_hash")
               .filter(~((F.col("doc_id") == F.col("k_doc"))
                         & (F.col("pos") == F.col("k_pos")))))
    removed = (flagged
               .select("doc_id",
                       F.explode(F.sequence(F.col("pos"),
                                            F.col("pos") + (w - 1)))
                       .alias("rp"))
               .distinct()
               .groupBy("doc_id")
               .agg(F.sort_array(F.collect_list("rp")).alias("rl")))
    toks = _tokens(text_col)
    return (docs.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
            .join(removed, "doc_id", "left")
            .withColumn("rl", F.coalesce(F.col("rl"),
                                         F.array().cast("array<long>")))
            .select("doc_id",
                    F.size("_t").cast("long").alias("n_tokens"),
                    F.size("rl").cast("long").alias("removed_tokens"),
                    F.array_join(
                        F.filter("_t", lambda x, i: ~F.array_contains(
                            F.col("rl"), i.cast("long"))), " ")
                    .alias("clean_text")))


def cdc_segments(docs: DataFrame, w: int = 4, divisor: int = 16,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, seg_idx, pos, n_tokens, seg_hash): content-defined
    segmentation — the CDC idea (gear/Rabin chunking) on token streams. A
    position i >= w is a segment BOUNDARY when the hash of the w-token
    window ending at i is ≡ 0 mod ``divisor``; segments run between
    boundaries. Because the rule depends only on local content, inserting
    or deleting a sentence shifts segment starts but leaves every other
    segment's tokens — and hash — intact, so segment-hash dedup catches
    shifted near-copies that fixed-size ``chunk_documents`` windows break
    (expected segment length ≈ ``divisor`` tokens).

    Window-hash boundaries rather than a rolling gear hash: byte-rolling
    state is inherently sequential, but a per-position window hash is the
    same shift-invariant boundary rule and stays a pure higher-order
    column program (transform/filter over the token array — scan speed,
    no shuffle, no Python) with an exact DuckDB twin. Documents shorter
    than ``w`` tokens yield one whole-document segment."""
    toks = _tokens(text_col)
    n = F.size(toks)
    # boundary positions (1-based token index of a window END, i.e. the
    # segment that FOLLOWS starts at pos+1); windows end at i in [w, n]
    bpos = F.when(n >= w, F.filter(
        F.sequence(F.lit(w), n),
        lambda i: md5long(F.concat_ws(" ", F.slice(toks, i - (w - 1), w)))
        % divisor == 0)).otherwise(F.array().cast("array<int>"))
    # starts = [1] + boundaries+1 (a boundary at n yields no tail start;
    # entries are strictly increasing by construction, no dedup needed)
    starts = F.concat(
        F.array(F.lit(1)),
        F.filter(F.transform(bpos, lambda b: b + 1), lambda s: s <= n))
    segs = F.transform(
        starts,
        lambda s, j: F.struct(
            j.cast("long").alias("seg_idx"),
            s.cast("long").alias("pos"),
            (F.coalesce(F.try_element_at(starts, j + 2), n + 1) - s)
            .cast("long").alias("n_tokens"),
            md5long(F.concat_ws(" ", F.slice(
                toks, s,
                F.coalesce(F.try_element_at(starts, j + 2), n + 1) - s)))
            .alias("seg_hash")))
    return (docs.filter(n >= 1)
            .select(F.col(id_col).alias("doc_id"), F.explode(segs).alias("s"))
            .select("doc_id", "s.seg_idx", "s.pos", "s.n_tokens",
                    "s.seg_hash"))


def cdc_dup_stats(docs: DataFrame, w: int = 4, divisor: int = 16,
                  min_count: int = 2, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_segments, dup_segments, dup_token_fraction): per-document
    share of content-defined segments (tokens, not counts) whose hash
    repeats >= ``min_count`` times corpus-wide — the shift-robust
    complement to ``span_dup_stats`` (which needs every fixed window to
    collide). One segment-hash aggregation (longs, map-side combined) and
    one join back; segment rows are ~1/divisor of token rows."""
    segs = cdc_segments(docs, w, divisor, text_col, id_col)
    dup = (segs.groupBy("seg_hash")
           .agg(F.count("*").alias("n_occ"))
           .filter(F.col("n_occ") >= min_count)
           .select("seg_hash", F.lit(1).alias("_hit")))
    return (segs.join(dup, "seg_hash", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_segments"),
                 F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
                 .alias("dup_segments"),
                 F.round(F.coalesce(
                     F.sum(F.when(F.col("_hit").isNotNull(),
                                  F.col("n_tokens"))), F.lit(0))
                     / F.sum("n_tokens"), 6).alias("dup_token_fraction")))


def winnow_fingerprints(docs: DataFrame, k: int = 4, w: int = 5,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, fp): winnowing fingerprints (Schleimer et al., the
    MOSS algorithm) — from each window of ``w`` consecutive k-gram hashes,
    select the minimum (rightmost on ties), dedup repeats. The selection
    guarantees every shared substring of at least w+k-1 tokens yields at
    least one shared fingerprint, at an expected density of 2/(w+1) —
    the positional copy-detection index ``duplicate_spans`` (exhaustive
    windows) is too dense to store at corpus scale.

    Pure higher-order column functions over the token array — the whole
    selection runs at scan speed with no shuffle; the output (doc, pos,
    fp) rows are the only thing that ever aggregates. Documents shorter
    than w+k-1 tokens emit nothing."""
    from supercrawler_spark.operators.textquality import _tokens
    toks = _tokens(text_col)
    n = F.size(toks)
    # k-gram hash stream: H[i] = md5long of tokens[i..i+k-1], 1-based
    H = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.conv(F.substring(F.md5(
            F.concat_ws(" ", F.slice(toks, i, k)).cast("binary")),
            1, 15), 16, 10).cast("long"))
    # per window j (1-based over H): rightmost index of the window min
    def pick(h):
        m = F.size(h) - (w - 1)
        return F.transform(
            F.sequence(F.lit(1), m),
            lambda j: F.struct(
                (j + w - F.array_position(
                    F.reverse(F.slice(h, j, w)),
                    F.array_min(F.slice(h, j, w)))).alias("pos"),
                F.array_min(F.slice(h, j, w)).alias("fp")))
    sel = F.when(n >= w + k - 1, pick(H)) \
        .otherwise(F.array().cast("array<struct<pos:long,fp:long>>"))
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(F.array_distinct(sel)).alias("s"))
            .select("doc_id", F.col("s.pos").cast("long").alias("pos"),
                    F.col("s.fp").alias("fp"))
            .distinct())
