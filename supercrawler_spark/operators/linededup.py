"""Corpus-wide line-level deduplication (boilerplate removal).

The CCNet / RefinedWeb preprocessing step the reference's single-node
pipeline has no analog for: lines (nav bars, footers, cookie banners) that
repeat across many documents are dropped from every document, keeping each
document's unique content. Complements the *document*-level dedup family in
``operators/dedup.py`` (reference parity context: src/supercrawler.rs has no
corpus-level pass at all — extraction is per-page).

Scale shape (the whole point at 100 TB):
  1. one ``posexplode`` scan (no shuffle),
  2. one hash aggregation on the trimmed line key (map-side partial
     count-distinct via the groupBy; the *duplicated-line dictionary* that
     survives the ``min_df`` filter is orders of magnitude smaller than the
     corpus — boilerplate is by definition repeated),
  3. one join of lines against that dictionary (AQE turns it into a
     broadcast join when the dictionary is small; otherwise a shuffle join
     on the line key, which is the canonical formulation),
  4. one groupBy(doc_id) to reassemble text in original line order.
No per-row Python anywhere; every expression is JVM whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def line_dedup(docs: DataFrame, min_df: int = 2, min_chars: int = 6,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Drop every line whose trimmed form occurs in >= ``min_df`` distinct
    documents (and is >= ``min_chars`` chars after trimming — short/blank
    lines are structural, never boilerplate-dropped). Returns one row per
    document: (doc_id, n_lines, n_dropped, text_clean) with ``text_clean``
    the surviving lines re-joined by ``\\n`` in original order."""
    lines = (docs
             .select(F.col(id_col).alias("doc_id"),
                     F.posexplode(F.split(F.col(text_col), "\n"))
                     .alias("pos", "line"))
             .withColumn("lkey", F.trim("line")))
    dup = (lines
           .filter(F.length("lkey") >= min_chars)
           .groupBy("lkey")
           .agg(F.countDistinct("doc_id").alias("df"))
           .filter(F.col("df") >= min_df)
           .select("lkey", F.lit(True).alias("_dup")))
    marked = (lines.join(dup, "lkey", "left")
              .withColumn("_dup", F.coalesce("_dup", F.lit(False))))
    kept_struct = F.when(~F.col("_dup"), F.struct("pos", "line"))
    return (marked.groupBy("doc_id")
            .agg(F.count("*").alias("n_lines"),
                 F.sum(F.col("_dup").cast("long")).alias("n_dropped"),
                 F.concat_ws(
                     "\n",
                     F.transform(F.array_sort(F.collect_list(kept_struct)),
                                 lambda s: s["line"])).alias("text_clean")))


def paragraph_dedup(docs: DataFrame, min_chars: int = 1,
                    text_col: str = "text", id_col: str = "doc_id",
                    sep: str = "\n\n") -> DataFrame:
    """Corpus-wide exact paragraph dedup with KEEPER semantics (the
    C4/RealNews policy, distinct from ``line_dedup``'s drop-everywhere
    boilerplate rule): every repeated paragraph survives in exactly ONE
    global occurrence — the lexicographically first (doc_id, pos) — and is
    removed from all others, so no content is lost corpus-wide while
    duplicated mass is cut to one copy. Paragraphs shorter than
    ``min_chars`` after trimming are never deduped (structural separators).

    Returns (doc_id, n_paragraphs, n_dropped, text_clean) with surviving
    paragraphs re-joined by ``sep`` in original order.

    Scale shape: posexplode scan -> ONE hash aggregation on the paragraph
    key computing ``min(struct(doc_id, pos))`` (map-side combined — the
    min-struct is the same trick resolve_duplicates and
    remove_duplicate_spans use, so no per-hash window rank and no
    single-task hotspot on a viral paragraph) -> one join back on the key
    -> one groupBy(doc_id) reassembly. The join ships only (key, keeper)
    pairs, never paragraph text twice.
    """
    paras = (docs
             .select(F.col(id_col).alias("doc_id"),
                     F.posexplode(F.split(F.col(text_col), sep))
                     .alias("pos", "para"))
             .withColumn("pkey", F.trim("para")))
    eligible = paras.filter(F.length("pkey") >= min_chars)
    keepers = (eligible
               .groupBy("pkey")
               .agg(F.min(F.struct("doc_id", "pos")).alias("keep")))
    marked = (paras.join(keepers, "pkey", "left")
              .withColumn(
                  "_drop",
                  F.col("keep").isNotNull()
                  & ~((F.col("keep.doc_id") == F.col("doc_id"))
                      & (F.col("keep.pos") == F.col("pos")))))
    kept_struct = F.when(~F.col("_drop"), F.struct("pos", "para"))
    return (marked.groupBy("doc_id")
            .agg(F.count("*").alias("n_paragraphs"),
                 F.sum(F.col("_drop").cast("long")).alias("n_dropped"),
                 F.concat_ws(
                     sep,
                     F.transform(F.array_sort(F.collect_list(kept_struct)),
                                 lambda s: s["para"])).alias("text_clean")))
