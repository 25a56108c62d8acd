"""Anchor-text corpus: per-target aggregation of in-link anchor texts.

The reference extracts hrefs and discards the anchor text
(src/supercrawler.rs:736-757); a web-scale training pipeline additionally
wants the classic anchor-text signal (what the web CALLS a page — the
Common-Crawl/REALM-style anchor corpus): for every target URL, how many
pages link to it and with what text.

Scale shape: the html bytes are read once by the Arrow UDF and never
shuffled — the explode emits narrow (source_url, target_url, anchor) rows.
Aggregation is two hash shuffles on progressively smaller data:
(target, anchor) counts (map-side combine collapses repeated anchors per
partition first), then a per-target rank. The rank filter is a
``row_number() <= k`` predicate Spark pushes into WindowGroupLimit, so a
mega-popular target (the skew case — every page links to the homepage)
keeps only k rows per shuffle partition before the final window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from supercrawler_spark.functions import udfs
from supercrawler_spark.operators import graph


def anchor_pairs(pages: DataFrame, url_col: str = "url",
                 html_col: str = "html") -> DataFrame:
    """(source_url, target_url, anchor) — one row per anchor occurrence, in
    document order, via the Arrow extraction UDF. Empty anchor texts are
    kept (filtering is the aggregation's choice)."""
    return (pages
            .select(F.col(url_col).alias("source_url"),
                    udfs.extract_anchors_udf(F.col(url_col), F.col(html_col))
                    .alias("_as"))
            .select("source_url", F.explode("_as").alias("_a"))
            .select("source_url", F.col("_a.href").alias("target_url"),
                    F.col("_a.anchor").alias("anchor")))


def anchor_corpus(pairs: DataFrame, top_k: int = 3) -> DataFrame:
    """Per-target anchor-text summary as flat rows: the ``top_k`` most
    frequent NON-EMPTY anchor texts per target (count desc, anchor asc
    tie-break), each row carrying the target's total in-link count —
    ``n_inlinks`` counts ALL in-links including empty-text (image/icon)
    anchors, so it is the true in-degree, not just the ranked subset's sum.

    Output: (target_url, anchor, n_with_anchor, rank, n_inlinks). Targets
    with only empty-text anchors have no ranked rows and are absent."""
    counts = (pairs
              .groupBy("target_url", "anchor")
              .agg(F.count("*").alias("n_with_anchor")))
    wall = Window.partitionBy("target_url")
    w = Window.partitionBy("target_url").orderBy(
        F.desc("n_with_anchor"), F.asc("anchor"))
    return (counts
            .withColumn("n_inlinks",
                        F.sum("n_with_anchor").over(wall).cast("long"))
            .filter(F.col("anchor") != "")
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= top_k)
            .select("target_url", "anchor", "n_with_anchor", "rank",
                    "n_inlinks"))


def pages_with_text_anchors(docs: DataFrame, n_docs: int) -> DataFrame:
    """``graph.pages_from_documents`` with per-edge anchor text
    ('doc <dst> k<k>') instead of the constant 'link' — used by the
    anchor-corpus oracle query so the text aggregation is non-vacuous while
    the default crawl fixtures stay byte-stable (one shared envelope
    builder, only the anchor-label expression differs)."""
    return graph.pages_from_documents(
        docs, n_docs,
        anchor_text=lambda s: F.concat(
            F.lit("doc "), s["dst_id"].cast("string"),
            F.lit(" k"), s["k"].cast("string"))).select("url", "html")
