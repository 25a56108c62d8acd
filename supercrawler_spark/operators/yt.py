"""YouTube search-result markdown (S6/X11, src/yt_crawler.rs:119-161).

The reference's third endpoint is a single-source scan + projection + string
format — no frontier, no recursion (SURVEY §3.3). Re-expressed as a pure
DataFrame aggregation: per-video blocks rendered with built-in string
expressions, concatenated in result order with an ordered collect_list.
The limit clamp (default 5, src/yt_crawler.rs:178) applies to the video
stream before formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HEADER = "# YouTube Search Results\n\n"
EMPTY = HEADER + "No videos found or processed.\n"


def video_block(rank_col, id_col, title_col, description_col):
    """One video's markdown block (rs:132-139); rank is 1-based result order."""
    return F.concat(
        F.lit("---\n\n## "), rank_col.cast("string"), F.lit(". "), title_col,
        F.lit("\n\n**Video URL:** https://www.youtube.com/watch?v="), id_col,
        F.lit("\n\n**Description:**\n"), F.trim(description_col), F.lit("\n\n"),
    )


def generate_markdown(videos: DataFrame, limit: int = 5,
                      id_col: str = "id", title_col: str = "title",
                      description_col: str = "description",
                      order_col: str = "rank") -> DataFrame:
    """One-row DataFrame (markdown string) from an ordered videos table.
    ``order_col`` is the search-result position (0-based)."""
    v = (videos.filter(F.col(order_col) < limit)
         .select(F.col(order_col).alias("_ord"),
                 video_block(F.col(order_col) + 1, F.col(id_col),
                             F.col(title_col), F.col(description_col))
                 .alias("block")))
    agg = v.agg(
        F.concat(
            F.lit(HEADER),
            F.concat_ws("", F.transform(
                F.array_sort(F.collect_list(F.struct("_ord", "block"))),
                lambda s: s["block"]))).alias("markdown"),
        F.count("*").alias("n_videos"))
    return agg.select(
        F.when(F.col("n_videos") == 0, F.lit(EMPTY))
        .otherwise(F.col("markdown")).alias("markdown"),
        "n_videos")


def videos_from_documents(docs: DataFrame, limit: int = 5) -> DataFrame:
    """Derive a deterministic videos table from ``documents`` (driver
    contract input): id/title/description from doc fields."""
    return docs.select(
        F.col("doc_id").cast("long").alias("rank"),
        F.concat(F.lit("vid"), F.col("doc_id").cast("string")).alias("id"),
        F.concat(F.lit("Video about "), F.substring(F.col("text"), 1, 30))
        .alias("title"),
        F.substring(F.col("text"), 1, 120).alias("description"),
    ).filter(F.col("rank") < limit)
