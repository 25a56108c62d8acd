"""Sequence packing: assign documents to fixed-token-budget training packs.

The last transform before tokenized training data hits the trainer: documents
are concatenated in a deterministic pseudo-random order and cut into packs of
``budget`` tokens (GPT-style packing — a document may straddle a pack
boundary; the pack records where each document starts). Downstream loaders
read one pack = one training sequence.

Scale design (100 TB corpus): a single global running sum would serialize on
one partition, so packing is two-level — documents hash into ``n_shards``
independent shards (same salted-md5 shard function as
``trainmix.shuffle_corpus``) and the running token sum is a window per shard,
giving shard-count-wide parallelism with exactly one shuffle. Pack identity
is (shard, pack): packs never cross shards, so any subset of shards can be
packed, shipped, and consumed independently.

Reference (duggal1/supercrawler) scope ends at document collection; this is a
SURVEY.md §2 "training-data operators" extension. No Python UDFs; exact
DuckDB-oracle twin in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from supercrawler_spark.operators.textquality import _tokens
from supercrawler_spark.operators.trainmix import _salted_id_hash


def pack_sequences(docs: DataFrame, budget: int = 2048, n_shards: int = 64,
                   salt: str = "pack-1", text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shard, pack, offset, n_tokens): document ``doc_id`` carries
    ``n_tokens`` whitespace tokens and its text begins ``offset`` tokens into
    training pack ``pack`` of shard ``shard`` (packs are ``budget`` tokens;
    a document starting near the end of a pack continues into the next one —
    the standard concatenate-then-cut packing). Order within a shard is the
    salted-md5 hash (doc_id tie-break), so the packing is reproducible and
    independent of input partitioning or cluster size. Empty documents are
    dropped (they contribute no tokens)."""
    h = _salted_id_hash(salt, id_col)
    d = (docs
         .filter(F.length(F.trim(F.col(text_col))) > 0)
         .select(F.col(id_col).alias("doc_id"),
                 F.size(_tokens(text_col)).cast("long").alias("n_tokens"),
                 h.alias("_h"),
                 F.pmod(h, F.lit(n_shards)).alias("shard")))
    w = Window.partitionBy("shard").orderBy("_h", "doc_id")
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start")
    return (d.withColumn("_start", start)
            .select("doc_id", "shard",
                    F.floor(F.col("_start") / budget).cast("long").alias("pack"),
                    F.pmod(F.col("_start"), F.lit(budget)).cast("long")
                    .alias("offset"),
                    "n_tokens"))
