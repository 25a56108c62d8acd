"""Training-data export sink: sharded, order-preserving corpus writer.

Bridges ``trainmix.shuffle_corpus``'s logical (doc_id, shard, pos)
assignment to physical files a trainer can stream: one parquet directory
partition per shard, rows physically sorted by ``pos`` inside each file, so
a sequential read of shard k replays the deterministic permutation with no
further sort. The reference's MDX-file sink writes one file per page
(src/supercrawler.rs:352-369); at 100 TB one-file-per-doc is untenable —
bounded shard files are the scale analog.

Scale shape: shard and pos are deterministic functions of doc_id, so the
sink computes them INLINE on the payload scan instead of joining against
``shuffle_corpus``'s output (whose id list is corpus-sized — never
broadcastable at 10^10 docs, which would force a second payload shuffle
through a sort-merge join). The text bytes cross the wire exactly once, in
the row_number window's hash shuffle on ``shard``; the writer's
``partitionBy`` then splits files per shard with no further exchange.
Parity with the logical operator is asserted in tests
(test_sinks.test_readback_matches_logical_assignment). Manifest row-counts
are written alongside for audit; readback (`read_export`) is
partition-pruned per shard.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .operators.trainmix import _salted_id_hash


def export_shards(docs: DataFrame, out_dir: str, n_shards: int = 64,
                  salt: str = "shuffle-1", id_col: str = "doc_id",
                  payload_cols: tuple[str, ...] = ("text",)) -> dict:
    """Write ``docs`` as ``out_dir/shard=K/*.parquet``, each shard sorted by
    the deterministic shuffle position (``trainmix.shuffle_corpus``
    semantics: shard = salted-md5(id) mod n_shards, pos = rank of the hash
    within its shard). Returns a manifest dict (also persisted as
    ``_export_manifest.json``) with per-shard row counts."""
    h = _salted_id_hash(salt, id_col)
    rows = docs.select(F.col(id_col).alias("doc_id"),
                       *[F.col(c) for c in payload_cols],
                       h.alias("_h"), F.pmod(h, F.lit(n_shards)).alias("shard"))
    w = Window.partitionBy("shard").orderBy("_h", "doc_id")
    rows = (rows.withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("_h")
            .sortWithinPartitions("shard", "pos"))
    rows.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    # audit counts re-derive the narrow assignment only (no payload scan cost
    # beyond the id column; at scale this reads one column group).
    counts = {int(r["shard"]): int(r["n"]) for r in
              docs.select(F.pmod(h, F.lit(n_shards)).alias("shard"))
              .groupBy("shard").agg(F.count("*").alias("n")).collect()}
    manifest = {"n_shards": n_shards, "salt": salt,
                "total_rows": sum(counts.values()),
                "shard_rows": {str(k): v for k, v in sorted(counts.items())}}
    with open(os.path.join(out_dir, "_export_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_export(spark: SparkSession, out_dir: str,
                shard: int | None = None) -> DataFrame:
    """Stream the export back; with ``shard`` set, the scan is
    partition-pruned to that directory. Rows of one shard arrive in
    ``pos`` order within each file."""
    df = spark.read.parquet(out_dir)
    if shard is not None:
        df = df.filter(F.col("shard") == shard)
    return df
