"""Sharded training-export sink: physical order, manifest audit, readback."""

import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from supercrawler_spark import sinks
from supercrawler_spark.operators import trainmix

N_DOCS = 120
N_SHARDS = 8


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"body of document {i} " * 3, f"src{i % 3}")
            for i in range(N_DOCS)]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")


@pytest.fixture(scope="module")
def export(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export") / "corpus")
    manifest = sinks.export_shards(docs, out, n_shards=N_SHARDS)
    return out, manifest


def test_manifest_counts(export):
    out, manifest = export
    assert manifest["n_shards"] == N_SHARDS
    assert manifest["total_rows"] == N_DOCS
    assert sum(manifest["shard_rows"].values()) == N_DOCS
    on_disk = json.load(open(os.path.join(out, "_export_manifest.json")))
    assert on_disk == manifest


def test_one_sorted_file_per_shard(export):
    """A raw sequential read of shard k's single parquet file must replay
    pos = 1..n_k in order — the no-further-sort guarantee trainers rely on."""
    out, manifest = export
    for shard, n in manifest["shard_rows"].items():
        d = os.path.join(out, f"shard={shard}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"shard {shard} fragmented: {files}"
        tbl = pq.read_table(os.path.join(d, files[0]))
        assert tbl.column("pos").to_pylist() == list(range(1, n + 1))


def test_readback_matches_logical_assignment(spark, docs, export):
    out, _ = export
    got = {(r["doc_id"], r["shard"], r["pos"])
           for r in sinks.read_export(spark, out).collect()}
    want = {(r["doc_id"], r["shard"], r["pos"])
            for r in trainmix.shuffle_corpus(docs, n_shards=N_SHARDS).collect()}
    assert got == want


def test_shard_readback_is_pruned_and_complete(spark, export):
    out, manifest = export
    df = sinks.read_export(spark, out, shard=3)
    assert df.count() == manifest["shard_rows"]["3"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "shard" in plan.split(
        "PartitionFilters:")[1][:120]


def test_payload_columns_survive(spark, export):
    out, _ = export
    row = sinks.read_export(spark, out).filter(F.col("doc_id") == 7).first()
    assert row["text"].startswith("body of document 7 ")


def test_export_is_deterministic(spark, docs, tmp_path_factory):
    out2 = str(tmp_path_factory.mktemp("export2") / "corpus")
    m2 = sinks.export_shards(docs, out2, n_shards=N_SHARDS)
    ref = trainmix.shuffle_corpus(docs, n_shards=N_SHARDS)
    assert m2["shard_rows"] == {
        str(r["shard"]): r["n"] for r in
        ref.groupBy("shard").agg(F.count("*").alias("n")).collect()}
