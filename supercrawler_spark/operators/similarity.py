"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant is
the scale path (candidates restricted to matching random-hyperplane sign
buckets, so the cross join shrinks from |Q|×|N| to per-bucket blocks).
Everything is built-in higher-order functions (zip_with/aggregate) — JVM
expression codegen, no Python UDFs, no collect.

DuckDB-oracle parity: cosine is computed in double precision from the float
inputs and rounded to 6 decimals on output; ties broken by neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query by cosine (query rows excluded from
    their own result). Output (query_id, neighbor_id, rank, sim)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    n = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("nv"))
    scored = (q.join(n, F.col("query_id") != F.col("neighbor_id"))
              .withColumn("sim", cosine(F.col("qv"), F.col("nv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim", 6).alias("sim")))


def hyperplane_buckets(embeddings: DataFrame, n_planes: int = 4,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: sign bits of dot products
    with ``n_planes`` deterministic pseudo-random hyperplanes. The planes are
    derived from a fixed recurrence (seeded by plane index × dimension) so
    the oracle can reproduce them."""
    # plane p component d = ((p*131 + d*31 + 7) % 97) - 48  (zero-mean ints)
    planes = [
        F.array(*[F.lit(float((p * 131 + d * 31 + 7) % 97 - 48)) for d in range(dim)])
        for p in range(n_planes)
    ]
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    bucket = None
    for p, plane in enumerate(planes):
        bit = (_dot(F.col("v"), plane) >= 0).cast("long") * (2 ** p)
        bucket = bit if bucket is None else bucket + bit
    return e.withColumn("bucket", bucket)


def lsh_ann_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                 n_planes: int = 4, id_col: str = "vec_id",
                 vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.
    Same output shape as cosine_topk (recall < 1 by design; the oracle
    mirrors the same bucketing, verifying the implementation not the
    recall)."""
    b = hyperplane_buckets(embeddings, n_planes, id_col, vec_col, dim)
    qids = queries.select(F.col(id_col).alias("vec_id"))
    q = (b.join(F.broadcast(qids), "vec_id", "left_semi")
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"))
    n = b.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"), "bucket")
    scored = (q.join(n, "bucket")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("sim", cosine(F.col("qv"), F.col("nv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim", 6).alias("sim")))


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a_id < b_id, sim ≥ threshold)."""
    a = embeddings.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("av"))
    b = embeddings.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("bv"))
    return (a.join(b, F.col("a_id") < F.col("b_id"))
            .withColumn("sim", F.round(cosine(F.col("av"), F.col("bv")), 6))
            .filter(F.col("sim") >= threshold)
            .select("a_id", "b_id", "sim"))
