"""Hashing-trick document embeddings (featurization for the similarity and
clustering operators).

A production pipeline embeds documents with a neural encoder (an Arrow-UDF
batch-inference stage — the model call is sandbox-stubbed like the
multimodal decoders); this operator is the deterministic classical
alternative that needs no model at all: the signed hashing trick
(Weinberger et al. 2009 feature hashing). Each token lands in bucket
``md5 % dim`` with sign from the next hash bit; the document vector is the
per-bucket signed count. Cosine over these vectors approximates token-set
similarity, so the output feeds ``semdedup`` / ``embedding_near_dups`` /
``kmeans_assign`` directly — an end-to-end documents → vectors → semantic
dedup path with no external embedding table.

Scale shape: explode(tokens) → one groupBy(doc_id, bucket) with map-side
partial aggregation → one groupBy(doc_id) pivot into the fixed-width
vector (both shuffles keyed on doc_id-led keys; the second reuses the
first's hash partitioning). Integer signed counts — exact, order-free,
and the DuckDB oracle replays them bit-for-bit.

PERSIST the output before composing it into kmeans/semdedup/near-dup
plans: the embedding column is a wide expression tree (a dim-ary transform
of map lookups), and without a cached relation for the optimizer to
substitute, CollapseProject inlines that tree into every per-dimension
distance/centroid term — a multiplicative plan blowup that OOMs the JVM
optimizer (measured at 500 docs x dim 64; persisted, the same composition
plans and runs in seconds — see pipeline.prepare_training_corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from supercrawler_spark.operators.textquality import _tokens


def hash_embed(docs: DataFrame, dim: int = 64, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, embedding array<long> of length ``dim``): signed
    hashing-trick embedding. Bucket = first 8 md5 hex chars mod ``dim``;
    sign = parity of the 9th hex char. Empty documents embed as the zero
    vector."""
    tok = F.explode(_tokens(text_col)).alias("token")
    h = F.md5(F.col("token"))
    bucket = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                    F.lit(dim))
    sign = F.when(
        F.pmod(F.conv(F.substring(h, 9, 1), 16, 10).cast("long"), F.lit(2))
        == 0, F.lit(1)).otherwise(F.lit(-1)).cast("long")
    per_bucket = (docs.select(F.col(id_col).alias("doc_id"), tok)
                  .select("doc_id", bucket.alias("bucket"),
                          sign.alias("s"))
                  .groupBy("doc_id", "bucket")
                  .agg(F.sum("s").alias("v")))
    # pivot into the fixed-width vector: map_from_entries + dense lookup
    # (no second scan, no dim-way join)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("long")),
                             F.lit(0).cast("long")))
    emb = (per_bucket.groupBy("doc_id")
           .agg(F.map_from_entries(
               F.collect_list(F.struct("bucket", "v"))).alias("m"))
           .select("doc_id", vec.alias("embedding")))
    # empty docs (no tokens after split) still deserve a row
    zero = F.array(*[F.lit(0).cast("long") for _ in range(dim)])
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(emb, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("embedding"), zero).alias("embedding")))


def _rp_signs(out_dim: int, in_dim: int, salt: str) -> list[list[int]]:
    """Deterministic ±1 projection matrix: sign(k, i) = parity of
    md5("{salt}:{k}:{i}") — reproducible by any engine's md5 (the DuckDB
    oracle recomputes the same strings), no RNG state anywhere."""
    import hashlib
    return [[1 - 2 * (int(hashlib.md5(
        f"{salt}:{k}:{i}".encode()).hexdigest()[:15], 16) % 2)
        for i in range(in_dim)] for k in range(out_dim)]


def random_projection(emb: DataFrame, out_dim: int = 16,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      salt: str = "rp-1") -> DataFrame:
    """(vec_id, projected array<double> of length ``out_dim``):
    Johnson-Lindenstrauss dimensionality reduction with a dense ±1 sign
    matrix (Achlioptas 2003), y_k = (1/√out_dim)·Σ_i sign(k,i)·x_i — the
    standard preconditioner before ANN indexing or clustering when the
    embedding width, not the row count, is the cost driver (distance
    computations and PQ codebooks shrink by in_dim/out_dim while pairwise
    distances are preserved within 1±ε w.h.p.).

    The sign matrix is a broadcast-free LITERAL column (out_dim×in_dim
    ints baked into the plan — ~4 KB at 16×64; for very wide inputs pass
    it via a broadcast join instead); each output coordinate is one
    fixed-order fold over the input array, so the whole projection runs
    at scan speed with no shuffle, no Python, and no nondeterministic
    float reduction order. Values round to 6 decimals (the repo-wide
    cross-engine float contract)."""
    in_dim = len(emb.select(vec_col).first()[0])
    signs = _rp_signs(out_dim, in_dim, salt)
    import math
    inv = 1.0 / math.sqrt(out_dim)
    srows = F.array(*[
        F.array(*[F.lit(s) for s in row]) for row in signs])
    x = F.col(vec_col)
    proj = F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda k: F.round(F.aggregate(
            F.zip_with(x, F.element_at(srows, (k + 1).cast("int")),
                       lambda xi, s: xi.cast("double") * s),
            F.lit(0.0), lambda a, v: a + v) * inv, 6))
    return emb.select(F.col(id_col).alias("vec_id"),
                      proj.alias("projected"))
