"""Deterministic Lloyd's k-means over an embedding column.

Clustering is the curation step the similarity operators don't cover:
cluster-balanced sampling, topic-mix accounting, and per-cluster quality
cuts all start from a k-means assignment of the corpus embeddings
(SemDeDup-style semantic dedup uses exactly this shape). This is textbook
Lloyd's with everything made deterministic so the DuckDB oracle can replay
it bit-for-bit: centroids initialize from the k smallest vector ids,
per-row distances accumulate in a fixed order, argmin ties break on the
cell id, and the centroid-mean update sums 1e-6-scaled INTEGER components
(like ``pagerank``'s micro-unit ranks) so the result is independent of
partial-aggregation combine order — a plain double AVG would drift in its
low bits with partitioning and could flip near-tie assignments.

Scale design: the k centroids collapse into a ONE-ROW array that is
broadcast against the embeddings scan, and the argmin is a per-row
``array_min`` over (dist, cell) structs — assignment is pure scan-speed
projection, no corpus-sized shuffle at all. The only exchange per iteration
is the centroid update: groupBy(cell) with ``dim`` map-side-combinable
integer sums, shuffling k x dim partials. The 1e6 scale bounds component
sums to ~|ev|·1e6·n_cell — safe in int64 up to ~10^12 unit-scale vectors
per cell. Iterations are unrolled into the plan (like ``pagerank``); for
big iteration counts persist the assignment between rounds — at the
default 2-3 the lineage is fine. No Python UDFs; exact DuckDB-oracle twin
in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SCALE = 1_000_000


def _sq_dist(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, v: acc + v)


def _prep(embeddings: DataFrame, dim: int, id_col: str,
          vec_col: str) -> DataFrame:
    """(vec_id, ev double-array) with a loud raise on length != dim (a
    silent zip_with mismatch would poison the update with NULLs)."""
    ev = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.when(F.size(F.col(vec_col)) == dim, ev).otherwise(F.raise_error(
            F.concat(F.lit(f"kmeans: embedding length != dim={dim}: "),
                     F.size(F.col(vec_col)).cast("string")))).alias("ev"))


def _assign(e: DataFrame, centroids: DataFrame) -> DataFrame:
    """argmin squared-L2 assignment under a broadcast one-row centroid
    array; ties break on the smaller cell id (struct lexicographic min)."""
    one_row = centroids.agg(
        F.collect_list(F.struct("cell", "cv")).alias("cs"))
    best = F.array_min(F.transform(
        F.col("cs"),
        lambda c: F.struct(_sq_dist(F.col("ev"), c["cv"]).alias("dist"),
                           c["cell"].alias("cell"))))
    return (e.crossJoin(F.broadcast(one_row))
            .select("vec_id", "ev", best.alias("s"))
            .select("vec_id", "ev", F.col("s.cell").alias("cell"),
                    F.col("s.dist").alias("dist")))


def kmeans_centroids(embeddings: DataFrame, k: int = 8, n_iters: int = 2,
                     dim: int = 64, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(cell, cv): the trained centroids after ``n_iters - 1`` mean
    updates, cells keyed by the seed vectors' ids. This is the reusable
    coarse quantizer — :func:`kmeans_assign` is an assignment under these,
    and ``similarity.ivf_ann_topk_trained`` probes them per query. Empty
    cells drop out of the update (both engines)."""
    e = _prep(embeddings, dim, id_col, vec_col)
    # k smallest ids — TakeOrderedAndProject, honest "first k by id" even
    # when ids are sparse or offset (filter(vec_id < k) would silently
    # under-seed such tables)
    cents = (e.orderBy("vec_id").limit(k)
             .select(F.col("vec_id").alias("cell"), F.col("ev").alias("cv")))
    for _ in range(n_iters - 1):
        a = _assign(e, cents)
        # order-independent mean: integer micro-unit sums, then one divide
        sums = (a.groupBy("cell")
                .agg(*[F.sum(F.floor(F.col("ev")[i] * _SCALE + 0.5)
                             .cast("long")).alias(f"_s{i}")
                       for i in range(dim)],
                     F.count("*").alias("_n")))
        cents = sums.select(
            "cell",
            F.array(*[F.col(f"_s{i}") / (float(_SCALE) * F.col("_n"))
                      for i in range(dim)]).alias("cv"))
    return cents


def kmeans_assign(embeddings: DataFrame, k: int = 8, n_iters: int = 2,
                  dim: int = 64, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cell, dist): cluster assignment after ``n_iters`` Lloyd
    rounds (assign -> mean-update between rounds; the returned assignment is
    under the last updated centroids, i.e. :func:`kmeans_centroids`).
    ``dist`` is the squared L2 distance to the winning centroid, rounded to
    6 decimals. If the table has fewer than ``k`` rows, that many centroids
    are used."""
    e = _prep(embeddings, dim, id_col, vec_col)
    cents = kmeans_centroids(embeddings, k, n_iters, dim, id_col, vec_col)
    a = _assign(e, cents)
    return a.select("vec_id", "cell", F.round("dist", 6).alias("dist"))


def semdedup(embeddings: DataFrame, k: int = 8, n_iters: int = 2,
             threshold: float = 0.95, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int = 64,
             assignment: DataFrame | None = None,
             max_cell_size: int | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic near-duplicate pairs:
    (a_id, b_id, cell, sim) for every within-cluster pair whose cosine
    similarity clears ``threshold``, with clusters from
    :func:`kmeans_assign`. Downstream keeps ``min(a_id)`` per duplicate
    group (or argmax quality via ``clusters.resolve_duplicates``).

    The k-means cells are the blocking structure — pairs are only scored
    INSIDE a cell, so the corpus-wide O(n²) cosine matrix never exists. At
    scale pick ``k ~ n / target_cell_size`` (the paper uses ~50k clusters
    for LAION); ``max_cell_size`` guards runaway cells the same way
    ``embedding_near_dups`` guards hot LSH buckets. Pipelines that already
    ran :func:`kmeans_assign` should pass the (persisted) ``assignment``
    in — otherwise the unrolled Lloyd lineage executes once per side of the
    self-join.
    """
    from supercrawler_spark.operators.similarity import cosine
    if assignment is None:
        assignment = kmeans_assign(embeddings, k, n_iters, dim=dim,
                                   id_col=id_col, vec_col=vec_col)
    m = (embeddings
         .select(F.col(id_col).alias("vec_id"),
                 F.transform(F.col(vec_col),
                             lambda x: x.cast("double")).alias("v"))
         .join(assignment.select("vec_id", "cell"), "vec_id"))
    if max_cell_size is not None:
        from pyspark.sql import Window
        wsz = Window.partitionBy("cell")
        m = (m.withColumn("_csz", F.count("*").over(wsz))
             .filter(F.col("_csz") <= max_cell_size).drop("_csz"))
    a = m.select(F.col("vec_id").alias("a_id"), "cell",
                 F.col("v").alias("av"))
    b = m.select(F.col("vec_id").alias("b_id"), "cell",
                 F.col("v").alias("bv"))
    return (a.join(b, "cell")
            .filter(F.col("a_id") < F.col("b_id"))
            .withColumn("sim", F.round(cosine(F.col("av"), F.col("bv")), 6))
            .filter(F.col("sim") >= threshold)
            .select("a_id", "b_id", "cell", "sim"))
