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
    # zero-norm guard: 0/0 would yield NaN, and Spark sorts NaN as the
    # GREATEST double — an all-zero embedding would otherwise become the
    # rank-1 neighbor of every query. Defined as sim 0.0 instead (mirrored
    # in the oracle SQL).
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query by cosine (query rows excluded from
    their own result). Output (query_id, neighbor_id, rank, sim)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    n = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("nv"))
    # query side explicitly broadcast: same bug class as l2_topk — when
    # queries are a filter over a large synthesized corpus, Spark's size
    # estimate follows the parent and the nested-loop join can buffer the
    # corpus side (driver OOM at millions of vectors)
    scored = (F.broadcast(q).join(n, F.col("query_id") != F.col("neighbor_id"))
              .withColumn("sim", cosine(F.col("qv"), F.col("nv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim", 6).alias("sim")))


def _plane(p: int, dim: int):
    """Deterministic pseudo-random hyperplane p: component d is
    ((p*131 + d*31 + 7) % 97) - 48 (zero-mean ints) — a fixed recurrence the
    DuckDB oracle reproduces exactly."""
    return F.array(*[F.lit(float((p * 131 + d * 31 + 7) % 97 - 48))
                     for d in range(dim)])


def hyperplane_buckets(embeddings: DataFrame, n_planes: int = 4,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       dim: int = 64) -> DataFrame:
    """Single-signature random-hyperplane LSH bucket per vector (sign bits of
    ``n_planes`` dot products). Kept as the simple building block; the scale
    path for candidate generation is ``hyperplane_band_buckets`` (banded
    OR-of-bands, bounded per-bucket fan-out)."""
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    bucket = None
    for p in range(n_planes):
        bit = (_dot(F.col("v"), _plane(p, dim)) >= 0).cast("long") * (2 ** p)
        bucket = bit if bucket is None else bucket + bit
    return e.withColumn("bucket", bucket)


def hyperplane_band_buckets(embeddings: DataFrame, n_planes: int = 16,
                            n_bands: int = 4, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            dim: int = 64) -> DataFrame:
    """Banded multi-plane signatures: ``n_planes`` sign bits split into
    ``n_bands`` bands of n_planes/n_bands bits each → one (vec_id, band,
    bucket) row per band. Candidate pairs agree on the FULL bit pattern of at
    least one band (OR-of-bands), so per-(band, bucket) blocks shrink
    geometrically with bits-per-band while multiple bands keep recall up —
    the same banding trade-off as minhash LSH. All JVM expressions."""
    assert n_planes % n_bands == 0, "n_planes must divide into n_bands"
    ppb = n_planes // n_bands
    e = embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("v"))
    bits = [(_dot(F.col("v"), _plane(p, dim)) >= 0).cast("long")
            for p in range(n_planes)]
    band_buckets = []
    for b in range(n_bands):
        acc = None
        for j in range(ppb):
            term = bits[b * ppb + j] * (2 ** j)
            acc = term if acc is None else acc + term
        band_buckets.append(acc)
    return (e.select("vec_id", "v", F.posexplode(F.array(*band_buckets))
                     .alias("band", "bucket")))


def lsh_ann_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                 n_planes: int = 32, n_bands: int = 8, id_col: str = "vec_id",
                 vec_col: str = "embedding", dim: int = 64,
                 multiprobe: bool = False) -> DataFrame:
    """Approximate top-k: candidates share >=1 full band bucket with the
    query (banded multi-plane OR-of-bands). Candidate generation joins
    id+band+bucket rows only (no vectors through the shuffle); vectors are
    joined back per distinct candidate pair before scoring. Same output shape
    as cosine_topk; recall < 1 by design — the oracle mirrors the exact
    bucketing, verifying the implementation, while BENCH reports measured
    recall vs the exact baseline.

    Tuning (measured sweep in BENCH/BASELINE.md): bits-per-band fixes the
    per-(band,bucket) block size (4 bits → n/16 blocks — the scale knob);
    band count buys recall linearly in candidate work (the recall knob).
    Default 32x8 doubles the bands of the 16x4 baseline at the same block
    size: worst-case (random-vector) recall@3 0.38 → 0.50.

    ``multiprobe``: additionally probe every Hamming-1 neighbor of each QUERY
    band bucket (the classic multiprobe-LSH trick — a near neighbor that
    disagrees on exactly one plane of a band still surfaces). Query-side
    fan-out multiplies by bits_per_band+1; the neighbor side is untouched, so
    for small query sets this buys recall almost for free (measured 0.50 →
    0.83 on the worst-case random corpus)."""
    ppb = n_planes // n_bands
    bb = hyperplane_band_buckets(embeddings, n_planes, n_bands,
                                 id_col, vec_col, dim)
    # query buckets are computed from the QUERIES frame's own vectors (not
    # semi-joined out of the corpus): identical values for in-corpus
    # queries, and out-of-corpus query vectors get real neighbors instead
    # of a silent empty result
    qb = (hyperplane_band_buckets(queries, n_planes, n_bands,
                                  id_col, vec_col, dim)
          .select(F.col("vec_id").alias("query_id"), "band", "bucket"))
    if multiprobe:
        probes = F.array(F.col("bucket"),
                         *[F.col("bucket").bitwiseXOR(F.lit(1 << j))
                           for j in range(ppb)])
        qb = qb.select("query_id", "band",
                       F.explode(probes).alias("bucket"))
    nb = bb.select(F.col("vec_id").alias("neighbor_id"), "band", "bucket")
    cand = (qb.join(nb, ["band", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id").distinct())
    ev_q = queries.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("qv"))
    ev_n = embeddings.select(F.col(id_col).alias("neighbor_id"),
                             F.col(vec_col).alias("nv"))
    scored = (cand.join(F.broadcast(ev_q), "query_id")
              .join(ev_n, "neighbor_id")
              .withColumn("sim", cosine(F.col("qv"), F.col("nv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim", 6).alias("sim")))


def _centroid(c: int, dim: int):
    """Deterministic pseudo-random IVF centroid c: component d is
    ((c*257 + d*37 + 11) % 101) - 50 — a fixed recurrence (distinct from the
    hyperplane one) the DuckDB oracle reproduces exactly. Real deployments
    train the quantizer — :func:`ivf_ann_topk_trained` does (k-means
    centroids; recall@3 0.42 → 0.92 on the bench embeddings at the same
    probe budget); the search topology (coarse quantizer → nprobe cells →
    in-cell scan) is identical."""
    return [float((c * 257 + d * 37 + 11) % 101 - 50) for d in range(dim)]


def ivf_cells(embeddings: DataFrame, n_cells: int = 16,
              id_col: str = "vec_id", vec_col: str = "embedding",
              dim: int = 64) -> DataFrame:
    """IVF coarse quantization: (vec_id, cell) with cell = argmax over
    centroids of dot(v, centroid) (first index wins ties). Pure JVM
    expressions; at scale this is the partitioning column of the vector
    table, so a cell probe is a partition-pruned scan."""
    e = embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("v"))
    dots = F.array(*[
        _dot(F.col("v"), F.array(*[F.lit(x) for x in _centroid(c, dim)]))
        for c in range(n_cells)
    ])
    # array_position is 1-based; first occurrence wins ties in both engines
    return (e.withColumn("_dots", dots)
            .withColumn("cell",
                        (F.array_position(F.col("_dots"),
                                          F.array_max(F.col("_dots"))) - 1)
                        .cast("long"))
            .select("vec_id", "v", "cell"))


def ivf_ann_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                 n_cells: int = 16, nprobe: int = 4, id_col: str = "vec_id",
                 vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """IVF approximate top-k: each query probes its ``nprobe``
    highest-scoring cells and scans only the vectors assigned there —
    corpus-side work drops to ~nprobe/n_cells of brute force, and on a
    cell-partitioned table the probe is a partition-pruned scan. Output
    shape matches cosine_topk; the oracle mirrors the quantizer exactly."""
    cells = ivf_cells(embeddings, n_cells, id_col, vec_col, dim)
    # query vectors come from the queries frame itself (see lsh_ann_topk)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    qdots = F.array(*[
        _dot(F.col("qv"), F.array(*[F.lit(x) for x in _centroid(c, dim)]))
        for c in range(n_cells)
    ])
    cell_ids = F.array(*[F.lit(c).cast("long") for c in range(n_cells)])
    ranked = F.array_sort(
        F.arrays_zip(qdots.alias("d"), cell_ids.alias("c")),
        lambda a, b: F.when(a["d"] > b["d"], -1)
                      .when(a["d"] < b["d"], 1)
                      .otherwise(F.when(a["c"] < b["c"], -1).otherwise(1)))
    probe = (q.withColumn("_r", ranked)
             .select("query_id", "qv",
                     F.explode(F.slice(F.col("_r"), 1, nprobe)).alias("pc"))
             .select("query_id", "qv", F.col("pc.c").alias("cell")))
    n = cells.select(F.col("vec_id").alias("neighbor_id"),
                     F.col("v").alias("nv"), "cell")
    # probed-cell rows (nprobe per query) broadcast into the cell
    # equi-join — the corpus side never shuffles (matches the trained
    # variant's hinted plan)
    scored = (F.broadcast(probe).join(n, "cell")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("sim", cosine(F.col("qv"), F.col("nv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim", 6).alias("sim")))


def ivf_ann_topk_trained(embeddings: DataFrame, queries: DataFrame,
                         k: int = 3, n_cells: int = 16, nprobe: int = 4,
                         n_iters: int = 2, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         dim: int = 64) -> DataFrame:
    """IVF top-k with a TRAINED coarse quantizer: cells come from
    deterministic Lloyd centroids (:func:`kmeans.kmeans_centroids`) instead
    of the fixed pseudo-random recurrence, so the inverted lists follow the
    data distribution — the same upgrade that took PQ recall from 0.03 to
    0.87. Search topology is identical to :func:`ivf_ann_topk`: each query
    probes its ``nprobe`` nearest centroids (squared L2, ties to the
    smaller cell id) and scans only the vectors assigned there; output
    shape matches cosine_topk.

    Scale shape: the centroids collapse to one broadcast row; corpus
    assignment is a scan-speed argmin projection (at scale it is the
    partitioning column of the vector table, making a probe a
    partition-pruned scan); per-query work is nprobe inverted lists.
    Pipelines issuing many query batches should materialize the
    centroid/assignment tables once (the training lineage otherwise
    re-executes per use). Bit-for-bit DuckDB oracle twin in
    ``__spark_entry__.oracle_sql['ivf_ann_topk_trained']``."""
    from supercrawler_spark.operators.kmeans import (_assign, _prep,
                                                     kmeans_centroids)
    cents = kmeans_centroids(embeddings, n_cells, n_iters, dim,
                             id_col, vec_col)
    e = _prep(embeddings, dim, id_col, vec_col)
    cells = (_assign(e, cents)
             .select(F.col("vec_id").alias("neighbor_id"),
                     F.col("ev").alias("nv"), "cell"))
    one_row = cents.agg(F.collect_list(F.struct("cell", "cv")).alias("cs"))
    q = _prep(queries, dim, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), F.col("ev").alias("qv"))
    ranked = F.array_sort(F.transform(
        F.col("cs"),
        lambda c: F.struct(
            F.aggregate(F.zip_with(F.col("qv"), c["cv"],
                                   lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0), lambda acc, v: acc + v).alias("dist"),
            c["cell"].alias("cell"))))
    probe = (q.crossJoin(F.broadcast(one_row))
             .select("query_id", "qv",
                     F.explode(F.slice(ranked, 1, nprobe)).alias("pc"))
             .select("query_id", "qv", F.col("pc.cell").alias("cell")))
    # nprobe rows per query broadcast into the cell equi-join — the
    # corpus-side cell table never shuffles
    scored = (F.broadcast(probe).join(cells, "cell")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("sim", cosine(F.col("qv"), F.col("nv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim", 6).alias("sim")))


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        n_planes: int = 16, n_bands: int = 4,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        dim: int = 64,
                        max_bucket_size: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a_id < b_id, sim >= threshold),
    LSH-BLOCKED: candidates are generated through banded hyperplane buckets
    (never an all-pairs theta join), deduped to distinct id pairs, then
    scored once per pair with the vectors hash-joined back in. Per-(band,
    bucket) fan-out is ~ (n / 2^bits_per_band)^2 per band — bounded and
    tunable, vs the n^2/2 of a cartesian. Recall < 1 by design (high-cosine
    pairs agree on most sign bits, so banding catches them with high
    probability); the oracle mirrors the same bucketing."""
    bb = hyperplane_band_buckets(embeddings, n_planes, n_bands,
                                 id_col, vec_col, dim)
    if max_bucket_size is not None:
        # mega-cluster guard (same pattern as dedup.minhash_lsh_pairs):
        # a (band, bucket) block of k members yields k^2/2 pair rows — drop
        # over-crowded blocks before the self-join; the count window costs
        # one extra narrow (vec_id, band, bucket) shuffle per side, cheap
        # against the blocked k^2 explosion
        wsz = Window.partitionBy("band", "bucket")
        bb = (bb.withColumn("_bsz", F.count("*").over(wsz))
              .filter(F.col("_bsz") <= max_bucket_size).drop("_bsz"))
    a = bb.select(F.col("vec_id").alias("a_id"), "band", "bucket")
    b = bb.select(F.col("vec_id").alias("b_id"), "band", "bucket")
    pairs = (a.join(b, ["band", "bucket"])
             .filter(F.col("a_id") < F.col("b_id"))
             .select("a_id", "b_id").distinct())
    ea = embeddings.select(F.col(id_col).alias("a_id"),
                           F.col(vec_col).alias("av"))
    eb = embeddings.select(F.col(id_col).alias("b_id"),
                           F.col(vec_col).alias("bv"))
    return (pairs.join(ea, "a_id").join(eb, "b_id")
            .withColumn("sim", F.round(cosine(F.col("av"), F.col("bv")), 6))
            .filter(F.col("sim") >= threshold)
            .select("a_id", "b_id", "sim"))


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-compressed ANN scale path
# ---------------------------------------------------------------------------

def _pq_centroid(c: int, j: int) -> float:
    """Deterministic pseudo-random PQ codebook entry: code ``c``'s component
    at GLOBAL dim index ``j`` is ((c*193 + j*29 + 7) % 89) - 44 — a fixed
    recurrence (distinct from the hyperplane and IVF ones) the DuckDB
    oracle reproduces exactly, scaled by /88 so the codebook spans the
    embedding table's ~[-0.5, 0.5] value range (a codebook out of data
    scale degenerates: every vector takes the min-norm code). Real
    deployments train the codebooks with per-subspace k-means; the search
    topology (encode → ADC tables → compressed-scan top-k) is
    identical."""
    return float((c * 193 + j * 29 + 7) % 89 - 44) / 88.0


def _pq_sub_dists(vec_col, m: int, ds: int, k_codes: int):
    """array of squared-L2 distances from the vector's m-th subvector to
    each of the ``k_codes`` codebook entries. The codebook is a LITERAL
    array-of-arrays looped over with transform/zip_with/aggregate — a
    compact expression tree (a fully unrolled k_codes×ds literal sum blows
    past janino's 64KB method limit and drops the whole stage to
    interpreted eval). Ascending-j left-fold sums, bit-identical to the
    oracle's list_sum(list_transform(...))."""
    codebook = F.array(*[
        F.array(*[F.lit(_pq_centroid(c, j))
                  for j in range(m * ds, (m + 1) * ds)])
        for c in range(k_codes)
    ])
    sub = F.slice(vec_col, m * ds + 1, ds)
    return F.transform(
        codebook,
        lambda cent: F.aggregate(
            F.zip_with(sub, cent,
                       lambda x, cc: (x.cast("double") - cc)
                       * (x.cast("double") - cc)),
            F.lit(0.0), lambda acc, v: acc + v))


def pq_codes(embeddings: DataFrame, m_sub: int = 4, k_codes: int = 16,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64) -> DataFrame:
    """PQ encoding: (vec_id, codes array<long> of length m_sub) with
    codes[m] = argmin over the m-th subspace codebook (first index wins
    ties in both engines via 1-based array_position of the min). The codes
    table is the COMPRESSED representation — m_sub small ints per vector
    instead of dim floats (64x smaller at 4x16 over 64 float dims) — which
    is what lets a 10^10-vector corpus be scanned from memory. Encoding is
    a pure projection at scan speed."""
    assert dim % m_sub == 0
    ds = dim // m_sub
    e = embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("v"))
    # project each subspace's distance array ONCE as a named column, then
    # argmin over the column — building the 16x16-term tree inside both
    # array_position and array_min would double the codegen input this
    # function is already keeping under janino's method-size limit
    d = e.select("vec_id", *[
        _pq_sub_dists(F.col("v"), m, ds, k_codes).alias(f"_d{m}")
        for m in range(m_sub)
    ])
    codes = F.array(*[
        (F.array_position(F.col(f"_d{m}"), F.array_min(F.col(f"_d{m}")))
         - 1).cast("long")
        for m in range(m_sub)
    ])
    return d.select("vec_id", codes.alias("codes"))


def pq_ann_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                m_sub: int = 4, k_codes: int = 16, id_col: str = "vec_id",
                vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """PQ asymmetric-distance (ADC) approximate top-k: each query computes
    one distance table per subspace (k_codes squared-L2 values against the
    codebook), then every corpus vector is scored from its CODES alone —
    approx_dist = sum over subspaces of table[m][codes[m]] — without ever
    touching the original floats. Output (query_id, neighbor_id, rank,
    adist); rank orders by ascending approximate distance, neighbor id as
    tie-break.

    Scale shape: the query-side tables are per-query literals (queries
    broadcast), the corpus side scans the m_sub-byte codes table — the
    memory-bandwidth-bound design point of PQ search — and the only
    exchange is the per-query top-k rank window (WindowGroupLimit prunes
    map-side). No corpus shuffle, no vector-width data movement."""
    assert dim % m_sub == 0
    ds = dim // m_sub
    codes = pq_codes(embeddings, m_sub, k_codes, id_col, vec_col, dim)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    tables = [_pq_sub_dists(F.col("qv"), m, ds, k_codes)
              for m in range(m_sub)]
    qt = q.select("query_id",
                  *[t.alias(f"_t{m}") for m, t in enumerate(tables)])
    n = codes.select(F.col("vec_id").alias("neighbor_id"), "codes")
    adist = None
    for m in range(m_sub):
        term = F.element_at(
            F.col(f"_t{m}"),
            (F.element_at(F.col("codes"), m + 1) + 1).cast("int"))
        adist = term if adist is None else adist + term
    scored = (F.broadcast(qt).crossJoin(n)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("adist", adist))
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("adist", 6).alias("adist")))


def pq_train_codebooks(embeddings: DataFrame, m_sub: int = 4,
                       k_codes: int = 16, n_iters: int = 2, dim: int = 64,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Per-subspace PQ codebooks trained with the same deterministic Lloyd
    rounds as :func:`kmeans.kmeans_assign` — init from the ``k_codes``
    smallest vec_ids' subvectors, argmin ties to the smaller cell id,
    centroid means from 1e-6-scaled INTEGER component sums (combine-order
    independent), ``n_iters - 1`` update rounds. Returns (m, code, cv)
    with ``code`` the 0-based dense index of the centroid in cell-ascending
    order — fully declarative (no driver collect) and replayed bit-for-bit
    by the DuckDB oracle.

    Scale shape: training runs over a long-form (vec_id, m, sv) projection
    — one corpus scan per assignment pass shared by ALL subspaces; the
    per-subspace codebooks travel as an m_sub-row broadcast; the only
    exchange per round is the (m, cell) grouped integer-sum update
    (m_sub × k_codes × ds partial sums, map-side combined)."""
    assert dim % m_sub == 0
    ds = dim // m_sub
    ev = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    e = embeddings.select(F.col(id_col).alias("vec_id"), ev.alias("ev"))
    sub = (e.select("vec_id", F.explode(F.array(*[
        F.struct(F.lit(m).alias("m"),
                 F.slice("ev", m * ds + 1, ds).alias("sv"))
        for m in range(m_sub)])).alias("s"))
        .select("vec_id", F.col("s.m").alias("m"), F.col("s.sv").alias("sv")))
    seeds = e.orderBy("vec_id").limit(k_codes)
    cents = (seeds.select(F.explode(F.array(*[
        F.struct(F.lit(m).alias("m"), F.col("vec_id").alias("cell"),
                 F.slice("ev", m * ds + 1, ds).alias("cv"))
        for m in range(m_sub)])).alias("c"))
        .select("c.m", "c.cell", "c.cv"))

    def _sq(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                           F.lit(0.0), lambda acc, v: acc + v)

    def assign(centroids: DataFrame) -> DataFrame:
        cbs = (centroids.groupBy("m")
               .agg(F.sort_array(
                   F.collect_list(F.struct("cell", "cv"))).alias("cs")))
        best = F.array_min(F.transform(
            F.col("cs"),
            lambda c: F.struct(_sq(F.col("sv"), c["cv"]).alias("dist"),
                               c["cell"].alias("cell"))))
        return (sub.join(F.broadcast(cbs), "m")
                .select("vec_id", "m", "sv",
                        best.getField("cell").alias("cell")))

    for _ in range(n_iters - 1):
        a = assign(cents)
        sums = (a.groupBy("m", "cell")
                .agg(*[F.sum(F.floor(F.col("sv")[i] * 1_000_000 + 0.5)
                             .cast("long")).alias(f"_s{i}")
                       for i in range(ds)],
                     F.count("*").alias("_n")))
        cents = sums.select(
            "m", "cell",
            F.array(*[F.col(f"_s{i}") / (1_000_000.0 * F.col("_n"))
                      for i in range(ds)]).alias("cv"))
    cbs = (cents.groupBy("m")
           .agg(F.sort_array(F.collect_list(F.struct("cell", "cv")))
                .alias("cs")))
    return (cbs.select("m", F.posexplode("cs").alias("code", "c"))
            .select("m", F.col("code").cast("long").alias("code"),
                    F.col("c.cv").alias("cv")))


def pq_ann_topk_trained(embeddings: DataFrame, queries: DataFrame,
                        k: int = 3, m_sub: int = 4, k_codes: int = 16,
                        n_iters: int = 2, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        dim: int = 64,
                        rerank: int | None = None) -> DataFrame:
    """PQ ADC top-k with codebooks TRAINED on the data
    (:func:`pq_train_codebooks`) instead of the fixed span recurrence —
    same encode/ADC arithmetic, same output shape as :func:`pq_ann_topk`.
    The trained codebook is what makes PQ recall competitive: quantization
    cells follow the data distribution rather than a fixed grid.

    ``rerank=R`` adds the standard ADC-shortlist + exact-rerank stage:
    the compressed scan produces a per-query top-R shortlist, the R
    original vectors are fetched back by an id equi-join (R rows per
    query — the only full-width reads), and exact squared-L2 re-ranks the
    final top-k. Output becomes (query_id, neighbor_id, rank, d2). This
    is how production PQ systems (IVF-ADC) close the quantization-recall
    gap while still scanning only codes: measured recall@3 on the
    worst-case random bench embeddings (sf0.1, 2000 vectors) 0.03 (fixed
    codebook) → 0.73 (trained 32 codes/1 Lloyd round + rerank 32) →
    **0.92** (trained 64 codes/5 rounds + rerank 32). Extra Lloyd rounds
    and codes cost ONLY offline training scans — the query-time budget
    (16 codes scanned per vector, 32 rerank fetches) is unchanged, which
    is why deeper training is the right recall lever at 10^10 vectors.

    The codebook collapses to ONE broadcast row (m_sub arrays of
    k_codes × ds doubles); corpus encoding stays a scan-speed projection
    and queries stay broadcast — identical scale shape to the fixed-
    codebook path. Pipelines reusing the codebook across many query
    batches should persist/materialize ``pq_train_codebooks`` output
    first (the training lineage otherwise re-executes per use)."""
    assert dim % m_sub == 0
    ds = dim // m_sub
    cb = pq_train_codebooks(embeddings, m_sub, k_codes, n_iters, dim,
                            id_col, vec_col)
    # one row: _cb{m} = array of centroid arrays ordered by code
    onerow = cb.groupBy().agg(*[
        F.transform(
            F.sort_array(F.collect_list(
                F.when(F.col("m") == m, F.struct("code", "cv")))),
            lambda s: s["cv"]).alias(f"_cb{m}")
        for m in range(m_sub)])

    def sub_dists(vec_col_, m):
        sub = F.slice(vec_col_, m * ds + 1, ds)
        return F.transform(
            F.col(f"_cb{m}"),
            lambda cent: F.aggregate(
                F.zip_with(sub, cent,
                           lambda x, cc: (x.cast("double") - cc)
                           * (x.cast("double") - cc)),
                F.lit(0.0), lambda acc, v: acc + v))

    e = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("nv"))
    enc = e.crossJoin(F.broadcast(onerow)).select(
        "neighbor_id", *[sub_dists(F.col("nv"), m).alias(f"_d{m}")
                         for m in range(m_sub)])
    codes = F.array(*[
        (F.array_position(F.col(f"_d{m}"), F.array_min(F.col(f"_d{m}")))
         - 1).cast("long")
        for m in range(m_sub)])
    n = enc.select("neighbor_id", codes.alias("codes"))

    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    qt = q.crossJoin(F.broadcast(onerow)).select(
        "query_id", *[sub_dists(F.col("qv"), m).alias(f"_t{m}")
                      for m in range(m_sub)])
    adist = None
    for m in range(m_sub):
        term = F.element_at(
            F.col(f"_t{m}"),
            (F.element_at(F.col("codes"), m + 1) + 1).cast("int"))
        adist = term if adist is None else adist + term
    scored = (F.broadcast(qt).crossJoin(n)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("adist", adist))
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"),
                                               F.asc("neighbor_id"))
    if rerank is None:
        return (scored.withColumn("rank",
                                  F.row_number().over(w).cast("long"))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank",
                        F.round("adist", 6).alias("adist")))
    shortlist = (scored.withColumn("_srank", F.row_number().over(w))
                 .filter(F.col("_srank") <= rerank)
                 .select("query_id", "neighbor_id"))
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("qv"))
    nv = embeddings.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("nv"))
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("nv"),
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, v: acc + v)
    # R rows/query: ALWAYS the broadcast side of the vector fetch — at
    # millions of corpus vectors Spark's estimate for the synthesized/
    # filtered corpus side can otherwise flip this to a sort-merge join
    # that shuffles every full-width vector (measured: a 723 MB stage at
    # 5M x 32d before the hint)
    rr = (F.broadcast(shortlist.join(F.broadcast(qv), "query_id"))
          .join(nv, "neighbor_id")
          .withColumn("d2", d2))
    w2 = Window.partitionBy("query_id").orderBy(F.asc("d2"),
                                                F.asc("neighbor_id"))
    return (rr.withColumn("rank", F.row_number().over(w2).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("d2", 6).alias("d2")))


def _ivfpq_dist_fns(m_sub: int, ds: int):
    """The two quantizer-distance expression builders shared by index
    build and query: ``sub_dists`` maps a vector's m-th subvector to its
    k_codes squared-L2 distances against codebook column ``_cb{m}``;
    ``cell_dists`` maps a vector to (dist, cell) structs against the
    coarse-centroid column ``cs``. Pure expression factories — the
    columns they reference come from the broadcast quantizer rows."""
    def sub_dists(vec_col_, m):
        sub = F.slice(vec_col_, m * ds + 1, ds)
        return F.transform(
            F.col(f"_cb{m}"),
            lambda cent: F.aggregate(
                F.zip_with(sub, cent,
                           lambda x, cc: (x.cast("double") - cc)
                           * (x.cast("double") - cc)),
                F.lit(0.0), lambda acc, v: acc + v))

    def cell_dists(vec_col_):
        return F.transform(
            F.col("cs"),
            lambda c: F.struct(
                F.aggregate(F.zip_with(vec_col_, c["cv"],
                                       lambda x, y: (x - y) * (x - y)),
                            F.lit(0.0), lambda acc, v: acc + v).alias("dist"),
                c["cell"].alias("cell")))
    return sub_dists, cell_dists


def ivfpq_index(embeddings: DataFrame, n_cells: int = 16, m_sub: int = 16,
                k_codes: int = 32, n_iters: int = 2,
                id_col: str = "vec_id", vec_col: str = "embedding",
                dim: int = 64
                ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """IVF-PQ index build — train both quantizers and encode the corpus.
    Returns ``(codes, cents_row, cb_row)``: the compressed code table
    (neighbor_id, cell, codes: array<long>) and the two one-row broadcast
    quantizer tables (coarse centroids / PQ codebooks) that
    :func:`ivfpq_query` needs. This is the index-once-query-many half of
    the production pattern: persist (or write) ``codes`` and the two
    quantizer rows, then answer every later query batch from them without
    re-touching corpus vectors — training cost is offline and amortized.

    Scale shape: corpus vectors are read by ONE scan that emits
    (cell, codes) under two broadcast quantizers; the code table is
    ~m_sub small ints per vector and cell-keyed, so it cell-partitions on
    write and a probe becomes a partition-pruned scan of compressed
    codes."""
    from supercrawler_spark.operators.kmeans import _prep, kmeans_centroids
    assert dim % m_sub == 0
    ds = dim // m_sub
    cents = kmeans_centroids(embeddings, n_cells, n_iters, dim,
                             id_col, vec_col)
    cents_row = cents.agg(F.collect_list(F.struct("cell", "cv")).alias("cs"))
    cb = pq_train_codebooks(embeddings, m_sub, k_codes, n_iters, dim,
                            id_col, vec_col)
    cb_row = cb.groupBy().agg(*[
        F.transform(
            F.sort_array(F.collect_list(
                F.when(F.col("m") == m, F.struct("code", "cv")))),
            lambda s: s["cv"]).alias(f"_cb{m}")
        for m in range(m_sub)])
    sub_dists, cell_dists = _ivfpq_dist_fns(m_sub, ds)
    # ONE corpus scan under both broadcast quantizers -> (cell, codes)
    e = _prep(embeddings, dim, id_col, vec_col)
    enc = (e.crossJoin(F.broadcast(cents_row)).crossJoin(F.broadcast(cb_row))
           .select(F.col("vec_id").alias("neighbor_id"),
                   F.array_min(cell_dists(F.col("ev")))
                   .getField("cell").alias("cell"),
                   *[sub_dists(F.col("ev"), m).alias(f"_d{m}")
                     for m in range(m_sub)]))
    codes = F.array(*[
        (F.array_position(F.col(f"_d{m}"), F.array_min(F.col(f"_d{m}")))
         - 1).cast("long")
        for m in range(m_sub)])
    return (enc.select("neighbor_id", "cell", codes.alias("codes")),
            cents_row, cb_row)


def ivfpq_ann_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                   n_cells: int = 16, nprobe: int = 4, m_sub: int = 16,
                   k_codes: int = 32, n_iters: int = 2,
                   rerank: int | None = 32, id_col: str = "vec_id",
                   vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """IVF-PQ top-k — the production ANN composition (FAISS ``IVFPQ`` with
    ``by_residual=False``): a TRAINED coarse quantizer restricts the scan
    to ``nprobe`` inverted lists, a TRAINED product quantizer scores the
    survivors by ADC table lookups over their codes (never their vectors),
    and an exact squared-L2 rerank over the per-query shortlist closes the
    quantization gap. Output (query_id, neighbor_id, rank, d2); with
    ``rerank=None`` the ADC order is final and the column is ``adist``.

    One-shot composition of :func:`ivfpq_index` + :func:`ivfpq_query`
    (index-once-query-many callers persist the index half instead).
    At 10^10 vectors the code table is ~m_sub bytes/vector and
    cell-partitioned, so a probe is a partition-pruned scan of compressed
    codes; only the rerank's R rows per query ever fetch original vectors
    back. Bit-for-bit DuckDB oracle twin in
    ``__spark_entry__.oracle_sql['ivfpq_ann_topk']``; measured at 1M+
    synthesized vectors in bench.py's ``ann_rehearsal`` cell."""
    n, cents_row, cb_row = ivfpq_index(embeddings, n_cells, m_sub, k_codes,
                                       n_iters, id_col, vec_col, dim)
    return ivfpq_query(n, cents_row, cb_row, embeddings, queries, k=k,
                       nprobe=nprobe, m_sub=m_sub, rerank=rerank,
                       id_col=id_col, vec_col=vec_col, dim=dim)


def ivfpq_query(codes: DataFrame, cents_row: DataFrame, cb_row: DataFrame,
                embeddings: DataFrame, queries: DataFrame, k: int = 3,
                nprobe: int = 4, m_sub: int = 16,
                rerank: int | None = 32, id_col: str = "vec_id",
                vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Query half of IVF-PQ against a prebuilt :func:`ivfpq_index`:
    per query, probe the ``nprobe`` nearest coarse cells, ADC-score that
    slice of the code table from the query's per-subspace distance
    tables, and (optionally) exact-rerank the top-``rerank`` shortlist —
    ``embeddings`` is only touched for those R full-width fetches per
    query (pass the same corpus the index was built from).

    Scale shape: the probed-cell rows (nprobe per query, carrying the ADC
    tables) broadcast into a cell equi-join — the corpus-side code table
    never shuffles; per-query top-k is a WindowGroupLimit-pruned rank."""
    from supercrawler_spark.operators.kmeans import _prep
    assert dim % m_sub == 0
    ds = dim // m_sub
    sub_dists, cell_dists = _ivfpq_dist_fns(m_sub, ds)
    n = codes

    # queries: probed cells carry the per-query ADC tables (nprobe small
    # rows per query — broadcast side of the cell join)
    q = _prep(queries, dim, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), F.col("ev").alias("qv"))
    qx = (q.crossJoin(F.broadcast(cents_row)).crossJoin(F.broadcast(cb_row))
          .select("query_id",
                  F.explode(F.slice(F.array_sort(cell_dists(F.col("qv"))),
                                    1, nprobe)).alias("pc"),
                  *[sub_dists(F.col("qv"), m).alias(f"_t{m}")
                    for m in range(m_sub)])
          .select("query_id", F.col("pc.cell").alias("cell"),
                  *[f"_t{m}" for m in range(m_sub)]))
    adist = None
    for m in range(m_sub):
        term = F.element_at(
            F.col(f"_t{m}"),
            (F.element_at(F.col("codes"), m + 1) + 1).cast("int"))
        adist = term if adist is None else adist + term
    scored = (F.broadcast(qx).join(n, "cell")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("adist", adist))
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"),
                                               F.asc("neighbor_id"))
    if rerank is None:
        return (scored.withColumn("rank",
                                  F.row_number().over(w).cast("long"))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank",
                        F.round("adist", 6).alias("adist")))
    shortlist = (scored.withColumn("_srank", F.row_number().over(w))
                 .filter(F.col("_srank") <= rerank)
                 .select("query_id", "neighbor_id"))
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("qv"))
    nv = embeddings.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("nv"))
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("nv"),
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, v: acc + v)
    # R rows/query: ALWAYS the broadcast side of the vector fetch — at
    # millions of corpus vectors Spark's estimate for the synthesized/
    # filtered corpus side can otherwise flip this to a sort-merge join
    # that shuffles every full-width vector (measured: a 723 MB stage at
    # 5M x 32d before the hint)
    rr = (F.broadcast(shortlist.join(F.broadcast(qv), "query_id"))
          .join(nv, "neighbor_id")
          .withColumn("d2", d2))
    w2 = Window.partitionBy("query_id").orderBy(F.asc("d2"),
                                                F.asc("neighbor_id"))
    return (rr.withColumn("rank", F.row_number().over(w2).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("d2", 6).alias("d2")))


def l2_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query by ascending squared-L2 distance —
    the metric-matched exact baseline for ``pq_ann_topk`` (PQ quantizes
    L2, not cosine; comparing its recall against a cosine baseline would
    conflate metric disagreement with quantization loss). Output
    (query_id, neighbor_id, rank, d2).

    The query side carries an explicit broadcast hint: it is
    definitionally the small side of a brute-force scan, but when it is
    derived by a filter over a large synthesized/scanned corpus Spark's
    size estimate follows the PARENT relation, and a nested-loop join
    that buffers the corpus side OOMs at millions of vectors (observed at
    1M x 32d on an 8g driver before the hint)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    n = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("nv"))
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("nv"),
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, v: acc + v)
    scored = (F.broadcast(q).join(n, F.col("query_id") != F.col("neighbor_id"))
              .withColumn("d2", d2))
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("d2", 6).alias("d2")))


def hard_negatives(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                   lo: float = 0.1, hi: float = 0.9,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Contrastive-training hard-negative mining: per query, the top-k
    MOST similar neighbors whose cosine falls in the band [lo, hi) —
    above ``hi`` is a near-duplicate/positive (excluded so the miner never
    labels a paraphrase as a negative), below ``lo`` is an easy negative
    the loss learns nothing from. Output (query_id, neighbor_id, rank,
    sim), rank over the banded candidates.

    The band test uses the 6-decimal ROUNDED sim (same rounding as the
    output column and the DuckDB oracle), so boundary vectors land on the
    same side in both engines regardless of double-accumulation order.

    Scale: queries broadcast (the mining batch is small per job); the
    candidate scan is embarrassingly parallel over the embeddings
    partitions and the per-query window ranks only banded survivors. For
    whole-corpus mining (every doc needs negatives), generate candidates
    with the banded-LSH shortlist instead and feed it through
    ``rerank_negatives`` — same band/rank contract applied to any
    (query_id, neighbor_id, sim) candidate table.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    n = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("nv"))
    scored = (F.broadcast(q).join(n, F.col("query_id") != F.col("neighbor_id"))
              .withColumn("sim", F.round(cosine(F.col("qv"), F.col("nv")), 6))
              .select("query_id", "neighbor_id", "sim"))
    return rerank_negatives(scored, k=k, lo=lo, hi=hi)


def rerank_negatives(candidates: DataFrame, k: int = 3, lo: float = 0.1,
                     hi: float = 0.9) -> DataFrame:
    """Band-filter + rerank any (query_id, neighbor_id, sim) candidate
    table into hard negatives — the composition point for ANN shortlists
    (``lsh_ann_topk``/``ivf_ann_topk`` with a larger k) at corpus scale.
    The window ranks at most the banded shortlist per query, never the
    corpus."""
    banded = candidates.filter((F.col("sim") >= lo) & (F.col("sim") < hi))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               F.asc("neighbor_id"))
    return (banded.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", F.col("sim")))
