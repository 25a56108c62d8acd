"""hash_embed: deterministic hashing-trick embeddings."""

import hashlib

from pyspark.sql import functions as F

from supercrawler_spark.operators.embed import hash_embed


def _expected_vec(text, dim=64):
    vec = [0] * dim
    for tok in text.strip().split():
        h = hashlib.md5(tok.encode()).hexdigest()
        b = int(h[:8], 16) % dim
        s = 1 if int(h[8], 16) % 2 == 0 else -1
        vec[b] += s
    return vec


def test_hash_embed_matches_hand_hash(spark):
    texts = ["alpha beta gamma alpha", "delta", "alpha beta gamma alpha"]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    out = {r["doc_id"]: list(r["embedding"])
           for r in hash_embed(docs, dim=64).collect()}
    for i, t in enumerate(texts):
        assert out[i] == _expected_vec(t)
    # identical text -> identical vector; different text differs
    assert out[0] == out[2] != out[1]
    assert len(out[0]) == 64
    # signed-count mass: L1 norm <= token count
    assert sum(map(abs, out[0])) <= 4


def test_hash_embed_feeds_kmeans_and_partition_invariant(spark):
    from supercrawler_spark.operators.kmeans import kmeans_assign
    docs = spark.createDataFrame(
        [(i, ("spark shuffle join " if i % 2 else "crawl fetch parse ") * 5)
         for i in range(20)], "doc_id long, text string")
    # persisted before composing into kmeans — the documented contract
    # (unpersisted, the optimizer inlines the wide embed expression into
    # every per-dimension term; see the module docstring)
    emb = hash_embed(docs, dim=64).withColumnRenamed("doc_id", "vec_id") \
        .persist()
    emb2 = hash_embed(docs.repartition(7), dim=64) \
        .withColumnRenamed("doc_id", "vec_id")
    assert sorted(map(tuple, emb.collect())) == \
        sorted(map(tuple, emb2.collect()))
    cells = {r["vec_id"]: r["cell"] for r in
             kmeans_assign(emb.select(
                 "vec_id",
                 F.transform("embedding",
                             lambda x: x.cast("float")).alias("embedding")),
                 k=2, n_iters=2).collect()}
    emb.unpersist()
    # the two text templates land in two clean clusters
    assert len({cells[i] for i in range(0, 20, 2)}) == 1
    assert len({cells[i] for i in range(1, 20, 2)}) == 1
    assert cells[0] != cells[1]


def test_random_projection_preserves_distances(spark):
    """JL property on the driver testdata: pairwise L2 distances in the
    16-dim projection correlate strongly with the 64-dim originals, and
    the projection is bit-deterministic across invocations."""
    import itertools
    import math

    from supercrawler_spark.operators.embed import random_projection
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(40)
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    proj = {r["vec_id"]: r["projected"]
            for r in random_projection(emb, out_dim=16).collect()}
    ids = sorted(orig)
    # JL guarantee is about DISTORTION of squared distances (unbiased,
    # spread ~sqrt(2/k)) — not rank correlation, which is weak by design
    # on concentrated high-dim distances
    ratios = []
    for a, b in itertools.combinations(ids, 2):
        d0 = math.dist(orig[a], orig[b]) ** 2
        d1 = math.dist(proj[a], proj[b]) ** 2
        if d0 > 0:
            ratios.append(d1 / d0)
    mean = sum(ratios) / len(ratios)
    assert 0.85 < mean < 1.15, mean                 # unbiased estimator
    assert all(0.2 < r < 2.6 for r in ratios)       # k=16 tail bound
    again = {r["vec_id"]: r["projected"]
             for r in random_projection(emb, out_dim=16).collect()}
    assert again == proj


def test_random_projection_no_shuffle_no_python(spark):
    from supercrawler_spark.operators.embed import random_projection
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = random_projection(emb, out_dim=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
