"""kmeans_assign: planted well-separated clusters are recovered exactly,
assignments are partition-invariant, and dist is the squared L2 to the
updated (mean) centroid."""

import pytest

from supercrawler_spark.operators.kmeans import kmeans_assign


def _planted(spark):
    # three tight clusters around orthogonal corners; ids 0/1/2 (the k-means
    # init seeds) land one per cluster
    centers = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0],
               [0.0, 0.0, 10.0, 0.0]]
    rows = []
    for i in range(30):
        c = centers[i % 3]
        rows.append((i, [v + 0.1 * ((i * 7 + d) % 5 - 2)
                         for d, v in enumerate(c)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_planted_clusters(spark):
    emb = _planted(spark)
    out = {r["vec_id"]: r for r in
           kmeans_assign(emb, k=3, n_iters=3, dim=4).collect()}
    assert len(out) == 30
    for i in range(30):
        assert out[i]["cell"] == out[i % 3]["cell"]      # same as its seed
        assert out[i]["dist"] < 1.0                       # tight cluster
    assert len({out[i]["cell"] for i in range(3)}) == 3   # three live cells


def test_kmeans_partition_invariant(spark):
    emb = _planted(spark)
    a = sorted(map(tuple, kmeans_assign(emb, k=3, n_iters=2, dim=4).collect()))
    b = sorted(map(tuple, kmeans_assign(emb.repartition(13), k=3, n_iters=2,
                                        dim=4).collect()))
    assert a == b


def test_kmeans_dist_is_squared_l2_to_mean(spark):
    # one cluster, k=1: the updated centroid is the exact mean, so dist is
    # the squared deviation from it
    rows = [(0, [0.0, 0.0]), (1, [2.0, 0.0]), (2, [4.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["dist"] for r in
           kmeans_assign(emb, k=1, n_iters=2, dim=2).collect()}
    assert out[0] == pytest.approx(4.0)                   # mean = (2, 0)
    assert out[1] == pytest.approx(0.0)
    assert out[2] == pytest.approx(4.0)


def test_semdedup_pairs_within_cells_only(spark):
    from supercrawler_spark.operators.kmeans import semdedup
    emb = _planted(spark)
    out = semdedup(emb, k=3, n_iters=3, threshold=0.99, dim=4).collect()
    # planted cluster members are near-parallel (cos ~1); cross-cluster
    # vectors are near-orthogonal and, being in other cells, never scored
    assert len(out) > 0
    assign = {r["vec_id"]: r["cell"] for r in
              kmeans_assign(emb, k=3, n_iters=3, dim=4).collect()}
    for r in out:
        assert r["a_id"] < r["b_id"]
        assert assign[r["a_id"]] == assign[r["b_id"]] == r["cell"]
        assert r["sim"] >= 0.99
    # every same-cell pair of the tight clusters clears 0.99
    from itertools import combinations
    expected = {(a, b) for a, b in combinations(range(30), 2)
                if a % 3 == b % 3}
    assert {(r["a_id"], r["b_id"]) for r in out} == expected


def test_semdedup_threshold_and_assignment_passthrough(spark):
    from pyspark.sql import functions as F
    from supercrawler_spark.operators.kmeans import semdedup
    emb = _planted(spark)
    # a precomputed (persisted) assignment gives identical pairs
    a = kmeans_assign(emb, k=3, n_iters=3, dim=4).persist()
    try:
        via_assign = semdedup(emb, threshold=0.99, dim=4, assignment=a)
        direct = semdedup(emb, k=3, n_iters=3, threshold=0.99, dim=4)
        assert sorted(map(tuple, via_assign.collect())) == \
            sorted(map(tuple, direct.collect()))
    finally:
        a.unpersist()
    # threshold=1.01 filters everything
    assert semdedup(emb, k=3, n_iters=3, threshold=1.01, dim=4).count() == 0


def test_semdedup_max_cell_size_guard(spark):
    from supercrawler_spark.operators.kmeans import semdedup
    emb = _planted(spark)
    # each planted cell has 10 members; a cap of 9 drops all of them
    assert semdedup(emb, k=3, n_iters=3, threshold=0.0, dim=4,
                    max_cell_size=9).count() == 0
