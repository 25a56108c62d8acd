"""Redirect-chain resolution: pointer-doubling resolver vs a pure-Python
chain walk, plus doubling-convergence and cycle-safety checks."""

import pytest
from pyspark.sql import functions as F

from supercrawler_spark.operators import redirects


def _py_is_redirect(d: int) -> bool:
    return d % 7 == 0 and d > 0


def _py_target(d: int) -> int:
    return ((d // 7) * 31 + 5) % d


def _py_resolve(d: int) -> tuple[int, int]:
    hops = 0
    while _py_is_redirect(d):
        d = _py_target(d)
        hops += 1
    return d, hops


def _docs(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_resolve_matches_python_walk(spark):
    n = 500
    out = {r.doc_id: (r.final_id, r.hops, r.resolved)
           for r in redirects.resolve_redirects(_docs(spark, n)).collect()}
    assert len(out) == n
    for d in range(n):
        fin, hops = _py_resolve(d)
        assert out[d] == (fin, hops, True), f"doc {d}"


def test_chains_actually_exist(spark):
    # the synthetic relation must exercise multi-hop chains or the test
    # proves nothing about doubling
    longest = max(_py_resolve(d)[1] for d in range(500))
    assert longest >= 2
    out = redirects.resolve_redirects(_docs(spark, 500))
    assert out.agg(F.max("hops")).first()[0] == longest


def test_doubling_iteration_count(spark):
    # log2(longest chain) + 1 doublings must suffice: cap max_iters there
    longest = max(_py_resolve(d)[1] for d in range(500))
    iters = 1
    while (1 << iters) < longest:
        iters += 1
    out = redirects.resolve_redirects(_docs(spark, 500), max_iters=iters + 1)
    assert out.filter(~F.col("resolved")).count() == 0


def test_cycle_reports_unresolved(spark):
    # max_iters=0 leaves multi-hop chains (e.g. 21→14→11) unresolved; the
    # resolver must flag them rather than return a still-redirecting target
    out = redirects.resolve_redirects(_docs(spark, 100), max_iters=0)
    bad = out.filter(~F.col("resolved"))
    assert bad.count() > 0  # unreachable fixpoint reported, not silently wrong
    assert out.filter(F.col("resolved")).filter(
        redirects._is_redirect(F.col("final_id"))).count() == 0


def test_canonical_frontier_indegree(spark):
    n = 300
    fin = {}
    for d in range(n):
        f, _ = _py_resolve(d)
        fin[f] = fin.get(f, 0) + 1
    got = {r.final_id: r.n_sources
           for r in redirects.canonical_frontier(_docs(spark, n)).collect()}
    assert got == fin


def test_no_cached_rdd_leak(spark):
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    redirects.resolve_redirects(_docs(spark, 200)).collect()
    assert jsc.getPersistentRDDs().size() <= before
