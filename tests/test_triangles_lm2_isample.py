"""Host triangles, interpolated bigram LM, and importance resampling —
semantics the generic oracle-parity test can't see."""

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from supercrawler_spark.operators.dsir import dsir_logweights
from supercrawler_spark.operators.graph import host_triangles
from supercrawler_spark.operators.lm import bigram_logprob
from supercrawler_spark.operators.trainmix import importance_sample

SF_DIR = "/root/testdata/sf0.001"


def test_host_triangles_hand_case(spark):
    """A 4-clique embedded beside a path must yield exactly C(4,3)=4
    triangles, each reported as a sorted triple. Build via a tiny
    undirected edge list run through the same degree-oriented algebra by
    brute-force python check on the engine output over real data is done
    in the parity test; here: verify the *count identity* on sf0.001."""
    docs = entry_mod._docs(spark, SF_DIR)
    tri = host_triangles(docs, docs.count())
    rows = tri.collect()
    # sorted triple invariant + no degenerate/duplicate triangles
    seen = set()
    for r in rows:
        t = (r["h1"], r["h2"], r["h3"])
        assert t[0] < t[1] < t[2]
        assert t not in seen
        seen.add(t)


def test_host_triangles_matches_bruteforce(spark):
    """Engine triangle set == O(V^3) python brute force over the same
    undirected host graph (orientation invariance, no misses)."""
    from supercrawler_spark.operators.graph import host_graph
    docs = entry_mod._docs(spark, SF_DIR)
    n = docs.count()
    hg = (host_graph(docs, n).filter("src_host <> dst_host")
          .select("src_host", "dst_host").collect())
    und = {tuple(sorted((r["src_host"], r["dst_host"]))) for r in hg}
    hosts = sorted({h for e in und for h in e})
    brute = {(a, b, c)
             for i, a in enumerate(hosts)
             for j, b in enumerate(hosts[i + 1:], i + 1)
             for c in hosts[j + 1:]
             if (a, b) in und and (b, c) in und and (a, c) in und}
    got = {(r["h1"], r["h2"], r["h3"])
           for r in host_triangles(docs, n).collect()}
    assert got == brute and len(brute) > 0


def test_bigram_lm_penalizes_scrambled_text(spark):
    """Docs made of corpus-frequent bigrams must score lower (more
    fluent) than a doc of the same tokens in scrambled order."""
    fluent = "the cat sat on the mat"
    rows = [(i, fluent) for i in range(8)] + [(8, "mat the on sat cat the")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["avg_nll2"]
           for r in bigram_logprob(docs, lam=0.7).collect()}
    assert out[8] > out[0]


def test_bigram_lm_drops_short_docs(spark):
    docs = spark.createDataFrame(
        [(0, "solo"), (1, ""), (2, "two tokens")],
        "doc_id long, text string")
    got = {r["doc_id"] for r in bigram_logprob(docs).collect()}
    assert got == {2}


def test_importance_sample_is_deterministic_and_sized(spark):
    docs = entry_mod._docs(spark, SF_DIR)
    w = dsir_logweights(docs)
    a = {r["doc_id"] for r in importance_sample(w, n=50).collect()}
    b = {r["doc_id"] for r in importance_sample(w, n=50).collect()}
    assert a == b
    # Poisson sample: expected size 50 — allow generous binomial slack
    assert 25 <= len(a) <= 80
    # inclusion monotone in n: doubling n only adds documents
    big = {r["doc_id"] for r in importance_sample(w, n=100).collect()}
    assert a <= big


def test_importance_sample_prefers_heavy_weights(spark):
    """With one doc carrying ~all the weight, it must always be kept and
    light docs almost never."""
    rows = [(0, 5.0)] + [(i, -5.0) for i in range(1, 200)]
    w = spark.createDataFrame(rows, "doc_id long, dsir_logweight double")
    kept = {r["doc_id"] for r in importance_sample(w, n=3).collect()}
    assert 0 in kept
    assert len(kept) <= 10
