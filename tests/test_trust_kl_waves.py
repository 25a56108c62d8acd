"""Unit tests for the round-3 additions: TrustRank + spam mass
(operators/trust), per-source domain KL (operators/trainmix.domain_kl),
and the politeness dispatch scheduler (operators/budget.fetch_waves)."""

import math

from pyspark.sql import functions as F

from supercrawler_spark.operators.budget import fetch_waves
from supercrawler_spark.operators.pagerank import SCALE
from supercrawler_spark.operators.trainmix import domain_kl
from supercrawler_spark.operators.trust import spam_mass, trustrank


def _docs(spark, n, sources=("a", "b")):
    rows = [(i, f"text {i}", "en", sources[i % len(sources)], 10)
            for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")


# ---------------------------------------------------------------- trustrank

def test_trust_mass_conserved_up_to_truncation(spark):
    docs = _docs(spark, 40)
    t = trustrank(docs, iters=2).collect()
    total = sum(r["trust"] for r in t)
    # each round drops at most 1 micro-unit per (edge, node) to integral div
    assert 0 < total <= SCALE
    assert total > SCALE - (40 * 4 + 40) * 2
    assert all(r["trust"] >= 0 for r in t)


def test_trust_concentrates_on_seed_whitelist(spark):
    docs = _docs(spark, 40)
    t = {r["doc_id"]: r["trust"] for r in trustrank(docs, iters=2).collect()}
    seeds = [d for d in t if d % 17 == 0]
    others = [d for d in t if d % 17 != 0]
    # the teleport floor alone gives every seed more trust than the
    # average non-seed (non-seeds only get pass-through mass)
    seed_min = min(t[d] for d in seeds)
    other_avg = sum(t[d] for d in others) / len(others)
    assert seed_min > other_avg


def test_spam_mass_bounds_and_seed_demotion(spark):
    docs = _docs(spark, 51)
    sm = spam_mass(docs, iters=2).collect()
    assert all(0 <= r["spam_mass_ppm"] <= 1_000_000 for r in sm)
    by_id = {r["doc_id"]: r for r in sm}
    # seeds hold concentrated trust >= their own pagerank share
    for d, r in by_id.items():
        if d % 17 == 0:
            assert r["spam_mass_ppm"] < 1_000_000
    # rank and trust columns coexist with the right totals
    assert abs(sum(r["rank"] for r in sm) - SCALE) < 51 * 10
    assert 0 < sum(r["trust"] for r in sm) <= SCALE


# ---------------------------------------------------------------- domain_kl

def test_domain_kl_single_source_is_zero(spark):
    docs = _docs(spark, 12, sources=("only",))
    row = domain_kl(docs).collect()
    assert len(row) == 1
    assert row[0]["kl_bits"] == 0.0
    assert row[0]["n_docs"] == 12


def test_domain_kl_identity_and_nonnegativity(spark):
    rows = [(0, "apple apple banana", "en", "fruit", 18),
            (1, "apple banana banana cherry", "en", "fruit", 26),
            (2, "stock bond bond yield", "en", "finance", 21),
            (3, "stock stock yield curve", "en", "finance", 23)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out = {r["source"]: r for r in domain_kl(docs).collect()}
    assert set(out) == {"fruit", "finance"}
    for r in out.values():
        assert r["kl_bits"] >= 0.0  # Gibbs' inequality
        # H(p, q) = H(p) + KL(p || q), up to the two 6-dp roundings
        assert math.isclose(r["h_cross_bits"],
                            r["h_source_bits"] + r["kl_bits"], abs_tol=3e-6)
        assert r["n_tokens"] > 0 and r["vocab"] > 0


def test_domain_kl_counts_are_exact(spark):
    rows = [(0, "x y", "en", "s1", 3), (1, "x", "en", "s1", 1),
            (2, "y y y", "en", "s2", 5)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out = {r["source"]: r for r in domain_kl(docs).collect()}
    assert out["s1"]["n_tokens"] == 3 and out["s1"]["vocab"] == 2
    assert out["s2"]["n_tokens"] == 3 and out["s2"]["vocab"] == 1
    assert out["s1"]["n_docs"] == 2 and out["s2"]["n_docs"] == 1


# --------------------------------------------------------------- fetch_waves

def _frontier(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, priority long")


def test_waves_pace_by_crawl_delay(spark):
    rows = [(f"https://slow/p/{i}", "slow", i) for i in range(10)]
    delays = spark.createDataFrame([("slow", 2.0)],
                                   "host string, crawl_delay double")
    out = fetch_waves(_frontier(spark, rows), slots_per_host=4,
                      delays=delays).collect()
    by_rank = {r["host_rank"]: r for r in out}
    # ranks 1-4 -> wave 0 eta 0; 5-8 -> wave 1 eta 2000; 9-10 -> wave 2
    assert [by_rank[i]["wave"] for i in range(1, 11)] == \
        [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]
    assert by_rank[5]["eta_ms"] == 2000 and by_rank[9]["eta_ms"] == 4000
    assert [by_rank[i]["slot"] for i in range(1, 6)] == [0, 1, 2, 3, 0]


def test_waves_default_delay_and_priority_order(spark):
    rows = [("https://h/b", "h", 2), ("https://h/a", "h", 1),
            ("https://h/c", "h", 1)]
    out = fetch_waves(_frontier(spark, rows), slots_per_host=1).collect()
    ranked = sorted(out, key=lambda r: r["host_rank"])
    assert [r["url"].rsplit("/", 1)[1] for r in ranked] == ["a", "c", "b"]
    assert [r["eta_ms"] for r in ranked] == [0, 1000, 2000]


def test_waves_plan_single_shuffle(spark):
    rows = [(f"https://h/p/{i}", "h", i) for i in range(8)]
    plan = fetch_waves(_frontier(spark, rows))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") <= 1
