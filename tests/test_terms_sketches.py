"""Unit tests for operators/terms (TF-IDF keyterms, bigram PMI) and
operators/sketches (deterministic HyperLogLog)."""

import math

import pytest
from pyspark.sql import functions as F

from supercrawler_spark.operators.sketches import HLL_M, hll_distinct
from supercrawler_spark.operators.terms import bigram_pmi, tfidf_topterms


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_rare_term_ranks_first(spark):
    docs = _mk_docs(spark, [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the rug"),
        (2, "the zyzzyva zyzzyva zyzzyva appeared"),
    ])
    out = tfidf_topterms(docs, n_docs=3, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) == 2 for v in by_doc.values())
    top2 = sorted(by_doc[2], key=lambda r: r["rank"])[0]
    assert top2["token"] == "zyzzyva" and top2["tf"] == 3
    # hand-check the smooth-idf value: 3 * (ln(4/2) + 1)
    assert top2["tfidf"] == pytest.approx(3 * (math.log(2.0) + 1.0), abs=1e-6)
    # 'the' appears in every doc -> idf = ln(4/4)+1 = 1, never beats zyzzyva
    assert all(r["token"] != "the" or r["rank"] > 1 for r in by_doc[2])


def test_tfidf_tie_breaks_on_token(spark):
    docs = _mk_docs(spark, [(0, "bb aa")])
    out = sorted(tfidf_topterms(docs, n_docs=1, k=2).collect(),
                 key=lambda r: r["rank"])
    assert [r["token"] for r in out] == ["aa", "bb"]


def test_bigram_pmi_planted_collocation(spark):
    filler = " ".join(f"w{i % 7} common" for i in range(30))
    docs = _mk_docs(spark, [
        (i, f"san francisco is {filler}") for i in range(6)
    ])
    out = bigram_pmi(docs, min_count=5, k=10).collect()
    pairs = {(r["x"], r["y"]): r for r in out}
    assert ("san", "francisco") in pairs
    planted = pairs[("san", "francisco")]
    assert planted["n_xy"] == 6
    # perfectly-correlated pair outranks the generic high-frequency one
    generic = [r for r in out if (r["x"], r["y"]) == ("common", "w1")]
    if generic:
        assert planted["pmi"] > generic[0]["pmi"]
    assert planted["rank"] <= 3
    # min_count floor: a once-only bigram never appears
    assert all(r["n_xy"] >= 5 for r in out)


def test_bigram_pmi_single_token_docs_excluded(spark):
    docs = _mk_docs(spark, [(0, "solo")] * 1 + [(1, "a b " * 5)])
    out = bigram_pmi(docs, min_count=2, k=10).collect()
    assert all("solo" not in (r["x"], r["y"]) for r in out)


def test_hll_estimate_within_error(spark):
    n = 5000
    df = spark.range(n).select(
        F.lit("k").alias("key"), F.col("id").alias("v"))
    est = hll_distinct(df, ["key"], "v").collect()[0]["hll_distinct"]
    # 3 sigma at m=4096 registers ~ 4.9%
    assert abs(est - n) / n < 0.05


def test_hll_small_range_branch_and_duplicates(spark):
    # 100 distinct values repeated 50x: linear-counting branch, and the
    # estimate must ignore duplication entirely
    df = spark.range(5000).select(
        F.lit("k").alias("key"), (F.col("id") % 100).alias("v"))
    est = hll_distinct(df, ["key"], "v").collect()[0]["hll_distinct"]
    assert abs(est - 100) / 100 < 0.07


def test_hll_partition_invariant(spark):
    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("key"),
        F.col("id").alias("v"))
    a = {r["key"]: r["hll_distinct"]
         for r in hll_distinct(df, ["key"], "v").collect()}
    b = {r["key"]: r["hll_distinct"]
         for r in hll_distinct(df.repartition(7), ["key"], "v").collect()}
    assert a == b and len(a) == 3
    assert HLL_M == 4096


def test_cms_overestimates_never_under(spark):
    from supercrawler_spark.operators.cmsketch import cms_build, cms_estimate
    rows = [("a",)] * 100 + [("b",)] * 7 + [(f"tail{i}",) for i in range(50)]
    keys = spark.createDataFrame(rows, "key string")
    probes = spark.createDataFrame(
        [("a",), ("b",), ("tail0",), ("never_seen",)], "key string")
    est = {r["key"]: r["est"]
           for r in cms_estimate(cms_build(keys), probes).collect()}
    true = {"a": 100, "b": 7, "tail0": 1, "never_seen": 0}
    for k, t in true.items():
        assert est[k] >= t                       # CMS never underestimates
        assert est[k] <= t + 2 * len(rows) // 1024 + 1   # 2N/w slack
    assert est["never_seen"] == 0                # absent cells count as 0


def test_cms_partition_invariant(spark):
    from pyspark.sql import functions as F
    from supercrawler_spark.operators.cmsketch import cms_build, cms_estimate
    keys = spark.range(2000).select(
        (F.col("id") % 97).cast("string").alias("key"))
    probes = spark.createDataFrame([("0",), ("96",)], "key string")
    a = sorted(map(tuple, cms_estimate(cms_build(keys), probes).collect()))
    b = sorted(map(tuple,
                   cms_estimate(cms_build(keys.repartition(13)),
                                probes).collect()))
    assert a == b


def test_hll_ignores_null_values(spark):
    from supercrawler_spark.operators.sketches import hll_distinct
    df = spark.createDataFrame(
        [("k", i if i % 2 == 0 else None) for i in range(200)],
        "key string, v long")   # 100 distinct non-null + 100 NULLs
    base = spark.createDataFrame([("k", i) for i in range(0, 200, 2)],
                                 "key string, v long")
    with_nulls = hll_distinct(df, ["key"], "v").collect()[0]["hll_distinct"]
    without = hll_distinct(base, ["key"], "v").collect()[0]["hll_distinct"]
    assert with_nulls == without          # countDistinct semantics


def test_bm25_hand_computed_scores_and_ranks(spark):
    from supercrawler_spark.operators.terms import bm25_topk
    docs = _mk_docs(spark, [
        (0, "apple banana banana"),
        (1, "banana banana banana"),
        (2, "apple apple cherry"),
        (3, "cherry cherry cherry"),
    ])
    out = bm25_topk(docs, ["apple"], k=10).collect()
    # only docs containing the query term appear
    assert [r["doc_id"] for r in out] == [2, 0]
    # N=4, df=2, dl=avgdl=3 -> idf=ln(2), denom = tf + 1.2
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
    assert out[1]["score"] == pytest.approx(round(idf * 1 * 2.2 / 2.2, 6))
    assert out[0]["score"] == pytest.approx(round(idf * 2 * 2.2 / 3.2, 6))
    assert [r["rank"] for r in out] == [1, 2]
    assert all(r["n_terms"] == 1 for r in out)


def test_bm25_rare_term_outranks_common_and_ties_on_doc_id(spark):
    from supercrawler_spark.operators.terms import bm25_topk
    docs = _mk_docs(spark, [
        (0, "common rare"), (1, "common word"), (2, "common word"),
        (3, "common word"), (4, "rare common"),
    ])
    out = bm25_topk(docs, ["rare", "common"], k=3).collect()
    # docs 0 and 4 match both terms with identical tf/dl -> tie on score,
    # broken by doc_id; the rare term dominates the common one
    assert [r["doc_id"] for r in out] == [0, 4, 1]
    assert out[0]["score"] == out[1]["score"]
    assert out[0]["n_terms"] == 2 and out[2]["n_terms"] == 1


def test_zipf_fit_recovers_power_law(spark):
    """Exact Zipf corpus (token i appears floor(600/i) times) must fit
    slope ~ -1 with r2 ~ 1; a uniform corpus must fit slope ~ 0."""
    words = []
    for i in range(1, 41):
        words += [f"tok{i:02d}"] * (600 // i)
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id LONG, text STRING")
    from supercrawler_spark.operators.terms import zipf_fit
    r = zipf_fit(docs, top_n=40).collect()[0]
    assert r["n_ranks"] == 40
    assert abs(r["slope"] + 1.0) < 0.05, r
    assert r["r2"] > 0.99
    uni = spark.createDataFrame(
        [(0, " ".join([f"u{i}" for i in range(50)] * 3))],
        "doc_id LONG, text STRING")
    r = zipf_fit(uni, top_n=50).collect()[0]
    assert abs(r["slope"]) < 1e-6


def test_zipf_fit_degenerate_corpora_yield_null_not_nan(spark):
    """nullif-guarded denominators: a 1-rank corpus (varx = 0) and an
    all-equal-count corpus (vary = 0) must return NULL for the undefined
    fields — never NaN/Inf, which would diverge from the DuckDB oracle's
    nullif arithmetic."""
    from supercrawler_spark.operators.terms import zipf_fit
    one = spark.createDataFrame([(0, "solo solo solo")],
                                "doc_id LONG, text STRING")
    r = zipf_fit(one, top_n=10).collect()[0]
    assert r["n_ranks"] == 1
    assert r["slope"] is None and r["intercept"] is None and r["r2"] is None
    uni = spark.createDataFrame(
        [(0, " ".join(f"u{i}" for i in range(8)))],
        "doc_id LONG, text STRING")
    r = zipf_fit(uni, top_n=10).collect()[0]
    assert r["slope"] == 0.0  # cov = 0, varx > 0
    assert r["r2"] is None    # vary = 0 -> guarded NULL, not NaN


def test_zipf_fit_skip_ranks_drops_head(spark):
    """skip_ranks removes the flat function-word head from the fit: a
    corpus with 5 equally-hot stopwords atop a Zipf tail fits closer to
    -1 with the head skipped."""
    # flat 5-stopword head (600 each) atop a tail that is exactly Zipf in
    # GLOBAL rank: token at rank i (6..35) appears 600//i times
    words = ["the", "of", "and", "to", "a"] * 600
    for i in range(6, 36):
        words += [f"tok{i:02d}"] * (600 // i)
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id LONG, text STRING")
    from supercrawler_spark.operators.terms import zipf_fit
    full = zipf_fit(docs, top_n=35).collect()[0]
    tail = zipf_fit(docs, top_n=30, skip_ranks=5).collect()[0]
    assert tail["r2"] > full["r2"]
    assert abs(tail["slope"] + 1.0) < abs(full["slope"] + 1.0)
