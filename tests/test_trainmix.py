"""Training-mix operators: benchmark decontamination, deterministic corpus
shuffle, stratified sampling. Oracle twins are covered by
test_oracle_parity; these verify the operator semantics directly."""

import pytest
from pyspark.sql import functions as F

from supercrawler_spark.operators import trainmix


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(60):
        body = " ".join(f"tok{i}w{j}" for j in range(30))
        rows.append((i, "en", "alpha" if i % 2 == 0 else "beta", body))
    # 3 docs that quote benchmark doc 0 verbatim (full text overlap)
    for i in range(60, 63):
        rows.append((i, "en", "alpha", rows[0][3]))
    # 1 doc that quotes an 8-token span of doc 1 mid-document
    span = " ".join(rows[1][3].split()[5:13])
    rows.append((63, "en", "beta", "intro words here " + span + " outro words"))
    return spark.createDataFrame(
        rows, "doc_id LONG, lang STRING, source STRING, text STRING")


def test_decontaminate_flags_verbatim_and_span_quotes(docs):
    bench = docs.filter(F.col("doc_id") < 2)  # docs 0 and 1 are the benchmark
    out = {r["doc_id"]: r["bench_hits"]
           for r in trainmix.decontaminate(docs, bench, n=8).collect()}
    # the benchmark docs themselves and their verbatim copies are flagged
    for d in (0, 1, 60, 61, 62):
        assert d in out and out[d] >= 1
    # the single 8-token span yields exactly one distinct 8-gram hit
    assert out[63] == 1
    # clean docs are NOT in the removal list
    assert all(d in (0, 1, 60, 61, 62, 63) for d in out)


def test_decontaminate_min_hits_threshold(docs):
    bench = docs.filter(F.col("doc_id") < 2)
    out = {r["doc_id"] for r in
           trainmix.decontaminate(docs, bench, n=8, min_hits=2).collect()}
    assert 63 not in out          # single-shingle overlap falls below 2
    assert {0, 1, 60, 61, 62} <= out


def test_shuffle_corpus_is_a_permutation_and_deterministic(docs):
    out = trainmix.shuffle_corpus(docs, n_shards=8).collect()
    assert len(out) == docs.count()
    assert len({r["doc_id"] for r in out}) == len(out)
    # pos is dense 1..k within each shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # invariant under input partitioning; distinct salts give distinct orders
    again = trainmix.shuffle_corpus(docs.repartition(7), n_shards=8).collect()
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["pos"]) for r in rows)
    assert key(again) == key(out)
    other = trainmix.shuffle_corpus(docs, n_shards=8, salt="shuffle-2").collect()
    assert key(other) != key(out)


def test_stratified_sample_fractions_and_determinism(spark):
    rows = [(i, "en", "alpha" if i < 2000 else "beta", "x") for i in range(4000)]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, lang STRING, source STRING, text STRING")
    out = trainmix.stratified_sample(
        docs, {"alpha": 0.5, "beta": 0.1}).collect()
    a = sum(1 for r in out if r["stratum"] == "alpha")
    b = sum(1 for r in out if r["stratum"] == "beta")
    assert abs(a / 2000 - 0.5) < 0.05
    assert abs(b / 2000 - 0.1) < 0.03
    # deterministic: exact same membership on re-run and after repartition
    again = trainmix.stratified_sample(
        docs.repartition(13), {"alpha": 0.5, "beta": 0.1}).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}
    # unknown strata are dropped entirely
    none = trainmix.stratified_sample(docs, {"gamma": 1.0}).collect()
    assert none == []


def test_weighted_epochs_counts_and_determinism(spark):
    rows = [(i, "en", ("alpha", "beta", "gamma", "delta")[i % 4], "x")
            for i in range(4000)]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, lang STRING, source STRING, text STRING")
    weights = {"alpha": 2.5, "beta": 1.0, "gamma": 0.25}  # delta unlisted
    out = trainmix.weighted_epochs(docs, weights).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault((r["doc_id"], r["stratum"]), []).append(r["epoch"])
    # epochs are dense 0..n-1 per doc
    for (doc, stratum), eps in by_doc.items():
        assert sorted(eps) == list(range(len(eps))), (doc, eps)
    n = {"alpha": 0, "beta": 0, "gamma": 0}
    for (doc, stratum), eps in by_doc.items():
        n[stratum] += len(eps)
        lo, hi = int(weights[stratum]), int(weights[stratum]) + 1
        assert len(eps) in (lo, hi) or weights[stratum] == int(weights[stratum])
    # realized copies track the weights (1000 docs per stratum)
    assert abs(n["alpha"] / 1000 - 2.5) < 0.1
    assert n["beta"] == 1000          # integer weight: exactly one epoch
    assert abs(n["gamma"] / 1000 - 0.25) < 0.05
    assert not any(s == "delta" for (_, s) in by_doc)
    # deterministic under repartitioning
    again = trainmix.weighted_epochs(docs.repartition(13), weights).collect()
    key = lambda rs: sorted((r["doc_id"], r["stratum"], r["epoch"]) for r in rs)
    assert key(again) == key(out)


def test_stratified_sample_salts_independent(spark):
    rows = [(i, "en", "alpha", "x") for i in range(2000)]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, lang STRING, source STRING, text STRING")
    s1 = {r["doc_id"] for r in
          trainmix.stratified_sample(docs, {"alpha": 0.3}, salt="a").collect()}
    s2 = {r["doc_id"] for r in
          trainmix.stratified_sample(docs, {"alpha": 0.3}, salt="b").collect()}
    # independent draws: overlap ~ 0.09 of corpus, far from either sample
    inter = len(s1 & s2)
    assert 0.03 < inter / 2000 < 0.18


def test_decontaminate_fuzzy_catches_edited_copy(spark):
    """The fuzzy pass's reason to exist: a benchmark document lightly
    edited (every 8th word replaced) shares NO verbatim 8-gram with the
    benchmark — the exact n-gram test misses it — but keeps most of its
    shingle set, so MinHash agreement stays high and the fuzzy pass
    flags it. An unrelated document is flagged by neither."""
    bench_text = " ".join(f"q{i}" for i in range(64))
    edited = " ".join(f"EDIT{i}" if i % 8 == 0 else f"q{i}"
                      for i in range(64))
    unrelated = " ".join(f"z{i}" for i in range(64))
    docs = spark.createDataFrame(
        [(0, edited), (1, unrelated), (2, bench_text)],
        "doc_id long, text string")
    bench = spark.createDataFrame([(900, bench_text)],
                                  "doc_id long, text string")

    exact = {r["doc_id"] for r in
             trainmix.decontaminate(docs, bench, n=8).collect()}
    assert exact == {2}, "exact pass should only catch the verbatim copy"

    # every-8th-word edits corrupt ~3 shingles each: true Jaccard ~ 0.45,
    # far above unrelated text but below a verbatim-duplicate threshold —
    # band_size=1 makes candidate generation sensitive at that range
    fuzzy = {(r["doc_id"], r["bench_id"]): r["jaccard_est"] for r in
             trainmix.decontaminate_fuzzy(
                 docs, bench, num_hashes=16, band_size=1,
                 min_jaccard_est=0.3).collect()}
    assert (0, 900) in fuzzy, "edited copy missed by the fuzzy pass"
    assert 0.3 <= fuzzy[(0, 900)] < 1.0
    assert (2, 900) in fuzzy and fuzzy[(2, 900)] == 1.0
    assert not any(d == 1 for d, _ in fuzzy)


def test_decontaminate_fuzzy_benchmark_broadcast_plan(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(20))) for i in range(40)],
        "doc_id long, text string")
    bench = docs.filter(F.col("doc_id") < 3).select(
        "doc_id", "text")
    plan = (trainmix.decontaminate_fuzzy(docs, bench)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
