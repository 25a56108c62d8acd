"""Unit tests for temperature_mix and token_budget_select
(operators/trainmix round-3 additions)."""

import math

from pyspark.sql import Window, functions as F

from supercrawler_spark.operators.textquality import quality_score
from supercrawler_spark.operators.trainmix import (temperature_mix,
                                                   token_budget_select)


def _docs(spark, sizes):
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, f"some text body number {i} with words", "en",
                         src, 30))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")


def test_temperature_mix_uniform_is_identity(spark):
    docs = _docs(spark, {"a": 10, "b": 10})
    out = {r["stratum"]: r for r in temperature_mix(docs, 0.5).collect()}
    for r in out.values():
        assert r["share"] == 0.5
        assert r["temp_weight"] == 0.5
        assert r["epochs"] == 1.0


def test_temperature_mix_upweights_low_resource(spark):
    docs = _docs(spark, {"big": 90, "small": 10})
    out = {r["stratum"]: r for r in temperature_mix(docs, 0.5).collect()}
    assert out["small"]["temp_weight"] > out["small"]["share"]
    assert out["big"]["temp_weight"] < out["big"]["share"]
    assert out["small"]["epochs"] > 1.0 > out["big"]["epochs"]
    total = sum(r["temp_weight"] for r in out.values())
    assert math.isclose(total, 1.0, abs_tol=3e-6)


def test_temperature_mix_alpha_one_is_natural(spark):
    docs = _docs(spark, {"x": 30, "y": 10})
    out = {r["stratum"]: r for r in temperature_mix(docs, 1.0).collect()}
    for r in out.values():
        assert r["temp_weight"] == r["share"]
        assert r["epochs"] == 1.0


def test_token_budget_select_matches_single_window(spark):
    docs = _docs(spark, {"a": 15, "b": 15})
    out, cache = token_budget_select(docs, budget_tokens=60)
    got = {r["doc_id"]: r for r in out.collect()}
    cache.unpersist()
    # oracle twin: single global window over the same score
    q = quality_score(docs).select("doc_id", "quality",
                                   F.col("n_tokens").cast("long")
                                   .alias("n_tokens"))
    w = (Window.orderBy(F.col("quality").desc(), F.col("doc_id").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    exact = {r["doc_id"]: r for r in
             q.withColumn("cum_tokens", F.sum("n_tokens").over(w))
             .collect()}
    assert set(got) == set(exact)
    for d, r in got.items():
        assert r["cum_tokens"] == exact[d]["cum_tokens"]
        assert r["kept"] == (exact[d]["cum_tokens"] <= 60)
    assert 0 < sum(r["kept"] for r in got.values()) < len(got)


def test_token_budget_select_keeps_best_quality_first(spark):
    rows = [(0, "the of and to a in is it for on " * 12, "en", "good", 10),
            (1, "zzzz!!!! ????", "en", "bad", 10),
            (2, "the of and to a in is it for on " * 12, "en", "good2", 10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out, cache = token_budget_select(docs, budget_tokens=240)
    got = {r["doc_id"]: r for r in out.collect()}
    cache.unpersist()
    assert got[0]["kept"] and got[2]["kept"]
    assert not got[1]["kept"]  # low quality ranks last, budget exhausted
