"""Unit tests for the Unicode canonicalizer and the entropy signals —
cases the ASCII-only oracle corpus can't exercise (NFD→NFC, control
chars, mixed whitespace) plus hand-computed entropy values."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from supercrawler_spark.operators.normalize import normalize_str, normalize_text
from supercrawler_spark.operators.textquality import entropy_signals


# -- pure kernel ------------------------------------------------------------

def test_nfd_to_nfc():
    # "é" as e + COMBINING ACUTE ACCENT must collapse to the composed form
    assert normalize_str("café") == "café"
    assert len(normalize_str("é")) == 1


def test_control_chars_stripped_whitespace_collapsed():
    assert normalize_str("a\x00b\x07c") == "abc"
    assert normalize_str("  a\t\tb\r\nc\f d  ") == "a b c d"
    # \x0b is stripped as a control char (not folded to a space)
    assert normalize_str("a\x0bb") == "ab"


def test_already_normal_is_identity():
    assert normalize_str("plain ascii text") == "plain ascii text"
    assert normalize_str("") == ""


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_normalize_idempotent(s):
    once = normalize_str(s)
    assert normalize_str(once) == once


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_normalize_total_and_clean(s):
    out = normalize_str(s)
    assert "\x00" not in out and "\n" not in out and "\t" not in out
    assert "  " not in out  # no residual whitespace runs
    assert out == out.strip(" ")


# -- Spark surface ----------------------------------------------------------

def test_normalize_text_df(spark):
    df = spark.createDataFrame(
        [(0, "café  du\tmonde"), (1, "clean"), (2, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert out[0]["norm_text"] == "café du monde"
    assert out[0]["changed"] is True
    assert out[0]["n_chars_norm"] == 13
    assert out[1]["norm_text"] == "clean" and out[1]["changed"] is False
    assert out[2]["norm_text"] is None and out[2]["changed"] is None


def test_entropy_hand_computed(spark):
    df = spark.createDataFrame(
        [(0, "a a a a"),          # one distinct token: H = 0
         (1, "a b c d"),          # uniform over 4: H = 2 bits, norm = 1
         (2, "a a b b b c"),      # counts 2,3,1 over n=6
         (3, "   ")],             # no tokens: dropped
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in entropy_signals(df).collect()}
    assert 3 not in rows
    assert rows[0]["token_entropy"] == 0.0
    assert rows[0]["entropy_norm"] == 0.0
    assert rows[0]["n_distinct"] == 1
    assert rows[1]["token_entropy"] == pytest.approx(2.0)
    assert rows[1]["entropy_norm"] == pytest.approx(1.0)
    h = math.log2(6) - (2 * math.log2(2) + 3 * math.log2(3)) / 6
    assert rows[2]["token_entropy"] == pytest.approx(round(h, 6))
    assert rows[2]["n_tokens"] == 6 and rows[2]["n_distinct"] == 3
    assert rows[2]["entropy_norm"] == pytest.approx(round(h / math.log2(3), 6))


def test_normalize_arrow_vectorized_plan(spark):
    """The canonicalizer must run as ArrowEvalPython (vectorized batches),
    never the per-row BatchEvalPython fallback."""
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = normalize_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_entropy_shuffle_free_plan(spark):
    """The fold-based entropy must not introduce an Exchange — it runs at
    scan speed over the documents table."""
    df = spark.range(0, 10).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.lit("x"), F.col("id").cast("string")).alias("text"))
    plan = entropy_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
