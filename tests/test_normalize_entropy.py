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
    # Unicode space separators fold like ASCII whitespace
    assert normalize_str("\x85abc ") == "abc"
    assert normalize_str("a\u00a0\u3000b") == "a b"


def test_normalize_kernel_matches_real_duckdb_oracle():
    """The sweep corpus is ASCII — drive the ACTUAL oracle_sql string over
    Unicode-bearing rows and diff against the Python kernel, so the
    NFC/whitespace/control classes provably agree across engines."""
    import duckdb

    import __spark_entry__ as em

    cases = ["\x85abc", "abc\u2028", "a\u00a0b", " x\ty ",
             "cafe\u0301", "\u3000\u65e5\u672c\u3000\u8a9e", "a\x00\x07b",
             "", "   ", "plain text", "a  b", "\u2029\u202f"]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, ?)" for i in range(len(cases)))
                + ") t(doc_id, text)", cases)
    got = {r[0]: (r[1], r[2], r[3]) for r in
           con.execute(em.oracle_sql()["normalize_text"]).fetchall()}
    for i, s in enumerate(cases):
        expect = normalize_str(s)
        assert got[i][0] == expect, (s, got[i][0], expect)
        assert got[i][1] == len(expect)
        assert got[i][2] == (expect != s)


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


def test_entropy_edge_whitespace_regression(spark):
    """Regression (review finding): leading/trailing tabs/newlines must not
    produce phantom empty tokens — '\\nfoo bar\\n' has exactly 2 tokens,
    2 distinct, entropy_norm 1.0; '\\tword' is a single token with
    n_distinct=1 and norm 0.0; a whitespace-only doc is dropped."""
    df = spark.createDataFrame(
        [(0, "\nfoo bar\n"), (1, "\tword"), (2, "\n\t "), (3, "\n")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in entropy_signals(df).collect()}
    assert set(rows) == {0, 1}
    assert rows[0]["n_tokens"] == 2 and rows[0]["n_distinct"] == 2
    assert rows[0]["entropy_norm"] == pytest.approx(1.0)
    assert rows[1]["n_tokens"] == 1 and rows[1]["n_distinct"] == 1
    assert rows[1]["entropy_norm"] == 0.0


def test_token_count_edge_whitespace_matches_oracle(spark):
    """The hardened tokenizer must agree with the hardened _TOKS oracle on
    tab/newline-edged text (the pre-fix pair diverged: Java split drops
    trailing empties, DuckDB keeps them)."""
    import duckdb

    import __spark_entry__ as em
    from supercrawler_spark.operators.textquality import token_count

    cases = ["\nfoo bar\n", "\tword", "a  b", " x ", "plain text"]
    df = spark.createDataFrame(list(enumerate(cases)),
                               "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"] for r in token_count(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, ?)" for i in range(len(cases)))
                + ") t(doc_id, text)", cases)
    oracle = dict(con.execute(
        "SELECT doc_id, n_tokens FROM (" + em.oracle_sql()["token_count"]
        + ")").fetchall())
    assert got == oracle
    assert got[0] == 2 and got[1] == 1


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


def test_script_detect_unicode_parity_and_semantics(spark):
    """ASCII corpus can't exercise the script classes — drive the REAL
    oracle over mixed-script rows and diff against Spark, plus semantic
    spot checks (dominance, tie-break, 'und')."""
    import duckdb

    import __spark_entry__ as em
    from supercrawler_spark.operators.textquality import script_detect

    cases = ["hello world",
             "привет мир",
             "你好世界",
             "abc бвгд",      # latin 3 vs cyrillic 4
             "ab вг",                    # 2-2 tie -> cyrillic (alpha)
             "12345 !?",                           # no script -> und
             "שלום αβ"]
    df = spark.createDataFrame(list(enumerate(cases)),
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in script_detect(df).collect()}
    assert got[0]["script"] == "latin"
    assert got[1]["script"] == "cyrillic"
    assert got[2]["script"] == "cjk" and got[2]["n_cjk"] == 4
    assert got[3]["script"] == "cyrillic"
    assert got[4]["script"] == "cyrillic"  # alphabetic tie-break
    assert got[5]["script"] == "und"
    assert got[6]["script"] == "hebrew" and got[6]["n_greek"] == 2

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, ?)" for i in range(len(cases)))
                + ") t(doc_id, text)", cases)
    oracle = {r[0]: r for r in
              con.execute(em.oracle_sql()["script_detect"]
                          + " ORDER BY doc_id").fetchall()}
    for i in range(len(cases)):
        g = got[i]
        o = oracle[i]
        assert [g[f"n_{nm}"] for nm in
                ["arabic", "cjk", "cyrillic", "greek",
                 "hangul", "hebrew", "latin"]] == list(o[1:8]), (i, g, o)
        assert g["script"] == o[8]
