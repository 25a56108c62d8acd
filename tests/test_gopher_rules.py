"""Unit tests for the Gopher quality-rule gate (textquality.gopher_rules)
beyond the DuckDB parity check: crafted documents that isolate each rule."""

from supercrawler_spark.operators.textquality import gopher_rules


def _run(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return gopher_rules(df, **kw).collect()[0]


GOOD = ("the quick brown fox jumps over the lazy dog and it is a fine day "
        "for a walk in the park on the green grass near the old mill") * 2


def test_good_document_passes(spark):
    r = _run(spark, GOOD)
    assert r["gopher_pass"] is True
    assert r["ok_word_count"] and r["ok_stopwords"] and r["ok_alpha_ratio"]


def test_bullet_heavy_fails_bullet_rule(spark):
    lines = "\n".join(["- item %d" % i for i in range(20)])
    r = _run(spark, GOOD + "\n" + lines)
    # 20 of 21 lines are bullets -> ratio > 0.9
    assert r["bullet_ratio"] > 0.9
    assert r["ok_bullet_ratio"] is False and r["gopher_pass"] is False


def test_ellipsis_lines_fail(spark):
    lines = "\n".join(["read more..." for _ in range(9)])
    r = _run(spark, GOOD + "\n" + lines)
    assert r["ellipsis_ratio"] > 0.3
    assert r["ok_ellipsis_ratio"] is False


def test_symbol_ratio_counts_hash_and_ellipsis(spark):
    r = _run(spark, "# ## … ... word", min_words=1)
    # '#'x3 + '…'x1 + '...'x1 = 5 symbols over 5 words
    assert r["symbol_ratio"] == 1.0
    assert r["ok_symbol_ratio"] is False


def test_short_numeric_doc_fails_word_and_alpha(spark):
    r = _run(spark, "1 2 3 4 5")
    assert r["ok_word_count"] is False
    assert r["alpha_ratio"] == 0.0 and r["ok_alpha_ratio"] is False
    assert r["gopher_pass"] is False


def test_mean_word_len_bounds(spark):
    long_words = " ".join(["pneumonoultramicroscopic"] * 60)
    r = _run(spark, long_words)
    assert r["ok_mean_word_len"] is False
    short = " ".join(["a b"] * 60)
    r2 = _run(spark, short)
    assert r2["mean_word_len"] < 3.0 and r2["ok_mean_word_len"] is False


def test_empty_document_reports_zeroes(spark):
    r = _run(spark, "")
    assert r["n_words"] == 1 or r["n_words"] == 0  # split('') -> ['']
    assert r["gopher_pass"] is False
