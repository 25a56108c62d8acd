"""Unit tests for the RefinedWeb-style soft URL blocklist
(operators/urlfilter.url_blocklist_score): strict-vs-soft word matching,
hard host bans, threshold semantics."""

from supercrawler_spark.operators.urlfilter import url_blocklist_score


def _score(spark, *urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = url_blocklist_score(df, **kw).collect()
    return {r["url"]: r for r in rows}


def test_strict_segment_match_blocks(spark):
    r = _score(spark, "https://a.example.com/casino/lobby")
    row = r["https://a.example.com/casino/lobby"]
    assert row["block_score"] == 5 and row["blocked"] is True
    assert row["hard_blocked"] is False


def test_soft_substring_scores_low(spark):
    r = _score(spark, "https://a.example.com/blog/megacasino-history")
    row = list(r.values())[0]
    # 'casino' inside 'megacasino' is a soft match only
    assert row["block_score"] == 2 and row["blocked"] is False


def test_scores_accumulate_across_words(spark):
    r = _score(spark, "https://a.example.com/poker-and-spam")
    row = list(r.values())[0]
    assert row["block_score"] == 8 and row["blocked"] is True


def test_hard_host_blocks_regardless_of_score(spark):
    r = _score(spark, "https://badco.example.com/docs/clean")
    row = list(r.values())[0]
    assert row["block_score"] == 0
    assert row["hard_blocked"] is True and row["blocked"] is True


def test_clean_url_passes(spark):
    r = _score(spark, "https://a.example.com/docs/getting-started")
    row = list(r.values())[0]
    assert row["block_score"] == 0 and row["blocked"] is False


def test_case_insensitive(spark):
    r = _score(spark, "https://a.example.com/CASINO/room")
    assert list(r.values())[0]["blocked"] is True


def test_custom_words_and_threshold(spark):
    r = _score(spark, "https://a.example.com/widget/shop",
               words=[("widget", 4, 1)], threshold=4)
    assert list(r.values())[0]["blocked"] is True
