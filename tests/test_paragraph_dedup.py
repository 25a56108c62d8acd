"""Unit tests for keeper-semantics paragraph dedup
(operators/linededup.paragraph_dedup): exactly one global survivor per
repeated paragraph, order preservation, min_chars exemption."""

from supercrawler_spark.operators.linededup import paragraph_dedup


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in paragraph_dedup(df, **kw).collect()}


def test_repeated_paragraph_survives_once(spark):
    shared = "this paragraph repeats everywhere"
    rows = [(0, f"{shared}\n\nunique zero"),
            (1, f"{shared}\n\nunique one"),
            (2, f"unique two\n\n{shared}")]
    out = _run(spark, rows)
    # keeper is the lexicographically first (doc_id, pos) = (0, 0)
    assert out[0]["text_clean"] == f"{shared}\n\nunique zero"
    assert out[1]["text_clean"] == "unique one"
    assert out[2]["text_clean"] == "unique two"
    assert out[1]["n_dropped"] == 1 and out[2]["n_dropped"] == 1
    total_kept = sum(r["n_paragraphs"] - r["n_dropped"] for r in out.values())
    assert total_kept == 4  # 3 uniques + 1 shared survivor


def test_keeper_is_earliest_position_within_doc(spark):
    rows = [(5, "dup paragraph here\n\nmiddle\n\ndup paragraph here")]
    out = _run(spark, rows)
    assert out[5]["text_clean"] == "dup paragraph here\n\nmiddle"
    assert out[5]["n_dropped"] == 1


def test_short_paragraphs_exempt(spark):
    rows = [(0, "ok\n\nlong enough paragraph"),
            (1, "ok\n\nother content")]
    out = _run(spark, rows, min_chars=6)
    # 'ok' repeats but is below min_chars -> kept in both
    assert out[0]["text_clean"].startswith("ok")
    assert out[1]["text_clean"].startswith("ok")
    assert out[0]["n_dropped"] == 0 and out[1]["n_dropped"] == 0


def test_order_preserved_after_removal(spark):
    rows = [(0, "AAAA common\n\nfirst\n\nsecond"),
            (1, "third\n\nAAAA common\n\nfourth")]
    out = _run(spark, rows)
    assert out[1]["text_clean"] == "third\n\nfourth"
    assert out[0]["text_clean"] == "AAAA common\n\nfirst\n\nsecond"
