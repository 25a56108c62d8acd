"""Unit tests for traps.url_templates and corpus.length_histogram."""

from pyspark.sql import functions as F

from supercrawler_spark.operators.corpus import length_histogram
from supercrawler_spark.operators.traps import url_templates


def test_url_templates_folds_families(spark):
    urls = spark.createDataFrame(
        [(f"https://a.example.com/post/{i}",) for i in range(10)]
        + [(f"https://a.example.com/cal/20{i:02d}/1/view?d={i}",)
           for i in range(4)]
        + [("https://a.example.com/about",)]                  # n_urls=1 cut
        + [(f"https://b.example.com/x/deadbeefcafe{i:04d}/y",)
           for i in range(3)]
        + [("HTTPS://A.example.com/post/99#frag?notquery=1",)]
        + [("/relative/1",)],
        "url string")
    out = url_templates(urls, k=5, min_urls=2).collect()
    rows = {(r["host"], r["template"]): r for r in out}
    # digit runs fold, query marks, host folds case, fragment '?' ignored
    top_a = rows[("a.example.com", "/post/{n}")]
    assert top_a["n_urls"] == 11 and top_a["rank"] == 1
    assert rows[("a.example.com", "/cal/{n}/{n}/view?{q}")]["n_urls"] == 4
    # long hex run folds to {hex} (the trailing digits are inside the run)
    assert ("b.example.com", "/x/{hex}/y") in rows
    # min_urls cuts the singleton; strays excluded
    assert all(t != "/about" for (_, t) in rows)
    assert all(h != "" for (h, _) in rows)


def test_url_templates_rank_caps_k(spark):
    urls = spark.createDataFrame(
        [(f"https://h.com/{'g' * (j + 1)}/{i}",)
         for j in range(8) for i in range(2 + j)],
        "url string")
    out = url_templates(urls, k=3, min_urls=2).collect()
    assert len(out) == 3
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]
    # highest-count family (j=7 -> 9 urls) wins
    assert sorted(out, key=lambda r: r["rank"])[0]["template"] == \
        "/" + "g" * 8 + "/{n}"


def test_length_histogram_buckets(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "abc"), (2, "abcd"), (3, "abcdefg"), (4, "x" * 100)],
        "doc_id long, text string")
    out = {r["bucket"]: r for r in length_histogram(docs).collect()}
    assert out[0]["n_docs"] == 1 and out[0]["lo_chars"] == 0
    # len 3 -> bucket 2 ([2,3]); len 4 and 7 -> bucket 3 ([4,7])
    assert out[2]["n_docs"] == 1
    assert out[3]["n_docs"] == 2 and (out[3]["lo_chars"], out[3]["hi_chars"]) == (4, 7)
    assert out[7]["n_docs"] == 1 and out[7]["lo_chars"] == 64
    assert out[3]["total_chars"] == 11
    # mass conservation
    assert sum(r["n_docs"] for r in out.values()) == 5


def test_length_histogram_partition_invariant(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.repeat(F.lit("ab "), (F.col("id") % 37 + 1).cast("int"))
        .alias("text"))
    a = sorted(map(tuple, length_histogram(docs).collect()))
    b = sorted(map(tuple, length_histogram(docs.repartition(11)).collect()))
    assert a == b


def test_url_templates_uppercase_hex_folds(spark):
    urls = spark.createDataFrame(
        [(f"https://h.com/x/DEADBEEF1234CAFE{i:04d}/y",) for i in range(5)],
        "url string")
    out = url_templates(urls, k=3, min_urls=2).collect()
    assert len(out) == 1 and out[0]["template"] == "/x/{hex}/y"
    assert out[0]["n_urls"] == 5


def test_page_templates_text_independent(spark):
    """Fingerprints depend on structure only: same template with different
    text hashes identically; a structural change hashes differently."""
    from supercrawler_spark.operators.templates import (page_templates,
                                                        template_stats)
    from pyspark.sql import functions as F
    pages = spark.createDataFrame(
        [("u1", "h.com", "<html><body><p>alpha</p></body></html>"),
         ("u2", "h.com", "<html><body><p>beta gamma</p></body></html>"),
         ("u3", "h.com", "<html><body><div>alpha</div></body></html>"),
         ("u4", "solo.com", "<html><body><p>x</p></body></html>")],
        "url string, host string, html string")
    fps = {r["url"]: r["tpl_hash"] for r in page_templates(pages).collect()}
    assert fps["u1"] == fps["u2"] != fps["u3"]
    st = {r["host"]: r for r in template_stats(page_templates(pages),
                                               min_pages=2).collect()}
    assert "solo.com" not in st  # below min_pages
    assert st["h.com"]["n_templates"] == 2
    assert abs(st["h.com"]["dominant_share"] - 2 / 3) < 1e-6
    # binary html column works too
    b = pages.withColumn("html", F.col("html").cast("binary"))
    fps_b = {r["url"]: r["tpl_hash"] for r in page_templates(b).collect()}
    assert fps_b == fps
