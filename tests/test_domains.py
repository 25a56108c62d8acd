"""Unit tests for registrable-domain extraction (operators/domains):
longest-suffix-wins PSL matching, private-registry entries, fallbacks."""

from pyspark.sql import functions as F

from supercrawler_spark.operators.domains import pld_stats, registrable_domain


def _pld(spark, *hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    rows = df.select("host", registrable_domain(F.col("host"))
                     .alias("pld")).collect()
    return {r["host"]: r["pld"] for r in hosts and rows}


def test_multilabel_public_suffixes(spark):
    m = _pld(spark, "www.bbc.co.uk", "news.bbc.co.uk", "example.com.au",
             "deep.sub.ex.co.jp")
    assert m["www.bbc.co.uk"] == "bbc.co.uk"
    assert m["news.bbc.co.uk"] == "bbc.co.uk"
    assert m["example.com.au"] == "example.com.au"
    assert m["deep.sub.ex.co.jp"] == "ex.co.jp"


def test_private_registry_suffixes(spark):
    m = _pld(spark, "alice.github.io", "bob.github.io", "x.blogspot.com")
    assert m["alice.github.io"] == "alice.github.io"
    assert m["bob.github.io"] == "bob.github.io"
    assert m["x.blogspot.com"] == "x.blogspot.com"


def test_two_label_fallback_and_case(spark):
    m = _pld(spark, "a.b.example.org", "WWW.Example.COM")
    assert m["a.b.example.org"] == "example.org"
    assert m["WWW.Example.COM"] == "example.com"


def test_degenerate_hosts(spark):
    m = _pld(spark, "localhost", "co.uk")
    assert m["localhost"] == "localhost"
    # a host that IS a public suffix falls back to itself
    assert m["co.uk"] == "co.uk"


def test_pld_stats_rollup(spark):
    urls = ["https://www.bbc.co.uk/a", "https://news.bbc.co.uk/b",
            "https://www.bbc.co.uk/c", "https://a.github.io/d",
            "https://b.github.io/e"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = {r["pld"]: r for r in pld_stats(df).collect()}
    assert rows["bbc.co.uk"]["n_urls"] == 3
    assert rows["bbc.co.uk"]["n_hosts"] == 2
    assert rows["a.github.io"]["n_urls"] == 1
    assert len(rows) == 3
