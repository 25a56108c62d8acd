"""Golden extraction fixtures (FIXTURES.md §5): every tests/fixtures/*.html
must extract byte-identically to its .golden.mdx / .golden.links pair —
through BOTH the pure spec and the live Spark pandas-UDF path (config
clamp units ride along here too)."""

import glob
import os

import pytest

from supercrawler_spark import refspec
from supercrawler_spark.crawler import CrawlConfig

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
URL = "https://fixtures.example.com/page"
NAMES = sorted(os.path.basename(p)[:-5] for p in glob.glob(f"{FIX}/*.html"))


@pytest.mark.parametrize("name", NAMES)
def test_golden_mdx(name):
    html = open(f"{FIX}/{name}.html").read()
    golden = open(f"{FIX}/{name}.golden.mdx").read()
    assert refspec.clean_to_mdx(html, URL) == golden


@pytest.mark.parametrize("name", NAMES)
def test_golden_links(name):
    html = open(f"{FIX}/{name}.html").read()
    golden = open(f"{FIX}/{name}.golden.links").read()
    expected = golden.split("\n") if golden else []
    assert refspec.extract_links(html, URL) == expected


def test_goldens_through_spark_udf(spark):
    """The Arrow-UDF path must produce the same bytes as the spec."""
    from pyspark.sql import functions as F

    from supercrawler_spark.functions import udfs

    rows = [(name, open(f"{FIX}/{name}.html").read().encode()) for name in NAMES]
    df = spark.createDataFrame(rows, "name string, html binary") \
        .withColumn("url", F.lit(URL)) \
        .withColumn("page", udfs.extract_page("url", "html"))
    got = {r["name"]: (r["page"]["mdx"], r["page"]["links"]) for r in df.collect()}
    for name in NAMES:
        golden_mdx = open(f"{FIX}/{name}.golden.mdx").read()
        golden_links = open(f"{FIX}/{name}.golden.links").read()
        expected_links = golden_links.split("\n") if golden_links else []
        assert got[name][0] == golden_mdx, name
        assert list(got[name][1]) == expected_links, name


def test_config_clamps():
    cfg = CrawlConfig(crawl_depth=9, max_urls=3, time_limit_secs=10).validated()
    assert cfg.crawl_depth == 5          # clamp [0,5] (rs:1151)
    assert cfg.max_urls == 5             # clamp [5,120] (rs:1149)
    assert cfg.time_limit_secs == 150.0  # clamp [150,600] (rs:1152)
    cfg2 = CrawlConfig(crawl_depth=-1, max_urls=500, time_limit_secs=1e9).validated()
    assert cfg2.crawl_depth == 0
    assert cfg2.max_urls == 120
    assert cfg2.time_limit_secs == 600.0
    # max_fetch_per_round=0 would defer everything every round (infinite
    # drain loop) — clamped to 1, in the main variant too
    assert CrawlConfig(max_fetch_per_round=0).validated() \
        .max_fetch_per_round == 1
    assert CrawlConfig(max_fetch_per_round=-5, variant="main").validated() \
        .max_fetch_per_round == 1
    assert CrawlConfig().validated().max_fetch_per_round is None

def test_extract_anchors_hrefs_match_links_goldens():
    """extract_anchors must walk the identical link set as extract_links
    (same prefilter/absolutize/fragment-strip) on every golden fixture —
    only ADDING the text capture."""
    import glob
    import os
    for path in sorted(glob.glob(f"{FIX}/*.html")):
        name = os.path.basename(path)[:-5]
        html = open(path).read()
        anchors = refspec.extract_anchors(html, URL)
        assert [a for a, _ in anchors] == refspec.extract_links(html, URL), name


def test_extract_anchors_text_capture():
    html = ('<html><body>'
            '<p><a href="/a">  Hello \n  <b>world</b> </a></p>'
            '<p><a href="img"><img src="x.png"/></a></p>'
            '<p><a href="#frag">skip</a>'
            '<a href="javascript:x()">skip</a>'
            '<a href="mailto:a@b">skip</a></p>'
            '<p><a href="https://other.example.com/p?q=1#z">Other</a></p>'
            '</body></html>')
    got = refspec.extract_anchors(html, "https://host.example.com/base/")
    assert got == [
        ("https://host.example.com/a", "Hello world"),
        ("https://host.example.com/base/img", ""),   # image link: empty text
        ("https://other.example.com/p?q=1", "Other"),  # fragment stripped
    ]
