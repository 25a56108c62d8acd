"""Sitemap parsing: protocol edge cases on handwritten XML, fixture
round-trip equality, and a codegen plan audit (no Python, no xpath UDF)."""

from pyspark.sql import functions as F

from supercrawler_spark.operators import sitemaps


def _parse_one(spark, xml):
    df = spark.createDataFrame([("h.example.com", xml)], "host string, xml string")
    return sitemaps.parse_sitemaps(df).orderBy("pos").collect()


def test_parse_basic_entry(spark):
    xml = ('<?xml version="1.0"?><urlset>'
           "<url><loc>https://h/a</loc><lastmod>2026-01-02</lastmod>"
           "<changefreq>daily</changefreq></url></urlset>")
    rows = _parse_one(spark, xml)
    assert len(rows) == 1
    r = rows[0]
    assert (r.pos, r.loc, r.lastmod, r.changefreq) == \
        (0, "https://h/a", "2026-01-02", "daily")


def test_optional_tags_null_and_loc_trimmed(spark):
    xml = ("<urlset><url><loc>  https://h/x \n</loc></url>"
           "<url><loc>https://h/y</loc><changefreq>weekly</changefreq>"
           "</url></urlset>")
    rows = _parse_one(spark, xml)
    assert [(r.loc, r.lastmod, r.changefreq) for r in rows] == [
        ("https://h/x", None, None),
        ("https://h/y", None, "weekly")]


def test_invalid_entry_without_loc_dropped(spark):
    xml = ("<urlset><url><lastmod>2026-01-01</lastmod></url>"
           "<url><loc>https://h/ok</loc></url></urlset>")
    rows = _parse_one(spark, xml)
    assert [r.loc for r in rows] == ["https://h/ok"]
    # pos reflects original element order (the invalid entry held slot 0)
    assert rows[0].pos == 1


def test_entry_order_preserved(spark):
    xml = "<urlset>" + "".join(
        f"<url><loc>https://h/{i}</loc></url>" for i in range(50)) + "</urlset>"
    rows = _parse_one(spark, xml)
    assert [r.loc for r in rows] == [f"https://h/{i}" for i in range(50)]
    assert [r.pos for r in rows] == list(range(50))


def test_fixture_roundtrip_counts(spark):
    docs = spark.range(120).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"))
    out = sitemaps.sitemap_seeds(docs)
    assert out.count() == 120
    assert out.select("loc").distinct().count() == 120
    # docs with doc_id % 11 == 0 omit lastmod
    assert out.filter(F.col("lastmod").isNull()).count() == \
        sum(1 for d in range(120) if d % 11 == 0)
    assert set(r.changefreq for r in out.select("changefreq")
               .distinct().collect()) == {"daily", "weekly", "monthly"}


def test_parse_plan_is_codegen_jvm(spark):
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"), F.lit("s0").alias("source"))
    plan = sitemaps.sitemap_seeds(docs) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan          # no UDF fallback in the row path
    assert "Generate" in plan            # posexplode stayed native


def _directives(spark, body):
    df = spark.createDataFrame([("h.example.com", body)],
                               "host string, body string")
    return sitemaps.sitemap_directives(df).orderBy("line_no").collect()


def test_directive_extraction_case_and_comments(spark):
    body = ("User-agent: *\r\n"
            "Disallow: /private\n"
            "# Sitemap: https://decoy.invalid/sitemap.xml\n"
            "SITEMAP: https://h/s1.xml\n"
            "sitemap:https://h/s2.xml   # inline comment\n"
            "Sitemap:\n")
    rows = _directives(spark, body)
    assert [(r.line_no, r.sitemap_url) for r in rows] == [
        (3, "https://h/s1.xml"), (4, "https://h/s2.xml")]


def test_directive_fixture_roundtrip(spark):
    docs = spark.range(250).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("source"))
    out = sitemaps.sitemap_directives(
        sitemaps.build_robots_fixture(docs)).collect()
    got = sorted((r.host, r.sitemap_url) for r in out)
    # both hosts have 125 docs (>= 100): primary + news sitemap each
    assert got == sorted(
        [(f"s{i}.example.com", f"https://s{i}.example.com/sitemap.xml")
         for i in (0, 1)] +
        [(f"s{i}.example.com", f"https://s{i}.example.com/sitemap-news.xml")
         for i in (0, 1)])


def test_directive_plan_is_jvm(spark):
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"), F.lit("s0").alias("source"))
    plan = sitemaps.sitemap_directives(sitemaps.build_robots_fixture(docs)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_parse_sitemap_index_basic(spark):
    xml = ('<?xml version="1.0"?><sitemapindex>'
           "<sitemap><loc>https://h/s-0.xml</loc>"
           "<lastmod>2026-02-03</lastmod></sitemap>"
           "<sitemap><loc> https://h/s-1.xml </loc></sitemap>"
           "<sitemap><lastmod>2026-01-01</lastmod></sitemap>"
           "</sitemapindex>")
    df = spark.createDataFrame([("h.example.com", xml)],
                               "host string, xml string")
    rows = sitemaps.parse_sitemap_index(df).orderBy("pos").collect()
    assert [(r.pos, r.sitemap_url, r.lastmod) for r in rows] == [
        (0, "https://h/s-0.xml", "2026-02-03"),
        (1, "https://h/s-1.xml", None)]


def test_index_expansion_roundtrip(spark):
    docs = spark.range(90).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("source"))
    out = sitemaps.sitemap_index_seeds(docs, shards=3)
    assert out.count() == 90
    assert out.select("loc").distinct().count() == 90
    # each (host, child sitemap) holds its shard's docs in doc_id order
    r = out.filter((F.col("host") == "s0.example.com") &
                   (F.col("from_sitemap").endswith("sitemap-0.xml"))) \
        .orderBy("pos").collect()
    want = [d for d in range(90) if d % 2 == 0 and d % 3 == 0]
    assert [x.loc for x in r] == [
        f"https://s0.example.com/doc/{d}" for d in want]
    assert [x.pos for x in r] == list(range(len(want)))
