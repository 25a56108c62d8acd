"""CDX/SURT index, inverted index, and DSIR importance-weight tests.

Oracle parity for all four queries is covered generically by
tests/test_oracle_parity.py; these tests pin the semantics the oracle can't
see: SURT edge cases, exact-vs-distributed rank equality, posting-list
banding, and the directional sanity of the DSIR weight."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from supercrawler_spark.operators.cdx import (cdx_index, cdx_rows,
                                              cdx_shard_bounds, surt_expr)
from supercrawler_spark.operators.dsir import dsir_logweights
from supercrawler_spark.operators.terms import inverted_index

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("url,expected", [
    ("https://www.example.com/a/b?q=1", "com,example,www)/a/b?q=1"),
    ("HTTPS://User@WWW.Example.COM:8443/A/b?q=1#frag",
     "com,example,www)/A/b?q=1"),
    ("http://example.com", "com,example)/"),
    ("https://sub.host.co.uk:80/", "uk,co,host,sub)/"),
    ("https://example.com/path#frag", "com,example)/path"),
    ("not-a-url", ")/"),
])
def test_surt_cases(spark, url, expected):
    got = (spark.createDataFrame([(url,)], "url string")
           .select(surt_expr(F.col("url")).alias("s")).collect()[0]["s"])
    assert got == expected


def test_surt_prefix_adjacency(spark):
    """The point of SURT: all pages of a host, and all subdomains of a
    domain, are contiguous under the key's total order."""
    urls = ["https://a.example.com/x", "https://example.com/y",
            "https://b.other.org/z", "https://example.com/a",
            "https://www.example.com/w"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = sorted(r["s"] for r in
                  df.select(surt_expr(F.col("url")).alias("s")).collect())
    # every com,example-rooted key sorts before any org key
    com = [s for s in rows if s.startswith("com,example")]
    assert com == rows[:len(com)]


def test_cdx_exact_matches_distributed_rank(spark):
    """The scale path (two-phase dense seq over repartitionByRange) must
    produce exactly the single-window exact ranking."""
    pages = entry_mod._cdx_pages(spark, SF_DIR)
    exact = {(r["rank"], r["surt"], r["shard"])
             for r in cdx_index(pages, n_shards=4, exact=True).collect()}
    dist_df, cache = cdx_index(pages, n_shards=4, exact=False)
    try:
        dist = {(r["rank"], r["surt"], r["shard"])
                for r in dist_df.collect()}
    finally:
        cache.unpersist()
    assert exact == dist


def test_cdx_shards_are_disjoint_ordered_ranges(spark):
    pages = entry_mod._cdx_pages(spark, SF_DIR)
    bounds = (cdx_shard_bounds(cdx_index(pages, n_shards=4, exact=True))
              .orderBy("shard").collect())
    assert [b["shard"] for b in bounds] == [0, 1, 2, 3]
    total = sum(b["n_rows"] for b in bounds)
    assert total == pages.count()
    # near-equal sizes and non-overlapping, ordered SURT ranges
    sizes = [b["n_rows"] for b in bounds]
    assert max(sizes) - min(sizes) <= 1
    for prev, nxt in zip(bounds, bounds[1:]):
        assert prev["surt_hi"] <= nxt["surt_lo"]


def test_cdx_digest_groups_identical_text(spark):
    pages = entry_mod._cdx_pages(spark, SF_DIR)
    rows = cdx_rows(pages)
    n_digests = rows.select("digest").distinct().count()
    n_texts = pages.select("text").distinct().count()
    assert n_digests == n_texts


def test_inverted_index_bands_and_postings(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha beta beta"), (2, "alpha gamma"),
         (3, "alpha"), (4, "alpha")],
        "doc_id long, text string")
    out = {r["term"]: r for r in
           inverted_index(docs, min_df=2, max_df=4).collect()}
    # df counts documents, not occurrences (doc 1 has beta twice)
    assert out["beta"]["df"] == 2 and out["beta"]["postings"] == "0,1"
    # hapax dropped by min_df; stopword-grade term dropped by max_df
    assert "gamma" not in out
    assert "alpha" not in out  # df=5 > max_df=4
    assert set(out) == {"beta"}


def test_dsir_separates_target_from_offtarget(spark):
    """English docs must score higher on average than non-English ones —
    the weight is the log ratio toward the lang='en' target model."""
    docs = entry_mod._docs(spark, SF_DIR)
    w = dsir_logweights(docs, target_lang="en", n_buckets=256)
    j = w.join(docs.select("doc_id", "lang"), "doc_id")
    avg = {r["is_en"]: r["m"] for r in
           (j.groupBy((F.col("lang") == "en").alias("is_en"))
            .agg(F.avg("dsir_logweight").alias("m")).collect())}
    # the synthetic corpus shares most vocabulary across languages, so the
    # gap is small — but the ORDER must hold: en looks more en-target-like
    assert avg[True] > avg[False]


def test_dsir_strong_separation_on_disjoint_vocab(spark):
    """With disjoint vocabularies the weight must split by sign: target-
    vocab docs positive, off-target negative, and a mixed doc in between."""
    rows = [(i, "aaa bbb ccc ddd", "en") for i in range(4)] \
        + [(i + 4, "xxx yyy zzz www", "zz") for i in range(4)] \
        + [(8, "aaa bbb xxx yyy", "mx")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = {r["doc_id"]: r["dsir_logweight"]
         for r in dsir_logweights(docs, target_lang="en",
                                  n_buckets=64).collect()}
    assert w[0] > 0 > w[4]
    assert w[0] > w[8] > w[4]
    assert all(r is not None for r in w.values()) and len(w) == 9


def test_warc_offsets_contiguous_per_segment(spark):
    """Within each segment, records tile the file: offsets start at 0 and
    each record begins where the previous ends."""
    from supercrawler_spark.operators.cdx import warc_offsets
    pages = entry_mod._cdx_pages(spark, SF_DIR)
    rows = warc_offsets(pages, n_segments=4).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["segment"], []).append(r)
    assert set(by_seg) <= {0, 1, 2, 3} and len(by_seg) == 4
    for seg, recs in by_seg.items():
        recs.sort(key=lambda r: r["offset"])
        pos = 0
        for r in recs:
            assert r["offset"] == pos
            assert r["rec_len"] > 64
            pos += r["rec_len"]
    assert sum(len(v) for v in by_seg.values()) == pages.count()


def test_bitext_candidates_semantics(spark):
    from supercrawler_spark.operators.bitext import bitext_candidates
    urls = spark.createDataFrame(
        [("https://a.com/en/pricing",), ("https://a.com/fr/pricing",),
         ("https://a.com/de/pricing",), ("https://a.com/en/about",),
         ("https://b.com/en/pricing",),     # other host: no cross-pairing
         ("https://a.com/pricing",),        # no lang segment: excluded
         ("https://a.com/en/pricing?v=2",)],  # dup (key,lang): min() wins
        "url string")
    out = bitext_candidates(urls, langs=("en", "fr", "de"))
    pairs = {(r["lang_a"], r["lang_b"], r["url_a"], r["url_b"])
             for r in out.collect()}
    assert ("en", "fr", "https://a.com/en/pricing",
            "https://a.com/fr/pricing") in pairs
    assert ("de", "en", "https://a.com/de/pricing",
            "https://a.com/en/pricing") in pairs
    assert ("de", "fr", "https://a.com/de/pricing",
            "https://a.com/fr/pricing") in pairs
    # /en/about has no twin; b.com never pairs with a.com
    assert len(pairs) == 3
    assert all("about" not in p[2] and "b.com" not in p[2] for p in pairs)


def test_warc_offsets_duplicate_urls_and_bytes(spark):
    """Duplicate-URL captures must tile disjointly (ROWS frame, digest
    tie-break), and rec_len counts UTF-8 BYTES, not characters."""
    from supercrawler_spark.operators.cdx import warc_offsets
    pages = spark.createDataFrame(
        [("https://h/a", "first capture text"),
         ("https://h/a", "second capture different"),
         ("https://h/b", "日本語テキスト")],
        "url string, text string")
    rows = warc_offsets(pages, n_segments=1).collect()
    recs = sorted(rows, key=lambda r: r["offset"])
    pos = 0
    for r in recs:
        assert r["offset"] == pos
        pos += r["rec_len"]
    jp = [r for r in rows if r["url"] == "https://h/b"][0]
    assert jp["rec_len"] == 64 + len(b"https://h/b") \
        + len("日本語テキスト".encode("utf-8"))


def test_bitext_inner_lang_segment_not_normalized(spark):
    """Only the FIRST /{lang}/ segment defines the site key: pages that
    differ in a later language segment are different pages."""
    from supercrawler_spark.operators.bitext import bitext_candidates
    urls = spark.createDataFrame(
        [("https://x.com/en/docs/de/page",),
         ("https://x.com/fr/docs/es/page",),
         ("https://x.com/fr/docs/de/page",)],
        "url string")
    pairs = {(r["lang_a"], r["lang_b"], r["url_b"]) for r in
             bitext_candidates(urls, langs=("en", "fr", "de", "es"))
             .collect()}
    # en/docs/de pairs ONLY with fr/docs/de — not with fr/docs/es
    assert pairs == {("en", "fr", "https://x.com/fr/docs/de/page")}
