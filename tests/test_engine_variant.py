"""§2.9 engine-variant mode: the ``main.rs`` copy differs from the canonical
``supercrawler.rs`` in the loose-text rule (non-empty vs len>10), depth floor
(5) and time budget (none). variant='main' must reproduce those semantics
end-to-end, engine ≡ oracle."""

import pytest

from supercrawler_spark import refspec
from supercrawler_spark.crawler import CrawlConfig, crawl
from supercrawler_spark.oracle import oracle_bfs
from supercrawler_spark.sources.synth import generate_corpus, load_tables

SHORT_LOOSE = ("<html><head><title>T</title></head><body>"
               "<div>tiny txt</div><p>paragraph body</p></body></html>")


def test_loose_text_rule_differs_between_variants():
    # 'tiny txt' is 8 bytes: dropped by canonical (len>10), kept by main
    canon = refspec.clean_to_mdx(SHORT_LOOSE, "https://h.example.com/x")
    main = refspec.clean_to_mdx(SHORT_LOOSE, "https://h.example.com/x",
                                variant="main")
    assert "tiny txt" not in canon
    assert "tiny txt" in main
    # everything else identical
    assert canon.replace("", "") in main.replace("tiny txt\n\n", "")


def test_variant_config_semantics():
    cfg = CrawlConfig(crawl_depth=2, time_limit_secs=300.0,
                      variant="main").validated()
    assert cfg.crawl_depth == 5          # main.rs depth floor
    assert cfg.time_limit_secs is None   # no budget in main.rs
    with pytest.raises(ValueError):
        CrawlConfig(variant="nope").validated()


def test_main_variant_crawl_matches_oracle(spark, corpus_sf0001,
                                           tmp_path_factory):
    pages, seeds, _ = load_tables(spark, corpus_sf0001)
    corpus = generate_corpus(0.001)
    cfg = CrawlConfig(crawl_depth=5, num_buckets=8, variant="main")
    res = crawl(spark, pages, seeds, cfg,
                store_dir=str(tmp_path_factory.mktemp("variant_main")))
    orc = oracle_bfs({p.url: (p.html, p.content_type) for p in corpus.pages},
                     corpus.seeds, crawl_depth=5, strip_tracking=True,
                     variant="main")
    got = {r["url"]: r["mdx"] for r in res.docs.collect()}
    exp = {u: m for u, _, m in orc.docs}
    assert set(got) == set(exp)
    for u in got:
        assert got[u] == exp[u], f"variant-main mdx differs for {u}"
