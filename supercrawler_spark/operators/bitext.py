"""Bitext candidate mining: pair language-variant URLs of the same page.

Parallel-corpus pipelines (ParaCrawl, CCMatrix) start from exactly this
operator: most multilingual sites encode the language as one URL path
segment (``/en/pricing`` vs ``/fr/pricing``), so candidate document pairs
for translation alignment come from matching URLs that differ ONLY in that
segment. It's the highest-precision, cheapest signal available — content
alignment (embedding similarity) runs only on the candidates this emits.

Spark shape: normalize the language segment out of the URL (pure regexp,
codegen), reduce to one deterministic URL per (site-key, lang), then a
key-keyed self-join emits ordered language pairs. The join key is the
normalized URL, so fan-out per key is at most |langs| — never quadratic in
a host's page count; the hot-key degenerate case is capped by the language
whitelist itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

LANGS = ("en", "fr", "de", "es", "zh")


def bitext_candidates(urls: DataFrame, langs: tuple = LANGS,
                      url_col: str = "url") -> DataFrame:
    """(site_key, lang_a, url_a, lang_b, url_b): ordered language-pair URL
    candidates. ``site_key`` is the URL with its first whitelisted
    ``/{lang}/`` path segment replaced by ``/{*}/``; URLs with no such
    segment emit nothing. Duplicate URLs per (key, lang) reduce to the
    lexicographic minimum so the pairing is deterministic."""
    alt = "|".join(langs)
    pat = f"/({alt})/"
    # replace ONLY the first /{lang}/ segment: a global replace would
    # normalize inner segments too, pairing pages that differ in a later
    # language segment (/en/docs/de/x vs /fr/docs/es/x are NOT the same
    # page). The anchored non-greedy full-string pattern rewrites at most
    # once; regexp_extract's first-match lang is the same leftmost segment.
    first_pat = f"^(.*?)/({alt})/(.*)$"
    d = urls.select(
        F.regexp_replace(F.col(url_col), first_pat, "$1/{*}/$3")
        .alias("site_key"),
        F.regexp_extract(F.col(url_col), pat, 1).alias("lang"),
        F.col(url_col).alias("url"))
    d = (d.filter(F.col("lang") != "")
         .groupBy("site_key", "lang").agg(F.min("url").alias("url")))
    a = d.select("site_key", F.col("lang").alias("lang_a"),
                 F.col("url").alias("url_a"))
    b = d.select("site_key", F.col("lang").alias("lang_b"),
                 F.col("url").alias("url_b"))
    return (a.join(b, "site_key")
            .filter(F.col("lang_a") < F.col("lang_b"))
            .select("site_key", "lang_a", "url_a", "lang_b", "url_b"))
