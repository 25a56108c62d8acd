"""Registrable-domain (eTLD+1 / "pay-level domain") extraction and per-PLD
crawl rollups.

Crawl policy at web scale is set per *registrable domain*, not per host —
politeness budgets, scope checks, blocklists, and dedup priors all key on
eTLD+1 ('news.bbc.co.uk' and 'www.bbc.co.uk' are one crawl citizen,
'a.github.io' and 'b.github.io' are two, per the PSL private section). The
reference scopes crawls by exact host (/root/reference/src/supercrawler.rs
scope check on Url::host_str); this operator adds the standard
public-suffix upgrade.

The suffix list is an embedded, deliberately small excerpt of the public
suffix list (the plug point for the full PSL at production); matching is
longest-suffix-wins, compiled into a whole-stage-codegen CASE chain over
`endswith` probes + anchored regexp extraction — no UDF, no join, no
shuffle for the per-URL column; the rollup is one map-side-combined
groupBy. Single-label hosts (e.g. 'localhost') and hosts that ARE a listed
suffix fall back to themselves.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

# excerpt of the PSL: multi-label public suffixes (incl. two private-
# registry entries, github.io / blogspot.com, which behave identically)
PUBLIC_SUFFIXES = [
    "co.uk", "ac.uk", "org.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in", "co.nz",
    "github.io", "blogspot.com",
]


def registrable_domain(host_col):
    """Column: eTLD+1 of ``host_col`` under PUBLIC_SUFFIXES, longest match
    first; plain two-label fallback; the host itself when it has no dot or
    is exactly a listed suffix."""
    host = F.lower(host_col)
    expr = F.coalesce(
        F.nullif(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1), F.lit("")),
        host)
    # longest-suffix-wins: apply shorter suffixes first so longer ones
    # override them at the head of the final WHEN chain
    for suf in sorted(PUBLIC_SUFFIXES, key=len):
        pat = r"([^.]+\." + re.escape(suf) + r")$"
        expr = F.when(host.endswith("." + suf),
                      F.regexp_extract(host, pat, 1)).otherwise(expr)
    return expr


def pld_stats(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """(pld, n_urls, n_hosts): crawl-budget rollup per registrable domain.
    Host parse + PLD classification fold into the scan projection; the
    aggregate is ONE hash shuffle on pld with map-side partial aggregation
    (count + distinct-host via two-level groupBy, so no per-group set
    buffers survive the exchange)."""
    host = F.regexp_extract(F.lower(F.col(url_col)), r"^[a-z]+://([^/]+)", 1)
    per_host = (urls
                .select(host.alias("host"))
                .groupBy("host").agg(F.count("*").alias("n_urls"))
                .withColumn("pld", registrable_domain(F.col("host"))))
    return (per_host.groupBy("pld")
            .agg(F.sum("n_urls").cast("long").alias("n_urls"),
                 F.count("*").cast("long").alias("n_hosts")))
