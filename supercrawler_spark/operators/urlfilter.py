"""URL-level document filtering — the RefinedWeb/C4-style *soft* URL
blocklist: instead of a binary domain ban, every URL accumulates a weighted
score from (a) banned words matched as whole path/query segments (strict
match, high weight), (b) banned words matched as substrings anywhere in the
URL (soft match, low weight), and (c) an exact-host hard blocklist; a
document is blocked when the score reaches a threshold or its host is
hard-listed. This is the adult/fraud/gambling pre-filter that runs BEFORE
any text is fetched or scored, so at 100 TB it prunes the frontier at
URL-metadata scan speed — pure JVM expressions over one projection, the
word lists compiled into the plan as literals (no join, no UDF, no shuffle).

Mirrors the reference's traversal-side filtering stance (predicates prune
the frontier, never mutate rows — cf. /root/reference/src/supercrawler.rs
href prefilter + scope checks) extended with the standard corpus-curation
blocklist semantics (RefinedWeb §2.1 "URL filtering": word weights + an
aggregated banned-domain list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (word, strict_weight, soft_weight): strict = the word appears as a whole
# lowercase segment of the path/query ('/casino/', '?casino=1'); soft = the
# word appears anywhere as a substring ('megacasino-hub'). Weights follow
# the RefinedWeb convention of scoring strict matches far above incidental
# substrings. Deliberately tiny + benign here: the list is a plug point
# (swap in the aggregated public blocklists for production).
BLOCK_WORDS = [
    ("casino", 5, 2),
    ("poker", 5, 2),
    ("viagra", 5, 2),
    ("warez", 5, 2),
    ("spam", 3, 1),
    ("free-money", 3, 1),
]

# exact registrable-host bans (the hard list)
BLOCK_HOSTS = ["badco.example.com", "spamnet.example.org"]

DEFAULT_THRESHOLD = 5


def url_blocklist_score(urls: DataFrame, url_col: str = "url",
                        threshold: int = DEFAULT_THRESHOLD,
                        words=None, hosts=None) -> DataFrame:
    """(url, host, block_score, hard_blocked, blocked): weighted soft-match
    URL filter.

    For each (word, strict_w, soft_w) in ``words``: +strict_w when the word
    is a whole ``[^a-z0-9]``-delimited segment of the lowercased URL,
    else +soft_w when it appears as any substring. ``hard_blocked`` is the
    exact-host ban; ``blocked = hard_blocked OR score >= threshold``.

    Strict matches are detected with one compiled regex per word
    ``(^|[^a-z0-9])word([^a-z0-9]|$)`` over the lowercased URL; soft with
    ``contains``. Everything folds into a single whole-stage-codegen
    projection: at a 10^10-URL frontier this adds zero shuffles and reads
    only the url column (column-pruned scan).
    """
    words = BLOCK_WORDS if words is None else words
    hosts = BLOCK_HOSTS if hosts is None else hosts
    low = F.lower(F.col(url_col))
    host = F.regexp_extract(low, r"^[a-z]+://([^/]+)", 1)
    score = F.lit(0)
    for word, strict_w, soft_w in words:
        strict = low.rlike(f"(^|[^a-z0-9]){word}([^a-z0-9]|$)")
        soft = low.contains(word)
        score = score + (F.when(strict, F.lit(strict_w))
                         .when(soft, F.lit(soft_w))
                         .otherwise(F.lit(0)))
    hard = host.isin(hosts)
    return urls.select(
        F.col(url_col).alias("url"),
        host.alias("host"),
        score.cast("long").alias("block_score"),
        hard.alias("hard_blocked"),
        (hard | (score >= threshold)).alias("blocked"),
    )
