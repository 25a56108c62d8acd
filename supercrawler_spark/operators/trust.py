"""TrustRank + spam mass for crawl-frontier source vetting.

PageRank (operators/pagerank.py) scores raw link popularity; a web-scale
crawler also needs the complementary *trust* signal — Gyongyi et al.'s
TrustRank (VLDB'04): PageRank with teleport restricted to a manually
vetted seed whitelist, so rank mass can only flow OUT of trusted pages.
``spam mass`` (Gyongyi et al., 2006) is then the fraction of a page's
PageRank that did NOT arrive via trusted paths — the standard pre-fetch
spam-demotion signal for frontier prioritization (a high-PR page with
high spam mass is a link-farm target, not a fetch priority).

Reference anchor: the reference crawls whatever the scope filter admits
(/root/reference/src/main.rs scope set); trust/spam scoring is the
scale-path upgrade for prioritizing 10^10-URL frontiers.

Determinism discipline matches :mod:`pagerank`: BIGINT micro-units of
SCALE, integral ``div`` per edge, commutative integer sums — bit-identical
across partitionings and engines. The trusted seed set is the
deterministic whitelist ``doc_id % SEED_MOD == 0`` (both engines derive
it arithmetically). Scale shape per round: one edges x scores shuffle
join on the 8-byte id + one map-side-combinable groupBy(dst) sum + one
left join back onto the node set; the spam-mass join is id-keyed on two
16-byte-row rank tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import graph
from .pagerank import DAMP_DEN, DAMP_NUM, SCALE, pagerank

SEED_MOD = 17
PPM = 10 ** 6


def trustrank(docs: DataFrame, iters: int = 2, n_docs: int | None = None,
              seed_mod: int = SEED_MOD) -> DataFrame:
    """(doc_id, trust) after ``iters`` synchronous rounds: personalized
    PageRank whose teleport vector is uniform over the trusted seed set
    (doc_id % seed_mod == 0) and zero elsewhere. t0 = SCALE/n_seeds on
    seeds; t' = [seed] * (1-d)*SCALE/n_seeds + sum_in d*t_src/out_deg,
    all in integral arithmetic (micro-units of SCALE)."""
    if n_docs is None:
        n_docs = docs.count()
    n_seeds = docs.where(F.col("doc_id") % seed_mod == 0).count()
    if n_seeds == 0:
        raise ValueError("trustrank: empty seed whitelist")
    e = graph.edges(docs, n_docs).select("src_id", "dst_id")
    out_deg = graph.N_EDGES
    base = (SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n_seeds)
    nodes = docs.select(F.col("doc_id").alias("id"))
    is_seed = (F.col("id") % seed_mod) == 0
    t = nodes.select(
        "id",
        F.when(is_seed, F.lit(SCALE // n_seeds)).otherwise(F.lit(0))
        .cast("long").alias("t"))
    for _ in range(iters):
        contrib = (e.join(t, e.src_id == t.id)
                   .select("dst_id",
                           F.expr(f"t * {DAMP_NUM} div {DAMP_DEN * out_deg}")
                           .alias("c"))
                   .groupBy("dst_id").agg(F.sum("c").alias("c")))
        t = (nodes.join(contrib, nodes.id == contrib.dst_id, "left")
             .select("id",
                     (F.when(is_seed, F.lit(base)).otherwise(F.lit(0))
                      .cast("long")
                      + F.coalesce("c", F.lit(0).cast("long")))
                     .alias("t")))
    return t.select(F.col("id").alias("doc_id"), F.col("t").alias("trust"))


def spam_mass(docs: DataFrame, iters: int = 2, n_docs: int | None = None,
              seed_mod: int = SEED_MOD) -> DataFrame:
    """(doc_id, rank, trust, spam_mass_ppm): PageRank and TrustRank at the
    same iteration budget plus Gyongyi spam mass — the PageRank fraction
    not attributable to trusted paths, in integer parts-per-million:
    ``max(0, rank - trust) * 10^6 div rank``. Both vectors total ~SCALE,
    so the ratio is dimensionless; rank > 0 always (the uniform teleport
    floor), so the division is total."""
    if n_docs is None:
        n_docs = docs.count()
    r = pagerank(docs, iters=iters, n_docs=n_docs)
    t = trustrank(docs, iters=iters, n_docs=n_docs, seed_mod=seed_mod)
    return (r.join(t, "doc_id")
            .select("doc_id", "rank", "trust",
                    F.expr("greatest(0, rank - trust) * 1000000 div rank")
                    .cast("long").alias("spam_mass_ppm")))
