"""Fixed-point PageRank for frontier prioritization.

The north star asks for a *priority-ordered* frontier queue; link-graph
centrality (OPIC / PageRank) is the classic crawl-priority signal. This is a
fixed-iteration PageRank over the deterministic doc graph of
``operators/graph.py`` (3 out-edges per node), built so the result is
**bit-identical regardless of partitioning**:

- Ranks are BIGINT micro-units (SCALE = 10^12), never doubles: floating-point
  summation is order-dependent, and on a 1000-executor cluster the
  aggregation order is nondeterministic run to run. Integer sums commute, so
  the distributed result is reproducible and oracle-hashable.
- Per-edge contribution is ``(r * DAMP_NUM) div (DAMP_DEN * out_deg)`` with
  integral division — identical semantics in Spark (`div`) and ANSI SQL.

Scale shape: each iteration is one shuffle join (edges x ranks on src_id —
ranks is 16 bytes/row, so for realistic graphs AQE broadcasts it only when
tiny; otherwise both sides hash-partition on the 8-byte id) plus one
map-side-combinable groupBy(dst_id) sum, plus one left join back onto the
node set. Iterations are unrolled into a single Catalyst plan — no driver
collect between rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import graph

SCALE = 10 ** 12
DAMP_NUM = 85       # damping 0.85 as a ratio
DAMP_DEN = 100


def pagerank(docs: DataFrame, iters: int = 2, n_docs: int | None = None
             ) -> DataFrame:
    """(doc_id, rank) after ``iters`` synchronous iterations; ``rank`` is in
    fixed-point micro-units of SCALE (sum over nodes ~= SCALE up to
    truncation). r0 = SCALE/n; r' = (1-d)*SCALE/n + sum_in d*r_src/out_deg,
    all in integral arithmetic."""
    if n_docs is None:
        n_docs = docs.count()
    e = graph.edges(docs, n_docs).select("src_id", "dst_id")
    out_deg = graph.N_EDGES
    base = (SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n_docs)
    nodes = docs.select(F.col("doc_id").alias("id"))
    ranks = nodes.select("id", F.lit(SCALE // n_docs).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (e.join(ranks, e.src_id == ranks.id)
                   .select("dst_id",
                           F.expr(f"r * {DAMP_NUM} div {DAMP_DEN * out_deg}")
                           .alias("c"))
                   .groupBy("dst_id").agg(F.sum("c").alias("c")))
        ranks = (nodes.join(contrib, nodes.id == contrib.dst_id, "left")
                 .select("id",
                         (F.lit(base).cast("long")
                          + F.coalesce("c", F.lit(0).cast("long")))
                         .alias("r")))
    return ranks.select(F.col("id").alias("doc_id"), F.col("r").alias("rank"))
