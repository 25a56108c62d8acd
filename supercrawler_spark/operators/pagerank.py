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


def hits(docs: DataFrame, iters: int = 2, n_docs: int | None = None,
         edges: DataFrame | None = None) -> DataFrame:
    """(doc_id, hub, auth): HITS hubs-and-authorities after ``iters``
    synchronous rounds over the same deterministic doc graph — the
    complementary crawl-priority signal to :func:`pagerank` (authorities
    find content worth fetching, hubs find pages worth re-parsing for
    links).

    Each round: auth = in-edge sum of hubs, hub = out-edge sum of the NEW
    auths, each L1-normalized back to SCALE micro-units. The sums are exact
    BIGINT (combine-order-independent); the normalization is the single
    expression ``floor(x * (SCALE / total))`` — a pure function of two
    exact integers, mirrored verbatim in the DuckDB oracle, so the result
    is bit-identical across engines and partitionings (inputs stay below
    2^53 so the double products are exact). Scale shape matches pagerank
    per round — one edges-x-scores shuffle join + map-side-combinable sum
    per direction, plus a one-row total broadcast back; the node set never
    reshuffles wider than its 16-byte (id, score) rows.

    Unlike pagerank's linear unroll, each ``_norm`` references its input
    twice (total + main branch), so the UNROLLED plan grows ~4x per
    iteration: at the default 2 rounds that is a handful of small scan
    copies, but for ``iters`` beyond ~4 persist (or parquet-cut) the score
    tables between rounds — the same composed-lineage discipline as
    ``pipeline``'s semantic stage.
    """
    if iters < 1:
        raise ValueError("hits: iters must be >= 1")
    if n_docs is None:
        n_docs = docs.count()
    if edges is None:
        # NOTE: the default synthetic graph is 3-regular in BOTH directions
        # ((id*31+7k+3) mod n is a bijection per k), on which HITS converges
        # to the uniform vector — pass a degree-varied ``edges`` for a
        # non-trivial ranking (q_hits filters the graph for exactly this)
        edges = graph.edges(docs, n_docs)
    e = edges.select("src_id", "dst_id")
    nodes = docs.select(F.col("doc_id").alias("id"))
    h = nodes.select("id", F.lit(SCALE // n_docs).cast("long").alias("s"))
    a = None

    def _norm(scored: DataFrame) -> DataFrame:
        tot = scored.agg(F.sum("s").alias("_t"))
        return (scored.crossJoin(F.broadcast(tot))
                .select("id", F.floor(
                    F.col("s").cast("double")
                    * (F.lit(float(SCALE)) / F.col("_t").cast("double")))
                    .cast("long").alias("s")))

    for _ in range(iters):
        a_raw = (e.join(h, e.src_id == h.id)
                 .groupBy("dst_id").agg(F.sum("s").alias("s")))
        a = _norm(nodes.join(a_raw, nodes.id == a_raw.dst_id, "left")
                  .select("id", F.coalesce("s", F.lit(0).cast("long"))
                          .alias("s")))
        h_raw = (e.join(a, e.dst_id == a.id)
                 .groupBy("src_id").agg(F.sum("s").alias("s")))
        h = _norm(nodes.join(h_raw, nodes.id == h_raw.src_id, "left")
                  .select("id", F.coalesce("s", F.lit(0).cast("long"))
                          .alias("s")))
    return (nodes
            .join(h.withColumnRenamed("s", "hub"), "id")
            .join(a.withColumnRenamed("s", "auth"), "id")
            .select(F.col("id").alias("doc_id"), "hub", "auth"))


def opic(docs: DataFrame, iters: int = 2, n_docs: int | None = None
         ) -> DataFrame:
    """(doc_id, cash, history, importance): synchronous OPIC — Abiteboul's
    On-line Page Importance Computation (WWW'03), the crawl-ordering signal
    designed to be computed WHILE crawling (unlike PageRank it needs no
    materialized converged fixpoint: page importance ~ cash accumulated so
    far, so the frontier can be re-prioritized after every round).

    Each round: every node banks its cash into history and distributes it
    equally over its out-edges (integral ``div`` — truncation dust is
    dropped, the documented deviation from the paper's virtual node);
    ``importance = history + cash`` after ``iters`` rounds. Same
    determinism discipline as :func:`pagerank`: BIGINT micro-units of
    SCALE, commutative integer sums, bit-identical across partitionings
    and engines. Scale shape per round: one edges-x-state shuffle join on
    the 8-byte id + one map-side-combinable groupBy(dst) sum + one left
    join back — state rows are 24 bytes, the graph never rebuilds."""
    if n_docs is None:
        n_docs = docs.count()
    e = graph.edges(docs, n_docs).select("src_id", "dst_id")
    out_deg = graph.N_EDGES
    nodes = docs.select(F.col("doc_id").alias("id"))
    state = nodes.select(
        "id", F.lit(SCALE // n_docs).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"))
    for _ in range(iters):
        give = (e.join(state, e.src_id == state.id)
                .select("dst_id",
                        F.expr(f"cash div {out_deg}").alias("g"))
                .groupBy("dst_id").agg(F.sum("g").alias("g")))
        state = (state.join(give, state.id == give.dst_id, "left")
                 .select("id",
                         F.coalesce("g", F.lit(0).cast("long"))
                         .alias("cash"),
                         (F.col("hist") + F.col("cash")).alias("hist")))
    return state.select(
        F.col("id").alias("doc_id"), "cash",
        F.col("hist").alias("history"),
        (F.col("cash") + F.col("hist")).alias("importance"))
