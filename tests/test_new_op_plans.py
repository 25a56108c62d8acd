"""Plan audits for the round-2-continuation operators: the physical plans
must keep their scale invariants — equi-joins only (no cartesian /
nested-loop fallbacks except deliberate one-row broadcasts), no Python in
JVM-only paths."""

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_host_mirrors_no_allpairs_join(spark):
    """The mirror overlap must come from the digest-keyed equi-join —
    a BroadcastNestedLoopJoin would mean the host<host theta condition
    became the join itself (all-pairs)."""
    plan = _plan(entry_mod.q_host_mirrors(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_content_drift_joins_signatures_not_text(spark):
    """Only url/hash-keyed equi-joins; pure JVM (no extraction UDFs in the
    drift path)."""
    plan = _plan(entry_mod.q_content_drift(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_classifier_broadcasts_weights(spark):
    """The weight table must reach the feature rows via broadcast; the
    only allowed nested-loop is a one-row totals cross join (there are
    none here)."""
    plan = _plan(entry_mod.q_quality_classifier(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_triangles_equijoins_only(spark):
    """The triangle algebra (wedge join + closing-edge semi-join) must be
    equi-joins. The only nested loops allowed are the FIXTURE's deliberate
    3-row broadcast cross joins (graph.edges' k-range) — every such line
    must be a Cross build, and the wedge/closing joins themselves hash or
    sort-merge on keys."""
    plan = _plan(entry_mod.q_host_triangles(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line  # edges() fixture k-range only
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan  # the closing-edge check stays a semi-join


def test_cdx_pure_codegen_projection(spark):
    """The SURT/digest projection is plain string expressions — scan +
    project with no Python and no join at all in the rows stage."""
    from supercrawler_spark.operators.cdx import cdx_rows
    plan = _plan(cdx_rows(entry_mod._cdx_pages(spark, SF_DIR)))
    assert "EvalPython" not in plan
    for op in ("SortMergeJoin", "HashJoin", "NestedLoopJoin",
               "CartesianProduct", "Exchange"):
        assert op not in plan
    assert "*(1)" in plan  # whole-stage codegen stage marker


def test_cdx_distributed_rank_no_global_window(spark):
    """The REGISTERED cdx_index query now runs the two-phase distributed
    rank: every Window in its plan must be partitioned (by the range
    partition id), never a single-partition global window that would
    serialize the whole 10^10-row index through one task."""
    from supercrawler_spark.operators.cdx import cdx_index
    out, cache = cdx_index(entry_mod._cdx_pages(spark, SF_DIR), n_shards=4,
                           exact=False)
    try:
        plan = _plan(out)
        for line in plan.splitlines():
            if line.lstrip().startswith("Window"):
                assert "_pid" in line, f"unpartitioned window: {line}"
        assert "EvalPython" not in plan
    finally:
        cache.unpersist()


def test_cdx_registered_query_matches_exact_rank(spark):
    """q_cdx_index (distributed, temp-dir materialized) row-for-row equals
    the exact single-window rank."""
    from supercrawler_spark.operators.cdx import cdx_index
    got = {tuple(r) for r in
           entry_mod.q_cdx_index(spark, SF_DIR).collect()}
    want = {tuple(r) for r in
            cdx_index(entry_mod._cdx_pages(spark, SF_DIR), n_shards=4,
                      exact=True).collect()}
    assert got == want


def test_dsir_single_bucket_broadcast(spark):
    """DSIR scoring joins the 256-row model table via broadcast; the
    one-row totals cross join is the only nested-loop allowed."""
    plan = _plan(entry_mod.q_dsir_logweights(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # one-row totals only
    assert "EvalPython" not in plan


def test_trained_ann_plans_no_allpairs(spark):
    """ivf_ann_topk_trained / ivfpq_ann_topk: the probe must be an
    equi-join on cell (BroadcastHashJoin), never a corpus-wide nested
    loop; the only nested loops allowed are the bounded one-row quantizer
    broadcasts (Cross build); everything stays JVM-side."""
    for q in (entry_mod.q_ivf_ann_topk_trained, entry_mod.q_ivfpq_ann_topk):
        plan = _plan(q(spark, SF_DIR))
        assert "CartesianProduct" not in plan
        for line in plan.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                assert "Cross" in line  # one-row centroid/codebook builds
        assert "BroadcastHashJoin" in plan
        assert "EvalPython" not in plan


def test_remove_duplicate_spans_no_window_no_python(spark):
    """The cut must pick keepers with the hash-keyed min(struct)
    aggregation — a per-hash Window rank would serialize a corpus-wide
    boilerplate span's occurrences through one sort partition. Pure JVM,
    equi-joins only."""
    plan = _plan(entry_mod.q_remove_duplicate_spans(spark, SF_DIR))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_bm25_broadcasts_small_sides_takeordered(spark):
    """df table and (N, avgdl) totals broadcast; the only cross-join is the
    one-row totals broadcast; top-k is TakeOrdered, not a global sort; the
    rank window runs over the k limited rows only (after the take)."""
    plan = _plan(entry_mod.q_bm25_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    # the totals cross-join must be the broadcast form
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_trustrank_equijoins_only(spark):
    """TrustRank's per-round plan is the pagerank family: edge x score
    equi-joins and map-side-combinable sums — the only nested loops are
    the edges() fixture's deliberate 3-row k-range broadcasts."""
    plan = _plan(entry_mod.q_trustrank(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line  # edges() fixture k-range only
    assert "EvalPython" not in plan


def test_domain_kl_single_pass_over_token_stream(spark):
    """The exploded token stream must be aggregated EXACTLY ONCE: one
    Generate (explode) feeding one (source, token) exchange; corpus and
    per-source totals ride windows over the small count table, and the
    n_all scalar comes from an explode-free size scan. Everything stays
    JVM-side; the only nested loop is the one-row grand-total
    broadcast."""
    plan = _plan(entry_mod.q_domain_kl(spark, SF_DIR))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Generate explode") == 1
    st_exchanges = [l for l in plan.splitlines()
                    if "Exchange hashpartitioning" in l
                    and "token" in l and "source" in l]
    assert len(st_exchanges) == 1  # the count shuffle (partial agg above)


def test_token_budget_select_no_global_window(spark):
    """The running token total must ride the range partition id — a
    single-partition global window would serialize the corpus ranking
    through one task."""
    from supercrawler_spark.operators.trainmix import token_budget_select
    docs = entry_mod._docs(spark, SF_DIR)
    out, cache = token_budget_select(docs, budget_tokens=10_000)
    try:
        plan = _plan(out)
        for line in plan.splitlines():
            if line.lstrip().startswith("Window"):
                assert "_pid" in line, f"unpartitioned window: {line}"
        assert "EvalPython" not in plan
    finally:
        cache.unpersist()


def test_fetch_waves_single_host_shuffle(spark):
    """One hash shuffle on host; the delay table arrives by broadcast."""
    plan = _plan(entry_mod.q_fetch_waves(spark, SF_DIR))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
