"""Line-level corpus dedup (boilerplate removal) and fixed-point PageRank.
Oracle twins live in test_oracle_parity; these verify operator semantics."""

import pytest

from supercrawler_spark.operators import linededup, pagerank


@pytest.fixture(scope="module")
def docs(spark):
    nav = "NAV | Home | About | Contact"
    foot = "(c) example footer 2026"
    rows = []
    for i in range(20):
        body = "\n".join([nav, f"unique content line {i}", foot, "", "ok"])
        rows.append((i, "en", "alpha", body))
    # one doc with no boilerplate at all
    rows.append((20, "en", "beta", "standalone line\nanother one"))
    # one doc that is ALL boilerplate
    rows.append((21, "en", "beta", nav + "\n" + foot))
    return spark.createDataFrame(
        rows, "doc_id LONG, lang STRING, source STRING, text STRING")


def test_line_dedup_drops_boilerplate_keeps_content(docs):
    out = {r["doc_id"]: r
           for r in linededup.line_dedup(docs, min_df=5).collect()}
    assert len(out) == 22
    for i in range(20):
        r = out[i]
        assert r["n_lines"] == 5 and r["n_dropped"] == 2
        # order preserved; short/blank lines survive (< min_chars)
        assert r["text_clean"] == f"unique content line {i}\n\nok"
    assert out[20]["n_dropped"] == 0
    assert out[20]["text_clean"] == "standalone line\nanother one"
    assert out[21]["n_dropped"] == 2 and out[21]["text_clean"] == ""


def test_line_dedup_min_chars_guard(docs):
    # with a huge min_chars nothing is ever eligible to drop
    out = linededup.line_dedup(docs, min_df=2, min_chars=10_000).collect()
    assert all(r["n_dropped"] == 0 for r in out)


def test_line_dedup_deterministic_under_repartition(docs):
    a = sorted(map(tuple, linededup.line_dedup(docs, min_df=5).collect()))
    b = sorted(map(tuple, linededup.line_dedup(
        docs.repartition(7), min_df=5).collect()))
    assert a == b


@pytest.fixture(scope="module")
def graph_docs(spark):
    rows = [(i, "en", "alpha", f"doc {i}") for i in range(50)]
    return spark.createDataFrame(
        rows, "doc_id LONG, lang STRING, source STRING, text STRING")


def _py_pagerank(n, iters):
    scale, base = pagerank.SCALE, None
    base = (pagerank.SCALE * 15) // (100 * n)
    r = {i: scale // n for i in range(n)}
    for _ in range(iters):
        nxt = {i: base for i in range(n)}
        for src in range(n):
            for k in range(3):
                dst = (src * 31 + 7 * k + 3) % n
                nxt[dst] += (r[src] * 85) // 300
        r = nxt
    return r


@pytest.mark.parametrize("iters", [1, 3])
def test_pagerank_matches_python_oracle(graph_docs, iters):
    got = {r["doc_id"]: r["rank"]
           for r in pagerank.pagerank(graph_docs, iters=iters).collect()}
    assert got == _py_pagerank(50, iters)


def test_pagerank_mass_conserved_and_deterministic(graph_docs):
    out = pagerank.pagerank(graph_docs, iters=2).collect()
    total = sum(r["rank"] for r in out)
    # integral truncation only ever loses mass, boundedly
    assert 0 <= pagerank.SCALE - total < 50 * 2 * 400
    again = pagerank.pagerank(graph_docs.repartition(9), iters=2).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def _hits_fixture(spark):
    # node 0 links to 1,2,3 (the hub); 4 and 5 also link to 1 (the authority)
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (4, 1), (5, 1)], "src_id long, dst_id long")
    return docs, edges


def test_hits_hub_and_authority_structure(spark):
    docs, edges = _hits_fixture(spark)
    out = {r["doc_id"]: r for r in
           pagerank.hits(docs, iters=2, n_docs=6, edges=edges).collect()}
    assert len(out) == 6
    # node 1 collects three hubs' mass: the unique best authority
    assert out[1]["auth"] == max(r["auth"] for r in out.values())
    assert all(out[i]["auth"] == 0 for i in (0, 4, 5))     # no in-edges
    # node 0 points at 3 authorities: the unique best hub
    assert out[0]["hub"] == max(r["hub"] for r in out.values())
    assert all(out[i]["hub"] == 0 for i in (1, 2, 3))      # no out-edges
    # L1 normalization: each score vector sums to ~SCALE (floor truncation)
    for col in ("hub", "auth"):
        total = sum(r[col] for r in out.values())
        assert 0 <= pagerank.SCALE - total < 6


def test_hits_partition_invariant(spark):
    docs, edges = _hits_fixture(spark)
    a = sorted(map(tuple, pagerank.hits(docs, 2, 6, edges).collect()))
    b = sorted(map(tuple, pagerank.hits(
        docs.repartition(5), 2, 6, edges.repartition(3)).collect()))
    assert a == b


def test_hits_rejects_zero_iters(spark):
    docs, edges = _hits_fixture(spark)
    with pytest.raises(ValueError, match="iters"):
        pagerank.hits(docs, iters=0, n_docs=6, edges=edges)


def test_opic_conservation_and_uniformity(spark):
    from supercrawler_spark.operators.pagerank import SCALE, opic
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    rows = opic(docs, iters=2, n_docs=n).collect()
    assert len(rows) == n
    # the synthetic graph is 3-regular in both directions and the start is
    # uniform, so cash stays uniform (up to div-truncation, which is
    # identical per node here) -> every node has identical importance
    vals = {r["importance"] for r in rows}
    assert len(vals) == 1
    # conservation: per round each node leaks < out_deg units of dust, so
    # total importance = 3*SCALE - (dust over 2 rounds), bounded below
    total = sum(r["importance"] for r in rows)
    assert total <= 3 * SCALE
    assert total >= 3 * SCALE - 3 * 2 * 3 * n - 3 * n  # init floor + 2 rounds
    # history equals the two banked cash rounds, cash is the live residue
    r0 = rows[0]
    assert r0["history"] > 0 and r0["cash"] > 0
    assert r0["importance"] == r0["history"] + r0["cash"]
