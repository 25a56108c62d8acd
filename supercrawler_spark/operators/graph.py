"""Deterministic doc-graph derivation over the driver's ``documents`` table.

The driver's DuckDB-oracle harness (CORRECTNESS gate) compares Spark
DataFrame programs against ANSI SQL over the same parquet views. The crawl
engine's frontier algebra (scope semi-join F8, seen anti-join J1, depth
filters F9/F10, dedup, per-source counts A3, BFS loop L1) is exercised over
a link graph derived *arithmetically* from ``documents`` so both engines
compute the identical graph:

    url(d)      = 'https://' || source || '.example.com/doc/' || doc_id
    edges(d, k) = (doc_id * 31 + 7k + 3) mod N,  k ∈ {0,1,2}
    seeds       = doc_id < 10

SQL equivalents live in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_SEEDS = 10
N_EDGES = 3

URL_EXPR = "concat('https://', source, '.example.com/doc/', cast(doc_id as string))"
HOST_EXPR = "concat(source, '.example.com')"


def with_url(docs: DataFrame) -> DataFrame:
    return docs.withColumn("url", F.expr(URL_EXPR)) \
               .withColumn("host", F.expr(HOST_EXPR))


def doc_count(docs: DataFrame) -> int:
    return docs.count()


def edges(docs: DataFrame, n_docs: int,
          carry: tuple[str, ...] = ()) -> DataFrame:
    """(src_id, [carry...,] k, dst_id) — three deterministic out-edges per
    document. ``carry`` names extra ``docs`` columns to ride the edge
    projection for free (no later src-side join); the edge formula lives
    ONLY here (and in the oracle's _GRAPH_CTE)."""
    spark = docs.sparkSession
    ks = spark.range(N_EDGES).withColumnRenamed("id", "k")
    return (docs.select("doc_id", *carry).crossJoin(F.broadcast(ks))
            .select(F.col("doc_id").alias("src_id"), *carry, "k",
                    ((F.col("doc_id") * 31 + 7 * F.col("k") + 3) % n_docs)
                    .alias("dst_id")))


def url_edges(docs: DataFrame, n_docs: int) -> DataFrame:
    """Edges joined back to urls/hosts on both endpoints."""
    d = with_url(docs).select("doc_id", "url", "host")
    e = edges(docs, n_docs)
    src = d.select(F.col("doc_id").alias("src_id"),
                   F.col("url").alias("src_url"))
    dst = d.select(F.col("doc_id").alias("dst_id"),
                   F.col("url").alias("dst_url"),
                   F.col("host").alias("dst_host"))
    return e.join(src, "src_id").join(dst, "dst_id") \
            .select("src_id", "src_url", "k", "dst_id", "dst_url", "dst_host")


def seeds(docs: DataFrame) -> DataFrame:
    return with_url(docs).filter(F.col("doc_id") < N_SEEDS) \
        .select("doc_id", "url", "host")


def pages_from_documents(docs: DataFrame, n_docs: int,
                         anchor_text=None) -> DataFrame:
    """Reshape ``documents`` into the engine's pages table
    (url, warc_ts, html binary, text, lang) — FIXTURES.md §6. The html embeds
    the deterministic edge links as <a href> anchors (document order = k), so
    the full engine (UDF link extraction included) crawls exactly the
    arithmetic graph that the DuckDB recursive-CTE oracle walks.

    ``anchor_text``: optional callable mapping the per-edge struct
    (k, dst_url, dst_id) to a Column used as the anchor's text; default is
    the constant 'link' (the byte-stable crawl-fixture form)."""
    e = url_edges(docs, n_docs)
    label = anchor_text or (lambda s: F.lit("link"))
    links = (e.groupBy("src_id")
             .agg(F.concat_ws("", F.transform(
                 F.array_sort(F.collect_list(
                     F.struct("k", "dst_url", "dst_id"))),
                 lambda s: F.concat(F.lit('<p><a href="'), s["dst_url"],
                                    F.lit('">'), label(s),
                                    F.lit("</a></p>"))))
                 .alias("links_html")))
    d = with_url(docs)
    return (d.join(links, d.doc_id == links.src_id, "left")
            .select(
                "url",
                F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
                F.concat(
                    F.lit("<html><head><title>Doc "),
                    F.col("doc_id").cast("string"),
                    F.lit("</title></head><body><p>"),
                    F.col("text"),
                    F.lit("</p>"),
                    F.coalesce(F.col("links_html"), F.lit("")),
                    F.lit("</body></html>"),
                ).cast("binary").alias("html"),
                F.col("text"),
                F.col("lang"),
            ))

def host_graph(docs: DataFrame, n_docs: int) -> DataFrame:
    """Domain-level link matrix over the deterministic doc graph:
    (src_host, dst_host, n_links, n_src_pages, is_internal) — the host-graph
    aggregation a crawl scheduler prioritizes from (which domains feed which,
    how much of a host's linkage is internal).

    Scale shape: built on the shared ``edges()`` generator (single source
    of truth for the edge formula — it also lives in the oracle's
    _GRAPH_CTE), with src_host riding the edge projection for free via
    ``carry``; only dst_host needs a lookup join on dst_id — narrow
    (id, host) rows, never page content. ONE id-keyed join shuffle + one
    map-side combinable aggregation keyed on the (src_host, dst_host)
    pair, whose cardinality is #hosts², tiny next to #edges."""
    d = with_url(docs).select("doc_id", "host")
    dst = d.select(F.col("doc_id").alias("dst_id"),
                   F.col("host").alias("dst_host"))
    return (edges(d.withColumnRenamed("host", "src_host"), n_docs,
                  carry=("src_host",))
            .join(dst, "dst_id")
            .groupBy("src_host", "dst_host")
            .agg(F.count("*").alias("n_links"),
                 F.countDistinct("src_id").alias("n_src_pages"))
            .withColumn("is_internal",
                        F.col("src_host") == F.col("dst_host")))


def host_triangles(docs: DataFrame, n_docs: int) -> DataFrame:
    """(h1, h2, h3): every triangle in the undirected host link graph,
    vertices sorted lexicographically — the clustering-structure signal
    behind link-farm / PBN detection (mutually-linked host cliques are the
    classic spam topology; organic inter-host linkage is locally sparse).

    Scale shape: the standard degree-ordered orientation (Cohen's
    MapReduce triangle algorithm). Each undirected edge is oriented from
    its lower-(degree, host) endpoint to the higher one, so every vertex's
    out-degree is bounded by O(sqrt(E)) on any graph — the wedge self-join
    (the quadratic step) fans out per ORIENTED out-neighborhood, never per
    raw degree, which is what makes a celebrity host (in-degree 10^7)
    survivable. Wedges then semi-join the undirected edge set to find the
    closing edge. Host-graph input rows are #hosts^2 at most — tiny next
    to the page-level edge list they aggregate — so every join here is
    broadcast-eligible; the algorithm is written for the general case
    anyway (equi-joins only, no cartesian). The triangle SET is invariant
    to orientation, so the DuckDB oracle can verify with the simple
    lexicographic-orientation join."""
    hg = host_graph(docs, n_docs).filter(~F.col("is_internal"))
    und = (hg.select(F.least("src_host", "dst_host").alias("a"),
                     F.greatest("src_host", "dst_host").alias("b"))
           .distinct())
    deg = (und.select(F.col("a").alias("h"))
           .unionAll(und.select(F.col("b").alias("h")))
           .groupBy("h").agg(F.count("*").alias("deg")))
    da = deg.select(F.col("h").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("h").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (und.join(da, "a").join(db, "b")
                .select(
                    F.when((F.col("deg_a") < F.col("deg_b"))
                           | ((F.col("deg_a") == F.col("deg_b"))
                              & (F.col("a") < F.col("b"))),
                           F.col("a")).otherwise(F.col("b")).alias("u"),
                    F.when((F.col("deg_a") < F.col("deg_b"))
                           | ((F.col("deg_a") == F.col("deg_b"))
                              & (F.col("a") < F.col("b"))),
                           F.col("b")).otherwise(F.col("a")).alias("v")))
    e1 = oriented.select(F.col("u"), F.col("v").alias("v1"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("v2"))
    wedges = (e1.join(e2, "u").filter(F.col("v1") < F.col("v2")))
    closed = wedges.join(
        und,
        (F.least("v1", "v2") == F.col("a"))
        & (F.greatest("v1", "v2") == F.col("b")),
        "left_semi")
    tri = closed.select(F.array_sort(F.array("u", "v1", "v2")).alias("t"))
    return tri.select(F.col("t")[0].alias("h1"), F.col("t")[1].alias("h2"),
                      F.col("t")[2].alias("h3"))
