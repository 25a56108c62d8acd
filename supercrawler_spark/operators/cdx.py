"""CDX-style URL index construction: SURT keys, capture digests, and
range-sharded index rows.

Every large crawl ships a URL index beside the page store — Common Crawl's
CDXJ/zipnum index is the canonical example: one row per capture, keyed by
the SURT (Sort-friendly URI Reordering Transform) of the URL so that all
captures of a host, and all hosts of a registrable domain, are adjacent in
the total order. The reference engine keeps no index at all (its "index" is
the filesystem layout of ``save_mdx``, /root/reference/src/supercrawler.rs:502-525);
at 10^10 URLs an index is what makes point lookups, prefix scans
("everything under com,example)/docs/"), and incremental recrawl joins
possible without scanning the page store.

Pieces:

- :func:`surt_expr` — pure string-expression SURT transform (lowercased
  host, userinfo/port stripped, host labels reversed and comma-joined,
  ``)`` separator, path+query preserved, fragment dropped). No UDF: stays
  inside WholeStageCodegen, and has an exact DuckDB twin
  (:func:`surt_sql`) kept in lockstep in this module.
- :func:`cdx_rows` — the per-capture projection (surt, ts14, url, digest,
  length). ``digest`` is the md5 of the extracted text (the dedup handle a
  real CDX carries as SHA1), ``ts14`` the 14-digit capture timestamp.
- :func:`cdx_index` — rows + a dense global rank and a balanced shard id,
  the zipnum-style secondary index. Two rank strategies:

  * ``exact=True`` (default, test/oracle scale): ``row_number`` over a
    global ORDER BY — a single-task window, fine for the sf0.01 gate and
    exactly expressible in the DuckDB oracle, WRONG at 100 TB.
  * ``exact=False`` (scale path): the crawler's two-phase dense-seq rank
    (``repartitionByRange`` on the key, per-partition row_number + tiny
    offsets broadcast — ``crawler.attach_dense_seq``), which is how the
    index write actually runs on a cluster. A pytest asserts both paths
    produce identical rows, and the scale caller must unpersist the
    returned cache after materializing.

Shard id is ``floor(rank * n_shards / total)`` — contiguous SURT ranges of
near-equal row count, i.e. the cut points you hand to
``repartitionByRange`` when writing the index files, so a prefix lookup
touches exactly one shard (plus neighbors at the boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_SCHEME = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"


def surt_expr(url_col: Column) -> Column:
    """SURT key of a canonical absolute URL, as a pure column expression.

    ``https://User@WWW.Example.COM:8443/A/b?q=1#frag`` ->
    ``com,example,www)/A/b?q=1`` (host case-folded; path case preserved;
    userinfo, port, and fragment dropped). Invalid/relative URLs (no
    scheme) yield an empty host part -> ``)``-prefixed key that sorts
    first; callers filter them out with ``NOT surt LIKE ')%'`` (every
    valid SURT contains ``)`` after its reversed host, so only the
    empty-host prefix identifies invalid input)."""
    hostport = F.regexp_extract(url_col, _SCHEME + r"([^/?#]+)", 1)
    host = F.lower(
        F.regexp_replace(F.regexp_replace(hostport, "^.*@", ""),
                         ":[0-9]*$", ""))
    revhost = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    pathq = F.regexp_extract(url_col, _SCHEME + r"[^/?#]+([^#]*)", 1)
    pathq = F.when(pathq == "", F.lit("/")).otherwise(pathq)
    return F.concat(revhost, F.lit(")"), pathq)


def surt_sql(url_expr: str) -> str:
    """DuckDB twin of :func:`surt_expr` — generated beside it so the two
    string pipelines cannot drift."""
    hostport = f"regexp_extract({url_expr}, '{_SCHEME}([^/?#]+)', 1)"
    host = (f"lower(regexp_replace(regexp_replace({hostport}, '^.*@', ''),"
            f" ':[0-9]*$', ''))")
    revhost = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    pathq = f"regexp_extract({url_expr}, '{_SCHEME}[^/?#]+([^#]*)', 1)"
    return (f"({revhost} || ')' || "
            f"CASE WHEN {pathq} = '' THEN '/' ELSE {pathq} END)")


def cdx_rows(pages: DataFrame, url_col: str = "url",
             ts_col: str = "warc_ts", text_col: str = "text") -> DataFrame:
    """Per-capture CDX projection: (surt, ts14, url, digest, length).
    Pure built-in expressions — the whole projection runs at scan speed
    with only (url, warc_ts, text) in ReadSchema."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    return pages.select(
        surt_expr(F.col(url_col)).alias("surt"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts14"),
        F.col(url_col).alias("url"),
        F.md5(txt).alias("digest"),
        F.length(txt).cast("long").alias("length"),
    )


def cdx_index(pages: DataFrame, n_shards: int = 4, url_col: str = "url",
              ts_col: str = "warc_ts", text_col: str = "text",
              exact: bool = True):
    """CDX rows + dense global rank by (surt, ts14, url) + balanced shard.

    ``exact=True`` returns just the DataFrame (single-task global window —
    oracle/test scale only). ``exact=False`` returns ``(df, cache)`` using
    the distributed two-phase rank; the caller must ``cache.unpersist()``
    after materializing (same contract as ``crawler.attach_dense_seq``)."""
    rows = cdx_rows(pages, url_col=url_col, ts_col=ts_col, text_col=text_col)
    order = ["surt", "ts14", "url"]
    if exact:
        w = Window.orderBy(*order)
        total = F.count("*").over(
            Window.partitionBy())  # scalar, same single task as the rank
        out = (rows.withColumn("rank",
                               (F.row_number().over(w) - F.lit(1))
                               .cast("long"))
               .withColumn("shard",
                           F.floor(F.col("rank") * n_shards / total)))
        return out.select("rank", "shard", *rows.columns)
    from supercrawler_spark.crawler import attach_dense_seq
    seqd, total_rows, cache = attach_dense_seq(rows, order, out_col="rank")
    out = (seqd.withColumn("shard",
                           F.floor(F.col("rank") * n_shards / F.lit(total_rows)))
           .select("rank", "shard", *rows.columns))
    return out, cache


def cdx_shard_bounds(index: DataFrame) -> DataFrame:
    """Zipnum-style secondary index: one row per shard with its SURT range
    and row count — the tiny table a lookup consults to pick the one shard
    to scan. A single small aggregation over the index rows."""
    return (index.groupBy("shard")
            .agg(F.min("surt").alias("surt_lo"),
                 F.max("surt").alias("surt_hi"),
                 F.count("*").alias("n_rows")))


def warc_offsets(pages: DataFrame, n_segments: int = 4,
                 header_overhead: int = 64, url_col: str = "url",
                 payload_col: str = "text") -> DataFrame:
    """(segment, url, offset, rec_len): WARC-style dump layout planning —
    assign every capture to a segment file and compute its byte offset,
    the numbers a full CDX line carries beside the SURT (filename, offset,
    length) so a reader can range-request one record out of a multi-GB
    WARC without scanning it.

    Record length = fixed header model (``header_overhead`` + url BYTES)
    + payload BYTES (``octet_length`` — UTF-8 byte counts, since offsets
    address file positions; ``length`` would undercount any non-ASCII
    payload and corrupt every range request after it); offset = running
    sum within the segment ordered by (url, digest) with an explicit ROWS
    frame — the default RANGE frame hands tied rows the sum over ALL
    their peers, so duplicate captures of one URL would get overlapping
    byte ranges. Segments are hash-assigned (deterministic); per-segment
    offsets come from a window cumulative sum PARTITIONED BY segment —
    one sorted task per segment, which is exactly the serialization the
    segment's file write pays anyway, so the window is not an extra scale
    hazard: size n_segments so a segment ≈ one WARC file (~1 GB) and the
    sort is file-local."""
    from supercrawler_spark.operators.trainmix import md5long
    payload = F.coalesce(F.col(payload_col), F.lit(""))
    rec_len = (F.lit(header_overhead) + F.octet_length(F.col(url_col))
               + F.octet_length(payload))
    d = pages.select(
        F.pmod(md5long(F.col(url_col)), F.lit(n_segments)).alias("segment"),
        F.col(url_col).alias("url"),
        F.md5(payload).alias("digest"),
        rec_len.cast("long").alias("rec_len"))
    w = (Window.partitionBy("segment").orderBy("url", "digest")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return d.select("segment", "url", "digest",
                    (F.sum("rec_len").over(w) - F.col("rec_len"))
                    .cast("long").alias("offset"), "rec_len")
