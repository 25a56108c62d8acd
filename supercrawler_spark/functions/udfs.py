"""Vectorized pandas/Arrow UDFs — the engine's only Python-side operators.

Everything else in the engine is built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen). These UDFs wrap the executable extraction spec
(``supercrawler_spark.refspec``) per the reference's kernel:

  - extract_page   : html → (mdx, links[])   [X5+X6, src/supercrawler.rs:347-500,736-757]
  - extract_pdf    : pdf bytes → text        [S3, src/supercrawler.rs:627-633; pypdf
                                              gated — deterministic stub otherwise]
  - canonicalize   : url → normalized url    [F4, src/supercrawler.rs:1241-1252]
  - parse_host     : url → lowercased host   [F8 scope key]
  - doc_key        : url → output filename   [X7, src/supercrawler.rs:527-562]

URL hashing deliberately has NO UDF: the engine uses the built-in
``F.xxhash64`` (JVM-side; the Python mirror in functions/hashing.py exists
for the oracle/generator only).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from supercrawler_spark import refspec
from supercrawler_spark.functions import urls as _urls

PAGE_STRUCT = StructType([
    StructField("mdx", StringType()),
    StructField("links", ArrayType(StringType())),
])


def _decode_html(raw) -> str:
    # S2: resp.text_with_charset("utf-8") — lossy UTF-8 decode
    # (src/supercrawler.rs:732); None ≙ fetch failure
    if raw is None:
        return ""
    if isinstance(raw, (bytes, bytearray)):
        return bytes(raw).decode("utf-8", errors="replace")
    return str(raw)


def make_extract_page(variant: str = "supercrawler"):
    """HTML binary → (mdx, links) Arrow UDF for an engine variant
    ('supercrawler' canonical / 'main' — SURVEY §2.9). The reference parses
    twice (clean_to_mdx after noise strip, link extraction over raw —
    rs:734 vs rs:738); ``refspec.extract_page_fields`` keeps that structure
    but shares ONE parse when the noise strip is a no-op (byte-identical
    by construction — the MDX walk never mutates the tree)."""
    @pandas_udf(PAGE_STRUCT)
    def extract_page_v(url: pd.Series, html: pd.Series) -> pd.DataFrame:
        mdx_out: list[str | None] = []
        links_out: list[list[str] | None] = []
        for u, h in zip(url, html):
            if h is None:
                mdx_out.append(None)   # F7/E4: missing page ≙ failed fetch
                links_out.append(None)
                continue
            mdx, links = refspec.extract_page_fields(
                _decode_html(h), u, variant=variant)
            mdx_out.append(mdx)
            links_out.append(links)
        return pd.DataFrame({"mdx": mdx_out, "links": links_out})
    return extract_page_v


extract_page = make_extract_page("supercrawler")


@pandas_udf(StringType())
def extract_mdx(url: pd.Series, html: pd.Series) -> pd.Series:
    return pd.Series([
        None if h is None else refspec.clean_to_mdx(_decode_html(h), u)
        for u, h in zip(url, html)
    ])


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(url: pd.Series, html: pd.Series) -> pd.Series:
    return pd.Series([
        None if h is None else refspec.extract_links(_decode_html(h), u)
        for u, h in zip(url, html)
    ])


ANCHOR_STRUCT = ArrayType(StructType([
    StructField("href", StringType()),
    StructField("anchor", StringType()),
]))


@pandas_udf(ANCHOR_STRUCT)
def extract_anchors_udf(url: pd.Series, html: pd.Series) -> pd.Series:
    """(href, anchor text) pairs per page — extract_links plus the anchor
    text content (refspec.extract_anchors)."""
    return pd.Series([
        None if h is None
        else [{"href": a, "anchor": t}
              for a, t in refspec.extract_anchors(_decode_html(h), u)]
        for u, h in zip(url, html)
    ])


def make_canonicalize(strip_tracking: bool = True):
    @pandas_udf(StringType())
    def canonicalize(url: pd.Series) -> pd.Series:
        return url.map(
            lambda u: None if u is None
            else _urls.canonicalize_url(u, strip_tracking=strip_tracking)
        )
    return canonicalize


canonicalize_url_udf = make_canonicalize(True)
canonicalize_url_parity_udf = make_canonicalize(False)


@pandas_udf(StringType())
def parse_host(url: pd.Series) -> pd.Series:
    return url.map(lambda u: None if u is None else _urls.url_host(u))


@pandas_udf(StringType())
def doc_key(url: pd.Series) -> pd.Series:
    return url.map(lambda u: None if u is None else refspec.url_to_filename(u))


@pandas_udf(StringType())
def extract_pdf_mdx(url: pd.Series, pdf: pd.Series) -> pd.Series:
    """S3+X8: PDF bytes → wrapped MDX (src/supercrawler.rs:627-633,720-723);
    decode itself lives in refspec.extract_pdf_text (pypdf-gated)."""
    out = []
    for u, raw in zip(url, pdf):
        if raw is None:
            out.append(None)
            continue
        try:
            out.append(refspec.pdf_to_mdx(u, refspec.extract_pdf_text(bytes(raw))))
        except Exception:
            out.append(None)  # E4: per-URL failure isolation
    return pd.Series(out)


def url_hash_col(col):
    """JVM-side URL hash (no Python): xxhash64 over the canonical url."""
    return F.xxhash64(col)


def bucket_col(col, num_buckets: int):
    """JVM-side bucket id: pmod(xxhash64(url), B) — matches
    hashing.url_bucket used by the generator/oracle."""
    return F.pmod(F.xxhash64(col), F.lit(num_buckets)).cast("int")
