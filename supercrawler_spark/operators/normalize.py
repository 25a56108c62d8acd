"""Unicode text canonicalization for web corpora.

Raw web text arrives in mixed Unicode normal forms (NFC vs NFD — the same
"é" as one codepoint or two), sprinkled with control characters and
irregular whitespace; dedup hashes, shingles and tokenizers all disagree
across those encodings unless the corpus is canonicalized first. Spark has
no built-in Unicode-normalization expression, so this is one of the few
places a Python UDF is genuinely required — implemented as an
Arrow-vectorized pandas UDF (batch transfer, no per-row Python at the
DataFrame level), exactly the slot the engine's extraction kernel uses.

The pipeline per document, mirrored verbatim by the DuckDB oracle
(``nfc_normalize`` + the same two RE2/java.util.regex-common patterns):

1. strip non-whitespace control characters ``[\\x00-\\x08\\x0b\\x0e-\\x1f\\x7f]``
   (keeps \\t \\r \\n \\f, which step 2 folds),
2. collapse whitespace runs ``[ \\t\\r\\n\\f]+`` to a single space and trim,
3. Unicode NFC normalization.

Scale: a pure projection over the documents scan — no shuffle, no state;
at 100 TB it runs at scan speed bounded by the Arrow transfer of the text
column (the same cost profile as the crawl engine's extract kernel).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

CONTROL_RE = re.compile("[\x00-\x08\x0b\x0e-\x1f\x7f]")
# ASCII whitespace plus the Unicode space separators web text actually
# carries (NBSP, NEL, LINE/PARA SEPARATOR, thin/ideographic spaces) — the
# SAME class the DuckDB oracle folds, so both engines canonicalize
# identically. Edge whitespace collapses to one ' ' which .strip(' ')
# (spaces only — Python's bare .strip() eats Unicode whitespace that
# DuckDB's trim() would keep) then removes.
WS_RE = re.compile("[ \t\r\n\f\x85\xa0\u1680\u2000-\u200a"
                   "\u2028\u2029\u202f\u205f\u3000]+")


def normalize_str(s: str) -> str:
    """Pure-Python kernel (unit-testable without Spark)."""
    s = CONTROL_RE.sub("", s)
    s = WS_RE.sub(" ", s).strip(" ")
    return unicodedata.normalize("NFC", s)


@pandas_udf(StringType())
def _normalize_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda s: None if s is None else normalize_str(s))


def normalize_text(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, norm_text, n_chars_norm, changed): NFC- and
    whitespace-canonicalized text, its codepoint length, and whether
    canonicalization altered the document (the corpus-health metric: a
    high ``changed`` rate means upstream extraction is emitting
    denormalized text)."""
    norm = _normalize_udf(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        norm.alias("norm_text"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        (norm != F.col(text_col)).alias("changed"),
    )
