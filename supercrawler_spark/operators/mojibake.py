"""Mojibake repair: undo UTF-8-read-as-cp1252 double encoding.

The most common encoding corruption in web corpora is UTF-8 bytes decoded
with Windows-1252 (or its latin-1 fallback for the five undefined bytes):
"café" becomes "cafÃ©", "—" becomes "â€”", "€" becomes "â‚¬". Crawled
pages that declare the wrong charset — and documents that round-tripped
through a cp1252 pipeline — carry these sequences verbatim, which poisons
shingle hashes, tokenizers, and language ID downstream. ftfy popularized
the fix; the reference engine (duggal1/supercrawler, src/main.rs charset
read path) decodes with the declared charset but has no repair stage for
upstream-corrupted text, so this extends the pipeline the standard way.

Spark-first design: the repair is a chained ``replace`` over a FIXED,
generated mapping (each good character -> its sloppy-cp1252 mojibake
image), entirely built-in string expressions — whole-stage codegen, no
Python in the hot path, scan-speed at 100 TB. The mapping is generated
once at import from the codec tables, and the DuckDB oracle mirrors the
same chain in the same order (generated from the same list), so parity is
exact by construction. A ``passes`` parameter applies the chain N times:
each pass peels AT LEAST one layer of nested double encoding ("ÃƒÂ©" ->
"é" or "Ã©" depending on where the inner image sits in chain order).

Why a chain is safe here (unit-tested invariants):

- no mojibake image is a substring of another (2-byte images start with
  the lead-byte images of 0xC2-0xC6 — Â Ã Ä Å Æ — while 3-byte images
  start with â and continue with 0x80-0xBF images, disjoint alphabets at
  the position that matters), so application order cannot split a match;
- each pass peels AT LEAST one layer of a nested double encoding; chain
  order may peel MORE than one in the same pass (when an inner image's
  replacement lands before a later chain step that recognizes the newly
  exposed outer image — e.g. "ÃƒÂ©" fully repairs in one pass because the
  inner image sorts later in chain order, see
  test_double_encoding_peels_layers). The guarantee ``passes`` buys is a
  lower bound on layers peeled, never an upper bound.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

# Good characters worth repairing: the printable Latin-1 supplement
# (¡..ÿ, skipping NBSP and SHY which whitespace/invisible normalization
# owns) plus the cp1252-native punctuation and letters that appear in
# real web text (curly quotes, dashes, ellipsis, euro, trademark, OE/S/Z
# ligature-caron family, Ÿ, ƒ, circumflex/tilde spacing marks).
GOOD_CHARS = (
    "".join(chr(c) for c in range(0x00A1, 0x0100) if c != 0x00AD)
    + "ŒœŠšŸŽžƒˆ˜"
    + "–—‘’‚“”„†‡"
    + "•…‰‹›€™"
)


def _sloppy_cp1252(b: int) -> str:
    """Byte -> char under cp1252 with latin-1 fallback for the five
    undefined bytes (0x81 0x8D 0x8F 0x90 0x9D) — the decoding real-world
    mojibake was produced with (ftfy's "sloppy-windows-1252")."""
    try:
        return bytes([b]).decode("cp1252")
    except UnicodeDecodeError:
        return chr(b)


def mojibake_image(ch: str) -> str:
    """What ``ch`` looks like after its UTF-8 bytes are mis-decoded."""
    return "".join(_sloppy_cp1252(b) for b in ch.encode("utf-8"))


# (bad, good) pairs, longest bad first so 3-byte images are checked before
# 2-byte ones (not strictly required — the alphabets are disjoint, see the
# module docstring — but it keeps the chain order canonical and shared
# with the oracle SQL generator).
MOJIBAKE_MAP: list[tuple[str, str]] = sorted(
    ((mojibake_image(c), c) for c in GOOD_CHARS),
    key=lambda p: (-len(p[0]), p[1]),
)

# one instance of every mapping, used by the registered query to corrupt
# a deterministic slice of the corpus so the repair chain is exercised
# end-to-end on every mapping (bad images never merge across the join —
# every bad starts with a lead-image char, never a continuation image)
MOJIBAKE_SNIPPET = " " + "".join(bad for bad, _ in MOJIBAKE_MAP)
REPAIRED_SNIPPET = " " + "".join(good for _, good in MOJIBAKE_MAP)

# a mojibake sequence: a lead-byte image followed by a continuation-byte
# image (2-byte case) — enough to COUNT suspects cheaply; the repair
# chain itself is exact and does not use this heuristic. Lead images are
# derived from the map (cp1252 views of UTF-8 lead bytes C2-C6, CB, E2).
_LEAD = "".join(sorted({bad[0] for bad, _ in MOJIBAKE_MAP}))
_CONT = "".join(sorted({_sloppy_cp1252(b) for b in range(0x80, 0xC0)}))
SUSPECT_RE = "[" + _LEAD + "][" + _CONT.replace("\\", "\\\\")
SUSPECT_RE += "]"


_GOOD_SET = frozenset(GOOD_CHARS)


def corrupt_str(s: str) -> str:
    """Simulate the upstream bug: every repairable character becomes its
    UTF-8-as-cp1252 image (single left-to-right scan, so already-present
    image sequences in ``s`` are corrupted char-by-char too — exactly what
    a real double-decode does). ``repair_str(corrupt_str(s)) == s`` for
    any string that contains no mojibake image itself (hypothesis-tested).
    That precondition is fundamental, not an implementation limit: a
    string that already reads "Ã¡" is byte-identical to the single
    encoding of "á", so NO repairer can both fix the latter and preserve
    the former — the inherent ambiguity ftfy resolves with plausibility
    heuristics, which this exact chain deliberately does not."""
    return "".join(mojibake_image(c) if c in _GOOD_SET else c for c in s)


def repair_str(s: str, passes: int = 1) -> str:
    """Pure-Python kernel (unit-testable without Spark)."""
    for _ in range(passes):
        before = s
        for bad, good in MOJIBAKE_MAP:
            s = s.replace(bad, good)
        if s == before:
            break
    return s


def repair_col(col: Column, passes: int = 1) -> Column:
    """The repair chain as a bare Column expression — for callers that
    rewrite text in place inside an existing projection (e.g. the corpus
    pipeline's pre-tokenization repair stage) without a join."""
    for _ in range(passes):
        col = reduce(
            lambda c, p: F.replace(c, F.lit(p[0]), F.lit(p[1])),
            MOJIBAKE_MAP, col)
    return col


_repair_col = repair_col


def fix_mojibake(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", passes: int = 1) -> DataFrame:
    """(doc_id, fixed_text, changed, chars_saved, n_suspect_before):
    mojibake-repaired text plus corpus-health metrics — whether the doc
    was touched, how many characters the repair recovered (each k-char
    image collapses to 1 char), and the pre-repair count of suspect
    lead+continuation bigrams (a cheap upstream-charset-bug detector that
    survives even when a sequence is not in the repair map).

    Pure projection: no shuffle, no Python, whole-stage codegen over the
    scan — the same cost profile as ``normalize_text``. ``passes`` > 1
    peels nested double encodings ("ÃƒÂ©" -> "Ã©" -> "é").
    """
    src = F.col(text_col)
    fixed = _repair_col(src, passes)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        fixed.alias("fixed_text"),
        (fixed != src).alias("changed"),
        (F.length(src) - F.length(fixed)).cast("long").alias("chars_saved"),
        F.regexp_count(src, F.lit(SUSPECT_RE)).cast("long")
        .alias("n_suspect_before"),
    )


def oracle_repair_sql(expr: str, passes: int = 1) -> str:
    """DuckDB twin of ``_repair_col``: the same chain in the same order,
    generated from the same mapping list (single source of truth)."""
    for _ in range(passes):
        for bad, good in MOJIBAKE_MAP:
            b = bad.replace("'", "''")
            g = good.replace("'", "''")
            expr = f"replace({expr}, '{b}', '{g}')"
    return expr
