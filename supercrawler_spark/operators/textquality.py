"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — all built-in JVM expressions (no Python UDFs),
each with an exact DuckDB-oracle twin in __spark_entry__.oracle_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny function-word lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas", "pour", "dans"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "no", "por"],
}


def _tokens(text_col: str):
    # strip ALL leading/trailing whitespace (tabs/newlines too — F.trim
    # removes only spaces) before splitting, so edge whitespace never
    # yields phantom empty tokens; mirrored verbatim by the oracle's
    # regexp_replace(text, '^\s+|\s+$', '', 'g') tokenizer. Java's split
    # and DuckDB's regexp_split_to_array then agree on every input
    # (Java drops trailing empties, DuckDB keeps them — with trimmed
    # edges neither produces any).
    return F.split(
        F.regexp_replace(F.col(text_col), r"^\s+|\s+$", ""), r"\s+")


def token_count(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (ceil(chars/4) per the
    common ~4-chars/token heuristic) per document."""
    toks = _tokens(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.ceil(F.length(F.col(text_col)) / 4).cast("long").alias("n_tokens_bpe"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a composite score:
    length, mean word length, stopword ratio, non-alnum ratio."""
    toks = _tokens(text_col)
    n_toks = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"])))
    non_alnum = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9 ]", ""))
    mean_wlen = F.round((n_chars - n_toks + 1) / n_toks, 6)
    stop_ratio = F.round(stop_hits / n_toks, 6)
    punct_ratio = F.round(non_alnum / n_chars, 6)
    score = F.round(
        F.least(F.lit(1.0), n_toks / F.lit(100.0)) * 0.4
        + stop_ratio * 0.4
        + (F.lit(1.0) - punct_ratio) * 0.2, 6)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_toks.cast("long").alias("n_tokens"),
        mean_wlen.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality"),
    )


def _lang_scores(text_col: str):
    """Shared stopword-score + prediction expressions: 'und' (undetermined)
    when no list scores > 0, ties break alphabetically (deterministic,
    mirrored in SQL)."""
    toks = _tokens(text_col)
    scores = {lang: F.size(F.filter(toks, lambda t: t.isin(words)))
              for lang, words in STOPWORDS.items()}
    langs = sorted(scores)  # alphabetic tie-break
    best_score = F.greatest(*[scores[lg] for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):
        pred = F.when(scores[lg] == best_score, F.lit(lg)).otherwise(pred)
    pred = F.when(best_score > 0, pred).otherwise(F.lit("und"))
    return scores, langs, pred


def langid(docs: DataFrame, text_col: str = "text",
           id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language ID across {en, de, fr, es}."""
    scores, langs, pred = _lang_scores(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.coalesce(scores[lg], F.lit(0)).cast("long").alias(f"score_{lg}")
          for lg in langs],
        pred.alias("pred_lang"),
    )


def chunk_documents(docs: DataFrame, window: int = 128, overlap: int = 16,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Fixed-token-window training-sample chunking: split each document into
    whitespace-token windows of ``window`` tokens with ``overlap`` tokens of
    context carried between consecutive chunks (stride = window - overlap).
    Output (doc_id, chunk_id, chunk_text, n_tokens) — one row per training
    sample. Pure JVM higher-order functions (sequence/transform/slice — the
    same shape as the shingle builder), no Python, no shuffle: chunking is
    embarrassingly parallel over the documents scan, so at 100 TB it runs at
    scan speed. Short documents yield their single (shorter) chunk."""
    assert 0 <= overlap < window, "need 0 <= overlap < window"
    stride = window - overlap
    toks = _tokens(text_col)
    n = F.size(toks)
    # chunk starts: 0, stride, 2*stride, … while start < n_tokens
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.lit(0), F.floor((n - 1) / stride)).cast("int"))
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, window))
            .alias("chunk_text"),
            F.least(F.lit(window), n - i * stride).cast("long")
            .alias("n_tokens")))
    return (docs
            # trim-length guard, not size(toks): split("") yields [""]
            .filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(chunks).alias("c"))
            .select("doc_id", F.col("c.chunk_id").alias("chunk_id"),
                    F.col("c.chunk_text").alias("chunk_text"),
                    F.col("c.n_tokens").alias("n_tokens")))


def train_val_split(docs: DataFrame, val_pct: int = 10, salt: str = "split-1",
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic hash split: split = 'val' iff
    md5long(salt || doc_id) mod 100 < val_pct. Stable under reshuffling,
    re-runs and cluster size (a function of the id only — never rand()),
    and portable to the DuckDB oracle (md5-based, not xxhash64, which DuckDB
    lacks). Change ``salt`` to draw an independent split."""
    h = F.conv(F.substring(F.md5(F.concat(
        F.lit(salt), F.col(id_col).cast("string")).cast("binary")), 1, 15),
        16, 10).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.pmod(h, F.lit(100)) < val_pct, F.lit("val"))
        .otherwise(F.lit("train")).alias("split"))


def filter_corpus(docs: DataFrame, min_tokens: int = 20,
                  max_punct_ratio: float = 0.2,
                  langs: tuple = ("en",), text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Corpus cleaning gate — the standard pre-training filter chain: keep
    documents with at least ``min_tokens`` whitespace tokens, a
    non-alphanumeric ratio at most ``max_punct_ratio``, and a predicted
    language in ``langs``. Output (doc_id, n_tokens, punct_ratio,
    pred_lang) for the survivors. All three signals are computed in ONE
    projection over a single documents scan — no self-join, no shuffle."""
    n_toks = F.size(_tokens(text_col))
    n_chars = F.length(F.col(text_col))
    punct = F.round(
        (n_chars - F.length(F.regexp_replace(F.col(text_col),
                                             r"[^A-Za-z0-9 ]", "")))
        / n_chars, 6)
    _, _, pred = _lang_scores(text_col)
    return (docs.select(F.col(id_col).alias("doc_id"),
                        n_toks.cast("long").alias("n_tokens"),
                        punct.alias("punct_ratio"),
                        pred.alias("pred_lang"))
            .filter((F.col("n_tokens") >= min_tokens)
                    & (F.col("punct_ratio") <= max_punct_ratio)
                    & F.col("pred_lang").isin(list(langs))))


def entropy_signals(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document unigram Shannon entropy — the lexical-diversity signal
    behind gibberish/boilerplate filters (low entropy ⇒ repeated tokens,
    high ⇒ diverse vocabulary):

    - ``token_entropy``: H = log2(n) - (1/n)·Σ_t c_t·log2(c_t) in bits,
    - ``entropy_norm``: H / log2(distinct tokens) ∈ [0, 1] (evenness;
      1.0 when every token is distinct, 0.0 for a single repeated token).

    Like ``repetition_signals``, the token counts c_t come from a
    sort + run-length fold over the in-row token array (O(L log L) per
    document), NOT an explode + per-(doc, token) shuffle — the operator is
    shuffle-free and runs at scan speed at 100 TB. Documents with no tokens
    are dropped (entropy undefined). The DuckDB oracle computes the same
    quantity via unnest + GROUP BY (semantically identical; both round to
    6 decimals).
    """
    toks = F.array_sort(_tokens(text_col))
    n = F.size(toks)
    # fold state: (prev token, current run length, Σ run·log2(run) of
    # closed runs). Closing a run adds run·log2(run); log2(1) = 0 so
    # singleton runs contribute nothing, and the finish lambda closes the
    # last run.
    zero = F.struct(F.lit("").alias("prev"),
                    F.lit(0).cast("long").alias("run"),
                    F.lit(0.0).alias("s"),
                    F.lit(0).cast("long").alias("d"))
    clog = lambda r: F.when(r > 0, r * F.log2(r)).otherwise(F.lit(0.0))  # noqa: E731
    folded = F.aggregate(
        toks, zero,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1)
            .otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(x == acc.prev, acc.s)
            .otherwise(acc.s + clog(acc.run)).alias("s"),
            F.when(x == acc.prev, acc.d)
            .otherwise(acc.d + 1).alias("d")),
        lambda acc: F.struct((acc.s + clog(acc.run)).alias("s"),
                             acc.d.alias("d")))
    ent = F.log2(n) - folded.s / n
    return (docs
            # a non-whitespace char must exist (trim() strips only spaces;
            # a '\n'-only doc would otherwise slip through as one phantom
            # token that collides with the fold's '' sentinel)
            .filter(F.length(F.regexp_replace(F.col(text_col),
                                              r"\s", "")) > 0)
            .select(F.col(id_col).alias("doc_id"),
                    n.cast("long").alias("n_tokens"),
                    folded.d.cast("long").alias("n_distinct"),
                    F.round(ent, 6).alias("token_entropy"),
                    F.when(folded.d > 1,
                           F.round(ent / F.log2(folded.d), 6))
                    .otherwise(F.lit(0.0)).alias("entropy_norm")))


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive polynomial rolling fingerprint over tokens:
    fp = fold(tokens, 0, (acc, t) -> (acc*31 + md5long(t)) mod (1e9+7)).
    Detects exact text equality cheaply and is SQL-portable (list_reduce)."""
    p = 1_000_000_007
    toks = _tokens(text_col)
    h = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t.cast("binary")), 1, 15), 16, 10)
        .cast("long") % p)
    fp = F.aggregate(h, F.lit(0).cast("long"),
                     lambda acc, x: (acc * 31 + x) % p)
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))


# Unicode script ranges for script_detect — the same class texts the
# DuckDB oracle compiles in RE2 \x{...} syntax. Kept to contiguous BMP
# blocks so Java and RE2 agree exactly.
SCRIPT_RANGES = {
    "latin": "A-Za-z",
    "cyrillic": "\u0400-\u04ff",
    "greek": "\u0370-\u03ff",
    "arabic": "\u0600-\u06ff",
    "hebrew": "\u0590-\u05ff",
    "cjk": "\u4e00-\u9fff",
    "hangul": "\uac00-\ud7af",
}


def script_detect(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document Unicode-script histogram + dominant script — the
    script-mix signal language filters gate on before (or instead of)
    model-based language ID: a 'lang=en' page that is 80% CJK codepoints
    is mislabeled or boilerplate. Counts characters in seven contiguous
    BMP script blocks via regexp class strips (pure JVM, scan speed, no
    shuffle); ``script`` is the argmax with alphabetic tie-break, 'und'
    when no block matches (digits/punctuation-only documents)."""
    counts = {
        name: F.length(F.regexp_replace(F.col(text_col),
                                        f"[^{rng}]", ""))
        for name, rng in SCRIPT_RANGES.items()
    }
    names = sorted(counts)
    best = F.greatest(*[counts[nm] for nm in names])
    pred = F.lit("und")
    for nm in reversed(names):
        pred = F.when(counts[nm] == best, F.lit(nm)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[counts[nm].cast("long").alias(f"n_{nm}") for nm in names],
        pred.alias("script"))


def gopher_rules(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_ratio: float = 0.9,
                 max_ellipsis_ratio: float = 0.3,
                 min_alpha_ratio: float = 0.8,
                 min_stop_hits: int = 2) -> DataFrame:
    """Gopher repetition-free quality rules (Rae et al. 2021, table A1) as
    explicit per-rule flags — the industry-standard pre-training document
    gate, kept separate from the composite ``quality_score`` so downstream
    selection can ablate individual rules:

    - word count in [min_words, max_words],
    - mean word length in [min_mean_word_len, max_mean_word_len],
    - symbol-to-word ratio ('#', '…', '...') <= max_symbol_ratio,
    - fraction of lines starting with a bullet <= max_bullet_ratio,
    - fraction of lines ending in an ellipsis <= max_ellipsis_ratio,
    - fraction of words with >= 1 alphabetic char >= min_alpha_ratio,
    - >= min_stop_hits hits in the English function-word list.

    One projection over one scan — every signal is a JVM built-in
    (higher-order array folds, replace-counting), no shuffle, no Python;
    at 100 TB this runs at parquet scan speed with full column pruning.
    ``gopher_pass`` is the conjunction. Ratio columns round to 6 dp
    (oracle-stable); zero-token / zero-line documents fail the word-count
    rule and report 0.0 ratios rather than null. The repetition half of
    Gopher's table (dup-line/top-ngram mass) already lives in
    ``repetition_signals`` and line/span dedup.
    """
    t = F.col(text_col)
    toks = _tokens(text_col)
    n_toks = F.size(toks)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)

    def _count(sub: str, width: int):
        return ((F.length(t) - F.length(F.replace(t, F.lit(sub), F.lit(""))))
                / F.lit(width)).cast("long")

    n_symbols = _count("#", 1) + _count("…", 1) + _count("...", 3)
    word_chars = F.aggregate(toks, F.lit(0).cast("long"),
                             lambda acc, x: acc + F.length(x))
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    bullet_lines = F.size(F.filter(
        lines, lambda l: l.startswith("- ") | l.startswith("* ")
        | l.startswith("•")))
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: l.endswith("...") | l.endswith("…")))
    safe = lambda num, den: F.when(den > 0, F.round(num / den, 6)) \
        .otherwise(F.lit(0.0))  # noqa: E731
    mean_wlen = safe(word_chars, n_toks)
    symbol_ratio = safe(n_symbols, n_toks)
    bullet_ratio = safe(bullet_lines, n_lines)
    ellipsis_ratio = safe(ellipsis_lines, n_lines)
    alpha_ratio = safe(alpha_words, n_toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS["en"])))

    out = docs.select(
        F.col(id_col).alias("doc_id"),
        n_toks.cast("long").alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    rules = {
        "ok_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_symbol_ratio": F.col("symbol_ratio") <= max_symbol_ratio,
        "ok_bullet_ratio": F.col("bullet_ratio") <= max_bullet_ratio,
        "ok_ellipsis_ratio": F.col("ellipsis_ratio") <= max_ellipsis_ratio,
        "ok_alpha_ratio": F.col("alpha_ratio") >= min_alpha_ratio,
        "ok_stopwords": F.col("stop_hits") >= min_stop_hits,
    }
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    gate = None
    for name in rules:
        gate = F.col(name) if gate is None else gate & F.col(name)
    return out.withColumn("gopher_pass", gate)
