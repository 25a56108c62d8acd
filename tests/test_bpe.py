"""BPE learn/encode semantics: known merge sequences, greedy-overlap
behavior, and piece accounting. Oracle parity runs in
tests/test_oracle_parity.py."""

from pyspark.sql import functions as F

from supercrawler_spark.operators.bpe import bpe_encode, bpe_merges, learn_bpe


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")


def test_learn_known_sequence(spark):
    # 'abab' x3 + 'ab' x2: pair (a,b) dominates (freq 8: 2 per 'abab'
    # word * 3 + 1 * 2); after merging, (ab, ab) appears 3 times.
    docs = _docs(spark, ["abab abab abab ab ab"])
    m = learn_bpe(docs, k=2)
    assert m[0][1:] == ("a", "b", 8)
    assert m[1][1:] == ("ab", "ab", 3)


def test_greedy_nonoverlapping_merge(spark):
    # 'aaa': pairs (a,a) count 2; after merge, greedy left-to-right gives
    # segmentation (aa, a) — NOT (aa, aa) — so the next round's top pair
    # is (aa, a).
    docs = _docs(spark, ["aaa aaa aaa"])
    m = learn_bpe(docs, k=2)
    assert m[0][1] == "a" and m[0][2] == "a"
    assert (m[1][1], m[1][2]) == ("aa", "a")


def test_tie_breaks_lexicographic(spark):
    # (a,b) and (b,a)... 'abab': pairs (a,b)x2, (b,a)x1 per word; force a
    # tie instead with two disjoint words of equal freq: 'xy' and 'ab' —
    # counts tie at 1, (a,b) < (x,y) lexicographically.
    docs = _docs(spark, ["xy ab"])
    m = learn_bpe(docs, k=1)
    assert (m[0][1], m[0][2]) == ("a", "b")


def test_encode_piece_counts(spark):
    docs = _docs(spark, ["abab abab abab ab ab"])
    merges = learn_bpe(docs, k=2)
    out = bpe_encode(docs, merges).collect()[0]
    # after (a,b) then (ab,ab): 'abab' -> 1 piece, 'ab' -> 1 piece
    assert out["n_tokens"] == 5 and out["n_pieces"] == 5
    # with only the first merge: 'abab' -> (ab, ab) = 2 pieces
    out1 = bpe_encode(docs, merges[:1]).collect()[0]
    assert out1["n_pieces"] == 2 * 3 + 1 * 2


def test_encode_no_merges_counts_chars(spark):
    docs = _docs(spark, ["ab abc", ""])
    rows = bpe_encode(docs, []).collect()
    assert len(rows) == 1  # empty doc dropped
    assert rows[0]["n_tokens"] == 2 and rows[0]["n_pieces"] == 5


def test_merges_df_schema_and_determinism(spark):
    docs = _docs(spark, ["the cat the cat", "the dog"])
    a = [tuple(r) for r in bpe_merges(docs, k=3).collect()]
    b = [tuple(r) for r in bpe_merges(docs, k=3).collect()]
    assert a == b and len(a) == 3
    assert [r[0] for r in a] == [1, 2, 3]


def test_merge_replace_equals_greedy_fuzz(spark):
    """The double-space replace trick must equal the reference greedy
    left-to-right merge on every symbol run — including adjacent and odd
    runs — for all 4 pairs over a 2-letter alphabet."""
    import random

    from supercrawler_spark.operators.bpe import _apply_merge, _seg

    def greedy(word, l, r):
        out, i = [], 0
        while i < len(word):
            if i + 1 < len(word) and word[i] == l and word[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(word[i])
                i += 1
        return out

    rng = random.Random(7)
    words = ["".join(rng.choice("ab") for _ in range(rng.randint(1, 9)))
             for _ in range(120)]
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)],
                               "i long, w string")
    for l in "ab":
        for r in "ab":
            got = {row["i"]: row["s"] for row in df.select(
                "i",
                F.split(F.trim(_apply_merge(_seg(F.col("w")), l, r)), "  ")
                .alias("s")).collect()}
            for i, w in enumerate(words):
                assert got[i] == greedy(list(w), l, r), (w, l, r)


def test_batched_equals_one_per_round(spark):
    """The safe-batch prefix rule must reproduce the 1-merge-per-round
    greedy EXACTLY — counts included — on corpora engineered to hit the
    unsafe cases (created-pair outranking, stale counts, ties, runs) and
    on random ones."""
    import random
    corpora = [
        # created pair outranks the snapshot's #2: after (a,b), new pair
        # (x, ab) has count 9 > (c,d)'s 8 — batch must stop after merge 1
        ["xab " * 9 + "cd " * 8],
        # stale counts: (a,b) then (b,c) share symbol b
        ["abc abc abc bc bc"],
        # ties + lexicographic ordering
        ["xy ab xy ab"],
        # adjacent runs (l == r)
        ["aaaa aaa aa a b ab"],
        ["the cat sat on the mat the cat ran"],
    ]
    rng = random.Random(7)
    for _ in range(4):
        words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
                 for _ in range(30)]
        corpora.append([" ".join(words)])
    for texts in corpora:
        docs = _docs(spark, texts)
        ref = learn_bpe(docs, k=6, batch=1)
        got = learn_bpe(docs, k=6, batch=64)
        assert got == ref, (texts, got, ref)
        got3 = learn_bpe(docs, k=6, batch=3)
        assert got3 == ref, (texts, got3, ref)


def test_unicode_words(spark):
    docs = _docs(spark, ["日本 日本 日本語"])
    m = learn_bpe(docs, k=1)
    assert (m[0][1], m[0][2], m[0][3]) == ("日", "本", 3)
    out = bpe_encode(docs, m).collect()[0]
    # 日本 -> 1 piece (x2), 日本語 -> 2 pieces
    assert out["n_pieces"] == 4
