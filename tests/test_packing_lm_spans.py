"""pack_sequences / unigram_logprob / duplicate-span operators: hand-computed
oracles on tiny corpora plus the determinism/conservation invariants that
matter at scale (packing must not depend on input partitioning; token mass
must be conserved; short docs must vanish, not crash)."""

import math

import pytest
from pyspark.sql import functions as F

from supercrawler_spark.operators.packing import pack_sequences
from supercrawler_spark.operators.lm import unigram_logprob
from supercrawler_spark.operators.spans import duplicate_spans, span_dup_stats


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_contiguous_and_deterministic(spark):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(3 + (i * 7) % 11)))
            for i in range(40)] + [(99, "   ")]  # blank doc drops out
    docs = _mk_docs(spark, rows)
    out = pack_sequences(docs, budget=16, n_shards=4).collect()
    assert len(out) == 40 and all(r["doc_id"] != 99 for r in out)
    # token mass conserved
    assert sum(r["n_tokens"] for r in out) == sum((3 + (i * 7) % 11)
                                                  for i in range(40))
    # within each shard the starts tile the token stream with no gaps
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["pack"] * 16 + r["offset"])
        start = 0
        for r in rs:
            assert r["pack"] * 16 + r["offset"] == start
            assert 0 <= r["offset"] < 16
            start += r["n_tokens"]
    # identical assignment regardless of input partitioning
    again = pack_sequences(docs.repartition(7), budget=16, n_shards=4).collect()
    key = lambda rs: sorted(tuple(r) for r in rs)
    assert key(again) == key(out)


def test_unigram_logprob_hand_computed(spark):
    docs = _mk_docs(spark, [(0, "a a b"), (1, "a c")])
    out = {r["doc_id"]: r for r in
           unigram_logprob(docs, vocab_size=2).collect()}
    # counts: a=3 b=1 c=1, total=5; vocab(top2, ties on token) = {a, b}
    nll = lambda p: -math.log2(p)
    exp0 = (2 * nll(3 / 5) + nll(1 / 5)) / 3
    exp1 = (nll(3 / 5) + nll(1 / 5)) / 2   # c is OOV -> floor 1/total
    assert out[0]["n_tokens"] == 3 and out[0]["oov_tokens"] == 0
    assert out[1]["n_tokens"] == 2 and out[1]["oov_tokens"] == 1
    assert abs(out[0]["avg_nll"] - exp0) < 1e-5
    assert abs(out[1]["avg_nll"] - exp1) < 1e-5


def test_duplicate_spans_flags_shared_run(spark):
    shared = "one two three four five six seven eight"          # 8 tokens
    spam = "buy now from our store today please thanks "        # 8 tokens
    docs = _mk_docs(spark, [
        (0, "intro words here " + shared + " tail a"),
        (1, shared + " completely different ending text"),
        (2, "unrelated body of text with nothing shared at all here"),
        (3, "tiny doc"),                                         # < w tokens
        (4, spam * 2),                                 # WITHIN-doc repeat
    ])
    spans = duplicate_spans(docs, w=8).collect()
    flagged = {(r["doc_id"], r["pos"]) for r in spans}
    assert (0, 3) in flagged and (1, 0) in flagged               # the run
    # the single-doc spam repeat is flagged too (n_docs=1, n_occ=2)
    assert (4, 0) in flagged and (4, 8) in flagged
    by_doc = {r["doc_id"]: r for r in spans}
    assert by_doc[4]["n_docs"] == 1 and by_doc[4]["n_occ"] == 2
    assert by_doc[0]["n_docs"] == 2
    assert all(r["doc_id"] in (0, 1, 4) for r in spans)

    stats = {r["doc_id"]: r for r in span_dup_stats(docs, w=8).collect()}
    assert 3 not in stats                                        # no windows
    assert stats[2]["dup_windows"] == 0
    assert stats[0]["dup_windows"] == 1 and stats[1]["dup_windows"] == 1
    assert stats[0]["n_windows"] == 6                            # 13 tokens
    assert stats[0]["dup_fraction"] == pytest.approx(1 / 6, abs=1e-6)
    assert stats[4]["dup_windows"] == 2                          # spam doc


def test_winnow_guarantee_and_density(spark):
    """Winnowing property: two docs sharing a substring of >= w+k-1 tokens
    share at least one fingerprint VALUE; density well below exhaustive
    windows; short docs emit nothing; selection is deterministic."""
    from pyspark.sql import functions as F

    from supercrawler_spark.operators.spans import winnow_fingerprints
    shared = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(0, "prefix words here " + shared + " and a suffix tail"),
         (1, shared + " totally different continuation of text body"),
         (2, "unrelated content with nothing in common at all here now"),
         (3, "too short")],
        "doc_id long, text string")
    out = winnow_fingerprints(docs, k=4, w=5)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert 3 not in by_doc                       # < w+k-1 tokens
    assert by_doc[0] & by_doc[1]                 # guarantee on shared span
    assert not (by_doc[0] & by_doc[2])           # unrelated docs disjoint
    # density: far fewer fingerprints than k-gram windows
    n_tokens = 10 + 7
    assert len(by_doc[0]) < (n_tokens - 3)
    again = {(r["doc_id"], r["pos"], r["fp"])
             for r in winnow_fingerprints(docs, k=4, w=5).collect()}
    assert again == {(r["doc_id"], r["pos"], r["fp"]) for r in rows}


def test_remove_duplicate_spans_cuts_all_but_keeper(spark):
    """The cut keeps exactly one occurrence of each duplicated span — the
    global (doc_id, pos) minimum — and excises every token the other
    occurrences cover; untouched docs pass through whitespace-normalized."""
    from supercrawler_spark.operators.spans import remove_duplicate_spans
    shared = "one two three four five six seven eight"          # 8 tokens
    spam = "buy now from our store today please thanks"         # 8 tokens
    docs = _mk_docs(spark, [
        (0, "intro words here " + shared + " tail a"),          # keeper @3
        (1, shared + " completely different ending text"),      # cut @0
        (2, "unrelated body of  text with nothing shared here"),
        (3, "tiny doc"),                                        # < w tokens
        (4, spam + " " + spam),                                 # cut @8
    ])
    out = {r["doc_id"]: r
           for r in remove_duplicate_spans(docs, w=8).collect()}
    assert len(out) == 5
    # keeper occurrence survives intact
    assert out[0]["removed_tokens"] == 0
    assert out[0]["clean_text"] == "intro words here " + shared + " tail a"
    # non-keeper cross-doc occurrence excised
    assert out[1]["removed_tokens"] == 8
    assert out[1]["clean_text"] == "completely different ending text"
    # within-doc repeat: first copy kept, second cut
    assert out[4]["removed_tokens"] == 8
    assert out[4]["clean_text"] == spam
    # untouched docs: whitespace-normalized passthrough, nothing removed
    assert out[2]["removed_tokens"] == 0
    assert out[2]["clean_text"] == \
        "unrelated body of text with nothing shared here"
    assert out[3]["removed_tokens"] == 0 and out[3]["n_tokens"] == 2
    # token accounting
    assert out[1]["n_tokens"] == 12 and out[4]["n_tokens"] == 16


def test_remove_duplicate_spans_overlapping_windows_merge(spark):
    """A 9-token shared run produces two overlapping flagged windows in the
    cut copy; their covered positions union (9 removed, not 16)."""
    from supercrawler_spark.operators.spans import remove_duplicate_spans
    run = "a1 a2 a3 a4 a5 a6 a7 a8 a9"                          # 9 tokens
    docs = _mk_docs(spark, [
        (0, run + " unique0 tail0 end0"),
        (1, "lead1 " + run + " close1"),
    ])
    out = {r["doc_id"]: r
           for r in remove_duplicate_spans(docs, w=8).collect()}
    assert out[0]["removed_tokens"] == 0                        # keeper doc
    assert out[1]["removed_tokens"] == 9
    assert out[1]["clean_text"] == "lead1 close1"


def test_cdc_segments_shift_robust_and_total(spark):
    """CDC property: prepending tokens shifts segment starts but leaves
    every later segment's hash unchanged; segments tile the token stream
    exactly; short docs yield one whole-doc segment."""
    from supercrawler_spark.operators.spans import cdc_segments
    body = " ".join(f"t{i}" for i in range(40))
    docs = _mk_docs(spark, [
        (0, body),
        (1, "INSERTED PREFIX " + body),
        (2, "tiny"),
    ])
    rows = cdc_segments(docs, w=4, divisor=4).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(r)
    for d, rs in by.items():
        rs.sort(key=lambda r: r["seg_idx"])
        # tiling: starts are contiguous and lengths sum to n_tokens
        assert rs[0]["pos"] == 1
        for a, b in zip(rs, rs[1:]):
            assert a["pos"] + a["n_tokens"] == b["pos"]
    n0 = sum(r["n_tokens"] for r in by[0])
    assert n0 == 40
    assert len(by[2]) == 1 and by[2][0]["n_tokens"] == 1
    h0 = {r["seg_hash"] for r in by[0]}
    h1 = {r["seg_hash"] for r in by[1]}
    # CDC resync: after the first boundary fully inside shared content,
    # every later segment hash coincides — the tail is identical and the
    # divergent head is a small constant number of segments
    assert [r["seg_hash"] for r in by[0][-3:]] == \
        [r["seg_hash"] for r in by[1][-3:]]
    assert len(h1 & h0) >= len(h1) - 3


def test_cdc_dup_stats_flags_shifted_copy(spark):
    from supercrawler_spark.operators.spans import cdc_dup_stats
    body = " ".join(f"t{i}" for i in range(40))
    docs = _mk_docs(spark, [
        (0, body),
        (1, "X Y Z " + body),
        (2, "completely unrelated set of words with no overlap at all"),
    ])
    out = {r["doc_id"]: r for r in
           cdc_dup_stats(docs, w=4, divisor=4).collect()}
    assert out[0]["dup_segments"] > 0
    assert out[0]["dup_token_fraction"] > 0.5       # most tokens shared
    assert out[2]["dup_segments"] == 0
    assert out[2]["dup_token_fraction"] == 0.0
