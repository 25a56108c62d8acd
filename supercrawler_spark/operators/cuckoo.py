"""Distributed cuckoo-filter URL-seen set — the second half of the
north-rule "bloom/cuckoo URL-seen" pair (the Bloom half lives in
operators/bloom.py and drives the crawl round loop).

Why a second filter: Bloom filters are cheaply MERGEABLE (bit_or), which is
what the crawler's incremental per-round delta update needs — but they
cannot DELETE. A recrawl pipeline wants the opposite trade: when stale URLs
are expired from the seen set (so they re-fetch), a cuckoo filter removes
their fingerprints without rebuilding the whole structure. This module is
that deletable variant; the crawler keeps Bloom for rounds, and recrawl
compaction points use cuckoo (build once over the compacted seen set,
decrement on expiry).

Design — a deterministic STATIC two-choice construction instead of the
classic random-walk eviction insert (which is inherently sequential and
non-reproducible under parallelism; determinism-from-data is the same rule
the frontier's seq ordering follows):

- fingerprint ``fp = 1 + (h mod (2^15 - 1))`` ∈ [1, 32767] (0 = empty lane),
- home bucket ``i1 = h' mod m`` (independent residue), alternate
  ``i2 = i1 XOR g(fp)`` with ``g(fp) = (fp · K) AND (m-1)`` — m is a power
  of two so XOR is an involution: either bucket derives the other from the
  stored fp alone, the partial-key cuckoo property,
- distinct (bucket, fp) pairs ranked deterministically (fp, then count):
  the first ``b_slots`` at their home bucket stay; losers re-rank at their
  alternate bucket behind its home keepers for the remaining slots; the
  rare double-losers go to an EXACT stash (full 64-bit hash rows) — so
  membership has NO false negatives by construction, at any load factor,
- duplicates of one (bucket, fp) pair merge with a COUNT (cnt), so deleting
  one URL cannot false-negative a different URL that shares its slot.

Scale: construction is one narrow shuffle of (cuckoo_bucket, fp) pairs
partitioned by bucket — window ranks see ~n/m rows per bucket, so there is
no skew by construction (the bucket index IS a hash). The packed probe
table is one row per seen BUCKET (map<cbucket, word> + stash array), the
same broadcast shape as the Bloom table: 4 lanes × 15 bits pack into one
BIGINT below 2^60, exact in both the JVM and DuckDB's overflow-checked
arithmetic. The DuckDB oracle mirrors fp/i1/i2 and the two-stage ranked
assignment verbatim and probes the flat entries — same semantics, checked
value-for-value in __spark_entry__ (``cuckoo_seen_filter``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# independent 30-bit prime residues (bloom.py uses _P1/_P2; fingerprint and
# home bucket must not be correlated or FP rates degrade)
_PF = 1_073_741_741  # fingerprint residue prime
_PB = 1_073_741_723  # home-bucket residue prime
FP_BITS = 15
FP_MASK = (1 << FP_BITS) - 1  # 32767
B_SLOTS = 4
_K = 0x5BD1E995  # odd multiplier for g(fp)


def _fp(hash_col: Column) -> Column:
    return (F.pmod(hash_col, F.lit(FP_MASK)) + 1).cast("long")


def _i1(hash_col: Column, m_buckets: int) -> Column:
    return F.pmod(F.pmod(hash_col, F.lit(_PB)), F.lit(m_buckets)).cast("long")


def _g(fp_col: Column, m_buckets: int) -> Column:
    return (fp_col * F.lit(_K)).bitwiseAND(F.lit(m_buckets - 1)).cast("long")


def cuckoo_entries(seen: DataFrame, hash_col: str = "url_hash",
                   bucket_col: str = "bucket", m_buckets: int = 1 << 14,
                   b_slots: int = B_SLOTS) -> DataFrame:
    """Flat deletable filter state: (bucket, cbucket, fp, cnt) rows for slot
    entries plus (bucket, cbucket=-1, fp=<full hash>, cnt) rows for the
    exact stash. ``bucket`` is the crawl store's seen bucket (the broadcast
    key); ``cbucket`` the cuckoo bucket inside it."""
    assert m_buckets & (m_buckets - 1) == 0, "m_buckets must be a power of 2"
    h = F.col(hash_col)
    keyed = (seen.select(
        F.col(bucket_col).alias("bucket"), h.alias("h"),
        _fp(h).alias("fp"), _i1(h, m_buckets).alias("i1"))
        .withColumn("i2", F.col("i1").bitwiseXOR(
            _g(F.col("fp"), m_buckets)).cast("long")))
    # one ranked unit per DISTINCT KEY (full 64-bit hash): two distinct
    # keys sharing (fp, i1) must NOT collapse here — if their unit lost
    # both buckets, a merged stash row could only store one hash and the
    # other key would false-negative. cnt tracks copies of the same key
    # (deletes decrement, so removing one URL never hides another).
    dk = (keyed.groupBy("bucket", "h", "fp", "i1", "i2")
          .agg(F.count("*").alias("cnt")))
    w1 = Window.partitionBy("bucket", "i1").orderBy("fp", "h")
    ranked1 = dk.withColumn("r1", F.row_number().over(w1))
    kept1 = (ranked1.filter(F.col("r1") <= b_slots)
             .select("bucket", F.col("i1").alias("cbucket"), "fp", "cnt"))
    losers = ranked1.filter(F.col("r1") > b_slots)
    # capacity left at each alternate bucket = b_slots - home keepers there
    used = kept1.groupBy("bucket", "cbucket").agg(F.count("*").alias("used"))
    w2 = Window.partitionBy("bucket", "i2").orderBy("fp", "h")
    ranked2 = (losers.withColumn("r2", F.row_number().over(w2))
               .join(used,
                     (losers.bucket == used.bucket)
                     & (losers.i2 == used.cbucket), "left")
               .select(losers.bucket, "i2", "fp", "cnt", "h", "r2",
                       F.coalesce("used", F.lit(0)).alias("used")))
    kept2 = (ranked2.filter(F.col("r2") <= b_slots - F.col("used"))
             .select("bucket", F.col("i2").alias("cbucket"), "fp", "cnt"))
    stash = (ranked2.filter(F.col("r2") > b_slots - F.col("used"))
             .select("bucket", F.lit(-1).cast("long").alias("cbucket"),
                     F.col("h").alias("fp"), "cnt"))
    # distinct keys carrying the SAME (cbucket, fp) — fp collisions and
    # home-keeper-vs-alternate-arrival overlaps — are indistinguishable for
    # membership, so collapse them into one counted entry AFTER ranking:
    # entry keys stay unique and decrement-delete stays exact (membership
    # holds while the bucket-pair total for fp is positive). Stash rows key
    # on the full hash, so distinct keys never merge there.
    return (kept1.unionByName(kept2).unionByName(stash)
            .groupBy("bucket", "cbucket", "fp")
            .agg(F.sum("cnt").alias("cnt")))


def cuckoo_delete(entries: DataFrame, deletions: DataFrame,
                  hash_col: str = "url_hash", bucket_col: str = "bucket",
                  m_buckets: int = 1 << 14) -> DataFrame:
    """Decrement-delete: remove ``deletions`` (rows with hash + bucket) from
    the flat entries without a rebuild. Each deleted key decrements the cnt
    of its (fp, i1-or-i2) slot entry — whichever bucket actually stores the
    fp — or its stash row; entries at cnt 0 drop out. Deleting keys that
    were never inserted is a no-op (matched=0). Exactness: keys NOT deleted
    keep a positive cnt in their slot, so they still probe true."""
    h = F.col(hash_col)
    d = (deletions.select(
        F.col(bucket_col).alias("bucket"), h.alias("h"),
        _fp(h).alias("fp"), _i1(h, m_buckets).alias("i1"))
        .withColumn("i2", F.col("i1").bitwiseXOR(
            _g(F.col("fp"), m_buckets)).cast("long"))
        # one decrement per distinct deleted key per copy deleted
        .groupBy("bucket", "h", "fp", "i1", "i2")
        .agg(F.count("*").alias("dec")))
    # a key's entry lives in the stash under its full hash — or at i1/i2
    # under its fp. The stash probe is EXACT (only the key itself can match
    # its 64-bit hash) so it must win: a stashed key whose (bucket-pair, fp)
    # also carries other keys' slot entries must not decrement those. Slot
    # decrements are pair-symmetric (membership holds while the bucket-PAIR
    # total for fp is positive), so which of i1/i2 absorbs the hit is
    # immaterial.
    probes = d.select(
        "bucket", "dec",
        F.explode(F.array(
            F.struct(F.lit(-1).cast("long").alias("cbucket"),
                     F.col("h").alias("fp"), F.lit(0).alias("prio")),
            F.struct(F.col("i1").alias("cbucket"), F.col("fp").alias("fp"),
                     F.lit(1).alias("prio")),
            F.struct(F.col("i2").alias("cbucket"), F.col("fp").alias("fp"),
                     F.lit(2).alias("prio")),
        )).alias("p"),
        F.col("h"))
    probes = probes.select("bucket", "dec", "h", "p.cbucket", "p.fp", "p.prio")
    hits = (probes.join(entries, ["bucket", "cbucket", "fp"], "inner")
            .withColumn("rk", F.row_number().over(
                Window.partitionBy("bucket", "h").orderBy("prio")))
            .filter(F.col("rk") == 1)
            .groupBy("bucket", "cbucket", "fp")
            .agg(F.sum("dec").alias("dec")))
    return (entries.join(hits, ["bucket", "cbucket", "fp"], "left")
            .select("bucket", "cbucket", "fp",
                    (F.col("cnt") - F.coalesce("dec", F.lit(0))).alias("cnt"))
            .filter(F.col("cnt") > 0))


def pack_cuckoo(entries: DataFrame, b_slots: int = B_SLOTS) -> DataFrame:
    """Broadcastable probe table: one row per seen bucket with the slot
    words packed ``b_slots`` × 15-bit fingerprints per BIGINT (≤ 2^60 —
    exact in DuckDB's checked arithmetic too) plus the exact stash hashes.
    ``b_slots`` must match the build and fit the word (≤ 4 lanes)."""
    assert 1 <= b_slots * FP_BITS <= 60, "b_slots*15 bits must fit a BIGINT"
    slots = entries.filter(F.col("cbucket") >= 0)
    w = Window.partitionBy("bucket", "cbucket").orderBy("fp")
    words = (slots
             .withColumn("lane", F.row_number().over(w) - 1)
             .groupBy("bucket", "cbucket")
             .agg(F.sum(F.call_function(
                 "shiftleft", F.col("fp"),
                 (F.col("lane") * FP_BITS).cast("int")))
                  .cast("long").alias("word")))
    packed = (words.groupBy("bucket")
              .agg(F.map_from_entries(
                  F.collect_list(F.struct(F.col("cbucket").cast("int"),
                                          F.col("word")))).alias("cuckoo")))
    stash = (entries.filter(F.col("cbucket") == -1)
             .groupBy("bucket")
             .agg(F.collect_set("fp").alias("stash")))
    return (packed.join(stash, "bucket", "full")
            .select("bucket",
                    F.coalesce("cuckoo", F.map_from_entries(
                        F.array().cast("array<struct<c:int,w:long>>")))
                    .alias("cuckoo"),
                    F.coalesce("stash", F.array().cast("array<long>"))
                    .alias("stash")))


def cuckoo_maybe_contains(cuckoo_col: Column, stash_col: Column,
                          hash_col: Column, m_buckets: int,
                          b_slots: int = B_SLOTS) -> Column:
    """Pure-JVM probe: fp lane-matches at i1 or i2, or exact stash hit."""
    assert 1 <= b_slots * FP_BITS <= 60, "b_slots*15 bits must fit a BIGINT"
    fp = _fp(hash_col)
    i1 = _i1(hash_col, m_buckets)
    i2 = i1.bitwiseXOR(_g(fp, m_buckets)).cast("long")
    checks = []
    for bucket_ix in (i1, i2):
        word = F.coalesce(
            F.element_at(cuckoo_col, bucket_ix.cast("int")),
            F.lit(0).cast("long"))
        for lane in range(b_slots):
            lane_val = F.call_function(
                "shiftright", word,
                F.lit(lane * FP_BITS)).bitwiseAND(F.lit(FP_MASK))
            checks.append(lane_val == fp)
    checks.append(F.array_contains(
        F.coalesce(stash_col, F.array().cast("array<long>")), hash_col))
    out = checks[0]
    for c in checks[1:]:
        out = out | c
    return out


def cuckoo_prefilter(candidates: DataFrame, packed: DataFrame,
                     hash_col: str = "url_hash", bucket_col: str = "bucket",
                     m_buckets: int = 1 << 14,
                     b_slots: int = B_SLOTS) -> DataFrame:
    """Tag candidates with ``maybe_seen`` via a broadcast join on the seen
    bucket — the same routing contract as bloom.seen_prefilter: false is
    guaranteed-new, true goes to the exact anti-join."""
    p = F.broadcast(packed.withColumnRenamed("bucket", "_ck_bucket"))
    joined = candidates.join(
        p, candidates[bucket_col] == p["_ck_bucket"], "left")
    return (joined
            .withColumn("maybe_seen", F.coalesce(
                cuckoo_maybe_contains(F.col("cuckoo"), F.col("stash"),
                                      F.col(hash_col), m_buckets, b_slots),
                F.lit(False)))
            .drop("_ck_bucket", "cuckoo", "stash"))
