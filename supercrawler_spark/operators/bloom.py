"""Distributed Bloom-filter URL-seen set (north-rule: "bloom/cuckoo
URL-seen") as explicit engine code — not a reliance on Spark's runtime
Bloom-join injection (which this build disables; see session.py).

Layout: one Bloom filter PER SEEN BUCKET, stored as a sparse word map
``map<int, long>`` (32-bit words — the largest mask is 1<<31, which stays
exact in BOTH the JVM and DuckDB's overflow-checked BIGINT arithmetic).
The whole filter table is ``num_buckets`` rows, so it broadcasts to every
executor even when the exact seen table holds 10^10 URLs: at 10 bits/key a
10^10-URL seen set is ~12 GB of Bloom words cluster-wide, but each
*bucket's* filter is only ~12 GB / num_buckets — and the crawler sizes
num_buckets so per-bucket state fits an executor. Candidates carry their
bucket already, so the membership probe is a broadcast hash join plus pure
JVM bit arithmetic.

Exactness is preserved by construction: the filter only ROUTES candidates.
``maybe_seen = false`` is a guaranteed-new URL (Bloom filters have no false
negatives) and skips the exact anti-join entirely; ``maybe_seen = true``
(actually-seen ∪ false positives) still goes through the exact
url_hash anti-join. At web scale most frontier candidates are novel, so the
shuffle into the seen-bucket layout shrinks to the seen-or-collision
fraction — the crawl result is byte-identical with the filter on or off.

Hashing: k probe positions are double-hashed, pos_j = (h1 + j*h2) mod m,
with h1/h2 folded into 30-bit residues first so every intermediate stays
far below 2^63 — DuckDB raises on BIGINT overflow where the JVM would wrap,
and the oracle query mirrors this arithmetic verbatim. The operator is
hash-agnostic (takes a precomputed 64-bit hash column): the crawler feeds
xxhash64(url), the DuckDB-checked oracle query feeds md5-based hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 30-bit primes for the double-hash residues: j*h2 + h1 < 8 * 2^30 + 2^30,
# comfortably inside BIGINT for any sane probe count
_P1 = 1_073_741_789
_P2 = 1_073_741_783

WORD_BITS = 32


def _positions(hash_col: Column, m_bits: int, k: int) -> list[Column]:
    h1 = F.pmod(hash_col, F.lit(_P1))
    h2 = F.pmod(hash_col, F.lit(_P2)) * 2 + 1  # odd stride
    return [F.pmod(h1 + j * h2, F.lit(m_bits)) for j in range(k)]


def bloom_words(seen: DataFrame, hash_col: str = "url_hash",
                bucket_col: str = "bucket", m_bits: int = 1 << 20,
                k: int = 3) -> DataFrame:
    """Flat filter words (bucket, word, bits) for a seen (sub)set.

    One map-side-combinable bit_or aggregation: word cardinality is capped
    by m_bits/32 per bucket, so the shuffled volume is the FILTER size,
    not the seen-set size — covering 10^10 rows moves ~num_buckets *
    m_bits/8 bytes total. Word frames are MERGEABLE (union + bit_or), which
    is what makes the crawler's incremental per-round update cheap: each
    round aggregates only its seen DELTA and bit_or-merges with the
    cumulative words, never rescanning the full seen set.
    """
    assert m_bits % WORD_BITS == 0, "m_bits must be a multiple of 32"
    pos = F.explode(F.array(*_positions(F.col(hash_col), m_bits, k)))
    return (seen
            .select(F.col(bucket_col).alias("bucket"), pos.alias("pos"))
            .select("bucket", (F.col("pos") / WORD_BITS).cast("int")
                    .alias("word"),
                    # call_function: PySpark's shiftleft wrapper only takes
                    # an int literal for numBits; the SQL builtin takes a
                    # column
                    F.call_function(
                        "shiftleft", F.lit(1).cast("long"),
                        F.pmod(F.col("pos"), F.lit(WORD_BITS)).cast("int"))
                    .alias("mask"))
            .groupBy("bucket", "word")
            .agg(F.expr("bit_or(mask)").alias("bits")))


def merge_words(*word_frames: DataFrame) -> DataFrame:
    """bit_or-merge word frames (cumulative ∪ delta → new cumulative)."""
    out = word_frames[0]
    for w in word_frames[1:]:
        out = out.unionByName(w)
    return out.groupBy("bucket", "word").agg(F.expr("bit_or(bits)").alias("bits"))


def words_to_bloom(words: DataFrame) -> DataFrame:
    """Pack flat (bucket, word, bits) rows into the broadcastable
    (bucket, bloom: map<int,long>) filter table — one row per bucket."""
    return (words.groupBy("bucket")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("word", "bits"))).alias("bloom")))


def build_bloom(seen: DataFrame, hash_col: str = "url_hash",
                bucket_col: str = "bucket", m_bits: int = 1 << 20,
                k: int = 3) -> DataFrame:
    """One-shot build: (bucket, bloom map) directly from a seen set."""
    return words_to_bloom(bloom_words(seen, hash_col, bucket_col, m_bits, k))


def maybe_contains(bloom_col: Column, hash_col: Column, m_bits: int,
                   k: int = 3) -> Column:
    """Pure-JVM membership probe: true iff every probe bit is set. A null
    bloom map (bucket with no seen rows yet) means definitely-not-seen."""
    checks = []
    for p in _positions(hash_col, m_bits, k):
        word = (p / WORD_BITS).cast("int")
        mask = F.call_function("shiftleft", F.lit(1).cast("long"),
                               F.pmod(p, F.lit(WORD_BITS)).cast("int"))
        checks.append(
            F.coalesce(F.element_at(bloom_col, word), F.lit(0).cast("long"))
            .bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def seen_prefilter(candidates: DataFrame, bloom: DataFrame,
                   hash_col: str = "url_hash", bucket_col: str = "bucket",
                   m_bits: int = 1 << 20, k: int = 3) -> DataFrame:
    """Tag candidates with ``maybe_seen`` via a broadcast join on bucket.
    Callers route ``maybe_seen`` rows to the exact anti-join and pass
    ``~maybe_seen`` rows straight through as definitely new."""
    b = F.broadcast(bloom.withColumnRenamed("bucket", "_bloom_bucket"))
    joined = candidates.join(
        b, candidates[bucket_col] == b["_bloom_bucket"], "left")
    return (joined
            .withColumn("maybe_seen", F.coalesce(
                maybe_contains(F.col("bloom"), F.col(hash_col), m_bits, k),
                F.lit(False)))
            .drop("_bloom_bucket", "bloom"))
