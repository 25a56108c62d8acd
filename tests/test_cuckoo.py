"""Cuckoo-filter URL-seen set: exactness (no false negatives at any load,
stash included), bounded false positives, decrement-delete semantics, and
the bloom-compatible prefilter routing contract."""

import pytest
from pyspark.sql import functions as F

from supercrawler_spark.operators import cuckoo


def _hashed(spark, ids, bucket_mod=4):
    """Deterministic 64-bit-ish hashes from ids (md5-based like the oracle)."""
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    h = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15),
               16, 10).cast("long")
    return df.select("id", h.alias("url_hash"),
                     F.pmod(h, F.lit(bucket_mod)).alias("bucket"))


def _probe(df, entries_or_packed, m, packed=False):
    p = entries_or_packed if packed else cuckoo.pack_cuckoo(entries_or_packed)
    out = cuckoo.cuckoo_prefilter(df, p, m_buckets=m)
    return {r["id"]: r["maybe_seen"] for r in out.collect()}


def test_no_false_negatives_comfortable_load(spark):
    seen = _hashed(spark, range(100))
    ent = cuckoo.cuckoo_entries(seen, m_buckets=64)
    flags = _probe(_hashed(spark, range(400)), ent, 64)
    assert all(flags[i] for i in range(100))
    fps = sum(flags[i] for i in range(100, 400))
    assert fps <= 3  # 8 lane-compares * 300 probes / 32767 ~ 0.07 expected


def test_no_false_negatives_overloaded_stash(spark):
    # m_buckets=2 -> 2x4 slots per (bucket, pair) space; 200 keys over 4
    # crawl buckets vastly exceed capacity, forcing alternates AND stash
    seen = _hashed(spark, range(200))
    ent = cuckoo.cuckoo_entries(seen, m_buckets=2)
    assert ent.filter(F.col("cbucket") == -1).count() > 0, "stash unused"
    flags = _probe(_hashed(spark, range(200)), ent, 2)
    assert all(flags.values()), "false negative under overload"


def test_entries_keys_unique_and_slots_bounded(spark):
    seen = _hashed(spark, range(200))
    ent = cuckoo.cuckoo_entries(seen, m_buckets=4).cache()
    assert (ent.groupBy("bucket", "cbucket", "fp").count()
            .filter("count > 1").count()) == 0
    over = (ent.filter(F.col("cbucket") >= 0)
            .groupBy("bucket", "cbucket").count()
            .filter(F.col("count") > cuckoo.B_SLOTS).count())
    assert over == 0
    ent.unpersist()


def test_delete_keeps_survivors(spark):
    seen = _hashed(spark, range(100))
    ent = cuckoo.cuckoo_entries(seen, m_buckets=8)
    dels = _hashed(spark, range(0, 100, 3))  # delete every third key
    ent2 = cuckoo.cuckoo_delete(ent, dels, m_buckets=8)
    flags = _probe(_hashed(spark, range(100)), ent2, 8)
    survivors = [i for i in range(100) if i % 3 != 0]
    assert all(flags[i] for i in survivors), "delete broke a survivor"
    # deleted keys should mostly probe false (fp-sharing collisions aside)
    gone = sum(not flags[i] for i in range(0, 100, 3))
    assert gone >= 30  # of 34 deleted


def test_delete_stashed_key_exact(spark):
    seen = _hashed(spark, range(200))
    ent = cuckoo.cuckoo_entries(seen, m_buckets=2).cache()
    stash_fps = {r["fp"] for r in
                 ent.filter(F.col("cbucket") == -1).collect()}
    assert stash_fps
    # find ids whose md5-hash landed in the stash, delete ONE of them
    hmap = {r["id"]: r["url_hash"] for r in _hashed(spark, range(200)).collect()}
    stashed_ids = [i for i, h in hmap.items() if h in stash_fps]
    assert stashed_ids
    victim = stashed_ids[0]
    ent2 = cuckoo.cuckoo_delete(ent, _hashed(spark, [victim]), m_buckets=2)
    flags = _probe(_hashed(spark, range(200)), ent2, 2)
    assert all(flags[i] for i in range(200) if i != victim), \
        "stash delete decremented someone else's slot"
    ent.unpersist()


def test_delete_never_inserted_is_noop(spark):
    seen = _hashed(spark, range(50))
    ent = cuckoo.cuckoo_entries(seen, m_buckets=8)
    ent2 = cuckoo.cuckoo_delete(ent, _hashed(spark, range(500, 520)),
                                m_buckets=8)
    flags = _probe(_hashed(spark, range(50)), ent2, 8)
    assert all(flags.values())
    assert ent2.count() == ent.count()


def test_prefilter_routing_contract(spark):
    """maybe_seen=false rows must be disjoint from the seen set — the
    routing exactness the crawl anti-join relies on (same contract as
    bloom.seen_prefilter)."""
    seen_ids = set(range(0, 300, 2))
    seen = _hashed(spark, sorted(seen_ids))
    ent = cuckoo.cuckoo_entries(seen, m_buckets=16)
    flags = _probe(_hashed(spark, range(300)), ent, 16)
    definitely_new = {i for i, m in flags.items() if not m}
    assert definitely_new.isdisjoint(seen_ids)


def test_prefilter_broadcast_plan(spark):
    seen = _hashed(spark, range(50))
    packed = cuckoo.pack_cuckoo(cuckoo.cuckoo_entries(seen, m_buckets=16))
    plan = (cuckoo.cuckoo_prefilter(_hashed(spark, range(100)), packed,
                                    m_buckets=16)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_recrawl_expiry_composition(spark):
    """The cuckoo filter's reason to exist: recrawl_schedule picks stale
    URLs, cuckoo_delete expires them from the seen filter, and the
    prefilter then routes them as definitely-new — so they re-enter the
    frontier and refetch — while every non-expired URL still probes seen."""
    from supercrawler_spark.operators.recrawl import recrawl_schedule

    rows = [(f"https://h{i % 4}.example.com/p/{i}", f"h{i % 4}",
             # ids 0..19 stale (240 days old), 20..99 fresh
             "2025-01-01 00:00:00" if i < 20 else "2025-08-01 00:00:00")
            for i in range(100)]
    pages = spark.createDataFrame(rows, "url string, host string, ts string") \
        .select("url", "host", F.col("ts").cast("timestamp").alias("warc_ts"))
    sched = recrawl_schedule(pages, "2025-08-28 00:00:00", min_age_days=60,
                             per_host_cap=100)
    stale_urls = {r["url"] for r in sched.collect()}
    assert stale_urls == {r[0] for r in rows if int(r[0].rsplit("/", 1)[1]) < 20}

    def hashed(df):
        h = F.xxhash64("url")
        return df.select("url", h.alias("url_hash"),
                         F.pmod(h, F.lit(4)).alias("bucket"))

    seen = hashed(pages.select("url").distinct())
    ent = cuckoo.cuckoo_entries(seen, m_buckets=16)
    ent2 = cuckoo.cuckoo_delete(ent, hashed(sched.select("url")), m_buckets=16)
    flags = {r["url"]: r["maybe_seen"] for r in cuckoo.cuckoo_prefilter(
        seen, cuckoo.pack_cuckoo(ent2), m_buckets=16).collect()}
    fresh = {u for u in flags} - stale_urls
    assert all(flags[u] for u in fresh), "expiry broke a fresh URL"
    refetchable = {u for u in stale_urls if not flags[u]}
    # fp-collisions aside, expired urls route as definitely-new
    assert len(refetchable) >= 18


def test_stash_fp_collision_distinct_hashes(spark):
    """Regression: two DISTINCT hashes sharing (fp, i1) (32772 and 98306
    both have fp=6, i1=0 at m_buckets=2) that both lose their buckets must
    each get their OWN stash row — a merged min-hash stash row would
    false-negative the other key. With b_slots=1 and small-fp fillers the
    pair is forced to the stash."""
    hashes = [32772, 98306, 2, 3, 4, 5, 6, 7]
    df = spark.createDataFrame([(h, 0) for h in hashes],
                               "url_hash long, bucket long")
    ent = cuckoo.cuckoo_entries(df, m_buckets=2, b_slots=1)
    stash = {r["fp"] for r in ent.filter(F.col("cbucket") == -1).collect()}
    assert {32772, 98306} <= stash, "colliding keys merged in the stash"
    packed = cuckoo.pack_cuckoo(ent, b_slots=1)
    flags = {r["url_hash"]: r["maybe_seen"]
             for r in cuckoo.cuckoo_prefilter(df, packed, m_buckets=2,
                                              b_slots=1).collect()}
    assert all(flags.values()), "false negative on an inserted key"
    # deleting one of the colliding pair must not hide the other
    dels = spark.createDataFrame([(98306, 0)], "url_hash long, bucket long")
    ent2 = cuckoo.cuckoo_delete(ent, dels, m_buckets=2)
    flags2 = {r["url_hash"]: r["maybe_seen"]
              for r in cuckoo.cuckoo_prefilter(
                  df, cuckoo.pack_cuckoo(ent2, b_slots=1), m_buckets=2,
                  b_slots=1).collect()}
    assert flags2[32772] is True, "delete of the twin hid a live key"
    assert flags2[98306] is False
    assert all(flags2[h] for h in hashes if h != 98306)


def test_b_slots_must_fit_word(spark):
    df = spark.createDataFrame([(1, 0)], "url_hash long, bucket long")
    ent = cuckoo.cuckoo_entries(df, m_buckets=2)
    with pytest.raises(AssertionError):
        cuckoo.pack_cuckoo(ent, b_slots=5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cuckoo_fuzz_invariants(spark, seed):
    """Seeded fuzz over random signed 64-bit hashes (xxhash64 is signed):
    every inserted key probes true at an overloaded b_slots=2 build, and
    after deleting half, every survivor still probes true."""
    import random

    rnd = random.Random(seed)
    hashes = list({rnd.randint(-(2 ** 63), 2 ** 63 - 1) for _ in range(150)})
    inserted = hashes[:100]

    def hdf(hs):
        return spark.createDataFrame([(h, h % 4) for h in hs],
                                     "url_hash long, bucket long")

    ent = cuckoo.cuckoo_entries(hdf(inserted), m_buckets=8, b_slots=2)
    packed = cuckoo.pack_cuckoo(ent, b_slots=2)
    flags = {r["url_hash"]: r["maybe_seen"]
             for r in cuckoo.cuckoo_prefilter(hdf(hashes), packed,
                                              m_buckets=8,
                                              b_slots=2).collect()}
    assert all(flags[h] for h in inserted), "fuzz: false negative"
    dels = inserted[::2]
    ent2 = cuckoo.cuckoo_delete(ent, hdf(dels), m_buckets=8)
    flags2 = {r["url_hash"]: r["maybe_seen"]
              for r in cuckoo.cuckoo_prefilter(
                  hdf(inserted), cuckoo.pack_cuckoo(ent2, b_slots=2),
                  m_buckets=8, b_slots=2).collect()}
    survivors = [h for h in inserted if h not in set(dels)]
    assert all(flags2[h] for h in survivors), "fuzz: delete broke survivor"


def test_m_buckets_must_be_power_of_two(spark):
    with pytest.raises(AssertionError):
        cuckoo.cuckoo_entries(_hashed(spark, range(4)), m_buckets=3)
