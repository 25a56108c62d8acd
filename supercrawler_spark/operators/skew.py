"""Shuffle-key skew diagnostics — the measurement half of explicit skew
handling.

Every skew mitigation in the engine (salted politeness windows, LSH band
salting, AQE skew-join, per-host budget truncation) starts from the same
question: *how skewed is this key, and what salt factor would flatten it?*
This operator answers it as data: one summary row per analyzed key column
with the count distribution over key groups (max / mean / p99 via the
classic (n-1)p interpolated percentile — the same formula as
``corpus.host_quantiles``), the heavy-key census, and the salt factor that
would cap the largest group at ``target_rows`` rows per task.

Scale shape: ONE map-side-combined groupBy(key) count (the canonical
word-count job), then a single aggregation over the (much smaller)
per-key count table; the percentile runs over key-group counts, never over
rows. No collect of keys; the output is one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def key_skew_stats(df: DataFrame, key_col: str,
                   target_rows: int = 100_000,
                   heavy_factor: float = 10.0) -> DataFrame:
    """One row: (n_rows, n_keys, max_count, mean_count, p99_count,
    skew_ratio, n_heavy, suggested_salt) for the distribution of rows over
    ``key_col`` groups.

    - ``skew_ratio`` = max_count / mean_count (1.0 = perfectly uniform),
    - ``n_heavy``    = keys with count > heavy_factor * mean,
    - ``suggested_salt`` = ceil(max_count / target_rows), floored at 1 —
      the sub-split factor that bounds the hottest key's task input.
    Ratios round to 6 dp (oracle-stable)."""
    counts = df.groupBy(F.col(key_col).alias("k")) \
        .agg(F.count("*").alias("c"))
    # phase 1: distribution summary (one row). phase 2: heavy-key census
    # against the broadcast mean — the heavy predicate compares a per-key
    # row against an aggregate, so it needs the summary joined back (the
    # groupBy exchange is reused by Catalyst, not recomputed).
    summary = counts.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_count"),
        F.round(F.percentile(F.col("c"), F.lit(0.99)), 6).alias("p99_count"))
    mean = F.col("n_rows") / F.col("n_keys")
    return (counts.crossJoin(F.broadcast(summary))
            .agg(F.first("n_rows").alias("n_rows"),
                 F.first("n_keys").alias("n_keys"),
                 F.first("max_count").alias("max_count"),
                 F.round(F.first("n_rows") / F.first("n_keys"), 6)
                 .alias("mean_count"),
                 F.first("p99_count").alias("p99_count"),
                 F.round(F.first("max_count")
                         / (F.first("n_rows") / F.first("n_keys")), 6)
                 .alias("skew_ratio"),
                 F.sum((F.col("c")
                        > F.lit(heavy_factor) * mean).cast("long"))
                 .cast("long").alias("n_heavy"),
                 F.greatest(
                     F.lit(1).cast("long"),
                     F.ceil(F.first("max_count") / F.lit(target_rows))
                     .cast("long")).alias("suggested_salt")))
