"""Count-min sketch: fixed-size frequency estimation for token/URL streams.

The companion to ``sketches.hll_distinct`` (distinct counts) — CMS answers
"how often does key x occur" with bounded state: a d x w counter grid
instead of a vocabulary-sized exact count table. At 100 TB the full
``groupBy(token)`` table has ~10^8-10^9 rows that must shuffle and persist;
the sketch shuffles at most d·w = 4096 counter cells after map-side combine
and guarantees ``estimate >= true`` with overshoot ≤ 2N/w at 1-(1/2)^d
confidence (Cormode & Muthukrishnan 2005).

Determinism discipline matches the HLL: row hashes are
``md5(row || ':' || key)`` which Spark and DuckDB compute identically, the
cell index is exact integer arithmetic on the first 8 hex chars, and the
counters are plain integer sums — so the DuckDB oracle replays every
estimate bit-for-bit regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CMS_D = 4        # hash rows
CMS_W = 1024     # counters per row


def _cell(key, r: int):
    """Cell index of ``key`` in hash row ``r`` — 32 bits of
    md5('r:key'), mod the row width."""
    h = F.md5(F.concat(F.lit(str(r)), F.lit(":"), key))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                  F.lit(CMS_W))


def cms_build(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """(r, cell, cnt): the count-min counter grid over every row of
    ``keys`` (pre-explode multiplicities upstream). One groupBy on the
    (r, cell) pair — at most d·w distinct groups, so map-side combine
    collapses each input partition to ≤ 4096 rows before the shuffle."""
    k = F.col(key_col)
    rows = F.explode(F.array(*[
        F.struct(F.lit(r).cast("long").alias("r"),
                 _cell(k, r).alias("cell")) for r in range(CMS_D)]))
    return (keys.select(rows.alias("rc"))
            .select("rc.r", "rc.cell")
            .groupBy("r", "cell")
            .agg(F.count("*").alias("cnt")))


def cms_estimate(cms: DataFrame, probes: DataFrame,
                 key_col: str = "key") -> DataFrame:
    """(key, est): count-min estimate for each probe key — the MIN over the
    d hash rows of the probe's counter cell, where an ABSENT cell counts as
    0 (a key the sketch never saw must estimate 0, not the min of its
    collision cells). The materialized grid is ≤ d·w rows, so it broadcasts
    into the probe expansion."""
    k = F.col(key_col)
    pr = probes.select(
        k.alias("key"),
        F.explode(F.array(*[
            F.struct(F.lit(r).cast("long").alias("r"),
                     _cell(k, r).alias("cell")) for r in range(CMS_D)]))
        .alias("rc")).select("key", "rc.r", "rc.cell")
    return (pr.join(F.broadcast(cms), ["r", "cell"], "left")
            .groupBy("key")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                 .alias("est")))


def cms_oracle_sql(keys_sql: str, probes_sql: str) -> str:
    """DuckDB twin of ``cms_build`` + ``cms_estimate`` — generated beside
    the operator so constants and hash text stay in lockstep.
    ``keys_sql``/``probes_sql`` must yield a column named ``key``."""
    rows = ", ".join(str(r) for r in range(CMS_D))
    return f"""
WITH ks AS ({keys_sql}),
grid AS (
  SELECT r.r,
         try_cast('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || ks.key),
                                 1, 8) AS BIGINT) % {CMS_W} AS cell,
         COUNT(*) AS cnt
  FROM ks CROSS JOIN (SELECT unnest([{rows}]) AS r) r
  GROUP BY 1, 2),
pr AS (
  SELECT p.key, r.r,
         try_cast('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || p.key),
                                 1, 8) AS BIGINT) % {CMS_W} AS cell
  FROM ({probes_sql}) p CROSS JOIN (SELECT unnest([{rows}]) AS r) r)
SELECT pr.key, MIN(coalesce(grid.cnt, 0)) AS est
FROM pr LEFT JOIN grid ON grid.r = pr.r AND grid.cell = pr.cell
GROUP BY pr.key"""
