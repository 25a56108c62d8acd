"""Sketch aggregations: a deterministic HyperLogLog distinct-count.

``approx_count_distinct`` exists in Spark, but its HLL++ register hashing is
JVM-private — no external oracle can replay it bit-for-bit. This operator
builds the classic Flajolet HLL (p=12, 4096 registers) from ``md5`` bits that
BOTH Spark and DuckDB compute identically, and keeps the register arithmetic
in exact integers so the estimate is reproducible across engines AND across
partitionings:

- register index = first 12 bits of md5(value), rho = leading-zero rank of
  the next 48 bits (pure integer ``length(bin(w))``, no float log),
- the harmonic sum ``sum(2^-rho)`` is scaled by 2^49 into an INTEGER sum
  (each term 2^(49-rho) is exact; 4096 registers bound it < 2^61), so
  partial-aggregation combine order cannot wiggle low bits,
- the only float ops are one division by the scaled sum and the
  small-range ``m * ln(m/V)`` correction — both single expressions mirrored
  verbatim in the DuckDB oracle.

Why it matters at 100 TB: distinct users/URLs per key via ``countDistinct``
shuffles every raw (key, value) pair; the sketch shuffles at most
``keys x 4096`` register rows after map-side combine — the aggregation the
reference's status counters (SURVEY.md §2 A1-A4) would need at web scale.
Standard error ~1.04/sqrt(4096) ≈ 1.6%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HLL_P = 12
HLL_M = 1 << HLL_P                      # 4096 registers
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# alpha * m^2, pre-scaled by the 2^49 integer-sum scale: raw = HLL_C / S
HLL_C = HLL_ALPHA * HLL_M * HLL_M * float(1 << 49)


def hll_distinct(df: DataFrame, key_cols: list[str],
                 value_col: str) -> DataFrame:
    """(*key_cols, hll_distinct): approximate distinct ``value_col`` per key
    group. ``hll_distinct`` is rounded to 4 decimals (it is an estimate, not
    a count — the fraction carries the small-range ``m ln(m/V)`` branch)."""
    h = F.md5(F.col(value_col).cast("string"))
    reg = F.conv(F.substring(h, 1, 3), 16, 10).cast("long")
    w = F.conv(F.substring(h, 4, 12), 16, 10).cast("long")
    bitlen = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    rho = (F.lit(49) - bitlen).alias("rho")
    keys = [F.col(c) for c in key_cols]
    # NULL values are ignored like countDistinct's — md5(NULL) would
    # otherwise survive the register groupBy as a phantom register whose
    # NULL term skews the harmonic sum
    per_reg = (df.filter(F.col(value_col).isNotNull())
               .select(*keys, reg.alias("reg"), rho)
               .groupBy(*key_cols, "reg")
               .agg(F.max("rho").alias("m_rho")))
    per_key = (per_reg
               .select(*keys,
                       F.pow(F.lit(2.0), F.lit(49) - F.col("m_rho"))
                       .cast("long").alias("term"))
               .groupBy(*key_cols)
               .agg(F.sum("term").alias("s_obs"),
                    F.count("*").alias("v_obs")))
    s = (F.col("s_obs")
         + (F.lit(HLL_M) - F.col("v_obs")) * F.lit(1 << 49).cast("long"))
    raw = F.lit(HLL_C) / s.cast("double")
    v_zero = F.lit(HLL_M) - F.col("v_obs")
    est = F.when((v_zero > 0) & (raw <= 2.5 * HLL_M),
                 F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M))
                                             / v_zero.cast("double"))) \
        .otherwise(raw)
    scored = per_key.select(*keys, F.round(est, 4).alias("hll_distinct"))
    # groupBy+countDistinct semantics: a key whose values are ALL NULL still
    # appears, with estimate 0 (the NULL filter above would otherwise drop
    # the whole group)
    all_keys = df.select(*key_cols).distinct()
    return (all_keys.join(scored, key_cols, "left")
            .select(*keys, F.coalesce(F.col("hll_distinct"), F.lit(0.0))
                    .alias("hll_distinct")))


def hll_oracle_sql(table: str, key_expr: str, value_expr: str,
                   key_alias: str = "key", where: str = "") -> str:
    """The DuckDB twin of :func:`hll_distinct` — generated next to the
    operator so the constants and association order stay in lockstep."""
    # parenthesize any caller predicate so a top-level OR cannot rebind
    # against the appended null guard
    cond = where.strip()
    if cond.upper().startswith("WHERE"):
        cond = cond[5:].strip()
    guard = (f"WHERE ({cond}) AND (({value_expr}) IS NOT NULL)" if cond
             else f"WHERE ({value_expr}) IS NOT NULL")
    return f"""
WITH h AS (
  SELECT {key_expr} AS key, md5(CAST({value_expr} AS VARCHAR)) AS hx
  FROM {table} {guard}),
b AS (
  SELECT key,
         try_cast('0x' || substr(hx, 1, 3) AS BIGINT) AS reg,
         try_cast('0x' || substr(hx, 4, 12) AS BIGINT) AS w
  FROM h),
r AS (
  SELECT key, reg,
         MAX(49 - CASE WHEN w = 0 THEN 0 ELSE length(bin(w)) END) AS m_rho
  FROM b GROUP BY key, reg),
k AS (
  SELECT key, SUM(1::BIGINT << (49 - m_rho)) AS s_obs, COUNT(*) AS v_obs
  FROM r GROUP BY key),
e AS (
  SELECT key,
         s_obs + ({HLL_M} - v_obs) * (1::BIGINT << 49) AS s,
         {HLL_M} - v_obs AS v_zero
  FROM k),
allk AS (SELECT DISTINCT {key_expr} AS key FROM {table} {where})
SELECT allk.key AS {key_alias},
       coalesce(round(CASE WHEN v_zero > 0
                   AND {HLL_C!r} / CAST(s AS DOUBLE) <= {2.5 * HLL_M!r}
             THEN {float(HLL_M)!r} * ln({float(HLL_M)!r}
                                        / CAST(v_zero AS DOUBLE))
             ELSE {HLL_C!r} / CAST(s AS DOUBLE) END, 4), 0.0)
         AS hll_distinct
FROM allk LEFT JOIN e ON e.key = allk.key"""
