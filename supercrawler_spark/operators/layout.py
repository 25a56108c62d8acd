"""Data-layout operators: Z-order (Morton) interleave keys.

At 100 TB the scan you avoid beats the scan you optimize: sorting a table
by a Z-order key before writing clusters rows that are close in BOTH key
dimensions into the same parquet files, so per-file min/max statistics
prune multi-predicate scans (host + time, user + day) that a single-column
sort can only prune on its leading column. This is the layout pass behind
Delta/Iceberg ``ZORDER BY`` — expressed here as a plain deterministic
column so it works on any table this engine writes (the crawl store's
bucket layout composes with it: bucket prunes the equality key, Z-order
prunes the range pair inside a bucket).

Pure integer bit arithmetic (shift/and/or), bit-identical in Spark and
DuckDB — no UDF, no shuffle; the key is computed at scan speed and the
sort that uses it is the one shuffle a layout rewrite pays anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_expr(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative integer
    columns: bit i of ``a`` lands at position 2i+1, bit i of ``b`` at 2i.
    Values are masked to ``bits`` first (callers bucket/hash wider domains
    down — e.g. ``pmod(xxhash64(host), 2**bits)``)."""
    mask = (1 << bits) - 1
    am = F.pmod(a.cast("long"), F.lit(mask + 1))
    bm = F.pmod(b.cast("long"), F.lit(mask + 1))
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(am, i).bitwiseAND(F.lit(1)),
                                 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(bm, i).bitwiseAND(F.lit(1)),
                                 2 * i))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def zorder_key(df: DataFrame, col_a: str, col_b: str, bits: int = 16,
               out_col: str = "zkey") -> DataFrame:
    """Append the Z-order key column; write-side usage is
    ``df.repartitionByRange(n, out_col).sortWithinPartitions(out_col)``
    before the parquet/Iceberg write so file min/max stats become tight
    2-D range boxes."""
    return df.withColumn(out_col,
                         zorder_expr(F.col(col_a), F.col(col_b), bits))


def zorder_oracle_sql(table_sql: str, a_expr: str, b_expr: str,
                      bits: int = 16, keep: str = "") -> str:
    """DuckDB twin of :func:`zorder_expr` over ``table_sql`` — generated
    beside the operator so the bit arithmetic stays in lockstep."""
    m = (1 << bits)
    terms = " + ".join(
        f"((({a_expr}) % {m} >> {i}) & 1) * {1 << (2 * i + 1)}"
        f" + ((({b_expr}) % {m} >> {i}) & 1) * {1 << (2 * i)}"
        for i in range(bits))
    extra = f", {keep}" if keep else ""
    return f"SELECT CAST({terms} AS BIGINT) AS zkey{extra} FROM {table_sql}"
