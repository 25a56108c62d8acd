"""Gap-based sessionization of event logs (crawl/fetch logs, user events).

Splits each entity's ordered event stream into sessions wherever the gap to
the previous event exceeds a threshold — the standard log-analytics
primitive (a crawl operator uses it on fetch logs to study per-host burst
behavior against the politeness budget; the reference has no analog, its
logs are unstructured stdout).

Scale shape: ONE shuffle keyed on the entity — the lag, the running
session counter, and the per-session aggregation all share the same
(entity) partitioning, so Catalyst plans a single exchange feeding two
window passes and a partial-aggregable groupBy. Timestamps are compared
with interval arithmetic (no epoch casts), so TIMESTAMP and TIMESTAMP_NTZ
columns both work independent of the session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               entity_col: str = "user_id", ts_col: str = "ts",
               order_tiebreak: str = "event_id",
               value_col: str = "value") -> DataFrame:
    """One row per (entity, session): (entity, session_seq 1-based,
    session_start, session_end, n_events, total_value). A session breaks
    when the gap to the previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, order_tiebreak)
    prev = F.lag(F.col(ts_col)).over(w)
    brk = (prev.isNull()
           | (F.col(ts_col) - prev
              > F.expr(f"INTERVAL {int(gap_minutes)} MINUTES"))).cast("long")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (events
            .withColumn("_brk", brk)
            .withColumn("session_seq", F.sum("_brk").over(run))
            .groupBy(F.col(entity_col), F.col("session_seq"))
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("total_value")))
