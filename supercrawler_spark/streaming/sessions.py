"""Streaming gap-based sessionization — a CUSTOM stateful operator built on
``applyInPandasWithState`` (the L8 surface the built-in streaming aggregates
can't express: per-key ordered gap logic with incremental emission).

The batch twin is ``operators/sessions.sessionize``; here each entity's open
session lives in the state store across micro-batches. Arriving events
extend or close it:

- events inside the gap extend the open session (state update, no output),
- an event past the gap CLOSES the open session (emitted immediately) and
  opens a new one,
- a LATE event more than the gap BEFORE the open session forms its own
  earlier session (batch-equivalent segment merging: each batch's events
  are gap-chained, merged with the stored open segment by interval
  distance, and every segment but the newest closes),
- event-time timeout (watermark passing ``last_ts + gap``) closes an idle
  session without needing a successor event — the mechanism that bounds
  state: one open session per ACTIVE entity, plus a seq-counter row for
  entities gone quiet.

Events older than the watermark are dropped by the watermark operator
before the state function sees them (the standard streaming trade; the
batch operator is the exact-but-rescan alternative). A per-entity
``session_seq`` counter rides in state so closed sessions carry the same
1-based numbering the batch operator produces; sessions close in
start-time order, so the numbering matches batch whenever late data stays
within one batch's horizon.

Output rows are CLOSED sessions only; sessions still open when an
``availableNow`` run drains stay in state and are emitted by a later run
once further events or watermark progress close them (state persists in
the checkpoint, same resume discipline as ``streaming/dedup``).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StructField, StructType,
                               TimestampType)

OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_seq", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("total_value_micros", LongType()),
])
# (next_seq, session_start_us, last_ts_us, n_events, value_micros)
STATE_SCHEMA = StructType([
    StructField("next_seq", LongType()),
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
    StructField("value_micros", LongType()),
])

_US = 1_000_000


def _session_fn(gap_us: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = key[0]

        if state.exists:
            next_seq, start_us, last_us, n_ev, val_mu = state.get
            if n_ev == 0:            # seq-counter-only state, no open session
                start_us = last_us = None
        else:
            next_seq, start_us, last_us, n_ev, val_mu = 1, None, None, 0, 0

        if state.hasTimedOut:
            # watermark passed last_ts + gap with no successor event; keep a
            # seq-counter-only state row (n_events=0, no timeout re-armed) so
            # the entity's NEXT session numbers correctly — state per
            # once-seen entity is one 5-long row, the same flat bound as the
            # streaming dedup's per-hash state
            closed = []
            if start_us is not None:
                closed.append((user_id, next_seq,
                               pd.Timestamp(start_us, unit="us"),
                               pd.Timestamp(last_us, unit="us"),
                               n_ev, val_mu))
                next_seq += 1
            state.update((next_seq, 0, 0, 0, 0))
            if closed:
                yield pd.DataFrame(closed, columns=[f.name for f in
                                                    OUT_SCHEMA.fields])
            return

        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        ev = pd.concat(frames, ignore_index=True)
        ev["_us"] = ev["ts"].values.astype("datetime64[us]").astype("int64")
        # micro-unit values: combine-order-independent like the batch
        # operator's round(sum, 6)
        ev["_mu"] = (ev["value"] * _US).round().astype("int64")
        ev = ev.sort_values(["_us", "event_id"])

        # gap-chain this batch's events into segments (start, last, n, sum)
        segs: list[list[int]] = []
        for t_us, mu in zip(ev["_us"], ev["_mu"]):
            if segs and t_us - segs[-1][1] <= gap_us:
                s = segs[-1]
                s[0] = min(s[0], t_us)
                s[1] = max(s[1], t_us)
                s[2] += 1
                s[3] += mu
            else:
                segs.append([t_us, t_us, 1, mu])
        # merge the stored open segment in by start order, then re-sweep:
        # a late batch whose events precede the open session by more than
        # the gap yields a SEPARATE earlier session (batch semantics)
        # instead of silently stretching the open one
        if start_us is not None:
            segs.append([start_us, last_us, n_ev, val_mu])
            segs.sort(key=lambda s: (s[0], s[1]))
            merged: list[list[int]] = []
            for s in segs:
                if merged and s[0] - merged[-1][1] <= gap_us:
                    m = merged[-1]
                    m[1] = max(m[1], s[1])
                    m[2] += s[2]
                    m[3] += s[3]
                else:
                    merged.append(s)
            segs = merged

        closed = []
        for s in segs[:-1]:
            closed.append((user_id, next_seq,
                           pd.Timestamp(s[0], unit="us"),
                           pd.Timestamp(s[1], unit="us"), s[2], s[3]))
            next_seq += 1
        start_us, last_us, n_ev, val_mu = segs[-1]
        state.update((next_seq, start_us, last_us, n_ev, val_mu))
        # close the open session once the watermark clears the gap;
        # timeouts must sit beyond the current watermark
        t = max((last_us + gap_us) // 1000,
                state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(t)

        if closed:
            yield pd.DataFrame(closed, columns=[f.name for f in
                                                OUT_SCHEMA.fields])

    return fn


def stream_sessionize(spark: SparkSession, events_dir: str, out_dir: str,
                      gap_minutes: int = 30, watermark: str = "0 seconds",
                      max_files_per_trigger: int = 1) -> DataFrame:
    """Run the sessionizer over a parquet directory source (availableNow,
    one micro-batch per ``max_files_per_trigger`` files in mtime order) and
    return the closed sessions accumulated in ``out_dir``. Same
    checkpoint-with-output + parameter-validation discipline as
    ``streaming/dedup.stream_exact_dedup``."""
    params = {"events_dir": os.path.abspath(events_dir),
              "gap_minutes": gap_minutes, "watermark": watermark}
    ppath = os.path.join(out_dir, "_sessionize_params.json")
    if os.path.exists(ppath):
        with open(ppath) as f:
            prev = json.load(f)
        if prev != params:
            raise ValueError(
                f"out_dir {out_dir!r} holds a sessionize checkpoint for "
                f"{prev}; re-invoke with the same parameters or use a "
                f"fresh out_dir (got {params})")
    else:
        os.makedirs(out_dir, exist_ok=True)
        with open(ppath, "w") as f:
            json.dump(params, f, indent=1, sort_keys=True)

    schema = spark.read.parquet(events_dir).schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .load(events_dir)
              .select("user_id", "event_id", "ts", "value")
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withWatermark("ts", watermark))
    sessions = (stream.groupBy("user_id")
                .applyInPandasWithState(
                    _session_fn(gap_minutes * 60 * _US),
                    OUT_SCHEMA, STATE_SCHEMA, "append",
                    GroupStateTimeout.EventTimeTimeout))
    q = (sessions.writeStream.outputMode("append").format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # a run that closed zero sessions leaves no data files — read with the
    # declared schema so the caller gets an empty frame, not an inference
    # error
    return spark.read.schema(OUT_SCHEMA).parquet(out_dir)
