"""Streaming gap-based sessionization — a CUSTOM stateful operator built on
``applyInPandasWithState`` (the L8 surface the built-in streaming aggregates
can't express: per-key ordered gap logic with incremental emission).

The batch twin is ``operators/sessions.sessionize``; here each entity's
OPEN session segments live in the state store across micro-batches
(several can be open at once while late-but-valid events may still land
between them). Each batch's events are gap-chained into segments and
merged with the stored ones by interval distance — so a late event extends
the right segment (forward OR backward) or opens its own earlier one. A
segment is emitted only once the WATERMARK seals it (watermark >
segment_end + gap): at that point no admissible event can merge into or
bridge onto it, which is exactly the batch-equivalence condition — under
any event ordering the watermark contract admits, closed sessions match
the batch operator's (start, end, n, sum), and closure happens in start
order so the per-entity ``session_seq`` counter in state reproduces the
batch 1-based numbering. Event-time timeouts wake idle entities when
their earliest open segment becomes sealable; entities gone quiet keep
only a seq-counter row.

Events older than the watermark are dropped by the watermark operator
before the state function sees them (the standard streaming trade; the
batch operator is the exact-but-rescan alternative).

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
from pyspark.sql.types import (ArrayType, LongType, StructField,
                               StructType, TimestampType)

OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_seq", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("total_value_micros", LongType()),
])
# (next_seq, starts[], lasts[], n_events[], value_micros[]) — parallel
# arrays of the entity's OPEN segments (gap-separated, start-ordered);
# several can be open at once while late-but-valid events may still merge
# into them
STATE_SCHEMA = StructType([
    StructField("next_seq", LongType()),
    StructField("starts", ArrayType(LongType())),
    StructField("lasts", ArrayType(LongType())),
    StructField("ns", ArrayType(LongType())),
    StructField("mus", ArrayType(LongType())),
])

_US = 1_000_000


def _session_fn(gap_us: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = key[0]

        if state.exists:
            next_seq, starts, lasts, ns, mus = state.get
            segs = [list(t) for t in zip(starts or [], lasts or [],
                                         ns or [], mus or [])]
        else:
            next_seq, segs = 1, []

        if not state.hasTimedOut:
            frames = [p for p in pdfs if len(p)]
            if not frames and not segs:
                return
            if frames:
                ev = pd.concat(frames, ignore_index=True)
                ev["_us"] = (ev["ts"].values.astype("datetime64[us]")
                             .astype("int64"))
                # micro-unit values: combine-order-independent like the
                # batch operator's round(sum, 6)
                ev["_mu"] = (ev["value"] * _US).round().astype("int64")
                ev = ev.sort_values(["_us", "event_id"])
                # gap-chain this batch into (start, last, n, sum) segments
                batch_segs: list[list[int]] = []
                for t_us, mu in zip(ev["_us"], ev["_mu"]):
                    if batch_segs and t_us - batch_segs[-1][1] <= gap_us:
                        s = batch_segs[-1]
                        s[1] = t_us
                        s[2] += 1
                        s[3] += mu
                    else:
                        batch_segs.append([t_us, t_us, 1, mu])
                # merge stored + batch segments by interval distance, so a
                # late batch lands in (or before) the right stored segment
                # instead of stretching the newest one; the start-ordered
                # sweep also extends a stored segment BACKWARD when a
                # within-gap earlier event arrives
                segs = sorted(segs + batch_segs,
                              key=lambda s: (s[0], s[1]))
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

        # a segment is SEALED — no event the watermark still admits can
        # merge into or bridge onto it — exactly when watermark > end+gap;
        # segments are gap-separated so ends are ordered and sealing closes
        # a start-order prefix, keeping session_seq in start order (the
        # batch numbering whenever late data stays within one horizon)
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = []
        remaining: list[list[int]] = []
        for s in segs:
            if wm_us > s[1] + gap_us and not remaining:
                closed.append((user_id, next_seq,
                               pd.Timestamp(s[0], unit="us"),
                               pd.Timestamp(s[1], unit="us"), s[2], s[3]))
                next_seq += 1
            else:
                remaining.append(s)

        state.update((next_seq,
                      [s[0] for s in remaining], [s[1] for s in remaining],
                      [s[2] for s in remaining], [s[3] for s in remaining]))
        if remaining:
            # wake when the earliest open segment becomes sealable;
            # timeouts must sit beyond the current watermark
            t = max((remaining[0][1] + gap_us) // 1000,
                    state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(t)
        # else: seq-counter-only state, no timeout re-armed — one tiny row
        # per once-seen entity, the same flat bound as streaming dedup

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
