"""stream_sessionize: gap-closed and timeout-closed sessions match the
batch operator; checkpoint parameter validation."""

import datetime as dt
import os

import pandas as pd
import pytest

from supercrawler_spark.operators.sessions import sessionize
from supercrawler_spark.streaming.sessions import stream_sessionize


def _write_file(path, rows, mtime):
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
    # micros, not pandas-default nanos — Spark rejects TIMESTAMP(NANOS)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df.to_parquet(path, index=False)
    os.utime(path, (mtime, mtime))


def _t(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


def test_stream_sessionize_matches_batch(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    # batch order = mtime order, one file per micro-batch
    _write_file(src / "f1.parquet",
                [(1, 1, _t(10, 0), 1.5), (1, 2, _t(10, 10), 2.0),
                 (2, 3, _t(10, 5), 0.25)], 1000)
    # 11:00 is > 30min after 10:10 -> closes user1 session 1, opens s2
    _write_file(src / "f2.parquet", [(1, 4, _t(11, 0), 4.0)], 2000)
    # sentinel user pushes the watermark far forward (applies NEXT batch)
    _write_file(src / "f3.parquet", [(9, 5, _t(20, 0), 0.0)], 3000)
    # final batch runs with watermark=20:00 -> user1 s2 and user2 s1 time out
    _write_file(src / "f4.parquet", [(9, 6, _t(20, 1), 0.0)], 4000)

    out = str(tmp_path / "sessions_out")
    got = stream_sessionize(spark, str(src), out, gap_minutes=30,
                            watermark="0 seconds")
    rows = {(r["user_id"], r["session_seq"]): r
            for r in got.collect() if r["user_id"] != 9}

    real = spark.createDataFrame(
        pd.DataFrame([(1, 1, _t(10, 0), 1.5), (1, 2, _t(10, 10), 2.0),
                      (2, 3, _t(10, 5), 0.25), (1, 4, _t(11, 0), 4.0)],
                     columns=["user_id", "event_id", "ts", "value"]))
    batch = {(r["user_id"], r["session_seq"]): r
             for r in sessionize(real, gap_minutes=30).collect()}
    assert set(rows) == set(batch) == {(1, 1), (1, 2), (2, 1)}
    for k, r in rows.items():
        b = batch[k]
        assert r["session_start"] == b["session_start"]
        assert r["session_end"] == b["session_end"]
        assert r["n_events"] == b["n_events"]
        assert r["total_value_micros"] / 1e6 == pytest.approx(
            b["total_value"], abs=1e-6)


def test_stream_sessionize_resume_and_param_guard(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    _write_file(src / "f1.parquet",
                [(1, 1, _t(9, 0), 1.0), (1, 2, _t(12, 0), 1.0)], 1000)
    out = str(tmp_path / "out")
    got = stream_sessionize(spark, str(src), out, gap_minutes=30,
                            watermark="0 seconds")
    # availableNow runs a trailing timeout batch after the watermark
    # update, so the 9:00 session (sealed by watermark 12:00 > 9:30)
    # closes within this run; the 12:00 one stays open
    assert {(r["user_id"], r["session_seq"]) for r in got.collect()} \
        == {(1, 1)}
    # resume: the 15:00 watermark seals the 12:00 session with the seq
    # counter carried in state (no renumbering)
    _write_file(src / "f2.parquet", [(1, 3, _t(15, 0), 1.0)], 2000)
    got2 = stream_sessionize(spark, str(src), out, gap_minutes=30,
                             watermark="0 seconds")
    assert {(r["user_id"], r["session_seq"]) for r in got2.collect()} \
        == {(1, 1), (1, 2)}
    # resume again: 23:00 watermark seals the 15:00 session
    _write_file(src / "f3.parquet", [(1, 4, _t(23, 0), 1.0)], 3000)
    got3 = stream_sessionize(spark, str(src), out, gap_minutes=30,
                             watermark="0 seconds")
    assert {(r["user_id"], r["session_seq"]) for r in got3.collect()} \
        == {(1, 1), (1, 2), (1, 3)}
    # changed parameters against the same checkpoint fail loud
    with pytest.raises(ValueError, match="sessionize checkpoint"):
        stream_sessionize(spark, str(src), out, gap_minutes=10,
                          watermark="0 seconds")


def test_stream_sessionize_empty_run_returns_empty_frame(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    # one open session, no gap successor, no watermark progress past it:
    # zero sessions close and the read-back must be an empty frame, not a
    # schema-inference error
    _write_file(src / "f1.parquet", [(1, 1, _t(10, 0), 1.0)], 1000)
    out = str(tmp_path / "out")
    got = stream_sessionize(spark, str(src), out, gap_minutes=30,
                            watermark="0 seconds")
    assert got.count() == 0
    assert [f.name for f in got.schema.fields][:2] == ["user_id",
                                                       "session_seq"]


def test_stream_sessionize_late_event_forms_earlier_session(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    # watermark lag keeps the 08:00 straggler alive into batch 2; it is
    # > gap BEFORE the open 10:00 session, so it must become its OWN
    # earlier session (batch semantics), not stretch the open one — and
    # the 08:10 arrival in a LATER batch must merge into it (no premature
    # close fragmenting a late session split across micro-batches)
    _write_file(src / "f1.parquet", [(1, 1, _t(10, 0), 1.0)], 1000)
    _write_file(src / "f2.parquet", [(1, 2, _t(8, 0), 2.0)], 2000)
    # the late session's second event rides with the sentinel batch
    _write_file(src / "f3.parquet",
                [(1, 5, _t(8, 10), 0.5), (9, 3, _t(20, 0), 0.0)], 3000)
    # final batch runs with watermark 20:00-6h = 14:00 -> both sessions seal
    _write_file(src / "f4.parquet", [(9, 4, _t(20, 1), 0.0)], 4000)
    out = str(tmp_path / "out")
    got = stream_sessionize(spark, str(src), out, gap_minutes=30,
                            watermark="6 hours")
    rows = sorted((r["session_start"], r["session_end"], r["n_events"])
                  for r in got.collect() if r["user_id"] == 1)
    assert rows == [(_t(8, 0), _t(8, 10), 2), (_t(10, 0), _t(10, 0), 1)]
    seqs = {(r["session_start"], r["session_seq"]) for r in got.collect()
            if r["user_id"] == 1}
    assert seqs == {(_t(8, 0), 1), (_t(10, 0), 2)}   # start-order numbering
