"""Stream == batch parity for event sessionization: the same parquet tape
through stream_sessionize_events (session_window + watermark, availableNow
drain) and through the batch lag-cumsum sessionizer."""

from __future__ import annotations

from datetime import datetime

from airstrik_py_spark.operators.events import sessionize_events
from airstrik_py_spark.streaming.pipeline import stream_sessionize_events

GAP_S = 60

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (eid, datetime.utcfromtimestamp(t), uid, "view", 1.0, None)
            for eid, t, uid in rows
        ],
        _SCHEMA,
    )


def test_stream_sessionize_equals_batch(spark, tmp_path):
    # user 7: sessions [0..60] (exact-boundary gap stays), [200..210];
    # user 8: one event
    rows = [
        (0, 0.0, 7),
        (1, 60.0, 7),
        (2, 200.0, 7),
        (3, 210.0, 7),
        (4, 5.0, 8),
        # watermark flush: a far-future event advances the watermark past
        # every real session's end + gap so availableNow emits them all
        # (same trick as test_streaming.py's "zz" plane)
        (5, 100_000.0, 999),
    ]
    tape = str(tmp_path / "ev_tape")
    _events(spark, rows).coalesce(1).write.parquet(tape)

    stream = spark.readStream.schema(_SCHEMA).parquet(tape)
    q = (
        stream_sessionize_events(stream, GAP_S)
        .writeStream.format("memory")
        .queryName("ev_sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["start_us"]): (r["end_us"], r["n_events"], r["duration_us"])
        for r in spark.table("ev_sessions_stream").collect()
        if r["user_id"] != 999
    }

    batch = sessionize_events(spark.read.parquet(tape), GAP_S)
    want = {
        (r["user_id"], r["start_us"]): (r["end_us"], r["n_events"], r["duration_us"])
        for r in batch.collect()
        if r["user_id"] != 999
    }
    assert got == want
    assert len(want) == 3
    # exact-boundary 60 s gap did NOT split (strict-> batch boundary,
    # epsilon-matched in the stream)
    assert got[(7, 0)] == (60_000_000, 2, 60_000_000)
