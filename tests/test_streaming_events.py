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


def test_stream_attribution_equals_batch(spark, tmp_path):
    """Stream == batch parity for last-touch attribution: the same parquet
    tape through the keyed-state attributor and the batch window form,
    including an unattributed conversion and a touch after a conversion."""
    from airstrik_py_spark.operators.events import attribution_last_touch
    from airstrik_py_spark.streaming.stateful import stream_attribution

    rows = [
        (0, 1.0, 7, "click", 5.0),
        (1, 3.0, 7, "click", 5.0),
        (2, 4.0, 7, "purchase", 42.5),
        (3, 5.0, 7, "click", 5.0),
        (4, 6.0, 7, "purchase", 7.25),
        (5, 2.0, 8, "purchase", 9.0),   # no prior click -> NULL touch
        (6, 8.0, 8, "click", 1.0),
    ]
    df = spark.createDataFrame(
        [
            (eid, datetime.utcfromtimestamp(t), uid, et, val, None)
            for eid, t, uid, et, val in rows
        ],
        _SCHEMA,
    )
    tape = str(tmp_path / "attr_tape")
    df.coalesce(1).write.parquet(tape)

    stream = spark.readStream.schema(_SCHEMA).parquet(tape)
    q = (
        stream_attribution(stream, live=False)
        .writeStream.format("memory")
        .queryName("attr_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["conversion_id"]: (r["touch_id"], r["gap_us"], r["value"])
        for r in spark.table("attr_stream").collect()
    }
    want = {
        r["conversion_id"]: (r["touch_id"], r["gap_us"], r["value"])
        for r in attribution_last_touch(df).collect()
    }
    assert got == want
    assert got[2] == (1, 1_000_000, 42.5)   # latest prior click wins
    assert got[4] == (3, 1_000_000, 7.25)   # click after eid 2 now counts
    assert got[5] == (None, None, 9.0)      # unattributed survives


def test_attributor_late_future_touch_and_chunked_delivery():
    """Unit test of the keyed attribution state fn (no Spark needed):
    (1) a conversion delivered in a LATER micro-batch than a touch whose
    EVENT time is after the conversion's attributes NULL — the batch
    twin's strictly-preceding rule (ADVICE r7); (2) one group split
    across pandas chunks is re-sorted globally, so a conversion chunk
    arriving before its preceding touch's chunk still attributes."""
    import pandas as pd

    from airstrik_py_spark.streaming.stateful import make_attributor

    class _State:
        exists = False
        hasTimedOut = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    fn = make_attributor(live=False)
    cols = ["event_id", "us", "event_type", "value"]

    st = _State()
    b1 = pd.DataFrame([[1, 100, "click", 0.0]], columns=cols)
    assert list(fn((7,), iter([b1]), st)) == []
    # late conversion at t=50: the remembered touch (t=100) is in its
    # future -> NULL attribution, exactly what the batch window computes
    b2 = pd.DataFrame([[2, 50, "purchase", 9.0]], columns=cols)
    out = pd.concat(list(fn((7,), iter([b2]), st)))
    assert pd.isna(out.iloc[0]["touch_id"]) and pd.isna(out.iloc[0]["gap_us"])

    st2 = _State()
    c1 = pd.DataFrame([[5, 300, "purchase", 1.0]], columns=cols)
    c2 = pd.DataFrame([[3, 200, "click", 0.0]], columns=cols)
    out2 = pd.concat(list(fn((7,), iter([c1, c2]), st2)))
    assert int(out2.iloc[0]["touch_id"]) == 3
    assert int(out2.iloc[0]["gap_us"]) == 100


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """Stream-STREAM watermarked interval join == the same join on static
    frames: every purchase pairs with every same-user click in the
    preceding hour (inclusive lower bound, strict upper)."""
    from airstrik_py_spark.streaming.pipeline import stream_touch_conversion_pairs

    rows = [
        (0, 100.0, 7, "click"),
        (1, 200.0, 7, "click"),
        (2, 250.0, 7, "purchase"),   # pairs with clicks 0 and 1
        (3, 4000.0, 7, "purchase"),  # pairs with nothing (>1h later)
        (4, 50.0, 8, "click"),
        (5, 60.0, 8, "purchase"),    # pairs with click 4 (same user only)
        # watermark flush far in the future so availableNow emits all pairs
        (6, 1_000_000.0, 999, "click"),
        (7, 1_000_001.0, 999, "purchase"),
    ]
    df = spark.createDataFrame(
        [
            (eid, datetime.utcfromtimestamp(t), uid, et, 1.0, None)
            for eid, t, uid, et in rows
        ],
        _SCHEMA,
    )
    tape = str(tmp_path / "ssj_tape")
    df.coalesce(1).write.parquet(tape)

    stream = spark.readStream.schema(_SCHEMA).parquet(tape)
    q = (
        stream_touch_conversion_pairs(stream)
        .writeStream.format("memory")
        .queryName("ssj_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["purchase_id"], r["click_id"]): r["gap_us"]
        for r in spark.table("ssj_stream").collect()
        if r["user_id"] != 999
    }
    want = {
        (r["purchase_id"], r["click_id"]): r["gap_us"]
        for r in stream_touch_conversion_pairs(df).collect()
        if r["user_id"] != 999
    }
    assert got == want
    assert set(got) == {(2, 0), (2, 1), (5, 4)}
    assert got[(2, 0)] == 150_000_000 and got[(5, 4)] == 10_000_000


def test_state_shuffle_partitions_formula():
    """Partitions size to state VOLUME, not CPU count (the measured
    state-grid rule): tiny state -> 1 partition, the sf0.1 interval-join
    state (~40k rows) -> ~10, growth linear until the cap."""
    from airstrik_py_spark.streaming.pipeline import (
        STATE_ROWS_PER_PARTITION,
        state_shuffle_partitions,
    )

    assert state_shuffle_partitions(0) == 1
    assert state_shuffle_partitions(STATE_ROWS_PER_PARTITION) == 1
    assert state_shuffle_partitions(40_000) == -(-40_000 // STATE_ROWS_PER_PARTITION)
    assert state_shuffle_partitions(10**9) == 128  # capped
    assert state_shuffle_partitions(10**9, max_partitions=256) == 256
