"""Live alarm path: snapshot stream -> foreachBatch kinematics + dead
reckoning -> payload sink (the reference's per-update alarm loop,
airstrik.py:697)."""

from __future__ import annotations

import json
import os

from airstrik_py_spark.config import REFERENCE
from airstrik_py_spark.sources.snapshot import read_snapshot_stream
from airstrik_py_spark.streaming.pipeline import alarm_foreach_batch

BASE = 1700000000.0


def test_stream_alarm_payloads(spark, tmp_path):
    tape = str(tmp_path / "tape")
    os.makedirs(tape)
    # one plane diving toward home fast enough to trigger a warning
    for i, lat in enumerate([35.727 - 0.20, 35.727 - 0.12]):
        snap = {
            "now": BASE + 30 * i,
            "aircraft": [
                {"hex": "aa", "flight": "DAL1", "lat": lat, "lon": -78.696,
                 "alt_geom": 500.0, "seen": 0.1}
            ],
        }
        with open(os.path.join(tape, f"s{i}.json"), "w") as f:
            json.dump(snap, f)

    captured = []

    def sink(pay_df, epoch_id):
        captured.extend(pay_df.collect())

    q = (
        read_snapshot_stream(spark, tape)
        .writeStream.foreachBatch(alarm_foreach_batch(REFERENCE, sink))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    warnings = [r for r in captured if r["topic"] == "airstrik-warning"]
    assert warnings, f"expected a warning payload, got {captured}"
    w = warnings[-1]
    assert w["plane_hex"] == "aa"
    assert 0 < w["eta"] <= REFERENCE.think_ahead
    assert w["plane_id"] == "DAL1"
