"""transformWithStateInPandas tracker produces identical output to the
applyInPandasWithState implementation on the same tape."""

from __future__ import annotations

import json
import os

import pytest

from airstrik_py_spark.config import EngineConfig
from airstrik_py_spark.sources.snapshot import read_snapshot_stream
from airstrik_py_spark.streaming.pipeline import with_stream_distance
from airstrik_py_spark.streaming.stateful import tracked_stream
from airstrik_py_spark.streaming.tws import tracked_stream_tws

CFG = EngineConfig(decimation_factor=2)
BASE = 1700000000.0


def _tape(tmpdir: str) -> None:
    positions = [
        (35.90, -78.70),
        (35.90, -78.70),  # dup
        (35.85, -78.70),
        (35.73, -78.696),  # inside zone
        (35.95, -78.70),
    ]
    for i, (lat, lon) in enumerate(positions):
        snap = {
            "now": BASE + 10 * i,
            "aircraft": [{"hex": "a", "lat": lat, "lon": lon, "seen": 0.1}],
        }
        with open(os.path.join(tmpdir, f"s{i:03d}.json"), "w") as f:
            json.dump(snap, f)


def _run(spark, stream_fn, tape, name):
    stream = with_stream_distance(read_snapshot_stream(spark, tape), CFG)
    q = (
        stream_fn(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return sorted(
        (
            (r["hex"], r["ts_sec"], r["update_seq"], r["emit"], r["alarm_triggered"])
            for r in spark.table(name).collect()
        )
    )


@pytest.mark.skipif(
    not __import__(
        "airstrik_py_spark.streaming.tws", fromlist=["tws_available"]
    ).tws_available(),
    reason="google.protobuf not installed (transformWithState state protocol)",
)
def test_tws_matches_apply_in_pandas_with_state(spark, tmp_path):
    tape = str(tmp_path / "tape")
    os.makedirs(tape)
    _tape(tape)

    legacy = _run(spark, lambda s: tracked_stream(s, CFG, live=False), tape, "legacy")
    tws = _run(spark, lambda s: tracked_stream_tws(s, CFG), tape, "tws")

    assert legacy == tws
    assert len(tws) == 4  # dup suppressed
    assert [r[4] for r in tws] == [False, False, True, True]  # sticky latches
