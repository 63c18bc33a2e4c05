"""Wire-contract tests for the GUARDED sinks + the S2 decoder adapter
(VERDICT r10 #4 and #6).

Mongo/Kafka services can't run in this container, so the writer CHAIN is
captured with a recording stub patched over DataFrame.write: the tests
pin exactly what write_kafka / write_store_mongo would put on the wire —
format, options, save mode, and the full record content (which for Kafka
must be the kafka_records golden bytes).  A drift in either the payload
serialization or the writer wiring fails here without any broker.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

import pyspark.sql
import pytest

from airstrik_py_spark import sinks
from tests.test_sinks_repl import KAFKA_PAYLOAD_SCHEMA


class _RecordingWriter:
    """Stand-in for DataFrameWriter: records the chain, collects the frame
    at save() so content is asserted exactly as it would be sent."""

    captured: list["_RecordingWriter"] = []

    def __init__(self, df):
        self.df = df
        self.fmt = None
        self.opts = {}
        self.save_mode = None

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def mode(self, m):
        self.save_mode = m
        return self

    def save(self):
        self.rows = self.df.collect()
        _RecordingWriter.captured.append(self)


@pytest.fixture()
def capture_writes(monkeypatch):
    _RecordingWriter.captured = []
    # patch the CONCRETE class: in PySpark 4 classic mode df.write resolves
    # on pyspark.sql.classic.dataframe.DataFrame, not the abstract base
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _ConcreteDF
    except ImportError:  # older pyspark: one DataFrame class
        _ConcreteDF = pyspark.sql.DataFrame
    monkeypatch.setattr(_ConcreteDF, "write", property(_RecordingWriter))
    return _RecordingWriter.captured


def test_write_kafka_wire(spark, capture_writes):
    """write_kafka must route payloads THROUGH kafka_records (key/value/
    topic golden bytes) and configure the kafka source with the broker."""
    pay = spark.createDataFrame(
        [
            ("abc123", "AAL1", 1700000000.25, 90.5, 500.25, None,
             35.7, -78.7, 8.5, 0, "airstrik-alert"),
            ("def456", "", 1700000010.0, 180.0, 420.0, 3500.0,
             35.81, -78.61, 15.25, 12, "airstrik-warning"),
        ],
        KAFKA_PAYLOAD_SCHEMA,
    )
    sinks.write_kafka(pay, "broker:9092")
    assert len(capture_writes) == 1
    w = capture_writes[0]
    assert w.fmt == "kafka"
    assert w.opts == {"kafka.bootstrap.servers": "broker:9092"}
    recs = {r["topic"]: r for r in w.rows}
    assert all(list(r.asDict()) == ["key", "value", "topic"] for r in w.rows)
    assert recs["airstrik-alert"]["key"] == "abc123"
    assert recs["airstrik-alert"]["value"] == (
        '{"plane_hex":"abc123","plane_id":"AAL1","plane_time":1.70000000025E9,'
        '"heading":90.5,"speed":500.25,"altitude":"unknown","latitude":35.7,'
        '"longitude":-78.7,"distance":8.5}'
    )
    assert recs["airstrik-warning"]["key"] == "def456"
    assert "eta" in json.loads(recs["airstrik-warning"]["value"])
    assert "eta" not in json.loads(recs["airstrik-alert"]["value"])


def test_write_store_mongo_wire(spark, capture_writes, monkeypatch):
    """write_store_mongo's writer chain: mongodb format, append mode,
    connection options, and the UNTOUCHED document frame (the nested
    trip_documents shape maps 1:1 to BSON)."""
    monkeypatch.setattr(sinks, "MONGO_CONNECTOR_AVAILABLE", True)
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    sinks.write_store_mongo(df, "mongodb://h:27017", "airstrik", "flight_records")
    assert len(capture_writes) == 1
    w = capture_writes[0]
    assert w.fmt == "mongodb"
    assert w.save_mode == "append"
    assert w.opts == {
        "connection.uri": "mongodb://h:27017",
        "database": "airstrik",
        "collection": "flight_records",
    }
    assert [r.asDict() for r in w.rows] == [{"a": 1, "b": "x"}]


def test_write_store_mongo_guard_without_connector(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(NotImplementedError, match="mongo-spark-connector"):
        sinks.write_store_mongo(df, "mongodb://h", "db", "c")


# --- S2 DecoderAdapter lifecycle (VERDICT r10 #6) -------------------------


def _wait_flag(adapter, want, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if adapter.proc.poll() is not None:
            adapter._watch.join(timeout=2.0)
            return adapter.crashed == want
        time.sleep(0.02)
    return False


def test_decoder_adapter_crash_sets_flag(tmp_path):
    """Reference end_process parity (airstrik.py:71-74): NONZERO exit ->
    crashed; the engine's feed loop uses the flag to bail out."""
    from airstrik_py_spark.sources.snapshot import DecoderAdapter

    a = DecoderAdapter([sys.executable, "-c", "import sys; sys.exit(3)"],
                       str(tmp_path))
    a.start()
    assert _wait_flag(a, want=True)
    assert a.crashed is True


def test_decoder_adapter_clean_exit_not_crash(tmp_path):
    """airstrik.py:74 `if p.returncode:` — a zero exit never sets the flag."""
    from airstrik_py_spark.sources.snapshot import DecoderAdapter

    a = DecoderAdapter([sys.executable, "-c", "pass"], str(tmp_path))
    a.start()
    assert _wait_flag(a, want=False)
    assert a.crashed is False


def test_decoder_adapter_stop_terminates_without_crash(tmp_path):
    """stop() mirrors the reference's atexit terminate (airstrik.py:70):
    intentional shutdown terminates the process and is NOT a crash."""
    from airstrik_py_spark.sources.snapshot import DecoderAdapter

    a = DecoderAdapter([sys.executable, "-c", "import time; time.sleep(60)"],
                       str(tmp_path))
    a.start()
    assert a.proc.poll() is None  # actually running
    a.stop()
    try:
        a.proc.wait(timeout=5)
    except subprocess.TimeoutExpired:
        a.proc.kill()
        raise
    a._watch.join(timeout=2.0)
    assert a.crashed is False
    assert a.proc.poll() is not None
