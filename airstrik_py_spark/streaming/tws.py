"""Spark 4-native stateful tracker: the same per-plane bookkeeping as
streaming/stateful.py (consecutive-dedup + decimation counter + sticky alarm
flag) on the transformWithStateInPandas API — applyInPandasWithState's
successor with typed state handles (ValueState) and first-class timers.

Both implementations ship: applyInPandasWithState for portability to Spark
3.4+ clusters, this one as the forward path.  Tests assert they produce
identical output on the same tape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from airstrik_py_spark.config import EngineConfig
from airstrik_py_spark.streaming.stateful import OUT_SCHEMA

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_lat", T.DoubleType()),
        T.StructField("last_lon", T.DoubleType()),
        T.StructField("last_alt", T.DoubleType()),
        T.StructField("update_count", T.IntegerType()),
        T.StructField("n_lat", T.IntegerType()),
        T.StructField("n_lon", T.IntegerType()),
        T.StructField("alarm_triggered", T.BooleanType()),
    ]
)


class PlaneTracker(StatefulProcessor):
    """Keyed tracker with O(1) ValueState per plane.  Sticky-alarm and
    decimation-phase semantics mirror streaming/stateful.py::make_tracker
    (airstrik.py:272-277 strict-< + alt ceiling + >=2-fix sim gate;
    airstrik.py:584-626 write phase)."""

    def __init__(self, cfg: EngineConfig):
        self.n = int(cfg.decimation_factor)
        self.force_new = cfg.decimation_force_new_data
        self.zone_km = cfg.most_generous_dist_km
        self.alt_max = cfg.most_generous_alt_m
        self.first_write = 3 if self.force_new else 2

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.track = handle.getValueState("track", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        if self.track.exists():
            last_lat, last_lon, last_alt, count, n_lat, n_lon, sticky = (
                self.track.get()
            )
        else:
            last_lat, last_lon, last_alt, count, n_lat, n_lon, sticky = (
                None, None, None, 0, 0, 0, False,
            )
        out = []
        for pdf in rows:
            pdf = pdf.sort_values("ts_sec")
            for row in pdf.itertuples(index=False):
                # mirror streaming/stateful.py exactly: per-attribute history
                # counts feed the sim gate, and the sticky alarm evaluates on
                # every packet BEFORE dup suppression
                has_lat = row.lat is not None and not pd.isna(row.lat)
                has_lon = row.lon is not None and not pd.isna(row.lon)
                if has_lat and (n_lat == 0 or row.lat != last_lat):
                    n_lat += 1
                if has_lon and (n_lon == 0 or row.lon != last_lon):
                    n_lon += 1
                changed = (
                    last_lat is None
                    or last_lon is None
                    or row.lat != last_lat
                    or row.lon != last_lon
                )
                alt = getattr(row, "alt_geom", None)
                if alt is not None and not pd.isna(alt):
                    last_alt = float(alt)
                if (
                    min(n_lat, n_lon) >= 2
                    and row.distance is not None
                    and row.distance < self.zone_km
                    and (last_alt is None or last_alt <= self.alt_max)
                ):
                    sticky = True
                if has_lat:
                    last_lat = row.lat
                if has_lon:
                    last_lon = row.lon
                if self.force_new and not changed:
                    continue
                count += 1
                emit = (
                    self.n > 0
                    and count >= self.first_write
                    and (count - self.first_write) % self.n == 0
                )
                out.append(
                    (key[0], row.ts_sec, row.lat, row.lon, count, emit, sticky)
                )
        self.track.update((last_lat, last_lon, last_alt, count, n_lat, n_lon, sticky))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in OUT_SCHEMA.fields])

    def close(self) -> None:
        pass


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


# Pure-Python google.protobuf runtimes that public SDK installs bundle
# (Google Cloud SDK's App Engine platform dir is the common one).  Probed
# only when `google.protobuf` isn't pip-installed; appended to the path
# (never prepended) so nothing in the bundle can shadow site-packages.
_VENDORED_PROTOBUF_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def tws_available() -> bool:
    """transformWithState's state protocol needs google.protobuf, which is
    not pip-installed in every image — the applyInPandasWithState
    implementation in streaming/stateful.py is the portable fallback.

    When the package is missing, fall back to a bundled pure-Python
    runtime from _VENDORED_PROTOBUF_DIRS: extend sys.path for this
    process AND os.environ['PYTHONPATH'] for the JVM-spawned streaming
    Python workers (effective only if the SparkSession's JVM has not
    launched yet — call this before building the session, as the
    test-skip gate does at collection time).  pyspark 4.1.2's
    StateMessage_pb2 gencode can be one protobuf MINOR version ahead of
    the bundled runtime; minor skew is wire-compatible, and protobuf's
    own documented escape hatch
    (TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK) exists for exactly this
    window, so set it only on the fallback path."""
    import importlib
    import os
    import sys

    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    for d in _VENDORED_PROTOBUF_DIRS:
        if not os.path.isfile(os.path.join(d, "google", "protobuf", "descriptor.py")):
            continue
        if d not in sys.path:
            sys.path.append(d)
        env_pp = os.environ.get("PYTHONPATH", "")
        if d not in env_pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (env_pp + os.pathsep + d) if env_pp else d
        os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        importlib.invalidate_caches()
        try:
            from google.protobuf import descriptor  # noqa: F401

            return True
        except ImportError:
            continue
    return False


def tracked_stream_tws(obs_with_distance: DataFrame, cfg: EngineConfig) -> DataFrame:
    # transformWithState requires the RocksDB state store (also the right
    # choice at scale: spill-to-disk state, incremental checkpoints)
    obs_with_distance.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    return (
        obs_with_distance.select("hex", "ts_sec", "lat", "lon", "alt_geom", "distance")
        .groupBy("hex")
        .transformWithStateInPandas(
            statefulProcessor=PlaneTracker(cfg),
            outputStructType=OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
