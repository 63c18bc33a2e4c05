"""Sessionization core — SURVEY.md §2.5 W5, §2.2 F3, §2.4 A2/A3/A4, §2.3 J1/J2.

The reference's "trip" is a maximal run of packets per aircraft with
inter-packet gap <= `remember`; closure emits one assembled trip document
(airstrik.py:473-627).  Batch form: gap-detect via lag + running sum — ONE
shuffle on the key, shared by every downstream aggregate (Catalyst reuses the
hash partitioning).  Streaming form: F.session_window (streaming/pipeline.py).

At 100 TB: partitionBy(hex) is the natural key distribution (millions of
aircraft × small per-key history); no skew expected on ICAO24 keys, AQE
handles stragglers.  Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airstrik_py_spark.config import EngineConfig
from airstrik_py_spark.operators.kinematics import key_window
from airstrik_py_spark.sources.tables import icao_dim


def with_session_id(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """W5 — assign a per-key session id: new session when the gap to the
    previous observation exceeds `remember` (airstrik.py:482, 551)."""
    w = key_window()
    gap = F.col("ts_sec") - F.lag("ts_sec").over(w)
    is_new = F.when(gap.isNull() | (gap > F.lit(cfg.remember_s)), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def _first_nonnull(value, ts_sec=None, event_id=None):
    """Earliest non-null `value` by (ts_sec, event_id): min over a struct
    whose leading fields are the ordering — NULL rows drop out of min."""
    ts_sec = F.col("ts_sec") if ts_sec is None else ts_sec
    event_id = F.col("event_id") if event_id is None else event_id
    return F.min(
        F.when(value.isNotNull(), F.struct(ts_sec.alias("t"), event_id.alias("e"), value.alias("v")))
    ).getField("v")


def _last_nonnull_before(value, cutoff_sec):
    """J2 as-of: latest non-null `value` with ts_sec <= cutoff (the state "as
    of" the time of closest approach, airstrik.py:498-521)."""
    cond = value.isNotNull() & (F.col("ts_sec") <= cutoff_sec)
    return F.max(
        F.when(
            cond,
            F.struct(
                F.col("ts_sec").alias("t"), F.col("event_id").alias("e"), value.alias("v")
            ),
        )
    ).getField("v")


def trips(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """A3 — fold each session into one trip row (airstrik.py:498-543):
    bounds + A2 argmin-closest + A4 first callsign.  `df` needs `distance`
    (W4) and `session_id` (W5).  Single groupBy — map-side partial aggs."""
    clean_flight = F.regexp_replace("flight", " ", "")
    closest = F.min(
        F.struct(
            F.col("distance").alias("d"),
            F.col("ts_sec").alias("t"),
            F.col("event_id").alias("e"),
        )
    )
    return (
        df.groupBy(F.col("hex").alias("flight_id"), "session_id")
        .agg(
            F.min("ts_sec").alias("start_sec"),
            F.max("ts_sec").alias("end_sec"),
            F.count("*").alias("n_obs"),
            _first_nonnull(clean_flight).alias("callsign"),
            closest.getField("d").alias("closest_dist"),
            closest.getField("t").alias("closest_sec"),
            F.max(
                F.when(
                    (F.col("distance") <= F.lit(cfg.most_generous_dist_km))
                    & (
                        F.col("alt_geom").isNull()
                        | (F.col("alt_geom") <= F.lit(cfg.most_generous_alt_m))
                    ),
                    True,
                ).otherwise(False)
            ).alias("alarmed"),
        )
    )


def trips_with_asof(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """A3 + J2 in ONE shuffle: a session-scoped window computes the
    closest-approach cutoff per row, then a single groupBy folds the trip
    AND the as-of state conditioned on that cutoff.

    Scale note: the hex hash-exchange introduced by with_session_id's window
    satisfies the (hex, session_id) window and groupBy distributions too
    (partitioning on a subset of the clustering keys), so Catalyst inserts
    no further exchange — verified via .explain: one Exchange for the whole
    sessionize->argmin->asof->fold chain."""
    session_w = Window.partitionBy("hex", "session_id")
    closest_here = F.min(
        F.struct(
            F.col("distance").alias("d"),
            F.col("ts_sec").alias("t"),
            F.col("event_id").alias("e"),
        )
    ).over(session_w)
    with_cutoff = df.withColumn("closest_sec", closest_here.getField("t"))

    clean_flight = F.regexp_replace("flight", " ", "")
    closest = F.min(
        F.struct(
            F.col("distance").alias("d"),
            F.col("ts_sec").alias("t"),
            F.col("event_id").alias("e"),
        )
    )
    return (
        with_cutoff.groupBy(F.col("hex").alias("flight_id"), "session_id")
        .agg(
            F.min("ts_sec").alias("start_sec"),
            F.max("ts_sec").alias("end_sec"),
            F.count("*").alias("n_obs"),
            _first_nonnull(clean_flight).alias("callsign"),
            closest.getField("d").alias("closest_dist"),
            closest.getField("t").alias("closest_sec"),
            F.max(
                F.when(
                    (F.col("distance") <= F.lit(cfg.most_generous_dist_km))
                    & (
                        F.col("alt_geom").isNull()
                        | (F.col("alt_geom") <= F.lit(cfg.most_generous_alt_m))
                    ),
                    True,
                ).otherwise(False)
            ).alias("alarmed"),
            _last_nonnull_before(F.col("lat"), F.col("closest_sec")).alias("asof_lat"),
            _last_nonnull_before(F.col("lon"), F.col("closest_sec")).alias("asof_lon"),
            _last_nonnull_before(F.col("alt_geom"), F.col("closest_sec")).alias(
                "asof_alt"
            ),
            _last_nonnull_before(F.col("flight"), F.col("closest_sec")).alias(
                "asof_flight"
            ),
        )
    )


def filter_min_trip_length(trips_df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """F3 — drop sessions observed for less than min_trip_length seconds
    (airstrik.py:487-490)."""
    return trips_df.filter(
        (F.col("end_sec") - F.col("start_sec")) >= F.lit(cfg.min_trip_length_s)
    )


def enrich_icao(trips_df: DataFrame, spark, sf_dir: str) -> DataFrame:
    """J1 — broadcast left join against the static icao dim; predicted names
    get the ' (p)' suffix (airstrik.py:510-519)."""
    dim = icao_dim(spark, sf_dir)
    keyed = trips_df.withColumn(
        "icao_key", (F.col("flight_id").cast("int") % 25)
    )
    return (
        keyed.join(F.broadcast(dim), "icao_key", "left")
        .withColumn(
            "trip_name",
            F.coalesce(F.col("callsign"), F.concat(F.col("icao_name"), F.lit(" (p)"))),
        )
        .drop("icao_key", "icao_name")
    )
