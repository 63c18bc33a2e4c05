"""Daily rollup + REPL-style aggregates — SURVEY.md §2.4 A1, A6, A7.

The reference maintains day counters incrementally in Python lists and
flushes one Mongo doc at day rollover (airstrik.py:536-541, 659-691).  Here
the whole rollup is one groupBy over the trips table — map-side partial
aggregation, one shuffle on the (tiny-cardinality) day key.  countDistinct
is exact as the reference's membership lists; at 100 TB swap in
approx_count_distinct (documented, not default, to keep t2 exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airstrik_py_spark.config import EngineConfig

SECONDS_PER_DAY = 86400.0


def day_str(sec_col, cfg: EngineConfig):
    """Local calendar day of an epoch-seconds column under the configured
    fixed offset (airstrik.py:663-664) — tz-library-free so the DuckDB
    oracle is arithmetic-identical: floor-div epoch days since 1970."""
    day_index = F.floor(
        (sec_col + F.lit(cfg.utc_time_offset_h * 3600.0)) / F.lit(SECONDS_PER_DAY)
    )
    return F.date_format(
        F.date_add(F.lit("1970-01-01").cast("date"), day_index.cast("int")),
        "yyyy-MM-dd",
    )


def daily_stats(trips_df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """A1 — per local day of trip close: unique_planes, total_trips,
    unique_alarm_planes, total_alarm_trips (airstrik.py:668-691).

    Shape (r15): explicit two-level aggregation instead of two
    countDistincts in one groupBy.  The multi-distinct form planned an
    Expand that tripled every trip row before the first exchange (gid=1
    for flight_id, gid=2 for the alarmed projection, gid=0 for the plain
    counts — plans/r15/agg_daily_stats_before.txt); the (day, flight_id)
    partial level shuffles each row once, needs NO new exchange when the
    input is already hash-partitioned by flight_id (the sessionize chain
    is), and the day level then aggregates one row per (day, plane).
    Values are identical: counts/sums are exact, and count(flight_id)
    over the per-plane level reproduces countDistinct's null handling
    (null planes counted in totals, never in uniques)."""
    per_plane = (
        trips_df.withColumn("day", day_str(F.col("end_sec"), cfg))
        .groupBy("day", "flight_id")
        .agg(
            F.count("*").alias("_n_trips"),
            F.sum(F.when(F.col("alarmed"), 1).otherwise(0)).alias("_n_alarm"),
        )
    )
    return per_plane.groupBy("day").agg(
        F.count("flight_id").alias("unique_planes"),
        F.sum("_n_trips").alias("total_trips"),
        F.count(F.when(F.col("_n_alarm") > 0, F.col("flight_id"))).alias(
            "unique_alarm_planes"
        ),
        F.sum("_n_alarm").alias("total_alarm_trips"),
    )


def trip_counts_per_plane(trips_df: DataFrame, obs_df: DataFrame) -> DataFrame:
    """A6 — REPL list view: trips per plane + message counts per attribute
    (dbread.py:42-57: len(history) per attribute)."""
    per_trip = trips_df.groupBy("flight_id").agg(
        F.count("*").alias("n_trips"), F.sum("n_obs").alias("n_obs")
    )
    per_attr = obs_df.groupBy(F.col("hex").alias("flight_id")).agg(
        F.count("lat").alias("n_lat_msgs"),
        F.count("flight").alias("n_flight_msgs"),
        F.count("nav_heading").alias("n_heading_msgs"),
    )
    return per_trip.join(per_attr, "flight_id")


def live_plane_count(obs_df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """A7 — count of currently-tracked non-empty planes at the latest
    snapshot (print_log_mode, airstrik.py:168-186, 457-470)."""
    w = Window.partitionBy("hex").orderBy(F.col("ts_sec").desc(), F.col("event_id").desc())
    latest = obs_df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1")
    return latest.filter(
        (F.col("seen") < F.lit(cfg.remember_s)) & F.col("lat").isNotNull()
    ).agg(F.count("*").alias("n_live"))
