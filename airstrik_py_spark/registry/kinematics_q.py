"""t2 queries for SURVEY §2 slugs: S1 ingest, F1 liveness, F5 nonempty,
W1 dedup, W2 heading, W3 speed, W4 distance, W7 top-k, W8 latest, A5 config
extremes.  Each Spark callable has a DuckDB oracle built from the shared
mirrors in oracle/exprs.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airstrik_py_spark.config import REFERENCE, TESTDATA
from airstrik_py_spark.operators import kinematics as K
from airstrik_py_spark.oracle.exprs import OBS_CTE, duck_bearing, duck_haversine
from airstrik_py_spark.session import pin_session
from airstrik_py_spark.sources.tables import observations

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

_WIN = "PARTITION BY hex ORDER BY ts_sec, event_id"


def _ts_str() -> F.Column:
    return F.date_format("ts", TS_FMT_SPARK).alias("ts_str")


def q_source_snapshot_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — snapshot flatten to observation rows (airstrik.py:189-208, 481)."""
    pin_session(spark)
    return observations(spark, sf_dir).select(
        "hex",
        _ts_str(),
        "flight",
        F.round("lat", 6).alias("lat"),
        F.round("lon", 6).alias("lon"),
        F.round("nav_heading", 6).alias("nav_heading"),
        F.round("alt_geom", 6).alias("alt_geom"),
        F.round("seen", 6).alias("seen"),
        "event_id",
    )


def q_filter_liveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — keep aircraft with seen < remember (airstrik.py:482, 551)."""
    pin_session(spark)
    return (
        observations(spark, sf_dir)
        .filter(F.col("seen") < F.lit(REFERENCE.remember_s))
        .select("hex", _ts_str(), F.round("seen", 6).alias("seen"), "event_id")
    )


def q_filter_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — suppress keys with no attribute history yet (is_not_empty,
    airstrik.py:49-58): keys having >=1 non-null position fix."""
    pin_session(spark)
    return (
        observations(spark, sf_dir)
        .groupBy("hex")
        .agg(
            F.count("lat").alias("n_fixes"),
            F.count("flight").alias("n_callsigns"),
        )
        .filter(F.col("n_fixes") > 0)
    )


def q_window_dedup_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — drop rows whose (lat, lon) equals the previous row of the same
    key (airstrik.py:576-577)."""
    pin_session(spark)
    df = K.dedup_consecutive(observations(spark, sf_dir))
    return df.select(
        "hex", _ts_str(), F.round("lat", 6).alias("lat"), F.round("lon", 6).alias("lon")
    )


def q_window_calc_heading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — bearing between previous and current fix (airstrik.py:147-165)."""
    pin_session(spark)
    df = K.with_calc_heading(observations(spark, sf_dir))
    return df.select("hex", _ts_str(), F.round("calc_heading", 6).alias("calc_heading"))


def q_window_calc_speed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — speed km/h vs the oldest fix in the last 10 rows
    (airstrik.py:371-409)."""
    pin_session(spark)
    df = K.with_calc_speed(observations(spark, sf_dir), REFERENCE)
    return df.select("hex", _ts_str(), "calc_speed")


def q_window_distance_home(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — km from HOME, rounded 4 dp (airstrik.py:430-439)."""
    pin_session(spark)
    df = K.with_distance_home(observations(spark, sf_dir), REFERENCE)
    return df.select("hex", _ts_str(), "distance")


def q_window_latest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 — per-key current value of each attribute (history[-1][0],
    airstrik.py:233, 377)."""
    pin_session(spark)
    df = K.latest_per_key(
        observations(spark, sf_dir), ["lat", "lon", "alt_geom", "flight"]
    )
    return df.select(
        "hex",
        F.round("lat", 6).alias("lat"),
        F.round("lon", 6).alias("lon"),
        F.round("alt_geom", 6).alias("alt_geom"),
        "flight",
        F.round("ts_sec", 6).alias("ts_sec"),
    )


def q_topk_by_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 — live planes sorted by latest distance, top `print_top_planes`
    (print_planes, airstrik.py:281-315).  TakeOrderedAndProject — no global
    sort at scale."""
    pin_session(spark)
    obs = K.with_distance_home(observations(spark, sf_dir), REFERENCE)
    latest = K.latest_per_key(obs, ["distance"])
    return (
        latest.select("hex", "distance")
        .orderBy(F.col("distance").asc(), F.col("hex").asc())
        .limit(REFERENCE.print_top_planes)
    )


def q_agg_extremes_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — most generous configured geofence (airstrik.py:665-666)."""
    pin_session(spark)
    return spark.range(1).select(
        F.lit(float(TESTDATA.most_generous_dist_km)).alias("most_generous_dist"),
        F.lit(float(TESTDATA.most_generous_alt_m)).alias("most_generous_alt"),
    )


_HAV_HOME = duck_haversine(str(REFERENCE.home_lat), str(REFERENCE.home_lon), "lat", "lon")

QUERIES = {
    "source_snapshot_ingest": q_source_snapshot_ingest,
    "filter_liveness": q_filter_liveness,
    "filter_nonempty": q_filter_nonempty,
    "window_dedup_consecutive": q_window_dedup_consecutive,
    "window_calc_heading": q_window_calc_heading,
    "window_calc_speed": q_window_calc_speed,
    "window_distance_home": q_window_distance_home,
    "window_latest_value": q_window_latest_value,
    "topk_by_distance": q_topk_by_distance,
    "agg_extremes_config": q_agg_extremes_config,
}

ORACLES = {
    "source_snapshot_ingest": f"""
WITH {OBS_CTE}
SELECT hex, strftime(ts, '{TS_FMT_DUCK}') AS ts_str, flight,
       round(lat, 6) AS lat, round(lon, 6) AS lon,
       round(nav_heading, 6) AS nav_heading, round(alt_geom, 6) AS alt_geom,
       round(seen, 6) AS seen, event_id
FROM obs
""",
    "filter_liveness": f"""
WITH {OBS_CTE}
SELECT hex, strftime(ts, '{TS_FMT_DUCK}') AS ts_str, round(seen, 6) AS seen, event_id
FROM obs WHERE seen < 60.0
""",
    "filter_nonempty": f"""
WITH {OBS_CTE}
SELECT hex, count(lat) AS n_fixes, count(flight) AS n_callsigns
FROM obs GROUP BY hex HAVING count(lat) > 0
""",
    "window_dedup_consecutive": f"""
WITH {OBS_CTE},
lagged AS (
  SELECT hex, ts, lat, lon,
         lag(lat) OVER ({_WIN}) AS plat,
         lag(lon) OVER ({_WIN}) AS plon
  FROM obs)
SELECT hex, strftime(ts, '{TS_FMT_DUCK}') AS ts_str,
       round(lat, 6) AS lat, round(lon, 6) AS lon
FROM lagged
WHERE plat IS NULL OR plon IS NULL OR lat <> plat OR lon <> plon
""",
    "window_calc_heading": f"""
WITH {OBS_CTE},
lagged AS (
  SELECT hex, ts, lat, lon,
         lag(lat) OVER ({_WIN}) AS plat,
         lag(lon) OVER ({_WIN}) AS plon
  FROM obs)
SELECT hex, strftime(ts, '{TS_FMT_DUCK}') AS ts_str,
       round({duck_bearing('plat', 'plon', 'lat', 'lon')}, 6) AS calc_heading
FROM lagged
""",
    "window_calc_speed": f"""
WITH {OBS_CTE},
looked AS (
  SELECT hex, ts, lat, lon, ts_sec,
         first_value(lat) OVER w AS olat,
         first_value(lon) OVER w AS olon,
         first_value(ts_sec) OVER w AS ots
  FROM obs
  WINDOW w AS ({_WIN} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
SELECT hex, strftime(ts, '{TS_FMT_DUCK}') AS ts_str,
       round(CASE WHEN ts_sec - ots > 0.0
             THEN {duck_haversine('olat', 'olon', 'lat', 'lon')} * 1000.0 / (ts_sec - ots) * 3.6
             END, 4) AS calc_speed
FROM looked
""",
    "window_distance_home": f"""
WITH {OBS_CTE}
SELECT hex, strftime(ts, '{TS_FMT_DUCK}') AS ts_str,
       round({_HAV_HOME}, 4) AS distance
FROM obs
""",
    "window_latest_value": f"""
WITH {OBS_CTE}
SELECT hex, round(lat, 6) AS lat, round(lon, 6) AS lon,
       round(alt_geom, 6) AS alt_geom, flight, round(ts_sec, 6) AS ts_sec
FROM obs
QUALIFY row_number() OVER (PARTITION BY hex ORDER BY ts_sec DESC, event_id DESC) = 1
""",
    "topk_by_distance": f"""
WITH {OBS_CTE},
with_dist AS (
  SELECT hex, ts_sec, event_id, round({_HAV_HOME}, 4) AS distance
  FROM obs),
latest AS (
  SELECT hex, distance
  FROM with_dist
  QUALIFY row_number() OVER (PARTITION BY hex ORDER BY ts_sec DESC, event_id DESC) = 1)
SELECT hex, distance FROM latest ORDER BY distance ASC, hex ASC LIMIT 25
""",
    "agg_extremes_config": """
SELECT CAST(10.0 AS DOUBLE) AS most_generous_dist,
       CAST(1000.0 AS DOUBLE) AS most_generous_alt
""",
}
