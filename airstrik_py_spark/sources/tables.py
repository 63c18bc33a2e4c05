"""Testdata parquet readers + the events -> observations adapter.

The driver fixtures are TPC-H-ish (TESTDATA.md); the reference's input is an
ADS-B observation stream (SURVEY.md §1.1, airstrik.py:189-208,481).  The
adapter below maps the `events` table onto the OBSERVATION schema with a
deterministic, SQL-expressible transform so every SURVEY §2 operator runs on
driver data and has an exact DuckDB oracle (mirror: oracle/exprs.py OBS_CTE).

Mapping (events -> observations):
  hex         = CAST(user_id AS STRING)          -- the per-aircraft key
  ts / ts_sec = ts / epoch seconds (double)      -- snapshot `now`
  flight      = event_type unless 'view'         -- callsign, NULL sometimes
                                                    (exercises J1 enrichment)
  lat         = 35.727 + (value % 100 - 50)/100  -- within ±0.5° of HOME
  lon         = -78.696 + (value*7 % 100 - 50)/100
  nav_heading = value % 360
  alt_geom    = value * 10                       -- 0..~2000 m
  seen        = value % 120                      -- 0..120 s staleness analog
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Fixture timestamp columns, normalized to TIMESTAMP (with-tz, UTC session)
# whatever physical form the driver generated:
#   * TIMESTAMP(NANOS)  -> read as long (nanosAsLong) and floor-truncate to
#     micros — bit-identical to DuckDB's TIMESTAMP_NS read (round-1 fixtures);
#   * TIMESTAMP(MICROS, isAdjustedToUTC=false) -> Spark infers TIMESTAMP_NTZ;
#     the wall clock IS the UTC instant (DuckDB reads it naive and epoch_us
#     treats it as UTC), so a cast under the pinned UTC session timezone is
#     exact (round-2 fixtures).
_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in _TS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flattened observation stream (SURVEY §1.1 OBSERVATION schema) derived
    from the events table.  Column pruning/pushdown reach the parquet scan —
    this is a pure projection."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").cast("string").alias("hex"),
        F.col("ts"),
        F.col("ts").cast("double").alias("ts_sec"),
        F.when(F.col("event_type") != "view", F.col("event_type")).alias("flight"),
        (F.lit(35.727) + (F.col("value") % 100.0 - 50.0) / 100.0).alias("lat"),
        (F.lit(-78.696) + ((F.col("value") * 7.0) % 100.0 - 50.0) / 100.0).alias("lon"),
        (F.col("value") % 360.0).alias("nav_heading"),
        (F.col("value") * 10.0).alias("alt_geom"),
        (F.col("value") % 120.0).alias("seen"),
        F.col("event_id"),
    )


def icao_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static enrichment lookup (SURVEY §1.5, airstrik.py:510-519): the
    `icao.json` hex -> registered-name analog, derived from `nation` keyed by
    user_id % 25.  Small dim — always broadcast-joined."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        F.col("n_nationkey").alias("icao_key"),
        F.col("n_name").alias("icao_name"),
    )
