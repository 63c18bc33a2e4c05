from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("airstrik-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def obs_rows(spark, rows):
    """Build an observation DataFrame from (hex, ts_sec, flight, lat, lon,
    nav_heading, alt_geom, seen) tuples."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(h, float(t), fl, la, lo, nh, ag, float(sn)) for h, t, fl, la, lo, nh, ag, sn in rows],
        "hex string, ts_sec double, flight string, lat double, lon double, "
        "nav_heading double, alt_geom double, seen double",
    )
    return df.withColumn("ts", F.timestamp_seconds("ts_sec")).withColumn(
        "event_id", F.monotonically_increasing_id()
    )
