"""Day-boundary semantics for the stats rollup: the reference buckets by
wall-clock day at a fixed UTC-4 offset (airstrik.py:663-664, 668)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airstrik_py_spark.config import EngineConfig
from airstrik_py_spark.operators.stats import day_str

CFG = EngineConfig()  # utc_time_offset_h = -4


def _day_of(spark, iso_utc: str) -> str:
    sec = F.unix_timestamp(F.lit(iso_utc), "yyyy-MM-dd HH:mm:ss").cast("double")
    return spark.range(1).select(day_str(sec, CFG).alias("d")).first()["d"]


def test_day_boundary_at_utc_minus_4(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # 03:59 UTC is 23:59 local(-4) -> previous local day
    assert _day_of(spark, "2024-01-15 03:59:59") == "2024-01-14"
    # 04:00 UTC is exactly local midnight -> new local day
    assert _day_of(spark, "2024-01-15 04:00:00") == "2024-01-15"
    # mid-afternoon stays put
    assert _day_of(spark, "2024-01-15 18:30:00") == "2024-01-15"


def test_day_str_offset_zero(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cfg0 = EngineConfig(utc_time_offset_h=0)
    sec = F.unix_timestamp(
        F.lit("2024-01-15 00:00:00"), "yyyy-MM-dd HH:mm:ss"
    ).cast("double")
    got = spark.range(1).select(day_str(sec, cfg0).alias("d")).first()["d"]
    assert got == "2024-01-15"
