"""SURVEY §5.5 numeric pinning: the Catalyst geodesic expressions agree with
an independent vectorized numpy implementation over the fixture coordinate
ranges."""

from __future__ import annotations

from pyspark.sql import functions as F

from airstrik_py_spark.functions.geo import bearing_deg, haversine_km
from airstrik_py_spark.functions.geo_udf import (
    GEOPY_AVAILABLE,
    bearing_deg_udf,
    haversine_km_udf,
)


def _grid(spark):
    # the fixture envelope: ±0.5° around HOME plus far-field points
    return spark.range(400).select(
        (F.lit(35.727) + (F.col("id") % 20 - 10.0) / 20.0).alias("lat1"),
        (F.lit(-78.696) + (F.col("id") % 17 - 8.0) / 17.0).alias("lon1"),
        (F.lit(35.727) + (F.col("id") % 13 - 6.0) / 6.5).alias("lat2"),
        (F.lit(-78.696) + (F.col("id") % 11 - 5.0) / 5.5).alias("lon2"),
    )


def test_haversine_expression_vs_numpy_udf(spark):
    df = _grid(spark).select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("expr"),
        haversine_km_udf("lat1", "lon1", "lat2", "lon2").alias("udf"),
    )
    worst = df.select(F.max(F.abs(F.col("expr") - F.col("udf"))).alias("d")).first()["d"]
    assert worst < 1e-9  # same formula, independent implementations


def test_bearing_expression_vs_numpy_udf(spark):
    df = _grid(spark).select(
        bearing_deg(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("expr"),
        bearing_deg_udf("lat1", "lon1", "lat2", "lon2").alias("udf"),
    )
    worst = df.select(F.max(F.abs(F.col("expr") - F.col("udf"))).alias("d")).first()["d"]
    assert worst < 1e-9


def test_geopy_fallback_guarded():
    from airstrik_py_spark.functions.geo_udf import geodesic_km_udf

    if not GEOPY_AVAILABLE:
        import pytest

        with pytest.raises(NotImplementedError, match="geopy not installed"):
            geodesic_km_udf()
