"""Geodesic expression tests (SURVEY §5.5: numeric pinning W2-W4/D1)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from airstrik_py_spark.functions.geo import (
    bearing_deg,
    dest_lat_deg,
    dest_lon_deg,
    haversine_km,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_haversine_known_distance(spark):
    # RDU airport to home (~10 km scale sanity): equator degree ~111.19 km
    d = _one(
        spark,
        haversine_km(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(1.0)),
    )
    assert abs(d - 111.19) < 0.05


def test_haversine_symmetry_and_zero(spark):
    a = haversine_km(F.lit(35.7), F.lit(-78.6), F.lit(36.1), F.lit(-79.0))
    b = haversine_km(F.lit(36.1), F.lit(-79.0), F.lit(35.7), F.lit(-78.6))
    row = spark.range(1).select(a.alias("a"), b.alias("b")).first()
    assert abs(row["a"] - row["b"]) < 1e-9
    assert _one(spark, haversine_km(F.lit(35.7), F.lit(-78.6), F.lit(35.7), F.lit(-78.6))) == 0.0


def test_bearing_cardinal_directions(spark):
    north = _one(spark, bearing_deg(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)))
    east = _one(spark, bearing_deg(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(1.0)))
    south = _one(spark, bearing_deg(F.lit(1.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)))
    assert abs(north - 0.0) < 1e-9
    assert abs(east - 90.0) < 1e-6
    assert abs(south - 180.0) < 1e-9


def test_bearing_in_range(spark):
    # property: bearing always in [0, 360) over a grid of points
    df = spark.range(100).select(
        (F.col("id") % 10 * 7.0 - 35.0).alias("lat2"),
        (F.col("id") / 10 * 11.0 - 55.0).alias("lon2"),
    )
    out = df.select(
        bearing_deg(F.lit(10.0), F.lit(20.0), F.col("lat2"), F.col("lon2")).alias("b")
    ).agg(F.min("b"), F.max("b")).first()
    assert out[0] >= 0.0 and out[1] < 360.0


def test_dest_point_roundtrip(spark):
    """Forward geodesic then haversine back recovers the distance."""
    lat1, lon1, brg, dist = F.lit(35.727), F.lit(-78.696), F.lit(47.0), F.lit(42.5)
    dlat = dest_lat_deg(lat1, brg, dist)
    row = (
        spark.range(1)
        .select(dlat.alias("dlat"), dest_lon_deg(lat1, lon1, dlat, brg, dist).alias("dlon"))
        .select(haversine_km(lat1, lon1, F.col("dlat"), F.col("dlon")).alias("back"))
        .first()
    )
    assert abs(row["back"] - 42.5) < 1e-6


def test_haversine_vs_python_reference(spark):
    """Pin the formula against an independent Python implementation."""
    def py_hav(lat1, lon1, lat2, lon2):
        r = 6371.0088
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dp = math.radians(lat2 - lat1) / 2
        dl = math.radians(lon2 - lon1) / 2
        a = math.sin(dp) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
        return 2 * r * math.asin(math.sqrt(a))

    cases = [(35.727, -78.696, 35.9, -78.5), (0.0, 0.0, -45.0, 60.0), (89.0, 0.0, 89.0, 179.0)]
    for lat1, lon1, lat2, lon2 in cases:
        got = _one(
            spark, haversine_km(F.lit(lat1), F.lit(lon1), F.lit(lat2), F.lit(lon2))
        )
        assert abs(got - py_hav(lat1, lon1, lat2, lon2)) < 1e-9
