"""DuckDB-dialect SQL mirrors of the engine's shared expressions.

Every string here is kept operation-for-operation identical to the Spark
Column implementations (functions/geo.py, sources/tables.py) so the driver's
t2 value-hash comparison is formula-exact; outputs are rounded on both sides
before hashing to absorb last-ulp libm differences.
"""

from __future__ import annotations

EARTH_RADIUS_KM = 6371.0088

# Mirror of sources/tables.py::observations (events -> OBSERVATION schema).
OBS_CTE = """
obs AS (
  SELECT CAST(user_id AS VARCHAR) AS hex,
         ts,
         epoch(ts) AS ts_sec,
         CASE WHEN event_type <> 'view' THEN event_type END AS flight,
         35.727 + (fmod(value, 100.0) - 50.0) / 100.0 AS lat,
         -78.696 + (fmod(value * 7.0, 100.0) - 50.0) / 100.0 AS lon,
         fmod(value, 360.0) AS nav_heading,
         value * 10.0 AS alt_geom,
         fmod(value, 120.0) AS seen,
         event_id
  FROM events
)
"""


def duck_haversine(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Mirror of functions/geo.py::haversine_km."""
    return (
        f"(2.0 * {EARTH_RADIUS_KM}) * asin(sqrt("
        f"sin(radians(({lat2}) - ({lat1})) / 2.0) * sin(radians(({lat2}) - ({lat1})) / 2.0)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians(({lon2}) - ({lon1})) / 2.0) * sin(radians(({lon2}) - ({lon1})) / 2.0)"
        f"))"
    )


def duck_bearing(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Mirror of functions/geo.py::bearing_deg (incl. the +360 pre-add,
    airstrik.py:164)."""
    return (
        f"fmod(degrees(atan2("
        f"sin(radians(({lon2}) - ({lon1}))) * cos(radians({lat2})), "
        f"cos(radians({lat1})) * sin(radians({lat2}))"
        f" - sin(radians({lat1})) * cos(radians({lat2})) * cos(radians(({lon2}) - ({lon1})))"
        f")) + 360.0, 360.0)"
    )


def duck_dest_lat(lat1: str, brg_deg: str, dist_km: str) -> str:
    """Mirror of functions/geo.py::dest_lat_deg."""
    return (
        f"degrees(asin("
        f"sin(radians({lat1})) * cos(({dist_km}) / {EARTH_RADIUS_KM})"
        f" + cos(radians({lat1})) * sin(({dist_km}) / {EARTH_RADIUS_KM}) * cos(radians({brg_deg}))"
        f"))"
    )


def duck_dest_lon(lat1: str, lon1: str, lat2_deg: str, brg_deg: str, dist_km: str) -> str:
    """Mirror of functions/geo.py::dest_lon_deg."""
    return (
        f"({lon1}) + degrees(atan2("
        f"sin(radians({brg_deg})) * sin(({dist_km}) / {EARTH_RADIUS_KM}) * cos(radians({lat1})), "
        f"cos(({dist_km}) / {EARTH_RADIUS_KM}) - sin(radians({lat1})) * sin(radians({lat2_deg}))"
        f"))"
    )
