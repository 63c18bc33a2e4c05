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


_WIN = "PARTITION BY hex ORDER BY ts_sec, event_id"


def session_ctes(remember_s: float, home_lat: float = 35.727, home_lon: float = -78.696) -> str:
    """obs -> obsd (distance-home) -> sess (session ids) -> trips (A3 fold).
    Mirrors operators/kinematics.py::with_distance_home +
    operators/sessions.py::{with_session_id, trips}."""
    hav = duck_haversine(str(home_lat), str(home_lon), "lat", "lon")
    return f"""{OBS_CTE},
obsd AS (
  SELECT *, round({hav}, 4) AS distance FROM obs
),
gapped AS (
  SELECT *, CASE WHEN lag(ts_sec) OVER ({_WIN}) IS NULL
                   OR ts_sec - lag(ts_sec) OVER ({_WIN}) > {remember_s}
                 THEN 1 ELSE 0 END AS is_new
  FROM obsd
),
sess AS (
  SELECT *, sum(is_new) OVER ({_WIN} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gapped
),
trips AS (
  SELECT hex AS flight_id, session_id,
         min(ts_sec) AS start_sec,
         max(ts_sec) AS end_sec,
         count(*) AS n_obs,
         (min(CASE WHEN flight IS NOT NULL
              THEN struct_pack(t := ts_sec, e := event_id, v := replace(flight, ' ', '')) END)).v AS callsign,
         (min(struct_pack(d := distance, t := ts_sec, e := event_id))).d AS closest_dist,
         (min(struct_pack(d := distance, t := ts_sec, e := event_id))).t AS closest_sec,
         max(CASE WHEN distance <= 10.0 AND (alt_geom IS NULL OR alt_geom <= 1000.0)
                  THEN TRUE ELSE FALSE END) AS alarmed
  FROM sess GROUP BY hex, session_id
)"""


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
