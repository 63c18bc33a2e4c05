"""Quantify the spherical-haversine vs WGS-84-geodesic divergence on the
ACTUAL fixture geometry, per query family (VERDICT r10 #7) — output is the
FLOATS.md table that retires/quantifies the W3/W4/D1 exactness caveat.

Usage: python tools/geo_divergence.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from airstrik_py_spark.functions.geodesic import (  # noqa: E402
    karney_direct,
    karney_inverse_km,
)

EARTH_RADIUS_KM = 6371.0088  # must match functions/geo.py
HOME = (35.727, -78.696)


def sphere_dest(lat1, lon1, brg_deg, dist_km):
    """Scalar mirror of functions/geo.py dest_lat_deg/dest_lon_deg (the D1
    spherical forward-geodesic Column expressions)."""
    rlat1 = math.radians(lat1)
    ang = dist_km / EARTH_RADIUS_KM
    brg = math.radians(brg_deg)
    lat2 = math.degrees(
        math.asin(
            math.sin(rlat1) * math.cos(ang)
            + math.cos(rlat1) * math.sin(ang) * math.cos(brg)
        )
    )
    lon2 = lon1 + math.degrees(
        math.atan2(
            math.sin(brg) * math.sin(ang) * math.cos(rlat1),
            math.cos(ang) - math.sin(rlat1) * math.sin(math.radians(lat2)),
        )
    )
    return lat2, lon2


def hav_km(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1) / 2
    dl = math.radians(lon2 - lon1) / 2
    a = math.sin(dp) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def stats(pairs):
    max_abs = max_rel = 0.0
    sum_abs = sum_rel = 0.0
    n = 0
    for lat1, lon1, lat2, lon2 in pairs:
        g = karney_inverse_km(lat1, lon1, lat2, lon2)
        if g < 1e-9:
            continue
        h = hav_km(lat1, lon1, lat2, lon2)
        d = abs(h - g)
        max_abs = max(max_abs, d)
        max_rel = max(max_rel, d / g)
        sum_abs += d
        sum_rel += d / g
        n += 1
    return n, max_abs, sum_abs / n, max_rel, sum_rel / n


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    d = duckdb.connect()
    obs = f"""
      SELECT user_id,
             epoch(ts) AS ts_sec,
             35.727 + (value % 100.0 - 50.0) / 100.0 AS lat,
             -78.696 + ((value * 7.0) % 100.0 - 50.0) / 100.0 AS lon
      FROM read_parquet('{sf}/events.parquet')
    """
    home_rows = d.execute(
        f"SELECT lat, lon FROM ({obs}) USING SAMPLE reservoir(4000 ROWS) REPEATABLE (7)"
    ).fetchall()
    home_pairs = [(la, lo, *HOME) for la, lo in home_rows]
    consec = d.execute(f"""
      WITH o AS ({obs}),
      w AS (SELECT lat, lon,
                   lag(lat) OVER (PARTITION BY user_id ORDER BY ts_sec) AS plat,
                   lag(lon) OVER (PARTITION BY user_id ORDER BY ts_sec) AS plon
            FROM o)
      SELECT plat, plon, lat, lon FROM w WHERE plat IS NOT NULL
      USING SAMPLE reservoir(4000 ROWS) REPEATABLE (7)
    """).fetchall()
    for name, pairs in (
        ("W4/D1 distance-home (obs -> home)", home_pairs),
        ("W3 speed (consecutive obs pairs)", consec),
    ):
        n, ma, aa, mr, ar = stats(pairs)
        print(
            f"| {name} | {n} | {ma * 1000:.1f} m | {aa * 1000:.1f} m "
            f"| {mr * 100:.4f}% | {ar * 100:.4f}% |"
        )

    # D1 FORWARD (direct-problem) divergence, VERDICT r11 #5: the engine's
    # dead-reckoning step is sphere_dest + haversine-to-home; the
    # reference's is geopy destination (= Karney direct) + geodesic-to-home.
    # Measure both the step-position offset and the end-to-end zone-distance
    # delta over fixture-derived (position, heading, speed) states at the
    # horizon's near/mid/far steps.
    fwd = d.execute(f"""
      WITH o AS ({obs}),
      w AS (SELECT lat, lon, ts_sec,
                   lag(lat) OVER (PARTITION BY user_id ORDER BY ts_sec) AS plat,
                   lag(lon) OVER (PARTITION BY user_id ORDER BY ts_sec) AS plon,
                   lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec) AS pts
            FROM o)
      SELECT plat, plon, lat, lon, ts_sec - pts AS dt
      FROM w WHERE plat IS NOT NULL AND ts_sec > pts
      USING SAMPLE reservoir(2000 ROWS) REPEATABLE (7)
    """).fetchall()
    max_pos = {1: 0.0, 30: 0.0, 59: 0.0}
    sum_pos = {1: 0.0, 30: 0.0, 59: 0.0}
    max_zone = 0.0
    n_fwd = 0
    for plat, plon, lat, lon, dt in fwd:
        # heading/speed exactly as W2/W3 derive them for D1
        y = math.sin(math.radians(lon - plon)) * math.cos(math.radians(lat))
        x = math.cos(math.radians(plat)) * math.sin(math.radians(lat)) - math.sin(
            math.radians(plat)
        ) * math.cos(math.radians(lat)) * math.cos(math.radians(lon - plon))
        brg = (math.degrees(math.atan2(y, x)) + 360.0) % 360.0
        speed_kmh = hav_km(plat, plon, lat, lon) / dt * 3600.0
        if not 10.0 < speed_kmh < 1200.0:
            continue
        n_fwd += 1
        for t in (1, 30, 59):
            step = speed_kmh / 3600.0 * t
            s_lat, s_lon = sphere_dest(lat, lon, brg, step)
            e_lat, e_lon = karney_direct(lat, lon, brg, step)
            off = karney_inverse_km(s_lat, s_lon, e_lat, e_lon)
            max_pos[t] = max(max_pos[t], off)
            sum_pos[t] += off
            if t == 59:
                zone_sph = hav_km(*HOME, s_lat, s_lon)
                zone_ell = karney_inverse_km(*HOME, e_lat, e_lon)
                max_zone = max(max_zone, abs(zone_sph - zone_ell))
    print()
    if n_fwd == 0:
        print("| D1 forward: no fixture transitions inside the 10-1200 km/h "
              "speed gate — section skipped | 0 | - | - | - | - |")
        return
    for t in (1, 30, 59):
        print(
            f"| D1 forward step t={t}s (sphere_dest vs karney_direct) "
            f"| {n_fwd} | {max_pos[t] * 1000:.2f} m "
            f"| {sum_pos[t] / n_fwd * 1000:.2f} m | - | - |"
        )
    print(
        f"| D1 zone distance at t=59 (full spherical pipeline vs full "
        f"ellipsoid pipeline) | {n_fwd} | {max_zone * 1000:.1f} m | - | - | - |"
    )


if __name__ == "__main__":
    main()
