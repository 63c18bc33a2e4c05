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

from airstrik_py_spark.functions.geodesic import karney_inverse_km  # noqa: E402

EARTH_RADIUS_KM = 6371.0088  # must match functions/geo.py
HOME = (35.727, -78.696)


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


if __name__ == "__main__":
    main()
