"""Pandas-UDF geodesics — the independent numeric cross-check for the
Catalyst expressions in functions/geo.py (SURVEY §5.5) and the bit-exact
WGS-84 fallback the reference's geopy path would need (SURVEY W4 note).

Two tiers:
  * numpy haversine/bearing (always available): vectorized Arrow batches,
    used by tests to pin the Column expressions against an implementation
    that shares no code with them;
  * geopy Karney geodesic (guarded import, not in this container): drop-in
    when bit-fidelity to the reference's WGS-84 ellipsoid maths is required
    on a full cluster.

These UDFs are NOT in any hot path — the engine always uses the codegen'd
expressions; this module exists for verification and for users who need
ellipsoid-exact distances.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from airstrik_py_spark.functions.geo import EARTH_RADIUS_KM

try:  # pragma: no cover - not installed in this container
    import geopy.distance  # noqa: F401

    GEOPY_AVAILABLE = True
except ImportError:
    GEOPY_AVAILABLE = False


@pandas_udf(DoubleType())
def haversine_km_udf(
    lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series
) -> pd.Series:
    """Vectorized numpy haversine — independent of the Column expression."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = np.radians(lat2 - lat1) / 2.0
    dl = np.radians(lon2 - lon1) / 2.0
    a = np.sin(dp) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl) ** 2
    return pd.Series(2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a)))


@pandas_udf(DoubleType())
def bearing_deg_udf(
    lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series
) -> pd.Series:
    """Vectorized numpy initial bearing, [0, 360)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dl = np.radians(lon2 - lon1)
    y = np.sin(dl) * np.cos(p2)
    x = np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dl)
    return pd.Series(np.mod(np.degrees(np.arctan2(y, x)) + 360.0, 360.0))


def geodesic_km_udf():
    """WGS-84 (Karney) geodesic via geopy — the reference's exact formula
    (airstrik.py:400, 438).  Guarded: geopy is not in this container."""
    if not GEOPY_AVAILABLE:  # pragma: no cover
        raise NotImplementedError(
            "geopy not installed; use haversine_km_udf (spherical) — "
            "<=0.5% divergence at <100 km ranges (SURVEY W4)"
        )
    import geopy.distance as gd

    @pandas_udf(DoubleType())
    def _udf(
        lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series
    ) -> pd.Series:  # pragma: no cover
        return pd.Series(
            [
                gd.geodesic((a, b), (c, d)).km
                for a, b, c, d in zip(lat1, lon1, lat2, lon2)
            ]
        )

    return _udf
