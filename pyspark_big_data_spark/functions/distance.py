"""Geographic distance functions (reference Q4 surface, SURVEY.md §2.9).

The reference computes geopy geodesic distance in a row-at-a-time Python
UDF (``src/query4.py:9-10,34``) — its own measured bottleneck (88 s rdd vs
48 s sql, ``results/query4.txt:53-67``). The engine provides three tiers:

1. ``haversine_km`` — pure Column expression: stays inside whole-stage
   codegen, zero Python workers. The scale default.
2. ``haversine_km_pandas_udf`` — Arrow-vectorized numpy; demonstrates the
   pandas_udf path for when semantics genuinely need Python.
3. ``make_distance_udf`` — geodesic via geopy when available (parity with
   the reference's semantics; haversine differs from WGS-84 geodesic by
   ~0.3%), else haversine in numpy. Row-at-a-time plain-udf variant kept
   only as a parity/benchmark foil.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.pandas.functions import pandas_udf

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km as a pure Column expression (JVM codegen)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(
        F.sin(dlon / 2), 2
    )
    # least(a, 1.0) guards asin domain for antipodal rounding overshoot
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str, radius: float = EARTH_RADIUS_KM) -> str:
    """The same formula as ANSI SQL text (used by Spark SQL variants AND
    DuckDB oracles — single source of truth for the expression)."""
    return (
        f"2.0 * {radius} * asin(sqrt(least("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2), 1.0)))"
    )


def _haversine_np(lat1, lon1, lat2, lon2):
    lat1, lon1, lat2, lon2 = (np.asarray(x, dtype="float64") for x in (lat1, lon1, lat2, lon2))
    dlat = np.radians(lat2 - lat1)
    dlon = np.radians(lon2 - lon1)
    a = np.sin(dlat / 2) ** 2 + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2)) * np.sin(
        dlon / 2
    ) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


def haversine_km_pandas_udf():
    """Arrow-batched vectorized haversine (~10-100x a row-at-a-time udf).

    Built lazily: pandas_udf return-type parsing needs an active
    SparkSession, so this can't be a module-level decorator.
    """

    @pandas_udf("double")
    def _udf(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
        return pd.Series(_haversine_np(lat1, lon1, lat2, lon2))

    return _udf


WGS84_A_M = 6378137.0  # semi-major axis, meters
WGS84_F = 1.0 / 298.257223563
WGS84_B_M = WGS84_A_M * (1.0 - WGS84_F)


def _vincenty_np(lat1, lon1, lat2, lon2, max_iter: int = 200, tol: float = 1e-12):
    """Vectorized WGS-84 geodesic distance (km), Vincenty inverse formula.

    Matches geopy/geographiclib to sub-millimeter for converging pairs
    (relative agreement far below the 1e-6 tolerance policy). The
    classically non-converging nearly-antipodal pairs fall back to
    haversine (documented drift <= ~0.56% on that tiny subset; geopy's
    Karney algorithm is the upgrade path when installed).
    """
    lat1, lon1, lat2, lon2 = (np.asarray(x, dtype="float64") for x in (lat1, lon1, lat2, lon2))
    phi1, phi2 = np.radians(lat1), np.radians(lat2)
    L = np.radians(lon2 - lon1)
    f = WGS84_F
    U1 = np.arctan((1.0 - f) * np.tan(phi1))
    U2 = np.arctan((1.0 - f) * np.tan(phi2))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    sin_alpha = np.zeros_like(lam)
    cos2_alpha = np.ones_like(lam)
    cos_2sm = np.zeros_like(lam)
    converged = np.zeros(lam.shape, dtype=bool)

    with np.errstate(divide="ignore", invalid="ignore"):
        for _ in range(max_iter):
            sinlam, coslam = np.sin(lam), np.cos(lam)
            sin_sigma = np.sqrt(
                (cosU2 * sinlam) ** 2 + (cosU1 * sinU2 - sinU1 * cosU2 * coslam) ** 2
            )
            cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * coslam
            sigma = np.arctan2(sin_sigma, cos_sigma)
            sin_alpha = np.where(sin_sigma == 0.0, 0.0, cosU1 * cosU2 * sinlam / sin_sigma)
            cos2_alpha = 1.0 - sin_alpha**2
            cos_2sm = np.where(
                cos2_alpha == 0.0, 0.0, cos_sigma - 2.0 * sinU1 * sinU2 / np.where(cos2_alpha == 0.0, 1.0, cos2_alpha)
            )
            C = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
            lam_new = L + (1.0 - C) * f * sin_alpha * (
                sigma
                + C * sin_sigma * (cos_2sm + C * cos_sigma * (-1.0 + 2.0 * cos_2sm**2))
            )
            converged = np.abs(lam_new - lam) < tol
            lam = lam_new
            if bool(np.all(converged)):
                break

    u2 = cos2_alpha * (WGS84_A_M**2 - WGS84_B_M**2) / WGS84_B_M**2
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    delta_sigma = (
        B
        * sin_sigma
        * (
            cos_2sm
            + B
            / 4.0
            * (
                cos_sigma * (-1.0 + 2.0 * cos_2sm**2)
                - B
                / 6.0
                * cos_2sm
                * (-3.0 + 4.0 * sin_sigma**2)
                * (-3.0 + 4.0 * cos_2sm**2)
            )
        )
    )
    dist_km = WGS84_B_M * A * (sigma - delta_sigma) / 1000.0
    # coincident points: 0 by construction; non-converged (nearly
    # antipodal): haversine fallback
    fallback = _haversine_np(lat1, lon1, lat2, lon2)
    return np.where(converged, dist_km, fallback)


def geodesic_km_pandas_udf():
    """Arrow-vectorized WGS-84 geodesic distance (D1 at reference
    semantics): geopy's Karney geodesic when installed (bit-parity with
    ``src/query4.py:9-10,34``), else the vectorized Vincenty inverse
    (identical to <1e-9 relative for converging pairs). Built lazily —
    pandas_udf type parsing needs an active session.
    """
    try:  # geopy optional
        from geopy.distance import geodesic  # type: ignore
    except ImportError:
        geodesic = None

    @pandas_udf("double")
    def _udf(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
        if geodesic is not None:
            return pd.Series(
                [
                    float(geodesic((a, b), (c, d)).km)
                    for a, b, c, d in zip(lat1, lon1, lat2, lon2)
                ]
            )
        return pd.Series(_vincenty_np(lat1, lon1, lat2, lon2))

    return _udf


def make_distance_udf(prefer_geodesic: bool = True):
    """Row-at-a-time scalar UDF (reference parity: ``src/query4.py:9-10,34``).

    Uses geopy's WGS-84 geodesic when installed (the reference's exact
    semantics), else falls back to haversine. Kept for parity tests and
    as the slow-path foil in benchmarks — NOT for production paths.
    """
    geodesic = None
    if prefer_geodesic:
        try:  # geopy is optional in this environment
            from geopy.distance import geodesic  # type: ignore
        except ImportError:
            geodesic = None

    def dist_km(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
        if geodesic is not None:
            return float(geodesic((lat1, lon1), (lat2, lon2)).km)
        return float(_haversine_np(lat1, lon1, lat2, lon2))

    return F.udf(dist_km, "double")
