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
