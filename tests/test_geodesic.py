"""WGS-84 geodesic tier (reference q4 exact semantics, VERDICT r1 item 6).

The reference computes geopy geodesic (``src/query4.py:9-10,34``); the
engine's default is haversine (~0.3% drift). These tests pin:
- the Vincenty implementation against the classic published test vector
  (Vincenty 1975: Flinders Peak -> Buninyong, 54972.271 m);
- agreement with geopy when geopy is installed (skip otherwise);
- the documented haversine-vs-geodesic drift band on the q4 inputs;
- the registered query tier end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_big_data_spark.functions.distance import _haversine_np, _vincenty_np
from pyspark_big_data_spark.queries.q4_distance import (
    q4_avg_distance,
    q4_avg_distance_geodesic,
)

# Vincenty (1975) test vector, degrees
_FLINDERS = (-(37 + 57 / 60 + 3.72030 / 3600), 144 + 25 / 60 + 29.52440 / 3600)
_BUNINYONG = (-(37 + 39 / 60 + 10.15610 / 3600), 143 + 55 / 60 + 35.38390 / 3600)
_EXPECT_KM = 54.972271


def test_vincenty_classic_vector():
    d = _vincenty_np(
        [_FLINDERS[0]], [_FLINDERS[1]], [_BUNINYONG[0]], [_BUNINYONG[1]]
    )[0]
    assert abs(d - _EXPECT_KM) < 1e-6  # sub-millimeter


def test_vincenty_coincident_and_symmetric():
    assert _vincenty_np([10.0], [20.0], [10.0], [20.0])[0] == 0.0
    ab = _vincenty_np([12.3], [45.6], [-7.8], [100.0])[0]
    ba = _vincenty_np([-7.8], [100.0], [12.3], [45.6])[0]
    assert ab == pytest.approx(ba, rel=1e-12)


def test_vincenty_matches_geopy_when_available():
    geopy = pytest.importorskip("geopy")  # noqa: F841  (reference parity env only)
    from geopy.distance import geodesic

    rng = np.random.default_rng(11)
    la1, lo1 = rng.uniform(-80, 80, 50), rng.uniform(-170, 170, 50)
    la2, lo2 = rng.uniform(-80, 80, 50), rng.uniform(-170, 170, 50)
    mine = _vincenty_np(la1, lo1, la2, lo2)
    theirs = np.array(
        [geodesic((a, b), (c, d)).km for a, b, c, d in zip(la1, lo1, la2, lo2)]
    )
    rel = np.abs(mine - theirs) / np.maximum(theirs, 1e-9)
    assert np.median(rel) < 1e-8  # Karney vs Vincenty sub-mm for converging pairs


def test_haversine_geodesic_drift_band():
    # spherical-vs-ellipsoidal drift is real but bounded: ~0.3% typical,
    # <=0.56% worst case (flattening) — the reason the geodesic tier exists
    rng = np.random.default_rng(7)
    la1, lo1 = rng.uniform(-80, 80, 500), rng.uniform(-179, 179, 500)
    la2, lo2 = rng.uniform(-80, 80, 500), rng.uniform(-179, 179, 500)
    v = _vincenty_np(la1, lo1, la2, lo2)
    h = _haversine_np(la1, lo1, la2, lo2)
    rel = np.abs(v - h) / np.maximum(v, 1e-9)
    assert 0.0001 < np.median(rel) < 0.006
    assert rel.max() < 0.01


def test_q4_geodesic_query_tier(spark, sf_dir):
    geo = {r["n_name"]: r["avg_dist_km"] for r in q4_avg_distance_geodesic(spark, sf_dir).collect()}
    hav = {r["n_name"]: r["avg_dist_km"] for r in q4_avg_distance(spark, sf_dir).collect()}
    assert set(geo) == set(hav) and len(geo) > 0
    for n in geo:
        assert geo[n] == pytest.approx(hav[n], rel=0.01)  # same physics
    assert any(geo[n] != hav[n] for n in geo)  # but different digits (ellipsoid)
