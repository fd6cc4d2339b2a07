"""Deterministic reference-domain fixtures (FIXTURES.md T1–T5).

Synthesizes the LA-crime-shaped tables with every load-bearing quirk the
reference queries depend on:

- ``DATE OCC`` strings "MM/DD/YYYY hh:mm:ss AM" (years incl. 2015);
- ``TIME OCC`` ints 1–2359 including <1000 (lpad-sensitive);
- trailing-space column name ``AREA `` with NULLs, domain ⊆ police PREC;
- ``Vict Descent`` 19-code domain plus NULL and sentinel "-";
- ``Weapon Used Cd`` NULLs, firearm range [100,199], others;
- (LAT, LON) pairs ⊆ revgeo pairs, plus excluded (0,0) rows;
- income "$87,007"-formatted strings; revgeo ZIP-4 forms and NULLs;
- police x=LON / y=LAT swapped coordinates.

Everything derives from a seeded PRNG — same rows in every process, so
tests can register the same fixture in DuckDB and differential-compare.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

# 19-code victim-descent lookup (== src/query3.py:8-31)
DESCENT_CODES = [
    ("A", "Other Asian"), ("B", "Black"), ("C", "Chinese"), ("D", "Cambodian"),
    ("F", "Filipino"), ("G", "Guamanian"), ("H", "Hispanic/Latin/Mexican"),
    ("I", "American Indian/Alaskan Native"), ("J", "Japanese"), ("K", "Korean"),
    ("L", "Laotian"), ("O", "Other"), ("P", "Pacific Islander"), ("S", "Samoan"),
    ("U", "Hawaiian"), ("V", "Vietnamese"), ("W", "White"), ("X", "Unknown"),
    ("Z", "Asian Indian"),
]

PREMIS = ["STREET", "SINGLE FAMILY DWELLING", "PARKING LOT", "SIDEWALK", "APARTMENT"]
DIVISIONS = [f"DIVISION {i:02d}" for i in range(1, 22)]

N_CRIMES = 600
N_ZIPS = 30


def _rng() -> random.Random:
    return random.Random(20150614)


def build_all(spark: SparkSession) -> dict[str, DataFrame]:
    """Build crimes / police / income / revgeo / descent DataFrames."""
    rng = _rng()

    police_rows = []
    for prec in range(1, 22):
        lat = round(33.7 + rng.random() * 0.6, 4)
        lon = round(-118.6 + rng.random() * 0.6, 4)
        # x is LON, y is LAT — swapped vs crimes (README.md:110)
        police_rows.append((prec, DIVISIONS[prec - 1], lon, lat, prec))
    police_schema = ["OBJECTID", "DIVISION", "x", "y", "PREC"]

    zips = [90001 + i for i in range(N_ZIPS)]
    income_rows = []
    incomes = rng.sample(range(30000, 120000), N_ZIPS)  # distinct -> unambiguous top/bot
    for z, inc in zip(zips, incomes):
        income_rows.append((z, f"${inc:,}"))
    income_schema = ["Zip Code", "Estimated Median Income"]

    # revgeo: one coordinate per (zip, k) cell; some ZIP-4 forms, some NULL zips
    revgeo_rows = []
    coords_by_zip: dict[int, list[tuple[float, float]]] = {z: [] for z in zips}
    for z in zips:
        for k in range(6):
            lat = round(33.7 + rng.random() * 0.6, 4)
            lon = round(-118.6 + rng.random() * 0.6, 4)
            coords_by_zip[z].append((lat, lon))
            if k == 5:
                zip_str = None  # NULL zip (filtered by the query)
            elif k % 3 == 0:
                zip_str = f"{z}-{rng.randint(1000, 9999)}"  # ZIP-4 form
            else:
                zip_str = str(z)
            revgeo_rows.append((lat, lon, zip_str))
    revgeo_schema = ["LAT", "LON", "ZIPcode"]

    crime_rows = []
    for i in range(N_CRIMES):
        year = rng.choice([2013, 2014, 2015, 2015, 2015, 2016])  # 2015-heavy
        month = rng.randint(1, 12)
        day = rng.randint(1, 28)
        hh12 = rng.randint(1, 12)
        ampm = rng.choice(["AM", "PM"])
        date_occ = f"{month:02d}/{day:02d}/{year} {hh12:02d}:{rng.randint(0,59):02d}:00 {ampm}"
        time_occ = rng.randint(1, 2359)  # includes <1000 (lpad trap)
        area = rng.randint(1, 21) if rng.random() > 0.03 else None  # some NULLs
        premis = rng.choice(PREMIS) if rng.random() > 0.02 else None
        r = rng.random()
        if r < 0.08:
            descent = None
        elif r < 0.15:
            descent = "-"  # sentinel (filtered)
        else:
            descent = rng.choice(DESCENT_CODES)[0]
        r = rng.random()
        if r < 0.45:
            weapon = None
        elif r < 0.70:
            weapon = rng.randint(100, 199)  # firearm
        else:
            weapon = rng.choice([200, 205, 301, 400, 511])
        if rng.random() < 0.05:
            lat, lon = 0.0, 0.0  # excluded coords
        else:
            z = rng.choice(zips)
            lat, lon = rng.choice(coords_by_zip[z])
        crime_rows.append(
            (i + 1, date_occ, time_occ, area, premis, descent, weapon, lat, lon)
        )
    crime_schema = [
        "DR_NO", "DATE OCC", "TIME OCC", "AREA ",  # trailing space is load-bearing
        "Premis Desc", "Vict Descent", "Weapon Used Cd", "LAT", "LON",
    ]

    return {
        "crimes": spark.createDataFrame(crime_rows, crime_schema),
        "police": spark.createDataFrame(police_rows, police_schema),
        "income": spark.createDataFrame(income_rows, income_schema),
        "revgeo": spark.createDataFrame(revgeo_rows, revgeo_schema),
        "descent": spark.createDataFrame(DESCENT_CODES, ["Vict Descent", "Victim Descent"]),
    }
