"""Exact, order-independent aggregation helpers.

Summing doubles is order-dependent (floating addition is non-associative),
so a Spark partial/final aggregation and a single-threaded oracle can
legitimately differ in the last bits — which breaks hash-based
differential checks and makes results nondeterministic run-to-run at
scale (partition order varies with AQE/task scheduling).

The engine's policy: per-row values are cast to DECIMAL(30,8) (the
double→decimal rounding is unambiguous: a binary fraction can never sit
exactly on a half at the 8th decimal digit), summed exactly, then cast
back to double. Deterministic on any cluster layout, identical in Spark
and DuckDB — and cheap: decimal sum is still a JVM codegen'd aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_DEC = "decimal(30,8)"
_DEC_SQL = "DECIMAL(30,8)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-sum average: decimal sum / non-null count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(_DEC)).cast("double") / F.count(c)).alias(alias)


def dsum_sql(expr: str, alias: str) -> str:
    """SQL-text twin of dsum (same text runs in Spark SQL and DuckDB)."""
    return f"CAST(SUM(CAST({expr} AS {_DEC_SQL})) AS DOUBLE) AS {alias}"


def davg_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {_DEC_SQL})) AS DOUBLE) / COUNT({expr}) AS {alias}"
