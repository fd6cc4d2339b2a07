"""Query registry: every implemented operator/query registers here.

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) a DuckDB-runnable ANSI-SQL oracle string
over the same parquet tables. This reproduces the reference's
differential-testing methodology (SURVEY.md §5: rdd/sql/df cross-API
agreement) with DuckDB as the independent second witness.

Column-name contract: Spark result and oracle result must use identical
column names (the driver sorts columns by name before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query to the registry, optionally with its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
