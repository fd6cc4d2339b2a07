"""Differential-testing helpers (the engine's correctness methodology).

Mirrors the verification driver: run a registered Spark query and its
DuckDB oracle SQL on the same parquet tables, then compare row count,
schema shape, and values order-insensitively. Also ships plan-shape
assertions (broadcast vs sort-merge, pushed filters) used by the
performance-facing tests — the reference inspected plans manually via
``result.explain()`` (``src/query3.py:153``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    """Run oracle SQL with the testdata tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by value; normalize dtypes.

    Row order must be STABLE under last-ulp float differences, or two
    rows with nearly-equal floats can sort in opposite orders across
    engines, misaligning row pairs and producing spurious diffs that the
    rtol check then flags. So the sort key uses non-float columns first
    and floats only as a rounded (7 significant digits) tie-breaker.
    """
    out = df.reindex(sorted(df.columns), axis=1).copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        elif out[c].dtype == object:
            # array cells (Spark -> ndarray, DuckDB -> ndarray/list):
            # canonicalize to tuples of python scalars so they hash,
            # sort, and compare by VALUE across engines
            out[c] = out[c].map(
                lambda v: tuple(v.tolist())
                if isinstance(v, np.ndarray)
                else tuple(v)
                if isinstance(v, list)
                else v
            )
    exact_cols = [c for c in out.columns if not pd.api.types.is_float_dtype(out[c])]
    float_cols = [c for c in out.columns if pd.api.types.is_float_dtype(out[c])]
    key = pd.DataFrame(index=out.index)
    for c in exact_cols:
        key[c] = out[c]
    for c in float_cols:
        with np.errstate(divide="ignore", invalid="ignore"):
            v = out[c].to_numpy()
            mag = np.floor(np.log10(np.abs(v), where=v != 0, out=np.zeros_like(v)))
            key[c] = np.where(np.isfinite(v), np.round(v / 10.0**mag, 7) * 10.0**mag, v)
    order = key.sort_values(by=exact_cols + float_cols, kind="mergesort").index
    return out.loc[order].reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> None:
    """Assert order-insensitive equality (exact for non-floats, tight
    relative tolerance for floats — SURVEY.md §5 tolerance policy)."""
    assert len(spark_pdf) == len(oracle_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    a, b = _canonicalize(spark_pdf), _canonicalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"columns: {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            ok = np.isclose(a[c].to_numpy(), b[c].to_numpy(), rtol=1e-9, atol=1e-12, equal_nan=True)
            assert ok.all(), f"float column {c!r} differs beyond 1e-9: " + str(
                a.loc[~ok, c].head(5).tolist()
            ) + " vs " + str(b.loc[~ok, c].head(5).tolist())
        else:
            same = (a[c].fillna("<NULL>") == b[c].fillna("<NULL>"))
            assert same.all(), f"column {c!r} differs; first diffs: " + str(
                list(zip(a.loc[~same, c].head(5), b.loc[~same, c].head(5)))
            )


def assert_query_matches_oracle(spark: SparkSession, name: str, sf_dir: str) -> int:
    """Run REGISTRY[name] and ORACLES[name] on sf_dir and compare."""
    from pyspark_big_data_spark.queries import ORACLES, REGISTRY

    sdf = REGISTRY[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    oracle_pdf = duckdb_oracle(ORACLES[name], sf_dir)
    compare_frames(spark_pdf, oracle_pdf)
    return len(spark_pdf)


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """Explain text; mode 'codegen' shows WholeStageCodegen subtrees
    (the AQE-wrapped 'formatted' initial plan omits codegen markers)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_plan_contains(df: DataFrame, *fragments: str) -> str:
    plan = physical_plan(df)
    for frag in fragments:
        assert frag in plan, f"expected {frag!r} in physical plan:\n{plan}"
    return plan


def assert_plan_lacks(df: DataFrame, *fragments: str) -> str:
    plan = physical_plan(df)
    for frag in fragments:
        assert frag not in plan, f"did not expect {frag!r} in physical plan:\n{plan}"
    return plan
