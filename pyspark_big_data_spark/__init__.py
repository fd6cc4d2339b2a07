"""pyspark-big-data-spark: a PySpark-native analytics engine.

A from-scratch, DataFrame/SQL-first re-expression of the query and
data-processing capabilities of the reference project
``marvlach/pyspark-big-data`` (see SURVEY.md), extended with the
operations a large-scale training-data pipeline needs (dedup,
similarity search, text analysis, event-time windows, multimodal
column plumbing).

Design ground rules (SURVEY.md §7):
- DataFrame / Spark SQL only; no RDD layer in the engine paths.
- Explicit StructType schemas (no runtime inference in production paths).
- Zero custom Catalyst rules: plans are declared, Catalyst optimizes.
- Every query ships with a DuckDB-runnable ANSI-SQL oracle twin.
- Scale posture: broadcast small dims, AQE on, no driver-side collect
  except bounded head(k) patterns, decimal-exact aggregation helpers.
"""

from pyspark_big_data_spark.session import get_spark, ensure_session_confs
from pyspark_big_data_spark.io import read_table, read_csv, write_parquet, csv_to_parquet

__all__ = [
    "get_spark",
    "ensure_session_confs",
    "read_table",
    "read_csv",
    "write_parquet",
    "csv_to_parquet",
]

__version__ = "0.1.0"
