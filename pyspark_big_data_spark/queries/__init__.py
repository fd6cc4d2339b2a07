"""Import all query modules so they self-register."""

from pyspark_big_data_spark.queries import q1_top_months  # noqa: F401
from pyspark_big_data_spark.queries.registry import ORACLES, REGISTRY

__all__ = ["REGISTRY", "ORACLES"]
