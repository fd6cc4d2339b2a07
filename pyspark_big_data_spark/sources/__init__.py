"""Custom Python data sources (Spark 4 DataSource API)."""

from pyspark_big_data_spark.sources.synthetic_docs import (  # noqa: F401
    SyntheticDocsDataSource,
    register_synth_docs,
)
