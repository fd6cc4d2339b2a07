from pyspark_big_data_spark.functions.distance import (
    haversine_km,
    haversine_km_pandas_udf,
    make_distance_udf,
)

__all__ = ["haversine_km", "haversine_km_pandas_udf", "make_distance_udf"]
