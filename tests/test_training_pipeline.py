from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.queries.training_pipeline import (
    curated_training_set,
    materialize_training_set,
)


def test_materialize_partitioned_by_lang(spark, sf_dir, tmp_path):
    out = str(tmp_path / "training_set")
    n = materialize_training_set(spark, sf_dir, out)
    assert n == curated_training_set(spark, sf_dir).count() > 0
    # lang partitioning enables pruned reads
    langs = [d.name for d in (tmp_path / "training_set").iterdir() if d.name.startswith("lang=")]
    assert len(langs) >= 2
    en = spark.read.parquet(out).filter(F.col("lang") == "en")
    assert 0 < en.count() < n
