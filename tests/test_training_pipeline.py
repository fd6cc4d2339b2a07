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


def test_release_manifest_is_content_pure(spark, sf_dir, tmp_path):
    """Two materializations of the same inputs produce byte-identical
    manifests; counts in the manifest match the data; the underscore
    name keeps it invisible to parquet readers."""
    import json

    from pyspark_big_data_spark.queries.training_pipeline import materialize_training_set

    a, b = str(tmp_path / "rel_a"), str(tmp_path / "rel_b")
    n1 = materialize_training_set(spark, sf_dir, a)
    n2 = materialize_training_set(spark, sf_dir, b)
    assert n1 == n2 > 0
    ma = json.loads(open(f"{a}/_MANIFEST.json").read())
    mb = json.loads(open(f"{b}/_MANIFEST.json").read())
    assert ma == mb
    assert ma["total_docs"] == n1
    got = spark.read.parquet(a)
    assert ma["total_tokens"] == got.agg({"n_words": "sum"}).first()[0]
    # _-prefixed file is ignored by the parquet reader (no schema clash)
    assert set(got.columns) == set(ma["columns"])
