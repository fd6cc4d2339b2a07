"""Z-order layout: bit-math model agreement + the measured data-skipping
effect from real parquet footers."""

from __future__ import annotations

import glob

import pytest

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators.layout import cluster_write, morton_interleave


def test_morton_matches_python_model(spark):
    def py_morton(a: int, b: int, bits: int = 16) -> int:
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 0), (0, 65535), (12345, 54321)]
    df = spark.createDataFrame(cases, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["m"]
        for r in df.select("a", "b", morton_interleave(F.col("a"), F.col("b")).alias("m")).collect()
    }
    for a, b in cases:
        assert got[(a, b)] == py_morton(a, b), (a, b)


def _avg_span(path: str, column: str) -> float:
    """Mean per-row-group (max-min) for a column across the dataset —
    smaller = tighter stats = more predicates can skip the group."""
    spans, n = 0.0, 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans += float(st.max - st.min)
            n += 1
    return spans / n


def test_zorder_tightens_both_dimensions(spark, sf_dir, tmp_path):
    """A user_id-sorted layout has tight user_id stats and USELESS value
    stats; the Z-ordered layout must be meaningfully tighter than that
    baseline on the NON-sorted dimension while staying far tighter than
    unsorted on the sorted one — the whole point of multi-column
    clustering."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", (F.col("value") * 1000).cast("long").alias("v")
    )
    p_plain = str(tmp_path / "plain")
    p_single = str(tmp_path / "single")
    p_z = str(tmp_path / "zorder")

    # identical file/row-group granularity for a fair comparison
    ev.repartition(8).write.parquet(p_plain)
    ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id").write.parquet(p_single)
    cluster_write(ev, p_z, "user_id", "v", n_files=8)

    # same data in all three layouts
    assert spark.read.parquet(p_z).count() == ev.count()

    u_plain, u_single, u_z = (
        _avg_span(p_plain, "user_id"),
        _avg_span(p_single, "user_id"),
        _avg_span(p_z, "user_id"),
    )
    v_plain, v_single, v_z = (
        _avg_span(p_plain, "v"),
        _avg_span(p_single, "v"),
        _avg_span(p_z, "v"),
    )
    # single-column sort: near-perfect on user_id, useless on v
    assert u_single < 0.3 * u_plain
    # z-order: strictly better than unsorted on BOTH dims, and much
    # better than the single-column sort on the second dim
    assert u_z < 0.6 * u_plain
    assert v_z < 0.6 * v_plain
    assert v_z < 0.7 * v_single


def test_morton_n_matches_python_model(spark):
    """3-dim interleave pinned against a pure-Python bit model."""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.operators.layout import morton_interleave_n

    def model(a, b, c, bits=5):
        out = 0
        for j in range(bits):
            out |= ((a >> j) & 1) << (j * 3)
            out |= ((b >> j) & 1) << (j * 3 + 1)
            out |= ((c >> j) & 1) << (j * 3 + 2)
        return out

    rows = [(a, b, c) for a in (0, 1, 5, 31) for b in (0, 2, 30) for c in (0, 7, 31)]
    df = spark.createDataFrame(rows, "a long, b long, c long").select(
        "a", "b", "c",
        morton_interleave_n([F.col("a"), F.col("b"), F.col("c")], 5).alias("z"),
    )
    for r in df.collect():
        assert r["z"] == model(r["a"], r["b"], r["c"]), (r["a"], r["b"], r["c"])


def test_morton_n_contracts(spark):
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.operators.layout import morton_interleave_n

    with pytest.raises(ValueError, match=">= 2"):
        morton_interleave_n([F.lit(1)], 8)
    with pytest.raises(ValueError, match="overflows"):
        morton_interleave_n([F.lit(1)] * 4, 16)


def test_cluster_write_n_tightens_all_three_dims(spark, tmp_path):
    """3-dim clustered write: per-row-group footer ranges tighten on
    EVERY clustered column vs the unsorted layout."""
    import pyarrow.parquet as papq

    from pyspark.sql import functions as F

    from pyspark_big_data_spark.operators.layout import cluster_write_n

    n = 40_000
    df = spark.range(n).select(
        (F.col("id") * 48271 % n).alias("a"),
        (F.col("id") * 16807 % n).alias("b"),
        (F.col("id") * 69621 % n).alias("c"),
    )

    def mean_span(path, col):
        spans, files = [], []
        import glob
        for f in glob.glob(f"{path}/*.parquet"):
            md = papq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    cm = g.column(ci)
                    if cm.path_in_schema == col and cm.statistics is not None:
                        spans.append(cm.statistics.max - cm.statistics.min)
        return sum(spans) / len(spans)

    flat = str(tmp_path / "flat")
    df.repartition(8).write.mode("overwrite").parquet(flat)
    zed = str(tmp_path / "zed")
    # 64 z-range files = 6 prefix bits = 2 bits PER dimension: each
    # file covers ~1/4 of every dim's span (Morton spends resolution
    # evenly — the honest N-dim trade the docstring names)
    cluster_write_n(df, zed, ["a", "b", "c"], n_files=64)

    for col in ("a", "b", "c"):
        assert mean_span(zed, col) < 0.55 * mean_span(flat, col), col
