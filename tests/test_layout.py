"""Z-order layout: bit-math model agreement + the measured data-skipping
effect from real parquet footers."""

from __future__ import annotations

import glob

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
