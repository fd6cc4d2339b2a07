"""IVF + PQ with RESIDUAL encoding — the literal FAISS IVFPQ index.

Composes the engine's two quantization layers the way FAISS does:
- the coarse quantizer (the IVF cells of queries/ann_ivf.py — the
  label partition standing in for k-means cells, same trade-off notes)
  routes each probe to its top-NPROBE cells;
- within a cell, vectors are PQ-encoded on their RESIDUAL
  ``r = x - centroid(cell)`` rather than on x itself. That is the load-
  bearing trick: residuals concentrate near 0 with far less variance
  than raw vectors, so the same codebook budget quantizes them much
  more finely (numbers in tests/test_ivfpq.py's docstring);
- query time: the probe's ADC tables are built per PROBED CELL from
  the probe's own residual against that cell's centroid — the table
  depends on (probe, cell), which is why IVFPQ cannot precompute one
  global table, and why its accuracy beats flat PQ at equal bits;
- top-(POOL*k) ADC pool, exact-L2 rescore, top-k.

Registered rows-only (the ann_topk_ivf_quantized precedent): the cell
routing + residual PQ + ADC composition has a 5-stage generated-SQL
replay in principle, but flat PQ (queries/pq.py) already carries the
bit-exact oracle for every arithmetic ingredient; this tier's
correctness is gated in tests/test_ivfpq.py by (a) the cell-membership
GUARANTEE — every emitted neighbor lives in one of its probe's probed
cells — and (b) a recall floor vs brute-force exact L2, compared
side-by-side with flat PQ at identical code budget.

Scale design: codebooks are per-subspace on residuals (trained once,
broadcast); the ADC scan touches only the probed cells' codes (the IVF
scan cut times the 64x PQ byte cut — multiplicative, which is the
whole reason the composition exists); rescore touches POOL*k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators.kmeans import long_form
from pyspark_big_data_spark.queries.pq import (
    _POOL,
    _SUB,
    _TOP_K,
    pq_codes_and_books,
)
from pyspark_big_data_spark.queries.registry import register

_PROBE_MOD = 50
_NPROBE = 4

_DEC = "decimal(38,18)"


def _dsum(col_expr) -> F.Column:
    return F.sum(col_expr.cast(_DEC)).cast("double")


def _to_array(pv: DataFrame, id_cols: list[str], val_col: str = "val") -> DataFrame:
    """Collect (ids..., pos, val) long form back to an ordered array."""
    return pv.groupBy(*id_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", val_col))), lambda s: s[val_col]
        ).alias("e")
    )


@register("ann_topk_ivfpq", driver=False)
def ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoded IVFPQ top-{_TOP_K} (module docstring)."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"), "label"
    ).cache()
    pv = emb.select("vec_id", "label", F.posexplode("e").alias("pos0", "val")).select(
        "vec_id", "label", (F.col("pos0") + 1).alias("pos"), "val"
    )
    # centroid frame renames BOTH keys (c_label, c_pos): it shares
    # lineage with pv and Spark's ambiguous-self-join check needs
    # distinct names (the ann_ivf c_label note, plus pos)
    centroids = pv.groupBy(
        F.col("label").alias("c_label"), F.col("pos").alias("c_pos")
    ).agg((_dsum(F.col("val")) / F.count("val")).alias("cval")).cache()

    # residual corpus: r = x - centroid(own cell), back to array form
    rv = pv.join(
        F.broadcast(centroids),
        (pv["label"] == centroids["c_label"]) & (pv["pos"] == centroids["c_pos"]),
    ).select("vec_id", pv["pos"], (F.col("val") - F.col("cval")).alias("val"))
    residuals = _to_array(rv, ["vec_id"])
    codes, books = pq_codes_and_books(residuals)
    codes, books = codes.cache(), books.cache()

    # probe -> top-NPROBE cells by centroid cosine (ann_ivf's routing)
    probes_pv = pv.filter(F.col("vec_id") % _PROBE_MOD == 0).select("vec_id", "pos", "val")
    cnorm = centroids.groupBy("c_label").agg(
        F.sqrt(_dsum(F.col("cval") * F.col("cval"))).alias("cn")
    )
    pnorm = probes_pv.groupBy("vec_id").agg(
        F.sqrt(_dsum(F.col("val") * F.col("val"))).alias("pn")
    )
    assign = (
        probes_pv.join(F.broadcast(centroids), probes_pv["pos"] == centroids["c_pos"])
        .groupBy("vec_id", "c_label")
        .agg(_dsum(F.col("val") * F.col("cval")).alias("pdot"))
        .join(F.broadcast(cnorm), "c_label")
        .join(pnorm, "vec_id")
        .select(
            "vec_id", "c_label", (F.col("pdot") / (F.col("cn") * F.col("pn"))).alias("ccos")
        )
    )
    w_cell = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("c_label"))
    cells_lazy = (
        assign.withColumn("cell_rnk", F.row_number().over(w_cell))
        .filter(F.col("cell_rnk") <= _NPROBE)
        .select(F.col("vec_id").alias("probe_id"), F.col("c_label").alias("cell"))
    )
    # land the tiny routing table (n_probes x NPROBE rows) locally: it
    # would otherwise share lineage with every probe-side frame below
    # and trip the ambiguous-self-join analyzer (the kmeans _land move)
    spark = emb.sparkSession
    cells = spark.createDataFrame(cells_lazy.collect(), cells_lazy.schema)

    # per-(probe, probed-cell) residual, then per-subspace ADC tables
    ppv = probes_pv.withColumnRenamed("vec_id", "probe_id")
    prv = (
        cells.join(ppv, "probe_id")
        .join(
            F.broadcast(centroids),
            (F.col("cell") == centroids["c_label"])
            & (ppv["pos"] == centroids["c_pos"]),
        )
        .select("probe_id", "cell", ppv["pos"], (F.col("val") - F.col("cval")).alias("val"))
    )
    # subspace index and within-subspace position
    prv = prv.select(
        "probe_id",
        "cell",
        ((F.col("pos") - 1) / _SUB).cast("int").alias("m"),
        ((F.col("pos") - 1) % _SUB + 1).alias("spos"),
        "val",
    )
    bk = books.select("m", "cid", F.col("pos").alias("spos"), "cval")
    d2 = (F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))
    dtab = (
        prv.join(F.broadcast(bk), ["m", "spos"])
        .groupBy("probe_id", "cell", "m", "cid")
        .agg(_dsum(d2).alias("pd2"))
    )

    # ADC over the probed cells' codes only
    cell_codes = codes.join(
        emb.select("vec_id", F.col("label").alias("cell")), "vec_id"
    )
    adc = (
        cell_codes.join(
            F.broadcast(dtab),
            (cell_codes["cell"] == dtab["cell"])
            & (cell_codes["m"] == dtab["m"])
            & (cell_codes["code"] == dtab["cid"]),
        )
        .groupBy("probe_id", "vec_id")
        .agg(_dsum(F.col("pd2")).alias("adc_d2"))
        .filter(F.col("vec_id") != F.col("probe_id"))
    )
    wp = Window.partitionBy("probe_id").orderBy(F.col("adc_d2").asc(), F.col("vec_id").asc())
    pool = (
        adc.withColumn("prn", F.row_number().over(wp))
        .filter(F.col("prn") <= _POOL * _TOP_K)
        .select("probe_id", "vec_id")
    )

    # exact-L2 rescore on the pool
    full = long_form(emb.select("vec_id", "e"))
    pfull = long_form(
        emb.filter(F.col("vec_id") % _PROBE_MOD == 0).select(
            F.col("vec_id").alias("probe_id"), "e"
        ),
        id_col="probe_id",
        vec_col="e",
    ).select("probe_id", "pos", F.col("val").alias("pval"))
    ed2 = (F.col("pval") - F.col("val")) * (F.col("pval") - F.col("val"))
    exact = (
        pool.join(pfull, "probe_id")
        .join(full, ["vec_id", "pos"])
        .groupBy("probe_id", "vec_id")
        .agg(_dsum(ed2).alias("d2"))
    )
    wf = Window.partitionBy("probe_id").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    return (
        exact.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= _TOP_K)
        .select(
            "probe_id",
            "vec_id",
            F.round(F.col("d2"), 6).alias("d2"),
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy("probe_id", "rnk")
    )
