"""Planted-cluster embedding fixture + SRP-LSH recall/bill witness.

Round 5 proved (whitening sweep, PERFORMANCE.md) that the 31-40%
candidate bill of ``doc_embed_lsh_near_dup`` is intrinsic to its
bag-of-words INPUT — the truth band sits at low centered cosines — not
to the SRP mechanism. This module supplies the missing demonstration:
an input with genuine cluster structure (what real trained embeddings
look like), on which the SAME sign-random-projection banding must hit
>= 0.9 recall at a sub-10% candidate bill.

The fixture is COMPUTED, not stored: planted vector i is
``centroid(i mod C) + noise(i)`` where the centroid components are
±1 md5-coin-flips of the cluster index and the noise is a bounded
md5-uniform per (vector, dim) — every double derives from the portable
hash48 arithmetic (functions/text.py), so DuckDB rebuilds the exact
vectors, the exact buckets, and the exact truth pairs from the same
``embeddings.vec_id`` domain, making the whole recall measurement a
bit-exact differential oracle (unlike the sampled/agreement gates the
BLAS tiers need).

Geometry (C=25, eps=0.45): within-cluster cosine ~0.93, cross-cluster
~|centroid dot|/64 <= ~0.15 — the 0.4 truth threshold splits them with
wide margin. Banding at 10 planes x 12 tables: per-table collision for
a truth pair ~(1-θ/π)^10 ≈ 0.30 → OR over 12 tables ≈ 0.985 recall;
a random pair collides at ~2^-10 per table → ~1-2% of pairs, plus the
~4% same-cluster mass ≈ 6% total bill. The pytest gate pins
recall >= 0.9 AND bill <= 0.10 (tests/test_planted.py); the driver
verifies the exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.functions import vectors as V
from pyspark_big_data_spark.functions.text import hash48, hash48_sql_duckdb
from pyspark_big_data_spark.io import ensure_min_partitions, read_table
from pyspark_big_data_spark.queries.registry import register

_DIM = 64
_C = 25  # planted clusters
_EPS = 0.45  # noise half-width per dimension
_THRESH = 0.4  # near-dup truth threshold (same as the embeddings tiers)
_PLANES = 10  # planes per band table (bucket bits)
_TABLES = 12  # OR-amplification tables
# Above this many vectors the O(n²) truth side runs on a deterministic
# md5 id-sample (pairs cost /9) — recall is then ESTIMATED on the
# sampled truth while the candidate bill stays exact-full. At the
# driver-verified SFs (n=500) the sample is inactive, so the
# CORRECTNESS row remains the full bit-exact differential; the bench SF
# (n=2000) pays ~1/9 of the witness's former 25 s truth cost. Both
# engines apply the IDENTICAL rule (the oracle's predicate is
# n-conditional), so the row stays hash-exact at every SF.
_FULL_TRUTH_MAX = 600
_TRUTH_SAMPLE_MOD = 3
_TABLE_PLANES = [
    V.random_hyperplanes(n_planes=_PLANES, dim=_DIM, seed=f"planted-lsh:t{t}")
    for t in range(_TABLES)
]


def planted_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, e array<double>): the computed planted-cluster vectors
    over the ``embeddings`` id domain. Eagerly localCheckpointed —
    downstream operators (flatten, 120 bucket dots, the all-pairs
    truth) read the materialized doubles, and checkpoint blocks are
    GC-reclaimed once the result is dropped (a .cache() pinned one
    corpus per invocation for the session's lifetime, r14).

    Computed per-task in numpy/hashlib (r14; guide §4.2) instead of a
    {_DIM}-wide md5 expression tree: the doubles are IDENTICAL — the
    python twin of hash48 is ``int(md5(s)[:12], 16)`` and the noise /
    centroid arithmetic applies the same IEEE operations in the same
    order — but the multi-second Catalyst/codegen bill of 64 nested
    md5-concat expressions per invocation is gone. The oracle keeps
    the inline SQL spelling (DuckDB evaluates it in negligible time)."""
    import hashlib

    import numpy as np
    import pandas as pd

    # Single-file testdata arrives as ONE partition, serializing the
    # md5 fixture arithmetic and every downstream HOF onto one core —
    # fan out before the compute (no-op on real multi-file input).
    ids = ensure_min_partitions(
        read_table(spark, sf_dir, "embeddings").select("vec_id")
    )

    def gen(batches):
        cent = np.empty((_C, _DIM))
        for c in range(_C):
            for d in range(_DIM):
                h = int(
                    hashlib.md5(f"pc:{c}:{d}".encode()).hexdigest()[:12], 16
                )
                cent[c, d] = 1.0 if h % 2 == 0 else -1.0
        for pdf in batches:
            vids = pdf["vec_id"].to_numpy()
            vecs = []
            for vid in vids:
                vid = int(vid)
                base = cent[vid % _C]
                row = [
                    base[d]
                    + (
                        (
                            int(
                                hashlib.md5(
                                    f"pn:{vid}:{d}".encode()
                                ).hexdigest()[:12],
                                16,
                            )
                            % 2001
                        )
                        - 1000
                    )
                    / 1000.0
                    * _EPS
                    for d in range(_DIM)
                ]
                vecs.append(row)
            yield pd.DataFrame({"vec_id": vids, "e": vecs})

    return ids.mapInPandas(
        gen, schema="vec_id long, e array<double>"
    ).localCheckpoint(eager=True)


def _cent_sql(d: int) -> str:
    h = hash48_sql_duckdb(f"'pc:' || CAST(vec_id % {_C} AS VARCHAR) || ':{d}'")
    return f"(CASE WHEN {h} % 2 = 0 THEN 1.0 ELSE -1.0 END)"


def _noise_sql(d: int) -> str:
    h = hash48_sql_duckdb(f"'pn:' || CAST(vec_id AS VARCHAR) || ':{d}'")
    return f"((({h} % 2001) - 1000) / 1000.0 * {_EPS!r})"


def _bucket_sql(planes: list[list[float]]) -> str:
    terms = []
    for p, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(w) for w in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(e, {lit}) > 0 THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


_PE_SQL = (
    "SELECT vec_id, ["
    + ", ".join(f"{_cent_sql(d)} + {_noise_sql(d)}" for d in range(_DIM))
    + "] AS e FROM embeddings"
)

_TB_SQL = "\n    UNION ALL ".join(
    f"SELECT vec_id, {t} AS t, {_bucket_sql(planes)} AS bucket FROM pe"
    for t, planes in enumerate(_TABLE_PLANES)
)

_TSAMPLE_SQL = hash48_sql_duckdb("'pts:' || CAST(vec_id AS VARCHAR)")

_PLANTED_ORACLE = f"""
WITH pe AS ({_PE_SQL}),
n AS (SELECT COUNT(*) AS n FROM pe),
nv AS (
    SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM pe
),
sv AS (
    SELECT vec_id, e, nrm FROM nv
    WHERE (SELECT n FROM n) <= {_FULL_TRUTH_MAX}
       OR {_TSAMPLE_SQL} % {_TRUTH_SAMPLE_MOD} = 0
),
truth AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM sv a JOIN sv b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= {_THRESH}
),
tb AS (
    {_TB_SQL}
),
cand AS (
    SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
    FROM tb x JOIN tb y
      ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id
),
hit AS (
    SELECT t.id_a FROM truth t JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
)
SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_hit,
       ROUND(CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
             / (SELECT COUNT(*) FROM truth), 6) AS recall,
       ROUND(CAST((SELECT COUNT(*) FROM cand) AS DOUBLE)
             / ((SELECT n FROM n) * ((SELECT n FROM n) - 1) / 2), 6) AS bill
"""


def planted_candidate_pairs(planted: DataFrame) -> DataFrame:
    """Distinct candidate pairs from the OR-amplified band equi-join
    over the planted vectors — ids only through the join, same shape as
    similarity.lsh_candidate_pairs."""
    # The 120 plane vectors ride in as a BROADCAST dim table and the
    # bucket bits come from one HOF dot per (vector, plane) row,
    # sum-folded back per (vector, table). Numerically identical to the
    # inline simhash_bucket spelling (same dot, same power-of-two bit
    # weights, integer sum) but the plan carries ~10 nodes instead of
    # 12x10 dots x 64 literal components — the inline spelling cost ~9 s
    # of one-time Catalyst/codegen work PER SESSION at any data size.
    spark = planted.sparkSession
    plane_rows = [
        (t, p, plane)
        for t, planes in enumerate(_TABLE_PLANES)
        for p, plane in enumerate(planes)
    ]
    planes_df = spark.createDataFrame(
        plane_rows, "t int, p int, plane array<double>"
    )
    bit = F.when(
        V.dot(F.col("e"), F.col("plane")) > 0,
        F.expr("shiftleft(1, p)").cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    # Pin the banded ids: the self-join's two sides carry different
    # column aliases, so Catalyst does NOT reuse one exchange for both
    # and would otherwise run the bucket pipeline twice (and once more
    # per downstream reuse). The frame is (id, t, bucket) — n x TABLES
    # ints, the same bytes a shuffle would materialize. Eager
    # localCheckpoint, not .cache() (r14): blocks are GC-reclaimed
    # with the result frame instead of pinned per invocation forever.
    tabled = (
        planted.crossJoin(F.broadcast(planes_df))
        .select("vec_id", "t", bit.alias("_bit"))
        .groupBy("vec_id", "t")
        .agg(F.sum("_bit").alias("bucket"))
        .localCheckpoint(eager=True)
    )
    a = tabled.select(F.col("vec_id").alias("id_a"), "t", "bucket")
    b = tabled.select(
        F.col("vec_id").alias("id_b"),
        F.col("t").alias("t_b"),
        F.col("bucket").alias("bucket_b"),
    )
    return (
        a.join(
            b,
            (F.col("t") == F.col("t_b"))
            & (F.col("bucket") == F.col("bucket_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )


def planted_truth_pairs(planted: DataFrame) -> DataFrame:
    """Exact all-pairs cosine truth over the planted vectors (guarded:
    this is the O(n²) witness side, estimated on a hash-sample at real
    scale like lsh_recall_witness).

    Vectorized per task (r14; guide §4.2, the skyline-kernel pattern):
    the guarded-bounded vector set is broadcast once and each task
    checks its row chunk against all of it with numpy — replacing the
    O(n²)-row flat-column theta-join that re-shuffled and evaluated a
    64-term codegen dot per pair. BIT-IDENTICAL by construction: the
    kernel accumulates each dot with the same left-to-right fold as
    ``V.dot_flat`` (one elementwise multiply-add per dimension, in
    dimension order), the norms come in from the SAME Spark-computed
    ``V.norm`` column, and the cosine applies the identical
    ``dot / (na * nb)`` operation order — every IEEE rounding step
    matches the expression it replaces."""
    from pyspark_big_data_spark.queries.similarity import guard_allpairs

    import numpy as np
    import pandas as pd

    spark = planted.sparkSession
    sv = guard_allpairs(planted, "planted_truth_pairs").withColumn(
        "nrm", V.norm(F.col("e"))
    )
    # bounded by the guard (<= ALLPAIRS_MAX_ROWS) and usually by the
    # witness's md5 truth sample well below it
    rows = sv.select("vec_id", "e", "nrm").collect()
    ids = np.array([int(r["vec_id"]) for r in rows], dtype="int64")
    mat = np.array([r["e"] for r in rows], dtype="float64")
    nrm = np.array([r["nrm"] for r in rows], dtype="float64")
    b = spark.sparkContext.broadcast((ids, mat, nrm))

    def scan(batches):
        all_ids, all_mat, all_nrm = b.value
        n_all = len(all_ids)
        # bound per-chunk pair-matrix memory (<= ~32M cells)
        chunk_rows = max(1, 32_000_000 // max(n_all, 1))
        for pdf in batches:
            if not len(pdf):
                continue
            vids = pdf["vec_id"].to_numpy()
            cm = np.stack(pdf["e"].to_numpy()).astype("float64")
            cn = pdf["nrm"].to_numpy().astype("float64")
            for s in range(0, len(vids), chunk_rows):
                cv, cmat, cnrm = (
                    vids[s : s + chunk_rows],
                    cm[s : s + chunk_rows],
                    cn[s : s + chunk_rows],
                )
                # EXACT dot_flat fold: acc = ((0 + a0*b0) + a1*b1) + ...
                acc = np.zeros((len(cv), n_all))
                for d in range(_DIM):
                    acc = acc + cmat[:, d, None] * all_mat[None, :, d]
                cos = acc / (cnrm[:, None] * all_nrm[None, :])
                ra, cb = np.nonzero(
                    (cos >= _THRESH) & (cv[:, None] < all_ids[None, :])
                )
                yield pd.DataFrame(
                    {"id_a": cv[ra], "id_b": all_ids[cb]}
                )

    return sv.select("vec_id", "e", "nrm").mapInPandas(
        scan, schema="id_a long, id_b long"
    )


@register("planted_lsh_recall_witness", oracle=_PLANTED_ORACLE)
def planted_lsh_recall_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH recall AND candidate bill on clustered input, as one
    bit-exact oracled row (n_truth, n_candidates, n_hit, recall, bill).

    This is the scale demonstration the BOW corpus could not host: on
    input with real cluster structure the identical banding mechanism
    ({_PLANES} planes x {_TABLES} tables) recovers >=90% of the true
    near-dup pairs while generating <10% of all-pairs as candidates —
    the Σ bucket² economics a 100 TB embedding corpus relies on. Truth
    side is the guarded exact all-pairs baseline — run on a
    deterministic md5 id-sample above {_FULL_TRUTH_MAX} vectors
    (recall ESTIMATED on sampled truth, candidate bill exact-full; at
    the driver SFs the sample is inactive and every number is the full
    differential); candidate side is the ids-only band equi-join;
    DuckDB replays vectors, buckets, truth, sample rule and counts from
    the same md5 arithmetic, so the row is hash-exact at every SF."""
    planted = planted_embeddings(spark, sf_dir)
    n_planted = planted.count()  # eager cache: every branch reads doubles
    truth_input = planted
    if n_planted > _FULL_TRUTH_MAX:
        truth_input = planted.filter(
            hash48(F.concat(F.lit("pts:"), F.col("vec_id").cast("string")))
            % _TRUTH_SAMPLE_MOD
            == 0
        )
    truth = planted_truth_pairs(truth_input)
    cand = planted_candidate_pairs(planted)
    # ONE pass over both pair sets: full-outer on the pair key, one
    # aggregate for all three counts — the previous left-join + separate
    # candidate count executed the whole band-join pipeline twice.
    both = F.col("_t").isNotNull() & F.col("_c").isNotNull()
    counts = (
        truth.withColumn("_t", F.lit(1))
        .join(cand.withColumn("_c", F.lit(1)), ["id_a", "id_b"], "full_outer")
        .agg(
            F.count("_t").cast("long").alias("n_truth"),
            F.count("_c").cast("long").alias("n_candidates"),
            F.sum(F.when(both, 1).otherwise(0)).cast("long").alias("n_hit"),
        )
    )
    n_vec = planted.agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.crossJoin(F.broadcast(n_vec))
        .select(
            "n_truth",
            "n_candidates",
            "n_hit",
            F.round(F.col("n_hit").cast("double") / F.col("n_truth"), 6).alias(
                "recall"
            ),
            F.round(
                F.col("n_candidates").cast("double")
                / (F.col("n") * (F.col("n") - 1) / 2),
                6,
            ).alias("bill"),
        )
    )
