"""Near-duplicate detection operators: MinHash-LSH, SimHash, exact
n-gram Jaccard — the training-data dedup toolkit (SURVEY.md §7 M6).

Everything is DataFrame-native (explode -> hash -> group -> band ->
equi-join). The hash family is portable md5-48bit arithmetic
(functions/text.py::hash48) so DuckDB oracles replay the exact pipeline.

Scale design:
- shingling explodes ~L rows per doc: map-side only, no shuffle;
- the signature aggregate is ONE shuffle keyed by doc_id (K mins
  computed in a single HashAggregate pair, not K passes);
- banding re-keys by (band_no, band_hash): candidate generation is an
  equi-join — never a cartesian. Band-key skew (a hot bucket from
  boilerplate text) is the real 100 TB hazard: AQE skew-join splits it,
  and r (rows-per-band) tunes bucket selectivity;
- exact-verify stages (component agreement, true Jaccard) only touch
  candidate pairs, amortizing the n^2 away.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pyspark_big_data_spark.functions.text import hash48, normalize_text
from pyspark_big_data_spark.io import ensure_min_partitions

MERSENNE_P = 1_000_000_007
NUM_HASHES = 16
BAND_ROWS = 2  # r: signature components per band
NUM_BANDS = NUM_HASHES // BAND_ROWS

# LCG-style coefficient family; a_j bounded so a_j * hash48 stays < 2^63.
HASH_A = [(3 + 7 * j) % 8191 + 1 for j in range(NUM_HASHES)]
HASH_B = [(11 + 13 * j) % MERSENNE_P for j in range(NUM_HASHES)]

SHINGLE_LEN = 5
SHINGLE_STRIDE = 2  # w-shingling stride: halves hash work, negligible est impact
SIMHASH_BITS = 16


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) rows: character SHINGLE_LEN-grams of normalized text,
    sampled every SHINGLE_STRIDE positions (the per-shingle hash is the
    pipeline's dominant cost; stride trades a little estimator variance
    for half the hashing)."""
    norm = normalize_text(F.col(text_col))
    # single-file inputs arrive as 1 partition; spread the hash work
    d = ensure_min_partitions(df.select(F.col(id_col), norm.alias("norm")))
    pos = F.explode(
        F.sequence(
            F.lit(1),
            F.greatest(F.length("norm") - (SHINGLE_LEN - 1), F.lit(1)),
            F.lit(SHINGLE_STRIDE),
        )
    )
    return d.select(id_col, pos.alias("i"), "norm").select(
        id_col, F.substring(F.col("norm"), F.col("i"), SHINGLE_LEN).alias("s")
    )


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One row per doc with sig0..sig{K-1}: min of (a_j*h + b_j) mod P.

    The md5-derived base hash is projected ONCE before the aggregate —
    referencing hash48 inside all K aggregate expressions would make
    codegen evaluate the md5 K times per shingle.
    """
    hashed = sh.select(id_col, hash48(F.col("s")).alias("h"))
    aggs = [
        F.min((F.lit(HASH_A[j]) * F.col("h") + F.lit(HASH_B[j])) % MERSENNE_P).alias(f"sig{j}")
        for j in range(NUM_HASHES)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def band_keys(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Long-form (id, band_no, band): md5 over each band's r components."""
    entries = []
    for t in range(NUM_BANDS):
        parts = [
            F.col(f"sig{t * BAND_ROWS + r}").cast("string") for r in range(BAND_ROWS)
        ]
        entries.append(F.struct(F.lit(t).alias("band_no"), F.md5(F.concat_ws(",", *parts)).alias("band")))
    return sigs.select(id_col, F.explode(F.array(*entries)).alias("bk")).select(
        id_col, F.col("bk.band_no").alias("band_no"), F.col("bk.band").alias("band")
    )


def candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one band bucket."""
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col("band_no").alias("bn_a"), F.col("band").alias("b_a")
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("band_no").alias("bn_b"), F.col("band").alias("b_b")
    )
    return (
        a.join(
            b,
            (F.col("bn_a") == F.col("bn_b"))
            & (F.col("b_a") == F.col("b_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )


def estimated_jaccard(cand: DataFrame, sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Signature-agreement fraction per candidate pair (MinHash estimator)."""
    x = sigs.select(F.col(id_col).alias("id_a"), *[F.col(f"sig{j}").alias(f"xa{j}") for j in range(NUM_HASHES)])
    y = sigs.select(F.col(id_col).alias("id_b"), *[F.col(f"sig{j}").alias(f"yb{j}") for j in range(NUM_HASHES)])
    agree: Column = sum(
        F.when(F.col(f"xa{j}") == F.col(f"yb{j}"), 1).otherwise(0) for j in range(NUM_HASHES)
    )
    return (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .select("id_a", "id_b", (agree / F.lit(float(NUM_HASHES))).alias("est_jaccard"))
    )


def exact_jaccard(cand: DataFrame, sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """True n-gram Jaccard for candidate pairs via distinct-shingle joins."""
    dsh = sh.distinct()
    sizes = dsh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    xa = dsh.select(F.col(id_col).alias("id_a"), F.col("s").alias("s"))
    yb = dsh.select(F.col(id_col).alias("id_b"), F.col("s").alias("s"))
    inter = (
        cand.join(xa, "id_a")
        .join(yb, ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SIMHASH_BITS-bit SimHash over whitespace tokens (duplicates count).

    bit b of the signature = majority vote of bit b across token hashes
    (+1 if set, -1 if clear; ties -> 0 -> bit clear)."""
    norm = normalize_text(F.col(text_col))
    toks = ensure_min_partitions(df.select(F.col(id_col), norm.alias("n"))).select(
        F.col(id_col), F.explode(F.split(F.col("n"), " ")).alias("tok")
    )
    hashed = toks.select(id_col, hash48(F.col("tok")).alias("h"))  # md5 once, not once per bit
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"w{b}")
        for b in range(SIMHASH_BITS)
    ]
    weights = hashed.groupBy(id_col).agg(*aggs)
    sig: Column = sum(
        F.when(F.col(f"w{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)) for b in range(SIMHASH_BITS)
    )
    return weights.select(F.col(id_col), sig.cast("long").alias("simhash"))
