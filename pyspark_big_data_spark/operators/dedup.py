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

import itertools

from pyspark_big_data_spark.functions.text import hash48, hash60, normalize_text
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

# SimHash: 60-bit signatures (15 hex chars of md5 -> positive in signed
# int64 in BOTH engines; 64 bits would sign-extend, see functions/text.py
# ::hash60), split into 4 x 15-bit blocks for the pigeonhole candidate
# join: Hamming(a,b) <= 2 can touch at most 2 blocks, so >= 2 of the 4
# blocks are bit-identical -> candidates are an EQUI-join on
# (block_pair_id, block_i, block_j), never an all-pairs compare.
SIMHASH_BITS = 60
SIMHASH_BLOCK_BITS = 15
SIMHASH_NUM_BLOCKS = SIMHASH_BITS // SIMHASH_BLOCK_BITS
SIMHASH_BLOCK_PAIRS = list(itertools.combinations(range(SIMHASH_NUM_BLOCKS), 2))
SIMHASH_HAMMING_MAX = 2  # must stay <= SIMHASH_NUM_BLOCKS - 2 for pigeonhole


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


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id", base_hash=hash48) -> DataFrame:
    """One row per doc with sig0..sig{K-1}: min of (a_j*h + b_j) mod P.

    The base hash is projected ONCE before the aggregate — referencing
    it inside all K aggregate expressions would make codegen evaluate
    the hash K times per shingle. Default ``base_hash`` is the portable
    md5-48 (DuckDB-replayable); pass ``xxhash64_48`` for the JVM-native
    production tier (no oracle twin, ~same estimator quality).
    """
    hashed = sh.select(id_col, base_hash(F.col("s")).alias("h"))
    aggs = [
        F.min((F.lit(HASH_A[j]) * F.col("h") + F.lit(HASH_B[j])) % MERSENNE_P).alias(f"sig{j}")
        for j in range(NUM_HASHES)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def xxhash64_48(col: Column) -> Column:
    """JVM-native 48-bit base hash: xxhash64 masked to 48 bits so the
    LCG products (a_j * h) stay below 2^63 exactly like hash48. ~10x
    cheaper than md5 (no hex round-trip, vectorized codegen) — the
    production hash when a DuckDB differential twin isn't needed."""
    return F.xxhash64(col).bitwiseAND(F.lit((1 << 48) - 1))


def band_keys(sigs: DataFrame, id_col: str = "doc_id", band_hash=None) -> DataFrame:
    """Long-form (id, band_no, band): hash over each band's r components
    (md5 by default for oracle portability; pass e.g. F.xxhash64 for the
    production tier)."""
    if band_hash is None:
        band_hash = lambda *cols: F.md5(F.concat_ws(",", *cols))  # noqa: E731
    entries = []
    for t in range(NUM_BANDS):
        parts = [
            F.col(f"sig{t * BAND_ROWS + r}").cast("string") for r in range(BAND_ROWS)
        ]
        entries.append(F.struct(F.lit(t).alias("band_no"), band_hash(*parts).alias("band")))
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

    bit b of the signature = majority vote of bit b across token hashes.
    Encoded as ones-counts, not +-1 weights: sum the raw bit (no CASE
    branch per token per bit — measured ~25% faster than the when/
    otherwise form at sf0.1) and set the bit iff 2*ones_b > m, which is
    exactly the +-1 weight w_b = 2*ones_b - m > 0 (ties -> bit clear).
    The DuckDB oracle keeps the +-1 CASE encoding as the independent
    witness of the same majority vote."""
    norm = normalize_text(F.col(text_col))
    toks = ensure_min_partitions(df.select(F.col(id_col), norm.alias("n"))).select(
        F.col(id_col), F.explode(F.split(F.col("n"), " ")).alias("tok")
    )
    hashed = toks.select(id_col, hash60(F.col("tok")).alias("h"))  # md5 once, not once per bit
    aggs = [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"o{b}")
        for b in range(SIMHASH_BITS)
    ]
    weights = hashed.groupBy(id_col).agg(F.count(F.lit(1)).alias("m"), *aggs)
    sig: Column = sum(
        F.when(F.col(f"o{b}") * 2 > F.col("m"), F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(SIMHASH_BITS)
    )
    return weights.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_block_keys(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode each signature into its C(NUM_BLOCKS, 2) block-pair keys.

    Row (id, simhash, pair_id, v1, v2) for every unordered block pair
    (i, j): two docs within Hamming SIMHASH_HAMMING_MAX share at least
    one pair row with identical (pair_id, v1, v2) — the pigeonhole join
    key. Map-side only (explode x6), no shuffle.
    """
    mask = (1 << SIMHASH_BLOCK_BITS) - 1
    block = [
        F.shiftright(F.col("simhash"), t * SIMHASH_BLOCK_BITS).bitwiseAND(F.lit(mask))
        for t in range(SIMHASH_NUM_BLOCKS)
    ]
    entries = [
        F.struct(F.lit(pid).alias("pair_id"), block[i].alias("v1"), block[j].alias("v2"))
        for pid, (i, j) in enumerate(SIMHASH_BLOCK_PAIRS)
    ]
    return sh.select(
        id_col, "simhash", F.explode(F.array(*entries)).alias("bp")
    ).select(id_col, "simhash", "bp.pair_id", "bp.v1", "bp.v2")


def simhash_near_pairs_blocked(
    sh: DataFrame, hamming_max: int = SIMHASH_HAMMING_MAX, id_col: str = "doc_id"
) -> DataFrame:
    """(id_a < id_b, hamming) pairs within ``hamming_max`` via the
    pigeonhole block EQUI-join — the 100 TB-safe plan (the all-pairs
    compare is only the DuckDB oracle's independent witness).

    Cost: explode 6 rows/doc, one shuffle on the 30-bit+pair_id key,
    Σbucket² refine work — same shape as MinHash banding. Requires
    hamming_max <= NUM_BLOCKS - 2 (else <2 blocks are guaranteed equal
    and the equi-key no longer covers all true pairs).
    """
    if hamming_max > SIMHASH_NUM_BLOCKS - 2:
        raise ValueError(
            f"hamming_max={hamming_max} needs > {SIMHASH_NUM_BLOCKS - 2} equal blocks; "
            "raise SIMHASH_NUM_BLOCKS or lower the threshold"
        )
    bk = simhash_block_keys(sh, id_col)
    a = bk.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("ha"), "pair_id", "v1", "v2"
    )
    b = bk.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("hb"), "pair_id", "v1", "v2"
    )
    cand = (
        a.join(b, ["pair_id", "v1", "v2"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()  # (ha, hb) are functions of the ids: distinct stays per-pair
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= hamming_max)
        .select("id_a", "id_b", "hamming")
    )
