"""Near-dup dedup queries over documents, with full DuckDB oracles.

The oracles replay the exact MinHash/SimHash pipelines in SQL — possible
because the hash family is portable md5 arithmetic (operators/dedup.py).
Oracle SQL is *generated* from the same constants as the Spark plan, so
the two can't drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.operators import dedup as DD
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_EST_THRESHOLD = 0.5
_JACCARD_THRESHOLD = 0.4
_HAMMING_MAX = DD.SIMHASH_HAMMING_MAX

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_H48 = "(('0x' || substr(md5({e}), 1, 12))::BIGINT)"
_H60 = "(('0x' || substr(md5({e}), 1, 15))::BIGINT)"


def _dd_minhash_cte() -> str:
    """Shared DuckDB CTE chain: docs -> shingles -> signatures -> bands -> candidates."""
    hs = _H48.format(e="s")
    mins = ", ".join(
        f"min(({DD.HASH_A[j]} * {hs} + {DD.HASH_B[j]}) % {DD.MERSENNE_P}) AS sig{j}"
        for j in range(DD.NUM_HASHES)
    )
    sig_cols = ", ".join(f"sig{j}" for j in range(DD.NUM_HASHES))
    bands = ", ".join(
        "md5("
        + " || ',' || ".join(
            f"CAST(sig{t * DD.BAND_ROWS + r} AS STRING)" for r in range(DD.BAND_ROWS)
        )
        + f") AS band{t}"
        for t in range(DD.NUM_BANDS)
    )
    bandu = " UNION ALL ".join(
        f"SELECT doc_id, {t} AS band_no, band{t} AS band FROM sigs" for t in range(DD.NUM_BANDS)
    )
    return f"""
WITH d AS (SELECT doc_id, {_NORM} AS norm FROM documents),
sh AS (
    SELECT doc_id,
           substr(norm,
                  unnest(generate_series(1, greatest(length(norm) - {DD.SHINGLE_LEN - 1}, 1),
                                         {DD.SHINGLE_STRIDE})),
                  {DD.SHINGLE_LEN}) AS s
    FROM d
),
sig0 AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
sigs AS (SELECT doc_id, {sig_cols}, {bands} FROM sig0),
bandl AS ({bandu}),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bandl a
    JOIN bandl b ON a.band_no = b.band_no AND a.band = b.band AND a.doc_id < b.doc_id
)"""


_AGREE = " + ".join(
    f"(CASE WHEN x.sig{j} = y.sig{j} THEN 1 ELSE 0 END)" for j in range(DD.NUM_HASHES)
)

_MINHASH_ORACLE = f"""{_dd_minhash_cte()}
SELECT c.id_a, c.id_b, ({_AGREE}) / {float(DD.NUM_HASHES)} AS est_jaccard
FROM cand c
JOIN sigs x ON x.doc_id = c.id_a
JOIN sigs y ON y.doc_id = c.id_b
WHERE ({_AGREE}) / {float(DD.NUM_HASHES)} >= {_EST_THRESHOLD}
ORDER BY id_a, id_b
"""


@register("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs: shingle -> K=16 minhash -> 8 bands of
    r=2 -> banded equi-join candidates -> signature-agreement filter."""
    docs = read_table(spark, sf_dir, "documents")
    sh = DD.shingles(docs)
    # reused: bands + both agreement joins. Lazy .cache(), NOT an eager
    # localCheckpoint — measured r14: the eager checkpoint's separate
    # serialize-everything materialization cost this row +25% wall
    # (3.13 -> 3.91 s) for the same evaluation count
    sigs = DD.minhash_signatures(sh).cache()
    cand = DD.candidate_pairs(DD.band_keys(sigs))
    return (
        DD.estimated_jaccard(cand, sigs)
        .filter(F.col("est_jaccard") >= _EST_THRESHOLD)
        .orderBy("id_a", "id_b")
    )


@register("dedup_minhash_fast", driver=False)
def dedup_minhash_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-hash tier of dedup_minhash_lsh: identical pipeline
    (shingle -> K=16 minhash -> 8 bands -> banded equi-join ->
    agreement filter) with xxhash64 in place of md5 — the portability
    tax refund. md5 exists only so DuckDB can replay the pipeline
    bit-for-bit; at 100 TB you run this tier. No oracle by construction
    (xxhash64 has no DuckDB twin); pair-set agreement vs the md5 tier
    is asserted in tests/test_operators.py and the speedup is recorded
    in bench.py/PERFORMANCE.md."""
    docs = read_table(spark, sf_dir, "documents")
    sh = DD.shingles(docs)
    sigs = DD.minhash_signatures(sh, base_hash=DD.xxhash64_48).cache()
    cand = DD.candidate_pairs(
        DD.band_keys(sigs, band_hash=lambda *cols: F.xxhash64(*cols))
    )
    return (
        DD.estimated_jaccard(cand, sigs)
        .filter(F.col("est_jaccard") >= _EST_THRESHOLD)
        .orderBy("id_a", "id_b")
    )


# Incremental contract: the batch is doc_id % _INCR_MOD == 0 (10% of the
# corpus); the oracle is the FULL recompute restricted to pairs touching
# a batch doc — i.e. incremental must find exactly the new pairs.
_INCR_MOD = 10

_INCR_ORACLE = f"""{_dd_minhash_cte()}
SELECT c.id_a, c.id_b, ({_AGREE}) / {float(DD.NUM_HASHES)} AS est_jaccard
FROM cand c
JOIN sigs x ON x.doc_id = c.id_a
JOIN sigs y ON y.doc_id = c.id_b
WHERE ({_AGREE}) / {float(DD.NUM_HASHES)} >= {_EST_THRESHOLD}
  AND (c.id_a % {_INCR_MOD} = 0 OR c.id_b % {_INCR_MOD} = 0)
ORDER BY id_a, id_b
"""


def build_minhash_index(docs: DataFrame, index_dir: str) -> None:
    """Persist the reusable dedup index for a corpus: MinHash signatures
    plus long-form band keys, the band keys PARTITIONED BY band_no.

    What the layout buys at 100 TB: the batch join's shuffle key is
    (band_no, band), so a band_no-partitioned + band-bucketed index
    (add .bucketBy on `band` when writing to a table catalog) lets the
    probe join run per-band with a co-located build side instead of
    re-shuffling the whole index every batch; plain partitionBy alone
    gives per-band file layout (and pruning whenever a probe touches a
    band subset), bucketing adds the shuffle elision.

    Building the index costs one pass over the corpus — the point is it
    happens ONCE; every later batch reuses it instead of re-hashing the
    whole corpus."""
    sh = DD.shingles(docs)
    sigs = DD.minhash_signatures(sh).cache()
    sigs.write.mode("overwrite").parquet(f"{index_dir}/sigs")
    DD.band_keys(sigs).write.mode("overwrite").partitionBy("band_no").parquet(
        f"{index_dir}/bands"
    )


def build_minhash_index_table(
    docs: DataFrame, table_prefix: str = "minhash_index", num_buckets: int = 16
) -> None:
    """Catalog-table tier of build_minhash_index: band keys saved
    BUCKETED on the composite band key, so every later batch probe
    joins against the index with NO shuffle on the index side — the
    batch (small) shuffles to the index's bucketing, the index (the
    100 TB side) is read bucket-aligned in place. ``bk`` fuses
    (band_no, band) into one column because bucket pruning/alignment
    follows the bucket column exactly."""
    from pyspark_big_data_spark.operators.bucketing import write_bucketed

    spark = docs.sparkSession
    sigs = DD.minhash_signatures(DD.shingles(docs)).cache()
    sigs.write.mode("overwrite").format("parquet").saveAsTable(f"{table_prefix}_sigs")
    bands = DD.band_keys(sigs).withColumn("bk", F.concat_ws(":", "band_no", "band"))
    write_bucketed(bands, f"{table_prefix}_bands", "bk", num_buckets=num_buckets)


def batch_probe_candidates(batch_bands: DataFrame, idx_bands: DataFrame) -> DataFrame:
    """Candidate (id_a < id_b) pairs of a batch against an index on the
    fused band key — the join whose index side must stay shuffle-free
    when idx_bands is a bucketed-table scan (plan-asserted in
    tests/test_bucketing.py)."""
    a = batch_bands.select(F.col("doc_id").alias("id_x"), "bk")
    b = idx_bands.select(F.col("doc_id").alias("id_y"), F.col("bk").alias("bk_y"))
    return (
        a.join(b, (F.col("bk") == F.col("bk_y")) & (F.col("id_x") != F.col("id_y")))
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
        )
        .distinct()
    )


def incremental_pairs_bucketed(
    spark: SparkSession, batch: DataFrame, table_prefix: str = "minhash_index"
) -> DataFrame:
    """dedup_minhash_incremental against the BUCKETED catalog index:
    batch x index runs with the index side shuffle-free (bucket-aligned
    scan), batch x batch is a separate tiny self-join — so the big side
    never re-shuffles, the exact property the layout is for."""
    batch_sigs = DD.minhash_signatures(DD.shingles(batch)).cache()
    batch_bands = DD.band_keys(batch_sigs).withColumn(
        "bk", F.concat_ws(":", "band_no", "band")
    )
    idx_bands = spark.table(f"{table_prefix}_bands")
    idx_sigs = spark.table(f"{table_prefix}_sigs")

    cand = batch_probe_candidates(batch_bands, idx_bands).unionByName(
        DD.candidate_pairs(batch_bands)
    ).distinct()
    all_sigs = idx_sigs.unionByName(batch_sigs)
    return (
        DD.estimated_jaccard(cand, all_sigs)
        .filter(F.col("est_jaccard") >= _EST_THRESHOLD)
        .orderBy("id_a", "id_b")
    )


@register("dedup_minhash_incremental", oracle=_INCR_ORACLE, driver=False)
def dedup_minhash_incremental(
    spark: SparkSession, sf_dir: str, index_dir: str | None = None
) -> DataFrame:
    """Incremental near-dup detection — the operational 100 TB shape:
    a NEW BATCH of documents arrives against an already-indexed corpus,
    and only the batch is hashed. Candidates come from joining the
    batch's band keys against (persisted index ∪ batch): every new pair
    (batch x corpus and batch x batch) is found, and no corpus x corpus
    pair is ever recomputed. Work scales with |batch| x bucket overlap,
    not |corpus|.

    The testdata split is deterministic (doc_id % {_INCR_MOD} == 0 is
    the batch); the oracle is the full-recompute pipeline restricted to
    pairs touching a batch doc, so "incremental == full recompute on
    the new pairs" is the oracled contract itself. Set-union equivalence
    (old pairs ∪ incremental pairs == full pairs) is additionally pinned
    in tests/test_operators.py."""
    from pyspark_big_data_spark.io import session_tmpdir

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % _INCR_MOD != 0)
    batch = docs.filter(F.col("doc_id") % _INCR_MOD == 0)

    if index_dir is None:
        index_dir = session_tmpdir("minhash_index_")
        build_minhash_index(corpus, index_dir)

    idx_sigs = spark.read.parquet(f"{index_dir}/sigs")
    idx_bands = spark.read.parquet(f"{index_dir}/bands").select("doc_id", "band_no", "band")

    batch_sigs = DD.minhash_signatures(DD.shingles(batch)).cache()
    batch_bands = DD.band_keys(batch_sigs)

    # batch bands vs (index ∪ batch) bands: equi-join on the band key;
    # normalize to id_a < id_b and dedup (batch-batch pairs match twice)
    all_bands = idx_bands.unionByName(batch_bands)
    a = batch_bands.select(
        F.col("doc_id").alias("id_x"), "band_no", "band"
    )
    b = all_bands.select(
        F.col("doc_id").alias("id_y"),
        F.col("band_no").alias("band_no_y"),
        F.col("band").alias("band_y"),
    )
    cand = (
        a.join(
            b,
            (F.col("band_no") == F.col("band_no_y"))
            & (F.col("band") == F.col("band_y"))
            & (F.col("id_x") != F.col("id_y")),
        )
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
        )
        .distinct()
    )
    all_sigs = idx_sigs.unionByName(batch_sigs)
    return (
        DD.estimated_jaccard(cand, all_sigs)
        .filter(F.col("est_jaccard") >= _EST_THRESHOLD)
        .orderBy("id_a", "id_b")
    )


# Build-once cache of the persisted minhash index per corpus (sigs +
# band keys over the corpus split) — the artifact every later batch
# probes. Keyed by sf_dir like _CLUSTER_MAP_DIRS below.
_MINHASH_INDEX_DIRS: dict[str, str] = {}


def persisted_minhash_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Return (building on first use) the persisted MinHash index
    directory for ``sf_dir``'s corpus split (doc_id % {_INCR_MOD} != 0)
    — exactly what ``build_minhash_index`` would have left on disk
    after indexing the corpus, which is the state every incremental
    batch starts from."""
    from pyspark_big_data_spark.io import session_tmpdir

    if sf_dir not in _MINHASH_INDEX_DIRS:
        d = session_tmpdir("minhash_steady_index_")
        docs = read_table(spark, sf_dir, "documents")
        build_minhash_index(docs.filter(F.col("doc_id") % _INCR_MOD != 0), d)
        _MINHASH_INDEX_DIRS[sf_dir] = d
    return _MINHASH_INDEX_DIRS[sf_dir]


@register("dedup_minhash_incremental_steady", oracle=_INCR_ORACLE)
def dedup_minhash_incremental_steady(
    spark: SparkSession, sf_dir: str, index_dir: str | None = None
) -> DataFrame:
    """STEADY-STATE incremental near-dup probe — the per-batch cost a
    production deployment actually pays: the corpus MinHash index
    already EXISTS on disk (built once, amortized across every batch;
    here the build-once artifact from ``persisted_minhash_index_dir``),
    so the query hashes ONLY the batch and runs the banded equi-join
    probe against the persisted sigs/bands. Work scales with
    |batch| x bucket overlap — the corpus is never re-hashed.

    Same oracle as the full-chain twin ``dedup_minhash_incremental``
    (the full recompute restricted to pairs touching a batch doc), so
    the driver verifies the PERSISTED index still yields from-scratch-
    identical pairs — the index-vs-recompute differential the
    steady-state map projections (``split_assign_from_map``,
    ``dedup_soft_weights_from_map``) also pin. The full-chain twin
    keeps the build+probe shape on the books (bench variant line)."""
    if index_dir is None:
        index_dir = persisted_minhash_index_dir(spark, sf_dir)
    return dedup_minhash_incremental(spark, sf_dir, index_dir=index_dir)


_NGRAM_ORACLE = f"""{_dd_minhash_cte()},
filtered AS (
    SELECT c.id_a, c.id_b
    FROM cand c
    JOIN sigs x ON x.doc_id = c.id_a
    JOIN sigs y ON y.doc_id = c.id_b
    WHERE ({_AGREE}) / {float(DD.NUM_HASHES)} >= {_EST_THRESHOLD}
),
dsh AS (SELECT DISTINCT doc_id, s FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh GROUP BY doc_id),
inter AS (
    SELECT f.id_a, f.id_b, COUNT(*) AS n_inter
    FROM filtered f
    JOIN dsh x ON x.doc_id = f.id_a
    JOIN dsh y ON y.doc_id = f.id_b AND y.s = x.s
    GROUP BY f.id_a, f.id_b
)
SELECT i.id_a, i.id_b,
       CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= {_JACCARD_THRESHOLD}
ORDER BY id_a, id_b
"""


@register("ngram_jaccard_pairs", oracle=_NGRAM_ORACLE)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact character-n-gram Jaccard, verified only on LSH candidates
    (estimate >= threshold) — the candidate-then-verify pattern that
    keeps exact similarity affordable at scale."""
    docs = read_table(spark, sf_dir, "documents")
    sh = DD.shingles(docs).cache()  # reused: signatures + exact verify
    sigs = DD.minhash_signatures(sh).cache()
    cand = DD.candidate_pairs(DD.band_keys(sigs))
    filtered = (
        DD.estimated_jaccard(cand, sigs)
        .filter(F.col("est_jaccard") >= _EST_THRESHOLD)
        .select("id_a", "id_b")
    )
    return (
        DD.exact_jaccard(filtered, sh)
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .orderBy("id_a", "id_b")
    )


# Shared CTE chain ending in `clusters(doc_id, cluster_id)` — the
# transitive closure of the near-dup pair graph. Reused by the cluster
# labeling oracle and the cluster-keyed split-assignment oracle so the
# two can't drift.
_CLOSURE_CTES = f"""{_dd_minhash_cte()},
pairs AS (
    SELECT c.id_a, c.id_b
    FROM cand c
    JOIN sigs x ON x.doc_id = c.id_a
    JOIN sigs y ON y.doc_id = c.id_b
    WHERE ({_AGREE}) / {float(DD.NUM_HASHES)} >= {_EST_THRESHOLD}
),
sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach AS (
    WITH RECURSIVE walk(src, node) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT w.src, s.v FROM walk w JOIN sym s ON s.u = w.node
    )
    SELECT src, node FROM walk
),
clusters AS (
    SELECT src AS doc_id, MIN(node) AS cluster_id
    FROM reach
    GROUP BY src
)
"""

_CLUSTERS_ORACLE = (
    _CLOSURE_CTES + "SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id"
)


@register("dedup_clusters", oracle=_CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: MinHash-LSH near-dup pairs ->
    connected components (iterative min-label propagation,
    operators/graph.py) -> every doc labeled with its cluster's min
    doc_id. Downstream dedup keeps one doc per cluster_id.

    The oracle replays the transitive closure with a recursive CTE —
    an independent algorithm (BFS closure vs label propagation)
    agreeing on the same fixpoint."""
    from pyspark_big_data_spark.operators.graph import connected_components

    docs = read_table(spark, sf_dir, "documents")
    sh = DD.shingles(docs)
    sigs = DD.minhash_signatures(sh).cache()
    cand = DD.candidate_pairs(DD.band_keys(sigs))
    pairs = (
        DD.estimated_jaccard(cand, sigs)
        .filter(F.col("est_jaccard") >= _EST_THRESHOLD)
        .select("id_a", "id_b")
    )
    labels = connected_components(
        docs.select("doc_id"), pairs, node_col="doc_id"
    )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    ).orderBy("doc_id")


@register("dedup_clusters_incremental", oracle=_CLUSTERS_ORACLE, driver=False)
def dedup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cluster MAINTENANCE — the missing operational piece
    after incremental pair detection: fold a new batch's pairs into a
    persisted cluster map instead of re-running connected components
    over the whole corpus.

    Split mirrors dedup_minhash_incremental (batch = doc_id %
    {_INCR_MOD} == 0): the 'old' map is CC over corpus-only pairs; the
    batch contributes exactly the old x new and new x new pairs the
    incremental loop emits; merge_components_incremental contracts old
    endpoints to their cluster ids and runs CC only on the touched
    subgraph (bounded by batch neighborhood, never corpus size). The
    ORACLE is the full-recompute transitive closure over ALL pairs —
    so 'incremental map == full recompute' is literally the oracled
    contract, not a weaker self-consistency check."""
    from pyspark_big_data_spark.operators.graph import (
        connected_components,
        merge_components_incremental,
    )

    docs = read_table(spark, sf_dir, "documents")
    sigs = DD.minhash_signatures(DD.shingles(docs)).cache()
    pairs = (
        DD.estimated_jaccard(DD.candidate_pairs(DD.band_keys(sigs)), sigs)
        .filter(F.col("est_jaccard") >= _EST_THRESHOLD)
        .select("id_a", "id_b")
        .cache()
    )
    is_new = lambda c: c % _INCR_MOD == 0  # noqa: E731
    old_docs = docs.filter(~is_new(F.col("doc_id"))).select("doc_id")
    new_docs = docs.filter(is_new(F.col("doc_id"))).select("doc_id")
    # band keys are per-doc, so corpus-subset pairs == full pairs
    # restricted to old x old (same property the incremental query pins)
    old_pairs = pairs.filter(~is_new(F.col("id_a")) & ~is_new(F.col("id_b")))
    new_pairs = pairs.filter(is_new(F.col("id_a")) | is_new(F.col("id_b")))

    old_map = connected_components(old_docs, old_pairs, node_col="doc_id")
    updated = merge_components_incremental(
        old_map, new_docs.select(F.col("doc_id").alias("id")), new_pairs
    )
    return updated.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    ).orderBy("doc_id")


def _dd_simhash_cte() -> str:
    ht = _H60.format(e="tok")
    weights = ", ".join(
        f"sum(CASE WHEN ({ht} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS w{b}"
        for b in range(DD.SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN w{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(DD.SIMHASH_BITS)
    )
    return f"""
WITH t AS (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok FROM documents),
w AS (SELECT doc_id, {weights} FROM t GROUP BY doc_id),
sh AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM w)"""


_SIMHASH_ORACLE = f"""{_dd_simhash_cte()}
SELECT doc_id, simhash FROM sh ORDER BY doc_id
"""


# driver=False: simhash_near_pairs subsumes the signature computation on
# the 50-row driver surface; this stays fully oracled in the pytest gate.
@register("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 60-bit SimHash signature (majority vote of token-hash
    bits) — constant output size per doc, one shuffle."""
    docs = read_table(spark, sf_dir, "documents")
    return DD.simhash(docs).orderBy("doc_id")


# Oracle is the ALL-PAIRS compare on purpose: an independent algorithm
# (O(n^2) witness vs the engine's pigeonhole block join) agreeing on the
# same pair set — exactly the shape of the dedup_clusters oracle.
_SIMHASH_PAIRS_ORACLE = f"""{_dd_simhash_cte()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_HAMMING_MAX}
ORDER BY id_a, id_b
"""


@register("simhash_near_pairs", oracle=_SIMHASH_PAIRS_ORACLE)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs within Hamming distance <= 2 of 60-bit SimHash, via the
    pigeonhole block EQUI-join (4 x 15-bit blocks; d <= 2 touches at
    most 2 blocks, so >= 2 blocks match exactly -> candidates come from
    an equi-join on (block_pair_id, block_i, block_j), then an exact
    bit_count refine). No nested-loop anywhere — scales like MinHash
    banding (Σbucket² refine cost)."""
    docs = read_table(spark, sf_dir, "documents")
    # pin the signatures (r14): the block equi-join's two sides carry
    # different aliases, so Catalyst does not share one subtree and the
    # token-explode + 60-bit majority aggregate would run TWICE (once
    # per side). The frame is (doc_id, simhash) — two ints per doc;
    # eager localCheckpoint so the blocks are GC-reclaimed with the
    # result instead of pinned per invocation.
    sh = DD.simhash(docs).localCheckpoint(eager=True)
    return DD.simhash_near_pairs_blocked(sh).orderBy("id_a", "id_b")


_SURVIVORS_ORACLE = f"""{_dd_minhash_cte()},
pairs AS (
    SELECT c.id_a, c.id_b
    FROM cand c
    JOIN sigs x ON x.doc_id = c.id_a
    JOIN sigs y ON y.doc_id = c.id_b
    WHERE ({_AGREE}) / {float(DD.NUM_HASHES)} >= {_EST_THRESHOLD}
),
sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach AS (
    WITH RECURSIVE walk(src, node) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT w.src, s.v FROM walk w JOIN sym s ON s.u = w.node
    )
    SELECT src, node FROM walk
),
labels AS (
    SELECT src AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY src
)
SELECT l.doc_id, CAST(cnt.n AS BIGINT) AS cluster_size
FROM labels l
JOIN (SELECT cluster_id, COUNT(*) AS n FROM labels GROUP BY cluster_id) cnt
  ON cnt.cluster_id = l.cluster_id
WHERE l.doc_id = l.cluster_id
ORDER BY l.doc_id
"""


@register("dedup_near_survivors", oracle=_SURVIVORS_ORACLE)
def dedup_near_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup OUTPUT at 100 TB: one surviving doc per near-dup
    cluster (min doc_id), with the cluster size it absorbed.

    This is the "emit survivors, not pairs" guidance from the x10
    stress (PERFORMANCE.md) made a registered query: output is O(docs)
    regardless of how heavy duplication is, while the pair view grows
    with Σ cluster_size². Plan: the dedup_clusters pipeline + one
    count-by-label + a survivor filter — no new shuffle shape."""
    labels = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.filter(F.col("doc_id") == F.col("cluster_id"))
        .join(sizes, "cluster_id")
        .select("doc_id", "cluster_size")
        .orderBy("doc_id")
    )


_LONGEST_SURV_ORACLE = f"""{_dd_minhash_cte()},
pairs AS (
    SELECT c.id_a, c.id_b
    FROM cand c
    JOIN sigs x ON x.doc_id = c.id_a
    JOIN sigs y ON y.doc_id = c.id_b
    WHERE ({_AGREE}) / {float(DD.NUM_HASHES)} >= {_EST_THRESHOLD}
),
sym AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach AS (
    WITH RECURSIVE walk(src, node) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT w.src, s.v FROM walk w JOIN sym s ON s.u = w.node
    )
    SELECT src, node FROM walk
),
labels AS (
    SELECT src AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY src
),
sel AS (
    SELECT l.cluster_id, d.doc_id, d.n_chars,
           ROW_NUMBER() OVER (
               PARTITION BY l.cluster_id ORDER BY d.n_chars DESC, d.doc_id ASC
           ) AS rn,
           COUNT(*) OVER (PARTITION BY l.cluster_id) AS n
    FROM labels l JOIN documents d ON d.doc_id = l.doc_id
)
SELECT doc_id, CAST(n AS BIGINT) AS cluster_size, CAST(n_chars AS BIGINT) AS n_chars
FROM sel WHERE rn = 1 ORDER BY doc_id
"""


@register("dedup_longest_survivors", oracle=_LONGEST_SURV_ORACLE, driver=False)
def dedup_longest_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-aware survivor selection: keep the LONGEST document of
    each near-dup cluster (tie-break min doc_id) instead of the min-id
    convention — the C4/RefinedWeb-style choice when duplicates differ
    by truncation, so the canonical copy retains the most content.

    Same plan shape as dedup_near_survivors (cluster labels + one
    window over each cluster's members) — O(docs) output regardless of
    duplication weight; the survivor rule is one ORDER BY away from any
    other quality key (score column, recency, source priority)."""
    labels = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    wc = Window.partitionBy("cluster_id")
    return (
        labels.join(docs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select("doc_id", "cluster_size", F.col("n_chars").cast("long").alias("n_chars"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Train/val split leakage audit
# ---------------------------------------------------------------------------

_SPLIT_MOD = 10  # 10% held out: hash48('split:'||doc_id) % 10 == 0 -> val

_LEAK_ORACLE = f"""{_dd_minhash_cte()},
est AS (
    SELECT c.id_a, c.id_b, ({_AGREE}) / {float(DD.NUM_HASHES)} AS est_jaccard
    FROM cand c
    JOIN sigs x ON x.doc_id = c.id_a
    JOIN sigs y ON y.doc_id = c.id_b
    WHERE ({_AGREE}) / {float(DD.NUM_HASHES)} >= {_EST_THRESHOLD}
),
sp AS (
    SELECT doc_id,
           CASE WHEN {_H48.format(e="'split:' || CAST(doc_id AS VARCHAR)")} % {_SPLIT_MOD} = 0
                THEN 'val' ELSE 'train' END AS split
    FROM documents
)
SELECT e.id_a, e.id_b, sa.split AS split_a, sb.split AS split_b, e.est_jaccard
FROM est e
JOIN sp sa ON sa.doc_id = e.id_a
JOIN sp sb ON sb.doc_id = e.id_b
WHERE sa.split <> sb.split
ORDER BY id_a, id_b
"""


@register("split_leakage_audit", oracle=_LEAK_ORACLE, driver=False)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs that CROSS a hash-based train/val split —
    the leakage a naive random split injects (a val doc whose near-dup
    twin is in train inflates eval). The audit is the QA step before
    any benchmark claim; the FIX is splitting by duplicate-cluster
    (dedup_clusters) instead of by document, which this query verifies
    by returning zero rows when applied to cluster-keyed splits.

    Shape: the already-banded pair set joined to a map-side split
    assignment — no new shuffle beyond the dedup pipeline's own."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    from pyspark_big_data_spark.functions.text import hash48

    split = F.when(
        hash48(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % _SPLIT_MOD == 0,
        F.lit("val"),
    ).otherwise(F.lit("train"))
    sp = docs.select("doc_id", split.alias("split"))
    return (
        pairs.join(
            sp.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")), "id_a"
        )
        .join(
            sp.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")), "id_b"
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "est_jaccard")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Leakage-free split ASSIGNMENT (the constructive fix the audit points at)
# ---------------------------------------------------------------------------

_SPLIT_ASSIGN_ORACLE = _CLOSURE_CTES + f"""
SELECT doc_id, cluster_id,
       CASE WHEN {_H48.format(e="'split:' || CAST(cluster_id AS VARCHAR)")} % {_SPLIT_MOD} = 0
            THEN 'val' ELSE 'train' END AS split
FROM clusters
ORDER BY doc_id
"""


@register("split_assign_leakage_free", oracle=_SPLIT_ASSIGN_ORACLE, driver=False)
def split_assign_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-keyed train/val split assignment — the FIX for the
    leakage ``split_leakage_audit`` measures: hash the duplicate-
    CLUSTER representative (not the document), so every member of a
    near-dup cluster lands in the same split and zero near-dup pairs
    can cross the boundary (tests/test_split_contrastive.py re-runs the
    audit's crossing filter against this assignment and asserts zero).

    Same seed string and modulus as the audit: a singleton document's
    cluster_id is its own doc_id, so untouched docs keep the exact
    split the naive assignment gave them — only duplicate-cluster
    members move (onto their representative's split).

    Shape: the dedup pipeline's own shuffles plus one map-side hash —
    assignment is a pure function of (seed, cluster_id), reproducible
    across engines, runs, and incremental reruns. At 100 TB the
    cluster map is the persisted table ``dedup_clusters_incremental``
    maintains; assignment stays a map-side projection over it."""
    from pyspark_big_data_spark.functions.text import hash48

    labels = dedup_clusters(spark, sf_dir)
    split = F.when(
        hash48(F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))) % _SPLIT_MOD
        == 0,
        F.lit("val"),
    ).otherwise(F.lit("train"))
    return labels.select("doc_id", "cluster_id", split.alias("split")).orderBy("doc_id")


# Build-once cache of the persisted cluster-map artifact per corpus —
# the steady state dedup_clusters_incremental maintains batch by batch.
# Keyed by sf_dir so every caller (driver, bench, tests) against the
# same corpus shares one build; the map itself lives on disk like the
# minhash index does.
_CLUSTER_MAP_DIRS: dict[str, str] = {}


def persisted_cluster_map_dir(spark: SparkSession, sf_dir: str) -> str:
    """Return (building on first use) the directory of the persisted
    (doc_id, cluster_id) parquet map for ``sf_dir`` — the artifact the
    incremental maintenance path owns. Built here via
    dedup_clusters_incremental so the persisted rows are exactly what
    the steady-state pipeline would have on disk."""
    from pyspark_big_data_spark.io import session_tmpdir

    if sf_dir not in _CLUSTER_MAP_DIRS:
        d = session_tmpdir("cluster_map_")
        dedup_clusters_incremental(spark, sf_dir).write.mode("overwrite").parquet(d)
        _CLUSTER_MAP_DIRS[sf_dir] = d
    return _CLUSTER_MAP_DIRS[sf_dir]


@register("split_assign_from_map", oracle=_SPLIT_ASSIGN_ORACLE, driver=False)
def split_assign_from_map(
    spark: SparkSession, sf_dir: str, map_dir: str | None = None
) -> DataFrame:
    """STEADY-STATE cluster-keyed split assignment — the shape users
    actually run at 100 TB: a map-side hash PROJECTION over the
    persisted cluster map that ``dedup_clusters_incremental`` maintains,
    never a recompute of the minhash → pairs → connected-components
    chain (which ``split_assign_leakage_free`` demonstrates end to end
    and pays 8+ s for at sf0.1). Plan: one parquet scan + one md5
    expression — no join, no shuffle, no corpus touch.

    Same oracle as the full-chain twin (the recursive-closure CTEs over
    the recomputed pairs), so the driver verifies that the PERSISTED
    map rows still agree with a from-scratch closure — exactly the
    index-vs-recompute differential the incremental dedup queries pin.
    ``map_dir`` overrides the build-once artifact for tests/ops."""
    from pyspark_big_data_spark.functions.text import hash48

    if map_dir is None:
        map_dir = persisted_cluster_map_dir(spark, sf_dir)
    labels = spark.read.parquet(map_dir)
    split = F.when(
        hash48(F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))) % _SPLIT_MOD
        == 0,
        F.lit("val"),
    ).otherwise(F.lit("train"))
    return labels.select("doc_id", "cluster_id", split.alias("split")).orderBy("doc_id")


_SOFT_WEIGHTS_ORACLE = _CLOSURE_CTES + """
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       ROUND(CAST(1.0 AS DOUBLE) / COUNT(*) OVER (PARTITION BY cluster_id), 6)
           AS weight
FROM clusters ORDER BY doc_id
"""


@register("dedup_soft_weights", oracle=_SOFT_WEIGHTS_ORACLE, driver=False)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: instead of DROPPING near-duplicates, keep
    every document and down-weight each by 1/|cluster| so a cluster of
    n near-dups contributes exactly one document's worth of sampling
    mass (SlimPajama-style weighting; the soft alternative to
    ``dedup_near_survivors``). Trainers that sample by weight see the
    same effective mixture as hard dedup without losing the intra-
    cluster variation.

    Invariant (pinned in tests/test_split_contrastive.py): the weights
    sum to the number of clusters, i.e. the corpus mass after
    weighting == the corpus mass after hard dedup.

    Shape: the dedup pipeline's shuffles plus ONE extra cluster-keyed
    window (count over cluster_id) — no join, no second corpus scan.
    At 100 TB the cluster map is the persisted table
    ``dedup_clusters_incremental`` maintains, so steady-state weighting
    is a single window over that map, never a recompute. Oracle reuses
    the shared recursive-closure CTE chain so Spark and SQL cannot
    drift on cluster membership."""
    labels = dedup_clusters(spark, sf_dir)
    return _soft_weights_over(labels)


def _soft_weights_over(labels: DataFrame) -> DataFrame:
    w = Window.partitionBy("cluster_id")
    size = F.count(F.lit(1)).over(w)
    return labels.select(
        "doc_id",
        "cluster_id",
        size.alias("cluster_size"),
        F.round(F.lit(1.0) / size, 6).alias("weight"),
    ).orderBy("doc_id")


@register("dedup_soft_weights_from_map", oracle=_SOFT_WEIGHTS_ORACLE)
def dedup_soft_weights_from_map(
    spark: SparkSession, sf_dir: str, map_dir: str | None = None
) -> DataFrame:
    """STEADY-STATE soft dedup weighting — the 100 TB shape: ONE
    cluster-keyed window over the persisted cluster map that
    ``dedup_clusters_incremental`` maintains, never a recompute of the
    minhash → pairs → connected-components chain (its full-chain twin
    ``dedup_soft_weights`` keeps that representative shape). Plan: one
    parquet scan of the (doc_id, cluster_id) map + one window — no
    corpus touch, no join; at 100 TB the map is ~1e-3 of corpus bytes.

    Same recursive-closure oracle as the full-chain twin, so the driver
    verifies the PERSISTED map still produces from-scratch-identical
    weights — the same projection-vs-recompute differential
    ``split_assign_from_map`` pins for split assignment."""
    if map_dir is None:
        map_dir = persisted_cluster_map_dir(spark, sf_dir)
    return _soft_weights_over(spark.read.parquet(map_dir))
