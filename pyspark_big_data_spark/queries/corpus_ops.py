"""Corpus-level training-data operations over the documents table:
BM25 retrieval, C4-style global span dedup, PII scrubbing, and
deterministic (hash-seeded) sampling for dataset mixing.

These extend the reference's query surface with the operations a
large-scale LLM training-data pipeline runs between raw crawl and
training mix (SURVEY.md §7 M6 extension surface). Everything is pure
Column expressions — no Python workers — with DuckDB oracle twins.

Exactness recipes (see PERFORMANCE.md):
- counts stay integer end-to-end (CAST AS BIGINT in DuckDB, whose SUM
  otherwise widens to HUGEINT);
- double math (BM25 score) is a FIXED-ORDER expression over integer
  inputs — never a float aggregate — so Spark and DuckDB evaluate the
  same IEEE operation sequence; final round(…, 6) absorbs ln() ulps;
- hash-seeded sampling uses the portable md5 arithmetic
  (functions/text.py::hash48) so the sample is reproducible across
  engines, runs, and partitionings — which is the whole point at scale
  (TABLESAMPLE/rand() are neither).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.functions import text as TX
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"  # DuckDB side
_TOKS = f"string_split({_NORM}, ' ')"

# ---------------------------------------------------------------------------
# BM25 top-k retrieval
# ---------------------------------------------------------------------------

BM25_TERMS = ("vector", "merge", "stream")  # fixed query, mixed document freq
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def bm25_scored_cte() -> str:
    """DuckDB CTE chain ending in ``scored(doc_id, dl, tf_*, score)`` —
    every document's rounded BM25 score for the fixed term set. Shared
    by the bm25_topk oracle and the hybrid-RRF oracle so the lexical
    ranker cannot drift between the two."""
    tf_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf_{t}"
        for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in BM25_TERMS
    )
    tf_out = ", ".join(f"tf_{t}" for t in BM25_TERMS)

    def cast(x: str) -> str:
        return f"CAST({x} AS DOUBLE)"

    parts = []
    for t in BM25_TERMS:
        idf = f"ln(1.0 + (({cast('n_docs')} - {cast(f'df_{t}')} + 0.5) / ({cast(f'df_{t}')} + 0.5)))"
        dlnorm = f"({cast('dl')} * {cast('n_docs')} / {cast('sum_dl')})"
        tfc = (
            f"({cast(f'tf_{t}')} * {BM25_K1 + 1.0}"
            f" / ({cast(f'tf_{t}')} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * {dlnorm})))"
        )
        parts.append(f"({idf} * {tfc})")
    score = "(" + " + ".join(parts) + ")"
    return f"""
WITH toks AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
per_doc AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl, {tf_cols}
    FROM toks GROUP BY doc_id
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl, {df_cols}
    FROM per_doc
),
scored AS (
    SELECT doc_id, dl, {tf_out}, ROUND({score}, 6) AS score
    FROM per_doc, stats
)"""


def _bm25_oracle() -> str:
    tf_out = ", ".join(f"tf_{t}" for t in BM25_TERMS)
    return f"""
{bm25_scored_cte()}
SELECT doc_id, dl, {tf_out}, score
FROM scored
WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT {BM25_TOPK}
"""


@register("bm25_topk", oracle=_bm25_oracle())
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k document retrieval for a fixed query-term set.

    Shape: one token explode (map-side) -> ONE shuffle (groupBy doc_id
    with conditional integer tf aggregates — no per-term joins) -> a
    broadcast of the 1-row corpus stats -> fixed-order float scoring ->
    global top-k. At 100 TB the per-doc aggregate is partial+final and
    the top-k is a TakeOrderedAndProject (no full sort). Integer tf/df
    keep the differential oracle exact; ln() ulps are absorbed by
    round(score, 6).
    """
    docs = read_table(spark, sf_dir, "documents")
    return (
        bm25_scored(docs)
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


def bm25_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, tf_*, score): every document's rounded BM25 score
    for the fixed BM25_TERMS query — the Spark twin of
    bm25_scored_cte(), shared with the hybrid-RRF fusion."""
    toks = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0)).alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int")).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    # scalar attach: broadcast of the ONE-row corpus-stats frame. Plans
    # as BroadcastNestedLoopJoin, which with a 1-row build side is a
    # map-side constant attach (zero blowup) — allowlisted as
    # _SCALAR_BROADCAST_OK in tests/test_plan_guardrails.py. (A literal
    # equi-key gets constant-folded by Catalyst right back into BNL, so
    # there is no honest way to spell this as a hash join.)
    joined = per_doc.crossJoin(F.broadcast(stats))

    def d(c) -> F.Column:
        return F.col(c).cast("double")

    score = F.lit(0.0)
    terms_score = []
    for t in BM25_TERMS:
        idf = F.log(
            F.lit(1.0) + (d("n_docs") - d(f"df_{t}") + F.lit(0.5)) / (d(f"df_{t}") + F.lit(0.5))
        )
        dlnorm = d("dl") * d("n_docs") / d("sum_dl")
        tfc = (d(f"tf_{t}") * F.lit(BM25_K1 + 1.0)) / (
            d(f"tf_{t}") + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dlnorm)
        )
        terms_score.append(idf * tfc)
    # fixed left-to-right order, matching the oracle's parenthesization
    score = terms_score[0] + terms_score[1] + terms_score[2]
    return joined.select(
        "doc_id",
        "dl",
        *[F.col(f"tf_{t}") for t in BM25_TERMS],
        F.round(score, 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# C4-style global span dedup
# ---------------------------------------------------------------------------

SPAN_W = 8  # tokens per span (C4 dedupes 3-sentence spans; tokens here)
# survivor key = doc_id * 1e6 + chunk_no: valid while chunks/doc < 1e6
# (docs of < 8M tokens) and doc_id < 9.2e12 — both hold at 100 TB.
_SPAN_KEY_SCALE = 1_000_000


def _span_oracle() -> str:
    return f"""
WITH d AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents
),
e AS (
    SELECT doc_id, toks,
           unnest(generate_series(0, CAST(ceil(greatest(len(toks), 1) / {float(SPAN_W)}) AS BIGINT) - 1)) AS c
    FROM d
),
chunks AS (
    SELECT doc_id, c AS chunk_no,
           md5(array_to_string(list_slice(toks, c * {SPAN_W} + 1, c * {SPAN_W} + {SPAN_W}), ' ')) AS fp
    FROM e
),
marked AS (
    SELECT doc_id, chunk_no, fp,
           (doc_id * {_SPAN_KEY_SCALE} + chunk_no) AS k,
           MIN(doc_id * {_SPAN_KEY_SCALE} + chunk_no) OVER (PARTITION BY fp) AS min_k
    FROM chunks
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN k = min_k THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN k = min_k THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       ROUND(CAST(SUM(CASE WHEN k = min_k THEN 0 ELSE 1 END) AS DOUBLE) / COUNT(*), 6) AS dup_ratio
FROM marked
GROUP BY doc_id
ORDER BY doc_id
"""


@register("span_dedup_chunks", oracle=_span_oracle())
def span_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global span dedup: fixed W-token chunks, hashed, deduped
    across the WHOLE corpus (survivor = lexicographic-min (doc, chunk)),
    reported as per-document kept/dropped counts.

    Shape: chunking is map-side only (slice on the token array — no
    per-token explode); one window shuffle keyed by the 16-byte chunk
    fingerprint; one groupBy doc_id. The same two-shuffle shape C4/
    RefinedWeb-scale dedup uses. Boilerplate chunks (hot fp keys) are
    the skew hazard — AQE skew handling applies, and W tunes
    granularity.
    """
    docs = read_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
    n_chunks = F.ceil(F.greatest(F.size("toks"), F.lit(1)) / F.lit(float(SPAN_W))).cast("long")
    e = d.select(
        "doc_id", "toks", F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("c")
    )
    chunks = e.select(
        "doc_id",
        F.col("c").alias("chunk_no"),
        F.md5(
            F.array_join(F.slice("toks", F.col("c") * SPAN_W + 1, F.lit(SPAN_W)), " ")
        ).alias("fp"),
    )
    k = F.col("doc_id") * _SPAN_KEY_SCALE + F.col("chunk_no")
    marked = chunks.select(
        "doc_id",
        "chunk_no",
        k.alias("k"),
        F.min(k).over(Window.partitionBy("fp")).alias("min_k"),
    )
    kept = F.when(F.col("k") == F.col("min_k"), 1).otherwise(0)
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(kept).alias("n_kept"),
            F.sum(F.lit(1) - kept).alias("n_dropped"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_kept",
            "n_dropped",
            F.round(
                F.col("n_dropped").cast("double") / F.col("n_chunks").cast("double"), 6
            ).alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Exact-substring duplicate SPANS (Lee et al. "Deduplicating Training
# Data Makes Language Models Better" shape): sliding k-gram duplicate
# detection + per-doc interval merge -> the token ranges to CUT, not
# just per-doc counts (the refinement over fixed-chunk span_dedup).
# ---------------------------------------------------------------------------

_DSPAN_K = 8  # k-gram width; duplicated runs >= k tokens are caught


def _dup_span_oracle() -> str:
    return f"""
WITH d AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents
),
g AS (
    SELECT doc_id,
           unnest(generate_series(1, greatest(len(toks) - {_DSPAN_K - 1}, 0))) AS pos,
           toks
    FROM d
),
grams AS (
    SELECT doc_id, pos,
           md5(array_to_string(list_slice(toks, pos, pos + {_DSPAN_K - 1}), ' ')) AS fp
    FROM g
),
marked AS (
    SELECT doc_id, pos,
           (doc_id * {_SPAN_KEY_SCALE} + pos) AS k,
           MIN(doc_id * {_SPAN_KEY_SCALE} + pos) OVER (PARTITION BY fp) AS min_k
    FROM grams
),
dup AS (SELECT doc_id, pos FROM marked WHERE k <> min_k),
islands AS (
    SELECT doc_id, pos,
           CASE WHEN pos > COALESCE(MAX(pos + {_DSPAN_K - 1}) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
                THEN 1 ELSE 0 END AS new_island
    FROM dup
),
numbered AS (
    SELECT doc_id, pos,
           SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM islands
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {_DSPAN_K - 1} AS BIGINT) AS span_end,
       CAST(MAX(pos) + {_DSPAN_K - 1} - MIN(pos) + 1 AS BIGINT) AS span_tokens
FROM numbered
GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""


@register("dup_span_extract", oracle=_dup_span_oracle(), driver=False)
def dup_span_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate spans: every {_DSPAN_K}-token window
    hashed at EVERY position (sliding, not strided — a duplicated run of
    any length ≥ k is caught wherever it starts), global survivor keeps
    the lexicographic-min (doc, pos) occurrence, and each doc's
    non-survivor positions merge into maximal [span_start, span_end]
    token intervals (overlapping/adjacent windows coalesce via the
    classic running-max island scan). The output is the CUT LIST a
    corpus-rewrite pass consumes — the operational product of Lee-et-al
    style dedup, one level finer than span_dedup_chunks' counts.

    Cost shape: k-gram generation is map-side (array slice per position,
    ~L rows/doc like shingling); one shuffle keyed by the 16-byte gram
    fingerprint (window MIN — skew on boilerplate grams is the hazard,
    AQE skew handling applies); one shuffle keyed by doc_id for the
    island merge. No stage is quadratic in anything."""
    docs = read_table(spark, sf_dir, "documents")
    # Docs shorter than k tokens emit no windows. The filter is load-
    # bearing, not an optimization: Spark's sequence(1, 0) DESCENDS
    # ([1, 0], step defaults to -1 when start > stop), and pos=0 then
    # throws in slice (SQL arrays are 1-based) — whereas the oracle's
    # generate_series(1, 0) is empty. Filter first so both are empty.
    d = docs.select("doc_id", TX.tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= _DSPAN_K
    )
    g = d.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(1), F.size("toks") - (_DSPAN_K - 1))).alias("pos"),
    )
    grams = g.select(
        "doc_id",
        "pos",
        F.md5(F.array_join(F.slice("toks", F.col("pos"), _DSPAN_K), " ")).alias("fp"),
    )
    key = F.col("doc_id") * _SPAN_KEY_SCALE + F.col("pos")
    marked = grams.select(
        "doc_id", "pos", key.alias("k"), F.min(key).over(Window.partitionBy("fp")).alias("min_k")
    )
    dup = marked.filter(F.col("k") != F.col("min_k")).select("doc_id", "pos")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dup.select(
        "doc_id",
        "pos",
        F.when(
            F.col("pos")
            > F.coalesce(F.max(F.col("pos") + (_DSPAN_K - 1)).over(w_prev), F.lit(-1)) + 1,
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = islands.select("doc_id", "pos", F.sum("new_island").over(w_run).alias("island"))
    return (
        numbered.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (_DSPAN_K - 1)).cast("long").alias("span_end"),
            (F.max("pos") + (_DSPAN_K - 1) - F.min("pos") + 1).cast("long").alias("span_tokens"),
        )
        .select("doc_id", "span_start", "span_end", "span_tokens")
        .orderBy("doc_id", "span_start")
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Portable regexes (Java regex ∩ RE2): char classes + bounded reps only.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+1-555-[0-9]+"

# The synthetic corpus carries no PII, so the query plants deterministic
# PII inline (varying per doc_id) and then scrubs it — the redaction
# machinery (count + replace + fingerprint) is what's under test.
_PLANT_DD = (
    "text || (CASE WHEN doc_id % 3 <> 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END)"
    " || (CASE WHEN doc_id % 2 = 0 THEN ' call +1-555-' || CAST(doc_id % 10000 AS VARCHAR) ELSE '' END)"
)

_PII_ORACLE = f"""
WITH planted AS (
    SELECT doc_id, {_PLANT_DD} AS synth FROM documents
),
scrubbed AS (
    SELECT doc_id, synth,
           regexp_replace(regexp_replace(synth, '{EMAIL_RE}', '<EMAIL>', 'g'), '{PHONE_RE}', '<PHONE>', 'g') AS clean
    FROM planted
)
SELECT doc_id,
       CAST(length(regexp_extract_all(synth, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(length(regexp_extract_all(synth, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(clean) AS scrub_fp,
       CAST(length(clean) AS BIGINT) AS scrub_len
FROM scrubbed
ORDER BY doc_id
"""


@register("pii_scrub", oracle=_PII_ORACLE)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: regex count + replace of emails/phones, with a
    post-scrub content fingerprint. Pure map-side column expressions —
    runs at scan speed at any scale; regex complexity is the only knob.
    """
    docs = read_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 != 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(" call +1-555-"), (F.col("doc_id") % 10000).cast("string")),
        ).otherwise(F.lit("")),
    )
    clean = F.regexp_replace(
        F.regexp_replace(synth, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(synth, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(synth, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(clean).alias("scrub_fp"),
        F.length(clean).cast("long").alias("scrub_len"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Deterministic sampling for dataset mixing
# ---------------------------------------------------------------------------

SAMPLE_SEED = "seed42:"
SAMPLE_PCT = 10  # keep buckets 0..9 of 100
QUOTA_SEED = "mix:"
QUOTA_K = 20  # docs per (lang, source) stratum

_H48_DD = "(('0x' || substr(md5({e}), 1, 12))::BIGINT)"

_HASH_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, source,
       ({_H48_DD.format(e=f"'{SAMPLE_SEED}' || CAST(doc_id AS VARCHAR)")} % 100) AS bucket
FROM documents
WHERE ({_H48_DD.format(e=f"'{SAMPLE_SEED}' || CAST(doc_id AS VARCHAR)")} % 100) < {SAMPLE_PCT}
ORDER BY doc_id
"""


@register("sample_hash_bucket", oracle=_HASH_SAMPLE_ORACLE)
def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {SAMPLE_PCT}% sample: hash-mod bucketing on a seeded
    key. Unlike rand()/TABLESAMPLE, membership is a pure function of
    (seed, doc_id): reproducible across engines, runs, partitionings,
    and incremental reruns — the property a 100 TB pipeline needs for
    resumable sampling. Map-side filter; pushes to the scan."""
    docs = read_table(spark, sf_dir, "documents")
    h = TX.hash48(F.concat(F.lit(SAMPLE_SEED), F.col("doc_id").cast("string")))
    bucket = (h % 100).alias("bucket")
    return (
        docs.select("doc_id", "lang", "source", bucket)
        .filter(F.col("bucket") < SAMPLE_PCT)
        .orderBy("doc_id")
    )


_QUOTA_ORACLE = f"""
SELECT doc_id, lang, source, rn
FROM (
    SELECT doc_id, lang, source,
           ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY md5('{QUOTA_SEED}' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
)
WHERE rn <= {QUOTA_K}
ORDER BY lang, source, rn
"""


@register("sample_stratified_quota", oracle=_QUOTA_ORACLE)
def sample_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified quota sampling for training-mix construction: take the
    first QUOTA_K docs per (lang, source) stratum in seeded-hash order
    (a deterministic shuffle — md5 as the portable RNG).

    Shape: ONE window shuffle keyed by the strata. At 100 TB, strata
    counts are bounded (langs x sources), each stratum's rank is
    computed within its partition group, and only K rows per stratum
    survive — the canonical domain-mixing selector, reproducible
    bit-for-bit across engines.
    """
    docs = read_table(spark, sf_dir, "documents")
    order_key = F.md5(F.concat(F.lit(QUOTA_SEED), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang", "source").orderBy(order_key, F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= QUOTA_K)
        .orderBy("lang", "source", "rn")
    )


# ---------------------------------------------------------------------------
# Vocabulary statistics
# ---------------------------------------------------------------------------

VOCAB_TOP = 100

_VOCAB_ORACLE = f"""
SELECT tok,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(COUNT(*) AS BIGINT) AS cf
FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
GROUP BY tok
ORDER BY cf DESC, tok
LIMIT {VOCAB_TOP}
"""


@register("vocab_stats", oracle=_VOCAB_ORACLE)
def vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: document frequency + collection frequency per
    term, top-VOCAB_TOP by cf (the tokenizer-/BPE-training input stage).
    One explode + one shuffle keyed by term; the top-k is a
    TakeOrderedAndProject, no full sort."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(
            F.count_distinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("cf"),
        )
        .orderBy(F.col("cf").desc(), "tok")
        .limit(VOCAB_TOP)
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

PROBE_MOD = 11  # doc_id % PROBE_MOD == 0 plays the held-out benchmark set
CONTAM_MIN_SHARED = 2  # shared SPAN_W-token chunks to flag containment


def _chunk_fps_sql(rel: str) -> str:
    """DuckDB chunk fingerprints of a documents-shaped relation."""
    return f"""
    SELECT doc_id,
           md5(array_to_string(list_slice(toks, c * {SPAN_W} + 1, c * {SPAN_W} + {SPAN_W}), ' ')) AS fp
    FROM (
        SELECT doc_id, toks,
               unnest(generate_series(0, CAST(ceil(greatest(len(toks), 1) / {float(SPAN_W)}) AS BIGINT) - 1)) AS c
        FROM (SELECT doc_id, {_TOKS} AS toks FROM {rel})
    )
"""


_DECONTAM_ORACLE = f"""
WITH probe_chunks AS (
    SELECT DISTINCT doc_id, fp FROM ({_chunk_fps_sql("(SELECT * FROM documents WHERE doc_id % {M} = 0)".format(M=PROBE_MOD))})
),
corpus_chunks AS (
    SELECT DISTINCT doc_id, fp FROM ({_chunk_fps_sql("(SELECT * FROM documents WHERE doc_id % {M} <> 0)".format(M=PROBE_MOD))})
)
SELECT c.doc_id AS doc_id,
       MIN(p.doc_id) AS probe_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared_chunks
FROM corpus_chunks c JOIN probe_chunks p ON c.fp = p.fp
GROUP BY c.doc_id
HAVING COUNT(*) >= {CONTAM_MIN_SHARED}
ORDER BY c.doc_id
"""


def _chunk_fps(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) distinct SPAN_W-token chunk fingerprints (map-side)."""
    d = docs.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
    n_chunks = F.ceil(F.greatest(F.size("toks"), F.lit(1)) / F.lit(float(SPAN_W))).cast("long")
    e = d.select(
        "doc_id", "toks", F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("c")
    )
    return e.select(
        "doc_id",
        F.md5(F.array_join(F.slice("toks", F.col("c") * SPAN_W + 1, F.lit(SPAN_W)), " ")).alias("fp"),
    ).distinct()


@register("decontaminate_vs_probes", oracle=_DECONTAM_ORACLE)
def decontaminate_vs_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents that contain
    held-out evaluation content — here, >= CONTAM_MIN_SHARED shared
    W-token chunks with any probe document (exact duplicates share all
    chunks, so containment subsumes exact-match decontamination).

    Shape: probe chunks are a small set -> Catalyst broadcasts them into
    the fp equi-join; the corpus side is one map-side chunking pass.
    At 100 TB the probe side (a benchmark suite) stays broadcastable by
    construction — this is the canonical decontamination plan."""
    docs = read_table(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") % PROBE_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % PROBE_MOD != 0)
    pc = _chunk_fps(probes).select(F.col("doc_id").alias("probe_id"), "fp")
    cc = _chunk_fps(corpus)
    return (
        cc.join(F.broadcast(pc), "fp")
        .groupBy("doc_id")
        .agg(
            F.min("probe_id").alias("probe_id"),
            F.count(F.lit(1)).alias("n_shared_chunks"),
        )
        .filter(F.col("n_shared_chunks") >= CONTAM_MIN_SHARED)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Mixture upsampling
# ---------------------------------------------------------------------------

# per-language mixture weights: repeat floor(w) times, +1 with
# probability frac(w) decided by the seeded hash bucket (deterministic
# fractional upsampling — reruns produce the identical mixture)
MIX_WEIGHTS = {"en": 2.5, "de": 1.0, "es": 1.5, "fr": 0.5, "zh": 2.0}
MIX_SEED = "up:"

_mix_case_dd = "CASE " + " ".join(
    f"WHEN lang = '{lg}' THEN {w}" for lg, w in sorted(MIX_WEIGHTS.items())
) + " ELSE 1.0 END"

_MIX_ORACLE = f"""
WITH weighted AS (
    SELECT doc_id, lang,
           CAST(floor({_mix_case_dd}) AS BIGINT)
           + (CASE WHEN ({_H48_DD.format(e=f"'{MIX_SEED}' || CAST(doc_id AS VARCHAR)")} % 100)
                        < CAST(round(({_mix_case_dd} - floor({_mix_case_dd})) * 100) AS BIGINT)
              THEN 1 ELSE 0 END) AS n_copies
    FROM documents
)
SELECT doc_id, lang, unnest(generate_series(1, n_copies)) AS copy_no
FROM weighted
WHERE n_copies >= 1
ORDER BY doc_id, copy_no
"""


@register("mixture_upsample", oracle=_MIX_ORACLE)
def mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture upsampling: physically repeat each document
    per its language weight (floor + hash-seeded fractional part).
    Map-side explode only — no shuffle; the hash-bucket fractional draw
    makes the sampled mixture a pure function of (seed, doc_id), so a
    resumed or re-run 100 TB job regenerates the identical mixture."""
    docs = read_table(spark, sf_dir, "documents")
    w = F.lit(1.0)
    for lg, wt in sorted(MIX_WEIGHTS.items()):
        w = F.when(F.col("lang") == lg, F.lit(wt)).otherwise(w)
    bucket = TX.hash48(F.concat(F.lit(MIX_SEED), F.col("doc_id").cast("string"))) % 100
    frac_pct = F.round((w - F.floor(w)) * 100).cast("long")
    n_copies = F.floor(w).cast("long") + F.when(bucket < frac_pct, 1).otherwise(0)
    return (
        docs.select("doc_id", "lang", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") >= 1)
        .select("doc_id", "lang", F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias("copy_no"))
        .orderBy("doc_id", "copy_no")
    )


# ---------------------------------------------------------------------------
# Sequence packing (concat-then-chunk)
# ---------------------------------------------------------------------------

PACK_BUDGET = 256  # tokens per training sequence
PACK_NSHARDS = 8  # parallel packing streams per language
PACK_SEED = "pk:"

_PACK_ORACLE = f"""
WITH t AS (
    SELECT doc_id, lang,
           CAST(len({_TOKS}) AS BIGINT) AS n_toks,
           ({_H48_DD.format(e="'" + PACK_SEED + "' || CAST(doc_id AS VARCHAR)")} % {PACK_NSHARDS}) AS shard
    FROM documents
),
c AS (
    SELECT doc_id, lang, shard, n_toks,
           CAST(SUM(n_toks) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
    FROM t
),
assigned AS (
    SELECT lang, shard, n_toks, cum,
           CAST(floor((cum - n_toks) * 1.0 / {PACK_BUDGET}) AS BIGINT) AS pack_id,
           CASE WHEN CAST(floor((cum - 1) * 1.0 / {PACK_BUDGET}) AS BIGINT)
                     > CAST(floor((cum - n_toks) * 1.0 / {PACK_BUDGET}) AS BIGINT)
                THEN 1 ELSE 0 END AS splits
    FROM c
)
SELECT lang, shard, pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS pack_tokens,
       CAST(SUM(splits) AS BIGINT) AS n_split_docs
FROM assigned
GROUP BY lang, shard, pack_id
ORDER BY lang, shard, pack_id
"""


@register("pack_sequences", oracle=_PACK_ORACLE)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in deterministic
    order and chunk the token stream into PACK_BUDGET-token training
    sequences; each document is assigned to the pack where it STARTS,
    and ``n_split_docs`` counts documents straddling a pack boundary.

    The scale design is the sharding: packing is an inherently ordered
    (cumulative-sum) operation, so a single global window would funnel
    100 TB through one reducer per language. Sharding by a seeded hash
    of doc_id first gives PACK_NSHARDS independent, deterministic
    packing streams per language — the window shuffle is keyed by
    (lang, shard) and parallelizes; raise PACK_NSHARDS to match the
    cluster. The cumulative sum itself is one running-window pass and
    the final per-pack rollup is a partial+final aggregate."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        F.size(TX.tokens(F.col("text"))).cast("long").alias("n_toks"),
        (TX.hash48(F.concat(F.lit(PACK_SEED), F.col("doc_id").cast("string"))) % PACK_NSHARDS).alias("shard"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_toks").over(w))
    start_pack = F.floor((F.col("cum") - F.col("n_toks")) / F.lit(float(PACK_BUDGET))).cast("long")
    end_pack = F.floor((F.col("cum") - 1) / F.lit(float(PACK_BUDGET))).cast("long")
    assigned = c.select(
        "lang",
        "shard",
        "n_toks",
        start_pack.alias("pack_id"),
        F.when(end_pack > start_pack, 1).otherwise(0).alias("splits"),
    )
    return (
        assigned.groupBy("lang", "shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("pack_tokens"),
            F.sum("splits").alias("n_split_docs"),
        )
        .orderBy("lang", "shard", "pack_id")
    )


# ---------------------------------------------------------------------------
# Repetition quality metrics (Gopher-style)
# ---------------------------------------------------------------------------

REP_MAX_TOP_TOKEN_FRAC = 0.11  # ~75th pct on the synthetic corpus
REP_MAX_TOP_BIGRAM_FRAC = 0.05

_REP_ORACLE = f"""
WITH base AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents
),
toks AS (
    SELECT doc_id, unnest(toks) AS tok FROM base
),
tc AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY doc_id, tok
),
td AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_toks,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(MAX(c) AS BIGINT) AS top_tok
    FROM tc GROUP BY doc_id
),
bgs AS (
    SELECT doc_id, list_extract(toks, p) || ' ' || list_extract(toks, p + 1) AS bg
    FROM (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS p
        FROM base WHERE len(toks) >= 2
    )
),
bc AS (
    SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS c FROM bgs GROUP BY doc_id, bg
),
bd AS (
    SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bg FROM bc GROUP BY doc_id
)
SELECT td.doc_id AS doc_id, n_toks, n_distinct,
       ROUND(CAST(n_distinct AS DOUBLE) / CAST(n_toks AS DOUBLE), 6) AS distinct_frac,
       ROUND(CAST(top_tok AS DOUBLE) / CAST(n_toks AS DOUBLE), 6) AS top_token_frac,
       CASE WHEN n_toks > 1
            THEN ROUND(CAST(COALESCE(top_bg, 0) AS DOUBLE) / CAST(n_toks - 1 AS DOUBLE), 6)
            ELSE 0.0 END AS top_bigram_frac,
       CAST(CASE WHEN CAST(top_tok AS DOUBLE) / CAST(n_toks AS DOUBLE) <= {REP_MAX_TOP_TOKEN_FRAC}
                  AND CAST(COALESCE(top_bg, 0) AS DOUBLE) / CAST(GREATEST(n_toks - 1, 1) AS DOUBLE) <= {REP_MAX_TOP_BIGRAM_FRAC}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM td LEFT JOIN bd ON td.doc_id = bd.doc_id
ORDER BY doc_id
"""


@register("repetition_metrics", oracle=_REP_ORACLE)
def repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality: per-document distinct-token
    ratio, most-frequent-token fraction, and most-frequent-bigram
    fraction, with a keep/drop flag at fixed thresholds (the repetition
    rules of the Gopher/MassiveText and C4 cleaning recipes).

    Shape: every shuffle is keyed by doc_id — explode is map-side, the
    (doc_id, gram) counts are partial+final aggregates, and the final
    token/bigram join is a same-key equi-join. No global state, so this
    runs at scan speed on 100 TB. Fractions are a single IEEE division
    of two integers (bit-identical across engines); round(6) is belt
    and braces."""
    docs = read_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
    tc = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    td = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_toks"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_tok"),
    )
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
    )
    bd = (
        base.filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bg"))
    )
    top_tok_frac = F.col("top_tok").cast("double") / F.col("n_toks").cast("double")
    top_bg_frac = F.coalesce(F.col("top_bg"), F.lit(0)).cast("double") / F.greatest(
        F.col("n_toks") - 1, F.lit(1)
    ).cast("double")
    return (
        td.join(bd, "doc_id", "left")
        .select(
            "doc_id",
            "n_toks",
            "n_distinct",
            F.round(F.col("n_distinct").cast("double") / F.col("n_toks").cast("double"), 6).alias(
                "distinct_frac"
            ),
            F.round(top_tok_frac, 6).alias("top_token_frac"),
            F.when(
                F.col("n_toks") > 1,
                F.round(
                    F.coalesce(F.col("top_bg"), F.lit(0)).cast("double")
                    / (F.col("n_toks") - 1).cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
            F.when(
                (top_tok_frac <= REP_MAX_TOP_TOKEN_FRAC) & (top_bg_frac <= REP_MAX_TOP_BIGRAM_FRAC),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Bigram LM fluency scoring (the CCNet-style LM quality filter, exact)
# ---------------------------------------------------------------------------

_BIGRAM_ORACLE = f"""
WITH d AS (
    SELECT doc_id, {_TOKS} AS arr FROM documents WHERE len({_TOKS}) >= 2
),
posn AS (
    SELECT doc_id, arr, unnest(generate_series(2, len(arr))) AS pos FROM d
),
big AS (
    SELECT doc_id, arr[pos - 1] AS prev, arr[pos] AS tok FROM posn
),
n2 AS (
    SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS n2 FROM big GROUP BY prev, tok
),
n1 AS (
    SELECT prev, CAST(COUNT(*) AS BIGINT) AS n1 FROM big GROUP BY prev
),
voc AS (
    SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
    FROM (SELECT unnest(arr) AS tok FROM d)
),
scored AS (
    SELECT b.doc_id,
           ln(CAST(n2.n2 + 1 AS DOUBLE) / CAST(n1.n1 + voc.v AS DOUBLE)) AS lp
    FROM big b
    JOIN n2 ON n2.prev = b.prev AND n2.tok = b.tok
    JOIN n1 ON n1.prev = b.prev
    CROSS JOIN voc
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(CAST(lp AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 6) AS mean_logp
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


@register("bigram_fluency", oracle=_BIGRAM_ORACLE)
def bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log-probability under an add-one-smoothed
    bigram LM trained on the corpus itself — the CCNet-recipe LM quality
    filter (low scores = disfluent/boilerplate docs), with the corpus
    standing in for the external reference LM the env doesn't ship.

    Exactness: bigram extraction is map-side array slicing (explode of
    positions 2..len + element_at — no per-doc window shuffle); counts
    are integers; each smoothed probability is one IEEE double division;
    ln() ulps are absorbed by round(mean, 6) over a decimal-exact sum —
    the same policy as bm25_topk. The vocab size is a 1-row broadcast
    scalar (bm25's pattern, allowlisted).

    Scale: two count aggregates (n2, n1 — partial+final), two equi-joins
    keyed on the bigram/prev, one scalar broadcast. The n2 table is the
    corpus bigram vocabulary — at 100 TB cap it (min-count pruning) or
    hash the keys; nothing here is all-pairs.
    """
    docs = read_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", TX.tokens(F.col("text")).alias("arr")).filter(
        F.size("arr") >= 2
    )
    big = d.select(
        "doc_id", "arr", F.explode(F.sequence(F.lit(2), F.size("arr"))).alias("pos")
    ).select(
        "doc_id",
        F.element_at("arr", F.col("pos") - 1).alias("prev"),
        F.element_at("arr", F.col("pos")).alias("tok"),
    )
    n2 = big.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("n2"))
    n1 = big.groupBy("prev").agg(F.count(F.lit(1)).alias("n1"))
    voc = d.select(F.explode("arr").alias("tok")).agg(
        F.count_distinct("tok").alias("v")
    )
    lp = F.log(
        (F.col("n2") + 1).cast("double") / (F.col("n1") + F.col("v")).cast("double")
    )
    scored = (
        big.join(n2, ["prev", "tok"])
        .join(n1, ["prev"])
        .crossJoin(F.broadcast(voc))
        .select("doc_id", lp.alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.col("lp").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_logp"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# RAG-style overlapping document chunking
# ---------------------------------------------------------------------------

CHUNK_W = 64  # tokens per retrieval chunk
CHUNK_STRIDE = 48  # stride < W -> (W - stride)-token overlap between chunks

_CHUNK_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents
), spans AS (
    SELECT doc_id, toks,
           unnest(generate_series(
               0,
               CAST(ceil(greatest(len(toks) - {CHUNK_W}, 0) * 1.0 / {CHUNK_STRIDE}) AS BIGINT)
           )) AS chunk_no
    FROM toks
)
SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
       CAST(len(list_slice(toks, chunk_no * {CHUNK_STRIDE} + 1,
                           chunk_no * {CHUNK_STRIDE} + {CHUNK_W})) AS BIGINT) AS n_tokens,
       md5(array_to_string(
           list_slice(toks, chunk_no * {CHUNK_STRIDE} + 1,
                      chunk_no * {CHUNK_STRIDE} + {CHUNK_W}), ' ')) AS chunk_md5
FROM spans
ORDER BY doc_id, chunk_no
"""


@register("doc_chunk_overlap", oracle=_CHUNK_ORACLE, driver=False)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping {CHUNK_W}-token chunks at stride {CHUNK_STRIDE} —
    the RAG ingestion shape (overlap keeps sentences that straddle a
    boundary retrievable from both sides), distinct from pack_sequences
    (training packing: disjoint, budget-exact) and span_dedup_chunks
    (disjoint fingerprint spans). Chunk text is emitted as an md5 digest
    so the oracle pins every token of every chunk without shipping text.

    Shape: one tokenize + one map-side explode of chunk indices per doc
    (ceil((len-W)/stride)+1 chunks, always >= 1 so empty docs still get
    their chunk row); no shuffle at all — the sort is presentation-only.
    """
    toks = read_table(spark, sf_dir, "documents").select(
        "doc_id", TX.tokens(F.col("text")).alias("toks")
    )
    n_chunks = (
        F.ceil(
            F.greatest(F.size("toks") - CHUNK_W, F.lit(0)) / F.lit(float(CHUNK_STRIDE))
        ).cast("long")
        + 1
    )
    spans = toks.select(
        "doc_id", "toks", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_no")
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_no") * CHUNK_STRIDE + 1, CHUNK_W)
    return spans.select(
        "doc_id",
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_no")


_TFIDF_TOPN = 3

_TFIDF_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
tf AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok WHERE tok <> '' GROUP BY doc_id, tok
),
idf AS (
    SELECT tok, ln(CAST((SELECT COUNT(*) FROM documents) + 1 AS DOUBLE)
                   / (COUNT(DISTINCT doc_id) + 1)) AS idf
    FROM tok WHERE tok <> '' GROUP BY tok
),
scored AS (
    SELECT tf.doc_id, tf.tok AS term, tf.tf,
           ROUND(tf.tf * idf.idf, 6) AS tfidf6
    FROM tf JOIN idf ON idf.tok = tf.tok
)
SELECT doc_id, term, tf, tfidf6,
       CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT doc_id, term, tf, tfidf6,
           ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tfidf6 DESC, term ASC
           ) AS rnk
    FROM scored
)
WHERE rnk <= {_TFIDF_TOPN}
ORDER BY doc_id, rnk
"""


@register("tfidf_top_terms", oracle=_TFIDF_ORACLE, driver=False)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TFIDF_TOPN} terms per document by tf-idf (smoothed idf =
    ln((N+1)/(df+1))) — the classic keyword extractor, SURVEY §7 M6's
    named text-analysis north star (BM25's ancestor; the repo's BM25
    stack shares the same tf/df machinery and adds saturation +
    length normalization).

    Cross-engine determinism follows the bm25 recipe: ranks and the
    emitted score are computed on ROUND(tfidf, 6), the only ln() in
    the pipeline, so libm ulps cannot flip an order. Scale shape: one
    token shuffle for per-doc tf, one for df (both map-side combined),
    an equi-join on term, and a per-doc top-{_TFIDF_TOPN} window —
    no vocabulary ever collects to the driver."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.count()
    idf = tok.groupBy("tok").agg(
        F.log(
            F.lit(float(n_docs + 1))
            / (F.countDistinct("doc_id") + F.lit(1))
        ).alias("idf")
    )
    scored = tf.join(idf, "tok").select(
        "doc_id",
        F.col("tok").alias("term"),
        F.col("tf").cast("long").alias("tf"),
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf6"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf6").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _TFIDF_TOPN)
        .orderBy("doc_id", "rnk")
    )
