"""DSIR-style data selection with importance resampling.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023 —
public method) picks raw-corpus documents whose hashed-n-gram profile
resembles a TARGET domain: fit two bag-of-hashed-n-gram unigram models
(target vs raw), score every raw document with its log importance
weight Σ_g [ln p_target(bucket(g)) − ln p_raw(bucket(g))], then sample
top-k under Gumbel noise (Gumbel-top-k == sampling without replacement
proportional to the importance weights). It is the standard recipe for
"give me 10 B tokens that look like Wikipedia out of a 100 TB crawl".

Everything is oracle-able by construction: features are the portable
48-bit md5 hash (functions/text.py) bucketed mod ``_BUCKETS``, the
bucket log-ratios are IEEE doubles rounded to 9dp BEFORE the per-doc
sum (which runs in DECIMAL(38,18) — order-independent, so Spark's
partial aggregation and DuckDB's single-threaded sum agree bit-for-bit;
the same ln()-ulp policy as bm25/bigram_fluency), and the Gumbel keys
derive from md5 too (u = (hash48 + 0.5) / 2^48 is exact in a double).

Scale shape: two explodes (unigrams + bigrams) -> one groupBy(bucket)
pair of counts (512 rows) -> broadcast the log-ratio table back over
the feature stream -> one groupBy(doc_id). The corpus is touched once;
no join is ever keyed on anything wider than the 512-row bucket table.
The top-k selection is TakeOrderedAndProject (distributed heap, no
single-partition window); at 100 TB you would instead keep every doc's
``logw`` and threshold on an approx-quantile of the key — noted here so
the driver-verified shape and the production knob stay one line apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.functions import text as TX
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_BUCKETS = 512  # hashed feature space (DSIR uses 10k; 512 keeps the
# bucket table broadcast-trivial at every test SF — a knob, not a law)
_ALPHA = 1  # add-one smoothing on bucket counts
_TOP_K = 100  # selected documents
_TARGET_LANG = "en"  # target domain: the corpus's English slice
_POW48 = float(1 << 48)

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"  # DuckDB
_TOKS = f"string_split({_NORM}, ' ')"


def _h48_mod_duckdb(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 12))::BIGINT % {_BUCKETS})"


_DSIR_ORACLE = f"""
WITH d AS (
    SELECT doc_id, lang, {_TOKS} AS arr FROM documents
),
uni AS (
    SELECT doc_id, lang, 'u|' || t AS g
    FROM (SELECT doc_id, lang, unnest(arr) AS t FROM d)
    WHERE t <> ''
),
big AS (
    SELECT doc_id, lang, 'b|' || arr[pos - 1] || ' ' || arr[pos] AS g
    FROM (
        SELECT doc_id, lang, arr, unnest(generate_series(2, len(arr))) AS pos
        FROM d WHERE len(arr) >= 2
    )
),
feats AS (
    SELECT doc_id, lang, {_h48_mod_duckdb('g')} AS b
    FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)
),
tot AS (
    SELECT
        CAST(SUM(CASE WHEN lang = '{_TARGET_LANG}' THEN 1 ELSE 0 END) AS DOUBLE) AS nt,
        CAST(COUNT(*) AS DOUBLE) AS nr
    FROM feats
),
rcnt AS (
    SELECT b,
           SUM(CASE WHEN lang = '{_TARGET_LANG}' THEN 1 ELSE 0 END) AS ct,
           COUNT(*) AS cr
    FROM feats GROUP BY b
),
lr AS (
    SELECT b,
           ROUND(ln((CAST(ct + {_ALPHA} AS DOUBLE) / (tot.nt + {_ALPHA * _BUCKETS}))
                  / (CAST(cr + {_ALPHA} AS DOUBLE) / (tot.nr + {_ALPHA * _BUCKETS}))), 9) AS lr
    FROM rcnt CROSS JOIN tot
),
docw AS (
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           ROUND(CAST(SUM(CAST(l.lr AS DECIMAL(38,18))) AS DOUBLE), 6) AS logw
    FROM feats f JOIN lr l ON l.b = f.b
    GROUP BY f.doc_id
),
keyed AS (
    SELECT doc_id, n_grams, logw,
           logw + ROUND(-ln(-ln((('0x' || substr(md5('dsir|' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT + 0.5) / {_POW48!r})), 9) AS k
    FROM docw
),
top AS (
    SELECT doc_id FROM keyed ORDER BY k DESC, doc_id LIMIT {_TOP_K}
)
SELECT k.doc_id, k.n_grams, k.logw,
       CAST(CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS sampled
FROM keyed k LEFT JOIN top t ON t.doc_id = k.doc_id
ORDER BY k.doc_id
"""


def _features(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, b): one row per hashed unigram/bigram OCCURRENCE
    (multiplicity counts, as in the DSIR bag-of-n-grams model)."""
    d = docs.select("doc_id", "lang", TX.tokens(F.col("text")).alias("arr"))
    uni = (
        d.select("doc_id", "lang", F.explode("arr").alias("t"))
        .filter(F.col("t") != "")
        .select("doc_id", "lang", F.concat(F.lit("u|"), F.col("t")).alias("g"))
    )
    big = (
        d.filter(F.size("arr") >= 2)
        .select(
            "doc_id",
            "lang",
            "arr",
            F.explode(F.sequence(F.lit(2), F.size("arr"))).alias("pos"),
        )
        .select(
            "doc_id",
            "lang",
            F.concat(
                F.lit("b|"),
                F.element_at("arr", F.col("pos") - 1),
                F.lit(" "),
                F.element_at("arr", F.col("pos")),
            ).alias("g"),
        )
    )
    return uni.unionByName(big).select(
        "doc_id", "lang", (TX.hash48(F.col("g")) % _BUCKETS).alias("b")
    )


@register("dsir_importance_weights", oracle=_DSIR_ORACLE, driver=False)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR log importance weight vs the English target
    slice, plus the Gumbel-top-{_TOP_K} selection flag.

    Plan: explode features -> 512-row bucket count aggregate ->
    broadcast log-ratio table -> per-doc decimal-exact sum ->
    TakeOrdered top-k semi-flag. One corpus pass, one doc-level
    aggregate, zero wide joins.
    """
    docs = read_table(spark, sf_dir, "documents")
    feats = _features(docs)

    is_t = (F.col("lang") == _TARGET_LANG).cast("long")
    tot = feats.agg(
        F.sum(is_t).cast("double").alias("nt"),
        F.count(F.lit(1)).cast("double").alias("nr"),
    )
    rcnt = feats.groupBy("b").agg(
        F.sum(is_t).alias("ct"), F.count(F.lit(1)).alias("cr")
    )
    lr = (
        rcnt.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    ((F.col("ct") + _ALPHA).cast("double") / (F.col("nt") + _ALPHA * _BUCKETS))
                    / ((F.col("cr") + _ALPHA).cast("double") / (F.col("nr") + _ALPHA * _BUCKETS))
                ),
                9,
            ).alias("lr"),
        )
    )
    docw = (
        feats.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                F.sum(F.col("lr").cast("decimal(38,18)")).cast("double"), 6
            ).alias("logw"),
        )
    )
    u = (
        TX.hash48(F.concat(F.lit("dsir|"), F.col("doc_id").cast("string"))).cast("double")
        + F.lit(0.5)
    ) / F.lit(_POW48)
    keyed = docw.withColumn("k", F.col("logw") + F.round(-F.log(-F.log(u)), 9))
    top = keyed.orderBy(F.col("k").desc(), F.col("doc_id")).limit(_TOP_K).select(
        "doc_id", F.lit(1).alias("_sel")
    )
    return (
        keyed.join(F.broadcast(top), "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            "logw",
            F.coalesce(F.col("_sel"), F.lit(0)).cast("long").alias("sampled"),
        )
        .orderBy("doc_id")
    )
