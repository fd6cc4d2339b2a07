"""Token-label association scoring (chi-square feature selection).

The fastText/Dolma-style quality-classifier pipeline step: given a
document label, rank vocabulary tokens by how strongly their PRESENCE
associates with it — the feature-selection pass that decides which
tokens a source/quality classifier gets trained on. Chi-square over
the 2x2 presence table per token:

    a = docs with token, label     b = docs with token, no label
    c = docs w/o  token, label     d = docs w/o  token, no label
    chi2 = N * (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d))

Everything up to the final expression is exact integer counting (one
distinct-presence explode + one token-keyed aggregate — the same
shuffle bill as vocab_stats); the chi-square itself is ONE fixed-order
double expression written identically in Spark and DuckDB, so the
scores — and therefore the ranking — are bit-identical across engines.

Scale shape at 100 TB: presence pairs are Σ per-doc distinct tokens
(corpus-token-linear); the aggregate is one shuffle keyed by token;
label totals ride a 1-row broadcast. No windows, no UDFs, no driver
loops. Universal tokens (df == N) are excluded on both sides — their
contingency table degenerates (c + d = 0) and they carry no signal.

Reference parity note: extension surface — the reference engine
(/root/reference/src) has no text pipeline; this row extends the
text-analysis family (LID / quality / vocab / BPE) with the
classifier-feature-selection shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

import pyspark_big_data_spark.functions.text as TX
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_TOP = 30
# deterministic binary label from the source tag: src<k> with even k.
# Arbitrary on synthetic data; the operator shape is what's pinned.
_LABEL_SQL = "CAST(substr(source, 4) AS BIGINT) % 2 = 0"

_NORM = TX.NORMALIZE_SQL.format(expr="text")

_CHI2_ORACLE = f"""
WITH lab AS MATERIALIZED (
    SELECT doc_id, ({_LABEL_SQL}) AS y FROM documents
), pres AS MATERIALIZED (
    SELECT DISTINCT d.doc_id, t.tok
    FROM documents d, unnest(string_split({_NORM}, ' ')) AS t(tok)
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS nn,
           CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS ny
    FROM lab
), cnt AS (
    SELECT p.tok AS token,
           CAST(SUM(CASE WHEN l.y THEN 1 ELSE 0 END) AS BIGINT) AS a,
           CAST(SUM(CASE WHEN l.y THEN 0 ELSE 1 END) AS BIGINT) AS b
    FROM pres p JOIN lab l ON l.doc_id = p.doc_id
    GROUP BY p.tok
), chi AS (
    SELECT token, a, b,
           (CAST(nn AS DOUBLE)
            * (CAST(a * (nn - ny - b) - b * (ny - a) AS DOUBLE)
               * CAST(a * (nn - ny - b) - b * (ny - a) AS DOUBLE)))
           / ((CAST(a + b AS DOUBLE) * CAST(nn - a - b AS DOUBLE))
              * (CAST(ny AS DOUBLE) * CAST(nn - ny AS DOUBLE))) AS chi2
    FROM cnt, tot
    WHERE a + b < nn
)
SELECT token, a AS df_label, b AS df_rest, chi2
FROM chi
ORDER BY chi2 DESC, token
LIMIT {_TOP}
"""


@register("chi2_token_label", oracle=_CHI2_ORACLE, driver=False)
def chi2_token_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{top} tokens by chi-square association with a binary source
    label — see the module docstring for the contingency algebra. The
    double expression is identical character-for-character in spirit
    on both engines (same operand order, same parenthesization, exact
    integer inputs), so scores and ranking are bit-stable; ties break
    on the token. d = nn - ny - b and c = ny - a are substituted
    inline so both engines compute ONE difference expression each.""".format(
        top=_TOP
    )
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (F.substring("source", 4, 10).cast("long") % 2 == 0).alias("y"),
    )
    lab = docs.select("doc_id", "y")
    tot = lab.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long").alias("ny"),
    )
    pres = docs.select(
        "doc_id", "y", F.explode(F.array_distinct(TX.tokens(F.col("text")))).alias("token")
    )
    cnt = pres.groupBy("token").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).cast("long").alias("b"),
    )
    nn, ny = F.col("nn"), F.col("ny")
    a, b = F.col("a"), F.col("b")
    diff = (a * (nn - ny - b) - b * (ny - a)).cast("double")
    chi2 = (nn.cast("double") * (diff * diff)) / (
        ((a + b).cast("double") * (nn - a - b).cast("double"))
        * (ny.cast("double") * (nn - ny).cast("double"))
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .filter(a + b < nn)
        .select(
            "token",
            a.alias("df_label"),
            b.alias("df_rest"),
            chi2.alias("chi2"),
        )
        .orderBy(F.col("chi2").desc(), "token")
        .limit(_TOP)
    )


_COLLOC_TOP = 30
_COLLOC_MIN_COUNT = 5

_COLLOC_ORACLE = f"""
WITH arrs AS MATERIALIZED (
    SELECT doc_id, string_split({_NORM}, ' ') AS arr FROM documents
), uni AS MATERIALIZED (
    SELECT t.tok, CAST(COUNT(*) AS BIGINT) AS c1
    FROM arrs, unnest(arr) AS t(tok)
    GROUP BY t.tok
), tot AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n FROM uni
), bi AS MATERIALIZED (
    SELECT arr[pos - 1] AS w1, arr[pos] AS w2, CAST(COUNT(*) AS BIGINT) AS c2
    FROM arrs, unnest(generate_series(2, len(arr))) AS g(pos)
    GROUP BY w1, w2
    HAVING COUNT(*) >= {_COLLOC_MIN_COUNT}
)
SELECT b.w1, b.w2, b.c2,
       (CAST(b.c2 AS DOUBLE) * CAST(t.n AS DOUBLE))
           / (CAST(u1.c1 AS DOUBLE) * CAST(u2.c1 AS DOUBLE)) AS lift
FROM bi b
JOIN uni u1 ON u1.tok = b.w1
JOIN uni u2 ON u2.tok = b.w2
CROSS JOIN tot t
ORDER BY lift DESC, w1, w2
LIMIT {_COLLOC_TOP}
"""


@register("pmi_collocations", oracle=_COLLOC_ORACLE, driver=False)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{top} collocations (adjacent token pairs) by LIFT — the
    PMI collocation extractor with the logarithm deliberately NOT
    applied: lift = P(w1 w2) / (P(w1) P(w2)) is strictly monotone in
    PMI = ln(lift), so the RANKING is identical while the score stays
    one fixed-order double expression over exact integer counts —
    bit-stable across engines with no libm ulp policy needed (the
    same reasoning as geomean's unapplied exp). Min bigram count
    {minc} is the standard collocation support floor (rare pairs have
    degenerate lift). Bigram extraction is map-side array slicing
    (explode of positions — no per-doc window shuffle, the
    bigram_fluency pattern); unigram/bigram counts are two token-keyed
    aggregates; the corpus size rides a 1-row broadcast. At 100 TB
    the bigram vocabulary is the shuffled key set — cap it with the
    support floor (already applied map-side by partial aggregation).
    """.format(top=_COLLOC_TOP, minc=_COLLOC_MIN_COUNT)
    docs = read_table(spark, sf_dir, "documents")
    arrs = docs.select("doc_id", TX.tokens(F.col("text")).alias("arr"))
    uni = (
        arrs.select(F.explode("arr").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    tot = uni.agg(F.sum("c1").cast("long").alias("n"))
    bi = (
        arrs.filter(F.size("arr") >= 2)
        .select(
            "arr", F.explode(F.sequence(F.lit(2), F.size("arr"))).alias("pos")
        )
        .select(
            F.element_at("arr", F.col("pos") - 1).alias("w1"),
            F.element_at("arr", F.col("pos")).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
        .filter(F.col("c2") >= _COLLOC_MIN_COUNT)
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c1").alias("ca"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c1").alias("cb"))
    lift = (F.col("c2").cast("double") * F.col("n").cast("double")) / (
        F.col("ca").cast("double") * F.col("cb").cast("double")
    )
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c2", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(_COLLOC_TOP)
    )
