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
