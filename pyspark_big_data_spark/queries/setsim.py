"""Exact set-similarity join via prefix filtering (PPJoin family,
Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08) over shingle sets.

The dedup toolkit's LSH tiers (MinHash, SimHash, SRP) trade recall for
scale; this operator is the EXACT counterpart that is still scale-safe,
over the SAME sets MinHash sketches (operators/dedup.py::shingles —
char 5-gram, stride 2): for Jaccard threshold t, order every document's
shingle set by one global total order (rarest-first), keep only the
first ``|x| - ceil(t*|x|) + 1`` shingles as the *prefix*, and observe
that two sets with J >= t MUST share at least one prefix shingle
(pigeonhole: disjoint prefixes cap the overlap below the t-implied
floor). Candidate generation is an equi-join on prefix shingles — never
all-pairs — and exact verification touches candidates only. No misses,
by theorem, not by tuning.

Set representation matters: over raw TOKEN sets this corpus is
degenerate (31-word generator vocabulary -> most pairs exceed t and
every posting is huge); over char-shingle sets the vocabulary is large,
prefix postings are short, and the surviving pairs are the true
near-dups — the same reason MinHash shingles characters, not words.

Determinism contract (both engines, bit-exact):
- global order = (document frequency ASC, shingle ASC): rare shingles
  first, so prefix postings stay short; lexicographic tie-break makes
  the order total;
- ceil(t*|x|) with t = 9/10 is INTEGER arithmetic — no float ceil at
  the boundary in either engine;
- the threshold test is cross-multiplied: 10*|inter| >= 9*|union| —
  exact integer comparison;
- the emitted jaccard is ROUND(i/u, 6) for display only.

Scale design (100 TB): the candidate bill is Σ posting² over PREFIX
shingles only — rarest-first ordering makes those the shortest
postings (contrast any-shared-shingle joins: Σ df² over the Zipf
head) — plus the PPJoin LENGTH filter inside the candidate join
(J >= t forces t*|larger| <= |smaller|, integer cross-multiplied).
One shingle shuffle for df, one doc-keyed sort-aggregate, one
equi-join; exact verify joins shingle arrays back by doc_id on the
output-sized candidate set. This is the exactness backstop you run
where LSH recall must be PROVEN.

Measured economics on THIS corpus (sf0.1, 50k docs, local[32]): the
31-word generator vocabulary gives every pair a high BACKGROUND shingle
overlap, so prefix pruning keeps 4.4% of all-pairs at t=0.9 (vs 67% at
t=0.6 — the threshold is the knob) where natural text with Zipf
shingle statistics prunes orders of magnitude harder. Same honesty
note as embed_hash's anisotropy ceiling: the algorithm's bill is
input-distribution-dependent; on real corpora the prefix postings are
short, here they are not. Kept pytest-oracled (driver=False), never a
headline row; MinHash-LSH remains the text-side scale path, with this
as its recall proof at audit time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

import pyspark_big_data_spark.operators.dedup as DD
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.registry import register

_T_NUM = 9  # Jaccard threshold numerator
_T_DEN = 10  # -> t = 0.9: the tight near-dup band (exact dups + close edits)

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# Brute-force oracle: the theorem says prefix filtering misses NOTHING,
# so the engine's filtered join must equal the full O(n^2) DuckDB pass
# (12 s at sf0.01 — the oracle pays n^2, the engine never does).
_PREFIX_ORACLE = f"""
WITH d AS (SELECT doc_id, {_NORM} AS norm FROM documents),
sh AS (
    SELECT doc_id,
           substr(norm,
                  unnest(generate_series(1, greatest(length(norm) - {DD.SHINGLE_LEN - 1}, 1),
                                         {DD.SHINGLE_STRIDE})),
                  {DD.SHINGLE_LEN}) AS s
    FROM d
),
sets AS (SELECT doc_id, list_distinct(list(s)) AS toks FROM sh GROUP BY doc_id)
SELECT a.doc_id AS doc_a,
       b.doc_id AS doc_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_inter,
       CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_union,
       ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
FROM sets a JOIN sets b ON a.doc_id < b.doc_id
WHERE {_T_DEN} * len(list_intersect(a.toks, b.toks))
      >= {_T_NUM} * (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
ORDER BY doc_a, doc_b
"""


def prefix_shingle_sets(
    docs: DataFrame, t_num: int = _T_NUM, t_den: int = _T_DEN
) -> DataFrame:
    """(doc_id, toks, prefix): the doc's distinct shingles in global
    rarest-first order, and the prefix slice that the theorem requires
    any >= t partner to intersect."""
    sh = DD.shingles(docs).distinct()
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        sh.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "s"))).alias("ord"))
    )
    n = F.size("ord")
    # ceil(t*n) in pure integer math; for t = 9/10: (18n + 19) // 20
    ceil_tn = F.floor((n * (2 * t_num) + (2 * t_den - 1)) / (2 * t_den))
    plen = (n - ceil_tn + 1).cast("int")
    return ordered.select(
        "doc_id",
        n.alias("n"),
        F.transform("ord", lambda x: x["s"]).alias("toks"),
        F.transform(F.slice("ord", F.lit(1), plen), lambda x: x["s"]).alias("prefix"),
    )


@register("jaccard_prefix_pairs", oracle=_PREFIX_ORACLE, driver=False)
def jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with shingle-set Jaccard >= {_T_NUM}/{_T_DEN},
    found EXACTLY via prefix filtering (module docstring). The DuckDB
    oracle is the unfiltered all-pairs computation — agreement IS the
    no-miss theorem, checked end to end."""
    return prefix_filter_pairs(read_table(spark, sf_dir, "documents"))


def prefix_filter_pairs(docs: DataFrame) -> DataFrame:
    """The prefix-filtered similarity join over any (doc_id, text)
    frame (property-tested on random corpora in tests/test_setsim.py)."""
    pref = prefix_shingle_sets(docs).cache()
    posting = pref.select("doc_id", "n", F.explode("prefix").alias("s"))
    # candidate join = prefix-token equi-join + PPJoin length filter:
    # J >= t  =>  t * |larger| <= |smaller|  (integer cross-multiplied)
    cand = (
        posting.alias("a")
        .join(posting.alias("b"), "s")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.least("a.n", "b.n") * _T_DEN
                >= F.greatest("a.n", "b.n") * _T_NUM
            )
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = pref.select("doc_id", "toks")
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    return (
        cand.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            inter.cast("long").alias("n_inter"),
            union.cast("long").alias("n_union"),
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .filter(F.lit(_T_DEN) * F.col("n_inter") >= F.lit(_T_NUM) * F.col("n_union"))
        .orderBy("doc_a", "doc_b")
    )
