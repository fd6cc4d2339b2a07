"""Count-min sketch token-frequency estimation — fully oracle-replayed.

Sketch family completion: the repo already carries HLL (distinct),
freqItems/Misra-Gries (heavy-hitter candidates), SpaceSaving (streaming
heavy hitters), and Bloom (runtime join filters). Count-min is the
remaining classic: a d x w grid of counters where each key increments
one counter per row (bucket = h_seed(key) % w) and the estimate is the
MIN over rows — always >= the true count, over by at most eps*N with
probability 1 - delta (Cormode & Muthukrishnan 2005).

Everything here is deterministic, portable arithmetic (md5-48 bucket
hashes, functions/text.py::hash48), so the DuckDB oracle replays the
ENTIRE sketch — cells, estimates, and the overcount witness — cell for
cell. That makes this the rare sketch whose output is value-hash
verifiable, not just property-gated.

Scale design (100 TB):
- the token shuffle is the SAME vocab-keyed shuffle vocab_stats pays —
  partial aggregation (map-side combine) collapses each partition's
  token multiset before the exchange;
- the sketch itself is d*w rows (grid cells), built from the vocab
  frame with one explode(d) + one (row, bucket)-keyed aggregate whose
  key space is bounded by d*w — trivially mergeable across days/shards
  (cells ADD), which is the whole point of CMS in a pipeline;
- estimates join a BOUNDED candidate set (top-N tokens) against the
  d*w-cell grid: broadcast-sized on both sides at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.functions import text as TX
from pyspark_big_data_spark.functions.text import hash48, hash48_sql_duckdb
from pyspark_big_data_spark.io import ensure_min_partitions, read_table
from pyspark_big_data_spark.queries.registry import register

_CMS_D = 4  # depth: independent hash rows
_CMS_W = 512  # width: counters per row
_CMS_TOP = 20  # witness candidate set: top-N tokens by exact count

# DuckDB normalized-token source (same normalization as text_analysis)
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"


def _bucket(tok_col: F.Column, seed: F.Column) -> F.Column:
    """Row-`seed` bucket for a token: portable md5-48 of 'seed|token'."""
    return hash48(F.concat(seed.cast("string"), F.lit("|"), tok_col)) % _CMS_W


def _bucket_sql(tok_expr: str, seed_expr: str) -> str:
    h = hash48_sql_duckdb(f"CAST({seed_expr} AS VARCHAR) || '|' || {tok_expr}")
    return f"({h} % {_CMS_W})"


def cms_cells(toks: DataFrame, tok_col: str = "tok") -> DataFrame:
    """The d x w sketch grid as a DataFrame: (seed, bucket, cell).

    Built from the PRE-AGGREGATED vocab frame (token -> count), not the
    raw occurrence stream: the explode(d) then multiplies vocab rows,
    not corpus rows, and the cell aggregate's key space is <= d*w.
    """
    vocab = toks.groupBy(F.col(tok_col).alias("tok")).agg(F.count(F.lit(1)).alias("cnt"))
    return cms_cells_from_vocab(vocab)


def cms_estimate(candidates: DataFrame, cells: DataFrame, tok_col: str = "token") -> DataFrame:
    """Point-query the grid: est(token) = min over d rows of its cell.

    ``candidates`` must be bounded (it is cross-joined with d seed
    literals); the join against the <= d*w-row grid is broadcast-sized.
    """
    seeds = F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("seed")
    probes = candidates.select(F.col(tok_col), seeds).select(
        tok_col, "seed", _bucket(F.col(tok_col), F.col("seed")).alias("bucket")
    )
    return probes.join(F.broadcast(cells), ["seed", "bucket"]).groupBy(tok_col).agg(
        F.min("cell").alias("est_cnt")
    )


def _cms_cells_sql() -> str:
    """DuckDB replay of cms_cells over the documents table."""
    return f"""
    tok AS (SELECT unnest({_TOKS}) AS tok FROM documents),
    vocab AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    cells AS (
        SELECT s.seed,
               {_bucket_sql('vocab.tok', 's.seed')} AS bucket,
               SUM(cnt) AS cell
        FROM vocab, (VALUES (0), (1), (2), (3)) s(seed)
        GROUP BY 1, 2
    )"""


_CMS_ORACLE = f"""
WITH {_cms_cells_sql()},
cand AS (
    SELECT tok AS token, cnt AS exact_cnt
    FROM vocab
    ORDER BY cnt DESC, tok
    LIMIT {_CMS_TOP}
),
probe AS (
    SELECT c.token, c.exact_cnt, s.seed,
           {_bucket_sql('c.token', 's.seed')} AS bucket
    FROM cand c, (VALUES (0), (1), (2), (3)) s(seed)
),
est AS (
    SELECT p.token,
           ANY_VALUE(p.exact_cnt) AS exact_cnt,
           MIN(cells.cell) AS est_cnt
    FROM probe p
    JOIN cells ON cells.seed = p.seed AND cells.bucket = p.bucket
    GROUP BY p.token
)
SELECT token,
       CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(est_cnt AS BIGINT) AS est_cnt,
       CAST(est_cnt - exact_cnt AS BIGINT) AS overcount,
       CAST(est_cnt >= exact_cnt AS BOOLEAN) AS never_under
FROM est
ORDER BY exact_cnt DESC, token
"""


@register("token_freq_cms", oracle=_CMS_ORACLE, driver=False)
def token_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS frequency estimates for the top-{_CMS_TOP} tokens, with the
    sketch guarantee carried as witness columns: ``overcount`` (the
    collision inflation, always >= 0) and ``never_under`` (CMS never
    underestimates — deterministically TRUE, not probabilistically).

    The exact side exists to *verify the sketch*; a production pipeline
    would keep only the d*w grid and answer point queries from it.
    Candidate selection (top-N by exact count) uses the same vocab
    aggregate the grid is built from — one shuffle total."""
    docs = read_table(spark, sf_dir, "documents")
    toks = ensure_min_partitions(
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).cache()
    cells = cms_cells_from_vocab(vocab)
    cand = (
        vocab.orderBy(F.col("cnt").desc(), "tok")
        .limit(_CMS_TOP)
        .select(F.col("tok").alias("token"), F.col("cnt").alias("exact_cnt"))
    )
    est = cms_estimate(cand, cells)
    out = (
        cand.join(est, "token")
        .select(
            "token",
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            F.col("est_cnt").cast("long").alias("est_cnt"),
            (F.col("est_cnt") - F.col("exact_cnt")).cast("long").alias("overcount"),
            (F.col("est_cnt") >= F.col("exact_cnt")).alias("never_under"),
        )
        .orderBy(F.col("exact_cnt").desc(), "token")
    )
    return out


def cms_cells_from_vocab(vocab: DataFrame) -> DataFrame:
    """Grid cells from an existing (tok, cnt) vocab frame (shared with
    token_freq_cms so the vocab shuffle is paid once and cached)."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("seed")
    return (
        vocab.select(seeds, "tok", "cnt")
        .select("seed", _bucket(F.col("tok"), F.col("seed")).alias("bucket"), "cnt")
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cell"))
    )
