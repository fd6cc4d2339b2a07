"""Text-analysis queries over the documents table (training-data ops).

North-star extension surface (SURVEY.md §7 M6): token statistics,
quality scoring, language-ID, and content fingerprinting — each a pure
column-expression pipeline with a DuckDB oracle twin.

Dialect note: the Spark implementations are DataFrame code
(functions/text.py); the oracles re-express the same semantics in DuckDB
SQL (regexp_replace needs the 'g' flag there, list_* instead of Spark's
higher-order functions). Both are asserted equal by the differential
gate, which is exactly the point: two independent encodings, one result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pyspark_big_data_spark.functions import text as TX
from pyspark_big_data_spark.io import ensure_min_partitions, read_table
from pyspark_big_data_spark.queries.registry import register

# DuckDB-side normalized text + token list (single source for oracles)
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"


def _dd_marker_count(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in TX.LID_MARKERS[lang])
    return f"len(list_filter(toks, t -> t IN ({markers})))"


_TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_words,
       CAST(length(regexp_extract_all(text, '{TX.BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(norm) AS BIGINT) AS n_chars_norm
FROM (SELECT doc_id, text, {_NORM} AS norm, {_TOKS} AS toks FROM documents)
ORDER BY doc_id
"""


@register("text_token_stats", oracle=_TOKEN_STATS_ORACLE, driver=False)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.word_count(F.col("text")).cast("long").alias("n_words"),
        TX.bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
        F.length(TX.normalize_text(F.col("text"))).cast("long").alias("n_chars_norm"),
    ).orderBy("doc_id")


_QUALITY_ORACLE = f"""
SELECT doc_id,
       n_words,
       ROUND(avg_wlen, 6) AS avg_word_len,
       ROUND(stop_ratio, 6) AS stopword_ratio,
       ROUND(pratio, 6) AS punct_ratio,
       ROUND(least(1.0,
             0.3 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
           + 0.4 * least(stop_ratio * 5.0, 1.0)
           + 0.3 * (1.0 - least(pratio * 10.0, 1.0))), 6) AS quality
FROM (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
               / greatest(len(toks), 1) AS avg_wlen,
           CAST({_dd_marker_count('en')} AS DOUBLE) / greatest(len(toks), 1) AS stop_ratio,
           CAST(length(text) - length(regexp_replace(text, '{TX.PUNCT_CLASS}', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS pratio
    FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
)
ORDER BY doc_id
"""


@register("text_quality_scores", oracle=_QUALITY_ORACLE)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length, fluency (stopword density),
    punctuation noise — the standard pre-training filter trio."""
    docs = read_table(spark, sf_dir, "documents")
    n_words = TX.word_count(F.col("text")).cast("long")
    avg_wlen = TX.avg_word_len(F.col("text"))
    stop_ratio = TX.stopword_ratio(F.col("text"))
    pratio = TX.punct_ratio(F.col("text"))
    quality = F.least(
        F.lit(1.0),
        F.lit(0.3) * F.least(n_words.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.4) * F.least(stop_ratio * 5.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(pratio * 10.0, F.lit(1.0))),
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(avg_wlen, 6).alias("avg_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(pratio, 6).alias("punct_ratio"),
        F.round(quality, 6).alias("quality"),
    ).orderBy("doc_id")


def _lid_oracle() -> str:
    score_cols = ",\n       ".join(
        f"CAST({_dd_marker_count(lang)} AS BIGINT) AS score_{lang}" for lang in TX.LID_ORDER
    )
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in TX.LID_ORDER) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in TX.LID_ORDER:
        case += f"WHEN score_{lang} = {best} THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"""
SELECT doc_id, {', '.join('score_' + lang for lang in TX.LID_ORDER)}, {case} AS lang_pred
FROM (
    SELECT doc_id,
       {score_cols}
    FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
)
ORDER BY doc_id
"""


@register("text_lang_id", oracle=_lid_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID with deterministic argmax.

    The synthetic corpus is English-like regardless of its lang column,
    so predictions skew 'en'/'und' here — the oracle validates the
    operator, unit tests validate the heuristic on real multilingual
    samples (tests/test_text_functions.py)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    scores = {lang: TX.lid_score(toks, lang).cast("long") for lang in TX.LID_ORDER}
    return docs.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in TX.LID_ORDER],
        TX.lid_predict(scores).alias("lang_pred"),
    ).orderBy("doc_id")


_FP_ORACLE = f"""
SELECT md5({_NORM}) AS fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY 1
ORDER BY keep_doc_id
"""


@register("dedup_exact", oracle=_FP_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content fingerprint: hash-groupBy keeping the
    lowest doc_id per normalized-text md5 (deterministic survivor rule).

    Scale notes: one shuffle on the 16-byte fingerprint — the canonical
    exact-dedup plan at any scale. Survivorship as min(doc_id) makes the
    result reproducible regardless of partitioning (first-seen isn't)."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(TX.fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keep_doc_id")
    )


_HH_SUPPORT = 0.02  # min corpus-wide token frequency to count as a heavy hitter

_HH_ORACLE = f"""
WITH tok AS (
    SELECT unnest({_TOKS}) AS tok FROM documents
),
tot AS (SELECT COUNT(*) AS n FROM tok)
SELECT t.tok AS token,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(tot.n), 6) AS freq
FROM tok t, tot
GROUP BY t.tok
HAVING CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(tot.n) >= {_HH_SUPPORT}
ORDER BY cnt DESC, token
"""


@register("vocab_heavy_hitters", oracle=_HH_ORACLE, driver=False)
def vocab_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens (corpus frequency ≥ {_HH_SUPPORT}) via the
    candidate-then-verify pattern: a single-pass ``freqItems`` sketch
    (Karp/Misra-Gries family — GUARANTEED superset of every item above
    the support threshold) proposes candidates with no token shuffle at
    all, then one scan counts ONLY candidate tokens exactly. The final
    filter makes the output exact — which is why this sketch-backed
    query still carries a full SQL oracle.

    Scale contrast with ``vocab_stats`` (exact df/cf for the WHOLE
    vocabulary): that pays a shuffle keyed by every distinct token —
    right for tokenizer training; this answers "what dominates the
    corpus" with a candidate set bounded by 1/support (≤50 here) and a
    tiny broadcast-filtered aggregate. At 100 TB the sketch pass is
    scan-speed and the exact pass aggregates ~50 keys."""
    docs = read_table(spark, sf_dir, "documents")
    toks = ensure_min_partitions(
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
    ).cache()
    # Single-pass candidate sketch: one row, array of candidate tokens.
    # Run the sketch slightly BELOW the support threshold: freqItems
    # guarantees candidates only for frequency STRICTLY greater than its
    # support, so a token sitting exactly at _HH_SUPPORT could be absent
    # from the sketch while passing the oracle's >= filter. At 0.9×, the
    # exact >= filter below is the only decider; the candidate bound
    # grows only from 1/support to 1/(0.9*support).
    cand = toks.stat.freqItems(["tok"], support=_HH_SUPPORT * 0.9).collect()[0][0]
    total = toks.count()
    # Both in-function actions are done — release the exploded-token
    # cache (the largest intermediate in this module) instead of leaking
    # it for the session. The returned lazy plan recomputes from scan.
    toks.unpersist()
    return (
        toks.filter(F.col("tok").isin(list(cand)))
        .groupBy(F.col("tok").alias("token"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("freq", F.round(F.col("cnt").cast("double") / F.lit(total), 6))
        .filter(F.col("cnt").cast("double") / F.lit(total) >= _HH_SUPPORT)
        .orderBy(F.col("cnt").desc(), "token")
    )


# ---------------------------------------------------------------------------
# Fixed-weight logistic quality classifier
# ---------------------------------------------------------------------------

# The "fasttext-style quality model" shape with a transparent stand-in:
# a logistic regression over the engineered features, weights fixed in
# code (a trained model would broadcast its weights the same way). The
# operator shape — feature columns -> one linear form -> sigmoid ->
# thresholded keep flag — is exactly what model-scored corpus filtering
# runs at 100 TB, and it stays whole-stage-codegen JVM column math.
_QC_BIAS = -2.0
_QC_W_LOGWORDS = 0.8  # longer docs are likelier to be real prose
_QC_W_STOP = 6.0  # stopword density ~ fluency
_QC_W_PUNCT = -12.0  # punctuation soup ~ boilerplate/markup
_QC_W_WLEN = -0.15  # very long "words" ~ junk tokens
_QC_KEEP = 0.5

def qc_scored_sql() -> str:
    """DuckDB sub-select producing (doc_id, score) — the classifier's
    unrounded logistic score per document. Shared by the classifier
    oracle and the curriculum oracle so the score cannot drift."""
    return f"""(
    SELECT doc_id,
           1.0 / (1.0 + exp(-({_QC_BIAS}
               + {_QC_W_LOGWORDS} * ln(1.0 + CAST(n_words AS DOUBLE))
               + {_QC_W_STOP} * stop_ratio
               + {_QC_W_PUNCT} * pratio
               + {_QC_W_WLEN} * avg_wlen))) AS score
    FROM (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                   / greatest(len(toks), 1) AS avg_wlen,
               CAST({_dd_marker_count('en')} AS DOUBLE) / greatest(len(toks), 1) AS stop_ratio,
               CAST(length(text) - length(regexp_replace(text, '{TX.PUNCT_CLASS}', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1) AS pratio
        FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    )
)"""


_QC_ORACLE = f"""
SELECT doc_id,
       ROUND(score, 6) AS score,
       CAST(ROUND(score, 6) >= {_QC_KEEP} AS BOOLEAN) AS keep
FROM {qc_scored_sql()}
ORDER BY doc_id
"""


def qc_score6(text_col) -> F.Column:
    """Spark twin of qc_scored_sql(), rounded to 6dp — the shared
    classifier score column."""
    n_words = TX.word_count(text_col).cast("long")
    z = (
        F.lit(_QC_BIAS)
        + F.lit(_QC_W_LOGWORDS) * F.log(F.lit(1.0) + n_words.cast("double"))
        + F.lit(_QC_W_STOP) * TX.stopword_ratio(text_col)
        + F.lit(_QC_W_PUNCT) * TX.punct_ratio(text_col)
        + F.lit(_QC_W_WLEN) * TX.avg_word_len(text_col)
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


@register("quality_classifier_score", oracle=_QC_ORACLE, driver=False)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic quality score + keep flag per document (see the weight
    block above). The keep comparison runs on the ROUNDED score in both
    engines, so the flag is deterministic cross-engine even at the
    threshold; ln/exp ulp drift is absorbed by round(score, 6)."""
    docs = read_table(spark, sf_dir, "documents")
    score6 = qc_score6(F.col("text"))
    return docs.select(
        "doc_id",
        score6.alias("score"),
        (score6 >= F.lit(_QC_KEEP)).alias("keep"),
    ).orderBy("doc_id")


_BPE_N_MERGES = 8


def bpe_merges_oracle_sql(n_merges: int = _BPE_N_MERGES) -> str:
    """Generated DuckDB replay of the FULL BPE merge loop, unrolled
    (the trade_pagerank technique): each iteration recomputes the
    weighted pair counts, picks the argmax with the learner's exact
    (cnt desc, left, right) tie-break via a scalar subquery, and
    applies the greedy left-to-right non-overlapping merge in pure SQL.

    The greedy fold (operators/bpe.py::merge_pair) is SQL-expressible
    positionally: adjacent matches can only overlap when left == right
    (a match at pos p and p+1 forces s[p+1] = right = left), so within
    each RUN of consecutive match positions greedy selects exactly the
    even offsets from the run start — gaps-and-islands + parity. The
    rebuild keeps every position except those consumed as the right
    half of a selected merge, concatenating the pair at selected
    positions."""
    parts = _bpe_chain_parts(n_merges)
    union = " UNION ALL ".join(
        f"SELECT {i + 1} AS rank, l AS left_sym, r AS right_sym, cnt FROM t{i}"
        for i in range(n_merges)
    )
    parts.append(
        f"""
SELECT CAST(rank AS BIGINT) AS rank, left_sym, right_sym, cnt
FROM ({union}) ORDER BY rank"""
    )
    return "".join(parts)


def _bpe_chain_parts(n_merges: int) -> list[str]:
    """The shared unrolled WITH-chain: v0 (char-split vocab) through
    v{n_merges} (fully merged vocab), with t{i} = merge i's argmax."""
    parts = [
        f"""WITH v0 AS MATERIALIZED (
    SELECT word, freq, list_append(string_split(word, ''), '</w>') AS s
    FROM (
        SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest({_TOKS}) AS t FROM documents)
        WHERE t <> '' GROUP BY t
    )
)"""
    ]
    for i in range(n_merges):
        parts.append(
            f""", p{i} AS MATERIALIZED (
    SELECT word, freq, s, unnest(generate_series(1, len(s) - 1)) AS pos FROM v{i}
), c{i} AS (
    SELECT s[pos] AS l, s[pos + 1] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
    FROM p{i} GROUP BY 1, 2
), t{i} AS MATERIALIZED (
    SELECT l, r, cnt FROM c{i} ORDER BY cnt DESC, l, r LIMIT 1
), g{i} AS MATERIALIZED (
    SELECT word, pos FROM (
        SELECT word, pos, MIN(pos) OVER (PARTITION BY word, grp) AS rstart
        FROM (
            SELECT word, pos,
                   pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS grp
            FROM p{i}
            WHERE s[pos] = (SELECT l FROM t{i}) AND s[pos + 1] = (SELECT r FROM t{i})
        )
    ) WHERE (pos - rstart) % 2 = 0
), v{i + 1} AS MATERIALIZED (
    SELECT word, freq, list(sym ORDER BY pos) AS s
    FROM (
        SELECT a.word, a.freq, a.pos,
               CASE WHEN g.pos IS NOT NULL THEN a.s[a.pos] || a.s[a.pos + 1]
                    ELSE a.s[a.pos] END AS sym
        FROM (SELECT word, freq, s, unnest(generate_series(1, len(s))) AS pos FROM v{i}) a
        LEFT JOIN g{i} g ON g.word = a.word AND g.pos = a.pos
        LEFT JOIN g{i} g2 ON g2.word = a.word AND g2.pos = a.pos - 1
        WHERE g2.pos IS NULL
    ) GROUP BY word, freq
)"""
        )
    return parts


def bpe_tokenize_oracle_sql(n_merges: int = _BPE_N_MERGES) -> str:
    """Generated oracle for corpus tokenization with the learned
    merges: the same unrolled chain yields the fully merged vocab
    v{n_merges}; each document's word sequence (position-preserving
    unnest) then joins that vocab and the per-word symbol lists are
    flattened in word order — exactly operators/bpe.py::bpe_tokenize's
    broadcast-join + posexplode/flatten plan, re-expressed in SQL."""
    parts = _bpe_chain_parts(n_merges)
    parts.append(
        f""", w2 AS (
    SELECT doc_id,
           unnest(toks) AS word,
           unnest(generate_series(1, len(toks))) AS pos
    FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
)
SELECT w.doc_id,
       CAST(SUM(len(v.s)) AS BIGINT) AS n_subwords,
       string_agg(array_to_string(v.s, ' '), ' ' ORDER BY w.pos) AS subtext
FROM (SELECT * FROM w2 WHERE word <> '') w
JOIN v{n_merges} v ON v.word = w.word
GROUP BY w.doc_id
ORDER BY w.doc_id"""
    )
    return "".join(parts)


@register("bpe_tokenize_corpus", oracle=bpe_tokenize_oracle_sql(), driver=False)
def bpe_tokenize_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END tokenizer: learn the top-{_BPE_N_MERGES} merges, then
    tokenize the whole corpus with them (operators/bpe.py::bpe_tokenize
    — the merge folds run once per DISTINCT word, the corpus is touched
    by one tokenize + one broadcast join). Output digest per document:
    subword count + the space-joined subword stream, so the driver
    value-hashes every subword of every document against the DuckDB
    replay of training AND application. Completes the BPE family:
    pair-count core, merge loop, and tokenizer are each oracled.

    100 TB shape: merges are learned once on the distinct-word table
    (vocab-sized iterations); application is vocab-local folds + one
    map-side broadcast join — a single corpus pass, no shuffle beyond
    the per-doc groupBy."""
    from pyspark_big_data_spark.operators.bpe import bpe_tokenize, learn_merges

    docs = read_table(spark, sf_dir, "documents")
    merges = learn_merges(docs, n_merges=_BPE_N_MERGES)
    tok = bpe_tokenize(docs, merges)
    return tok.select(
        "doc_id",
        F.size("subwords").cast("long").alias("n_subwords"),
        F.concat_ws(" ", "subwords").alias("subtext"),
    ).orderBy("doc_id")


@register("bpe_merges_learned", oracle=bpe_merges_oracle_sql(), driver=False)
def bpe_merges_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_BPE_N_MERGES} learned BPE merges over the corpus
    (operators/bpe.py): tokenizer TRAINING as a registered query.
    Oracled since round 7 — the driver-side argmax loop is replayed by
    the generated unrolled-SQL oracle above (each merge recomputed and
    re-applied in DuckDB), so the FULL merge loop is differentially
    verified, not just iteration 1 (bpe_pair_counts). The pytest gate
    additionally pins exact merge-sequence agreement with an
    independent pure-Python Sennrich implementation (tests/test_bpe.py)."""
    from pyspark_big_data_spark.operators.bpe import learn_merges

    merges = learn_merges(read_table(spark, sf_dir, "documents"), n_merges=_BPE_N_MERGES)
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["cnt"]) for m in merges],
        "rank long, left_sym string, right_sym string, cnt long",
    ).orderBy("rank")


_BPE_PAIR_TOPK = 20

_BPE_PAIR_ORACLE = f"""
WITH w AS (
    SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest({_TOKS}) AS t FROM documents)
    WHERE t <> '' GROUP BY t
),
syms AS (
    SELECT freq, list_append(string_split(word, ''), '</w>') AS s FROM w
),
pairs AS (
    SELECT s[pos] AS left_sym, s[pos + 1] AS right_sym, freq
    FROM (SELECT freq, s, unnest(generate_series(1, len(s) - 1)) AS pos FROM syms)
),
cnt AS (
    SELECT left_sym, right_sym, CAST(SUM(freq) AS BIGINT) AS cnt
    FROM pairs GROUP BY left_sym, right_sym
)
SELECT left_sym, right_sym, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, left_sym, right_sym) AS BIGINT) AS rnk
FROM cnt
ORDER BY cnt DESC, left_sym, right_sym
LIMIT {_BPE_PAIR_TOPK}
"""


@register("bpe_pair_counts", oracle=_BPE_PAIR_ORACLE, driver=False)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed CORE of BPE merge learning, externalized for the
    differential driver: iteration-1 adjacent symbol-pair counts over
    the frequency-weighted distinct-word table (operators/bpe.py —
    chars + '</w>' end mark), top-{_BPE_PAIR_TOPK} with the learner's
    exact (cnt desc, pair asc) tie-break. Row 1 IS the first merge
    ``bpe_merges_learned`` commits to.

    Why this split: the pair-count aggregate is the only stage of BPE
    that touches distributed data (and the only one whose cost grows
    with the corpus); the greedy merge fold it feeds is a vocab-local
    rewrite with no SQL twin, pinned merge-for-merge against a pure
    Python Sennrich reference in tests/test_bpe.py. Top-k is
    TakeOrdered (no single-partition window); the rank column is
    attached to the already-bounded {_BPE_PAIR_TOPK}-row frame.
    """
    from pyspark_big_data_spark.operators.bpe import pair_counts, word_symbol_table

    vocab = word_symbol_table(read_table(spark, sf_dir, "documents"))
    cnt = pair_counts(vocab).select(
        F.col("left").alias("left_sym"), F.col("right").alias("right_sym"), "cnt"
    )
    top = cnt.orderBy(
        F.col("cnt").desc(), F.col("left_sym"), F.col("right_sym")
    ).limit(_BPE_PAIR_TOPK)
    w = Window.orderBy(F.col("cnt").desc(), F.col("left_sym"), F.col("right_sym"))
    return top.withColumn("rnk", F.row_number().over(w)).orderBy("rnk")


# ---------------------------------------------------------------------------
# Boilerplate template detection + corpus datasheet
# ---------------------------------------------------------------------------

_BP_PREFIX_TOKENS = 6  # leading tokens that define a "template" prefix

_BP_ORACLE = f"""
SELECT md5(array_to_string(list_slice(toks, 1, {_BP_PREFIX_TOKENS}), ' ')) AS prefix_fp,
       ANY_VALUE(array_to_string(list_slice(toks, 1, {_BP_PREFIX_TOKENS}), ' ')) AS prefix,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS example_doc_id
FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
GROUP BY 1
HAVING COUNT(*) >= 2
ORDER BY n_docs DESC, prefix_fp
"""


@register("boilerplate_prefixes", oracle=_BP_ORACLE, driver=False)
def boilerplate_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection: documents sharing their first
    {_BP_PREFIX_TOKENS} normalized tokens are flagged as instances of a
    shared template (web pipelines use this to strip mirrored headers,
    navigation chrome, and license preambles that exact-dedup misses
    because the page BODY differs).

    Shape: one map-side prefix fingerprint per doc, one hash-groupBy on
    the 32-hex fp — identical cost profile to exact dedup, scales the
    same way. The HAVING >= 2 filter keeps output proportional to the
    number of templates, not documents."""
    docs = read_table(spark, sf_dir, "documents")
    prefix = F.array_join(F.slice(TX.tokens(F.col("text")), 1, _BP_PREFIX_TOKENS), " ")
    return (
        docs.select(F.md5(prefix).alias("prefix_fp"), prefix.alias("prefix"), "doc_id")
        .groupBy("prefix_fp")
        .agg(
            F.any_value("prefix").alias("prefix"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("example_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "prefix_fp")
    )


_DATASHEET_ORACLE = f"""
SELECT source,
       lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(toks)) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT md5(norm)) AS BIGINT) AS n_unique_texts,
       CAST(COUNT(*) - COUNT(DISTINCT md5(norm)) AS BIGINT) AS dup_docs,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM (SELECT doc_id, source, lang, n_chars, {_NORM} AS norm, {_TOKS} AS toks FROM documents)
GROUP BY source, lang
ORDER BY source, lang
"""


@register("corpus_datasheet", oracle=_DATASHEET_ORACLE, driver=False)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics per (source, lang) slice: doc/token
    volumes, exact-duplicate rate, and id-range provenance — the table
    every training-data release publishes as its datasheet.

    Scale notes: one shuffle keyed by the (source, lang) slice;
    COUNT(DISTINCT fp) expands to Spark's two-phase distinct aggregate
    (partial distinct within partitions before the exchange), so the
    dup-rate column does not force fingerprints through a second
    full-table shuffle. At 100 TB this runs at scan speed and emits
    O(slices) rows."""
    docs = read_table(spark, sf_dir, "documents")
    fp = TX.fingerprint(F.col("text"))
    return (
        docs.select(
            "source",
            "lang",
            "doc_id",
            "n_chars",
            fp.alias("fp"),
            TX.word_count(F.col("text")).cast("long").alias("n_words"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_tokens"),
            F.countDistinct("fp").alias("n_unique_texts"),
            (F.count(F.lit(1)) - F.countDistinct("fp")).alias("dup_docs"),
            F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("source", "lang")
    )


# ---------------------------------------------------------------------------
# Weighted sampling (Efraimidis–Spirakis exponential keys)
# ---------------------------------------------------------------------------

_WS_K = 64  # sample size
_WS_DENOM = float(2**48 + 1)  # hash48 -> u in (0,1): (h+1)/(2^48+1)


def _ws_oracle() -> str:
    from pyspark_big_data_spark.functions.text import hash48_sql_duckdb

    h = hash48_sql_duckdb("'ws:' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id,
       ROUND(score, 6) AS weight,
       ROUND(ln(({h} + 1) / {_WS_DENOM}) / ROUND(score, 6), 9) AS sample_key
FROM {qc_scored_sql()}
ORDER BY sample_key DESC, doc_id
LIMIT {_WS_K}
"""


@register("weighted_sample_quality", oracle=_ws_oracle(), driver=False)
def weighted_sample_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sample without replacement via the
    Efraimidis–Spirakis one-pass scheme: per-doc key = ln(u) / w with u
    a seeded-hash uniform and w the quality-classifier score; the top-k
    keys ARE a weighted sample without replacement (E-S 2006, via the
    max of u^(1/w) formulation — ln is monotone, so ranking ln(u)/w
    descending is identical and numerically tamer).

    This completes the deterministic sampling family: uniform
    (sample_hash_bucket), stratified (sample_stratified_quota), and now
    importance-weighted — the "sample good documents more" selection a
    curriculum/mixture pipeline actually runs.

    Scale notes: key generation is map-side column math; top-k is
    TakeOrderedAndProject (no global sort, partial top-k per partition
    before the single k-row exchange). Reproducible across engines,
    partitionings, and reruns — unlike rand()-keyed reservoirs.
    Cross-engine float note: keys are ROUND(…, 9); the shared rounding
    absorbs ln() last-ulp drift exactly as the corpus_ops oracles do."""
    from pyspark_big_data_spark.functions.text import hash48

    docs = read_table(spark, sf_dir, "documents")
    w = qc_score6(F.col("text"))
    u = (hash48(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))) + 1) / F.lit(
        _WS_DENOM
    )
    key = F.round(F.log(u) / w, 9)
    return (
        docs.select("doc_id", w.alias("weight"), key.alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), "doc_id")
        .limit(_WS_K)
    )


# ---------------------------------------------------------------------------
# Character-distribution entropy (gibberish / encoding-noise detector)
# ---------------------------------------------------------------------------

_ENT_ORACLE = f"""
WITH d AS (SELECT doc_id, {_NORM} AS norm FROM documents),
ch AS (
    SELECT doc_id,
           substr(norm, unnest(generate_series(1, length(norm))), 1) AS ch
    FROM d
),
cc AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch),
cn AS (SELECT *, SUM(c) OVER (PARTITION BY doc_id) AS n FROM cc)
SELECT doc_id,
       CAST(ANY_VALUE(n) AS BIGINT) AS n_chars_norm,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
       ROUND(CAST(-SUM(CAST((CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n)
                            AS DECIMAL(38,18))) AS DOUBLE), 6) AS entropy_bits
FROM cn
GROUP BY doc_id
ORDER BY doc_id
"""


@register("char_entropy_quality", oracle=_ENT_ORACLE, driver=False)
def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's character distribution — the
    quality dimension the length/stopword/punctuation trio misses:
    natural language sits in a narrow entropy band (~4 bits/char for
    English), while base64 blobs / minified code / key-mash gibberish
    run high and repeated-character padding runs low. The standard
    cheap pre-filter before model-scored quality.

    Shape: char explode is map-side (same as shingling), one
    (doc, char)-keyed aggregate + a doc-partitioned window for the
    total. Cross-engine float note: per-class p*log2(p) doubles are
    summed through DECIMAL(38,18) and rounded at the END to 6dp —
    the bigram_fluency determinism recipe."""
    docs = read_table(spark, sf_dir, "documents")
    d = ensure_min_partitions(
        docs.select("doc_id", TX.normalize_text(F.col("text")).alias("norm"))
    )
    pos = F.explode(F.sequence(F.lit(1), F.length("norm")))
    ch = d.select("doc_id", pos.alias("i"), "norm").select(
        "doc_id", F.substring(F.col("norm"), F.col("i"), 1).alias("ch")
    )
    from pyspark.sql import Window

    cc = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    cn = cc.withColumn("n", F.sum("c").over(Window.partitionBy("doc_id")))
    p = F.col("c").cast("double") / F.col("n")
    term = (p * F.log2(p)).cast("decimal(38,18)")
    return (
        cn.groupBy("doc_id")
        .agg(
            F.any_value("n").cast("long").alias("n_chars_norm"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
            F.round((-F.sum(term)).cast("double"), 6).alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Gopher-style rule-based quality filter (r11): the NAMED-rule document
# filter of Rae et al. 2021 (public) — each rule a deterministic
# predicate over exact token statistics, the per-rule verdicts emitted
# alongside the overall pass so a filter report can attribute every
# removal. Thresholds are tuned to the synthetic corpus's shape (20-80
# word docs) so the filter genuinely SPLITS it; swap for the paper's
# values on web text.
# ---------------------------------------------------------------------------

_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 40, 1000
_GOPHER_MIN_WLEN, _GOPHER_MAX_WLEN = 3.0, 7.0
_GOPHER_MIN_STOP_HITS = 2
_GOPHER_MIN_ALPHA_FRAC = 0.8

_GOPHER_ORACLE = f"""
SELECT doc_id,
       n_words,
       ROUND(avg_wlen, 6) AS avg_word_len,
       stop_hits,
       ROUND(alpha_frac, 6) AS alpha_word_frac,
       CAST(r_len AS BIGINT) AS rule_word_count,
       CAST(r_wlen AS BIGINT) AS rule_word_len,
       CAST(r_stop AS BIGINT) AS rule_stopwords,
       CAST(r_alpha AS BIGINT) AS rule_alpha_words,
       CAST(r_len AND r_wlen AND r_stop AND r_alpha AS BIGINT) AS passes
FROM (
    SELECT doc_id, n_words, avg_wlen, stop_hits, alpha_frac,
           n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS} AS r_len,
           avg_wlen >= {_GOPHER_MIN_WLEN} AND avg_wlen <= {_GOPHER_MAX_WLEN} AS r_wlen,
           stop_hits >= {_GOPHER_MIN_STOP_HITS} AS r_stop,
           alpha_frac >= {_GOPHER_MIN_ALPHA_FRAC} AS r_alpha
    FROM (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                   / greatest(len(toks), 1) AS avg_wlen,
               CAST({{marker}} AS BIGINT) AS stop_hits,
               CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
                   / greatest(len(toks), 1) AS alpha_frac
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    )
)
ORDER BY doc_id
""".replace("{marker}", _dd_marker_count("en"))


@register("gopher_quality_filter", oracle=_GOPHER_ORACLE, driver=False)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style NAMED-rule quality filter (Rae et al. 2021, public
    pipeline shape): per-document verdicts for word-count bounds, mean
    word length bounds, minimum stopword hits, and minimum
    alphabetic-word fraction, plus the conjunction ``passes`` — the
    attribution-friendly form a corpus filter report needs (every
    removal names its rule). ONE codegen pass over documents: all four
    statistics come from the same token array, no shuffle, no UDF;
    at 100 TB this is a map-only scan. DuckDB recomputes every
    statistic and verdict from the raw text, so a threshold drift, a
    tokenization mismatch, or a rule wired to the wrong statistic
    flips the row red."""
    docs = read_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    n_words = F.size(toks).cast("long")
    total_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    avg_wlen = total_len.cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")
    stop_hits = TX.lid_score(toks, "en").cast("long")
    alpha_frac = F.size(
        F.filter(toks, lambda t: t.rlike("[a-z]"))
    ).cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")

    r_len = (n_words >= _GOPHER_MIN_WORDS) & (n_words <= _GOPHER_MAX_WORDS)
    r_wlen = (avg_wlen >= _GOPHER_MIN_WLEN) & (avg_wlen <= _GOPHER_MAX_WLEN)
    r_stop = stop_hits >= _GOPHER_MIN_STOP_HITS
    r_alpha = alpha_frac >= _GOPHER_MIN_ALPHA_FRAC
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(avg_wlen, 6).alias("avg_word_len"),
        stop_hits.alias("stop_hits"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        r_len.cast("long").alias("rule_word_count"),
        r_wlen.cast("long").alias("rule_word_len"),
        r_stop.cast("long").alias("rule_stopwords"),
        r_alpha.cast("long").alias("rule_alpha_words"),
        (r_len & r_wlen & r_stop & r_alpha).cast("long").alias("passes"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (r11): score every document by its
# mean unigram log-probability under a language model trained on the
# corpus itself, then cut head/middle/tail terciles — the public CCNet
# (Wenzek et al. 2019) quality-partition shape, with a unigram LM
# standing in for KenLM (same operator skeleton: train counts -> score
# docs -> bucket; swap the scorer for a real LM off-sandbox). Log
# arithmetic follows the repo's bit-stable device (geomean/DSIR rows):
# per-token round(ln(c/N), 9) summed as decimals, so scores AND
# bucket boundaries match DuckDB bit-for-bit.
# ---------------------------------------------------------------------------

_CCNET_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest(toks) AS token
    FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
), lm AS (
    SELECT token, COUNT(*) AS c FROM tok GROUP BY token
), n AS (
    SELECT COUNT(*) AS n FROM tok
), scored AS (
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(CAST(SUM(CAST(ROUND(ln(CAST(lm.c AS DOUBLE) / n.n), 9)
                              AS DECIMAL(38,12)) ) AS DOUBLE)
                 / COUNT(*), 6) AS mean_logprob
    FROM tok t JOIN lm ON t.token = lm.token CROSS JOIN n
    GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, mean_logprob,
       CAST(NTILE(3) OVER (ORDER BY mean_logprob DESC, doc_id) AS BIGINT)
           AS bucket
FROM scored
ORDER BY doc_id
"""


@register("ccnet_perplexity_buckets", oracle=_CCNET_ORACLE, driver=False)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity partitioning: train a unigram LM on the
    corpus (one token-keyed count aggregate), score every document by
    mean log-probability (explode → broadcast LM join → per-doc
    decimal-exact fold of 9dp-rounded ln — the repo's bit-stable log
    device), and cut head/middle/tail TERCILES (bucket 1 = most
    predictable text, the slice CCNet keeps). 100 TB shape: the LM is
    vocabulary-sized (broadcast while it fits; drop the hint for
    web-scale vocabularies and let AQE shuffle), scoring is one explode
    + one broadcast join + one doc-keyed aggregate; the exact global
    NTILE pays one single-partition window over DOC-count rows (the
    same audited concession as price_histogram_equidepth — the sampled
    sketch variant is the named 100 TB escape). DuckDB retrains and
    rescores from raw text, so a count drift, a ln-policy mismatch, or
    a tercile boundary off by one flips the row red."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    lm = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    n_total = tok.count()
    logprob = F.round(
        F.log(F.col("c").cast("double") / F.lit(float(n_total))), 9
    ).cast("decimal(38,12)")
    scored = (
        tok.join(F.broadcast(lm.select("token", logprob.alias("lp"))), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum("lp").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_logprob"),
        )
    )
    w = Window.orderBy(F.col("mean_logprob").desc(), "doc_id")
    return scored.select(
        "doc_id",
        "n_tokens",
        "mean_logprob",
        F.ntile(3).over(w).cast("long").alias("bucket"),
    ).orderBy("doc_id")


_FERTILITY_ORACLE = f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
       ROUND(CAST(SUM(n_bpe) AS DOUBLE) / greatest(SUM(n_words), 1), 6)
           AS fertility
FROM (
    SELECT lang,
           len({_TOKS}) AS n_words,
           length(regexp_extract_all(text, '{{bpe}}')) AS n_bpe
    FROM documents
)
GROUP BY lang
ORDER BY lang
""".replace("{bpe}", "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")


@register("tokenizer_fertility_by_lang", oracle=_FERTILITY_ORACLE, driver=False)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language: BPE-ish tokens emitted per
    whitespace word — the statistic that decides vocabulary budgets
    and per-language compute in multilingual tokenizer training (a
    language at fertility 2.5 pays 2.5x the sequence length of one at
    1.1). One map-only codegen pass (two regexp counts per doc) + one
    language-keyed aggregate; exact integer sums, one final double
    division rounded 6dp — bit-stable. DuckDB recomputes both token
    censuses from raw text, so a tokenizer-pattern drift between
    engines flips the row red."""
    docs = read_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        TX.word_count(F.col("text")).cast("long").alias("n_words"),
        TX.bpe_token_count(F.col("text")).cast("long").alias("n_bpe"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_bpe").alias("n_bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_bpe_tokens",
            F.round(
                F.col("n_bpe_tokens").cast("double")
                / F.greatest(F.col("n_words"), F.lit(1)).cast("double"),
                6,
            ).alias("fertility"),
        )
        .orderBy("lang")
    )
