"""Distributed BPE merge learning (Sennrich et al., 2016).

Tokenizer TRAINING — the missing half next to the engine's token
counting: learn the top-N byte-pair merges from the corpus. The
classic scalable formulation works on the DISTINCT-WORD table with
frequencies (corpus-size-independent after the first aggregate):

    per iteration:
      1. adjacent-pair counts over the vocab's symbol arrays, weighted
         by word frequency       (explode + groupBy — distributed)
      2. argmax pair with deterministic tie-break
                                 (orderBy+limit(1) — 1-row driver pull)
      3. greedy left-to-right merge of that pair in every word's
         symbol array            (HOF fold — JVM-side map over vocab)

So each iteration is one shuffle over the vocab table plus a 1-row
collect — at 100 TB the corpus is touched ONCE (the word-count
aggregate); all N iterations run on the distinct-word table, which is
orders of magnitude smaller. The symbol-merge fold is an interpreted
HOF but runs once per distinct word per iteration, not per token.

No SQL oracle (the fold's array-building accumulator has no DuckDB
lambda twin); tests/test_bpe.py pins the learned merges EXACTLY
against an independent pure-Python Sennrich implementation, plus
invariants (counts non-increasing is NOT guaranteed by BPE, but merge
applicability and greedy semantics are).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pyspark_big_data_spark.functions import text as TX


def word_symbol_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, syms array<string>): distinct words with corpus
    frequency, symbols initialized to characters plus a </w> end mark
    (so merges cannot cross word boundaries when re-applied)."""
    toks = docs.select(F.explode(TX.tokens(F.col(text_col))).alias("word")).filter(
        F.col("word") != ""
    )
    wc = toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    syms = F.concat(
        F.split(F.col("word"), ""),  # characters
        F.array(F.lit("</w>")),
    )
    return wc.select("word", "freq", syms.alias("syms"))


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, cnt): adjacent symbol-pair counts weighted by word
    frequency — one explode + one aggregate over the vocab table."""
    n = F.size("syms")
    pairs = vocab.select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice("syms", 1, n - 1),
                F.slice("syms", 2, n - 1),
                lambda a, b: F.struct(a.alias("left"), b.alias("right")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right")).agg(
        F.sum("freq").alias("cnt")
    )


def merge_pair(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (left, right) into
    one symbol, as a JVM-side fold: append each symbol, merging with
    the accumulator's last element when it equals `left` AND the last
    element was not itself produced by a merge consuming this position
    (greedy fold semantics — identical to the reference Python model).
    """
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        can = (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right))
        # guard: if the last element was ALREADY merged this pass it no
        # longer equals `left` (it equals left+right), so the equality
        # check alone implements non-overlap — except when left+right
        # == left (impossible: right is non-empty).
        return F.when(
            can,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def learn_merges(docs: DataFrame, n_merges: int, text_col: str = "text") -> list[dict]:
    """Learn the top-``n_merges`` BPE merges; returns
    [{"rank", "left", "right", "cnt"}, ...] in merge order. Tie-break:
    highest weighted count, then lexicographic (left, right)."""
    vocab = word_symbol_table(docs, text_col).localCheckpoint(eager=True)
    out: list[dict] = []
    for rank in range(1, n_merges + 1):
        top = (
            pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        out.append(
            {"rank": rank, "left": r["left"], "right": r["right"], "cnt": r["cnt"]}
        )
        vocab = vocab.select(
            "word", "freq", merge_pair(F.col("syms"), r["left"], r["right"]).alias("syms")
        ).localCheckpoint(eager=True)
    return out


def apply_merges(vocab: DataFrame, merges: list[dict]) -> DataFrame:
    """Apply a learned merge list to a word-symbol table, in merge
    order (each merge is one vocab-sized fold pass — N chained column
    expressions, no corpus touch)."""
    syms = F.col("syms")
    for m in merges:
        syms = merge_pair(syms, m["left"], m["right"])
    return vocab.select("word", "freq", syms.alias("syms"))


def bpe_tokenize(docs: DataFrame, merges: list[dict], text_col: str = "text") -> DataFrame:
    """(doc_id, subwords array<string>): tokenize the corpus with the
    trained merges. The merge chain runs once per DISTINCT word (the
    vocab table), then a broadcast join maps each document's words to
    their subword arrays and flattens — the corpus itself is touched by
    one tokenize + one join, never by the merge folds."""
    vocab = apply_merges(word_symbol_table(docs, text_col), merges).select("word", "syms")
    words = docs.select(
        "doc_id", F.posexplode(TX.tokens(F.col(text_col))).alias("pos", "word")
    ).filter(F.col("word") != "")
    return (
        words.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("syms")))
                    ),
                    lambda s: s["syms"],
                )
            ).alias("subwords")
        )
    )
