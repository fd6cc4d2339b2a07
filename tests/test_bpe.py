"""BPE merge learning vs an independent pure-Python Sennrich
implementation — exact merge-sequence agreement."""

from __future__ import annotations

import re
from collections import Counter

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.operators.bpe import learn_merges, merge_pair, word_symbol_table

_N = 8


def _py_learn(texts: list[str], n_merges: int):
    """Reference Sennrich BPE on word frequencies."""
    wc: Counter = Counter()
    for t in texts:
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        for w in norm.split(" "):
            if w:
                wc[w] += 1
    vocab = {w: list(w) + ["</w>"] for w in wc}
    out = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            f = wc[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        # highest count, then lexicographic (left, right)
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append({"rank": rank, "left": left, "right": right, "cnt": cnt})
        merged = left + right
        for w, syms in vocab.items():
            i, new = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = new
    return out


def test_learned_merges_match_python_reference(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _py_learn(texts, _N)
    got = learn_merges(docs, _N)
    assert got == want
    assert len(got) == _N  # corpus rich enough for all merges


def test_merge_pair_fold_matches_python_greedy(spark):
    """The HOF fold must implement EXACTLY greedy left-to-right
    non-overlapping merging, including runs of the same symbol."""
    from pyspark.sql import functions as F

    cases = [
        (["a", "a", "a"], "a", "a", ["aa", "a"]),
        (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
        (["x", "a", "b", "a", "b"], "a", "b", ["x", "ab", "ab"]),
        (["a", "b", "b"], "a", "b", ["ab", "b"]),
        (["b", "a", "b"], "a", "b", ["b", "ab"]),
        (["a"], "a", "a", ["a"]),
        ([], "a", "b", []),
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, *_rest) in enumerate(cases)], ["i", "syms"]
    )
    for i, (syms, left, right, want) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(merge_pair(F.col("syms"), left, right).alias("m"))
            .collect()[0]["m"]
        )
        assert got == want, f"case {i}: {syms} merge ({left},{right})"


def test_word_symbol_table_weights(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    vocab = word_symbol_table(docs).collect()
    assert all(r["syms"][-1] == "</w>" for r in vocab)
    assert all(len(r["syms"]) == len(r["word"]) + 1 for r in vocab)
    assert all(r["freq"] >= 1 for r in vocab)


def test_bpe_tokenize_matches_python_apply(spark, sf_dir):
    """Distributed apply (vocab folds + broadcast join) == the Python
    reference's per-word greedy application, doc by doc."""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.operators.bpe import bpe_tokenize

    docs = read_table(spark, sf_dir, "documents").limit(50)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    merges = _py_learn([r for r in texts.values()], _N)

    got = {
        r["doc_id"]: r["subwords"]
        for r in bpe_tokenize(docs, merges).collect()
    }

    def py_word(w):
        syms = list(w) + ["</w>"]
        for m in merges:
            left, right, merged = m["left"], m["right"], m["left"] + m["right"]
            i, new = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            syms = new
        return syms

    for doc_id, text in texts.items():
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        want = [s for w in norm.split(" ") if w for s in py_word(w)]
        assert got.get(doc_id, []) == want, f"doc {doc_id}"


def test_bpe_pair_counts_row1_is_the_first_merge(spark, sf_dir):
    """The oracled bpe_pair_counts query's rank-1 row must be exactly
    the first merge the learner commits to — the externalized
    distributed core and the driver-looped learner agree."""
    from pyspark_big_data_spark.operators.bpe import learn_merges
    from pyspark_big_data_spark.queries.text_analysis import bpe_pair_counts

    top = bpe_pair_counts(spark, sf_dir).orderBy("rnk").first()
    first = learn_merges(read_table(spark, sf_dir, "documents"), n_merges=1)[0]
    assert (top["left_sym"], top["right_sym"], top["cnt"]) == (
        first["left"],
        first["right"],
        first["cnt"],
    )
