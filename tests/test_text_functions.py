"""Unit tests for text primitives on real (non-synthetic) samples —
the testdata corpus is English-like for every lang label, so the LID
heuristic is validated here instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.functions import text as TX

SAMPLES = [
    ("en", "the cat sat on the mat and looked to the door because it is late"),
    ("de", "der hund ist nicht im haus und die katze ist auch nicht da"),
    ("es", "el perro no es una mascota que los vecinos quieren en la casa"),
    ("fr", "le chien est dans le jardin et les enfants sont dans une maison"),
    ("zh", "我 是 不 在 的 了 好"),
]


def test_lid_predicts_real_languages(spark):
    df = spark.createDataFrame(SAMPLES, ["expected", "text"])
    toks = TX.tokens(F.col("text"))
    scores = {lang: TX.lid_score(toks, lang) for lang in TX.LID_ORDER}
    out = df.select("expected", TX.lid_predict(scores).alias("pred")).collect()
    for row in out:
        assert row["pred"] == row["expected"], row


def test_lid_und_on_no_markers(spark):
    df = spark.createDataFrame([("xyzzy plugh quux",)], ["text"])
    toks = TX.tokens(F.col("text"))
    scores = {lang: TX.lid_score(toks, lang) for lang in TX.LID_ORDER}
    assert df.select(TX.lid_predict(scores).alias("p")).first()["p"] == "und"


def test_normalize_and_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [("  The   QUICK fox ",), ("the quick fox",)], ["text"]
    )
    fps = [r["fp"] for r in df.select(TX.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]  # normalization makes them identical


def test_bpe_token_count(spark):
    df = spark.createDataFrame([("ab cd, 12!",)], ["text"])
    n = df.select(TX.bpe_token_count(F.col("text")).alias("n")).first()["n"]
    # ab, cd, ',', 1, 2, '!'
    assert n == 6


def test_hashed_doc_vectors_are_bag_of_words(spark):
    """Feature-hash embedding properties: deterministic, order-invariant
    (bag of words), and duplicated tokens accumulate linearly."""
    from pyspark_big_data_spark.queries.embed_hash import DIM, hashed_doc_vectors

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "gamma beta alpha"),          # permutation of 1
            (3, "alpha beta gamma alpha beta gamma"),  # 1 doubled
        ],
        "doc_id long, text string",
    )
    vecs = {r["doc_id"]: list(r["embedding"]) for r in hashed_doc_vectors(df).collect()}
    assert len(vecs[1]) == DIM
    assert vecs[1] == vecs[2]                          # order-invariant
    assert vecs[3] == [2 * v for v in vecs[1]]         # multiset-linear
    assert any(v != 0 for v in vecs[1])


def test_doc_embed_lsh_recall_vs_exact_witness(spark, sf_dir):
    """The bucketed scale twin must recover ≥90% of the guarded
    all-pairs witness's pair set (at cos ≥ 0.9 the 8×4 SRP config's
    expected recall is ~99.8%) and never emit a pair the witness
    doesn't have (exact cosine verify on candidates)."""
    from pyspark_big_data_spark.queries.embed_hash import (
        doc_embed_lsh_near_dup,
        doc_embed_near_dup,
    )

    truth = {(r["id_a"], r["id_b"]) for r in doc_embed_near_dup(spark, sf_dir).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in doc_embed_lsh_near_dup(spark, sf_dir).collect()}
    assert lsh <= truth
    assert len(lsh & truth) / len(truth) >= 0.9
