"""Inverted index (operators/inverted_index.py): build/search semantics
vs a brute-force model, bucket pruning, and tokenizer edge cases."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from pyspark_big_data_spark.operators.inverted_index import (
    build_inverted_index,
    phrase_search,
    read_doclen,
    read_term_postings,
    search_all_terms,
    term_buckets,
    tokenize_terms,
)

_DOCS = [
    (0, "Alpha beta GAMMA alpha"),
    (1, "beta gamma delta"),
    (2, "alpha delta, delta; beta!"),
    (3, "epsilon only"),
    (4, "ALPHA beta beta gamma zeta-42 zeta"),
]


def _model_search(terms):
    """Driver-side brute force: conjunctive match + total-tf score."""
    out = {}
    for doc_id, text in _DOCS:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        if all(t in toks for t in terms):
            out[doc_id] = sum(toks.count(t) for t in set(terms))
    return out


@pytest.fixture(scope="module")
def index_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("inv") / "idx")
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    build_inverted_index(df, "doc_id", "text", root, n_buckets=8)
    return root


def test_tokenizer_contract(spark):
    df = spark.createDataFrame(
        [(1, "Foo-bar  42, baz! foo")], "doc_id long, text string"
    )
    toks = [r["term"] for r in tokenize_terms(df, "doc_id", "text").collect()]
    assert sorted(toks) == ["42", "bar", "baz", "foo", "foo"]


@pytest.mark.parametrize(
    "terms",
    [["alpha"], ["alpha", "beta"], ["alpha", "beta", "gamma"], ["delta"],
     ["epsilon"], ["zeta", "42"]],
)
def test_search_matches_bruteforce(spark, index_root, terms):
    hits, _ = search_all_terms(spark, index_root, terms, 8)
    got = {r["doc_id"]: r["score"] for r in hits.collect()}
    assert got == _model_search(terms)


def test_unknown_term_yields_empty(spark, index_root):
    hits, _ = search_all_terms(spark, index_root, ["alpha", "nosuchterm"], 8)
    assert hits.count() == 0


def test_duplicate_query_terms_deduplicated(spark, index_root):
    once, _ = search_all_terms(spark, index_root, ["beta"], 8)
    twice, _ = search_all_terms(spark, index_root, ["beta", "beta"], 8)
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}


def test_bucket_pruning_touches_subset(spark, index_root):
    """The search must open only the query terms' buckets, and the files
    it reads must all live under those bucket directories."""
    tb = term_buckets(spark, ["alpha", "beta"], 8)
    hits, n_touched = search_all_terms(spark, index_root, ["alpha", "beta"], 8)
    assert n_touched == len(set(tb.values())) < 8
    allowed = {f"bucket={b}" for b in tb.values()}
    for f in hits.inputFiles():
        assert any(a in f for a in allowed), f


# ---------------------------------------------------------------------------
# Positional postings: phrase search + doclen sidecar
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pos_index_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("invpos") / "idx")
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    build_inverted_index(
        df, "doc_id", "text", root, n_buckets=8, positions=True,
        with_doclen=True,
    )
    return root


def _model_phrase(phrase):
    out = {}
    for doc_id, text in _DOCS:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        n = sum(
            1
            for i in range(len(toks) - len(phrase) + 1)
            if toks[i : i + len(phrase)] == phrase
        )
        if n:
            out[doc_id] = n
    return out


@pytest.mark.parametrize(
    "phrase",
    [["alpha", "beta"], ["beta", "gamma"], ["delta", "delta"],
     ["beta", "beta", "gamma"], ["gamma", "alpha"], ["zeta", "42", "zeta"]],
)
def test_phrase_matches_bruteforce(spark, pos_index_root, phrase):
    hits, _ = phrase_search(spark, pos_index_root, phrase, 8)
    got = {r["doc_id"]: r["n_occurrences"] for r in hits.collect()}
    assert got == _model_phrase(phrase)


def test_phrase_requires_positions(spark, index_root):
    with pytest.raises(ValueError, match="no positions column"):
        phrase_search(spark, index_root, ["alpha", "beta"], 8)


def test_doclen_sidecar(spark, pos_index_root):
    got = {r["doc_id"]: r["dl"] for r in read_doclen(spark, pos_index_root).collect()}
    want = {
        doc_id: len([t for t in re.split("[^a-z0-9]+", text.lower()) if t])
        for doc_id, text in _DOCS
    }
    assert got == want


def test_doclen_invisible_to_postings_reads(spark, pos_index_root):
    """Bucket-addressed postings reads must not pick up the sidecar."""
    postings, _ = read_term_postings(spark, pos_index_root, ["alpha"], 8)
    assert "dl" not in postings.columns
    assert all("doclen" not in f for f in postings.inputFiles())


# ---------------------------------------------------------------------------
# Incremental maintenance (streaming/incremental_index.py)
# ---------------------------------------------------------------------------


def test_incremental_appends_equal_one_shot_build(spark, tmp_path):
    """Batch-split invariance at the index level: two process_index_batch
    appends reproduce the one-shot build's postings AND doclen rows
    exactly (including position lists)."""
    from pyspark_big_data_spark.streaming.incremental_index import (
        process_index_batch,
    )

    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    one_shot = str(tmp_path / "one")
    build_inverted_index(
        df, "doc_id", "text", one_shot, n_buckets=8, positions=True,
        with_doclen=True,
    )
    inc = str(tmp_path / "inc")
    for i in (0, 1):  # cold-start first append, then a second
        process_index_batch(
            df.filter(F.col("doc_id") % 2 == i),
            inc,
            n_buckets=8,
            positions=True,
            with_doclen=True,
        )

    def postings_set(root):
        import glob

        dirs = sorted(glob.glob(f"{root}/bucket=*"))
        rows = spark.read.parquet(*dirs).collect()
        return {
            (r["term"], r["doc_id"], r["tf"], tuple(r["positions"])) for r in rows
        }

    assert postings_set(inc) == postings_set(one_shot)
    assert {tuple(r) for r in read_doclen(spark, inc).collect()} == {
        tuple(r) for r in read_doclen(spark, one_shot).collect()
    }


def test_missing_bucket_dirs_are_absence_proofs(spark, tmp_path):
    """A query term whose bucket directory was never created must yield
    empty results, not a read error — and when every query bucket is
    missing, the typed empty frames come back."""
    root = str(tmp_path / "sparse")
    df = spark.createDataFrame([(1, "alpha alpha")], "doc_id long, text string")
    build_inverted_index(df, "doc_id", "text", root, n_buckets=64, positions=True)
    # conjunction with a term hashed to a (missing) different bucket
    hits, _ = search_all_terms(spark, root, ["alpha", "unseenword"], 64)
    assert hits.count() == 0
    # all query buckets missing entirely
    hits, _ = search_all_terms(spark, root, ["unseenword"], 64)
    assert hits.columns == ["doc_id", "score"] and hits.count() == 0
    ph, _ = phrase_search(spark, root, ["unseenword", "unseenword"], 64)
    assert ph.columns == ["doc_id", "n_occurrences"] and ph.count() == 0
