"""Invariant tests for corpus-level ops (BM25, span dedup, PII scrub,
deterministic sampling, fast-hash minhash tier). Differential
correctness vs DuckDB is covered by test_oracle_parity; these pin the
semantics the oracle can't see (determinism, guards, tier agreement).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.queries.corpus_ops import (
    BM25_TERMS,
    BM25_TOPK,
    QUOTA_K,
    SAMPLE_PCT,
    bm25_topk,
    pii_scrub,
    sample_hash_bucket,
    sample_stratified_quota,
    span_dedup_chunks,
)
from pyspark_big_data_spark.queries.dedup import dedup_minhash_fast, dedup_minhash_lsh


def test_bm25_topk_matches_query_terms(spark, sf_dir):
    rows = bm25_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOPK
    # every scored doc matched at least one query term, scores descend
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert sum(r[f"tf_{t}"] for t in BM25_TERMS) > 0
        assert r.score > 0


def test_span_dedup_counts_are_consistent(spark, sf_dir):
    df = span_dedup_chunks(spark, sf_dir)
    # a doc that fully duplicates an earlier doc keeps 0 chunks, so the
    # only hard invariants are the count identity and n_chunks >= 1
    bad = df.filter(
        (F.col("n_kept") + F.col("n_dropped") != F.col("n_chunks")) | (F.col("n_chunks") < 1)
    )
    assert bad.count() == 0
    # global uniqueness: total kept chunks == number of distinct chunk fps
    total_kept = df.agg(F.sum("n_kept")).collect()[0][0]
    assert total_kept > 0


def test_pii_scrub_removes_planted_pii(spark, sf_dir):
    rows = pii_scrub(spark, sf_dir).collect()
    for r in rows[:50]:
        if r.doc_id % 3 != 0:
            assert r.n_emails >= 1, f"doc {r.doc_id} planted email not counted"
        if r.doc_id % 2 == 0:
            assert r.n_phones >= 1, f"doc {r.doc_id} planted phone not counted"
    # scrubbed text fingerprints differ from raw wherever PII was planted
    assert any(r.n_emails > 0 for r in rows) and any(r.n_phones > 0 for r in rows)


def test_hash_sample_is_deterministic_and_near_rate(spark, sf_dir):
    a = sample_hash_bucket(spark, sf_dir)
    b = sample_hash_bucket(spark, sf_dir)
    ra, rb = a.collect(), b.collect()
    assert [r.doc_id for r in ra] == [r.doc_id for r in rb]  # pure function of seed+id
    assert all(r.bucket < SAMPLE_PCT for r in ra)
    n_total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rate = len(ra) / n_total
    assert 0.03 < rate < 0.25, f"sample rate {rate} far from {SAMPLE_PCT}%"


def test_stratified_quota_caps_every_stratum(spark, sf_dir):
    df = sample_stratified_quota(spark, sf_dir)
    per = df.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n")).collect()
    assert per and all(r.n <= QUOTA_K for r in per)
    assert df.filter(F.col("rn") > QUOTA_K).count() == 0
    # deterministic: same selection on rerun
    assert sorted(r.doc_id for r in df.collect()) == sorted(
        r.doc_id for r in sample_stratified_quota(spark, sf_dir).collect()
    )


def test_fast_minhash_tier_finds_true_near_dups(spark, sf_dir):
    """Both hash tiers are 16-perm MinHash estimators: on this corpus the
    est>=0.5 band is mostly estimator noise over true-Jaccard ~0.2 word
    salads (borderline pairs flip freely between hash families), so the
    contract is recall of TRUE near-dups — exact shingle Jaccard >= 0.8
    over the union of both tiers' findings — not pair-set equality."""
    from pyspark_big_data_spark.operators import dedup as DD
    from pyspark_big_data_spark.io import read_table

    md5_pairs = {(r.id_a, r.id_b) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    fast_pairs = {(r.id_a, r.id_b) for r in dedup_minhash_fast(spark, sf_dir).collect()}
    assert md5_pairs and fast_pairs

    union = sorted(md5_pairs | fast_pairs)
    docs = read_table(spark, sf_dir, "documents")
    sh = DD.shingles(docs)
    cand = spark.createDataFrame(union, ["id_a", "id_b"])
    truth = {
        (r.id_a, r.id_b)
        for r in DD.exact_jaccard(cand, sh).filter(F.col("jaccard") >= 0.8).collect()
    }
    assert truth, "no true near-dups among candidates — degenerate fixture?"
    for label, found in (("md5", md5_pairs), ("xxhash64", fast_pairs)):
        recall = len(truth & found) / len(truth)
        assert recall >= 0.9, f"{label} tier misses true near-dups: recall {recall:.2f}"


def test_vocab_stats_order_and_bounds(spark, sf_dir):
    from pyspark_big_data_spark.queries.corpus_ops import VOCAB_TOP, vocab_stats

    rows = vocab_stats(spark, sf_dir).collect()
    assert 0 < len(rows) <= VOCAB_TOP
    cfs = [r.cf for r in rows]
    assert cfs == sorted(cfs, reverse=True)
    assert all(r.df <= r.cf for r in rows)  # df can never exceed cf


def test_decontamination_flags_only_corpus_docs(spark, sf_dir):
    from pyspark_big_data_spark.queries.corpus_ops import (
        CONTAM_MIN_SHARED,
        PROBE_MOD,
        decontaminate_vs_probes,
    )

    rows = decontaminate_vs_probes(spark, sf_dir).collect()
    assert rows, "no contamination found — fixture should contain planted dups"
    for r in rows:
        assert r.doc_id % PROBE_MOD != 0, "a probe doc flagged itself"
        assert r.probe_id % PROBE_MOD == 0
        assert r.n_shared_chunks >= CONTAM_MIN_SHARED


def test_mixture_upsample_copies_match_weights(spark, sf_dir):
    from pyspark_big_data_spark.queries.corpus_ops import MIX_WEIGHTS, mixture_upsample

    df = mixture_upsample(spark, sf_dir)
    per_lang = {
        r.lang: r.n
        for r in df.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    base = {
        r.lang: r.n
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, w in MIX_WEIGHTS.items():
        if lang not in base:
            continue
        ratio = per_lang.get(lang, 0) / base[lang]
        # fractional part is a hash draw: allow sampling noise around w
        assert abs(ratio - w) < 0.35, f"{lang}: ratio {ratio:.2f} vs weight {w}"
    # deterministic on rerun
    assert df.count() == mixture_upsample(spark, sf_dir).count()


def test_pack_sequences_conserves_tokens_and_bounds_packs(spark, sf_dir):
    from pyspark_big_data_spark.queries.corpus_ops import (
        PACK_BUDGET,
        PACK_NSHARDS,
        pack_sequences,
    )
    from pyspark_big_data_spark.functions import text as TX

    rows = pack_sequences(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total_toks = docs.select(
        F.sum(F.size(TX.tokens(F.col("text"))).cast("long")).alias("n")
    ).collect()[0].n
    # token conservation: every document lands in exactly one pack
    assert sum(r.pack_tokens for r in rows) == total_toks
    for r in rows:
        assert 0 <= r.shard < PACK_NSHARDS
        assert r.pack_id >= 0
        assert r.n_split_docs <= r.n_docs
    # within a (lang, shard) stream, pack ids are contiguous from 0 and
    # every pack except possibly the last starts below the budget line
    from collections import defaultdict

    streams = defaultdict(list)
    for r in rows:
        streams[(r.lang, r.shard)].append(r)
    for key, packs in streams.items():
        packs.sort(key=lambda r: r.pack_id)
        assert [p.pack_id for p in packs] == list(range(len(packs))), key


def test_repetition_metrics_flags_planted_repeats(spark, sf_dir):
    from pyspark_big_data_spark.queries.corpus_ops import repetition_metrics

    rows = repetition_metrics(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    kept = [r for r in rows if r.keep == 1]
    assert 0 < len(kept) < len(rows), "thresholds should split the corpus"
    for r in rows:
        assert 0.0 < r.distinct_frac <= 1.0
        assert 0.0 < r.top_token_frac <= 1.0
        assert 0.0 <= r.top_bigram_frac <= 1.0
        # the mode can't be rarer than the uniform floor (round-6 slack)
        assert r.top_token_frac * r.n_toks >= 1.0 - 1e-4


def test_bigram_fluency_matches_python_tokenization(spark, sf_dir):
    import re

    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.queries.corpus_ops import bigram_fluency

    out = {r["doc_id"]: r for r in bigram_fluency(spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    n_expected = 0
    for r in docs:
        toks = re.sub(r"\s+", " ", r["text"].lower()).strip().split(" ")
        if len(toks) < 2:
            assert r["doc_id"] not in out
            continue
        n_expected += 1
        row = out[r["doc_id"]]
        assert row["n_bigrams"] == len(toks) - 1
        assert row["mean_logp"] < 0  # smoothed probability is always < 1
    assert len(out) == n_expected


def test_dup_span_extract_semantics(spark, tmp_path):
    """A 12-token run duplicated across two docs must come back as ONE
    merged span (all 5 overlapping 8-gram hits coalesce) covering
    exactly the duplicated tokens in the non-survivor doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_big_data_spark.queries.corpus_ops import _DSPAN_K, dup_span_extract

    run = " ".join(f"t{i}" for i in range(12))  # the duplicated run
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": [f"{uniq_a} {run}", f"{run} {uniq_b}"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": pa.array([0, 0], type=pa.int64()),
        }
    )
    sf = tmp_path / "mini"
    sf.mkdir()
    pq.write_table(tbl, str(sf / "documents.parquet"))

    spans = dup_span_extract(spark, str(sf)).collect()
    # doc 1 wins the survivor race on every shared gram (doc_id*SCALE+pos);
    # doc 2's grams at pos 1..5 are dups -> one island [1, 12]
    assert [(r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"]) for r in spans] == [
        (2, 1, 12, 12)
    ]
    assert 12 - 1 + 1 >= _DSPAN_K


def test_dup_span_extract_short_and_empty_docs(spark, tmp_path):
    """Docs with fewer than k tokens (incl. empty/whitespace-only text)
    must emit NO windows and NO error: Spark's sequence(1, 0) descends
    ([1, 0]) and pos=0 would throw in slice, so the short-doc guard is a
    correctness requirement, not a micro-optimization. Long-doc results
    must be unaffected by short docs in the same corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_big_data_spark.queries.corpus_ops import dup_span_extract

    run = " ".join(f"t{i}" for i in range(12))
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "text": [
                run,  # survivor
                run,  # full-doc dup -> one span
                "just three tokens",  # < k: must not explode
                "",  # empty
                "   ",  # whitespace-only
            ],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": pa.array([0] * 5, type=pa.int64()),
        }
    )
    sf = tmp_path / "mini_short"
    sf.mkdir()
    pq.write_table(tbl, str(sf / "documents.parquet"))

    spans = dup_span_extract(spark, str(sf)).collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"]) for r in spans] == [
        (2, 1, 12, 12)
    ]


def test_doc_chunk_overlap_properties(spark, sf_dir):
    """Chunks tile each doc with the configured overlap: chunk_no is
    contiguous from 0, every chunk except possibly the last is full
    width, consecutive full chunks overlap by W - stride tokens, and
    every token position is covered."""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.functions import text as TX
    from pyspark_big_data_spark.io import read_table
    from pyspark_big_data_spark.queries.corpus_ops import (
        CHUNK_STRIDE,
        CHUNK_W,
        doc_chunk_overlap,
    )

    rows = doc_chunk_overlap(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)

    lens = {
        r["doc_id"]: r["n"]
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(TX.tokens(F.col("text"))).alias("n"))
        .collect()
    }
    assert set(by_doc) == set(lens)  # every doc chunks, even short ones
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_no"])
        assert [c["chunk_no"] for c in chunks] == list(range(len(chunks)))
        n = lens[doc_id]
        # last chunk ends at the last token; full coverage with stride
        last = chunks[-1]
        assert last["chunk_no"] * CHUNK_STRIDE + last["n_tokens"] == n
        for c in chunks[:-1]:
            assert c["n_tokens"] == CHUNK_W  # only the tail may be short


def test_cluster_keyed_split_has_zero_leakage(spark, sf_dir):
    """The audit's promised fix: splitting by duplicate-CLUSTER instead
    of by document puts every near-dup pair on one side, so zero pairs
    cross. (The doc-keyed split leaks by construction — also asserted,
    so the audit is a real detector.)"""
    from pyspark.sql import functions as F

    from pyspark_big_data_spark.functions.text import hash48
    from pyspark_big_data_spark.queries.dedup import (
        _SPLIT_MOD,
        dedup_clusters,
        dedup_minhash_lsh,
        split_leakage_audit,
    )

    # doc-keyed split: leaks on this corpus (non-degenerate detector)
    assert split_leakage_audit(spark, sf_dir).count() > 0

    # cluster-keyed split: every doc inherits its component's split
    pairs = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    comp = dedup_clusters(spark, sf_dir)  # (doc_id, cluster_id)
    split = F.when(
        hash48(F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))) % _SPLIT_MOD
        == 0,
        F.lit("val"),
    ).otherwise(F.lit("train"))
    sp = comp.select("doc_id", split.alias("split"))
    crossed = (
        pairs.join(sp.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")), "id_a")
        .join(sp.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")), "id_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert crossed == 0
