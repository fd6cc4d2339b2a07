"""Behavioral pins for the hybrid RRF fusion (oracle parity itself is
covered by the test_oracle_parity sweep)."""

from __future__ import annotations

from pyspark_big_data_spark.queries.hybrid_retrieval import (
    _DEN_N,
    _FINAL_K,
    _LEX_N,
    _PROBE_DOC,
    _RRF_K,
    hybrid_rrf_topk,
)


def test_rrf_output_shape_and_bounds(spark, sf_dir):
    rows = hybrid_rrf_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= _FINAL_K
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["doc_id"] != _PROBE_DOC  # probe never retrieves itself
        assert r["lex_rnk"] is None or 1 <= r["lex_rnk"] <= _LEX_N
        assert r["den_rnk"] is None or 1 <= r["den_rnk"] <= _DEN_N
        # at least one list contributed, and the score is exactly the
        # RRF sum of the emitted ranks
        expect = 0.0
        if r["lex_rnk"] is not None:
            expect += 1.0 / (_RRF_K + r["lex_rnk"])
        if r["den_rnk"] is not None:
            expect += 1.0 / (_RRF_K + r["den_rnk"])
        assert expect > 0.0
        assert abs(r["rrf_score"] - expect) < 1e-9


def test_rrf_scores_nonincreasing(spark, sf_dir):
    rows = hybrid_rrf_topk(spark, sf_dir).collect()
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rrf_both_lists_beat_single_list_at_equal_ranks(spark, sf_dir):
    """A doc ranked r in BOTH lists must outscore a doc ranked r in only
    one — the defining property of the fusion."""
    rows = hybrid_rrf_topk(spark, sf_dir).collect()
    both = [r for r in rows if r["lex_rnk"] is not None and r["den_rnk"] is not None]
    single = [r for r in rows if (r["lex_rnk"] is None) != (r["den_rnk"] is None)]
    for b in both:
        for s in single:
            s_rank = s["lex_rnk"] if s["lex_rnk"] is not None else s["den_rnk"]
            if max(b["lex_rnk"], b["den_rnk"]) <= s_rank:
                assert b["rrf_score"] > s["rrf_score"]


def test_rerank_is_a_permutation_of_the_fused_set(spark, sf_dir):
    """Rerank never adds or drops candidates — it reorders the fused
    top-K by the exact Jaccard scorer."""
    from pyspark_big_data_spark.queries.hybrid_retrieval import hybrid_rerank_topk

    fused = {r["doc_id"] for r in hybrid_rrf_topk(spark, sf_dir).collect()}
    rer = hybrid_rerank_topk(spark, sf_dir).collect()
    assert {r["doc_id"] for r in rer} == fused
    jacs = [r["jaccard"] for r in sorted(rer, key=lambda r: r["rnk"])]
    assert jacs == sorted(jacs, reverse=True)
    for r in rer:
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["n_shared"] <= r["n_union"]
