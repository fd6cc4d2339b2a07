"""PageRank invariants (bit-exact oracle parity is covered by the
test_oracle_parity sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_big_data_spark.queries.graph_rank import _DAMP, trade_pagerank


def test_pagerank_mass_conserved(spark, sf_dir):
    """With dangling-mass redistribution, total rank stays 1 after any
    number of iterations (the invariant naive implementations leak)."""
    pr = trade_pagerank(spark, sf_dir)
    total = pr.agg(F.sum("pagerank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_pagerank_positive_and_teleport_floor(spark, sf_dir):
    """Every node holds at least the teleport mass (1-d)/N."""
    rows = trade_pagerank(spark, sf_dir).collect()
    n = len(rows)
    floor = (1.0 - _DAMP) / n
    for r in rows:
        assert r["pagerank"] >= floor - 1e-12


def test_suppliers_accumulate_rank(spark, sf_dir):
    """Suppliers are the only nodes with in-edges, so the mean supplier
    rank must exceed the mean customer rank."""
    rows = trade_pagerank(spark, sf_dir).collect()
    supp = [r["pagerank"] for r in rows if r["is_supplier"]]
    cust = [r["pagerank"] for r in rows if not r["is_supplier"]]
    assert supp and cust
    assert sum(supp) / len(supp) > sum(cust) / len(cust)
