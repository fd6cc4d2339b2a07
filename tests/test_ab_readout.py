"""Semantic gates for ab_test_readout (oracle parity runs in the
test_oracle_parity sweep)."""

from __future__ import annotations

import math

from pyspark_big_data_spark.queries.statistics import ab_test_readout


def test_welch_invariants(spark, sf_dir):
    r = ab_test_readout(spark, sf_dir).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_a > 1 and row.n_b > 1
    # t carries the sign of the lift
    assert math.copysign(1, row.t_stat) == math.copysign(1, row.lift) or row.lift == 0
    # Welch-Satterthwaite df is bounded by [min(n)-1, n_a+n_b-2]
    assert min(row.n_a, row.n_b) - 1 <= row.welch_df <= row.n_a + row.n_b - 2
    # a null A/A-style hash split on homogeneous synthetic data should
    # not read as a wildly significant effect (|t| ~ N(0,1) here; 6 is
    # far beyond any plausible draw and would indicate a broken
    # variance term rather than a real difference)
    assert abs(row.t_stat) < 6
