"""As-of join operator semantics (operators/asof.py).

The oracle-parity gate already pins the two registered event-stream
twins against DuckDB's native ASOF JOIN at sf0.001; these tests pin the
operator's edge semantics on hand-built frames — tie modes, direction,
tolerance, left-ness, row-atomic struct carry — and the plan shape
(one window, no join node at all).
"""

from __future__ import annotations

import datetime as dt

from pyspark_big_data_spark.operators.asof import asof_join
from pyspark_big_data_spark.testing import physical_plan


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    probes = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 00:00:10")),
            (2, "k1", _ts("2024-01-01 00:00:20")),
            (3, "k1", _ts("2024-01-01 00:00:05")),  # before any quote
            (4, "k2", _ts("2024-01-01 00:00:20")),  # key with no quotes
        ],
        "pid long, k string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 00:00:10"), 10.0, "a"),  # ties probe 1 exactly
            ("k1", _ts("2024-01-01 00:00:15"), 15.0, None),  # null payload col
        ],
        "k string, ts timestamp, v double, tag string",
    )
    return probes, quotes


def test_backward_inclusive_and_left_semantics(spark):
    probes, quotes = _frames(spark)
    out = {
        r["pid"]: (r["q_v"], r["q_tag"])
        for r in asof_join(probes, quotes, on=["k"]).collect()
    }
    assert out[1] == (10.0, "a")  # equal-ts quote visible (inclusive)
    assert out[2] == (15.0, None)  # latest quote; null tag comes from THAT row
    assert out[3] == (None, None)  # probe precedes all quotes
    assert out[4] == (None, None)  # keyless probe survives (left join)
    assert len(out) == 4


def test_backward_strict_skips_equal_timestamp(spark):
    probes, quotes = _frames(spark)
    out = {
        r["pid"]: r["q_v"]
        for r in asof_join(probes, quotes, on=["k"], strict=True).collect()
    }
    assert out[1] is None  # the only at-or-before quote ties exactly
    assert out[2] == 15.0


def test_forward_directions(spark):
    probes, quotes = _frames(spark)
    inclusive = {
        r["pid"]: r["q_v"]
        for r in asof_join(probes, quotes, on=["k"], direction="forward").collect()
    }
    assert inclusive[1] == 10.0  # equal ts qualifies
    assert inclusive[3] == 10.0  # earliest at-or-after
    assert inclusive[2] is None  # nothing after 00:00:20
    strict = {
        r["pid"]: r["q_v"]
        for r in asof_join(probes, quotes, on=["k"], direction="forward", strict=True).collect()
    }
    assert strict[1] == 15.0  # equal-ts quote invisible, next one carried


def test_tolerance_voids_stale_matches(spark):
    probes, quotes = _frames(spark)
    out = {
        r["pid"]: (r["q_v"], r["q_ts"])
        for r in asof_join(probes, quotes, on=["k"], tolerance_secs=4).collect()
    }
    assert out[2] == (None, None)  # 15s-old quote voided by 4s horizon
    assert out[1] == (10.0, _ts("2024-01-01 00:00:10"))  # 0s gap kept


def test_plan_has_window_but_no_join(spark):
    probes, quotes = _frames(spark)
    plan = physical_plan(asof_join(probes, quotes, on=["k"]))
    assert "Window" in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoop", "CartesianProduct"):
        assert node not in plan, f"as-of join should not plan a {node}"


def test_probe_ts_column_appears_exactly_once(spark):
    """The probe timestamp is re-added from the window's internal ts
    column, so the payload list must exclude it — a duplicate would make
    every downstream reference AMBIGUOUS_REFERENCE (r9 advice item)."""
    probes, quotes = _frames(spark)
    out = asof_join(probes, quotes, on=["k"])
    assert out.columns == ["k", "ts", "pid", "q_ts", "q_v", "q_tag"]
    # the regression shape: selecting the ts column must not raise
    assert out.select("ts").count() == 4


def test_null_timestamps_never_match(spark):
    """SQL inequality against NULL never matches: a null-ts quote is
    invisible in BOTH directions (it would otherwise sort first under
    asc-nulls-first and be carried), and a null-ts probe survives with
    null quote columns (it would otherwise sort last under
    desc-nulls-last in forward mode and pick up a quote)."""
    probes = spark.createDataFrame(
        [(1, "k1", _ts("2024-01-01 00:00:20")), (2, "k1", None)],
        "pid long, k string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [("k1", None, 7.0), ("k1", _ts("2024-01-01 00:00:10"), 9.0)],
        "k string, ts timestamp, v double",
    )
    back = {r["pid"]: r["q_v"] for r in asof_join(probes, quotes, on=["k"]).collect()}
    assert back == {1: 9.0, 2: None}
    fwd = {
        r["pid"]: r["q_v"]
        for r in asof_join(probes, quotes, on=["k"], direction="forward").collect()
    }
    assert fwd == {1: None, 2: None}


def test_null_keyed_rows_follow_sql_equality(spark):
    """Null keys never equi-match (SQL three-valued logic): a
    null-keyed quote matches NO probe, a null-keyed probe carries NO
    quote — but survives (left semantics), matching ASOF JOIN."""
    probes = spark.createDataFrame(
        [(1, None, _ts("2024-01-01 00:00:20")), (2, "k1", _ts("2024-01-01 00:00:20"))],
        "pid long, k string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [(None, _ts("2024-01-01 00:00:10"), 7.0), ("k1", _ts("2024-01-01 00:00:10"), 9.0)],
        "k string, ts timestamp, v double",
    )
    out = {r["pid"]: r["q_v"] for r in asof_join(probes, quotes, on=["k"]).collect()}
    assert out == {1: None, 2: 9.0}
