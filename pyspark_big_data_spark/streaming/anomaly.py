"""Streaming per-entity anomaly detection (stateful z-score).

The streaming twin of ``queries/event_windows.py::event_value_anomalies``:
each arriving event is scored against the user's history AT THAT MOMENT
(expanding window — exactly what the batch query's
``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`` frame computes),
then folded into state. State per user is one (n, Σx, Σx²) triple — the
sufficient statistics, never the history itself — so state size is
O(users) regardless of stream length.

Exactness contract: the batch twin sums through DECIMAL(30,8)
(functions/aggregates.py policy). The state here carries the SAME
quantities as integer multiples of 10⁻⁸ (Python ints — arbitrary
precision, order-independent), converts to double only at scoring time,
and then runs the identical IEEE-double mean/var/sqrt expression — so a
chronologically-replayed stream reproduces the batch flags and z-scores
bit-for-bit (asserted in tests/test_streaming.py). Out-of-order arrival
WITHIN a micro-batch is repaired by an in-batch sort; cross-batch late
data is the documented trade: an event arriving after a later event was
already scored sees a larger history than the batch twin would give it
(the same trade dropDuplicatesWithinWatermark makes for dedup).
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pyspark_big_data_spark.queries.event_windows import _ANOM_MIN_PRIOR, _ANOM_Z

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_prior", T.LongType()),
        T.StructField("z", T.DoubleType()),
    ]
)

# Σx and Σx² as DECIMAL(30,8)-equivalent integer multiples of 1e-8,
# carried as strings: they exceed int64 long before they exceed Python
# int, and the state store schema has no arbitrary-precision integer.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s_scaled", T.StringType()),
        T.StructField("q_scaled", T.StringType()),
    ]
)

_SCALE = Decimal("0.00000001")  # 1e-8: the DECIMAL(30,8) quantum


def _dec8(x: float) -> int:
    """value -> integer multiple of 1e-8 via the same double->DECIMAL(30,8)
    rounding Spark's cast applies (half-up; a binary fraction never sits
    exactly on the half, so the mode is moot — see aggregates.py)."""
    return int(Decimal(x).quantize(_SCALE, rounding=ROUND_HALF_UP) / _SCALE)


def _score(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s, q = (
        (state.get[0], int(state.get[1]), int(state.get[2])) if state.exists else (0, 0, 0)
    )
    out: list[tuple[int, int, float, int, float]] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for event_id, value in zip(pdf["event_id"], pdf["value"]):
            v = float(value)
            if n >= _ANOM_MIN_PRIOR:
                # identical IEEE-double expression as the batch twin,
                # on identical (decimal-exact) inputs
                s_d = float(Decimal(s) * _SCALE)
                q_d = float(Decimal(q) * _SCALE)
                mean = s_d / n
                var = (q_d - s_d * s_d / n) / (n - 1)
                z = (v - mean) / var**0.5
                if abs(z) > _ANOM_Z:
                    out.append((int(event_id), int(user_id), v, n, round(z, 6)))
            n += 1
            s += _dec8(v)
            q += _dec8(v * v)
    state.update((n, str(s), str(q)))
    yield pd.DataFrame(
        out, columns=["event_id", "user_id", "value", "n_prior", "z"]
    ).astype(
        {
            "event_id": "int64",
            "user_id": "int64",
            "value": "float64",
            "n_prior": "int64",
            "z": "float64",
        }
    )


def streaming_anomalies(events: DataFrame) -> DataFrame:
    """Per-user streaming anomaly flags; emits only the anomalous events
    (append semantics — each flagged event appears exactly once)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _score,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
