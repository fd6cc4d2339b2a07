"""As-of join: match each probe row to the nearest quote row in time.

The canonical time-series join (trades->quotes, orders->latest price,
events->most recent state): for every probe row ``(key, t)`` find the
single quote row ``(key, t')`` with the largest ``t' <= t`` (backward)
or the smallest ``t' >= t`` (forward), per key.

A naive formulation is a non-equi join (``q.ts <= p.ts``) topped by an
argmax — Spark plans the inequality as a broadcast-nested-loop or
sort-merge with full per-key candidate fan-out, quadratic in quotes per
key. This operator instead uses the UNION + WINDOW carry-forward plan:

1. union probes and quotes into one frame tagged with a side marker,
2. one window per key ordered by ``(ts, side)``,
3. ``last(quote_payload, ignorenulls=true)`` carries the most recent
   quote payload struct onto every probe row,
4. keep the probe rows and unpack the struct.

Cost: exactly ONE shuffle (the window partitioning on the key), no
join, no candidate explosion — each quote is touched once regardless
of how many probes follow it. This is the plan a 100 TB tick-data
as-of join needs: it scales with |probes| + |quotes|, never their
product. Skewed keys are ordinary window skew and are handled by AQE
like any other hot-key window.

Tie semantics are explicit via the side marker's sort position:
inclusive (``t' <= t``) sorts quotes BEFORE probes at equal
timestamps so an equal-time quote is visible; strict (``t' < t``)
sorts probes first. The quote payload travels as ONE struct, so all
carried columns always come from the SAME quote row even when some of
its columns are individually null.

DuckDB's native ``ASOF JOIN`` (inequality >=, >, <=, <) is the
independent oracle for the registered query twins
(queries/asof_queries.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

_QUOTE_STRUCT = "__asof_q"
_TS = "__asof_ts"
_SIDE = "__asof_side"


def asof_join(
    probes: DataFrame,
    quotes: DataFrame,
    on: Sequence[str],
    probe_ts: str = "ts",
    quote_ts: str = "ts",
    direction: str = "backward",
    strict: bool = False,
    tolerance_secs: float | None = None,
) -> DataFrame:
    """Left as-of join of ``probes`` to ``quotes`` on ``on`` keys.

    Every probe row survives; quote columns (prefixed ``q_``) are null
    when no quote qualifies. ``direction='backward'`` matches the
    latest quote at-or-before (``strict=True``: strictly before) the
    probe timestamp; ``'forward'`` the earliest at-or-after (strictly
    after). ``tolerance_secs`` voids matches farther than the given
    horizon (null columns, probe row kept), mirroring pandas
    ``merge_asof(tolerance=...)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = list(on)
    quote_cols = [c for c in quotes.columns if c not in keys and c != quote_ts]
    # probe_ts is re-added from _TS in the final select, so it must be
    # excluded here or the result carries the probe timestamp twice and
    # any downstream reference hits AMBIGUOUS_REFERENCE.
    probe_cols = [c for c in probes.columns if c not in keys and c != probe_ts]

    # The full quote payload (its timestamp + every non-key column) as a
    # single struct so the carry is row-atomic.
    q_struct = F.struct(
        F.col(quote_ts).alias("q_ts"), *[F.col(c).alias(f"q_{c}") for c in quote_cols]
    )
    # Null-keyed quotes can never equi-match under SQL semantics (null
    # != null), but window PARTITIONing groups nulls together — drop
    # them so a null-keyed probe carries nothing, exactly like ASOF
    # JOIN. Null-keyed probes stay (left semantics) and get null quotes.
    # Null-TIMESTAMP quotes are dropped for the same reason: a SQL
    # inequality against NULL never matches, but a null ts would sort
    # first under asc-nulls-first and be carried as a bogus "match".
    clean_quotes = quotes.filter(F.col(quote_ts).isNotNull())
    for k in keys:
        clean_quotes = clean_quotes.filter(F.col(k).isNotNull())
    q_side = clean_quotes.select(
        *keys, F.col(quote_ts).alias(_TS), q_struct.alias(_QUOTE_STRUCT)
    )
    struct_type = q_side.schema[_QUOTE_STRUCT].dataType

    # Inclusive: the quote must sort before the probe at an equal
    # timestamp (visible to last()); strict: after (invisible).
    quote_rank, probe_rank = (0, 1) if not strict else (1, 0)
    p_side = probes.select(
        *keys,
        F.col(probe_ts).alias(_TS),
        F.lit(None).cast(struct_type).alias(_QUOTE_STRUCT),
        F.lit(probe_rank).alias(_SIDE),
        *[F.col(c) for c in probe_cols],
    )
    q_side = q_side.select(
        *keys,
        _TS,
        _QUOTE_STRUCT,
        F.lit(quote_rank).alias(_SIDE),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in probe_cols],
    )

    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_QUOTE_STRUCT, ignorenulls=True).over(w)

    out = (
        p_side.union(q_side.select(*p_side.columns))  # positions aligned above
        # A null-ts probe can never satisfy the inequality either (it
        # would sort last under desc-nulls-last in forward mode and pick
        # up a quote): keep the row (left semantics) but void the carry.
        .withColumn(_QUOTE_STRUCT, F.when(F.col(_TS).isNotNull(), carried))
        .filter(F.col(_SIDE) == probe_rank)
    )
    if tolerance_secs is not None:
        gap = F.abs(
            F.unix_micros(F.col(_TS)) - F.unix_micros(F.col(_QUOTE_STRUCT).getField("q_ts"))
        )
        out = out.withColumn(
            _QUOTE_STRUCT,
            F.when(gap <= int(tolerance_secs * 1_000_000), F.col(_QUOTE_STRUCT)),
        )

    unpacked = [F.col(_QUOTE_STRUCT).getField("q_ts").alias("q_ts")] + [
        F.col(_QUOTE_STRUCT).getField(f"q_{c}").alias(f"q_{c}") for c in quote_cols
    ]
    return out.select(*keys, F.col(_TS).alias(probe_ts), *probe_cols, *unpacked)
