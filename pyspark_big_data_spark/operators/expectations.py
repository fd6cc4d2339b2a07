"""Declarative data-quality expectations: a Deequ-style constraint
suite evaluated in ONE aggregate pass.

``table_profile`` describes a table and ``referential_integrity_audit``
checks FK orphans; what production pipelines gate deploys on is the
third shape — a DECLARED constraint suite ("o_orderkey is never null
and unique, o_totalprice in [0, 1e6], status in {O,F,P}, every
o_custkey resolves") evaluated into a (rule, metric, passed) report
that CI can assert on. The engine here mirrors the Deequ/Great
Expectations design point on plain DataFrames:

- every SCALAR rule (not_null, bounds, accepted_values, unique,
  row_count) compiles to one aggregate expression, so the whole scalar
  suite is a SINGLE scan + single 1-row aggregate regardless of how
  many rules are declared — at 100 TB you pay one pass, not one pass
  per rule;
- each FK rule is one left-anti join against the parent key set
  (strategy left to Catalyst/AQE: a dimension-sized parent broadcasts
  on its own, a fact-sized one shuffles instead of being forced into
  a broadcast), producing its own 1-row count;
- the report is the union of those 1-row frames — bounded by the rule
  count, never by the data.

``unique`` is exact (count vs count-distinct — one extra shuffle for
the distinct; swap in approx_count_distinct at extreme scale and the
rule becomes a sketch gate). Rules are plain tuples so suites can be
stored as data next to the tables they guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# rule forms (name is always last):
#   ("not_null", col, name)            metric = null count, pass == 0
#   ("unique", col, name)              metric = dup count (n - n_distinct), pass == 0
#   ("bounds", col, lo, hi, name)      metric = out-of-range count, pass == 0
#   ("accepted", col, values, name)    metric = unexpected-value count, pass == 0
#   ("row_count_min", n, name)         metric = row count, pass >= n
#   ("fk", col, parent_df, parent_col, name)  metric = orphan count, pass == 0


def _scalar_exprs(rules) -> list[Column]:
    out = []
    for r in rules:
        kind, name = r[0], r[-1]
        if kind == "not_null":
            out.append(
                F.count(F.when(F.col(r[1]).isNull(), 1)).alias(name)
            )
        elif kind == "unique":
            out.append(
                (F.count(F.col(r[1])) - F.count_distinct(F.col(r[1]))).alias(name)
            )
        elif kind == "bounds":
            col, lo, hi = r[1], r[2], r[3]
            out.append(
                F.count(
                    F.when(
                        F.col(col).isNull()
                        | (F.col(col) < F.lit(lo))
                        | (F.col(col) > F.lit(hi)),
                        1,
                    )
                ).alias(name)
            )
        elif kind == "accepted":
            col, values = r[1], r[2]
            out.append(
                F.count(
                    F.when(~F.col(col).isin(list(values)), 1)
                ).alias(name)
            )
        elif kind == "row_count_min":
            out.append(F.count(F.lit(1)).alias(name))
        elif kind == "fk":
            continue  # joins are handled separately
        else:
            raise ValueError(f"unknown expectation kind: {kind!r}")
    return out


def expectations_report(df: DataFrame, rules) -> DataFrame:
    """Evaluate ``rules`` against ``df`` and return one row per rule:
    ``(rule, metric, passed)`` — metric is the rule's violation count
    (or the row count for row_count_min), passed is 1/0. All scalar
    rules ride ONE aggregate over one scan; each fk rule adds one
    anti-join count."""
    spark = df.sparkSession
    scalar_rules = [r for r in rules if r[0] != "fk"]
    fk_rules = [r for r in rules if r[0] == "fk"]

    parts: list[DataFrame] = []
    if scalar_rules:
        agg = df.agg(*_scalar_exprs(scalar_rules))
        stack_args = ", ".join(f"'{r[-1]}', `{r[-1]}`" for r in scalar_rules)
        long = agg.selectExpr(
            f"stack({len(scalar_rules)}, {stack_args}) as (rule, metric)"
        )
        # pass criterion rides back in from the rule table (tiny literal dim)
        crit = spark.createDataFrame(
            [
                (r[-1], "min", float(r[1])) if r[0] == "row_count_min"
                else (r[-1], "zero", 0.0)
                for r in scalar_rules
            ],
            "rule string, crit string, bound double",
        )
        joined = long.join(F.broadcast(crit), "rule")
        parts.append(
            joined.select(
                "rule",
                F.col("metric").cast("double").alias("metric"),
                F.when(
                    (F.col("crit") == "zero") & (F.col("metric") == 0), 1
                )
                .when(
                    (F.col("crit") == "min")
                    & (F.col("metric") >= F.col("bound")),
                    1,
                )
                .otherwise(0)
                .cast("long")
                .alias("passed"),
            )
        )
    for r in fk_rules:
        _, col, parent_df, parent_col, name = r
        # join strategy left to Catalyst/AQE: a dimension-sized parent
        # broadcasts on its own, a fact-sized parent must NOT be forced
        # into a broadcast (the referential_integrity_audit convention)
        orphans = (
            df.select(F.col(col).alias("_k"))
            .where(F.col("_k").isNotNull())
            .join(
                parent_df.select(F.col(parent_col).alias("_k")),
                "_k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("metric"))
        )
        parts.append(
            orphans.select(
                F.lit(name).alias("rule"),
                F.col("metric").cast("double").alias("metric"),
                (F.col("metric") == 0).cast("long").alias("passed"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("rule")


def audited_publish(df: DataFrame, root: str, rules, **write_kwargs):
    """Write-audit-publish: commit ``df`` as the next snapshot version
    at ``root`` ONLY if the expectation suite passes on the staged
    bytes (what will actually publish — the audit reads the staging
    parquet back, so a write-path corruption is caught too, not just a
    bad logical input). On failure ``versioned.AuditFailed`` is raised
    with the failing (rule, metric) pairs, the staging dir is deleted,
    and the version counter does not advance — downstream readers can
    never observe a snapshot that failed its suite. This is Iceberg's
    WAP pattern composed from the engine's own seams: the expectations
    engine evaluates the whole scalar suite in one aggregate pass over
    the staged data, so the audit costs one extra scan of the snapshot
    at commit time.

    Returns ``(version, report_rows)`` on success.
    """
    from pyspark_big_data_spark.operators.versioned import AuditFailed, write_version

    report_rows: list = []

    def _audit(staged: DataFrame) -> bool:
        report_rows[:] = expectations_report(staged, rules).collect()
        return all(r["passed"] for r in report_rows)

    try:
        n = write_version(df, root, audit=_audit, **write_kwargs)
    except AuditFailed as e:
        failed = [(r["rule"], r["metric"]) for r in report_rows if not r["passed"]]
        raise AuditFailed(f"{e} — failed rules: {failed}") from None
    return n, report_rows
