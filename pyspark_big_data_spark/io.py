"""Sources and sinks.

Covers the reference's IO surface (SURVEY.md §2.1) Spark-first:
- S1 CSV scan  -> read_csv with an explicit schema (no inference pre-scan;
  the reference's ``inferSchema=True`` costs a full extra pass,
  ``src/query1.py:14-23`` / results/query1.txt csv-vs-parquet gap).
- S2 Parquet scan -> read_table / spark.read.parquet (column pruning +
  predicate pushdown for free).
- S3 Parquet sink -> write_parquet / csv_to_parquet
  (== ``src/csv_to_parquet.py:7-13``), with optional partitioning —
  at scale, partition-pruned layout is the difference between a scan of
  one partition and a scan of 100 TB.
- S4 in-memory literal dimension -> literal_dim (== ``src/query3.py:7-32``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from pyspark_big_data_spark import schemas
from pyspark_big_data_spark.session import ensure_session_confs


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as its canonical schema.

    Normalizes whatever timestamp encoding the parquet writer chose to
    the canonical Spark type, so downstream queries never see an
    encoding-dependent schema:
    - TIMESTAMP(NANOS): under ``nanosAsLong`` Spark surfaces nanos as
      LongType; convert with integer div (microsecond truncation —
      identical to what DuckDB's reader does, so oracle comparisons
      agree).
    - ``timestamp[us]`` without timezone: Spark reads TIMESTAMP_NTZ;
      when the canonical field is TimestampType, cast (wall-clock is
      interpreted in the session timezone, pinned to UTC by
      ensure_session_confs, so values match DuckDB's naive read).
    - The reverse (tz-annotated on disk, canonical NTZ) casts the same
      way.
    """
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    canonical = schemas.TABLES.get(name)
    if canonical is None:
        return df
    for field in canonical.fields:
        actual = df.schema[field.name].dataType
        if not isinstance(field.dataType, (T.TimestampType, T.TimestampNTZType)):
            continue
        if isinstance(actual, T.LongType):
            # integer `div`, NOT `/`: double division of epoch-nanos
            # (~1.7e18, double ulp ≈ 256) corrupts the microseconds
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
            )
        elif actual != field.dataType and isinstance(
            actual, (T.TimestampType, T.TimestampNTZType)
        ):
            df = df.withColumn(field.name, F.col(field.name).cast(field.dataType))
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """CSV scan with a declared schema (S1). Inference is dev-only."""
    ensure_session_confs(spark)
    return spark.read.csv(path, header=header, schema=schema)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    """Parquet sink (S3). ``partition_by`` enables partition pruning at scale."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def csv_to_parquet(
    spark: SparkSession,
    csv_path: str,
    parquet_path: str,
    schema: T.StructType,
    partition_by: list[str] | None = None,
) -> None:
    """CSV -> Parquet conversion utility (== ``src/csv_to_parquet.py:1-22``,
    minus schema inference)."""
    write_parquet(read_csv(spark, csv_path, schema), parquet_path, partition_by=partition_by)


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only when the input is too narrow to parallelize.

    Small single-file parquet inputs arrive as ONE partition, serializing
    CPU-heavy per-row pipelines (hashing, explode) onto one core. On a
    real multi-file 100 TB input this is a no-op — the guard avoids
    paying a gratuitous full shuffle there.

    The probe is ``df.inputFiles()`` (driver-side file listing off the
    logical plan), NOT ``df.rdd.getNumPartitions()``: converting to an
    RDD forces physical-plan materialization outside AQE on every call.
    A multi-file input already fans out at least one task per file
    (usually more, via ``maxPartitionBytes`` splits), so file count is a
    safe lower bound on scan parallelism.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # e.g. streaming plans: leave the plan untouched
        return df
    if n_files < target:
        return df.repartition(target)
    return df


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """JSON-lines scan with a declared schema (no inference pre-scan).

    JSONL is the interchange format of LLM training corpora; an explicit
    schema matters doubly here — inference over text-heavy JSON costs a
    full extra pass AND silently widens types on dirty rows. Corrupt
    lines land in the standard ``_corrupt_record`` column when the
    schema declares one (PERMISSIVE mode) instead of failing the job.
    """
    ensure_session_confs(spark)
    return spark.read.schema(schema).json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    shards: int | None = None,
    compression: str | None = None,
) -> None:
    """JSON-lines sink — the training-export format.

    ``shards`` repartitions so the export lands as a fixed shard count
    (training loaders usually want n_shards ≈ n_readers, not one file
    per upstream task); ``compression`` (e.g. ``gzip``/``zstd`` where
    the codec is present) trades CPU for the usual ~5-10x text ratio.
    Binary columns are not JSON-representable — cast or base64 first;
    this guard fails fast instead of writing corrupt exports.
    """
    for field in df.schema.fields:
        if isinstance(field.dataType, T.BinaryType):
            raise ValueError(
                f"column {field.name!r} is BinaryType: JSONL cannot carry raw "
                "bytes — base64() it (or drop it) before export"
            )
    if shards is not None:
        df = df.repartition(shards)
    writer = df.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (columnar twin of S2 — pruning + pushdown apply equally)."""
    ensure_session_confs(spark)
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink, partition-pruned like the parquet sink."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def literal_dim(spark: SparkSession, rows: list[tuple], schema) -> DataFrame:
    """Small in-memory dimension table (S4, == ``src/query3.py:7-32``).

    Joins against the result auto-broadcast under the engine's
    autoBroadcastJoinThreshold; callers can force with F.broadcast().
    """
    return spark.createDataFrame(rows, schema=schema)


def schema_drift_report(spark: SparkSession, sf_dir: str) -> list[dict]:
    """Compare every table's on-disk schema against its canonical
    StructType and classify each drift — the monitor version of the
    lesson that cost a round: the testdata's events.ts silently flipped
    from int64 TIMESTAMP(NANOS) to timestamp[us]/TIMESTAMP_NTZ and took
    six green signals red. Returns one dict per drifted column:
    {table, column, canonical, actual, handled} where handled=True means
    read_table already normalizes this encoding (timestamp variants),
    False means a breaking change a human must look at (missing column,
    incompatible type).

    Driver-side metadata only (parquet footers via the reader's schema
    resolution — no data scan); safe to run at any corpus size.
    """
    report: list[dict] = []
    for name, canonical in schemas.TABLES.items():
        try:
            actual_schema = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
        except Exception as exc:  # table missing entirely
            report.append(
                {"table": name, "column": "*", "canonical": "<table>",
                 "actual": f"<unreadable: {type(exc).__name__}>", "handled": False}
            )
            continue
        actual_by_name = {f.name: f.dataType for f in actual_schema.fields}
        for field in canonical.fields:
            actual = actual_by_name.get(field.name)
            if actual is None:
                report.append(
                    {"table": name, "column": field.name,
                     "canonical": field.dataType.simpleString(), "actual": "<missing>",
                     "handled": False}
                )
            elif actual != field.dataType:
                is_ts_variant = isinstance(
                    field.dataType, (T.TimestampType, T.TimestampNTZType)
                ) and isinstance(actual, (T.TimestampType, T.TimestampNTZType, T.LongType))
                report.append(
                    {"table": name, "column": field.name,
                     "canonical": field.dataType.simpleString(),
                     "actual": actual.simpleString(), "handled": is_ts_variant}
                )
    return report


def read_evolved(spark: SparkSession, path: str, canonical=None) -> DataFrame:
    """Scan a parquet dataset whose files were written under EVOLVING
    schemas (appends gained columns over time — the backfill reality of
    a long-lived corpus). ``mergeSchema=true`` makes the scan pay the
    per-file footer union ONCE and null-fills columns absent from older
    files; the default reader would instead pick one file's schema and
    silently drop or misalign late columns. With ``canonical`` (a
    StructType), the merged frame is projected/cast to exactly that
    schema — missing canonical columns surface as typed nulls, extra
    on-disk columns are dropped — so downstream plans bind against one
    stable shape regardless of which files the scan touches.

    Scale note: schema merge reads FOOTERS, not data, but at 100 TB a
    million-file footer union is still a real listing cost — production
    datasets should record the evolved schema once (a table catalog or
    ``schema_drift_report``-style manifest) and pass it here as
    ``canonical`` over a plain scan; this helper keeps the merge
    explicit rather than ambient."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if canonical is not None:
        cols = []
        for field in canonical.fields:
            if field.name in df.columns:
                cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
            else:
                cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        df = df.select(*cols)
    return df


def session_tmpdir(prefix: str) -> str:
    """mkdtemp whose tree is reclaimed at interpreter exit.

    Query-owned disk artifacts (replay corpora, minhash indexes, the
    persisted cluster map) back LAZY DataFrames, so they cannot be
    removed when the builder returns — the caller materializes later.
    Registering the rmtree at process exit keeps repeated witness /
    test / bench runs from accumulating full corpus copies in /tmp
    while leaving the artifact alive for the whole session (the
    persisted-artifact caches key these dirs per sf_dir)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
