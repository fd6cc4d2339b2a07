"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a partitioned, deterministic synthetic-document generator.

Why this exists: the reference ingests only files it already has
(SURVEY.md §2 S1-S2); a scale engine also needs the *extension seam*
for sources Spark has no built-in reader for (internal services, custom
binary formats, synthetic load). Spark 4's Python DataSource API is the
public way to add one without JVM code — this module exercises the full
surface: schema declaration, option handling, partition PLANNING on the
driver (one ``InputPartition`` per shard so a 1000-executor cluster
reads 1000 shards concurrently), and per-partition generation on
executors via Arrow batches.

Determinism contract: row content is a pure function of (doc_id, seed)
through md5 — same options, same data, on any cluster, any partition
count, any task retry. That is what makes a generated source usable in
differential tests (and what makes task retries safe at scale: a
re-executed partition regenerates byte-identical rows).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_SCHEMA_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"

_WORDS = (
    "the fast key order sort table scan merge part window small hash "
    "join batch stream spark data row group shuffle broadcast filter "
    "cache plan stage task node core disk"
).split()

_LANGS = ("en", "de", "fr", "es")
_SOURCES = ("web", "wiki", "code", "news")


def _h(seed: int, doc_id: int, salt: str) -> int:
    """Deterministic 48-bit value from (seed, doc_id, salt) via md5 —
    the same portability-over-speed choice as functions/text.py::hash48,
    and stable across Python processes (unlike builtin ``hash``)."""
    b = hashlib.md5(f"{seed}:{doc_id}:{salt}".encode()).hexdigest()[:12]
    return int(b, 16)


def _make_doc(seed: int, doc_id: int) -> tuple[int, str, str, str, int]:
    n_words = 20 + _h(seed, doc_id, "len") % 60
    words = [_WORDS[_h(seed, doc_id, f"w{i}") % len(_WORDS)] for i in range(n_words)]
    text = " ".join(words)
    lang = _LANGS[_h(seed, doc_id, "lang") % len(_LANGS)]
    source = _SOURCES[_h(seed, doc_id, "src") % len(_SOURCES)]
    return doc_id, text, lang, source, len(text)


class _DocShard(InputPartition):
    def __init__(self, lo: int, hi: int, seed: int):
        self.lo, self.hi, self.seed = lo, hi, seed


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("n_parts", 8))
        self.seed = int(options.get("seed", 0))

    def partitions(self) -> list[_DocShard]:
        """Driver-side partition planning: contiguous doc_id ranges, one
        shard per task. At scale ``n_parts`` tracks cluster cores; the
        ranges are the split points a file source would get for free."""
        per = max(1, -(-self.n_docs // self.n_parts))  # ceil division
        return [
            _DocShard(lo, min(lo + per, self.n_docs), self.seed)
            for lo in range(0, self.n_docs, per)
        ]

    def read(self, partition: _DocShard) -> Iterator[tuple]:
        for doc_id in range(partition.lo, partition.hi):
            yield _make_doc(partition.seed, doc_id)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch half of the source: ``spark.readStream.format(
    "synth_docs")`` emits ``batch_size`` docs per trigger, offset =
    next doc_id to generate.

    Offset semantics are the whole contract here: ``initialOffset`` ->
    {"next": 0}; each ``read`` advances by batch_size; a RESTART from a
    checkpointed offset regenerates the exact same remaining stream
    (rows are pure functions of doc_id), which is what makes the source
    replayable — the property Structured Streaming's exactly-once story
    is built on. ``readBetweenOffsets`` re-derives any range on recovery.
    """

    def __init__(self, options: dict):
        self.batch_size = int(options.get("batch_size", 100))
        self.max_docs = int(options.get("n_docs", 1000))
        self.seed = int(options.get("seed", 0))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = int(start["next"])
        hi = min(lo + self.batch_size, self.max_docs)
        end = {"next": hi}
        return iter([_make_doc(self.seed, i) for i in range(lo, hi)]), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(
            [_make_doc(self.seed, i) for i in range(int(start["next"]), int(end["next"]))]
        )


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synth_docs").option("n_docs", N)`` (batch)
    or ``spark.readStream.format("synth_docs")`` (micro-batch)."""

    @classmethod
    def name(cls) -> str:
        return "synth_docs"

    def schema(self) -> str | StructType:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register_synth_docs(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(SyntheticDocsDataSource)
