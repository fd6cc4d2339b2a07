"""Streaming CHANGE DATA FEED over a versioned append chain: a custom
Spark 4 Python DataSource that turns ``operators/versioned.py``'s
batch ``table_changes`` into a continuous ``readStream`` source.

Offsets ARE chain versions: ``{"version": K}`` means "everything
through v=K has been served", and each micro-batch delivers exactly the
delta files of the versions in ``(start, end]`` — O(changes) I/O,
never a table scan, the same contract as the batch feed. Because chain
members are IMMUTABLE once committed, any offset range re-derives the
identical rows on restart: the replayability Structured Streaming's
exactly-once story is built on comes for free from the storage format.

Execution shape: offset planning (version listing + manifest walks) is
driver-side metadata; the actual parquet reads are DISTRIBUTED — one
``InputPartition`` per delta FILE, each opened on an executor with
pyarrow and served as Arrow record batches (a 1000-file append wave
fans out to 1000 tasks). Schema is the chain-merged head schema;
pre-evolution files are null-filled to it, exactly like the batch
chain read.

Soundness guards mirror ``table_changes``: every version in a served
range must be a pure append onto its direct predecessor — a full
rewrite, an external deletion vector, or a MERGE commit's embedded
vector in the range raises loudly (the stream fails rather than
misstating removals as an adds-only feed).

Filesystem note: this source addresses the chain with ``os``-level
paths (the Python DataSource API runs outside the JVM), so roots must
be POSIX-visible — the test/bench topology here. A production
deployment swaps the three small helpers below onto ``pyarrow.fs``
(S3/HDFS) without touching the offset or partition logic.

Reference parity note: the reference engine (src/query1-4.py) has no
streaming surface; this is extension surface (VERDICT r10 next-step
#5), template: sources/synthetic_docs.py.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_V_RE = re.compile(r"^v=(\d+)$")

# underscore trees that mean "this range is not adds-only"
_EXTERNAL_DELETES = ("_deletes", "_pos_deletes")
_EMBEDDED_DELETES = "_merge_deletes"


def _list_versions(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _V_RE.match(name)
        if m and os.path.isdir(os.path.join(root, name)):
            out.append(int(m.group(1)))
    return sorted(out)


_S_RE = re.compile(r"^s=(\d+)$")


def _branch_head(root: str, name: str) -> int:
    """Resolve a branch head from its sequence log (os-level twin of
    operators/refs.py::branch_head — the Python DataSource runs outside
    the JVM)."""
    bdir = os.path.join(root, "_refs", "branches", name)
    seqs = sorted(
        int(m.group(1))
        for m in (_S_RE.match(d) for d in os.listdir(bdir))
        if m and os.path.isdir(os.path.join(bdir, m.group(0)))
    ) if os.path.isdir(bdir) else []
    if not seqs:
        raise ValueError(f"no branch {name!r} at {root}")
    with open(
        os.path.join(bdir, f"s={seqs[-1]}", "doc.json"), encoding="utf-8"
    ) as fh:
        return int(json.load(fh)["version"])


def _manifest(root: str, version: int) -> dict | None:
    p = os.path.join(root, f"v={version}", "_manifest.json")
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)


def _member_files(root: str, version: int) -> list[str]:
    vdir = os.path.join(root, f"v={version}")
    return sorted(
        os.path.join(vdir, f)
        for f in os.listdir(vdir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def _chain_schema(root: str, head: int | None = None) -> "object":
    """Arrow schema of the head version's whole chain (merged across
    members, base columns first — the same shape the batch chain read
    serves). ``head`` defaults to the global latest; a branch-scoped
    stream passes ITS head, so another branch's evolution never leaks
    into this stream's schema."""
    import pyarrow.parquet as papq

    versions = _list_versions(root)
    if not versions:
        raise ValueError(f"versioned dataset at {root} has no versions")
    chain = [versions[-1] if head is None else int(head)]
    while True:
        m = _manifest(root, chain[-1])
        base = m.get("base_version") if m else None
        if base is None:
            break
        chain.append(int(base))
    fields: list = []
    seen: set[str] = set()
    for v in reversed(chain):  # base first: evolution order
        files = _member_files(root, v)
        if not files:
            continue
        for field in papq.ParquetFile(files[0]).schema_arrow:
            if field.name not in seen:
                seen.add(field.name)
                # declared nullable regardless of footer required-ness:
                # schema evolution null-fills late columns in early
                # files, and a required footer field would otherwise
                # poison the whole stream schema (codegen NPEs on the
                # nulls we legitimately emit)
                fields.append(field.with_nullable(True))
    import pyarrow as pa

    return pa.schema(fields)


class _DeltaFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ChainCDFStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("chain_cdf requires .option('path', <chain root>)")
        self.from_version = options.get("from_version")
        # with .option("branch", name) the stream follows THAT branch's
        # head (its CAS log) instead of the global version counter —
        # on a branched table the global latest may not chain through
        # the offset at all (another branch's commit), which would
        # fail the feed loudly but pointlessly
        self.branch = options.get("branch")
        self._arrow_schema = _chain_schema(
            self.root, _branch_head(self.root, self.branch) if self.branch else None
        )

    def _head(self) -> int:
        if self.branch is not None:
            return _branch_head(self.root, self.branch)
        return _list_versions(self.root)[-1]

    # ---- offsets -----------------------------------------------------
    def initialOffset(self) -> dict:
        if self.from_version is not None:
            v = int(self.from_version)
            if v not in _list_versions(self.root):
                raise ValueError(
                    f"from_version {v} does not exist under {self.root}"
                )
            return {"version": v}
        return {"version": self._head()}  # serve only FUTURE appends

    def latestOffset(self) -> dict:
        return {"version": self._head()}

    # ---- planning (driver, metadata-only) ----------------------------
    def partitions(self, start: dict, end: dict) -> list[_DeltaFile]:
        lo, hi = int(start["version"]), int(end["version"])
        files: list[str] = []
        v = hi
        while v != lo:
            m = _manifest(self.root, v)
            base = m.get("base_version") if m else None
            if base is None:
                raise ValueError(
                    f"v={v} under {self.root} is a full rewrite, not an "
                    "append — the change feed cannot represent it; "
                    "restart the stream from a version at or above it"
                )
            if any(
                os.path.isdir(os.path.join(self.root, t, f"v={v}"))
                for t in _EXTERNAL_DELETES
            ) or os.path.isdir(
                os.path.join(self.root, f"v={v}", _EMBEDDED_DELETES)
            ):
                raise ValueError(
                    f"v={v} under {self.root} carries deletion vectors — "
                    "the range is not append-only and an adds-only feed "
                    "would misstate the change"
                )
            files.extend(_member_files(self.root, v))
            v = int(base)
            if v < lo:
                raise ValueError(
                    f"v={hi} under {self.root} does not chain through "
                    f"v={lo} (chain skips to v={v})"
                )
        return [_DeltaFile(p) for p in files]

    # ---- execution (executors, one task per delta file) --------------
    def read(self, partition: _DeltaFile) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as papq

        table = papq.read_table(partition.path)
        n = table.num_rows
        cols = []
        for field in self._arrow_schema:
            if field.name in table.column_names:
                cols.append(table.column(field.name).cast(field.type))
            else:  # pre-evolution file: null-fill the late column
                cols.append(pa.nulls(n, type=field.type))
        aligned = pa.table(cols, schema=self._arrow_schema)
        yield from aligned.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are durable chain versions; nothing to release


class ChainCDFDataSource(DataSource):
    """``spark.readStream.format("chain_cdf").option("path", root)
    [.option("from_version", K)]`` — each micro-batch is the rows
    appended in ``(last offset, latest version]``; default start is the
    latest version at stream open (future appends only)."""

    @classmethod
    def name(cls) -> str:
        return "chain_cdf"

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        root = self.options["path"]
        branch = self.options.get("branch")
        return from_arrow_schema(
            _chain_schema(root, _branch_head(root, branch) if branch else None)
        )

    def streamReader(self, schema: StructType) -> ChainCDFStreamReader:
        return ChainCDFStreamReader(self.options)


def register_chain_cdf(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(ChainCDFDataSource)
