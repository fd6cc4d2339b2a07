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

TYPED mode (``.option("change_types", "typed")``, r13): the stream
serves MUTATING chains — ranges whose versions carry EMBEDDED
positional vectors (MERGE / ``delete_where`` / ``update_where``
commits) — as typed change rows: the chain schema plus
``_change_type`` and ``_commit_version``, mirroring the batch
``operators/cdf.py::table_changes_typed``. Each partition stays
SELF-CONTAINED (no joins inside a DataSource read), so typing is
per-commit-kind: a pure append's delta rows are ``insert``; an
``update_where`` commit's manifest marker types its delta
``update_postimage`` and its retired preimages ``update_preimage``;
a ``delete_where`` commit's preimages are ``delete``; a MERGE
commit serves the keyless changeset — delta rows ``insert``,
preimages ``delete`` (an update is a delete + an insert; the batch
feed offers merge-key pairing when pre/post typing is needed).
Preimage partitions are one per (vector, touched ancestor file):
the executor re-reads the commit's vector filtered to its file and
takes the addressed row indices — O(changes) + O(touched ancestor
files), never a table scan. EXTERNAL post-hoc vectors
(``delete_keys`` / ``delete_positions``) still refuse in both modes:
they mutate an already-committed version after the fact, so no
version-interval feed can place them as events.

Filesystem note: the chain is addressed through ``pyarrow.fs`` —
``FileSystem.from_uri`` resolves plain paths to the local filesystem
and ``s3://`` / ``hdfs://`` / ``gs://`` roots to their native
filesystems, so the stream follows a chain on object storage with the
same offset and partition logic (the Python DataSource API runs
outside the JVM, so Hadoop's FileSystem is not available here).
Executors re-resolve the filesystem from the root URI per partition —
nothing filesystem-bound is pickled into the plan.

Trigger note: the Python DataSource API does not (yet) expose
``SupportsTriggerAvailableNow``, so under ``Trigger.AvailableNow``
Spark logs a fallback and runs ONE batch covering everything up to the
latest offset at start, then stops — same rows, one commit instead of
per-version commits. The replay witnesses account for this: offset
semantics are exercised with multi-batch restarts, not AvailableNow
batch boundaries.

Reference parity note: the reference engine (src/query1-4.py) has no
streaming surface; this is extension surface (VERDICT r10 next-step
#5), template: sources/synthetic_docs.py.
"""

from __future__ import annotations

import json
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


def _fs_for(root: str):
    """Resolve ``root`` (plain path or URI) to ``(filesystem,
    fs-internal path)`` via ``pyarrow.fs.FileSystem.from_uri`` — the
    one seam every helper below goes through."""
    from pyarrow.fs import FileSystem

    fs, path = FileSystem.from_uri(root)
    return fs, path.rstrip("/")


def _is_dir(fs, path: str) -> bool:
    from pyarrow.fs import FileType

    return fs.get_file_info(path).type == FileType.Directory


def _listdir(fs, path: str):
    """Immediate children of ``path`` as FileInfo, empty when the dir
    does not exist (object stores have no empty directories anyway)."""
    from pyarrow.fs import FileSelector

    return fs.get_file_info(FileSelector(path, allow_not_found=True))


def _read_json(fs, path: str) -> dict | None:
    from pyarrow.fs import FileType

    if fs.get_file_info(path).type != FileType.File:
        return None
    with fs.open_input_stream(path) as fh:
        return json.loads(fh.read().decode("utf-8"))


def _list_versions(root: str) -> list[int]:
    from pyarrow.fs import FileType

    fs, base = _fs_for(root)
    out = []
    for info in _listdir(fs, base):
        m = _V_RE.match(info.base_name)
        if m and info.type == FileType.Directory:
            out.append(int(m.group(1)))
    return sorted(out)


_S_RE = re.compile(r"^s=(\d+)$")


def _branch_head(root: str, name: str) -> int:
    """Resolve a branch head from its sequence log (pyarrow.fs twin of
    operators/refs.py::branch_head — the Python DataSource runs outside
    the JVM)."""
    fs, base = _fs_for(root)
    bdir = f"{base}/_refs/branches/{name}"
    seqs = sorted(
        int(m.group(1))
        for m in (_S_RE.match(info.base_name) for info in _listdir(fs, bdir))
        if m
    )
    if not seqs:
        raise ValueError(f"no branch {name!r} at {root}")
    doc = _read_json(fs, f"{bdir}/s={seqs[-1]}/doc.json")
    return int(doc["version"])


def _manifest(root: str, version: int) -> dict | None:
    fs, base = _fs_for(root)
    return _read_json(fs, f"{base}/v={version}/_manifest.json")


def _member_files(root: str, version: int) -> list[str]:
    """Data-file paths of ``v=version`` — fs-internal paths paired with
    the root's filesystem (resolve with ``_fs_for(root)`` to read)."""
    fs, base = _fs_for(root)
    return sorted(
        info.path
        for info in _listdir(fs, f"{base}/v={version}")
        if info.base_name.endswith(".parquet")
        and not info.base_name.startswith(("_", "."))
    )


def _chain_schema(root: str, head: int | None = None) -> "object":
    """Arrow schema of the head version's whole chain (merged across
    members, base columns first — the same shape the batch chain read
    serves). ``head`` defaults to the global latest; a branch-scoped
    stream passes ITS head, so another branch's evolution never leaks
    into this stream's schema."""
    import pyarrow.parquet as papq

    fs, _ = _fs_for(root)
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
        with fs.open_input_file(files[0]) as fh:
            schema = papq.ParquetFile(fh).schema_arrow
        for field in schema:
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


def _typed_schema(chain_schema):
    """chain schema + the CDF columns (operators/cdf.py names)."""
    import pyarrow as pa

    names = {f.name for f in chain_schema}
    clash = {"_change_type", "_commit_version"} & names
    if clash:
        raise ValueError(
            f"table schema uses reserved CDF column(s) {sorted(clash)}"
        )
    return chain_schema.append(
        pa.field("_change_type", pa.string(), nullable=True)
    ).append(pa.field("_commit_version", pa.int64(), nullable=True))


def _vector_files(fs, vec_dir: str) -> list[str]:
    """Distinct ``_file`` addresses of one embedded vector — driver-
    side planning metadata: one relative-path string per touched
    ancestor file (addresses-only column read, never data pages of the
    table itself)."""
    import pyarrow.dataset as pads

    paths = [
        info.path
        for info in _listdir(fs, vec_dir)
        if info.base_name.endswith(".parquet")
        and not info.base_name.startswith(("_", "."))
    ]
    if not paths:
        return []
    ds = pads.dataset(paths, filesystem=fs, format="parquet")
    col = ds.to_table(columns=["_file"]).column("_file")
    return sorted(set(col.to_pylist()))


class _DeltaFile(InputPartition):
    def __init__(self, root: str, path: str, commit_version: int | None = None,
                 change_type: str | None = None):
        self.root = root  # original root string: executors re-resolve fs
        self.path = path  # fs-internal path
        # typed mode only (None in adds mode):
        self.commit_version = commit_version
        self.change_type = change_type


class _PreimageFile(InputPartition):
    """Typed mode: the rows of ONE ancestor file retired by ONE
    commit's embedded vector. The executor re-reads the vector
    (addresses only, filtered to its file) and takes the addressed row
    indices from the file — self-contained, no joins."""

    def __init__(self, root: str, vec_dir: str, file_rel: str,
                 commit_version: int, change_type: str):
        self.root = root
        self.vec_dir = vec_dir      # fs-internal path of the vector dir
        self.file_rel = file_rel    # "v=K/part-...parquet" relative address
        self.commit_version = commit_version
        self.change_type = change_type


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
        mode = (options.get("change_types") or "adds").lower()
        if mode not in ("adds", "typed"):
            raise ValueError(
                f"change_types must be 'adds' or 'typed', got {mode!r}"
            )
        self.typed = mode == "typed"
        self._arrow_schema = _chain_schema(
            self.root, _branch_head(self.root, self.branch) if self.branch else None
        )
        self._out_schema = (
            _typed_schema(self._arrow_schema) if self.typed else self._arrow_schema
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
    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        fs, base = _fs_for(self.root)
        lo, hi = int(start["version"]), int(end["version"])
        out: list[InputPartition] = []
        v = hi
        while v != lo:
            m = _manifest(self.root, v)
            mbase = m.get("base_version") if m else None
            if mbase is None:
                raise ValueError(
                    f"v={v} under {self.root} is a full rewrite, not an "
                    "append — the change feed cannot represent it; "
                    "restart the stream from a version at or above it"
                )
            if any(_is_dir(fs, f"{base}/{t}/v={v}") for t in _EXTERNAL_DELETES):
                raise ValueError(
                    f"v={v} under {self.root} carries EXTERNAL deletion "
                    "vectors (post-hoc delete_keys/delete_positions "
                    "commits) — no version-interval feed can place them "
                    "as events; commit removals as versions (delete_where "
                    "/ update_where / merge_into) to make them streamable"
                )
            vec_dir = f"{base}/v={v}/{_EMBEDDED_DELETES}"
            has_vec = _is_dir(fs, vec_dir)
            if has_vec and not self.typed:
                raise ValueError(
                    f"v={v} under {self.root} carries deletion vectors — "
                    "the range is not append-only and an adds-only feed "
                    "would misstate the change; re-open the stream with "
                    ".option('change_types', 'typed')"
                )
            if not self.typed:
                out.extend(_DeltaFile(self.root, p) for p in _member_files(self.root, v))
            else:
                mutation = (m or {}).get("row_mutation")
                delta_type = "update_postimage" if mutation == "update" else "insert"
                pre_type = (
                    "update_preimage"
                    if mutation == "update"
                    else "delete"  # delete_where AND the keyless MERGE changeset
                )
                out.extend(
                    _DeltaFile(self.root, p, v, delta_type)
                    for p in _member_files(self.root, v)
                )
                if has_vec:
                    out.extend(
                        _PreimageFile(self.root, vec_dir, rel, v, pre_type)
                        for rel in _vector_files(fs, vec_dir)
                    )
            v = int(mbase)
            if v < lo:
                raise ValueError(
                    f"v={hi} under {self.root} does not chain through "
                    f"v={lo} (chain skips to v={v})"
                )
        return out

    # ---- execution (executors, one task per file) --------------------
    def _align(self, table, change_type: str | None, commit_version: int | None):
        """Null-fill ``table`` to the chain schema; in typed mode
        append the constant CDF columns."""
        import pyarrow as pa

        n = table.num_rows
        cols = []
        for field in self._arrow_schema:
            if field.name in table.column_names:
                cols.append(table.column(field.name).cast(field.type))
            else:  # pre-evolution file: null-fill the late column
                cols.append(pa.nulls(n, type=field.type))
        if self.typed:
            cols.append(pa.array([change_type] * n, type=pa.string()))
            cols.append(pa.array([commit_version] * n, type=pa.int64()))
        return pa.table(cols, schema=self._out_schema)

    def read(self, partition: InputPartition) -> Iterator:
        import pyarrow.parquet as papq

        fs, base = _fs_for(partition.root)
        if isinstance(partition, _PreimageFile):
            import pyarrow.compute as pc
            import pyarrow.dataset as pads

            ds = pads.dataset(partition.vec_dir, filesystem=fs, format="parquet")
            vec = ds.to_table(
                columns=["_file", "_pos"],
                filter=pc.field("_file") == partition.file_rel,
            )
            positions = sorted(set(vec.column("_pos").to_pylist()))
            table = papq.read_table(
                f"{base}/{partition.file_rel}", filesystem=fs
            ).take(positions)
            aligned = self._align(
                table, partition.change_type, partition.commit_version
            )
        else:
            table = papq.read_table(partition.path, filesystem=fs)
            aligned = self._align(
                table, partition.change_type, partition.commit_version
            )
        yield from aligned.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are durable chain versions; nothing to release


class ChainCDFDataSource(DataSource):
    """``spark.readStream.format("chain_cdf").option("path", root)
    [.option("from_version", K)]`` — each micro-batch is the rows
    appended in ``(last offset, latest version]``; default start is the
    latest version at stream open (future appends only). ``path``
    accepts a plain POSIX path or any ``pyarrow.fs`` URI (``s3://``,
    ``hdfs://``, ``gs://``). ``.option("change_types", "typed")``
    serves MUTATING chains (MERGE / delete_where / update_where
    commits) as typed ``_change_type`` rows — see module docstring.
    Under ``Trigger.AvailableNow`` Spark falls back to a single batch
    (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "chain_cdf"

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        root = self.options["path"]
        branch = self.options.get("branch")
        chain = _chain_schema(
            root, _branch_head(root, branch) if branch else None
        )
        if (self.options.get("change_types") or "adds").lower() == "typed":
            chain = _typed_schema(chain)
        return from_arrow_schema(chain)

    def streamReader(self, schema: StructType) -> ChainCDFStreamReader:
        return ChainCDFStreamReader(self.options)


def register_chain_cdf(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(ChainCDFDataSource)
