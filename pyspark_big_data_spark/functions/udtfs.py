"""Python user-defined table functions (Spark 4 ``@udtf`` API).

The UDTF is the remaining Python extension seam next to pandas_udf /
mapInPandas / applyInPandasWithState / the custom DataSource: a
function callable FROM SQL that returns a TABLE per input row, usable
in LATERAL position. This module ships the chunker as a UDTF so SQL
users get `LATERAL chunk_doc(doc_id, text)` with semantics pinned
IDENTICAL to the oracled DataFrame chunker (queries/corpus_ops.py::
doc_chunk_overlap — same CHUNK_W/CHUNK_STRIDE constants, same md5
digests; agreement asserted in tests/test_udtf.py).

When to use which: the DataFrame chunker is the production path (pure
column math, whole-stage codegen, no Python workers); the UDTF is the
SQL-ergonomics path for ad-hoc lateral use, paying one Arrow-batched
Python hop. Same answers, different cost — which is exactly what the
agreement test demonstrates.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql.functions import udtf

from pyspark_big_data_spark.queries.corpus_ops import CHUNK_STRIDE, CHUNK_W

_WS = re.compile(r"\s+")


def _tokens(text: str) -> list[str]:
    norm = _WS.sub(" ", (text or "").lower()).strip()
    return norm.split(" ") if norm else [""]


@udtf(returnType="chunk_no: bigint, n_tokens: bigint, chunk_md5: string")
class ChunkDoc:
    """Per input row (doc text), yield one row per overlapping
    CHUNK_W-token chunk at CHUNK_STRIDE — the doc_chunk_overlap
    semantics as a SQL table function."""

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        toks = _tokens(text)
        n = len(toks)
        n_chunks = max(0, -(-(max(n - CHUNK_W, 0)) // CHUNK_STRIDE)) + 1
        for c in range(n_chunks):
            chunk = toks[c * CHUNK_STRIDE : c * CHUNK_STRIDE + CHUNK_W]
            yield (
                c,
                len(chunk),
                hashlib.md5(" ".join(chunk).encode()).hexdigest(),
            )


def register_udtfs(spark) -> None:
    """Idempotently register the SQL-visible table functions."""
    spark.udtf.register("chunk_doc", ChunkDoc)
