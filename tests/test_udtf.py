"""Python UDTF (Spark 4 @udtf): SQL LATERAL chunking agrees row-for-row
with the oracled DataFrame chunker."""

from __future__ import annotations

from pyspark_big_data_spark.functions.udtfs import register_udtfs
from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries.corpus_ops import doc_chunk_overlap


def test_chunk_doc_udtf_matches_dataframe_chunker(spark, sf_dir):
    register_udtfs(spark)
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf_v")
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_no, c.n_tokens, c.chunk_md5
        FROM docs_udtf_v d, LATERAL chunk_doc(d.text) c
        ORDER BY d.doc_id, c.chunk_no
        """
    ).collect()
    want = doc_chunk_overlap(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_chunk_doc_udtf_handles_edge_rows(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, ""), (2, "one two"), (3, " ".join(f"t{i}" for i in range(200)))],
        "doc_id long, text string",
    ).createOrReplaceTempView("edge_docs_v")
    rows = spark.sql(
        """
        SELECT d.doc_id, c.chunk_no, c.n_tokens
        FROM edge_docs_v d, LATERAL chunk_doc(d.text) c
        ORDER BY d.doc_id, c.chunk_no
        """
    ).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # empty + tiny docs still get exactly one chunk row
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_tokens"] == 1  # [""] token
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 2
    # 200 tokens, W=64, stride=48 -> ceil(136/48)+1 = 4 chunks
    assert len(by_doc[3]) == 4
    assert by_doc[3][-1]["n_tokens"] == 200 - 3 * 48
