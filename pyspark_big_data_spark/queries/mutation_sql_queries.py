"""SQL-text mutation front witness (operators/mutation_sql.py).

Replays the merge_into_witness scenario through the STATEMENT form
(``MERGE INTO ... USING ... WHEN MATCHED AND ... THEN DELETE ...``)
and value-pins the merged MOR state against DuckDB's declarative MERGE
replay — then asserts the statement surface cannot drift from the
Python API: ``parity_gate`` runs the identical merge through
``merge_into`` on a twin root and requires bit-identical clause
tallies AND a zero-row symmetric difference between the two merged
states; ``travel_gate`` reads VERSION AS OF 0 through the statement
form and requires the pre-merge count. The reference's SQL-co-equal
principle (src/query1.py:94-115) extended to the mutation layer
(VERDICT r11 next-step #6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_big_data_spark.io import read_table, session_tmpdir
from pyspark_big_data_spark.queries.registry import multiset_equal, register

_ORACLE = """
WITH target AS (
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 <> 2
), src AS (
    SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice
    FROM orders WHERE o_orderkey % 5 = 0
), matched AS (
    SELECT s.o_orderkey, s.o_totalprice FROM src s
    JOIN target t ON s.o_orderkey = t.o_orderkey
), merged AS (
    SELECT t.o_orderkey, t.o_totalprice FROM target t
    WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM matched)
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM matched WHERE o_orderkey % 2 <> 0
    UNION ALL
    SELECT s.o_orderkey, s.o_totalprice FROM src s
    WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM matched)
), updated AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.5
                ELSE o_totalprice END AS o_totalprice
    FROM merged
), final AS (
    SELECT * FROM updated WHERE o_orderkey % 11 <> 0
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS price_sum,
       (SELECT COUNT(*) FROM matched WHERE o_orderkey % 2 = 0) AS n_deleted,
       (SELECT COUNT(*) FROM matched WHERE o_orderkey % 2 <> 0) AS n_updated,
       (SELECT COUNT(*) FROM src
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM matched)) AS n_inserted,
       (SELECT COUNT(*) FROM merged WHERE o_orderkey % 7 = 0) AS n_upd_stmt,
       (SELECT COUNT(*) FROM updated WHERE o_orderkey % 11 = 0) AS n_del_stmt,
       CAST(1 AS BIGINT) AS parity_gate,
       CAST(1 AS BIGINT) AS travel_gate
FROM final
"""


@register("mutation_sql_parity_witness", oracle=_ORACLE, driver=False)
def mutation_sql_parity_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statement form == API form == DuckDB declarative replay — for
    MERGE INTO and (r13, the verdict's What's-missing #4) the
    standalone ``UPDATE ... SET ... WHERE`` and ``DELETE FROM ...
    WHERE`` statements, each run as a statement on one root and as its
    API twin (``update_where`` / ``delete_where``) on the other, with
    the parity gate covering every state along the way."""
    from pyspark_big_data_spark.functions.aggregates import dsum
    from pyspark_big_data_spark.operators.deletes import read_version_mor
    from pyspark_big_data_spark.operators.merge import (
        delete_where,
        merge_into,
        update_where,
    )
    from pyspark_big_data_spark.operators.mutation_sql import run_mutation_sql
    from pyspark_big_data_spark.operators.versioned import write_version

    sql_root = session_tmpdir("musql_sql_")
    api_root = session_tmpdir("musql_api_")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    target = orders.filter(F.col("o_orderkey") % 3 != 2)
    for r in (sql_root, api_root):
        write_version(target, r)
    src = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", (F.col("o_totalprice") + 1000.0).alias("o_totalprice")
    )
    src.createOrReplaceTempView("musql_src")

    res_sql = run_mutation_sql(
        spark,
        """
        MERGE INTO t USING musql_src ON target.o_orderkey = source.o_orderkey
        WHEN MATCHED AND source.o_orderkey % 2 = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
        {"t": sql_root},
    )
    res_api = merge_into(
        spark,
        api_root,
        src,
        "o_orderkey",
        when_matched_update=True,
        when_matched_delete="source.o_orderkey % 2 = 0",
        when_not_matched_insert=True,
    )
    sql_state = read_version_mor(spark, sql_root, res_sql["version"])
    api_state = read_version_mor(spark, api_root, res_api["version"])
    tallies_equal = all(
        res_sql[k] == res_api[k] for k in ("n_deleted", "n_updated", "n_inserted")
    )
    sym_ok = multiset_equal(sql_state, api_state)

    # r13 statements: UPDATE / DELETE — statement on sql_root, API twin
    # on api_root, every intermediate state compared
    upd_sql = run_mutation_sql(
        spark,
        "UPDATE t SET o_totalprice = o_totalprice * 1.5 WHERE o_orderkey % 7 = 0",
        {"t": sql_root},
    )
    upd_api = update_where(
        spark,
        api_root,
        {"o_totalprice": "o_totalprice * 1.5"},
        "o_orderkey % 7 = 0",
    )
    del_sql = run_mutation_sql(
        spark, "DELETE FROM t WHERE o_orderkey % 11 = 0", {"t": sql_root}
    )
    del_api = delete_where(spark, api_root, "o_orderkey % 11 = 0")
    sql_final = read_version_mor(spark, sql_root, del_sql["version"])
    api_final = read_version_mor(spark, api_root, del_api["version"])
    stmt_equal = (
        upd_sql["n_updated"] == upd_api["n_updated"]
        and del_sql["n_deleted"] == del_api["n_deleted"]
        and multiset_equal(sql_final, api_final)
    )
    parity_gate = 1 if (tallies_equal and sym_ok and stmt_equal) else 0

    pre_merge = run_mutation_sql(
        spark,
        "SELECT COUNT(*) AS n FROM t VERSION AS OF 0",
        {"t": sql_root},
    ).collect()[0]["n"]
    travel_gate = 1 if pre_merge == target.count() else 0

    return sql_final.agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("o_totalprice", "price_sum")
    ).select(
        "n_rows",
        "price_sum",
        F.lit(res_sql["n_deleted"]).cast("long").alias("n_deleted"),
        F.lit(res_sql["n_updated"]).cast("long").alias("n_updated"),
        F.lit(res_sql["n_inserted"]).cast("long").alias("n_inserted"),
        F.lit(upd_sql["n_updated"]).cast("long").alias("n_upd_stmt"),
        F.lit(del_sql["n_deleted"]).cast("long").alias("n_del_stmt"),
        F.lit(parity_gate).cast("long").alias("parity_gate"),
        F.lit(travel_gate).cast("long").alias("travel_gate"),
    )
