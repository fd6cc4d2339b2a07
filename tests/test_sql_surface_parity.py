"""M5 (SURVEY.md §7): the SQL surface is co-equal. For every query whose
oracle SQL is engine-portable ANSI, run THE SAME TEXT through spark.sql
over temp views and compare with the DataFrame implementation — a
three-way agreement (DataFrame == Spark SQL == DuckDB) reproducing the
reference's cross-API differential method."""

from __future__ import annotations

import pytest

from pyspark_big_data_spark.io import read_table
from pyspark_big_data_spark.queries import ORACLES, REGISTRY
from pyspark_big_data_spark.testing import TESTDATA_TABLES, compare_frames

# oracles written in the portable ANSI subset (no DuckDB list_*/unnest/
# strftime/time_bucket/QUALIFY/json_extract/quantile_cont/ASOF)
PORTABLE = [
    "q1_top_months_per_year",
    "q2_event_time_bins",
    "q3_segment_profile_top",
    "q3_segment_profile_bottom",
    "q4_avg_distance",
    "pricing_summary",
    "revenue_by_nation",
    "union_priority_counts",
    "order_priority_semi_join",
    "composite_key_join",
    # clean_formatted_currency excluded: its oracle needs DuckDB's 'g'
    # regexp_replace flag (Spark replaces all matches by default)
    "distinct_users_by_type",
    "rollup_lineitem_status",
    "cube_status_priority",
    "customer_set_ops",
    "pivot_segment_by_nation",
    "running_customer_spend",
    "nation_rank_dense_ntile",
    "stats_by_returnflag",
    "unpivot_lineitem_metrics",
]


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    for t in TESTDATA_TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_on_spark_too(spark, sf_dir, name):
    df_result = REGISTRY[name](spark, sf_dir).toPandas()
    sql_result = spark.sql(ORACLES[name]).toPandas()
    compare_frames(sql_result, df_result)
