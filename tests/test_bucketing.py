"""Bucketed layout extras beyond test_sinks' join test: bucketed-key
AGGREGATION also plans shuffle-free, and the bucketed join returns the same
result as the unbucketed plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rca_data_tools_spark.sources.readers import load_table
from rca_data_tools_spark.sources.sinks import write_bucketed
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    for name in ("b2_orders", "b2_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed(
        load_table(spark, SF_SMOKE, "orders"),
        "b2_orders", ["o_orderkey"], 8, str(base / "orders"),
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        load_table(spark, SF_SMOKE, "lineitem"),
        "b2_lineitem", ["l_orderkey"], 8, str(base / "lineitem"),
        sort_cols=["l_orderkey", "l_linenumber"],
    )
    yield "b2_orders", "b2_lineitem"
    spark.sql("DROP TABLE IF EXISTS b2_orders")
    spark.sql("DROP TABLE IF EXISTS b2_lineitem")


def test_bucketed_agg_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key consumes the bucketed scan directly — no
    Exchange before the final aggregate. At 100 TB this turns every keyed
    rollup over the fact table into a scan-local aggregation."""
    _, b_lineitem = bucketed_tables
    agg = spark.table(b_lineitem).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    b_orders, b_lineitem = bucketed_tables
    bucketed = (
        spark.table(b_lineitem)
        .join(spark.table(b_orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        load_table(spark, SF_SMOKE, "lineitem")
        .join(
            load_table(spark, SF_SMOKE, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))
