"""Bucketed layout (sources/bucketing.py): co-located joins and aggregations
must plan without an Exchange, and results must match the unbucketed plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rca_data_tools_spark.sources.bucketing import (
    bucketed_join_is_shuffle_free,
    write_bucketed,
)
from rca_data_tools_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders, "b_orders", str(base / "orders"), ["o_orderkey"], 8)
    write_bucketed(
        lineitem, "b_lineitem", str(base / "lineitem"), ["l_orderkey"], 8,
        sort_cols=["l_orderkey", "l_linenumber"],
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    b_orders, b_lineitem = bucketed_tables
    joined = (
        spark.table(b_lineitem)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(spark.table(b_orders), "o_orderkey")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan


def test_bucketed_agg_no_exchange(spark, bucketed_tables):
    _, b_lineitem = bucketed_tables
    agg = spark.table(b_lineitem).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    b_orders, b_lineitem = bucketed_tables
    bucketed = (
        spark.table(b_lineitem)
        .join(
            spark.table(b_orders),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
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


def test_helper_reports_shuffle_free(spark, bucketed_tables):
    b_orders, _ = bucketed_tables
    _, free = bucketed_join_is_shuffle_free(spark, b_orders, b_orders, ["o_orderkey"])
    assert free
