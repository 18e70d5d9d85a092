"""Distributed global ranking (operators/ranking.py): bit-parity with the
single-partition window it replaces, across sizes that exercise the NTILE
remainder logic and the partition-offset stitching."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rca_data_tools_spark.operators.ranking import global_ntile, global_row_number


def _values(spark, n, seed=7):
    # Deterministic pseudo-random keys with duplicates; id breaks ties.
    return spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(97)).alias("k"),
    )


@pytest.mark.parametrize("n", [0, 1, 5, 1000])
def test_global_row_number_matches_window(spark, n):
    df = _values(spark, n)
    order = [F.col("k").asc(), F.col("id").asc()]
    got = {
        r["id"]: r["rank"]
        for r in global_row_number(df, order, num_partitions=7).collect()
    }
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn("rank", F.row_number().over(Window.orderBy(*order))).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(0, 3), (2, 5), (9, 3), (10, 3), (11, 3), (1000, 7)])
def test_global_ntile_matches_window(spark, n, k):
    df = _values(spark, n)
    order = [F.col("k").asc(), F.col("id").asc()]
    got = {
        r["id"]: r["tile"]
        for r in global_ntile(df, order, k, num_partitions=5).collect()
    }
    want = {
        r["id"]: r["tile"]
        for r in df.withColumn("tile", F.ntile(k).over(Window.orderBy(*order))).collect()
    }
    assert got == want


def test_no_single_partition_window(spark):
    df = _values(spark, 100)
    order = [F.col("k").asc(), F.col("id").asc()]
    plan = (
        global_row_number(df, order)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert not re.search(r"Window[^\n]*\n[^\n]*Exchange SinglePartition", plan), plan
