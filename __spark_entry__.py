"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps each implemented operator from SURVEY.md §2 (plus the
training-data-pipeline extras) to a callable ``(spark, sf_dir) -> DataFrame``;
``oracle_sql()`` gives the DuckDB-runnable ANSI-SQL equivalent. Aggregates of
doubles go through round->DECIMAL summation on BOTH sides so results are
bit-identical regardless of partitioning/order (see
rca_data_tools_spark/functions/numeric.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rca_data_tools_spark.queries import QUERIES, ORACLES
from rca_data_tools_spark.sources.readers import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
