"""Bucketed-table layout: pre-shuffle a fact table ONCE at write time so
every later equi-join / aggregation on the bucket key runs shuffle-free.

Reference analogy: the reference re-reads the same Zarr stores per flow-run
and re-aligns them in pandas every time (qaqc/dashboard.py:305-313 +
qaqc/decimate.py:224-226). At 100 TB the equivalent Spark anti-pattern is
re-shuffling the fact table on every join. Bucketing is Spark's answer: the
writer hash-partitions rows into a fixed bucket count by key (and sorts
within buckets), records that layout in the catalog, and the planner then
proves both join sides are co-partitioned — the SortMergeJoin consumes the
scans directly, no Exchange, no Sort.

Numbers that matter at scale: a bucketed lineitem⋈orders at 100 TB saves the
full fact-table shuffle (the dominant cost of the join) on EVERY query that
joins or aggregates on the bucket key. Bucket count is chosen like shuffle
partitions: total_size / target_partition_size (128-256 MB), rounded to a
power of two so AQE coalescing still has factors to work with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as an external Parquet table bucketed (and sorted)
    by ``bucket_cols``. The explicit ``path`` keeps the data out of the
    session warehouse so tests/jobs control placement."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left: str, right: str, on: list[str]
) -> tuple[DataFrame, bool]:
    """Join two bucketed tables on their bucket key and report whether the
    physical plan is Exchange-free (the co-location proof). Broadcast is
    disabled for the probe so the planner must pick SortMergeJoin — the
    strategy whose shuffle bucketing elides."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(left).join(spark.table(right), on)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return joined, "Exchange" not in plan
