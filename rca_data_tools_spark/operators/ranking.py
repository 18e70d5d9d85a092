"""Distributed global ranking: exact row_number / NTILE over a total order
WITHOUT the single-partition WindowExec Spark plans for an unpartitioned
window (WindowExec warns "Moving all data to a single partition" — the
classic scale-killer hiding in a green test).

Standard two-phase design (same idea as TeraSort ranking):

1. ``repartitionByRange`` on the order key — a sampled range shuffle, so each
   partition holds a contiguous key range. The frame is localCheckpoint-ed so
   the count job and the rank job see the SAME partitioning (range sampling
   is seeded per-RDD; recomputation could re-draw boundaries).
2. Per-partition ``row_number`` (parallel windows) + a broadcast map of
   cumulative partition offsets (one count row per partition — driver state
   is O(partitions), never O(rows)).

``global_ntile`` then derives the bucket from the global rank with the
closed-form NTILE split (first n%k buckets get one extra row), bit-identical
to SQL NTILE over the same total order.

The caller must pass a TOTAL order (include a tiebreaker column): rows with
equal keys may straddle a range boundary, which would make ranks
partition-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ranked_with_total(
    df: DataFrame, order_cols: list[Column], rank_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(p, *order_cols)
        .localCheckpoint(eager=False)
        .withColumn("__pid", F.spark_partition_id())
    )
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in parted.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    if offsets:
        off_expr = F.element_at(
            F.map_from_arrays(
                F.array(*[F.lit(pid) for pid in offsets]),
                F.array(*[F.lit(off) for off in offsets.values()]),
            ),
            F.col("__pid"),
        )
    else:
        off_expr = F.lit(0)
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    ranked = (
        parted.withColumn(rank_col, F.row_number().over(w) + off_expr)
        .drop("__pid")
    )
    return ranked, acc


def global_row_number(
    df: DataFrame, order_cols: list[Column], rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row number over a total order, computed with
    parallel per-partition windows + broadcast offsets."""
    ranked, _ = _ranked_with_total(df, order_cols, rank_col, num_partitions)
    return ranked


def global_ntile(
    df: DataFrame, order_cols: list[Column], k: int, bucket_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact NTILE(k) over a total order, distributed. Matches SQL NTILE:
    with n rows, the first n % k buckets hold n//k + 1 rows, the rest n//k."""
    ranked, n_rows = _ranked_with_total(df, order_cols, "__grank", num_partitions)
    q, m = divmod(n_rows, k)
    r = F.col("__grank")
    if q == 0:
        bucket = r  # fewer rows than buckets: rank IS the bucket
    else:
        big = m * (q + 1)
        bucket = F.when(
            r <= F.lit(big), F.floor((r - 1) / F.lit(q + 1)) + 1
        ).otherwise(F.lit(m) + F.floor((r - F.lit(big) - 1) / F.lit(q)) + 1)
    return ranked.withColumn(bucket_col, bucket.cast("int")).drop("__grank")
