"""Decimation operators: LTTB and block-mean coarsen.

Reference semantics: rca_data_tools/qaqc/decimate.py — LTTB
(Largest-Triangle-Three-Buckets, Steinarsson 2013, public algorithm) selects
``threshold`` points per series preserving visual shape; ``coarsen`` is a
fixed-block mean (rca_data_tools/qaqc/plots.py:193-201). A cheap pre-stride
caps input size before LTTB (decimate.py:201-213).

Spark mapping: LTTB has a sequential dependency across buckets (each pick
depends on the previous pick), so it cannot be a window function — we
parallelize ACROSS series with ``applyInPandas`` (one Arrow batch per series;
after pre-stride each series fits an executor comfortably: threshold×10 rows).
Coarsen and stride are pure SQL and scale flat.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _lttb_indices(x: np.ndarray, y: np.ndarray, threshold: int) -> np.ndarray:
    """Indices kept by LTTB. First/last always kept; interior split into
    threshold-2 buckets; per bucket pick the point maximizing the triangle
    area with the previously selected point and the next bucket's centroid."""
    n = len(x)
    if threshold >= n or threshold < 3:
        return np.arange(n)
    # Bucket boundaries over the interior points [1, n-1).
    edges = np.linspace(1, n - 1, threshold - 1).astype(np.int64)
    out = np.empty(threshold, dtype=np.int64)
    out[0] = 0
    a = 0
    for i in range(threshold - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = edges[i + 1], (edges[i + 2] if i + 2 < len(edges) else n)
        avg_x = x[nlo:nhi].mean() if nhi > nlo else x[n - 1]
        avg_y = np.nanmean(y[nlo:nhi]) if nhi > nlo else y[n - 1]
        xs, ys = x[lo:hi], y[lo:hi]
        areas = np.abs((x[a] - avg_x) * (ys - y[a]) - (x[a] - xs) * (avg_y - y[a]))
        areas = np.where(np.isnan(areas), -1.0, areas)
        a = lo + int(np.argmax(areas))
        out[i + 1] = a
    out[-1] = n - 1
    return out


def lttb(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    threshold: int,
    max_stride_factor: int = 10,
) -> DataFrame:
    """Exact LTTB per series (grouped by ``key_cols``).

    A SQL pre-stride caps each series at ``threshold * max_stride_factor``
    rows before the pandas kernel sees it (reference: decimate.py:201-213),
    so per-group memory is bounded no matter how large the input series.
    """
    # Explicit-width hash repartition on the series key. The window below
    # requires exactly this partitioning, so no extra exchange is added — but
    # the explicit numPartitions keeps AQE from coalescing the small shuffle
    # into one partition, which would serialize BOTH the window sort and the
    # Python kernel onto a single core (measured 6x slower at sf0.1, and
    # fatal at cluster scale where one task would process every series).
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    sized = (
        df.repartition(n_parts, *key_cols)
        .withColumn("__rn", F.row_number().over(w) - 1)
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(*key_cols)))
    )
    cap = threshold * max_stride_factor
    stride = F.greatest(F.lit(1), F.floor(F.col("__n") / cap)).cast("long")
    strided = sized.filter(
        (F.col("__rn") % stride == 0) | (F.col("__rn") == F.col("__n") - 1)
    ).drop("__rn", "__n")

    schema = strided.schema

    # mapInPandas over hash-partitioned, partition-sorted data: one pandas
    # frame per PARTITION (not per group), so the Arrow/pandas construction
    # cost amortizes over ~groups/partitions instead of paying per series —
    # an order of magnitude faster when series are small and numerous.
    # The window pass above already hash-partitioned by key_cols and sorted
    # by (key_cols, ts), so no second shuffle is needed; sortWithinPartitions
    # is a local no-op when that ordering survived, a local sort when it
    # didn't — either way the whole operator costs exactly one exchange.
    prepared = strided.sortWithinPartitions(*key_cols, ts_col)

    def _kernel(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        if pdf.empty:
            return
        # Input is sorted by (keys, ts): series boundaries are where any key
        # column changes. Pure-numpy group detection + one final iloc beats a
        # pandas groupby + per-group concat by ~5x at thousands of series.
        change = np.zeros(len(pdf), dtype=bool)
        for kc in key_cols:
            vals = pdf[kc].to_numpy()
            change[1:] |= vals[1:] != vals[:-1]
        starts = np.flatnonzero(np.concatenate(([True], change[1:])))
        ends = np.append(starts[1:], len(pdf))
        x_all = pdf[ts_col].astype("int64").to_numpy(dtype=np.float64)
        y_all = pdf[value_col].to_numpy(dtype=np.float64)
        keep = [
            lo + _lttb_indices(x_all[lo:hi], y_all[lo:hi], threshold)
            for lo, hi in zip(starts, ends)
        ]
        yield pdf.iloc[np.concatenate(keep)]

    return prepared.mapInPandas(_kernel, schema=schema)


def block_mean(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    window: int,
) -> DataFrame:
    """Positional block mean (coarsen): every ``window`` consecutive samples
    per series collapse to their mean; 'trim' boundary drops the ragged tail
    (reference: ds.coarsen(time=window, boundary='trim').mean())."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    bucketed = df.withColumn("__bucket", F.floor((F.row_number().over(w) - 1) / window))
    counts = F.count(F.lit(1)).alias("__n")
    aggs = [F.avg(c).alias(c) for c in value_cols] + [F.min(ts_col).alias(ts_col), counts]
    out = bucketed.groupBy(*key_cols, "__bucket").agg(*aggs)
    return out.filter(F.col("__n") == window).drop("__n", "__bucket")
