"""Distributed linear recurrences (EWMA and friends) for HOT keys.

The per-key EWMA in queries/frameq.py runs each key's series as one serial
kernel — correct and bit-exact, but a single key with billions of rows
serializes into one task. This module is the documented escape hatch made
real: a two-pass chunked scan (Blelloch 1990 prefix-scan decomposition
specialized to the first-order recurrence y_t = a*x_t + (1-a)*y_{t-1}).

Because the recurrence is affine in the seed, y_t = y0_t + (1-a)^t * seed
where y0_t is the recurrence run from seed 0. So:

1. Chunk each key's series by the ORDER COLUMN's value (time buckets) — no
   global row-numbering window, chunks assign from the data itself.
2. Pass 1 (parallel per chunk): run the kernel from seed 0, keeping per-row
   (y0, decay=(1-a)^pos) and emitting one (A, B) summary per chunk, where
   A = (1-a)^len and B = chunk-end y0.
3. Driver: fold seeds across each key's chunk chain — seed_{c+1} =
   B_c + A_c * seed_c — O(#chunks) scalar work on config-sized state.
4. Pass 2 (parallel per row): y = y0 + decay * seed(chunk), a broadcast-map
   join.

Numerics: reassociating a float recurrence changes rounding, like any
parallel fp sum — results agree with the serial kernel to ~1e-12 relative
(tested), not bit-for-bit. The oracle-checked w_ewma query therefore keeps
the serial kernel; use this operator when a key outgrows one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunked_ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.25,
    chunk_seconds: int = 86400,
    out_col: str = "ewma",
) -> DataFrame:
    """Distributed EWMA over (key, time order) with day-bucket chunking.
    ``order_cols`` must totally order rows within a key (include a
    tiebreaker). Returns the input columns plus ``out_col``."""
    import numpy as np
    import pandas as pd

    beta = 1.0 - alpha
    chunk = F.floor(F.unix_timestamp(ts_col) / chunk_seconds).cast("long")
    src = df.withColumn("__chunk", chunk)

    in_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema)

    def _pass1(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([c for c in order_cols]).reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        y0 = np.empty(len(x))
        acc = 0.0
        for i, xi in enumerate(x):
            acc = alpha * xi + beta * acc
            y0[i] = acc
        pdf["__y0"] = y0
        pdf["__decay"] = beta ** np.arange(1, len(x) + 1)
        return pdf

    p1_schema = f"{in_fields}, `__y0` double, `__decay` double"
    staged = src.groupBy(key_col, "__chunk").applyInPandas(_pass1, schema=p1_schema)
    staged = staged.localCheckpoint(eager=False)  # pass 2 must see pass 1's rows

    # Chunk summaries -> per-key seed chain on the driver (state is
    # O(#chunks), the whole point being #chunks << #rows).
    summaries = (
        staged.groupBy(key_col, "__chunk")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.max(F.struct(*[F.col(c) for c in order_cols], F.col("__y0"))).alias("__last"),
        )
        .select(key_col, "__chunk", "__n", F.col("__last.__y0").alias("__B"))
        .collect()
    )
    running: dict = {}  # key -> seed entering the next chunk
    seed_rows = []
    for r in sorted(summaries, key=lambda r: (r[key_col], r["__chunk"])):
        k = r[key_col]
        seed = running.get(k, 0.0)
        seed_rows.append((k, r["__chunk"], seed))
        running[k] = r["__B"] + (beta ** r["__n"]) * seed
    spark = df.sparkSession
    key_type = dict(df.dtypes)[key_col]
    seed_df = spark.createDataFrame(
        seed_rows, f"`{key_col}` {key_type}, `__chunk` long, `__seed` double"
    )
    return (
        staged.join(F.broadcast(seed_df), [key_col, "__chunk"])
        .withColumn(out_col, F.col("__y0") + F.col("__decay") * F.col("__seed"))
        .drop("__chunk", "__y0", "__decay", "__seed")
    )
