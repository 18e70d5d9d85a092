"""Time-axis interpolation operators.

Reference: ``interpolate_na(dim='time', method='linear')``
(rca_data_tools/advanced_qaqc/calculateFunctions.py:103) and the climatology
hourly resample (qaqc/dashboard.py:141-148). Both are expressed with window
functions — two passes (backward carry, forward carry) plus a linear blend —
so they run as ordinary shuffles + sorts, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interpolate_na(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    out_col: str | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Linear interpolation of NULL values over time within each series.

    Leading/trailing NULL runs (no bracketing value on one side) take the
    nearest available value (ffill/bfill), matching xarray's interpolate_na
    with both fill directions left at default NaN -> here we keep NULL when
    neither side exists. ``order_cols`` appends tie-break columns to the
    time ordering (needed when grid points may collide with samples).
    """
    out_col = out_col or value_col
    order = [ts_col] + (order_cols or [])
    ms = F.unix_millis(F.col(ts_col))
    wb = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(0, Window.unboundedFollowing)
    v = F.col(value_col)
    prev_v = F.last(v, ignorenulls=True).over(wb)
    prev_t = F.last(F.when(v.isNotNull(), ms), ignorenulls=True).over(wb)
    next_v = F.first(v, ignorenulls=True).over(wf)
    next_t = F.first(F.when(v.isNotNull(), ms), ignorenulls=True).over(wf)
    frac: Column = (ms - prev_t) / (next_t - prev_t)
    interp = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .when(next_t == prev_t, prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return df.withColumn(out_col, interp)


def time_grid(spark, start: str, end: str, step_seconds: int, ts_col: str = "grid_ts") -> DataFrame:
    """Regular timestamp grid [start, end) — the resample target axis.

    Built with sequence+explode on the driver-side literal range, so it's a
    single narrow partition-parallel generator, no data shuffle.
    """
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp") - F.expr("INTERVAL 1 SECOND"),
                F.expr(f"INTERVAL {step_seconds} SECONDS"),
            )
        ).alias(ts_col)
    )


def resample_linear(
    samples: DataFrame,
    grid: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    grid_ts_col: str = "grid_ts",
) -> DataFrame:
    """Resample each series onto a regular grid with linear interpolation
    (reference: resample('H').interpolate('linear'), qaqc/dashboard.py:141-148).

    Implemented as union(grid × keys, samples) + interpolate_na, so the cost
    is one shuffle on (key, time) — no crossJoin of grid against facts.
    """
    keys = samples.select(*key_cols).distinct()
    grid_rows = keys.crossJoin(grid).withColumn(ts_col, F.col(grid_ts_col)).withColumn(
        value_col, F.lit(None).cast(dict(samples.dtypes)[value_col])
    ).withColumn("__is_grid", F.lit(1))
    sample_rows = samples.select(*key_cols, ts_col, value_col).withColumn("__is_grid", F.lit(0)).withColumn(
        grid_ts_col, F.lit(None).cast("timestamp")
    )
    unioned = sample_rows.unionByName(grid_rows.select(sample_rows.columns))
    filled = interpolate_na(
        unioned, key_cols, ts_col, value_col, out_col="__interp", order_cols=["__is_grid"]
    )
    return (
        filled.filter(F.col("__is_grid") == 1)
        .select(*key_cols, F.col(ts_col).alias(grid_ts_col), F.col("__interp").alias(value_col))
    )


def profile_regrid(
    samples: DataFrame,
    key_cols: list[str],
    x_col: str,
    value_col: str,
    grid: list[float],
) -> DataFrame:
    """Per-profile 1-D regrid: np.interp of ``value_col`` onto a fixed grid of
    ``x_col`` (reference: gridProfiles' depth regridding onto 0.5 m/5 m grids,
    rca_data_tools/qaqc/dashboard.py:197-226). NaN outside the sampled range,
    like the reference (surfacing as NULL through Arrow).

    mapInPandas over key-partitioned, (key, x)-sorted data: one pandas frame
    per PARTITION, profile boundaries detected with a numpy key-change scan —
    the Arrow/pandas construction cost amortizes over all profiles in the
    partition instead of paying per profile (profiles are typically a few
    dozen rows; an applyInPandas-per-group formulation was ~10x slower at
    tens of thousands of profiles). One exchange total; duplicate x within a
    profile is caller's responsibility to resolve (np.interp bracketing is
    order-dependent under duplicates).
    """
    import numpy as np
    import pandas as pd

    out_schema = ", ".join(
        [f"{c} {t}" for c, t in samples.select(*key_cols).dtypes]
        + [f"{x_col} double", f"{value_col} double"]
    )
    grid_arr = np.array([float(g) for g in grid], dtype=np.float64)
    cols = key_cols + [x_col, value_col]
    prepared = (
        samples.select(*cols)
        .repartition(*key_cols)
        .sortWithinPartitions(*key_cols, x_col)
    )

    def kernel(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.dropna(subset=[x_col, value_col])
        if pdf.empty:
            return
        n = len(pdf)
        change = np.zeros(n, dtype=bool)
        for kc in key_cols:
            v = pdf[kc].to_numpy()
            change[1:] |= v[1:] != v[:-1]
        starts = np.flatnonzero(np.concatenate(([True], change[1:])))
        ends = np.append(starts[1:], n)
        x_all = pdf[x_col].to_numpy(dtype=np.float64)
        y_all = pdf[value_col].to_numpy(dtype=np.float64)
        g = len(grid_arr)
        vals = np.empty(len(starts) * g, dtype=np.float64)
        for gi, (lo, hi) in enumerate(zip(starts, ends)):
            vals[gi * g : (gi + 1) * g] = np.interp(
                grid_arr, x_all[lo:hi], y_all[lo:hi], left=np.nan, right=np.nan
            )
        out = {kc: np.repeat(pdf[kc].to_numpy()[starts], g) for kc in key_cols}
        out[x_col] = np.tile(grid_arr, len(starts))
        out[value_col] = vals
        yield pd.DataFrame(out)

    return prepared.mapInPandas(kernel, schema=out_schema)
