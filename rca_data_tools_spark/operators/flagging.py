"""QARTOD-style flagging operators: gross-range and climatology tests.

Semantics from rca_data_tools/qaqc/calculate.py:89-193:
- gross range: value outside fail span -> 4, outside suspect span -> 3,
  else 1; NULL -> 9.
- climatology: per (month, [depth bracket]) suspect span [mean-3σ, mean+3σ];
  outside -> 3; NULL span (no climatology for that bin) -> 9.

Both joins are broadcast: the dimension tables are per-(instrument, parameter)
and at most thousands of rows, so the fact scan never shuffles — this is the
plan that survives 100 TB (scan + broadcast hash join + partial agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rca_data_tools_spark.functions.qc import FLAG_MISSING, FLAG_PASS, FLAG_SUSPECT, span_flag


def gross_range_flags(
    facts: DataFrame,
    dim: DataFrame,
    value_col: str,
    join_keys: list[str],
    flag_col: str = "gross_range_flag",
) -> DataFrame:
    """Broadcast equi-join the gross-range dimension and apply the span test.

    ``dim`` must carry fail_lo/fail_hi/sus_lo/sus_hi
    (reference table shape: rca_data_tools/qaqc/qartod.py:63-81).
    """
    joined = facts.join(F.broadcast(dim), on=join_keys, how="left")
    out = joined.withColumn(
        flag_col,
        span_flag(
            F.col(value_col),
            F.col("sus_lo"),
            F.col("sus_hi"),
            F.col("fail_lo"),
            F.col("fail_hi"),
        ),
    )
    return out.drop("fail_lo", "fail_hi", "sus_lo", "sus_hi")


def climatology_flags(
    facts: DataFrame,
    clim: DataFrame,
    value_col: str,
    time_col: str = "time",
    depth_col: str | None = None,
    extra_keys: list[str] | None = None,
    flag_col: str = "climatology_flag",
) -> DataFrame:
    """Join the climatology table on month (+ optional depth bracket) and flag.

    clim columns: month, clim_lo, clim_hi (+ depth_lo/depth_hi when binned,
    membership depth_lo <= p < depth_hi — qaqc/calculate.py:151-155).
    Missing bracket or NULL bounds -> flag 9 (qaqc/calculate.py:163-186).
    """
    facts = facts.withColumn("__month", F.month(time_col))
    # Rename the dimension's join keys so the condition can reference them
    # unambiguously and they drop cleanly after the join.
    for k in extra_keys or []:
        clim = clim.withColumnRenamed(k, f"__clim_{k}")
    cond = facts["__month"] == clim["month"]
    for k in extra_keys or []:
        cond = cond & (facts[k] == clim[f"__clim_{k}"])
    if depth_col is not None:
        cond = cond & (facts[depth_col] >= clim["depth_lo"]) & (facts[depth_col] < clim["depth_hi"])
    joined = facts.join(F.broadcast(clim), cond, "left").drop(
        *[f"__clim_{k}" for k in extra_keys or []]
    )
    out = joined.withColumn(
        flag_col,
        F.when(F.col(value_col).isNull(), F.lit(FLAG_MISSING))
        .when(F.col("clim_lo").isNull() | F.col("clim_hi").isNull(), F.lit(FLAG_MISSING))
        .when((F.col(value_col) < F.col("clim_lo")) | (F.col(value_col) > F.col("clim_hi")), F.lit(FLAG_SUSPECT))
        .otherwise(F.lit(FLAG_PASS)),
    )
    drop = ["__month", "month", "clim_lo", "clim_hi"] + (["depth_lo", "depth_hi"] if depth_col else [])
    return out.drop(*drop)
