"""Skew-mitigation operators.

AQE's skew-join splitting handles lopsided JOIN partitions automatically
(session.py turns it on), but a groupBy whose key distribution is pathological
(one instrument producing 99% of samples; one boilerplate document cluster)
still funnels a hot key into one reducer. The standard fix is salted
two-stage aggregation: group on (key, salt) first — spreading the hot key
over ``n_salts`` reducers — then combine the partials. Cost: one extra
(cheap, already-reduced) shuffle; benefit: no straggler task at any key
distribution. Works for any algebraic aggregate (sum/count/min/max + the
decimal-sum scheme).

The reference never needed this (pandas, one process); at 100 TB it is the
difference between a 5-minute and a 5-hour stage when a key goes hot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Attach a deterministic per-row salt in [0, n_salts): hash of the whole
    row's monotonically increasing id is NOT reproducible across retries, so
    we hash the row content via xxhash64 over all columns — stable for a
    given row, uniform across rows."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Salted two-stage aggregation.

    ``aggs`` maps output column -> (partial_agg_expr, final_agg_expr) where
    the partial runs per (keys, salt) and the final combines partials per
    keys — e.g. ``{"n": (F.count(F.lit(1)), F.sum("n"))}`` or
    ``{"sum_v": (dsum("v"), F.sum("sum_v"))}``. Algebraic aggregates only
    (the decomposition must be associative).
    """
    s = salted(df, n_salts)
    partial = s.groupBy(*keys, "__salt").agg(
        *[expr.alias(out) for out, (expr, _final) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[final.alias(out) for out, (_expr, final) in aggs.items()]
    )
