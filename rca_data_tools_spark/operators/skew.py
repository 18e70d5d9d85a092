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


SALT_COL = "__salt"


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join — the hot-key fix for JOINs whose explosion lives
    INSIDE one key value, where AQE's post-shuffle partition splitting
    cannot help (it splits by size, but every row of the key still hashes
    to one partition pre-split on the build side).

    Recipe (the classic): the LEFT (probe) side gets the deterministic
    per-row salt from ``salted`` (xxhash64 of the row — replays and task
    retries re-derive it); the RIGHT (build) side REPLICATES across all
    ``n_salts`` values (explode — cost n_salts× the build side, which is
    why this applies when the build side is the smaller of two
    non-broadcastable inputs); the join key becomes (keys…, salt), so a
    hot key's rows spread over n_salts partitions instead of one.

    The RESULT SET is identical to the unsalted join for EVERY salt
    assignment — each left row meets each matching right row exactly once,
    in the one partition its salt selects — certified by the
    ``join_salted_skew`` oracle. ``how`` supports 'inner' and 'left'
    (replication preserves both). A ``merge`` hint pins the shuffle path
    so the salted exchange actually runs (on a cluster the build side is
    too big to broadcast — the scenario salting exists for)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_equi_join supports inner/left, got {how!r}")
    if n_salts < 2:
        raise ValueError("n_salts must be >= 2 (1 would be the plain join)")
    missing = [k for k in keys if k not in left.columns or k not in right.columns]
    if missing:
        raise ValueError(f"join keys missing: {missing}")
    l = salted(left, n_salts)
    r = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out_cols = left.columns + [c for c in right.columns if c not in keys]
    return (
        l.join(r.hint("merge"), [*keys, SALT_COL], how)
        .select(*out_cols)
    )
