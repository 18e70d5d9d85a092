"""Interval / as-of / range joins.

The reference does these with pandas IntervalIndex lookups
(rca_data_tools/qaqc/utils.py:288-310 calibration as-of,
rca_data_tools/qaqc/dashboard.py:186-210 profile range join,
:324-338 annotation overlap). Spark has no native as-of join, so we provide
two scale-appropriate strategies:

1. **Broadcast range join** — when the interval side is dimension-sized
   (calibrations, deployments, annotations: thousands of rows), broadcast it
   and let the non-equi predicate run as BroadcastNestedLoopJoin. With a
   broadcast side of K rows this is O(N·K) but embarrassingly parallel and
   shuffle-free — the right physical plan for dim-sized interval tables.

2. **Union-window as-of join** — when both sides are large, a non-equi join
   degenerates. Instead: union the two inputs tagged by origin, hash-partition
   by key, sort by time, and carry the most recent right-side row forward with
   ``last(..., ignorenulls=True)``. One shuffle, no nested loop, linear in
   N+M — the classic distributed as-of strategy, robust at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    lo: str,
    hi: str,
    extra_keys: list[str] | None = None,
    how: str = "inner",
    closed: str = "left",
) -> DataFrame:
    """Join facts to dimension intervals containing ``fact_ts``.

    ``closed`` follows the reference's half-open convention ('left' =
    ``lo <= t < hi``). Interval side is broadcast — callers must keep it
    dimension-sized; use :func:`as_of_join` for large-large.
    """
    t = facts[fact_ts]
    if closed == "left":
        cond = (t >= intervals[lo]) & (t < intervals[hi])
    elif closed == "both":
        cond = (t >= intervals[lo]) & (t <= intervals[hi])
    else:
        raise ValueError(f"unsupported closed={closed!r}")
    for k in extra_keys or []:
        cond = cond & (facts[k] == intervals[k])
    right = F.broadcast(intervals.drop(*(extra_keys or [])))
    return facts.join(right, cond, how)


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    open_ended_right: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Interval-overlap join; NULL right end = open interval (ongoing
    annotation, reference: qaqc/dashboard.py:324-338). Right side broadcast."""
    r_end = F.coalesce(right[r_hi], F.lit("9999-12-31 23:59:59").cast("timestamp")) if open_ended_right else right[r_hi]
    cond = (right[r_lo] < left[l_hi]) & (r_end > left[l_lo])
    return left.join(F.broadcast(right), cond, how)


def clip_intervals(df: DataFrame, lo: str, hi: str, w_lo, w_hi) -> DataFrame:
    """Clip intervals to a window and drop empties (reference: deployment
    clipping, qaqc/utils.py:177-207) via greatest/least."""
    return (
        df.withColumn(lo, F.greatest(F.col(lo), F.lit(w_lo).cast("timestamp")))
        .withColumn(hi, F.least(F.col(hi), F.lit(w_hi).cast("timestamp")))
        .filter(F.col(lo) < F.col(hi))
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """Scalable as-of join. ``direction``:

    - ``backward`` (default): latest right row with ``right_ts <= left_ts``
      (``<`` when strict) — the calibration-lookup shape.
    - ``forward``: earliest right row with ``right_ts >= left_ts`` (``>``
      when strict).
    - ``nearest``: whichever of the two is closer in time; exact-distance
      ties prefer the backward match. ``strict`` excludes equal timestamps
      from both candidates.

    Implementation: tag + union + window passes — one hash shuffle on
    ``key``, no non-equi join, no broadcast requirement (both sides may be
    arbitrarily large). Tie ordering between a left row and a right row at
    the same timestamp flips with strict/direction so the frame naturally
    includes or excludes the equal-timestamp right rows; ``nearest`` reuses
    the same exchange for both window passes.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction}")
    value_cols = value_cols or [c for c in right.columns if c not in (key, right_ts)]
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r_tagged = (
        right.select(key, right_ts, *value_cols)
        .withColumn("__side", F.lit(0))
        .withColumn("__ts", F.col(right_ts))
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in value_cols + [right_ts]:
        if c not in l_tagged.columns:
            l_tagged = l_tagged.withColumn(c, F.lit(None).cast(dict(r_tagged.dtypes)[c]))
    cols = l_tagged.columns
    unioned = l_tagged.select(cols).unionByName(r_tagged.select(cols))

    # Tie order between right (side 0) and left (side 1) rows at equal __ts:
    # backward non-strict / forward strict want rights FIRST; backward strict
    # / forward non-strict want rights AFTER.
    rights_first = F.col("__side")
    rights_after = F.lit(1) - F.col("__side")
    src = lambda c: F.when(F.col("__side") == 0, F.col(c))  # noqa: E731

    def backward_pass(df, prefix):
        tie = rights_first if not strict else rights_after
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("__ts").asc(), tie.asc())
            .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
        )
        for c in value_cols + [right_ts]:
            df = df.withColumn(f"{prefix}{c}", F.last(src(c), ignorenulls=True).over(w))
        return df

    def forward_pass(df, prefix):
        tie = rights_after if not strict else rights_first
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("__ts").asc(), tie.asc())
            .rowsBetween(1 if strict else 0, Window.unboundedFollowing)
        )
        for c in value_cols + [right_ts]:
            df = df.withColumn(f"{prefix}{c}", F.first(src(c), ignorenulls=True).over(w))
        return df

    if direction == "backward":
        filled = backward_pass(unioned, "__asof_")
    elif direction == "forward":
        filled = forward_pass(unioned, "__asof_")
    else:  # nearest: both passes share the exchange; pick the closer match
        filled = forward_pass(backward_pass(unioned, "__b_"), "__f_")
        ts_num = F.col("__ts").cast("double")
        b_ts = F.col(f"__b_{right_ts}").cast("double")
        f_ts = F.col(f"__f_{right_ts}").cast("double")
        use_f = b_ts.isNull() | (f_ts.isNotNull() & ((f_ts - ts_num) < (ts_num - b_ts)))
        for c in value_cols + [right_ts]:
            filled = filled.withColumn(
                f"__asof_{c}", F.when(use_f, F.col(f"__f_{c}")).otherwise(F.col(f"__b_{c}"))
            )
            filled = filled.drop(f"__b_{c}", f"__f_{c}")
    out = filled.filter(F.col("__side") == 1)
    for c in value_cols + [right_ts]:
        out = out.drop(c).withColumnRenamed(f"__asof_{c}", c)
    return out.drop("__side", "__ts")


def range_tag_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    lo: str,
    hi: str,
    tag_col: str,
    how: str = "inner",
) -> DataFrame:
    """Tag fact rows with the id of the (broadcast) interval containing them —
    the profile-tagging pattern (reference: qaqc/dashboard.py:186-210)."""
    cond = (facts[fact_ts] >= intervals[lo]) & (facts[fact_ts] <= intervals[hi])
    return facts.join(F.broadcast(intervals.select(lo, hi, tag_col)), cond, how).drop(lo, hi)
